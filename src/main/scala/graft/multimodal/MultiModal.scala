package graft.multimodal

import org.apache.spark.sql.Dataset

/** Multimodal column handling: media payloads as opaque `binary` columns
  * with typed metadata, decoded in per-partition batches — the Scala
  * analog of a vectorized (Arrow-batched) decode UDF.
  *
  * The actual codec is deliberately STUBBED (`fakeDecode`): image/audio
  * libraries are absent in this environment, so decode derives
  * deterministic metadata from the bytes. Everything around it — binary
  * schema, typed Dataset plumbing, partition-batched execution, metadata
  * struct shape — is the real production path; swap `fakeDecode` for a
  * codec call to go live.
  */
object MultiModal {

  case class MediaRow(doc_id: Long, payload: Array[Byte])
  case class MediaMeta(doc_id: Long, width: Long, height: Long,
      n_frames: Long, checksum: Long)

  /** Stand-in for the real codec: rolling checksum → fake dimensions.
    * Deterministic in the payload bytes (ORDER-insensitive across
    * partitions since it is per-row). */
  private def fakeDecode(docId: Long, bytes: Array[Byte]): MediaMeta = {
    var crc = 0L
    var i = 0
    while (i < bytes.length) {
      crc = (crc * 31 + (bytes(i) & 0xff)) % 1000000007L
      i += 1
    }
    MediaMeta(docId, 128L + crc % 1024L, 128L + (crc / 1024L) % 1024L,
      1L + crc % 30L, crc)
  }

  /** Per-partition batched decode — one iterator pass per partition, no
    * per-row task overhead; executors never hold more than a partition.
    * A NULL payload is a missing/failed media object: dropped, like a
    * codec skipping an unreadable file (degenerate-data harness: a
    * null-text corpus must not NPE the decode stage). */
  def decodeStub(ds: Dataset[MediaRow]): Dataset[MediaMeta] = {
    import ds.sparkSession.implicits._
    ds.mapPartitions(it => it.collect {
      case r if r.payload != null => fakeDecode(r.doc_id, r.payload)
    })
  }
}
