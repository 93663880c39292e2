package graft.ops

/** The deterministic cross-engine md5-prefix bucket device (j15's):
  * `bucket(key, m)` = integer value of `len` hex chars of md5(key)
  * starting at `start` (1-based), mod `m`. Spark reads the hex slot via
  * `conv(…, 16, 10)`, DuckDB via the `'0x' ||` cast — bit-identical
  * buckets, which is what makes hash splits (j15 train/val/test, j110
  * k-fold, j36's is_new leg, j30's per-source sample, j22b's
  * stratified threshold, j76's leakage audit, j115's uniform draw)
  * reproducible across engines AND across keys.
  *
  * One definition on purpose (the Tables.revenueAgg discipline, r18-s3
  * review): the split family was open-coded per round-file, and a slot
  * or width change would have had to hit every copy in both dialects at
  * once or the deterministic splits silently diverge between keys that
  * claim to share an assignment.
  *
  * Both builders return SQL TEXT for the same reason [[Ngrams]] does:
  * one helper serves the Column-API (`expr(...)`) and SQL-registry
  * worlds, stays codegen-friendly, and interpolates into oracle
  * strings.
  */
private[graft] object Hashes {

  /** Spark SQL text. `key` may be any expression; it is cast to string
    * exactly as every historical call site did. */
  def bucket(key: String, m: Int, start: Int = 1, len: Int = 8): String =
    s"cast(conv(substring(md5(cast($key as string)),$start,$len),16,10)" +
      s" as bigint) % $m"

  /** DuckDB twin of [[bucket]] — same slot, same modulus. */
  def bucketSql(key: String, m: Int, start: Int = 1, len: Int = 8): String =
    s"CAST('0x' || substr(md5(CAST($key AS VARCHAR)),$start,$len)" +
      s" AS BIGINT) % $m"
}
