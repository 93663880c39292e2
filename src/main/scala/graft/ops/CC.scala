package graft.ops

import org.apache.spark.sql.{DataFrame, SparkSession}
import org.apache.spark.sql.functions._

/** Connected components over an undirected edge list, hybrid strategy
  * (used by j14 dedup clustering; both paths label every node with its
  * component's MINIMUM id, so their outputs are interchangeable —
  * PropertySpec asserts exact agreement on random graphs).
  *
  * The edge list is the output of near-dup pruning: orders of magnitude
  * smaller than the corpus at any scale. Below the threshold a single
  * collect + union-find replaces an O(diameter) Spark job loop (what
  * production CC implementations do once the edge set fits on one node);
  * above it, distributed min-label propagation with per-round lineage
  * truncation takes over. */
object CC {

  /** Driver-side union-find with path compression; roots are component
    * minima because unions always attach the larger root under the
    * smaller. Returns (id, minRootLabel) for every node that appears. */
  def unionFind(edges: Iterable[(Long, Long)]): Seq[(Long, Long)] = {
    val parent = scala.collection.mutable.Map.empty[Long, Long]
    def find(x: Long): Long = {
      var r = x
      while (parent.getOrElse(r, r) != r) r = parent.getOrElse(r, r)
      var c = x
      while (parent.getOrElse(c, c) != c) { val n = parent(c); parent(c) = r; c = n }
      r
    }
    val seen = scala.collection.mutable.Set.empty[Long]
    edges.foreach { case (a, b) =>
      seen += a; seen += b
      val (ra, rb) = (find(a), find(b))
      if (ra != rb) { if (ra < rb) parent(rb) = ra else parent(ra) = rb }
    }
    seen.toSeq.sorted.map(id => (id, find(id)))
  }

  /** Distributed min-label propagation. `edges` must carry BOTH directions
    * as (src, dst); converges in O(component diameter) rounds, each round
    * localCheckpointed to truncate lineage. */
  def iterative(s: SparkSession, edges: DataFrame,
      maxIters: Int = 100): DataFrame = {
    var labels = edges.select(col("src").as("id")).distinct()
      .withColumn("lbl", col("id")).localCheckpoint()
    var done = false
    var iter = 0
    while (!done && iter < maxIters) {
      val nbr = edges
        .join(labels.toDF("dst", "dstLbl"), "dst")
        .groupBy("src").agg(min(col("dstLbl")).as("minNbr"))
      val next = labels
        .join(nbr.toDF("id", "minNbr"), Seq("id"), "left")
        .select(col("id"), col("lbl"),
          least(col("lbl"), coalesce(col("minNbr"), col("lbl"))).as("newLbl"))
        .localCheckpoint()
      done = next.where(col("newLbl") =!= col("lbl")).isEmpty
      labels = next.select(col("id"), col("newLbl").as("lbl"))
      iter += 1
    }
    // a component with diameter > maxIters would otherwise return silently
    // WRONG labels (plausible for chain-shaped dup clusters on the large
    // path) — fail loudly; callers can raise maxIters for pathological
    // graphs (min-label propagation is O(diameter) rounds by design)
    if (!done) throw new IllegalStateException(
      s"CC.iterative did not converge within $maxIters rounds — " +
        "component diameter exceeds the round budget; raise maxIters")
    labels
  }

  /** Hybrid entry point: `pairs` holds one row per undirected edge
    * (d1, d2); result is (doc_id, cluster) with cluster = component min.
    *
    * One materialization on the common path: the pair pipeline is
    * localCheckpointed ONCE, then probed with a bounded
    * `limit(threshold+1).collect()` off the cached blocks — the r5 shape
    * (checkpoint pairs AND mirrored edges, then count() then collect())
    * walked the materialized edges twice and double-allocated the edge
    * blocks, spiking the bench from 4.2 to 15.4 s. Union-find consumes
    * undirected edges directly, so the driver path never mirrors; only
    * the (rare) distributed path builds the bidirectional edge list. */
  def cluster(s: SparkSession, pairs: DataFrame,
      collectThreshold: Long = -1L): DataFrame = {
    import s.implicits._
    // -1 = read spark.graft.cc.collectThreshold (default 2M); either way
    // clamp below Int.MaxValue so limit(thr + 1) can't overflow Int
    val thr = math.min(
      if (collectThreshold >= 0L) collectThreshold
      else Knobs.ccCollectThreshold(s),
      Int.MaxValue.toLong - 2L)
    val p = pairs.toDF("d1", "d2").localCheckpoint()
    val probe = p.limit(thr.toInt + 1).collect()
    if (probe.length <= thr) {
      unionFind(probe.map(r => (r.getLong(0), r.getLong(1))))
        .toDF("doc_id", "cluster").orderBy("doc_id")
    } else {
      // heavy path: mirror off the cached pair blocks, checkpoint the
      // edge list once so the per-round joins don't re-derive the union
      val edges = p.union(p.select(col("d2"), col("d1")).toDF("d1", "d2"))
        .toDF("src", "dst").localCheckpoint()
      iterative(s, edges)
        .select(col("id").as("doc_id"), col("lbl").as("cluster"))
        .orderBy("doc_id")
    }
  }
}
