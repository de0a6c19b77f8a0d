package graft.ext

import org.apache.spark.sql.DataFrame
import org.apache.spark.sql.expressions.Window
import org.apache.spark.sql.functions._

/** Cluster-balanced prototypicality pruning — the curation stage that runs
  * AFTER clustering in an SSL-prototypes / D4-style pipeline: SemDedup
  * removes near-duplicates within a cell, then the remaining vectors are
  * ranked by how prototypical they are of their cluster (cosine to the own
  * centroid) and sampled per-cluster at a fixed fraction, so the kept set
  * stays balanced across the embedding space instead of collapsing onto
  * the densest clusters.
  *
  * Composition contract: assignment policy is [[IvfAnn]]'s job — callers
  * pass the `(vec_id, ev, cluster)` frame from `IvfAnn.build(...).assigned`
  * (flat, SQL-derivable at lloydIters = 0) or `IvfAnn.assignCoarse` (the
  * O(n·√k) scale path); this object only scores and samples, so it inherits
  * whichever assignment scale story the caller picked.
  *
  * Scale shape: prototypicality is one broadcast equi-join (k centroid rows)
  * + a codegen'd cosine — no n×k explosion, vectors never ride a shuffle.
  * Sampling is a per-cluster window rank; the only exchange keys on
  * `cluster`, carrying (vec_id, cluster, cos_own) — ~24 bytes/row. A single
  * fat cluster skews that window the same way it skews the cell itself;
  * k ∝ n seeding (IvfAnn.buildAuto) is the upstream fix.
  */
object ClusterPrune {

  /** Cosine of each vector to its OWN (assigned) centroid, rounded to 6
    * decimals (the cross-engine-stable precision x4_cluster_quality pins).
    * Input: (vec_id, ev, cluster); centroids as (cluster, cv) pairs.
    * Output: (vec_id, cluster, cos_own).
    */
  def prototypicality(assigned: DataFrame,
      centroids: Array[(Int, Seq[Double])]): DataFrame = {
    val spark = assigned.sparkSession
    import spark.implicits._
    val seeds = centroids.toSeq.toDF("cluster", "cv")
    assigned.join(broadcast(seeds), Seq("cluster"))
      .select(col("vec_id"), col("cluster"),
        round(graft.functions.CosineSim.cosine_sim(col("ev"), col("cv")), 6)
          .as("cos_own"))
  }

  /** Per-cluster capped keep over a prototypicality frame: rank within each
    * cluster (hardestFirst = lowest cos_own first — prune the prototypes,
    * keep the informative tail, the SSL-prototypes order; false keeps the
    * most prototypical instead), keep `ceil(frac · cluster_size)` rows.
    * Ties break on vec_id so the verdict is deterministic. Output:
    * (vec_id, cluster, cos_own, rank, kept).
    */
  def balancedSample(proto: DataFrame, frac: Double,
      hardestFirst: Boolean = true): DataFrame = {
    require(frac > 0 && frac <= 1, s"frac must be in (0, 1]: $frac")
    val ord = if (hardestFirst) col("cos_own").asc else col("cos_own").desc
    val w = Window.partitionBy(col("cluster")).orderBy(ord, col("vec_id"))
    // cluster sizes are a k-row frame — broadcast back, never a second window
    val sizes = proto.groupBy(col("cluster")).agg(count(lit(1)).as("n_c"))
    proto.join(broadcast(sizes), Seq("cluster"))
      .withColumn("rank", row_number().over(w))
      .select(col("vec_id"), col("cluster"), col("cos_own"), col("rank"),
        (col("rank") <= ceil(col("n_c") * lit(frac))).as("kept"))
  }
}
