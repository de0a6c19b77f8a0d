package graft.ext

import graft.queries.Similarity
import org.apache.spark.sql.{DataFrame, SparkSession}
import org.apache.spark.sql.functions._

/** IVF (inverted-file) approximate nearest neighbor over an embedding
  * column — the partition-pruned scale path for similarity search
  * (SURVEY.md §2.11 X4, north-star).
  *
  * Build: seed `nCentroids` deterministic centroids (a pseudo-random
  * TakeOrdered sample in xxhash64 order — exactly min(n, k) seeds, no
  * pre-count), then assign every vector to its nearest centroid in ONE
  * narrow shuffle-free pass (centroids ride along as an array literal).
  * At rest the assignment persists partitioned by `cluster`
  * ([[writeIndex]]), so a probe reads only `nProbe`/`nCentroids` of the
  * data (parquet partition pruning does the work).
  *
  * Search: rank centroids by query similarity, scan only the top `nProbe`
  * clusters, exact cosine (native codegen expression) within them.
  * Recall/latency trades via nProbe; nProbe = nCentroids degrades to exact.
  */
object IvfAnn {

  final case class Index(assigned: DataFrame, centroids: Array[(Int, Seq[Double])])

  /** Assign each (vec_id, ev: array<double>) row to its nearest seed
    * centroid. Seeds = the top `nCentroids` vectors in `xxhash64(vec_id)`
    * order — a deterministic pseudo-random sample taken as ONE distributed
    * TakeOrdered pass (per-partition top-k, then merge): exactly
    * min(n, nCentroids) seed rows reach the driver, never the full id
    * column, with no count() pre-scan and no undershoot (the previous
    * hash-mod filter yielded ~n/step rows only in expectation).
    * (k-means refinement would slot in here; seeding is enough to
    * demonstrate and test the pruned path.)
    */
  def build(emb: DataFrame, nCentroids: Int): Index = {
    val spark = emb.sparkSession
    import spark.implicits._
    val seeds = emb.select($"vec_id", $"ev")
      .orderBy(xxhash64($"vec_id"), $"vec_id")
      .limit(nCentroids).collect()
    val centroids = seeds.zipWithIndex
      .map { case (r, i) => (i, r.getSeq[Double](r.fieldIndex("ev"))) }

    // nearest-centroid assignment as ONE narrow per-row fold: centroids ride
    // along as an array literal and `transform` scores each exactly once
    // (no re-evaluation trap), `array_max` picks (max sim, then min cluster
    // via negated id — the same tie-break the old window used). vs the
    // previous crossJoin + row_number window this is zero row explosion and
    // ZERO shuffle: at 1B vectors x 256 centroids the window exchanged
    // 256x the corpus; this touches each row once where it sits.
    val centArr = array(centroids.map { case (c, v) =>
      struct(lit(c).as("cluster"), array(v.map(lit): _*).as("cv")) }: _*)
    val scored = transform(centArr, c =>
      struct(Similarity.cosine($"ev", c.getField("cv")).as("sim"),
        (-c.getField("cluster")).as("negc")))
    val assigned = emb.select($"vec_id", $"ev",
      (-array_max(scored).getField("negc")).as("cluster"))
    Index(assigned, centroids)
  }

  /** Persist the index partitioned BY CLUSTER — the at-rest layout the
    * build scaladoc promises: a probe filtering on `cluster` reads only
    * `nProbe`/`nCentroids` of the files, enforced by parquet partition
    * pruning (spec asserts `PartitionFilters` + on-disk layout). At 100 TB
    * the probe's I/O is proportional to the probed clusters, not the
    * corpus.
    */
  def writeIndex(index: Index, path: String): Unit =
    index.assigned.write.partitionBy("cluster").mode("overwrite").parquet(path)

  /** Reattach a persisted index (centroids are driver-side state and small:
    * re-supply them from the build, or re-derive via a tiny scan). */
  def readIndex(spark: SparkSession, path: String,
      centroids: Array[(Int, Seq[Double])]): Index =
    Index(spark.read.parquet(path), centroids)

  /** Top-k by cosine for `queryVec`, probing the `nProbe` closest clusters. */
  def search(index: Index, queryVec: Seq[Double], nProbe: Int, k: Int): DataFrame = {
    val spark = index.assigned.sparkSession
    import spark.implicits._
    def cosLocal(a: Seq[Double], b: Seq[Double]): Double = {
      var dot = 0.0; var na = 0.0; var nb = 0.0; var i = 0
      while (i < a.length) {
        dot += a(i) * b(i); na += a(i) * a(i); nb += b(i) * b(i); i += 1
      }
      dot / (math.sqrt(na) * math.sqrt(nb))
    }
    val probed = index.centroids
      .map { case (c, v) => (c, cosLocal(queryVec, v)) }
      .sortBy { case (c, s) => (-s, c) }
      .take(nProbe).map(_._1)

    val qLit = array(queryVec.map(lit): _*)
    index.assigned
      .filter($"cluster".isin(probed.toIndexedSeq: _*)) // partition pruning at scale
      .select($"vec_id", round(Similarity.cosine($"ev", qLit), 4).as("cos"))
      .orderBy($"cos".desc, $"vec_id")
      .limit(k)
  }
}
