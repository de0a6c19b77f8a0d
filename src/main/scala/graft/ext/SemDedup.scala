package graft.ext

import graft.queries.Similarity
import org.apache.spark.sql.DataFrame
import org.apache.spark.sql.functions._

/** Semantic deduplication over an embedding column — the SemDeDup recipe
  * (Abbas et al., arXiv 2303.09540) re-expressed Spark-first: cluster the
  * embedding space, compare vectors only WITHIN a cluster, and drop any
  * vector with a sufficiently-similar lower-id neighbor. Note this is NOT
  * greedy keep-first as the paper stages it: a vector is dropped if ANY
  * lower-id same-cluster neighbor is similar, including neighbors that
  * were themselves dropped — transitive over-suppression in similarity
  * chains is accepted by design, because it makes the verdict a pure
  * one-pass function of the pair set (no iteration, oracle-derivable).
  * The reference engine has no embedding-space dedup (closest surface:
  * the row-identity loads in its resources SQL); this extends the dedup
  * pillar (exact → MinHash → SimHash → semantic) for data curation.
  *
  * Scale shape: the only all-pairs work is per-cluster. With k clusters of
  * ~n/k vectors the candidate join is an equi-join on `cluster` producing
  * Σ n_c² /2 pairs instead of n²/2 — at 100 TB the operator's cost is
  * controlled by k (more centroids = smaller clusters = fewer pairs), and
  * the cluster-keyed shuffle matches IvfAnn's at-rest partitioning, so a
  * persisted index feeds this with zero additional exchange. A FIXED k is
  * therefore a scale cliff: pair count grows as n²/k, measured 5.24× wall
  * at 10× data with k=8 vs 1.2× when k grows with n (BENCH_SCALE.json,
  * r8). The k∝n default below makes linear scaling the path callers get
  * without reading this paragraph. Vectors ride
  * the pair join deliberately: the cosine must be computed per pair, and
  * re-attaching two vectors per candidate would cost MORE than carrying
  * them through the cluster-bounded join (the ids-only rejoin rule applies
  * when candidates ≫ rows, which banding guarantees for LSH but clustering
  * does not).
  *
  * Determinism: built on [[IvfAnn.build]] at `lloydIters = 0`, whose
  * md5-ordered seeding + argmax-cosine assignment the DuckDB oracle
  * re-derives bit-exactly (see x4_ann_ivf); the drop rule keeps the
  * lowest vec_id of every similar pair, so the output is seed-free and
  * hash-exact at the gate.
  */
object SemDedup {

  /** Default vectors-per-cluster target for the auto-k overload. ~250
    * bounds within-cluster pair work at ~31k pairs/cluster while keeping
    * clusters large enough that near-duplicates co-locate.
    */
  val DefaultTargetClusterSize = 250

  /** Scale-safe default entry point: derives `nCentroids` from the input
    * size so within-cluster pair work stays ~linear in n. One cheap
    * count of the projected id column (vectors are pruned at the scan),
    * then k = max(8, ceil(n / targetClusterSize)). The explicit-k
    * overload below remains for oracle rows, which need k to appear
    * literally in SQL.
    */
  def semanticDedup(e: DataFrame, tau: Double): DataFrame =
    semanticDedup(e, tau, DefaultTargetClusterSize)

  def semanticDedup(e: DataFrame, tau: Double, targetClusterSize: Int): DataFrame = {
    val n = e.select(col("vec_id")).count()
    val k = math.max(8L, (n + targetClusterSize - 1) / targetClusterSize)
    semanticDedup(e, nCentroids = k.toInt, tau = tau)
  }

  /** Per-vector verdicts: (vec_id, cluster, kept), ordered by vec_id.
    * A vector is dropped iff some SAME-CLUSTER vector with a smaller id
    * has round(cosine, 4) ≥ `tau` — one pass, no iteration to converge
    * (unlike connected components, the canonical representative is
    * defined a priori by id order). The lower-id neighbor that triggers
    * a drop may itself be dropped: this deviates from greedy keep-first
    * (which compares only against the kept set) and over-suppresses in
    * similarity chains — accepted so the verdict stays a pure function
    * of the pair set, derivable by a non-iterative oracle query.
    */
  def semanticDedup(e: DataFrame, nCentroids: Int, tau: Double): DataFrame =
    verdicts(IvfAnn.build(e, nCentroids, lloydIters = 0).assigned, tau)

  /** Coarse-assigned variant for VERY large auto-k codebooks: flat
    * assignment is O(n·k) = O(n²/cellSize) once k ∝ n (measured 28.6×
    * wall at 100× data — BENCH_SCALE r9_100x_curation_ops); this path
    * quantizes through ≈√k coarse groups (IvfAnn.assignCoarse) for
    * O(n·√k). APPROXIMATE: cell boundaries can differ from the flat
    * assignment, so pair candidates near unprobed-group boundaries may
    * be missed — acceptable for curation dedup (the same trade IVF
    * probes make); use the exact path when the gate demands
    * SQL-derivability.
    */
  def semanticDedupCoarse(e: DataFrame, tau: Double,
      targetClusterSize: Int = DefaultTargetClusterSize): DataFrame = {
    val n = e.select(col("vec_id")).count()
    val k = math.max(8L, (n + targetClusterSize - 1) / targetClusterSize).toInt
    val cents = IvfAnn.seedCentroids(e, k)
    verdicts(IvfAnn.assignCoarse(e, cents), tau)
  }

  /** The shared drop-rule tail over an assignment frame
    * (vec_id, ev, cluster). */
  private def verdicts(assignedRaw: DataFrame, tau: Double): DataFrame = {
    // materialization barrier: `assigned` feeds both pair-join sides and
    // the final verdict join; without it the typed assignment kernel (and
    // the scan below it) re-runs three times. localCheckpoint (not cache)
    // — blocks free with the RDD, nothing accumulates across invocations.
    val assigned = assignedRaw.localCheckpoint(true)
    val x = assigned.select(col("cluster"), col("vec_id"), col("ev"))
    val y = assigned.select(col("cluster"),
      col("vec_id").as("y_id"), col("ev").as("y_ev"))
    val dropped = x.join(y, Seq("cluster"))
      .filter(col("y_id") < col("vec_id") &&
        round(Similarity.cosine(col("ev"), col("y_ev")), 4) >= tau)
      .select(col("vec_id")).distinct()
    assigned.join(dropped.withColumn("hit", lit(true)), Seq("vec_id"), "left")
      .select(col("vec_id"), col("cluster"), col("hit").isNull.as("kept"))
      .orderBy(col("vec_id"))
  }
}
