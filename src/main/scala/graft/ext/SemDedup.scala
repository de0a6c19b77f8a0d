package graft.ext

import graft.queries.Similarity
import org.apache.spark.sql.{Column, DataFrame}
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

  /** Above this derived k the default path routes assignment through the
    * two-level coarse quantizer ([[IvfAnn.assignCoarse]]): flat assignment
    * is O(n·k) cosines, and with auto-k's k ∝ n that is O(n²/cellSize) —
    * measured 28.6× wall at 100× data vs 4.1× faster coarse
    * (BENCH_SCALE `r9_100x_curation_ops`). At k ≤ 64 the flat scan is at
    * most 64 cosines/vector — cheaper than the coarse path's two-level
    * bookkeeping — and stays exactly SQL-derivable.
    */
  val CoarseDispatchK = 64

  /** Refusal bound for the RELATIONAL folds (r20 verdict item 1): a
    * parameterization whose within-cluster candidate-pair volume exceeds
    * this many pairs PER INPUT ROW is a scale cliff, not a workload —
    * fixed k holds cluster count constant so pairs/row grows linearly in
    * n without bound (measured: the fixed-k=8 incremental arm burned
    * 398 s at the 100× corpus, ~6.2k pairs/row, while auto-k's k ∝ n
    * holds pairs/row at ~targetClusterSize/2 ≈ 125 forever). The bound
    * is RELATIVE so legitimate linear-scaling work never trips it at any
    * corpus size; the gate shapes sit below ~65 pairs/row at every SF.
    * The refusal is loud and names the remedy (the auto-k overload). */
  val PairsPerRowGuard = 2000L

  /** Hot-cluster cap for the typed kernel (r20 verdict item 4): the
    * kernel buffers each cluster with `it.toArray`, fine at the auto-k
    * expectation (~targetClusterSize rows) but unbounded against a
    * pathological cluster that attracts far more — at 100 TB a single
    * hot cell could exceed a task's heap where the relational fold would
    * have spilled. Clusters above CapFactor × targetClusterSize rows are
    * routed to the relational fold (bit-identical verdicts, spec-pinned;
    * SMJ/aggregate operators spill gracefully), everything else stays on
    * the kernel. Detection is one cheap count over the checkpointed
    * assignment; with no hot cluster the kernel plan is unchanged. */
  val HotClusterCapFactor = 16

  /** Within-cluster candidate-pair volume Σ s·(s−1)/2 over the cluster
    * sizes of `assigned` — the exact row count the relational fold's
    * cluster equi-join materializes, computed from the (checkpointed)
    * assignment for the refusal guard. One small aggregation job. */
  private def pairVolume(assigned: DataFrame): (Long, Long) = {
    val row = assigned.groupBy(col("cluster"))
      .agg(count(lit(1)).as("s"))
      .agg(sum(expr("s * (s - 1) div 2")).as("pv"), sum(col("s")).as("n"))
      .head()
    (if (row.isNullAt(0)) 0L else row.getLong(0),
      if (row.isNullAt(1)) 0L else row.getLong(1))
  }

  /** Throws when `assigned`'s pair volume exceeds [[PairsPerRowGuard]]
    * pairs per row — the loud fail-fast a declared query owes a caller
    * instead of a host-killing spill (r20 verdict item 1). */
  private def guardPairVolume(assigned: DataFrame, form: String): Unit = {
    val (pv, n) = pairVolume(assigned)
    if (n > 0 && pv / n > PairsPerRowGuard)
      throw new IllegalStateException(refusalMessage(pv, n, form))
  }

  private def refusalMessage(pv: Long, n: Long, form: String): String =
    s"semdedup $form refused: within-cluster candidate-pair volume " +
      s"$pv over $n rows (${pv / n} pairs/row) exceeds the " +
      s"$PairsPerRowGuard pairs/row bound - a fixed cluster count " +
      "is quadratic in corpus size. Use the auto-k overload " +
      "(semanticDedup(e, tau) / incrementalSemDedup(e, waveCol, " +
      "waves, tau, targetClusterSize)), which holds pairs/row " +
      "constant by deriving k from n."

  /** Scale-safe default entry point: derives `nCentroids` from the input
    * size so within-cluster pair work stays ~linear in n. One cheap
    * count of the projected id column (vectors are pruned at the scan),
    * then k = max(8, ceil(n / targetClusterSize)). When the derived k
    * exceeds [[CoarseDispatchK]], assignment dispatches through the
    * O(n·√k) coarse quantizer instead of the O(n·k) flat scan — the
    * scale-safe path is what callers get WITHOUT reading the scaladoc;
    * pass `exact = true` to force flat assignment (bit-exact,
    * SQL-derivable) at any k. The explicit-k overload below remains for
    * oracle rows, which need k to appear literally in SQL.
    */
  def semanticDedup(e: DataFrame, tau: Double): DataFrame =
    semanticDedup(e, tau, DefaultTargetClusterSize)

  def semanticDedup(e: DataFrame, tau: Double, targetClusterSize: Int): DataFrame =
    semanticDedup(e, tau, targetClusterSize, exact = false)

  def semanticDedup(e: DataFrame, tau: Double, targetClusterSize: Int,
      exact: Boolean): DataFrame = {
    // one materialization barrier up front: the count and the subsequent
    // seeding/assignment must see the SAME rows (a non-deterministic
    // input recomputed between the two actions could disagree with the
    // derived k), and the checkpoint also saves the second full scan
    val ec = e.localCheckpoint(true)
    val n = ec.select(col("vec_id")).count()
    val k = math.max(8L, (n + targetClusterSize - 1) / targetClusterSize).toInt
    if (!exact && k > CoarseDispatchK)
      verdicts(IvfAnn.assignCoarse(ec, IvfAnn.seedCentroids(ec, k)), tau)
    else
      semanticDedup(ec, nCentroids = k, tau = tau)
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

  /** Coarse-assigned variant, unconditionally: same two-level quantizer
    * the default path dispatches to above [[CoarseDispatchK]], but
    * applied at ANY derived k (useful for measuring the crossover).
    * APPROXIMATE: cell boundaries can differ from the flat assignment,
    * so pair candidates near unprobed-group boundaries may be missed —
    * acceptable for curation dedup (the same trade IVF probes make); use
    * `semanticDedup(e, tau, target, exact = true)` when the gate demands
    * SQL-derivability.
    */
  def semanticDedupCoarse(e: DataFrame, tau: Double,
      targetClusterSize: Int = DefaultTargetClusterSize): DataFrame = {
    val ec = e.localCheckpoint(true)
    val n = ec.select(col("vec_id")).count()
    val k = math.max(8L, (n + targetClusterSize - 1) / targetClusterSize).toInt
    verdicts(IvfAnn.assignCoarse(ec, IvfAnn.seedCentroids(ec, k)), tau)
  }

  /** Per-cluster in-loop cosine shared by the batch and incremental
    * typed kernels: replicates CosineSim's exact arithmetic (sequential
    * accumulation, dot / (√na·√nb)) and Spark's round(_, 4) semantics
    * (scala BigDecimal HALF_UP; non-finite cosines compare raw, like
    * round's pass-through), so kernel verdicts are BIT-IDENTICAL to the
    * relational folds — spec-pinned in both fold families. Constructed
    * per group inside flatMapGroups, never serialized. */
  private final class PairSim(evs: Array[Array[Double]], tau: Double) {
    private val nrm = new Array[Double](evs.length)
    locally {
      var i = 0
      while (i < evs.length) {
        val v = evs(i); var s = 0.0; var p = 0
        while (p < v.length) { s += v(p) * v(p); p += 1 }
        nrm(i) = math.sqrt(s); i += 1
      }
    }
    def similar(a: Int, b: Int): Boolean = {
      val x = evs(a); val y = evs(b)
      if (x.length != y.length) false // cosine null -> filter false
      else {
        var dot = 0.0; var p = 0
        while (p < x.length) { dot += x(p) * y(p); p += 1 }
        val c = dot / (nrm(a) * nrm(b))
        if (java.lang.Double.isFinite(c))
          BigDecimal(c).setScale(4,
            scala.math.BigDecimal.RoundingMode.HALF_UP).toDouble >= tau
        else c >= tau // round passes NaN/Inf through; NaN >= tau = false
      }
    }
  }

  /** The shared drop-rule tail over an assignment frame
    * (vec_id, ev, cluster) — r21: runs as a per-cluster TYPED KERNEL
    * (the batch twin of [[incrementalSemDedupKernel]]'s fold; r20 built
    * the kernel only for the incremental family and the batch relational
    * fold kept materializing the in-cell pair rows — the worst 10×
    * factor in r20's full-surface sweep, d_semdedup_auto at 11.36×).
    * Same discipline: bit-identical verdicts (PairSim), hot clusters
    * (above [[HotClusterCapFactor]] × the MEAN cluster size) route to
    * the spilling relational fold, pair-volume guard first. */
  private def verdicts(assignedRaw: DataFrame, tau: Double): DataFrame = {
    // materialization barrier: `assigned` feeds the kernel, the hot
    // detection, and (when routed) both relational join sides; without
    // it the assignment re-runs per consumer. localCheckpoint (not
    // cache) — blocks free with the RDD.
    val assigned = assignedRaw.localCheckpoint(true)
    verdictsRouted(assigned, tau, capOverride = None)
  }

  /** Kernel + hot-cluster routing over a CHECKPOINTED assignment;
    * private[graft] with an explicit cap override so the spec can force
    * every route on a small fixture. The batch fold has no
    * targetClusterSize, so the default cap is relative to the measured
    * MEAN cluster size (≡ 16 × target under auto-k, where n/k ≈
    * target). */
  private[graft] def verdictsRouted(assigned: DataFrame, tau: Double,
      capOverride: Option[Long]): DataFrame = {
    val spark = assigned.sparkSession
    import spark.implicits._
    val sizes = assigned.groupBy(col("cluster")).agg(count(lit(1)).as("s"))
      .localCheckpoint(true) // ≤ k rows
    val stats = sizes.agg(count(lit(1)).as("nc"), sum(col("s")).as("n"))
      .head()
    val nClusters = stats.getLong(0)
    val n = if (stats.isNullAt(1)) 0L else stats.getLong(1)
    val cap = capOverride.getOrElse(HotClusterCapFactor.toLong *
      math.max(1L, if (nClusters > 0) n / nClusters else 1L))
    val hotClusters: Seq[Int] = sizes.filter(col("s") > cap)
      .select(col("cluster").cast("int")).as[Int].collect().toSeq
    // r22 (r21 ADVICE): the pair-volume refusal runs over the
    // KERNEL-BOUND (non-hot) slice only, and from the already-
    // checkpointed ≤k-row sizes frame instead of the second full-corpus
    // aggregation the pre-routing guard paid. A data-skewed hot cluster
    // now routes to the spilling relational fold — built for exactly
    // that, and what the incremental kernel already does — instead of
    // refusing with a remedy (auto-k) the caller may already be using.
    // A fixed-k scale cliff still refuses: its blowup is uniform (every
    // cluster ≈ the mean), so nothing is hot and the guarded slice is
    // the whole assignment (spec-pinned on the 40k fixed-k=8 fixture).
    val gRow = sizes.filter(col("s") <= cap)
      .agg(sum(expr("s * (s - 1) div 2")).as("pv"), sum(col("s")).as("gn"))
      .head()
    val (gPv, gN) = (if (gRow.isNullAt(0)) 0L else gRow.getLong(0),
      if (gRow.isNullAt(1)) 0L else gRow.getLong(1))
    if (gN > 0 && gPv / gN > PairsPerRowGuard)
      throw new IllegalStateException(refusalMessage(gPv, gN, "batch fold"))
    val kernelIn =
      if (hotClusters.isEmpty) assigned
      else assigned.filter(!col("cluster").isin(hotClusters: _*))
    val kernelOut = kernelIn
      .select(col("cluster"), col("vec_id"), col("ev"))
      .as[(Int, Long, Seq[Double])]
      .groupByKey(_._1)
      .flatMapGroups { (cluster, it) =>
        val rows = it.toArray
        val sim = new PairSim(rows.map(_._3.toArray), tau)
        // dropped iff ANY smaller-id same-cluster neighbor is similar —
        // including neighbors that are themselves dropped (the pure
        // pair rule; object scaladoc)
        val order = rows.indices.toArray.sortBy(rows(_)._2)
        val dropped = new Array[Boolean](rows.length)
        var ai = 1
        while (ai < order.length) {
          val a = order(ai)
          var bi = 0
          while (!dropped(a) && bi < ai) {
            if (sim.similar(a, order(bi))) dropped(a) = true
            bi += 1
          }
          ai += 1
        }
        rows.indices.iterator.map(i => (rows(i)._2, cluster, !dropped(i)))
      }
      .toDF("vec_id", "cluster", "kept")
    val out =
      if (hotClusters.isEmpty) kernelOut
      else kernelOut.unionByName(
        verdictsRelational(
          assigned.filter(col("cluster").isin(hotClusters: _*)), tau)
          .select(col("vec_id"), col("cluster"), col("kept")))
    out.orderBy(col("vec_id"))
  }

  /** The oracle-documented relational fold — the hot-cluster remedy
    * path (SMJ/aggregate operators spill where the kernel's per-cluster
    * buffer cannot) and the spec's equality anchor. Input must already
    * be materialized (checkpointed) by the caller. */
  private[graft] def verdictsRelational(assigned: DataFrame,
      tau: Double): DataFrame = {
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

  /** Batch form of [[graft.streaming.SemDedupStream]]'s INCREMENTAL
    * semantics — the semantic member of the incremental-dedup family
    * (see [[IncrementalDedup.keepsBanded]] for the shared wave/store/audit
    * contract; this one folds over a cluster-keyed SIMILARITY join rather
    * than a band-key equality). The quantizer is seeded once from the
    * FULL corpus (md5-ordered seeds, lloydIters = 0 — the SQL-derivable
    * form, and the batch analogue of the stream's offline bootstrap
    * codebook) and held stationary across waves. Per wave:
    *
    *  - **in-wave**: suppressed iff ANY smaller vec_id in the same cell
    *    has round(cosine, 4) ≥ tau — suppressors may themselves be
    *    suppressed (the pure-pair rule both the batch operator and the
    *    stream's per-batch pass use);
    *  - **cross-wave**: suppressed iff any KEPT vector of an earlier
    *    wave in the same cell is ≥ tau similar — kept-only registration
    *    bounds the store by canonicals, so similarity chains split
    *    across waves can diverge from single-batch verdicts BY DESIGN
    *    (SemDedupStream scaladoc).
    *
    * Returns (vec_id, wave, cluster, hit_batch, hit_store, kept) ordered
    * by vec_id — the audit the `d_semdedup_incremental` gate re-derives
    * in DuckDB from the same seeds, assignment, and rounded cosines.
    */
  /** The batch auto-k rule as a pure function — shared by the batch
    * overloads here, the incremental auto overload, and
    * [[graft.streaming.SemDedupStream.bootstrapCodebook]], so the derived
    * cluster count can never diverge between batch and stream. Integer
    * arithmetic only (ceil-division), so an oracle re-derives it. */
  def autoK(n: Long, targetClusterSize: Int): Int =
    math.max(8L, (n + targetClusterSize - 1) / targetClusterSize).toInt

  /** AUTO-K incremental semantic dedup — the remedy for the fixed-k
    * quadratic cliff, wired into the incremental path as its sizing rule
    * (r18: the fixed-k=8 shape reads 229 s at the 100× corpus where
    * k = n/250 reads 30.4 s; per-cell pair work is (n/k)²·k, so k ∝ n
    * holds per-cell size constant). One cheap count of the id column,
    * k = [[autoK]](n, targetClusterSize), then the explicit-k fold —
    * flat (exact, SQL-derivable) assignment, deliberately: the gate
    * oracle re-derives seeds + assignment at the DERIVED k, so the width
    * rule itself is hash-checked data. Output adds a `k_auto` column
    * (the derived k on every row) so the derivation is visible to the
    * oracle, not just implied by the cluster ids. At very large k the
    * assignment is O(n·k); a deployment amortizes that via the offline
    * codebook ([[graft.streaming.SemDedupStream]] bootstraps once and
    * holds the codebook stationary across epochs).
    */
  def incrementalSemDedup(e: DataFrame, waveCol: Column, waves: Seq[Int],
      tau: Double, targetClusterSize: Int): DataFrame =
    incrementalSemDedup(e, waveCol, waves, tau, targetClusterSize,
      exact = false)

  /** r19 verdict item 3 (two stages, both r20): the auto-k incremental
    * path's superlinear terms are gone on the SHIPPED path.
    *
    *  - **Assignment**: dispatches through the two-level coarse
    *    quantizer ([[IvfAnn.assignCoarse]], O(n·√k)) above
    *    [[CoarseDispatchK]] — the SAME rule, threshold, and quantizer
    *    as the batch default, so batch and incremental can never
    *    disagree on when the approximation engages. `exact = true`
    *    forces the flat SQL-derivable assignment at any k — the gate
    *    arm (`d_semdedup_incremental_auto` derives k = 8 < 64) rides
    *    the flat assignment under either flag.
    *  - **Fold**: runs as the per-cluster typed kernel
    *    ([[incrementalSemDedupKernel]]) — BIT-IDENTICAL to the
    *    relational fold (spec-pinned under both assignment modes, so
    *    the hash-exact gates are untouched by the routing) without
    *    materializing the in-cell candidate pairs as wide rows.
    *
    * Steal-clean 100× walls (r20_seminc_ivf): 26.9 s flat relational →
    * 10.9 s coarse relational → 4.55 s shipped kernel. The relational
    * overloads below remain the oracle-documented forms the explicit-k
    * gates derive in SQL. */
  def incrementalSemDedup(e: DataFrame, waveCol: Column, waves: Seq[Int],
      tau: Double, targetClusterSize: Int, exact: Boolean): DataFrame =
    incrementalSemDedupKernel(e, waveCol, waves, tau, targetClusterSize,
      exact)

  def incrementalSemDedup(e: DataFrame, waveCol: Column, waves: Seq[Int],
      nCentroids: Int, tau: Double): DataFrame =
    incrementalFold(
      assignLabeled(e, waveCol, coarse = false, nCentroids), waves, tau)

  /** Coarse-assigned incremental variant, unconditionally (the
    * [[semanticDedupCoarse]] analogue): same fold, assignment through
    * the two-level quantizer at ANY k — useful for measuring the
    * crossover. APPROXIMATE (cell-boundary caveat at
    * [[IvfAnn.assignCoarse]]); use the explicit-k overload when the
    * gate demands SQL-derivability. */
  def incrementalSemDedupCoarse(e: DataFrame, waveCol: Column,
      waves: Seq[Int], nCentroids: Int, tau: Double): DataFrame =
    incrementalFold(
      assignLabeled(e, waveCol, coarse = true, nCentroids), waves, tau)

  /** The incremental fold as ONE per-cluster typed kernel — the scale
    * arm of [[incrementalSemDedup]] (r20). After the coarse dispatch
    * removed the O(n·k) assignment term, the relational fold's
    * remaining 100× cost is MATERIALIZING the in-cell candidate pairs
    * as wide rows (two 64-double vectors per row — ~25M rows at the
    * 100× corpus; they never cross the network, the cluster equi-join
    * co-locates them, but each still pays row construction + codegen
    * dispatch). Every suppression rule is cluster-local (in-wave pure
    * pairs; the kept-only store registers (cluster, vector) rows), and
    * the auto-k invariant bounds the EXPECTED cluster at
    * ~targetClusterSize vectors, so the whole fold runs inside one
    * `flatMapGroups` per cluster: one shuffle (the cluster exchange the
    * relational form also pays), zero pair-row materialization, in-loop
    * cosines replicating CosineSim's exact arithmetic (sequential
    * accumulation, dot / (√na·√nb)) and Spark's round(_, 4)
    * (scala BigDecimal HALF_UP; non-finite cosines compare raw, like
    * round's pass-through) — so verdicts are BIT-IDENTICAL to the
    * relational fold, spec-pinned on the gate corpus under both
    * assignment modes. Same caveat as the relational form: the
    * ~target bound is in expectation — a pathological cluster that
    * attracts far more than target vectors concentrates its quadratic
    * work (and here its memory) in one task. `waveCol` must be
    * int-valued (the incremental gates' convention). */
  def incrementalSemDedupKernel(e: DataFrame, waveCol: Column,
      waves: Seq[Int], tau: Double, targetClusterSize: Int,
      exact: Boolean = false): DataFrame =
    incrementalSemDedupKernel(e, waveCol, waves, tau, targetClusterSize,
      exact, HotClusterCapFactor.toLong * targetClusterSize)

  /** Cap-parameterized form (private[graft] so the spec can force the
    * hot-cluster route on a small fixture): clusters larger than
    * `hotClusterCap` rows bypass the in-memory kernel and run the
    * relational fold — bit-identical verdicts through spilling
    * operators instead of one task's heap (r20 verdict item 4). */
  private[graft] def incrementalSemDedupKernel(e: DataFrame, waveCol: Column,
      waves: Seq[Int], tau: Double, targetClusterSize: Int,
      exact: Boolean, hotClusterCap: Long): DataFrame = {
    require(waves == waves.sorted && waves.distinct == waves,
      "waves must be ascending and distinct (arrival order)")
    val ec = e.localCheckpoint(true)
    val n = ec.select(col("vec_id")).count()
    val k = autoK(n, targetClusterSize)
    val assigned =
      assignLabeled(ec, waveCol, coarse = !exact && k > CoarseDispatchK, k)
    val spark = assigned.sparkSession
    import spark.implicits._
    // hot-cluster routing (scaladoc at [[HotClusterCapFactor]]): one
    // cheap count over the checkpointed assignment finds clusters whose
    // size would concentrate quadratic memory in one kernel task; the
    // id list is driver-bounded (≤ n / cap ids). With no hot cluster —
    // every gate shape and the auto-k expectation — the kernel plan is
    // unchanged.
    val hotClusters: Seq[Int] = assigned.groupBy(col("cluster"))
      .agg(count(lit(1)).as("s")).filter(col("s") > hotClusterCap)
      .select(col("cluster").cast("int")).as[Int].collect().toSeq
    val kernelIn =
      if (hotClusters.isEmpty) assigned
      else assigned.filter(!col("cluster").isin(hotClusters: _*))
    val waveOrder = waves.toArray
    val kernelOut = kernelIn
      .select(col("cluster"), col("vec_id"), col("wave").cast("int"),
        col("ev"))
      .as[(Int, Long, Int, Seq[Double])]
      .groupByKey(_._1)
      .flatMapGroups { (cluster, it) =>
        val rows = it.toArray
        val m = rows.length
        // round(cos, 4) >= tau with CosineSim's exact arithmetic —
        // [[PairSim]] (r21: factored out, shared with the batch kernel)
        val sim = new PairSim(rows.map(_._4.toArray), tau)
        def simTau(a: Int, b: Int): Boolean = sim.similar(a, b)
        // in-wave pure-pair suppression (suppressors may themselves be
        // suppressed): any same-wave smaller-id neighbor at >= tau
        val hitBatch = new Array[Boolean](m)
        rows.indices.groupBy(rows(_)._3).values.foreach { idxs =>
          val byId = idxs.toArray.sortBy(rows(_)._2)
          var a = 1
          while (a < byId.length) {
            var b = 0
            while (!hitBatch(byId(a)) && b < a) {
              if (simTau(byId(a), byId(b))) hitBatch(byId(a)) = true
              b += 1
            }
            a += 1
          }
        }
        // store fold: kept vectors of earlier DECLARED waves only; rows
        // labeled outside `waves` never probe the store, never register
        val hitStore = new Array[Boolean](m)
        val store = scala.collection.mutable.ArrayBuffer.empty[Int]
        waveOrder.foreach { w =>
          val bw = rows.indices.filter(rows(_)._3 == w)
          bw.foreach { a =>
            var s = 0
            while (!hitStore(a) && s < store.length) {
              if (simTau(a, store(s))) hitStore(a) = true
              s += 1
            }
          }
          bw.foreach { a => if (!hitStore(a) && !hitBatch(a)) store += a }
        }
        rows.indices.iterator.map { a =>
          (rows(a)._2, rows(a)._3, cluster, hitBatch(a), hitStore(a),
            !(hitBatch(a) || hitStore(a)))
        }
      }
      .toDF("vec_id", "wave", "cluster", "hit_batch", "hit_store", "kept")
    // hot clusters run the relational fold (unguarded — this IS the
    // remedy path); every suppression rule is cluster-local, so folding
    // the hot slice alone yields verdicts identical to folding it
    // in-place (spec-pinned on a deliberately hot-clustered fixture)
    val out =
      if (hotClusters.isEmpty) kernelOut
      else kernelOut.unionByName(
        incrementalFold(assigned.filter(col("cluster").isin(hotClusters: _*)),
          waves, tau, guarded = false)
          .select(col("vec_id"), col("wave").cast("int").as("wave"),
            col("cluster"), col("hit_batch"), col("hit_store"), col("kept")))
    out.orderBy(col("vec_id")).withColumn("k_auto", lit(k))
  }

  /** Shared assignment stage: label waves, seed the stationary codebook
    * (md5-ordered, lloydIters = 0 — the batch analogue of the stream's
    * offline bootstrap), assign flat or coarse, re-attach waves. */
  private def assignLabeled(e: DataFrame, waveCol: Column, coarse: Boolean,
      nCentroids: Int): DataFrame = {
    val labeled = e.select(col("vec_id"), waveCol.as("wave"), col("ev"))
      .localCheckpoint(true)
    val vecs = labeled.select(col("vec_id"), col("ev"))
    val assignedVecs =
      if (coarse) IvfAnn.assignCoarse(vecs, IvfAnn.seedCentroids(vecs, nCentroids))
      else IvfAnn.build(vecs, nCentroids, lloydIters = 0).assigned
    assignedVecs
      .join(labeled.select(col("vec_id"), col("wave")), Seq("vec_id"))
      .localCheckpoint(true)
  }

  /** The wave fold over an assignment frame (vec_id, ev, cluster, wave):
    * in-wave pure-pair suppression + kept-only cross-wave store —
    * identical under flat and coarse assignment. */
  private def incrementalFold(assigned: DataFrame, waves: Seq[Int],
      tau: Double): DataFrame =
    incrementalFold(assigned, waves, tau, guarded = true)

  /** `guarded = false` skips the pair-volume refusal — used by the
    * kernel's hot-cluster fallback, where routing an oversized cluster
    * HERE (spilling operators) is itself the remedy the guard would
    * otherwise veto. */
  private def incrementalFold(assigned: DataFrame, waves: Seq[Int],
      tau: Double, guarded: Boolean): DataFrame = {
    require(waves == waves.sorted && waves.distinct == waves,
      "waves must be ascending and distinct (arrival order)")
    if (guarded) guardPairVolume(assigned, "incremental fold")
    val spark = assigned.sparkSession

    // in-wave pure-pair suppression, every wave in one cluster-keyed join
    val other = assigned.select(col("cluster"), col("wave"),
      col("vec_id").as("o_id"), col("ev").as("o_ev"))
    val hitBatch = assigned.join(other, Seq("cluster", "wave"))
      .filter(col("o_id") < col("vec_id") &&
        round(Similarity.cosine(col("ev"), col("o_ev")), 4) >= tau)
      .select(col("vec_id")).distinct()
      .withColumn("hit_batch", lit(true))

    // store fold: kept vectors of earlier waves, cluster-keyed
    var store: DataFrame = spark.createDataFrame(
      spark.sparkContext.emptyRDD[org.apache.spark.sql.Row],
      assigned.select(col("cluster"), col("ev").as("p_ev")).schema)
    var hitStore: DataFrame = spark.createDataFrame(
      spark.sparkContext.emptyRDD[org.apache.spark.sql.Row],
      assigned.select(col("vec_id")).schema)
    for (w <- waves) {
      val bw = assigned.filter(col("wave") === w)
      val hs = bw.join(store, Seq("cluster"))
        .filter(round(Similarity.cosine(col("ev"), col("p_ev")), 4) >= tau)
        .select(col("vec_id")).distinct()
      hitStore = hitStore.union(hs)
      val suppressed = hs
        .union(bw.join(hitBatch.select(col("vec_id")), Seq("vec_id"),
          "left_semi").select(col("vec_id")))
        .distinct()
      val keptVecs = bw.join(suppressed, Seq("vec_id"), "left_anti")
        .select(col("cluster"), col("ev").as("p_ev"))
      // per-wave barrier: without it the accumulated store (referenced by
      // both the similarity probe and the next union) doubles the logical
      // plan per wave — see IncrementalDedup.keepsBanded's store fold
      store = store.union(keptVecs).localCheckpoint(true)
    }
    val hitStoreFlag = hitStore.distinct().withColumn("hit_store", lit(true))

    assigned.select(col("vec_id"), col("wave"), col("cluster"))
      .join(hitBatch, Seq("vec_id"), "left_outer")
      .join(hitStoreFlag, Seq("vec_id"), "left_outer")
      .select(col("vec_id"), col("wave"), col("cluster"),
        coalesce(col("hit_batch"), lit(false)).as("hit_batch"),
        coalesce(col("hit_store"), lit(false)).as("hit_store"),
        not(coalesce(col("hit_batch"), lit(false)) ||
          coalesce(col("hit_store"), lit(false))).as("kept"))
      .orderBy(col("vec_id"))
  }
}
