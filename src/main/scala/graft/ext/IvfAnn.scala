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
  * pre-count), refine them with `lloydIters` k-means passes (per-cluster
  * mean, computed distributed and collected as k×dim rows — bounded by the
  * codebook size, never the corpus), then assign every vector to its
  * nearest centroid in ONE narrow shuffle-free pass. The codebook ships as
  * a BROADCAST variable consumed by a typed mapPartitions kernel — NOT as
  * k×dim literal expression nodes, which blow up analysis/codegen beyond
  * k·dim ≈ 10⁴ (the realistic regime is k=1024..65536 × dim=64..1024; a
  * broadcast is one executor-wide send of the raw doubles). At rest the
  * assignment persists partitioned by `cluster` ([[writeIndex]]), so a
  * probe reads only `nProbe`/`nCentroids` of the data (parquet partition
  * pruning does the work).
  *
  * Search: rank centroids by query similarity, scan only the top `nProbe`
  * clusters, exact cosine (native codegen expression) within them.
  * Recall/latency trades via nProbe; nProbe = nCentroids degrades to exact.
  */
object IvfAnn {

  final case class Index(assigned: DataFrame, centroids: Array[(Int, Seq[Double])])

  // `private` would compile to package-private bytecode Janino's generated
  // encoder code cannot call (see spark4 gotchas); private[ext] is public
  // at the JVM level
  private[ext] final case class EmbRow(vec_id: Long, ev: Seq[Double])
  private[ext] final case class AssignedRow(vec_id: Long, ev: Seq[Double], cluster: Int)
  private[ext] final case class ProbeRow(qid: Long, qv: Seq[Double], cluster: Int)

  /** Cosine of `v` against every codebook row; shared by assignment and
    * query-probe ranking so the two sides can never disagree. */
  private[ext] def centroidSims(cs: Array[Array[Double]], cNorm: Array[Double],
      v: Seq[Double]): Array[Double] = {
    var nv = 0.0
    var i = 0
    while (i < v.length) { nv += v(i) * v(i); i += 1 }
    val vn = math.sqrt(nv)
    val sims = new Array[Double](cs.length)
    var c = 0
    while (c < cs.length) {
      val cv = cs(c)
      var dot = 0.0
      i = 0
      while (i < cv.length) { dot += v(i) * cv(i); i += 1 }
      sims(c) = dot / (vn * cNorm(c))
      c += 1
    }
    sims
  }

  private[ext] def norms(cs: Array[Array[Double]]): Array[Double] =
    cs.map { c =>
      var s = 0.0; var i = 0
      while (i < c.length) { s += c(i) * c(i); i += 1 }
      math.sqrt(s)
    }

  /** Nearest-centroid assignment as one narrow typed pass: the codebook is
    * a broadcast Array[Array[Double]] (cluster id = array index) and each
    * partition scores its rows in a JIT-compiled while-loop — zero shuffle,
    * zero row explosion, plan size independent of k. Tie-break: highest
    * cosine, then lowest cluster id (ascending scan with strict `>`).
    */
  private def assignTo(emb: DataFrame, cents: Array[Array[Double]]): DataFrame = {
    val spark = emb.sparkSession
    import spark.implicits._
    val bc = spark.sparkContext.broadcast(cents)
    emb.select(col("vec_id"), col("ev")).as[EmbRow].mapPartitions { it =>
      val cs = bc.value
      val cNorm = norms(cs)
      it.map { r =>
        val sims = centroidSims(cs, cNorm, r.ev)
        var best = Double.NegativeInfinity
        var bestC = 0
        var c = 0
        while (c < sims.length) {
          if (sims(c) > best) { best = sims(c); bestC = c }
          c += 1
        }
        AssignedRow(r.vec_id, r.ev, bestC)
      }
    }.toDF()
  }

  /** vec_id-keyed assignment against a FIXED codebook, for callers that
    * extend an existing index without retraining (FAISS-style add):
    * [[graft.streaming.AnnStream]] per micro-batch, and its parity spec's
    * batch side. Same kernel and tie-break as [[assignTo]]. */
  private[graft] def assign(emb: DataFrame,
      cents: Array[Array[Double]]): DataFrame = assignTo(emb, cents)

  /** Path-keyed nearest-centroid assignment for streaming callers
    * ([[graft.streaming.SemDedupStream]]): same broadcast-codebook
    * mapPartitions kernel as [[assignTo]] (shared [[centroidSims]], same
    * tie-break) over (path: String, ev) rows. Returns
    * (path, ev, cluster). */
  private[graft] def assignKeyed(df: DataFrame, cents: Array[Array[Double]]): DataFrame = {
    val spark = df.sparkSession
    import spark.implicits._
    val bc = spark.sparkContext.broadcast(cents)
    df.select(col("path"), col("ev")).as[(String, Seq[Double])]
      .mapPartitions { it =>
        val cs = bc.value
        val cNorm = norms(cs)
        it.map { case (p, ev) =>
          val sims = centroidSims(cs, cNorm, ev)
          var best = Double.NegativeInfinity
          var bestC = 0
          var c = 0
          while (c < sims.length) {
            if (sims(c) > best) { best = sims(c); bestC = c }
            c += 1
          }
          (p, ev, bestC)
        }
      }.toDF("path", "ev", "cluster")
  }

  /** One Lloyd (k-means) step: per-cluster element-wise mean of the current
    * assignment. Distributed as posexplode → partial+final avg — the only
    * exchange carries (cluster, pos) partials, and only k×dim rows reach
    * the driver. Clusters that lost all members keep their previous
    * centroid, so the codebook size never shrinks. Cosine scoring is
    * scale-invariant, so the un-normalized mean is a valid spherical
    * k-means update.
    */
  private def lloydStep(emb: DataFrame, cents: Array[Array[Double]]): Array[Array[Double]] = {
    val means = assignTo(emb, cents)
      .select(col("cluster"), posexplode(col("ev")).as(Seq("pos", "x")))
      .groupBy(col("cluster"), col("pos")).agg(avg(col("x")).as("m"))
      .collect()
    val next = cents.map(_.clone())
    val touched = new Array[Boolean](cents.length)
    means.foreach { r =>
      val c = r.getInt(0)
      if (!touched(c)) { java.util.Arrays.fill(next(c), 0.0); touched(c) = true }
      next(c)(r.getInt(1)) = r.getDouble(2)
    }
    next
  }

  /** Build the index over (vec_id, ev: array<double>) rows. Seeds = the top
    * `nCentroids` vectors in md5-hash order (`md5_le64(vec_id) >>> 4`, the
    * 60-bit positive value DuckDB reproduces as
    * `md5_number_upper(vec_id::VARCHAR) >> 4` — signed/unsigned orderings
    * agree because both are non-negative) — a deterministic pseudo-random
    * sample taken as ONE distributed TakeOrdered pass (per-partition top-k,
    * then merge): exactly min(n, nCentroids) seed rows reach the driver,
    * never the full id column, with no count() pre-scan and no undershoot.
    * The oracle-recomputable hash family means a `lloydIters = 0` index is
    * derivable end-to-end in SQL (the x4_ann_ivf gate row); Lloyd
    * refinement itself is float-averaging and NOT cross-engine bit-stable,
    * so refined indexes are anchored via the full-probe == brute-force
    * oracle row (x4_ann_ivf_join) instead. `lloydIters` refinement passes
    * follow (each is one narrow scan + one k×dim-bounded aggregate), so
    * total data passes = lloydIters + 1 beyond seeding.
    */
  /** The md5-ordered deterministic seed sample (build scaladoc) as a
    * driver-side codebook — shared by [[build]] and the coarse-assigned
    * SemDedup variant so seeding can never diverge between them. */
  private[graft] def seedCentroids(emb: DataFrame, nCentroids: Int): Array[Array[Double]] = {
    val spark = emb.sparkSession
    import spark.implicits._
    emb.select($"vec_id", $"ev")
      .orderBy(shiftrightunsigned(
        graft.functions.Md5Hash64.md5_le64($"vec_id".cast("string")), 4),
        $"vec_id")
      .limit(nCentroids).collect()
      .map(r => r.getSeq[Double](r.fieldIndex("ev")).toArray)
  }

  def build(emb: DataFrame, nCentroids: Int, lloydIters: Int = 1): Index = {
    var cents: Array[Array[Double]] = seedCentroids(emb, nCentroids)

    (1 to lloydIters).foreach(_ => cents = lloydStep(emb, cents))

    val centroids = cents.zipWithIndex.map { case (v, i) => (i, v.toSeq) }
    Index(assignTo(emb, cents), centroids)
  }

  /** Two-level (coarse-quantized) assignment for LARGE codebooks — the
    * next rung up the scale ladder after auto-k: flat assignment is
    * O(n·k), and with k ∝ n that is O(n²/cellSize) (measured: the 100×
    * corpus at k=800 is 160M cosine evals, 28.6× wall — BENCH_SCALE
    * `r9_100x_curation_ops`). Here the k fine centroids are themselves
    * clustered driver-side into ≈√k coarse groups (tiny: k×dim doubles,
    * a few Lloyd passes in-process); each vector ranks the coarse
    * centroids and scores ONLY the fine centroids of its best
    * `coarseProbe` groups — O(n·(√k + coarseProbe·k/√k)).
    *
    * APPROXIMATE by design: a vector whose true nearest fine centroid
    * lives in an unprobed coarse group lands in its best probed one
    * (the standard IVF coarse-quantizer trade; agreement with flat
    * assignment is spec-pinned ≥ 95% at coarseProbe = 2 on real
    * embeddings). EXACT when `coarseProbe >= nCoarse`: every fine
    * centroid is scored and ties break identically to [[assignTo]]
    * (members scanned in ascending cluster id) — spec-pinned equal.
    */
  private[graft] def assignCoarse(emb: DataFrame, cents: Array[Array[Double]],
      coarseProbe: Int = 2): DataFrame = {
    val spark = emb.sparkSession
    import spark.implicits._
    val k = cents.length
    val nCoarse = math.max(1, math.ceil(math.sqrt(k.toDouble)).toInt)
    // driver-side spherical k-means over the codebook itself
    var coarse: Array[Array[Double]] =
      Array.tabulate(nCoarse)(g => cents(g * k / nCoarse).clone())
    val cNormFine = norms(cents)
    var iter = 0
    var members: Array[Array[Int]] = null
    while (iter < 5) {
      val cNormCoarse = norms(coarse)
      val groupOf = Array.tabulate(k) { c =>
        var best = Double.NegativeInfinity
        var bestG = 0
        var g = 0
        while (g < nCoarse) {
          var dot = 0.0
          var i = 0
          while (i < coarse(g).length) { dot += cents(c)(i) * coarse(g)(i); i += 1 }
          val sim = dot / (cNormFine(c) * cNormCoarse(g))
          if (sim > best) { best = sim; bestG = g }
          g += 1
        }
        bestG
      }
      members = Array.tabulate(nCoarse)(g =>
        (0 until k).filter(groupOf(_) == g).toArray)
      // recompute coarse means (empty groups keep their centroid)
      coarse = Array.tabulate(nCoarse) { g =>
        if (members(g).isEmpty) coarse(g)
        else {
          val m = new Array[Double](cents(0).length)
          members(g).foreach { c =>
            var i = 0
            while (i < m.length) { m(i) += cents(c)(i); i += 1 }
          }
          var i = 0
          while (i < m.length) { m(i) /= members(g).length; i += 1 }
          m
        }
      }
      iter += 1
    }

    val bcFine = spark.sparkContext.broadcast(cents)
    val bcCoarse = spark.sparkContext.broadcast(coarse)
    val bcMembers = spark.sparkContext.broadcast(members)
    val probe = math.min(coarseProbe, nCoarse)
    emb.select(col("vec_id"), col("ev")).as[EmbRow].mapPartitions { it =>
      val fine = bcFine.value
      val grps = bcCoarse.value
      val mem = bcMembers.value
      val fNorm = norms(fine)
      val gNorm = norms(grps)
      it.map { r =>
        val gSims = centroidSims(grps, gNorm, r.ev)
        val probed = gSims.indices.sortBy(g => (-gSims(g), g)).take(probe)
        // scan candidate fine centroids in ASCENDING cluster id so the
        // tie-break matches assignTo exactly at full probe. Degenerate
        // codebooks can leave stale EMPTY coarse groups that outrank the
        // populated ones — an empty candidate set would silently assign
        // cluster 0, so fall back to the exact full scan instead
        val probedCand = probed.flatMap(mem(_)).sorted
        val cand =
          if (probedCand.nonEmpty) probedCand else fine.indices.toSeq
        var nv = 0.0
        var i = 0
        while (i < r.ev.length) { nv += r.ev(i) * r.ev(i); i += 1 }
        val vn = math.sqrt(nv)
        var best = Double.NegativeInfinity
        var bestC = 0
        cand.foreach { c =>
          val cv = fine(c)
          var dot = 0.0
          i = 0
          while (i < cv.length) { dot += r.ev(i) * cv(i); i += 1 }
          val sim = dot / (vn * fNorm(c))
          if (sim > best) { best = sim; bestC = c }
        }
        AssignedRow(r.vec_id, r.ev, bestC)
      }
    }.toDF()
  }

  /** k∝n build: derives `nCentroids = max(kMin, ceil(n/targetCellSize))`
    * from one projected count — the same scale rule SemDedup's auto-k
    * default applies (a FIXED k makes cells grow with n, ballooning both
    * probe I/O and any within-cell work; constant cell size keeps them
    * flat). Explicit-k [[build]] remains for oracle rows and for callers
    * tuning the recall/latency trade deliberately.
    */
  def buildAuto(emb: DataFrame, targetCellSize: Int = 256,
      lloydIters: Int = 1, kMin: Int = 8): Index = {
    val n = emb.select(col("vec_id")).count()
    val k = math.max(kMin.toLong, (n + targetCellSize - 1) / targetCellSize)
    build(emb, k.toInt, lloydIters)
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

  /** Batch kNN join: top-k neighbors for EVERY row of a query table, each
    * query probing only its `nProbe` closest clusters — the scale path for
    * bulk retrieval (the brute-force twin is a cross join against the
    * whole corpus). Shape:
    *
    *  1. each query ranks the broadcast codebook locally and explodes into
    *     `nProbe` (qid, qv, cluster) rows — narrow, same kernel as the
    *     index assignment so the two sides can never disagree;
    *  2. probes equi-join the index on `cluster` — the ONLY shuffle, keyed
    *     by cluster exactly like the index's at-rest partitioning, so
    *     against a [[writeIndex]] layout the scan side is pruned AND
    *     co-located (no all-pairs path anywhere). The probe rows carry qv
    *     (nProbe copies per query) deliberately: when the query table is
    *     broadcast-sized the join needs no exchange at all, and when it
    *     is not, probes×dim is still far smaller than the alternative of
    *     re-attaching qv per CANDIDATE (candidates ≈ queries × corpus/k ×
    *     nProbe rows ≫ probes) — the ids-only rejoin rule applies to
    *     candidate-pair generation, not to this side;
    *  3. exact cosine (native codegen expression) scores survivors; top-k
    *     per query via a window PARTITIONED BY qid (parallel across
    *     queries, never a global sort).
    *
    * `nProbe = nCentroids` degrades to exact brute force (spec + oracle
    * anchor); `excludeSelf` drops vec_id == qid matches (corpus-internal
    * retrieval).
    */
  def searchJoin(index: Index, queries: DataFrame, nProbe: Int, k: Int,
      excludeSelf: Boolean = true): DataFrame = {
    val spark = index.assigned.sparkSession
    import spark.implicits._
    val cents = index.centroids.map(_._2.toArray)
    val bc = spark.sparkContext.broadcast(cents)
    val probes = queries.select(col("qid"), col("qv")).as[(Long, Seq[Double])]
      .mapPartitions { it =>
        val cs = bc.value
        val cNorm = norms(cs)
        it.flatMap { case (qid, qv) =>
          val sims = centroidSims(cs, cNorm, qv)
          sims.indices.sortBy(c => (-sims(c), c)).take(nProbe)
            .map(c => ProbeRow(qid, qv, c))
        }
      }.toDF()

    val w = org.apache.spark.sql.expressions.Window
      .partitionBy($"qid").orderBy($"cos".desc, $"vec_id")
    val joined = index.assigned.join(probes, Seq("cluster"))
    val scored = (if (excludeSelf) joined.filter($"vec_id" =!= $"qid") else joined)
      .select($"qid", $"vec_id",
        round(Similarity.cosine($"ev", $"qv"), 4).as("cos"))
    scored
      .withColumn("rn", row_number().over(w))
      .filter($"rn" <= k)
      .select($"qid", $"rn", $"vec_id", $"cos")
      .orderBy($"qid", $"rn")
  }

  /** Top-k by cosine for `queryVec`, probing the `nProbe` closest clusters.
    * Probe ranking goes through the SAME [[centroidSims]] kernel as index
    * assignment and [[searchJoin]], so the three can never disagree. */
  def search(index: Index, queryVec: Seq[Double], nProbe: Int, k: Int): DataFrame = {
    val spark = index.assigned.sparkSession
    import spark.implicits._
    val cs = index.centroids.map(_._2.toArray)
    val sims = centroidSims(cs, norms(cs), queryVec)
    val probed = sims.indices.sortBy(c => (-sims(c), c)).take(nProbe)

    val qLit = array(queryVec.map(lit): _*)
    index.assigned
      .filter($"cluster".isin(probed.toIndexedSeq: _*)) // partition pruning at scale
      .select($"vec_id", round(Similarity.cosine($"ev", qLit), 4).as("cos"))
      .orderBy($"cos".desc, $"vec_id")
      .limit(k)
  }
}
