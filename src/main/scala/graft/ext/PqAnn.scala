package graft.ext

import org.apache.spark.sql.DataFrame
import org.apache.spark.sql.functions._

/** Product quantization (PQ) for embedding compression + ADC search —
  * the canonical companion to IVF on the ANN scale ladder (Jégou,
  * Douze, Schmid, "Product Quantization for Nearest Neighbor Search",
  * TPAMI 2011; the reference engine has no embedding ops — this extends
  * the §2.11 X4 similarity pillar).
  *
  * Why it matters at 100 TB: IVF prunes WHICH vectors a probe scans;
  * PQ shrinks WHAT each scan reads. A dim-64 float64 vector is 512
  * bytes; its PQ code at m = 8 sub-quantizers × 16 codes is 8 × 4 bits
  * — 64× less. Candidate scanning becomes a pass over code bytes plus
  * m table lookups per vector (ADC — asymmetric distance computation:
  * the QUERY stays exact, only the corpus side is quantized), so the
  * probe's working set fits in memory at corpus sizes where raw
  * vectors never could. Compose with [[IvfAnn]]: coarse cells prune
  * I/O, PQ codes shrink the residual scan.
  *
  * Scale shape: codebook seeding is ONE distributed TakeOrdered pass
  * (k full vectors to the driver, sliced into m sub-codebooks there);
  * encoding is a broadcast-codebook mapPartitions kernel — narrow, no
  * shuffle, plan size independent of m·k (the IvfAnn.assignTo
  * discipline); ADC search scans ONLY the (vec_id, codes) frame — the
  * raw embedding column is never touched after encode — and ends in a
  * distributed TakeOrdered top-k, never a global sort.
  *
  * Determinism & the oracle: sub-codebooks are the md5-ordered seed
  * sample ([[IvfAnn.seedCentroids]] — the same hash family every gate
  * row derives in DuckDB) sliced per block; encoding is argmin
  * sequential-fold L2 (bit-stable across engines, tie → lowest code);
  * per-block query distances round to 1e-6 FIXED POINT and sum as
  * longs, so the ADC total is exact integer arithmetic —
  * order-independent and hash-exact at the gate (`x4_pq_topk`).
  * Lloyd-style refinement is deliberately absent here: seeded
  * codebooks keep the whole path SQL-derivable (the x4_ann_ivf
  * `lloydIters = 0` rule); quality-vs-seeds is pinned by the recall
  * spec, and callers wanting trained codebooks can refine driver-side
  * and pass them in.
  */
object PqAnn {

  /** `cents(b)(c)` = sub-centroid c of block b (length dim/m each). */
  final case class Codebooks(m: Int, k: Int, cents: Array[Array[Array[Double]]]) {
    def subDim: Int = cents(0)(0).length
  }

  private[ext] final case class CodeRow(vec_id: Long, codes: Seq[Int])

  /** Sub-codebooks from the md5-ordered deterministic sample: the top
    * `k` vectors in `md5_le64(vec_id)` order (exactly [[IvfAnn]]'s
    * seeding — shared so PQ and IVF gates can never diverge on what
    * "seeded" means), each sliced into `m` equal blocks. Requires
    * dim % m == 0. */
  def seedCodebooks(emb: DataFrame, m: Int, k: Int): Codebooks = {
    val seeds = IvfAnn.seedCentroids(emb, k)
    val d = seeds(0).length
    require(d % m == 0, s"dim $d must divide into $m blocks")
    val sub = d / m
    Codebooks(m, k,
      Array.tabulate(m)(b => seeds.map(_.slice(b * sub, (b + 1) * sub))))
  }

  /** Per-subspace Lloyd refinement — PQ TRAINING proper (Jégou §III:
    * k-means per block over the sub-vectors). Each iteration is one
    * [[encode]] pass plus ONE exchange carrying (block, code, pos)
    * partial means; only m·k·subDim aggregate rows reach the driver —
    * bounded by the codebook, never the corpus. Codes that lost all
    * members keep their previous sub-centroid (the [[IvfAnn.lloydStep]]
    * rule), so no block's codebook shrinks. Float averaging is NOT
    * cross-engine bit-stable, so gate rows stay on seeded codebooks
    * (the lloydIters = 0 rule); trained quality is pinned by the recall
    * spec instead. Measured on the driver corpus (near-isotropic
    * vectors, max pair cosine ≈ 0.51 — a hard quantization target):
    * two iterations cut total quantization error 387.8 → 288.3, and
    * two-stage retrieval ([[searchAdcRerank]]) recalls 7–10 of the
    * exact top-10 at a 100-candidate shortlist (spec-pinned); direct
    * ADC-only top-10 is the documented weak baseline on such data. */
  def train(emb: DataFrame, cb: Codebooks, iters: Int): Codebooks = {
    var cur = cb
    val sub = cb.subDim
    (1 to iters).foreach { _ =>
      val enc = encode(emb, cur)
      val means = emb.select(col("vec_id"), col("ev")).join(enc, "vec_id")
        .select(col("codes"), posexplode(col("ev")).as(Seq("p", "x")))
        .select(expr(s"p div $sub").cast("int").as("b"),
          element_at(col("codes"), expr(s"p div $sub").cast("int") + 1).as("code"),
          expr(s"p % $sub").cast("int").as("i"), col("x"))
        .groupBy(col("b"), col("code"), col("i")).agg(avg(col("x")).as("m"))
        .collect()
      val next = cur.cents.map(_.map(_.clone()))
      val touched = Array.ofDim[Boolean](cb.m, cb.k)
      means.foreach { r =>
        val b = r.getInt(0); val c = r.getInt(1)
        if (!touched(b)(c)) {
          java.util.Arrays.fill(next(b)(c), 0.0); touched(b)(c) = true
        }
        next(b)(c)(r.getInt(2)) = r.getDouble(3)
      }
      cur = Codebooks(cb.m, cb.k, next)
    }
    cur
  }

  /** Sequential-fold L2 between `v[off, off+len)` and `c` — the one
    * distance kernel encode and ADC tables share (index order fixed so
    * DuckDB's list_sum fold reproduces it bit-exactly). */
  private def l2(v: Seq[Double], off: Int, c: Array[Double]): Double = {
    var s = 0.0
    var i = 0
    while (i < c.length) {
      val d = v(off + i) - c(i)
      s += d * d
      i += 1
    }
    s
  }

  /** Encode every vector as its per-block argmin-L2 code (tie → lowest
    * code id, ascending scan with strict <): (vec_id, codes array<int>).
    * Broadcast codebooks consumed by a typed mapPartitions kernel —
    * zero shuffle, zero row explosion. */
  def encode(emb: DataFrame, cb: Codebooks): DataFrame = {
    val spark = emb.sparkSession
    import spark.implicits._
    val bc = spark.sparkContext.broadcast(cb)
    emb.select(col("vec_id"), col("ev")).as[IvfAnn.EmbRow].mapPartitions { it =>
      val b = bc.value
      val sub = b.subDim
      it.map { r =>
        val codes = new Array[Int](b.m)
        var blk = 0
        while (blk < b.m) {
          var best = Double.PositiveInfinity
          var bestC = 0
          var c = 0
          while (c < b.cents(blk).length) {
            val d = l2(r.ev, blk * sub, b.cents(blk)(c))
            if (d < best) { best = d; bestC = c }
            c += 1
          }
          codes(blk) = bestC
          blk += 1
        }
        CodeRow(r.vec_id, codes.toSeq)
      }
    }.toDF()
  }

  /** ADC distance table for `q`: `dtL(b)(c)` = round(L2(q_b, cent_b_c)
    * × 1e6) as a long — half-up like both engines' round(), so the
    * fixed-point block distances agree bit-for-bit with the oracle's. */
  private def distTable(cb: Codebooks, q: Seq[Double]): Array[Array[Long]] =
    Array.tabulate(cb.m)(b => cb.cents(b).map(c =>
      math.floor(l2(q, b * cb.subDim, c) * 1e6 + 0.5).toLong))

  /** Top-k by ADC distance over an [[encode]]d frame: score = Σ_b
    * dt(b)(code_b) summed as LONGS (exact, order-free), emitted as
    * (vec_id, adc_dist) with adc_dist = sum/1e6 rounded to 6 — ascending
    * distance, ties by vec_id. The scan touches only the code frame
    * (m × 4 bytes of payload per row at rest); TakeOrdered top-k, no
    * global sort. */
  def searchAdc(encoded: DataFrame, cb: Codebooks, q: Seq[Double],
      topK: Int): DataFrame = {
    val spark = encoded.sparkSession
    import spark.implicits._
    val bc = spark.sparkContext.broadcast(distTable(cb, q))
    encoded.select(col("vec_id"), col("codes")).as[CodeRow].mapPartitions { it =>
      val dt = bc.value
      it.map { r =>
        var s = 0L
        var b = 0
        while (b < dt.length) { s += dt(b)(r.codes(b)); b += 1 }
        (r.vec_id, s)
      }
    }.toDF("vec_id", "dsum")
      .select(col("vec_id"),
        round(col("dsum").cast("double") / 1e6, 6).as("adc_dist"))
      .orderBy(col("adc_dist"), col("vec_id"))
      .limit(topK)
  }

  /** The production PQ retrieval shape: [[searchAdc]] is a CANDIDATE
    * GENERATOR (quantized distances rank a shortlist cheaply), exact L2
    * over the RAW vectors re-ranks only the `nCandidates` survivors —
    * the standard two-stage trade (Jégou §V): the corpus-wide pass
    * touches codes alone, the expensive exact arithmetic touches
    * nCandidates rows. The candidate ids prune the vector scan via a
    * broadcast-able semi-join; sequential-fold L2 keeps the re-rank
    * deterministic (round 6, ties by vec_id). */
  def searchAdcRerank(encoded: DataFrame, emb: DataFrame, cb: Codebooks,
      q: Seq[Double], topK: Int, nCandidates: Int): DataFrame = {
    val cand = searchAdc(encoded, cb, q, nCandidates).select(col("vec_id"))
    val qLit = array(q.map(lit): _*)
    val l2c = aggregate(
      zip_with(col("ev"), qLit, (x, y) => (x - y) * (x - y)),
      lit(0.0), (acc, v) => acc + v)
    emb.join(broadcast(cand), Seq("vec_id"))
      .select(col("vec_id"), round(l2c, 6).as("l2_dist"))
      .orderBy(col("l2_dist"), col("vec_id"))
      .limit(topK)
  }

  // ---- IVF × PQ: the composed 100 TB retrieval shape -----------------------

  /** PQ codes JOINED to the IVF cell assignment: (vec_id, cluster,
    * codes). Persisted partitioned by `cluster` (the
    * [[IvfAnn.writeIndex]] layout) this is the classic IVFADC index —
    * a probe reads only its cells, and within them only nibble codes.
    * One encode pass plus a vec_id-keyed equi-join against the
    * assignment — both sides tiny per row (a cluster int, m nibbles);
    * materialize the assignment (writeIndex / localCheckpoint) first or
    * the O(n·k) assignment kernel re-runs under both join sides. */
  def encodeIndexed(index: IvfAnn.Index, cb: Codebooks): DataFrame =
    index.assigned.select(col("vec_id"), col("cluster"))
      .join(encode(index.assigned.select(col("vec_id"), col("ev")), cb),
        Seq("vec_id"))

  /** IVFADC search (Jégou §V.A): rank the IVF codebook for `q` (same
    * [[IvfAnn.centroidSims]] kernel as every other probe path), scan
    * ONLY the `nProbe` best cells' PQ codes with ADC, exact-L2 re-rank
    * the `nCandidates` survivors against the raw vectors of those same
    * cells. At rest (cluster-partitioned index + codes) the I/O is
    * probed-cells × codes plus nCandidates raw rows — both prunings
    * compose multiplicatively. Output (vec_id, l2_dist) ascending,
    * ties by vec_id; degrades to exact brute force at nProbe =
    * nCentroids with a corpus-sized shortlist (spec-pinned). */
  def searchIvfPq(index: IvfAnn.Index, encodedIdx: DataFrame, cb: Codebooks,
      q: Seq[Double], nProbe: Int, topK: Int, nCandidates: Int): DataFrame = {
    val cents = index.centroids.map(_._2.toArray)
    val sims = IvfAnn.centroidSims(cents, IvfAnn.norms(cents), q)
    val probed = sims.indices.sortBy(c => (-sims(c), c)).take(nProbe)
    val inCells = encodedIdx.filter(col("cluster").isin(probed.toIndexedSeq: _*))
    searchAdcRerank(
      inCells,
      index.assigned.filter(col("cluster").isin(probed.toIndexedSeq: _*))
        .select(col("vec_id"), col("ev")),
      cb, q, topK, nCandidates)
  }
}
