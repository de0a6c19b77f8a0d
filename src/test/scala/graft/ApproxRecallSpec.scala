package graft

import org.apache.spark.sql.functions._
import org.scalatest.funsuite.AnyFunSuite

/** Real pass criteria for the rows-only approximate queries: each one is
  * checked against an EXACT anchor computed at the same scale factor, not
  * just "rows > 0". Every input (data, hash seeds, hyperplanes) is
  * deterministic, so these are pinned checks, not flaky statistical ones.
  *
  *  - d_minhash_pairs  → recall of strong near-dups vs exact 3-gram Jaccard
  *  - d_simhash        → hamming separates strong near-dups from non-dups
  *  - x4_ann_lsh_pairs → every emitted pair scored exactly + recall floor
  *    vs the exact cos ≥ 0.25 pair set (emb_neardup_pairs' anchor)
  *  - x4_ann_ivf       → top-k overlap vs exact x4_cosine_topk
  */
class ApproxRecallSpec extends AnyFunSuite {
  lazy val spark = SparkTestSession.spark
  import spark.implicits._
  val sf = "/root/testdata/sf0.001"

  /** Exact strong-near-dup truth: all pairs with 3-gram Jaccard >= 0.9 over
    * the WHOLE documents table (500 docs at sf0.001 — brute force is fine
    * at anchor scale; 27 planted pairs).
    */
  lazy val strongDupPairs: Set[(Long, Long)] = {
    val sh = Tables.documents(spark, sf)
      .filter(size(split($"text", " ")) >= 3)
      .select($"doc_id", expr(graft.queries.DedupQueries.shingleExpr).as("sh"))
    val a = sh.select($"doc_id".as("a"), $"sh".as("sha"))
    val b = sh.select($"doc_id".as("b"), $"sh".as("shb"))
    a.join(broadcast(b), $"a" < $"b")
      .filter(size(array_intersect($"sha", $"shb")).cast("double") /
        size(array_union($"sha", $"shb")) >= 0.9)
      .select($"a", $"b").as[(Long, Long)].collect().toSet
  }

  test("d_minhash_pairs recalls every Jaccard>=0.9 near-dup pair") {
    assert(strongDupPairs.size >= 20, s"anchor too small: ${strongDupPairs.size}")
    val cand = SparkEntry.queries("d_minhash_pairs")(spark, sf)
      .select("a", "b").as[(Long, Long)].collect().toSet
    val missed = strongDupPairs -- cand
    assert(missed.isEmpty,
      s"MinHash-LSH missed ${missed.size}/${strongDupPairs.size} strong dups: $missed")
  }

  test("d_simhash hamming separates strong near-dups from non-dup pairs") {
    val fp = graft.ext.SimHash
      .withSimHash(Tables.documents(spark, sf), $"text")
      .select($"doc_id", $"simhash").as[(Long, Long)].collect().toMap
    def ham(a: Long, b: Long): Int =
      java.lang.Long.bitCount(fp(a) ^ fp(b))
    val dupHam = strongDupPairs.toSeq.map { case (a, b) => ham(a, b) }
    // deterministic non-dup sample: consecutive ids that are not dup pairs
    val ids = fp.keys.toSeq.sorted
    val nonDup = ids.zip(ids.tail)
      .filterNot(strongDupPairs).take(100).map { case (a, b) => ham(a, b) }
    val meanDup = dupHam.sum.toDouble / dupHam.size
    val meanNon = nonDup.sum.toDouble / nonDup.size
    assert(meanDup < meanNon / 2,
      s"no separation: dup mean $meanDup vs non-dup mean $meanNon")
    assert(dupHam.max < meanNon,
      s"a strong dup pair (${dupHam.max} bits) looks like a random pair ($meanNon)")
  }

  /** Exact cos >= 0.25 pair set over vec_id < 200 — the same anchor the
    * oracle checks bit-exactly as emb_neardup_pairs. */
  lazy val exactCosPairs: Map[(Long, Long), Double] =
    SparkEntry.queries("emb_neardup_pairs")(spark, sf)
      .select("a", "b", "cos").as[(Long, Long, Double)].collect()
      .map { case (a, b, c) => (a, b) -> c }.toMap

  test("x4_ann_lsh_pairs: emitted pairs carry exact cosines (precision 1)") {
    val lsh = SparkEntry.queries("x4_ann_lsh_pairs")(spark, sf)
      .select("a", "b", "cos").as[(Long, Long, Double)].collect()
    assert(lsh.nonEmpty)
    val inAnchor = lsh.filter { case (a, b, c) =>
      a < 200 && b < 200 && c >= 0.25 }
    assert(inAnchor.nonEmpty, "LSH found no pair inside the anchor subset")
    val wrong = inAnchor.filterNot { case (a, b, c) =>
      exactCosPairs.get((a, b)).contains(c) }
    assert(wrong.isEmpty, s"pairs disagreeing with exact cosine: ${wrong.toSeq}")
  }

  test("banded LSH recalls planted near-duplicate vectors (>= 90%)") {
    // synthesize a corpus with 20 planted near-dup pairs (cos >= 0.99) among
    // 100 deterministic pseudo-random 64-dim vectors — the regime the 8x8
    // banding is calibrated for (per-pair collision prob ~1 at cos 0.995)
    var state = 7L
    def next(): Double = {
      state = state * 6364136223846793005L + 1442695040888963407L
      (state >>> 11).toDouble / (1L << 53).toDouble - 0.5
    }
    val base = (0 until 100).map(i => i.toLong -> Seq.fill(64)(next()))
    val jittered = base.take(20).map { case (id, v) =>
      (id + 1000L, v.map(_ + next() * 0.01)) }
    val corpus = (base ++ jittered).toDF("vec_id", "ev")
    val cand = graft.queries.Similarity.lshCandidatePairs(corpus, dim = 64)
      .select("a", "b").as[(Long, Long)].collect().toSet
    val planted = (0 until 20).map(i => (i.toLong, i + 1000L)).toSet
    val recalled = planted.count(cand)
    assert(recalled >= 18, s"planted near-dup recall $recalled/20")
  }

  test("auto band bits hold expected bucket size constant; small corpora " +
      "reproduce the fixed 8-bit form") {
    import graft.queries.Similarity.autoBandBits
    // small corpora floor at the gate row's 8 bits — the oracle-pinned form
    assert(autoBandBits(2000) == 8 && autoBandBits(20000) == 8)
    // beyond 2^8 buckets of targetBucket, bits grow with log2(n): the
    // expected bucket n/2^bits stays in [targetBucket/2, targetBucket]
    for (n <- Seq(100000L, 200000L, 1000000L, 100000000L)) {
      val bits = autoBandBits(n)
      val bucket = n.toDouble / (1L << bits)
      assert(bucket <= 256.0 && bits >= 8,
        s"n=$n bits=$bits expected bucket $bucket")
    }
    // equality of the auto entry point with the explicit form at small n
    var state = 3L
    def next(): Double = {
      state = state * 6364136223846793005L + 1442695040888963407L
      (state >>> 11).toDouble / (1L << 53).toDouble - 0.5
    }
    val corpus = (0 until 60).map(i => i.toLong -> Seq.fill(64)(next()))
      .toDF("vec_id", "ev")
    val auto = graft.queries.Similarity.lshCandidatePairsAuto(corpus, dim = 64)
      .select("a", "b").as[(Long, Long)].collect().toSet
    val fixed = graft.queries.Similarity.lshCandidatePairs(corpus, dim = 64)
      .select("a", "b").as[(Long, Long)].collect().toSet
    assert(auto == fixed, "auto must equal the fixed 8x8 form below the knee")
  }

  test("lshCandidatePairs refuses a fatal bucket-pair blowup loudly (r21)") {
    // 700 identical vectors collide in every band: bucket-pair volume is
    // 8 × 700·699/2 ≈ 1.96M ≈ 2.8k pairs/vector — past the 2000 bound
    // that killed the r20 100× sweep leg at >75 GB of spill. The refusal
    // must fire BEFORE the pair explosion and name the shipped remedies.
    val clones = (0 until 700).map(i => i.toLong -> Seq.fill(64)(0.1))
      .toDF("vec_id", "ev")
    val ex = intercept[IllegalStateException] {
      graft.queries.Similarity.lshCandidatePairs(clones, dim = 64)
    }
    assert(ex.getMessage.contains("refused") &&
      ex.getMessage.contains("lshCandidatePairsAuto") &&
      ex.getMessage.contains("lshCandidatePairsCollapsed"),
      s"refusal must name the remedies: ${ex.getMessage}")
    // the guard bound clears the auto rule's ceiling: the gate corpus
    // (and every declared-query shape) stays far below it
    val gate = SparkEntry.queries("x4_ann_lsh_pairs")(spark, sf)
    assert(gate.count() == 100)
  }

  test("lshCandidatePairsCollapsed: rep pairs over a cloned corpus equal raw " +
      "pairs over the originals; clones map to their original rep") {
    val base = Tables.embeddings(spark, sf)
      .select($"vec_id", transform($"embedding", x => x.cast("double")).as("ev"))
    val cloned = base.union(
      base.select(($"vec_id" + 100000).as("vec_id"), $"ev"))
    val (repPairs, repMap) =
      graft.queries.Similarity.lshCandidatePairsCollapsed(cloned, dim = 64)
    val raw = graft.queries.Similarity.lshCandidatePairs(base, dim = 64)
      .select("a", "b").as[(Long, Long)].collect().toSet
    val collapsed = repPairs.select("a", "b").as[(Long, Long)].collect().toSet
    assert(collapsed == raw,
      "rep-level pairs must equal the raw form over distinct vectors")
    // every planted clone inherits its original as representative
    val m = repMap.as[(Long, Long)].collect().toMap
    val orig = base.select($"vec_id").as[Long].collect()
    assert(orig.forall(id => m(id + 100000) == m(id)),
      "clone must share its original's rep_id")
    assert(orig.forall(id => m(id) <= id), "rep is the min id of its group")
  }

  test("x4_ann_lsh_pairs: deterministic recall floor vs exact strongest pairs") {
    val lshPairs = SparkEntry.queries("x4_ann_lsh_pairs")(spark, sf)
      .select("a", "b").as[(Long, Long)].collect().toSet
    // anchor's strongest 50 pairs by exact cosine: max cos in this corpus is
    // ~0.45 (no planted embedding dups), where 8x8 banding collides ~20% of
    // pairs by design — the floor pins the fixed-seed outcome against
    // regressions (e.g. the single-table variant scored ZERO here)
    val top50 = exactCosPairs.toSeq.sortBy { case ((a, b), c) => (-c, a, b) }
      .take(50).map(_._1)
    val recalled = top50.count(lshPairs)
    assert(recalled >= 5, s"LSH recall collapsed: $recalled/50 strongest pairs")
  }

  test("x4_ann_ivf top-10 overlaps exact x4_cosine_topk by >= 5") {
    val exact = SparkEntry.queries("x4_cosine_topk")(spark, sf)
      .select("vec_id").as[Long].collect().toSet
    val ivf = SparkEntry.queries("x4_ann_ivf")(spark, sf)
      .select("vec_id").as[Long].collect().toSet
    assert((ivf & exact).size >= 5,
      s"IVF(nProbe=3/8) overlap ${(ivf & exact).size}/10 with exact top-k")
  }
}
