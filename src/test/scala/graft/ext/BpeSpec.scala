package graft.ext

import graft.SparkTestSession
import org.apache.spark.sql.functions._
import org.scalatest.funsuite.AnyFunSuite

/** BPE encoder contracts (r13 verdict item 2):
  *  - the doubled-boundary replace chain (the gate/oracle form) implements
  *    EXACTLY exhaustive LTR pair merging, including the shared-delimiter
  *    cases ("aaa", "abab") where a single-boundary scheme breaks;
  *  - the iterative lowest-rank-first encoder agrees with the chain on
  *    trained (well-formed) tables — the equivalence that lets the
  *    BpeTokenCount kernel serve as the scale path for the gate's counts;
  *  - FixedMerges' provenance: retraining on the sf0.01 corpus reproduces
  *    the constant table exactly;
  *  - the boundary-char guard fails loudly.
  */
class BpeSpec extends AnyFunSuite {
  lazy val spark = SparkTestSession.spark
  import spark.implicits._

  private val toyMerges = Seq(Bpe.Merge("a", "a"), Bpe.Merge("a", "b"),
    Bpe.Merge("aa", "b"))

  private def sparkSegment(text: String, merges: Seq[Bpe.Merge]): String =
    Seq(text).toDF("t")
      .select(Bpe.segment($"t", merges).as("s"))
      .collect().head.getString(0)

  private def fromSeg(s: String): List[String] =
    s.split("\\|\\|").toList.filter(_.nonEmpty)

  test("replace chain == local exhaustive-LTR reference on adversarial words") {
    // the shared-delimiter cases: single-boundary replace schemes merge
    // "a a a" to [aa, a] only if the scan restarts correctly — the doubled
    // boundary guarantees it; "abab" needs back-to-back occurrences
    for (w <- Seq("aaa", "aaaa", "abab", "aabab", "ababa", "baaab", "b")) {
      val viaSpark = fromSeg(sparkSegment(w, toyMerges))
      val viaLocal = Bpe.encodeChain(w, toyMerges)
      assert(viaSpark == viaLocal, s"word=$w chain=$viaSpark local=$viaLocal")
    }
  }

  test("chain and iterative lowest-rank-first agree on every corpus word") {
    val words = graft.Tables.documents(spark, "/root/testdata/sf0.001")
      .select(explode(split($"text", " ")).as("w"))
      .filter(length($"w") > 0).distinct()
      .collect().map(_.getString(0)).toSeq
    assert(words.nonEmpty)
    val ranks = Bpe.ranksOf(Bpe.FixedMerges)
    for (w <- words) {
      val chain = Bpe.encodeChain(w, Bpe.FixedMerges)
      val iter = Bpe.encodeWord(w.map(_.toString).toList, ranks)
      assert(chain == iter, s"word=$w chain=$chain iter=$iter")
    }
  }

  test("FixedMerges reproduces from the sf0.01 corpus (provenance)") {
    val counts = Bpe.wordCounts(
        graft.Tables.documents(spark, "/root/testdata/sf0.01"))
      .orderBy($"w")
      .collect().map(r => (r.getString(0), r.getLong(1))).toSeq
    val trained = Bpe.trainMerges(counts, Bpe.FixedMerges.size)
    assert(trained == Bpe.FixedMerges)
  }

  test("BpeTokenCount kernel == replace-chain count on corpus documents") {
    val docs = graft.Tables.documents(spark, "/root/testdata/sf0.001")
      .filter($"text".isNotNull)
    val mismatch = docs.select($"doc_id",
        Bpe.tokenCount($"text").as("chain"),
        expr("bpe_token_count(text)").as("iter"))
      .filter($"chain" =!= $"iter")
    assert(mismatch.count() == 0)
  }

  test("SQL-registered bpe_token_count matches the Column kernel") {
    val viaSql = spark.sql(
      "SELECT bpe_token_count('the fast spark batch') AS n")
      .collect().head.getLong(0)
    val ranks = Bpe.ranksOf(Bpe.FixedMerges)
    val expected = "the fast spark batch".split(" ")
      .map(w => Bpe.encodeWord(w.map(_.toString).toList, ranks).size).sum
    assert(viaSql == expected)
  }

  test("FullMerges: provenance (trained to exhaustion) and prefix stability") {
    val counts = Bpe.wordCounts(
        graft.Tables.documents(spark, "/root/testdata/sf0.01"))
      .orderBy($"w")
      .collect().map(r => (r.getString(0), r.getLong(1))).toSeq
    // ask for 512: the corpus's merge closure saturates at 89 — the
    // trainer must stop there on its own (no pair left to merge), which
    // is the documented reason the ≥512 regime lives in the synthetic-
    // vocabulary test below instead of in this corpus's gate
    val trained = Bpe.trainMerges(counts, 512)
    assert(trained == Bpe.FullMerges)
    assert(trained.size == 89)
    // greedy training is prefix-stable: the 24-merge gate table is
    // exactly the closure's head
    assert(Bpe.FullMerges.take(Bpe.FixedMerges.size) == Bpe.FixedMerges)
  }

  test("chain ≡ kernel at the FULL merge closure on every corpus word") {
    val words = graft.Tables.documents(spark, "/root/testdata/sf0.001")
      .select(explode(split($"text", " ")).as("w"))
      .filter(length($"w") > 0).distinct()
      .collect().map(_.getString(0)).toSeq
    val ranks = Bpe.ranksOf(Bpe.FullMerges)
    for (w <- words) {
      val chain = Bpe.encodeChain(w, Bpe.FullMerges)
      val iter = Bpe.encodeWord(w.map(_.toString).toList, ranks)
      assert(chain == iter, s"word=$w chain=$chain iter=$iter")
    }
  }

  test("chain ≡ kernel at a ≥512-merge trained table (synthetic vocabulary)") {
    // the verdict's long-table regime: this corpus cannot yield 512
    // merges (31 words bound the trainable pairs at 89 — FullMerges
    // scaladoc), so the equivalence that makes the kernel the long-table
    // path is pinned on a deterministic synthetic vocabulary large
    // enough to train past 512. Same trainer, same tie-breaks — a
    // well-formed greedy table, exactly the class the two encoders are
    // claimed to agree on.
    val counts = Bpe.syntheticCounts(600)
    val merges = Bpe.trainMerges(counts, 700)
    assert(merges.size >= 512, s"only ${merges.size} merges trained")
    val ranks = Bpe.ranksOf(merges)
    for ((w, _) <- counts) {
      val chain = Bpe.encodeChain(w, merges)
      val iter = Bpe.encodeWord(w.map(_.toString).toList, ranks)
      assert(chain == iter, s"word=$w chain=$chain iter=$iter")
    }
    // and the Catalyst kernel agrees with the local reference on a
    // multi-word document over that table
    val doc = counts.take(50).map(_._1).mkString(" ")
    val viaKernel = Seq(doc).toDF("t")
      .select(graft.functions.BpeTokenCount.bpe_token_count($"t", merges)
        .as("n")).collect().head.getLong(0)
    val expected = doc.split(" ")
      .map(w => Bpe.encodeWord(w.map(_.toString).toList, ranks).size.toLong)
      .sum
    assert(viaKernel == expected)
  }

  test("boundary char in input fails loudly") {
    val e = intercept[Exception] {
      Seq("bad|input").toDF("t")
        .select(Bpe.tokenCount($"t").as("n")).collect()
    }
    def msgs(t: Throwable): Seq[String] =
      Option(t).toSeq.flatMap(x =>
        Option(x.getMessage).toSeq ++ msgs(x.getCause))
    assert(msgs(e).exists(_.contains("boundary char")))
  }

  test("fuzz: Spark replace chain == local exhaustive-LTR on random words") {
    // the doubled-boundary claim under stress: random words over a tiny
    // alphabet maximize shared-delimiter collisions ("aaab", "ababa"…),
    // and adversarial merge tables include self-pairs and merged-token
    // pairs. Seeded — failures reproduce.
    val rnd = new scala.util.Random(1405)
    val tables = Seq(
      Seq(Bpe.Merge("a", "a"), Bpe.Merge("b", "b"), Bpe.Merge("a", "b")),
      Seq(Bpe.Merge("a", "b"), Bpe.Merge("ab", "a"), Bpe.Merge("b", "a")),
      Seq(Bpe.Merge("b", "a"), Bpe.Merge("a", "a"), Bpe.Merge("aa", "ba")))
    val words = (1 to 60).map(_ =>
      (1 to (1 + rnd.nextInt(10))).map(_ =>
        if (rnd.nextBoolean()) "a" else "b").mkString)
    for (t <- tables) {
      val got = words.toDF("t")
        .select($"t", Bpe.segment($"t", t).as("s"))
        .collect().map(r => r.getString(0) -> fromSeg(r.getString(1))).toMap
      for (w <- words)
        assert(got(w) == Bpe.encodeChain(w, t),
          s"word=$w table=$t spark=${got(w)} local=${Bpe.encodeChain(w, t)}")
    }
  }

  test("token counts: empty word runs, trained-table compression sanity") {
    val got = Seq(("", 0L), ("  ", 0L), ("join", 1L), ("join join", 2L),
      ("the fast", 2L + 2L)) // the→[th? no: t h e with er/at merges absent] — computed below
    // recompute expectations from the local reference rather than guessing
    val ranks = Bpe.ranksOf(Bpe.FixedMerges)
    def expect(t: String): Long =
      t.split(" ").filter(_.nonEmpty)
        .map(w => Bpe.encodeWord(w.map(_.toString).toList, ranks).size.toLong)
        .sum
    val df = got.map(_._1).toDF("t")
      .select($"t", Bpe.tokenCount($"t").as("n")).collect()
    for (r <- df)
      assert(r.getLong(1) == expect(r.getString(0)),
        s"text='${r.getString(0)}'")
    // "join" is a single trained token (merge 12); compression is real
    assert(expect("join") == 1L)
  }
}
