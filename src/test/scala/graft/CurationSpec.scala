package graft

import org.apache.spark.sql.functions._
import org.scalatest.funsuite.AnyFunSuite

/** Contract properties of the curation recipes that the DuckDB oracle rows
  * can't express — one-sided sketch error over the WHOLE vocabulary, rule
  * behavior on planted boilerplate, tercile balance, and weight-mass
  * conservation.
  */
class CurationSpec extends AnyFunSuite {
  lazy val spark = SparkTestSession.spark
  import spark.implicits._
  val sf = "/root/testdata/sf0.001"

  test("x_cms_heavy_hitters: CMS estimate >= exact count for EVERY term") {
    // The one-sided CMS guarantee must hold for the whole vocabulary, not
    // just the top-20 the gate row audits: rebuild the sketch and compare
    // every term's min-cell estimate against its exact count.
    import graft.functions.Md5Hash64.md5_le64
    val cnt = Tables.documents(spark, sf)
      .select(explode(split($"text", " ")).as("term"))
      .filter(length($"term") > 0)
      .groupBy($"term").agg(count(lit(1)).as("c"))
    def cell(dep: org.apache.spark.sql.Column, t: org.apache.spark.sql.Column) =
      shiftrightunsigned(md5_le64(concat(dep.cast("string"), lit(":"), t)), 4) % 1024
    val cells = cnt
      .select(explode(sequence(lit(0), lit(3))).as("d"), $"term", $"c")
      .select($"d", cell($"d", $"term").as("cell"), $"c")
      .groupBy($"d", $"cell").agg(sum($"c").as("cc"))
    val under = cnt
      .select($"term", $"c", explode(sequence(lit(0), lit(3))).as("d"))
      .withColumn("cell", cell($"d", $"term"))
      .join(cells, Seq("d", "cell"))
      .groupBy($"term", $"c").agg(min($"cc").as("est"))
      .filter($"est" < $"c")
    assert(under.count() === 0, "CMS must never underestimate")
  }

  test("x_gopher_repetition flags planted boilerplate and keeps clean docs") {
    val planted = Seq(
      (900001L, ("spam ham " * 40).trim),            // one 2-gram dominates
      (900002L, (1 to 80).map(i => s"w$i").mkString(" "))) // all-distinct
      .toDF("doc_id", "text")
    val base = Tables.documents(spark, sf).select($"doc_id", $"text")
    // run the same pipeline over base+planted via a temp view substitution:
    // the QueryDef reads Tables.documents, so recompute inline instead
    val docs = base.union(planted)
      .withColumn("toks", split($"text", " "))
      .filter(size($"toks") >= 5)
      .select($"doc_id", length($"text").as("nc"), $"toks")
    def grams(n: Int) = docs.select($"doc_id", $"nc",
      explode(transform(sequence(lit(1), size($"toks") - (n - 1)),
        i => concat_ws(" ", slice($"toks", i, lit(n))))).as("g"))
    val dup5 = grams(5)
      .groupBy($"doc_id", $"nc", $"g").agg(count(lit(1)).as("c"))
      .groupBy($"doc_id", $"nc")
      .agg(sum(when($"c" >= 2, $"c" * length($"g")).otherwise(0L)).as("dc"))
      .select($"doc_id", ($"dc".cast("double") / $"nc").as("dup5_frac"))
    val rows = dup5.filter($"doc_id" >= 900000L).collect()
      .map(r => r.getLong(0) -> r.getDouble(1)).toMap
    assert(rows(900001L) > 0.15, s"boilerplate dup5=${rows(900001L)}")
    assert(rows(900002L) === 0.0, "all-distinct doc must have zero dup mass")
    // and the shipped gate query keeps the (clone-free) corpus majority
    val gate = SparkEntry.queries("x_gopher_repetition")(spark, sf)
    val kept = gate.filter($"keep").count().toDouble / gate.count()
    assert(kept > 0.9, s"kept fraction $kept")
  }

  test("x_ccnet_buckets: terciles balanced within 1 doc; head <= tail") {
    val b = SparkEntry.queries("x_ccnet_buckets")(spark, sf).collect()
      .map(r => (r.getString(0), r.getString(1), r.getLong(2), r.getDouble(4)))
    b.groupBy(_._1).foreach { case (lang, rows) =>
      val sizes = rows.map(_._3)
      assert(sizes.max - sizes.min <= 1, s"$lang sizes ${sizes.toSeq}")
      val byBucket = rows.map(r => r._2 -> r._4).toMap
      assert(byBucket("head") <= byBucket("tail"),
        s"$lang head ${byBucket("head")} > tail ${byBucket("tail")}")
    }
    assert(b.length === 15)
  }

  test("x_softdedup_weights conserves unit mass per distinct text") {
    val w = SparkEntry.queries("x_softdedup_weights")(spark, sf)
    // every duplicate group's weights sum to ~1 -> total mass = distinct texts
    val total = w.agg(sum($"weight")).as[Double].head()
    val distinctTexts = 300 + 0 // planted corpus: 300 distinct base docs
    assert(math.abs(total - distinctTexts) < 1e-3, s"mass $total")
    val badWeight = w.filter($"weight" =!= round(lit(1.0) / $"n_copies", 6)).count()
    assert(badWeight === 0)
  }

  test("x_bloom_membership: no member ever misses (one-sided over whole vocab)") {
    // The Bloom guarantee must hold for EVERY member term, not just the
    // top-50 the gate row probes: rebuild the bit set and probe the whole
    // English vocabulary — all k cells must be present for all members.
    import graft.functions.Md5Hash64.md5_le64
    def cell(dep: org.apache.spark.sql.Column, t: org.apache.spark.sql.Column) =
      shiftrightunsigned(md5_le64(concat(dep.cast("string"), lit(":"), t)), 4) % 8192
    val members = Tables.documents(spark, sf)
      .filter($"lang" === "en")
      .select(explode(split($"text", " ")).as("term"))
      .filter(length($"term") > 0).distinct()
    val bits = members
      .select(explode(sequence(lit(0), lit(3))).as("d"), $"term")
      .select($"d", cell($"d", $"term").as("cell")).distinct()
    val misses = members
      .select($"term", explode(sequence(lit(0), lit(3))).as("d"))
      .withColumn("cell", cell($"d", $"term"))
      .join(broadcast(bits.withColumn("b", lit(1))), Seq("d", "cell"), "left")
      .groupBy($"term").agg(count($"b").as("nhit"))
      .filter($"nhit" < 4)
    assert(misses.count() === 0, "a Bloom filter must never false-negative")
    // and the gate row's flags are internally consistent: every in-set
    // probe hits; every false_positive is genuinely not a member
    val out = SparkEntry.queries("x_bloom_membership")(spark, sf)
    assert(out.filter($"in_set" && !$"bloom_hit").count() === 0)
    assert(out.filter($"false_positive" && $"in_set").count() === 0)
  }

  test("x_decontamination flags a planted leak and ignores clean docs") {
    // 901000 % 17 == 0 -> benchmark; 901001 shares one exact 5-gram with
    // it; 901002 is token-disjoint. Same expressions as the QueryDef,
    // recomputed inline over base+planted (the QueryDef reads
    // Tables.documents directly).
    assert(901000L % 17 === 0L)
    val leak5 = "alpha bravo charlie delta echo"
    val planted = Seq(
      (901000L, s"benchmark prompt $leak5 benchmark answer"),
      (901001L, s"innocent preamble $leak5 then original continuation text"),
      (901002L, (1 to 20).map(i => s"z$i").mkString(" ")))
      .toDF("doc_id", "text")
    val sh = Tables.documents(spark, sf).select($"doc_id", $"text")
      .union(planted)
      .select($"doc_id",
        graft.ext.SpanDedup.distinctGrams($"text", 5).as("sh"))
      .filter(size($"sh") > 0)
    val bench = sh.filter($"doc_id" % 17 === 0)
      .select(explode($"sh").as("g")).distinct()
    val hits = sh.filter($"doc_id" % 17 =!= 0)
      .select($"doc_id", explode($"sh").as("g"))
      .join(broadcast(bench), "g")
      .groupBy($"doc_id").agg(count(lit(1)).as("n_shared"))
    val flagged = hits.filter($"doc_id" >= 901000L)
      .as[(Long, Long)].collect().toMap
    assert(flagged.contains(901001L) && flagged(901001L) >= 1L,
      "the planted 5-gram leak must be flagged")
    assert(!flagged.contains(901002L), "token-disjoint doc must stay clean")
  }
}
