package graft.plans

import graft.SparkTestSession
import graft.queries.Similarity
import org.apache.spark.sql.functions._
import org.scalatest.funsuite.AnyFunSuite

/** SparkSessionExtensions integration: the native kernels are reachable
  * from plain SQL, and the optimizer rewrites the portable HOF cosine
  * formulation to the fused native expression.
  */
class GraftExtensionsSpec extends AnyFunSuite {
  lazy val spark = SparkTestSession.spark
  import spark.implicits._

  test("native expressions are callable from SQL like built-ins") {
    val one = spark.sql(
      "SELECT cosine_sim(array(3.0d, 4.0d), array(3.0d, 4.0d)) AS c")
      .head().getDouble(0)
    assert(one == 1.0)
    val orth = spark.sql(
      "SELECT cosine_sim(array(1.0d, 0.0d), array(0.0d, 1.0d)) AS c")
      .head().getDouble(0)
    assert(orth == 0.0)

    val sig = spark.sql(
      "SELECT minhash_signature(array('a b c', 'b c d'), 4) AS s")
      .head().getSeq[Long](0)
    assert(sig.length == 4)
    // must agree with the Column-API form
    val viaCol = Seq(Seq("a b c", "b c d")).toDF("sh")
      .select(graft.functions.MinHashSignature.minhash_signature($"sh", 4))
      .head().getSeq[Long](0)
    assert(sig == viaCol)

    val fp = spark.sql("SELECT simhash64(array('x', 'y', 'z')) AS f")
      .head().getLong(0)
    val fpCol = Seq(Seq("x", "y", "z")).toDF("t")
      .select(graft.functions.SimHash64.simhash64($"t")).head().getLong(0)
    assert(fp == fpCol)
  }

  test("SQL md5-family functions agree with the product dedup path") {
    import graft.ext.{MinHashDedup, SimHash}
    // md5_minhash_signature == the signatures candidatePairs banded on
    val doc = Seq((1L, "a b c d e f g")).toDF("doc_id", "text")
    val viaSql = doc.createOrReplaceTempView("mh_doc")
    val sqlSig = spark.sql(
      """SELECT md5_minhash_signature(array_distinct(transform(
           sequence(1, greatest(size(split(text, ' ')) - 2, 0)),
           i -> concat_ws(' ', element_at(split(text, ' '), i),
                element_at(split(text, ' '), i + 1),
                element_at(split(text, ' '), i + 2)))), 8) AS s
         FROM mh_doc""").head().getSeq[Long](0)
    val prodSig = doc.select(
      MinHashDedup.signature(MinHashDedup.shingles($"text"), 8))
      .head().getSeq[Long](0)
    assert(sqlSig == prodSig)

    // md5_simhash64 == the fingerprint withSimHash emits
    val sqlFp = spark.sql(
      "SELECT md5_simhash64(split(text, ' ')) AS f FROM mh_doc")
      .head().getLong(0)
    val prodFp = doc.select(SimHash.simhash($"text")).head().getLong(0)
    assert(sqlFp == prodFp)

    // md5_le64 == DuckDB md5_number_upper (pinned value for 'abc':
    // 12704604231530709392 as UBIGINT = -5742139842178842224 signed)
    val le = spark.sql("SELECT md5_le64('abc') AS h").head().getLong(0)
    assert(le == java.lang.Long.parseUnsignedLong("12704604231530709392"))
  }

  // parquet-backed input: a literal LocalRelation would constant-fold the
  // whole projection away before the rewrite could be observed
  private def emb = graft.Tables.embeddings(spark, "/root/testdata/sf0.001")
    .select($"vec_id", transform($"embedding", x => x.cast("double")).as("ev"))

  test("optimizer rewrites the HOF cosine tree to the native kernel") {
    val q = emb.filter($"vec_id" === 0).select($"ev".as("qv"))
    val df = emb.crossJoin(broadcast(q))
      .select($"vec_id", Similarity.cosineHof($"ev", $"qv").as("c"))
    val optimized = df.queryExecution.optimizedPlan.toString
    assert(optimized.contains("cosinesim") || optimized.contains("CosineSim"),
      s"rewrite did not fire:\n$optimized")
    assert(!optimized.toLowerCase.contains("aggregate("),
      s"HOF fold survived optimization:\n$optimized")
    // results identical to the native form, row for row
    val viaHof = df.orderBy($"vec_id").collect().map(_.getDouble(1))
    val viaNative = emb.crossJoin(broadcast(q))
      .select($"vec_id", Similarity.cosine($"ev", $"qv").as("c"))
      .orderBy($"vec_id").collect().map(_.getDouble(1))
    assert(viaHof.sameElements(viaNative))
  }

  test("rewrite leaves non-matching shapes alone") {
    def noRewrite(df: org.apache.spark.sql.DataFrame): Unit = {
      val optimized = df.queryExecution.optimizedPlan.toString
      assert(!optimized.contains("cosinesim") && !optimized.contains("CosineSim"),
        s"false-positive rewrite:\n$optimized")
    }
    // a dot WITHOUT the norm product must not be touched
    noRewrite(emb.select(aggregate(zip_with($"ev", $"ev", (x, y) => x * y),
      lit(0.0), (acc, v) => acc + v).as("dot")))

    // cosine-SHAPED trees that compute something else must not be touched:
    // (x, y) -> x * x is a sum of squares, not a dot product...
    def dotLike(mul: (org.apache.spark.sql.Column, org.apache.spark.sql.Column)
        => org.apache.spark.sql.Column) =
      aggregate(zip_with($"ev", $"qv", mul), lit(0.0), (acc, v) => acc + v)
    val q = emb.filter($"vec_id" === 0).select($"ev".as("qv"))
    val sumSq = emb.crossJoin(broadcast(q)).select(
      (dotLike((x, _) => x * x) /
        (sqrt(dotLike((x, y) => x * y)) * sqrt(dotLike((x, y) => x * y))))
        .as("c"))
    noRewrite(sumSq)

    // ...and a non-identity FINISH lambda must keep its transformation
    val finished = emb.crossJoin(broadcast(q)).select(
      (aggregate(zip_with($"ev", $"qv", (x, y) => x * y), lit(0.0),
        (acc, v) => acc + v, acc => acc * 2) /
        (sqrt(dotLike((x, y) => x * y)) * sqrt(dotLike((x, y) => x * y))))
        .as("c"))
    noRewrite(finished)
  }
}
