package graft.functions

import graft.SparkTestSession
import graft.queries.Similarity
import org.apache.spark.sql.functions._
import org.scalatest.funsuite.AnyFunSuite

class CosineSimSpec extends AnyFunSuite {
  lazy val spark = SparkTestSession.spark
  import spark.implicits._

  test("codegen expression is bit-identical to the HOF formulation") {
    val emb = graft.Tables.embeddings(spark, "/root/testdata/sf0.001")
      .select($"vec_id", transform($"embedding", x => x.cast("double")).as("ev"))
    val q = emb.filter($"vec_id" === 0).select($"ev".as("qv"))
    val both = emb.crossJoin(broadcast(q))
      .select($"vec_id",
        Similarity.cosine($"ev", $"qv").as("native"),
        Similarity.cosineHof($"ev", $"qv").as("hof"))
      .collect()
    assert(both.length == 500)
    both.foreach { r =>
      assert(java.lang.Double.compare(r.getDouble(1), r.getDouble(2)) == 0,
        s"vec ${r.getLong(0)}: ${r.getDouble(1)} != ${r.getDouble(2)}")
    }
  }

  test("known values, nulls, and length mismatch") {
    val df = Seq(
      (1L, Seq(1.0, 0.0), Seq(1.0, 0.0)),   // identical -> 1.0
      (2L, Seq(1.0, 0.0), Seq(0.0, 1.0)),   // orthogonal -> 0.0
      (3L, Seq(1.0, 1.0), Seq(-1.0, -1.0))  // opposite -> -1.0
    ).toDF("id", "a", "b")
    val out = df.select($"id", CosineSim.cosine_sim($"a", $"b").as("c"))
      .collect().map(r => r.getLong(0) -> r.getDouble(1)).toMap
    assert(out(1L) == 1.0)
    assert(out(2L) == 0.0)
    assert(math.abs(out(3L) - (-1.0)) < 1e-12) // sqrt(2)*sqrt(2) != 2 exactly

    val mismatch = Seq((Seq(1.0, 2.0), Seq(1.0))).toDF("a", "b")
      .select(CosineSim.cosine_sim($"a", $"b").as("c")).collect()
    assert(mismatch.head.isNullAt(0))

    val withNull = Seq((Some(Seq(1.0)), None: Option[Seq[Double]]))
      .toDF("a", "b")
      .select(CosineSim.cosine_sim($"a", $"b").as("c")).collect()
    assert(withNull.head.isNullAt(0))
  }

  test("output is declared nullable even over non-nullable inputs") {
    // length mismatch produces null regardless of child nullability — a
    // non-nullable declaration would make codegen assign to a `false`
    // literal and the interpreted path return null illegally
    val df = spark.range(1).select(
      CosineSim.cosine_sim(array(lit(1.0), lit(2.0)), array(lit(1.0))).as("c"))
    assert(df.schema("c").nullable)
    assert(df.collect().head.isNullAt(0))
  }

  test("non-double-array input fails analysis, not execution") {
    val bad = Seq((1, "x")).toDF("i", "s")
    val e = intercept[Exception] {
      bad.select(CosineSim.cosine_sim($"s", $"s")).collect()
    }
    assert(e.getMessage.toLowerCase.contains("cosine_sim") ||
      e.getMessage.toLowerCase.contains("type"))
  }
}
