package graft.sinks

import graft.SparkTestSession
import org.scalatest.funsuite.AnyFunSuite
import java.nio.file.{Files, Paths}

/** S8: parquet / json / orc / csv round-trips through the engine's canonical
  * storage formats.
  */
class FormatRoundTripSpec extends AnyFunSuite {
  lazy val spark = SparkTestSession.spark
  import spark.implicits._

  private val data = Seq(
    (1L, "a", 1.5, Seq(1.0f, 2.0f)),
    (2L, "b", -0.25, Seq(0.5f)),
    (3L, null.asInstanceOf[String], 0.0, Seq.empty[Float]))

  test("parquet/orc/json/csv write-read round-trips") {
    val df = data.toDF("id", "s", "d", "vec")
    val base = Files.createTempDirectory(Paths.get("target"), "fmt").toString
    Seq("parquet", "orc", "json").foreach { fmt =>
      df.write.mode("overwrite").format(fmt).save(s"$base/$fmt")
      val back = spark.read.format(fmt)
        .schema(df.schema) // json needs the schema to keep types
        .load(s"$base/$fmt")
      assert(back.count() == 3, fmt)
      val rows = back.orderBy("id").collect()
      assert(rows.map(_.getLong(0)).toSeq == Seq(1L, 2L, 3L), fmt)
      assert(rows(0).getSeq[Float](3) == Seq(1.0f, 2.0f), fmt)
    }
    // CSV: scalar columns only (no nested types in CSV)
    val flat = df.drop("vec")
    flat.write.mode("overwrite").option("header", "true").csv(s"$base/csv")
    val back = spark.read.option("header", "true").schema(flat.schema)
      .csv(s"$base/csv")
    assert(back.orderBy("id").collect().map(_.getDouble(2)).toSeq ==
      Seq(1.5, -0.25, 0.0))
  }

  test("parquet filter + projection pushdown reaches the scan") {
    val li = graft.Tables.lineitem(spark, "/root/testdata/sf0.001")
    val plan = li.filter($"l_orderkey" <= 100).select($"l_orderkey", $"l_quantity")
      .queryExecution.executedPlan.toString
    assert(plan.contains("PushedFilters: [IsNotNull(l_orderkey), LessThanOrEqual(l_orderkey,100)]"),
      s"pushdown missing in plan:\n$plan")
    assert(plan.contains("ReadSchema: struct<l_orderkey:bigint,l_quantity:double>"),
      "column pruning missing")
  }
}
