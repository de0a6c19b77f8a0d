package graft.sinks

import graft.SparkTestSession
import org.apache.spark.sql.functions._
import org.apache.spark.sql.types._
import org.scalatest.funsuite.AnyFunSuite
import java.nio.file.{Files, Paths}

/** CSV header/append semantics (K1), dead-letter split (K3), JDBC append +
  * idempotent upsert (K2/K4) against embedded Derby (SURVEY.md §5.4).
  */
class SinksSpec extends AnyFunSuite {
  lazy val spark = SparkTestSession.spark
  import spark.implicits._

  test("CSV sink: header + append, read-back equals union (K1)") {
    val dir = Files.createTempDirectory(Paths.get("target"), "csv").toString
    val schema = StructType(Seq(
      StructField("id", LongType), StructField("v", StringType)))
    CsvSink.overwrite(Seq((1L, "a"), (2L, "b")).toDF("id", "v"), dir)
    CsvSink.append(Seq((3L, "c")).toDF("id", "v"), dir)
    val back = CsvSink.read(spark, dir, schema)
      .collect().map(r => (r.getLong(0), r.getString(1))).toSet
    assert(back == Set((1L, "a"), (2L, "b"), (3L, "c")))
    // overwrite = the reference's :clean + rewrite
    CsvSink.overwrite(Seq((9L, "z")).toDF("id", "v"), dir)
    assert(CsvSink.read(spark, dir, schema).count() == 1)
  }

  test("dead-letter split: invalid rows diverted with reason, load continues (K3)") {
    val df = Seq(
      (1L, "ok", 10), (2L, null.asInstanceOf[String], 20),
      (3L, "ok", -5), (4L, "fine", 1)).toDF("id", "name", "qty")
    val (valid, rejected) = JdbcSink.deadLetterSplit(df, Seq(
      JdbcSink.Rule("null_name", col("name").isNotNull),
      JdbcSink.Rule("negative_qty", col("qty") >= 0)))
    assert(valid.select("id").as[Long].collect().toSet == Set(1L, 4L))
    val rej = rejected.select("id", "reject_reason").collect()
      .map(r => (r.getLong(0), r.getString(1))).toMap
    assert(rej == Map(2L -> "null_name", 3L -> "negative_qty"))
  }

  val derbyUrl = "jdbc:derby:memory:sinkdb;create=true"

  test("JDBC append writes all rows in txn batches (K2)") {
    val conn = java.sql.DriverManager.getConnection(derbyUrl)
    conn.createStatement().execute(
      "CREATE TABLE t_append (id BIGINT PRIMARY KEY, v VARCHAR(20))")
    conn.close()
    JdbcSink.append(Seq((1L, "a"), (2L, "b")).toDF("id", "v"),
      derbyUrl, "t_append")
    val back = spark.read.jdbc(derbyUrl, "t_append", new java.util.Properties)
    assert(back.count() == 2)
  }

  test("JDBC upsert is idempotent and replaces by key (K4/T3)") {
    val conn = java.sql.DriverManager.getConnection(derbyUrl)
    conn.createStatement().execute(
      "CREATE TABLE t_upsert (id BIGINT PRIMARY KEY, v VARCHAR(20))")
    conn.close()
    val batch1 = Seq((1L, "a"), (2L, "b")).toDF("id", "v")
    JdbcSink.upsert(batch1, derbyUrl, "t_upsert", Seq("id"))
    JdbcSink.upsert(batch1, derbyUrl, "t_upsert", Seq("id")) // re-run: no dupes
    JdbcSink.upsert(Seq((2L, "B2"), (3L, "c")).toDF("id", "v"),
      derbyUrl, "t_upsert", Seq("id")) // replace + extend
    val back = spark.read.jdbc(derbyUrl, "t_upsert", new java.util.Properties)
      .collect().map(r => (r.getLong(0), r.getString(1))).toSet
    assert(back == Set((1L, "a"), (2L, "B2"), (3L, "c")))
  }

  test("dialect SQL renderers") {
    val my = JdbcSink.mysqlUpsertSql("t", Seq("id", "v"), Seq("id"))
    assert(my.contains("ON DUPLICATE KEY UPDATE v = VALUES(v)"))
    val pg = JdbcSink.postgresUpsertSql("t", Seq("id", "v"), Seq("id"))
    assert(pg.contains("ON CONFLICT (id)") && pg.contains("EXCLUDED.v"))
  }
}
