package graft.streaming

import graft.{SparkTestSession, Tables}
import org.apache.spark.sql.functions._
import org.scalatest.funsuite.AnyFunSuite
import java.nio.file.{Files, Paths}

/** The streaming-HLL claims: cells streamed across batches (with a
  * checkpoint restart) MAX-merge to exactly a batch pass's cells; the
  * estimate pipeline matches the x_hll_window gate's values for the same
  * data; max-merge absorbs even OUT-OF-PROTOCOL reprocessing (appending
  * the same data under a NEW batch id changes nothing — stronger than
  * count-based stores, whose exactly-once depends on partition
  * overwrite). */
class HllStreamSpec extends AnyFunSuite {
  lazy val spark = SparkTestSession.spark
  import spark.implicits._
  val sf = "/root/testdata/sf0.001"

  private def tmp(prefix: String): String =
    Files.createTempDirectory(Paths.get("target"), prefix).toString

  test("streamed cells ≡ batch cells; estimates match; max absorbs dups") {
    val dir = tmp("hll_events"); val ckpt = tmp("hll_ck"); val store = tmp("hll_store")
    val ev = Tables.events(spark, sf).select($"ts", $"user_id")
      .localCheckpoint(true)

    ev.filter($"user_id" % 2 === 0)
      .coalesce(1).write.mode("append").parquet(dir)
    HllStream.run(spark, dir, ckpt, store).awaitTermination()
    ev.filter($"user_id" % 2 =!= 0)
      .coalesce(1).write.mode("append").parquet(dir)
    HllStream.run(spark, dir, ckpt, store).awaitTermination()

    def cellMap(df: org.apache.spark.sql.DataFrame) =
      df.collect().map(r => (r.getTimestamp(0), r.getLong(1)) -> r.getInt(2))
        .toMap
    val streamed = cellMap(HllStream.merged(spark, store))
    val batch = cellMap(HllStream.cells(
      ev.select(date_trunc("day", $"ts").as("w_start"), $"user_id")))
    assert(streamed == batch, "max-merge diverged from the batch cells")

    // estimates off the store: deterministic integers; sanity vs exact
    val est = HllStream.estimates(spark, store)
      .collect().map(r => r.getTimestamp(0) -> r.getLong(4)).toMap
    val exact = ev.select(date_trunc("day", $"ts").as("w"), $"user_id")
      .distinct().groupBy($"w").agg(count(lit(1)).as("n"))
      .collect().map(r => r.getTimestamp(0) -> r.getLong(1)).toMap
    assert(est.keySet == exact.keySet)
    // m = 16384 (Hll.Hi): 5·rsd ≈ 4% relative, with an absolute floor
    // of 2 for the tiny sf0.001 windows where the linear-counting LUT's
    // integer rounding is the whole error
    for ((w, e) <- est)
      assert(math.abs(e - exact(w)) <= math.max(2.0, 0.05 * exact(w)),
        s"w=$w est=$e exact=${exact(w)}")

    // out-of-protocol duplication: same data under a NEW batch id — a
    // count store would double; the max store is invariant
    HllStream.processBatch(ev.select($"ts", $"user_id"), 99L, store)
    assert(cellMap(HllStream.merged(spark, store)) == streamed,
      "max-merge failed to absorb duplicated data")
  }

  test("params stamp: mismatched or missing register count is refused " +
      "loudly instead of serving garbage estimates") {
    val dir = tmp("hll_stamp")
    // store written under a DIFFERENT m: re-estimating its cells under
    // Hll.Default params would silently misinterpret them (r15 ADVICE)
    val fs = new org.apache.hadoop.fs.Path(dir)
      .getFileSystem(spark.sessionState.newHadoopConf())
    fs.create(new org.apache.hadoop.fs.Path(dir, "_hll_m_64"), true).close()
    Seq((java.sql.Timestamp.valueOf("2024-01-01 00:00:00"), 3L, 7))
      .toDF("w_start", "bucket", "rho")
      .withColumn("batch", lit(0L))
      .write.partitionBy("batch").mode("append").parquet(dir)
    val e1 = intercept[IllegalArgumentException] {
      HllStream.merged(spark, dir).collect()
    }
    assert(e1.getMessage.contains("m=64"))
    intercept[IllegalArgumentException] {
      HllStream.processBatch(
        Seq((java.sql.Timestamp.valueOf("2024-01-01 00:00:00"), 1L))
          .toDF("ts", "user_id"), 1L, dir)
    }

    // an UNSTAMPED non-empty store (pre-stamp legacy / foreign data) is
    // of unknown provenance — refused, not re-interpreted
    val dir2 = tmp("hll_nostamp")
    Seq((java.sql.Timestamp.valueOf("2024-01-01 00:00:00"), 3L, 7))
      .toDF("w_start", "bucket", "rho")
      .withColumn("batch", lit(0L))
      .write.partitionBy("batch").mode("append").parquet(dir2)
    val e2 = intercept[IllegalStateException] {
      HllStream.estimates(spark, dir2).collect()
    }
    assert(e2.getMessage.contains("no _hll_m stamp"))

    // WRITE-side adoption refusal (r16 ADVICE): a resumed stream's first
    // processBatch on that same unstamped-but-non-empty store must NOT
    // stamp it — that would legitimize the unknown-m cells and make every
    // later requireStamp pass on garbage. Refuse before writing anything.
    val e3 = intercept[IllegalStateException] {
      HllStream.processBatch(
        Seq((java.sql.Timestamp.valueOf("2024-01-01 00:00:00"), 1L))
          .toDF("ts", "user_id"), 1L, dir2)
    }
    assert(e3.getMessage.contains("refusing to adopt"))
    assert(!fs.exists(new org.apache.hadoop.fs.Path(dir2,
      s"_hll_m_${graft.ext.Hll.Hi.m}")), "adoption refusal must not stamp")
    // and the store must still refuse reads (nothing was legitimized)
    intercept[IllegalStateException] {
      HllStream.estimates(spark, dir2).collect()
    }

    // a FOREIGN/corrupt marker (unparseable suffix) surfaces the
    // deliberate provenance error, not a raw NumberFormatException
    val dir3 = tmp("hll_badstamp")
    fs.create(new org.apache.hadoop.fs.Path(dir3, "_hll_m_backup"), true)
      .close()
    val e4 = intercept[IllegalStateException] {
      HllStream.merged(spark, dir3).collect()
    }
    assert(e4.getMessage.contains("unparseable params marker"))
  }
}
