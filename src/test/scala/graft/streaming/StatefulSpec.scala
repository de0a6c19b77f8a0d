package graft.streaming

import graft.SparkTestSession
import org.apache.spark.sql.streaming.{GroupState, GroupStateTimeout, OutputMode}
import org.scalatest.funsuite.AnyFunSuite

/** T5 stateful streaming capability: custom per-key state via
  * mapGroupsWithState (running per-user event counts), driven through the
  * memory sink with a rate-limited batch source.
  */
class StatefulSpec extends AnyFunSuite {
  lazy val spark = SparkTestSession.spark

  test("mapGroupsWithState keeps running per-key counts across batches") {
    import spark.implicits._
    val dir = java.nio.file.Files.createTempDirectory(
      java.nio.file.Paths.get("target"), "stateful").toString
    val ckpt = dir + "/ckpt"

    def writeBatch(name: String, rows: Seq[(Long, String)]): Unit = {
      val p = java.nio.file.Paths.get(dir, name)
      val content = rows.map { case (u, e) => s"$u,$e" }.mkString("\n")
      java.nio.file.Files.writeString(p, content)
    }
    writeBatch("b1.csv", Seq((1L, "click"), (1L, "view"), (2L, "click")))

    val stream = spark.readStream
      .schema("user_id LONG, event_type STRING")
      .csv(dir + "/*.csv")
      .as[(Long, String)]
    val counted = stream
      .groupByKey(_._1)
      .mapGroupsWithState(GroupStateTimeout.NoTimeout) {
        (user: Long, events: Iterator[(Long, String)], state: GroupState[Long]) =>
          val newCount = state.getOption.getOrElse(0L) + events.size
          state.update(newCount)
          (user, newCount)
      }
    val q = counted.writeStream
      .outputMode(OutputMode.Update)
      .format("memory").queryName("state_out")
      .option("checkpointLocation", ckpt)
      .start()
    def latest(): Map[Long, Long] =
      spark.table("state_out").as[(Long, Long)].collect()
        .groupBy(_._1).map { case (k, vs) => k -> vs.map(_._2).max }

    q.processAllAvailable()
    assert(latest() == Map(1L -> 2L, 2L -> 1L))
    // second micro-batch: state accumulates, not resets
    writeBatch("b2.csv", Seq((1L, "buy"), (3L, "view")))
    q.processAllAvailable()
    val after = latest()
    q.stop()
    assert(after(1L) == 3L && after(3L) == 1L)
  }

  test("streaming dropDuplicates within the same run is exactly-once per key") {
    import spark.implicits._
    val events = graft.Tables.events(spark, "/root/testdata/sf0.001")
    val doubled = events.unionAll(events)
    assert(doubled.dropDuplicates("event_id").count() == events.count())
  }

  test("dropDuplicatesWithinWatermark drops cross-batch dups inside the horizon") {
    import spark.implicits._
    val dir = java.nio.file.Files.createTempDirectory(
      java.nio.file.Paths.get("target"), "dedupww").toString
    val ckpt = dir + "/ckpt"
    def writeBatch(name: String, rows: Seq[(String, String)]): Unit = {
      val content = rows.map { case (id, ts) => s"$id,$ts" }.mkString("\n")
      java.nio.file.Files.writeString(java.nio.file.Paths.get(dir, name), content)
    }
    writeBatch("b1.csv", Seq(
      ("e1", "2026-01-01 10:00:00"), ("e1", "2026-01-01 10:01:00"),
      ("e2", "2026-01-01 10:02:00")))

    val stream = spark.readStream
      .schema("event_id STRING, ts TIMESTAMP")
      .csv(dir + "/*.csv")
    val deduped = stream
      .withWatermark("ts", "1 hour")
      .dropDuplicatesWithinWatermark("event_id")
    val q = deduped.writeStream
      .outputMode(OutputMode.Append)
      .format("memory").queryName("dedup_ww")
      .option("checkpointLocation", ckpt)
      .start()
    q.processAllAvailable()
    // second micro-batch: e1 again, still within the 1h horizon → dropped
    writeBatch("b2.csv", Seq(
      ("e1", "2026-01-01 10:05:00"), ("e3", "2026-01-01 10:06:00")))
    q.processAllAvailable()
    q.stop()
    val ids = spark.table("dedup_ww")
      .select("event_id").as[String].collect().toSeq.sorted
    assert(ids == Seq("e1", "e2", "e3"))
  }
}
