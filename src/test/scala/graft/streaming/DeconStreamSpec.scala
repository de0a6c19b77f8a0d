package graft.streaming

import graft.SparkTestSession
import org.apache.spark.sql.functions._
import org.scalatest.funsuite.AnyFunSuite
import java.nio.file.{Files, Paths}
import scala.collection.mutable

/** Streaming decontamination is STATELESS stream-static: per-doc overlap
  * counts must equal the batch computation exactly, regardless of which
  * micro-batch carried the doc (no cross-batch effects, unlike the dedup
  * streams); docs shorter than the gram width are always clean.
  */
class DeconStreamSpec extends AnyFunSuite {
  lazy val spark = SparkTestSession.spark
  import spark.implicits._

  private def tmp(prefix: String): String =
    Files.createTempDirectory(Paths.get("target"), prefix).toString

  private val leak = "alpha bravo charlie delta echo"
  private val benchmark = Seq(
    s"benchmark question $leak benchmark answer key",
    "foxtrot golf hotel india juliet kilo lima").toDF("text")

  test("stream flags equal the batch computation; batches don't interact") {
    val dir = tmp("decon")
    val ckpt = tmp("decon_ck")
    val emitted = mutable.ArrayBuffer.empty[(String, Long)]

    def drain(): Unit = {
      val q = DeconStream.run(spark, dir, ckpt, benchmark) { (flagged, _) =>
        emitted ++= flagged.select("path", "n_shared").collect()
          .map(r => (r.getString(0).split('/').last, r.getLong(1)))
      }
      q.awaitTermination()
    }

    // batch 0: one doc leaking the 5-gram (plus context), one clean doc
    Files.writeString(Paths.get(dir, "leaky.txt"),
      s"innocent preamble $leak and some original continuation here")
    Files.writeString(Paths.get(dir, "clean.txt"),
      (1 to 20).map(i => s"z$i").mkString(" "))
    drain()

    // batch 1: a doc overlapping TWO benchmark grams (6 tokens spanning
    // the leak → two distinct 5-grams IF both are benchmark grams), and a
    // short doc (< 5 tokens ⇒ zero grams, always clean)
    Files.writeString(Paths.get(dir, "leaky2.txt"),
      s"benchmark question $leak more trailing context words here")
    Files.writeString(Paths.get(dir, "short.txt"), "alpha bravo charlie")
    drain()

    val flags = emitted.toMap
    assert(flags.keySet == Set("leaky.txt", "clean.txt", "leaky2.txt", "short.txt"))
    assert(flags("clean.txt") == 0L)
    assert(flags("short.txt") == 0L, "sub-width docs must be clean")
    assert(flags("leaky.txt") >= 1L)
    assert(flags("leaky2.txt") > flags("leaky.txt"),
      "more shared grams must raise the count")

    // EXACT batch parity: recompute every doc's overlap with the batch
    // expressions (same distinctGrams definition) and compare counts
    val docs = emitted.map(_._1).distinct.map { name =>
      (name, Files.readString(Paths.get(dir, name)))
    }.toSeq.toDF("path", "text")
    val bg = benchmark
      .select(explode(graft.ext.SpanDedup.distinctGrams($"text", 5)).as("g"))
      .distinct()
    val batchFlags = docs
      .select($"path", explode(graft.ext.SpanDedup.distinctGrams($"text", 5)).as("g"))
      .join(bg, Seq("g"))
      .groupBy($"path").agg(count(lit(1)).as("n_shared"))
      .as[(String, Long)].collect().toMap
    emitted.foreach { case (name, n) =>
      assert(batchFlags.getOrElse(name, 0L) == n,
        s"stream/batch divergence for $name")
    }
  }
}
