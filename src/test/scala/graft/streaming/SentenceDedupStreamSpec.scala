package graft.streaming

import graft.SparkTestSession
import org.scalatest.funsuite.AnyFunSuite
import java.nio.file.{Files, Path, Paths}
import java.util.Comparator
import scala.collection.mutable

/** Streaming sentence dedup: a sentence reaches the sink at most once
  * across the whole stream; rebuilt documents keep surviving sentences
  * in original order; a re-fired batch re-emits identically.
  */
class SentenceDedupStreamSpec extends AnyFunSuite {
  lazy val spark = SparkTestSession.spark

  private def tmp(prefix: String): String =
    Files.createTempDirectory(Paths.get("target"), prefix).toString

  // 2-token sentences keep fixtures readable: "a1 a2 | b1 b2 | ..."
  private val W = 2

  test("cross-batch and in-batch sentence dups drop; docs rebuild in order") {
    val dir = tmp("sstream")
    val ckpt = tmp("sstream_ck")
    val store = tmp("sstream_store") + "/store"
    val emitted = mutable.ArrayBuffer.empty[(Long, String, Long, Long, String)]

    def drain(): Unit = {
      val q = SentenceDedupStream.run(spark, dir, ckpt, store, window = W) {
        (docs, bid) =>
          emitted ++= docs
            .select("path", "n_sentences", "n_kept", "text_dedup")
            .collect()
            .map(r => (bid, r.getString(0), r.getLong(1), r.getLong(2),
              r.getString(3)))
      }
      q.awaitTermination()
    }

    // doc a: sentences (x1 x2)(y1 y2); doc b repeats (x1 x2) + fresh (z1 z2)
    Files.writeString(Paths.get(dir, "a.txt"), "x1 x2 y1 y2")
    Files.writeString(Paths.get(dir, "b.txt"), "x1 x2 z1 z2")
    drain()
    val byPath0 = emitted.map(e => e._2.split('/').last -> e).toMap
    // a.txt (lower path) wins the shared sentence; b.txt loses it
    assert(byPath0("a.txt")._4 == 2L &&
      byPath0("a.txt")._5 == "x1 x2 y1 y2")
    assert(byPath0("b.txt")._3 == 2L && byPath0("b.txt")._4 == 1L &&
      byPath0("b.txt")._5 == "z1 z2")

    // batch 1: all-dup doc emits kept=0/empty; partially-new doc keeps
    // original sentence ORDER (fresh w1 w2 precedes repeated-fresh y1 y2?
    // no — y1 y2 was seen in batch 0, so only w1 w2 survives)
    emitted.clear()
    Files.writeString(Paths.get(dir, "c.txt"), "y1 y2 z1 z2")
    Files.writeString(Paths.get(dir, "d.txt"), "w1 w2 y1 y2 v1 v2")
    drain()
    val byPath1 = emitted.map(e => e._2.split('/').last -> e).toMap
    assert(byPath1("c.txt")._4 == 0L && byPath1("c.txt")._5 == "")
    assert(byPath1("d.txt")._4 == 2L &&
      byPath1("d.txt")._5 == "w1 w2 v1 v2") // order preserved, dup removed

    // store: exactly one row per distinct sentence ever
    val hs = spark.read.parquet(store).select("h").collect().map(_.getString(0))
    assert(hs.length == hs.distinct.length)
    assert(hs.length == 5) // x,y,z,w,v — each registered exactly once
  }

  test("re-fired batch re-emits identically (store partition is overwrite)") {
    val dir = tmp("sfire")
    val ckpt = tmp("sfire_ck")
    val store = tmp("sfire_store") + "/store"
    val emitted = mutable.ArrayBuffer.empty[(String, Long, String)]

    def drain(): Unit = {
      val q = SentenceDedupStream.run(spark, dir, ckpt, store, window = W) {
        (docs, _) =>
          emitted ++= docs.select("path", "n_kept", "text_dedup").collect()
            .map(r => (r.getString(0).split('/').last, r.getLong(1),
              r.getString(2)))
      }
      q.awaitTermination()
    }

    Files.writeString(Paths.get(dir, "a.txt"), "p1 p2 q1 q2")
    drain()
    val first = emitted.sorted.toList

    // lose the checkpoint commit but keep the store: the same files
    // replay as batch 0 and must NOT be suppressed by their own writes
    emitted.clear()
    rmTree(ckpt)
    drain()
    assert(emitted.sorted.toList == first,
      s"refire drifted: ${emitted.toList} vs $first")
  }

  private def rmTree(dir: String): Unit = {
    val p = Paths.get(dir)
    if (Files.exists(p))
      Files.walk(p).sorted(Comparator.reverseOrder[Path]())
        .forEach(f => Files.delete(f))
  }
}
