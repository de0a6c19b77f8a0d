package graft.streaming

import graft.SparkTestSession
import org.scalatest.funsuite.AnyFunSuite
import java.nio.file.{Files, Path, Paths}
import java.util.Comparator
import scala.collection.mutable

/** Streaming MinHash-LSH near-dup suppression: a near-duplicate (one token
  * changed) of a document kept in ANY earlier micro-batch never reaches the
  * sink; unrelated documents always do; re-fired batches re-emit
  * identically against their own store partition.
  */
class NearDupStreamSpec extends AnyFunSuite {
  lazy val spark = SparkTestSession.spark

  private def tmp(prefix: String): String =
    Files.createTempDirectory(Paths.get("target"), prefix).toString

  private def rmTree(dir: String): Unit = {
    val p = Paths.get(dir)
    if (Files.exists(p))
      Files.walk(p).sorted(Comparator.reverseOrder[Path]())
        .forEach(f => Files.delete(f))
  }

  // high-Jaccard corpus: a one-token edit of `base` keeps J ≈ 0.95, so at
  // 32 hashes × 8 bands the band-collision probability is ~1 and, being
  // fully deterministic (md5 family), the collisions below are pinned facts
  private val base =
    ("the quick brown fox jumps over the lazy dog while seven wizards " +
      "brew hot coffee at midnight near the old stone bridge ") * 5
  private val nearA = base.replace("lazy", "sleepy")
  private val nearB = base.replace("coffee", "tea")
  private val unrelated =
    ("completely different subject matter entirely about spacecraft " +
      "navigation systems and orbital mechanics textbooks ") * 5

  test("near-dups are suppressed across and within batches; unrelated pass") {
    val dir = tmp("ndstream")
    val ckpt = tmp("ndstream_ck")
    val store = tmp("ndstream_store") + "/store"
    val emitted = mutable.ArrayBuffer.empty[(Long, String)]

    def drain(): Unit = {
      val q = NearDupStream.run(spark, dir, ckpt, store) { (kept, bid) =>
        emitted ++= kept.select("path").collect()
          .map(r => (bid, r.getString(0).split('/').last))
      }
      q.awaitTermination()
    }

    Files.writeString(Paths.get(dir, "a.txt"), base)
    Files.writeString(Paths.get(dir, "b.txt"), nearA) // in-batch near-dup of a
    Files.writeString(Paths.get(dir, "c.txt"), unrelated)
    drain()
    assert(emitted.map(_._2).sorted == Seq("a.txt", "c.txt"),
      s"batch 0 emitted: $emitted")

    // cross-batch: another near-dup of a (suppressed by the store), one new
    Files.writeString(Paths.get(dir, "d.txt"), nearB)
    Files.writeString(Paths.get(dir, "e.txt"), "tiny") // <3 tokens: always kept
    drain()
    assert(emitted.map(_._2).sorted == Seq("a.txt", "c.txt", "e.txt"),
      s"after batch 1: $emitted")

    // store registers bands for KEPT signature-bearing docs only (a, c):
    // 8 bands each, all distinct
    val bandRows = spark.read.parquet(store).count()
    assert(bandRows == 16L, s"store rows: $bandRows")
  }

  test("SimHash stream suppresses hamming-close docs across batches") {
    val dir = tmp("shstream")
    val ckpt = tmp("shstream_ck")
    val store = tmp("shstream_store") + "/store"
    val emitted = mutable.ArrayBuffer.empty[(Long, String)]

    def drain(): Unit = {
      val q = NearDupStream.runSimHash(spark, dir, ckpt, store) { (kept, bid) =>
        emitted ++= kept.select("path").collect()
          .map(r => (bid, r.getString(0).split('/').last))
      }
      q.awaitTermination()
    }

    // one changed token OCCURRENCE (not all repeats) keeps hamming ≤ 3
    // under the md5 family (pinned in ExtSpec) — pigeonhole guarantees a
    // clean band among the 4×16, so suppression is a deterministic fact
    val unit = "alpha beta gamma delta epsilon zeta eta theta "
    val shBase = (unit * 10).trim
    val shNearA = (unit * 9 + unit.replace("zeta", "rho")).trim
    // NOT "eta"->… : "eta" substrings beta/zeta/theta and replace() would
    // rewrite them all (hamming 7, no clean band)
    val shNearB = (unit * 9 + unit.replace("beta", "nu")).trim
    val shOther = ("other thing entirely unrelated words " * 10).trim

    Files.writeString(Paths.get(dir, "a.txt"), shBase)
    Files.writeString(Paths.get(dir, "b.txt"), shNearA) // in-batch near-dup
    Files.writeString(Paths.get(dir, "c.txt"), shOther)
    drain()
    assert(emitted.map(_._2).sorted == Seq("a.txt", "c.txt"),
      s"batch 0 emitted: $emitted")

    Files.writeString(Paths.get(dir, "d.txt"), shNearB) // cross-batch near-dup
    drain()
    assert(emitted.map(_._2).sorted == Seq("a.txt", "c.txt"),
      s"after batch 1: $emitted")

    // every kept doc fingerprints: a and c registered 4 bands each
    assert(spark.read.parquet(store).count() == 8L)
  }

  test("re-fired batch re-emits identically against its own store partition") {
    val dir = tmp("ndfire")
    val ckpt = tmp("ndfire_ck")
    val store = tmp("ndfire_store") + "/store"
    val emitted = mutable.ArrayBuffer.empty[(Long, String)]

    def drain(): Unit = {
      val q = NearDupStream.run(spark, dir, ckpt, store) { (kept, bid) =>
        emitted ++= kept.select("path").collect()
          .map(r => (bid, r.getString(0).split('/').last))
      }
      q.awaitTermination()
    }

    Files.writeString(Paths.get(dir, "a.txt"), base)
    Files.writeString(Paths.get(dir, "b.txt"), unrelated)
    drain()
    val first = emitted.toSet
    assert(first.map(_._2) == Set("a.txt", "b.txt"))

    rmTree(ckpt) // lost checkpoint commit: batch 0 replays against warm store
    drain()
    assert(emitted.size == 4, s"re-fire dropped rows: $emitted")
    assert(emitted.toSet == first, s"re-fire diverged: $emitted")
    // batch=0 partition overwritten, not appended: still 16 band rows
    assert(spark.read.parquet(store).count() == 16L)
  }
}
