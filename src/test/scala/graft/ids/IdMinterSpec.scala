package graft.ids

import graft.SparkTestSession
import org.apache.spark.sql.functions._
import org.scalatest.funsuite.AnyFunSuite

class IdMinterSpec extends AnyFunSuite {
  lazy val spark = SparkTestSession.spark
  import spark.implicits._

  test("mintIds: dense, unique, deterministic under repartitioning (I1)") {
    val names = (1 to 100).map(i => f"file_$i%03d").toDF("path")
    val a = IdMinter.mintIds(names.repartition(7), 10L, "id", col("path"))
      .collect().map(r => r.getString(0) -> r.getLong(1)).toMap
    val b = IdMinter.mintIds(names.repartition(2), 10L, "id", col("path"))
      .collect().map(r => r.getString(0) -> r.getLong(1)).toMap
    assert(a == b)
    assert(a.values.toSeq.sorted == (11L to 110L))
    assert(a("file_001") == 11L)
  }

  test("dictionaryEncode: fresh dims are dense from 1") {
    val df = Seq("b", "a", "c", "a", "b").toDF("name")
    val dim = IdMinter.dictionaryEncode(df, "name", "pid")
      .collect().map(r => r.getString(0) -> r.getLong(1)).toMap
    assert(dim == Map("a" -> 1L, "b" -> 2L, "c" -> 3L))
  }

  test("dictionaryEncode: existing ids preserved, new names extend (I2)") {
    val existing = Seq(("a", 5L), ("b", 9L)).toDF("name", "pid")
    val incoming = Seq("b", "c", "d").toDF("name")
    val dim = IdMinter.dictionaryEncode(incoming, "name", "pid", Some(existing))
      .collect().map(r => r.getString(0) -> r.getLong(1)).toMap
    assert(dim("a") == 5L && dim("b") == 9L)
    assert(Set(dim("c"), dim("d")) == Set(10L, 11L))
  }

  test("dictionaryEncodeLocal agrees with the DataFrame arm, fresh + existing") {
    // seeded pseudo-random names including non-ASCII and shared prefixes —
    // the UTF8-binary ordering must match Spark's orderBy exactly
    val rnd = new scala.util.Random(4242)
    val pool = Seq("alpha", "Alpha", "alph", "z", "Z", "éclair", "中文",
      "a b", "a_b", "A", "") ++ (1 to 40).map(_ => rnd.alphanumeric.take(
      1 + rnd.nextInt(8)).mkString)
    val names = rnd.shuffle(pool ++ pool.take(13)).filter(_.nonEmpty)

    val freshDf = IdMinter.dictionaryEncode(names.toDF("name"), "name", "pid")
      .collect().map(r => r.getString(0) -> r.getLong(1)).toMap
    val freshLocal = IdMinter.dictionaryEncodeLocal(names).toMap
    assert(freshLocal == freshDf)

    val existingSeq = freshLocal.toSeq.filter(_._2 % 3 == 0)
    val existingDf = existingSeq.toDF("name", "pid")
    val extDf = IdMinter.dictionaryEncode(
      names.toDF("name"), "name", "pid", Some(existingDf))
      .collect().map(r => r.getString(0) -> r.getLong(1)).toMap
    val extLocal = IdMinter.dictionaryEncodeLocal(names, existingSeq).toMap
    assert(extLocal == extDf)
  }
}
