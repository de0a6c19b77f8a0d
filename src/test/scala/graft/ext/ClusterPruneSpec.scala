package graft.ext

import graft.SparkTestSession
import graft.queries.Similarity
import org.apache.spark.sql.expressions.Window
import org.apache.spark.sql.functions._
import org.scalatest.funsuite.AnyFunSuite

class ClusterPruneSpec extends AnyFunSuite {
  lazy val spark = SparkTestSession.spark
  import spark.implicits._

  // 3 clusters along axes; cluster i has vectors of decreasing alignment
  // with its centroid so prototypicality ordering is known by construction.
  private def fixture() = {
    val cents = Array(
      0 -> Seq(1.0, 0.0, 0.0), 1 -> Seq(0.0, 1.0, 0.0), 2 -> Seq(0.0, 0.0, 1.0))
    val rows = for {
      c <- 0 to 2
      i <- 0 to 4 // tilt grows with i => cos_own falls with i
    } yield {
      val tilt = i * 0.15
      val ev = Seq.tabulate(3)(j =>
        (if (j == c) 1.0 else 0.0) + (if (j == (c + 1) % 3) tilt else 0.0))
      (c * 10L + i, ev, c)
    }
    (rows.toDF("vec_id", "ev", "cluster"), cents)
  }

  test("prototypicality: cosine to own centroid, ordered by tilt") {
    val (assigned, cents) = fixture()
    val proto = ClusterPrune.prototypicality(assigned, cents)
      .orderBy($"vec_id").collect()
    assert(proto.length == 15)
    // tilt 0 is exactly aligned; larger tilt => strictly lower cos_own
    val byCluster = proto.groupBy(_.getInt(1))
    byCluster.foreach { case (_, rows) =>
      val cos = rows.sortBy(_.getLong(0)).map(_.getDouble(2))
      assert(cos.head == 1.0)
      assert(cos.sameElements(cos.sorted(Ordering[Double].reverse)), cos.toSeq)
    }
  }

  test("balancedSample keeps ceil(frac * cluster_size) hardest rows per cluster") {
    val (assigned, cents) = fixture()
    val proto = ClusterPrune.prototypicality(assigned, cents)
    val out = ClusterPrune.balancedSample(proto, frac = 0.4).collect()
    assert(out.length == 15)
    val kept = out.filter(_.getBoolean(4))
    // ceil(0.4 * 5) = 2 per cluster
    assert(kept.groupBy(_.getInt(1)).forall(_._2.length == 2))
    // hardestFirst: kept rows are the LOWEST cos_own of their cluster
    out.groupBy(_.getInt(1)).foreach { case (_, rows) =>
      val keptMax = rows.filter(_.getBoolean(4)).map(_.getDouble(2)).max
      val dropMin = rows.filterNot(_.getBoolean(4)).map(_.getDouble(2)).min
      assert(keptMax <= dropMin)
    }
  }

  test("balancedSample hardestFirst=false keeps the most prototypical rows") {
    val (assigned, cents) = fixture()
    val proto = ClusterPrune.prototypicality(assigned, cents)
    val out = ClusterPrune.balancedSample(proto, frac = 0.2, hardestFirst = false)
      .collect()
    out.groupBy(_.getInt(1)).foreach { case (_, rows) =>
      val kept = rows.filter(_.getBoolean(4))
      assert(kept.length == 1) // ceil(0.2 * 5)
      assert(kept.head.getDouble(2) == rows.map(_.getDouble(2)).max)
    }
  }

  test("mrlSearchJoin at full prefix dim + corpus-wide shortlist == brute force") {
    val e = graft.Tables.embeddings(spark, "/root/testdata/sf0.001")
      .select($"vec_id", transform($"embedding", x => x.cast("double")).as("ev"))
    val queries = e.filter($"vec_id" < 5)
      .select($"vec_id".as("qid"), $"ev".as("qv"))
    val n = e.count().toInt
    val mrl = Similarity.mrlSearchJoin(e, queries, prefixDim = 64,
      shortlist = n, k = 3).orderBy($"qid", $"rn").collect().toSeq
    val w = Window.partitionBy($"qid").orderBy($"cos".desc, $"vec_id")
    val brute = e.join(broadcast(queries), $"vec_id" =!= $"qid")
      .select($"qid", $"vec_id",
        round(Similarity.cosine($"ev", $"qv"), 4).as("cos"))
      .withColumn("rn", row_number().over(w))
      .filter($"rn" <= 3)
      .select($"qid", $"rn", $"vec_id", $"cos")
      .orderBy($"qid", $"rn").collect().toSeq
    assert(mrl == brute)
  }

  test("mrlSearchJoin prefix-16 shortlist-50 finds most full-dim top-3 neighbors") {
    val e = graft.Tables.embeddings(spark, "/root/testdata/sf0.001")
      .select($"vec_id", transform($"embedding", x => x.cast("double")).as("ev"))
    val queries = e.filter($"vec_id" < 10)
      .select($"vec_id".as("qid"), $"ev".as("qv"))
    val mrl = Similarity.mrlSearchJoin(e, queries, prefixDim = 16,
      shortlist = 50, k = 3)
      .select($"qid", $"vec_id").as[(Long, Long)].collect().toSet
    val w = Window.partitionBy($"qid").orderBy($"cos".desc, $"vec_id")
    val truth = e.join(broadcast(queries), $"vec_id" =!= $"qid")
      .select($"qid", $"vec_id",
        round(Similarity.cosine($"ev", $"qv"), 4).as("cos"))
      .withColumn("rn", row_number().over(w))
      .filter($"rn" <= 3)
      .select($"qid", $"vec_id").as[(Long, Long)].collect().toSet
    val recall = truth.count(mrl.contains).toDouble / truth.size
    assert(recall >= 0.5, s"prefix-16 recall $recall over ${truth.size} truth pairs")
  }
}
