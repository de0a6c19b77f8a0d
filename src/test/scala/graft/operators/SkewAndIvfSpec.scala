package graft.operators

import graft.SparkTestSession
import graft.ext.IvfAnn
import org.apache.spark.sql.functions._
import org.scalatest.funsuite.AnyFunSuite

class SkewAndIvfSpec extends AnyFunSuite {
  lazy val spark = SparkTestSession.spark
  import spark.implicits._

  test("saltedJoin matches plain join results on skewed data") {
    // 90% of big-side rows share one hot key
    val big = (1 to 1000).map(i =>
      (if (i <= 900) "hot" else s"k${i % 7}", i.toLong)).toDF("key", "v")
    val small = Seq(("hot", 1), ("k1", 2), ("k3", 3)).toDF("key", "w")
    val plain = big.join(small, "key").agg(sum($"v" * $"w")).head().getLong(0)
    val salted = SkewJoin.saltedJoin(big, small, "key", 8, Seq($"v"))
      .agg(sum($"v" * $"w")).head().getLong(0)
    assert(salted == plain)
  }

  test("salt spreads a hot key over many buckets") {
    val big = (1 to 1000).map(i => ("hot", i.toLong)).toDF("key", "v")
    val buckets = big.select(SkewJoin.salt(8, $"v").as("s"))
      .distinct().count()
    assert(buckets == 8)
  }

  test("saltedJoinExpr matches plain join, keeps the salt, and the forced " +
      "SMJ joins on (key, salt)") {
    val big = (1 to 1000).map(i =>
      (if (i <= 900) "hot" else s"k${i % 7}", i.toLong)).toDF("key", "v")
    val small = Seq(("hot", 1), ("k1", 2), ("k3", 3)).toDF("key", "w")
    // oracle-recomputable salt shape (md5 hex nibble mod 4) as used by the
    // j9_salted_skew gate
    val saltExpr = pmod(
      conv(substring(md5($"v".cast("string")), 1, 1), 16, 10).cast("int"),
      lit(4))
    val joined = SkewJoin.saltedJoinExpr(big, small.hint("merge"), "key", 4,
      saltExpr, saltOut = "salt")
    val plain = big.join(small, "key").agg(sum($"v" * $"w")).head().getLong(0)
    assert(joined.agg(sum($"v" * $"w")).head().getLong(0) == plain)
    // the salt column survives for spread audit, and every value is in range
    val spread = joined.filter($"key" === "hot")
      .groupBy($"salt").count().collect()
    assert(spread.length == 4 &&
      spread.forall(r => r.getInt(0) >= 0 && r.getInt(0) < 4))
    // the hot key really splits: no salt bucket holds more than half its rows
    assert(spread.forall(_.getLong(1) < 450))
    // plan: a real sort-merge join on the composite (key, salt) — the
    // exchange that spreads the hot key is present, not broadcast away
    // (string match: under AQE the join sits inside AdaptiveSparkPlan)
    val plan = joined.queryExecution.executedPlan.toString
    assert(plan.contains("SortMergeJoin"), s"expected a SortMergeJoin:\n$plan")
    assert("SortMergeJoin \\[key#\\d+, salt#\\d+\\]".r.findFirstIn(plan).isDefined,
      s"expected composite (key, salt) join keys:\n$plan")
  }

  test("saltedCount equals plain count per key") {
    val df = (1 to 500).map(i => (s"k${i % 3}", i.toLong)).toDF("key", "v")
    val plain = df.groupBy($"key").count()
      .collect().map(r => r.getString(0) -> r.getLong(1)).toMap
    val salted = SkewJoin.saltedCount(df, "key", 4, Seq($"v"))
      .collect().map(r => r.getString(0) -> r.getLong(1)).toMap
    assert(salted == plain)
  }

  test("PQ codes are well-formed, deterministic, and the encode pass is narrow") {
    val e = graft.Tables.embeddings(spark, "/root/testdata/sf0.001")
      .select($"vec_id", transform($"embedding", x => x.cast("double")).as("ev"))
    val cb = graft.ext.PqAnn.seedCodebooks(e, m = 8, k = 16)
    assert(cb.cents.length == 8 && cb.cents.forall(_.length == 16) &&
      cb.subDim == 8)
    def codesOf() = graft.ext.PqAnn.encode(e, cb).collect()
      .map(r => r.getLong(0) -> r.getSeq[Int](1)).toMap
    val codes = codesOf()
    assert(codes.size == 500)
    codes.values.foreach { c =>
      assert(c.length == 8 && c.forall(x => x >= 0 && x < 16))
    }
    assert(codesOf() == codes, "encoding must be deterministic")
    // the kernel is a broadcast-codebook narrow pass: no shuffle, no window
    val plan = graft.ext.PqAnn.encode(e, cb)
      .queryExecution.executedPlan.toString
    assert(!plan.contains("Exchange"), s"encode shuffles:\n$plan")
  }

  test("PQ ADC top-k recalls exact-L2 neighbors on real embeddings") {
    val e = graft.Tables.embeddings(spark, "/root/testdata/sf0.001")
      .select($"vec_id", transform($"embedding", x => x.cast("double")).as("ev"))
    val vecs = e.collect().map(r => r.getLong(0) -> r.getSeq[Double](1)).toMap
    val cb = graft.ext.PqAnn.seedCodebooks(e, m = 8, k = 16)
    val codes = graft.ext.PqAnn.encode(e, cb)
    def exactTop(q: Long, k: Int): Set[Long] = {
      val qv = vecs(q)
      vecs.toSeq.map { case (id, v) =>
        id -> v.zip(qv).map { case (a, b) => (a - b) * (a - b) }.sum
      }.sortBy { case (id, d) => (d, id) }.take(k).map(_._1).toSet
    }
    // ADC must rank the query's own vector first (its self-distance is
    // pure quantization error, smaller than any other vector's), and
    // distances come out ascending
    Seq(0L, 7L, 42L).foreach { q =>
      val out = graft.ext.PqAnn.searchAdc(codes, cb, vecs(q), 10).collect()
      assert(out.head.getLong(0) == q, s"query $q: own vector must rank first")
      val ds = out.map(_.getDouble(1))
      assert(ds.sameElements(ds.sorted))
    }
    // PQ's production contract is two-stage: ADC shortlists, exact L2
    // re-ranks the shortlist. Direct ADC top-10 vs exact top-10 on these
    // spread-out vectors is the documented weak baseline; the SHORTLIST
    // must carry the true neighbors. Measure both.
    def recallsWith(book: graft.ext.PqAnn.Codebooks,
        enc: org.apache.spark.sql.DataFrame, nCand: Int): Seq[Int] =
      Seq(0L, 7L, 42L).map { q =>
        val got = graft.ext.PqAnn
          .searchAdcRerank(enc, e, book, vecs(q), 10, nCand)
          .collect().map(_.getLong(0)).toSet
        (exactTop(q, 10) & got).size
      }
    val seeded50 = recallsWith(cb, codes, 50)
    info(s"seeded rerank@50 recall: $seeded50")
    // training (per-subspace k-means) must strictly shrink total
    // quantization error — the Lloyd monotonicity guarantee
    def quantErr(book: graft.ext.PqAnn.Codebooks): Double = {
      val codeMap = graft.ext.PqAnn.encode(e, book).collect()
        .map(r => r.getLong(0) -> r.getSeq[Int](1)).toMap
      vecs.map { case (id, v) =>
        val cs = codeMap(id)
        (0 until book.m).map { b =>
          book.cents(b)(cs(b)).zipWithIndex.map { case (c, i) =>
            val d = v(b * book.subDim + i) - c; d * d
          }.sum
        }.sum
      }.sum
    }
    val trained = graft.ext.PqAnn.train(e, cb, iters = 2)
    val (e0, e1) = (quantErr(cb), quantErr(trained))
    info(f"quantization error seeded=$e0%.2f trained=$e1%.2f")
    assert(e1 < e0, f"training must shrink quantization error ($e0%.2f -> $e1%.2f)")
    val trainedEnc = graft.ext.PqAnn.encode(e, trained)
    val trained50 = recallsWith(trained, trainedEnc, 50)
    info(s"trained rerank@50 recall: $trained50")
    // floors reflect what quantized shortlists can do on this corpus:
    // near-isotropic vectors (max pair cosine ~0.51) make the true
    // top-10 barely separable — @50 lands 5-8/10, @100 (20% of corpus)
    // must recover nearly all of it. Deterministic: pinned at observed.
    assert(trained50.forall(_ >= 5), s"trained rerank@50 recall: $trained50")
    val trained100 = recallsWith(trained, trainedEnc, 100)
    info(s"trained rerank@100 recall: $trained100")
    assert(trained100.forall(_ >= 7) && trained100.sum >= 24,
      s"trained rerank@100 recall: $trained100")
  }

  test("IVFADC: full probe + corpus shortlist degrades to exact; pruned probes recall") {
    val e = graft.Tables.embeddings(spark, "/root/testdata/sf0.001")
      .select($"vec_id", transform($"embedding", x => x.cast("double")).as("ev"))
    val vecs = e.collect().map(r => r.getLong(0) -> r.getSeq[Double](1)).toMap
    val index = IvfAnn.build(e, nCentroids = 8, lloydIters = 0)
    val cb = graft.ext.PqAnn.seedCodebooks(e, m = 8, k = 16)
    val enc = graft.ext.PqAnn.encodeIndexed(index, cb).localCheckpoint(true)
    def exactTop(q: Long, k: Int): Seq[Long] = {
      val qv = vecs(q)
      vecs.toSeq.map { case (id, v) =>
        id -> v.zip(qv).map { case (a, b) => (a - b) * (a - b) }.sum
      }.sortBy { case (id, d) => (d, id) }.take(k).map(_._1)
    }
    // full probe + corpus-sized shortlist: the exact-L2 re-rank sees every
    // vector, so the output IS brute force (quantization only ordered the
    // shortlist, which no longer truncates)
    val full = graft.ext.PqAnn
      .searchIvfPq(index, enc, cb, vecs(3L), nProbe = 8, topK = 10,
        nCandidates = 500)
      .collect().map(_.getLong(0)).toSeq
    assert(full == exactTop(3L, 10), "degradation-to-exact broken")
    // pruned: 2 of 8 cells + 100-candidate shortlist — the composed
    // approximation. Deterministic overlap pinned at observed.
    val recalls = Seq(0L, 7L, 42L).map { q =>
      val got = graft.ext.PqAnn
        .searchIvfPq(index, enc, cb, vecs(q), nProbe = 2, topK = 10,
          nCandidates = 100)
        .collect().map(_.getLong(0)).toSet
      (exactTop(q, 10).toSet & got).size
    }
    info(s"IVFADC nProbe=2/8 rerank@100 recall: $recalls")
    assert(recalls.forall(_ >= 3) && recalls.sum >= 11,
      s"IVFADC pruned recall collapsed: $recalls")
  }

  test("IVF build seeds exactly min(n, nCentroids) centroids, any input size") {
    def emb(n: Int) = (0 until n)
      .map(i => (i.toLong, Seq(i.toDouble, 1.0))).toDF("vec_id", "ev")
    // tiny input: nCentroids > n must yield n centroids, not fewer/more
    assert(IvfAnn.build(emb(3), nCentroids = 8).centroids.length == 3)
    // sizes where expectation-based sampling historically undershot:
    // the TakeOrdered seeding is exact by construction
    assert(IvfAnn.build(emb(100), nCentroids = 16).centroids.length == 16)
    assert(IvfAnn.build(emb(17), nCentroids = 16).centroids.length == 16)
  }

  test("IVF buildAuto derives k from n with a kMin floor") {
    def emb(n: Int) = (0 until n)
      .map(i => (i.toLong, Seq(i.toDouble, 1.0))).toDF("vec_id", "ev")
    // n=1000 / target 100 => k=10; floor case n=100 / target 100 => kMin=8
    assert(IvfAnn.buildAuto(emb(1000), targetCellSize = 100, lloydIters = 0)
      .centroids.length == 10)
    assert(IvfAnn.buildAuto(emb(100), targetCellSize = 100, lloydIters = 0)
      .centroids.length == 8)
  }

  test("coarse assignment at full probe equals flat assignment exactly") {
    import org.apache.spark.sql.functions._
    val e = graft.Tables.embeddings(spark, "/root/testdata/sf0.001")
      .select($"vec_id", transform($"embedding", x => x.cast("double")).as("ev"))
      .filter($"vec_id" < 400)
    val cents = IvfAnn.seedCentroids(e, 32)
    val flat = IvfAnn.build(e, 32, lloydIters = 0).assigned
      .select($"vec_id", $"cluster").collect()
      .map(r => r.getLong(0) -> r.getInt(1)).toMap
    val full = IvfAnn.assignCoarse(e, cents, coarseProbe = 1000)
      .select($"vec_id", $"cluster").collect()
      .map(r => r.getLong(0) -> r.getInt(1)).toMap
    assert(full == flat, "full-probe coarse assignment must be exact")
  }

  test("coarse-assigned SemDedup still drops planted near-duplicate twins") {
    // cell-boundary agreement with flat assignment is the WRONG metric on
    // isotropic vectors (any cell is almost equally far; measured ~73%) —
    // what the dedup semantics need is that near-parallel PAIRS co-locate,
    // which holds because twins have near-identical coarse scores. Plant
    // 50 twins among 250 seeded-random vectors: the coarse path must drop
    // (almost) all of them; boundary knife-edges are deterministic, so the
    // observed drop count is a pinned fact, floored here at 48/50.
    import org.apache.spark.sql.functions._
    val rnd = new scala.util.Random(11)
    def unit(): Array[Double] = {
      val v = Array.fill(16)(rnd.nextGaussian())
      val n = math.sqrt(v.map(x => x * x).sum)
      v.map(_ / n)
    }
    val base = (0 until 250).map(i => (i.toLong, unit().toSeq))
    val twins = (0 until 50).map { i =>
      val b = base(i)._2.toArray
      b(0) += 0.01 // tiny perturbation: cos vs base ~ 0.99995
      (1000L + i, b.toSeq)
    }
    val e = (base ++ twins).toDF("vec_id", "ev")
    val out = graft.ext.SemDedup
      .semanticDedupCoarse(e, tau = 0.95, targetClusterSize = 10)
      .collect().map(r => r.getLong(0) -> r.getBoolean(2)).toMap
    val droppedTwins = (0 until 50).count(i => !out(1000L + i))
    assert(droppedTwins >= 48, s"only $droppedTwins/50 planted twins dropped")
    // and the coarse path must not over-drop the distinct base vectors
    val keptBase = (50 until 250).count(i => out(i.toLong))
    assert(keptBase >= 195, s"only $keptBase/200 distinct bases kept")
  }

  test("IVF assignment is a narrow per-row pass: no shuffle, no row explosion") {
    val emb = graft.Tables.embeddings(spark, "/root/testdata/sf0.001")
      .select($"vec_id", transform($"embedding", x => x.cast("double")).as("ev"))
    val plan = IvfAnn.build(emb, nCentroids = 8)
      .assigned.queryExecution.executedPlan.toString
    assert(!plan.contains("Exchange"), s"assignment shuffles:\n$plan")
    assert(!plan.contains("Window"), s"assignment uses a window:\n$plan")
  }

  test("IVF build at k=1024/dim=64: plan size independent of codebook size") {
    // the realistic-regime guard: centroids ship as a broadcast consumed by
    // a typed kernel, not as k×dim literal nodes — the assignment plan must
    // stay narrow AND small no matter how large the codebook is
    val dim = 64
    val emb = (0 until 3000).map { i =>
      (i.toLong, Seq.tabulate(dim)(d => ((i * 31 + d * 7) % 101).toDouble))
    }.toDF("vec_id", "ev")
    val index = IvfAnn.build(emb, nCentroids = 1024)
    assert(index.centroids.length == 1024)
    val plan = index.assigned.queryExecution.executedPlan.toString
    assert(!plan.contains("Exchange"), s"assignment shuffles:\n${plan.take(2000)}")
    assert(plan.length < 20000,
      s"plan grows with codebook size (${plan.length} chars) — literals leaked back in")
    assert(index.assigned.count() == 3000)
  }

  test("IVF Lloyd refinement tightens clusters on separable data") {
    // two well-separated direction bundles; after one Lloyd pass each
    // centroid must sit inside one bundle, i.e. every vector's cosine to
    // its own centroid exceeds any cross-bundle cosine
    val a = (0 until 40).map(i => (i.toLong, Seq(100.0 + i % 3, 1.0, 0.0)))
    val b = (40 until 80).map(i => (i.toLong, Seq(0.0, 1.0, 100.0 + i % 3)))
    val emb = (a ++ b).toDF("vec_id", "ev")
    val idx = IvfAnn.build(emb, nCentroids = 2, lloydIters = 2)
    val byCluster = idx.assigned.select($"vec_id", $"cluster")
      .collect().map(r => r.getLong(0) -> r.getInt(1)).toMap
    val clustersA = (0L until 40L).map(byCluster).toSet
    val clustersB = (40L until 80L).map(byCluster).toSet
    assert(clustersA.size == 1 && clustersB.size == 1 && clustersA != clustersB,
      s"bundles not separated: A=$clustersA B=$clustersB")
  }

  test("persisted IVF index prunes partitions on probe") {
    val emb = graft.Tables.embeddings(spark, "/root/testdata/sf0.001")
      .select($"vec_id", transform($"embedding", x => x.cast("double")).as("ev"))
    val index = IvfAnn.build(emb, nCentroids = 8)
    val dir = java.nio.file.Files.createTempDirectory(
      java.nio.file.Paths.get("target"), "ivf").toString
    IvfAnn.writeIndex(index, dir)
    // at rest: one directory per cluster
    val parts = new java.io.File(dir).listFiles()
      .filter(_.getName.startsWith("cluster=")).map(_.getName).sorted
    assert(parts.length == index.centroids.length, parts.mkString(","))

    val onDisk = IvfAnn.readIndex(spark, dir, index.centroids)
    val qv = emb.filter($"vec_id" === 0).head().getSeq[Double](1)
    // the probe's scan must carry cluster as a PARTITION filter (pruned
    // at planning — only the probed directories are read)
    val probe = IvfAnn.search(onDisk, qv, nProbe = 3, k = 10)
    val scan = probe.queryExecution.executedPlan.toString
    assert(scan.contains("PartitionFilters") && scan.contains("cluster"),
      s"probe does not prune partitions:\n$scan")
    // and results match the in-memory index exactly
    val mem = IvfAnn.search(index, qv, nProbe = 3, k = 10)
      .collect().map(r => (r.getLong(0), r.getDouble(1))).toSeq
    val disk = probe.collect().map(r => (r.getLong(0), r.getDouble(1))).toSeq
    assert(disk == mem)
  }

  test("IVF kNN join: full probe equals brute force; pruned probe recalls") {
    import graft.Tables
    val e = Tables.embeddings(spark, "/root/testdata/sf0.001")
      .select($"vec_id", transform($"embedding", x => x.cast("double")).as("ev"))
    val index = IvfAnn.build(e, nCentroids = 8)
    val queries = e.filter($"vec_id" < 20)
      .select($"vec_id".as("qid"), $"ev".as("qv"))
    def rows(df: org.apache.spark.sql.DataFrame) =
      df.collect().map(r => (r.getLong(0), r.getInt(1), r.getLong(2), r.getDouble(3))).toSeq

    val brute = rows(graft.SparkEntry.queries("x4_knn_join")(
      spark, "/root/testdata/sf0.001"))
    val full = rows(IvfAnn.searchJoin(index, queries, nProbe = 8, k = 3))
    assert(full == brute, "full-probe kNN join must equal brute force")

    // pruned probes: each query's top-3 overlaps brute-force top-3
    val pruned = IvfAnn.searchJoin(index, queries, nProbe = 3, k = 3)
      .collect().map(r => (r.getLong(0), r.getLong(2)))
      .groupBy(_._1).view.mapValues(_.map(_._2).toSet).toMap
    val bruteBy = brute.groupBy(_._1).view
      .mapValues(_.map(_._3).toSet).toMap
    val overlap = bruteBy.map { case (q, b) =>
      (pruned.getOrElse(q, Set.empty) & b).size }.sum
    assert(overlap >= 30, s"pruned kNN-join recall too low: $overlap/60")
  }

  test("IVF-fed label audit at full probe equals the brute-force query") {
    import graft.Tables
    import graft.queries.Similarity
    val sf = "/root/testdata/sf0.001"
    val labels = Tables.embeddings(spark, sf).select($"vec_id", $"label")
    val e = Tables.embeddings(spark, sf)
      .select($"vec_id", transform($"embedding", x => x.cast("double")).as("ev"))
    val index = IvfAnn.build(e, nCentroids = 8)
    // same vec_id < 500 bound as the brute query's audited side — vacuous
    // at sf0.001 (ids are 0..499) but keeps the equivalence pinned to the
    // same query set if the fixture ever grows
    val queries = e.filter($"vec_id" < 500)
      .select($"vec_id".as("qid"), $"ev".as("qv"))
    // searchJoin's top-k tie-break (cos desc, vec_id) matches the brute
    // query's window, so at nProbe = nCentroids the neighbor sets — and
    // therefore the whole audit — must be identical
    val nb = IvfAnn.searchJoin(index, queries, nProbe = 8, k = 5)
      .join(labels.select($"vec_id", $"label".as("n_label")), Seq("vec_id"))
      .join(labels.select($"vec_id".as("qid"), $"label".as("q_label")), Seq("qid"))
      .select($"qid", $"q_label", $"n_label")
    def rows(df: org.apache.spark.sql.DataFrame) =
      df.collect().map(r => (r.getLong(0), r.getInt(1), r.getInt(2),
        r.getLong(3), r.getBoolean(4))).toSeq
    val viaIvf = rows(Similarity.labelVoteAudit(nb))
    val brute = rows(graft.SparkEntry.queries("x4_knn_label_check")(spark, sf))
    assert(viaIvf == brute)
  }

  test("IVF ANN: full-probe search equals brute force; pruned probe overlaps") {
    val emb = graft.Tables.embeddings(spark, "/root/testdata/sf0.001")
      .select($"vec_id", transform($"embedding", x => x.cast("double")).as("ev"))
    // 2 Lloyd passes = converged clustering for this corpus (recall at
    // nProbe=3 measured 4/10 at iters=1, 5/10 at iters=2 and 3 under the
    // md5 seed ordering) — the recall floor below is a property of the
    // refined index, which is the realistic deployment shape
    val index = IvfAnn.build(emb, nCentroids = 8, lloydIters = 2)
    assert(index.assigned.count() == 500)

    val qv = emb.filter($"vec_id" === 0).head().getSeq[Double](1)
    val brute = graft.SparkEntry.queries("x4_cosine_topk")(
      spark, "/root/testdata/sf0.001").collect().map(_.getLong(0)).toSeq
    val full = IvfAnn.search(index, qv, nProbe = 8, k = 10)
      .collect().map(_.getLong(0)).toSeq
    assert(full == brute, "probing all clusters must equal brute force")

    val pruned = IvfAnn.search(index, qv, nProbe = 3, k = 10)
      .collect().map(_.getLong(0)).toSet
    assert(pruned.contains(0L)) // query's own cluster always probed first
    assert((pruned & brute.toSet).size >= 5,
      s"pruned recall too low: ${(pruned & brute.toSet).size}/10")
  }
}
