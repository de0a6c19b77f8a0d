package graft

import org.scalatest.funsuite.AnyFunSuite

/** Smoke + pinned-value checks for a representative slice of the declared
  * query surface at sf0.001. Full oracle coverage is the driver's DuckDB
  * gate (tools/check_oracle.py locally); this spec guards regressions in
  * fast CI without the 90s full Verify run.
  */
class QueriesSpec extends AnyFunSuite {
  lazy val spark = SparkTestSession.spark
  val sf = "/root/testdata/sf0.001"

  test("every declared query has either oracle SQL or is explicitly rows-only") {
    val qs = SparkEntry.queries.keySet
    val oracles = SparkEntry.oracleSql.keySet
    assert(oracles.subsetOf(qs))
    val rowsOnly = qs -- oracles
    // EVERY query is oracle-checked as of r8: the md5 hash family made
    // signatures/fingerprints/hyperplanes/IVF-seeding SQL-derivable, and
    // m_media_meta's jpeg/mp4 arms became real header parsers (JFIF SOF /
    // ISO-BMFF boxes) whose id-derived round-trips the oracle recomputes,
    // with the unknown-kind stub formula derived via ascii() over the
    // ASCII corpus.
    assert(rowsOnly == Set.empty[String])
  }

  test("flagship entry returns rows") {
    assert(SparkEntry.entry(spark).count() > 0)
  }

  test("q1 pinned: six flag/status groups at sf0.001") {
    val rows = SparkEntry.queries("q1_pricing_summary")(spark, sf).collect()
    assert(rows.length == 6)
    // 3225 of 6000 sf0.001 lineitems pass the shipdate filter (seed=42 data)
    assert(rows.map(_.getAs[Long]("count_order")).sum == 3225L)
  }

  test("topk is ordered desc and bounded") {
    val rows = SparkEntry.queries("topk_orders")(spark, sf).collect()
    assert(rows.length == 10)
    val prices = rows.map(_.getDouble(2))
    assert(prices.zip(prices.tail).forall { case (a, b) => a >= b })
  }

  test("session windows: no session shorter than its event count demands") {
    val rows = SparkEntry.queries("t4_session")(spark, sf).collect()
    assert(rows.nonEmpty)
    assert(rows.forall(_.getAs[Long]("n_events") >= 1))
  }

  test("cosine topk: self-similarity first") {
    val rows = SparkEntry.queries("x4_cosine_topk")(spark, sf).collect()
    assert(rows.head.getAs[Long]("vec_id") == 0L)
    assert(rows.head.getAs[Double]("cos") == 1.0)
  }

  test("bench set is a subset of queries") {
    assert(SparkEntry.benchQueries.toSet.subsetOf(SparkEntry.queries.keySet))
    assert(SparkEntry.benchQueries.nonEmpty)
  }

  test("winnowing: near-dup docs share fingerprints, unrelated docs share none") {
    // (0, 82) is a planted near-dup pair at sf0.001 (MinHash est_jaccard 1.0)
    val fps = SparkEntry.queries("x_winnow_fingerprints")(spark, sf).collect()
      .groupBy(_.getLong(0)).map { case (id, rs) => id -> rs.map(_.getLong(1)).toSet }
    assert((fps(0L) & fps(82L)).nonEmpty,
      "near-dup pair must share at least one winnowed fingerprint")
    // density: winnowing selects ~2/(w+1) of positions; never more than grams
    assert(fps.values.forall(s => s.nonEmpty && s.size < 200))
    // discriminative: the median pairwise overlap over a sample is far below
    // the near-dup overlap (sanity that fingerprints aren't all-shared)
    val sample = fps.toSeq.sortBy(_._1).take(20)
    val overlaps = for (Seq((a, sa), (b, sb)) <- sample.combinations(2).toSeq)
      yield (sa & sb).size.toDouble / math.min(sa.size, sb.size)
    assert(overlaps.count(_ == 0.0) > overlaps.length / 2,
      "most unrelated pairs should share zero fingerprints")
  }

  test("cdc snapshot: tombstones win, snapshot+history halves agree") {
    import org.apache.spark.sql.functions._
    val snap = SparkEntry.queries("t_cdc_snapshot")(spark, sf).collect()
    val hist = SparkEntry.queries("t_scd2_intervals")(spark, sf)
    val current = hist.filter(col("is_current")).collect()
    // every user has exactly one current SCD2 row
    val nUsers = hist.select("user_id").distinct().count()
    assert(current.length == nUsers)
    // snapshot = the current SCD2 rows MINUS tombstoned keys ('error' last)
    val curById = current
      .map(r => r.getAs[Long]("user_id") -> r.getAs[String]("state_type"))
      .toMap
    val snapIds = snap.map(_.getAs[Long]("user_id")).toSet
    assert(snapIds == curById.collect {
      case (id, t) if t != "error" => id
    }.toSet)
    snap.foreach { r =>
      assert(curById(r.getAs[Long]("user_id")) == r.getAs[String]("last_type"))
      assert(r.getAs[String]("last_type") != "error")
    }
  }

  test("scd2 intervals: versions dense, valid_to chains to next valid_from") {
    val rows = SparkEntry.queries("t_scd2_intervals")(spark, sf).collect()
    rows.groupBy(_.getAs[Long]("user_id")).foreach { case (_, rs) =>
      val sorted = rs.sortBy(_.getAs[Int]("version"))
      assert(sorted.map(_.getAs[Int]("version")).toSeq == (1 to rs.length))
      sorted.sliding(2).foreach {
        case Array(a, b) =>
          assert(a.getAs[String]("valid_to") == b.getAs[String]("valid_from"),
            "interval chain must be gapless")
          assert(!a.getAs[Boolean]("is_current"))
        case _ =>
      }
      assert(sorted.last.getAs[Boolean]("is_current"))
      assert(sorted.last.getAs[String]("valid_to") == null)
    }
  }

  test("fuzzy join: finds planted exact-prefix dup pair, blocks all-pairs") {
    val rows = SparkEntry.queries("j8_fuzzy_join")(spark, sf).collect()
    val pairs = rows.map(r => (r.getLong(0), r.getLong(1))).toSet
    // (0, 82) is the planted near-dup pair (same one winnowing pins)
    assert(pairs.contains((0L, 82L)))
    assert(rows.forall(_.getAs[Int]("ed") <= 2))
    assert(rows.forall(r => r.getLong(0) < r.getLong(1)))
    // blocking must keep the match list far below all-pairs (124,750)
    assert(rows.length < 1000)
  }

  test("jaccard join: prefix filter loses no pair vs brute force") {
    import spark.implicits._
    import org.apache.spark.sql.functions._
    // the prefix filter is the correctness-critical piece: if it pruned a
    // true pair the output would silently shrink, which no oracle row can
    // catch (the oracle mirrors the same filter). Brute-force all-pairs
    // at sf0.001 (125k pairs) is cheap and makes the completeness claim a
    // test obligation, exactly like the minhash recall pins.
    def row5(r: org.apache.spark.sql.Row) =
      (r.getLong(0), r.getLong(1), r.getLong(2), r.getLong(3), r.getLong(4))
    val res = SparkEntry.queries("d_jaccard_join")(spark, sf)
      .collect().map(row5).toSeq
    val ts = Tables.documents(spark, sf)
      .groupBy($"text").agg(min($"doc_id").as("doc_id"))
      .select($"doc_id", array_distinct(split($"text", " ")).as("toks"))
    val brute = ts.select($"doc_id".as("a"), $"toks".as("ta"))
      .crossJoin(ts.select($"doc_id".as("b"), $"toks".as("tb")))
      .filter($"a" < $"b")
      .select($"a", $"b",
        size(array_intersect($"ta", $"tb")).cast("long").as("inter"),
        (size($"ta") + size($"tb") -
          size(array_intersect($"ta", $"tb"))).cast("long").as("uni"))
      .filter($"inter" * 10 >= $"uni" * 9)
      .withColumn("jacc_fp", expr("(inter * 1000000) div uni"))
      .orderBy($"jacc_fp".desc, $"a", $"b").limit(100)
      .collect().map(row5).toSeq
    assert(res == brute)
  }

  test("containment: clone pairs hit 1e6 on both sides, subset pairs only one") {
    val rows = SparkEntry.queries("d_containment")(spark, sf).collect()
      .map(r => (r.getLong(0), r.getLong(1), r.getLong(5), r.getLong(6)))
    assert(rows.nonEmpty)
    // every containment is a valid fixed-point fraction
    assert(rows.forall { case (_, _, ca, cb) =>
      ca >= 0 && ca <= 1000000 && cb >= 0 && cb <= 1000000 })
    // asymmetry exists in the corpus: some pair is (near-)fully contained
    // on exactly one side — the signal symmetric jaccard cannot express
    assert(rows.exists { case (_, _, ca, cb) =>
      (ca == 1000000) != (cb == 1000000) })
  }

  test("sentence dedup: exactly one surviving instance per distinct sentence") {
    val rows = SparkEntry.queries("d_sentence_dedup")(spark, sf).collect()
    assert(rows.length == 500)
    // kept_ppm is a valid fixed-point fraction and kept <= total
    assert(rows.forall { r =>
      val (n, kept, ppm) = (r.getLong(1), r.getLong(2), r.getLong(3))
      kept >= 0 && kept <= n && ppm == kept * 1000000L / n
    })
    // global invariant: sum of kept == number of DISTINCT sentence hashes
    import spark.implicits._
    import org.apache.spark.sql.functions._
    val totalKept = rows.map(_.getLong(2)).sum
    val distinctSentences = Tables.documents(spark, sf)
      .select($"doc_id", split($"text", " ").as("toks"))
      .select(posexplode(sequence(lit(0), size($"toks") - 1, lit(10)))
        .as(Seq("ci", "st")), $"toks")
      .select(md5(array_join(slice($"toks", $"st" + 1, lit(10)), " ")).as("h"))
      .distinct().count()
    assert(totalKept == distinctSentences)
    // the corpus HAS cross-doc duplication, so somebody lost a sentence
    assert(rows.exists(r => r.getLong(2) < r.getLong(1)))
  }

  test("unpivot: 3 measures per flag, values match the wide aggregate") {
    import spark.implicits._
    import org.apache.spark.sql.functions._
    val long = SparkEntry.queries("r7_unpivot")(spark, sf).collect()
    val flags = Tables.lineitem(spark, sf)
      .select($"l_returnflag").distinct().count()
    assert(long.length == 3 * flags)
    // n_items rows must agree with a direct count
    val counts = Tables.lineitem(spark, sf).groupBy($"l_returnflag").count()
      .collect().map(r => r.getString(0) -> r.getLong(1).toDouble).toMap
    val nItems = long.filter(_.getString(1) == "n_items")
      .map(r => r.getString(0) -> r.getDouble(2)).toMap
    assert(nItems == counts)
  }

  test("pmi bigrams: ordered by pmi desc, min support respected") {
    val rows = SparkEntry.queries("x_pmi_bigrams")(spark, sf).collect()
    assert(rows.length == 20)
    assert(rows.forall(_.getLong(2) >= 5))
    val pmis = rows.map(_.getDouble(3))
    assert(pmis.zip(pmis.tail).forall { case (x, y) => x >= y })
  }

  test("MMR: monotone greedy scores, pure-relevance first pick, " +
      "more diverse than top-k") {
    import spark.implicits._
    import org.apache.spark.sql.functions._
    val rows = SparkEntry.queries("x4_mmr_select")(spark, sf).collect()
      .map(r => (r.getInt(0), r.getLong(1), r.getLong(2), r.getLong(3),
        r.getLong(4)))
    assert(rows.map(_._1).toSeq == (1 to 8))
    // greedy objective is non-increasing FROM STEP 2 ON: per-item maxsim
    // only grows as the selected set grows, and the feasible set shrinks.
    // Step 1 is excluded — its maxsim is defined 0 (empty set), while
    // NEGATIVE similarities give later steps a bonus step 1 never gets
    // (observed at sf0.001: rank 2 scores above rank 1 via maxsim −698)
    val scores = rows.map(_._5).drop(1)
    assert(scores.zip(scores.tail).forall { case (a, b) => a >= b })
    // the first pick is pure relevance (no selected set to penalize)
    assert(rows.head._4 == 0L)
    assert(rows.head._3 == rows.map(_._3).max)
    // diversity: max pairwise similarity among MMR's picks must not
    // exceed that of the pure relevance top-8 (the operator's point)
    val e = Tables.embeddings(spark, sf)
      .select($"vec_id", transform($"embedding", x => x.cast("double"))
        .as("ev"))
    def maxPairSim(ids: Set[Long]): Double = {
      val sel = e.filter($"vec_id".isin(ids.toSeq: _*))
      sel.as("a").select($"vec_id".as("ia"), $"ev".as("ea"))
        .join(sel.as("b").select($"vec_id".as("ib"), $"ev".as("eb")),
          $"ia" < $"ib")
        .select(round(graft.queries.Similarity.cosine($"ea", $"eb"), 4)
          .as("c"))
        .agg(max($"c")).head().getDouble(0)
    }
    val q = e.filter($"vec_id" === 0).select($"ev".as("qv"))
    val top8 = e.filter($"vec_id" =!= 0).crossJoin(broadcast(q))
      .select($"vec_id",
        round(graft.queries.Similarity.cosine($"ev", $"qv"), 4).as("c"))
      .orderBy($"c".desc, $"vec_id").limit(8)
      .collect().map(_.getLong(0)).toSet
    val mmrSet = rows.map(_._2).toSet
    assert(mmrSet != top8, "MMR degenerated to pure top-k on this corpus")
    assert(maxPairSim(mmrSet) <= maxPairSim(top8))
  }
}
