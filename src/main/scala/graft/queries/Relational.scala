package graft.queries

import graft.{QueryDef, Tables}
import org.apache.spark.sql.{Column, DataFrame, SparkSession}
import org.apache.spark.sql.functions._

/** Relational query surface: scans, filters, scalar functions, aggregations,
  * joins, set ops, sorts/limits, pivot (SURVEY.md §2.1, §2.3–§2.7, §2.10).
  *
  * Every query is declarative DataFrame code — Catalyst does predicate
  * pushdown, column pruning, broadcast selection and AQE re-planning. At
  * 100 TB the same plans hold: small dims (region/nation/supplier/part at
  * TPC-H proportions) broadcast; the only large-large shuffle is
  * lineitem⋈orders, which AQE handles (skew-join + coalesce).
  */
object Relational {

  /** Exact cross-engine sum of a double column: the per-row cast to DECIMAL
    * defines the rounding point, decimal accumulation is exact and
    * order-independent (partial-agg safe), one DOUBLE conversion at the end
    * — mirrors `CAST(SUM(CAST(x AS DECIMAL(18,4))) AS DOUBLE)` in the
    * oracle. COST NOTE (noop-protocol profile, sf0.1): q1's per-row
    * double→decimal casts dominate its honest cost (scan+agg on native
    * doubles ≈ 0.31s vs 1.06s full) — the price of bit-exact distributive
    * aggregation, paid deliberately. The long fixed-point alternative
    * (round(x·10^s) summed as longs) matches only while the unscaled sum
    * stays below 2^53 and silently diverges from the oracle beyond it —
    * wrong at 100 TB group sizes, so decimal it is.
    */
  private[queries] def dsum(c: Column, scale: Int = 4): Column =
    sum(c.cast(s"decimal(18,$scale)")).cast("double")

  /** Exact cross-engine average: exact decimal sum, one double division. */
  private[queries] def davg(c: Column): Column =
    sum(c.cast("decimal(18,4)")).cast("double") / count(lit(1))

  private def li(s: SparkSession, d: String) = Tables.lineitem(s, d)
  private def ord(s: SparkSession, d: String) = Tables.orders(s, d)

  val defs: Seq[QueryDef] = Seq(

    // ---- A6: TPC-H Q1-style pricing summary (flagship + bench) -------------
    QueryDef(
      "q1_pricing_summary",
      (s, d) => {
        import s.implicits._
        li(s, d)
          .filter($"l_shipdate" <= lit("1998-09-02").cast("timestamp"))
          .groupBy($"l_returnflag", $"l_linestatus")
          .agg(
            dsum($"l_quantity").as("sum_qty"),
            dsum($"l_extendedprice").as("sum_base_price"),
            dsum($"l_extendedprice" * (lit(1) - $"l_discount"), 6)
              .as("sum_disc_price"),
            dsum($"l_extendedprice" * (lit(1) - $"l_discount") * (lit(1) + $"l_tax"), 6)
              .as("sum_charge"),
            davg($"l_quantity").as("avg_qty"),
            davg($"l_extendedprice").as("avg_price"),
            davg($"l_discount").as("avg_disc"),
            count(lit(1)).as("count_order"))
          .orderBy($"l_returnflag", $"l_linestatus")
      },
      Some("""SELECT l_returnflag, l_linestatus,
        CAST(SUM(CAST(l_quantity AS DECIMAL(18,4))) AS DOUBLE) AS sum_qty,
        CAST(SUM(CAST(l_extendedprice AS DECIMAL(18,4))) AS DOUBLE) AS sum_base_price,
        CAST(SUM(CAST(l_extendedprice * (1 - l_discount) AS DECIMAL(18,6))) AS DOUBLE) AS sum_disc_price,
        CAST(SUM(CAST(l_extendedprice * (1 - l_discount) * (1 + l_tax) AS DECIMAL(18,6))) AS DOUBLE) AS sum_charge,
        CAST(SUM(CAST(l_quantity AS DECIMAL(18,4))) AS DOUBLE) / COUNT(*) AS avg_qty,
        CAST(SUM(CAST(l_extendedprice AS DECIMAL(18,4))) AS DOUBLE) / COUNT(*) AS avg_price,
        CAST(SUM(CAST(l_discount AS DECIMAL(18,4))) AS DOUBLE) / COUNT(*) AS avg_disc,
        COUNT(*) AS count_order
        FROM lineitem
        WHERE l_shipdate <= TIMESTAMP '1998-09-02 00:00:00'
        GROUP BY l_returnflag, l_linestatus
        ORDER BY l_returnflag, l_linestatus"""),
      bench = true),

    // ---- A1: group-by distinct pairs (ref: problem_name/problem_id seed) ---
    QueryDef(
      "a1_group_pairs",
      (s, d) => {
        import s.implicits._
        ord(s, d).groupBy($"o_orderpriority", $"o_orderstatus")
          .agg(count(lit(1)).as("n"))
          .orderBy($"o_orderpriority", $"o_orderstatus")
      },
      Some("""SELECT o_orderpriority, o_orderstatus, COUNT(*) AS n
        FROM orders GROUP BY o_orderpriority, o_orderstatus
        ORDER BY o_orderpriority, o_orderstatus""")),

    // ---- A2: global max/min (ref: select max(id)) --------------------------
    QueryDef(
      "a2_global_max",
      (s, d) => {
        import s.implicits._
        ord(s, d).agg(
          max($"o_orderkey").as("max_key"),
          min($"o_orderkey").as("min_key"),
          max($"o_totalprice").as("max_price"),
          min($"o_orderdate").as("min_date"),
          max($"o_orderdate").as("max_date"))
      },
      Some("""SELECT MAX(o_orderkey) AS max_key, MIN(o_orderkey) AS min_key,
        MAX(o_totalprice) AS max_price,
        CAST(MIN(o_orderdate) AS TIMESTAMP) AS min_date,
        CAST(MAX(o_orderdate) AS TIMESTAMP) AS max_date
        FROM orders""")),

    // ---- A3 + F14: filtered count with LIKE (ref: existence count) ---------
    QueryDef(
      "a3_filtered_count",
      (s, d) => {
        import s.implicits._
        ord(s, d)
          .filter($"o_orderstatus" === "F" && $"o_orderpriority".like("%URGENT%"))
          .agg(count(lit(1)).as("n"))
      },
      Some("""SELECT COUNT(*) AS n FROM orders
        WHERE o_orderstatus = 'F' AND o_orderpriority LIKE '%URGENT%'""")),

    // ---- A4: count distinct ------------------------------------------------
    QueryDef(
      "a4_count_distinct",
      (s, d) => {
        import s.implicits._
        li(s, d).groupBy($"l_returnflag")
          .agg(
            countDistinct($"l_suppkey").as("n_supp"),
            countDistinct($"l_partkey").as("n_part"),
            count(lit(1)).as("n_rows"))
          .orderBy($"l_returnflag")
      },
      Some("""SELECT l_returnflag, COUNT(DISTINCT l_suppkey) AS n_supp,
        COUNT(DISTINCT l_partkey) AS n_part, COUNT(*) AS n_rows
        FROM lineitem GROUP BY l_returnflag ORDER BY l_returnflag""")),

    // ---- A5: per-group max (ref: summary maxgen) ---------------------------
    QueryDef(
      "a5_per_group_max",
      (s, d) => {
        import s.implicits._
        li(s, d).groupBy($"l_orderkey")
          .agg(max($"l_linenumber").as("max_line"),
            dsum($"l_quantity").as("total_qty"))
          .orderBy($"l_orderkey")
      },
      Some("""SELECT l_orderkey, MAX(l_linenumber) AS max_line,
        CAST(SUM(CAST(l_quantity AS DECIMAL(18,4))) AS DOUBLE) AS total_qty
        FROM lineitem GROUP BY l_orderkey ORDER BY l_orderkey""")),

    // ---- A6+J1/J2/J7: revenue by nation — the star-join (bench) ------------
    // nation is hint-broadcast (25 rows at any SF); customer is
    // SF-proportional so it broadcasts by THRESHOLD (auto at test SFs,
    // graceful shuffle-join degradation at 100 TB); orders⋈lineitem is the
    // one genuine shuffle join (both sides large at scale). AQE picks SMJ/SHJ.
    // r7's +12% (0.877s) did not reproduce in r8 (0.654s median-of-5 —
    // machine noise). Join-order audit (BenchTune a6): partial-aggregating
    // revenue by l_orderkey BELOW the join (bit-identical — decimal sums are
    // exact) measures a wash at sf0.1 (1.07 vs 1.11s medians) because the
    // groupBy uses the same orderkey shuffle the join needs; it only pays
    // off when lineitem rows are wide, so the simple formulation stays.
    QueryDef(
      "a6_revenue_by_nation",
      (s, d) => {
        import s.implicits._
        val rev = li(s, d)
          .join(ord(s, d), $"l_orderkey" === $"o_orderkey")
          .join(Tables.customer(s, d), $"o_custkey" === $"c_custkey")
          .join(broadcast(Tables.nation(s, d)), $"c_nationkey" === $"n_nationkey")
        rev.groupBy($"n_name")
          .agg(dsum($"l_extendedprice" * (lit(1) - $"l_discount"), 6)
            .as("revenue"),
            count(lit(1)).as("n_items"))
          .orderBy($"n_name")
      },
      Some("""SELECT n_name,
        CAST(SUM(CAST(l_extendedprice * (1 - l_discount) AS DECIMAL(18,6))) AS DOUBLE) AS revenue,
        COUNT(*) AS n_items
        FROM lineitem
        JOIN orders ON l_orderkey = o_orderkey
        JOIN customer ON o_custkey = c_custkey
        JOIN nation ON c_nationkey = n_nationkey
        GROUP BY n_name ORDER BY n_name"""),
      bench = true),

    // ---- A7: rollup over region/nation -------------------------------------
    QueryDef(
      "a7_rollup",
      (s, d) => {
        import s.implicits._
        Tables.customer(s, d)
          .join(broadcast(Tables.nation(s, d)), $"c_nationkey" === $"n_nationkey")
          .join(broadcast(Tables.region(s, d)), $"n_regionkey" === $"r_regionkey")
          .rollup($"r_name", $"n_name")
          .agg(count(lit(1)).as("n_cust"), dsum($"c_acctbal").as("sum_bal"))
          .orderBy($"r_name", $"n_name")
      },
      Some("""SELECT r_name, n_name, COUNT(*) AS n_cust,
        CAST(SUM(CAST(c_acctbal AS DECIMAL(18,4))) AS DOUBLE) AS sum_bal
        FROM customer
        JOIN nation ON c_nationkey = n_nationkey
        JOIN region ON n_regionkey = r_regionkey
        GROUP BY ROLLUP (r_name, n_name)
        ORDER BY r_name NULLS FIRST, n_name NULLS FIRST""")),

    // ---- A7b: cube ---------------------------------------------------------
    QueryDef(
      "a7_cube",
      (s, d) => {
        import s.implicits._
        ord(s, d).cube($"o_orderstatus", $"o_orderpriority")
          .agg(count(lit(1)).as("n"))
          .orderBy($"o_orderstatus", $"o_orderpriority")
      },
      Some("""SELECT o_orderstatus, o_orderpriority, COUNT(*) AS n
        FROM orders GROUP BY CUBE (o_orderstatus, o_orderpriority)
        ORDER BY o_orderstatus NULLS FIRST, o_orderpriority NULLS FIRST""")),

    // ---- A8: approx distinct (HLL++), bounded-pass oracle ------------------
    // The estimate itself can't hash-match an exact oracle, so the query
    // emits the deterministic claim instead: exact countDistinct companions
    // plus a within_bounds flag (|approx-exact|/exact <= 5*rsd; HLL++ is
    // deterministic for fixed data, so the flag is stable). The oracle
    // recomputes the exact columns and asserts TRUE — a hash match IS the
    // bounded-accuracy check. ApproxRecallSpec additionally pins the raw
    // estimate's error bound in-process.
    QueryDef(
      "a8_approx_distinct",
      (s, d) => {
        import s.implicits._
        val rsd = 0.01
        Tables.events(s, d).groupBy($"event_type")
          .agg(approx_count_distinct($"user_id", rsd).as("approx_users"),
            countDistinct($"user_id").as("exact_users"),
            count(lit(1)).as("n"))
          .select($"event_type", $"exact_users", $"n",
            // all-NULL user_id groups have exact = 0: x/0 would emit NULL
            // and mismatch the oracle's TRUE — an empty set's HLL estimate
            // is exactly 0, so assert that instead
            when($"exact_users" === 0, $"approx_users" === 0)
              .otherwise(abs($"approx_users" - $"exact_users").cast("double")
                / $"exact_users" <= 5 * rsd).as("within_bounds"))
          .orderBy($"event_type")
      },
      Some("""SELECT event_type, COUNT(DISTINCT user_id) AS exact_users,
          COUNT(*) AS n, TRUE AS within_bounds
        FROM events GROUP BY event_type ORDER BY event_type""")),

    // ---- J1/J2: broadcast dimension lookup chain ---------------------------
    QueryDef(
      "j1_broadcast_lookup",
      (s, d) => {
        import s.implicits._
        Tables.customer(s, d)
          .join(broadcast(Tables.nation(s, d)), $"c_nationkey" === $"n_nationkey")
          .join(broadcast(Tables.region(s, d)), $"n_regionkey" === $"r_regionkey")
          .groupBy($"r_name")
          .agg(count(lit(1)).as("n_cust"), davg($"c_acctbal").as("avg_bal"))
          .orderBy($"r_name")
      },
      Some("""SELECT r_name, COUNT(*) AS n_cust,
        CAST(SUM(CAST(c_acctbal AS DECIMAL(18,4))) AS DOUBLE) / COUNT(*) AS avg_bal
        FROM customer
        JOIN nation ON c_nationkey = n_nationkey
        JOIN region ON n_regionkey = r_regionkey
        GROUP BY r_name ORDER BY r_name""")),

    // ---- J3: theta (non-equi range) join — BroadcastNestedLoop -------------
    QueryDef(
      "j3_theta_range",
      (s, d) => {
        import s.implicits._
        ord(s, d)
          .join(broadcast(Tables.region(s, d)),
            $"o_totalprice" > $"r_regionkey" * 50000)
          .groupBy($"r_name")
          .agg(count(lit(1)).as("n"))
          .orderBy($"r_name")
      },
      Some("""SELECT r_name, COUNT(*) AS n
        FROM orders JOIN region ON o_totalprice > r_regionkey * 50000
        GROUP BY r_name ORDER BY r_name""")),

    // ---- J3b: LIKE join (ref: probname LIKE '%leaf%') ----------------------
    QueryDef(
      "j3_like_join",
      (s, d) => {
        import s.implicits._
        val words = Seq("ECO", "PROMO", "LARGE", "STANDARD").toDF("word")
        Tables.part(s, d)
          .join(broadcast(words), $"p_type".like("%") && $"p_type".contains($"word"))
          .groupBy($"word")
          .agg(count(lit(1)).as("n_parts"))
          .orderBy($"word")
      },
      Some("""SELECT word, COUNT(*) AS n_parts
        FROM part JOIN (VALUES ('ECO'),('PROMO'),('LARGE'),('STANDARD')) AS t(word)
          ON p_type LIKE '%' || word || '%'
        GROUP BY word ORDER BY word""")),

    // ---- J4: anti-join (ref: skip already-loaded files) --------------------
    QueryDef(
      "j4_anti_join",
      (s, d) => {
        import s.implicits._
        Tables.customer(s, d)
          .join(ord(s, d), $"c_custkey" === $"o_custkey", "left_anti")
          .select($"c_custkey", $"c_mktsegment")
          .orderBy($"c_custkey")
      },
      Some("""SELECT c_custkey, c_mktsegment FROM customer c
        WHERE NOT EXISTS (SELECT 1 FROM orders o WHERE o.o_custkey = c.c_custkey)
        ORDER BY c_custkey""")),

    // ---- J5: semi-join (ref: get-or-create "exists" arm) -------------------
    QueryDef(
      "j5_semi_join",
      (s, d) => {
        import s.implicits._
        Tables.customer(s, d)
          .join(ord(s, d), $"c_custkey" === $"o_custkey", "left_semi")
          .groupBy($"c_mktsegment")
          .agg(count(lit(1)).as("n_active"))
          .orderBy($"c_mktsegment")
      },
      Some("""SELECT c_mktsegment, COUNT(*) AS n_active FROM customer c
        WHERE EXISTS (SELECT 1 FROM orders o WHERE o.o_custkey = c.c_custkey)
        GROUP BY c_mktsegment ORDER BY c_mktsegment""")),

    // ---- J7: large-large equi join (SMJ/SHJ at scale; bench) ---------------
    QueryDef(
      "j7_large_equi",
      (s, d) => {
        import s.implicits._
        li(s, d).join(ord(s, d), $"l_orderkey" === $"o_orderkey")
          .groupBy($"o_orderpriority")
          .agg(dsum($"l_extendedprice" * (lit(1) - $"l_discount"), 6)
            .as("revenue"),
            count(lit(1)).as("n"))
          .orderBy($"o_orderpriority")
      },
      Some("""SELECT o_orderpriority,
        CAST(SUM(CAST(l_extendedprice * (1 - l_discount) AS DECIMAL(18,6))) AS DOUBLE) AS revenue,
        COUNT(*) AS n
        FROM lineitem JOIN orders ON l_orderkey = o_orderkey
        GROUP BY o_orderpriority ORDER BY o_orderpriority"""),
      bench = true),

    // ---- J7b: left outer join ----------------------------------------------
    QueryDef(
      "j7_left_outer",
      (s, d) => {
        import s.implicits._
        Tables.customer(s, d)
          .join(ord(s, d), $"c_custkey" === $"o_custkey", "left_outer")
          .groupBy($"c_custkey")
          .agg(count($"o_orderkey").as("n_orders"))
          .orderBy($"c_custkey")
      },
      Some("""SELECT c_custkey, COUNT(o_orderkey) AS n_orders
        FROM customer LEFT JOIN orders ON c_custkey = o_custkey
        GROUP BY c_custkey ORDER BY c_custkey""")),

    // ---- J7c: full outer join ----------------------------------------------
    QueryDef(
      "j7_full_outer",
      (s, d) => {
        import s.implicits._
        val sn = Tables.supplier(s, d).select($"s_nationkey".as("nk")).distinct()
          .withColumn("has_supp", lit(1))
        val cn = Tables.customer(s, d).select($"c_nationkey".as("nk")).distinct()
          .withColumn("has_cust", lit(1))
        sn.join(cn, Seq("nk"), "full_outer")
          .select($"nk", coalesce($"has_supp", lit(0)).as("has_supp"),
            coalesce($"has_cust", lit(0)).as("has_cust"))
          .orderBy($"nk")
      },
      Some("""SELECT COALESCE(s.nk, c.nk) AS nk,
        COALESCE(has_supp, 0) AS has_supp, COALESCE(has_cust, 0) AS has_cust
        FROM (SELECT DISTINCT s_nationkey AS nk, 1 AS has_supp FROM supplier) s
        FULL OUTER JOIN (SELECT DISTINCT c_nationkey AS nk, 1 AS has_cust FROM customer) c
          USING (nk)
        ORDER BY nk""")),

    // ---- J7d: cross join ---------------------------------------------------
    QueryDef(
      "j7_cross",
      (s, d) => {
        import s.implicits._
        Tables.region(s, d).crossJoin(Tables.nation(s, d))
          .select($"r_name", $"n_name")
          .orderBy($"r_name", $"n_name")
      },
      Some("""SELECT r_name, n_name FROM region CROSS JOIN nation
        ORDER BY r_name, n_name""")),

    // ---- J8: fuzzy self-join — trigram blocking + edit-distance verify ----
    // Record linkage without all-pairs: candidate pairs must SHARE A RARE
    // TRIGRAM of the 24-char key prefix (the blocking equi-join), then
    // verify with levenshtein ≤ 2. The stop-trigram filter (document
    // frequency ≤ 20) is the scale lever: candidate volume is Σ_tri df²
    // over rare trigrams only — here 6,288 candidates vs 124,750 all-pairs
    // at |docs| = 500 — and a trigram shared by half the corpus generates
    // ZERO candidates instead of a quadratic block. Recall bound (q-gram
    // lemma): one edit touches ≤ 3 of a 24-char string's 22 trigrams, so
    // an ed ≤ 2 pair shares ≥ 22 − 3·2 = 16 trigram slots; it is missed only
    // if ALL its shared trigrams are stop-trigrams (frequent), which the
    // near-uniform synthetic corpus never hits (oracle-pinned: both
    // engines run the identical blocking, so the gate compares like with
    // like). At scale the prefixes would not ride the candidate shuffle —
    // block on (tri → ids), then re-join strings by id; at 24 chars
    // carrying them is cheaper than the extra join.
    QueryDef(
      "j8_fuzzy_join",
      (s, d) => {
        import s.implicits._
        val p = Tables.documents(s, d)
          .select($"doc_id", substring($"text", 1, 24).as("pfx"))
        val g = p
          .select($"doc_id", $"pfx",
            explode(expr(
              "transform(sequence(1, 22), i -> substring(pfx, i, 3))"))
              .as("tri"))
          .filter(length($"tri") === 3)
          .distinct()
        val rare = g.groupBy($"tri")
          .agg(count(lit(1)).as("df"))
          .filter($"df" <= 20)
          .select($"tri")
        val gr = g.join(rare, Seq("tri"))
        val cand = gr.as("a")
          .join(gr.as("b"),
            $"a.tri" === $"b.tri" && $"a.doc_id" < $"b.doc_id")
          .select($"a.doc_id".as("id_a"), $"b.doc_id".as("id_b"),
            $"a.pfx".as("pa"), $"b.pfx".as("pb"))
          .distinct()
        cand
          .withColumn("ed", levenshtein($"pa", $"pb"))
          .filter($"ed" <= 2)
          .select($"id_a", $"id_b", $"ed")
          .orderBy($"id_a", $"id_b")
      },
      Some("""WITH p AS (SELECT doc_id, substr(text, 1, 24) AS pfx
          FROM documents),
        g AS (SELECT DISTINCT doc_id, pfx,
            substr(pfx, CAST(i AS INTEGER), 3) AS tri
          FROM p CROSS JOIN generate_series(1, 22) AS t(i)
          WHERE len(substr(pfx, CAST(i AS INTEGER), 3)) = 3),
        rare AS (SELECT tri FROM g GROUP BY tri HAVING COUNT(*) <= 20),
        cand AS (SELECT DISTINCT a.doc_id AS id_a, b.doc_id AS id_b,
            a.pfx AS pa, b.pfx AS pb
          FROM g a JOIN g b ON a.tri = b.tri AND a.doc_id < b.doc_id
          WHERE a.tri IN (SELECT tri FROM rare))
        SELECT id_a, id_b, levenshtein(pa, pb) AS ed FROM cand
        WHERE levenshtein(pa, pb) <= 2 ORDER BY id_a, id_b""")),

    // ---- J9: salted skew join — the hot-key shuffle fix, oracle-audited ----
    // A deliberately skewed derived key (l_quantity <= 25 maps ~half of
    // lineitem onto key 0; the rest spreads over 50 keys) joins a 51-row
    // weight dim. Plain hash-partitioning would put ~50% of the big side on
    // ONE reducer — the classic 100 TB straggler. SkewJoin.saltedJoinExpr
    // splits every key into 4 sub-keys: the big side gets a row-level salt,
    // the dim replicates x4, and the join (forced to SHUFFLED-HASH so the
    // (key, salt) exchange is REAL — not a broadcast that would hide the
    // demonstration, and not a sort-merge whose big-side sort dominates:
    // probed at the 100x corpus, SHJ 23.1 s vs SMJ 39.0 s, identical at
    // sf0.1) runs on the composite key. The salt is the md5 hex
    // nibble of (orderkey:linenumber) mod 4 — the oracle-recomputable hash
    // family (Md5Hash64 scaladoc) — so DuckDB re-derives the per-salt
    // partition audit EXACTLY, not just the join's final answer: n_hot per
    // salt shows the hot key's rows landing ~evenly on 4 sub-partitions,
    // and the decimal revenue totals prove the rewrite lossless. At 100 TB
    // the same pattern holds with buckets sized to the skew profile
    // (x_skew_profile + x_join_size_cms are the pre-flight inputs). Salt
    // inputs (orderkey, linenumber) are NOT NULL by the lineitem contract;
    // a null would salt to null and drop the row from the inner join on
    // the Spark side while DuckDB's group-by would keep a null-salt group
    // — use coalesce'd salt columns on corpora where keys can be null.
    QueryDef(
      "j9_salted_skew",
      (s, d) => {
        import s.implicits._
        import graft.operators.SkewJoin
        val big = li(s, d).withColumn("skew_key",
          when($"l_quantity" <= 25.0, lit(0L))
            .otherwise(pmod($"l_orderkey", lit(50L)) + lit(1L)))
        val dim = s.range(0, 51).select($"id".as("skew_key"),
          ($"id" % 7 + 1).cast("double").as("w"))
        val saltExpr = pmod(
          conv(substring(md5(concat($"l_orderkey".cast("string"), lit(":"),
            $"l_linenumber".cast("string"))), 1, 1), 16, 10).cast("int"),
          lit(4))
        SkewJoin.saltedJoinExpr(big, dim.hint("shuffle_hash"), "skew_key", 4,
            saltExpr, saltOut = "salt")
          .groupBy($"salt")
          .agg(count(lit(1)).as("n"),
            sum(when($"skew_key" === 0L, 1L).otherwise(0L)).as("n_hot"),
            sum($"l_extendedprice".cast("decimal(18,4)")
              * $"w".cast("decimal(18,4)")).cast("double").as("revenue"))
          .orderBy($"salt")
      },
      Some("""WITH big AS (SELECT l_orderkey, l_linenumber, l_extendedprice,
            CASE WHEN l_quantity <= 25 THEN 0
                 ELSE (l_orderkey % 50) + 1 END AS skew_key
          FROM lineitem),
        dim AS (SELECT r AS skew_key, CAST(r % 7 + 1 AS DOUBLE) AS w
          FROM range(0, 51) t(r))
        SELECT (strpos('0123456789abcdef',
            substr(md5(l_orderkey || ':' || l_linenumber), 1, 1)) - 1) % 4
            AS salt,
          COUNT(*) AS n,
          CAST(SUM(CASE WHEN skew_key = 0 THEN 1 ELSE 0 END) AS BIGINT)
            AS n_hot,
          CAST(SUM(CAST(l_extendedprice AS DECIMAL(18,4))
            * CAST(w AS DECIMAL(18,4))) AS DOUBLE) AS revenue
        FROM big JOIN dim USING (skew_key)
        GROUP BY 1 ORDER BY 1""")),

    // ---- A6b: collect_set aggregation (sorted for determinism) -------------
    QueryDef(
      "a6_collect",
      (s, d) => {
        import s.implicits._
        li(s, d).groupBy($"l_returnflag")
          .agg(array_join(array_sort(collect_set($"l_linestatus")), ",")
            .as("statuses"),
            countDistinct($"l_linestatus").as("n_statuses"))
          .orderBy($"l_returnflag")
      },
      Some("""SELECT l_returnflag,
        array_to_string(list_sort(list_distinct(list(l_linestatus))), ',') AS statuses,
        COUNT(DISTINCT l_linestatus) AS n_statuses
        FROM lineitem GROUP BY l_returnflag ORDER BY l_returnflag""")),

    // ---- A9: exact interpolated percentiles (rounded) ----------------------
    QueryDef(
      "a9_percentiles",
      (s, d) => {
        import s.implicits._
        ord(s, d).groupBy($"o_orderstatus")
          .agg(
            round(expr("percentile(o_totalprice, 0.5)"), 4).as("p50"),
            round(expr("percentile(o_totalprice, 0.9)"), 4).as("p90"),
            round(min($"o_totalprice"), 4).as("p0"),
            round(max($"o_totalprice"), 4).as("p100"))
          .orderBy($"o_orderstatus")
      },
      Some("""SELECT o_orderstatus,
        round(quantile_cont(o_totalprice, 0.5), 4) AS p50,
        round(quantile_cont(o_totalprice, 0.9), 4) AS p90,
        round(MIN(o_totalprice), 4) AS p0,
        round(MAX(o_totalprice), 4) AS p100
        FROM orders GROUP BY o_orderstatus ORDER BY o_orderstatus""")),

    // ---- A9b: approx percentile sketch with a bounded-accuracy oracle ------
    // Same pattern as a8_approx_distinct: the sketch value itself is
    // engine-internal (Spark's KLL-style approx_percentile has no DuckDB
    // twin), but its accuracy CONTRACT is oracle-checkable — with
    // accuracy parameter 10000 the rank error is <= n/10000, so the
    // approximate p50/p90 must land within the exact value at ranks
    // +/- 1% around the target (loose, deterministic bound via exact
    // percentile at q +/- 0.01, which DuckDB recomputes). A hash match on
    // the flags proves the sketch held its bound on this corpus.
    QueryDef(
      "a9_approx_percentile",
      (s, d) => {
        import s.implicits._
        ord(s, d).groupBy($"o_orderstatus")
          .agg(
            expr("approx_percentile(o_totalprice, 0.5, 10000)").as("ap50"),
            expr("approx_percentile(o_totalprice, 0.9, 10000)").as("ap90"),
            expr("percentile(o_totalprice, 0.49)").as("lo50"),
            expr("percentile(o_totalprice, 0.51)").as("hi50"),
            expr("percentile(o_totalprice, 0.89)").as("lo90"),
            expr("percentile(o_totalprice, 0.91)").as("hi90"),
            count(lit(1)).as("n"))
          .select($"o_orderstatus", $"n",
            ($"ap50" >= $"lo50" && $"ap50" <= $"hi50").as("p50_within"),
            ($"ap90" >= $"lo90" && $"ap90" <= $"hi90").as("p90_within"))
          .orderBy($"o_orderstatus")
      },
      Some("""SELECT o_orderstatus, COUNT(*) AS n,
          TRUE AS p50_within, TRUE AS p90_within
        FROM orders GROUP BY o_orderstatus ORDER BY o_orderstatus""")),

    // ---- A9c: statistical moments (stddev/var/corr/covar) ------------------
    // Two layers, same philosophy as a8/a9b: (1) HASH-EXACT moment values
    // computed from integer-exact power sums (l_quantity and l_linenumber
    // are integer-valued, so sum/sum-of-squares/cross-sum are exact in
    // BIGINT on both engines; the var/std/corr arithmetic is then one
    // identical double expression tree over identical exact inputs —
    // bit-stable, rounded to 6dp); (2) the BUILT-IN Welford-style
    // aggregates (stddev_samp/var_samp/corr/covar_samp) are accumulation-
    // order-dependent so they get bounded-agreement flags (<= 1e-9
    // relative) the oracle asserts TRUE.
    QueryDef(
      "a9_stats_moments",
      (s, d) => {
        import s.implicits._
        val q = $"l_quantity".cast("long")
        val ln = $"l_linenumber".cast("long")
        def close(b: Column, f: Column): Column =
          abs(b - f) <= abs(f) * 1e-9 + 1e-12
        li(s, d).groupBy($"l_returnflag")
          .agg(count(lit(1)).as("n"),
            sum(q).as("sq"), sum(q * q).as("sqq"),
            sum(ln).as("sl"), sum(ln * ln).as("sll"),
            sum(q * ln).as("sql"),
            stddev_samp(q).as("b_std"), var_samp(q).as("b_var"),
            corr(q, ln).as("b_corr"), covar_samp(q, ln).as("b_covar"))
          .withColumn("nd", $"n".cast("double"))
          .withColumn("f_var", ($"sqq" - $"sq" * $"sq" / $"nd") / ($"n" - 1))
          .withColumn("f_std", sqrt($"f_var"))
          .withColumn("f_covar", ($"sql" - $"sq" * $"sl" / $"nd") / ($"n" - 1))
          .withColumn("f_corr", ($"sql" - $"sq" * $"sl" / $"nd")
            / sqrt(($"sqq" - $"sq" * $"sq" / $"nd")
              * ($"sll" - $"sl" * $"sl" / $"nd")))
          .select($"l_returnflag", $"n",
            round($"f_var", 6).as("var6"), round($"f_std", 6).as("std6"),
            round($"f_covar", 6).as("covar6"), round($"f_corr", 6).as("corr6"),
            close($"b_var", $"f_var").as("var_ok"),
            close($"b_std", $"f_std").as("std_ok"),
            close($"b_covar", $"f_covar").as("covar_ok"),
            close($"b_corr", $"f_corr").as("corr_ok"))
          .orderBy($"l_returnflag")
      },
      Some("""SELECT l_returnflag, COUNT(*) AS n,
          round((SUM(q*q) - SUM(q)*SUM(q) / CAST(COUNT(*) AS DOUBLE))
            / (COUNT(*) - 1), 6) AS var6,
          round(sqrt((SUM(q*q) - SUM(q)*SUM(q) / CAST(COUNT(*) AS DOUBLE))
            / (COUNT(*) - 1)), 6) AS std6,
          round((SUM(q*l) - SUM(q)*SUM(l) / CAST(COUNT(*) AS DOUBLE))
            / (COUNT(*) - 1), 6) AS covar6,
          round((SUM(q*l) - SUM(q)*SUM(l) / CAST(COUNT(*) AS DOUBLE))
            / sqrt((SUM(q*q) - SUM(q)*SUM(q) / CAST(COUNT(*) AS DOUBLE))
              * (SUM(l*l) - SUM(l)*SUM(l) / CAST(COUNT(*) AS DOUBLE))), 6)
            AS corr6,
          TRUE AS var_ok, TRUE AS std_ok, TRUE AS covar_ok, TRUE AS corr_ok
        FROM (SELECT l_returnflag, CAST(l_quantity AS BIGINT) AS q,
                CAST(l_linenumber AS BIGINT) AS l FROM lineitem)
        GROUP BY l_returnflag ORDER BY l_returnflag""")),

    // ---- F15b: math function suite -----------------------------------------
    QueryDef(
      "f_math_suite",
      (s, d) => {
        import s.implicits._
        ord(s, d).filter($"o_orderkey" <= 500)
          .select($"o_orderkey",
            sqrt($"o_totalprice").as("sqrt_price"),
            ($"o_orderkey" % 7).as("mod7"),
            signum($"o_totalprice" - 150000.0).as("sign_vs"),
            round($"o_totalprice", 1).as("round1"),
            ($"o_totalprice" * $"o_totalprice").as("sq"),
            greatest($"o_totalprice", lit(100000.0)).as("hi"),
            least($"o_totalprice", lit(100000.0)).as("lo"))
          .orderBy($"o_orderkey")
      },
      Some("""SELECT o_orderkey,
        sqrt(o_totalprice) AS sqrt_price,
        o_orderkey % 7 AS mod7,
        CAST(sign(o_totalprice - 150000.0) AS DOUBLE) AS sign_vs,
        round(o_totalprice, 1) AS round1,
        o_totalprice * o_totalprice AS sq,
        greatest(o_totalprice, 100000.0) AS hi,
        least(o_totalprice, 100000.0) AS lo
        FROM orders WHERE o_orderkey <= 500 ORDER BY o_orderkey""")),

    // ---- F15c: date function suite -----------------------------------------
    QueryDef(
      "f_date_suite",
      (s, d) => {
        import s.implicits._
        ord(s, d).filter($"o_orderkey" <= 500)
          .select($"o_orderkey",
            dayofmonth($"o_orderdate").as("dom"),
            quarter($"o_orderdate").as("qtr"),
            date_format(date_trunc("month", $"o_orderdate"), "yyyy-MM-dd")
              .as("month_start"),
            datediff($"o_orderdate".cast("date"), lit("1995-01-01").cast("date"))
              .as("days_since"),
            date_format(last_day($"o_orderdate"), "yyyy-MM-dd").as("month_end"))
          .orderBy($"o_orderkey")
      },
      Some("""SELECT o_orderkey,
        CAST(day(o_orderdate) AS INTEGER) AS dom,
        CAST(quarter(o_orderdate) AS INTEGER) AS qtr,
        strftime(date_trunc('month', o_orderdate), '%Y-%m-%d') AS month_start,
        CAST(date_diff('day', DATE '1995-01-01', CAST(o_orderdate AS DATE)) AS INTEGER) AS days_since,
        strftime(last_day(CAST(o_orderdate AS DATE)), '%Y-%m-%d') AS month_end
        FROM orders WHERE o_orderkey <= 500 ORDER BY o_orderkey""")),

    // ---- §2.10: set ops ----------------------------------------------------
    QueryDef(
      "setop_union",
      (s, d) => {
        import s.implicits._
        Tables.supplier(s, d).select($"s_nationkey".as("nk"))
          .union(Tables.customer(s, d).select($"c_nationkey".as("nk")))
          .distinct().orderBy($"nk")
      },
      Some("""SELECT s_nationkey AS nk FROM supplier
        UNION SELECT c_nationkey AS nk FROM customer ORDER BY nk""")),

    QueryDef(
      "setop_intersect",
      (s, d) => {
        import s.implicits._
        Tables.supplier(s, d).select($"s_nationkey".as("nk"))
          .intersect(Tables.customer(s, d).select($"c_nationkey".as("nk")))
          .orderBy($"nk")
      },
      Some("""SELECT s_nationkey AS nk FROM supplier
        INTERSECT SELECT c_nationkey AS nk FROM customer ORDER BY nk""")),

    QueryDef(
      "setop_except",
      (s, d) => {
        import s.implicits._
        Tables.customer(s, d).select($"c_nationkey".as("nk"))
          .except(Tables.supplier(s, d).select($"s_nationkey".as("nk")))
          .orderBy($"nk")
      },
      Some("""SELECT c_nationkey AS nk FROM customer
        EXCEPT SELECT s_nationkey AS nk FROM supplier ORDER BY nk""")),

    // ---- §2.10: EXCEPT ALL (multiset semantics) ----------------------------
    QueryDef(
      "setop_except_all",
      (s, d) => {
        import s.implicits._
        Tables.customer(s, d).select($"c_nationkey".as("nk"))
          .exceptAll(Tables.supplier(s, d).select($"s_nationkey".as("nk")))
          .groupBy($"nk").agg(count(lit(1)).as("n"))
          .orderBy($"nk")
      },
      Some("""SELECT nk, COUNT(*) AS n FROM (
          SELECT c_nationkey AS nk FROM customer
          EXCEPT ALL SELECT s_nationkey AS nk FROM supplier)
        GROUP BY nk ORDER BY nk""")),

    // ---- §2.10: INTERSECT ALL (multiset semantics) -------------------------
    QueryDef(
      "setop_intersect_all",
      (s, d) => {
        import s.implicits._
        Tables.customer(s, d).select($"c_nationkey".as("nk"))
          .intersectAll(Tables.supplier(s, d).select($"s_nationkey".as("nk")))
          .groupBy($"nk").agg(count(lit(1)).as("n"))
          .orderBy($"nk")
      },
      Some("""SELECT nk, COUNT(*) AS n FROM (
          SELECT c_nationkey AS nk FROM customer
          INTERSECT ALL SELECT s_nationkey AS nk FROM supplier)
        GROUP BY nk ORDER BY nk""")),

    // ---- A-family: min_by / max_by (arg-extrema) ---------------------------
    // keyed on the unique o_orderkey so the winner is deterministic (ties on
    // o_totalprice exist in the corpus and would be engine-dependent)
    QueryDef(
      "a10_min_max_by",
      (s, d) => {
        import s.implicits._
        ord(s, d).groupBy($"o_orderpriority")
          .agg(
            min_by($"o_totalprice", $"o_orderkey").as("first_price"),
            max_by($"o_totalprice", $"o_orderkey").as("last_price"),
            min($"o_orderkey").as("min_key"),
            max($"o_orderkey").as("max_key"))
          .orderBy($"o_orderpriority")
      },
      Some("""SELECT o_orderpriority,
          min_by(o_totalprice, o_orderkey) AS first_price,
          max_by(o_totalprice, o_orderkey) AS last_price,
          MIN(o_orderkey) AS min_key, MAX(o_orderkey) AS max_key
        FROM orders GROUP BY o_orderpriority ORDER BY o_orderpriority""")),

    // ---- F-suite: padding / translate / repeat / split_part ----------------
    QueryDef(
      "f_string_suite2",
      (s, d) => {
        import s.implicits._
        ord(s, d).filter($"o_orderkey" <= 500)
          .select($"o_orderkey",
            lpad($"o_orderstatus", 5, "_").as("padded_l"),
            rpad($"o_orderstatus", 5, ".").as("padded_r"),
            reverse($"o_orderpriority").as("rev"),
            repeat($"o_orderstatus", 3).as("rep"),
            translate($"o_orderpriority", "-", "_").as("trans"),
            split_part($"o_orderpriority", lit("-"), lit(1)).as("part1"))
          .orderBy($"o_orderkey")
      },
      Some("""SELECT o_orderkey,
          lpad(o_orderstatus, 5, '_') AS padded_l,
          rpad(o_orderstatus, 5, '.') AS padded_r,
          reverse(o_orderpriority) AS rev,
          repeat(o_orderstatus, 3) AS rep,
          translate(o_orderpriority, '-', '_') AS trans,
          split_part(o_orderpriority, '-', 1) AS part1
        FROM orders WHERE o_orderkey <= 500 ORDER BY o_orderkey""")),

    // ---- §2.10: top-k (TakeOrderedAndProject) ------------------------------
    QueryDef(
      "topk_orders",
      (s, d) => {
        import s.implicits._
        ord(s, d)
          .select($"o_orderkey", $"o_custkey", $"o_totalprice")
          .orderBy($"o_totalprice".desc, $"o_orderkey")
          .limit(10)
      },
      Some("""SELECT o_orderkey, o_custkey, o_totalprice FROM orders
        ORDER BY o_totalprice DESC, o_orderkey LIMIT 10""")),

    QueryDef(
      "sort_multi_limit",
      (s, d) => {
        import s.implicits._
        li(s, d)
          .select($"l_orderkey", $"l_linenumber", $"l_shipdate", $"l_quantity")
          .orderBy($"l_shipdate", $"l_orderkey", $"l_linenumber")
          .limit(100)
      },
      Some("""SELECT l_orderkey, l_linenumber,
        CAST(l_shipdate AS TIMESTAMP) AS l_shipdate, l_quantity
        FROM lineitem ORDER BY l_shipdate, l_orderkey, l_linenumber LIMIT 100""")),

    // ---- R6: pivot (EAV long→wide analog) ----------------------------------
    QueryDef(
      "r6_pivot",
      (s, d) => {
        import s.implicits._
        li(s, d).groupBy($"l_linestatus")
          .pivot("l_returnflag", Seq("A", "N", "R"))
          .agg(sum($"l_quantity".cast("decimal(18,4)")))
          .select($"l_linestatus",
            $"A".cast("double").as("qty_a"),
            $"N".cast("double").as("qty_n"),
            $"R".cast("double").as("qty_r"))
          .orderBy($"l_linestatus")
      },
      Some("""SELECT l_linestatus,
        CAST(SUM(CAST(l_quantity AS DECIMAL(18,4))) FILTER (WHERE l_returnflag='A') AS DOUBLE) AS qty_a,
        CAST(SUM(CAST(l_quantity AS DECIMAL(18,4))) FILTER (WHERE l_returnflag='N') AS DOUBLE) AS qty_n,
        CAST(SUM(CAST(l_quantity AS DECIMAL(18,4))) FILTER (WHERE l_returnflag='R') AS DOUBLE) AS qty_r
        FROM lineitem GROUP BY l_linestatus ORDER BY l_linestatus""")),

    // ---- F15: array + higher-order function suite --------------------------
    QueryDef(
      "f_array_hof",
      (s, d) => {
        import s.implicits._
        val toks = split($"text", " ")
        Tables.documents(s, d).filter($"doc_id" < 100)
          .select(
            $"doc_id",
            size(toks).as("n_tokens"),
            array_contains(toks, "the").as("has_the"),
            array_join(slice(toks, 1, 3), "|").as("first3"),
            element_at(toks, -1).as("last_tok"),
            size(array_distinct(toks)).as("n_unique"),
            expr("aggregate(transform(split(text, ' '), t -> length(t)), 0, (a, x) -> a + x)")
              .as("sum_len"))
          .orderBy($"doc_id")
      },
      Some("""SELECT doc_id,
        CAST(len(string_split(text, ' ')) AS INTEGER) AS n_tokens,
        list_contains(string_split(text, ' '), 'the') AS has_the,
        array_to_string(string_split(text, ' ')[1:3], '|') AS first3,
        string_split(text, ' ')[-1] AS last_tok,
        CAST(len(list_distinct(string_split(text, ' '))) AS INTEGER) AS n_unique,
        CAST(list_sum(list_transform(string_split(text, ' '), t -> length(t))) AS INTEGER) AS sum_len
        FROM documents WHERE doc_id < 100 ORDER BY doc_id""")),

    // ---- F1..F15: scalar function suite ------------------------------------
    QueryDef(
      "f_scalar_suite",
      (s, d) => {
        import s.implicits._
        ord(s, d).filter($"o_orderkey" <= 500)
          .select(
            $"o_orderkey",
            year($"o_orderdate").as("yr"),
            month($"o_orderdate").as("mo"),
            date_format($"o_orderdate", "yyyy-MM-dd").as("d_str"),
            date_format(date_add($"o_orderdate".cast("date"), 30), "yyyy-MM-dd")
              .as("d_plus30"),
            upper($"o_orderstatus").as("status_up"),
            substring($"o_orderpriority", 1, 1).as("prio_digit"),
            regexp_extract($"o_orderpriority", "^(\\d+)", 1).as("prio_re"),
            element_at(split($"o_orderpriority", "-"), 2).as("prio_word"),
            concat_ws("|", $"o_orderstatus", $"o_orderpriority").as("joined"),
            length($"o_orderpriority").as("prio_len"),
            trim(lit("  x  ")).as("trimmed"),
            abs($"o_totalprice" * lit(-1)).as("abs_price"),
            floor($"o_totalprice").cast("double").as("floor_price"),
            ceil($"o_totalprice").cast("double").as("ceil_price"))
          .orderBy($"o_orderkey")
      },
      Some("""SELECT o_orderkey,
        CAST(year(o_orderdate) AS INTEGER) AS yr,
        CAST(month(o_orderdate) AS INTEGER) AS mo,
        strftime(o_orderdate, '%Y-%m-%d') AS d_str,
        strftime(CAST(o_orderdate AS DATE) + 30, '%Y-%m-%d') AS d_plus30,
        upper(o_orderstatus) AS status_up,
        substring(o_orderpriority, 1, 1) AS prio_digit,
        regexp_extract(o_orderpriority, '^(\d+)', 1) AS prio_re,
        string_split(o_orderpriority, '-')[2] AS prio_word,
        concat_ws('|', o_orderstatus, o_orderpriority) AS joined,
        CAST(length(o_orderpriority) AS INTEGER) AS prio_len,
        trim('  x  ') AS trimmed,
        abs(o_totalprice * -1) AS abs_price,
        CAST(floor(o_totalprice) AS DOUBLE) AS floor_price,
        CAST(ceil(o_totalprice) AS DOUBLE) AS ceil_price
        FROM orders WHERE o_orderkey <= 500 ORDER BY o_orderkey""")),

    // ---- Unpivot (wide measures → long rows; the r6_pivot inverse) ---------
    // One row per (returnflag, measure): the 3 per-flag aggregates unpivot
    // through Spark's stack() generator — codegen-friendly, map-only over
    // the tiny aggregate — while the oracle uses the portable UNION ALL
    // form (ANSI; DuckDB's UNPIVOT would work too but the union is
    // engine-agnostic). Sums go through DECIMAL(38,2) per the module
    // contract (order-independent exact addition) and the final value
    // casts back to DOUBLE. Scale shape: the wide input is |flags| rows —
    // unpivot is always a map-side reshape, never a shuffle.
    QueryDef(
      "r7_unpivot",
      (s, d) => {
        import s.implicits._
        li(s, d).groupBy($"l_returnflag")
          .agg(
            sum($"l_quantity".cast("decimal(38,2)")).as("sum_qty"),
            sum($"l_extendedprice".cast("decimal(38,2)")).as("sum_price"),
            count(lit(1)).cast("decimal(38,2)").as("n_items"))
          .selectExpr("l_returnflag",
            """stack(3,
              |  'n_items',  n_items,
              |  'sum_price', sum_price,
              |  'sum_qty',  sum_qty) AS (measure, value)""".stripMargin)
          .select($"l_returnflag", $"measure",
            $"value".cast("double").as("value"))
          .orderBy($"l_returnflag", $"measure")
      },
      Some("""WITH agg AS (
          SELECT l_returnflag,
            SUM(CAST(l_quantity AS DECIMAL(38,2))) AS sum_qty,
            SUM(CAST(l_extendedprice AS DECIMAL(38,2))) AS sum_price,
            CAST(COUNT(*) AS DECIMAL(38,2)) AS n_items
          FROM lineitem GROUP BY l_returnflag)
        SELECT l_returnflag, measure, CAST(value AS DOUBLE) AS value FROM (
          SELECT l_returnflag, 'n_items' AS measure, n_items AS value FROM agg
          UNION ALL
          SELECT l_returnflag, 'sum_price', sum_price FROM agg
          UNION ALL
          SELECT l_returnflag, 'sum_qty', sum_qty FROM agg)
        ORDER BY l_returnflag, measure"""))
  )
}
