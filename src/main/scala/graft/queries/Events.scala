package graft.queries

import graft.{QueryDef, Tables}
import org.apache.spark.sql.SparkSession
import org.apache.spark.sql.functions._

/** Event-time window surface (SURVEY.md §2.12 T4) in batch form, oracle-checked,
  * plus JSON scalar access (F15) and exact dedup (I4).
  *
  * These are the *same* expressions a Structured Streaming query uses
  * (`window()`, `session_window()`); streaming wiring (watermark + readStream)
  * lives in graft.streaming and is exercised by tests — batch form is what the
  * DuckDB oracle can check.
  *
  * Note on timestamps: `events.ts` is parquet TIMESTAMP(NANOS); Spark reads it
  * truncated to microseconds. Oracle SQL applies `CAST(ts AS TIMESTAMP)` (also
  * a truncation to micros) so both engines agree bit-for-bit.
  */
object Events {

  val defs: Seq[QueryDef] = Seq(

    // ---- Z-order (Morton) clustering value ---------------------------------
    // The multi-dimensional at-rest clustering key (Layout.writeZOrdered):
    // interleaved bits of (user_id, event_id), driver-visible so the layout
    // family's ordering primitive is oracle-pinned — DuckDB reproduces the
    // identical mask-shift ladder on BIGINTs (31-bit keys keep z
    // non-negative, so plain signed ordering agrees across engines).
    QueryDef(
      "x_zorder_value",
      (s, d) => {
        import s.implicits._
        Tables.events(s, d)
          .select($"event_id", $"user_id",
            graft.sinks.Layout.zValue($"user_id", $"event_id").as("z"))
          .orderBy($"z", $"event_id")
          .limit(200)
      },
      Some("""WITH t0 AS (
          SELECT event_id, user_id,
            user_id & 2147483647 AS ax, event_id & 2147483647 AS bx
          FROM events),
        t1 AS (SELECT event_id, user_id,
          (ax | (ax << 16)) & 281470681808895 AS ax,
          (bx | (bx << 16)) & 281470681808895 AS bx FROM t0),
        t2 AS (SELECT event_id, user_id,
          (ax | (ax << 8)) & 71777214294589695 AS ax,
          (bx | (bx << 8)) & 71777214294589695 AS bx FROM t1),
        t3 AS (SELECT event_id, user_id,
          (ax | (ax << 4)) & 1085102592571150095 AS ax,
          (bx | (bx << 4)) & 1085102592571150095 AS bx FROM t2),
        t4 AS (SELECT event_id, user_id,
          (ax | (ax << 2)) & 3689348814741910323 AS ax,
          (bx | (bx << 2)) & 3689348814741910323 AS bx FROM t3),
        t5 AS (SELECT event_id, user_id,
          (ax | (ax << 1)) & 6148914691236517205 AS ax,
          (bx | (bx << 1)) & 6148914691236517205 AS bx FROM t4)
        SELECT event_id, user_id, ax | (bx << 1) AS z
        FROM t5 ORDER BY z, event_id LIMIT 200""")),

    // ---- T4: tumbling window (1 hour) --------------------------------------
    QueryDef(
      "t4_tumbling_hour",
      (s, d) => {
        import s.implicits._
        Tables.events(s, d)
          .groupBy(window($"ts", "1 hour"), $"event_type")
          .agg(count(lit(1)).as("n"),
            sum($"value".cast("decimal(18,4)")).cast("double").as("sum_value"))
          .select($"window.start".as("w_start"), $"event_type", $"n", $"sum_value")
          .orderBy($"w_start", $"event_type")
      },
      Some("""SELECT date_trunc('hour', CAST(ts AS TIMESTAMP)) AS w_start, event_type,
        COUNT(*) AS n,
        CAST(SUM(CAST(value AS DECIMAL(18,4))) AS DOUBLE) AS sum_value
        FROM events GROUP BY 1, 2 ORDER BY w_start, event_type"""),
      bench = true),

    // ---- T4d: windowed distinct users (exact + sketch within bound) --------
    // Per tumbling hour: exact distinct users (the partial-aggregated
    // two-phase count-distinct) plus the HLL estimate and an
    // a8_approx_distinct-style hash-stable within-5×rsd flag — the
    // windowed-cardinality audit every engagement dashboard runs. At
    // 100 TB the exact arm becomes the expensive one (distinct shuffle
    // per window); the sketch column is the scale path and the flag is
    // the gate that keeps it honest.
    QueryDef(
      "t4_window_distinct",
      (s, d) => {
        import s.implicits._
        Tables.events(s, d)
          .groupBy(window($"ts", "1 hour"))
          .agg(countDistinct($"user_id").as("n_users"),
            approx_count_distinct($"user_id", 0.05).as("n_users_approx"),
            count(lit(1)).as("n_events"))
          .select($"window.start".as("w_start"), $"n_events", $"n_users",
            // bound is 10×rsd (50%), not the 5×rsd the a8 gate uses: this
            // flag sits inside an EXACT-parity gate (oracle hardcodes TRUE)
            // with no exact==0 guard, so its failure probability must be
            // negligible per window, not merely small — 10σ on the HLL
            // estimator is ~never, while still catching a BROKEN sketch
            // (r13 ADVICE: a 5×rsd outlier would have reddened the whole
            // query even though nothing was wrong)
            (abs($"n_users_approx" - $"n_users").cast("double") <=
              $"n_users" * 0.5).as("approx_in_bound"))
          .orderBy($"w_start")
      },
      Some("""SELECT date_trunc('hour', CAST(ts AS TIMESTAMP)) AS w_start,
        COUNT(*) AS n_events,
        COUNT(DISTINCT user_id) AS n_users,
        TRUE AS approx_in_bound
        FROM events GROUP BY 1 ORDER BY w_start""")),

    // ---- T4: tumbling window (1 day) ---------------------------------------
    QueryDef(
      "t4_tumbling_day",
      (s, d) => {
        import s.implicits._
        Tables.events(s, d)
          .groupBy(window($"ts", "1 day"))
          .agg(count(lit(1)).as("n"),
            countDistinct($"user_id").as("n_users"))
          .select($"window.start".as("w_start"), $"n", $"n_users")
          .orderBy($"w_start")
      },
      Some("""SELECT date_trunc('day', CAST(ts AS TIMESTAMP)) AS w_start,
        COUNT(*) AS n, COUNT(DISTINCT user_id) AS n_users
        FROM events GROUP BY 1 ORDER BY w_start""")),

    // ---- T4: sliding window (2h window, 1h hop) ----------------------------
    // Each event lands in exactly two windows; oracle expands via unnest.
    QueryDef(
      "t4_sliding",
      (s, d) => {
        import s.implicits._
        Tables.events(s, d)
          .groupBy(window($"ts", "2 hours", "1 hour"))
          .agg(count(lit(1)).as("n"))
          .select($"window.start".as("w_start"), $"n")
          .orderBy($"w_start")
      },
      Some("""SELECT w_start, COUNT(*) AS n FROM (
        SELECT unnest([date_trunc('hour', CAST(ts AS TIMESTAMP)),
                       date_trunc('hour', CAST(ts AS TIMESTAMP)) - INTERVAL 1 HOUR]) AS w_start
        FROM events) GROUP BY w_start ORDER BY w_start""")),

    // ---- T4: session window (30 min gap) per user --------------------------
    // Spark merges events whose gap < 30 min; session end = last ts + gap.
    // Oracle is the classic gaps-and-islands rewrite.
    QueryDef(
      "t4_session",
      (s, d) => {
        import s.implicits._
        Tables.events(s, d)
          .groupBy(session_window($"ts", "30 minutes"), $"user_id")
          .agg(count(lit(1)).as("n_events"))
          .select($"user_id", $"session_window.start".as("w_start"),
            $"session_window.end".as("w_end"), $"n_events")
          .orderBy($"user_id", $"w_start")
      },
      Some("""WITH e AS (SELECT user_id, CAST(ts AS TIMESTAMP) AS ts FROM events),
        f AS (SELECT user_id, ts,
          CASE WHEN lag(ts) OVER w IS NULL
               OR ts - lag(ts) OVER w >= INTERVAL 30 MINUTE THEN 1 ELSE 0 END AS ns
          FROM e WINDOW w AS (PARTITION BY user_id ORDER BY ts)),
        s AS (SELECT user_id, ts,
          SUM(ns) OVER (PARTITION BY user_id ORDER BY ts ROWS UNBOUNDED PRECEDING) AS sid
          FROM f)
        SELECT user_id, MIN(ts) AS w_start,
          MAX(ts) + INTERVAL 30 MINUTE AS w_end, COUNT(*) AS n_events
        FROM s GROUP BY user_id, sid ORDER BY user_id, w_start"""),
      // benched since ROUND 14 (verdict item 5): the user_id-keyed event
      // query that the events-by-user_id bucketed layout serves — its
      // session aggregation requires ClusteredDistribution(user_id), so
      // the bucketed leg runs it exchange-free (BenchTune eventab A/B)
      bench = true),

    // ---- J7 as-of join: latest preceding click per purchase ----------------
    QueryDef(
      "t_asof_join",
      (s, d) => {
        import s.implicits._
        val e = Tables.events(s, d)
        val purchases = e.filter($"event_type" === "purchase")
          .select($"event_id", $"user_id", $"ts")
        val clicks = e.filter($"event_type" === "click")
          .select($"user_id", $"ts".as("click_ts"), $"value".as("click_value"))
        graft.operators.AsOfJoin.backward(
            purchases, clicks, Seq("user_id"), "ts", "click_ts",
            Seq("click_ts", "click_value"))
          // nullable timestamp rendered as text: cross-engine parquet/pandas
          // timestamp-unit handling of NULLs is not reliable
          .select($"event_id", $"user_id", $"ts",
            date_format($"asof_click_ts", "yyyy-MM-dd HH:mm:ss.SSSSSS")
              .as("asof_click_ts"),
            $"asof_click_value")
          .orderBy($"event_id")
      },
      Some("""WITH e AS (SELECT event_id, user_id, CAST(ts AS TIMESTAMP) AS ts,
            event_type, value FROM events),
        u AS (
          SELECT user_id, ts, 1 AS side, event_id,
                 NULL AS click_ts, NULL AS click_value
          FROM e WHERE event_type = 'purchase'
          UNION ALL
          SELECT user_id, ts, 0, NULL, ts, value
          FROM e WHERE event_type = 'click'),
        c AS (SELECT *,
          last_value(click_ts IGNORE NULLS) OVER w AS asof_click_ts,
          last_value(click_value IGNORE NULLS) OVER w AS asof_click_value
          FROM u WINDOW w AS (PARTITION BY user_id ORDER BY ts, side
            ROWS UNBOUNDED PRECEDING))
        SELECT event_id, user_id, ts,
          strftime(asof_click_ts, '%Y-%m-%d %H:%M:%S.%f') AS asof_click_ts,
          asof_click_value
        FROM c WHERE side = 1 ORDER BY event_id""")),

    // ---- Forward-window attribution join (first click after view) ----------
    // The click-attribution contract: each view matched to the EARLIEST
    // click by the same user within 30 minutes AFTER it (ties by click id).
    // Complements t_asof_join's backward-looking last-before semantics.
    // Batch form is the oracle anchor; graft.streaming.IngestStream
    // .attributionJoin is the stream-stream twin (same interval condition,
    // watermarked on both sides), pair-set parity pinned in its spec.
    // Plan: equi-join on user_id with the time range as a post-join filter
    // — per-user fan-out is bounded by activity, never a cross join; at
    // stream scale the watermark bounds the state instead.
    QueryDef(
      "t_attribution",
      (s, d) => {
        import s.implicits._
        val e = Tables.events(s, d)
        val views = e.filter($"event_type" === "view")
          .select($"event_id".as("view_id"), $"user_id", $"ts".as("view_ts"))
        val clicks = e.filter($"event_type" === "click")
          .select($"event_id".as("click_id"), $"user_id",
            $"ts".as("click_ts"))
        val w = org.apache.spark.sql.expressions.Window
          .partitionBy($"view_id").orderBy($"click_ts", $"click_id")
        views.join(clicks, Seq("user_id"))
          .filter($"click_ts" > $"view_ts" &&
            $"click_ts" <= $"view_ts" + expr("INTERVAL '30' MINUTE"))
          .withColumn("rn", row_number().over(w))
          .filter($"rn" === 1)
          .select($"view_id", $"user_id", $"view_ts", $"click_id",
            $"click_ts",
            (unix_micros($"click_ts") - unix_micros($"view_ts")).as("lag_us"))
          .orderBy($"view_id")
      },
      Some("""WITH e AS (
          SELECT event_id, user_id, CAST(ts AS TIMESTAMP) AS ts, event_type
          FROM events),
        v AS (SELECT event_id AS view_id, user_id, ts AS view_ts
              FROM e WHERE event_type = 'view'),
        c AS (SELECT event_id AS click_id, user_id, ts AS click_ts
              FROM e WHERE event_type = 'click'),
        j AS (
          SELECT v.view_id, v.user_id, v.view_ts, c.click_id, c.click_ts,
            ROW_NUMBER() OVER (PARTITION BY v.view_id
              ORDER BY c.click_ts, c.click_id) AS rn
          FROM v JOIN c ON c.user_id = v.user_id
            AND c.click_ts > v.view_ts
            AND c.click_ts <= v.view_ts + INTERVAL 30 MINUTE)
        SELECT view_id, user_id, view_ts, click_id, click_ts,
          date_diff('microseconds', view_ts, click_ts) AS lag_us
        FROM j WHERE rn = 1 ORDER BY view_id""")),

    // ---- I4: exact dedup — doubled input collapses back to the original ----
    QueryDef(
      "e_dedup_exact",
      (s, d) => {
        import s.implicits._
        val e = Tables.events(s, d)
        e.unionAll(e)
          .dropDuplicates("event_id")
          .groupBy($"event_type")
          .agg(count(lit(1)).as("n"))
          .orderBy($"event_type")
      },
      Some("""SELECT event_type, COUNT(*) AS n FROM events
        GROUP BY event_type ORDER BY event_type""")),

    // ---- F15: JSON access over the props column ----------------------------
    QueryDef(
      "f_json_props",
      (s, d) => {
        import s.implicits._
        Tables.events(s, d)
          .select($"event_type",
            get_json_object($"props", "$.k").cast("long").as("k"))
          .groupBy($"event_type")
          .agg(sum($"k").as("sum_k"), max($"k").as("max_k"), count(lit(1)).as("n"))
          .orderBy($"event_type")
      },
      Some("""SELECT event_type,
        CAST(SUM(CAST(props->>'k' AS BIGINT)) AS BIGINT) AS sum_k,
        CAST(MAX(CAST(props->>'k' AS BIGINT)) AS BIGINT) AS max_k,
        COUNT(*) AS n
        FROM events GROUP BY event_type ORDER BY event_type""")),

    // ---- Funnel: ordered step completion per user --------------------------
    // view → click-after-that-view → purchase-after-that-click, counted
    // per step. Each step is a per-user min-timestamp aggregate (map-side
    // combinable) plus one equi-join on user_id — no window, no per-user
    // event-sequence materialization, so the shape survives 100 TB event
    // tables: three token-sized (user_id, ts) aggregates joining by key.
    // STRICT ts ordering (>) on the micros-truncated timestamps both
    // engines share (see the file header note on TIMESTAMP(NANOS)).
    QueryDef(
      "t_funnel",
      (s, d) => {
        import s.implicits._
        val ev = Tables.events(s, d)
        val v = ev.filter($"event_type" === "view")
          .groupBy($"user_id").agg(min($"ts").as("tv"))
        val c = ev.filter($"event_type" === "click")
          .join(v, "user_id").filter($"ts" > $"tv")
          .groupBy($"user_id").agg(min($"ts").as("tc"))
        val p = ev.filter($"event_type" === "purchase")
          .join(c, "user_id").filter($"ts" > $"tc")
          .groupBy($"user_id").agg(min($"ts").as("tp"))
        v.agg(count(lit(1)).as("n_view"))
          .crossJoin(broadcast(c.agg(count(lit(1)).as("n_view_click"))))
          .crossJoin(broadcast(p.agg(count(lit(1)).as("n_full_funnel"))))
      },
      Some("""WITH v AS (SELECT user_id, min(CAST(ts AS TIMESTAMP)) AS tv
          FROM events WHERE event_type = 'view' GROUP BY 1),
        c AS (SELECT e.user_id, min(CAST(e.ts AS TIMESTAMP)) AS tc
          FROM events e JOIN v USING (user_id)
          WHERE e.event_type = 'click' AND CAST(e.ts AS TIMESTAMP) > v.tv
          GROUP BY 1),
        p AS (SELECT e.user_id, min(CAST(e.ts AS TIMESTAMP)) AS tp
          FROM events e JOIN c USING (user_id)
          WHERE e.event_type = 'purchase' AND CAST(e.ts AS TIMESTAMP) > c.tc
          GROUP BY 1)
        SELECT (SELECT COUNT(*) FROM v) AS n_view,
          (SELECT COUNT(*) FROM c) AS n_view_click,
          (SELECT COUNT(*) FROM p) AS n_full_funnel""")),

    // ---- Event-type transition counts (first-order Markov edges) -----------
    // lead() over each user's ts-ordered stream, then a count per
    // (from, to) pair — the per-user window is the only wide op and it
    // keys on user_id, so at 100 TB the sort is per-user-partition, never
    // global; the transition matrix itself is |types|² tiny. Ties in ts
    // are broken by event_id for a total order on both engines.
    QueryDef(
      "t_event_transitions",
      (s, d) => {
        import s.implicits._
        val w = org.apache.spark.sql.expressions.Window
          .partitionBy($"user_id").orderBy($"ts", $"event_id")
        Tables.events(s, d)
          .withColumn("next_type", lead($"event_type", 1).over(w))
          .filter($"next_type".isNotNull)
          .groupBy($"event_type", $"next_type").agg(count(lit(1)).as("n"))
          .orderBy($"n".desc, $"event_type", $"next_type").limit(10)
      },
      Some("""WITH t AS (SELECT event_type,
          lead(event_type) OVER (PARTITION BY user_id
            ORDER BY CAST(ts AS TIMESTAMP), event_id) AS next_type
          FROM events)
        SELECT event_type, next_type, COUNT(*) AS n
        FROM t WHERE next_type IS NOT NULL
        GROUP BY 1, 2 ORDER BY n DESC, event_type, next_type LIMIT 10""")),

    // ---- Cohort retention: weekly cohorts × weeks-since-first --------------
    // cohort = Monday of the user's first activity week; one row per
    // (cohort, k) counting users active k weeks later. The distinct
    // (user, week) projection collapses event volume BEFORE any join —
    // the big table shrinks to ≤ users × weeks rows, then one equi-join
    // on user_id; week arithmetic stays integral (Monday-truncated
    // dates, day-diff / 7 exact) so the engines agree bit-for-bit.
    QueryDef(
      "t_retention_cohorts",
      (s, d) => {
        import s.implicits._
        val ev = Tables.events(s, d)
          .select($"user_id", date_trunc("week", $"ts").as("w"))
        val first = ev.groupBy($"user_id").agg(min($"w").as("w0"))
        ev.distinct().join(first, "user_id")
          .select(date_format($"w0", "yyyy-MM-dd").as("cohort"),
            (datediff($"w".cast("date"), $"w0".cast("date")) / 7)
              .cast("int").as("k"))
          .groupBy($"cohort", $"k").agg(count(lit(1)).as("n_users"))
          .orderBy($"cohort", $"k")
      },
      Some("""WITH ev AS (SELECT user_id,
            date_trunc('week', CAST(ts AS TIMESTAMP)) AS w FROM events),
        f AS (SELECT user_id, min(w) AS w0 FROM ev GROUP BY 1),
        a AS (SELECT DISTINCT user_id, w FROM ev)
        SELECT strftime(f.w0, '%Y-%m-%d') AS cohort,
          CAST(date_diff('day', CAST(f.w0 AS DATE), CAST(a.w AS DATE)) // 7
            AS INTEGER) AS k,
          COUNT(*) AS n_users
        FROM a JOIN f USING (user_id)
        GROUP BY 1, 2 ORDER BY cohort, k""")),

    // ---- CDC merge: last-writer-wins snapshot with delete markers ---------
    // The change-data-capture compaction shape: events are a keyed change
    // stream (key = user_id; 'error' rows act as DELETE tombstones, the
    // rest as upserts), and the snapshot is each key's latest surviving
    // state. Implementation is MAX_BY via a struct max over the unique
    // (ts, event_id) order — a plain aggregate, so it PARTIAL-AGGREGATES
    // map-side (each input partition pre-reduces to one candidate row per
    // key before the shuffle), unlike the textbook row_number()-over-
    // window form which must shuffle every change to sort it. At 100 TB
    // that difference is the whole game: shuffle bytes ∝ |keys|, not
    // |changes|. Tombstoned keys drop AFTER the merge (the tombstone must
    // win first — filtering 'error' rows before the aggregate would
    // resurrect the previous state).
    QueryDef(
      "t_cdc_snapshot",
      (s, d) => {
        import s.implicits._
        Tables.events(s, d)
          .groupBy($"user_id")
          .agg(
            max(struct($"ts", $"event_id", $"event_type", $"value"))
              .as("last"),
            count(lit(1)).as("n_changes"))
          .filter($"last.event_type" =!= "error")
          .select($"user_id",
            date_format($"last.ts", "yyyy-MM-dd HH:mm:ss.SSSSSS")
              .as("last_ts"),
            $"last.event_type".as("last_type"),
            $"last.value".as("last_value"),
            $"n_changes")
          .orderBy($"user_id")
      },
      Some("""WITH ranked AS (SELECT user_id,
            CAST(ts AS TIMESTAMP) AS ts, event_id, event_type, value,
            ROW_NUMBER() OVER (PARTITION BY user_id
              ORDER BY CAST(ts AS TIMESTAMP) DESC, event_id DESC) AS rn,
            COUNT(*) OVER (PARTITION BY user_id) AS n_changes
          FROM events)
        SELECT user_id,
          strftime(ts, '%Y-%m-%d %H:%M:%S.%f') AS last_ts,
          event_type AS last_type, value AS last_value, n_changes
        FROM ranked WHERE rn = 1 AND event_type <> 'error'
        ORDER BY user_id""")),

    // ---- SCD Type-2: validity intervals from a change stream --------------
    // The dimension-history reconstruction: every change opens an
    // interval [valid_from, valid_to) closed by the key's next change
    // (lead over the unique (ts, event_id) order); the open interval is
    // the current row. ONE shuffle on the key + a per-key sort — at
    // scale, per-key history lengths bound the window buffers (user
    // histories are short and near-uniform; a hot key with millions of
    // changes would need the same salt-and-restitch as any skewed
    // window). Unlike t_cdc_snapshot this keeps EVERY version — snapshot
    // and history are the two halves of a merge-on-read story.
    QueryDef(
      "t_scd2_intervals",
      (s, d) => {
        import s.implicits._
        import org.apache.spark.sql.expressions.Window
        val w = Window.partitionBy($"user_id").orderBy($"ts", $"event_id")
        Tables.events(s, d)
          .select($"user_id", $"ts", $"event_id", $"event_type", $"value")
          .withColumn("valid_to_ts", lead($"ts", 1).over(w))
          .withColumn("version", row_number().over(w))
          .select($"user_id", $"version",
            date_format($"ts", "yyyy-MM-dd HH:mm:ss.SSSSSS")
              .as("valid_from"),
            date_format($"valid_to_ts", "yyyy-MM-dd HH:mm:ss.SSSSSS")
              .as("valid_to"),
            $"valid_to_ts".isNull.as("is_current"),
            $"event_type".as("state_type"),
            $"value".as("state_value"))
          .orderBy($"user_id", $"version")
      },
      Some("""SELECT user_id,
          ROW_NUMBER() OVER w AS version,
          strftime(CAST(ts AS TIMESTAMP),
            '%Y-%m-%d %H:%M:%S.%f') AS valid_from,
          strftime(LEAD(CAST(ts AS TIMESTAMP)) OVER w,
            '%Y-%m-%d %H:%M:%S.%f') AS valid_to,
          LEAD(CAST(ts AS TIMESTAMP)) OVER w IS NULL AS is_current,
          event_type AS state_type, value AS state_value
        FROM events
        WINDOW w AS (PARTITION BY user_id
          ORDER BY CAST(ts AS TIMESTAMP), event_id)
        ORDER BY user_id, version""")),

    // ---- Top session paths (behavioral sequence mining) --------------------
    // The path-frequency composition: gap-sessionize (30-minute
    // inactivity, the t4_session semantics spelled as lag + cumulative
    // sum so BOTH engines share the exact recurrence, gap compared in
    // integer microseconds), take each session's first 3 event types in
    // (ts, event_id) order, and rank the resulting paths by session
    // count — "how do sessions start", the entry-funnel view t_funnel's
    // fixed ordering can't give. Deterministic: tie-breaks by event_id
    // everywhere, path strings assembled in rn order. Scale shape: two
    // user-keyed windows + a path-keyed count + TakeOrdered — no
    // corpus-wide state beyond the top-k.
    QueryDef(
      "t_session_paths",
      (s, d) => {
        import s.implicits._
        import org.apache.spark.sql.expressions.Window
        val wo = Window.partitionBy($"user_id").orderBy($"ts", $"event_id")
        val f = Tables.events(s, d)
          .select($"user_id", $"ts", $"event_id", $"event_type")
          .withColumn("prev_us", lag(unix_micros($"ts"), 1).over(wo))
          .withColumn("ns",
            when($"prev_us".isNull ||
              unix_micros($"ts") - $"prev_us" >= 1800000000L, 1L)
              .otherwise(0L))
          .withColumn("sid", sum($"ns").over(
            wo.rowsBetween(Window.unboundedPreceding, Window.currentRow)))
        val ws = Window.partitionBy($"user_id", $"sid")
          .orderBy($"ts", $"event_id")
        val paths = f.withColumn("rn", row_number().over(ws))
          .filter($"rn" <= 3)
          .groupBy($"user_id", $"sid")
          .agg(concat_ws("->",
            transform(array_sort(collect_list(struct($"rn", $"event_type"))),
              x => x.getField("event_type"))).as("path"))
        paths.groupBy($"path").agg(count(lit(1)).as("n_sessions"))
          .orderBy($"n_sessions".desc, $"path")
          .limit(20)
      },
      Some("""WITH e AS (SELECT event_id, user_id,
          epoch_us(CAST(ts AS TIMESTAMP)) AS us, event_type FROM events),
        f AS (SELECT user_id, us, event_id, event_type,
          CASE WHEN lag(us) OVER w IS NULL
               OR us - lag(us) OVER w >= 1800000000 THEN 1 ELSE 0 END AS ns
          FROM e WINDOW w AS (PARTITION BY user_id ORDER BY us, event_id)),
        s AS (SELECT user_id, us, event_id, event_type,
          SUM(ns) OVER (PARTITION BY user_id ORDER BY us, event_id
            ROWS UNBOUNDED PRECEDING) AS sid
          FROM f),
        r AS (SELECT user_id, sid, event_type,
          ROW_NUMBER() OVER (PARTITION BY user_id, sid
            ORDER BY us, event_id) AS rn
          FROM s),
        p AS (SELECT user_id, sid,
          string_agg(event_type, '->' ORDER BY rn) AS path
          FROM r WHERE rn <= 3 GROUP BY user_id, sid)
        SELECT path, COUNT(*) AS n_sessions FROM p
        GROUP BY path ORDER BY n_sessions DESC, path LIMIT 20"""))
  )
}
