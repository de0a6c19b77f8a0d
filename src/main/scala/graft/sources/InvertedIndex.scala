package graft.sources

import org.apache.spark.sql.{Column, DataFrame, SparkSession}
import org.apache.spark.sql.functions._

/** Inverted-index-at-rest: the retrieval counterpart of the bucketed join
  * layouts ([[Bucketing]]) — postings persisted bucketed+sorted BY TERM so
  * a query-term lookup is a bucket-pruned scan (`SelectedBucketsCount: q
  * out of N` — the scan touches only the query terms' buckets, never the
  * corpus). At 100 TB this is the difference between a retrieval query
  * reading ~terabytes of token rows and reading a few hundred MB of
  * postings: the token-explode + tf/df/dl aggregation is paid ONCE at
  * index-build time and amortized over every query, exactly like the
  * bucketed star-join layouts amortize their shuffle.
  *
  * Postings are denormalized — (term, doc_id, tf, df, dl) — so scoring
  * needs NO join except a broadcast of the 1-row corpus stats table
  * (`<table>_stats`: nd, avgdl): the classic posting-list design, trading
  * a few bytes per row for a join-free, shuffle-free-until-topk query.
  *
  * [[bm25Fx]] is the ONE definition of the BM25 contribution (identical
  * expression structure to the `x_bm25_topk` oracle SQL): per-posting
  * fixed-point longs, so scores sum order-independently and rankings tie
  * exactly — the query path and the full-scan QueryDef are parity-pinned
  * by construction and by spec.
  */
object InvertedIndex {

  /** Okapi BM25 (k1=1.2, b=0.75) per-posting contribution as a 1e-6
    * fixed-point long. Expression structure mirrors the `x_bm25_topk`
    * DuckDB oracle term-for-term (same double-op order, same
    * Math.log-vs-libm caveat as the surprisal family). */
  def bm25Fx(tf: Column, df: Column, dl: Column,
      nd: Column, avgdl: Column): Column =
    round(log(lit(1.0) + (nd - df + 0.5) / (df + 0.5)) *
      ((tf * 2.2) / (tf + lit(1.2) * (lit(0.25) + lit(0.75) * dl / avgdl)))
      * 1e6, 0).cast("long")

  /** Build the postings layout from `docs(doc_id, text)`: one row per
    * (term, doc_id) carrying tf + denormalized df and dl, bucketed and
    * sorted by term into `table`; corpus stats (nd, avgdl) into
    * `<table>_stats`. The corpus is tokenized ONCE: the (doc, term, tf)
    * aggregate is materialized (localCheckpoint) and dl (= sum of tf per
    * doc), df, and the corpus stats all derive from it — without the
    * barrier, the two saveAsTable actions would re-run the token explode
    * 3-4x as independent scan subtrees. */
  def buildPostings(docs: DataFrame, table: String, buckets: Int): Unit = {
    val tf = docs
      .select(col("doc_id"), explode(split(col("text"), " ")).as("term"))
      .filter(length(col("term")) > 0)
      .groupBy("doc_id", "term").agg(count(lit(1)).as("tf"))
      .localCheckpoint(true)
    val dl = tf.groupBy("doc_id").agg(sum(col("tf")).as("dl"))
    val dfq = tf.groupBy("term").agg(count(lit(1)).as("df"))
    val postings = tf.join(dfq, "term").join(dl, "doc_id")
      .select("term", "doc_id", "tf", "df", "dl")
    Bucketing.writeBucketed(postings, table, "term", buckets)
    dl.agg(count(lit(1)).as("nd"),
        (sum(col("dl")).cast("double") / count(lit(1))).as("avgdl"))
      .write.mode("overwrite").format("parquet").saveAsTable(table + "_stats")
  }

  /** Top-k BM25 over the postings layout. The `isin` filter on the bucket
    * column prunes the scan to the query terms' buckets; scoring is
    * join-free (stats broadcast); the only wide op is the per-doc score
    * sum over |q| postings per doc. Ranking orders by the LONG score sum
    * (ties exact), same contract as `x_bm25_topk`. */
  def bm25TopK(spark: SparkSession, table: String, terms: Seq[String],
      k: Int): DataFrame = {
    val stats = spark.table(table + "_stats")
    spark.table(table)
      .filter(col("term").isin(terms: _*))
      .crossJoin(broadcast(stats))
      .select(col("doc_id"),
        bm25Fx(col("tf"), col("df"), col("dl"), col("nd"), col("avgdl"))
          .as("fx"))
      .groupBy("doc_id")
      .agg(count(lit(1)).as("n_terms_hit"), sum(col("fx")).as("sfx"))
      .orderBy(col("sfx").desc, col("doc_id")).limit(k)
      .select(col("doc_id"), col("n_terms_hit"),
        round(col("sfx").cast("double") / 1e6, 6).as("bm25"))
  }

  /** Top-k BM25 over a LIVE postings layout — the append-able variant
    * maintained by [[graft.streaming.IndexStream]]. Live postings carry
    * (term, doc_id, tf, dl) but NOT df (any baked-in corpus-level stat
    * would go stale on every append); instead df is recomputed here from
    * the bucket-pruned scan itself — the pruned slice holds EVERY posting
    * of the query terms, so a per-term window count over it IS the exact
    * global df. The whole query stays ONE pass over the pruned slice:
    * scan → distinct → window-df → score (a df-by-aggregate-and-rejoin
    * would execute the scan+distinct subtree twice, once inside the
    * broadcast). Corpus stats (nd, avgdl) come from summing the
    * per-batch `<table>_stats` rows (one tiny row per micro-batch).
    * Scoring and ranking share [[bm25Fx]] with the sealed path and the
    * `x_bm25_topk` QueryDef, so all three agree exactly (spec-pinned).
    *
    * The `distinct()` on the pruned slice is load-bearing: a crash-replayed
    * micro-batch may have appended its postings twice (see
    * [[graft.streaming.IndexStream]]'s at-least-once append contract), and
    * replayed rows are EXACT copies (deterministic tokenization of the same
    * checkpointed files) — collapsing them here makes query results
    * exactly-once regardless of ingest-side replays, for the price of one
    * small shuffle over |q| terms' postings, never the corpus. */
  def bm25TopKLive(spark: SparkSession, table: String, terms: Seq[String],
      k: Int): DataFrame = {
    val stats = spark.table(table + "_stats")
      .agg(sum(col("nd")).as("nd"),
        (sum(col("sum_dl")).cast("double") / sum(col("nd"))).as("avgdl"))
    val w = org.apache.spark.sql.expressions.Window.partitionBy("term")
    spark.table(table)
      .filter(col("term").isin(terms: _*)).distinct()
      .withColumn("df", count(lit(1)).over(w))
      .crossJoin(broadcast(stats))
      .select(col("doc_id"),
        bm25Fx(col("tf"), col("df"), col("dl"), col("nd"), col("avgdl"))
          .as("fx"))
      .groupBy("doc_id")
      .agg(count(lit(1)).as("n_terms_hit"), sum(col("fx")).as("sfx"))
      .orderBy(col("sfx").desc, col("doc_id")).limit(k)
      .select(col("doc_id"), col("n_terms_hit"),
        round(col("sfx").cast("double") / 1e6, 6).as("bm25"))
  }

  /** Compact a LIVE postings table (maintained by
    * [[graft.streaming.IndexStream]]) into the sealed layout: collapse any
    * crash-replay duplicates, bake the now-current df back onto each
    * posting, rewrite bucketed-by-term, and replace the per-batch stats
    * rows with the single-row sealed form. The periodic maintenance step
    * of the live index lifecycle — stream appends accumulate small
    * per-batch bucket files and query-time df work; sealing folds both
    * back to the read-optimized shape (one aggregation pass over the live
    * table, no re-tokenization of the corpus). Offline: readers of
    * `into` see the old version until the final `saveAsTable` commits. */
  def seal(spark: SparkSession, liveTable: String, into: String): Unit = {
    require(liveTable != into,
      "seal reads the live table while writing - target a fresh name")
    val live = spark.table(liveTable).distinct()
    val dfq = live.groupBy("term")
      .agg(count(lit(1)).as("df"))
    Bucketing.writeBucketed(
      live.join(dfq, "term")
        .select("term", "doc_id", "tf", "df", "dl"),
      into, "term", buckets = bucketCount(spark, liveTable))
    spark.table(liveTable + "_stats")
      .agg(sum(col("nd")).as("nd"),
        (sum(col("sum_dl")).cast("double") / sum(col("nd"))).as("avgdl"))
      .write.mode("overwrite").format("parquet").saveAsTable(into + "_stats")
  }

  /** Catalog table name of the committed-bench postings layout
    * ([[writeBenchPostings]]). */
  val BenchTable = "bench_ret_postings"

  /** Committed-bench-leg prep (untimed — r15 verdict item 8): (re)build
    * the sealed postings layout for `sfDir`'s documents under
    * [[BenchTable]] (8 term buckets — the r10_inverted_index probe's
    * configuration) and return the 5 highest-df query terms, i.e. the
    * exact query shape of the `x_bm25_topk` gate, whose full-scan form
    * this leg is the at-rest answer to. Like the bucketed star tables
    * and the bench EdgeStore, the layout is rewritten fresh each run (a
    * stale copy of a regenerated corpus would silently serve old rows),
    * and any leftover warehouse directory from a crashed prior run is
    * deleted first (saveAsTable throws on a location it has no catalog
    * entry for). */
  def writeBenchPostings(spark: SparkSession, sfDir: String): Seq[String] = {
    Seq(BenchTable, BenchTable + "_stats").foreach { t =>
      spark.sql(s"DROP TABLE IF EXISTS $t")
      val wh = spark.conf.get("spark.sql.warehouse.dir").stripPrefix("file:")
      org.apache.hadoop.fs.FileUtil.fullyDelete(new java.io.File(wh, t))
    }
    buildPostings(
      graft.Tables.documents(spark, sfDir).select(col("doc_id"), col("text")),
      BenchTable, buckets = 8)
    spark.table(BenchTable)
      .select(col("term"), col("df")).distinct()
      .orderBy(col("df").desc, col("term")).limit(5)
      .select(col("term")).collect().map(_.getString(0)).toSeq
  }

  /** Bucket count of an existing bucketed catalog table (sealing keeps
    * the live table's bucket spec unless the caller rewrites it). */
  private def bucketCount(spark: SparkSession, table: String): Int =
    spark.sessionState.catalog
      .getTableMetadata(org.apache.spark.sql.catalyst.TableIdentifier(table))
      .bucketSpec.map(_.numBuckets).getOrElse(8)
}
