package graft.ext

import org.apache.spark.sql.{Column, DataFrame}
import org.apache.spark.sql.functions._

/** Exact repeated-span detection for substring-level deduplication — the
  * "exact substring dedup" recipe of Lee et al. (arXiv 2107.06499,
  * "Deduplicating Training Data Makes Language Models Better"),
  * re-expressed as a distributed k-gram hash join instead of a suffix
  * array: any `width`-token span occurring in ≥ `minDocs` distinct
  * documents is a repeated span, and every token it covers is masked.
  * Complements the document-level dedup family (exact / MinHash /
  * SimHash / semantic): those drop whole near-identical documents, this
  * finds verbatim boilerplate INSIDE otherwise-distinct documents.
  *
  * Scale shape: one narrow pass explodes each document into its spans
  * (O(tokens) rows/doc — the span construction reads a projected token
  * ARRAY attribute, same O(tokens) rule as MinHashDedup.shinglesOfToks);
  * the only shuffles are keyed by the span text (the repeated-span
  * aggregate and the hit join — Catalyst reuses the exchange since both
  * key on `span`), then per-doc aggregates keyed by doc_id. No
  * self-join, no all-pairs anything: cost is linear in corpus tokens plus
  * the (tiny) repeated-span set. At 100 TB, pass `hashKeys = true` to key
  * the shuffle by the 16-byte md5 digest of the span instead of the span
  * text (a `width`-token span is typically 40–60 bytes and rides TWO
  * shuffles — the repeated-span aggregate and the hit join): the span is
  * only ever a KEY, never output, so hashing preserves the statistics
  * exactly up to md5 collisions (~2⁻¹²⁸ per pair — accepted; a parity
  * spec pins hash-keyed ≡ text-keyed). The oracle row keeps the default
  * text keys so DuckDB re-derives the pipeline without a hash detour.
  *
  * Interval union (a token masked by ANY overlapping repeated span) is
  * computed by exploding each hit span into its `width` positions and
  * DISTINCT-counting per doc — exact, and bounded by hits × width.
  */
object SpanDedup {

  /** All `width`-token spans of a token-array ATTRIBUTE, in order (span i
    * covers tokens [i, i+width), 1-based). THE single definition of "what
    * is a span" — shared by [[repeatedSpanStats]] and the
    * `x_span_contamination` decontamination query so the two operators
    * cannot silently diverge on width/tokenizer/separator. Callers must
    * pre-filter `size(toks) >= width`: Spark's `sequence(1, n)` DESCENDS
    * for n < 1 (DuckDB's generate_series is empty), so the filter is
    * correctness-critical, not just a fast path.
    */
  def spanArray(toks: Column, width: Int): Column =
    transform(sequence(lit(1), size(toks) - (width - 1)),
      i => concat_ws(" ", slice(toks, i, lit(width))))

  /** Distinct `width`-token grams of a whitespace-tokenized text column;
    * docs shorter than `width` tokens yield an EMPTY array (callers need
    * no size pre-filter — the guard matters because `sequence(1, 0)`
    * descends). The guarded DISTINCT form of [[spanArray]], shared by the
    * decontamination recipe in both forms (batch `x_decontamination`,
    * streaming `DeconStream`) so there is one definition of "gram". */
  def distinctGrams(text: Column, width: Int): Column = {
    val toks = split(text, " ")
    when(size(toks) >= width, array_distinct(spanArray(toks, width)))
      .otherwise(array().cast("array<string>"))
  }

  /** Per-document mask statistics over `docs(doc_id, text)`:
    * (doc_id, n_tokens, n_rep_spans, n_masked, keep_ratio), every input
    * doc present (zero hits ⇒ keep_ratio 1.0), ordered by doc_id.
    * `hashKeys` swaps the span-text shuffle key for its 16-byte md5
    * digest — the 100 TB path (see object scaladoc); output is identical.
    * On corpora with heavy EXACT duplication use [[spanStatsCollapsed]]:
    * every clone re-explodes all its spans here, so the span volume (and
    * both span-keyed shuffles) carries the clone factor by contract.
    */
  def repeatedSpanStats(docs: DataFrame, width: Int = 8,
      minDocs: Int = 2, hashKeys: Boolean = false): DataFrame =
    statsOf(docs, width, minDocs, hashKeys).orderBy(col("doc_id"))

  /** [[repeatedSpanStats]] with exact-duplicate PRE-COLLAPSE — the corpus
    * order of operations at scale, mirroring
    * [[MinHashDedup.candidatePairsCollapsed]]. The span explode is linear
    * in corpus tokens, so on a clone-heavy corpus the explode (and the two
    * span-keyed shuffles behind it) carries the clone factor; collapsing
    * to ONE representative per distinct text first (min doc_id, the exact
    * dedup rule) shrinks that volume by the clone factor, and every doc
    * then INHERITS its representative's stats — identical text means
    * identical n_tokens/n_rep_spans/n_masked/keep_ratio by construction.
    *
    * SEMANTIC NOTE: `minDocs` here counts DISTINCT TEXTS, not raw doc
    * rows — a span "repeated" only because a document is cloned verbatim
    * does not become a repeated span (clone-level repetition is exact
    * dedup's job; this operator measures cross-document boilerplate among
    * genuinely distinct texts — the curation-correct reading of Lee et
    * al.'s recipe, which deduplicates exactly before suffix-array work).
    * On a clone-free corpus this is EXACTLY [[repeatedSpanStats]]
    * (spec-pinned). The collapse keys on md5(text) — a collision
    * (~2⁻¹²⁸ per pair) would merge two distinct texts into one
    * representative; accepted, same trade as `hashKeys` documents above.
    */
  def spanStatsCollapsed(docs: DataFrame, width: Int = 8,
      minDocs: Int = 2, hashKeys: Boolean = false): DataFrame = {
    val w = org.apache.spark.sql.expressions.Window.partitionBy(col("fp"))
    val mapped = docs.withColumn("fp", md5(col("text")))
      .withColumn("rep_id", min(col("doc_id")).over(w))
    val reps = mapped.filter(col("doc_id") === col("rep_id"))
      .select(col("doc_id"), col("text"))
    mapped.select(col("doc_id"), col("rep_id"))
      .join(statsOf(reps, width, minDocs, hashKeys)
        .withColumnRenamed("doc_id", "rep_id"), Seq("rep_id"))
      .select(col("doc_id"), col("n_tokens"), col("n_rep_spans"),
        col("n_masked"), col("keep_ratio"))
      .orderBy(col("doc_id"))
  }

  private def statsOf(docs: DataFrame, width: Int,
      minDocs: Int, hashKeys: Boolean): DataFrame = {
    // the span participates ONLY as a grouping/join key from here on, so
    // the key column can be the digest; `unhex(md5(_))` is BinaryType —
    // 16 bytes at rest and through both exchanges
    def keyOf(span: Column): Column =
      if (hashKeys) unhex(md5(span)) else span
    val toks = docs.select(col("doc_id"), split(col("text"), " ").as("t"))
    val sp = toks.filter(size(col("t")) >= width)
      .select(col("doc_id"), explode(transform(
        spanArray(col("t"), width),
        (x, i) => struct((i + 1).as("pos"), keyOf(x).as("span")))).as("s"))
      .select(col("doc_id"), col("s.pos").as("pos"), col("s.span").as("span"))

    val rep = sp.groupBy(col("span"))
      .agg(countDistinct(col("doc_id")).as("nd"))
      .filter(col("nd") >= minDocs)
      .select(col("span"))
    val hits = sp.join(rep, Seq("span")).select(col("doc_id"), col("pos"))

    val nrep = hits.groupBy(col("doc_id")).agg(count(lit(1)).as("n_rep_spans"))
    val masked = hits
      .select(col("doc_id"),
        explode(sequence(col("pos"), col("pos") + (width - 1))).as("j"))
      .groupBy(col("doc_id"))
      .agg(countDistinct(col("j")).as("n_masked"))

    docs.select(col("doc_id"), size(split(col("text"), " ")).as("n_tokens"))
      .join(nrep, Seq("doc_id"), "left")
      .join(masked, Seq("doc_id"), "left")
      .select(col("doc_id"), col("n_tokens"),
        coalesce(col("n_rep_spans"), lit(0L)).as("n_rep_spans"),
        coalesce(col("n_masked"), lit(0L)).as("n_masked"),
        round((col("n_tokens") - coalesce(col("n_masked"), lit(0L)))
          .cast("double") / col("n_tokens"), 6).as("keep_ratio"))
  }
}
