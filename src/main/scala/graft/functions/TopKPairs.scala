package graft.functions

import java.nio.ByteBuffer

import org.apache.spark.sql.Column
import org.apache.spark.sql.catalyst.InternalRow
import org.apache.spark.sql.catalyst.analysis.TypeCheckResult
import org.apache.spark.sql.catalyst.expressions.Expression
import org.apache.spark.sql.catalyst.expressions.aggregate.TypedImperativeAggregate
import org.apache.spark.sql.catalyst.util.GenericArrayData
import org.apache.spark.sql.graft.CatalystBridge
import org.apache.spark.sql.types._

/** Bounded-heap top-k elements per group.
  *
  * A bounded min-heap of (score, id) pairs carried through Spark's
  * partial-aggregation machinery: every map task keeps AT MOST k pairs
  * per group, the exchange moves k pairs per (group × map partition),
  * and the reduce side merges heaps. Final order: score DESC, id ASC
  * (ties deterministic).
  *
  * Why this beats the window formulation at scale: the standard
  * `row_number().over(partitionBy(g).orderBy(s.desc)) <= k` plan
  * shuffles EVERY row to its group's partition and sorts the full
  * group, making the exchange O(rows) and the sort O(rows log rows) —
  * at 100 TB the whole corpus crosses the wire to produce k rows per
  * group. This aggregate's exchange is O(groups × k × map partitions)
  * regardless of corpus size (same shape as a map-side-combined sum),
  * and no full sort exists anywhere: update is O(log k) per row against
  * the heap root.
  *
  * Semantics notes:
  *  - rows with a NULL score or id are skipped (document-level nulls
  *    don't rank);
  *  - "stronger" = higher score, then LOWER id — the heap root is the
  *    weakest element so inserts compare against it in O(1) when full;
  *  - the result is `array<struct<score double, id bigint>>`, strongest
  *    first, length = min(k, group rows) — `posexplode` recovers ranks.
  *
  * Registered in SQL as `graft_topk(score, id, k)` via GraftExtensions;
  * Column API via [[TopKPairs.topk]]. k is bounded (1..65536) because
  * buffers live per-group on the heap — beyond that you want the window
  * plan anyway (k ~ group size ⇒ the "everything crosses the wire" cost
  * is intrinsic, not a plan artifact).
  */
case class TopKPairs(
    score: Expression,
    id: Expression,
    k: Int,
    override val mutableAggBufferOffset: Int = 0,
    override val inputAggBufferOffset: Int = 0)
  extends TypedImperativeAggregate[TopKHeap] {

  require(k >= 1 && k <= 65536, s"graft_topk k must be in [1, 65536], got $k")

  override def children: Seq[Expression] = Seq(score, id)
  override def checkInputDataTypes(): TypeCheckResult =
    if (score.dataType == DoubleType && id.dataType == LongType) {
      TypeCheckResult.TypeCheckSuccess
    } else {
      TypeCheckResult.TypeCheckFailure(
        s"graft_topk needs (double, bigint), got " +
          s"(${score.dataType.simpleString}, ${id.dataType.simpleString})")
    }
  override def nullable: Boolean = false
  override def dataType: DataType = ArrayType(
    StructType(Seq(
      StructField("score", DoubleType, nullable = false),
      StructField("id", LongType, nullable = false))),
    containsNull = false)

  override def createAggregationBuffer(): TopKHeap = new TopKHeap(k)

  override def update(buffer: TopKHeap, input: InternalRow): TopKHeap = {
    val s = score.eval(input)
    val i = id.eval(input)
    if (s != null && i != null) {
      buffer.insert(s.asInstanceOf[Double], i.asInstanceOf[Long])
    }
    buffer
  }

  override def merge(buffer: TopKHeap, other: TopKHeap): TopKHeap = {
    other.foreach((s, i) => buffer.insert(s, i))
    buffer
  }

  override def eval(buffer: TopKHeap): Any = {
    val sorted = buffer.sortedDesc()
    new GenericArrayData(sorted.map { case (s, i) =>
      InternalRow(s, i)
    })
  }

  override def serialize(buffer: TopKHeap): Array[Byte] = buffer.toBytes

  override def deserialize(bytes: Array[Byte]): TopKHeap =
    TopKHeap.fromBytes(k, bytes)

  override def withNewMutableAggBufferOffset(newOffset: Int): TopKPairs =
    copy(mutableAggBufferOffset = newOffset)
  override def withNewInputAggBufferOffset(newOffset: Int): TopKPairs =
    copy(inputAggBufferOffset = newOffset)
  override protected def withNewChildrenInternal(
      newChildren: IndexedSeq[Expression]): TopKPairs =
    copy(score = newChildren(0), id = newChildren(1))

  override def prettyName: String = "graft_topk"
}

object TopKPairs {
  /** Column API: `topk(score, id, k)` — an aggregate Column usable in
    * `groupBy(...).agg(...)`. */
  def topk(score: Column, id: Column, k: Int): Column =
    CatalystBridge.column(
      TopKPairs(CatalystBridge.expression(score),
        CatalystBridge.expression(id), k).toAggregateExpression())
}

/** The aggregation buffer: a binary min-heap over "strength" — the root
  * is the WEAKEST retained pair, so a full-buffer insert is one root
  * comparison (reject) or an O(log k) sift. Pair a is weaker than b iff
  * a.score < b.score, or scores tie and a.id > b.id (final order is
  * score DESC, id ASC).
  *
  * Flat primitive arrays, no boxing: the buffer lives once per group in
  * ObjectHashAggregateExec's hash map, and serialize/deserialize (the
  * sort-based fallback path + the exchange) is a single ByteBuffer copy.
  */
final class TopKHeap(k: Int) {
  private val scores = new Array[Double](k)
  private val ids = new Array[Long](k)
  private var n = 0

  // a(i) weaker-than pair (s, id)? Doubles compare with Spark's SQL
  // semantics (SQLOrderingUtil.compareDoubles): a total order where NaN
  // is the GREATEST value and -0.0 == 0.0 — strict < / == would make
  // every comparison against a NaN root false, freezing the heap once a
  // NaN lands at the root, and would diverge from the row_number window
  // oracle (Spark and DuckDB both sort NaN as greatest).
  @inline private def cmpScore(a: Double, b: Double): Int =
    if (a == b) 0 else java.lang.Double.compare(a, b)

  @inline private def weaker(i: Int, s: Double, id: Long): Boolean = {
    val c = cmpScore(scores(i), s)
    c < 0 || (c == 0 && ids(i) > id)
  }

  def insert(s: Double, id: Long): Unit = {
    if (n < k) {
      // grow: append then sift up
      var i = n
      scores(i) = s; ids(i) = id; n += 1
      while (i > 0) {
        val p = (i - 1) >> 1
        // parent must be weaker-or-equal than child (min-heap on strength:
        // weakest at root). If the child is weaker than the parent, swap.
        if (weaker(i, scores(p), ids(p))) {
          val ts = scores(p); val ti = ids(p)
          scores(p) = scores(i); ids(p) = ids(i)
          scores(i) = ts; ids(i) = ti
          i = p
        } else i = 0
      }
    } else if (weaker(0, s, id)) {
      // replace the weakest root, sift down
      scores(0) = s; ids(0) = id
      var i = 0
      var done = false
      while (!done) {
        val l = 2 * i + 1; val r = l + 1
        var w = i // weakest of the triple
        if (l < n && weaker(l, scores(w), ids(w))) w = l
        if (r < n && weaker(r, scores(w), ids(w))) w = r
        if (w == i) done = true
        else {
          val ts = scores(w); val ti = ids(w)
          scores(w) = scores(i); ids(w) = ids(i)
          scores(i) = ts; ids(i) = ti
          i = w
        }
      }
    }
  }

  def foreach(f: (Double, Long) => Unit): Unit = {
    var i = 0
    while (i < n) { f(scores(i), ids(i)); i += 1 }
  }

  /** Strongest first: score DESC, id ASC. */
  def sortedDesc(): Array[(Double, Long)] = {
    val out = new Array[(Double, Long)](n)
    var i = 0
    while (i < n) { out(i) = (scores(i), ids(i)); i += 1 }
    scala.util.Sorting.stableSort(out,
      (a: (Double, Long), b: (Double, Long)) => {
        val c = cmpScore(a._1, b._1)
        c > 0 || (c == 0 && a._2 < b._2)
      })
    out
  }

  def size: Int = n

  def toBytes: Array[Byte] = {
    val bb = ByteBuffer.allocate(4 + n * 16)
    bb.putInt(n)
    var i = 0
    while (i < n) { bb.putDouble(scores(i)); bb.putLong(ids(i)); i += 1 }
    bb.array()
  }
}

object TopKHeap {
  def fromBytes(k: Int, bytes: Array[Byte]): TopKHeap = {
    val bb = ByteBuffer.wrap(bytes)
    val m = bb.getInt
    val h = new TopKHeap(k)
    var i = 0
    // inserts restore the heap invariant; m ≤ k by construction
    while (i < m) { h.insert(bb.getDouble, bb.getLong); i += 1 }
    h
  }
}
