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

/** Distributed ONE-PASS KMV (k-minimum-values) sketch with per-set
  * membership flags — the 100 TB form of the `x_kmv_intersection` gate's
  * TakeOrdered-64 sketch (r19 verdict item 4).
  *
  * The gated formulation first materializes the DISTINCT key union and
  * then takes the k smallest hashes: correct and flat at 10×, but the
  * distinct is a full key exchange — at 100 TB the shuffle carries every
  * distinct key to its reducer just to throw all but k away. This
  * aggregate IS the merge law the gate asserts as data
  * (KMV(A∪B) = k-smallest of KMV(A) ∪ KMV(B)): every map task folds its
  * RAW rows into a k-bounded buffer, the exchange moves at most k
  * entries per map partition, and reducers merge buffers — the same
  * O(partitions × k) exchange shape as [[TopKPairs]], with no distinct
  * pre-pass anywhere.
  *
  * Multiset semantics make it genuinely one-pass: duplicate keys need NO
  * upstream dedup. All occurrences of a key share its (h, id), so the
  * k-smallest SET is duplicate-invariant; repeated arrivals find their
  * retained entry (linear probe of the ≤ k buffer — only reached when
  * (h, id) ≤ the current root, i.e. rarely once the buffer saturates)
  * and OR their membership flags into it, which is exactly per-key
  * `bool_or` — a key seen via set A in one row and set B in another
  * carries both flags, no row needs to see both sets.
  *
  * Result: `array<struct<h bigint, id bigint, in_a boolean,
  * in_b boolean>>`, ascending (h, id) — bit-identical to
  * `ORDER BY h, id LIMIT k` over the per-key `bool_or` flags, which is
  * how the DuckDB oracle re-derives it (`x_kmv_onepass`). Ties in `h`
  * break by id ASC, matching the gate's TakeOrdered ordering.
  *
  * Registered in SQL as `graft_kmv(h, id, in_a, in_b, k)` via
  * GraftExtensions; Column API via [[KmvSketch.kmv]]. Rows with a NULL
  * hash or id are skipped (no key, no sample); NULL flags read false.
  */
case class KmvSketch(
    h: Expression,
    id: Expression,
    inA: Expression,
    inB: Expression,
    k: Int,
    override val mutableAggBufferOffset: Int = 0,
    override val inputAggBufferOffset: Int = 0)
  extends TypedImperativeAggregate[KmvBuf] {

  require(k >= 1 && k <= 65536, s"graft_kmv k must be in [1, 65536], got $k")

  override def children: Seq[Expression] = Seq(h, id, inA, inB)
  override def checkInputDataTypes(): TypeCheckResult =
    if (h.dataType == LongType && id.dataType == LongType &&
        inA.dataType == BooleanType && inB.dataType == BooleanType) {
      TypeCheckResult.TypeCheckSuccess
    } else {
      TypeCheckResult.TypeCheckFailure(
        s"graft_kmv needs (bigint, bigint, boolean, boolean), got " +
          s"(${children.map(_.dataType.simpleString).mkString(", ")})")
    }
  override def nullable: Boolean = false
  override def dataType: DataType = ArrayType(
    StructType(Seq(
      StructField("h", LongType, nullable = false),
      StructField("id", LongType, nullable = false),
      StructField("in_a", BooleanType, nullable = false),
      StructField("in_b", BooleanType, nullable = false))),
    containsNull = false)

  override def createAggregationBuffer(): KmvBuf = new KmvBuf(k)

  override def update(buffer: KmvBuf, input: InternalRow): KmvBuf = {
    val hv = h.eval(input)
    val iv = id.eval(input)
    if (hv != null && iv != null) {
      val a = inA.eval(input)
      val b = inB.eval(input)
      buffer.insert(hv.asInstanceOf[Long], iv.asInstanceOf[Long],
        a != null && a.asInstanceOf[Boolean],
        b != null && b.asInstanceOf[Boolean])
    }
    buffer
  }

  override def merge(buffer: KmvBuf, other: KmvBuf): KmvBuf = {
    other.foreach((hv, iv, a, b) => buffer.insert(hv, iv, a, b))
    buffer
  }

  override def eval(buffer: KmvBuf): Any =
    new GenericArrayData(buffer.sortedAsc().map { case (hv, iv, a, b) =>
      InternalRow(hv, iv, a, b)
    })

  override def serialize(buffer: KmvBuf): Array[Byte] = buffer.toBytes

  override def deserialize(bytes: Array[Byte]): KmvBuf =
    KmvBuf.fromBytes(k, bytes)

  override def withNewMutableAggBufferOffset(newOffset: Int): KmvSketch =
    copy(mutableAggBufferOffset = newOffset)
  override def withNewInputAggBufferOffset(newOffset: Int): KmvSketch =
    copy(inputAggBufferOffset = newOffset)
  override protected def withNewChildrenInternal(
      newChildren: IndexedSeq[Expression]): KmvSketch =
    copy(h = newChildren(0), id = newChildren(1), inA = newChildren(2),
      inB = newChildren(3))

  override def prettyName: String = "graft_kmv"
}

object KmvSketch {
  /** Column API: `kmv(h, id, inA, inB, k)` — an aggregate Column usable
    * in `agg(...)`; explode the result array to recover the sketch rows
    * (ascending (h, id), rank = position). */
  def kmv(h: Column, id: Column, inA: Column, inB: Column, k: Int): Column =
    CatalystBridge.column(
      KmvSketch(CatalystBridge.expression(h), CatalystBridge.expression(id),
        CatalystBridge.expression(inA), CatalystBridge.expression(inB), k)
        .toAggregateExpression())
}

/** The aggregation buffer: a bounded MAX-heap on (h, id) — the root is
  * the LARGEST retained entry, so once full a new key is rejected with
  * one root comparison unless it belongs in the k-smallest set. Flags
  * live in a parallel byte array (bit 0 = in_a, bit 1 = in_b) and are
  * OR-merged when a key recurs (multiset tolerance — scaladoc above).
  *
  * Duplicate detection (r20 ADVICE: the unconditional linear probe made
  * filling one buffer O(k²) comparisons — ~2³² at the allowed k = 65536,
  * per map task): an open-addressed FINGERPRINT SET over mixed (h, id)
  * gates the probe. `contains == false` proves the key is not retained
  * (every live key's fingerprint is present by construction), so the
  * O(n) scan — still the authority on equality, so a fingerprint
  * collision can never corrupt flags — runs only on true duplicates,
  * stale fingerprints of evicted keys, or mix collisions. Stale entries
  * are dropped by rebuilding from the live keys once the set reaches 2k
  * entries (amortized O(1)); fill cost is now O(k) expected.
  */
final class KmvBuf(k: Int) {
  private val hs = new Array[Long](k)
  private val ids = new Array[Long](k)
  private val flags = new Array[Byte](k)
  private var n = 0

  // fingerprint set: power-of-two capacity ≥ 4k keeps load ≤ 0.5 at the
  // 2k rebuild bound; 0 marks an empty slot (mix never returns 0)
  private val fpCap = { var c = 8; while (c < 4 * k) c <<= 1; c }
  private val fpMask = fpCap - 1
  private val fp = new Array[Long](fpCap)
  private var fpCount = 0

  @inline private def mix(h: Long, id: Long): Long = {
    var x = h * -7046029254386353131L + id
    x ^= (x >>> 32)
    if (x == 0L) 1L else x
  }
  private def fpContains(x: Long): Boolean = {
    var i = (x & fpMask).toInt
    while (fp(i) != 0L) {
      if (fp(i) == x) return true
      i = (i + 1) & fpMask
    }
    false
  }
  private def fpAdd(x: Long): Unit = {
    if (fpCount >= 2 * k) { // rebuild from live keys, dropping stale ones
      java.util.Arrays.fill(fp, 0L)
      fpCount = 0
      var j = 0
      while (j < n) {
        val y = mix(hs(j), ids(j))
        var i = (y & fpMask).toInt
        while (fp(i) != 0L && fp(i) != y) i = (i + 1) & fpMask
        if (fp(i) == 0L) { fp(i) = y; fpCount += 1 }
        j += 1
      }
    }
    var i = (x & fpMask).toInt
    while (fp(i) != 0L && fp(i) != x) i = (i + 1) & fpMask
    if (fp(i) == 0L) { fp(i) = x; fpCount += 1 }
  }

  // entry i greater-than candidate (h, id)? Total order: h ASC, id ASC.
  @inline private def greater(i: Int, h: Long, id: Long): Boolean =
    hs(i) > h || (hs(i) == h && ids(i) > id)

  def insert(h: Long, id: Long, a: Boolean, b: Boolean): Unit = {
    val f = ((if (a) 1 else 0) | (if (b) 2 else 0)).toByte
    if (n >= k && !greater(0, h, id) && !(hs(0) == h && ids(0) == id)) {
      // strictly beyond the current kth smallest and not the root itself
      return
    }
    // duplicate probe, fingerprint-gated: OR flags into a retained
    // occurrence of this key (the linear scan stays authoritative)
    val x = mix(h, id)
    if (fpContains(x)) {
      var i = 0
      while (i < n) {
        if (hs(i) == h && ids(i) == id) {
          flags(i) = (flags(i) | f).toByte
          return
        }
        i += 1
      }
    }
    fpAdd(x)
    if (n < k) {
      // grow: append then sift up (max-heap on (h, id))
      var i = n
      hs(i) = h; ids(i) = id; flags(i) = f; n += 1
      while (i > 0) {
        val p = (i - 1) >> 1
        if (greater(i, hs(p), ids(p))) {
          // child is greater than parent → swap toward the root
          val th = hs(p); val ti = ids(p); val tf = flags(p)
          hs(p) = hs(i); ids(p) = ids(i); flags(p) = flags(i)
          hs(i) = th; ids(i) = ti; flags(i) = tf
          i = p
        } else i = 0
      }
    } else {
      // replace the largest root, sift down
      hs(0) = h; ids(0) = id; flags(0) = f
      var i = 0
      var done = false
      while (!done) {
        val l = 2 * i + 1; val r = l + 1
        var g = i // greatest of the triple
        if (l < n && greater(l, hs(g), ids(g))) g = l
        if (r < n && greater(r, hs(g), ids(g))) g = r
        if (g == i) done = true
        else {
          val th = hs(g); val ti = ids(g); val tf = flags(g)
          hs(g) = hs(i); ids(g) = ids(i); flags(g) = flags(i)
          hs(i) = th; ids(i) = ti; flags(i) = tf
          i = g
        }
      }
    }
  }

  def foreach(fn: (Long, Long, Boolean, Boolean) => Unit): Unit = {
    var i = 0
    while (i < n) {
      fn(hs(i), ids(i), (flags(i) & 1) != 0, (flags(i) & 2) != 0)
      i += 1
    }
  }

  /** Ascending (h, id) — the oracle's ORDER BY h, id LIMIT k. */
  def sortedAsc(): Array[(Long, Long, Boolean, Boolean)] = {
    val out = new Array[(Long, Long, Boolean, Boolean)](n)
    var i = 0
    while (i < n) {
      out(i) = (hs(i), ids(i), (flags(i) & 1) != 0, (flags(i) & 2) != 0)
      i += 1
    }
    scala.util.Sorting.stableSort(out,
      (a: (Long, Long, Boolean, Boolean), b: (Long, Long, Boolean, Boolean)) =>
        a._1 < b._1 || (a._1 == b._1 && a._2 < b._2))
    out
  }

  def size: Int = n

  def toBytes: Array[Byte] = {
    val bb = ByteBuffer.allocate(4 + n * 17)
    bb.putInt(n)
    var i = 0
    while (i < n) {
      bb.putLong(hs(i)); bb.putLong(ids(i)); bb.put(flags(i)); i += 1
    }
    bb.array()
  }
}

object KmvBuf {
  def fromBytes(k: Int, bytes: Array[Byte]): KmvBuf = {
    val bb = ByteBuffer.wrap(bytes)
    val m = bb.getInt
    val buf = new KmvBuf(k)
    var i = 0
    // inserts restore the heap invariant; m ≤ k by construction, and the
    // serialized entries are distinct keys so the duplicate probe is moot
    while (i < m) {
      val h = bb.getLong; val id = bb.getLong; val f = bb.get()
      buf.insert(h, id, (f & 1) != 0, (f & 2) != 0)
      i += 1
    }
    buf
  }
}
