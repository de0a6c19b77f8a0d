package graft.functions

import org.apache.spark.sql.Column
import org.apache.spark.sql.catalyst.analysis.TypeCheckResult
import org.apache.spark.sql.catalyst.expressions.{Expression, UnaryExpression, XxHash64Function}
import org.apache.spark.sql.catalyst.expressions.codegen.CodegenFallback
import org.apache.spark.sql.catalyst.util.ArrayData
import org.apache.spark.sql.graft.CatalystBridge
import org.apache.spark.sql.types._

/** Native 64-bit SimHash of a token array: every token's xxhash64 votes
  * ±1 per bit; the fingerprint sets bit b iff its vote is positive.
  * Bit-identical to the HOF formulation in graft.ext.SimHash (same
  * xxhash64 seed, same >0 threshold), minus its per-token 64-element
  * accumulator-array allocations.
  */
case class SimHash64(child: Expression)
    extends UnaryExpression with CodegenFallback {

  override def dataType: DataType = LongType

  override def checkInputDataTypes(): TypeCheckResult = child.dataType match {
    case ArrayType(StringType, _) => TypeCheckResult.TypeCheckSuccess
    case _ => TypeCheckResult.TypeCheckFailure(
      s"simhash64 requires array<string>, got ${child.dataType.simpleString}")
  }

  override def nullSafeEval(v: Any): Any = {
    val arr = v.asInstanceOf[ArrayData]
    val votes = new Array[Int](64)
    val n = arr.numElements()
    var j = 0
    while (j < n) {
      val s = arr.getUTF8String(j)
      if (s != null) {
        val h = XxHash64Function.hash(s, StringType, 42L)
        var b = 0
        while (b < 64) {
          if (((h >>> b) & 1L) == 1L) votes(b) += 1 else votes(b) -= 1
          b += 1
        }
      }
      j += 1
    }
    var fp = 0L
    var b = 0
    while (b < 64) {
      if (votes(b) > 0) fp |= (1L << b)
      b += 1
    }
    java.lang.Long.valueOf(fp)
  }

  override protected def withNewChildInternal(c: Expression): SimHash64 =
    copy(child = c)
}

object SimHash64 {
  def simhash64(tokens: Column): Column =
    CatalystBridge.column(SimHash64(CatalystBridge.expression(tokens)))
}

/** SimHash over the md5 token hash (le64(md5(token)) = DuckDB's
  * md5_number_upper) — the ORACLE-RECOMPUTABLE variant: the DuckDB gate
  * re-derives every fingerprint from unnested tokens with the same ±1
  * votes and >0 threshold, so `d_simhash` is a hash-exact row instead of
  * rows-only. Vote/threshold logic is identical to SimHash64 above.
  */
case class Md5SimHash64(child: Expression)
    extends UnaryExpression with CodegenFallback {

  override def dataType: DataType = LongType

  override def checkInputDataTypes(): TypeCheckResult = child.dataType match {
    case ArrayType(StringType, _) => TypeCheckResult.TypeCheckSuccess
    case _ => TypeCheckResult.TypeCheckFailure(
      s"md5_simhash64 requires array<string>, got ${child.dataType.simpleString}")
  }

  override def nullSafeEval(v: Any): Any = {
    val arr = v.asInstanceOf[ArrayData]
    val votes = new Array[Int](64)
    val n = arr.numElements()
    var j = 0
    while (j < n) {
      val s = arr.getUTF8String(j)
      if (s != null) {
        val h = Md5Hash64.hashUpper(s)
        var b = 0
        while (b < 64) {
          if (((h >>> b) & 1L) == 1L) votes(b) += 1 else votes(b) -= 1
          b += 1
        }
      }
      j += 1
    }
    var fp = 0L
    var b = 0
    while (b < 64) {
      if (votes(b) > 0) fp |= (1L << b)
      b += 1
    }
    java.lang.Long.valueOf(fp)
  }

  override protected def withNewChildInternal(c: Expression): Md5SimHash64 =
    copy(child = c)
}

object Md5SimHash64 {
  def md5_simhash64(tokens: Column): Column =
    CatalystBridge.column(Md5SimHash64(CatalystBridge.expression(tokens)))
}
