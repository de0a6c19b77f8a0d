package graft.functions

import org.apache.spark.sql.Column
import org.apache.spark.sql.catalyst.analysis.TypeCheckResult
import org.apache.spark.sql.catalyst.expressions.{BinaryExpression, Expression, UnaryExpression}
import org.apache.spark.sql.catalyst.expressions.codegen.{CodegenContext, ExprCode}
import org.apache.spark.sql.catalyst.util.ArrayData
import org.apache.spark.sql.graft.CatalystBridge
import org.apache.spark.sql.types.{ArrayType, BinaryType, DataType, DoubleType}

/** SQ8 at rest: pack an `array<double>` embedding into per-vector
  * symmetric int8 — ONE byte per component (vs 8 as double, 4 as float),
  * the store/scan shrink the x4_sq8_topk gate prices.
  *
  * q_i = round(v_i / scale · 127) with scale = max|v_i|, rounding HALF
  * AWAY FROM ZERO — the exact convention of Spark's `round()` and
  * DuckDB's `round()`, so an oracle can re-derive every byte (the gate
  * does). A zero vector (scale = 0) packs to null — quantization is
  * undefined there and the caller filters, same contract as the gate.
  *
  * The companion kernel [[CosineSimSq8]] computes cosine DIRECTLY on two
  * packed vectors with integer accumulators — no unpack, no dequant:
  * cosine is scale-invariant per vector, so the per-vector scales cancel
  * analytically and q·q' / (‖q‖·‖q'‖) IS the dequantized cosine up to
  * the quantization error already priced by the gate. Integer partial
  * sums are exact (dim·127² ≤ 2^53 for any dim below ~10^9) and both
  * engines fold the same integers, so oracle comparison is exact before
  * the final double division.
  */
case class Sq8Pack(child: Expression) extends UnaryExpression {

  override def dataType: DataType = BinaryType
  override def nullable: Boolean = true

  override def checkInputDataTypes(): TypeCheckResult = child.dataType match {
    case ArrayType(DoubleType, _) => TypeCheckResult.TypeCheckSuccess
    case t => TypeCheckResult.TypeCheckFailure(
      s"sq8_pack requires array<double>, got ${t.simpleString}")
  }

  override def nullSafeEval(a: Any): Any = {
    val x = a.asInstanceOf[ArrayData]
    val n = x.numElements()
    var scale = 0.0
    var i = 0
    while (i < n) {
      val v = math.abs(x.getDouble(i))
      // A NaN/Infinity component makes round(v/scale*127) undefined —
      // abs(NaN) > scale is false, so without this check NaN would skip
      // the scale scan and pack to byte 0, silently diverging from the
      // documented SQL formulation. Null instead (zero-vector contract).
      if (!java.lang.Double.isFinite(v)) return null
      if (v > scale) scale = v
      i += 1
    }
    if (scale == 0.0) null
    else {
      val out = new Array[Byte](n)
      i = 0
      while (i < n) {
        val s = x.getDouble(i) / scale * 127.0
        // round half away from zero (Spark round() / DuckDB round()).
        // NOT floor(s + 0.5): the addition itself can round a value just
        // below a .5 boundary UP (e.g. 0.49999999999999994 + 0.5 == 1.0
        // in double), diverging from both engines. a − floor(a) is exact
        // for doubles, so the ≥ 0.5 test is exact.
        val a = math.abs(s)
        var r = math.floor(a)
        if (a - r >= 0.5) r += 1.0
        out(i) = (if (s < 0) -r else r).toByte
        i += 1
      }
      out
    }
  }

  override protected def doGenCode(ctx: CodegenContext, ev: ExprCode): ExprCode =
    nullSafeCodeGen(ctx, ev, a => {
      val i = ctx.freshName("i")
      val n = ctx.freshName("n")
      val sc = ctx.freshName("scale")
      val v = ctx.freshName("v")
      val s = ctx.freshName("s")
      val out = ctx.freshName("out")
      s"""
         |final int $n = $a.numElements();
         |double $sc = 0.0;
         |boolean ${sc}_bad = false;
         |for (int $i = 0; $i < $n; $i++) {
         |  final double $v = java.lang.Math.abs($a.getDouble($i));
         |  // NaN/Infinity → null (see eval); abs(NaN) > sc is false
         |  if (!java.lang.Double.isFinite($v)) { ${sc}_bad = true; break; }
         |  if ($v > $sc) $sc = $v;
         |}
         |if (${sc}_bad || $sc == 0.0) {
         |  ${ev.isNull} = true;
         |} else {
         |  final byte[] $out = new byte[$n];
         |  for (int $i = 0; $i < $n; $i++) {
         |    final double $s = $a.getDouble($i) / $sc * 127.0;
         |    // half away from zero via exact fraction test (see eval)
         |    final double ${s}_abs = java.lang.Math.abs($s);
         |    double ${s}_r = java.lang.Math.floor(${s}_abs);
         |    if (${s}_abs - ${s}_r >= 0.5d) ${s}_r += 1.0d;
         |    $out[$i] = (byte) ($s < 0 ? -${s}_r : ${s}_r);
         |  }
         |  ${ev.value} = $out;
         |}
       """.stripMargin
    })

  override protected def withNewChildInternal(newChild: Expression): Sq8Pack =
    copy(child = newChild)
  override def prettyName: String = "sq8_pack"
}

/** Cosine similarity of two [[Sq8Pack]]-packed vectors — one fused loop
  * over the raw byte buffers with long accumulators; the double division
  * happens once at the end. Null on null/length mismatch, NaN on a
  * zero-norm code vector (can only happen for an all-zero input the
  * pack already nulled, but the kernel stays total).
  */
case class CosineSimSq8(left: Expression, right: Expression)
    extends BinaryExpression {

  override def dataType: DataType = DoubleType
  override def nullable: Boolean = true

  override def checkInputDataTypes(): TypeCheckResult =
    if (left.dataType == BinaryType && right.dataType == BinaryType)
      TypeCheckResult.TypeCheckSuccess
    else TypeCheckResult.TypeCheckFailure(
      s"cosine_sim_sq8 requires binary inputs, got " +
        s"${left.dataType.simpleString} / ${right.dataType.simpleString}")

  override def nullSafeEval(a: Any, b: Any): Any = {
    val x = a.asInstanceOf[Array[Byte]]
    val y = b.asInstanceOf[Array[Byte]]
    if (x.length != y.length) null
    else {
      var dot = 0L; var na = 0L; var nb = 0L
      var i = 0
      while (i < x.length) {
        val xi = x(i).toLong; val yi = y(i).toLong
        dot += xi * yi; na += xi * xi; nb += yi * yi
        i += 1
      }
      dot.toDouble / (math.sqrt(na.toDouble) * math.sqrt(nb.toDouble))
    }
  }

  override protected def doGenCode(ctx: CodegenContext, ev: ExprCode): ExprCode =
    nullSafeCodeGen(ctx, ev, (a, b) => {
      val i = ctx.freshName("i")
      val dot = ctx.freshName("dot")
      val na = ctx.freshName("na")
      val nb = ctx.freshName("nb")
      val xi = ctx.freshName("xi")
      val yi = ctx.freshName("yi")
      s"""
         |if ($a.length != $b.length) {
         |  ${ev.isNull} = true;
         |} else {
         |  long $dot = 0L; long $na = 0L; long $nb = 0L;
         |  for (int $i = 0; $i < $a.length; $i++) {
         |    final long $xi = $a[$i]; final long $yi = $b[$i];
         |    $dot += $xi * $yi; $na += $xi * $xi; $nb += $yi * $yi;
         |  }
         |  ${ev.value} = (double) $dot /
         |    (java.lang.Math.sqrt((double) $na) * java.lang.Math.sqrt((double) $nb));
         |}
       """.stripMargin
    })

  override protected def withNewChildrenInternal(
      newLeft: Expression, newRight: Expression): CosineSimSq8 =
    copy(left = newLeft, right = newRight)
  override def prettyName: String = "cosine_sim_sq8"
}

object Sq8 {
  def sq8_pack(a: Column): Column =
    CatalystBridge.column(Sq8Pack(CatalystBridge.expression(a)))
  def cosine_sim_sq8(a: Column, b: Column): Column =
    CatalystBridge.column(CosineSimSq8(
      CatalystBridge.expression(a), CatalystBridge.expression(b)))
}
