package graft.functions

import graft.SparkTestSession
import org.apache.spark.sql.functions._
import org.scalatest.funsuite.AnyFunSuite

/** Pins for the SQ8 at-rest pair (Sq8Pack / CosineSimSq8):
  *  - BYTE PARITY: sq8_pack's bytes equal the SQL formulation
  *    round(x/scale·127) byte-for-byte, INCLUDING exact .5 inputs (the
  *    half-away-from-zero branch: +63.5 → 64, −63.5 → −64) — the claim
  *    the oracle's DuckDB round() rests on;
  *  - KERNEL ≡ DEQUANT: cosine on packed bytes equals cosine_sim over
  *    the integer codes as doubles bit-for-bit (the scale-cancellation
  *    argument, executed);
  *  - EDGES: zero vector packs to null; length mismatch → null cosine;
  *    SQL surface matches the Column API.
  */
class Sq8Spec extends AnyFunSuite {
  lazy val spark = SparkTestSession.spark
  import spark.implicits._

  // (id+1)·i keeps every vector nonzero — id = 0 under sin(id·i) would be
  // the all-zero vector, which ANSI-throws in the SQL round formulation
  // (x / 0) and packs to null
  private lazy val vecs = spark.range(500)
    .select($"id".as("vid"),
      transform(sequence(lit(1), lit(16)),
        i => (sin(($"id" + 1) * i.cast("double")) * 3.7).cast("double"))
        .as("v"))
    .localCheckpoint(true)

  test("packed bytes equal the round(x/scale*127) SQL formulation") {
    val viaSql = vecs.select($"vid",
      transform($"v",
        x => round(x / array_max(transform($"v", y => abs(y))) * 127, 0)
          .cast("int")).as("qe"))
      .collect().map(r => r.getLong(0) -> r.getSeq[Int](1)).toMap
    val viaPack = vecs.select($"vid", Sq8.sq8_pack($"v").as("qp"))
      .collect()
      .map(r => r.getLong(0) -> r.getAs[Array[Byte]](1).map(_.toInt).toSeq)
      .toMap
    assert(viaSql == viaPack, "sq8_pack diverged from the SQL quantization")
  }

  test("half-away-from-zero on exact .5 inputs") {
    // v = [1.0, 0.5, -0.5] → scale 1 → [127, 63.5, -63.5] → [127, 64, -64]
    val df = Seq(Tuple1(Seq(1.0, 0.5, -0.5))).toDF("v")
    val bytes = df.select(Sq8.sq8_pack($"v")).collect().head.getAs[Array[Byte]](0)
    assert(bytes.toSeq == Seq[Byte](127, 64, -64))
  }

  test("kernel on packed bytes ≡ cosine_sim on integer codes as doubles") {
    // the double-code arrays come from the SQL quantization (proven
    // byte-identical to the pack above), so this pins the KERNEL's
    // integer accumulation against the double fold on the same codes
    def codes = vecs.select($"vid",
      transform($"v",
        x => round(x / array_max(transform($"v", y => abs(y))) * 127, 0))
        .as("qd"))
    val q = vecs.filter($"vid" === 0).select(Sq8.sq8_pack($"v").as("qqz"))
    val qd = codes.filter($"vid" === 0).select($"qd".as("qqd"))
    val viaKernel = vecs.crossJoin(broadcast(q))
      .select($"vid", Sq8.cosine_sim_sq8(Sq8.sq8_pack($"v"), $"qqz").as("c"))
      .orderBy($"vid").collect().map(_.getDouble(1)).toSeq
    val viaDouble = codes.crossJoin(broadcast(qd))
      .select($"vid", CosineSim.cosine_sim($"qd", $"qqd").as("c"))
      .orderBy($"vid").collect().map(_.getDouble(1)).toSeq
    assert(viaKernel == viaDouble,
      "integer kernel diverged from the double formulation")
  }

  test("zero vector packs to null; length mismatch gives null cosine") {
    val z = Seq(Tuple1(Seq(0.0, 0.0))).toDF("v")
      .select(Sq8.sq8_pack($"v").as("p"))
    assert(z.filter($"p".isNull).count() == 1)
    val mismatch = Seq((Seq(1.0, 2.0), Seq(1.0, 2.0, 3.0))).toDF("a", "b")
      .select(Sq8.cosine_sim_sq8(Sq8.sq8_pack($"a"), Sq8.sq8_pack($"b"))
        .as("c"))
    assert(mismatch.filter($"c".isNull).count() == 1)
  }

  test("NaN / Infinity components pack to null (zero-vector contract)") {
    // abs(NaN) > scale is false, so without the finiteness check a NaN
    // component would silently pack to byte 0 instead of following the
    // documented round(x/scale*127) formulation; null is the same
    // undefined-quantization contract the zero vector gets
    val df = Seq(
      Tuple1(Seq(1.0, Double.NaN, 2.0)),
      Tuple1(Seq(1.0, Double.PositiveInfinity)),
      Tuple1(Seq(Double.NegativeInfinity, 1.0)),
      Tuple1(Seq(1.0, 2.0))).toDF("v")
      .select(Sq8.sq8_pack($"v").as("p"))
    assert(df.filter($"p".isNull).count() == 3)
    assert(df.filter($"p".isNotNull).count() == 1)
  }

  test("SQL surface matches the Column API") {
    vecs.createOrReplaceTempView("sq8_vecs")
    val viaSql = spark.sql("""
      SELECT vid, cosine_sim_sq8(sq8_pack(v),
        (SELECT FIRST(sq8_pack(v)) FROM sq8_vecs WHERE vid = 0)) AS c
      FROM sq8_vecs ORDER BY vid""").collect().map(_.toString).toSeq
    val q = vecs.filter($"vid" === 0).select(Sq8.sq8_pack($"v").as("qqz"))
    val viaCol = vecs.crossJoin(broadcast(q))
      .select($"vid", Sq8.cosine_sim_sq8(Sq8.sq8_pack($"v"), $"qqz").as("c"))
      .orderBy($"vid").collect().map(_.toString).toSeq
    assert(viaSql == viaCol)
  }
}
