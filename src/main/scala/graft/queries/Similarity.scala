package graft.queries

import graft.{QueryDef, Tables}
import org.apache.spark.sql.{Column, DataFrame, SparkSession}
import org.apache.spark.sql.expressions.Window
import org.apache.spark.sql.functions._

/** Similarity-search extension surface (SURVEY.md §2.11 X4): cosine over
  * `array<float>` embedding columns.
  *
  * - Brute-force cosine is the correctness baseline: pure higher-order
  *   functions (`zip_with` + `aggregate`), fully codegen'd, no UDF.
  * - The scale path is LSH bucketing (random hyperplane signatures) so the
  *   candidate join is equi on bucket signature instead of a cross join —
  *   at 100 TB the cross join is infeasible, the LSH join shuffles only
  *   bucket-colliding pairs.
  *
  * Cosines are rounded to 4 decimals *before* ordering on both engine and
  * oracle sides so top-k tie-breaks (by vec_id) are cross-engine stable.
  */
object Similarity {

  /** dot(a, b) over two double arrays via fold — sequential, deterministic. */
  private def dot(a: Column, b: Column): Column =
    aggregate(zip_with(a, b, (x, y) => x * y), lit(0.0), (acc, v) => acc + v)

  private def asDouble(c: Column): Column = transform(c, x => x.cast("double"))

  /** cosine(a, b) for double arrays — native codegen Expression
    * (graft.functions.CosineSim): one fused loop, no intermediate arrays.
    * Bit-identical to the HOF form below (same sequential accumulation).
    */
  def cosine(a: Column, b: Column): Column =
    graft.functions.CosineSim.cosine_sim(a, b)

  /** Reference HOF formulation — kept for the equivalence spec and as the
    * fallback if an engine build lacks the custom expression. */
  def cosineHof(a: Column, b: Column): Column =
    dot(a, b) / (sqrt(dot(a, a)) * sqrt(dot(b, b)))

  /** The embeddings table with the vector pre-cast to array<double>. */
  private def emb(s: SparkSession, d: String): DataFrame =
    Tables.embeddings(s, d)
      .select(col("vec_id"), col("label"), asDouble(col("embedding")).as("ev"))

  /** Random-hyperplane LSH signature: `nBits` sign bits of dot(v, h_i) packed
    * into a long. Hyperplanes are pseudo-random but seed-deterministic,
    * generated driver-side (tiny: nBits × dim doubles, broadcast as literals).
    */
  def lshSignature(v: Column, planes: Array[Array[Double]]): Column = {
    val bits = planes.zipWithIndex.map { case (p, i) =>
      val lit_p = array(p.map(lit): _*)
      when(dot(v, lit_p) >= 0, shiftleft(lit(1L), i)).otherwise(lit(0L))
    }
    bits.reduce(_ + _)
  }

  /** Deterministic pseudo-random hyperplanes (xorshift-ish LCG, fixed seed). */
  def hyperplanes(nBits: Int, dim: Int, seed: Long = 42L): Array[Array[Double]] = {
    var state = seed
    def next(): Double = {
      state = state * 6364136223846793005L + 1442695040888963407L
      (state >>> 11).toDouble / (1L << 53).toDouble - 0.5
    }
    Array.fill(nBits)(Array.fill(dim)(next()))
  }

  val defs: Seq[QueryDef] = Seq(

    // ---- X4: brute-force cosine top-k against one query vector -------------
    QueryDef(
      "x4_cosine_topk",
      (s, d) => {
        import s.implicits._
        val e = emb(s, d)
        // 1-row dimension lookup for the query vector — joined, not collected,
        // so the same plan works when the "query set" is itself a table.
        val q = e.filter($"vec_id" === 0).select($"ev".as("qv"))
        e.crossJoin(broadcast(q))
          .select($"vec_id", round(cosine($"ev", $"qv"), 4).as("cos"))
          .orderBy($"cos".desc, $"vec_id")
          .limit(10)
      },
      Some("""WITH q AS (SELECT embedding::DOUBLE[] AS qv FROM embeddings WHERE vec_id = 0)
        SELECT vec_id,
          round(list_cosine_similarity(embedding::DOUBLE[], qv), 4) AS cos
        FROM embeddings, q
        ORDER BY cos DESC, vec_id LIMIT 10"""),
      bench = true),

    // ---- X4: brute-force kNN join (each of 20 queries → top 3 neighbors) ---
    QueryDef(
      "x4_knn_join",
      (s, d) => {
        import s.implicits._
        val e = emb(s, d)
        val queries = e.filter($"vec_id" < 20)
          .select($"vec_id".as("qid"), $"ev".as("qv"))
        val w = Window.partitionBy($"qid").orderBy($"cos".desc, $"vec_id")
        e.join(broadcast(queries), $"vec_id" =!= $"qid")
          .select($"qid", $"vec_id", round(cosine($"ev", $"qv"), 4).as("cos"))
          .withColumn("rn", row_number().over(w))
          .filter($"rn" <= 3)
          .select($"qid", $"rn", $"vec_id", $"cos")
          .orderBy($"qid", $"rn")
      },
      Some("""SELECT qid, rn, vec_id, cos FROM (
        SELECT q.vec_id AS qid, e.vec_id AS vec_id,
          round(list_cosine_similarity(e.embedding::DOUBLE[], q.embedding::DOUBLE[]), 4) AS cos,
          ROW_NUMBER() OVER (PARTITION BY q.vec_id
            ORDER BY round(list_cosine_similarity(e.embedding::DOUBLE[], q.embedding::DOUBLE[]), 4) DESC,
                     e.vec_id) AS rn
        FROM embeddings e, embeddings q
        WHERE q.vec_id < 20 AND e.vec_id <> q.vec_id)
        WHERE rn <= 3 ORDER BY qid, rn""")),

    // ---- X4 scale path: LSH-bucketed candidate pairs (rows-only check) -----
    // Pairs that collide on a 16-bit random-hyperplane signature, scored by
    // exact cosine. At scale this is an equi-join shuffle on `sig`, not a
    // cross join. Deterministic: fixed-seed hyperplanes.
    QueryDef(
      "x4_ann_lsh_pairs",
      (s, d) => {
        import s.implicits._
        val planes = hyperplanes(nBits = 16, dim = 64)
        val e = emb(s, d)
          .withColumn("sig", lshSignature($"ev", planes))
        val a = e.select($"vec_id".as("a"), $"ev".as("av"), $"sig")
        val b = e.select($"vec_id".as("b"), $"ev".as("bv"), $"sig")
        a.join(b, Seq("sig")).filter($"a" < $"b")
          .select($"a", $"b", round(cosine($"av", $"bv"), 4).as("cos"))
          .orderBy($"cos".desc, $"a", $"b")
          .limit(100)
      },
      None),

    // ---- X4 scale path 2: IVF partition-pruned ANN (rows-only) -------------
    QueryDef(
      "x4_ann_ivf",
      (s, d) => {
        import s.implicits._
        val e = emb(s, d)
        val index = graft.ext.IvfAnn.build(e, nCentroids = 8)
        val qv = e.filter($"vec_id" === 0).head().getSeq[Double](2)
        graft.ext.IvfAnn.search(index, qv, nProbe = 3, k = 10)
      },
      None),

    // ---- Embedding near-dup pairs over a fixed subset (oracle-checked) -----
    QueryDef(
      "emb_neardup_pairs",
      (s, d) => {
        import s.implicits._
        val sub = emb(s, d).filter($"vec_id" < 200)
        val a = sub.select($"vec_id".as("a"), $"ev".as("av"))
        val b = sub.select($"vec_id".as("b"), $"ev".as("bv"))
        a.join(broadcast(b), $"a" < $"b")
          .select($"a", $"b", round(cosine($"av", $"bv"), 4).as("cos"))
          .filter($"cos" >= 0.25)
          .orderBy($"cos".desc, $"a", $"b")
      },
      Some("""SELECT a.vec_id AS a, b.vec_id AS b,
          round(list_cosine_similarity(a.embedding::DOUBLE[], b.embedding::DOUBLE[]), 4) AS cos
        FROM embeddings a, embeddings b
        WHERE a.vec_id < 200 AND b.vec_id < 200 AND a.vec_id < b.vec_id
          AND round(list_cosine_similarity(a.embedding::DOUBLE[], b.embedding::DOUBLE[]), 4) >= 0.25
        ORDER BY cos DESC, a, b"""))
  )
}
