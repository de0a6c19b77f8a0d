package graft.plans

import graft.functions.{CosineSim, Md5Le64, Md5MinHashSignature, Md5SimHash64, MinHashSignature, SimHash64}
import org.apache.spark.sql.SparkSessionExtensions
import org.apache.spark.sql.catalyst.FunctionIdentifier
import org.apache.spark.sql.catalyst.expressions._
import org.apache.spark.sql.catalyst.plans.logical.LogicalPlan
import org.apache.spark.sql.catalyst.rules.Rule
import org.apache.spark.sql.types.{ArrayType, DoubleType, IntegerType}

/** Engine extensions, registered per session via
  * `SparkSession.builder.withExtensions(new GraftExtensions)`
  * (SURVEY.md §7.2 — the SparkSessionExtensions integration point):
  *
  *  - SQL surface for the native expressions: `cosine_sim(a, b)`,
  *    `minhash_signature(shingles, k)`, `simhash64(tokens)` become
  *    callable from `spark.sql` exactly like built-ins, so SQL-only
  *    users get the codegen kernels, not just the Column API.
  *  - [[RewriteHofCosine]], an optimizer rule that recognizes the
  *    canonical higher-order-function cosine formulation
  *    (`aggregate(zip_with(a,b,*),0.0,+) / (sqrt(dot(a,a))*sqrt(dot(b,b)))`)
  *    and replaces it with the fused native [[CosineSim]] — user queries
  *    written the portable-SQL way silently get the fast kernel.
  */
class GraftExtensions extends (SparkSessionExtensions => Unit) {
  override def apply(ext: SparkSessionExtensions): Unit = {
    ext.injectFunction((
      new FunctionIdentifier("cosine_sim"),
      new ExpressionInfo(classOf[CosineSim].getName, "cosine_sim"),
      (args: Seq[Expression]) => {
        require(args.length == 2, "cosine_sim(a, b) takes two array<double>")
        CosineSim(args.head, args(1))
      }))
    ext.injectFunction((
      new FunctionIdentifier("minhash_signature"),
      new ExpressionInfo(classOf[MinHashSignature].getName, "minhash_signature"),
      (args: Seq[Expression]) => args match {
        case Seq(sh, Literal(k: Int, IntegerType)) => MinHashSignature(sh, k)
        case _ => throw new IllegalArgumentException(
          "minhash_signature(shingles, k) takes array<string> and an int literal")
      }))
    ext.injectFunction((
      new FunctionIdentifier("simhash64"),
      new ExpressionInfo(classOf[SimHash64].getName, "simhash64"),
      (args: Seq[Expression]) => {
        require(args.length == 1, "simhash64(tokens) takes one array<string>")
        SimHash64(args.head)
      }))
    // md5 (oracle-recomputable) family — the PRODUCT path of MinHashDedup /
    // SimHash, registered so SQL callers get the SAME signatures and
    // fingerprints candidatePairs/withSimHash compute (the xx-family
    // functions above stay registered under their own names).
    ext.injectFunction((
      new FunctionIdentifier("md5_minhash_signature"),
      new ExpressionInfo(classOf[Md5MinHashSignature].getName, "md5_minhash_signature"),
      (args: Seq[Expression]) => args match {
        case Seq(sh, Literal(k: Int, IntegerType)) => Md5MinHashSignature(sh, k)
        case _ => throw new IllegalArgumentException(
          "md5_minhash_signature(shingles, k) takes array<string> and an int literal")
      }))
    ext.injectFunction((
      new FunctionIdentifier("md5_simhash64"),
      new ExpressionInfo(classOf[Md5SimHash64].getName, "md5_simhash64"),
      (args: Seq[Expression]) => {
        require(args.length == 1, "md5_simhash64(tokens) takes one array<string>")
        Md5SimHash64(args.head)
      }))
    ext.injectFunction((
      new FunctionIdentifier("md5_le64"),
      new ExpressionInfo(classOf[Md5Le64].getName, "md5_le64"),
      (args: Seq[Expression]) => {
        require(args.length == 1, "md5_le64(s) takes one string")
        Md5Le64(args.head)
      }))
    // BPE token count under the engine's fixed trained merge table — SQL
    // callers budget in the same subword unit the Column API uses
    ext.injectFunction((
      new FunctionIdentifier("bpe_token_count"),
      new ExpressionInfo(classOf[graft.functions.BpeTokenCount].getName,
        "bpe_token_count"),
      (args: Seq[Expression]) => {
        require(args.length == 1, "bpe_token_count(text) takes one string")
        graft.functions.BpeTokenCount(args.head,
          graft.ext.Bpe.FixedMerges.map(m => (m.l, m.r)))
      }))
    // SQ8 at-rest pair: pack embeddings to per-vector symmetric int8
    // (one byte per component) and compute cosine directly on the
    // packed bytes with integer accumulators (scales cancel — no
    // dequant, no unpack)
    ext.injectFunction((
      new FunctionIdentifier("sq8_pack"),
      new ExpressionInfo(classOf[graft.functions.Sq8Pack].getName, "sq8_pack"),
      (args: Seq[Expression]) => {
        require(args.length == 1, "sq8_pack(v) takes one array<double>")
        graft.functions.Sq8Pack(args.head)
      }))
    ext.injectFunction((
      new FunctionIdentifier("cosine_sim_sq8"),
      new ExpressionInfo(classOf[graft.functions.CosineSimSq8].getName,
        "cosine_sim_sq8"),
      (args: Seq[Expression]) => {
        require(args.length == 2, "cosine_sim_sq8(a, b) takes two binary")
        graft.functions.CosineSimSq8(args.head, args(1))
      }))
    // bounded-heap grouped top-k: the map-side-combined alternative to
    // the row_number window plan (exchange O(groups×k), not O(rows))
    ext.injectFunction((
      new FunctionIdentifier("graft_topk"),
      new ExpressionInfo(classOf[graft.functions.TopKPairs].getName,
        "graft_topk"),
      (args: Seq[Expression]) => args match {
        case Seq(s, i, Literal(k: Int, IntegerType)) =>
          graft.functions.TopKPairs(s, i, k).toAggregateExpression()
        case _ => throw new IllegalArgumentException(
          "graft_topk(score, id, k) takes double, bigint and an int literal")
      }))
    // bounded-heap one-pass KMV sketch with membership flags: the
    // map-side-combined alternative to distinct + TakeOrdered-k
    // (exchange O(partitions×k), no distinct key exchange anywhere)
    ext.injectFunction((
      new FunctionIdentifier("graft_kmv"),
      new ExpressionInfo(classOf[graft.functions.KmvSketch].getName,
        "graft_kmv"),
      (args: Seq[Expression]) => args match {
        case Seq(h, i, a, b, Literal(k: Int, IntegerType)) =>
          graft.functions.KmvSketch(h, i, a, b, k).toAggregateExpression()
        case _ => throw new IllegalArgumentException(
          "graft_kmv(h, id, in_a, in_b, k) takes bigint, bigint, boolean, " +
            "boolean and an int literal")
      }))
    ext.injectOptimizerRule(_ => RewriteHofCosine)
  }
}

/** Rewrite the canonical HOF cosine tree to the native fused kernel.
  *
  * Semantics are identical by construction (CosineSim mirrors the HOF
  * fold: null on null/length-mismatch inputs — zip_with pads with null and
  * null poisons the fold — NaN on zero norms), and `CosineSimSpec`
  * ("codegen expression is bit-identical to the HOF formulation") pins
  * bit-equality, so the substitution is safe wherever the shape matches.
  * Guarded to array<double> inputs — other element types keep the HOF form.
  */
object RewriteHofCosine extends Rule[LogicalPlan] {

  /** aggregate(zip_with(a, b, (x, y) -> x * y), 0.0, (acc, v) -> acc + v)
    * with an IDENTITY finish lambda. The lambda-variable identities are
    * checked, not just their types: (x, y) -> x * x (sum of squares) or a
    * non-identity finish like acc -> acc * 2 must NOT match — a loose
    * match would silently rewrite a different computation to CosineSim.
    */
  private object Dot {
    // (x, y) -> x * y, with BOTH bound variables used exactly (x * x — a
    // sum of squares — has a one-element exprId set and is rejected)
    private def isDotMul(f: Expression): Boolean = f match {
      case LambdaFunction(
            Multiply(l: NamedLambdaVariable, r: NamedLambdaVariable, _),
            Seq(x: NamedLambdaVariable, y: NamedLambdaVariable), _) =>
        Set(l.exprId, r.exprId) == Set(x.exprId, y.exprId)
      case _ => false
    }
    // (acc, v) -> acc + v, both variables used
    private def isSumAdd(f: Expression): Boolean = f match {
      case LambdaFunction(
            Add(l: NamedLambdaVariable, r: NamedLambdaVariable, _),
            Seq(x: NamedLambdaVariable, y: NamedLambdaVariable), _) =>
        Set(l.exprId, r.exprId) == Set(x.exprId, y.exprId)
      case _ => false
    }
    // acc -> acc (a non-identity finish would be silently dropped otherwise)
    private def isIdentity(f: Expression): Boolean = f match {
      case LambdaFunction(b: NamedLambdaVariable, Seq(v: NamedLambdaVariable), _) =>
        b.exprId == v.exprId
      case _ => false
    }

    def unapply(e: Expression): Option[(Expression, Expression)] = e match {
      case ArrayAggregate(ZipWith(a, b, mul), Literal(zero, DoubleType), add, finish)
          if zero == 0.0 && isDotMul(mul) && isSumAdd(add) && isIdentity(finish) =>
        Some((a, b))
      case _ => None
    }
  }

  private def isDoubleArray(e: Expression): Boolean = e.dataType match {
    case ArrayType(DoubleType, _) => true
    case _ => false
  }

  override def apply(plan: LogicalPlan): LogicalPlan =
    plan.transformAllExpressions {
      case Divide(
            Dot(a, b),
            Multiply(Sqrt(Dot(a2, a3)), Sqrt(Dot(b2, b3)), _), _)
          if isDoubleArray(a) && isDoubleArray(b) &&
            a2.semanticEquals(a) && a3.semanticEquals(a) &&
            b2.semanticEquals(b) && b3.semanticEquals(b) =>
        CosineSim(a, b)
    }
}
