package graft.functions.expressions

import org.apache.spark.sql.SparkSession
import org.apache.spark.sql.catalyst.FunctionIdentifier
import org.apache.spark.sql.catalyst.expressions.codegen.{CodegenContext, ExprCode}
import org.apache.spark.sql.catalyst.expressions.{BinaryExpression, Expression, ExpressionInfo}
import org.apache.spark.sql.catalyst.util.ArrayData
import org.apache.spark.sql.types._
import org.apache.spark.sql.SparkSessionExtensions

/** Native dot product over two ARRAY<FLOAT> / ARRAY<DOUBLE> columns.
  *
  * The lambda form `aggregate(zip_with(a, b, _*_), 0d, _+_)` is a
  * HigherOrderFunction — Spark evaluates it interpretively (one closure call
  * per element, boxed accumulators), and it blocks whole-stage codegen for
  * the surrounding projection. This expression generates a tight primitive
  * loop instead, keeping ANN scoring (|q|·|corpus|·dim multiplies) inside
  * codegen. Registered as SQL function `graft_dot` via [[GraftFunctions.init]]
  * or the [[GraftExtensions]] SparkSessionExtensions entry point
  * (`spark.sql.extensions=graft.functions.expressions.GraftExtensions`).
  *
  * Element nulls are treated as 0 (embedding columns are dense by contract);
  * length mismatch uses the common prefix, matching `zip_with`'s null-pad
  * then multiply-by-null → 0-sum behavior only on equal lengths — callers
  * compare equal-dim vectors.
  */
case class DotProduct(left: Expression, right: Expression)
    extends BinaryExpression {

  override def checkInputDataTypes(): org.apache.spark.sql.catalyst.analysis.TypeCheckResult = {
    val ok = Seq(left, right).forall(_.dataType match {
      case ArrayType(FloatType | DoubleType, _) => true
      case _ => false
    })
    if (ok) org.apache.spark.sql.catalyst.analysis.TypeCheckResult.TypeCheckSuccess
    else org.apache.spark.sql.catalyst.analysis.TypeCheckResult.TypeCheckFailure(
      s"graft_dot requires ARRAY<FLOAT>/ARRAY<DOUBLE> arguments, got " +
        s"${left.dataType.catalogString}, ${right.dataType.catalogString}")
  }

  override def dataType: DataType = DoubleType

  private def elemIsFloat(e: Expression): Boolean =
    e.dataType.asInstanceOf[ArrayType].elementType == FloatType

  override def nullSafeEval(a: Any, b: Any): Any = {
    val x = a.asInstanceOf[ArrayData]
    val y = b.asInstanceOf[ArrayData]
    val n = math.min(x.numElements(), y.numElements())
    val xf = elemIsFloat(left); val yf = elemIsFloat(right)
    var s = 0.0
    var i = 0
    while (i < n) {
      val xv = if (xf) x.getFloat(i).toDouble else x.getDouble(i)
      val yv = if (yf) y.getFloat(i).toDouble else y.getDouble(i)
      s += xv * yv
      i += 1
    }
    s
  }

  override protected def doGenCode(ctx: CodegenContext, ev: ExprCode): ExprCode =
    nullSafeCodeGen(ctx, ev, (a, b) => {
      val i = ctx.freshName("i")
      val n = ctx.freshName("n")
      val s = ctx.freshName("s")
      val getA = if (elemIsFloat(left)) s"(double)$a.getFloat($i)" else s"$a.getDouble($i)"
      val getB = if (elemIsFloat(right)) s"(double)$b.getFloat($i)" else s"$b.getDouble($i)"
      s"""
         |final int $n = java.lang.Math.min($a.numElements(), $b.numElements());
         |double $s = 0.0;
         |for (int $i = 0; $i < $n; $i++) { $s += $getA * $getB; }
         |${ev.value} = $s;
       """.stripMargin
    })

  override protected def withNewChildrenInternal(newLeft: Expression, newRight: Expression): Expression =
    copy(left = newLeft, right = newRight)
}

object GraftFunctions {
  private val fns: Seq[(String, Seq[Expression] => Expression)] = Seq(
    "graft_dot" -> (children => DotProduct(children(0), children(1))),
    "graft_minhash" -> (children => MinHashSignature.fromChildren(children)),
    "graft_shingle_hashes" -> (children => ShingleHashes.fromChildren(children)),
    "graft_ngram_hashes" -> (children => NgramHashes.fromChildren(children)),
    "graft_nfc" -> (children => NfcNormalize.fromChildren(children)),
    "graft_simhash" -> (children => SimHash64.fromChildren(children)),
    "graft_top_gram_fracs" -> (children => TopGramFracs.fromChildren(children)),
    // Spark's OWN runtime-filter predicate (the expression InjectRuntimeFilter
    // pairs with BloomFilterAggregate), surfaced as a callable function:
    // graft_bloom_contains(value BIGINT, bloom BINARY-constant). Codegen'd,
    // deserializes the sketch once per task (its lazy bloomFilter val) — the
    // scan-stage prefilter for Dedup.exactDedupAgainstBloom.
    "graft_bloom_contains" -> (children => {
      require(children.size == 2, "graft_bloom_contains(value, bloom) takes 2 arguments")
      org.apache.spark.sql.catalyst.expressions.BloomFilterMightContain(
        children(1), children(0))
    }))

  /** Idempotently register graft's native SQL functions on a session. */
  def init(spark: SparkSession): Unit = fns.foreach { case (name, builder) =>
    val id = FunctionIdentifier(name)
    if (!spark.sessionState.functionRegistry.functionExists(id)) {
      spark.sessionState.functionRegistry.registerFunction(
        id, new ExpressionInfo(classOf[DotProduct].getCanonicalName, name), builder)
    }
  }
}

/** Cluster entry point: `--conf spark.sql.extensions=graft.functions.expressions.GraftExtensions`. */
class GraftExtensions extends (SparkSessionExtensions => Unit) {
  override def apply(ext: SparkSessionExtensions): Unit = {
    ext.injectFunction((
      FunctionIdentifier("graft_dot"),
      new ExpressionInfo(classOf[DotProduct].getCanonicalName, "graft_dot"),
      children => DotProduct(children(0), children(1))))
    ext.injectFunction((
      FunctionIdentifier("graft_minhash"),
      new ExpressionInfo(classOf[MinHashSignature].getCanonicalName, "graft_minhash"),
      children => MinHashSignature.fromChildren(children)))
    ext.injectFunction((
      FunctionIdentifier("graft_shingle_hashes"),
      new ExpressionInfo(classOf[ShingleHashes].getCanonicalName, "graft_shingle_hashes"),
      children => ShingleHashes.fromChildren(children)))
    ext.injectFunction((
      FunctionIdentifier("graft_ngram_hashes"),
      new ExpressionInfo(classOf[NgramHashes].getCanonicalName, "graft_ngram_hashes"),
      children => NgramHashes.fromChildren(children)))
    ext.injectFunction((
      FunctionIdentifier("graft_nfc"),
      new ExpressionInfo(classOf[NfcNormalize].getCanonicalName, "graft_nfc"),
      children => NfcNormalize.fromChildren(children)))
    ext.injectFunction((
      FunctionIdentifier("graft_simhash"),
      new ExpressionInfo(classOf[SimHash64].getCanonicalName, "graft_simhash"),
      children => SimHash64.fromChildren(children)))
    ext.injectFunction((
      FunctionIdentifier("graft_top_gram_fracs"),
      new ExpressionInfo(classOf[TopGramFracs].getCanonicalName, "graft_top_gram_fracs"),
      children => TopGramFracs.fromChildren(children)))
    ext.injectFunction((
      FunctionIdentifier("graft_bloom_contains"),
      new ExpressionInfo(
        "org.apache.spark.sql.catalyst.expressions.BloomFilterMightContain",
        "graft_bloom_contains"),
      children => org.apache.spark.sql.catalyst.expressions.BloomFilterMightContain(
        children(1), children(0))))
  }
}
