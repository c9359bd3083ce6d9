package graft.functions.expressions

import org.apache.spark.sql.catalyst.expressions.codegen.{CodegenContext, ExprCode}
import org.apache.spark.sql.catalyst.expressions.{Expression, UnaryExpression, XXH64}
import org.apache.spark.sql.types._
import org.apache.spark.unsafe.types.UTF8String

/** Native 64-bit SimHash of a document's whitespace tokens in ONE pass per
  * row, inside whole-stage codegen.
  *
  * Bit-for-bit equal (parity-pinned) to the relational formulation in
  * [[graft.functions.Dedup.simHash]] — `explode(split(lower(text), "\\s+"))
  * → xxhash64(tok) → 64 ±1 bit-sums → OR of 2^b where sum > 0` — but with
  * NO explode and NO shuffle: the relational form materializes
  * |docs|·|tokens| rows and runs a 64-column aggregate over them (an
  * exchange on doc id, the exact shape [[MinHashSignature]] replaced for
  * MinHash). Semantics replicated exactly:
  *
  *  - tokens = Spark `split(lower(text), "\\s+")` (limit −1: leading
  *    whitespace yields an empty first token, empty text yields one ""
  *    token — both hash like any token, as in the relational form);
  *  - token hash = Spark `xxhash64(tok)` (XXH64, seed 42);
  *  - bit b of the signature is set iff strictly more token instances
  *    have bit b set than clear (ties → clear, matching `sum > 0`).
  */
case class SimHash64(child: Expression) extends UnaryExpression {

  override def checkInputDataTypes(): org.apache.spark.sql.catalyst.analysis.TypeCheckResult =
    if (child.dataType == StringType)
      org.apache.spark.sql.catalyst.analysis.TypeCheckResult.TypeCheckSuccess
    else org.apache.spark.sql.catalyst.analysis.TypeCheckResult.TypeCheckFailure(
      s"graft_simhash requires STRING, got ${child.dataType.catalogString}")

  override def dataType: DataType = LongType

  override def nullSafeEval(t: Any): Any =
    SimHash64.compute(t.asInstanceOf[UTF8String])

  override protected def doGenCode(ctx: CodegenContext, ev: ExprCode): ExprCode =
    defineCodeGen(ctx, ev, c => s"graft.functions.expressions.SimHash64.compute($c)")

  override protected def withNewChildInternal(newChild: Expression): Expression =
    copy(child = newChild)
}

object SimHash64 {
  private val WS = UTF8String.fromString("\\s+")

  def compute(text: UTF8String): Long = {
    val toks = text.toLowerCase.split(WS, -1) // = Spark split(lower(text), "\s+")
    val counts = new Array[Int](64)
    var i = 0
    while (i < toks.length) {
      val t = toks(i)
      val h = XXH64.hashUnsafeBytes(t.getBaseObject, t.getBaseOffset, t.numBytes, 42L)
      var b = 0
      while (b < 64) {
        if (((h >>> b) & 1L) == 1L) counts(b) += 1 else counts(b) -= 1
        b += 1
      }
      i += 1
    }
    var sig = 0L
    var b = 0
    while (b < 64) { if (counts(b) > 0) sig |= 1L << b; b += 1 }
    sig
  }

  private[expressions] def fromChildren(children: Seq[Expression]): Expression = {
    require(children.size == 1, "graft_simhash(text) takes 1 argument")
    SimHash64(children(0))
  }
}
