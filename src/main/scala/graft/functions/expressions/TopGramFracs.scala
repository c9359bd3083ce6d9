package graft.functions.expressions

import org.apache.spark.sql.catalyst.InternalRow
import org.apache.spark.sql.catalyst.expressions.codegen.{CodegenContext, ExprCode}
import org.apache.spark.sql.catalyst.expressions.{Expression, GenericInternalRow, UnaryExpression}
import org.apache.spark.sql.types._
import org.apache.spark.unsafe.types.UTF8String

/** Native most-frequent token / word-bigram mass of a document in ONE
  * pass per row, inside codegen — the Gopher-rule repetition features'
  * heavy half. Bit-for-bit equal (parity-pinned, and hash-checked by the
  * t11 oracle through [[graft.functions.TextAnalysis.repetitionFeatures]])
  * to the relational formulation `explode(grams) → groupBy(id, gram) →
  * max(c)/sum(c)`, which materializes |docs|·|grams| rows through an
  * exchange on id; this is a narrow projection. Semantics replicated
  * exactly:
  *
  *  - tokens = `filter(split(lower(trim(text)), "\\s+"), len > 0)` (the
  *    corpus tokenization: SQL trim strips 0x20 only; zero-length tokens
  *    from leading `\t`/`\n` are dropped after the split);
  *  - top_token_frac = max token multiplicity / token instances (0.0 when
  *    no tokens);
  *  - bigrams keep MULTIPLICITY, adjacent tokens joined by `\u0001`;
  *    top_bigram_frac = max bigram multiplicity / (n_tokens − 1) (0.0
  *    when fewer than 2 tokens).
  *
  * Returns STRUCT(top_token_frac DOUBLE, top_bigram_frac DOUBLE); null
  * text ⇒ null struct (the caller coalesces to 0.0, as the relational
  * left-join + coalesce did).
  */
case class TopGramFracs(child: Expression) extends UnaryExpression {

  override def checkInputDataTypes(): org.apache.spark.sql.catalyst.analysis.TypeCheckResult =
    if (child.dataType == StringType)
      org.apache.spark.sql.catalyst.analysis.TypeCheckResult.TypeCheckSuccess
    else org.apache.spark.sql.catalyst.analysis.TypeCheckResult.TypeCheckFailure(
      s"graft_top_gram_fracs requires STRING, got ${child.dataType.catalogString}")

  override def dataType: DataType = StructType(Seq(
    StructField("top_token_frac", DoubleType, nullable = false),
    StructField("top_bigram_frac", DoubleType, nullable = false)))

  override def nullSafeEval(t: Any): Any =
    TopGramFracs.compute(t.asInstanceOf[UTF8String])

  override protected def doGenCode(ctx: CodegenContext, ev: ExprCode): ExprCode =
    defineCodeGen(ctx, ev, c => s"graft.functions.expressions.TopGramFracs.compute($c)")

  override protected def withNewChildInternal(newChild: Expression): Expression =
    copy(child = newChild)
}

object TopGramFracs {
  private val WS = UTF8String.fromString("\\s+")
  private val SEP = UTF8String.fromString("\u0001")

  def compute(text: UTF8String): InternalRow = {
    // = filter(split(lower(trim(text)), "\s+"), len > 0): SQL trim strips
    // only 0x20, so split can still emit empties (leading \t) — drop them
    val raw = text.toLowerCase.trim().split(WS, -1)
    var n = 0
    val toks = new Array[UTF8String](raw.length)
    var i = 0
    while (i < raw.length) {
      if (raw(i).numBytes() > 0) { toks(n) = raw(i); n += 1 }
      i += 1
    }
    val tokFrac =
      if (n == 0) 0.0
      else {
        val counts = new java.util.HashMap[UTF8String, Int](n * 2)
        var best = 0
        var j = 0
        while (j < n) {
          val c = counts.merge(toks(j), 1, (a, b) => a + b)
          if (c > best) best = c
          j += 1
        }
        best.toDouble / n
      }
    val biFrac =
      if (n < 2) 0.0
      else {
        val counts = new java.util.HashMap[UTF8String, Int](n * 2)
        var best = 0
        var j = 0
        while (j < n - 1) {
          val g = UTF8String.concatWs(SEP, toks(j), toks(j + 1))
          val c = counts.merge(g, 1, (a, b) => a + b)
          if (c > best) best = c
          j += 1
        }
        best.toDouble / (n - 1)
      }
    new GenericInternalRow(Array[Any](tokFrac, biFrac))
  }

  private[expressions] def fromChildren(children: Seq[Expression]): Expression = {
    require(children.size == 1, "graft_top_gram_fracs(text) takes 1 argument")
    TopGramFracs(children(0))
  }
}
