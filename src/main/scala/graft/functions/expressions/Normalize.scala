package graft.functions.expressions

import org.apache.spark.sql.catalyst.analysis.TypeCheckResult
import org.apache.spark.sql.catalyst.expressions.codegen.{CodegenContext, ExprCode}
import org.apache.spark.sql.catalyst.expressions.{Expression, UnaryExpression}
import org.apache.spark.sql.types.{DataType, StringType}
import org.apache.spark.unsafe.types.UTF8String

/** Native Unicode NFC normalization (canonical composition): `é` as
  * `e + U+0301` and `é` as `U+00E9` become one byte sequence, so equality,
  * hashing, dedup signatures and join keys see one document where a web
  * corpus sees two. Spark has no built-in for this (`lower`/`trim` don't
  * touch combining marks); a Scala UDF would fall out of whole-stage
  * codegen — this is the custom-`Expression` path (SURVEY §1 preference
  * order), registered as SQL function `graft_nfc` via
  * [[GraftFunctions.init]].
  *
  * Cost shape: pure-ASCII text (the overwhelming hot path in practice)
  * never leaves UTF8String — `numBytes == numChars` proves ASCII, and
  * ASCII is always NFC, so the input pointer is returned as-is with zero
  * allocation. Only multi-byte strings pay the String round-trip, and of
  * those, already-normalized ones (detected via `Normalizer.isNormalized`,
  * a scan without allocation) skip the rewrite.
  *
  * Oracle cross-check: DuckDB's `nfc_normalize` (gate t12) — both sides
  * implement Unicode TR#15 NFC, so outputs are byte-identical. Null in,
  * null out (`nullSafeEval`).
  */
case class NfcNormalize(child: Expression) extends UnaryExpression {

  override def checkInputDataTypes(): TypeCheckResult =
    if (child.dataType == StringType) TypeCheckResult.TypeCheckSuccess
    else TypeCheckResult.TypeCheckFailure(
      s"graft_nfc requires STRING, got ${child.dataType.catalogString}")

  override def dataType: DataType = StringType

  override def nullSafeEval(t: Any): Any =
    NfcNormalize.compute(t.asInstanceOf[UTF8String])

  override protected def doGenCode(ctx: CodegenContext, ev: ExprCode): ExprCode =
    defineCodeGen(ctx, ev, c => s"graft.functions.expressions.NfcNormalize.compute($c)")

  override protected def withNewChildInternal(newChild: Expression): Expression =
    copy(child = newChild)
}

object NfcNormalize {
  /** Static helper the generated code calls. */
  def compute(text: UTF8String): UTF8String = {
    // ASCII fast path: one UTF-8 byte per char ⇒ ASCII ⇒ already NFC
    if (text.numBytes() == text.numChars()) return text
    val s = text.toString
    if (java.text.Normalizer.isNormalized(s, java.text.Normalizer.Form.NFC)) text
    else UTF8String.fromString(java.text.Normalizer.normalize(s, java.text.Normalizer.Form.NFC))
  }

  def fromChildren(children: Seq[Expression]): Expression = {
    require(children.size == 1, "graft_nfc(text) takes 1 argument")
    NfcNormalize(children.head)
  }
}
