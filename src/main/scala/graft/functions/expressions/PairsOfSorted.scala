package graft.functions.expressions

import org.apache.spark.sql.catalyst.InternalRow
import org.apache.spark.sql.catalyst.expressions.codegen.{CodegenContext, ExprCode}
import org.apache.spark.sql.catalyst.expressions.{Expression, UnaryExpression}
import org.apache.spark.sql.catalyst.util.{ArrayData, GenericArrayData}
import org.apache.spark.sql.types._

/** `graft_pairs_of(sorted_ids)` → ARRAY<STRUCT<_1: LONG, _2: LONG>>: all
  * ordered pairs (a, b), a-index < b-index, of a LONG array — the LSH
  * band-bucket pair generator in one pass, replacing the interpreted
  * `flatten(transform(ids, (a, i) => transform(slice(ids, i + 2, n),
  * b => struct(a, b))))` lambda chain, which re-evaluates a
  * HigherOrderFunction per element and materializes a sliced array per
  * OUTER element (O(s²) slice copies for a bucket of size s, all under
  * interpreted eval — the same class as the shingle/gram lambda fusions).
  * Emission order and values are bit-identical to the lambda form
  * (outer index i, inner j > i); callers pass ids sorted so `_1 < _2`.
  * Output length is s(s−1)/2 — the caller's bucket-size cap bounds it. */
case class PairsOfSorted(child: Expression) extends UnaryExpression {

  override def checkInputDataTypes(): org.apache.spark.sql.catalyst.analysis.TypeCheckResult =
    child.dataType match {
      case ArrayType(LongType, _) =>
        org.apache.spark.sql.catalyst.analysis.TypeCheckResult.TypeCheckSuccess
      case other => org.apache.spark.sql.catalyst.analysis.TypeCheckResult.TypeCheckFailure(
        s"graft_pairs_of requires ARRAY<LONG>, got ${other.catalogString}")
    }

  override def dataType: DataType = ArrayType(
    StructType(Seq(StructField("_1", LongType, nullable = false),
      StructField("_2", LongType, nullable = false))), containsNull = false)

  override def nullSafeEval(a: Any): Any =
    PairsOfSorted.compute(a.asInstanceOf[ArrayData])

  override protected def doGenCode(ctx: CodegenContext, ev: ExprCode): ExprCode =
    defineCodeGen(ctx, ev, c =>
      s"graft.functions.expressions.PairsOfSorted.compute($c)")

  override protected def withNewChildInternal(newChild: Expression): Expression =
    copy(child = newChild)
}

object PairsOfSorted {
  def compute(ids: ArrayData): ArrayData = {
    val n = ids.numElements()
    // pair count as Long first (ADVICE r20): n*(n-1)/2 overflows Int for
    // buckets >= ~46342 ids — reachable when the caller's maxBucketSize
    // valve is left open — yielding a NegativeArraySizeException (or a
    // silently too-small array) with no actionable message
    val pairs = n.toLong * (n - 1L) / 2L
    require(pairs <= Int.MaxValue,
      s"graft_pairs_of: bucket of $n ids yields $pairs pairs (> Int.MaxValue " +
        "array limit) — cap the bucket with the caller's maxBucketSize " +
        "valve before generating pairs")
    val out = new Array[Any](pairs.toInt)
    var k = 0
    var i = 0
    while (i < n) {
      val a = ids.getLong(i)
      var j = i + 1
      while (j < n) {
        out(k) = InternalRow(a, ids.getLong(j))
        k += 1
        j += 1
      }
      i += 1
    }
    new GenericArrayData(out)
  }

  private[expressions] def fromChildren(children: Seq[Expression]): Expression = {
    require(children.size == 1, "graft_pairs_of(ids) takes 1 argument")
    PairsOfSorted(children(0))
  }
}
