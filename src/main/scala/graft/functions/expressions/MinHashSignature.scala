package graft.functions.expressions

import org.apache.spark.sql.catalyst.expressions.codegen.{CodegenContext, ExprCode}
import org.apache.spark.sql.catalyst.expressions.{Expression, Literal, UnaryExpression, XXH64}
import org.apache.spark.sql.catalyst.util.ArrayData
import org.apache.spark.sql.catalyst.expressions.UnsafeArrayData
import org.apache.spark.sql.types._
import org.apache.spark.unsafe.types.UTF8String

/** Native MinHash signature: the complete H-hash signature of a document in
  * ONE pass over its text, per row, inside whole-stage codegen.
  *
  * Bit-for-bit equal to the relational formulation in
  * [[graft.functions.Dedup.minHashSignatures]]
  * (`explode(charShingles(text,k)) → xxhash64(sh) → min(xxhash64(h0, s))`),
  * pinned by a PipelineSpec parity test — but with NO explode and NO
  * shuffle: the relational form materializes |docs|·|shingles| rows and
  * aggregates H min-columns over them (an exchange on doc id), while this
  * expression is a narrow projection. Semantics replicated exactly:
  *
  *  - shingle positions i = 0..max(len−k, 0) over the LOWERCASED text
  *    (`lower(text).substr(i+1, k)` — a doc shorter than k yields one
  *    clipped shingle; the empty doc yields the empty shingle), duplicate
  *    shingles don't matter under min;
  *  - base hash = Spark `xxhash64(shingle)` = XXH64.hashUnsafeBytes(seed 42);
  *  - family member s = Spark `xxhash64(h0, s)` = hashInt(s, hashLong(h0, 42));
  *  - sig[s] = signed min over shingles (Spark `min` on LONG).
  */
case class MinHashSignature(child: Expression, shingleK: Int, numHashes: Int)
    extends UnaryExpression {

  override def checkInputDataTypes(): org.apache.spark.sql.catalyst.analysis.TypeCheckResult =
    if (child.dataType == StringType && shingleK > 0 && numHashes > 0)
      org.apache.spark.sql.catalyst.analysis.TypeCheckResult.TypeCheckSuccess
    else org.apache.spark.sql.catalyst.analysis.TypeCheckResult.TypeCheckFailure(
      s"graft_minhash requires (STRING, k > 0, numHashes > 0), got " +
        s"${child.dataType.catalogString}, k=$shingleK, numHashes=$numHashes")

  override def dataType: DataType = ArrayType(LongType, containsNull = false)

  override def nullSafeEval(t: Any): Any =
    MinHashSignature.compute(t.asInstanceOf[UTF8String], shingleK, numHashes)

  override protected def doGenCode(ctx: CodegenContext, ev: ExprCode): ExprCode =
    defineCodeGen(ctx, ev, c =>
      s"graft.functions.expressions.MinHashSignature.compute($c, $shingleK, $numHashes)")

  override protected def withNewChildInternal(newChild: Expression): Expression =
    copy(child = newChild)
}

object MinHashSignature {
  /** Static helper the generated code calls (Scala object → static
    * forwarder on the companion class). */
  def compute(text: UTF8String, k: Int, numHashes: Int): ArrayData = {
    val lowered = text.toLowerCase
    // position bound comes from the ORIGINAL length — the relational spec
    // is sequence(0, greatest(length(text)-k, 0)) over lower(text), and
    // lowercasing can CHANGE numChars (İ → i + combining dot), so using
    // the lowered length would diverge from charShingles and the oracles
    val last = math.max(text.numChars() - k, 0)
    val sig = new Array[Long](numHashes)
    java.util.Arrays.fill(sig, Long.MaxValue)
    var i = 0
    while (i <= last) {
      val sh = lowered.substringSQL(i + 1, k)
      val base = XXH64.hashUnsafeBytes(sh.getBaseObject, sh.getBaseOffset, sh.numBytes, 42L)
      val hseed = XXH64.hashLong(base, 42L)
      var s = 0
      while (s < numHashes) {
        val v = XXH64.hashInt(s, hseed)
        if (v < sig(s)) sig(s) = v
        s += 1
      }
      i += 1
    }
    UnsafeArrayData.fromPrimitiveArray(sig)
  }

  /** Registry builder: graft_minhash(text, k, numHashes) with literal ints. */
  private[expressions] def fromChildren(children: Seq[Expression]): Expression = {
    require(children.size == 3, "graft_minhash(text, k, numHashes) takes 3 arguments")
    MinHashSignature(children(0), intLit(children(1), "graft_minhash", "k"),
      intLit(children(2), "graft_minhash", "numHashes"))
  }

  private[expressions] def intLit(e: Expression, fn: String, what: String): Int = e match {
    case Literal(v: Int, IntegerType) => v
    case _ => throw new IllegalArgumentException(s"$fn: $what must be an INT literal")
  }
}

/** Native hashed shingle set: sorted xxhash64 values of the distinct
  * lowercased k-shingles of a document, in one codegen'd pass — the
  * per-doc input of MinHash's exact-Jaccard verification stage.
  * Bit-for-bit equal (parity-pinned) to the interpreted
  * `sort_array(transform(charShingles(text, k), s => xxhash64(s)))`
  * higher-order-lambda chain, including the collision corner: distinctness
  * is on the SHINGLE STRINGS, so two distinct shingles with equal hashes
  * contribute two (equal) array entries, exactly like the lambda form. */
case class ShingleHashes(child: Expression, shingleK: Int)
    extends UnaryExpression {

  override def checkInputDataTypes(): org.apache.spark.sql.catalyst.analysis.TypeCheckResult =
    if (child.dataType == StringType && shingleK > 0)
      org.apache.spark.sql.catalyst.analysis.TypeCheckResult.TypeCheckSuccess
    else org.apache.spark.sql.catalyst.analysis.TypeCheckResult.TypeCheckFailure(
      s"graft_shingle_hashes requires (STRING, k > 0), got " +
        s"${child.dataType.catalogString}, k=$shingleK")

  override def dataType: DataType = ArrayType(LongType, containsNull = false)

  override def nullSafeEval(t: Any): Any =
    ShingleHashes.compute(t.asInstanceOf[UTF8String], shingleK)

  override protected def doGenCode(ctx: CodegenContext, ev: ExprCode): ExprCode =
    defineCodeGen(ctx, ev, c =>
      s"graft.functions.expressions.ShingleHashes.compute($c, $shingleK)")

  override protected def withNewChildInternal(newChild: Expression): Expression =
    copy(child = newChild)
}

object ShingleHashes {
  def compute(text: UTF8String, k: Int): ArrayData = {
    val lowered = text.toLowerCase
    // original-length bound, as in MinHashSignature.compute (see there)
    val last = math.max(text.numChars() - k, 0)
    val seen = new java.util.HashSet[UTF8String](math.max(16, (last + 1) * 2))
    val hashes = new Array[Long](last + 1)
    var m = 0
    var i = 0
    while (i <= last) {
      val sh = lowered.substringSQL(i + 1, k)
      if (seen.add(sh)) {
        hashes(m) = XXH64.hashUnsafeBytes(sh.getBaseObject, sh.getBaseOffset, sh.numBytes, 42L)
        m += 1
      }
      i += 1
    }
    val out = java.util.Arrays.copyOf(hashes, m)
    java.util.Arrays.sort(out)
    UnsafeArrayData.fromPrimitiveArray(out)
  }

  private[expressions] def fromChildren(children: Seq[Expression]): Expression = {
    require(children.size == 2, "graft_shingle_hashes(text, k) takes 2 arguments")
    ShingleHashes(children(0), MinHashSignature.intLit(children(1), "graft_shingle_hashes", "k"))
  }
}

/** Native hashed word n-grams: xxhash64 values of the distinct lowercased
  * word n-grams (tokens split on \s+, joined by \\x01) in first-occurrence
  * order, one codegen'd pass per document. Bit-for-bit equal
  * (parity-pinned) to the interpreted
  * `transform(wordNgrams(text, n), g => xxhash64(g))` lambda chain —
  * including `split`'s kept-empty-token corners and string-level
  * distinctness — feeding d3's gram-postings build without the per-doc
  * higher-order-function interpretation. Documents with fewer than n
  * tokens yield the empty array (no truncated gram). */
case class NgramHashes(child: Expression, n: Int)
    extends UnaryExpression {

  override def checkInputDataTypes(): org.apache.spark.sql.catalyst.analysis.TypeCheckResult =
    if (child.dataType == StringType && n > 0)
      org.apache.spark.sql.catalyst.analysis.TypeCheckResult.TypeCheckSuccess
    else org.apache.spark.sql.catalyst.analysis.TypeCheckResult.TypeCheckFailure(
      s"graft_ngram_hashes requires (STRING, n > 0), got " +
        s"${child.dataType.catalogString}, n=$n")

  override def dataType: DataType = ArrayType(LongType, containsNull = false)

  override def nullSafeEval(t: Any): Any =
    NgramHashes.compute(t.asInstanceOf[UTF8String], n)

  override protected def doGenCode(ctx: CodegenContext, ev: ExprCode): ExprCode =
    defineCodeGen(ctx, ev, c =>
      s"graft.functions.expressions.NgramHashes.compute($c, $n)")

  override protected def withNewChildInternal(newChild: Expression): Expression =
    copy(child = newChild)
}

object NgramHashes {
  private val WS = UTF8String.fromString("\\s+")
  private val SEP = UTF8String.fromString("\u0001") // wordNgrams' \x01 separator

  def compute(text: UTF8String, n: Int): ArrayData = {
    val toks = text.toLowerCase.split(WS, -1) // = Spark split(lower(text), "\s+")
    if (toks.length < n) return UnsafeArrayData.fromPrimitiveArray(new Array[Long](0))
    val last = toks.length - n
    val seen = new java.util.HashSet[UTF8String](math.max(16, (last + 1) * 2))
    val hashes = new Array[Long](last + 1)
    var m = 0
    var i = 0
    while (i <= last) {
      val parts = new Array[UTF8String](n)
      System.arraycopy(toks, i, parts, 0, n)
      val gram = UTF8String.concatWs(SEP, parts: _*)
      if (seen.add(gram)) {
        hashes(m) = XXH64.hashUnsafeBytes(gram.getBaseObject, gram.getBaseOffset, gram.numBytes, 42L)
        m += 1
      }
      i += 1
    }
    UnsafeArrayData.fromPrimitiveArray(java.util.Arrays.copyOf(hashes, m))
  }

  private[expressions] def fromChildren(children: Seq[Expression]): Expression = {
    require(children.size == 2, "graft_ngram_hashes(text, n) takes 2 arguments")
    NgramHashes(children(0), MinHashSignature.intLit(children(1), "graft_ngram_hashes", "n"))
  }
}
