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

/** Native MinHash signature over an ALREADY-HASHED gram set
  * (ARRAY<LONG>) — the banded n-gram tier's signature
  * (`Dedup.ngramJaccardPairsBanded`) in one codegen'd pass per document.
  *
  * Bit-for-bit equal (parity-pinned in PipelineSpec) to the 64-column
  * aggregate formulation `agg(min(xxhash64(lit(h), gram)) for h <- 0
  * until numHashes)` the tier previously built: Spark's
  * `xxhash64(lit(h), gram)` hashes the INT literal h first
  * (`XXH64.hashInt(h, seed 42)`) and chains the LONG gram through the
  * result, and `min` on LONG is the signed minimum. Seeds are
  * precomputed once per expression instance; the per-row cost is one
  * `hashLong` per (gram, hash) pair in a tight loop — the same hash
  * count as the aggregate form, without 64 codegen'd buffer-slot
  * updates per posting row. An empty gram array yields the identity
  * signature (Long.MaxValue everywhere) — unreachable from the postings
  * path, where a doc with no gram has no row at all. */
case class MinHashFromLongs(child: Expression, numHashes: Int)
    extends UnaryExpression {

  override def checkInputDataTypes(): org.apache.spark.sql.catalyst.analysis.TypeCheckResult =
    child.dataType match {
      case ArrayType(LongType, _) if numHashes > 0 =>
        org.apache.spark.sql.catalyst.analysis.TypeCheckResult.TypeCheckSuccess
      case other => org.apache.spark.sql.catalyst.analysis.TypeCheckResult.TypeCheckFailure(
        s"graft_minhash_longs requires (ARRAY<LONG>, numHashes > 0), got " +
          s"${other.catalogString}, numHashes=$numHashes")
    }

  override def dataType: DataType = ArrayType(LongType, containsNull = false)

  @transient private lazy val seeds: Array[Long] =
    MinHashFromLongs.seedsFor(numHashes)

  override def nullSafeEval(t: Any): Any =
    MinHashFromLongs.compute(t.asInstanceOf[ArrayData], seeds)

  override protected def doGenCode(ctx: CodegenContext, ev: ExprCode): ExprCode = {
    val seedsRef = ctx.addReferenceObj("seeds", seeds, "long[]")
    defineCodeGen(ctx, ev, c =>
      s"graft.functions.expressions.MinHashFromLongs.compute($c, $seedsRef)")
  }

  override protected def withNewChildInternal(newChild: Expression): Expression =
    copy(child = newChild)
}

object MinHashFromLongs {
  /** seeds[h] = XXH64.hashInt(h, 42) — what Spark's xxhash64 folds the
    * leading INT literal h into before the gram long is chained. */
  def seedsFor(numHashes: Int): Array[Long] = {
    val s = new Array[Long](numHashes)
    var h = 0
    while (h < numHashes) { s(h) = XXH64.hashInt(h, 42L); h += 1 }
    s
  }

  def compute(grams: ArrayData, seeds: Array[Long]): ArrayData = {
    val sig = new Array[Long](seeds.length)
    java.util.Arrays.fill(sig, Long.MaxValue)
    val n = grams.numElements()
    var i = 0
    while (i < n) {
      val g = grams.getLong(i)
      var h = 0
      while (h < seeds.length) {
        val v = XXH64.hashLong(g, seeds(h))
        if (v < sig(h)) sig(h) = v
        h += 1
      }
      i += 1
    }
    UnsafeArrayData.fromPrimitiveArray(sig)
  }

  private[expressions] def fromChildren(children: Seq[Expression]): Expression = {
    require(children.size == 2, "graft_minhash_longs(grams, numHashes) takes 2 arguments")
    MinHashFromLongs(children(0),
      MinHashSignature.intLit(children(1), "graft_minhash_longs", "numHashes"))
  }
}

/** Exact intersection size of two SORTED distinct LONG arrays with a
  * provable below-threshold early exit — the banded tier's per-pair
  * verify (`graft_inter_sorted(gs_a, gs_b, t)`), replacing
  * `size(array_intersect(a, b))`, which builds a hash set PER PAIR
  * (measured ~13 µs/pair over d14's 49M candidates at 10×; the merge is
  * two pointer walks over pre-sorted arrays).
  *
  * Returns the exact intersection count when Jaccard(a, b) ≥ t can
  * still hold, or -1 as soon as it provably cannot: Jaccard ≥ t ⟺
  * inter ≥ t·(|a|+|b|)/(1+t), and during the merge
  * `matches + min(remaining_a, remaining_b)` is a sharp upper bound on
  * the final count — once it drops below the needed floor the pair is
  * dead, no matter how the tails align. -1 is a FILTER signal only:
  * callers must treat it as "below threshold", never as a count.
  * Inputs MUST be sorted ascending (signed) and duplicate-free —
  * `sort_array(collect_list(gram))` over per-doc distinct grams; the
  * expression does not re-verify this. */
case class InterSortedGe(left: Expression, right: Expression, threshold: Double)
    extends org.apache.spark.sql.catalyst.expressions.BinaryExpression {

  override def checkInputDataTypes(): org.apache.spark.sql.catalyst.analysis.TypeCheckResult =
    (left.dataType, right.dataType) match {
      case (ArrayType(LongType, _), ArrayType(LongType, _))
        if threshold >= 0.0 && threshold <= 1.0 =>
        org.apache.spark.sql.catalyst.analysis.TypeCheckResult.TypeCheckSuccess
      case (l, r) => org.apache.spark.sql.catalyst.analysis.TypeCheckResult.TypeCheckFailure(
        s"graft_inter_sorted requires (ARRAY<LONG>, ARRAY<LONG>, 0 <= t <= 1), got " +
          s"${l.catalogString}, ${r.catalogString}, t=$threshold")
    }

  override def dataType: DataType = IntegerType

  override def nullSafeEval(a: Any, b: Any): Any =
    InterSortedGe.compute(a.asInstanceOf[ArrayData], b.asInstanceOf[ArrayData], threshold)

  override protected def doGenCode(ctx: CodegenContext, ev: ExprCode): ExprCode =
    defineCodeGen(ctx, ev, (a, b) =>
      s"graft.functions.expressions.InterSortedGe.compute($a, $b, $threshold)")

  override protected def withNewChildrenInternal(newLeft: Expression, newRight: Expression): Expression =
    copy(left = newLeft, right = newRight)
}

object InterSortedGe {
  def compute(a: ArrayData, b: ArrayData, t: Double): Int = {
    val na = a.numElements()
    val nb = b.numElements()
    // the exact floor is i >= t(na+nb)/(1+t); a -1 slack makes `needed`
    // a strict UNDER-estimate under any double rounding of the product —
    // the final keep/drop decision is the caller's own jaccard >= t
    // double compare on the returned count, so an under-estimate only
    // costs one unit of pruning, never a wrongly dropped pair
    val needed = math.floor(t * (na + nb) / (1.0 + t)).toInt - 1
    var i = 0
    var j = 0
    var m = 0
    while (i < na && j < nb) {
      if (m + math.min(na - i, nb - j) < needed) return -1
      val x = a.getLong(i)
      val y = b.getLong(j)
      if (x == y) { m += 1; i += 1; j += 1 }
      else if (x < y) i += 1
      else j += 1
    }
    if (m < needed) -1 else m
  }

  private[expressions] def fromChildren(children: Seq[Expression]): Expression = {
    require(children.size == 3, "graft_inter_sorted(a, b, t) takes 3 arguments")
    val t = children(2) match {
      case Literal(v: Double, DoubleType) => v
      // SQL-text decimal literals carry o.a.s.sql.types.Decimal, not
      // java.math.BigDecimal (ADVICE r20) — match the real runtime type
      case Literal(v: org.apache.spark.sql.types.Decimal, _) => v.toDouble
      case other => throw new IllegalArgumentException(
        s"graft_inter_sorted: t must be a DOUBLE literal, got $other")
    }
    InterSortedGe(children(0), children(1), t)
  }
}

/** [[InterSortedGe]] over sorted ARRAY<INT> MULTISETS — the banded
  * tier's 32-bit prefilter stage (`graft_inter_sorted_int`). Inputs are
  * 32-bit truncations of the sorted 64-bit gram arrays; truncation only
  * MERGES grams (never splits), so the multiset merge-count
  * Σ min(countA, countB) is an UPPER bound on the true 64-bit
  * intersection — a -1 (provably below threshold) verdict here is
  * final, while a non-negative return only admits the pair to the exact
  * 64-bit stage. Duplicates are handled by the same merge (equal values
  * consume one element from each side = min-count semantics). */
case class InterSortedGeInt(left: Expression, right: Expression, threshold: Double)
    extends org.apache.spark.sql.catalyst.expressions.BinaryExpression {

  override def checkInputDataTypes(): org.apache.spark.sql.catalyst.analysis.TypeCheckResult =
    (left.dataType, right.dataType) match {
      case (ArrayType(IntegerType, _), ArrayType(IntegerType, _))
        if threshold >= 0.0 && threshold <= 1.0 =>
        org.apache.spark.sql.catalyst.analysis.TypeCheckResult.TypeCheckSuccess
      case (l, r) => org.apache.spark.sql.catalyst.analysis.TypeCheckResult.TypeCheckFailure(
        s"graft_inter_sorted_int requires (ARRAY<INT>, ARRAY<INT>, 0 <= t <= 1), got " +
          s"${l.catalogString}, ${r.catalogString}, t=$threshold")
    }

  override def dataType: DataType = IntegerType

  override def nullSafeEval(a: Any, b: Any): Any =
    InterSortedGeInt.compute(a.asInstanceOf[ArrayData], b.asInstanceOf[ArrayData], threshold)

  override protected def doGenCode(ctx: CodegenContext, ev: ExprCode): ExprCode =
    defineCodeGen(ctx, ev, (a, b) =>
      s"graft.functions.expressions.InterSortedGeInt.compute($a, $b, $threshold)")

  override protected def withNewChildrenInternal(newLeft: Expression, newRight: Expression): Expression =
    copy(left = newLeft, right = newRight)
}

object InterSortedGeInt {
  def compute(a: ArrayData, b: ArrayData, t: Double): Int = {
    val na = a.numElements()
    val nb = b.numElements()
    // same conservative floor as InterSortedGe (see there)
    val needed = math.floor(t * (na + nb) / (1.0 + t)).toInt - 1
    var i = 0
    var j = 0
    var m = 0
    while (i < na && j < nb) {
      if (m + math.min(na - i, nb - j) < needed) return -1
      val x = a.getInt(i)
      val y = b.getInt(j)
      if (x == y) { m += 1; i += 1; j += 1 }
      else if (x < y) i += 1
      else j += 1
    }
    if (m < needed) -1 else m
  }

  private[expressions] def fromChildren(children: Seq[Expression]): Expression = {
    require(children.size == 3, "graft_inter_sorted_int(a, b, t) takes 3 arguments")
    val t = children(2) match {
      case Literal(v: Double, DoubleType) => v
      // same Decimal-literal fix as InterSortedGe above (ADVICE r20)
      case Literal(v: org.apache.spark.sql.types.Decimal, _) => v.toDouble
      case other => throw new IllegalArgumentException(
        s"graft_inter_sorted_int: t must be a DOUBLE literal, got $other")
    }
    InterSortedGeInt(children(0), children(1), t)
  }
}
