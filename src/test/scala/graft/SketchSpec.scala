package graft

import graft.functions.{Dedup, TextAnalysis}
import org.apache.spark.sql.DataFrame
import org.apache.spark.sql.execution.exchange.ShuffleExchangeExec
import org.apache.spark.sql.functions._
import org.scalatest.funsuite.AnyFunSuite

/** Sketch-tier operators: Bloom exact decontamination (d16) and HLL
  * distinct-count sketches (t39/t40). The claims under test are the ones
  * the 100 TB story rests on: the Bloom tier is EXACT after verify (false
  * positives occur and are stripped), the prefilter runs in the scan stage
  * (no shuffle below it), and HLL shard-merge is lossless vs one-pass.
  */
class SketchSpec extends AnyFunSuite {
  lazy val spark = SparkTestSession.spark
  import spark.implicits._

  /** batch of 220 docs: ids 0..199 unique filler, 200..209 verbatim copies
    * of reference texts, 210..219 near-misses (one char off). */
  def batch: DataFrame = (
    (0 until 200).map(i => (i.toLong, s"unique filler document number $i with some shared phrasing")) ++
    (0 until 10).map(i => (200L + i, s"reference document $i body text")) ++
    (0 until 10).map(i => (210L + i, s"reference document $i body texT"))
  ).toDF("doc_id", "text")

  def reference: DataFrame =
    (0 until 10).map(i => (1000L + i, s"reference document $i body text"))
      .toDF("doc_id", "text")

  def naiveFlagged(docs: DataFrame, ref: DataFrame): Set[Long] =
    docs.join(ref.select(col("text")), Seq("text"), "left_semi")
      .select("doc_id").as[Long].collect().toSet

  test("exactDedupAgainstBloom == naive text semi-join at tight and loose fpp") {
    val expect = naiveFlagged(batch, reference)
    assert(expect === (200L until 210L).toSet)
    for (fpp <- Seq(0.01, 0.5)) {
      val got = Dedup.exactDedupAgainstBloom(batch, reference, fpp = fpp)
        .as[Long].collect().toSet
      assert(got === expect, s"fpp=$fpp")
    }
  }

  test("bloom prefilter admits false positives; verify strips them (exactness is earned)") {
    // fpp 0.5 over 10 reference items vs 200 non-matching texts: the
    // sketch-only tier flags ~half the non-matches. Deterministic (fixed
    // corpus, fixed hash) — the pin is FP_COUNT > 0, i.e. the gate-green
    // path genuinely exercises FP removal rather than a vacuous bloom.
    val sketchOnly = Dedup.exactDedupAgainstBloom(batch, reference, fpp = 0.5, verify = false)
      .as[Long].collect().toSet
    val verified = Dedup.exactDedupAgainstBloom(batch, reference, fpp = 0.5)
      .as[Long].collect().toSet
    assert(verified.subsetOf(sketchOnly))
    assert((sketchOnly -- verified).nonEmpty,
      "expected Bloom false positives at fpp=0.5; corpus no longer exercises the verify stage")
    assert(verified === naiveFlagged(batch, reference))
  }

  test("exactDedupAgainstBloom: null texts are never flagged, either side") {
    val docsWithNull = batch.unionByName(Seq((999L, null.asInstanceOf[String])).toDF("doc_id", "text"))
    val refWithNull = reference.unionByName(Seq((1999L, null.asInstanceOf[String])).toDF("doc_id", "text"))
    val got = Dedup.exactDedupAgainstBloom(docsWithNull, refWithNull, fpp = 0.01)
      .as[Long].collect().toSet
    assert(!got.contains(999L))
    assert(got === (200L until 210L).toSet)
  }

  test("bloom prefilter is a scan-stage predicate: no shuffle below the might_contain filter") {
    // parquet-backed input: over a LocalRelation, ConvertToLocalRelation
    // folds the filter away at optimize time and there is no plan to pin
    val docs = spark.read.parquet("/root/testdata/sf0.001/documents.parquet")
    val plan = Dedup.exactDedupAgainstBloom(
        docs, docs.filter(col("doc_id") % 5 === 0), fpp = 0.01, verify = false)
      .queryExecution.executedPlan
    val filters = plan.collect {
      case f: org.apache.spark.sql.execution.FilterExec
          if f.condition.toString.contains("might_contain") => f
    }
    assert(filters.nonEmpty, s"no might_contain FilterExec in:\n$plan")
    assert(filters.forall(_.collect { case s: ShuffleExchangeExec => s }.isEmpty),
      "the 100 TB side must not be shuffled before the Bloom prefilter")
  }

  test("exactDedupAgainstBloom: empty reference flags nothing, either tier") {
    val empty = reference.filter(lit(false))
    for (verify <- Seq(true, false)) {
      assert(Dedup.exactDedupAgainstBloom(batch, empty, fpp = 0.5, verify = verify)
        .count() === 0L, s"verify=$verify")
    }
  }

  test("bloom decontam runs unchanged on a stream (stateless prefilter + stream-static verify)") {
    // the sketch is built from the STATIC reference side only, so the
    // returned plan imposes no stateful operator on the doc side: the
    // prefilter is a narrow filter, the verify join is stream-static
    val dir = java.nio.file.Files.createTempDirectory("graft_bloomstream").toString
    batch.write.parquet(s"$dir/docs")
    val schema = batch.schema
    val streamDocs = spark.readStream.schema(schema).parquet(s"$dir/docs")
    for (verify <- Seq(false, true)) {
      val name = s"bloom_stream_$verify"
      val q = Dedup.exactDedupAgainstBloom(streamDocs, reference, fpp = 0.5, verify = verify)
        .writeStream.outputMode("append").format("memory").queryName(name).start()
      try {
        q.processAllAvailable()
        val streamed = spark.table(name).as[Long].collect().toSet
        val batched = Dedup.exactDedupAgainstBloom(batch, reference, fpp = 0.5, verify = verify)
          .as[Long].collect().toSet
        assert(streamed === batched, s"verify=$verify")
      } finally q.stop()
    }
  }

  // ---- HLL ------------------------------------------------------------------

  def corpus: DataFrame = (0 until 300).map { i =>
    val src = if (i % 3 == 0) "web" else "books"
    (i.toLong, src, s"token$i shared alpha beta gamma token${i % 50} word${i % 7}")
  }.toDF("doc_id", "source", "text")

  test("HLL estimate within 5% of the exact distinct count per group") {
    val exact = TextAnalysis.distinctTokenCounts(corpus)
      .as[(String, Long)].collect().toMap
    val est = TextAnalysis.distinctTokenEstimates(corpus)
      .as[(String, Long)].collect().toMap
    assert(est.keySet === exact.keySet)
    for ((g, e) <- exact) {
      val rel = math.abs(est(g) - e).toDouble / e
      assert(rel <= 0.05, s"group $g: exact $e, est ${est(g)}, rel err $rel")
    }
  }

  test("HLL shard-merge is lossless: union of per-shard sketches == one-pass estimate") {
    // shard by doc_id % 4 — four independent partial sketch sets, as a
    // day-partitioned 100 TB pipeline would persist them
    val sharded = (0 until 4).map { s =>
      TextAnalysis.distinctTokenSketches(corpus.filter(col("doc_id") % 4 === s))
    }.reduce(_ unionByName _)
    val merged = TextAnalysis.mergeDistinctSketches(sharded)
      .as[(String, Long)].collect().toMap
    val onePass = TextAnalysis.distinctTokenEstimates(corpus)
      .as[(String, Long)].collect().toMap
    assert(merged === onePass)
  }

  test("chunkDocuments: hand-computed windows, overlap, tails, and null/empty policy") {
    val docs = Seq(
      (1L, "a b c d e"),                 // n=5, chunk=4, overlap=1, stride=3 → [a b c d], [d e]
      (2L, "a b c d"),                   // n=4 → exactly one full window
      (3L, "x"),                         // n=1 → one short window
      (4L, null.asInstanceOf[String]),   // no rows
      (5L, "   ")                        // whitespace-only → no rows
    ).toDF("doc_id", "text")
    val got = graft.functions.TextAnalysis
      .chunkDocuments(docs, chunkTokens = 4, overlapTokens = 1)
      .collect().map(r => (r.getLong(0), r.getLong(1), r.getLong(2), r.getString(3))).toSet
    assert(got === Set(
      (1L, 0L, 4L, "a b c d"), (1L, 1L, 2L, "d e"),
      (2L, 0L, 4L, "a b c d"),
      (3L, 0L, 1L, "x")))
    // every token is covered and consecutive windows share exactly the
    // overlap on a longer doc
    val long = Seq((9L, (1 to 10).map(i => s"t$i").mkString(" "))).toDF("doc_id", "text")
    val chunks = graft.functions.TextAnalysis
      .chunkDocuments(long, chunkTokens = 4, overlapTokens = 2)
      .collect().map(r => (r.getLong(1), r.getString(3))).sortBy(_._1)
    assert(chunks.map(_._2) === Seq("t1 t2 t3 t4", "t3 t4 t5 t6", "t5 t6 t7 t8", "t7 t8 t9 t10"))
  }

  test("mixtureRebalance: rates, cap, zero-weight drop, and budget monotonicity") {
    // ids chosen by md5 fraction: 6 (0x1679...) and 9 (0x45c4...) sit
    // BELOW 0.5, 1 (0xc4ca...) and 4 (0xa87f...) ABOVE — so the
    // fractional tier exercises both keep and drop
    val docs = Seq(
      (6L, "a", "w x y z"),            // 4 tokens, hashes low
      (1L, "a", "u v w x y z"),        // 6 tokens, hashes high → a: 10 total
      (9L, "b", "p q r s t"),          // 5 tokens, hashes low
      (4L, "b", "f g h i j"),          // 5 tokens, hashes high → b: 10 total
      (5L, "c", "m n o"),              // weight 0 → dropped
      (7L, "a", null.asInstanceOf[String]), // null text → dropped
      (8L, "a", "   ")                 // zero tokens → dropped
    ).toDF("doc_id", "source", "text")
    val w = Map("a" -> 1.0, "b" -> 1.0)
    // budget 40 ≥ every source's tokens → every rate caps at exactly 1.0
    // and ALL non-empty a/b docs are kept ('<=' keeps weight-1.0 keys)
    val full = TextAnalysis.mixtureRebalance(docs, w, budgetTokens = 40L)
      .collect().map(r => (r.getLong(0), r.getString(1), r.getLong(2), r.getDouble(3)))
    assert(full.map(x => (x._1, x._2, x._3)).toSet ===
      Set((6L, "a", 4L), (1L, "a", 6L), (9L, "b", 5L), (4L, "b", 5L)))
    assert(full.forall(_._4 === 1.0))
    // budget 10 → share 0.5 each → rate = 0.5·10/10 = exactly 0.5: the
    // low-hash docs survive, the high-hash ones drop, and the kept set
    // matches applying weightedSampleByHash(0.5) directly
    val half = TextAnalysis.mixtureRebalance(docs, w, budgetTokens = 10L)
      .collect().map(r => (r.getLong(0), r.getDouble(3)))
    assert(half.toSet === Set((6L, 0.5), (9L, 0.5)))
    val expectHalf = docs.filter(col("text").isNotNull && col("source").isin("a", "b"))
      .filter(TextAnalysis.weightedSampleByHash(col("doc_id"), lit(0.5)))
      .filter(col("doc_id") =!= 8L)
      .select("doc_id").as[Long].collect().toSet
    assert(half.map(_._1).toSet === expectHalf)
    // raising the budget only ADDS docs (per-source rate is monotone in B)
    assert(half.map(_._1).toSet.subsetOf(full.map(_._1).toSet))
  }

  test("distinctTokenCounts: brute-force twin on a tiny corpus") {
    val tiny = Seq(
      (1L, "a", "Red red BLUE"), (2L, "a", "blue green"), (3L, "b", "red")
    ).toDF("doc_id", "source", "text")
    val got = TextAnalysis.distinctTokenCounts(tiny).as[(String, Long)].collect().toMap
    assert(got === Map("a" -> 3L, "b" -> 1L)) // a: {red, blue, green}
  }

  test("null-text-only groups are absent from BOTH the exact and sketch distinct tiers") {
    val tiny = Seq(
      (1L, "a", "red blue"), (2L, "nulls", null.asInstanceOf[String])
    ).toDF("doc_id", "source", "text")
    assert(TextAnalysis.distinctTokenCounts(tiny).as[(String, Long)].collect().toMap
      === Map("a" -> 2L))
    assert(TextAnalysis.distinctTokenEstimates(tiny).as[(String, Long)].collect().toMap
      === Map("a" -> 2L))
  }

  // ---- cross-source overlap (t43/t44) ---------------------------------------

  test("sourceOverlap: hand-computed trigram Jaccard matrix incl. zero and gram-less pairs") {
    val docs = Seq(
      (0L, "A", "a b c d"),  // grams: "a b c", "b c d"
      (4L, "A", "a b c d"),  // duplicate doc: source gram set unchanged
      (1L, "B", "a b c x"),  // grams: "a b c", "b c x"
      (2L, "C", "z z z q"),  // grams: "z z z", "z z q"
      (3L, "D", "one two")   // < 3 tokens: no grams at all
    ).toDF("doc_id", "source", "text")
    val out = TextAnalysis.sourceOverlap(docs, n = 3).collect()
      .map(r => (r.getString(0), r.getString(1)) ->
        ((r.getLong(2), r.getLong(3), r.getLong(4), r.getDouble(5),
          r.getDouble(6), r.getDouble(7)))).toMap
    assert(out.size === 6, s"C(4,2) pairs expected, got ${out.keySet}")
    assert(out(("A", "B")) === ((2L, 2L, 1L, 0.333333, 0.5, 0.5))) // 1/(2+2-1); 1/2 each way
    assert(out(("A", "C")) === ((2L, 2L, 0L, 0.0, 0.0, 0.0)))      // zero overlap kept
    assert(out(("B", "C")) === ((2L, 2L, 0L, 0.0, 0.0, 0.0)))
    assert(out(("A", "D")) === ((2L, 0L, 0L, 0.0, 0.0, 0.0)))      // gram-less source pairs at 0
    assert(out(("B", "D")) === ((2L, 0L, 0L, 0.0, 0.0, 0.0)))
    assert(out(("C", "D")) === ((2L, 0L, 0L, 0.0, 0.0, 0.0)))
    // asymmetric containment: E's grams are a strict subset of A's —
    // jaccard hides the superset relation, cont_e_in_a exposes it
    val sup = TextAnalysis.sourceOverlap(docs.unionByName(
        Seq((9L, "E", "a b c")).toDF("doc_id", "source", "text")), n = 3)
      .collect().map(r => (r.getString(0), r.getString(1)) ->
        ((r.getDouble(5), r.getDouble(6), r.getDouble(7)))).toMap
    assert(sup(("A", "E")) === ((0.5, 0.5, 1.0))) // E ⊂ A: containment 1.0, jaccard only 0.5
  }

  test("sourceMinHash: shard-merge lossless, identical sources estimate exactly 1.0, error bounded") {
    // s0 and s1 carry IDENTICAL text sets (same gram set => same sketch
    // => estimate exactly 1.0); s2 is disjoint from both
    val docs = (0 until 60).map { i =>
      val src = s"s${i % 3}"
      val text =
        if (i % 3 == 2) s"zulu yankee xray token${i % 10} quebec papa oscar"
        else s"alpha bravo charlie delta echo token${i % 10} foxtrot golf"
      (i.toLong, src, text)
    }.toDF("doc_id", "source", "text")
    val onePass = TextAnalysis.sourceMinHashSketches(docs)
    // shard by doc_id % 4 — partial sketches persisted per shard, rolled
    // up later; element-wise min must equal the one-pass sketch bit-for-bit
    val sharded = (0 until 4).map(s =>
      TextAnalysis.sourceMinHashSketches(docs.filter(col("doc_id") % 4 === s)))
      .reduce(_ unionByName _)
    val merged = TextAnalysis.mergeSourceSketches(sharded)
      .as[(String, Seq[Long])].collect().toMap
    assert(merged === onePass.as[(String, Seq[Long])].collect().toMap)
    // shards sketched with different numHashes must fail fast, not merge
    // silently (element_at past the shorter array would yield NULL minima)
    val mixedK = sharded.unionByName(
      TextAnalysis.sourceMinHashSketches(docs, numHashes = 32))
    val errK = intercept[IllegalArgumentException] {
      TextAnalysis.mergeSourceSketches(mixedK)
    }
    assert(errK.getMessage.contains("numHashes"), errK.getMessage)
    val exact = TextAnalysis.sourceOverlap(docs).collect()
      .map(r => (r.getString(0), r.getString(1)) -> r.getDouble(5)).toMap
    val est = TextAnalysis.sourceOverlapEstimates(onePass).collect()
      .map(r => (r.getString(0), r.getString(1)) -> r.getDouble(2)).toMap
    assert(est.keySet === exact.keySet)
    assert(exact(("s0", "s1")) === 1.0)
    assert(est(("s0", "s1")) === 1.0, "identical gram sets must estimate exactly 1.0")
    for ((k, e) <- exact)
      assert(math.abs(est(k) - e) <= 0.2, // ~3 rsd at k=64
        s"pair $k: exact $e, est ${est(k)}")
  }

  test("sourceMinHash runs unchanged on a stream: complete-mode state == batch sketch") {
    // min aggregates are Structured-Streaming-native state, so the SAME
    // function maintains a live sketch over a document stream — the
    // incremental corpus-audit shape (new dump files append, the
    // per-source sketch updates in place, estimates stay O(|sources|²))
    val dir = java.nio.file.Files.createTempDirectory("graft_srcsketch").toString
    corpus.filter(col("doc_id") % 2 === 0).write.parquet(s"$dir/docs")
    corpus.filter(col("doc_id") % 2 === 1).write.mode("append").parquet(s"$dir/docs")
    val streamDocs = spark.readStream.schema(corpus.schema)
      .option("maxFilesPerTrigger", 1).parquet(s"$dir/docs")
    val q = TextAnalysis.sourceMinHashSketches(streamDocs)
      .writeStream.outputMode("complete").format("memory")
      .queryName("src_sketch_stream").start()
    try {
      q.processAllAvailable()
      val streamed = spark.table("src_sketch_stream")
        .as[(String, Seq[Long])].collect().toMap
      val batched = TextAnalysis.sourceMinHashSketches(corpus)
        .as[(String, Seq[Long])].collect().toMap
      assert(streamed === batched)
    } finally q.stop()
  }

  test("sourceMinHash: gram-less sources emit no sketch row; estimator is deterministic") {
    val docs = Seq(
      (1L, "long", "alpha bravo charlie delta"),
      (2L, "short", "one two")
    ).toDF("doc_id", "source", "text")
    val sk = TextAnalysis.sourceMinHashSketches(docs)
    assert(sk.select("src").as[String].collect().toSet === Set("long"))
    val r1 = TextAnalysis.sourceOverlapEstimates(
      TextAnalysis.sourceMinHashSketches(corpus)).collect()
    val r2 = TextAnalysis.sourceOverlapEstimates(
      TextAnalysis.sourceMinHashSketches(corpus)).collect()
    assert(r1.map(_.toString).sorted.toSeq === r2.map(_.toString).sorted.toSeq)
  }
}
