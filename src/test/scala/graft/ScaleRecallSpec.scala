package graft

import org.scalatest.funsuite.AnyFunSuite
import org.apache.spark.sql.functions._

/** Standing recall-AT-SCALE guard (round 16, VERDICT r15 #2): the
  * adaptive quality knobs — cosineDuplicates' `tables = -1` and
  * semanticDedup's `nAssign = -1` — only ENGAGE above the 1× anchor
  * scale (the table formula floors at the hand-tuned 8 until the corpus
  * outgrows its n=2000 anchor; the width probe tracks the trained k,
  * which grows as n/256), so the 1× RecallSpec floors cannot witness
  * their decay: in round 15 every 1× floor was green while the 10×
  * full-suite run read d4 at 0.417 recall. That discovery only happened
  * because a one-off probe ran once; this spec makes it a build-breaking
  * check.
  *
  * Corpus: a 10× replica of the sf0.01 embeddings (n = 5,000 — the
  * ScaleTestData copy protocol: disjoint id ranges, copies >= 1 carry a
  * small deterministic perturbation so duplicate points are near- not
  * bit-equal). At this scale d4 resolves 8 bits / 22 tables (vs the 1×
  * floor of 8) and d9 trains k = 20 clusters (vs 2 at 1×), so both
  * formulas are exercised above their anchors while the exact twin
  * (exhaustive cosine pairs over the unperturbed copy-0 slice) stays
  * cheap. Fully deterministic — floors sit under a fixed measured value
  * (d4 0.978, d9 0.985, auto width 5 at k=20 — the info lines print the
  * live numbers every run), not a distribution.
  */
class ScaleRecallSpec extends AnyFunSuite {
  lazy val spark = SparkTestSession.spark

  private lazy val emb10 = {
    val emb = spark.read.parquet("/root/testdata/sf0.01/embeddings.parquet")
    (0 until 10).map { k =>
      val e0 = emb.withColumn("vec_id", col("vec_id") + lit(k * 10000000L))
      if (k == 0) e0
      else e0.withColumn("embedding", expr(
        s"transform(embedding, (x, i) -> cast(x + 0.005d * sin(vec_id * (i + 1) + $k) as float))"))
    }.reduce(_ unionByName _).localCheckpoint(true)
  }

  private def pairSet(df: org.apache.spark.sql.DataFrame): Set[(Long, Long)] =
    df.select(col("doc_a").cast("long"), col("doc_b").cast("long"))
      .collect().map(r => (r.getLong(0), r.getLong(1))).toSet

  // exact twin: exhaustive cosine pairs over the unperturbed copy-0 slice
  // (every vec_id < 500 vector is a copy-0 original at this construction)
  private lazy val exact = pairSet(graft.functions.Similarity.cosineDuplicates(
    emb10.filter(col("vec_id") < 500), threshold = 0.35, dim = 64,
    exhaustive = true))

  private def recallOf(got: Set[(Long, Long)]): Double = {
    assert(exact.nonEmpty, "exact twin returned no pairs")
    (got & exact).size.toDouble / exact.size
  }

  test("d4 adaptive tables (tables = -1, auto H2) holds recall >= 0.85 at 10x") {
    // the r15 defect shape: fixed tables=8 at the resolved 8 bits read
    // 0.417 at 10x-of-sf0.1; the formula (H2-aware since round 16 — the
    // GATE config) must keep this >= 0.85 here
    val got = pairSet(graft.functions.Similarity.cosineDuplicates(
      emb10, threshold = 0.35, dim = 64, bits = -1, tables = -1, probes = -1,
      probes2 = -1))
    val r = recallOf(got)
    info(f"d4 adaptive-tables recall at 10x: $r%.3f (${got.size} pairs)")
    assert(r >= 0.85)
  }

  test("d9 auto width (nAssign = -1) holds recall >= 0.85 at 10x") {
    // the round-16 calibration: the k=8-tuned manual nAssign=3 read 0.507
    // at 10x-of-sf0.1; auto must measure a width that clears the floor
    val got = pairSet(graft.functions.Similarity.semanticDedup(
      emb10, threshold = 0.35, nClusters = -1, nAssign = -1))
    val r = recallOf(got)
    info(f"d9 auto-width recall at 10x: $r%.3f (${got.size} pairs)")
    assert(r >= 0.85)
  }

  test("semanticDecontam adaptive tables + auto H2 hold recall >= 0.85 at 10x") {
    // the same defect family on the CROSS-CORPUS tier (round 16): before
    // the shared adaptiveTables rule, decontam had adaptive bits but a
    // FIXED table count — the exact silent decay d4 showed at 10×.
    // corpus = the 9 perturbed copies (4,500 vecs), reference = the 500
    // copy-0 originals; the exhaustive tier is the exact twin (2.25M
    // pairs, scan-shaped, cheap).
    val corpus = emb10.filter(col("vec_id") >= 10000000L)
    val ref = emb10.filter(col("vec_id") < 500)
    def pset(df: org.apache.spark.sql.DataFrame): Set[(Long, Long)] =
      df.select(col("doc_id").cast("long"), col("ref_id").cast("long"))
        .collect().map(r => (r.getLong(0), r.getLong(1))).toSet
    val exact = pset(graft.functions.Similarity.semanticDecontam(
      corpus, ref, threshold = 0.35, dim = 64, exhaustive = true))
    assert(exact.nonEmpty, "exhaustive decontam twin returned no pairs")
    val got = pset(graft.functions.Similarity.semanticDecontam(
      corpus, ref, threshold = 0.35, dim = 64, bits = -1, tables = -1,
      probes = -1, probes2 = -1))
    val r = (got & exact).size.toDouble / exact.size
    info(f"decontam adaptive recall at 10x: $r%.3f (${got.size} of ${exact.size} exact pairs)")
    assert(r >= 0.85)
  }

  test("public DEFAULTS hold recall >= 0.85 at 10x (r17: defaults are the auto forms)") {
    // the r16 verdict's one weak: a user calling with defaults used to get
    // the manual 1×-tuned knobs that silently decay (d4-class 0.417,
    // d9-class 0.507 at 10×). Round 17 made -1 the default on all three
    // ops — this pin is the build-breaking witness, exercising the exact
    // argument lists a naive caller writes. The cosineDuplicates default
    // leaves probes = 0, so this also regression-tests the ADVICE-r16
    // medium: auto-H2 table sizing must force full Hamming-1 probing
    // (before that fix, THIS config probed base+1 bucket per table while
    // the formula priced full H1+H2 coverage — recall collapse).
    val d4 = recallOf(pairSet(graft.functions.Similarity.cosineDuplicates(
      emb10, threshold = 0.35, dim = 64)))
    info(f"d4 all-defaults recall at 10x: $d4%.3f")
    assert(d4 >= 0.85)
    val d9 = recallOf(pairSet(graft.functions.Similarity.semanticDedup(
      emb10, threshold = 0.35, nClusters = -1)))
    info(f"d9 all-defaults recall at 10x: $d9%.3f")
    assert(d9 >= 0.85)
    val corpus = emb10.filter(col("vec_id") >= 10000000L)
    val ref = emb10.filter(col("vec_id") < 500)
    def pset(df: org.apache.spark.sql.DataFrame): Set[(Long, Long)] =
      df.select(col("doc_id").cast("long"), col("ref_id").cast("long"))
        .collect().map(r => (r.getLong(0), r.getLong(1))).toSet
    val exactDc = pset(graft.functions.Similarity.semanticDecontam(
      corpus, ref, threshold = 0.35, dim = 64, exhaustive = true))
    val dc = pset(graft.functions.Similarity.semanticDecontam(
      corpus, ref, threshold = 0.35, dim = 64))
    val rDc = (dc & exactDc).size.toDouble / exactDc.size
    info(f"decontam all-defaults recall at 10x: $rDc%.3f")
    assert(rDc >= 0.85)
  }

  test("calibrated width shrinks as the threshold tightens") {
    // geometry invariant of the boundary-miss probe: a TIGHTER threshold
    // means a smaller pair angle, fewer Voronoi crossings, and so a
    // narrower measured width — if a regression inverts this, the probe
    // is sampling the wrong angle
    val wide = graft.functions.Similarity.calibratedAssignWidth(emb10, threshold = 0.35)
    val tight = graft.functions.Similarity.calibratedAssignWidth(emb10, threshold = 0.9)
    info(s"width at thr 0.35: $wide; at thr 0.9: $tight")
    assert(tight <= wide)
  }

  test("d9 calibrated width grows past the 1x-tuned manual value at 10x") {
    // the defect class this guards: a fixed knob silently reused as the
    // trained k grows. At k = 20 the boundary-miss probe must ask for
    // MORE width than the k=8 sweet spot (3) — if a regression pins the
    // calibration back to a constant, this trips before recall decays
    // enough to trip the floor above.
    val w = graft.functions.Similarity.calibratedAssignWidth(
      emb10, threshold = 0.35)
    info(s"calibrated width at 10x (k=20): $w")
    assert(w >= 4)
  }
}
