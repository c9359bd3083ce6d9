package graft.tools

import org.apache.spark.sql.{DataFrame, SparkSession}
import org.apache.spark.sql.functions._

/** Three-point (1×/10×/100×) scaling probe for the n-gram dedup tiers
  * (VERDICT r19 #4): the a-suite has five three-point rows, the d-suite
  * none — and the Σdf² exact tier is the one with a superlinear failure
  * mode its budget guard exists to catch. Two corpus constructions, both
  * from the sf0.1 documents table (5000 docs at 1×):
  *
  *  - DISJOINT: every token carries a copy-unique suffix
  *    (`regexp_replace(text, "(\\S+)", "$1_c<k>")`), so gram sets never
  *    overlap across copies. Within-copy near-dup structure is
  *    preserved exactly; Σdf², true pairs, and postings all scale ×k —
  *    the clean denominator. Expected: wall ∝ k (∝ output pairs), no
  *    guard trip through 100× (linear growth stays under budget).
  *
  *  - CLONE: the ScaleCorpus `" v<k>"` suffix — each doc gains k−1
  *    near-identical variants (trigram J ≈ 0.95 ≫ 0.3), the
  *    everything-is-a-clone shape. Σdf² and true pairs scale ×k²; the
  *    default pairBudget (2e9) must TRIP the exact tier at 100×
  *    (≈ 100× the sf1 corpus's measured 278M), and the banded tier's
  *    candidate volume is quadratic here TOO — not a defect: the
  *    OUTPUT is quadratic (every cross-copy pair is a true near-dup),
  *    and "linear in duplicate mass" means exactly that. Measured at
  *    10×; at 100× the true pair count alone (~C(100,2)·5000 ≈ 25M
  *    pairs riding ~5B bucket candidates) is past what a diagnostic
  *    should burn — recorded as the guard's territory, not run.
  *
  * One-off diagnostic, not a gate. Results land in SCALING.md.
  * Usage: runMain graft.tools.DedupScaleProbe [factors…] (default 1 10 100)
  */
object DedupScaleProbe {
  def main(args: Array[String]): Unit = {
    val factors = if (args.nonEmpty) args.map(_.toInt).toSeq else Seq(1, 10, 100)
    val spark = SparkSession.builder().master("local[32]")
      .appName("dedup-scale-probe")
      .config("spark.sql.shuffle.partitions", 32)
      .config("spark.sql.session.timeZone", "UTC")
      .config("spark.sql.adaptive.enabled", "true")
      .config("spark.sql.legacy.parquet.nanosAsLong", "true")
      .config("spark.ui.enabled", "false")
      .getOrCreate()
    spark.sparkContext.setLogLevel("WARN")
    graft.functions.expressions.GraftFunctions.init(spark)
    val h = new ProbeHarness(spark, "dedup-scale")
    val base = spark.read.parquet("/root/testdata/sf0.1/documents.parquet")
      .select(col("doc_id"), col("text"))

    def copies(k: Int, disjoint: Boolean): DataFrame = {
      val parts = (0 until k).map { c =>
        val d = base.withColumn("doc_id", col("doc_id") + lit(c * 10000000L))
        if (disjoint) d.withColumn("text",
          when(col("text").isNotNull,
            regexp_replace(col("text"), "(\\S+)", "$1_c" + c)))
        else if (c == 0) d
        else d.withColumn("text",
          when(col("text").isNotNull, concat(col("text"), lit(s" v$c"))))
      }
      val path = s"/tmp/graft_dscale/${if (disjoint) "disjoint" else "clone"}_$k"
      parts.reduce(_ unionByName _).repartition(32)
        .write.mode("overwrite").parquet(path)
      spark.read.parquet(path)
    }

    def sigmaDf2(docs: DataFrame): Long =
      docs.select(explode(call_function("graft_ngram_hashes", col("text"), lit(3))).as("gram"))
        .groupBy(col("gram")).agg(count(lit(1)).as("df"))
        .filter(col("df") <= 10000)
        .agg(sum(col("df") * col("df"))).collect().head.getLong(0)

    for (k <- factors) {
      println(s"==== DISJOINT ${k}x (${5000L * k} docs) ====")
      val d = copies(k, disjoint = true)
      d.queryExecution.toRdd.count() // warm the scan
      println(s"[dedup-scale] disjoint ${k}x Sigma-df^2 = ${sigmaDf2(d)}")
      h.timed(s"d3 exact ${k}x") {
        graft.functions.Dedup.ngramJaccardPairs(d, n = 3, threshold = 0.3).count()
      }
      h.timed(s"d13 containment ${k}x") {
        graft.functions.Dedup.ngramContainmentPairs(d, n = 3, threshold = 0.5).count()
      }
      h.timed(s"d14 banded ${k}x") {
        graft.functions.Dedup.ngramJaccardPairsBanded(d, n = 3, threshold = 0.3).count()
      }
    }
    for (k <- factors.filter(_ > 1)) {
      println(s"==== CLONE ${k}x (${5000L * k} docs) ====")
      val c = copies(k, disjoint = false)
      c.queryExecution.toRdd.count()
      println(s"[dedup-scale] clone ${k}x Sigma-df^2 = ${sigmaDf2(c)}")
      try h.timed(s"d3 exact clone ${k}x (default budget)") {
        graft.functions.Dedup.ngramJaccardPairs(c, n = 3, threshold = 0.3).count()
      } catch {
        case e: IllegalStateException =>
          println(s"[dedup-scale] d3 clone ${k}x: GUARD TRIPPED (by design): ${e.getMessage.take(160)}")
      }
      if (k <= 10) h.timed(s"d14 banded clone ${k}x") {
        graft.functions.Dedup.ngramJaccardPairsBanded(c, n = 3, threshold = 0.3).count()
      } else println(s"[dedup-scale] d14 clone ${k}x skipped: output itself is " +
        "quadratic (every cross-copy pair is a true near-dup) — see Scaladoc")
    }
    spark.stop()
  }
}
