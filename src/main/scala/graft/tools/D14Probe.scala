package graft.tools

import org.apache.spark.sql.SparkSession
import org.apache.spark.sql.functions._

/** One-off phase decomposition of d14 (banded n-gram Jaccard): times the
  * postings/window pass, the gram-set checkpoint, candidate generation
  * and the exact verify separately so stage-sweep task-time can be
  * attributed to a phase. Diagnostic, not a gate. */
object D14Probe {
  def main(args: Array[String]): Unit = {
    val sfDir = sys.env.getOrElse("SPARK_GRAFT_SF_DIR", "/tmp/graft_sf1_full")
    val spark = SparkSession.builder().master("local[32]")
      .appName("d14-probe")
      .config("spark.sql.shuffle.partitions", 32)
      .config("spark.sql.session.timeZone", "UTC")
      .config("spark.sql.adaptive.enabled", "true")
      .config("spark.sql.legacy.parquet.nanosAsLong", "true")
      .config("spark.ui.enabled", "false")
      .getOrCreate()
    spark.sparkContext.setLogLevel("WARN")
    graft.functions.expressions.GraftFunctions.init(spark)
    val docs = spark.read.parquet(
      sys.env.getOrElse("D14_DOCS", s"$sfDir/documents.parquet"))
    def time[T](label: String)(f: => T): T = {
      val t0 = System.nanoTime(); val r = f
      println(f"[d14probe] $label%-28s ${(System.nanoTime() - t0) / 1e9}%8.2f s"); r
    }
    // warm the scan
    docs.queryExecution.toRdd.count()
    val (n, bands, rowsPerBand) = (3, 64, 1)
    val pruned = graft.functions.Dedup.prunedGramPostings(docs, n, "text", "doc_id", 10000)
    time("pruned postings count") { pruned.queryExecution.toRdd.count() }
    val gramSets = time("gramSets checkpoint") {
      pruned.groupBy(col("id")).agg(collect_list(col("gram")).as("gs"))
        .localCheckpoint(true)
    }
    val sigs = gramSets.select(col("id"),
      call_function("graft_minhash_longs", col("gs"), lit(bands * rowsPerBand)).as("sig"))
    time("sigs count") { sigs.queryExecution.toRdd.count() }
    val candsRaw = graft.functions.Dedup.candidatesFromSigs(sigs, bands, rowsPerBand, Int.MaxValue)
    val rawCount = time("cands raw (pre-distinct)") { candsRaw.count() }
    println(s"[d14probe] raw candidate rows: $rawCount")
    val cands = candsRaw.distinct()
    val cc = time("cands count") { cands.count() }
    println(s"[d14probe] candidates: $cc")
    // exact size-ratio prefilter potential: jaccard >= t needs
    // min(sz)/max(sz) >= t (inter <= min, union >= max)
    val sizes = gramSets.select(col("id"), size(col("gs")).as("sz"))
    val surv = time("ratio-filter survivors") {
      cands.join(sizes.select(col("id").as("doc_a"), col("sz").as("sz_a")), "doc_a")
        .join(sizes.select(col("id").as("doc_b"), col("sz").as("sz_b")), "doc_b")
        .filter(least(col("sz_a"), col("sz_b")).cast("double") >=
          lit(0.3) * greatest(col("sz_a"), col("sz_b")))
        .count()
    }
    println(s"[d14probe] ratio survivors: $surv of $cc")
    // the phases above decompose the tier's internals; the final number
    // is the REAL gate function (incl. the round-20 two-stage verify
    // guard), so probe totals stay comparable to the sweep
    val out = graft.functions.Dedup.ngramJaccardPairsBanded(docs, n, threshold = 0.3)
    val oc = time("full banded gate") { out.count() }
    println(s"[d14probe] pairs: $oc")
    if (sys.env.contains("D14_EXPLAIN"))
      println(out.queryExecution.executedPlan.toString)
    spark.stop()
  }
}
