package graft
import org.apache.spark.sql.SparkSession
import java.nio.file.{Files, Paths}
/** Driver-run correctness dump: each SparkEntry.queries result → parquet,
  * plus oracle_sql.json, for the driver's DuckDB compare. */
object Verify {
  def main(args: Array[String]): Unit = {
    val Array(sfDir, outDir) = args
    val cpus = sys.env.getOrElse("SPARK_GRAFT_CPUS", "32")
    val spark = SparkSession.builder()
      .master(s"local[$cpus]")
      .config("spark.sql.shuffle.partitions", cpus)
      .config("spark.sql.session.timeZone", "UTC")
      .config("spark.sql.adaptive.enabled", "true")
      .config("spark.sql.legacy.parquet.nanosAsLong", "true")
      .config("spark.ui.enabled", "false")
      .getOrCreate()
    spark.sparkContext.setLogLevel("WARN")
    new java.io.File(outDir).mkdirs()
    // dev-only subset iteration (mirrors Bench); absent in driver runs.
    // NOTE: a subset run rewrites oracle_sql.json with ONLY the subset's
    // entries — point it at a fresh outDir (stale full-run dumps beside a
    // subset json would silently escape the checker's iteration).
    val only = sys.env.get("SPARK_GRAFT_ONLY").map(_.split(",").map(_.trim).toSet)

    def s3(d: Double): String = String.format(java.util.Locale.ROOT, "%.3f", Double.box(d))
    // Same VM-noise witness as Bench (see Bench.scala): correctness runs
    // had none, so a verify timeout/flake was unattributable. Samples land
    // in outDir/verify_meta.json, which the driver ignores but a postmortem
    // can read. Warmup first — the initial execution JIT-compiles the loop.
    def calibrate(): Double = {
      val t0 = System.nanoTime()
      var x = 0x9E3779B97F4A7C15L; var i = 0
      while (i < (1 << 22)) { x = (x ^ (x >>> 30)) * 0xBF58476D1CE4E5B9L + i; i += 1 }
      if (x == 42) println("")
      (System.nanoTime() - t0) / 1e9
    }
    calibrate()
    val calEvery = 4
    val cal = scala.collection.mutable.ArrayBuffer[Double](calibrate())

    // shared-cache warmup, mirroring Bench (incl. its subset guard: a
    // subset run may target a dir without the TPC tables): without it the
    // first g-query absorbs the whole graph build and per-query times mean
    // nothing
    val warm = only.isEmpty || sys.env.get("SPARK_GRAFT_WARM").exists(_ == "1")
    val tBuild = System.nanoTime()
    if (warm) {
      graft.gate.GateQueries.graph(spark, sfDir).edges.count()
      val mailPath = graft.bench.MailGraph.generate("/tmp/graft_mail_data.txt")
      graft.bench.MailGraph.miwCached(spark, mailPath).edges.count()
    }
    val buildSec = (System.nanoTime() - tBuild) / 1e9

    // process-CPU witness, shared with Bench (graft.util.CpuWitness)
    val cpuT0 = graft.util.CpuWitness.processCpuSec
    val failed = scala.collection.mutable.ArrayBuffer[String]()
    val timings = SparkEntry.queries.toSeq.sortBy(_._1)
      .filter { case (name, _) => only.forall(_.contains(name)) }
      .zipWithIndex.map { case ((name, fn), i) =>
      if (i > 0 && i % calEvery == 0) cal += calibrate()
      val t0 = System.nanoTime()
      // repartition(1), NOT coalesce(1): coalesce folds the single-file
      // constraint INTO the query plan, collapsing every upstream stage to
      // one task — siw's 16-branch union ran its 16 text re-parses serially
      // on one thread (24 s isolated vs 2 s under Bench's parallel count).
      // repartition keeps upstream parallelism and only shuffles the small
      // result to one writer.
      try fn(spark, sfDir).repartition(1).write.mode("overwrite")
        .parquet(s"$outDir/$name")
      catch { case e: Throwable =>
        System.err.println(s"[verify] $name failed: ${e.getMessage}")
        failed += name
      }
      name -> (System.nanoTime() - t0) / 1e9
    }
    cal += calibrate()

    // Recall of the approximate tier against its hash-checked exact twin
    // (the same parquet dumps the driver compares): regressions in
    // approximation QUALITY — not just machinery correctness — become a
    // number visible across rounds. recall = |exact ∩ approx| / |exact|
    // over the key columns (rank-insensitive, the standard recall@k).
    val ranOk = timings.map(_._1).toSet -- failed
    def recallOf(approx: String, exact: String, keys: Seq[String]): Option[(String, Double)] =
      if (ranOk(approx) && ranOk(exact)) {
        import org.apache.spark.sql.functions.col
        val a = spark.read.parquet(s"$outDir/$approx").select(keys.map(col): _*)
        val e = spark.read.parquet(s"$outDir/$exact").select(keys.map(col): _*)
        val denom = e.count()
        if (denom == 0) None
        else Some(s"${approx.split('_').head}_vs_${exact.split('_').head}" ->
          e.join(a, keys, "left_semi").count().toDouble / denom)
      } else None
    val recalls = Seq(
      recallOf("e2_ann_lsh_topk", "e6_ann_lsh_exact", Seq("query_id", "neighbor_id")),
      recallOf("e4_ann_ivf_topk", "e5_ann_ivf_exact", Seq("query_id", "neighbor_id")),
      recallOf("e7_ann_pq_topk", "e1_ann_bruteforce_topk", Seq("query_id", "neighbor_id")),
      recallOf("e8_ann_ivfpq_topk", "e1_ann_bruteforce_topk", Seq("query_id", "neighbor_id")),
      recallOf("e9_ann_sq8_topk", "e1_ann_bruteforce_topk", Seq("query_id", "neighbor_id")),
      recallOf("e10_ann_ivfsq8_topk", "e1_ann_bruteforce_topk", Seq("query_id", "neighbor_id")),
      recallOf("e15_ann_projected_topk", "e1_ann_bruteforce_topk", Seq("query_id", "neighbor_id")),
      recallOf("d4_embedding_near_dups", "d6_embedding_dups_exact", Seq("doc_a", "doc_b")),
      recallOf("d9_semantic_dedup", "d6_embedding_dups_exact", Seq("doc_a", "doc_b")),
      recallOf("d17_semantic_dedup_auto", "d6_embedding_dups_exact", Seq("doc_a", "doc_b")),
      recallOf("e17_mutual_knn_ivf", "e18_mutual_knn_planted_exact", Seq("a", "b"))
    ).flatten

    // JSON string escape: backslash, quote, and ALL control chars (<0x20)
    // — a tab or CR in builder-authored SQL would otherwise make the
    // driver's json.load fail and silently zero the round's correctness.
    def q(s: String): String = "\"" + s.flatMap {
      case '"'  => "\\\""
      case '\\' => "\\\\"
      case '\n' => "\\n"
      case '\r' => "\\r"
      case '\t' => "\\t"
      case c if c < ' ' => f"\\u${c.toInt}%04x"
      case c => c.toString
    } + "\""
    val json = SparkEntry.oracleSql
      .filter { case (k, _) => only.forall(_.contains(k)) }
      .map { case (k, v) => s"${q(k)}: ${q(v)}" }.mkString("{", ",", "}")
    Files.writeString(Paths.get(s"$outDir/oracle_sql.json"), json)
    val meta = s"""{"build_sec":${s3(buildSec)},"cpu_sec":${
        s3(graft.util.CpuWitness.delta(cpuT0, graft.util.CpuWitness.processCpuSec))},""" +
      s""""cal":${cal.map(s3).mkString("[", ",", "]")},"cal_every":$calEvery,""" +
      s""""queries":${timings.map { case (k, v) => q(k) + ":" + s3(v) }.mkString("{", ",", "}")},""" +
      s""""recall":${recalls.map { case (k, v) => q(k) + ":" + s3(v) }.mkString("{", ",", "}")},""" +
      s""""failed":${failed.map(q).mkString("[", ",", "]")}}"""
    Files.writeString(Paths.get(s"$outDir/verify_meta.json"), meta)
    System.err.println(s"[verify] summary: $meta")
    spark.stop()
  }
}
