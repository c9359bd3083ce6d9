package graft.tools

import org.apache.spark.sql.{DataFrame, SparkSession}
import org.apache.spark.sql.functions._

/** Validate semanticDedup's `nAssign = -1` auto-calibration (round 16;
  * VERDICT r15 #1): the 10× isotropic run measured recall 0.507 at the
  * shipped manual nAssign=3 — the one quality-at-scale decay without an
  * auto-scale formula. The fix measures the width on the trained model
  * (Monte-Carlo boundary-miss probe at the threshold radius,
  * Similarity.calibratedAssignWidth). Done-criteria checked here:
  *  - 10× ISOTROPIC corpus, nAssign = -1: recall >= 0.90 vs the exact
  *    twin (the d4 probe protocol: exhaustive cosine pairs over the
  *    unperturbed copy-0 vec_id < 1000 slice);
  *  - CLUSTERED corpus (PlantedCorpus, the real-embedding geometry
  *    class): auto width stays SMALL (the D9GeometryProbe finding that
  *    clustered corpora saturate at 2-3) and recall holds;
  *  - driver sf0.1 (gate scale): auto recall >= the manual gate's, so
  *    a user switching to -1 never regresses.
  * Results land in SCALING.md. One-off diagnostic, not a gate — the
  * standing guard is ScaleRecallSpec.
  */
object D9ScaleRecallProbe {
  def main(args: Array[String]): Unit = {
    val spark = SparkSession.builder().master("local[32]")
      .appName("d9-scale-recall-probe")
      .config("spark.sql.shuffle.partitions", 32)
      .config("spark.sql.adaptive.enabled", "true")
      .config("spark.sql.legacy.parquet.nanosAsLong", "true")
      .config("spark.ui.enabled", "false")
      .getOrCreate()
    spark.sparkContext.setLogLevel("WARN")
    import graft.functions.Similarity

    def pairSet(df: DataFrame): Set[(Long, Long)] =
      df.select(col("doc_a").cast("long"), col("doc_b").cast("long"))
        .collect().map(r => (r.getLong(0), r.getLong(1))).toSet

    def run(tag: String, emb: DataFrame, threshold: Double,
        sliceMax: Long, widths: Seq[Int]): Unit = {
      val exact = pairSet(Similarity.cosineDuplicates(
        emb.filter(col("vec_id") < sliceMax), threshold = threshold, dim = 64,
        exhaustive = true))
      println(s"[d9scale] $tag exact twin pairs: ${exact.size}")
      for (na <- widths) {
        val resolved =
          if (na >= 0) na
          else Similarity.calibratedAssignWidth(emb, threshold)
        val t0 = System.nanoTime()
        val got = pairSet(Similarity.semanticDedup(
          emb, threshold = threshold, nClusters = -1, nAssign = na))
        val wall = (System.nanoTime() - t0) / 1e9
        val recall =
          if (exact.isEmpty) 1.0 else (got & exact).size.toDouble / exact.size
        println(f"[d9scale] $tag nAssign=$na (resolved $resolved): " +
          f"recall=$recall%.3f pairs=${got.size} wall=$wall%.1f s")
      }
    }

    // 10x isotropic (the AnnScaleProbe fixture; built here if absent)
    val sf1Path = "/tmp/graft_sf1_embeddings.parquet"
    if (!new java.io.File(sf1Path, "_SUCCESS").exists) {
      val emb = spark.read.parquet("/root/testdata/sf0.1/embeddings.parquet")
      (0 until 10).map { k =>
        val e0 = emb.withColumn("vec_id", col("vec_id") + lit(k * 10000000L))
        if (k == 0) e0
        else e0.withColumn("embedding", expr(
          s"transform(embedding, (x, i) -> cast(x + 0.005d * sin(vec_id * (i + 1) + $k) as float))"))
      }.reduce(_ unionByName _).write.mode("overwrite").parquet(sf1Path)
    }
    val emb10 = spark.read.parquet(sf1Path).localCheckpoint(true)
    run("10x-isotropic(k=79)", emb10, threshold = 0.35, sliceMax = 1000,
      widths = Seq(3, -1))

    // clustered geometry (the D9GeometryProbe corpus): auto must stay small
    val planted = PlantedCorpus.generate(spark, n = 20000, dim = 64,
      clusters = 50, sigma = 0.3).localCheckpoint(true)
    run("clustered(k=79)", planted, threshold = 0.9, sliceMax = 1000,
      widths = Seq(3, -1))

    // driver gate scale: switching the gate default to -1 must not regress
    val emb1 = spark.read.parquet("/root/testdata/sf0.1/embeddings.parquet")
      .localCheckpoint(true)
    run("sf0.1(k=8)", emb1, threshold = 0.35, sliceMax = 1000,
      widths = Seq(3, -1))
    spark.stop()
  }
}
