package graft.tools

import org.apache.spark.sql.SparkSession
import org.apache.spark.sql.functions._

/** Back the d9 geometry claim with a measurement (round 15): the
  * semanticDedup scaladoc says "the right nAssign also depends on how
  * isotropic the geometry is (clustered corpora need less)" — measured
  * here on the planted CLUSTERED corpus ([[PlantedCorpus]], the real-
  * embedding geometry class) at n = 20,000 (k = n/256 = 79, the same
  * cluster count the isotropic 10× probe ran): recall of cluster-local
  * pairs vs the exhaustive cosine pair set over a bounded slice, at
  * nAssign 1/2/3. On clustered data near-dups share a PLANTED cluster,
  * so the trained Voronoi cells align with the duplicate structure and
  * small widths should already saturate — the isotropic corpus needed
  * 8–12 because its near-threshold pairs sit on arbitrary cell
  * boundaries. Threshold 0.9: pairs within a planted cluster (sigma
  * 0.3 intra-cluster cosines ~0.9+), never across.
  * One-off diagnostic, not a gate: results land in SCALING.md.
  */
object D9GeometryProbe {
  def main(args: Array[String]): Unit = {
    val spark = SparkSession.builder().master("local[32]")
      .appName("d9-geometry-probe")
      .config("spark.sql.shuffle.partitions", 32)
      .config("spark.sql.adaptive.enabled", "true")
      .config("spark.ui.enabled", "false")
      .getOrCreate()
    spark.sparkContext.setLogLevel("WARN")
    import graft.functions.Similarity

    val emb = PlantedCorpus.generate(spark, n = 20000, dim = 64,
      clusters = 50, sigma = 0.3).localCheckpoint(true)
    def pairSet(df: org.apache.spark.sql.DataFrame): Set[(Long, Long)] =
      df.select(col("doc_a").cast("long"), col("doc_b").cast("long"))
        .collect().map(r => (r.getLong(0), r.getLong(1))).toSet
    // exact twin bounded like the bench rider's: exhaustive pairs over
    // the vec_id < 1000 slice (all 50 planted clusters represented)
    val exact = pairSet(Similarity.cosineDuplicates(
      emb.filter(col("vec_id") < 1000), threshold = 0.9, dim = 64,
      exhaustive = true))
    println(s"[d9geom] exact twin pairs (n=20000 clustered, thr 0.9): ${exact.size}")
    for (na <- Seq(1, 2, 3)) {
      val t0 = System.nanoTime()
      val got = pairSet(Similarity.semanticDedup(
        emb, threshold = 0.9, nClusters = -1, nAssign = na))
      val wall = (System.nanoTime() - t0) / 1e9
      val recall = if (exact.isEmpty) 1.0 else (got & exact).size.toDouble / exact.size
      println(f"[d9geom] clustered k=79 nAssign=$na: recall=$recall%.3f " +
        f"pairs=${got.size} wall=$wall%.1f s")
    }
    spark.stop()
  }
}
