package graft.tools

import org.apache.spark.sql.SparkSession
import org.apache.spark.sql.functions._

/** d4's recall at 10× corpus vs its table count (round 15): the sf1
  * full-suite bench read d4_vs_d6 recall 0.42 (sf0.1: 1.00). Cause
  * hypothesis: cosineDuplicates' adaptive bits (= log2(n/32)) hold
  * per-bucket WORK constant as the corpus grows, but each added bit
  * lowers per-table collision probability for a fixed-angle pair —
  * (1 − θ/π)^bits — so at FIXED tables=8 recall must decay with log n.
  * The compensating knob is tables (or probes); this probe measures the
  * recall-vs-tables curve at 10× against the same exact twin the bench
  * rider uses (exhaustive cosine pairs over the unperturbed copy-0
  * vec_id < 1000 slice — identical at both scales), turning the sf1
  * observation into a measured knob contract (the e17 k ∝ n precedent).
  * One-off diagnostic, not a gate: results land in SCALING.md.
  */
object D4ScaleRecallProbe {
  def main(args: Array[String]): Unit = {
    val spark = SparkSession.builder().master("local[32]")
      .appName("d4-scale-recall-probe")
      .config("spark.sql.shuffle.partitions", 32)
      .config("spark.sql.adaptive.enabled", "true")
      .config("spark.sql.legacy.parquet.nanosAsLong", "true")
      .config("spark.ui.enabled", "false")
      .getOrCreate()
    spark.sparkContext.setLogLevel("WARN")
    import graft.functions.Similarity

    val emb10 = spark.read.parquet("/tmp/graft_sf1_embeddings.parquet").localCheckpoint(true)
    def pairSet(df: org.apache.spark.sql.DataFrame): Set[(Long, Long)] =
      df.select(col("doc_a").cast("long"), col("doc_b").cast("long"))
        .collect().map(r => (r.getLong(0), r.getLong(1))).toSet
    // the bench rider's exact twin: exhaustive pairs over the copy-0
    // vec_id < 1000 slice (unperturbed — identical to the 1× twin)
    val exact = pairSet(Similarity.cosineDuplicates(
      emb10.filter(col("vec_id") < 1000), threshold = 0.35, dim = 64,
      exhaustive = true))
    println(s"[d4probe] exact twin pairs: ${exact.size}")

    for (tables <- Seq(8, 16, 32, 64, -1)) { // -1 = the adaptive formula
      val t0 = System.nanoTime()
      val got = pairSet(Similarity.cosineDuplicates(
        emb10, threshold = 0.35, dim = 64, bits = -1, tables = tables,
        probes = -1))
      val wall = (System.nanoTime() - t0) / 1e9
      val recall = if (exact.isEmpty) 1.0 else (got & exact).size.toDouble / exact.size
      println(f"[d4probe] 10x tables=$tables: recall=$recall%.3f " +
        f"pairs=${got.size} wall=$wall%.1f s")
    }

    // d9's twin question (sf1 bench: d9_vs_d6 0.51 at nAssign=3): cluster
    // count k = n/256 scales with the corpus, so cluster boundaries get
    // FINER and a fixed soft-assignment width recovers a shrinking share
    // of near-threshold boundary pairs — sweep nAssign at 10× to measure
    // the compensating knob's curve (pair cost stays nAssign²-bounded)
    for (na <- Seq(3, 4, 6, 8, 12)) {
      val t0 = System.nanoTime()
      val got = pairSet(Similarity.semanticDedup(
        emb10, threshold = 0.35, nClusters = -1, nAssign = na))
      val wall = (System.nanoTime() - t0) / 1e9
      val recall = if (exact.isEmpty) 1.0 else (got & exact).size.toDouble / exact.size
      println(f"[d4probe] 10x d9 nAssign=$na: recall=$recall%.3f " +
        f"pairs=${got.size} wall=$wall%.1f s")
    }
    spark.stop()
  }
}
