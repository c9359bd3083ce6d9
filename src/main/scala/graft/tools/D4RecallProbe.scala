package graft.tools

import org.apache.spark.sql.SparkSession
import org.apache.spark.sql.functions._

/** Scratch measurement: d4-vs-d6 cosineDuplicates recall and wall across
  * probe configurations at the gate config. Numbers land in SCALING.md. */
object D4RecallProbe {
  def main(args: Array[String]): Unit = {
    val spark = SparkSession.builder()
      .master("local[32]")
      .config("spark.sql.shuffle.partitions", 32)
      .appName("d4-recall-probe")
      .getOrCreate()
    spark.sparkContext.setLogLevel("WARN")
    val emb = spark.read.parquet(args(0) + "/embeddings.parquet")
    def run(p1: Int, p2: Int): Set[(Long, Long)] =
      graft.functions.Similarity.cosineDuplicates(emb, threshold = 0.35, dim = 64,
          bits = -1, tables = 8, probes = p1, probes2 = p2)
        .select("doc_a", "doc_b").collect()
        .map(r => (r.getLong(0), r.getLong(1))).toSet
    val exact = graft.functions.Similarity.cosineDuplicates(emb, threshold = 0.35,
        dim = 64, exhaustive = true)
      .select("doc_a", "doc_b").collect()
      .map(r => (r.getLong(0), r.getLong(1))).toSet
    for ((p1, p2) <- Seq((0, 0), (0, 0), (2, 0), (4, 0), (4, 6))) {
      val t0 = System.nanoTime()
      val got = run(p1, p2)
      val rec = (got & exact).size.toDouble / exact.size
      println(f"RESULT probes=$p1 probes2=$p2 pairs=${got.size} recall=$rec%.3f wall=${(System.nanoTime() - t0) / 1e9}%.2f s")
    }
    spark.stop()
  }
}
