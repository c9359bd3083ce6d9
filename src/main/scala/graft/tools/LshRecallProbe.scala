package graft.tools

import org.apache.spark.sql.SparkSession
import org.apache.spark.sql.functions._

/** Scratch measurement: e2-vs-e6 LSH recall and wall across probe
  * configurations on the gate corpus/config. Numbers land in SCALING.md. */
object LshRecallProbe {
  def main(args: Array[String]): Unit = {
    val spark = SparkSession.builder()
      .master("local[32]")
      .config("spark.sql.shuffle.partitions", 32)
      .appName("lsh-recall-probe")
      .getOrCreate()
    spark.sparkContext.setLogLevel("WARN")
    val emb = spark.read.parquet(args(0) + "/embeddings.parquet")
    val q = emb.filter(col("vec_id") < 50)
    def run(probes: Int, probes2: Int): Set[(Long, Long)] =
      graft.functions.Similarity.lshTopK(q, emb, k = 10, dim = 64, bits = 10, tables = 4,
          probes = probes, probes2 = probes2)
        .select("query_id", "neighbor_id").collect()
        .map(r => (r.getLong(0), r.getLong(1))).toSet
    val exact = graft.functions.Similarity.lshTopK(q, emb, k = 10, dim = 64,
        bits = 0, tables = 1)
      .select("query_id", "neighbor_id").collect()
      .map(r => (r.getLong(0), r.getLong(1))).toSet
    for ((p1, p2) <- Seq((10, 0), (10, 0), (10, 10), (10, 20), (10, 45))) {
      val t0 = System.nanoTime()
      val got = run(p1, p2)
      val rec = (got & exact).size.toDouble / exact.size
      println(f"RESULT probes=$p1 probes2=$p2 recall=$rec%.3f wall=${(System.nanoTime() - t0) / 1e9}%.2f s")
    }
    spark.stop()
  }
}
