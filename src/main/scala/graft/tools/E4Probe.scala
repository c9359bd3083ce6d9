package graft.tools
import org.apache.spark.sql.SparkSession
import org.apache.spark.sql.functions._
object E4Probe {
  def main(args: Array[String]): Unit = {
    val spark = SparkSession.builder().master("local[32]")
      .config("spark.sql.shuffle.partitions", 32).appName("e4probe").getOrCreate()
    spark.sparkContext.setLogLevel("WARN")
    val emb = spark.read.parquet(args(0) + "/embeddings.parquet")
    val q = emb.filter(col("vec_id") < 50)
    val exact = graft.functions.Similarity.bruteForceTopK(q, emb, k = 10)
      .select("query_id", "neighbor_id").collect()
      .map(r => (r.getLong(0), r.getLong(1))).toSet
    for ((np, na) <- Seq((4, 2), (6, 2), (6, 3), (8, 2))) {
      val t0 = System.nanoTime()
      val a = graft.functions.Similarity.ivfTopK(q, emb, k = 10, nCentroids = 16,
          nProbe = np, lloydIters = 3, nAssign = na)
        .select("query_id", "neighbor_id").collect()
        .map(r => (r.getLong(0), r.getLong(1))).toSet
      println(f"RESULT nProbe=$np nAssign=$na recall=${(a & exact).size.toDouble / exact.size}%.3f wall=${(System.nanoTime() - t0) / 1e9}%.2f")
    }
    spark.stop()
  }
}
