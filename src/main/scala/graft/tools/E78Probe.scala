package graft.tools
import org.apache.spark.sql.SparkSession
import org.apache.spark.sql.functions._
object E78Probe {
  def main(args: Array[String]): Unit = {
    val spark = SparkSession.builder().master("local[32]")
      .config("spark.sql.shuffle.partitions", 32).appName("e78probe").getOrCreate()
    spark.sparkContext.setLogLevel("WARN")
    val emb = spark.read.parquet(args(0) + "/embeddings.parquet")
    val q = emb.filter(col("vec_id") < 50)
    val exact = graft.functions.Similarity.bruteForceTopK(q, emb, k = 10)
      .select("query_id", "neighbor_id").collect()
      .map(r => (r.getLong(0), r.getLong(1))).toSet
    for (rr <- Seq(4, 8, 16)) {
      val t0 = System.nanoTime()
      val e7 = graft.functions.Similarity.pqTopK(q, emb, k = 10,
          nSub = 16, nCodes = 64, lloydIters = 2, rerank = rr)
        .select("query_id", "neighbor_id").collect()
        .map(r => (r.getLong(0), r.getLong(1))).toSet
      val w7 = (System.nanoTime() - t0) / 1e9
      val t1 = System.nanoTime()
      val e8 = graft.functions.Similarity.ivfPqTopK(q, emb, k = 10,
          nCentroids = 16, nProbe = 6, nSub = 16, nCodes = 64,
          lloydIters = 2, nAssign = 2, rerank = rr)
        .select("query_id", "neighbor_id").collect()
        .map(r => (r.getLong(0), r.getLong(1))).toSet
      val w8 = (System.nanoTime() - t1) / 1e9
      println(f"RESULT rerank=$rr e7=${(e7 & exact).size.toDouble / exact.size}%.3f w7=$w7%.1f e8=${(e8 & exact).size.toDouble / exact.size}%.3f w8=$w8%.1f")
    }
    spark.stop()
  }
}
