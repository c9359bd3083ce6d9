package graft.tools
import org.apache.spark.sql.SparkSession
import org.apache.spark.sql.functions._
object E2Probe {
  def main(args: Array[String]): Unit = {
    val spark = SparkSession.builder().master("local[32]")
      .config("spark.sql.shuffle.partitions", 32).appName("e2probe").getOrCreate()
    spark.sparkContext.setLogLevel("WARN")
    val emb = spark.read.parquet(args(0) + "/embeddings.parquet")
    val q = emb.filter(col("vec_id") < 50)
    val exact = graft.functions.Similarity.bruteForceTopK(q, emb, k = 10)
      .select("query_id", "neighbor_id").collect()
      .map(r => (r.getLong(0), r.getLong(1))).toSet
    for ((bits, tables, p1, p2) <- Seq((10, 4, 10, 45), (10, 8, 10, 45),
        (8, 8, 8, 28), (12, 8, 12, 66))) {
      val t0 = System.nanoTime()
      val a = graft.functions.Similarity.lshTopK(q, emb, k = 10, dim = 64,
          bits = bits, tables = tables, probes = p1, probes2 = p2)
        .select("query_id", "neighbor_id").collect()
        .map(r => (r.getLong(0), r.getLong(1))).toSet
      println(f"RESULT bits=$bits tables=$tables p1=$p1 p2=$p2 recall=${(a & exact).size.toDouble / exact.size}%.3f wall=${(System.nanoTime() - t0) / 1e9}%.2f")
    }
    spark.stop()
  }
}
