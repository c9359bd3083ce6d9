package graft.tools
import org.apache.spark.sql.SparkSession
import org.apache.spark.sql.functions._
object D9Probe {
  def main(args: Array[String]): Unit = {
    val spark = SparkSession.builder().master("local[32]")
      .config("spark.sql.shuffle.partitions", 32).appName("d9probe").getOrCreate()
    spark.sparkContext.setLogLevel("WARN")
    val emb = spark.read.parquet(args(0) + "/embeddings.parquet")
    val exact = graft.functions.Similarity.cosineDuplicates(emb, 0.35, dim = 64,
        exhaustive = true)
      .select("doc_a", "doc_b").collect().map(r => (r.getLong(0), r.getLong(1))).toSet
    for (na <- Seq(2, 3, 4)) {
      val t0 = System.nanoTime()
      val pairs = graft.functions.Similarity.semanticDedup(emb, 0.35, nClusters = -1,
          nAssign = na)
        .select("doc_a", "doc_b").collect().map(r => (r.getLong(0), r.getLong(1))).toSet
      println(f"RESULT nAssign=$na recall=${(pairs & exact).size.toDouble / math.max(exact.size, 1)}%.3f wall=${(System.nanoTime() - t0) / 1e9}%.2f pairs=${pairs.size}")
    }
    spark.stop()
  }
}
