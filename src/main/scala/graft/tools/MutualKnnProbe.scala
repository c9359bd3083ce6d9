package graft.tools

import org.apache.spark.sql.SparkSession
import org.apache.spark.sql.functions._

/** Scratch: e17 mutualKnnGraphIvf recall/wall across (nCentroids,
  * nProbe, nAssign) vs the e16 exact anchor. */
object MutualKnnProbe {
  def main(args: Array[String]): Unit = {
    val spark = SparkSession.builder()
      .master("local[32]")
      .config("spark.sql.shuffle.partitions", 32)
      .appName("mutual-knn-probe")
      .getOrCreate()
    spark.sparkContext.setLogLevel("WARN")
    val emb = spark.read.parquet(args(0) + "/embeddings.parquet")
    val t0 = System.nanoTime()
    val exact = graft.functions.Similarity.mutualKnnGraph(emb, k = 10)
      .select("a", "b").collect().map(r => (r.getLong(0), r.getLong(1))).toSet
    println(f"EXACT n=${exact.size} wall=${(System.nanoTime() - t0) / 1e9}%.2f")
    val t1 = System.nanoTime()
    val proj = graft.functions.Similarity.mutualKnnGraphProjected(emb, k = 10)
      .select("a", "b").collect().map(r => (r.getLong(0), r.getLong(1))).toSet
    println(f"PROJECTED recall=${(proj & exact).size.toDouble / exact.size}%.3f wall=${(System.nanoTime() - t1) / 1e9}%.2f")
    spark.stop()
  }
}
