package graft.tools

import org.apache.spark.sql.SparkSession
import org.apache.spark.sql.functions._

/** Scratch measurement harness: e4-vs-e5 IVF recall across lloydIters and
  * nProbe on the gate's own corpus/config. Not part of the library
  * surface — numbers land in SCALING.md. */
object IvfRecallProbe {
  def main(args: Array[String]): Unit = {
    val spark = SparkSession.builder()
      .master("local[32]")
      .config("spark.sql.shuffle.partitions", 32)
      .appName("ivf-recall-probe")
      .getOrCreate()
    spark.sparkContext.setLogLevel("WARN")
    val emb = spark.read.parquet(args(0) + "/embeddings.parquet")
    val q = emb.filter(col("vec_id") < 50)
    def topkSet(nProbe: Int, iters: Int, nAssign: Int = 1): Set[(Long, Long)] =
      graft.functions.Similarity.ivfTopK(q, emb, k = 10, nCentroids = 16,
          nProbe = nProbe, lloydIters = iters, nAssign = nAssign)
        .select("query_id", "neighbor_id").collect()
        .map(r => (r.getLong(0), r.getLong(1))).toSet
    val exact = topkSet(16, 1) // full probe = brute force, iters-independent
    for (iters <- Seq(1, 2, 3, 5); np <- Seq(4)) {
      val approx = topkSet(np, iters)
      val rec = (approx & exact).size.toDouble / exact.size
      println(f"RESULT iters=$iters nProbe=$np recall=$rec%.3f")
    }
    for (na <- Seq(1, 2, 3); np <- Seq(4)) {
      val t0 = System.nanoTime()
      val approx = topkSet(np, iters = 3, nAssign = na)
      val rec = (approx & exact).size.toDouble / exact.size
      println(f"RESULT iters=3 nProbe=$np nAssign=$na recall=$rec%.3f wall=${(System.nanoTime() - t0) / 1e9}%.2f s")
    }
    spark.stop()
  }
}
