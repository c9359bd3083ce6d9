package graft.tools

import org.apache.spark.sql.SparkSession
import org.apache.spark.sql.functions._

/** Scratch measurement harness: e7-vs-e1 PQ recall across (nSub, nCodes,
  * lloydIters) on the gate's own corpus/config. Not part of the library
  * surface — numbers land in SCALING.md. */
object PqRecallProbe {
  def main(args: Array[String]): Unit = {
    val spark = SparkSession.builder()
      .master("local[32]")
      .config("spark.sql.shuffle.partitions", 32)
      .appName("pq-recall-probe")
      .getOrCreate()
    spark.sparkContext.setLogLevel("WARN")
    val emb = spark.read.parquet(args(0) + "/embeddings.parquet")
    val q = emb.filter(col("vec_id") < 50)
    val exact = graft.functions.Similarity.bruteForceTopK(q, emb, k = 10)
      .select("query_id", "neighbor_id").collect()
      .map(r => (r.getLong(0), r.getLong(1))).toSet
    for ((ns, nc, li) <- Seq((8, 16, 2), (8, 32, 2), (8, 32, 3), (8, 64, 2),
        (16, 16, 2), (16, 32, 2), (16, 64, 2), (32, 16, 2), (32, 32, 2))) {
      val t0 = System.nanoTime()
      val approx = graft.functions.Similarity.pqTopK(q, emb, k = 10,
          nSub = ns, nCodes = nc, lloydIters = li)
        .select("query_id", "neighbor_id").collect()
        .map(r => (r.getLong(0), r.getLong(1))).toSet
      val rec = (approx & exact).size.toDouble / exact.size
      val bits = ns * (64 - java.lang.Long.numberOfLeadingZeros(nc - 1L))
      println(f"RESULT nSub=$ns nCodes=$nc iters=$li bits=$bits recall=$rec%.3f wall=${(System.nanoTime() - t0) / 1e9}%.2f s")
    }
    spark.stop()
  }
}
