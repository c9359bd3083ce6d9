package graft.tools

import org.apache.spark.sql.SparkSession
import org.apache.spark.sql.functions._

/** Scratch measurement harness: e8-vs-e1 IVF-PQ recall, raw vs residual
  * encoding, at the gate config. Numbers land in SCALING.md. */
object IvfPqRecallProbe {
  def main(args: Array[String]): Unit = {
    val spark = SparkSession.builder()
      .master("local[32]")
      .config("spark.sql.shuffle.partitions", 32)
      .appName("ivfpq-recall-probe")
      .getOrCreate()
    spark.sparkContext.setLogLevel("WARN")
    val emb = spark.read.parquet(args(0) + "/embeddings.parquet")
    val q = emb.filter(col("vec_id") < 50)
    val exact = graft.functions.Similarity.bruteForceTopK(q, emb, k = 10)
      .select("query_id", "neighbor_id").collect()
      .map(r => (r.getLong(0), r.getLong(1))).toSet
    for (resid <- Seq(false, true); (ns, nc) <- Seq((16, 64), (8, 32))) {
      val t0 = System.nanoTime()
      val approx = graft.functions.Similarity.ivfPqTopK(q, emb, k = 10,
          nCentroids = 16, nProbe = 4, nSub = ns, nCodes = nc,
          lloydIters = 2, nAssign = 2, residual = resid)
        .select("query_id", "neighbor_id").collect()
        .map(r => (r.getLong(0), r.getLong(1))).toSet
      val rec = (approx & exact).size.toDouble / exact.size
      println(f"RESULT residual=$resid nSub=$ns nCodes=$nc recall=$rec%.3f wall=${(System.nanoTime() - t0) / 1e9}%.2f s")
    }
    spark.stop()
  }
}
