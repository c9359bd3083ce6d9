package graft.tools

import org.apache.spark.sql.SparkSession
import org.apache.spark.sql.functions._

/** Scratch measurement harness (round 12): e8's recall plateau is
  * COVERAGE — a true neighbor in an unprobed/unassigned partition never
  * reaches the ADC shortlist, no rerank can recover it. Sweep the two
  * coverage knobs at the gate config (nCentroids=16, 16×64 codebook,
  * rerank=8) and find the cheapest setting ≥ 0.9. Numbers land in
  * SCALING.md and the e8 gate comment. */
object E8CoverageProbe {
  def main(args: Array[String]): Unit = {
    val spark = SparkSession.builder()
      .master("local[32]")
      .config("spark.sql.shuffle.partitions", 32)
      .appName("e8-coverage-probe")
      .getOrCreate()
    spark.sparkContext.setLogLevel("WARN")
    val emb = spark.read.parquet(args(0) + "/embeddings.parquet")
    val q = emb.filter(col("vec_id") < 50)
    val exact = graft.functions.Similarity.bruteForceTopK(q, emb, k = 10)
      .select("query_id", "neighbor_id").collect()
      .map(r => (r.getLong(0), r.getLong(1))).toSet
    for ((np, na) <- Seq((6, 2), (8, 2), (10, 2), (6, 3), (8, 3))) {
      // pass 1 pays shared training once; pass 2 is the steady number
      for (pass <- 1 to 2) {
        val t0 = System.nanoTime()
        val approx = graft.functions.Similarity.ivfPqTopK(q, emb, k = 10,
            nCentroids = 16, nProbe = np, nSub = 16, nCodes = 64,
            lloydIters = 2, nAssign = na, rerank = 8)
          .select("query_id", "neighbor_id").collect()
          .map(r => (r.getLong(0), r.getLong(1))).toSet
        val rec = (approx & exact).size.toDouble / exact.size
        println(f"RESULT nProbe=$np nAssign=$na pass=$pass recall=$rec%.3f wall=${(System.nanoTime() - t0) / 1e9}%.2f s")
      }
    }
    spark.stop()
  }
}
