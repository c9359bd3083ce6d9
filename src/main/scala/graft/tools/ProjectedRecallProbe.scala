package graft.tools

import org.apache.spark.sql.SparkSession
import org.apache.spark.sql.functions._

/** Scratch measurement harness: e15 projectedTopK recall/wall across
  * (outDim, shortlist) on the gate config. Numbers land in SCALING.md. */
object ProjectedRecallProbe {
  def main(args: Array[String]): Unit = {
    val spark = SparkSession.builder()
      .master("local[32]")
      .config("spark.sql.shuffle.partitions", 32)
      .appName("projected-recall-probe")
      .getOrCreate()
    spark.sparkContext.setLogLevel("WARN")
    val emb = spark.read.parquet(args(0) + "/embeddings.parquet")
    val q = emb.filter(col("vec_id") < 50)
    val exact = graft.functions.Similarity.bruteForceTopK(q, emb, k = 10)
      .select("query_id", "neighbor_id").collect()
      .map(r => (r.getLong(0), r.getLong(1))).toSet
    for (outDim <- Seq(32, 48); shortlist <- Seq(200, 400, 800)) {
      val t0 = System.nanoTime()
      val got = graft.functions.Similarity.projectedTopK(q, emb, k = 10,
          outDim = outDim, shortlist = shortlist)
        .select("query_id", "neighbor_id").collect()
        .map(r => (r.getLong(0), r.getLong(1))).toSet
      val w = (System.nanoTime() - t0) / 1e9
      println(f"RESULT outDim=$outDim shortlist=$shortlist recall=${(got & exact).size.toDouble / exact.size}%.3f wall=$w%.2f")
    }
    spark.stop()
  }
}
