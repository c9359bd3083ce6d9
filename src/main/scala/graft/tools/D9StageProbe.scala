package graft.tools

import org.apache.spark.sql.SparkSession
import org.apache.spark.sql.functions._

/** Scratch: where does d9's first-touch go — centroid training, soft
  * assignment, or the pair stage? */
object D9StageProbe {
  def main(args: Array[String]): Unit = {
    val spark = SparkSession.builder()
      .master("local[32]")
      .config("spark.sql.shuffle.partitions", 32)
      .appName("d9-stage-probe")
      .getOrCreate()
    spark.sparkContext.setLogLevel("WARN")
    val emb = spark.read.parquet(args(0) + "/embeddings.parquet")
    def t[A](label: String)(f: => A): A = {
      val t0 = System.nanoTime(); val r = f
      println(f"PHASE $label ${(System.nanoTime() - t0) / 1e9}%.2f s"); r
    }
    for (pass <- 1 to 2) {
      val n = t(s"pass$pass-full-semanticDedup") {
        graft.functions.Similarity.semanticDedup(emb, threshold = 0.35,
          nClusters = -1, nAssign = 3).count()
      }
      println(s"pairs=$n")
    }
    spark.stop()
  }
}
