package graft.tools

import org.apache.spark.sql.SparkSession
import org.apache.spark.sql.functions._

/** Streaming-IVF scale measurement (SCALING.md protocol): build indexes
  * over a 1× and a 16× corpus, append the SAME small batch to each, and
  * report the append walls — flat wall across index sizes is the
  * O(|batch|·nlist) evidence for `appendToIvfIndex` (the append path
  * assigns against the broadcast centroid table and writes one
  * partitioned append; it never reads the corpus). Usage: [srcDir]. */
object IvfStreamProbe {
  def main(args: Array[String]): Unit = {
    val src = args.headOption.getOrElse("/root/testdata/sf0.1")
    val spark = SparkSession.builder()
      .master("local[32]")
      .config("spark.sql.shuffle.partitions", 32)
      .appName("ivf-stream-probe")
      .getOrCreate()
    spark.sparkContext.setLogLevel("WARN")
    val emb = spark.read.parquet(s"$src/embeddings.parquet")
      .select(col("vec_id"), col("embedding"))
    val root = java.nio.file.Files.createTempDirectory("graft_ivfprobe").toString
    val batch = emb.limit(16)
      .select((col("vec_id") + lit(900000000L)).as("vec_id"), col("embedding"))
      .localCheckpoint(true)
    for (mult <- Seq(1, 16)) {
      val corpus = (0 until mult)
        .map(i => emb.select((col("vec_id") + lit(i * 10000000L)).as("vec_id"),
          col("embedding")))
        .reduce(_ unionByName _)
      val dir = s"$root/ivf_$mult"
      val n = corpus.count()
      val t0 = System.nanoTime()
      graft.functions.Similarity.saveIvfIndex(corpus, dir, nCentroids = 64)
      val buildWall = (System.nanoTime() - t0) / 1e9
      // warm append (pays plan compilation) then the measured one — the
      // steady-state per-batch cost is what a long-running stream pays
      graft.functions.Similarity.appendToIvfIndex(batch, dir, 0L, "vec_id", "embedding")
      val t1 = System.nanoTime()
      graft.functions.Similarity.appendToIvfIndex(
        batch.select((col("vec_id") + 1000L).as("vec_id"), col("embedding")),
        dir, 1L, "vec_id", "embedding")
      val appendWall = (System.nanoTime() - t1) / 1e9
      println(f"RESULT mult=$mult%2d corpus_n=$n%6d build_wall=$buildWall%6.2f s " +
        f"append_wall=$appendWall%5.2f s (16-vector batch)")
    }
    spark.stop()
  }
}
