package graft.tools

import org.apache.spark.sql.{DataFrame, SparkSession}
import org.apache.spark.sql.functions._

/** Scratch measurement harness for VERDICT r10 #8: does an OPQ-style
  * random rotation lift IVF-PQ recall on the gate corpus? A rotation
  * applied to BOTH sides preserves every dot product exactly, but it
  * re-mixes coordinates BEFORE the PQ subspace split — the first half of
  * OPQ (Ge et al., CVPR 2013), whose full form learns the rotation. On
  * an ISOTROPIC corpus the data distribution is rotation-invariant, so
  * the expectation is NO lift (the residual-knob result, same cause);
  * this probe records the number either way per the measure-don't-assume
  * rule. Rotation = Gram-Schmidt-orthonormalized seeded Gaussian matrix,
  * applied per partition (driver broadcasts 64×64 doubles). */
object OpqRotationProbe {
  def rotationMatrix(dim: Int, seed: Long): Array[Array[Double]] = {
    val rnd = new scala.util.Random(seed)
    val m = Array.fill(dim, dim)(rnd.nextGaussian())
    // modified Gram-Schmidt
    for (i <- 0 until dim) {
      for (j <- 0 until i) {
        val d = (0 until dim).map(k => m(i)(k) * m(j)(k)).sum
        for (k <- 0 until dim) m(i)(k) -= d * m(j)(k)
      }
      val n = math.sqrt((0 until dim).map(k => m(i)(k) * m(i)(k)).sum)
      for (k <- 0 until dim) m(i)(k) /= n
    }
    m
  }

  def rotate(df: DataFrame, m: Array[Array[Double]]): DataFrame = {
    val spark = df.sparkSession
    import spark.implicits._
    val b = spark.sparkContext.broadcast(m)
    df.select(col("vec_id"), col("embedding")).as[(Long, Array[Float])]
      .mapPartitions { it =>
        val r = b.value
        it.map { case (id, v) =>
          val out = new Array[Float](r.length)
          var i = 0
          while (i < r.length) {
            var s = 0.0; var j = 0
            while (j < v.length) { s += r(i)(j) * v(j); j += 1 }
            out(i) = s.toFloat; i += 1
          }
          (id, out)
        }
      }.toDF("vec_id", "embedding")
  }

  def main(args: Array[String]): Unit = {
    val spark = SparkSession.builder().master("local[32]")
      .config("spark.sql.shuffle.partitions", 32).appName("opq-probe").getOrCreate()
    spark.sparkContext.setLogLevel("WARN")
    val emb = spark.read.parquet(args(0) + "/embeddings.parquet")
    val q = emb.filter(col("vec_id") < 50)
    val exact = graft.functions.Similarity.bruteForceTopK(q, emb, k = 10)
      .select("query_id", "neighbor_id").collect()
      .map(r => (r.getLong(0), r.getLong(1))).toSet
    def recallOf(corpus: DataFrame, queries: DataFrame, rr: Int): Double = {
      val approx = graft.functions.Similarity.ivfPqTopK(queries, corpus, k = 10,
          nCentroids = 16, nProbe = 6, nSub = 16, nCodes = 64,
          lloydIters = 2, nAssign = 2, rerank = rr)
        .select("query_id", "neighbor_id").collect()
        .map(r => (r.getLong(0), r.getLong(1))).toSet
      (approx & exact).size.toDouble / exact.size
    }
    val dim = emb.select(size(col("embedding"))).limit(1).collect().head.getInt(0)
    for (rr <- Seq(0, 4)) {
      println(f"RESULT raw rerank=$rr recall=${recallOf(emb, q, rr)}%.3f")
      for (seed <- Seq(1L, 2L)) {
        val m = rotationMatrix(dim, seed)
        val rotC = rotate(emb, m).localCheckpoint(true)
        val rotQ = rotC.filter(col("vec_id") < 50)
        // rotation preserves dots, so the RAW exact twin stays the truth set
        println(f"RESULT rotated seed=$seed rerank=$rr recall=${recallOf(rotC, rotQ, rr)}%.3f")
      }
    }
    spark.stop()
  }
}
