package graft.tools

import org.apache.spark.sql.SparkSession
import org.apache.spark.sql.functions._

/** Scratch measurement (round 12, verdict #4): mutual-kNN sublinear
  * tiers on CLUSTERED geometry ([[PlantedCorpus]]) — recall + wall vs
  * the exact n² anchor, at two corpus sizes so the wall ratio shows the
  * scaling, not a constant. Numbers land in SCALING.md; the winning
  * tier gets a RecallSpec-style floor (MutualKnnClusteredSpec).
  * Usage: n [clusters] (default clusters = n/400). */
object MutualKnnClusteredProbe {
  def main(args: Array[String]): Unit = {
    val n = args.headOption.map(_.toLong).getOrElse(20000L)
    val clusters = args.lift(1).map(_.toInt).getOrElse(math.max(8, (n / 400).toInt))
    val spark = SparkSession.builder()
      .master("local[32]")
      .config("spark.sql.shuffle.partitions", 32)
      .appName("mutual-knn-clustered-probe")
      .getOrCreate()
    spark.sparkContext.setLogLevel("WARN")
    val emb = PlantedCorpus.generate(spark, n, dim = 64, clusters = clusters)
      .localCheckpoint(true) // pay generation once, outside every timing
    println(s"corpus n=$n clusters=$clusters")

    def timed[A](label: String)(f: => A): A = {
      val t0 = System.nanoTime(); val r = f
      println(f"WALL $label ${(System.nanoTime() - t0) / 1e9}%.2f s"); r
    }
    def pairs(df: org.apache.spark.sql.DataFrame): Set[(Long, Long)] =
      df.select("a", "b").collect().map(r => (r.getLong(0), r.getLong(1))).toSet

    val exact = timed("exact-n2") {
      pairs(graft.functions.Similarity.mutualKnnGraph(emb, k = 10))
    }
    println(s"exact edges=${exact.size}")
    val nCent = math.max(16, (n / 256).toInt)
    for ((np, na) <- Seq((2, 1), (2, 2), (4, 2))) {
      for (pass <- 1 to 2) {
        val ivf = timed(s"ivf-nc$nCent-np$np-na$na-p$pass") {
          pairs(graft.functions.Similarity.mutualKnnGraphIvf(
            emb, k = 10, nCentroids = nCent, nProbe = np, nAssign = na))
        }
        println(f"RECALL ivf-nc$nCent-np$np-na$na-p$pass ${(ivf & exact).size.toDouble / exact.size}%.3f")
      }
    }
    for (pass <- 1 to 2) {
      val proj = timed(s"projected-p$pass") {
        pairs(graft.functions.Similarity.mutualKnnGraphProjected(emb, k = 10))
      }
      println(f"RECALL projected-p$pass ${(proj & exact).size.toDouble / exact.size}%.3f")
    }
    spark.stop()
  }
}
