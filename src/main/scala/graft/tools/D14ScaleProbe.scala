package graft.tools
import org.apache.spark.sql.SparkSession
object D14ScaleProbe {
  def main(args: Array[String]): Unit = {
    val spark = SparkSession.builder().master("local[32]")
      .config("spark.sql.shuffle.partitions", 32).appName("d14probe").getOrCreate()
    spark.sparkContext.setLogLevel("WARN")
    val docs = spark.read.parquet(args(0) + "/documents.parquet")
    for ((b, r, cap, tag) <- Seq((64, 1, 100000, "exactness"), (16, 2, 1000, "scale"),
        (32, 2, 1000, "scale32"))) {
      for (pass <- 1 to 2) {
        val t0 = System.nanoTime()
        val n = graft.functions.Dedup.ngramJaccardPairsBanded(docs, n = 3,
          threshold = 0.3, bands = b, rowsPerBand = r, maxBucketSize = cap).count()
        println(f"RESULT cfg=$tag pass=$pass bands=$b rows=$r cap=$cap pairs=$n wall=${(System.nanoTime() - t0) / 1e9}%.1f")
      }
    }
    spark.stop()
  }
}
