package graft.tools

import org.apache.spark.sql.SparkSession
import org.apache.spark.sql.functions._
import org.apache.spark.sql.execution.ExplainMode

/** Scratch: does a repartition(col) survive localCheckpoint vs persist
  * into a downstream join (i.e. no re-Exchange of the big side)? */
object PartitionPreserveProbe {
  def main(args: Array[String]): Unit = {
    val spark = SparkSession.builder().master("local[4]")
      .config("spark.sql.shuffle.partitions", 4)
      .config("spark.sql.adaptive.enabled", "true")
      .appName("partition-preserve-probe").getOrCreate()
    spark.sparkContext.setLogLevel("ERROR")
    import spark.implicits._
    val e = (1L to 1000L).map(i => (i % 37, i)).toDF("src", "dst")
    val scores = (1L to 37L).map(i => (i, 1.0)).toDF("id", "rank")

    val ckpt = e.repartition(col("src")).localCheckpoint(true)
    val j1 = ckpt.join(scores.hint("shuffle_hash"), ckpt("src") === scores("id"))
      .groupBy(ckpt("dst")).agg(sum("rank"))
    println("=== localCheckpoint ===")
    println(j1.queryExecution.explainString(ExplainMode.fromString("formatted"))
      .linesIterator.filter(l => l.contains("Exchange") || l.contains("Join")).mkString("\n"))

    val cached = e.repartition(col("src")).persist()
    cached.count()
    val j2 = cached.join(scores.hint("shuffle_hash"), cached("src") === scores("id"))
      .groupBy(cached("dst")).agg(sum("rank"))
    println("=== persist ===")
    println(j2.queryExecution.explainString(ExplainMode.fromString("formatted"))
      .linesIterator.filter(l => l.contains("Exchange") || l.contains("Join")).mkString("\n"))
    spark.stop()
  }
}
