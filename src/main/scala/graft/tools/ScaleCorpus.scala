package graft.tools

import org.apache.spark.sql.SparkSession
import org.apache.spark.sql.functions._

/** Build an N× scaled copy of a driver corpus for scaling measurements
  * (SCALING.md protocol): documents/embeddings replicated `factor` times
  * with id offsets; non-first document copies carry a variant suffix so
  * clone families gain near-dup (not just exact-dup) members, matching
  * the round-6 4× corpus construction. Usage: srcDir outDir factor. */
object ScaleCorpus {
  def main(args: Array[String]): Unit = {
    val Array(src, out, factorS) = args.take(3)
    val factor = factorS.toInt
    val spark = SparkSession.builder()
      .master("local[32]")
      .config("spark.sql.shuffle.partitions", 32)
      .appName("scale-corpus")
      .getOrCreate()
    spark.sparkContext.setLogLevel("WARN")
    val docs = spark.read.parquet(s"$src/documents.parquet")
    val emb = spark.read.parquet(s"$src/embeddings.parquet")
    val dN = (0 until factor).map { k =>
      val d = docs.withColumn("doc_id", col("doc_id") + lit(k * 10000000L))
      if (k == 0) d
      else d.withColumn("text",
        when(col("text").isNotNull, concat(col("text"), lit(s" v$k"))))
    }.reduce(_ unionByName _)
    dN.write.mode("overwrite").parquet(s"$out/documents.parquet")
    val eN = (0 until factor).map { k =>
      emb.withColumn("vec_id", col("vec_id") + lit(k * 10000000L))
    }.reduce(_ unionByName _)
    eN.write.mode("overwrite").parquet(s"$out/embeddings.parquet")
    println(s"RESULT docs=${spark.read.parquet(s"$out/documents.parquet").count()} " +
      s"emb=${spark.read.parquet(s"$out/embeddings.parquet").count()}")
    spark.stop()
  }
}
