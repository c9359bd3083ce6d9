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
      // both events.ts generations must be readable here (normalizeTs's
      // LONG pass-through arm needs nanos read AS long, like Bench/Verify)
      .config("spark.sql.legacy.parquet.nanosAsLong", "true")
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
    // events: USER-offset replication (event ids offset too) keeps
    // per-user burst density constant — the round-9 s4 protocol, now
    // reproducible from this tool instead of an ad-hoc build.
    // ts passes through VERBATIM (no normalizeTs before the write): a
    // micros/timestamp-typed source keeps its physical type, so DuckDB
    // oracles (epoch_us(ts) etc.) still run against the scaled dir —
    // Verify works there, not just Bench. Caveat that remains: a
    // NANOS-typed source arrives as BIGINT via the nanosAsLong read
    // config (Spark cannot write TIMESTAMP(NANOS) back), and a scaled
    // copy of THAT generation stays bench-only; every gate query
    // normalizes either shape itself.
    val ev = spark.read.parquet(s"$src/events.parquet")
    val vN = (0 until factor).map { k =>
      ev.withColumn("user_id", col("user_id") + lit(k * 10000000L))
        .withColumn("event_id", col("event_id") + lit(k * 100000000L))
    }.reduce(_ unionByName _)
    vN.write.mode("overwrite").parquet(s"$out/events.parquet")
    println(s"RESULT docs=${spark.read.parquet(s"$out/documents.parquet").count()} " +
      s"emb=${spark.read.parquet(s"$out/embeddings.parquet").count()} " +
      s"events=${spark.read.parquet(s"$out/events.parquet").count()}")
    spark.stop()
  }
}
