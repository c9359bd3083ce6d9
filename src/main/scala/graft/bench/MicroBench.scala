package graft.bench

import org.apache.spark.sql.SparkSession
import org.apache.spark.sql.functions._

/** Dev-only micro benchmark for operator-level A/B timings (not part of
  * the driver contract): `sbt "runMain graft.bench.MicroBench <name>…"`
  * over SPARK_GRAFT_SF_DIR. Each case warms once and reports 3 timed
  * passes to stderr — the SCALING.md evidence format.
  */
object MicroBench {
  def main(args: Array[String]): Unit = {
    val sfDir = sys.env.getOrElse("SPARK_GRAFT_SF_DIR", "/root/testdata/sf0.1")
    val spark = SparkSession.builder()
      .master(s"local[${sys.env.getOrElse("SPARK_GRAFT_CPUS", "32")}]")
      .config("spark.sql.shuffle.partitions", sys.env.getOrElse("SPARK_GRAFT_CPUS", "32"))
      .config("spark.ui.enabled", "false")
      .getOrCreate()
    spark.sparkContext.setLogLevel("WARN")
    val docs = spark.read.parquet(s"$sfDir/documents.parquet").cache()
    docs.count()

    // force via sum(bit_count(...)): bounded (≤ 64·|docs|), cannot hit the
    // ANSI long-overflow that sum over raw 64-bit signatures does
    val cases: Map[String, () => Long] = Map(
      "simhash_relational" -> (() =>
        graft.functions.Dedup.simHash(docs)
          .agg(sum(bit_count(col("simhash")))).head().getLong(0)),
      "simhash_native" -> (() =>
        graft.functions.Dedup.simHashNative(docs)
          .agg(sum(bit_count(col("simhash")))).head().getLong(0)),
      "repetition_relational" -> (() =>
        graft.functions.TextAnalysis.repetitionFeaturesRelational(docs)
          .agg(sum(col("top_token_frac"))).head().getDouble(0).toLong),
      "repetition_native" -> (() =>
        graft.functions.TextAnalysis.repetitionFeatures(docs)
          .agg(sum(col("top_token_frac"))).head().getDouble(0).toLong))

    val names = if (args.nonEmpty) args.toSeq else cases.keys.toSeq.sorted
    names.foreach { n =>
      val f = cases(n)
      f() // warm
      val times = (1 to 3).map { _ =>
        val t0 = System.nanoTime(); f(); (System.nanoTime() - t0) / 1e9
      }
      System.err.println(f"[micro] $n: ${times.map(t => f"$t%.3f").mkString(" ")} s")
    }
    spark.stop()
  }
}
