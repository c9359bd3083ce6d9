package graft.tools

import org.apache.spark.sql.SparkSession
import org.apache.spark.sql.functions._

/** Scale shape of the round-12 sketch tiers: bloom exact decontam (d16)
  * and distinct-token counting, exact vs HLL (t39/t40), at 1× vs the
  * ScaleCorpus 4× documents table. Pass 2 is the steady number (the
  * SccProbe protocol). Expectation: all three linear-ish in |docs|, with
  * the HLL tier's advantage over the exact twin WIDENING (the exact
  * distinct-aggregate's first exchange carries the (source, token) pair
  * set, which grows with corpus; the sketch exchange carries fixed 4 KB
  * registers per group).
  */
object SketchScaleProbe {
  def main(args: Array[String]): Unit = {
    val spark = SparkSession.builder().master("local[32]")
      .appName("sketch-scale-probe")
      .config("spark.sql.shuffle.partitions", 32)
      .getOrCreate()
    spark.sparkContext.setLogLevel("WARN")
    // wall alone under-reports the tiers' difference at local scale (RAM
    // absorbs the exchange), so also witness the bytes SHUFFLED per query
    val shuffled = new java.util.concurrent.atomic.AtomicLong
    spark.sparkContext.addSparkListener(new org.apache.spark.scheduler.SparkListener {
      override def onTaskEnd(te: org.apache.spark.scheduler.SparkListenerTaskEnd): Unit =
        if (te.taskMetrics != null)
          shuffled.addAndGet(te.taskMetrics.shuffleWriteMetrics.bytesWritten)
    })
    // collect(), NOT count(): under count() Catalyst prunes the unreferenced
    // aggregate expressions (a count over an Aggregate keeps only the
    // grouping), so a count-timed "distinct" query never computes the
    // distinct counts at all — measured 0 B shuffled before this fix
    def t(label: String)(f: => Array[_]): Unit = {
      Thread.sleep(300); shuffled.set(0)
      val t0 = System.nanoTime(); val r = f.length
      Thread.sleep(300) // listener bus drain before reading the counter
      println(f"[sketch-probe] $label: ${(System.nanoTime() - t0) / 1e9}%.2f s " +
        f"($r rows, ${shuffled.get() / 1048576.0}%.1f MiB shuffled)")
    }
    for ((name, dir) <- Seq("1x" -> "/root/testdata/sf0.1",
                            "4x" -> "/root/.graft/scale4x")) {
      val docs = spark.read.parquet(s"$dir/documents.parquet").localCheckpoint(true)
      println(s"[sketch-probe] $name docs: ${docs.count()}")
      for (pass <- 1 to 2) {
        t(s"$name d16 bloom decontam pass $pass")(
          graft.functions.Dedup.exactDedupAgainstBloom(
            docs, docs.filter(col("doc_id") % 5 === 0), fpp = 0.2).collect())
        t(s"$name t39 exact distinct pass $pass")(
          graft.functions.TextAnalysis.distinctTokenCounts(docs).collect())
        t(s"$name t40 hll distinct pass $pass")(
          graft.functions.TextAnalysis.distinctTokenEstimates(docs).collect())
      }
    }
    // The driver corpus has a BOUNDED vocabulary, so the exact tier's
    // (source, token) pair exchange saturates and both tiers read as
    // flat overhead — the asymmetry only shows on a high-cardinality
    // corpus where every doc mints fresh tokens (ids, hashes, URLs: the
    // realistic 100 TB distinct-count workload). Deterministic synth:
    // each doc = 20 globally-unique tokens, 20 sources.
    for (n <- Seq(250000L, 1000000L)) {
      val hc = spark.range(n).select(
        concat(lit("s"), (col("id") % 20)).as("source"),
        concat_ws(" ", (0 until 20).map(j =>
          concat(lit("tok"), col("id") * 20 + j)): _*).as("text"))
        .localCheckpoint(true)
      println(s"[sketch-probe] high-card docs: $n (${n * 20} distinct tokens)")
      for (pass <- 1 to 2) {
        t(s"hc $n exact distinct pass $pass")(
          graft.functions.TextAnalysis.distinctTokenCounts(hc).collect())
        t(s"hc $n hll distinct pass $pass")(
          graft.functions.TextAnalysis.distinctTokenEstimates(hc).collect())
      }
    }
    spark.stop()
  }
}
