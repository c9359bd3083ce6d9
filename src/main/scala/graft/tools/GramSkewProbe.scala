package graft.tools

import org.apache.spark.sql.SparkSession
import org.apache.spark.sql.functions._
import org.apache.spark.sql.expressions.Window

/** Scratch measurement (round 13, VERDICT r12 #4): the gram-df window
  * skew valve. A clone-heavy corpus plants one boilerplate trigram in
  * EVERY doc (df = |corpus|); without the valve the df window's hash
  * shuffle lands that gram's whole posting list in one partition — the
  * per-task max shuffle-read witnesses the skew directly. With the
  * Misra–Gries valve the provably-heavy gram is broadcast-dropped
  * BEFORE the window, so the max task is bounded by the df cap
  * (+ cross-partition slack) regardless of corpus size. Numbers land in
  * SCALING.md. Usage: [nDocs] (default 1,000,000).
  */
object GramSkewProbe {
  def main(args: Array[String]): Unit = {
    val n = args.headOption.map(_.toLong).getOrElse(1000000L)
    val spark = SparkSession.builder().master("local[32]")
      .appName("gram-skew-probe")
      .config("spark.sql.shuffle.partitions", 32)
      .getOrCreate()
    spark.sparkContext.setLogLevel("WARN")
    graft.functions.expressions.GraftFunctions.init(spark)

    // per-task max shuffle read: the skew witness (total bytes hides it)
    val maxRead = new java.util.concurrent.atomic.AtomicLong
    val totRead = new java.util.concurrent.atomic.AtomicLong
    spark.sparkContext.addSparkListener(new org.apache.spark.scheduler.SparkListener {
      override def onTaskEnd(te: org.apache.spark.scheduler.SparkListenerTaskEnd): Unit =
        if (te.taskMetrics != null) {
          val r = te.taskMetrics.shuffleReadMetrics.totalBytesRead
          maxRead.getAndUpdate(m => math.max(m, r)); totRead.addAndGet(r)
        }
    })

    // every doc: the SAME 4-token boilerplate prefix (3 planted mega-df
    // trigrams) + 6 unique filler tokens (normal-df tail)
    val docs = spark.range(n).select(col("id").as("doc_id"),
      concat(lit("common boiler plate anchor "),
        lit("u"), col("id"), lit(" v"), col("id"), lit(" w"), col("id"),
        lit(" x"), col("id"), lit(" y"), col("id"), lit(" z"), col("id")).as("text"))
      .localCheckpoint(true)
    println(s"[gram-skew] corpus n=$n (planted trigram df = n)")

    def t(label: String)(f: => Long): Unit = {
      Thread.sleep(300); maxRead.set(0); totRead.set(0)
      val t0 = System.nanoTime(); val rows = f
      Thread.sleep(300) // listener bus drain
      println(f"[gram-skew] $label: ${(System.nanoTime() - t0) / 1e9}%.2f s " +
        f"($rows rows, maxTaskRead=${maxRead.get() / 1048576.0}%.1f MiB, " +
        f"totRead=${totRead.get() / 1048576.0}%.1f MiB)")
    }

    for (pass <- 1 to 2) {
      // A: the pre-round-13 body — df window straight over the postings
      t(s"no-valve window pass $pass") {
        docs.select(col("doc_id").as("id"),
            explode(call_function("graft_ngram_hashes", col("text"), lit(3))).as("gram"))
          .withColumn("df", count(lit(1)).over(Window.partitionBy("gram")))
          .filter(col("df") <= 10000).drop("df")
          .queryExecution.toRdd.count()
      }
      // B: the shipped body (MG valve + window)
      t(s"valve pass $pass") {
        graft.functions.Dedup.prunedGramPostings(docs, 3, "text", "doc_id", 10000)
          .queryExecution.toRdd.count()
      }
    }
    spark.stop()
  }
}
