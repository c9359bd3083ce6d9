package graft.tools

import org.apache.spark.sql.{DataFrame, SparkSession}
import org.apache.spark.sql.functions._

/** Three-point scaling probe for the two REAL streaming gates (VERDICT
  * r20 #2 — the s-suite is the only gate family with no 1×/10×/100×
  * rows): s13 sessionizeStream (flatMapGroupsWithState, event-time
  * timeouts) and s14 slidingUserActivity (watermarked window
  * aggregation), each through an actual readStream file source exactly
  * like the gates. The question the probe answers, in two slicings of
  * the same ×k corpus (sf0.1's events with user/event ids offset per
  * copy — same ts range, so sessions/windows per user are preserved and
  * state volume scales ×k):
  *
  *  - DATA-PER-BATCH (chunks fixed at the gates' 4): does wall amortize
  *    when each micro-batch carries ×k the rows — i.e. is the gate's
  *    cost per-batch overhead (state-store commit I/O, the round-15
  *    finding) or per-row work?
  *  - BATCH-COUNT (chunk size fixed, chunks = 4k): the 100 TB failure
  *    mode VERDICT asks about — if wall ∝ batches at a fixed driver
  *    floor, a 100×-batch stream is a real 100× problem regardless of
  *    per-batch size.
  *
  * Protocol: a 2-row warm stream first (the Bench warmup — JVM
  * streaming init is a session fixture, not the gates' work), then one
  * timed run per point; state partitions 4 (the gates' committed
  * optimum). One-off diagnostic; results land in SCALING.md.
  * Usage: runMain graft.tools.StreamScaleProbe [factors…] (default 1 10 100)
  */
object StreamScaleProbe {
  def main(args: Array[String]): Unit = {
    val factors = if (args.nonEmpty) args.map(_.toInt).toSeq else Seq(1, 10, 100)
    val spark = SparkSession.builder().master("local[32]")
      .appName("stream-scale-probe")
      .config("spark.sql.shuffle.partitions", 4) // the gates' swept optimum
      .config("spark.sql.session.timeZone", "UTC")
      .config("spark.sql.adaptive.enabled", "true")
      .config("spark.sql.legacy.parquet.nanosAsLong", "true")
      .config("spark.ui.enabled", "false")
      .getOrCreate()
    spark.sparkContext.setLogLevel("WARN")
    import spark.implicits._
    import graft.streaming.EventStreams
    val gap = 3600L * 1000000000L
    val hourNs = 3600L * 1000000000L

    val base = graft.streaming.EventStreams.normalizeTs(
        spark.read.parquet("/root/testdata/sf0.1/events.parquet"))
      .select(col("event_id"), col("ts"), col("user_id"), col("event_type"), col("value"))

    def scaled(k: Int): DataFrame = {
      val path = s"/tmp/graft_sscale/events_$k"
      if (!new java.io.File(path, "_SUCCESS").exists) {
        (0 until k).map { c =>
          base.withColumn("event_id", col("event_id") + lit(c * 100000000L))
            .withColumn("user_id", col("user_id") + lit(c * 10000000L))
        }.reduce(_ unionByName _).repartition(32)
          .write.mode("overwrite").parquet(path)
      }
      spark.read.parquet(path)
    }

    // ts-ordered chunk staging (the stagedEventChunks cut rule: chunk
    // j+1's min ts >= chunk j's max ts, so the 1 s watermark never drops
    // a real event)
    def stageChunks(evs: DataFrame, chunks: Int): (String, Long) = {
      val bounds = evs.agg(min(col("ts")), max(col("ts"))).collect().head
      val (minTs, maxTs) = (bounds.getLong(0), bounds.getLong(1))
      val span = maxTs - minTs + 1
      val stage = java.nio.file.Files.createTempDirectory("graft_sscale_stage").toString
      (0 until chunks).foreach { j =>
        val tmp = java.nio.file.Files.createTempDirectory("graft_sscale_tmp").toString
        evs.filter(expr(s"((ts - ${minTs}L) * $chunks) DIV ${span}L") === j)
          .repartition(1).write.mode("overwrite").parquet(tmp)
        val part = new java.io.File(tmp).listFiles()
          .find(f => f.getName.startsWith("part-") && f.getName.endsWith(".parquet"))
          .getOrElse(throw new IllegalStateException(s"no part file in $tmp"))
        java.nio.file.Files.move(part.toPath,
          java.nio.file.Paths.get(stage, s"chunk-$j.parquet"),
          java.nio.file.StandardCopyOption.ATOMIC_MOVE)
      }
      (stage, maxTs)
    }

    val pushSeq = new java.util.concurrent.atomic.AtomicLong
    def pushChunk(stage: String, j: Int, dir: String): Unit = {
      val tmp = java.nio.file.Paths.get(dir, s".staging-$j")
      java.nio.file.Files.copy(java.nio.file.Paths.get(stage, s"chunk-$j.parquet"), tmp)
      java.nio.file.Files.move(tmp,
        java.nio.file.Paths.get(dir, s"chunk-${pushSeq.incrementAndGet()}.parquet"),
        java.nio.file.StandardCopyOption.ATOMIC_MOVE)
    }
    def pushRow(dir: String, e: EventStreams.Event): Unit = {
      val tmp = java.nio.file.Files.createTempDirectory("graft_sscale_row").toString
      Seq(e).toDF().repartition(1).write.mode("overwrite").parquet(tmp)
      val part = new java.io.File(tmp).listFiles()
        .find(f => f.getName.startsWith("part-") && f.getName.endsWith(".parquet")).get
      java.nio.file.Files.move(part.toPath,
        java.nio.file.Paths.get(dir, s"chunk-${pushSeq.incrementAndGet()}.parquet"),
        java.nio.file.StandardCopyOption.ATOMIC_MOVE)
    }

    val runSeq = new java.util.concurrent.atomic.AtomicLong
    def runPoint(tag: String, kind: String, stage: String, chunks: Int, maxTs: Long): Unit = {
      val dir = java.nio.file.Files.createTempDirectory(s"graft_sscale_$kind").toString
      pushChunk(stage, 0, dir)
      val qname = s"sscale_${kind}_${runSeq.incrementAndGet()}"
      val t0 = System.nanoTime()
      val q = kind match {
        case "s13" =>
          val src = EventStreams.readEventStream(spark, dir)
            .select(col("event_id"), col("ts"), col("user_id"), col("event_type"), col("value"))
            .as[EventStreams.Event]
          EventStreams.sessionizeStream(src, gapNanos = gap, watermarkDelay = "1 second")
            .writeStream.outputMode("append").format("memory").queryName(qname).start()
        case _ =>
          val src = EventStreams.readEventStream(spark, dir)
          EventStreams.slidingUserActivity(src, "1 hour", "30 minutes")
            .writeStream.outputMode("append").format("memory").queryName(qname).start()
      }
      val sentinelGap = if (kind == "s13") gap else hourNs
      try {
        q.processAllAvailable()
        (1 until chunks).foreach { j => pushChunk(stage, j, dir); q.processAllAvailable() }
        pushRow(dir, EventStreams.Event(-1L, maxTs + 100 * sentinelGap, -1L, "view", 0.0))
        q.processAllAvailable()
        pushRow(dir, EventStreams.Event(-2L, maxTs + 101 * sentinelGap, -2L, "view", 0.0))
        q.processAllAvailable()
      } finally q.stop()
      val wall = (System.nanoTime() - t0) / 1e9
      val rows = spark.table(qname).filter(col("user_id") >= 0L).count()
      println(f"[s-scale] $tag $kind: $wall%.2f s ($rows rows, $chunks chunks + 2 sentinels)")
      spark.sql(s"DROP TABLE IF EXISTS $qname")
      def rm(f: java.io.File): Unit = {
        val kids = f.listFiles(); if (kids != null) kids.foreach(rm); f.delete()
      }
      scala.util.Try(rm(new java.io.File(dir)))
    }

    // streaming-runtime warm (the Bench discipline): first streaming
    // query in a session pays one-time init owned by no point
    locally {
      val dir = java.nio.file.Files.createTempDirectory("graft_sscale_warm").toString
      Seq(EventStreams.Event(1L, hourNs, 1L, "view", 0.0),
        EventStreams.Event(2L, 2 * hourNs, 2L, "view", 0.0))
        .toDF().write.mode("append").parquet(dir)
      val src = EventStreams.readEventStream(spark, dir)
        .select(col("event_id"), col("ts"), col("user_id"), col("event_type"), col("value"))
        .as[EventStreams.Event]
      val q = EventStreams.sessionizeStream(src, gapNanos = gap, watermarkDelay = "1 second")
        .writeStream.outputMode("append").format("memory").queryName("sscale_warm").start()
      q.processAllAvailable(); q.stop()
    }

    for (k <- factors) {
      val evs = scaled(k)
      evs.queryExecution.toRdd.count()
      // slicing A: data-per-batch (4 chunks, each ×k rows)
      val (stageA, maxTsA) = stageChunks(evs, 4)
      runPoint(s"data-per-batch ${k}x", "s13", stageA, 4, maxTsA)
      runPoint(s"data-per-batch ${k}x", "s14", stageA, 4, maxTsA)
      // slicing B: batch-count (4k chunks of 1× size)
      if (k > 1) {
        val (stageB, maxTsB) = stageChunks(evs, 4 * k)
        runPoint(s"batch-count ${k}x", "s13", stageB, 4 * k, maxTsB)
        runPoint(s"batch-count ${k}x", "s14", stageB, 4 * k, maxTsB)
      }
    }
    spark.stop()
  }
}
