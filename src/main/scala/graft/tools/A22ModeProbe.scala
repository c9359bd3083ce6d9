package graft.tools

import org.apache.spark.sql.SparkSession

/** Decompose a22 betweenness's cross-JVM bimodality (VERDICT r14 #4:
  * 6.8 s in one JVM mode vs 9.0–9.8 s in another, code byte-identical
  * since the 6.13 s reading; the anchor was re-juggled twice treating the
  * symptom). One probe run = one JVM = one mode sample: warm the
  * co-purchase fixtures exactly as Bench does, then run the a22 gate
  * REPEAT times (default 4) printing per-pass
  *   wall | task count | executor CPU | JVM GC | shuffle fetch-wait |
  *   shuffle bytes | peak mem
  * from task metrics. Launch the probe several times and diff a fast-mode
  * JVM's line against a slow-mode one:
  *   - task counts differ          → AQE/plan flip (pin the plan)
  *   - GC higher, CPU ~equal       → heap/GC pressure (note, stop re-anchoring)
  *   - CPU itself higher           → JIT mode (C2 compile luck, e.g. a hot
  *                                   codegen method hitting the 8k bytecode
  *                                   JIT limit in some JVMs only)
  *   - fetch-wait higher           → shuffle locality/IO
  *   - all equal, wall differs     → scheduler latency between the ~8
  *                                   sequential checkpointed rounds
  *
  * Findings land in SCALING.md ("a22 bimodality decomposition").
  */
object A22ModeProbe {
  def main(args: Array[String]): Unit = {
    val sfDir = sys.env.getOrElse("SPARK_GRAFT_SF_DIR", "/root/testdata/sf0.1")
    val repeat = sys.env.get("PROBE_REPEAT").map(_.toInt).getOrElse(4)
    val spark = SparkSession.builder()
      .master("local[32]")
      .config("spark.sql.shuffle.partitions", 32)
      .config("spark.sql.session.timeZone", "UTC")
      .config("spark.sql.adaptive.enabled", "true")
      .config("spark.sql.legacy.parquet.nanosAsLong", "true")
      .config("spark.ui.enabled", "false")
      .getOrCreate()
    spark.sparkContext.setLogLevel("WARN")

    val tasks = new java.util.concurrent.atomic.AtomicLong
    val cpuNs = new java.util.concurrent.atomic.AtomicLong
    val gcMs = new java.util.concurrent.atomic.AtomicLong
    val fetchWaitMs = new java.util.concurrent.atomic.AtomicLong
    val shufBytes = new java.util.concurrent.atomic.AtomicLong
    val peakMem = new java.util.concurrent.atomic.AtomicLong
    spark.sparkContext.addSparkListener(new org.apache.spark.scheduler.SparkListener {
      override def onTaskEnd(te: org.apache.spark.scheduler.SparkListenerTaskEnd): Unit = {
        val m = te.taskMetrics
        if (m != null) {
          tasks.incrementAndGet()
          cpuNs.addAndGet(m.executorCpuTime)
          gcMs.addAndGet(m.jvmGCTime)
          fetchWaitMs.addAndGet(m.shuffleReadMetrics.fetchWaitTime)
          shufBytes.addAndGet(m.shuffleWriteMetrics.bytesWritten)
          peakMem.updateAndGet(p => math.max(p, m.peakExecutionMemory))
        }
      }
    })
    def snap(): Seq[Long] = {
      org.apache.spark.graft.BusDrain.drain(spark.sparkContext)
      Seq(tasks.get, cpuNs.get, gcMs.get, fetchWaitMs.get, shufBytes.get)
    }

    // Bench's warm path for the a-family fixtures (graph + co-purchase
    // edge relation + support/triangle memos), so pass 1 measures the
    // query, not the shared build
    graft.gate.GateQueries.graph(spark, sfDir).edges.count()
    graft.gate.GateQueries.warmCoPurchase(spark, sfDir)

    // PROBE_COALESCE=0 disables AQE partition coalescing for the timed
    // passes (wall ≈ cpu at ~1.05 effective cores in the baseline probe
    // — if the rounds' stages are being coalesced to single partitions,
    // keeping them wide should parallelize the fixed per-round work)
    if (sys.env.get("PROBE_COALESCE").contains("0"))
      spark.conf.set("spark.sql.adaptive.coalescePartitions.enabled", "false")
    // PROBE_ADVISORY=<bytes> lowers the coalesce target instead (keeps
    // AQE on but aims for more, smaller partitions)
    sys.env.get("PROBE_ADVISORY").foreach(b =>
      spark.conf.set("spark.sql.adaptive.advisoryPartitionSizeInBytes", b))
    val gate = graft.SparkEntry.queries("a22_betweenness")
    for (i <- 1 to repeat) {
      peakMem.set(0)
      val s0 = snap()
      val t0 = System.nanoTime()
      gate(spark, sfDir).queryExecution.toRdd.count()
      val wall = (System.nanoTime() - t0) / 1e9
      val s1 = snap()
      val d = s1.zip(s0).map { case (a, b) => a - b }
      println(f"[a22probe] pass $i: wall=$wall%.2f s tasks=${d(0)} " +
        f"cpu=${d(1) / 1e9}%.2f s gc=${d(2) / 1e3}%.2f s fetchWait=${d(3) / 1e3}%.2f s " +
        f"shuffle=${d(4) / 1048576.0}%.1f MiB peakMem=${peakMem.get / 1048576.0}%.1f MiB")
    }
    spark.stop()
  }
}
