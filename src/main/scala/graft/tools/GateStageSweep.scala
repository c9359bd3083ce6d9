package graft.tools

import org.apache.spark.sql.SparkSession

/** Round-18 sweep of the WideScanProbe methodology over EVERY gate
  * (VERDICT r17 #1): round 17 found two gates (e16, t6) losing 3.6–19×
  * to file-split-bound stages by profiling a handful by hand — this
  * main profiles all of them so the class is closed by measurement, not
  * sampling. For each gate it runs two passes (pass 2 = steady, the
  * profiled one; warm fixtures are built up front exactly like
  * [[graft.Bench]]) and records every stage's task count, stage wall,
  * max task, and summed task time. A stage is flagged SERIAL when its
  * wall is material (≥ 1 s), it ran fewer tasks than cores, and one
  * task's duration ≈ the stage wall — the e16/t6 signature: scan
  * parallelism pinned to the input's file-split/row-group count rather
  * than the core count.
  *
  * Output: JSONL at SWEEP_OUT (default /tmp/gate_stage_sweep.jsonl),
  * one line per gate: {gate, wall_s, eff_par, stages:[{id, tasks,
  * wall_ms, max_task_ms, sum_task_ms, serial}]} (top stages by wall).
  * eff_par = Σ task time / gate wall — the whole-gate effective thread
  * count on the box. Diagnostic tool, not a gate.
  *
  * Usage: SPARK_GRAFT_SF_DIR=/tmp/graft_sf1_full runMain graft.tools.GateStageSweep
  * Optional SPARK_GRAFT_ONLY=e16_…,t6_… subset; SWEEP_PASSES=n (default 2).
  */
object GateStageSweep {
  def main(args: Array[String]): Unit = {
    val sfDir = sys.env.getOrElse("SPARK_GRAFT_SF_DIR", "/tmp/graft_sf1_full")
    val outPath = sys.env.getOrElse("SWEEP_OUT", "/tmp/gate_stage_sweep.jsonl")
    val passes = sys.env.get("SWEEP_PASSES").map(_.toInt).getOrElse(2)
    val cpus = sys.env.getOrElse("SPARK_GRAFT_CPUS", "32")
    val only = sys.env.get("SPARK_GRAFT_ONLY").map(_.split(",").map(_.trim).toSet)
    // SPARK_GRAFT_CONF passthrough (the graft.Bench experiment knob) so
    // A/B stage-shape comparisons run under the same conf as the bench
    val extraConf = sys.env.get("SPARK_GRAFT_CONF").toSeq
      .flatMap(_.split(";")).map(_.trim).filter(_.contains("="))
      .map { kv => val i = kv.indexOf('='); (kv.take(i), kv.drop(i + 1)) }
    val spark = extraConf.foldLeft(SparkSession.builder()
      .master(s"local[$cpus]")
      .config("spark.sql.shuffle.partitions", cpus)
      .config("spark.sql.session.timeZone", "UTC")
      .config("spark.sql.adaptive.enabled", "true")
      .config("spark.sql.legacy.parquet.nanosAsLong", "true")
      .config("spark.ui.enabled", "false")) { case (b, (k, v)) => b.config(k, v) }
      .getOrCreate()
    spark.sparkContext.setLogLevel("WARN")
    val cores = spark.sparkContext.defaultParallelism

    // per-stage: tasks, stage wall, max single-task, summed task time
    final case class St(tasks: Int, wallMs: Long, maxTaskMs: Long, sumTaskMs: Long)
    val stages = new java.util.concurrent.ConcurrentHashMap[Int, St]()
    spark.sparkContext.addSparkListener(new org.apache.spark.scheduler.SparkListener {
      private val taskMax = new java.util.concurrent.ConcurrentHashMap[Int, Long]()
      private val taskSum = new java.util.concurrent.ConcurrentHashMap[Int, Long]()
      override def onTaskEnd(te: org.apache.spark.scheduler.SparkListenerTaskEnd): Unit =
        if (te.taskInfo != null) {
          taskMax.merge(te.stageId, te.taskInfo.duration, (a, b) => math.max(a, b))
          taskSum.merge(te.stageId, te.taskInfo.duration, Long.box(_) + _)
        }
      override def onStageCompleted(sc: org.apache.spark.scheduler.SparkListenerStageCompleted): Unit = {
        val i = sc.stageInfo
        val wall = (for {s <- i.submissionTime; c <- i.completionTime} yield c - s).getOrElse(-1L)
        stages.put(i.stageId, St(i.numTasks, wall,
          taskMax.getOrDefault(i.stageId, -1L), taskSum.getOrDefault(i.stageId, 0L)))
      }
    })

    // warm phase: identical fixture set to graft.Bench so pass-2 stage
    // profiles measure the QUERY, not first-touch fixture builds
    graft.gate.GateQueries.graph(spark, sfDir).edges.count()
    val mailPath = graft.bench.MailGraph.generate("/tmp/graft_mail_data.txt")
    graft.bench.MailGraph.miwCached(spark, mailPath).edges.count()
    if (new java.io.File(s"$sfDir/embeddings.parquet").exists) {
      val emb = spark.read.parquet(s"$sfDir/embeddings.parquet")
      graft.functions.Similarity.warmClusterIndex(emb, nClusters = -1)
      graft.functions.Similarity.calibratedAssignWidth(emb, threshold = 0.35)
      graft.functions.Similarity.warmClusterIndex(emb, nClusters = 16, lloydIters = 3)
      graft.functions.Similarity.warmClusterIndex(emb, nClusters = 16, lloydIters = 2)
      graft.functions.Similarity.pqCodebooks(emb, nSub = 16, nCodes = 64, lloydIters = 2).count()
    }
    graft.gate.GateQueries.warmLpa(spark, sfDir)
    graft.gate.GateQueries.warmSccs(spark)
    graft.gate.GateQueries.warmCoPurchase(spark, sfDir)
    val planted = graft.gate.GateQueries.plantedEmbeddings(spark)
    graft.functions.Similarity.warmClusterIndex(planted, nClusters = 16, lloydIters = 1)

    val out = new java.io.PrintWriter(new java.io.FileWriter(outPath))
    val names = graft.SparkEntry.queries.toSeq.sortBy(_._1)
      .filter { case (n, _) => only.forall(_.contains(n)) }
    names.foreach { case (name, fn) =>
      try {
        var wall = 0.0
        (1 to passes).foreach { p =>
          org.apache.spark.graft.BusDrain.drain(spark.sparkContext)
          stages.clear()
          val t0 = System.nanoTime()
          fn(spark, sfDir).queryExecution.toRdd.count()
          wall = (System.nanoTime() - t0) / 1e9
          org.apache.spark.graft.BusDrain.drain(spark.sparkContext)
          if (p < passes) stages.clear()
        }
        import scala.jdk.CollectionConverters._
        val all = stages.asScala.toSeq.sortBy(-_._2.wallMs)
        val sumTask = all.map(_._2.sumTaskMs).sum
        val effPar = if (wall > 0) sumTask / 1000.0 / wall else 0.0
        val hot = all.take(6).map { case (sid, s) =>
          val serial = s.wallMs >= 1000 && s.tasks < cores &&
            s.maxTaskMs >= (0.7 * s.wallMs).toLong
          s"""{"id":$sid,"tasks":${s.tasks},"wall_ms":${s.wallMs},"max_task_ms":${s.maxTaskMs},"sum_task_ms":${s.sumTaskMs},"serial":$serial}"""
        }
        val flagged = hot.exists(_.contains("\"serial\":true"))
        out.println(f"""{"gate":"$name","wall_s":$wall%.2f,"eff_par":$effPar%.1f,"serial_stage":$flagged,"stages":[${hot.mkString(",")}]}""")
        out.flush()
        System.err.println(f"[sweep] $name%-28s wall $wall%7.2f s  effPar $effPar%5.1f${if (flagged) "  << SERIAL STAGE" else ""}")
      } catch { case e: Throwable =>
        out.println(s"""{"gate":"$name","error":"${e.getClass.getSimpleName}"}""")
        out.flush()
        System.err.println(s"[sweep] $name FAILED: ${e.getClass.getSimpleName}: ${e.getMessage}")
      }
    }
    out.close()
    println(s"[sweep] wrote $outPath")
    spark.stop()
  }
}
