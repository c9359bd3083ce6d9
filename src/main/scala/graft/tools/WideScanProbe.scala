package graft.tools

import org.apache.spark.sql.SparkSession
import org.apache.spark.sql.functions._

/** Stage-level parallelism probe for the quadratic/compressed exhaustive
  * ANN tiers (round 17): the sf1 sidecar reads e16 at ~3.6 effective
  * threads and e7/e8 at ~5 on a 32-thread box — this prints per-stage
  * task counts and wall so the serialized stage is identified by
  * MEASUREMENT, not AQE folklore. Usage:
  *   SPARK_GRAFT_SF_DIR=/tmp/graft_sf1_full runMain graft.tools.WideScanProbe [e16|e7|both]
  */
object WideScanProbe {
  def main(args: Array[String]): Unit = {
    val sfDir = sys.env.getOrElse("SPARK_GRAFT_SF_DIR", "/tmp/graft_sf1_full")
    val which = args.headOption.getOrElse("both")
    val spark = SparkSession.builder()
      .appName("WideScanProbe").master("local[32]")
      .config("spark.sql.shuffle.partitions", 32)
      .config("spark.driver.memory", "16g")
      .config("spark.sql.autoBroadcastJoinThreshold", 10L << 20)
      .getOrCreate()
    spark.sparkContext.setLogLevel("WARN")

    // per-stage: tasks, wall, max single-task ms — a stage whose maxTask
    // ~= stage wall with few tasks is the serialized culprit
    val stages = new java.util.concurrent.ConcurrentHashMap[Int, (Int, Long, Long)]()
    spark.sparkContext.addSparkListener(new org.apache.spark.scheduler.SparkListener {
      private val taskMax = new java.util.concurrent.ConcurrentHashMap[Int, Long]()
      override def onTaskEnd(te: org.apache.spark.scheduler.SparkListenerTaskEnd): Unit =
        if (te.taskInfo != null)
          taskMax.merge(te.stageId, te.taskInfo.duration, (a, b) => math.max(a, b))
      override def onStageCompleted(sc: org.apache.spark.scheduler.SparkListenerStageCompleted): Unit = {
        val i = sc.stageInfo
        val wall = (for {s <- i.submissionTime; c <- i.completionTime} yield c - s).getOrElse(-1L)
        stages.put(i.stageId, (i.numTasks, wall, taskMax.getOrDefault(i.stageId, -1L)))
      }
    })

    def report(label: String)(f: => Long): Unit = {
      stages.clear()
      val t0 = System.nanoTime(); val rows = f
      println(f"[$label] wall ${(System.nanoTime() - t0) / 1e9}%.1f s, $rows rows")
      import scala.jdk.CollectionConverters._
      val hot = stages.asScala.toSeq.sortBy(-_._2._2).take(8)
      hot.foreach { case (sid, (tasks, wall, maxT)) =>
        println(f"  stage $sid%4d: $tasks%4d tasks, wall ${wall / 1000.0}%7.1f s, maxTask ${maxT / 1000.0}%7.1f s")
      }
    }

    val emb = spark.read.parquet(s"$sfDir/embeddings.parquet")
    println(s"corpus rows=${emb.count()} scanPartitions=${emb.rdd.getNumPartitions}")

    if (which == "plan") {
      val knn = graft.functions.Similarity.bruteForceTopK(emb, emb, 10)
      knn.count()
      println(knn.queryExecution.executedPlan.toString.linesIterator.take(60).mkString("\n"))
    }
    if (which == "e16" || which == "both")
      report("e16 mutualKnnGraph k=10")(
        graft.functions.Similarity.mutualKnnGraph(emb, k = 10).count())
    if (which == "e7" || which == "both")
      report("e7 pqTopK nSub=16 nCodes=64 rerank=8")(
        graft.functions.Similarity.pqTopK(
          emb.filter(col("vec_id") < 50), emb, k = 10,
          nSub = 16, nCodes = 64, lloydIters = 2, rerank = 8).count())
    spark.stop()
  }
}
