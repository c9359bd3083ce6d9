package graft.tools

import org.apache.spark.sql.{DataFrame, SparkSession}
import org.apache.spark.sql.functions._

/** Witness for the round-13 incremental k-truss rewrite: naive
  * recompute-per-round (the pre-rewrite shape, reconstructed inline from
  * the public edgeSupport) vs `kTrussEdges`' lost-triangle maintenance,
  * on the a17 gate graph (sf0.1 quarter-cut co-purchase) at k=4/iters=3.
  * Wall + shuffle-bytes per variant (the SketchScaleProbe protocol:
  * pass 2 is the steady number; bytes witness what RAM hides at local
  * scale). Expectation: identical outputs; the incremental path's
  * advantage concentrates in the LATE rounds — truss peeling's removal
  * frontier shrinks geometrically while the naive path re-pays the full
  * O(Σ outdeg²) wedge join on the barely-smaller survivor graph.
  */
object TrussProbe {
  def main(args: Array[String]): Unit = {
    val spark = SparkSession.builder().master("local[32]")
      .appName("truss-probe")
      .config("spark.sql.shuffle.partitions", 32)
      .getOrCreate()
    spark.sparkContext.setLogLevel("WARN")
    import graft.analytics.GraphAnalytics

    val shuffled = new java.util.concurrent.atomic.AtomicLong
    spark.sparkContext.addSparkListener(new org.apache.spark.scheduler.SparkListener {
      override def onTaskEnd(te: org.apache.spark.scheduler.SparkListenerTaskEnd): Unit =
        if (te.taskMetrics != null)
          shuffled.addAndGet(te.taskMetrics.shuffleWriteMetrics.bytesWritten)
    })
    def t(label: String)(f: => Long): Unit = {
      Thread.sleep(300); shuffled.set(0)
      val t0 = System.nanoTime(); val r = f
      Thread.sleep(300)
      println(f"[truss-probe] $label: ${(System.nanoTime() - t0) / 1e9}%.2f s " +
        f"($r edges, ${shuffled.get() / 1048576.0}%.1f MiB shuffled)")
    }

    // the a17 gate graph: quarter-cut co-purchase pairs
    val li = spark.read.parquet("/root/testdata/sf0.1/lineitem.parquet")
      .filter(col("l_orderkey") % 4 === 0)
      .select(col("l_orderkey").as("ok"), col("l_partkey"))
    val edges = li.toDF("ok", "u").join(li.toDF("ok", "v"), "ok")
      .filter(col("u") < col("v")).select("u", "v").localCheckpoint(true)
    println(s"[truss-probe] raw pairs: ${edges.count()}")

    // pre-rewrite shape: full edgeSupport recompute per round
    def naive(k: Int, iters: Int): Long = {
      var e = edges.select(least(col("u"), col("v")).as("a"),
          greatest(col("u"), col("v")).as("b"))
        .filter(col("a") =!= col("b")).distinct().localCheckpoint(true)
      var i = 0; var done = false
      while (i < iters && !done) {
        val next = GraphAnalytics.edgeSupport(e, "a", "b")
          .filter(col("support") >= k - 2).select("a", "b").localCheckpoint(true)
        if (next.count() == e.count()) done = true
        e = next; i += 1
      }
      e.count()
    }

    for (pass <- 1 to 2) {
      t(s"naive recompute k=4 iters=3 pass $pass")(naive(4, 3))
      t(s"incremental k=4 iters=3 pass $pass")(
        GraphAnalytics.kTrussEdges(edges, k = 4, iters = 3).count())
    }
    // equality witness (the property test pins this on random graphs;
    // here on the real gate graph)
    val a = GraphAnalytics.kTrussEdges(edges, 4, 3).collect()
      .map(r => (r.getLong(0), r.getLong(1))).toSet
    val b = {
      var e = edges.select(least(col("u"), col("v")).as("a"),
          greatest(col("u"), col("v")).as("b"))
        .filter(col("a") =!= col("b")).distinct().localCheckpoint(true)
      for (_ <- 1 to 3)
        e = GraphAnalytics.edgeSupport(e, "a", "b")
          .filter(col("support") >= 2).select("a", "b").localCheckpoint(true)
      e.collect().map(r => (r.getLong(0), r.getLong(1))).toSet
    }
    println(s"[truss-probe] outputs equal: ${a == b} (${a.size} edges)")
    spark.stop()
  }
}
