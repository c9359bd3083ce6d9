package graft.tools

import org.apache.spark.sql.{DataFrame, SparkSession}
import org.apache.spark.sql.functions._

/** Three-point (1×/10×/100×) scaling probe for the iterative graph
  * analytics headliners — a11 HITS, a13 Adamic–Adar, a22 sampled
  * betweenness (VERDICT r17 #7): the embedding-side adaptive formulas
  * are three-point validated; this bounds the iteration-count and
  * shuffle-growth story for the graph side the same way. Results land
  * in SCALING.md, with wall + shuffle MiB per point.
  *
  * Corpus protocol (the Sf1ScaleProbe discipline): DISJOINT copies with
  * id offsets — wedge volume, triangle counts and per-iteration join
  * volumes scale exactly ×k, the cleanest denominator for a ratio. The
  * 1× base is a SIXTEENTH-cut co-purchase graph (every 16th order, vs
  * the gates' quarter cut) so the 100× point stays runnable on the
  * 32-thread box while still being a 100×-class relation for these ops.
  *
  * Expected shapes (what "no superlinear surprise" means per op):
  *  - a13: wall and shuffle ∝ k (wedge volume is linear in disjoint
  *    copies; round count n/a).
  *  - a11: per-iteration join volume ∝ k at FIXED iteration count (5) —
  *    wall ∝ k with a constant-rounds story.
  *  - a22: FIXED 8 global md5-min seeds land in ≤ 8 copies, so the
  *    reached frontier does NOT grow with k — wall should be sublinear
  *    (scan-bound: the per-round |E| joins still read the full edge
  *    relation). That sublinearity is the design, not a bug: sampled
  *    centrality at fixed seed count is a fixed-work estimator.
  *
  * One-off diagnostic, not a gate. Usage:
  *   runMain graft.tools.GraphScaleProbe [factors…]   (default 1 10 100)
  */
object GraphScaleProbe {
  def main(args: Array[String]): Unit = {
    val factors = if (args.nonEmpty) args.map(_.toInt).toSeq else Seq(1, 10, 100)
    val spark = SparkSession.builder().master("local[32]")
      .appName("graph-scale-probe")
      .config("spark.sql.shuffle.partitions", 32)
      .config("spark.sql.adaptive.enabled", "true")
      .config("spark.sql.legacy.parquet.nanosAsLong", "true")
      .config("spark.ui.enabled", "false")
      .getOrCreate()
    spark.sparkContext.setLogLevel("WARN")
    import graft.analytics.GraphAnalytics

    val h = new ProbeHarness(spark, "graph-scale")
    val sf = "/root/testdata/sf0.1"

    // 1× base: sixteenth-cut co-purchase edges (u, v), u < v
    val li = spark.read.parquet(s"$sf/lineitem.parquet")
      .filter(col("l_orderkey") % 16 === 0)
      .select(col("l_orderkey").as("ok"), col("l_partkey"))
    val a = li.toDF("ok", "u"); val b = li.toDF("ok", "v")
    val base = a.join(b, "ok").filter(col("u") < col("v")).select("u", "v")

    // 1× base for HITS: the a11 gate subgraph's forward edges (Placed +
    // NextOrder), sixteenth-cut on the order side to keep 100× runnable
    val g0 = graft.gate.GateQueries.graph(spark, sf)
    val hitsBase = g0.edges
      .filter(col("label").isin(graft.gate.GateQueries.Placed,
        graft.gate.GateQueries.NextOrder) && col("dir"))
      .filter((col("dst") % 16 === 0) || (col("src") % 16 === 0))
      .select(col("src"), col("dst"))

    def copies(df: DataFrame, k: Int, cols: Seq[String], stride: Long): DataFrame =
      (0 until k).map { i =>
        cols.foldLeft(df)((d, c) => d.withColumn(c, col(c) + lit(i * stride)))
      }.reduce(_ unionByName _)

    factors.foreach { k =>
      // materialize the replica once so the probe times the OPERATOR,
      // not the 100-way union scan of the base plan
      val edgesPath = s"/tmp/graft_gsp_edges_${k}x.parquet"
      if (!new java.io.File(edgesPath, "_SUCCESS").exists)
        copies(base, k, Seq("u", "v"), 100000000L)
          .write.mode("overwrite").parquet(edgesPath)
      val hitsPath = s"/tmp/graft_gsp_hits_${k}x.parquet"
      if (!new java.io.File(hitsPath, "_SUCCESS").exists)
        copies(hitsBase, k, Seq("src", "dst"), 100000000L)
          .write.mode("overwrite").parquet(hitsPath)
      val edges = spark.read.parquet(edgesPath)
      val hitsEdges = spark.read.parquet(hitsPath)
        .select(col("src"), col("dst"), lit(1).as("label"), lit(true).as("dir"))
      println(s"== factor ${k}x: copurchase |E| = ${edges.count()}, hits |E| = ${hitsEdges.count()} ==")
      val pg = graft.model.PropertyGraph(hitsEdges, graft.gate.GateQueries.ranges)
      (1 to 2).foreach { pass =>
        h.timed(s"a13 adamicAdar ${k}x p$pass")(
          GraphAnalytics.adamicAdar(edges).queryExecution.toRdd.count())
        h.timed(s"a11 hits(5) ${k}x p$pass")(
          GraphAnalytics.hits(pg, numIter = 5).queryExecution.toRdd.count())
        h.timed(s"a22 betweenness ${k}x p$pass")(
          GraphAnalytics.betweennessSampled(edges, nSeeds = 8, maxDepth = 4)
            .queryExecution.toRdd.count())
        // round 19 (VERDICT r18 #6): the peeling heavyweights at the
        // gates' configs. Expected shapes — a7 kcore: degree peel is a
        // per-round groupBy + semi-join, wall/shuffle ∝ k at fixed
        // rounds; a17 ktruss: per-round support recount is the wedge
        // join, ∝ k on disjoint copies (the a13 argument). support0 is
        // recomputed per factor (the memo is gate-dir-keyed, not
        // probe-corpus-keyed).
        // k = 8, not the gate's 16: the sixteenth-cut probe graph is
        // sparser than the gate's quarter cut and its 16-core is EMPTY —
        // a probe peeling to nothing by round 2 measures early-exit
        // plumbing, not peel scaling. The 8-core survives at every factor.
        h.timed(s"a7 kcore(8,6) ${k}x p$pass")(
          GraphAnalytics.kCoreEdges(edges, k = 8, iters = 6)
            .queryExecution.toRdd.count())
        h.timed(s"a17 ktruss(4,3) ${k}x p$pass")(
          GraphAnalytics.kTrussEdges(edges, k = 4, iters = 3)
            .queryExecution.toRdd.count())
      }
    }
    spark.stop()
  }
}
