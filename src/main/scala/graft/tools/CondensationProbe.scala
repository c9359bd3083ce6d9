package graft.tools

import org.apache.spark.sql.{DataFrame, SparkSession}
import org.apache.spark.sql.functions._

/** Round-halving experiment for a24's condensation layering (VERDICT r13
  * #8): the current delta fixpoint needs one round per DAG depth level
  * (26 sequential rounds at the gate's depth-25 — the wall is round
  * LATENCY, not data). Pointer jumping replaces them with ~log₂(depth)
  * max-plus squarings of the arc relation: A_{2k}(u,v) = max path length
  * ≤ 2k from u to v, built as A_k ⊗ A_k (join on the midpoint, max of
  * summed lengths), then layer(v) = max incoming closure length.
  *
  * The trade: squaring materializes the REACHABILITY closure — up to
  * Ω(n²) arcs on dense DAGs — where the delta fixpoint's total work is
  * Σ out-arcs of changed nodes. This probe measures wall + shuffle-bytes
  * for both on (a) the a24 gate cut (379 SCCs, depth 25) and (b) the 10×
  * mail cut (Sf1ScaleProbe's corpus), with an equality witness. Keep
  * rule (the SccProbe discipline): adopt only on a ≥20% steady win AND a
  * closure size that stays near-linear; otherwise record the negative
  * result in SCALING.md.
  */
object CondensationProbe {
  def main(args: Array[String]): Unit = {
    val spark = SparkSession.builder().master("local[32]")
      .appName("condensation-probe")
      .config("spark.sql.shuffle.partitions", 32)
      .config("spark.sql.adaptive.enabled", "true")
      .config("spark.ui.enabled", "false")
      .getOrCreate()
    spark.sparkContext.setLogLevel("WARN")
    import graft.analytics.GraphAnalytics

    val h = new ProbeHarness(spark, "cond-probe")
    def t(label: String)(f: => Long): Unit = h.timed(label)(f)

    /** Pointer-jumping variant: same (id, scc, layer) output as
      * condensationLayers, layers from the max-plus closure. */
    def byJumping(edges: DataFrame, scc: DataFrame): DataFrame = {
      val e0 = edges.select(col("src").cast("long").as("src"),
        col("dst").cast("long").as("dst"))
      val arcs = e0
        .join(scc.select(col("id").as("src"), col("scc").as("s")), "src")
        .join(scc.select(col("id").as("dst"), col("scc").as("d")), "dst")
        .filter(col("s") =!= col("d")).select(col("s"), col("d")).distinct()
        .localCheckpoint(true)
      var a = arcs.withColumn("w", lit(1L)).localCheckpoint(true)
      var grew = true; var rounds = 0
      while (grew && rounds < 12) { // 2^12 depth cap ≫ any gate DAG
        val sq = a.select(col("s"), col("d").as("m"), col("w").as("w1"))
          .join(a.select(col("s").as("m"), col("d"), col("w").as("w2")), "m")
          .select(col("s"), col("d"), (col("w1") + col("w2")).as("w"))
        val next = a.unionByName(sq)
          .groupBy(col("s"), col("d")).agg(max(col("w")).as("w"))
          .localCheckpoint(true)
        // fixpoint when neither the arc set nor any max length grew —
        // sum(w) is monotone under max-plus union, so it is a cheap
        // witness; sum over ZERO rows is NULL (a cut with no cross-SCC
        // arcs), read as 0 instead of NPE-ing the probe
        def sumW(df: DataFrame): Long = {
          val r = df.agg(sum(col("w"))).collect().head
          if (r.isNullAt(0)) 0L else r.getLong(0)
        }
        val (c0, w0) = (a.count(), sumW(a))
        val (c1, w1) = (next.count(), sumW(next))
        grew = c1 != c0 || w1 != w0
        a = next; rounds += 1
        println(s"[cond-probe]   jump round $rounds: closure ${c1} arcs")
      }
      val layers = scc.select(col("scc").as("s")).distinct()
        .join(a.groupBy(col("d").as("s")).agg(max(col("w")).as("l")), Seq("s"), "left")
        .select(col("s").as("scc"), coalesce(col("l"), lit(0L)).as("layer"))
      scc.join(layers, "scc").select(col("id"), col("scc"), col("layer"))
    }

    def suite(tag: String, mailPath: String, cut: Long): Unit = {
      val edges = graft.bench.MailGraph.miwCached(spark, mailPath).edges
        .filter(col("src") < cut && col("dst") < cut).localCheckpoint(true)
      val scc = GraphAnalytics.stronglyConnectedComponents(edges).localCheckpoint(true)
      for (pass <- 1 to 2) {
        t(s"$tag delta-fixpoint pass $pass")(
          GraphAnalytics.condensationLayers(edges, sccs = Some(scc)).count())
        t(s"$tag pointer-jumping pass $pass")(byJumping(edges, scc).count())
      }
      val aSet = GraphAnalytics.condensationLayers(edges, sccs = Some(scc))
        .collect().map(r => (r.getLong(0), r.getLong(2))).toSet
      val bSet = byJumping(edges, scc)
        .collect().map(r => (r.getLong(0), r.getLong(2))).toSet
      println(s"[cond-probe] $tag equality: ${aSet == bSet} (${aSet.size} rows)")
    }

    suite("1x", graft.bench.MailGraph.generate("/tmp/graft_mail_data.txt"), 400L)
    suite("10x", graft.bench.MailGraph.generate("/tmp/graft_mail_sf1.txt",
      edges = 3676620, nodes = 100000), 4000L)
    spark.stop()
  }
}
