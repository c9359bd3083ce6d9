package graft.tools

import org.apache.spark.sql.{DataFrame, SparkSession}
import org.apache.spark.sql.functions._

/** sf0.1 → sf1 (10×) scale probe for the headline analytics (VERDICT r13
  * #4): a17 k-truss, a22 sampled betweenness, a24 condensation (+ its SCC
  * producer), d14 banded n-gram Jaccard, t43 source overlap, siw
  * incremental ingest. Each op runs REPEAT=2 at both scales with wall +
  * shuffle-bytes (the TrussProbe listener protocol; pass 2 is the steady
  * number, bytes witness what RAM hides at local scale) — pinning the
  * SCALING.md scaling-curve claims two orders below the 100 TB target and
  * catching any super-linear wall or driver-side bottleneck.
  *
  * 10× corpus construction (documented so ratios are interpretable):
  *  - lineitem: 10 disjoint copies (orderkey offset k·4·10⁸ — divisible
  *    by 4, so the gates' quarter cut selects the same rows per copy;
  *    partkey offset k·10⁷). The co-purchase graph becomes 10 disjoint
  *    sf0.1 copies: wedge volume, triangle counts, and join volumes scale
  *    EXACTLY 10× — the cleanest denominator for a ratio.
  *  - documents: the ScaleCorpus protocol (doc_id offset, ` v$k` variant
  *    suffix on copies ≥ 1) — clone families gain near-dup members
  *    (duplicate mass grows with the corpus, the d14-relevant dimension)
  *    and per-source gram sets grow (the t43-relevant dimension).
  *  - mail graph: nodes ×10 (100k), edges ×10 (3.67M), a24's id cut ×10
  *    (< 4000) — subgraph edge count scales ~10× at CONSTANT mean degree
  *    (edges within an f-fraction cut ∝ f²·|E|), so the condensation
  *    probe sees 10× arcs of the same density, not a densified graph.
  *
  * One-off diagnostic, not a gate: results land in SCALING.md.
  */
object Sf1ScaleProbe {
  def main(args: Array[String]): Unit = {
    val spark = SparkSession.builder().master("local[32]")
      .appName("sf1-scale-probe")
      .config("spark.sql.shuffle.partitions", 32)
      .config("spark.sql.adaptive.enabled", "true")
      .config("spark.sql.legacy.parquet.nanosAsLong", "true")
      .config("spark.ui.enabled", "false")
      .getOrCreate()
    spark.sparkContext.setLogLevel("WARN")
    import graft.analytics.GraphAnalytics

    val h = new ProbeHarness(spark, "sf1-probe")
    def t(label: String)(f: => Long): Unit = h.timed(label)(f)

    val sf = "/root/testdata/sf0.1"

    // ---- 10× inputs (written once, guarded on _SUCCESS) --------------------
    def writeOnce(path: String)(df: => DataFrame): String = {
      if (!new java.io.File(path, "_SUCCESS").exists)
        df.write.mode("overwrite").parquet(path)
      path
    }
    val li10Path = writeOnce("/tmp/graft_sf1_lineitem.parquet") {
      val li = spark.read.parquet(s"$sf/lineitem.parquet")
        .select("l_orderkey", "l_partkey")
      (0 until 10).map(k => li
        .withColumn("l_orderkey", col("l_orderkey") + lit(k * 400000000L))
        .withColumn("l_partkey", col("l_partkey") + lit(k * 10000000L)))
        .reduce(_ unionByName _)
    }
    val docs10Path = writeOnce("/tmp/graft_sf1_documents.parquet") {
      val docs = spark.read.parquet(s"$sf/documents.parquet")
      (0 until 10).map { k =>
        val d0 = docs.withColumn("doc_id", col("doc_id") + lit(k * 10000000L))
        if (k == 0) d0
        else d0.withColumn("text",
          when(col("text").isNotNull, concat(col("text"), lit(s" v$k"))))
      }.reduce(_ unionByName _)
    }
    val mail1x = graft.bench.MailGraph.generate("/tmp/graft_mail_data.txt")
    val mail10x = graft.bench.MailGraph.generate("/tmp/graft_mail_sf1.txt",
      edges = 3676620, nodes = 100000)

    def coPurchase(liPath: String): DataFrame = {
      val li = spark.read.parquet(liPath)
        .filter(col("l_orderkey") % 4 === 0)
        .select(col("l_orderkey").as("ok"), col("l_partkey"))
      li.toDF("ok", "u").join(li.toDF("ok", "v"), "ok")
        .filter(col("u") < col("v")).select("u", "v")
    }
    def mailCut(path: String, cut: Long): DataFrame =
      graft.bench.MailGraph.miwCached(spark, path).edges
        .filter(col("src") < cut && col("dst") < cut)
        .localCheckpoint(true)

    // ---- per-scale suite ----------------------------------------------------
    def suite(tag: String, liPath: String, docsPath: String,
        mailPath: String, mailCutN: Long): Unit = {
      val docs = spark.read.parquet(docsPath)
      for (pass <- 1 to 2) {
        // the gate decomposition: support (the a10 memo) built and timed
        // separately; a17 = kTrussEdges consuming it
        val edges = coPurchase(liPath).localCheckpoint(true)
        var support: DataFrame = null
        t(s"$tag a10_support pass $pass") {
          support = GraphAnalytics.edgeSupport(edges).localCheckpoint(true)
          support.count()
        }
        t(s"$tag a17_ktruss pass $pass")(
          GraphAnalytics.kTrussEdges(edges, k = 4, iters = 3,
            support0 = Some(support)).count())
        t(s"$tag a22_betweenness pass $pass")(
          GraphAnalytics.betweennessSampled(edges, nSeeds = 8, maxDepth = 4).count())
        val cutE = mailCut(mailPath, mailCutN)
        var sccs: DataFrame = null
        t(s"$tag a23_scc pass $pass") {
          sccs = GraphAnalytics.stronglyConnectedComponents(cutE).localCheckpoint(true)
          sccs.count()
        }
        t(s"$tag a24_condensation pass $pass")(
          GraphAnalytics.condensationLayers(cutE, sccs = Some(sccs)).count())
        t(s"$tag d14_banded pass $pass")(
          graft.functions.Dedup.ngramJaccardPairsBanded(docs, n = 3, threshold = 0.3).count())
        t(s"$tag t43_source_overlap pass $pass")(
          graft.functions.TextAnalysis.sourceOverlap(docs, n = 3).count())
        t(s"$tag siw pass $pass")(
          graft.bench.MailGraph.siw(spark, mailPath).edges.count())
      }
    }

    println(s"[sf1-probe] 1x lineitem rows: ${spark.read.parquet(s"$sf/lineitem.parquet").count()}, " +
      s"10x: ${spark.read.parquet(li10Path).count()}")
    suite("1x", s"$sf/lineitem.parquet", s"$sf/documents.parquet", mail1x, 400L)
    suite("10x", li10Path, docs10Path, mail10x, 4000L)
    spark.stop()
  }
}
