package graft.tools

import org.apache.spark.sql.{DataFrame, SparkSession}
import org.apache.spark.sql.functions._

/** Consolidated recall-at-scale probe harness (round 16, VERDICT r15
  * #6): the standing re-runnable sweeps behind SCALING.md's
  * recall-at-scale tables, keyed by op name —
  *
  *   runMain graft.tools.RecallProbes d4      # tables sweep at 10× + d9 nAssign curve
  *   runMain graft.tools.RecallProbes d9      # auto-width validation, 3 corpora
  *   runMain graft.tools.RecallProbes d9geom  # clustered-geometry counter-measurement
  *
  * The 20+ single-op probe files this replaces (per-op LSH/PQ/IVF/
  * rerank sweeps, the d9 stage decomposition, plan diagnostics like
  * A22ModeProbe/SccProbe/TrussProbe) informed configs that are now
  * committed and floor-pinned; their numbers are durable in SCALING.md
  * and their code in git history. What stays runnable here is the class
  * of measurement that must RECUR: adaptive-knob recall above the 1×
  * anchor scale (the defect family rounds 15–16 kept finding).
  * All protocols unchanged from the originals: exact twin = exhaustive
  * cosine pairs over the unperturbed copy-0 slice, REPEAT-style
  * pass-2-is-steady timing where relevant, deterministic seeds.
  */
object RecallProbes {
  private def session(name: String): SparkSession = {
    val spark = SparkSession.builder().master("local[32]")
      .appName(name)
      .config("spark.sql.shuffle.partitions", 32)
      .config("spark.sql.adaptive.enabled", "true")
      .config("spark.sql.legacy.parquet.nanosAsLong", "true")
      .config("spark.ui.enabled", "false")
      .getOrCreate()
    spark.sparkContext.setLogLevel("WARN")
    spark
  }

  private def pairSet(df: DataFrame): Set[(Long, Long)] =
    df.select(col("doc_a").cast("long"), col("doc_b").cast("long"))
      .collect().map(r => (r.getLong(0), r.getLong(1))).toSet

  /** The 10× isotropic fixture (the AnnScaleProbe construction: sf0.1
    * embeddings ×10 with id offsets; copies >= 1 perturbed so duplicate
    * points are near- not bit-equal; copy 0 keeps the query cuts). */
  private def emb10x(spark: SparkSession): DataFrame = {
    val path = "/tmp/graft_sf1_embeddings.parquet"
    if (!new java.io.File(path, "_SUCCESS").exists) {
      val emb = spark.read.parquet("/root/testdata/sf0.1/embeddings.parquet")
      (0 until 10).map { k =>
        val e0 = emb.withColumn("vec_id", col("vec_id") + lit(k * 10000000L))
        if (k == 0) e0
        else e0.withColumn("embedding", expr(
          s"transform(embedding, (x, i) -> cast(x + 0.005d * sin(vec_id * (i + 1) + $k) as float))"))
      }.reduce(_ unionByName _).write.mode("overwrite").parquet(path)
    }
    spark.read.parquet(path).localCheckpoint(true)
  }

  /** d4 at 10× — recall vs table count (the r15 defect curve: adaptive
    * bits hold per-bucket work constant while fixed tables decay with
    * log n; tables=-1 is the Charikar-probability formula). Plus the d9
    * manual-width curve on the same corpus (the companion r15 sweep). */
  private def d4(spark: SparkSession): Unit = {
    import graft.functions.Similarity
    val emb10 = emb10x(spark)
    val exact = pairSet(Similarity.cosineDuplicates(
      emb10.filter(col("vec_id") < 1000), threshold = 0.35, dim = 64,
      exhaustive = true))
    println(s"[d4probe] exact twin pairs: ${exact.size}")
    for (tables <- Seq(8, 16, 32, 64, -1)) { // -1 = the adaptive formula
      val t0 = System.nanoTime()
      val got = pairSet(Similarity.cosineDuplicates(
        emb10, threshold = 0.35, dim = 64, bits = -1, tables = tables,
        probes = -1))
      val wall = (System.nanoTime() - t0) / 1e9
      val recall = if (exact.isEmpty) 1.0 else (got & exact).size.toDouble / exact.size
      println(f"[d4probe] 10x tables=$tables: recall=$recall%.3f " +
        f"pairs=${got.size} wall=$wall%.1f s")
    }
    for (na <- Seq(3, 4, 6, 8, 12)) {
      val t0 = System.nanoTime()
      val got = pairSet(Similarity.semanticDedup(
        emb10, threshold = 0.35, nClusters = -1, nAssign = na))
      val wall = (System.nanoTime() - t0) / 1e9
      val recall = if (exact.isEmpty) 1.0 else (got & exact).size.toDouble / exact.size
      println(f"[d4probe] 10x d9 nAssign=$na: recall=$recall%.3f " +
        f"pairs=${got.size} wall=$wall%.1f s")
    }
  }

  /** d4's recall-vs-wall frontier at 10× (round 16): the adaptive-tables
    * fix buys recall 0.417 → 0.975 at 58 tables ≈ 57–68 s — the single
    * biggest honest sf1 line after the deliberate exact tiers. Hamming-2
    * multi-probe is the untested cheaper axis: each H2 probe multiplies
    * per-table coverage without another table's bucket join + union +
    * dedup input, so fewer tables might hold the recall at less wall.
    * Sweep (tables × probes2) at the resolved 10-bit width. */
  private def d4cost(spark: SparkSession): Unit = {
    import graft.functions.Similarity
    val emb10 = emb10x(spark)
    val exact = pairSet(Similarity.cosineDuplicates(
      emb10.filter(col("vec_id") < 1000), threshold = 0.35, dim = 64,
      exhaustive = true))
    println(s"[d4cost] exact twin pairs: ${exact.size}")
    val configs = Seq( // (tables, probes2) at probes = -1 (full H1)
      (-1, 0),  // shipped formula: 58 tables, H1 only
      (8, 45), (16, 45), (24, 45), (32, 0), (32, 45))
    for ((tables, p2) <- configs) {
      val t0 = System.nanoTime()
      val got = pairSet(Similarity.cosineDuplicates(
        emb10, threshold = 0.35, dim = 64, bits = -1, tables = tables,
        probes = -1, probes2 = p2))
      val wall = (System.nanoTime() - t0) / 1e9
      val recall = if (exact.isEmpty) 1.0 else (got & exact).size.toDouble / exact.size
      println(f"[d4cost] 10x tables=$tables probes2=$p2: recall=$recall%.3f " +
        f"pairs=${got.size} wall=$wall%.1f s")
    }
  }

  /** d9 auto-width (nAssign = -1) validation across the three corpus
    * classes — the round-16 done-criteria run (see SCALING.md round 16):
    * 10× isotropic >= 0.90, clustered stays narrow, gate scale never
    * regresses vs the manual config. */
  private def d9(spark: SparkSession): Unit = {
    import graft.functions.Similarity
    def run(tag: String, emb: DataFrame, threshold: Double,
        sliceMax: Long, widths: Seq[Int]): Unit = {
      val exact = pairSet(Similarity.cosineDuplicates(
        emb.filter(col("vec_id") < sliceMax), threshold = threshold, dim = 64,
        exhaustive = true))
      println(s"[d9scale] $tag exact twin pairs: ${exact.size}")
      for (na <- widths) {
        val resolved =
          if (na >= 0) na
          else Similarity.calibratedAssignWidth(emb, threshold)
        val t0 = System.nanoTime()
        val got = pairSet(Similarity.semanticDedup(
          emb, threshold = threshold, nClusters = -1, nAssign = na))
        val wall = (System.nanoTime() - t0) / 1e9
        val recall =
          if (exact.isEmpty) 1.0 else (got & exact).size.toDouble / exact.size
        println(f"[d9scale] $tag nAssign=$na (resolved $resolved): " +
          f"recall=$recall%.3f pairs=${got.size} wall=$wall%.1f s")
      }
    }
    run("10x-isotropic(k=79)", emb10x(spark), threshold = 0.35,
      sliceMax = 1000, widths = Seq(3, -1))
    val planted = PlantedCorpus.generate(spark, n = 20000, dim = 64,
      clusters = 50, sigma = 0.3).localCheckpoint(true)
    run("clustered(k=79)", planted, threshold = 0.9, sliceMax = 1000,
      widths = Seq(3, -1))
    val emb1 = spark.read.parquet("/root/testdata/sf0.1/embeddings.parquet")
      .localCheckpoint(true)
    run("sf0.1(k=8)", emb1, threshold = 0.35, sliceMax = 1000,
      widths = Seq(3, -1))
  }

  /** The d9 geometry counter-measurement (round 15): on the planted
    * CLUSTERED corpus (the real-embedding geometry class) the trained
    * Voronoi cells align with the duplicate structure, so small widths
    * already saturate where the isotropic corpus needed 8–12. */
  private def d9geom(spark: SparkSession): Unit = {
    import graft.functions.Similarity
    val emb = PlantedCorpus.generate(spark, n = 20000, dim = 64,
      clusters = 50, sigma = 0.3).localCheckpoint(true)
    val exact = pairSet(Similarity.cosineDuplicates(
      emb.filter(col("vec_id") < 1000), threshold = 0.9, dim = 64,
      exhaustive = true))
    println(s"[d9geom] exact twin pairs (n=20000 clustered, thr 0.9): ${exact.size}")
    for (na <- Seq(1, 2, 3)) {
      val t0 = System.nanoTime()
      val got = pairSet(Similarity.semanticDedup(
        emb, threshold = 0.9, nClusters = -1, nAssign = na))
      val wall = (System.nanoTime() - t0) / 1e9
      val recall = if (exact.isEmpty) 1.0 else (got & exact).size.toDouble / exact.size
      println(f"[d9geom] clustered k=79 nAssign=$na: recall=$recall%.3f " +
        f"pairs=${got.size} wall=$wall%.1f s")
    }
  }

  /** The 100× fixture (round 17, VERDICT r16 #3): sf0.01 embeddings ×100
    * with the emb10x perturbation protocol — n = 50,000, where d4
    * resolves 11 bits (vs the 10× run's 8) and d9 trains k = 196 (vs
    * 20), so both adaptive formulas are exercised a full growth step
    * past every scale they were calibrated at. */
  private def emb100x(spark: SparkSession): DataFrame = {
    val path = "/tmp/graft_100x_embeddings.parquet"
    if (!new java.io.File(path, "_SUCCESS").exists) {
      val emb = spark.read.parquet("/root/testdata/sf0.01/embeddings.parquet")
      (0 until 100).map { k =>
        val e0 = emb.withColumn("vec_id", col("vec_id") + lit(k * 10000000L))
        if (k == 0) e0
        else e0.withColumn("embedding", expr(
          s"transform(embedding, (x, i) -> cast(x + 0.005d * sin(vec_id * (i + 1) + $k) as float))"))
      }.reduce(_ unionByName _).write.mode("overwrite").parquet(path)
    }
    spark.read.parquet(path).localCheckpoint(true)
  }

  /** Third scale point for the adaptive-knob formulas (round 17, VERDICT
    * r16 #3): the H2 table margin (1.35, calibrated at one measured
    * 16-table point) and the width quantile (targetMiss 0.05 @ 512
    * samples) were validated at ≤ 10× only. d4/d17 run on the isotropic
    * 100×-of-sf0.01 corpus; e8 vs its brute-force twin on the same; e17
    * on a 25×-of-fixture clustered corpus with the k ∝ n contract
    * applied (nCentroids ∝ n at constant probe fraction). */
  private def p100(spark: SparkSession): Unit = {
    import graft.functions.Similarity
    val emb = emb100x(spark)
    val n = emb.count()
    println(s"[p100] corpus n=$n")
    // d4: exact twin over the unperturbed copy-0 slice
    val exact = pairSet(Similarity.cosineDuplicates(
      emb.filter(col("vec_id") < 500), threshold = 0.35, dim = 64,
      exhaustive = true))
    println(s"[p100] d4 exact twin pairs (copy-0 slice): ${exact.size}")
    def rec(got: Set[(Long, Long)]): Double =
      if (exact.isEmpty) 1.0 else (got & exact).size.toDouble / exact.size
    for ((tables, p2, tag) <- Seq((8, 0, "manual-8(H1)"), (-1, -1, "auto(H2)"))) {
      val t0 = System.nanoTime()
      val got = pairSet(Similarity.cosineDuplicates(
        emb, threshold = 0.35, dim = 64, bits = -1, tables = tables,
        probes = -1, probes2 = p2))
      println(f"[p100] d4 $tag: recall=${rec(got)}%.3f pairs=${got.size} " +
        f"wall=${(System.nanoTime() - t0) / 1e9}%.1f s")
    }
    // d17: manual-3 vs calibrated width at k=196
    for (na <- Seq(3, -1)) {
      val resolved = if (na >= 0) na
        else Similarity.calibratedAssignWidth(emb, threshold = 0.35)
      val t0 = System.nanoTime()
      val got = pairSet(Similarity.semanticDedup(
        emb, threshold = 0.35, nClusters = -1, nAssign = na))
      println(f"[p100] d17 nAssign=$na (resolved $resolved): " +
        f"recall=${rec(got)}%.3f pairs=${got.size} " +
        f"wall=${(System.nanoTime() - t0) / 1e9}%.1f s")
    }
    // e8: gate config (fixed 16 partitions — coverage fraction holds but
    // per-probe work grows linearly) vs the scale contract (nCentroids ∝
    // n at the same nProbe/nlist fraction = sub-linear scored pairs)
    val queries = emb.filter(col("vec_id") < 50)
    val exactTopK = Similarity.bruteForceTopK(queries, emb, 10)
      .select(col("query_id"), col("neighbor_id"))
      .collect().map(r => (r.getLong(0), r.getLong(1))).toSet
    for ((nc, np) <- Seq((16, 8), (196, 8), (196, 98))) {
      val t0 = System.nanoTime()
      val got = Similarity.ivfPqTopK(queries, emb, k = 10,
          nCentroids = nc, nProbe = np, nSub = 16, nCodes = 64,
          lloydIters = 2, nAssign = 2, rerank = 8)
        .select(col("query_id"), col("neighbor_id"))
        .collect().map(r => (r.getLong(0), r.getLong(1))).toSet
      val r = if (exactTopK.isEmpty) 1.0
        else (got & exactTopK).size.toDouble / exactTopK.size
      println(f"[p100] e8 nCentroids=$nc nProbe=$np: recall@10=$r%.3f " +
        f"wall=${(System.nanoTime() - t0) / 1e9}%.1f s")
    }
  }

  /** e8 rerank-axis follow-up at 100×: the p100 coverage sweep read an
    * identical 0.682 at 4%, 50%, and 50%-of-196 probe coverage — the
    * signature of the SHORTLIST, not coverage, binding: the 100× replica
    * gives every query ~99 near-tie copies that 64-code ADC cannot rank,
    * so which ties enter the fixed rerank·k = 80 shortlist is arbitrary.
    * Sweep rerank at fixed coverage to isolate the axis. */
  private def p100e8(spark: SparkSession): Unit = {
    import graft.functions.Similarity
    val emb = emb100x(spark)
    val queries = emb.filter(col("vec_id") < 50)
    val exactTopK = Similarity.bruteForceTopK(queries, emb, 10)
      .select(col("query_id"), col("neighbor_id"))
      .collect().map(r => (r.getLong(0), r.getLong(1))).toSet
    for (rr <- Seq(8, 32, 128)) {
      val t0 = System.nanoTime()
      val got = Similarity.ivfPqTopK(queries, emb, k = 10,
          nCentroids = 196, nProbe = 8, nSub = 16, nCodes = 64,
          lloydIters = 2, nAssign = 2, rerank = rr)
        .select(col("query_id"), col("neighbor_id"))
        .collect().map(r => (r.getLong(0), r.getLong(1))).toSet
      val r = if (exactTopK.isEmpty) 1.0
        else (got & exactTopK).size.toDouble / exactTopK.size
      println(f"[p100e8] rerank=$rr: recall@10=$r%.3f " +
        f"wall=${(System.nanoTime() - t0) / 1e9}%.1f s")
    }
  }

  /** e17's 100×-class point: the gate fixture is clustered n=2,000 /
    * 10 clusters; this is ×25 at constant cluster density with the
    * k ∝ n contract (nCentroids 16 → 400, probe fraction 2/16 held).
    * Separate probe from [[p100]]: the exact mutual-kNN twin is
    * deliberately quadratic (~2.5e9 scored pairs at n=50k). */
  private def p100knn(spark: SparkSession): Unit = {
    import graft.functions.Similarity
    val emb = PlantedCorpus.generate(spark, n = 50000, dim = 64,
      clusters = 250, sigma = 0.3).localCheckpoint(true)
    def pairs(df: DataFrame): Set[(Long, Long)] =
      df.select(col("a").cast("long"), col("b").cast("long"))
        .collect().map(r => (r.getLong(0), r.getLong(1))).toSet
    val t0 = System.nanoTime()
    val exact = pairs(Similarity.mutualKnnGraph(emb, k = 10))
    println(f"[p100knn] exact mutual-kNN: ${exact.size} edges " +
      f"wall=${(System.nanoTime() - t0) / 1e9}%.1f s")
    for ((nc, np) <- Seq((16, 2), (400, 50))) {
      val t1 = System.nanoTime()
      val got = pairs(Similarity.mutualKnnGraphIvf(emb, k = 10,
        nCentroids = nc, nProbe = np, nAssign = 1))
      val r = if (exact.isEmpty) 1.0 else (got & exact).size.toDouble / exact.size
      println(f"[p100knn] e17 nCentroids=$nc nProbe=$np: recall=$r%.3f " +
        f"edges=${got.size} wall=${(System.nanoTime() - t1) / 1e9}%.1f s")
    }
  }

  def main(args: Array[String]): Unit = {
    val probes: Map[String, SparkSession => Unit] =
      Map("d4" -> d4, "d4cost" -> d4cost, "d9" -> d9, "d9geom" -> d9geom,
        "p100" -> p100, "p100e8" -> p100e8, "p100knn" -> p100knn)
    val name = args.headOption.getOrElse("")
    probes.get(name) match {
      case Some(p) =>
        val spark = session(s"recall-probe-$name")
        try p(spark) finally spark.stop()
      case None =>
        System.err.println(
          s"usage: RecallProbes <${probes.keys.toSeq.sorted.mkString("|")}>")
        sys.exit(2)
    }
  }
}
