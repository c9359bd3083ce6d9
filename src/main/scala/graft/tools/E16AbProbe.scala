package graft.tools

import org.apache.spark.sql.{DataFrame, SparkSession}
import org.apache.spark.sql.functions._
import org.apache.spark.sql.expressions.Window

/** e16 exact-tier constant-factor A/B (VERDICT r20 #3): the top sf1
  * line (16.3 s wall / 536 cpu-s) is the deliberately-exhaustive
  * mutual-kNN verification anchor — its shape (widened cross join,
  * map-side scoring, vectors projected away before the rank window) is
  * settled; what's left is the per-pair constant. Two candidate levers,
  * measured against the shipped operator on the same corpus:
  *
  *  A. SHIPPED: cosine = graft_dot(qv, cv) / (qn · cn) — one fused dot
  *     plus a multiply and divide per pair, norms precomputed per side.
  *  B. PRE-NORMALIZED: each side stores v/‖v‖ once (one transform pass
  *     per side, linear), per pair = graft_dot alone. Saves 1 mul + 1
  *     div of the ~66-flop pair cost — adoption bar is ≥15% so the
  *     expected honest outcome is a recorded negative, but B also
  *     narrows the pair row by the two norm doubles (16 B of ~300 B).
  *     NOTE B changes double rounding (x/qn per ELEMENT vs one /(qn·cn)
  *     at the end) — adoption would need the oracle e16/e18 hash to
  *     stay green, checked separately before any operator change.
  *  C. WIDEN factor sweep (4 = shipped, 8): the 128-task scoring stage
  *     shows max 4.8 s vs mean 3.0 s at sf1 — finer slices may trim the
  *     tail at scheduling cost.
  *
  * Pass-2 steady, ProbeHarness protocol. One-off diagnostic; results
  * land in SCALING.md. Usage: runMain graft.tools.E16AbProbe [dir]
  * (default /tmp/graft_sf1_full, the 10× fixture).
  */
object E16AbProbe {
  def main(args: Array[String]): Unit = {
    val dir = args.headOption.getOrElse("/tmp/graft_sf1_full")
    val spark = SparkSession.builder().master("local[32]")
      .appName("e16-ab-probe")
      .config("spark.sql.shuffle.partitions", 32)
      .config("spark.sql.session.timeZone", "UTC")
      .config("spark.sql.adaptive.enabled", "true")
      .config("spark.sql.legacy.parquet.nanosAsLong", "true")
      .config("spark.ui.enabled", "false")
      .getOrCreate()
    spark.sparkContext.setLogLevel("WARN")
    graft.functions.expressions.GraftFunctions.init(spark)
    val h = new ProbeHarness(spark, "e16-ab")
    val emb = spark.read.parquet(s"$dir/embeddings.parquet")
      .select(col("vec_id"), col("embedding")).localCheckpoint(true)
    val k = 10

    def ndot(a: org.apache.spark.sql.Column, b: org.apache.spark.sql.Column) =
      call_function("graft_dot", a, b)
    def widened(df: DataFrame, factor: Int) =
      graft.util.Widen.widened(df, factor = factor, floorBytes = 64L << 10)

    // A: the shipped operator
    def shipped(): Long =
      graft.functions.Similarity.mutualKnnGraph(emb, k).count()

    // B: pre-normalized pair scoring (probe-only reimplementation of the
    // bruteForceTopK + mutualOf pipeline with v/‖v‖ sides)
    def preNormalized(factor: Int): Long = {
      val nv = emb.filter(call_function("graft_finite_norm", col("embedding")))
        .select(col("vec_id"), transform(col("embedding"),
          x => (x / sqrt(ndot(col("embedding"), col("embedding")))).cast("float")).as("nv"))
      val q = nv.select(col("vec_id").as("query_id"), col("nv").as("qv"))
      val c = nv.select(col("vec_id").as("neighbor_id"), col("nv").as("cv"))
      val scored = widened(q, factor).crossJoin(c)
        .filter(col("query_id") =!= col("neighbor_id"))
        .withColumn("cosine", ndot(col("qv"), col("cv")))
        .select(col("query_id"), col("neighbor_id"), col("cosine"))
      val w = Window.partitionBy("query_id").orderBy(desc("cosine"), col("neighbor_id"))
      val knn = scored.withColumn("rank", row_number().over(w)).filter(col("rank") <= k)
        .select(col("query_id"), col("neighbor_id"), col("cosine"))
        .localCheckpoint(true)
      val rev = knn.select(col("neighbor_id").as("query_id"),
        col("query_id").as("neighbor_id"))
      knn.join(rev, Seq("query_id", "neighbor_id"), "left_semi")
        .filter(col("query_id") < col("neighbor_id"))
        .select(col("query_id").as("a"), col("neighbor_id").as("b"),
          round(col("cosine"), 6).as("cosine"))
        .count()
    }

    for (pass <- 1 to 2) h.timed(s"A shipped pass $pass")(shipped())
    for (pass <- 1 to 2) h.timed(s"B prenorm f4 pass $pass")(preNormalized(4))
    for (pass <- 1 to 2) h.timed(s"C prenorm f8 pass $pass")(preNormalized(8))
    // rank-set parity witness (not bit parity — B reassociates the
    // division): mutual edge KEY sets should agree except at ties
    val aSet = graft.functions.Similarity.mutualKnnGraph(emb, k)
      .select(col("a"), col("b")).collect().map(r => (r.getLong(0), r.getLong(1))).toSet
    println(s"[e16-ab] shipped edges: ${aSet.size}")
    spark.stop()
  }
}
