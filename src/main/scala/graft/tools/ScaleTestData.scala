package graft.tools

import org.apache.spark.sql.{DataFrame, SparkSession}
import org.apache.spark.sql.functions._

/** Build a FULL 10× (≈ sf1) test-data directory at /tmp/graft_sf1_full
  * so the whole bench suite — not just the 8 + 6 probe headliners — can
  * run at two scales (VERDICT r14 #7): every table from
  * /root/testdata/sf0.1 replicated 10× as DISJOINT copies with
  * consistent key offsets, then `SPARK_GRAFT_SF_DIR=/tmp/graft_sf1_full
  * SPARK_GRAFT_REPEAT=2 runMain graft.Bench` gives a full-suite sf1 line
  * (REPEAT=2: pass-2 is steady and disables the sf0.1-anchored rerun
  * rider, whose anchors don't apply at 10×).
  *
  * Offsets are chosen to keep every key inside the gate graph's id
  * ranges (GateQueries.ranges: customers < 10⁷, order node = o_orderkey
  * + 10⁷ < 2·10⁷ ⇒ o_orderkey < 10⁷):
  *  - orders/lineitem: o_orderkey += k·640 000 (divisible by 4 AND 32 —
  *    the co-purchase quarter cut and the g-gates' mod cuts select the
  *    same rows in every copy; max ≈ 6.36·10⁶ < 10⁷)
  *  - customer: c_custkey += k·15 000; part: += k·20 000;
  *    supplier: += k·1 000 (all FK columns shifted consistently)
  *  - events: user_id += k·10⁶, event_id += k·10⁸, ts unchanged (10×
  *    density in the same time span — users stay disjoint per copy, so
  *    per-user session/pair ops scale linearly by construction)
  *  - documents: doc_id += k·10⁷ + ` v$k` text variant (the ScaleCorpus
  *    protocol — clone families gain near-dup members)
  *  - embeddings: vec_id += k·10⁷ + small deterministic float
  *    perturbation on copies ≥ 1 (bit-equal duplicate points would
  *    degenerate ANN ties); copy 0 keeps the vec_id<50/400/1000 query
  *    and verification-tier cuts at their 1× size.
  *  - region/nation: copied as-is (dimension tables).
  * The mail and planted-embedding fixtures are sf-independent session
  * fixtures and stay 1× (documented with the results in SCALING.md).
  * One-off diagnostic input builder, not a gate.
  */
object ScaleTestData {
  def main(args: Array[String]): Unit = {
    val spark = SparkSession.builder().master("local[32]")
      .appName("scale-testdata")
      .config("spark.sql.shuffle.partitions", 32)
      .config("spark.sql.adaptive.enabled", "true")
      .config("spark.sql.legacy.parquet.nanosAsLong", "true")
      .config("spark.ui.enabled", "false")
      .getOrCreate()
    spark.sparkContext.setLogLevel("WARN")
    val sf = "/root/testdata/sf0.1"
    val out = sys.env.getOrElse("SCALE_OUT_DIR", "/tmp/graft_sf1_full")
    new java.io.File(out).mkdirs()

    val K = 10
    val OK = 640000L   // o_orderkey stride
    val CK = 15000L    // c_custkey
    val PK = 20000L    // p_partkey
    val SK = 1000L     // s_suppkey

    def copies(name: String)(shift: (DataFrame, Int) => DataFrame): Unit = {
      val path = s"$out/$name.parquet"
      if (new java.io.File(path, "_SUCCESS").exists) { println(s"[scale] $name: exists"); return }
      val base = spark.read.parquet(s"$sf/$name.parquet")
      val df = (0 until K).map(k => shift(base, k)).reduce(_ unionByName _)
      df.write.mode("overwrite").parquet(path)
      println(s"[scale] $name: ${spark.read.parquet(path).count()} rows")
    }
    // cast back to the source column's physical type: `int + bigint lit`
    // widens to bigint, and a type drift between the sf0.1 and sf1 dirs
    // could flip plan shapes (or break an Encoder) independent of scale
    def bump(df: DataFrame, c: String, stride: Long, k: Int): DataFrame =
      df.withColumn(c, (col(c) + lit(stride * k)).cast(df.schema(c).dataType))

    copies("region")((df, k) => if (k == 0) df else df.limit(0))
    copies("nation")((df, k) => if (k == 0) df else df.limit(0))
    copies("customer")((df, k) => bump(df, "c_custkey", CK, k))
    copies("supplier")((df, k) => bump(df, "s_suppkey", SK, k))
    copies("part")((df, k) => bump(df, "p_partkey", PK, k))
    copies("orders")((df, k) =>
      bump(bump(df, "o_orderkey", OK, k), "o_custkey", CK, k))
    copies("lineitem")((df, k) =>
      bump(bump(bump(df, "l_orderkey", OK, k), "l_partkey", PK, k), "l_suppkey", SK, k))
    copies("events")((df, k) =>
      bump(bump(df, "event_id", 100000000L, k), "user_id", 1000000L, k))
    copies("documents")((df, k) => {
      val d0 = bump(df, "doc_id", 10000000L, k)
      if (k == 0) d0
      else d0.withColumn("text",
        when(col("text").isNotNull, concat(col("text"), lit(s" v$k"))))
    })
    copies("embeddings")((df, k) => {
      val e0 = bump(df, "vec_id", 10000000L, k)
      if (k == 0) e0
      else e0.withColumn("embedding", expr(
        s"transform(embedding, (x, i) -> cast(x + 0.005d * sin(vec_id * (i + 1) + $k) as float))"))
    })
    spark.stop()
  }
}
