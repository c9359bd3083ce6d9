package graft.tools

import org.apache.spark.sql.SparkSession
import org.apache.spark.sql.functions._

/** Scratch: per-phase wall breakdown of the a11 HITS gate at a given sf
  * dir — separates graph-cache build, fwd/verts materialization, and the
  * iteration itself. */
object HitsProbe {
  def main(args: Array[String]): Unit = {
    val spark = SparkSession.builder()
      .master("local[32]")
      .config("spark.sql.shuffle.partitions", 32)
      .config("spark.sql.legacy.parquet.nanosAsLong", "true")
      .config("spark.sql.session.timeZone", "UTC")
      .appName("hits-probe")
      .getOrCreate()
    spark.sparkContext.setLogLevel("WARN")
    val d = args(0)
    def t[A](label: String)(f: => A): A = {
      val t0 = System.nanoTime(); val r = f
      println(f"PHASE $label ${(System.nanoTime() - t0) / 1e9}%.2f s"); r
    }
    val g = t("graph-cache") { val g0 = graft.gate.GateQueries.graph(spark, d); g0.edges.count(); g0 }
    for (pass <- 1 to 2) {
      val sub = g.copy(edges = g.edges.filter(col("label").isin(1, 4)))
      // inline hits body with per-step timing
      val out = t(s"hits-pass$pass") {
        import org.apache.spark.sql.DataFrame
        val fwd = t("fwd-ckpt") {
          sub.edges.filter(col("dir")).select(col("src"), col("dst")).localCheckpoint(true) }
        val verts = t("verts-ckpt") {
          import spark.implicits._
          fwd.select(col("src").as("id")).unionAll(fwd.select(col("dst").as("id")))
            .distinct().localCheckpoint(true) }
        val bcast = t("verts-count") { verts.count() <= 1000000L }
        def side(df: DataFrame) = if (bcast) broadcast(df) else df
        def step(scores: DataFrame, valCol: String, from: String, to: String,
            outCol: String, label: String): DataFrame = {
          val s = side(scores)
          val raw = t(s"$label-raw") {
            fwd.join(s, fwd(from) === s("id"))
              .groupBy(fwd(to).as("id")).agg(sum(col(valCol)).as("s"))
              .localCheckpoint(true) }
          val tot = raw.agg(sum(col("s")).as("tot"))
          raw.crossJoin(broadcast(tot))
            .select(col("id"),
              when(col("tot") > 0, col("s") / col("tot")).otherwise(lit(0.0)).as(outCol))
        }
        var hub = verts.select(col("id"), lit(1.0).as("hub"))
        var auth = verts.select(col("id"), lit(0.0).as("auth")).limit(0)
        for (i <- 1 to 5) {
          auth = step(hub, "hub", "src", "dst", "auth", s"it$i-auth")
          hub = step(auth, "auth", "dst", "src", "hub", s"it$i-hub")
        }
        t("final-densify") {
          verts.join(side(auth), Seq("id"), "left").join(side(hub), Seq("id"), "left")
            .select(col("id"), coalesce(col("auth"), lit(0.0)).as("auth"),
              coalesce(col("hub"), lit(0.0)).as("hub"))
            .collect().length }
      }
      println(s"rows=$out")
    }
    // variant B: fwd pre-partitioned per direction, scores shuffle-hash-joined
    for (pass <- 1 to 2) {
      val sub = g.copy(edges = g.edges.filter(col("label").isin(1, 4)))
      import org.apache.spark.sql.DataFrame
      val out = t(s"hitsB-pass$pass") {
        val fwd0 = sub.edges.filter(col("dir")).select(col("src"), col("dst"))
        val fwdBySrc = t("fwdBySrc") { fwd0.repartition(col("src")).localCheckpoint(true) }
        val fwdByDst = t("fwdByDst") { fwd0.repartition(col("dst")).localCheckpoint(true) }
        val verts = t("vertsB") {
          fwd0.select(col("src").as("id")).unionAll(fwd0.select(col("dst").as("id")))
            .distinct().localCheckpoint(true) }
        def step(scores: DataFrame, valCol: String, from: String, to: String,
            outCol: String, label: String): DataFrame = {
          val fwdX = if (from == "src") fwdBySrc else fwdByDst
          val raw = t(s"$label-raw") {
            fwdX.join(scores.hint("shuffle_hash"), fwdX(from) === scores("id"))
              .groupBy(fwdX(to).as("id")).agg(sum(col(valCol)).as("s"))
              .localCheckpoint(true) }
          val tot = raw.agg(sum(col("s")).as("tot"))
          raw.crossJoin(broadcast(tot))
            .select(col("id"),
              when(col("tot") > 0, col("s") / col("tot")).otherwise(lit(0.0)).as(outCol))
        }
        var hub = verts.select(col("id"), lit(1.0).as("hub"))
        var auth: DataFrame = null
        for (i <- 1 to 5) {
          auth = step(hub, "hub", "src", "dst", "auth", s"Bit$i-auth")
          hub = step(auth, "auth", "dst", "src", "hub", s"Bit$i-hub")
        }
        t("B-final-densify") {
          verts.join(auth, Seq("id"), "left").join(hub, Seq("id"), "left")
            .select(col("id"), coalesce(col("auth"), lit(0.0)).as("auth"),
              coalesce(col("hub"), lit(0.0)).as("hub"))
            .collect().length }
      }
      println(s"rowsB=$out")
    }
    spark.stop()
  }
}
