package graft.tools

import org.apache.spark.sql.SparkSession
import org.apache.spark.sql.functions._

/** Scratch: per-phase wall breakdown of the a11 HITS gate at a given sf
  * dir. Round-13 shape: times the LIBRARY path (GraphAnalytics.hits,
  * once-per-iteration normalization, single-base-scan setup) plus an
  * instrumented inline copy that splits setup from iteration — the
  * round-11/12 inline variants (per-half-step normalization, broadcast
  * vs shuffle-hash) were superseded and lived in git history. */
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
    // end-to-end library path, 3 passes (pass 1 = warm layout first-touch)
    for (pass <- 1 to 3) {
      val sub = g.copy(edges = g.edges.filter(col("label").isin(1, 4)))
      val n = t(s"hits-lib-pass$pass") {
        graft.analytics.GraphAnalytics.hits(sub, numIter = 5).collect().length
      }
      println(s"rows=$n")
    }
    // instrumented copy of the library body: setup vs per-iteration walls
    {
      val sub = g.copy(edges = g.edges.filter(col("label").isin(1, 4)))
      import org.apache.spark.sql.DataFrame
      val fwdBySrc = t("setup-fwdBySrc") {
        val f = sub.edges.filter(col("dir")).select(col("src"), col("dst"))
          .repartition(col("src")).persist()
        f.count(); f
      }
      val fwdByDst = t("setup-fwdByDst") {
        val f = fwdBySrc.repartition(col("dst")).persist(); f.count(); f
      }
      val verts = t("setup-verts") {
        fwdBySrc.select(col("src").as("id"))
          .unionAll(fwdBySrc.select(col("dst").as("id")))
          .distinct().localCheckpoint(true)
      }
      def rawStep(scores: DataFrame, valCol: String, from: String, to: String): DataFrame = {
        val fwd = if (from == "src") fwdBySrc else fwdByDst
        fwd.join(scores.hint("shuffle_hash"), fwd(from) === scores("id"))
          .groupBy(fwd(to).as("id")).agg(sum(col(valCol)).as("s"))
      }
      def l1(raw: DataFrame, outCol: String): DataFrame = {
        val tot = raw.agg(sum(col("s")).as("tot"))
        raw.crossJoin(broadcast(tot))
          .select(col("id"), when(col("tot") > 0, col("s") / col("tot"))
            .otherwise(lit(0.0)).as(outCol))
      }
      var hub = verts.select(col("id"), lit(1.0).as("hub"))
      var authRaw: DataFrame = null
      var hubRaw: DataFrame = null
      for (i <- 1 to 5) {
        authRaw = rawStep(hub, "hub", "src", "dst")
        if (i == 5) authRaw = t(s"it$i-authRaw-ckpt") { authRaw.localCheckpoint(true) }
        hubRaw = t(s"it$i-hubRaw-ckpt") { rawStep(authRaw, "s", "dst", "src").localCheckpoint(true) }
        hub = l1(hubRaw, "hub")
      }
      val n = t("final-densify") {
        verts.join(l1(authRaw, "auth"), Seq("id"), "left")
          .join(hub, Seq("id"), "left")
          .select(col("id"), coalesce(col("auth"), lit(0.0)).as("auth"),
            coalesce(col("hub"), lit(0.0)).as("hub"))
          .collect().length
      }
      println(s"rows-instrumented=$n")
      fwdBySrc.unpersist(blocking = false)
      fwdByDst.unpersist(blocking = false)
    }
    spark.stop()
  }
}
