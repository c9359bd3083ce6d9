package graft.tools

import org.apache.spark.sql.SparkSession
import org.apache.spark.sql.functions._

/** Decompose a13 adamicAdar's sf1 wall (round 18): the gate reads 8×
  * a14's task work on the SAME wedge machinery — this times each
  * sub-relation (canonical edges, degree table, triangle enumeration,
  * witness aggregation, final join) and counts the row volumes so the
  * dominant term is identified by measurement. Diagnostic, not a gate. */
object A13Probe {
  def main(args: Array[String]): Unit = {
    val sfDir = sys.env.getOrElse("SPARK_GRAFT_SF_DIR", "/tmp/graft_sf1_full")
    val spark = SparkSession.builder().master("local[32]")
      .config("spark.sql.shuffle.partitions", 32)
      .config("spark.sql.adaptive.enabled", "true")
      .config("spark.sql.legacy.parquet.nanosAsLong", "true")
      .config("spark.ui.enabled", "false")
      .getOrCreate()
    spark.sparkContext.setLogLevel("WARN")
    val h = new ProbeHarness(spark, "a13")

    val li = spark.read.parquet(s"$sfDir/lineitem.parquet")
      .filter(col("l_orderkey") % 4 === 0)
      .select(col("l_orderkey").as("ok"), col("l_partkey"))
    val a = li.toDF("ok", "u"); val b = li.toDF("ok", "v")
    val edges = a.join(b, "ok").filter(col("u") < col("v")).select("u", "v").cache()
    println(s"raw co-purchase rows: ${edges.count()}")

    val e = edges
      .select(least(col("u"), col("v")).as("a"), greatest(col("u"), col("v")).as("b"))
      .filter(col("a") =!= col("b")).distinct().localCheckpoint(true)
    println(s"canonical edges: ${e.count()}")
    val deg = e.select(col("a").as("n")).unionAll(e.select(col("b").as("n")))
      .groupBy("n").agg(count(lit(1)).as("d")).localCheckpoint(true)
    println(s"degree rows: ${deg.count()}, max degree: ${deg.agg(max(col("d"))).collect().head.getLong(0)}")

    val keyed = e
      .join(deg.select(col("n").as("a"), col("d").as("da")), "a")
      .join(deg.select(col("n").as("b"), col("d").as("db")), "b")
      .select(col("a"), col("b"),
        struct(col("da").as("d"), col("a").as("i")).as("ka"),
        struct(col("db").as("d"), col("b").as("i")).as("kb"))
    val oriented = keyed.select(
      when(col("ka") < col("kb"), col("a")).otherwise(col("b")).as("src"),
      when(col("ka") < col("kb"), col("b")).otherwise(col("a")).as("dst"),
      when(col("ka") < col("kb"), col("ka")).otherwise(col("kb")).as("ksrc"),
      when(col("ka") < col("kb"), col("kb")).otherwise(col("ka")).as("kdst"))
      .localCheckpoint(true)
    h.timed("wedge count (no degree carry)") {
      oriented.select(col("src"), col("dst").as("y"), col("kdst").as("ky"))
        .join(oriented.select(col("src"), col("dst").as("z"), col("kdst").as("kz")), "src")
        .filter(col("ky") < col("kz")).count()
    }
    val tri = oriented
      .select(col("src"), col("ksrc"), col("dst").as("y"), col("kdst").as("ky"))
      .join(oriented.select(col("src"), col("dst").as("z"), col("kdst").as("kz")), "src")
      .filter(col("ky") < col("kz"))
      .select(col("src").as("x"), col("y"), col("z"),
        col("ksrc.d").as("dx"), col("ky.d").as("dy"), col("kz.d").as("dz"))
      .join(oriented.select(col("src").as("y"), col("dst").as("z")), Seq("y", "z"), "left_semi")
    h.timed("triangles (deg-carried)")(tri.count())
    val triC = tri.localCheckpoint(true)
    println(s"triangles: ${triC.count()}")
    h.timed("witness explode + groupBy agg") {
      triC.select(explode(array(
          struct(col("x").as("p"), col("y").as("q"), col("dz").as("wd")),
          struct(col("x").as("p"), col("z").as("q"), col("dy").as("wd")),
          struct(col("y").as("p"), col("z").as("q"), col("dx").as("wd")))).as("t"))
        .select(least(col("t.p"), col("t.q")).as("a"),
          greatest(col("t.p"), col("t.q")).as("b"), col("t.wd").as("wd"))
        .groupBy("a", "b")
        .agg(count(lit(1)).as("support"), sum(lit(1.0) / log(col("wd"))).as("aa"))
        .count()
    }
    (1 to 2).foreach { p =>
      h.timed(s"full adamicAdar p$p")(
        graft.analytics.GraphAnalytics.adamicAdar(edges).queryExecution.toRdd.count())
      h.timed(s"full jaccardLinks p$p")(
        graft.analytics.GraphAnalytics.jaccardLinks(edges).queryExecution.toRdd.count())
    }
    spark.stop()
  }
}
