package graft.tools

import org.apache.spark.sql.SparkSession
import org.apache.spark.sql.functions._

/** Where does a23's wall go — mail ingest or the SCC rounds themselves?
  * Times the gate's exact subgraph cut through two SCC passes on a warm
  * session (pass 2 = steady state, the bench-relevant number) and prints
  * the outer/inner round profile implied by the wall split.
  */
object SccProbe {
  def main(args: Array[String]): Unit = {
    val spark = SparkSession.builder().master("local[32]")
      .appName("scc-probe")
      .config("spark.sql.shuffle.partitions", 32)
      .config("spark.sql.adaptive.enabled",
        sys.env.getOrElse("SCC_PROBE_AQE", "true"))
      .getOrCreate()
    def t[A](label: String)(f: => A): A = {
      val t0 = System.nanoTime(); val r = f
      println(f"[scc-probe] $label: ${(System.nanoTime() - t0) / 1e9}%.2f s"); r
    }
    val path = t("mail generate")(graft.bench.MailGraph.generate("/tmp/graft_mail_data.txt"))
    val g = t("mail ingest")(graft.bench.MailGraph.miwCached(spark, path))
    // SCC_PROBE_CAPS: comma-separated id cuts; 0 = the full 10k-vertex
    // graph (one giant SCC at mean degree 36 — the dense regime where
    // rounds collapse to the graph's small diameter and per-round cost
    // is the |E| join)
    val caps = sys.env.getOrElse("SCC_PROBE_CAPS", "400").split(",").map(_.trim.toLong)
    for (cap <- caps) {
      val edges = (if (cap > 0) g.edges.filter(col("src") < cap && col("dst") < cap)
                   else g.edges)
        .select(col("src"), col("dst")).localCheckpoint(true)
      println(s"[scc-probe] cap $cap edges: ${edges.count()}")
      for (pass <- 1 to 2) {
        val r = t(s"cap $cap scc pass $pass")(
          graft.analytics.GraphAnalytics.stronglyConnectedComponents(edges).count())
        println(s"[scc-probe] cap $cap rows: $r")
      }
    }
    spark.stop()
  }
}
