package graft.tools

import org.apache.spark.sql.SparkSession

/** Print a gate's formatted physical plan (diagnostic): runMain
  * graft.tools.PlanDump <gateName> [sfDir]. Executes nothing beyond the
  * fixture builds the gate body itself triggers. */
object PlanDump {
  def main(args: Array[String]): Unit = {
    val name = args.head
    val sfDir = args.lift(1).getOrElse("/root/testdata/sf0.1")
    val spark = SparkSession.builder().master("local[32]")
      .config("spark.sql.shuffle.partitions", 32)
      .config("spark.sql.session.timeZone", "UTC")
      .config("spark.sql.adaptive.enabled", "true")
      .config("spark.sql.legacy.parquet.nanosAsLong", "true")
      .config("spark.ui.enabled", "false")
      .getOrCreate()
    spark.sparkContext.setLogLevel("WARN")
    graft.functions.expressions.GraftFunctions.init(spark)
    val df = graft.SparkEntry.queries(name)(spark, sfDir)
    if (args.contains("--exec")) {
      df.queryExecution.toRdd.count()
      println(df.queryExecution.explainString(
        org.apache.spark.sql.execution.FormattedMode))
    } else
      println(df.queryExecution.explainString(
        org.apache.spark.sql.execution.FormattedMode))
    spark.stop()
  }
}
