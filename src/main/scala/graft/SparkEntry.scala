package graft
import org.apache.spark.sql.{SparkSession, DataFrame}
import graft.gate.GateQueries

/** Driver contract — see /root/repo/SURVEY.md §7 + the builder prompt.
  * Every implemented operator surfaces here as a named query; the driver
  * verifies each against its DuckDB oracle (oracleSql) at sf0.01 and
  * benchmarks the set at sf0.1.
  */
object SparkEntry {
  /** Flagship query on /root/testdata/sf0.001; driver smoke-checks rows>0.
    * The reference's canonical shape (app/Main.hs:20): a 2-hop labeled
    * pattern — here customer → order → part over the gate graph.
    */
  def entry(spark: SparkSession): DataFrame =
    GateQueries.queries("g2_parts_of_customer_orders")(spark, "/root/testdata/sf0.001")

  /** One entry per implemented operator from SURVEY.md §2. */
  def queries: Map[String, (SparkSession, String) => DataFrame] = GateQueries.queries

  /** For each key in queries, equivalent ANSI SQL runnable by DuckDB on
    * the same parquet tables. Omit for non-SQL-expressible ops. */
  def oracleSql: Map[String, String] = GateQueries.oracles
}
