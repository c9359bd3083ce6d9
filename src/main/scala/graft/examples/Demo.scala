package graft.examples

import graft.model._
import graft.sources.Loaders
import graft.cypher._
import graft.cypher.Dsl._
import graft.operators.GraphOps
import org.apache.spark.sql.SparkSession
import org.apache.spark.sql.functions._

/** End-to-end example a library user would write: build a property graph
  * from relational parquet (customers → orders → parts via lineitem), then
  * run typed pattern queries against it.
  *
  * Run: sbt "runMain graft.examples.Demo [sfDir]"
  */
object Demo {
  // Node id layout (dense ranges → labels, SURVEY §1.3):
  val CUST_BASE = 0L
  val ORDER_BASE = 10000000L
  val PART_BASE = 20000000L
  val CUSTOMER = 0; val ORDER = 1; val PART = 2
  val Placed = 1; val Contains = 2

  def ranges: Seq[RangeDef] = Seq(
    RangeDef(CUST_BASE, ORDER_BASE, CUSTOMER, Seq(Placed)),
    RangeDef(ORDER_BASE, PART_BASE - ORDER_BASE, ORDER, Seq(Contains)),
    RangeDef(PART_BASE, 10000000L, PART, Seq()))

  /** customer --Placed--> order --Contains--> part, with mirrored back edges. */
  def orderGraph(spark: SparkSession, sfDir: String): PropertyGraph = {
    val orders = spark.read.parquet(s"$sfDir/orders.parquet")
    val lineitem = spark.read.parquet(s"$sfDir/lineitem.parquet")
    val placed = orders.select(
      col("o_custkey").cast("long").as("src"),
      (col("o_orderkey") + ORDER_BASE).cast("long").as("dst"))
    val contains = lineitem.select(
      (col("l_orderkey") + ORDER_BASE).cast("long").as("src"),
      (col("l_partkey") + PART_BASE).cast("long").as("dst"))
    val g1 = Loaders.fromEdgeDF(placed, Placed, mirror = true, ranges)
    val g2 = Loaders.fromEdgeDF(contains, Contains, mirror = true, ranges)
    GraphOps.union(g1, g2)
  }

  def main(args: Array[String]): Unit = {
    val sfDir = args.headOption.getOrElse("/root/testdata/sf0.001")
    val spark = SparkSession.builder()
      .master("local[4]")
      .appName("graft-demo")
      .config("spark.sql.shuffle.partitions", "8")
      .config("spark.sql.adaptive.enabled", "true")
      .config("spark.sql.legacy.parquet.nanosAsLong", "true")
      .config("spark.ui.enabled", "false")
      .getOrCreate()
    spark.sparkContext.setLogLevel("WARN")

    val g = orderGraph(spark, sfDir).cached()
    println(s"edges: ${g.edges.count()}")

    // 1-hop: which orders did customer 7 place?
    val q1 = Query.paths(g, nodes32(7) --| edge(attr(Placed)) |--> labels(ORDER))
    println("orders of customer 7:")
    q1.show(5, false)

    // 2-hop: parts bought by customer 7
    val q2 = Query.paths(g,
      nodes32(7) --| edge(attr(Placed)) |--> labels(ORDER) --| edge(attr(Contains)) |--> labels(PART))
    println(s"parts bought by customer 7: ${q2.select("n2").distinct().count()}")
    q2.show(5, false)

    // reverse direction: who bought part p? (walk back edges)
    val somePart = q2.select("n2").head().getLong(0)
    val q3 = Query.paths(g, nodes32(somePart) <--| edge(attr(Contains)) |-- labels(ORDER))
    println(s"orders containing part $somePart: ${q3.count()}")

    // degree view
    println("top-degree order nodes:")
    g.degrees.orderBy(desc("degree")).show(5)

    // probes: nonexistent start node → whole result collapses to empty
    val ghost = Query.run(g, nodes32(999999999L) --| edge(attr(Placed)) |--> labels(ORDER))
    println(s"ghost-node query failed=${ghost.failed} rows=${ghost.paths.count()}")
    // probe: label with no range → empty, not an error
    val badLabel = Query.run(g, nodes32(7) --| edge(attr(Placed)) |--> labels(99))
    println(s"unknown-label query failed=${badLabel.failed}")
    // probe: wrong direction on a directed pattern
    val wrongDir = Query.run(g, nodes32(7) <--| edge(attr(Placed)) |-- labels(ORDER))
    println(s"wrong-direction query failed=${wrongDir.failed}")

    q2.explain("formatted")
    spark.stop()
  }
}
