package graft.analytics

import graft.model.PropertyGraph
import org.apache.spark.graphx.{Edge => GxEdge, Graph => GxGraph, VertexId}
import org.apache.spark.sql.DataFrame
import org.apache.spark.sql.functions._

/** GraphX bridge for whole-graph analytics the reference lacks entirely
  * (shortest path is a TODO in its docs, doc/Neo4j.md:179-196): connected
  * components, PageRank, single-source shortest paths via Pregel, and a
  * Pregel-based reachability that is the scale path for `***` patterns
  * (the DataFrame BFS in cypher.Exec is the semantic reference; Pregel
  * avoids per-iteration driver round-trips on deep graphs).
  */
object GraphAnalytics {

  /** PropertyGraph → GraphX graph (forward edges only; vertex attr = label). */
  def toGraphX(g: PropertyGraph): GxGraph[Int, Int] = {
    val edges = g.edges.filter(col("dir"))
      .select(col("src"), col("dst"), col("label"))
      .rdd.map(r => GxEdge(r.getLong(0), r.getLong(1), r.getInt(2)))
    GxGraph.fromEdges(edges, defaultValue = -1)
  }

  /** Connected components (undirected sense) → (id, component). */
  def connectedComponents(g: PropertyGraph): DataFrame = {
    val spark = g.spark
    import spark.implicits._
    toGraphX(g).connectedComponents().vertices
      .map { case (v, c) => (v, c) }.toDF("id", "component")
  }

  /** PageRank → (id, rank). */
  def pageRank(g: PropertyGraph, tol: Double = 0.0001): DataFrame = {
    val spark = g.spark
    import spark.implicits._
    toGraphX(g).pageRank(tol).vertices
      .map { case (v, r) => (v, r) }.toDF("id", "rank")
  }

  /** Unweighted single-source shortest hop counts via Pregel → (id, dist). */
  def shortestPaths(g: PropertyGraph, source: Long): DataFrame = {
    val spark = g.spark
    import spark.implicits._
    val gx = toGraphX(g).mapVertices((v, _) =>
      if (v == source) 0.0 else Double.PositiveInfinity)
    val res = gx.pregel(Double.PositiveInfinity)(
      (_, dist, msg) => math.min(dist, msg),
      t => if (t.srcAttr + 1 < t.dstAttr) Iterator((t.dstId, t.srcAttr + 1)) else Iterator.empty,
      (a, b) => math.min(a, b))
    res.vertices.filter(_._2 < Double.PositiveInfinity)
      .map { case (v, d) => (v, d.toLong) }.toDF("id", "dist")
  }

  /** All nodes reachable from `sources` following a given edge label
    * (optionally any) — Pregel form of the `***` pattern. */
  def reachableFrom(g: PropertyGraph, sources: Seq[Long], label: Option[Int] = None): DataFrame = {
    val spark = g.spark
    import spark.implicits._
    val base = label.fold(g.edges.filter(col("dir")))(l =>
      g.edges.filter(col("dir") && col("label") === l))
    val edges = base.select("src", "dst").rdd.map(r => GxEdge(r.getLong(0), r.getLong(1), 1))
    val srcSet = sources.toSet
    val gx = GxGraph.fromEdges(edges, defaultValue = 0)
      .mapVertices((v, _) => srcSet.contains(v))
    val res = gx.pregel(false)(
      (_, reached, msg) => reached || msg,
      t => if (t.srcAttr && !t.dstAttr) Iterator((t.dstId, true)) else Iterator.empty,
      (a, b) => a || b)
    res.vertices.filter { case (v, reached) => reached && !srcSet.contains(v) }
      .map(_._1).toDF("id")
  }

  /** Degree distribution (out-degree histogram) — a one-liner the reference
    * computes per node via its counter slots (Enum.hs:495-506). */
  def degreeHistogram(g: PropertyGraph): DataFrame =
    g.edges.filter(col("dir")).groupBy(col("src")).agg(count(lit(1)).as("degree"))
      .groupBy(col("degree")).agg(count(lit(1)).as("n_nodes"))
}
