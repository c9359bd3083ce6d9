package graft.bench

import graft.model._
import graft.sources.Loaders
import graft.cypher.Dsl._
import graft.cypher.Query
import org.apache.spark.sql.{DataFrame, SparkSession}

/** Reproduction of the reference's two concrete benchmark workloads
  * (benchmark/Bench.hs:40-58, socialsensor/graphdb-benchmarks naming):
  *
  *  - MIW (massive insert): bulk-ingest a whitespace int-pair edge list
  *    (reference insertNodeLines, Enum.hs:387-407) — 367,662 lines,
  *    node ids 0..9999, single MAILED label, EMPLOYEE range;
  *  - CW: load + 1-hop query `number128 --| mailed |-- anybody`.
  *
  * data.txt itself is not redistributable, so the same shape is
  * regenerated deterministically (LCG, fixed seed).
  */
object MailGraph {
  val MAILED = 1
  val EMPLOYEE = 0
  val ranges: Seq[RangeDef] = Seq(RangeDef(0, 10000, EMPLOYEE, Seq(MAILED)))

  /** Deterministic mail-graph edge list in the reference's data.txt format.
    * Written to a temp file and atomically renamed so a crash mid-write can
    * never leave a partial file that later runs silently ingest; write
    * errors (PrintWriter swallows IOExceptions) surface via checkError. */
  def generate(path: String, edges: Int = 367662, nodes: Int = 10000): String = {
    val f = new java.io.File(path)
    if (!f.exists || f.length == 0) {
      val tmp = new java.io.File(path + ".tmp")
      val out = new java.io.PrintWriter(new java.io.BufferedWriter(new java.io.FileWriter(tmp), 1 << 20))
      var x = 88172645463325252L
      def nxt(): Long = { x ^= x << 13; x ^= x >>> 7; x ^= x << 17; x }
      var i = 0
      while (i < edges) {
        val a = java.lang.Long.remainderUnsigned(nxt(), nodes)
        val b = java.lang.Long.remainderUnsigned(nxt(), nodes)
        out.println(s"$a $b")
        i += 1
      }
      val failed = out.checkError()
      out.close()
      if (failed || !tmp.renameTo(f))
        throw new java.io.IOException(s"mail-graph generation failed for $path")
    }
    path
  }

  /** MIW: text-scan ingest → graph. Narrow pipeline (read → split → cast),
    * shuffle-free; throughput bounded by IO. */
  def miw(spark: SparkSession, path: String): PropertyGraph =
    Loaders.fromEdgeTextFile(spark, path, MAILED, mirror = false, ranges)

  /** The parsed mail graph, cached once per (session, path): read-side
    * queries like [[cw]] are point/1-hop lookups — without the cache every
    * action re-parses the 367k-line text corpus, which dominates the query
    * (the ingest benchmark itself uses the uncached [[miw]]). */
  private val cache = new graft.util.SessionCache[PropertyGraph](
    maxEntries = 4, onEvict = _.edges.unpersist(blocking = false))
  def miwCached(spark: SparkSession, path: String): PropertyGraph =
    cache(spark, path) {
      val g = miw(spark, path)
      g.copy(edges = g.edges.cache())
    }

  /** CW: the reference's canonical 1-hop query from node 128 to anyNode. */
  def cw(g: PropertyGraph): DataFrame =
    Query.paths(g, nodes32(128) --| edge(attr(MAILED)) |-- anyNode)

  // ---- the reference's commented-out workloads (Bench.hs:31-37,
  // socialsensor/graphdb-benchmarks naming) — completed here ---------------

  /** SIW (single-insert workload): the same edge list arrives as `chunks`
    * successive append batches through the point-mutation API
    * (GraphOps.insertEdges, the reference's per-line insertNodeEdge path)
    * instead of one bulk scan — measures incremental-append overhead vs
    * MIW, and gates on incremental ≡ bulk. Chunk assignment hashes
    * (src,dst) so it is deterministic under lazy re-evaluation (a
    * row-number split would let rows migrate chunks between actions). */
  def siw(spark: SparkSession, path: String, chunks: Int = 16): PropertyGraph = {
    import org.apache.spark.sql.functions._
    val parsed = spark.read.text(path)
      .select(split(trim(col("value")), "\\s+").as("f"))
      .filter(size(col("f")) >= 2)
      .select(col("f").getItem(0).cast("long").as("src"),
        col("f").getItem(1).cast("long").as("dst"))
      .filter(col("src").isNotNull && col("dst").isNotNull)
      .withColumn("__chunk", pmod(xxhash64(col("src"), col("dst")), lit(chunks.toLong)))
    (0 until chunks).foldLeft(PropertyGraph.empty(spark, ranges)) { (g, i) =>
      graft.operators.GraphOps.insertEdges(g,
        Loaders.fromEdgeDF(parsed.filter(col("__chunk") === i).select("src", "dst"),
          MAILED, mirror = false, ranges).edges)
    }
  }

  /** QW-FN (find neighbours of all nodes): full-graph 1-hop expansion
    * through the query surface, reported per node. The pattern start is
    * predicate-only, so the whole workload is ONE pushed-down edge scan +
    * partial aggregation — no frontier materialization. */
  def qwfn(g: PropertyGraph): DataFrame = {
    import org.apache.spark.sql.functions._
    Query.paths(g, anyNode --| edge(attr(MAILED)) |--> anyNode)
      .groupBy(col("n0")).agg(count(lit(1)).as("n_neighbours"))
  }

  /** QW-FA (find adjacent nodes of all edges): resolve both endpoint node
    * objects (label via the broadcast-free range CASE chain) for every
    * distinct edge. */
  def qwfa(g: PropertyGraph): DataFrame = {
    import org.apache.spark.sql.functions._
    g.edges.filter(col("dir")).select(col("src"), col("dst"),
      g.labelOf(col("src")).as("src_label"), g.labelOf(col("dst")).as("dst_label"))
      .distinct()
  }

  /** QW-FS (find shortest paths): unweighted hop distances from the CW
    * anchor node 128 to every reachable node (Pregel). */
  def qwfs(g: PropertyGraph): DataFrame =
    graft.analytics.GraphAnalytics.shortestPaths(g, 128L)
}
