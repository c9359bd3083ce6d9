package graft.sources

import graft.model._
import org.apache.spark.sql.{DataFrame, SparkSession}
import org.apache.spark.sql.functions._
import org.apache.spark.sql.types._

/** Graph construction — the reference's ingest surface re-expressed as
  * Spark sources (reference: fromList FastAccess.hs:247-258,
  * insertNodeLines Enum.hs:387-407, insertCSVEdgeStream FastAccess.hs:323-341).
  */
object Loaders {

  /** One logical input edge for [[fromList]]: a directed edge plus labels.
    * `addReverse` mirrors the reference's `dirRev`/nodeEdges handling
    * (FastAccess.hs:253-258): when set, a back-edge row (dst→src, dir=false)
    * is also emitted so the edge is visible from both endpoints.
    */
  final case class InputEdge(src: Long, dst: Long, labels: Seq[Int], addReverse: Boolean)

  /** Build a graph from in-memory lists (reference `fromList`/`fromListE`).
    * Multiple labels on one input edge overlay into `attrMask` exactly like
    * the reference's summed attr words (FastAccess.hs:271-278): the row's
    * `label` is the first label, `attrMask` ORs bit `1 << l` per label.
    */
  def fromList(
      spark: SparkSession,
      directed: Seq[InputEdge],
      ranges: Seq[RangeDef],
      nodes: Seq[NodeRow] = Nil): PropertyGraph = {
    import spark.implicits._
    val rows = directed.flatMap { e =>
      val mask = e.labels.foldLeft(0L)((m, l) => m | (1L << l))
      val fwd = EdgeRow(e.src, e.dst, e.labels.headOption.getOrElse(-1), mask, dir = true)
      if (e.addReverse) Seq(fwd, EdgeRow(e.dst, e.src, e.labels.headOption.getOrElse(-1), mask, dir = false))
      else Seq(fwd)
    }
    val nodeDf = if (nodes.isEmpty) None else Some(nodes.toDF().select("id"))
    PropertyGraph(rows.toDF(), ranges, explicitNodes = nodeDf)
  }

  /** Bulk-load a whitespace-separated int-pair edge list — the reference's
    * MIW benchmark ingest path (`insertNodeLines`, Enum.hs:387-407;
    * Bench.hs:53-58). One fixed label; scales as a pure text scan →
    * split → cast, no shuffle at all (narrow pipeline into parquet-ready
    * rows), so ingest throughput is bounded by IO not the engine.
    */
  def fromEdgeTextFile(spark: SparkSession, path: String, label: Int, mirror: Boolean, ranges: Seq[RangeDef]): PropertyGraph = {
    val raw = spark.read.text(path)
      .select(split(trim(col("value")), "\\s+").as("f"))
      .filter(size(col("f")) >= 2)
      .select(
        col("f").getItem(0).cast(LongType).as("src"),
        col("f").getItem(1).cast(LongType).as("dst"))
      .filter(col("src").isNotNull && col("dst").isNotNull)
    fromEdgeDF(raw, label, mirror, ranges)
  }

  /** Build from any (src,dst) DataFrame with one fixed label. */
  def fromEdgeDF(pairs: DataFrame, label: Int, mirror: Boolean, ranges: Seq[RangeDef]): PropertyGraph = {
    val fwd = pairs.select(
      col("src"), col("dst"), lit(label).as("label"),
      lit(1L << label).as("attrMask"), lit(true).as("dir"))
    val all = if (mirror) fwd.unionByName(
      pairs.select(col("dst").as("src"), col("src").as("dst"),
        lit(label).as("label"), lit(1L << label).as("attrMask"), lit(false).as("dir")))
    else fwd
    PropertyGraph(all, ranges)
  }

  /** CSV ingest (reference `insertCSVEdgeStream` + `AddCSVLine`,
    * FastAccess.hs:323-343, 230-235): read CSV in PERMISSIVE/DROPMALFORMED
    * mode, map string keys to dense node ids via a dictionary built with a
    * window-free `zipWithIndex`-style assignment, then emit edges.
    *
    * The reference threads a `Map String Word32` on the driver; at 100 TB
    * that dictionary must itself be distributed — we build it as a DataFrame
    * and resolve names with two (broadcast-able when small) joins.
    *
    * @param srcCol/dstCol names of the string-key columns in the CSV.
    * @return (graph, dictionary DataFrame (name, id)).
    */
  def fromCSV(
      spark: SparkSession,
      path: String,
      srcCol: String,
      dstCol: String,
      label: Int,
      mirror: Boolean,
      ranges: Seq[RangeDef],
      header: Boolean = true): (PropertyGraph, DataFrame) = {
    // DROPMALFORMED only rejects structurally broken rows; short rows are
    // null-padded, so skip-on-parse-failure (the reference's insertCSVEdge
    // Left-skip, FastAccess.hs:342-343) needs the null filter too
    val raw = spark.read.option("header", header.toString).option("mode", "DROPMALFORMED").csv(path)
      .filter(col(srcCol).isNotNull && col(dstCol).isNotNull)
    fromStringPairs(raw.select(col(srcCol).as("sname"), col(dstCol).as("dname")), label, mirror, ranges)
  }

  /** Name→dense-id assignment + edge emission from a (sname, dname) DF. */
  def fromStringPairs(pairs: DataFrame, label: Int, mirror: Boolean, ranges: Seq[RangeDef]): (PropertyGraph, DataFrame) = {
    val spark = pairs.sparkSession
    // Dense deterministic ids: sort distinct names once. zipWithIndex gives
    // stable contiguous ids (unlike monotonically_increasing_id) — the
    // range→label contract needs density (SURVEY §1.3).
    import spark.implicits._
    val names = pairs.select(col("sname").as("name")).union(pairs.select(col("dname"))).distinct()
    val dict = spark.createDataFrame(
      names.orderBy("name").as[String].rdd.zipWithIndex().map { case (n, i) => (n, i) }
    ).toDF("name", "id")
    (fromEdgeDF(resolveNames(pairs, dict), label, mirror, ranges), dict)
  }

  /** Resolve a (sname, dname) pair DF to (src, dst) ids through a
    * (name, id) dictionary — two equi-joins, broadcast while the dict is
    * small. Shared by the batch and streaming string-key paths. */
  private def resolveNames(pairs: DataFrame, dict: DataFrame): DataFrame =
    pairs
      .join(dict.withColumnRenamed("name", "sname").withColumnRenamed("id", "src"), "sname")
      .join(dict.withColumnRenamed("name", "dname").withColumnRenamed("id", "dst"), "dname")
      .select("src", "dst")

  /** Write-side of the persistence tier (reference listToDB/fromDB,
    * JudyGraph.hs:160-203 — LMDB replaced by parquet). Partitioned by
    * bucketed src would be ideal on a real cluster; plain parquet keeps the
    * local test path simple while remaining cluster-valid.
    */
  def save(g: PropertyGraph, dir: String): Unit = {
    g.edges.write.mode("overwrite").parquet(s"$dir/edges.parquet")
    g.nodeProps.foreach(_.write.mode("overwrite").parquet(s"$dir/node_props.parquet"))
    g.edgeProps.foreach(_.write.mode("overwrite").parquet(s"$dir/edge_props.parquet"))
    val spark = g.spark
    import spark.implicits._
    g.ranges.map(r => (r.start, r.len, r.nodeLabel, r.validEdgeLabels))
      .toDF("start", "len", "nodeLabel", "validEdgeLabels")
      .coalesce(1).write.mode("overwrite").parquet(s"$dir/ranges.parquet")
  }

  /** STREAMING CSV edge ingest — the reference's `insertCSVEdgeStream`
    * (FastAccess.hs:323-341) is a chunked streaming file reader; here it is
    * a Structured Streaming file source: new CSV files appearing under
    * `inDir` are projected to edge rows per micro-batch into a parquet edge
    * log read back via [[loadEdgeLog]]. Exactly-once: each micro-batch
    * lands in its own `__batch=<id>` partition with dynamic overwrite, so a
    * batch replayed after a crash-before-checkpoint-commit REPLACES its
    * partition instead of appending duplicates. The per-line callback of
    * the reference becomes the row→edge projection. Integer-keyed input;
    * string keys need the batch dictionary path ([[fromStringPairs]])
    * because a streaming dictionary is cross-batch state. Caller stops the
    * returned query. */
  def streamCSVEdges(
      spark: SparkSession,
      inDir: String,
      sinkDir: String,
      checkpointDir: String,
      label: Int,
      mirror: Boolean): org.apache.spark.sql.streaming.StreamingQuery = {
    val schema = StructType(Seq(
      StructField("src", LongType), StructField("dst", LongType)))
    val raw = spark.readStream.schema(schema)
      .option("mode", "DROPMALFORMED").csv(inDir)
      .filter(col("src").isNotNull && col("dst").isNotNull)
    raw.writeStream
      .option("checkpointLocation", checkpointDir)
      .foreachBatch { (batch: org.apache.spark.sql.Dataset[org.apache.spark.sql.Row], id: Long) =>
        fromEdgeDF(batch.toDF(), label, mirror, Nil).edges
          .withColumn("__batch", lit(id))
          .write.mode("overwrite")
          .option("partitionOverwriteMode", "dynamic")
          .partitionBy("__batch")
          .parquet(sinkDir)
      }
      .start()
  }

  /** Open the edge log written by [[streamCSVEdges]] as a graph (drops the
    * idempotence partition column). */
  def loadEdgeLog(spark: SparkSession, sinkDir: String, ranges: Seq[RangeDef]): PropertyGraph =
    PropertyGraph(spark.read.parquet(sinkDir).drop("__batch"), ranges)

  /** STREAMING CSV ingest with STRING keys — the stateful equivalent of the
    * reference's `AddCSVLine` name→id map (FastAccess.hs:230-235), whose
    * driver-side `Map String Word32` is threaded across the WHOLE stream.
    * Spark-first shape: the dictionary is a persisted parquet table that
    * grows append-only across micro-batches inside `foreachBatch`:
    *
    *  1. detect the batch's new names (anti-join against the dictionary —
    *     broadcast while the dict is small, shuffle join at scale);
    *  2. assign them a dense monotonic id block starting at max(id)+1,
    *     ordered by name within the batch (deterministic, so a replayed
    *     batch re-derives identical ids);
    *  3. append ONLY the new entries (never rewrite the dict — rewriting
    *     would race the read in the same job), then resolve the batch's
    *     edges through the updated dict into the `__batch`-partitioned
    *     edge log (same exactly-once overwrite as [[streamCSVEdges]]).
    *
    * Crash safety: dict-append lands before the edge write, so a batch
    * replayed after a crash BETWEEN the two finds its names already
    * assigned (anti-join → empty) and rewrites its edge partition with
    * identical ids. Ids are unique and, under Spark's all-or-nothing job
    * commit, dense 0..n-1 as the range→label contract requires (SURVEY
    * §1.3); on a store whose rename is not atomic a crash INSIDE the
    * append's commit window can surface a partial block, in which case
    * replay assigns the missing names a fresh block — ids stay unique and
    * stable but density can gain a gap (the honest limit of
    * append-without-a-transaction-log; a table format with atomic commits
    * slots in here at production scale).
    *
    * SINGLE WRITER REQUIRED per `dictDir`: the id-block assignment reads
    * max(id) then appends, so two concurrent writers (a second stream, or
    * a batch job sharing the dictionary) could read the same max and
    * assign overlapping blocks — silently aliasing distinct names to the
    * same ids. ENFORCED by an exclusive-create lock file
    * (`<dictDir>.lock`, [[graft.util.FsLock]]) around the
    * read→assign→append window: a concurrent writer fails loudly instead
    * of corrupting the dictionary. At production scale on an object store
    * without atomic create, a table format's commit protocol replaces the
    * lock.
    */
  def streamCSVEdgesNamed(
      spark: SparkSession,
      inDir: String,
      sinkDir: String,
      checkpointDir: String,
      dictDir: String,
      srcCol: String,
      dstCol: String,
      label: Int,
      mirror: Boolean,
      header: Boolean = true): org.apache.spark.sql.streaming.StreamingQuery = {
    val schema = StructType(Seq(
      StructField(srcCol, StringType), StructField(dstCol, StringType)))
    val raw = spark.readStream.schema(schema)
      .option("header", header.toString)
      .option("mode", "DROPMALFORMED").csv(inDir)
      .filter(col(srcCol).isNotNull && col(dstCol).isNotNull)
    raw.writeStream
      .option("checkpointLocation", checkpointDir)
      .foreachBatch { (batch: org.apache.spark.sql.Dataset[org.apache.spark.sql.Row], id: Long) =>
        import spark.implicits._
        val pairs = batch.toDF()
          .select(col(srcCol).as("sname"), col(dstCol).as("dname"))
          .localCheckpoint(true) // batch sources don't survive multiple jobs
        val dict0 = graft.util.ParquetIO.readOrEmpty(spark, dictDir,
          StructType(Seq(StructField("name", StringType), StructField("id", LongType))))
        val names = pairs.select(col("sname").as("name"))
          .union(pairs.select(col("dname"))).distinct()
        // The whole read-catalog → assign-block → append window runs under
        // an exclusive lock file (dictDir + ".lock"): a second writer that
        // slipped in between the anti-join and the append would read the
        // same max(id) and alias distinct names to one block. The lock
        // ENFORCES the single-writer contract (it was scaladoc-only
        // before); see FsLock for the atomicity limits per filesystem.
        val dict = graft.util.FsLock.withLock(spark,
            dictDir.stripSuffix("/") + ".lock", "streamCSVEdgesNamed") {
          // materialize both sides of the catalog state BEFORE the append
          // mutates what dict0 reads — dict0 itself is re-read lazily
          val newNames = names.join(dict0, Seq("name"), "left_anti").localCheckpoint(true)
          if (newNames.isEmpty) dict0.localCheckpoint(true)
          else {
            val old = dict0.localCheckpoint(true)
            val base = old.agg(coalesce(max(col("id")), lit(-1L))).head().getLong(0) + 1L
            val block = spark.createDataFrame(
              newNames.orderBy("name").as[String].rdd.zipWithIndex()
                .map { case (n, i) => (n, base + i) }
            ).toDF("name", "id").localCheckpoint(true)
            block.write.mode("append").parquet(dictDir)
            old.unionByName(block)
          }
        }
        fromEdgeDF(resolveNames(pairs, dict), label, mirror, Nil).edges
          .withColumn("__batch", lit(id))
          .write.mode("overwrite")
          .option("partitionOverwriteMode", "dynamic")
          .partitionBy("__batch")
          .parquet(sinkDir)
      }
      .start()
  }

  /** Open the edge log + dictionary written by [[streamCSVEdgesNamed]]. */
  def loadNamedEdgeLog(spark: SparkSession, sinkDir: String, dictDir: String,
      ranges: Seq[RangeDef]): (PropertyGraph, DataFrame) =
    (loadEdgeLog(spark, sinkDir, ranges), spark.read.parquet(dictDir))

  /** Bucketed persistence: edges hash-bucketed AND sorted by src. Every
    * adjacency/frontier/self join keys on src, so a bucketed edge table
    * joins co-located — zero Exchange on the edge side (pinned by
    * PlanSpec). At 100 TB this is the difference between re-shuffling the
    * whole edge relation per query and reading pre-partitioned buckets.
    * Written as an EXTERNAL table (explicit path) in the session catalog.
    *
    * `buckets <= 0` (the default) sizes the bucket count from Catalyst plan
    * statistics (~128 MB of scan bytes per bucket, clamped to [4, 10000]) —
    * a fixed count is either thousands of tiny files at sf0.001 or
    * multi-GB buckets at 100 TB; the byte target keeps one bucket ≈ one
    * healthy task either way.
    */
  def saveBucketed(g: PropertyGraph, table: String, path: String, buckets: Int = 0): Unit = {
    val spark = g.spark
    val n =
      if (buckets > 0) buckets
      else {
        // statless plans (e.g. RDD-backed) report defaultSizeInBytes
        // (Long.MaxValue-ish) — that sentinel must not clamp a tiny graph
        // to 10000 near-empty bucket files; fall back to the fixed 64
        val bytes = g.edges.queryExecution.optimizedPlan.stats.sizeInBytes
        if (bytes >= spark.sessionState.conf.defaultSizeInBytes) 64
        else ((bytes + (128L << 20) - 1) / (128L << 20)).min(10000).max(4).toInt
      }
    spark.sql(s"DROP TABLE IF EXISTS $table")
    g.edges.write.mode("overwrite")
      .option("path", path)
      .bucketBy(n, "src").sortBy("src")
      .saveAsTable(table)
  }

  def loadBucketed(spark: SparkSession, table: String, ranges: Seq[RangeDef]): PropertyGraph =
    PropertyGraph(spark.table(table), ranges)

  def load(spark: SparkSession, dir: String): PropertyGraph = {
    val ranges = spark.read.parquet(s"$dir/ranges.parquet").collect().map { r =>
      RangeDef(r.getLong(0), r.getLong(1), r.getInt(2), r.getSeq[Int](3))
    }.toSeq.sortBy(_.start)
    // FS-agnostic optional read: a java.io.File probe is always false on
    // hdfs:///s3a:// paths and would silently drop the property tables
    def optional(name: String) =
      try Some(spark.read.parquet(s"$dir/$name.parquet"))
      catch {
        case e: org.apache.spark.sql.AnalysisException
            if e.getMessage != null &&
              (e.getMessage.contains("Path does not exist") ||
               e.getMessage.contains("Unable to infer schema")) => None
      }
    PropertyGraph(spark.read.parquet(s"$dir/edges.parquet"), ranges,
      nodeProps = optional("node_props"), edgeProps = optional("edge_props"))
  }

  /** Debug sink: render the whole graph as a Graphviz digraph string
    * (reference `Show EnumGraph`, Enum.hs:78-91). Driver-side collect —
    * debug-only by definition, guarded by a row limit.
    */
  def toGraphviz(g: PropertyGraph, maxEdges: Int = 10000): String = {
    val es = g.edges.filter(col("dir")).limit(maxEdges).collect()
    val body = es.map(r => s"""  ${r.getLong(0)} -> ${r.getLong(1)} [label="${r.getInt(2)}"];""").mkString("\n")
    s"digraph G {\n$body\n}"
  }

  /** Debug sink: nodes/edges CSV for visualization (reference debugToCSV,
    * FastAccess.hs:719-724). */
  def debugToCSV(g: PropertyGraph, dir: String): Unit = {
    g.edges.write.mode("overwrite").option("header", "true").csv(s"$dir/edges_csv")
    g.nodes.write.mode("overwrite").option("header", "true").csv(s"$dir/nodes_csv")
  }
}
