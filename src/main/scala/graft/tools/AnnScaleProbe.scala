package graft.tools

import org.apache.spark.sql.{DataFrame, SparkSession}
import org.apache.spark.sql.functions._

/** sf0.1 → 10× scale probe for the ANN / dedup / text headliners
  * (VERDICT r14 #3: the r14 sf1 table covers graph analytics + d14/t43/
  * siw; the ANN tiers' sublinear-candidate claims were measured at one
  * scale only). Ops and why:
  *
  *  - e8  IVF-PQ top-k (fixed 50-query set, 10× corpus): probed-partition
  *    scan + ADC are linear in corpus per query — expect ~10× on the
  *    query stage, plus the linear training pass.
  *  - e16 exact mutual-kNN: the deliberately-quadratic verification tier
  *    — expect ~100× pair volume; measured to DOCUMENT the quadratic the
  *    IVF tier exists to avoid (runs guarded, skippable via PROBE_SKIP).
  *  - e17-shape IVF mutual-kNN at FIXED k=16 centroids (the wrong 10×
  *    config: cluster-local n²/k with n 10× and k fixed → ~100×/cell
  *    budget) AND at k=160 (k ∝ n, the operator's documented 100 TB
  *    contract: per-cluster cell count returns to the 1× value ⇒ ~10×
  *    total). The PAIR shows the contract, not just a wall number.
  *  - d7  cross-corpus MinHash dedup: banded — expect ~linear in corpus
  *    + output pair growth (clone families span the "new" and
  *    "reference" sides).
  *  - d13 containment pairs (exact postings tier): Σdf² grows ~100× on
  *    the clone corpus; the pairBudget guard THROWING here is the
  *    designed outcome (the guard steers clone corpora to the banded
  *    tier) — the probe records guard-fired as a result, not a failure.
  *  - d3  exact Jaccard pairs: same Σdf² story as d13.
  *  - t23 DSIR importance weights: two hashed-feature n-gram passes +
  *    a broadcast model — expect ~linear.
  *
  * Corpus construction mirrors Sf1ScaleProbe (same /tmp paths, reused if
  * present): documents ×10 via doc_id offset + ` v$k` text variant;
  * embeddings ×10 via vec_id offset + a small deterministic per-copy
  * perturbation (cast back to float) so copies are near but not
  * bit-equal — duplicate points would degenerate ANN top-k ties.
  * One-off diagnostic, not a gate: results land in SCALING.md.
  */
object AnnScaleProbe {
  def main(args: Array[String]): Unit = {
    val spark = SparkSession.builder().master("local[32]")
      .appName("ann-scale-probe")
      .config("spark.sql.shuffle.partitions", 32)
      .config("spark.sql.adaptive.enabled", "true")
      .config("spark.sql.legacy.parquet.nanosAsLong", "true")
      .config("spark.ui.enabled", "false")
      .getOrCreate()
    spark.sparkContext.setLogLevel("WARN")
    import graft.functions.{Dedup, Similarity, TextAnalysis}

    val h = new ProbeHarness(spark, "ann-probe")
    val skip = sys.env.get("PROBE_SKIP").map(_.split(",").toSet).getOrElse(Set.empty)
    def t(label: String)(f: => Long): Unit =
      if (skip.exists(label.contains)) println(s"[ann-probe] $label: SKIPPED")
      else try h.timed(label)(f)
      catch { case e: Throwable =>
        println(s"[ann-probe] $label: GUARD/ERROR ${e.getClass.getSimpleName}: " +
          s"${Option(e.getMessage).getOrElse("").linesIterator.take(3).mkString(" | ")}")
      }

    val sf = "/root/testdata/sf0.1"
    def writeOnce(path: String)(df: => DataFrame): String = {
      if (!new java.io.File(path, "_SUCCESS").exists)
        df.write.mode("overwrite").parquet(path)
      path
    }
    val docs10Path = writeOnce("/tmp/graft_sf1_documents.parquet") {
      val docs = spark.read.parquet(s"$sf/documents.parquet")
      (0 until 10).map { k =>
        val d0 = docs.withColumn("doc_id", col("doc_id") + lit(k * 10000000L))
        if (k == 0) d0
        else d0.withColumn("text",
          when(col("text").isNotNull, concat(col("text"), lit(s" v$k"))))
      }.reduce(_ unionByName _)
    }
    val emb10Path = writeOnce("/tmp/graft_sf1_embeddings.parquet") {
      val emb = spark.read.parquet(s"$sf/embeddings.parquet")
      (0 until 10).map { k =>
        val e0 = emb.withColumn("vec_id", col("vec_id") + lit(k * 10000000L))
        if (k == 0) e0
        else e0.withColumn("embedding", expr(
          s"transform(embedding, (x, i) -> cast(x + 0.005d * sin(vec_id * (i + 1) + $k) as float))"))
      }.reduce(_ unionByName _)
    }

    def suite(tag: String, docsPath: String, embPath: String, big: Boolean): Unit = {
      val docs = spark.read.parquet(docsPath)
      val emb = spark.read.parquet(embPath)
      val queries = emb.filter(col("vec_id") < 50) // copy 0 originals at both scales
      for (pass <- 1 to 2) {
        t(s"$tag e8_ivfpq pass $pass")(
          Similarity.ivfPqTopK(queries, emb, k = 10,
            nCentroids = 16, nProbe = 8, nSub = 16, nCodes = 64,
            lloydIters = 2, nAssign = 2, rerank = 8).count())
        t(s"$tag e17ivf_mknn_k16 pass $pass")(
          Similarity.mutualKnnGraphIvf(emb, k = 10,
            nCentroids = 16, nProbe = 2, nAssign = 1).count())
        if (big)
          t(s"$tag e17ivf_mknn_k160 pass $pass")( // k ∝ n: the 100 TB contract
            Similarity.mutualKnnGraphIvf(emb, k = 10,
              nCentroids = 160, nProbe = 2, nAssign = 1).count())
        t(s"$tag e16_mknn_exact pass $pass")(
          Similarity.mutualKnnGraph(emb, k = 10).count())
        t(s"$tag d7_dedup_against pass $pass")(
          Dedup.dedupAgainst(docs.filter(col("doc_id") % 2 === 1),
            docs.filter(col("doc_id") % 2 === 0), threshold = 0.8).count())
        t(s"$tag d13_containment pass $pass")(
          Dedup.ngramContainmentPairs(docs, n = 3, threshold = 0.5).count())
        t(s"$tag d3_jaccard_exact pass $pass")(
          Dedup.ngramJaccardPairs(docs, n = 3, threshold = 0.3).count())
        t(s"$tag t23_dsir pass $pass")(
          TextAnalysis.dsirWeights(docs, docs.filter(col("doc_id") % 3 === 0)).count())
      }
    }

    println(s"[ann-probe] 1x embeddings: ${spark.read.parquet(s"$sf/embeddings.parquet").count()}, " +
      s"10x: ${spark.read.parquet(emb10Path).count()}")
    suite("1x", s"$sf/documents.parquet", s"$sf/embeddings.parquet", big = false)
    suite("10x", docs10Path, emb10Path, big = true)
    spark.stop()
  }
}
