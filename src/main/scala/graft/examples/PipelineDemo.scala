package graft.examples

import graft.functions.{Dedup, Similarity, TextAnalysis}
import org.apache.spark.sql.SparkSession
import org.apache.spark.sql.functions._

/** End-to-end training-data pipeline a library user would write: the
  * documents corpus flows normalize → quality/repetition filter →
  * near-dup dedup (pairs → families → keepers) → decontaminate →
  * per-source token-budget cut → pack into training chunks; embeddings
  * flow through an on-disk IVF index probe. Each stage prints its
  * row-count effect so the whole funnel is visible at a glance.
  *
  * Run: sbt "runMain graft.examples.PipelineDemo [sfDir]"
  */
object PipelineDemo {
  def main(args: Array[String]): Unit = {
    val sfDir = args.headOption.getOrElse("/root/testdata/sf0.001")
    val spark = SparkSession.builder()
      .master(s"local[${sys.env.getOrElse("SPARK_GRAFT_CPUS", "32")}]")
      .config("spark.sql.shuffle.partitions", sys.env.getOrElse("SPARK_GRAFT_CPUS", "32"))
      .config("spark.sql.session.timeZone", "UTC")
      .config("spark.sql.adaptive.enabled", "true")
      .config("spark.ui.enabled", "false")
      .getOrCreate()
    spark.sparkContext.setLogLevel("WARN")

    val docs = spark.read.parquet(s"$sfDir/documents.parquet")
    println(s"corpus: ${docs.count()} documents")

    // 1. normalize (NFC + whitespace collapse) — feeds every hash below
    val normed = TextAnalysis.normalizeText(docs)
      .withColumn("text", col("text_norm")).drop("text_norm")

    // 2. quality gate: composite score + Gopher repetition rules
    val quality = TextAnalysis.qualityFeatures(normed)
      .filter(col("quality_score") >= 0.5)
      .select(docs.columns.toIndexedSeq.map(col): _*)
    val rep = TextAnalysis.repetitionFeatures(normed)
      .filter(col("top_token_frac") <= 0.2)
      .select("doc_id")
    val filtered = quality.join(rep, "doc_id")
    println(s"after quality + repetition filters: ${filtered.count()}")

    // 3. near-dup dedup: pairs → connected families → min-id keepers
    val pairs = Dedup.minHashDuplicates(filtered, threshold = 0.8)
    val clusters = Dedup.duplicateClusters(pairs)
    val deduped0 = Dedup.keepRepresentatives(filtered, clusters)
    println(s"near-dup pairs: ${pairs.count()}, after dedup: ${deduped0.count()}")

    // 3b. exact-substring pass (Lee et al.): drop spans duplicated across
    // the surviving docs — catches boilerplate assembly that pairwise
    // dedup can't see
    val scrubbed = Dedup.dropDuplicatedNgrams(deduped0, n = 5)
    val nDropped = scrubbed.agg(sum("n_dropped")).head().getLong(0)
    val deduped = deduped0.drop("text")
      .join(scrubbed.select(col("doc_id"), col("text_dedup").as("text")), "doc_id")
    println(s"duplicated-span scrub: $nDropped tokens dropped across " +
      s"${scrubbed.filter(col("n_dropped") > 0).count()} docs")

    // 3c. leakage-safe held-out split: a near-dup family never straddles
    // the boundary (reusing the pair tier's output, like clustering does)
    val split = Dedup.leakageSafeSplit(docs, pairs, testFrac = 0.1)
    val bySide = split.groupBy("split").count().collect()
      .map(r => r.getString(0) -> r.getLong(1)).toMap
    println(s"leakage-safe split: ${bySide.getOrElse("test", 0L)} test / " +
      s"${bySide.getOrElse("train", 0L)} train (family-atomic)")

    // 3d. DSIR importance weights vs a quality-sample target: the score a
    // resampling step would select on (target = top-quality docs)
    val tgtIds = quality.orderBy(desc("quality_score"), col("doc_id"))
      .limit(50).select("doc_id")
    val dsir = TextAnalysis.dsirWeights(deduped0, deduped0.join(tgtIds, "doc_id"))
    println(s"DSIR weights: ${dsir.count()} docs scored; top-weight docs:")
    dsir.orderBy(desc("dsir_logweight")).show(3, truncate = false)

    // 4. decontaminate vs a benchmark probe set (here: slices of 3 docs)
    val probes = docs.filter(col("doc_id") < 3)
      .select(col("doc_id").as("probe_id"), substring(col("text"), 20, 60).as("probe"))
    val tainted = TextAnalysis.findContaminationNgrams(deduped, probes, n = 3)
    val clean = deduped.join(tainted.select("doc_id"), Seq("doc_id"), "left_anti")
    println(s"decontamination hits: ${tainted.count()}, clean corpus: ${clean.count()}")

    // 5. per-source token budget, then pack into fixed-size chunks
    val tokens = TextAnalysis.tokenCountWs(col("text"))
    val budgeted = TextAnalysis.tokenBudgetSample(clean, 500, tokens)
    val packed = TextAnalysis.packSequences(
      clean.join(budgeted.select("doc_id"), "doc_id"), 2048, tokens)
    println(s"within budget: ${budgeted.count()} docs, " +
      s"chunks: ${packed.select("shard", "chunk_id").distinct().count()}")

    // 5b. retrieval-grade term weights on the final corpus (the features
    // a quality classifier or topic sampler consumes)
    val terms = TextAnalysis.bm25Terms(clean, topM = 3)
    println(s"bm25 top-3 terms: ${terms.count()} rows; heaviest overall:")
    terms.orderBy(desc("bm25")).show(3, truncate = false)

    // 6. embeddings: build the on-disk IVF index once, probe it; then
    // grow it with a "late-arriving" batch the way ivfIndexStream's
    // micro-batches do — the new vectors are probe-visible immediately
    val emb = spark.read.parquet(s"$sfDir/embeddings.parquet")
    val ivfDir = "/tmp/graft_pipeline_demo_ivf"
    val seed = emb.filter(col("vec_id") % 2 === 0)
    Similarity.saveIvfIndex(seed, ivfDir, nCentroids = 8)
    Similarity.appendToIvfIndex(
      emb.filter(col("vec_id") % 2 === 1), ivfDir, batchId = 0L, "vec_id", "embedding")
    val hits = Similarity.ivfTopKIndexed(
      emb.filter(col("vec_id") < 5), ivfDir, k = 3, nProbe = 2)
    println(s"ANN probe results over the streamed-into index: ${hits.count()} (5 queries × k=3)")
    hits.show(6, truncate = false)

    // 7. multimodal: REAL PNGs (built from doc stats), decoded + resized
    // through the JDK ImageIO codec path
    import graft.functions.Multimodal
    import spark.implicits._
    val images = docs.filter(col("doc_id") < 8)
      .select(col("doc_id"), col("n_chars")).as[(Long, Long)]
      .map { case (id, n) =>
        val w = 8 + (n % 16).toInt; val h = 8 + (n % 9).toInt
        val img = new java.awt.image.BufferedImage(w, h,
          java.awt.image.BufferedImage.TYPE_INT_RGB)
        val g = img.createGraphics()
        g.setColor(new java.awt.Color((n * 2654435761L).toInt & 0xFFFFFF))
        g.fillRect(0, 0, w, h); g.dispose()
        val bos = new java.io.ByteArrayOutputStream()
        javax.imageio.ImageIO.write(img, "png", bos)
        Multimodal.MediaRow(id, bos.toByteArray, "image/png", w, h, 0)
      }
    val decoded = Multimodal.decodeImages(Multimodal.resizeImages(images, 8, 8))
    println(s"decoded ${decoded.filter(_.decode_ok).count()} resized images:")
    decoded.toDF().show(4, truncate = false)

    // real WAV payloads (written through the same JDK path crawler audio
    // would decode back through): per-channel RMS/peak via javax.sound
    val audio = docs.limit(4)
      .select(col("doc_id"), col("n_chars")).as[(Long, Long)]
      .map { case (id, n) =>
        val rate = 8000f; val len = 800
        val amp = 0.2 + 0.15 * (n % 4)
        val data = new Array[Byte](len * 2)
        var i = 0
        while (i < len) {
          val v = (amp * math.sin(2 * math.Pi * 440 * i / rate) * 32767).round.toInt
          data(i * 2) = (v & 0xff).toByte; data(i * 2 + 1) = ((v >> 8) & 0xff).toByte
          i += 1
        }
        val fmt = new javax.sound.sampled.AudioFormat(rate, 16, 1, true, false)
        val ais = new javax.sound.sampled.AudioInputStream(
          new java.io.ByteArrayInputStream(data), fmt, len)
        val bos = new java.io.ByteArrayOutputStream()
        javax.sound.sampled.AudioSystem.write(ais,
          javax.sound.sampled.AudioFileFormat.Type.WAVE, bos)
        Multimodal.MediaRow(id, bos.toByteArray, "audio/wav", 0, 0, 100)
      }
    val sound = Multimodal.decodeAudio(audio)
    println(s"decoded ${sound.filter(_.decode_ok).count()} WAV clips:")
    sound.toDF().select(col("media_id"), col("sample_rate"), col("n_frames"),
      round(col("duration_ms"), 1).as("duration_ms"),
      round(element_at(col("rms"), 1), 4).as("rms_ch0"),
      round(element_at(col("peak"), 1), 4).as("peak_ch0")).show(4, truncate = false)

    // 8. event analytics: view→click→purchase conversion funnel over the
    // events table (greedy earliest-path matching, 1-day span)
    val funnel = graft.streaming.EventStreams.funnel(
      graft.gate.GateQueries.events(spark, sfDir),
      Seq("view", "click", "purchase"),
      maxSpanNanos = Some(86400L * 1000000000L))
    val fstats = funnel.agg(count(lit(1)), sum(col("converted"))).head()
    println(s"funnel: ${fstats.getLong(0)} users reached step 1, " +
      s"${fstats.getLong(1)} converted within a day")

    // 9. compressed ANN: product-quantization ADC over the embeddings
    // (16 subspaces × 16 codewords — the memory-bound exhaustive tier)
    val pq = Similarity.pqTopK(emb.filter(col("vec_id") < 5), emb, k = 3,
      nSub = 16, nCodes = 16, lloydIters = 2)
    println(s"PQ ADC probe: ${pq.count()} rows (5 queries × k=3, 64-bit codes)")

    // 10. SQ8: the 1-byte-per-dim tier between brute force and PQ
    val sq8 = Similarity.sq8TopK(emb.filter(col("vec_id") < 5), emb, k = 3)
    println(s"SQ8 probe: ${sq8.count()} rows (byte codes, exact norms)")

    // 11. corpus hygiene reports: frequent tokens (boilerplate signal)
    // and C4 cleaning verdicts
    val hh = TextAnalysis.heavyHitters(docs, phi = 0.01)
    println(s"heavy hitters at 1%: ${hh.count()} tokens")
    val c4 = TextAnalysis.c4Filters(docs)
    println(s"C4 verdicts: ${c4.filter(col("keep")).count()} of ${c4.count()} docs keep " +
      "(single-line unpunctuated corpus: expect 0 keepers)")

    // 12. monitoring: hourly per-type spike detection on the event stream
    val spikes = graft.streaming.EventStreams.windowAnomalies(
      graft.gate.GateQueries.events(spark, sfDir), zThreshold = 2.0)
    println(s"window anomalies: ${spikes.filter(col("anomaly")).count()} " +
      s"flagged of ${spikes.count()} (type, hour) buckets")

    // 13. tokenizer learning: BPE merges from the corpus, then the real
    // per-doc BPE token budget under those merges
    val merges = TextAnalysis.bpeMerges(docs, nMerges = 8)
      .orderBy("rank").collect().map(r => (r.getString(1), r.getString(2))).toSeq
    val bpe = TextAnalysis.bpeTokenCounts(docs, merges)
    val bstats = bpe.agg(sum("n_words"), sum("n_bpe_tokens")).head()
    println(s"BPE: ${merges.size} merges learned " +
      s"(first: ${merges.take(3).map { case (a, b) => a + "+" + b }.mkString(", ")}); " +
      s"${bstats.getLong(0)} words → ${bstats.getLong(1)} BPE tokens")

    // 14. filtered + clustered embeddings: metadata-predicate ANN and
    // deterministic k-means corpus bucketing
    val filteredAnn = Similarity.ivfTopK(emb.filter(col("vec_id") < 5), emb, k = 3,
      nCentroids = 8, nProbe = 8, corpusFilter = Some(col("label") % 2 === 0))
    println(s"filtered ANN (even labels only): ${filteredAnn.count()} rows")
    val km = Similarity.kmeansAssign(emb, k = 4, iters = 2)
    println(s"k-means corpus buckets: ${km.groupBy("cluster").count().count()} clusters")

    // 15. attribution: last click before each purchase, 6-hour horizon
    val attr = graft.streaming.EventStreams.attributeLastTouch(
      graft.gate.GateQueries.events(spark, sfDir), "click", "purchase",
      21600L * 1000000000L)
    println(s"attribution: ${attr.filter(col("attributed")).count()} of " +
      s"${attr.count()} purchases attributed to a click")

    // 16. classification + keywords + vocab: the provenance classifier,
    // TextRank keyword ranking, and the frequency-ranked token-id table
    val nb = TextAnalysis.naiveBayesClassify(docs)
    val nbAcc = nb.join(docs.select(col("doc_id"), col("source")), "doc_id")
      .filter(col("predicted") === col("source")).count()
    println(s"naive Bayes self-classification: $nbAcc of ${nb.count()} sources recovered")
    val kw = TextAnalysis.textRankKeywords(docs, minCount = 5)
    println(s"TextRank: ${kw.count()} keywords ranked " +
      s"(top: ${kw.orderBy(col("rank").desc).limit(3).collect().map(_.getString(0)).mkString(", ")})")
    val vocab = TextAnalysis.buildVocab(docs, minCount = 2)
    println(s"vocab: ${vocab.count()} tokens with reserved ids 0-3")

    // 17. retrieval depth: two-stage projected ANN and the mutual-kNN graph
    val proj = Similarity.projectedTopK(emb.filter(col("vec_id") < 5), emb,
      k = 3, outDim = 32, shortlist = -1)
    println(s"projected two-stage ANN: ${proj.count()} rows")
    val mk = Similarity.mutualKnnGraph(emb, k = 5)
    println(s"mutual-kNN graph: ${mk.count()} edges")

    // 18. media dedup: perceptual/stub hashes over synthesized payloads
    val mediaRows = graft.functions.Multimodal.typed(
      graft.functions.Multimodal.synthesize(
        docs.select(col("doc_id"),
          when(col("doc_id") % 50 === 0, lit("planted dup")).otherwise(col("text")).as("p")),
        "doc_id", "p"))
    val mdups = graft.functions.Multimodal.nearDuplicateMedia(mediaRows)
    println(s"media near-dups (planted copies): ${mdups.count()} pairs")

    // 19. sketch tiers: exact-match decontam via broadcast Bloom prefilter
    // (reference = every 5th doc, so overlap is guaranteed), and mergeable
    // HLL distinct-token counts vs their exact twin
    val bloomFlagged = Dedup.exactDedupAgainstBloom(
      docs, docs.filter(col("doc_id") % 5 === 0))
    println(s"bloom exact decontam: ${bloomFlagged.count()} of ${docs.count()} docs flagged")
    val exactDistinct = TextAnalysis.distinctTokenCounts(docs)
      .as[(String, Long)].collect().toMap
    val hllDistinct = TextAnalysis.distinctTokenEstimates(docs)
      .as[(String, Long)].collect().toMap
    val worstErr = exactDistinct.map { case (g, e) =>
      math.abs(hllDistinct(g) - e).toDouble / e }.max
    println(f"HLL distinct tokens: ${exactDistinct.size} sources, worst rel err $worstErr%.4f vs exact")

    // 20. cross-source overlap audit: the exact trigram Jaccard matrix and
    // its MinHash sketch tier (estimates from |sources|-row sketches only)
    val ovl = TextAnalysis.sourceOverlap(docs)
      .orderBy(desc("jaccard"), col("src_a"), col("src_b"))
    val top = ovl.limit(1).collect().head
    val estErr = TextAnalysis.sourceOverlapEstimates(
        TextAnalysis.sourceMinHashSketches(docs))
      .join(ovl, Seq("src_a", "src_b"))
      .select(avg(abs(col("jaccard_est") - col("jaccard"))))
      .collect().head.getDouble(0)
    println(f"source overlap: ${ovl.count()} pairs, top ${top.getString(0)}~${top.getString(1)} " +
      f"jaccard ${top.getDouble(5)}%.3f; sketch mean abs err $estErr%.4f")

    // 21. round 16: measured-width semantic dedup (nAssign = -1 probes
    // the trained model's boundary-miss rate) and the cross-modal
    // keep/drop decision (a page drops when EITHER modality matches an
    // earlier doc — text exactly, payload perceptually)
    val autoW = Similarity.calibratedAssignWidth(emb, threshold = 0.35)
    val semAuto = Similarity.semanticDedup(emb, threshold = 0.35,
      nClusters = -1, nAssign = -1)
    println(s"auto-width semantic dedup: width $autoW, ${semAuto.count()} pairs")
    val xm = graft.functions.Multimodal.crossModalDedup(
      docs.select(col("doc_id"),
        when(col("doc_id") % 41 === 0, lit("planted text dup"))
          .otherwise(coalesce(col("text"), lit(""))).as("text")),
      mediaRows)
    println(s"cross-modal dedup: ${xm.filter(col("keep") === 1).count()} of " +
      s"${xm.count()} pages kept (${xm.filter(col("dup_media") === 1).count()} media dups, " +
      s"${xm.filter(col("dup_text") === 1).count()} text dups)")

    spark.stop()
  }
}
