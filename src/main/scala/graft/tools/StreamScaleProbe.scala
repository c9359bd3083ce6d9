package graft.tools

import org.apache.spark.sql.SparkSession
import org.apache.spark.sql.functions._

/** Streaming-store scale measurement (SCALING.md protocol): seed a
  * signature store with `nSeed` documents, stream one `nBatch`-doc batch
  * against it, and report (a) the batch wall, (b) the pruned INDEX read
  * (rows actually read vs total index rows) and (c) the pruned STORE
  * verdict-fetch (rows vs total) — the O(touched) evidence for the v2
  * slim-index + id-partitioned-store layout. Also prints the on-disk
  * byte sizes of store vs index (the storage-ratio witness).
  * Usage: srcDir nSeed nBatch. */
object StreamScaleProbe {
  def main(args: Array[String]): Unit = {
    val Array(src, nSeedS, nBatchS) = args.take(3)
    val (nSeed, nBatch) = (nSeedS.toInt, nBatchS.toInt)
    val spark = SparkSession.builder()
      .master("local[32]")
      .config("spark.sql.shuffle.partitions", 32)
      .appName("stream-scale-probe")
      .getOrCreate()
    spark.sparkContext.setLogLevel("WARN")
    import spark.implicits._
    val root = java.nio.file.Files.createTempDirectory("graft_streamscale").toString
    val sigDir = s"$root/sigs"
    val docs = spark.read.parquet(s"$src/documents.parquet")
      .filter(col("text").isNotNull)
      .select(col("doc_id"), col("text")).limit(nSeed + nBatch)
      .collect().map(r => (r.getLong(0), r.getString(1)))
    val t0 = System.nanoTime()
    graft.functions.Dedup.seedSignatureStore(
      docs.take(nSeed).toSeq.toDF("doc_id", "text"), sigDir)
    println(f"RESULT seed_wall=${(System.nanoTime() - t0) / 1e9}%.2f s (n=$nSeed)")
    // one micro-batch of nBatch docs: half re-use seeded text (near-dup
    // arrivals that touch hot buckets), half are fresh
    val batchRows = docs.drop(nSeed).take(nBatch / 2).toSeq ++
      docs.take(nBatch - nBatch / 2).map { case (id, t) => (id + 900000000L, t) }
    val inDir = s"$root/in"; new java.io.File(inDir).mkdirs()
    batchRows.toDF("doc_id", "text").coalesce(1).write.parquet(s"$inDir/b1")
    val schema = org.apache.spark.sql.types.StructType(Seq(
      org.apache.spark.sql.types.StructField("doc_id", org.apache.spark.sql.types.LongType),
      org.apache.spark.sql.types.StructField("text", org.apache.spark.sql.types.StringType)))
    val t1 = System.nanoTime()
    val q = graft.functions.Dedup.minHashDedupStream(
      spark.readStream.schema(schema).parquet(s"$inDir/*"),
      sigDir, s"$root/pairs", s"$root/ckpt", threshold = 0.8)
    try q.processAllAvailable() finally q.stop()
    println(f"RESULT batch_wall=${(System.nanoTime() - t1) / 1e9}%.2f s (n=$nBatch)")
    // replicate the batch's pruned-read shape to report row counts
    val idxDir = s"${sigDir}_idx_v2_b16x4_p1024"
    val idx = spark.read.parquet(idxDir)
    val newSigs = graft.functions.Dedup.minHashSignaturesNative(
      batchRows.toDF("doc_id", "text"))
    val newB = newSigs.select(col("id"), posexplode(
        array((0 until 16).map(b => xxhash64(concat_ws(",",
          slice(col("sig"), b * 4 + 1, 4)), lit(b))): _*)))
      .toDF("id", "band", "bucket")
    val touchedP = newB.select(pmod(col("bucket"), lit(1024)).cast("int").as("__p"))
      .distinct().collect().map(_.getInt(0)).toSeq
    val prunedRows = idx.filter(col("__p").isin(touchedP: _*))
      .join(newB.select("band", "bucket").distinct(), Seq("band", "bucket"), "left_semi")
      .count()
    println(s"RESULT idx_pruned_rows=$prunedRows of ${idx.count()} " +
      s"(partitions ${touchedP.size} of ${idx.select("__p").distinct().count()})")
    val store = spark.read.parquet(sigDir)
    val batchSp = newSigs.select(pmod(col("id"), lit(1024)).cast("int").as("__sp"))
      .distinct().collect().map(_.getInt(0)).toSeq
    val storePruned = store.filter(col("__sp").isin(batchSp: _*)).count()
    println(s"RESULT store_pruned_rows=$storePruned of ${store.count()}")
    def dirBytes(p: String): Long = {
      val path = java.nio.file.Path.of(p)
      if (!java.nio.file.Files.exists(path)) 0L
      else {
        import scala.jdk.CollectionConverters._
        java.nio.file.Files.walk(path).iterator().asScala
          .filter(java.nio.file.Files.isRegularFile(_))
          .map(java.nio.file.Files.size).sum
      }
    }
    println(s"RESULT store_bytes=${dirBytes(sigDir)} idx_bytes=${dirBytes(idxDir)}")
    spark.stop()
  }
}
