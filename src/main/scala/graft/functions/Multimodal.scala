package graft.functions

import org.apache.spark.sql.{DataFrame, Dataset}
import org.apache.spark.sql.functions._
import org.apache.spark.sql.types._

/** Multimodal columns: image/audio/video as opaque BINARY columns with
  * typed metadata, plus the decode / feature-extract / resize /
  * frame-sample stages a training-data pipeline runs over them.
  *
  * The Spark-side plumbing is real — schema, partition-sized batch
  * processing through `mapPartitions` on typed Datasets (the Scala
  * equivalent of `mapInPandas` batches), narrow pipelines that never
  * shuffle the binary payload. The codec layer is a clearly-marked STUB:
  * this container has no image/audio libraries, so `decodeStub` derives
  * deterministic fake pixels/samples from the bytes. Swapping in a real
  * decoder changes only the function body — every signature, schema and
  * batch shape stays.
  */
object Multimodal {

  val mediaSchema: StructType = StructType(Seq(
    StructField("media_id", LongType),
    StructField("media", BinaryType), // opaque payload
    StructField("meta", StructType(Seq(
      StructField("format", StringType),
      StructField("width", IntegerType),
      StructField("height", IntegerType),
      StructField("duration_ms", IntegerType))))))

  final case class MediaRow(media_id: Long, media: Array[Byte], format: String,
      width: Int, height: Int, duration_ms: Int)
  final case class MediaFeatures(media_id: Long, n_bytes: Int, feature: Array[Float])
  final case class Frame(media_id: Long, frame_idx: Int, frame: Array[Byte])

  /** Synthesize a media table from any binary-able column — used by tests
    * and the gate to exercise the pipeline without real media files. */
  def synthesize(df: DataFrame, idCol: String, payloadCol: String): DataFrame =
    df.select(col(idCol).cast("long").as("media_id"),
      col(payloadCol).cast("binary").as("media"),
      struct(lit("fake/raw").as("format"),
        (length(col(payloadCol)) % 640).cast("int").as("width"),
        (length(col(payloadCol)) % 480).cast("int").as("height"),
        lit(0).as("duration_ms")).as("meta"))

  /** STUB decoder ??? — replace with a real codec (e.g. javax.imageio /
    * ffmpeg bindings) in production. Deterministic: "pixels" are a xor-fold
    * of the payload so downstream stages have stable inputs to test against.
    */
  private def decodeStub(payload: Array[Byte], outLen: Int): Array[Byte] = {
    val out = new Array[Byte](outLen)
    var acc = 0x5a
    var i = 0
    while (i < outLen) {
      acc = (acc * 31 + (if (payload.isEmpty) 0 else payload(i % payload.length))) & 0xff
      out(i) = acc.toByte
      i += 1
    }
    out
  }

  /** Decode + fixed-size feature extraction, batched per partition (the
    * mapInPandas shape: one iterator in, one iterator out, no per-row
    * overhead). Features here are a 32-dim byte-histogram projection of the
    * decoded payload — deterministic, swap for a real model embedding. */
  def extractFeatures(media: Dataset[MediaRow], featureDim: Int = 32): Dataset[MediaFeatures] = {
    import media.sparkSession.implicits._
    media.mapPartitions { it =>
      it.map { row =>
        val decoded = decodeStub(row.media, math.max(64, row.media.length))
        val hist = new Array[Float](featureDim)
        var i = 0
        while (i < decoded.length) { hist((decoded(i) & 0xff) % featureDim) += 1f; i += 1 }
        val n = decoded.length.toFloat
        MediaFeatures(row.media_id, row.media.length, hist.map(_ / n))
      }
    }
  }

  /** "Resize": decode at a target resolution — payload-proportional stub. */
  def resize(media: Dataset[MediaRow], w: Int, h: Int): Dataset[MediaRow] = {
    import media.sparkSession.implicits._
    media.mapPartitions(_.map(r =>
      r.copy(media = decodeStub(r.media, w * h), width = w, height = h)))
  }

  /** Frame sampling for video-shaped payloads: every `stride`-th chunk. */
  def sampleFrames(media: Dataset[MediaRow], frameBytes: Int, stride: Int): Dataset[Frame] = {
    import media.sparkSession.implicits._
    media.flatMap { r =>
      r.media.grouped(frameBytes).zipWithIndex
        .collect { case (chunk, i) if i % stride == 0 => Frame(r.media_id, i, chunk) }
    }
  }

  /** Flatten the nested meta struct into a typed Dataset for the batch ops. */
  def typed(df: DataFrame): Dataset[MediaRow] = {
    import df.sparkSession.implicits._
    df.select(col("media_id"), col("media"), col("meta.format").as("format"),
      col("meta.width").as("width"), col("meta.height").as("height"),
      col("meta.duration_ms").as("duration_ms")).as[MediaRow]
  }
}
