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
  * shuffle the binary payload.
  *
  * Codec status per modality:
  *  - IMAGES are decoded for REAL via `javax.imageio` (JDK built-in:
  *    PNG/JPEG/BMP/GIF, headless-safe) — [[decodeImages]] /
  *    [[resizeImages]];
  *  - AUDIO is decoded for REAL via `javax.sound.sampled` (JDK built-in:
  *    WAV/AIFF/AU, any PCM/a-law/u-law encoding the JDK converts) —
  *    [[decodeAudio]] emits sample rate, channels, duration and
  *    per-channel RMS/peak;
  *  - VIDEO is parsed for REAL at the container level: [[sampleFrames]]
  *    walks RIFF-AVI 'movi' chunks (pure JDK index arithmetic) and
  *    emits the video-stream chunks as frames — for MJPEG each frame is
  *    a complete JPEG the image stages then decode with `javax.imageio`.
  *    Non-AVI codecs (H.264 etc.) have no JDK decoder; those payloads
  *    fall back to the clearly-marked `decodeStub`, and every
  *    [[extractFeatures]] row carries a `source` flag naming the path
  *    it took, so stub-derived features are identifiable downstream.
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
  /** `source` names the decode path the feature came from — "image"
    * (real luma pixels), "audio" (real PCM bytes), "video" (real pixels
    * of the first decodable AVI frame) or "stub" (the deterministic
    * fallback). Downstream filters on it to keep model-bound features
    * honest: an image payload exceeding `maxPixels` (the decompression-
    * bomb bound) is REJECTED by the bounded decoder and lands here as
    * "stub", the same payload [[decodeImages]] flags decode_ok = false. */
  final case class MediaFeatures(media_id: Long, n_bytes: Int, feature: Array[Float],
      source: String)
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

  /** STUB decoder ??? — the deterministic fallback for payloads NO real
    * decode path accepts: not `javax.imageio` images, not
    * `javax.sound.sampled` audio, not RIFF-AVI video (whose MJPEG frames
    * decode for real — [[sampleFrames]] / [[aviVideoChunks]]). Also the
    * landing spot for payloads a real codec REJECTED on purpose (the
    * `maxPixels` decompression-bomb bound) — [[MediaFeatures.source]]
    * flags every stub-derived feature. Deterministic: "samples" are a
    * fold of the payload so downstream stages have stable inputs to test
    * against. */
  private def decodeStub(payload0: Array[Byte], outLen: Int): Array[Byte] = {
    val payload = if (payload0 == null) Array.empty[Byte] else payload0
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

  /** Decode any `javax.sound.sampled`-supported payload (WAV/AIFF/AU) to
    * normalized 16-bit signed little-endian PCM at the source rate and
    * channel count. Returns null for undecodable payloads. The decoded
    * array is ≤ ~2× the payload for PCM sources (bounded by the row, like
    * the image raster path), read fully since the payload is already an
    * in-memory row. */
  /** Container magic precheck: WAV ("RIFF"), AIFF ("FORM"), AU (".snd").
    * `AudioSystem` rejects other payloads via UnsupportedAudioFileException,
    * which costs an exception per row — on a corpus where most payloads are
    * NOT audio (the extractFeatures dispatch path), a 4-byte compare
    * replaces fill-in-stack-trace as the common-case cost. */
  private def looksLikeAudio(b: Array[Byte]): Boolean =
    b != null && b.length >= 4 &&
      ((b(0) == 'R' && b(1) == 'I' && b(2) == 'F' && b(3) == 'F') ||
       (b(0) == 'F' && b(1) == 'O' && b(2) == 'R' && b(3) == 'M') ||
       (b(0) == '.' && b(1) == 's' && b(2) == 'n' && b(3) == 'd'))

  private def readAudioPcm(bytes: Array[Byte]): (javax.sound.sampled.AudioFormat, Array[Byte]) =
    if (!looksLikeAudio(bytes)) null
    else try {
      val in = javax.sound.sampled.AudioSystem.getAudioInputStream(
        new java.io.ByteArrayInputStream(bytes))
      try {
        val base = in.getFormat
        if (base.getChannels <= 0 || base.getSampleRate <= 0) null
        else {
          val target = new javax.sound.sampled.AudioFormat(
            javax.sound.sampled.AudioFormat.Encoding.PCM_SIGNED,
            base.getSampleRate, 16, base.getChannels,
            base.getChannels * 2, base.getSampleRate, false)
          val pcm = javax.sound.sampled.AudioSystem.getAudioInputStream(target, in)
          try (target, pcm.readAllBytes()) finally pcm.close()
        }
      } finally in.close()
    } catch { case _: Exception => null }

  // ---- video: RIFF-AVI container (real, JDK-only) --------------------------

  /** RIFF-AVI container magic: "RIFF" <size:u32le> "AVI ". */
  private def looksLikeAvi(b: Array[Byte]): Boolean =
    b != null &&
    b.length >= 12 &&
      b(0) == 'R' && b(1) == 'I' && b(2) == 'F' && b(3) == 'F' &&
      b(8) == 'A' && b(9) == 'V' && b(10) == 'I' && b(11) == ' '

  /** Byte ranges (offset, length) of the video-stream data chunks
    * ('NNdc' compressed / 'NNdb' uncompressed, NN = stream number
    * digits) inside 'movi' lists, in container order — for MJPEG (the
    * AVI flavor a JDK can actually decode) each range is one complete
    * JPEG image. The walk is pure index arithmetic over the RIFF tree
    * (LIST recursion, word-aligned chunk advance); a truncated or
    * size-corrupt chunk ENDS the walk with the frames found so far —
    * the corrupt-payload contract is partial data, never an exception. */
  private def aviVideoChunks(b: Array[Byte]): Vector[(Int, Int)] = {
    val out = Vector.newBuilder[(Int, Int)]
    def u32(off: Int): Long =
      (b(off) & 0xffL) | ((b(off + 1) & 0xffL) << 8) |
        ((b(off + 2) & 0xffL) << 16) | ((b(off + 3) & 0xffL) << 24)
    def fourcc(off: Int): String =
      new String(b, off, 4, java.nio.charset.StandardCharsets.ISO_8859_1)
    def isVideoData(id: String): Boolean =
      id(0).isDigit && id(1).isDigit && id(2) == 'd' && (id(3) == 'c' || id(3) == 'b')
    def walk(start: Int, end: Int, inMovi: Boolean): Unit = {
      var off = start
      var ok = true
      while (ok && off + 8 <= end) {
        val id = fourcc(off)
        val size = u32(off + 4)
        val body = off + 8
        val truncated = size > end - off - 8 // declared size overruns the buffer
        if (id == "LIST" && size >= 4 && body + 4 <= end)
          // recurse into a LIST even when truncated — the frames BEFORE
          // the damage are still intact inside it
          walk(body + 4, math.min(body + size, end.toLong).toInt,
            inMovi || fourcc(body) == "movi")
        else if (!truncated && inMovi && isVideoData(id) && size > 0)
          out += ((body, size.toInt))
        if (truncated) ok = false // a cut data chunk ends the walk
        else off = body + size.toInt + (size.toInt & 1) // chunks are word-aligned
      }
    }
    walk(12, math.min(b.length.toLong, 8L + u32(4)).toInt, inMovi = false)
    out.result()
  }

  /** Per-pixel integer luma (BT.601 weights) of a decoded raster — the
    * shared "real pixels" byte stream behind image and video features. */
  private def lumaBytes(img: java.awt.image.BufferedImage): Array[Byte] = {
    val w = img.getWidth; val h = img.getHeight
    val px = img.getRGB(0, 0, w, h, null, 0, w)
    val out = new Array[Byte](px.length)
    var i = 0
    while (i < px.length) {
      val p = px(i)
      out(i) = ((((p >> 16) & 0xff) * 299 + ((p >> 8) & 0xff) * 587 +
        (p & 0xff) * 114) / 1000).toByte
      i += 1
    }
    out
  }

  final case class AudioInfo(media_id: Long, sample_rate: Int, channels: Int,
      n_frames: Long, duration_ms: Double, rms: Array[Double], peak: Array[Double],
      decode_ok: Boolean)

  /** REAL audio decode via `javax.sound.sampled` (JDK built-in — WAV/
    * AIFF/AU containers, PCM/a-law/u-law encodings), batched per
    * partition like every codec stage. Emits sample rate, channel count,
    * frame count, duration and per-channel RMS + peak amplitude
    * (normalized to [-1, 1]); undecodable or corrupt payloads yield an
    * explicit `decode_ok = false` row rather than null — the same
    * corrupt-fraction contract as [[decodeImages]]. */
  def decodeAudio(media: Dataset[MediaRow]): Dataset[AudioInfo] = {
    import media.sparkSession.implicits._
    media.mapPartitions { it =>
      it.map { r =>
        val dec = readAudioPcm(r.media)
        if (dec == null)
          AudioInfo(r.media_id, -1, -1, -1L, 0.0, Array.empty, Array.empty, decode_ok = false)
        else {
          val (fmt, data) = dec
          val ch = fmt.getChannels
          val frames = data.length / (ch * 2)
          val sumSq = new Array[Double](ch)
          val peak = new Array[Double](ch)
          var f = 0
          while (f < frames) {
            var c = 0
            while (c < ch) {
              val i = (f * ch + c) * 2
              val s = ((data(i + 1) << 8) | (data(i) & 0xff)).toShort / 32768.0
              sumSq(c) += s * s
              val a = math.abs(s); if (a > peak(c)) peak(c) = a
              c += 1
            }
            f += 1
          }
          val rms = sumSq.map(x => if (frames == 0) 0.0 else math.sqrt(x / frames))
          AudioInfo(r.media_id, fmt.getSampleRate.toInt, ch, frames,
            frames * 1000.0 / fmt.getSampleRate, rms, peak, decode_ok = true)
        }
      }
    }
  }

  /** Decode + fixed-size feature extraction, batched per partition (the
    * mapInPandas shape: one iterator in, one iterator out, no per-row
    * overhead). Features are a `featureDim`-bin byte-histogram projection
    * of the DECODED signal — real luma pixels for `javax.imageio` images,
    * real 16-bit PCM bytes for `javax.sound.sampled` audio, real
    * first-decodable-frame pixels for RIFF-AVI video (MJPEG), and the
    * clearly-marked [[decodeStub]] only for payloads no decode path
    * accepts — INCLUDING images the `maxPixels` decompression-bomb bound
    * rejected. Every row carries [[MediaFeatures.source]] naming its
    * path, so stub-derived features are always identifiable downstream.
    * Deterministic throughout — swap the histogram for a real model
    * embedding. */
  def extractFeatures(media: Dataset[MediaRow], featureDim: Int = 32,
      maxPixels: Long = DefaultMaxPixels): Dataset[MediaFeatures] = {
    import media.sparkSession.implicits._
    media.mapPartitions { it =>
      it.map { row =>
        val img = readBounded(row.media, maxPixels)
        val (decoded, source): (Array[Byte], String) =
          if (img != null) (lumaBytes(img), "image")
          else {
            val audio = readAudioPcm(row.media)
            if (audio != null) (audio._2, "audio")
            else {
              // video: the first decodable sampled frame stands in for
              // the clip (same bounded decode as the image path)
              val frame =
                if (!looksLikeAvi(row.media)) None
                else aviVideoChunks(row.media).iterator.map { case (off, len) =>
                  readBounded(java.util.Arrays.copyOfRange(row.media, off, off + len), maxPixels)
                }.find(_ != null)
              frame match {
                case Some(f) => (lumaBytes(f), "video")
                case None => (decodeStub(row.media,
                  math.max(64, if (row.media == null) 0 else row.media.length)), "stub")
              }
            }
          }
        val hist = new Array[Float](featureDim)
        var i = 0
        while (i < decoded.length) { hist((decoded(i) & 0xff) % featureDim) += 1f; i += 1 }
        val n = math.max(decoded.length, 1).toFloat
        MediaFeatures(row.media_id,
          if (row.media == null) 0 else row.media.length,
          hist.map(_ / n), source)
      }
    }
  }

  final case class ImageInfo(media_id: Long, width: Int, height: Int,
      mean_r: Double, mean_g: Double, mean_b: Double, decode_ok: Boolean)

  /** Decode an image ONLY after checking its declared dimensions from the
    * header: a decompression bomb (a tiny payload declaring 50000×50000)
    * would otherwise allocate a multi-GB raster and kill the task with an
    * OutOfMemoryError — an Error, which no `catch Exception` sees and
    * task retries repeat. Header reads cost bytes, not pixels. Returns
    * null for undecodable OR over-limit payloads. */
  private def readBounded(bytes: Array[Byte], maxPixels: Long): java.awt.image.BufferedImage =
    try {
      val iis = javax.imageio.ImageIO.createImageInputStream(
        new java.io.ByteArrayInputStream(bytes))
      if (iis == null) null
      else try { // iis is temp-file/FD-backed (ImageIO cache): close on EVERY
                 // path — the no-reader-matches case is the COMMON corrupt-
                 // payload case, and leaking one FD per corrupt image fills
                 // /tmp and the FD table on a long-lived executor
        val readers = javax.imageio.ImageIO.getImageReaders(iis)
        if (!readers.hasNext) null
        else {
          val reader = readers.next()
          try {
            reader.setInput(iis)
            val w = reader.getWidth(0).toLong
            val h = reader.getHeight(0).toLong
            if (w <= 0 || h <= 0 || w * h > maxPixels) null
            else reader.read(0)
          } finally reader.dispose()
        }
      } finally iis.close()
    } catch { case _: Exception => null }

  /** Default decode bound: 16 Mpixel (4096×4096). Peak live memory per
    * decode is ~2× the raster — the BufferedImage plus the bulk-`getRGB`
    * int[] copy — so 16 Mpixel ≈ 64 + 64 MB per task; with 32 concurrent
    * tasks the worst-case wave stays ~4 GB, inside the default 8 g heap.
    * Raise per job when the corpus genuinely carries larger images. */
  val DefaultMaxPixels: Long = 16L * 1024 * 1024

  /** REAL image decode via `javax.imageio` (JDK built-in — PNG/JPEG/BMP/
    * GIF), batched per partition like every codec stage. Emits dimensions
    * and per-channel means; undecodable, over-`maxPixels` (decompression
    * bombs — see [[readBounded]]) or corrupt payloads yield an explicit
    * `decode_ok = false` row rather than null (at web scale a fraction of
    * every crawl is corrupt — dropped rows misreport counts, null means
    * poison averages silently). Pixels are read with one bulk `getRGB`
    * per image, not per-pixel calls. */
  def decodeImages(media: Dataset[MediaRow],
      maxPixels: Long = DefaultMaxPixels): Dataset[ImageInfo] = {
    import media.sparkSession.implicits._
    media.mapPartitions { it =>
      it.map { r =>
        val img = readBounded(r.media, maxPixels)
        if (img == null) ImageInfo(r.media_id, -1, -1, 0.0, 0.0, 0.0, decode_ok = false)
        else {
          val w = img.getWidth; val h = img.getHeight
          val px = img.getRGB(0, 0, w, h, null, 0, w)
          var sr = 0L; var sg = 0L; var sb = 0L; var i = 0
          while (i < px.length) {
            val p = px(i)
            sr += (p >> 16) & 0xff; sg += (p >> 8) & 0xff; sb += p & 0xff
            i += 1
          }
          val n = w.toLong * h
          ImageInfo(r.media_id, w, h, sr.toDouble / n, sg.toDouble / n, sb.toDouble / n,
            decode_ok = true)
        }
      }
    }
  }

  /** REAL image resize: bilinear `Graphics2D` scale, re-encoded as PNG —
    * the canonical pre-training normalization step. Undecodable payloads
    * pass through unchanged (the [[decodeImages]] flag identifies them);
    * decoded rows carry the new dimensions and `image/png` format. */
  def resizeImages(media: Dataset[MediaRow], w: Int, h: Int,
      maxPixels: Long = DefaultMaxPixels): Dataset[MediaRow] = {
    require(w > 0 && h > 0, s"resize target must be positive, got ${w}x$h")
    import media.sparkSession.implicits._
    media.mapPartitions { it =>
      it.map { r =>
        val img = readBounded(r.media, maxPixels)
        if (img == null) r
        else {
          val out = new java.awt.image.BufferedImage(w, h,
            java.awt.image.BufferedImage.TYPE_INT_RGB)
          val g = out.createGraphics()
          g.setRenderingHint(java.awt.RenderingHints.KEY_INTERPOLATION,
            java.awt.RenderingHints.VALUE_INTERPOLATION_BILINEAR)
          g.drawImage(img, 0, 0, w, h, null)
          g.dispose()
          val bos = new java.io.ByteArrayOutputStream()
          javax.imageio.ImageIO.write(out, "png", bos)
          r.copy(media = bos.toByteArray, format = "image/png", width = w, height = h)
        }
      }
    }
  }

  /** "Resize": decode at a target resolution — payload-proportional stub. */
  def resize(media: Dataset[MediaRow], w: Int, h: Int): Dataset[MediaRow] = {
    import media.sparkSession.implicits._
    media.mapPartitions(_.map(r =>
      r.copy(media = decodeStub(r.media, w * h), width = w, height = h)))
  }

  /** Frame sampling: every `stride`-th video frame.
    *
    * REAL for RIFF-AVI payloads (JDK-only container parse, no new deps):
    * the 'movi' list's video-stream chunks ARE the frames, so for MJPEG
    * each emitted `frame` is a complete JPEG image that the REAL image
    * stages decode downstream ([[decodeImages]] / [[extractFeatures]] /
    * [[resizeImages]] over a frames-as-media view). Truncated or
    * size-corrupt containers yield the frames before the damage — never
    * an exception. Non-AVI payloads keep the previous deterministic
    * every-`frameBytes`-chunk stub shape (`frameBytes` applies only
    * there; `frameBytes <= 0` — the AVI-only calling convention — emits
    * NO frames for a non-AVI payload instead of crashing the job on
    * `grouped(0)`, so a mixed media table degrades per row, the
    * decode-stage contract). Narrow flatMap either way: the payload
    * never shuffles. */
  def sampleFrames(media: Dataset[MediaRow], frameBytes: Int, stride: Int): Dataset[Frame] = {
    import media.sparkSession.implicits._
    media.flatMap { r =>
      if (r.media == null) Iterator.empty
      else if (looksLikeAvi(r.media))
        aviVideoChunks(r.media).zipWithIndex.collect {
          case ((off, len), i) if i % stride == 0 =>
            Frame(r.media_id, i, java.util.Arrays.copyOfRange(r.media, off, off + len))
        }
      else if (frameBytes <= 0) Iterator.empty
      else r.media.grouped(frameBytes).zipWithIndex
        .collect { case (chunk, i) if i % stride == 0 => Frame(r.media_id, i, chunk) }
    }
  }

  final case class MediaHash(media_id: Long, phash: Long, source: String)

  /** Perceptual average-hash (aHash, the classic 64-bit image
    * fingerprint): decode, downsample the luma raster to an 8×8 block
    * grid, set bit (by·8 + bx) when the block's mean exceeds the global
    * mean. Robust to resizing/recompression — near-identical images land
    * within a few Hamming bits, which is what [[nearDuplicateMedia]]
    * exploits. Payloads with no real decode path hash the deterministic
    * [[decodeStub]] samples instead (source = "stub", the
    * [[MediaFeatures]] honesty flag): stub hashes still dedup EXACT
    * binary copies (same payload ⇒ same hash) without pretending
    * perceptual similarity. Per-partition imperative decode like every
    * codec stage — narrow, no shuffle. */
  def perceptualHash(media: Dataset[MediaRow],
      maxPixels: Long = DefaultMaxPixels): Dataset[MediaHash] = {
    import media.sparkSession.implicits._
    media.mapPartitions { it =>
      it.map { r =>
        val img = if (r.media == null) null else readBounded(r.media, maxPixels)
        if (img != null) {
          val w = img.getWidth; val h = img.getHeight
          val luma = lumaBytes(img)
          val blocks = new Array[Double](64)
          var by = 0
          while (by < 8) {
            var bx = 0
            while (bx < 8) {
              val x0 = bx * w / 8; val x1 = math.max(x0 + 1, (bx + 1) * w / 8)
              val y0 = by * h / 8; val y1 = math.max(y0 + 1, (by + 1) * h / 8)
              var s = 0L; var n = 0
              var y = y0
              while (y < y1 && y < h) {
                var x = x0
                while (x < x1 && x < w) { s += luma(y * w + x) & 0xff; n += 1; x += 1 }
                y += 1
              }
              blocks(by * 8 + bx) = if (n == 0) 0.0 else s.toDouble / n
              bx += 1
            }
            by += 1
          }
          val mean = blocks.sum / 64
          var bits = 0L
          var i = 0
          while (i < 64) { if (blocks(i) > mean) bits |= (1L << i); i += 1 }
          MediaHash(r.media_id, bits, "image")
        } else stubHashRow(r)
      }
    }
  }

  /** Stub fingerprint: FNV-1a over the WHOLE payload (the [[decodeStub]]
    * samples touch only the first outLen bytes — two near-dup payloads
    * sharing a 64-byte prefix would collide, turning "exact binary copy"
    * into "shared prefix"). Distinct payloads land ~32 Hamming bits
    * apart — far outside any dedup bound — so the stub path still dedups
    * EXACT copies without pretending perceptual similarity. */
  private def stubHashRow(r: MediaRow): MediaHash = {
    val bytes = if (r.media == null) Array.empty[Byte] else r.media
    var hsh = 0xcbf29ce484222325L
    var i = 0
    while (i < bytes.length) {
      hsh = (hsh ^ (bytes(i) & 0xffL)) * 0x100000001b3L
      i += 1
    }
    MediaHash(r.media_id, hsh, "stub")
  }

  /** 64-bit audio fingerprint — the audio analogue of [[perceptualHash]]:
    * REAL decode via `javax.sound.sampled` (WAV/AIFF/AU), mono-mixdown
    * energy over 65 equal windows, bit w set iff energy RISES from window
    * w to w+1. Sign-of-energy-delta is the classic volume-invariant audio
    * hash: scaling amplitude multiplies every window energy by the same
    * factor and flips no sign (short of clipping), while a different
    * loudness CONTOUR — the thing that identifies a recording — flips
    * many. Exact ties count as "not rising" (deterministic, digital
    * silence hashes to 0). Payloads no audio path decodes — or too short
    * for 65 windows (< 130 frames) — fall back to the whole-payload FNV
    * stub ([[stubHashRow]]), flagged `source = "stub"`. Per-partition
    * imperative decode like every codec stage — narrow, no shuffle. */
  def audioFingerprint(media: Dataset[MediaRow]): Dataset[MediaHash] = {
    import media.sparkSession.implicits._
    media.mapPartitions { it =>
      it.map { r =>
        val dec = if (r.media == null) null else readAudioPcm(r.media)
        if (dec == null) stubHashRow(r)
        else {
          val (fmt, data) = dec
          val ch = fmt.getChannels
          val frames = data.length / (ch * 2)
          val wins = 65
          if (frames < 2 * wins) stubHashRow(r)
          else {
            val e = new Array[Double](wins)
            var w = 0
            while (w < wins) {
              val f0 = (w.toLong * frames / wins).toInt
              val f1 = ((w + 1).toLong * frames / wins).toInt
              var s = 0.0; var f = f0
              while (f < f1) {
                var c = 0; var m = 0.0
                while (c < ch) {
                  val i = (f * ch + c) * 2
                  m += ((data(i + 1) << 8) | (data(i) & 0xff)).toShort / 32768.0
                  c += 1
                }
                val avg = m / ch
                s += avg * avg
                f += 1
              }
              // mean-square, not sum: window frame counts differ by ±1
              // from the integer split, and a sum would flip boundary
              // signs on otherwise-identical envelopes
              e(w) = if (f1 > f0) s / (f1 - f0) else 0.0
              w += 1
            }
            var bits = 0L; var i = 0
            while (i < 64) { if (e(i + 1) > e(i)) bits |= (1L << i); i += 1 }
            MediaHash(r.media_id, bits, "audio")
          }
        }
      }
    }
  }

  /** Near-duplicate AUDIO pairs by fingerprint Hamming distance — the
    * audio member of the media-dedup family, same banded pigeonhole
    * join as [[nearDuplicateMedia]] over [[audioFingerprint]] instead of
    * the image aHash. Returns (media_a, media_b, hamming), a < b. */
  def nearDuplicateAudio(media: Dataset[MediaRow], maxHamming: Int = 3): DataFrame = {
    require(maxHamming >= 0 && maxHamming <= 15,
      s"nearDuplicateAudio: maxHamming must be in [0, 15], got $maxHamming")
    bandedHammingPairs(
      audioFingerprint(media).toDF().select(col("media_id"), col("phash")),
      maxHamming)
  }

  /** Near-duplicate media pairs by perceptual-hash Hamming distance ≤
    * `maxHamming` — the image-dedup stage of a multimodal pipeline.
    * Banded exactly like the SimHash text tier: the 64-bit hash splits
    * into `maxHamming + 1` bands, and any pair within the bound shares
    * ≥ 1 intact band (pigeonhole), so candidates come from band-keyed
    * joins — NEVER an all-pairs scan — and a popcount(xor) verify
    * keeps true positives only. Returns (media_a, media_b, hamming),
    * a < b. Scale: candidate volume is Σ band-bucket², the d2
    * discipline. */
  def nearDuplicateMedia(media: Dataset[MediaRow], maxHamming: Int = 3,
      maxPixels: Long = DefaultMaxPixels): DataFrame = {
    require(maxHamming >= 0 && maxHamming <= 15,
      s"nearDuplicateMedia: maxHamming must be in [0, 15], got $maxHamming")
    bandedHammingPairs(
      perceptualHash(media, maxPixels).toDF().select(col("media_id"), col("phash")),
      maxHamming)
  }

  /** Shared banded-Hamming pair join over a (media_id, phash LONG)
    * fingerprint table — the [[nearDuplicateMedia]]/[[nearDuplicateAudio]]
    * common core (one implementation so the modalities can never drift on
    * the pigeonhole rule). */
  private def bandedHammingPairs(hashes: DataFrame, maxHamming: Int): DataFrame = {
    val nBands = maxHamming + 1
    val width = 64 / nBands
    val h = hashes.localCheckpoint(true)
    val banded = h.select(col("media_id"), col("phash"),
      explode(array((0 until nBands).map(b =>
        struct(lit(b).as("band"),
          shiftrightunsigned(col("phash"), b * width)
            .bitwiseAND(lit((1L << width) - 1)).as("key"))): _*)).as("bk"))
      .select(col("media_id"), col("phash"), col("bk.band"), col("bk.key"))
    val a = banded.toDF("media_a", "ha", "band", "key")
    val b = banded.toDF("media_b", "hb", "band", "key")
    a.join(b, Seq("band", "key"))
      .filter(col("media_a") < col("media_b"))
      .select(col("media_a"), col("media_b"),
        bit_count(col("ha").bitwiseXOR(col("hb"))).as("hamming"))
      .distinct()
      .filter(col("hamming") <= maxHamming)
  }

  /** Cross-modal document-level dedup decision — the real multimodal
    * pipeline op: a page is a DUPLICATE iff EITHER modality matches an
    * earlier document (smaller id, the deterministic first-occurrence-
    * wins rule) — its text exactly, or its media payload perceptually
    * (phash Hamming ≤ `maxHamming`). Returns one row per document:
    * (idCol, dup_text, dup_media, keep) with 0/1 LONG flags
    * (`keep = 1` iff neither modality matched earlier).
    *
    * Scale shape, per modality:
    *  - TEXT: exact dedup by md5 — the shuffle carries (hash, id), never
    *    the text; min(id) per hash group is the keeper.
    *  - MEDIA: phash EQUALITY FAMILIES collapse first (a viral exact-copy
    *    family is ONE distinct hash with its min id), then the banded
    *    Hamming join ([[nearDuplicateMedia]]'s pigeonhole bands) runs
    *    over DISTINCT hashes only — the family-size² pair blowup of the
    *    pair-emitting tier never happens, and the cross-hash matches
    *    aggregate straight to min(first_id) per hash (groupBy-min absorbs
    *    multi-band candidate duplicates, so no distinct() exchange).
    * The per-doc decision is then two broadcast-size joins on the
    * collapsed tables. "Earlier document" (not "earlier keeper"): within
    * equality families the two coincide; across genuinely perceptual
    * chains this is the standard streaming-dedup convention (a doc is
    * dropped if ANY earlier doc matches, whether or not that doc was
    * itself kept). */
  def crossModalDedup(docs: DataFrame, media: Dataset[MediaRow],
      idCol: String = "doc_id", textCol: String = "text",
      maxHamming: Int = 3, maxPixels: Long = DefaultMaxPixels): DataFrame = {
    require(maxHamming >= 0 && maxHamming <= 15,
      s"crossModalDedup: maxHamming must be in [0, 15], got $maxHamming")
    // text keeper per exact-text family (null text = the empty-string
    // family, matching the oracle's coalesce convention)
    val tmin = docs
      .select(col(idCol).as("tid"), md5(coalesce(col(textCol), lit(""))).as("th"))
      .groupBy(col("th")).agg(min(col("tid")).as("tkeeper"))
    // media: hash → collapse equality families → banded join over
    // DISTINCT hashes → earliest cross-hash match per hash
    val h = perceptualHash(media, maxPixels).toDF()
      .select(col("media_id"), col("phash")).localCheckpoint(true)
    val fams = h.groupBy(col("phash")).agg(min(col("media_id")).as("first_id"))
      .localCheckpoint(true) // referenced by both banded sides + the decision join
    val nBands = maxHamming + 1
    val width = 64 / nBands
    def banded(p: String, f: String) = fams.select(col("phash").as(p),
      col("first_id").as(f),
      explode(array((0 until nBands).map(b =>
        struct(lit(b).as("band"),
          shiftrightunsigned(col("phash"), b * width)
            .bitwiseAND(lit((1L << width) - 1)).as("key"))): _*)).as("bk"))
      .select(col(p), col(f), col("bk.band"), col("bk.key"))
    val xmin = banded("pa", "fa").join(banded("pb", "fb"), Seq("band", "key"))
      .filter(col("pa") =!= col("pb") &&
        bit_count(col("pa").bitwiseXOR(col("pb"))) <= maxHamming)
      .groupBy(col("pa")).agg(min(col("fb")).as("xmin"))
    // one decision row per id (ADVICE r16): a document with SEVERAL media
    // rows (or duplicate media_ids) would otherwise multiply the final
    // per-doc join — a page is a media-dup iff ANY of its payloads
    // matches an earlier document, so max() over the per-payload flags
    // is the aggregate with that meaning
    val mDecision = h.join(fams, Seq("phash"))
      .join(xmin, h("phash") === xmin("pa"), "left")
      .select(col("media_id").as(idCol),
        (least(col("first_id"), coalesce(col("xmin"), lit(Long.MaxValue)))
          < col("media_id")).as("mdup"))
      .groupBy(col(idCol)).agg(max(col("mdup")).as("mdup"))
    docs.select(col(idCol), md5(coalesce(col(textCol), lit(""))).as("th"))
      .join(tmin, Seq("th"))
      .join(mDecision, Seq(idCol), "left")
      .select(col(idCol),
        (col("tkeeper") < col(idCol)).cast("long").as("dup_text"),
        coalesce(col("mdup"), lit(false)).cast("long").as("dup_media"),
        (col("tkeeper") >= col(idCol) && !coalesce(col("mdup"), lit(false)))
          .cast("long").as("keep"))
  }

  /** Flatten the nested meta struct into a typed Dataset for the batch ops. */
  def typed(df: DataFrame): Dataset[MediaRow] = {
    import df.sparkSession.implicits._
    df.select(col("media_id"), col("media"), col("meta.format").as("format"),
      col("meta.width").as("width"), col("meta.height").as("height"),
      col("meta.duration_ms").as("duration_ms")).as[MediaRow]
  }
}
