package graft.operators

import org.apache.spark.sql.DataFrame
import org.apache.spark.sql.functions._

/** One input media item: opaque payload bytes + typed metadata. */
case class MediaRow(doc_id: Long, modality: String, payload: Array[Byte], source: String)

/** Extracted features for one media item. */
case class MediaFeatures(doc_id: Long, modality: String, source: String,
                         byte_len: Int, header_hex: String,
                         width: Int, height: Int, feat: Array[Float])

/** A media item after aspect-preserving resize planning. */
case class ResizedMedia(doc_id: Long, width: Int, height: Int,
                        out_w: Int, out_h: Int, scale: Float,
                        feat: Array[Float])

/** Multimodal column handling: image/audio/video as opaque `binary` columns
  * with typed metadata, decoded/feature-extracted per partition.
  *
  * The Spark-side plumbing is real — schema, encoders, partition-wise batch
  * processing via `mapPartitions` (the Scala analogue of `mapInPandas`:
  * per-partition batch iteration, decoder state initialized once per
  * partition, never per row). IMAGE payloads (PNG/JPEG/BMP/GIF by magic
  * bytes) decode for REAL via `javax.imageio` — in the JDK, zero added
  * dependencies — yielding true pixel dimensions and a luminance-histogram
  * feature. Non-image payloads (audio/video: no codec libraries in this
  * container) fall to a deterministic stub with the same output shape —
  * swap it for an ffmpeg binding in production; nothing else changes.
  */
object Multimodal {

  /** Magic-byte sniff: only payloads that LOOK like a supported image
    * format reach ImageIO — on a corpus of mostly-text payloads the
    * decoder is never even consulted, so the real-decode path costs the
    * stub path nothing. */
  private def looksLikeImage(p: Array[Byte]): Boolean =
    p.length >= 4 && (
      (p(0) == 0x89.toByte && p(1) == 0x50 && p(2) == 0x4e && p(3) == 0x47) || // PNG
      (p(0) == 0xff.toByte && p(1) == 0xd8.toByte) ||                          // JPEG
      (p(0) == 0x42 && p(1) == 0x4d) ||                                        // BMP
      (p(0) == 0x47 && p(1) == 0x49 && p(2) == 0x46))                          // GIF

  /** RIFF/WAVE sniff: `RIFF....WAVE` — the only audio container the JDK
    * can decode without external codecs (`javax.sound.sampled` handles
    * PCM/a-law/u-law WAV out of the box). */
  private def looksLikeWav(p: Array[Byte]): Boolean =
    p.length >= 12 &&
      p(0) == 0x52 && p(1) == 0x49 && p(2) == 0x46 && p(3) == 0x46 &&          // RIFF
      p(8) == 0x57 && p(9) == 0x41 && p(10) == 0x56 && p(11) == 0x45          // WAVE

  /** Real WAV decode (`javax.sound.sampled`, zero added dependencies):
    * returns (sampleRate, channels, feat) in the shared (w, h, feat)
    * slot so audio rows flow through the same schema as images —
    * `width` carries the sample rate in Hz, `height` the channel count.
    * feat = [duration_sec, rms, peak, zero_cross_rate, rms_q1..rms_q4]
    * (per-quarter RMS gives a crude envelope), all computed from the
    * REAL PCM samples normalized to [-1, 1]. None when the bytes are
    * not a decodable WAV — those rows take the deterministic stub. */
  private[operators] def decodeWav(payload: Array[Byte]): Option[(Int, Int, Array[Float])] =
    try {
      val in = javax.sound.sampled.AudioSystem.getAudioInputStream(
        new java.io.ByteArrayInputStream(payload))
      try {
        val fmt = in.getFormat
        val channels = fmt.getChannels
        val sampleRate = math.round(fmt.getSampleRate)
        val bytesPerSample = math.max(1, fmt.getSampleSizeInBits / 8)
        val frames = in.getFrameLength
        if (channels <= 0 || sampleRate <= 0 || frames <= 0 ||
            frames > 64L * 1024 * 1024) None  // same bounded-per-row stance as images
        else {
          val durationSec = frames.toFloat / fmt.getSampleRate
          // Read the full PCM body (bounded above) and fold each frame to
          // a mono sample in [-1, 1], consumed by ONE fused stats pass —
          // the running `prev` is all the cross-sample state zcr needs, so
          // no decoded-signal array materializes (a 64M-frame 8-bit WAV
          // would otherwise buffer 512 MB of doubles per row, double the
          // image path's documented per-row ceiling). Only integer PCM is
          // handled sample-wise; other encodings keep the header facts
          // but zero the envelope.
          val body = in.readAllBytes()
          val isPcm = fmt.getEncoding == javax.sound.sampled.AudioFormat.Encoding.PCM_SIGNED ||
                      fmt.getEncoding == javax.sound.sampled.AudioFormat.Encoding.PCM_UNSIGNED
          val n = if (isPcm) body.length / (bytesPerSample * channels) else 0
          val full = (1L << (bytesPerSample * 8 - 1)).toDouble
          var sumSq = 0.0; var peak = 0.0; var crossings = 0L
          var prev = 0.0
          val qSumSq = new Array[Double](4)
          var i = 0
          while (i < n) {
            var c = 0
            var acc = 0.0
            while (c < channels) {
              val off = (i * channels + c) * bytesPerSample
              // WAV integer PCM: little-endian; 8-bit is unsigned, wider is signed
              var v = 0L
              var b = 0
              while (b < bytesPerSample) { v |= (body(off + b) & 0xffL) << (8 * b); b += 1 }
              val signed =
                if (bytesPerSample == 1) (v & 0xff) - 128
                else { val shift = 64 - bytesPerSample * 8; (v << shift) >> shift }
              acc += signed / full
              c += 1
            }
            val s = acc / channels
            sumSq += s * s
            if (math.abs(s) > peak) peak = math.abs(s)
            if (i > 0 && (s >= 0) != (prev >= 0)) crossings += 1
            qSumSq(math.min(3, i * 4 / math.max(n, 1))) += s * s
            prev = s
            i += 1
          }
          val rms = if (n > 0) math.sqrt(sumSq / n) else 0.0
          val zcr = if (n > 1) crossings.toDouble / (n - 1) else 0.0
          val qn = math.max(n / 4, 1)
          Some((sampleRate, channels, Array(
            durationSec, rms.toFloat, peak.toFloat, zcr.toFloat,
            math.sqrt(qSumSq(0) / qn).toFloat, math.sqrt(qSumSq(1) / qn).toFloat,
            math.sqrt(qSumSq(2) / qn).toFloat, math.sqrt(qSumSq(3) / qn).toFloat)))
        }
      } finally in.close()
    } catch { case _: Exception => None }

  /** Hard ceiling on DECLARED pixel count before any pixel allocates:
    * ImageIO.read materializes the full BufferedImage, so a corrupt or
    * adversarial header declaring 60000×60000 would OOM the task (an
    * Error, which no fallback catch can make safe). 64 MP ≈ 256 MB ARGB —
    * large, but bounded per row. */
  private val MaxDecodePixels = 64L * 1024 * 1024

  /** Real image decode (javax.imageio): true pixel dimensions + an 8-bin
    * LUMINANCE histogram, L1-normalized — same (w, h, feat) shape as the
    * stub so both paths share one schema. The reader parses the HEADER
    * first (no pixel allocation) and refuses declared sizes past
    * [[MaxDecodePixels]]; histogram sampling then strides so even a
    * max-size image costs ≤ ~64k luminance reads. None when ImageIO
    * cannot decode the bytes (truncated/corrupt/oversized file) — those
    * rows take the deterministic stub. */
  private[operators] def decodeImage(payload: Array[Byte]): Option[(Int, Int, Array[Float])] =
    try {
      // MemoryCacheImageInputStream, NOT ImageIO.createImageInputStream:
      // the factory defaults to a FileCacheImageInputStream, which writes
      // every payload to a temp file before decoding — a per-row disk
      // write in the hot path that turns a CPU-bound decode into an
      // IO-bound one under disk contention. The payload is already fully
      // in memory, so the memory-backed stream is strictly better here.
      val iis = new javax.imageio.stream.MemoryCacheImageInputStream(
        new java.io.ByteArrayInputStream(payload))
      val readers = javax.imageio.ImageIO.getImageReaders(iis)
      val img: java.awt.image.BufferedImage =
        if (!readers.hasNext) { iis.close(); null }
        else {
          val reader = readers.next()
          try {
            reader.setInput(iis)
            // header-only probe — width/height parse, no pixel allocation
            val (dw, dh) = (reader.getWidth(0).toLong, reader.getHeight(0).toLong)
            if (dw <= 0 || dh <= 0 || dw * dh > MaxDecodePixels) null
            else reader.read(0)
          } finally { reader.dispose(); iis.close() }
        }
      if (img == null) None
      else {
        val (w, h) = (img.getWidth, img.getHeight)
        val stride = math.max(1, math.toIntExact(
          math.round(math.sqrt(w.toLong * h / 65536.0))))
        val hist = new Array[Float](8)
        var n = 0L
        var y = 0
        while (y < h) {
          var x = 0
          while (x < w) {
            val rgb = img.getRGB(x, y)
            val lum = (((rgb >> 16) & 0xff) * 299 + ((rgb >> 8) & 0xff) * 587 +
              (rgb & 0xff) * 114) / 1000
            hist(lum / 32) += 1f
            n += 1; x += stride
          }
          y += stride
        }
        Some((w, h, hist.map(_ / math.max(n, 1L))))
      }
    } catch { case _: Exception => None }

  /** STUB decoder: deterministic pseudo-features from the raw bytes.
    * The fallback for modalities with no in-container codec (audio/video)
    * and for undecodable image bytes. */
  private def decodeStub(payload: Array[Byte]): (Int, Int, Array[Float]) = {
    val width = 64 + (payload.length % 512)
    // long accumulation + floorMod: an Int sum overflows past ~16 MB of
    // payload and a signed % would push height below the 64 floor
    val byteSum = payload.foldLeft(0L)((acc, b) => acc + (b & 0xff))
    val height = 64 + java.lang.Math.floorMod(byteSum, 512L).toInt
    // 8-bin byte histogram, L1-normalized — a stand-in embedding.
    val hist = new Array[Float](8)
    payload.foreach(b => hist((b & 0xff) / 32) += 1f)
    val n = math.max(payload.length, 1).toFloat
    (width, height, hist.map(_ / n))
  }

  /** Aspect-preserving resize over extracted media: fit (width, height)
    * into a target box, emit output dims + scale factor, and pass the
    * feature vector through unchanged. The geometry math is the real
    * pipeline logic; the pixel resampling itself belongs to the decoder
    * stub (no codec libs in this container). */
  def resizeTo(features: DataFrame, maxW: Int = 224, maxH: Int = 224): DataFrame = {
    val spark = features.sparkSession
    import spark.implicits._
    features.select(col("doc_id"), col("width"), col("height"), col("feat"))
      .as[(Long, Int, Int, Array[Float])]
      .map { case (id, w, h, feat) =>
        val scale = math.min(1.0f,
          math.min(maxW.toFloat / w, maxH.toFloat / h))
        ResizedMedia(id, w, h,
          math.max(1, math.round(w * scale)), math.max(1, math.round(h * scale)),
          scale, feat)
      }
      .toDF()
      .orderBy("doc_id")
  }

  /** Frame sampling over a binary payload (the video/audio pattern: take
    * every `stride`-th fixed-size block). Pure declarative plumbing —
    * sequence + transform + binary substring, so it stays in codegen and
    * needs no decoder; a real codec would replace the block slicing inside
    * the same schema. */
  def sampleFrames(documents: DataFrame, frameLen: Int = 64,
                   stride: Int = 128, maxFrames: Int = 8): DataFrame = {
    val payload = col("text").cast("binary")
    val nFrames = least(
      floor((length(payload) - frameLen).cast("double") / stride).cast("long") + 1L,
      lit(maxFrames.toLong))
    documents
      .select(col("doc_id"), payload.as("payload"), nFrames.as("n"))
      .filter(col("n") > 0)
      .select(col("doc_id"),
        posexplode(transform(sequence(lit(0L), col("n") - 1L), i =>
          col("payload").substr(i.cast("int") * stride + 1, lit(frameLen))))
          .as(Seq("frame_idx", "frame")))
      .select(col("doc_id"), col("frame_idx"),
              length(col("frame")).as("frame_len"),
              md5(col("frame")).as("frame_md5"))
      .orderBy("doc_id", "frame_idx")
  }

  /** Binary-column feature extraction pipeline. The `documents` text is cast
    * to binary as the stand-in payload (container has no media files); the
    * pipeline — typed rows in, batch decode per partition, typed features
    * out — is exactly what a real image/audio corpus needs. */
  def extractFeatures(documents: DataFrame): DataFrame =
    extractFeaturesBinary(documents
      .select(col("doc_id"), lit("image").as("modality"),
              col("text").cast("binary").as("payload"), col("source")),
      // Text-cast payloads are NOT media: force the stub so a pathological
      // document whose UTF-8 bytes happen to parse as an image (the magic
      // prefixes 'BM', 'GIF8', … are printable ASCII) can't silently
      // diverge from the stub-arithmetic oracle. Real decode is reserved
      // for genuinely binary corpora via [[extractFeaturesBinary]].
      decodeReal = false)

  /** The same pipeline over an ALREADY-binary media frame
    * (doc_id, modality, payload, source) — the production entry point for
    * a real media corpus, where payloads never round-trip through a
    * string column. Recognized image payloads decode via [[decodeImage]]
    * (real pixels), WAV audio via [[decodeWav]] (real PCM); everything
    * else takes the deterministic stub. Pass `decodeReal = false` to pin
    * every row to the stub (deterministic oracle-friendly arithmetic). */
  def extractFeaturesBinary(media: DataFrame, decodeReal: Boolean = true): DataFrame = {
    val spark = media.sparkSession
    import spark.implicits._
    media
      .as[MediaRow]
      .mapPartitions { rows =>
        // Per-partition init point for a real decoder/codec context.
        rows.map { m =>
          val (w, h, feat) =
            (if (!decodeReal) None
             else if (looksLikeImage(m.payload)) decodeImage(m.payload)
             else if (looksLikeWav(m.payload)) decodeWav(m.payload)
             else None)
              .getOrElse(decodeStub(m.payload))
          val header = m.payload.take(4).map(b => f"${b & 0xff}%02x").mkString
          MediaFeatures(m.doc_id, m.modality, m.source,
            m.payload.length, header, w, h, feat)
        }
      }
      .toDF()
      .orderBy("doc_id")
  }
}
