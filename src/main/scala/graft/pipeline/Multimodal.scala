package graft.pipeline

import org.apache.spark.sql.{DataFrame, Dataset, SparkSession}
import org.apache.spark.sql.functions._

/**
 * Multimodal columns for training-data pipelines: image/audio/video as
 * opaque `binary` payloads plus typed metadata, with decode /
 * feature-extract / resize / frame-sample transforms.
 *
 * The Spark-side plumbing — schemas, typed Datasets, mapPartitions
 * batching (the JVM analogue of `mapInPandas`: one iterator per
 * partition, amortized per-batch setup), partitioning behavior — is
 * real, and so are the IMAGE and AUDIO codecs: [[ImageCodec]] decodes
 * PNG/JPEG/BMP/GIF through the JDK's `javax.imageio` (true
 * width/height/channels, mean intensity, grid-thumbnail embedding);
 * [[AudioCodec]] decodes WAV/AIFF PCM through `javax.sound.sampled`
 * (true sample rate/channels/duration, RMS, loudness envelope) — no
 * external libraries in either. Payloads the JDK cannot decode
 * (video, compressed codecs, non-media bytes) fall back to
 * [[StubCodec]]'s deterministic byte-derived surrogates so the
 * dataflow contracts hold for every modality.
 *
 * Scale notes: payloads never participate in shuffles here — all
 * transforms are map-side (mapPartitions), metadata-only projections
 * stay columnar, and frame sampling explodes AFTER the per-row decode
 * so the shuffle (if any downstream) moves frames, not videos.
 */
object Multimodal {

  /** One media row: opaque payload + typed metadata. */
  final case class MediaRow(
      media_id: Long,
      kind: String, // image | audio | video
      payload: Array[Byte],
      width: Int, height: Int, channels: Int,
      sample_rate: Int, duration_ms: Int, format: String)

  final case class ImageFeatures(
      media_id: Long, width: Int, height: Int, channels: Int,
      mean_intensity: Double, embedding: Array[Float])

  final case class Frame(
      media_id: Long, frame_idx: Int, ts_ms: Int, payload: Array[Byte])

  final case class AudioFeatures(
      media_id: Long, sample_rate: Int, channels: Int, duration_ms: Int,
      rms: Double, envelope: Array[Float])

  /**
   * Real image codec over the JDK's `javax.imageio` — PNG, JPEG, BMP
   * and GIF decode with zero external dependencies. Executor-safe:
   * everything is per-call local state (ImageIO's reader registry is
   * JVM-global and thread-safe).
   */
  object ImageCodec {

    /** Decode an encoded image; None when the payload is not a
      * decodable image (wrong magic, truncated, or another modality). */
    def decode(payload: Array[Byte]): Option[java.awt.image.BufferedImage] =
      if (payload == null || payload.length < 8) None
      else try Option(javax.imageio.ImageIO.read(
        new java.io.ByteArrayInputStream(payload)))
      catch { case _: Throwable => None }

    /** Color components of the decoded image (3 = RGB, 4 = RGBA, 1 =
      * grayscale). */
    def channels(img: java.awt.image.BufferedImage): Int =
      img.getColorModel.getNumComponents

    /** Grayscale view of the image (one byte per pixel) — the shared
      * base for intensity + grid features. Rendering through a
      * TYPE_BYTE_GRAY raster handles every source color model. */
    private def gray(img: java.awt.image.BufferedImage): java.awt.image.Raster = {
      val g = new java.awt.image.BufferedImage(img.getWidth, img.getHeight,
        java.awt.image.BufferedImage.TYPE_BYTE_GRAY)
      val gr = g.createGraphics()
      try gr.drawImage(img, 0, 0, null) finally gr.dispose()
      g.getRaster
    }

    /** Mean grayscale intensity in [0, 255]. */
    def meanIntensity(img: java.awt.image.BufferedImage): Double = {
      val r = gray(img)
      var s = 0L
      var y = 0
      while (y < img.getHeight) {
        var x = 0
        while (x < img.getWidth) { s += r.getSample(x, y, 0); x += 1 }
        y += 1
      }
      s.toDouble / (img.getWidth.toLong * img.getHeight)
    }

    /**
     * Grid-thumbnail feature vector: the image divided into a g×g grid
     * (g = ⌊√dim⌋), each cell's mean grayscale intensity normalized to
     * [0, 1], row-major; positions past g² pad with the global mean.
     * Deterministic, resolution-independent, and comparable under the
     * engine's cosine/L2 vector operators — the classic pre-neural
     * visual descriptor shape.
     */
    def gridFeatures(img: java.awt.image.BufferedImage, dim: Int): Array[Float] = {
      val g = math.max(1, math.sqrt(dim.toDouble).toInt)
      val r = gray(img)
      val (w, h) = (img.getWidth, img.getHeight)
      val sums = new Array[Long](g * g)
      val counts = new Array[Long](g * g)
      var y = 0
      while (y < h) {
        val cy = math.min(g - 1, y * g / h)
        var x = 0
        while (x < w) {
          val cell = cy * g + math.min(g - 1, x * g / w)
          sums(cell) += r.getSample(x, y, 0)
          counts(cell) += 1
          x += 1
        }
        y += 1
      }
      val cells = Array.tabulate(g * g)(i =>
        if (counts(i) == 0) 0f else (sums(i).toDouble / counts(i) / 255.0).toFloat)
      val global = if (cells.isEmpty) 0f else cells.sum / cells.length
      Array.tabulate(dim)(i => if (i < g * g) cells(i) else global)
    }
  }

  /**
   * Real audio codec over the JDK's `javax.sound.sampled` — WAV/AIFF
   * PCM decode with zero external dependencies. The decoded stream is
   * converted to 16-bit signed PCM, mono-mixed, and normalized to
   * [-1, 1] floats.
   */
  object AudioCodec {

    final case class Decoded(sampleRate: Int, channels: Int,
                             durationMs: Int, samples: Array[Float])

    /** Decode WAV/AIFF PCM; None for anything the JDK cannot read. */
    def decode(payload: Array[Byte]): Option[Decoded] =
      if (payload == null || payload.length < 44) None // < WAV header
      else try {
        val in = javax.sound.sampled.AudioSystem.getAudioInputStream(
          new java.io.ByteArrayInputStream(payload))
        try {
          val src = in.getFormat
          val fmt = new javax.sound.sampled.AudioFormat(
            javax.sound.sampled.AudioFormat.Encoding.PCM_SIGNED,
            src.getSampleRate, 16, src.getChannels,
            src.getChannels * 2, src.getSampleRate, false)
          val pcm = javax.sound.sampled.AudioSystem.getAudioInputStream(fmt, in)
          try {
            val bytes = pcm.readAllBytes()
            val ch = fmt.getChannels
            val nFrames = bytes.length / (2 * ch)
            // mono mix: mean over channels per frame, /32768 → [-1, 1]
            val mono = new Array[Float](nFrames)
            var f = 0
            while (f < nFrames) {
              var s = 0.0f; var c = 0
              while (c < ch) {
                val o = (f * ch + c) * 2
                s += ((bytes(o) & 0xff) | (bytes(o + 1) << 8)).toShort / 32768.0f
                c += 1
              }
              mono(f) = s / ch
              f += 1
            }
            Some(Decoded(src.getSampleRate.toInt, src.getChannels,
              math.round(nFrames * 1000.0 / src.getSampleRate).toInt, mono))
          } finally pcm.close()
        } finally in.close()
      } catch { case _: Throwable => None }

    /** RMS amplitude of the whole clip (0 = silence). */
    def rms(samples: Array[Float]): Double =
      if (samples.isEmpty) 0.0
      else math.sqrt(samples.map(s => s.toDouble * s).sum / samples.length)

    /** Loudness envelope: `dim` equal windows, RMS per window — the
      * audio analogue of the image grid thumbnail (deterministic,
      * duration-independent, comparable under the vector operators). */
    def envelope(samples: Array[Float], dim: Int): Array[Float] = {
      if (samples.isEmpty) return new Array[Float](dim)
      Array.tabulate(dim) { w =>
        val from = (w.toLong * samples.length / dim).toInt
        val until = math.max(from + 1, ((w + 1).toLong * samples.length / dim).toInt)
        var s = 0.0
        var i = from
        while (i < until) { s += samples(i).toDouble * samples(i); i += 1 }
        math.sqrt(s / (until - from)).toFloat
      }
    }
  }

  /**
   * STUB CODEC — deterministic byte-derived surrogates for payloads
   * the JDK cannot decode (video, compressed audio, or non-media test
   * bytes). Everything derives from payload bytes so results are
   * stable across runs, executors and partitionings; the dataflow
   * contracts (schemas, batching, partitioning) are identical to the
   * real paths.
   */
  object StubCodec {
    /** Deterministic surrogate pixels: k-th "pixel" is a byte-mix of
      * payload at stride. */
    def decodePixels(payload: Array[Byte], n: Int): Array[Int] = {
      if (payload.isEmpty) return Array.fill(n)(0)
      Array.tabulate(n) { i =>
        val b = payload((i * 2654435761L % payload.length).toInt.abs)
        java.lang.Byte.toUnsignedInt(b)
      }
    }

    /** Deterministic fake embedding: dim float32 values from a seeded
      * mix of payload bytes (stands in for a vision encoder). */
    def embed(payload: Array[Byte], dim: Int): Array[Float] = {
      var h = 1125899906842597L
      payload.foreach(b => h = h * 31 + b)
      Array.tabulate(dim) { i =>
        val x = h ^ (i.toLong * 0x9E3779B97F4A7C15L)
        val m = (x ^ (x >>> 33)) * 0xFF51AFD7ED558CCDL
        ((m >>> 11).toDouble / (1L << 53).toDouble).toFloat * 2f - 1f
      }
    }
  }

  /** Wrap a text/bytes DataFrame as a media table (test harness for the
    * plumbing; production ingests real files via binaryFile source). */
  def syntheticMedia(df: DataFrame, idCol: String, bytesCol: String,
                     kind: String = "image"): Dataset[MediaRow] = {
    val spark = df.sparkSession
    import spark.implicits._
    df.select(col(idCol).cast("long"), col(bytesCol).cast("binary"))
      .as[(Long, Array[Byte])]
      .map { case (id, payload) =>
        val len = if (payload == null) 0 else payload.length
        MediaRow(id, kind, if (payload == null) Array.emptyByteArray else payload,
          width = 64, height = 48, channels = 3,
          sample_rate = 16000, duration_ms = math.max(1, len / 4), format = "stub")
      }
  }

  /**
   * Image decode + feature extraction. mapPartitions so per-partition
   * setup amortizes across the batch, then stream rows — the exact
   * shape a Pandas-UDF batch pipeline has. A payload that decodes as a
   * real image ([[ImageCodec]], JDK imageio) yields TRUE dimensions,
   * channel count, mean intensity and grid-thumbnail embedding —
   * overriding the row's declared metadata, which ingestion cannot
   * always trust; anything else falls back to [[StubCodec]]'s
   * deterministic surrogates (metadata passed through).
   */
  def imageFeatures(media: Dataset[MediaRow], dim: Int = 16): Dataset[ImageFeatures] = {
    val spark = media.sparkSession
    import spark.implicits._
    media.filter(_.kind == "image").mapPartitions { rows =>
      rows.map { m =>
        ImageCodec.decode(m.payload) match {
          case Some(img) =>
            ImageFeatures(m.media_id, img.getWidth, img.getHeight,
              ImageCodec.channels(img),
              mean_intensity = ImageCodec.meanIntensity(img),
              embedding = ImageCodec.gridFeatures(img, dim))
          case None =>
            val px = StubCodec.decodePixels(m.payload, n = 256)
            ImageFeatures(m.media_id, m.width, m.height, m.channels,
              mean_intensity = if (px.isEmpty) 0.0 else px.sum.toDouble / px.length,
              embedding = StubCodec.embed(m.payload, dim))
        }
      }
    }
  }

  /**
   * Audio decode + feature extraction, the audio twin of
   * [[imageFeatures]]: WAV/AIFF payloads decode through
   * [[AudioCodec]] (JDK sound API) into TRUE sample rate / channels /
   * duration plus RMS loudness and a fixed-dim loudness envelope;
   * undecodable payloads (compressed codecs, test bytes) fall back to
   * [[StubCodec]] surrogates with metadata passed through.
   */
  def audioFeatures(media: Dataset[MediaRow], dim: Int = 16): Dataset[AudioFeatures] = {
    val spark = media.sparkSession
    import spark.implicits._
    media.filter(_.kind == "audio").mapPartitions { rows =>
      rows.map { m =>
        AudioCodec.decode(m.payload) match {
          case Some(d) =>
            AudioFeatures(m.media_id, d.sampleRate, d.channels, d.durationMs,
              rms = AudioCodec.rms(d.samples),
              envelope = AudioCodec.envelope(d.samples, dim))
          case None =>
            val px = StubCodec.decodePixels(m.payload, n = 256)
            AudioFeatures(m.media_id, m.sample_rate, 1, m.duration_ms,
              rms = if (px.isEmpty) 0.0 else px.sum.toDouble / px.length / 255.0,
              envelope = StubCodec.embed(m.payload, dim))
        }
      }
    }
  }

  /** Resize: metadata transform + payload rewrite (stub keeps bytes;
    * a real impl re-encodes). Pure map — no shuffle, no collect. */
  def resize(media: Dataset[MediaRow], w: Int, h: Int): Dataset[MediaRow] = {
    val spark = media.sparkSession
    import spark.implicits._
    media.map(m => m.copy(width = w, height = h))
  }

  /**
   * Frame sampling: one video row → `everyMs`-spaced frames. The
   * explode happens inside mapPartitions (iterator flatMap), so frames
   * stream out without materializing a per-video frame list.
   */
  def sampleFrames(media: Dataset[MediaRow], everyMs: Int): Dataset[Frame] = {
    val spark = media.sparkSession
    import spark.implicits._
    media.filter(m => m.kind == "video" || m.kind == "image")
      .mapPartitions { rows =>
        rows.flatMap { m =>
          val n = math.max(1, m.duration_ms / everyMs)
          (0 until n).iterator.map { i =>
            val ts = i * everyMs
            // stub "frame": a deterministic slice of the payload
            val sliceLen = math.min(64, math.max(1, m.payload.length))
            val off = if (m.payload.isEmpty) 0 else (ts * 31) % math.max(1, m.payload.length - sliceLen + 1)
            val bytes =
              if (m.payload.isEmpty) Array.emptyByteArray
              else java.util.Arrays.copyOfRange(m.payload, off, off + sliceLen)
            Frame(m.media_id, i, ts, bytes)
          }
        }
      }
  }
}
