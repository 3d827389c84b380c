package graft.pipeline

import org.apache.spark.sql.{DataFrame, Dataset, SparkSession}
import org.apache.spark.sql.functions._

/**
 * Multimodal columns for training-data pipelines: image/audio/video as
 * opaque `binary` payloads plus typed metadata, with decode /
 * feature-extract / resize / frame-sample transforms.
 *
 * The Spark-side plumbing is real — schemas, typed Datasets,
 * mapPartitions batching (the JVM analogue of `mapInPandas`: one
 * iterator per partition, amortized per-batch setup), partitioning
 * behavior — while the codec itself is STUBBED: this container has no
 * image/audio libraries, so [[StubCodec]] derives deterministic fake
 * pixels/samples from the payload bytes. Swapping in a real decoder
 * means replacing StubCodec only; every dataflow contract stays.
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

  /**
   * STUB CODEC — deterministic fake decode. A real build links an
   * image/audio library here; everything derives from payload bytes so
   * results are stable across runs, executors and partitionings.
   */
  object StubCodec {
    /** ??? real decode unavailable in this container — deterministic
      * surrogate: k-th "pixel" is a byte-mix of payload at stride. */
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
   * Image decode + feature extraction. mapPartitions so a real codec
   * would initialize once per partition (the expensive part), then
   * stream rows — the exact shape a Pandas-UDF batch pipeline has.
   */
  def imageFeatures(media: Dataset[MediaRow], dim: Int = 16): Dataset[ImageFeatures] = {
    val spark = media.sparkSession
    import spark.implicits._
    media.filter(_.kind == "image").mapPartitions { rows =>
      // per-partition init would go here (codec/context/model handle)
      rows.map { m =>
        val px = StubCodec.decodePixels(m.payload, n = 256)
        ImageFeatures(m.media_id, m.width, m.height, m.channels,
          mean_intensity = if (px.isEmpty) 0.0 else px.sum.toDouble / px.length,
          embedding = StubCodec.embed(m.payload, dim))
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
