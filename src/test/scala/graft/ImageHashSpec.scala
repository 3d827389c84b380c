package graft

import org.apache.spark.sql.SparkSession
import org.scalatest.funsuite.AnyFunSuite
import org.scalatest.BeforeAndAfterAll

import graft.pipeline.Multimodal
import graft.pipeline.Multimodal.{ImageCodec, MediaRow}

/** Perceptual image hashing (dHash) + banded near-dup join: brightness
  * invariance, content sensitivity, pigeonhole recall, exact pairs. */
class ImageHashSpec extends AnyFunSuite with BeforeAndAfterAll {

  private var spark: SparkSession = _

  override def beforeAll(): Unit = {
    spark = SparkSession.builder()
      .master("local[4]")
      .config("spark.sql.shuffle.partitions", "4")
      .config("spark.ui.enabled", "false")
      .appName("image-hash")
      .getOrCreate()
    spark.sparkContext.setLogLevel("ERROR")
  }
  override def afterAll(): Unit = ()

  /** Deterministic per-seed noise image (independent seeds are
    * ~32 bits apart; a uniform brightness shift is 0 bits away —
    * pooling is linear and 30..219+b never clamps). */
  private def noise(seed: Int, w: Int = 32, h: Int = 24,
                    brightness: Int = 0): java.awt.image.BufferedImage = {
    val rnd = new scala.util.Random(seed)
    val img = new java.awt.image.BufferedImage(w, h,
      java.awt.image.BufferedImage.TYPE_3BYTE_BGR)
    for (y <- 0 until h; x <- 0 until w) {
      val v = 30 + rnd.nextInt(190) + brightness
      img.setRGB(x, y, v * 0x010101)
    }
    img
  }

  private def gradient(w: Int, h: Int): java.awt.image.BufferedImage = {
    val img = new java.awt.image.BufferedImage(w, h,
      java.awt.image.BufferedImage.TYPE_3BYTE_BGR)
    for (y <- 0 until h; x <- 0 until w)
      img.setRGB(x, y, (x * 255 / w) * 0x010101)
    img
  }

  private def png(img: java.awt.image.BufferedImage): Array[Byte] = {
    val bos = new java.io.ByteArrayOutputStream()
    javax.imageio.ImageIO.write(img, "png", bos)
    bos.toByteArray
  }

  private def hamming(a: Long, b: Long): Int = java.lang.Long.bitCount(a ^ b)

  test("dHash: brightness-shift invariant, content sensitive") {
    val base = ImageCodec.dHash(noise(seed = 1))
    // uniform brightness shift preserves every gradient sign exactly
    assert(hamming(base, ImageCodec.dHash(noise(seed = 1, brightness = 6))) == 0)
    // independent content lands ~32 bits away
    assert(hamming(base, ImageCodec.dHash(noise(seed = 2))) >= 12)
    // resolution independence on smooth content: same pattern, 2x size
    assert(hamming(ImageCodec.dHash(gradient(32, 24)),
      ImageCodec.dHash(gradient(64, 48))) <= 3)
  }

  /** 16-bit PCM mono WAV of seeded noise, optionally gain-scaled. */
  private def wav(seed: Int, n: Int = 6400, gain: Double = 1.0): Array[Byte] = {
    val rnd = new scala.util.Random(seed)
    val raw = new Array[Byte](n * 2)
    for (i <- 0 until n) {
      val v = math.round((rnd.nextInt(16000) - 8000) * gain).toInt
      raw(2 * i) = (v & 0xFF).toByte
      raw(2 * i + 1) = ((v >> 8) & 0xFF).toByte
    }
    val fmt = new javax.sound.sampled.AudioFormat(16000f, 16, 1, true, false)
    val bos = new java.io.ByteArrayOutputStream()
    javax.sound.sampled.AudioSystem.write(
      new javax.sound.sampled.AudioInputStream(
        new java.io.ByteArrayInputStream(raw), fmt, n.toLong),
      javax.sound.sampled.AudioFileFormat.Type.WAVE, bos)
    bos.toByteArray
  }

  test("audio envelopeHash: gain invariant, content sensitive; near-dups exact") {
    val sp = spark; import sp.implicits._
    import graft.pipeline.Multimodal.AudioCodec
    def hashOf(bytes: Array[Byte]): Long =
      AudioCodec.envelopeHash(AudioCodec.decode(bytes).get.samples)
    val base = hashOf(wav(seed = 1))
    assert(hamming(base, hashOf(wav(seed = 1, gain = 0.5))) <= 3)
    assert(hamming(base, hashOf(wav(seed = 2))) >= 12)

    // planted triples through the banded join, like the image test
    val rows = (0 until 30).map { id =>
      val group = id / 3
      val payload = (id % 3) match {
        case 0 => wav(seed = group)
        case 1 => wav(seed = group, gain = 0.5)
        case _ => wav(seed = group + 1000)
      }
      MediaRow(id.toLong, "audio", payload, 0, 0, 0, 16000, 400, "wav")
    }
    val pairs = Multimodal.audioNearDups(sp.createDataset(rows), maxHamming = 3)
      .select("a", "b").collect().map(r => (r.getLong(0), r.getLong(1))).toSet
    val expected = (0 until 30 by 3).map(k => (k.toLong, (k + 1).toLong)).toSet
    assert(pairs == expected, s"got ${pairs.toSeq.sorted}")
  }

  /** JPEG-robust block-pattern frame: 8×6 blocks of 4×4 px, intensity
    * 70/180 per seeded bit — pooled cell means keep block signs
    * through lossy MJPEG round-trips. */
  private def blockFrame(seed: Int, brightness: Int = 0): java.awt.image.BufferedImage = {
    val rnd = new scala.util.Random(seed)
    val bits = Array.fill(48)(rnd.nextBoolean())
    val img = new java.awt.image.BufferedImage(32, 24,
      java.awt.image.BufferedImage.TYPE_3BYTE_BGR)
    for (y <- 0 until 24; x <- 0 until 32) {
      val b = (y / 4) * 8 + (x / 4)
      val v = math.min(255, (if (bits(b)) 180 else 70) + brightness)
      img.setRGB(x, y, v * 0x010101)
    }
    img
  }

  private def mjpeg(group: Int, brightness: Int = 0, nFrames: Int = 4): Array[Byte] =
    Multimodal.VideoCodec.encodeMjpegAvi(
      (0 until nFrames).map(f => blockFrame(group * 17 + f, brightness)), fps = 4)

  test("videoNearDups: brightness-shifted re-encode matches, unrelated content does not") {
    val sp = spark; import sp.implicits._
    val rows = (0 until 30).map { id =>
      val group = id / 3
      val payload = (id % 3) match {
        case 0 => mjpeg(group)
        case 1 => mjpeg(group, brightness = 6)
        case _ => mjpeg(group + 1000)
      }
      MediaRow(id.toLong, "video", payload, 32, 24, 3, 0, 1000, "avi")
    }
    val pairs = Multimodal.videoNearDups(sp.createDataset(rows),
      maxHamming = 3, minSharedFrac = 0.5)
      .select("a", "b").collect().map(r => (r.getLong(0), r.getLong(1))).toSet
    val expected = (0 until 30 by 3).map(k => (k.toLong, (k + 1).toLong)).toSet
    assert(pairs == expected, s"got ${pairs.toSeq.sorted}")
  }

  test("videoNearDups: unequal-length videos measure overlap on the shorter one (frac ≤ 1)") {
    val sp = spark; import sp.implicits._
    // id 0: 8 copies of ONE frame; id 1: a 2-frame excerpt of the same
    // content — every frame of each matches every frame of the other.
    // The matched count must be taken on the video that owns the
    // denominator (the shorter one): shared_frac = 2/2 = 1.0, never the
    // 8/2 = 4.0 a one-sided count against the other video's length gave.
    val rep8 = Multimodal.VideoCodec.encodeMjpegAvi(Seq.fill(8)(blockFrame(7)), fps = 4)
    val rep2 = Multimodal.VideoCodec.encodeMjpegAvi(Seq.fill(2)(blockFrame(7)), fps = 4)
    val rows = Seq(
      MediaRow(0L, "video", rep8, 32, 24, 3, 0, 2000, "avi"),
      MediaRow(1L, "video", rep2, 32, 24, 3, 0, 500, "avi"),
      MediaRow(2L, "video", mjpeg(999), 32, 24, 3, 0, 1000, "avi"))
    val out = Multimodal.videoNearDups(sp.createDataset(rows),
      maxHamming = 3, minSharedFrac = 0.5)
      .collect().map(r => ((r.getLong(0), r.getLong(1)), r.getDouble(2))).toMap
    assert(out.keySet == Set((0L, 1L)), s"got ${out.keySet.toSeq.sorted}")
    assert(out((0L, 1L)) == 1.0, s"got ${out((0L, 1L))}")
  }

  test("imageNearDups degenerate guard: 3k identical blank images emit a star") {
    val sp = spark; import sp.implicits._
    // the modal class real corpora are full of — EVERY blank image
    // produces the IDENTICAL dHash (all gradient signs equal); the
    // shared guarded core must group them (star), never band-self-join
    val blank = {
      val img = new java.awt.image.BufferedImage(32, 24,
        java.awt.image.BufferedImage.TYPE_3BYTE_BGR)
      val bos = new java.io.ByteArrayOutputStream()
      javax.imageio.ImageIO.write(img, "png", bos)
      bos.toByteArray
    }
    val n = 3000
    val rows = (0 until n).map(id =>
      MediaRow(id.toLong, "image", blank, 0, 0, 0, 0, 0, "png"))
    val pairs = Multimodal.imageNearDups(sp.createDataset(rows), maxHamming = 3)
      .collect()
    assert(pairs.length == n - 1, s"star expected, got ${pairs.length} edges")
    assert(pairs.forall(_.getAs[Long]("a") == 0L)) // anchored at min id
    assert(pairs.forall(r => r.getAs[Int]("hamming") == 0))
  }

  test("imageNearDups finds exactly the planted jittered pairs (banded, no all-pairs)") {
    val sp = spark; import sp.implicits._
    // groups of 3: id 3k base, 3k+1 jittered copy, 3k+2 distinct phase
    val rows = (0 until 60).map { id =>
      val group = id / 3
      val payload = (id % 3) match {
        case 0 => png(noise(seed = group))
        case 1 => png(noise(seed = group, brightness = 6))
        case _ => png(noise(seed = group + 1000))
      }
      MediaRow(id.toLong, "image", payload, 0, 0, 0, 0, 0, "png")
    }
    val media = sp.createDataset(rows)
    val pairs = Multimodal.imageNearDups(media, maxHamming = 3)
      .select("a", "b").collect().map(r => (r.getLong(0), r.getLong(1))).toSet
    val expected = (0 until 60 by 3).map(k => (k.toLong, (k + 1).toLong)).toSet
    assert(pairs == expected, s"got ${pairs.toSeq.sorted}")
  }
}
