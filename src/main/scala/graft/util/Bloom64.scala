package graft.util

/**
 * A Bloom filter over 64-bit values with per-probe splitmix64 mixing.
 *
 * Exists because Spark's `util.sketch.BloomFilter` uses
 * Kirsch-Mitzenmacher double hashing (h1 + i·h2), whose probe
 * positions lose independence at small-to-moderate bit sizes: measured
 * here, a 448-bit filter built for fpp 1e-6 admits ~3.5e-3 of far
 * probes — three orders of magnitude off its own `expectedFpp()`.
 * Independent splitmix64 mixes per probe index restore the textbook
 * rate (the standard finalizer from Steele et al., "Fast splittable
 * pseudorandom number generators", OOPSLA'14; public domain
 * constants). Deterministic: same inputs → same bits, insertion
 * order-free (bitwise OR), so distributed builds merge with `union`.
 */
final class Bloom64(val numHashes: Int, val words: Array[Long])
    extends Serializable {
  require(numHashes >= 1 && words.nonEmpty, "degenerate bloom filter")

  private def nBits: Long = words.length.toLong * 64L

  @inline private def mix(z0: Long): Long = {
    var z = z0 + 0x9E3779B97F4A7C15L
    z = (z ^ (z >>> 30)) * 0xBF58476D1CE4E5B9L
    z = (z ^ (z >>> 27)) * 0x94D049BB133111EBL
    z ^ (z >>> 31)
  }

  def put(v: Long): Unit = {
    var i = 0
    while (i < numHashes) {
      val bit = java.lang.Math.floorMod(mix(v ^ (i.toLong * 0xC2B2AE3D27D4EB4FL)), nBits)
      words((bit >>> 6).toInt) |= 1L << (bit & 63L)
      i += 1
    }
  }

  def mightContain(v: Long): Boolean = {
    var i = 0
    while (i < numHashes) {
      val bit = java.lang.Math.floorMod(mix(v ^ (i.toLong * 0xC2B2AE3D27D4EB4FL)), nBits)
      if ((words((bit >>> 6).toInt) & (1L << (bit & 63L))) == 0L) return false
      i += 1
    }
    true
  }

  /** OR-merge another filter of identical shape into this one. */
  def merge(other: Bloom64): Bloom64 = {
    require(other.numHashes == numHashes && other.words.length == words.length,
      "incompatible bloom shapes")
    var i = 0
    while (i < words.length) { words(i) |= other.words(i); i += 1 }
    this
  }

  def serialize: Array[Byte] = {
    val bb = java.nio.ByteBuffer.allocate(8 + words.length * 8)
    bb.putInt(numHashes).putInt(words.length)
    words.foreach(bb.putLong)
    bb.array()
  }
}

object Bloom64 {
  /** Textbook sizing: m = −n·ln(fpp)/ln²2 bits, k = m/n·ln2 probes. */
  def create(expectedItems: Long, fpp: Double): Bloom64 = {
    require(expectedItems >= 1, "expectedItems must be >= 1")
    require(fpp > 0 && fpp < 1, s"fpp in (0,1), got $fpp")
    val ln2 = math.log(2)
    val mBits = math.max(64L,
      math.ceil(-expectedItems * math.log(fpp) / (ln2 * ln2)).toLong)
    val k = math.max(1, math.round(mBits.toDouble / expectedItems * ln2).toInt)
    new Bloom64(k, new Array[Long](((mBits + 63) / 64).toInt))
  }

  def deserialize(bytes: Array[Byte]): Bloom64 = {
    val bb = java.nio.ByteBuffer.wrap(bytes)
    val k = bb.getInt
    val n = bb.getInt
    val words = Array.fill(n)(bb.getLong)
    new Bloom64(k, words)
  }
}
