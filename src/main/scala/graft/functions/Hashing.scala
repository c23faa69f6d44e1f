package graft.functions

/** Deterministic 64-bit hashing used by the sketch operators
  * (minhash / simhash / LSH / fingerprints). Self-contained so the
  * bits are stable across Spark/JVM versions — sketches persisted at
  * one version must join against sketches computed at another.
  * splitmix64 finalizer over a simple byte fold; not cryptographic.
  */
object Hashing {

  @inline def mix64(z0: Long): Long = {
    var z = z0 + 0x9e3779b97f4a7c15L
    z = (z ^ (z >>> 30)) * 0xbf58476d1ce4e5b9L
    z = (z ^ (z >>> 27)) * 0x94d049bb133111ebL
    z ^ (z >>> 31)
  }

  /** Seeded 64-bit string hash. */
  def hash64(s: String, seed: Long = 0L): Long = {
    var h = mix64(seed ^ 0x2545f4914f6cdd1dL)
    var i = 0
    while (i < s.length) {
      h = mix64(h ^ s.charAt(i).toLong)
      i += 1
    }
    mix64(h ^ s.length.toLong)
  }

  def hash64(v: Long, seed: Long): Long = mix64(mix64(seed) ^ v)

  /** Map a hash to a non-negative bucket id (like Spark's pmod). */
  @inline def bucket(h: Long, buckets: Int): Int = {
    val m = (h % buckets).toInt
    if (m < 0) m + buckets else m
  }

  /** Deterministic double in [0,1) from a hash — replaces rand() in
    * all sampling paths so results are stable across parallelism
    * (SURVEY §2.6 seeded sampling). */
  @inline def toUnit(h: Long): Double = ((h >>> 11).toDouble) / (1L << 53).toDouble

  private val HexChars = "0123456789abcdef".toCharArray

  /** Lowercase md5 hex of raw bytes — the ENGINE-PORTABLE hash used
    * where a DuckDB oracle must reproduce derived values bit-for-bit
    * (DuckDB md5(s) hashes the UTF-8 bytes of s). */
  def md5Hex(bytes: Array[Byte]): String = {
    val d = java.security.MessageDigest.getInstance("MD5").digest(bytes)
    val out = new Array[Char](d.length * 2)
    var i = 0
    while (i < d.length) {
      out(2 * i) = HexChars((d(i) >> 4) & 0xF)
      out(2 * i + 1) = HexChars(d(i) & 0xF)
      i += 1
    }
    new String(out)
  }
}
