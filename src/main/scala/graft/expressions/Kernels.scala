package graft.expressions

import org.apache.spark.sql.catalyst.util.{ArrayData, GenericArrayData}
import org.apache.spark.unsafe.types.UTF8String

/** Scalar kernels invoked from generated code (static forwarders give
  * them stable Java names, so `doGenCode` can emit direct calls —
  * the same pattern Spark's own complex expressions use). Keeping the
  * loops here means one JIT-compiled body shared by interpreted eval
  * and whole-stage codegen.
  */
object Kernels {

  /** Cosine similarity of two float vectors. Returns 0.0 when lengths
    * differ or either norm is zero (callers filter those upstream).
    * Single fused pass: dot + both norms in one loop over the unsafe
    * array data — the hot inner loop of ANN scoring at 100 TB.
    */
  def cosineF(a: ArrayData, b: ArrayData): Double = {
    val n = a.numElements()
    if (n != b.numElements() || n == 0) return 0.0
    var dot = 0.0; var na = 0.0; var nb = 0.0
    var i = 0
    while (i < n) {
      val x = a.getFloat(i).toDouble
      val y = b.getFloat(i).toDouble
      dot += x * y; na += x * x; nb += y * y
      i += 1
    }
    if (na == 0.0 || nb == 0.0) 0.0
    else dot / (math.sqrt(na) * math.sqrt(nb))
  }

  /** Dot product of two float vectors (0.0 on length mismatch). */
  def dotF(a: ArrayData, b: ArrayData): Double = {
    val n = a.numElements()
    if (n != b.numElements()) return 0.0
    var dot = 0.0; var i = 0
    while (i < n) { dot += a.getFloat(i).toDouble * b.getFloat(i).toDouble; i += 1 }
    dot
  }

  /** L2 norm of a float vector. */
  def normF(a: ArrayData): Double = {
    var s = 0.0; var i = 0; val n = a.numElements()
    while (i < n) { val x = a.getFloat(i).toDouble; s += x * x; i += 1 }
    math.sqrt(s)
  }

  private final val MersennePrime = (1L << 61) - 1

  /** k-permutation MinHash signature over an array of 64-bit element
    * hashes. Permutations h_i(x) = (a_i*x + b_i) mod (2^61-1) with
    * (a_i, b_i) derived deterministically from `seed` — every row and
    * every executor derives the same coefficients, so signatures are
    * reproducible cluster-wide with no broadcast state.
    */
  def minHashSignature(hashes: ArrayData, k: Int, seed: Long): ArrayData = {
    val rnd = new java.util.SplittableRandom(seed)
    val sig = new Array[Long](k)
    val as = new Array[Long](k); val bs = new Array[Long](k)
    var j = 0
    while (j < k) {
      as(j) = (rnd.nextLong() & Long.MaxValue) % (MersennePrime - 1) + 1
      bs(j) = (rnd.nextLong() & Long.MaxValue) % MersennePrime
      sig(j) = Long.MaxValue
      j += 1
    }
    val n = hashes.numElements()
    var i = 0
    while (i < n) {
      val h = hashes.getLong(i) & Long.MaxValue
      j = 0
      while (j < k) {
        // (a*h + b) mod p via unsigned 128-free reduction: split h
        val v = ((as(j) * (h % MersennePrime)) % MersennePrime + bs(j)) % MersennePrime
        if (v < sig(j)) sig(j) = v
        j += 1
      }
      i += 1
    }
    if (n == 0) java.util.Arrays.fill(sig, 0L)
    new GenericArrayData(sig)
  }

  /** 64-bit SimHash over an array of element hashes: per bit, sum +1/-1
    * votes across elements; the sign of each sum is the output bit. */
  def simHash64(hashes: ArrayData): Long = {
    val votes = new Array[Int](64)
    val n = hashes.numElements()
    var i = 0
    while (i < n) {
      val h = hashes.getLong(i)
      var b = 0
      while (b < 64) {
        if (((h >>> b) & 1L) == 1L) votes(b) += 1 else votes(b) -= 1
        b += 1
      }
      i += 1
    }
    var out = 0L; var b = 0
    while (b < 64) { if (votes(b) > 0) out |= (1L << b); b += 1 }
    out
  }

  /** Signed-random-projection (SRP) LSH bucket of a float vector:
    * `nBits` sign bits of dot products with pseudo-random hyperplanes,
    * packed into one long. Hyperplane coefficient (b, i) derives from
    * byteswap-mixing (seed, b, i) — reproducible on every executor with
    * zero broadcast state. One fused O(nBits·dim) loop; replaces a
    * composed per-element expression tree that overflowed janino's
    * method-size limit and fell back to interpretation.
    */
  def srpBucket(vec: ArrayData, nBits: Int, seed: Long): Long = {
    val n = vec.numElements()
    var out = 0L
    var b = 0
    while (b < nBits) {
      val base = seed + b.toLong * 131071L
      var dot = 0.0
      var i = 0
      while (i < n) {
        val h = java.lang.Long.reverseBytes((base + i.toLong * 524287L) * 0x9e3779b97f4a7c15L)
        dot += vec.getFloat(i).toDouble * (h.toDouble / Long.MaxValue.toDouble)
        i += 1
      }
      if (dot >= 0.0) out |= (1L << b)
      b += 1
    }
    out
  }

  /** Polynomial rolling-hash fingerprint of a UTF-8 string:
    * h = sum(byte_i * base^i) mod (2^61-1). Order-sensitive (unlike a
    * bag-of-bytes hash) and incremental — the building block for
    * content-defined chunking / winnowing at scale.
    */
  def polyFingerprint(s: UTF8String, base: Long): Long = {
    val bytes = s.getBytes
    var h = 0L; var pow = 1L; var i = 0
    while (i < bytes.length) {
      val b = (bytes(i) & 0xffL) + 1L
      h = (h + (b % MersennePrime) * pow % MersennePrime) % MersennePrime
      pow = (pow * base) % MersennePrime
      i += 1
    }
    h
  }
}
