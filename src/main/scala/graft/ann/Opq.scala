package graft.ann

import org.apache.spark.sql.{Column, DataFrame}
import org.apache.spark.sql.functions._

/** OPQ-style structured rotation for product quantization (Ge et al.,
  * "Optimized Product Quantization", CVPR 2013; the structured variant is
  * the seeded sign-Hadamard transform of Ailon & Chazelle's fast JL
  * transform — the same rotation FAISS exposes as `OPQ`'s cheap cousin
  * and ScaNN applies before asymmetric hashing). Rotating decorrelates
  * and variance-balances the subspaces PQ quantizes independently, which
  * is where plain PQ loses accuracy on anisotropic real embeddings.
  *
  * The rotation is R = H·D/sqrt(d): D a SplitMix64-seeded ±1 diagonal, H
  * the d×d Hadamard matrix (H[i][j] = (-1)^popcount(i&j)), d a power of
  * two. Exactly orthonormal, so L2/cosine/IP rankings are preserved in
  * exact arithmetic; deterministic from the seed, so an external SQL
  * oracle can replicate it term-for-term ([[rotate]] accumulates in f64
  * in ascending j — the same order as the oracle's `list_sum`).
  *
  * [[rotateFht]] is the O(d log d) in-place fast Walsh–Hadamard path for
  * bulk ingest at scale; it computes the same rotation with a different
  * (butterfly) summation order, so its f32 results can differ from
  * [[rotate]] in the last ulp — quality-identical, but gates pin the
  * ordered variant.
  */
object Opq {

  /** SplitMix64-seeded ±1 diagonal: sign j is the low bit of the j-th
    * stream value (state advances by the golden gamma each draw). */
  def signs(dims: Int, seed: Long): Array[Float] = {
    val out = new Array[Float](dims)
    var state = seed
    var j = 0
    while (j < dims) {
      state += 0x9E3779B97F4A7C15L
      var z = state
      z = (z ^ (z >>> 30)) * 0xBF58476D1CE4E5B9L
      z = (z ^ (z >>> 27)) * 0x94D049BB133111EBL
      z ^= (z >>> 31)
      out(j) = if ((z & 1L) == 0L) 1.0f else -1.0f
      j += 1
    }
    out
  }

  def isPowerOfTwo(d: Int): Boolean = d > 0 && (d & (d - 1)) == 0

  /** Ordered-sum rotation (oracle-exact): out(i) = (Σ_j ±v(j)) / sqrt(d)
    * with f64 accumulation in ascending j. O(d²) — use [[rotateFht]] for
    * bulk ingest. */
  def rotate(v: Array[Float], sgn: Array[Float]): Array[Float] = {
    val d = v.length
    require(isPowerOfTwo(d), s"sign-Hadamard rotation needs power-of-2 dims, got $d")
    require(sgn.length == d, s"signs length ${sgn.length} != dims $d")
    val inv = math.sqrt(d.toDouble)
    val out = new Array[Float](d)
    var i = 0
    while (i < d) {
      var acc = 0.0
      var j = 0
      while (j < d) {
        val neg = (java.lang.Integer.bitCount(i & j) & 1) == 1
        val term = sgn(j).toDouble * v(j).toDouble
        acc += (if (neg) -term else term)
        j += 1
      }
      out(i) = (acc / inv).toFloat
      i += 1
    }
    out
  }

  /** Fast Walsh–Hadamard rotation: same rotation as [[rotate]] up to f32
    * rounding, O(d log d) — the bulk-ingest path. */
  def rotateFht(v: Array[Float], sgn: Array[Float]): Array[Float] = {
    val d = v.length
    require(isPowerOfTwo(d), s"sign-Hadamard rotation needs power-of-2 dims, got $d")
    require(sgn.length == d, s"signs length ${sgn.length} != dims $d")
    val a = new Array[Double](d)
    var j = 0
    while (j < d) { a(j) = sgn(j).toDouble * v(j).toDouble; j += 1 }
    var len = 1
    while (len < d) {
      var i = 0
      while (i < d) {
        var k = i
        while (k < i + len) {
          val x = a(k); val y = a(k + len)
          a(k) = x + y; a(k + len) = x - y
          k += 1
        }
        i += 2 * len
      }
      len *= 2
    }
    val inv = math.sqrt(d.toDouble)
    val out = new Array[Float](d)
    var i = 0
    while (i < d) { out(i) = (a(i) / inv).toFloat; i += 1 }
    out
  }

  /** Rotation as a column (ordered variant — gate/oracle path). */
  def rotateColumn(sgn: Array[Float])(v: Column): Column = {
    val s = sgn
    udf((x: Seq[Float]) => rotate(x.toArray, s)).apply(v)
  }

  /** Replace `vector` with its rotation (orthonormal: unit vectors stay
    * unit, L2 distances are preserved). */
  def withRotated(df: DataFrame, sgn: Array[Float],
      vectorCol: String = "vector"): DataFrame =
    df.withColumn(vectorCol, rotateColumn(sgn)(col(vectorCol)))
}
