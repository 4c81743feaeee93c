package graft.expr

import org.apache.spark.sql.catalyst.util.{ArrayData, GenericArrayData}

/** Scalar vector kernels shared by the Catalyst expressions (hot path,
  * called from generated code via static forwarders) and by driver-side
  * helpers (query preparation, MMR, MUVERA).
  *
  * All arithmetic is Double over f32 inputs. The reference computes f32
  * SIMD with an f64 recovery pass on overflow (distances.rs:59-98);
  * computing directly in f64 yields the same recovered values and never
  * needs the retry. Where the reference's f64 result is cast back to f32
  * we keep the f64 value (strictly more precise; score parity within f32
  * rounding).
  *
  * Metric codes 0..8 as in graft.core.Metric; 9 is the internal
  * "true cosine" kernel used for funnel prefix scoring
  * (distances.rs:160-177, search.rs:56-59).
  */
object VectorKernels {

  final val TRUE_COSINE_CODE = 9

  // ---------------------------------------------------------------- ArrayData
  // ArrayData-based entry points: one virtual call per row from generated
  // code, tight while-loops inside (JIT-friendly, no boxing, no
  // intermediate arrays — unlike zip_with/aggregate HOF chains).

  def distance(code: Int, a: ArrayData, b: ArrayData): Double = {
    val n = a.numElements()
    if (b.numElements() != n)
      throw new IllegalArgumentException(
        s"dimension mismatch: ${n} vs ${b.numElements()}")
    code match {
      case 0 => math.sqrt(l2sq(a, b, n))
      case 1 => l2sq(a, b, n)
      case 2 => dot(a, b, n)
      case 3 => dot(a, b, n)
      case 4 => -dot(a, b, n)
      case 5 => manhattan(a, b, n)
      case 6 => chebyshev(a, b, n)
      case 7 => hamming(a, b, n)
      case 8 => jaccard(a, b, n)
      case TRUE_COSINE_CODE => trueCosine(a, b, n)
      case c => throw new IllegalArgumentException(s"unknown metric code $c")
    }
  }

  private def dot(a: ArrayData, b: ArrayData, n: Int): Double = {
    var acc = 0.0; var i = 0
    while (i < n) { acc += a.getFloat(i).toDouble * b.getFloat(i).toDouble; i += 1 }
    acc
  }

  private def l2sq(a: ArrayData, b: ArrayData, n: Int): Double = {
    var acc = 0.0; var i = 0
    while (i < n) {
      val d = a.getFloat(i).toDouble - b.getFloat(i).toDouble
      acc += d * d; i += 1
    }
    acc
  }

  private def manhattan(a: ArrayData, b: ArrayData, n: Int): Double = {
    var acc = 0.0; var i = 0
    while (i < n) { acc += math.abs(a.getFloat(i).toDouble - b.getFloat(i).toDouble); i += 1 }
    acc
  }

  private def chebyshev(a: ArrayData, b: ArrayData, n: Int): Double = {
    var acc = 0.0; var i = 0
    while (i < n) {
      val d = math.abs(a.getFloat(i).toDouble - b.getFloat(i).toDouble)
      if (d > acc) acc = d
      i += 1
    }
    acc
  }

  /** Truthy-float Hamming: coordinates differ when (x != 0) != (y != 0). */
  private def hamming(a: ArrayData, b: ArrayData, n: Int): Double = {
    var acc = 0; var i = 0
    while (i < n) {
      if ((a.getFloat(i) != 0.0f) != (b.getFloat(i) != 0.0f)) acc += 1
      i += 1
    }
    acc.toDouble
  }

  /** Truthy-float Jaccard distance; empty union -> 0.0. */
  private def jaccard(a: ArrayData, b: ArrayData, n: Int): Double = {
    var inter = 0; var union = 0; var i = 0
    while (i < n) {
      val x = a.getFloat(i) != 0.0f; val y = b.getFloat(i) != 0.0f
      if (x || y) union += 1
      if (x && y) inter += 1
      i += 1
    }
    if (union == 0) 0.0 else 1.0 - inter.toDouble / union.toDouble
  }

  /** True cosine with norms: zero vector -> 0.0, clamped to [-1, 1]. */
  private def trueCosine(a: ArrayData, b: ArrayData, n: Int): Double = {
    var dotAcc = 0.0; var na = 0.0; var nb = 0.0; var i = 0
    while (i < n) {
      val x = a.getFloat(i).toDouble; val y = b.getFloat(i).toDouble
      dotAcc += x * y; na += x * x; nb += y * y; i += 1
    }
    if (na == 0.0 || nb == 0.0) 0.0
    else math.max(-1.0, math.min(1.0, dotAcc / (math.sqrt(na) * math.sqrt(nb))))
  }

  // ------------------------------------------------------------- packed bits

  /** Sign-bit packing: bit i set iff v(i) >= 0, 64 dims per Long word
    * (distances.rs:413-423). */
  def packSignBits(v: ArrayData): ArrayData = {
    val n = v.numElements()
    val words = new Array[Long]((n + 63) / 64)
    var i = 0
    while (i < n) {
      if (v.getFloat(i) >= 0.0f) words(i / 64) |= 1L << (i % 64)
      i += 1
    }
    new GenericArrayData(words)
  }

  private def lastWordMask(wordIdx: Int, words: Int, dims: Int): Long = {
    val rem = dims % 64
    if (wordIdx + 1 == words && rem != 0) (1L << rem) - 1 else -1L
  }

  /** Hamming over packed sign words; padding bits masked out
    * (distances.rs:426-437). */
  def packedHamming(a: ArrayData, b: ArrayData, dims: Int): Double = {
    val words = (dims + 63) / 64
    require(a.numElements() == words && b.numElements() == words, "dimension mismatch")
    var acc = 0L; var i = 0
    while (i < words) {
      acc += java.lang.Long.bitCount((a.getLong(i) ^ b.getLong(i)) & lastWordMask(i, words, dims))
      i += 1
    }
    acc.toDouble
  }

  /** Jaccard over packed sign words; empty union -> 0.0 (distances.rs:440-457). */
  def packedJaccard(a: ArrayData, b: ArrayData, dims: Int): Double = {
    val words = (dims + 63) / 64
    require(a.numElements() == words && b.numElements() == words, "dimension mismatch")
    var inter = 0L; var union = 0L; var i = 0
    while (i < words) {
      val m = lastWordMask(i, words, dims)
      inter += java.lang.Long.bitCount(a.getLong(i) & b.getLong(i) & m)
      union += java.lang.Long.bitCount((a.getLong(i) | b.getLong(i)) & m)
      i += 1
    }
    if (union == 0L) 0.0 else 1.0 - inter.toDouble / union.toDouble
  }

  // ----------------------------------------------------------- normalization

  /** Normalize modes 0=none 1=l2 2=zscore 3=minmax (distances.rs:350-410).
    * Output stays f32 for storage parity. */
  def normalize(mode: Int, v: ArrayData): ArrayData = {
    val n = v.numElements()
    val out = new Array[Float](n)
    mode match {
      case 0 =>
        var i = 0; while (i < n) { out(i) = v.getFloat(i); i += 1 }
      case 1 =>
        var norm = 0.0; var i = 0
        while (i < n) { val x = v.getFloat(i).toDouble; norm += x * x; i += 1 }
        norm = math.sqrt(norm)
        if (norm != 0.0) { i = 0; while (i < n) { out(i) = (v.getFloat(i).toDouble / norm).toFloat; i += 1 } }
      case 2 =>
        if (n > 0) {
          var sum = 0.0; var i = 0
          while (i < n) { sum += v.getFloat(i).toDouble; i += 1 }
          val mean = sum / n
          var varAcc = 0.0; i = 0
          while (i < n) { val d = v.getFloat(i).toDouble - mean; varAcc += d * d; i += 1 }
          val std = math.sqrt(varAcc / n) // population variance
          if (std != 0.0) { i = 0; while (i < n) { out(i) = ((v.getFloat(i).toDouble - mean) / std).toFloat; i += 1 } }
        }
      case 3 =>
        if (n > 0) {
          var mn = Float.PositiveInfinity; var mx = Float.NegativeInfinity; var i = 0
          while (i < n) { val x = v.getFloat(i); if (x < mn) mn = x; if (x > mx) mx = x; i += 1 }
          if (mn != mx) {
            val lo = mn.toDouble; val span = mx.toDouble - lo
            i = 0; while (i < n) { out(i) = ((v.getFloat(i).toDouble - lo) / span).toFloat; i += 1 }
          }
        }
      case m => throw new IllegalArgumentException(s"unknown normalize mode $m")
    }
    new GenericArrayData(out)
  }

  // ----------------------------------------------------------------- MaxSim
  // ColBERT-style late interaction (multi_vector.rs:39-132): score =
  // sum over query vectors of (max over doc vectors of
  // similarity_value(metric, raw)). Either side empty -> 0.0.

  def maxSim(metricCode: Int, queryVecs: ArrayData, docVecs: ArrayData): Double = {
    val nq = queryVecs.numElements(); val nd = docVecs.numElements()
    if (nq == 0 || nd == 0) return 0.0
    var total = 0.0
    var qi = 0
    while (qi < nq) {
      val q = queryVecs.getArray(qi)
      var best = Double.NegativeInfinity
      var di = 0
      while (di < nd) {
        val raw = distance(metricCode, q, docVecs.getArray(di))
        val sim = similarityValue(metricCode, raw)
        if (sim > best) best = sim
        di += 1
      }
      total += best
      qi += 1
    }
    total
  }

  def similarityValue(metricCode: Int, raw: Double): Double = metricCode match {
    case 2 | 3 => raw
    case 4     => -raw
    case _     => 1.0 / (1.0 + raw)
  }

  def rankValue(metricCode: Int, raw: Double): Double = metricCode match {
    case 2 => 1.0 - raw
    case 3 => -raw
    case _ => raw
  }

  // ------------------------------------------------------- driver-side f32[]
  // Plain-array variants for query preparation, MMR, and tests.

  def distance(code: Int, a: Array[Float], b: Array[Float]): Double =
    distance(code, wrap(a), wrap(b))

  def normalize(mode: Int, v: Array[Float]): Array[Float] = {
    val out = normalize(mode, wrap(v))
    val n = out.numElements()
    val arr = new Array[Float](n)
    var i = 0; while (i < n) { arr(i) = out.getFloat(i); i += 1 }
    arr
  }

  def packSignBits(v: Array[Float]): Array[Long] = {
    val out = packSignBits(wrap(v))
    val n = out.numElements()
    val arr = new Array[Long](n)
    var i = 0; while (i < n) { arr(i) = out.getLong(i); i += 1 }
    arr
  }

  def validateFinite(v: Array[Float]): Boolean = {
    var i = 0
    while (i < v.length) { if (!java.lang.Float.isFinite(v(i))) return false; i += 1 }
    true
  }

  private def wrap(a: Array[Float]): ArrayData = new GenericArrayData(a)
}
