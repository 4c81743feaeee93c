package graft.expr

import java.util.regex.Pattern

import org.apache.spark.sql.catalyst.util.{ArrayData, GenericArrayData}
import org.apache.spark.unsafe.types.UTF8String

/** Fused MinHash kernel: tokenize -> k-shingles -> per-component md5 min
  * -> LSH band keys in ONE pass per row.
  *
  * Exactly replicates the column-composed pipeline in
  * [[graft.text.TextAnalysis]] (minhashSignature + minhashBands), which
  * the DuckDB oracles mirror:
  *  - trim removes SPACES only (Spark `trim` / DuckDB `trim` semantics,
  *    NOT Java String.trim which also strips \t\n),
  *  - split on `\s+` with -1 limit (leading whitespace yields an empty
  *    first token, like Spark/DuckDB regexp split),
  *  - shingle i = tokens[i, i+k) space-joined, i in [0, max(n-k, 0)],
  *  - signature component j = min md5 hex of "j:" + shingle over the
  *    DISTINCT shingles,
  *  - band key b = md5 of "b:" + the band's components joined by '|'.
  *
  * The column pipeline inlines the shingle subtree numHashes x bands
  * times, which forced `localCheckpoint()` lineage barriers to stop the
  * optimizer re-expanding it into every join branch (minutes of planning
  * on a 90-doc corpus). This kernel is a single opaque expression node:
  * nothing to re-expand, no barrier needed, usable in streaming plans
  * where checkpoint barriers are impossible.
  *
  * NULL-ELEMENT INVARIANT: every array-returning fused kernel here (and
  * the LSH/DSIR band kernels) returns arrays whose ELEMENTS are never
  * null — empty arrays yes, null entries no. The r15 explode_outer
  * conversions rest on it: `explode_outer(kernel(..)) ... WHERE col IS
  * NOT NULL` is row-identical to `explode(kernel(..))` only because the
  * sole null the filter removes is the one explode_outer fabricates for
  * an empty/null array, never a real element.
  */
object TextKernels {

  private val Whitespace = Pattern.compile("\\s+")

  private val HexDigits = "0123456789abcdef".toCharArray

  private def md5Hex(md: java.security.MessageDigest, s: String): String =
    hex(md.digest(s.getBytes("UTF-8")))

  /** Spark `trim`: leading/trailing SPACE characters only. */
  private def trimSpaces(s: String): String = {
    var from = 0
    var to = s.length
    while (from < to && s.charAt(from) == ' ') from += 1
    while (to > from && s.charAt(to - 1) == ' ') to -= 1
    s.substring(from, to)
  }

  /** ALL word k-shingles in document order (multiplicity preserved) —
    * the fused kernel of the transform/sequence/slice/concat_ws HOF
    * chain (each of those is CodegenFallback, interpreted once PER
    * GRAM; one kernel call per row replaces the whole chain — the DSIR
    * lesson). Short texts collapse to one whole-text shingle, matching
    * `sequence(0, greatest(size - k, 0))`. */
  def shingles(text: String, k: Int): Array[String] = {
    val toks = Whitespace.split(trimSpaces(text), -1)
    val n = math.max(toks.length - k, 0)
    val out = new Array[String](n + 1)
    var i = 0
    while (i <= n) {
      val sb = new java.lang.StringBuilder()
      var j = i
      val end = math.min(i + k, toks.length)
      while (j < end) {
        if (j > i) sb.append(' ')
        sb.append(toks(j))
        j += 1
      }
      out(i) = sb.toString
      i += 1
    }
    out
  }

  def shinglesData(text: UTF8String, k: Int): ArrayData = {
    val sh = shingles(text.toString, k)
    new GenericArrayData(sh.map(UTF8String.fromString(_)).asInstanceOf[Array[Any]])
  }

  /** Full n-grams of LOWERCASED tokens (SQL `lower` semantics per
    * token via UTF8String.toLowerCase); documents shorter than `n`
    * tokens yield none — topNgrams' gram stage as one kernel call. */
  def lowerNgramsData(text: UTF8String, n: Int): ArrayData = {
    val toks = Whitespace.split(trimSpaces(text.toString), -1)
    if (toks.length < n)
      return new GenericArrayData(Array.empty[Any])
    val low = new Array[String](toks.length)
    var i = 0
    while (i < toks.length) {
      low(i) = UTF8String.fromString(toks(i)).toLowerCase.toString
      i += 1
    }
    val out = new Array[Any](toks.length - n + 1)
    i = 0
    while (i <= toks.length - n) {
      val sb = new java.lang.StringBuilder()
      var j = i
      while (j < i + n) {
        if (j > i) sb.append(' ')
        sb.append(low(j))
        j += 1
      }
      out(i) = UTF8String.fromString(sb.toString)
      i += 1
    }
    new GenericArrayData(out)
  }

  /** 64-bit SimHash over whitespace tokens as one kernel call — the
    * fused form of the per-token udf loop in
    * [[graft.text.TextAnalysis.simhash64Scala]] (same trimSpaces +
    * whitespace split, same md5 first-8-bytes MSB-first bit votes,
    * votes >= 0 set the bit). Bit-identical to the udf it replaces, so
    * the DuckDB simhash oracles stay hash-green. */
  def simhash64(text: String): Long = {
    val toks = Whitespace.split(trimSpaces(text), -1)
    val votes = new Array[Int](64)
    val digest = java.security.MessageDigest.getInstance("MD5")
    var t = 0
    while (t < toks.length) {
      val d = digest.digest(toks(t).getBytes("UTF-8"))
      var b = 0
      while (b < 64) {
        // bit b (MSB-first over the first 8 digest bytes) votes +1/-1
        if (((d(b >> 3) >> (7 - (b & 7))) & 1) == 1) votes(b) += 1
        else votes(b) -= 1
        b += 1
      }
      t += 1
    }
    var acc = 0L
    var b = 0
    while (b < 64) { acc = (acc << 1) | (if (votes(b) >= 0) 1L else 0L); b += 1 }
    acc
  }

  def simhash64Data(text: UTF8String): Long = simhash64(text.toString)

  /** Lowercased whitespace tokens as one kernel call — the fused form
    * of `transform(tokens(text), t => lower(t))` (CodegenFallback,
    * interpreted per TOKEN). Same trimSpaces + whitespace split, SQL
    * `lower` per token via UTF8String.toLowerCase. */
  def lowerTokensData(text: UTF8String): ArrayData = {
    val toks = Whitespace.split(trimSpaces(text.toString), -1)
    val out = new Array[Any](toks.length)
    var i = 0
    while (i < toks.length) {
      out(i) = UTF8String.fromString(toks(i)).toLowerCase
      i += 1
    }
    new GenericArrayData(out)
  }

  /** Distinct word k-shingles of a text (insertion order, like
    * array_distinct over the shingle transform). */
  def distinctShingles(text: String, k: Int): Array[String] = {
    val toks = Whitespace.split(trimSpaces(text), -1)
    val n = math.max(toks.length - k, 0)
    val seen = new java.util.LinkedHashSet[String]()
    var i = 0
    while (i <= n) {
      val sb = new java.lang.StringBuilder()
      var j = i
      val end = math.min(i + k, toks.length)
      while (j < end) {
        if (j > i) sb.append(' ')
        sb.append(toks(j))
        j += 1
      }
      seen.add(sb.toString)
      i += 1
    }
    seen.toArray(new Array[String](seen.size))
  }

  /** Hashing-trick TF vector: lowercased whitespace tokens hash to
    * `dims` buckets via the first 4 md5 bytes as an unsigned int (the
    * exact value of `conv(substring(md5(t), 1, 8), 16, 10) % dims`,
    * which the SQL oracles replicate); vector[b] = token count in
    * bucket b as f32. One pass over tokens + one output array —
    * O(tokens + dims) — where the builtin column composition
    * (transform over sequence(0, dims-1) with a filter per bucket) is
    * O(tokens * dims) and capped dims in practice. Lowercasing goes
    * through UTF8String.toLowerCase, bit-identical to the `lower()`
    * builtin on any input. */
  def hashingTf(text: UTF8String, dims: Int): Array[Float] = {
    val md = java.security.MessageDigest.getInstance("MD5")
    val toks = Whitespace.split(trimSpaces(text.toString), -1)
    val out = new Array[Float](dims)
    var i = 0
    while (i < toks.length) {
      val t = UTF8String.fromString(toks(i)).toLowerCase
      val d = md.digest(t.getBytes)
      val v = ((d(0) & 0xFFL) << 24) | ((d(1) & 0xFFL) << 16) |
        ((d(2) & 0xFFL) << 8) | (d(3) & 0xFFL)
      out((v % dims).toInt) += 1.0f
      md.reset()
      i += 1
    }
    out
  }

  def hashingTfData(text: UTF8String, dims: Int): ArrayData =
    org.apache.spark.sql.catalyst.expressions.UnsafeArrayData
      .fromPrimitiveArray(hashingTf(text, dims))

  /** MinHash signature over the distinct shingles: component j = min
    * md5("j:" + shingle).
    *
    * The digest STREAM is unchanged ("j:" bytes then shingle bytes =
    * UTF-8 of the concatenation), but each shingle is encoded once and
    * fed to all components, minimums compare raw 16-byte digests
    * (unsigned-lex ≡ hex-string order, both are nibble-monotonic), and
    * only the numHashes winners get hex-encoded — the md5("j:"||shingle)
    * DuckDB oracle replicates this bit-for-bit. Measured ~2.4x over the
    * string-per-(j,shingle) version on the gate's 100k-doc pipeline. */
  def minhashSignature(text: String, k: Int, numHashes: Int): Array[String] = {
    val sh = distinctShingles(text, k)
    val md = java.security.MessageDigest.getInstance("MD5")
    val prefixes = Array.tabulate(numHashes)(j => (j.toString + ":").getBytes("UTF-8"))
    val best = new Array[Array[Byte]](numHashes)
    val buf = new Array[Byte](16)
    var s = 0
    while (s < sh.length) {
      val body = sh(s).getBytes("UTF-8")
      var j = 0
      while (j < numHashes) {
        md.update(prefixes(j))
        md.update(body)
        md.digest(buf, 0, 16) // fills buf and resets md
        if (best(j) == null ||
            java.util.Arrays.compareUnsigned(buf, best(j)) < 0)
          best(j) = buf.clone()
        j += 1
      }
      s += 1
    }
    val sig = new Array[String](numHashes)
    var j = 0
    while (j < numHashes) {
      sig(j) = if (best(j) == null) null else hex(best(j))
      j += 1
    }
    sig
  }

  private def hex(bytes: Array[Byte]): String = {
    val out = new Array[Char](32)
    var i = 0
    while (i < 16) {
      out(2 * i) = HexDigits((bytes(i) >> 4) & 0xF)
      out(2 * i + 1) = HexDigits(bytes(i) & 0xF)
      i += 1
    }
    new String(out)
  }

  /** LSH band keys of the signature: md5("b:" + rows joined by '|'). */
  def minhashBandKeys(text: String, k: Int, numHashes: Int, bands: Int): Array[String] = {
    require(numHashes % bands == 0, "numHashes must be divisible by bands")
    val rows = numHashes / bands
    val sig = minhashSignature(text, k, numHashes)
    val md = java.security.MessageDigest.getInstance("MD5")
    val out = new Array[String](bands)
    var b = 0
    while (b < bands) {
      val sb = new java.lang.StringBuilder(b.toString).append(':')
      var r = 0
      while (r < rows) {
        if (r > 0) sb.append('|')
        sb.append(sig(b * rows + r))
        r += 1
      }
      out(b) = md5Hex(md, sb.toString)
      b += 1
    }
    out
  }

  /** FAST MinHash band keys: MurmurHash3 (scala stdlib) + a SplitMix
    * finalizer instead of md5 — the production operating point
    * (measured 2.1x at numHashes=8, 3.5x at the standard 128, where
    * the md5 spec path computes numHashes digests per shingle; the
    * residual cost both paths share is shingle-string construction).
    * Candidates still get EXACT-Jaccard verification
    * downstream, so hash quality only affects recall, never pair
    * correctness. NOT oracle-replicable (DuckDB has no MurmurHash3),
    * which is why the md5 path remains the gate spec. */
  def minhashBandKeysFast(text: String, k: Int, numHashes: Int,
      bands: Int): Array[Long] = {
    require(numHashes % bands == 0, "numHashes must be divisible by bands")
    val sh = distinctShingles(text, k)
    val rows = numHashes / bands
    val sig = new Array[Int](numHashes)
    var j = 0
    while (j < numHashes) {
      var best = Int.MaxValue
      var s = 0
      while (s < sh.length) {
        val h = scala.util.hashing.MurmurHash3.stringHash(sh(s), j * 0x9E3779B9 + 1)
        if (h < best) best = h
        s += 1
      }
      sig(j) = best
      j += 1
    }
    val out = new Array[Long](bands)
    var b = 0
    while (b < bands) {
      var acc = 1125899906842597L * (b + 1)
      var r = 0
      while (r < rows) { acc = acc * 31L + sig(b * rows + r); r += 1 }
      var z = acc + 0x9E3779B97F4A7C15L
      z = (z ^ (z >>> 30)) * 0xBF58476D1CE4E5B9L
      z = (z ^ (z >>> 27)) * 0x94D049BB133111EBL
      out(b) = z ^ (z >>> 31)
      b += 1
    }
    out
  }

  /** UTF8String/ArrayData adapter for codegen. */
  def minhashBandKeysFastData(text: UTF8String, k: Int, numHashes: Int,
      bands: Int): ArrayData =
    new GenericArrayData(minhashBandKeysFast(text.toString, k, numHashes, bands))

  /** UTF8String/ArrayData adapter for codegen. */
  def minhashBandKeysData(text: UTF8String, k: Int, numHashes: Int,
      bands: Int): ArrayData = {
    val keys = minhashBandKeys(text.toString, k, numHashes, bands)
    new GenericArrayData(keys.map(UTF8String.fromString(_)).asInstanceOf[Array[Any]])
  }

  /** UTF8String/ArrayData adapter for codegen. */
  def distinctShinglesData(text: UTF8String, k: Int): ArrayData = {
    val sh = distinctShingles(text.toString, k)
    new GenericArrayData(sh.map(UTF8String.fromString(_)).asInstanceOf[Array[Any]])
  }

  /** Trained-BPE tokens of a text — [[graft.text.Bpe.encodeText]]
    * bridged to the expression layer. */
  def bpeEncodeData(text: UTF8String, model: graft.text.Bpe.Model): ArrayData =
    new GenericArrayData(graft.text.Bpe.encodeText(text.toString, model)
      .map(UTF8String.fromString): Array[Any])

  /** Unicode NFC (canonical composition) of the text. */
  def nfcData(text: org.apache.spark.unsafe.types.UTF8String): org.apache.spark.unsafe.types.UTF8String = {
    val s = text.toString
    val n = java.text.Normalizer.normalize(s, java.text.Normalizer.Form.NFC)
    if (n eq s) text
    else org.apache.spark.unsafe.types.UTF8String.fromString(n)
  }

  /** Deflate-compressed size over raw size of the UTF-8 bytes; 1.0 for
    * empty input. Fresh Deflater per call (no shared state), fixed
    * level, default strategy — deterministic across JVMs. */
  def compressionRatioData(
      text: org.apache.spark.unsafe.types.UTF8String, level: Int): Double = {
    val raw = text.getBytes
    if (raw.isEmpty) return 1.0
    val d = new java.util.zip.Deflater(level, false)
    try {
      d.setInput(raw)
      d.finish()
      val buf = new Array[Byte](8192)
      var total = 0L
      while (!d.finished()) total += d.deflate(buf)
      total.toDouble / raw.length.toDouble
    } finally d.end()
  }

  private val Newline = Pattern.compile("\n")

  /** Fused Gopher keep rule — ONE pass over tokens + one over lines,
    * bit-identical to the builtin-HOF conjunction it replaces
    * ([[graft.text.TextAnalysis.gopherKeepReference]]; TextKernelSpec
    * pins equality on the gate corpus and the edge cases). The HOF form
    * re-tokenizes the text once per signal (8x) and every
    * filter/aggregate/array_sort lambda is CodegenFallback, interpreted
    * per ELEMENT; this kernel is O(tokens + lines) with one hash count
    * for the top-token multiplicity instead of an O(n log n)
    * interpreted sort. Signal arithmetic mirrors the builtins exactly:
    * Spark `trim` strips SPACES only, `split` keeps leading empties
    * (limit -1), `length` counts code points, ratios are
    * when(den==0, 0.0) otherwise num.toDouble/den.toDouble, every
    * bound is inclusive. */
  def gopherKeep(text: String, minWords: Int, maxWords: Int): Boolean = {
    val toks = Whitespace.split(trimSpaces(text), -1)
    val n = toks.length
    // (n >= minWords) && (n <= maxWords) && ... — a false word-count
    // bound makes the whole conjunction false, so later signals never
    // matter (they are pure; short-circuit is value-identical)
    if (n < minWords || n > maxWords) return false
    var sumLen = 0L
    var symbol = 0
    var alpha = 0
    var i = 0
    while (i < n) {
      val t = toks(i)
      sumLen += t.codePointCount(0, t.length)
      if (t.indexOf('#') >= 0 || t.contains("...") || t.contains("…"))
        symbol += 1
      var hasAlpha = false
      var j = 0
      while (!hasAlpha && j < t.length) {
        val c = t.charAt(j)
        if ((c >= 'A' && c <= 'Z') || (c >= 'a' && c <= 'z')) hasAlpha = true
        j += 1
      }
      if (hasAlpha) alpha += 1
      i += 1
    }
    def ratio(num: Long, den: Long): Double =
      if (den == 0) 0.0 else num.toDouble / den.toDouble
    val mwl = ratio(sumLen, n)
    if (!(mwl >= 3.0 && mwl <= 10.0)) return false
    if (!(ratio(symbol, n) <= 0.1)) return false
    // non-blank trimmed lines (same trim-spaces-only + keep-empty split
    // as the lines() builtin chain)
    val rawLines = Newline.split(text, -1)
    var nLines = 0
    var bullet = 0
    var ellipsis = 0
    val distinct = new java.util.HashSet[String]()
    i = 0
    while (i < rawLines.length) {
      val l = trimSpaces(rawLines(i))
      if (l.nonEmpty) {
        nLines += 1
        if (l.startsWith("-") || l.startsWith("*") || l.startsWith("•"))
          bullet += 1
        if (l.endsWith("...") || l.endsWith("…")) ellipsis += 1
        distinct.add(l)
      }
      i += 1
    }
    if (!(ratio(bullet, nLines) <= 0.9)) return false
    if (!(ratio(ellipsis, nLines) <= 0.3)) return false
    if (!(ratio(alpha, n) >= 0.8)) return false
    val dupFrac =
      if (nLines == 0) 0.0
      else 1.0 - distinct.size.toDouble / nLines.toDouble
    if (!(dupFrac <= 0.3)) return false
    // top-token fraction: max multiplicity of the LOWERCASED tokens
    // (UTF8String.toLowerCase = the lower() builtin) over n — the same
    // value maxFreqFrac finds as the longest equal run of the sorted
    // array
    val counts = new java.util.HashMap[String, Int](n * 2)
    var best = 0
    i = 0
    while (i < n) {
      val low = UTF8String.fromString(toks(i)).toLowerCase.toString
      val c = counts.merge(low, 1, Integer.sum)
      if (c > best) best = c
      i += 1
    }
    ratio(best, n) <= 0.2
  }

  def gopherKeepData(text: UTF8String, minWords: Int, maxWords: Int): Boolean =
    gopherKeep(text.toString, minWords, maxWords)
}
