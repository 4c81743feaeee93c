package graft

import org.apache.spark.sql.SparkSessionExtensions
import org.apache.spark.sql.catalyst.FunctionIdentifier
import org.apache.spark.sql.catalyst.expressions.{Expression, ExpressionInfo, Literal}
import org.apache.spark.unsafe.types.UTF8String

import graft.core.Metric
import graft.expr._

/** SparkSessionExtensions hook: registers the vector kernels as SQL
  * functions so the engine is usable from pure SQL
  * (`spark.sql("SELECT vec_distance('cosine', a, b) ...")`) and from any
  * Spark Connect-style client that can only speak SQL.
  *
  * Install via config:
  *   spark.sql.extensions=graft.GraftExtensions
  * or programmatically: `GraftExtensions.register(spark)`.
  */
class GraftExtensions extends (SparkSessionExtensions => Unit) {
  override def apply(ext: SparkSessionExtensions): Unit =
    GraftExtensions.functions.foreach { case (name, (info, builder)) =>
      ext.injectFunction((FunctionIdentifier(name), info, builder))
    }
}

object GraftExtensions {

  private def metricCodeOf(e: Expression): Int = e match {
    case Literal(s: UTF8String, _) =>
      val name = s.toString
      if (name == "true_cosine") VectorKernels.TRUE_COSINE_CODE
      else Metric.fromName(name).code
    case Literal(i: Integer, _) => i.intValue()
    case other => throw new IllegalArgumentException(
      s"metric must be a literal string or code, got $other")
  }

  private def intArgOf(e: Expression): Int = e match {
    case Literal(i: Integer, _) => i.intValue()
    case other => throw new IllegalArgumentException(s"expected literal int, got $other")
  }

  private def info(name: String, usage: String): ExpressionInfo =
    new ExpressionInfo("graft", null, name, usage, "")

  /** name -> (info, builder). */
  val functions: Seq[(String, (ExpressionInfo, Seq[Expression] => Expression))] = Seq(
    "vec_distance" -> ((
      info("vec_distance",
        "vec_distance(metric, a, b) - raw metric value between two f32 vectors; metric in l2|l2_squared|cosine|inner_product|negative_inner_product|manhattan|chebyshev|hamming|jaccard|true_cosine"),
      (args: Seq[Expression]) => {
        require(args.length == 3, "vec_distance(metric, a, b)")
        VectorDistance(args(1), args(2), metricCodeOf(args(0)))
      })),
    "vec_normalize" -> ((
      info("vec_normalize", "vec_normalize(mode, v) - mode 0=none 1=l2 2=zscore 3=minmax"),
      (args: Seq[Expression]) => {
        require(args.length == 2, "vec_normalize(mode, v)")
        NormalizeVector(args(1), intArgOf(args(0)))
      })),
    "vec_pack_sign_bits" -> ((
      info("vec_pack_sign_bits", "vec_pack_sign_bits(v) - packed sign words of a f32 vector"),
      (args: Seq[Expression]) => {
        require(args.length == 1, "vec_pack_sign_bits(v)")
        PackSignBits(args.head)
      })),
    "vec_packed_hamming" -> ((
      info("vec_packed_hamming", "vec_packed_hamming(a, b, dims) - Hamming over packed sign words"),
      (args: Seq[Expression]) => {
        require(args.length == 3, "vec_packed_hamming(a, b, dims)")
        PackedHamming(args(0), args(1), intArgOf(args(2)))
      })),
    "vec_packed_asym_dot" -> ((
      info("vec_packed_asym_dot",
        "vec_packed_asym_dot(bits, q) - asymmetric binary dot: sum_i (bit i ? +q[i] : -q[i]) over packed sign words vs a full-precision f32 query"),
      (args: Seq[Expression]) => {
        require(args.length == 2, "vec_packed_asym_dot(bits, q)")
        PackedAsymmetricDot(args(0), args(1))
      })),
    "vec_packed_jaccard" -> ((
      info("vec_packed_jaccard", "vec_packed_jaccard(a, b, dims) - Jaccard over packed sign words"),
      (args: Seq[Expression]) => {
        require(args.length == 3, "vec_packed_jaccard(a, b, dims)")
        PackedJaccard(args(0), args(1), intArgOf(args(2)))
      })),
    "vec_max_sim" -> ((
      info("vec_max_sim", "vec_max_sim(metric, query_vectors, doc_vectors) - ColBERT/MaxSim late-interaction score"),
      (args: Seq[Expression]) => {
        require(args.length == 3, "vec_max_sim(metric, qvecs, dvecs)")
        MaxSim(args(1), args(2), metricCodeOf(args(0)))
      })),
    "vec_pack_f32" -> ((
      info("vec_pack_f32", "vec_pack_f32(v) - f32 vector packed to binary (4 bytes/dim, scan-friendly at-rest layout)"),
      (args: Seq[Expression]) => {
        require(args.length == 1, "vec_pack_f32(v)")
        PackFloats(args.head)
      })),
    "vec_unpack_f32" -> ((
      info("vec_unpack_f32", "vec_unpack_f32(b) - inverse of vec_pack_f32"),
      (args: Seq[Expression]) => {
        require(args.length == 1, "vec_unpack_f32(b)")
        UnpackFloats(args.head)
      })),
    "vec_binary_distance" -> ((
      info("vec_binary_distance", "vec_binary_distance(metric, packed, q) - metric between a vec_pack_f32 binary vector and a f32 query"),
      (args: Seq[Expression]) => {
        require(args.length == 3, "vec_binary_distance(metric, packed, q)")
        BinaryVectorDistance(args(1), args(2), metricCodeOf(args(0)))
      })),
    "vec_pack_bf16" -> ((
      info("vec_pack_bf16", "vec_pack_bf16(v) - f32 vector packed to bf16 binary (2 bytes/dim, round-to-nearest-even; half the scan IO of vec_pack_f32)"),
      (args: Seq[Expression]) => {
        require(args.length == 1, "vec_pack_bf16(v)")
        PackBf16(args.head)
      })),
    "vec_unpack_bf16" -> ((
      info("vec_unpack_bf16", "vec_unpack_bf16(b) - decoded f32 values of a vec_pack_bf16 vector (the rounded corpus)"),
      (args: Seq[Expression]) => {
        require(args.length == 1, "vec_unpack_bf16(b)")
        UnpackBf16(args.head)
      })),
    "vec_bf16_distance" -> ((
      info("vec_bf16_distance", "vec_bf16_distance(metric, packed, q) - metric between a vec_pack_bf16 vector and a f32 query (in-place decode)"),
      (args: Seq[Expression]) => {
        require(args.length == 3, "vec_bf16_distance(metric, packed, q)")
        Bf16VectorDistance(args(1), args(2), metricCodeOf(args(0)))
      })),
    "vec_adc_distance" -> ((
      info("vec_adc_distance", "vec_adc_distance(codes, table, stride) - ADC lookup sum over byte codes: sum_i table[i*stride + codes[i]] (SQ8 stride 256, PQ stride k)"),
      (args: Seq[Expression]) => {
        require(args.length == 3, "vec_adc_distance(codes, table, stride)")
        val stride = args(2) match {
          case org.apache.spark.sql.catalyst.expressions.Literal(v, _) => v.toString.toInt
          case other => throw new IllegalArgumentException(
            s"stride must be an integer literal, got $other")
        }
        AdcDistance(args(0), args(1), stride)
      })),
    // text dedup kernels: banding runnable from pure SQL, so a
    // SQL-only client can generate near-dup candidates engine-side
    "text_distinct_shingles" -> ((
      info("text_distinct_shingles",
        "text_distinct_shingles(text, k) - distinct word k-shingles (whitespace tokens, insertion order)"),
      (args: Seq[Expression]) => {
        require(args.length == 2, "text_distinct_shingles(text, k)")
        DistinctShingles(args(0), intArgOf(args(1)))
      })),
    "text_minhash_bands" -> ((
      info("text_minhash_bands",
        "text_minhash_bands(text, k, num_hashes, bands) - MinHash LSH band keys (md5 spec hash; oracle-replicable)"),
      (args: Seq[Expression]) => {
        require(args.length == 4, "text_minhash_bands(text, k, num_hashes, bands)")
        MinhashBandKeys(args(0), intArgOf(args(1)), intArgOf(args(2)), intArgOf(args(3)))
      })),
    "text_minhash_bands_fast" -> ((
      info("text_minhash_bands_fast",
        "text_minhash_bands_fast(text, k, num_hashes, bands) - MinHash LSH band keys (MurmurHash3 fast hash, long keys)"),
      (args: Seq[Expression]) => {
        require(args.length == 4, "text_minhash_bands_fast(text, k, num_hashes, bands)")
        MinhashBandKeysFast(args(0), intArgOf(args(1)), intArgOf(args(2)), intArgOf(args(3)))
      })),
    "text_compression_ratio" -> ((
      info("text_compression_ratio",
        "text_compression_ratio(text[, level]) - deflate bytes / raw utf8 bytes (1.0 empty): the gibberish/boilerplate quality signal; deterministic at a fixed level (default 6)"),
      (args: Seq[Expression]) => {
        require(args.length == 1 || args.length == 2,
          "text_compression_ratio(text[, level])")
        CompressionRatio(args(0),
          if (args.length == 2) intArgOf(args(1)) else 6)
      })),
    "text_strip_html" -> ((
      info("text_strip_html",
        "text_strip_html(html) - tag-stripped, entity-decoded, whitespace-collapsed text (script/style blocks drop with content)"),
      (args: Seq[Expression]) => {
        require(args.length == 1, "text_strip_html(html)")
        org.apache.spark.sql.graft.Bridge.resolvableExpression(
          graft.text.WebText.stripHtml(
            org.apache.spark.sql.graft.Bridge.column(args(0))))
      })),
    "text_link_density" -> ((
      info("text_link_density",
        "text_link_density(html) - fraction of stripped text chars inside <a> anchors (jusText boilerplate signal)"),
      (args: Seq[Expression]) => {
        require(args.length == 1, "text_link_density(html)")
        org.apache.spark.sql.graft.Bridge.resolvableExpression(
          graft.text.WebText.linkDensity(
            org.apache.spark.sql.graft.Bridge.column(args(0))))
      })),
    "url_host" -> ((
      info("url_host",
        "url_host(url) - lowercased host (userinfo/port stripped; '' when unparseable)"),
      (args: Seq[Expression]) => {
        require(args.length == 1, "url_host(url)")
        org.apache.spark.sql.graft.Bridge.resolvableExpression(
          graft.text.WebText.urlHost(
            org.apache.spark.sql.graft.Bridge.column(args(0))))
      })),
    "url_domain" -> ((
      info("url_domain",
        "url_domain(url) - registered domain (eTLD+1, built-in multi-label suffix set): the per-domain cap / domain-mix unit"),
      (args: Seq[Expression]) => {
        require(args.length == 1, "url_domain(url)")
        org.apache.spark.sql.graft.Bridge.resolvableExpression(
          graft.text.WebText.urlDomain(
            org.apache.spark.sql.graft.Bridge.column(args(0))))
      })),
    "url_canonicalize" -> ((
      info("url_canonicalize",
        "url_canonicalize(url) - canonical dedup key: www/userinfo/port/fragment/tracking-params stripped, params sorted, trailing slash normalized (lower(url) fallback when unparseable)"),
      (args: Seq[Expression]) => {
        require(args.length == 1, "url_canonicalize(url)")
        org.apache.spark.sql.graft.Bridge.resolvableExpression(
          graft.text.WebText.urlCanonicalize(
            org.apache.spark.sql.graft.Bridge.column(args(0))))
      })),
    "url_path" -> ((
      info("url_path",
        "url_path(url) - path component, query/fragment dropped ('/' when empty)"),
      (args: Seq[Expression]) => {
        require(args.length == 1, "url_path(url)")
        org.apache.spark.sql.graft.Bridge.resolvableExpression(
          graft.text.WebText.urlPath(
            org.apache.spark.sql.graft.Bridge.column(args(0))))
      })),
    "text_nfc" -> ((
      info("text_nfc",
        "text_nfc(text) - Unicode NFC canonical composition (JDK Normalizer; DuckDB nfc_normalize twin)"),
      (args: Seq[Expression]) => {
        require(args.length == 1, "text_nfc(text)")
        graft.expr.NfcNormalize(args(0))
      })),
    "text_hashing_tf" -> ((
      info("text_hashing_tf",
        "text_hashing_tf(text, dims) - hashing-trick TF vector: lowercased whitespace tokens md5-hash to dims buckets, f32 counts (embedding-free content vector)"),
      (args: Seq[Expression]) => {
        require(args.length == 2, "text_hashing_tf(text, dims)")
        HashingTf(args(0), intArgOf(args(1)))
      })))

  /** Programmatic registration on an existing session. */
  def register(spark: org.apache.spark.sql.SparkSession): Unit =
    functions.foreach { case (name, (_, builder)) =>
      spark.sessionState.functionRegistry.createOrReplaceTempFunction(
        name, builder, "built-in")
    }
}
