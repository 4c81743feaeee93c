package graft

import graft.core.{Metric, ScoreMode}
import graft.expr.VectorKernels

/** Scalar-kernel semantics vs independent oracles (reference test layer 1:
  * distances.rs #[cfg(test)] / FIXTURES §8). */
class KernelSpec extends SparkSpec {

  private def d(code: Int, a: Array[Float], b: Array[Float]): Double =
    VectorKernels.distance(code, a, b)

  test("basic metric values on axis vectors") {
    val x = Array(1.0f, 0.0f); val y = Array(0.0f, 1.0f)
    assert(d(0, x, y) === math.sqrt(2.0)) // l2
    assert(d(1, x, y) === 2.0)            // l2_squared
    assert(d(3, x, y) === 0.0)            // inner_product
    assert(d(4, x, y) === -0.0 || d(4, x, y) === 0.0)
    assert(d(5, x, y) === 2.0)            // manhattan
    assert(d(6, x, y) === 1.0)            // chebyshev
  }

  test("truthy hamming / jaccard semantics (distances.rs:319-347)") {
    val a = Array(1.0f, 0.0f, 2.0f, 0.0f)
    val b = Array(0.0f, 0.0f, 5.0f, 1.0f)
    // truthiness differs at idx 0 and 3
    assert(d(7, a, b) === 2.0)
    // union = {0,2,3}, intersection = {2} -> 1 - 1/3
    assert(math.abs(d(8, a, b) - (1.0 - 1.0 / 3.0)) < 1e-15)
    // empty union -> 0.0
    assert(d(8, Array(0f, 0f), Array(0f, 0f)) === 0.0)
  }

  test("true cosine: zero vector -> 0, clamp to [-1,1]") {
    assert(d(9, Array(0f, 0f), Array(1f, 0f)) === 0.0)
    assert(d(9, Array(1f, 0f), Array(-1f, 0f)) === -1.0)
    val c = d(9, Array(1f, 1f), Array(1f, 1f))
    assert(c <= 1.0 && c > 1.0 - 1e-14) // clamped at 1, fp rounding below
  }

  test("f64 overflow recovery: cancelling dot of f32::MAX terms is 0") {
    val big = Float.MaxValue
    assert(d(3, Array(big, big), Array(2f, -2f)) === 0.0)
    // l2 of 1e20 difference is representable in double
    assert(d(0, Array(1e20f), Array(0f)) === 1.0000000200408773e20)
  }

  test("sign packing and bit63 (distances.rs:413-423)") {
    val v = Array.fill(64)(-1.0f); v(63) = 1.0f
    assert(VectorKernels.packSignBits(v).toSeq === Seq(Long.MinValue))
    val v2 = Array.fill(64)(1.0f)
    assert(VectorKernels.packSignBits(v2).toSeq === Seq(-1L))
    // zero counts as non-negative
    assert(VectorKernels.packSignBits(Array(0.0f)).toSeq === Seq(1L))
  }

  test("packed hamming/jaccard word-boundary masking (FIXTURES §8)") {
    for (dims <- Seq(1, 63, 64, 65, 127, 128, 129)) {
      val a = Array.fill(dims)(1.0f)
      val b = Array.fill(dims)(-1.0f)
      val pa = VectorKernels.packSignBits(a)
      val pb = VectorKernels.packSignBits(b)
      import org.apache.spark.sql.catalyst.util.GenericArrayData
      val ham = VectorKernels.packedHamming(
        new GenericArrayData(pa), new GenericArrayData(pb), dims)
      assert(ham === dims.toDouble, s"dims=$dims")
      // flip padding bits of the last word: must not change the result
      if (dims % 64 != 0) {
        val pbPadded = pb.clone()
        pbPadded(pb.length - 1) |= ~((1L << (dims % 64)) - 1)
        val ham2 = VectorKernels.packedHamming(
          new GenericArrayData(pa), new GenericArrayData(pbPadded), dims)
        assert(ham2 === dims.toDouble, s"padding leak at dims=$dims")
      }
    }
  }

  test("asymmetric binary dot: sign-weighted query sum, word boundaries, exactness") {
    // hand-checked: bits of (+,-,+) weight q as (+1,-1,+1)
    val bits = VectorKernels.packSignBits(Array(1.0f, -2.0f, 3.0f))
    assert(VectorKernels.packedAsymmetricDot(bits, Array(10f, 20f, 30f)) === 10.0 - 20.0 + 30.0)
    // equals the naive sum across word boundaries (dims 1..129),
    // including non-multiple-of-64 tails
    for (dims <- Seq(1, 63, 64, 65, 127, 128, 129)) {
      val v = Array.tabulate(dims)(i => (if (i % 3 == 0) -1 else 1) * (i + 1).toFloat)
      val q = Array.tabulate(dims)(i => math.sin(i * 0.37).toFloat)
      val expected = v.indices.foldLeft(0.0)((acc, i) =>
        acc + (if (v(i) >= 0) q(i).toDouble else -q(i).toDouble))
      val got = VectorKernels.packedAsymmetricDot(VectorKernels.packSignBits(v), q)
      assert(got === expected, s"dims=$dims")
    }
    // wrong word count fails loudly, not silently
    intercept[IllegalArgumentException] {
      VectorKernels.packedAsymmetricDot(Array(0L), new Array[Float](65))
    }
  }

  test("normalize: zero/constant vectors stay zero (distances.rs:350-410)") {
    assert(VectorKernels.normalize(1, Array(0f, 0f)).toSeq === Seq(0f, 0f))
    assert(VectorKernels.normalize(2, Array(5f, 5f, 5f)).toSeq === Seq(0f, 0f, 0f))
    assert(VectorKernels.normalize(3, Array(5f, 5f)).toSeq === Seq(0f, 0f))
    val n = VectorKernels.normalize(1, Array(3f, 4f))
    assert(n.toSeq === Seq(0.6f, 0.8f))
  }

  test("rank/similarity/result-value semantics (SURVEY §2.8)") {
    assert(Metric.rankValue(Metric.Cosine, 0.9) === 1.0 - 0.9)
    assert(Metric.rankValue(Metric.InnerProduct, 2.5) === -2.5)
    assert(Metric.rankValue(Metric.L2, 1.5) === 1.5)
    assert(Metric.similarityValue(Metric.L2, 3.0) === 0.25)
    assert(Metric.similarityValue(Metric.NegativeInnerProduct, 2.0) === -2.0)
    // negative_inner_product special case: same pair in BOTH modes
    assert(ScoreMode.resultValues(Metric.NegativeInnerProduct, 2.0, ScoreMode.Raw) === ((-2.0, Some(2.0))))
    assert(ScoreMode.resultValues(Metric.NegativeInnerProduct, 2.0, ScoreMode.Similarity) === ((-2.0, Some(2.0))))
    assert(ScoreMode.resultValues(Metric.Cosine, 0.5, ScoreMode.Similarity) === ((0.75, Some(0.5))))
    assert(ScoreMode.resultValues(Metric.L2, 3.0, ScoreMode.Raw) === ((-3.0, Some(3.0))))
    assert(ScoreMode.resultValues(Metric.L2, 3.0, ScoreMode.Similarity) === ((0.25, Some(3.0))))
  }

  test("metric aliases (collection.ex:1300-1304)") {
    assert(Metric.fromName("euclidean") === Metric.L2)
    assert(Metric.fromName("dot") === Metric.InnerProduct)
    assert(Metric.fromName("dot_product") === Metric.InnerProduct)
    assert(Metric.all.map(_.code) === (0 to 8))
  }

  test("fused hashing-TF kernel == builtin column composition, mixed case and unicode") {
    import org.apache.spark.sql.functions._
    import graft.text.TextAnalysis
    val texts = Seq(
      "The Quick BROWN fox jumps Over the lazy DOG the the",
      "  leading and trailing   spaces  ",
      "one", "", "   ",
      "MiXeD CaSe ÄÖÜ Émigré ÉMIGRÉ émigré",
      "repeat repeat repeat 12345 !?")
    import spark.implicits._
    val df = texts.zipWithIndex.map { case (t, i) => (i.toString, t) }
      .toDF("id", "text")
    for (dims <- Seq(1, 7, 64, 257)) {
      val rows = df.select(col("id"),
        TextAnalysis.hashingTfVector(col("text"), dims).as("fused"),
        graft.text.TextAnalysis.hashingTfVectorReference(col("text"), dims).as("ref"))
        .collect()
      rows.foreach { r =>
        assert(r.getSeq[Float](1) === r.getSeq[Float](2),
          s"dims=$dims id=${r.getString(0)}")
      }
    }
  }

  test("fused gopher keep == builtin conjunction (edge cases + gate corpus)") {
    import org.apache.spark.sql.functions._
    import graft.text.TextAnalysis
    import spark.implicits._
    val edge = Seq(
      "", "   ", "\t\n", "one",
      "- bullet\n- bullet\n- bullet\nprose line here",
      "trailing ellipsis line...\nanother…\nplain",
      "dup line\ndup line\ndup line\nother",
      "the the the the the the the the the the",        // top-token heavy
      "Wort " * 30 + "### ### ###",                     // symbol tokens
      "ÄÖÜ Émigré ÉMIGRÉ émigré " * 10,                 // unicode lower
      "a b c d e f g h i j k l m n o p q r s t u v",    // short words
      "longwordlongwordlongword " * 25,                 // long words
      ("valid prose with sensible words here okay " * 5) + "\nline\nline")
    val dfE = edge.zipWithIndex.map { case (t, i) => (i.toString, t) }
      .toDF("id", "text")
    val docs = spark.read.parquet("/root/testdata/sf0.001/documents.parquet")
      .select(col("doc_id").cast("string").as("id"), col("text"))
      .union(dfE)
    for (minW <- Seq(0, 5, 20)) {
      val rows = docs.select(col("id"),
        TextAnalysis.gopherKeep(col("text"), minWords = minW).as("fused"),
        TextAnalysis.gopherKeepReference(col("text"), minWords = minW).as("ref"))
        .collect()
      rows.foreach { r =>
        assert(r.getBoolean(1) === r.getBoolean(2), s"id=${r.getString(0)} minW=$minW")
      }
    }
    // null text: both forms are null -> filter drops the row
    val nulls = Seq(("n1", null: String)).toDF("id", "text")
    assert(nulls.filter(TextAnalysis.gopherKeep(col("text"), 0)).count() === 0)
    assert(nulls.filter(TextAnalysis.gopherKeepReference(col("text"), 0)).count() === 0)
  }

  test("fused minhash band keys == column-composed pipeline") {
    import org.apache.spark.sql.functions._
    import graft.text.TextAnalysis
    val texts = Seq(
      "the quick brown fox jumps over the lazy dog",
      "  leading and trailing   spaces  ",
      "\ttabs\nand newlines inside\t",
      "one",
      "two words",
      "",
      "   ",
      "repeat repeat repeat repeat repeat")
    import spark.implicits._
    val df = texts.zipWithIndex.map { case (t, i) => (i.toString, t) }
      .toDF("id", "text")
    for ((k, n, b) <- Seq((3, 8, 4), (2, 6, 3), (1, 4, 2))) {
      val cols = df.select(col("id"),
        TextAnalysis.minhashBands(
          TextAnalysis.minhashSignature(col("text"), k, n), b, n / b).as("a"),
        TextAnalysis.minhashBandKeys(col("text"), k, n, b).as("f"))
        .collect()
      cols.foreach { r =>
        assert(r.getSeq[String](1) === r.getSeq[String](2),
          s"id=${r.getString(0)} k=$k n=$n b=$b")
      }
    }
  }
}
