package graft

import org.apache.spark.sql.functions._

import graft.core.{CollectionConfig, Metric}
import graft.expr.VectorKernels
import graft.functions.VectorFunctions._
import graft.prepare.Prepare
import graft.search.Search

/** Packed-f32 binary layout: lossless roundtrip and search parity with
  * the array<float> path (including through a parquet roundtrip — the
  * at-rest layout the packing exists for). */
class PackedVectorSpec extends SparkSpec {

  private val dims = 48
  private val config = CollectionConfig("packed", dims, Metric.Cosine)

  private def corpus(n: Int) =
    Prepare.prepareEmbeddings(embeddingRows(
      (0 until n).map(i => i.toString -> Bench.synthVector(i.toLong, dims))), config)

  test("kernel roundtrip is bit-exact, including NaN/Inf and odd dims") {
    val vs = Seq(
      Array(1.5f, -2.25f, Float.MinPositiveValue, 0.0f, -0.0f),
      Array(Float.NaN, Float.PositiveInfinity, Float.NegativeInfinity),
      Array.tabulate(129)(i => (i * 0.37f) - 20f))
    vs.foreach { v =>
      val back = VectorKernels.unpackFloats(VectorKernels.packFloats(v))
      assert(back.length === v.length)
      v.indices.foreach(i =>
        assert(java.lang.Float.floatToRawIntBits(back(i)) ===
          java.lang.Float.floatToRawIntBits(v(i))))
    }
  }

  test("distanceBytes matches distance bit-for-bit for codes 0..4") {
    val a = Bench.synthVector(7L, dims)
    val q = Bench.synthVector(-3L, dims)
    val packed = VectorKernels.packFloats(a)
    (0 to 4).foreach { code =>
      assert(VectorKernels.distanceBytes(code, packed, q) ===
        VectorKernels.distance(code, a, q), s"code $code")
    }
    // fallback codes go through unpack
    assert(VectorKernels.distanceBytes(5, packed, q) ===
      VectorKernels.distance(5, a, q))
  }

  test("packF32/unpackF32 column roundtrip preserves the vector") {
    val df = corpus(32).select(col("id"), col("vector"),
      unpackF32(packF32(col("vector"))).as("back"))
    assert(df.filter(col("vector") =!= col("back")).isEmpty)
  }

  test("flatSearchPacked == flatSearch on cached frames (cosine, l2, ip)") {
    val coll = corpus(500)
    val packed = Prepare.withPackedVector(coll)
      .drop("vector", "vectors", "binary_vector")
    val q = Bench.synthVector(-1L, dims)
    Seq(
      config,
      config.copy(metric = Metric.L2, normalize = Some(graft.core.Normalize.None)),
      config.copy(metric = Metric.InnerProduct, normalize = Some(graft.core.Normalize.None))
    ).foreach { cfg =>
      val exact = Search.flatSearch(coll, cfg, q, 20).collect()
      val viaBytes = Search.flatSearchPacked(packed, cfg, q, 20).collect()
      assert(exact.map(_.getString(0)).toSeq === viaBytes.map(_.getString(0)).toSeq)
      assert(exact.map(_.getDouble(2)).toSeq === viaBytes.map(_.getDouble(2)).toSeq,
        cfg.metric.name)
    }
  }

  test("packed snapshot reloads and serves flatSearchPacked directly") {
    val path = "/tmp/graft_packed_snapshot"
    val coll = corpus(200)
    graft.store.CollectionStore.snapshot(coll, config, path, packed = true)
    val (loaded, cfg) = graft.store.CollectionStore.load(spark, path)
    assert(loaded.columns.contains("vector_f32"))
    val q = Bench.synthVector(-5L, dims)
    val exact = Search.flatSearch(coll, cfg, q, 10).collect()
    val packedRes = Search.flatSearchPacked(loaded, cfg, q, 10).collect()
    assert(exact.map(_.getString(0)).toSeq === packedRes.map(_.getString(0)).toSeq)
    assert(exact.map(_.getDouble(2)).toSeq === packedRes.map(_.getDouble(2)).toSeq)
  }

  test("parity survives a parquet roundtrip of the packed layout") {
    val path = "/tmp/graft_packed_spec"
    Prepare.withPackedVector(corpus(300))
      .select("id", "value", "vector_f32")
      .write.mode("overwrite").parquet(path)
    val onDisk = spark.read.parquet(path)
    val q = Bench.synthVector(-9L, dims)
    val exact = Search.flatSearch(corpus(300), config, q, 10).collect()
    val viaDisk = Search.flatSearchPacked(onDisk, config, q, 10).collect()
    assert(exact.map(_.getString(0)).toSeq === viaDisk.map(_.getString(0)).toSeq)
    assert(exact.map(_.getDouble(2)).toSeq === viaDisk.map(_.getDouble(2)).toSeq)
  }
}
