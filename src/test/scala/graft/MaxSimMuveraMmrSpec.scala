package graft

import graft.core.{CollectionConfig, Metric}
import graft.encode.Muvera
import graft.expr.VectorKernels
import graft.rerank.Mmr
import graft.search.Search
import graft.prepare.Prepare

/** MaxSim (FIXTURES §3), MUVERA (FIXTURES §5), MMR (reference doctest). */
class MaxSimMuveraMmrSpec extends SparkSpec {

  private val docFixture = Seq(
    "both_axes" -> Seq(Array(1f, 0f), Array(0f, 1f)),
    "x_axis" -> Seq(Array(1f, 0f), Array(1f, 0f)),
    "one_axis" -> Seq(Array(1f, 0f), Array(-1f, 0f)),
    "weak" -> Seq(Array(0.2f, 0f), Array(0f, 0.2f)),
    "opposite" -> Seq(Array(-1f, 0f), Array(0f, -1f)))
  private val queryVecs = Seq(Array(1f, 0f), Array(0f, 1f))

  test("MaxSim scores on the document fixture (FIXTURES §3)") {
    val config = CollectionConfig("mv", 2, Metric.InnerProduct)
    val coll = Prepare.prepareEmbeddings(multiVectorRows(docFixture), config)
    val res = Search.multiVectorSearch(coll, config, queryVecs, 5).collect()
    val scores = res.map(r => r.getString(0) -> r.getDouble(2)).toMap
    assert(scores("both_axes") === 2.0)
    assert(scores("x_axis") === 1.0)
    assert(scores("one_axis") === 1.0)
    assert(math.abs(scores("weak") - 0.4) < 1e-6)
    assert(scores("opposite") === 0.0) // max picks the 0-dot vector per query
    // descending score, ties by ascending id: one_axis before x_axis
    assert(res.map(_.getString(0)).toSeq ===
      Seq("both_axes", "one_axis", "x_axis", "weak", "opposite"))
    // distance is null for multi-vector results (collection.ex:807-817)
    assert(res.forall(_.isNullAt(3)))
  }

  test("MaxSim empty sides -> 0.0 (multi_vector.rs:46-62)") {
    import org.apache.spark.sql.catalyst.util.GenericArrayData
    val empty = new GenericArrayData(Array.empty[Any])
    val docs = new GenericArrayData(Array[Any](new GenericArrayData(Array(1.0f, 0.0f))))
    assert(VectorKernels.maxSim(3, empty, docs) === 0.0)
    assert(VectorKernels.maxSim(3, docs, empty) === 0.0)
  }

  test("MUVERA identity projection: query sums, document averages (FIXTURES §5)") {
    val cfg = Muvera.Config(dimension = 2, numRepetitions = 1,
      numSimhashProjections = 0, seed = 42L)
    val vs = Seq(Array(1f, 0f), Array(0f, 1f))
    assert(Muvera.encode(vs, cfg, Muvera.QueryMode).toSeq === Seq(1.0f, 1.0f))
    assert(Muvera.encode(vs, cfg, Muvera.DocumentMode).toSeq === Seq(0.5f, 0.5f))
  }

  test("MUVERA determinism, permutation sensitivity of doc mode, seed sensitivity") {
    val cfg = Muvera.Config(dimension = 2, numRepetitions = 4,
      numSimhashProjections = 1, seed = 13L)
    val vs = Seq(Array(0.3f, -0.7f), Array(0.9f, 0.1f), Array(-0.5f, 0.4f))
    val a = Muvera.encode(vs, cfg, Muvera.QueryMode)
    val b = Muvera.encode(vs, cfg, Muvera.QueryMode)
    assert(a.toSeq === b.toSeq)
    // query mode (sum) is permutation invariant
    val perm = Muvera.encode(vs.reverse, cfg, Muvera.QueryMode)
    assert(a.zip(perm).forall { case (x, y) => math.abs(x - y) < 1e-5f })
    // different seed -> different encoding
    val other = Muvera.encode(vs, cfg.copy(seed = 14L), Muvera.QueryMode)
    assert(a.toSeq !== other.toSeq)
    // output size = reps * partitions * dim
    assert(a.length === 4 * 2 * 2)
  }

  test("MUVERA recall subset: FDE top-3 contains exact MaxSim top-2 (FIXTURES §5)") {
    val cfg = Muvera.Config(dimension = 2, numRepetitions = 4,
      numSimhashProjections = 1, projectionDimension = 2, seed = 13L)
    val qfde = Muvera.encode(queryVecs, cfg, Muvera.QueryMode)
    val scored = docFixture.map { case (id, vs) =>
      val dfde = Muvera.encode(vs, cfg, Muvera.DocumentMode)
      id -> VectorKernels.distance(3, qfde, dfde)
    }.sortBy { case (id, s) => (-s, id) }
    val top3 = scored.take(3).map(_._1).toSet
    // exact MaxSim top-2 = both_axes (2.0), one_axis (1.0, tie id order)
    assert(top3.contains("both_axes"))
    assert(top3.contains("one_axis") || top3.contains("x_axis"))
  }

  test("MUVERA config validation (muvera.ex:83-151)") {
    intercept[IllegalArgumentException] {
      Muvera.encode(Seq(Array(1f, 0f)),
        Muvera.Config(dimension = 2, numSimhashProjections = 31), Muvera.QueryMode)
    }
    intercept[IllegalArgumentException] {
      Muvera.encode(Seq.empty, Muvera.Config(dimension = 2), Muvera.QueryMode)
    }
    intercept[IllegalArgumentException] {
      Muvera.encode(Seq(Array(1f)), Muvera.Config(dimension = 2), Muvera.QueryMode)
    }
  }

  test("MUVERA count-sketch final projection changes size deterministically") {
    val cfg = Muvera.Config(dimension = 4, numRepetitions = 2,
      numSimhashProjections = 2, seed = 7L, finalProjectionDimension = Some(8))
    val vs = Seq(Array(0.1f, 0.2f, 0.3f, 0.4f), Array(-0.4f, 0.3f, -0.2f, 0.1f))
    val a = Muvera.encode(vs, cfg, Muvera.DocumentMode)
    assert(a.length === 8)
    assert(a.toSeq === Muvera.encode(vs, cfg, Muvera.DocumentMode).toSeq)
  }

  test("MMR doctest: diversity beats redundancy (vettore_distance.ex:313-323)") {
    val initial = Seq("a" -> 0.9, "b" -> 0.8, "c" -> 0.1)
    val vectors = Map(
      "a" -> Array(1.0f, 0.0f), "b" -> Array(1.0f, 0.0f), "c" -> Array(0.0f, 1.0f))
    val out = Mmr.rerank(initial, vectors, Metric.Cosine, 0.5, 2)
    assert(out === Seq("a" -> 0.9, "c" -> 0.1))
  }

  test("MMR alpha=1 is pure relevance order; validation rejects bad input") {
    val initial = Seq("a" -> 0.9, "b" -> 0.8, "c" -> 0.1)
    val vectors = Map(
      "a" -> Array(1.0f, 0.0f), "b" -> Array(1.0f, 0.0f), "c" -> Array(0.0f, 1.0f))
    assert(Mmr.rerank(initial, vectors, Metric.Cosine, 1.0, 3).map(_._1) ===
      Seq("a", "b", "c"))
    intercept[IllegalArgumentException] {
      Mmr.rerank(Seq("a" -> 0.9, "a" -> 0.8), vectors, Metric.Cosine, 0.5, 2)
    }
    intercept[IllegalArgumentException] {
      Mmr.rerank(Seq("zz" -> 0.9), vectors, Metric.Cosine, 0.5, 1)
    }
  }

  test("batch MMR: per-query == single (order, scores, positions); facade wired") {
    import spark.implicits._
    import org.apache.spark.sql.functions.col
    // clustered corpus with real redundancy so the diversity term bites:
    // 3 tight direction clusters + an outlier, 2 queries aimed at
    // different clusters
    val dims = 4
    val config = CollectionConfig("mmrb", dims, Metric.Cosine)
    val rnd = new scala.util.Random(11)
    val rows = (0 until 60).map { i =>
      val c = i % 3
      val base = Array.tabulate(dims)(d => if (d == c) 1f else 0f)
      val v = base.map(_ + 0.1f * rnd.nextFloat())
      (s"d$i", s"d$i", v.toSeq)
    }
    val coll = Prepare.prepareEmbeddings(
      rows.toDF("id", "value", "vector"), config)
    val qs = Seq(
      ("q0", Array.tabulate(dims)(d => if (d == 0) 1f else 0.05f).toSeq),
      ("q1", Array.tabulate(dims)(d => if (d == 1) 1f else 0.02f).toSeq))
      .toDF("qid", "qvector")
    val many = Mmr.rerankMany(spark, coll, config, qs, 0.6, 5, 20, knownNq = 2L)
      .collect().groupBy(_.getString(0))
    for ((qid, qv) <- Seq(
        "q0" -> Array.tabulate(dims)(d => if (d == 0) 1f else 0.05f),
        "q1" -> Array.tabulate(dims)(d => if (d == 1) 1f else 0.02f))) {
      val single = Mmr.rerankSearch(spark, coll, config, qv, 0.6, 5, 20)
        .collect().map(r => (r.getString(0), r.getDouble(1), r.getInt(2))).toSeq
      val batch = many(qid).sortBy(_.getInt(3))
        .map(r => (r.getString(1), r.getDouble(2), r.getInt(3))).toSeq
      assert(batch === single, s"batch MMR $qid")
    }
    // facade: GraftDb.rerankMany over the same data
    val db = new graft.api.GraftDb(spark)
    db.createCollection("mmrb", dims, metric = "cosine")
    db.batch("mmrb", rows.map { case (id, _, v) =>
      db.EmbeddingInput(id = id, vector = v.toArray) })
    val fac = db.rerankMany("mmrb", qs, 0.6, 5, candidates = 20, knownNq = 2L)
    assert(fac.select("qid").distinct().count() === 2L)
    assert(fac.groupBy("qid").count().collect().forall(_.getLong(1) === 5L))
    db.close("mmrb")
  }

  test("MMR on long-id collections: single and batch match the string-id runs") {
    import spark.implicits._
    import org.apache.spark.sql.functions.col
    val dims = 4
    val config = CollectionConfig("mmrl", dims, Metric.Cosine)
    val rnd = new scala.util.Random(23)
    val rows = (0 until 50).map { i =>
      val c = i % 3
      val base = Array.tabulate(dims)(d => if (d == c) 1f else 0f)
      (i.toString, i.toString, base.map(_ + 0.1f * rnd.nextFloat()).toSeq)
    }
    val collS = Prepare.prepareEmbeddings(rows.toDF("id", "value", "vector"), config)
    val collL = collS.withColumn("id", col("id").cast("long"))
      .withColumn("value", col("value"))
    val qv = Array.tabulate(dims)(d => if (d == 0) 1f else 0.05f)
    val singleS = Mmr.rerankSearch(spark, collS, config, qv, 0.6, 5, 20)
      .collect().map(r => (r.getString(0), r.getDouble(1), r.getInt(2)))
    val singleL = Mmr.rerankSearch(spark, collL, config, qv, 0.6, 5, 20)
      .collect().map(r => (r.getLong(0).toString, r.getDouble(1), r.getInt(2)))
    assert(singleL.toSeq === singleS.toSeq)
    val qs = Seq(("q0", qv.toSeq)).toDF("qid", "qvector")
    val manyL = Mmr.rerankMany(spark, collL, config, qs, 0.6, 5, 20, knownNq = 1L)
    assert(manyL.schema("id").dataType ===
      org.apache.spark.sql.types.LongType)
    val batchL = manyL.collect().sortBy(_.getInt(3))
      .map(r => (r.getLong(1).toString, r.getDouble(2), r.getInt(3)))
    assert(batchL.toSeq === singleS.toSeq)
  }

  test("batch MaxSim: per-query == single; empty batch keeps the result schema") {
    import spark.implicits._
    val config = CollectionConfig("mv", 4, Metric.InnerProduct)
    val docs = Seq(
      ("a", "a", Seq(1f, 0f, 0f, 0f), Seq(Seq(1f, 0f, 0f, 0f), Seq(0f, 1f, 0f, 0f))),
      ("b", "b", Seq(0f, 1f, 0f, 0f), Seq(Seq(0f, 1f, 0f, 0f))),
      ("c", "c", Seq(0f, 0f, 1f, 0f), Seq(Seq(0f, 0f, 1f, 0f), Seq(0f, 0f, 0f, 1f))))
      .toDF("id", "value", "vector", "vectors")
    val qsets = Seq(
      "q0" -> Seq(Array(1f, 0f, 0f, 0f)),
      "q1" -> Seq(Array(0f, 0f, 1f, 0f), Array(0f, 1f, 0f, 0f)))
    val qdf = qsets.map { case (q, vs) => (q, vs.map(_.toSeq)) }
      .toDF("qid", "qvectors")
    val many = Search.multiVectorSearchMany(docs, config, qdf, 2)
      .collect().groupBy(_.getString(0))
    for ((qid, vs) <- qsets) {
      val single = Search.multiVectorSearch(docs, config, vs, 2)
        .collect().map(r => (r.getString(0), r.getDouble(2))).toSet
      assert(many(qid).map(r => (r.getString(1), r.getDouble(3))).toSet === single,
        s"batch MaxSim $qid")
    }
    val empty = Seq.empty[(String, Seq[Seq[Float]])].toDF("qid", "qvectors")
    val out = Search.multiVectorSearchMany(docs, config, empty, 2)
    assert(out.count() === 0L)
    assert(out.columns.toSeq ===
      Seq("qid", "id", "value", "score", "distance", "metric", "metadata"))
  }
}
