package graft

import org.apache.spark.sql.functions._
import org.apache.spark.unsafe.types.UTF8String

import graft.core.{CollectionConfig, Metric, Normalize}
import graft.expr.TopKHeap
import graft.search.Search

/** The heap cut's bit-exactness contract: [[TopKHeap]] must order
  * exactly like `ORDER BY (rank ASC, id ASC)` under Spark SQL's
  * semantics — `-0.0 == 0.0`, NaN last, and BINARY UTF-8 id ties (NOT
  * Java String UTF-16 order, which disagrees beyond the BMP) — so the
  * heap-cut batch plans return hash-identical rows to the window-cut
  * plans they replaced. */
class BatchTopKSpec extends SparkSpec {
  import spark.implicits._

  private def sparkCmp(a: Double, b: Double): Int =
    if (a == b) 0 else java.lang.Double.compare(a, b)

  test("TopKHeap == sort-take under Spark double semantics (NaN, ±0.0, ±inf)") {
    val rnd = new scala.util.Random(7)
    val specials = Array(Double.NaN, 0.0, -0.0, Double.PositiveInfinity,
      Double.NegativeInfinity, 1.0, -1.0)
    for (trial <- 0 until 50; k <- Seq(1, 3, 8)) {
      val n = 1 + rnd.nextInt(40)
      val entries = Array.tabulate(n) { i =>
        val r = if (rnd.nextBoolean()) specials(rnd.nextInt(specials.length))
                else rnd.nextDouble() * 10 - 5
        (r, s"id${rnd.nextInt(12)}%03d$i")
      }
      val heap = new TopKHeap(k)
      entries.foreach { case (r, id) => heap.offer(r, r, UTF8String.fromString(id)) }
      // compare via bit patterns: tuple equality would fail on NaN == NaN
      val got = heap.sorted.map(t =>
        (java.lang.Double.doubleToLongBits(t._3), t._1.toString))
      val want = entries
        .sortWith { case ((r1, i1), (r2, i2)) =>
          val c = sparkCmp(r1, r2)
          c < 0 || (c == 0 && i1.compareTo(i2) < 0) // ASCII ids: UTF8==String order
        }.take(k).map { case (r, id) => (java.lang.Double.doubleToLongBits(r), id) }
      assert(got.toSeq === want.toSeq, s"trial $trial k=$k")
    }
  }

  test("TopKHeap generic ids: long-id heap == sort-take with native ordering; lazy growth reaches k") {
    import graft.expr.BatchTopK
    import org.apache.spark.sql.types.LongType
    val rnd = new scala.util.Random(13)
    val specials = Array(Double.NaN, 0.0, -0.0, Double.PositiveInfinity,
      Double.NegativeInfinity, 1.0, -1.0)
    for (trial <- 0 until 40; k <- Seq(1, 7, 50)) {
      // n > 16 with k = 50 exercises the geometric array growth (cap
      // starts at 16); duplicate ranks force long-id tie-breaks
      val n = 1 + rnd.nextInt(200)
      val entries = Array.tabulate(n) { _ =>
        val r = if (rnd.nextBoolean()) specials(rnd.nextInt(specials.length))
                else rnd.nextInt(5).toDouble // dense ties
        (r, rnd.nextLong() % 1000L)
      }
      val heap = new TopKHeap(k, BatchTopK.idComparator(LongType))
      entries.foreach { case (r, id) =>
        heap.offer(r, r, java.lang.Long.valueOf(id)) }
      val got = heap.sorted.map(t =>
        (java.lang.Double.doubleToLongBits(t._3),
          t._1.asInstanceOf[java.lang.Long].longValue()))
      val want = entries
        .sortWith { case ((r1, i1), (r2, i2)) =>
          val c = sparkCmp(r1, r2)
          c < 0 || (c == 0 && i1 < i2)
        }.take(k).map { case (r, id) => (java.lang.Double.doubleToLongBits(r), id) }
      assert(got.toSeq === want.toSeq, s"trial $trial k=$k")
    }
    // serialization round trip preserves long ids through the agg codec
    val agg = graft.expr.BatchTopKAgg(null, null, 2, 3, 0, LongType)
    val buf = agg.createAggregationBuffer()
    buf(0).offer(1.0, 1.0, java.lang.Long.valueOf(42L))
    buf(1).offer(2.0, 2.0, java.lang.Long.valueOf(-7L))
    val back = agg.deserialize(agg.serialize(buf))
    assert(back(0).sorted.head._1 === java.lang.Long.valueOf(42L))
    assert(back(1).sorted.head._1 === java.lang.Long.valueOf(-7L))
  }

  test("LONG-id corpus: batch flat + MaxSim take the one-scan heap plan (no per-query jobs), native id tie order") {
    import org.apache.spark.scheduler.{SparkListener, SparkListenerJobStart}
    val dims = 4
    val config = CollectionConfig("longid", dims, Metric.InnerProduct,
      normalize = Some(Normalize.None))
    // ids 2 and 10: identical vectors make the id the ONLY tiebreaker —
    // LONG order picks 2 first, string order would pick "10" first
    val docs = (Seq((2L, "a"), (10L, "b")) ++
      (20L until 40L).map(i => (i, s"v$i"))).map { case (id, v) =>
        val vec = if (id == 2L || id == 10L) Seq(1f, 0f, 0f, 0f)
                  else Seq(0.1f, 0.2f, 0.1f * (id % 3), 0f)
        (id, v, vec, Seq(vec))
      }.toDF("id", "value", "vector", "vectors")
    val nq = 32
    val qs = (0 until nq).map(i => (i.toString, Seq(1f, 0f, 0f, 0.01f * i)))
      .toDF("qid", "qvector")
    val qsets = (0 until nq).map(i =>
      (i.toString, Seq(Seq(1f, 0f, 0f, 0.01f * i)))).toDF("qid", "qvectors")
    val jobs = new java.util.concurrent.atomic.AtomicInteger
    val listener = new SparkListener {
      override def onJobStart(js: SparkListenerJobStart): Unit =
        jobs.incrementAndGet()
    }
    // heap plan reachable: the plan itself proves one-scan
    val flat = Search.flatSearchMany(docs, config, qs, 1, knownNq = nq.toLong)
    assert(flat.queryExecution.executedPlan.toString.contains("partial_batch_topk"),
      "long-id flat batch must take the heap plan")
    spark.sparkContext.addSparkListener(listener)
    val (flatRows, msRows) =
      try {
        val f = flat.collect()
        val m = Search.multiVectorSearchMany(docs, config, qsets, 1).collect()
        Thread.sleep(500) // listener bus delivers job-start events async
        (f, m)
      } finally spark.sparkContext.removeSparkListener(listener)
    // job count must not scale with the 32 queries (the old fallback ran
    // one plan per query); one-scan plans need only a handful of jobs
    // (query collect + broadcast builds + final collect, x2 searches)
    assert(jobs.get <= 12, s"expected O(1) jobs for $nq queries, got ${jobs.get}")
    assert(flatRows.length === nq && msRows.length === nq)
    // every query's top-1 is id=2 (LONG tie order, not string order)
    assert(flatRows.forall(_.getLong(1) === 2L),
      "flat batch must break rank ties by NATIVE long id order")
    assert(msRows.forall(_.getLong(1) === 2L),
      "batch MaxSim must break rank ties by NATIVE long id order")
    // and per-query equality with the single forms on the long-id corpus
    val single = Search.flatSearch(docs, config, Array(1f, 0f, 0f, 0f), 1)
      .collect().map(r => (r.getLong(0), r.getDouble(2))).head
    val batchQ0 = flatRows.find(_.getString(0) == "0").get
    assert((batchQ0.getLong(1), batchQ0.getDouble(3)) === single)
  }

  test("window plans drop null id / null vector rows exactly like the heap plans") {
    val dims = 4
    val config = CollectionConfig("nulls", dims, Metric.L2,
      normalize = Some(Normalize.None))
    // 3 scorable rows + a null-id row + a null-vector row; limit ABOVE
    // the scorable count is the exact failure shape: pre-fix the window
    // cut let the null rows fill the empty row_number slots (and a null
    // id sorted FIRST on rank ties, asc = nulls first)
    val rows: Seq[(String, String, Seq[Float])] = Seq(
      ("a", "a", Seq(1f, 0f, 0f, 0f)), ("b", "b", Seq(0f, 1f, 0f, 0f)),
      ("c", "c", Seq(0f, 0f, 1f, 0f)),
      (null, "null-id", Seq(1f, 0f, 0f, 0f)), ("nv", "nv", null))
    val coll = rows.toDF("id", "value", "vector")
    // multi-vector variant keeps the null-ID row only (its defect shape:
    // a null id TIES the best row's rank and asc = nulls first put it
    // FIRST pre-fix); a null element inside a token set is out of the
    // validated multi-vector contract either way
    val mv = coll.filter(col("value") =!= lit("nv"))
      .withColumn("vectors", array(col("vector")))
    val qs = Seq(("q0", Seq(1f, 0f, 0f, 0f))).toDF("qid", "qvector")
    val qsets = Seq(("q0", Seq(Seq(1f, 0f, 0f, 0f)))).toDF("qid", "qvectors")
    def run(heap: Boolean): Seq[Seq[String]] = {
      spark.conf.set("spark.graft.batch.heapCut", heap.toString)
      try Seq(
        Search.flatSearchMany(coll, config, qs, 5, knownNq = 1L)
          .collect().map(_.getString(1)).sorted.toSeq,
        Search.multiVectorSearchMany(mv, config, qsets, 5)
          .collect().map(_.getString(1)).sorted.toSeq,
        Search.quantizedSearchMany(coll, config, qs, 5, candidates = 5,
          knownNq = 1L).collect().map(_.getString(1)).sorted.toSeq,
        Search.funnelSearchMany(coll, config, qs, 5, candidates = 5,
          knownNq = 1L).collect().map(_.getString(1)).sorted.toSeq)
      finally spark.conf.unset("spark.graft.batch.heapCut")
    }
    val viaWindow = run(heap = false)
    val viaHeap = run(heap = true)
    assert(viaWindow === viaHeap, "window and heap plans disagree on null rows")
    assert(viaWindow.forall(_ === Seq("a", "b", "c")),
      s"null rows leaked into batch results (flat/maxsim/quantized/funnel): $viaWindow")
  }

  test("heap plan == window plan on ties, including non-BMP ids where UTF-16 and UTF-8 order differ") {
    val dims = 4
    val config = CollectionConfig("tie", dims, Metric.L2,
      normalize = Some(Normalize.None))
    // FULLWIDTH A (U+FF21, UTF-8 EF BC A1) vs an emoji (surrogate pair,
    // UTF-8 F0 9F 98 80): Java String order says emoji FIRST, Spark's
    // binary UTF-8 order says fullwidth-A first — identical vectors make
    // the id the ONLY tiebreaker
    val v = Seq(1f, 0f, 0f, 0f)
    val ids = Seq("\uFF21pad", "\uD83D\uDE00pad", "zz", "aa", "mm")
    val coll = ids.map(id => (id, id, v)).toDF("id", "value", "vector")
    val qs = Seq(("q0", Seq(1f, 0f, 0f, 0f))).toDF("qid", "qvector")
    def run(heap: Boolean): Seq[String] = {
      spark.conf.set("spark.graft.batch.heapCut", heap.toString)
      try Search.flatSearchMany(coll, config, qs, 3, knownNq = 1L)
        .orderBy("id").collect().map(_.getString(1)).toSeq
      finally spark.conf.unset("spark.graft.batch.heapCut")
    }
    val viaHeap = run(heap = true)
    val viaWindow = run(heap = false)
    assert(viaHeap === viaWindow, "heap and window plans disagree on tie order")
    // the top-3 under binary UTF-8 order: aa, mm, zz sort BEFORE both
    // multi-byte ids (all start with sub-0x80 bytes)
    assert(viaHeap.toSet === Set("aa", "mm", "zz"))
    // and with k=4 the fullwidth A (EF...) must beat the emoji (F0...)
    spark.conf.set("spark.graft.batch.heapCut", "true")
    val top4 = try Search.flatSearchMany(coll, config, qs, 4, knownNq = 1L)
      .collect().map(_.getString(1)).toSet
    finally spark.conf.unset("spark.graft.batch.heapCut")
    assert(top4.contains("\uFF21pad") && !top4.contains("\uD83D\uDE00pad"),
      "binary UTF-8 tie order must pick the fullwidth-A id over the emoji id")
  }
}
