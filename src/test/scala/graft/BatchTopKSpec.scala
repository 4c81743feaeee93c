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
