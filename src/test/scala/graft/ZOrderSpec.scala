package graft

import org.apache.spark.sql.functions._

import graft.store.ZOrder

/** Z-order layout: exact Morton coding + the clustering property the
  * layout exists for (small per-file ranges on EVERY z column). */
class ZOrderSpec extends SparkSpec {

  private def mortonRef(vals: Seq[Long], bits: Int): Long = {
    var z = 0L
    val n = vals.size
    for (ci <- 0 until n; j <- 0 until bits)
      z |= ((vals(ci) >> j) & 1L) << (j * n + ci)
    z
  }

  test("zValue == reference Morton interleave across widths and arities") {
    import spark.implicits._
    val samples = Seq(
      Seq(0L, 0L), Seq(1L, 0L), Seq(0L, 1L), Seq(255L, 255L),
      Seq(170L, 85L), Seq(3L, 200L))
    val df = samples.map(s => (s(0), s(1))).toDF("a", "b")
    val got = df.select(ZOrder.zValue(Seq(col("a"), col("b")), 8).as("z"))
      .collect().map(_.getLong(0)).toSeq
    assert(got === samples.map(mortonRef(_, 8)))
    // 3 columns, 4 bits
    val df3 = Seq((5L, 9L, 15L)).toDF("a", "b", "c")
    assert(df3.select(ZOrder.zValue(Seq(col("a"), col("b"), col("c")), 4))
      .head.getLong(0) === mortonRef(Seq(5L, 9L, 15L), 4))
    // guard: total bits must fit a long
    intercept[IllegalArgumentException] {
      ZOrder.zValue(Seq(col("a"), col("b")), 32)
    }
  }

  test("writeZOrdered clusters BOTH columns: per-file ranges are narrow") {
    import spark.implicits._
    // a 100x100 integer grid, shuffled across partitions
    val df = spark.range(10000).select(
      (col("id") % 100).as("x"), (col("id") / 100).cast("long").as("y"),
      col("id").as("payload")).repartition(16)
    val path = java.nio.file.Files.createTempDirectory("graft_zorder").toString + "/t"
    ZOrder.writeZOrdered(df, Seq(col("x"), col("y")), path, bits = 8,
      partitions = 16)
    val back = spark.read.parquet(path)
    assert(back.count() === 10000)
    assert(back.columns.toSet === Set("x", "y", "payload")) // _z dropped
    // per-file spans: a z-ordered layout keeps BOTH dimensions narrow
    // per file; a single-column sort would leave the other dimension's
    // span at ~the global range (99)
    val spans = back.groupBy(input_file_name())
      .agg((max("x") - min("x")).as("sx"), (max("y") - min("y")).as("sy"))
      .collect()
    assert(spans.length >= 8)
    val avgSx = spans.map(_.getLong(1)).sum.toDouble / spans.length
    val avgSy = spans.map(_.getLong(2)).sum.toDouble / spans.length
    assert(avgSx < 50 && avgSy < 50,
      s"avg per-file spans x=$avgSx y=$avgSy — not clustered")
    // data-skipping evidence: files whose [min,max] box can contain the
    // point (42, 7) are a small fraction of all files
    val candidate = back.groupBy(input_file_name())
      .agg(min("x").as("x0"), max("x").as("x1"),
        min("y").as("y0"), max("y").as("y1"))
      .filter(col("x0") <= 42 && col("x1") >= 42 &&
        col("y0") <= 7 && col("y1") >= 7)
      .count()
    assert(candidate.toDouble / spans.length <= 0.5,
      s"$candidate of ${spans.length} files overlap one point")
  }
}
