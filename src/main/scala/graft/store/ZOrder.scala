package graft.store

import org.apache.spark.sql.{Column, DataFrame}
import org.apache.spark.sql.functions._

/** Z-order (Morton curve) clustering for multi-column data skipping —
  * the at-rest answer when queries filter on MORE THAN ONE column.
  * Bucketing/sorting by a single key gives parquet row-group min/max
  * pruning on that key only; interleaving the bits of several bucketed
  * keys makes rows that are close in EVERY dimension land in the same
  * files, so min/max stats prune on any filtered subset of the z
  * columns (the Delta/Iceberg OPTIMIZE ZORDER idea, built from plain
  * Spark: one range repartition + local sort, no custom writer).
  *
  * [[zValue]] is exact integer bit-interleaving of caller-bucketed
  * longs — deterministic and engine-replicable (the gate row replicates
  * every bit shift in SQL). Callers bucket with exact integer
  * arithmetic (`pmod`, `div`) rather than float affine scaling, so no
  * boundary value can round differently across engines.
  */
object ZOrder {

  /** Morton code of `cols` (long columns already bucketed into
    * `[0, 2^bits)`): bit j of column c lands at position `j * n + c`.
    * Pure codegen arithmetic — `n * bits` shift/mask terms, no UDF.
    * Total bits must fit a long. */
  def zValue(cols: Seq[Column], bits: Int): Column = {
    require(cols.nonEmpty, "at least one column")
    require(bits >= 1 && cols.size * bits <= 63,
      s"n*bits must fit a signed long, got ${cols.size} x $bits")
    val n = cols.size
    cols.zipWithIndex.flatMap { case (c, ci) =>
      (0 until bits).map { j =>
        shiftleft(shiftright(c, j).bitwiseAND(lit(1L)), j * n + ci)
      }
    }.reduce(_.bitwiseOR(_))
  }

  /** Write `df` clustered by the z-value of `zCols`: range-repartition
    * on the Morton code (one exchange, evenly sized output files) then
    * a partition-local sort, so every parquet file covers a small
    * hyper-rectangle of the z columns and row-group min/max stats prune
    * multi-column filters. The z column itself is dropped — it is a
    * layout device, not data. */
  def writeZOrdered(df: DataFrame, zCols: Seq[Column], path: String,
      bits: Int = 16, partitions: Int = 0): Unit = {
    val z = zValue(zCols, bits)
    val parts =
      if (partitions > 0) partitions
      else df.sparkSession.conf.get("spark.sql.shuffle.partitions").toInt
    df.withColumn("_z", z)
      .repartitionByRange(parts, col("_z"))
      .sortWithinPartitions(col("_z"))
      .drop("_z")
      .write.mode("overwrite").parquet(path)
  }
}
