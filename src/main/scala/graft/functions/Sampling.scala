package graft.functions

import org.apache.spark.sql.{Column, DataFrame}
import org.apache.spark.sql.functions._

/** Deterministic, engine-portable sampling and dataset splitting for
  * training pipelines. The assignment hash is the first 8 hex digits of
  * md5(salt ':' id) — identical in any engine with md5, stable across
  * runs/partitionings/cluster sizes, and independent of row order. A
  * narrow projection: no shuffle, no RNG state, reproducible joins
  * between a split and its source.
  */
object Sampling {

  /** Uniform bucket in [0, buckets) from the id column. */
  def hashBucket(id: Column, buckets: Int, salt: String = ""): Column = {
    require(buckets > 0, "buckets must be positive")
    (conv(substring(md5(concat(lit(salt), lit(":"), id.cast("string"))), 1, 8), 16, 10)
      .cast("long") % buckets).cast("int")
  }

  /** Deterministic fractional sample: keeps id iff its per-mille bucket
    * falls below fraction*1000 (resolution 0.1%). */
  def sampleByHash(df: DataFrame, idCol: String, fraction: Double,
      salt: String = ""): DataFrame = {
    require(fraction >= 0 && fraction <= 1, "fraction in [0,1]")
    df.filter(hashBucket(col(idCol), 1000, salt) < (fraction * 1000).round.toInt)
  }

  /** Weighted split: adds a `split` column naming the partition each row
    * lands in (e.g. train/val/test by 0.9/0.05/0.05). Weights are
    * normalized and mapped onto per-mille bucket ranges, so every row
    * lands in exactly one split and re-running (any cluster size, any
    * order) reproduces the same assignment. */
  def deterministicSplit(df: DataFrame, idCol: String,
      weights: Seq[(String, Double)], salt: String = ""): DataFrame = {
    require(weights.nonEmpty && weights.forall(_._2 > 0), "positive weights required")
    val total = weights.map(_._2).sum
    val cuts = weights.map { case (n, w) => (n, w / total) }
      .scanLeft(("", 0.0)) { case ((_, acc), (n, f)) => (n, acc + f) }.tail
    val b = hashBucket(col(idCol), 1000, salt)
    val expr = cuts.init.reverse.foldLeft(lit(cuts.last._1)) {
      case (els, (name, cum)) => when(b < (cum * 1000).round.toInt, lit(name)).otherwise(els)
    }
    // reversed fold builds: b < cut1 -> w1 else b < cut2 -> w2 ... else last
    df.withColumn("split", expr)
  }
}
