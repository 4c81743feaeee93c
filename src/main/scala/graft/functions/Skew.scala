package graft.functions

import org.apache.spark.sql.{Column, DataFrame}
import org.apache.spark.sql.functions._

/** Skew-handling helpers for heavy keys (the 100 TB failure mode AQE
  * doesn't always catch: one hot key serializing an aggregation or
  * join). */
object Skew {

  /** Two-phase salted aggregation: counts/sums for a skewed key are
    * first combined within (key, salt) sub-groups — `parallelism` ways —
    * then merged per key. Exact for algebraic aggregates. */
  def saltedSum(df: DataFrame, keyCol: Column, valueCol: Column,
      parallelism: Int = 32): DataFrame =
    df.withColumn("_salt", pmod(spark_partition_id() + monotonically_increasing_id(),
        lit(parallelism)))
      .groupBy(keyCol.as("key"), col("_salt"))
      .agg(sum(valueCol).as("_partial"), count(lit(1)).as("_n"))
      .groupBy(col("key"))
      .agg(sum(col("_partial")).as("sum"), sum(col("_n")).as("cnt"))

  /** Salted broadcast-replicated join for a skewed LEFT side: the small
    * right side is replicated `parallelism` times with every salt value,
    * the big side gets a random-but-deterministic salt, and the join key
    * becomes (key, salt) — splitting each hot key into `parallelism`
    * shuffle groups. Right side must be small enough to broadcast
    * `parallelism`-fold. */
  def saltedJoin(big: DataFrame, small: DataFrame, key: String,
      parallelism: Int = 8): DataFrame = {
    val salts = explode(sequence(lit(0), lit(parallelism - 1))).as("_salt")
    val smallReplicated = small.select(col("*"), salts)
    val bigSalted = big.withColumn("_salt",
      pmod(hash(col(key), spark_partition_id(), monotonically_increasing_id()),
        lit(parallelism)))
    bigSalted.join(broadcast(smallReplicated), Seq(key, "_salt")).drop("_salt")
  }
}
