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
  /** Key-skew diagnostic: the `topK` heaviest values of a prospective
    * join/group key with each one's row count, share of the table,
    * and the ratio to a perfectly uniform key ("this user is 840x the
    * mean") — the number that decides whether [[saltedSum]] /
    * [[saltedJoin]] / AQE skew handling is needed BEFORE the 4-hour
    * job stalls on one straggler task. One grouped count + a bounded
    * TakeOrdered; nothing else. */
  def keyStats(df: DataFrame, keyCol: Column, topK: Int = 20): DataFrame = {
    require(topK > 0, "topK must be positive")
    val counts = df.groupBy(keyCol.as("key")).agg(count(lit(1)).as("n_rows"))
    val tot = counts.agg(sum(col("n_rows")).as("_n"),
      count(lit(1)).as("_k"))
    counts.crossJoin(broadcast(tot))
      .select(col("key"), col("n_rows"),
        (col("n_rows").cast("double") / col("_n").cast("double")).as("share"),
        (col("n_rows").cast("double") /
          (col("_n").cast("double") / col("_k").cast("double")))
          .as("x_uniform"))
      .orderBy(col("n_rows").desc, col("key").asc)
      .limit(topK)
  }

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
