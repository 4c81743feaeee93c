package graft.functions

import org.apache.spark.sql.{Column, DataFrame}
import org.apache.spark.sql.functions._

import graft.core.Metric
import graft.functions.VectorFunctions.vecDistance

/** Diverse-subset (coreset) selection over an embedding column —
  * farthest-point sampling, the k-center greedy 2-approximation
  * (Gonzalez 1985) used for prototype picking and coverage-maximizing
  * training-subset selection (the diversify half of the
  * SemDeDup-then-diversify recipe).
  */
object Coreset {

  /** k-center greedy: start from `seedId` (default: the minimum id —
    * fully deterministic), then `k-1` times pick the row FARTHEST from
    * the chosen set (max over rows of min distance to a center; ties
    * break by ascending id). Returns (id, pick_order, center_distance)
    * for the k centers, pick_order 0-based, `center_distance` = the
    * row's distance to the previously-chosen set at pick time (the
    * coverage radius curve — monotone non-increasing, a built-in
    * stopping diagnostic).
    *
    * Scale shape: each round is ONE scan of the cached frame — a
    * `least(dist-so-far, dist-to-new-center)` projection and a
    * 1-row TakeOrdered — so cost is k scans of (n·d) work with
    * nothing but one center row collected per round;
    * `localCheckpoint` keeps the running min materialized instead of
    * growing a k-deep expression lineage. k is the number of
    * prototypes (tens to hundreds); for k beyond that, pre-cluster
    * with IVF cells and run per-cell. */
  def kCenterGreedy(df: DataFrame, idCol: String, vectorCol: String, k: Int,
      metric: Metric = Metric.L2, seedId: Option[String] = None): DataFrame = {
    require(k > 0, "k must be positive")
    val spark = df.sparkSession
    import spark.implicits._
    val base = df.select(col(idCol).cast("string").as("_id"),
      col(vectorCol).as("_v"))
    if (base.isEmpty)
      return Seq.empty[(String, Int, Double)]
        .toDF(idCol, "pick_order", "center_distance")
    val seed = seedId.getOrElse(
      base.orderBy(col("_id")).select(col("_id")).as[String].head())
    val seedVec = base.filter(col("_id") === seed)
      .select(col("_v")).as[Seq[Float]].head()
    val picked = scala.collection.mutable.ArrayBuffer[(String, Int, Double)](
      (seed, 0, 0.0))
    var state = base.filter(col("_id") =!= seed)
      .withColumn("_mind",
        vecDistance(metric, col("_v"), typedlit(seedVec)).cast("double"))
      .localCheckpoint()
    var round = 1
    while (round < k && !state.isEmpty) {
      val far = state.orderBy(col("_mind").desc, col("_id")).limit(1)
        .select(col("_id"), col("_v"), col("_mind"))
        .as[(String, Seq[Float], Double)].head()
      picked += ((far._1, round, far._3))
      state = state.filter(col("_id") =!= far._1)
        .withColumn("_mind", least(col("_mind"),
          vecDistance(metric, col("_v"), typedlit(far._2)).cast("double")))
        .localCheckpoint()
      round += 1
    }
    picked.toSeq.toDF(idCol, "pick_order", "center_distance")
  }

  /** Assignment of every row to its nearest chosen center (the
    * coverage map the selection is consumed through): (id, center_id,
    * distance). `centers` is [[kCenterGreedy]] output joined back to
    * vectors, or any (id, vector) frame — broadcast, so one scan. */
  def assignToCenters(df: DataFrame, idCol: String, vectorCol: String,
      centers: DataFrame, centerIdCol: String, centerVecCol: String,
      metric: Metric = Metric.L2): DataFrame = {
    val c = centers.select(col(centerIdCol).cast("string").as("_cid"),
      col(centerVecCol).as("_cv"))
    val scored = df.select(col(idCol).as("_id"), col(vectorCol).as("_v"))
      .crossJoin(broadcast(c))
      .withColumn("_d", vecDistance(metric, col("_v"), col("_cv")).cast("double"))
    scored.groupBy(col("_id"))
      .agg(min(struct(col("_d"), col("_cid"))).as("_best"))
      .select(col("_id").as(idCol), col("_best._cid").as("center_id"),
        col("_best._d").as("distance"))
  }
}
