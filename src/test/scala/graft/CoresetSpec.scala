package graft

import org.apache.spark.sql.functions._

import graft.core.Metric
import graft.functions.Coreset

/** Farthest-point (k-center greedy) selection: hand-derived pick order
  * on 1-D geometry, radius monotonicity, coverage assignment. */
class CoresetSpec extends SparkSpec {
  import spark.implicits._

  private val line = Seq(
    ("a", Seq(0f)), ("b", Seq(1f)), ("c", Seq(10f)),
    ("d", Seq(11f)), ("e", Seq(20f))).toDF("id", "vector")

  test("k-center greedy: hand-derived picks, radius curve, k >= n") {
    val picks = Coreset.kCenterGreedy(line, "id", "vector", k = 3)
      .collect().map(r => (r.getString(0), r.getInt(1), r.getDouble(2)))
    // seed = min id (a@0); farthest is e@20; then c@10 (min-dist 10 beats d's 9)
    assert(picks.toSeq === Seq(("a", 0, 0.0), ("e", 1, 20.0), ("c", 2, 10.0)))
    // radius curve is non-increasing after the seed
    val all = Coreset.kCenterGreedy(line, "id", "vector", k = 5)
      .collect().sortBy(_.getInt(1)).map(_.getDouble(2))
    assert(all.drop(1).sliding(2).forall(w => w.head >= w.last))
    // k beyond n: every row picked exactly once
    assert(Coreset.kCenterGreedy(line, "id", "vector", k = 99).count() === 5)
    // explicit seed overrides the min-id default
    val fromE = Coreset.kCenterGreedy(line, "id", "vector", k = 2,
      seedId = Some("e")).collect().map(r => (r.getString(0), r.getInt(1)))
    assert(fromE.toSeq === Seq(("e", 0), ("a", 1)))
  }

  test("assignToCenters: nearest-center coverage map with (d, id) tie-break") {
    val centers = Seq(("a", Seq(0f)), ("c", Seq(10f)), ("e", Seq(20f)))
      .toDF("cid", "cv")
    val got = Coreset.assignToCenters(line, "id", "vector", centers,
      "cid", "cv").collect()
      .map(r => r.getString(0) -> ((r.getString(1), r.getDouble(2)))).toMap
    assert(got("a") === (("a", 0.0)))
    assert(got("b") === (("a", 1.0)))
    assert(got("d") === (("c", 1.0)))
    assert(got("e") === (("e", 0.0)))
    // exact midpoint: distance ties resolve to the smaller center id
    val mid = Seq(("m", Seq(5f))).toDF("id", "vector")
    val m = Coreset.assignToCenters(mid, "id", "vector", centers, "cid", "cv")
      .collect().head
    assert(m.getString(1) === "a" && m.getDouble(2) === 5.0)
  }

  test("k-center coverage radius beats random selection on the embeddings corpus") {
    import org.apache.spark.sql.functions.{col, max => smax}
    val coll = Tables.read(spark, "/root/testdata/sf0.001", "embeddings")
      .select(col("vec_id").cast("string").as("id"), col("embedding").as("vector"))
      .cache()
    val k = 8
    val picks = Coreset.kCenterGreedy(coll, "id", "vector", k)
    val centers = picks.select(col("id").as("cid"))
      .join(coll, col("cid") === col("id"))
      .select(col("cid"), col("vector").as("cv"))
    def radius(cs: org.apache.spark.sql.DataFrame): Double =
      Coreset.assignToCenters(coll, "id", "vector", cs, "cid", "cv")
        .agg(smax("distance")).head.getDouble(0)
    val greedy = radius(centers)
    // deterministic "random" baseline: first k ids in hash order
    val rand = coll.withColumn("cid", col("id"))
      .orderBy(org.apache.spark.sql.functions.md5(col("id"))).limit(k)
      .select(col("cid"), col("vector").as("cv"))
    val baseline = radius(rand)
    assert(greedy > 0.0 && greedy <= baseline,
      s"k-center radius $greedy should not exceed hash-pick baseline $baseline")
    // 2-approximation sanity: radius is monotone non-increasing in k
    val fewer = radius(Coreset.kCenterGreedy(coll, "id", "vector", 4)
      .select(col("id").as("cid")).join(coll, col("cid") === col("id"))
      .select(col("cid"), col("vector").as("cv")))
    assert(greedy <= fewer)
    coll.unpersist()
  }
}
