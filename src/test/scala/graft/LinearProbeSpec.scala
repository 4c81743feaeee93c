package graft

import org.apache.spark.sql.functions._

import graft.encode.LinearProbe

/** Linear probe (closed-form ridge) — the embedding-space quality
  * scorer. Recovery, regularization, scoring parity, and the curation
  * cut. */
class LinearProbeSpec extends SparkSpec {

  import scala.math.abs

  private def synthFrame(n: Int, f: (Double, Double) => Double) = {
    import org.apache.spark.sql.types._
    val rows = (0 until n).map { i =>
      val x1 = math.sin(i * 0.7) * 2.0
      val x2 = math.cos(i * 1.3) * 1.5
      org.apache.spark.sql.Row(i.toString, Seq(x1.toFloat, x2.toFloat), f(x1, x2))
    }
    spark.createDataFrame(java.util.Arrays.asList(rows: _*), StructType(Seq(
      StructField("id", StringType),
      StructField("vector", ArrayType(FloatType)),
      StructField("y", DoubleType)))).repartition(4)
  }

  test("lambda=0 exact recovery of a planted linear law (with intercept)") {
    // y computed from the FLOAT-cast features so the law is exactly
    // representable in the training data
    val df = synthFrame(200, (_, _) => 0.0)
      .withColumn("y", lit(2.0) * element_at(col("vector"), 1).cast("double")
        - lit(3.0) * element_at(col("vector"), 2).cast("double") + lit(1.0))
    val m = LinearProbe.train(df, "vector", col("y"), dims = 2, lambda = 0.0)
    assert(abs(m.weights(0) - 2.0) < 1e-9 && abs(m.weights(1) + 3.0) < 1e-9)
    assert(abs(m.intercept - 1.0) < 1e-9)
    // scoring reproduces the labels
    val maxErr = df.select(max(
        org.apache.spark.sql.functions.abs(
          LinearProbe.scoreColumn(col("vector"), m) - col("y"))))
      .head.getDouble(0)
    assert(maxErr < 1e-9)
  }

  test("ridge shrinks weights monotonically; intercept stays unregularized") {
    val df = synthFrame(300, (x1, x2) => 2.0 * x1 - 3.0 * x2 + 1.0 + 0.01 * math.sin(x1 * 9))
    val norms = Seq(0.0, 1.0, 100.0).map { l =>
      val m = LinearProbe.train(df, "vector", col("y"), 2, lambda = l)
      math.sqrt(m.weights.map(w => w * w).sum)
    }
    assert(norms(0) > norms(1) && norms(1) > norms(2))
    // heavy ridge pushes weights toward 0 but the free intercept keeps
    // absorbing the label mean
    val heavy = LinearProbe.train(df, "vector", col("y"), 2, lambda = 1e9)
    val meanY = df.agg(avg(col("y"))).head.getDouble(0)
    assert(abs(heavy.intercept - meanY) < 1e-3)
  }

  test("driver solve matches a hand-checked 2x2 system; no-intercept path") {
    // corpus engineered so X^T X = [[2,0],[0,8]], X^T y = [4, 8]:
    // rows (1,2),(1,-2),(-... use two rows: x=(1,2) y=3 and x=(1,-2) y=1
    // XtX = [[2,0],[0,8]], Xty = [4,4] -> w = (2, 0.5)
    import org.apache.spark.sql.types._
    val rows = java.util.Arrays.asList(
      org.apache.spark.sql.Row("a", Seq(1f, 2f), 3.0),
      org.apache.spark.sql.Row("b", Seq(1f, -2f), 1.0))
    val df = spark.createDataFrame(rows, StructType(Seq(
      StructField("id", StringType),
      StructField("vector", ArrayType(FloatType)),
      StructField("y", DoubleType))))
    val m = LinearProbe.train(df, "vector", col("y"), 2, lambda = 0.0,
      fitIntercept = false)
    assert(abs(m.weights(0) - 2.0) < 1e-12 && abs(m.weights(1) - 0.5) < 1e-12)
    assert(m.intercept === 0.0)
  }

  test("thresholdCut keeps exactly the rows scoring over the bar") {
    val df = synthFrame(100, (x1, x2) => x1 + x2)
    val m = LinearProbe.train(df, "vector", col("y"), 2, lambda = 0.0)
    val kept = LinearProbe.thresholdCut(df, "vector", m, minScore = 0.5)
      .select("id").collect().map(_.getString(0)).toSet
    val expect = df.select(col("id"), col("y")).collect()
      .filter(_.getDouble(1) >= 0.5 - 1e-9).map(_.getString(0)).toSet
    assert(kept === expect && kept.nonEmpty && kept.size < 100)
  }

  test("singular system without ridge refuses with guidance") {
    // duplicate feature column -> rank-deficient normal equations
    import org.apache.spark.sql.types._
    val rows = java.util.Arrays.asList(
      org.apache.spark.sql.Row("a", Seq(1f, 1f), 1.0),
      org.apache.spark.sql.Row("b", Seq(2f, 2f), 2.0))
    val df = spark.createDataFrame(rows, StructType(Seq(
      StructField("id", StringType),
      StructField("vector", ArrayType(FloatType)),
      StructField("y", DoubleType))))
    val e = intercept[IllegalArgumentException] {
      LinearProbe.train(df, "vector", col("y"), 2, lambda = 0.0,
        fitIntercept = false)
    }
    assert(e.getMessage.contains("raise lambda"))
    // with ridge the same corpus fits
    val m = LinearProbe.train(df, "vector", col("y"), 2, lambda = 0.1,
      fitIntercept = false)
    assert(m.weights.forall(w => w > 0 && w < 1))
  }
}
