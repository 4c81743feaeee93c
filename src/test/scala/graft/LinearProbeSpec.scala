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

  test("logistic probe separates a planted keep/drop law; gradient vanishes at the optimum") {
    // deterministic labels from a linear law — separable, so ridge is
    // what keeps the weights finite
    val df = synthFrame(400, (x1, x2) => if (2.0 * x1 - x2 + 0.5 > 0) 1.0 else 0.0)
    val m = graft.encode.LinearProbe.trainLogistic(df, "vector", col("y"),
      dims = 2, lambda = 0.1, iterations = 25)
    // 100% training accuracy at the logit-0 cut
    val wrong = df.filter(
      (graft.encode.LinearProbe.scoreColumn(col("vector"), m) > 0) =!=
        (col("y") > 0.5)).count()
    assert(wrong === 0L)
    // stationarity: the regularized gradient X^T(y - p) - lambda*w is
    // ~0 at the returned weights (checked with an independent Spark
    // aggregation, not the training loop's own numbers)
    val eta = graft.encode.LinearProbe.scoreColumn(col("vector"), m)
    val p = lit(1.0) / (lit(1.0) + exp(-eta))
    val g = df.select(posexplode(transform(
        concat(transform(col("vector"), x => x.cast("double")), array(lit(1.0d))),
        z => z * (col("y") - p))))
      .groupBy("pos").agg(sum("col").as("g")).collect()
      .map(r => r.getInt(0) -> r.getDouble(1)).toMap
    assert(math.abs(g(0) - 0.1 * m.weights(0)) < 1e-3)
    assert(math.abs(g(1) - 0.1 * m.weights(1)) < 1e-3)
    assert(math.abs(g(2)) < 1e-3) // intercept unregularized
  }

  test("logistic probe on label-symmetric data: weights ~0, intercept = logit(base rate)") {
    // every feature vector appears with BOTH labels -> no direction
    // helps; the only signal is the 0.75 base rate
    import org.apache.spark.sql.types._
    val rows = (0 until 200).flatMap { i =>
      val v = Seq((math.sin(i * 0.9) * 2).toFloat, (math.cos(i * 1.7)).toFloat)
      Seq(
        org.apache.spark.sql.Row(s"p$i", v, 1.0),
        org.apache.spark.sql.Row(s"q$i", v, 1.0),
        org.apache.spark.sql.Row(s"r$i", v, 1.0),
        org.apache.spark.sql.Row(s"n$i", v, 0.0))
    }
    val df = spark.createDataFrame(java.util.Arrays.asList(rows: _*),
      StructType(Seq(StructField("id", StringType),
        StructField("vector", ArrayType(FloatType)),
        StructField("y", DoubleType)))).repartition(4)
    val m = graft.encode.LinearProbe.trainLogistic(df, "vector", col("y"),
      2, lambda = 0.01)
    assert(m.weights.forall(w => math.abs(w) < 1e-6))
    assert(math.abs(m.intercept - math.log(3.0)) < 1e-6) // logit(0.75)
  }

  test("quantileCut keeps exactly the top fraction by probe score, ties survive") {
    val df = synthFrame(100, (x1, x2) => x1 + x2)
    val m = LinearProbe.train(df, "vector", col("y"), 2, lambda = 0.0)
    val kept = LinearProbe.quantileCut(df, "vector", m, keepFraction = 0.2)
      .select("id", "y").collect().map(r => (r.getString(0), r.getDouble(1)))
    assert(kept.length === 20)
    // the kept set IS the top 20 by label (score == y at lambda 0)
    val top20 = df.select("id", "y").collect()
      .map(r => (r.getString(0), r.getDouble(1)))
      .sortBy(-_._2).take(20).map(_._1).toSet
    assert(kept.map(_._1).toSet === top20)
    // keepFraction = 1 keeps everything; empty input passes through
    assert(LinearProbe.quantileCut(df, "vector", m, 1.0).count() === 100)
    assert(LinearProbe.quantileCut(df.filter(lit(false)), "vector", m, 0.5)
      .count() === 0)
    // ties at the cutoff all survive: constant scores keep every row
    val const = synthFrame(50, (_, _) => 1.0)
    val mc = LinearProbe.Model(Array(0.0, 0.0), 7.0, 0.0)
    assert(LinearProbe.quantileCut(const, "vector", mc, 0.1).count() === 50)
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
