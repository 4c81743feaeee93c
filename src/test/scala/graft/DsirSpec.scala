package graft

import org.apache.spark.sql.functions._
import graft.text.Dsir

/** DSIR importance resampling: hand-checked weights on a tiny corpus,
  * fit/score separation, determinism of the Gumbel draw, and the
  * directional property the method exists for (docs resembling the
  * target outscore docs that don't). */
class DsirSpec extends SparkSpec {

  private def docs = {
    import spark.implicits._
    Seq(
      ("d1", "spark spark spark pipelines"),
      ("d2", "spark pipelines at scale"),
      ("d3", "cats chase mice daily"),
      ("d4", "mice flee cats nightly"),
      ("d5", "")
    ).toDF("id", "text").repartition(3)
  }

  test("grams = lowercased unigrams + bigrams; blanks filtered; empty text -> empty") {
    import spark.implicits._
    val g = Seq(("a", "The quick  Fox"), ("b", ""), ("c", "solo"))
      .toDF("id", "text")
      .select(col("id"), Dsir.grams(col("text")).as("g"))
      .collect().map(r => r.getString(0) -> r.getSeq[String](1)).toMap
    assert(g("a") === Seq("the", "quick", "fox", "the quick", "quick fox"))
    assert(g("b") === Seq.empty)
    assert(g("c") === Seq("solo"))
  }

  test("bucketCounts total = gram mass; bounded by buckets") {
    val bc = Dsir.bucketCounts(docs, col("text"), buckets = 16).collect()
    // gram mass: d1 4+3, d2 4+3, d3 4+3, d4 4+3, d5 0 = 28
    assert(bc.map(_.getLong(1)).sum === 28L)
    assert(bc.length <= 16)
    assert(bc.forall(r => r.getInt(0) >= 0 && r.getInt(0) < 16))
  }

  test("logRatioTable matches a local replication; weights sum the table per doc") {
    val buckets = 32
    val target = docs.filter(col("id").isin("d1", "d2"))
    val table = Dsir.logRatioTable(docs, col("text"), target, col("text"), buckets)
    assert(table.length === buckets)
    // local replication of the fit
    def localGrams(t: String): Seq[String] = {
      val toks = t.trim.split("\\s+").map(_.toLowerCase).filter(_.nonEmpty).toSeq
      toks ++ toks.sliding(2).filter(_.size == 2).map(_.mkString(" "))
    }
    def bucketOf(g: String): Int = {
      val md = java.security.MessageDigest.getInstance("MD5")
        .digest(s"dsir:$g".getBytes("UTF-8"))
      val hex = md.map("%02x".format(_)).mkString.take(8)
      (java.lang.Long.parseLong(hex, 16) % buckets).toInt
    }
    val all = Seq("spark spark spark pipelines", "spark pipelines at scale",
      "cats chase mice daily", "mice flee cats nightly", "")
    val tgt = all.take(2)
    def fit(corpus: Seq[String]): Array[Double] = {
      val counts = new Array[Double](buckets)
      corpus.flatMap(localGrams).foreach(g => counts(bucketOf(g)) += 1)
      val tot = counts.sum + buckets
      counts.map(c => math.log((c + 1) / tot))
    }
    val expected = fit(tgt).zip(fit(all)).map { case (a, b) => a - b }
    table.zip(expected).foreach { case (got, exp) =>
      assert(math.abs(got - exp) < 1e-12, s"table mismatch got=$got exp=$exp")
    }
    // per-doc weight = sum of table at the doc's buckets, empty doc = 0
    val w = Dsir.importanceWeights(docs, "id", "text", target, "text", buckets)
      .select("id", "dsir_logw").collect()
      .map(r => r.getString(0) -> r.getDouble(1)).toMap
    all.zip(Seq("d1", "d2", "d3", "d4", "d5")).foreach { case (t, id) =>
      val exp = localGrams(t).map(g => expected(bucketOf(g))).sum
      assert(math.abs(w(id) - exp) < 1e-9, s"$id weight")
    }
    assert(w("d5") === 0.0)
    // the point of the method: target-like docs outscore the rest
    assert(math.min(w("d1"), w("d2")) > math.max(w("d3"), w("d4")))
    // scoreColumn with the pre-fitted table reproduces importanceWeights
    val w2 = docs.select(col("id"),
      Dsir.scoreColumn(col("text"), table).as("s")).collect()
      .map(r => r.getString(0) -> r.getDouble(1)).toMap
    w.foreach { case (id, v) => assert(math.abs(w2(id) - v) < 1e-12) }
  }

  test("resampleTop: deterministic, exactly n, ranked by perturbed weight") {
    import spark.implicits._
    val scored = (0 until 200).map(i =>
      (s"d$i", if (i < 20) 5.0 else -5.0)).toDF("id", "logw").repartition(5)
    val a = Dsir.resampleTop(scored, "id", col("logw"), n = 25, salt = "s1")
      .select("id").collect().map(_.getString(0)).toSeq
    val b = Dsir.resampleTop(scored, "id", col("logw"), n = 25, salt = "s1")
      .select("id").collect().map(_.getString(0)).toSeq
    assert(a === b, "same salt must redraw the same sample")
    assert(a.length === 25)
    // logw gap of 10 nats dwarfs Gumbel noise: all 20 heavy docs drawn
    val heavy = (0 until 20).map(i => s"d$i").toSet
    assert(heavy.subsetOf(a.toSet))
    val c = Dsir.resampleTop(scored, "id", col("logw"), n = 25, salt = "s2")
      .select("id").collect().map(_.getString(0)).toSeq
    assert(c !== a, "a different salt should perturb the tail of the draw")
  }
}
