package graft

import org.apache.spark.sql.functions._

import graft.text.NaiveBayes

/** Counts-based text models: multinomial Naive Bayes (and friends). */
class TextModelSpec extends SparkSpec {
  import spark.implicits.{localSeqToDatasetHolder, newProductEncoder}

  test("nb: separable vocabulary classifies held-out docs perfectly") {
    val train = Seq(
      (1, "apple banana apple", "fruit"),
      (2, "banana cherry banana", "fruit"),
      (3, "bolt nut bolt washer", "hardware"),
      (4, "nut screw washer", "hardware")).toDF("id", "text", "label")
    val test = Seq(
      (10, "apple cherry"), (11, "screw bolt nut"), (12, "banana banana"))
      .toDF("id", "text")
    val m = NaiveBayes.train(train, "id", "text", "label")
    val pred = NaiveBayes.predict(m, test, "id", "text")
      .collect().map(r => r.getInt(0) -> r.getString(1)).toMap
    assert(pred === Map(10 -> "fruit", 11 -> "hardware", 12 -> "fruit"))
  }

  test("nb: out-of-vocabulary doc falls back to priors (majority class)") {
    val train = Seq(
      (1, "a b", "big"), (2, "a c", "big"), (3, "a d", "big"),
      (4, "x y", "small")).toDF("id", "text", "label")
    val m = NaiveBayes.train(train, "id", "text", "label")
    val pred = NaiveBayes.predict(m,
      Seq((9, "zzz qqq")).toDF("id", "text"), "id", "text").collect()
    assert(pred.head.getString(1) === "big")
    // prior-only score: ln(3/4) for the winner
    assert(math.abs(pred.head.getDouble(2) - math.log(3.0 / 4.0)) < 1e-12)
  }

  test("nb: smoothing keeps absent-in-class terms finite, order deterministic") {
    val train = Seq(
      (1, "only here", "a"), (2, "other words", "b")).toDF("id", "text", "label")
    val m = NaiveBayes.train(train, "id", "text", "label")
    // 'only' appears in class a, never in b — b still scores finite
    val scoresByClass = m.likelihood.filter(col("term") === "only")
      .collect().map(r => r.getString(1) -> r.getDouble(2)).toMap
    assert(scoresByClass.keySet === Set("a", "b"))
    assert(scoresByClass.values.forall(v => !v.isInfinite && !v.isNaN))
    assert(scoresByClass("a") > scoresByClass("b"))
    // repeated predict is bit-identical (term-sorted fold)
    val t = Seq((7, "only other words here")).toDF("id", "text")
    val s1 = NaiveBayes.predict(m, t, "id", "text").head.getDouble(2)
    val s2 = NaiveBayes.predict(m, t, "id", "text").head.getDouble(2)
    assert(s1 === s2)
  }

  test("lm: in-domain text scores lower perplexity than shuffled/rare text") {
    import graft.text.NgramLm
    val train = (1 to 50).map(i => (i, "the quick brown fox jumps over the lazy dog"))
      .toDF("id", "text")
    val m = NgramLm.train(train, "id", "text")
    val test = Seq(
      (100, "the quick brown fox"),     // fluent under the model
      (101, "fox the jumps brown the"), // same tokens, broken order
      (102, "zzz qqq www yyy")          // fully out of vocabulary
    ).toDF("id", "text")
    val sc = NgramLm.score(m, test, "id", "text")
      .collect().map(r => r.getInt(0) -> r.getDouble(2)).toMap
    assert(sc(100) < sc(101), s"fluent ${sc(100)} !< shuffled ${sc(101)}")
    assert(sc(100) < sc(102), s"fluent ${sc(100)} !< oov ${sc(102)}")
    // documented add-1 artifact: the fully-OOV doc is NOT guaranteed to
    // score above the shuffled in-vocab doc (unseen heads have the
    // smallest denominator) — the reason the scaladoc says to gate on
    // language/vocab coverage before thresholding perplexity
  }

  test("lm: hand-checked probabilities; short docs score null") {
    import graft.text.NgramLm
    // corpus "a b a b": bigrams (a,b)x2? no — "a b a b" = (a,b),(b,a),(a,b)
    val m = NgramLm.train(Seq((1, "a b a b")).toDF("id", "text"), "id", "text")
    val bg = m.bigrams.collect().map(r =>
      (r.getString(0), r.getString(1)) -> r.getLong(2)).toMap
    assert(bg === Map(("a", "b") -> 2L, ("b", "a") -> 1L))
    assert(m.vocabSize === 2L)
    val sc = NgramLm.score(m, Seq((9, "a b"), (10, "a"), (11, ""))
      .toDF("id", "text"), "id", "text").collect()
      .map(r => r.getInt(0) -> Option(r.get(2))).toMap
    // p(b|a) = (2+1)/(2+2) = 0.75 -> logppl = -ln 0.75
    assert(math.abs(sc(9).get.asInstanceOf[Double] - (-math.log(0.75))) < 1e-12)
    assert(sc(10).isEmpty)
    assert(sc(11).isEmpty)
  }

  test("kn: hand-checked interpolated Kneser–Ney probabilities; OOV backoff finite") {
    import graft.text.NgramLm
    // corpus "a b a b": bigrams (a,b):2, (b,a):1; heads a:(c1=2,n1+=1),
    // b:(c1=1,n1+=1); continuations a:1, b:1; N_bb=2, V=2 -> denom 5
    val m = NgramLm.trainKneserNey(Seq((1, "a b a b")).toDF("id", "text"),
      "id", "text")
    assert(m.totalBigramTypes === 2L && m.vocabSize === 2L)
    def ppl(text: String): Double =
      NgramLm.scoreKneserNey(m, Seq((9, text)).toDF("id", "text"), "id", "text")
        .collect().head.getDouble(2)
    // p(b|a) = (2-.75)/2 + .75*(1/2)*((1+1)/5) = 0.625 + 0.15 = 0.775
    assert(math.abs(ppl("a b") - (-math.log(0.775))) < 1e-12)
    // unseen pair, seen head: p(b|b) = 0 + .75*(1/1)*0.4 = 0.3
    assert(math.abs(ppl("b b") - (-math.log(0.3))) < 1e-12)
    // unseen head backs off to continuation alone: p(a|z) = 2/5
    assert(math.abs(ppl("z a") - (-math.log(0.4))) < 1e-12)
    // OOV continuation keeps finite add-1 mass: p(z|a) = .75*(1/2)*(1/5)
    assert(math.abs(ppl("a z") - (-math.log(0.075))) < 1e-12)
    // the KN fix vs add-1: an unseen HEAD no longer gets the smallest
    // denominator — fluent in-vocab text beats OOV gibberish
    val big = NgramLm.trainKneserNey(
      Seq((1, "the quick brown fox jumps over the lazy dog"),
        (2, "the quick brown fox sleeps")).toDF("id", "text"), "id", "text")
    val sc = NgramLm.scoreKneserNey(big,
      Seq((100, "the quick brown fox"), (101, "fox the jumps brown the"),
        (102, "zzz qqq www yyy")).toDF("id", "text"), "id", "text")
      .collect().map(r => r.getInt(0) -> r.getDouble(2)).toMap
    assert(sc(100) < sc(101) && sc(100) < sc(102))
    assert(sc(102) > sc(101), "fully-OOV must score worse than shuffled in-vocab under KN")
  }

  test("nb: gate fixture beats the majority baseline on planted-signal langid") {
    val dir = "/root/testdata/sf0.001"
    val docs = Tables.read(spark, dir, "documents").select(
      col("doc_id"), col("lang"),
      concat(col("text"),
        when(pmod(col("doc_id"), lit(3)) =!= 0,
          concat(lit(" tok_"), col("lang"))).otherwise(lit(""))).as("text"))
    val n = docs.count()
    val cut = (n * 4) / 5
    val train = docs.filter(col("doc_id") < cut)
    val test = docs.filter(col("doc_id") >= cut)
    val m = NaiveBayes.train(train, "doc_id", "text", "lang")
    val joined = NaiveBayes.predict(m, test, "doc_id", "text")
      .join(test.select(col("doc_id"), col("lang")), "doc_id")
    val acc = joined.filter(col("predicted") === col("lang")).count().toDouble /
      joined.count()
    val majority = train.groupBy("lang").count()
      .agg(max("count")).head.getLong(0).toDouble / train.count()
    assert(acc > majority, s"nb accuracy $acc should beat majority $majority")
  }

  test("count-min token sketch: over-count only, eps bound, exact on heavy hitters") {
    import graft.text.TextAnalysis
    import org.apache.spark.sql.functions.col
    val docs = Tables.read(spark, "/root/testdata/sf0.001", "documents")
    val exact = TextAnalysis.topNgrams(docs, col("text"), n = 1, k = 20)
      .collect().map(r => r.getString(0) -> r.getLong(1))
    val totalTokens = docs.selectExpr(
      "sum(size(split(trim(text), '\\\\s+')))").head.getLong(0)
    val cms = TextAnalysis.tokenCountSketch(docs, col("text"), eps = 0.001)
    exact.foreach { case (tok, n) =>
      val est = cms.estimateCount(tok)
      assert(est >= n, s"sketch must never under-count: $tok $est < $n")
      assert(est <= n + math.ceil(0.001 * totalTokens).toLong + 1,
        s"$tok est $est exceeds eps bound over true $n")
    }
    // unseen token: bounded by the same eps slack, not the corpus
    assert(cms.estimateCount("zzz_never_in_corpus") <=
      math.ceil(0.001 * totalTokens).toLong + 1)
    // deterministic for a fixed seed
    val again = TextAnalysis.tokenCountSketch(docs, col("text"), eps = 0.001)
    assert(exact.forall { case (t, _) =>
      again.estimateCount(t) == cms.estimateCount(t) })
  }

  test("frequent-items top-ngrams: exact at capacity, heavy hitters survive purging, partition-invariant") {
    import graft.text.TextAnalysis
    import org.apache.spark.sql.functions.col
    val docs = Tables.read(spark, "/root/testdata/sf0.001", "documents")
    def pairs(df: org.apache.spark.sql.DataFrame) =
      df.collect().map(r => r.getString(0) -> r.getLong(1)).toSeq
    val exact = pairs(TextAnalysis.topNgrams(docs, col("text"), n = 2, k = 15))
    // capacity >= distinct grams: no purge, the summary is exact and
    // order-independent — bit-identical to the groupBy plan
    val sketched = pairs(TextAnalysis.topNgramsSketched(
      docs, col("text"), n = 2, k = 15, capacity = 1 << 21))
    assert(sketched === exact, "purge-free sketch must equal the exact cut")
    // ... under ANY partitioning (merge path exercised)
    val repart = pairs(TextAnalysis.topNgramsSketched(
      docs.repartition(13), col("text"), n = 2, k = 15, capacity = 1 << 21))
    assert(repart === exact, "merge across partitions changed the result")
    // purging regime: a planted majority token on a long-tail corpus.
    // MG guarantees any item heavier than ~2*total/capacity survives —
    // at 50% mass and capacity 16 the heavy gram must be reported
    // first, with a lower-bound count no greater than the truth
    import spark.implicits.{localSeqToDatasetHolder, newStringEncoder}
    val heavy = Seq.fill(500)("aa") ++ (0 until 500).map(i => s"t$i")
    val tiny = heavy.map(t => Tuple1(t)).toDF("text")
    val got = pairs(TextAnalysis.topNgramsSketched(
      tiny, col("text"), n = 1, k = 3, capacity = 16))
    assert(got.nonEmpty && got.head._1 === "aa",
      s"majority item lost under purging: $got")
    assert(got.head._2 <= 500L, "Misra-Gries count must be a lower bound")
    assert(got.head._2 >= 400L,
      s"undercount exceeds the purge-mass bound: ${got.head._2}")
    // nulls and empties contribute nothing and do not throw
    val withNulls = Seq(Some("x x"), None, Some("")).map(Tuple1(_)).toDF("text")
    val n2 = pairs(TextAnalysis.topNgramsSketched(
      withNulls, col("text"), n = 1, k = 5, capacity = 16))
    assert(n2.filter(_._1 == "x").map(_._2) === Seq(2L))
  }

  test("weighted heavy hitters: purge-free == groupBy sum; heavy mass survives purging; nulls skipped") {
    import graft.text.TextAnalysis
    import org.apache.spark.sql.functions.{col, expr, sum => fsum}
    import spark.implicits.{localSeqToDatasetHolder, newProductEncoder}
    // (group, weight) rows: group g0..g9 with weight i%7+1
    val rows = (0 until 200).map(i => (s"g${i % 10}", (i % 7 + 1).toLong))
      .toDF("grp", "w")
    val exact = rows.groupBy("grp").agg(fsum("w").as("weight"))
      .orderBy(col("weight").desc, col("grp").asc).limit(4)
      .collect().map(r => (r.getString(0), r.getLong(1))).toSeq
    val got = TextAnalysis.heavyHitters(rows, col("grp"), col("w"),
      k = 4, capacity = 64)
      .collect().map(r => (r.getString(0), r.getLong(1))).toSeq
    assert(got === exact, "purge-free weighted summary must equal groupBy-sum")
    // one group carrying >half the total mass at capacity 4: present,
    // first, lower-bound weight
    val heavy = ((0 until 50).map(i => ("big", 100L)) ++
      (0 until 500).map(i => (s"t$i", 1L))).toDF("grp", "w")
    val hh = TextAnalysis.heavyHitters(heavy, col("grp"), col("w"),
      k = 2, capacity = 4)
      .collect().map(r => (r.getString(0), r.getLong(1))).toSeq
    assert(hh.nonEmpty && hh.head._1 === "big", s"heavy mass lost: $hh")
    assert(hh.head._2 <= 5000L && hh.head._2 >= 4000L,
      s"weighted lower bound out of range: ${hh.head._2}")
    // null groups and null/non-positive weights contribute nothing
    val edge = Seq((Some("a"), Some(3L)), (None, Some(9L)),
      (Some("a"), None), (Some("b"), Some(-5L)), (Some("b"), Some(2L)))
      .toDF("grp", "w")
    val e = TextAnalysis.heavyHitters(edge, col("grp"), col("w"),
      k = 5, capacity = 16)
      .collect().map(r => (r.getString(0), r.getLong(1))).toSeq
    assert(e === Seq(("a", 3L), ("b", 2L)), s"edge handling: $e")
  }
}
