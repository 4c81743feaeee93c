package graft

import graft.search.RankingEval

/** IR metrics: hand-derived recall/precision/MRR/nDCG, miss and
  * no-results queries, unlabeled queries omitted. */
class RankingEvalSpec extends SparkSpec {
  import spark.implicits._

  private def log2inv(r: Int): Double = math.log(2.0) / math.log(r + 1.0)

  test("per-query metrics: hand values, misses, no-results, unlabeled omitted") {
    val results = Seq(
      ("q1", "a", 1), ("q1", "x", 2), ("q1", "b", 3), ("q1", "y", 4), ("q1", "z", 5),
      ("q2", "m", 1), ("q2", "n", 2),
      ("q4", "w", 1)) // q4 has no labels
      .toDF("qid", "id", "rank")
    val labels = Seq(
      ("q1", "a"), ("q1", "b"), ("q1", "c"),   // 3 relevant, 2 retrieved
      ("q2", "zz"),                             // never retrieved
      ("q3", "aa"))                             // labeled, zero results
      .toDF("qid", "id")
    val out = RankingEval.perQuery(results, labels, k = 5)
      .collect().map(r => r.getString(0) ->
        ((r.getLong(1), r.getLong(2), r.getLong(3), r.getDouble(4),
          r.getDouble(5), r.getDouble(6), r.getDouble(7)))).toMap
    assert(out.keySet === Set("q1", "q2", "q3"), "unlabeled q4 omitted")
    val q1 = out("q1")
    assert((q1._1, q1._2, q1._3) === ((3L, 5L, 2L)))
    assert(math.abs(q1._4 - 2.0 / 3.0) < 1e-12)
    assert(math.abs(q1._5 - 0.4) < 1e-12)
    assert(q1._6 === 1.0)
    val idcg = log2inv(1) + log2inv(2) + log2inv(3)
    assert(math.abs(q1._7 - (log2inv(1) + log2inv(3)) / idcg) < 1e-12)
    assert(out("q2") === ((1L, 2L, 0L, 0.0, 0.0, 0.0, 0.0)))
    assert(out("q3") === ((1L, 0L, 0L, 0.0, 0.0, 0.0, 0.0)))
  }

  test("summary macro-averages every labeled query equally; perfect retrieval = 1.0") {
    val results = Seq(("q1", "a", 1), ("q2", "b", 1)).toDF("qid", "id", "rank")
    val labels = Seq(("q1", "a"), ("q2", "b")).toDF("qid", "id")
    val s = RankingEval.summary(results, labels, k = 5).collect().head
    assert(s.getLong(0) === 2L)
    assert(s.getDouble(1) === 1.0 && s.getDouble(3) === 1.0 && s.getDouble(4) === 1.0)
    // cutoff bites: a hit at rank 6 counts for MRR but not recall@5/ndcg@5
    val late = Seq(("q1", "a", 6)).toDF("qid", "id", "rank")
    val l2 = Seq(("q1", "a")).toDF("qid", "id")
    val p = RankingEval.perQuery(late, l2, k = 5).collect().head
    assert(p.getDouble(4) === 0.0 && math.abs(p.getDouble(6) - 1.0 / 6.0) < 1e-12)
    assert(p.getDouble(7) === 0.0)
  }

  test("hard negatives: positives excluded, rank order kept, cap, all-positive query drops") {
    import graft.search.Mining
    val results = Seq(
      ("q1", "a", 1), ("q1", "b", 2), ("q1", "c", 3), ("q1", "d", 4), ("q1", "e", 5),
      ("q2", "x", 1), ("q2", "y", 2)) // q2's whole list is positive
      .toDF("qid", "id", "rank")
    val positives = Seq(("q1", "b"), ("q2", "x"), ("q2", "y")).toDF("qid", "id")
    val negs = Mining.hardNegatives(results, positives, k = 3)
      .collect().map(r => (r.getString(0), r.getString(1), r.getInt(3)))
    // q1: a,c,d survive in rank order with neg_rank 1..3 (e cut by k);
    // q2 contributes nothing
    assert(negs.toSeq.sortBy(_._3) ===
      Seq(("q1", "a", 1), ("q1", "c", 2), ("q1", "d", 3)))
    // triples: every (q1, positive) pair crossed with its top negsPerPair
    val tri = Mining.trainingTriples(results, positives, k = 3, negsPerPair = 2)
      .collect().map(r => (r.getString(0), r.getString(1), r.getString(2), r.getInt(3)))
    assert(tri.toSet === Set(
      ("q1", "b", "a", 1), ("q1", "b", "c", 2)))
  }
}
