package graft

/** Regenerator gate for the stored-expected fixture oracles — the only
  * gate rows whose oracle is a frozen literal instead of data-derived
  * SQL. Each test recomputes the fixture from a FRESH deterministic
  * build/training run at the gate scale (sf0.01) and diffs it against
  * the constant the oracle SQL is generated from; if the engine's
  * output ever drifts from the literal, this fails before the
  * correctness gate can pass a stale fixture. */
class FixtureRegenSpec extends SparkSpec {

  private val dir = "/root/testdata/sf0.01"

  test("ann_hnsw fixture == fresh deterministic builds (driver shim, sharded, persisted)") {
    val want = TrainingQueries.HnswFixtureSf001
      .sortBy { case (id, s) => (-s, id) }
    for (q <- Seq("ann_hnsw_topk", "ann_hnsw_sharded_topk",
        "ann_hnsw_persisted_topk")) {
      val res = TrainingQueries.queries(q)(spark, dir)
      val got = res.collect().map(r =>
          (r.getString(r.fieldIndex("id")), r.getDouble(r.fieldIndex("score"))))
        .sortBy { case (id, s) => (-s, id) }
      assert(got.toSeq === want, s"stored-expected fixture drift in $q")
    }
  }

  test("text_bpe_tokens fixture == freshly trained BPE tokenization") {
    val got = TrainingQueries.queries("text_bpe_tokens")(spark, dir)
      .collect().map(r => (r.getLong(0).toInt, r.getInt(1), r.getString(2)))
      .sortBy(_._1)
    assert(got.toSeq === TrainingQueries.BpeFixtureSf001)
  }
}
