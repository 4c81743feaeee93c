package graft

import org.apache.spark.sql.functions._

import graft.text.Bpe

/** Trained BPE tokenizer: the classic Sennrich fixture hand-derived,
  * distributed == local training, encode/count semantics. */
class BpeSpec extends SparkSpec {
  import spark.implicits.{localSeqToDatasetHolder, newProductEncoder}

  private val classicTable = Array(
    ("low", 5L), ("lower", 2L), ("newest", 6L), ("widest", 3L))

  test("classic fixture: merges match the hand derivation, 'lowest' -> low + est</w>") {
    val m = Bpe.trainLocal(classicTable, numMerges = 5)
    assert(m.merges.toSeq === Seq(
      ("e", "s"), ("es", "t"), ("est", "</w>"), ("l", "o"), ("lo", "w")))
    assert(Bpe.encodeWord("lowest", m).toSeq === Seq("low", "est</w>"))
    assert(Bpe.encodeWord("newest", m).toSeq === Seq("n", "e", "w", "est</w>"))
    // unseen word degrades to characters + marker, never fails
    assert(Bpe.encodeWord("xyz", m).toSeq === Seq("x", "y", "z", "</w>"))
  }

  test("distributed train == local train on the same word counts") {
    val docs = classicTable.zipWithIndex.flatMap { case ((w, c), i) =>
      (0 until c.toInt).map(r => (s"$i-$r", w))
    }.toSeq.toDF("id", "text").repartition(4)
    val dist = Bpe.train(docs, "text", numMerges = 5)
    val local = Bpe.trainLocal(classicTable, numMerges = 5)
    assert(dist.merges.toSeq === local.merges.toSeq)
  }

  test("encodeColumn: tokens reassemble the words; count matches; deterministic") {
    val m = Bpe.trainLocal(classicTable, numMerges = 5)
    val df = Seq((1, "lowest low"), (2, ""), (3, "  newest  ")).toDF("id", "text")
    val out = df.select(col("id"), Bpe.encodeColumn(col("text"), m).as("toks"),
      Bpe.tokenCount(col("text"), m).as("n"))
      .collect().map(r => r.getInt(0) -> (r.getSeq[String](1), r.getInt(2))).toMap
    assert(out(1)._1 === Seq("low", "est</w>", "low", "</w>"))
    assert(out(1)._2 === 4)
    assert(out(2)._1.isEmpty && out(2)._2 === 0)
    assert(out(3)._1 === Seq("n", "e", "w", "est</w>"))
    // reassembly: stripping </w> markers and joining re-forms the words
    val joined = out(1)._1.mkString("").replace("</w>", " ").trim
    assert(joined === "lowest low")
    // merge loop stops early when no pair repeats (count < 2)
    val tiny = Bpe.trainLocal(Array(("ab", 1L)), numMerges = 50)
    assert(tiny.merges.isEmpty)
  }
}
