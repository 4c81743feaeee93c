package graft.search

import org.apache.spark.sql.DataFrame
import org.apache.spark.sql.functions._

/** Rank fusion for hybrid retrieval: combine a lexical ranking (e.g.
  * [[graft.text.Bm25]]) with one or more vector rankings into a single
  * ordering without score calibration.
  *
  * Reciprocal Rank Fusion (Cormack/Clarke/Buettcher, SIGIR'09):
  * `rrf(d) = Σ_r 1 / (k0 + rank_r(d))` over the rankings that contain
  * `d`. Rank-based, so the wildly different score scales of BM25 vs
  * cosine never need normalizing — the reason RRF is the default
  * fusion in production hybrid search.
  *
  * Scale shape: inputs are already top-N result frames (bounded — N
  * rows each, not corpus-sized), so the outer joins here are trivial;
  * the heavy lifting happened in the per-ranking searches. The sum is
  * an explicit left-to-right chain in caller order, reproducible by an
  * oracle engine term-for-term.
  */
object Fusion {

  /** Standard RRF constant from the original paper. */
  val DefaultK0 = 60

  /** Fuse rankings (each: idCol + 1-based `rankCol`) by RRF. Output:
    * idCol, one `rank_<name>` per input (null = absent), `rrf_score`
    * (round-6), ordered by score desc then id asc; `limit` > 0 cuts. */
  def rrf(rankings: Seq[(String, DataFrame)], idCol: String,
      rankCol: String = "rank", k0: Int = DefaultK0,
      limit: Int = 0): DataFrame = {
    require(rankings.nonEmpty, "need at least one ranking")
    require(rankings.map(_._1).distinct.size == rankings.size,
      "ranking names must be unique")
    val renamed = rankings.map { case (name, df) =>
      name -> df.select(col(idCol), col(rankCol).cast("long").as(s"rank_$name"))
    }
    val joined = renamed.map(_._2).reduceLeft(_.join(_, Seq(idCol), "outer"))
    val score = renamed.map { case (name, _) =>
      coalesce(lit(1.0) / (lit(k0).cast("double") + col(s"rank_$name").cast("double")),
        lit(0.0))
    }.reduceLeft(_ + _)
    val out = joined
      .withColumn("rrf_score", round(score, 6))
      .orderBy(col("rrf_score").desc, col(idCol).asc)
    if (limit > 0) out.limit(limit) else out
  }
}
