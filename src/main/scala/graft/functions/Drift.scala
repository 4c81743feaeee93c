package graft.functions

import org.apache.spark.sql.{Column, DataFrame}
import org.apache.spark.sql.functions._

/** Distribution-drift monitoring between a REFERENCE corpus (the data a
  * model/filter was tuned on) and a CURRENT batch (the new crawl) — the
  * ops layer of a continuously-ingesting training pipeline: a quality
  * score whose distribution drifts means thresholds tuned last month
  * silently cut different data today.
  */
object Drift {

  /** Population Stability Index over one numeric column, fixed-width
    * buckets spanning the REFERENCE min/max (current-side outliers
    * clamp into the edge buckets, so mass leaving the reference range
    * is visible as edge-bucket inflation). Returns one row per bucket:
    * (bucket, ref_frac, cur_frac, psi_term) with the classic
    * eps-substitution (`max(p, eps)`) keeping empty buckets finite;
    * `Σ psi_term` is the PSI (rule of thumb: < 0.1 stable, > 0.25
    * drifted).
    *
    * Scale shape: one 2-scalar agg on the reference (min/max), then one
    * grouped count per side — every stage partial-aggregatable, shuffle
    * volume = `buckets` rows; nothing driver-resident but the two
    * scalars. Every arithmetic step (width, floor-bucket, fractions,
    * ln ratio) is plain double math an oracle engine replicates
    * exactly.
    * {{{
    * val ref = Seq(1.0, 2.0, 3.0, 4.0, 5.0, 6.0, 7.0, 8.0, 9.0, 10.0).toDF("x")
    * Drift.psi(ref, ref, "x").agg(sum("psi_term")).head.getDouble(0)   // 0.0
    * val cur = Seq(9.0, 9.5, 10.0).toDF("x")   // mass moved to the top bucket
    * Drift.psi(ref, cur, "x").agg(sum("psi_term")).head.getDouble(0)   // > 0.25
    * }}} */
  def psi(ref: DataFrame, cur: DataFrame, colName: String,
      buckets: Int = 10, eps: Double = 1e-6): DataFrame = {
    require(buckets > 1, "need at least 2 buckets")
    require(eps > 0, "eps must be positive")
    val mm = ref.agg(min(col(colName)).cast("double").as("mn"),
      max(col(colName)).cast("double").as("mx")).head()
    require(!mm.isNullAt(0) && !mm.isNullAt(1),
      s"reference $colName has no non-null rows — PSI undefined")
    val (mn, mx) = (mm.getDouble(0), mm.getDouble(1))
    require(mx > mn, s"reference $colName is constant — PSI undefined")
    val width = (mx - mn) / buckets
    def bucketed(df: DataFrame): Column =
      least(lit(buckets - 1), greatest(lit(0),
        floor((col(colName).cast("double") - lit(mn)) / lit(width)).cast("int")))
    def counts(df: DataFrame, out: String): DataFrame =
      df.filter(col(colName).isNotNull)
        .groupBy(bucketed(df).as("bucket"))
        .agg(count(lit(1)).as(out))
    val spark = ref.sparkSession
    import spark.implicits._
    val all = (0 until buckets).toDF("bucket")
    val joined = all
      .join(counts(ref, "_nr"), Seq("bucket"), "left")
      .join(counts(cur, "_nc"), Seq("bucket"), "left")
      .select(col("bucket"),
        coalesce(col("_nr"), lit(0L)).as("_nr"),
        coalesce(col("_nc"), lit(0L)).as("_nc"))
    val tot = joined.agg(sum(col("_nr")).as("_tr"), sum(col("_nc")).as("_tc"))
    // an EMPTY current side would make _nc/_tc = 0/0 = NaN, and NaN
    // passes greatest() (NaN compares greatest in Spark) — guard to the
    // eps floor instead so the PSI stays finite (and maximal)
    val pa = when(col("_tr") > 0,
      greatest(col("_nr").cast("double") / col("_tr").cast("double"), lit(eps)))
      .otherwise(lit(eps))
    val pb = when(col("_tc") > 0,
      greatest(col("_nc").cast("double") / col("_tc").cast("double"), lit(eps)))
      .otherwise(lit(eps))
    joined.crossJoin(broadcast(tot))
      .select(col("bucket"),
        pa.as("ref_frac"), pb.as("cur_frac"),
        ((pa - pb) * log(pa / pb)).as("psi_term"))
  }

  /** [[psi]] over a CATEGORICAL column (language mix, source mix,
    * label balance): one cell per category from the union of both
    * sides' values, same eps-substituted terms. A new current-side
    * category shows up as (eps, its-share) — maximally flagged, which
    * is the right alarm for "a source appeared that the reference
    * never saw". NULL categories count as a real category (they are a
    * mix share too). Shuffle = one grouped count per side.
    * {{{
    * val refLang = Seq("en", "en", "en", "de").toDF("lang")
    * val curLang = Seq("en", "zz", "zz", "zz").toDF("lang")   // new source
    * Drift.psiCategorical(refLang, curLang, "lang")
    *   .filter(col("category") === "zz").head.getDouble(3)    // large psi_term
    * }}} */
  def psiCategorical(ref: DataFrame, cur: DataFrame, colName: String,
      eps: Double = 1e-6): DataFrame = {
    require(eps > 0, "eps must be positive")
    def counts(df: DataFrame, out: String): DataFrame =
      df.groupBy(col(colName).as("category"))
        .agg(count(lit(1)).as(out))
    // null-safe join: a NULL category is a real mix share and must
    // align across sides instead of splitting into two rows
    val r = counts(ref, "_nr")
    val c = counts(cur, "_nc").withColumnRenamed("category", "_cat2")
    val joined = r.join(c, r("category") <=> c("_cat2"), "full")
      .select(coalesce(r("category"), c("_cat2")).as("category"),
        coalesce(col("_nr"), lit(0L)).as("_nr"),
        coalesce(col("_nc"), lit(0L)).as("_nc"))
    val tot = joined.agg(sum(col("_nr")).as("_tr"), sum(col("_nc")).as("_tc"))
    // empty-side guard: see [[psi]] (0/0 = NaN would pass greatest)
    val pa = when(col("_tr") > 0,
      greatest(col("_nr").cast("double") / col("_tr").cast("double"), lit(eps)))
      .otherwise(lit(eps))
    val pb = when(col("_tc") > 0,
      greatest(col("_nc").cast("double") / col("_tc").cast("double"), lit(eps)))
      .otherwise(lit(eps))
    joined.crossJoin(broadcast(tot))
      .select(col("category"), pa.as("ref_frac"), pb.as("cur_frac"),
        ((pa - pb) * log(pa / pb)).as("psi_term"))
  }

  /** [[psi]] per group (the multilingual monitor: drift per language /
    * per source, where a stable global distribution can hide a badly
    * drifted tail group). Bucket edges are per-group reference min/max
    * (each group monitors its own scale). Groups with no usable
    * REFERENCE range (absent, all-null, or constant) are skipped —
    * there is nothing to bucket against; a group present in the
    * reference but ABSENT from the current batch IS emitted, with
    * cur_frac at the eps floor in every bucket (maximal psi_terms):
    * "a group we tuned on disappeared" is exactly the alarm a drift
    * monitor must raise. Output: one row
    * per (group, bucket) with the same eps-substituted psi_term.
    * Same shuffle discipline as [[psi]], keyed by (group, bucket).
    * {{{
    * val refG = Seq(("en", 1.0), ("en", 2.0), ("en", 3.0), ("de", 1.0),
    *   ("de", 2.0), ("de", 3.0)).toDF("lang", "x")
    * val curG = Seq(("en", 1.0), ("en", 2.0), ("en", 3.0), ("de", 3.0),
    *   ("de", 3.0), ("de", 3.0)).toDF("lang", "x")   // de drifted, en stable
    * Drift.psiByGroup(refG, curG, "x", "lang").groupBy("lang")
    *   .agg(sum("psi_term").as("psi"))   // en ~0, de large
    * }}} */
  def psiByGroup(ref: DataFrame, cur: DataFrame, colName: String,
      groupCol: String, buckets: Int = 10, eps: Double = 1e-6): DataFrame = {
    require(buckets > 1, "need at least 2 buckets")
    require(eps > 0, "eps must be positive")
    val mm = ref.filter(col(colName).isNotNull)
      .groupBy(col(groupCol).as("_g"))
      .agg(min(col(colName)).cast("double").as("_mn"),
        max(col(colName)).cast("double").as("_mx"))
      .filter(col("_mx") > col("_mn"))
    def counts(df: DataFrame, out: String): DataFrame =
      df.filter(col(colName).isNotNull)
        .select(col(groupCol).as("_g"), col(colName).cast("double").as("_x"))
        .join(mm, Seq("_g"))
        .select(col("_g"),
          least(lit(buckets - 1), greatest(lit(0),
            floor((col("_x") - col("_mn")) /
              ((col("_mx") - col("_mn")) / buckets)).cast("int"))).as("bucket"))
        .groupBy(col("_g"), col("bucket")).agg(count(lit(1)).as(out))
    val spark = ref.sparkSession
    import spark.implicits._
    val grid = mm.select(col("_g"))
      .crossJoin((0 until buckets).toDF("bucket"))
    val withCounts = grid
      .join(counts(ref, "_nr"), Seq("_g", "bucket"), "left")
      .join(counts(cur, "_nc"), Seq("_g", "bucket"), "left")
      .select(col("_g"), col("bucket"),
        coalesce(col("_nr"), lit(0L)).as("_nr"),
        coalesce(col("_nc"), lit(0L)).as("_nc"))
    val tot = withCounts.groupBy(col("_g"))
      .agg(sum(col("_nr")).as("_tr"), sum(col("_nc")).as("_tc"))
    val pa = greatest(col("_nr").cast("double") / col("_tr").cast("double"), lit(eps))
    val pb = when(col("_tc") > 0,
      greatest(col("_nc").cast("double") / col("_tc").cast("double"), lit(eps)))
      .otherwise(lit(eps))
    withCounts.join(tot, Seq("_g"))
      .select(col("_g").as(groupCol), col("bucket"),
        pa.as("ref_frac"), pb.as("cur_frac"),
        ((pa - pb) * log(pa / pb)).as("psi_term"))
  }

  /** [[psiCategorical]] over the EMBEDDING distribution — drift in
    * embedding SPACE rather than in any scalar column: each vector is
    * assigned to its nearest centroid (the same first-min L2 argmin the
    * IVF family serves from, as one codegen projection —
    * [[graft.expr.IvfCell]]) and the cell mix is compared ref vs
    * current. This is the monitor a continuously-ingesting embedding
    * pipeline needs: a new crawl whose scalar stats look stable can
    * still concentrate in one corner of embedding space (a template
    * farm, a new language, an encoder regression), and that shows up
    * as cell-mass movement before any downstream metric moves. The
    * centroids come from ANY trained coarse quantizer (e.g.
    * [[graft.ann.IvfIndex.train]] or a collection's persisted IVF
    * sidecar); holding them FIXED across batches is what makes PSI
    * values comparable over time.
    *
    * Scale shape: assignment is a stateless codegen projection (the
    * k x d centroid table rides the closure), then one grouped count
    * per side — shuffle volume = k rows; nothing driver-resident. Null
    * vectors are skipped like [[psi]] skips null scalars. Output: one
    * row per OBSERVED cell (cell, ref_frac, cur_frac, psi_term) with
    * the same eps-substituted terms; `Σ psi_term` is the PSI. */
  def psiEmbedding(ref: DataFrame, cur: DataFrame, vecCol: String,
      centroids: Array[Array[Float]], eps: Double = 1e-6): DataFrame = {
    require(centroids.nonEmpty, "need at least one centroid")
    def cells(df: DataFrame): DataFrame =
      df.filter(col(vecCol).isNotNull)
        .select(org.apache.spark.sql.graft.Bridge.column(
          graft.expr.IvfCell(org.apache.spark.sql.graft.Bridge.expression(
            col(vecCol)), centroids)).as("cell"))
    psiCategorical(cells(ref), cells(cur), "cell")
      .withColumnRenamed("category", "cell")
  }

  /** Streaming form of [[psiEmbedding]] — the ONLINE embedding-drift
    * monitor: the incoming stream's vectors assign to their nearest
    * centroid (same codegen projection), and each event-time window
    * emits one row per cell comparing that window's cell mix against
    * the FIXED reference mix (measured once, batch, from `ref`). State
    * is ONE aggregation of k longs per open window — conditional sums
    * over the known cell ids, not a per-row or per-distinct-value
    * buffer — so a 100 TB/day stream holds (windows in flight) x k
    * counters and nothing else; rows emit when the watermark closes
    * the window (append mode). Cells the window never saw emit with
    * the eps floor (mass DISAPPEARING from a cell is drift too), and
    * every k cell is present in every emitted window, so downstream
    * `Σ psi_term per window` is directly comparable across windows.
    * Designed for COARSE monitors: the plan carries k aggregate
    * columns, so keep k in the tens-to-hundreds a mix monitor actually
    * wants — drift over a finer structure belongs in the batch form.
    * Output: (window_start, window_end, cell, ref_frac, cur_frac,
    * psi_term). */
  def psiEmbeddingStream(cur: DataFrame, vecCol: String, timeCol: String,
      ref: DataFrame, centroids: Array[Array[Float]], windowDur: String,
      watermark: String, eps: Double = 1e-6): DataFrame = {
    require(centroids.nonEmpty, "need at least one centroid")
    require(eps > 0, "eps must be positive")
    val k = centroids.length
    def cellOf(c: Column): Column =
      org.apache.spark.sql.graft.Bridge.column(
        graft.expr.IvfCell(org.apache.spark.sql.graft.Bridge.expression(c),
          centroids))
    // the fixed reference mix: k grouped counts, driver-resident k rows
    val refRows = ref.filter(col(vecCol).isNotNull)
      .groupBy(cellOf(col(vecCol)).as("cell")).agg(count(lit(1)).as("n"))
      .collect().map(r => r.getInt(0) -> r.getLong(1)).toMap
    val refTot = refRows.values.sum
    require(refTot > 0, "reference has no non-null vectors — PSI undefined")
    val refFrac: Map[Int, Double] =
      (0 until k).map(i => i -> math.max(
        refRows.getOrElse(i, 0L).toDouble / refTot, eps)).toMap
    val cnts = (0 until k).map(i =>
      sum(when(col("_cell") === i, 1L).otherwise(0L)).as(s"_c$i"))
    val agged = cur.filter(col(vecCol).isNotNull)
      .select(col(timeCol).as("_ts"), cellOf(col(vecCol)).as("_cell"))
      .withWatermark("_ts", watermark)
      .groupBy(window(col("_ts"), windowDur))
      .agg(cnts.head, cnts.tail: _*)
    val total = (0 until k).map(i => col(s"_c$i")).reduce(_ + _)
    val entries = array((0 until k).map(i =>
      struct(lit(i).as("cell"), col(s"_c$i").as("cnt"))): _*)
    val pa = coalesce(element_at(typedLit(refFrac), col("cell")), lit(eps))
    val pb = when(col("_tot") > 0,
      greatest(col("cnt").cast("double") / col("_tot").cast("double"),
        lit(eps))).otherwise(lit(eps))
    agged.select(col("window.start").as("window_start"),
        col("window.end").as("window_end"), total.as("_tot"),
        explode(entries).as("_e"))
      .select(col("window_start"), col("window_end"),
        col("_e.cell").as("cell"), col("_tot"), col("_e.cnt").as("cnt"))
      .select(col("window_start"), col("window_end"), col("cell"),
        pa.as("ref_frac"), pb.as("cur_frac"),
        ((pa - pb) * log(pa / pb)).as("psi_term"))
  }

  /** Standardized mean difference (Cohen's d with pooled variance) of
    * one numeric column between reference and current — the scalar
    * first-look companion to [[psi]]. One aggregation per side
    * (count/mean via sum, population variance via sum of squares);
    * output is a single row (ref_mean, cur_mean, pooled_std, smd).
    * {{{
    * val a = Seq(0.0, 2.0).toDF("x")   // mean 1, var 1
    * val b = Seq(3.0, 5.0).toDF("x")   // mean 4, var 1
    * Drift.standardizedMeanDiff(a, b, "x").head.getDouble(3)   // 3.0
    * }}} */
  def standardizedMeanDiff(ref: DataFrame, cur: DataFrame,
      colName: String): DataFrame = {
    def stats(df: DataFrame, p: String): DataFrame =
      df.filter(col(colName).isNotNull)
        .agg(count(lit(1)).cast("double").as(s"${p}n"),
          sum(col(colName).cast("double")).as(s"${p}s"),
          sum(col(colName).cast("double") * col(colName).cast("double"))
            .as(s"${p}ss"))
    val j = stats(ref, "r").crossJoin(stats(cur, "c"))
    val rMean = col("rs") / col("rn")
    val cMean = col("cs") / col("cn")
    val rVar = col("rss") / col("rn") - rMean * rMean
    val cVar = col("css") / col("cn") - cMean * cMean
    val pooled = sqrt((rVar * col("rn") + cVar * col("cn")) /
      (col("rn") + col("cn")))
    j.select(rMean.as("ref_mean"), cMean.as("cur_mean"),
      pooled.as("pooled_std"),
      ((cMean - rMean) / pooled).as("smd"))
  }
}
