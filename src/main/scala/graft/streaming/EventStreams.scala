package graft.streaming

import org.apache.spark.sql.{DataFrame, SparkSession}
import org.apache.spark.sql.expressions.Window
import org.apache.spark.sql.functions._
import org.apache.spark.sql.streaming.DataStreamWriter
import org.apache.spark.sql.types.{LongType, StructType, TimestampNTZType}

/** Event-stream operators. The reference has no streaming surface
  * (SURVEY §2.9), so this module covers the training-pipeline side:
  * windowed aggregation and sessionization, written once as batch
  * transforms and reusable verbatim under Structured Streaming
  * (readStream -> same transform -> writeStream).
  *
  * Timestamps: every operator takes the ts column as stored — raw Long
  * nanos, TIMESTAMP, or TIMESTAMP_NTZ (what Spark infers for the test
  * tables' timestamp[us] parquet) — and converts through [[epochMicros]]
  * to exact integer epoch arithmetic; no precision cliff between
  * engines and no session-timezone dependence.
  *
  * Scaladoc examples below share this toy frame (`ts` = raw epoch
  * NANOS in a Long column, the module default; DocExamplesSpec runs
  * every example verbatim):
  * {{{
  * val events = Seq(
  *   ("u1",  0L                , "view",     1.0, "e1"),
  *   ("u1",  5L * 1000000000L  , "click",    2.0, "e2"),
  *   ("u1", 40L * 1000000000L  , "purchase", 3.0, "e3"),
  *   ("u2", 10L * 1000000000L  , "view",     4.0, "e4")
  * ).toDF("user_id", "ts", "event_type", "value", "event_id")
  * }}}
  */
object EventStreams {

  /** Epoch microseconds from a Long, TIMESTAMP, or TIMESTAMP_NTZ
    * column. NTZ (what Spark infers for the test tables' timestamp[us]
    * parquet) has no session-zone: diff against the NTZ epoch literal —
    * tz-free wall-clock micros, exactly DuckDB's `epoch_us` of a naive
    * timestamp, with no dependence on the session timezone.
    *
    * A LongType ts column is interpreted as raw epoch NANOS by default
    * (the documented legacy contract). A caller whose long column holds
    * a different unit sets `spark.graft.events.longTsUnit` to one of
    * nanos | micros | millis | seconds — silently-wrong windows from a
    * unit mismatch have no type-level signal, so the unit is an
    * explicit, validated setting rather than a guess.
    * {{{
    * events.select(EventStreams.epochMicros(events, "ts").as("us"))
    *   .agg(max("us")).head.getLong(0)   // 40000000L: nanos div 1000
    * }}} */
  def epochMicros(df: DataFrame, tsCol: String): org.apache.spark.sql.Column =
    df.schema(tsCol).dataType match {
      case LongType => longTsUnit(df) match {
        case "nanos"   => expr(s"`$tsCol` div 1000")
        case "micros"  => col(tsCol)
        case "millis"  => col(tsCol) * lit(1000L)
        case "seconds" => col(tsCol) * lit(1000000L)
      }
      case _: TimestampNTZType =>
        expr(s"timestampdiff(MICROSECOND, TIMESTAMP_NTZ '1970-01-01 00:00:00', `$tsCol`)")
      case _ => unix_micros(col(tsCol))
    }

  private def longTsUnit(df: DataFrame): String = {
    val u = df.sparkSession.conf
      .getOption("spark.graft.events.longTsUnit").getOrElse("nanos")
    require(Set("nanos", "micros", "millis", "seconds")(u),
      s"spark.graft.events.longTsUnit must be nanos|micros|millis|seconds, got $u")
    u
  }

  /** Nanos column from either a Long or timestamp column (Long unit per
    * `spark.graft.events.longTsUnit`, default raw nanos). */
  private def nanos(df: DataFrame, tsCol: String) =
    df.schema(tsCol).dataType match {
      case LongType if longTsUnit(df) == "nanos" => col(tsCol)
      case _ => epochMicros(df, tsCol) * lit(1000L)
    }

  /** Tumbling-window counts/sums per event type. Window start is emitted
    * as epoch seconds (exact integer).
    * {{{
    * EventStreams.windowedStats(events, windowSeconds = 10)
    *   // (0, view, 1, 1.0), (0, click, 1, 2.0), (10, view, 1, 4.0),
    *   // (40, purchase, 1, 3.0)
    * }}} */
  def windowedStats(events: DataFrame, windowSeconds: Long = 3600L,
      tsCol: String = "ts"): DataFrame = {
    // integer `div`, not fp division: epoch nanos overflow double's 2^53
    val withSec = events.withColumn("_ns", nanos(events, tsCol))
      .withColumn("_sec", expr("_ns div 1000000000"))
    withSec.groupBy(
      (col("_sec") - pmod(col("_sec"), lit(windowSeconds))).as("window_start_epoch"),
      col("event_type"))
      .agg(count(lit(1)).as("cnt"), sum(col("value")).as("sum_value"))
  }

  /** Sliding (hopping) window aggregation: each event lands in every
    * `windowSeconds`-long window whose start is a multiple of
    * `slideSeconds` covering it — `windowSeconds / slideSeconds`
    * windows per event (requires slide | window so the window set is a
    * clean partition cover, like Spark's own `window()` constraint).
    * Shape: a bounded explode (the per-event window list is a tiny
    * integer sequence built with `div` arithmetic — epoch nanos
    * overflow double, so never fp division) into ONE groupBy with
    * map-side partial aggregation; shuffle volume = events x
    * (window/slide), never a self-join or range join. This batch form
    * groups by a derived start column; the STREAMING form is
    * [[streamingSlidingWindowStats]] (Spark's native
    * `window(ts, win, slide)`, whose event-time key the watermark can
    * evict) — same window-assignment semantics, pinned stream ≡ batch
    * in StatefulStreamingSpec.
    * {{{
    * EventStreams.slidingWindowStats(events, windowSeconds = 20,
    *   slideSeconds = 10)   // each event lands in its 2 covering windows
    * }}} */
  def slidingWindowStats(events: DataFrame, windowSeconds: Long,
      slideSeconds: Long, tsCol: String = "ts"): DataFrame = {
    require(windowSeconds > 0 && slideSeconds > 0, "window/slide must be positive")
    require(windowSeconds % slideSeconds == 0,
      "windowSeconds must be a multiple of slideSeconds")
    val nPer = (windowSeconds / slideSeconds).toInt
    val withSec = events.withColumn("_ns", nanos(events, tsCol))
      .withColumn("_sec", expr("_ns div 1000000000"))
    // latest covering window starts at the event's slide bucket; the
    // nPer starts walk backwards from there, clipped at t - window
    val lastStart = col("_sec") - pmod(col("_sec"), lit(slideSeconds))
    val starts = filter(
      transform(sequence(lit(0), lit(nPer - 1)),
        i => lastStart - i.cast("long") * lit(slideSeconds)),
      st => st > col("_sec") - lit(windowSeconds))
    withSec.select(col("event_type"), col("value"),
        explode(starts).as("window_start_epoch"))
      .groupBy(col("window_start_epoch"), col("event_type"))
      .agg(count(lit(1)).as("cnt"), sum(col("value")).as("sum_value"))
  }

  /** Trailing per-key rolling features: for each event, count/
    * sum/avg/max of `valueCol` over that key's last `k` events up to
    * and including it (ROWS frame, ordered by (ts, event_id) so the
    * frame is total even at duplicate timestamps) — the lag-feature
    * projection of training pipelines ("user's activity over their
    * last k events"). ONE shuffle + per-key sort; the bounded ROWS
    * frame walks each partition linearly — no self-join, no explode,
    * cost independent of k's time span.
    * {{{
    * EventStreams.rollingStats(events, k = 2)
    *   .filter(col("event_id") === "e2").head   // roll_n 2, roll_avg 1.5
    * }}} */
  def rollingStats(events: DataFrame, k: Int, tsCol: String = "ts",
      keyCol: String = "user_id", valueCol: String = "value",
      idCol: String = "event_id"): DataFrame = {
    require(k > 0, "k must be positive")
    val withUs = events.withColumn("_us", epochMicros(events, tsCol))
    val w = Window.partitionBy(col(keyCol))
      .orderBy(col("_us"), col(idCol))
      .rowsBetween(-(k - 1).toLong, 0L)
    withUs.select(col(idCol), col(keyCol), col("_us").as("ts_us"),
      count(lit(1)).over(w).as("roll_n"),
      sum(col(valueCol)).over(w).as("roll_sum"),
      avg(col(valueCol)).over(w).as("roll_avg"),
      max(col(valueCol)).over(w).as("roll_max"))
  }

  /** Most common session paths: sessionize (islands rule, same
    * strictly-greater gap boundary as [[sessionize]]), render each
    * session as its time-ordered event-type chain ("view>click>
    * purchase"), count identical chains, keep the `topK` most common
    * (ties by path) — the "what do users actually do" product
    * analytics query. Two keyed shuffles (user windows, then path
    * counts) + one bounded TakeOrdered; per-session state is that
    * session's type list.
    * {{{
    * EventStreams.topSessionPaths(events, gapSeconds = 20, topK = 3)
    *   // ("view", 2 sessions), ("purchase", 1), ("view>click" ... by gaps)
    * }}} */
  def topSessionPaths(events: DataFrame, gapSeconds: Long, topK: Int,
      tsCol: String = "ts"): DataFrame = {
    require(topK > 0, "topK must be positive")
    val ns = nanos(events, tsCol)
    val byUser = Window.partitionBy(col("user_id")).orderBy(col("_ts_ns"))
    val withSess = events.withColumn("_ts_ns", ns)
      .withColumn("_prev", lag(col("_ts_ns"), 1).over(byUser))
      .withColumn("_new_session",
        when(col("_prev").isNull, 1)
          .when(col("_ts_ns") - col("_prev") > gapSeconds * 1000000000L, 1)
          .otherwise(0))
      .withColumn("_sid", sum(col("_new_session")).over(
        byUser.rowsBetween(Window.unboundedPreceding, 0)))
    withSess.groupBy(col("user_id"), col("_sid"))
      .agg(sort_array(collect_list(struct(col("_ts_ns"), col("event_type"))))
        .as("_evs"))
      .select(concat_ws(">",
        transform(col("_evs"), e => e.getField("event_type"))).as("path"))
      .groupBy(col("path")).agg(count(lit(1)).as("n_sessions"))
      .orderBy(col("n_sessions").desc, col("path").asc)
      .limit(topK)
  }

  /** Per-user behavioral features in ONE shuffle: event count, distinct
    * active buckets (default: days), first/last event micros, and the
    * MEDIAN inter-event gap (exact — per-user sorted fold over the
    * collected timestamps; even counts average the two middles). The
    * feature projection of churn/engagement models. Per-user state is
    * that user's timestamp list — the same bounded-by-user-history
    * contract as [[funnelSteps]].
    * {{{
    * EventStreams.userActivityFeatures(events, bucketSeconds = 10)
    *   .filter(col("user_id") === "u1").head
    *   // n_events 3, active_buckets 2, median_gap_us 20000000
    * }}} */
  def userActivityFeatures(events: DataFrame, bucketSeconds: Long = 86400L,
      tsCol: String = "ts", userCol: String = "user_id"): DataFrame = {
    require(bucketSeconds > 0, "bucket must be positive")
    val withUs = events.withColumn("_us", epochMicros(events, tsCol))
      .withColumn("_b", expr(s"_us div ${bucketSeconds * 1000000L}"))
    val agged = withUs.groupBy(col(userCol).as("user_id"))
      .agg(count(lit(1)).as("n_events"),
        count_distinct(col("_b")).as("active_buckets"),
        min(col("_us")).as("first_us"), max(col("_us")).as("last_us"),
        sort_array(collect_list(col("_us"))).as("_l"))
    val gaps = sort_array(transform(sequence(lit(1), size(col("_l")) - 1),
      i => element_at(col("_l"), i + 1) - element_at(col("_l"), i)))
    val m = size(col("_g"))
    agged.withColumn("_g", when(size(col("_l")) >= 2, gaps)
        .otherwise(array().cast("array<bigint>")))
      .withColumn("median_gap_us",
        when(m === 0, lit(null).cast("double"))
          .when(m % 2 === 1,
            element_at(col("_g"), ((m + 1) / 2).cast("int")).cast("double"))
          .otherwise((element_at(col("_g"), (m / 2).cast("int")) +
            element_at(col("_g"), (m / 2).cast("int") + 1)).cast("double") / 2.0))
      .select(col("user_id"), col("n_events"), col("active_buckets"),
        col("first_us"), col("last_us"), col("median_gap_us"))
  }

  /** Rolling z-score anomaly signal: each event scored against the
    * mean/std of its key's PRIOR `k` events (frame excludes the
    * current row, so a spike can't mask itself) — the streaming-shape
    * outlier/fraud/bot flag. z is null until 2 prior events exist or
    * while the prior window is constant (std 0 — a first deviation
    * from a flat history is flagged by `prior_std = 0 && value !=
    * prior_mean`, not by an infinite z). Population std, same ROWS
    * discipline as [[rollingStats]], ONE shuffle.
    * {{{
    * EventStreams.rollingZScore(events, k = 2)
    *   .filter(col("event_id") === "e3").head   // z from e1/e2's mean/std
    * }}} */
  def rollingZScore(events: DataFrame, k: Int, tsCol: String = "ts",
      keyCol: String = "user_id", valueCol: String = "value",
      idCol: String = "event_id"): DataFrame = {
    require(k > 1, "need at least 2 prior events")
    val withUs = events.withColumn("_us", epochMicros(events, tsCol))
    val w = Window.partitionBy(col(keyCol))
      .orderBy(col("_us"), col(idCol))
      .rowsBetween(-k.toLong, -1L)
    val n = count(lit(1)).over(w)
    val mean = avg(col(valueCol)).over(w)
    val std = sqrt(greatest(
      avg(col(valueCol) * col(valueCol)).over(w) - mean * mean, lit(0.0)))
    withUs.select(col(idCol), col(keyCol), col("_us").as("ts_us"),
      col(valueCol).cast("double").as("value"),
      n.as("prior_n"), mean.as("prior_mean"), std.as("prior_std"),
      // the constant-window guard is an epsilon, not an exact 0: k
      // identical doubles can leave a ~1e-16 residual whose exact value
      // is association-order-dependent, and engines disagree on it
      when(n >= 2 && std > lit(1e-9),
        (col(valueCol).cast("double") - mean) / std)
        .otherwise(lit(null)).cast("double").as("z"))
  }

  /** Sessionization via Spark's NATIVE `session_window` (merge-on-gap):
    * sessions close when the next event arrives `gapSeconds` OR MORE
    * after the previous one (Spark merges while `next < prev + gap`;
    * note the boundary differs from [[sessionize]]'s strictly-greater
    * islands rule — an event at exactly `gap` starts a NEW session
    * here). Emits (user_id, session_start_us, session_end_us =
    * last_ts + gap, n_events, session_value). Works identically on a
    * batch frame (gated against a lag-based islands SQL oracle) and
    * under Structured Streaming, where the session state is
    * watermark-managed by the engine instead of
    * [[statefulSessionize]]'s explicit flatMapGroupsWithState.
    * {{{
    * val tsd = events.withColumn("tst", timestamp_micros(expr("ts div 1000")))
    * EventStreams.sessionWindowStats(tsd, gapSeconds = 20, tsCol = "tst")
    *   .filter(col("user_id") === "u1")   // 2 sessions: {e1,e2} and {e3}
    * }}} */
  def sessionWindowStats(events: DataFrame, gapSeconds: Long,
      tsCol: String = "ts", watermark: String = "2 hours"): DataFrame = {
    require(gapSeconds > 0, "gap must be positive")
    val base =
      if (events.isStreaming) events.withWatermark(tsCol, watermark)
      else events
    val grouped = base.groupBy(col("user_id"),
        session_window(col(tsCol), s"$gapSeconds seconds").as("_w"))
      .agg(count(lit(1)).as("n_events"), sum(col("value")).as("session_value"))
    val flat = grouped.select(col("user_id"),
      col("_w.start").as("_start"), col("_w.end").as("_end"),
      col("n_events"), col("session_value"))
    flat.select(col("user_id"),
      epochMicros(flat, "_start").as("session_start_us"),
      epochMicros(flat, "_end").as("session_end_us"),
      col("n_events"), col("session_value"))
  }

  /** Point-in-time (as-of) join: for each left row, attach `valueCols`
    * from the LATEST right row of the same `key` with right ts <= left
    * ts (inclusive), null when no prior right row exists — the feature/
    * label-alignment join of training pipelines.
    *
    * Spark shape: tag the sides, union, ONE shuffle by key, and a single
    * ordered window pass carrying the last non-null right payload
    * forward (`last(..., ignoreNulls)` over unbounded-preceding rows).
    * No range-join explosion, no per-row subquery — cost is a sort
    * within each key partition, linear at any scale. Right rows sort
    * before left rows at equal ts, making the match inclusive. Ties
    * among right rows at identical (key, ts) resolve by `tieBreak`
    * (append one for full determinism when such ties are possible).
    *
    * The right payload rides the window as ONE struct column with a
    * single `last(ignoreNulls)` — the match is atomic per row: every
    * output column comes from the SAME matched right row, and a
    * genuinely-NULL field of that row surfaces as NULL instead of
    * falling back to an older right row.
    * {{{
    * val trades = Seq(("k1", 10L, "t1"), ("k1", 20L, "t2"))
    *   .toDF("key", "ts", "trade")
    * val quotes = Seq(("k1", 5L, 1.5), ("k1", 15L, 1.6))
    *   .toDF("key", "ts", "px")
    * EventStreams.asofJoin(trades, quotes, "key", "ts", Seq("px"))
    *   // t1 -> asof_px 1.5 (quote@5), t2 -> asof_px 1.6 (quote@15)
    * }}} */
  def asofJoin(left: DataFrame, right: DataFrame, key: String, ts: String,
      valueCols: Seq[String], prefix: String = "asof_",
      tieBreak: Seq[org.apache.spark.sql.Column] = Nil): DataFrame = {
    val leftCols = left.columns.toSeq
    val payloadType = org.apache.spark.sql.types.StructType(valueCols.map(c =>
      org.apache.spark.sql.types.StructField(c, right.schema(c).dataType, nullable = true)))
    val lAligned = left.withColumn("_side", lit(1))
      .withColumn("_r_payload", lit(null).cast(payloadType))
    val rBase = right.select((Seq(col(key), col(ts)) ++ valueCols.map(col)): _*)
      .withColumn("_side", lit(0))
      // struct() is non-null on every right row even when all its fields
      // are null — exactly the sentinel last(ignoreNulls) needs
      .withColumn("_r_payload", struct(valueCols.map(col): _*).cast(payloadType))
      .drop(valueCols: _*)
    val rAligned = leftCols.filterNot(Seq(key, ts).contains).foldLeft(rBase)(
      (d, c) => d.withColumn(c, lit(null).cast(left.schema(c).dataType)))
    val all = lAligned.unionByName(rAligned.select(lAligned.columns.map(col): _*))
    // default tie-break: the payload struct (field-wise ordering = the
    // valueCols in order), so two right rows at identical (key, ts)
    // still resolve deterministically without an explicit tieBreak
    val ties = (tieBreak :+ col("_r_payload")).map(_.asc_nulls_first)
    val w = Window.partitionBy(col(key))
      .orderBy((Seq(col(ts).asc, col("_side").asc) ++ ties): _*)
      .rowsBetween(Window.unboundedPreceding, Window.currentRow)
    val carried = all.withColumn("_match",
      last(col("_r_payload"), ignoreNulls = true).over(w))
    carried.filter(col("_side") === 1)
      .select((leftCols.map(col) ++
        valueCols.map(c => col("_match").getField(c).as(s"$prefix$c"))): _*)
  }

  /** Stream-friendly as-of lookup: the right side is a BOUNDED static
    * dimension (price history, model-version history, config epochs)
    * grouped into per-key ts-sorted arrays and broadcast; each left row
    * picks the latest entry with entry ts <= row ts (inclusive), null
    * when none. Stateless — works identically on a batch frame or a
    * structured stream (no watermark, no state store), unlike the
    * union-window [[asofJoin]] which needs the full left+right shuffle.
    * {{{
    * val trades = Seq(("k1", 10L, "t1"), ("k1", 20L, "t2"))
    *   .toDF("key", "ts", "trade")
    * val quotes = Seq(("k1", 5L, 1.5), ("k1", 15L, 1.6))
    *   .toDF("key", "ts", "px")
    * EventStreams.asofLookup(trades, quotes, "key", "ts", "px")
    *   // same matches as asofJoin, right side broadcast as history arrays
    * }}} */
  def asofLookup(left: DataFrame, right: DataFrame, key: String, ts: String,
      valueCol: String, prefix: String = "asof_"): DataFrame = {
    val hist = right.groupBy(col(key)).agg(
      array_sort(collect_list(struct(col(ts).as("_t"), col(valueCol).as("_v"))))
        .as("_hist"))
    val matches = filter(col("_hist"), h => h.getField("_t") <= col(ts))
    left.join(broadcast(hist), Seq(key), "left")
      .withColumn(prefix + valueCol,
        when(size(matches) > 0, element_at(matches, -1).getField("_v")))
      .drop("_hist")
  }

  /** Interval (band) join on event time — the attribution-join shape:
    * every (l, r) pair with the same key and `r.ts - l.ts` in
    * `[lowerNs, upperNs]` (view→purchase within a minute, impression→
    * click, error→retry). The naive theta-join plans as a per-key
    * nested loop — quadratic under hot keys; here both sides bucket
    * into `upperNs - lowerNs`-wide time bins: the left row's
    * admissible window spans at most TWO bins, so it explodes to <= 2
    * bin keys and the whole thing is an equi-join on (key, bin) plus
    * the exact band filter. Shuffle volume = 2x left + right, hot keys
    * spread across their time bins, never a per-key cross product.
    * Output: key, `l_`-prefixed left columns, `r_`-prefixed right
    * columns, `delta_ns`. Timestamps resolve through the same
    * Long/timestamp rules as every operator here.
    * {{{
    * val clicks = Seq(("u1", 0L, "c1")).toDF("user_id", "ts", "click_id")
    * val buys = Seq(("u1", 30L * 1000000000L, "b1"))
    *   .toDF("user_id", "ts", "buy_id")
    * EventStreams.intervalJoin(clicks, buys, "user_id", "ts",
    *   lowerNs = 0L, upperNs = 60L * 1000000000L)
    *   // one (c1, b1) attribution pair, delta_ns = 30e9
    * }}} */
  def intervalJoin(left: DataFrame, right: DataFrame, key: String,
      tsCol: String, lowerNs: Long, upperNs: Long): DataFrame = {
    require(upperNs >= lowerNs, "upperNs must be >= lowerNs")
    val size = math.max(upperNs - lowerNs, 1L)
    val lSel = left.withColumn("_lns", nanos(left, tsCol))
      .select(col(key) +: col("_lns") +:
        left.columns.filterNot(_ == key).map(c => col(c).as(s"l_$c")).toSeq: _*)
    val rSel = right.withColumn("_rns", nanos(right, tsCol))
      .select(col(key) +: col("_rns") +:
        right.columns.filterNot(_ == key).map(c => col(c).as(s"r_$c")).toSeq: _*)
    val lB = lSel.withColumn("_bin", explode(array_distinct(array(
      expr(s"(_lns + $lowerNs) div ${size}L"),
      expr(s"(_lns + $upperNs) div ${size}L")))))
    val rB = rSel.withColumn("_bin", expr(s"_rns div ${size}L"))
    lB.join(rB, Seq(key, "_bin"))
      .filter(col("_rns") - col("_lns") >= lowerNs &&
        col("_rns") - col("_lns") <= upperNs)
      .withColumn("delta_ns", col("_rns") - col("_lns"))
      .drop("_bin", "_lns", "_rns")
  }

  /** Streaming form of [[intervalJoin]]: the same band-join contract —
    * every (l, r) pair with equal key and `r.ts - l.ts` in
    * `[lowerNs, upperNs]` — over TWO LIVE STREAMS, as Spark's native
    * watermarked stream-stream inner join. Both inputs must carry a
    * TIMESTAMP (or TIMESTAMP_NTZ) event-time column named `tsCol`.
    *
    * The join condition is emitted in the canonical
    * `r.ts BETWEEN l.ts + lower AND l.ts + upper` form so Catalyst's
    * StreamingJoinHelper derives state watermarks for BOTH sides: each
    * side's buffered rows are evicted as soon as the global watermark
    * proves no future match can arrive — state is bounded by
    * (band width + watermark delay) x arrival rate, never the full
    * stream. Inner matches emit eagerly (append mode) the micro-batch
    * both rows are present; the watermark only governs eviction and
    * late-row admission. Nanosecond bounds are truncated to Spark's
    * microsecond timestamp precision.
    *
    * Output contract matches [[intervalJoin]]: key, `l_`-prefixed left
    * columns, `r_`-prefixed right columns, `delta_ns`. Also works on
    * two batch frames (same plan, ordinary join) — gated stream ≡ batch
    * in StatefulStreamingSpec.
    * {{{
    * val clicksT = Seq(("u1", 0L, "c1")).toDF("user_id", "ts", "click_id")
    *   .withColumn("ts", timestamp_micros(expr("ts div 1000")))
    * val buysT = Seq(("u1", 30L * 1000000000L, "b1"))
    *   .toDF("user_id", "ts", "buy_id")
    *   .withColumn("ts", timestamp_micros(expr("ts div 1000")))
    * EventStreams.streamingIntervalJoin(clicksT, buysT, "user_id", "ts",
    *   0L, 60L * 1000000000L)   // same pair as intervalJoin, stream-capable
    * }}} */
  def streamingIntervalJoin(left: DataFrame, right: DataFrame, key: String,
      tsCol: String, lowerNs: Long, upperNs: Long,
      watermark: String = "10 seconds"): DataFrame = {
    require(upperNs >= lowerNs, "upperNs must be >= lowerNs")
    def secs(ns: Long) = java.math.BigDecimal.valueOf(ns, 9).toPlainString
    def side(df: DataFrame, p: String): DataFrame = {
      val renamed = df.select(col(key).as(s"${p}_key") +:
        df.columns.filterNot(_ == key).map(c => col(c).as(s"${p}_$c")).toSeq: _*)
      if (df.isStreaming) renamed.withWatermark(s"${p}_$tsCol", watermark)
      else renamed
    }
    val lSel = side(left, "l")
    val rSel = side(right, "r")
    val joined = lSel.join(rSel,
      col("l_key") === col("r_key") &&
        expr(s"`r_$tsCol` >= `l_$tsCol` + INTERVAL '${secs(lowerNs)}' SECOND") &&
        expr(s"`r_$tsCol` <= `l_$tsCol` + INTERVAL '${secs(upperNs)}' SECOND"))
    joined
      .withColumn("delta_ns",
        (epochMicros(joined, s"r_$tsCol") - epochMicros(joined, s"l_$tsCol")) *
          lit(1000L))
      .withColumnRenamed("l_key", key)
      .drop("r_key")
  }

  /** Gap-based sessionization: a new session starts when the nanosecond
    * gap to the user's previous event exceeds `gapSeconds`. One shuffle
    * on user_id. Returns one row per (user, session).
    * {{{
    * EventStreams.sessionize(events, gapSeconds = 20)
    *   .groupBy("user_id").count()   // u1 -> 2 sessions, u2 -> 1
    * }}} */
  def sessionize(events: DataFrame, gapSeconds: Long,
      tsCol: String = "ts"): DataFrame = {
    val ns = nanos(events, tsCol)
    val byUser = Window.partitionBy(col("user_id")).orderBy(col("_ts_ns"))
    val withGap = events.withColumn("_ts_ns", ns)
      .withColumn("_prev", lag(col("_ts_ns"), 1).over(byUser))
      .withColumn("_new_session",
        when(col("_prev").isNull, 1)
          .when(col("_ts_ns") - col("_prev") > gapSeconds * 1000000000L, 1)
          .otherwise(0))
      .withColumn("session_idx", sum(col("_new_session")).over(
        byUser.rowsBetween(Window.unboundedPreceding, 0)))
    withGap.groupBy(col("user_id"), col("session_idx"))
      .agg(count(lit(1)).as("n_events"),
        min(col("_ts_ns")).as("session_start_ns"),
        max(col("_ts_ns")).as("session_end_ns"),
        sum(col("value")).as("session_value"))
  }

  /** Streaming form of windowedStats over a Timestamp column source:
    * watermark + tumbling window. Used with Trigger.AvailableNow in
    * tests; identical plan consumes a live source incrementally.
    * {{{
    * val dir = "/tmp/graft_doc_events"
    * val tsd = events.withColumn("ts", timestamp_micros(expr("ts div 1000")))
    * tsd.write.mode("overwrite").parquet(dir)
    * val agg = EventStreams.streamingWindowedStats(spark, dir, tsd.schema,
    *   windowLength = "10 seconds")
    * EventStreams.runAvailableNow(agg, "doc_win")
    * spark.table("doc_win")   // the same windows windowedStats computes
    * }}} */
  def streamingWindowedStats(spark: SparkSession, dir: String,
      schema: StructType, windowLength: String = "1 hour",
      tsCol: String = "ts"): DataFrame = {
    val stream = spark.readStream.schema(schema).parquet(dir)
    stream.withWatermark(tsCol, "2 hours")
      .groupBy(window(col(tsCol), windowLength).as("w"), col("event_type"))
      .agg(count(lit(1)).as("cnt"), sum(col("value")).as("sum_value"))
      .select(col("w.start").as("window_start"), col("event_type"),
        col("cnt"), col("sum_value"))
  }

  /** Streaming form of [[slidingWindowStats]]: Spark's native hopping
    * `window(ts, windowDuration, slideDuration)` — the event-time
    * window key lets the watermark evict closed windows, which the
    * batch form's derived start column cannot. Works on a batch frame
    * too (same assignment semantics, gated stream ≡ batch).
    * {{{
    * val tsd = events.withColumn("ts", timestamp_micros(expr("ts div 1000")))
    * EventStreams.streamingSlidingWindowStats(tsd, "20 seconds", "10 seconds")
    *   // the hopping windows slidingWindowStats derives, as native window()
    * }}} */
  def streamingSlidingWindowStats(events: DataFrame,
      windowDuration: String, slideDuration: String,
      watermark: String = "2 hours", tsCol: String = "ts"): DataFrame = {
    val base =
      if (events.isStreaming) events.withWatermark(tsCol, watermark)
      else events
    base.groupBy(
        window(col(tsCol), windowDuration, slideDuration).as("w"),
        col("event_type"))
      .agg(count(lit(1)).as("cnt"), sum(col("value")).as("sum_value"))
      .select(col("w.start").as("window_start"), col("event_type"),
        col("cnt"), col("sum_value"))
  }

  // --------------------------------------------- funnel & retention

  /** Event-sequence funnel: per user, the greedy-earliest completion
    * times of an ordered step chain (e.g. view -> click -> purchase).
    * Semantics: `t1` is the user's FIRST step-1 event; `t_k` is the
    * earliest step-k event with ts strictly after `t_{k-1}` and within
    * `horizonSeconds` of the anchor `t1`. The horizon is anchored at
    * the first step-1 event (the standard product-analytics definition
    * — a user whose earliest attempt expires does not re-anchor).
    * Greedy-earliest is optimal for reachability here: any completion
    * chain implies the greedy one completes too.
    *
    * Output: one row per user with >= 1 step-1 event —
    * (user_id, step1_us..stepN_us nullable, depth). Exact integer
    * microsecond arithmetic throughout.
    *
    * Spark shape: filter to the step types (pushed to the scan), ONE
    * shuffle (groupBy user), per-user ts-sorted fold entirely inside
    * codegen'd higher-order functions (`sort_array` + `aggregate` +
    * `transform`) — no window over the full corpus, no self-joins, no
    * per-step shuffle chain. Per-user state is the O(n)-element times
    * array; the collected per-user event list is bounded by that
    * user's step-event count (funnel analytics' usual contract — cap
    * upstream with a per-user limit if a bot user could hold millions
    * of step events).
    * {{{
    * val perUser = EventStreams.funnelSteps(events,
    *   Seq("view", "click", "purchase"), horizonSeconds = 3600)
    * perUser.select("user_id", "depth")   // u1 depth 3, u2 depth 1
    * }}} */
  def funnelSteps(events: DataFrame, steps: Seq[String],
      horizonSeconds: Long, tsCol: String = "ts",
      typeCol: String = "event_type", userCol: String = "user_id"): DataFrame = {
    require(steps.length >= 2, "a funnel needs at least 2 steps")
    require(steps.distinct.length == steps.length, "funnel steps must be distinct")
    require(horizonSeconds > 0 && horizonSeconds < Long.MaxValue / 2000000L,
      "horizon must be positive (and not overflow micros)")
    val n = steps.length
    val horizonUs = horizonSeconds * 1000000L
    val stepIdx = steps.zipWithIndex.tail
      .foldLeft(when(col(typeCol) === steps.head, lit(0))) {
        case (acc, (s, i)) => acc.when(col(typeCol) === s, lit(i))
      }.otherwise(lit(-1))
    val none = lit(-1L)
    val init = array((0 until n).map(_ => none): _*)
    val perUser = events
      .withColumn("_us", epochMicros(events, tsCol))
      .withColumn("_step", stepIdx)
      .filter(col("_step") >= 0)
      .groupBy(col(userCol).as("user_id"))
      .agg(sort_array(collect_list(struct(col("_us"), col("_step")))).as("_evs"))
    // fold in (ts, step) order; slot s fills when still empty, the
    // previous slot is filled, ts is strictly later, and ts is inside
    // the anchor's horizon (element_at is 1-based: element_at(acc, s)
    // IS acc[s-1])
    val times = aggregate(col("_evs"), init, (acc, e) => {
      val s = e.getField("_step")
      val t = e.getField("_us")
      transform(acc, (v, j) =>
        when(j === s && v === none &&
          (s === lit(0) ||
            (element_at(acc, s) =!= none && t > element_at(acc, s) &&
             t <= element_at(acc, lit(1)) + lit(horizonUs))), t)
          .otherwise(v))
    })
    val out = perUser.withColumn("_t", times).filter(element_at(col("_t"), 1) =!= none)
    out.select(
      col("user_id") +:
        (0 until n).map(k =>
          when(element_at(col("_t"), k + 1) === none, lit(null).cast("long"))
            .otherwise(element_at(col("_t"), k + 1)).as(s"step${k + 1}_us")) :+
        size(filter(col("_t"), v => v =!= none)).as("depth"): _*)
  }

  /** Funnel trend: [[funnelSteps]] bucketed by the anchor (step-1)
    * time — (anchor_bucket, depth, n_users), the conversion-over-time
    * series ("did last week's signup cohort convert worse"). A single
    * grouped count over the per-user frame.
    * {{{
    * val perUser = EventStreams.funnelSteps(events,
    *   Seq("view", "click", "purchase"), horizonSeconds = 3600)
    * EventStreams.funnelTrend(perUser, bucketSeconds = 10)
    *   // u1 anchors bucket 0, u2 bucket 1: one (bucket, depth) row each
    * }}} */
  def funnelTrend(perUser: DataFrame,
      bucketSeconds: Long = 86400L): DataFrame = {
    require(bucketSeconds > 0, "bucket must be positive")
    perUser.groupBy(
        expr(s"step1_us div ${bucketSeconds * 1000000L}").as("anchor_bucket"),
        col("depth"))
      .agg(count(lit(1)).as("n_users"))
  }

  /** Per-step funnel conversion counts from [[funnelSteps]] output:
    * (step, step_name, n_users) where n_users completed >= that step.
    * A tiny frame (n rows) — the dashboard summary.
    * {{{
    * val perUser = EventStreams.funnelSteps(events,
    *   Seq("view", "click", "purchase"), horizonSeconds = 3600)
    * EventStreams.funnelSummary(perUser, Seq("view", "click", "purchase"))
    *   // (1, view, 2), (2, click, 1), (3, purchase, 1)
    * }}} */
  def funnelSummary(perUser: DataFrame, steps: Seq[String]): DataFrame = {
    val aggs = count(lit(1)).as("_c1") +:
      (2 to steps.length).map(k =>
        count(when(col("depth") >= k, 1)).as(s"_c$k"))
    val counts = perUser.agg(aggs.head, aggs.tail: _*)
    counts.select(explode(array(steps.zipWithIndex.map { case (s, i) =>
      struct(lit(i + 1).as("step"), lit(s).as("step_name"),
        col(s"_c${i + 1}").as("n_users"))
    }: _*)).as("r")).select("r.*")
  }

  /** Retention cohorts: users bucketed by their first-ever event's
    * time bucket (default: day), counted once per (cohort, offset)
    * bucket they were active in — the classic triangle retention
    * matrix. Output: (cohort_bucket, bucket_offset, n_users), buckets
    * as integer epoch-bucket ordinals (multiply by `bucketSeconds` for
    * epoch seconds).
    *
    * Spark shape: project to (user, bucket) -> distinct (map-side
    * partial), min-bucket per user (partial agg), one equi-join back
    * on user (AQE broadcasts the cohort side when small; a plain
    * shuffle join otherwise — both sides are already user-keyed), then
    * a count-distinct keyed by (cohort, offset). No windows, no
    * cross products; every stage is partial-aggregatable, so shuffle
    * volume is distinct (user, bucket) pairs, not raw events.
    * {{{
    * EventStreams.retentionCohorts(events, bucketSeconds = 10)
    *   // u1 cohort 0 active at offsets 0 and 4; u2 cohort 1 offset 0
    * }}} */
  def retentionCohorts(events: DataFrame, bucketSeconds: Long = 86400L,
      tsCol: String = "ts", userCol: String = "user_id"): DataFrame = {
    require(bucketSeconds > 0, "bucket must be positive")
    val e = retentionActivity(events, bucketSeconds, tsCol, userCol)
    e.groupBy(col("cohort_bucket"),
        (col("_b") - col("cohort_bucket")).as("bucket_offset"))
      .agg(count_distinct(col("user_id")).as("n_users"))
  }

  /** [[retentionCohorts]] with HyperLogLog++ sketches instead of exact
    * count-distinct — the 100 TB path: exact distinct re-shuffles every
    * (user, bucket) pair to its (cohort, offset) cell, while HLL
    * sketches partial-merge map-side to a few KB per cell regardless of
    * user count. `rsd` is the target relative standard deviation
    * (Spark's `approx_count_distinct`); the exact form stays the
    * oracle-gated one.
    * {{{
    * EventStreams.retentionCohortsApprox(events, bucketSeconds = 10)
    *   // the same cells as retentionCohorts, counted by HLL sketches
    * }}} */
  def retentionCohortsApprox(events: DataFrame, bucketSeconds: Long = 86400L,
      rsd: Double = 0.02, tsCol: String = "ts",
      userCol: String = "user_id"): DataFrame = {
    val e = retentionActivity(events, bucketSeconds, tsCol, userCol)
    e.groupBy(col("cohort_bucket"),
        (col("_b") - col("cohort_bucket")).as("bucket_offset"))
      .agg(approx_count_distinct(col("user_id"), rsd).as("n_users"))
  }

  /** Shared (user, activity-bucket, cohort-bucket) frame of the two
    * retention forms. */
  private def retentionActivity(events: DataFrame, bucketSeconds: Long,
      tsCol: String, userCol: String): DataFrame = {
    require(bucketSeconds > 0, "bucket must be positive")
    val e0 = events.withColumn("_us", epochMicros(events, tsCol))
    val e = e0.select(col(userCol).as("user_id"),
        expr(s"_us div ${bucketSeconds * 1000000L}").as("_b"))
      .distinct()
    val first = e.groupBy("user_id").agg(min("_b").as("cohort_bucket"))
    e.join(first, "user_id")
  }

  // ------------------------------------------------- stateful streaming

  final case class SessionEvent(user_id: Long, ts_ns: Long, value: Double)
  final case class SessionState(startNs: Long, lastNs: Long, n: Int, sum: Double)
  final case class SessionOut(user_id: Long, session_start_ns: Long,
      session_end_ns: Long, n_events: Int, session_value: Double)

  /** Incremental gap sessionization with explicit per-user state
    * (KeyValueGroupedDataset.flatMapGroupsWithState): emits a session
    * row whenever a gap closes it; the open session stays in state
    * across micro-batches and is flushed on ProcessingTime timeout.
    * The batch `sessionize` above computes the same sessions in one
    * pass; this is the streaming form for live ingestion. Also runs on
    * a batch Dataset (state starts empty, timeouts never fire), which
    * is what the example shows; stream ≡ batch is gated in
    * StatefulStreamingSpec.
    * {{{
    * val ds = Seq(EventStreams.SessionEvent(1L, 0L, 1.0),
    *   EventStreams.SessionEvent(1L, 50L * 1000000000L, 2.0)).toDS
    * EventStreams.statefulSessionize(ds, gapSeconds = 20,
    *   idleFlush = false).collect()
    *   // one CLOSED session (the 50 s gap closed it); the open one
    *   // stays in state awaiting its gap or timeout
    * }}} */
  def statefulSessionize(events: org.apache.spark.sql.Dataset[SessionEvent],
      gapSeconds: Long, idleFlush: Boolean = true): org.apache.spark.sql.Dataset[SessionOut] = {
    import events.sparkSession.implicits._
    import org.apache.spark.sql.streaming.{GroupState, GroupStateTimeout, OutputMode}
    val gapNs = gapSeconds * 1000000000L

    def fn(userId: Long, rows: Iterator[SessionEvent],
        state: GroupState[SessionState]): Iterator[SessionOut] = {
      val out = scala.collection.mutable.ArrayBuffer.empty[SessionOut]
      if (state.hasTimedOut) {
        state.getOption.foreach(s =>
          out += SessionOut(userId, s.startNs, s.lastNs, s.n, s.sum))
        state.remove()
      } else {
        var cur = state.getOption.orNull
        rows.toSeq.sortBy(_.ts_ns).foreach { e =>
          if (cur == null) cur = SessionState(e.ts_ns, e.ts_ns, 1, e.value)
          else if (e.ts_ns - cur.lastNs > gapNs) {
            out += SessionOut(userId, cur.startNs, cur.lastNs, cur.n, cur.sum)
            cur = SessionState(e.ts_ns, e.ts_ns, 1, e.value)
          } else {
            cur = SessionState(cur.startNs, e.ts_ns, cur.n + 1, cur.sum + e.value)
          }
        }
        if (cur != null) {
          state.update(cur)
          if (idleFlush) state.setTimeoutDuration(s"$gapSeconds seconds")
        }
      }
      out.iterator
    }

    events.groupByKey(_.user_id)
      .flatMapGroupsWithState(OutputMode.Append(),
        if (idleFlush) GroupStateTimeout.ProcessingTimeTimeout()
        else GroupStateTimeout.NoTimeout())(fn)
  }

  final case class RollEvent(user_id: Long, ts_ns: Long, event_id: Long,
      value: Double)
  final case class RollState(recent: Seq[RollEvent])
  final case class RollOut(event_id: Long, user_id: Long, ts_ns: Long,
      roll_n: Long, roll_sum: Double, roll_avg: Double, roll_max: Double)

  /** Streaming form of [[rollingStats]]: per-key trailing k-event
    * count/sum/avg/max emitted PER EVENT as it arrives — the online
    * lag-feature server. State per key is just the last `k-1` events
    * (a bounded ring, bytes not history); rows sort by (ts, event_id)
    * within each micro-batch, and the output equals the batch form
    * whenever each key's events arrive in event-time order across
    * batches (same regime the other stateful ops document). Sum/avg
    * accumulate left-to-right over the ring exactly like the batch
    * ROWS frame, so stream ≡ batch bit-for-bit, not just
    * approximately.
    * {{{
    * val rolls = Seq(EventStreams.RollEvent(1L, 1L, 1L, 2.0),
    *   EventStreams.RollEvent(1L, 2L, 2L, 4.0)).toDS
    * EventStreams.statefulRollingStats(rolls, k = 2).collect()
    *   // per-event trailing stats: the second event's roll_avg is 3.0
    * }}} */
  def statefulRollingStats(events: org.apache.spark.sql.Dataset[RollEvent],
      k: Int): org.apache.spark.sql.Dataset[RollOut] = {
    require(k > 0, "k must be positive")
    import events.sparkSession.implicits._
    import org.apache.spark.sql.streaming.{GroupState, GroupStateTimeout, OutputMode}

    def fn(userId: Long, rows: Iterator[RollEvent],
        state: GroupState[RollState]): Iterator[RollOut] = {
      var recent = state.getOption.map(_.recent.toVector).getOrElse(Vector.empty)
      val out = scala.collection.mutable.ArrayBuffer.empty[RollOut]
      rows.toSeq.sortBy(e => (e.ts_ns, e.event_id)).foreach { e =>
        recent = (recent :+ e).takeRight(k)
        var s = 0.0; var m = Double.NegativeInfinity
        recent.foreach { r => s += r.value; m = math.max(m, r.value) }
        out += RollOut(e.event_id, userId, e.ts_ns, recent.length.toLong,
          s, s / recent.length, m)
      }
      state.update(RollState(recent.takeRight(math.max(k - 1, 1))))
      out.iterator
    }

    events.groupByKey(_.user_id)
      .flatMapGroupsWithState(OutputMode.Append(),
        GroupStateTimeout.NoTimeout())(fn)
  }

  final case class FunnelEvent(user_id: Long, ts_ns: Long, step: Int)
  final case class FunnelState(times: Seq[Long])
  final case class FunnelOut(user_id: Long, step_times_ns: Seq[Long])

  /** Streaming form of [[funnelSteps]]: per-user greedy-earliest step
    * chain held in `flatMapGroupsWithState`, emitting ONE [[FunnelOut]]
    * the moment the final step completes (append mode); state is
    * removed on completion, so each emission is one completed chain —
    * a later fresh step-1 event re-anchors a NEW chain (the batch form
    * computes only the first chain; keep users single-chain when
    * asserting stream ≡ batch). Same
    * anchored-horizon semantics as the batch form (nanos here, like
    * the other stateful ops). Events sort by (ts, step) inside each
    * micro-batch; cross-batch the greedy fold is order-correct
    * whenever each user's events arrive in event-time order across
    * batches (the replay / in-order-ingest regime the adjacent
    * stateful ops document). With `idleTimeout` set, unconverted
    * users' state is dropped after that much processing-time silence —
    * bounded state on an unbounded stream. (Leave it None under
    * `processAllAvailable` test harnesses: a processing-time timeout
    * makes the engine run timeout-check batches continuously at the
    * default 0 ms trigger, so the all-available condition never
    * settles; production queries use a real trigger interval.)
    * {{{
    * val fes = Seq(EventStreams.FunnelEvent(1L, 0L, 0),
    *   EventStreams.FunnelEvent(1L, 1000L, 1)).toDS
    * EventStreams.statefulFunnel(fes, numSteps = 2,
    *   horizonSeconds = 3600).collect()   // one completed 2-step chain
    * }}} */
  def statefulFunnel(events: org.apache.spark.sql.Dataset[FunnelEvent],
      numSteps: Int, horizonSeconds: Long,
      idleTimeout: Option[String] = None): org.apache.spark.sql.Dataset[FunnelOut] = {
    require(numSteps >= 2, "a funnel needs at least 2 steps")
    import events.sparkSession.implicits._
    import org.apache.spark.sql.streaming.{GroupState, GroupStateTimeout, OutputMode}
    val horizonNs = horizonSeconds * 1000000000L

    def fn(userId: Long, rows: Iterator[FunnelEvent],
        state: GroupState[FunnelState]): Iterator[FunnelOut] = {
      if (state.hasTimedOut) { state.remove(); return Iterator.empty }
      val times = state.getOption.map(_.times.toArray)
        .getOrElse(Array.fill(numSteps)(-1L))
      var done = false
      rows.toSeq.sortBy(e => (e.ts_ns, e.step)).foreach { e =>
        if (!done && e.step >= 0 && e.step < numSteps && times(e.step) == -1L &&
            (e.step == 0 ||
              (times(e.step - 1) != -1L && e.ts_ns > times(e.step - 1) &&
               e.ts_ns <= times(0) + horizonNs))) {
          times(e.step) = e.ts_ns
          if (e.step == numSteps - 1) done = true
        }
      }
      if (done) {
        state.remove()
        Iterator.single(FunnelOut(userId, times.toSeq))
      } else {
        state.update(FunnelState(times.toSeq))
        idleTimeout.foreach(state.setTimeoutDuration)
        Iterator.empty
      }
    }

    events.groupByKey(_.user_id)
      .flatMapGroupsWithState(OutputMode.Append(),
        if (idleTimeout.isDefined) GroupStateTimeout.ProcessingTimeTimeout()
        else GroupStateTimeout.NoTimeout())(fn)
  }

  // ---- stream vs UPDATING history (online feature-store as-of)

  /** One unioned input row: side 0 = a history update (key, ts, value),
    * side 1 = a query event to enrich (key, ts, label). */
  final case class AsofStreamEvent(key: Long, ts_ns: Long, side: Int,
      value: Double, label: String)
  final case class HistEntry(ts_ns: Long, value: Double)
  final case class AsofHistState(hist: Seq[HistEntry])
  final case class AsofStreamOut(key: Long, ts_ns: Long, label: String,
      asof_value: Option[Double])

  /** As-of join where the history side is ITSELF a stream (slowly-changing
    * feature values, price ticks, model-version epochs) — the online
    * feature-store shape [[asofLookup]] can't cover (it broadcasts a
    * static right side). Both sides arrive unioned as [[AsofStreamEvent]];
    * per-key state holds the ts-sorted history (bounded by
    * `maxHistoryPerKey`, oldest trimmed), and each query event matches
    * the latest history entry with ts <= its ts (inclusive — a history
    * row and query at the same ts match, like [[asofJoin]]).
    *
    * Within a micro-batch, rows process in event-time order (history
    * before queries at equal ts), so the output equals the batch
    * [[asofJoin]] whenever history updates arrive no later than the
    * first query they should match — the in-order replay / live-tick
    * regime. A history update that arrives LATE corrects all subsequent
    * matches but never retracts rows already emitted (append mode).
    * {{{
    * val asof = Seq(
    *   EventStreams.AsofStreamEvent(1L, 0L, 0, 1.5, ""),    // history tick
    *   EventStreams.AsofStreamEvent(1L, 10L, 1, 0.0, "q1")) // query event
    *   .toDS
    * EventStreams.statefulAsofJoin(asof).collect()
    *   // q1 matches the latest tick at ts <= 10: asof_value Some(1.5)
    * }}} */
  def statefulAsofJoin(events: org.apache.spark.sql.Dataset[AsofStreamEvent],
      maxHistoryPerKey: Int = 10000): org.apache.spark.sql.Dataset[AsofStreamOut] = {
    import events.sparkSession.implicits._
    import org.apache.spark.sql.streaming.{GroupState, GroupStateTimeout, OutputMode}

    // latest entry index with ts_ns <= t in a (ts, value)-sorted history
    def floorIdx(hist: Vector[HistEntry], t: Long): Int = {
      var lo = 0; var hi = hist.length - 1; var ans = -1
      while (lo <= hi) {
        val mid = (lo + hi) >>> 1
        if (hist(mid).ts_ns <= t) { ans = mid; lo = mid + 1 } else hi = mid - 1
      }
      ans
    }

    def fn(key: Long, rows: Iterator[AsofStreamEvent],
        state: GroupState[AsofHistState]): Iterator[AsofStreamOut] = {
      var hist = state.getOption.map(_.hist.toVector).getOrElse(Vector.empty)
      val out = scala.collection.mutable.ArrayBuffer.empty[AsofStreamOut]
      // event-time order inside the batch; history (side 0) before
      // queries at equal ts makes the match inclusive; equal-ts history
      // ties resolve to the max value, mirroring asofJoin's payload
      // tie-break
      rows.toSeq.sortBy(e => (e.ts_ns, e.side, e.value)).foreach { e =>
        if (e.side == 0) {
          val entry = HistEntry(e.ts_ns, e.value)
          val at = hist.lastIndexWhere(h =>
            h.ts_ns < entry.ts_ns || (h.ts_ns == entry.ts_ns && h.value <= entry.value)) + 1
          hist = (hist.take(at) :+ entry) ++ hist.drop(at)
        } else {
          val i = floorIdx(hist, e.ts_ns)
          out += AsofStreamOut(key, e.ts_ns, e.label,
            if (i >= 0) Some(hist(i).value) else None)
        }
      }
      state.update(AsofHistState(hist.takeRight(maxHistoryPerKey)))
      out.iterator
    }

    events.groupByKey(_.key)
      .flatMapGroupsWithState(OutputMode.Append(),
        GroupStateTimeout.NoTimeout())(fn)
  }

  /** Run a streaming frame to a memory sink until all available data is
    * processed (test harness). Aggregation streams use the default
    * "complete" mode; append-mode producers in this module
    * (statefulSessionize, Dedup.streamingExactDedup) pass "append".
    * See [[streamingWindowedStats]]'s example for the full
    * readStream -> aggregate -> runAvailableNow -> spark.table loop. */
  def runAvailableNow(df: DataFrame, queryName: String,
      outputMode: String = "complete"): Unit = {
    val q: DataStreamWriter[org.apache.spark.sql.Row] = df.writeStream
      .format("memory").queryName(queryName).outputMode(outputMode)
      .trigger(org.apache.spark.sql.streaming.Trigger.AvailableNow())
    val query = q.start()
    query.awaitTermination()
  }
}
