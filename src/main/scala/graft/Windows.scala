package graft

import org.apache.spark.sql.{DataFrame, SparkSession}
import org.apache.spark.sql.expressions.Window
import org.apache.spark.sql.functions._
import org.apache.spark.sql.types._
import Det._
import Tables._

/** Window functions (SURVEY.md §2.5): ranking, per-group top-k, running and
  * moving frames, lag/lead.
  *
  * Every window is partitioned by a real key (segment / brand / customer /
  * user) so work distributes across executors; the only global-order window
  * (`window_moving_avg`) runs over a pre-aggregated ~1 row/day frame, so the
  * single-partition sort is over days, not events — safe at any event count.
  */
object Windows {
  type Q = (SparkSession, String) => DataFrame

  /** CUSUM dials (window_cusum): reference level μ + slack k folded into
    * one per-step drift term (value − 60 = value − (μ=50) − (k=10); the
    * fixture's value mean is ~50), and the alarm threshold h=200. Page's
    * one-sided CUSUM in its prefix-sum closed form: S_n = P_n − min_{j≤n}
    * P_j where P is the running drift sum — two window functions, no
    * recursion, so the published change-point statistic is pure dataflow.
    * Production estimates μ from a reference window and sets (k, h) from
    * the acceptable drift / ARL trade; here they are fixture-visible
    * dials the oracle interpolates.
    */
  val CusumDrift = 60
  val CusumThresholdMicro = 200000000L // h = 200, in the micro-unit output scale

  val queries: Map[String, Q] = Map(
    "window_cusum" -> ((s, d) => {
      // exact-decimal running sums (float window sums would re-associate
      // across engines); the statistic ships as INTEGER micro-units —
      // DuckDB's DECIMAL→DOUBLE cast is off by an ulp (it multiplies by
      // the inexact 1e-6; measured: 83.510000 → 83.50999999999999), so a
      // double final cannot hash-match even though both chains are exact
      val w = Window.partitionBy("user_id").orderBy("ts", "event_id")
        .rowsBetween(Window.unboundedPreceding, Window.currentRow)
      events(s, d)
        .select(col("user_id"), col("event_id"), col("ts"),
          dec(col("value"), 20, 6).as("v"))
        .withColumn("p", sum(col("v") - lit(CusumDrift)).over(w))
        // the prefix minimum must include the EMPTY prefix P_0 = 0 (the
        // recursion restarts at 0, not at the first row's drift)
        .withColumn("mp", least(min(col("p")).over(w), lit(0)))
        .withColumn("cusum_micro",
          ((col("p") - col("mp")) * lit(1000000)).cast(LongType))
        .withColumn("flag", col("cusum_micro") > lit(CusumThresholdMicro))
        .select("user_id", "event_id", "cusum_micro", "flag")
        .orderBy("user_id", "event_id")
    }),

    "window_rank" -> ((s, d) => {
      val byBal = Window.partitionBy("c_mktsegment").orderBy(col("c_acctbal").desc)
      val byBalKey = Window.partitionBy("c_mktsegment")
        .orderBy(col("c_acctbal").desc, col("c_custkey").asc)
      customer(s, d)
        .select(
          col("c_mktsegment"), col("c_custkey"), col("c_acctbal"),
          rank().over(byBal).as("rnk"),
          dense_rank().over(byBal).as("drnk"),
          row_number().over(byBalKey).as("rn"))
        .orderBy("c_mktsegment", "rn")
    }),

    "window_topk_per_group" -> ((s, d) => {
      val w = Window.partitionBy("p_brand")
        .orderBy(col("p_retailprice").desc, col("p_partkey").asc)
      part(s, d)
        .select(col("p_brand"), col("p_partkey"), col("p_retailprice"),
          row_number().over(w).as("rn"))
        .where(col("rn") <= 3)
        .orderBy("p_brand", "rn")
    }),

    "window_running_sum" -> ((s, d) => {
      val w = Window.partitionBy("o_custkey")
        .orderBy(col("o_orderdate").asc, col("o_orderkey").asc)
        .rowsBetween(Window.unboundedPreceding, Window.currentRow)
      orders(s, d)
        .select(col("o_custkey"), col("o_orderkey"), col("o_orderdate"),
          // exact decimal window-sum; DOUBLE final rendering (Det doc)
          sum(dec(col("o_totalprice"), 18, 2)).over(w)
            .cast(DoubleType).as("run_total"))
        .orderBy("o_custkey", "o_orderdate", "o_orderkey")
    }),

    // Running-peak / maximum drawdown (round 15) — the RUNNING MAX frame
    // the window family lacked (sum/avg/count frames exist; max is the
    // one backing peak-tracking, high-watermark billing, and the
    // risk-metric drawdown = how far below its running peak a series has
    // fallen). Per customer over the (o_orderdate, o_orderkey) total
    // order: peak = cumulative max of the order value, dd = peak − value,
    // reported as the per-customer summary (n, final peak, max dd). All
    // integer cents (exact DECIMAL(18,2) view of the double, ×100 —
    // rule D2), so max/subtraction are bit-exact cross-engine. Shape: one
    // window partitioned by the real customer key (full parallelism, no
    // global sort) + one map-side-combinable aggregate.
    "window_drawdown" -> ((s, d) => {
      val w = Window.partitionBy("o_custkey")
        .orderBy(col("o_orderdate").asc, col("o_orderkey").asc)
        .rowsBetween(Window.unboundedPreceding, Window.currentRow)
      orders(s, d)
        .select(col("o_custkey"), col("o_orderkey"), col("o_orderdate"),
          (dec(col("o_totalprice"), 18, 2) * 100).cast(LongType).as("v"))
        .withColumn("peak", max("v").over(w))
        .groupBy("o_custkey")
        .agg(count(lit(1)).as("n_orders"), max("peak").as("peak_cents"),
          max(col("peak") - col("v")).as("max_dd_cents"))
        .orderBy("o_custkey")
    }),

    "window_moving_avg" -> ((s, d) => {
      val daily = events(s, d)
        .groupBy(date_trunc("day", col("ts")).cast(TimestampNTZType).as("day"))
        .agg(dsumx4(col("value")).as("day_value"), count(lit(1)).as("day_n"))
      val w = Window.orderBy("day").rowsBetween(-6, Window.currentRow)
      daily
        .select(col("day"),
          sum(col("day_value")).over(w).cast(DoubleType).as("mov_value"),
          sum(col("day_n")).over(w).cast(LongType).as("mov_n"))
        .orderBy("day")
    }),

    "window_range_frame" -> ((s, d) => {
      // RANGE frame over event-time: orders in the trailing 30 days per
      // customer. Value-based frames are deterministic regardless of peer-row
      // order (unlike ROWS with ties) — the natural trailing-window form.
      val w = Window.partitionBy("o_custkey").orderBy(col("epoch_s"))
        .rangeBetween(-30L * 86400, 0)
      orders(s, d)
        .withColumn("epoch_s", unix_timestamp(col("o_orderdate").cast(TimestampType)))
        .select(col("o_custkey"), col("o_orderkey"), col("o_orderdate"),
          count(lit(1)).over(w).as("orders_30d"),
          sum(dec(col("o_totalprice"), 18, 2)).over(w)
            .cast(DoubleType).as("spend_30d"))
        .orderBy("o_custkey", "o_orderdate", "o_orderkey")
    }),

    "window_first_last" -> ((s, d) => {
      val w = Window.partitionBy("o_custkey")
        .orderBy(col("o_orderdate").asc, col("o_orderkey").asc)
        .rowsBetween(Window.unboundedPreceding, Window.unboundedFollowing)
      orders(s, d)
        .select(col("o_custkey"), col("o_orderkey"),
          first(col("o_orderkey")).over(w).as("first_order"),
          last(col("o_orderkey")).over(w).as("last_order"),
          nth_value(col("o_orderkey"), 2).over(w).as("second_order"))
        .orderBy("o_custkey", "o_orderkey")
    }),

    "window_distribution" -> ((s, d) => {
      val w = Window.partitionBy("c_mktsegment")
        .orderBy(col("c_acctbal").asc, col("c_custkey").asc)
      customer(s, d)
        .select(col("c_mktsegment"), col("c_custkey"),
          ntile(4).over(w).as("quartile"),
          percent_rank().over(w).as("pct_rank"),
          cume_dist().over(w).as("cume"))
        .orderBy("c_mktsegment", "c_custkey")
    }),

    "window_lag_lead" -> ((s, d) => {
      val w = Window.partitionBy("user_id").orderBy(col("ts").asc, col("event_id").asc)
      events(s, d)
        .withColumn("us", unix_micros(col("ts").cast(TimestampType)))
        .select(col("user_id"), col("event_id"),
          (col("us") - lag(col("us"), 1).over(w)).as("gap_us"),
          (lead(col("us"), 1).over(w) - col("us")).as("next_us"))
        .where(col("gap_us").isNotNull && col("next_us").isNotNull)
        .orderBy("user_id", "event_id")
    }),

    "window_percent_change" -> ((s, d) => {
      // Period-over-period reporting: monthly revenue with MoM % change.
      // Like window_moving_avg, the only global window runs over the
      // PRE-AGGREGATED frame (rows = months, not orders) — the heavy input
      // reduces in a partial+final hash aggregate first, so the single-
      // partition sort touches ~tens of rows at any corpus size. Revenue
      // is decimal-exact until one final DOUBLE cast (D2), and the %
      // expression applies the identical IEEE op sequence on both engines,
      // so even the derived floats hash-match.
      val monthly = orders(s, d)
        .groupBy(to_date(date_trunc("month", col("o_orderdate"))).as("mo"))
        .agg(dsum2(col("o_totalprice")).as("revenue"))
      val w = Window.orderBy("mo")
      monthly
        .withColumn("prev", lag(col("revenue"), 1).over(w))
        .where(col("prev").isNotNull)
        .select(col("mo"), col("revenue"),
          ((col("revenue") - col("prev")) / col("prev") * 100.0).as("pct_change"))
        .orderBy("mo")
    }),

    "window_running_distinct" -> ((s, d) => {
      // Cumulative DISTINCT count ("event types seen so far" per user) —
      // count(DISTINCT) isn't a supported window aggregate in either
      // engine, so the portable (and scalable) form is the two-window
      // decomposition: flag each (user, type)'s FIRST occurrence, then
      // running-sum the flags in event order. Both windows key on user_id
      // (the second on (user_id, event_type) — same shuffle key prefix),
      // per-user state is one row — the 100 TB cost is two sorts of the
      // events stream, no distinct-set materialization per row.
      val byTs = Window.partitionBy("user_id")
        .orderBy(col("ts").asc, col("event_id").asc)
      val firstSeen = Window.partitionBy("user_id", "event_type")
        .orderBy(col("ts").asc, col("event_id").asc)
      events(s, d)
        .withColumn("is_first",
          when(row_number().over(firstSeen) === 1, 1L).otherwise(0L))
        .withColumn("n_types_seen", sum("is_first")
          .over(byTs.rowsBetween(Window.unboundedPreceding, Window.currentRow)))
        .select("user_id", "event_id", "event_type", "n_types_seen")
        .orderBy("user_id", "event_id")
    }),

    "window_gaps_islands" -> ((s, d) => {
      // Gaps-and-islands: per-user consecutive-day activity streaks. The
      // classic trick — epoch_day minus the per-user row_number is constant
      // within a run of consecutive days — turns streak detection into one
      // window plus one hash aggregation. Scale shape: the distinct
      // (user, day) frame is the aggregate's natural pre-reduction (days
      // per user, not events per user), both the window and the groupBy
      // key on user_id so the stream shuffles once, and per-user state is
      // bounded by the calendar, not the event count.
      val days = events(s, d)
        .select(col("user_id"), to_date(col("ts")).as("day"))
        .distinct()
        .withColumn("dn", datediff(col("day"), to_date(lit("1970-01-01"))))
      val w = Window.partitionBy("user_id").orderBy(col("dn").asc)
      days
        .withColumn("grp", col("dn") - row_number().over(w))
        .groupBy("user_id", "grp")
        .agg(min("day").as("streak_start"), max("day").as("streak_end"),
          count(lit(1)).as("n_days"))
        .select("user_id", "streak_start", "streak_end", "n_days")
        .orderBy("user_id", "streak_start")
    }),

    // Exponential smoothing per user over the time-ordered value series —
    // the classic EWMA the rest of the window family can't express: it is
    // a RECURSION (acc ← acc·(1−α) + x·α), not a frame aggregate, so it
    // compiles to one ordered fold per key instead of a window. α = 1/2
    // (exactly representable), acc seeded 0.0 — a NONSTANDARD baseline
    // (the conventional init is acc = x₁), so the output column is named
    // ewma_zero_seeded to make the convention explicit at the schema level
    // (ADVICE r7); the oracle runs the IDENTICAL seeded left-to-right IEEE
    // fold via list_reduce/list_prepend, the proven bit-exact pattern.
    // Sort key (epoch µs, event_id) is total, so the fold order — hence
    // every intermediate double — is deterministic. One hash shuffle on
    // user_id; per-key state is that user's series — the EXACT variant's
    // inherent cost, kept for parity; window_ewma_bounded below is the
    // production shape.
    "window_ewma" -> ((s, d) =>
      events(s, d).where(col("user_id").isNotNull)
        .select(col("user_id"),
          unix_micros(col("ts").cast(TimestampType)).as("us"),
          col("event_id"), col("value"))
        .groupBy("user_id")
        .agg(
          count(lit(1)).as("n_events"),
          expr("aggregate(transform(array_sort(collect_list(struct(us, event_id, value))), " +
            "x -> x.value), CAST(0.0 AS DOUBLE), (acc, x) -> acc * 0.5 + x * 0.5)")
            .as("ewma_zero_seeded"))
        .orderBy("user_id")),

    // The remaining ANSI rank-family functions (round 9): ntile bucketing,
    // percent_rank, cume_dist over a TOTAL per-key order (value, event_id
    // — no ties, so both engines compute identical ranks, and the float
    // outputs are each ONE IEEE division of two small integers — bit-exact
    // cross-engine, the same argument as the cosine outputs). One shuffle
    // on user_id; all three functions share the single window.
    "window_ntile_dist" -> ((s, d) => {
      val w = Window.partitionBy("user_id")
        .orderBy(col("value").asc, col("event_id").asc)
      events(s, d).where(col("user_id").isNotNull)
        .select(col("user_id"), col("event_id"), col("value"))
        .withColumn("quartile", ntile(4).over(w))
        .withColumn("pct_rank", percent_rank().over(w))
        .withColumn("cume", cume_dist().over(w))
        .orderBy("user_id", "event_id")
    }),

    // Standard-seed EWMA (VERDICT r8 #5): acc = x₁, the textbook
    // convention — the recursion only applies from the SECOND element on
    // (acc ← acc/2 + x/2 over vals[2..]). Same shuffle, total order and
    // IEEE fold determinism as window_ewma; the two variants differ only
    // in the seed, and the schema names say which is which
    // (ewma_std vs ewma_zero_seeded). The oracle is DuckDB's bare
    // list_reduce, whose contract IS the first-element seed.
    "window_ewma_std" -> ((s, d) =>
      events(s, d).where(col("user_id").isNotNull)
        .select(col("user_id"),
          unix_micros(col("ts").cast(TimestampType)).as("us"),
          col("event_id"), col("value"))
        .groupBy("user_id")
        .agg(
          count(lit(1)).as("n_events"),
          expr("transform(array_sort(collect_list(struct(us, event_id, value))), " +
            "x -> x.value)").as("vals"))
        .select(col("user_id"), col("n_events"),
          expr("aggregate(slice(vals, 2, greatest(size(vals) - 1, 0)), " +
            "CAST(element_at(vals, 1) AS DOUBLE), " +
            "(acc, x) -> acc * 0.5 + x * 0.5)").as("ewma_std"))
        .orderBy("user_id")),

    // Bounded-history EWMA — the 100 TB shape (VERDICT r7 #2): each key's
    // series is truncated to its last [[EwmaHistory]] = 64 events BEFORE
    // the aggregation buffers anything (row_number from the series end,
    // filter rn <= K), so per-key aggregation state is structurally ≤ K
    // rows — a hot key with a billion events buffers 64 structs, where the
    // exact variant's collect_list OOMs the task. With α = 1/2 the dropped
    // prefix's contribution to the final double is prefix_ewma · 2⁻⁶⁴ —
    // below one ulp of any realistic accumulator, so bounded ≡ exact on
    // real data (AggWindowSpec pins bit-equality per user on the fixture,
    // where max series length exceeds K). n_events stays the FULL series
    // count (a window count over the same shuffle), so the schema carries
    // both the true count and the bounded smoothing. Same zero-seeded fold
    // and column convention as window_ewma; the oracle truncates with
    // list_slice over the identical (epoch µs, event_id) total order.
    "window_ewma_bounded" -> ((s, d) => {
      val byKey = Window.partitionBy("user_id")
      val fromEnd = byKey.orderBy(col("us").desc, col("event_id").desc)
      events(s, d).where(col("user_id").isNotNull)
        .select(col("user_id"),
          unix_micros(col("ts").cast(TimestampType)).as("us"),
          col("event_id"), col("value"))
        .withColumn("n_events", count(lit(1)).over(byKey))
        .withColumn("rn", row_number().over(fromEnd))
        .where(col("rn") <= EwmaHistory)
        .groupBy("user_id")
        .agg(
          max(col("n_events")).as("n_events"),
          expr("aggregate(transform(array_sort(collect_list(struct(us, event_id, value))), " +
            "x -> x.value), CAST(0.0 AS DOUBLE), (acc, x) -> acc * 0.5 + x * 0.5)")
            .as("ewma_zero_seeded"))
        .orderBy("user_id")
    }),

    // Forward fill (last observation carried forward) — the gap-repair
    // pass that precedes any per-entity time-series featurization: each
    // event carries the value of its user's most recent 'purchase' at or
    // before it. `last(..., ignoreNulls)` over a running rows-frame is
    // Spark's LOCF idiom; one shuffle on the entity key, per-row state is
    // a single scalar, and the carried value is copied verbatim (no
    // arithmetic) so the output is bit-exact on any engine. Events before
    // the user's first purchase keep NULL — the honest "no observation
    // yet" answer. ts is NULL-free on this fixture (pinned in
    // AggWindowSpec; Spark ASC = NULLS FIRST vs DuckDB NULLS LAST would
    // otherwise desynchronize the order).
    "window_fill_forward" -> ((s, d) => {
      val w = Window.partitionBy("user_id")
        .orderBy(col("ts").asc, col("event_id").asc)
        .rowsBetween(Window.unboundedPreceding, Window.currentRow)
      events(s, d)
        .select(col("event_id"), col("user_id"), col("event_type"),
          last(when(col("event_type") === "purchase", col("value")),
            ignoreNulls = true).over(w).as("last_purchase_value"))
        .orderBy("event_id")
    }),

    // Time-weighted average (TWAP) per user — the feature-engineering
    // aggregate for irregularly-sampled series, where the plain mean
    // over-weights burst periods: each observation holds until the next
    // one, so it weighs by its holding interval. All-integer arithmetic
    // (rule D5): values in floor-milli units, intervals in truncated
    // whole seconds (`div`, positive operands — Spark truncate and DuckDB
    // floor agree), so the weighted sums are exact BIGINTs and the final
    // division is one IEEE op on exact operands. The last observation per
    // user has no interval and drops (standard up-to-last-observation
    // TWAP); users whose gaps are all sub-second carry weight 0 and are
    // excluded rather than divided by zero. One shuffle on user_id shared
    // by the lead window and the aggregate.
    "window_twap" -> ((s, d) => {
      val w = Window.partitionBy("user_id")
        .orderBy(col("us").asc, col("event_id").asc)
      events(s, d).where(col("user_id").isNotNull)
        .select(col("user_id"), col("event_id"),
          unix_micros(col("ts").cast(TimestampType)).as("us"),
          floor(col("value") * 1000).cast(LongType).as("v_milli"))
        .withColumn("next_us", lead(col("us"), 1).over(w))
        .withColumn("dt_s", expr("(next_us - us) div 1000000"))
        .where(col("dt_s").isNotNull)
        .groupBy("user_id")
        .agg(count(lit(1)).as("n_intervals"),
          lsum(col("dt_s")).as("held_s"),
          (sum(col("v_milli") * col("dt_s")).cast(DoubleType) /
            sum(col("dt_s")).cast(DoubleType)).as("twap_milli"))
        .where(col("held_s") > 0)
        .orderBy("user_id")
    }),

    // Trailing-window z-score anomaly detection — the streaming-adjacent
    // outlier flag every metrics pipeline runs: each event's value against
    // the mean/stddev of its type's last ZscoreWindow events. Sufficient
    // statistics (n, Σv, Σv²) accumulate as EXACT decimals inside the rows
    // frame (the ab_test recipe lifted into a window), then one double
    // render and an IEEE op sequence the oracle mirrors token-for-token —
    // sqrt is correctly rounded on both engines, so even the derived z
    // hash-matches. Population variance (÷n): the window is a fixed frame,
    // not a sample. var > 0 guards the 0/0 constant-window case (NaN
    // ordering differs cross-engine; a constant window has no outlier by
    // definition). One shuffle on event_type, per-row state is the frame's
    // 20 rows; warm-up rows (n < ZscoreWindow) are excluded so every
    // reported z is over a full window. This GLOBAL-history variant keys
    // on event_type alone — one partition per type, the fixture's shape;
    // the `_bounded` variant below is the 100 TB form.
    "window_anomaly_zscore" -> ((s, d) =>
      anomalyZscore(s, d, weekly = false)),

    // The bounded-partition production form the global variant's comment
    // prescribes: partition by (event_type, week), so no key ever
    // serializes unbounded history through one task — a partition holds
    // at most one week of one type, whatever the corpus size. The trade
    // is explicit and standard: windows RESTART at week boundaries (the
    // first ZscoreWindow−1 events of each week are warm-up, and a spike
    // straddling a boundary is judged against its own week's history
    // only) — flags are a subset near boundaries, identical elsewhere
    // (137 vs 144 at sf0.01). Same moments, render, and flag rule, so
    // everything else about the determinism story carries over verbatim.
    "window_anomaly_zscore_bounded" -> ((s, d) =>
      anomalyZscore(s, d, weekly = true))
  )

  /** Shared builder for the two anomaly variants — identical moment/flag
    * arithmetic, differing only in the window partition key (event_type
    * vs (event_type, week)).
    */
  private def anomalyZscore(s: SparkSession, d: String, weekly: Boolean): DataFrame = {
    val base0 = events(s, d).where(col("value").isNotNull)
      .select(col("event_id"), col("event_type"), col("ts"), col("value"))
    val base = if (weekly)
      base0.withColumn("wk", date_trunc("week", col("ts")).cast(TimestampNTZType))
    else base0
    val parts = if (weekly) Seq(col("event_type"), col("wk"))
                else Seq(col("event_type"))
    val w = Window.partitionBy(parts: _*)
      .orderBy(col("ts").asc, col("event_id").asc)
      .rowsBetween(-(ZscoreWindow - 1), Window.currentRow)
    val nD = col("n").cast(DoubleType)
    val s1D = col("s1").cast(DoubleType)
    val s2D = col("s2").cast(DoubleType)
    val varPop = greatest(nD * s2D - s1D * s1D, lit(0.0)) / (nD * nD)
    base
      .withColumn("n", count(lit(1)).over(w))
      .withColumn("s1",
        sum(dec(col("value"), 18, 4)).over(w).cast(DecimalType(38, 4)))
      .withColumn("s2",
        sum(dec(col("value"), 18, 4) * dec(col("value"), 18, 4)).over(w)
          .cast(DecimalType(38, 8)))
      .withColumn("z", (col("value") - s1D / nD) / sqrt(varPop))
      .where(col("n") === ZscoreWindow && varPop > 0.0 &&
        abs(col("z")) > ZscoreFlagSigma)
      .select("event_id", "event_type", "value", "z")
      .orderBy("event_id")
  }

  /** Trailing frame length for `window_anomaly_zscore` (rows, incl. the
    * current one) and its flag threshold in σ — |z| > 3 flags ~1.4% of
    * fixture events (144 at sf0.01). Both interpolated into the oracle SQL
    * from this one definition site.
    */
  val ZscoreWindow = 20
  val ZscoreFlagSigma = 3.0

  /** Bounded-history EWMA window: 64 steps at α = 1/2 attenuate the
    * truncated prefix by 2⁻⁶⁴ — beyond double precision for any realistic
    * value scale, so the bound costs no accuracy (proven per-key in
    * AggWindowSpec).
    */
  val EwmaHistory = 64

  val oracles: Map[String, String] = Map(
    // Page's CUSUM in the prefix-sum closed form, dials interpolated from
    // the same constants; exact-decimal windows, DOUBLE finals
    "window_cusum" ->
      (s"WITH t AS (SELECT user_id, event_id, ts, CAST(value AS DECIMAL(20,6)) AS v FROM events), " +
       s"c AS (SELECT user_id, event_id, ts, sum(v - $CusumDrift) OVER " +
       "(PARTITION BY user_id ORDER BY ts, event_id " +
       "ROWS BETWEEN UNBOUNDED PRECEDING AND CURRENT ROW) AS p FROM t), " +
       // 0 CAST to the window sum's decimal type: DuckDB's least(DECIMAL,
       // INTEGER) otherwise resolves through DOUBLE and the exactness is
       // gone (caught by the gate: cusum '0.01999999999998181')
       "m AS (SELECT user_id, event_id, p, least(min(p) OVER " +
       "(PARTITION BY user_id ORDER BY ts, event_id " +
       "ROWS BETWEEN UNBOUNDED PRECEDING AND CURRENT ROW), CAST(0 AS DECIMAL(38,6))) AS mp FROM c) " +
       "SELECT user_id, event_id, CAST((p - mp) * 1000000 AS BIGINT) AS cusum_micro, " +
       s"(CAST((p - mp) * 1000000 AS BIGINT) > $CusumThresholdMicro) AS flag " +
       "FROM m ORDER BY user_id, event_id"),

    "window_rank" ->
      ("SELECT c_mktsegment, c_custkey, c_acctbal, " +
       "CAST(rank() OVER (PARTITION BY c_mktsegment ORDER BY c_acctbal DESC) AS INT) AS rnk, " +
       "CAST(dense_rank() OVER (PARTITION BY c_mktsegment ORDER BY c_acctbal DESC) AS INT) AS drnk, " +
       "CAST(row_number() OVER (PARTITION BY c_mktsegment ORDER BY c_acctbal DESC, c_custkey ASC) AS INT) AS rn " +
       "FROM customer ORDER BY c_mktsegment, rn"),

    "window_topk_per_group" ->
      ("SELECT p_brand, p_partkey, p_retailprice, CAST(rn AS INT) AS rn FROM " +
       "(SELECT p_brand, p_partkey, p_retailprice, " +
       "row_number() OVER (PARTITION BY p_brand ORDER BY p_retailprice DESC, p_partkey ASC) AS rn " +
       "FROM part) WHERE rn <= 3 ORDER BY p_brand, rn"),

    // identical cents view, running max, per-customer summary
    "window_drawdown" ->
      ("WITH v AS (SELECT o_custkey, o_orderkey, o_orderdate, " +
       "CAST(CAST(o_totalprice AS DECIMAL(18,2)) * 100 AS BIGINT) AS v FROM orders), " +
       "p AS (SELECT o_custkey, v, max(v) OVER (PARTITION BY o_custkey " +
       "ORDER BY o_orderdate ASC, o_orderkey ASC " +
       "ROWS BETWEEN UNBOUNDED PRECEDING AND CURRENT ROW) AS peak FROM v) " +
       "SELECT o_custkey, CAST(count(*) AS BIGINT) AS n_orders, " +
       "max(peak) AS peak_cents, max(peak - v) AS max_dd_cents " +
       "FROM p GROUP BY o_custkey ORDER BY o_custkey"),

    "window_running_sum" ->
      ("SELECT o_custkey, o_orderkey, o_orderdate, " +
       s"${oDbl("SUM(CAST(o_totalprice AS DECIMAL(18,2))) OVER " +
         "(PARTITION BY o_custkey ORDER BY o_orderdate ASC, o_orderkey ASC " +
         "ROWS BETWEEN UNBOUNDED PRECEDING AND CURRENT ROW)")} AS run_total " +
       "FROM orders ORDER BY o_custkey, o_orderdate, o_orderkey"),

    "window_moving_avg" ->
      ("SELECT day, " +
       s"${oDbl("SUM(day_value) OVER w")} AS mov_value, " +
       "CAST(SUM(day_n) OVER w AS BIGINT) AS mov_n FROM " +
       "(SELECT CAST(date_trunc('day', ts) AS TIMESTAMP) AS day, " +
       "CAST(SUM(CAST(value AS DECIMAL(18,4))) AS DECIMAL(38,4)) AS day_value, count(*) AS day_n " +
       "FROM events GROUP BY 1) " +
       "WINDOW w AS (ORDER BY day ROWS BETWEEN 6 PRECEDING AND CURRENT ROW) ORDER BY day"),

    "window_range_frame" ->
      ("SELECT o_custkey, o_orderkey, o_orderdate, " +
       "count(*) OVER w AS orders_30d, " +
       s"${oDbl("SUM(CAST(o_totalprice AS DECIMAL(18,2))) OVER w")} AS spend_30d " +
       "FROM (SELECT *, epoch(CAST(o_orderdate AS TIMESTAMP)) AS epoch_s FROM orders) " +
       "WINDOW w AS (PARTITION BY o_custkey ORDER BY epoch_s " +
       "RANGE BETWEEN 2592000 PRECEDING AND CURRENT ROW) " +
       "ORDER BY o_custkey, o_orderdate, o_orderkey"),

    "window_first_last" ->
      ("SELECT o_custkey, o_orderkey, " +
       "first_value(o_orderkey) OVER w AS first_order, " +
       "last_value(o_orderkey) OVER w AS last_order, " +
       "nth_value(o_orderkey, 2) OVER w AS second_order " +
       "FROM orders WINDOW w AS (PARTITION BY o_custkey ORDER BY o_orderdate ASC, o_orderkey ASC " +
       "ROWS BETWEEN UNBOUNDED PRECEDING AND UNBOUNDED FOLLOWING) " +
       "ORDER BY o_custkey, o_orderkey"),

    "window_distribution" ->
      ("SELECT c_mktsegment, c_custkey, " +
       "CAST(ntile(4) OVER w AS INT) AS quartile, " +
       "percent_rank() OVER w AS pct_rank, " +
       "cume_dist() OVER w AS cume " +
       "FROM customer WINDOW w AS (PARTITION BY c_mktsegment ORDER BY c_acctbal ASC, c_custkey ASC) " +
       "ORDER BY c_mktsegment, c_custkey"),

    "window_lag_lead" ->
      ("SELECT user_id, event_id, gap_us, next_us FROM " +
       "(SELECT user_id, event_id, " +
       "epoch_us(CAST(ts AS TIMESTAMP)) - lag(epoch_us(CAST(ts AS TIMESTAMP)), 1) OVER w AS gap_us, " +
       "lead(epoch_us(CAST(ts AS TIMESTAMP)), 1) OVER w - epoch_us(CAST(ts AS TIMESTAMP)) AS next_us " +
       "FROM events WINDOW w AS (PARTITION BY user_id ORDER BY ts ASC, event_id ASC)) " +
       "WHERE gap_us IS NOT NULL AND next_us IS NOT NULL ORDER BY user_id, event_id"),

    "window_percent_change" ->
      ("SELECT mo, revenue, (revenue - prev) / prev * 100.0 AS pct_change FROM " +
       "(SELECT mo, revenue, lag(revenue, 1) OVER (ORDER BY mo) AS prev FROM " +
       "(SELECT CAST(date_trunc('month', o_orderdate) AS DATE) AS mo, " +
       s"${oDsum2("o_totalprice")} AS revenue " +
       "FROM orders GROUP BY 1)) " +
       "WHERE prev IS NOT NULL ORDER BY mo"),

    "window_running_distinct" ->
      ("SELECT user_id, event_id, event_type, " +
       "CAST(sum(is_first) OVER (PARTITION BY user_id ORDER BY ts ASC, event_id ASC " +
       "ROWS BETWEEN UNBOUNDED PRECEDING AND CURRENT ROW) AS BIGINT) AS n_types_seen " +
       "FROM (SELECT user_id, event_id, event_type, ts, " +
       "CASE WHEN row_number() OVER (PARTITION BY user_id, event_type " +
       "ORDER BY ts ASC, event_id ASC) = 1 THEN 1 ELSE 0 END AS is_first " +
       "FROM events) ORDER BY user_id, event_id"),

    "window_gaps_islands" ->
      ("WITH dd AS (SELECT DISTINCT user_id, CAST(ts AS DATE) AS day FROM events), " +
       "g AS (SELECT user_id, day, " +
       "date_diff('day', DATE '1970-01-01', day) - " +
       "row_number() OVER (PARTITION BY user_id ORDER BY day ASC) AS grp FROM dd) " +
       "SELECT user_id, min(day) AS streak_start, max(day) AS streak_end, " +
       "CAST(count(*) AS BIGINT) AS n_days " +
       "FROM g GROUP BY user_id, grp ORDER BY user_id, streak_start")
,
    // identical 0.0-seeded left-to-right fold; (epoch µs, event_id) is a
    // total order so both engines run the same IEEE sequence
    "window_ewma" ->
      ("SELECT user_id, count(*) AS n_events, " +
       "list_reduce(list_prepend(CAST(0.0 AS DOUBLE), " +
       "list(value ORDER BY epoch_us(CAST(ts AS TIMESTAMP)), event_id)), " +
       "(acc, x) -> acc * 0.5 + x * 0.5) AS ewma_zero_seeded " +
       "FROM events WHERE user_id IS NOT NULL GROUP BY user_id ORDER BY user_id"),

    // CAST to INT: DuckDB's ntile() is BIGINT while Spark's is INT — same
    // convention as every other rank-family oracle here (ADVICE r9)
    "window_ntile_dist" ->
      ("SELECT user_id, event_id, value, " +
       "CAST(ntile(4) OVER w AS INT) AS quartile, " +
       "percent_rank() OVER w AS pct_rank, " +
       "cume_dist() OVER w AS cume " +
       "FROM events WHERE user_id IS NOT NULL " +
       "WINDOW w AS (PARTITION BY user_id ORDER BY value ASC, event_id ASC) " +
       "ORDER BY user_id, event_id"),

    // bare list_reduce seeds with the FIRST list element — DuckDB's
    // contract matches the standard EWMA convention exactly
    "window_ewma_std" ->
      ("SELECT user_id, count(*) AS n_events, " +
       "list_reduce(" +
       "list(value ORDER BY epoch_us(CAST(ts AS TIMESTAMP)), event_id), " +
       "(acc, x) -> acc * 0.5 + x * 0.5) AS ewma_std " +
       "FROM events WHERE user_id IS NOT NULL GROUP BY user_id ORDER BY user_id"),

    // same fold over the list truncated to its last EwmaHistory elements
    // (list_slice, 1-based inclusive) — the declarative twin of the
    // pre-aggregation row_number truncation
    "window_ewma_bounded" ->
      (s"SELECT user_id, count(*) AS n_events, " +
       "list_reduce(list_prepend(CAST(0.0 AS DOUBLE), " +
       "list_slice(list(value ORDER BY epoch_us(CAST(ts AS TIMESTAMP)), event_id), " +
       s"greatest(1, CAST(count(*) AS BIGINT) - ${EwmaHistory - 1}), " +
       "CAST(count(*) AS BIGINT))), " +
       "(acc, x) -> acc * 0.5 + x * 0.5) AS ewma_zero_seeded " +
       "FROM events WHERE user_id IS NOT NULL GROUP BY user_id ORDER BY user_id"),

    "window_fill_forward" ->
      ("SELECT event_id, user_id, event_type, " +
       "last_value(CASE WHEN event_type = 'purchase' THEN value END IGNORE NULLS) " +
       "OVER (PARTITION BY user_id ORDER BY ts ASC, event_id ASC " +
       "ROWS BETWEEN UNBOUNDED PRECEDING AND CURRENT ROW) AS last_purchase_value " +
       "FROM events ORDER BY event_id"),

    // `//` is DuckDB's floor division — equal to Spark's truncating `div`
    // on the non-negative interval operands
    "window_twap" ->
      ("WITH e AS (SELECT user_id, event_id, " +
       "epoch_us(CAST(ts AS TIMESTAMP)) AS us, " +
       "CAST(floor(value * 1000) AS BIGINT) AS v_milli FROM events " +
       "WHERE user_id IS NOT NULL), " +
       "iv AS (SELECT user_id, v_milli, " +
       "(lead(us, 1) OVER (PARTITION BY user_id ORDER BY us ASC, event_id ASC) - us) // 1000000 AS dt_s " +
       "FROM e) " +
       "SELECT user_id, count(*) AS n_intervals, " +
       "CAST(SUM(dt_s) AS BIGINT) AS held_s, " +
       "CAST(CAST(SUM(v_milli * dt_s) AS BIGINT) AS DOUBLE) / " +
       "CAST(CAST(SUM(dt_s) AS BIGINT) AS DOUBLE) AS twap_milli " +
       "FROM iv WHERE dt_s IS NOT NULL " +
       "GROUP BY user_id HAVING CAST(SUM(dt_s) AS BIGINT) > 0 ORDER BY user_id"),

    // exact-decimal window moments, one DOUBLE render (oDbl's VARCHAR
    // path), then the identical IEEE op sequence as the Spark plan; the
    // bounded variant differs ONLY in the window partition key (one
    // shared fragment, so the arithmetic cannot drift between them)
    "window_anomaly_zscore" -> zscoreOracle("event_type"),
    "window_anomaly_zscore_bounded" ->
      zscoreOracle("event_type, date_trunc('week', ts)")
  )

  /** Shared DuckDB-oracle fragment for the two anomaly variants. */
  private def zscoreOracle(partition: String): String =
    ("WITH b AS (SELECT event_id, event_type, value, " +
     "count(*) OVER w AS n, " +
     "CAST(SUM(CAST(value AS DECIMAL(18,4))) OVER w AS DECIMAL(38,4)) AS s1, " +
     "CAST(SUM(CAST(value AS DECIMAL(18,4)) * CAST(value AS DECIMAL(18,4))) OVER w AS DECIMAL(38,8)) AS s2 " +
     "FROM events WHERE value IS NOT NULL " +
     s"WINDOW w AS (PARTITION BY $partition ORDER BY ts ASC, event_id ASC " +
     s"ROWS BETWEEN ${ZscoreWindow - 1} PRECEDING AND CURRENT ROW)), " +
     "zz AS (SELECT event_id, event_type, value, n, " +
     s"greatest(CAST(n AS DOUBLE) * ${oDbl("s2")} - ${oDbl("s1")} * ${oDbl("s1")}, 0.0) " +
     "/ (CAST(n AS DOUBLE) * CAST(n AS DOUBLE)) AS var_pop, " +
     s"(value - ${oDbl("s1")} / CAST(n AS DOUBLE)) AS dev FROM b) " +
     "SELECT event_id, event_type, value, dev / sqrt(var_pop) AS z FROM zz " +
     s"WHERE n = $ZscoreWindow AND var_pop > 0.0 " +
     s"AND abs(dev / sqrt(var_pop)) > $ZscoreFlagSigma ORDER BY event_id")
}
