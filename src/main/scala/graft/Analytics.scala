package graft

import org.apache.spark.sql.{DataFrame, SparkSession}
import org.apache.spark.sql.expressions.Window
import org.apache.spark.sql.functions._
import org.apache.spark.sql.types._
import Det._
import Tables._

/** Event-sequence analytics over the `events` stream table: conversion
  * funnels and cohort retention — the two classic product-analytics shapes
  * (Presto SEQUENCE_MATCH / every warehouse's retention query) that the
  * inventory lacked as first-class operators.
  *
  * Both are pure conditional-aggregation + equi-join plans keyed on
  * `user_id`: at 100 TB each stage is one hash shuffle of (user, ts) pairs
  * with map-side partial min/distinct, and the per-user state never exceeds
  * a few timestamps — no window over the global event stream, no driver
  * state. AQE handles the skewed-user case (one bot user with millions of
  * events salts into its own partitions).
  *
  * Timestamps: `events.ts` is ns in parquet, µs after the loader (D4);
  * oracles align with CAST(ts AS TIMESTAMP) — fixture values are µs-aligned
  * (verified: epoch_ns % 1000 == 0 for all rows), so ordering comparisons
  * agree cross-engine.
  */
object Analytics {
  type Q = (SparkSession, String) => DataFrame

  /** Inactivity gap that closes a session (etl_sessionize), µs. 24 h —
    * chosen against the fixture's inter-event gap distribution (median
    * ~7 h): ~1.2k sessions over 10k events at sf0.01, ~8 events/session.
    * Interpolated into query, oracle and spec alike.
    */
  val SessionGapUs = 86400000000L

  val queries: Map[String, Q] = Map(
    // Gap-based sessionization — the canonical event-pipeline transform
    // (every clickstream/feature pipeline runs it before anything else):
    // a session breaks where the per-user inactivity gap exceeds
    // SessionGapUs; the classic lag-flag-cumsum gives each event its
    // per-user session ordinal, then one aggregation emits the session
    // frame. Scale shape: BOTH windows and the groupBy key on user_id —
    // the stream shuffles exactly once, per-row window state is one
    // scalar, and session count is bounded by events. Identity-less
    // events (NULL user) are excluded: a session of nobody is not a
    // session (same contract as etl_cdc_apply). All-integer µs arithmetic.
    "etl_sessionize" -> ((s, d) => {
      val byUser = Window.partitionBy("user_id")
        .orderBy(col("us").asc, col("event_id").asc)
      events(s, d).where(col("user_id").isNotNull)
        .select(col("user_id"), col("event_id"),
          unix_micros(col("ts").cast(TimestampType)).as("us"))
        .withColumn("prev_us", lag(col("us"), 1).over(byUser))
        .withColumn("ns",
          when(col("prev_us").isNull ||
            col("us") - col("prev_us") > SessionGapUs, 1L).otherwise(0L))
        .withColumn("session_idx", sum(col("ns")).over(
          byUser.rowsBetween(Window.unboundedPreceding, Window.currentRow)))
        .groupBy("user_id", "session_idx")
        .agg(count(lit(1)).as("n_events"),
          min(col("us")).as("start_us"), max(col("us")).as("end_us"))
        .withColumn("duration_us", col("end_us") - col("start_us"))
        .orderBy("user_id", "session_idx")
    }),

    // Ordered conversion funnel view → click → purchase: a user reaches
    // stage k only with an event at-or-after their stage-(k-1) entry time.
    // Each stage = filter + per-user min(ts) + equi-join to the previous
    // stage — the stage frames shrink monotonically, and every join keys on
    // user_id (broadcast once the funnel tail is small enough; AQE decides).
    "funnel_stages" -> ((s, d) => {
      val e = events(s, d)
      val v = e.filter(col("event_type") === "view")
        .groupBy("user_id").agg(min("ts").as("t1"))
      val c = e.filter(col("event_type") === "click").join(v, "user_id")
        .where(col("ts") >= col("t1"))
        .groupBy("user_id").agg(min("ts").as("t2"))
      val p = e.filter(col("event_type") === "purchase").join(c, "user_id")
        .where(col("ts") >= col("t2"))
        .groupBy("user_id").agg(min("ts").as("t3"))
      def stage(n: Int, label: String, df: DataFrame): DataFrame =
        df.agg(count(lit(1)).as("n_users"))
          .select(lit(n).as("stage"), lit(label).as("event_type"), col("n_users"))
      stage(1, "view", v).union(stage(2, "click", c)).union(stage(3, "purchase", p))
        .orderBy("stage")
    }),

    // Cohort retention: cohort = the user's first active ISO week; cell
    // (cohort_week, week_offset) counts distinct users from that cohort
    // active offset weeks later. distinct (user, week) activity + one join
    // to the per-user first week — the standard retention matrix, flattened
    // (matrix pivots are presentation, not computation).
    "cohort_retention" -> ((s, d) => {
      val e = events(s, d).select(col("user_id"),
        date_trunc("week", col("ts")).cast(TimestampNTZType).as("wk"))
      val first = e.groupBy("user_id").agg(min("wk").as("cohort_week"))
      e.distinct()
        .join(first, "user_id")
        .groupBy(col("cohort_week"),
          (datediff(to_date(col("wk")), to_date(col("cohort_week"))).cast(IntegerType) / lit(7))
            .cast(IntegerType).as("week_offset"))
        .agg(count(lit(1)).as("n_users"))
        .orderBy("cohort_week", "week_offset")
    }),

    // Last-touch attribution: each purchase credits the user's most recent
    // prior (or same-instant) touch event — view/click/signup — and the
    // report aggregates credited revenue per channel. Same single-shuffle
    // union+running-window shape as join_asof (one sort per user, never an
    // N×M purchases⋈touches range join): at 100 TB the event stream
    // shuffles ONCE on user_id. Ties: a touch at the purchase's exact ts
    // counts (tag orders touches first); among equal-ts touches the
    // highest event_id wins. Purchases with no prior touch land in the
    // 'none' channel — dropped rows would understate revenue.
    "attribution_last_touch" -> ((s, d) => {
      // NULL-uid events are excluded up front on BOTH engines: Spark's
      // partitionBy would group NULL uids into one attributable partition
      // while a SQL equi-join never matches NULL — the one semantic gap
      // between the two formulations (latent on current fixtures, which
      // have no NULL user_id; the filter pins the contract anyway).
      val e = events(s, d).where(col("user_id").isNotNull)
      val touches = e.filter(col("event_type").isin("view", "click", "signup"))
        .select(col("user_id").as("uid"), col("ts").as("ats"),
          col("event_type").as("touch_type"), col("event_id"),
          lit(0).as("tag"), lit(null).cast(DoubleType).as("pvalue"))
      val purchases = e.filter(col("event_type") === "purchase")
        .select(col("user_id").as("uid"), col("ts").as("ats"),
          lit(null).cast(StringType).as("touch_type"), col("event_id"),
          lit(1).as("tag"), col("value").as("pvalue"))
      val w = Window.partitionBy("uid")
        .orderBy(col("ats"), col("tag"), col("event_id"))
        .rowsBetween(Window.unboundedPreceding, Window.currentRow)
      touches.unionByName(purchases)
        .withColumn("attr",
          last(when(col("tag") === 0, col("touch_type")), ignoreNulls = true).over(w))
        .where(col("tag") === 1)
        .groupBy(coalesce(col("attr"), lit("none")).as("channel"))
        .agg(count(lit(1)).as("n_purchases"), dsum4(col("pvalue")).as("sum_value"))
        .orderBy("channel")
    }),

    // Temporal train/test split — the leakage-safe alternative to random
    // sampling for time-series training data: everything before the
    // boundary trains, everything after tests. One map-side label + one
    // aggregation; at 100 TB this is the partition-pruning predicate.
    "sample_temporal_split" -> ((s, d) =>
      events(s, d)
        .withColumn("split",
          when(col("ts") < lit("2024-01-22 00:00:00").cast(TimestampNTZType), "train")
            .otherwise("test"))
        .groupBy("split")
        .agg(count(lit(1)).as("n_events"),
          countDistinct(col("user_id")).as("n_users"),
          min(col("event_id")).as("min_event_id"),
          max(col("event_id")).as("max_event_id"))
        .orderBy("split"))
  )

  val oracles: Map[String, String] = Map(
    "funnel_stages" ->
      ("WITH v AS (SELECT user_id, min(CAST(ts AS TIMESTAMP)) AS t1 FROM events " +
       "WHERE event_type = 'view' GROUP BY user_id), " +
       "c AS (SELECT e.user_id, min(CAST(e.ts AS TIMESTAMP)) AS t2 FROM events e " +
       "JOIN v ON e.user_id = v.user_id " +
       "WHERE e.event_type = 'click' AND CAST(e.ts AS TIMESTAMP) >= v.t1 GROUP BY e.user_id), " +
       "p AS (SELECT e.user_id, min(CAST(e.ts AS TIMESTAMP)) AS t3 FROM events e " +
       "JOIN c ON e.user_id = c.user_id " +
       "WHERE e.event_type = 'purchase' AND CAST(e.ts AS TIMESTAMP) >= c.t2 GROUP BY e.user_id) " +
       "SELECT CAST(1 AS INT) AS stage, 'view' AS event_type, (SELECT count(*) FROM v) AS n_users " +
       "UNION ALL SELECT 2, 'click', (SELECT count(*) FROM c) " +
       "UNION ALL SELECT 3, 'purchase', (SELECT count(*) FROM p) ORDER BY stage"),

    "cohort_retention" ->
      ("WITH e AS (SELECT user_id, date_trunc('week', CAST(ts AS TIMESTAMP)) AS wk FROM events), " +
       "f AS (SELECT user_id, min(wk) AS cohort_week FROM e GROUP BY user_id), " +
       "a AS (SELECT DISTINCT user_id, wk FROM e) " +
       "SELECT CAST(cohort_week AS TIMESTAMP) AS cohort_week, " +
       "CAST(date_diff('day', cohort_week, wk) // 7 AS INT) AS week_offset, " +
       "count(*) AS n_users " +
       "FROM a JOIN f ON a.user_id = f.user_id " +
       "GROUP BY 1, 2 ORDER BY cohort_week, week_offset"),

    "attribution_last_touch" ->
      ("WITH p AS (SELECT event_id, user_id, CAST(ts AS TIMESTAMP) AS pts, value " +
       "FROM events WHERE event_type = 'purchase' AND user_id IS NOT NULL), " +
       "t AS (SELECT user_id, CAST(ts AS TIMESTAMP) AS tts, event_type, event_id " +
       "FROM events WHERE event_type IN ('view', 'click', 'signup') AND user_id IS NOT NULL), " +
       "a AS (SELECT p.event_id, p.value, t.event_type AS channel, " +
       "row_number() OVER (PARTITION BY p.event_id " +
       "ORDER BY t.tts DESC, t.event_id DESC) AS rn " +
       "FROM p LEFT JOIN t ON t.user_id = p.user_id AND t.tts <= p.pts) " +
       "SELECT coalesce(channel, 'none') AS channel, count(*) AS n_purchases, " +
       s"${oDsum4("value")} AS sum_value " +
       "FROM a WHERE rn = 1 GROUP BY 1 ORDER BY channel"),

    "sample_temporal_split" ->
      ("SELECT CASE WHEN CAST(ts AS TIMESTAMP) < TIMESTAMP '2024-01-22 00:00:00' " +
       "THEN 'train' ELSE 'test' END AS split, " +
       "count(*) AS n_events, count(DISTINCT user_id) AS n_users, " +
       "min(event_id) AS min_event_id, max(event_id) AS max_event_id " +
       "FROM events GROUP BY 1 ORDER BY split"),

    // DuckDB windowed SUM(BIGINT) returns HUGEINT — cast back; the explicit
    // ROWS frame matches Spark's (the orderBy keys are unique, so RANGE
    // would agree too, but explicit beats implicit across engines)
    "etl_sessionize" ->
      ("WITH e AS (SELECT user_id, event_id, " +
       "epoch_us(CAST(ts AS TIMESTAMP)) AS us FROM events " +
       "WHERE user_id IS NOT NULL), " +
       "f AS (SELECT *, CASE WHEN lag(us) OVER w IS NULL " +
       s"OR us - lag(us) OVER w > $SessionGapUs THEN 1 ELSE 0 END AS ns " +
       "FROM e WINDOW w AS (PARTITION BY user_id ORDER BY us ASC, event_id ASC)), " +
       "g AS (SELECT *, CAST(sum(ns) OVER (PARTITION BY user_id " +
       "ORDER BY us ASC, event_id ASC " +
       "ROWS BETWEEN UNBOUNDED PRECEDING AND CURRENT ROW) AS BIGINT) AS session_idx " +
       "FROM f) " +
       "SELECT user_id, session_idx, count(*) AS n_events, " +
       "min(us) AS start_us, max(us) AS end_us, " +
       "max(us) - min(us) AS duration_us " +
       "FROM g GROUP BY user_id, session_idx ORDER BY user_id, session_idx")
  )
}
