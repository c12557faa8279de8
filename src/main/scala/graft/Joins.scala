package graft

import org.apache.spark.sql.{Column, DataFrame, SparkSession}
import org.apache.spark.sql.expressions.Window
import org.apache.spark.sql.functions._
import org.apache.spark.sql.types._
import Det._
import Tables._

/** Join flavors (SURVEY.md §2.3).
  *
  * Scale notes baked into each plan:
  *  - dimension tables (`customer`, `nation`, `region`) are `broadcast()`
  *    hinted — a broadcast-hash join replicates the small side to every
  *    executor instead of shuffling the 100 TB fact side;
  *  - fact⋈fact joins (`lineitem ⋈ orders`) are left to Catalyst/AQE, which
  *    picks sort-merge with both sides hash-partitioned on the key; AQE
  *    handles skewed keys at runtime;
  *  - the as-of join avoids an N×M time-range join entirely: one union +
  *    one sort per key (a single shuffle) instead of a quadratic expansion.
  */
object Joins {
  type Q = (SparkSession, String) => DataFrame

  /** join_interval_overlap geometry, shared by query / oracle / spec so a
    * constant change cannot desynchronize them (ADVICE.md round 5):
    * supplier window = [(s_suppkey * IoMul) % IoDomain, + IoASpan] day
    * numbers, order week = [day(o_orderdate), + IoBSpan], grid width IoW
    * (= the max interval width, so replication is ≤ 2 cells per interval).
    */
  val IoMul = 37L
  val IoDomain = 2300L
  val IoASpan = 13L
  val IoBSpan = 6L
  val IoW = 14L

  /** Flagship star join: revenue per region (used by SparkEntry.entry). */
  def multiwayStar(s: SparkSession, d: String): DataFrame =
    lineitem(s, d)
      .join(orders(s, d), col("l_orderkey") === col("o_orderkey"))
      .join(broadcast(customer(s, d)), col("o_custkey") === col("c_custkey"))
      .join(broadcast(nation(s, d)), col("c_nationkey") === col("n_nationkey"))
      .join(broadcast(region(s, d)), col("n_regionkey") === col("r_regionkey"))
      .groupBy("r_name")
      .agg(
        (sum(dec(col("l_extendedprice"), 18, 4) * (lit(1) - dec(col("l_discount"), 18, 4))))
          .cast(DoubleType).as("revenue"),
        count(lit(1)).as("n_items"))
      .orderBy("r_name")

  /** Scalable as-of join: for each event, the latest order of the same user
    * with o_orderdate <= ts. Implemented as a tagged union + one running
    * window per user (single sort, no N-per-event join) — the standard
    * 100 TB-safe formulation; ties on date resolve to max o_orderkey.
    */
  def asofJoin(s: SparkSession, d: String): DataFrame =
    asofMatched(s, d)
      .select(
        col("event_id"),
        col("best.asof_orderkey").as("asof_orderkey"),
        col("best.asof_date").as("asof_date"))
      .orderBy("event_id")

  /** Matched backward-asof frame (event rows with their latest same-user
    * order ≤ ts in `best`) — shared by [[asofJoin]] and the tolerance
    * variant.
    */
  private def asofMatched(s: SparkSession, d: String): DataFrame =
    asofAll(s, d).where(col("best").isNotNull)

  /** Backward-asof frame over ALL keyed events — `best` is NULL where no
    * same-user order precedes the event (the LEFT variant keeps these).
    */
  private def asofAll(s: SparkSession, d: String): DataFrame = {
    // NULL keys never match the oracle's equi-join, but Window.partitionBy
    // groups them into ONE partition and would happily align a NULL-uid
    // event to a NULL-uid order (ADVICE.md round 6) — reject them up front
    // so a fixture regeneration with NULL user ids cannot desynchronize.
    val o = orders(s, d).where(col("o_custkey").isNotNull).select(
      col("o_custkey").as("uid"), col("o_orderdate").as("ats"),
      col("o_orderkey"), col("o_orderdate"),
      lit(null).cast(LongType).as("event_id"), lit(0).as("tag"))
    val e = events(s, d).where(col("user_id").isNotNull).select(
      col("user_id").as("uid"), col("ts").as("ats"),
      lit(null).cast(LongType).as("o_orderkey"),
      lit(null).cast(TimestampNTZType).as("o_orderdate"),
      col("event_id"), lit(1).as("tag"))
    val w = Window.partitionBy("uid")
      .orderBy(col("ats"), col("tag"), col("o_orderkey"), col("event_id"))
      .rowsBetween(Window.unboundedPreceding, Window.currentRow)
    o.unionByName(e)
      .withColumn("best",
        last(
          when(col("tag") === 0,
            struct(col("o_orderdate").as("asof_date"), col("o_orderkey").as("asof_orderkey"))),
          ignoreNulls = true).over(w))
      .where(col("tag") === 1)
  }

  /** Staleness bound for join_asof_tolerance, in days. The VALUE is
    * fixture-informed (order dates 1992–1998 vs 2024 events ⇒ backward
    * staleness spans 8190–9799 days at every SF, so 8400 exercises both
    * the keep and the drop path); the SEMANTICS — a feature older than the
    * bound is invalid, not merely stale — is the operator.
    */
  val AsofToleranceDays = 8400

  /** Forward as-of join: for each order, the EARLIEST event of the same
    * user with ts >= o_orderdate — the mirror of [[asofJoin]], same single
    * union + one window per key (no N×M range join). The sort is
    * DESCENDING so the frame stays the incremental running
    * [unboundedPreceding, currentRow] kind (O(k) per key — a
    * [currentRow, unboundedFollowing] frame re-scans the tail per row,
    * O(k²) on a hot key): walking ats downward, `last` over the running
    * frame holds the smallest qualifying (ats, event_id) seen so far. At
    * equal timestamps the event qualifies (>= is inclusive), so events
    * sort BEFORE probe rows (tag desc); event_id desc makes `last` resolve
    * ties to the MIN event_id.
    */
  def asofJoinForward(s: SparkSession, d: String): DataFrame = {
    // NULL-uid rejection: same rationale as [[asofJoin]].
    val e = events(s, d).where(col("user_id").isNotNull).select(
      col("user_id").as("uid"), col("ts").as("ats"),
      col("event_id"), col("ts"),
      lit(null).cast(LongType).as("o_orderkey"), lit(1).as("tag"))
    val o = orders(s, d).where(col("o_custkey").isNotNull).select(
      col("o_custkey").as("uid"), col("o_orderdate").as("ats"),
      lit(null).cast(LongType).as("event_id"),
      lit(null).cast(TimestampNTZType).as("ts"),
      col("o_orderkey"), lit(0).as("tag"))
    val w = Window.partitionBy("uid")
      .orderBy(col("ats").desc, col("tag").desc, col("event_id").desc, col("o_orderkey").desc)
      .rowsBetween(Window.unboundedPreceding, Window.currentRow)
    o.unionByName(e)
      .withColumn("best",
        last(
          when(col("tag") === 1,
            struct(col("ts").as("asof_ts"), col("event_id").as("asof_event_id"))),
          ignoreNulls = true).over(w))
      .where(col("tag") === 0 && col("best").isNotNull)
      .select(
        col("o_orderkey"),
        col("best.asof_event_id").as("asof_event_id"),
        col("best.asof_ts").as("asof_ts"))
      .orderBy("o_orderkey")
  }

  /** Skew-salted equi-join: replicate the small side `salt` ways and spread
    * the big side's hot keys across salt buckets with a deterministic
    * per-row hash, so one pathological key no longer lands on one reducer.
    * `saltBy` must be a column whose value varies within a key (any payload
    * column works); determinism comes from xxhash64, not rand() (rule D5).
    * AQE's skew-join handles moderate skew automatically — this is the
    * explicit tool for the extreme (single-key) case.
    */
  def saltedJoin(big: DataFrame, small: DataFrame, bigKey: String,
      smallKey: String, saltBy: Column, salt: Int): DataFrame = {
    // fresh working-column name: a caller's own "__salt" column must not be
    // hijacked by withColumn or destroyed by the final drop
    val existing = big.columns.toSet ++ small.columns.toSet
    val saltCol = Iterator.from(0).map(i => s"__salt$i").find(!existing.contains(_)).get
    val saltedBig = big.withColumn(saltCol, pmod(xxhash64(saltBy), lit(salt)))
    val saltedSmall = small.withColumn(saltCol,
      explode(expr(s"sequence(0L, ${salt - 1}L)")))
    saltedBig.join(saltedSmall,
        saltedBig(bigKey) === saltedSmall(smallKey) &&
        saltedBig(saltCol) === saltedSmall(saltCol))
      .drop(saltCol)
  }

  val queries: Map[String, Q] = Map(
    // saltedJoin as a driver-verified operator: the oracle is the PLAIN
    // join+aggregate — hash-equality proves salting is result-invariant
    // (replication × spread changes only the partition placement). salt=8
    // on l_suppkey with l_orderkey as the intra-key spreader. The merge
    // hint forces the shuffled join salting exists for — letting Catalyst
    // broadcast the small fixture side would replicate it 8× for nothing
    // and demo the wrong plan (at 100 TB both sides are large).
    "join_salted" -> ((s, d) =>
      saltedJoin(lineitem(s, d), supplier(s, d).hint("merge"),
          "l_suppkey", "s_suppkey", col("l_orderkey"), 8)
        .groupBy("s_nationkey")
        .agg(count(lit(1)).as("n_items"), dsum2(col("l_extendedprice")).as("sum_price"))
        .orderBy("s_nationkey")),

    // Bloom-filter semi-join reduction — the runtime-filter pattern Spark's
    // own InjectRuntimeFilter applies between fact scans: build a compact
    // bloom over the SELECTIVE build side's join keys (high-value orders,
    // ~20% of the dim), broadcast it (1-row frame), and drop probe rows
    // map-side BEFORE the shuffle join. At 100 TB this is the difference
    // between shuffling the full fact table and shuffling the ~20% that can
    // match. False positives (the bloom admits ~3% extra at these
    // parameters) are removed by the real join that follows, so the result
    // is bit-identical to the plain join — which is exactly what the oracle
    // asserts (the join_salted precedent: the oracle proves the
    // optimization result-invariant). Built-ins, not UDFs:
    // bloom_filter_agg / might_contain are Spark's native codegen'd sketch.
    // The bloom sizes to the expected build-side count; at a larger SF the
    // n/bits parameters scale with the build side the way AQE's runtime
    // filters size adaptively.
    "join_bloom_prefilter" -> ((s, d) => {
      import org.apache.spark.sql.graft.VectorOps.{bloom_agg, bloom_might_contain}
      val hv = orders(s, d).where(col("o_totalprice") > 400000.0)
      val bloom = hv.agg(
        bloom_agg(col("o_orderkey"), 4000L, 65536L).as("bf"))
      lineitem(s, d)
        .where(bloom_might_contain(bloom, col("l_orderkey")))
        .join(hv.select("o_orderkey", "o_orderdate"),
          col("l_orderkey") === col("o_orderkey"))
        .groupBy(to_date(date_trunc("month", col("o_orderdate"))).as("mo"))
        .agg(count(lit(1)).as("n_items"),
          sum(dec(col("l_extendedprice"), 18, 4) * (lit(1) - dec(col("l_discount"), 18, 4)))
            .cast(DoubleType).as("revenue"))
        .orderBy("mo")
    }),

    "join_inner_broadcast" -> ((s, d) =>
      orders(s, d)
        .join(broadcast(customer(s, d)), col("o_custkey") === col("c_custkey"))
        .select("o_orderkey", "o_custkey", "c_name", "c_mktsegment", "o_totalprice")
        .orderBy("o_orderkey")),

    "join_inner_shuffle" -> ((s, d) =>
      lineitem(s, d)
        .join(orders(s, d), col("l_orderkey") === col("o_orderkey"))
        .select("l_orderkey", "l_linenumber", "o_orderstatus", "l_quantity")
        // (l_orderkey, l_linenumber) is not unique — sort all output columns.
        .orderBy("l_orderkey", "l_linenumber", "o_orderstatus", "l_quantity")),

    "join_multiway_star" -> (multiwayStar _),

    "join_left_outer" -> ((s, d) =>
      customer(s, d)
        .join(orders(s, d), col("c_custkey") === col("o_custkey"), "left")
        .groupBy("c_custkey")
        .agg(count(col("o_orderkey")).as("order_cnt"))
        .orderBy("c_custkey")),

    "join_full_outer" -> ((s, d) => {
      val cn = customer(s, d).groupBy(col("c_nationkey")).agg(count(lit(1)).as("cust_cnt"))
      val sn = supplier(s, d).groupBy(col("s_nationkey")).agg(count(lit(1)).as("supp_cnt"))
      cn.join(sn, col("c_nationkey") === col("s_nationkey"), "full_outer")
        .select(
          coalesce(col("c_nationkey"), col("s_nationkey")).as("nationkey"),
          coalesce(col("cust_cnt"), lit(0L)).as("cust_cnt"),
          coalesce(col("supp_cnt"), lit(0L)).as("supp_cnt"))
        .orderBy("nationkey")
    }),

    "join_semi" -> ((s, d) =>
      customer(s, d)
        .join(orders(s, d), col("c_custkey") === col("o_custkey"), "left_semi")
        .select("c_custkey", "c_name")
        .orderBy("c_custkey")),

    "join_anti" -> ((s, d) =>
      customer(s, d)
        .join(orders(s, d), col("c_custkey") === col("o_custkey"), "left_anti")
        .select("c_custkey", "c_name")
        .orderBy("c_custkey")),

    "join_theta_range" -> ((s, d) => {
      // Equi-part (user_id) drives the shuffle; the time-range part is a
      // post-join filter — Spark plans SMJ on the equi key, never cartesian.
      val sg = events(s, d).filter(col("event_type") === "signup")
        .select(col("user_id"), col("ts").as("s_ts"), col("event_id").as("signup_id"))
      val pu = events(s, d).filter(col("event_type") === "purchase")
        .select(col("user_id").as("p_uid"), col("ts").as("p_ts"), col("event_id").as("purchase_id"))
      sg.join(pu,
          col("user_id") === col("p_uid") &&
          col("p_ts") > col("s_ts") &&
          col("p_ts") <= col("s_ts") + expr("INTERVAL 1 HOUR"))
        .select("signup_id", "purchase_id")
        .orderBy("signup_id", "purchase_id")
    }),

    "join_range_bucketed" -> ((s, d) => {
      // PURE range join (no equi key) made shuffle-joinable: a naive
      // point-in-interval join plans BroadcastNestedLoopJoin — quadratic
      // work and a broadcast of a whole side, the first plan to die at
      // 100 TB. Fixed-grid bucketing is the standard scale fix: bin both
      // sides by a width-W grid (W = the interval width, so each interval
      // covers <= 2 buckets), explode intervals to their covered buckets,
      // equi-join on the bucket id, then refine with the exact range
      // predicate. Both sides hash-partition by bucket — an ordinary
      // shuffle join, per-interval replication bounded by width/W + 1.
      // Each point lives in exactly ONE bucket, so no pair dedup is needed.
      // All bucket math is IEEE double (floor(x / 100.0)) — bit-identical
      // in DuckDB, though the oracle needs none of it (it states the plain
      // range join; bucketing must be result-invariant).
      val W = 100.0
      val ivals = orders(s, d).filter(col("o_orderkey") % 100 === 0)
        .select(col("o_orderkey"),
          (col("o_totalprice") - 50.0).as("lo"),
          (col("o_totalprice") + 50.0).as("hi"))
        .withColumn("bucket", explode(sequence(
          floor(col("lo") / W).cast(LongType), floor(col("hi") / W).cast(LongType))))
      lineitem(s, d)
        .select(col("l_orderkey"), col("l_extendedprice"),
          floor(col("l_extendedprice") / W).cast(LongType).as("bucket"))
        .join(ivals, "bucket")
        .where(col("l_extendedprice") >= col("lo") && col("l_extendedprice") <= col("hi"))
        .groupBy("o_orderkey")
        .agg(count(lit(1)).as("n_items"), countDistinct(col("l_orderkey")).as("n_orders"))
        .orderBy("o_orderkey")
    }),

    // INTERVAL × INTERVAL overlap join (no equi key) — the shape
    // join_range_bucketed's point-in-interval grid doesn't cover: BOTH
    // sides are ranges (maintenance windows × order weeks), so both sides
    // explode to every width-W grid cell they touch and equi-join on the
    // cell; a pair sharing several cells would double-count, so candidates
    // pass through DISTINCT before the exact overlap refinement — that
    // dedup (absent from the point variant, where a point lives in exactly
    // one cell) is the one extra cost interval-interval pays. Replication
    // per interval is width/W + 1 ≤ 2 here; all arithmetic is integer day
    // numbers. The supplier windows derive deterministically from
    // s_suppkey over the same 1995–2001 day domain as o_orderdate. The
    // oracle is the PLAIN overlap join — bucketing must be
    // result-invariant (the join_range_bucketed precedent).
    "join_interval_overlap" -> ((s, d) => {
      import Joins.{IoMul, IoDomain, IoASpan, IoBSpan, IoW}
      // FLOOR division for the cell ids, not `div`: integer `div` truncates
      // toward zero, so a bound at day −3 would land in cell 0 instead of
      // −1 and the join would silently MISS overlaps. Latent on these
      // fixtures (day numbers start at 0) but a different epoch must not
      // turn a correctness property into a fixture accident. floor(x/W) on
      // doubles is exact for |x| far below 2^52.
      def cellOf(c: String): Column =
        floor(col(c) / lit(IoW.toDouble)).cast(LongType)
      val a = supplier(s, d)
        .select(col("s_suppkey"),
          pmod(col("s_suppkey") * IoMul, lit(IoDomain)).as("a_lo"))
        .withColumn("a_hi", col("a_lo") + IoASpan)
        .withColumn("cell", explode(sequence(cellOf("a_lo"), cellOf("a_hi"))))
      val b = orders(s, d)
        .select(col("o_orderkey"), col("o_totalprice"),
          datediff(to_date(col("o_orderdate")), to_date(lit("1995-01-01")))
            .cast(LongType).as("b_lo"))
        .withColumn("b_hi", col("b_lo") + IoBSpan)
        .withColumn("cell", explode(sequence(cellOf("b_lo"), cellOf("b_hi"))))
      a.join(b, "cell")
        .where(col("a_lo") <= col("b_hi") && col("b_lo") <= col("a_hi"))
        .select("s_suppkey", "o_orderkey", "o_totalprice").distinct()
        .groupBy("s_suppkey")
        .agg(count(lit(1)).as("n_orders"), dsum2(col("o_totalprice")).as("sum_price"))
        .orderBy("s_suppkey")
    }),

    "join_asof" -> (asofJoin _),

    // LEFT tolerance-bounded backward as-of — the feature-store DEFAULT
    // semantics: every fact row survives, carrying NULL features when no
    // prior state exists OR the latest state is past the staleness bound
    // (join_asof_tolerance DROPS those rows — inner; dropping silently
    // changes the training distribution, and "no fresh observation" is
    // itself a feature). Same single-shuffle tagged-union window; the
    // bound is a post-window conditional, costing nothing extra.
    // Identity-less facts (NULL user) re-enter with NULL features,
    // mirroring the oracle's LEFT JOIN exactly. On this fixture every
    // keyed event HAS a prior order (plain left ≡ inner — degenerate), so
    // the staleness bound is what makes the NULL path real: 4k+ events
    // carry NULL here while join_asof_tolerance drops them.
    "join_asof_left" -> ((s, d) => {
      val fresh = datediff(to_date(col("ats")), to_date(col("best.asof_date"))) <=
        AsofToleranceDays
      val matched = asofAll(s, d)
        .select(col("event_id"),
          when(col("best").isNotNull && fresh, col("best.asof_orderkey"))
            .as("asof_orderkey"),
          when(col("best").isNotNull && fresh, col("best.asof_date"))
            .as("asof_date"))
      val orphans = events(s, d).where(col("user_id").isNull)
        .select(col("event_id"),
          lit(null).cast(LongType).as("asof_orderkey"),
          lit(null).cast(TimestampNTZType).as("asof_date"))
      matched.unionByName(orphans).orderBy("event_id")
    }),

    // Tolerance-bounded backward as-of — the feature-store join: a feature
    // row older than the staleness bound is WORSE than a missing one (the
    // model would train on expired state), so events whose latest order
    // exceeds AsofToleranceDays are dropped (inner semantics), and the
    // staleness ships in the output for audit. Same single-shuffle
    // tagged-union window as join_asof; the bound is a post-window filter,
    // costing nothing extra.
    "join_asof_tolerance" -> ((s, d) =>
      asofMatched(s, d)
        .withColumn("staleness_days",
          datediff(to_date(col("ats")), to_date(col("best.asof_date"))))
        .where(col("staleness_days") <= AsofToleranceDays)
        .select(
          col("event_id"),
          col("best.asof_orderkey").as("asof_orderkey"),
          col("best.asof_date").as("asof_date"),
          col("staleness_days"))
        .orderBy("event_id")),

    "join_asof_forward" -> (asofJoinForward _),

    // Nearest as-of: for each ERROR event, the same user's PURCHASE
    // closest in time in EITHER direction — the incident-to-transaction
    // alignment shape (backward-only asof mis-aligns when the next
    // reading is nearer; orders-vs-events won't exercise it at all, the
    // fixture's orders all predate the event stream). Same single-shuffle
    // discipline as [[asofJoin]]: one tagged union, one Exchange on uid,
    // TWO window passes over it (ascending for the latest purchase <= ts,
    // descending for the earliest >= ts — both stay the incremental
    // [unboundedPreceding, currentRow] frame), then an arithmetic pick.
    // Ties: equal distance resolves BACKWARD (the earlier purchase);
    // equal-ts purchases to the lower event_id (both sides sort ref_id
    // DESC so `last` holds the minimum). The oracle states the same
    // choice declaratively: rank by (abs time diff, ts, event_id) over
    // the plain user join.
    "join_asof_nearest" -> ((s, d) => {
      // NULL-uid rejection on both legs: same rationale as [[asofJoin]].
      val p = events(s, d)
        .filter(col("event_type") === "purchase" && col("user_id").isNotNull).select(
        col("user_id").as("uid"), col("ts").as("ats"),
        col("event_id").as("ref_id"),
        lit(null).cast(LongType).as("probe_id"), lit(0).as("tag"))
      val e = events(s, d)
        .filter(col("event_type") === "error" && col("user_id").isNotNull).select(
        col("user_id").as("uid"), col("ts").as("ats"),
        lit(null).cast(LongType).as("ref_id"),
        col("event_id").as("probe_id"), lit(1).as("tag"))
      val wb = Window.partitionBy("uid")
        .orderBy(col("ats").asc, col("tag").asc, col("ref_id").desc,
          col("probe_id").asc)
        .rowsBetween(Window.unboundedPreceding, Window.currentRow)
      val wf = Window.partitionBy("uid")
        .orderBy(col("ats").desc, col("tag").asc, col("ref_id").desc,
          col("probe_id").asc)
        .rowsBetween(Window.unboundedPreceding, Window.currentRow)
      val refStruct = when(col("tag") === 0,
        struct(unix_micros(col("ats").cast(TimestampType)).as("us"),
          col("ref_id").as("key")))
      val us = unix_micros(col("ats").cast(TimestampType))
      val db = us - col("b.us")
      val df = col("f.us") - us
      p.unionByName(e)
        .withColumn("b", last(refStruct, ignoreNulls = true).over(wb))
        .withColumn("f", last(refStruct, ignoreNulls = true).over(wf))
        .where(col("tag") === 1 && (col("b").isNotNull || col("f").isNotNull))
        .withColumn("pick",
          when(col("b").isNull, col("f"))
            .when(col("f").isNull, col("b"))
            .when(df < db, col("f"))
            .otherwise(col("b")))
        .select(col("probe_id").as("event_id"),
          col("pick.key").as("nearest_event_id"),
          col("pick.us").as("nearest_ts_us"))
        .orderBy("event_id")
    }),

    "join_cross_limited" -> ((s, d) =>
      region(s, d).crossJoin(nation(s, d))
        .select("r_regionkey", "r_name", "n_nationkey", "n_name")
        .orderBy("r_regionkey", "n_nationkey")),

    // TPC-H Q3 shape (shipping-priority): segment filter on the broadcast
    // dim, date pushdown on both fact scans, top-10 orders by revenue.
    "tpch_q3_like" -> ((s, d) =>
      lineitem(s, d)
        .filter(col("l_shipdate") > lit("1998-03-15").cast(TimestampType))
        .join(orders(s, d).filter(col("o_orderdate") < lit("1998-03-15").cast(TimestampType)),
          col("l_orderkey") === col("o_orderkey"))
        .join(broadcast(customer(s, d).filter(col("c_mktsegment") === "BUILDING")),
          col("o_custkey") === col("c_custkey"))
        .groupBy("l_orderkey", "o_orderdate")
        .agg(sum(dec(col("l_extendedprice"), 18, 4) * (lit(1) - dec(col("l_discount"), 18, 4)))
          .cast(DoubleType).as("revenue"))
        .orderBy(col("revenue").desc, col("l_orderkey").asc)
        .limit(10)),

    // TPC-H Q5 shape (local supplier volume): full star through both
    // customer and supplier sides with the same-nation condition.
    "tpch_q5_like" -> ((s, d) =>
      lineitem(s, d)
        .join(orders(s, d), col("l_orderkey") === col("o_orderkey"))
        .join(broadcast(customer(s, d)), col("o_custkey") === col("c_custkey"))
        .join(broadcast(supplier(s, d)),
          col("l_suppkey") === col("s_suppkey") &&
          col("s_nationkey") === col("c_nationkey"))
        .join(broadcast(nation(s, d)), col("s_nationkey") === col("n_nationkey"))
        .join(broadcast(region(s, d)), col("n_regionkey") === col("r_regionkey"))
        .groupBy("n_name")
        .agg(sum(dec(col("l_extendedprice"), 18, 4) * (lit(1) - dec(col("l_discount"), 18, 4)))
          .cast(DoubleType).as("revenue"),
          count(lit(1)).as("n_items"))
        .orderBy(col("n_name").asc)),

    // Storage-bucketed co-located fact⋈fact join: both sides written
    // `bucketBy(8, key).sortBy(key)`, so the join plans WITHOUT an Exchange
    // on either input — the bucket layout IS the shuffle, paid once at
    // write time and amortized over every subsequent join on that key. At
    // 100 TB this turns each recurring lineitem⋈orders pass from a full
    // 2-sided shuffle into a local merge per bucket (BucketingSpec pins the
    // no-Exchange property with broadcast disabled; here AQE may still
    // elect a broadcast at tiny SF, which is also shuffle-free). External
    // table paths live under the per-process tmp dir; the catalog entry is
    // dropped and the path cleared first so a fresh in-memory catalog never
    // trips over a stale directory (LOCATION_ALREADY_EXISTS).
    "join_bucket_colocated" -> ((s, d) => {
      val disc = java.lang.Integer.toHexString(d.hashCode)
      def bucketed(name: String, df: DataFrame, key: String): String = {
        val table = s"graft_${name}_b_$disc"
        val path = Sources.tmp(s"${name}_bucketed", d)
        s.sql(s"DROP TABLE IF EXISTS $table")
        Sources.rmTree(new java.io.File(path))
        df.write.bucketBy(8, key).sortBy(key)
          .option("path", path).mode("overwrite").saveAsTable(table)
        table
      }
      val ord = bucketed("orders",
        orders(s, d).select("o_orderkey", "o_custkey", "o_orderstatus"), "o_orderkey")
      val li = bucketed("lineitem",
        lineitem(s, d).select("l_orderkey", "l_extendedprice"), "l_orderkey")
      s.table(li).join(s.table(ord), col("l_orderkey") === col("o_orderkey"))
        .groupBy("o_orderstatus")
        .agg(count(lit(1)).as("n_items"), dsum2(col("l_extendedprice")).as("sum_price"))
        .orderBy("o_orderstatus")
    }),

    // Point-in-time lookup against an SCD2 dimension — the feature-store
    // correctness primitive: each purchase reads the attribute version
    // that was VALID at its timestamp (half-open [valid_from, valid_to)
    // windows built from the user's signup history), never a later one —
    // the train-time leakage guard. Physically the COMPLEMENT of
    // join_asof's tagged-union window: the dim-version frame is one row
    // per signup (tiny next to the fact stream), so this plans as a
    // single equi-join on the entity key with the containment predicate
    // as a post-join filter — facts shuffle once and are never re-sorted;
    // at 100 TB the dim side broadcasts or co-buckets while asof's union
    // trick would re-sort the whole fact stream. Versions are half-open,
    // so a fact at exactly valid_from reads the NEW version, and
    // same-timestamp version stacks (zero-width windows) resolve to the
    // last version in (ts, event_id) order on both engines. Facts before
    // the first version drop (inner semantics) — "no state yet" is not a
    // joinable version. Attribute doubles are carried verbatim: bit-exact.
    "join_pit_scd2" -> ((s, d) => {
      val w = Window.partitionBy("user_id")
        .orderBy(col("valid_from").asc, col("version_id").asc)
      val dim = events(s, d).where(col("event_type") === "signup")
        .select(col("user_id").as("d_user"), col("ts").as("valid_from"),
          col("event_id").as("version_id"), col("value").as("attr"))
        .withColumnRenamed("d_user", "user_id")
        .withColumn("valid_to", lead(col("valid_from"), 1).over(w))
      val facts = events(s, d).where(col("event_type") === "purchase")
        .select(col("event_id"), col("user_id").as("f_user"), col("ts"))
      facts.join(dim,
          col("f_user") === col("user_id") &&
          col("valid_from") <= col("ts") &&
          (col("valid_to").isNull || col("ts") < col("valid_to")))
        .select(col("event_id"), col("version_id"), col("valid_from"), col("attr"))
        .orderBy("event_id")
    }),

    // TPC-H Q17 shape: correlated SCALAR subquery — lines whose quantity is
    // below 0.2× that part's own average. Submitted as SQL text so Catalyst's
    // decorrelation fires: RewriteCorrelatedScalarSubquery turns the per-row
    // subquery into ONE grouped aggregate over lineitem (partial/final hash
    // agg on l_partkey) joined back to the outer scan — at 100 TB that is a
    // single extra agg+join pass, not 6B subquery executions
    // (PlanRegressionSpec pins the no-subquery-in-physical-plan property).
    // Determinism: l_quantity is integral 1..50 (fixture property, asserted
    // in JoinsSpec), so avg = exact-double-sum / count is correctly rounded
    // and identical across engines; the money sum uses the dsum4 convention.
    "tpch_q17_like" -> ((s, d) => {
      val li = Tables.view(s, d, "lineitem"); val pt = Tables.view(s, d, "part")
      s.sql(
        s"""SELECT p_brand, count(*) AS n_small,
           |  CAST(sum(CAST(l_extendedprice AS DECIMAL(18,4))) AS DOUBLE) AS sum_price
           |FROM $li li JOIN $pt p ON p.p_partkey = li.l_partkey
           |WHERE li.l_quantity < (SELECT 0.2 * avg(l2.l_quantity)
           |                       FROM $li l2 WHERE l2.l_partkey = li.l_partkey)
           |GROUP BY p_brand ORDER BY p_brand""".stripMargin)
    }),

    // TPC-H Q20 shape: NESTED correlation — an EXISTS whose inner predicate
    // itself contains a correlated scalar subquery (each level references
    // only its immediate parent, the form Catalyst supports). Decorrelated
    // to: per-part avg aggregate ⋈ lineitem (the scalar), then a left-semi
    // join onto supplier (the EXISTS) — two joins + one agg, no per-row
    // re-execution. Thresholds (returnflag R, discount ≥ 0.10, 1.8×avg)
    // were measured non-vacuous: 6/10, 59/100, 551/1000 suppliers pass at
    // sf0.001/0.01/0.1 — a real split, not all-pass or all-fail.
    "tpch_q20_like" -> ((s, d) => {
      val li = Tables.view(s, d, "lineitem"); val su = Tables.view(s, d, "supplier")
      s.sql(
        s"""SELECT s_suppkey, s_name FROM $su sup
           |WHERE EXISTS (
           |  SELECT 1 FROM $li l WHERE l.l_suppkey = sup.s_suppkey
           |  AND l.l_returnflag = 'R' AND l.l_discount >= 0.10
           |  AND l.l_quantity > (SELECT 1.8 * avg(l2.l_quantity)
           |                      FROM $li l2 WHERE l2.l_partkey = l.l_partkey))
           |ORDER BY s_suppkey""".stripMargin)
    }),

    // TPC-H Q22 shape: uncorrelated scalar subquery (global average account
    // balance) + correlated NOT EXISTS (anti join). The avg comparison is
    // expressed exactly — c_acctbal carries cents, so a double avg is
    // summation-order dependent; instead `bal·N > Σbal` with DECIMAL(18,2)
    // sums and a BIGINT count, exact on both engines. Catalyst plans the two
    // scalars as one-row broadcast subquery results and the NOT EXISTS as a
    // left-anti hash join on o_custkey; filter (status, price) is pushed
    // into the orders scan before the anti join builds.
    "tpch_q22_like" -> ((s, d) => {
      val cu = Tables.view(s, d, "customer"); val or = Tables.view(s, d, "orders")
      s.sql(
        s"""SELECT c_nationkey, count(*) AS n_cust,
           |  CAST(sum(CAST(c_acctbal AS DECIMAL(18,2))) AS DOUBLE) AS sum_acctbal
           |FROM $cu c
           |WHERE CAST(c_acctbal AS DECIMAL(18,2)) *
           |        (SELECT count(*) FROM $cu c2 WHERE c2.c_acctbal > 0)
           |      > (SELECT sum(CAST(c3.c_acctbal AS DECIMAL(18,2)))
           |         FROM $cu c3 WHERE c3.c_acctbal > 0)
           |AND NOT EXISTS (SELECT 1 FROM $or o WHERE o.o_custkey = c.c_custkey
           |                AND o.o_orderstatus = 'O' AND o.o_totalprice > 200000)
           |GROUP BY c_nationkey ORDER BY c_nationkey""".stripMargin)
    }),

    // TPC-H Q21 shape (VERDICT r12 #4): correlated EXISTS + correlated NOT
    // EXISTS against the SAME fact table with an INEQUALITY correlation
    // (l2.l_suppkey <> l1.l_suppkey) — the hardest of the TPC-H subquery
    // family. The fixture has no receipt/commit dates, so the "offending
    // line" predicate is l_returnflag = 'R': suppliers who were the SOLE
    // returned-line supplier on a multi-supplier finished order. Catalyst
    // decorrelates both: the orderkey equality becomes the join key and the
    // suppkey `<>` rides as a non-equi condition on a LeftSemi / LeftAnti
    // hash join — no per-row re-scan of lineitem (PlanRegressionSpec pins
    // zero physical Subquery nodes + both join types). At 100 TB that is
    // two self-joins of lineitem on its natural key, not 6B probes; both
    // build sides carry their own pushed-down filters. Selectivity measured
    // real at every SF: EXISTS keeps 644/658, 6461/6594, 64843/66058 F+R
    // rows (multi-supplier orders), NOT EXISTS then keeps 170/1667/16202 —
    // neither predicate is vacuous (JoinsSpec pins this).
    "tpch_q21_like" -> ((s, d) => {
      val li = Tables.view(s, d, "lineitem"); val su = Tables.view(s, d, "supplier")
      val or = Tables.view(s, d, "orders")
      s.sql(
        s"""SELECT s_name, count(*) AS numwait
           |FROM $su s JOIN $li l1 ON s.s_suppkey = l1.l_suppkey
           |JOIN $or o ON o.o_orderkey = l1.l_orderkey
           |WHERE o.o_orderstatus = 'F' AND l1.l_returnflag = 'R'
           |AND EXISTS (SELECT 1 FROM $li l2
           |            WHERE l2.l_orderkey = l1.l_orderkey
           |            AND l2.l_suppkey <> l1.l_suppkey)
           |AND NOT EXISTS (SELECT 1 FROM $li l3
           |                WHERE l3.l_orderkey = l1.l_orderkey
           |                AND l3.l_suppkey <> l1.l_suppkey
           |                AND l3.l_returnflag = 'R')
           |GROUP BY s_name ORDER BY numwait DESC, s_name""".stripMargin)
    }),

    // TPC-H Q18 shape (large-volume customers): uncorrelated IN over a
    // GROUPED subquery with HAVING — the remaining classic subquery
    // position after q17/q20/q21/q22 (scalar / nested-EXISTS / same-table
    // EXISTS+NOT EXISTS / NOT EXISTS): the IN build side is itself an
    // aggregate, so Catalyst plans Aggregate-below-LeftSemi — one grouped
    // pass over lineitem probed by the join, never a per-row re-scan. At
    // 100 TB both the semi build and the outer sum aggregate on
    // l_orderkey, so AQE can reuse one exchange. T=200 measured
    // non-vacuous: 99/1473, 874/14743, 9185/147236 orders qualify at
    // sf0.001/0.01/0.1. Determinism: l_quantity is integral (q17's pinned
    // fixture property), so double sums are exact and the BIGINT cast is
    // portable; o_orderkey is unique per output row, making the
    // (sum_qty DESC, o_orderkey) order total.
    "tpch_q18_like" -> ((s, d) => {
      val li = Tables.view(s, d, "lineitem"); val cu = Tables.view(s, d, "customer")
      val or = Tables.view(s, d, "orders")
      s.sql(
        s"""SELECT c.c_custkey, o.o_orderkey, CAST(sum(l.l_quantity) AS BIGINT) AS sum_qty
           |FROM $cu c JOIN $or o ON c.c_custkey = o.o_custkey
           |JOIN $li l ON o.o_orderkey = l.l_orderkey
           |WHERE o.o_orderkey IN (SELECT l2.l_orderkey FROM $li l2
           |                       GROUP BY l2.l_orderkey
           |                       HAVING sum(l2.l_quantity) > 200)
           |GROUP BY c.c_custkey, o.o_orderkey
           |ORDER BY sum_qty DESC, o.o_orderkey ASC LIMIT 100""".stripMargin)
    }),

    // TPC-H Q15 shape (top supplier): an aggregate VIEW consumed twice —
    // once as the join input, once under an uncorrelated scalar max — with
    // the equality taken on the EXACT decimal revenue, so ties (if any)
    // all surface and the comparison never rides a double. Catalyst plans
    // the scalar as a one-row subquery result broadcast into the filter;
    // the view itself is one grouped pass over the filtered fact. The
    // fixture yields exactly one max supplier at every SF (measured
    // 1/10, 1/100, 1/1000) — non-empty, and the ties rule is still the
    // contract. Revenue render follows the q3/q5 dsum4 convention.
    "tpch_q15_like" -> ((s, d) => {
      val li = Tables.view(s, d, "lineitem"); val su = Tables.view(s, d, "supplier")
      s.sql(
        s"""WITH revenue AS (
           |  SELECT l_suppkey AS supplier_no,
           |    sum(CAST(l_extendedprice AS DECIMAL(18,4)) *
           |        (1 - CAST(l_discount AS DECIMAL(18,4)))) AS total_revenue
           |  FROM $li WHERE l_returnflag = 'N' GROUP BY l_suppkey)
           |SELECT s.s_suppkey, s.s_name, CAST(r.total_revenue AS DOUBLE) AS total_revenue
           |FROM $su s JOIN revenue r ON s.s_suppkey = r.supplier_no
           |WHERE r.total_revenue = (SELECT max(total_revenue) FROM revenue)
           |ORDER BY s.s_suppkey""".stripMargin)
    }),

    // TPC-H Q11 shape (important stock): HAVING-style filter of a grouped
    // aggregate against an uncorrelated GLOBAL scalar of the same measure.
    // The fixture has no partsupp, so part value = Σ extendedprice per
    // l_partkey and the threshold is 1.2× the average part value — scale-
    // free (a fixed TPC-H fraction goes vacuous as |parts| grows with SF;
    // measured 37/200, 322/2000, 3336/20000 parts pass at 1.2×). The
    // comparison is pure BIGINT cross-multiplication in micros
    // (vmic·nparts·10 > 12·total_micro): DECIMAL(18,4)·10⁴ is integral so
    // the BIGINT cast is exact, and no engine-specific decimal-width
    // promotion is ever consulted. Ordering is taken on the exact decimal,
    // then rendered double.
    "tpch_q11_like" -> ((s, d) => {
      val li = Tables.view(s, d, "lineitem")
      s.sql(
        s"""SELECT l_partkey, CAST(v AS DOUBLE) AS value FROM
           | (SELECT l_partkey,
           |         sum(CAST(l_extendedprice AS DECIMAL(18,4))) AS v,
           |         CAST(sum(CAST(l_extendedprice AS DECIMAL(18,4))) * 10000 AS BIGINT) AS vmic
           |  FROM $li GROUP BY l_partkey) t
           |WHERE vmic * (SELECT 10 * count(DISTINCT l_partkey) FROM $li)
           |      > 12 * (SELECT CAST(sum(CAST(l_extendedprice AS DECIMAL(18,4))) * 10000 AS BIGINT)
           |              FROM $li)
           |ORDER BY v DESC, l_partkey ASC""".stripMargin)
    }),

    // TPC-H Q16 shape (parts/supplier relationship): NOT IN — the one
    // subquery FORM with semantics none of the joins above carry: x NOT IN
    // (S) is three-valued (false if S contains NULL, unknown if x is NULL),
    // so a plain LeftAnti is wrong in general and Catalyst must plan a
    // NULL-AWARE anti join (single-column NOT IN + broadcastable build →
    // BroadcastHashJoin LeftAnti BuildRight with the null-aware marker;
    // PlanRegressionSpec pins it). At 100 TB the blacklist side is small by
    // nature (it's an exclusion list), so the null-aware probe stays a
    // broadcast — the exact reason NOT IN is usable at scale despite its
    // semantics. Blacklist = suppliers with s_acctbal < 1000 (the fixture's
    // "complaints" stand-in; measured non-vacuous 1/10, 15/100, 169/1000).
    // count(DISTINCT l_suppkey) per brand exercises a distinct aggregate
    // ABOVE the anti join (Expand + two-phase agg, partials preserved).
    "tpch_q16_like" -> ((s, d) => {
      val li = Tables.view(s, d, "lineitem"); val pt = Tables.view(s, d, "part")
      val su = Tables.view(s, d, "supplier")
      s.sql(
        s"""SELECT p_brand, count(DISTINCT l_suppkey) AS supplier_cnt
           |FROM $li l JOIN $pt p ON p.p_partkey = l.l_partkey
           |WHERE l.l_suppkey NOT IN (SELECT s_suppkey FROM $su WHERE s_acctbal < 1000)
           |GROUP BY p_brand ORDER BY supplier_cnt DESC, p_brand""".stripMargin)
    }),

    // TPC-H Q4 shape (order priority checking): EXISTS with a correlated
    // INEQUALITY (l_shipdate > o_orderdate) — decorrelates to a LeftSemi
    // hash join on the orderkey equality with the date comparison riding
    // as the join condition, then a 5-group aggregate.
    "tpch_q4_like" -> ((s, d) =>
      orders(s, d)
        .filter(col("o_orderdate") >= lit("1996-01-01").cast(TimestampType) &&
          col("o_orderdate") < lit("1996-04-01").cast(TimestampType))
        .join(lineitem(s, d),
          col("l_orderkey") === col("o_orderkey") &&
            col("l_shipdate") > col("o_orderdate"), "left_semi")
        .groupBy("o_orderpriority").agg(count(lit(1)).as("order_count"))
        .orderBy("o_orderpriority")),

    // TPC-H Q6 shape (forecasting revenue change): the pure scan-filter-
    // aggregate — every predicate (date range, discount band, quantity
    // cap) must reach the parquet scan as a pushed filter; the plan is
    // one scan + two-phase agg, zero joins/shuffles beyond the final
    // single-partition agg exchange.
    "tpch_q6_like" -> ((s, d) =>
      lineitem(s, d)
        .filter(col("l_shipdate") >= lit("1996-01-01").cast(TimestampType) &&
          col("l_shipdate") < lit("1997-01-01").cast(TimestampType) &&
          col("l_discount") >= 0.05 && col("l_discount") <= 0.07 &&
          col("l_quantity") < 24)
        .agg(sum(dec(col("l_extendedprice"), 18, 4) * dec(col("l_discount"), 18, 4))
          .cast(DoubleType).as("revenue"))),

    // TPC-H Q7 shape (volume shipping): the two-nation-alias join — the
    // same nation dim joins twice (supplier side, customer side) with a
    // DISJUNCTIVE pair condition (residue classes: the fixture's single
    // named pair is empty at sf0.001), grouped by direction and shipping
    // year. The only shuffle join is lineitem⋈orders; supplier/customer/
    // both nation aliases broadcast.
    "tpch_q7_like" -> ((s, d) => {
      val n1 = nation(s, d)
        .select(col("n_nationkey").as("n1k"), col("n_name").as("supp_nation"))
      val n2 = nation(s, d)
        .select(col("n_nationkey").as("n2k"), col("n_name").as("cust_nation"))
      lineitem(s, d)
        .filter(col("l_shipdate") >= lit("1996-01-01").cast(TimestampType) &&
          col("l_shipdate") < lit("1998-01-01").cast(TimestampType))
        .join(broadcast(supplier(s, d)), col("s_suppkey") === col("l_suppkey"))
        .join(orders(s, d), col("o_orderkey") === col("l_orderkey"))
        .join(broadcast(customer(s, d)), col("c_custkey") === col("o_custkey"))
        .join(broadcast(n1), col("s_nationkey") === col("n1k"))
        .join(broadcast(n2), col("c_nationkey") === col("n2k"))
        .where((pmod(col("n1k"), lit(5)) === 1 && pmod(col("n2k"), lit(5)) === 2) ||
          (pmod(col("n1k"), lit(5)) === 2 && pmod(col("n2k"), lit(5)) === 1))
        .groupBy(col("supp_nation"), col("cust_nation"),
          year(col("l_shipdate")).cast(LongType).as("yr"))
        .agg(sum(dec(col("l_extendedprice"), 18, 4) *
          (lit(1) - dec(col("l_discount"), 18, 4))).cast(DoubleType).as("revenue"))
        .orderBy("supp_nation", "cust_nation", "yr")
    }),

    // TPC-H Q8 shape (national market share): the full two-sided star plus
    // region, with the share as a conditional-over-total ratio — both sums
    // exact DECIMAL, ONE double render each, then the correctly-rounded
    // IEEE division (the agg_ab_test determinism recipe).
    "tpch_q8_like" -> ((s, d) => {
      val n1 = nation(s, d)
        .select(col("n_nationkey").as("n1k"), col("n_name").as("supp_nation"))
      val n2 = nation(s, d)
        .select(col("n_nationkey").as("n2k"), col("n_regionkey").as("n2r"))
      lineitem(s, d)
        .join(broadcast(supplier(s, d)), col("s_suppkey") === col("l_suppkey"))
        .join(orders(s, d), col("o_orderkey") === col("l_orderkey"))
        .join(broadcast(customer(s, d)), col("c_custkey") === col("o_custkey"))
        .join(broadcast(n1), col("s_nationkey") === col("n1k"))
        .join(broadcast(n2), col("c_nationkey") === col("n2k"))
        .join(broadcast(region(s, d)), col("n2r") === col("r_regionkey"))
        .where(col("r_name") === "ASIA")
        .withColumn("vol", dec(col("l_extendedprice"), 18, 4) *
          (lit(1) - dec(col("l_discount"), 18, 4)))
        .groupBy(year(col("o_orderdate")).cast(LongType).as("yr"))
        .agg((sum(when(col("supp_nation") === "NATION_3", col("vol")))
          .cast(DoubleType) / sum(col("vol")).cast(DoubleType)).as("mkt_share"))
        .orderBy("yr")
    }),

    // TPC-H Q9 shape (product-type profit): part-name LIKE screen into the
    // four-way join, profit as an exact decimal expression (retailprice·qty
    // stands in for the missing ps_supplycost term), grouped by supplier
    // nation × order year.
    "tpch_q9_like" -> ((s, d) =>
      part(s, d).filter(col("p_name").like("%red%"))
        .join(lineitem(s, d), col("p_partkey") === col("l_partkey"))
        .join(broadcast(supplier(s, d)), col("s_suppkey") === col("l_suppkey"))
        .join(orders(s, d), col("o_orderkey") === col("l_orderkey"))
        .join(broadcast(nation(s, d)), col("s_nationkey") === col("n_nationkey"))
        .groupBy(col("n_name").as("nation"),
          year(col("o_orderdate")).cast(LongType).as("yr"))
        .agg(sum(dec(col("l_extendedprice"), 18, 4) *
            (lit(1) - dec(col("l_discount"), 18, 4)) -
            dec(col("p_retailprice"), 18, 4) * dec(col("l_quantity"), 18, 4))
          .cast(DoubleType).as("profit"))
        .orderBy("nation", "yr")),

    // TPC-H Q10 shape (returned-item reporting): quarter window + return
    // flag into a top-20 by revenue — the TakeOrdered path with a
    // (revenue DESC, custkey ASC) total order so the cut is deterministic.
    "tpch_q10_like" -> ((s, d) =>
      customer(s, d)
        .join(orders(s, d)
          .filter(col("o_orderdate") >= lit("1996-01-01").cast(TimestampType) &&
            col("o_orderdate") < lit("1996-04-01").cast(TimestampType)),
          col("c_custkey") === col("o_custkey"))
        .join(lineitem(s, d).filter(col("l_returnflag") === "R"),
          col("l_orderkey") === col("o_orderkey"))
        .join(broadcast(nation(s, d)), col("c_nationkey") === col("n_nationkey"))
        .groupBy("c_custkey", "c_name", "n_name")
        .agg(sum(dec(col("l_extendedprice"), 18, 4) *
          (lit(1) - dec(col("l_discount"), 18, 4))).cast(DoubleType).as("revenue"))
        .orderBy(col("revenue").desc, col("c_custkey").asc)
        .limit(20)),

    // TPC-H Q12 shape (shipping-priority screen; l_shipmode is absent from
    // the fixture so l_linestatus carries the grouping): conditional
    // high/low priority counts over the order⋈lineitem year window.
    "tpch_q12_like" -> ((s, d) =>
      orders(s, d)
        .join(lineitem(s, d)
          .filter(col("l_shipdate") >= lit("1996-01-01").cast(TimestampType) &&
            col("l_shipdate") < lit("1997-01-01").cast(TimestampType)),
          col("o_orderkey") === col("l_orderkey"))
        .groupBy("l_linestatus")
        .agg(
          sum(when(col("o_orderpriority").isin("1-URGENT", "2-HIGH"), 1L)
            .otherwise(0L)).as("high_line_count"),
          sum(when(col("o_orderpriority").isin("1-URGENT", "2-HIGH"), 0L)
            .otherwise(1L)).as("low_line_count"))
        .orderBy("l_linestatus")),

    // TPC-H Q13 shape (customer order-count distribution): LEFT OUTER with
    // the filter in the JOIN CONDITION (moving it to WHERE would silently
    // turn the join inner and lose zero-order customers), then the
    // two-level count-of-counts aggregate.
    "tpch_q13_like" -> ((s, d) =>
      customer(s, d)
        .join(orders(s, d),
          col("c_custkey") === col("o_custkey") &&
            col("o_orderpriority") =!= "1-URGENT", "left_outer")
        .groupBy("c_custkey").agg(count(col("o_orderkey")).as("c_count"))
        .groupBy("c_count").agg(count(lit(1)).as("custdist"))
        .orderBy(col("custdist").desc, col("c_count").desc)),

    // TPC-H Q14 shape (promotion effect): conditional-share ratio over the
    // part join in a one-month window — NULL-else conditional sum so both
    // engines skip non-promo rows identically.
    "tpch_q14_like" -> ((s, d) =>
      lineitem(s, d)
        .filter(col("l_shipdate") >= lit("1996-09-01").cast(TimestampType) &&
          col("l_shipdate") < lit("1996-10-01").cast(TimestampType))
        .join(broadcast(part(s, d)), col("l_partkey") === col("p_partkey"))
        .withColumn("vol", dec(col("l_extendedprice"), 18, 4) *
          (lit(1) - dec(col("l_discount"), 18, 4)))
        .agg((sum(when(col("p_type") === "PROMO", col("vol"))).cast(DoubleType) /
          sum(col("vol")).cast(DoubleType)).as("promo_share"))),

    // TPC-H Q19 shape (discounted revenue, disjunctive predicates): the
    // OR-of-ANDs join — Catalyst must extract the p_partkey equi-key for
    // the hash join and keep the three brand/size/quantity branches as the
    // join filter; a nested-loop fallback here would be the plan bug the
    // pin guards against.
    "tpch_q19_like" -> ((s, d) =>
      lineitem(s, d)
        .join(broadcast(part(s, d)),
          col("p_partkey") === col("l_partkey") && (
            (col("p_brand") === "Brand#12" && col("p_size").between(1, 15) &&
              col("l_quantity").between(1, 11)) ||
            (col("p_brand") === "Brand#23" && col("p_size").between(1, 25) &&
              col("l_quantity").between(10, 20)) ||
            (col("p_brand") === "Brand#34" && col("p_size").between(1, 35) &&
              col("l_quantity").between(20, 30))))
        .agg(sum(dec(col("l_extendedprice"), 18, 4) *
          (lit(1) - dec(col("l_discount"), 18, 4))).cast(DoubleType).as("revenue")))
  )

  val oracles: Map[String, String] = Map(
    // the bucket layout is a physical property; the logical result is the
    // plain join — which is exactly what the oracle proves
    "join_bucket_colocated" ->
      ("SELECT o_orderstatus, count(*) AS n_items, " +
       s"${oDsum2("l_extendedprice")} AS sum_price " +
       "FROM lineitem JOIN orders ON l_orderkey = o_orderkey " +
       "GROUP BY o_orderstatus ORDER BY o_orderstatus"),

    "join_pit_scd2" ->
      ("WITH dim AS (SELECT user_id, ts AS valid_from, event_id AS version_id, " +
       "value AS attr, lead(ts, 1) OVER (PARTITION BY user_id " +
       "ORDER BY ts ASC, event_id ASC) AS valid_to " +
       "FROM events WHERE event_type = 'signup'), " +
       "facts AS (SELECT event_id, user_id, ts FROM events " +
       "WHERE event_type = 'purchase') " +
       "SELECT f.event_id, d.version_id, d.valid_from, d.attr " +
       "FROM facts f JOIN dim d ON f.user_id = d.user_id " +
       "AND d.valid_from <= f.ts " +
       "AND (d.valid_to IS NULL OR f.ts < d.valid_to) " +
       "ORDER BY f.event_id"),

    "join_salted" ->
      ("SELECT s_nationkey, count(*) AS n_items, " +
       s"${oDsum2("l_extendedprice")} AS sum_price " +
       "FROM lineitem JOIN supplier ON l_suppkey = s_suppkey " +
       "GROUP BY s_nationkey ORDER BY s_nationkey"),

    // plain join, no bloom: the oracle proves the prefilter result-invariant
    "join_bloom_prefilter" ->
      ("SELECT CAST(date_trunc('month', o_orderdate) AS DATE) AS mo, " +
       "count(*) AS n_items, " +
       s"${oDbl("SUM(CAST(l_extendedprice AS DECIMAL(18,4)) * (1 - CAST(l_discount AS DECIMAL(18,4))))")} AS revenue " +
       "FROM lineitem JOIN orders ON l_orderkey = o_orderkey " +
       "WHERE o_totalprice > 400000 GROUP BY 1 ORDER BY mo"),

    "join_inner_broadcast" ->
      ("SELECT o_orderkey, o_custkey, c_name, c_mktsegment, o_totalprice " +
       "FROM orders JOIN customer ON o_custkey = c_custkey ORDER BY o_orderkey"),

    "join_inner_shuffle" ->
      ("SELECT l_orderkey, l_linenumber, o_orderstatus, l_quantity " +
       "FROM lineitem JOIN orders ON l_orderkey = o_orderkey " +
       "ORDER BY l_orderkey, l_linenumber, o_orderstatus, l_quantity"),

    "join_multiway_star" ->
      ("SELECT r_name, " +
       s"${oDbl("SUM(CAST(l_extendedprice AS DECIMAL(18,4)) * (1 - CAST(l_discount AS DECIMAL(18,4))))")} AS revenue, " +
       "count(*) AS n_items " +
       "FROM lineitem JOIN orders ON l_orderkey = o_orderkey " +
       "JOIN customer ON o_custkey = c_custkey " +
       "JOIN nation ON c_nationkey = n_nationkey " +
       "JOIN region ON n_regionkey = r_regionkey " +
       "GROUP BY r_name ORDER BY r_name"),

    "join_left_outer" ->
      ("SELECT c_custkey, count(o_orderkey) AS order_cnt FROM customer " +
       "LEFT JOIN orders ON c_custkey = o_custkey GROUP BY c_custkey ORDER BY c_custkey"),

    "join_full_outer" ->
      ("SELECT COALESCE(c_nationkey, s_nationkey) AS nationkey, " +
       "COALESCE(cust_cnt, 0) AS cust_cnt, COALESCE(supp_cnt, 0) AS supp_cnt FROM " +
       "(SELECT c_nationkey, count(*) AS cust_cnt FROM customer GROUP BY c_nationkey) cn " +
       "FULL OUTER JOIN " +
       "(SELECT s_nationkey, count(*) AS supp_cnt FROM supplier GROUP BY s_nationkey) sn " +
       "ON c_nationkey = s_nationkey ORDER BY nationkey"),

    "join_semi" ->
      ("SELECT c_custkey, c_name FROM customer c " +
       "WHERE EXISTS (SELECT 1 FROM orders o WHERE o.o_custkey = c.c_custkey) ORDER BY c_custkey"),

    "join_anti" ->
      ("SELECT c_custkey, c_name FROM customer c " +
       "WHERE NOT EXISTS (SELECT 1 FROM orders o WHERE o.o_custkey = c.c_custkey) ORDER BY c_custkey"),

    // Raw-ts comparison is safe here: DuckDB 1.0 reads this file's
    // TIMESTAMP(NANOS) column as µs-truncated TIMESTAMP (verified
    // empirically), identical to Spark's ns→µs read — both engines compare
    // the same µs-floored values.
    "join_theta_range" ->
      ("SELECT s.event_id AS signup_id, p.event_id AS purchase_id FROM events s " +
       "JOIN events p ON p.user_id = s.user_id AND s.event_type = 'signup' AND p.event_type = 'purchase' " +
       "AND p.ts > s.ts AND p.ts <= s.ts + INTERVAL 1 HOUR " +
       "ORDER BY signup_id, purchase_id"),

    "join_range_bucketed" ->
      ("SELECT o.o_orderkey, count(*) AS n_items, count(DISTINCT l.l_orderkey) AS n_orders " +
       "FROM orders o JOIN lineitem l " +
       "ON l.l_extendedprice >= o.o_totalprice - 50.0 AND l.l_extendedprice <= o.o_totalprice + 50.0 " +
       "WHERE o.o_orderkey % 100 = 0 " +
       "GROUP BY o.o_orderkey ORDER BY o.o_orderkey"),

    // plain overlap join — proves the grid bucketing + pair dedup
    // result-invariant
    "join_interval_overlap" ->
      (s"WITH a AS (SELECT s_suppkey, (s_suppkey * $IoMul) % $IoDomain AS a_lo, " +
       s"(s_suppkey * $IoMul) % $IoDomain + $IoASpan AS a_hi FROM supplier), " +
       "b AS (SELECT o_orderkey, o_totalprice, " +
       "date_diff('day', DATE '1995-01-01', CAST(o_orderdate AS DATE)) AS b_lo " +
       "FROM orders) " +
       "SELECT s_suppkey, count(*) AS n_orders, " +
       s"${oDsum2("o_totalprice")} AS sum_price " +
       s"FROM a JOIN b ON a.a_lo <= b.b_lo + $IoBSpan AND b.b_lo <= a.a_hi " +
       "GROUP BY s_suppkey ORDER BY s_suppkey"),

    "join_asof" ->
      ("SELECT event_id, o_orderkey AS asof_orderkey, o_orderdate AS asof_date FROM " +
       "(SELECT e.event_id, o.o_orderkey, o.o_orderdate, " +
       "row_number() OVER (PARTITION BY e.event_id ORDER BY o.o_orderdate DESC, o.o_orderkey DESC) AS rn " +
       "FROM events e JOIN orders o ON o.o_custkey = e.user_id AND o.o_orderdate <= e.ts) " +
       "WHERE rn = 1 ORDER BY event_id"),

    // LEFT JOIN + rank over the UNBOUNDED match, tolerance applied after
    // rank selection (the Spark side bounds the same latest-order row) —
    // putting the bound in the ON clause would instead promote the
    // second-latest fresh order, a different operator
    "join_asof_left" ->
      (s"SELECT event_id, " +
       s"CASE WHEN fresh THEN o_orderkey END AS asof_orderkey, " +
       s"CASE WHEN fresh THEN o_orderdate END AS asof_date FROM " +
       "(SELECT e.event_id, o.o_orderkey, o.o_orderdate, " +
       "date_diff('day', CAST(o.o_orderdate AS DATE), CAST(e.ts AS DATE)) " +
       s"<= $AsofToleranceDays AS fresh, " +
       "row_number() OVER (PARTITION BY e.event_id ORDER BY o.o_orderdate DESC, o.o_orderkey DESC) AS rn " +
       "FROM events e LEFT JOIN orders o ON o.o_custkey = e.user_id AND o.o_orderdate <= e.ts) " +
       "WHERE rn = 1 ORDER BY event_id"),

    "join_asof_tolerance" ->
      ("SELECT event_id, o_orderkey AS asof_orderkey, o_orderdate AS asof_date, " +
       "CAST(date_diff('day', CAST(o_orderdate AS DATE), CAST(ts AS DATE)) AS INT) AS staleness_days FROM " +
       "(SELECT e.event_id, e.ts, o.o_orderkey, o.o_orderdate, " +
       "row_number() OVER (PARTITION BY e.event_id ORDER BY o.o_orderdate DESC, o.o_orderkey DESC) AS rn " +
       "FROM events e JOIN orders o ON o.o_custkey = e.user_id AND o.o_orderdate <= e.ts) " +
       s"WHERE rn = 1 AND date_diff('day', CAST(o_orderdate AS DATE), CAST(ts AS DATE)) <= $AsofToleranceDays " +
       "ORDER BY event_id"),

    "join_asof_forward" ->
      ("SELECT o_orderkey, event_id AS asof_event_id, ts AS asof_ts FROM " +
       "(SELECT o.o_orderkey, e.event_id, e.ts, " +
       "row_number() OVER (PARTITION BY o.o_orderkey ORDER BY e.ts ASC, e.event_id ASC) AS rn " +
       "FROM orders o JOIN events e ON e.user_id = o.o_custkey AND e.ts >= o.o_orderdate) " +
       "WHERE rn = 1 ORDER BY o_orderkey"),

    // declarative restatement of the nearest pick: rank every same-user
    // purchase by (abs time distance, ts, event_id) — rank 1 is always one
    // of the two directional bests, with backward winning exact ties
    "join_asof_nearest" ->
      ("SELECT event_id, nearest_event_id, nearest_ts_us FROM " +
       "(SELECT e.event_id, p.event_id AS nearest_event_id, " +
       "epoch_us(CAST(p.ts AS TIMESTAMP)) AS nearest_ts_us, " +
       "row_number() OVER (PARTITION BY e.event_id ORDER BY " +
       "abs(epoch_us(CAST(e.ts AS TIMESTAMP)) - epoch_us(CAST(p.ts AS TIMESTAMP))) ASC, " +
       "p.ts ASC, p.event_id ASC) AS rn " +
       "FROM events e JOIN events p ON p.user_id = e.user_id " +
       "AND e.event_type = 'error' AND p.event_type = 'purchase') " +
       "WHERE rn = 1 ORDER BY event_id"),

    "join_cross_limited" ->
      ("SELECT r_regionkey, r_name, n_nationkey, n_name FROM region CROSS JOIN nation " +
       "ORDER BY r_regionkey, n_nationkey"),

    "tpch_q3_like" ->
      ("SELECT l_orderkey, o_orderdate, " +
       s"${oDbl("SUM(CAST(l_extendedprice AS DECIMAL(18,4)) * (1 - CAST(l_discount AS DECIMAL(18,4))))")} AS revenue " +
       "FROM lineitem JOIN orders ON l_orderkey = o_orderkey " +
       "JOIN customer ON o_custkey = c_custkey " +
       "WHERE l_shipdate > TIMESTAMP '1998-03-15' AND o_orderdate < TIMESTAMP '1998-03-15' " +
       "AND c_mktsegment = 'BUILDING' " +
       "GROUP BY l_orderkey, o_orderdate ORDER BY revenue DESC, l_orderkey ASC LIMIT 10"),

    "tpch_q5_like" ->
      ("SELECT n_name, " +
       s"${oDbl("SUM(CAST(l_extendedprice AS DECIMAL(18,4)) * (1 - CAST(l_discount AS DECIMAL(18,4))))")} AS revenue, " +
       "count(*) AS n_items " +
       "FROM lineitem JOIN orders ON l_orderkey = o_orderkey " +
       "JOIN customer ON o_custkey = c_custkey " +
       "JOIN supplier ON l_suppkey = s_suppkey AND s_nationkey = c_nationkey " +
       "JOIN nation ON s_nationkey = n_nationkey " +
       "JOIN region ON n_regionkey = r_regionkey " +
       "GROUP BY n_name ORDER BY n_name ASC"),

    // correlated form VERBATIM — DuckDB runs the same per-part scalar
    // subquery text Spark decorrelates
    "tpch_q17_like" ->
      ("SELECT p_brand, count(*) AS n_small, " +
       s"${oDbl("sum(CAST(l_extendedprice AS DECIMAL(18,4)))")} AS sum_price " +
       "FROM lineitem li JOIN part p ON p.p_partkey = li.l_partkey " +
       "WHERE li.l_quantity < (SELECT 0.2 * avg(l2.l_quantity) " +
       "FROM lineitem l2 WHERE l2.l_partkey = li.l_partkey) " +
       "GROUP BY p_brand ORDER BY p_brand"),

    "tpch_q20_like" ->
      ("SELECT s_suppkey, s_name FROM supplier sup " +
       "WHERE EXISTS (SELECT 1 FROM lineitem l WHERE l.l_suppkey = sup.s_suppkey " +
       "AND l.l_returnflag = 'R' AND l.l_discount >= 0.10 " +
       "AND l.l_quantity > (SELECT 1.8 * avg(l2.l_quantity) " +
       "FROM lineitem l2 WHERE l2.l_partkey = l.l_partkey)) " +
       "ORDER BY s_suppkey"),

    "tpch_q22_like" ->
      ("SELECT c_nationkey, count(*) AS n_cust, " +
       s"${oDbl("sum(CAST(c_acctbal AS DECIMAL(18,2)))")} AS sum_acctbal " +
       "FROM customer c " +
       "WHERE CAST(c_acctbal AS DECIMAL(18,2)) * " +
       "(SELECT count(*) FROM customer c2 WHERE c2.c_acctbal > 0) " +
       "> (SELECT sum(CAST(c3.c_acctbal AS DECIMAL(18,2))) " +
       "FROM customer c3 WHERE c3.c_acctbal > 0) " +
       "AND NOT EXISTS (SELECT 1 FROM orders o WHERE o.o_custkey = c.c_custkey " +
       "AND o.o_orderstatus = 'O' AND o.o_totalprice > 200000) " +
       "GROUP BY c_nationkey ORDER BY c_nationkey"),

    // both correlated quantifiers verbatim — DuckDB executes the same
    // EXISTS / NOT EXISTS text Spark decorrelates to semi/anti joins
    "tpch_q21_like" ->
      ("SELECT s_name, count(*) AS numwait " +
       "FROM supplier s JOIN lineitem l1 ON s.s_suppkey = l1.l_suppkey " +
       "JOIN orders o ON o.o_orderkey = l1.l_orderkey " +
       "WHERE o.o_orderstatus = 'F' AND l1.l_returnflag = 'R' " +
       "AND EXISTS (SELECT 1 FROM lineitem l2 " +
       "WHERE l2.l_orderkey = l1.l_orderkey AND l2.l_suppkey <> l1.l_suppkey) " +
       "AND NOT EXISTS (SELECT 1 FROM lineitem l3 " +
       "WHERE l3.l_orderkey = l1.l_orderkey AND l3.l_suppkey <> l1.l_suppkey " +
       "AND l3.l_returnflag = 'R') " +
       "GROUP BY s_name ORDER BY numwait DESC, s_name"),

    // IN-over-grouped-HAVING verbatim — DuckDB executes the same
    // membership text Spark turns into Aggregate-below-LeftSemi
    "tpch_q18_like" ->
      ("SELECT c.c_custkey, o.o_orderkey, CAST(sum(l.l_quantity) AS BIGINT) AS sum_qty " +
       "FROM customer c JOIN orders o ON c.c_custkey = o.o_custkey " +
       "JOIN lineitem l ON o.o_orderkey = l.l_orderkey " +
       "WHERE o.o_orderkey IN (SELECT l2.l_orderkey FROM lineitem l2 " +
       "GROUP BY l2.l_orderkey HAVING sum(l2.l_quantity) > 200) " +
       "GROUP BY c.c_custkey, o.o_orderkey " +
       "ORDER BY sum_qty DESC, o.o_orderkey ASC LIMIT 100"),

    "tpch_q15_like" ->
      ("WITH revenue AS (SELECT l_suppkey AS supplier_no, " +
       "sum(CAST(l_extendedprice AS DECIMAL(18,4)) * " +
       "(1 - CAST(l_discount AS DECIMAL(18,4)))) AS total_revenue " +
       "FROM lineitem WHERE l_returnflag = 'N' GROUP BY l_suppkey) " +
       s"SELECT s.s_suppkey, s.s_name, ${oDbl("r.total_revenue")} AS total_revenue " +
       "FROM supplier s JOIN revenue r ON s.s_suppkey = r.supplier_no " +
       "WHERE r.total_revenue = (SELECT max(total_revenue) FROM revenue) " +
       "ORDER BY s.s_suppkey"),

    "tpch_q11_like" ->
      ("SELECT l_partkey, " + oDbl("v") + " AS value FROM " +
       "(SELECT l_partkey, sum(CAST(l_extendedprice AS DECIMAL(18,4))) AS v, " +
       "CAST(sum(CAST(l_extendedprice AS DECIMAL(18,4))) * 10000 AS BIGINT) AS vmic " +
       "FROM lineitem GROUP BY l_partkey) t " +
       "WHERE vmic * (SELECT 10 * count(DISTINCT l_partkey) FROM lineitem) " +
       "> 12 * (SELECT CAST(sum(CAST(l_extendedprice AS DECIMAL(18,4))) * 10000 AS BIGINT) " +
       "FROM lineitem) " +
       "ORDER BY v DESC, l_partkey ASC"),

    // NOT IN verbatim — DuckDB evaluates the same three-valued membership
    "tpch_q16_like" ->
      ("SELECT p_brand, count(DISTINCT l_suppkey) AS supplier_cnt " +
       "FROM lineitem l JOIN part p ON p.p_partkey = l.l_partkey " +
       "WHERE l.l_suppkey NOT IN (SELECT s_suppkey FROM supplier WHERE s_acctbal < 1000) " +
       "GROUP BY p_brand ORDER BY supplier_cnt DESC, p_brand"),

    "tpch_q4_like" ->
      ("SELECT o_orderpriority, count(*) AS order_count FROM orders " +
       "WHERE o_orderdate >= TIMESTAMP '1996-01-01' AND o_orderdate < TIMESTAMP '1996-04-01' " +
       "AND EXISTS (SELECT 1 FROM lineitem WHERE l_orderkey = o_orderkey " +
       "AND l_shipdate > o_orderdate) " +
       "GROUP BY o_orderpriority ORDER BY o_orderpriority"),

    "tpch_q6_like" ->
      ("SELECT " + oDbl("SUM(CAST(l_extendedprice AS DECIMAL(18,4)) * " +
        "CAST(l_discount AS DECIMAL(18,4)))") + " AS revenue " +
       "FROM lineitem WHERE l_shipdate >= TIMESTAMP '1996-01-01' " +
       "AND l_shipdate < TIMESTAMP '1997-01-01' " +
       "AND l_discount >= 0.05 AND l_discount <= 0.07 AND l_quantity < 24"),

    "tpch_q7_like" ->
      ("SELECT supp_nation, cust_nation, yr, " + oDbl("SUM(vol)") + " AS revenue FROM (" +
       "SELECT n1.n_name AS supp_nation, n2.n_name AS cust_nation, " +
       "CAST(year(l_shipdate) AS BIGINT) AS yr, " +
       "CAST(l_extendedprice AS DECIMAL(18,4)) * (1 - CAST(l_discount AS DECIMAL(18,4))) AS vol " +
       "FROM supplier JOIN lineitem ON s_suppkey = l_suppkey " +
       "JOIN orders ON o_orderkey = l_orderkey " +
       "JOIN customer ON c_custkey = o_custkey " +
       "JOIN nation n1 ON s_nationkey = n1.n_nationkey " +
       "JOIN nation n2 ON c_nationkey = n2.n_nationkey " +
       "WHERE ((n1.n_nationkey % 5 = 1 AND n2.n_nationkey % 5 = 2) OR " +
       "(n1.n_nationkey % 5 = 2 AND n2.n_nationkey % 5 = 1)) " +
       "AND l_shipdate >= TIMESTAMP '1996-01-01' AND l_shipdate < TIMESTAMP '1998-01-01') " +
       "GROUP BY supp_nation, cust_nation, yr ORDER BY supp_nation, cust_nation, yr"),

    "tpch_q8_like" ->
      ("SELECT yr, " + oDbl("SUM(CASE WHEN supp_nation = 'NATION_3' THEN vol END)") +
       " / " + oDbl("SUM(vol)") + " AS mkt_share FROM (" +
       "SELECT CAST(year(o_orderdate) AS BIGINT) AS yr, n1.n_name AS supp_nation, " +
       "CAST(l_extendedprice AS DECIMAL(18,4)) * (1 - CAST(l_discount AS DECIMAL(18,4))) AS vol " +
       "FROM supplier JOIN lineitem ON s_suppkey = l_suppkey " +
       "JOIN orders ON o_orderkey = l_orderkey " +
       "JOIN customer ON c_custkey = o_custkey " +
       "JOIN nation n1 ON s_nationkey = n1.n_nationkey " +
       "JOIN nation n2 ON c_nationkey = n2.n_nationkey " +
       "JOIN region ON n2.n_regionkey = r_regionkey " +
       "WHERE r_name = 'ASIA') " +
       "GROUP BY yr ORDER BY yr"),

    "tpch_q9_like" ->
      ("SELECT nation, yr, " + oDbl("SUM(amount)") + " AS profit FROM (" +
       "SELECT n_name AS nation, CAST(year(o_orderdate) AS BIGINT) AS yr, " +
       "CAST(l_extendedprice AS DECIMAL(18,4)) * (1 - CAST(l_discount AS DECIMAL(18,4))) - " +
       "CAST(p_retailprice AS DECIMAL(18,4)) * CAST(l_quantity AS DECIMAL(18,4)) AS amount " +
       "FROM part JOIN lineitem ON p_partkey = l_partkey " +
       "JOIN supplier ON s_suppkey = l_suppkey " +
       "JOIN orders ON o_orderkey = l_orderkey " +
       "JOIN nation ON s_nationkey = n_nationkey " +
       "WHERE p_name LIKE '%red%') " +
       "GROUP BY nation, yr ORDER BY nation, yr"),

    "tpch_q10_like" ->
      ("SELECT c_custkey, c_name, n_name, " + oDbl("SUM(vol)") + " AS revenue FROM (" +
       "SELECT c_custkey, c_name, n_name, " +
       "CAST(l_extendedprice AS DECIMAL(18,4)) * (1 - CAST(l_discount AS DECIMAL(18,4))) AS vol " +
       "FROM customer JOIN orders ON c_custkey = o_custkey " +
       "JOIN lineitem ON l_orderkey = o_orderkey " +
       "JOIN nation ON c_nationkey = n_nationkey " +
       "WHERE o_orderdate >= TIMESTAMP '1996-01-01' AND o_orderdate < TIMESTAMP '1996-04-01' " +
       "AND l_returnflag = 'R') " +
       "GROUP BY c_custkey, c_name, n_name ORDER BY revenue DESC, c_custkey LIMIT 20"),

    "tpch_q12_like" ->
      ("SELECT l_linestatus, " +
       "CAST(SUM(CASE WHEN o_orderpriority IN ('1-URGENT','2-HIGH') THEN 1 ELSE 0 END) AS BIGINT) AS high_line_count, " +
       // low is the explicit complement (THEN 0 ELSE 1), not NOT IN: on a
       // NULL priority NOT IN yields NULL -> ELSE 0, while Spark's
       // .otherwise(1L) counts the row — complement form makes both sides
       // count NULL as low (ADVICE r15).
       "CAST(SUM(CASE WHEN o_orderpriority IN ('1-URGENT','2-HIGH') THEN 0 ELSE 1 END) AS BIGINT) AS low_line_count " +
       "FROM orders JOIN lineitem ON o_orderkey = l_orderkey " +
       "WHERE l_shipdate >= TIMESTAMP '1996-01-01' AND l_shipdate < TIMESTAMP '1997-01-01' " +
       "GROUP BY l_linestatus ORDER BY l_linestatus"),

    "tpch_q13_like" ->
      ("SELECT c_count, count(*) AS custdist FROM (" +
       "SELECT c_custkey, count(o_orderkey) AS c_count " +
       "FROM customer LEFT OUTER JOIN orders ON c_custkey = o_custkey " +
       "AND o_orderpriority <> '1-URGENT' " +
       "GROUP BY c_custkey) " +
       "GROUP BY c_count ORDER BY custdist DESC, c_count DESC"),

    "tpch_q14_like" ->
      ("SELECT " + oDbl("SUM(CASE WHEN p_type = 'PROMO' THEN " +
        "CAST(l_extendedprice AS DECIMAL(18,4)) * (1 - CAST(l_discount AS DECIMAL(18,4))) END)") +
       " / " + oDbl("SUM(CAST(l_extendedprice AS DECIMAL(18,4)) * " +
        "(1 - CAST(l_discount AS DECIMAL(18,4))))") + " AS promo_share " +
       "FROM lineitem JOIN part ON l_partkey = p_partkey " +
       "WHERE l_shipdate >= TIMESTAMP '1996-09-01' AND l_shipdate < TIMESTAMP '1996-10-01'"),

    "tpch_q19_like" ->
      ("SELECT " + oDbl("SUM(CAST(l_extendedprice AS DECIMAL(18,4)) * " +
        "(1 - CAST(l_discount AS DECIMAL(18,4))))") + " AS revenue " +
       "FROM lineitem JOIN part ON p_partkey = l_partkey AND (" +
       "(p_brand = 'Brand#12' AND p_size BETWEEN 1 AND 15 AND l_quantity BETWEEN 1 AND 11) OR " +
       "(p_brand = 'Brand#23' AND p_size BETWEEN 1 AND 25 AND l_quantity BETWEEN 10 AND 20) OR " +
       "(p_brand = 'Brand#34' AND p_size BETWEEN 1 AND 35 AND l_quantity BETWEEN 20 AND 30))")
  )
}
