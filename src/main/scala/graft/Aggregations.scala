package graft

import org.apache.spark.sql.{Column, DataFrame, SparkSession}
import org.apache.spark.sql.expressions.Window
import org.apache.spark.sql.functions._
import org.apache.spark.sql.types._
import Det._
import Tables._

/** Aggregations (SURVEY.md §2.4): global, grouped, distinct, approximate,
  * rollup/cube/grouping-sets, histogram.
  *
  * All compile to HashAggregateExec with automatic partial (map-side)
  * aggregation — the MR "combiner" for free — so shuffle volume is
  * #groups × #partitions, not #rows, at any scale. Money columns aggregate
  * through exact DECIMAL (rule D2: double summation order is not
  * associative; decimal is) with final casts aligning the type to DuckDB.
  */
object Aggregations {
  type Q = (SparkSession, String) => DataFrame

  /** agg_kmv_overlap: bottom-k sketch size and the mhash modulus. k=256
    * engages the estimation regime exactly where the fixture crosses it
    * (sf0.001/0.01 daily cohorts run ≤150 distinct users — exact regime;
    * sf0.1 runs ~1330/day — estimated; measured before wiring). M=1e12
    * keeps (k-1)*M inside int64 with six headroom digits for the jaccard
    * micro product.
    */
  val KmvK = 256
  val KmvM = 1000000000000L

  /** KMV tombstone rule (VERDICT r18 #3 on the sketch store): users whose
    * hash falls in the bottom 1/KmvDelFrac of the hash space. Hash-space
    * rather than id-space deliberately: the bottom-k sketch retains
    * exactly the SMALLEST hashes, so rule members are guaranteed present
    * in the persisted sketch rows — the "present before delete" half of
    * the pin can never be vacuous (measured: 2/2/8 users hitting 29-30 of
    * 30 day-sketches at the three SFs). Production feeds an explicit GDPR
    * id list; the anti-join shape is identical.
    */
  val KmvDelFrac = 200L

  /** The per-day bottom-k sketch frame (t, h) — the KB-sized artifact the
    * whole KMV family reads. Deterministic two-level pick: k smallest per
    * (day, salt%64) window (64-way parallel), then k smallest of the ≤64k
    * survivors per day — never a full-set sort, never a giant window
    * partition (bottom-k is associative, so the two-level pick equals the
    * one-level one the oracle runs). Fixture-keyed memoSpill (the
    * dedup-pair-table pattern): referenced three times by the pair stage
    * (day list + both sides) — an inline chain would re-run the
    * raw-events distinct per reference, tripling the only corpus-sized
    * stage. [[KmvStore]] promotes this same frame to a CROSS-SESSION
    * parquet artifact (VERDICT r15 #8).
    */
  private[graft] def kmvSketchFrame(s: SparkSession, d: String): DataFrame = {
    val h0 = events(s, d)
      .where(col("user_id").isNotNull)
      .select(to_date(col("ts")).as("t"), mhash(col("user_id"), KmvM).as("h"))
      .distinct()
    val l1 = h0.withColumn("salt", pmod(col("h"), lit(64L)))
      .withColumn("rn", row_number()
        .over(Window.partitionBy("t", "salt").orderBy("h")))
      .where(col("rn") <= KmvK).drop("salt", "rn")
    Sources.memoSpill(s,
        Sources.fixtureKey(d, "events") + ":kmv_sketch", "kmv_sketch") {
      l1.withColumn("rn", row_number()
          .over(Window.partitionBy("t").orderBy("h")))
        .where(col("rn") <= KmvK).drop("rn")
    }
  }

  /** Day-pair overlap estimation over ANY (t, h) sketch frame — shared by
    * `agg_kmv_overlap` (in-process spill) and `kmv_overlap_probe` (the
    * persisted [[KmvStore]]), so the two surfaces answer from the SAME
    * arithmetic by construction. All-integer: U = k smallest of the
    * sketch union, K∩ = union members present in both sketches (h ≤
    * kth-of-union ⇒ h in the member sketch), Jaccard micro-fixed-point,
    * union ≈ (k−1)·M/h_k, intersection = product. Exact regime when
    * |U| < k.
    */
  /** The agg_kmv_overlap oracle, optionally with the tombstone filter
    * applied to the SKETCH rows (round 19 — mirroring the persisted-store
    * probe's anti-join: the sketch was built over the full history, rows
    * of deleted users are removed at READ time; the oracle filters the
    * same hash values the Spark side anti-joins, since a sketch row's h
    * IS the user's hash). The surviving rows form a bottom-k' sketch
    * (exact regime unaffected; the estimated regime keeps the shared
    * (k−1)·M/h_k arithmetic over the survivors — Beyer et al. 2007's
    * τ-threshold union is the production refinement once depletion
    * exceeds a few percent; at this rule's 0.5% it is noise).
    */
  private[graft] def kmvOverlapOracleSql(deleted: Boolean): String = {
    val est = s"CASE WHEN u_size < $KmvK THEN u_size " +
      s"ELSE (${KmvK - 1} * CAST($KmvM AS BIGINT)) // hk END"
    val skSrc = if (deleted) "skv" else "sk"
    val skv = if (deleted)
      s"skv AS (SELECT t, h FROM sk WHERE NOT (h * $KmvDelFrac < $KmvM)), "
    else ""
    "WITH h0 AS (SELECT DISTINCT CAST(ts AS DATE) AS t, " +
    s"((user_id % 1000000007) * 2654435761) % $KmvM AS h " +
    "FROM events WHERE user_id IS NOT NULL), " +
    "sk AS (SELECT t, h FROM (SELECT t, h, " +
    "row_number() OVER (PARTITION BY t ORDER BY h) AS rn FROM h0) " +
    s"WHERE rn <= $KmvK), " +
    skv +
    s"tt AS (SELECT DISTINCT t FROM $skSrc), " +
    "tp AS (SELECT x.t AS ta, y.t AS tb FROM tt x JOIN tt y ON x.t < y.t), " +
    "u AS (SELECT ta, tb, h, count(*) AS nsrc FROM (" +
    s"SELECT tp.ta, tp.tb, sk.h FROM tp JOIN $skSrc sk ON sk.t = tp.ta " +
    s"UNION ALL SELECT tp.ta, tp.tb, sk.h FROM tp JOIN $skSrc sk ON sk.t = tp.tb) " +
    "GROUP BY 1, 2, 3), " +
    "ru AS (SELECT * FROM (SELECT u.*, " +
    "row_number() OVER (PARTITION BY ta, tb ORDER BY h) AS rn FROM u) " +
    s"WHERE rn <= $KmvK), " +
    "ag AS (SELECT ta, tb, CAST(count(*) AS BIGINT) AS u_size, max(h) AS hk, " +
    "CAST(sum(CASE WHEN nsrc = 2 THEN 1 ELSE 0 END) AS BIGINT) AS k_inter " +
    "FROM ru GROUP BY 1, 2) " +
    s"SELECT ta, tb, u_size, k_inter, CAST($est AS BIGINT) AS union_est, " +
    "CAST(k_inter * 1000000 // u_size AS BIGINT) AS jacc_micro, " +
    s"CAST((k_inter * 1000000 // u_size) * ($est) // 1000000 AS BIGINT) AS inter_est " +
    "FROM ag ORDER BY ta, tb"
  }

  private[graft] def kmvOverlapOf(sk: DataFrame): DataFrame = {
    val tt = sk.select(col("t")).distinct()
    val tp = tt.as("x").join(tt.as("y"), col("x.t") < col("y.t"))
      .select(col("x.t").as("ta"), col("y.t").as("tb"))
    val ea = tp.join(sk.withColumnRenamed("t", "ta"), Seq("ta"))
      .select("ta", "tb", "h")
    val eb = tp.join(sk.withColumnRenamed("t", "tb"), Seq("tb"))
      .select("ta", "tb", "h")
    val u = ea.unionAll(eb)
      .groupBy("ta", "tb", "h").agg(count(lit(1)).as("nsrc"))
      .withColumn("rn", row_number()
        .over(Window.partitionBy("ta", "tb").orderBy("h")))
      .where(col("rn") <= KmvK)
    val unionEst = when(col("u_size") < KmvK, col("u_size"))
      .otherwise(expr(s"(${KmvK - 1} * cast($KmvM as bigint)) div hk"))
    u.groupBy("ta", "tb")
      .agg(count(lit(1)).as("u_size"), max("h").as("hk"),
        sum(when(col("nsrc") === 2L, 1L).otherwise(0L)).as("k_inter"))
      .select(col("ta"), col("tb"), col("u_size"), col("k_inter"),
        unionEst.as("union_est"),
        expr("k_inter * 1000000 div u_size").as("jacc_micro"))
      .withColumn("inter_est",
        expr("jacc_micro * union_est div 1000000"))
      .orderBy("ta", "tb")
  }

  val queries: Map[String, Q] = Map(
    "agg_global" -> ((s, d) =>
      lineitem(s, d).agg(
        count(lit(1)).as("n_rows"),
        lsum(col("l_quantity")).as("sum_qty"),
        dsum4(col("l_extendedprice")).as("sum_price"),
        min(col("l_extendedprice")).as("min_price"),
        max(col("l_extendedprice")).as("max_price"))),

    "agg_groupby_q1" -> ((s, d) =>
      // TPC-H Q1 shape; avgs are expressed as exact sums + counts (division
      // scale rules differ between engines; sums are exact and associative).
      lineitem(s, d)
        .filter(col("l_shipdate") <= lit("2001-09-01").cast(TimestampType))
        .groupBy("l_returnflag", "l_linestatus")
        .agg(
          lsum(col("l_quantity")).as("sum_qty"),
          dsum2(col("l_extendedprice")).as("sum_base_price"),
          sum(dec(col("l_extendedprice"), 18, 2) * (lit(1) - dec(col("l_discount"), 6, 2)))
            .cast(DoubleType).as("sum_disc_price"),
          sum(dec(col("l_extendedprice"), 18, 2) * (lit(1) - dec(col("l_discount"), 6, 2))
              * (lit(1) + dec(col("l_tax"), 6, 2)))
            .cast(DoubleType).as("sum_charge"),
          count(lit(1)).as("count_order"))
        .orderBy("l_returnflag", "l_linestatus")),

    "agg_distinct" -> ((s, d) =>
      lineitem(s, d)
        .groupBy("l_returnflag")
        .agg(
          countDistinct(col("l_partkey")).as("n_parts"),
          countDistinct(col("l_suppkey")).as("n_supps"))
        .orderBy("l_returnflag")),

    "agg_approx_distinct" -> ((s, d) =>
      // HLL sketch — mergeable, constant memory per group: the only way
      // COUNT(DISTINCT) stays tractable at 100 TB. The sketch VALUE is
      // engine-specific (never hashable), so since round 17 (VERDICT r16
      // #4) the registered output is a banded SELF-CHECK: the plan
      // computes the HLL estimate AND the exact distinct in one aggregate
      // and ships (group, exact, |approx − exact| ≤ 5% of exact) — the
      // oracle computes (group, exact, TRUE), so the key hash-matches iff
      // the sketch honors its bound in-plan (this is the audit form; a
      // production query ships the approx alone, which is the whole
      // point of the sketch). Sketch rsd = 0.02 (measured: the default
      // 0.05 sketch lands 6.7% off at sf0.1's 1500-distinct groups — one
      // bad register draw past its own 1σ; 0.02 measures 0.4% at every
      // SF, so the 5% band carries ~2.5σ of headroom and still costs
      // constant KBs per group); the PORTABLE driver-verified twin is
      // agg_distinct_sketch below.
      events(s, d)
        .groupBy("event_type")
        .agg(countDistinct(col("user_id")).as("exact_users"),
          approx_count_distinct(col("user_id"), 0.02).as("approx"))
        .select(col("event_type"), col("exact_users"),
          (abs(col("approx") - col("exact_users")) * 20 <= col("exact_users"))
            .as("within_5pct"))
        .orderBy("event_type")),

    "agg_distinct_sketch" -> ((s, d) => {
      // Linear-counting distinct sketch over PORTABLE register hashes
      // (round 6 — VERDICT r5 #2): each user_id maps to one of
      // [[DistinctSketchRegisters]] registers via the same pmod-prime
      // affine family as the count-min sketch below; the sketch state per
      // group is the SET of occupied registers — a bitmap, mergeable by OR
      // and bounded at m bits per group regardless of input size, which is
      // what keeps a distinct count tractable at 100 TB. The estimate
      // -m·ln(1 - occupied/m) is ln-based (not cross-engine bit-stable, so
      // it stays OUT of the hashed output — the text_tfidf_topk contract);
      // scalatest derives it from `occupied` and bounds it within 5% of
      // exact. Unlike agg_approx_distinct's engine-internal HLL, every
      // value here is integer arithmetic a DuckDB oracle reproduces —
      // the sketch REGISTERS themselves are driver-verified. Shape: one
      // distinct (= hash aggregate with map-side partials) on
      // (group, register), then a per-group count — shuffle volume is
      // bounded by groups × m, never rows.
      //
      // The register hash needs a NON-LINEAR mixing round (mid-square):
      // a bare affine map mod P is a low-discrepancy lattice on the
      // contiguous fixture ids — measured occ = n exactly (zero register
      // collisions where ~245 are expected at this load), inflating the
      // estimate 25%. Squaring mod P breaks the lattice: measured occ 1254
      // vs 1255 expected, estimate within 0.2% of exact. All operands stay
      // under 2^63 (h1 < P ≈ 2^30, h1² < 2^60).
      val h1 = pmod(pmod(col("user_id"), lit(SketchP)) * lit(SketchA)
        + lit(SketchB), lit(SketchP))
      val reg = pmod(pmod(h1 * h1, lit(SketchP)),
        lit(DistinctSketchRegisters.toLong))
      events(s, d)
        .where(col("user_id").isNotNull) // exact COUNT(DISTINCT) skips NULLs
        .select(col("event_type"), reg.as("reg")).distinct()
        .groupBy("event_type").agg(count(lit(1)).as("occupied"))
        .select(col("event_type"),
          lit(DistinctSketchRegisters).as("n_registers"), col("occupied"))
        .orderBy("event_type")
    }),

    // HyperLogLog-style registers (round 10) — the distinct counter that
    // does NOT saturate: linear counting (above) stores occupancy and
    // degrades once occupancy nears m, while HLL registers store
    // max(rho) = the deepest trailing-zero run seen per bucket, so the
    // same [[HllRegisters]] longs cover cardinalities from hundreds to
    // billions — the 100 TB distinct sketch. All-integer and portable:
    // bucket = h % m, v = floor(h / m) (power-of-two divisor ⇒ exact
    // IEEE), and rho = length(bin(v & -v)) — the trailing-zero count + 1
    // via the lowest-set-bit trick, pure bit/string ops both engines
    // share, no log2 (whose libm rounding is not cross-engine-stable).
    // State per group is m registers of ≤5 bits, mergeable by MAX — the
    // spec pins split-merge equality and the estimate within 8% of exact.
    // Registers themselves are the driver-verified output (the
    // agg_distinct_sketch contract: ln-based estimates stay out of hashed
    // output).
    "agg_hll_sketch" -> ((s, d) => {
      val h1 = pmod(pmod(col("user_id"), lit(SketchP)) * lit(SketchA)
        + lit(SketchB), lit(SketchP))
      val h2 = pmod(h1 * h1, lit(SketchP))
      events(s, d)
        .where(col("user_id").isNotNull)
        .select(col("event_type"),
          pmod(h2, lit(HllRegisters.toLong)).as("bucket"),
          floor(h2 / lit(HllRegisters)).cast(LongType).as("v"))
        .groupBy("event_type", "bucket")
        .agg(max(when(col("v") === 0, lit(HllMaxRho))
          .otherwise(length(bin(col("v").bitwiseAND(-col("v")))).cast(LongType)))
          .as("max_rho"))
        .orderBy("event_type", "bucket")
    }),

    // Sketch MERGE — the property that makes sketches the 100 TB distinct
    // counter: HLL register state is re-aggregatable (merge = per-bucket
    // MAX, associative + commutative + idempotent), so per-partition
    // partials (here: per event DAY, the natural ingest partition) stored
    // once can answer any coarser rollup WITHOUT re-scanning raw events —
    // the incremental-warehouse pattern (etl_incremental_agg's contract,
    // applied to a non-linear aggregate). The query materializes the daily
    // partial sketches, merges them per event_type, and reports the merged
    // summary (days folded in, occupied registers, register mass); a spec
    // pins the merged registers bit-equal to agg_hll_sketch's direct
    // single-pass registers — the algebraic claim, asserted. Plan: two
    // map-side-combinable aggregates + one broadcast join on the
    // event-type-sized day-count frame; at 100 TB the daily partials are
    // what you'd persist (m registers × groups per day — KBs), and the
    // merge job never touches raw data.
    "agg_sketch_merge" -> ((s, d) => {
      val h1 = pmod(pmod(col("user_id"), lit(SketchP)) * lit(SketchA)
        + lit(SketchB), lit(SketchP))
      val h2 = pmod(h1 * h1, lit(SketchP))
      val daily = events(s, d)
        .where(col("user_id").isNotNull)
        .select(col("event_type"), to_date(col("ts")).as("day"),
          pmod(h2, lit(HllRegisters.toLong)).as("bucket"),
          floor(h2 / lit(HllRegisters)).cast(LongType).as("v"))
        .groupBy("event_type", "day", "bucket")
        .agg(max(when(col("v") === 0, lit(HllMaxRho))
          .otherwise(length(bin(col("v").bitwiseAND(-col("v")))).cast(LongType)))
          .as("rho"))
      val merged = daily
        .groupBy("event_type", "bucket").agg(max("rho").as("rho"))
        .groupBy("event_type")
        .agg(count(lit(1)).as("occupied"), sum("rho").as("sum_rho"))
      val nDays = daily.select("event_type", "day").distinct()
        .groupBy("event_type").agg(count(lit(1)).as("n_days"))
      merged.join(broadcast(nDays), Seq("event_type"))
        .select("event_type", "n_days", "occupied", "sum_rho")
        .orderBy("event_type")
    }),

    // KMV (bottom-k) sketch with set-INTERSECTION estimation (Beyer et
    // al. 2007 / the theta-sketch family) — the capability HLL registers
    // lack: HLL merges by MAX (union only), while a KMV sketch (the k
    // smallest distinct hash values per set) supports overlap: for pair
    // (A, B), U = k smallest of sketch(A) ∪ sketch(B); any h ∈ U that
    // belongs to A also sits in sketch(A) (h ≤ kth-of-union ≤ kth-of-A),
    // so |U ∩ A ∩ B| is computable FROM THE SKETCHES ALONE — Jaccard ≈
    // K∩/|U|, union ≈ (k-1)·M/h_k, intersection = their product. Audience
    // overlap over 100 TB of events from KB-sized per-segment sketches.
    // All-integer ([[Det.mhash]] into [0, M), truncating div), so the
    // estimates themselves are driver-verified — unlike the ln-based HLL
    // estimate that must stay scalatest-side. Exact regime (|U| < k, the
    // whole set is in the sketch) reports exact counts; the spec pins
    // both regimes against a JVM brute force. Scale shape: distinct
    // (type, h) is one map-side-combinable aggregate; bottom-k is the
    // ASSOCIATIVE two-level pick — k smallest within each (type, salt)
    // window (64-way parallel), then k smallest of the ≤ 64k survivors
    // per type — never a full-set sort, never a giant window partition;
    // the pair stage runs on day-pair frames bounded at 2k rows each.
    // Cohorts are DAYS (not event_type, whose per-type user sets are
    // IDENTICAL on this fixture — a vacuous overlap; daily active-user
    // sets partially overlap at every SF, measured before wiring): the
    // 100 TB deployment persists one KB-sized sketch per (day, segment)
    // at ingest and answers any later day-pair retention/overlap question
    // from sketches alone — the agg_sketch_merge pattern extended to the
    // non-mergeable-looking INTERSECTION.
    "agg_kmv_overlap" -> ((s, d) =>
      kmvOverlapOf(kmvSketchFrame(s, d))),

    // Exact weighted percentiles (round 10): the smallest value whose
    // cumulative weight reaches p% of the group's total — here
    // l_extendedprice weighted by l_quantity per returnflag (the "price
    // quartiles by volume" question). Weights accumulate as exact
    // DECIMAL and the target test cross-multiplies (cum·100 ≥ tot·p), so
    // the pick is integer-exact cross-engine — the agg_quantile_sketch
    // predicate on exact weights instead of binned counts. Shape: one
    // pre-aggregation to (group, value) — map-side partials absorb
    // per-value duplication — then a per-group running sum over DISTINCT
    // values; the windowed frame is value-vocabulary-sized. Where that
    // vocabulary is itself huge at 100 TB, the binned sketch
    // (agg_quantile_sketch) is the documented fallback; this is the
    // exact form.
    "agg_weighted_percentiles" -> ((s, d) => {
      val b = lineitem(s, d)
        .groupBy(col("l_returnflag"), col("l_extendedprice"))
        .agg(sum(dec(col("l_quantity"), 18, 2)).as("w"))
        // DISTRIBUTED prefix sum (round 15): the per-flag running sum used
        // to serialize each flag's ~200k distinct prices into ONE window
        // task (3 tasks total at sf0.1 — measured the whole query's
        // bottleneck). Bucketing the price axis (floor-div is monotone,
        // so bucket order == value order) splits the cumulative into a
        // tiny per-bucket-offsets window (flags × ~600 buckets) plus
        // within-bucket windows partitioned (flag, bucket) — full
        // parallelism, exact same cum values (DECIMAL addition is exact
        // and associative). The bucket width is plan-internal: the output
        // is bit-identical, so the oracle is untouched.
        .withColumn("bkt",
          floor(col("l_extendedprice") / lit(10000.0)).cast(LongType))
      val offW = Window.partitionBy("l_returnflag").orderBy("bkt")
        .rowsBetween(Window.unboundedPreceding, -1)
      val bs = b.groupBy("l_returnflag", "bkt").agg(sum("w").as("bw"))
      val off = bs
        .select(col("l_returnflag"), col("bkt"),
          coalesce(sum(col("bw")).over(offW), lit(0).cast(DecimalType(38, 2)))
            .as("off"))
      val inW = Window.partitionBy("l_returnflag", "bkt").orderBy("l_extendedprice")
        .rowsBetween(Window.unboundedPreceding, Window.currentRow)
      // the per-flag TOTAL as a 3-row broadcast join, not an unbounded
      // window (bench r13) — and derived from the ~1800-row bucket
      // subtotal frame, not a third full aggregate over b (exact either
      // way: decimal addition is associative)
      val tot = bs.groupBy("l_returnflag").agg(sum(col("bw")).as("tot"))
      val c = b.select(col("l_returnflag"), col("bkt"), col("l_extendedprice"),
        sum(col("w")).over(inW).as("cum_in"))
        .join(broadcast(off), Seq("l_returnflag", "bkt"))
        .withColumn("cum", col("off") + col("cum_in"))
        .join(broadcast(tot), Seq("l_returnflag"))
      def est(p: Int) =
        min(when(col("cum") * 100 >= col("tot") * p, col("l_extendedprice")))
      c.groupBy("l_returnflag")
        .agg(est(25).as("wp25"), est(50).as("wp50"), est(75).as("wp75"),
          count(lit(1)).as("n_values"))
        .orderBy("l_returnflag")
    }),

    "agg_rollup" -> ((s, d) =>
      // SQL form: referencing ROLLUP grouping columns above the Expand node
      // from the DataFrame API trips Spark's ambiguous-self-join check; the
      // SQL path resolves cleanly and plans identically.
      s.sql(
        s"""SELECT COALESCE(r_name, 'ALL') AS region,
           |       COALESCE(n_name, 'ALL') AS nation,
           |       count(*) AS n_cust,
           |       CAST(SUM(CAST(c_acctbal AS DECIMAL(18,2))) AS DOUBLE) AS sum_bal
           |FROM ${Tables.view(s, d, "customer")}
           |JOIN ${Tables.view(s, d, "nation")} ON c_nationkey = n_nationkey
           |JOIN ${Tables.view(s, d, "region")} ON n_regionkey = r_regionkey
           |GROUP BY ROLLUP(r_name, n_name)
           |ORDER BY region, nation""".stripMargin)),

    "agg_cube" -> ((s, d) =>
      events(s, d)
        .withColumn("day", date_trunc("day", col("ts")).cast(TimestampNTZType))
        .cube("event_type", "day")
        .agg(count(lit(1)).as("n"), dsum4(col("value")).as("sum_value"))
        .select(
          coalesce(col("event_type"), lit("ALL")).as("event_type"),
          coalesce(col("day"), lit("1900-01-01").cast(TimestampNTZType)).as("day"),
          col("n"), col("sum_value"))
        .orderBy("event_type", "day")),

    "agg_grouping_sets" -> ((s, d) =>
      s.sql(
        s"""SELECT COALESCE(c_mktsegment, 'ALL') AS segment,
           |       COALESCE(CAST(c_nationkey AS INT), -1) AS nationkey,
           |       count(*) AS n_cust,
           |       CAST(SUM(CAST(c_acctbal AS DECIMAL(18,2))) AS DOUBLE) AS sum_bal
           |FROM ${Tables.view(s, d, "customer")}
           |GROUP BY GROUPING SETS ((c_mktsegment), (c_nationkey), ())
           |ORDER BY segment, nationkey""".stripMargin)),

    "agg_histogram" -> ((s, d) =>
      orders(s, d)
        .groupBy(floor(col("o_totalprice") / 10000).cast(LongType).as("bucket"))
        .agg(count(lit(1)).as("n"), dsum2(col("o_totalprice")).as("sum_price"))
        .orderBy("bucket")),

    "reshape_pivot" -> ((s, d) =>
      // Explicit pivot values: no discovery scan, stable column set at any
      // data size.
      events(s, d)
        .groupBy("user_id")
        .pivot("event_type", Seq("click", "error", "purchase", "signup", "view"))
        .agg(count(lit(1)))
        .na.fill(0L)
        .orderBy("user_id")),

    "reshape_unpivot" -> ((s, d) =>
      customer(s, d)
        .select(col("c_custkey"),
          expr("stack(2, 'acctbal', c_acctbal, 'nationkey', CAST(c_nationkey AS DOUBLE)) AS (metric, value)"))
        .orderBy("c_custkey", "metric")),

    "agg_boolean" -> ((s, d) =>
      lineitem(s, d)
        .groupBy("l_returnflag")
        .agg(
          expr("count_if(l_discount > 0.05)").as("n_high_disc"),
          expr("bool_and(l_quantity > 0)").as("all_positive_qty"),
          expr("bool_or(l_tax > 0.07)").as("any_high_tax"))
        .orderBy("l_returnflag")),

    "agg_mode" -> ((s, d) => {
      // Deterministic mode: both engines' built-in mode() leaves ties
      // unspecified, so the portable form is count + rank with an explicit
      // tie-break (cnt desc, value asc). Two hash aggregations + one
      // per-group window over the tiny distinct-value frame — the heavy
      // input reduces map-side before anything shuffles.
      val counts = orders(s, d)
        .groupBy("o_orderstatus", "o_orderpriority")
        .agg(count(lit(1)).as("cnt"))
      val w = Window.partitionBy("o_orderstatus")
        .orderBy(col("cnt").desc, col("o_orderpriority").asc)
      counts.withColumn("rn", row_number().over(w))
        .where(col("rn") === 1)
        .select(col("o_orderstatus"), col("o_orderpriority").as("mode_priority"), col("cnt"))
        .orderBy("o_orderstatus")
    }),

    "agg_approx_quantile" -> ((s, d) => {
      // GK-style sketch percentiles — mergeable, bounded memory: the
      // 100 TB path where exact percentile's full sort is off the table.
      // Sketch internals are engine-specific, so since round 17 (VERDICT
      // r16 #4) the registered output is a banded SELF-CHECK: exact
      // DISCRETE percentiles via an explicit rank rule — smallest value
      // whose rank satisfies rn·K ≥ n·q by integer cross-multiplication,
      // identical on both engines, no interpolation so the shipped double
      // is a SELECTED datum, never computed — plus booleans asserting the
      // approx_percentile value lands within the exact [q−δ, q+δ] rank
      // band, δ = 0.005 = 5× the published 1/accuracy rank guarantee at
      // accuracy=1000. Oracle emits (group, exacts, TRUE, TRUE): the key
      // hash-matches iff the sketch honors its bound. (Audit form — the
      // production query ships the approx alone; the exact rank pass here
      // IS the full sort the sketch replaces.)
      val wE = Window.partitionBy("event_type")
      val ranked = events(s, d).where(col("value").isNotNull)
        .select(col("event_type"), col("value"), col("event_id"))
        .withColumn("rn", row_number().over(
          wE.orderBy(col("value").asc, col("event_id").asc)))
        .withColumn("n", count(lit(1)).over(wE))
      // rn is IntegerType (row_number) — the cross-multiplication must run
      // in LONG or rn·1000 wraps past ~2.1M rows per group (code-review
      // r17; the oracle's BIGINT arithmetic would expose it as a hash
      // fail, but the shipped percentile would simply be wrong first)
      def at(numer: Int, denom: Int) =
        min(when(col("rn").cast("long") * denom >= col("n") * numer, col("value")))
      ranked.groupBy("event_type")
        .agg(
          expr("approx_percentile(value, 0.5, 1000)").as("a50"),
          expr("approx_percentile(value, 0.99, 1000)").as("a99"),
          at(1, 2).as("p50_exact"), at(99, 100).as("p99_exact"),
          at(495, 1000).as("lo50"), at(505, 1000).as("hi50"),
          at(985, 1000).as("lo99"), at(995, 1000).as("hi99"))
        .select(col("event_type"), col("p50_exact"), col("p99_exact"),
          (col("a50") >= col("lo50") && col("a50") <= col("hi50")).as("p50_in_band"),
          (col("a99") >= col("lo99") && col("a99") <= col("hi99")).as("p99_in_band"))
        .orderBy("event_type")
    }),

    "agg_quantile_sketch" -> ((s, d) => {
      // Binned-histogram quantile sketch over PORTABLE integer arithmetic
      // (the driver-verified twin of agg_approx_quantile, the same
      // relationship agg_distinct_sketch has to agg_approx_distinct): values
      // land in [[QuantileSketchBins]] equi-width bins of width
      // [[QuantileSketchWidth]] (power of two — value/4.0 is exact IEEE
      // scaling, floor is exact, so the binning is bit-identical
      // cross-engine); the sketch state per group is the bin→count map —
      // mergeable by ADDITION and bounded at m counters per group at any
      // input size, which is what replaces exact percentile's full sort at
      // 100 TB. The q-quantile estimate is the upper edge of the first bin
      // whose cumulative count reaches ceil(q·n), found by integer
      // CROSS-MULTIPLICATION (cum·100 ≥ n·pct ⟺ cum ≥ ceil(n·pct/100)) —
      // no division, no floats, so unlike approx_percentile's KLL internals
      // every output value is DuckDB-reproducible. Error is bounded by the
      // bin width by construction (AggWindowSpec pins it vs exact
      // percentile). Shape: one hash aggregate to (group, bin) — map-side
      // partials make shuffle volume groups × m, never rows — then a window
      // over the tiny binned frame.
      val w = QuantileSketchWidth
      val m = QuantileSketchBins
      val bin = greatest(
        least(floor(col("value") / lit(w.toDouble)).cast(LongType), lit(m - 1L)),
        lit(0L))
      val counts = events(s, d).where(col("value").isNotNull)
        .groupBy(col("event_type"), bin.as("bin"))
        .agg(count(lit(1)).as("cnt"))
      val cumW = Window.partitionBy("event_type").orderBy("bin")
        .rowsBetween(Window.unboundedPreceding, Window.currentRow)
      val allW = Window.partitionBy("event_type")
      def est(pct: Int): org.apache.spark.sql.Column =
        min(when(col("cum") * 100 >= col("n") * pct, col("bin")))
      counts
        .withColumn("cum", sum("cnt").over(cumW))
        .withColumn("n", sum("cnt").over(allW))
        .groupBy("event_type")
        .agg(max(col("n")).as("n_rows"),
          est(50).as("p50_bin"), est(90).as("p90_bin"), est(99).as("p99_bin"))
        .select(col("event_type"), col("n_rows"),
          ((col("p50_bin") + 1) * w).cast(DoubleType).as("p50_hi"),
          ((col("p90_bin") + 1) * w).cast(DoubleType).as("p90_hi"),
          ((col("p99_bin") + 1) * w).cast(DoubleType).as("p99_hi"))
        .orderBy("event_type")
    }),

    "agg_heavy_hitters" -> ((s, d) => {
      // Count-min sketch frequency estimation: d=4 seeded hash rows ×
      // w=256 buckets. The sketch is one groupBy over (row, bucket) —
      // mergeable, constant memory — and the estimate for a key is the MIN
      // over its d bucket counts (one-sided overestimate). At 100 TB the
      // sketch replaces an exact word count whose key space won't fit;
      // here the estimates for the 20 globally-hottest words are emitted,
      // scalatest bounds them against the exact counts, AND (round 5) the
      // whole sketch is DuckDB-oracle-verified via the portable [[cmPolyFold]]/
      // [[cmBucket]] hash family (see the Cm* constants' doc for the
      // geometry and the large-multiplier requirement), so a sketch op no
      // longer has to hide behind rows-only verification the way the
      // xxhash-seeded ones do (D5). Since round 11 the add-mergeable cells
      // also back the streaming twin [[Streaming.cmStream]].
      val words = documents(s, d)
        .select(explode(split(col("text"), " ")).as("w"))
      val hashed = words.withColumn("base", cmBase(col("w")))
      val cells = hashed.select(col("w"),
          posexplode(array((0 until CmRows).map(r => cmBucket(r, col("base"))): _*))
            .as(Seq("r", "bucket")))
        .groupBy("r", "bucket").agg(count(lit(1)).as("cnt"))
      // query the sketch for the top-20 exact words (the realistic flow:
      // candidate keys come from a sample or a prior pass)
      val top = words.groupBy("w").agg(count(lit(1)).as("true_cnt"))
        .orderBy(col("true_cnt").desc, col("w").asc).limit(20)
      top.withColumn("base", cmBase(col("w")))
        .select(col("w"), col("true_cnt"),
          posexplode(array((0 until CmRows).map(r =>
            struct(lit(r).as("r"), cmBucket(r, col("base")).as("bucket"))): _*))
            .as(Seq("i", "rb")))
        .select(col("w"), col("true_cnt"), col("rb.r").as("r"), col("rb.bucket").as("bucket"))
        .join(cells, Seq("r", "bucket"))
        .groupBy("w", "true_cnt")
        .agg(min(col("cnt")).as("est_cnt"))
        .orderBy(col("true_cnt").desc, col("w").asc)
    }),

    "agg_percentiles" -> ((s, d) =>
      // Exact interpolated percentiles over integral quantities (both engines
      // use the same (1-f)*lo + f*hi rule on doubles) + the t-digest-style
      // approx variant for the 100 TB path is approx_percentile (no oracle on
      // sketch output — median/p90 here are exact).
      lineitem(s, d)
        .groupBy("l_returnflag")
        .agg(
          expr("percentile(l_quantity, 0.5)").as("median_qty"),
          expr("percentile(l_quantity, 0.9)").as("p90_qty"),
          count(lit(1)).as("n"))
        .orderBy("l_returnflag")),

    // Statistical aggregates (corr / covar_pop / stddev_pop) with EXACT
    // accumulation: the built-in corr/covar sum doubles in partition order
    // (non-associative → not hash-stable cross-engine), so the five moment
    // sums accumulate as exact decimals — still one map-side-partial hash
    // aggregate — and the closed-form moment formulas run on their DOUBLE
    // renderings in an op order mirrored exactly by the oracle (shared
    // machinery: [[momentSums]]/[[oMoments]]). Zero-variance groups yield
    // NULL on BOTH engines (nullifZero denominators — Spark's bare 0/0 is
    // NaN while DuckDB's is NULL, which would hash-mismatch on degenerate
    // data). n ≥ 1 always, so the covar/stddev denominators need no guard.
    // Spec checks the result against Spark's built-in corr to 1e-9.
    "agg_corr_stats" -> ((s, d) => {
      val m = MomentCols
      import m._
      momentSums(s, d).select(col("l_returnflag"), col("n"),
          ((nD * sxy - sx * sy) / (nD * nD)).as("covar_pop"),
          ((nD * sxy - sx * sy) /
            nullifZero(sqrt(varTermX) * sqrt(varTermY))).as("corr"),
          (sqrt(varTermX) / nD).as("stddev_qty"))
        .orderBy("l_returnflag")
    }),

    // A/B test: Welch's t-statistic for purchase value between two
    // deterministic user cohorts (user_id parity — the hash-split
    // contract: assignment is re-derivable per row, D5). ONE conditional-
    // aggregation pass collects both cohorts' exact-decimal moment sums
    // (n, Σv, Σv²) — the same sufficient-statistics recipe as
    // agg_corr_stats, so at 100 TB the experiment readout is a single
    // partial+final hash aggregate over the event stream, and the Welch
    // solve is per-row arithmetic on DOUBLE renderings in an op order the
    // oracle mirrors token-for-token (sqrt is correctly rounded IEEE on
    // both engines — the corr_stats precedent).
    "agg_ab_test" -> ((s, d) => {
      val v = dec(col("value"), 18, 4)
      val isA = pmod(col("user_id"), lit(2L)) === 0
      val moments = events(s, d)
        .where(col("event_type") === "purchase" && col("user_id").isNotNull)
        .agg(
          count(when(isA, lit(1))).as("n_a"),
          count(when(!isA, lit(1))).as("n_b"),
          sum(when(isA, v)).cast(DecimalType(38, 4)).as("dsa"),
          sum(when(!isA, v)).cast(DecimalType(38, 4)).as("dsb"),
          sum(when(isA, v * v)).cast(DecimalType(38, 8)).as("ds2a"),
          sum(when(!isA, v * v)).cast(DecimalType(38, 8)).as("ds2b"))
      val na = col("n_a").cast(DoubleType); val nb = col("n_b").cast(DoubleType)
      val sa = col("dsa").cast(DoubleType); val sb = col("dsb").cast(DoubleType)
      val s2a = col("ds2a").cast(DoubleType); val s2b = col("ds2b").cast(DoubleType)
      // sample variance (n−1): exact numerator, clamped at 0 like varTermX
      val va = greatest(na * s2a - sa * sa, lit(0.0)) / (na * (na - 1.0))
      val vb = greatest(nb * s2b - sb * sb, lit(0.0)) / (nb * (nb - 1.0))
      val se = sqrt(va / na + vb / nb)
      moments.select(col("n_a"), col("n_b"),
        (sa / na).as("mean_a"), (sb / nb).as("mean_b"),
        ((sa / na - sb / nb) / when(se =!= 0.0, se)).as("t_stat"))
    }),

    // Chi-square independence test event_type × cohort — the categorical
    // counterpart of agg_ab_test (does behavior mix differ between
    // experiment arms?). One conditional-aggregation pass collects the
    // 5×2 contingency table as ten integer counts; the chi² statistic is
    // then a GENERATED arithmetic expression over those counts — the same
    // string evaluates in Spark and DuckDB (the Morton-code precedent), so
    // the IEEE op sequence is identical token-for-token and even the
    // derived double hash-matches. At 100 TB: one partial+final hash
    // aggregate over the stream, the solve is constant work.
    "agg_chi_square" -> ((s, d) => {
      val counts = events(s, d).where(col("user_id").isNotNull)
        .agg(ChiCells.head, ChiCells.tail: _*)
      counts.selectExpr(
        s"($chiNExpr) AS n_events",
        s"CAST(${(ChiTypes.size - 1) * 1} AS INT) AS dof",
        s"($chiStatExpr) AS chi2")
    }),

    // Mann–Whitney U between the user-parity cohorts (agg_ab_test's split)
    // over event value — the NONPARAMETRIC two-sample test: rank-based, so
    // it needs no normality assumption and is immune to the outliers that
    // dominate Welch's t on heavy-tailed metrics. ALL-INTEGER by the ×2
    // midrank trick: a tie group spanning ranks [lo, lo+c−1] has
    // 2·midrank = 2·lo + c − 1 (always integer), so the rank sums and
    // U = R − n(n+1)/2 ship doubled (u0_x2/u1_x2) with no float anywhere —
    // exactly oracle-hashable. Shape: one hash-agg to DISTINCT values
    // (c, c0 per value), a global prefix-sum window over that frame, one
    // final fold. The single-partition window runs over the DISTINCT-value
    // frame, not the rows — bounded by the value vocabulary, a FIXTURE
    // property, not a structural one; agg_mann_whitney_binned below is the
    // quantize-first form whose bound is structural. Property pinned in
    // spec: u0_x2 + u1_x2 == 2·n0·n1.
    "agg_mann_whitney" -> ((s, d) =>
      mannWhitneyU(cohortCounts(s, d, col("value")))),

    // The 100 TB form of the rank tests (VERDICT r7 #3): quantize value to
    // the agg_quantile_sketch 256-bin grid FIRST (same constants, same
    // exact-IEEE floor-scaling — bit-identical binning cross-engine), then
    // run the identical prefix-sum machinery over bins. Within-bin values
    // tie (the standard large-scale midrank formulation); the distinct-key
    // frame under the single-partition window is now STRUCTURALLY ≤ 256
    // rows at any input size, where the exact variants' frame is bounded
    // only by the value vocabulary the fixture happens to have.
    // AggWindowSpec pins binned-vs-exact agreement on the fixtures.
    "agg_mann_whitney_binned" -> ((s, d) =>
      mannWhitneyU(cohortCounts(s, d, sketchBin))),

    // Kolmogorov–Smirnov D between the same parity cohorts — the
    // distribution-level complement to agg_mann_whitney's location test
    // (MW detects a shift; KS detects ANY distributional difference:
    // shape, variance, tails). Exact and all-integer by
    // cross-multiplication: D = max |F0 − F1| over the pooled support
    // = max |c0cum·n1 − c1cum·n0| / (n0·n1), and the output ships the
    // integer numerator beside n0/n1 instead of dividing — no float
    // anywhere. Same shape as MW: one hash-agg to distinct values, a
    // prefix-sum window over that frame (vocabulary-bounded — see
    // agg_ks_binned for the structurally-bounded form), one max fold;
    // the 1-row totals frame broadcasts.
    "agg_ks_test" -> ((s, d) =>
      ksStatistic(cohortCounts(s, d, col("value")))),

    // Binned KS over the same 256-bin grid (see agg_mann_whitney_binned).
    // Binned D can only UNDERSTATE exact D: the binned ECDF difference is
    // the exact one evaluated at bin boundaries — a max over a subset of
    // the support — so d_num_binned ≤ d_num_exact with identical n0/n1
    // (pinned directionally in AggWindowSpec).
    "agg_ks_binned" -> ((s, d) =>
      ksStatistic(cohortCounts(s, d, sketchBin))),

    // Least-squares fit price ~ quantity per returnflag from the same
    // sufficient statistics — regression as a single aggregation pass is
    // the classic MapReduce ML example (only the moment sums shuffle, the
    // solve is per-group arithmetic). A constant-x group yields NULL slope
    // and intercept on both engines (nullifZero; NULL propagates).
    "agg_linear_fit" -> ((s, d) => {
      val m = MomentCols
      import m._
      val slope = (nD * sxy - sx * sy) / nullifZero(varTermX)
      momentSums(s, d).select(col("l_returnflag"), col("n"),
          slope.as("slope"),
          ((sy - slope * sx) / nD).as("intercept"))
        .orderBy("l_returnflag")
    }),

    // Poisson bootstrap confidence interval for the per-group mean — the
    // single-pass uncertainty estimate (Chamandy et al.'s "Estimating
    // uncertainty for massive data streams", the standard trick once
    // resampling a 100 TB table is off the table): each row contributes to
    // each of B=64 replicates with an independent Poisson(1) weight, so
    // one scan + one (group, replicate) aggregation replaces B full
    // resamples. Weights derive from the portable multiplicative hash of
    // (event_id·B + b) through the Poisson(1) inverse CDF (integer
    // thresholds ×1e-6, identical constants in the oracle) — fully
    // deterministic, partition-independent, no rand(). Values enter as
    // floor-micro integers so every replicate sum is exact BIGINT (at
    // 100 TB the sums graduate to DECIMAL; the division of exact integers
    // is a single IEEE op on both engines). The CI is the 4th/61st order
    // statistic of the 64 replicate means (~95% coverage), picked by a
    // 64-row-per-group window — bounded by construction.
    "agg_bootstrap_ci" -> ((s, d) => {
      val B = BootstrapReplicates
      val reps = events(s, d)
        .select(col("event_type"), col("event_id"),
          floor(col("value") * 1000000).cast(LongType).as("v_micro"))
        .select(col("event_type"), col("event_id"), col("v_micro"),
          explode(expr(s"sequence(0L, ${B - 1}L)")).as("b"))
        .withColumn("u", mhash(col("event_id") * B + col("b"), 1000000L))
        .withColumn("w", PoissonThresholds.zipWithIndex.reverse
          .foldLeft(lit(PoissonThresholds.length.toLong)) {
            case (acc, (thr, k)) => when(col("u") < thr, k.toLong).otherwise(acc)
          })
      val means = reps.groupBy("event_type", "b")
        .agg((sum(col("w") * col("v_micro")).cast(DoubleType) /
          sum(col("w")).cast(DoubleType)).as("mean_b"))
      val rk = Window.partitionBy("event_type")
        .orderBy(col("mean_b").asc, col("b").asc)
      val ci = means.withColumn("rn", row_number().over(rk))
        .groupBy("event_type")
        .agg(max(when(col("rn") === 4, col("mean_b"))).as("ci_lo_micro"),
          max(when(col("rn") === 61, col("mean_b"))).as("ci_hi_micro"))
      events(s, d)
        .select(col("event_type"),
          floor(col("value") * 1000000).cast(LongType).as("v_micro"))
        .groupBy("event_type")
        .agg(count(lit(1)).as("n_events"),
          (sum(col("v_micro")).cast(DoubleType) /
            count(lit(1)).cast(DoubleType)).as("mean_micro"))
        .join(ci, Seq("event_type"))
        .orderBy("event_type")
    }),

    // Robust outlier screen (median/IQR/MAD) — the data-quality gate that
    // mean/stddev can't be (one corrupt value drags both; the median and
    // MAD have 50% breakdown). Values enter as floor-micro INTEGERS so
    // every interpolated percentile is exact: the quantile fractions are
    // binary (.25/.5/.75), making (1-f)·lo + f·hi exact IEEE arithmetic
    // on integer inputs — and |v − med| differences stay representable, so
    // the second-pass MAD median is exact too (the agg_percentiles
    // cross-engine rule, extended to two passes). Scale shape: two
    // grouped percentile aggregations and one broadcast join of the 5-row
    // stats frame back onto the stream — fence checks are then map-side.
    // Spark's exact percentile holds a per-group value buffer (like
    // DuckDB's); the 100 TB form swaps in the mergeable
    // agg_quantile_sketch bins registered alongside.
    "agg_robust_outliers" -> ((s, d) => {
      val base = events(s, d)
        .select(col("event_type"),
          floor(col("value") * 1000000).cast(LongType).as("v"))
      val stats = base.groupBy("event_type")
        .agg(count(lit(1)).as("n_events"),
          expr("percentile(v, 0.5D)").as("med"),
          expr("percentile(v, 0.25D)").as("q1"),
          expr("percentile(v, 0.75D)").as("q3"))
      val withDev = base.join(broadcast(stats), Seq("event_type"))
        .withColumn("adev", abs(col("v").cast(DoubleType) - col("med")))
      withDev.groupBy("event_type")
        .agg(expr("percentile(adev, 0.5D)").as("mad"),
          max(col("n_events")).as("n_events"),
          max(col("med")).as("med"),
          max(col("q3") - col("q1")).as("iqr"),
          sum(when(col("v") < col("q1") - (col("q3") - col("q1")) * 1.5 ||
            col("v") > col("q3") + (col("q3") - col("q1")) * 1.5, 1L)
            .otherwise(0L)).as("n_outliers_iqr"))
        .select(col("event_type"), col("n_events"), col("med"), col("iqr"),
          col("mad"), col("n_outliers_iqr"))
        .orderBy("event_type")
    })
  )

  /** Bootstrap replicate count (agg_bootstrap_ci). 64: the 4th/61st order
    * statistics bracket ~95%, and the per-group replicate frame stays a
    * constant 64 rows.
    */
  val BootstrapReplicates = 64
  /** Poisson(1) inverse-CDF thresholds ×1e6 (cumulative P(X ≤ k), k =
    * 0..5; a uniform draw ≥ the last maps to weight 6). Integer constants
    * so query and oracle share them verbatim.
    */
  val PoissonThresholds: Seq[Long] =
    Seq(367879L, 735758L, 919698L, 981011L, 996340L, 999405L)

  /** Rank-statistic machinery shared by the exact and binned Mann–Whitney /
    * KS variants. cohortCounts is the one hash-agg both run: rows reduce to
    * the DISTINCT-key cohort frame (k, c = total count, c0 = cohort-0
    * count); `key` is the raw value (exact) or [[sketchBin]] (binned — the
    * structural ≤256-row bound). Both engines filter NULL user_id AND NULL
    * value: Spark windows order NULLS FIRST, DuckDB NULLS LAST, so an
    * unguarded NULL key would silently desynchronize the prefix sums
    * (ADVICE r7 — the asofMatched NULL-uid hazard class).
    */
  private def cohortCounts(s: SparkSession, d: String, key: Column): DataFrame =
    events(s, d)
      .where(col("user_id").isNotNull && col("value").isNotNull)
      .select(key.as("k"), pmod(col("user_id"), lit(2L)).as("cohort"))
      .groupBy("k").agg(
        count(lit(1)).as("c"),
        sum(when(col("cohort") === 0, 1L).otherwise(0L)).as("c0"))

  /** The agg_quantile_sketch bin key (identical constants): exact IEEE
    * floor-scaling by a power of two, clamped to [0, 255].
    */
  private def sketchBin: Column = greatest(
    least(floor(col("value") / lit(QuantileSketchWidth.toDouble)).cast(LongType),
      lit(QuantileSketchBins - 1L)),
    lit(0L))

  /** ×2-midrank Mann–Whitney over a cohort frame: prefix-sum window for
    * 2·midrank = 2·(ranks before) + c + 1, then one integral fold.
    */
  private def mannWhitneyU(g: DataFrame): DataFrame = {
    val w = Window.orderBy("k").rowsBetween(Window.unboundedPreceding, -1)
    g.withColumn("before", coalesce(sum(col("c")).over(w), lit(0L)))
      .withColumn("r2", lit(2L) * col("before") + col("c") + 1L)
      .agg(
        sum(col("c0") * col("r2")).as("r0_2"),
        sum((col("c") - col("c0")) * col("r2")).as("r1_2"),
        sum(col("c0")).as("n0"),
        sum(col("c") - col("c0")).as("n1"))
      .select(
        (col("r0_2") - col("n0") * (col("n0") + 1L)).as("u0_x2"),
        (col("r1_2") - col("n1") * (col("n1") + 1L)).as("u1_x2"),
        col("n0"), col("n1"))
  }

  /** Cross-multiplied KS D over a cohort frame: cumulative cohort counts
    * down the ordered key frame, D's integer numerator via one max fold.
    */
  private def ksStatistic(g: DataFrame): DataFrame = {
    val w = Window.orderBy("k")
      .rowsBetween(Window.unboundedPreceding, Window.currentRow)
    val cum = g
      .withColumn("c0c", sum(col("c0")).over(w))
      .withColumn("c1c", sum(col("c") - col("c0")).over(w))
    val totals = broadcast(g.agg(
      sum(col("c0")).as("n0"), sum(col("c") - col("c0")).as("n1")))
    cum.crossJoin(totals)
      .agg(
        max(abs(col("c0c") * col("n1") - col("c1c") * col("n0"))).as("d_num"),
        max(col("n0")).as("n0"), max(col("n1")).as("n1"))
  }

  /** DuckDB twin of [[sketchBin]] — floor() BEFORE the BIGINT cast (the
    * agg_quantile_sketch oracle's rule: DuckDB CAST rounds half-even where
    * Spark truncates; on the already-integral floor() output both exact).
    */
  private def sketchBinSql: String =
    s"greatest(least(CAST(floor(value / $QuantileSketchWidth.0) AS BIGINT), " +
      s"${QuantileSketchBins - 1}), 0)"

  /** Shared cohort-frame CTE prefix for the rank-test oracles. */
  private def cohortCteSql(keySql: String): String =
    s"WITH ev AS (SELECT $keySql AS k, user_id % 2 AS cohort FROM events " +
    "WHERE user_id IS NOT NULL AND value IS NOT NULL), " +
    "g AS (SELECT k, count(*) AS c, " +
    "sum(CASE WHEN cohort = 0 THEN 1 ELSE 0 END) AS c0 FROM ev GROUP BY k)"

  private def mwOracle(keySql: String): String =
    cohortCteSql(keySql) + ", " +
    "r AS (SELECT c, c0, 2 * coalesce(sum(c) OVER (ORDER BY k " +
    "ROWS BETWEEN UNBOUNDED PRECEDING AND 1 PRECEDING), 0) + c + 1 AS r2 FROM g), " +
    "a AS (SELECT sum(c0 * r2) AS r0_2, sum((c - c0) * r2) AS r1_2, " +
    "sum(c0) AS n0, sum(c - c0) AS n1 FROM r) " +
    "SELECT CAST(r0_2 - n0 * (n0 + 1) AS BIGINT) AS u0_x2, " +
    "CAST(r1_2 - n1 * (n1 + 1) AS BIGINT) AS u1_x2, " +
    "CAST(n0 AS BIGINT) AS n0, CAST(n1 AS BIGINT) AS n1 FROM a"

  private def ksOracle(keySql: String): String =
    cohortCteSql(keySql) + ", " +
    "cum AS (SELECT c, c0, " +
    "sum(c0) OVER (ORDER BY k ROWS BETWEEN UNBOUNDED PRECEDING AND CURRENT ROW) AS c0c, " +
    "sum(c - c0) OVER (ORDER BY k ROWS BETWEEN UNBOUNDED PRECEDING AND CURRENT ROW) AS c1c " +
    "FROM g), " +
    "t AS (SELECT sum(c0) AS n0, sum(c - c0) AS n1 FROM g) " +
    "SELECT CAST(max(abs(c0c * t.n1 - c1c * t.n0)) AS BIGINT) AS d_num, " +
    "CAST(max(t.n0) AS BIGINT) AS n0, CAST(max(t.n1) AS BIGINT) AS n1 " +
    "FROM cum CROSS JOIN t"

  /** agg_chi_square machinery: the 5×2 contingency cells as conditional
    * counts, and the chi² solve as ONE generated expression string shared
    * verbatim by the Spark query and the DuckDB oracle — identical parse,
    * identical left-associative IEEE sequence, so the derived double
    * hash-matches (the Morton/spreadBits precedent). Expected cells are
    * never zero on this design: every event_type and both parity cohorts
    * occur, and the guard is structural (a missing type would zero its row
    * totals identically on both engines).
    */
  private val ChiTypes = Seq("click", "error", "purchase", "signup", "view")
  private def chiCell(t: String, c: Int) = s"n_${t}_$c"
  private val ChiCells: Seq[Column] = ChiTypes.flatMap(t => Seq(0, 1).map(c =>
    count(when(col("event_type") === t && pmod(col("user_id"), lit(2L)) === c,
      lit(1))).as(chiCell(t, c))))
  private val chiNExpr: String =
    ChiTypes.map(t => s"(${chiCell(t, 0)} + ${chiCell(t, 1)})").mkString(" + ")
  private val chiStatExpr: String = {
    def cd(t: String, c: Int) = s"CAST(${chiCell(t, c)} AS DOUBLE)"
    val colTot = (0 to 1).map(c =>
      s"(${ChiTypes.map(t => cd(t, c)).mkString(" + ")})")
    val rowTot = ChiTypes.map(t => s"(${cd(t, 0)} + ${cd(t, 1)})")
    val nTot = s"(${rowTot.mkString(" + ")})"
    val terms = for (ti <- ChiTypes.indices; c <- 0 to 1) yield {
      val o = cd(ChiTypes(ti), c)
      val e = s"(${rowTot(ti)} * ${colTot(c)} / $nTot)"
      s"(($o - $e) * ($o - $e) / $e)"
    }
    terms.mkString(" + ")
  }

  /** Linear-counting register count (agg_distinct_sketch): 4096 registers
    * ≈ 1.5% standard error at the fixture's ~1500-distinct load factor;
    * at 100 TB cardinalities the same pipeline swaps in more registers (or
    * HLL registers) without changing shape — the sketch stays m bits/group.
    */
  val DistinctSketchRegisters = 4096
  /** HLL geometry (agg_hll_sketch): 256 registers ≈ 6.5% standard error —
    * the classic m=2^8 point; HllMaxRho caps the v=0 corner (all ~22
    * remaining hash bits zero, probability ~m/P).
    */
  val HllRegisters = 256
  val HllMaxRho = 23L

  /** JVM form of the HLL register update — the same affine+mid-square +
    * trailing-zero pipeline the agg_hll_sketch plan and its oracle
    * interpolate, for streaming state ([[Streaming.hllStream]]) and spec
    * references. numberOfTrailingZeros(v)+1 ≡ length(bin(v & -v)).
    */
  private[graft] def hllBucketRho(uid: Long): (Int, Long) = {
    val h1 = ((uid % SketchP) * SketchA + SketchB) % SketchP
    val h2 = (h1 * h1) % SketchP
    val v = h2 / HllRegisters
    val rho =
      if (v == 0L) HllMaxRho else java.lang.Long.numberOfTrailingZeros(v) + 1L
    ((h2 % HllRegisters).toInt, rho)
  }
  /** Quantile-sketch bins (agg_quantile_sketch): 256 bins × width 4 cover
    * [0, 1024) — the fixture value domain tops out at ~560 (sf0.1); values
    * past the cap clamp into the last bin, so the sketch degrades (p99 of a
    * heavy tail saturates at the cap) rather than breaks. Width is a power
    * of two so value/width is exact IEEE scaling on both engines.
    */
  val QuantileSketchBins = 256
  val QuantileSketchWidth = 4
  /** Shared pmod-prime affine hash family (count-min + linear counting). */
  private[graft] val SketchP = 1000000007L
  private[graft] val SketchA = 2654435761L
  private[graft] val SketchB = 374761393L

  /** Count-min geometry + portable hash family (agg_heavy_hitters and its
    * streaming twin [[Streaming.cmStream]]): CmRows seeded hash rows ×
    * CmWidth buckets; base = the polynomial char fold mod 1e9+7
    * (text_fingerprint's machinery), row hash = ((base·A_r + B_r) mod p)
    * mod w — all non-negative integer arithmetic, bit-identical across
    * Spark, DuckDB, and the JVM forms below. The per-row multipliers MUST
    * be large (the public xxhash/murmur mixing primes): with small
    * multipliers like 2r+1 the four row-hashes are near-proportional
    * transforms of the same base, a pair colliding in one row tends to
    * collide in all four, and the min-over-rows stops cancelling
    * collisions (measured: est 2× over the eps·N bound on the sf0.001
    * vocabulary).
    */
  val CmRows = 4
  val CmWidth = 256
  private[graft] val CmA = Seq(2654435761L, 2246822519L, 3266489917L, 668265263L)
  private[graft] val CmB = Seq(0L, 374761393L, 3042594569L, 1541459225L)
  private[graft] val CmP = 1000000007L
  private[graft] def cmPolyFold: String =
    "aggregate(transform(split(w, ''), c -> ascii(c)), 0L, " +
    s"(acc, x) -> pmod(acc * 31 + x, ${CmP}L))"
  /** Engine path for the same per-word base hash: the codegen'd
    * code-point loop (value-identical to [[cmPolyFold]], spec-pinned);
    * the SQL string remains the portable mirror the oracle executes.
    */
  private[graft] def cmBase(c: org.apache.spark.sql.Column): org.apache.spark.sql.Column =
    org.apache.spark.sql.graft.BpeOps.poly_hash(c, CmP)
  private[graft] def cmBucket(r: Int, base: org.apache.spark.sql.Column): org.apache.spark.sql.Column =
    pmod(pmod(base * lit(CmA(r)) + lit(CmB(r)), lit(CmP)), lit(CmWidth.toLong))
  /** JVM forms of the same fold/bucket — streaming state and spec
    * references. base < p and A_r < 3.3e9, so base·A_r < 3.3e18 stays
    * inside Long exactly as in the column form.
    */
  private[graft] def cmBaseOf(w: String): Long = {
    // code-point iteration, NOT per-UTF-16-char fold: the column forms
    // (SQL split('')+ascii and the native PolyHash loop) both fold code
    // points, so a supplementary-plane word folded per char here would
    // silently diverge from the stream/batch state it mirrors
    // (code-review r13 fourth pass)
    var acc = 0L
    var i = 0
    while (i < w.length) {
      val cp = w.codePointAt(i)
      acc = (acc * 31 + cp) % CmP
      i += Character.charCount(cp)
    }
    acc
  }
  private[graft] def cmBucketOf(r: Int, base: Long): Int =
    (((base * CmA(r) + CmB(r)) % CmP) % CmWidth).toInt

  /** Per-returnflag exact-decimal sufficient statistics (n, Σx, Σy, Σx²,
    * Σy², Σxy) for x = l_quantity, y = l_extendedprice — ONE partial+final
    * hash aggregate shared by agg_corr_stats and agg_linear_fit so the
    * Spark-vs-oracle token mirroring is maintained in exactly one place.
    */
  private def momentSums(s: SparkSession, d: String): DataFrame = {
    val x = dec(col("l_quantity"), 18, 4)
    val y = dec(col("l_extendedprice"), 18, 4)
    lineitem(s, d).groupBy("l_returnflag").agg(
      count(lit(1)).as("n"),
      sum(x).cast(DecimalType(38, 4)).as("dsx"),
      sum(y).cast(DecimalType(38, 4)).as("dsy"),
      sum(x * x).cast(DecimalType(38, 8)).as("dsxx"),
      sum(y * y).cast(DecimalType(38, 8)).as("dsyy"),
      sum(x * y).cast(DecimalType(38, 8)).as("dsxy"))
  }

  /** DOUBLE renderings of [[momentSums]] columns + the shared guard forms. */
  private object MomentCols {
    import org.apache.spark.sql.Column
    val nD: Column = col("n").cast(DoubleType)
    val sx: Column = col("dsx").cast(DoubleType)
    val sy: Column = col("dsy").cast(DoubleType)
    val sxx: Column = col("dsxx").cast(DoubleType)
    val syy: Column = col("dsyy").cast(DoubleType)
    val sxy: Column = col("dsxy").cast(DoubleType)
    /** n·Σx² − (Σx)², floored at 0: the exact value is ≥ 0, but the double
      * rendering can round an ~0 variance fractionally negative — Spark's
      * sqrt(-ε) is NaN while DuckDB ERRORS, so both sides clamp identically.
      */
    val varTermX: Column = greatest(nD * sxx - sx * sx, lit(0.0))
    val varTermY: Column = greatest(nD * syy - sy * sy, lit(0.0))
    /** NULL when zero (mirrors SQL nullif(x, 0)): x/NULL is NULL on both
      * engines where bare x/0 diverges (Spark NaN vs DuckDB NULL).
      */
    def nullifZero(c: Column): Column = when(c =!= 0.0, c)
  }

  // Oracle mirror of [[momentSums]] — ONE definition for both stat queries.
  // DECIMAL(28,4) product operands force DuckDB's int128 multiply path
  // (18-digit operands overflow its int64 fast path on price²); the VALUES
  // are identical — decimal arithmetic is exact at any declared width, and
  // Spark's BigDecimal side needs no mirror change.
  private val oMoments: String =
    ("(SELECT l_returnflag, count(*) AS n, " +
     s"${oDbl("CAST(SUM(CAST(l_quantity AS DECIMAL(18,4))) AS DECIMAL(38,4))")} AS sx, " +
     s"${oDbl("CAST(SUM(CAST(l_extendedprice AS DECIMAL(18,4))) AS DECIMAL(38,4))")} AS sy, " +
     s"${oDbl("CAST(SUM(CAST(l_quantity AS DECIMAL(28,4)) * CAST(l_quantity AS DECIMAL(28,4))) AS DECIMAL(38,8))")} AS sxx, " +
     s"${oDbl("CAST(SUM(CAST(l_extendedprice AS DECIMAL(28,4)) * CAST(l_extendedprice AS DECIMAL(28,4))) AS DECIMAL(38,8))")} AS syy, " +
     s"${oDbl("CAST(SUM(CAST(l_quantity AS DECIMAL(28,4)) * CAST(l_extendedprice AS DECIMAL(28,4))) AS DECIMAL(38,8))")} AS sxy " +
     "FROM lineitem GROUP BY l_returnflag)")

  private val oNd = "CAST(n AS DOUBLE)"
  // mirrors MomentCols.varTermX/Y (greatest-0 clamp) and nullifZero
  private val oVarX = s"greatest($oNd * sxx - sx * sx, 0)"
  private val oVarY = s"greatest($oNd * syy - sy * sy, 0)"

  val oracles: Map[String, String] = Map(
    // identical closed-form moment arithmetic on the oDbl renderings of the
    // same exact decimal sums — op order mirrors the Spark expressions,
    // including the zero-variance NULL guards
    "agg_corr_stats" ->
      ("SELECT l_returnflag, n, " +
       s"($oNd * sxy - sx * sy) / ($oNd * $oNd) AS covar_pop, " +
       s"($oNd * sxy - sx * sy) / nullif(sqrt($oVarX) * sqrt($oVarY), 0) AS corr, " +
       s"sqrt($oVarX) / $oNd AS stddev_qty " +
       s"FROM $oMoments ORDER BY l_returnflag"),

    "agg_linear_fit" -> {
      val slope = s"($oNd * sxy - sx * sy) / nullif($oVarX, 0)"
      ("SELECT l_returnflag, n, " +
       s"$slope AS slope, " +
       s"(sy - $slope * sx) / $oNd AS intercept " +
       s"FROM $oMoments ORDER BY l_returnflag")
    },

    "agg_chi_square" -> {
      val cases = ChiTypes.flatMap(t => Seq(0, 1).map(c =>
        s"count(CASE WHEN event_type = '$t' AND user_id % 2 = $c THEN 1 END) AS ${chiCell(t, c)}"))
        .mkString(", ")
      (s"WITH m AS (SELECT $cases FROM events WHERE user_id IS NOT NULL) " +
       s"SELECT ($chiNExpr) AS n_events, CAST(${ChiTypes.size - 1} AS INT) AS dof, " +
       s"($chiStatExpr) AS chi2 FROM m")
    },

    // ×2 midrank formulation — every operand integer; final casts pin
    // DuckDB's HUGEINT sums back to BIGINT so stringify matches Spark long.
    // Exact and binned share the CTE chain; only the key expression differs
    // (the identical sharing the Spark side has through cohortCounts).
    "agg_mann_whitney" -> mwOracle("value"),
    "agg_mann_whitney_binned" -> mwOracle(sketchBinSql),
    "agg_ks_test" -> ksOracle("value"),
    "agg_ks_binned" -> ksOracle(sketchBinSql),

    "agg_ab_test" -> {
      val na = "CAST(n_a AS DOUBLE)"; val nb = "CAST(n_b AS DOUBLE)"
      val sa = "CAST(dsa AS DOUBLE)"; val sb = "CAST(dsb AS DOUBLE)"
      val s2a = "CAST(ds2a AS DOUBLE)"; val s2b = "CAST(ds2b AS DOUBLE)"
      val va = s"greatest($na * $s2a - $sa * $sa, 0.0) / ($na * ($na - 1.0))"
      val vb = s"greatest($nb * $s2b - $sb * $sb, 0.0) / ($nb * ($nb - 1.0))"
      val se = s"sqrt($va / $na + $vb / $nb)"
      ("WITH m AS (SELECT " +
       "count(CASE WHEN user_id % 2 = 0 THEN 1 END) AS n_a, " +
       "count(CASE WHEN user_id % 2 <> 0 THEN 1 END) AS n_b, " +
       "CAST(SUM(CASE WHEN user_id % 2 = 0 THEN CAST(value AS DECIMAL(18,4)) END) AS DECIMAL(38,4)) AS dsa, " +
       "CAST(SUM(CASE WHEN user_id % 2 <> 0 THEN CAST(value AS DECIMAL(18,4)) END) AS DECIMAL(38,4)) AS dsb, " +
       "CAST(SUM(CASE WHEN user_id % 2 = 0 THEN CAST(value AS DECIMAL(18,4)) * CAST(value AS DECIMAL(18,4)) END) AS DECIMAL(38,8)) AS ds2a, " +
       "CAST(SUM(CASE WHEN user_id % 2 <> 0 THEN CAST(value AS DECIMAL(18,4)) * CAST(value AS DECIMAL(18,4)) END) AS DECIMAL(38,8)) AS ds2b " +
       "FROM events WHERE event_type = 'purchase' AND user_id IS NOT NULL) " +
       s"SELECT n_a, n_b, $sa / $na AS mean_a, $sb / $nb AS mean_b, " +
       s"($sa / $na - $sb / $nb) / nullif($se, 0) AS t_stat FROM m")
    },

    "agg_global" ->
      (s"SELECT count(*) AS n_rows, ${oLsum("l_quantity")} AS sum_qty, " +
       s"${oDsum4("l_extendedprice")} AS sum_price, " +
       "min(l_extendedprice) AS min_price, max(l_extendedprice) AS max_price FROM lineitem"),

    "agg_groupby_q1" ->
      ("SELECT l_returnflag, l_linestatus, " +
       s"${oLsum("l_quantity")} AS sum_qty, " +
       s"${oDsum2("l_extendedprice")} AS sum_base_price, " +
       s"${oDbl("SUM(CAST(l_extendedprice AS DECIMAL(18,2)) * (1 - CAST(l_discount AS DECIMAL(6,2))))")} AS sum_disc_price, " +
       s"${oDbl("SUM(CAST(l_extendedprice AS DECIMAL(18,2)) * (1 - CAST(l_discount AS DECIMAL(6,2))) * (1 + CAST(l_tax AS DECIMAL(6,2))))")} AS sum_charge, " +
       "count(*) AS count_order " +
       "FROM lineitem WHERE l_shipdate <= TIMESTAMP '2001-09-01' " +
       "GROUP BY l_returnflag, l_linestatus ORDER BY l_returnflag, l_linestatus"),

    "agg_distinct" ->
      ("SELECT l_returnflag, count(DISTINCT l_partkey) AS n_parts, " +
       "count(DISTINCT l_suppkey) AS n_supps FROM lineitem " +
       "GROUP BY l_returnflag ORDER BY l_returnflag"),

    // banded self-check (VERDICT r16 #4): the oracle asserts the exact
    // distinct and that the band boolean is TRUE — the Spark side computes
    // the boolean from its own HLL estimate in-plan, so a sketch that
    // breaks its 5% bound fails the hash, while the engine-specific
    // estimate itself never enters the hashed output
    "agg_approx_distinct" ->
      ("SELECT event_type, CAST(count(DISTINCT user_id) AS BIGINT) AS exact_users, " +
       "TRUE AS within_5pct FROM events GROUP BY event_type ORDER BY event_type"),

    // same contract for the percentile sketch: exact DISCRETE percentiles
    // by the identical integer rank rule (smallest value with rn·K ≥ n·q —
    // selected data, no interpolation), bands asserted TRUE
    "agg_approx_quantile" ->
      ("WITH r AS (SELECT event_type, value, " +
       "row_number() OVER (PARTITION BY event_type ORDER BY value, event_id) AS rn, " +
       "count(*) OVER (PARTITION BY event_type) AS n " +
       "FROM events WHERE value IS NOT NULL) " +
       "SELECT event_type, " +
       "min(CASE WHEN rn * 2 >= n THEN value END) AS p50_exact, " +
       "min(CASE WHEN rn * 100 >= n * 99 THEN value END) AS p99_exact, " +
       "TRUE AS p50_in_band, TRUE AS p99_in_band " +
       "FROM r GROUP BY event_type ORDER BY event_type"),

    "agg_boolean" ->
      ("SELECT l_returnflag, " +
       "CAST(count(*) FILTER (WHERE l_discount > 0.05) AS BIGINT) AS n_high_disc, " +
       "bool_and(l_quantity > 0) AS all_positive_qty, " +
       "bool_or(l_tax > 0.07) AS any_high_tax " +
       "FROM lineitem GROUP BY l_returnflag ORDER BY l_returnflag"),

    "agg_heavy_hitters" ->
      ("WITH words AS (SELECT unnest(string_split(text, ' ')) AS w FROM documents), " +
       "hashed AS (SELECT w, " +
       oIntFold("list_transform(string_split(w, ''), c -> CAST(ascii(c) AS BIGINT))",
         "(acc, x) -> (acc * 31 + x) % 1000000007") + " AS base " +
       "FROM words), " +
       "rs AS (SELECT CAST(r AS BIGINT) AS r, CAST(a AS BIGINT) AS a, CAST(b AS BIGINT) AS b " +
       "FROM (VALUES (0, 2654435761, 0), (1, 2246822519, 374761393), " +
       "(2, 3266489917, 3042594569), (3, 668265263, 1541459225)) AS t(r, a, b)), " +
       "cells AS (SELECT r, ((base * a + b) % 1000000007) % 256 AS bucket, " +
       "count(*) AS cnt FROM hashed CROSS JOIN rs GROUP BY 1, 2), " +
       "top AS (SELECT w, count(*) AS true_cnt FROM words GROUP BY w " +
       "ORDER BY true_cnt DESC, w ASC LIMIT 20), " +
       "th AS (SELECT w, true_cnt, " +
       oIntFold("list_transform(string_split(w, ''), c -> CAST(ascii(c) AS BIGINT))",
         "(acc, x) -> (acc * 31 + x) % 1000000007") + " AS base " +
       "FROM top), " +
       "q AS (SELECT th.w, th.true_cnt, r, " +
       "((base * a + b) % 1000000007) % 256 AS bucket " +
       "FROM th CROSS JOIN rs) " +
       "SELECT q.w, q.true_cnt, CAST(min(c.cnt) AS BIGINT) AS est_cnt " +
       "FROM q JOIN cells c ON c.r = q.r AND c.bucket = q.bucket " +
       "GROUP BY 1, 2 ORDER BY true_cnt DESC, w ASC"),

    // the register hash interpolates the SAME constants as the Spark side
    // (affine + mid-square rounds); user_id >= 0 so the literal % mirrors
    // pmod (Det.mhash contract)
    "agg_distinct_sketch" -> {
      val h1 = s"(((user_id % $SketchP) * $SketchA + $SketchB) % $SketchP)"
      s"SELECT event_type, CAST($DistinctSketchRegisters AS INT) AS n_registers, " +
      s"count(DISTINCT ($h1 * $h1) % $SketchP % $DistinctSketchRegisters) AS occupied " +
      "FROM events WHERE user_id IS NOT NULL GROUP BY event_type ORDER BY event_type"
    },

    // same affine+mid-square hash tokens; rho via the lowest-set-bit /
    // bin-length trick — no log2 (libm rounding is not cross-engine-
    // stable); floor(h2 / 256) is exact IEEE (power-of-two divisor)
    "agg_hll_sketch" -> {
      val h1 = s"(((user_id % $SketchP) * $SketchA + $SketchB) % $SketchP)"
      s"WITH h AS (SELECT event_type, ($h1 * $h1) % $SketchP AS h2 " +
      "FROM events WHERE user_id IS NOT NULL), " +
      s"r AS (SELECT event_type, h2 % $HllRegisters AS bucket, " +
      s"CAST(floor(h2 / $HllRegisters) AS BIGINT) AS v FROM h) " +
      "SELECT event_type, bucket, " +
      s"max(CASE WHEN v = 0 THEN $HllMaxRho " +
      "ELSE CAST(length(bin(v & -v)) AS BIGINT) END) AS max_rho " +
      "FROM r GROUP BY event_type, bucket ORDER BY event_type, bucket"
    },

    // the daily-partial → merged rollup, mirrored CTE for CTE
    "agg_sketch_merge" -> {
      val h1 = s"(((user_id % $SketchP) * $SketchA + $SketchB) % $SketchP)"
      s"WITH h AS (SELECT event_type, CAST(ts AS DATE) AS day, " +
      s"($h1 * $h1) % $SketchP AS h2 FROM events WHERE user_id IS NOT NULL), " +
      s"r AS (SELECT event_type, day, h2 % $HllRegisters AS bucket, " +
      s"CAST(floor(h2 / $HllRegisters) AS BIGINT) AS v FROM h), " +
      "daily AS (SELECT event_type, day, bucket, " +
      s"max(CASE WHEN v = 0 THEN $HllMaxRho " +
      "ELSE CAST(length(bin(v & -v)) AS BIGINT) END) AS rho " +
      "FROM r GROUP BY event_type, day, bucket), " +
      "merged AS (SELECT event_type, bucket, max(rho) AS rho FROM daily " +
      "GROUP BY event_type, bucket), " +
      "m2 AS (SELECT event_type, CAST(count(*) AS BIGINT) AS occupied, " +
      "CAST(sum(rho) AS BIGINT) AS sum_rho FROM merged GROUP BY event_type), " +
      "nd AS (SELECT event_type, CAST(count(DISTINCT day) AS BIGINT) AS n_days " +
      "FROM daily GROUP BY event_type) " +
      "SELECT event_type, n_days, occupied, sum_rho FROM m2 " +
      "JOIN nd USING (event_type) ORDER BY event_type"
    },

    // one-level bottom-k (== the associative two-level pick), same mhash,
    // same truncating integer estimates; non-negative operands make // and
    // div identical
    "agg_kmv_overlap" -> kmvOverlapOracleSql(deleted = false),

    // identical pre-agg → running-DECIMAL-sum → cross-multiplied pick
    "agg_weighted_percentiles" ->
      ("WITH b AS (SELECT l_returnflag, l_extendedprice, " +
       "SUM(CAST(l_quantity AS DECIMAL(18,2))) AS w FROM lineitem GROUP BY 1, 2), " +
       "c AS (SELECT l_returnflag, l_extendedprice, " +
       "SUM(w) OVER (PARTITION BY l_returnflag ORDER BY l_extendedprice " +
       "ROWS UNBOUNDED PRECEDING) AS cum, " +
       "SUM(w) OVER (PARTITION BY l_returnflag) AS tot FROM b) " +
       "SELECT l_returnflag, " +
       "min(CASE WHEN cum * 100 >= tot * 25 THEN l_extendedprice END) AS wp25, " +
       "min(CASE WHEN cum * 100 >= tot * 50 THEN l_extendedprice END) AS wp50, " +
       "min(CASE WHEN cum * 100 >= tot * 75 THEN l_extendedprice END) AS wp75, " +
       "count(*) AS n_values " +
       "FROM c GROUP BY l_returnflag ORDER BY l_returnflag"),

    // binning, cumulative rank, and cross-multiplied quantile targets all
    // interpolate the SAME QuantileSketchBins/QuantileSketchWidth constants
    // as the Spark side; floor() runs BEFORE the BIGINT cast (DuckDB CAST
    // rounds-half-even where Spark truncates — on the already-integral
    // floor() output both are exact)
    "agg_quantile_sketch" -> {
      val w = QuantileSketchWidth
      val top = QuantileSketchBins - 1
      def est(pct: Int) = s"min(CASE WHEN cum * 100 >= n * $pct THEN bin END)"
      s"WITH b AS (SELECT event_type, " +
      s"greatest(least(CAST(floor(value / $w.0) AS BIGINT), $top), 0) AS bin, " +
      "count(*) AS cnt FROM events WHERE value IS NOT NULL GROUP BY 1, 2), " +
      "c AS (SELECT event_type, bin, " +
      "CAST(SUM(cnt) OVER (PARTITION BY event_type ORDER BY bin " +
      "ROWS UNBOUNDED PRECEDING) AS BIGINT) AS cum, " +
      "CAST(SUM(cnt) OVER (PARTITION BY event_type) AS BIGINT) AS n FROM b) " +
      "SELECT event_type, max(n) AS n_rows, " +
      s"CAST((${est(50)} + 1) * $w AS DOUBLE) AS p50_hi, " +
      s"CAST((${est(90)} + 1) * $w AS DOUBLE) AS p90_hi, " +
      s"CAST((${est(99)} + 1) * $w AS DOUBLE) AS p99_hi " +
      "FROM c GROUP BY event_type ORDER BY event_type"
    },

    "agg_mode" ->
      ("SELECT o_orderstatus, o_orderpriority AS mode_priority, cnt FROM " +
       "(SELECT o_orderstatus, o_orderpriority, count(*) AS cnt, " +
       "row_number() OVER (PARTITION BY o_orderstatus " +
       "ORDER BY count(*) DESC, o_orderpriority ASC) AS rn " +
       "FROM orders GROUP BY 1, 2) " +
       "WHERE rn = 1 ORDER BY o_orderstatus"),

    "agg_rollup" ->
      ("SELECT COALESCE(r_name, 'ALL') AS region, COALESCE(n_name, 'ALL') AS nation, " +
       s"count(*) AS n_cust, ${oDsum2("c_acctbal")} AS sum_bal " +
       "FROM customer JOIN nation ON c_nationkey = n_nationkey " +
       "JOIN region ON n_regionkey = r_regionkey " +
       "GROUP BY ROLLUP(r_name, n_name) ORDER BY region, nation"),

    "agg_cube" ->
      ("SELECT COALESCE(event_type, 'ALL') AS event_type, " +
       "COALESCE(day, TIMESTAMP '1900-01-01') AS day, " +
       s"count(*) AS n, ${oDsum4("value")} AS sum_value " +
       "FROM (SELECT event_type, CAST(date_trunc('day', ts) AS TIMESTAMP) AS day, value FROM events) " +
       "GROUP BY CUBE(event_type, day) ORDER BY event_type, day"),

    "agg_grouping_sets" ->
      ("SELECT COALESCE(c_mktsegment, 'ALL') AS segment, " +
       "COALESCE(CAST(c_nationkey AS INT), -1) AS nationkey, " +
       s"count(*) AS n_cust, ${oDsum2("c_acctbal")} AS sum_bal " +
       "FROM customer GROUP BY GROUPING SETS ((c_mktsegment), (c_nationkey), ()) " +
       "ORDER BY segment, nationkey"),

    "agg_histogram" ->
      ("SELECT CAST(floor(o_totalprice / 10000) AS BIGINT) AS bucket, " +
       s"count(*) AS n, ${oDsum2("o_totalprice")} AS sum_price " +
       "FROM orders GROUP BY 1 ORDER BY bucket"),

    "reshape_pivot" ->
      ("SELECT user_id, " +
       "count(*) FILTER (WHERE event_type = 'click') AS click, " +
       "count(*) FILTER (WHERE event_type = 'error') AS error, " +
       "count(*) FILTER (WHERE event_type = 'purchase') AS purchase, " +
       "count(*) FILTER (WHERE event_type = 'signup') AS signup, " +
       "count(*) FILTER (WHERE event_type = 'view') AS view " +
       "FROM events GROUP BY user_id ORDER BY user_id"),

    "reshape_unpivot" ->
      ("SELECT c_custkey, metric, value FROM (" +
       "SELECT c_custkey, 'acctbal' AS metric, c_acctbal AS value FROM customer " +
       "UNION ALL SELECT c_custkey, 'nationkey', CAST(c_nationkey AS DOUBLE) FROM customer) " +
       "ORDER BY c_custkey, metric"),

    "agg_percentiles" ->
      ("SELECT l_returnflag, quantile_cont(l_quantity, 0.5) AS median_qty, " +
       "quantile_cont(l_quantity, 0.9) AS p90_qty, count(*) AS n " +
       "FROM lineitem GROUP BY l_returnflag ORDER BY l_returnflag"),

    // same hash, same Poisson thresholds, same floor-micro integer values;
    // DuckDB SUM(BIGINT) is HUGEINT — cast back before the double division
    "agg_bootstrap_ci" -> {
      val B = BootstrapReplicates
      val thr = PoissonThresholds
      val wCase = ("CASE " + thr.zipWithIndex.map { case (t, k) =>
        s"WHEN u < $t THEN ${k}" }.mkString(" ") + s" ELSE ${thr.length} END")
      ("WITH base AS (SELECT event_type, event_id, " +
       "CAST(floor(value * 1000000) AS BIGINT) AS v_micro FROM events), " +
       s"reps AS (SELECT event_type, event_id, v_micro, r.b FROM base " +
       s"CROSS JOIN (SELECT unnest(generate_series(0, ${B - 1})) AS b) r), " +
       s"wtd AS (SELECT event_type, b, v_micro, $wCase AS w FROM " +
       s"(SELECT *, (((event_id * $B + b) % 1000000007) * 2654435761) % 1000000 AS u " +
       "FROM reps)), " +
       "means AS (SELECT event_type, b, " +
       "CAST(CAST(SUM(w * v_micro) AS BIGINT) AS DOUBLE) / " +
       "CAST(CAST(SUM(w) AS BIGINT) AS DOUBLE) AS mean_b " +
       "FROM wtd GROUP BY event_type, b), " +
       "ranked AS (SELECT event_type, mean_b, row_number() OVER " +
       "(PARTITION BY event_type ORDER BY mean_b ASC, b ASC) AS rn FROM means), " +
       "ci AS (SELECT event_type, " +
       "max(CASE WHEN rn = 4 THEN mean_b END) AS ci_lo_micro, " +
       "max(CASE WHEN rn = 61 THEN mean_b END) AS ci_hi_micro " +
       "FROM ranked GROUP BY event_type), " +
       "pt AS (SELECT event_type, count(*) AS n_events, " +
       "CAST(CAST(SUM(v_micro) AS BIGINT) AS DOUBLE) / " +
       "CAST(count(*) AS DOUBLE) AS mean_micro " +
       "FROM base GROUP BY event_type) " +
       "SELECT pt.event_type, pt.n_events, pt.mean_micro, " +
       "ci.ci_lo_micro, ci.ci_hi_micro " +
       "FROM pt JOIN ci ON pt.event_type = ci.event_type " +
       "ORDER BY pt.event_type")
    },

    "agg_robust_outliers" ->
      ("WITH base AS (SELECT event_type, " +
       "CAST(floor(value * 1000000) AS BIGINT) AS v FROM events), " +
       "stats AS (SELECT event_type, count(*) AS n_events, " +
       "quantile_cont(v, 0.5) AS med, quantile_cont(v, 0.25) AS q1, " +
       "quantile_cont(v, 0.75) AS q3 FROM base GROUP BY event_type) " +
       "SELECT b.event_type, max(s.n_events) AS n_events, max(s.med) AS med, " +
       "max(s.q3 - s.q1) AS iqr, " +
       "quantile_cont(abs(CAST(b.v AS DOUBLE) - s.med), 0.5) AS mad, " +
       "CAST(SUM(CASE WHEN b.v < s.q1 - (s.q3 - s.q1) * 1.5 " +
       "OR b.v > s.q3 + (s.q3 - s.q1) * 1.5 THEN 1 ELSE 0 END) AS BIGINT) " +
       "AS n_outliers_iqr " +
       "FROM base b JOIN stats s ON b.event_type = s.event_type " +
       "GROUP BY b.event_type ORDER BY b.event_type")
  )
}
