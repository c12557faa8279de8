package graft

import org.apache.spark.sql.{Column, DataFrame, SaveMode, SparkSession}
import org.apache.spark.sql.functions._
import org.apache.spark.sql.types._
import Det._
import Tables._

/** ETL/pipeline operators (BASELINE.json category "ETL/pipeline"): CDC-style
  * upsert and data-quality validation — the glue a production pipeline runs
  * between the analytic queries.
  *
  * The upsert is the join-based MERGE plan (changes ⟕ target): at 100 TB
  * this is exactly what table formats execute under MERGE INTO; here the
  * "changes" batch is derived deterministically from the fixtures. DQ checks
  * aggregate to a single row so the operator is cheap at any scale (one
  * pass, partial aggregation).
  */
object Etl {
  type Q = (SparkSession, String) => DataFrame

  /** etl_snapshot_diff derivation rule, shared by query / oracle / spec
    * (ADVICE.md round 5 — a constant change must not desynchronize them):
    * keys ≡ DiffDropRes (mod DiffMod) are dropped from the next snapshot,
    * ≡ DiffRepriceRes repriced ×1.1, ≡ DiffInsertRes cloned as inserts
    * under key + DiffKeyShift.
    */
  val DiffMod = 97L
  val DiffDropRes = 3L
  val DiffRepriceRes = 5L
  val DiffInsertRes = 7L
  val DiffKeyShift = 100000000L

  /** etl_gdpr_delete's deletion-request sample: users whose mhash bucket
    * (of GdprBuckets) falls below GdprCut — ~5% of the population,
    * deterministic and partition-independent.
    */
  val GdprBuckets = 1000L
  val GdprCut = 50L

  /** etl_quarantine rules: minimum doc length and the serving-language
    * allowlist — interpolated into query and oracle alike.
    */
  val QuarantineMinChars = 120
  val QuarantineLangs = Seq("en", "de", "fr")

  /** 16-bit Morton spread (bits of x interleave into even positions),
    * generated for either engine: classic magic-mask bit spreading, four
    * shift-or-mask rounds, all BIGINT — bit-identical everywhere.
    * `shl(e, k)` renders a left shift (Spark `shiftleft(e, k)`,
    * DuckDB `(e << k)`).
    *
    * KEY-DOMAIN ASSUMPTION (ADVICE.md round 5): the input masks to its low
    * 16 bits (`e & 65535`), so keys above 65535 ALIAS — both engines alias
    * identically (the oracle still matches) but the Z-order locality
    * property silently degrades: rows far apart in the real key would
    * share a Morton cell. The fixture keys top out well below 2^16
    * (l_partkey ≤ 20000 at sf0.1; RetrievalGraphSpec asserts the bound),
    * and at a larger key domain the fix is mechanical — widen to a 32-bit
    * spread over 5 mask rounds (the same magic-mask family in 64-bit) or
    * Z-order on `key >> k` bucket prefixes instead of raw keys.
    */
  private def spreadBits(e: String, shl: (String, Int) => String): String = {
    val rounds = Seq(8 -> 0x00FF00FFL, 4 -> 0x0F0F0F0FL, 2 -> 0x33333333L, 1 -> 0x55555555L)
    rounds.foldLeft(s"($e & 65535)") { case (cur, (k, mask)) =>
      s"(($cur | ${shl(cur, k)}) & $mask)"
    }
  }

  /** 32-bit Morton code of (a, b): a in even bits, b in odd. */
  private def morton(a: String, b: String, shl: (String, Int) => String): String =
    s"(${spreadBits(a, shl)} | ${shl(spreadBits(b, shl), 1)})"

  private val sparkShl: (String, Int) => String = (e, k) => s"shiftleft($e, $k)"
  private val duckShl: (String, Int) => String = (e, k) => s"($e << $k)"

  val queries: Map[String, Q] = Map(
    // Upsert: customers with an open order get their acctbal "restated" (a
    // deterministic change batch); everyone else keeps their row. Output =
    // the merged snapshot, i.e. MERGE INTO target USING changes.
    "etl_upsert_snapshot" -> ((s, d) => {
      val changes = orders(s, d)
        .filter(col("o_orderstatus") === "O")
        .groupBy(col("o_custkey").as("c_custkey"))
        .agg(dsumx2(col("o_totalprice")).as("open_total"))
      customer(s, d)
        .join(changes, Seq("c_custkey"), "left")
        .select(
          col("c_custkey"), col("c_name"), col("c_nationkey"),
          when(col("open_total").isNotNull,
            dec(col("c_acctbal"), 18, 2).cast(DecimalType(38, 2)) + col("open_total"))
            .otherwise(dec(col("c_acctbal"), 18, 2).cast(DecimalType(38, 2)))
            // final rendering is DOUBLE (Det doc: driver string-compare)
            .cast(DoubleType).as("acctbal_restated"),
          col("open_total").isNotNull.as("was_updated"))
        .orderBy("c_custkey")
    }),

    // Data-quality report: row count, key uniqueness, referential integrity,
    // domain violations — a single output row, all checks composed into ONE
    // lazy plan (three 1-row aggregates cross-joined; no eager actions at
    // construction time, so .explain and Bench see the whole thing).
    "etl_dq_checks" -> ((s, d) => {
      val li = lineitem(s, d)
      val rowChecks = li.agg(
        count(lit(1)).as("n_rows"),
        count(when(col("l_shipdate").isNull, 1)).as("null_shipdates"),
        count(when(col("l_quantity") <= 0 || col("l_quantity") > 50, 1)).as("qty_out_of_range"),
        count(when(!col("l_returnflag").isin("A", "N", "R"), 1)).as("bad_returnflags"))
      val pkDupes = orders(s, d).groupBy("o_orderkey").count()
        .filter(col("count") > 1)
        .agg(count(lit(1)).as("pk_dupes"))
      val fkViolations = li
        .join(orders(s, d), col("l_orderkey") === col("o_orderkey"), "left_anti")
        .agg(count(lit(1)).as("fk_violations"))
      rowChecks.crossJoin(pkDupes).crossJoin(fkViolations)
    }),

    "etl_date_spine" -> ((s, d) => {
      // Calendar-spine gap fill — the time-series scaffolding step every
      // reporting/feature pipeline needs: a month spine per customer from
      // their first to last order month, LEFT-joined to actual monthly
      // counts, gaps zero-filled (a groupBy alone silently drops empty
      // months, corrupting windows/moving averages downstream). The spine
      // generates from per-customer (min, max) bounds — sequence() +
      // explode, O(active months) rows, never a cartesian with a global
      // calendar. Bounded to custkey < 100 to keep the demo output small;
      // the shape is cardinality-independent.
      val monthly = orders(s, d).filter(col("o_custkey") < 100)
        .groupBy(col("o_custkey"),
          to_date(date_trunc("month", col("o_orderdate"))).as("mo"))
        .agg(count(lit(1)).as("n_orders"))
      val spine = monthly.groupBy("o_custkey")
        .agg(min("mo").as("lo"), max("mo").as("hi"))
        .select(col("o_custkey"),
          explode(expr("sequence(lo, hi, interval 1 month)")).as("mo"))
      spine.join(monthly, Seq("o_custkey", "mo"), "left")
        .select(col("o_custkey"), col("mo"),
          coalesce(col("n_orders"), lit(0L)).as("n_orders"))
        .orderBy("o_custkey", "mo")
    }),

    "etl_zorder_cluster" -> ((s, d) => {
      // Z-order (Morton) clustering — the multi-column data-layout answer
      // to "filters come on l_partkey OR l_suppkey, but a sort can only
      // serve one": interleaving the key bits makes rows close in EITHER
      // key land close in the Z order, so row-group min/max stats stay
      // tight on BOTH columns and scans prune whichever predicate arrives.
      // A production writer would repartitionByRange(z) +
      // sortWithinPartitions(z) before the parquet sink; this operator
      // materializes the layout proof instead: per Z-bucket (the rows one
      // row group would hold) the (partkey, suppkey) bounding boxes — the
      // exact min/max a parquet footer would carry. RetrievalGraphSpec
      // asserts the boxes tile the key space (total area << global box
      // area × bucket count). Bit math is four magic-mask spread rounds on
      // BIGINT, identical in DuckDB.
      val z = morton("l_partkey", "l_suppkey", sparkShl)
      lineitem(s, d)
        .withColumn("zbucket", expr(s"shiftright($z, 12)"))
        .groupBy("zbucket")
        .agg(count(lit(1)).as("n"),
          min("l_partkey").as("min_part"), max("l_partkey").as("max_part"),
          min("l_suppkey").as("min_supp"), max("l_suppkey").as("max_supp"))
        .orderBy("zbucket")
    }),

    "etl_incremental_agg" -> ((s, d) => {
      // Incremental view maintenance by ALGEBRAIC MERGE: the running
      // per-customer order aggregate is kept as partial states
      // (count, exact-decimal sum) and a new day/batch merges by
      // re-aggregating state ∪ delta-partials — never rescanning history.
      // That is the contract that makes a 100 TB rolling aggregate
      // maintainable (and it is exactly Spark's own partial-agg shape,
      // lifted to table granularity). count/sum are algebraic so the
      // merged result must equal the full recompute — the oracle IS the
      // full recompute over all of orders, proving the merge lossless.
      // Sums stay DECIMAL through both levels (exact, order-insensitive);
      // only the final output casts to DOUBLE (rule D2).
      val o = orders(s, d)
      val cut = "1997-01-01"
      def partials(df: DataFrame): DataFrame = df.groupBy("o_custkey")
        .agg(count(lit(1)).as("pn"), dsumx2(col("o_totalprice")).as("pt"))
      val state = partials(o.filter(col("o_orderdate") < lit(cut)))
      val delta = partials(o.filter(col("o_orderdate") >= lit(cut)))
      state.unionByName(delta)
        .groupBy("o_custkey")
        .agg(sum("pn").cast(LongType).as("n_orders"),
          sum("pt").cast(DoubleType).as("total_price"))
        .orderBy("o_custkey")
    }),

    "etl_compact_small_files" -> ((s, d) => {
      // Small-files compaction — the table-maintenance pass every long-
      // lived 100 TB table needs: streaming/micro-batch ingestion leaves
      // thousands of KB-sized files whose per-file open/footer cost comes
      // to dominate scans. Rewrite N small files into few target-sized
      // ones and prove the data survived byte-for-byte via the re-read
      // aggregate. repartition(2), not coalesce(2): coalesce emits
      // min(2, read partitions) files and Spark's small-file packing can
      // collapse 32 tiny files into ONE read partition depending on
      // defaultParallelism/maxPartitionBytes — the output count would be
      // an environment artifact, which the fixed oracle (and a production
      // target-file-size contract) must not be. A real job sizes by
      // spark.sql.files.maxRecordsPerFile or total-bytes/128MB the same
      // way: an explicit target, not whatever the reader happened to pick.
      // File counts are driver-side FS metadata — O(files), not O(data).
      // Writes run eagerly at construction time, same contract as
      // etl_backfill_partition below.
      val smallDir = Sources.tmp("docs_smallfiles", d)
      val bigDir = Sources.tmp("docs_compacted", d)
      documents(s, d).repartition(32)
        .write.mode(SaveMode.Overwrite).parquet(smallDir)
      s.read.parquet(smallDir).repartition(2)
        .write.mode(SaveMode.Overwrite).parquet(bigDir)
      def nFiles(p: String): Long = {
        val path = new org.apache.hadoop.fs.Path(p)
        val fs = path.getFileSystem(s.sparkContext.hadoopConfiguration)
        fs.listStatus(path).count(_.getPath.getName.endsWith(".parquet")).toLong
      }
      s.read.parquet(bigDir)
        .agg(count(lit(1)).as("n_rows"), lsum(col("n_chars")).as("sum_chars"))
        .select(lit(nFiles(smallDir)).as("n_files_before"),
          lit(nFiles(bigDir)).as("n_files_after"),
          col("n_rows"), col("sum_chars"))
    }),

    "etl_backfill_partition" -> ((s, d) => {
      // Dynamic partition overwrite — the production backfill primitive:
      // restate ONE partition (yr=1997, prices doubled) in place without
      // touching its siblings. partitionOverwriteMode=dynamic replaces
      // only partitions present in the incoming frame; the re-read
      // aggregate proves 1997 changed AND every other year survived (a
      // static-mode clobber would drop their rows and fail the oracle;
      // SourcesSpec pins the sibling-survival invariant in-suite).
      // The writes run eagerly at DataFrame-construction time (they ARE the
      // operator under test), so even a schema/plan inspection rewrites the
      // target — safe because Sources.tmp is keyed by pid (no cross-process
      // race) and the rewrite is deterministic per sfDir (ADVICE.md round 3).
      val dir = Sources.tmp("orders_backfill", d)
      val base = orders(s, d).withColumn("yr", year(col("o_orderdate")))
      base.write.mode(SaveMode.Overwrite).partitionBy("yr").parquet(dir)
      base.filter(col("yr") === 1997)
        .withColumn("o_totalprice", col("o_totalprice") * 2)
        .write.mode(SaveMode.Overwrite)
        .option("partitionOverwriteMode", "dynamic")
        .partitionBy("yr").parquet(dir)
      s.read.parquet(dir)
        .groupBy("yr")
        .agg(count(lit(1)).as("n"), dsum2(col("o_totalprice")).as("sum_price"))
        .orderBy("yr")
    }),

    // SCD type-2 history: each order opens a validity window on its
    // customer that the next order closes (valid_to = next valid_from;
    // NULL = current). lead() over the per-customer order — one shuffle on
    // the natural key, the standard dimension-history build at any scale.
    "etl_scd2" -> ((s, d) => {
      import org.apache.spark.sql.expressions.Window
      val w = Window.partitionBy("o_custkey")
        .orderBy(col("o_orderdate").asc, col("o_orderkey").asc)
      orders(s, d)
        .select(col("o_custkey"), col("o_orderkey"),
          col("o_orderdate").as("valid_from"),
          lead(col("o_orderdate"), 1).over(w).as("valid_to"),
          (lead(col("o_orderdate"), 1).over(w).isNull).as("is_current"))
        .orderBy("o_custkey", "valid_from", "o_orderkey")
    }),

    // Snapshot diff — the regression/drift screen run between two loads of
    // the same table: a full-outer join on the key classifies every row as
    // added / removed / changed / unchanged and aggregates per class. The
    // "next" snapshot derives deterministically from the base (keys
    // ≡3 mod 97 dropped, ≡5 repriced ×1.1, ≡7 cloned as inserts under a
    // shifted key) — the etl_upsert_snapshot precedent. Scale shape: ONE
    // shuffle join on the primary key plus a tiny 4-row aggregate; at
    // 100 TB both snapshots hash-partition on the key and each partition
    // diffs independently (co-partitioned bucketing makes it exchange-free).
    "etl_snapshot_diff" -> ((s, d) => {
      // prices ride DECIMAL(19,3) end-to-end: a 2-dp price × 1.1 has
      // exactly 3 dp, so the reprice is EXACT on both engines — summing
      // repriced doubles through a DECIMAL(18,2) cast instead loses a tie
      // to Spark HALF_UP vs DuckDB HALF_EVEN (measured: one cent on the
      // 'changed' class at sf0.01)
      import Etl.{DiffMod, DiffDropRes, DiffRepriceRes, DiffInsertRes, DiffKeyShift}
      val base = orders(s, d).select(col("o_orderkey").as("k"),
        dec(col("o_totalprice"), 18, 2).cast(DecimalType(19, 3)).as("v"))
      val next = base.where(pmod(col("k"), lit(DiffMod)) =!= DiffDropRes)
        .select(col("k"),
          when(pmod(col("k"), lit(DiffMod)) === DiffRepriceRes,
            (col("v") * lit(BigDecimal("1.1"))).cast(DecimalType(19, 3)))
            .otherwise(col("v")).as("v"))
        .unionByName(base.where(pmod(col("k"), lit(DiffMod)) === DiffInsertRes)
          .select((col("k") + DiffKeyShift).as("k"), col("v")))
      base.select(col("k").as("bk"), col("v").as("bv"))
        .join(next.select(col("k").as("nk"), col("v").as("nv")),
          col("bk") === col("nk"), "full_outer")
        .select(
          when(col("bk").isNull, "added")
            .when(col("nk").isNull, "removed")
            .when(col("bv") =!= col("nv"), "changed")
            .otherwise("unchanged").as("diff_status"),
          coalesce(col("nv"), col("bv")).as("v"))
        .groupBy("diff_status")
        .agg(count(lit(1)).as("n_rows"),
          sum(col("v")).cast(DoubleType).as("sum_value"))
        .orderBy("diff_status")
    }),

    // CDC changelog apply — the lakehouse ingestion primitive (Debezium
    // stream → MERGE): a per-key ordered log of I/U/D operations compacts
    // to the latest state, deletes drop the row. The changelog derives
    // deterministically from events (signup=insert, error=delete, other
    // activity=update); versions order by (ts, event_id) so replays are
    // exact. Scale shape: ONE shuffle on the key — both windows (latest-op
    // row_number and the per-key op count) share the user_id partitioning,
    // per-key state is one row, and at 100 TB this is precisely changelog
    // compaction: keys hash-partition, each partition compacts
    // independently, output size is bounded by live keys not log length.
    "etl_cdc_apply" -> ((s, d) => {
      import org.apache.spark.sql.expressions.Window
      val log = events(s, d).where(col("user_id").isNotNull)
        .select(col("user_id"),
          when(col("event_type") === "signup", "I")
            .when(col("event_type") === "error", "D")
            .otherwise("U").as("op"),
          col("value"),
          unix_micros(col("ts").cast(TimestampType)).as("version_us"),
          col("event_id"))
      val latest = Window.partitionBy("user_id")
        .orderBy(col("version_us").desc, col("event_id").desc)
      log
        .withColumn("rn", row_number().over(latest))
        .withColumn("n_ops", count(lit(1)).over(Window.partitionBy("user_id")))
        .where(col("rn") === 1 && col("op") =!= "D")
        .select("user_id", "n_ops", "op", "value", "version_us")
        .orderBy("user_id")
    }),

    // Schema evolution across ingest batches — at 100 TB data lands over
    // months and the schema GROWS; the reader must union old files that
    // lack the new columns with new files that carry them, without
    // rewriting history. batch=1 is the v1 era (doc_id, lang only);
    // batch=2 adds source and n_chars. `mergeSchema` reconciles the
    // footers (an O(files) driver merge, not a data pass), partition
    // discovery yields the batch column, and v1 rows read NULL for the
    // evolved columns — the lake contract every long-lived pipeline
    // depends on. Writes run eagerly at construction, same contract as
    // etl_backfill_partition above.
    "etl_schema_evolution" -> ((s, d) => {
      val root = Sources.tmp("docs_evolve", d)
      documents(s, d).where(col("doc_id") % 2 === 0)
        .select("doc_id", "lang")
        .write.mode(SaveMode.Overwrite).parquet(s"$root/batch=1")
      documents(s, d).where(col("doc_id") % 2 === 1)
        .select("doc_id", "lang", "source", "n_chars")
        .write.mode(SaveMode.Overwrite).parquet(s"$root/batch=2")
      s.read.option("mergeSchema", "true").parquet(root)
        .select(col("doc_id"), col("lang"), col("source"), col("n_chars"),
          col("batch").cast(IntegerType).as("batch"))
        .orderBy("doc_id")
    }),

    // Right-to-be-forgotten purge — the compliance pass a training-data
    // pipeline must run before anything ships: every event belonging to a
    // user on the deletion-request list is dropped, with a per-class audit
    // of kept vs purged. The request list is a deterministic ~5% hash
    // sample of the user population (the mhash sampling primitive — a
    // real list arrives as its own table; any 'error'-event rule would be
    // DEGENERATE here, every fixture user has one). Scale shape (single
    // pass since round 10, VERDICT r9 #5: the anti+semi pair scanned the
    // fact stream twice and cost 0.44 s at the r9 gate; classifying once
    // cut it to ~0.3 s): the request set is tiny next to the corpus, so
    // it BROADCASTS, ONE outer probe tags each event kept/purged
    // map-side, and one conditional aggregation produces the whole audit
    // — the fact stream is scanned once and shuffled once (#event_types
    // partials). Identity-less rows (NULL user) are unaffected by
    // construction: the outer probe never matches NULL, so they tag as
    // kept — the anti-join/NOT EXISTS semantics both engines share. The
    // HAVING n_kept > 0 keeps the output contract of the previous
    // kept-LEFT-JOIN-purged form (a class with every row purged does not
    // appear; no fixture class does). At 100 TB this composes with the
    // partitioned rewrite (etl_backfill_partition) for the physical
    // delete; the logical selection here is the part every variant
    // shares.
    "etl_gdpr_delete" -> ((s, d) => {
      val del = events(s, d)
        .where(col("user_id").isNotNull &&
          mhash(col("user_id"), GdprBuckets) < GdprCut)
        .select(col("user_id")).distinct()
        .withColumn("is_del", lit(1))
      events(s, d)
        .join(broadcast(del), Seq("user_id"), "left")
        .groupBy("event_type")
        .agg(
          expr("count_if(is_del IS NULL)").as("n_kept"),
          countDistinct(when(col("is_del").isNull, col("user_id")))
            .as("n_users_kept"),
          expr("count_if(is_del = 1)").as("n_purged"))
        .where(col("n_kept") > 0)
        .orderBy("event_type")
    }),

    // Partition-skew report — the observability pass run BEFORE choosing a
    // shuffle/bucketing key: per-candidate-key row counts reduced to the
    // skew diagnostics that predict stragglers (max/mean ratio, median vs
    // max). A key whose skew ratio is high (here event_type, 5 keys ≈
    // uniform → ~1; user_id → per-user spread) would put one executor on
    // the critical path at 100 TB. Scale shape: one count-per-key
    // aggregation per candidate (map-side partials, shuffle = #keys), then
    // a 1-row summary; the candidates union into one tiny frame. The p50
    // is exact cross-engine: counts are integers and .5 interpolation is
    // binary (the agg_percentiles rule).
    "etl_partition_skew_report" -> ((s, d) => {
      def report(label: String, key: Column): DataFrame =
        events(s, d).groupBy(key.as("k"))
          .agg(count(lit(1)).as("c"))
          .agg(count(lit(1)).as("n_keys"), lsum(col("c")).as("n_rows"),
            max(col("c")).as("max_rows"),
            expr("percentile(c, 0.5D)").as("p50_rows"))
          .select(lit(label).as("part_key"), col("n_keys"), col("n_rows"),
            col("max_rows"), col("p50_rows"),
            (col("max_rows").cast(DoubleType) /
              (col("n_rows").cast(DoubleType) / col("n_keys").cast(DoubleType)))
              .as("skew_max_over_mean"))
      report("event_type", col("event_type"))
        .unionByName(report("user_id", col("user_id")))
        .orderBy("part_key")
    }),

    // Row-level DQ quarantine (round 10) — the complement of
    // etl_dq_checks' aggregate scorecard: rows violating any rule are
    // EMITTED with the full list of rules they tripped, the frame a
    // pipeline routes to a quarantine sink while the clean remainder
    // ships. Map-only (predicates + concat_ws, which skips NULLs on both
    // engines — the untripped CASE arms vanish), so at 100 TB this is a
    // free rider on the ingest scan. Rules: the short-doc floor, the
    // serving-language allowlist, and a metadata-consistency check
    // (n_chars must equal the text's length — never fires on the
    // fixtures, PRESENT so the multi-rule tagging is exercised against
    // rules of both kinds).
    "etl_quarantine" -> ((s, d) =>
      documents(s, d)
        .select(col("doc_id"), col("lang"), col("n_chars"),
          concat_ws(",",
            when(col("n_chars") < QuarantineMinChars, lit("short_doc")),
            when(!col("lang").isin(QuarantineLangs: _*), lit("lang_unsupported")),
            when(length(col("text")) =!= col("n_chars"), lit("len_mismatch")))
            .as("rules"))
        .where(col("rules") =!= "")
        .orderBy("doc_id"))
  )

  val oracles: Map[String, String] = Map(
    "etl_upsert_snapshot" ->
      ("SELECT c.c_custkey, c.c_name, c.c_nationkey, " +
       s"${oDbl("CASE WHEN ch.open_total IS NOT NULL " +
         "THEN CAST(c.c_acctbal AS DECIMAL(18,2)) + ch.open_total " +
         "ELSE CAST(c.c_acctbal AS DECIMAL(18,2)) END")} AS acctbal_restated, " +
       "ch.open_total IS NOT NULL AS was_updated " +
       "FROM customer c LEFT JOIN " +
       s"(SELECT o_custkey AS c_custkey, ${oDsumx2("o_totalprice")} AS open_total " +
       "FROM orders WHERE o_orderstatus = 'O' GROUP BY o_custkey) ch " +
       "USING (c_custkey) ORDER BY c_custkey"),

    "etl_date_spine" ->
      ("WITH m AS (SELECT o_custkey, CAST(date_trunc('month', o_orderdate) AS DATE) AS mo, " +
       "count(*) AS n_orders FROM orders WHERE o_custkey < 100 GROUP BY 1, 2), " +
       "b AS (SELECT o_custkey, min(mo) AS lo, max(mo) AS hi FROM m GROUP BY 1), " +
       "sp AS (SELECT o_custkey, CAST(unnest(generate_series(CAST(lo AS TIMESTAMP), " +
       "CAST(hi AS TIMESTAMP), INTERVAL 1 MONTH)) AS DATE) AS mo FROM b) " +
       "SELECT sp.o_custkey, sp.mo, coalesce(m.n_orders, 0) AS n_orders " +
       "FROM sp LEFT JOIN m ON m.o_custkey = sp.o_custkey AND m.mo = sp.mo " +
       "ORDER BY sp.o_custkey, sp.mo"),

    "etl_zorder_cluster" ->
      (s"SELECT ${morton("l_partkey", "l_suppkey", duckShl)} >> 12 AS zbucket, " +
       "count(*) AS n, " +
       "min(l_partkey) AS min_part, max(l_partkey) AS max_part, " +
       "min(l_suppkey) AS min_supp, max(l_suppkey) AS max_supp " +
       "FROM lineitem GROUP BY zbucket ORDER BY zbucket"),

    "etl_incremental_agg" ->
      ("SELECT o_custkey, count(*) AS n_orders, " +
       s"${oDsum2("o_totalprice")} AS total_price " +
       "FROM orders GROUP BY o_custkey ORDER BY o_custkey"),

    "etl_compact_small_files" ->
      ("SELECT CAST(32 AS BIGINT) AS n_files_before, CAST(2 AS BIGINT) AS n_files_after, " +
       s"count(*) AS n_rows, ${oLsum("n_chars")} AS sum_chars FROM documents"),

    "etl_backfill_partition" ->
      ("SELECT CAST(year(o_orderdate) AS INT) AS yr, count(*) AS n, " +
       s"${oDsum2("CASE WHEN year(o_orderdate) = 1997 THEN o_totalprice * 2 ELSE o_totalprice END")} AS sum_price " +
       "FROM orders GROUP BY 1 ORDER BY yr"),

    "etl_scd2" ->
      ("SELECT o_custkey, o_orderkey, o_orderdate AS valid_from, " +
       "lead(o_orderdate, 1) OVER w AS valid_to, " +
       "lead(o_orderdate, 1) OVER w IS NULL AS is_current " +
       "FROM orders WINDOW w AS (PARTITION BY o_custkey ORDER BY o_orderdate ASC, o_orderkey ASC) " +
       "ORDER BY o_custkey, valid_from, o_orderkey"),

    "etl_dq_checks" ->
      ("SELECT (SELECT count(*) FROM lineitem) AS n_rows, " +
       "(SELECT count(*) FROM lineitem WHERE l_shipdate IS NULL) AS null_shipdates, " +
       "(SELECT count(*) FROM lineitem WHERE l_quantity <= 0 OR l_quantity > 50) AS qty_out_of_range, " +
       "(SELECT count(*) FROM lineitem WHERE l_returnflag NOT IN ('A','N','R')) AS bad_returnflags, " +
       "(SELECT count(*) FROM (SELECT o_orderkey FROM orders GROUP BY 1 HAVING count(*) > 1)) AS pk_dupes, " +
       "(SELECT count(*) FROM lineitem l WHERE NOT EXISTS " +
       "(SELECT 1 FROM orders o WHERE o.o_orderkey = l.l_orderkey)) AS fk_violations"),

    "etl_snapshot_diff" ->
      ("WITH base AS (SELECT o_orderkey AS k, " +
       "CAST(CAST(o_totalprice AS DECIMAL(18,2)) AS DECIMAL(19,3)) AS v FROM orders), " +
       s"next AS (SELECT k, CASE WHEN k % $DiffMod = $DiffRepriceRes " +
       "THEN CAST(v * CAST(1.1 AS DECIMAL(2,1)) AS DECIMAL(19,3)) ELSE v END AS v " +
       s"FROM base WHERE k % $DiffMod <> $DiffDropRes " +
       s"UNION ALL SELECT k + $DiffKeyShift, v FROM base WHERE k % $DiffMod = $DiffInsertRes) " +
       "SELECT CASE WHEN b.k IS NULL THEN 'added' WHEN n.k IS NULL THEN 'removed' " +
       "WHEN b.v <> n.v THEN 'changed' ELSE 'unchanged' END AS diff_status, " +
       "count(*) AS n_rows, " +
       "CAST(SUM(coalesce(n.v, b.v)) AS DOUBLE) AS sum_value " +
       "FROM base b FULL OUTER JOIN next n ON b.k = n.k " +
       "GROUP BY 1 ORDER BY diff_status"),

    "etl_cdc_apply" ->
      ("WITH log AS (SELECT user_id, " +
       "CASE WHEN event_type = 'signup' THEN 'I' " +
       "WHEN event_type = 'error' THEN 'D' ELSE 'U' END AS op, " +
       "value, epoch_us(CAST(ts AS TIMESTAMP)) AS version_us, event_id " +
       "FROM events WHERE user_id IS NOT NULL), " +
       "r AS (SELECT *, row_number() OVER (PARTITION BY user_id " +
       "ORDER BY version_us DESC, event_id DESC) AS rn, " +
       "count(*) OVER (PARTITION BY user_id) AS n_ops FROM log) " +
       "SELECT user_id, CAST(n_ops AS BIGINT) AS n_ops, op, value, version_us " +
       "FROM r WHERE rn = 1 AND op <> 'D' ORDER BY user_id"),

    // the logical result of the merged read: v1-era rows surface NULL for
    // the columns that did not exist yet
    "etl_schema_evolution" ->
      ("SELECT doc_id, lang, CAST(NULL AS VARCHAR) AS source, " +
       "CAST(NULL AS BIGINT) AS n_chars, CAST(1 AS INT) AS batch " +
       "FROM documents WHERE doc_id % 2 = 0 " +
       "UNION ALL " +
       "SELECT doc_id, lang, source, n_chars, CAST(2 AS INT) AS batch " +
       "FROM documents WHERE doc_id % 2 = 1 ORDER BY doc_id"),

    // NOT EXISTS mirrors the anti-join's NULL semantics (NOT IN would
    // vacuously drop everything if the request list ever held a NULL)
    "etl_gdpr_delete" ->
      ("WITH del AS (SELECT DISTINCT user_id FROM events " +
       s"WHERE user_id IS NOT NULL AND ((user_id % 1000000007) * 2654435761) % $GdprBuckets < $GdprCut), " +
       "kept AS (SELECT event_type, count(*) AS n_kept, " +
       "count(DISTINCT user_id) AS n_users_kept FROM events e " +
       "WHERE NOT EXISTS (SELECT 1 FROM del WHERE del.user_id = e.user_id) " +
       "GROUP BY event_type), " +
       "purged AS (SELECT event_type, count(*) AS n_purged FROM events e " +
       "WHERE EXISTS (SELECT 1 FROM del WHERE del.user_id = e.user_id) " +
       "GROUP BY event_type) " +
       "SELECT k.event_type, k.n_kept, k.n_users_kept, " +
       "coalesce(p.n_purged, 0) AS n_purged " +
       "FROM kept k LEFT JOIN purged p ON k.event_type = p.event_type " +
       "ORDER BY k.event_type"),

    // identical division nesting (max / (rows / keys)) keeps the double
    // result bit-equal; GROUP BY includes the NULL user key on both engines
    "etl_partition_skew_report" -> {
      def rpt(label: String, key: String) =
        (s"SELECT '$label' AS part_key, count(*) AS n_keys, " +
         "CAST(SUM(c) AS BIGINT) AS n_rows, max(c) AS max_rows, " +
         "quantile_cont(c, 0.5) AS p50_rows, " +
         "CAST(max(c) AS DOUBLE) / (CAST(CAST(SUM(c) AS BIGINT) AS DOUBLE) / " +
         "CAST(count(*) AS DOUBLE)) AS skew_max_over_mean FROM " +
         s"(SELECT $key AS k, CAST(count(*) AS BIGINT) AS c FROM events GROUP BY $key)")
      rpt("event_type", "event_type") + " UNION ALL " +
        rpt("user_id", "user_id") + " ORDER BY part_key"
    },

    // concat_ws skips NULL arguments on both engines — untripped rules
    // vanish from the tag list identically
    "etl_quarantine" ->
      ("SELECT doc_id, lang, n_chars, concat_ws(',', " +
       s"CASE WHEN n_chars < $QuarantineMinChars THEN 'short_doc' END, " +
       s"CASE WHEN lang NOT IN (${QuarantineLangs.map(l => s"'$l'").mkString(", ")}) " +
       "THEN 'lang_unsupported' END, " +
       "CASE WHEN length(text) != n_chars THEN 'len_mismatch' END) AS rules " +
       "FROM documents " +
       s"WHERE n_chars < $QuarantineMinChars " +
       s"OR lang NOT IN (${QuarantineLangs.map(l => s"'$l'").mkString(", ")}) " +
       "OR length(text) != n_chars ORDER BY doc_id")
  )
}
