package graft

import org.apache.spark.sql.{DataFrame, SparkSession}
import org.apache.spark.sql.functions._
import org.apache.spark.sql.types.LongType
import Tables._

/** The ANALYZE / column-statistics surface (round 20, VERDICT r19 #3):
  * per-column NDV registers, min/max, and null fraction — the CBO input
  * every 100 TB deployment maintains (Spark's own
  * `ANALYZE TABLE … COMPUTE STATISTICS FOR COLUMNS` collects exactly this
  * triple: distinct-count estimate, min/max, null count).
  *
  * The fixture is the `orders LEFT JOIN returned-lineitems` denormalized
  * view (each order with its returned items, or one all-null l_* row if
  * nothing was returned), not a base table, for one honest reason: every
  * base fixture table is null-free — even every customer has orders — so
  * a null-fraction statistic pinned on a base table would be vacuously
  * zero. The returns view has a real null fraction at every SF (measured
  * 404/2372, 3 942/23 988, 39 402/239 427 null l_* rows at the three
  * SFs), and analyzing a derived/serving view is itself a real ANALYZE
  * shape.
  *
  * Design for scale and mergeability:
  *  - ONE data pass for NDV + null counts: each row unpivots (stack) into
  *    (col_name, canonical-string) pairs, then the standing HLL register
  *    pipeline (agg_hll_sketch's hash tokens, with the portable
  *    poly-rolling hash lifting strings into the integer domain) runs per
  *    column — map-side-combinable, registers mergeable by MAX, so
  *    per-partition partials compose without re-scanning (the
  *    agg_sketch_merge convention; CatalogSpec pins split-merge equality
  *    and the estimate's accuracy band per column).
  *  - ONE more pass for typed min/max (a single 1-row aggregate, then the
  *    row unpivots) — min/max must run in the column's own type
  *    (lexicographic min of "100"/"99" is wrong for integers) and only
  *    the RESULT is cast to string for the uniform stats schema.
  *  - All-integer/string output (D5): null fraction ships micro-scaled,
  *    NDV ships as the register summary (occupied, sum_rho) — the
  *    mergeable primitive itself, driver-verified at register level; the
  *    ln-based estimate stays scalatest-side like every HLL consumer.
  *
  * Column set: BIGINT and VARCHAR columns only (high/low NDV, nullable and
  * not). DOUBLE/TIMESTAMP columns are deliberately excluded from this
  * fixture key: their canonical STRING forms are not cross-engine-stable
  * (Java vs DuckDB shortest-roundtrip double printing), so the honest
  * production answer — hash the IEEE bits / epoch micros — has no
  * DuckDB-hash-identical mirror to gate against. The shape generalizes;
  * the gate pins the portable subset.
  */
object Catalog {
  type Q = (SparkSession, String) => DataFrame

  /** Columns analyzed: BIGINT + VARCHAR, high/low NDV, nullable and not. */
  private[graft] val StatCols =
    Seq("o_orderkey", "o_orderstatus", "o_orderpriority",
      "l_partkey", "l_suppkey", "l_linestatus")

  private[graft] def view(s: SparkSession, d: String): DataFrame =
    orders(s, d).join(
      lineitem(s, d).where(col("l_returnflag") === "R"),
      col("l_orderkey") === col("o_orderkey"), "left")

  /** The unpivoted (col_name, canonical string value) stream. */
  private[graft] def stackedOf(v: DataFrame): DataFrame = {
    val stackExpr = s"stack(${StatCols.length}, " +
      StatCols.map(c => s"'$c', CAST($c AS STRING)").mkString(", ") +
      ") AS (col_name, sval)"
    v.select(expr(stackExpr))
  }

  private def stacked(s: SparkSession, d: String): DataFrame =
    stackedOf(view(s, d))

  /** Per-(col_name, bucket) HLL registers over the stacked stream — the
    * agg_hll_sketch pipeline with poly_hash(sval) as the integer token.
    * Exposed for CatalogSpec's split-merge and accuracy pins.
    */
  private[graft] def registers(src: DataFrame): DataFrame = {
    import Aggregations.{SketchP, SketchA, SketchB, HllRegisters, HllMaxRho}
    val h0 = org.apache.spark.sql.graft.BpeOps.poly_hash(col("sval"), SketchP)
    val h1 = pmod(h0 * lit(SketchA) + lit(SketchB), lit(SketchP))
    val h2 = pmod(h1 * h1, lit(SketchP))
    src.where(col("sval").isNotNull)
      .select(col("col_name"),
        pmod(h2, lit(HllRegisters.toLong)).as("bucket"),
        floor(h2 / lit(HllRegisters)).cast(LongType).as("v"))
      .groupBy("col_name", "bucket")
      .agg(max(when(col("v") === 0, lit(HllMaxRho))
        .otherwise(length(bin(col("v").bitwiseAND(-col("v")))).cast(LongType)))
        .as("rho"))
  }

  /** The stats row assembled from per-column count/NDV/min-max frames —
    * shared by the direct key and the merged-partials key, so the output
    * contract has one definition.
    */
  private def assemble(base: DataFrame, ndv: DataFrame, mm: DataFrame): DataFrame =
    base.join(ndv, Seq("col_name"), "left")
      .join(broadcast(mm), Seq("col_name"))
      .select(col("col_name"), col("n_rows"), col("n_nulls"),
        expr("n_nulls * 1000000L div n_rows").as("null_micro"),
        coalesce(col("hll_occupied"), lit(0L)).as("hll_occupied"),
        coalesce(col("hll_sum_rho"), lit(0L)).as("hll_sum_rho"),
        col("min_s"), col("max_s"))
      .orderBy("col_name")

  private def ndvOf(regs: DataFrame): DataFrame =
    regs.groupBy("col_name")
      .agg(count(lit(1)).as("hll_occupied"), sum("rho").as("hll_sum_rho"))

  val queries: Map[String, Q] = Map(
    "catalog_column_stats" -> ((s, d) => {
      val st = stacked(s, d)
      val base = st.groupBy("col_name").agg(
        count(lit(1)).as("n_rows"),
        (count(lit(1)) - count(col("sval"))).as("n_nulls"))
      // ndv joins LEFT inside assemble (the kmv_store_compact audit
      // convention): an all-null column has no register rows, and an
      // inner join would read "no registers" as "column gone" — it must
      // report NDV 0
      // typed min/max: one 1-row aggregate over the view, then unpivot
      val aggs = StatCols.flatMap(c => Seq(
        min(col(c)).cast("string").as(s"mn_$c"),
        max(col(c)).cast("string").as(s"mx_$c")))
      val mmStack = s"stack(${StatCols.length}, " +
        StatCols.map(c => s"'$c', mn_$c, mx_$c").mkString(", ") +
        ") AS (col_name, min_s, max_s)"
      val mm = view(s, d).agg(aggs.head, aggs.tail: _*).select(expr(mmStack))
      assemble(base, ndvOf(registers(st)), mm)
    }),

    // Stats from MERGED per-partition partials (round 20): the ANALYZE
    // maintenance path — each partition (here: the deterministic
    // o_orderkey parity halves, standing in for ingest partitions)
    // computes its own count/register/min-max partials, and the final
    // stats row is assembled purely from partial-merges: counts by SUM,
    // registers by per-bucket MAX, min/max by least/greatest IN THE
    // COLUMN'S OWN TYPE (string-cast only after the merge — "10" < "9"
    // lexicographically). The oracle is the direct key's verbatim: at
    // 100 TB this is what makes stats maintainable — partials persist
    // per partition (KBs) and any rollup merges at metadata scale, raw
    // data never re-scanned (the agg_sketch_merge contract, certified
    // here at the gate on the full ANALYZE row).
    "catalog_column_stats_merge" -> ((s, d) => {
      val halves = Seq(0, 1).map(p =>
        view(s, d).where(pmod(col("o_orderkey"), lit(2L)) === p))
      val base = halves.map(h => stackedOf(h).groupBy("col_name").agg(
          count(lit(1)).as("nr"), (count(lit(1)) - count(col("sval"))).as("nn")))
        .reduce(_ unionByName _)
        .groupBy("col_name")
        .agg(sum("nr").as("n_rows"), sum("nn").as("n_nulls"))
      val regs = halves.map(h => registers(stackedOf(h)))
        .reduce(_ unionByName _)
        .groupBy("col_name", "bucket").agg(max("rho").as("rho"))
      // typed per-half min/max partials, merged via least/greatest in
      // type, cast to string only at the end
      val aggs = StatCols.flatMap(c => Seq(
        min(col(c)).as(s"mn_$c"), max(col(c)).as(s"mx_$c")))
      val Seq(a, b) = halves.map(h =>
        h.agg(aggs.head, aggs.tail: _*))
      val bb = b.select(b.columns.map(c => col(c).as(s"r_$c")): _*)
      val mmStack = s"stack(${StatCols.length}, " +
        StatCols.map(c =>
          s"'$c', CAST(least(mn_$c, r_mn_$c) AS STRING), " +
          s"CAST(greatest(mx_$c, r_mx_$c) AS STRING)").mkString(", ") +
        ") AS (col_name, min_s, max_s)"
      val mm = a.crossJoin(broadcast(bb)).select(expr(mmStack))
      assemble(base, ndvOf(regs), mm)
    })
  )

  val oracles: Map[String, String] = {
    import Aggregations.{SketchP, SketchA, SketchB, HllRegisters, HllMaxRho}
    val unions = StatCols.map(c =>
      s"SELECT '$c' AS col_name, CAST($c AS VARCHAR) AS sval FROM v")
      .mkString(" UNION ALL ")
    val fold = Det.oIntFold(
      "list_transform(string_split(sval, ''), c -> CAST(ascii(c) AS BIGINT))",
      s"(acc, x) -> (acc * 31 + x) % $SketchP")
    val mmUnions = StatCols.map(c =>
      s"SELECT '$c' AS col_name, CAST(min($c) AS VARCHAR) AS min_s, " +
      s"CAST(max($c) AS VARCHAR) AS max_s FROM v").mkString(" UNION ALL ")
    val direct =
        ("WITH v AS (SELECT o_orderkey, o_orderstatus, o_orderpriority, " +
         "l_partkey, l_suppkey, l_linestatus FROM orders " +
         "LEFT JOIN (SELECT * FROM lineitem WHERE l_returnflag = 'R') " +
         "ON l_orderkey = o_orderkey), " +
         s"st AS ($unions), " +
         "base AS (SELECT col_name, CAST(count(*) AS BIGINT) AS n_rows, " +
         "CAST(count(*) - count(sval) AS BIGINT) AS n_nulls FROM st GROUP BY 1), " +
         s"h AS (SELECT col_name, (($fold * $SketchA + $SketchB) % $SketchP) AS h1 " +
         "FROM st WHERE sval IS NOT NULL), " +
         s"r AS (SELECT col_name, (h1 * h1) % $SketchP AS h2 FROM h), " +
         s"regs AS (SELECT col_name, h2 % $HllRegisters AS bucket, " +
         s"max(CASE WHEN CAST(floor(h2 / $HllRegisters) AS BIGINT) = 0 THEN $HllMaxRho " +
         s"ELSE CAST(length(bin((CAST(floor(h2 / $HllRegisters) AS BIGINT)) & " +
         s"(-CAST(floor(h2 / $HllRegisters) AS BIGINT)))) AS BIGINT) END) AS rho " +
         "FROM r GROUP BY 1, 2), " +
         "ndv AS (SELECT col_name, CAST(count(*) AS BIGINT) AS hll_occupied, " +
         "CAST(sum(rho) AS BIGINT) AS hll_sum_rho FROM regs GROUP BY 1), " +
         s"mm AS ($mmUnions) " +
         "SELECT col_name, n_rows, n_nulls, " +
         "n_nulls * 1000000 // n_rows AS null_micro, " +
         "COALESCE(hll_occupied, CAST(0 AS BIGINT)) AS hll_occupied, " +
         "COALESCE(hll_sum_rho, CAST(0 AS BIGINT)) AS hll_sum_rho, " +
         "min_s, max_s " +
         "FROM base LEFT JOIN ndv USING (col_name) JOIN mm USING (col_name) " +
         "ORDER BY col_name")
    Map(
      "catalog_column_stats" -> direct,
      // partial-merge must be answer-invariant: the direct oracle verbatim
      "catalog_column_stats_merge" -> direct
    )
  }
}
