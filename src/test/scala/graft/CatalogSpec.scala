package graft

import org.scalatest.funsuite.AnyFunSuite
import org.apache.spark.sql.functions._
import TestSpark.{spark, Sf001}

/** Semantic contract of the ANALYZE surface (catalog_column_stats): the
  * DuckDB oracle pins the registers cell-exactly; this spec pins the
  * properties the registers exist FOR — the NDV estimate they encode
  * tracks the exact distinct count, and the whole stats row is mergeable
  * (per-split partials compose to the full answer without re-scanning),
  * plus a JVM recompute of the scalar stats.
  */
class CatalogSpec extends AnyFunSuite {

  private val d = Sf001

  private def regsOf(v: org.apache.spark.sql.DataFrame): Map[(String, Long), Long] =
    Catalog.registers(Catalog.stackedOf(v)).collect()
      .map(r => (r.getString(0), r.getLong(1)) -> r.getLong(2)).toMap

  test("column stats: JVM scalar reference, register mergeability, NDV band") {
    val got = SparkEntry.queries("catalog_column_stats")(spark, d).collect()
      .map(r => r.getString(0) -> ((r.getLong(1), r.getLong(2), r.getLong(3),
        r.getLong(4), r.getLong(5), r.getString(6), r.getString(7)))).toMap
    assert(got.keySet == Catalog.StatCols.toSet)

    // non-vacuity: the left join produces a REAL null fraction on the l_*
    // columns (orders with no returned item) and none on the o_* columns
    assert(got("l_partkey")._2 > 0, "l_partkey carries no nulls — view is vacuous")
    assert(got("o_orderkey")._2 == 0L)
    assert(got("l_partkey")._3 == got("l_partkey")._2 * 1000000L / got("l_partkey")._1)

    // JVM reference for n_rows / n_nulls / typed min/max
    val rows = Catalog.stackedOf(Catalog.view(spark, d)).collect()
      .map(r => (r.getString(0), if (r.isNullAt(1)) null else r.getString(1)))
    val intCols = Set("o_orderkey", "l_partkey", "l_suppkey")
    rows.groupBy(_._1).foreach { case (cn, rs) =>
      val (nRows, nNulls, _, _, _, minS, maxS) = got(cn)
      assert(nRows == rs.length.toLong, s"$cn n_rows")
      assert(nNulls == rs.count(_._2 == null).toLong, s"$cn n_nulls")
      val vals = rs.collect { case (_, v) if v != null => v }
      val (emin, emax) =
        if (intCols(cn)) (vals.minBy(_.toLong), vals.maxBy(_.toLong))
        else (vals.min, vals.max)
      assert(minS == emin && maxS == emax, s"$cn min/max: ($minS,$maxS) vs ($emin,$emax)")
    }

    // MERGEABILITY: stats over two disjoint view halves compose to the
    // full row — counts by sum, registers by per-bucket MAX (the property
    // that lets 100 TB partials persist per partition and merge at
    // metadata scale, never re-scanning raw data)
    val v = Catalog.view(spark, d)
    val even = regsOf(v.where(pmod(col("o_orderkey"), lit(2L)) === 0))
    val odd = regsOf(v.where(pmod(col("o_orderkey"), lit(2L)) === 1))
    val merged = (even.keySet ++ odd.keySet).map(k =>
      k -> math.max(even.getOrElse(k, 0L), odd.getOrElse(k, 0L))).toMap
    assert(merged == regsOf(v), "split registers must max-merge to the full sketch")

    // the NDV estimate from the registers (standard HLL with small-range
    // correction) tracks the exact per-column distinct count within 10%
    // (256 registers ≈ 6.5% standard error; NDVs here span 3 .. 15 000)
    val full = regsOf(v)
    val exact = Catalog.stackedOf(v).where(col("sval").isNotNull)
      .groupBy("col_name").agg(countDistinct(col("sval")).as("ndv"))
      .collect().map(r => r.getString(0) -> r.getLong(1)).toMap
    val m = Aggregations.HllRegisters
    val alpha = 0.7213 / (1 + 1.079 / m)
    exact.foreach { case (cn, n) =>
      val regs = (0 until m).map(b => full.getOrElse((cn, b.toLong), 0L))
      val raw = alpha * m * m / regs.map(r => math.pow(2.0, -r.toDouble)).sum
      val zeros = regs.count(_ == 0L)
      val est = if (raw <= 2.5 * m && zeros > 0) m * math.log(m.toDouble / zeros) else raw
      info(f"$cn: exact $n, est $est%.1f (${100 * (est / n - 1)}%+.1f%%)")
      assert(math.abs(est / n - 1.0) <= 0.10,
        f"$cn: est $est%.1f vs exact $n (${100 * (est / n - 1)}%.1f%%)")
    }
  }
}
