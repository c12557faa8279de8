package graft

import org.scalatest.funsuite.AnyFunSuite
import org.apache.spark.sql.functions._
import TestSpark.{spark, Sf0001}

/** Dataset.observe: pipeline-run metrics collected as a side effect of the
  * normal action — at 100 TB this is how a production job reports row
  * counts and quality gauges without a second pass over the data.
  */
class ObservabilitySpec extends AnyFunSuite {

  test("observe() collects metrics in the same pass as the action") {
    val observed = Tables.lineitem(spark, Sf0001)
      .observe("li_metrics",
        count(lit(1)).as("rows_seen"),
        sum(col("l_quantity").cast("long")).as("qty_sum"),
        count(when(col("l_discount") > 0.05, 1)).as("high_discount"))
      .filter(col("l_returnflag") === "A")
    // metrics attach to the execution of THIS dataset — count() would build
    // a new one whose metrics the original never sees.
    val filtered = observed.collect().length
    val metrics = observed.queryExecution.observedMetrics("li_metrics")
    assert(metrics.getLong(0) == Tables.lineitem(spark, Sf0001).count()) // pre-filter
    assert(filtered < metrics.getLong(0))
    assert(metrics.getLong(1) > 0 && metrics.getLong(2) > 0)
  }

  test("etl_dq_checks reports a clean fixture") {
    val r = SparkEntry.queries("etl_dq_checks")(spark, Sf0001).collect()(0)
    assert(r.getLong(0) > 0)           // n_rows
    assert(r.getLong(1) == 0)          // null_shipdates
    assert(r.getLong(2) == 0)          // qty_out_of_range
    assert(r.getLong(3) == 0)          // bad_returnflags
    assert(r.getLong(4) == 0L)         // pk_dupes
    assert(r.getLong(5) == 0L)         // fk_violations
  }

  test("etl_upsert_snapshot preserves cardinality and marks updates") {
    val out = SparkEntry.queries("etl_upsert_snapshot")(spark, Sf0001).collect()
    assert(out.length == Tables.customer(spark, Sf0001).count())
    assert(out.exists(_.getBoolean(4)) && out.exists(!_.getBoolean(4)))
  }

  test("etl_partition_skew_report reproduces a driver-side count profile") {
    val got = SparkEntry.queries("etl_partition_skew_report")(spark, Sf0001)
      .collect()
      .map(r => r.getString(0) ->
        ((r.getLong(1), r.getLong(2), r.getLong(3), r.getDouble(4), r.getDouble(5))))
      .toMap
    assert(got.keySet == Set("event_type", "user_id"))
    val counts = Tables.events(spark, Sf0001)
      .select(col("user_id")).collect()
      .map(r => if (r.isNullAt(0)) None else Some(r.getLong(0)))
      .groupBy(identity).view.mapValues(_.length.toLong).values.toArray.sorted
    val (nKeys, nRows, maxRows, p50, skew) = got("user_id")
    assert(nKeys == counts.length && nRows == counts.sum && maxRows == counts.max)
    val pos = 0.5 * (counts.length - 1); val g = pos - pos.toInt
    assert(p50 == (1 - g) * counts(pos.toInt) + g * counts(math.ceil(pos).toInt))
    assert(skew == maxRows.toDouble / (nRows.toDouble / nKeys.toDouble))
    // a uniform key must profile LESS skewed than a per-entity key
    assert(got("event_type")._5 < got("user_id")._5,
      "event_type should be the more uniform candidate on this fixture")
  }
}
