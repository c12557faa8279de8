package graft

import org.scalatest.funsuite.AnyFunSuite
import org.apache.spark.sql.functions._
import TestSpark.{spark, Sf0001}

class SourcesSpec extends AnyFunSuite {
  private def q(name: String) = SparkEntry.queries(name)(spark, Sf0001)

  test("rdd wordcount equals the DataFrame wordcount") {
    val rdd = q("mr_wordcount_rdd").collect().map(r => (r.getString(0), r.getLong(1)))
    val df = q("text_wordcount").collect().map(r => (r.getString(0), r.getLong(1)))
    assert(rdd.sameElements(df))
  }

  test("partitioned sink re-read prunes partitions") {
    val df = q("sink_partitioned_parquet")
    val scan = df.queryExecution.executedPlan.toString
    assert(scan.contains("PartitionFilters") && scan.contains("yr"),
      s"no partition pruning:\n$scan")
    assert(df.collect().map(_.getInt(0)).forall(y => y >= 1996 && y <= 1999))
  }

  test("csv and json roundtrips preserve rows and schema") {
    val csv = q("source_csv_roundtrip")
    assert(csv.count() == 25)
    assert(csv.schema.map(_.dataType.simpleString) == Seq("int", "string", "int"))
    val json = q("source_json_roundtrip")
    assert(json.count() == Tables.supplier(spark, Sf0001).count())
  }
}
