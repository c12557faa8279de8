package graft

import org.scalatest.funsuite.AnyFunSuite
import org.apache.spark.sql.functions._
import TestSpark.{spark, Sf0001}

/** Bucketing = pre-shuffled storage: two tables bucketed+sorted on the join
  * key join WITHOUT an Exchange — at 100 TB this turns every recurring
  * fact⋈fact join from a full shuffle into a local merge per bucket.
  */
class BucketingSpec extends AnyFunSuite {

  test("bucketed co-located join plans without a shuffle") {
    spark.sql("DROP TABLE IF EXISTS b_orders")
    spark.sql("DROP TABLE IF EXISTS b_lineitem")
    // A stale warehouse dir from a previous JVM (with a fresh metastore that
    // doesn't know the table) fails CTAS with LOCATION_ALREADY_EXISTS.
    for (t <- Seq("b_orders", "b_lineitem")) {
      val dir = new java.io.File(s"/tmp/graft_warehouse/$t")
      if (dir.exists()) {
        def rm(f: java.io.File): Unit = {
          if (f.isDirectory) f.listFiles().foreach(rm)
          f.delete()
        }
        rm(dir)
      }
    }
    Tables.orders(spark, Sf0001)
      .write.bucketBy(8, "o_orderkey").sortBy("o_orderkey")
      .mode("overwrite").saveAsTable("b_orders")
    Tables.lineitem(spark, Sf0001)
      .write.bucketBy(8, "l_orderkey").sortBy("l_orderkey")
      .mode("overwrite").saveAsTable("b_lineitem")

    val joined = spark.table("b_lineitem")
      .join(spark.table("b_orders"), col("l_orderkey") === col("o_orderkey"))
      .groupBy("o_orderstatus").agg(count(lit(1)).as("n"))
    // Force SMJ (disable broadcast) so the bucketing property is what decides
    // whether an Exchange appears.
    spark.conf.set("spark.sql.autoBroadcastJoinThreshold", "-1")
    try {
      val plan = joined.queryExecution.executedPlan.toString
      val exchangesBelowJoin = plan.split("SortMergeJoin").drop(1).mkString
      assert(plan.contains("SortMergeJoin"), s"expected SMJ:\n$plan")
      assert(!exchangesBelowJoin.contains("Exchange hashpartitioning"),
        s"bucketed join still shuffles:\n$plan")
      // and the result is right
      val n = joined.agg(sum("n")).collect()(0).getLong(0)
      assert(n == Tables.lineitem(spark, Sf0001).count())
    } finally spark.conf.unset("spark.sql.autoBroadcastJoinThreshold")
  }
}
