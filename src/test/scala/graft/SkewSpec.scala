package graft

import org.scalatest.funsuite.AnyFunSuite
import org.apache.spark.sql.functions._
import TestSpark.{spark, Sf0001}

/** Salting for extreme key skew: results identical to the plain join, and
  * the shuffle key becomes (key, salt) so one hot key spreads across
  * reducers. (AQE skew-join covers moderate skew; salting is the explicit
  * tool when a single key dominates.)
  */
class SkewSpec extends AnyFunSuite {

  test("salted join returns exactly the plain join's rows") {
    // Simulate skew: collapse most events onto one key.
    val big = Tables.events(spark, Sf0001)
      .withColumn("k", when(col("event_id") % 10 < 8, 0L).otherwise(col("user_id")))
    val small = Tables.events(spark, Sf0001)
      .select(col("user_id").as("k2")).distinct()
      .withColumn("dim_payload", col("k2") * 100)
    val plain = big.join(small, col("k") === col("k2"))
      .groupBy("k").agg(count(lit(1)).as("n"), sum("dim_payload").as("s"))
      .collect().map(r => (r.getLong(0), r.getLong(1), r.getLong(2))).sortBy(_._1)
    val salted = Joins.saltedJoin(big, small, "k", "k2", col("event_id"), 8)
      .groupBy("k").agg(count(lit(1)).as("n"), sum("dim_payload").as("s"))
      .collect().map(r => (r.getLong(0), r.getLong(1), r.getLong(2))).sortBy(_._1)
    assert(salted.sameElements(plain))
  }

  test("salted join shuffles on (key, salt)") {
    val big = Tables.events(spark, Sf0001).withColumn("k", col("user_id"))
    val small = Tables.events(spark, Sf0001)
      .select(col("user_id").as("k2")).distinct()
    spark.conf.set("spark.sql.autoBroadcastJoinThreshold", "-1")
    try {
      val plan = Joins.saltedJoin(big, small, "k", "k2", col("event_id"), 4)
        .queryExecution.executedPlan.toString
      assert(plan.contains("__salt"), s"salt column not in shuffle key:\n$plan")
    } finally spark.conf.unset("spark.sql.autoBroadcastJoinThreshold")
  }
}
