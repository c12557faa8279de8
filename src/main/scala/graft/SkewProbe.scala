package graft
import org.apache.spark.sql.functions._
object SkewProbe {
  def main(args: Array[String]): Unit = {
    val spark = org.apache.spark.sql.SparkSession.builder()
      .master("local[8]")
      .config("spark.sql.shuffle.partitions", "8")
      .config("spark.sql.session.timeZone", "UTC")
      .config("spark.sql.legacy.parquet.nanosAsLong", "true")
      .config("spark.ui.enabled", "false")
      .config("spark.sql.autoBroadcastJoinThreshold", "-1")
      .config("spark.sql.adaptive.skewJoin.skewedPartitionFactor", "2")
      .config("spark.sql.adaptive.skewJoin.skewedPartitionThresholdInBytes", "2KB")
      .config("spark.sql.adaptive.advisoryPartitionSizeInBytes", "1KB")
      .getOrCreate()
    spark.sparkContext.setLogLevel("WARN")
    org.apache.log4j.Logger.getLogger(
      "org.apache.spark.sql.execution.adaptive").setLevel(org.apache.log4j.Level.DEBUG)
    for (force <- Seq("false", "true")) {
      spark.conf.set("spark.sql.adaptive.forceOptimizeSkewedJoin", force)
      val big = Tables.events(spark, "/root/testdata/sf0.01")
        .select(when(col("event_id") % 10 < 8, 0L).otherwise(col("user_id")).as("k"),
          col("event_id"), xxhash64(col("event_id")).as("p1"))
        .repartition(8)
      val small = Tables.events(spark, "/root/testdata/sf0.01")
        .select(col("user_id").as("k2")).distinct()
      val df = big.join(small, col("k") === col("k2"))
      df.collect()
      val p = df.queryExecution.executedPlan.toString
      println(s"=== force=$force skewMarker=${p.contains("skew=true")}")
    }
    spark.stop()
  }
}
