package graft
import org.apache.spark.sql.DataFrame
import org.apache.spark.sql.functions._

/** Evidence harness for the DESIGN "AQE skew-join vs salting" note (and the
  * SkewSpec fixture): prints (a) whether OptimizeSkewedJoin marks the hot
  * partition `skew=true` under a conf matrix, for BOTH dim shapes — the
  * join-exchange shape it can match and the aggregate-partitioned shape it
  * cannot — and (b) wall times for plain-AQE vs salted execution of the
  * same skewed join. Usage: runMain graft.SkewProbe [sfDir]
  */
object SkewProbe {
  def main(args: Array[String]): Unit = {
    val sfDir = if (args.nonEmpty) args(0) else "/root/testdata/sf0.01"
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

    def big: DataFrame = Tables.events(spark, sfDir)
      .select(when(col("event_id") % 10 < 8, 0L).otherwise(col("user_id")).as("k"),
        col("event_id"), xxhash64(col("event_id")).as("p1"))
      .repartition(8)
    // Dim shape A: round-robin'd, so the join inserts its own
    // ENSURE_REQUIREMENTS exchange on k2 — the shape OptimizeSkewedJoin
    // matches. Shape B: bare distinct(), hash-partitioned ON the join key —
    // no join-side exchange exists and the rule cannot fire.
    def dimExchanged: DataFrame = Tables.events(spark, sfDir)
      .select(col("user_id").as("k2")).distinct().repartition(5)
    def dimAggPartitioned: DataFrame = Tables.events(spark, sfDir)
      .select(col("user_id").as("k2")).distinct()

    for {
      (shape, dim) <- Seq("exchanged" -> (() => dimExchanged),
                          "aggPartitioned" -> (() => dimAggPartitioned))
      force <- Seq("false", "true")
      coalesce <- Seq("true", "false")
    } {
      spark.conf.set("spark.sql.adaptive.forceOptimizeSkewedJoin", force)
      spark.conf.set("spark.sql.adaptive.coalescePartitions.enabled", coalesce)
      val df = big.join(dim(), col("k") === col("k2"))
      df.collect()
      val marker = df.queryExecution.executedPlan.toString.contains("skew=true")
      println(s"=== dim=$shape force=$force coalesce=$coalesce skewMarker=$marker")
    }
    spark.conf.unset("spark.sql.adaptive.forceOptimizeSkewedJoin")
    spark.conf.unset("spark.sql.adaptive.coalescePartitions.enabled")

    // Timing: plain join under AQE skew handling vs salted join with AQE
    // skew handling off (salting pre-spreads the hot key across reducers,
    // so AQE has nothing to split). min-of-3 each.
    def time(f: => Unit): Double = {
      val t0 = System.nanoTime(); f; (System.nanoTime() - t0) / 1e9
    }
    def minOf3(f: => Unit): Double = (1 to 3).map(_ => time(f)).min
    spark.conf.set("spark.sql.adaptive.skewJoin.enabled", "true")
    val tAqe = minOf3 {
      big.join(dimExchanged, col("k") === col("k2")).count()
    }
    spark.conf.set("spark.sql.adaptive.skewJoin.enabled", "false")
    val tPlain = minOf3 {
      big.join(dimExchanged, col("k") === col("k2")).count()
    }
    val tSalt = minOf3 {
      Joins.saltedJoin(big, dimExchanged, "k", "k2", col("event_id"), 8).count()
    }
    // the shape AQE cannot help: dim pre-partitioned on the join key
    spark.conf.set("spark.sql.adaptive.skewJoin.enabled", "true")
    val tAggDimAqe = minOf3 {
      big.join(dimAggPartitioned, col("k") === col("k2")).count()
    }
    // salted runs measure with skew handling OFF on both dim shapes —
    // AQE can fire on the salted join's own exchanges, so leaving it on
    // here would fold AQE help into the salted baseline the comparison
    // is against (code-review r13)
    spark.conf.set("spark.sql.adaptive.skewJoin.enabled", "false")
    val tAggDimSalt = minOf3 {
      Joins.saltedJoin(big, dimAggPartitioned, "k", "k2", col("event_id"), 8).count()
    }
    spark.conf.unset("spark.sql.adaptive.skewJoin.enabled")
    println(f"=== timing exchangedDim: aqeSkew=$tAqe%.2fs noSkewHandling=$tPlain%.2fs salted=$tSalt%.2fs")
    println(f"=== timing aggPartitionedDim (AQE blind): aqe=$tAggDimAqe%.2fs salted=$tAggDimSalt%.2fs")
    spark.stop()
  }
}
