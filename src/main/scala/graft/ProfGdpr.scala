package graft
import org.apache.spark.sql.SparkSession
import org.apache.spark.sql.functions._
import Tables._
object ProfGdpr {
  def main(args: Array[String]): Unit = {
    val sfDir = "/root/testdata/sf0.1"
    val spark = SparkSession.builder().master("local[8]")
      .config("spark.sql.shuffle.partitions", "8")
      .config("spark.sql.session.timeZone", "UTC")
      .config("spark.sql.legacy.parquet.nanosAsLong", "true")
      .config("spark.sql.extensions", "org.apache.spark.sql.graft.GraftExtensions")
      .config("spark.ui.enabled", "false").getOrCreate()
    spark.sparkContext.setLogLevel("WARN")
    Tables.names.foreach(n => Tables.t(spark, sfDir, n).count())
    def time(name: String)(f: => Unit): Unit = {
      val ts = (1 to 5).map { _ =>
        System.gc(); Thread.sleep(50)
        val t0 = System.nanoTime(); f; (System.nanoTime() - t0) / 1e9
      }
      println(f"$name: min=${ts.min}%.3f runs=${ts.map(t => f"$t%.3f").mkString(",")}")
    }
    println("events rows: " + events(spark, sfDir).count())
    time("scan only") { events(spark, sfDir).count() }
    time("del distinct") {
      events(spark, sfDir)
        .where(col("user_id").isNotNull && Det.mhash(col("user_id"), Etl.GdprBuckets) < Etl.GdprCut)
        .select(col("user_id")).distinct().count()
    }
    time("groupBy only (no join)") {
      events(spark, sfDir).groupBy("event_type")
        .agg(count(lit(1)).as("n")).count()
    }
    time("groupBy + countDistinct") {
      events(spark, sfDir).groupBy("event_type")
        .agg(count(lit(1)).as("n"), countDistinct(col("user_id")).as("u")).count()
    }
    time("full etl_gdpr_delete") { SparkEntry.queries("etl_gdpr_delete")(spark, sfDir).count() }
    spark.stop()
  }
}
