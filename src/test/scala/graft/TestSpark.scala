package graft

import org.apache.spark.sql.SparkSession

/** One shared local session for all suites (forked test JVM). */
object TestSpark {
  val Sf0001 = "/root/testdata/sf0.001"
  val Sf001  = "/root/testdata/sf0.01"
  val Sf01   = "/root/testdata/sf0.1"

  /** JVM twin of [[TextOps.log2MicroSql]] (exact fixed-point log2 in
    * micro-bits) — ONE definition shared by every spec that pins the SQL
    * formulation, so a future scale change can't update one copy and
    * leave another silently pinning the old arithmetic.
    */
  def log2MicroRef(x: Long): Long = {
    val i = 63 - java.lang.Long.numberOfLeadingZeros(x)
    val p = 1L << i
    i * 1000000L + (x - p) * 1000000L / p
  }

  lazy val spark: SparkSession = {
    System.setProperty("derby.system.home", "/tmp/graft_derby")
    val s = SparkSession.builder()
      .config("spark.sql.warehouse.dir", "/tmp/graft_warehouse")
      .master("local[8]")
      .config("spark.sql.shuffle.partitions", "8")
      .config("spark.sql.session.timeZone", "UTC")
      .config("spark.sql.legacy.parquet.nanosAsLong", "true")
      .config("spark.sql.parquet.outputTimestampType", "TIMESTAMP_MICROS")
      .config("spark.sql.extensions", "org.apache.spark.sql.graft.GraftExtensions")
      .config("spark.ui.enabled", "false")
      .getOrCreate()
    s.sparkContext.setLogLevel("ERROR")
    s
  }
}
