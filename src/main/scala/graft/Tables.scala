package graft

import org.apache.spark.sql.{Column, DataFrame, SparkSession}
import org.apache.spark.sql.functions._
import org.apache.spark.sql.types._

/** Parquet table loaders over the driver-generated fixtures (TESTDATA.md).
  *
  * One parquet file per table; `spark.read.parquet` gives schema-on-read from
  * the footer, and Catalyst pushes filters/column pruning into the scan — at
  * 100 TB the same call reads a partitioned directory tree instead of one
  * file, with partition pruning for free.
  */
object Tables {
  val names: Seq[String] = Seq(
    "region", "nation", "customer", "supplier", "part",
    "orders", "lineitem", "events", "documents", "embeddings")

  // DataFrames are immutable logical plans — caching them per (session,
  // path) skips the repeated file-listing + footer-read every spark.read
  // triggers at plan time (SURVEY.md §6: reuse a loader per (sfDir, table)).
  // Keyed by sessionUUID (collision-free, no strong session reference in the
  // key) and hard-bounded: cached plans reference their session, so a weak
  // map could never evict — instead, entries for other sessions are dropped
  // whenever a new session appears (only concurrent sessions pay a reload).
  private val MaxSessions = 4
  private val loaded = new java.util.concurrent.ConcurrentHashMap[
    String, java.util.concurrent.ConcurrentHashMap[String, DataFrame]]()
  // Weak side-table assigning each session a UUID: the value (a string) holds
  // no reference back to the session, so these entries DO evict on GC.
  private val sessionIds = java.util.Collections.synchronizedMap(
    new java.util.WeakHashMap[SparkSession, String]())

  private def idOf(spark: SparkSession): String =
    sessionIds.computeIfAbsent(spark, _ => java.util.UUID.randomUUID().toString)

  def t(spark: SparkSession, sfDir: String, name: String): DataFrame = {
    val sid = idOf(spark)
    if (loaded.size > MaxSessions) loaded.synchronized {
      if (loaded.size > MaxSessions) loaded.keySet.removeIf(k => k != sid)
    }
    loaded
      .computeIfAbsent(sid,
        _ => new java.util.concurrent.ConcurrentHashMap[String, DataFrame]())
      .computeIfAbsent(s"$sfDir/$name.parquet", _ => load(spark, sfDir, name))
  }

  /** Register the cached loader as a temp view (name carries an sfDir
    * discriminator so scale factors don't collide) for `spark.sql` queries —
    * keeps SQL-form operators on the same cached, ts-normalized loader.
    */
  def view(spark: SparkSession, sfDir: String, name: String): String = {
    val vname = s"graft_${name}_${java.lang.Integer.toHexString(sfDir.hashCode)}"
    t(spark, sfDir, name).createOrReplaceTempView(vname)
    vname
  }

  private def load(spark: SparkSession, sfDir: String, name: String): DataFrame = {
    val df = spark.read.parquet(s"$sfDir/$name.parquet")
    // events.ts is parquet TIMESTAMP(NANOS), which Spark 4 refuses natively;
    // sessions set spark.sql.legacy.parquet.nanosAsLong and the loader
    // truncates ns→µs here (integer div — same floor semantics DuckDB uses
    // when casting its ns read down to µs; SURVEY.md §1.2 D4).
    // The fixtures carry isAdjustedToUTC=false timestamps, which Spark 4
    // infers as TimestampNTZ — so ts is normalized to NTZ too (identity under
    // the pinned UTC session) to keep every timestamp in one family.
    df.schema.find(f => f.name == "ts" && f.dataType == LongType) match {
      case Some(_) =>
        df.withColumn("ts", timestamp_micros(expr("ts div 1000")).cast(TimestampNTZType))
      case None => df
    }
  }

  def region(s: SparkSession, d: String): DataFrame     = t(s, d, "region")
  def nation(s: SparkSession, d: String): DataFrame     = t(s, d, "nation")
  def customer(s: SparkSession, d: String): DataFrame   = t(s, d, "customer")
  def supplier(s: SparkSession, d: String): DataFrame   = t(s, d, "supplier")
  def part(s: SparkSession, d: String): DataFrame       = t(s, d, "part")
  def orders(s: SparkSession, d: String): DataFrame     = t(s, d, "orders")
  def lineitem(s: SparkSession, d: String): DataFrame   = t(s, d, "lineitem")
  def events(s: SparkSession, d: String): DataFrame     = t(s, d, "events")
  def documents(s: SparkSession, d: String): DataFrame  = t(s, d, "documents")
  def embeddings(s: SparkSession, d: String): DataFrame = t(s, d, "embeddings")
}

/** Determinism helpers implementing SURVEY.md §2 rules D1–D5.
  *
  * Cross-engine (Spark vs DuckDB oracle) hash-matching requires bit-stable
  * output: money math goes through exact decimal arithmetic (rule D2 —
  * double summation order is not associative, decimal is), but the FINAL
  * projected value is cast to DOUBLE on both engines. The driver compares
  * *string renderings* via pandas: DuckDB's pandas conversion renders
  * DECIMAL as float64 (no trailing zeros) while Spark parquet yields
  * full-scale Decimal — '39301199.20' vs '39301199.2' hash-mismatches on
  * numerically identical values (root cause of all 16 round-1 hash fails,
  * VERDICT.md "What's wrong" #1). The same exact decimal converts to the
  * same nearest float64 on both engines, so DOUBLE finals are bit-stable.
  * Intermediates that feed further arithmetic use the exact [[dsumx2]]/
  * [[dsumx4]] decimal forms.
  */
object Det {
  /** Exact decimal view of a double column (both engines round half-up). */
  def dec(c: Column, p: Int, s: Int): Column = c.cast(DecimalType(p, s))

  /** Final-output SUM: exact DECIMAL(18,4) accumulation, DOUBLE rendering. */
  def dsum4(c: Column): Column = sum(dec(c, 18, 4)).cast(DoubleType)

  /** Final-output SUM: exact DECIMAL(18,2) accumulation, DOUBLE rendering. */
  def dsum2(c: Column): Column = sum(dec(c, 18, 2)).cast(DoubleType)

  /** Intermediate exact SUM (stays decimal — safe for further arithmetic). */
  def dsumx4(c: Column): Column = sum(dec(c, 18, 4)).cast(DecimalType(38, 4))

  def dsumx2(c: Column): Column = sum(dec(c, 18, 2)).cast(DecimalType(38, 2))

  /** Exact integer SUM (input must be integral-valued) as BIGINT. */
  def lsum(c: Column): Column = sum(c.cast(LongType)).cast(LongType)

  /** Deterministic multiplicative hash of an id into [0, m) — the shared
    * sampling primitive (sample_hash_split / sample_stratified /
    * sample_per_group). Partition-independent, overflow-safe under ANSI
    * (inner pmod bounds the multiplicand), and SQL-expressible.
    * NON-NEGATIVE ids only for the literal `%` oracle mirror: Spark's pmod
    * is always non-negative while SQL `%` keeps the sign, so a signed key
    * column would silently bucket differently on the two engines — wrap
    * the oracle side in ((x % m) + m) % m before reusing this on one.
    */
  def mhash(c: Column, m: Long): Column =
    pmod(pmod(c, lit(1000000007L)) * 2654435761L, lit(m))

  /** DuckDB decimal→DOUBLE via VARCHAR: the direct cast divides the scaled
    * int128 by 10^scale in float — double-rounded, off by 1 ulp once the
    * scaled value exceeds 2^53 (seen at sf0.1). Parsing the exact decimal
    * string is correctly rounded, matching Spark's BigDecimal.doubleValue.
    */
  def oDbl(x: String): String = s"CAST(CAST($x AS VARCHAR) AS DOUBLE)"

  /** SQL fragment mirroring [[dsum4]] for the DuckDB oracle. */
  def oDsum4(x: String): String =
    oDbl(s"SUM(CAST($x AS DECIMAL(18,4)))")

  def oDsum2(x: String): String =
    oDbl(s"SUM(CAST($x AS DECIMAL(18,2)))")

  /** SQL fragments mirroring [[dsumx4]]/[[dsumx2]] (intermediate, exact). */
  def oDsumx4(x: String): String =
    s"CAST(SUM(CAST($x AS DECIMAL(18,4))) AS DECIMAL(38,4))"

  def oDsumx2(x: String): String =
    s"CAST(SUM(CAST($x AS DECIMAL(18,2))) AS DECIMAL(38,2))"

  /** DuckDB SUM over ints is HUGEINT — align to Spark's BIGINT. */
  def oLsum(x: String): String = s"CAST(SUM(CAST($x AS BIGINT)) AS BIGINT)"

  /** DuckDB mirror of Spark's integer `aggregate(xs, 0L, step)`: the
    * list_reduce is EXPLICITLY seeded with 0 via list_prepend (ADVICE.md
    * round 5) — an unseeded list_reduce ERRORS on an empty list where
    * Spark's seeded fold returns 0, and its implicit first-element seed
    * skips the step function on element 1. For the polynomial hash folds
    * this library uses, a 0 seed is identity on non-empty input
    * (0 * m + x = x), so seeding changes nothing on current fixtures while
    * making empty token/shingle lists agree cross-engine instead of
    * crashing the oracle.
    */
  def oIntFold(listExpr: String, step: String): String =
    s"list_reduce(list_prepend(CAST(0 AS BIGINT), $listExpr), $step)"
}
