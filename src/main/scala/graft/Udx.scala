package graft

import org.apache.spark.sql.{DataFrame, Encoders, Row, SparkSession}
import org.apache.spark.sql.expressions.Aggregator
import org.apache.spark.sql.functions._
import org.apache.spark.sql.types._
import Tables._

/** UDF / UDAF / UDTF surface (SURVEY.md §2.11).
  *
  * The MR reference's whole API is "arbitrary user map/reduce functions";
  * Spark-native equivalents, in preference order: built-in expressions
  * (codegen'd — used everywhere else in this library), a typed `Aggregator`
  * for custom reductions, a Scala UDF only as a last resort (kept here as
  * the surface demo; its result is proven equal to the codegen'd built-in
  * both by the oracle and by a scalatest property).
  */
object Udx {
  type Q = (SparkSession, String) => DataFrame

  /** Exact integer moments of l_quantity: (count, sum, sum-of-squares).
    * All-integer arithmetic → associative and engine-portable, unlike a
    * double mean/variance. Buffer and output are Long — no float drift.
    */
  class IntMoments extends Aggregator[Long, (Long, Long, Long), (Long, Long, Long)] {
    def zero: (Long, Long, Long) = (0L, 0L, 0L)
    def reduce(b: (Long, Long, Long), q: Long): (Long, Long, Long) =
      (b._1 + 1, b._2 + q, b._3 + q * q)
    def merge(a: (Long, Long, Long), b: (Long, Long, Long)): (Long, Long, Long) =
      (a._1 + b._1, a._2 + b._2, a._3 + b._3)
    def finish(r: (Long, Long, Long)): (Long, Long, Long) = r
    def bufferEncoder = Encoders.tuple(Encoders.scalaLong, Encoders.scalaLong, Encoders.scalaLong)
    def outputEncoder = Encoders.tuple(Encoders.scalaLong, Encoders.scalaLong, Encoders.scalaLong)
  }

  // limit = -1 keeps trailing empty tokens, matching Spark's split() and
  // DuckDB's string_split (Java's default split drops them).
  val tokenCountUdf = udf((s: String) => if (s == null) 0 else s.split(" ", -1).length)

  val queries: Map[String, Q] = Map(
    "udf_scalar" -> ((s, d) =>
      documents(s, d)
        .select(col("doc_id"), tokenCountUdf(col("text")).as("n_tok"))
        .orderBy("doc_id")),

    "udaf_typed" -> ((s, d) => {
      val moments = udaf(new IntMoments, Encoders.scalaLong)
      lineitem(s, d)
        .groupBy("l_returnflag")
        .agg(moments(col("l_quantity").cast(LongType)).as("m"))
        .select(
          col("l_returnflag"),
          col("m._1").as("n"),
          col("m._2").as("sum_qty"),
          col("m._3").as("sumsq_qty"))
        .orderBy("l_returnflag")
    }),

    "udtf_explode" -> ((s, d) =>
      // Generator surface: one row → many (char 3-gram shingles with their
      // position). Built-in explode of a sequence-driven transform — no
      // custom Catalyst Generator needed (SURVEY.md §4.2).
      documents(s, d)
        .select(col("doc_id"), substring(col("text"), 1, 20).as("t"))
        .select(col("doc_id"),
          explode(expr("sequence(1, greatest(length(t) - 2, 1))")).as("pos"),
          col("t"))
        .select(col("doc_id"), col("pos"), expr("substring(t, pos, 3)").as("gram"))
        .orderBy("doc_id", "pos"))
  )

  val oracles: Map[String, String] = Map(
    "udf_scalar" ->
      ("SELECT doc_id, CAST(len(string_split(text, ' ')) AS INT) AS n_tok " +
       "FROM documents ORDER BY doc_id"),

    "udaf_typed" ->
      ("SELECT l_returnflag, count(*) AS n, " +
       "CAST(SUM(CAST(l_quantity AS BIGINT)) AS BIGINT) AS sum_qty, " +
       "CAST(SUM(CAST(l_quantity AS BIGINT) * CAST(l_quantity AS BIGINT)) AS BIGINT) AS sumsq_qty " +
       "FROM lineitem GROUP BY l_returnflag ORDER BY l_returnflag"),

    "udtf_explode" ->
      ("SELECT doc_id, CAST(pos AS INT) AS pos, substr(t, CAST(pos AS INT), 3) AS gram FROM " +
       "(SELECT doc_id, substr(text, 1, 20) AS t, " +
       "unnest(generate_series(1, greatest(len(substr(text, 1, 20)) - 2, 1))) AS pos " +
       "FROM documents) ORDER BY doc_id, pos")
  )
}
