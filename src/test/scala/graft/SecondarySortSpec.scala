package graft

import org.scalatest.funsuite.AnyFunSuite
import org.apache.spark.sql.functions._
import TestSpark.{spark, Sf0001}

/** The MR secondary-sort pattern (values sorted within each key's partition,
  * SURVEY.md §4.1): `repartition(key) + sortWithinPartitions(key, value)`
  * gives every downstream mapPartitions a stream that is contiguous per key
  * and ordered within it — one shuffle, no per-key collect.
  */
class SecondarySortSpec extends AnyFunSuite {

  test("repartition + sortWithinPartitions yields contiguous, ordered key runs") {
    import spark.implicits._
    val arranged = Tables.events(spark, Sf0001)
      .select(col("user_id"), col("ts").cast("timestamp").cast("long").as("ts_s"), col("event_id"))
      .repartition(4, col("user_id"))
      .sortWithinPartitions(col("user_id"), col("ts_s"), col("event_id"))
      .as[(Long, Long, Long)]
    val perPartition = arranged.mapPartitions { it =>
      // consume as the MR reducer would: assert keys arrive grouped and
      // values sorted, emitting one (user, n, firstTs, lastTs) per run
      val out = scala.collection.mutable.ArrayBuffer.empty[(Long, Long, Long, Long)]
      var cur = Long.MinValue; var n = 0L; var first = 0L; var last = 0L; var prev = Long.MinValue
      var ok = true
      it.foreach { case (u, t, _) =>
        if (u != cur) {
          if (n > 0) out += ((cur, n, first, last))
          // a key reappearing after a different key would mean non-contiguous runs
          ok = ok && !out.exists(_._1 == u)
          cur = u; n = 0; first = t; prev = Long.MinValue
        }
        ok = ok && t >= prev
        prev = t; last = t; n += 1
      }
      if (n > 0) out += ((cur, n, first, last))
      if (!ok) throw new AssertionError("keys not contiguous or values unsorted")
      out.iterator
    }.collect()
    // every user appears exactly once across all partitions, with full counts
    val counts = perPartition.groupBy(_._1).view.mapValues(_.map(_._2).sum).toMap
    val expected = Tables.events(spark, Sf0001).groupBy("user_id").count()
      .collect().map(r => r.getLong(0) -> r.getLong(1)).toMap
    assert(counts == expected)
    assert(perPartition.map(_._1).distinct.length == perPartition.length)
    perPartition.foreach { case (_, _, first, last) => assert(first <= last) }
  }
}
