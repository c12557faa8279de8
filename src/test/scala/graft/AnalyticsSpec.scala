package graft

import org.scalatest.funsuite.AnyFunSuite
import TestSpark.{spark, Sf0001, Sf001}

/** Event-sequence analytics invariants (Analytics.scala) beyond the DuckDB
  * hash oracles: funnel monotonicity, cohort-matrix diagonal structure, and
  * split completeness — properties that must hold for ANY events fixture.
  */
class AnalyticsSpec extends AnyFunSuite {
  private def q(name: String, sf: String = Sf001) =
    SparkEntry.queries(name)(spark, sf)

  test("funnel stage counts are monotonically non-increasing") {
    val stages = q("funnel_stages").collect()
      .map(r => r.getInt(0) -> r.getLong(2)).sortBy(_._1)
    assert(stages.map(_._1).toSeq == Seq(1, 2, 3))
    stages.sliding(2).foreach { case Array((_, a), (_, b)) =>
      assert(b <= a, s"funnel grew: $a -> $b")
    }
    assert(stages.head._2 > 0, "no users entered the funnel")
  }

  test("every funnel-stage user satisfies the ordered-sequence condition (sf0.001)") {
    // independently recompute stage 3 by per-user event-list scan
    import org.apache.spark.sql.functions._
    val evs = Tables.events(spark, Sf0001)
      .select("user_id", "ts", "event_type").collect()
      .groupBy(_.getLong(0))
    val expected = evs.count { case (_, rows) =>
      val sorted = rows.sortBy(_.getAs[java.time.LocalDateTime](1).toString)
      val t1 = sorted.find(_.getString(2) == "view").map(_.getAs[java.time.LocalDateTime](1))
      val t2 = t1.flatMap(v => sorted.find(r => r.getString(2) == "click" &&
        !r.getAs[java.time.LocalDateTime](1).isBefore(v)).map(_.getAs[java.time.LocalDateTime](1)))
      t2.exists(c => sorted.exists(r => r.getString(2) == "purchase" &&
        !r.getAs[java.time.LocalDateTime](1).isBefore(c)))
    }
    val got = q("funnel_stages", Sf0001).collect()
      .find(_.getInt(0) == 3).get.getLong(2)
    assert(got == expected, s"stage-3 count $got vs brute-force $expected")
  }

  test("cohort retention: offset 0 exists for every cohort and counts its full cohort") {
    import org.apache.spark.sql.functions._
    val rows = q("cohort_retention").collect()
      .map(r => (r.getAs[java.time.LocalDateTime](0), r.getInt(1), r.getLong(2)))
    val cohorts = rows.map(_._1).distinct
    cohorts.foreach { cw =>
      assert(rows.exists(r => r._1 == cw && r._2 == 0), s"cohort $cw missing offset 0")
    }
    // offset-0 must equal the cohort SIZE (every user is active in their own
    // first week by construction) — presence + dominance alone would miss a
    // join regression that drops users from the offset-0 cell
    val sizes = Tables.events(spark, Sf001)
      .select(col("user_id"),
        date_trunc("week", col("ts")).cast(org.apache.spark.sql.types.TimestampNTZType).as("wk"))
      .groupBy("user_id").agg(min("wk").as("cohort_week"))
      .groupBy("cohort_week").agg(count(lit(1)).as("n"))
      .collect().map(r => r.getAs[java.time.LocalDateTime](0) -> r.getLong(1)).toMap
    cohorts.foreach { cw =>
      val off0 = rows.find(r => r._1 == cw && r._2 == 0).get._3
      assert(off0 == sizes(cw), s"cohort $cw offset-0 $off0 != cohort size ${sizes(cw)}")
    }
    // offset-0 count >= any later offset's count for the same cohort (a user
    // active later was by construction active in their first week)
    rows.groupBy(_._1).foreach { case (cw, rs) =>
      val base = rs.find(_._2 == 0).get._3
      rs.foreach { case (_, off, n) =>
        assert(n <= base, s"cohort $cw offset $off: $n > offset-0 $base")
      }
    }
    assert(rows.forall(_._2 >= 0))
  }

  test("temporal split partitions all events exactly") {
    val rows = q("sample_temporal_split").collect()
      .map(r => r.getString(0) -> r.getLong(1)).toMap
    val total = Tables.events(spark, Sf001).count()
    assert(rows.keySet == Set("train", "test"))
    assert(rows.values.sum == total)
  }

  test("etl_sessionize matches a per-user reference run-length split") {
    import org.apache.spark.sql.functions._
    val got = q("etl_sessionize", Sf0001).collect()
      .map(r => (r.getLong(0), r.getLong(1)) ->
        ((r.getLong(2), r.getLong(3), r.getLong(4), r.getLong(5)))).toMap
    val evs = Tables.events(spark, Sf0001).where(col("user_id").isNotNull)
      .select(col("user_id"), col("event_id"),
        unix_micros(col("ts").cast("timestamp")).as("us"))
      .collect().map(r => (r.getLong(0), r.getLong(1), r.getLong(2)))
    val expected = evs.groupBy(_._1).flatMap { case (u, rows) =>
      val sorted = rows.sortBy(e => (e._3, e._2)).map(_._3)
      val sessions = sorted.foldLeft(List.empty[List[Long]]) {
        case (cur :: done, us) if us - cur.head <= Analytics.SessionGapUs =>
          (us :: cur) :: done
        case (acc, us) => List(us) :: acc
      }.reverse.map(_.reverse)
      sessions.zipWithIndex.map { case (ss, i) =>
        (u, (i + 1).toLong) -> ((ss.length.toLong, ss.min, ss.max, ss.max - ss.min))
      }
    }.toMap
    val bad = expected.filter { case (k, v) => got.get(k) != Some(v) }
    assert(bad.isEmpty, s"session mismatch: ${bad.take(3)}")
    assert(got.size == expected.size)
    // the gap must discriminate on the fixture: multi-session users AND
    // multi-event sessions both exist
    assert(got.keys.groupBy(_._1).exists(_._2.size > 1), "no user with 2+ sessions")
    assert(got.values.exists(_._1 > 1), "no session with 2+ events")
  }
}
