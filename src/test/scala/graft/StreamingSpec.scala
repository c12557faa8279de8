package graft

import org.scalatest.funsuite.AnyFunSuite
import org.apache.spark.sql.execution.streaming.runtime.MemoryStream
import org.apache.spark.sql.functions._
import java.sql.Timestamp
import TestSpark.{spark, Sf0001}

case class Evt(event_id: Long, ts: Timestamp, user_id: Long, event_type: String, value: Double)

/** Structured Streaming behavior: the real `readStream`-shaped pipeline over
  * a MemoryStream, including watermark-driven late-data drop — semantics the
  * DuckDB oracle cannot check (SURVEY.md §2.10).
  */
class StreamingSpec extends AnyFunSuite {
  private implicit def sqlCtx: org.apache.spark.sql.SQLContext = spark.sqlContext
  import spark.implicits._

  private def ts(min: Int): Timestamp = Timestamp.valueOf(f"2024-01-01 ${min / 60}%02d:${min % 60}%02d:00")

  test("tumbling window stream aggregates per hour and drops late rows") {
    val input = MemoryStream[Evt]
    val q = Streaming.tumblingCountsStream(input.toDF())
      .writeStream.format("memory").queryName("tumb").outputMode("append").start()
    try {
      // hour 0: 3 clicks; hour 1: 1 view; then advance watermark past hour 1
      input.addData(
        Evt(1, ts(5), 1, "click", 1.0), Evt(2, ts(20), 1, "click", 2.0),
        Evt(3, ts(50), 2, "click", 3.0), Evt(4, ts(70), 2, "view", 4.0))
      q.processAllAvailable()
      input.addData(Evt(5, ts(200), 3, "click", 5.0)) // watermark -> 03:10
      q.processAllAvailable()
      // late row for hour 0 — behind the watermark, must be dropped
      input.addData(Evt(6, ts(10), 9, "click", 99.0))
      q.processAllAvailable()
      input.addData(Evt(7, ts(400), 3, "click", 6.0)) // close remaining windows
      q.processAllAvailable()
      val rows = spark.table("tumb").collect()
        .map(r => (r.getAs[Timestamp](0), r.getString(1), r.getLong(2))).toSet
      assert(rows.contains((Timestamp.valueOf("2024-01-01 00:00:00"), "click", 3L)),
        s"hour-0 clicks wrong (late row must not count): $rows")
      assert(rows.contains((Timestamp.valueOf("2024-01-01 01:00:00"), "view", 1L)))
    } finally q.stop()
  }

  test("session window stream groups by 30-minute gaps") {
    val input = MemoryStream[Evt]
    val q = Streaming.sessionWindowStream(input.toDF())
      .writeStream.format("memory").queryName("sess").outputMode("append").start()
    try {
      // user 1: events at 0,10,20 (one session), then 120 (new session)
      input.addData(
        Evt(1, ts(0), 1, "click", 1.0), Evt(2, ts(10), 1, "click", 1.0),
        Evt(3, ts(20), 1, "click", 1.0), Evt(4, ts(120), 1, "click", 1.0))
      q.processAllAvailable()
      input.addData(Evt(5, ts(600), 2, "click", 1.0)) // advance watermark
      q.processAllAvailable()
      val rows = spark.table("sess").collect()
        .map(r => (r.getLong(0), r.getLong(2)))
      assert(rows.contains((1L, 3L)), s"expected session of 3 events: ${rows.toSeq}")
      assert(rows.contains((1L, 1L)))
    } finally q.stop()
  }

  test("dropDuplicatesWithinWatermark removes replayed event_ids") {
    val input = MemoryStream[Evt]
    val q = Streaming.dedupStream(input.toDF())
      .writeStream.format("memory").queryName("dedup").outputMode("append").start()
    try {
      input.addData(Evt(1, ts(0), 1, "click", 1.0), Evt(1, ts(0), 1, "click", 1.0),
        Evt(2, ts(1), 1, "click", 1.0))
      q.processAllAvailable()
      input.addData(Evt(1, ts(2), 1, "click", 1.0)) // replay within watermark
      q.processAllAvailable()
      val n = spark.table("dedup").collect().count(_.getLong(0) == 1L)
      assert(n == 1, s"event_id 1 emitted $n times")
    } finally q.stop()
  }

  test("mapGroupsWithState keeps a running per-user session count") {
    val input = MemoryStream[Streaming.EvtRow]
    val q = Streaming.statefulSessionCountStream(input.toDS())
      .writeStream.format("memory").queryName("msess").outputMode("update").start()
    try {
      input.addData(
        Streaming.EvtRow(1, ts(0), 1, "click", 1.0),
        Streaming.EvtRow(2, ts(10), 1, "click", 1.0))
      q.processAllAvailable()
      // 100 min later: a second session for user 1
      input.addData(Streaming.EvtRow(3, ts(120), 1, "click", 1.0))
      q.processAllAvailable()
      val last = spark.table("msess").collect()
        .map(r => (r.getLong(0), r.getLong(1))).groupBy(_._1)
        .map { case (u, rs) => u -> rs.map(_._2).max }
      assert(last(1L) == 2L, s"expected 2 sessions: $last")
    } finally q.stop()
  }

  test("flatMapGroupsWithState emits one row per closed session, across batches") {
    val input = MemoryStream[Streaming.EvtRow]
    val q = Streaming.closedSessionsStream(input.toDS())
      .writeStream.format("memory").queryName("closed").outputMode("append").start()
    try {
      // session 1: events at 0,10 — stays open at batch end
      input.addData(
        Streaming.EvtRow(1, ts(0), 1, "click", 1.0),
        Streaming.EvtRow(2, ts(10), 1, "click", 1.0))
      q.processAllAvailable()
      assert(spark.table("closed").count() == 0) // nothing closed yet
      // gap > 30min closes session 1 (2 events, counted across batches);
      // the session id is its start timestamp in epoch µs.
      input.addData(Streaming.EvtRow(3, ts(120), 1, "click", 1.0))
      q.processAllAvailable()
      val s1 = ts(0).getTime * 1000L
      val rows = spark.table("closed").collect()
        .map(r => (r.getLong(0), r.getLong(1), r.getLong(2)))
      assert(rows.toSeq == Seq((1L, s1, 2L)), s"got ${rows.toSeq}")
      // event-time timeout: another user's events push the watermark far past
      // user 1's last activity + gap; user 1's OPEN session must flush
      // without any new user-1 event.
      input.addData(Streaming.EvtRow(4, ts(600), 2, "click", 1.0))
      q.processAllAvailable()
      input.addData(Streaming.EvtRow(5, ts(620), 2, "click", 1.0))
      q.processAllAvailable()
      val s2 = ts(120).getTime * 1000L
      val after = spark.table("closed").collect()
        .map(r => (r.getLong(0), r.getLong(1), r.getLong(2))).toSet
      assert(after.contains((1L, s2, 1L)), s"timeout did not flush open session: $after")
    } finally q.stop()
  }

  test("stream-stream join pairs purchases within 1h of signups") {
    val signups = MemoryStream[Evt]
    val purchases = MemoryStream[Evt]
    val q = Streaming.signupPurchaseJoinStream(signups.toDF(), purchases.toDF())
      .writeStream.format("memory").queryName("ssjoin").outputMode("append").start()
    try {
      signups.addData(Evt(1, ts(0), 1, "signup", 0.0), Evt(2, ts(0), 2, "signup", 0.0))
      purchases.addData(
        Evt(10, ts(30), 1, "purchase", 5.0),   // in window for user 1
        Evt(11, ts(90), 1, "purchase", 5.0),   // outside 1h
        Evt(12, ts(20), 3, "purchase", 5.0))   // no signup for user 3
      q.processAllAvailable()
      val pairs = spark.table("ssjoin").collect()
        .map(r => (r.getLong(0), r.getLong(1))).toSet
      assert(pairs == Set((1L, 10L)), s"got $pairs")
    } finally q.stop()
  }

  test("stream-stream interval join matches the batch twin on fixture data") {
    // the batch twin (stream_interval_join) is driver-oracle-verified; this
    // pins the STREAMING builder to it: fed the real sf0.001 events, the
    // watermarked stream-stream join must emit exactly the batch pair set.
    val evs = Tables.events(spark, Sf0001)
      .select("event_id", "ts", "user_id", "event_type", "value").collect()
      .map(r => Evt(r.getLong(0),
        Timestamp.valueOf(r.getAs[java.time.LocalDateTime](1)),
        r.getLong(2), r.getString(3), r.getDouble(4)))
      .sortBy(e => (e.ts.getTime, e.event_id))
    val signups = MemoryStream[Evt]
    val purchases = MemoryStream[Evt]
    val q = Streaming.signupPurchaseJoinStream(signups.toDF(), purchases.toDF())
      .writeStream.format("memory").queryName("ssjoin_fix").outputMode("append").start()
    try {
      signups.addData(evs.filter(_.event_type == "signup").toSeq)
      purchases.addData(evs.filter(_.event_type == "purchase").toSeq)
      q.processAllAvailable()
      val streamed = spark.table("ssjoin_fix").collect()
        .map(r => (r.getLong(0), r.getLong(1))).toSet
      val batch = SparkEntry.queries("stream_interval_join")(spark, Sf0001)
        .collect().map(r => (r.getLong(1), r.getLong(2))).toSet
      assert(batch.nonEmpty, "fixture has no signup→purchase pairs — test is vacuous")
      assert(streamed == batch, s"stream $streamed vs batch $batch")
    } finally q.stop()
  }

  test("foreachBatch sink: stream lands deterministically in parquet") {
    val out = "/tmp/graft_feb_out"
    val f = new java.io.File(out)
    def rm(x: java.io.File): Unit = { if (x.isDirectory) x.listFiles().foreach(rm); x.delete() }
    if (f.exists()) rm(f)
    val input = MemoryStream[Streaming.EvtRow]
    val q = input.toDF()
      .writeStream
      .foreachBatch { (batch: org.apache.spark.sql.DataFrame, id: Long) =>
        batch.write.mode("append").parquet(out)
      }
      .start()
    try {
      input.addData(Streaming.EvtRow(1, ts(0), 1, "click", 1.0),
        Streaming.EvtRow(2, ts(1), 2, "view", 2.0))
      q.processAllAvailable()
      assert(spark.read.parquet(out).count() == 2)
    } finally q.stop()
  }

  test("file-source streaming: readStream over a parquet dir matches the batch twin") {
    val dir = "/tmp/graft_stream_src"
    val ckpt = "/tmp/graft_stream_ckpt"
    for (p <- Seq(dir, ckpt)) {
      val f = new java.io.File(p)
      def rm(x: java.io.File): Unit = { if (x.isDirectory) x.listFiles().foreach(rm); x.delete() }
      if (f.exists()) rm(f)
    }
    val batch = Tables.events(spark, Sf0001)
      .select("event_id", "ts", "user_id", "event_type", "value")
    batch.write.parquet(dir)
    // Watermarks require TIMESTAMP (LTZ); the fixture ts is NTZ — identity
    // cast under the pinned UTC session.
    val stream = spark.readStream.schema(batch.schema).parquet(dir)
      .withColumn("ts", col("ts").cast("timestamp"))
    val agg = Streaming.tumblingCountsStream(stream)
    val q = agg.writeStream.format("memory").queryName("fsrc")
      .option("checkpointLocation", ckpt).outputMode("complete").start()
    try {
      q.processAllAvailable()
      val streamed = spark.table("fsrc")
        .agg(sum("n")).collect()(0).getLong(0)
      assert(streamed == batch.count())
    } finally q.stop()
  }

  test("batch sliding windows place each event in 4 windows") {
    val n = Tables.events(spark, Sf0001).count()
    val windowed = SparkEntry.queries("stream_sliding_avg")(spark, Sf0001)
      .agg(sum("n")).collect()(0).getLong(0)
    assert(windowed == 4 * n)
  }

  test("batch sessionization: session count bounded and gaps respected") {
    val rows = SparkEntry.queries("stream_session_windows")(spark, Sf0001).collect()
    val total = rows.map(_.getLong(2)).sum
    assert(total == Tables.events(spark, Sf0001).count())
    rows.groupBy(_.getLong(0)).foreach { case (_, rs) =>
      val ids = rs.map(_.getLong(1)).sorted
      assert(ids.head == 1 && ids.last == ids.length) // dense 1..n per user
    }
  }

  test("streaming funnel state machine matches the batch funnel_stages counts") {
    // feed the real sf0.001 events in event-time order (two batches): the
    // per-stage distinct-user counts emitted by the stateful stream must
    // equal the batch conditional-aggregation funnel's counts.
    val evs = Tables.events(spark, Sf0001)
      .select("event_id", "ts", "user_id", "event_type", "value").collect()
      .map(r => Streaming.EvtRow(r.getLong(0),
        Timestamp.valueOf(r.getAs[java.time.LocalDateTime](1)),
        r.getLong(2), r.getString(3), r.getDouble(4)))
      .sortBy(e => (e.ts.getTime, e.event_id))
    val input = MemoryStream[Streaming.EvtRow]
    val q = Streaming.funnelStream(input.toDS())
      .writeStream.format("memory").queryName("funnel").outputMode("append").start()
    try {
      val (a, b) = evs.splitAt(evs.length / 2)
      input.addData(a.toSeq); q.processAllAvailable()
      input.addData(b.toSeq); q.processAllAvailable()
      val streamed = spark.table("funnel")
        .groupBy("stage").agg(countDistinct("user_id").as("n"))
        .collect().map(r => r.getInt(0) -> r.getLong(1)).toMap
      val batch = SparkEntry.queries("funnel_stages")(spark, Sf0001)
        .collect().map(r => r.getInt(0) -> r.getLong(2)).toMap
      assert(streamed == batch, s"stream $streamed vs batch $batch")
    } finally q.stop()
  }

  test("streaming cdc compaction converges to the batch etl_cdc_apply state") {
    // feed the fixture log SHUFFLED across three batches (worst-case
    // arrival order): the final update per key, deletes dropped, must
    // equal the batch compaction exactly
    val evs = Tables.events(spark, Sf0001)
      .select("event_id", "ts", "user_id", "event_type", "value").collect()
      .map(r => Streaming.EvtRow(r.getLong(0),
        Timestamp.valueOf(r.getAs[java.time.LocalDateTime](1)),
        r.getLong(2), r.getString(3), r.getDouble(4)))
      .sortBy(e => e.event_id % 3) // interleave arrival vs event time
    val input = MemoryStream[Streaming.EvtRow]
    val q = Streaming.cdcCompactStream(input.toDS())
      .writeStream.format("memory").queryName("cdc").outputMode("update").start()
    try {
      evs.grouped(math.max(1, evs.length / 3)).foreach { b =>
        input.addData(b.toSeq); q.processAllAvailable()
      }
      // last update per key wins (Update mode emits one row per key per
      // batch; later batches supersede): reduce by max n_ops
      val streamed = spark.table("cdc").collect()
        .map(r => (r.getLong(0), (r.getLong(1), r.getString(2), r.getDouble(3),
          r.getLong(4))))
        .groupBy(_._1).view.mapValues(_.map(_._2).maxBy(_._1)).toMap
        .collect { case (uid, (n, op, v, us)) if op != "D" => (uid, n, op, v, us) }
        .toSet
      val batch = SparkEntry.queries("etl_cdc_apply")(spark, Sf0001).collect()
        .map(r => (r.getLong(0), r.getLong(1), r.getString(2), r.getDouble(3),
          r.getLong(4))).toSet
      assert(streamed == batch,
        s"stream-batch drift: ${(streamed -- batch).take(3)} / ${(batch -- streamed).take(3)}")
    } finally q.stop()
  }

  test("funnel tie edge: equal-ts events advance stages regardless of event_id order") {
    // The batch twin's min(ts >= t) admits equality, so a click (or
    // purchase) whose ts exactly ties the prior stage's entry time counts —
    // even when its event_id sorts BEFORE the stage-setting event. The
    // stream processes equal-ts events in stage order to match (ADVICE.md).
    val t = ts(30)
    val input = MemoryStream[Streaming.EvtRow]
    val q = Streaming.funnelStream(input.toDS())
      .writeStream.format("memory").queryName("funnel_tie").outputMode("append").start()
    try {
      input.addData(
        // user 1: click's id sorts before the view it depends on, same ts
        Streaming.EvtRow(2, t, 1, "view", 1.0),
        Streaming.EvtRow(1, t, 1, "click", 1.0),
        // user 2: all three stages at one ts, ids in reverse stage order
        Streaming.EvtRow(5, t, 2, "purchase", 1.0),
        Streaming.EvtRow(4, t, 2, "click", 1.0),
        Streaming.EvtRow(3, t, 2, "view", 1.0))
      q.processAllAvailable()
      val got = spark.table("funnel_tie").collect()
        .map(r => (r.getLong(0), r.getInt(1))).toSet
      assert(got == Set((1L, 1), (1L, 2), (2L, 1), (2L, 2), (2L, 3)),
        s"tie semantics broken: $got")
    } finally q.stop()
  }

  test("streaming ewma equals batch window_ewma bit-for-bit on time-ordered arrival") {
    // time-ordered arrival is the recursion's contract (an EWMA is
    // order-DEPENDENT, unlike the dedup/cdc state machines): the fixture
    // events sorted by the batch twin's (epoch µs, event_id) total order,
    // split into 4 contiguous micro-batches — every per-key double must
    // come out IDENTICAL to the batch fold, proving the two-number state
    // replaces the batch side's whole-series buffer exactly
    val evs = Tables.events(spark, Sf0001).where(col("user_id").isNotNull)
      .select("event_id", "ts", "user_id", "event_type", "value").collect()
      .map(r => Streaming.EvtRow(r.getLong(0),
        Timestamp.valueOf(r.getAs[java.time.LocalDateTime](1)),
        r.getLong(2), r.getString(3), r.getDouble(4)))
      .sortBy(e => (Streaming.epochUs(e.ts), e.event_id))
    val input = MemoryStream[Streaming.EvtRow]
    val q = Streaming.ewmaStream(input.toDS())
      .writeStream.format("memory").queryName("ewma").outputMode("update").start()
    try {
      evs.grouped(math.max(1, evs.length / 4)).foreach { b =>
        input.addData(b.toSeq); q.processAllAvailable()
      }
      // Update mode: latest row per key wins (n_events is monotone)
      val streamed = spark.table("ewma").collect()
        .map(r => (r.getLong(0), (r.getLong(1), r.getDouble(2))))
        .groupBy(_._1).view.mapValues(_.map(_._2).maxBy(_._1)).toMap
      val batch = SparkEntry.queries("window_ewma")(spark, Sf0001).collect()
        .map(r => (r.getLong(0), (r.getLong(1), r.getDouble(2)))).toMap
      assert(streamed == batch,
        s"stream-batch drift: ${(streamed.toSet -- batch.toSet).take(3)} / " +
        s"${(batch.toSet -- streamed.toSet).take(3)}")
    } finally q.stop()
  }

  test("streaming z-score flags equal batch window_anomaly_zscore bit-for-bit on time-ordered arrival") {
    // same contract as the ewma twin: the ring state is order-dependent,
    // so the feed is the batch total order in 4 contiguous micro-batches;
    // every flagged event_id AND its exact z double must match the batch
    // window operator (proving the 20-long ring + scaled-integer sums
    // reproduce the decimal window moments exactly)
    val evs = Tables.events(spark, Sf0001).where(col("value").isNotNull)
      .select("event_id", "ts", "user_id", "event_type", "value").collect()
      .map(r => Streaming.EvtRow(r.getLong(0),
        Timestamp.valueOf(r.getAs[java.time.LocalDateTime](1)),
        if (r.isNullAt(2)) 0L else r.getLong(2), r.getString(3), r.getDouble(4)))
      .sortBy(e => (Streaming.epochUs(e.ts), e.event_id))
    val input = MemoryStream[Streaming.EvtRow]
    val q = Streaming.zscoreStream(input.toDS())
      .writeStream.format("memory").queryName("zsflag").outputMode("append").start()
    try {
      evs.grouped(math.max(1, evs.length / 4)).foreach { b =>
        input.addData(b.toSeq); q.processAllAvailable()
      }
      val streamed = spark.table("zsflag").collect()
        .map(r => r.getLong(0) -> r.getDouble(3)).toMap
      val batch = SparkEntry.queries("window_anomaly_zscore")(spark, Sf0001)
        .collect().map(r => r.getLong(0) -> r.getDouble(3)).toMap
      assert(batch.nonEmpty, "batch twin flagged nothing — vacuous fixture")
      assert(streamed == batch,
        s"stream-batch drift: extra=${(streamed.keySet -- batch.keySet).take(3)} " +
        s"missing=${(batch.keySet -- streamed.keySet).take(3)}")
    } finally q.stop()
  }

  test("zscoreStream is exact in the large-value domain where Long squares would wrap") {
    // values ~9e4 scale to ~9e8 fixed-point; one window's Σx² ≈ 1.6e19
    // exceeds Long.MaxValue (9.2e18) — a Long accumulator wraps silently
    // (the round-11 review catch) while the batch twin's DECIMAL(38,8)
    // stays exact. The BigInt accumulator must reproduce the batch
    // arithmetic bit-for-bit here too.
    val vals = (0 until 40).map(i => 90000.0 + (i % 7) * 3.25) :+ 90800.0
    val evs = vals.zipWithIndex.map { case (v, i) =>
      Streaming.EvtRow(i.toLong, new Timestamp(1700000000000L + i * 60000L),
        1L, "big", v)
    }
    val Zw = Windows.ZscoreWindow
    val expected = scala.collection.mutable.Map.empty[Long, Double]
    for (i <- (Zw - 1) until evs.length) {
      val win = evs.slice(i - (Zw - 1), i + 1)
      val decs = win.map(e =>
        BigDecimal(e.value).setScale(4, BigDecimal.RoundingMode.HALF_UP))
      val s1D = decs.sum.toDouble
      val s2D = decs.map(x => x * x).sum.toDouble
      val nD = Zw.toDouble
      val varPop = math.max(nD * s2D - s1D * s1D, 0.0) / (nD * nD)
      val z = (evs(i).value - s1D / nD) / math.sqrt(varPop)
      if (varPop > 0.0 && math.abs(z) > Windows.ZscoreFlagSigma)
        expected(evs(i).event_id) = z
    }
    assert(expected.contains(40L), "the spike must flag in the reference")
    val input = MemoryStream[Streaming.EvtRow]
    val q = Streaming.zscoreStream(input.toDS())
      .writeStream.format("memory").queryName("zsbig").outputMode("append").start()
    try {
      input.addData(evs); q.processAllAvailable()
      val got = spark.table("zsbig").collect()
        .map(r => r.getLong(0) -> r.getDouble(3)).toMap
      assert(got == expected.toMap,
        s"large-value drift: got=$got expected=$expected")
    } finally q.stop()
  }

  test("zscoreStream under cross-batch late arrival: equals the arrival-order reference, diverges from batch") {
    // ADVICE r11: the ring is arrival-order dependent ACROSS micro-batches
    // by design (no watermark reorder buffer). Pin both halves of that
    // contract: (a) the stream equals a JVM reference that replays the
    // ACTUAL arrival order (sorted within each batch only), and (b) that
    // output genuinely DIFFERS from the batch twin's global time order on
    // this fixture — so the time-ordered-arrival precondition is a tested
    // property, not a comment.
    val Zw = Windows.ZscoreWindow
    def ev(i: Int, v: Double) = Streaming.EvtRow(
      i.toLong, new Timestamp(1700000000000L + i * 60000L), 1L, "late", v)
    // 40 time-ordered events with a value TREND (so different ring
    // compositions give different moments), a spike at the end
    val all = (0 until 39).map(i => ev(i, 10.0 + i * 0.1)) :+ ev(39, 1000.0)
    // arrival: events 25..34 are LATE — they sit INSIDE the spike's
    // trailing 20-window in time order, but land in batch 2 after the
    // spike has already been folded, so the spike's ring (and its z)
    // differs between the two orderings
    val batch1 = all.take(25) ++ all.drop(35)
    val batch2 = all.slice(25, 35)
    def replay(arrival: Seq[Seq[Streaming.EvtRow]]): Map[Long, Double] = {
      var ring = Vector.empty[BigDecimal]
      val flags = scala.collection.mutable.Map.empty[Long, Double]
      arrival.foreach(_.sortBy(e => (e.ts.getTime, e.event_id)).foreach { e =>
        ring = (ring :+ BigDecimal(e.value)
          .setScale(4, BigDecimal.RoundingMode.HALF_UP)).takeRight(Zw)
        if (ring.length == Zw) {
          val s1D = ring.sum.toDouble
          val s2D = ring.map(x => x * x).sum.toDouble
          val nD = Zw.toDouble
          val varPop = math.max(nD * s2D - s1D * s1D, 0.0) / (nD * nD)
          val z = (e.value - s1D / nD) / math.sqrt(varPop)
          if (varPop > 0.0 && math.abs(z) > Windows.ZscoreFlagSigma)
            flags(e.event_id) = z
        }
      })
      flags.toMap
    }
    val arrivalRef = replay(Seq(batch1, batch2))
    val batchRef = replay(Seq(all))
    assert(arrivalRef != batchRef,
      "fixture failed to discriminate — late arrival produced identical flags")
    val input = MemoryStream[Streaming.EvtRow]
    val q = Streaming.zscoreStream(input.toDS())
      .writeStream.format("memory").queryName("zslate").outputMode("append").start()
    try {
      input.addData(batch1); q.processAllAvailable()
      input.addData(batch2); q.processAllAvailable()
      val got = spark.table("zslate").collect()
        .map(r => r.getLong(0) -> r.getDouble(3)).toMap
      assert(got == arrivalRef,
        s"stream != arrival-order reference: got=$got expected=$arrivalRef")
    } finally q.stop()
  }

  test("fingerprint dedup stream converges to batch dedup_exact under shuffled arrival") {
    // The full sf0.001 documents corpus, arrival order decorrelated from
    // doc_id and split across 4 micro-batches: duplicates of one text land
    // in DIFFERENT batches in arbitrary order, the exact condition the
    // min-representative state machine must be invariant to.
    val docs = Tables.documents(spark, Sf0001)
      .select("doc_id", "text").collect()
      .map(r => (r.getLong(0), r.getString(1)))
      .sortBy { case (id, _) => id % 7 }
    val input = MemoryStream[(Long, String)]
    val q = Streaming.fingerprintDedupStream(input.toDS().toDF("doc_id", "text"))
      .writeStream.format("memory").queryName("fpdedup").outputMode("update").start()
    try {
      docs.grouped(math.max(1, docs.length / 4)).foreach { b =>
        input.addData(b.toSeq); q.processAllAvailable()
      }
      // Update mode: the latest row per fingerprint supersedes — reduce by
      // max n_copies (monotone per key)
      val streamed = spark.table("fpdedup").collect()
        .map(r => (r.getLong(0), (r.getLong(1), r.getLong(2))))
        .groupBy(_._1).view.mapValues(_.map(_._2).maxBy(_._2)).toMap
      // batch truth on the same fixture: reps + copy counts per raw text
      val batch = SparkEntry.queries("dedup_exact")(spark, Sf0001).collect()
        .map(r => (r.getLong(0), r.getLong(1))).toSet
      val streamedReps = streamed.values.toSet
      assert(streamedReps == batch,
        s"stream-batch drift: ${(streamedReps -- batch).take(3)} / ${(batch -- streamedReps).take(3)}")
      // and the state key did not collide on this fixture: one fingerprint
      // per distinct text (otherwise the equality above can still hold by
      // luck on reps while counts merged — fail loudly instead)
      assert(streamed.size == batch.size,
        s"fingerprint collision merged ${batch.size - streamed.size} content groups")
    } finally q.stop()
  }

  test("stream-static enrichment equals the batch twin under shuffled arrival") {
    // facts stream in shuffled micro-batches; the dim is the STATIC
    // profile snapshot — a stateless broadcast join, so no watermark and
    // no state store, and every output row must match the batch twin.
    val dim = Streaming.profileDim(spark, Sf0001)
    val facts = Tables.events(spark, Sf0001)
      .where(col("event_type") === "purchase")
      .select(col("event_id"), col("ts"), col("user_id"), col("value")).collect()
      .map(r => Evt(r.getLong(0), java.sql.Timestamp.valueOf(
        r.getAs[java.time.LocalDateTime](1)),
        if (r.isNullAt(2)) -1L else r.getLong(2), "purchase", r.getDouble(3)))
      .filter(_.user_id >= 0)
    val shuffled = facts.sortBy(e => (e.event_id * 2654435761L) % 1000003L)
    val input = MemoryStream[Evt]
    val q = Streaming.staticEnrichStream(input.toDF(), dim)
      .writeStream.format("memory").queryName("enrich").outputMode("append").start()
    try {
      shuffled.grouped(math.max(1, shuffled.length / 4)).foreach { b =>
        input.addData(b.toSeq); q.processAllAvailable()
      }
      val streamed = spark.table("enrich")
        .select("event_id", "profile_value").collect()
        .map(r => (r.getLong(0), r.getDouble(1))).toSet
      val batch = SparkEntry.queries("stream_static_enrich")(spark, Sf0001)
        .collect().map(r => (r.getLong(0), r.getDouble(2))).toSet
      assert(streamed == batch,
        s"stream-batch drift: ${(streamed -- batch).take(3)} / ${(batch -- streamed).take(3)}")
      assert(batch.nonEmpty, "no enriched facts — dim/facts disjoint, test vacuous")
    } finally q.stop()
  }

  test("chained-stateful trending type converges to the batch twin per closed hour") {
    // TWO stateful aggregations in one append-mode query (hourly counts →
    // per-hour max_by over window_time) — the fixture's full event stream
    // arrives time-ordered in 4 micro-batches, then a far-future sentinel
    // closes every fixture hour; each emitted row must equal the batch
    // twin's (the sentinel's own hour never closes and is excluded).
    val evs = Tables.events(spark, Sf0001)
      .select("event_id", "ts", "user_id", "event_type", "value").collect()
      .map(r => Evt(r.getLong(0),
        java.sql.Timestamp.valueOf(r.getAs[java.time.LocalDateTime](1)),
        if (r.isNullAt(2)) 0L else r.getLong(2), r.getString(3), r.getDouble(4)))
      .sortBy(_.ts.getTime)
    val sentinel = Evt(-1L,
      new java.sql.Timestamp(evs.last.ts.getTime + 24L * 3600 * 1000), 0L, "zz", 0.0)
    val input = MemoryStream[Evt]
    val q = Streaming.trendingTypeStream(input.toDF())
      .writeStream.format("memory").queryName("trend").outputMode("append").start()
    try {
      evs.grouped(math.max(1, evs.length / 4)).foreach { b =>
        input.addData(b.toSeq); q.processAllAvailable()
      }
      input.addData(sentinel); q.processAllAvailable()
      val streamed = spark.table("trend").collect()
        .map(r => (r.getTimestamp(0), r.getString(1), r.getLong(2))).toSet
      val batch = SparkEntry.queries("stream_trending_type")(spark, Sf0001)
        .collect()
        .map(r => (java.sql.Timestamp.valueOf(r.getAs[java.time.LocalDateTime](0)),
          r.getString(1), r.getLong(2))).toSet
      assert(streamed == batch,
        s"stream-batch drift: ${(streamed -- batch).take(3)} / ${(batch -- streamed).take(3)}")
      assert(batch.size > 1, "single-hour fixture — chained aggregation test vacuous")
    } finally q.stop()
  }

  test("streaming HLL registers converge to the batch sketch under shuffled arrival") {
    import spark.implicits._
    // id-shuffled arrival across 4 micro-batches: max-merge must be
    // order- and boundary-invariant, so the final registers are EXACTLY
    // the batch sketch's
    val evs = Tables.events(spark, Sf0001).where(col("user_id").isNotNull)
      .select("event_id", "ts", "user_id", "event_type", "value").collect()
      .map(r => Streaming.EvtRow(r.getLong(0),
        Timestamp.valueOf(r.getAs[java.time.LocalDateTime](1)),
        r.getLong(2), r.getString(3), r.getDouble(4)))
      .sortBy(e => e.event_id % 11)
    val input = MemoryStream[Streaming.EvtRow]
    val q = Streaming.hllStream(input.toDS())
      .writeStream.format("memory").queryName("hll").outputMode("update").start()
    try {
      evs.grouped(math.max(1, evs.length / 4)).foreach { b =>
        input.addData(b.toSeq); q.processAllAvailable()
      }
      // update mode: latest row per key wins (n_seen is monotone)
      val streamed = spark.table("hll").collect()
        .map(r => (r.getString(0), (r.getLong(1), r.getSeq[Long](2))))
        .groupBy(_._1).view.mapValues(_.map(_._2).maxBy(_._1)).toMap
      val batch = SparkEntry.queries("agg_hll_sketch")(spark, Sf0001).collect()
        .map(r => (r.getString(0), r.getLong(1), r.getLong(2)))
        .groupBy(_._1).view
        .mapValues(_.map(t => t._2 -> t._3).toMap).toMap
      assert(streamed.keySet == batch.keySet)
      streamed.foreach { case (et, (n, regs)) =>
        assert(n == evs.count(_.event_type == et), s"$et: n_seen drift")
        val streamedRegs = regs.zipWithIndex.collect {
          case (r, b) if r > 0 => b.toLong -> r }.toMap
        assert(streamedRegs == batch(et),
          s"$et register drift: ${(streamedRegs.toSet -- batch(et).toSet).take(3)}")
      }
    } finally q.stop()
  }

  test("streaming count-min cells converge to the batch sketch under shuffled arrival") {
    import spark.implicits._
    // doc-shuffled arrival across 4 micro-batches: cell ADDITION is
    // commutative, so the final cells — and hence every min-over-rows
    // estimate — must equal the batch sketch's exactly
    val docs = Tables.documents(spark, Sf0001).select("doc_id", "text").collect()
      .map(r => (r.getLong(0), r.getString(1)))
      .sortBy(t => (t._1 * 2654435761L) % 1000003L)
    val input = MemoryStream[(Long, String)]
    val q = Streaming.cmStream(input.toDS().toDF("doc_id", "text"))
      .writeStream.format("memory").queryName("cmsketch").outputMode("update").start()
    try {
      docs.grouped(math.max(1, docs.length / 4)).foreach { b =>
        input.addData(b.toSeq); q.processAllAvailable()
      }
      // update mode: latest row per sketch row wins (n_seen is monotone)
      val cells = spark.table("cmsketch").collect()
        .map(r => (r.getInt(0), (r.getLong(1), r.getSeq[Long](2))))
        .groupBy(_._1).view.mapValues(_.map(_._2).maxBy(_._1)._2).toMap
      assert(cells.keySet == (0 until Aggregations.CmRows).toSet,
        s"missing sketch rows: ${cells.keySet}")
      // conservation: every row's cell mass counts every token once
      val totalTokens = docs.map(_._2.split(" ", -1).length.toLong).sum
      cells.values.foreach(cs => assert(cs.sum == totalTokens, "cell mass drift"))
      // the estimates READ FROM THE STREAMED CELLS must equal the batch
      // operator's est_cnt for its top-20 words — batch-equal at the
      // observable level, pinned through the JVM form of the same hashes
      val batch = SparkEntry.queries("agg_heavy_hitters")(spark, Sf0001).collect()
        .map(r => (r.getString(0), r.getLong(1), r.getLong(2)))
      assert(batch.nonEmpty)
      batch.foreach { case (w, _, est) =>
        val base = Aggregations.cmBaseOf(w)
        val streamedEst = (0 until Aggregations.CmRows)
          .map(r => cells(r)(Aggregations.cmBucketOf(r, base))).min
        assert(streamedEst == est, s"'$w': streamed $streamedEst != batch $est")
      }
    } finally q.stop()
  }

  test("streaming quantile-sketch bins converge to the batch sketch under shuffled arrival") {
    import spark.implicits._
    // the batch twin filters ONLY value IS NOT NULL — null user_ids map
    // to a sentinel (bins never read user_id), so the streamed row set is
    // exactly the batch one
    val evs = Tables.events(spark, Sf0001).where(col("value").isNotNull)
      .select("event_id", "ts", "user_id", "event_type", "value").collect()
      .map(r => Streaming.EvtRow(r.getLong(0),
        Timestamp.valueOf(r.getAs[java.time.LocalDateTime](1)),
        if (r.isNullAt(2)) -1L else r.getLong(2), r.getString(3), r.getDouble(4)))
      .sortBy(e => (e.event_id * 2654435761L) % 1000003L)
    val input = MemoryStream[Streaming.EvtRow]
    val q = Streaming.quantileSketchStream(input.toDS())
      .writeStream.format("memory").queryName("qsketch").outputMode("update").start()
    try {
      evs.grouped(math.max(1, evs.length / 4)).foreach { b =>
        input.addData(b.toSeq); q.processAllAvailable()
      }
      // update mode: latest row per key wins (n_seen is monotone)
      val streamed = spark.table("qsketch").collect()
        .map(r => (r.getString(0), (r.getLong(1), r.getSeq[Long](2))))
        .groupBy(_._1).view.mapValues(_.map(_._2).maxBy(_._1)).toMap
      val batch = SparkEntry.queries("agg_quantile_sketch")(spark, Sf0001).collect()
        .map(r => (r.getString(0),
          (r.getLong(1), r.getDouble(2), r.getDouble(3), r.getDouble(4)))).toMap
      assert(streamed.keySet == batch.keySet)
      val w = Aggregations.QuantileSketchWidth
      streamed.foreach { case (et, (n, bins)) =>
        val (bn, p50, p90, p99) = batch(et)
        assert(n == bn, s"$et: n_seen $n != batch n_rows $bn")
        // the same integer cross-multiplication read the batch plan uses:
        // first bin whose cumulative count reaches ceil(pct·n/100)
        def est(pct: Int): Double = {
          var cum = 0L
          val hit = bins.zipWithIndex.find { case (c, _) =>
            cum += c; cum * 100 >= n * pct }.get._2
          (hit + 1.0) * w
        }
        assert(est(50) == p50 && est(90) == p90 && est(99) == p99,
          s"$et: streamed (${est(50)},${est(90)},${est(99)}) != batch ($p50,$p90,$p99)")
      }
    } finally q.stop()
  }

  test("streaming KMV sketches converge to the batch per-day bottom-k under shuffled arrival") {
    import spark.implicits._
    // id-shuffled arrival across 4 micro-batches: bottom-k of a distinct
    // set is commutative and idempotent (insert-if-smaller; duplicate
    // hashes no-op), so the final per-day sets must equal the batch
    // sketch frame's EXACTLY — the continuous-writer contract of the
    // persisted KmvStore
    val evs = Tables.events(spark, Sf0001).where(col("user_id").isNotNull)
      .select("event_id", "ts", "user_id", "event_type", "value").collect()
      .map(r => Streaming.EvtRow(r.getLong(0),
        Timestamp.valueOf(r.getAs[java.time.LocalDateTime](1)),
        r.getLong(2), r.getString(3), r.getDouble(4)))
      .sortBy(e => e.event_id % 13)
    val input = MemoryStream[Streaming.EvtRow]
    val q = Streaming.kmvSketchStream(input.toDS())
      .writeStream.format("memory").queryName("kmvsk").outputMode("update").start()
    try {
      evs.grouped(math.max(1, evs.length / 4)).foreach { b =>
        input.addData(b.toSeq); q.processAllAvailable()
      }
      // update mode: latest row per day wins (k_rows is monotone)
      val streamed = spark.table("kmvsk").collect()
        .map(r => (r.getString(0), (r.getLong(1), r.getSeq[Long](3).toSet)))
        .groupBy(_._1).view.mapValues(_.map(_._2).maxBy(_._1)).toMap
    // batch truth: the same frame KmvStore persists and agg_kmv_overlap reads
      val batch = Aggregations.kmvSketchFrame(spark, Sf0001).collect()
        .map(r => (r.getDate(0).toString, r.getLong(1)))
        .groupBy(_._1).view.mapValues(_.map(_._2).toSet).toMap
      assert(streamed.keySet == batch.keySet,
        s"day drift: ${streamed.keySet -- batch.keySet} / ${batch.keySet -- streamed.keySet}")
      streamed.foreach { case (t, (n, hs)) =>
        assert(hs == batch(t), s"$t sketch drift: " +
          s"${(hs -- batch(t)).take(3)} / ${(batch(t) -- hs).take(3)}")
        assert(n == hs.size.toLong)
      }
      // non-vacuity: at least one day must be in the TRIM regime at some
      // point only if the fixture exceeds k — record either way: sizes
      // are bounded by KmvK always
      assert(streamed.values.forall(_._2.size <= Aggregations.KmvK))
    } finally q.stop()
  }

  test("score-at-ingest surprisal equals the batch scorer; unseen words take the UNK cost") {
    import spark.implicits._
    // the frozen-reference-model contract: scoring the reference corpus
    // itself through the stream must reproduce text_lm_surprisal exactly
    // (same counts, same fixed-point kernel; the coalesce-to-1 never
    // fires), and a genuinely novel doc must score the open-vocabulary
    // cost log2u(N) per token instead of erroring
    val docs = Tables.documents(spark, Sf0001).select("doc_id", "text").collect()
      .map(r => (r.getLong(0), r.getString(1)))
      .sortBy(t => (t._1 * 2654435761L) % 1000003L)
    val novelId = 999999L
    val input = MemoryStream[(Long, String)]
    val q = Streaming.surprisalStream(spark, Sf0001,
        input.toDS().toDF("doc_id", "text"))
      .writeStream.format("memory").queryName("surpstream").outputMode("update").start()
    try {
      docs.grouped(math.max(1, docs.length / 4)).foreach { b =>
        input.addData(b.toSeq); q.processAllAvailable()
      }
      input.addData(Seq((novelId, "zzzzz qqqqq wwwww"))); q.processAllAvailable()
      val streamed = spark.table("surpstream").collect()
        .map(r => (r.getLong(0), (r.getLong(1), r.getLong(2), r.getBoolean(3))))
        .groupBy(_._1).view.mapValues(_.map(_._2).maxBy(_._1)).toMap
      val batch = SparkEntry.queries("text_lm_surprisal")(spark, Sf0001).collect()
        .map(r => (r.getLong(0), (r.getLong(1), r.getLong(2), r.getBoolean(3)))).toMap
      assert((streamed - novelId) == batch,
        s"stream-batch drift on the reference corpus: " +
          s"${(streamed - novelId).toSet.diff(batch.toSet).take(3)}")
      // novel doc: every token unseen -> per-token surprisal log2u(N)
      val nTot = docs.map(_._2.split(" ").length.toLong).sum
      val expSm = TestSpark.log2MicroRef(nTot) / 1000L
      val (nt, sm, fl) = streamed(novelId)
      assert(nt == 3L && sm == expSm && fl == (sm >= TextOps.LmSurprisalFlagMilli),
        s"novel doc scored ($nt, $sm, $fl), expected (3, $expSm)")
    } finally q.stop()
  }
}
