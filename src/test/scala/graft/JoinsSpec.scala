package graft

import org.scalatest.funsuite.AnyFunSuite
import org.apache.spark.sql.functions._
import TestSpark.{spark, Sf0001}

class JoinsSpec extends AnyFunSuite {
  private def q(name: String) = SparkEntry.queries(name)(spark, Sf0001)

  test("semi + anti partition the customer table") {
    val semi = q("join_semi").count()
    val anti = q("join_anti").count()
    val all  = Tables.customer(spark, Sf0001).count()
    assert(semi + anti == all)
  }

  test("inner broadcast join uses BroadcastHashJoin") {
    val plan = q("join_inner_broadcast").queryExecution.executedPlan.toString
    assert(plan.contains("BroadcastHashJoin"), s"expected broadcast join:\n$plan")
  }

  test("multiway star revenue is positive for all 5 regions") {
    val rows = q("join_multiway_star").collect()
    assert(rows.length == 5)
    rows.foreach(r => assert(r.getDouble(1) > 0 && r.getLong(2) > 0))
  }

  test("as-of join matches a per-event brute force") {
    val out = q("join_asof").collect()
      .map(r => r.getLong(0) -> (r.getLong(1), r.getAs[java.time.LocalDateTime](2))).toMap
    val orders = Tables.orders(spark, Sf0001)
      .select("o_custkey", "o_orderkey", "o_orderdate").collect()
      .map(r => (r.getLong(0), r.getLong(1), r.getAs[java.time.LocalDateTime](2)))
    val events = Tables.events(spark, Sf0001)
      .select("event_id", "user_id", "ts").limit(50).collect()
      .map(r => (r.getLong(0), r.getLong(1), r.getAs[java.time.LocalDateTime](2)))
    events.foreach { case (eid, uid, ts) =>
      val cands = orders.filter(o => o._1 == uid && !o._3.isAfter(ts))
      if (cands.isEmpty) assert(!out.contains(eid))
      else {
        val best = cands.maxBy(o => (o._3.toString, o._2)) // date then key
        assert(out(eid) == ((best._2, best._3)), s"event $eid")
      }
    }
  }

  test("theta-range pairs satisfy the 1h window") {
    val pairs = q("join_theta_range").collect().map(r => (r.getLong(0), r.getLong(1)))
    val ev = Tables.events(spark, Sf0001)
      .select("event_id", "user_id", "ts", "event_type").collect()
      .map(r => r.getLong(0) -> (r.getLong(1), r.getAs[java.time.LocalDateTime](2), r.getString(3))).toMap
    pairs.foreach { case (sid, pid) =>
      val (su, sts, st) = ev(sid); val (pu, pts, pt) = ev(pid)
      assert(su == pu && st == "signup" && pt == "purchase")
      assert(pts.isAfter(sts) && !pts.isAfter(sts.plusHours(1)))
    }
  }

  test("full outer covers every nation present on either side") {
    val rows = q("join_full_outer").collect()
    val nations = rows.map(_.getInt(0)).toSet
    val custN = Tables.customer(spark, Sf0001).select("c_nationkey").distinct()
      .collect().map(_.getInt(0)).toSet
    val suppN = Tables.supplier(spark, Sf0001).select("s_nationkey").distinct()
      .collect().map(_.getInt(0)).toSet
    assert(nations == (custN | suppN))
  }

  test("nearest as-of equals a brute-force per-event scan, both directions win") {
    val got = q("join_asof_nearest").collect()
      .map(r => r.getLong(0) -> r.getLong(1)).toMap
    def us(t: java.time.LocalDateTime) =
      t.toEpochSecond(java.time.ZoneOffset.UTC) * 1000000L + t.getNano / 1000L
    val all = Tables.events(spark, Sf0001)
      .select("event_id", "user_id", "ts", "event_type").collect()
      .map(r => (r.getLong(0), r.getLong(1),
        us(r.getAs[java.time.LocalDateTime](2)), r.getString(3)))
    val refs = all.filter(_._4 == "purchase").groupBy(_._2)
    var backWins = 0; var fwdWins = 0
    val expected = all.filter(_._4 == "error").flatMap { case (eid, uid, ts, _) =>
      refs.get(uid).map { ps =>
        val best = ps.minBy { case (pid, _, pts, _) =>
          (math.abs(ts - pts), pts, pid) }
        if (best._3 <= ts) backWins += 1 else fwdWins += 1
        eid -> best._1
      }
    }.toMap
    assert(got == expected)
    assert(backWins > 0 && fwdWins > 0,
      s"one direction never wins (back=$backWins fwd=$fwdWins) — test is weak")
  }

  test("interval overlap join equals a brute-force overlap scan") {
    val got = q("join_interval_overlap").collect()
      .map(r => (r.getLong(0), r.getLong(1))).toMap
    import Joins.{IoMul, IoDomain, IoASpan, IoBSpan, IoW}
    val windows = Tables.supplier(spark, Sf0001).select("s_suppkey")
      .collect().map(_.getLong(0))
      .map(k => k -> ((k * IoMul) % IoDomain, (k * IoMul) % IoDomain + IoASpan)).toMap
    val epoch = java.time.LocalDate.of(1995, 1, 1).toEpochDay
    val weeks = Tables.orders(spark, Sf0001).select("o_orderkey", "o_orderdate")
      .collect().map { r =>
        val lo = r.getAs[java.time.LocalDateTime](1).toLocalDate.toEpochDay - epoch
        (lo, lo + IoBSpan)
      }
    val expected = windows.map { case (k, (aLo, aHi)) =>
      k -> weeks.count { case (bLo, bHi) => aLo <= bHi && bLo <= aHi }.toLong
    }.filter(_._2 > 0)
    assert(got == expected)
    // the dedup path must actually bite: some window spans two grid cells
    assert(windows.values.exists { case (lo, hi) => lo / IoW != hi / IoW })
  }

  test("bloom prefilter never drops a matching row and actually prunes") {
    // the bloom's no-false-negative contract: every lineitem whose order
    // qualifies must survive might_contain
    import org.apache.spark.sql.graft.VectorOps.{bloom_agg, bloom_might_contain}
    val hv = Tables.orders(spark, Sf0001).where(col("o_totalprice") > 400000.0)
    val bloom = hv.agg(bloom_agg(col("o_orderkey"), 4000L, 65536L).as("bf"))
    val li = Tables.lineitem(spark, Sf0001)
    val total = li.count()
    val survivors = li
      .where(bloom_might_contain(bloom, col("l_orderkey"))).count()
    val trueMatches = li.join(hv, col("l_orderkey") === col("o_orderkey")).count()
    assert(survivors >= trueMatches, "bloom dropped a matching row")
    assert(survivors < total, "bloom pruned nothing — prefilter is a no-op")
    // and the registered query equals the plain join it optimizes
    val got = q("join_bloom_prefilter").collect()
      .map(r => (r.getDate(0).toString, r.getLong(1), r.getDouble(2))).toSeq
    val plain = li.join(hv, col("l_orderkey") === col("o_orderkey"))
      .groupBy(to_date(date_trunc("month", col("o_orderdate"))).as("mo"))
      .agg(count(lit(1)).as("n_items"),
        sum(Det.dec(col("l_extendedprice"), 18, 4)
          * (lit(1) - Det.dec(col("l_discount"), 18, 4)))
          .cast("double").as("revenue"))
      .orderBy("mo").collect()
      .map(r => (r.getDate(0).toString, r.getLong(1), r.getDouble(2))).toSeq
    assert(got == plain)
  }

  test("join_pit_scd2: each fact matches at most one version, never a future one") {
    val rows = q("join_pit_scd2").collect()
    // half-open validity windows partition the timeline per user — a fact
    // can never land in two versions
    val ids = rows.map(_.getLong(0))
    assert(ids.distinct.length == ids.length,
      s"a purchase matched multiple dim versions: ${ids.diff(ids.distinct).take(5).toSeq}")
    // point-in-time correctness = no leakage: the matched version opened
    // at or before the fact's timestamp (ts is TIMESTAMP_NTZ → LocalDateTime)
    import java.time.LocalDateTime
    val facts = Tables.events(spark, Sf0001)
      .where(col("event_type") === "purchase")
      .select(col("event_id"), col("ts")).collect()
      .map(r => r.getLong(0) -> r.getAs[LocalDateTime](1)).toMap
    rows.foreach { r =>
      assert(!r.getAs[LocalDateTime](2).isAfter(facts(r.getLong(0))),
        s"event ${r.getLong(0)} matched a version from the future")
    }
    // and the match IS the latest version at or before ts (asof agreement)
    val dim = Tables.events(spark, Sf0001)
      .where(col("event_type") === "signup")
      .select(col("user_id"), col("ts"), col("event_id")).collect()
      .map(r => (if (r.isNullAt(0)) None else Some(r.getLong(0)),
        r.getAs[LocalDateTime](1), r.getLong(2)))
    val factRows = Tables.events(spark, Sf0001)
      .where(col("event_type") === "purchase")
      .select(col("event_id"), col("user_id"), col("ts")).collect()
    val expected = factRows.flatMap { f =>
      if (f.isNullAt(1)) None
      else {
        val u = f.getLong(1); val ts = f.getAs[LocalDateTime](2)
        val versions = dim.filter(v => v._1.contains(u) && !v._2.isAfter(ts))
        implicit val ldtOrd: Ordering[LocalDateTime] =
          Ordering.fromLessThan(_.isBefore(_))
        if (versions.isEmpty) None
        else Some(f.getLong(0) -> versions.maxBy(v => (v._2, v._3))._3)
      }
    }.toMap
    val got = rows.map(r => r.getLong(0) -> r.getLong(1)).toMap
    assert(got == expected,
      s"PIT != latest-at-ts on ${(got.toSet -- expected.toSet).take(5)}")
  }

  test("join_asof_left keeps every fact; matches equal the inner tolerance variant") {
    // Full-row pin (ADVICE r8): compare (asof_orderkey, asof_date) — an
    // asof_date drift between the variants must fail HERE, not only at the
    // external DuckDB hash gate.
    val left = q("join_asof_left").collect()
      .map(r => r.getLong(0) ->
        (if (r.isNullAt(1)) None else Some((r.getLong(1), r.get(2)))))
      .toMap
    // LEFT contract: one output row per event, matched or not
    assert(left.size == Tables.events(spark, Sf0001).count())
    // the non-NULL rows are exactly the inner tolerance variant's matches
    val inner = q("join_asof_tolerance").collect()
      .map(r => r.getLong(0) -> ((r.getLong(1), r.get(2)))).toMap
    val matched = left.collect { case (k, Some(v)) => k -> v }
    assert(matched == inner,
      s"left/inner drift: ${(matched.toSet -- inner.toSet).take(3)} / ${(inner.toSet -- matched.toSet).take(3)}")
    // and the NULL path is actually exercised on this fixture
    assert(left.values.exists(_.isEmpty),
      "no NULL-feature rows — the staleness bound stopped discriminating")
  }

  test("q17: fixture quantities are integral (the avg-determinism precondition)") {
    // tpch_q17_like's cross-engine exactness rests on avg(l_quantity) being
    // exact-sum/count: integral doubles sum exactly in any order below 2^53.
    // Pin the precondition so a fixture change fails HERE with a message,
    // not at the external hash gate.
    val nonIntegral = Tables.lineitem(spark, Sf0001)
      .where(col("l_quantity") =!= floor(col("l_quantity"))).count()
    assert(nonIntegral == 0, s"$nonIntegral non-integral quantities break q17's avg determinism")
  }

  test("q17 correlated scalar equals a driver-side brute force") {
    val perPartAvg = Tables.lineitem(spark, Sf0001)
      .groupBy("l_partkey").agg(avg("l_quantity").as("a")).collect()
      .map(r => r.getLong(0) -> r.getDouble(1)).toMap
    val partBrand = Tables.part(spark, Sf0001).select("p_partkey", "p_brand")
      .collect().map(r => r.getLong(0) -> r.getString(1)).toMap
    val expected = Tables.lineitem(spark, Sf0001)
      .select("l_partkey", "l_quantity").collect()
      .map(r => (r.getLong(0), r.getDouble(1)))
      .filter { case (pk, qty) => qty < 0.2 * perPartAvg(pk) }
      .groupBy { case (pk, _) => partBrand(pk) }
      .view.mapValues(_.size.toLong).toMap
    val got = q("tpch_q17_like").collect()
      .map(r => r.getString(0) -> r.getLong(1)).toMap
    assert(got == expected, s"q17 drift: got=$got expected=$expected")
  }

  test("q20: every reported supplier has a qualifying line; every omitted has none") {
    val reported = q("tpch_q20_like").collect().map(_.getLong(0)).toSet
    val perPartAvg = Tables.lineitem(spark, Sf0001)
      .groupBy("l_partkey").agg(avg("l_quantity").as("a")).collect()
      .map(r => r.getLong(0) -> r.getDouble(1)).toMap
    val qualifying = Tables.lineitem(spark, Sf0001)
      .select("l_suppkey", "l_partkey", "l_quantity", "l_returnflag", "l_discount")
      .collect()
      .filter(r => r.getString(3) == "R" && r.getDouble(4) >= 0.10 &&
        r.getDouble(2) > 1.8 * perPartAvg(r.getLong(1)))
      .map(_.getLong(0)).toSet
    assert(reported == qualifying, s"q20 drift: ${reported -- qualifying} / ${qualifying -- reported}")
    val all = Tables.supplier(spark, Sf0001).count()
    assert(reported.nonEmpty && reported.size < all,
      s"q20 threshold stopped discriminating: ${reported.size}/$all")
  }

  test("q22: anti-join excludes exactly the customers with a big open order") {
    val rows = q("tpch_q22_like").collect()
    assert(rows.nonEmpty)
    // reconstruct the kept set from the grouped output via a direct re-query
    val keptCount = rows.map(_.getLong(1)).sum
    val cust = Tables.customer(spark, Sf0001)
      .select("c_custkey", "c_acctbal").collect()
      .map(r => r.getLong(0) -> BigDecimal(r.getDouble(1)).setScale(2, BigDecimal.RoundingMode.HALF_UP))
    val positives = cust.map(_._2).filter(_ > 0)
    val (sumBal, n) = (positives.sum, positives.size)
    val bigOpen = Tables.orders(spark, Sf0001)
      .where(col("o_orderstatus") === "O" && col("o_totalprice") > 200000)
      .select("o_custkey").collect().map(_.getLong(0)).toSet
    val expected = cust.count { case (ck, bal) => bal * n > sumBal && !bigOpen(ck) }
    assert(keptCount == expected, s"q22 kept $keptCount, brute force says $expected")
  }

  test("q21: EXISTS/NOT-EXISTS with <> correlation equals a driver-side brute force, both non-vacuous") {
    val fOrders = Tables.orders(spark, Sf0001)
      .where(col("o_orderstatus") === "F")
      .select("o_orderkey").collect().map(_.getLong(0)).toSet
    val lines = Tables.lineitem(spark, Sf0001)
      .select("l_orderkey", "l_suppkey", "l_returnflag").collect()
      .map(r => (r.getLong(0), r.getLong(1), r.getString(2)))
    val byOrder = lines.groupBy(_._1)
    val supName = Tables.supplier(spark, Sf0001).select("s_suppkey", "s_name")
      .collect().map(r => r.getLong(0) -> r.getString(1)).toMap
    val base = lines.filter { case (ok, _, rf) => rf == "R" && fOrders(ok) }
    val afterExists = base.filter { case (ok, sk, _) =>
      byOrder(ok).exists(_._2 != sk) }
    val survivors = afterExists.filter { case (ok, sk, _) =>
      !byOrder(ok).exists(l => l._2 != sk && l._3 == "R") }
    // both quantifiers must do real work on this fixture
    assert(afterExists.length < base.length, "EXISTS stopped discriminating (no single-supplier orders)")
    assert(survivors.length < afterExists.length && survivors.nonEmpty,
      s"NOT EXISTS stopped discriminating: ${survivors.length}/${afterExists.length}")
    val expected = survivors.groupBy(l => supName(l._2))
      .view.mapValues(_.length.toLong).toMap
    val rows = q("tpch_q21_like").collect()
    val got = rows.map(r => r.getString(0) -> r.getLong(1)).toMap
    assert(got == expected, s"q21 drift: got=$got expected=$expected")
    // output contract: (numwait DESC, s_name ASC) total order
    val order = rows.map(r => (-r.getLong(1), r.getString(0)))
    assert(order.sameElements(order.sorted), "q21 output order violated")
  }

  test("q18: IN-over-grouped-HAVING equals a driver-side brute force, threshold discriminates") {
    val qtyByOrder = Tables.lineitem(spark, Sf0001)
      .select("l_orderkey", "l_quantity").collect()
      .map(r => (r.getLong(0), r.getDouble(1)))
      .groupBy(_._1).view.mapValues(_.map(_._2).sum).toMap
    val bigOrders = qtyByOrder.filter(_._2 > 200).keySet
    assert(bigOrders.nonEmpty && bigOrders.size < qtyByOrder.size,
      s"q18 threshold stopped discriminating: ${bigOrders.size}/${qtyByOrder.size}")
    val custOf = Tables.orders(spark, Sf0001).select("o_orderkey", "o_custkey")
      .collect().map(r => r.getLong(0) -> r.getLong(1)).toMap
    val expected = bigOrders.toSeq
      .map(ok => (custOf(ok), ok, qtyByOrder(ok).toLong))
      .sortBy { case (_, ok, sq) => (-sq, ok) }.take(100)
      .map { case (ck, ok, sq) => (ck, ok, sq) }.toSet
    val got = q("tpch_q18_like").collect()
      .map(r => (r.getLong(0), r.getLong(1), r.getLong(2))).toSet
    assert(got == expected, s"q18 drift: extra=${got -- expected} missing=${expected -- got}")
  }

  test("q15: reported suppliers are exactly the exact-decimal revenue argmax") {
    def d4(x: Double) = BigDecimal(x).setScale(4, BigDecimal.RoundingMode.HALF_UP)
    val rev = Tables.lineitem(spark, Sf0001)
      .where(col("l_returnflag") === "N")
      .select("l_suppkey", "l_extendedprice", "l_discount").collect()
      .map(r => (r.getLong(0), d4(r.getDouble(1)) * (1 - d4(r.getDouble(2)))))
      .groupBy(_._1).view.mapValues(_.map(_._2).sum).toMap
    val mx = rev.values.max
    val expected = rev.filter(_._2 == mx).keySet
    val got = q("tpch_q15_like").collect().map(_.getLong(0)).toSet
    assert(got == expected, s"q15 drift: got=$got expected=$expected")
    assert(got.nonEmpty && got.size < rev.size, "q15 argmax stopped discriminating")
  }

  test("q11: 1.2x-average part-value screen equals an integer-micros brute force") {
    def d4(x: Double) = BigDecimal(x).setScale(4, BigDecimal.RoundingMode.HALF_UP)
    val vals = Tables.lineitem(spark, Sf0001)
      .select("l_partkey", "l_extendedprice").collect()
      .map(r => (r.getLong(0), d4(r.getDouble(1))))
      .groupBy(_._1).view.mapValues(_.map(_._2).sum).toMap
    val totalMic = (vals.values.sum * 10000).toBigInt
    val n = vals.size
    val expected = vals.filter { case (_, v) =>
      (v * 10000).toBigInt * n * 10 > totalMic * 12 }.keySet
    val got = q("tpch_q11_like").collect().map(_.getLong(0)).toSet
    assert(got == expected, s"q11 drift: extra=${got -- expected} missing=${expected -- got}")
    assert(got.nonEmpty && got.size < n,
      s"q11 threshold stopped discriminating: ${got.size}/$n")
  }

  test("q16: NOT IN blacklist equals a brute force and actually excludes suppliers") {
    val blacklist = Tables.supplier(spark, Sf0001)
      .where(col("s_acctbal") < 1000).select("s_suppkey")
      .collect().map(_.getLong(0)).toSet
    assert(blacklist.nonEmpty, "blacklist empty at sf0.001 — threshold went vacuous")
    val brandOf = Tables.part(spark, Sf0001).select("p_partkey", "p_brand")
      .collect().map(r => r.getLong(0) -> r.getString(1)).toMap
    val li = Tables.lineitem(spark, Sf0001).select("l_partkey", "l_suppkey")
      .collect().map(r => (brandOf(r.getLong(0)), r.getLong(1)))
    // the exclusion must do real work on this fixture
    assert(li.exists { case (_, sk) => blacklist(sk) },
      "blacklisted suppliers never appear in lineitem — NOT IN untested")
    val expected = li.filterNot { case (_, sk) => blacklist(sk) }
      .groupBy(_._1).view.mapValues(_.map(_._2).distinct.length.toLong).toMap
    val got = q("tpch_q16_like").collect()
      .map(r => r.getString(0) -> r.getLong(1)).toMap
    assert(got == expected, s"q16 drift: got=$got expected=$expected")
  }
}
