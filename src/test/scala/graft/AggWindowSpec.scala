package graft

import org.scalatest.funsuite.AnyFunSuite
import org.apache.spark.sql.functions._
import TestSpark.{spark, Sf0001, Sf01}

class AggWindowSpec extends AnyFunSuite {
  private def q(name: String) = SparkEntry.queries(name)(spark, Sf0001)

  test("window_drawdown equals a JVM running-peak scan and the fixture draws down") {
    val orders = Tables.orders(spark, Sf0001)
      .select(col("o_custkey"), col("o_orderkey"), col("o_orderdate"),
        (Det.dec(col("o_totalprice"), 18, 2) * 100)
          .cast(org.apache.spark.sql.types.LongType).as("v"))
      .collect()
      .map(r => (r.getLong(0), r.getLong(1),
        r.getAs[java.time.LocalDateTime](2), r.getLong(3)))
    implicit val ldtOrd: Ordering[java.time.LocalDateTime] =
      Ordering.fromLessThan(_.isBefore(_))
    val exp = orders.groupBy(_._1).view.mapValues { os =>
      val seq = os.sortBy(o => (o._3, o._2)).map(_._4)
      val peaks = seq.scanLeft(Long.MinValue)(math.max).drop(1)
      (seq.length.toLong, peaks.max, peaks.zip(seq).map(p => p._1 - p._2).max)
    }.toMap
    val got = q("window_drawdown").collect()
      .map(r => r.getLong(0) -> ((r.getLong(1), r.getLong(2), r.getLong(3)))).toMap
    assert(got == exp, s"drawdown mismatch, e.g. ${(got.toSet -- exp.toSet).take(3)}")
    // non-vacuity: some customer's order values actually fall from a peak
    assert(got.values.exists(_._3 > 0L), "no drawdown anywhere — vacuous")
    // both regimes exist on the fixture (2 of 150 customers never draw
    // down — measured in DuckDB), and a current-row-inclusive peak can
    // never sit below the value it includes
    assert(got.values.exists(_._3 == 0L) && got.values.forall(_._3 >= 0L))
  }

  test("kmv overlap: exact regime equals truth; estimates within KMV error at sf0.1") {
    def trueSets(sf: String): Map[java.sql.Date, Set[Long]] =
      Tables.events(spark, sf)
        .where(col("user_id").isNotNull)
        .select(to_date(col("ts")).as("d"), col("user_id")).distinct()
        .collect().groupBy(_.getDate(0)).view
        .mapValues(_.map(_.getLong(1)).toSet).toMap
    // exact regime (sf0.001 daily cohorts <= 15 users << k): every output
    // column must equal the brute-force truth, estimates included
    val t0 = trueSets(Sf0001)
    val got0 = q("agg_kmv_overlap").collect()
      .map(r => (r.getDate(0), r.getDate(1)) ->
        ((r.getLong(2), r.getLong(3), r.getLong(4), r.getLong(5), r.getLong(6)))).toMap
    assert(got0.nonEmpty)
    got0.foreach { case ((a, b), (uSize, kInter, uEst, jacc, iEst)) =>
      val (sa, sb) = (t0(a), t0(b))
      // hash collisions inside a 15-user cohort at M=1e12 are impossible
      // to observe; sizes are exact
      val (tu, ti) = ((sa | sb).size.toLong, (sa & sb).size.toLong)
      assert(uSize == tu && kInter == ti && uEst == tu, s"($a,$b) exact regime broken")
      assert(jacc == ti * 1000000L / tu && iEst == jacc * tu / 1000000L)
    }
    // estimation regime (sf0.1: ~1330 users/day > k): union within 10%
    // (KMV std err ~ 1/sqrt(k) ~ 6%), jaccard within 0.12, and the
    // overlap is non-trivially partial (the reason cohorts are days)
    val t1 = trueSets(Sf01)
    val got1 = SparkEntry.queries("agg_kmv_overlap")(spark, Sf01).collect()
      .map(r => (r.getDate(0), r.getDate(1)) ->
        ((r.getLong(2), r.getLong(4), r.getLong(5)))).toMap
    var partial = 0
    got1.foreach { case ((a, b), (uSize, uEst, jacc)) =>
      assert(uSize == Aggregations.KmvK, s"($a,$b) estimation regime not engaged")
      val (sa, sb) = (t1(a), t1(b))
      val tu = (sa | sb).size.toDouble
      val tj = (sa & sb).size.toDouble / tu
      assert(math.abs(uEst - tu) / tu <= 0.10, s"($a,$b) union $uEst vs $tu")
      assert(math.abs(jacc / 1e6 - tj) <= 0.12, s"($a,$b) jacc $jacc vs $tj")
      if (jacc > 0L && jacc < 1000000L) partial += 1
    }
    assert(partial > 0, "no pair has partial overlap — contract vacuous")
  }

  test("exact-decimal moment stats agree with Spark's built-in corr/covar/stddev") {
    import org.apache.spark.sql.functions._
    val got = q("agg_corr_stats").collect()
      .map(r => r.getString(0) -> ((r.getDouble(2), r.getDouble(3), r.getDouble(4)))).toMap
    val ref = Tables.lineitem(spark, Sf0001).groupBy("l_returnflag")
      .agg(covar_pop(col("l_quantity"), col("l_extendedprice")).as("cv"),
        corr(col("l_quantity"), col("l_extendedprice")).as("cr"),
        stddev_pop(col("l_quantity")).as("sd"))
      .collect()
      .map(r => r.getString(0) -> ((r.getDouble(1), r.getDouble(2), r.getDouble(3)))).toMap
    ref.foreach { case (k, (cv, cr, sd)) =>
      def close(a: Double, b: Double) = math.abs(a - b) <= 1e-9 * math.max(1.0, math.abs(b))
      assert(close(got(k)._1, cv), s"$k covar ${got(k)._1} vs $cv")
      assert(close(got(k)._2, cr), s"$k corr ${got(k)._2} vs $cr")
      assert(close(got(k)._3, sd), s"$k stddev ${got(k)._3} vs $sd")
    }
  }

  test("exact-moment linear fit agrees with Spark's built-in regr_slope/regr_intercept") {
    import org.apache.spark.sql.functions._
    val got = q("agg_linear_fit").collect()
      .map(r => r.getString(0) -> ((r.getDouble(2), r.getDouble(3)))).toMap
    val ref = Tables.lineitem(spark, Sf0001).groupBy("l_returnflag")
      .agg(regr_slope(col("l_extendedprice"), col("l_quantity")).as("m"),
        regr_intercept(col("l_extendedprice"), col("l_quantity")).as("b"))
      .collect().map(r => r.getString(0) -> ((r.getDouble(1), r.getDouble(2)))).toMap
    ref.foreach { case (k, (m, b)) =>
      def close(a: Double, x: Double) = math.abs(a - x) <= 1e-9 * math.max(1.0, math.abs(x))
      assert(close(got(k)._1, m), s"$k slope ${got(k)._1} vs $m")
      assert(close(got(k)._2, b), s"$k intercept ${got(k)._2} vs $b")
    }
  }

  test("count-min estimates bound the exact counts (one-sided error)") {
    // CM guarantees est >= true always, and est <= true + eps*N w.h.p.
    // (eps = e/w ≈ 0.0106 at w=256); the fixture token stream is small
    // enough that the bound holds deterministically for the top keys
    val rows = q("agg_heavy_hitters").collect()
    assert(rows.length == 20)
    val n = Tables.documents(spark, Sf0001)
      .select(org.apache.spark.sql.functions.expr("size(split(text, ' '))").as("k"))
      .collect().map(_.getInt(0).toLong).sum
    rows.foreach { r =>
      val (truth, est) = (r.getLong(1), r.getLong(2))
      assert(est >= truth, s"${r.getString(0)}: CM underestimated ($est < $truth)")
      assert(est <= truth + (0.011 * n).toLong,
        s"${r.getString(0)}: est $est exceeds eps*N bound over $truth")
    }
    // determinism across runs
    assert(q("agg_heavy_hitters").collect().toSeq == rows.toSeq)
  }

  test("agg_global matches independent exact computation") {
    val r = q("agg_global").collect()(0)
    val li = Tables.lineitem(spark, Sf0001)
      .select("l_quantity").collect().map(_.getDouble(0).toLong)
    assert(r.getLong(0) == li.length)
    assert(r.getLong(1) == li.sum)
  }

  test("approx_count_distinct within 5% of exact") {
    // the registered key now ships (exact, within_5pct) — assert the
    // in-plan band holds AND re-measure the guarantee independently (the
    // r16 #4 convention: the flag must agree with a from-scratch check)
    val got = q("agg_approx_distinct").collect()
      .map(r => r.getString(0) -> ((r.getLong(1), r.getBoolean(2)))).toMap
    val approx = Tables.events(spark, Sf0001)
      .groupBy("event_type")
      .agg(approx_count_distinct(col("user_id"), 0.02).as("a"))
      .collect().map(r => r.getString(0) -> r.getLong(1)).toMap
    val exact = Tables.events(spark, Sf0001)
      .groupBy("event_type").agg(countDistinct(col("user_id")).as("n"))
      .collect().map(r => r.getString(0) -> r.getLong(1)).toMap
    exact.foreach { case (k, n) =>
      val (gn, inBand) = got(k)
      assert(gn == n, s"$k: exact_users $gn vs $n")
      assert(inBand, s"$k: sketch broke its 5% band")
      assert(math.abs(approx(k) - n) <= math.max(1, (n * 0.05).toLong), s"$k: ${approx(k)} vs $n")
    }
  }

  test("linear-counting sketch estimate within 5% of exact (sf0.1 load)") {
    // the registers themselves are driver-oracle-verified; this pins the
    // ESTIMATE the registers exist for: -m·ln(1 - occupied/m) vs exact.
    // sf0.1 (1500 distinct users/group against 4096 registers, load ~0.37)
    // exercises real collision pressure — at sf0.001 occupancy ≈ exact and
    // the test would trivially pass for a broken estimator.
    val m = Aggregations.DistinctSketchRegisters.toDouble
    val est = SparkEntry.queries("agg_distinct_sketch")(spark, Sf01).collect()
      .map(r => r.getString(0) -> -m * math.log1p(-r.getLong(2) / m)).toMap
    val exact = Tables.events(spark, Sf01)
      .groupBy("event_type").agg(countDistinct(col("user_id")).as("n"))
      .collect().map(r => r.getString(0) -> r.getLong(1)).toMap
    assert(est.keySet == exact.keySet)
    exact.foreach { case (k, n) =>
      assert(math.abs(est(k) - n) <= math.max(1.0, n * 0.05),
        f"$k: estimate ${est(k)}%.1f vs exact $n")
      // occupancy must show actual collisions at this load — otherwise the
      // hash family is suspiciously injective and the test proves nothing
      assert(est(k) >= n * 0.5, s"$k: degenerate occupancy")
    }
  }

  test("binned quantile sketch within one bin width of exact percentile (sf0.1 load)") {
    // the bin counts and the rank selection are driver-oracle-verified;
    // this pins the accuracy guarantee the bins exist for: the upper-edge
    // estimate brackets the true rank quantile within one bin width. The
    // interpolated exact percentile can sit up to a neighbor-gap below the
    // rank element, so the bound is [est - 2w, est].
    val w = Aggregations.QuantileSketchWidth.toDouble
    val est = SparkEntry.queries("agg_quantile_sketch")(spark, Sf01).collect()
      .map(r => r.getString(0) ->
        ((r.getLong(1), r.getDouble(2), r.getDouble(3), r.getDouble(4)))).toMap
    val exact = Tables.events(spark, Sf01).groupBy("event_type")
      .agg(count(lit(1)).as("n"),
        expr("percentile(value, 0.5)").as("p50"),
        expr("percentile(value, 0.9)").as("p90"),
        expr("percentile(value, 0.99)").as("p99"))
      .collect()
      .map(r => r.getString(0) ->
        ((r.getLong(1), r.getDouble(2), r.getDouble(3), r.getDouble(4)))).toMap
    assert(est.keySet == exact.keySet)
    exact.foreach { case (k, (n, e50, e90, e99)) =>
      val (gn, g50, g90, g99) = est(k)
      assert(gn == n, s"$k: n_rows $gn vs $n")
      for (((g, e), p) <- Seq(g50 -> e50, g90 -> e90, g99 -> e99).zip(Seq(50, 90, 99))) {
        assert(e <= g && e >= g - 2 * w, f"$k p$p: exact $e%.2f outside (est $g%.1f - ${2 * w}, est]")
      }
      assert(g50 <= g90 && g90 <= g99, s"$k: non-monotone quantiles")
    }
  }

  test("approx_percentile within tolerance of exact percentile") {
    // registered key ships exact discrete percentiles + in-band flags;
    // assert the flags AND re-measure the sketch independently
    val got = q("agg_approx_quantile").collect()
      .map(r => r.getString(0) ->
        ((r.getDouble(1), r.getDouble(2), r.getBoolean(3), r.getBoolean(4)))).toMap
    val approx = Tables.events(spark, Sf0001)
      .groupBy("event_type")
      .agg(expr("approx_percentile(value, 0.5, 1000)").as("a50"))
      .collect().map(r => r.getString(0) -> r.getDouble(1)).toMap
    val exact = Tables.events(spark, Sf0001)
      .groupBy("event_type").agg(expr("percentile(value, 0.5)").as("p50"))
      .collect().map(r => r.getString(0) -> r.getDouble(1)).toMap
    exact.foreach { case (k, e) =>
      val (g50, g99, in50, in99) = got(k)
      assert(in50 && in99, s"$k: sketch broke its rank band ($in50, $in99)")
      assert(g50 <= g99, s"$k: non-monotone discrete percentiles")
      assert(math.abs(g50 - e) <= math.max(1.0, e * 0.1),
        s"$k: discrete p50 $g50 far from interpolated $e")
      assert(math.abs(approx(k) - e) <= math.max(1.0, e * 0.1), s"$k: ${approx(k)} vs $e")
    }
  }

  test("rollup contains per-nation, per-region subtotals and grand total") {
    val rows = q("agg_rollup").collect()
    val grand = rows.filter(r => r.getString(0) == "ALL" && r.getString(1) == "ALL")
    assert(grand.length == 1)
    assert(grand(0).getLong(2) == Tables.customer(spark, Sf0001).count())
    val regionSubtotals = rows.filter(r => r.getString(0) != "ALL" && r.getString(1) == "ALL")
    assert(regionSubtotals.map(_.getLong(2)).sum == grand(0).getLong(2))
  }

  test("histogram buckets partition all orders") {
    val rows = q("agg_histogram").collect()
    assert(rows.map(_.getLong(1)).sum == Tables.orders(spark, Sf0001).count())
  }

  test("running sum final value equals the customer total") {
    val rows = q("window_running_sum").collect()
      .groupBy(_.getLong(0)).view.mapValues(_.last.getDouble(3)).toMap
    val totals = Tables.orders(spark, Sf0001).groupBy("o_custkey")
      .agg(Det.dsum2(col("o_totalprice")).as("t")).collect()
      .map(r => r.getLong(0) -> r.getDouble(1)).toMap
    totals.foreach { case (ck, t) =>
      assert(rows(ck) == t, s"cust $ck: ${rows(ck)} vs $t") }
  }

  test("window_topk_per_group emits at most 3 per brand, rank-ordered") {
    val rows = q("window_topk_per_group").collect()
    rows.groupBy(_.getString(0)).foreach { case (_, rs) =>
      assert(rs.length <= 3)
      assert(rs.map(_.getInt(3)).sorted.sameElements(1 to rs.length))
      val prices = rs.sortBy(_.getInt(3)).map(_.getDouble(2))
      assert(prices.sliding(2).forall(p => p.length < 2 || p(0) >= p(1)))
    }
  }

  test("moving window covers at most 7 days") {
    val rows = q("window_moving_avg").collect()
    assert(rows.nonEmpty)
    // first row = its own day only; later rows aggregate up to 7 days
    assert(rows.map(_.getLong(2)).max <= Tables.events(spark, Sf0001).count())
  }

  test("chi-square statistic matches an independent contingency computation") {
    val row = q("agg_chi_square").collect().head
    val (gotN, gotDof, gotChi) = (row.getLong(0), row.getInt(1), row.getDouble(2))
    val cells = Tables.events(spark, Sf0001).where(col("user_id").isNotNull)
      .select("event_type", "user_id").collect()
      .map(r => (r.getString(0), r.getLong(1) % 2))
      .groupBy(identity).view.mapValues(_.length.toLong).toMap
    val types = Seq("click", "error", "purchase", "signup", "view")
    def o(t: String, c: Long) = cells.getOrElse((t, c), 0L).toDouble
    val n = types.map(t => o(t, 0) + o(t, 1)).sum
    val chi = (for (t <- types; c <- 0L to 1L) yield {
      val e = (o(t, 0) + o(t, 1)) * types.map(o(_, c)).sum / n
      (o(t, c) - e) * (o(t, c) - e) / e
    }).sum
    assert(gotN == n.toLong && gotDof == 4)
    assert(math.abs(gotChi - chi) <= 1e-9 * math.max(1.0, chi),
      s"chi2: $gotChi vs $chi")
  }

  test("welch t-statistic matches an independent two-pass computation") {
    val row = q("agg_ab_test").collect().head
    val (gotNa, gotNb) = (row.getLong(0), row.getLong(1))
    val (gotMa, gotMb, gotT) = (row.getDouble(2), row.getDouble(3), row.getDouble(4))
    val samples = Tables.events(spark, Sf0001)
      .where(col("event_type") === "purchase" && col("user_id").isNotNull)
      .select("user_id", "value").collect()
      .map(r => (r.getLong(0) % 2 == 0) -> r.getDouble(1))
    val a = samples.filter(_._1).map(_._2); val b = samples.filterNot(_._1).map(_._2)
    def meanVar(xs: Array[Double]) = {
      val m = xs.sum / xs.length
      (m, xs.map(x => (x - m) * (x - m)).sum / (xs.length - 1))
    }
    val (ma, va) = meanVar(a); val (mb, vb) = meanVar(b)
    val t = (ma - mb) / math.sqrt(va / a.length + vb / b.length)
    def close(x: Double, y: Double) = math.abs(x - y) <= 1e-9 * math.max(1.0, math.abs(y))
    assert(gotNa == a.length && gotNb == b.length)
    assert(close(gotMa, ma) && close(gotMb, mb), s"means: $gotMa/$gotMb vs $ma/$mb")
    assert(close(gotT, t), s"t: $gotT vs $t")
    assert(a.nonEmpty && b.nonEmpty, "a cohort is empty — test is vacuous")
  }

  test("mann-whitney U matches a brute-force midrank computation and complements") {
    val row = q("agg_mann_whitney").collect().head
    val (u0, u1, n0, n1) = (row.getLong(0), row.getLong(1), row.getLong(2), row.getLong(3))
    val ev = Tables.events(spark, Sf0001)
      .where(col("user_id").isNotNull && col("value").isNotNull)
      .select("value", "user_id").collect()
      .map(r => (r.getDouble(0), r.getLong(1) % 2))
    // brute-force ×2 midranks over the pooled sample
    val rank2 = ev.map(_._1).sorted.zipWithIndex
      .groupBy(_._1).map { case (v, xs) =>
        v -> (2L * (xs.map(_._2).min + 1) + xs.length - 1) }
    val bn0 = ev.count(_._2 == 0).toLong
    val r0 = ev.filter(_._2 == 0).map(e => rank2(e._1)).sum
    assert(n0 == bn0 && n1 == ev.length - bn0)
    assert(u0 == r0 - n0 * (n0 + 1), s"u0_x2: $u0 vs ${r0 - n0 * (n0 + 1)}")
    // the two U statistics always complement to n0*n1 (×2 here)
    assert(u0 + u1 == 2 * n0 * n1, s"complement broken: $u0 + $u1 != 2*$n0*$n1")
    assert(n0 > 0 && n1 > 0, "a cohort is empty — test is vacuous")
  }

  test("ks statistic matches a brute-force ECDF sweep") {
    val row = q("agg_ks_test").collect().head
    val (dNum, n0, n1) = (row.getLong(0), row.getLong(1), row.getLong(2))
    val ev = Tables.events(spark, Sf0001)
      .where(col("user_id").isNotNull && col("value").isNotNull)
      .select("value", "user_id").collect()
      .map(r => (r.getDouble(0), r.getLong(1) % 2))
    val v0 = ev.filter(_._2 == 0).map(_._1).sorted
    val v1 = ev.filter(_._2 != 0).map(_._1).sorted
    val expected = ev.map(_._1).distinct.map { x =>
      val c0 = v0.count(_ <= x).toLong; val c1 = v1.count(_ <= x).toLong
      math.abs(c0 * v1.length - c1 * v0.length)
    }.max
    assert(n0 == v0.length && n1 == v1.length)
    assert(dNum == expected, s"d_num: $dNum vs $expected")
    assert(dNum > 0 && dNum <= n0 * n1, "degenerate D — test is vacuous")
  }

  test("binned rank tests: structural bin bound, MW agreement, KS understates exact") {
    val Seq(u0b, u1b, n0b, n1b) = q("agg_mann_whitney_binned").collect().head
      .toSeq.map(_.asInstanceOf[Long])
    val Seq(u0e, u1e, n0e, n1e) = q("agg_mann_whitney").collect().head
      .toSeq.map(_.asInstanceOf[Long])
    // same cohorts, same complement invariant as the exact form
    assert(n0b == n0e && n1b == n1e)
    assert(u0b + u1b == 2 * n0b * n1b)
    // binning perturbs the normalized effect size by at most half the
    // same-bin cross-pair fraction (~1% on the fixture) — pin a 2% band
    val effB = u0b.toDouble / (2.0 * n0b * n1b)
    val effE = u0e.toDouble / (2.0 * n0e * n1e)
    assert(math.abs(effB - effE) < 0.02, s"effect drift: $effB vs $effE")
    val Seq(dB, kn0, kn1) = q("agg_ks_binned").collect().head
      .toSeq.map(_.asInstanceOf[Long])
    val Seq(dE, en0, en1) = q("agg_ks_test").collect().head
      .toSeq.map(_.asInstanceOf[Long])
    assert(kn0 == en0 && kn1 == en1)
    // the binned ECDF difference is the exact one sampled at bin
    // boundaries — a max over a subset, so it can only understate
    assert(dB <= dE, s"binned D $dB exceeds exact D $dE")
    assert(dB > 0, "degenerate binned D — test is vacuous")
    // the bound the binned variants exist for: the windowed key frame is
    // structurally ≤ 256 rows, while the exact variants' frame is not
    val ev = Tables.events(spark, Sf0001)
      .where(col("user_id").isNotNull && col("value").isNotNull)
    val nBins = ev.select(
      greatest(least(floor(col("value") / 4.0).cast("long"), lit(255L)), lit(0L)))
      .distinct().count()
    val nExact = ev.select("value").distinct().count()
    assert(nBins <= Aggregations.QuantileSketchBins)
    assert(nExact > Aggregations.QuantileSketchBins,
      s"fixture vocabulary $nExact no longer exceeds the bin count — vacuous")
  }

  test("ewma equals a JVM left fold over the time-ordered series, bit-exact") {
    import org.apache.spark.sql.types.TimestampType
    val got = q("window_ewma").collect()
      .map(r => (r.getLong(0), (r.getLong(1), r.getDouble(2)))).toMap
    val series = Tables.events(spark, Sf0001).where(col("user_id").isNotNull)
      .select(col("user_id"), unix_micros(col("ts").cast(TimestampType)),
        col("event_id"), col("value")).collect()
      .map(r => (r.getLong(0), r.getLong(1), r.getLong(2), r.getDouble(3)))
      .groupBy(_._1)
    series.foreach { case (uid, rows) =>
      val expected = rows.sortBy(e => (e._2, e._3)).map(_._4)
        .foldLeft(0.0)((acc, x) => acc * 0.5 + x * 0.5)
      val (n, ewma) = got(uid)
      assert(n == rows.length)
      // same IEEE op sequence on the JVM — equality is EXACT, not approx
      assert(ewma == expected, s"user $uid: $ewma vs $expected")
    }
    assert(got.keySet == series.keySet)
  }

  test("ntile buckets are balanced and rank fractions are monotone per user") {
    val rows = q("window_ntile_dist").collect()
      .map(r => (r.getLong(0), r.getLong(1), r.getDouble(2), r.getInt(3),
        r.getDouble(4), r.getDouble(5)))
    rows.groupBy(_._1).foreach { case (uid, es) =>
      // ANSI ntile: bucket sizes differ by at most 1; buckets are exactly
      // 1..min(4, n) — derived from the partition size so a smaller
      // regenerated fixture flags vacuity, not a fake engine bug (ADVICE r9)
      val sizes = es.groupBy(_._4).view.mapValues(_.length)
      assert(sizes.keySet == (1 to math.min(4, es.length)).toSet,
        s"user $uid buckets: ${sizes.keySet} for n=${es.length}")
      assert(es.length >= 4, s"user $uid has only ${es.length} events — " +
        "fixture too small for a meaningful 4-bucket ntile check")
      assert(sizes.values.max - sizes.values.min <= 1, s"user $uid skewed: $sizes")
      // sorted by (value, event_id), pct_rank and cume are non-decreasing,
      // pct_rank spans [0, 1], cume ends at exactly 1.0
      val ordered = es.sortBy(e => (e._3, e._2))
      assert(ordered.head._5 == 0.0 && ordered.last._5 == 1.0)
      assert(ordered.last._6 == 1.0)
      ordered.sliding(2).foreach { w =>
        val (a, b) = (w(0), w(1))
        assert(a._5 <= b._5 && a._6 <= b._6, s"user $uid rank fraction regressed")
        assert(a._4 <= b._4, s"user $uid ntile not monotone with the order")
      }
    }
  }

  test("standard-seed ewma equals a JVM x₁-seeded fold, bit-exact") {
    // same harness as the zero-seeded pin, but acc starts at the FIRST
    // element and the recursion applies from the second on
    import org.apache.spark.sql.types.TimestampType
    val got = q("window_ewma_std").collect()
      .map(r => (r.getLong(0), (r.getLong(1), r.getDouble(2)))).toMap
    val series = Tables.events(spark, Sf0001).where(col("user_id").isNotNull)
      .select(col("user_id"), unix_micros(col("ts").cast(TimestampType)),
        col("event_id"), col("value")).collect()
      .map(r => (r.getLong(0), r.getLong(1), r.getLong(2), r.getDouble(3)))
      .groupBy(_._1)
    series.foreach { case (uid, rows) =>
      val vals = rows.sortBy(e => (e._2, e._3)).map(_._4)
      val expected = vals.tail.foldLeft(vals.head)((acc, x) => acc * 0.5 + x * 0.5)
      val (n, ewma) = got(uid)
      assert(n == rows.length)
      assert(ewma == expected, s"user $uid: $ewma vs $expected")
    }
    assert(got.keySet == series.keySet)
    // the two conventions must actually disagree somewhere on the fixture —
    // otherwise this variant pins nothing beyond window_ewma
    val zero = q("window_ewma").collect()
      .map(r => (r.getLong(0), r.getDouble(2))).toMap
    assert(got.exists { case (uid, (_, v)) => v != zero(uid) },
      "standard and zero seeds coincide on every fixture series — vacuous")
  }

  test("bounded ewma equals exact ewma bit-for-bit, with truncation exercised") {
    // 64 halvings attenuate the dropped prefix by 2⁻⁶⁴ — below half an ulp
    // of any fixture-scale accumulator within ~25 steps, after which both
    // folds run the identical IEEE sequence: equality is EXACT, not approx
    val exact = q("window_ewma").collect()
      .map(r => (r.getLong(0), (r.getLong(1), r.getDouble(2)))).toMap
    val bounded = q("window_ewma_bounded").collect()
      .map(r => (r.getLong(0), (r.getLong(1), r.getDouble(2)))).toMap
    assert(bounded.keySet == exact.keySet)
    // vacuity guard: some fixture series must actually exceed the bound
    assert(exact.values.exists(_._1 > Windows.EwmaHistory),
      s"no series exceeds EwmaHistory=${Windows.EwmaHistory}")
    exact.foreach { case (uid, (n, e)) =>
      val (nb, b) = bounded(uid)
      assert(nb == n, s"user $uid: n_events $nb != full count $n")
      assert(b == e, s"user $uid: bounded $b vs exact $e")
    }
  }

  test("gaps-islands streaks equal an independent per-user run-length scan") {
    val got = q("window_gaps_islands").collect()
      .map(r => (r.getLong(0), r.getDate(1).toLocalDate, r.getDate(2).toLocalDate,
        r.getLong(3))).toSet
    // independent oracle: collect the distinct (user, day) set and fold
    // sorted days into maximal consecutive runs
    implicit val dayOrd: Ordering[java.time.LocalDate] =
      Ordering.by(_.toEpochDay)
    val byUser = Tables.events(spark, Sf0001)
      .select(col("user_id"), to_date(col("ts")).as("day")).distinct()
      .collect().map(r => (r.getLong(0), r.getDate(1).toLocalDate))
      .groupBy(_._1).view.mapValues(_.map(_._2).sorted).toMap
    val expected = byUser.flatMap { case (u, days) =>
      days.foldLeft(List.empty[(java.time.LocalDate, java.time.LocalDate)]) {
        case ((s0, e0) :: tail, d) if d.toEpochDay == e0.toEpochDay + 1 =>
          (s0, d) :: tail
        case (acc, d) => (d, d) :: acc
      }.map { case (s0, e0) =>
        (u, s0, e0, e0.toEpochDay - s0.toEpochDay + 1) }
    }.toSet
    assert(got == expected)
    // the fixture must exercise a real multi-day streak AND a gap
    assert(expected.exists(_._4 > 1), "no multi-day streak in fixture")
    assert(expected.groupBy(_._1).exists(_._2.size > 1), "no gap in fixture")
  }

  test("window_fill_forward carries exactly the latest purchase at or before each event") {
    // ordering contract: the (ts, event_id) sort is only cross-engine
    // stable because ts is NULL-free (Spark ASC = NULLS FIRST, DuckDB
    // NULLS LAST) — pin the fixture invariant the oracle relies on
    assert(Tables.events(spark, Sf0001).where(col("ts").isNull).count() == 0,
      "events.ts grew NULLs — window_fill_forward's order desynchronizes")
    import java.time.LocalDateTime
    implicit val ldtOrd: Ordering[LocalDateTime] =
      Ordering.fromLessThan(_.isBefore(_))
    val evs = Tables.events(spark, Sf0001)
      .select(col("event_id"), col("user_id"), col("event_type"), col("ts"), col("value"))
      .collect()
      .map(r => (r.getLong(0), if (r.isNullAt(1)) None else Some(r.getLong(1)),
        r.getString(2), r.getAs[LocalDateTime](3), r.getDouble(4)))
    val expected = evs.map { case (id, u, _, ts, _) =>
      val prior = evs.filter(e => e._2 == u && e._3 == "purchase" &&
        (e._4.isBefore(ts) || (e._4.equals(ts) && e._1 <= id)))
      id -> (if (prior.isEmpty) None
             else Some(prior.maxBy(e => (e._4, e._1))._5))
    }.toMap
    val got = q("window_fill_forward").collect()
      .map(r => r.getLong(0) ->
        (if (r.isNullAt(3)) None else Some(r.getDouble(3)))).toMap
    assert(got.size == expected.size)
    val bad = expected.filter { case (k, v) => got(k) != v }
    assert(bad.isEmpty, s"LOCF mismatch: ${bad.take(5)}")
    // discrimination: both filled and still-NULL rows exist
    assert(got.values.exists(_.isDefined) && got.values.exists(_.isEmpty))
  }

  test("agg_bootstrap_ci: CI brackets the point mean; replicate 0 reproduces by hand") {
    val rows = q("agg_bootstrap_ci").collect()
      .map(r => r.getString(0) ->
        ((r.getLong(1), r.getDouble(2), r.getDouble(3), r.getDouble(4)))).toMap
    rows.foreach { case (g, (n, mean, lo, hi)) =>
      assert(lo < hi, s"$g: degenerate CI [$lo, $hi]")
      assert(lo <= mean && mean <= hi,
        s"$g: point mean $mean outside the bootstrap CI [$lo, $hi]")
      assert(n > 0)
    }
    // reproduce replicate b=0's weighted mean for one group by hand — pins
    // the hash recipe, the Poisson thresholds, and the floor-micro scaling
    val evs = Tables.events(spark, Sf0001)
      .select(col("event_type"), col("event_id"), col("value")).collect()
      .map(r => (r.getString(0), r.getLong(1), r.getDouble(2)))
      .filter(_._1 == "click")
    val B = Aggregations.BootstrapReplicates
    val thr = Aggregations.PoissonThresholds
    def weight(eventId: Long, b: Long): Long = {
      val u = ((eventId * B + b) % 1000000007L) * 2654435761L % 1000000L
      val k = thr.indexWhere(u < _)
      if (k < 0) thr.length.toLong else k.toLong
    }
    val (num, den) = evs.foldLeft((0L, 0L)) { case ((sn, sd), (_, id, v)) =>
      val w = weight(id, 0L)
      (sn + w * math.floor(v * 1000000).toLong, sd + w)
    }
    val handMean = num.toDouble / den.toDouble
    // recompute the engine's replicate frame for the same (group, b=0)
    val engMeans = {
      import org.apache.spark.sql.functions._
      val reps = Tables.events(spark, Sf0001)
        .where(col("event_type") === "click")
        .select(col("event_id"),
          floor(col("value") * 1000000).cast("long").as("v"))
        .withColumn("b", lit(0L))
        .withColumn("u", Det.mhash(col("event_id") * B + col("b"), 1000000L))
      val w = thr.zipWithIndex.reverse.foldLeft(lit(thr.length.toLong)) {
        case (acc, (t, k)) => when(col("u") < t, k.toLong).otherwise(acc)
      }
      reps.agg((sum(w * col("v")).cast("double") / sum(w).cast("double"))
        .as("m")).head().getDouble(0)
    }
    assert(engMeans == handMean,
      s"replicate-0 weighted mean: engine $engMeans vs hand $handMean")
    // weights must be non-degenerate: some zeros AND some >= 2 in replicate 0
    val ws = evs.map(e => weight(e._2, 0L))
    assert(ws.contains(0L) && ws.exists(_ >= 2L), s"Poisson weights degenerate: ${ws.distinct.sorted}")
  }

  test("agg_robust_outliers matches a driver-side median/IQR/MAD computation") {
    val got = q("agg_robust_outliers").collect()
      .map(r => r.getString(0) ->
        ((r.getLong(1), r.getDouble(2), r.getDouble(3), r.getDouble(4), r.getLong(5))))
      .toMap
    def interp(sorted: Array[Long], f: Double): Double = {
      // the (1-g)·lo + g·hi rule both engines implement
      val pos = f * (sorted.length - 1)
      val (lo, hi) = (sorted(pos.toInt), sorted(math.ceil(pos).toInt))
      val g = pos - pos.toInt
      (1 - g) * lo + g * hi
    }
    val byType = Tables.events(spark, Sf0001)
      .select(col("event_type"), col("value")).collect()
      .map(r => (r.getString(0), math.floor(r.getDouble(1) * 1000000).toLong))
      .groupBy(_._1).view.mapValues(_.map(_._2).sorted).toMap
    byType.foreach { case (t, vs) =>
      val (n, med, iqr, mad, nOut) = got(t)
      assert(n == vs.length)
      val (m, q1, q3) = (interp(vs, 0.5), interp(vs, 0.25), interp(vs, 0.75))
      assert(med == m, s"$t median: $med vs $m")
      assert(iqr == q3 - q1, s"$t iqr")
      val devs = vs.map(v => math.abs(v.toDouble - m)).sorted
      val posD = 0.5 * (devs.length - 1)
      val gD = posD - posD.toInt
      val madRef = (1 - gD) * devs(posD.toInt) + gD * devs(math.ceil(posD).toInt)
      assert(mad == madRef, s"$t mad: $mad vs $madRef")
      val (fl, fh) = (q1 - (q3 - q1) * 1.5, q3 + (q3 - q1) * 1.5)
      assert(nOut == vs.count(v => v < fl || v > fh), s"$t outlier count")
    }
    // the screen must bite on the fixture
    assert(got.values.exists(_._5 > 0), "no IQR outliers anywhere — degenerate fixture")
  }

  /** JVM reference for the anomaly variants: exact-decimal moment sums
    * over each trailing Zw-row frame WITHIN the given partition key, then
    * the identical IEEE op sequence as the plan (and its oracle).
    */
  private def zscoreReference(
      keyOf: (String, java.time.LocalDateTime) => Any): Map[Long, Double] = {
    import java.time.ZoneOffset
    val Zw = Windows.ZscoreWindow
    val evs = Tables.events(spark, Sf0001)
      .where(col("value").isNotNull)
      .select("event_type", "ts", "event_id", "value").collect()
      .map { r =>
        val t = r.getAs[java.time.LocalDateTime]("ts")
        (keyOf(r.getString(0), t),
          t.toEpochSecond(ZoneOffset.UTC) * 1000000L + t.getNano / 1000,
          r.getLong(2), r.getDouble(3))
      }
    val expected = scala.collection.mutable.Map.empty[Long, Double]
    evs.groupBy(_._1).foreach { case (_, es) =>
      val sorted = es.sortBy(e => (e._2, e._3))
      for (i <- (Zw - 1) until sorted.length) {
        val win = sorted.slice(i - (Zw - 1), i + 1)
        val decs = win.map(e => BigDecimal(e._4).setScale(4, BigDecimal.RoundingMode.HALF_UP))
        val s1D = decs.sum.toDouble
        val s2D = decs.map(x => x * x).sum.toDouble
        val nD = Zw.toDouble
        val varPop = math.max(nD * s2D - s1D * s1D, 0.0) / (nD * nD)
        val v = sorted(i)._4
        val z = (v - s1D / nD) / math.sqrt(varPop)
        if (varPop > 0.0 && math.abs(z) > Windows.ZscoreFlagSigma)
          expected(sorted(i)._3) = z
      }
    }
    expected.toMap
  }

  private def assertZscoreMatches(name: String, expected: Map[Long, Double]): Unit = {
    val got = q(name).collect().map(r => r.getLong(0) -> r.getDouble(3)).toMap
    assert(got.nonEmpty, s"$name: no outliers flagged on the fixture")
    assert(got.keySet == expected.keySet,
      s"$name flag sets differ: extra=${got.keySet -- expected.keySet} " +
      s"missing=${expected.keySet -- got.keySet}")
    got.foreach { case (id, z) =>
      assert(z == expected(id), s"$name event $id: z $z != ${expected(id)}") }
  }

  test("window_anomaly_zscore flags exactly the reference trailing-window outliers") {
    assertZscoreMatches("window_anomaly_zscore", zscoreReference((et, _) => et))
  }

  test("window_anomaly_zscore_bounded restarts windows at (event_type, week) boundaries") {
    import java.time.DayOfWeek
    import java.time.temporal.TemporalAdjusters
    val weekly = zscoreReference((et, t) =>
      (et, t.toLocalDate.`with`(TemporalAdjusters.previousOrSame(DayOfWeek.MONDAY))))
    assertZscoreMatches("window_anomaly_zscore_bounded", weekly)
    // and the boundary-restart trade is real on the fixture: the two
    // variants disagree somewhere (a week-local mean shifts some z), so
    // this suite would catch a regression that silently keyed both
    // variants the same way
    val global = zscoreReference((et, _) => et)
    assert(weekly != global,
      "bounded and global variants identical — week partitioning inert on fixture")
  }

  test("window_twap matches a driver-side interval-weighted reference") {
    val got = q("window_twap").collect()
      .map(r => r.getLong(0) -> ((r.getLong(1), r.getLong(2), r.getDouble(3)))).toMap
    import java.time.{LocalDateTime, ZoneOffset}
    val evs = Tables.events(spark, Sf0001).where(col("user_id").isNotNull)
      .select(col("user_id"), col("event_id"), col("ts"), col("value")).collect()
      .map { r =>
        val ldt = r.getAs[LocalDateTime](2)
        val us = ldt.toEpochSecond(ZoneOffset.UTC) * 1000000L + ldt.getNano / 1000L
        (r.getLong(0), r.getLong(1), us, math.floor(r.getDouble(3) * 1000).toLong)
      }
    val expected = evs.groupBy(_._1).flatMap { case (u, rows) =>
      val sorted = rows.sortBy(e => (e._3, e._2))
      val ivs = sorted.zip(sorted.tail).map { case (a, b) =>
        (a._4, (b._3 - a._3) / 1000000L) } // truncating: operands non-negative
      val held = ivs.map(_._2).sum
      if (ivs.isEmpty || held == 0) None
      else Some(u -> ((ivs.length.toLong, held,
        ivs.map(i => i._1 * i._2).sum.toDouble / held.toDouble)))
    }
    assert(got == expected.toMap,
      s"twap mismatch, e.g. ${(got.toSet -- expected.toSet).take(3)}")
    assert(got.nonEmpty)
  }

  test("agg_sketch_merge: daily partials fold to the single-pass sketch summary") {
    // the op's algebraic claim: merging per-day partial registers by MAX
    // yields the same state as the direct single-pass sketch — so the
    // summary (occupied registers, register mass) derived from
    // agg_hll_sketch's direct registers must equal the op's output, and
    // the day counts must match the raw calendar
    val direct = SparkEntry.queries("agg_hll_sketch")(spark, TestSpark.Sf001)
      .collect().map(r => (r.getString(0), r.getLong(1)) -> r.getLong(2)).toMap
    val expOcc = direct.keys.groupBy(_._1).view.mapValues(_.size.toLong).toMap
    val expSum = direct.groupBy { case ((et, _), _) => et }
      .view.mapValues(_.values.sum).toMap
    val expDays = Tables.events(spark, TestSpark.Sf001)
      .where(col("user_id").isNotNull)
      .select(col("event_type"), to_date(col("ts")).as("d")).distinct()
      .groupBy("event_type").count().collect()
      .map(r => r.getString(0) -> r.getLong(1)).toMap
    val got = SparkEntry.queries("agg_sketch_merge")(spark, TestSpark.Sf001)
      .collect().map(r => r.getString(0) ->
        ((r.getLong(1), r.getLong(2), r.getLong(3)))).toMap
    assert(got.keySet == expOcc.keySet)
    got.foreach { case (et, (nDays, occ, sumRho)) =>
      assert(nDays == expDays(et), s"$et n_days $nDays vs ${expDays(et)}")
      assert(occ == expOcc(et), s"$et occupied $occ vs ${expOcc(et)}")
      assert(sumRho == expSum(et), s"$et sum_rho $sumRho vs ${expSum(et)}")
    }
    // the merge is non-vacuous: more than one daily partial folded in
    assert(got.values.exists(_._1 > 1),
      "every group has a single day — the merge never exercised")
  }

  test("hll sketch: registers merge by max across splits and estimate tracks exact") {
    import Aggregations.{HllRegisters, HllMaxRho}
    def registers(df: org.apache.spark.sql.DataFrame): Map[(String, Long), Long] = {
      // JVM reference of the register pipeline on an arbitrary event subset
      val P = 1000000007L; val A = 2654435761L; val B = 374761393L
      df.select(col("event_type"), col("user_id")).collect()
        .filter(!_.isNullAt(1))
        .map { r =>
          val h1 = ((r.getLong(1) % P) * A + B) % P
          val h2 = (h1 * h1) % P
          val v = h2 / HllRegisters
          val rho = if (v == 0) HllMaxRho
            else java.lang.Long.numberOfTrailingZeros(v) + 1L
          ((r.getString(0), h2 % HllRegisters), rho)
        }
        .groupBy(_._1).view.mapValues(_.map(_._2).max).toMap
    }
    val events = Tables.events(spark, TestSpark.Sf001)
    val got = SparkEntry.queries("agg_hll_sketch")(spark, TestSpark.Sf001)
      .collect().map(r => (r.getString(0), r.getLong(1)) -> r.getLong(2)).toMap
    // engine output equals the JVM reference (numberOfTrailingZeros+1 is
    // the independent form of the bin-length trick)
    assert(got == registers(events))
    // MERGEABILITY: registers of two disjoint halves max-merge to the full
    // registers — the property that makes the sketch shuffle-bounded
    val even = registers(events.where(col("event_id") % 2 === 0))
    val odd = registers(events.where(col("event_id") % 2 === 1))
    val merged = (even.keySet ++ odd.keySet).map(k =>
      k -> math.max(even.getOrElse(k, 0L), odd.getOrElse(k, 0L))).toMap
    assert(merged == got, "split registers must max-merge to the full sketch")
    // estimate (with the standard small-range correction) within 8% of
    // exact per event_type
    val exact = events.where(col("user_id").isNotNull)
      .select("event_type", "user_id").distinct()
      .groupBy("event_type").count().collect()
      .map(r => r.getString(0) -> r.getLong(1)).toMap
    val m = HllRegisters
    val alpha = 0.7213 / (1 + 1.079 / m)
    exact.foreach { case (et, n) =>
      val regs = (0 until m).map(b => got.getOrElse((et, b.toLong), 0L))
      val raw = alpha * m * m / regs.map(r => math.pow(2.0, -r.toDouble)).sum
      val zeros = regs.count(_ == 0L)
      val est = if (raw <= 2.5 * m && zeros > 0) m * math.log(m.toDouble / zeros) else raw
      assert(math.abs(est / n - 1.0) <= 0.08,
        f"$et: est $est%.1f vs exact $n (${100 * (est / n - 1)}%.1f%%)")
    }
  }

  test("weighted percentiles equal a JVM cumulative-weight reference exactly") {
    val got = SparkEntry.queries("agg_weighted_percentiles")(spark, Sf0001)
      .collect()
      .map(r => r.getString(0) ->
        ((r.getDouble(1), r.getDouble(2), r.getDouble(3), r.getLong(4)))).toMap
    val rows = Tables.lineitem(spark, Sf0001)
      .select("l_returnflag", "l_extendedprice", "l_quantity").collect()
      .map(r => (r.getString(0), r.getDouble(1), BigDecimal(r.getDouble(2))))
    val expected = rows.groupBy(_._1).map { case (flag, rs) =>
      val byPrice = rs.groupBy(_._2).view.mapValues(_.map(_._3).sum)
        .toSeq.sortBy(_._1)
      val tot = byPrice.map(_._2).sum
      def pick(p: Int): Double = {
        var cum = BigDecimal(0)
        byPrice.find { case (_, w) => cum += w; cum * 100 >= tot * p }.get._1
      }
      flag -> ((pick(25), pick(50), pick(75), byPrice.length.toLong))
    }
    assert(got == expected, "weighted percentile mismatch")
    // ordering sanity: quartiles are monotone within each flag
    got.values.foreach { case (p25, p50, p75, _) =>
      assert(p25 <= p50 && p50 <= p75) }
  }

  test("window_cusum: the prefix-sum closed form equals Page's sequential recursion") {
    // the operator computes S_n = P_n - min_{j<=n} P_j (two windows); the
    // PUBLISHED definition is the recursion S_n = max(0, S_{n-1} + x_n - drift).
    // Recompute the recursion driver-side over the same (ts, event_id)
    // order and require equality — the algebraic identity, asserted on
    // real data, not assumed.
    val rows = Tables.events(spark, Sf0001)
      .select("user_id", "event_id", "ts", "value").collect()
      .map { r =>
        val t = r.getAs[java.time.LocalDateTime](2)
        (r.getLong(0), r.getLong(1),
          t.toEpochSecond(java.time.ZoneOffset.UTC) * 1000000000L + t.getNano,
          r.getDouble(3))
      }
    val expected = rows.groupBy(_._1).toSeq.flatMap { case (_, es) =>
      var st = BigDecimal(0)
      es.sortBy(e => (e._3, e._2)).toSeq.map { case (u, eid, _, v) =>
        // the operator quantizes inputs to 6 dp (DECIMAL(20,6)) before
        // summing — mirror the quantization, then the exact recursion
        st = (st + (BigDecimal(v.toString).setScale(6,
          BigDecimal.RoundingMode.HALF_UP) - Windows.CusumDrift)).max(0)
        (u, eid) -> (st * 1000000).toLongExact
      }
    }.toMap
    val got = q("window_cusum").collect()
      .map(r => (r.getLong(0), r.getLong(1)) -> (r.getLong(2), r.getBoolean(3))).toMap
    assert(got.keySet == expected.keySet)
    got.foreach { case (k, (cusum, flag)) =>
      assert(cusum == expected(k), s"$k: closed form $cusum != recursion ${expected(k)}")
      assert(flag == (cusum > Windows.CusumThresholdMicro))
    }
    // the alarm is non-trivial on the fixture: both states occur
    val flags = got.values.map(_._2).toSet
    assert(flags == Set(true, false), s"degenerate alarm mix: $flags")
  }
}
