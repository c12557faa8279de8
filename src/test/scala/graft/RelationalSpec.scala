package graft

import org.scalatest.funsuite.AnyFunSuite
import TestSpark.{spark, Sf0001}

class RelationalSpec extends AnyFunSuite {
  private def q(name: String) = SparkEntry.queries(name)(spark, Sf0001)

  test("scan_project returns all 25 nations in key order") {
    val rows = q("scan_project").collect()
    assert(rows.length == 25)
    assert(rows.map(_.getInt(0)).toSeq == (0 until 25))
  }

  test("scan_filter_pushdown reaches the parquet scan") {
    val plan = q("scan_filter_pushdown").queryExecution.executedPlan.toString
    assert(plan.contains("PushedFilters") && plan.contains("IsNotNull(l_shipdate)"),
      s"filter not pushed:\n$plan")
  }

  test("topk_global is 10 rows in strictly decreasing (price, key) order") {
    val rows = q("topk_global").collect().map(r => (r.getDouble(2), r.getLong(0)))
    assert(rows.length == 10)
    assert(rows.sliding(2).forall { case Array((p1, k1), (p2, k2)) =>
      p1 > p2 || (p1 == p2 && k1 < k2) })
  }

  test("set-operation algebra") {
    val all      = q("set_union_all").collect().map(_.getInt(0))
    val distinct = q("set_union_distinct").collect().map(_.getInt(0)).toSet
    val inter    = q("set_intersect").collect().map(_.getInt(0)).toSet
    val except   = q("set_except").collect().map(_.getInt(0)).toSet
    assert(distinct == all.toSet)                       // distinct = dedup(all)
    assert(inter.subsetOf(distinct))
    assert((except & inter).isEmpty)                    // except ∩ intersect = ∅
    assert((except | inter).subsetOf(distinct))
  }

  test("epoch shuffle: shards partition the corpus, pos is contiguous per shard") {
    val run = () => SparkEntry.queries("sample_epoch_shuffle")(spark, TestSpark.Sf001)
      .collect().map(r => (r.getLong(0), r.getLong(1), r.getInt(2)))
    val rows = run()
    assert(rows.map(_._1).distinct.length == rows.length)      // each doc once
    assert(rows.forall { case (_, sh, _) => sh >= 0 && sh < 16 })
    rows.groupBy(_._2).foreach { case (sh, g) =>
      assert(g.map(_._3).sorted.toSeq == (1 to g.length), s"shard $sh pos has gaps")
    }
    // the epoch hash actually permutes: reading shards in pos order must not
    // reproduce ascending doc_id everywhere (that would mean no shuffle)
    assert(rows.groupBy(_._2).values.exists { g =>
      val ids = g.sortBy(_._3).map(_._1).toSeq
      ids != ids.sorted
    })
    assert(run().toSeq == rows.toSeq)                          // deterministic
  }

  test("source mixture keeps curated sources whole and downsamples the tail") {
    val full = Tables.documents(spark, TestSpark.Sf001)
      .groupBy("source").count().collect()
      .map(r => r.getString(0) -> r.getLong(1)).toMap
    val kept = SparkEntry.queries("sample_source_mixture")(spark, TestSpark.Sf001)
      .collect().map(r => (r.getString(0), r.getLong(1))).toMap
    kept.foreach { case (src, n) =>
      val tier = src.drop(3).toInt
      if (tier < 5) assert(n == full(src), s"curated $src lost docs")
      else assert(n <= full(src), s"$src kept more than it had")
    }
    // the long tail (rate 200/1000) must land well under half its corpus
    val tailKept = kept.collect { case (s, n) if s.drop(3).toInt >= 13 => n }.sum
    val tailFull = full.collect { case (s, n) if s.drop(3).toInt >= 13 => n }.sum
    assert(tailKept < tailFull / 2, s"tail kept $tailKept of $tailFull")
  }

  test("sample_lang_temperature: head language keep-rate strictly below every tail language's") {
    val out = SparkEntry.queries("sample_lang_temperature")(spark, TestSpark.Sf001)
      .collect()
      .map(r => r.getString(0) -> ((r.getLong(1), r.getLong(2), r.getLong(3), r.getLong(4))))
      .toMap
    val full = Tables.documents(spark, TestSpark.Sf001).groupBy("lang").count()
      .collect().map(r => r.getString(0) -> r.getLong(1)).toMap
    assert(out.keySet == full.keySet, "every fixture language must appear")
    out.foreach { case (lang, (nDocs, quota, nKept, _)) =>
      assert(nDocs == full(lang), s"$lang corpus count")
      assert(quota ==
        math.floor(math.sqrt(nDocs.toDouble) * Relational.LangTempGain).toLong,
        s"$lang quota formula")
      assert(nKept <= nDocs, s"$lang kept more than it had")
    }
    val (enN, _, enK, _) = out("en")
    assert(enK < enN, "the head language (en) must actually be downsampled")
    out.filterNot(_._1 == "en").foreach { case (lang, (n, _, k, _)) =>
      // keep-rate comparison by integer cross-multiplication (no float)
      assert(enK * n < k * enN, s"en keep-rate not strictly below $lang's")
    }
  }

  test("sample_lang_temperature: a zero-keep language still reports its row (ADVICE r11)") {
    // Synthetic corpus engineered so one language's hash filter keeps
    // NOTHING: lang 'zz' has 100 docs whose multiplicative hash all land
    // >= quota·10⁶/n (quota = floor(sqrt(100)·8) = 80, threshold 800000),
    // lang 'aa' has 4 docs that always pass (threshold 4·10⁶ > hash max).
    // The completeness contract: 'zz' must emit (100, 80, 0, 0), not vanish.
    def h(id: Long): Long = ((id % 1000000007L) * 2654435761L) % 1000000L
    val zzIds = Iterator.from(0).map(_.toLong).filter(h(_) >= 800000L).take(100).toSeq
    val aaIds = Iterator.from(0).map(_.toLong).filter(h(_) < 800000L).take(4).toSeq
    import spark.implicits._
    val dir = Sources.tmpUnique("langtemp_zero")
    (zzIds.map((_, "zz")) ++ aaIds.map((_, "aa")))
      .map { case (id, l) => (id, s"doc $id", l, "src_0", 6L + id.toString.length) }
      .toDF("doc_id", "text", "lang", "source", "n_chars")
      .write.mode("overwrite").parquet(s"$dir/documents.parquet")
    val out = SparkEntry.queries("sample_lang_temperature")(spark, dir).collect()
      .map(r => r.getString(0) ->
        ((r.getLong(1), r.getLong(2), r.getLong(3), r.getLong(4)))).toMap
    assert(out.keySet == Set("aa", "zz"), s"language rows missing: ${out.keySet}")
    val (zn, zq, zk, zc) = out("zz")
    assert((zn, zq, zk, zc) == ((100L, 80L, 0L, 0L)),
      s"zero-keep language misreported: ${out("zz")}")
    val (an, _, ak, _) = out("aa")
    assert(an == 4L && ak == 4L, s"always-pass language misreported: ${out("aa")}")
  }

  test("sample_lang_temperature_stats equals the live-count form row-for-row") {
    val live = SparkEntry.queries("sample_lang_temperature")(spark, TestSpark.Sf001)
      .collect().map(_.toSeq).toSeq
    val stats = SparkEntry.queries("sample_lang_temperature_stats")(spark, TestSpark.Sf001)
      .collect().map(_.toSeq).toSeq
    assert(live == stats, "the standing stats artifact changed the sample")
  }

  test("filter_compound respects every predicate") {
    val rows = SparkEntry.queries("filter_compound")(spark, Sf0001).collect()
    assert(rows.nonEmpty)
    rows.foreach { r =>
      assert(r.getDouble(2) < 24)                       // l_quantity
      assert(r.getDouble(3) >= 0.05 && r.getDouble(3) <= 0.07)
      assert(Set("A", "R").contains(r.getString(4)))
    }
  }

  test("sort_multi_nulls is totally ordered") {
    val rows = q("sort_multi_nulls").collect()
      .map(r => (r.getString(1), -r.getDouble(2), r.getLong(0)))
    assert(rows.sameElements(rows.sorted))
  }

  test("class balance keeps exactly the minority size per class, deterministically") {
    val a = SparkEntry.queries("sample_class_balance")(spark, Sf0001).collect()
      .map(r => (r.getLong(0), r.getString(1), r.getInt(2)))
    val b = SparkEntry.queries("sample_class_balance")(spark, Sf0001).collect()
      .map(r => (r.getLong(0), r.getString(1), r.getInt(2)))
    assert(a.toSeq == b.toSeq, "re-run produced a different sample")
    val classSizes = Tables.documents(spark, Sf0001)
      .groupBy("lang").count().collect()
      .map(r => r.getString(0) -> r.getLong(1)).toMap
    val k = classSizes.values.min
    val perClass = a.groupBy(_._2).view.mapValues(_.length.toLong).toMap
    assert(perClass.keySet == classSizes.keySet, "a class vanished")
    assert(perClass.values.forall(_ == k),
      s"unbalanced: $perClass (minority size $k)")
    assert(classSizes.values.exists(_ > k), "fixture has no skew — vacuous")
  }
}
