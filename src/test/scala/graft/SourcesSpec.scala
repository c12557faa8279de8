package graft

import org.scalatest.funsuite.AnyFunSuite
import org.apache.spark.sql.functions._
import TestSpark.{spark, Sf0001}

class SourcesSpec extends AnyFunSuite {
  private def q(name: String) = SparkEntry.queries(name)(spark, Sf0001)

  test("memoSpill builds once per key, isolates keys, and returns stable content") {
    // The shared engine every round-9 index/pair spill rests on: the build
    // closure must run EXACTLY once per key (second read serves the file),
    // different keys must not share spills, and the served content must
    // equal what the build produced.
    import spark.implicits._
    val built = new java.util.concurrent.atomic.AtomicInteger(0)
    def build(n: Int) = { built.incrementAndGet(); Seq.tabulate(n)(i => (i.toLong, s"v$i")).toDF("k", "v") }
    val key = s"memospill-spec-${System.nanoTime()}"
    val a = Sources.memoSpill(spark, key, "spec_spill")(build(5)).collect().toSet
    val b = Sources.memoSpill(spark, key, "spec_spill")(build(5)).collect().toSet
    assert(built.get() == 1, s"build ran ${built.get()} times for one key")
    assert(a == b && a.size == 5)
    val c = Sources.memoSpill(spark, key + ":other", "spec_spill")(build(3)).collect().toSet
    assert(built.get() == 2, "distinct key did not rebuild")
    assert(c.size == 3 && c != a, "keys shared a spill")
  }

  test("rdd wordcount equals the DataFrame wordcount") {
    val rdd = q("mr_wordcount_rdd").collect().map(r => (r.getString(0), r.getLong(1)))
    val df = q("text_wordcount").collect().map(r => (r.getString(0), r.getLong(1)))
    assert(rdd.sameElements(df))
  }

  test("partitioned sink re-read prunes partitions") {
    val df = q("sink_partitioned_parquet")
    val scan = df.queryExecution.executedPlan.toString
    assert(scan.contains("PartitionFilters") && scan.contains("yr"),
      s"no partition pruning:\n$scan")
    assert(df.collect().map(_.getInt(0)).forall(y => y >= 1996 && y <= 1999))
  }

  test("dynamic backfill restates 1997 and preserves every sibling partition") {
    // the operator's core invariant: partitionOverwriteMode=dynamic must
    // replace ONLY the yr=1997 partition — a static-mode clobber would
    // leave just 1997 rows while the driver's rows>0 check still passed
    val out = q("etl_backfill_partition").collect()
      .map(r => r.getInt(0) -> r.getLong(1)).toMap
    val expected = Tables.orders(spark, Sf0001)
      .groupBy(year(col("o_orderdate")).as("yr")).count().collect()
      .map(r => r.getInt(0) -> r.getLong(1)).toMap
    assert(out == expected, s"partition set changed: $out vs $expected")
    // and the restatement actually happened: 1997's sum doubled
    val sums = q("etl_backfill_partition").collect()
      .map(r => r.getInt(0) -> r.getDouble(2)).toMap
    val base = Tables.orders(spark, Sf0001)
      .groupBy(year(col("o_orderdate")).as("yr"))
      .agg(Det.dsum2(col("o_totalprice")).as("s")).collect()
      .map(r => r.getInt(0) -> r.getDouble(1)).toMap
    assert(sums(1997) > base(1997) * 1.99 && sums(1997) < base(1997) * 2.01)
    assert(sums(1996) == base(1996))
  }

  test("csv and json roundtrips preserve rows and schema") {
    val csv = q("source_csv_roundtrip")
    assert(csv.count() == 25)
    assert(csv.schema.map(_.dataType.simpleString) == Seq("int", "string", "int"))
    val json = q("source_json_roundtrip")
    assert(json.count() == Tables.supplier(spark, Sf0001).count())
  }

  test("avro roundtrip writes genuine container files and preserves every row") {
    // the files must be REAL avro object-container files (magic "Obj\1"),
    // not parquet-in-disguise — and the read side must reproduce the
    // source table exactly, doubles bit-for-bit
    val got = q("source_avro_roundtrip").collect()
      .map(r => (r.getLong(0), r.getString(1), r.getInt(2),
        java.lang.Double.doubleToLongBits(r.getDouble(3)), r.getString(4)))
    val want = Tables.customer(spark, Sf0001)
      .orderBy("c_custkey").collect()
      .map(r => (r.getLong(0), r.getString(1), r.getInt(2),
        java.lang.Double.doubleToLongBits(r.getDouble(3)), r.getString(4)))
    assert(got.sameElements(want))
    val dir = new java.io.File(Sources.tmp("customer_avro", Sf0001))
    val parts = Option(dir.listFiles()).getOrElse(Array.empty)
      .filter(_.getName.endsWith(".avro"))
    assert(parts.nonEmpty, s"no .avro part files under $dir")
    parts.foreach { f =>
      val hdr = new Array[Byte](4)
      val in = new java.io.FileInputStream(f)
      try assert(in.read(hdr) == 4 &&
        hdr.sameElements(Array[Byte]('O', 'b', 'j', 1)),
        s"${f.getName} is not an avro container file")
      finally in.close()
    }
  }

  test("snapshot diff classes partition the union of both snapshots") {
    val rows = q("etl_snapshot_diff").collect()
      .map(r => r.getString(0) -> r.getLong(1)).toMap
    import Etl.{DiffMod, DiffDropRes, DiffRepriceRes, DiffInsertRes, DiffKeyShift}
    val ks = Tables.orders(spark, Sf0001).select("o_orderkey")
      .collect().map(_.getLong(0))
    // DiffKeyShift places cloned "insert" keys in a band disjoint from the
    // base keys; if a regenerated fixture ever reached the shift, cloned
    // keys would collide with real ones and corrupt the classification
    // identically in query AND oracle (the gate would stay green) — fail
    // loudly here instead (ADVICE.md round 6).
    assert(ks.max < DiffKeyShift,
      s"o_orderkey ${ks.max} reaches DiffKeyShift=$DiffKeyShift — raise the shift")
    val added = ks.count(_ % DiffMod == DiffInsertRes).toLong
    val removed = ks.count(_ % DiffMod == DiffDropRes).toLong
    val changed = ks.count(_ % DiffMod == DiffRepriceRes).toLong
    assert(rows("added") == added)
    assert(rows("removed") == removed)
    assert(rows("changed") == changed)
    assert(rows("unchanged") == ks.length - removed - changed)
    assert(Seq(added, removed, changed).forall(_ > 0), "a diff class is empty")
  }

  test("cdc apply keeps only the latest op per key and drops deleted keys") {
    val got = q("etl_cdc_apply").collect()
      .map(r => (r.getLong(0), r.getLong(1), r.getString(2), r.getDouble(3),
        r.getLong(4))).toSet
    // independent replay: fold the full log per user, latest (ts, id) wins
    val log = Tables.events(spark, Sf0001).where(col("user_id").isNotNull)
      .select(col("user_id"), col("event_type"), col("value"),
        unix_micros(col("ts").cast("timestamp")), col("event_id"))
      .collect()
      .map(r => (r.getLong(0), r.getString(1), r.getDouble(2), r.getLong(3),
        r.getLong(4)))
    val byUser = log.groupBy(_._1)
    val expected = byUser.flatMap { case (u, ops) =>
      val last = ops.maxBy(o => (o._4, o._5))
      val op = last._2 match {
        case "signup" => "I"; case "error" => "D"; case _ => "U" }
      if (op == "D") None
      else Some((u, ops.length.toLong, op, last._3, last._4))
    }.toSet
    assert(got == expected)
    // the fixture must exercise the delete path for the test to bite
    assert(byUser.exists { case (_, ops) =>
      ops.maxBy(o => (o._4, o._5))._2 == "error" }, "no deleted key in fixture")
  }

  test("etl_gdpr_delete: purge is complete, audited, and leaves no trace") {
    import org.apache.spark.sql.functions._
    val rows = SparkEntry.queries("etl_gdpr_delete")(spark, TestSpark.Sf0001)
      .collect()
      .map(r => r.getString(0) -> ((r.getLong(1), r.getLong(2), r.getLong(3))))
      .toMap
    val del = Tables.events(spark, TestSpark.Sf0001)
      .where(col("user_id").isNotNull &&
        Det.mhash(col("user_id"), Etl.GdprBuckets) < Etl.GdprCut)
      .select("user_id").distinct().collect().map(_.getLong(0)).toSet
    assert(del.nonEmpty, "deletion-request sample is empty — raise GdprCut")
    val evs = Tables.events(spark, TestSpark.Sf0001)
      .select(col("event_type"), col("user_id")).collect()
      .map(r => (r.getString(0), if (r.isNullAt(1)) None else Some(r.getLong(1))))
    // conservation: every event is either kept or purged, per class
    evs.groupBy(_._1).foreach { case (t, es) =>
      val (k, _, p) = rows(t)
      assert(k + p == es.length, s"$t: kept $k + purged $p != total ${es.length}")
      // no trace: the kept user count equals the population minus requests
      val keptUsers = es.flatMap(_._2).toSet -- del
      assert(rows(t)._2 == keptUsers.size,
        s"$t: audit says ${rows(t)._2} kept users, reference has ${keptUsers.size}")
      // and the purged tally is exactly the deleted users' rows
      assert(p == es.count(_._2.exists(del)), s"$t: purged tally wrong")
    }
    // the purge must actually bite on the fixture
    assert(rows.values.map(_._3).sum > 0, "no rows purged — sample missed every user")
  }

  test("etl_quarantine emits exactly the rule-violating docs with full tag lists") {
    import Etl.{QuarantineMinChars, QuarantineLangs}
    val got = SparkEntry.queries("etl_quarantine")(spark, Sf0001).collect()
      .map(r => r.getLong(0) -> ((r.getString(1), r.getLong(2), r.getString(3))))
      .toMap
    val docs = Tables.documents(spark, Sf0001)
      .select("doc_id", "lang", "n_chars", "text").collect()
    val expected = docs.flatMap { r =>
      val (id, lang, n, text) =
        (r.getLong(0), r.getString(1), r.getLong(2), r.getString(3))
      val tags = Seq(
        if (n < QuarantineMinChars) Some("short_doc") else None,
        if (!QuarantineLangs.contains(lang)) Some("lang_unsupported") else None,
        if (text.length != n) Some("len_mismatch") else None).flatten
      if (tags.isEmpty) None else Some(id -> ((lang, n, tags.mkString(","))))
    }.toMap
    assert(got == expected, "quarantine set or tags mismatch")
    // both live rules must fire on the fixture, and at least one doc must
    // trip BOTH (pins the multi-tag concat order); the consistency rule
    // must NOT fire (the fixture metadata is clean)
    val allTags = got.values.map(_._3).toSeq
    assert(allTags.exists(_.contains("short_doc")))
    assert(allTags.exists(_.contains("lang_unsupported")))
    assert(allTags.contains("short_doc,lang_unsupported"),
      "no doc trips both rules — multi-tag path unexercised")
    assert(!allTags.exists(_.contains("len_mismatch")),
      "len_mismatch fired — fixture metadata no longer consistent")
    // and the clean remainder really is clean
    assert(got.size < docs.length)
  }

  test("evictSpills drops every spill and memoized access rebuilds (VERDICT r10 #8)") {
    // build at least one memoized spill, then evict between queries (the
    // documented contract: no live frames), then prove a fresh access
    // rebuilds the identical deterministic content
    val before = Similarity.minhashCandidates(spark, Sf0001, 0.8)
      .collect().map(r => (r.getLong(0), r.getLong(1))).toSet
    val (files0, bytes0) = Sources.spillFootprint()
    assert(files0 > 0 && bytes0 > 0, "no spills present — eviction test vacuous")
    Sources.evictSpills()
    val (files1, bytes1) = Sources.spillFootprint()
    assert(files1 == 0 && bytes1 == 0,
      s"eviction left $files1 files / $bytes1 bytes behind")
    val after = Similarity.minhashCandidates(spark, Sf0001, 0.8)
      .collect().map(r => (r.getLong(0), r.getLong(1))).toSet
    assert(after == before, "rebuilt spill content drifted from the original")
  }
}
