package graft

import org.scalatest.funsuite.AnyFunSuite

/** Cross-session contract of the persisted KMV sketch store (VERDICT r15
  * #8): the probe answers from the parquet artifact alone — no raw-event
  * scan, no sketch construction — and agrees with the in-process operator
  * bit-for-bit (same sketch frame serialized, same shared pairing
  * arithmetic).
  */
class KmvStoreSpec extends AnyFunSuite {
  import TestSpark.spark

  private val d = TestSpark.Sf0001

  test("probe output equals agg_kmv_overlap row-for-row") {
    val probe = KmvStore.queries("kmv_overlap_probe")(spark, d).collect().toSeq
    val direct = SparkEntry.queries("agg_kmv_overlap")(spark, d).collect().toSeq
    assert(probe.nonEmpty && probe == direct,
      s"probe diverged: ${probe.take(3)} vs ${direct.take(3)}")
  }

  test("re-probe is probe-only: no build after the store exists") {
    KmvStore.ensure(spark, d)
    val before = KmvStore.builds.get()
    KmvStore.queries("kmv_overlap_probe")(spark, d).collect()
    assert(KmvStore.builds.get() == before,
      "probe triggered a sketch build — the store contract is broken")
  }

  test("a missing completion marker forces a rebuild (crashed-build safety)") {
    KmvStore.ensure(spark, d)
    val root = KmvStore.storeRoot(d)
    assert(new java.io.File(root, "_KMV_OK").delete(), "marker should exist")
    val before = KmvStore.builds.get()
    KmvStore.ensure(spark, d)
    assert(KmvStore.builds.get() == before + 1,
      "markerless store was trusted — a crashed build could serve partial sketches")
  }

  test("store root is keyed by sketch geometry (a retune cannot serve stale sketches)") {
    // the root hash folds KmvK/KmvM: same fixture + different geometry
    // must land elsewhere. Recompute the key by hand the way storeRoot
    // does and check the geometry term is load-bearing.
    val a = Sources.fixtureKey(d, "events") +
      s":kmv:${Aggregations.KmvK}:${Aggregations.KmvM}"
    val b = Sources.fixtureKey(d, "events") +
      s":kmv:${Aggregations.KmvK * 2}:${Aggregations.KmvM}"
    assert(a.hashCode != b.hashCode)
    // per-day summary sanity from the artifact: occupancy never exceeds k,
    // and the estimate is exact (== k_rows) below the threshold
    val sm = KmvStore.queries("kmv_store_build")(spark, d).collect()
    assert(sm.nonEmpty)
    sm.foreach { r =>
      val (kRows, est) = (r.getLong(1), r.getLong(3))
      assert(kRows <= Aggregations.KmvK)
      if (kRows < Aggregations.KmvK) assert(est == kRows)
    }
  }

  test("delete: tombstoned hashes present before, absent from served rows, no rebuild") {
    import org.apache.spark.sql.functions.col
    KmvStore.ensure(spark, d)
    KmvStore.ensureTomb(spark, d)
    val before = KmvStore.builds.get()
    val tombs = spark.read.parquet(s"${KmvStore.tombDir(KmvStore.storeRoot(d))}/ids")
      .select("h").collect().map(_.getLong(0)).toSet
    assert(tombs.nonEmpty, "tombstone rule matched no users — pin would be vacuous")
    // present before: the rule picks bottom-of-hash-space users, so their
    // hashes MUST sit in the persisted bottom-k sketch rows
    val skRows = KmvStore.sketches(spark, d).select("h")
      .collect().map(_.getLong(0)).toSet
    assert(tombs.exists(skRows), "no tombstoned hash in the sketches — present-before broken")
    // absent after: the frame the deleted probe serves carries none of them
    val served = KmvStore.sketches(spark, d)
      .join(spark.read.parquet(s"${KmvStore.tombDir(KmvStore.storeRoot(d))}/ids")
        .select("h"), Seq("h"), "left_anti")
      .select("h").collect().map(_.getLong(0)).toSet
    assert(!served.exists(tombs), "a tombstoned hash survived the anti-join")
    // the estimates actually moved (deletion is not a no-op) and no
    // rebuild/event-scan happened on the serving path
    val undeleted = SparkEntry.queries("kmv_overlap_probe")(spark, d).collect().toSeq
    val deleted = SparkEntry.queries("kmv_overlap_probe_deleted")(spark, d).collect().toSeq
    assert(deleted != undeleted, "deleting sketch members changed no estimate — vacuous")
    assert(KmvStore.builds.get() == before, "deleted probe triggered a rebuild")
    // the anti-join removes EXACTLY the tombstoned hashes, nothing else
    assert(served == (skRows -- tombs),
      "served hash set != sketches minus tombstones — anti-join key broken")
  }

  test("compact: physical drop only — answers equal the deleted probe, no rebuild") {
    KmvStore.ensureCompact(spark, d)
    val before = KmvStore.builds.get()
    // the compacted rows are exactly sketches minus tombstones
    val tombs = spark.read.parquet(s"${KmvStore.tombDir(KmvStore.storeRoot(d))}/ids")
      .select("h").collect().map(_.getLong(0)).toSet
    val skRows = KmvStore.sketches(spark, d)
      .collect().map(r => (r.getDate(0).toString, r.getLong(1))).toSet
    val compRows = spark.read
      .parquet(s"${KmvStore.compactDir(KmvStore.storeRoot(d))}/sketches")
      .selectExpr("CAST(t AS DATE) AS t", "h")
      .collect().map(r => (r.getDate(0).toString, r.getLong(1))).toSet
    assert(compRows == skRows.filterNot { case (_, h) => tombs(h) },
      "compacted sketches are not exactly sketches minus tombstones")
    // compaction is answer-invariant vs the deleted probe
    val deleted = SparkEntry.queries("kmv_overlap_probe_deleted")(spark, d).collect().toSeq
    val compacted = SparkEntry.queries("kmv_overlap_probe_compacted")(spark, d).collect().toSeq
    assert(compacted == deleted,
      "compacted probe changed an answer — compaction must only change layout")
    assert(KmvStore.builds.get() == before, "compacted probe triggered a rebuild")
  }

  test("compact audit is anchored on the base days (a depleted day stays in the ledger)") {
    // the 64× octave found the limit case: with enough users, a whole
    // day's bottom-k lives inside the tombstone hash band and compaction
    // legitimately empties it — the audit must report that day with
    // k_rows = 0, not drop it (and the empty artifact must READ; the
    // schema-explicit reader covers that)
    val audit = SparkEntry.queries("kmv_store_compact")(spark, d).collect()
    val baseDays = KmvStore.sketches(spark, d).select("t").distinct().count()
    assert(audit.length.toLong == baseDays,
      s"audit covers ${audit.length} days, base has $baseDays")
    assert(audit.forall(r => r.getLong(1) + r.getLong(3) > 0L))
  }
}
