package graft

import org.scalatest.funsuite.AnyFunSuite

/** Cross-session contract of the persisted tokenizer stores (VERDICT r17
  * #1): the frozen encode keys answer from the parquet artifacts alone —
  * no learn loop, no per-process spill — and agree with the in-process
  * encoders row for row (same merge table / unigram model serialized, same
  * encode expressions).
  */
class TokenizerStoreSpec extends AnyFunSuite {
  import TestSpark.spark

  private val d = TestSpark.Sf0001

  test("frozen BPE encode equals text_bpe_encode row-for-row") {
    val frozen = SparkEntry.queries("text_bpe_encode_frozen")(spark, d).collect().toSeq
    val direct = SparkEntry.queries("text_bpe_encode")(spark, d).collect().toSeq
    assert(frozen.nonEmpty && frozen == direct,
      s"frozen encode diverged: ${frozen.take(2)} vs ${direct.take(2)}")
  }

  test("frozen unigram encode equals text_unigram_encode row-for-row") {
    val frozen = SparkEntry.queries("text_unigram_encode_frozen")(spark, d).collect().toSeq
    val direct = SparkEntry.queries("text_unigram_encode")(spark, d).collect().toSeq
    assert(frozen.nonEmpty && frozen == direct,
      s"frozen encode diverged: ${frozen.take(2)} vs ${direct.take(2)}")
  }

  test("frozen byte-level encode equals text_bpe_bytes_encode row-for-row") {
    val frozen = SparkEntry.queries("text_bpe_bytes_encode_frozen")(spark, d).collect().toSeq
    val direct = SparkEntry.queries("text_bpe_bytes_encode")(spark, d).collect().toSeq
    assert(frozen.nonEmpty && frozen == direct,
      s"frozen byte encode diverged: ${frozen.take(2)} vs ${direct.take(2)}")
  }

  test("re-encode is probe-only: no build after the stores exist") {
    TokenizerStore.ensureBpe(spark, d)
    TokenizerStore.ensureUni(spark, d)
    TokenizerStore.ensureByte(spark, d)
    val (b0, u0, y0) = (TokenizerStore.bpeBuilds.get(),
      TokenizerStore.uniBuilds.get(), TokenizerStore.byteBuilds.get())
    SparkEntry.queries("text_bpe_encode_frozen")(spark, d).collect()
    SparkEntry.queries("text_unigram_encode_frozen")(spark, d).collect()
    SparkEntry.queries("text_bpe_bytes_encode_frozen")(spark, d).collect()
    assert(TokenizerStore.bpeBuilds.get() == b0,
      "frozen BPE encode triggered a vocab build — the store contract is broken")
    assert(TokenizerStore.uniBuilds.get() == u0,
      "frozen unigram encode triggered a model build — the store contract is broken")
    assert(TokenizerStore.byteBuilds.get() == y0,
      "frozen byte encode triggered a merge-table build — the store contract is broken")
  }

  test("a missing completion marker forces a rebuild (crashed-build safety)") {
    TokenizerStore.ensureBpe(spark, d)
    assert(new java.io.File(TokenizerStore.bpeRoot(d), "_BPE_OK").delete(),
      "marker should exist")
    val before = TokenizerStore.bpeBuilds.get()
    TokenizerStore.ensureBpe(spark, d)
    assert(TokenizerStore.bpeBuilds.get() == before + 1,
      "markerless store was trusted — a crashed build could serve a partial vocab")
  }

  test("store roots fold every learn-geometry dial (a retune cannot serve stale vocabs)") {
    // recompute the key by hand the way bpeRoot/uniRoot do and check each
    // geometry term is load-bearing (the KmvStoreSpec convention)
    val f = Sources.fixtureKey(d, "documents")
    val a = f + s":bpestore:${Bpe.BpeMerges}:${Bpe.BpeBatchK}:${Bpe.BpeLocalWordCap}"
    // pin the REAL root functions to the hand-built keys (ADVICE r18: the
    // dial assertions below only exercise stableHex64 — if bpeRoot/uniRoot
    // ever drop a dial or change key format, these contains() fail loudly
    // instead of the dial checks passing vacuously)
    assert(TokenizerStore.bpeRoot(d).endsWith("_" + Sources.stableHex64(a)),
      "bpeRoot key format drifted from the spec's hand-built key")
    assert(TokenizerStore.uniRoot(d).endsWith("_" + Sources.stableHex64(
        f + s":unistore:${Unigram.MaxSub}:${Unigram.SeedK}:${Unigram.EmRounds}")),
      "uniRoot key format drifted from the spec's hand-built key")
    assert(TokenizerStore.byteRoot(d).endsWith("_" + Sources.stableHex64(
        f + s":bpebytestore:${Bpe.BpeMerges}:${Bpe.BpeBatchK}:${Bpe.BpeLocalWordCap}:" +
        Bpe.BytePretokRe + "|" + Bpe.pertCaseSql + "|" +
        org.apache.spark.sql.graft.ByteAlias.aliasStr)),
      "byteRoot key format drifted from the spec's hand-built key")
    assert(Sources.stableHex64(a) !=
      Sources.stableHex64(f + s":bpestore:${Bpe.BpeMerges * 2}:${Bpe.BpeBatchK}:${Bpe.BpeLocalWordCap}"))
    assert(Sources.stableHex64(a) !=
      Sources.stableHex64(f + s":bpestore:${Bpe.BpeMerges}:${Bpe.BpeBatchK + 1}:${Bpe.BpeLocalWordCap}"))
    val u = f + s":unistore:${Unigram.MaxSub}:${Unigram.SeedK}:${Unigram.EmRounds}"
    assert(Sources.stableHex64(u) !=
      Sources.stableHex64(f + s":unistore:${Unigram.MaxSub}:${Unigram.SeedK * 2}:${Unigram.EmRounds}"))
    assert(Sources.stableHex64(u) !=
      Sources.stableHex64(f + s":unistore:${Unigram.MaxSub}:${Unigram.SeedK}:${Unigram.EmRounds + 1}"))
  }

  test("doc deletion: tombstoned docs present before, absent after, no re-learn") {
    TokenizerStore.ensureBpe(spark, d)
    TokenizerStore.ensureTombDocs(spark, d)
    val b0 = TokenizerStore.bpeBuilds.get()
    val tombs = spark.read
      .parquet(s"${TokenizerStore.tombDir(TokenizerStore.bpeRoot(d))}/ids")
      .collect().map(_.getLong(0)).toSet
    assert(tombs.nonEmpty, "tombstone rule matched no docs — pin would be vacuous")
    val full = SparkEntry.queries("text_bpe_encode_frozen")(spark, d)
      .select("doc_id").collect().map(_.getLong(0)).toSet
    val kept = SparkEntry.queries("text_bpe_encode_frozen_deleted")(spark, d)
      .select("doc_id").collect().map(_.getLong(0)).toSet
    assert(tombs.subsetOf(full), "tombstoned docs missing from the undeleted encode")
    assert(kept == (full -- tombs),
      "deleted encode's doc set != full minus tombstones — anti-join broken")
    assert(TokenizerStore.bpeBuilds.get() == b0,
      "doc deletion triggered a vocab re-learn — the read-time contract is broken")
  }

  test("retrain: unlearns the tombstoned slice, under a rule-keyed root") {
    // the retrained audit must DIFFER from the base build's (deleted docs
    // really did influence the base vocab — pair counts at minimum) while
    // staying structurally identical (same merge count); both sides are
    // independently DuckDB-verified by the gate, this pins non-vacuity
    val base = SparkEntry.queries("bpe_store_build")(spark, d).collect()(0)
    val b0 = TokenizerStore.bpeBuilds.get()
    val rt = SparkEntry.queries("tokenizer_store_retrain")(spark, d).collect()(0)
    assert(rt.getLong(0) == base.getLong(0), "retrain changed the merge count")
    assert(rt.getLong(1) != base.getLong(1),
      "retrained pair_weight equals the base build's — deletion had no " +
      "training effect; the unlearning pin is vacuous")
    assert(TokenizerStore.bpeBuilds.get() == b0,
      "retrain rebuilt the BASE store — it must write only the retrained root")
    // staleness keying: the retrained root folds the delete rule (the
    // ADVICE r18 convention — pin the REAL root function to the hand-built
    // key so format drift fails loudly)
    val f = Sources.fixtureKey(d, "documents")
    val key = f + s":bpestore:${Bpe.BpeMerges}:${Bpe.BpeBatchK}:${Bpe.BpeLocalWordCap}" +
      s":retrain:${Similarity.delTag}"
    assert(TokenizerStore.bpeRetrainRoot(d).endsWith("_" + Sources.stableHex64(key)),
      "bpeRetrainRoot key format drifted from the spec's hand-built key")
    assert(Sources.stableHex64(key) != Sources.stableHex64(
      f + s":bpestore:${Bpe.BpeMerges}:${Bpe.BpeBatchK}:${Bpe.BpeLocalWordCap}" +
      ":retrain:9_10_20"), "a delete-rule retune must move the retrained root")
    assert(new java.io.File(TokenizerStore.bpeRetrainRoot(d), "_BPE_OK").isFile,
      "retrain did not leave a completion marker")
  }

  test("retrained serving: same survivors, genuinely different tokenizer") {
    // the retrained encode serves exactly the surviving doc set (as the
    // deleted encode does) but with the RETRAINED merges/ids — and on
    // this fixture deletion really moved the learned merges (14-16 at
    // every SF), so at least one doc must tokenize differently; identical
    // outputs would mean the retrain key is serving the stale base vocab
    val deleted = SparkEntry.queries("text_bpe_encode_frozen_deleted")(spark, d)
      .collect().map(r => (r.getLong(0), r.getString(3))).toMap
    // probe-only contract on the retrained store too: once the artifact
    // exists, serving must never re-run the retrain (the bpeBuilds
    // convention; code-review, this session — the counter was dead state)
    TokenizerStore.ensureRetrain(spark, d)
    val r0 = TokenizerStore.retrainBuilds.get()
    val retrained = SparkEntry.queries("text_bpe_encode_retrained")(spark, d)
      .collect().map(r => (r.getLong(0), r.getString(3))).toMap
    assert(TokenizerStore.retrainBuilds.get() == r0,
      "retrained serving re-ran the retrain — the store contract is broken")
    assert(retrained.keySet == deleted.keySet,
      "retrained encode serves a different doc set than the deleted encode")
    assert(retrained.exists { case (id, ids) => deleted(id) != ids },
      "retrained encode identical to the base-vocab deleted encode — " +
      "either deletion did not move the merges or the stale vocab is being served")
  }

  test("build summaries are content-sensitive and structurally sane") {
    val b = SparkEntry.queries("bpe_store_build")(spark, d).collect()(0)
    assert(b.getLong(0) == Bpe.BpeMerges.toLong, "merge count drifted")
    // vocab = chars + merges − collisions ⇒ bounded both sides
    assert(b.getLong(2) > b.getLong(0) && b.getLong(3) > 0)
    val u = SparkEntry.queries("unigram_store_build")(spark, d).collect()(0)
    assert(u.getLong(0) >= 2 && u.getLong(1) > 0 && u.getLong(2) > 0)
  }
}
