package graft

import org.scalatest.funsuite.AnyFunSuite
import org.apache.spark.sql.functions._

/** JVM references for the bigram-LM scoring family (round 16): the add-one
  * conditional scorer and the Kneser-Ney (D = 1/2) scorer, both recomputed
  * from the raw sf0.001 text with plain Scala maps and the shared
  * fixed-point log2 mirror, compared per-doc against the registered
  * queries. Pins the whole protocol — BOS sentinel, count definitions,
  * smoothing arithmetic, the tf-weighted per-doc fold, and the integer
  * divisions — independently of the DuckDB oracle (which shares SQL
  * ancestry with the queries and so cannot catch a shared misreading).
  */
class LmBigramSpec extends AnyFunSuite {
  import TestSpark.spark

  private val d = TestSpark.Sf0001
  // the queries' BOS sentinel is chr(1) — the reference uses the SAME
  // token (ADVICE r16: an empty-string Bos would conflate a genuine ""
  // token from a leading/doubled space with BOS, mis-specifying the
  // expected values rather than testing the query)
  private val Bos = "\u0001"

  private lazy val corpus: Seq[(Long, Seq[String])] =
    Tables.documents(spark, d).select("doc_id", "text").collect()
      .map(r => (r.getLong(0), r.getString(1).split(" ").toSeq)).toSeq

  /** Token stream with BOS contexts, per doc. */
  private def pairs(toks: Seq[String]): Seq[(String, String)] =
    toks.zipWithIndex.map { case (w, i) => (if (i == 0) Bos else toks(i - 1), w) }

  private lazy val cb: Map[(String, String), Long] =
    corpus.flatMap(c => pairs(c._2)).groupBy(identity).view.mapValues(_.size.toLong).toMap
  private lazy val cc: Map[String, Long] =
    cb.groupBy(_._1._1).view.mapValues(_.values.sum).toMap
  private lazy val sx: Map[String, Long] =
    cb.groupBy(_._1._1).view.mapValues(_.size.toLong).toMap
  private lazy val pw: Map[String, Long] =
    cb.groupBy(_._1._2).view.mapValues(_.size.toLong).toMap
  private lazy val bTypes: Long = cb.size.toLong
  private lazy val vTypes: Long = cb.keys.map(_._2).toSet.size.toLong

  private val lg = TestSpark.log2MicroRef _

  private def docScore(toks: Seq[String], surp: ((String, String)) => Long): Long = {
    val n = toks.length.toLong
    val bits = pairs(toks).map(surp).sum
    bits / n / 1000L
  }

  test("add-one bigram scores equal the JVM reference per doc") {
    val exp = corpus.map { case (id, toks) =>
      id -> docScore(toks, p => lg(cc(p._1) + vTypes) - lg(cb(p) + 1L))
    }.toMap
    val got = SparkEntry.queries("text_lm_surprisal_bigram")(spark, d).collect()
      .map(r => r.getLong(0) -> (r.getLong(2), r.getBoolean(3))).toMap
    assert(got.keySet == exp.keySet)
    got.foreach { case (id, (sm, fl)) =>
      assert(sm == exp(id), s"doc $id: $sm != ${exp(id)}")
      assert(fl == (sm >= TextOps.BigramFlagMilli))
    }
    // non-vacuity at the smoke fixture: both populations exist
    assert(got.values.exists(_._2) && got.values.exists(!_._2),
      "bigram flag vacuous at sf0.001")
  }

  test("Kneser-Ney scores equal the JVM reference per doc") {
    val exp = corpus.map { case (id, toks) =>
      id -> docScore(toks, p =>
        lg(2L * cc(p._1) * bTypes) -
          lg((2L * cb(p) - 1L) * bTypes + sx(p._1) * pw(p._2)))
    }.toMap
    val got = SparkEntry.queries("text_lm_surprisal_kn")(spark, d).collect()
      .map(r => r.getLong(0) -> (r.getLong(2), r.getBoolean(3))).toMap
    assert(got.keySet == exp.keySet)
    got.foreach { case (id, (sm, fl)) =>
      assert(sm == exp(id), s"doc $id: $sm != ${exp(id)}")
      assert(fl == (sm >= TextOps.KnFlagMilli))
    }
    assert(got.values.exists(_._2) && got.values.exists(!_._2),
      "KN flag vacuous at sf0.001")
  }

  test("KN prices rare transitions of common words above the add-one model") {
    // the conditional models' reason to exist: the two scores must not be
    // a monotone transform of each other — continuation counts reorder
    // docs (a doc of common words in rare ORDER moves up under KN).
    // Checked as rank disagreement between the two score vectors.
    val ab = SparkEntry.queries("text_lm_surprisal_bigram")(spark, d).collect()
      .map(r => r.getLong(0) -> r.getLong(2)).toMap
    val kn = SparkEntry.queries("text_lm_surprisal_kn")(spark, d).collect()
      .map(r => r.getLong(0) -> r.getLong(2)).toMap
    val ids = ab.keys.toSeq.sorted
    val disagree = (for (i <- ids; j <- ids if i < j) yield {
      val a = java.lang.Long.compare(ab(i), ab(j))
      val k = java.lang.Long.compare(kn(i), kn(j))
      a * k < 0
    }).count(identity)
    assert(disagree > 0,
      "KN and add-one rank all docs identically — the smoothing is vacuous here")
  }

  test("probability mass sums to one under KN (the formula's own invariant)") {
    // Σ_w P(w|prev) = 1 exactly in the cleared-integer form: summing the
    // numerator over OBSERVED successors (discounted part (2cb−1)·B plus
    // continuation S·pw) and over UNSEEN word types (continuation S·pw
    // only — the clamp max(2cb−1,0) zeroes the discounted part) must give
    // exactly 2·cc·B for every context, because Σ_all-w pw = B. Checked
    // over every context on the smoke fixture, including BOS. A count
    // definition typo (cc vs Σcb, S vs successor count, pw over tokens
    // instead of types) breaks this loudly.
    val pwTotal = pw.values.sum
    assert(pwTotal == bTypes, "Σ continuation counts must equal the type count")
    cc.keys.foreach { prev =>
      val seenDiscounted = cb.collect { case ((p, _), c) if p == prev =>
        (2L * c - 1L) * bTypes }.sum
      val contAll = sx(prev) * pwTotal
      assert(seenDiscounted + contAll == 2L * cc(prev) * bTypes,
        s"context '$prev': mass ${seenDiscounted + contAll} != ${2L * cc(prev) * bTypes}")
    }
  }
}
