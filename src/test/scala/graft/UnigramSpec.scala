package graft

import org.scalatest.funsuite.AnyFunSuite
import org.apache.spark.sql.functions._
import org.apache.spark.unsafe.types.UTF8String
import TestSpark.{spark, Sf0001}

/** Pins for the unigram-LM tokenizer (VERDICT r13 #4): the distributed
  * Viterbi-EM loop must equal an in-JVM reference implementation (seeding
  * order, fixed-point costs, tie-breaks, pruning), the native DP expression
  * must match the reference segmentation on adversarial corpora including
  * ties and supplementary-plane text, and the fixed-point kernel must be
  * the one the rest of the codebase pins.
  */
class UnigramSpec extends AnyFunSuite {

  private def cps(w: String): Seq[String] =
    w.codePoints().toArray.toSeq.map(cp => new String(Character.toChars(cp)))

  private def utf8Less(a: String, b: String): Boolean =
    UTF8String.fromString(a).compareTo(UTF8String.fromString(b)) < 0

  private def l2(x: Long): Long = TestSpark.log2MicroRef(x)

  /** Reference Viterbi over code points: min (cost, ntok, seg UTF-8 ASC). */
  private def refViterbi(word: String, costs: Map[String, Long], unk: Long)
      : Seq[String] = {
    val c = cps(word)
    val n = c.length
    if (n == 0) return Seq.empty
    val dp = new Array[(Long, Int, String)](n + 1)
    dp(0) = (0L, 0, "")
    for (p <- 1 to n) {
      var best: (Long, Int, String) = null
      for (l <- 1 to math.min(Unigram.MaxSub, p)) {
        val tok = c.slice(p - l, p).mkString
        val tc = costs.get(tok) match {
          case Some(x) => Some(x)
          case None => if (l == 1) Some(unk) else None
        }
        tc.foreach { x =>
          val cand = (dp(p - l)._1 + x, dp(p - l)._2 + 1,
            if (dp(p - l)._3.isEmpty) tok else dp(p - l)._3 + " " + tok)
          if (best == null || cand._1 < best._1 || (cand._1 == best._1 &&
              (cand._2 < best._2 ||
                (cand._2 == best._2 && utf8Less(cand._3, best._3)))))
            best = cand
        }
      }
      dp(p) = best
    }
    dp(n)._3.split(" ").toSeq
  }

  /** Reference learner: seed (chars + top-SeedK substrings), EmRounds of
    * Viterbi-count-prune, exact fixed-point costs — the whole protocol.
    */
  private def refLearn(wf: Map[String, Long]): (Seq[(String, Long, Long)], Long) = {
    val cand = scala.collection.mutable.Map[String, Long]()
    for ((w, f) <- wf; c = cps(w); i <- c.indices;
         l <- 1 to math.min(Unigram.MaxSub, c.length - i))
      cand(c.slice(i, i + l).mkString) = cand.getOrElse(c.slice(i, i + l).mkString, 0L) + f
    val chars = cand.keys.filter(t => cps(t).length == 1).toSeq.sortWith(utf8Less)
    val multi = cand.keys.filter(t => cps(t).length >= 2).toSeq
      .sortWith((x, y) => cand(x) > cand(y) || (cand(x) == cand(y) && utf8Less(x, y)))
      .take(Unigram.SeedK)
    val isChar = chars.toSet
    var vocab: Seq[(String, Long)] =
      chars.map(t => (t, cand(t))) ++ multi.map(t => (t, cand(t)))
    var tot = vocab.map(_._2).sum
    for (_ <- 1 to Unigram.EmRounds) {
      val costs = vocab.map { case (t, c) => (t, l2(tot) - l2(c)) }.toMap
      val unk = l2(tot)
      val usage = scala.collection.mutable.Map[String, Long]()
      for ((w, f) <- wf if w.nonEmpty; t <- refViterbi(w, costs, unk))
        usage(t) = usage.getOrElse(t, 0L) + f
      vocab = chars.map(t => (t, math.max(usage.getOrElse(t, 0L), 1L))) ++
        vocab.collect { case (t, _) if !isChar(t) && usage.getOrElse(t, 0L) >= 1L =>
          (t, usage(t)) }
      tot = vocab.map(_._2).sum
    }
    (vocab.map { case (t, c) => (t, c, l2(tot) - l2(c)) }, tot)
  }

  private def wfOf(d: String): Map[String, Long] =
    Tables.documents(spark, d)
      .select(explode(split(col("text"), " ")).as("word"))
      .where(col("word") =!= "")
      .groupBy("word").agg(count(lit(1)).as("f")).collect()
      .map(r => r.getString(0) -> r.getLong(1)).toMap

  test("fixed-point kernel is the shared one") {
    for (x <- Seq(1L, 2L, 3L, 7L, 1023L, 1024L, 87122L, 999999937L))
      assert(Unigram.log2Micro(x) == TestSpark.log2MicroRef(x))
  }

  test("learned vocab equals the in-JVM reference (tokens, counts, costs)") {
    val (expVocab, _) = refLearn(wfOf(Sf0001))
    val exp = expVocab.sortBy { case (t, c, _) => (-c, t) }
    val got = SparkEntry.queries("text_unigram_vocab")(spark, Sf0001).collect()
      .map(r => (r.getString(0), r.getLong(1), r.getLong(2))).toSeq
    assert(got == exp, s"vocab drift:\n got=$got\n exp=$exp")
    // the model is non-trivial: multi-char tokens survive EM
    assert(got.exists { case (t, _, _) => t.length >= 2 },
      "no multi-char token survived — the tokenizer degenerated to chars")
  }

  test("encode equals the reference Viterbi under the final model") {
    val wf = wfOf(Sf0001)
    val (vocab, tot) = refLearn(wf)
    val costs = vocab.map { case (t, _, cm) => (t, cm) }.toMap
    val ids = vocab.map(_._1).sortWith(utf8Less).zipWithIndex
      .map { case (t, i) => (t, i + 2L) }.toMap
    val docs = Tables.documents(spark, Sf0001).select("doc_id", "text").collect()
      .map(r => r.getLong(0) -> r.getString(1)).toMap
    val got = SparkEntry.queries("text_unigram_encode")(spark, Sf0001).collect()
      .map(r => r.getLong(0) -> ((r.getLong(1), r.getLong(2), r.getString(3)))).toMap
    assert(got.keySet == docs.keySet)
    docs.foreach { case (id, text) =>
      val words = text.split(" ", -1).toSeq.filter(_.nonEmpty)
      val segs = words.map(w => refViterbi(w, costs, l2(tot)))
      val exp = (words.size.toLong, segs.map(_.size.toLong).sum,
        segs.map(_.map(ids).mkString(" ")).mkString(" "))
      assert(got(id) == exp, s"doc $id encode drift: got=${got(id)} exp=$exp")
    }
    // segmentation is non-trivial: some word uses a multi-char token
    assert(docs.values.flatMap(_.split(" ", -1)).filter(_.nonEmpty)
      .exists(w => refViterbi(w, costs, l2(tot)).exists(t => t.length >= 2)),
      "every segmentation is per-char — the model never fires")
  }

  test("EM pruning actually drops seeded candidates (non-vacuity)") {
    // seed size = |alphabet| + min(SeedK, multi-char candidate count);
    // the final vocab must be strictly smaller on the fixture — EM pruned
    val wf = wfOf(Sf0001)
    val cand = scala.collection.mutable.Set[String]()
    for ((w, _) <- wf; c = cps(w); i <- c.indices;
         l <- 2 to math.min(Unigram.MaxSub, c.length - i))
      cand += c.slice(i, i + l).mkString
    val alphabet = wf.keys.flatMap(cps).toSet.size
    val seedSize = alphabet + math.min(Unigram.SeedK, cand.size)
    val finalSize = SparkEntry.queries("text_unigram_vocab")(spark, Sf0001).count()
    assert(finalSize < seedSize,
      s"no pruning: seed $seedSize -> final $finalSize")
    assert(finalSize > alphabet, "everything pruned — only chars survived")
  }

  test("native DP expression equals the reference on ties and astral text") {
    // equal-cost segmentations force the (cost, ntok, seg) tie-break:
    // with uniform costs, 'abab' splits as [ab ab]/[a bab]/[aba b]/... and
    // the winner must be the UTF-8-least seg among min-cost min-ntok; the
    // astral words pin code-point slicing + UTF-8 seg comparison (a UTF-16
    // comparator would order the surrogate-pair token below '' here)
    val astral = "𝕒" // U+1D552
    val vocabs = Seq(
      Seq("a" -> 10L, "b" -> 10L, "ab" -> 10L, "ba" -> 10L, "aba" -> 10L, "bab" -> 10L),
      Seq("a" -> 7L, "b" -> 9L, "ab" -> 16L, "ba" -> 3L),
      Seq("a" -> 5L, "b" -> 5L, astral -> 5L, s"a$astral" -> 5L, s"${astral}b" -> 5L,
        "" -> 5L, s"a" -> 5L)
    )
    val words = Seq("abab", "ababa", "bbbb", "ab", "a", "",
      s"a${astral}b", s"a$astral", s"$astral$astral", "ab")
    import spark.implicits._
    for (v <- vocabs) {
      val costs = v
      val got = words.toDF("word")
        .withColumn("seg", org.apache.spark.sql.graft.UnigramOps
          .unigram_segment(col("word"), costs, Unigram.MaxSub, 99000000L))
        .collect().map(r => r.getString(0) -> r.getSeq[String](1).toSeq).toMap
      words.foreach { w =>
        val exp = refViterbi(w, costs.toMap, 99000000L)
        assert(got(w) == exp, s"native drift on '$w' under $v: got=${got(w)} exp=$exp")
      }
    }
  }

  test("pack_sequences_unigram: bins are exact PackSeqLen slices of the shard streams") {
    // rebuild each shard's id stream from text_unigram_encode's per-doc
    // streams in doc order; every bin must be the exact PackSeqLen slice
    // at its offset and per-shard totals must conserve ids (the
    // pack_sequences_bpe pin, under this tokenizer)
    val enc = SparkEntry.queries("text_unigram_encode")(spark, Sf0001).collect()
      .map(r => (r.getLong(0), r.getString(3)))
    val shardStream = enc.groupBy { case (id, _) => id % TextOps.PackShards }
      .view.mapValues(_.sortBy(_._1).flatMap(_._2.split(" ")).toSeq).toMap
    val packed = SparkEntry.queries("pack_sequences_unigram")(spark, Sf0001).collect()
      .map(r => (r.getLong(0), r.getLong(1), r.getLong(2), r.getString(3)))
    assert(packed.nonEmpty)
    packed.groupBy(_._1).foreach { case (shard, bins) =>
      val stream = shardStream(shard)
      val sorted = bins.sortBy(_._2)
      assert(sorted.map(_._3).sum == stream.length.toLong,
        s"shard $shard: packed ids != stream length")
      sorted.foreach { case (_, bin, n, ids) =>
        val off = (bin * TextOps.PackSeqLen).toInt
        val slice = stream.slice(off, off + TextOps.PackSeqLen)
        assert(ids.split(" ").toSeq == slice && n == slice.length.toLong,
          s"shard $shard bin $bin is not the exact stream slice")
      }
      assert(sorted.dropRight(1).forall(_._3 == TextOps.PackSeqLen.toLong),
        s"shard $shard has a short interior bin")
    }
  }

  test("novel-encode contract: UNK reachable, model transfers to unseen words") {
    // the text_bpe_encode_novel protocol under the unigram family: learn on
    // the train split, perturb held-out docs (1-based p%7==1 upper-cased →
    // unseen chars, p%7==4 reversed → novel words), encode under the
    // train model with the DP's native per-code-point UNK edge
    val allDocs = Tables.documents(spark, Sf0001).select("doc_id", "text").collect()
      .map(r => r.getLong(0) -> r.getString(1)).toSeq
    val trainWf: Map[String, Long] = allDocs
      .filter { case (id, _) => id % 10 != Bpe.NovelResidue }
      .flatMap(_._2.split(" ", -1)).filter(_.nonEmpty)
      .groupBy(identity).map { case (w, ws) => w -> ws.size.toLong }
    val (vocab, tot) = refLearn(trainWf)
    val costs = vocab.map { case (t, _, cm) => (t, cm) }.toMap
    val ids = vocab.map(_._1).sortWith(utf8Less).zipWithIndex
      .map { case (t, i) => (t, i + 2L) }.toMap
    val unk = l2(tot)
    val got = SparkEntry.queries("text_unigram_encode_novel")(spark, Sf0001).collect()
      .map(r => r.getLong(0) ->
        ((r.getLong(1), r.getLong(2), r.getLong(3), r.getString(4)))).toMap
    val held = allDocs.filter { case (id, _) => id % 10 == Bpe.NovelResidue }
    assert(got.keySet == held.map(_._1).toSet)
    var unkSeen = false
    var novelMulti = false
    held.foreach { case (id, text) =>
      // perturbation BEFORE the empty filter — positions count every split
      // slot, the registered query's posexplode semantics
      val words = text.split(" ", -1).toSeq.zipWithIndex.map { case (w, i) =>
        val p = i + 1
        if (p % 7 == 1) w.toUpperCase
        else if (p % 7 == 4) w.reverse
        else w
      }.filter(_.nonEmpty)
      val segs = words.map(w => refViterbi(w, costs, unk))
      val idStreams = segs.map(_.map(t => ids.getOrElse(t, 1L)))
      val nUnk = idStreams.map(_.count(_ == 1L).toLong).sum
      if (nUnk > 0) unkSeen = true
      words.zip(segs).foreach { case (w, sg) =>
        if (!trainWf.contains(w) && sg.exists(t => cps(t).length >= 2 && ids.contains(t)))
          novelMulti = true
      }
      val exp = (words.size.toLong, idStreams.map(_.size.toLong).sum, nUnk,
        idStreams.map(_.mkString(" ")).mkString(" "))
      assert(got(id) == exp, s"doc $id novel-encode drift: got=${got(id)} exp=$exp")
    }
    // both novel populations are non-vacuous on the fixture
    assert(unkSeen, "UNK never fired — the unseen-character population is vacuous")
    assert(novelMulti,
      "no novel word received a multi-char train token — the transfer claim is vacuous")
  }

  test("unk fallback fires per code point on out-of-vocab characters") {
    import spark.implicits._
    val costs = Seq("a" -> 1000000L, "b" -> 1000000L, "ab" -> 1500000L)
    val got = Seq("axb", "xyz", "abx").toDF("word")
      .withColumn("seg", org.apache.spark.sql.graft.UnigramOps
        .unigram_segment(col("word"), costs, Unigram.MaxSub, 5000000L))
      .collect().map(r => r.getString(0) -> r.getSeq[String](1).toSeq).toMap
    assert(got("axb") == Seq("a", "x", "b"))
    assert(got("xyz") == Seq("x", "y", "z"))
    assert(got("abx") == Seq("ab", "x"))
  }
}
