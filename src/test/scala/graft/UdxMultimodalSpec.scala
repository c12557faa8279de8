package graft

import org.scalatest.funsuite.AnyFunSuite
import org.apache.spark.sql.functions._
import TestSpark.{spark, Sf0001}

class UdxMultimodalSpec extends AnyFunSuite {
  private def q(name: String) = SparkEntry.queries(name)(spark, Sf0001)

  test("udf_scalar equals the codegen'd built-in") {
    val viaUdf = q("udf_scalar").collect().map(r => r.getLong(0) -> r.getInt(1)).toMap
    val viaBuiltin = Tables.documents(spark, Sf0001)
      .select(col("doc_id"), size(split(col("text"), " ")).as("n"))
      .collect().map(r => r.getLong(0) -> r.getInt(1)).toMap
    assert(viaUdf == viaBuiltin)
  }

  test("typed Aggregator moments match SQL aggregation") {
    val agg = q("udaf_typed").collect()
      .map(r => r.getString(0) -> ((r.getLong(1), r.getLong(2), r.getLong(3)))).toMap
    val sql = Tables.lineitem(spark, Sf0001)
      .groupBy("l_returnflag")
      .agg(count(lit(1)).as("n"),
        sum(col("l_quantity").cast("long")).as("s"),
        sum(col("l_quantity").cast("long") * col("l_quantity").cast("long")).as("ss"))
      .collect().map(r => r.getString(0) -> ((r.getLong(1), r.getLong(2), r.getLong(3)))).toMap
    assert(agg == sql)
  }

  test("udtf_explode emits length-3 grams at every interior position") {
    val rows = q("udtf_explode").collect()
    assert(rows.nonEmpty)
    rows.filter(_.getInt(1) <= 15).foreach(r => assert(r.getString(2).length == 3))
  }

  test("real decode: payloads are genuine PNGs, decode is deterministic and exact") {
    val a = q("mm_decode_features").collect().toSeq
    val b = q("mm_decode_features").collect().toSeq
    assert(a == b)
    assert(a.head.schema.fieldNames.toSeq ==
      Seq("doc_id", "width", "height", "channels", "mean_r", "mean_g", "mean_b"))
    a.foreach { r =>
      assert(r.getInt(1) >= 8 && r.getInt(1) <= 16)  // width from the header
      assert(r.getInt(2) >= 8 && r.getInt(2) <= 14)  // height
      assert(r.getInt(3) == 3)                       // channels from the color model
      Seq(4, 5, 6).foreach(i => assert(r.getLong(i) >= 0 && r.getLong(i) <= 255))
      // g = 255 - r pixel-wise, so the floor means satisfy this identity
      assert(r.getLong(4) + r.getLong(5) >= 254 && r.getLong(4) + r.getLong(5) <= 255,
        s"channel identity broken: ${r.getLong(4)} + ${r.getLong(5)}")
    }
    // the payload really is a PNG byte stream (magic header), and the
    // codec round-trip is exact on a synthetic multi-byte text too
    val png = Multimodal.renderPng(7L, "héllo 中文 𝓌orld")
    assert((png(0) & 0xff) == 0x89 && png(1) == 'P' && png(2) == 'N' && png(3) == 'G')
    val f = Multimodal.decodePng(7L, png)
    assert(f.width == 8 + 7 % 9 && f.height == 8 + 7 % 7 && f.channels == 3)
  }

  test("real audio decode: payloads are genuine WAVs, codec round-trip exact") {
    val rows = q("mm_audio_features").collect()
    assert(rows.nonEmpty)
    rows.foreach { r =>
      assert(r.getInt(1) >= 8000 && r.getInt(1) <= 12000)   // rate from header
      assert(r.getLong(2) >= 200 && r.getLong(2) < 500)     // frames from header
      assert(r.getLong(3) >= 0 && r.getLong(3) <= 255)      // mean amp
      assert(r.getLong(4) >= r.getLong(3))                  // peak >= mean
    }
    // RIFF/WAVE magic proves a real container, and the codec round-trips
    // a multi-byte text deterministically
    val wav = Multimodal.renderWav(3L, "héllo 中文 𝓌")
    assert(new String(wav.take(4), "US-ASCII") == "RIFF" &&
      new String(wav.slice(8, 12), "US-ASCII") == "WAVE", "not a WAV container")
    val f = Multimodal.decodeWav(3L, wav)
    assert(f.sample_rate == 8000 + 1000 * 3 && f.n_samples == 200 + 3 % 300)
    assert(f == Multimodal.decodeWav(3L, Multimodal.renderWav(3L, "héllo 中文 𝓌")))
  }

  test("real video decode: payloads are genuine animated GIFs, frames distinct") {
    val rows = q("mm_video_frame_features").collect()
    val byDoc = rows.groupBy(_.getLong(0))
    byDoc.foreach { case (id, fs) =>
      assert(fs.length == 2 + (id % 4).toInt, s"doc $id: frame count from container")
    }
    // the 77-shift makes frame means differ for MOST docs, but a specific
    // wrap pattern can legitimately floor two frames to the same mean
    // (code-review r17: a per-doc assertion would be flaky on correct
    // code) — pin the corpus-level property instead: the overwhelming
    // majority of docs must show distinct per-frame means, or the decode
    // collapsed the sequence
    val distinctFrac = byDoc.values.count(fs =>
      fs.map(_.getLong(4)).distinct.length > 1).toDouble / byDoc.size
    assert(distinctFrac >= 0.9,
      f"only $distinctFrac%.2f of docs show distinct frame means — sequence collapsed?")
    val gif = Multimodal.renderGif(5L, "héllo 中文 𝓌")
    assert(new String(gif.take(6), "US-ASCII") == "GIF89a", "not a GIF container")
    val fr = Multimodal.decodeGif(5L, gif)
    assert(fr.length == 2 + (5 % 4) && fr.forall(f => f.width == 8 + 5 % 9 && f.height == 8 + 5 % 7))
    assert(fr == Multimodal.decodeGif(5L, Multimodal.renderGif(5L, "héllo 中文 𝓌")))
  }

  test("binary meta byte length equals UTF-8 text length") {
    val meta = q("mm_binary_meta").collect().map(r => r.getLong(0) -> r.getInt(1)).toMap
    Tables.documents(spark, Sf0001).select("doc_id", "text").limit(20).collect()
      .foreach { r =>
        assert(meta(r.getLong(0)) == r.getString(1).getBytes("UTF-8").length) }
  }

  test("frame sample: one frame per 64-byte stride, deterministic hashes") {
    val rows = q("mm_frame_sample").collect()
    val byDoc = rows.groupBy(_.getLong(0))
    val sizes = Tables.documents(spark, Sf0001).select("doc_id", "text").collect()
      .map(r => r.getLong(0) -> r.getString(1).getBytes("UTF-8").length).toMap
    byDoc.foreach { case (id, frames) =>
      val expected = math.max((sizes(id) - 16) / 64, 0) + 1
      assert(frames.length == expected, s"doc $id: ${frames.length} vs $expected")
    }
  }

  test("int8 quantization: checksums match a JVM reference and bounds hold") {
    val got = q("mm_embed_quantize").collect()
      .map(r => r.getLong(0) -> ((r.getDouble(1), r.getLong(2), r.getLong(3)))).toMap
    Tables.embeddings(spark, Sf0001).select("vec_id", "embedding").limit(50).collect()
      .foreach { r =>
        val v = r.getSeq[Float](1).map(_.toDouble)
        val maxabs = v.map(math.abs).max
        // BigDecimal HALF_UP = half away from zero, matching Spark's round()
        // on doubles and DuckDB's libm round (JVM math.round would round a
        // negative .5 toward +inf instead)
        val qs = v.map(x => BigDecimal(x * 127.0 / maxabs)
          .setScale(0, BigDecimal.RoundingMode.HALF_UP).toLong)
        val (s, l1) = (qs.sum, qs.map(math.abs).sum)
        val (gm, gs, gl1) = got(r.getLong(0))
        assert(gm == maxabs && gs == s && gl1 == l1, s"vec ${r.getLong(0)}")
        assert(qs.forall(q => math.abs(q) <= 127))
      }
  }

  test("phash clusters match an in-test union-find over the phash pairs") {
    val labels = q("mm_phash_cluster").collect()
      .map(r => r.getLong(0) -> r.getLong(1)).toMap
    val pairs = q("mm_phash_dedup").collect()
      .map(r => (r.getLong(0), r.getLong(1)))
    assert(pairs.nonEmpty, "no phash pairs in fixture — test is vacuous")
    val parent = scala.collection.mutable.Map.empty[Long, Long]
    def find(x: Long): Long = {
      val p = parent.getOrElse(x, x)
      if (p == x) x else { val r = find(p); parent(x) = r; r }
    }
    pairs.foreach { case (a, b) =>
      val (ra, rb) = (find(a), find(b))
      if (ra != rb) { val (lo, hi) = if (ra < rb) (ra, rb) else (rb, ra); parent(hi) = lo }
    }
    labels.foreach { case (doc, cluster) =>
      assert(cluster == find(doc), s"doc $doc: $cluster vs ${find(doc)}") }
    // the clique-collapse point: cluster rows = docs, pairs may be far more
    assert(labels.size == Tables.documents(spark, Sf0001).count())
  }

  /** Independent JVM reference of the integer DCT pHash: the direct
    * (non-separable) double sum over the same literal cosine table — a
    * DIFFERENT summation order than the engine's two-pass form, but exact
    * integer arithmetic makes them provably equal.
    */
  private def refPhash(text: String): Option[Long] = {
    import Multimodal.{DctT, PhashBits, PhashWindow}
    val bytes = text.take(PhashWindow).map(_.toLong)
    if (bytes.isEmpty) None
    else {
      val g = Array.fill(64)(0L)
      bytes.zipWithIndex.foreach { case (b, p) => g(p / (PhashWindow / 64)) += b }
      var h = 0L
      for (u <- 0 until 8; v <- 0 until 8; k = u * 8 + v; if k >= 1 && k <= PhashBits) {
        var c = 0L
        for (i <- 0 until 8; j <- 0 until 8) c += g(i * 8 + j) * DctT(u)(i) * DctT(v)(j)
        if (c > 0) h |= 1L << (PhashBits - k)
      }
      Some(h)
    }
  }

  test("phash dedup equals a brute-force DCT signature + all-pairs Hamming scan") {
    import Multimodal.PhashMaxHamming
    val got = q("mm_phash_dedup").collect()
      .map(r => (r.getLong(0), r.getLong(1), r.getInt(2))).toSet
    // JVM reference: same DCT signature, then ALL pairs (the pigeonhole
    // band join must lose nothing under the Hamming bound — completeness
    // is the property banding is trusted with)
    val sigs = Tables.documents(spark, Sf0001).select("doc_id", "text").collect()
      .flatMap(r => refPhash(r.getString(1)).map(r.getLong(0) -> _))
    val expected = (for {
      (da, sa) <- sigs; (db, sb) <- sigs if da < db
      h = java.lang.Long.bitCount(sa ^ sb) if h <= PhashMaxHamming
    } yield (da, db, h)).toSet
    assert((got -- expected).isEmpty, s"spurious: ${(got -- expected).take(5)}")
    assert((expected -- got).isEmpty, s"missing: ${(expected -- got).take(5)}")
    assert(expected.nonEmpty, "no phash pairs in fixture — test is vacuous")
  }

  test("DCT phash pairs near-dups: a localized single-byte edit stays under the Hamming bound") {
    import Multimodal.{PhashMaxHamming, PhashWindow}
    import spark.implicits._
    // 20 longest fixture docs, each paired with a copy whose middle byte
    // (inside the signature window) is substituted — the image-pipeline
    // near-dup class (a localized pixel-block change after decode).
    val base = Tables.documents(spark, Sf0001).select("doc_id", "text").collect()
      .filter(_.getString(1).length >= 64)
      .sortBy(r => (-r.getString(1).length, r.getLong(0))).take(20)
      .map(r => (r.getLong(0), r.getString(1)))
    val rows = base.flatMap { case (id, t) =>
      val m = math.min(t.length / 2, PhashWindow / 2)
      val edited = t.updated(m, if (t(m) != 'x') 'x' else 'y')
      Seq((id * 2, t), (id * 2 + 1, edited))
    }.toSeq.toDF("doc_id", "text")
    // drive the ENGINE's signature builder on the perturbed corpus
    val sig = Multimodal.phashOf(spark, rows).collect()
      .map(r => r.getLong(0) -> r.getLong(1)).toMap
    val hammings = base.map { case (id, _) =>
      java.lang.Long.bitCount(sig(id * 2) ^ sig(id * 2 + 1)) }
    // sign bits near zero can flip — bounded, and mostly they don't:
    // measured distribution on this fixture is max 8, 17/20 within the
    // pairing bound; asserted with margin
    assert(hammings.max <= 10, s"unstable signature: $hammings")
    assert(hammings.count(_ <= PhashMaxHamming) >= 14,
      s"too few perturbed docs would pair: $hammings")
    // and the engine agrees with the independent JVM reference on them
    base.foreach { case (id, t) =>
      assert(sig(id * 2) == refPhash(t).get, s"doc $id engine vs reference") }
  }

  test("fused dct_sign_hash equals the five-stage relational phash (round 11)") {
    import spark.implicits._
    def sigs(df: org.apache.spark.sql.DataFrame) = Map(
      "fused" -> Multimodal.phashOf(spark, df).collect()
        .map(r => r.getLong(0) -> r.getLong(1)).toMap,
      "rel" -> Multimodal.phashOfReference(spark, df).collect()
        .map(r => r.getLong(0) -> r.getLong(1)).toMap)
    // whole fixture corpus
    val corpus = sigs(Tables.documents(spark, Sf0001).select("doc_id", "text"))
    assert(corpus("fused") == corpus("rel"), "fused phash drifted on the corpus")
    assert(corpus("fused").nonEmpty)
    // edge rows: empty text (signature 0 via the split('')/ascii('') path),
    // sub-cell text, a non-ASCII payload (codepoint/unit framing), and one
    // longer than the window
    val edge = sigs(Seq((1L, ""), (2L, "ab"), (3L, "héllo wörld 你好"),
      (4L, "xy " * 300)).toDF("doc_id", "text"))
    assert(edge("fused") == edge("rel"), s"fused phash drifted on edge rows: $edge")
    assert(edge("fused")(1L) == 0L, "empty text no longer hashes to 0")
  }

  test("embed_dim_stats: all 64 dims, uniform counts, nonnegative variance") {
    val rows = SparkEntry.queries("embed_dim_stats")(spark, TestSpark.Sf001).collect()
    assert(rows.length == 64)
    assert(rows.map(_.getInt(0)).toSeq == (0 until 64))
    val n = rows.head.getLong(1)
    assert(rows.forall(_.getLong(1) == n), "ragged per-dim counts")
    rows.foreach { r =>
      val (s, sq) = (r.getLong(2), r.getLong(3))
      // n·Σx² ≥ (Σx)² ⇔ sample variance ≥ 0 — fails if the micro-unit
      // conversion ever mangles a value
      assert(sq * n >= s * s, s"dim ${r.getInt(0)}: negative variance")
      assert(r.getDouble(4) == s.toDouble / n, s"dim ${r.getInt(0)}: mean drift")
    }
  }

  test("embed_gram_matrix equals a driver-side Gram accumulation") {
    val got = SparkEntry.queries("embed_gram_matrix")(spark, TestSpark.Sf0001)
      .collect()
      .map(r => (r.getInt(0), r.getInt(1)) -> ((r.getLong(2), r.getLong(3)))).toMap
    // HALF_UP (= round half away from zero), the rule BOTH engines apply to
    // doubles — scala math.round would floor negative .5 ties instead
    def microRound(x: Double): Long =
      BigDecimal(x).setScale(0, BigDecimal.RoundingMode.HALF_UP).toLong
    val vecs = Tables.embeddings(spark, TestSpark.Sf0001)
      .select("embedding").collect()
      .map(_.getSeq[Float](0).map(v => microRound(v.toDouble * 1000000.0)).toArray)
    assert(got.size == 64 * 65 / 2, s"expected full upper triangle, got ${got.size}")
    val expected = scala.collection.mutable.Map.empty[(Int, Int), Long]
    vecs.foreach { m =>
      for (i <- 0 until 64; j <- i until 64)
        expected((i, j)) = expected.getOrElse((i, j), 0L) + m(i) * m(j)
    }
    got.foreach { case (k, (n, g)) =>
      assert(n == vecs.length, s"$k: n")
      assert(g == expected(k), s"$k: gram ${g} vs ${expected(k)}")
    }
    // diagonal = Σ micro² must be strictly positive (no dead fixture dims)
    (0 until 64).foreach(i => assert(got((i, i))._2 > 0, s"dead dim $i"))
  }

  test("image histogram: bins conserve the pixel count and spread beyond one bucket") {
    val rows = q("mm_image_histogram").collect()
    assert(rows.nonEmpty)
    rows.foreach { r =>
      val (w, h) = (r.getInt(1), r.getInt(2))
      val bins = (3 to 6).map(r.getLong)
      assert(bins.sum == w.toLong * h,
        s"doc ${r.getLong(0)}: bins ${bins.sum} != $w x $h pixels")
      assert(bins.forall(_ >= 0))
    }
    // non-vacuous: real text pixels are not monochrome — at least one doc
    // populates 2+ bins, and 2+ bins are hit corpus-wide (ASCII codepoints
    // land in bins 0-1 only; the upper bins fill on non-Latin content, so
    // all-four coverage would be a fixture assumption, not a decode pin)
    assert(rows.exists(r => (3 to 6).count(i => r.getLong(i) > 0) >= 2),
      "every image collapsed into a single intensity bin")
    assert((3 to 6).count(i => rows.exists(_.getLong(i) > 0)) >= 2,
      "the whole corpus collapsed into one intensity bin")
  }

  test("audio frame energies: frame count and widths follow the decoded PCM length") {
    val rows = q("mm_audio_energy_windows").collect()
      .map(r => (r.getLong(0), r.getInt(1), r.getLong(2), r.getLong(3)))
    assert(rows.nonEmpty)
    rows.groupBy(_._1).foreach { case (doc, frames) =>
      val n = 200 + (doc % 300) // the decoded PCM length (header-verified
                                // by the features spec; framing must match)
      val sorted = frames.sortBy(_._2)
      assert(sorted.map(_._2).sameElements(sorted.indices),
        s"doc $doc: frame indices not contiguous")
      assert(sorted.map(_._3).sum == n, s"doc $doc: frames lose samples")
      // all full frames are 50 samples; only the LAST may be partial
      sorted.init.foreach { case (_, _, ns, _) => assert(ns == 50) }
      assert(sorted.last._3 == (if (n % 50 == 0) 50 else n % 50))
    }
    // non-vacuous: energies differ across frames somewhere (a flat corpus
    // would make the framing pointless)
    assert(rows.groupBy(_._1).exists(_._2.map(_._4).distinct.length > 1),
      "every doc has identical frame energies")
  }
}
