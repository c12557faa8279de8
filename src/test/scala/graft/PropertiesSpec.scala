package graft

import org.scalatest.funsuite.AnyFunSuite
import org.scalacheck.Gen
import org.scalacheck.rng.Seed
import org.apache.spark.sql.functions._
import TestSpark.spark

/** Property-based checks (SURVEY.md §5.5) over scalacheck-generated
  * in-memory data — fixture-independent algebraic guarantees. (No
  * scalatest-plus bridge in the offline cache, so generators are sampled
  * manually under fixed seeds — still property tests, just deterministic.)
  */
class PropertiesSpec extends AnyFunSuite {
  import spark.implicits._

  private def samples[T](g: Gen[T], n: Int): Seq[T] =
    (0 until n).flatMap(i => g.apply(Gen.Parameters.default, Seed(42L + i)))

  private val vocab = Gen.oneOf("the", "fast", "key", "scan", "merge", "row", "agg")
  private val docGen: Gen[List[String]] = Gen.chooseNum(3, 12)
    .flatMap(n => Gen.listOfN(n, vocab))

  test("mhash lands in [0, m) for arbitrary ids, including negatives") {
    // the sampling primitive must never throw under ANSI (overflow) or
    // emit an out-of-range bucket; negative ids are safe on the Spark side
    // (pmod), though the literal % SQL mirror is documented positive-only
    // chooseNum samples range endpoints as special values — Long.MinValue
    // included deliberately: an abs()/negation-based rewrite would overflow
    // exactly there
    val ids = samples(Gen.chooseNum(Long.MinValue, Long.MaxValue), 200)
    val df = ids.toDF("id").select(Det.mhash(col("id"), 1000L).as("b"))
    val buckets = df.collect().map(_.getLong(0))
    assert(buckets.forall(b => b >= 0 && b < 1000))
  }

  test("exact dedup is idempotent and keeps one row per distinct text") {
    samples(Gen.listOfN(30, docGen.map(_.mkString(" "))), 10).foreach { texts =>
      val df = texts.zipWithIndex.map { case (t, i) => (i.toLong, t) }.toDF("doc_id", "text")
      val once = df.groupBy("text").agg(min("doc_id").as("doc_id"))
      val twice = once.groupBy("text").agg(min("doc_id").as("doc_id"))
      assert(once.count() == texts.distinct.length)
      assert(twice.count() == once.count())
    }
  }

  test("identical generated texts hash identically (dedup collision guarantee)") {
    samples(docGen.map(_.mkString(" ")), 10).foreach { text =>
      val hs = Seq((0L, text), (1L, text)).toDF("doc_id", "text")
        .select(xxhash64(col("text"))).collect().map(_.getLong(0)).distinct
      assert(hs.length == 1)
    }
  }

  test("set-op algebra on generated key sets") {
    val keys = Gen.listOfN(25, Gen.chooseNum(0, 9))
    samples(Gen.zip(keys, keys), 10).foreach { case (a, b) =>
      val da = a.toDF("k"); val db = b.toDF("k")
      assert(da.union(db).count() == a.length + b.length)
      assert(da.union(db).distinct().collect().map(_.getInt(0)).toSet == (a.toSet | b.toSet))
      val inter = da.intersect(db).collect().map(_.getInt(0)).toSet
      val except = da.except(db).collect().map(_.getInt(0)).toSet
      assert(inter == (a.toSet & b.toSet))
      assert(except == (a.toSet -- b.toSet))
      assert((except & inter).isEmpty)
    }
  }

  test("inner join cardinality matches the pairwise count and is bounded") {
    val rows = Gen.listOfN(20, Gen.zip(Gen.chooseNum(0, 5), Gen.chooseNum(0, 100)))
    samples(Gen.zip(rows, rows), 10).foreach { case (l, r) =>
      val j = l.toDF("k", "v").join(r.toDF("k2", "w"), col("k") === col("k2")).count()
      val expected = (for ((k, _) <- l; (k2, _) <- r if k == k2) yield 1).size
      assert(j == expected && j <= l.length.toLong * r.length)
    }
  }

  test("window rank is monotone in the ordering column") {
    import org.apache.spark.sql.expressions.Window
    val rows = Gen.listOfN(20, Gen.zip(Gen.chooseNum(0, 2), Gen.chooseNum(0.0, 100.0)))
    samples(rows, 10).foreach { data =>
      val out = data.toDF("g", "x")
        .withColumn("r", rank().over(Window.partitionBy("g").orderBy(col("x").desc)))
        .collect().map(r => (r.getInt(0), r.getDouble(1), r.getInt(2)))
      out.groupBy(_._1).values.foreach { grp =>
        grp.toSeq.sortBy(_._3).sliding(2).foreach {
          case Seq((_, x1, r1), (_, x2, r2)) =>
            assert(r1 <= r2); if (r1 < r2) assert(x1 >= x2)
          case _ =>
        }
      }
    }
  }

  test("minhash signature equality for equal shingle sets (permutation-free)") {
    samples(docGen, 10).foreach { toks =>
      val texts = Seq((0L, toks.mkString(" ")), (1L, toks.reverse.reverse.mkString(" ")))
      val sigs = texts.toDF("doc_id", "text")
        .select(col("doc_id"), explode(split(col("text"), " ")).as("t"))
        .groupBy("doc_id")
        .agg((0 until 4).map(i => min(xxhash64(lit(i), col("t"))).as(s"h$i")).head,
          (0 until 4).map(i => min(xxhash64(lit(i), col("t"))).as(s"h$i")).tail: _*)
        .collect().map(r => (1 to 4).map(r.getLong))
      assert(sigs.distinct.length == 1)
    }
  }

  test("fused signature kernels equal their relational forms on generated text (round 11)") {
    // generator covers the inputs the fixture can't: arbitrary unicode
    // (incl. supplementary-plane), runs of spaces, leading/trailing
    // spaces, empty strings, and lengths straddling the 512-char pHash
    // window — the fused kernel and the relational plan must agree on
    // EVERY one, not just the ASCII corpus
    val weird = Gen.frequency(
      (4, Gen.asciiPrintableStr),
      (2, Gen.listOf(Gen.oneOf(vocab, Gen.const(" "), Gen.const("")))
        .map(_.mkString(" "))),
      (2, Gen.listOfN(40, Gen.oneOf('a', ' ', 'é', '你', '☃'))
        .map(_.mkString)),
      (1, Gen.const("")),
      (1, Gen.chooseNum(500, 600).map("xy " * _)))
    val texts = samples(weird, 120).zipWithIndex
      .map { case (t, i) => (i.toLong, t) }
    val df = texts.toDF("doc_id", "text")
    // simhash: fused vs the tf-weighted relational form
    val shF = Similarity.simhashOf(df).collect()
      .map(r => r.getLong(0) -> r.getLong(1)).toMap
    val shR = Similarity.simhashesReference(spark, df).collect()
      .map(r => r.getLong(0) -> r.getLong(1)).toMap
    assert(shF == shR, "simhash_sign diverged on generated text")
    // phash: fused vs the five-stage relational form
    val phF = Multimodal.phashOf(spark, df).collect()
      .map(r => r.getLong(0) -> r.getLong(1)).toMap
    val phR = Multimodal.phashOfReference(spark, df).collect()
      .map(r => r.getLong(0) -> r.getLong(1)).toMap
    assert(phF == phR, "dct_sign_hash diverged on generated text")
    // minhash sigs: fused vs the min aggregate over the distinct shingles
    val parts = (0 until 3).map(k => s"get(toks, i${if (k == 0) "-1" else s"+${k - 1}"})")
      .mkString(", ")
    def fold(m: Int) = "aggregate(transform(split(raw, ''), c -> ascii(c)), 0L, " +
      s"(acc, x) -> pmod(acc * $m + x, 1073741789L))"
    val mhR = Similarity.minhashSigs(df
      .select(col("doc_id"), split(col("text"), " ").as("toks"))
      .select(col("doc_id"), explode(
        expr(s"transform(sequence(1, greatest(size(toks) - 2, 1)), " +
          s"i -> concat_ws(' ', $parts))")).as("raw"))
      .select(col("doc_id"),
        expr(s"(${fold(31)}) * 1073741789L + (${fold(131)})").as("g"))
      .distinct())
      .collect().map(r => r.getLong(0) -> (1 to 16).map(r.getLong)).toMap
    val mhF = Similarity.minhashSigsFused(df).collect()
      .map(r => r.getLong(0) -> (1 to 16).map(r.getLong)).toMap
    assert(mhF == mhR, "minhash_sigs diverged on generated text")
  }

  test("fixed-point log2 SQL fragment equals the JVM reference across magnitudes") {
    // text_lm_surprisal's exactness claim, beyond fixture counts: the
    // bin()/power()/div formulation must equal integer bit arithmetic for
    // ANY count in the documented domain (x < ~9.2e12 before the ·10⁶
    // interpolation product can overflow). Edges: 1 (ilog2 = 0, fraction
    // 0), exact powers of two (fraction exactly 0), power-of-two ± 1, and
    // the domain's top decade.
    val ref = TestSpark.log2MicroRef _
    val edges = Seq(1L, 2L, 3L, 4L, 7L, 8L, 9L, (1L << 42) - 1, 1L << 42,
      (1L << 42) + 1, 4000000000000L)
    val xs = (samples(Gen.chooseNum(1L, 4000000000000L), 300) ++ edges).distinct
    val got = xs.toDF("x")
      .select(col("x"), expr(TextOps.log2MicroSql("x")).as("lg"))
      .collect().map(r => r.getLong(0) -> r.getLong(1)).toMap
    xs.foreach(x => assert(got(x) == ref(x),
      s"x=$x: sql ${got(x)} != jvm ${ref(x)}"))
  }
}
