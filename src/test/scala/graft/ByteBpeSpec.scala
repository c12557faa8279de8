package graft

import org.scalatest.funsuite.AnyFunSuite
import org.apache.spark.sql.functions._
import org.apache.spark.sql.types.LongType

/** Byte-level BPE contracts (VERDICT r15 #2): the property that separates
  * this family from the char-level tokenizer is that UNK is STRUCTURALLY
  * unreachable — any input decomposes into bytes and every byte has an id
  * by arithmetic (ascii+1), no vocabulary lookup that could miss. Pinned
  * here on text whose characters the training corpus has NEVER seen
  * (uppercase, digits, punctuation — the fixture is lowercase-only), plus
  * exact round-trip and the GPT-2 leading-space pretokenization.
  */
class ByteBpeSpec extends AnyFunSuite {
  import TestSpark.spark
  import spark.implicits._

  private val d = TestSpark.Sf0001
  private lazy val ml = Bpe.byteMergeList(spark, d)

  /** The query's id expression, verbatim (single-byte arithmetic + merge
    * map) — evaluated over an arbitrary text through the same pretokenize
    * + native-fold pipeline as text_bpe_bytes_encode.
    */
  private def encode(text: String): Seq[(String, Seq[Long])] = {
    val mapArgs = ml
      .map { case (r, s1, s2) => s"'${(s1 + s2).replace("'", "''")}', ${Bpe.ByteIdBase + r}L" }
      .mkString(", ")
    Seq(text).toDF("text")
      .select(posexplode(expr(
        s"regexp_extract_all(text, '${Bpe.BytePretokRe}', 0)")).as(Seq("pos", "word")))
      .withColumn("subs", org.apache.spark.sql.graft.BpeOps.bpe_apply(col("word"),
        ml.map { case (_, s1, s2) => (s1, s2) }))
      .select(col("pos"), col("word"),
        expr(s"transform(subs, x -> CASE WHEN length(x) = 1 " +
          s"THEN CAST(ascii(x) + 1 AS BIGINT) ELSE element_at(map($mapArgs), x) END)")
          .cast("array<bigint>").as("ids"))
      .orderBy("pos")
      .collect()
      .map(r => (r.getString(1), r.getSeq[Long](2).toSeq)).toSeq
  }

  private lazy val decodeTable: Map[Long, String] =
    ml.map { case (r, s1, s2) => (Bpe.ByteIdBase + r, s1 + s2) }.toMap

  private def decode(ids: Seq[Long]): String =
    ids.map(id => decodeTable.getOrElse(id, (id - 1).toChar.toString)).mkString

  test("GPT-2 pretokenization attaches the leading space") {
    val toks = Seq("the fast oak").toDF("text")
      .select(expr(s"regexp_extract_all(text, '${Bpe.BytePretokRe}', 0)"))
      .as[Seq[String]].collect()(0)
    assert(toks == Seq("the", " fast", " oak"), s"pretokens: $toks")
  }

  test("UNK is structurally unreachable: never-seen characters all get ids") {
    // uppercase, digits, and punctuation never occur in the training
    // corpus (lowercase a-y + space only) — a vocabulary lookup would UNK
    // or null on every one of them; the byte id space cannot
    val novel = "THE Quick-99 zebra!? (x_7)"
    val enc = encode(novel)
    assert(enc.nonEmpty)
    val allIds = enc.flatMap(_._2)
    assert(allIds.nonEmpty && allIds.forall(id => id >= 1L && id <= Bpe.ByteIdBase + ml.length),
      s"out-of-space id in $allIds")
    // no nulls: the cast collect would have thrown on a null element; also
    // every id is decodable
    assert(allIds.forall(id => id > Bpe.ByteIdBase || id <= 256L))
  }

  test("round-trip is exact on training-corpus text and on novel text") {
    // the last three exercise the lone-space fallback (code-review r16:
    // space RUNS and trailing spaces previously vanished in
    // pretokenization — lossy encode with no UNK and no error)
    for (text <- Seq("the fast key order sort table scan",
        "THE Quick-99 zebra!? (x_7)",
        "a  b", "the fast ", "  x   y  ")) {
      val enc = encode(text)
      val rebuilt = enc.map { case (_, ids) => decode(ids) }.mkString
      assert(rebuilt == text, s"round-trip: [$rebuilt] != [$text]")
    }
  }

  test("id spaces are disjoint: byte ids <= 256 < merge ids; outputs >= 2 chars") {
    assert(ml.nonEmpty && ml.length == Bpe.BpeMerges)
    ml.foreach { case (r, s1, s2) =>
      assert((s1 + s2).length >= 2, s"merge $r output too short")
      assert(Bpe.ByteIdBase + r > 256L)
    }
    // the learned table must contain at least one leading-space merge —
    // the behavior the regex pretokenizer exists to enable (6 on the
    // fixture: " s", " c", " b", " v", " f", " a")
    assert(ml.exists { case (_, s1, _) => s1.startsWith(" ") },
      "no leading-space merge learned — pretokenizer not byte-level")
  }
}
