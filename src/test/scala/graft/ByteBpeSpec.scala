package graft

import org.scalatest.funsuite.AnyFunSuite
import org.apache.spark.sql.functions._
import org.apache.spark.sql.graft.ByteAlias

/** Byte-level BPE contracts (VERDICT r15 #2; GPT-2 alias space since round
  * 17 — VERDICT r16 #1): the property that separates this family from the
  * char-level tokenizer is that UNK is STRUCTURALLY unreachable — any input
  * decomposes into UTF-8 octets, every octet renders as one alias char
  * ([[org.apache.spark.sql.graft.ByteAlias]]), and every alias char has an
  * id by position in the alias table, no vocabulary lookup that could miss.
  * Pinned here on text the training corpus has NEVER seen — uppercase,
  * digits, punctuation, and (new) raw multi-byte UTF-8 through the
  * 2-/3-/4-byte encoder classes — plus exact round-trip, the alias
  * bijection itself, and the instr character-indexing the structural id
  * rule rides on.
  */
class ByteBpeSpec extends AnyFunSuite {
  import TestSpark.spark
  import spark.implicits._

  private val d = TestSpark.Sf0001
  private lazy val ml = Bpe.byteMergeList(spark, d)

  private lazy val aliasLitSpark =
    ByteAlias.aliasStr.replace("\\", "\\\\").replace("'", "''")

  /** The query's id expression, verbatim (single-char alias-position
    * arithmetic + min-rank merge map) — evaluated over an arbitrary text
    * through the same pretokenize + alias + native-fold pipeline as
    * text_bpe_bytes_encode.
    */
  private def encode(text: String): Seq[(String, Seq[Long])] = {
    val mapArgs = ml.groupBy { case (_, s1, s2) => s1 + s2 }
      .map { case (m, rs) => (m, rs.map(_._1).min) }.toSeq.sortBy(_._1)
      .map { case (m, r) =>
        s"'${m.replace("\\", "\\\\").replace("'", "''")}', ${Bpe.ByteIdBase + r}L" }
      .mkString(", ")
    Seq(text).toDF("text")
      .select(posexplode(expr(
        s"regexp_extract_all(text, '${Bpe.BytePretokRe}', 0)")).as(Seq("pos", "word0")))
      .withColumn("subs", org.apache.spark.sql.graft.BpeOps.bpe_apply(
        org.apache.spark.sql.graft.BpeOps.utf8_alias(col("word0")),
        ml.map { case (_, s1, s2) => (s1, s2) }))
      .select(col("pos"), col("word0"),
        expr(s"transform(subs, x -> CASE WHEN length(x) = 1 " +
          s"THEN CAST(instr('$aliasLitSpark', x) AS BIGINT) " +
          s"ELSE element_at(map($mapArgs), x) END)")
          .cast("array<bigint>").as("ids"))
      .orderBy("pos")
      .collect()
      .map(r => (r.getString(1), r.getSeq[Long](2).toSeq)).toSeq
  }

  private lazy val decodeTable: Map[Long, String] =
    ml.groupBy { case (_, s1, s2) => s1 + s2 }
      .map { case (m, rs) => (Bpe.ByteIdBase + rs.map(_._1).min, m) }

  /** ids → alias chars → bytes → UTF-8: the exact inverse of encode. */
  private def decode(ids: Seq[Long]): String =
    ByteAlias.unalias(ids.map(id =>
      decodeTable.getOrElse(id, ByteAlias.aliasOf((id - 1).toInt).toString)).mkString)

  test("alias table is the published GPT-2 bijection (spot values + totality)") {
    // byte 32 (space) is the famous Ġ (U+0120); printable bytes are identity
    assert(ByteAlias.aliasOf(32) == 'Ġ')
    assert(ByteAlias.aliasOf('a'.toInt) == 'a' && ByteAlias.aliasOf(126) == '~')
    assert(ByteAlias.aliasOf(0) == 'Ā') // byte 0 is the first shifted
    assert(ByteAlias.aliasStr.length == 256 &&
      ByteAlias.aliasStr.toSet.size == 256, "alias table not a bijection")
    (0 until 256).foreach(b => assert(ByteAlias.byteOf(ByteAlias.aliasOf(b)) == b))
  }

  test("alias round-trips arbitrary UTF-8 and counts octets (2/3/4-byte classes)") {
    for (s <- Seq("hello", "héllo", "中文 data", "a𝕒b", "", " ", "ß ñ ç é 𝓌")) {
      val a = ByteAlias.alias(s)
      assert(a.length == s.getBytes("UTF-8").length, s"octet count for [$s]")
      assert(ByteAlias.unalias(a) == s, s"round-trip for [$s]")
    }
  }

  test("Spark instr over the alias table is character-indexed: id = byte + 1") {
    // the structural-id rule of text_bpe_bytes_encode — a byte-indexed
    // instr would shift every id after the first multi-UTF-8-byte alias
    // char (byte 127's alias is U+0121, 2 UTF-8 bytes)
    val probe = "ĀĠzŃé"
    val got = spark.sql(
      s"SELECT transform(split('$probe', ''), " +
      s"c -> instr('$aliasLitSpark', c))").collect()(0).getSeq[Int](0)
    val want = probe.map(c => ByteAlias.byteOf(c) + 1)
    assert(got == want, s"instr positions: $got != $want")
    assert(want == Seq(1, 33, 123, 174, 234), s"alias table drifted: $want")
  }

  test("GPT-2 pretokenization attaches the leading space") {
    val toks = Seq("the fast oak").toDF("text")
      .select(expr(s"regexp_extract_all(text, '${Bpe.BytePretokRe}', 0)"))
      .as[Seq[String]].collect()(0)
    assert(toks == Seq("the", " fast", " oak"), s"pretokens: $toks")
  }

  test("UNK is structurally unreachable: never-seen characters all get ids") {
    // uppercase, digits, punctuation, AND raw multi-byte UTF-8 (Greek,
    // CJK, an emoji — 2/3/4-byte classes) never occur in the training
    // corpus — a vocabulary lookup would UNK or null on every one of
    // them; the byte id space cannot
    val novel = "THE Quick-99 zebra!? (x_7) Ωμέγα 中文 😀"
    val enc = encode(novel)
    assert(enc.nonEmpty)
    val allIds = enc.flatMap(_._2)
    assert(allIds.nonEmpty && allIds.forall(id => id >= 1L && id <= Bpe.ByteIdBase + ml.length),
      s"out-of-space id in $allIds")
    assert(allIds.forall(id => id > Bpe.ByteIdBase || id <= 256L))
  }

  test("round-trip is exact on training-corpus text and on novel multi-byte text") {
    // the space-run rows exercise the lone-space fallback (code-review
    // r16); the last rows exercise raw UTF-8 through every byte class —
    // the VERDICT r16 #1 done-criterion (lossless on codepoints >= 128)
    for (text <- Seq("the fast key order sort table scan",
        "THE Quick-99 zebra!? (x_7)",
        "a  b", "the fast ", "  x   y  ",
        "中文 héllo ß", "emoji 😀 tail", "ñá 𝓌indow ü")) {
      val enc = encode(text)
      val rebuilt = enc.map { case (_, ids) => decode(ids) }.mkString
      assert(rebuilt == text, s"round-trip: [$rebuilt] != [$text]")
    }
  }

  test("id spaces are disjoint: byte ids <= 256 < merge ids; outputs >= 2 alias chars") {
    assert(ml.nonEmpty && ml.length == Bpe.BpeMerges)
    ml.foreach { case (r, s1, s2) =>
      assert((s1 + s2).length >= 2, s"merge $r output too short")
      assert(Bpe.ByteIdBase + r > 256L)
    }
    // the learned table must contain at least one boundary merge starting
    // with Ġ (the space alias) — the behavior the regex pretokenizer +
    // alias rendering exist to enable
    val g = ByteAlias.aliasOf(32).toString
    assert(ml.exists { case (_, s1, _) => s1.startsWith(g) },
      "no leading-Ġ merge learned — pretokenizer/alias not byte-level")
    // and the perturbed corpus must actually exercise bytes >= 128: some
    // merge symbol contains a non-ASCII-identity alias char
    assert(ml.exists { case (_, s1, s2) =>
      (s1 + s2).exists(c => ByteAlias.byteOf(c) >= 128) },
      "no continuation/lead byte in any merge — the multi-byte perturbation is vacuous")
  }
}
