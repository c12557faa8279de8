// Hosted under org.apache.spark.sql for the same private[sql] plumbing
// reasons as VectorOps (ExpressionUtils).
package org.apache.spark.sql.graft

import org.apache.spark.sql.Column
import org.apache.spark.sql.catalyst.expressions.codegen.{CodegenContext, CodegenFallback, ExprCode}
import org.apache.spark.sql.catalyst.expressions.{ExpectsInputTypes, Expression, UnaryExpression}
import org.apache.spark.sql.catalyst.util.GenericArrayData
import org.apache.spark.sql.classic.ExpressionUtils
import org.apache.spark.sql.types._
import org.apache.spark.unsafe.types.UTF8String

/** Native BPE merge application: split a word into code points and apply
  * the learned merge list in rank order with the greedy-leftmost fold rule
  * (BpeSpec pins this equal to both the SQL aggregate() fold chain and the
  * per-round windowed training segmentation).
  *
  * Motivation (the bench-r13 finding): higher-order functions never enter
  * whole-stage codegen, and a BpeMerges-deep nested `aggregate()` chain
  * evaluates interpretively at ~50µs/word — a measured 14 s single pass at
  * sf0.1 and exactly-linear 4.3 → 67.8 s on the 16× octave. This
  * expression runs the same algorithm as one tight JVM loop over the
  * decoded code points (~1µs/word). It deliberately uses CodegenFallback:
  * the merge table is a per-fixture constant baked into the expression,
  * the consumer is the one-time encodedCorpus spill build, and a single
  * virtual call per row is already two orders cheaper than the HOF chain —
  * doGenCode would buy nothing measurable there.
  *
  * Code-point semantics match the trainer's seed frame (Spark `substr`
  * indexes UTF8String code points), so multi-byte alphabets segment
  * identically in training and application.
  */
case class BpeApply(child: Expression, merges: Seq[(String, String)])
  extends UnaryExpression with ExpectsInputTypes with CodegenFallback {

  override def inputTypes: Seq[AbstractDataType] = Seq(StringType)
  override def dataType: DataType = ArrayType(StringType, containsNull = false)
  override def prettyName: String = "bpe_apply"

  @transient private lazy val mergeArr: Array[(String, String)] = merges.toArray

  override def nullSafeEval(w: Any): Any = {
    val syms = BpeOps.applyMerges(w.asInstanceOf[UTF8String].toString, mergeArr)
    new GenericArrayData(syms.map(UTF8String.fromString(_)))
  }

  override protected def withNewChildInternal(newChild: Expression): BpeApply =
    copy(child = newChild)
}

/** [[BpeApply]] fused with the vocabulary-id lookup (round 19 session 2 —
  * the ADVICE r18 expression-size wall): the frozen encodes previously
  * mapped each subword through a literal SQL `map()` whose expression
  * tree — and codegen method size — grew linearly with |vocab|, capping
  * the "50k-token production vocab" story at a few thousand entries. Here
  * the id table rides the expression CONSTRUCTOR (a plan constant, the
  * same transport as the merge table and the unigram model in
  * `unigram_encode_ids`), so plan size is independent of |vocab| and the
  * lookup is one JVM hash probe per subword instead of an O(|vocab|)
  * literal tree. `byteStructural` mirrors the byte family's id rule:
  * single alias chars take the STRUCTURAL id (byte value + 1 — the
  * `instr(aliasStr, c)` the SQL form computed), merged tokens take the
  * supplied map's id. An unmapped multi-char token throws — the literal
  * map's element_at returned NULL and concat_ws silently DROPPED the
  * token, which would corrupt an id stream without a trace; coverage is
  * structurally total for both families, so the behaviors only diverge
  * on a bug, and loud beats silent there. `unkId` (round 20 — the last
  * literal-map sites in Bpe.scala converted to this expression) opts into
  * the NOVEL-text contract instead: an unmapped token takes the reserved
  * UNK id (the coalesce(element_at(…), 1L) the SQL form computed), the
  * correct semantics exactly where unseen text is expected (novel encode,
  * tokenize-at-ingest) and a bug everywhere else — so it stays opt-in
  * per call site.
  */
case class BpeApplyIds(child: Expression, merges: Seq[(String, String)],
    ids: Map[String, Long], byteStructural: Boolean,
    unkId: Option[Long] = None)
  extends UnaryExpression with ExpectsInputTypes with CodegenFallback {

  override def inputTypes: Seq[AbstractDataType] = Seq(StringType)
  override def dataType: DataType = ArrayType(LongType, containsNull = false)
  override def prettyName: String = "bpe_apply_ids"

  @transient private lazy val mergeArr: Array[(String, String)] = merges.toArray

  override def nullSafeEval(w: Any): Any = {
    val syms = BpeOps.applyMerges(w.asInstanceOf[UTF8String].toString, mergeArr)
    val out = new Array[Long](syms.length)
    var i = 0
    while (i < syms.length) {
      val sym = syms(i)
      out(i) =
        if (byteStructural && sym.length == 1) ByteAlias.byteOf(sym.charAt(0)) + 1L
        else ids.getOrElse(sym, unkId.getOrElse(
          throw new IllegalStateException(s"bpe_apply_ids: no id for token [$sym]")))
      i += 1
    }
    new GenericArrayData(out)
  }

  override protected def withNewChildInternal(newChild: Expression): BpeApplyIds =
    copy(child = newChild)
}

/** The portable polynomial rolling hash (Σ-fold of `acc·31 + codepoint`
  * mod m) as a codegen'd expression. The SQL form
  * (`aggregate(transform(split(x, ''), c -> ascii(c)), …)`) is the
  * DuckDB-mirrorable definition every oracle executes, but as a Spark
  * plan it is an interpreted HOF chain that also breaks whole-stage
  * codegen around its projection — and it sits in HOT paths (the
  * fingerprint dedup key, count-min bucketing, DSIR features), not a
  * one-time build. This expression generates the tight code-point loop
  * inline, so the hash stays inside whole-stage codegen. Value-identical
  * to the SQL fold by construction (same traversal: Spark `split(x, '')`
  * yields per-code-point strings and `ascii` returns the code point;
  * spec-pinned incl. non-ASCII).
  */
case class PolyHash(child: Expression, mod: Long)
  extends UnaryExpression with ExpectsInputTypes {

  override def inputTypes: Seq[AbstractDataType] = Seq(StringType)
  override def dataType: DataType = LongType
  override def prettyName: String = "poly_hash"

  override def nullSafeEval(w: Any): Any = {
    val s = w.asInstanceOf[UTF8String].toString
    var acc = 0L
    var i = 0
    while (i < s.length) {
      val cp = s.codePointAt(i)
      acc = (acc * 31 + cp) % mod
      i += Character.charCount(cp)
    }
    acc
  }

  override protected def doGenCode(ctx: CodegenContext, ev: ExprCode): ExprCode =
    nullSafeCodeGen(ctx, ev, x => {
      val s = ctx.freshName("s")
      val acc = ctx.freshName("acc")
      val i = ctx.freshName("i")
      val cp = ctx.freshName("cp")
      s"""
         |java.lang.String $s = $x.toString();
         |long $acc = 0L;
         |int $i = 0;
         |while ($i < $s.length()) {
         |  int $cp = $s.codePointAt($i);
         |  $acc = ($acc * 31L + $cp) % ${mod}L;
         |  $i += java.lang.Character.charCount($cp);
         |}
         |${ev.value} = $acc;
       """.stripMargin
    })

  override protected def withNewChildInternal(newChild: Expression): PolyHash =
    copy(child = newChild)
}

/** The published GPT-2 byte↔unicode bijection (openai/gpt-2 encoder.py
  * `bytes_to_unicode`, public): every "printable" byte — the ranges
  * [33,126], [161,172], [174,255] — renders as its own codepoint; the 68
  * remaining bytes (controls, space, DEL, NBSP-region, soft hyphen) render
  * as 256+k in ascending byte order, so byte 32 (space) becomes the famous
  * 'Ġ' (U+0120). The map is a bijection between bytes and 256 distinct BMP
  * codepoints, all of them "visible" characters — which is the whole
  * design: a byte-level BPE works on ALIAS STRINGS (one alias char per
  * UTF-8 octet of the original text), so the merge loop needs no byte
  * arithmetic, merge tables print legibly, and decode is alias char →
  * byte → UTF-8. Round 17 (VERDICT r16 #1): this replaces the ASCII-only
  * byte==char identity — the tokenizer family is now total over arbitrary
  * UTF-8 input.
  */
object ByteAlias {
  private def printable(b: Int): Boolean =
    (b >= 33 && b <= 126) || (b >= 161 && b <= 172) || (b >= 174 && b <= 255)

  /** aliasOf(b) = the alias char for byte value b (all single UTF-16 chars:
    * codepoints ≤ 0x0143).
    */
  val aliasOf: Array[Char] = {
    var k = 0
    (0 until 256).map { b =>
      if (printable(b)) b.toChar
      else { val c = (256 + k).toChar; k += 1; c }
    }.toArray
  }

  /** The 256-char alias table as one string: position b+1 (1-based, the
    * SQL substr/instr convention) holds byte b's alias — so
    * `instr(aliasStr, c)` IS the structural single-byte id (byte value + 1)
    * on any engine whose instr counts characters (Spark UTF8String and
    * DuckDB both do; pinned in ByteBpeSpec).
    */
  val aliasStr: String = new String(aliasOf)

  private val byteOfChar: Array[Int] = {
    val m = Array.fill(0x200)(-1)
    aliasOf.zipWithIndex.foreach { case (c, b) => m(c.toInt) = b }
    m
  }

  /** byte value of an alias char; -1 if the char is not an alias. */
  def byteOf(c: Char): Int = if (c < 0x200) byteOfChar(c.toInt) else -1

  /** Alias string of s: one alias char per UTF-8 octet. */
  def alias(s: String): String = {
    val bs = s.getBytes(java.nio.charset.StandardCharsets.UTF_8)
    val out = new Array[Char](bs.length)
    var i = 0
    while (i < bs.length) { out(i) = aliasOf(bs(i) & 0xff); i += 1 }
    new String(out)
  }

  /** Exact inverse of [[alias]]: alias chars → bytes → UTF-8 string.
    * Throws on a non-alias char (decode of a corrupt id stream must be
    * loud, not lossy).
    */
  def unalias(a: String): String = {
    val out = new Array[Byte](a.length)
    var i = 0
    while (i < a.length) {
      val b = byteOf(a.charAt(i))
      require(b >= 0, s"non-alias char U+${a.charAt(i).toInt.toHexString} in [$a]")
      out(i) = b.toByte
      i += 1
    }
    new String(out, java.nio.charset.StandardCharsets.UTF_8)
  }

  /** UTF8String face of [[alias]] — the codegen entry point. */
  def aliasU8(u: UTF8String): UTF8String = {
    val bs = u.getBytes
    val out = new Array[Char](bs.length)
    var i = 0
    while (i < bs.length) { out(i) = aliasOf(bs(i) & 0xff); i += 1 }
    UTF8String.fromString(new String(out))
  }
}

/** `utf8_alias(s)`: the GPT-2 byte→printable-unicode rendering of s's UTF-8
  * octets ([[ByteAlias]]) as a codegen'd scalar — the seed transform of the
  * byte-level BPE family. Sits in the per-pretoken hot path of
  * text_bpe_bytes_encode, hence doGenCode (one static call, stays inside
  * whole-stage codegen like [[PolyHash]]).
  */
case class Utf8Alias(child: Expression)
  extends UnaryExpression with ExpectsInputTypes {

  override def inputTypes: Seq[AbstractDataType] = Seq(StringType)
  override def dataType: DataType = StringType
  override def prettyName: String = "utf8_alias"

  override def nullSafeEval(w: Any): Any =
    ByteAlias.aliasU8(w.asInstanceOf[UTF8String])

  override protected def doGenCode(ctx: CodegenContext, ev: ExprCode): ExprCode =
    nullSafeCodeGen(ctx, ev, x =>
      s"${ev.value} = org.apache.spark.sql.graft.ByteAlias.aliasU8($x);")

  override protected def withNewChildInternal(newChild: Expression): Utf8Alias =
    copy(child = newChild)
}

object BpeOps {
  /** The greedy-leftmost merge fold shared by [[BpeApply]] and
    * [[BpeApplyIds]]: merge when the accumulator's last symbol is s1 and
    * the current is s2 — a merged token (s1+s2) can never equal s1 again
    * (s2 nonempty), so merges never chain onto their own output within a
    * round (the BpeSpec-pinned equivalence with the SQL aggregate() fold
    * and the per-round windowed training segmentation).
    */
  private[graft] def applyMerges(word: String,
      mergeArr: Array[(String, String)]): Array[String] = {
    var syms: Array[String] = {
      val cps = word.codePoints().toArray
      val out = new Array[String](cps.length)
      var i = 0
      while (i < cps.length) { out(i) = new String(Character.toChars(cps(i))); i += 1 }
      out
    }
    var m = 0
    while (m < mergeArr.length) {
      val (s1, s2) = mergeArr(m)
      val out = new scala.collection.mutable.ArrayBuffer[String](syms.length)
      var i = 0
      while (i < syms.length) {
        if (out.nonEmpty && out.last == s1 && syms(i) == s2)
          out(out.length - 1) = s1 + s2
        else out += syms(i)
        i += 1
      }
      syms = out.toArray
      m += 1
    }
    syms
  }

  def bpe_apply(w: Column, merges: Seq[(String, String)]): Column =
    ExpressionUtils.column(BpeApply(ExpressionUtils.expression(w), merges))
  def bpe_apply_ids(w: Column, merges: Seq[(String, String)],
      ids: Map[String, Long], byteStructural: Boolean,
      unkId: Option[Long] = None): Column =
    ExpressionUtils.column(BpeApplyIds(ExpressionUtils.expression(w), merges,
      ids, byteStructural, unkId))
  def poly_hash(w: Column, mod: Long): Column =
    ExpressionUtils.column(PolyHash(ExpressionUtils.expression(w), mod))
  def utf8_alias(w: Column): Column =
    ExpressionUtils.column(Utf8Alias(ExpressionUtils.expression(w)))
}
