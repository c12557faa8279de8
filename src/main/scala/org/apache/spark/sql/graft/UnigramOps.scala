// Hosted under org.apache.spark.sql for the same private[sql] plumbing
// reasons as VectorOps/BpeOps (ExpressionUtils).
package org.apache.spark.sql.graft

import org.apache.spark.sql.Column
import org.apache.spark.sql.catalyst.expressions.codegen.CodegenFallback
import org.apache.spark.sql.catalyst.expressions.{ExpectsInputTypes, Expression, UnaryExpression}
import org.apache.spark.sql.catalyst.util.GenericArrayData
import org.apache.spark.sql.classic.ExpressionUtils
import org.apache.spark.sql.types._
import org.apache.spark.unsafe.types.UTF8String

/** Native Viterbi segmentation under a unigram-LM token model (Kudo 2018's
  * decode step, hard-EM variant): split the word into code points and find
  * the minimum-cost tokenization where each token's cost is its exact
  * fixed-point surprisal (micro-bits, graft.Unigram's shared log2 kernel).
  *
  * DETERMINISM: the DP compares candidate states by (cost ASC, token-count
  * ASC, segmentation-string ASC) — a total order, so equal-cost
  * tokenizations resolve identically on every engine. The segmentation
  * string compares in UTF-8 BINARY order (UTF8String.compareTo), which is
  * code-point order — the same collation DuckDB's ORDER BY applies to the
  * oracle's seg column; a Java String.compareTo here would diverge on
  * supplementary-plane text (UTF-16 surrogates sort below U+E000), the
  * PolyHash lesson.
  *
  * Tokens outside the vocabulary fall back per-CODE-POINT at `unkCostMicro`
  * (reachable only on text whose characters the training corpus never saw
  * — the model keeps every corpus character, so in-corpus encode never
  * pays it).
  *
  * CodegenFallback for the BpeApply reason: the vocabulary is a
  * per-fixture constant baked into the expression and the DP is a tight
  * JVM loop (~O(len·maxSub) map probes per word); one virtual call per row
  * is noise next to it.
  */
private[graft] object UnigramDp {
  private def segLess(a: String, b: String): Boolean =
    UTF8String.fromString(a).compareTo(UTF8String.fromString(b)) < 0

  /** The shared Viterbi DP (doc above): min-cost tokenization, ties by
    * (token-count ASC, segmentation-string ASC in UTF-8 binary order).
    */
  def segment(word: String, vmap: Map[String, Long], maxSub: Int,
      unkCostMicro: Long): Array[String] = {
    val cps: Array[String] = {
      val arr = word.codePoints().toArray
      val out = new Array[String](arr.length)
      var i = 0
      while (i < arr.length) { out(i) = new String(Character.toChars(arr(i))); i += 1 }
      out
    }
    val n = cps.length
    if (n == 0) return Array.empty
    val cost = new Array[Long](n + 1)
    val ntok = new Array[Int](n + 1)
    val seg = new Array[String](n + 1)
    cost(0) = 0L; ntok(0) = 0; seg(0) = ""
    var p = 1
    while (p <= n) {
      var bc = Long.MaxValue; var bn = 0; var bs: String = null
      var l = 1
      val lMax = math.min(maxSub, p)
      while (l <= lMax) {
        val tok = cps.slice(p - l, p).mkString
        val c = vmap.get(tok) match {
          case Some(x) => x
          case None => if (l == 1) unkCostMicro else -1L
        }
        if (c >= 0L) {
          val cc = cost(p - l) + c
          val cn = ntok(p - l) + 1
          val cs = if (seg(p - l).isEmpty) tok else seg(p - l) + " " + tok
          if (cc < bc || (cc == bc && (cn < bn || (cn == bn && segLess(cs, bs)))))
            { bc = cc; bn = cn; bs = cs }
        }
        l += 1
      }
      cost(p) = bc; ntok(p) = bn; seg(p) = bs
      p += 1
    }
    seg(n).split(" ")
  }
}

case class UnigramSegment(child: Expression, vocab: Seq[(String, Long)],
    maxSub: Int, unkCostMicro: Long)
  extends UnaryExpression with ExpectsInputTypes with CodegenFallback {

  override def inputTypes: Seq[AbstractDataType] = Seq(StringType)
  override def dataType: DataType = ArrayType(StringType, containsNull = false)
  override def prettyName: String = "unigram_segment"

  @transient private lazy val vmap: Map[String, Long] = vocab.toMap

  override def nullSafeEval(w: Any): Any =
    new GenericArrayData(
      UnigramDp.segment(w.asInstanceOf[UTF8String].toString, vmap, maxSub, unkCostMicro)
        .map(UTF8String.fromString(_)))

  override protected def withNewChildInternal(newChild: Expression): UnigramSegment =
    copy(child = newChild)
}

/** Segment AND id-map in one native pass: tokens → vocabulary ids (UNK=1
  * for tokens outside the id map — the same fallback semantics as the
  * consumers' coalesce). Exists because the id lookup as a SQL
  * `transform(seg, x -> element_at(map(...), x))` is an interpreted HOF
  * over every word occurrence — measured ~1 s of the 1.7 s
  * text_unigram_encode warm pass at sf0.1 — while inside the expression
  * it is one hash probe per token on the already-computed segmentation.
  */
case class UnigramEncodeIds(child: Expression, vocab: Seq[(String, Long)],
    idMap: Seq[(String, Long)], maxSub: Int, unkCostMicro: Long)
  extends UnaryExpression with ExpectsInputTypes with CodegenFallback {

  override def inputTypes: Seq[AbstractDataType] = Seq(StringType)
  override def dataType: DataType = ArrayType(LongType, containsNull = false)
  override def prettyName: String = "unigram_encode_ids"

  @transient private lazy val vmap: Map[String, Long] = vocab.toMap
  @transient private lazy val ids: Map[String, Long] = idMap.toMap

  override def nullSafeEval(w: Any): Any =
    new GenericArrayData(
      UnigramDp.segment(w.asInstanceOf[UTF8String].toString, vmap, maxSub, unkCostMicro)
        .map(t => ids.getOrElse(t, 1L)))

  override protected def withNewChildInternal(newChild: Expression): UnigramEncodeIds =
    copy(child = newChild)
}

object UnigramOps {
  def unigram_segment(w: Column, vocab: Seq[(String, Long)], maxSub: Int,
      unkCostMicro: Long): Column =
    ExpressionUtils.column(
      UnigramSegment(ExpressionUtils.expression(w), vocab, maxSub, unkCostMicro))
  def unigram_encode_ids(w: Column, vocab: Seq[(String, Long)],
      idMap: Seq[(String, Long)], maxSub: Int, unkCostMicro: Long): Column =
    ExpressionUtils.column(UnigramEncodeIds(ExpressionUtils.expression(w),
      vocab, idMap, maxSub, unkCostMicro))
}
