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
case class UnigramSegment(child: Expression, vocab: Seq[(String, Long)],
    maxSub: Int, unkCostMicro: Long)
  extends UnaryExpression with ExpectsInputTypes with CodegenFallback {

  override def inputTypes: Seq[AbstractDataType] = Seq(StringType)
  override def dataType: DataType = ArrayType(StringType, containsNull = false)
  override def prettyName: String = "unigram_segment"

  @transient private lazy val vmap: Map[String, Long] = vocab.toMap

  private def segLess(a: String, b: String): Boolean =
    UTF8String.fromString(a).compareTo(UTF8String.fromString(b)) < 0

  override def nullSafeEval(w: Any): Any = {
    val word = w.asInstanceOf[UTF8String].toString
    val cps: Array[String] = {
      val arr = word.codePoints().toArray
      val out = new Array[String](arr.length)
      var i = 0
      while (i < arr.length) { out(i) = new String(Character.toChars(arr(i))); i += 1 }
      out
    }
    val n = cps.length
    if (n == 0) return new GenericArrayData(Array.empty[Any])
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
    new GenericArrayData(seg(n).split(" ").map(UTF8String.fromString(_)))
  }

  override protected def withNewChildInternal(newChild: Expression): UnigramSegment =
    copy(child = newChild)
}

object UnigramOps {
  def unigram_segment(w: Column, vocab: Seq[(String, Long)], maxSub: Int,
      unkCostMicro: Long): Column =
    ExpressionUtils.column(
      UnigramSegment(ExpressionUtils.expression(w), vocab, maxSub, unkCostMicro))
}
