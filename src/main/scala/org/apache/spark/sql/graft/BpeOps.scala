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
    val word = w.asInstanceOf[UTF8String].toString
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
        // greedy-leftmost fold: merge when the accumulator's last symbol
        // is s1 and the current is s2 — a merged token (s1+s2) can never
        // equal s1 again (s2 nonempty), so merges never chain onto their
        // own output within a round (the BpeSpec-pinned equivalence)
        if (out.nonEmpty && out.last == s1 && syms(i) == s2)
          out(out.length - 1) = s1 + s2
        else out += syms(i)
        i += 1
      }
      syms = out.toArray
      m += 1
    }
    new GenericArrayData(syms.map(UTF8String.fromString(_)))
  }

  override protected def withNewChildInternal(newChild: Expression): BpeApply =
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

object BpeOps {
  def bpe_apply(w: Column, merges: Seq[(String, String)]): Column =
    ExpressionUtils.column(BpeApply(ExpressionUtils.expression(w), merges))
  def poly_hash(w: Column, mod: Long): Column =
    ExpressionUtils.column(PolyHash(ExpressionUtils.expression(w), mod))
}
