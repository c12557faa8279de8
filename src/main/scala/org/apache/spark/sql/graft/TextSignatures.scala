// Hosted under org.apache.spark.sql like VectorOps: the expression plumbing
// (AbstractDataType, classic.ExpressionUtils) is private[sql].
package org.apache.spark.sql.graft

import org.apache.spark.sql.Column
import org.apache.spark.sql.catalyst.expressions.codegen.{CodegenContext, ExprCode}
import org.apache.spark.sql.catalyst.expressions.{BinaryExpression, ExpectsInputTypes, Expression}
import org.apache.spark.sql.catalyst.util.ArrayData
import org.apache.spark.sql.classic.ExpressionUtils
import org.apache.spark.sql.types._
import org.apache.spark.unsafe.types.UTF8String

/** 60-bit integer 8×8 DCT-II sign signature of a character stream — the
  * FUSED form of the pHash pipeline `graft.Multimodal.phashOfReference`
  * builds from five relational stages (char explode → cell aggregate →
  * two DCT join+aggregate passes → sign-bit aggregate): one codegen'd
  * pass per row instead of a 512-row explosion and three aggregations.
  *
  * Semantics replicate the relational form EXACTLY (the equality is
  * spec-pinned on the fixture corpus, its perturbations, and a non-ASCII
  * row): crop the text to its first 512 CODEPOINTS (Spark `substring`
  * counts codepoints), then treat each UTF-16 unit of that prefix as one
  * sample (Spark `split('')` splits between UTF-16 units and `ascii` of a
  * one-unit piece is that unit's value), sum units into 64 zero-padded
  * 8-unit cells, run the separable integer DCT-II against the supplied
  * flattened 8×8 table, and set bit k (k = u·8+v ∈ [1, 60], row-major, DC
  * excluded) iff coefficient C(u,v) > 0. An EMPTY prefix yields signature
  * 0 — the same result the relational form produces via `split('') = ['']`
  * and `ascii('') = 0`. NULL text → NULL.
  *
  * The table argument keeps the cosine constants in ONE place
  * (`Multimodal.DctT`, also interpolated into the DuckDB oracles) instead
  * of baking them into the expression.
  */
case class DctSignHash(left: Expression, right: Expression)
  extends BinaryExpression with ExpectsInputTypes {

  override def inputTypes: Seq[AbstractDataType] =
    Seq(StringType, ArrayType(LongType))
  override def dataType: DataType = LongType
  override def prettyName: String = "dct_sign_hash"
  override def nullable: Boolean = true

  override def nullSafeEval(a: Any, b: Any): Any =
    DctSignHash.hashOf(a.asInstanceOf[UTF8String], b.asInstanceOf[ArrayData])

  override protected def doGenCode(ctx: CodegenContext, ev: ExprCode): ExprCode =
    nullSafeCodeGen(ctx, ev, (s, t) => {
      s"""
         |java.lang.Long r = org.apache.spark.sql.graft.DctSignHash.hashOf($s, $t);
         |if (r == null) { ${ev.isNull} = true; } else { ${ev.value} = r.longValue(); }
       """.stripMargin
    })

  override protected def withNewChildrenInternal(
      newLeft: Expression, newRight: Expression): DctSignHash =
    copy(left = newLeft, right = newRight)
}

object DctSignHash {
  private val Window = 512
  private val Bits = 60

  /** Called from generated code — keep signature stable; null = NULL. */
  def hashOf(text: UTF8String, table: ArrayData): java.lang.Long = {
    if (table.numElements() != 64) return null
    // first `Window` CODEPOINTS (substringSQL counts codepoints), then one
    // sample per UTF-16 unit of that prefix (the split('')/ascii path)
    val prefix = text.substringSQL(1, Window).toString
    val cells = new Array[Long](64)
    var k = 0
    while (k < prefix.length) {
      // an ASCII prefix has <= 512 units = exactly 64 cells; a
      // supplementary-plane prefix has more units than codepoints, so
      // cells past index 63 can exist in the relational form — where they
      // silently DROP (the row-pass inner join on i = ci div 8 finds no
      // table row for i > 7). Mirror that: ignore units past cell 63.
      val ci = k / 8
      if (ci < 64) cells(ci) += prefix.charAt(k).toLong
      k += 1
    }
    val t = new Array[Long](64)
    var i = 0
    while (i < 64) { t(i) = table.getLong(i); i += 1 }
    // separable integer DCT-II: r(u,j) = Σ_i g(i,j)·T(u,i), then
    // C(u,v) = Σ_j r(u,j)·T(v,j)
    val r = new Array[Long](64)
    var u = 0
    while (u < 8) {
      var j = 0
      while (j < 8) {
        var acc = 0L
        var ii = 0
        while (ii < 8) { acc += cells(ii * 8 + j) * t(u * 8 + ii); ii += 1 }
        r(u * 8 + j) = acc
        j += 1
      }
      u += 1
    }
    var hash = 0L
    u = 0
    while (u < 8) {
      var v = 0
      while (v < 8) {
        val kk = u * 8 + v
        if (kk >= 1 && kk <= Bits) {
          var acc = 0L
          var j = 0
          while (j < 8) { acc += r(u * 8 + j) * t(v * 8 + j); j += 1 }
          if (acc > 0L) hash |= 1L << (Bits - kk)
        }
        v += 1
      }
      u += 1
    }
    hash
  }
}

object TextSignatures {
  def dct_sign_hash(text: Column, table: Column): Column =
    ExpressionUtils.column(DctSignHash(
      ExpressionUtils.expression(text), ExpressionUtils.expression(table)))
}
