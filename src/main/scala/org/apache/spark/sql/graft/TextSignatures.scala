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

/** Token-frequency SimHash sign signature — the FUSED form of
  * `graft.Similarity.simhashesReference`'s three relational stages
  * (per-doc tf aggregate → distinct-vocabulary hash + broadcast join →
  * a bits-wide vote aggregate): one codegen'd pass per doc. The
  * relational form weights each DISTINCT token's ±1 votes by its tf;
  * summing ±1 per token OCCURRENCE is the same integer total, so this
  * needs no tf state at all — tokenize (single-space split, empties
  * kept, exactly Spark's `split(text, ' ')`), hash each token with four
  * chained polynomial folds over its UTF-16 units (`ascii` of a
  * one-unit `split('')` piece is that unit's value) assembled base
  * 32768, and add ±1 to each of `bits` vote counters by the hash's
  * bits; bit i of the result is set iff its vote total is positive.
  *
  * `params` = [bits, prime, m0, m1, m2, m3] (bits ≤ 63, prime < 32768 so
  * the four folds pack into a positive Long) — the constants stay at
  * their one definition site (`Similarity`) and ride in as a literal,
  * like [[DctSignHash]]'s cosine table. NULL text → NULL.
  */
case class SimhashSign(left: Expression, right: Expression)
  extends BinaryExpression with ExpectsInputTypes {

  override def inputTypes: Seq[AbstractDataType] =
    Seq(StringType, ArrayType(LongType))
  override def dataType: DataType = LongType
  override def prettyName: String = "simhash_sign"
  override def nullable: Boolean = true

  override def nullSafeEval(a: Any, b: Any): Any =
    SimhashSign.hashOf(a.asInstanceOf[UTF8String], b.asInstanceOf[ArrayData])

  override protected def doGenCode(ctx: CodegenContext, ev: ExprCode): ExprCode =
    nullSafeCodeGen(ctx, ev, (s, p) => {
      s"""
         |java.lang.Long r = org.apache.spark.sql.graft.SimhashSign.hashOf($s, $p);
         |if (r == null) { ${ev.isNull} = true; } else { ${ev.value} = r.longValue(); }
       """.stripMargin
    })

  override protected def withNewChildrenInternal(
      newLeft: Expression, newRight: Expression): SimhashSign =
    copy(left = newLeft, right = newRight)
}

object SimhashSign {
  /** Called from generated code — keep signature stable; null = NULL. */
  def hashOf(text: UTF8String, params: ArrayData): java.lang.Long = {
    if (params.numElements() != 6) return null
    val bits = params.getLong(0).toInt
    val p = params.getLong(1)
    if (bits < 1 || bits > 63 || p < 2 || p >= 32768) return null
    val votes = new Array[Long](bits)
    // Spark split(text, " ") keeps empty tokens (limit -1), including the
    // [""] a fully-empty text yields — its all-zero folds vote -1
    // everywhere, exactly like the relational path
    val toks = text.toString.split(" ", -1)
    var ti = 0
    while (ti < toks.length) {
      val t = toks(ti)
      var h = 0L
      var f = 0
      while (f < 4) {
        val m = params.getLong(2 + f)
        var acc = 0L
        var k = 0
        while (k < t.length) { acc = (acc * m + t.charAt(k).toLong) % p; k += 1 }
        h = h * 32768L + acc
        f += 1
      }
      var i = 0
      while (i < bits) {
        votes(i) += (if (((h >> i) & 1L) == 1L) 1L else -1L)
        i += 1
      }
      ti += 1
    }
    var hash = 0L
    var i = 0
    while (i < bits) {
      if (votes(i) > 0L) hash |= 1L << (bits - 1 - i)
      i += 1
    }
    hash
  }
}

/** The N MinHash signature values of a document in one pass — the FUSED
  * form of `graft.Similarity`'s relational signature build (shingle
  * explode + distinct → an N-column min aggregate over ~megarows of
  * standing shingle index). min over a multiset equals min over its
  * distinct set, so the fusion needs neither the DISTINCT nor the
  * aggregate: enumerate the 3-token shingles exactly as the relational
  * form does (single-space split with empties kept; shingle i joins the
  * up-to-3 in-range tokens with single spaces, the `concat_ws`/null-`get`
  * rule; a sub-3-token doc yields its 1 short shingle; an empty text
  * yields the "" shingle), double-fold each shingle's UTF-16 units into
  * the 60-bit portable key g, and track the running min of each affine
  * hash ((g mod sigP)·A_i + B_i) mod sigP.
  *
  * `params` = [numHashes, portP, sigP, A_0, B_0, …] — the family
  * constants ride in from their one definition site like the other fused
  * signatures'. Returns ARRAY<BIGINT>(numHashes); NULL text → NULL.
  */
case class MinhashSigs(left: Expression, right: Expression)
  extends BinaryExpression with ExpectsInputTypes {

  override def inputTypes: Seq[AbstractDataType] =
    Seq(StringType, ArrayType(LongType))
  override def dataType: DataType = ArrayType(LongType, containsNull = false)
  override def prettyName: String = "minhash_sigs"
  override def nullable: Boolean = true

  override def nullSafeEval(a: Any, b: Any): Any =
    MinhashSigs.sigsOf(a.asInstanceOf[UTF8String], b.asInstanceOf[ArrayData])

  override protected def doGenCode(ctx: CodegenContext, ev: ExprCode): ExprCode =
    nullSafeCodeGen(ctx, ev, (s, p) => {
      s"""
         |org.apache.spark.sql.catalyst.util.ArrayData r =
         |  org.apache.spark.sql.graft.MinhashSigs.sigsOf($s, $p);
         |if (r == null) { ${ev.isNull} = true; } else { ${ev.value} = r; }
       """.stripMargin
    })

  override protected def withNewChildrenInternal(
      newLeft: Expression, newRight: Expression): MinhashSigs =
    copy(left = newLeft, right = newRight)
}

object MinhashSigs {
  /** Called from generated code — keep signature stable; null = NULL. */
  def sigsOf(text: UTF8String, params: ArrayData): ArrayData = {
    if (params.numElements() < 3) return null
    val nh = params.getLong(0).toInt
    val portP = params.getLong(1)
    val sigP = params.getLong(2)
    if (nh < 1 || params.numElements() != 3 + 2 * nh) return null
    val mins = Array.fill(nh)(Long.MaxValue)
    val toks = text.toString.split(" ", -1)
    val count = math.max(toks.length - 2, 1)
    var i = 0
    while (i < count) {
      // shingle i (1-based in the relational form): tokens i-1, i, i+1 of
      // which only the in-range ones exist, single-space-joined
      val sb = new java.lang.StringBuilder
      var k = i
      val hi = math.min(i + 3, toks.length)
      while (k < hi) {
        if (k > i) sb.append(' ')
        sb.append(toks(k))
        k += 1
      }
      var f31 = 0L
      var f131 = 0L
      var c = 0
      while (c < sb.length) {
        val u = sb.charAt(c).toLong
        f31 = (f31 * 31L + u) % portP
        f131 = (f131 * 131L + u) % portP
        c += 1
      }
      val gm = (f31 * portP + f131) % sigP
      var h = 0
      while (h < nh) {
        val v = (gm * params.getLong(3 + 2 * h) + params.getLong(4 + 2 * h)) % sigP
        if (v < mins(h)) mins(h) = v
        h += 1
      }
      i += 1
    }
    new org.apache.spark.sql.catalyst.util.GenericArrayData(mins)
  }
}

object TextSignatures {
  def dct_sign_hash(text: Column, table: Column): Column =
    ExpressionUtils.column(DctSignHash(
      ExpressionUtils.expression(text), ExpressionUtils.expression(table)))
  def simhash_sign(text: Column, params: Column): Column =
    ExpressionUtils.column(SimhashSign(
      ExpressionUtils.expression(text), ExpressionUtils.expression(params)))
  def minhash_sigs(text: Column, params: Column): Column =
    ExpressionUtils.column(MinhashSigs(
      ExpressionUtils.expression(text), ExpressionUtils.expression(params)))
}
