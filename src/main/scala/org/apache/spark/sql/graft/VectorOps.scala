// Hosted under org.apache.spark.sql: the expression plumbing this file needs
// (AbstractDataType, classic.ExpressionUtils) is private[sql] — the same
// pattern public Spark extension libraries use (see SNIPPETS.md [1]/[3]).
package org.apache.spark.sql.graft

import org.apache.spark.sql.Column
import org.apache.spark.sql.catalyst.FunctionIdentifier
import org.apache.spark.sql.catalyst.expressions.codegen.{CodegenContext, ExprCode}
import org.apache.spark.sql.catalyst.expressions.{BinaryExpression, ExpectsInputTypes, Expression, ExpressionInfo, UnaryExpression}
import org.apache.spark.sql.catalyst.util.ArrayData
import org.apache.spark.sql.classic.ExpressionUtils
import org.apache.spark.sql.types._
import org.apache.spark.sql.{SparkSession, SparkSessionExtensions}

/** Native Catalyst expressions for float-vector math.
  *
  * Motivation (the one place SURVEY.md §4.2's "no custom Catalyst work"
  * needed revision): a dot product over `array<float>` has no fast built-in
  * form — `aggregate`/`zip_with` higher-order functions evaluate an
  * interpreted lambda per element, and a Scala UDF pays a per-call
  * conversion/boxing boundary. These expressions read the Tungsten
  * `ArrayData` directly and generate a tight primitive loop via `doGenCode`,
  * so vector math stays inside whole-stage codegen. Fold order is
  * left-to-right — bit-identical to the library's other dot implementations.
  */
case class VectorDot(left: Expression, right: Expression)
  extends BinaryExpression with ExpectsInputTypes {

  override def inputTypes: Seq[AbstractDataType] =
    Seq(ArrayType(FloatType), ArrayType(FloatType))
  override def dataType: DataType = DoubleType
  override def prettyName: String = "vec_dot"
  // Mismatched dimensions yield NULL (never a silently-truncated partial
  // dot), so malformed vectors surface instead of ranking plausibly-wrong.
  override def nullable: Boolean = true

  override def nullSafeEval(a: Any, b: Any): Any = {
    val x = a.asInstanceOf[ArrayData]
    val y = b.asInstanceOf[ArrayData]
    if (x.numElements() != y.numElements()) null
    else {
      var i = 0
      var acc = 0.0
      while (i < x.numElements()) {
        // NULL elements propagate (like the HOF fold) — never read as 0.0
        if (x.isNullAt(i) || y.isNullAt(i)) return null
        acc += x.getFloat(i).toDouble * y.getFloat(i).toDouble
        i += 1
      }
      acc
    }
  }

  override protected def doGenCode(ctx: CodegenContext, ev: ExprCode): ExprCode =
    nullSafeCodeGen(ctx, ev, (x, y) => {
      val i = ctx.freshName("i")
      val acc = ctx.freshName("acc")
      val bad = ctx.freshName("hasNull")
      s"""
         |if ($x.numElements() != $y.numElements()) {
         |  ${ev.isNull} = true;
         |} else {
         |  double $acc = 0.0;
         |  boolean $bad = false;
         |  for (int $i = 0; $i < $x.numElements(); $i++) {
         |    if ($x.isNullAt($i) || $y.isNullAt($i)) { $bad = true; break; }
         |    $acc += (double) $x.getFloat($i) * (double) $y.getFloat($i);
         |  }
         |  if ($bad) { ${ev.isNull} = true; } else { ${ev.value} = $acc; }
         |}
       """.stripMargin
    })

  override protected def withNewChildrenInternal(
      newLeft: Expression, newRight: Expression): VectorDot =
    copy(left = newLeft, right = newRight)
}

/** L2 norm over `array<float>`, codegen'd like [[VectorDot]]. */
case class VectorNorm(child: Expression)
  extends UnaryExpression with ExpectsInputTypes {

  override def inputTypes: Seq[AbstractDataType] = Seq(ArrayType(FloatType))
  override def dataType: DataType = DoubleType
  override def prettyName: String = "vec_norm"
  override def nullable: Boolean = true

  override def nullSafeEval(a: Any): Any = {
    val x = a.asInstanceOf[ArrayData]
    var i = 0
    var acc = 0.0
    while (i < x.numElements()) {
      if (x.isNullAt(i)) return null // NULL element propagates, never 0.0
      acc += x.getFloat(i).toDouble * x.getFloat(i).toDouble
      i += 1
    }
    math.sqrt(acc)
  }

  override protected def doGenCode(ctx: CodegenContext, ev: ExprCode): ExprCode =
    nullSafeCodeGen(ctx, ev, x => {
      s"""
         |Double r = org.apache.spark.sql.graft.VectorNorm.normOf($x);
         |if (r == null) { ${ev.isNull} = true; } else { ${ev.value} = r.doubleValue(); }
       """.stripMargin
    })

  override protected def withNewChildInternal(newChild: Expression): VectorNorm =
    copy(child = newChild)
}

object VectorNorm {
  /** Called from generated code — keep signature stable; null = NULL element. */
  def normOf(x: ArrayData): java.lang.Double = {
    var i = 0
    var acc = 0.0
    while (i < x.numElements()) {
      if (x.isNullAt(i)) return null
      acc += x.getFloat(i).toDouble * x.getFloat(i).toDouble
      i += 1
    }
    math.sqrt(acc)
  }
}

/** Mixed-precision dot product: `array<float>` · `array<double>`, fold
  * left-to-right as `acc += (double) a[i] * b[i]` — bit-identical to the
  * compiled-UDF kernels it replaced (ANN hyperplane projection), but inside
  * whole-stage codegen with no per-row boxing/conversion boundary.
  */
case class VectorDotFD(left: Expression, right: Expression)
  extends BinaryExpression with ExpectsInputTypes {

  override def inputTypes: Seq[AbstractDataType] =
    Seq(ArrayType(FloatType), ArrayType(DoubleType))
  override def dataType: DataType = DoubleType
  override def prettyName: String = "vec_dot_fd"
  override def nullable: Boolean = true

  override def nullSafeEval(a: Any, b: Any): Any = {
    val x = a.asInstanceOf[ArrayData]
    val y = b.asInstanceOf[ArrayData]
    if (x.numElements() != y.numElements()) null
    else {
      var i = 0
      var acc = 0.0
      while (i < x.numElements()) {
        if (x.isNullAt(i) || y.isNullAt(i)) return null
        acc += x.getFloat(i).toDouble * y.getDouble(i)
        i += 1
      }
      acc
    }
  }

  override protected def doGenCode(ctx: CodegenContext, ev: ExprCode): ExprCode =
    nullSafeCodeGen(ctx, ev, (x, y) => {
      val i = ctx.freshName("i")
      val acc = ctx.freshName("acc")
      val bad = ctx.freshName("hasNull")
      s"""
         |if ($x.numElements() != $y.numElements()) {
         |  ${ev.isNull} = true;
         |} else {
         |  double $acc = 0.0;
         |  boolean $bad = false;
         |  for (int $i = 0; $i < $x.numElements(); $i++) {
         |    if ($x.isNullAt($i) || $y.isNullAt($i)) { $bad = true; break; }
         |    $acc += (double) $x.getFloat($i) * $y.getDouble($i);
         |  }
         |  if ($bad) { ${ev.isNull} = true; } else { ${ev.value} = $acc; }
         |}
       """.stripMargin
    })

  override protected def withNewChildrenInternal(
      newLeft: Expression, newRight: Expression): VectorDotFD =
    copy(left = newLeft, right = newRight)
}

/** Squared L2 distance between an `array<float>` point and an
  * `array<double>` centroid: left-to-right `acc += d*d`,
  * `d = (double) a[i] - b[i]` — the same fold as sim_knn_per_label's former
  * compiled UDF kernel (and its DuckDB oracle), now codegen'd.
  */
case class VectorDistSq(left: Expression, right: Expression)
  extends BinaryExpression with ExpectsInputTypes {

  override def inputTypes: Seq[AbstractDataType] =
    Seq(ArrayType(FloatType), ArrayType(DoubleType))
  override def dataType: DataType = DoubleType
  override def prettyName: String = "vec_dist_sq"
  override def nullable: Boolean = true

  override def nullSafeEval(a: Any, b: Any): Any = {
    val x = a.asInstanceOf[ArrayData]
    val y = b.asInstanceOf[ArrayData]
    if (x.numElements() != y.numElements()) null
    else {
      var i = 0
      var acc = 0.0
      while (i < x.numElements()) {
        if (x.isNullAt(i) || y.isNullAt(i)) return null
        val d = x.getFloat(i).toDouble - y.getDouble(i)
        acc += d * d
        i += 1
      }
      acc
    }
  }

  override protected def doGenCode(ctx: CodegenContext, ev: ExprCode): ExprCode =
    nullSafeCodeGen(ctx, ev, (x, y) => {
      val i = ctx.freshName("i")
      val acc = ctx.freshName("acc")
      val dd = ctx.freshName("d")
      val bad = ctx.freshName("hasNull")
      s"""
         |if ($x.numElements() != $y.numElements()) {
         |  ${ev.isNull} = true;
         |} else {
         |  double $acc = 0.0;
         |  boolean $bad = false;
         |  for (int $i = 0; $i < $x.numElements(); $i++) {
         |    if ($x.isNullAt($i) || $y.isNullAt($i)) { $bad = true; break; }
         |    double $dd = (double) $x.getFloat($i) - $y.getDouble($i);
         |    $acc += $dd * $dd;
         |  }
         |  if ($bad) { ${ev.isNull} = true; } else { ${ev.value} = $acc; }
         |}
       """.stripMargin
    })

  override protected def withNewChildrenInternal(
      newLeft: Expression, newRight: Expression): VectorDistSq =
    copy(left = newLeft, right = newRight)
}

/** 1-based position of the candidate nearest to the point by squared L2 —
  * the FUSED form of the `crossJoin(broadcast(candidates))` +
  * `min_by(idx, struct(dist, idx))` assignment pattern the quantizer
  * trainers used: one map-side expression instead of a K-way row
  * explosion, an aggregation, and their shuffle. Per-candidate distance
  * is the identical left-to-right `acc += d*d` fold as [[VectorDistSq]],
  * and the comparison is `Double.compare(dist, best) < 0` — strictly
  * less keeps the LOWEST position on exact ties (= min_by's
  * (dist, idx) order when candidates are sorted by their id), and
  * Double.compare ranks NaN above every double exactly as Spark's
  * ordering does. NULL on an empty candidate list, a dimension
  * mismatch, or a NULL element — never a silently-wrong index.
  */
case class VectorArgminDistSq(left: Expression, right: Expression)
  extends BinaryExpression with ExpectsInputTypes {

  override def inputTypes: Seq[AbstractDataType] =
    Seq(ArrayType(FloatType), ArrayType(ArrayType(DoubleType)))
  override def dataType: DataType = IntegerType
  override def prettyName: String = "vec_argmin_dist"
  override def nullable: Boolean = true

  override def nullSafeEval(a: Any, b: Any): Any =
    VectorArgminDistSq.argminOf(
      a.asInstanceOf[ArrayData], b.asInstanceOf[ArrayData])

  override protected def doGenCode(ctx: CodegenContext, ev: ExprCode): ExprCode =
    nullSafeCodeGen(ctx, ev, (x, cs) => {
      s"""
         |java.lang.Integer r = org.apache.spark.sql.graft.VectorArgminDistSq.argminOf($x, $cs);
         |if (r == null) { ${ev.isNull} = true; } else { ${ev.value} = r.intValue(); }
       """.stripMargin
    })

  override protected def withNewChildrenInternal(
      newLeft: Expression, newRight: Expression): VectorArgminDistSq =
    copy(left = newLeft, right = newRight)
}

object VectorArgminDistSq {
  /** Called from generated code — keep signature stable; null = NULL. */
  def argminOf(x: ArrayData, cs: ArrayData): java.lang.Integer = {
    val n = cs.numElements()
    if (n == 0) return null
    var best = 0.0
    var bestPos = -1
    var c = 0
    while (c < n) {
      if (cs.isNullAt(c)) return null
      val y = cs.getArray(c)
      if (x.numElements() != y.numElements()) return null
      var i = 0
      var acc = 0.0
      while (i < x.numElements()) {
        if (x.isNullAt(i) || y.isNullAt(i)) return null
        val d = x.getFloat(i).toDouble - y.getDouble(i)
        acc += d * d
        i += 1
      }
      if (bestPos < 0 || java.lang.Double.compare(acc, best) < 0) {
        best = acc
        bestPos = c
      }
      c += 1
    }
    bestPos + 1 // 1-based, the SQL array convention (element_at-ready)
  }
}

object VectorOps {
  /** Column-API entry points (usable without SQL registration). */
  def vec_dot(a: Column, b: Column): Column =
    ExpressionUtils.column(VectorDot(ExpressionUtils.expression(a), ExpressionUtils.expression(b)))
  def vec_norm(a: Column): Column =
    ExpressionUtils.column(VectorNorm(ExpressionUtils.expression(a)))
  def vec_cosine(a: Column, b: Column): Column =
    vec_dot(a, b) / (vec_norm(a) * vec_norm(b))
  def vec_dot_fd(a: Column, b: Column): Column =
    ExpressionUtils.column(VectorDotFD(ExpressionUtils.expression(a), ExpressionUtils.expression(b)))
  def vec_dist_sq(a: Column, b: Column): Column =
    ExpressionUtils.column(VectorDistSq(ExpressionUtils.expression(a), ExpressionUtils.expression(b)))
  def vec_argmin_dist(a: Column, cands: Column): Column =
    ExpressionUtils.column(VectorArgminDistSq(ExpressionUtils.expression(a), ExpressionUtils.expression(cands)))

  /** Spark's native bloom-filter sketch pair, exposed to the Column API.
    * `BloomFilterAggregate` / `BloomFilterMightContain` are fully
    * implemented, codegen'd engine expressions — Spark's own
    * InjectRuntimeFilter plants them between fact scans — but they are NOT
    * in the public FunctionRegistry, so `expr("bloom_filter_agg(...)")`
    * fails to resolve. Same private[sql] plumbing as the vector kernels.
    */
  def bloom_agg(key: Column, numItems: Long, numBits: Long): Column =
    ExpressionUtils.column(
      new org.apache.spark.sql.catalyst.expressions.aggregate.BloomFilterAggregate(
        ExpressionUtils.expression(key),
        org.apache.spark.sql.catalyst.expressions.Literal(numItems),
        org.apache.spark.sql.catalyst.expressions.Literal(numBits))
        .toAggregateExpression())
  /** `might_contain` demands its bloom side be a constant or scalar
    * subquery (never a join column), so the probe test takes the whole
    * single-row build frame and plants it as a [[ScalarSubquery]] — the
    * exact shape InjectRuntimeFilter produces: the subquery runs once,
    * its binary result ships to every probe task as a literal.
    */
  def bloom_might_contain(bloom: org.apache.spark.sql.DataFrame, key: Column): Column =
    ExpressionUtils.column(
      org.apache.spark.sql.catalyst.expressions.BloomFilterMightContain(
        org.apache.spark.sql.catalyst.expressions.ScalarSubquery(
          bloom.queryExecution.analyzed),
        ExpressionUtils.expression(key)))

  /** Best-effort SQL registration on a live session (for `spark.sql` use
    * when the session was not built with [[GraftExtensions]]).
    */
  def register(spark: SparkSession): Unit = {
    val reg = spark.sessionState.functionRegistry
    reg.createOrReplaceTempFunction("vec_dot", es => VectorDot(es(0), es(1)), "built-in")
    reg.createOrReplaceTempFunction("vec_norm", es => VectorNorm(es.head), "built-in")
    reg.createOrReplaceTempFunction("vec_dot_fd", es => VectorDotFD(es(0), es(1)), "built-in")
    reg.createOrReplaceTempFunction("vec_dist_sq", es => VectorDistSq(es(0), es(1)), "built-in")
    reg.createOrReplaceTempFunction("vec_argmin_dist", es => VectorArgminDistSq(es(0), es(1)), "built-in")
    reg.createOrReplaceTempFunction("dct_sign_hash", es => DctSignHash(es(0), es(1)), "built-in")
  }
}

/** SparkSessionExtensions hook: `.config("spark.sql.extensions",
  * "org.apache.spark.sql.graft.GraftExtensions")` makes `vec_dot`/`vec_norm`
  * available to pure-SQL users cluster-wide.
  */
class GraftExtensions extends (SparkSessionExtensions => Unit) {
  override def apply(ext: SparkSessionExtensions): Unit = {
    ext.injectFunction((
      new FunctionIdentifier("vec_dot"),
      new ExpressionInfo(classOf[VectorDot].getName, "vec_dot"),
      (es: Seq[Expression]) => VectorDot(es(0), es(1))))
    ext.injectFunction((
      new FunctionIdentifier("vec_norm"),
      new ExpressionInfo(classOf[VectorNorm].getName, "vec_norm"),
      (es: Seq[Expression]) => VectorNorm(es.head)))
    ext.injectFunction((
      new FunctionIdentifier("vec_dot_fd"),
      new ExpressionInfo(classOf[VectorDotFD].getName, "vec_dot_fd"),
      (es: Seq[Expression]) => VectorDotFD(es(0), es(1))))
    ext.injectFunction((
      new FunctionIdentifier("vec_dist_sq"),
      new ExpressionInfo(classOf[VectorDistSq].getName, "vec_dist_sq"),
      (es: Seq[Expression]) => VectorDistSq(es(0), es(1))))
    ext.injectFunction((
      new FunctionIdentifier("vec_argmin_dist"),
      new ExpressionInfo(classOf[VectorArgminDistSq].getName, "vec_argmin_dist"),
      (es: Seq[Expression]) => VectorArgminDistSq(es(0), es(1))))
    ext.injectFunction((
      new FunctionIdentifier("dct_sign_hash"),
      new ExpressionInfo(classOf[DctSignHash].getName, "dct_sign_hash"),
      (es: Seq[Expression]) => DctSignHash(es(0), es(1))))
  }
}
