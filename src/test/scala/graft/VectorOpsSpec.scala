package graft

import org.scalatest.funsuite.AnyFunSuite
import org.apache.spark.sql.functions._
import org.apache.spark.sql.graft.VectorOps
import TestSpark.{spark, Sf0001}

class VectorOpsSpec extends AnyFunSuite {

  test("vec_dot/vec_norm match an exact Scala loop") {
    val rows = Tables.embeddings(spark, Sf0001)
      .select(col("vec_id"),
        VectorOps.vec_dot(col("embedding"), col("embedding")).as("d"),
        VectorOps.vec_norm(col("embedding")).as("n"))
      .collect().map(r => r.getLong(0) -> ((r.getDouble(1), r.getDouble(2)))).toMap
    val vecs = Tables.embeddings(spark, Sf0001).select("vec_id", "embedding")
      .collect().map(r => r.getLong(0) -> r.getSeq[Float](1).toArray)
    vecs.take(50).foreach { case (id, v) =>
      val d = v.foldLeft(0.0)((acc, x) => acc + x.toDouble * x.toDouble)
      val (gd, gn) = (rows(id)._1, rows(id)._2)
      assert(gd == d, s"dot mismatch for $id")
      assert(gn == math.sqrt(d), s"norm mismatch for $id")
    }
  }

  test("vec_dot equals the HOF formulation bit-for-bit") {
    val mismatch = Tables.embeddings(spark, Sf0001)
      .select(
        VectorOps.vec_dot(col("embedding"), col("embedding")).as("native"),
        expr("aggregate(transform(embedding, x -> CAST(x AS DOUBLE) * CAST(x AS DOUBLE)), " +
             "CAST(0.0 AS DOUBLE), (acc, x) -> acc + x)").as("hof"))
      .filter(col("native") =!= col("hof")).count()
    assert(mismatch == 0)
  }

  test("vec_dot works from SQL after registration") {
    VectorOps.register(spark)
    val n = spark.sql(
      s"SELECT vec_dot(embedding, embedding) AS d, vec_norm(embedding) AS n " +
      s"FROM parquet.`$Sf0001/embeddings.parquet`").collect()
    assert(n.length == 500)
    n.foreach(r => assert(math.abs(math.sqrt(r.getDouble(0)) - r.getDouble(1)) == 0.0))
  }

  test("vec_dot stays inside whole-stage codegen") {
    val plan = Tables.embeddings(spark, Sf0001)
      .select(VectorOps.vec_dot(col("embedding"), col("embedding")).as("d"))
      .queryExecution.executedPlan.toString
    // "*(n)" prefixes mark whole-stage-codegen stages in the plan string; an
    // interpreted expression would force the Project out of the span.
    assert(plan.contains("*(1) Project"), s"no codegen span:\n$plan")
  }

  test("vec_dot_fd / vec_dist_sq match their explicit double folds and null rules") {
    import spark.implicits._
    val df = Seq(
      (1L, Seq(1.0f, 2.0f, 3.0f)),
      (2L, Seq(0.5f, -1.5f, 2.25f))).toDF("id", "v")
      .withColumn("c", typedLit(Seq(0.25, -0.75, 1.5)))
    val got = df.select(col("id"),
        VectorOps.vec_dot_fd(col("v"), col("c")).as("dot"),
        VectorOps.vec_dist_sq(col("v"), col("c")).as("dist"))
      .collect().map(r => r.getLong(0) -> ((r.getDouble(1), r.getDouble(2)))).toMap
    val c = Seq(0.25, -0.75, 1.5)
    Seq(1L -> Seq(1.0f, 2.0f, 3.0f), 2L -> Seq(0.5f, -1.5f, 2.25f)).foreach {
      case (id, v) =>
        val dot = v.zip(c).foldLeft(0.0) { case (a, (x, y)) => a + x.toDouble * y }
        val dist = v.zip(c).foldLeft(0.0) { case (a, (x, y)) =>
          val d = x.toDouble - y; a + d * d }
        assert(got(id)._1 == dot && got(id)._2 == dist, s"mismatch for $id")
    }
    // dimension mismatch -> NULL (never a silently-truncated partial result)
    val mism = df.select(
      VectorOps.vec_dist_sq(col("v"), typedLit(Seq(1.0, 2.0))).as("d")).collect()
    assert(mism.forall(_.isNullAt(0)))
  }

  test("vec_argmin_dist equals the min_by formulation it fused (round 11)") {
    import spark.implicits._
    // against real fixture vectors and a 16-candidate set: the fused
    // argmin must reproduce crossJoin + min_by(struct(dist, idx)) exactly
    val cands = Tables.embeddings(spark, Sf0001)
      .where(col("vec_id") < 16).orderBy("vec_id")
      .select(expr("transform(embedding, x -> CAST(x AS DOUBLE))").as("ce"))
      .collect().map(_.getSeq[Double](0)).toSeq
    val e = Tables.embeddings(spark, Sf0001).select("vec_id", "embedding")
    val fused = e.select(col("vec_id"),
        VectorOps.vec_argmin_dist(col("embedding"), typedLit(cands)).as("pos"))
      .collect().map(r => r.getLong(0) -> r.getInt(1)).toMap
    val reference = e.crossJoin(
        cands.zipWithIndex.map { case (v, i) => (i + 1, v) }.toDF("pos", "ce"))
      .select(col("vec_id"), col("pos"),
        VectorOps.vec_dist_sq(col("embedding"), col("ce")).as("dd"))
      .groupBy("vec_id")
      .agg(expr("min_by(pos, struct(dd, pos))").as("pos"))
      .collect().map(r => r.getLong(0) -> r.getInt(1)).toMap
    assert(fused == reference, "fused argmin drifted from min_by")
    // exact tie -> lowest position (duplicate candidate)
    val tie = Seq((1L, Seq(1.0f, 1.0f))).toDF("id", "v")
      .select(VectorOps.vec_argmin_dist(col("v"),
        typedLit(Seq(Seq(9.0, 9.0), Seq(1.0, 1.0), Seq(1.0, 1.0)))).as("p"))
      .collect()(0).getInt(0)
    assert(tie == 2, s"tie did not keep the lowest position: $tie")
    // empty candidate list and dimension mismatch -> NULL
    val degenerate = Seq((1L, Seq(1.0f, 1.0f))).toDF("id", "v")
      .select(
        VectorOps.vec_argmin_dist(col("v"), typedLit(Seq.empty[Seq[Double]])).as("a"),
        VectorOps.vec_argmin_dist(col("v"), typedLit(Seq(Seq(1.0)))).as("b"))
      .collect()(0)
    assert(degenerate.isNullAt(0) && degenerate.isNullAt(1))
  }
}
