package graft

import org.scalatest.funsuite.AnyFunSuite
import org.apache.spark.sql.functions._
import TestSpark.{spark, Sf01}

/** ANN quality metric (VERDICT.md round-1 stretch #10): recall of the
  * multi-probe LSH path against exact per-query ground truth at sf0.1 —
  * determinism and ranking shape alone say nothing about whether the index
  * finds true neighbors.
  */
class AnnRecallSpec extends AnyFunSuite {

  test("sim_ann_lsh multi-probe recall@10 vs exact top-10 at sf0.1") {
    val ann = SparkEntry.queries("sim_ann_lsh")(spark, Sf01).collect()
      .groupBy(_.getLong(0)).view.mapValues(_.map(_.getLong(1)).toSet).toMap
    val vecs = Tables.embeddings(spark, Sf01)
      .select("vec_id", "embedding").collect()
      .map(r => r.getLong(0) -> r.getSeq[Float](1).toArray)
    def dot(a: Array[Float], b: Array[Float]) =
      a.indices.foldLeft(0.0)((acc, i) => acc + a(i).toDouble * b(i).toDouble)
    def nrm(a: Array[Float]) = math.sqrt(dot(a, a))
    val norms = vecs.map { case (id, v) => id -> nrm(v) }.toMap
    val queries = vecs.filter(_._1 < 10)
    val recalls = queries.map { case (qid, qv) =>
      val exact = vecs.filter(_._1 != qid)
        .map { case (id, v) => id -> dot(qv, v) / (norms(qid) * norms(id)) }
        .sortBy { case (id, c) => (-c, id) }.take(10).map(_._1).toSet
      val got = ann.getOrElse(qid, Set.empty)
      (exact intersect got).size.toDouble / exact.size
    }
    val mean = recalls.sum / recalls.length
    info(f"mean recall@10 over ${recalls.length} queries: $mean%.3f")
    // ~14% of the table is scanned (37 of 256 buckets); on this fixture's
    // uniform random vectors that yields ~0.4 mean recall — pinned floor
    // guards against silent index regressions, not absolute quality
    assert(mean >= 0.25, f"multi-probe recall collapsed: $mean%.3f")
  }
}
