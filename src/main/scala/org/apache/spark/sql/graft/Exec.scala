package org.apache.spark.sql.graft

import org.apache.spark.sql.DataFrame
import org.apache.spark.sql.execution.SQLExecution

/** Bench's full-materialization action (code-review r13, second pass).
  *
  * `df.count()` lets Catalyst prune projected expressions and final sorts,
  * under-measuring queries whose cost lives there; a bare
  * `queryExecution.toRdd.count()` fixes that but posts NO
  * SparkListenerSQLExecutionEnd event, so `QueryExecutionListener`s —
  * including graft's `releaseAfterUse` cache-release hook — never fire,
  * leaking persisted frames across the bench and letting later runs of
  * the same query measure a cached plan. `fullCount` does both halves
  * correctly: the RDD action forces every output column with no
  * driver-side row conversion, and `SQLExecution.withNewExecutionId`
  * (accessible from this bridge package, the VectorOps precedent) wraps
  * it in a named SQL execution so listeners observe the same
  * QueryExecution a Dataset action would have posted.
  */
object Exec {
  def fullCount(df: DataFrame): Long = {
    val qe = df.queryExecution
    SQLExecution.withNewExecutionId(qe, Some("fullCount")) {
      qe.toRdd.count()
    }
  }
}
