package graft

import org.scalatest.funsuite.AnyFunSuite
import TestSpark.{spark, Sf0001}

/** Guards on the driver contract itself: every oracle belongs to a query,
  * and every registered query produces rows on the smoke fixture (the
  * driver's weaker rows-only check needs rows > 0; an empty result would
  * silently zero that operator's score).
  */
class ContractSpec extends AnyFunSuite {

  test("every oracle key has a query") {
    val orphans = SparkEntry.oracleSql.keySet -- SparkEntry.queries.keySet
    assert(orphans.isEmpty, s"oracles without queries: $orphans")
  }

  test("entry() returns rows") {
    assert(SparkEntry.entry(spark).count() > 0)
  }

  test("every query returns rows at sf0.001 (except known-empty oracle-matched ones)") {
    // join_anti is legitimately empty (every customer has orders) — its
    // ORACLE is empty too, so the hash match still passes.
    val mayBeEmpty = Set("join_anti", "set_except")
    val failures = SparkEntry.queries.toSeq.sortBy(_._1).flatMap { case (name, fn) =>
      try {
        val n = fn(spark, Sf0001).count()
        if (n == 0 && !mayBeEmpty.contains(name)) Some(s"$name: empty") else None
      } catch { case e: Throwable => Some(s"$name: ${e.getMessage.take(100)}") }
    }
    assert(failures.isEmpty, failures.mkString("\n"))
  }
}
