package graft

import org.scalatest.funsuite.AnyFunSuite
import org.apache.spark.sql.functions._
import TestSpark.{spark, Sf0001}

/** Schema evolution across parquet batches — at 100 TB data lands over
  * months and the schema grows; readers must handle old files missing new
  * columns (mergeSchema) without rewriting history.
  */
class SchemaEvolutionSpec extends AnyFunSuite {

  test("mergeSchema reads old and new batches; missing columns are null") {
    val dir = "/tmp/graft_evolve"
    val f = new java.io.File(dir)
    def rm(x: java.io.File): Unit = { if (x.isDirectory) x.listFiles().foreach(rm); x.delete() }
    if (f.exists()) rm(f)

    val v1 = Tables.nation(spark, Sf0001).select("n_nationkey", "n_name")
    v1.write.parquet(s"$dir/batch=1")
    val v2 = Tables.nation(spark, Sf0001)
      .select(col("n_nationkey"), col("n_name"), col("n_regionkey"),
        lit("v2").as("ingest_tag"))
    v2.write.parquet(s"$dir/batch=2")

    val merged = spark.read.option("mergeSchema", "true").parquet(dir)
    assert(merged.columns.toSet ==
      Set("n_nationkey", "n_name", "n_regionkey", "ingest_tag", "batch"))
    assert(merged.count() == 50)
    // old batch: evolved columns are null, not errors
    assert(merged.filter(col("batch") === 1 && col("ingest_tag").isNull).count() == 25)
    assert(merged.filter(col("batch") === 2 && col("ingest_tag") === "v2").count() == 25)
    // aggregation over the union still works with nulls in evolved columns
    val byTag = merged.groupBy("ingest_tag").count().collect()
      .map(r => Option(r.getString(0)) -> r.getLong(1)).toMap
    assert(byTag(None) == 25 && byTag(Some("v2")) == 25)
  }

  test("etl_schema_evolution (registered): v1 rows read NULL for evolved columns") {
    val rows = SparkEntry.queries("etl_schema_evolution")(spark, Sf0001).collect()
    val docs = Tables.documents(spark, Sf0001).count()
    assert(rows.length == docs, "merged read lost rows across batches")
    rows.foreach { r =>
      val (id, batch) = (r.getLong(0), r.getInt(4))
      if (id % 2 == 0) {
        assert(batch == 1 && r.isNullAt(2) && r.isNullAt(3),
          s"v1 doc $id: evolved columns must be NULL, got $r")
      } else {
        assert(batch == 2 && !r.isNullAt(2) && !r.isNullAt(3),
          s"v2 doc $id: evolved columns must be populated, got $r")
      }
    }
  }
}
