package graft
import org.apache.spark.sql.SparkSession
import org.apache.spark.sql.functions._

/** Phase profile for graph_connected_components (VERDICT r7 #5): where do
  * the ~5.6 s go when the propagation rounds themselves cost ~1.5 s warm?
  */
object ProfGcc {
  def main(args: Array[String]): Unit = {
    val d = "/root/testdata/sf0.1"
    val spark = SparkSession.builder().master("local[32]")
      .config("spark.sql.shuffle.partitions", "32")
      .config("spark.sql.session.timeZone", "UTC")
      .config("spark.sql.legacy.parquet.nanosAsLong", "true")
      .config("spark.sql.extensions", "org.apache.spark.sql.graft.GraftExtensions")
      .config("spark.ui.enabled", "false").getOrCreate()
    spark.sparkContext.setLogLevel("WARN")
    System.setProperty("graft.cc.verbose", "true")
    Tables.names.foreach(n => Tables.t(spark, d, n).count())
    def time[T](label: String)(f: => T): T = {
      val t0 = System.nanoTime(); val r = f
      System.err.println(f"[prof] $label: ${(System.nanoTime()-t0)/1e9}%.2f s"); r
    }
    val q = SparkEntry.queries("graph_connected_components")
    time("graph_cc cold (spill build)")(q(spark, d).count())
    time("graph_cc warm")(q(spark, d).count())
    time("graph_cc warm 2")(q(spark, d).count())
    // phases of the warm run
    val e = Graph.orientedCoEdges(spark, d)
      .select(col("src").as("da"), col("dst").as("db"))
    time("edge spill read+count")(e.count())
    val nodes = Tables.part(spark, d).select(col("p_partkey").as("doc_id"))
    time("nodes scan count")(nodes.count())
    time("labelPropagate only") {
      Similarity.labelPropagate(nodes, e, "prof_gcc", durableEdges = true).count()
    }
    time("final orderBy over part only") {
      nodes.orderBy("doc_id").count()
    }
    spark.stop()
  }
}
