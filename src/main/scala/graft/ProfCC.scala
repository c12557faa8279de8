package graft
import org.apache.spark.sql.SparkSession
object ProfCC {
  def main(args: Array[String]): Unit = {
    val d = "/root/testdata/sf0.1"
    val spark = SparkSession.builder().master("local[32]")
      .config("spark.sql.shuffle.partitions", "32")
      .config("spark.sql.session.timeZone", "UTC")
      .config("spark.sql.legacy.parquet.nanosAsLong", "true")
      .config("spark.sql.extensions", "org.apache.spark.sql.graft.GraftExtensions")
      .config("spark.ui.enabled", "false").getOrCreate()
    spark.sparkContext.setLogLevel("WARN")
    // the per-round labelPropagate telemetry lives behind this flag
    System.setProperty("graft.cc.verbose", "true")
    Tables.names.foreach(n => Tables.t(spark, d, n).count())
    def time[T](label: String)(f: => T): T = {
      val t0 = System.nanoTime(); val r = f
      System.err.println(f"[prof] $label: ${(System.nanoTime()-t0)/1e9}%.2f s"); r
    }
    // cold pass
    val pairs = Similarity.minhashCandidates(spark, d, 0.8).select("da","db")
    time("minhashCandidates.count (cold)")(pairs.count())
    time("minhashCandidates.count (2nd)")(pairs.count())
    time("full dedup_cluster_cc")(SparkEntry.queries("dedup_cluster_cc")(spark, d).count())
    time("full dedup_cluster_cc (2nd)")(SparkEntry.queries("dedup_cluster_cc")(spark, d).count())
    time("full dedup_cluster_jaccard")(SparkEntry.queries("dedup_cluster_jaccard")(spark, d).count())
    // Context-sensitivity probe (VERDICT r6 #2): the ANN training heavies
    // leave broadcast/old-gen residue; measure whether cluster_cc inflates
    // when run right after them — the in-full-bench condition that the
    // clean 4-query subset above does not reproduce.
    time("sim_ann_pq (context load)")(SparkEntry.queries("sim_ann_pq")(spark, d).count())
    time("sim_ann_ivfpq (context load)")(SparkEntry.queries("sim_ann_ivfpq")(spark, d).count())
    time("full dedup_cluster_cc (after ANN heavies)")(
      SparkEntry.queries("dedup_cluster_cc")(spark, d).count())
    time("full dedup_cluster_cc (after ANN heavies, 2nd)")(
      SparkEntry.queries("dedup_cluster_cc")(spark, d).count())
    spark.stop()
  }
}
