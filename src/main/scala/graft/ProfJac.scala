package graft
import org.apache.spark.sql.{DataFrame, SparkSession}
import org.apache.spark.sql.expressions.Window
import org.apache.spark.sql.functions._

/** Dev-only A/B profiler for the jaccardPairs hot-shingle guard (window vs
  * aggregate+join) — run manually, not part of the driver surface.
  */
object ProfJac {
  def main(args: Array[String]): Unit = {
    val d = "/root/testdata/sf0.1"
    val spark = SparkSession.builder().master("local[32]")
      .config("spark.sql.shuffle.partitions", "32")
      .config("spark.sql.session.timeZone", "UTC")
      .config("spark.sql.legacy.parquet.nanosAsLong", "true")
      .config("spark.ui.enabled", "false").getOrCreate()
    spark.sparkContext.setLogLevel("WARN")
    def time[T](label: String)(f: => T): T = {
      val t0 = System.nanoTime(); val r = f
      System.err.println(f"[prof] $label: ${(System.nanoTime() - t0) / 1e9}%.2f s"); r
    }
    def shingles(): DataFrame = {
      import Tables._
      documents(spark, d)
        .select(col("doc_id"), split(col("text"), " ").as("toks"))
        .select(col("doc_id"), explode(
          expr("transform(sequence(1, greatest(size(toks) - 2, 1)), " +
               "i -> concat_ws(' ', get(toks, i-1), get(toks, i), get(toks, i+1)))")).as("raw"))
        .select(col("doc_id"), xxhash64(col("raw")).as("g"))
        .distinct()
    }
    def pairsFrom(sh: DataFrame): DataFrame = {
      val sz = sh.groupBy("doc_id").agg(count(lit(1)).as("n"))
      val inter = sh.as("a").join(sh.as("b"),
          col("a.g") === col("b.g") && col("a.doc_id") < col("b.doc_id"))
        .groupBy(col("a.doc_id").as("da"), col("b.doc_id").as("db"))
        .agg(count(lit(1)).as("inter"))
      inter
        .join(sz.select(col("doc_id").as("da"), col("n").as("na")), "da")
        .join(sz.select(col("doc_id").as("db"), col("n").as("nb")), "db")
        .where(col("inter") * 2 >= col("na") + col("nb") - col("inter"))
    }
    val winGuard = {
      val all = shingles()
      pairsFrom(all.withColumn("df", count(lit(1)).over(Window.partitionBy("g")))
        .where(col("df") <= Similarity.ShingleDfCap).drop("df"))
    }
    val aggGuard = {
      val all = shingles()
      val ok = all.groupBy("g").agg(count(lit(1)).as("df"))
        .where(col("df") <= Similarity.ShingleDfCap).select("g")
      pairsFrom(all.join(ok, "g"))
    }
    for (i <- 1 to 3) {
      time(s"window guard #$i")(winGuard.count())
      time(s"agg+join guard #$i")(aggGuard.count())
    }
    spark.stop()
  }
}
