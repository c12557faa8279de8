package graft

import org.apache.spark.sql.{DataFrame, SparkSession}
import org.apache.spark.sql.functions._
import org.apache.spark.sql.types._
import Tables._

/** Iterative graph analytics over the order graph: PageRank on the
  * customer–supplier bipartite graph (edge = customer c bought from
  * supplier s, via orders ⋈ lineitem), made undirected so every node has
  * degree >= 1 and no dangling-mass correction is needed.
  *
  * Scale shape: the per-iteration step is one equi-join (edges ⋈ ranks on
  * src) + one hash aggregation (sum of contributions by dst) — O(edges)
  * rows shuffled per round, the same bounded-state iteration contract as
  * [[Similarity.labelPropagate]]. Edges (with degree attached) are computed
  * once and persisted; the rank frame is O(nodes). A fixed iteration count
  * keeps the lineage bounded (3 rounds — no checkpoint needed; a longer
  * run would spill to parquet every ~3 rounds exactly like labelPropagate).
  *
  * Determinism (rule D5): ranks are scaled BIGINT micro-units with
  * truncating integer division — r' = 150000 + (85 * Σ_u (r_u div deg_u))
  * div 100, i.e. damping 0.85 and a per-node base of 0.15 in units of 1e-6.
  * Every operand is non-negative, where Spark's `div` (truncate) and
  * DuckDB's `//` (floor) agree, so the result is bit-identical
  * cross-engine — no float summation order to worry about. Overflow head-
  * room: Σ ranks <= nodes * 1e6, times 85 — safely inside int64 up to
  * ~1e11 nodes.
  */
object Graph {
  type Q = (SparkSession, String) => DataFrame

  val Iterations = 3

  /** Customer–supplier edges, symmetric: (src, dst). Node ids: customer
    * c → 2c, supplier s → 2s+1. Both directions emit from ONE pass via
    * explode — the self-union form shares the distinct's shuffle between
    * branches (ReusedExchange) but still re-runs the final aggregate per
    * branch; explode keeps one aggregate and one scan in the plan.
    */
  private def symEdges(s: SparkSession, d: String): DataFrame =
    orders(s, d)
      .join(lineitem(s, d), col("l_orderkey") === col("o_orderkey"))
      .select((col("o_custkey") * 2).as("a"), (col("l_suppkey") * 2 + 1).as("b"))
      .distinct()
      .select(explode(array(
        struct(col("a").as("src"), col("b").as("dst")),
        struct(col("b").as("src"), col("a").as("dst")))).as("e"))
      .select(col("e.src").as("src"), col("e.dst").as("dst"))

  /** Symmetric edges with the source degree attached — degree rides a
    * whole-partition window (one shuffle of the edge list), not a
    * groupBy + self-join, which would pay a second aggregate and a join
    * pass over the same rows before the parquet spill.
    */
  private def edgesWithDeg(s: SparkSession, d: String): DataFrame =
    symEdges(s, d).withColumn("deg",
      count(lit(1)).over(org.apache.spark.sql.expressions.Window.partitionBy("src")))

  /** One edge spill per (process, dataset dir): repeated pagerank
    * constructions — including plan-only inspection (PlanRegressionSpec,
    * Explain) and Bench's min-of-2 rerun — reuse the first write instead of
    * accumulating a fresh tmpUnique dir each time (ADVICE.md round 5). The
    * fixtures under a dir are immutable for the life of the process, so
    * reuse is safe; computeIfAbsent serializes the one write. Cleaned with
    * the per-process tmp dir at JVM exit.
    */
  private val edgeSpill = new java.util.concurrent.ConcurrentHashMap[String, String]()

  def pagerank(s: SparkSession, d: String): DataFrame = {
    // The edge list is referenced once per iteration plus once for the
    // rank seed — spill it to parquet ONCE and read it back, so the
    // unrolled plan scans a small materialized file instead of recomputing
    // the orders ⋈ lineitem join per reference (a persist() here would
    // either leak past the query or, unpersisted before the action, drop
    // the blocks the plan still needs — the exact trap labelPropagate's
    // spill-every-3-rounds avoids). The write runs eagerly at construction
    // time, same contract as the Etl sink operators.
    val path = edgeSpill.computeIfAbsent(d, _ => {
      val p = Sources.tmpUnique("pr_edges")
      edgesWithDeg(s, d).write
        .mode(org.apache.spark.sql.SaveMode.Overwrite).parquet(p)
      p
    })
    val edges = s.read.parquet(path)
    var ranks = edges.select(col("src").as("node")).distinct()
      .withColumn("pr", lit(1000000L))
    for (_ <- 1 to Iterations) {
      ranks = edges.join(ranks, edges("src") === ranks("node"))
        .select(col("dst"), expr("pr div deg").as("c"))
        .groupBy("dst")
        .agg(sum("c").as("in_mass"))
        .select(col("dst").as("node"),
          expr("150000L + (85L * in_mass) div 100L").as("pr"))
    }
    ranks.orderBy("node")
  }

  val queries: Map[String, Q] = Map(
    "graph_pagerank" -> (pagerank _),

    // Degree distribution of the same bipartite graph — the first sanity
    // scan any graph pipeline runs (skew here predicts every downstream
    // join's hot keys). One distinct + two hash aggregations, O(edges);
    // no degree join needed, the histogram groupBy IS the degree count.
    "graph_degree_histogram" -> ((s, d) =>
      symEdges(s, d).groupBy("src").agg(count(lit(1)).as("deg"))
        .groupBy("deg").agg(count(lit(1)).as("n_nodes"))
        .orderBy("deg"))
  )

  /** Shared oracle prefix: symmetric edge list + per-node degree. */
  private val EdgesCte =
    "WITH e0 AS (SELECT DISTINCT o.o_custkey * 2 AS src, l.l_suppkey * 2 + 1 AS dst " +
    "FROM orders o JOIN lineitem l ON l.l_orderkey = o.o_orderkey), " +
    "e AS (SELECT src, dst FROM e0 UNION ALL SELECT dst, src FROM e0), " +
    "dg AS (SELECT src, count(*) AS deg FROM e GROUP BY src)"

  /** The oracle unrolls the same three integer-exact iterations as chained
    * CTEs (DuckDB has no loops; the chain is generated, not hand-written).
    */
  private def oraclePagerank: String = {
    val base = EdgesCte +
      ", r0 AS (SELECT src AS node, CAST(1000000 AS BIGINT) AS pr FROM dg)"
    val iters = (1 to Iterations).map { i =>
      s"r$i AS (SELECT e.dst AS node, 150000 + (85 * sum(r${i - 1}.pr // dg.deg)) // 100 AS pr " +
      s"FROM e JOIN r${i - 1} ON e.src = r${i - 1}.node JOIN dg ON e.src = dg.src " +
      "GROUP BY e.dst)"
    }.mkString(", ", ", ", " ")
    base + iters +
      s"SELECT node, CAST(pr AS BIGINT) AS pr FROM r$Iterations ORDER BY node"
  }

  val oracles: Map[String, String] = Map(
    "graph_pagerank" -> oraclePagerank,

    "graph_degree_histogram" ->
      (EdgesCte +
       " SELECT deg, count(*) AS n_nodes FROM dg GROUP BY deg ORDER BY deg")
  )
}
