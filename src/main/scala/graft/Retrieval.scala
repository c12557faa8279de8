package graft

import org.apache.spark.sql.{DataFrame, SparkSession}
import org.apache.spark.sql.expressions.Window
import org.apache.spark.sql.functions._
import org.apache.spark.sql.types.LongType
import Tables._

/** HYBRID retrieval — the stage that sits between the standing indexes
  * (BM25 posting lists, the ANN families) and a RAG / retrieval consumer:
  * fusing a lexical and a dense ranked list into one (reciprocal-rank
  * fusion, Cormack, Clarke & Büttcher SIGIR 2009), and the two-stage
  * cascade (cheap recall-oriented candidate generation → exact dense
  * rerank of the small pool) every production retrieval stack runs.
  *
  * Both keys consume [[TextOps.bm25Scored]] — the SAME integer-scaled
  * candidate generator `text_bm25_topk` certifies — so the lexical half
  * carries no new arithmetic, and the dense half is the codegen'd
  * `vec_dot` cosine already certified by the sim_* family. Probe
  * convention: query ids < 20 exist in BOTH tables at every SF (query
  * text = the document's text, query vector = its embedding row); the
  * corpus sides are each system's OWN collection (doc_id >= 20 /
  * vec_id >= 20), which at sf0.1 genuinely diverge (5 000 docs vs 2 000
  * vectors) — exactly the partial-coverage shape hybrid retrieval exists
  * for, and what makes the fusion/rerank behavior non-vacuous here.
  *
  * Determinism (rule D5): RRF contributions are integer —
  * 1e6 div (k + rank) with the paper's k = 60 — so the fused score is a
  * BIGINT sum and ships in the output; the dense ranking's float cosine
  * never ships (rank-only), and its oracle reproduces the exact fold
  * order of the compiled kernel (the oDot/seededFold convention), so the
  * ranks compare bit-exactly cross-engine.
  *
  * At 100 TB: each system's list is already bounded per query (PoolN
  * rows) before fusion, so the fuse/rerank stage is probes × PoolN rows
  * regardless of corpus size — the heavy lifting stays in the index
  * scans, which is the entire point of the cascade architecture. The
  * rerank's embedding fetch is an equi-join of the tiny candidate frame
  * against the vector store (id-keyed, broadcast-able), not a scan.
  */
object Retrieval {
  type Q = (SparkSession, String) => DataFrame

  /** RRF's smoothing constant — the k = 60 of the original paper. */
  val RrfK = 60

  /** Per-system pool width fed into fusion / rerank (the candidate list a
    * first-stage retriever would return).
    */
  val PoolN = 20

  /** Final answer width per query. */
  val TopK = 5

  /** Lexical pool: per-query BM25 top-[[PoolN]] with rank. */
  private def lexPool(s: SparkSession, d: String): DataFrame = {
    val w = Window.partitionBy("query_id")
      .orderBy(col("score_micro").desc, col("doc_id").asc)
    TextOps.bm25Scored(s, d).withColumn("rn", row_number().over(w))
      .where(col("rn") <= PoolN)
  }

  /** Dense pool: per-query exact-cosine top-[[PoolN]] over the embedding
    * corpus (vec_id >= 20), queries broadcast — the sim_topk shape with a
    * bounded probe set. At scale this list comes from an ANN probe
    * (sim_ann_ivfpq_probe / graph search); the exact kernel here makes
    * the fusion semantics oracle-checkable end to end.
    */
  private def densePool(s: SparkSession, d: String): DataFrame = {
    import org.apache.spark.sql.graft.VectorOps.{vec_dot, vec_norm}
    val e = embeddings(s, d).select(col("vec_id"), col("embedding"),
      vec_norm(col("embedding")).as("nrm"))
    val q = e.where(col("vec_id") < 20)
      .select(col("vec_id").as("query_id"), col("embedding").as("qe"),
        col("nrm").as("qn"))
    val w = Window.partitionBy("query_id")
      .orderBy(col("cos").desc, col("item_id").asc)
    e.where(col("vec_id") >= 20)
      .crossJoin(broadcast(q))
      .select(col("query_id"), col("vec_id").as("item_id"),
        (vec_dot(col("qe"), col("embedding")) / (col("qn") * col("nrm"))).as("cos"))
      .withColumn("rn", row_number().over(w))
      .where(col("rn") <= PoolN)
  }

  /** Dense pool served from the PERSISTED IVF-PQ artifacts (round 20,
    * VERDICT r19 #1 — "the serving layer eats its own artifacts"): the
    * §2.9 probe's (qid, nn, rn) top-10, read probe-only from the
    * coarse_centroids / codebooks / codes / lists parquet (builds==0
    * pinned by RetrievalSpec). Two deliberate differences from
    * [[densePool]]: query ids follow the INDEX's probe convention
    * (vec_id < 10 — the lexical side filters to match), and the dense
    * collection is whatever the index serves (the full vector corpus
    * minus self, including ids 10..19) rather than the >= 20 slice —
    * a production index answers from ITS corpus, and fusion tolerates
    * collection mismatch by construction (the partial-coverage point).
    */
  private def annPool(s: SparkSession, d: String): DataFrame =
    AnnIndex.probe(s, d)
      .select(col("qid").as("query_id"), col("nn").as("item_id"), col("rn"))

  /** Dense pool served from the persisted GRAPH-ANN index — the beam
    * search's top-10, same serving contract as [[annPool]] on the other
    * index family (RetrievalSpec pins builds==0 for it too).
    */
  private def gannPool(s: SparkSession, d: String): DataFrame =
    GraphAnnIndex.search(s, d)
      .select(col("qid").as("query_id"), col("nn").as("item_id"), col("rn"))

  /** The RRF fuse + top-k tail over N ranked pools of
    * (query_id, item_id, rn) — ONE definition for the exact, the two
    * index-served, and the 3-way fusions, so the fuse arithmetic cannot
    * fork. n_systems counts nominating pools (RRF is defined for any N —
    * the original paper fuses dozens of runs).
    */
  private def fuseTop(pools: DataFrame*): DataFrame = {
    val contrib = (pool: DataFrame) => pool
      .select(col("query_id"), col("item_id"),
        expr(s"1000000L div ($RrfK + rn)").as("c"))
    val fused = pools.map(contrib).reduce(_ unionByName _)
      .groupBy("query_id", "item_id")
      .agg(sum("c").cast(LongType).as("rrf_micro"),
        count(lit(1)).as("n_systems"))
    val w = Window.partitionBy("query_id")
      .orderBy(col("rrf_micro").desc, col("item_id").asc)
    fused.withColumn("rn", row_number().over(w))
      .where(col("rn") <= TopK)
      .select("query_id", "rn", "item_id", "rrf_micro", "n_systems")
      .orderBy("query_id", "rn")
  }

  /** The lexical pool as a (query_id, item_id, rn) frame, cut to the
    * index families' probe-query convention.
    */
  private def lexPool10(s: SparkSession, d: String): DataFrame =
    lexPool(s, d).where(col("query_id") < 10)
      .select(col("query_id"), col("doc_id").as("item_id"), col("rn"))

  val queries: Map[String, Q] = Map(
    // Reciprocal-rank fusion of the BM25 and dense lists: each system
    // contributes 1e6 div (60 + rank) for its pooled items, the fused
    // score is the integer sum, and the per-query top-5 ships with the
    // contributing-system count (n_systems = 2 marks consensus items —
    // present and non-vacuous at every SF).
    "retrieval_rrf_fusion" -> ((s, d) =>
      fuseTop(
        lexPool(s, d).select(col("query_id"), col("doc_id").as("item_id"), col("rn")),
        densePool(s, d).select("query_id", "item_id", "rn"))),

    // Two-stage cascade: BM25 recall pool → exact dense rerank. The
    // candidate frame (probes × PoolN rows) equi-joins its embeddings
    // from the vector store; candidates without a stored vector drop at
    // the join (at sf0.1 the doc corpus outgrows the embedding corpus —
    // the real partial-coverage case a cascade must tolerate). Output is
    // rank-only (D5) and carries the pre-rerank bm25_rn so the reorder
    // is visible in the answer itself.
    "retrieval_dense_rerank" -> ((s, d) => {
      import org.apache.spark.sql.graft.VectorOps.{vec_dot, vec_norm}
      val e = embeddings(s, d).select(col("vec_id"), col("embedding"),
        vec_norm(col("embedding")).as("nrm"))
      val q = e.where(col("vec_id") < 20)
        .select(col("vec_id").as("query_id"), col("embedding").as("qe"),
          col("nrm").as("qn"))
      val cands = lexPool(s, d)
        .select(col("query_id"), col("doc_id"), col("rn").as("bm25_rn"))
      val w = Window.partitionBy("query_id")
        .orderBy(col("cos").desc, col("doc_id").asc)
      // the candidate frame (probes × PoolN rows) is the broadcast side BY
      // CONTRACT — without the hint Spark's size estimate builds the
      // embeddings scan, which at 100 TB means broadcasting the vector
      // store instead of the bounded pool
      broadcast(cands).join(e, cands("doc_id") === e("vec_id"))
        .join(broadcast(q), "query_id")
        .select(col("query_id"), col("doc_id"), col("bm25_rn"),
          (vec_dot(col("qe"), col("embedding")) / (col("qn") * col("nrm"))).as("cos"))
        .withColumn("rn", row_number().over(w))
        .where(col("rn") <= TopK)
        .select("query_id", "rn", "doc_id", "bm25_rn")
        .orderBy("query_id", "rn")
    }),

    // RRF fusion SERVED FROM THE INDEX (round 20): the dense list is the
    // persisted IVF-PQ probe's ranking — no exact corpus scan anywhere in
    // the dense leg; the heavy lifting is nprobe inverted-list shards + ADC
    // table lookups, which is the at-scale shape the exact key's scaladoc
    // names. Same integer RRF arithmetic; query ids < 10 (the index's probe
    // convention).
    "retrieval_rrf_fusion_ann" -> ((s, d) =>
      fuseTop(lexPool10(s, d), annPool(s, d))),

    // The graph-family twin (round 20): the dense list is the persisted
    // graph index's serving beam — both standing vector indexes now feed
    // the retrieval layer. The oracle wraps the certified
    // sim_ann_graph_search chain verbatim as a CTE (the gann_recall_eval
    // composition move).
    "retrieval_rrf_fusion_gann" -> ((s, d) =>
      fuseTop(lexPool10(s, d), gannPool(s, d))),

    // THREE-system fusion (round 20): BM25 ∪ IVF-PQ probe ∪ graph beam —
    // the multi-run case RRF was published for (Cormack et al. fuse
    // dozens of runs), and the shape a production stack with several
    // retrievers actually serves. Both dense lists read persisted
    // artifacts only; n_systems now ranges 1..3 and triple-consensus
    // items rank first by construction.
    "retrieval_rrf_fusion_3way" -> ((s, d) =>
      fuseTop(lexPool10(s, d), annPool(s, d), gannPool(s, d))),

    // Two-stage cascade SERVED FROM THE INDEX (round 20): candidates =
    // BM25 top-PoolN ∪ the persisted IVF-PQ probe's top-10 (the hybrid
    // candidate union a production RAG stack runs — each system recalls
    // what the other misses), exact dense rerank of the bounded union.
    // n_sources counts which systems nominated each candidate BEFORE the
    // vector fetch (a lexical candidate without a stored vector drops at
    // the join exactly as in retrieval_dense_rerank). Per query the rerank
    // touches ≤ PoolN + 10 vectors regardless of corpus size; output is
    // rank-only (D5).
    "retrieval_dense_rerank_ann" -> ((s, d) =>
      hybridRerank(s, d, annPool(s, d))),

    // the graph-family twin: BM25 ∪ serving-beam candidates, exact rerank
    "retrieval_dense_rerank_gann" -> ((s, d) =>
      hybridRerank(s, d, gannPool(s, d))),

    // End-quality REGRESSION for the ANN-served cascade (round 20 — the
    // gann_recall_eval convention on the retrieval layer): per query, how
    // many of the hybrid rerank's top-5 are in the EXACT dense top-5 over
    // the index's collection. Integer hits, queries with zero hits still
    // reported (left join from the query set) — the driver gate now pins
    // the 0.64 recall the spec measured, per query, cross-engine, every
    // round. At 100 TB this is the serving-quality canary a retrieval
    // deployment runs on a fixed probe set after every index rebuild.
    "retrieval_recall_eval" -> ((s, d) => {
      import org.apache.spark.sql.graft.VectorOps.{vec_dot, vec_norm}
      val got = hybridRerank(s, d, annPool(s, d))
        .select(col("query_id"), col("item_id"))
      val e = embeddings(s, d).select(col("vec_id"), col("embedding"),
        vec_norm(col("embedding")).as("nrm"))
      val q = e.where(col("vec_id") < 10)
        .select(col("vec_id").as("query_id"), col("embedding").as("qe"),
          col("nrm").as("qn"))
      val w = Window.partitionBy("query_id")
        .orderBy(col("cs").desc, col("item_id").asc)
      val exact = e.join(broadcast(q), col("vec_id") =!= col("query_id"))
        .select(col("query_id"), col("vec_id").as("item_id"),
          (vec_dot(col("embedding"), col("qe")) / (col("nrm") * col("qn"))).as("cs"))
        .withColumn("rn", row_number().over(w))
        .where(col("rn") <= TopK)
        .select("query_id", "item_id")
      val hits = exact.join(broadcast(got), Seq("query_id", "item_id"))
        .groupBy("query_id").agg(count(lit(1)).as("n_hits"))
      q.select("query_id").join(broadcast(hits), Seq("query_id"), "left")
        .select(col("query_id"), coalesce(col("n_hits"), lit(0L)).as("n_hits"))
        .orderBy("query_id")
    })
  )

  /** The hybrid two-stage cascade over a caller-supplied index-served
    * dense pool: candidates = BM25 top-[[PoolN]] ∪ the pool's top-10
    * (n_sources marks dual nominations, counted BEFORE the vector fetch),
    * exact cosine rerank of the bounded union. One definition for both
    * index families.
    */
  private def hybridRerank(s: SparkSession, d: String, dense: DataFrame): DataFrame = {
    import org.apache.spark.sql.graft.VectorOps.{vec_dot, vec_norm}
    val cands = lexPool10(s, d).select("query_id", "item_id")
      .unionByName(dense.select("query_id", "item_id"))
      .groupBy("query_id", "item_id")
      .agg(count(lit(1)).as("n_sources"))
    val e = embeddings(s, d).select(col("vec_id"), col("embedding"),
      vec_norm(col("embedding")).as("nrm"))
    val q = e.where(col("vec_id") < 10)
      .select(col("vec_id").as("query_id"), col("embedding").as("qe"),
        col("nrm").as("qn"))
    val w = Window.partitionBy("query_id")
      .orderBy(col("cos").desc, col("item_id").asc)
    // candidate frame broadcast BY CONTRACT (the retrieval_dense_rerank
    // size-estimate note applies verbatim)
    broadcast(cands).join(e, cands("item_id") === e("vec_id"))
      .join(broadcast(q), "query_id")
      .select(col("query_id"), col("item_id"), col("n_sources"),
        (vec_dot(col("qe"), col("embedding")) / (col("qn") * col("nrm"))).as("cos"))
      .withColumn("rn", row_number().over(w))
      .where(col("rn") <= TopK)
      .select("query_id", "rn", "item_id", "n_sources")
      .orderBy("query_id", "rn")
  }

  private def rrfC(rnExpr: String) = s"1000000 // ($RrfK + $rnExpr)"

  /** The lexical-pool CTE pair (lexr → lexc) cut to the index families'
    * probe-query convention — shared by both index-served fusion oracles.
    */
  private def lexCtes10: String =
    "lexr AS (SELECT query_id, doc_id AS item_id, row_number() OVER " +
    "(PARTITION BY query_id ORDER BY score_micro DESC, doc_id ASC) AS rn " +
    "FROM scored WHERE query_id < 10), " +
    s"lexc AS (SELECT query_id, item_id, ${rrfC("rn")} AS c FROM lexr WHERE rn <= $PoolN)"

  /** The fuse + top-k oracle tail over CTEs `lexc` and `dnsc`. */
  private def fuseTailSql: String =
    "fused AS (SELECT query_id, item_id, CAST(sum(c) AS BIGINT) AS rrf_micro, " +
    "CAST(count(*) AS BIGINT) AS n_systems " +
    "FROM (SELECT * FROM lexc UNION ALL SELECT * FROM dnsc) GROUP BY 1, 2) " +
    "SELECT query_id, CAST(rn AS INT) AS rn, item_id, rrf_micro, n_systems FROM " +
    "(SELECT *, row_number() OVER (PARTITION BY query_id " +
    "ORDER BY rrf_micro DESC, item_id ASC) AS rn FROM fused) " +
    s"WHERE rn <= $TopK ORDER BY query_id, rn"

  val oracles: Map[String, String] = Map(
    "retrieval_rrf_fusion" ->
      (s"WITH ${TextOps.bm25ScoredCtes}, " +
       "lexr AS (SELECT query_id, doc_id AS item_id, row_number() OVER " +
       "(PARTITION BY query_id ORDER BY score_micro DESC, doc_id ASC) AS rn FROM scored), " +
       s"lexc AS (SELECT query_id, item_id, ${rrfC("rn")} AS c FROM lexr WHERE rn <= $PoolN), " +
       "dnsr AS (SELECT q.vec_id AS query_id, e.vec_id AS item_id, " +
       "row_number() OVER (PARTITION BY q.vec_id ORDER BY " +
       s"${Similarity.oDot("q", "e")} / (${Similarity.oNorm("q")} * ${Similarity.oNorm("e")}) DESC, " +
       "e.vec_id ASC) AS rn " +
       "FROM embeddings q JOIN embeddings e ON e.vec_id >= 20 AND q.vec_id < 20), " +
       s"dnsc AS (SELECT query_id, item_id, ${rrfC("rn")} AS c FROM dnsr WHERE rn <= $PoolN), " +
       "fused AS (SELECT query_id, item_id, CAST(sum(c) AS BIGINT) AS rrf_micro, " +
       "CAST(count(*) AS BIGINT) AS n_systems " +
       "FROM (SELECT * FROM lexc UNION ALL SELECT * FROM dnsc) GROUP BY 1, 2) " +
       "SELECT query_id, CAST(rn AS INT) AS rn, item_id, rrf_micro, n_systems FROM " +
       "(SELECT *, row_number() OVER (PARTITION BY query_id " +
       "ORDER BY rrf_micro DESC, item_id ASC) AS rn FROM fused) " +
       s"WHERE rn <= $TopK ORDER BY query_id, rn"),

    "retrieval_dense_rerank" ->
      (s"WITH ${TextOps.bm25ScoredCtes}, " +
       "cand AS (SELECT query_id, doc_id, rn AS bm25_rn FROM " +
       "(SELECT query_id, doc_id, row_number() OVER (PARTITION BY query_id " +
       "ORDER BY score_micro DESC, doc_id ASC) AS rn FROM scored) " +
       s"WHERE rn <= $PoolN), " +
       "rr AS (SELECT c.query_id, c.doc_id, c.bm25_rn, " +
       "row_number() OVER (PARTITION BY c.query_id ORDER BY " +
       s"${Similarity.oDot("q", "e")} / (${Similarity.oNorm("q")} * ${Similarity.oNorm("e")}) DESC, " +
       "c.doc_id ASC) AS rn " +
       "FROM cand c JOIN embeddings e ON e.vec_id = c.doc_id " +
       "JOIN embeddings q ON q.vec_id = c.query_id) " +
       "SELECT query_id, CAST(rn AS INT) AS rn, doc_id, CAST(bm25_rn AS INT) AS bm25_rn " +
       s"FROM rr WHERE rn <= $TopK ORDER BY query_id, rn"),

    // The ANN-served variants mirror the dense leg with the FULL IVF-PQ
    // oracle chain ([[Similarity.annIvfPqCtes]], ending in r(qid, nn, rn))
    // — the same CTEs the sim_ann_ivfpq_probe key certifies, so the dense
    // ranking being fused/pooled is provably the index's answer, not a
    // re-derived approximation. Lexical CTE names (docs..scored) and the
    // ANN chain's (ms..r) are disjoint; the rerank uses fresh names
    // (uc/cand2/rr2) because `cand`/`q` are taken.
    "retrieval_rrf_fusion_ann" ->
      (s"WITH ${Similarity.annIvfPqCtes}, ${TextOps.bm25ScoredCtes}, " +
       s"$lexCtes10, " +
       s"dnsc AS (SELECT qid AS query_id, nn AS item_id, ${rrfC("rn")} AS c FROM r WHERE rn <= 10), " +
       fuseTailSql),

    // the graph-index twin: the certified serving-beam oracle wrapped as
    // the `ann` CTE (its internal WITH chain stays scoped inside the
    // parens — the gann_recall_eval composition)
    "retrieval_rrf_fusion_gann" ->
      (s"WITH ann AS (${GraphAnnIndex.searchOracleSql}), " +
       s"${TextOps.bm25ScoredCtes}, " +
       s"$lexCtes10, " +
       s"dnsc AS (SELECT qid AS query_id, nn AS item_id, ${rrfC("rn")} AS c FROM ann), " +
       fuseTailSql),

    // 3-way: BOTH certified dense chains composed — the IVF-PQ CTE chain
    // at the outer level (ends in r), the beam chain nested (its inner
    // WITH shadows nothing it reads: the base `embeddings` table is not a
    // CTE) — their contributions unioned into one dnsc
    "retrieval_rrf_fusion_3way" ->
      (s"WITH ${Similarity.annIvfPqCtes}, " +
       s"gb AS (${GraphAnnIndex.searchOracleSql}), " +
       s"${TextOps.bm25ScoredCtes}, " +
       s"$lexCtes10, " +
       s"dnsc AS (SELECT qid AS query_id, nn AS item_id, ${rrfC("rn")} AS c FROM r WHERE rn <= 10 " +
       s"UNION ALL SELECT qid, nn, ${rrfC("rn")} FROM gb), " +
       fuseTailSql),

    "retrieval_dense_rerank_ann" ->
      (s"WITH ${Similarity.annIvfPqCtes}, ${TextOps.bm25ScoredCtes}, " +
       rerankTailSql("SELECT qid, nn FROM r WHERE rn <= 10")),

    // graph-family twin: the serving-beam oracle as the dense nominator
    "retrieval_dense_rerank_gann" ->
      (s"WITH ann AS (${GraphAnnIndex.searchOracleSql}), " +
       s"${TextOps.bm25ScoredCtes}, " +
       rerankTailSql("SELECT qid, nn FROM ann")),

    // served top-5 (the rerank chain as CTEs) joined against the exact
    // cosine top-5 — the gann_recall_eval oracle shape on this layer;
    // cosine fold order (corpus · query) matches the Spark side exactly
    "retrieval_recall_eval" ->
      (s"WITH ${Similarity.annIvfPqCtes}, ${TextOps.bm25ScoredCtes}, " +
       rerankCtes("SELECT qid, nn FROM r WHERE rn <= 10") + ", " +
       s"srv AS (SELECT query_id, item_id FROM rr2 WHERE rn <= $TopK), " +
       "exq AS (SELECT vec_id AS query_id, embedding FROM embeddings WHERE vec_id < 10), " +
       "exs AS (SELECT qx.query_id, e.vec_id AS item_id, row_number() OVER " +
       "(PARTITION BY qx.query_id ORDER BY " +
       s"${Similarity.oDotE("e.embedding", "qx.embedding")} / " +
       s"(${Similarity.oNormE("e.embedding")} * ${Similarity.oNormE("qx.embedding")}) DESC, " +
       "e.vec_id ASC) AS rn " +
       "FROM embeddings e JOIN exq qx ON e.vec_id != qx.query_id), " +
       s"ext AS (SELECT query_id, item_id FROM exs WHERE rn <= $TopK), " +
       "hits AS (SELECT x.query_id, CAST(count(*) AS BIGINT) AS n_hits " +
       "FROM ext x JOIN srv USING (query_id, item_id) GROUP BY 1) " +
       "SELECT query_id, COALESCE(n_hits, CAST(0 AS BIGINT)) AS n_hits " +
       "FROM exq LEFT JOIN hits USING (query_id) ORDER BY query_id")
  )

  /** The hybrid-rerank CTE chain (lexr → uc → cand2 → rr2) over a
    * caller-supplied dense nominator select (qid, nn) — mirrors
    * [[hybridRerank]] CTE for CTE; shared by the rerank keys and the
    * recall eval.
    */
  private def rerankCtes(denseSel: String): String =
    "lexr AS (SELECT query_id, doc_id AS item_id, row_number() OVER " +
    "(PARTITION BY query_id ORDER BY score_micro DESC, doc_id ASC) AS rn " +
    "FROM scored WHERE query_id < 10), " +
    s"uc AS (SELECT query_id, item_id FROM lexr WHERE rn <= $PoolN " +
    s"UNION ALL $denseSel), " +
    "cand2 AS (SELECT query_id, item_id, CAST(count(*) AS BIGINT) AS n_sources " +
    "FROM uc GROUP BY 1, 2), " +
    "rr2 AS (SELECT c.query_id, c.item_id, c.n_sources, " +
    "row_number() OVER (PARTITION BY c.query_id ORDER BY " +
    s"${Similarity.oDot("qv", "e")} / (${Similarity.oNorm("qv")} * ${Similarity.oNorm("e")}) DESC, " +
    "c.item_id ASC) AS rn " +
    "FROM cand2 c JOIN embeddings e ON e.vec_id = c.item_id " +
    "JOIN embeddings qv ON qv.vec_id = c.query_id)"

  private def rerankTailSql(denseSel: String): String =
    rerankCtes(denseSel) + " " +
    "SELECT query_id, CAST(rn AS INT) AS rn, item_id, n_sources " +
    s"FROM rr2 WHERE rn <= $TopK ORDER BY query_id, rn"
}
