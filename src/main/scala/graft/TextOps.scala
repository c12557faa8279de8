package graft

import org.apache.spark.sql.{Column, DataFrame, SparkSession}
import org.apache.spark.sql.expressions.Window
import org.apache.spark.sql.functions._
import org.apache.spark.sql.types._
import Det._
import Tables._

/** MapReduce-classic text jobs (word count, grep, inverted index — the
  * OSDI'04 canon) plus LLM-data-pipeline text analysis: exact dedup,
  * language-ID heuristic, quality scoring, BPE-ish token counting, and
  * rolling-hash document fingerprints (SURVEY.md §2.9; BASELINE.json
  * north-star).
  *
  * All tokenization is `split`/`explode` + hash-aggregation — the shuffle
  * key is the token, so at 100 TB the word count is exactly the MR combiner
  * pattern (partial agg per partition, one shuffle of distinct tokens).
  * Fingerprints fold in fixed left-to-right order with integer arithmetic —
  * bit-stable on any engine (rule D5: no engine-specific hash in oracle
  * outputs).
  */
object TextOps {
  type Q = (SparkSession, String) => DataFrame

  private def toks(c: Column): Column = split(c, " ")

  /** BM25-scored (query_id, doc_id, score_micro, n_terms) — the lexical
    * candidate generator of every RAG / retrieval stack, shared by
    * `text_bm25_topk` (its per-query top-5 certification) and the
    * Retrieval keys (RRF fusion / dense rerank consume a wider pool).
    * Corpus docs (doc_id >= 20) are ranked for each probe query
    * (doc_id < 20, its distinct tokens = the query terms): two hash
    * aggregations (tf, df) + a term-keyed join against the BROADCAST
    * query-term list (the probe side is small by definition; the corpus
    * side never self-joins).
    *
    * Determinism: INTEGER-SCALED BM25 (rule D5) — k1 = 6/5, b = 3/4 as
    * exact rationals, micro-unit (1e-6) fixed point, truncating
    * division. With avgdl = tt/nd, multiplying the saturation term
    * through by 10*tt gives
    *   sat_micro = 22*tf*tt*1e6 div (10*tf*tt + 3*tt + 9*dl*nd)
    *   idf_micro = (2*(nd-df)+1)*1e6 div (2*df+1)   [Robertson idf,
    *     ln dropped for its argument — rank-equivalent per term]
    *   term_score = idf_micro * sat_micro div 1e6
    * Every operand is a non-negative BIGINT, where Spark's `div`
    * (truncate) and DuckDB's `//` (floor) agree — so unlike float BM25
    * the summed score itself is cross-engine bit-exact and ships in the
    * output (text_tfidf_topk must exclude its ln-based score). Headroom:
    * 22*tf*tt*1e6 stays under 2^63 up to ~40M corpus tokens per shard
    * of this fixture shape; at larger scale the same formula runs in
    * DECIMAL(38,0) unchanged.
    * Single corpus scan (round 6 — VERDICT r5 #5): BOTH df and the
    * (nd, tt) corpus stats derive from the tf frame instead of
    * re-scanning documents (every corpus doc appears in tf — split() of
    * even an empty text yields one token — so the distinct (doc_id, dl)
    * projection IS the corpus doc list). Since round 9 the tf frame is
    * a fixture-keyed memoSpill rather than a persist: the posting-list
    * index of a retrieval stack is a STANDING artifact (built at
    * ingest, probed per query), and the spill both realizes that shape
    * and frees the consumers' plans from the cached candidate lineage
    * (same lesson as the pair spills).
    */
  private[graft] def bm25Scored(s: SparkSession, d: String): DataFrame = {
    val docs = documents(s, d).select(col("doc_id"), toks(col("text")).as("tk"))
    val tf = Sources.memoSpill(s,
        Sources.fixtureKey(d, "documents") + ":bm25_tf", "bm25_tf") {
      docs.where(col("doc_id") >= 20)
        .select(col("doc_id"), size(col("tk")).cast(LongType).as("dl"),
          explode(col("tk")).as("term"))
        .groupBy("doc_id", "dl", "term").agg(count(lit(1)).as("tf"))
    }
    val stats = tf.select("doc_id", "dl").distinct()
      .agg(count(lit(1)).as("nd"), sum("dl").cast(LongType).as("tt"))
    val df = tf.groupBy("term").agg(count(lit(1)).as("df"))
    val q = docs.where(col("doc_id") < 20)
      .select(col("doc_id").as("query_id"), explode(col("tk")).as("term"))
      .distinct()
    tf.join(broadcast(q), "term")
      .join(df, "term")
      .crossJoin(broadcast(stats))
      .withColumn("idf_micro", expr("((2 * (nd - df) + 1) * 1000000L) div (2 * df + 1)"))
      .withColumn("sat_micro",
        expr("(22 * tf * tt * 1000000L) div (10 * tf * tt + 3 * tt + 9 * dl * nd)"))
      .withColumn("term_score", expr("(idf_micro * sat_micro) div 1000000L"))
      .groupBy("query_id", "doc_id")
      .agg(sum("term_score").cast(LongType).as("score_micro"),
        count(lit(1)).as("n_terms"))
  }

  /** The DuckDB CTE chain ending at `scored` (query_id, doc_id,
    * score_micro, n_terms) — [[bm25Scored]]'s oracle twin, shared verbatim
    * by text_bm25_topk and the Retrieval oracles.
    */
  private[graft] val bm25ScoredCtes: String =
    "docs AS (SELECT doc_id, string_split(text, ' ') AS tk FROM documents), " +
    "corpus AS (SELECT doc_id, tk, CAST(len(tk) AS BIGINT) AS dl FROM docs WHERE doc_id >= 20), " +
    "stats AS (SELECT CAST(count(*) AS BIGINT) AS nd, CAST(sum(dl) AS BIGINT) AS tt FROM corpus), " +
    "tf AS (SELECT doc_id, dl, term, CAST(count(*) AS BIGINT) AS tf FROM " +
    "(SELECT doc_id, dl, unnest(tk) AS term FROM corpus) GROUP BY 1, 2, 3), " +
    "df AS (SELECT term, CAST(count(*) AS BIGINT) AS df FROM tf GROUP BY 1), " +
    "q AS (SELECT DISTINCT query_id, term FROM " +
    "(SELECT doc_id AS query_id, unnest(tk) AS term FROM docs WHERE doc_id < 20)), " +
    "scored AS (SELECT q.query_id, tf.doc_id, " +
    "CAST(sum((((2 * (nd - df) + 1) * 1000000) // (2 * df + 1)) * " +
    "((22 * tf * tt * 1000000) // (10 * tf * tt + 3 * tt + 9 * dl * nd)) // 1000000) AS BIGINT) AS score_micro, " +
    "count(*) AS n_terms " +
    "FROM tf JOIN q USING (term) JOIN df USING (term) CROSS JOIN stats GROUP BY 1, 2)"

  /** Deterministic language-ID heuristic: score each language by marker-token
    * hits; equal scores resolve by fixed priority order en > de > es > fr > zh
    * (so an all-zero doc classifies as 'en'). The fixture vocabulary is
    * synthetic, so this demonstrates the *shape* of n-gram language ID —
    * per-doc feature extraction, argmax over per-language scores — with a
    * fully deterministic rule; no SQL oracle, scalatest asserts determinism +
    * total coverage.
    */
  def langId(s: SparkSession, d: String): DataFrame = {
    val markers: Map[String, Seq[String]] = Map(
      "en" -> Seq("the", "a", "fast", "slow"),
      "de" -> Seq("der", "die", "das", "und"),
      "es" -> Seq("el", "la", "los", "que"),
      "fr" -> Seq("le", "la", "les", "et"),
      "zh" -> Seq("de", "shi", "le", "zai"))
    val scored = markers.toSeq.sortBy(_._1).map { case (lang, ms) =>
      val inSet = ms.map(m => s"x = '$m'").mkString(" OR ")
      expr(s"size(filter(split(text, ' '), x -> $inSet))").as(s"score_$lang")
    }
    documents(s, d)
      .select(col("doc_id") +: scored: _*)
      .withColumn("predicted_lang",
        expr("CASE WHEN score_en >= greatest(score_de, score_es, score_fr, score_zh) THEN 'en' " +
             "WHEN score_de >= greatest(score_es, score_fr, score_zh) THEN 'de' " +
             "WHEN score_es >= greatest(score_fr, score_zh) THEN 'es' " +
             "WHEN score_fr >= score_zh THEN 'fr' ELSE 'zh' END"))
      .select("doc_id", "predicted_lang", "score_en")
      .orderBy("doc_id")
  }

  /** Duplicate-trigram fraction (micro-units) at or above which a document
    * flags as repetitive (text_repetition) — 5%, chosen to discriminate on
    * the fixture corpus (max observed ≈ 7.1% at sf0.01, median 0).
    */
  val RepetitionFlagMicro = 50000L

  /** Size of the frequent-trigram set text_rare_ngram_filter broadcasts —
    * the bound that keeps the filter scale-free: rarity is "not in the
    * top-F corpus trigrams", so the probe side never joins against the
    * unbounded tail vocabulary, only against a fixed-size frame.
    */
  val RareFreqSetSize = 4096
  /** Per-doc distinct-token cap for text_cooccur_pairs — bounds each
    * document's pair fan-out to K(K-1)/2 regardless of document length.
    */
  val CooccurCap = 24
  /** Minimum pair support text_cooccur_pairs reports. */
  val CooccurMinSupport = 25L

  /** Tokens per packed training sequence (pack_sequences). */
  val PackSeqLen = 512
  /** Stopword evidence list for [[text_gopher_rules]] — the published rule
    * requires a minimum count of common function words; the list is the
    * subset of Gopher's that the synthetic fixture vocabulary can contain.
    */
  val GopherStop: Seq[String] = Seq("the", "a", "of", "and", "to")
  /** Independent packing shards (pack_sequences) — the parallelism knob. */
  val PackShards = 8

  /** Top-K word vocabulary (text_vocab_encode / pack_sequences_ids).
    * 24 < the fixture's 31-word vocabulary, so the UNK fallback is
    * exercised non-vacuously at every SF (~20% of tokens are OOV).
    * Reserved ids: 0 = PAD (never emitted by the encoder — a packer that
    * right-pads its final bin would use it), 1 = UNK; word ids start at 2,
    * assigned by (count DESC, word ASC) rank — the deterministic tie-break
    * both engines share.
    */
  val VocabSize = 24
  val UnkId = 1L

  /** The ranked top-K vocabulary (word, id). Plan shape for 100 TB: counts
    * come from the memoized standing tf index (one corpus pass, amortized
    * across every text operator), the top-K is `orderBy().limit()` — which
    * Catalyst plans as TakeOrderedAndProject, a per-partition heap + driver
    * merge of K rows, NEVER a global sort of the vocabulary — and the final
    * row_number window runs over exactly K rows (bounded single partition by
    * construction). The frame is then broadcast by every consumer: encoding
    * is a map-side hash probe, the corpus never shuffles on `word`.
    */
  private[graft] def vocabFrame(s: SparkSession, d: String): DataFrame = {
    val topk = tfIndex(s, d)
      .groupBy("word").agg(lsum(col("tf")).as("c"))
      .orderBy(col("c").desc, col("word").asc)
      .limit(VocabSize)
    topk.withColumn("id",
      row_number().over(Window.orderBy(col("c").desc, col("word").asc)) + lit(1L))
      .select("word", "id")
  }

  /** Quality-classifier seed sets (round 17): positives = the curated
    * reference slice (doc_id < QcSeedDocs — the decontamination screen's
    * protected set, standing in for the Wikipedia/WebText seed of the
    * published classifier filters); negatives = a disjoint pseudo-random
    * crawl sample (doc_id ≥ QcSeedDocs with doc_id % 10 == QcNegResidue).
    * Measured keep fractions (llr ≥ 0): 288/500, 233/500, 1043/5000 —
    * both classes present at every SF.
    */
  val QcSeedDocs = 50L
  val QcNegResidue = 3L

  /** Per-doc mean unigram surprisal (milli-bits) at or above which
    * `text_lm_surprisal` flags a document as rare-token-heavy — 5 bits/token,
    * i.e. the doc's average token is ≥ 32× rarer than a uniform draw over
    * corpus occurrences would predict; flags ~3% of the fixture corpus
    * (15/500 at sf0.01, 193/5000 at sf0.1). Interpolated into the oracle SQL
    * from this one definition site.
    */
  val LmSurprisalFlagMilli = 5000L

  /** Whole-corpus (doc_id, word, tf) index — the standing artifact shared by
    * `text_tfidf_topk` and `text_lm_surprisal` (one fixture-keyed build, read
    * thereafter; the bm25 posting-list pattern from round 9).
    */
  private[graft] def tfIndex(s: SparkSession, d: String): DataFrame =
    Sources.memoSpill(s,
        Sources.fixtureKey(d, "documents") + ":tfidf_tf", "tfidf_tf") {
      documents(s, d)
        .select(col("doc_id"), explode(toks(col("text"))).as("word"))
        .groupBy("doc_id", "word").agg(count(lit(1)).as("tf"))
    }

  /** Exact fixed-point log2 in micro-bits, as a SQL fragment over a BIGINT
    * column/expression ≥ 1: ilog2 via the binary-string length
    * (length(bin(x)) − 1 — exact on both engines, no libm), plus a linearly
    * interpolated fraction ((x − 2^i)·10⁶ div 2^i), all in exact integer
    * arithmetic (`div`, never `/` — Spark's `/` is double division). 2^i
    * comes from power(2, i): powers of two are exactly representable
    * doubles and pow is exact on them in every IEEE libm, so the BIGINT
    * cast is deterministic cross-engine (rule D5 — no transcendental whose
    * last ulp could differ). The DuckDB oracle mirror uses `//` in place of
    * `div` (identical floor semantics on the non-negative operands here).
    *
    * DOMAIN: (x − 2^i)·10⁶ must fit a BIGINT, i.e. x < ~9.2×10¹² (≈ 9
    * trillion token occurrences, ~36 TB of text in one count). Under the
    * session's ANSI mode an overflow throws loudly rather than wrapping;
    * beyond that corpus size run the counts per language/source shard (the
    * usual deployment) or drop the fraction's scale a step.
    */
  private[graft] def log2MicroSql(x: String, idiv: String = "div"): String = {
    val i = s"(length(bin($x)) - 1)"
    val p = s"CAST(power(2, $i) AS BIGINT)"
    s"(CAST($i AS BIGINT) * 1000000 + (($x - $p) * 1000000) $idiv $p)"
  }

  /** Per-doc unigram-LM surprisal frame (doc_id, n_tokens,
    * surprisal_millibits) — the scoring engine behind `text_lm_surprisal`
    * and the pipeline's surprisal filter stage. The 1-row corpus total
    * attaches via the repo's sanctioned bounded-BNLJ pattern
    * (crossJoin(broadcast(1-row)) — the incrMaxId precedent; a
    * constant-key equi-join does not survive constant folding, Catalyst
    * rewrites it back to the same BNLJ).
    *
    * MODEL COUPLING: scores are against the corpus's OWN unigram model,
    * so changing the corpus composition moves every absolute score —
    * e.g. doubling the corpus with disjoint-vocabulary text adds exactly
    * 1000 millibits to every doc (N doubles, counts don't). A production
    * deployment freezes a REFERENCE model instead: the tf/cnt frames here
    * are exactly that artifact — persist them once (memoSpill already
    * does per fixture) and score any new corpus against the saved counts.
    */
  private[graft] def lmScores(s: SparkSession, d: String): DataFrame = {
    val tf = tfIndex(s, d)
    val cnt = tf.groupBy("word").agg(lsum(col("tf")).as("c"))
    val n = cnt.agg(lsum(col("c")).as("n"))
    tf.join(cnt, "word").crossJoin(broadcast(n))
      .withColumn("surp_micro",
        expr(s"${log2MicroSql("n")} - ${log2MicroSql("c")}"))
      .groupBy("doc_id")
      .agg(lsum(col("tf")).as("n_tokens"),
        lsum(expr("tf * surp_micro")).as("bits_sum"))
      .select(col("doc_id"), col("n_tokens"),
        expr("(bits_sum div n_tokens) div 1000").as("surprisal_millibits"))
  }

  /** Shared DuckDB-oracle fragment: the unigram-surprisal scoring chain as
    * CTEs (tokenize → per-doc tf → corpus counts → corpus total →
    * per-occurrence surprisal → per-doc (n_tokens, bits_sum, sm)). ONE
    * definition site for the load-bearing scoring SQL, reused by the
    * `text_lm_surprisal` oracle and `pipeline_pretrain_full`'s flag stage
    * (the minhashPairsCte pattern — a formula change here cannot leave
    * the pipeline oracle scoring with stale arithmetic). The `p` prefix
    * renames every CTE so the fragment composes into WITH-chains whose
    * other fragments own the bare names. log2MicroSql mirrored with `//`
    * (DuckDB floor div ≡ Spark `div` on the non-negative operands);
    * bin()/power() exact on both engines (D5 note at the definition
    * site).
    */
  private[graft] def lmScoreCtes(p: String = ""): String =
    s"${p}tok AS (SELECT doc_id, unnest(string_split(text, ' ')) AS word FROM documents), " +
    s"${p}tf AS (SELECT doc_id, word, CAST(count(*) AS BIGINT) AS tf FROM ${p}tok GROUP BY 1, 2), " +
    s"${p}cnt AS (SELECT word, CAST(SUM(tf) AS BIGINT) AS c FROM ${p}tf GROUP BY 1), " +
    s"${p}n AS (SELECT CAST(SUM(c) AS BIGINT) AS n FROM ${p}cnt), " +
    s"${p}sp AS (SELECT doc_id, tf, " +
    s"${log2MicroSql("n", "//")} - ${log2MicroSql("c", "//")} AS surp_micro " +
    s"FROM ${p}tf JOIN ${p}cnt USING (word) CROSS JOIN ${p}n), " +
    s"${p}sc AS (SELECT doc_id, n_tokens, bits_sum, (bits_sum // n_tokens) // 1000 AS sm " +
    s"FROM (SELECT doc_id, CAST(SUM(tf) AS BIGINT) AS n_tokens, " +
    s"CAST(SUM(tf * surp_micro) AS BIGINT) AS bits_sum FROM ${p}sp GROUP BY doc_id))"

  /** Per-doc mean BIGRAM surprisal (millibits) at or above which
    * `text_lm_surprisal_bigram` flags a document. Measured on the fixture
    * before wiring (rule: constants are non-vacuous at every SF): the
    * add-one bigram score distribution sits at median ≈ 4.9 bits with a
    * p95–p97 shoulder just under 5.0, so 5000 flags the rare-transition
    * tail — 9/500 at sf0.001, 14/500 at sf0.01, 154/5000 at sf0.1.
    */
  val BigramFlagMilli = 5000L

  /** Whole-corpus (doc_id, prev, w, tf) BIGRAM index — the standing
    * artifact behind the bigram LM family, the bigram analogue of
    * [[tfIndex]] (one fixture-keyed build, read thereafter). Every token
    * gets a context: position 1's predecessor is the BOS sentinel chr(1)
    * (a codepoint the space-tokenized fixture vocabulary cannot contain),
    * so c(BOS, w) counts document-initial words and c(BOS) = #docs — the
    * standard sentence-boundary convention, and it keeps per-doc token
    * counts identical to the unigram scorer's. The transform-over-
    * sequence form builds (prev, w) pairs map-side from the token array —
    * no per-doc window, no shuffle before the (doc_id, prev, w)
    * aggregate, which is the index's one exchange.
    */
  private[graft] def biIndex(s: SparkSession, d: String): DataFrame =
    Sources.memoSpill(s,
        Sources.fixtureKey(d, "documents") + ":bigram_tf", "bigram_tf") {
      documents(s, d)
        .select(col("doc_id"), split(col("text"), " ").as("ts"))
        .select(col("doc_id"), explode(expr(
          "transform(sequence(1, size(ts)), i -> struct(" +
          "CASE WHEN i = 1 THEN chr(1) ELSE get(ts, i-2) END AS prev, " +
          "get(ts, i-1) AS w))")).as("bg"))
        .select(col("doc_id"), col("bg.prev").as("prev"), col("bg.w").as("w"))
        .groupBy("doc_id", "prev", "w").agg(count(lit(1)).as("tf"))
    }

  /** Per-doc mean bigram surprisal frame (doc_id, n_tokens,
    * surprisal_millibits) — the CCNet filter position upgraded from
    * unigram to a conditional model: each token is scored under add-one
    * (Laplace) smoothed P(w|prev) = (c(prev,w)+1) / (c(prev)+V), V the
    * corpus token-type count, so unseen-in-context transitions get a
    * finite surprisal instead of ∞ and the smoothing stays ALL-INTEGER —
    * surprisal = log2µ(c(prev)+V) − log2µ(c(prev,w)+1) in the exact
    * fixed-point [[log2MicroSql]] kernel, same D5 contract as [[lmScores]]
    * (no libm, hash-matches DuckDB bit-for-bit). Add-one is the degenerate
    * (k=1) case of the Katz/Jelinek-Mercer backoff family; a production
    * deployment swaps the +1/+V constants for per-context backoff weights,
    * the plan shape below is unchanged.
    *
    * Plan shape at 100 TB: the memoized standing bigram index, a
    * (prev, w)-keyed count aggregate (mergeable partials, vocab²-bounded
    * output), a prev-keyed rollup of THAT frame (vocab-bounded — never a
    * second corpus pass), a 1-row type-count broadcast, two equi-joins on
    * the bigram/context keys, and one per-doc re-aggregate. Same model
    * coupling note as [[lmScores]]: scores are against the corpus's own
    * model; the persisted cb/cc frames ARE the freezable reference
    * artifact.
    */
  private[graft] def lmScoresBigram(s: SparkSession, d: String): DataFrame = {
    val bi = biIndex(s, d)
    val cb = bi.groupBy("prev", "w").agg(lsum(col("tf")).as("cb"))
    val cc = cb.groupBy("prev").agg(lsum(col("cb")).as("cc"))
    val v = cb.select("w").distinct().agg(count(lit(1)).as("v"))
    bi.join(cb, Seq("prev", "w")).join(cc, Seq("prev")).crossJoin(broadcast(v))
      .withColumn("surp_micro",
        expr(s"${log2MicroSql("(cc + v)")} - ${log2MicroSql("(cb + 1)")}"))
      .groupBy("doc_id")
      .agg(lsum(col("tf")).as("n_tokens"),
        lsum(expr("tf * surp_micro")).as("bits_sum"))
      .select(col("doc_id"), col("n_tokens"),
        expr("(bits_sum div n_tokens) div 1000").as("surprisal_millibits"))
  }

  /** text_lm_surprisal_kn's flag cut (millibits). Measured on the fixture
    * before wiring: the KN score shoulder sits just under 5.0 bits —
    * 5000 flags 5/500, 11/500, 169/5000 across the SFs (non-vacuous
    * everywhere, both flagged and unflagged populations present).
    */
  val KnFlagMilli = 5000L

  /** Interpolated Kneser-Ney bigram scores (Kneser & Ney 1995; Chen &
    * Goodman 1998 — the published count-LM state of the art, and the
    * smoothing real CCNet-style filters use where add-one is the
    * classroom baseline): P(w|prev) = (c(prev,w)−D)/c(prev) +
    * D·S(prev)/c(prev) · pw(w)/B with absolute discount D = 1/2, where
    * S(prev) = distinct successors of prev, pw(w) = distinct PREDECESSOR
    * count of w (the continuation count — "how many contexts does w
    * complete", the insight that demotes high-frequency-but-single-
    * context words like "Francisco"), B = total bigram types. D = 1/2
    * clears every denominator: multiplying through by 2·c(prev)·B gives
    * P = ((2·cb−1)·B + S·pw) / (2·cc·B) — ALL-INTEGER, so the exact
    * fixed-point kernel applies verbatim: surprisal = log2µ(2·cc·B) −
    * log2µ((2·cb−1)·B + S·pw). Probabilities sum to 1 over w (Σpw = B),
    * so num ≤ den and the surprisal is non-negative; every scored token
    * is observed (cb ≥ 1) so the numerator is ≥ B > 0 — no zero-count
    * edge in the in-corpus scorer. Domain measured at sf0.1: den ≤
    * 1.8e7, num ≤ 7e5 — eight orders inside the kernel's 9.2e12 bound;
    * at 100 TB shard the counts per language/source as usual.
    *
    * Plan shape: the same memoized bigram index, the vocab²-bounded cb
    * frame, two vocab-bounded rollups OF THAT FRAME (cc+S by prev, pw by
    * w — never a second corpus pass), a 1-row B broadcast, three
    * equi-joins, one per-doc re-aggregate.
    */
  private[graft] def lmScoresKn(s: SparkSession, d: String): DataFrame = {
    val bi = biIndex(s, d)
    val cb = bi.groupBy("prev", "w").agg(lsum(col("tf")).as("cb"))
    val cc = cb.groupBy("prev").agg(lsum(col("cb")).as("cc"), count(lit(1)).as("sx"))
    val pw = cb.groupBy("w").agg(count(lit(1)).as("pw"))
    val b = cb.agg(count(lit(1)).as("b"))
    bi.join(cb, Seq("prev", "w")).join(cc, Seq("prev")).join(pw, Seq("w"))
      .crossJoin(broadcast(b))
      .withColumn("surp_micro",
        expr(s"${log2MicroSql("(2 * cc * b)")} - " +
          s"${log2MicroSql("((2 * cb - 1) * b + sx * pw)")}"))
      .groupBy("doc_id")
      .agg(lsum(col("tf")).as("n_tokens"),
        lsum(expr("tf * surp_micro")).as("bits_sum"))
      .select(col("doc_id"), col("n_tokens"),
        expr("(bits_sum div n_tokens) div 1000").as("surprisal_millibits"))
  }

  /** The KN oracle chain — [[bigramScoreCtes]]' index CTEs plus the
    * continuation/type rollups and the D = 1/2 integer-cleared scoring,
    * ONE definition site shared by both KN oracles.
    */
  private[graft] def knScoreCtes: String =
    bigramScoreCtes() +
    ", kcc AS (SELECT prev, CAST(SUM(cb) AS BIGINT) AS cc, " +
    "CAST(count(*) AS BIGINT) AS sx FROM bcb GROUP BY 1), " +
    "kpw AS (SELECT w, CAST(count(*) AS BIGINT) AS pw FROM bcb GROUP BY 1), " +
    "kb AS (SELECT CAST(count(*) AS BIGINT) AS b FROM bcb), " +
    "ksp AS (SELECT doc_id, tf, " +
    s"${log2MicroSql("(2 * cc * b)", "//")} - " +
    s"${log2MicroSql("((2 * cb - 1) * b + sx * pw)", "//")} AS surp_micro " +
    "FROM btf JOIN bcb USING (prev, w) JOIN kcc USING (prev) " +
    "JOIN kpw USING (w) CROSS JOIN kb), " +
    "ksc AS (SELECT doc_id, n_tokens, (bits_sum // n_tokens) // 1000 AS sm " +
    "FROM (SELECT doc_id, CAST(SUM(tf) AS BIGINT) AS n_tokens, " +
    "CAST(SUM(tf * surp_micro) AS BIGINT) AS bits_sum FROM ksp GROUP BY doc_id))"

  /** Shared DuckDB-oracle fragment for the bigram scoring chain — the
    * bigram analogue of [[lmScoreCtes]], ONE definition site reused by
    * both bigram oracles. The BOS convention, add-one arithmetic, and
    * fixed-point kernel mirror [[lmScoresBigram]] token-for-token
    * (`//` ≡ Spark `div` on the non-negative operands; chr(1) identical
    * on both engines; DuckDB ts[i] is 1-based where Spark get() is
    * 0-based, hence ts[i-1] vs get(ts, i-2) for the same predecessor).
    */
  private[graft] def bigramScoreCtes(p: String = ""): String =
    s"${p}btok AS (SELECT doc_id, bg.prev AS prev, bg.w AS w FROM (" +
    "SELECT doc_id, unnest(list_transform(generate_series(1, len(ts)), " +
    "i -> struct_pack(prev := CASE WHEN i = 1 THEN chr(1) ELSE ts[i-1] END, " +
    "w := ts[i]))) AS bg " +
    s"FROM (SELECT doc_id, string_split(text, ' ') AS ts FROM documents))), " +
    s"${p}btf AS (SELECT doc_id, prev, w, CAST(count(*) AS BIGINT) AS tf " +
    s"FROM ${p}btok GROUP BY 1, 2, 3), " +
    s"${p}bcb AS (SELECT prev, w, CAST(SUM(tf) AS BIGINT) AS cb FROM ${p}btf GROUP BY 1, 2), " +
    s"${p}bcc AS (SELECT prev, CAST(SUM(cb) AS BIGINT) AS cc FROM ${p}bcb GROUP BY 1), " +
    s"${p}bv AS (SELECT CAST(count(DISTINCT w) AS BIGINT) AS v FROM ${p}bcb), " +
    s"${p}bsp AS (SELECT doc_id, tf, " +
    s"${log2MicroSql("(cc + v)", "//")} - ${log2MicroSql("(cb + 1)", "//")} AS surp_micro " +
    s"FROM ${p}btf JOIN ${p}bcb USING (prev, w) JOIN ${p}bcc USING (prev) CROSS JOIN ${p}bv), " +
    s"${p}bsc AS (SELECT doc_id, n_tokens, (bits_sum // n_tokens) // 1000 AS sm " +
    s"FROM (SELECT doc_id, CAST(SUM(tf) AS BIGINT) AS n_tokens, " +
    s"CAST(SUM(tf * surp_micro) AS BIGINT) AS bits_sum FROM ${p}bsp GROUP BY doc_id))"

  /** Portable content fingerprint: polynomial rolling hash over codepoints,
    * mod 1e9+7, folded left-to-right in BIGINT — deterministic and
    * engine-portable. Shared by `text_fingerprint`, its oracle, and
    * [[Streaming.fingerprintDedupStream]] (the streaming content-dedup
    * state key) so the batch and streaming dedup surfaces key on the SAME
    * hash by construction.
    */
  /** DSIR feature-hash bucket count. 256 keeps the weight table a
    * trivially broadcastable frame while leaving every bucket well
    * populated at sf0.001 (500 docs × ~56 tokens ≈ 28k tokens over 256
    * buckets — measured, code-review r13); at real scale this is the
    * paper's 10k-bucket dial — raising it only grows the broadcast
    * table, never the corpus-side work.
    */
  val DsirBuckets = 256

  /** DSIR selection size: 25 of sf0.001's 500 documents keeps the screen
    * strongly discriminating at every SF (a K ≥ corpus size would go
    * vacuous).
    */
  val DsirTopK = 25

  /** Fingerprint-family modulus — ONE definition interpolated into both
    * the SQL string and the native wrapper (code-review r13: the literal
    * had spread to four sites; only the equality spec caught a miss).
    */
  private[graft] val FpP = 1000000007L

  val FingerprintExpr: String =
    "aggregate(transform(split(text, ''), c -> ascii(c)), 0L, " +
    s"(acc, x) -> pmod(acc * 31 + x, ${FpP}L))"

  /** The engine path for the same hash: the codegen'd
    * [[org.apache.spark.sql.graft.PolyHash]] code-point loop —
    * value-identical to [[FingerprintExpr]] (spec-pinned incl.
    * non-ASCII), but it stays inside whole-stage codegen where the HOF
    * chain evaluates interpretively and splits the stage. All Spark-side
    * consumers (text_fingerprint, the incremental fp index, the
    * streaming dedup state key) use this form; the SQL string remains
    * the portable definition the oracles execute.
    */
  private[graft] def polyFingerprint(c: Column): Column =
    org.apache.spark.sql.graft.BpeOps.poly_hash(c, FpP)

  /** CCNet-style per-language tercile banding over ANY per-doc surprisal
    * frame (doc_id, n_tokens, surprisal_millibits) — ONE definition site
    * for the band contract, shared by the unigram / add-one-bigram / KN
    * banding ops (round 16: three verbatim copies had accumulated).
    * Every decision is integer-exact: millibit scores, row_number over
    * (surprisal, doc_id), tercile tests by cross-multiplication. One
    * per-language window carries rank + count; at 100 TB the exact
    * per-lang ranking becomes a sampled-threshold pass (approx per-lang
    * quantiles of the same millibit scores), band contract unchanged.
    */
  private def bandedByLang(s: SparkSession, d: String, scores: DataFrame): DataFrame = {
    val wLang = Window.partitionBy("lang")
    scores
      .join(documents(s, d).select("doc_id", "lang"), "doc_id")
      .withColumn("rnk", row_number().over(
        wLang.orderBy(col("surprisal_millibits").asc, col("doc_id").asc)))
      .withColumn("n", count(lit(1)).over(wLang))
      .withColumn("band",
        when(col("rnk") * 3 <= col("n"), "head")
          .when(col("rnk") * 3 <= col("n") * 2, "middle")
          .otherwise("tail"))
      .select(col("doc_id"), col("lang"), col("surprisal_millibits"),
        col("band"), (col("rnk") * 3 <= col("n") * 2).as("keep"))
      .orderBy("doc_id")
  }

  val queries: Map[String, Q] = Map(
    "text_wordcount" -> ((s, d) =>
      documents(s, d)
        .select(explode(toks(col("text"))).as("word"))
        .groupBy("word")
        .agg(count(lit(1)).as("cnt"))
        .orderBy(col("cnt").desc, col("word").asc)),

    // Per-language token-distribution concentration (Gini impurity
    // 1 − Σ pᵢ²) — the corpus-diversity signal quality pipelines use to
    // flag template-generated/boilerplate slices (low gini = a few tokens
    // dominate). All statistics stay in exact integers (Σc and Σc² per
    // language) so the result is hash-stable; gini itself is one double
    // division of exact operands. Two hash aggregations, both with map-side
    // partials; the second collapses to ≤ |langs| rows. Exactness bound:
    // n_tokens² must fit a BIGINT, i.e. < 3·10⁹ tokens per language —
    // beyond that, compute gini downstream in decimal from the same sums.
    "text_token_gini" -> ((s, d) =>
      documents(s, d)
        .select(col("lang"), explode(toks(col("text"))).as("w"))
        .groupBy("lang", "w")
        .agg(count(lit(1)).as("c"))
        .groupBy("lang")
        .agg(lsum(col("c")).as("n_tokens"),
          count(lit(1)).as("n_vocab"),
          sum(col("c") * col("c")).as("sumsq"))
        .withColumn("gini",
          lit(1.0) - col("sumsq") / (col("n_tokens") * col("n_tokens")))
        .orderBy("lang")),

    // Length-bucketed batching audit (round 19, third session — the
    // group-by-length batching every inference/finetune stack runs:
    // batching same-length docs cuts padding waste vs padding the whole
    // corpus to its global max). Buckets are fixed power-of-two caps via
    // an integer CASE chain (a float log2 would be boundary-hazardous at
    // exact powers of two across engines); per bucket: docs, real tokens,
    // padded tokens (n_docs × the bucket's own longest member — batches
    // pad to their max, the cap only decides membership), waste — plus
    // the naive global-max padding for the same docs, so the report
    // QUANTIFIES the bucketing win. One groupBy, map-side combinable.
    "pack_length_buckets" -> ((s, d) => {
      val bucketCase = "CASE WHEN n_tok <= 16 THEN 16 WHEN n_tok <= 32 THEN 32 " +
        "WHEN n_tok <= 64 THEN 64 WHEN n_tok <= 128 THEN 128 " +
        "WHEN n_tok <= 256 THEN 256 WHEN n_tok <= 512 THEN 512 " +
        "WHEN n_tok <= 1024 THEN 1024 WHEN n_tok <= 2048 THEN 2048 " +
        "WHEN n_tok <= 4096 THEN 4096 ELSE 8192 END"
      val t = documents(s, d)
        .select(col("doc_id"), size(toks(col("text"))).cast(LongType).as("n_tok"))
        .withColumn("bucket", expr(bucketCase).cast(LongType))
      val mx = t.agg(max(col("n_tok")).as("mx_tok"))
      // each bucket-batch pads to ITS OWN longest member (the group-by-
      // length contract) — the cap only decides membership
      t.crossJoin(broadcast(mx))
        .groupBy("bucket")
        .agg(count(lit(1)).as("n_docs"),
          sum(col("n_tok")).cast(LongType).as("total_tokens"),
          (count(lit(1)) * max(col("n_tok"))).cast(LongType).as("padded_tokens"),
          (count(lit(1)) * max(col("mx_tok"))).cast(LongType).as("naive_padded_tokens"))
        .withColumn("waste_tokens", col("padded_tokens") - col("total_tokens"))
        .select("bucket", "n_docs", "total_tokens", "padded_tokens",
          "waste_tokens", "naive_padded_tokens")
        .orderBy("bucket")
    }),

    // Training-sequence packing: concatenate documents into fixed-length
    // token streams (the LLM pretraining "pack then chunk" step) and report
    // per-bin fill. A single GLOBAL running sum would serialize the corpus
    // through one partition — instead docs shard deterministically by
    // doc_id % PackShards and each shard packs independently (window
    // running-sum per shard), so parallelism = shard count and each shard's
    // stream is contiguous. A doc starts at its shard-stream offset
    // (exclusive running sum); its bin is that offset's PackSeqLen-chunk —
    // docs may straddle a boundary, exactly like real token packing.
    "pack_sequences" -> ((s, d) => {
      val byDoc = Window.partitionBy("shard").orderBy("doc_id")
        .rowsBetween(Window.unboundedPreceding, -1)
      documents(s, d)
        .select(col("doc_id"), pmod(col("doc_id"), lit(PackShards.toLong)).as("shard"),
          size(toks(col("text"))).cast(LongType).as("n_tok"))
        .withColumn("off", coalesce(sum("n_tok").over(byDoc), lit(0L)))
        .withColumn("bin", expr(s"off div $PackSeqLen"))
        .groupBy("shard", "bin")
        .agg(count(lit(1)).as("n_docs"), sum("n_tok").cast(LongType).as("total_tokens"),
          min("doc_id").as("min_doc"), max("doc_id").as("max_doc"))
        .orderBy("shard", "bin")
    }),

    // The composed pretraining-data pipeline (round 10) — the capstone a
    // real user runs as ONE plan, not three jobs: exact-dedup to
    // representatives (one hash shuffle on text; at 100 TB on its sha2
    // digest — dedup_exact's note), drop low-quality docs (uniq-ratio
    // ≥ 0.35 as the INTEGER cross-multiplication n_uniq·20 ≥ n_tok·7 —
    // text_quality's repetitiveness axis, floored where it actually bites:
    // it drops 20-25% of every fixture), then
    // pack_sequences' shard-local exclusive-prefix packing over the
    // survivors. Catalyst pipelines all three stages: dedup's aggregate
    // feeds the filter map-side, and only survivors reach the packing
    // shuffle. Output grain = (shard, bin) packing stats of the CLEANED
    // corpus — diff against pack_sequences' raw-corpus stats to see the
    // pipeline's effect.
    "pipeline_pretrain_mini" -> ((s, d) => {
      val cleaned = documents(s, d)
        .groupBy("text")
        .agg(min(col("doc_id")).as("doc_id"))
        .select(col("doc_id"),
          size(toks(col("text"))).cast(LongType).as("n_tok"),
          size(array_distinct(toks(col("text")))).cast(LongType).as("n_uniq"))
        .where(col("n_uniq") * 20 >= col("n_tok") * 7)
      val byDoc = Window.partitionBy("shard").orderBy("doc_id")
        .rowsBetween(Window.unboundedPreceding, -1)
      cleaned
        .withColumn("shard", pmod(col("doc_id"), lit(PackShards.toLong)))
        .withColumn("off", coalesce(sum("n_tok").over(byDoc), lit(0L)))
        .withColumn("bin", expr(s"off div $PackSeqLen"))
        .groupBy("shard", "bin")
        .agg(count(lit(1)).as("n_docs"),
          sum("n_tok").cast(LongType).as("total_tokens"),
          min("doc_id").as("min_doc"), max("doc_id").as("max_doc"))
        .orderBy("shard", "bin")
    }),

    // Context-window chunking with overlap: each doc's token stream splits
    // into chunks of 64 tokens at stride 48 (16-token overlap) — the RAG /
    // eval-context preparation step. Pure map-side generate: sequence() of
    // chunk ids + slice() of the token array, no shuffle at all until the
    // final presentation sort; at 100 TB this is embarrassingly parallel.
    "chunk_overlap" -> ((s, d) => {
      val (c, st) = (64, 48)
      documents(s, d)
        .select(col("doc_id"), toks(col("text")).as("tk"))
        .withColumn("n", size(col("tk")).cast(LongType))
        .withColumn("chunk_id", explode(expr(
          s"sequence(0L, greatest(cast(ceil((n - $c) / $st.0) as bigint), 0L))")))
        .select(col("doc_id"), col("chunk_id"),
          (col("chunk_id") * st + 1).as("start"),
          least(lit(c.toLong), col("n") - (col("chunk_id") * st + 1) + 1).as("n_chunk_toks"),
          concat_ws(" ", slice(col("tk"), (col("chunk_id") * st + 1).cast(IntegerType), lit(c)))
            .as("chunk_text"))
        .orderBy("doc_id", "chunk_id")
    }),

    "text_grep" -> ((s, d) =>
      documents(s, d)
        .filter(col("text").rlike("scan (table|merge)"))
        .select("doc_id")
        .orderBy("doc_id")),

    "text_inverted_index" -> ((s, d) =>
      // Flattened posting list: distinct (word, doc_id), totally ordered —
      // the grouped `collect_list` form is equivalent but not oracle-hashable.
      documents(s, d)
        .select(explode(toks(col("text"))).as("word"), col("doc_id"))
        .distinct()
        .orderBy("word", "doc_id")),

    "text_stats" -> ((s, d) =>
      documents(s, d)
        .groupBy("lang")
        .agg(
          count(lit(1)).as("n_docs"),
          lsum(col("n_chars")).as("sum_chars"),
          lsum(size(toks(col("text")))).as("sum_tokens"))
        .orderBy("lang")),

    "text_lang_filter" -> ((s, d) =>
      documents(s, d)
        .filter(col("lang") === "en" && col("n_chars").between(50, 2000))
        .select("doc_id", "n_chars")
        .orderBy("doc_id")),

    "dedup_exact" -> ((s, d) =>
      // Exact dedup at scale = one hash shuffle on the text (or its digest at
      // 100 TB: groupBy(sha2(text)) keeps shuffle rows narrow).
      documents(s, d)
        .groupBy("text")
        .agg(min(col("doc_id")).as("doc_id"), count(lit(1)).as("n_copies"))
        .select("doc_id", "n_copies")
        .orderBy("doc_id")),

    // Raw-markup text extraction (VERDICT r18 #4): real pretraining
    // corpora start at HTML, not clean text — the trafilatura/jusText
    // step. The codec-family convention gives it an oracle: each doc is
    // rendered into DETERMINISTIC synthetic HTML in-plan (head with
    // title/style/script, nav links, a promo div on every third doc,
    // the text as an article with inline <em> markup around a content
    // word, a footer), then the extractor runs the published pipeline —
    // drop script/style WITH their content, drop boilerplate blocks
    // (title/nav/promo/footer), strip remaining tags to spaces, normalize
    // whitespace — plus the audit columns a cleaning pipeline reports
    // (tag count, raw vs kept chars) and the title as extracted metadata.
    // Extraction exactly recovers the original text (pinned in spec), and
    // the kept/raw ratio spans mostly-boilerplate to mostly-content docs
    // (fixture text runs 44-577 chars against ~290 boilerplate chars).
    // Every stage is a codegen'd string expression — one corpus scan, no
    // shuffle, no UDF; at 100 TB this is the embarrassingly parallel map
    // the crawl-cleaning stage actually is.
    "text_extract_markup" -> ((s, d) => {
      val mk = expr(
        "concat('<html><head><title>doc-', CAST(doc_id AS STRING), '</title>', " +
        "'<style>.x{color:#000}</style>', " +
        "'<script>var id=', CAST(doc_id AS STRING), ';track();</script></head>', " +
        "'<body><nav><a href=\"/\">home</a><a href=\"/a\">about</a></nav>', " +
        "CASE WHEN doc_id % 3 = 0 THEN '<div class=\"promo\">subscribe now limited offer click here</div>' ELSE '' END, " +
        // WORD-BOUNDARY wrap (code-review r19): a substring replace would
        // render 'sparkle' as '<em>spark</em>le' and the tag-strip stage
        // would split it to 'spark le' — breaking the exact-recovery
        // contract on any fixture word containing the marker as a proper
        // substring. \b is ASCII-equivalent in Java and RE2 on this text.
        "'<article><p>', regexp_replace(text, '\\\\bspark\\\\b', '<em>spark</em>'), '</p></article>', " +
        "'<footer>copyright example corp all rights reserved</footer></body></html>')")
      documents(s, d)
        .withColumn("html", mk)
        .withColumn("r1", regexp_replace(col("html"),
          "<script>[^<]*</script>|<style>[^<]*</style>", ""))
        .withColumn("r2", regexp_replace(col("r1"),
          "<title>[^<]*</title>|<nav>.*?</nav>|<div class=\"promo\">[^<]*</div>|<footer>[^<]*</footer>", ""))
        .withColumn("extracted",
          trim(regexp_replace(regexp_replace(col("r2"), "<[^>]*>", " "), " +", " ")))
        .select(col("doc_id"),
          regexp_extract(col("html"), "<title>([^<]*)</title>", 1).as("title"),
          (length(col("html")) - length(expr("replace(html, '<', '')")))
            .cast(LongType).as("n_tags"),
          length(col("html")).cast(LongType).as("html_chars"),
          length(col("extracted")).cast(LongType).as("kept_chars"),
          col("extracted"))
        .orderBy("doc_id")
    }),

    "text_langid" -> (langId _),

    "text_quality" -> ((s, d) =>
      documents(s, d)
        .select(
          col("doc_id"),
          size(toks(col("text"))).as("n_tokens"),
          size(array_distinct(toks(col("text")))).as("n_uniq"),
          expr("size(filter(split(text, ' '), x -> x = 'the' OR x = 'a' OR x = 'of'))")
            .as("n_stop"))
        .withColumn("uniq_ratio",
          col("n_uniq").cast(DoubleType) / col("n_tokens").cast(DoubleType))
        .withColumn("quality",
          when(col("uniq_ratio") >= 0.5 && col("n_tokens") >= 20, "good")
            .when(col("uniq_ratio") >= 0.25, "fair")
            .otherwise("poor"))
        .orderBy("doc_id")),

    // CLASSIFIER-based quality filtering (round 17) — the published
    // GPT-3/CCNet position one step past heuristic rules: train a
    // classifier on a curated positive seed vs a random crawl sample, keep
    // docs the classifier scores positively. Here a multinomial NAIVE
    // BAYES with add-one smoothing over word counts — the fastText-style
    // linear-in-counts family — because its log-likelihood-ratio weights
    // are log2 of pure COUNT ratios, so the exact fixed-point kernel
    // applies and the whole classifier is DuckDB-reproducible (a
    // gradient-trained model would put libm in the gate). Positive seed =
    // the curated reference set (doc_id < QcSeedDocs — the same set the
    // decontamination screen protects); negative seed = a disjoint
    // pseudo-random crawl sample (doc_id % 10 == QcNegResidue, ids ≥
    // seed). Per word: w_µ = log2µ(c⁺+1) − log2µ(N⁺+V) − log2µ(c⁻+1) +
    // log2µ(N⁻+V); per doc: Σ tf·w_µ, keep ⟺ Σ ≥ 0 (the sign test —
    // division-free, so no negative-operand div/floor divergence between
    // engines). Measured non-vacuous at every SF: 288/500, 233/500,
    // 1043/5000 kept. Plan shape at 100 TB: the standing tfIndex, two
    // vocab-bounded class aggregates, two 1-row broadcasts, one equi-join
    // on word, one per-doc re-aggregate — lmScores' shape with two models;
    // the weight frame IS the shippable classifier artifact.
    "text_quality_classifier" -> ((s, d) => {
      val tf = tfIndex(s, d)
      val posC = tf.where(col("doc_id") < QcSeedDocs)
        .groupBy("word").agg(lsum(col("tf")).as("cp"))
      val negC = tf.where(col("doc_id") >= QcSeedDocs &&
          pmod(col("doc_id"), lit(10L)) === QcNegResidue)
        .groupBy("word").agg(lsum(col("tf")).as("cn"))
      val v = tf.select("word").distinct().agg(count(lit(1)).as("v"))
      val np = tf.where(col("doc_id") < QcSeedDocs).agg(lsum(col("tf")).as("np"))
      val nn = tf.where(col("doc_id") >= QcSeedDocs &&
          pmod(col("doc_id"), lit(10L)) === QcNegResidue)
        .agg(lsum(col("tf")).as("nn"))
      val w = tf.select("word").distinct()
        .join(posC, Seq("word"), "left").join(negC, Seq("word"), "left")
        .crossJoin(broadcast(v)).crossJoin(broadcast(np)).crossJoin(broadcast(nn))
        .select(col("word"),
          expr(s"${log2MicroSql("(coalesce(cp, 0L) + 1L)")} - ${log2MicroSql("(np + v)")} - " +
            s"${log2MicroSql("(coalesce(cn, 0L) + 1L)")} + ${log2MicroSql("(nn + v)")}")
            .as("w_micro"))
      tf.join(w, "word")
        .groupBy("doc_id")
        .agg(lsum(col("tf")).as("n_tokens"),
          lsum(expr("tf * w_micro")).as("llr_micro"))
        .select(col("doc_id"), col("n_tokens"), col("llr_micro"),
          (col("llr_micro") >= 0L).as("keep"))
        .orderBy("doc_id")
    }),

    // Published quality-rule filter (Gopher — Rae et al. 2021 Appendix A;
    // the same heuristic battery RefinedWeb/Dolma reuse), as a per-rule
    // flag vector so downstream can audit WHICH rule dropped a doc rather
    // than just that it dropped: word-count bounds, mean-word-length
    // bounds, minimum stopword evidence, top-word concentration cap, and
    // duplicate-word-fraction cap. Thresholds are the published shapes
    // scaled to the fixture's ranges (docs are 10-99 words; each rule
    // fires BOTH ways at sf0.001/0.01/0.1 — measured in DuckDB before
    // wiring, the non-vacuity discipline). All-integer predicates: means
    // and fractions compare by cross-multiplication (sum_len >= 4n, not
    // sum_len/n >= 4.0), so the flags are bit-identical cross-engine.
    // Shape at 100 TB: tokens → (doc, word) partial-aggregated counts →
    // one per-doc aggregate; two map-side-combinable hash aggregates, no
    // join, no window — embarrassingly parallel in doc_id.
    "text_gopher_rules" -> ((s, d) =>
      documents(s, d)
        .select(col("doc_id"), explode(toks(col("text"))).as("word"))
        .groupBy("doc_id", "word").agg(count(lit(1)).as("c"))
        .groupBy("doc_id")
        .agg(sum("c").as("n_words"),
          count(lit(1)).as("n_uniq"),
          max("c").as("top_c"),
          sum(length(col("word")) * col("c")).as("sum_len"),
          sum(when(col("word").isin(GopherStop: _*), col("c"))
            .otherwise(lit(0L))).as("n_stop"))
        .select(col("doc_id"), col("n_words"), col("n_uniq"),
          col("top_c"), col("sum_len"), col("n_stop"),
          (col("n_words") >= 20 && col("n_words") <= 90).as("wc_ok"),
          (col("sum_len") >= col("n_words") * 4 &&
            col("sum_len") <= col("n_words") * 5).as("mean_len_ok"),
          (col("n_stop") >= 2).as("stop_ok"),
          (col("top_c") * 5 <= col("n_words")).as("top_word_ok"),
          ((col("n_words") - col("n_uniq")) * 10 <= col("n_words") * 6).as("dup_ok"))
        .withColumn("keep",
          col("wc_ok") && col("mean_len_ok") && col("stop_ok") &&
            col("top_word_ok") && col("dup_ok"))
        .orderBy("doc_id")),

    "text_tokens" -> ((s, d) =>
      documents(s, d)
        .select(
          col("doc_id"),
          size(expr("regexp_extract_all(text, '[a-z]+|[0-9]+|[^a-z0-9 ]', 0)")).as("n_bpe"),
          size(toks(col("text"))).as("n_ws"))
        .orderBy("doc_id")),

    "text_keywords_per_lang" -> ((s, d) => {
      // Top-5 tokens per language: tokenize → per-(lang, word) counts →
      // rank within language (keyword extraction shape).
      import org.apache.spark.sql.expressions.Window
      val counts = documents(s, d)
        .select(col("lang"), explode(toks(col("text"))).as("word"))
        .groupBy("lang", "word")
        .agg(count(lit(1)).as("cnt"))
      val w = Window.partitionBy("lang").orderBy(col("cnt").desc, col("word").asc)
      counts.withColumn("rn", row_number().over(w))
        .where(col("rn") <= 5)
        .select("lang", "word", "cnt", "rn")
        .orderBy("lang", "rn")
    }),

    "text_bigram_counts" -> ((s, d) =>
      // Adjacent-token bigram frequencies — the n-gram LM building block;
      // top-50 on a (cnt, bigram) total order.
      documents(s, d)
        .select(split(col("text"), " ").as("toks"))
        // size<2 guard: Spark's sequence(1, 0) is DESCENDING [1,0] (not
        // empty like DuckDB's generate_series), which would fabricate two
        // phantom bigrams for a single-token doc.
        .select(explode(expr(
          "CASE WHEN size(toks) >= 2 THEN transform(sequence(1, size(toks) - 1), " +
          "i -> concat_ws(' ', get(toks, i-1), get(toks, i))) ELSE array() END")).as("bigram"))
        .groupBy("bigram")
        .agg(count(lit(1)).as("cnt"))
        .orderBy(col("cnt").desc, col("bigram").asc)
        .limit(50)),

    "text_fingerprint" -> ((s, d) =>
      // See [[FingerprintExpr]] — also the streaming dedup state key.
      documents(s, d)
        .select(col("doc_id"), polyFingerprint(col("text")).as("fingerprint"))
        .orderBy("doc_id")),

    "text_tfidf_topk" -> ((s, d) => {
      // TF-IDF keyword extraction: per-doc top-3 terms by tf·ln(N/df) —
      // the classic relevance score, all from two hash aggregations (tf by
      // (doc, word), df by word) + a word-keyed join + per-doc rank. The
      // 1-row corpus count broadcasts. The raw DOUBLE score is NOT in the
      // output: JVM Math.log and libm ln differ in the last ulp on some
      // inputs (~13% of rows at sf0.1 string-mismatch), but the RANKING is
      // stable — the smallest adjacent-rank score gap between distinct
      // (tf, df) pairs is ~2.6e-4 at sf0.1, 12 orders above ulp noise, and
      // equal (tf, df) pairs tie-break on the word. Output carries
      // (tf, df, rn); the score is derivable.
      import org.apache.spark.sql.expressions.Window
      // whole-corpus (doc, word) tf index — fixture-keyed standing
      // artifact like the bm25 posting list (round 9); shared with
      // text_lm_surprisal via [[tfIndex]]
      val tf = tfIndex(s, d)
      val df = tf.groupBy("word").agg(count(lit(1)).as("df"))
      val n = documents(s, d).agg(count(lit(1)).as("n"))
      val w = Window.partitionBy("doc_id").orderBy(col("score").desc, col("word").asc)
      tf.join(df, "word").crossJoin(broadcast(n))
        .withColumn("score", col("tf") * log(col("n").cast(DoubleType) / col("df")))
        .withColumn("rn", row_number().over(w))
        .where(col("rn") <= 3)
        .select("doc_id", "word", "tf", "df", "rn")
        .orderBy("doc_id", "rn")
    }),

    // Per-language Shannon entropy of the token distribution — the
    // information-theoretic corpus-diversity metric (text_token_gini's
    // 1 − Σp² is the collision approximation of this; entropy separates
    // distributions gini compresses together). Exact integer fixed-point
    // via the same [[log2MicroSql]] kernel as text_lm_surprisal:
    // H ≈ (Σ_w c_w·(log2µ(N_l) − log2µ(c_w))) div N_l, in milli-bits —
    // H = Σ p·log2(1/p) restated with p = c/N never materialized as a
    // float, and rearranged to avoid any join: Σ c·(L(N) − L(c)) =
    // N·L(N) − Σ c·L(c) EXACTLY in integer arithmetic (Σc = N), so one
    // aggregate collects (N, |vocab|, Σ c·L(c)) and the entropy is a
    // post-agg expression — genuinely text_token_gini's shape: two
    // partial+final hash aggregates, the second ≤|langs| rows, ONE
    // corpus scan, no broadcast. DOMAIN: N·log2µ(N) must fit a BIGINT —
    // overflow at N ≈ 2.4×10¹¹ tokens PER LANGUAGE (~1 TB of text in one
    // language; 1.2×10¹⁴ at sf0.1, comfortable). Under ANSI both engines
    // error loudly rather than wrap; past that, shard the per-language
    // counts (by source, say) and merge milli-bit partials downstream —
    // the same prescription as log2MicroSql's own domain note.
    "text_token_entropy" -> ((s, d) =>
      documents(s, d)
        .select(col("lang"), explode(toks(col("text"))).as("w"))
        .groupBy("lang", "w").agg(count(lit(1)).as("c"))
        .groupBy("lang")
        .agg(lsum(col("c")).as("n_tokens"), count(lit(1)).as("n_vocab"),
          lsum(expr(s"c * ${log2MicroSql("c")}")).as("cbits"))
        .select(col("lang"), col("n_tokens"), col("n_vocab"),
          expr(s"((n_tokens * ${log2MicroSql("n_tokens")} - cbits) " +
            "div n_tokens) div 1000").as("entropy_millibits"))
        .orderBy("lang")),

    // Unigram-LM quality scoring (the CCNet/Gopher "perplexity filter"
    // shape): score each document by its mean per-token surprisal
    // −log2 p(token) under the corpus's own unigram model, flag the
    // rare-token-heavy tail. Everything is EXACT integer fixed-point
    // (rule D5): p(token) = c/N is never materialized as a float —
    // surprisal = log2µ(N) − log2µ(c) in micro-bits via [[log2MicroSql]]
    // (binary-length ilog2 + interpolated fraction, `div` arithmetic), so
    // the scores hash-match DuckDB bit-for-bit where a libm ln() would
    // diverge in the last ulp. Plan shape = tfidf's: the memoized standing
    // tf index, a word-keyed count aggregate (mergeable partials), one
    // shuffle join tf⋈counts on word, a 1-row corpus total broadcast, and
    // a per-doc re-aggregate — at 100 TB every stage is partial+final
    // hash aggregation or an equi-join on the token key; nothing collects.
    "text_lm_surprisal" -> ((s, d) =>
      lmScores(s, d)
        .withColumn("flagged",
          col("surprisal_millibits") >= lit(LmSurprisalFlagMilli))
        .orderBy("doc_id")),

    // CCNet-style perplexity banding (Wenzek et al. 2020, public): rank
    // documents PER LANGUAGE by LM surprisal (the shared exact fixed-point
    // [[lmScores]] chain), cut each language into head/middle/tail
    // terciles, keep head+middle — the published screen that biases a
    // crawl toward fluent text without an absolute threshold that breaks
    // per language (an absolute cut would drop whole low-resource
    // languages; text_lm_surprisal's global flag shows exactly that
    // failure mode at 64x — DESIGN round 12). Every decision is integer-
    // exact: millibit surprisal, row_number over (surprisal, doc_id),
    // tercile tests by cross-multiplication (rnk·3 ≤ n, rnk·3 ≤ 2n).
    // Plan: the standing surprisal chain, a doc_id-keyed join to recover
    // lang, then ONE per-language window (rank + count share the sort).
    // At 100 TB the exact per-lang ranking becomes a sampled-threshold
    // pass (approx per-lang quantiles of the same millibit scores); the
    // band contract is unchanged.
    "sample_perplexity_band" -> ((s, d) =>
      bandedByLang(s, d, lmScores(s, d))),

    // Bigram-LM quality scoring — the CCNet filter position upgraded to a
    // conditional model (VERDICT r15 #1): mean per-token surprisal under
    // add-one P(w|prev), exact fixed-point throughout (see
    // [[lmScoresBigram]] for the model, smoothing, and 100 TB plan shape).
    // The flag cut is [[BigramFlagMilli]], measured non-vacuous at every SF.
    "text_lm_surprisal_bigram" -> ((s, d) =>
      lmScoresBigram(s, d)
        .withColumn("flagged",
          col("surprisal_millibits") >= lit(BigramFlagMilli))
        .orderBy("doc_id")),

    // Perplexity banding re-cut under the bigram scores — same per-language
    // tercile contract as sample_perplexity_band (rank + count share one
    // window; integer cross-multiplication band edges), but ranking by the
    // conditional-model surprisal, which separates "rare words" from "rare
    // transitions" (a doc of common words in scrambled order scores high
    // here and low under the unigram model — the fluency signal CCNet's
    // LM actually measures). Same 100 TB note: the exact per-lang ranking
    // becomes a sampled-threshold pass at scale, band contract unchanged.
    // Kneser-Ney bigram scoring — the published smoothing upgrade over
    // add-one (see [[lmScoresKn]] for the model, the D=1/2 integer
    // clearing, and the 100 TB plan shape); flag cut [[KnFlagMilli]],
    // measured non-vacuous at every SF
    "text_lm_surprisal_kn" -> ((s, d) =>
      lmScoresKn(s, d)
        .withColumn("flagged",
          col("surprisal_millibits") >= lit(KnFlagMilli))
        .orderBy("doc_id")),

    "sample_perplexity_band_bigram" -> ((s, d) =>
      bandedByLang(s, d, lmScoresBigram(s, d))),

    // The banding under the BEST smoother in the family — Kneser-Ney
    // scores through the same per-language tercile contract. Production
    // CCNet runs exactly this position: a real LM's per-doc score, cut
    // per language.
    "sample_perplexity_band_kn" -> ((s, d) =>
      bandedByLang(s, d, lmScoresKn(s, d))),

    "sample_importance_weighted" -> ((s, d) =>
      // Quality-weighted subsampling — the training-data curation step
      // after quality scoring: keep each doc with probability equal to its
      // lexical-diversity weight w = distinct_tokens / total_tokens,
      // WITHOUT rand() (rule D5): keep iff mhash(doc_id) < w, tested by
      // integer cross-multiplication (hash * total < distinct * 1e6) so
      // the decision is exact, reproducible run-to-run and engine-to-
      // engine, and re-derivable for any doc in isolation (no global
      // state, no sampling order) — the contract that makes a 100 TB
      // subsample auditable. Map-only: no shuffle before the final sort.
      documents(s, d)
        .select(col("doc_id"), col("source"), toks(col("text")).as("tk"))
        .select(col("doc_id"), col("source"),
          size(col("tk")).cast(LongType).as("n_tok"),
          size(array_distinct(col("tk"))).cast(LongType).as("n_uniq"))
        .where(mhash(col("doc_id"), 1000000L) * col("n_tok") <
          col("n_uniq") * lit(1000000L))
        .orderBy("doc_id")),

    // DSIR-style data selection (Xie et al. 2023, "Data Selection for
    // Language Models via Importance Resampling" — public): score every
    // doc by how much more likely its hashed-unigram features are under a
    // TARGET distribution than under the raw corpus, then keep the top
    // slice. Target here = the corpus' own English slice (the high-
    // resource slice standing in for the paper's quality domain); features
    // = words hashed into DsirBuckets buckets by the portable polynomial
    // kernel (the text_fingerprint hash), so the feature space is bounded
    // regardless of vocabulary size — the property that makes DSIR run at
    // 100 TB. Everything is exact fixed point (rule D5): add-one-smoothed
    // bucket log-probs in micro-bits via the shared log2 kernel, per-doc
    // score = Σ c_b·w_b as BIGINT, and deterministic top-K by
    // (score DESC, doc_id) replaces the paper's Gumbel resampling.
    // Scale shape: ONE token-stream aggregate builds BOTH distributions
    // (conditional sums) and collapses to a DsirBuckets-row weight table
    // that BROADCASTS onto the per-doc bucket counts; the only corpus-
    // sized exchange is the (doc_id, bucket) aggregate, and the final
    // selection is a TakeOrdered, never a global sort.
    "sample_dsir" -> ((s, d) => {
      val B = DsirBuckets
      val bkt = pmod(polyFingerprint(col("word")), lit(B.toLong))
      // ONE tokenize/hash pass (code-review r13): the per-doc bucket
      // counts are the finest grain, and lang is functionally dependent
      // on doc_id, so both distributions derive from the (doc_id, lang,
      // b) aggregate — the corpus is scanned and hashed exactly once,
      // persisted across the two consumers and released after use
      val perDoc = documents(s, d)
        .select(col("doc_id"), col("lang"), explode(toks(col("text"))).as("word"))
        .select(col("doc_id"), col("lang"), bkt.as("b"))
        .groupBy("doc_id", "lang", "b").agg(count(lit(1)).as("c"))
        .persist()
      val stats = perDoc.groupBy("b").agg(
        lsum(col("c")).as("cr"),
        sum(when(col("lang") === "en", col("c")).otherwise(0L)).as("ct"))
      val tot = stats.agg(lsum(col("cr")).as("nr"), lsum(col("ct")).as("nt"))
      val w = stats.crossJoin(broadcast(tot))
        .select(col("b"), expr(
          s"${log2MicroSql("ct + 1")} - ${log2MicroSql(s"nt + $B")} - " +
          s"(${log2MicroSql("cr + 1")} - ${log2MicroSql(s"nr + $B")})").as("w"))
      Similarity.releaseAfterUse("dsir_perdoc",
        perDoc.join(broadcast(w), Seq("b"))
          .groupBy("doc_id").agg(lsum(col("c") * col("w")).as("score_micro"))
          .orderBy(col("score_micro").desc, col("doc_id").asc)
          .limit(DsirTopK),
        Seq(perDoc))
    }),

    "text_bm25_topk" -> ((s, d) => {
      // Per-query top-5 over the shared [[bm25Scored]] frame (round 19:
      // the scored frame factored out so the Retrieval keys — RRF fusion,
      // dense rerank — consume the SAME candidate generator this key
      // certifies, query and oracle alike).
      val w = Window.partitionBy("query_id")
        .orderBy(col("score_micro").desc, col("doc_id").asc)
      bm25Scored(s, d).withColumn("rn", row_number().over(w))
        .where(col("rn") <= 5)
        .select("query_id", "rn", "doc_id", "score_micro", "n_terms")
        .orderBy("query_id", "rn")
    }),

    "text_repetition" -> ((s, d) =>
      // Gopher-style repetition quality signal: the fraction of a document's
      // word TRIGRAMS that are duplicates of an earlier trigram in the same
      // document — boilerplate/generated text repeats itself locally where
      // exact/near dedup (cross-doc) can't see it. Micro-unit integer ratio
      // (rule D5: truncating div, no floats) so the score itself is
      // cross-engine bit-exact and ships in the output. Pure map-side per-doc
      // array work (transform + array_distinct) — zero shuffle before the
      // presentation sort; at 100 TB this is embarrassingly parallel.
      // size<3 guard: Spark's sequence(2, 1) is DESCENDING (not empty like
      // DuckDB's range), which would fabricate phantom trigrams — same edge
      // as text_bigram_counts.
      documents(s, d)
        .select(col("doc_id"), toks(col("text")).as("tk"))
        .select(col("doc_id"), expr(
          "CASE WHEN size(tk) >= 3 THEN transform(sequence(2, size(tk) - 1), " +
          "i -> concat_ws(' ', get(tk, i-2), get(tk, i-1), get(tk, i))) " +
          "ELSE array() END").as("tri"))
        .select(col("doc_id"),
          size(col("tri")).cast(LongType).as("n_trigrams"),
          size(array_distinct(col("tri"))).cast(LongType).as("n_distinct"))
        .withColumn("dup_micro", expr(
          "CASE WHEN n_trigrams > 0 THEN " +
          "((n_trigrams - n_distinct) * 1000000L) div n_trigrams ELSE 0L END"))
        .withColumn("flag",
          when(col("dup_micro") >= lit(RepetitionFlagMicro), "repetitive")
            .otherwise("ok"))
        .orderBy("doc_id")),

    "text_pii_scrub" -> ((s, d) =>
      // PII redaction — the compliance pass every training-data pipeline
      // runs before anything else: email-shaped tokens and long digit runs
      // are replaced with fixed placeholders, and the redaction count is
      // kept for audit. Pure regexp_replace: codegen'd, partition-local,
      // no shuffle — at 100 TB this is a map-only pass over the corpus.
      documents(s, d)
        // digit runs are counted on the email-scrubbed intermediate, not
        // the raw text — a digit run inside an email must not count twice
        // (only one replacement happens in the output)
        .withColumn("no_email",
          regexp_replace(col("text"), "[A-Za-z0-9._%+-]+@[A-Za-z0-9.-]+", "<EMAIL>"))
        .select(
          col("doc_id"),
          regexp_replace(col("no_email"), "[0-9]{6,}", "<NUM>").as("scrubbed"),
          (size(expr("regexp_extract_all(text, '[A-Za-z0-9._%+-]+@[A-Za-z0-9.-]+', 0)")) +
            size(expr("regexp_extract_all(no_email, '[0-9]{6,}', 0)"))).as("n_redactions"))
        .orderBy("doc_id")),

    // Rare-n-gram quality filter (the "looks like no other text in the
    // corpus" screen): a document whose word trigrams mostly fall OUTSIDE
    // the corpus's frequent set is flagged as suspect boilerplate/noise.
    // Scale shape: rarity is membership in the top-F corpus trigrams, NOT
    // a join against the full (unbounded) trigram vocabulary — the top-F
    // frame is produced by a distributed TakeOrdered (orderBy + limit, no
    // single-partition window) and BROADCAST to the probe, so the only
    // shuffles are the trigram count and the per-doc aggregate. The left
    // join from documents restores trigram-less docs (< 3 tokens) with
    // zero counts instead of dropping them. Integer counts end-to-end;
    // the keep rule (2·n_rare ≤ n_trigrams, i.e. ≤ 50% rare) is exact.
    "text_rare_ngram_filter" -> ((s, d) => {
      val tri = documents(s, d)
        .select(col("doc_id"), toks(col("text")).as("tk"))
        .select(col("doc_id"), explode(expr(
          "CASE WHEN size(tk) >= 3 THEN transform(sequence(2, size(tk) - 1), " +
          "i -> concat_ws(' ', get(tk, i-2), get(tk, i-1), get(tk, i))) " +
          "ELSE array() END")).as("g"))
      val freq = tri.groupBy("g").agg(count(lit(1)).as("c"))
        .orderBy(col("c").desc, col("g").asc).limit(RareFreqSetSize)
        .select(col("g"), lit(1).as("is_freq"))
      val per = tri.join(broadcast(freq), Seq("g"), "left")
        .groupBy("doc_id")
        .agg(count(lit(1)).as("n_trigrams"),
          sum(when(col("is_freq").isNull, 1L).otherwise(0L)).as("n_rare"))
      documents(s, d).select(col("doc_id"))
        .join(per, Seq("doc_id"), "left")
        .select(col("doc_id"),
          coalesce(col("n_trigrams"), lit(0L)).as("n_trigrams"),
          coalesce(col("n_rare"), lit(0L)).as("n_rare"))
        .withColumn("keep", col("n_rare") * 2 <= col("n_trigrams"))
        .orderBy("doc_id")
    }),

    // Frequent co-occurring token pairs (market-basket support counting
    // over documents). The naive form is quadratic in document length; the
    // scale-safe form caps each doc at its K alphabetically-first DISTINCT
    // tokens, bounding per-doc fan-out to K(K-1)/2 pairs no matter how
    // long the doc is — candidate volume is then linear in corpus size.
    // One window per doc for the cap, one self equi-join on doc_id (both
    // sides shuffle once on the same key), one pair-count aggregate;
    // output is bounded by vocab² and further cut by the support floor.
    "text_cooccur_pairs" -> ((s, d) => {
      val w = Window.partitionBy("doc_id").orderBy(col("w").asc)
      val capped = documents(s, d)
        .select(col("doc_id"), explode(array_distinct(toks(col("text")))).as("w"))
        .withColumn("rn", row_number().over(w))
        .where(col("rn") <= CooccurCap)
        .select("doc_id", "w")
      capped.as("a")
        .join(capped.as("b"),
          col("a.doc_id") === col("b.doc_id") && col("a.w") < col("b.w"))
        .groupBy(col("a.w").as("w1"), col("b.w").as("w2"))
        .agg(count(lit(1)).as("support"))
        .where(col("support") >= CooccurMinSupport)
        .orderBy("w1", "w2")
    }),

    // Vocabulary encoding (round 12, VERDICT r11 #3): each document becomes
    // its token-ID sequence under the ranked top-K vocabulary, OOV words
    // mapping to UNK=1 — the tokenizer step every pretraining pipeline runs
    // before packing. Plan: posexplode is map-side, the id lookup is a
    // BROADCAST left join against the K-row vocab (the corpus never
    // shuffles on `word`), and the one real shuffle is the doc_id
    // re-aggregate, where array_sort(struct(pos, id)) restores token order
    // exactly (collect_list is partition-order dependent; the sort makes
    // the result order-independent — rule D1 at the row level). The id
    // sequence renders as a space-joined string: SQL-expressible on both
    // engines and hash-stable (array cells stringify differently across
    // pandas conversions).
    "text_vocab_encode" -> ((s, d) =>
      documents(s, d)
        .select(col("doc_id"), posexplode(toks(col("text"))).as(Seq("pos", "word")))
        .join(broadcast(vocabFrame(s, d)), Seq("word"), "left")
        .select(col("doc_id"), col("pos"), coalesce(col("id"), lit(UnkId)).as("id"))
        .groupBy("doc_id")
        .agg(count(lit(1)).as("n_tok"),
          sum(when(col("id") === UnkId, 1L).otherwise(0L)).as("n_unk"),
          collect_list(struct(col("pos"), col("id"))).as("pid"))
        .withColumn("ids_str",
          expr("concat_ws(' ', transform(array_sort(pid), x -> CAST(x.id AS STRING)))"))
        .select("doc_id", "n_tok", "n_unk", "ids_str")
        .orderBy("doc_id")),

    // Id-level sequence packing (round 12): pack_sequences upgraded from
    // fill STATISTICS to the actual training ARTIFACT — each (shard, bin)
    // row carries its real PackSeqLen-token id stream, docs straddling bin
    // boundaries exactly as the offset arithmetic dictates. Same shard
    // decomposition as pack_sequences (parallelism = PackShards, no global
    // running sum); each token's global stream position is its doc's
    // exclusive-prefix offset + its in-doc position, its bin that position
    // div PackSeqLen. Shuffles: the per-shard offset window, then ONE
    // (shard, bin) aggregate; the vocab probe is broadcast map-side. At
    // 100 TB the string_agg render becomes the sink's int32 array write,
    // but grain and arithmetic are exactly this plan's.
    "pack_sequences_ids" -> ((s, d) => {
      val byDoc = Window.partitionBy("shard").orderBy("doc_id")
        .rowsBetween(Window.unboundedPreceding, -1)
      documents(s, d)
        .select(col("doc_id"), pmod(col("doc_id"), lit(PackShards.toLong)).as("shard"),
          toks(col("text")).as("tk"))
        .withColumn("n_tok", size(col("tk")).cast(LongType))
        .withColumn("off", coalesce(sum("n_tok").over(byDoc), lit(0L)))
        .select(col("shard"), col("off"), posexplode(col("tk")).as(Seq("pos", "word")))
        .withColumn("gpos", col("off") + col("pos"))
        .join(broadcast(vocabFrame(s, d)), Seq("word"), "left")
        .select(col("shard"), col("gpos"), coalesce(col("id"), lit(UnkId)).as("id"))
        .withColumn("bin", expr(s"gpos div $PackSeqLen"))
        .groupBy("shard", "bin")
        .agg(count(lit(1)).as("n_ids"),
          sum(when(col("id") === UnkId, 1L).otherwise(0L)).as("n_unk"),
          collect_list(struct(col("gpos"), col("id"))).as("gid"))
        .withColumn("ids_str",
          expr("concat_ws(' ', transform(array_sort(gid), x -> CAST(x.id AS STRING)))"))
        .select("shard", "bin", "n_ids", "n_unk", "ids_str")
        .orderBy("shard", "bin")
    })
  )

  /** Shared vocab CTE body (ranked top-VocabSize, ids from 2) — interpolated
    * into both id-encoding oracles from ONE definition so the rank rule and
    * K cannot desynchronize between them (the pack_sequences precedent).
    */
  private def vocabCte: String =
    "cnt AS (SELECT word, count(*) AS c FROM " +
    "(SELECT unnest(string_split(text, ' ')) AS word FROM documents) GROUP BY word), " +
    s"top AS (SELECT word, c FROM cnt ORDER BY c DESC, word ASC LIMIT $VocabSize), " +
    "vocab AS (SELECT word, row_number() OVER (ORDER BY c DESC, word ASC) + 1 AS id FROM top)"

  val oracles: Map[String, String] = Map(
    "sample_dsir" ->
      ("WITH tok AS (SELECT doc_id, lang, " +
       oIntFold("list_transform(string_split(word, ''), c -> CAST(ascii(c) AS BIGINT))",
         "(acc, x) -> (acc * 31 + x) % 1000000007") +
       s" % $DsirBuckets AS b FROM " +
       "(SELECT doc_id, lang, unnest(string_split(text, ' ')) AS word FROM documents)), " +
       "stats AS (SELECT b, CAST(count(*) AS BIGINT) AS cr, " +
       "CAST(sum(CASE WHEN lang = 'en' THEN 1 ELSE 0 END) AS BIGINT) AS ct " +
       "FROM tok GROUP BY b), " +
       "tot AS (SELECT CAST(sum(cr) AS BIGINT) AS nr, CAST(sum(ct) AS BIGINT) AS nt FROM stats), " +
       s"w AS (SELECT b, ${log2MicroSql("ct + 1", "//")} - ${log2MicroSql(s"nt + $DsirBuckets", "//")} - " +
       s"(${log2MicroSql("cr + 1", "//")} - ${log2MicroSql(s"nr + $DsirBuckets", "//")}) AS w " +
       "FROM stats CROSS JOIN tot), " +
       "pd AS (SELECT doc_id, b, CAST(count(*) AS BIGINT) AS c FROM tok GROUP BY doc_id, b) " +
       "SELECT doc_id, CAST(sum(c * w) AS BIGINT) AS score_micro " +
       "FROM pd JOIN w USING (b) GROUP BY doc_id " +
       s"ORDER BY score_micro DESC, doc_id ASC LIMIT $DsirTopK"),

    "text_vocab_encode" ->
      (s"WITH $vocabCte, " +
       "tok AS (SELECT doc_id, unnest(string_split(text, ' ')) AS word, " +
       "unnest(range(1, len(string_split(text, ' ')) + 1)) AS pos FROM documents), " +
       s"enc AS (SELECT t.doc_id, t.pos, coalesce(v.id, $UnkId) AS id " +
       "FROM tok t LEFT JOIN vocab v ON t.word = v.word) " +
       "SELECT doc_id, count(*) AS n_tok, " +
       s"CAST(sum(CASE WHEN id = $UnkId THEN 1 ELSE 0 END) AS BIGINT) AS n_unk, " +
       "string_agg(CAST(id AS VARCHAR), ' ' ORDER BY pos) AS ids_str " +
       "FROM enc GROUP BY doc_id ORDER BY doc_id"),

    "pack_sequences_ids" ->
      (s"WITH $vocabCte, " +
       s"d AS (SELECT doc_id, doc_id % $PackShards AS shard, " +
       "string_split(text, ' ') AS tk FROM documents), " +
       "c AS (SELECT doc_id, shard, tk, CAST(coalesce(sum(CAST(len(tk) AS BIGINT)) OVER (" +
       "PARTITION BY shard ORDER BY doc_id " +
       "ROWS BETWEEN UNBOUNDED PRECEDING AND 1 PRECEDING), 0) AS BIGINT) AS off FROM d), " +
       "tok AS (SELECT shard, off + unnest(range(0, len(tk))) AS gpos, " +
       "unnest(tk) AS word FROM c), " +
       s"enc AS (SELECT shard, gpos, coalesce(v.id, $UnkId) AS id " +
       "FROM tok t LEFT JOIN vocab v ON t.word = v.word) " +
       s"SELECT shard, gpos // $PackSeqLen AS bin, count(*) AS n_ids, " +
       s"CAST(sum(CASE WHEN id = $UnkId THEN 1 ELSE 0 END) AS BIGINT) AS n_unk, " +
       "string_agg(CAST(id AS VARCHAR), ' ' ORDER BY gpos) AS ids_str " +
       "FROM enc GROUP BY shard, bin ORDER BY shard, bin"),

    // PackShards/PackSeqLen interpolate from the SAME constants the Spark
    // side uses (ADVICE.md round 5) — a constant change can no longer
    // silently desynchronize query and oracle.
    // the same integer CASE chain, per-bucket aggregate + the global-max
    // naive padding term
    "pack_length_buckets" ->
      ("WITH t AS (SELECT doc_id, CAST(len(string_split(text, ' ')) AS BIGINT) AS n_tok " +
       "FROM documents), " +
       "b AS (SELECT doc_id, n_tok, " +
       "CASE WHEN n_tok <= 16 THEN 16 WHEN n_tok <= 32 THEN 32 " +
       "WHEN n_tok <= 64 THEN 64 WHEN n_tok <= 128 THEN 128 " +
       "WHEN n_tok <= 256 THEN 256 WHEN n_tok <= 512 THEN 512 " +
       "WHEN n_tok <= 1024 THEN 1024 WHEN n_tok <= 2048 THEN 2048 " +
       "WHEN n_tok <= 4096 THEN 4096 ELSE 8192 END AS bucket FROM t), " +
       "m AS (SELECT max(n_tok) AS mx_tok FROM t) " +
       "SELECT CAST(bucket AS BIGINT) AS bucket, count(*) AS n_docs, " +
       "CAST(sum(n_tok) AS BIGINT) AS total_tokens, " +
       "CAST(count(*) * max(n_tok) AS BIGINT) AS padded_tokens, " +
       "CAST(count(*) * max(n_tok) - sum(n_tok) AS BIGINT) AS waste_tokens, " +
       "CAST(count(*) * (SELECT mx_tok FROM m) AS BIGINT) AS naive_padded_tokens " +
       "FROM b GROUP BY bucket ORDER BY bucket"),

    "pack_sequences" ->
      (s"WITH t AS (SELECT doc_id, doc_id % $PackShards AS shard, " +
       "CAST(len(string_split(text, ' ')) AS BIGINT) AS n_tok FROM documents), " +
       "c AS (SELECT doc_id, shard, n_tok, CAST(coalesce(sum(n_tok) OVER (" +
       "PARTITION BY shard ORDER BY doc_id " +
       "ROWS BETWEEN UNBOUNDED PRECEDING AND 1 PRECEDING), 0) AS BIGINT) AS off FROM t) " +
       s"SELECT shard, off // $PackSeqLen AS bin, count(*) AS n_docs, " +
       "CAST(sum(n_tok) AS BIGINT) AS total_tokens, " +
       "min(doc_id) AS min_doc, max(doc_id) AS max_doc " +
       "FROM c GROUP BY shard, bin ORDER BY shard, bin"),

    // the three verified stages chained as CTEs: dedup reps → integer
    // quality floor → the pack_sequences chain over survivors
    "pipeline_pretrain_mini" ->
      ("WITH r AS (SELECT min(doc_id) AS doc_id, text FROM documents GROUP BY text), " +
       "q AS (SELECT doc_id, CAST(len(string_split(text, ' ')) AS BIGINT) AS n_tok, " +
       "CAST(len(list_distinct(string_split(text, ' '))) AS BIGINT) AS n_uniq FROM r), " +
       s"f AS (SELECT doc_id, n_tok, doc_id % $PackShards AS shard FROM q " +
       "WHERE n_uniq * 20 >= n_tok * 7), " +
       "c AS (SELECT doc_id, shard, n_tok, CAST(coalesce(sum(n_tok) OVER (" +
       "PARTITION BY shard ORDER BY doc_id " +
       "ROWS BETWEEN UNBOUNDED PRECEDING AND 1 PRECEDING), 0) AS BIGINT) AS off FROM f) " +
       s"SELECT shard, off // $PackSeqLen AS bin, count(*) AS n_docs, " +
       "CAST(sum(n_tok) AS BIGINT) AS total_tokens, " +
       "min(doc_id) AS min_doc, max(doc_id) AS max_doc " +
       "FROM c GROUP BY shard, bin ORDER BY shard, bin"),

    "chunk_overlap" ->
      ("WITH t AS (SELECT doc_id, string_split(text, ' ') AS tk FROM documents), " +
       "n AS (SELECT doc_id, tk, CAST(len(tk) AS BIGINT) AS n FROM t), " +
       "k AS (SELECT doc_id, tk, n, unnest(range(0, " +
       "greatest(CAST(ceil((n - 64) / 48.0) AS BIGINT), 0) + 1)) AS chunk_id FROM n) " +
       "SELECT doc_id, chunk_id, chunk_id * 48 + 1 AS start, " +
       "least(64, n - (chunk_id * 48 + 1) + 1) AS n_chunk_toks, " +
       "array_to_string(tk[(chunk_id * 48 + 1):(chunk_id * 48 + 64)], ' ') AS chunk_text " +
       "FROM k ORDER BY doc_id, chunk_id"),

    // marker-count language ID is all-integer + CASE — fully SQL-expressible
    "text_langid" ->
      ("SELECT doc_id, " +
       "CASE WHEN score_en >= greatest(score_de, score_es, score_fr, score_zh) THEN 'en' " +
       "WHEN score_de >= greatest(score_es, score_fr, score_zh) THEN 'de' " +
       "WHEN score_es >= greatest(score_fr, score_zh) THEN 'es' " +
       "WHEN score_fr >= score_zh THEN 'fr' ELSE 'zh' END AS predicted_lang, score_en " +
       "FROM (SELECT doc_id, " +
       "CAST(len(list_filter(string_split(text, ' '), x -> x IN ('the','a','fast','slow'))) AS INT) AS score_en, " +
       "CAST(len(list_filter(string_split(text, ' '), x -> x IN ('der','die','das','und'))) AS INT) AS score_de, " +
       "CAST(len(list_filter(string_split(text, ' '), x -> x IN ('el','la','los','que'))) AS INT) AS score_es, " +
       "CAST(len(list_filter(string_split(text, ' '), x -> x IN ('le','la','les','et'))) AS INT) AS score_fr, " +
       "CAST(len(list_filter(string_split(text, ' '), x -> x IN ('de','shi','le','zai'))) AS INT) AS score_zh " +
       "FROM documents) ORDER BY doc_id"),

    "text_wordcount" ->
      ("SELECT word, count(*) AS cnt FROM " +
       "(SELECT unnest(string_split(text, ' ')) AS word FROM documents) " +
       "GROUP BY word ORDER BY cnt DESC, word ASC"),

    // integer sums cast back to BIGINT (DuckDB SUM is HUGEINT); gini's `/`
    // is DuckDB true division = Spark's double division on exact operands
    "text_token_gini" ->
      ("WITH wc AS (SELECT lang, w, CAST(count(*) AS BIGINT) AS c FROM " +
       "(SELECT lang, unnest(string_split(text, ' ')) AS w FROM documents) " +
       "GROUP BY lang, w), " +
       "st AS (SELECT lang, CAST(SUM(c) AS BIGINT) AS n_tokens, " +
       "count(*) AS n_vocab, CAST(SUM(c * c) AS BIGINT) AS sumsq " +
       "FROM wc GROUP BY lang) " +
       "SELECT lang, n_tokens, n_vocab, sumsq, " +
       "1.0 - sumsq / (n_tokens * n_tokens) AS gini " +
       "FROM st ORDER BY lang"),

    "text_grep" ->
      ("SELECT doc_id FROM documents WHERE regexp_matches(text, 'scan (table|merge)') " +
       "ORDER BY doc_id"),

    "text_inverted_index" ->
      ("SELECT DISTINCT word, doc_id FROM " +
       "(SELECT unnest(string_split(text, ' ')) AS word, doc_id FROM documents) " +
       "ORDER BY word, doc_id"),

    "text_stats" ->
      ("SELECT lang, count(*) AS n_docs, " +
       s"${oLsum("n_chars")} AS sum_chars, " +
       "CAST(SUM(len(string_split(text, ' '))) AS BIGINT) AS sum_tokens " +
       "FROM documents GROUP BY lang ORDER BY lang"),

    "text_lang_filter" ->
      ("SELECT doc_id, n_chars FROM documents " +
       "WHERE lang = 'en' AND n_chars BETWEEN 50 AND 2000 ORDER BY doc_id"),

    "dedup_exact" ->
      ("SELECT min(doc_id) AS doc_id, count(*) AS n_copies FROM documents " +
       "GROUP BY text ORDER BY doc_id"),

    // the same deterministic HTML rendered with ||/CASE, the same
    // four-stage extraction (DuckDB regexp_replace needs the explicit 'g'
    // flag — Spark's is always global); regexes stay in the shared
    // Java/RE2 subset (char classes + lazy quantifier, no lookaround)
    "text_extract_markup" ->
      ("WITH h AS (SELECT doc_id, text, " +
       "'<html><head><title>doc-' || doc_id || '</title>" +
       "<style>.x{color:#000}</style><script>var id=' || doc_id || " +
       "';track();</script></head><body>" +
       "<nav><a href=\"/\">home</a><a href=\"/a\">about</a></nav>' || " +
       "CASE WHEN doc_id % 3 = 0 THEN '<div class=\"promo\">subscribe now limited offer click here</div>' ELSE '' END || " +
       "'<article><p>' || regexp_replace(text, '\\bspark\\b', '<em>spark</em>', 'g') || " +
       "'</p></article><footer>copyright example corp all rights reserved</footer></body></html>' AS html " +
       "FROM documents), " +
       "e AS (SELECT doc_id, html, trim(regexp_replace(regexp_replace(" +
       "regexp_replace(regexp_replace(html, " +
       "'<script>[^<]*</script>|<style>[^<]*</style>', '', 'g'), " +
       "'<title>[^<]*</title>|<nav>.*?</nav>|<div class=\"promo\">[^<]*</div>|<footer>[^<]*</footer>', '', 'g'), " +
       "'<[^>]*>', ' ', 'g'), ' +', ' ', 'g')) AS extracted FROM h) " +
       "SELECT doc_id, regexp_extract(html, '<title>([^<]*)</title>', 1) AS title, " +
       "CAST(length(html) - length(replace(html, '<', '')) AS BIGINT) AS n_tags, " +
       "CAST(length(html) AS BIGINT) AS html_chars, " +
       "CAST(length(extracted) AS BIGINT) AS kept_chars, extracted " +
       "FROM e ORDER BY doc_id"),

    "text_quality" ->
      ("SELECT doc_id, n_tokens, n_uniq, n_stop, " +
       "CAST(n_uniq AS DOUBLE) / CAST(n_tokens AS DOUBLE) AS uniq_ratio, " +
       "CASE WHEN CAST(n_uniq AS DOUBLE) / CAST(n_tokens AS DOUBLE) >= 0.5 AND n_tokens >= 20 THEN 'good' " +
       "WHEN CAST(n_uniq AS DOUBLE) / CAST(n_tokens AS DOUBLE) >= 0.25 THEN 'fair' ELSE 'poor' END AS quality " +
       "FROM (SELECT doc_id, " +
       "CAST(len(string_split(text, ' ')) AS INT) AS n_tokens, " +
       "CAST(len(list_distinct(string_split(text, ' '))) AS INT) AS n_uniq, " +
       "CAST(len(list_filter(string_split(text, ' '), x -> x = 'the' OR x = 'a' OR x = 'of')) AS INT) AS n_stop " +
       "FROM documents) ORDER BY doc_id"),

    // Naive-Bayes LLR weights from pure count ratios through the shared
    // fixed-point log2 kernel; keep by SIGN (division-free — `div`/`//`
    // disagree on negative operands, so the negative-capable sum never
    // meets a divide)
    "text_quality_classifier" ->
      (s"WITH qtok AS (SELECT doc_id, unnest(string_split(text, ' ')) AS word FROM documents), " +
       "qtf AS (SELECT doc_id, word, CAST(count(*) AS BIGINT) AS tf FROM qtok GROUP BY 1, 2), " +
       s"qpos AS (SELECT word, CAST(SUM(tf) AS BIGINT) AS cp FROM qtf WHERE doc_id < $QcSeedDocs GROUP BY 1), " +
       s"qneg AS (SELECT word, CAST(SUM(tf) AS BIGINT) AS cn FROM qtf " +
       s"WHERE doc_id >= $QcSeedDocs AND doc_id % 10 = $QcNegResidue GROUP BY 1), " +
       "qv AS (SELECT CAST(count(DISTINCT word) AS BIGINT) AS v FROM qtf), " +
       s"qnp AS (SELECT CAST(SUM(tf) AS BIGINT) AS np FROM qtf WHERE doc_id < $QcSeedDocs), " +
       s"qnn AS (SELECT CAST(SUM(tf) AS BIGINT) AS nn FROM qtf " +
       s"WHERE doc_id >= $QcSeedDocs AND doc_id % 10 = $QcNegResidue), " +
       "qw AS (SELECT word, " +
       s"${log2MicroSql("(coalesce(cp, 0) + 1)", "//")} - ${log2MicroSql("(np + v)", "//")} - " +
       s"${log2MicroSql("(coalesce(cn, 0) + 1)", "//")} + ${log2MicroSql("(nn + v)", "//")} AS w_micro " +
       "FROM (SELECT DISTINCT word FROM qtf) LEFT JOIN qpos USING (word) " +
       "LEFT JOIN qneg USING (word) CROSS JOIN qv CROSS JOIN qnp CROSS JOIN qnn) " +
       "SELECT doc_id, CAST(SUM(tf) AS BIGINT) AS n_tokens, " +
       "CAST(SUM(tf * w_micro) AS BIGINT) AS llr_micro, " +
       "CAST(SUM(tf * w_micro) AS BIGINT) >= 0 AS keep " +
       "FROM qtf JOIN qw USING (word) GROUP BY doc_id ORDER BY doc_id"),

    "text_gopher_rules" ->
      ("WITH wc AS (SELECT doc_id, word, CAST(count(*) AS BIGINT) AS c FROM " +
       "(SELECT doc_id, unnest(string_split(text, ' ')) AS word FROM documents) " +
       "GROUP BY doc_id, word), " +
       "s AS (SELECT doc_id, CAST(sum(c) AS BIGINT) AS n_words, " +
       "CAST(count(*) AS BIGINT) AS n_uniq, CAST(max(c) AS BIGINT) AS top_c, " +
       "CAST(sum(len(word) * c) AS BIGINT) AS sum_len, " +
       "CAST(sum(CASE WHEN word IN ('the', 'a', 'of', 'and', 'to') THEN c " +
       "ELSE 0 END) AS BIGINT) AS n_stop FROM wc GROUP BY doc_id) " +
       "SELECT doc_id, n_words, n_uniq, top_c, sum_len, n_stop, " +
       "n_words >= 20 AND n_words <= 90 AS wc_ok, " +
       "sum_len >= n_words * 4 AND sum_len <= n_words * 5 AS mean_len_ok, " +
       "n_stop >= 2 AS stop_ok, " +
       "top_c * 5 <= n_words AS top_word_ok, " +
       "(n_words - n_uniq) * 10 <= n_words * 6 AS dup_ok, " +
       "(n_words >= 20 AND n_words <= 90) AND " +
       "(sum_len >= n_words * 4 AND sum_len <= n_words * 5) AND " +
       "n_stop >= 2 AND top_c * 5 <= n_words AND " +
       "(n_words - n_uniq) * 10 <= n_words * 6 AS keep " +
       "FROM s ORDER BY doc_id"),

    "text_tokens" ->
      ("SELECT doc_id, " +
       "CAST(len(regexp_extract_all(text, '[a-z]+|[0-9]+|[^a-z0-9 ]')) AS INT) AS n_bpe, " +
       "CAST(len(string_split(text, ' ')) AS INT) AS n_ws " +
       "FROM documents ORDER BY doc_id"),

    "text_keywords_per_lang" ->
      ("SELECT lang, word, cnt, CAST(rn AS INT) AS rn FROM " +
       "(SELECT lang, word, cnt, row_number() OVER " +
       "(PARTITION BY lang ORDER BY cnt DESC, word ASC) AS rn FROM " +
       "(SELECT lang, word, count(*) AS cnt FROM " +
       "(SELECT lang, unnest(string_split(text, ' ')) AS word FROM documents) " +
       "GROUP BY lang, word)) WHERE rn <= 5 ORDER BY lang, rn"),

    "text_bigram_counts" ->
      ("SELECT bigram, count(*) AS cnt FROM " +
       "(SELECT unnest(list_transform(generate_series(1, len(ts) - 1), " +
       "i -> ts[i] || ' ' || ts[i+1])) AS bigram FROM " +
       "(SELECT string_split(text, ' ') AS ts FROM documents)) " +
       "GROUP BY bigram ORDER BY cnt DESC, bigram ASC LIMIT 50"),

    "text_fingerprint" ->
      ("SELECT doc_id, " +
       oIntFold("list_transform(string_split(text, ''), c -> CAST(ascii(c) AS BIGINT))",
         "(acc, x) -> (acc * 31 + x) % 1000000007") + " AS fingerprint " +
       "FROM documents ORDER BY doc_id"),

    "text_tfidf_topk" ->
      ("WITH tok AS (SELECT doc_id, unnest(string_split(text, ' ')) AS word FROM documents), " +
       "tf AS (SELECT doc_id, word, count(*) AS tf FROM tok GROUP BY 1, 2), " +
       "df AS (SELECT word, count(*) AS df FROM tf GROUP BY 1), " +
       "n AS (SELECT count(*) AS n FROM documents), " +
       "s AS (SELECT doc_id, word, tf, df, tf * ln(CAST(n AS DOUBLE) / df) AS score " +
       "FROM tf JOIN df USING (word) CROSS JOIN n), " +
       "r AS (SELECT doc_id, word, tf, df, " +
       "row_number() OVER (PARTITION BY doc_id ORDER BY score DESC, word ASC) AS rn FROM s) " +
       "SELECT doc_id, word, tf, df, CAST(rn AS INT) AS rn FROM r " +
       "WHERE rn <= 3 ORDER BY doc_id, rn"),

    // N·L(N) − Σ c·L(c) rearrangement mirrored — no join on either engine
    "text_token_entropy" ->
      ("WITH wc AS (SELECT lang, w, CAST(count(*) AS BIGINT) AS c FROM " +
       "(SELECT lang, unnest(string_split(text, ' ')) AS w FROM documents) " +
       "GROUP BY lang, w), " +
       "st AS (SELECT lang, CAST(SUM(c) AS BIGINT) AS n_tokens, " +
       "count(*) AS n_vocab, " +
       s"CAST(SUM(c * ${log2MicroSql("c", "//")}) AS BIGINT) AS cbits " +
       "FROM wc GROUP BY lang) " +
       "SELECT lang, n_tokens, n_vocab, " +
       s"((n_tokens * ${log2MicroSql("n_tokens", "//")} - cbits) // n_tokens) // 1000 " +
       "AS entropy_millibits FROM st ORDER BY lang"),

    // log2MicroSql mirrored with `//` (DuckDB floor div ≡ Spark div on the
    // non-negative operands); bin()/power() exact on both engines (D5 note
    // at the definition site)
    "text_lm_surprisal" ->
      ("WITH " + lmScoreCtes() +
       " SELECT doc_id, n_tokens, sm AS surprisal_millibits, " +
       s"sm >= $LmSurprisalFlagMilli AS flagged " +
       "FROM sc ORDER BY doc_id"),

    // same scoring chain, per-language tercile cuts — integer rank
    // cross-multiplication so the band edges are exact on both engines
    "sample_perplexity_band" ->
      ("WITH " + lmScoreCtes() +
       ", wl AS (SELECT sc.doc_id, d.lang, sc.sm FROM sc " +
       "JOIN documents d USING (doc_id)), " +
       "r AS (SELECT doc_id, lang, sm, " +
       "row_number() OVER (PARTITION BY lang ORDER BY sm, doc_id) AS rnk, " +
       "count(*) OVER (PARTITION BY lang) AS n FROM wl) " +
       "SELECT doc_id, lang, sm AS surprisal_millibits, " +
       "CASE WHEN rnk * 3 <= n THEN 'head' WHEN rnk * 3 <= n * 2 THEN 'middle' " +
       "ELSE 'tail' END AS band, rnk * 3 <= n * 2 AS keep " +
       "FROM r ORDER BY doc_id"),

    // bigram chain mirrored from ONE fragment site ([[bigramScoreCtes]]);
    // same `//` ≡ `div` + bin()/power() exactness notes as the unigram pair
    "text_lm_surprisal_bigram" ->
      ("WITH " + bigramScoreCtes() +
       " SELECT doc_id, n_tokens, sm AS surprisal_millibits, " +
       s"sm >= $BigramFlagMilli AS flagged " +
       "FROM bsc ORDER BY doc_id"),

    // KN chain ([[knScoreCtes]] — the shared bigram-index CTEs up to bcb,
    // then the continuation/type rollups and the D=1/2 integer-cleared
    // formula, arithmetic mirrored token-for-token from [[lmScoresKn]])
    "text_lm_surprisal_kn" ->
      ("WITH " + knScoreCtes +
       " SELECT doc_id, n_tokens, sm AS surprisal_millibits, " +
       s"sm >= $KnFlagMilli AS flagged " +
       "FROM ksc ORDER BY doc_id"),

    "sample_perplexity_band_kn" ->
      ("WITH " + knScoreCtes +
       ", kwl AS (SELECT ksc.doc_id, d.lang, ksc.sm FROM ksc " +
       "JOIN documents d USING (doc_id)), " +
       "kr AS (SELECT doc_id, lang, sm, " +
       "row_number() OVER (PARTITION BY lang ORDER BY sm, doc_id) AS rnk, " +
       "count(*) OVER (PARTITION BY lang) AS n FROM kwl) " +
       "SELECT doc_id, lang, sm AS surprisal_millibits, " +
       "CASE WHEN rnk * 3 <= n THEN 'head' WHEN rnk * 3 <= n * 2 THEN 'middle' " +
       "ELSE 'tail' END AS band, rnk * 3 <= n * 2 AS keep " +
       "FROM kr ORDER BY doc_id"),

    "sample_perplexity_band_bigram" ->
      ("WITH " + bigramScoreCtes() +
       ", bwl AS (SELECT bsc.doc_id, d.lang, bsc.sm FROM bsc " +
       "JOIN documents d USING (doc_id)), " +
       "br AS (SELECT doc_id, lang, sm, " +
       "row_number() OVER (PARTITION BY lang ORDER BY sm, doc_id) AS rnk, " +
       "count(*) OVER (PARTITION BY lang) AS n FROM bwl) " +
       "SELECT doc_id, lang, sm AS surprisal_millibits, " +
       "CASE WHEN rnk * 3 <= n THEN 'head' WHEN rnk * 3 <= n * 2 THEN 'middle' " +
       "ELSE 'tail' END AS band, rnk * 3 <= n * 2 AS keep " +
       "FROM br ORDER BY doc_id"),

    "sample_importance_weighted" ->
      ("SELECT doc_id, source, n_tok, n_uniq FROM " +
       "(SELECT doc_id, source, " +
       "CAST(len(string_split(text, ' ')) AS BIGINT) AS n_tok, " +
       "CAST(len(list_distinct(string_split(text, ' '))) AS BIGINT) AS n_uniq " +
       "FROM documents) " +
       "WHERE ((doc_id % 1000000007) * 2654435761) % 1000000 * n_tok < n_uniq * 1000000 " +
       "ORDER BY doc_id"),

    "text_bm25_topk" ->
      (s"WITH $bm25ScoredCtes " +
       "SELECT query_id, CAST(rn AS INT) AS rn, doc_id, score_micro, n_terms FROM " +
       "(SELECT *, row_number() OVER (PARTITION BY query_id " +
       "ORDER BY score_micro DESC, doc_id ASC) AS rn FROM scored) " +
       "WHERE rn <= 5 ORDER BY query_id, rn"),

    // trigram starts are 1-based i in [1, len-2]; DuckDB's range(1, len-1)
    // is already empty for len < 3 (no phantom-descending edge), and the
    // flag threshold interpolates the SAME constant as the Spark side
    "text_repetition" ->
      ("SELECT doc_id, n_trigrams, n_distinct, " +
       "CASE WHEN n_trigrams > 0 THEN " +
       "((n_trigrams - n_distinct) * 1000000) // n_trigrams ELSE 0 END AS dup_micro, " +
       "CASE WHEN (CASE WHEN n_trigrams > 0 THEN " +
       s"((n_trigrams - n_distinct) * 1000000) // n_trigrams ELSE 0 END) >= $RepetitionFlagMicro " +
       "THEN 'repetitive' ELSE 'ok' END AS flag " +
       "FROM (SELECT doc_id, CAST(len(tri) AS BIGINT) AS n_trigrams, " +
       "CAST(len(list_distinct(tri)) AS BIGINT) AS n_distinct " +
       "FROM (SELECT doc_id, list_transform(range(1, len(tk) - 1), " +
       "i -> tk[i] || ' ' || tk[i+1] || ' ' || tk[i+2]) AS tri " +
       "FROM (SELECT doc_id, string_split(text, ' ') AS tk FROM documents))) " +
       "ORDER BY doc_id"),

    // DuckDB regexp_replace needs the 'g' flag to match Spark's
    // replace-all; the simple character-class patterns parse identically
    // in Java regex and RE2
    "text_pii_scrub" ->
      ("SELECT doc_id, " +
       "regexp_replace(no_email, '[0-9]{6,}', '<NUM>', 'g') AS scrubbed, " +
       "CAST(len(regexp_extract_all(text, '[A-Za-z0-9._%+-]+@[A-Za-z0-9.-]+')) + " +
       "len(regexp_extract_all(no_email, '[0-9]{6,}')) AS INT) AS n_redactions " +
       "FROM (SELECT doc_id, text, " +
       "regexp_replace(text, '[A-Za-z0-9._%+-]+@[A-Za-z0-9.-]+', '<EMAIL>', 'g') AS no_email " +
       "FROM documents) ORDER BY doc_id"),

    // same trigram recipe as text_repetition; the top-F cut uses the same
    // total order (count DESC, trigram ASC) as the Spark TakeOrdered, so
    // boundary ties at rank F resolve identically on both engines
    "text_rare_ngram_filter" ->
      ("WITH tk AS (SELECT doc_id, string_split(text, ' ') AS tk FROM documents), " +
       "tri AS (SELECT doc_id, unnest(list_transform(range(1, len(tk) - 1), " +
       "i -> tk[i] || ' ' || tk[i+1] || ' ' || tk[i+2])) AS g FROM tk), " +
       "gc AS (SELECT g, count(*) AS c FROM tri GROUP BY g), " +
       "freq AS (SELECT g FROM (SELECT g, row_number() OVER " +
       s"(ORDER BY c DESC, g ASC) AS rn FROM gc) WHERE rn <= $RareFreqSetSize), " +
       "per AS (SELECT t.doc_id, CAST(count(*) AS BIGINT) AS n_trigrams, " +
       "CAST(count(*) FILTER (f.g IS NULL) AS BIGINT) AS n_rare " +
       "FROM tri t LEFT JOIN freq f ON t.g = f.g GROUP BY t.doc_id) " +
       "SELECT d.doc_id, coalesce(per.n_trigrams, 0) AS n_trigrams, " +
       "coalesce(per.n_rare, 0) AS n_rare, " +
       "coalesce(per.n_rare, 0) * 2 <= coalesce(per.n_trigrams, 0) AS keep " +
       "FROM documents d LEFT JOIN per ON d.doc_id = per.doc_id " +
       "ORDER BY d.doc_id"),

    "text_cooccur_pairs" ->
      ("WITH dt AS (SELECT doc_id, unnest(list_distinct(string_split(text, ' '))) AS w " +
       "FROM documents), " +
       "capped AS (SELECT doc_id, w FROM (SELECT doc_id, w, row_number() OVER " +
       s"(PARTITION BY doc_id ORDER BY w ASC) AS rn FROM dt) WHERE rn <= $CooccurCap) " +
       "SELECT a.w AS w1, b.w AS w2, CAST(count(*) AS BIGINT) AS support " +
       "FROM capped a JOIN capped b ON a.doc_id = b.doc_id AND a.w < b.w " +
       s"GROUP BY 1, 2 HAVING count(*) >= $CooccurMinSupport ORDER BY w1, w2")
  )
}
