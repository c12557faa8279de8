package graft

import org.apache.spark.sql.{Column, DataFrame, SparkSession}
import org.apache.spark.sql.expressions.Window
import org.apache.spark.sql.functions._
import org.apache.spark.sql.types._
import Det._
import Tables._

/** Near-duplicate detection and similarity search at scale (SURVEY.md §2.9
  * hard tail + BASELINE.json north-star: MinHash-LSH, SimHash, n-gram
  * Jaccard, embedding cosine — brute-force baseline and LSH-bucketed ANN).
  *
  * Determinism (rule D5): every hash is Spark's seeded xxhash64/murmur3 over
  * column values — no JVM hashCode, no per-partition state, no rand(). The
  * quadratic steps are always *blocked* (LSH band buckets, label blocks,
  * hyperplane buckets) so candidate generation is a hash-join, not a
  * cartesian product: this is what survives 100 TB, where an all-pairs join
  * is impossible. Float outputs carry no SQL oracle (fold order and libm
  * differences make cross-engine float hashing fragile — SURVEY §2.9);
  * scalatest verifies against in-test exact oracles instead.
  */
object Similarity {
  type Q = (SparkSession, String) => DataFrame

  val NumHashes = 16
  val BandSize = 4
  val NumBands: Int = NumHashes / BandSize

  /** Compiled vector kernels. A Catalyst higher-order-function dot product is
    * interpreted per element (~25× slower on the 2M-pair bench); these UDFs
    * run the same left-to-right double fold as a tight JVM loop, so results
    * are bit-identical to the HOF form and to the scalatest oracles.
    */
  private val distSqU = udf((a: Seq[Float], c: Seq[Double]) => {
    var i = 0; var acc = 0.0
    while (i < a.length) { val d = a(i).toDouble - c(i); acc += d * d; i += 1 }
    acc
  })

  private def dot(a: Array[Float], b: Array[Float]): Double = {
    var i = 0; var acc = 0.0
    while (i < a.length) { acc += a(i).toDouble * b(i).toDouble; i += 1 }
    acc
  }
  private def norm(a: Array[Float]): Double = math.sqrt(dot(a, a))

  /** Collect + broadcast one side of a pairwise-vector computation. At 100 TB
    * the broadcast side is the *small* set (queries / centroids / candidate
    * shard) while the big side streams through mapPartitions — the standard
    * block-nested-loop used by spark.ml; here both sides are the same small
    * table. Returned entries are sorted by vec_id for deterministic iteration.
    */
  private def collectVecs(s: SparkSession, d: String): Array[(Long, Array[Float], Double)] = {
    import s.implicits._
    embeddings(s, d).select(col("vec_id"), col("embedding"))
      .as[(Long, Array[Float])].collect()
      .sortBy(_._1).map { case (id, v) => (id, v, norm(v)) }
  }

  /** Distinct 3-token shingles per doc. `get()` (null OOB) instead of
    * `toks[i]`: under Spark 4's default ANSI mode a bare index throws
    * INVALID_ARRAY_INDEX for sub-3-token docs; concat_ws skips the nulls,
    * matching the DuckDB oracle's NULL-skipping concat_ws.
    */
  private def shingles(s: SparkSession, d: String): DataFrame =
    documents(s, d)
      .select(col("doc_id"), split(col("text"), " ").as("toks"))
      .select(col("doc_id"), explode(
        expr("transform(sequence(1, greatest(size(toks) - 2, 1)), " +
             "i -> concat_ws(' ', get(toks, i-1), get(toks, i), get(toks, i+1)))")).as("g"))
      .distinct()

  /** MinHash signatures: h_i(doc) = min over shingles of xxhash64(i, g). */
  private def minhashSigs(sh: DataFrame): DataFrame = {
    val aggs = (0 until NumHashes).map(i => min(xxhash64(lit(i), col("g"))).as(s"h$i"))
    sh.groupBy("doc_id").agg(aggs.head, aggs.tail: _*)
  }

  /** LSH band buckets → verified candidate pairs (exact Jaccard >= t). */
  def minhashCandidates(s: SparkSession, d: String, threshold: Double): DataFrame = {
    val sh = shingles(s, d)
    val sigs = minhashSigs(sh)
    val bands = sigs.select(col("doc_id"),
      posexplode(array((0 until NumBands).map(b =>
        xxhash64((b * BandSize until (b + 1) * BandSize).map(i => col(s"h$i")): _*)): _*))
        .as(Seq("band", "sig")))
    val cand = bands.as("x").join(bands.as("y"), Seq("band", "sig"))
      .where(col("x.doc_id") < col("y.doc_id"))
      .select(col("x.doc_id").as("da"), col("y.doc_id").as("db"))
      .distinct()
    // Verify candidates with exact Jaccard over shingle sets (integer
    // cross-multiplication — no float division in the predicate).
    val sz = sh.groupBy("doc_id").agg(count(lit(1)).as("n"))
    // Equi-join on the composite (db, g) key: the matcher hash-joins directly
    // to intersection rows instead of fanning out |sh(da)|×|sh(db)| per pair.
    val inter = cand
      .join(sh.withColumnRenamed("doc_id", "da"), "da")
      .join(sh.select(col("doc_id").as("db"), col("g")), Seq("db", "g"))
      .groupBy("da", "db").agg(count(lit(1)).as("inter"))
    val thrNum = math.round(threshold * 1000000).toInt
    inter
      .join(sz.withColumnRenamed("doc_id", "da").withColumnRenamed("n", "na"), "da")
      .join(sz.withColumnRenamed("doc_id", "db").withColumnRenamed("n", "nb"), "db")
      .where(col("inter") * 1000000L >= (col("na") + col("nb") - col("inter")) * thrNum)
      .select(col("da"), col("db"), col("inter"),
        (col("na") + col("nb") - col("inter")).as("uni"))
  }

  val queries: Map[String, Q] = Map(
    "dedup_near_minhash" -> ((s, d) => {
      // Cluster representative = min doc_id among self + verified neighbors.
      val pairs = minhashCandidates(s, d, 0.8)
      val neighbors = pairs.select(col("da").as("doc_id"), col("db").as("nb"))
        .union(pairs.select(col("db").as("doc_id"), col("da").as("nb")))
      documents(s, d).select(col("doc_id"))
        .join(neighbors, Seq("doc_id"), "left")
        .groupBy("doc_id")
        .agg(least(min(col("nb")), first(col("doc_id"))).as("rep_id"))
        .orderBy("doc_id")
    }),

    "dedup_cluster_cc" -> ((s, d) => {
      // TRUE transitive near-dup clusters: iterative min-label propagation
      // (connected components) over the LSH-verified pair graph. Each
      // iteration is one join+groupBy; labels converge in O(diameter) ≤
      // O(log n) rounds. persist() between rounds keeps lineage flat — the
      // standard shape for iterative algorithms on Spark at any scale. The
      // driver-side loop is control flow only (a convergence count), never
      // data.
      val pairs = minhashCandidates(s, d, 0.8).select("da", "db")
      val edges = pairs.union(pairs.select(col("db").as("da"), col("da").as("db")))
        .persist()
      var labels = documents(s, d)
        .select(col("doc_id"), col("doc_id").as("cluster_id")).persist()
      var changed = 1L
      var iter = 0
      while (changed > 0 && iter < 10) {
        // One aggregation carries both the new label (min over self +
        // neighbors) and the previous label (min over the tagged self rows),
        // so change detection costs no extra join — 2 jobs per round, not 4.
        val selfRows = labels.select(col("doc_id"), col("cluster_id"), lit(true).as("own"))
        val viaNeighbors = edges.join(labels, edges("db") === labels("doc_id"))
          .select(edges("da").as("doc_id"), col("cluster_id"), lit(false).as("own"))
        val next = selfRows.union(viaNeighbors)
          .groupBy("doc_id")
          .agg(min("cluster_id").as("cluster_id"),
            min(when(col("own"), col("cluster_id"))).as("prev"))
          .persist()
        changed = next.filter(col("cluster_id") =!= col("prev")).count()
        labels.unpersist()
        labels = next.select("doc_id", "cluster_id")
        iter += 1
      }
      edges.unpersist()
      labels.orderBy("doc_id")
    }),

    "dedup_levenshtein" -> ((s, d) => {
      // Edit-distance near-dup on (lang, source)-blocked pairs — blocking
      // bounds the quadratic pair space, and the 40-char prefix bounds each
      // O(n·m) distance computation. All-integer → oracle-checkable.
      val docs = documents(s, d)
        .select(col("doc_id"), col("lang"), col("source"),
          floor(col("n_chars") / 100).as("len_band"),
          substring(col("text"), 1, 40).as("prefix"))
      docs.as("a").join(docs.as("b"),
          col("a.lang") === col("b.lang") && col("a.source") === col("b.source") &&
          col("a.len_band") === col("b.len_band") &&
          col("a.doc_id") < col("b.doc_id"))
        .select(col("a.doc_id").as("da"), col("b.doc_id").as("db"),
          levenshtein(col("a.prefix"), col("b.prefix")).as("edit_dist"))
        .where(col("edit_dist") <= 10)
        .orderBy("da", "db")
    }),

    "dedup_ngram_jaccard" -> ((s, d) => {
      // Exact n-gram Jaccard >= 0.5 via shingle inverted index self-join —
      // candidate generation shuffles on the shingle (bounded fan-out), and
      // the predicate is all-integer, so this one IS oracle-checkable.
      val sh = shingles(s, d)
      val sz = sh.groupBy("doc_id").agg(count(lit(1)).as("n"))
      val inter = sh.as("a").join(sh.as("b"),
          col("a.g") === col("b.g") && col("a.doc_id") < col("b.doc_id"))
        .groupBy(col("a.doc_id").as("da"), col("b.doc_id").as("db"))
        .agg(count(lit(1)).as("inter"))
      inter
        .join(sz.select(col("doc_id").as("da"), col("n").as("na")), "da")
        .join(sz.select(col("doc_id").as("db"), col("n").as("nb")), "db")
        .where(col("inter") * 2 >= col("na") + col("nb") - col("inter"))
        .select(col("da"), col("db"), col("inter"),
          (col("na") + col("nb") - col("inter")).as("uni"))
        .orderBy("da", "db")
    }),

    "dedup_simhash" -> ((s, d) => {
      // 64-bit SimHash as explode + 64 codegen'd vote aggregates: hash each
      // token once, shuffle carries one partial (doc, 64 sums) row per
      // partition (map-side combine), and everything stays in whole-stage
      // codegen — the interpreted nested-HOF formulation was ~100× slower.
      val hashed = documents(s, d)
        .select(col("doc_id"), explode(split(col("text"), " ")).as("t"))
        .select(col("doc_id"), xxhash64(col("t")).as("h"))
      val votes = (0 until 64).map(i =>
        sum(when(expr(s"(shiftright(h, $i) & 1) = 1"), 1L).otherwise(-1L)).as(s"v$i"))
      // Assemble bits with | / shiftleft (not acc*2: ANSI mode would raise on
      // the signed-overflow of the top bit).
      val assemble = (0 until 64)
        .map(i => s"(CASE WHEN v$i > 0 THEN shiftleft(1L, ${63 - i}) ELSE 0L END)")
        .mkString(" | ")
      hashed.groupBy("doc_id").agg(votes.head, votes.tail: _*)
        .select(col("doc_id"), expr(assemble).as("simhash"))
        .orderBy("doc_id")
    }),

    "dedup_embedding_cosine" -> ((s, d) => {
      // Embedding near-dup: label blocks bound the pair space (the blocking
      // key at 100 TB would be an LSH bucket; labels play that role here).
      // Broadcast block-nested-loop: the blocked candidate set rides a
      // broadcast; the distributed side streams through mapPartitions.
      import s.implicits._
      val byLabel = embeddings(s, d).select(col("vec_id"), col("label"), col("embedding"))
        .as[(Long, Int, Array[Float])].collect()
        .groupBy(_._2).map { case (l, vs) =>
          l -> vs.sortBy(_._1).map { case (id, _, v) => (id, v, norm(v)) } }
      val bc = s.sparkContext.broadcast(byLabel)
      val pairs = embeddings(s, d).select(col("vec_id"), col("label"), col("embedding"))
        .as[(Long, Int, Array[Float])]
        .mapPartitions { it =>
          it.flatMap { case (ida, label, va) =>
            val na = norm(va)
            bc.value(label).iterator
              .filter(_._1 > ida)
              .map { case (idb, vb, nb) => (ida, idb, dot(va, vb) / (na * nb)) }
              // The synthetic fixtures carry no true near-dups (max
              // within-label cosine ≈ 0.5), so the threshold marks the top
              // ~0.1% tail; with real data this would be ~0.95.
              .filter(_._3 >= 0.35)
          }
        }
      pairs.toDF("va", "vb", "cos").orderBy("va", "vb")
    }),

    "sim_topk_cosine" -> ((s, d) => {
      // Brute-force half-triangular top-k — the exact baseline the ANN
      // variant is measured against. Broadcast + mapPartitions with a bounded
      // per-partition top-k (the global top-20 is a subset of the union of
      // per-partition top-20s), then a tiny global TakeOrdered. O(n²) flops
      // by construction — at scale use sim_ann_lsh — but no quadratic
      // materialization: only partitions×20 candidate rows ever shuffle.
      import s.implicits._
      val bc = s.sparkContext.broadcast(collectVecs(s, d))
      val k = 20
      implicit val ord: Ordering[(Double, Long, Long)] =
        Ordering.Tuple3(Ordering.Double.TotalOrdering.reverse, Ordering.Long, Ordering.Long)
      val local = embeddings(s, d).select(col("vec_id"), col("embedding"))
        .as[(Long, Array[Float])]
        .mapPartitions { it =>
          // head = max under ord = the WORST kept candidate (ord ranks better
          // tuples as smaller: cos desc, then ids asc).
          val best = scala.collection.mutable.PriorityQueue.empty[(Double, Long, Long)](ord)
          it.foreach { case (ida, va) =>
            val na = norm(va)
            bc.value.foreach { case (idb, vb, nb) =>
              if (idb > ida) {
                val c = dot(va, vb) / (na * nb)
                if (best.size < k) best.enqueue((c, ida, idb))
                else if (ord.lt((c, ida, idb), best.head)) { best.dequeue(); best.enqueue((c, ida, idb)) }
              }
            }
          }
          best.iterator.map { case (c, a, b) => (a, b, c) }
        }
      local.toDF("va", "vb", "cos")
        .orderBy(col("cos").desc, col("va").asc, col("vb").asc)
        .limit(k)
    }),

    "sim_knn_per_label" -> ((s, d) => {
      // Per-label centroid (exact decimal component sums → stable), then
      // top-5 nearest members per label by L2 distance to own centroid.
      val e = embeddings(s, d)
      val comps = e.select(col("vec_id"), col("label"),
        posexplode(col("embedding")).as(Seq("pos", "v")))
      val cent = comps.groupBy("label", "pos")
        .agg((sum(dec(col("v"), 27, 10)).cast(DoubleType) / count(lit(1))).as("c"))
        .groupBy("label")
        .agg(expr("transform(array_sort(collect_list(struct(pos, c))), x -> x.c)").as("cvec"))
      val dist = e.join(broadcast(cent), "label")
        .select(col("label"), col("vec_id"),
          distSqU(col("embedding"), col("cvec")).as("dist_sq"))
      val w = Window.partitionBy("label").orderBy(col("dist_sq").asc, col("vec_id").asc)
      dist.withColumn("rn", row_number().over(w))
        .where(col("rn") <= 5)
        .select("label", "vec_id", "rn")
        .orderBy("label", "rn")
    }),

    "sim_ann_lsh" -> ((s, d) => {
      // ANN scale path: 8 seeded pseudo-random hyperplanes → sign-bit bucket;
      // candidates = same-bucket pairs with the query set (vec_id < 10).
      // Deterministic: hyperplane components derive from xxhash64(plane, dim)
      // — no RNG state. The tiny 8×64 plane matrix is materialized once via
      // the same Spark expression and closed over by a compiled bucket UDF.
      val planeMat: Array[Array[Double]] = s.range(1).select(
        expr("""transform(sequence(0, 7), p ->
               |  transform(sequence(0, 63), j ->
               |    CAST(pmod(xxhash64(p, j), 2001L) - 1000L AS DOUBLE) / 1000.0D))""".stripMargin)
          .as("m")).head()
        .getAs[scala.collection.Seq[scala.collection.Seq[Double]]](0)
        .map(_.toArray).toArray
      val bucketU = udf((emb: Seq[Float]) => {
        var bucket = 0L
        var p = 0
        while (p < planeMat.length) {
          val pl = planeMat(p); var acc = 0.0; var i = 0
          while (i < pl.length) { acc += emb(i).toDouble * pl(i); i += 1 }
          bucket = bucket * 2L + (if (acc >= 0.0) 1L else 0L)
          p += 1
        }
        bucket
      })
      import org.apache.spark.sql.graft.VectorOps.{vec_dot, vec_norm}
      val e = embeddings(s, d).select(col("vec_id"), col("embedding"),
        bucketU(col("embedding")).as("bucket"), vec_norm(col("embedding")).as("nrm"))
      val q = e.where(col("vec_id") < 10)
        .select(col("vec_id").as("qid"), col("embedding").as("qe"),
          col("bucket").as("qb"), col("nrm").as("qn"))
      q.join(e, col("qb") === col("bucket") && col("qid") =!= col("vec_id"))
        .select(col("qid"), col("vec_id").as("nn"),
          (vec_dot(col("qe"), col("embedding")) / (col("qn") * col("nrm"))).as("cos"))
        .withColumn("rn", row_number().over(
          Window.partitionBy("qid").orderBy(col("cos").desc, col("nn").asc)))
        .where(col("rn") <= 10)
        .select("qid", "nn", "rn")
        .orderBy("qid", "rn")
    })
  )

  /** Integer-exact queries (Jaccard, Levenshtein) carry SQL oracles; float
    * and hash-bucket outputs are scalatest-validated instead.
    */
  val oracles: Map[String, String] = Map(
    "dedup_levenshtein" ->
      ("SELECT a.doc_id AS da, b.doc_id AS db, " +
       "CAST(levenshtein(substr(a.text, 1, 40), substr(b.text, 1, 40)) AS INT) AS edit_dist " +
       "FROM documents a JOIN documents b " +
       "ON a.lang = b.lang AND a.source = b.source " +
       "AND floor(a.n_chars / 100) = floor(b.n_chars / 100) AND a.doc_id < b.doc_id " +
       "WHERE levenshtein(substr(a.text, 1, 40), substr(b.text, 1, 40)) <= 10 " +
       "ORDER BY da, db"),

    "dedup_ngram_jaccard" ->
      ("WITH sh AS (SELECT DISTINCT doc_id, g FROM " +
       "(SELECT doc_id, unnest(list_transform(generate_series(1, greatest(len(ts) - 2, 1)), " +
       "i -> concat_ws(' ', ts[i], ts[i+1], ts[i+2]))) AS g " +
       "FROM (SELECT doc_id, string_split(text, ' ') AS ts FROM documents))), " +
       "sz AS (SELECT doc_id, count(*) AS n FROM sh GROUP BY doc_id), " +
       "p AS (SELECT a.doc_id AS da, b.doc_id AS db, count(*) AS inter FROM sh a " +
       "JOIN sh b ON a.g = b.g AND a.doc_id < b.doc_id GROUP BY 1, 2) " +
       "SELECT da, db, inter, sa.n + sb.n - inter AS uni FROM p " +
       "JOIN sz sa ON p.da = sa.doc_id JOIN sz sb ON p.db = sb.doc_id " +
       "WHERE inter * 2 >= sa.n + sb.n - inter ORDER BY da, db")
  )
}
