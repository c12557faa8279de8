package graft
import org.apache.spark.sql.{SaveMode, SparkSession}
import org.apache.spark.sql.functions._

/** Dev-only scale smoke: replicate the sf0.1 documents corpus k× (each copy
  * token-prefixed so copies are NOT near-dups of each other — shingle volume
  * grows k× while the dup structure stays realistic) into /tmp, then time
  * the dedup family on 1× vs k×. Evidence for DESIGN.md's "would this
  * survive 100×" claims — measured, not asserted. Not part of the driver
  * surface.
  */
object ProfScale {
  def main(args: Array[String]): Unit = {
    val k = if (args.nonEmpty) args(0).toInt else 4
    // args(1..): optional target filter, e.g. `ProfScale 16 graph_pagerank
    // dedup_cluster_cc` — lets the expensive 16x point measure just the
    // iterative tail without paying for the whole dedup family.
    val only = args.drop(1).toSet
    val base = "/root/testdata/sf0.1"
    val spark = SparkSession.builder().master("local[32]")
      .config("spark.sql.shuffle.partitions", "32")
      .config("spark.sql.session.timeZone", "UTC")
      .config("spark.sql.legacy.parquet.nanosAsLong", "true")
      .config("spark.sql.extensions", "org.apache.spark.sql.graft.GraftExtensions")
      .config("spark.ui.enabled", "false").getOrCreate()
    spark.sparkContext.setLogLevel("WARN")
    val big = Sources.tmpUnique(s"docs_x$k")
    val docs = Tables.documents(spark, base)
    val n = docs.agg(max("doc_id")).head().getLong(0) + 1
    (0 until k).map { i =>
      val prefix = s"copy$i " // n_chars adjusts by the ACTUAL prefix length
      docs.select((col("doc_id") + lit(i * n)).as("doc_id"),
        concat(lit(prefix), col("text")).as("text"),
        col("lang"), col("source"),
        (col("n_chars") + lit(prefix.length)).as("n_chars"))
    }.reduce(_ unionByName _)
      .write.mode(SaveMode.Overwrite).parquet(s"$big/documents.parquet")
    // orders/lineitem replicate k× too (round 5): order keys offset so the
    // join graph grows, CUSTOMER keys offset so pagerank's node/edge count
    // actually scales (same-key copies would collapse in the DISTINCT edge
    // list), and prices shift per copy by MORE than the global price spread
    // (~600k at sf0.1) so each copy occupies a disjoint price band — a
    // small shift would merely translate the width-100 match window across
    // the dense cross-copy price-difference distribution and matches would
    // still grow k² from duplication; disjoint bands make them grow ~k.
    val ord = Tables.orders(spark, base)
    val li = Tables.lineitem(spark, base)
    val nOrd = ord.agg(max("o_orderkey")).head().getLong(0) + 1
    val nCust = ord.agg(max("o_custkey")).head().getLong(0) + 1
    val priceBand = 1000000.0
    (0 until k).map { i =>
      ord.select((col("o_orderkey") + lit(i * nOrd)).as("o_orderkey"),
        (col("o_custkey") + lit(i * nCust)).as("o_custkey"),
        col("o_orderstatus"),
        (col("o_totalprice") + lit(i * priceBand)).as("o_totalprice"),
        col("o_orderdate"), col("o_orderpriority"))
    }.reduce(_ unionByName _)
      .write.mode(SaveMode.Overwrite).parquet(s"$big/orders.parquet")
    // l_partkey offsets per copy (round 6): with shared part keys the
    // triangle graph DENSIFIES instead of scaling — w=1 co-purchase pairs
    // appear once per copy and cross the >= 2 threshold at k >= 2 (measured:
    // 1.9M triangles at 4×). Disjoint part keys give k independent copies
    // of the graph — edges and triangles grow ~k, the right linearity probe.
    val nPart = li.agg(max("l_partkey")).head().getLong(0) + 1
    (0 until k).map { i =>
      li.withColumn("l_orderkey", col("l_orderkey") + lit(i * nOrd))
        .withColumn("l_partkey", col("l_partkey") + lit(i * nPart))
        .withColumn("l_extendedprice", col("l_extendedprice") + lit(i * priceBand))
    }.reduce(_ unionByName _)
      .write.mode(SaveMode.Overwrite).parquet(s"$big/lineitem.parquet")
    // embeddings replicate k× with offset vec_ids (round 6): the PQ ADC
    // scan and the ANN candidate sets grow with the corpus while the query
    // set stays fixed at vec_id < 10 — exactly the scale asymmetry the
    // index paths exist for. Copies are identical vectors; timing is the
    // subject, tie-ranking is deterministic either way.
    val emb = Tables.embeddings(spark, base)
    val nVec = emb.agg(max("vec_id")).head().getLong(0) + 1
    (0 until k).map { i =>
      emb.withColumn("vec_id", col("vec_id") + lit(i * nVec))
    }.reduce(_ unionByName _)
      .write.mode(SaveMode.Overwrite).parquet(s"$big/embeddings.parquet")
    // events replicate k× with offset event/user ids so the keyed-window
    // family (cdc compaction, gaps-islands) scales in keys, not rows-per-key
    val ev = Tables.events(spark, base)
    val nEvt = ev.agg(max("event_id")).head().getLong(0) + 1
    val nUid = ev.agg(max("user_id")).head().getLong(0) + 1
    (0 until k).map { i =>
      ev.withColumn("event_id", col("event_id") + lit(i * nEvt))
        .withColumn("user_id", col("user_id") + lit(i * nUid))
    }.reduce(_ unionByName _)
      .write.mode(SaveMode.Overwrite).parquet(s"$big/events.parquet")
    Seq("region", "nation", "customer", "supplier", "part").foreach { t =>
      spark.read.parquet(s"$base/$t.parquet")
        .write.mode(SaveMode.Overwrite).parquet(s"$big/$t.parquet")
    }
    def time(label: String)(f: => Long): Unit = {
      val t0 = System.nanoTime(); val rows = f
      System.err.println(f"[scale] $label: ${(System.nanoTime() - t0) / 1e9}%.2f s ($rows rows)")
    }
    val targets = Seq("dedup_exact", "dedup_near_minhash", "dedup_ngram_jaccard",
      "dedup_cluster_jaccard", "dedup_cluster_cc", "dedup_simhash_pairs",
      "text_decontaminate", "text_tfidf_topk",
      // round-5 heavies: iterative graph, retrieval scoring, packing,
      // chunking, and the bucketed pure range join
      "graph_pagerank", "text_bm25_topk", "pack_sequences", "chunk_overlap",
      "join_range_bucketed",
      // round 6: the windowed shared-passage screen (same inverted-index
      // join family as ngram_jaccard, longer windows)
      "dedup_substring",
      // round-6 continuation: PQ's ADC scan (corpus k×, queries fixed),
      // triangle counting (per-copy l_partkey offsets above give k DISJOINT
      // copies of the co-purchase graph — edges and triangles grow ~k, the
      // right linearity probe), and the keyed-window pair
      "sim_ann_pq", "graph_triangle_count", "etl_cdc_apply",
      "window_gaps_islands", "join_bloom_prefilter",
      // round 7: the grid interval join (replicated orders widen the B
      // side; the W-cell replication factor is the constant under test),
      // the two-big-side full-outer diff, and the pruned+compressed ANN
      // composite (corpus k x, query set fixed - the IVF-PQ scale claim)
      "join_interval_overlap", "etl_snapshot_diff", "sim_ann_ivfpq")
      .filter(q => only.isEmpty || only(q))
    // warm BOTH corpora once with cheap queries touching EVERY table the
    // targets read — documents AND orders/lineitem (file listing + footer
    // reads must not land asymmetrically inside the first timed @kx entry)
    for (dir <- Seq(base, big)) {
      SparkEntry.queries("dedup_exact")(spark, dir).count()
      Tables.orders(spark, dir).count()
      Tables.lineitem(spark, dir).count()
      Tables.events(spark, dir).count()
      Tables.embeddings(spark, dir).count()
    }
    targets.foreach { q =>
      time(s"$q @1x")(SparkEntry.queries(q)(spark, base).count())
      time(s"$q @${k}x")(SparkEntry.queries(q)(spark, big).count())
    }
    spark.stop()
  }
}
