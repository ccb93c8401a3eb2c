package graft

/** Plan audits: assert the physical plans are the ones we designed —
  * dims broadcast, candidate generation never degenerates to a cross
  * product, and the recency predicate reaches the parquet scan. These pin
  * the 100 TB properties that row-count correctness cannot see (a
  * CartesianProduct is "correct" and fatal at scale).
  */
class ExplainAuditSpec extends SparkSpec {

  private val sf = "/root/testdata/sf0.001"

  private def plan(name: String): String =
    SparkEntry.queries(name)(spark, sf).queryExecution.executedPlan.toString

  test("q5_join_agg: dimension joins broadcast; no cartesian product") {
    val p = plan("q5_join_agg")
    assert(p.contains("BroadcastHashJoin"))
    assert(!p.contains("CartesianProduct"))
  }

  test("e1_pipeline + j5: dims broadcast at RUNTIME via AQE (no hard hint); no cartesian") {
    // The headline/fundamentals sides carry no broadcast() hint (so 100×
    // key cardinality degrades to a shuffle join, not an OOM) — the
    // broadcast must therefore appear in the FINAL adaptive plan, which
    // only exists after execution.
    for (q <- Seq("e1_pipeline", "j5_attach_provenance")) {
      val df = SparkEntry.queries(q)(spark, sf)
      df.collect() // withAction on THIS QueryExecution finalizes its AQE plan
      val p = df.queryExecution.executedPlan.toString
      assert(p.contains("isFinalPlan=true"), s"$q did not finalize under AQE")
      assert("BroadcastHashJoin".r.findAllMatchIn(p).size >=
        (if (q == "e1_pipeline") 2 else 1), s"$q lost the runtime broadcast:\n$p")
      assert(!p.contains("CartesianProduct"))
    }
  }

  test("banded/bucketed candidate generation never plans a cross product") {
    for (q <- Seq("dedup_minhash", "dedup_incremental", "dedup_ngram_jaccard",
        "dedup_embedding", "sim_lsh_ann", "sim_ivf_ann", "sim_lsh_mp_ann",
        "sim_hard_negatives", "dedup_exact", "dedup_containment",
        "st5_neardedup_scan", "st9_paragraph_scan", "st10_containment_scan",
        "st17_binary_scan", "e8_ingest_screen", "mm_frame_dedup",
        "e9_av_curation", "mm_video_neardup", "st19_video_scan",
        "mm_profile", "mm_split_leakage", "mm_frame_neardup",
        "mm_audio_neardup")) {
      val p = plan(q)
      assert(!p.contains("CartesianProduct"), s"$q plans a CartesianProduct")
      assert(!p.contains("BroadcastNestedLoopJoin"), s"$q plans a BNLJ")
    }
    // sim_topk is the deliberate exception: brute force IS the broadcast
    // nested-loop baseline the approximate paths are measured against.
    assert(plan("sim_topk").contains("BroadcastNestedLoopJoin"))
  }

  test("filtered ANN: admission is a semi-join (doc_ids only) and the lang predicate is pushed to parquet") {
    val p = plan("sim_filtered_ann")
    assert(p.contains("LeftSemi"), s"admission lost the semi-join:\n$p")
    // the predicate reaches the documents scan — at 100 TB this is the
    // row-group prune / partition prune, not a post-scan filter
    assert(p.contains("PushedFilters") &&
      p.matches("(?s).*PushedFilters: \\[[^\\]]*EqualTo\\(lang,.*"),
      s"lang predicate not pushed to the documents scan:\n$p")
  }

  test("binary banded ANN: equi-join candidates, query bands broadcast, bounded TopK rank") {
    import org.apache.spark.sql.functions.col
    val emb = Tables.embeddings(spark, sf)
      .select(col("vec_id").as("id"), col("embedding").as("vec"))
    val banded = graft.operators.Similarity.topKBinaryBanded(
      emb.filter(col("id") < 5), emb, k = 3,
      bands = PipelineConfig.Default.binaryBands, rerank = 20)
    val p = banded.queryExecution.executedPlan.toString
    assert(!p.contains("CartesianProduct"), s"banded binary went all-pairs:\n$p")
    assert(!p.contains("BroadcastNestedLoopJoin"), s"banded binary plans a BNLJ:\n$p")
    assert(p.contains("BroadcastHashJoin"), s"query bands not broadcast:\n$p")
    assert(!p.contains("Window"), s"banded binary ranks through a window:\n$p")
    assert(p.contains("ObjectHashAggregate"), s"bounded TopK aggregate missing:\n$p")
    // the raw Hamming scan is the deliberate BNLJ baseline the banded
    // path is measured against, same contract as sim_topk vs sim_lsh_ann
    val raw = graft.operators.Similarity.topKBinary(
      emb.filter(col("id") < 5), emb, k = 3)
    assert(raw.queryExecution.executedPlan.toString
      .contains("BroadcastNestedLoopJoin"))
  }

  test("j6_fuzzy_join: distinct-collapse feeds an EQUI-join on the block key, never all-pairs") {
    val p = plan("j6_fuzzy_join")
    assert(!p.contains("CartesianProduct"), s"fuzzy linkage went all-pairs:\n$p")
    assert(!p.contains("BroadcastNestedLoopJoin"), s"fuzzy linkage plans a BNLJ:\n$p")
    // the name<name / length / levenshtein predicates stay post-join
    // filters on an equi-join keyed by the block — visible as a join
    // whose key set includes `block`
    assert(p.contains("block"), s"block key missing from the join:\n$p")
    // the quadratic stage runs over the DISTINCT name domain: EACH join
    // subtree carries its own partial+final distinct-collapse pair
    // (4 HashAggregates total — the subtrees don't exchange-reuse here
    // because the build side materializes through a BroadcastExchange),
    // so a collapse pushed after the join or dropped on one side fails
    assert("HashAggregate".r.findAllMatchIn(p).size >= 4,
      s"distinct-collapse missing from a join subtree:\n$p")
    // the hot-block cap rides each subtree as a window count over the
    // block key — the join's own partitioning, no extra quadratic stage
    assert("Window".r.findAllMatchIn(p).size >= 2,
      s"hot-block cap window missing from a join subtree:\n$p")
  }

  test("ANN top-k ranks via a partial-aggregated ObjectHashAggregate, not a window sort") {
    for (q <- Seq("sim_topk", "sim_lsh_ann", "sim_ivf_ann", "sim_sq_ann",
        "sim_pq_ann", "sim_lsh_mp_ann")) {
      val p = plan(q)
      assert(!p.contains("Window"), s"$q still ranks through a window:\n$p")
      assert(p.contains("ObjectHashAggregate"), s"$q lost the aggregate rank")
      // partial + final pair => map-side combine caps the exchange at
      // k rows per partition per query
      assert(p.contains("partial_topkbyscore"), s"$q lost partial aggregation")
    }
  }

  test("minhash banding partial-aggregates the exploded shingles before the id exchange") {
    // audited at the operator level: the dedup queries now feed banding
    // from a lazily-checkpointed signatures frame, which hides the
    // aggregate behind an RDD boundary in the QUERY plan — the partial
    // aggregation lives in Dedup.signatures, so pin it there
    val p = operators.Dedup
      .signatures(Tables.documents(spark, sf), "doc_id", "text", 12)
      .queryExecution.executedPlan.toString
    assert(p.contains("partial_min"), s"banding lost map-side combine:\n$p")
    assert(!plan("dedup_minhash").contains("CartesianProduct"))
  }

  test("centroid scoring broadcasts the k-row centroid side; assignment is one hash aggregate") {
    val p = plan("sim_centroids")
    // the vec x centroid product must be the broadcast nested-loop shape
    // (centroids are k rows at ANY corpus size); the argmax must be a
    // partial-aggregated max_by, never a per-vector window sort
    assert(p.contains("BroadcastNestedLoopJoin"), s"centroids not broadcast:\n$p")
    assert(!p.contains("Window"), s"argmax fell back to a window:\n$p")
    assert(p.contains("partial_max_by") || p.contains("partial_maxby"),
      s"assignment lost map-side combine:\n$p")
  }

  test("tfidf broadcasts the vocabulary-df and corpus-count dims") {
    val p = plan("ta_tfidf")
    // doc-keyed joins may shuffle (they carry the corpus); the |vocab|-row
    // df table and the 1-row count must not
    assert("BroadcastHashJoin".r.findAllMatchIn(p).size >= 1, p)
    assert(p.contains("BroadcastNestedLoopJoin"), s"corpus count not broadcast:\n$p")
  }

  test("kmeans broadcasts centroids every pass; corpus never shuffles to score") {
    val p = plan("sim_kmeans")
    // both Lloyd passes broadcast their k-row centroid side against a
    // partition-local corpus scan — a non-broadcast cross product here
    // would shuffle the corpus per iteration
    assert("BroadcastNestedLoopJoin".r.findAllMatchIn(p).size >= 2, p)
    assert(!p.contains("CartesianProduct"), p)
  }

  test("lm fluency broadcasts the per-language totals; no cartesian") {
    val p = plan("ta_lm_fluency")
    // the |langs|-row totals join is hinted broadcast; the |vocab|-row LM
    // scoring join may be left to AQE (it carries a corpus-derived side)
    assert("BroadcastHashJoin".r.findAllMatchIn(p).size >= 1, p)
    assert(!p.contains("CartesianProduct"), p)
  }

  test("grouping-sets profile is a single Expand pass, not three scans") {
    val p = plan("ta_grouping_sets")
    assert("Expand".r.findAllMatchIn(p).size == 1, p)
    assert("Scan parquet".r.findAllMatchIn(p).size == 1,
      s"grouping sets re-scans the corpus:\n$p")
  }

  test("global ordered limits compile to TakeOrderedAndProject, not a full sort") {
    for (q <- Seq("q3_top_orders", "ta_ngram_lm")) {
      val p = plan(q)
      assert(p.contains("TakeOrderedAndProject"), s"$q lost the bounded top-k:\n$p")
    }
    // q3 has no window upstream, so NO sort of any kind may survive
    // (ta_ngram_lm keeps the per-doc sort its lead() window requires)
    assert(!plan("q3_top_orders").contains("Sort "),
      s"q3 plans a full sort:\n${plan("q3_top_orders")}")
  }

  test("rank-1 recency picks compile to WindowGroupLimit (top-1 kept per partition pre-shuffle)") {
    for (q <- Seq("a1_top1_recency", "a2_top1_string_recency")) {
      val p = plan(q)
      assert(p.contains("WindowGroupLimit"),
        s"$q ranks without the group-limit optimization:\n$p")
    }
  }

  test("streaming-shadow scans keep their single-pass shapes") {
    // st4: first-seen dedup is ONE hash aggregate (partial min_by) — no
    // window, no join; st7: bars are ONE aggregate on (key, window)
    for (q <- Seq("st4_dedup_scan", "st7_bars_scan")) {
      val p = plan(q)
      assert(!p.contains("Window"), s"$q ranks through a window:\n$p")
      assert(p.contains("partial_min_by") || p.contains("partial_minby"),
        s"$q lost map-side combine:\n$p")
      assert("Exchange".r.findAllMatchIn(p).size == 1,
        s"$q should shuffle exactly once:\n$p")
    }
    // st6: the funnel scan's only exchange is the keyed shuffle whose
    // sort feeds flatMapSortedGroups — no extra sort-stage beyond it
    val p6 = plan("st6_funnel_scan")
    assert("Exchange".r.findAllMatchIn(p6).size == 1,
      s"st6 should shuffle exactly once:\n$p6")
  }

  test("reconciliation joins narrow (key, hash) projections, never full rows") {
    val p = plan("qa_reconcile_diff")
    assert(p.contains("FullOuter"), s"reconcile lost the full-outer join:\n$p")
    assert(!p.contains("CartesianProduct") && !p.contains("BroadcastNestedLoopJoin"))
    // the events columns not in the hash (ts, props) must be pruned at scan
    for (dead <- Seq("props", "ts"))
      assert(!p.contains(s"$dead#"), s"unused column $dead still read:\n$p")
  }

  test("batched model inference is a zero-exchange narrow map") {
    // the mapPartitions seam must stay a pure per-partition map: no
    // shuffle, no sort — at 100 TB the inference stage's only cost is
    // the model forward pass itself
    val p = plan("m1_sentiment_batched")
    assert(!p.contains("Exchange"), s"inference stage shuffles:\n$p")
    assert(!p.contains("Sort "), s"inference stage sorts:\n$p")
    assert(p.contains("MapPartitions"), s"lost the mapPartitions seam:\n$p")
  }

  test("rolling correlation windows over bucket partials, never the fact") {
    // shape: partial-agg on the scan → ONE exchange to (key, bucket)
    // groups → ONE exchange to the (key) window. The window input is
    // |types × active hours| rows of six longs — a third exchange or a
    // window directly over events would be the 100 TB failure mode.
    val p = plan("stats_rolling_corr")
    assert("Exchange".r.findAllMatchIn(p).size == 2,
      s"rolling corr should shuffle exactly twice (agg, window):\n$p")
    assert(p.contains("partial_count") || p.contains("partial_sum"),
      s"moment aggregate lost map-side combine:\n$p")
    assert("Scan parquet".r.findAllMatchIn(p).size == 1,
      s"rolling corr re-scans events:\n$p")
  }

  test("SQ calibration pushes its id bound into the parquet scan (bounded read, one scan)") {
    // the quantization scale is derived from a calibration SAMPLE, not a
    // full-corpus pre-pass (VERDICT r8 #2); boundedness is only real if
    // the id predicate prunes row groups at the scan
    val p = graft.operators.Similarity.sqScaleCalibration(
        Tables.embeddings(spark, sf), "vec_id", "embedding", 256L)
      .queryExecution.executedPlan.toString
    assert(p.contains("LessThan(vec_id,256)"), s"calibration bound not pushed:\n$p")
    assert("Scan parquet".r.findAllMatchIn(p).size == 1, s"calibration re-scans:\n$p")
    assert(!p.contains("Exchange hashpartitioning"), s"calibration shuffles rows:\n$p")
  }

  test("bin-decomposed range join stays an equi-join even with broadcast disabled") {
    // the whole point of the bin decomposition: `p BETWEEN lo AND hi`
    // alone can only plan as a nested loop once the interval side
    // outgrows broadcast — on the bin key it must stay a shuffle
    // hash/merge join at ANY interval-side size
    spark.conf.set("spark.sql.autoBroadcastJoinThreshold", "-1")
    try for (q <- Seq("rj_price_bands", "rj_band_overlap")) {
      val p = plan(q)
      assert(!p.contains("BroadcastNestedLoopJoin") && !p.contains("CartesianProduct"),
        s"$q degenerated to a nested loop:\n$p")
      assert(p.contains("SortMergeJoin") || p.contains("ShuffledHashJoin"),
        s"$q lost the bin equi-join:\n$p")
    } finally spark.conf.unset("spark.sql.autoBroadcastJoinThreshold")
  }

  test("z-order keying is a zero-exchange narrow projection") {
    val p = plan("ev_zorder")
    assert(!p.contains("Exchange"), s"z-keying shuffles:\n$p")
    assert("Scan parquet".r.findAllMatchIn(p).size == 1, s"z-keying re-scans:\n$p")
  }

  test("chunking is one narrow codegen span: zero exchanges, one scan, bounded Generate") {
    val p = plan("ta_chunk")
    assert(!p.contains("Exchange"), s"chunking shuffles:\n$p")
    assert("Scan parquet".r.findAllMatchIn(p).size == 1, s"chunking re-scans:\n$p")
    assert(p.contains("Generate"), s"chunking lost the explode fan-out:\n$p")
  }

  test("shard packing shuffles the fact ONCE; offsets stay broadcast") {
    // two-phase prefix sum: bucket totals + their window run on the tiny
    // bucket table (2 small exchanges), offsets come back as a
    // BroadcastExchange, and the fact's only exchange feeds the bounded
    // (part, bucket) window — 4 Exchange nodes total, exactly one
    // carrying the fact. A shuffled offsets join or a whole-part window
    // would be the 100 TB failure mode.
    val p = plan("ta_shard_pack")
    assert("Exchange".r.findAllMatchIn(p).size == 4,
      s"shard packing changed its exchange shape:\n$p")
    assert(p.contains("BroadcastExchange"), s"offsets not broadcast:\n$p")
    assert(p.contains("BroadcastHashJoin"), s"offsets join not broadcast:\n$p")
    // phase-1 totals read only the 3 narrow columns, not the corpus text
    assert(!p.contains("text#"), s"shard packing reads document text:\n$p")
  }

  test("sessionization plans ONE exchange shared by both windows and the aggregate") {
    val p = plan("ev_sessionize")
    assert("Exchange".r.findAllMatchIn(p).size == 1,
      s"sessionize should shuffle exactly once:\n$p")
  }

  test("column pruning reaches the scans below AsOfJoin") {
    import org.apache.spark.sql.functions._
    // wide inputs, narrow output: only the selected + join columns may
    // survive into ReadSchema (generic ColumnPruning sees the node's
    // key/time expressions because they are declared plan fields)
    val left = Tables.events(spark, sf)
      .select(col("user_id"), col("ts"), col("value"), col("event_type"), col("props"))
    val right = Tables.orders(spark, sf)
      .select(col("o_custkey"), col("o_orderdate").cast("timestamp").as("o_ts"),
        col("o_totalprice"), col("o_orderkey"), col("o_orderstatus"))
    val p = graft.operators.AsOf.asOfJoin(left, right, "user_id", "o_custkey",
        "ts", "o_ts", java.time.Duration.ofDays(30))
      .select(col("user_id"), col("ts"), col("o_totalprice"))
      .queryExecution.executedPlan.toString
    for (dead <- Seq("props", "event_type", "o_orderstatus", "o_orderkey"))
      assert(!p.contains(dead), s"unused column $dead still read:\n$p")
  }

  test("ta_decontam: no inferred size() filter re-evaluates the explode input") {
    // InferFiltersFromGenerate is excluded in every session builder: it
    // inlines the computed shingle array into a size()>0 filter BELOW
    // the Generate, re-evaluating the md5 transform ~8x per row
    // (measured 86s -> 0.8s). Guard the exclusion.
    val lp = SparkEntry.queries("ta_decontam")(spark, sf)
      .queryExecution.optimizedPlan.toString
    // the legit size() lives inside the shingle Project; the pathology
    // is a Filter evaluating size(<computed array>) below the Generate
    assert(!lp.contains("Filter (size("), s"inferred generate filter is back:\n$lp")
  }

  test("AQE splits a skewed sort-merge join at runtime (skew=true)") {
    import org.apache.spark.sql.functions._
    val conf = Map(
      "spark.sql.autoBroadcastJoinThreshold" -> "-1",          // force SMJ
      "spark.sql.shuffle.partitions" -> "8",                   // median needs spread
      "spark.sql.adaptive.skewJoin.skewedPartitionThresholdInBytes" -> "10KB",
      "spark.sql.adaptive.advisoryPartitionSizeInBytes" -> "10KB",
      "spark.sql.adaptive.skewJoin.skewedPartitionFactor" -> "2")
    conf.keys.foreach(k => spark.conf.set(k, conf(k)))
    try {
      // 99% of left rows share one key; right is uniform. No operator
      // above the join may require the join's partitioning (a downstream
      // groupBy would veto the split).
      val left = spark.range(100000).select(
        when(col("id") % 100 =!= 0, lit(7L)).otherwise(col("id")).as("k"),
        col("id").as("v"))
      val right = spark.range(200).select(col("id").as("k"), col("id").as("rv"))
      val joined = left.join(right, "k")
      joined.collect() // withAction on THIS QueryExecution finalizes its AQE plan
      val p = joined.queryExecution.executedPlan.toString
      assert(p.contains("skew=true"), s"AQE did not split the skewed partition:\n$p")
    } finally conf.keys.foreach(spark.conf.unset)
  }

  test("runtime bloom filter prunes the fact side of a selective shuffle join") {
    import org.apache.spark.sql.functions._
    val conf = Map(
      "spark.sql.autoBroadcastJoinThreshold" -> "-1",          // keep it a shuffle join
      "spark.sql.optimizer.runtime.bloomFilter.applicationSideScanSizeThreshold" -> "0",
      "spark.sql.optimizer.runtime.bloomFilter.creationSideThreshold" -> "100MB")
    conf.keys.foreach(k => spark.conf.set(k, conf(k)))
    try {
      // selective filter on the build side -> Catalyst injects a bloom
      // filter on the probe side so fact rows that cannot match are
      // dropped BEFORE the shuffle
      val p = Tables.lineitem(spark, sf)
        .join(Tables.orders(spark, sf).filter(col("o_orderpriority") === "1-URGENT"),
          col("l_orderkey") === col("o_orderkey"))
        .queryExecution.optimizedPlan.toString
      assert(p.contains("might_contain"), s"no runtime bloom filter injected:\n$p")
    } finally conf.keys.foreach(spark.conf.unset)
  }

  test("recency window pushes ts bounds into the parquet scan") {
    val p = Tables.eventsInWindow(spark, sf, "2024-01-15 00:00:00", 72)
      .queryExecution.executedPlan.toString
    assert(p.contains("GreaterThanOrEqual(ts") && p.contains("LessThanOrEqual(ts"),
      s"ts bounds not pushed:\n$p")
  }

  test("st2 interval join is a hash join on the key, not a pure theta join") {
    val p = plan("st2_interval_join")
    assert(!p.contains("CartesianProduct") && !p.contains("BroadcastNestedLoopJoin"))
  }

  test("hot-bucket guard rides the band join's partitioning — no extra exchange or sort") {
    // In the shuffle-join regime (the 100 TB shape — bucket sides too
    // big to broadcast), the guard's window partitions by the same
    // (band_id, band_key) the bucket self-join hashes and sorts on, so
    // EnsureRequirements reuses ONE exchange+sort per side for both
    // operators: capped and uncapped plans must be shuffle-identical.
    // (Under a broadcast band join — tiny corpora only — the window
    // does add the hash exchange the broadcast had elided; irrelevant
    // at any scale where the guard matters.)
    import spark.implicits._
    spark.conf.set("spark.sql.autoBroadcastJoinThreshold", "-1")
    try {
      val docs = (1L to 40L).map(i => (i, s"token$i repeated words here and there $i"))
        .toDF("doc_id", "text")
      def shape(maxBucket: Int): (Int, Int) = {
        val p = operators.Dedup.minhashPairs(docs, "doc_id", "text",
          numBands = 4, rowsPerBand = 3, threshold = 0.3, maxBucket = maxBucket)
          .queryExecution.executedPlan.toString
        ("Exchange hashpartitioning".r.findAllMatchIn(p).size,
          "Sort \\[".r.findAllMatchIn(p).size)
      }
      assert(shape(10) == shape(Int.MaxValue))
    } finally spark.conf.unset("spark.sql.autoBroadcastJoinThreshold")
  }

  test("cosine hot-cell window rides the bucket join's partitioning — capped and uncapped plans shuffle-identical") {
    // Same argument as the minhash guard: the cell-count window
    // partitions by the exact (bucket, cluster_id) keys the pair
    // self-join hashes and sorts on, so in the shuffle-join regime
    // EnsureRequirements reuses one exchange+sort per side.
    import spark.implicits._
    spark.conf.set("spark.sql.autoBroadcastJoinThreshold", "-1")
    try {
      val corpus = (1L to 40L)
        .map(i => (i, Seq(i.toDouble, 1.0, -1.0, 0.5), (i % 3).toInt))
        .toDF("id", "vecd", "cluster_id")
      def shape(maxCell: Int): (Int, Int) = {
        val p = operators.Similarity.cosineDedupPairs(corpus, threshold = 0.9,
            numPlanes = 4, dim = 4, extraKeys = Seq("cluster_id"),
            maxCell = maxCell)
          .queryExecution.executedPlan.toString
        ("Exchange hashpartitioning".r.findAllMatchIn(p).size,
          "Sort \\[".r.findAllMatchIn(p).size)
      }
      assert(shape(5) == shape(Int.MaxValue))
    } finally spark.conf.unset("spark.sql.autoBroadcastJoinThreshold")
  }

  test("dedup_semantic: pair join keyed on (bucket, cluster_id); Lloyd subtree staged once") {
    val p = plan("dedup_semantic")
    assert(!p.contains("CartesianProduct"), s"semantic dedup went all-pairs:\n$p")
    // candidate generation is an equi-join on BOTH the LSH bucket and
    // the k-means cluster — pair volume bounded per (bucket ∩ cluster)
    // cell, and further by the hot-cell cap
    assert("Join \\[?bucket#\\d+, cluster_id#\\d+".r.findFirstIn(p).isDefined,
      s"pair join not keyed on (bucket, cluster_id):\n$p")
    // the 2-pass Lloyd assignment is localCheckpoint-staged: both its
    // consumers (the pair join and the final keep flag) read the RDD
    // boundary instead of re-running k-means — no BroadcastNestedLoopJoin
    // (Lloyd's centroid cross join) may appear in the OUTER plan
    assert("Scan ExistingRDD".r.findAllMatchIn(p).size >= 2,
      s"Lloyd subtree not staged for both consumers:\n$p")
    assert(!p.contains("BroadcastNestedLoopJoin"),
      s"k-means re-runs inside the outer plan:\n$p")
  }

  test("e6_pretrain_corpus: the chained flagship plans no cross product and keeps the pack broadcast") {
    val p = plan("e6_pretrain_corpus")
    assert(!p.contains("CartesianProduct"), s"e6 went all-pairs:\n$p")
    assert(!p.contains("BroadcastNestedLoopJoin"), s"e6 plans a BNLJ:\n$p")
    // the two-phase pack's offsets come back as a broadcast, not a shuffle
    assert(p.contains("BroadcastHashJoin"), s"pack offsets lost the broadcast:\n$p")
  }

  test("ta_source_cap: per-domain trim via bounded aggregate, never a per-domain window sort") {
    val p = plan("ta_source_cap")
    assert(!p.contains("Window"), s"cap ranks through a window:\n$p")
    assert(p.contains("ObjectHashAggregate"), s"cap lost the bounded aggregate:\n$p")
  }

  test("st8_quota_scan: arrival-order quota via bounded aggregate, never a per-source window sort") {
    val p = plan("st8_quota_scan")
    assert(!p.contains("Window"), s"quota ranks through a window:\n$p")
    assert(p.contains("ObjectHashAggregate"), s"quota lost the bounded aggregate:\n$p")
  }

  test("st11_spans_scan: first-arrival via min(struct) aggregate; no cartesian; islands window per doc only") {
    val p = plan("st11_spans_scan")
    assert(!p.contains("CartesianProduct") && !p.contains("BroadcastNestedLoopJoin"),
      s"window-hash join-back degenerated:\n$p")
    // min-(ts, doc, p) per hash is an aggregate + equi-join-back (the
    // st9 shape); the only windows are the per-DOC island merges
    assert(p.contains("min(struct"), s"first-arrival lost the min-struct aggregate:\n$p")
  }

  test("st12_mix_scan: frozen-target admission via bounded aggregate + broadcast dim, never a window") {
    val p = plan("st12_mix_scan")
    assert(!p.contains("Window"), s"mix admission ranks through a window:\n$p")
    assert(p.contains("ObjectHashAggregate"), s"admission lost the bounded aggregate:\n$p")
    assert(p.contains("BroadcastHashJoin"), s"frozen target dim lost the broadcast:\n$p")
  }

  test("e4_curation_full: canonical-domain staging plans no cartesian and keeps the decontam probe broadcast") {
    val p = plan("e4_curation_full")
    assert(!p.contains("CartesianProduct") && !p.contains("BroadcastNestedLoopJoin"),
      s"e4 went all-pairs:\n$p")
    assert(p.contains("BroadcastHashJoin"), s"e4 lost its broadcast dims:\n$p")
  }

  test("dedup_bloom: the probe is a literal-array map — no join against the base filter") {
    val p = plan("dedup_bloom")
    assert(!p.contains("CartesianProduct") && !p.contains("BroadcastNestedLoopJoin"),
      s"bloom probe degenerated:\n$p")
    // exactly ONE join survives: the exact-membership measurement join;
    // the bloom probe itself must ride as a literal array expression
    assert("Join".r.findAllMatchIn(p).size <= 2, // logical+physical mention pairs
      s"bloom probe joins against the filter:\n$p")
  }

  test("sharded/streaming bloom: filter rides equi-joins on the word index — no cartesian, no window") {
    for (q <- Seq("dedup_bloom_sharded", "st16_bloom_scan")) {
      val p = plan(q)
      assert(!p.contains("CartesianProduct") && !p.contains("BroadcastNestedLoopJoin"),
        s"$q: the filter probe degenerated to a non-equi join:\n$p")
      assert(!p.contains("Window"), s"$q: verdict fold ranks through a window:\n$p")
    }
  }

  test("centroid drift/refresh gates: literal-codebook assignment — no windows, no cartesian") {
    for (q <- Seq("sim_centroid_drift", "sim_centroid_refresh")) {
      val p = plan(q)
      assert(!p.contains("Window"),
        s"$q: assignment fell back to a window sort:\n$p")
      assert(!p.contains("CartesianProduct"),
        s"$q: planned a cartesian product:\n$p")
    }
  }

  test("dedup_paragraph: first-occurrence via min(struct) aggregate, never a corpus window") {
    val p = plan("dedup_paragraph")
    assert(!p.contains("Window"),
      s"first-occurrence ranks through a window over the corpus:\n$p")
    assert(!p.contains("CartesianProduct") && !p.contains("BroadcastNestedLoopJoin"),
      s"join-back degenerated to a cross product:\n$p")
  }

  test("dedup_semantic_centroid: keep-rule joins read the staged Lloyd assignment") {
    val p = plan("dedup_semantic_centroid")
    assert(!p.contains("CartesianProduct"), s"centroid-keep went all-pairs:\n$p")
    assert("Join \\[?bucket#\\d+, cluster_id#\\d+".r.findFirstIn(p).isDefined,
      s"pair join not keyed on (bucket, cluster_id):\n$p")
    // four consumers of the staged assignment — the pair join, the two
    // own-centroid cosine lookups, and the final keep flag — all read
    // the RDD boundary; Lloyd's centroid cross join never re-runs here
    assert("Scan ExistingRDD".r.findAllMatchIn(p).size >= 4,
      s"Lloyd subtree not staged for all four consumers:\n$p")
    assert(!p.contains("BroadcastNestedLoopJoin"),
      s"k-means re-runs inside the outer plan:\n$p")
  }

  test("containment df-cap window rides the posting join's own partitioning on g") {
    // In the shuffle-join regime the posting self-join needs one
    // hashpartitioning(g) exchange per side; the df-cap window partitions
    // by the same g, so EnsureRequirements reuses those — exactly 2
    // g-exchanges total, and never a cross product (the whole point of
    // the inverted index over all-pairs).
    spark.conf.set("spark.sql.autoBroadcastJoinThreshold", "-1")
    try {
      val p = operators.Dedup.containmentPairs(spark,
          Tables.documents(spark, sf), "doc_id", "text",
          dfCap = 100, threshold = 0.8)
        .queryExecution.executedPlan.toString
      assert(!p.contains("CartesianProduct"), s"containment went all-pairs:\n$p")
      assert(!p.contains("BroadcastNestedLoopJoin"), s"containment plans a BNLJ:\n$p")
      assert("Exchange hashpartitioning\\(g#".r.findAllMatchIn(p).size == 2,
        s"df-cap window stacked an extra g-exchange on the posting join:\n$p")
    } finally spark.conf.unset("spark.sql.autoBroadcastJoinThreshold")
  }

  test("ta_token_setops is ONE token-domain exchange with map-side combine") {
    // VERDICT r13 #3: the EXCEPT ∪ EXCEPT ∪ INTERSECT form shuffled the
    // token domain three times; the membership-aggregate rewrite must stay
    // a single exchange, with the lang filter pushed to the scan and the
    // partial max-aggregates combining before the shuffle.
    val p = plan("ta_token_setops")
    assert("Exchange".r.findAllMatchIn(p).size == 1,
      s"token set-ops regressed past one exchange:\n$p")
    assert(!p.contains("Join"), s"set-ops re-grew a join arm:\n$p")
    assert(p.contains("partial_max"), s"no map-side combine before the shuffle:\n$p")
    assert(p.contains("PushedFilters: [In(lang"),
      s"lang filter not pushed to the documents scan:\n$p")
  }

  test("g2_cross_universe: calendar side broadcast, events scan prunes to user_id") {
    // Bench-order insurance (VERDICT r13 #8): the r13 solo sweep read a
    // 2.5x "regression" here after a testdata regeneration; best-of-3 showed
    // it was measurement noise. Pin the plan so a FUTURE slowdown must show
    // up as a plan diff (lost pruning / lost broadcast / extra exchange)
    // rather than be re-adjudicated from timings.
    val p = plan("g2_cross_universe")
    // tiny trading-calendar side broadcasts; the |users| side never does
    assert(p.contains("BroadcastNestedLoopJoin BuildLeft, Cross"),
      s"calendar side no longer the broadcast build side:\n$p")
    assert(!p.contains("CartesianProduct"), s"universe went cartesian:\n$p")
    // the ts cast in Tables.events must be pruned away entirely: user_id
    // is the only column this query reads
    assert(p.contains("ReadSchema: struct<user_id:bigint>"),
      s"events scan reads more than user_id:\n$p")
    // one exchange total: the distinct on user_id
    assert("Exchange hashpartitioning".r.findAllMatchIn(p).size == 1,
      s"distinct(user_id) grew extra exchanges:\n$p")
  }

  test("ta_dsir: bucket model broadcast, pruned scans, map-side combine") {
    val p = plan("ta_dsir")
    // the ≤dsirBuckets-row weight table broadcasts onto the gram stream;
    // the corpus side must never be a build side or a sort-merge arm
    assert(p.contains("BroadcastHashJoin"), s"weight table not broadcast:\n$p")
    assert(!p.contains("SortMergeJoin"), s"scoring join degenerated to SMJ:\n$p")
    assert(!p.contains("CartesianProduct"), s"dsir plans a cartesian:\n$p")
    // both documents scans prune to the three referenced columns
    assert(p.contains("ReadSchema: struct<doc_id:bigint,text:string,source:string>"),
      s"documents scan reads beyond (doc_id, text, source):\n$p")
    // the bucket model and the per-doc score both partial-aggregate
    // before their exchanges (map-side combine on the exploded grams)
    assert(p.contains("partial_sum"), s"no map-side combine:\n$p")
    // two hash exchanges total: the ≤buckets-row model aggregate and the
    // per-doc aggregation — gram generation itself adds none
    assert("Exchange hashpartitioning".r.findAllMatchIn(p).size <= 2,
      s"gram/scoring path grew extra exchanges:\n$p")
  }

  test("ta_winnow: pure per-row map work — zero exchanges beyond the scan") {
    val p = plan("ta_winnow")
    assert(!p.contains("Exchange"), s"winnow stats grew a shuffle:\n$p")
    assert(p.contains("ReadSchema: struct<doc_id:bigint,text:string>"),
      s"documents scan reads beyond (doc_id, text):\n$p")
  }

  test("st13_winnow_scan: one fp exchange + key-only window sort + the doc rollup") {
    val p = plan("st13_winnow_scan")
    // WindowExec inserts a grouping sort even with no ORDER BY — pin
    // that it stays KEY-ONLY (one sort, on fp alone, never (ts, doc))
    val sorts = """Sort \[([^\]]*)\]""".r.findAllMatchIn(p).map(_.group(1)).toSeq
    assert(sorts.size == 1 && sorts.head.matches("fp#\\d+L ASC NULLS FIRST"),
      s"fp ownership window sort is not key-only:\n$p")
    assert("Exchange hashpartitioning".r.findAllMatchIn(p).size == 2,
      s"contamination scan grew extra exchanges:\n$p")
    assert(!p.contains("CartesianProduct") && !p.contains("SortMergeJoin"),
      s"scan joined pairwise:\n$p")
  }

  test("ev_retention: all joins broadcast, events scans prune to (ts, user_id)") {
    // Same insurance as g2 (VERDICT r13 #8): ev_retention read 2.1x in the
    // one-run r13 sweep, best-of-3 recovered it. Its shape: three pruned
    // events scans (active set, cohort-for-join, cohort-for-sizes), every
    // join broadcast (cohort dim, sizes dim), never a sort-merge join or
    // cartesian on the fact path.
    val p = plan("ev_retention")
    assert(!p.contains("CartesianProduct") && !p.contains("SortMergeJoin"),
      s"retention fact path lost its broadcast joins:\n$p")
    assert("BroadcastHashJoin".r.findAllMatchIn(p).size == 2,
      s"expected cohort + sizes broadcast joins:\n$p")
    assert("ReadSchema: struct<ts:[a-z_]+,user_id:bigint>".r
        .findAllMatchIn(p).size == 3,
      s"events scans read beyond (ts, user_id):\n$p")
  }

  test("ta_shuffle: two-phase rank — offsets broadcast back, per-bucket windows only") {
    val p = plan("ta_shuffle")
    // phase 2's window partitions by the h-bucket (bounded rows); the
    // only single-partition window is phase 1's over the tiny bucket-
    // totals table — the fact side must never sort through one task
    assert(p.contains("BroadcastHashJoin"), s"bucket offsets lost the broadcast:\n$p")
    assert(!p.contains("CartesianProduct"))
    // the docs scan reads only the id column
    assert(p.contains("ReadSchema: struct<doc_id:bigint>"),
      s"shuffle scan reads beyond doc_id:\n$p")
  }

  test("ta_length_buckets: one narrow map + one partial-aggregated exchange") {
    val p = plan("ta_length_buckets")
    assert(!p.contains("Window") && !p.contains("CartesianProduct"))
    // map-side combine before the ~40-row bucket exchange
    assert(p.contains("partial_count") || p.contains("partial"),
      s"bucket aggregate lost map-side combine:\n$p")
    assert(p.contains("ReadSchema: struct<text:string>"),
      s"bucket scan reads beyond text:\n$p")
  }

  test("sim_ivfpq_ann: probe is equi-join on list_id; shortlist rank via bounded aggregate") {
    val p = plan("sim_ivfpq_ann")
    assert(!p.contains("CartesianProduct") && !p.contains("BroadcastNestedLoopJoin"),
      s"IVF-PQ candidate generation degenerated:\n$p")
    assert(p.contains("list_id"), s"probe lost the list_id equi-join:\n$p")
    assert(!p.contains("Window"), s"ranking fell back to a window sort:\n$p")
  }

  test("IVF-PQ ADC is the narrow-map pqRv projection: no encode/stitch aggregates in the plan") {
    // r16: encode∘reconstruct moved from the join/agg form (min_by per
    // (id, m), collect_list stitch per id — two corpus-sized exchanges)
    // to the plan-literal per-row kernel. The plan must stay free of
    // both aggregate markers for BOTH the ann and the recall twin —
    // what remains shuffles only through the bounded TopK aggregates.
    for (q <- Seq("sim_ivfpq_ann", "sim_ivfpq_recall", "sim_pq_ann")) {
      val p = plan(q)
      assert(!p.contains("min_by"),
        s"$q: the PQ encode argmin fell back to the (id, m) aggregate:\n$p")
      assert(!p.contains("collect_list"),
        s"$q: the PQ stitch-back fell back to the collect_list aggregate:\n$p")
    }
  }

  test("sim_mmr: greedy steps are broadcast joins over the bounded shortlist") {
    val p = plan("sim_mmr")
    assert(!p.contains("CartesianProduct"), s"MMR planned a cartesian:\n$p")
    assert(!p.contains("SortMergeJoin"),
      s"selection joins lost their broadcast (selected set is <=k rows/query):\n$p")
    assert(!p.contains("Window"), s"argmax fell back to a window sort:\n$p")
  }

  test("dedup_soft: weights via one count aggregate + label-keyed join on the closure") {
    val p = plan("dedup_soft")
    assert(!p.contains("CartesianProduct") && !p.contains("BroadcastNestedLoopJoin"),
      s"soft weights degenerated:\n$p")
    assert(!p.contains("Window"), s"cluster sizing ranks through a window:\n$p")
  }

  test("e7_training_mix: no cartesian; shuffle offsets broadcast; joins id-keyed") {
    val p = plan("e7_training_mix")
    assert(!p.contains("CartesianProduct") && !p.contains("BroadcastNestedLoopJoin"),
      s"e7 degenerated:\n$p")
    assert(p.contains("BroadcastHashJoin"), s"e7 lost the offsets broadcast:\n$p")
  }

  test("ta_rrf_fusion: k-bounded list fusion — no corpus-sized join, aggregate rank") {
    val p = plan("ta_rrf_fusion")
    assert(!p.contains("CartesianProduct"))
    assert(p.contains("ObjectHashAggregate"), s"fused rank lost the bounded aggregate:\n$p")
  }

  test("ta_bpe_encode: vocab-compressed encode — word aggregate with map-side combine, no window") {
    val p = plan("ta_bpe_encode")
    assert(!p.contains("Window") && !p.contains("CartesianProduct"))
    assert(p.contains("partial_count") || p.contains("partial"),
      s"word compression lost map-side combine:\n$p")
  }

  test("ta_curriculum: two-phase rank — offsets broadcast, no global-sort window on facts") {
    val p = plan("ta_curriculum")
    assert(p.contains("BroadcastHashJoin"), s"curriculum offsets lost the broadcast:\n$p")
    assert(!p.contains("CartesianProduct"))
  }

  test("ta_quality_smooth: propagation joins never degenerate; no window") {
    val p = plan("ta_quality_smooth")
    assert(!p.contains("CartesianProduct") && !p.contains("BroadcastNestedLoopJoin"),
      s"smoothing degenerated:\n$p")
    assert(!p.contains("Window"), s"smoothing ranks through a window:\n$p")
  }

  test("st15_match_scan: stateless narrow scoring — no join on the doc side beyond the frozen dims") {
    val p = plan("st15_match_scan")
    assert(!p.contains("CartesianProduct") && !p.contains("SortMergeJoin"),
      s"matcher lost its narrow shape:\n$p")
    assert(!p.contains("Window"))
  }

  test("st14_soft_scan: occurrence windows partition by content hash only") {
    val p = plan("st14_soft_scan")
    assert(!p.contains("CartesianProduct"))
    // the one window partitions by text_hash (dup-group-bounded rows)
    assert(p.contains("text_hash"), s"window lost the hash partitioning:\n$p")
  }

  test("mm_audio_segments: one exchange end-to-end — windows and groupBy share the doc partitioning") {
    val p = plan("mm_audio_segments")
    assert(!p.contains("CartesianProduct") && !p.contains("BroadcastNestedLoopJoin"))
    // the running-change-count form keeps every window on hash(doc_id)
    // and the segment aggregate co-partitioned: exactly ONE hash
    // shuffle (the rank form needed hash(doc_id, flag) + hash(doc_id)
    // + the agg). The r21 Fan.out round-robin spread of the byte-light
    // scan is counted separately — it exists only when the scan is
    // under-parallel (never at scale) and carries no key semantics.
    assert("Exchange hashpartitioning".r
        .findAllIn(p.replace("ReusedExchange", "")).size == 1,
      s"audio segmentation grew a second hash shuffle:\n$p")
    assert("Exchange".r.findAllIn(p.replace("ReusedExchange", "")).size <= 2,
      s"audio segmentation grew an unexpected shuffle:\n$p")
    // one sort feeds both window passes
    assert("(?m)^\\s*[+:]- Sort".r.findAllIn(p).size == 1,
      s"window passes stopped sharing the per-doc sort:\n$p")
  }

  test("ta_bpe_merges trains on the word-frequency table with map-side combine") {
    // the plan of the FIRST round's pair count (the per-round shape):
    // corpus scan → explode → partial count (vocab compression) →
    // exchange → pair aggregate; no window, no join
    import org.apache.spark.sql.functions._
    val docs = graft.Tables.documents(spark, sf)
    val words = docs.filter(col("text").isNotNull)
      .select(explode(split(col("text"), " ")).as("__t"))
      .select(lower(col("__t")).as("w"))
      .filter(col("w").rlike("^[a-z]+$"))
      .groupBy(col("w")).agg(count(lit(1)).as("freq"))
    val p = words.queryExecution.executedPlan.toString
    assert(p.contains("partial_count") || p.contains("partial"),
      s"word-frequency aggregate lost map-side combine:\n$p")
    assert(p.contains("ReadSchema: struct<text:string>"),
      s"BPE corpus scan reads beyond text:\n$p")
  }
}
