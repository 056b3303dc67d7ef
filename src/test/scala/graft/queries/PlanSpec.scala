package graft.queries

import graft.{SparkEntry, SparkSpec}

/** Physical-plan audits (builder brief: "explain the plan and iterate until
  * it's the plan you'd want"): filters and projections reach the parquet
  * scan, dimension joins broadcast, hot paths stay in whole-stage codegen.
  */
class PlanSpec extends SparkSpec {

  private def plan(name: String): String = {
    val df = SparkEntry.queries(name)(spark, sf("sf0.01"))
    df.queryExecution.explainString(
      org.apache.spark.sql.execution.ExplainMode.fromString("formatted"))
  }

  test("q02: predicate pushdown and column pruning reach the scan") {
    val p = plan("q02_filter_topk")
    assert(p.contains("PushedFilters:"), "no pushed filters")
    assert(p.contains("GreaterThan(o_totalprice"), p.linesIterator.take(5).mkString)
    // pruned read schema: only the 4 projected + filtered columns
    assert(!p.contains("o_comment"), "scan reads unprojected columns")
    // top-k compiles to TakeOrderedAndProject, not a full sort
    assert(p.contains("TakeOrderedAndProject"), "limit+orderBy not fused")
  }

  test("q03: dimension chain broadcasts; no shuffle for small sides") {
    val p = plan("q03_revenue_by_nation")
    assert(p.contains("BroadcastHashJoin"), "dimension joins not broadcast")
  }

  test("q01: aggregation runs inside whole-stage codegen with partial agg") {
    assert(plan("q01_pricing_summary").contains("partial_sum"),
      "no map-side partial aggregation")
    // codegen spans only materialize in the FINAL adaptive plan — execute,
    // then inspect
    val df = SparkEntry.queries("q01_pricing_summary")(spark, sf("sf0.01"))
    df.collect()
    // codegen spans print as "*(n)" prefixes in the simple tree
    assert(df.queryExecution.executedPlan.toString.contains("*("),
      "no codegen span in final plan")
  }

  test("q04: semi join prunes the build side to the key column") {
    val p = plan("q04_semi_join")
    assert(p.contains("LeftSemi"), "not a semi join")
    // the orders scan feeding the semi join should read only o_custkey
    val ordersRead = p.linesIterator
      .filter(l => l.contains("ReadSchema") && l.contains("o_custkey"))
      .mkString
    assert(!ordersRead.contains("o_totalprice"),
      "semi-join build side reads extra columns")
  }

  test("q16: text features scan reads only the needed columns") {
    val p = plan("q16_text_features")
    assert(p.contains("ReadSchema"))
    assert(!p.contains("lang"), "unused documents columns read")
  }

  test("q18: the dedup shuffle carries the 16-byte fingerprint, not text") {
    val p = plan("q18_exact_dedup")
    // the fingerprint is computed in a Project BELOW the exchange and the
    // shuffle keys on it (Catalyst aliases it _groupingexpression)
    assert(p.contains("md5"), "fingerprint not computed in-plan")
    assert(p.contains("hashpartitioning(_groupingexpression") ||
      p.contains("hashpartitioning(fp"),
      "exchange not keyed on the fingerprint")
    // partial aggregation collapses repeats before the exchange, and the
    // raw text column never appears in a shuffle partitioning
    assert(p.contains("partial_count") || p.contains("partial"),
      "no map-side partial aggregation")
    assert(!p.contains("hashpartitioning(text"), "raw text shuffles")
  }

  test("q35: the fused all-planes projection is evaluated exactly once") {
    val p = plan("q35_cosine_pairs")
    val evals = "sign_projection_bits".r.findAllIn(p).length
    // one evaluation in its own projection (CollapseProject must not inline
    // it into the 8 band-slice struct expressions)
    assert(evals == 1, s"sign_projection_bits appears $evals times in the plan")
  }

  test("q22/q23: similarity query sides broadcast — no cartesian product") {
    for (q <- Seq("q22_cosine_topk", "q23_knn_join")) {
      val p = plan(q)
      assert(p.contains("BroadcastNestedLoopJoin") || p.contains("BroadcastExchange"),
        s"$q: query side not broadcast")
      assert(!p.contains("CartesianProduct"), s"$q: cartesian product in plan")
    }
  }

  test("q32/q34: as-of and range joins never plan a cartesian product") {
    for (q <- Seq("q32_asof_join", "q34_range_join")) {
      val p = plan(q)
      assert(!p.contains("CartesianProduct"), s"$q: cartesian product")
      assert(!p.contains("BroadcastNestedLoopJoin"), s"$q: nested-loop join")
    }
  }

  test("q46: BM25 stats side broadcasts; corpus side never shuffles") {
    val p = plan("q46_bm25_topk")
    assert(p.contains("BroadcastExchange"), "stats row not broadcast")
    assert(!p.contains("CartesianProduct"), "cartesian product")
    // top-k fuses; the only exchange in the plan is the broadcast one
    assert(p.contains("TakeOrderedAndProject"), "limit+orderBy not fused")
    val shuffles = p.linesIterator.count(_.trim.startsWith("Exchange hashpartitioning"))
    assert(shuffles == 0, s"corpus side shuffles ($shuffles hash exchanges)")
  }

  test("q45/q58: per-row text kernels stay in one scan, no joins") {
    for (q <- Seq("q45_repetition_filters", "q58_doc_chunking")) {
      val p = plan(q)
      assert(!p.contains("Join"), s"$q: per-row features should not join")
      assert(p.contains("max_token_freq") || p.contains("word_chunks"),
        s"$q: native kernel missing from plan")
    }
  }

  test("q49/q54: global/grouped ranks use a range exchange, not one sort task") {
    for (q <- Seq("q49_global_shuffle", "q54_percentile_rank")) {
      val p = plan(q)
      // formatted mode prints the partitioning in the node's Arguments line
      assert(p.contains("rangepartitioning("),
        s"$q: no range exchange (single-task sort?)")
      assert(!p.contains("SinglePartition"),
        s"$q: single-partition exchange in the rank path")
    }
  }

  test("q59: audit branches partial-aggregate, never Expand, never join") {
    // the audit submits its branches concurrently and assembles the bounded
    // result on the driver (q59's own plan is a LocalTableScan); the scale
    // shape to audit is the branch plans it submits
    import graft.operators.Constraints
    val li = graft.core.Tables(spark, sf("sf0.01")).lineitem
    val checkP = Constraints.checkAggPlan(li,
        Seq(Constraints.notNull("l_orderkey"),
          Constraints.between("l_discount", 0.0, 0.1)))
      .queryExecution.explainString(
        org.apache.spark.sql.execution.ExplainMode.fromString("formatted"))
    assert(checkP.contains("partial_sum") || checkP.contains("partial_count"),
      "no map-side partials in the check pass")
    assert(!checkP.contains("Expand"), "check pass plans an Expand")
    assert(!checkP.contains("Join"), "check pass joins")
    val uniqP = Constraints.uniqueAggPlan(li, Seq("l_orderkey", "l_linenumber"))
      .queryExecution.explainString(
        org.apache.spark.sql.execution.ExplainMode.fromString("formatted"))
    assert(!uniqP.contains("Expand"),
      "single-distinct uniqueness pass plans an Expand")
    assert(!uniqP.contains("Join"), "uniqueness pass joins")
  }

  test("q64: embedding column never crosses a shuffle; anti-join carries ids only") {
    val p = plan("q64_embedding_dedup_survivors")
    // the cluster chain and the final anti-join move only (long, long) id
    // frames; the embedding array must stay below its scans — any hash
    // exchange keyed or carrying `embedding` is the 100 TB blow-up
    val exchanges = p.linesIterator.filter(_.contains("Exchange")).toSeq
    assert(!exchanges.exists(_.contains("embedding")),
      s"an exchange carries the embedding column:\n${exchanges.mkString("\n")}")
    assert(p.contains("LeftAnti"), "survivor selection is not an anti-join")
  }

  test("q56/q57: sketch aggregates partial-aggregate before the merge") {
    for ((q, fn) <- Seq("q56_token_heavy_hitters" -> "heavy_hitters",
        "q57_sketch_quantiles" -> "kll_quantiles")) {
      val p = plan(q)
      assert(p.contains(s"partial_$fn"),
        s"$q: no partial sketch aggregation before the exchange")
    }
  }

  test("q65: bloom probe sits in the fact scan stage below the semi-join") {
    val p = plan("q65_bloom_semi_join")
    assert(p.contains("might_contain"), "no bloom probe in the plan")
    assert(p.contains("LeftSemi"), "exactness join missing")
    // the probe must be a plain Filter over the scan, not a join itself:
    // might_contain appears before (above in text = below in plan) any join
    val probeLine = p.linesIterator.indexWhere(_.contains("might_contain"))
    assert(probeLine >= 0)
  }

  test("q66: merge never shuffles the base — anti-joins and union only") {
    val p = plan("q66_merge_upsert")
    assert(p.contains("LeftAnti"), "merge without anti-joins")
    assert(!p.contains("CartesianProduct"), "cartesian product in merge")
    // base-side customer scan must not feed a hash exchange keyed on the
    // merge key (the whole point: the changeset broadcasts instead). The
    // final orderBy's range exchange is the only allowed base movement.
    assert(!p.contains("hashpartitioning(c_custkey"),
      "base table hash-shuffles on the merge key")
  }

  test("q68: grouped KLL sketch partial-aggregates per group") {
    assert(plan("q68_grouped_quantiles").contains("partial_kll_quantiles"),
      "no map-side sketch partials")
  }

  test("q69: fuzzy join blocks on the 8-byte variant hash, never all-pairs") {
    val p = plan("q69_fuzzy_name_join")
    assert(!p.contains("CartesianProduct"), "all-pairs fuzzy join")
    assert(!p.contains("BroadcastNestedLoopJoin"), "nested-loop fuzzy join")
    assert(p.contains("xxhash64"), "variant hash missing — join on strings?")
  }

  test("q70: priority sample is one bounded-heap aggregate, no global sort") {
    val p = plan("q70_priority_sample")
    assert(p.contains("topk_by"), "no bounded-heap aggregate")
    assert(p.contains("partial_topk_by"), "heap has no map-side partials")
  }

  test("q73: fixed-point centroid partial-aggregates the melt; float path " +
    "keeps vector buffers (object hash aggregate)") {
    val p = plan("q73_label_centroids")
    assert(p.contains("partial_sum"),
      "melt not collapsed by map-side partials before the exchange")
    assert(p.contains("ObjectHashAggregate"),
      "Summarizer vector aggregate missing (float certification path)")
  }

  test("q71: grouping sets compile to ONE Expand over one scan") {
    val p = plan("q71_grouping_sets")
    // formatted mode prefixes nodes with "(n) "
    val expands = "\\(\\d+\\) Expand".r.findAllIn(p).length
    assert(expands == 1, s"$expands Expand nodes (want exactly 1)")
    val scans = "\\(\\d+\\) Scan parquet".r.findAllIn(p).length
    assert(scans == 1, s"$scans scans (grouping sets must share one)")
  }

  test("q74/q75: dedup exchanges carry hashes and band keys, never text") {
    for (q <- Seq("q74_dup_passages", "q75_incremental_neardup")) {
      val p = plan(q)
      assert(!p.contains("hashpartitioning(text"),
        s"$q shuffles raw document text")
      // every exchange partitioning expression is hash/band/id-shaped
      val parts = "hashpartitioning\\(([a-zA-Z0-9_#]+)".r
        .findAllMatchIn(p).map(_.group(1)).toSet
      val bad = parts.filter(_.startsWith("text"))
      assert(bad.isEmpty, s"$q text-keyed exchanges: $bad")
    }
  }

  test("q84: embedding array never keys a shuffle; audit partial-aggregates") {
    val p = plan("q84_int8_quantization")
    assert(!p.contains("hashpartitioning(embedding"),
      "embedding array shuffles")
    assert(p.contains("partial_"), "no map-side partial aggregation")
  }

  test("q85: snapshot diff is one full-outer key join, no cartesian") {
    val p = plan("q85_snapshot_diff")
    assert(p.contains("FullOuter"), "no full-outer join planned")
    assert(!p.contains("Cartesian"), "cartesian product planned")
  }

  test("q88: global top-k plans as TakeOrderedAndProject, not a full sort") {
    val p = plan("q88_vocab_coverage")
    assert(p.contains("TakeOrderedAndProject"), "limit+orderBy not fused")
  }

  test("q82: TWAP uses one keyed window over one scan") {
    val p = plan("q82_time_weighted_avg")
    val scans = "\\(\\d+\\) Scan parquet".r.findAllIn(p).length
    assert(scans == 1, s"$scans scans (want 1)")
    val windows = "\\(\\d+\\) Window".r.findAllIn(p).length
    assert(windows == 1, s"$windows windows (want 1)")
  }

  test("q95/q96: the whole islands chain rides ONE exchange by user_id") {
    // every window and aggregate partitions by user_id, so Catalyst plans a
    // single hash exchange for the entire chain (the trailing
    // single-partition exchange is the bounded-result sort)
    Seq("q95_scd2_history", "q96_interval_coverage").foreach { q =>
      val p = plan(q)
      val hashEx = "hashpartitioning\\(user_id".r.findAllIn(p).length
      assert(hashEx >= 1, s"$q: no user_id exchange")
      val exchanges = "\\(\\d+\\) Exchange".r.findAllIn(p).length
      assert(exchanges <= 2, s"$q: $exchanges exchanges (want keyed + result)")
      assert(!p.contains("rangepartitioning") || q == "q95_scd2_history",
        s"$q: unexpected global sort")
    }
  }

  test("q94: pair generation keys on hashed shingles; raw n-grams never " +
    "key a shuffle") {
    val p = plan("q94_prefix_setsim")
    assert(p.contains("xxhash64"), "shingles not hashed for the index")
    assert(!p.contains("hashpartitioning(__s"), "raw shingle keys a shuffle")
    assert(!p.contains("CartesianProduct"), "all-pairs fallback planned")
  }

  test("q98: CUBE compiles to ONE Expand over one scan") {
    val p = plan("q98_cube_revenue")
    val scans = "\\(\\d+\\) Scan parquet".r.findAllIn(p).length
    assert(scans == 1, s"$scans scans (want 1)")
    val expands = "\\(\\d+\\) Expand".r.findAllIn(p).length
    assert(expands == 1, s"$expands Expands (want 1)")
    assert(p.contains("partial"), "no map-side partial aggregation")
  }

  test("q99: supplier and nation dims broadcast; one fact scan, one agg " +
    "exchange") {
    val p = plan("q99_group_ols")
    val bhj = "\\(\\d+\\) BroadcastHashJoin".r.findAllIn(p).length
    assert(bhj == 2, s"$bhj broadcast joins (want 2)")
    assert(p.contains("partial_sum"), "sufficient stats not map-side combined")
  }

  test("q101: ranks come from a range exchange, never one sort task") {
    val p = plan("q101_gini_index")
    assert(p.contains("rangepartitioning"), "no parallel range exchange")
    assert(!p.contains("SinglePartition) Window") &&
      !p.contains("Window [row_number"), "single-partition window planned")
  }

  test("q102: the schedule is TakeOrderedAndProject, not a full sort") {
    val p = plan("q102_curriculum_interleave")
    assert(p.contains("TakeOrderedAndProject"), "limit+orderBy not fused")
  }

  test("q106: correlated subqueries decorrelate to joins — no per-row " +
    "re-execution, no cartesian") {
    val p = plan("q106_sql_entry_subqueries")
    assert(!p.contains("CartesianProduct"), "cartesian product planned")
    // decorrelation rewrites both scalar subqueries and the EXISTS into
    // aggregate + join shapes; a surviving correlated subquery would print
    // as a Subquery/InSubquery node in the physical plan
    assert(!p.toLowerCase.contains("subqueryexec"), "subquery not decorrelated")
    assert(p.contains("LeftSemi"), "EXISTS not planned as a semi join")
  }

  test("q112: repeated-substring exchanges carry (id, pos, hash) — the " +
    "text column never shuffles") {
    val p = plan("q112_repeated_substrings")
    assert(p.contains("hashpartitioning(h"), "no exchange keyed on the hash")
    assert(!p.contains("hashpartitioning(text"), "raw text shuffles")
    // round 15: corpus-repeat detection is count() OVER (PARTITION BY h)
    // in ONE pass — the old groupBy(h)+join-back planned the window-hash
    // explode twice. Exactly one Generate (the posexplode) may appear.
    val gens = "\\(\\d+\\) Generate".r.findAllIn(p).length
    assert(gens == 1, s"$gens Generates (want 1 — the window-hash explode " +
      "must be planned once, not once per consumer)")
    assert(p.contains("partial"),
      "span aggregates not map-side combined")
  }

  test("q108: winnowing pair generation shuffles fingerprints, not text") {
    val p = plan("q108_winnowing_pairs")
    assert(p.contains("hashpartitioning(f"), "no exchange keyed on fingerprint")
    assert(!p.contains("hashpartitioning(text"), "raw text shuffles")
  }

  test("q117: all fifteen moments come from ONE lineitem scan and one " +
    "map-side-combined aggregate") {
    val p = plan("q117_sufficient_stats")
    // count details-section headers ("(n) Scan parquet"), not the tree
    // rendering — formatted explain prints every node twice
    val scans = "\\(\\d+\\) Scan parquet".r.findAllIn(p).length
    assert(scans == 1, s"$scans lineitem scans (want 1 — the SQL " +
      "formulation pays one per pair)")
    assert(p.contains("partial_sum"), "moments not map-side combined")
  }

  test("q116: session trigrams ride ONE per-user window exchange — no " +
    "second partition-by-session shuffle") {
    val p = plan("q116_session_paths")
    assert(p.contains("hashpartitioning(user_id"), "no per-user exchange")
    assert(!"hashpartitioning\\([^)]*sess".r.findFirstIn(p).isDefined,
      "second exchange keyed on the session id")
    assert(p.contains("TakeOrderedAndProject"), "top-10 not fused")
  }

  test("q113: the label-pair join broadcasts the bounded centroid frame") {
    val p = plan("q113_centroid_geometry")
    assert(!p.contains("CartesianProduct"), "cartesian product planned")
    assert(p.contains("BroadcastNestedLoopJoin") || p.contains("BroadcastHashJoin"),
      "label pair join not broadcast")
  }

  test("q119: one fact pass — totals derive from the (category, fold) " +
    "partials, never a second orders scan") {
    val p = plan("q119_oof_target_encoding")
    val scans = "\\(\\d+\\) Scan parquet".r.findAllIn(p).length
    assert(scans == 1, s"$scans orders scans (want 1)")
    assert(p.contains("partial_sum"), "fold aggregate not map-side combined")
    assert(p.contains("BroadcastHashJoin"), "per-category totals not broadcast")
  }

  test("q121: triangle joins are all equi-joins — no cartesian, no " +
    "broadcast nested loop") {
    val p = plan("q121_triangle_counts")
    assert(!p.contains("CartesianProduct"), "cartesian product planned")
    assert(!p.contains("BroadcastNestedLoopJoin"), "nested-loop join planned")
  }

  test("q122: containment pair generation shuffles hashed postings — " +
    "shingle strings and text never key an exchange") {
    val p = plan("q122_containment_pairs")
    assert(p.contains("hashpartitioning(s#") || p.contains("hashpartitioning(s,"),
      "no exchange keyed on the posting hash")
    assert(!p.contains("hashpartitioning(text"), "raw text shuffles")
    assert(!"hashpartitioning\\(__s".r.findFirstIn(p).isDefined,
      "raw shingle strings key an exchange")
  }

  test("q123: the hashed linear score is one scan-side aggregate — no " +
    "explode, no per-token rows, no per-doc exchange") {
    val p = plan("q123_hashed_linear_score")
    assert(!p.contains("Generate"), "explode planned — per-token rows exist")
    val scans = "\\(\\d+\\) Scan parquet".r.findAllIn(p).length
    assert(scans == 1, s"$scans documents scans (want 1)")
    assert(p.contains("partial_count") || p.contains("partial_sum"),
      "per-source aggregate not map-side combined")
    // no per-doc ENSURE_REQUIREMENTS exchange; the scan fan-out (hash by
    // doc_id, REPARTITION_BY_NUM — round 14) is width, not clustering
    assert(!p.linesIterator.exists(l =>
        l.contains("hashpartitioning(doc_id") &&
          !l.contains("REPARTITION_BY_NUM")),
      "per-doc exchange planned")
  }

  test("q126: per-customer spans come from ONE orders scan; the max-date " +
    "row broadcasts") {
    val p = plan("q126_survival_lifetable")
    val scans = "\\(\\d+\\) Scan parquet".r.findAllIn(p).length
    assert(scans == 1, s"$scans orders scans (want 1 — spans persisted)")
    assert(p.contains("BroadcastNestedLoopJoin") || p.contains("BroadcastExchange"),
      "corpus-end scalar not broadcast")
  }

  test("q127: join cardinality never executes the fact-fact join — both " +
    "join inputs are aggregates") {
    val p = plan("q127_join_cardinality")
    // the join keys on k, which only exists post-aggregate; a fact-fact
    // join would key on user_id/o_custkey directly
    assert("keys \\[1\\]: \\[k#".r.findAllIn(p).size == 2,
      "join does not key on the post-aggregate column")
    assert(!"keys \\[1\\]: \\[user_id#".r.findFirstIn(p).isDefined,
      "fact-fact join planned on raw keys")
    assert(p.contains("partial_count"), "key histograms not map-side combined")
  }

  test("q128: dispersion is one melt with map-side partials — no pairwise " +
    "join anywhere") {
    val p = plan("q128_embedding_dispersion")
    assert(!p.contains("CartesianProduct") && !p.contains("SortMergeJoin"),
      "pairwise join planned — the moment identity should avoid it")
    assert(p.contains("partial_sum"), "melt aggregate not map-side combined")
  }

  test("q148: the native session-window operator (UpdatingSessions) rides " +
    "ONE keyed exchange") {
    val p = plan("q148_native_session_window")
    assert(p.contains("UpdatingSessions"),
      "native session-window physical operator missing")
    val hashEx = "hashpartitioning\\(user_id".r.findAllIn(p).length
    assert(hashEx >= 1, "no user_id exchange")
    val exchanges = "\\(\\d+\\) Exchange".r.findAllIn(p).length
    assert(exchanges <= 2, s"$exchanges exchanges (want keyed + result sort)")
  }

  test("q143: the literal date window statically prunes the partitioned " +
    "layout — the executed scan reads ONLY the window's directories") {
    import org.apache.spark.sql.functions._
    val s = spark
    import s.implicits._
    val tmp = java.nio.file.Files.createTempDirectory("graft-prunespec-")
    try {
      val path = tmp.resolve("events_by_date").toString
      val ev = graft.core.Tables(spark, sf("sf0.01")).events
      graft.operators.Layout.writePartitioned(
        ev.withColumn("event_date", to_date($"ts")), path, "event_date")
      val total = new java.io.File(path).listFiles()
        .count(_.getName.startsWith("event_date="))
      assert(total > 7, s"layout has only $total partitions — window not selective")
      val d0 = ev.agg(min(to_date($"ts"))).first().getDate(0).toLocalDate
      val df = Scale.prunedWindowAgg(spark, path, d0.plusDays(7), d0.plusDays(13))
      // the filter must appear as a PartitionFilter on the scan (pruning at
      // planning), not a post-scan row Filter
      val p = df.queryExecution.explainString(
        org.apache.spark.sql.execution.ExplainMode.fromString("formatted"))
      assert(p.contains("PartitionFilters: [isnotnull(event_date"),
        "no partition filters on the scan")
      df.collect()
      // execution-grounded proof: the scan's own partitions-read metric
      import org.apache.spark.sql.execution.{FileSourceScanExec, SparkPlan}
      import org.apache.spark.sql.execution.adaptive.{AdaptiveSparkPlanExec, QueryStageExec}
      def findScans(pl: SparkPlan): Seq[FileSourceScanExec] = pl match {
        case a: AdaptiveSparkPlanExec => findScans(a.executedPlan)
        case q: QueryStageExec        => findScans(q.plan)
        case f: FileSourceScanExec    => Seq(f)
        case other =>
          (other.children ++ other.subqueries).flatMap(findScans)
      }
      val scans = findScans(df.queryExecution.executedPlan)
      assert(scans.nonEmpty, "no parquet scan in the executed plan")
      val read = scans.head.metrics("numPartitions").value
      assert(read == 7,
        s"scan read $read partitions (want exactly the 7-day window)")
      assert(read < total, s"no pruning: read $read of $total")
    } finally {
      def rm(f: java.io.File): Unit = {
        val kids = f.listFiles(); if (kids != null) kids.foreach(rm)
        f.delete(): Unit
      }
      rm(tmp.toFile)
    }
  }

  test("q125: the df join keys on the bigram — the probe side reuses the " +
    "aggregate's partitioning, no third corpus exchange") {
    val p = plan("q125_bigram_surprisal")
    assert(p.contains("hashpartitioning(s#"), "no exchange keyed on the bigram")
    assert(!p.contains("hashpartitioning(text"), "raw text shuffles")
    // exchanges keyed on s: the aggregate's and the probe's — the join
    // itself must not add a third
    val sKeyed = "hashpartitioning\\(s#".r.findAllIn(p).length
    assert(sKeyed <= 2, s"$sKeyed exchanges keyed on the bigram (want <= 2)")
  }

  test("q153: the bucketed join plans with NO exchange on the join key — " +
    "the only shuffle in the gated plan is the final 5-group rollup's") {
    Scale.writeBucketedPair(spark, sf("sf0.001"))
    try {
      // force the sort-merge path: a broadcast would also avoid the
      // shuffle but would prove nothing about bucketing
      spark.conf.set("spark.sql.autoBroadcastJoinThreshold", "-1")
      try {
        val df = Scale.bucketedPriorityRevenue(spark)
        val p = df.queryExecution.explainString(
          org.apache.spark.sql.execution.ExplainMode.fromString("formatted"))
        assert(p.contains("SortMergeJoin") || p.contains("ShuffledHashJoin"),
          "no shuffle-class join operator (broadcast crept back?)")
        assert(p.contains("Bucketed: true"), "scan not bucketed:\n" + p)
        assert(!p.contains("hashpartitioning(okey"),
          "co-located join still exchanges on the key:\n" + p)
        // the one legitimate exchange: the post-join priority rollup
        val exchanges = "\\(\\d+\\) Exchange".r.findAllIn(p).length
        assert(exchanges <= 1,
          s"$exchanges exchanges (want only the rollup's):\n" + p)
      } finally
        spark.conf.unset("spark.sql.autoBroadcastJoinThreshold")
    } finally Seq("graft_q153_lineitem", "graft_q153_orders")
      .foreach(graft.operators.Bucketing.dropWithLocation(spark, _))
  }

  // ---- round 14: kernel-width exchanges (optimization round) ----------
  // The pair operators' CPU-bound verify pipelines hang off ONE exchange
  // each; round 14 replaced those implicit ENSURE_REQUIREMENTS exchanges
  // with explicit repartitions at the kernel-width conv. These pins keep
  // the plan shape honest: if a refactor drops the explicit exchange the
  // verify stage silently collapses back to the post-agg shuffle width.

  test("q122/q94: prefix-rank window exchange is the explicit " +
    "kernel-width repartition") {
    for (q <- Seq("q122_containment_pairs", "q94_prefix_setsim")) {
      val p = plan(q)
      val hit = p.linesIterator.exists(l =>
        l.contains("REPARTITION_BY_NUM") && l.contains("hashpartitioning(id#"))
      assert(hit, s"$q: prefix window exchange not the explicit " +
        "repartition-by-id:\n" + p.linesIterator.filter(
          _.contains("hashpartitioning")).mkString("\n"))
    }
  }

  test("q69: candidate-distinct exchange is the explicit kernel-width " +
    "repartition on the pair key") {
    val p = plan("q69_fuzzy_name_join")
    val hit = p.linesIterator.exists(l =>
      l.contains("REPARTITION_BY_NUM") && l.contains("hashpartitioning(id_a#"))
    assert(hit, "q69: distinct exchange not the explicit repartition:\n" +
      p.linesIterator.filter(_.contains("hashpartitioning")).mkString("\n"))
  }

  test("q156: the PQ-ADC data side is fanned (encode not single-task)") {
    val p = plan("q156_pq_adc_recall")
    assert(p.contains("REPARTITION_BY_NUM"),
      "q156: embeddings data side lost its fan-out exchange")
  }
}
