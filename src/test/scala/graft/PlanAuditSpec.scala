package graft

/** Plan-shape regression guard: the scale discipline that PLANS.md
  * documents (dims broadcast, filters pushed, bounded shuffle counts) is
  * asserted here so a future edit can't silently turn a broadcast join
  * into a shuffle or un-push a filter. Counts are over the INITIAL
  * physical plan (pre-AQE): `Exchange hashpartitioning` = a real
  * shuffle boundary, `BroadcastExchange` = a broadcast build.
  */
class PlanAuditSpec extends SparkSpec {

  private def plan(name: String): String =
    Registry.byName(name).run(spark, sf("sf0.001"))
      .queryExecution.executedPlan.toString()

  private def shuffles(p: String): Int =
    "Exchange hashpartitioning".r.findAllIn(p).length

  private def broadcasts(p: String): Int =
    "BroadcastExchange".r.findAllIn(p).length

  test("salary rule chain is a pure map over the scan: zero shuffles") {
    val p = plan("dom_salary_extract")
    assert(shuffles(p) == 0, p.linesIterator.take(5).mkString("\n"))
    // r09: the ads fixture is materialised once per run (SharedCache,
    // VERDICT item 3), so the chain no longer joins the dims per call —
    // it is a pure map over ONE scan of the cached entry: zero
    // broadcasts too (was: >= 2 for the customer + nation dims)
    assert(broadcasts(p) == 0, s"broadcasts=${broadcasts(p)}")
    assert("Scan parquet".r.findAllIn(p).length == 1,
      "exactly one scan: the materialised ads entry")
  }

  test("broadcast dim join: dims broadcast, only the agg shuffles") {
    val p = plan("j3_broadcast_dim_join")
    assert(broadcasts(p) >= 2)
    assert(shuffles(p) <= 1)
  }

  test("bm25: exactly one stats aggregation shuffle, stats broadcast") {
    val p = plan("t_bm25_topk")
    assert(broadcasts(p) >= 1)
    // one exchange for the stats agg; ranking is a global window on the
    // already-tiny scored set
    assert(shuffles(p) <= 2, s"shuffles=${shuffles(p)}")
    // ranking must be per-partition heaps + driver merge, and the only
    // Window left is the cosmetic rank over the k-row limited result
    assert(p.contains("TakeOrderedAndProject"), "rank via orderBy.limit")
  }

  test("surface-forms tf-idf: the sparse product never crosses the network") {
    val p = plan("dom_surface_forms_tfidf")
    // the form side broadcasts into the entity-partitioned matrix…
    assert(broadcasts(p) >= 2, "formWords + nDocs broadcast")
    // …and the fanout-sized per-(form,entity) aggregate runs WITHOUT its
    // own exchange: every hashpartitioning exchange in this plan carries
    // matrix-or-smaller keys (entity / word / form_id), never the
    // product. The arg-max is a hash aggregate (packed-long max), not a
    // SortAggregate over the fanout.
    assert(!p.contains("SortAggregate"),
      "packed arg-max must stay in hash aggregation")
    // pinned parallelism at the fanout boundaries: user repartitions are
    // REPARTITION_BY_NUM nodes, visible pre-AQE
    assert("REPARTITION_BY_NUM".r.findAllIn(p).length >= 2,
      "fanout-boundary repartitions must survive optimization")
  }

  test("ngram jaccard: banded self-join is salted against low-cardinality buckets") {
    val p = plan("d_ngram_jaccard_pairs")
    assert(p.contains("salt"), "salt column must reach the join key")
    // at tiny SF one side legitimately broadcasts; what must hold at any
    // size is that the pair-dedup distinct still shuffles and the salt
    // participates in the join keys
    assert(shuffles(p) >= 1)
  }

  test("filter pushdown reaches the parquet scan") {
    val p = plan("p4_date_range_filter")
    assert(p.contains("PushedFilters: ["), "scan has pushed filters")
    assert(!p.contains("PushedFilters: []"), "pushed filter list non-empty")
    assert(shuffles(p) == 0)
  }

  test("top-N is TakeOrderedAndProject, not a global sort") {
    val p = plan("a5_topn_most_common")
    assert(p.contains("TakeOrderedAndProject"))
    assert(!p.contains("Sort [count"), "no global sort operator for top-N")
  }

  test("heavy hitters: sketch broadcast, bounded shuffles, lazy build") {
    val p = plan("a15_heavy_hitters_topk")
    assert(broadcasts(p) >= 1)
    assert(shuffles(p) <= 3)
  }

  test("kNN graph: norms computed behind a cache barrier, grouped top-k " +
    "partial-aggregates map-side") {
    val p = plan("sim_knn_graph")
    // the persist barrier: both join sides read the normed InMemoryRelation
    assert(p.contains("InMemoryRelation"), "norm precompute must be cached")
    // the collapsed (broken) plan computes BOTH norms in the per-pair
    // projection — one line with SQRT(..a..) * SQRT(..b..); the barriered
    // plan only ever has one SQRT per line (the cached build projection)
    assert(!p.linesIterator.exists(l => "SQRT\\(".r.findAllIn(l).size >= 2),
      "per-pair norm recompute crept back in")
    // the rank is the bounded Aggregator (ObjectHashAggregate partial),
    // never a window sort over the full candidate set
    assert(p.contains("ObjectHashAggregate"))
    assert(!p.contains("RunningWindowFunction"))
  }

  test("consensus matrix: self-join blocked on (run,label), counts " +
    "partial-aggregated") {
    val p = plan("dom_consensus_matrix")
    // the pair count must shuffle on (src,dst) AFTER a map-side partial —
    // two HashAggregates around the exchange
    assert("partial_count".r.findAllIn(p).nonEmpty,
      "pair counting must be map-side combined")
  }

  test("chunking is a pure map stage: zero shuffles, zero broadcasts") {
    val p = plan("t_chunk_documents")
    assert(shuffles(p) == 0, p.linesIterator.take(5).mkString("\n"))
    assert(broadcasts(p) == 0)
    assert(p.contains("Generate posexplode"), "chunk fanout stays codegen")
  }

  test("unigram logprob: vocab table broadcast into the token scan") {
    val p = plan("t_unigram_logprob")
    // freq + total both broadcast; shuffles = vocab agg + per-doc agg
    assert(broadcasts(p) >= 2, "freq and total must broadcast")
    assert(shuffles(p) <= 3, s"shuffles=${shuffles(p)}")
  }

  test("corpus shuffle + stratified sample: per-shard windows only") {
    for (q <- Seq("t_corpus_shuffle", "t_stratified_sample")) {
      val p = plan(q)
      // exactly one exchange: the partitionBy(shard/stratum) for the
      // window — never an all-to-one global sort
      assert(shuffles(p) == 1, s"$q shuffles=${shuffles(p)}")
      assert(!p.contains("SinglePartition"), s"$q must not serialise")
    }
  }

  test("table profiler: column-pruned scans, hash-agg distinct, no Expand") {
    val p = plan("a17_table_profile")
    assert(!p.contains("Join"), "profiler must not self-join per column")
    // one scan per profiled column, each pruned to exactly that column —
    // byte-equal to a single 4-column scan in a column store
    assert("FileScan parquet".r.findAllIn(p).length == 4)
    assert("ReadSchema: struct<l_[a-z]+:[a-z_0-9()]+>".r.findAllIn(p).length == 4,
      "each scan must read exactly one column")
    // no multi-distinct Expand, and no SortAggregate over table rows —
    // the string min/max sorts only the already-distinct values
    assert(!p.contains("Expand"), "no multi-countDistinct row expansion")
  }

  test("deterministic sampler pushes nothing but a scan + filter") {
    val p = plan("p7b_deterministic_sample")
    assert(shuffles(p) == 0)
    assert(broadcasts(p) == 0)
  }

  test("NFC normalisation is a pure map: zero shuffles, zero broadcasts") {
    val p = plan("t_unicode_nfc")
    assert(shuffles(p) == 0 && broadcasts(p) == 0)
  }

  test("cohort retention never builds a window over the whole table") {
    val p = plan("a22_cohort_retention")
    assert(!p.contains("Window"), "cohort = aggs + join, not a window")
    assert(!p.contains("SinglePartition"), "nothing global")
  }

  test("replayable HLL: register aggregate is hash agg, no sort") {
    val p = plan("a16b_hll_distinct")
    assert(!p.contains("SortAggregate"),
      "register maxes must stay map-side-combinable hash aggregation")
    assert(!p.contains("CartesianProduct"))
  }

  test("count-min: counters and estimates stay in hash aggregation") {
    val p = plan("a23_countmin_sketch")
    assert(!p.contains("CartesianProduct"))
    assert(!p.contains("SortAggregate"))
  }

  test("semantic dedup: pair stage is label-blocked, never a cartesian") {
    val p = plan("d_semantic_dedup_corpus")
    assert(!p.contains("CartesianProduct") &&
      !p.contains("BroadcastNestedLoopJoin"),
      "embedding pairs must come from the label-keyed equi join")
    assert(!p.contains("SortAggregate"))
  }

  test("quantile sketch: counters stay in hash aggregation, window only on the 256-row frame") {
    val p = plan("a24_quantile_sketch")
    assert(!p.contains("SortAggregate"))
    assert(!p.contains("CartesianProduct"))
  }

  test("dsir: bucket stats broadcast back into the token scan") {
    val p = plan("t_dsir_weights")
    assert(broadcasts(p) >= 2, "tot + lr frames must broadcast")
    assert(!p.contains("SortAggregate"))
  }

  test("PQ: assignment is a codegen broadcast-hash join with map-side " +
    "argmin, never interpreted array search") {
    val p = plan("ann_pq_topk")
    assert(p.contains("BroadcastHashJoin"), "subspace join must be a BHJ")
    assert(p.contains("ObjectHashAggregate"),
      "argmin must be the bounded TopKAgg heap, partial-merged map-side")
    assert(!p.contains("CartesianProduct"))
    assert(!p.contains("SortAggregate"),
      "no struct-min SortAggregate over the candidate stream")
  }

  test("containment join: every stage is an equi join — no cartesian, " +
    "pair counts map-side combined") {
    val p = plan("d_ngram_containment_pairs")
    assert(!p.contains("CartesianProduct") &&
      !p.contains("BroadcastNestedLoopJoin"))
    assert("partial_count".r.findAllIn(p).nonEmpty)
  }

  test("winnowing: gram assembly and hash stay in one doc-keyed window " +
    "pipeline") {
    val p = plan("t_winnowing_fingerprints")
    assert(p.contains("Generate posexplode"), "token fanout stays codegen")
    assert(shuffles(p) <= 3, s"shuffles=${shuffles(p)}")
    assert(!p.contains("SinglePartition"), "nothing global")
  }

  test("tfidf terms: no cartesian, rank window per doc only") {
    val p = plan("t_tfidf_terms")
    assert(!p.contains("CartesianProduct"))
    assert(shuffles(p) <= 5, s"shuffles=${shuffles(p)}")
  }

  test("group-wise OLS is one hash aggregate over the corpus") {
    val p = plan("a29_groupwise_ols")
    assert(shuffles(p) == 1, s"shuffles=${shuffles(p)}")
    assert(!p.contains("SortAggregate"))
  }

  test("event transitions: lag window + alphabet-sized aggs, no cartesian") {
    val p = plan("e_event_transitions")
    assert(!p.contains("CartesianProduct"))
    assert(shuffles(p) <= 4, s"shuffles=${shuffles(p)}")
  }

  test("snapshot diff: one full-outer equi join, nothing nested-loop") {
    val p = plan("s16_snapshot_diff")
    assert(!p.contains("CartesianProduct") &&
      !p.contains("BroadcastNestedLoopJoin"))
    assert(p.contains("FullOuter"), "full-outer equi join")
  }

  test("bloom: filter and density frames broadcast under the probe join") {
    val p = plan("a28_bloom_replayable")
    assert(!p.contains("CartesianProduct"))
    assert(broadcasts(p) >= 2, "bits + n_bits must broadcast")
  }

  test("gap-fill: per-key spine aggs, 2-column pruned scan, no calendar crossJoin") {
    val p = plan("w14_gapfill_locf")
    assert(!p.contains("CartesianProduct") &&
      !p.contains("BroadcastNestedLoopJoin"))
    assert(shuffles(p) <= 3, s"shuffles=${shuffles(p)}")
    assert(p.contains("ReadSchema: struct<o_custkey:bigint,o_orderdate"),
      "scan must prune to the 2 consumed columns")
  }

  test("k-means: corpus is never hash-exchanged — only k×dim refine rows") {
    val p = plan("sim_kmeans")
    // every Exchange in the plan carries (cid,pos)/cid-keyed refine rows
    // or the final per-cluster agg; the corpus itself reaches assignment
    // via the broadcast packed-centroid row
    assert(!p.contains("Exchange hashpartitioning(vec_id"),
      "corpus must not shuffle for assignment")
    assert(!p.contains("CartesianProduct"))
  }

  test("bottom-k resemblance: rank prune runs as WindowGroupLimit, semi joins broadcast") {
    val p = plan("t_corpus_resemblance")
    assert(p.contains("WindowGroupLimit"),
      "per-shard bottom-k must push the rank limit into the sort")
    assert(p.contains("LeftSemi"), "sketch intersection via semi joins")
    assert(!p.contains("CartesianProduct"))
  }

  test("attribution: one user-keyed join, windows share the conv_id exchange") {
    val p = plan("e_attribution")
    assert(!p.contains("CartesianProduct") &&
      !p.contains("BroadcastNestedLoopJoin"))
    assert(shuffles(p) <= 2, s"shuffles=${shuffles(p)}")
  }

  test("quality percentile: exactly one source-keyed exchange") {
    val p = plan("t_quality_percentile")
    assert(shuffles(p) == 1, s"shuffles=${shuffles(p)}")
    assert(!p.contains("ReadSchema: struct<doc_id:bigint,text:string,lang"),
      "lang/n_chars must be pruned from the scan")
  }

  test("image dhash: decode is a zero-shuffle mapPartitions over the listing scan") {
    val p = plan("m_image_dhash")
    assert(shuffles(p) == 0, s"shuffles=${shuffles(p)}")
    assert(p.contains("MapPartitions"))
  }

  test("dynamic partition pruning: runtime subquery on the partition column") {
    val p = plan("s19_dynamic_partition_pruning")
    assert(p.contains("dynamicpruning"),
      "join-driven partition pruning must be planned")
  }

  test("unpivot is a map-side Expand: only the upstream pivot agg shuffles") {
    val p = plan("a31_unpivot")
    assert(p.contains("Expand"), "unpivot should plan as Expand")
    // Spark plans pivot as a TWO-phase aggregation ((day, type) then
    // day), so the wide frame costs 2 exchanges; the melt adds none
    assert(shuffles(p) <= 2, s"shuffles=${shuffles(p)}")
  }

  test("hilbert key is a pure map: zero shuffles, zero broadcasts") {
    val p = plan("f17_hilbert_key")
    assert(shuffles(p) == 0 && broadcasts(p) == 0,
      p.linesIterator.take(5).mkString("\n"))
    assert(p.contains("hilbert_key"), "codegen expression in the plan")
  }

  test("poisson bootstrap: the ×B explode collapses map-side") {
    val p = plan("a36_poisson_bootstrap_ci")
    // replicate means, CI window, point agg, final join — every
    // exchange carries (group) or (group, replicate) keys, never rows×B
    assert(!p.contains("SortAggregate"),
      "weighted sums must stay in hash aggregation")
    assert(shuffles(p) <= 4, s"shuffles=${shuffles(p)}")
  }

  test("expectation audit: one scan pass + broadcast anti join") {
    val p = plan("a37_expectation_audit")
    assert(broadcasts(p) >= 2, "customer dim + total must broadcast")
    // exactly ONE hash exchange: the uniqueness constraint's exact
    // count-distinct partials on the 8-byte key (map-side deduped —
    // inherent to exact uniqueness without bucketed input). Every other
    // constraint reduces to counters in the same global agg.
    assert(shuffles(p) == 1, s"shuffles=${shuffles(p)}")
  }

  test("silhouette: centroid table broadcasts into the corpus scan") {
    val p = plan("sim_silhouette")
    assert(broadcasts(p) >= 1)
    assert(!p.contains("CartesianProduct"),
      "label fan-out must ride the broadcast, not a cartesian")
  }

  test("ivfpq: candidate join is broadcast equi, ADC rides the LUT") {
    val p = plan("ann_ivfpq_topk")
    assert(broadcasts(p) >= 2, "probes + LUT broadcast")
    assert(!p.contains("CartesianProduct"))
  }

  test("regional cube family: fact table aggregated once, margins on the cube") {
    val p = plan("a56_location_quotient")
    // one cube agg + the window sorts over the 150-row cube; the nation
    // dim broadcasts
    assert(broadcasts(p) >= 1)
    assert(shuffles(p) <= 3, s"shuffles=${shuffles(p)}")
  }

  test("quantile normalize: count-table merge, never a range join") {
    val p = plan("a61_quantile_normalize")
    assert(!p.contains("CartesianProduct"))
    // allowed BNLs: the broadcast 1-row N constant and the |groups|-row
    // ref-replication fanout; anything more means a real range join crept in
    assert(
      "BroadcastNestedLoop".r.findAllIn(p).length <= 2,
      "inverse-CDF lookup must stay a union-merge window")
    // the merge window itself must be per-group (a global unpartitioned
    // window would serialise the merge)
    assert(p.contains("windowspecdefinition(grp"),
      "merge window must partition by grp")
  }

  test("LOF: blocked candidates equi-join, no cartesian anywhere") {
    val p = plan("sim_lof_outliers")
    assert(!p.contains("CartesianProduct"))
    assert(p.contains("TakeOrderedAndProject"), "top-20 via orderBy.limit")
  }

  test("single-aggregate statistics stay single-shuffle") {
    // McNemar / Cochran Q / Cronbach α are one corpus aggregate each —
    // a second exchange means someone added a per-document grouping
    for (n <- Seq("a79_mcnemar", "a80_cochran_q", "a82_cronbach_alpha")) {
      val p = plan(n)
      assert(shuffles(p) <= 1, s"$n shuffles=${shuffles(p)}")
      assert(!p.contains("CartesianProduct"), n)
    }
  }

  test("granger: checkpointed spine keeps both directions at 2 shuffles") {
    val p = plan("a78_granger_f")
    assert(shuffles(p) <= 2, s"shuffles=${shuffles(p)}")
  }

  test("jsd: one vocab-bounded token aggregate, totals broadcast") {
    val p = plan("t_jensen_shannon")
    assert(broadcasts(p) >= 1)
    assert(!p.contains("CartesianProduct"))
    assert(!p.contains("SortAggregate"), "token agg must stay hash")
  }

  // ---- PLANS.md batch 45 (round 8), enforced ----

  test("hyperball: BSP rounds are hash-agg exchange pairs, nothing cartesian") {
    val p = plan("d34_hyperball")
    assert(shuffles(p) >= 4, s"expected per-round exchange pairs:\n${p.take(400)}")
    assert(!p.contains("CartesianProduct") &&
      !p.contains("BroadcastNestedLoopJoin"), "register merge must stay keyed")
  }

  test("tukey: one moments aggregate touches data; the grid is broadcast-only") {
    val p = plan("a101_tukey_hsd")
    assert(shuffles(p) <= 2, s"shuffles=${shuffles(p)}")
    assert(broadcasts(p) >= 2, "pairwise grid + pooled row must broadcast")
  }

  test("qini: thresholds broadcast back, no global rank sort") {
    val p = plan("a102_qini_uplift")
    assert(broadcasts(p) >= 1, "decile thresholds must broadcast")
    assert(shuffles(p) <= 4, s"shuffles=${shuffles(p)}")
    // the only Sort allowed is the one under the cumulative Window over
    // the 10 decile rows — the plan ROOT region (trees print root
    // first), ABOVE every aggregate. A global-rank formulation would
    // root at a decile aggregate fed by a Sort over the raw user
    // exchange, putting the first HashAggregate BEFORE the Sort in the
    // string.
    val firstAgg = p.indexOf("HashAggregate")
    val firstSort = p.indexOf("Sort ")
    assert(firstAgg >= 0, "decile aggregate missing")
    assert(firstSort == -1 || firstSort < firstAgg,
      "Sort must sit above the decile aggregate, not under it on user rows")
  }

  test("wordpiece: vocab/transition frames broadcast into the walk") {
    val p = plan("t_wordpiece_fertility")
    assert(broadcasts(p) >= 3,
      "initial-piece, continuation-piece and char tables must broadcast")
    assert(!p.contains("CartesianProduct"))
  }

  test("semantic decontamination: corpus cached once, benchmark broadcast") {
    val p = plan("d_semantic_decontaminate")
    assert(p.contains("InMemoryTableScan"),
      "the normalised corpus must come from the shared cached relation")
    assert(broadcasts(p) >= 1, "benchmark side must broadcast")
    assert(!p.contains("CartesianProduct"), "corpus must never self-join")
  }

  // (the LSH no-text-in-exchange invariant lives in
  // graft.dedup.LshPlanSpec, where the candidate stage is visible;
  // f21's StaticInvoke/Invoke binding is pinned in FnCatalogSpec)
}
