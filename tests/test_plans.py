"""Physical-plan shape tests (SURVEY.md §4): the optimizer behaviors
this engine relies on at 100 TB must actually appear in the plans —
pushdown to the scan, column pruning, broadcast of dimensions, top-k
without global sort, partial aggregation, range-partitioned sort."""

from __future__ import annotations

from mr_py_spark.registry import load_all
from tests.conftest import SF_DIR

REG = load_all()


def plan_of(spark, name: str) -> str:
    df = REG[name].fn(spark, SF_DIR)
    return df._jdf.queryExecution().executedPlan().toString()


def test_q1_filter_pushdown_and_pruning(spark):
    p = plan_of(spark, "q1_pricing_summary")
    assert "PushedFilters: [IsNotNull(l_shipdate), LessThanOrEqual(l_shipdate" in p
    # column pruning: only the 7 referenced columns reach the scan
    scan = next(line for line in p.splitlines() if "ReadSchema" in line)
    assert "l_orderkey" not in scan and "l_partkey" not in scan
    # partial aggregation (the free combiner) before the exchange
    assert p.count("HashAggregate") >= 2


def test_q3_broadcasts_and_topk(spark):
    p = plan_of(spark, "q3_shipping_priority")
    assert "BroadcastHashJoin" in p
    assert "TakeOrderedAndProject" in p  # top-10 without a global sort
    assert "EqualTo(c_mktsegment,BUILDING)" in p  # filter reached the scan


def test_q5_dimension_broadcast(spark):
    p = plan_of(spark, "q5_local_supplier")
    assert "BroadcastHashJoin" in p
    assert "EqualTo(r_name,ASIA)" in p


def test_top_k_is_take_ordered(spark):
    assert "TakeOrderedAndProject" in plan_of(spark, "top_k")


def test_total_sort_is_range_partitioned(spark):
    assert "rangepartitioning" in plan_of(spark, "total_sort").lower()


def test_projection_prunes_scan(spark):
    p = plan_of(spark, "projection")
    scan = next(line for line in p.splitlines() if "ReadSchema" in line)
    for dropped in ("l_returnflag", "l_tax", "l_quantity", "l_suppkey"):
        assert dropped not in scan, f"{dropped} not pruned: {scan}"


def test_semi_join_stays_semi(spark):
    assert "LeftSemi" in plan_of(spark, "semi_join")


def test_knn_selfjoin_is_blocked_cogroup(spark):
    """The benchmark kNN must be the block-cogrouped matmul plan: no
    join and no cartesian row explosion — replication is an explode,
    the matmul runs inside an Arrow-batched cogroup — and crucially NO
    driver-side materialization of the corpus (the round-1 plan built
    a broadcast index via toPandas(), a driver OOM at 10^8 vectors)."""
    import inspect

    from mr_py_spark.operators import similarity

    p = plan_of(spark, "knn_selfjoin")
    assert "Join" not in p
    assert "CartesianProduct" not in p
    assert "FlatMapCoGroupsInArrow" in p or "FlatMapCoGroupsInPandas" in p
    src = inspect.getsource(similarity.knn_selfjoin)
    assert "toPandas" not in src and "collect(" not in src


def test_cosine_top_pairs_is_blocked_cogroup(spark):
    """Global top-100 pair mining must reuse the blocked-cogroup shape:
    candidate generation joins nothing (explode replication + Arrow
    cogroup matmul), the only joins are the bounded candidate re-rank
    equi-joins, and the global top-100 is a TakeOrdered merge, never a
    global sort of n^2 pairs."""
    p = plan_of(spark, "cosine_top_pairs")
    assert "CartesianProduct" not in p
    assert "BroadcastNestedLoopJoin" not in p
    assert "FlatMapCoGroupsInArrow" in p or "FlatMapCoGroupsInPandas" in p
    assert "TakeOrderedAndProject" in p


def test_ann_plans_have_no_cartesian(spark):
    """IVF and RP-LSH candidate generation must be equi-joins on
    bucket keys. The only nested-loop allowed is the broadcast of the
    fixed-size (_NLIST-row) centroid frame — a bounded build side, not
    a data-dependent product (exemption documented in CLAUDE.md)."""
    for name in (
        "knn_ivf_topk",
        "knn_ivf_multitable_topk",
        "knn_rplsh_topk",
        "knn_ivfpq_topk",
        "knn_ivf_topk_indexed",
        "knn_hier_topk_indexed",
        "incremental_semantic_dedup",
    ):
        p = plan_of(spark, name)
        assert "CartesianProduct" not in p, name


def test_incremental_semantic_dedup_reads_standing_index(spark):
    """The O(delta) semantic-dedup form (VERDICT r12 item 4): the
    corpus side is the persisted bucket-bucketed inverted file and the
    persisted centroid table — no Lloyd retrain collect, no corpus
    assignment pass at query time. MapInArrow (r17; MapInPandas
    before) is the DELTA's
    broadcast-argmax assignment (O(delta) by construction); pair
    verification is the bucket-cogrouped fold-order Arrow kernel,
    never a nested loop."""
    p = plan_of(spark, "incremental_semantic_dedup")
    assert "mrps_bkt_ivf_corpus_assign" in p
    assert "FlatMapCoGroupsInPandas" in p
    assert "CartesianProduct" not in p
    assert "BroadcastNestedLoopJoin" not in p


def test_knn_ivf_indexed_reads_standing_index(spark):
    """The indexed ANN form: the corpus side is the persisted
    bucket-bucketed inverted file — no quantizer training collect, no
    assignment pass, no raw embeddings scan (the only embeddings.parquet
    scan feeds the bounded query set)."""
    p = plan_of(spark, "knn_ivf_topk_indexed")
    assert "mrps_bkt_ivf_assign" in p
    assert "mrps_bkt_ivf_cent" in p
    # assignment never re-runs at query time (r17: the assign kernel is
    # MapInArrow now, so exclude both Python-stage forms)
    assert "MapInPandas" not in p and "MapInArrow" not in p
    # r16: inverted-file side pruned to the probed buckets (bounded isin)
    assert "PushedFilters: [In(bucket" in p or "bucket IN" in p


def test_knn_hier_indexed_reads_standing_index(spark):
    """The constant-cost hier serve tier: root centroids and the
    (bucket, leaf)-bucketed inverted file come from their persisted
    tables; the ONLY Python stage is the leaf-probe cogroup (no
    query-time assignment pass over the corpus), and candidates are an
    equi-join on the composite cell key."""
    p = plan_of(spark, "knn_hier_topk_indexed")
    assert "mrps_bkt_hier_assign_full" in p
    assert "mrps_bkt_hier_root_full" in p
    assert "mrps_bkt_hier_leaf_full" in p
    # assignment never re-runs at query time (r17: either Python form)
    assert "MapInPandas" not in p and "MapInArrow" not in p
    assert "FlatMapCoGroupsInPandas" in p  # the leaf probe
    assert "BroadcastNestedLoopJoin" in p  # bounded root broadcast only
    # r16: the candidate join's corpus side carries the bounded
    # probed-root isin, pushed to the parquet scan (without it the
    # candidate scan decoded ALL n rows at any probe selectivity)
    assert "PushedFilters: [In(bucket" in p or "bucket IN" in p


def test_knn_hier_pq_indexed_plan_shape(spark):
    """The ADC pre-rank serve tier (r14): candidates come from the
    standing (bucket, leaf)-bucketed CODE table (16-byte codes, never
    vectors), ADC is the one Arrow stage, the exact re-rank reads the
    assigned table with the probed-bucket `in` predicate PUSHED to the
    parquet scan (row-group skipping on the bucket-sorted files) under
    a broadcast join of the bounded shortlist — and nothing
    degenerates to a cartesian. r16 (VERDICT r15 item 1): the CANDIDATE
    join's codes-table side carries the same bounded probed-root isin,
    pushed to its parquet scan — without it every serve batch read the
    full codes table (r15 stage metrics: 126.9 MB vs 19.1 MB at 2M)."""
    p = plan_of(spark, "knn_hier_pq_topk_indexed")
    assert "mrps_bkt_hier_pq_codes" in p
    assert "mrps_bkt_hier_assign_full" in p  # re-rank only
    assert "MapInArrow" in p or "PythonMapInArrow" in p  # the ADC pass
    assert "CartesianProduct" not in p
    # the probed-bucket pruning reaches BOTH the codes-table candidate
    # scan and the re-rank's assigned scan
    assert p.count("PushedFilters: [In(bucket") >= 2, p.count(
        "PushedFilters: [In(bucket"
    )


def test_substring_dup_spans_plan_shape(spark):
    """Substring-span dedup keeps the gram-stream discipline: document
    frequency partial-aggregates before its exchange (a corpus-wide
    hot span ships one partial row per task), the position stream is
    re-annotated via a LEFT-SEMI equi-join (splittable probe side,
    never a gram-partitioned window), and the interval-merge windows
    are doc_id-keyed only — both riding ONE doc_id exchange."""
    p = plan_of(spark, "substring_dup_spans")
    assert "CartesianProduct" not in p
    assert "partial_count" in p
    assert "LeftSemi" in p
    assert p.count("Exchange hashpartitioning(doc_id") == 1
    for line in p.splitlines():
        if "windowspecdefinition" in line:
            assert "doc_id" in line.split("windowspecdefinition", 1)[1][:24], line


def test_substring_scrub_plan_shape(spark):
    """The rewrite half keeps the same gram-stream discipline as the
    removal plan, and the token rebuild is a doc_id-prefixed equi-join
    (never a position window or a cartesian)."""
    p = plan_of(spark, "substring_scrub")
    assert "CartesianProduct" not in p
    assert "partial_count" in p
    assert "LeftSemi" in p
    assert "windowspecdefinition" not in p


def test_bm25_plan_shape(spark):
    """BM25: tf/dl/df partial-aggregate before their exchanges, the
    bounded query-term table broadcasts, corpus stats ride the 1-row
    broadcast glue (the exempt nested loop), and nothing degenerates
    to a cartesian."""
    p = plan_of(spark, "bm25_retrieval")
    assert "CartesianProduct" not in p
    assert p.count("partial_count") >= 2
    assert "BroadcastNestedLoopJoin" in p  # the 1-row stats glue only


def test_emb_pca_whiten_projection_is_scan_plus_map(spark):
    """The whitening matrix is driver-resident (bounded moment
    collect); the returned projection pass must be a pure scan +
    mapInPandas — no join, no shuffle ahead of the Python stage."""
    p = plan_of(spark, "emb_pca_whiten")
    assert "Join" not in p
    assert "MapInPandas" in p
    assert "Exchange" not in p


def test_decontaminate_embeddings_no_join(spark):
    """The benchmark set is bounded and broadcast, so the scoring pass
    must be a pure scan + mapInPandas — no join of any kind and no
    shuffle ahead of the Python stage."""
    p = plan_of(spark, "decontaminate_embeddings")
    assert "Join" not in p
    assert "MapInPandas" in p


def test_minhash_has_no_cartesian(spark):
    """LSH candidate generation must be an equi-join on band buckets,
    never a cartesian/nested-loop product."""
    p = plan_of(spark, "dedup_minhash")
    assert "CartesianProduct" not in p
    assert "BroadcastNestedLoopJoin" not in p


def test_dedup_latest_map_side_group_limit(spark):
    """The keep-newest shuffle must be pruned map-side: a Partial
    WindowGroupLimit before the exchange means each task ships only
    its per-key leaders, not the full history — the property that
    makes the operator viable at 100 TB."""
    p = plan_of(spark, "dedup_latest")
    partial = next(
        (l for l in p.splitlines() if "WindowGroupLimit" in l and "Partial" in l), None
    )
    assert partial is not None, p
    assert p.index(partial) > p.index("Exchange hashpartitioning(user_id")


def test_q17_semi_broadcast_single_shuffle(spark):
    """Brand dim broadcasts as a semi join; the correlated threshold is
    a window over ONE l_partkey exchange (no join-back, nothing
    broadcast that scales with the part domain)."""
    p = plan_of(spark, "q17_small_qty_revenue")
    assert "LeftSemi, BuildRight" in p
    assert p.count("Exchange hashpartitioning(l_partkey") == 1
    assert "Window [" in p


def test_q21_single_lineitem_shuffle(spark):
    """Both existence tests ride one l_orderkey exchange of lineitem;
    the supplier dim broadcasts."""
    p = plan_of(spark, "q21_last_shipper")
    assert p.count("Exchange hashpartitioning(l_orderkey") == 1
    assert "BroadcastHashJoin [l_suppkey" in p


def test_boilerplate_ngrams_skew_safe_join_back(spark):
    """Cross-doc boilerplate scoring must be the groupBy + join-back
    formulation, NOT a count-over-window partitioned by gram: window
    partitions are unsplittable, so a ubiquitous trigram at corpus
    scale would pin billions of rows into one task. Required shape:
    document frequency via partial-aggregated groupBy(g) (skew-immune),
    survivors re-attached via an AQE-splittable LEFT equi-join on g,
    and NO Window over g anywhere."""
    p = plan_of(spark, "boilerplate_ngrams")
    assert "Window" not in p, p
    assert "CartesianProduct" not in p and "BroadcastNestedLoopJoin" not in p, p
    # partial agg (the free combiner) feeds the gram-frequency exchange
    assert p.count("HashAggregate") >= 4, p  # partial+final for df and per-doc
    # the join-back is a LEFT equi-join on g (broadcast when the
    # common-gram set is small, sort-merge/shuffled-hash + AQE skew
    # split otherwise — both fine; a cartesian/nested-loop never is)
    assert "LeftOuter" in p, p
    assert p.count("Exchange hashpartitioning(doc_id#") == 1, p


def test_doc_chunks_no_shuffle(spark):
    """Window chunking is scan + generate only — no exchange at any
    corpus size (the fan-out is per-row, never keyed)."""
    p = plan_of(spark, "doc_chunks")
    assert "Exchange" not in p
    assert "Generate explode" in p


def test_multi_sink_shares_one_scan(spark):
    """B28 job merging: once the shared source is persisted, BOTH sink
    plans read the in-memory relation — the parquet scan happens at
    most once (at cache materialization), not once per sink."""
    from mr_py_spark.operators.pipeline import multi_sink_plan

    docs, clean, stats = multi_sink_plan(spark, SF_DIR)
    docs = docs.persist()
    try:
        docs.count()  # materialize the shared scan
        for side in (clean, stats):
            p = side._jdf.queryExecution().executedPlan().toString()
            # the sink reads the cache; any parquet scan text can only
            # appear nested inside the InMemoryTableScan's description
            assert "InMemoryTableScan" in p, p
            assert p.index("InMemoryTableScan") < (
                p.index("Scan parquet") if "Scan parquet" in p else len(p)
            ), p
    finally:
        docs.unpersist()


def test_ranking_window_scaled_has_no_window_exec(spark):
    """The distributed two-pass rank must contain NO WindowExec (its
    entire point: window partitions cannot be split, range partitions
    can) and must carry the range exchange that makes it a splittable
    total-order plan."""
    p = plan_of(spark, "ranking_window_scaled")
    assert "Window" not in p, p
    assert "rangepartitioning" in p.lower(), p


def test_percentile_window_scaled_has_no_window_exec(spark):
    p = plan_of(spark, "percentile_window_scaled")
    assert "Window" not in p, p
    assert "rangepartitioning" in p.lower(), p


def test_rfm_segments_scaled_has_no_window_exec(spark):
    """The scale form replaces all three unpartitioned ntile(4)
    windows with two-pass range-partition ranks — no WindowExec (an
    unpartitioned window would pin every customer into ONE task)."""
    p = plan_of(spark, "rfm_segments_scaled")
    assert "Window" not in p, p
    assert "rangepartitioning" in p.lower(), p


def test_dpp_weekend_events_prunes_partitions(spark):
    """The fact scan must carry a dynamicpruning PartitionFilter fed
    by the broadcast dim subquery — the runtime partition prune is
    the query's whole point (a static plan would scan all 30 date
    partitions for 8 qualifying days)."""
    p = plan_of(spark, "dpp_weekend_events")
    assert "dynamicpruning" in p.lower(), p
    scan = next(
        line
        for line in p.splitlines()
        if "PartitionFilters" in line and "/fact" in line
    )
    assert "dynamicpruning" in scan.lower(), scan


def test_near_dup_lsh_has_no_cartesian(spark):
    """The scale form of threshold pair mining must generate
    candidates via the (band, key) equi-self-join — never the exact
    query's all-pairs nested loop."""
    p = plan_of(spark, "cosine_near_dup_pairs_lsh")
    assert "CartesianProduct" not in p
    assert "BroadcastNestedLoopJoin" not in p
    # the oracle-backed planted variant rides the same banded plan —
    # the oracle's all-pairs join exists DuckDB-side only
    p = plan_of(spark, "cosine_near_dup_pairs_lsh_planted")
    assert "CartesianProduct" not in p
    assert "BroadcastNestedLoopJoin" not in p


def test_scale_form_dispatch(spark, monkeypatch):
    """The dual-form default names must auto-select their scale-safe
    plan above the SPARK_GRAFT_SCALE_ROWS threshold, with bitwise-
    identical output: ranking/percentile windows lose their WindowExec
    and inverted_index bounds its per-buffer posting sort to range
    shards merged in shard order."""
    from mr_py_spark.operators import summarize, windows

    def rows_of(df):
        cols = df.columns
        return sorted(tuple(r[c] for c in cols) for r in df.collect())

    small = {
        name: rows_of(REG[name].fn(spark, SF_DIR))
        for name in (
            "ranking_window",
            "percentile_window",
            "inverted_index",
            "rfm_segments",
        )
    }
    monkeypatch.setenv("SPARK_GRAFT_SCALE_ROWS", "1")
    for name in ("ranking_window", "percentile_window", "rfm_segments"):
        df = REG[name].fn(spark, SF_DIR)
        p = df._jdf.queryExecution().executedPlan().toString()
        assert "Window" not in p, name
        assert rows_of(df) == small[name], name
    df = REG["inverted_index"].fn(spark, SF_DIR)
    p = df._jdf.queryExecution().executedPlan().toString()
    # two aggregation levels: (term, shard) then term
    assert "shard" in p
    assert rows_of(df) == small["inverted_index"]


def test_heavy_hitters_semi_prunes_before_agg(spark):
    """heavy_hitters' only full-width exchange must carry candidate
    rows alone: the exploded bigram stream is pruned by a broadcast
    LeftSemi join BEFORE the counting aggregate, the candidate frame
    is MapInPandas-built (no shuffle on the raw stream), and the
    1-row total join is the bounded broadcast cross CLAUDE.md exempts
    — no data-dependent cartesian."""
    p = plan_of(spark, "heavy_hitters")
    semi = p.find("BroadcastHashJoin")
    assert semi != -1 and "LeftSemi" in p
    assert "MapInArrow" in p  # the MG sketch pass (C-side value_counts)
    # the count agg consumes the semi-join output, not the raw stream:
    # partial_count must appear above (earlier in the printed tree
    # than) the semi join
    agg = p.find("partial_count")
    assert agg != -1 and agg < semi, p[:1200]
    assert "CartesianProduct" not in p
    scan = next(line for line in p.splitlines() if "ReadSchema" in line)
    assert "struct<text:string>" in scan, f"scan not pruned to text: {scan}"


def test_cosine_dup_clusters_no_cartesian(spark):
    """The embedding-dedup capstone inherits the LSH pair miner's
    equi-join-only guarantee; CC rounds are keyed equi-joins too."""
    p = plan_of(spark, "cosine_dup_clusters")
    assert "CartesianProduct" not in p
    assert "BroadcastNestedLoopJoin" not in p


def test_weighted_sample_is_take_ordered(spark):
    """A-ES weighted sampling must be per-task top-k heaps + driver
    merge (TakeOrderedAndProject), never a global sort of the corpus."""
    p = plan_of(spark, "weighted_sample_topk")
    assert "TakeOrderedAndProject" in p
    assert "Exchange rangepartitioning" not in p


def test_domain_cap_map_side_group_limit(spark):
    """The per-domain cap must prune map-side: a Partial WindowGroupLimit
    before the source exchange means each map task ships at most K rows
    per domain — the shuffle carries O(domains * K), not the corpus."""
    p = plan_of(spark, "domain_cap")
    partial = next(
        (l for l in p.splitlines() if "WindowGroupLimit" in l and "Partial" in l), None
    )
    assert partial is not None, p
    assert p.index(partial) > p.index("Exchange hashpartitioning(source")


def test_incremental_dedup_digest_only_anti_join(spark):
    """Delta-vs-corpus dedup must anti-join on digests, never products:
    the corpus side of the join carries only its key column."""
    p = plan_of(spark, "incremental_dedup")
    assert "LeftAnti" in p
    assert "CartesianProduct" not in p
    assert "BroadcastNestedLoopJoin" not in p


def test_ngram_token_arrays_stay_bound(spark):
    """The O(tokens^2) guard (SCALE.md r7): every n-gram transform must
    reference a token array MATERIALIZED in its own projection. If the
    split expression ever collapses into the lambda body again (plan
    text would contain `element_at(split(`), each element access
    re-tokenizes the document — quadratic per-row work that no row
    count or oracle can catch."""
    for name in (
        "bigram_counts",
        "heavy_hitters",
        "lm_perplexity_score",
        "boilerplate_ngrams",
        "dedup_minhash",
        "decontaminate_ngrams",
    ):
        df = REG[name].fn(spark, SF_DIR)
        p = df._jdf.queryExecution().optimizedPlan().toString()
        assert "element_at(split(" not in p, name


def test_image_dup_pairs_band_join_no_cartesian(spark):
    """Perceptual-hash pair mining must generate candidates via the
    (band, value) equi-join — never an all-pairs product over the
    image corpus (the same bound as dedup_minhash, C2's LSH class)."""
    p = plan_of(spark, "image_dup_pairs")
    assert "CartesianProduct" not in p
    assert "BroadcastNestedLoopJoin" not in p


def test_event_trigrams_topk_is_take_ordered(spark):
    """The global top-20 over the bounded trigram alphabet must
    compile to TakeOrderedAndProject — never a full global sort of
    the count table."""
    p = plan_of(spark, "event_trigrams")
    assert "TakeOrderedAndProject" in p


def test_audience_overlap_totals_are_broadcast(spark):
    """The per-type reach totals (|types| rows) must join back via
    broadcast; the only real shuffles are the (user, type) dedup and
    the pair count."""
    p = plan_of(spark, "audience_overlap")
    assert "BroadcastHashJoin" in p
    assert "CartesianProduct" not in p


def test_spatial_radius_join_is_cell_equi_join(spark):
    """Candidate generation must be the grid-cell equi-join (facility
    3x3 ring explode -> hash join on cell id) — never the oracle's
    all-pairs theta join."""
    p = plan_of(spark, "spatial_radius_join")
    assert "CartesianProduct" not in p
    assert "BroadcastNestedLoopJoin" not in p


def test_fk_audit_scans_lineitem_once(spark):
    """The fused audit's contract: a child table carrying several FK
    edges is scanned once (explode to (edge, key)), not once per
    edge. The per-edge control (fk_audit_per_edge) scans it three
    times."""
    p = plan_of(spark, "fk_integrity_audit")
    assert p.count("lineitem.parquet") == 1, p.count("lineitem.parquet")


def test_audio_dup_pairs_band_join_no_cartesian(spark):
    """Audio near-dup candidates come from the (band, value)
    equi-join, never an all-pairs product (same bar as
    image_dup_pairs)."""
    p = plan_of(spark, "audio_dup_pairs")
    assert "CartesianProduct" not in p
    assert "BroadcastNestedLoopJoin" not in p


def test_video_dup_pairs_inverted_index_no_cartesian(spark):
    """Video near-dup candidates come from the frame-hash inverted
    index equi-join, never an all-pairs product (same bar as the
    image/audio band joins)."""
    p = plan_of(spark, "video_dup_pairs")
    assert "CartesianProduct" not in p
    assert "BroadcastNestedLoopJoin" not in p


def test_video_dup_pairs_capped_broadcast_anti_join(spark):
    """The production df-capped form: the hot-hash strip is a
    broadcast ANTI join (the hot set is tiny by definition), candidate
    generation stays the inverted-index equi-join — no cartesian, no
    nested loop."""
    p = plan_of(spark, "video_dup_pairs_capped")
    assert "CartesianProduct" not in p
    assert "BroadcastNestedLoopJoin" not in p
    assert "LeftAnti" in p and "BroadcastHashJoin" in p


def test_dedup_containment_rare_gram_block_no_cartesian(spark):
    """Containment candidates come from the rare-gram (df in [2,4])
    equi-join, never an all-pairs product; the df cap bounds per-gram
    fan-out at C(4,2) pairs, so no AQE skew rescue is ever needed.
    The n-gram token array must also stay bound (the O(tokens^2)
    inline-split guard)."""
    p = plan_of(spark, "dedup_containment")
    assert "CartesianProduct" not in p
    assert "BroadcastNestedLoopJoin" not in p
    assert "element_at(split(" not in p


def test_partsupp_queries_broadcast_dims_no_cartesian(spark):
    """The derived-partsupp TPC-H trio must broadcast every dimension
    and contain no data-dependent product — the only nested loop
    allowed is the 1-row supplier-count (and q11 total) glue, the
    bounded-broadcast class CLAUDE.md exempts."""
    for name in (
        "q2_min_cost_supplier",
        "q11_important_stock",
        "q20_potential_promotion",
    ):
        p = plan_of(spark, name)
        assert "CartesianProduct" not in p, name
        assert "BroadcastHashJoin" in p, name


def test_attribution_multi_touch_single_exchange(spark):
    """The path-size window keys on (user_id, conv_id) so it reuses
    the per-user window's hashpartitioning(user_id): exactly ONE
    Exchange may precede the two WindowExecs (the r9 bare-conv_id
    form paid a second full-stream shuffle there)."""
    p = plan_of(spark, "attribution_multi_touch")
    pre_agg = p.split("HashAggregate")[-1]  # below the channel agg
    assert pre_agg.count("Exchange hashpartitioning") == 1, pre_agg


def test_q20_shipdate_pushdown_and_pruned_scan(spark):
    """The lineitem date filter must reach the parquet scan
    (PushedFilters) and the scan must read only the four needed
    columns — the 60M-row aggregate is the whole cost of Q20."""
    p = plan_of(spark, "q20_potential_promotion")
    assert "GreaterThanOrEqual(l_shipdate" in p, p
    assert "struct<l_partkey:bigint,l_suppkey:bigint,l_quantity:double,l_shipdate" in p


def test_training_pipeline_no_cartesian_anti_join(spark):
    """The five-stage pipeline composes into one plan: contaminated
    ids leave via LeftAnti, the eval n-gram set broadcasts, and no
    stage introduces a product."""
    p = plan_of(spark, "training_pipeline_summary")
    assert "CartesianProduct" not in p
    assert "LeftAnti" in p
    assert "BroadcastHashJoin" in p


def test_ewma_daily_is_grouped_pandas_fold(spark):
    """The EWMA recurrence runs as one applyInPandas over the
    day-aggregated frame — groups bounded by calendar length, raw
    events never cross into Python."""
    p = plan_of(spark, "ewma_daily")
    assert "FlatMapGroupsInPandas" in p or "FlatMapGroupsInArrow" in p, p
    assert p.count("HashAggregate") >= 2  # daily rollup below the fold


def test_q5_bucketed_fact_join_no_exchange(spark):
    """q5_bucketed's whole point: lineitem ⋈ orders runs as a
    co-bucketed sort-merge join with ZERO exchange on either fact
    side. Broadcast is disabled for the assertion (tiny test tables
    would broadcast the orders side, which bypasses bucketing — the
    100 TB shape is the SMJ), mirroring
    tests/test_sinks.py::test_bucketed_join_skips_shuffle."""
    from mr_py_spark.operators.bucketed import q5_bucketed
    from tests.conftest import SF_DIR as _SF

    # build FIRST: harden() inside tbl() re-raises a '-1' adaptive
    # broadcast threshold, so confs must be pinned after the lazy build
    df = q5_bucketed(spark, _SF)
    prev = spark.conf.get("spark.sql.autoBroadcastJoinThreshold")
    prev_aqe = spark.conf.get("spark.sql.adaptive.autoBroadcastJoinThreshold", "")
    spark.conf.set("spark.sql.autoBroadcastJoinThreshold", "-1")
    spark.conf.set("spark.sql.adaptive.autoBroadcastJoinThreshold", "-1")
    try:
        df.collect()
        p = df._jdf.queryExecution().executedPlan().toString()
    finally:
        spark.conf.set("spark.sql.autoBroadcastJoinThreshold", prev)
        if prev_aqe:
            spark.conf.set("spark.sql.adaptive.autoBroadcastJoinThreshold", prev_aqe)
        else:
            spark.conf.unset("spark.sql.adaptive.autoBroadcastJoinThreshold")
    # the orderkey join is a sort-merge join fed by bucketed scans:
    # neither side may shuffle on the order key
    assert "SortMergeJoin [l_orderkey" in p, p[:3000]
    assert "Exchange hashpartitioning(l_orderkey" not in p, p[:3000]
    assert "Exchange hashpartitioning(o_orderkey" not in p, p[:3000]
    from mr_py_spark.operators.bucketed import _BUCKETS

    assert "Bucketed: true" in p
    assert f"SelectedBucketsCount: {_BUCKETS} out of {_BUCKETS}" in p
    # ASIA prune + date filter still reach the scans
    assert "EqualTo(r_name,ASIA)" in p
    assert "PushedFilters: [IsNotNull(o_orderdate), GreaterThanOrEqual(o_orderdate" in p


def test_q5_bucketed_matches_shuffle_form(spark):
    """Same answer from the bucketed layout as from the plain-parquet
    shuffle form, bitwise (both also share one oracle)."""
    a = sorted(map(tuple, REG["q5_bucketed"].fn(spark, SF_DIR).collect()))
    b = sorted(map(tuple, REG["q5_local_supplier"].fn(spark, SF_DIR).collect()))
    assert a == b


def test_skew_join_stress_aqe_splits_hot_partition(spark, monkeypatch):
    """skew_join_stress end-to-end: AQE's OptimizeSkewedJoin must
    detect the zipf-hot post-shuffle partition and split it
    (SortMergeJoin(skew=true) + an 'and skewed' AQEShuffleRead) with
    NO salting in the query. Two fixture-scale adaptations, neither
    changing the plan shape under test: (1) the input is repartitioned
    so the jk shuffle has >1 mapper — the fixture parquet is a single
    row group, i.e. one map task, and AQE cannot split a reduce
    partition below map-output granularity; (2) skew thresholds are
    lowered to fixture bytes AFTER the (lazy) DataFrame is built,
    because harden() treats '-1' broadcast thresholds as unset and
    would re-raise them during tbl()."""
    import mr_py_spark.operators.skew as skewmod
    from mr_py_spark.sources import tbl as real_tbl

    monkeypatch.setattr(
        skewmod, "tbl", lambda s, sf, name: real_tbl(s, sf, name).repartition(16)
    )
    df = skewmod.skew_join_stress(spark, SF_DIR)
    confs = {
        "spark.sql.autoBroadcastJoinThreshold": "-1",
        "spark.sql.adaptive.autoBroadcastJoinThreshold": "-1",
        "spark.sql.adaptive.shuffledHashJoinLocalMapThreshold": "0",
        "spark.sql.adaptive.skewJoin.skewedPartitionThresholdInBytes": "1KB",
        "spark.sql.adaptive.advisoryPartitionSizeInBytes": "512b",
        "spark.sql.adaptive.skewJoin.skewedPartitionFactor": "1.0",
        "spark.sql.adaptive.forceOptimizeSkewedJoin": "true",
    }
    prev = {k: spark.conf.get(k, None) for k in confs}
    for k, v in confs.items():
        spark.conf.set(k, v)
    try:
        rows = {r.band: r.n_events for r in df.collect()}
        p = df._jdf.queryExecution().executedPlan().toString()
    finally:
        for k, v in prev.items():
            spark.conf.set(k, v) if v is not None else spark.conf.unset(k)
    assert "SortMergeJoin(skew=true)" in p, p[:3000]
    assert "skewed" in p, p[:3000]
    # the zipf transform really is skewed: the <= 4 hot keys carry ~80%
    assert rows["hot"] > 3 * rows["cold"], rows


def test_q3_bucketed_fact_join_no_exchange(spark):
    """q3_bucketed's 100 TB shape: the BUILDING-customer membership is
    a BROADCAST semi join on the orders side (broadcasts preserve the
    streamed side's bucket partitioning), so lineitem ⋈ orders runs as
    an SMJ with ZERO exchange anywhere, and the top-10 needs no global
    sort. Thresholds are pinned to a value where the tiny customer key
    set broadcasts but the facts do not (fully disabling broadcast is
    the WRONG stress here: Catalyst then pushes the semi down as an
    SMJ on custkey, which legitimately re-partitions orders — the
    bucketed layout's payoff is precisely that the dim membership can
    ride a broadcast). Set AFTER the lazy build — harden() re-raises
    '-1' adaptive thresholds."""
    from mr_py_spark.operators.bucketed import q3_bucketed
    from tests.conftest import SF_DIR as _SF

    df = q3_bucketed(spark, _SF)
    prev = spark.conf.get("spark.sql.autoBroadcastJoinThreshold")
    prev_aqe = spark.conf.get("spark.sql.adaptive.autoBroadcastJoinThreshold", "")
    spark.conf.set("spark.sql.autoBroadcastJoinThreshold", "16KB")
    spark.conf.set("spark.sql.adaptive.autoBroadcastJoinThreshold", "16KB")
    try:
        df.collect()
        p = df._jdf.queryExecution().executedPlan().toString()
    finally:
        spark.conf.set("spark.sql.autoBroadcastJoinThreshold", prev)
        if prev_aqe:
            spark.conf.set("spark.sql.adaptive.autoBroadcastJoinThreshold", prev_aqe)
        else:
            spark.conf.unset("spark.sql.adaptive.autoBroadcastJoinThreshold")
    final = p.split("== Initial Plan ==")[0]
    assert "SortMergeJoin [l_orderkey" in final, final[:3000]
    assert "Exchange hashpartitioning" not in final, final[:3000]
    assert "BroadcastHashJoin [o_custkey" in final and "LeftSemi" in final
    assert "TakeOrderedAndProject" in final
    # both date filters reached the bucketed scans
    assert "PushedFilters: [IsNotNull(l_shipdate), GreaterThan(l_shipdate" in final
    assert "PushedFilters: [IsNotNull(o_orderdate), LessThan(o_orderdate" in final


def test_q3_bucketed_matches_shuffle_form(spark):
    a = sorted(map(tuple, REG["q3_bucketed"].fn(spark, SF_DIR).collect()))
    b = sorted(map(tuple, REG["q3_shipping_priority"].fn(spark, SF_DIR).collect()))
    assert a == b


def test_incremental_minhash_dedup_no_cartesian(spark):
    """Delta-vs-corpus and within-delta candidates both come from band
    equi-joins; the corpus contributes only its LSH index columns."""
    p = plan_of(spark, "incremental_minhash_dedup")
    assert "CartesianProduct" not in p
    assert "band_key" in p
    # corpus text never crosses the join: only doc_id/signature/band
    # columns appear in the candidate-join ReadSchemas beyond the scan
    scans = [l for l in p.splitlines() if "ReadSchema" in l]
    assert scans, p[:2000]


def test_incremental_minhash_indexed_reads_index_not_text(spark):
    """The standing-index form (incremental_minhash_dedup_indexed):
    cartesian-free, and the corpus side is the materialized bucketed
    index table — corpus TEXT is never scanned (the only text scans
    belong to the delta), so the per-snapshot cost excludes the corpus
    re-shingling pass entirely."""
    p = plan_of(spark, "incremental_minhash_dedup_indexed")
    assert "CartesianProduct" not in p
    assert "mrps_bkt_lsh_bands" in p  # the standing index scan
    # every scan that reads `text` also reads doc_id with the delta's
    # bucket filter pushed down; the index scans read mh*/band columns
    text_scans = [
        l for l in p.splitlines() if "ReadSchema" in l and "text:string" in l
    ]
    assert text_scans, p[:3000]
    for line in text_scans:
        assert "mrps_bkt_lsh_bands" not in line
    idx_scans = [l for l in p.splitlines() if "mrps_bkt_lsh_bands" in l and "ReadSchema" in l]
    assert idx_scans and all("text" not in l for l in idx_scans)


def test_temperature_sampling_broadcasts_rate_table(spark):
    """The per-stratum rate table (|langs| rows) must broadcast into
    the acceptance scan, and the only nested loop is the 1-row min
    glue (the bounded-aggregate exemption, CLAUDE.md)."""
    p = plan_of(spark, "temperature_sampling")
    assert "CartesianProduct" not in p
    assert "BroadcastHashJoin" in p
    # both aggregations partial-agg before their exchange
    assert p.count("HashAggregate") >= 4


def test_dedup_minhash_capped_broadcast_anti_join(spark):
    """The stop-bucket strip is a broadcast ANTI join ahead of the band
    self-join; candidate generation stays the band equi-join — no
    cartesian, no nested loop."""
    p = plan_of(spark, "dedup_minhash_capped")
    assert "CartesianProduct" not in p
    assert "BroadcastNestedLoopJoin" not in p
    assert "LeftAnti" in p and "BroadcastHashJoin" in p


def test_lsh_index_side_exchange_free_under_shuffle_join(spark):
    """The standing-index claim under the WORST case (delta too big to
    broadcast, forced shuffle join): the bucketed index scan must feed
    its SortMergeJoin with NO Exchange — co-partitioning holds because
    the bucket spec is the FULL join key set (band_id, band_key); the
    r11 plan audit showed a band_key-only spec re-exchanges. Confs are
    set AFTER the lazy frame per the r10 gotcha, and the plan is read
    from the executed handle."""
    df = REG["incremental_minhash_dedup_indexed"].fn(spark, SF_DIR)
    spark.conf.set("spark.sql.autoBroadcastJoinThreshold", "-1")
    spark.conf.set("spark.sql.adaptive.autoBroadcastJoinThreshold", "0b")
    try:
        df.collect()
        p = df._jdf.queryExecution().executedPlan().toString()
    finally:
        spark.conf.unset("spark.sql.autoBroadcastJoinThreshold")
        spark.conf.unset("spark.sql.adaptive.autoBroadcastJoinThreshold")

    def indent(line: str) -> int:
        # ":- " marks a first child in toString trees (r17: without it
        # a ":- Sort" sibling-branch line read as leading-whitespace
        # indent — SHALLOWER than the true tree position — which made
        # the upward ancestor walk skip the very SortMergeJoin it was
        # looking for and false-flag the aggregation exchange above it)
        for marker in ("+- ", ":- ", "Scan ", "FileScan "):
            i = line.find(marker)
            if i >= 0:
                return i
        return len(line) - len(line.lstrip())

    # AQE renders "== Final Plan ==" then "== Initial Plan =="; the
    # initial section still shows the pre-AQE planned exchanges, so
    # only the final section is evidence.
    lines = p.split("== Initial Plan ==")[0].splitlines()
    scan_idxs = [
        i for i, l in enumerate(lines)
        if "FileScan" in l and "lsh_bands_k2" in l
    ]
    assert scan_idxs, p[:3000]
    checked = 0
    for si in scan_idxs:
        cur = indent(lines[si])
        for j in range(si - 1, -1, -1):
            ind = indent(lines[j])
            if ind < cur:  # an ancestor of the scan
                cur = ind
                if "SortMergeJoin" in lines[j] and "band_key" in lines[j]:
                    checked += 1
                    break
                assert "Exchange" not in lines[j], (
                    f"index side re-exchanged:\n{lines[j]}\n...\n{lines[si]}"
                )
    assert checked == len(scan_idxs), p[:3000]


def test_lsh_gauge_delta_probe_plan(spark, tmp_path):
    """The O(delta) gauge bump's occupancy probe (VERDICT r14 item 1):
    the index side must be ONE map-only scan — the delta keys arrive
    by broadcast left-semi BEFORE the groupBy, so the aggregation
    state is bounded by the delta's key count and the bucketed scan
    feeds its partial agg with NO Exchange (no shuffle of index-sized
    data anywhere in the probe)."""
    from mr_py_spark.operators.bucketed import _BUCKETS
    from mr_py_spark.operators.dedup import (
        _LSH_INDEX_KEYS,
        _lsh_gauge_delta_frame,
        lsh_band_entries,
        minhash_signatures,
    )
    from mr_py_spark.sources.sinks import write_bucketed

    docs = spark.createDataFrame(
        [(i, f"gauge plan probe text {i % 3} " * 5) for i in range(30)],
        "doc_id long, text string",
    )
    table = "t_gauge_plan"
    spark.sql(f"DROP TABLE IF EXISTS {table}")
    try:
        write_bucketed(
            lsh_band_entries(minhash_signatures(docs)), table,
            _LSH_INDEX_KEYS, _BUCKETS, path=str(tmp_path / "idx"),
        )
        delta = lsh_band_entries(
            minhash_signatures(
                spark.createDataFrame(
                    [(100, "gauge plan probe text 0 " * 5)],
                    "doc_id long, text string",
                )
            )
        )
        df = _lsh_gauge_delta_frame(spark, table, delta)
        df.collect()
        p = df._jdf.queryExecution().executedPlan().toString()
        lines = p.split("== Initial Plan ==")[0].splitlines()
        scan_idxs = [
            i for i, l in enumerate(lines)
            if "FileScan" in l and "t_gauge_plan" in l
        ]
        assert len(scan_idxs) == 1, p[:3000]  # ONE pass over the index

        def indent(line: str) -> int:
            for marker in ("+- ", "Scan ", "FileScan "):
                i = line.find(marker)
                if i >= 0:
                    return i
            return len(line) - len(line.lstrip())

        # ancestor walk: between the index scan and its first
        # HashAggregate there must be only the broadcast semi join —
        # never an Exchange (the index side shuffles nothing)
        si = scan_idxs[0]
        cur = indent(lines[si])
        saw_semi = False
        for j in range(si - 1, -1, -1):
            ind = indent(lines[j])
            if ind < cur:
                cur = ind
                if "HashAggregate" in lines[j]:
                    break
                if "BroadcastHashJoin" in lines[j]:
                    assert "LeftSemi" in lines[j], lines[j]
                    saw_semi = True
                assert "Exchange" not in lines[j], (
                    f"index side shuffled before its partial agg:\n"
                    f"{lines[j]}\n...\n{lines[si]}"
                )
        assert saw_semi, p[:3000]
    finally:
        spark.sql(f"DROP TABLE IF EXISTS {table}")


def test_incremental_semantic_dedup_hier_reads_standing_index(spark):
    """The hierarchical O(delta) semantic form (VERDICT r12 item 1):
    the corpus side is the persisted (bucket, leaf)-bucketed inverted
    file — no retrain, no corpus re-assignment at query time; delta
    root assignment is the broadcast-argmax Arrow pass and every
    candidate stage is a cogroup on cell keys, never a product. The
    leaf-centroid table is joined through its own standing table, not
    broadcast (it outgrows any broadcast budget at scale)."""
    p = plan_of(spark, "incremental_semantic_dedup_hier")
    assert "mrps_bkt_hier_corpus_assign" in p
    assert "mrps_bkt_hier_leaf_cent" in p
    assert "FlatMapCoGroupsInPandas" in p
    assert "CartesianProduct" not in p
    assert "BroadcastNestedLoopJoin" not in p


def test_multimodal_indexed_forms_read_standing_index(spark):
    """The indexed multimodal forms must consume their persisted
    bucketed tables — no per-run decode (MapInPandas) anywhere in the
    plan — and stay cartesian-free like every blocking join."""
    for name, tbl_marker in (
        ("image_dup_pairs_indexed", "mrps_bkt_img_bands"),
        ("audio_dup_pairs_indexed", "mrps_bkt_au_bands"),
        ("video_dup_pairs_indexed", "mrps_bkt_video_frames"),
    ):
        p = plan_of(spark, name)
        assert tbl_marker in p, name
        assert "MapInPandas" not in p, name  # decode never re-runs
        assert "CartesianProduct" not in p, name
        assert "BroadcastNestedLoopJoin" not in p, name


def test_incremental_substring_reads_standing_gram_index(spark):
    """The O(delta) substring form: corpus grams arrive as the
    persisted g-bucketed df table (no corpus re-tokenization at query
    time — the only documents scan feeds the delta split), candidate
    annotation is equi-join shaped, and the interval merge stays
    doc_id-keyed."""
    p = plan_of(spark, "incremental_substring_dedup")
    assert "mrps_bkt_sub_gram_df" in p
    assert "CartesianProduct" not in p
    assert "LeftSemi" in p
    for line in p.splitlines():
        if "windowspecdefinition" in line:
            assert "doc_id" in line.split("windowspecdefinition", 1)[1][:24], line
