"""BENCH harness: run the headline declared queries at $SPARK_GRAFT_SF_DIR
(default /root/testdata/sf0.1) on local[$SPARK_GRAFT_CPUS] and print ONE
JSON line: {"metric": ..., "value": total_sec, "unit": "sec",
"queries": {name: sec}, "sf": ...}.

The headline set covers every execution shape the engine claims: scan+agg
(q1), multi-join (q3/q5), window (top3/running), set/distinct, the xmlpipe2
kernel (sdbm ids + document assembly — the reference's entire workload),
and the §2D extensions (dedup exact/minhash/jaccard, cosine top-k, text
analysis). Each query is forced by xxhash64-folding EVERY column into one
scalar (see _force) so the timing is the full plan execution including
all projected columns — a bare count() would let Catalyst prune unused
projections (UDF columns especially) — without driver-side collection
bandwidth.

BASELINE.md context: the reference is a single-threaded row-at-a-time
exporter; its measured proxy here is `xmlpipe_orders_export` /
`xmlpipe_lineitem_export` throughput.
"""

from __future__ import annotations

import json
import os
import sys
import time

sys.path.insert(0, os.path.dirname(os.path.abspath(__file__)))

SF_DIR = os.environ.get("SPARK_GRAFT_SF_DIR", "/root/testdata/sf0.1")

#: name -> queries() key (headline subset; full surface runs in the
#: driver's correctness gate, which is row-for-row, not timed)
#:
#: CURATION RULE (decided round 10, before the ceiling forces a cut):
#: tests/test_plans.py::test_bench_line_fits_driver_tail_window pins the
#: driver's 2000-char stdout tail as the hard width budget, which at
#: current name lengths is ~70 queries. HARD CAP: 65 entries. When an
#: addition would cross 65, drop queries in this order until it fits:
#:   1. within the most-represented family (dedup_/text_/events_/
#:      streaming_/xmlpipe_/q*), drop the CHEAPEST member by RECORDS —
#:      every family always keeps its most expensive member;
#:   2. never drop the TPC-H heavies (q1/q3/q5/q7/q8/q9/q17/q21/q2) —
#:      they are the cross-round comparability anchor vs BASELINE.md;
#:   3. dropped queries stay in the driver's correctness gate (which is
#:      the full 150+ surface) — the bench cut loses a timing row only.
HEADLINE = [
    "q1_pricing_summary",
    "q3_shipping_priority",
    "q5_local_supplier_volume",
    "q8_market_share",
    "q17_small_quantity_revenue",
    "topk_orders",
    "outer_join_order_distribution",
    "window_top3_orders_per_customer",
    "window_running_revenue",
    "distinct_counts",
    "events_sessionize",
    "doc_id_sdbm_customer",
    "xmlpipe_orders_export",
    "xmlpipe_lineitem_export",
    # dedup_exact_hash_groups dropped in round 11 by the curation rule
    # below: the round-11 additions crossed the 65 cap, dedup_ is the
    # most-represented family, and exact_hash_groups is its cheapest
    # member by RECORDS (0.212 s). It remains in the driver's full
    # correctness gate.
    "dedup_minhash_lsh",
    "dedup_ngram_jaccard",
    "dedup_cluster_assign",
    "similarity_cosine_topk",
    "text_quality_scores",
    # text_langid_heuristic (0.454 s) dropped in round 12 (same rule,
    # text_ family; still in the correctness gate).
    "text_tfidf_top_terms",
    "doc_pack_sequences",
    # round-5 additions: A4 array export, B9 token kernel, and the
    # Structured Streaming execution path (availableNow → memory sink)
    "xmlpipe_embeddings_export",
    "token_orders_murmur3",
    "streaming_tumbling_window",
    "text_repetition_scores",
    "text_crossdoc_ngram_dup",
    # round-6 additions: stateful streaming (session windows), paragraph
    # dedup, and the codec-true BMP decode path
    "streaming_session_window",
    "multimodal_image_features_codec",
    # round-6 TPC-H completion (plans/tpch.py): the heavier join shapes —
    # bilateral nation pairing, profit rollup, sole-late-supplier
    # decorrelation, correlated-min bridge
    "q7_volume_shipping",
    "q9_product_profit",
    "q21_late_suppliers",
    "q2_min_cost_supplier",
    "text_decontaminate_eval_overlap",
    # round-6 wave 2: sequence analytics + the streaming dedup state path
    "events_funnel_conversion",
    "events_cohort_retention",
    "streaming_watermark_dedup",
    "corpus_mix_resample",
    "events_peak_concurrency",
    "phrase_search_postings",
    # round-6 wave 3: clustering, vocab audit, corpus overlap, prefix dedup
    "embedding_kmeans_step",
    "embedding_kmeans_iter3",
    "text_vocab_oov",
    "source_overlap_jaccard",
    # dedup_prefix_hash_groups (0.347 s) and dedup_paragraphs (0.582 s)
    # dropped in round 12 by the curation rule: the round-12 additions
    # crossed the cap and dedup_ is the most-represented family; both
    # remain in the driver's full correctness gate.
    "dedup_graph_degree",
    "events_user_ewma",
    "streaming_user_profile_state",
    # round-6 wave 4: journey mining, association lift, dedup survivors
    "events_session_paths",
    "text_term_cooccurrence",
    "dedup_survivor_selection",
    # round-6 wave 5: metadata audit, anomaly detection, sequence stats
    "text_lang_confusion",
    "events_value_outliers",
    "events_type_transitions",
    "events_interarrival_histogram",
    # round-6 wave 6: variant extraction, incremental-ingest dedup
    "variant_extraction_events",
    "dedup_incremental_probe",
    # round-8: the linear-output dedup contract (cluster rosters, not
    # C(k,2) pairs) and the append-mode production session-window plan
    "dedup_minhash_groups",
    "streaming_session_window_append",
    # round-10: the embedding roster contract, the sampled recall
    # health check (the production-cost replacements for the pair
    # contract and the exact recall gate), and the embedding
    # incremental-ingest probe
    "dedup_embedding_groups",
    "dedup_minhash_recall_sampled",
    # dedup_embedding_incremental dropped in round 13 by the curation
    # rule: adding similarity_radius_banded_recall (the banded radius
    # machinery's timing row — candidate join + identical-verify + live
    # recall vs the exact path) crossed the 65 cap, dedup_ is the
    # most-represented family, and embedding_incremental is its cheapest
    # member by RECORDS (0.8 s). It remains in the correctness gate.
    # round-12 session-2 additions: the PQ ANN variant (the heaviest
    # similarity timing row — per-subspace KMeans + encode + ADC +
    # re-rank), the self-trained bigram-LM quality scorer, and SemDeDup
    # (kmeans + within-cluster cosine pruning on the planted corpus)
    "similarity_pq_topk",
    # round-13 addition: the banded radius path (sign-key candidates +
    # identical hoisted-norm verify) timed against its exact twin
    "similarity_radius_banded_recall",
    "text_bigram_lm_score",
    "semdedup_prune",
    # round-11: the embedding-family sampled recall health check and the
    # incremental ROSTER maintenance contract (per-ingest upsert path).
    # Its embedding twin (dedup_embedding_incremental_rosters) is
    # deliberately GATE-ONLY: the list sits at the 65 cap, the twin
    # shares the text contract's quotient machinery timing-wise, and
    # adding it would cost another dedup-family timing row by the
    # curation rule above.
    "dedup_embedding_recall_sampled",
    "dedup_incremental_rosters",
    # round-12 additions are GATE-ONLY by the curation rule: the list
    # sits at the 65 cap and all ride already-timed machinery —
    # dedup_incremental_rosters_delta is the emit="delta" projection of
    # dedup_incremental_rosters (same probe+quotient-CC cost, smaller
    # output), dedup_embedding_incremental_subset_planted the planted
    # positive path of dedup_embedding_incremental's probe join,
    # multimodal_audio_features[_codec] / multimodal_audio_resample_codec
    # the audio siblings of the timed
    # multimodal_image_features_codec mapInPandas shape, and
    # text_compressibility one Arrow-batched scalar UDF projection over
    # the documents scan (the shape text_quality_scores already times),
    # and text_dup_spans the gram-hash machinery text_crossdoc_ngram_dup
    # already times plus one partition-local window.
    # round-14 additions are GATE-ONLY by the same rule: the list sits
    # at the cap and both ride already-timed machinery —
    # similarity_ivfpq_topk composes the per-subspace-KMeans + encode +
    # numpy-ADC + re-rank shape similarity_pq_topk already times (plus
    # one same-class coarse KMeans; its scale story is the STAGED
    # measurement in SCALE.md, which the per-call gate shape would not
    # show), and text_bm25_topk rides the tokenize → tf → term-window
    # pipeline text_tfidf_top_terms already times plus one broadcast
    # join. The staged gates (similarity_*_topk_staged) are gate-only
    # for the same reason: they time the same query halves minus
    # training.
]
assert len(HEADLINE) <= 65, "HEADLINE over the curation cap — apply the rule above"

# Optional subset for scale smokes: SPARK_GRAFT_ONLY="q1_pricing_summary,..."
# restricts the headline list (e.g. to skip the deliberately super-linear
# exact-ngram verifier on 100x clone-heavy corpora).
_only = os.environ.get("SPARK_GRAFT_ONLY")
if _only:
    _names = {n.strip() for n in _only.split(",") if n.strip()}
    _unknown = _names - set(HEADLINE)
    if _unknown:
        # fail loudly: silently dropping a typo would publish a phantom
        # "measurement" with zero queries into the scale record
        raise SystemExit(f"SPARK_GRAFT_ONLY names not in HEADLINE: {sorted(_unknown)}")
    HEADLINE = [n for n in HEADLINE if n in _names]


#: Per-query cross-round records at sf0.1 (min across BENCH_r03-r08 —
#: including the r8 DRIVER run, whose 13 per-query improvements were
#: folded in round 9 — the adjudication re-runs, and the round-8 local
#: run; BASELINE.md). Used ONLY as the stall-detection threshold —
#: never reported as results. Covers all 61 headline queries.
RECORDS = {
    "corpus_mix_resample": 0.4,
    "dedup_cluster_assign": 3.575,
    "dedup_embedding_groups": 2.4,
    "dedup_embedding_incremental": 0.8,  # curated out r13; record kept
    "similarity_radius_banded_recall": 1.7,  # r13 driver min folded r14
    "dedup_embedding_recall_sampled": 3.7,
    "dedup_exact_hash_groups": 0.212,
    "dedup_graph_degree": 4.0,
    "dedup_incremental_probe": 3.4,
    "dedup_incremental_rosters": 13.1,
    "dedup_minhash_groups": 4.4,
    "dedup_minhash_lsh": 2.82,
    "dedup_minhash_recall_sampled": 6.8,
    "dedup_ngram_jaccard": 3.841,
    "dedup_paragraphs": 0.582,
    "dedup_prefix_hash_groups": 0.347,
    "dedup_survivor_selection": 5.3,
    "distinct_counts": 0.613,
    "doc_id_sdbm_customer": 0.3,
    "doc_pack_sequences": 0.287,
    "embedding_kmeans_iter3": 1.3,
    "embedding_kmeans_step": 0.6,
    "events_cohort_retention": 0.5,
    "events_funnel_conversion": 0.5,
    "events_interarrival_histogram": 0.5,
    "events_peak_concurrency": 0.8,
    "events_session_paths": 0.761,
    "events_sessionize": 0.388,
    "events_type_transitions": 0.5,
    # events_user_ewma re-baselined round 14 (r13 verdict task 3): the
    # 0.415 s record predates the √n-segmented fold (the r7 plan held
    # O(user-history) arrays — fast at sf0.1, OOM-shaped at scale) and
    # read 1.5-2.2× in every round since. Adjudicated by min-of-20 fresh
    # runs at sf0.1 on idle hardware: min 0.560, p50 0.644 — the honest
    # floor of the scale-safe plan is ~0.56 s; records must be
    # attainable by the CURRENT plan or the 2× stall check cries wolf.
    "events_user_ewma": 0.56,
    "events_value_outliers": 0.5,
    "multimodal_image_features_codec": 1.5,
    "outer_join_order_distribution": 0.4,
    "phrase_search_postings": 0.593,
    "q17_small_quantity_revenue": 0.846,
    "q1_pricing_summary": 1.0,
    "q21_late_suppliers": 1.3,
    "q2_min_cost_supplier": 1.3,
    "q3_shipping_priority": 0.6,
    "q5_local_supplier_volume": 0.696,
    "q7_volume_shipping": 0.8,
    "q8_market_share": 1.274,
    "q9_product_profit": 0.8,
    "semdedup_prune": 6.2,  # r13 driver min folded r14
    "similarity_cosine_topk": 0.5,
    "similarity_pq_topk": 4.4,
    "source_overlap_jaccard": 2.5,
    "streaming_session_window": 1.3,
    "streaming_session_window_append": 1.9,
    "streaming_tumbling_window": 1.399,
    "streaming_user_profile_state": 1.5,
    "streaming_watermark_dedup": 1.5,
    "text_bigram_lm_score": 2.1,
    "text_crossdoc_ngram_dup": 2.7,
    "text_decontaminate_eval_overlap": 1.5,
    "text_lang_confusion": 0.6,
    "text_langid_heuristic": 0.454,
    "text_quality_scores": 0.5,
    "text_repetition_scores": 1.698,
    "text_term_cooccurrence": 1.2,
    "text_tfidf_top_terms": 0.849,
    "text_vocab_oov": 1.4,
    "token_orders_murmur3": 0.3,
    "topk_orders": 0.165,
    "variant_extraction_events": 0.464,
    "window_running_revenue": 0.444,
    "window_top3_orders_per_customer": 0.4,
    "xmlpipe_embeddings_export": 0.2,
    "xmlpipe_lineitem_export": 1.925,
    "xmlpipe_orders_export": 0.546,
}


def format_bench_line(timings: dict[str, float], sf, cpus: int | None = None) -> str:
    """Render the result as ONE JSON line that fits the driver's tail
    window. The driver records only the last 2000 chars of stdout and
    parses the JSON line out of that tail — a longer line is
    unparseable by construction (BENCH_r06-r08 all hit this once the
    headline set passed ~55 queries). Emit compactly and degrade timing
    precision (3dp → 2dp → 1dp) until the line fits; sub-0.1 s
    precision is noise at these wall-clocks anyway.

    ``cpus`` (r15, VERDICT r14 scaling item): the session's ACTUAL
    ``sc.defaultParallelism``, echoed so the scaling harness can verify
    $SPARK_GRAFT_CPUS was honored (it always was — bench builds its
    session via get_spark, which reads the env var — but the line
    carried no evidence). Additive field; format otherwise unchanged."""
    out = {
        "metric": "headline_query_wall_clock_total",
        "value": 0.0,
        "unit": "sec",
        "queries": {},
        "sf": sf,
    }
    if cpus is not None:
        out["cpus"] = cpus
    for ndigits in (3, 2, 1, 0):
        out["queries"] = {
            n: (round(v, ndigits) if ndigits else int(round(v)))
            for n, v in timings.items()
        }
        out["value"] = round(sum(out["queries"].values()), 3)
        line = json.dumps(out, separators=(",", ":"))
        if len(line) <= 1980:
            break
    if len(line) > 1980:
        # last resort: the per-query map cannot fit at any precision —
        # drop it so the driver at least parses the headline total,
        # and say so loudly instead of silently reintroducing the
        # BENCH_r06-r08 unparseable-line failure this function prevents
        print(
            f"WARNING: bench line {len(line)} chars even at 0dp; "
            f"dropping per-query map ({len(timings)} queries) to fit "
            "the driver's 2000-char tail window",
            file=sys.stderr,
        )
        out["queries"] = {}
        out["value"] = round(sum(timings.values()), 3)
        line = json.dumps(out, separators=(",", ":"))
    return line


def main() -> int:
    from cql_xmlpipe_spark.plans import QUERIES
    from cql_xmlpipe_spark.session import get_spark

    spark = get_spark("bench")
    # warm the JVM + parquet footers with a trivial action so q1's number
    # is query time, not session startup
    spark.range(1).count()

    from pyspark.sql import functions as F

    def _force(df) -> None:
        df.select(F.xxhash64(*[F.col(c) for c in df.columns]).alias("h")).agg(
            F.expr("bit_xor(h)")
        ).collect()

    # warmup pass at the smallest SF: whole-stage codegen classes are
    # keyed by generated source, so identical plan shapes hit the Janino
    # cache and the timed run measures execution, not compilation (cold
    # compile dominates several sub-second queries otherwise). Standard
    # JIT-warmup practice; the timed SF below is untouched.
    warm_dir = "/root/testdata/sf0.001"
    if os.path.isdir(warm_dir) and warm_dir != SF_DIR:
        for name in HEADLINE:
            fn = QUERIES.get(name)
            if fn is not None:
                try:
                    _force(fn(spark, warm_dir))
                except Exception:
                    pass

    # drop caches persisted by warmup runs (dedup operators persist their
    # signature tables) so the timed pass starts from clean storage memory
    spark.catalog.clearCache()

    # Per-query timing = MIN across 3 INTERLEAVED round-robin passes over
    # the whole list (pass 1 runs every query once, then pass 2, ...).
    # The host VM shows sustained multi-minute scheduling stalls; three
    # CONSECUTIVE runs of one query all fit inside a single stall window
    # and lock the stalled number in as the "min" (round-4 recorded 22.7 s
    # for text_quality_scores; the real figure on unchanged code was
    # 0.73 s). Interleaving puts the whole suite (~30-80 s) between a
    # query's attempts, so one stall can no longer poison all of them.
    # SPARK_GRAFT_RESTART_EVERY=N (scale smokes only, default off): stop
    # and recreate the session every N timed queries, outside the timed
    # window. At the 100× century smoke the 59-query suite accumulates
    # JVM residue a blanket clearCache can't touch (Janino/codegen class
    # cache, broadcast cleanup backlog, Python-worker pools) — measured
    # as the lineitem export costing 64.7 s in suite context vs 16.1 s
    # standalone (SCALE.md). A periodic restart bounds that residue the
    # way a real cluster's per-job executors do; the driver's sf0.1 run
    # keeps it off so recorded numbers stay comparable.
    # Default policy (recorded in SCALE.md): ON (N=10) for scale smokes —
    # any SF_DIR outside the driver's /root/testdata tree — because the
    # 100× suite numbers are not reproducible without it; OFF for the
    # driver's sf0.1 bench so recorded numbers stay comparable across
    # rounds. Explicit SPARK_GRAFT_RESTART_EVERY always wins.
    _restart_default = "0" if SF_DIR.startswith("/root/testdata") else "10"
    restart_every = int(
        os.environ.get("SPARK_GRAFT_RESTART_EVERY", _restart_default)
    )
    timed_count = 0

    def _timed(name, fn) -> float:
        nonlocal spark, timed_count
        if restart_every and timed_count and timed_count % restart_every == 0:
            spark.stop()
            spark = get_spark("bench")
            spark.range(1).count()
        timed_count += 1
        spark.catalog.clearCache()
        t0 = time.perf_counter()
        # checksum over EVERY column: forces full computation of all
        # projections (a bare count() lets Catalyst prune them away),
        # while returning one row — no driver-collect bandwidth noise.
        # bit_xor, not sum: long sums overflow under ANSI mode.
        _force(fn(spark, SF_DIR))
        return time.perf_counter() - t0

    active = [(n, QUERIES[n]) for n in HEADLINE if n in QUERIES]
    runs: dict[str, list[float]] = {n: [] for n, _ in active}
    # SPARK_GRAFT_PASSES: scale smokes at 10x/100x data use fewer passes
    # (a full interleaved triple would take tens of minutes there); the
    # driver's sf0.1 run keeps the stall-proof default of 3.
    for _pass in range(int(os.environ.get("SPARK_GRAFT_PASSES", "3"))):
        for name, fn in active:
            runs[name].append(_timed(name, fn))

    # Stall backstop: if a query's min still exceeds 2× its recorded
    # cross-round best (RECORDS below), every pass likely hit a stall —
    # give it up to 2 extra attempts rather than publishing a phantom.
    for name, fn in active:
        rec = RECORDS.get(name)
        for _ in range(2):
            if rec is None or min(runs[name]) <= max(2 * rec, 1.0):
                break
            runs[name].append(_timed(name, fn))

    timings = {name: round(min(r), 3) for name, r in runs.items()}

    sf = SF_DIR.rstrip("/").rsplit("sf", 1)[-1]
    print(
        format_bench_line(
            timings,
            float(sf) if sf.replace(".", "").isdigit() else sf,
            cpus=spark.sparkContext.defaultParallelism,
        )
    )
    return 0


if __name__ == "__main__":
    sys.exit(main())
