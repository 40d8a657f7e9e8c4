"""Model-based edge tests for the clustering / vocabulary / overlap
operators (embedding_kmeans_step, text_vocab_oov, source_overlap_jaccard,
dedup_prefix_hash_groups) over crafted parquet — the oracle harness covers
the bulk distribution; these pin boundary semantics the synthetic corpus
never hits (distance ties, bigram-less docs, disjoint sources, prefix
groups hiding tail edits)."""

from __future__ import annotations

import os

import numpy as np

from cql_xmlpipe_spark.plans.extensions import (
    dedup_prefix_hash_groups,
    embedding_kmeans_iter3,
    embedding_kmeans_step,
    source_overlap_jaccard,
    text_vocab_oov,
)


def _write_embeddings(spark, path, rows):
    spark.createDataFrame(
        rows, "vec_id long, embedding array<float>, label int"
    ).coalesce(1).write.mode("overwrite").parquet(
        os.path.join(path, "embeddings.parquet")
    )


def _write_documents(spark, path, rows):
    spark.createDataFrame(
        rows, "doc_id long, text string, lang string, source string, n_chars long"
    ).coalesce(1).write.mode("overwrite").parquet(
        os.path.join(path, "documents.parquet")
    )


def test_kmeans_step_matches_numpy_model(spark, tmp_path):
    sf = str(tmp_path)
    rng = np.random.default_rng(11)
    vecs = [[float(np.float32(v)) for v in rng.normal(0, 1, 4)] for _ in range(20)]
    _write_embeddings(spark, sf, [(i, v, 0) for i, v in enumerate(vecs)])

    a = np.array(vecs, dtype=np.float64)
    cents = a[:8]
    d2 = ((a[:, None, :] - cents[None, :, :]) ** 2).sum(axis=2)
    assign = d2.argmin(axis=1)  # argmin keeps the lowest index on ties
    got = {
        (r["cluster_id"], r["dim"]): (r["new_centroid"], r["n_members"])
        for r in embedding_kmeans_step(spark, sf).collect()
    }
    for cid in range(8):
        members = a[assign == cid]
        if len(members) == 0:
            assert not any(k[0] == cid for k in got)
            continue
        q = np.floor(members * 1e6 + 0.5).astype(np.int64)
        for dim in range(4):
            want = q[:, dim].sum() / (len(members) * 1e6)
            mean, n = got[(cid, dim)]
            assert n == len(members)
            assert mean == want


def test_kmeans_iter3_matches_numpy_trajectory(spark, tmp_path):
    sf = str(tmp_path)
    rng = np.random.default_rng(23)
    vecs = [[float(np.float32(v)) for v in rng.normal(0, 1, 3)] for _ in range(30)]
    _write_embeddings(spark, sf, [(i, v, 0) for i, v in enumerate(vecs)])

    a = np.array(vecs, dtype=np.float64)
    labels = list(range(8))  # original cids aligned with centroid rows;
    cents = a[:8].copy()     # emptied clusters drop out between rounds
    for _ in range(3):
        d2 = ((a[:, None, :] - cents[None, :, :]) ** 2).sum(axis=2)
        dense = d2.argmin(axis=1)  # ties -> lowest row == lowest cid (sorted)
        assign = np.array([labels[i] for i in dense])
        new = {}
        for cid in sorted(set(assign.tolist())):
            m = a[assign == cid]
            q = np.floor(m * 1e6 + 0.5).astype(np.int64)
            new[cid] = (q.sum(axis=0) / (len(m) * 1e6), len(m))
        labels = sorted(new)
        cents = np.array([new[c][0] for c in labels])

    got = {
        (r["cluster_id"], r["dim"]): (r["new_centroid"], r["n_members"])
        for r in embedding_kmeans_iter3(spark, sf).collect()
    }
    assert {k[0] for k in got} == set(labels)
    for cid in labels:
        want_vec, want_n = new[cid]
        for dim in range(3):
            mean, n = got[(cid, dim)]
            assert n == want_n
            assert mean == want_vec[dim]


def test_kmeans_distance_tie_prefers_lowest_cluster_id(spark, tmp_path):
    sf = str(tmp_path)
    # centroids 0..7; centroid 3 duplicates centroid 1, so every vector
    # is equidistant from cids 1 and 3 — assignment must pick cid 1
    base = [[float(i), 0.0] for i in range(8)]
    base[3] = base[1][:]
    rows = [(i, v, 0) for i, v in enumerate(base)]
    rows.append((8, [1.1, 0.0], 0))  # nearest: cids 1 and 3 at 0.01
    _write_embeddings(spark, sf, rows)
    out = embedding_kmeans_step(spark, sf).collect()
    members = {r["cluster_id"]: r["n_members"] for r in out if r["dim"] == 0}
    assert members[1] == 3  # centroid 1 itself + duplicate 3 + vector 8
    assert 3 not in members


def test_vocab_oov_counts_bigrams_per_source(spark, tmp_path):
    sf = str(tmp_path)
    _write_documents(
        spark,
        sf,
        [
            (1, "red fish blue fish", "en", "sa", 18),  # 3 bigrams
            (2, "red fish", "en", "sa", 8),             # 1 bigram
            (3, "one", "en", "sb", 3),                  # 0 bigrams -> no row
            (4, "green eggs and ham", "en", "sc", 18),  # 3 bigrams
        ],
    )
    got = {r["source"]: r for r in text_vocab_oov(spark, sf).collect()}
    assert set(got) == {"sa", "sc"}  # bigram-less source emits nothing
    assert got["sa"]["n_tokens"] == 4
    assert got["sc"]["n_tokens"] == 3
    # every bigram fits the top-256 vocab here: zero OOV by construction
    assert got["sa"]["n_oov"] == 0 and got["sa"]["oov_rate"] == 0.0


def test_source_overlap_exact_jaccard(spark, tmp_path):
    sf = str(tmp_path)
    _write_documents(
        spark,
        sf,
        [
            (1, "a b c d", "en", "s1", 7),   # trigrams {a b c, b c d}
            (2, "a b c x", "en", "s2", 7),   # trigrams {a b c, b c x}
            (3, "p q r", "en", "s3", 5),     # disjoint {p q r}
        ],
    )
    rows = {
        (r["source_a"], r["source_b"]): (r["n_common"], r["jaccard"])
        for r in source_overlap_jaccard(spark, sf).collect()
    }
    # only overlapping pairs emit rows; |A∩B|=1, |A∪B|=3
    assert rows == {("s1", "s2"): (1, 1.0 / 3.0)}


def test_prefix_dedup_flags_tail_edits(spark, tmp_path):
    sf = str(tmp_path)
    head = "x" * 150
    _write_documents(
        spark,
        sf,
        [
            (1, head + "tail-one", "en", "s", 158),
            (2, head + "tail-two", "en", "s", 158),  # same prefix, edited tail
            (3, "exact dup", "en", "s", 9),
            (4, "exact dup", "en", "s", 9),
            (5, "unique", "en", "s", 6),
        ],
    )
    got = {
        r["keep_id"]: (r["n_docs"], r["n_full_variants"])
        for r in dedup_prefix_hash_groups(spark, sf).collect()
    }
    assert got[1] == (2, 2)  # near-dup invisible to exact dedup: 2 variants
    assert got[3] == (2, 1)  # true exact dup collapses to 1 variant
    assert got[5] == (1, 1)


def _write_events(spark, path, rows):
    spark.createDataFrame(
        rows,
        "event_id long, ts timestamp, user_id long, event_type string, "
        "value double, props string",
    ).coalesce(1).write.mode("overwrite").parquet(
        os.path.join(path, "events.parquet")
    )


def test_user_ewma_fold_order_and_value(spark, tmp_path):
    from datetime import datetime

    from cql_xmlpipe_spark.plans.extensions import events_user_ewma

    sf = str(tmp_path)
    t = lambda s: datetime(2024, 1, 1, 0, 0, s)  # noqa: E731
    # user 1: values arrive out of id order; fold must follow (ts, eid)
    _write_events(
        spark,
        sf,
        [
            (3, t(30), 1, "a", 4.0, "{}"),
            (1, t(10), 1, "a", 1.0, "{}"),
            (2, t(20), 1, "a", 2.0, "{}"),
            (5, t(10), 2, "b", 7.0, "{}"),  # same ts as eid 4: eid breaks tie
            (4, t(10), 2, "b", 5.0, "{}"),
        ],
    )
    got = {r["user_id"]: r for r in events_user_ewma(spark, sf).collect()}
    acc = 0.0
    for v in (1.0, 2.0, 4.0):
        acc = acc * 0.9 + v * 0.1
    assert got[1]["n_events"] == 3 and got[1]["ewma_value"] == acc
    acc2 = 0.0
    for v in (5.0, 7.0):  # eid 4 before eid 5 at the tied timestamp
        acc2 = acc2 * 0.9 + v * 0.1
    assert got[2]["n_events"] == 2 and got[2]["ewma_value"] == acc2


def test_user_ewma_multi_segment_combine(spark, tmp_path):
    """100 events (⌈√100⌉ = 10-event segments → 10 segment maps) force
    the affine segment-combine path; the result must bit-match a
    pure-Python model of the SAME segmented association (per-segment
    fold + (p,q)-monoid composition) — and stay within float tolerance
    of the straight fold (identical in ℝ)."""
    from datetime import datetime

    from cql_xmlpipe_spark.plans.extensions import _ewma_seg_size, events_user_ewma

    sf = str(tmp_path)
    vals = [((i * 37) % 101) / 7.0 for i in range(100)]
    _write_events(
        spark,
        sf,
        [
            (i, datetime(2024, 1, 1, i // 3600, (i // 60) % 60, i % 60), 1, "a", v, "{}")
            for i, v in enumerate(vals)
        ],
    )
    got = events_user_ewma(spark, sf).collect()[0]
    ss = _ewma_seg_size(len(vals))
    segs = [vals[i : i + ss] for i in range(0, len(vals), ss)]
    assert len(segs) >= 3
    P, Q = 1.0, 0.0
    for seg in segs:
        p, q = 1.0, 0.0
        for v in seg:
            q = q * 0.9 + v * 0.1
            p = p * 0.9
        P, Q = P * p, Q * p + q
    assert got["n_events"] == 100 and got["ewma_value"] == Q
    straight = 0.0
    for v in vals:
        straight = straight * 0.9 + v * 0.1
    assert abs(got["ewma_value"] - straight) < 1e-9


def test_graph_degree_on_clone_family(spark, tmp_path):
    from cql_xmlpipe_spark.plans.extensions import dedup_graph_degree

    sf = str(tmp_path)
    fam = "the quick brown fox jumps over the lazy dog again and again"
    _write_documents(
        spark,
        sf,
        [
            (1, fam, "en", "s", len(fam)),
            (2, fam, "en", "s", len(fam)),
            (3, fam, "en", "s", len(fam)),  # 3-clone family: degree 2 each
            (4, "completely different text about spark plans", "en", "s", 44),
        ],
    )
    got = {r["degree"]: r["n_docs"] for r in dedup_graph_degree(spark, sf).collect()}
    assert got == {2: 3}  # three docs, each with two near-dups; doc 4 absent


def test_survivor_selection_keeps_longest(spark, tmp_path):
    from cql_xmlpipe_spark.plans.extensions import dedup_survivor_selection

    sf = str(tmp_path)
    base = "alpha beta gamma delta epsilon zeta eta theta iota kappa"
    _write_documents(
        spark,
        sf,
        [
            (1, base, "en", "s", len(base)),
            (2, base + " extra tail words", "en", "s", len(base) + 17),
            (3, base, "en", "s", len(base)),  # ties with 1 on length -> id 1
            (4, "unrelated text entirely different topic", "en", "s", 40),
        ],
    )
    got = {
        r["cluster_id"]: (r["survivor_doc_id"], r["cluster_size"])
        for r in dedup_survivor_selection(spark, sf).collect()
    }
    # docs 1-3 cluster (near-dups); longest (doc 2) survives
    assert got[1] == (2, 3)
    assert got[4] == (4, 1)  # singleton survives itself


def test_incremental_probe_only_cross_set_pairs(spark, tmp_path):
    from cql_xmlpipe_spark.plans.extensions import dedup_incremental_probe

    sf = str(tmp_path)
    a = "one two three four five six seven eight nine ten"
    b = "alpha beta gamma delta epsilon zeta eta theta iota kappa"
    _write_documents(
        spark,
        sf,
        [
            (1, a, "en", "s", len(a)),               # corpus
            (5, a, "en", "s", len(a)),               # increment: dup of 1
            (2, b, "en", "s", len(b)),               # corpus
            (10, b + " tail", "en", "s", len(b) + 5),  # increment: near-dup of 2
            (15, a, "en", "s", len(a)),              # increment: dup of 1 AND 5
            (3, "totally unrelated content here", "en", "s", 30),  # corpus
        ],
    )
    got = {
        (r["inc_id"], r["corpus_id"]): r["jaccard"]
        for r in dedup_incremental_probe(spark, sf).collect()
    }
    # cross-set pairs only: (5,1), (15,1), (10,2) — never (15,5) (both
    # increment) and nothing for corpus-only doc 3
    assert set(got) == {(5, 1), (15, 1), (10, 2)}
    assert got[(5, 1)] == 1.0 and got[(15, 1)] == 1.0
    assert 0.35 <= got[(10, 2)] < 1.0
