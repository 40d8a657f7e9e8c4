"""Invariants of semdedup_prune (SemDeDup pruning over the planted
×2-twin corpus) that the oracle's row-equality can't articulate."""

from __future__ import annotations

import math

from tests.conftest import SF_SMOKE


def test_semdedup_invariants(spark):
    from cql_xmlpipe_spark.plans.extensions import (
        _SEMDEDUP_TAU,
        _planted_embeddings,
        semdedup_prune,
    )

    rows = semdedup_prune(spark, SF_SMOKE).collect()
    by_id = {r["vec_id"]: r for r in rows}
    emb = {
        r["vec_id"]: r["embedding"]
        for r in _planted_embeddings(spark, SF_SMOKE).collect()
    }
    assert len(rows) == len(emb)  # every vector gets a verdict
    n_pruned = 0
    for r in rows:
        assert (r["kept_by"] is not None) == r["is_pruned"]
        if not r["is_pruned"]:
            continue
        n_pruned += 1
        keeper = by_id[r["kept_by"]]
        # keep-first: the keeper is a lower id, same cluster, not itself
        # pruned by something even lower OR pruned — either way it exists
        assert r["kept_by"] < r["vec_id"]
        assert keeper["cluster_id"] == r["cluster_id"]
        # the pruning pair really is a near-dup at tau
        a = [float(x) for x in emb[r["vec_id"]]]
        b = [float(x) for x in emb[r["kept_by"]]]
        dotp = sum(x * y for x, y in zip(a, b))
        na = math.sqrt(sum(x * x for x in a))
        nb = math.sqrt(sum(x * x for x in b))
        assert dotp / (na * nb) >= _SEMDEDUP_TAU - 1e-9
    # the planted corpus guarantees a non-trivial pruned set: most ×2
    # twins land in their original's cluster and prune at cosine ~1.0
    assert n_pruned >= len(emb) // 4
    # kept_by is the MINIMUM qualifying lower id within the cluster:
    # spot-check by recomputing for the pruned vec with the lowest id
    vid = min(r["vec_id"] for r in rows if r["is_pruned"])
    row = by_id[vid]
    cands = [
        o
        for o in rows
        if o["cluster_id"] == row["cluster_id"] and o["vec_id"] < vid
    ]
    best = None
    a = [float(x) for x in emb[vid]]
    na = math.sqrt(sum(x * x for x in a))
    for o in cands:
        b = [float(x) for x in emb[o["vec_id"]]]
        nb = math.sqrt(sum(x * x for x in b))
        if na == 0 or nb == 0:
            continue
        if sum(x * y for x, y in zip(a, b)) / (na * nb) >= _SEMDEDUP_TAU:
            best = o["vec_id"] if best is None else min(best, o["vec_id"])
    assert best == row["kept_by"]


def test_semdedup_pair_stage_is_one_arrow_block(spark):
    """r15 plan pin: the within-cluster pair stage is ONE Arrow-batched
    numpy block per cluster (FlatMapGroupsInPandas), not a salted
    self-join of the member table — the join shipped every member 9×
    and paid an interpreted 64-term Column fold per candidate pair. A
    reappearing self-join on cluster_id (two scans of the assignment
    feeding one join) or a second Python node is a regression."""
    from cql_xmlpipe_spark.operators.dedup import unpersist_intermediates
    from cql_xmlpipe_spark.plans.extensions import semdedup_prune

    out = semdedup_prune(spark, SF_SMOKE)
    plan = out._jdf.queryExecution().executedPlan().toString()
    assert plan.count("FlatMapGroupsInPandas") == 1, plan
    # the old salted join's marker: an explode of the salt sequence
    assert "sequence(0" not in plan and "salt" not in plan
    unpersist_intermediates(out)
