"""Curation CLI: operator reachability for the mixture-planning family
(the same contract discipline as dedup_cli — every curation planner a
production operator would launch has a command-line form)."""

from __future__ import annotations

import json
import math
import os

import pytest

from cql_xmlpipe_spark.curation_cli import build_parser, main


@pytest.fixture(scope="module")
def corpus_dir(spark, tmp_path_factory):
    """Two sources, 90/10 token split, 10 docs."""
    out = str(tmp_path_factory.mktemp("curation"))
    rows = [(i, " ".join(["w"] * 10), "en", "A", 20) for i in range(9)]
    rows.append((9, " ".join(["w"] * 10), "en", "B", 20))
    spark.createDataFrame(
        rows, "doc_id long, text string, lang string, source string, n_chars long"
    ).write.mode("overwrite").parquet(f"{out}/documents.parquet")
    return out


def _json_rows(capsys):
    return [json.loads(line) for line in capsys.readouterr().out.splitlines() if line]


def test_cli_mix_temperature_parameterized(corpus_dir, capsys):
    rc = main([
        "--contract", "mix-temperature", "--data-dir", corpus_dir,
        "--temperature", "0.5",
    ])
    assert rc == 0
    got = {r["source"]: r for r in _json_rows(capsys)}
    pw = {s: math.floor(p**0.5 * 1e9 + 0.5) for s, p in (("A", 0.9), ("B", 0.1))}
    z = sum(pw.values())
    # τ=0.5 flattens harder than the gate's 0.7
    assert abs(got["B"]["p_temp"] - pw["B"] / z) < 3e-9
    assert got["B"]["p_temp"] > 0.2


def test_cli_epoch_plan_budget_mult(corpus_dir, capsys):
    rc = main([
        "--contract", "epoch-plan", "--data-dir", corpus_dir,
        "--budget-mult", "1.0",
    ])
    assert rc == 0
    got = {r["source"]: r for r in _json_rows(capsys)}
    # budget 100 tokens, 50 per source: A (90 toks) -> 5/9 epoch
    assert got["A"]["full_epochs"] == 0 and abs(got["A"]["epochs"] - 50 / 90) < 1e-12
    assert got["B"]["full_epochs"] == 5


def test_cli_domain_cap_out_writes_parquet(corpus_dir, tmp_path, spark, capsys):
    dest = str(tmp_path / "capped")
    rc = main([
        "--contract", "domain-cap", "--data-dir", corpus_dir,
        "--cap-frac", "0.5", "--out", dest,
    ])
    assert rc == 0 and "wrote" in capsys.readouterr().out
    rows = spark.read.parquet(dest).collect()
    kept_a = sum(1 for r in rows if r["source"] == "A" and r["kept"])
    assert kept_a == 5  # ceil(0.5 * 10)


def test_cli_rejects_bad_parameters(corpus_dir, capsys):
    assert main(["--contract", "mix-temperature", "--data-dir", corpus_dir,
                 "--temperature", "1.5"]) == 2
    assert "refused" in capsys.readouterr().err
    assert main(["--contract", "epoch-plan", "--data-dir", corpus_dir,
                 "--budget-mult", "0"]) == 2
    assert main(["--contract", "domain-cap", "--data-dir", corpus_dir,
                 "--cap-frac", "0"]) == 2


def test_cli_mix_weights_and_resample_expectation(corpus_dir, capsys):
    assert main(["--contract", "mix-weights", "--data-dir", corpus_dir]) == 0
    w = {r["source"]: r for r in _json_rows(capsys)}
    assert w["B"]["mix_weight"] == 5.0 and w["A"]["mix_weight"] == pytest.approx(5 / 9)
    assert main(["--contract", "resample", "--data-dir", corpus_dir]) == 0
    copies = {r["doc_id"]: r["n_copies"] for r in _json_rows(capsys)}
    assert len(copies) == 10
    # weight 5.0 on B is integral: exactly 5 copies, no stochastic part
    assert copies[9] == 5


def test_cli_silhouette_contract(spark, tmp_path, capsys):
    """The label-quality audit is CLI-reachable: per-vector rows with
    the (a_intra, b_inter, silhouette) columns, s in [-1, 1] or NULL.
    Its corpus is embeddings.parquet (the other contracts read
    documents.parquet), so the test stages its own two-label corpus."""
    import random

    rng = random.Random(5)
    rows = [
        (i, i % 2, [rng.gauss(3.0 if i % 2 else -3.0, 0.2) for _ in range(6)])
        for i in range(20)
    ]
    d = str(tmp_path / "silcorpus")
    spark.createDataFrame(
        rows, "vec_id long, label int, embedding array<float>"
    ).write.mode("overwrite").parquet(f"{d}/embeddings.parquet")

    rc = main(["--contract", "silhouette", "--data-dir", d, "--show", "50"])
    assert rc == 0
    out = _json_rows(capsys)
    assert len(out) == 20
    for r in out:
        assert {"vec_id", "label", "a_intra", "b_inter", "silhouette"} <= set(r)
        # two well-separated planted labels: every vector coheres
        assert float(r["silhouette"]) > 0.5


def test_cli_weighted_sample_contract(corpus_dir, capsys):
    """A-ES sampling is CLI-reachable with --sample-k parameterization;
    bad k refuses pre-Spark."""
    rc = main(["--contract", "weighted-sample", "--data-dir", corpus_dir,
               "--sample-k", "3", "--show", "10"])
    assert rc == 0
    rows = _json_rows(capsys)
    assert len(rows) == 3
    assert [r["pick_rank"] for r in rows] == [1, 2, 3]
    assert len({r["doc_id"] for r in rows}) == 3

    assert main(["--contract", "weighted-sample", "--data-dir", corpus_dir,
                 "--sample-k", "0"]) == 2
    assert "--sample-k" in capsys.readouterr().err
