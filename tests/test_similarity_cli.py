"""similarity_cli contract tests: parameter refusals before Spark work,
each contract end-to-end over a small crafted corpus, strategy
dispatch, and parquet/JSON emission — the dedup_cli test shape."""

from __future__ import annotations

import json
import math
import os
import random

import pytest

from cql_xmlpipe_spark.similarity_cli import main


@pytest.fixture(scope="module")
def corpus_dir(spark, tmp_path_factory):
    """64 unit vectors + a ~0.97-cosine twin for each of the first 8 —
    written as embeddings.parquet so load_table finds it."""
    rng = random.Random(5)
    d = str(tmp_path_factory.mktemp("simcli"))

    def unit(dim=16):
        v = [rng.gauss(0, 1) for _ in range(dim)]
        n = math.sqrt(sum(x * x for x in v))
        return [x / n for x in v]

    rows = []
    for i in range(64):
        v = unit()
        rows.append((i, "n", [float(x) for x in v]))
        if i < 8:
            w = [x + 0.1 * rng.gauss(0, 1) / 4 for x in v]
            n = math.sqrt(sum(x * x for x in w))
            rows.append((1000 + i, "t", [float(x / n) for x in w]))
    spark.createDataFrame(
        rows, "vec_id long, label string, embedding array<float>"
    ).coalesce(1).write.mode("overwrite").parquet(
        os.path.join(d, "embeddings.parquet")
    )
    return d


def test_refusals_before_spark(corpus_dir, capsys):
    assert main(["--contract", "topk", "--data-dir", corpus_dir, "--k", "0"]) == 2
    assert "refused" in capsys.readouterr().err
    assert main(["--contract", "radius", "--data-dir", corpus_dir,
                 "--threshold", "1.5"]) == 2
    assert "[-1, 1]" in capsys.readouterr().err
    assert main(["--contract", "topk", "--data-dir", corpus_dir,
                 "--strategy", "banded"]) == 2
    assert "topk strategy" in capsys.readouterr().err
    assert main(["--contract", "radius", "--data-dir", corpus_dir,
                 "--strategy", "brute"]) == 2
    assert "broadcast" in capsys.readouterr().err
    assert main(["--contract", "topk", "--data-dir", corpus_dir,
                 "--queries-mod", "0"]) == 2
    assert "queries-mod" in capsys.readouterr().err


def _rows(capsys):
    return [json.loads(l) for l in capsys.readouterr().out.strip().splitlines()
            if l.startswith("{")]


def test_topk_brute_matmul_agree(corpus_dir, capsys):
    got = {}
    for strat in ("brute", "matmul", "auto"):
        rc = main(["--contract", "topk", "--data-dir", corpus_dir, "--k", "3",
                   "--queries-mod", "8", "--strategy", strat, "--show", "100"])
        assert rc == 0
        got[strat] = sorted((r["q_id"], r["vec_id"], r["rank"]) for r in _rows(capsys))
    assert got["brute"] == got["matmul"] == got["auto"] and len(got["brute"]) == 27


def test_radius_strategies_and_twins(corpus_dir, capsys):
    for strat in ("broadcast", "matmul"):
        rc = main(["--contract", "radius", "--data-dir", corpus_dir,
                   "--threshold", "0.9", "--queries-mod", "8",
                   "--strategy", strat, "--show", "100"])
        assert rc == 0
        pairs = {(r["q_id"], r["vec_id"]) for r in _rows(capsys)}
        # every 8th original (0,8,...,56) that has a twin (ids 0..7 -> just 0... )
        assert (0, 1000) in pairs  # query 0 finds its planted twin
    rc = main(["--contract", "radius", "--data-dir", corpus_dir,
               "--threshold", "0.9", "--queries-mod", "8",
               "--strategy", "banded", "--n-bands", "24", "--band-bits", "8",
               "--show", "100"])
    assert rc == 0
    banded = {(r["q_id"], r["vec_id"]) for r in _rows(capsys)}
    assert (0, 1000) in banded


def test_ann_and_recall_contracts(corpus_dir, capsys, tmp_path):
    rc = main(["--contract", "ann", "--algo", "lsh", "--data-dir", corpus_dir,
               "--k", "3", "--queries-mod", "16", "--show", "50"])
    assert rc == 0
    assert all(set(r) == {"q_id", "vec_id", "rank", "cos"} for r in _rows(capsys))
    out = str(tmp_path / "rec")
    rc = main(["--contract", "recall", "--algo", "lsh", "--data-dir", corpus_dir,
               "--k", "3", "--queries-mod", "16", "--out", out])
    assert rc == 0
    assert "wrote" in capsys.readouterr().out
    import duckdb

    rows = duckdb.sql(f"SELECT * FROM read_parquet('{out}/*.parquet')").fetchall()
    assert len(rows) == 4  # vec_ids 0,16,32,48
    assert all(0.0 <= r[1] <= 1.0 for r in rows)


def test_ann_build_then_query_staged(corpus_dir, tmp_path, capsys):
    """ann-build writes the index artifact; a SECOND CLI invocation
    queries through it (no retraining) and the answers equal the
    per-call ann contract — the cross-process build-once/query-many
    contract (r13 verdict task 5)."""
    idx = str(tmp_path / "ivf_idx")
    assert main(["--contract", "ann-build", "--algo", "ivf",
                 "--data-dir", corpus_dir, "--index-dir", idx,
                 "--n-cells", "8"]) == 0
    assert "built ivf index" in capsys.readouterr().out

    out_staged = str(tmp_path / "staged_out")
    assert main(["--contract", "ann", "--algo", "ivf",
                 "--data-dir", corpus_dir, "--index-dir", idx,
                 "--k", "5", "--queries-mod", "16",
                 "--out", out_staged]) == 0
    capsys.readouterr()
    out_fresh = str(tmp_path / "fresh_out")
    assert main(["--contract", "ann", "--algo", "ivf",
                 "--data-dir", corpus_dir,
                 "--k", "5", "--queries-mod", "16", "--n-cells", "8",
                 "--out", out_fresh]) == 0
    capsys.readouterr()

    import duckdb

    con = duckdb.connect()
    a = con.sql(f"SELECT * FROM read_parquet('{out_staged}/*.parquet') ORDER BY q_id, rank").fetchall()
    b = con.sql(f"SELECT * FROM read_parquet('{out_fresh}/*.parquet') ORDER BY q_id, rank").fetchall()
    assert a == b and len(a) > 0

    # the composite: three-artifact build, staged ≡ per-call via CLI
    idx2 = str(tmp_path / "ivfpq_idx")
    assert main(["--contract", "ann-build", "--algo", "ivfpq",
                 "--data-dir", corpus_dir, "--index-dir", idx2,
                 "--n-cells", "8", "--m", "4", "--ks", "8",
                 "--shortlist", "20"]) == 0
    assert "built ivfpq index" in capsys.readouterr().out
    out_staged2 = str(tmp_path / "staged_out_ivfpq")
    assert main(["--contract", "ann", "--algo", "ivfpq",
                 "--data-dir", corpus_dir, "--index-dir", idx2,
                 "--k", "5", "--queries-mod", "16",
                 "--out", out_staged2]) == 0
    capsys.readouterr()
    out_fresh2 = str(tmp_path / "fresh_out_ivfpq")
    assert main(["--contract", "ann", "--algo", "ivfpq",
                 "--data-dir", corpus_dir,
                 "--k", "5", "--queries-mod", "16", "--n-cells", "8",
                 "--m", "4", "--ks", "8", "--shortlist", "20",
                 "--out", out_fresh2]) == 0
    capsys.readouterr()
    a = con.sql(f"SELECT * FROM read_parquet('{out_staged2}/*.parquet') ORDER BY q_id, rank").fetchall()
    b = con.sql(f"SELECT * FROM read_parquet('{out_fresh2}/*.parquet') ORDER BY q_id, rank").fetchall()
    assert a == b and len(a) > 0

    # refusals stay pre-Spark
    assert main(["--contract", "ann-build", "--algo", "lsh",
                 "--data-dir", corpus_dir, "--index-dir", idx]) == 2
    assert "stateless" in capsys.readouterr().err
    assert main(["--contract", "ann-build", "--algo", "pq",
                 "--data-dir", corpus_dir]) == 2
    assert "--index-dir" in capsys.readouterr().err
