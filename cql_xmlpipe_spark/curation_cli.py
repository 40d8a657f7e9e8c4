"""Corpus-curation planner front-end — CLI reachability for the
mixture-planning family, mirroring ``dedup_cli``'s contract shape:

    python -m cql_xmlpipe_spark.curation_cli --contract mix-temperature \
        --data-dir /root/testdata/sf0.01 --temperature 0.5 --out /tmp/mix

Contracts (all over ``<data-dir>/documents.parquet``, all linear or
smaller output — no caps needed):

* ``mix-weights``     — per-source token mass + the uniform-equalizing
                        up/down-sampling weight (τ=0 limit)
* ``mix-temperature`` — tempered mixture q_s ∝ p_s^τ
                        (``--temperature``, default 0.7): p_nat,
                        p_temp, sample_weight per source
* ``epoch-plan``      — per-source full_epochs + partial_frac for a
                        rebalanced token budget of ``--budget-mult`` ×
                        total corpus tokens (default 2.0)
* ``domain-cap``      — per-doc kept/cut verdicts under the "no source
                        may exceed ``--cap-frac`` of corpus docs" rule
                        (default 0.3; deterministic md5-rank prefix)
* ``resample``        — per-doc copy counts executing the
                        uniform-equalizing weights (portable stochastic
                        rounding, E[copies] = weight)
* ``silhouette``      — per-vector simplified-silhouette label audit
                        over ``embeddings.parquet`` (a_intra, b_inter,
                        s = (b−a)/max(a,b); mislabel candidates < 0)
* ``weighted-sample`` — A-ES weighted sampling WITHOUT replacement:
                        the ``--sample-k`` docs winning the u^(1/w)
                        key, w = token count (Efraimidis–Spirakis)

``--out DIR`` writes parquet; otherwise the first ``--show`` rows print
as JSON lines (planner tables are tiny — per-source — except
``domain-cap``/``resample`` which are per-doc; default --show 20).
"""

from __future__ import annotations

import argparse
import json
import sys


def build_parser() -> argparse.ArgumentParser:
    p = argparse.ArgumentParser(
        prog="curation",
        description="Run a corpus-curation planning contract over a "
        "parquet corpus.",
    )
    p.add_argument(
        "--contract",
        required=True,
        choices=[
            "mix-weights", "mix-temperature", "epoch-plan",
            "domain-cap", "resample", "silhouette", "weighted-sample",
        ],
    )
    p.add_argument("--data-dir", required=True, help="directory of documents.parquet")
    p.add_argument(
        "--temperature", type=float, default=0.7,
        help="mix-temperature only: the τ of q_s ∝ p_s^τ (0 < τ <= 1; "
        "smaller = flatter mix)",
    )
    p.add_argument(
        "--budget-mult", type=float, default=2.0,
        help="epoch-plan only: token budget as a multiple of total "
        "corpus tokens",
    )
    p.add_argument(
        "--cap-frac", type=float, default=0.3,
        help="domain-cap only: max fraction of corpus docs one source "
        "may contribute",
    )
    p.add_argument(
        "--sample-k", type=int, default=100,
        help="weighted-sample only: how many docs to draw",
    )
    p.add_argument("--out", default=None, help="write result parquet here")
    p.add_argument("--show", type=int, default=20,
                   help="without --out: print this many rows as JSON lines")
    return p


def main(argv: list[str] | None = None) -> int:
    args = build_parser().parse_args(argv)
    if args.contract == "mix-temperature" and not (0.0 < args.temperature <= 1.0):
        print(f"refused: --temperature must be in (0, 1], got {args.temperature}",
              file=sys.stderr)
        return 2
    if args.contract == "epoch-plan" and args.budget_mult <= 0:
        print(f"refused: --budget-mult must be positive, got {args.budget_mult}",
              file=sys.stderr)
        return 2
    if args.contract == "weighted-sample" and args.sample_k <= 0:
        print(f"refused: --sample-k must be positive, got {args.sample_k}",
              file=sys.stderr)
        return 2
    if args.contract == "domain-cap" and not (0.0 < args.cap_frac <= 1.0):
        print(f"refused: --cap-frac must be in (0, 1], got {args.cap_frac}",
              file=sys.stderr)
        return 2

    from cql_xmlpipe_spark.plans.extensions import (
        _domain_cap_core,
        _epoch_plan_core,
        _mix_temperature_core,
        corpus_mix_resample,
        corpus_mix_weights,
        _weighted_sample_core,
        embedding_silhouette_by_label,
    )
    from cql_xmlpipe_spark.session import get_spark
    from cql_xmlpipe_spark.sources.registry import load_table

    spark = get_spark("curation-cli")
    if args.contract == "mix-weights":
        out = corpus_mix_weights(spark, args.data_dir)
    elif args.contract == "mix-temperature":
        out = _mix_temperature_core(
            load_table(spark, "documents", args.data_dir), args.temperature
        )
    elif args.contract == "epoch-plan":
        out = _epoch_plan_core(
            load_table(spark, "documents", args.data_dir), args.budget_mult
        )
    elif args.contract == "domain-cap":
        out = _domain_cap_core(
            load_table(spark, "documents", args.data_dir), args.cap_frac
        )
    elif args.contract == "weighted-sample":
        out = _weighted_sample_core(
            load_table(spark, "documents", args.data_dir), args.sample_k
        )
    elif args.contract == "silhouette":
        # the label-quality audit over embeddings.parquet (the other
        # contracts read documents.parquet; --data-dir holds both)
        out = embedding_silhouette_by_label(spark, args.data_dir)
    else:
        out = corpus_mix_resample(spark, args.data_dir)

    if args.out:
        out.write.mode("overwrite").parquet(args.out)
        print(f"wrote {args.out}")
    else:
        for row in out.limit(args.show).collect():
            print(json.dumps(row.asDict(), default=str, sort_keys=True))
    return 0


if __name__ == "__main__":
    sys.exit(main())
