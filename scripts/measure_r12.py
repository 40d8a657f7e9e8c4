"""Round-12 streaming-state measurements (SCALE.md source):

A. roster_maintenance_sink per-trigger wall across a 24-batch stream,
   compact_every=6 vs no compaction — the bounded-plan claim measured,
   not asserted (VERDICT r11 #1). Batches are SMALL relative to the
   corpus (30 docs on a 5,000-doc corpus → +14% data over the whole
   run) so plan-width growth, not data growth, is what the trigger
   walls expose.
B. snapshot="delta" vs "full" write amplification per trigger
   (bytes under rosters/v=<id>, VERDICT r11 #2).
C. restart cost: fresh sink after 24 committed batches — compacted
   (reads one index snapshot, re-signs <= K batches) vs uncompacted
   (re-signs all 24) — timed on the 25th-batch update.

Run: python scripts/measure_r12.py [corpus_dir] (default sf0.1).
The sink callbacks are driven directly (sink(df, batch_id)) — the
foreachBatch mechanics are pytest-pinned; this isolates per-trigger
engine cost from file-source scheduling noise. Compaction triggers
(len(pending) reaches K inside a batch) pay the snapshot write in that
trigger's wall — reported separately from the non-compaction median.
"""

from __future__ import annotations

import os
import shutil
import sys
import time

sys.path.insert(0, os.path.dirname(os.path.dirname(os.path.abspath(__file__))))

DATA = sys.argv[1] if len(sys.argv) > 1 else "/root/testdata/sf0.1"
WORK = "/tmp/sparkgraft_r12_stream"
N_BATCHES = int(os.environ.get("SPARK_GRAFT_STREAM_BATCHES", "24"))
BATCH_CLONES = 15   # docs cloning a corpus text (touch standing families)
BATCH_NOVEL = 15    # novel texts (new singletons/families)
K = 6


def du_bytes(path: str) -> int:
    total = 0
    for root, _dirs, files in os.walk(path):
        for f in files:
            total += os.path.getsize(os.path.join(root, f))
    return total


def stats(walls: list[float], compaction_idx: set[int]) -> str:
    plain = [w for i, w in enumerate(walls) if i not in compaction_idx and i > 0]
    early = plain[: len(plain) // 2]
    late = plain[len(plain) // 2 :]
    comp = [walls[i] for i in sorted(compaction_idx)]
    med = sorted(plain)[len(plain) // 2]
    out = (
        f"non-compaction triggers (excl. warm-up t0): "
        f"first-half mean {sum(early)/len(early):.2f}s | "
        f"second-half mean {sum(late)/len(late):.2f}s | median {med:.2f}s"
    )
    if comp:
        out += f"\ncompaction triggers ({sorted(compaction_idx)}): " + " ".join(
            f"{w:.2f}" for w in comp
        )
    return out


def main() -> None:
    os.environ.setdefault("SPARK_GRAFT_CPUS", "16")

    from cql_xmlpipe_spark.session import get_spark
    from cql_xmlpipe_spark.sources.registry import load_table
    from cql_xmlpipe_spark.streaming.dedup import roster_maintenance_sink

    spark = get_spark("measure-r12")
    docs = load_table(spark, "documents", DATA).select("doc_id", "text")
    corpus = docs.persist()
    n = corpus.count()
    print(f"corpus: {n} docs from {DATA}")

    # deterministic batches: clones of corpus texts under shifted ids +
    # novel texts, disjoint ids throughout
    texts = [r["text"] for r in corpus.orderBy("doc_id").limit(2000).collect()]
    batches = []
    for b in range(N_BATCHES + 1):  # +1: the restart-probe batch
        rows = []
        for j in range(BATCH_CLONES):
            rows.append((10_000_000 + b * 1000 + j, texts[(b * 97 + j) % len(texts)]))
        for j in range(BATCH_NOVEL):
            rows.append((
                10_000_000 + b * 1000 + 500 + j,
                f"novel stream doc batch {b} item {j} "
                + " ".join(f"w{b}x{j}y{t}" for t in range(12)),
            ))
        batches.append(spark.createDataFrame(rows, "doc_id long, text string"))

    for label, compact_every, snapshot in (
        ("compact6_delta", K, "delta"),
        ("nocompact_full", 10**9, "full"),
    ):
        state = f"{WORK}/{label}"
        shutil.rmtree(state, ignore_errors=True)
        t0 = time.time()
        sink = roster_maintenance_sink(
            corpus, state, threshold=0.5, k=3,
            snapshot=snapshot, compact_every=compact_every,
        )
        build = time.time() - t0
        walls, compaction_idx = [], set()
        for b in range(N_BATCHES):
            before = sink.state["base_upto"]
            t0 = time.time()
            sink(batches[b], b)
            walls.append(time.time() - t0)
            if sink.state["base_upto"] != before:
                compaction_idx.add(b)
        sink.close()
        spark.catalog.clearCache()
        print(f"\n== {label}: standing build {build:.1f}s")
        print("per-trigger walls:", " ".join(f"{w:.2f}" for w in walls))
        print(stats(walls, compaction_idx))
        v_bytes = {
            v: du_bytes(f"{state}/rosters/v={v}") for v in (0, N_BATCHES - 1)
        }
        print(f"rosters/v bytes: v=0 {v_bytes[0]:,} | v={N_BATCHES-1} "
              f"{v_bytes[N_BATCHES-1]:,} | all v dirs "
              f"{du_bytes(f'{state}/rosters'):,}")

        # C: restart — fresh sink object over the committed state, one
        # more batch (includes any catch-up re-signing)
        t0 = time.time()
        sink2 = roster_maintenance_sink(
            corpus, state, threshold=0.5, k=3,
            snapshot=snapshot, compact_every=compact_every,
        )
        construct = time.time() - t0
        t0 = time.time()
        sink2(batches[N_BATCHES], N_BATCHES)
        first_after = time.time() - t0
        covered0 = "compacted" if sink2.state["base_upto"] >= 0 else "none"
        print(f"restart: construct {construct:.1f}s (index base: {covered0}), "
              f"batch {N_BATCHES} update {first_after:.1f}s "
              f"(re-signs {'<=' + str(K) if covered0 == 'compacted' else 'ALL'} "
              "committed batches)")
        sink2.close()
        spark.catalog.clearCache()


if __name__ == "__main__":
    main()
