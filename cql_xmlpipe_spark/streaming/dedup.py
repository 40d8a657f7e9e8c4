"""Streaming deduplication — exactly-once event streams from at-least-
once sources (the streaming sibling of operators/dedup.py).

``dropDuplicatesWithinWatermark`` keeps one row per key and expires its
key state once the event-time watermark passes — bounded state at
unbounded input, which unwatermarked ``dropDuplicates`` cannot give on a
stream.
"""

from __future__ import annotations

from collections.abc import Sequence

from pyspark.sql import DataFrame


def dedup_stream(
    events: DataFrame,
    keys: Sequence[str] = ("event_id",),
    ts_col: str = "ts",
    watermark: str = "10 minutes",
) -> DataFrame:
    """Drop duplicate events by key within the watermark horizon."""
    return events.withWatermark(ts_col, watermark).dropDuplicatesWithinWatermark(
        list(keys)
    )


def incremental_probe_sink(
    corpus: DataFrame,
    out_path: str,
    text_col: str = "text",
    id_col: str = "doc_id",
    threshold: float = 0.5,
    k: int = 3,
    max_pairs: int | None = None,
):
    """``foreachBatch`` composition of the incremental-ingest dedup
    (round 11 — the last unclosed composition between the streaming
    module and the dedup family): returns a callback for
    ``writeStream.foreachBatch`` that dedups every micro-batch of
    documents against the STANDING corpus through
    :func:`~cql_xmlpipe_spark.operators.dedup.incremental_probe_pairs`.

    The corpus LSH index (shingle-hash sets + banded buckets — the
    SHARED geometry, :func:`~cql_xmlpipe_spark.operators.dedup.
    stage_corpus_lsh`) is staged ONCE at sink construction and reused by
    every batch, so per-trigger work is signing the batch plus the
    asymmetric (band, bucket) probe join — the corpus is never re-signed
    and no batch×batch or corpus×corpus candidates form. Stream ≡ batch
    by construction: a cross pair's banding fate and Jaccard depend only
    on the two texts, so the union of per-batch probe outputs equals one
    probe of the whole increment (pinned in tests/test_streaming.py).

    Each batch writes ``out_path/batch=<batch_id>`` with overwrite — the
    idempotent at-least-once pattern: a replayed micro-batch rewrites
    its own partition instead of double-appending, and
    ``spark.read.parquet(out_path)`` reassembles the full pair set with
    ``batch`` as a partition column. ``max_pairs`` forwards the
    cross-set two-stage output guard per batch; a refusal raised inside
    ``foreachBatch`` FAILS the streaming query loudly with the remedy in
    the exception (deliberate — silently skipping a hot batch would
    publish an incomplete pair set). The staged corpus caches survive
    the failure, and the checkpoint makes the restart resume AT the
    refused batch once remediated (bigger cap, or exact-dedup staging
    upstream). Note the probe contract: pairs are batch×CORPUS only —
    within-stream (batch×batch, cross-micro-batch) near-dups are out of
    scope here, exactly as in :func:`~cql_xmlpipe_spark.operators.
    dedup.incremental_probe_pairs`; fold ingests into the corpus with
    :func:`~cql_xmlpipe_spark.operators.dedup.incremental_roster_update`
    between runs when standing state must absorb the stream.
    """
    from cql_xmlpipe_spark.operators.dedup import (
        incremental_probe_pairs,
        stage_corpus_lsh,
        unpersist_intermediates,
    )

    staged = stage_corpus_lsh(corpus, text_col, id_col, k)

    def probe_batch(batch_df: DataFrame, batch_id: int) -> None:
        pairs = incremental_probe_pairs(
            corpus,
            batch_df,
            text_col,
            id_col,
            threshold,
            k,
            max_pairs=max_pairs,
            corpus_staged=staged,
        )
        pairs.write.mode("overwrite").parquet(f"{out_path}/batch={batch_id}")
        unpersist_intermediates(pairs)

    return probe_batch
