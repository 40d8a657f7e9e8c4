"""Frozen-LM quality scoring for streams — the bigram-LM sibling of
``streaming/dedup.py``'s stage-once/probe-per-batch discipline: the LM
tables are built ONCE from the standing corpus, persisted, and every
micro-batch of new documents is scored against them (unseen bigrams
and contexts fall to c=0 under the same add-one smoothing).

Why this is the production shape: the self-scored gate
(``text_bigram_lm_score``) re-fits the LM per run — correct for a
one-shot corpus audit, wrong for a recurring crawl where the LM must
stay FIXED between releases so scores are comparable across ingests.
"""

from __future__ import annotations

from pyspark.sql import DataFrame
from pyspark.sql import functions as F

from cql_xmlpipe_spark.functions import text as TX


def stage_bigram_lm(
    train: DataFrame, text_col: str = "text", id_col: str = "doc_id"
) -> tuple[DataFrame, DataFrame, int]:
    """Fit the add-one bigram LM on ``train``: returns
    ``(c12, c1, V)`` — the bigram-type counts, the context counts, and
    the vocabulary size — with the two tables PERSISTED (caller owns
    their release, the ``stage_corpus_lsh`` contract). The tables are
    type-table-sized; V is a driver int (one scalar action, the same
    cost class as the dedup pre-flight guards)."""
    toks = train.select(
        F.col(id_col), TX.words(F.col(text_col)).alias("toks")
    ).filter(F.size("toks") >= 2)
    bg = toks.select(F.explode(TX.ngrams(F.col("toks"), 2)).alias("bigram"))
    c12 = bg.groupBy("bigram").agg(F.count(F.lit(1)).alias("c12")).persist()
    c1 = (
        c12.groupBy(F.split(F.col("bigram"), " ").getItem(0).alias("w1"))
        .agg(F.sum("c12").alias("c1"))
        .persist()
    )
    # V over the TRAIN slice's tokens — same derivation as the
    # self-scored gate: every token of a >=2-token doc lands in a
    # bigram half, so the compact type table carries the whole set
    v = (
        c12.select(F.explode(F.split(F.col("bigram"), " ")).alias("w"))
        .agg(F.countDistinct("w"))
        .collect()[0][0]
    )
    return c12, c1, int(v)


def score_docs_with_lm(
    lm: tuple[DataFrame, DataFrame, int],
    docs: DataFrame,
    text_col: str = "text",
    id_col: str = "doc_id",
) -> DataFrame:
    """Score documents against a staged LM: per doc, bigram count, OOV
    bigram count (types absent from the LM), and add-one cross-entropy
    ``ce_nats`` with unseen bigrams/contexts at c=0. The per-type
    negative log-prob is quantized to 1e-6 fixed point before the exact
    integer per-doc sums — the same cross-engine ln-wobble containment
    as ``text_bigram_lm_score``."""
    c12, c1, v = lm
    toks = docs.select(
        F.col(id_col), TX.words(F.col(text_col)).alias("toks")
    ).filter(F.size("toks") >= 2)
    docbg = (
        toks.select(id_col, F.explode(TX.ngrams(F.col("toks"), 2)).alias("bigram"))
        .groupBy(id_col, "bigram")
        .agg(F.count(F.lit(1)).alias("dcnt"))
    )
    j = (
        docbg.withColumn("w1", F.split(F.col("bigram"), " ").getItem(0))
        .join(c12, "bigram", "left")
        .join(c1, "w1", "left")
    )
    p = (F.coalesce(F.col("c12"), F.lit(0)) + 1).cast("double") / (
        F.coalesce(F.col("c1"), F.lit(0)) + F.lit(v)
    ).cast("double")
    nllq = F.floor((-F.log(p)) * F.lit(1000000.0) + F.lit(0.5)).cast("long")
    oov = F.when(F.col("c12").isNull(), F.col("dcnt")).otherwise(F.lit(0))
    return (
        j.select(
            id_col,
            "dcnt",
            nllq.alias("nllq"),
            oov.alias("oov"),
        )
        .groupBy(id_col)
        .agg(
            F.sum("dcnt").alias("n_bigrams"),
            F.sum("oov").alias("n_oov_bigrams"),
            F.sum(F.col("dcnt") * F.col("nllq")).alias("tot"),
        )
        .select(
            id_col,
            "n_bigrams",
            "n_oov_bigrams",
            (
                F.col("tot").cast("double")
                / (F.col("n_bigrams") * F.lit(1000000.0))
            ).alias("ce_nats"),
        )
    )


def lm_score_sink(
    corpus: DataFrame,
    out_path: str,
    text_col: str = "text",
    id_col: str = "doc_id",
):
    """``foreachBatch`` composition: score every micro-batch of
    documents against the ONCE-staged corpus LM. Stream ≡ batch by
    construction — a doc's score depends only on its own bigrams and
    the frozen LM tables, so per-batch outputs union to exactly the
    all-at-once scoring (pinned in tests/test_streaming.py). Each batch
    writes ``out_path/batch=<id>`` with overwrite (idempotent under
    at-least-once replay). The returned callback carries ``close()``
    releasing the staged LM tables."""
    lm = stage_bigram_lm(corpus, text_col, id_col)

    def score_batch(batch_df: DataFrame, batch_id: int) -> None:
        score_docs_with_lm(lm, batch_df, text_col, id_col).write.mode(
            "overwrite"
        ).parquet(f"{out_path}/batch={batch_id}")

    def close() -> None:
        for fr in lm[:2]:
            try:
                fr.unpersist()
            except Exception:  # pragma: no cover - session teardown race
                pass

    score_batch.close = close
    score_batch.lm = lm
    return score_batch
