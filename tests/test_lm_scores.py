"""Model tests for the round-12 statistical scoring operators:
bigram-LM cross-entropy, DSIR importance weights, shuffle shards.

The fixed-point-quantized ln device (see text_bigram_lm_score's
docstring) is safe only while no per-type value sits within the ln
implementations' 1-ulp disagreement (~1e-8 at the 1e6 scale) of a floor
boundary — test_*_boundary_distance measures the actual minimum over
the gate corpora and asserts orders-of-magnitude headroom.
"""

from __future__ import annotations

import math

import duckdb
import pytest

from tests.conftest import SF_CORRECT, SF_SMOKE


def _doc_view(con, sf_dir):
    con.sql(
        f"CREATE OR REPLACE VIEW documents AS "
        f"SELECT * FROM read_parquet('{sf_dir}/documents.parquet')"
    )


@pytest.mark.parametrize("sf_dir", [SF_SMOKE, SF_CORRECT])
def test_bigram_lm_boundary_distance(sf_dir):
    """Every bigram type's -ln(p)*1e6 + 0.5 must sit far from an integer
    floor boundary relative to the ~1e-8 cross-engine ln wobble."""
    con = duckdb.connect()
    _doc_view(con, sf_dir)
    (dist, n) = con.sql(
        """
        WITH t AS (
          SELECT doc_id,
                 list_filter(string_split(regexp_replace(lower(text),
                    '[^a-z0-9]+', ' ', 'g'), ' '), x -> x <> '') AS toks
          FROM documents),
        t2 AS (SELECT doc_id, toks FROM t WHERE len(toks) >= 2),
        bg AS (
          SELECT doc_id,
                 unnest(list_transform(range(1, len(toks)),
                        i -> toks[i] || ' ' || toks[i+1])) AS bigram
          FROM t2),
        c12 AS (SELECT bigram, COUNT(*) AS c12 FROM bg GROUP BY bigram),
        c1 AS (SELECT string_split(bigram, ' ')[1] AS w1, SUM(c12) AS c1
               FROM c12 GROUP BY 1),
        v AS (SELECT COUNT(DISTINCT w) AS v
              FROM (SELECT unnest(toks) AS w FROM t2)),
        x AS (
          SELECT (-ln(CAST(c12.c12 + 1 AS DOUBLE)
                      / CAST(c1.c1 + v.v AS DOUBLE))) * 1000000.0 + 0.5 AS q
          FROM c12 JOIN c1 ON string_split(c12.bigram, ' ')[1] = c1.w1, v)
        SELECT MIN(LEAST(q - floor(q), ceil(q) - q)), COUNT(*) FROM x
        """
    ).fetchone()
    assert n > 100, "corpus too small to exercise the type table"
    assert dist > 1e-4, f"ln boundary margin too small: {dist}"


@pytest.mark.parametrize("sf_dir", [SF_SMOKE, SF_CORRECT])
def test_dsir_boundary_distance(sf_dir):
    con = duckdb.connect()
    _doc_view(con, sf_dir)
    (dist, n) = con.sql(
        """
        WITH occ AS (
          SELECT doc_id, lang, substring(md5(w), 1, 2) AS bucket
          FROM (SELECT doc_id, lang,
                       unnest(list_filter(string_split(regexp_replace(
                          lower(text), '[^a-z0-9]+', ' ', 'g'), ' '),
                          x -> x <> '')) AS w
                FROM documents)),
        raw AS (SELECT bucket, COUNT(*) AS cr FROM occ GROUP BY bucket),
        tgt AS (SELECT bucket, COUNT(*) AS ct FROM occ
                WHERE lang = 'en' GROUP BY bucket),
        tot AS (SELECT (SELECT COUNT(*) FROM occ) AS nr,
                       (SELECT COUNT(*) FROM occ WHERE lang = 'en') AS nt),
        x AS (
          SELECT ln((CAST(COALESCE(tgt.ct, 0) + 1 AS DOUBLE)
                     * CAST(tot.nr + 256 AS DOUBLE))
                    / (CAST(raw.cr + 1 AS DOUBLE)
                       * CAST(tot.nt + 256 AS DOUBLE)))
                 * 1000000.0 + 0.5 AS q
          FROM raw LEFT JOIN tgt ON raw.bucket = tgt.bucket, tot)
        SELECT MIN(LEAST(q - floor(q), ceil(q) - q)), COUNT(*) FROM x
        """
    ).fetchone()
    # the synthetic corpus vocabulary is ~31 words, so only ~31 of the
    # 256 buckets are populated — the table is small but real
    assert n >= 16
    assert dist > 1e-4, f"ln boundary margin too small: {dist}"


def test_bigram_lm_hand_model(spark, tmp_path):
    """Hand corpus: the engine's ce_nats must equal the pure-Python
    add-one bigram LM to within the 1e-6 quantization grid."""
    rows = [
        (1, "the cat sat on the mat"),
        (2, "the cat ate the cat food"),
        (3, "dogs bark"),
        (4, "x"),  # single token: no bigrams, must not appear
        (5, ""),  # empty: must not appear
    ]
    import pandas as pd

    pd.DataFrame(rows, columns=["doc_id", "text"]).assign(
        lang="en", source="t", n_chars=0
    ).to_parquet(tmp_path / "documents.parquet")
    from cql_xmlpipe_spark.plans.extensions import text_bigram_lm_score

    got = {
        r["doc_id"]: (r["n_bigrams"], r["ce_nats"])
        for r in text_bigram_lm_score(spark, str(tmp_path)).collect()
    }
    # pure-python model
    toks = {i: t.split() for i, t in rows if len(t.split()) >= 2}
    bigrams = {i: list(zip(ts, ts[1:])) for i, ts in toks.items()}
    from collections import Counter

    c12 = Counter(b for bs in bigrams.values() for b in bs)
    c1 = Counter(b[0] for bs in bigrams.values() for b in bs)
    vocab = {w for ts in toks.values() for w in ts}
    want = {}
    for i, bs in bigrams.items():
        nll = [
            math.floor(
                -math.log((c12[b] + 1) / (c1[b[0]] + len(vocab))) * 1e6 + 0.5
            )
            for b in bs
        ]
        want[i] = (len(bs), sum(nll) / (len(bs) * 1e6))
    assert set(got) == set(want) == {1, 2, 3}
    for i in want:
        assert got[i][0] == want[i][0]
        assert got[i][1] == pytest.approx(want[i][1], abs=2e-6)
    # doc 2 repeats "the cat" — higher-probability bigrams, lower ce than
    # the unique-bigram doc 3
    assert got[2][1] < got[3][1]


def test_dsir_weights_favor_target_language(spark):
    """On the real corpus, en docs must average a higher DSIR logweight
    than non-en docs (the target slice IS en) — the directional sanity
    of the importance weights, deterministic given the fixed corpus."""
    from pyspark.sql import functions as F

    from cql_xmlpipe_spark.plans.extensions import dsir_importance_weights
    from cql_xmlpipe_spark.sources.registry import load_table

    w = dsir_importance_weights(spark, SF_SMOKE)
    d = load_table(spark, "documents", SF_SMOKE).select("doc_id", "lang")
    per = (
        w.join(d, "doc_id")
        .groupBy(F.col("lang") == "en")
        .agg(F.avg(F.col("dsir_logweight") / F.col("n_tokens")).alias("m"))
        .collect()
    )
    means = {r[0]: r["m"] for r in per}
    assert means[True] > means[False]


def test_shuffle_shards_contract(spark):
    """Shards partition the corpus; positions are 1..n contiguous per
    shard; the order is reproducible run to run."""
    from cql_xmlpipe_spark.plans.extensions import corpus_shuffle_shards
    from cql_xmlpipe_spark.sources.registry import load_table

    a = corpus_shuffle_shards(spark, SF_SMOKE).collect()
    b = corpus_shuffle_shards(spark, SF_SMOKE).collect()
    assert sorted(map(tuple, a)) == sorted(map(tuple, b))
    n_docs = load_table(spark, "documents", SF_SMOKE).count()
    assert len(a) == n_docs
    assert len({r["doc_id"] for r in a}) == n_docs
    by_shard: dict = {}
    for r in a:
        by_shard.setdefault(r["shard"], []).append(r["pos"])
    assert set(by_shard) <= {format(i, "x") for i in range(16)}
    assert len(by_shard) == 16  # 500 docs over 16 hex shards: all hit
    for shard, poss in by_shard.items():
        assert sorted(poss) == list(range(1, len(poss) + 1)), shard
    # balance: md5 is uniform, no shard should be pathologically hot
    sizes = sorted(len(p) for p in by_shard.values())
    assert sizes[-1] <= 3 * max(1, sizes[0])


def test_gopher_rules_hand_corpus(spark, tmp_path):
    """Each rule must trip on a document built to violate exactly it."""
    import pandas as pd

    filler = "the quick brown fox jumps over lazy dogs near rivers today "
    good = (filler * 5).strip()  # 50+ words, has 'the', varied
    rows = [
        (1, good),  # passes everything
        (2, "the cat"),  # too short -> r_wordcount False
        (3, ("spam " * 60 + "the").strip()),  # 'spam' >20% -> r_maxword False
        (4, good.replace("the", "xx") + " zz"),  # no stopword -> r_stop False
        (5, ("1 2 3 4 5 " * 12 + "the word").strip()),  # digits -> r_alpha False
    ]
    pd.DataFrame(rows, columns=["doc_id", "text"]).assign(
        lang="en", source="t", n_chars=0
    ).to_parquet(tmp_path / "documents.parquet")
    from cql_xmlpipe_spark.plans.extensions import text_gopher_rules

    got = {r["doc_id"]: r.asDict() for r in text_gopher_rules(spark, str(tmp_path)).collect()}
    assert got[1]["keep"] is True
    assert got[2]["r_wordcount"] is False and got[2]["keep"] is False
    assert got[3]["r_maxword"] is False and got[3]["keep"] is False
    assert got[4]["r_stop"] is False and got[4]["keep"] is False
    assert got[5]["r_alpha"] is False and got[5]["keep"] is False


def test_power_iteration_matches_numpy_model(spark):
    """The engine trajectory must equal an independent numpy
    re-implementation of the same quantized recurrence (same centering,
    same init, same 1e-6 fixed-point cross-row sums), and the final
    component must be unit-norm."""
    import numpy as np

    from cql_xmlpipe_spark.plans.extensions import embedding_top_pc_power
    from cql_xmlpipe_spark.sources.registry import load_table

    got = {
        r["dim"]: (r["y"], r["component"])
        for r in embedding_top_pc_power(spark, SF_SMOKE).collect()
    }
    X = np.array(
        [
            [float(x) for x in r["embedding"]]
            for r in load_table(spark, "embeddings", SF_SMOKE)
            .orderBy("vec_id")
            .collect()
        ],
        dtype=np.float64,
    )
    mu = np.floor(X * 1e6 + 0.5).astype(np.int64).sum(axis=0) / (len(X) * 1e6)
    Xc = X - mu
    d = X.shape[1]
    z = np.full(d, 1.0 / math.sqrt(d))
    for _ in range(3):
        s = Xc @ z
        y = np.floor(Xc * s[:, None] * 1e6 + 0.5).astype(np.int64).sum(axis=0) / 1e6
        z = y / math.sqrt(float((y * y).sum()))
    assert set(got) == set(range(d))
    for i in range(d):
        assert got[i][0] == pytest.approx(y[i], abs=1e-9)
        assert got[i][1] == pytest.approx(z[i], abs=1e-9)
    assert sum(c * c for _, c in got.values()) == pytest.approx(1.0, abs=1e-9)


def test_remove_top_pc_pythagoras(spark):
    """All-but-the-top audit: z is unit, so per vector
    proj² + norm_after² must equal the centered norm² (Pythagoras) and
    the residual must be ~orthogonal to z — both checked against an
    independent numpy recomputation of the centered rows."""
    import numpy as np

    from cql_xmlpipe_spark.plans.extensions import embedding_remove_top_pc
    from cql_xmlpipe_spark.sources.registry import load_table

    got = {
        r["vec_id"]: (r["proj"], r["norm_after"])
        for r in embedding_remove_top_pc(spark, SF_SMOKE).collect()
    }
    rows = (
        load_table(spark, "embeddings", SF_SMOKE)
        .orderBy("vec_id")
        .collect()
    )
    X = np.array([[float(x) for x in r["embedding"]] for r in rows])
    ids = [r["vec_id"] for r in rows]
    mu = np.floor(X * 1e6 + 0.5).astype(np.int64).sum(axis=0) / (len(X) * 1e6)
    Xc = X - mu
    assert set(got) == set(ids)
    cn = {i: float((x * x).sum()) for i, x in zip(ids, Xc)}
    for i in ids:
        proj, after = got[i]
        assert proj * proj + after * after == pytest.approx(cn[i], rel=1e-9)


def test_wordpiece_hand_model(spark, tmp_path):
    """Greedy longest-match against a transparent model corpus: repeated
    substrings enter the vocab and long words split on them; rare long
    words fall back through shorter pieces down to single chars."""
    import hashlib

    import pandas as pd

    rows = [
        (1, "abcd abcd abcd abcd"),   # 'abcd' frequent -> one piece
        (2, "abcdabcd"),              # splits as abcd+abcd
        (3, "zzzz qqq"),              # zzzz/qqq frequent enough via subs
        (4, "xyabcdyx"),              # mixes rare chars with the hot sub
    ]
    pd.DataFrame(rows, columns=["doc_id", "text"]).assign(
        lang="en", source="t", n_chars=0
    ).to_parquet(tmp_path / "documents.parquet")
    from cql_xmlpipe_spark.plans.extensions import (
        _WP_MAX_LEN,
        _WP_TOP_SUBS,
        text_wordpiece_tokenize,
    )

    got = {
        r["doc_id"]: (r["n_wordpieces"], r["pieces_md5"])
        for r in text_wordpiece_tokenize(spark, str(tmp_path)).collect()
    }
    # independent python model
    from collections import Counter

    words = [w for _, t in rows for w in t.split()]
    wt = Counter(words)
    chars = {c for w in wt for c in w}
    subs: Counter = Counter()
    for w, cnt in wt.items():
        for l in range(2, _WP_MAX_LEN + 1):
            for i in range(len(w) - l + 1):
                subs[w[i : i + l]] += cnt
    top = {
        p
        for p, _ in sorted(subs.items(), key=lambda kv: (-kv[1], kv[0]))[
            :_WP_TOP_SUBS
        ]
    }
    vocab = chars | top

    def seg(w):
        out, pos = [], 0
        while pos < len(w):
            for l in range(min(_WP_MAX_LEN, len(w) - pos), 0, -1):
                if w[pos : pos + l] in vocab:
                    out.append(w[pos : pos + l])
                    pos += l
                    break
        return out

    for doc_id, text in rows:
        ps = [p for w in text.split() for p in seg(w)]
        stream = " ".join(" ".join(seg(w)) for w in text.split())
        md5 = hashlib.md5(stream.encode()).hexdigest()
        assert got[doc_id] == (len(ps), md5), (doc_id, stream)
    # the hot substring segments doc 2 into exactly two pieces
    assert got[2][0] == 2


def test_cluster_safe_split_never_straddles(spark):
    """At sf0.1 (which has real duplicate families) the family-keyed
    split puts every cluster wholly on one side, while the naive
    md5(doc_id) rule provably straddles at least one family there."""
    from pyspark.sql import functions as F

    from cql_xmlpipe_spark.plans.extensions import dataset_split_cluster_safe

    df = dataset_split_cluster_safe(spark, "/root/testdata/sf0.1")
    per_cluster = (
        df.groupBy("cluster_id")
        .agg(
            F.countDistinct("split").alias("n_splits"),
            F.count(F.lit(1)).alias("n"),
        )
        .collect()
    )
    assert all(r["n_splits"] == 1 for r in per_cluster)
    multi = [r for r in per_cluster if r["n"] > 1]
    assert multi, "sf0.1 should have non-singleton families"
    # the naive doc-keyed rule DOES straddle at least one of them
    rows = df.filter(
        F.col("cluster_id").isin([r["cluster_id"] for r in multi])
    ).collect()
    import hashlib

    def naive(doc_id):
        return hashlib.md5(str(doc_id).encode()).hexdigest()[0] <= "7"

    by_cluster: dict = {}
    for r in rows:
        by_cluster.setdefault(r["cluster_id"], set()).add(naive(r["doc_id"]))
    assert any(len(v) == 2 for v in by_cluster.values())
