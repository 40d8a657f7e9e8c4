"""Multimodal (image/audio/video) column operators.

Media are opaque ``binary`` columns plus a typed metadata struct — the
Spark-native generalization of the reference's blob branch
(``Query.java:224-225,242-243``, which CDATA-wraps blobs). All heavy
per-item work runs as Arrow-batched ``mapInPandas`` so executors stream
record batches instead of materializing partitions.

Codec availability: general-purpose image/video libraries (PIL/ffmpeg/
librosa) are NOT in this container. The IMAGE path is nonetheless real:
``use_codec=True`` decodes/encodes uncompressed 24-bit BMP with the
pure-numpy codec in ``functions/bmpcodec.py`` (decode → stats / resample
→ re-encode); other image formats raise ``NotImplementedError`` there.
The VIDEO frame-sampling path stays stubbed behind ``use_codec=True``
(container formats genuinely need ffmpeg). The default remains a
deterministic fake decode (hash-derived pixel stats) so plumbing tests
don't depend on payloads being valid media.

Scale design: mapInPandas keeps the binary payload inside the executor
(one pass, no shuffle); downstream joins/aggregations operate on the small
extracted-feature columns only. Payload skew (one 4 GB video among 40 kB
images) is the operational risk at 100 TB — `repartition` by a
size-bucket column before decode when payload sizes are wildly mixed.
"""

from __future__ import annotations

import hashlib
from collections.abc import Iterator

import numpy as np
import pandas as pd
from pyspark.sql import DataFrame
from pyspark.sql import functions as F
from pyspark.sql import types as T

MODALITIES = ["image", "audio", "video"]

MEDIA_META_SCHEMA = T.StructType(
    [
        T.StructField("modality", T.StringType()),
        T.StructField("mime", T.StringType()),
        T.StructField("width", T.IntegerType()),
        T.StructField("height", T.IntegerType()),
        T.StructField("duration_ms", T.IntegerType()),
        T.StructField("n_bytes", T.LongType()),
    ]
)

_MIME = {"image": "image/png", "audio": "audio/wav", "video": "video/mp4"}


def attach_media_columns(docs: DataFrame, id_col: str = "doc_id") -> DataFrame:
    """Synthesize (payload: binary, meta: struct) media columns from the
    documents table — deterministic fakes standing in for real blobs, with
    the exact schema a production ingest would carry."""
    modality = (
        F.when(F.col(id_col) % 3 == 0, "image")
        .when(F.col(id_col) % 3 == 1, "audio")
        .otherwise("video")
    )
    payload = F.col("text").cast("binary")
    meta = F.struct(
        modality.alias("modality"),
        F.element_at(
            F.create_map(
                *[x for m, mime in _MIME.items() for x in (F.lit(m), F.lit(mime))]
            ),
            modality,
        ).alias("mime"),
        (F.col(id_col) % 640 + 1).cast("int").alias("width"),
        (F.col(id_col) % 480 + 1).cast("int").alias("height"),
        (F.col(id_col) % 30000).cast("int").alias("duration_ms"),
        F.octet_length("text").cast("long").alias("n_bytes"),
    )
    return docs.select(F.col(id_col), payload.alias("payload"), meta.alias("meta"))


def synth_pixels(text: str) -> np.ndarray:
    """Deterministic RGB pixel array derived from document text: seed and
    dimensions come from sha256(text), pixels from a seeded PRNG. This is
    the INPUT generator for the codec-true gate path (the system under
    test is encode_bmp/decode_bmp + the feature math, not this) — the
    fixture script imports it so both sides agree on the input bytes."""
    d = hashlib.sha256(text.encode("utf-8")).digest()
    seed = int.from_bytes(d[:8], "big") % (2**32)
    w, h = 4 + d[8] % 13, 4 + d[9] % 13
    return np.random.RandomState(seed).randint(0, 256, size=(h, w, 3), dtype=np.uint8)


def synthesize_bmp_media(docs: DataFrame, id_col: str = "doc_id") -> DataFrame:
    """Media ingest simulator with REAL payloads: derive deterministic
    pixels from each document's text and encode them as genuine
    uncompressed 24-bit BMP (``functions/bmpcodec.encode_bmp``), emitting
    the standard (payload, meta) media schema. Unlike
    ``attach_media_columns`` (opaque text-bytes fakes), every payload
    here decodes — this feeds the codec-true ``use_codec=True`` paths.
    Arrow-batched mapInPandas; payloads are born and stay executor-side."""

    def _synth(batches: Iterator[pd.DataFrame]) -> Iterator[pd.DataFrame]:
        from cql_xmlpipe_spark.functions.bmpcodec import encode_bmp

        for pdf in batches:
            rows = []
            for doc_id, text in zip(pdf[id_col], pdf["text"]):
                px = synth_pixels(text)
                payload = encode_bmp(px)
                rows.append(
                    {
                        id_col: doc_id,
                        "payload": payload,
                        "meta": {
                            "modality": "image",
                            "mime": "image/bmp",
                            "width": int(px.shape[1]),
                            "height": int(px.shape[0]),
                            "duration_ms": 0,
                            "n_bytes": len(payload),
                        },
                    }
                )
            yield pd.DataFrame(rows, columns=[id_col, "payload", "meta"])

    out_schema = T.StructType(
        [
            T.StructField(id_col, T.LongType()),
            T.StructField("payload", T.BinaryType()),
            T.StructField("meta", MEDIA_META_SCHEMA),
        ]
    )
    return docs.select(id_col, "text").mapInPandas(_synth, out_schema)


IMAGE_FEATURES_SCHEMA = T.StructType(
    [
        T.StructField("doc_id", T.LongType()),
        T.StructField("width", T.IntegerType()),
        T.StructField("height", T.IntegerType()),
        T.StructField("mean_r", T.DoubleType()),
        T.StructField("mean_g", T.DoubleType()),
        T.StructField("mean_b", T.DoubleType()),
        T.StructField("sharpness", T.DoubleType()),
    ]
)


def _fake_pixels(payload: bytes, w: int, h: int) -> np.ndarray:
    """Deterministic stand-in for a real decode: seed a PRNG from the
    payload digest so 'pixels' are stable across runs/partitions."""
    seed = int.from_bytes(hashlib.sha256(payload).digest()[:8], "big") % (2**32)
    rng = np.random.RandomState(seed)
    return rng.randint(0, 256, size=(h, w, 3), dtype=np.uint8)


def decode_image_features(media: DataFrame, use_codec: bool = False) -> DataFrame:
    """Per-image stats via mapInPandas (Arrow-batched, zero shuffle).

    ``use_codec=True`` runs a REAL decode (pure-numpy uncompressed-BMP,
    ``functions/bmpcodec.py``); dimensions then come from the image header,
    not the metadata struct. Non-BMP payloads raise NotImplementedError —
    the honest boundary of an image-library-free container."""

    def _decode(batches: Iterator[pd.DataFrame]) -> Iterator[pd.DataFrame]:
        from cql_xmlpipe_spark.functions.bmpcodec import decode_bmp

        for pdf in batches:
            rows = []
            # zip over columns, not iterrows(): iterrows materializes a
            # Series per row (~10× slower on wide Arrow batches)
            for doc_id, payload, meta in zip(
                pdf["doc_id"], pdf["payload"], pdf["meta"]
            ):
                if use_codec:
                    payload = bytes(payload)
                    if payload[:2] != b"BM":
                        raise NotImplementedError(
                            "only uncompressed 24-bit BMP decodes in-container; "
                            "install pillow for other formats"
                        )
                    px = decode_bmp(payload).astype(np.float64)
                    h, w = px.shape[0], px.shape[1]
                else:
                    w, h = int(meta["width"]), int(meta["height"])
                    px = _fake_pixels(payload, w, h).astype(np.float64)
                gray = px.mean(axis=2)
                # 1px-wide image: no horizontal gradient, sharpness 0
                sharp = float(np.abs(np.diff(gray, axis=1)).mean()) if w > 1 else 0.0
                rows.append(
                    {
                        "doc_id": doc_id,
                        "width": w,
                        "height": h,
                        "mean_r": float(px[:, :, 0].mean()),
                        "mean_g": float(px[:, :, 1].mean()),
                        "mean_b": float(px[:, :, 2].mean()),
                        "sharpness": sharp,
                    }
                )
            yield pd.DataFrame(rows, columns=[f.name for f in IMAGE_FEATURES_SCHEMA])

    imgs = media.filter(F.col("meta.modality") == "image")
    return imgs.mapInPandas(_decode, IMAGE_FEATURES_SCHEMA)


RESIZE_SCHEMA = T.StructType(
    [
        T.StructField("doc_id", T.LongType()),
        T.StructField("payload", T.BinaryType()),
        T.StructField("width", T.IntegerType()),
        T.StructField("height", T.IntegerType()),
    ]
)


def resize_images(
    media: DataFrame, target_w: int = 64, target_h: int = 64, use_codec: bool = False
) -> DataFrame:
    """Image resize. ``use_codec=True``: decode uncompressed BMP →
    nearest-neighbor resample (pure-numpy index grid) → re-encode BMP,
    all inside the Arrow batch loop. Default: passthrough stub re-emitting
    payloads with target dimensions (plumbing shape without valid media)."""

    def _resize(batches: Iterator[pd.DataFrame]) -> Iterator[pd.DataFrame]:
        from cql_xmlpipe_spark.functions.bmpcodec import decode_bmp, encode_bmp

        for pdf in batches:
            if use_codec:
                payloads = []
                for payload in pdf["payload"]:
                    px = decode_bmp(bytes(payload))
                    h, w = px.shape[:2]
                    yi = (np.arange(target_h) * h) // target_h
                    xi = (np.arange(target_w) * w) // target_w
                    payloads.append(encode_bmp(px[yi][:, xi]))
                out = pd.DataFrame(
                    {
                        "doc_id": pdf["doc_id"],
                        "payload": payloads,
                        "width": np.int32(target_w),
                        "height": np.int32(target_h),
                    }
                )
                yield out
                continue
            out = pd.DataFrame(
                {
                    "doc_id": pdf["doc_id"],
                    "payload": pdf["payload"],
                    "width": np.int32(target_w),
                    "height": np.int32(target_h),
                }
            )
            yield out

    return media.filter(F.col("meta.modality") == "image").mapInPandas(
        _resize, RESIZE_SCHEMA
    )


FRAME_SAMPLE_SCHEMA = T.StructType(
    [
        T.StructField("doc_id", T.LongType()),
        T.StructField("frame_idx", T.IntegerType()),
        T.StructField("ts_ms", T.IntegerType()),
        T.StructField("frame", T.BinaryType()),
    ]
)


def sample_video_frames(
    media: DataFrame, every_ms: int = 1000, use_codec: bool = False
) -> DataFrame:
    """Frame sampling: one output row per sampled frame (1→N mapInPandas).

    Real body would seek the container every `every_ms`; the stub emits a
    digest-derived placeholder per timestamp so row counts, schemas and
    batch fan-out match the production shape.
    """

    def _sample(batches: Iterator[pd.DataFrame]) -> Iterator[pd.DataFrame]:
        for pdf in batches:
            rows = []
            for doc_id, payload, meta in zip(pdf["doc_id"], pdf["payload"], pdf["meta"]):
                if use_codec:
                    raise NotImplementedError("video codec not available; sample here")
                dur = int(meta["duration_ms"])
                for i, ts in enumerate(range(0, max(dur, 1), every_ms)):
                    # placeholder 'frame': sha256 over UTF-8-safe bytes
                    # (payload is text here) so an ANSI-SQL oracle can
                    # recompute it — sha256(text || ':' || ts)
                    digest = hashlib.sha256(
                        bytes(payload) + b":" + str(ts).encode("ascii")
                    ).digest()
                    rows.append(
                        {"doc_id": doc_id, "frame_idx": i, "ts_ms": ts, "frame": digest}
                    )
            yield pd.DataFrame(rows, columns=[f.name for f in FRAME_SAMPLE_SCHEMA])

    return media.filter(F.col("meta.modality") == "video").mapInPandas(
        _sample, FRAME_SAMPLE_SCHEMA
    )
