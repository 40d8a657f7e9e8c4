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
The AUDIO path is real too: ``use_codec=True`` decodes canonical PCM16
mono WAV with the pure-struct codec in ``functions/wavcodec.py``
(decode → duration/RMS/peak/zero-crossing stats); compressed audio
raises. The VIDEO frame-sampling path is real for uncompressed RGB24
AVI (``functions/avicodec.py``: decode container → seek grid → per-
frame digests); compressed containers (MP4/H.264) genuinely need
ffmpeg and raise inside the codec. The default remains a deterministic
fake decode (hash-derived pixel/sample stats) so plumbing tests don't
depend on payloads being valid media.

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


def synth_samples(text: str) -> tuple[np.ndarray, int]:
    """Deterministic (int16 samples, sample rate) derived from document
    text: seed, length and rate come from sha256(text), samples from a
    seeded PRNG — the audio sibling of ``synth_pixels``. This is the
    INPUT generator for the codec-true gate path (the system under test
    is encode_wav/decode_wav + the feature math, not this); the fixture
    script imports it so both sides agree on the input samples."""
    d = hashlib.sha256(text.encode("utf-8")).digest()
    seed = int.from_bytes(d[:8], "big") % (2**32)
    n = 256 + (int.from_bytes(d[8:10], "big") % 3000)
    rate = (8000, 16000, 22050, 44100)[d[10] % 4]
    samples = np.random.RandomState(seed).randint(
        -32768, 32768, size=n, dtype=np.int32
    ).astype(np.int16)
    return samples, rate


def synthesize_wav_media(docs: DataFrame, id_col: str = "doc_id") -> DataFrame:
    """Media ingest simulator with REAL audio payloads: derive
    deterministic PCM16 samples from each document's text and encode them
    as canonical mono WAV (``functions/wavcodec.encode_wav``), emitting
    the standard (payload, meta) media schema — the audio sibling of
    ``synthesize_bmp_media``. Every payload decodes; this feeds the
    codec-true ``use_codec=True`` audio path. Arrow-batched mapInPandas;
    payloads are born and stay executor-side."""

    def _synth(batches: Iterator[pd.DataFrame]) -> Iterator[pd.DataFrame]:
        from cql_xmlpipe_spark.functions.wavcodec import encode_wav

        for pdf in batches:
            rows = []
            for doc_id, text in zip(pdf[id_col], pdf["text"]):
                samples, rate = synth_samples(text)
                payload = encode_wav(samples, rate)
                rows.append(
                    {
                        id_col: doc_id,
                        "payload": payload,
                        "meta": {
                            "modality": "audio",
                            "mime": "audio/wav",
                            "width": 0,
                            "height": 0,
                            "duration_ms": int(len(samples) * 1000 // rate),
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


AUDIO_FEATURES_SCHEMA = T.StructType(
    [
        T.StructField("doc_id", T.LongType()),
        T.StructField("sample_rate", T.IntegerType()),
        T.StructField("n_samples", T.LongType()),
        T.StructField("duration_ms", T.IntegerType()),
        T.StructField("rms", T.DoubleType()),
        T.StructField("peak", T.IntegerType()),
        T.StructField("zero_cross_rate", T.DoubleType()),
    ]
)


def audio_features_from_samples(samples: np.ndarray, rate: int) -> dict:
    """Feature math shared by both decode paths (and re-stated
    independently by the fixture script): integer-exact duration, RMS in
    float64, peak over int64 |s| (int16 min would overflow in-width),
    zero-crossing rate as the fraction of adjacent strictly-sign-opposed
    pairs."""
    s = samples.astype(np.float64)
    n = len(samples)
    zc = float(((s[:-1] * s[1:]) < 0).mean()) if n > 1 else 0.0
    return {
        "sample_rate": int(rate),
        "n_samples": n,
        "duration_ms": int(n * 1000 // rate),
        "rms": float(np.sqrt((s * s).mean())) if n else 0.0,
        "peak": int(np.abs(samples.astype(np.int64)).max()) if n else 0,
        "zero_cross_rate": zc,
    }


def _fake_samples(payload: bytes) -> tuple[np.ndarray, int]:
    """Deterministic stand-in for a real audio decode: seed a PRNG from
    the payload digest so 'samples' are stable across runs/partitions —
    the audio sibling of ``_fake_pixels``. Length derives from the
    payload size (bounded, so fake decode cost can't blow up on a long
    meta duration); rate is fixed."""
    d = hashlib.sha256(payload).digest()
    seed = int.from_bytes(d[:8], "big") % (2**32)
    n = 160 + len(payload) % 3841
    samples = np.random.RandomState(seed).randint(
        -32768, 32768, size=n, dtype=np.int32
    ).astype(np.int16)
    return samples, 16000


def decode_audio_features(media: DataFrame, use_codec: bool = False) -> DataFrame:
    """Per-clip stats via mapInPandas (Arrow-batched, zero shuffle) — the
    audio sibling of ``decode_image_features``.

    ``use_codec=True`` runs a REAL decode (pure-struct PCM16 mono WAV,
    ``functions/wavcodec.py``); rate/length then come from the RIFF
    chunks, not the metadata struct. Non-WAV payloads raise
    NotImplementedError — the honest boundary of an audio-library-free
    container."""

    def _decode(batches: Iterator[pd.DataFrame]) -> Iterator[pd.DataFrame]:
        from cql_xmlpipe_spark.functions.wavcodec import decode_wav

        for pdf in batches:
            rows = []
            for doc_id, payload in zip(pdf["doc_id"], pdf["payload"]):
                payload = bytes(payload)
                if use_codec:
                    if payload[:4] != b"RIFF":
                        from cql_xmlpipe_spark.functions.ffmpegcodec import (
                            decode_audio_ffmpeg,
                            ffmpeg_path,
                        )

                        if ffmpeg_path() is None:
                            raise NotImplementedError(
                                "only PCM16 mono WAV decodes in-container; "
                                "compressed audio (MP3/AAC/...) is env-gated "
                                "on an ffmpeg binary (SPARK_GRAFT_FFMPEG or PATH — "
                                "functions/ffmpegcodec.py)"
                            )
                        samples, rate = decode_audio_ffmpeg(payload)
                    else:
                        samples, rate = decode_wav(payload)
                else:
                    samples, rate = _fake_samples(payload)
                rows.append({"doc_id": doc_id, **audio_features_from_samples(samples, rate)})
            yield pd.DataFrame(rows, columns=[f.name for f in AUDIO_FEATURES_SCHEMA])

    clips = media.filter(F.col("meta.modality") == "audio")
    return clips.mapInPandas(_decode, AUDIO_FEATURES_SCHEMA)


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


RESAMPLE_SCHEMA = T.StructType(
    [
        T.StructField("doc_id", T.LongType()),
        T.StructField("payload", T.BinaryType()),
        T.StructField("sample_rate", T.IntegerType()),
        T.StructField("n_samples", T.LongType()),
    ]
)


def resample_audio(
    media: DataFrame, target_rate: int = 16000, use_codec: bool = False
) -> DataFrame:
    """Audio rate conversion — the audio sibling of :func:`resize_images`.
    ``use_codec=True``: decode PCM16 WAV → nearest-neighbor resample
    (pure-numpy index grid, the same duration-preserving grid rule as
    the image resize: output index i reads input sample
    ``(i * n_in) // n_out`` with ``n_out = round(n_in * target/source)``)
    → re-encode WAV, all inside the Arrow batch loop. Default:
    passthrough stub re-emitting payloads tagged with the target rate
    (plumbing shape without valid media)."""

    def _resample(batches: Iterator[pd.DataFrame]) -> Iterator[pd.DataFrame]:
        from cql_xmlpipe_spark.functions.wavcodec import decode_wav, encode_wav

        for pdf in batches:
            if use_codec:
                payloads, counts = [], []
                for payload in pdf["payload"]:
                    s, rate = decode_wav(bytes(payload))
                    n_out = max(1, int(round(len(s) * target_rate / rate)))
                    idx = (np.arange(n_out) * len(s)) // n_out
                    out = s[idx]
                    payloads.append(encode_wav(out, target_rate))
                    counts.append(len(out))
                yield pd.DataFrame(
                    {
                        "doc_id": pdf["doc_id"],
                        "payload": payloads,
                        "sample_rate": np.int32(target_rate),
                        "n_samples": np.array(counts, np.int64),
                    }
                )
                continue
            yield pd.DataFrame(
                {
                    "doc_id": pdf["doc_id"],
                    "payload": pdf["payload"],
                    "sample_rate": np.int32(target_rate),
                    "n_samples": np.int64(0),
                }
            )

    return media.filter(F.col("meta.modality") == "audio").mapInPandas(
        _resample, RESAMPLE_SCHEMA
    )


def synth_frames(text: str) -> tuple[list[np.ndarray], int]:
    """Deterministic (RGB frame list, fps) derived from document text:
    seed, dimensions, frame count and rate come from sha256(text),
    pixels from a seeded PRNG — the video sibling of ``synth_pixels`` /
    ``synth_samples``. This is the INPUT generator for the codec-true
    gate path (the system under test is encode_avi/decode_avi + the
    sampling rule, not this); the fixture script imports it so both
    sides agree on the input frames."""
    d = hashlib.sha256(text.encode("utf-8")).digest()
    seed = int.from_bytes(d[:8], "big") % (2**32)
    w, h = 4 + d[11] % 13, 4 + d[12] % 13
    n = 2 + d[13] % 7
    fps = (5, 10, 12, 25)[d[14] % 4]
    px = np.random.RandomState(seed).randint(0, 256, size=(n, h, w, 3), dtype=np.uint8)
    return [px[i] for i in range(n)], fps


def synthesize_avi_media(docs: DataFrame, id_col: str = "doc_id") -> DataFrame:
    """Media ingest simulator with REAL video payloads: derive
    deterministic RGB frames from each document's text and encode them
    as genuine uncompressed RGB24 AVI (``functions/avicodec.encode_avi``)
    — the video sibling of ``synthesize_bmp_media`` /
    ``synthesize_wav_media``. Every payload decodes; this feeds the
    codec-true ``use_codec=True`` frame-sampling path. Arrow-batched
    mapInPandas; payloads are born and stay executor-side."""

    def _synth(batches: Iterator[pd.DataFrame]) -> Iterator[pd.DataFrame]:
        from cql_xmlpipe_spark.functions.avicodec import encode_avi

        for pdf in batches:
            rows = []
            for doc_id, text in zip(pdf[id_col], pdf["text"]):
                frames, fps = synth_frames(text)
                payload = encode_avi(frames, fps)
                rows.append(
                    {
                        id_col: doc_id,
                        "payload": payload,
                        "meta": {
                            "modality": "video",
                            "mime": "video/x-msvideo",
                            "width": int(frames[0].shape[1]),
                            "height": int(frames[0].shape[0]),
                            "duration_ms": int(len(frames) * 1000 // fps),
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


VIDEO_FEATURES_SCHEMA = T.StructType(
    [
        T.StructField("doc_id", T.LongType()),
        T.StructField("n_frames", T.IntegerType()),
        T.StructField("fps", T.IntegerType()),
        T.StructField("duration_ms", T.IntegerType()),
        T.StructField("width", T.IntegerType()),
        T.StructField("height", T.IntegerType()),
        T.StructField("mean_luma", T.DoubleType()),
        T.StructField("motion", T.DoubleType()),
    ]
)


def video_features_from_frames(frames: list[np.ndarray], fps: int) -> dict:
    """Feature math shared by both video decode paths (and re-stated
    independently by the fixture script): mean_luma is the float64 mean
    over the full (n, h, w, 3) stack; motion is the mean absolute
    frame-to-frame difference (0.0 for single-frame clips) — the cheap
    static-vs-dynamic content signal a video curation pass filters on."""
    stack = np.stack(frames).astype(np.float64)
    n = len(frames)
    motion = float(np.abs(np.diff(stack, axis=0)).mean()) if n > 1 else 0.0
    return {
        "n_frames": n,
        "fps": int(fps),
        "duration_ms": int(n * 1000 // fps),
        "width": int(frames[0].shape[1]),
        "height": int(frames[0].shape[0]),
        "mean_luma": float(stack.mean()),
        "motion": motion,
    }


def _fake_frames(payload: bytes) -> tuple[list[np.ndarray], int]:
    """Deterministic stand-in for a real container decode: geometry,
    frame count, rate and pixels all derive from sha256(payload) — the
    video sibling of ``_fake_pixels`` / ``_fake_samples``."""
    d = hashlib.sha256(payload).digest()
    seed = int.from_bytes(d[:8], "big") % (2**32)
    w, h = 4 + d[11] % 13, 4 + d[12] % 13
    n = 2 + d[13] % 7
    fps = (5, 10, 12, 25)[d[14] % 4]
    px = np.random.RandomState(seed).randint(0, 256, size=(n, h, w, 3), dtype=np.uint8)
    return [px[i] for i in range(n)], fps


def decode_video_features(media: DataFrame, use_codec: bool = False) -> DataFrame:
    """Per-video stats via mapInPandas (Arrow-batched, zero shuffle) —
    the video sibling of ``decode_image_features`` /
    ``decode_audio_features``, giving the 'video' third of
    ``attach_media_columns`` a first-class feature consumer.

    ``use_codec=True`` runs a REAL decode (uncompressed RGB24 AVI,
    ``functions/avicodec.py``); frame count/rate/geometry then come
    from the RIFF chunks, not the metadata struct. Non-AVI payloads
    raise NotImplementedError — the honest boundary of a
    video-library-free container."""

    def _decode(batches: Iterator[pd.DataFrame]) -> Iterator[pd.DataFrame]:
        from cql_xmlpipe_spark.functions.avicodec import decode_avi

        for pdf in batches:
            rows = []
            for doc_id, payload in zip(pdf["doc_id"], pdf["payload"]):
                payload = bytes(payload)
                if use_codec:
                    if payload[:4] != b"RIFF":
                        from cql_xmlpipe_spark.functions.ffmpegcodec import (
                            decode_video_ffmpeg,
                            ffmpeg_path,
                            ffprobe_path,
                        )

                        if ffmpeg_path() is None or ffprobe_path() is None:
                            raise NotImplementedError(
                                "only uncompressed RGB24 AVI decodes "
                                "in-container; compressed video (MP4/H.264/"
                                "...) is env-gated on ffmpeg+ffprobe binaries "
                                "(SPARK_GRAFT_FFMPEG/SPARK_GRAFT_FFPROBE or PATH — "
                                "functions/ffmpegcodec.py)"
                            )
                        frames, fps = decode_video_ffmpeg(payload)
                    else:
                        frames, fps = decode_avi(payload)
                else:
                    frames, fps = _fake_frames(payload)
                rows.append({"doc_id": doc_id, **video_features_from_frames(frames, fps)})
            yield pd.DataFrame(rows, columns=[f.name for f in VIDEO_FEATURES_SCHEMA])

    vids = media.filter(F.col("meta.modality") == "video")
    return vids.mapInPandas(_decode, VIDEO_FEATURES_SCHEMA)


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

    ``use_codec=True`` is the REAL body for uncompressed RGB24 AVI
    payloads (``functions/avicodec``): decode the container, and for
    each grid timestamp emit the digest of the frame on screen at that
    instant (source frame = min(n-1, ts·fps // 1000) — seek-to-latest
    semantics). Containers that genuinely need external codecs
    (MP4/H.264) still raise inside decode_avi. The default (codec-free)
    path emits a digest-derived placeholder per timestamp so row
    counts, schemas and batch fan-out match the production shape.
    """

    def _sample(batches: Iterator[pd.DataFrame]) -> Iterator[pd.DataFrame]:
        from cql_xmlpipe_spark.functions.avicodec import decode_avi

        for pdf in batches:
            rows = []
            for doc_id, payload, meta in zip(pdf["doc_id"], pdf["payload"], pdf["meta"]):
                if use_codec:
                    frames, fps = decode_avi(bytes(payload))
                    dur = len(frames) * 1000 // fps
                    for i, ts in enumerate(range(0, max(dur, 1), every_ms)):
                        src = min(len(frames) - 1, ts * fps // 1000)
                        digest = hashlib.sha256(frames[src].tobytes()).digest()
                        rows.append(
                            {"doc_id": doc_id, "frame_idx": i, "ts_ms": ts, "frame": digest}
                        )
                    continue
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
