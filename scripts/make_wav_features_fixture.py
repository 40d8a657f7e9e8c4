"""Generate the pinned audio-features fixtures for the multimodal audio
gates (multimodal_audio_features + multimodal_audio_features_codec) —
the audio sibling of make_fake_image_features_fixture.py +
make_bmp_features_fixture.py, written as one script because both
fixtures share the feature math.

Codec-true gate (wav_audio_features.parquet): the Spark path under test
is synth_samples(text) → encode_wav → decode_wav → feature math, all
executor-side. Ground truth here is recomputed WITHOUT the codec under
test:

- samples come from the shared input generator
  (operators/multimodal.synth_samples — the input data, not the system
  under test);
- features (duration/rms/peak/zero-crossing) are computed DIRECTLY from
  the sample array, never passing through encode_wav/decode_wav — a
  compensating encode/decode bug pair can only cancel out if it is
  sample-preserving, and
- payload_md5 comes from the INDEPENDENT stdlib ``wave`` encoder (a
  second implementation of the public RIFF/WAVE layout), so the gate
  byte-pins encode_wav's exact output too.

Fake-path gate (fake_audio_features.parquet): the default (codec-free)
decode derives samples from sha256(payload) via a documented spec
(operators/multimodal._fake_samples); this script recomputes that spec
out-of-band — straight from the text bytes, no Spark — so the gate pins
the mapInPandas plumbing (modality routing, Arrow batching, schema,
per-row math).

Keyed by md5(text) so one fixture serves every sf it was generated over
(sf0.001 + sf0.01 + sf0.1); the oracles carry a loud coverage guard
against testdata drift, same as the BMP fixtures.

Resample gate (wav_resample16k.parquet): the Spark path under test is
synth_samples → encode_wav → resample_audio(use_codec=True) (decode →
nearest-neighbor grid → re-encode). Ground truth restates the grid rule
here (n_out = max(1, round(n·16000/rate)), index i reads sample
(i·n)//n_out) straight on the synthesized samples — no engine
decode/encode — and payload_md5 again comes from the stdlib ``wave``
encoder, so the gate pins the whole decode→resample→re-encode chain.

Output: tests/fixtures/wav_audio_features.parquet
  (text_md5, payload_md5, sample_rate, n_samples, duration_ms, rms,
   peak, zero_cross_rate)
        tests/fixtures/fake_audio_features.parquet
  (text_md5, sample_rate, n_samples, duration_ms, rms, peak,
   zero_cross_rate)
        tests/fixtures/wav_resample16k.parquet
  (text_md5, payload_md5, n_samples)
"""

from __future__ import annotations

import hashlib
import io
import os
import sys
import wave

sys.path.insert(0, os.path.dirname(os.path.dirname(os.path.abspath(__file__))))

import numpy as np
import pyarrow as pa
import pyarrow.parquet as pq

from cql_xmlpipe_spark.operators.multimodal import synth_samples


def fake_samples_independent(payload: bytes) -> tuple[np.ndarray, int]:
    """The documented fake-decode spec (operators/multimodal._fake_samples
    docstring), restated here rather than imported so the fixture pins the
    engine's implementation against the spec: seed = first 8 bytes of
    sha256(payload) mod 2^32, n = 160 + len(payload) % 3841, int16 samples
    from RandomState.randint(-32768, 32768, dtype=int32) → int16, 16 kHz."""
    d = hashlib.sha256(payload).digest()
    seed = int.from_bytes(d[:8], "big") % (2**32)
    n = 160 + len(payload) % 3841
    samples = np.random.RandomState(seed).randint(
        -32768, 32768, size=n, dtype=np.int32
    ).astype(np.int16)
    return samples, 16000


def encode_wav_independent(samples: np.ndarray, rate: int) -> bytes:
    """PCM16 mono WAV via the stdlib ``wave`` module — a second,
    independent implementation of the public RIFF/WAVE layout. The point
    is to pin the engine encoder's bytes against it."""
    buf = io.BytesIO()
    with wave.open(buf, "wb") as w:
        w.setnchannels(1)
        w.setsampwidth(2)
        w.setframerate(rate)
        w.writeframes(samples.astype("<i2").tobytes())
    return buf.getvalue()


def features(samples: np.ndarray, rate: int) -> dict:
    """Exactly the feature math of operators/multimodal.
    audio_features_from_samples, applied straight to the sample array
    (no codec round-trip), restated here so a math bug can't self-pin."""
    s = samples.astype(np.float64)
    n = len(samples)
    return {
        "sample_rate": int(rate),
        "n_samples": n,
        "duration_ms": int(n * 1000 // rate),
        "rms": float(np.sqrt((s * s).mean())) if n else 0.0,
        "peak": int(np.abs(samples.astype(np.int64)).max()) if n else 0,
        "zero_cross_rate": float(((s[:-1] * s[1:]) < 0).mean()) if n > 1 else 0.0,
    }


_COLS = ["sample_rate", "n_samples", "duration_ms", "rms", "peak", "zero_cross_rate"]


def _write(rows: dict[str, dict], name: str, extra: list[str]) -> None:
    out = os.path.join(
        os.path.dirname(os.path.dirname(os.path.abspath(__file__))),
        "tests", "fixtures", name,
    )
    table = {"text_md5": pa.array(list(rows), pa.string())}
    for c in extra + _COLS:
        if c == "payload_md5":
            typ = pa.string()
        elif c in ("rms", "zero_cross_rate"):
            typ = pa.float64()
        elif c == "n_samples":
            typ = pa.int64()
        else:
            typ = pa.int32()
        table[c] = pa.array([rows[k][c] for k in rows], typ)
    pq.write_table(pa.table(table), out, compression="zstd")
    print(f"wrote {out}: {len(rows)} distinct texts")


def resample16k_independent(samples: np.ndarray, rate: int) -> np.ndarray:
    """The documented nearest-neighbor grid (operators/multimodal.
    resample_audio), restated: duration-preserving output length, output
    index i reads input sample (i * n_in) // n_out."""
    n_out = max(1, int(round(len(samples) * 16000 / rate)))
    return samples[(np.arange(n_out) * len(samples)) // n_out]


def main() -> None:
    import duckdb

    codec_rows: dict[str, dict] = {}
    fake_rows: dict[str, dict] = {}
    rs_rows: dict[str, dict] = {}
    for sf in ("sf0.001", "sf0.01", "sf0.1"):
        for (text,) in duckdb.sql(
            f"SELECT text FROM '/root/testdata/{sf}/documents.parquet'"
        ).fetchall():
            key = hashlib.md5(text.encode("utf-8")).hexdigest()
            if key in codec_rows:
                continue
            samples, rate = synth_samples(text)
            rec = features(samples, rate)
            rec["payload_md5"] = hashlib.md5(
                encode_wav_independent(samples, rate)
            ).hexdigest()
            codec_rows[key] = rec
            # fake path: payload is the raw text bytes (attach_media_columns)
            fake_rows[key] = features(*fake_samples_independent(text.encode("utf-8")))
            rs = resample16k_independent(samples, rate)
            rs_rows[key] = {
                "payload_md5": hashlib.md5(
                    encode_wav_independent(rs, 16000)
                ).hexdigest(),
                "n_samples": len(rs),
            }
    _write(codec_rows, "wav_audio_features.parquet", ["payload_md5"])
    _write(fake_rows, "fake_audio_features.parquet", [])
    out = os.path.join(
        os.path.dirname(os.path.dirname(os.path.abspath(__file__))),
        "tests", "fixtures", "wav_resample16k.parquet",
    )
    pq.write_table(
        pa.table(
            {
                "text_md5": pa.array(list(rs_rows), pa.string()),
                "payload_md5": pa.array(
                    [rs_rows[k]["payload_md5"] for k in rs_rows], pa.string()
                ),
                "n_samples": pa.array(
                    [rs_rows[k]["n_samples"] for k in rs_rows], pa.int64()
                ),
            }
        ),
        out,
        compression="zstd",
    )
    print(f"wrote {out}: {len(rs_rows)} distinct texts")


if __name__ == "__main__":
    main()
