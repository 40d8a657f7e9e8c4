"""Multimodal plumbing tests: schemas, batch shapes, determinism, and the
codec-stub contract (real decode raises NotImplementedError)."""

from __future__ import annotations

import pytest
from pyspark.sql import functions as F

from cql_xmlpipe_spark.operators.multimodal import (
    attach_media_columns,
    decode_image_features,
    resize_images,
    sample_video_frames,
)
from cql_xmlpipe_spark.sources.registry import load_table

SF = "/root/testdata/sf0.001"


@pytest.fixture(scope="module")
def media(spark):
    return attach_media_columns(load_table(spark, "documents", SF)).persist()


def test_media_schema_and_partition_of_modalities(media):
    assert [f.name for f in media.schema.fields] == ["doc_id", "payload", "meta"]
    counts = {r["modality"]: r["n"] for r in
              media.groupBy(F.col("meta.modality").alias("modality"))
                   .agg(F.count(F.lit(1)).alias("n")).collect()}
    assert set(counts) == {"image", "audio", "video"}
    assert sum(counts.values()) == media.count()


def test_image_features_deterministic(media):
    a = decode_image_features(media).orderBy("doc_id").limit(5).collect()
    b = decode_image_features(media).orderBy("doc_id").limit(5).collect()
    assert [tuple(r) for r in a] == [tuple(r) for r in b]
    for r in a:
        assert 0 <= r["mean_r"] <= 255 and r["width"] >= 1 and r["sharpness"] >= 0


def test_image_features_only_images(media):
    n_img = media.filter(F.col("meta.modality") == "image").count()
    assert decode_image_features(media).count() == n_img


def test_resize_passthrough_shape(media):
    out = resize_images(media, 64, 64)
    rows = out.limit(3).collect()
    assert all(r["width"] == 64 and r["height"] == 64 for r in rows)
    assert all(isinstance(r["payload"], (bytes, bytearray)) for r in rows)


def test_frame_sampling_fanout(media):
    frames = sample_video_frames(media, every_ms=5000)
    got = frames.groupBy("doc_id").agg(F.count(F.lit(1)).alias("n"))
    want = (
        media.filter(F.col("meta.modality") == "video")
        .select(
            "doc_id",
            (F.floor((F.greatest(F.col("meta.duration_ms"), F.lit(1)) - 1) / 5000) + 1)
            .cast("long").alias("n"),
        )
    )
    assert sorted(map(tuple, got.collect())) == sorted(map(tuple, want.collect()))


def test_codec_stub_raises(media):
    with pytest.raises(Exception) as ei:
        decode_image_features(media, use_codec=True).limit(1).collect()
    assert "NotImplementedError" in str(ei.value) or "codec" in str(ei.value)


def test_bmp_format_pin_bytelevel():
    """Decode a hand-constructed BMP (not produced by our encoder) so the
    decoder is pinned to the public layout: 54-byte header, BGR, bottom-up
    rows padded to 4 bytes. 2x2 image: top row red,green; bottom blue,white."""
    import struct

    import numpy as np

    from cql_xmlpipe_spark.functions.bmpcodec import decode_bmp

    w = h = 2
    stride = 8  # 2*3 = 6, padded to 8
    # bottom-up: file row 0 is the image's BOTTOM row
    bottom = bytes([255, 0, 0]) + bytes([255, 255, 255]) + b"\x00\x00"  # blue, white (BGR)
    top = bytes([0, 0, 255]) + bytes([0, 255, 0]) + b"\x00\x00"         # red, green (BGR)
    data = bottom + top
    hdr = struct.pack("<2sIHHI", b"BM", 54 + len(data), 0, 0, 54) + struct.pack(
        "<IiiHHIIiiII", 40, w, h, 1, 24, 0, len(data), 2835, 2835, 0, 0
    )
    px = decode_bmp(hdr + data)
    want = np.array(
        [[[255, 0, 0], [0, 255, 0]], [[0, 0, 255], [255, 255, 255]]], np.uint8
    )  # RGB, top row first
    assert (px == want).all()


def test_bmp_roundtrip_odd_width():
    """encode->decode identity including the 4-byte row-padding case."""
    import numpy as np

    from cql_xmlpipe_spark.functions.bmpcodec import decode_bmp, encode_bmp

    rng = np.random.RandomState(7)
    for w, h in [(1, 1), (3, 2), (5, 4), (64, 64)]:
        px = rng.randint(0, 256, size=(h, w, 3), dtype=np.uint8)
        assert (decode_bmp(encode_bmp(px)) == px).all()


def test_real_codec_decode_and_resize(spark):
    """use_codec=True end to end on REAL payloads: stats match a local
    numpy computation on the same pixels, and resize emits decodable BMPs
    with nearest-neighbor values."""
    import numpy as np

    from cql_xmlpipe_spark.functions.bmpcodec import decode_bmp, encode_bmp

    rng = np.random.RandomState(42)
    images = {i: rng.randint(0, 256, size=(6 + i, 9 + i, 3), dtype=np.uint8) for i in range(4)}
    rows = [
        (i, bytearray(encode_bmp(px)),
         ("image", "image/bmp", px.shape[1], px.shape[0], 0, len(encode_bmp(px))))
        for i, px in images.items()
    ]
    df = spark.createDataFrame(
        rows,
        "doc_id long, payload binary, "
        "meta struct<modality:string,mime:string,width:int,height:int,duration_ms:int,n_bytes:bigint>",
    )
    got = {r["doc_id"]: r for r in decode_image_features(df, use_codec=True).collect()}
    assert set(got) == set(images)
    for i, px in images.items():
        f = px.astype(np.float64)
        gray = f.mean(axis=2)
        assert got[i]["width"] == px.shape[1] and got[i]["height"] == px.shape[0]
        assert got[i]["mean_r"] == pytest.approx(f[:, :, 0].mean())
        assert got[i]["mean_b"] == pytest.approx(f[:, :, 2].mean())
        assert got[i]["sharpness"] == pytest.approx(float(np.abs(np.diff(gray, axis=1)).mean()))

    out = {r["doc_id"]: r for r in resize_images(df, 4, 5, use_codec=True).collect()}
    for i, px in images.items():
        small = decode_bmp(bytes(out[i]["payload"]))
        assert small.shape == (5, 4, 3)
        h, w = px.shape[:2]
        yi = (np.arange(5) * h) // 5
        xi = (np.arange(4) * w) // 4
        assert (small == px[yi][:, xi]).all()


# ---------------------------------------------------------------------------
# Audio (WAV codec) path — sibling of the BMP tests above
# ---------------------------------------------------------------------------


def test_wav_format_pin_bytelevel():
    """Decode a hand-constructed WAV (not produced by our encoder) so the
    decoder is pinned to the public layout — including an extra LIST
    chunk and an odd-sized chunk's pad byte, which the stdlib writer
    never emits."""
    import struct

    import numpy as np

    from cql_xmlpipe_spark.functions.wavcodec import decode_wav

    samples = np.array([0, 1000, -1000, 32767, -32768], np.int16)
    data = samples.astype("<i2").tobytes()
    fmt = struct.pack("<HHIIHH", 1, 1, 8000, 16000, 2, 16)
    junk = b"junkdata!"  # 9 bytes -> odd size, pad byte required
    body = (
        b"fmt " + struct.pack("<I", len(fmt)) + fmt
        + b"LIST" + struct.pack("<I", len(junk)) + junk + b"\x00"
        + b"data" + struct.pack("<I", len(data)) + data
    )
    payload = b"RIFF" + struct.pack("<I", 4 + len(body)) + b"WAVE" + body
    got, rate = decode_wav(payload)
    assert rate == 8000 and (got == samples).all()


def test_wav_roundtrip_and_stdlib_byte_identity():
    """encode->decode identity, and encode_wav's bytes are identical to
    the stdlib wave module's output (two independent implementations of
    the same canonical layout)."""
    import io
    import wave

    import numpy as np

    from cql_xmlpipe_spark.functions.wavcodec import decode_wav, encode_wav

    rng = np.random.RandomState(3)
    for n, rate in [(1, 8000), (7, 16000), (500, 22050), (4096, 44100)]:
        s = rng.randint(-32768, 32768, size=n).astype(np.int16)
        payload = encode_wav(s, rate)
        got, got_rate = decode_wav(payload)
        assert got_rate == rate and (got == s).all()
        buf = io.BytesIO()
        with wave.open(buf, "wb") as w:
            w.setnchannels(1)
            w.setsampwidth(2)
            w.setframerate(rate)
            w.writeframes(s.tobytes())
        assert payload == buf.getvalue()


def test_wav_decode_rejects_unsupported():
    import struct

    import numpy as np
    import pytest as _pytest

    from cql_xmlpipe_spark.functions.wavcodec import decode_wav, encode_wav

    s = np.zeros(4, np.int16)
    good = encode_wav(s, 8000)
    with _pytest.raises(ValueError, match="RIFF"):
        decode_wav(b"OggS" + good[4:])
    with _pytest.raises(ValueError, match="truncated"):
        decode_wav(good[:-2])
    # stereo: patch channels=2 in the fmt chunk (offset 12+8+2)
    stereo = bytearray(good)
    struct.pack_into("<H", stereo, 22, 2)
    with _pytest.raises(ValueError, match="PCM16 mono"):
        decode_wav(bytes(stereo))
    with _pytest.raises(ValueError, match="fmt or data"):
        decode_wav(good[:12])


def test_audio_features_fake_path(media):
    """Default decode: audio rows only, deterministic, sane ranges."""
    from cql_xmlpipe_spark.operators.multimodal import decode_audio_features

    n_audio = media.filter(F.col("meta.modality") == "audio").count()
    feats = decode_audio_features(media)
    a = feats.orderBy("doc_id").limit(5).collect()
    b = decode_audio_features(media).orderBy("doc_id").limit(5).collect()
    assert [tuple(r) for r in a] == [tuple(r) for r in b]
    assert feats.count() == n_audio
    for r in a:
        assert r["sample_rate"] == 16000 and 160 <= r["n_samples"] <= 4000
        assert 0 <= r["zero_cross_rate"] <= 1 and 0 <= r["peak"] <= 32768
        assert r["duration_ms"] == r["n_samples"] * 1000 // r["sample_rate"]


def test_audio_codec_stub_raises(media):
    """Non-WAV payloads on the codec-true path fail loudly."""
    from cql_xmlpipe_spark.operators.multimodal import decode_audio_features

    with pytest.raises(Exception) as ei:
        decode_audio_features(media, use_codec=True).limit(1).collect()
    # no ffmpeg: the NotImplementedError boundary; with a vendored ffmpeg
    # the garbage payload still fails loudly, inside the CLI bridge
    assert any(s in str(ei.value) for s in ("NotImplementedError", "WAV", "ffmpeg"))


def test_real_wav_codec_end_to_end(spark):
    """synthesize_wav_media -> decode_audio_features(use_codec=True)
    matches a local numpy computation on the same synthesized samples."""
    import numpy as np

    from cql_xmlpipe_spark.operators.multimodal import (
        decode_audio_features,
        synth_samples,
        synthesize_wav_media,
    )

    docs = spark.createDataFrame(
        [(i, f"audio end-to-end doc {i} " * (i + 1)) for i in range(6)],
        "doc_id long, text string",
    )
    media = synthesize_wav_media(docs)
    rows = {r["doc_id"]: r for r in media.collect()}
    assert all(bytes(r["payload"])[:4] == b"RIFF" for r in rows.values())
    assert all(r["meta"]["modality"] == "audio" for r in rows.values())
    got = {r["doc_id"]: r for r in
           decode_audio_features(media, use_codec=True).collect()}
    assert set(got) == set(range(6))
    for i in range(6):
        s, rate = synth_samples(f"audio end-to-end doc {i} " * (i + 1))
        f = s.astype(np.float64)
        assert got[i]["sample_rate"] == rate and got[i]["n_samples"] == len(s)
        assert got[i]["duration_ms"] == len(s) * 1000 // rate
        assert got[i]["rms"] == pytest.approx(float(np.sqrt((f * f).mean())))
        assert got[i]["peak"] == int(np.abs(s.astype(np.int64)).max())
        assert got[i]["zero_cross_rate"] == pytest.approx(
            float(((f[:-1] * f[1:]) < 0).mean())
        )


def test_resample_audio_codec_true(spark):
    """decode -> nearest-neighbor rate conversion -> re-encode: output
    decodes at the target rate with the duration-preserving grid values."""
    import numpy as np

    from cql_xmlpipe_spark.functions.wavcodec import decode_wav, encode_wav
    from cql_xmlpipe_spark.operators.multimodal import resample_audio

    rng = np.random.RandomState(11)
    clips = {i: (rng.randint(-32768, 32768, size=n).astype(np.int16), rate)
             for i, (n, rate) in enumerate([(800, 8000), (441, 44100), (1, 22050)])}
    rows = [
        (i, bytearray(encode_wav(s, r)),
         ("audio", "audio/wav", 0, 0, len(s) * 1000 // r, len(encode_wav(s, r))))
        for i, (s, r) in clips.items()
    ]
    df = spark.createDataFrame(
        rows,
        "doc_id long, payload binary, "
        "meta struct<modality:string,mime:string,width:int,height:int,duration_ms:int,n_bytes:bigint>",
    )
    out = {r["doc_id"]: r for r in resample_audio(df, 16000, use_codec=True).collect()}
    assert set(out) == set(clips)
    for i, (s, rate) in clips.items():
        got, got_rate = decode_wav(bytes(out[i]["payload"]))
        n_out = max(1, int(round(len(s) * 16000 / rate)))
        assert got_rate == 16000 and out[i]["sample_rate"] == 16000
        assert len(got) == n_out == out[i]["n_samples"]
        idx = (np.arange(n_out) * len(s)) // n_out
        assert (got == s[idx]).all()


def test_avi_format_pin_bytelevel():
    """Decode a hand-constructed AVI (not produced by our encoder) so the
    decoder is pinned to the public RIFF layout — including a JUNK chunk
    the encoder never emits and an odd-sized frame's pad byte."""
    import struct

    import numpy as np

    from cql_xmlpipe_spark.functions.avicodec import decode_avi

    # one 1x1 frame, red pixel: stride pads 3 -> 4 bytes (BGR + pad)
    w = h = 1
    frame = b"\x00\x00\xff\x00"  # BGR of red + stride pad
    avih = struct.pack("<IIIIIIIIII4I", 100000, 40, 0, 0, 1, 0, 1, 4, w, h, 0, 0, 0, 0)
    strh = struct.pack(
        "<4s4sIIIIIIIIII4h", b"vids", b"DIB ", 0, 0, 0, 1, 10, 0, 1, 4, 0, 0, 0, 0, w, h
    )
    strf = struct.pack("<IiiHHIIiiII", 40, w, h, 1, 24, 0, 4, 0, 0, 0, 0)
    strl = (
        b"LIST" + struct.pack("<I", 4 + 8 + len(strh) + 8 + len(strf)) + b"strl"
        + b"strh" + struct.pack("<I", len(strh)) + strh
        + b"strf" + struct.pack("<I", len(strf)) + strf
    )
    hdrl = (
        b"LIST" + struct.pack("<I", 4 + 8 + len(avih) + len(strl)) + b"hdrl"
        + b"avih" + struct.pack("<I", len(avih)) + avih + strl
    )
    junk = b"JUNK" + struct.pack("<I", 3) + b"pad" + b"\x00"  # odd size -> pad byte
    movi_body = b"movi" + b"00db" + struct.pack("<I", len(frame)) + frame
    movi = b"LIST" + struct.pack("<I", len(movi_body)) + movi_body
    body = b"AVI " + hdrl + junk + movi
    payload = b"RIFF" + struct.pack("<I", len(body)) + body
    frames, fps = decode_avi(payload)
    assert fps == 10 and len(frames) == 1
    assert (frames[0] == np.array([[[255, 0, 0]]], np.uint8)).all()


def test_avi_roundtrip_and_independent_byte_identity():
    """encode -> decode is bit-lossless (incl. odd-width stride padding)
    and the encoder's bytes match the fixture script's independent
    spec-assembled implementation."""
    import numpy as np

    from cql_xmlpipe_spark.functions.avicodec import decode_avi, encode_avi

    import os as _os
    import sys as _sys

    _sys.path.insert(0, _os.path.join(_os.path.dirname(_os.path.dirname(
        _os.path.abspath(__file__)))))
    from scripts.make_avi_frames_fixture import encode_avi_independent

    rng = np.random.RandomState(3)
    for h, w, n, fps in [(5, 7, 4, 25), (3, 3, 1, 5), (4, 6, 8, 12)]:
        frames = [rng.randint(0, 256, size=(h, w, 3), dtype=np.uint8) for _ in range(n)]
        payload = encode_avi(frames, fps)
        assert payload == encode_avi_independent(frames, fps)
        out, got_fps = decode_avi(payload)
        assert got_fps == fps and len(out) == n
        for a, b in zip(frames, out):
            assert (a == b).all()


def test_avi_decode_rejects_unsupported():
    import numpy as np
    import pytest as _pytest

    from cql_xmlpipe_spark.functions.avicodec import decode_avi, encode_avi

    with _pytest.raises(ValueError, match="RIFF"):
        decode_avi(b"nonsense")
    good = encode_avi([np.zeros((2, 2, 3), np.uint8)], 10)
    # flip the stream type to audio ('auds'): unsupported
    bad = good.replace(b"vids", b"auds")
    with _pytest.raises(ValueError, match="vids"):
        decode_avi(bad)
    # truncate mid-file: shorter than the RIFF header's claimed size
    with _pytest.raises(ValueError, match="truncated"):
        decode_avi(good[: len(good) // 2])


def test_codec_frame_sampling_seek_semantics(spark):
    """use_codec=True walks the real container: frame count, seek rule
    (latest frame at each grid instant) and digests all derive from the
    decoded frames."""
    import hashlib as _hl

    import numpy as np

    from cql_xmlpipe_spark.functions.avicodec import encode_avi
    from cql_xmlpipe_spark.operators.multimodal import sample_video_frames

    rng = np.random.RandomState(9)
    # 4 frames at 2 fps -> 2000 ms; sampling every 600 ms hits
    # ts 0/600/1200/1800 -> source frames 0/1/2/3
    frames = [rng.randint(0, 256, size=(4, 4, 3), dtype=np.uint8) for _ in range(4)]
    payload = encode_avi(frames, 2)
    df = spark.createDataFrame(
        [(7, bytearray(payload), ("video", "video/x-msvideo", 4, 4, 2000, len(payload)))],
        "doc_id long, payload binary, "
        "meta struct<modality:string,mime:string,width:int,height:int,duration_ms:int,n_bytes:bigint>",
    )
    got = sorted(
        (r["frame_idx"], r["ts_ms"], bytes(r["frame"]).hex())
        for r in sample_video_frames(df, every_ms=600, use_codec=True).collect()
    )
    want = [
        (i, ts, _hl.sha256(frames[min(3, ts * 2 // 1000)].tobytes()).hexdigest())
        for i, ts in enumerate([0, 600, 1200, 1800])
    ]
    assert got == want
    # sub-frame-interval sampling repeats the on-screen frame
    got2 = [
        bytes(r["frame"]).hex()
        for r in sample_video_frames(df, every_ms=400, use_codec=True)
        .orderBy("frame_idx").collect()
    ]
    # ts 0,400,800,1200,1600 -> src 0,0,1,2,3
    assert got2 == [
        _hl.sha256(frames[s].tobytes()).hexdigest() for s in (0, 0, 1, 2, 3)
    ]


def test_video_features_fake_and_codec_paths(spark, media):
    """Fake path: stats derive from the payload digest spec (stable
    across runs); codec path: stats come from the decoded container,
    single-frame clips pin motion to 0.0, non-AVI payloads raise."""
    import numpy as np

    from cql_xmlpipe_spark.functions.avicodec import encode_avi
    from cql_xmlpipe_spark.operators.multimodal import (
        _fake_frames,
        decode_video_features,
        video_features_from_frames,
    )

    a = {r["doc_id"]: r.asDict() for r in decode_video_features(media).collect()}
    b = {r["doc_id"]: r.asDict() for r in decode_video_features(media).collect()}
    assert a and a == b  # deterministic across runs
    # spot-check one row against the documented spec
    one = (
        media.filter(F.col("meta.modality") == "video")
        .select("doc_id", "payload").limit(1).collect()[0]
    )
    frames, fps = _fake_frames(bytes(one["payload"]))
    assert a[one["doc_id"]] == {"doc_id": one["doc_id"],
                                **video_features_from_frames(frames, fps)}

    rng = np.random.RandomState(5)
    still = [rng.randint(0, 256, size=(4, 5, 3), dtype=np.uint8)]
    moving = [rng.randint(0, 256, size=(4, 5, 3), dtype=np.uint8) for _ in range(3)]
    rows = [
        (1, bytearray(encode_avi(still, 10)), ("video", "video/x-msvideo", 5, 4, 100, 0)),
        (2, bytearray(encode_avi(moving, 10)), ("video", "video/x-msvideo", 5, 4, 300, 0)),
    ]
    df = spark.createDataFrame(
        rows,
        "doc_id long, payload binary, "
        "meta struct<modality:string,mime:string,width:int,height:int,duration_ms:int,n_bytes:bigint>",
    )
    got = {r["doc_id"]: r for r in decode_video_features(df, use_codec=True).collect()}
    assert got[1]["n_frames"] == 1 and got[1]["motion"] == 0.0
    assert got[2]["n_frames"] == 3 and got[2]["motion"] > 0.0
    assert got[2]["mean_luma"] == float(np.stack(moving).astype(np.float64).mean())

    bad = spark.createDataFrame(
        [(3, bytearray(b"not a container"), ("video", "video/mp4", 0, 0, 0, 15))],
        "doc_id long, payload binary, "
        "meta struct<modality:string,mime:string,width:int,height:int,duration_ms:int,n_bytes:bigint>",
    )
    with pytest.raises(Exception) as ei:
        decode_video_features(bad, use_codec=True).collect()
    assert any(s in str(ei.value) for s in ("NotImplementedError", "AVI", "ffmpeg", "ffprobe"))


# ---------------------------------------------------------------------------
# round 13: env-gated ffmpeg bridge for compressed media (MP3/MP4)
# ---------------------------------------------------------------------------

def _ffmpeg_missing() -> bool:
    from cql_xmlpipe_spark.functions.ffmpegcodec import ffmpeg_path, ffprobe_path

    return ffmpeg_path() is None or ffprobe_path() is None


def test_compressed_audio_roundtrip_ffmpeg(spark):
    """WHERE ffmpeg exists: WAV (pure codec ground truth) → MP3 via the
    CLI → decode_audio_features(use_codec=True) produces sane features
    whose duration/rate match the source within MP3 padding tolerance.
    Elsewhere: skip naming the env boundary (the honest-raise twin is
    test_audio_codec_stub_raises)."""
    if _ffmpeg_missing():
        pytest.skip(
            "ffmpeg/ffprobe not in this container (no media libs baked); "
            "compressed-audio decode is env-gated — functions/ffmpegcodec.py"
        )
    import subprocess

    import numpy as np

    from cql_xmlpipe_spark.functions.ffmpegcodec import ffmpeg_path
    from cql_xmlpipe_spark.functions.wavcodec import encode_wav
    from cql_xmlpipe_spark.operators.multimodal import decode_audio_features

    rate = 16000
    t = np.arange(rate) / rate
    s = (np.sin(2 * np.pi * 440 * t) * 12000).astype(np.int16)
    wav = encode_wav(s, rate)
    mp3 = subprocess.run(
        [ffmpeg_path(), "-v", "error", "-i", "pipe:0", "-f", "mp3", "pipe:1"],
        input=wav, stdout=subprocess.PIPE, check=True,
    ).stdout
    media = spark.createDataFrame(
        [(1, bytearray(mp3), ("audio", "audio/mpeg", 0, 0, 1000, len(mp3)))],
        "doc_id long, payload binary, "
        "meta struct<modality:string,mime:string,width:int,height:int,duration_ms:int,n_bytes:bigint>",
    )
    r = decode_audio_features(media, use_codec=True).collect()[0]
    assert r["sample_rate"] == 16000
    assert abs(r["duration_ms"] - 1000) <= 100  # codec delay/padding
    assert r["peak"] > 8000  # the sine survived the lossy round trip


def test_compressed_video_roundtrip_ffmpeg(spark):
    """WHERE ffmpeg exists: RGB24 AVI (pure codec ground truth) → MP4 →
    decode_video_features(use_codec=True) recovers frame count, fps and
    geometry. Elsewhere: skip naming the env boundary."""
    if _ffmpeg_missing():
        pytest.skip(
            "ffmpeg/ffprobe not in this container (no media libs baked); "
            "compressed-video decode is env-gated — functions/ffmpegcodec.py"
        )
    import subprocess

    import numpy as np

    from cql_xmlpipe_spark.functions.avicodec import encode_avi
    from cql_xmlpipe_spark.functions.ffmpegcodec import ffmpeg_path
    from cql_xmlpipe_spark.operators.multimodal import decode_video_features

    rng = np.random.RandomState(3)
    frames = [rng.randint(0, 256, size=(32, 48, 3), dtype=np.uint8) for _ in range(10)]
    avi = encode_avi(frames, 5)
    mp4 = subprocess.run(
        [ffmpeg_path(), "-v", "error", "-i", "pipe:0",
         "-movflags", "frag_keyframe+empty_moov", "-f", "mp4", "pipe:1"],
        input=avi, stdout=subprocess.PIPE, check=True,
    ).stdout
    media = spark.createDataFrame(
        [(1, bytearray(mp4), ("video", "video/mp4", 48, 32, 2000, len(mp4)))],
        "doc_id long, payload binary, "
        "meta struct<modality:string,mime:string,width:int,height:int,duration_ms:int,n_bytes:bigint>",
    )
    r = decode_video_features(media, use_codec=True).collect()[0]
    assert r["n_frames"] == 10 and abs(r["fps"] - 5.0) < 0.01
    assert r["width"] == 48 and r["height"] == 32


def test_ffmpeg_seekable_fallback_mechanics(tmp_path, monkeypatch):
    """_run_on_payload retries from a temp FILE when the pipe:0 attempt
    fails (standard MP4s carry a trailing moov atom that a non-seekable
    pipe can't reach — the r13 ADVICE boundary). Exercised with a fake
    ffmpeg so the mechanics are pinned even in containers without media
    binaries: the fake dies on pipe:0 and echoes the payload from a file
    path, so a successful round-trip proves the retry ran."""
    import numpy as np

    from cql_xmlpipe_spark.functions import ffmpegcodec as FC

    fake = tmp_path / "fake-ffmpeg"
    fake.write_text(
        "#!/bin/sh\n"
        'for a in "$@"; do\n'
        '  if [ "$a" = "pipe:0" ]; then\n'
        '    echo "pipe:0: moov atom not found" >&2; exit 1\n'
        "  fi\n"
        "done\n"
        "# last -i argument is the temp file; echo its bytes\n"
        "prev=; src=\n"
        'for a in "$@"; do\n'
        '  if [ "$prev" = "-i" ]; then src="$a"; fi\n'
        '  prev="$a"\n'
        "done\n"
        'cat "$src"\n'
    )
    fake.chmod(0o755)
    monkeypatch.setenv("SPARK_GRAFT_FFMPEG", str(fake))
    payload = np.arange(-4, 4, dtype="<i2").tobytes()
    samples, rate = FC.decode_audio_ffmpeg(payload, rate=8000)
    assert rate == 8000 and samples.tolist() == list(range(-4, 4))
    # and when BOTH attempts fail, both diagnostics surface
    dead = tmp_path / "dead-ffmpeg"
    dead.write_text('#!/bin/sh\necho "bad payload" >&2; exit 1\n')
    dead.chmod(0o755)
    monkeypatch.setenv("SPARK_GRAFT_FFMPEG", str(dead))
    with pytest.raises(ValueError, match="pipe:0 attempt"):
        FC.decode_audio_ffmpeg(payload, rate=8000)
