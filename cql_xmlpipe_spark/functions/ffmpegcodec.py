"""ffmpeg-CLI bridge for COMPRESSED media (MP3/AAC/MP4/H.264/...) —
env-gated.

The container bakes no media libraries, so the always-available decode
paths are the pure-python codecs (``bmpcodec``/``wavcodec``/
``avicodec``) and compressed formats raise ``NotImplementedError``.
When an ffmpeg binary IS present (a vendored static build, or a real
cluster image — set ``SPARK_GRAFT_FFMPEG``/``SPARK_GRAFT_FFPROBE`` or have them on
PATH), these helpers decode compressed payloads by piping bytes through
the CLI into the SAME contracts the pure codecs feed — audio as
(int16 mono samples, rate), video as (list of HxWx3 uint8 frames, fps)
— so every downstream feature consumer
(``audio_features_from_samples``, ``video_features_from_frames``) is
format-agnostic and the operators need no new math.

Execution shape: these run inside mapInPandas workers, one subprocess
per payload (stdin→stdout pipes, no shell). pipe:0 is non-seekable, and
standard MP4s put the moov atom at the END of the file (ffmpeg's
default mux layout) — probing/decoding those from a pipe fails, so
every call retries ONCE from a worker-local temp file before giving up
(the seekable-input fallback; fragmented/faststart files never pay it).
A process spawn per clip is noise next to an actual H.264 decode; for
tiny-clip corpora batch the payloads into fewer, longer media files
upstream.

Tests (tests/test_multimodal.py) are env-gated: where ffmpeg exists
they round-trip WAV→MP3→samples and AVI→MP4→frames against the pure
codecs' ground truth; elsewhere they skip naming this boundary.
"""

from __future__ import annotations

import os
import shutil
import subprocess

import numpy as np


def ffmpeg_path() -> str | None:
    """The ffmpeg binary to use, or None: ``SPARK_GRAFT_FFMPEG`` env override
    first (explicit vendoring), then PATH."""
    env = os.environ.get("SPARK_GRAFT_FFMPEG")
    if env:
        return env if os.path.exists(env) else None
    return shutil.which("ffmpeg")


def ffprobe_path() -> str | None:
    """The ffprobe binary (needed to size rawvideo output), or None."""
    env = os.environ.get("SPARK_GRAFT_FFPROBE")
    if env:
        return env if os.path.exists(env) else None
    return shutil.which("ffprobe")


def _run(cmd: list[str], payload: bytes) -> bytes:
    proc = subprocess.run(
        cmd, input=payload, stdout=subprocess.PIPE, stderr=subprocess.PIPE
    )
    if proc.returncode != 0:
        tail = proc.stderr.decode("utf-8", "replace").strip().splitlines()[-3:]
        raise ValueError(
            f"{os.path.basename(cmd[0])} failed (rc={proc.returncode}): "
            + " | ".join(tail)
        )
    return proc.stdout


def _run_on_payload(cmd_for, payload: bytes) -> bytes:
    """Run ``cmd_for(input_spec)`` against the payload: first streamed
    on stdin as ``pipe:0``, and — if that fails — retried once from a
    temp file. pipe:0 is non-seekable, so any container that needs a
    seek to find its index (a standard MP4 with the moov atom trailing
    the mdat, ffmpeg's default layout) dies on the pipe with a
    'moov atom not found'-class error; the file retry makes those
    decodable instead of limiting the bridge to fragmented/faststart
    files (the r13 ADVICE boundary)."""
    import tempfile

    try:
        return _run(cmd_for("pipe:0"), payload)
    except ValueError as pipe_exc:
        try:
            with tempfile.NamedTemporaryFile(suffix=".media") as f:
                f.write(payload)
                f.flush()
                return _run(cmd_for(f.name), b"")
        except ValueError as file_exc:
            # both input shapes failed: the payload itself is bad —
            # surface BOTH diagnostics (pipe error alone misleads:
            # 'moov atom not found' reads as the seek limitation)
            raise ValueError(
                f"{file_exc} (streamed pipe:0 attempt: {pipe_exc})"
            ) from file_exc


def decode_audio_ffmpeg(payload: bytes, rate: int = 16000) -> tuple[np.ndarray, int]:
    """Compressed audio → (int16 mono samples at ``rate``, rate) — the
    ``wavcodec.decode_wav`` contract for any format ffmpeg reads."""
    ff = ffmpeg_path()
    if ff is None:  # pragma: no cover - caller gates on availability
        raise NotImplementedError("ffmpeg binary not available")
    raw = _run_on_payload(
        lambda src: [ff, "-v", "error", "-i", src, "-f", "s16le",
                     "-acodec", "pcm_s16le", "-ac", "1", "-ar", str(rate),
                     "pipe:1"],
        payload,
    )
    return np.frombuffer(raw, dtype="<i2"), rate


def _probe_video(payload: bytes) -> tuple[int, int, float]:
    """(width, height, fps) of the first video stream via ffprobe."""
    fp = ffprobe_path()
    if fp is None:  # pragma: no cover - caller gates on availability
        raise NotImplementedError("ffprobe binary not available")
    out = _run_on_payload(
        lambda src: [fp, "-v", "error", "-select_streams", "v:0",
                     "-show_entries", "stream=width,height,avg_frame_rate",
                     "-of", "csv=p=0", src],
        payload,
    )
    w, h, rate = out.decode().strip().split(",")[:3]
    num, _, den = rate.partition("/")
    fps = float(num) / float(den or 1) if float(den or 1) else 0.0
    return int(w), int(h), fps


def decode_video_ffmpeg(payload: bytes) -> tuple[list[np.ndarray], float]:
    """Compressed video → (list of HxWx3 uint8 RGB frames, fps) — the
    ``avicodec.decode_avi`` contract for any container ffmpeg reads."""
    ff = ffmpeg_path()
    if ff is None:  # pragma: no cover - caller gates on availability
        raise NotImplementedError("ffmpeg binary not available")
    w, h, fps = _probe_video(payload)
    raw = _run_on_payload(
        lambda src: [ff, "-v", "error", "-i", src, "-f", "rawvideo",
                     "-pix_fmt", "rgb24", "pipe:1"],
        payload,
    )
    frame_bytes = w * h * 3
    if frame_bytes == 0 or len(raw) % frame_bytes:
        raise ValueError(
            f"rawvideo output ({len(raw)} B) is not a whole number of "
            f"{w}x{h} RGB24 frames"
        )
    arr = np.frombuffer(raw, dtype=np.uint8).reshape(-1, h, w, 3)
    return [arr[i] for i in range(arr.shape[0])], fps
