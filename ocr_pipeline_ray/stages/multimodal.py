"""Multimodal binary-column plumbing (image/audio/video payloads).

Real pure-stdlib decoders cover the header+raw formats the container
can handle without codec libraries: binary PNM images (PGM ``P5`` /
PPM ``P6``), PCM WAV audio (stdlib ``wave``), and raw YUV4MPEG2
(``.y4m``) video — header + uncompressed frame planes, so frame
count, dims, duration and luma statistics come from the actual
bytes. Compressed/codec video (mp4/webm/…) still raises the
documented no-codec error: that path needs external libraries this
container does not have.
The Ray-side plumbing is real and tested throughout: schema handling
of opaque ``binary`` payload columns with typed metadata, actor-pool
batch signature, small batch sizes for MB-scale rows, and the output
layout (feature columns appended, payload dropped unless asked to
keep it). The opaque-binary recognition input is the reference
analogue (`/root/reference/lib/ocr_step.py:188-194`).
"""

from __future__ import annotations

import hashlib
import io
import wave
from dataclasses import dataclass
from typing import Dict, Optional

import numpy as np
import pyarrow as pa

MEDIA_SCHEMA = pa.schema(
    [
        pa.field("media_id", pa.string()),
        pa.field("kind", pa.string()),        # image | audio | video
        pa.field("payload", pa.binary()),
        pa.field("mime", pa.string()),
        pa.field("width", pa.int32()),        # -1 when unknown
        pa.field("height", pa.int32()),
        pa.field("duration_ms", pa.int32()),
    ]
)


@dataclass(frozen=True)
class DecodeConfig:
    use_fake_decoder: bool = False  # real PNM/WAV decode by default
    feature_dim: int = 16


# --------------------------------------------------- stdlib decoders

def encode_pgm(width: int, height: int, pixels) -> bytes:
    """Binary PGM (``P5``, maxval 255). ``pixels``: scalar fill value
    or a (height, width) uint8 array."""
    header = f"P5\n{width} {height}\n255\n".encode("ascii")
    if np.isscalar(pixels):
        raster = bytes([int(pixels)]) * (width * height)
    else:
        raster = np.asarray(pixels, dtype=np.uint8).tobytes()
        if len(raster) != width * height:
            raise ValueError("pixel buffer does not match dims")
    return header + raster


def decode_pnm(payload: bytes) -> Dict:
    """Parse binary PNM (PGM ``P5`` grayscale / PPM ``P6`` RGB).

    Pure stdlib+numpy: whitespace/comment-tolerant header scan, then a
    zero-copy ``np.frombuffer`` view of the raster. Returns
    ``{width, height, channels, maxval, pixels}``; raises ValueError
    on anything malformed.
    """
    magic = payload[:2]
    if magic not in (b"P5", b"P6"):
        raise ValueError("not a binary PNM (P5/P6) payload")
    channels = 1 if magic == b"P5" else 3
    pos, fields = 2, []
    n = len(payload)
    while len(fields) < 3:
        while pos < n and payload[pos] in b" \t\r\n":
            pos += 1
        if pos < n and payload[pos] == ord("#"):  # comment to EOL
            while pos < n and payload[pos] not in b"\r\n":
                pos += 1
            continue
        start = pos
        while pos < n and payload[pos] not in b" \t\r\n":
            pos += 1
        if pos == start:
            raise ValueError("truncated PNM header")
        try:
            fields.append(int(payload[start:pos]))
        except ValueError:
            raise ValueError("non-numeric PNM header field") from None
    width, height, maxval = fields
    if width <= 0 or height <= 0 or not 0 < maxval < 65536:
        raise ValueError("invalid PNM dimensions/maxval")
    pos += 1  # exactly ONE whitespace byte separates header and raster
    dtype = np.dtype(np.uint8) if maxval < 256 else np.dtype(">u2")
    expected = width * height * channels * dtype.itemsize
    raster = payload[pos:pos + expected]
    if len(raster) != expected:
        raise ValueError("PNM raster shorter than header promises")
    pixels = np.frombuffer(raster, dtype=dtype).reshape(
        height, width, channels
    )
    return {
        "width": width,
        "height": height,
        "channels": channels,
        "maxval": maxval,
        "pixels": pixels,
    }


def encode_wav(samples, framerate: int = 8000) -> bytes:
    """Mono 16-bit PCM WAV from an int16 sample array (stdlib wave)."""
    arr = np.asarray(samples, dtype="<i2")
    buf = io.BytesIO()
    with wave.open(buf, "wb") as wf:
        wf.setnchannels(1)
        wf.setsampwidth(2)
        wf.setframerate(framerate)
        wf.writeframes(arr.tobytes())
    return buf.getvalue()


def decode_wav(payload: bytes) -> Dict:
    """Parse PCM WAV via the stdlib ``wave`` module.

    Returns ``{channels, sample_width, framerate, n_frames,
    duration_ms, samples}`` (samples: int16/uint8 numpy array, frames
    × channels); raises ValueError on malformed/compressed input.
    """
    try:
        with wave.open(io.BytesIO(payload), "rb") as wf:
            channels = wf.getnchannels()
            width = wf.getsampwidth()
            framerate = wf.getframerate()
            n_frames = wf.getnframes()
            raw = wf.readframes(n_frames)
    except (wave.Error, EOFError) as exc:
        raise ValueError(f"bad WAV payload: {exc}") from None
    if width == 2:
        samples = np.frombuffer(raw, dtype="<i2")
    elif width == 1:
        samples = np.frombuffer(raw, dtype=np.uint8)
    else:
        raise ValueError(f"unsupported WAV sample width {width}")
    samples = samples.reshape(-1, channels)
    return {
        "channels": channels,
        "sample_width": width,
        "framerate": framerate,
        "n_frames": n_frames,
        "duration_ms": n_frames * 1000 // framerate if framerate else 0,
        "samples": samples,
    }


# frame payload sizes per YUV4MPEG2 colorspace (in luma samples:
# frame_bytes = w*h * num / den). C420 subvariants (jpeg/paldv/
# mpeg2/plain) share a plane layout and are prefix-matched; every
# OTHER tag must match exactly — C444alpha etc. carry extra planes
# and must be rejected, not misparsed.
_Y4M_EXACT = {
    "C422": (2, 1),
    "C444": (3, 1),
    "Cmono": (1, 1),
}
_Y4M_420 = (3, 2)


def _y4m_subsampling(token: str):
    if token.startswith("C420"):
        return _Y4M_420
    sub = _Y4M_EXACT.get(token)
    if sub is None:
        raise ValueError(f"unsupported Y4M colorspace {token!r}")
    return sub


def encode_y4m(width: int, height: int, n_frames: int, y_fill: int,
               fps=(25, 1)) -> bytes:
    """Raw YUV4MPEG2 stream: constant-luma C420jpeg frames
    (chroma planes 128). Dims must be even (4:2:0 subsampling)."""
    if width % 2 or height % 2:
        raise ValueError("C420 dims must be even")
    num, den = fps
    header = (
        f"YUV4MPEG2 W{width} H{height} F{num}:{den} Ip A1:1 C420jpeg\n"
    ).encode("ascii")
    y = bytes([int(y_fill) & 0xFF]) * (width * height)
    uv = bytes([128]) * (width * height // 2)
    frame = b"FRAME\n" + y + uv
    return header + frame * n_frames


def decode_y4m(payload: bytes) -> Dict:
    """Parse an uncompressed YUV4MPEG2 stream (pure stdlib+numpy).

    Returns ``{width, height, fps_num, fps_den, n_frames,
    duration_ms, luma_mean}`` — luma statistics read from the actual
    Y planes. Raises ValueError for non-Y4M payloads (codec formats
    need external libraries) and for malformed/truncated streams.
    """
    if not payload.startswith(b"YUV4MPEG2"):
        raise ValueError(
            "not a YUV4MPEG2 stream (codec formats unsupported "
            "without external libs)"
        )
    nl = payload.find(b"\n")
    if nl < 0:
        raise ValueError("truncated Y4M header")
    width = height = 0
    fps_num, fps_den = 0, 1
    subsampling = _Y4M_420  # spec default is 4:2:0
    for token in payload[9:nl].decode("ascii", "replace").split():
        if token[0] == "C":
            # outside the numeric try: the unsupported-colorspace
            # diagnostic must not be re-wrapped as a bad-token error
            subsampling = _y4m_subsampling(token)
            continue
        try:
            if token[0] == "W":
                width = int(token[1:])
            elif token[0] == "H":
                height = int(token[1:])
            elif token[0] == "F":
                fps_num, fps_den = (int(x) for x in token[1:].split(":"))
        except ValueError:
            raise ValueError(f"bad Y4M header token {token!r}") from None
    if width <= 0 or height <= 0 or fps_num <= 0 or fps_den <= 0:
        raise ValueError("invalid Y4M dimensions/framerate")
    num, den = subsampling
    frame_bytes = width * height * num // den
    luma = width * height
    pos = nl + 1
    n = len(payload)
    n_frames = 0
    luma_sum = 0
    while pos < n:
        if not payload.startswith(b"FRAME", pos):
            raise ValueError("garbage between Y4M frames")
        fnl = payload.find(b"\n", pos)
        if fnl < 0 or fnl + 1 + frame_bytes > n:
            raise ValueError("truncated Y4M frame")
        y_plane = np.frombuffer(
            payload, dtype=np.uint8, count=luma, offset=fnl + 1
        )
        luma_sum += int(y_plane.sum(dtype=np.int64))
        n_frames += 1
        pos = fnl + 1 + frame_bytes
    return {
        "width": width,
        "height": height,
        "fps_num": fps_num,
        "fps_den": fps_den,
        "n_frames": n_frames,
        "duration_ms": n_frames * 1000 * fps_den // fps_num,
        "luma_mean": (luma_sum / (n_frames * luma)) if n_frames else 0.0,
    }


class MediaFeatureExtractor:
    """Actor-pool stage: payload binary → features + decoded metadata.

    ``__init__`` is where a codec/model loads (once per actor). The
    real mode (default) decodes PNM images, WAV audio and raw
    YUV4MPEG2 video with the pure-stdlib decoders above, emitting
    dimensions/duration/content statistics read from the actual
    bytes; codec-compressed video reports the documented
    ``decode_error``. ``use_fake_decoder`` skips decoding entirely
    (digest features only) for plumbing tests.
    """

    def __init__(self, config: Optional[DecodeConfig] = None):
        self.cfg = config or DecodeConfig()

    def _features(self, payload: bytes) -> list:
        # chained over hexdigest STRINGS (not raw digests) so the
        # DuckDB oracle can reproduce it: sha256(sha256(payload)) in
        # SQL hashes the hex string, exactly like this
        hexd = hashlib.sha256(payload).hexdigest()
        need = self.cfg.feature_dim
        vals = []
        while len(vals) < need:
            hexd = hashlib.sha256(hexd.encode("ascii")).hexdigest()
            vals.extend(b / 255.0 for b in bytes.fromhex(hexd))
        return vals[:need]

    def _decode(self, kind: str, raw: bytes):
        """(width, height, duration_ms, content_mean, error)."""
        if kind == "image":
            img = decode_pnm(raw)
            return (img["width"], img["height"], None,
                    float(img["pixels"].mean(dtype=np.float64)), None)
        if kind == "audio":
            wav = decode_wav(raw)
            mean_amp = (
                float(np.abs(wav["samples"].astype(np.int64)).mean())
                if wav["samples"].size else 0.0
            )
            return (None, None, wav["duration_ms"], mean_amp, None)
        if kind == "video":
            vid = decode_y4m(raw)
            return (vid["width"], vid["height"], vid["duration_ms"],
                    vid["luma_mean"], None)
        return (None, None, None, None, f"unknown media kind {kind!r}")

    def __call__(self, batch: pa.Table) -> pa.Table:
        payloads = batch.column("payload")
        kinds = batch.column("kind").to_pylist()
        feats, sizes, errors = [], [], []
        widths, heights, durations, means = [], [], [], []
        for i in range(len(payloads)):
            raw = payloads[i].as_py()
            width = height = duration = mean = None
            if not raw:
                feats.append(None)
                sizes.append(0)
                errors.append("empty payload")
            else:
                feats.append(self._features(raw))
                sizes.append(len(raw))
                if self.cfg.use_fake_decoder:
                    errors.append(None)
                else:
                    try:
                        width, height, duration, mean, err = self._decode(
                            kinds[i], raw
                        )
                    except ValueError as exc:
                        err = str(exc)
                    errors.append(err)
            widths.append(width)
            heights.append(height)
            durations.append(duration)
            means.append(mean)
        out = batch.drop_columns(["payload"])  # payload never travels on
        out = out.append_column(
            "features", pa.array(feats, pa.list_(pa.float64()))
        )
        out = out.append_column("payload_bytes", pa.array(sizes, pa.int64()))
        out = out.append_column("decode_error", pa.array(errors, pa.string()))
        out = out.append_column("decoded_width",
                                pa.array(widths, pa.int32()))
        out = out.append_column("decoded_height",
                                pa.array(heights, pa.int32()))
        out = out.append_column("decoded_duration_ms",
                                pa.array(durations, pa.int32()))
        out = out.append_column("content_mean",
                                pa.array(means, pa.float64()))
        return out


def media_feature_stage(ds, config: Optional[DecodeConfig] = None,
                        batch_size: int = 16, concurrency=(1, 8)):
    """Small batches: media rows are MB-scale; batch × pool must fit
    worker heaps (the object store spills the rest)."""
    return ds.map_batches(
        MediaFeatureExtractor,
        fn_constructor_kwargs={"config": config},
        batch_size=batch_size,
        batch_format="pyarrow",
        concurrency=concurrency,
        num_cpus=1,
    )


def resize_plan_fn(batch: pa.Table, max_side: int = 512) -> pa.Table:
    """Image resize planning: target dims preserving aspect ratio.

    The geometric math + schema plumbing are real; the pixel resample
    itself would live in the (stubbed) decoder. Unknown dims (-1)
    pass through unchanged.
    """
    widths = batch.column("width").to_pylist()
    heights = batch.column("height").to_pylist()
    tw, th = [], []
    for w, h in zip(widths, heights):
        if w is None or h is None or w <= 0 or h <= 0:
            tw.append(-1)
            th.append(-1)
            continue
        scale = min(1.0, max_side / max(w, h))
        tw.append(max(1, int(w * scale)))
        th.append(max(1, int(h * scale)))
    return (
        batch.append_column("target_width", pa.array(tw, pa.int32()))
        .append_column("target_height", pa.array(th, pa.int32()))
    )


def frame_sample_fn(batch: pa.Table, fps: float = 1.0,
                    max_frames: int = 32) -> pa.Table:
    """Video frame-sampling plan: deterministic timestamps (ms).

    ``fps`` sampling capped at ``max_frames``, evenly re-spaced when
    the cap binds. Non-video rows (duration -1) get an empty list.
    """
    kinds = batch.column("kind").to_pylist()
    durations = batch.column("duration_ms").to_pylist()
    plans = []
    for kind, dur in zip(kinds, durations):
        if kind != "video" or dur is None or dur <= 0:
            plans.append([])
            continue
        step_ms = 1000.0 / fps
        n = int(dur / step_ms) + 1
        if n > max_frames:
            step_ms = dur / max_frames
            n = max_frames
        plans.append([int(i * step_ms) for i in range(n)])
    return batch.append_column(
        "frame_times_ms", pa.array(plans, pa.list_(pa.int32()))
    )


def dhash64(pixels) -> int:
    """64-bit difference hash (dHash) of a grayscale image given as a
    (height, width) array with width = 9, height = 8 — the canonical
    perceptual-hash raster. Bit ``y*8 + x`` is set iff
    ``p[y, x+1] > p[y, x]``: brightness gradients survive re-encoding
    and mild noise, so equal hashes ≈ visually-identical images."""
    import numpy as np

    p = np.asarray(pixels)
    if p.shape != (8, 9):
        raise ValueError(f"dhash64 expects an 8x9 raster, got {p.shape}")
    bits = (p[:, 1:].astype(np.int16)
            > p[:, :-1].astype(np.int16)).flatten()
    weights = np.uint64(1) << np.arange(64, dtype=np.uint64)
    return int((bits.astype(np.uint64) * weights).sum(dtype=np.uint64))


class PerceptualHasher:
    """Actor-pool stage: decode each image payload (real
    :func:`decode_pnm`, pure stdlib) and emit its dHash — the
    image-near-dup signature. Grayscale rasters hash directly; RGB
    converts by integer-mean luma. Non-decodable rows carry the error
    string instead of failing the task (the reference's
    StepException skip-vs-fail split,
    /root/reference/ocr_pipeline.py:426-441)."""

    def __init__(self, resample_to=(9, 8)):
        self.w, self.h = resample_to

    def __call__(self, batch: pa.Table) -> pa.Table:
        import numpy as np

        ids = batch.column("media_id").to_pylist()
        payloads = batch.column("payload").to_pylist()
        hashes, errs = [], []
        for payload in payloads:
            try:
                d = decode_pnm(payload)
                px = d["pixels"]
                if d["channels"] == 3:
                    px = px.reshape(-1, 3).mean(axis=1,
                                                dtype=np.float64)
                px = np.asarray(px, dtype=np.uint8).reshape(
                    d["height"], d["width"])
                if (d["width"], d["height"]) != (self.w, self.h):
                    # integer box-resample would go here; the oracle
                    # corpus emits native 9x8 rasters
                    raise ValueError(
                        f"expected {self.w}x{self.h} raster, got "
                        f"{d['width']}x{d['height']}")
                hashes.append(f"{dhash64(px):016x}")
                errs.append(None)
            except (ValueError, IndexError) as exc:
                hashes.append(None)
                errs.append(str(exc))
        return pa.table({
            "media_id": pa.array(ids, pa.string()),
            "dhash": pa.array(hashes, pa.string()),
            "decode_error": pa.array(errs, pa.string()),
        })


def image_dhash_stage(ds, batch_size: int = 64, concurrency=(1, 8)):
    """Perceptual-hash actor pool over an image table
    ``(media_id, payload)`` → ``(media_id, dhash, decode_error)``."""
    return ds.map_batches(
        PerceptualHasher,
        batch_size=batch_size,
        batch_format="pyarrow",
        concurrency=concurrency,
        num_cpus=1,
    )


def encode_y4m_frames(width: int, height: int, y_fills) -> bytes:
    """Raw YUV4MPEG2 stream with a DIFFERENT constant luma per frame
    (chroma 128) — the varying-content companion of :func:`encode_y4m`
    for motion/scene tests. Dims must be even (C420)."""
    if width % 2 or height % 2:
        raise ValueError("C420 dims must be even")
    header = (
        f"YUV4MPEG2 W{width} H{height} F25:1 Ip A1:1 C420jpeg\n"
    ).encode("ascii")
    uv = bytes([128]) * (width * height // 2)
    frames = b"".join(
        b"FRAME\n" + bytes([int(f) & 0xFF]) * (width * height) + uv
        for f in y_fills
    )
    return header + frames


def y4m_frame_luma_sums(payload: bytes):
    """Per-frame integer luma-plane sums from a YUV4MPEG2 stream.

    Same wire parsing as :func:`decode_y4m` but keeps the PER-FRAME
    int64 Y-plane sums (decode_y4m folds them into one mean) — the
    primitive behind cut detection and motion scoring. Returns
    ``(width, height, [sum_0, sum_1, ...])``.
    """
    if not payload.startswith(b"YUV4MPEG2"):
        raise ValueError(
            "not a YUV4MPEG2 stream (codec formats unsupported "
            "without external libs)")
    nl = payload.find(b"\n")
    if nl < 0:
        raise ValueError("truncated Y4M header")
    width = height = 0
    subsampling = _Y4M_420
    for token in payload[9:nl].decode("ascii", "replace").split():
        if token[0] == "C":
            subsampling = _y4m_subsampling(token)
        elif token[0] == "W":
            width = int(token[1:])
        elif token[0] == "H":
            height = int(token[1:])
    if width <= 0 or height <= 0:
        raise ValueError("invalid Y4M dimensions")
    num, den = subsampling
    frame_bytes = width * height * num // den
    luma = width * height
    pos, n = nl + 1, len(payload)
    sums = []
    while pos < n:
        if not payload.startswith(b"FRAME", pos):
            raise ValueError("garbage between Y4M frames")
        fnl = payload.find(b"\n", pos)
        if fnl < 0 or fnl + 1 + frame_bytes > n:
            raise ValueError("truncated Y4M frame")
        y_plane = np.frombuffer(
            payload, dtype=np.uint8, count=luma, offset=fnl + 1)
        sums.append(int(y_plane.sum(dtype=np.int64)))
        pos = fnl + 1 + frame_bytes
    return width, height, sums


class SceneCutDetector:
    """Actor-pool scene-cut detection over REAL decoded Y4M planes:
    a cut is a frame whose mean-luma jump vs the previous frame
    exceeds ``threshold`` — evaluated in exact integers as
    ``|sum_f - sum_{f-1}| > threshold * width * height`` (no float
    division), so the result is SQL-twin-checkable.

    Stateful stage shape: construction cost in ``__init__`` once per
    actor, per-batch work is decode + a numpy diff. Payloads are
    DROPPED from the output (features only leave the stage —
    the multimodal golden rule for MB-sized rows).
    """

    def __init__(self, threshold: int = 6):
        self.threshold = int(threshold)

    def __call__(self, batch: pa.Table) -> pa.Table:
        ids = batch.column("doc_id").to_pylist()
        payloads = batch.column("payload").to_pylist()
        n_frames, n_cuts, first_cut, errors = [], [], [], []
        for payload in payloads:
            try:
                w, h, sums = y4m_frame_luma_sums(payload)
                s = np.asarray(sums, dtype=np.int64)
                jumps = np.abs(np.diff(s)) > self.threshold * w * h
                cuts = np.flatnonzero(jumps) + 1
                n_frames.append(len(s))
                n_cuts.append(int(jumps.sum()))
                first_cut.append(int(cuts[0]) if len(cuts) else -1)
                errors.append(None)
            except ValueError as exc:
                n_frames.append(0)
                n_cuts.append(0)
                first_cut.append(-1)
                errors.append(str(exc))
        return pa.table({
            "doc_id": pa.array(ids, pa.int64()),
            "n_frames": pa.array(n_frames, pa.int64()),
            "n_cuts": pa.array(n_cuts, pa.int64()),
            "first_cut": pa.array(first_cut, pa.int64()),
            "error": pa.array(errors, pa.string()),
        })


def scene_cut_stage(ds, threshold: int = 6, batch_size: int = 16,
                    concurrency=(1, 8)):
    """Scene-cut detection as an actor-pool stage (small batches —
    video rows are MB-scale)."""
    return ds.map_batches(
        SceneCutDetector,
        fn_constructor_kwargs={"threshold": threshold},
        batch_format="pyarrow",
        batch_size=batch_size,
        concurrency=concurrency,
        num_cpus=1,
    )


class SilenceDetector:
    """Actor-pool stage: voice-activity-style SILENCE segmentation
    over real PCM WAV payloads (:func:`decode_wav`, pure stdlib) —
    the audio-curation gate that drops dead-air recordings and
    budgets transcription by active speech, and the dataset-stats
    input for speech-corpus balancing. Per row: total FRAMES, active
    frames (any channel's |sample| >= threshold — multi-channel
    audio is per-frame, never interleaved-flattened), number of
    contiguous silence RUNS and the longest run in integer
    milliseconds at the decoded frame rate — all computed from the
    DECODED sample values (boundary-mask run extraction, no Python
    loop over samples), so a header-faking decoder cannot reproduce
    them. Non-decodable rows (including a zero frame rate in the
    header) carry the error string (skip-vs-fail split,
    /root/reference/ocr_pipeline.py:426-441)."""

    def __init__(self, threshold: int = 16):
        self.threshold = int(threshold)

    def __call__(self, batch: pa.Table) -> pa.Table:
        import numpy as np

        ids = batch.column("media_id").to_pylist()
        payloads = batch.column("payload").to_pylist()
        out = {k: [] for k in ("n_samples", "n_active",
                               "n_silence_runs", "longest_silence_ms")}
        errs = []
        for payload in payloads:
            try:
                d = decode_wav(payload)
                if not d["framerate"]:
                    raise ValueError("WAV header frame rate is 0")
                # samples decode as (n_frames, n_channels): a FRAME
                # is silent only when every channel is — never run
                # over the channel-interleaved stream (that splits
                # runs and inflates ms by the channel count)
                s = np.abs(d["samples"].astype(np.int64))
                s = s.max(axis=1) if s.ndim == 2 else s
                n = len(s)
                silent = s < self.threshold
                if n:
                    # run boundaries: starts where silent flips on
                    starts = np.flatnonzero(
                        silent & np.r_[True, ~silent[:-1]])
                    ends = np.flatnonzero(
                        silent & np.r_[~silent[1:], True])
                    runs = (ends - starts + 1) if len(starts) else \
                        np.array([], np.int64)
                    longest = int(runs.max()) if len(runs) else 0
                else:
                    starts, longest = np.array([]), 0
                out["n_samples"].append(n)
                out["n_active"].append(int((~silent).sum()))
                out["n_silence_runs"].append(len(starts))
                out["longest_silence_ms"].append(
                    longest * 1000 // d["framerate"])
                errs.append(None)
            except (ValueError, ZeroDivisionError) as exc:
                for k in out:
                    out[k].append(None)
                errs.append(str(exc))
        return pa.table({
            "media_id": pa.array(ids, pa.string()),
            "n_samples": pa.array(out["n_samples"], pa.int64()),
            "n_active": pa.array(out["n_active"], pa.int64()),
            "n_silence_runs": pa.array(out["n_silence_runs"],
                                       pa.int64()),
            "longest_silence_ms": pa.array(
                out["longest_silence_ms"], pa.int64()),
            "decode_error": pa.array(errs, pa.string()),
        })


def silence_stage(ds, threshold: int = 16, batch_size: int = 64,
                  concurrency=(1, 8)):
    """Silence-segmentation actor pool over an audio table
    ``(media_id, payload)`` — small batches for MB-scale binary
    rows, decoder state per actor, payload dropped after analysis."""
    return ds.map_batches(
        SilenceDetector,
        fn_constructor_kwargs={"threshold": threshold},
        batch_size=batch_size,
        batch_format="pyarrow",
        concurrency=concurrency,
        num_cpus=1,
    )


class ImageResizer:
    """Actor-pool stage: REAL nearest-neighbor downsample over real
    decoded pixels (:func:`decode_pnm`) — the thumbnail/preprocess
    step of a multimodal training pipeline, pure stdlib+numpy.

    All-integer geometry so the oracle can recompute every output
    pixel from the corpus generator's formula:

    * target dims: if ``max(w, h) <= max_side`` the image passes
      through; else ``tw = max(1, w*max_side // max(w,h))`` (same for
      ``th``) — trunc-div, no float scale factor.
    * sample map: output ``(x', y')`` reads source
      ``(x'*w // tw, y'*h // th)``.

    Emits the re-encoded PGM payload plus an order-sensitive integer
    checksum ``Σ p(x',y') · (1 + x' + 31·y')`` (plain sums couldn't
    tell a flipped raster apart). RGB converts to luma by exact
    trunc-div mean. Non-decodable rows carry ``decode_error`` (the
    skip-vs-fail split, /root/reference/ocr_pipeline.py:426-441).
    """

    def __init__(self, max_side: int = 10):
        self.max_side = max_side

    def __call__(self, batch: pa.Table) -> pa.Table:
        ids = batch.column("media_id").to_pylist()
        payloads = batch.column("payload").to_pylist()
        out = {"media_id": ids, "width": [], "height": [],
               "target_w": [], "target_h": [], "checksum": [],
               "resized": [], "decode_error": []}
        for payload in payloads:
            try:
                d = decode_pnm(payload)
                px = d["pixels"]
                if d["channels"] == 3:
                    px = (px.astype(np.int64).sum(axis=2) // 3)
                else:
                    px = px[:, :, 0].astype(np.int64)
                w, h = d["width"], d["height"]
                m = max(w, h)
                if m <= self.max_side:
                    tw, th = w, h
                else:
                    tw = max(1, w * self.max_side // m)
                    th = max(1, h * self.max_side // m)
                sx = np.arange(tw, dtype=np.int64) * w // tw
                sy = np.arange(th, dtype=np.int64) * h // th
                r = px[np.ix_(sy, sx)]
                xw = 1 + np.arange(tw, dtype=np.int64)
                yw = 31 * np.arange(th, dtype=np.int64)
                chk = int((r * (xw[None, :] + yw[:, None])).sum())
                out["width"].append(w)
                out["height"].append(h)
                out["target_w"].append(tw)
                out["target_h"].append(th)
                out["checksum"].append(chk)
                out["resized"].append(
                    encode_pgm(tw, th, r.astype(np.uint8)))
                out["decode_error"].append(None)
            except (ValueError, IndexError) as exc:
                for k in ("width", "height", "target_w", "target_h",
                          "checksum"):
                    out[k].append(-1)
                out["resized"].append(None)
                out["decode_error"].append(str(exc))
        return pa.table({
            "media_id": pa.array(out["media_id"], pa.string()),
            "width": pa.array(out["width"], pa.int64()),
            "height": pa.array(out["height"], pa.int64()),
            "target_w": pa.array(out["target_w"], pa.int64()),
            "target_h": pa.array(out["target_h"], pa.int64()),
            "checksum": pa.array(out["checksum"], pa.int64()),
            "resized": pa.array(out["resized"], pa.binary()),
            "decode_error": pa.array(out["decode_error"],
                                     pa.string()),
        })


def image_resize_stage(ds, max_side: int = 10, batch_size: int = 64,
                       concurrency=(1, 8)):
    """Nearest-neighbor resize actor pool over ``(media_id,
    payload)`` — small batches for binary rows, decode state per
    actor, payload-bearing output suitable for a downstream sink."""
    return ds.map_batches(
        ImageResizer,
        fn_constructor_kwargs={"max_side": max_side},
        batch_size=batch_size,
        batch_format="pyarrow",
        concurrency=concurrency,
        num_cpus=1,
    )
