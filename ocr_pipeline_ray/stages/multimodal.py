"""Multimodal binary-column plumbing (image/audio/video payloads).

The container has no image/audio codecs, so the DECODE step is stubbed
(deterministic fake or ``NotImplementedError``), but the Ray-side
plumbing is real and tested: schema handling of opaque ``binary``
payload columns with typed metadata, actor-pool batch signature, small
batch sizes for MB-scale rows, and the output layout (feature columns
appended, payload dropped unless asked to keep it).
"""

from __future__ import annotations

import hashlib
from dataclasses import dataclass
from typing import Optional

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
    use_fake_decoder: bool = True   # container has no codecs
    feature_dim: int = 16


class MediaFeatureExtractor:
    """Actor-pool stage: payload binary → fixed-dim feature vector.

    ``__init__`` is where a real codec/model would load (once per
    actor). With ``use_fake_decoder`` the features are a deterministic
    digest-derived vector, so the distributed plumbing (batching,
    schema, output layout) is fully exercised without codecs.
    """

    def __init__(self, config: Optional[DecodeConfig] = None):
        self.cfg = config or DecodeConfig()
        if not self.cfg.use_fake_decoder:
            raise NotImplementedError(
                "real media decoding requires image/audio codecs that are "
                "not available in this environment; use the fake decoder "
                "or plug a codec-backed subclass"
            )

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

    def __call__(self, batch: pa.Table) -> pa.Table:
        payloads = batch.column("payload")
        feats, sizes, errors = [], [], []
        for i in range(len(payloads)):
            raw = payloads[i].as_py()
            if not raw:
                feats.append(None)
                sizes.append(0)
                errors.append("empty payload")
                continue
            feats.append(self._features(raw))
            sizes.append(len(raw))
            errors.append(None)
        out = batch.drop_columns(["payload"])  # payload never travels on
        out = out.append_column(
            "features", pa.array(feats, pa.list_(pa.float64()))
        )
        out = out.append_column("payload_bytes", pa.array(sizes, pa.int64()))
        out = out.append_column("decode_error", pa.array(errors, pa.string()))
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
