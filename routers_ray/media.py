"""Multimodal columns: opaque binary media with typed metadata, processed
by actor-pool ``map_batches`` stages.

The image/audio decode libraries are not in this container, so the decode
kernels are STUBS — a clearly-marked deterministic fake behind an
import-try (``_HAVE_PIL``). Everything Ray-side is real and tested: the
schema (binary payload + metadata struct), the actor-pool stage shape
(decoder state built once per actor in ``__init__``), batch sizing for
wide binary rows, and the output layout.
"""

from __future__ import annotations

import hashlib

import numpy as np
import pyarrow as pa

try:  # pragma: no cover — not installed in this container
    import PIL.Image  # noqa: F401

    _HAVE_PIL = True
except ImportError:
    _HAVE_PIL = False

MEDIA_SCHEMA = pa.schema(
    [
        ("media_ref", pa.string()),
        ("doc_id", pa.string()),
        ("kind", pa.string()),  # "image" | "audio" | "video"
        ("payload", pa.binary()),  # opaque encoded bytes
        ("width", pa.int32()),
        ("height", pa.int32()),
        ("duration_ms", pa.int32()),
    ]
)


def synth_media_rows(doc_ids: list[str], refs_per_doc: int = 2, payload_len: int = 256) -> pa.Table:
    """Deterministic fake media rows for plumbing tests: payload = repeated
    md5 stream of the ref; metadata derived from the ref hash."""
    refs, docs, kinds, payloads, ws, hs, ds_ = [], [], [], [], [], [], []
    for d in doc_ids:
        for k in range(refs_per_doc):
            ref = f"media://{d}/{k}"
            h = hashlib.md5(ref.encode()).digest()
            refs.append(ref)
            docs.append(d)
            kinds.append(["image", "audio", "video"][h[0] % 3])
            payloads.append((h * (payload_len // 16 + 1))[:payload_len])
            ws.append(64 + h[1] % 192)
            hs.append(64 + h[2] % 192)
            ds_.append(1000 + h[3] * 37)
    return pa.table(
        {
            "media_ref": pa.array(refs, pa.string()),
            "doc_id": pa.array(docs, pa.string()),
            "kind": pa.array(kinds, pa.string()),
            "payload": pa.array(payloads, pa.binary()),
            "width": pa.array(ws, pa.int32()),
            "height": pa.array(hs, pa.int32()),
            "duration_ms": pa.array(ds_, pa.int32()),
        },
        schema=MEDIA_SCHEMA,
    )


class MediaFeatureExtractor:
    """Actor-pool stage: decode + feature-extract media payloads.

    ``map_batches(MediaFeatureExtractor, concurrency=N, batch_size=small,
    num_cpus=1)`` — batch_size must stay small because rows are wide binary
    (payload bytes dominate block size; see DataContext.target_max_block_size).

    With a real decoder installed, ``__init__`` would load the model once
    per actor. Without one, the stub emits a deterministic digest-based
    feature vector and marks ``decoded=False``.
    """

    def __init__(self, feature_dim: int = 16, use_real_decoder: bool | None = None):
        self.feature_dim = feature_dim
        self.real = _HAVE_PIL if use_real_decoder is None else use_real_decoder
        if self.real:  # pragma: no cover
            raise NotImplementedError(
                "real decode path requires PIL/torchvision — not available in this container"
            )

    def __call__(self, batch: pa.Table) -> pa.Table:
        payloads = batch["payload"].to_pylist()
        feats = np.empty((len(payloads), self.feature_dim), dtype=np.float32)
        for i, p in enumerate(payloads):
            # STUB decode: digest bytes → unit-interval features (deterministic)
            h = hashlib.md5(p or b"").digest() * ((self.feature_dim * 4) // 16 + 1)
            feats[i] = (
                np.frombuffer(h[: self.feature_dim * 4], dtype=np.uint32).astype(np.float32)
                / np.float32(2**32)
            )
        flat = pa.array(feats.ravel(), pa.float32())
        offs = pa.array(np.arange(0, feats.size + 1, self.feature_dim, dtype=np.int32))
        out = batch.drop_columns(["payload"])  # features replace the heavy bytes
        out = out.append_column("features", pa.ListArray.from_arrays(offs, flat))
        out = out.append_column("decoded", pa.array([self.real] * len(payloads), pa.bool_()))
        out = out.append_column(
            "payload_bytes",
            pa.array([len(p or b"") for p in payloads], pa.int64()),
        )
        return out


def resize_plan_batch(batch: pa.Table, target: int = 224) -> pa.Table:
    """Resize planning (pure metadata math — real): target dims preserving
    aspect ratio, shorter side → ``target``. Half-up rounding
    (``floor(x+0.5)``) — exact and engine-portable, unlike banker's."""
    w = np.asarray(batch["width"], dtype=np.float64)
    h = np.asarray(batch["height"], dtype=np.float64)
    scale = target / np.minimum(w, h)
    return batch.append_column(
        "resize_w", pa.array(np.floor(w * scale + 0.5).astype(np.int32), pa.int32())
    ).append_column("resize_h", pa.array(np.floor(h * scale + 0.5).astype(np.int32), pa.int32()))


def frame_sample_plan_batch(batch: pa.Table, fps: float = 1.0) -> pa.Table:
    """Frame-sampling plan for video rows: frame timestamps at ``fps`` —
    list lengths derive from duration metadata (real math, stub decode)."""
    dur = np.asarray(batch["duration_ms"], dtype=np.int64)
    counts = np.maximum(1, (dur * fps / 1000.0).astype(np.int64))
    offsets = np.concatenate(([0], np.cumsum(counts))).astype(np.int32)
    ts = np.concatenate(
        [np.arange(c, dtype=np.int64) * int(1000 / fps) for c in counts]
    ) if counts.sum() else np.empty(0, np.int64)
    return batch.append_column(
        "frame_ts_ms", pa.ListArray.from_arrays(pa.array(offsets), pa.array(ts, pa.int64()))
    )
