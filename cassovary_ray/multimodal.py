"""Multimodal binary-column stages: decode / feature-extract over opaque
``binary`` payload columns with typed metadata.

The pages table already carries one binary modality (``html``, SURVEY §2.1
extractor row); this module adds the image/audio-shaped plumbing a
training-data pipeline needs: actor-pool ``map_batches`` stages with real
schemas, batch sizing and output layout. The actual codecs (PIL / soundfile)
are NOT in this container, so decoding is gated behind an import-try with a
clearly-marked deterministic fake for tests — the Ray-side plumbing is real
and tested, the pixel math is stubbed.
"""

from __future__ import annotations

import hashlib

import numpy as np
import pyarrow as pa

MEDIA_SCHEMA = pa.schema([
    ("media_id", pa.int64()),
    ("payload", pa.binary()),
    ("mime", pa.string()),
    ("width", pa.int32()),
    ("height", pa.int32()),
])


class ImageDecodeStage:
    """Actor-pool stage: binary payload → decoded feature row.

    With PIL present: decode, resize to ``target``, emit mean-channel
    features. Without (this container): ``fake="deterministic"`` derives a
    pseudo-feature vector from a hash of the payload bytes (stable across
    runs/parallelism) so downstream stages and tests exercise the real
    schema; ``fake=None`` raises NotImplementedError, marking the stub.
    """

    def __init__(self, target: tuple[int, int] = (32, 32),
                 fake: str | None = "deterministic", feat_dim: int = 8):
        self.target = target
        self.feat_dim = feat_dim
        try:
            from PIL import Image  # noqa: F401  (not in this container)

            self.pil = Image
        except ImportError:
            self.pil = None
        self.fake = fake

    def _features(self, payload: bytes) -> np.ndarray:
        if self.pil is not None:
            import io

            img = self.pil.open(io.BytesIO(payload)).convert("RGB").resize(self.target)
            arr = np.asarray(img, dtype=np.float32)
            pooled = arr.reshape(-1, 3).mean(axis=0)
            return np.resize(pooled / 255.0, self.feat_dim).astype(np.float32)
        if self.fake == "deterministic":
            # STUB: pseudo-features from a payload digest — NOT pixel data
            d = hashlib.blake2b(payload, digest_size=self.feat_dim * 4).digest()
            return (
                np.frombuffer(d, dtype=np.uint32).astype(np.float32) / np.float32(2**32)
            )
        raise NotImplementedError(
            "image decoding requires PIL, which is not available in this environment"
        )

    def __call__(self, batch: pa.Table) -> pa.Table:
        feats = [self._features(p) for p in batch["payload"].to_pylist()]
        return pa.table({
            "media_id": batch["media_id"],
            "features": pa.array([f.tolist() for f in feats], pa.list_(pa.float32())),
        })


def decode_images(media_ds, *, concurrency: int = 4, batch_size: int = 64,
                  fake: str | None = "deterministic"):
    """Decode/feature-extract stage over a MEDIA_SCHEMA dataset.

    Small ``batch_size`` on purpose: binary payloads are large, and
    batch × concurrency must fit worker heaps (SURVEY memory-aware rule).
    """
    return media_ds.map_batches(
        ImageDecodeStage,
        batch_format="pyarrow",
        batch_size=batch_size,
        concurrency=concurrency,
        fn_constructor_kwargs={"fake": fake},
    )


def frame_sample(media_ds, every_n: int = 10):
    """Video-shaped frame sampling stub: keeps every ``every_n``-th media row
    (stand-in for per-frame decode; keyed, order-independent)."""

    def kernel(batch: pa.Table) -> pa.Table:
        ids = batch["media_id"].to_numpy(zero_copy_only=False)
        return batch.filter(pa.array(ids % every_n == 0))

    return media_ds.map_batches(kernel, batch_format="pyarrow")


def synth_media_table(n: int, seed: int = 5) -> pa.Table:
    """Deterministic fake media table for tests (payload = seeded bytes)."""
    rows = {"media_id": [], "payload": [], "mime": [], "width": [], "height": []}
    for i in range(n):
        rows["media_id"].append(i)
        rows["payload"].append(hashlib.blake2b(f"{seed}:{i}".encode(), digest_size=64).digest())
        rows["mime"].append("image/fake")
        rows["width"].append(32)
        rows["height"].append(32)
    return pa.table(rows, schema=MEDIA_SCHEMA)
