"""Multimodal columns: opaque binary payloads + typed metadata.

The container ships no image/audio codecs, so the DECODE step is
stubbed (deterministic fake features or NotImplementedError), but the
Ray-side plumbing is real and tested: Arrow `binary` payload columns
with struct-like metadata, actor-pool map_batches with small batch
sizes (large rows!), and a stable output layout.

Scale notes: binary payloads dominate block size — callers should set
`batch_size` low (64-256) and rely on `DataContext.target_max_block_size`
so a batch x concurrency fits worker heaps; payloads stay in the
object store between stages (zero-copy Arrow buffers).
"""

from __future__ import annotations

import hashlib

import numpy as np
import pyarrow as pa

MEDIA_SCHEMA = pa.schema(
    [
        ("media_id", pa.int64()),
        ("kind", pa.string()),  # image | audio | video
        ("format", pa.string()),  # png | wav | mp4 | ...
        ("width", pa.int32()),  # images/video; -1 when n/a
        ("height", pa.int32()),
        ("duration_ms", pa.int32()),  # audio/video; -1 when n/a
        ("payload", pa.binary()),
    ]
)


def synthesize_media_table(n: int, kind: str = "image", seed: int = 42,
                           payload_bytes: int = 4096) -> pa.Table:
    """Deterministic fake media rows for tests/benchmarks."""
    import zlib

    # stable kind hash: python's hash() is PYTHONHASHSEED-randomized
    # per process, which would break the "deterministic" promise
    rng = np.random.default_rng((seed, zlib.crc32(kind.encode())))
    # printable-ASCII alphabet: the payload column stays opaque binary
    # (real media would be raw bytes), but keeping the FAKE payloads
    # UTF-8-valid lets the driver's DuckDB oracle hash them byte-
    # faithfully via sha256(decode(payload)) — an exact-checked row
    payloads = [rng.integers(32, 127, size=payload_bytes, dtype=np.uint8).tobytes() for _ in range(n)]
    return pa.table(
        {
            "media_id": pa.array(range(n), type=pa.int64()),
            "kind": pa.array([kind] * n),
            "format": pa.array(["png" if kind == "image" else "wav"] * n),
            "width": pa.array([64 if kind == "image" else -1] * n, type=pa.int32()),
            "height": pa.array([64 if kind == "image" else -1] * n, type=pa.int32()),
            "duration_ms": pa.array([-1 if kind == "image" else 1000] * n, type=pa.int32()),
            "payload": pa.array(payloads, type=pa.binary()),
        },
        schema=MEDIA_SCHEMA,
    )


class MediaFeatureExtract:
    """Actor-pool stage: payload -> fixed-size feature vector.

    `backend="stub"` (default in this container) computes deterministic
    fake features (normalized byte histogram + length stats) so the
    pipeline shape — batch size, actor signature, output layout — is
    real and testable.  `backend="pil"`/`"ffmpeg"` raise
    NotImplementedError until the codec libs exist in the runtime.
    """

    FEATURE_DIM = 32

    def __init__(self, backend: str = "stub"):
        if backend not in ("stub", "pil", "ffmpeg"):
            raise ValueError(f"unknown backend {backend!r}")
        self.backend = backend

    def _decode_real(self, payload: bytes, kind: str):
        raise NotImplementedError(
            f"{self.backend} decode unavailable in this container; "
            "use backend='stub' (deterministic fake features)"
        )

    def _features_stub(self, payloads: list[bytes]) -> np.ndarray:
        out = np.empty((len(payloads), self.FEATURE_DIM), dtype=np.float32)
        for i, p in enumerate(payloads):
            arr = np.frombuffer(p, dtype=np.uint8)
            hist = np.bincount(arr >> 3, minlength=32).astype(np.float32)
            total = hist.sum()
            out[i] = hist / total if total else hist
        return out

    def __call__(self, batch: pa.Table) -> pa.Table:
        payloads = batch["payload"].to_pylist()
        if self.backend == "stub":
            feats = self._features_stub(payloads)
        else:
            feats = np.stack(
                [self._decode_real(p, k) for p, k in zip(payloads, batch["kind"].to_pylist())]
            )
        sha = [hashlib.sha256(p).hexdigest() for p in payloads]
        return pa.table(
            {
                "media_id": batch["media_id"],
                "kind": batch["kind"],
                "payload_sha": pa.array(sha, type=pa.string()),
                "payload_bytes": pa.array(
                    [len(p) for p in payloads], type=pa.int64()
                ),
                "features": pa.array(feats.tolist(), type=pa.list_(pa.float32())),
            }
        )


def extract_media_features(ds, backend: str = "stub", concurrency: int = 2,
                           batch_size: int = 128):
    """Dataset of MEDIA_SCHEMA rows -> feature rows via an actor pool
    (small batches: payload rows are wide)."""
    return ds.map_batches(
        MediaFeatureExtract,
        fn_constructor_kwargs={"backend": backend},
        batch_format="pyarrow",
        batch_size=batch_size,
        concurrency=concurrency,
    )
