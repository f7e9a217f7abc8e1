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
    real and testable.  `backend="pil"` does a REAL decode (normalized
    grayscale pixel histogram) when Pillow exists in the runtime and
    raises NotImplementedError at construction otherwise; `"ffmpeg"`
    raises until a video codec exists.
    """

    FEATURE_DIM = 32

    def __init__(self, backend: str = "stub"):
        if backend not in ("stub", "pil", "ffmpeg"):
            raise ValueError(f"unknown backend {backend!r}")
        self.backend = backend
        self._pil = None
        if backend == "pil":
            try:  # extras import: the sandbox container ships no codecs
                from PIL import Image  # type: ignore

                self._pil = Image
            except ImportError as exc:
                raise NotImplementedError(
                    "backend='pil' needs Pillow, which this container "
                    "does not ship; use backend='stub'") from exc

    def _decode_real(self, payload: bytes, kind: str):
        if self.backend == "pil" and kind == "image":
            import io

            img = self._pil.open(io.BytesIO(payload)).convert("L")
            px = np.asarray(img, dtype=np.uint8).ravel()
            hist = np.bincount(px >> 3, minlength=32).astype(np.float32)
            total = hist.sum()
            return hist / total if total else hist
        raise NotImplementedError(
            f"{self.backend} decode unavailable for kind={kind!r}; "
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
        num_cpus=0.25,  # stub decode is cheap; full-CPU actors can starve small sessions
    )


class MediaResize:
    """Actor-pool stage: image payload -> resized payload with updated
    (width, height) metadata; non-image rows (audio/video carry -1
    sentinel dims) pass through unchanged.

    `backend="stub"` performs a REAL deterministic byte-level
    downsample (stride sampling of the payload to the target pixel
    budget) so output sizes, schema, and determinism are testable
    without codecs; `backend="pil"` does a real decode -> thumbnail ->
    re-encode when Pillow exists in the runtime and raises
    NotImplementedError at construction otherwise.  Aspect ratio is
    preserved by the usual fit-in-box rule (identical rounding both
    metadata and stub payload)."""

    def __init__(self, max_side: int = 64, backend: str = "stub"):
        if backend not in ("stub", "pil"):
            raise ValueError(f"unknown backend {backend!r}")
        if max_side < 1:
            raise ValueError("max_side must be >= 1")
        self.max_side = max_side
        self.backend = backend
        self._pil = None
        if backend == "pil":
            try:  # extras import: the sandbox container ships no codecs
                from PIL import Image  # type: ignore

                self._pil = Image
            except ImportError as exc:
                raise NotImplementedError(
                    "backend='pil' needs Pillow, which this container "
                    "does not ship; use backend='stub'") from exc

    def _resize_pil(self, payload: bytes, fmt: str) -> tuple[bytes, int, int]:
        """Real decode -> fit-in-box thumbnail -> re-encode (same
        format).  Exercised only when Pillow exists in the runtime."""
        import io

        img = self._pil.open(io.BytesIO(payload))
        img.thumbnail((self.max_side, self.max_side))
        buf = io.BytesIO()
        img.save(buf, format=fmt.upper() if fmt != "jpg" else "JPEG")
        return buf.getvalue(), img.width, img.height

    def _resize_stub(self, payload: bytes, w: int, h: int,
                     new_w: int, new_h: int) -> bytes:
        if w <= 0 or h <= 0 or len(payload) == 0:
            return b""
        arr = np.frombuffer(payload, dtype=np.uint8)
        n_out = max(1, int(len(arr) * (new_w * new_h) / (w * h)))
        idx = (np.arange(n_out, dtype=np.int64) * len(arr)) // n_out
        return arr[idx].tobytes()

    def __call__(self, batch: pa.Table) -> pa.Table:
        import pyarrow.compute as pc

        # only images resize; audio/video rows (width == height == -1)
        # pass through untouched — clamping their sentinel dims would
        # silently "resize" them to 1x1 with an empty payload
        is_img = pc.equal(batch["kind"], "image").to_numpy(zero_copy_only=False)
        w = batch["width"].to_numpy().astype(np.int64)
        h = batch["height"].to_numpy().astype(np.int64)
        payloads = batch["payload"].to_pylist()
        if self.backend == "pil":
            fmts = batch["format"].to_pylist()
            out, new_w, new_h = [], w.copy(), h.copy()
            for i, (p, img) in enumerate(zip(payloads, is_img)):
                if img:
                    r, rw, rh = self._resize_pil(p, fmts[i])
                    out.append(r)
                    new_w[i], new_h[i] = rw, rh
                else:
                    out.append(p)
        else:
            side = np.maximum(np.maximum(w, h), 1)
            scale = np.minimum(1.0, self.max_side / side)
            new_w = np.where(is_img, np.maximum(1, (w * scale).astype(np.int64)), w)
            new_h = np.where(is_img, np.maximum(1, (h * scale).astype(np.int64)), h)
            out = [self._resize_stub(p, int(a), int(b), int(na), int(nb))
                   if img else p
                   for p, a, b, na, nb, img
                   in zip(payloads, w, h, new_w, new_h, is_img)]
        return pa.table(
            {
                "media_id": batch["media_id"],
                "kind": batch["kind"],
                "format": batch["format"],
                "width": pa.array(new_w.astype(np.int32), type=pa.int32()),
                "height": pa.array(new_h.astype(np.int32), type=pa.int32()),
                "duration_ms": batch["duration_ms"],
                "payload": pa.array(out, type=pa.binary()),
            }
        )


def resize_media(ds, max_side: int = 64, concurrency: int = 2,
                 batch_size: int = 128):
    """MEDIA_SCHEMA rows -> MEDIA_SCHEMA rows resized to fit
    `max_side` (actor pool, small batches — payload rows are wide)."""
    return ds.map_batches(
        MediaResize,
        fn_constructor_kwargs={"max_side": max_side},
        batch_format="pyarrow",
        batch_size=batch_size,
        concurrency=concurrency,
        num_cpus=0.25,  # stub decode is cheap; full-CPU actors can starve small sessions
    )


FRAME_SCHEMA = pa.schema(
    [
        ("media_id", pa.int64()),
        ("frame_no", pa.int32()),
        ("frame_ms", pa.int32()),
        ("payload", pa.binary()),
    ]
)


class FrameSample:
    """Actor-pool stage: video payload -> `n_frames` evenly spaced
    frame rows (the explode shape: one input row -> many output rows,
    still one vectorized map_batches pass — Ray Data needs no
    flat_map for Arrow output with more rows than input).

    `backend="stub"` slices the payload into n_frames equal spans
    (deterministic stand-ins for decoded frames); a real ffmpeg
    backend raises until the codec exists.  Non-video rows drop."""

    def __init__(self, n_frames: int = 4, backend: str = "stub"):
        if backend not in ("stub", "ffmpeg"):
            raise ValueError(f"unknown backend {backend!r}")
        if n_frames < 1:
            raise ValueError("n_frames must be >= 1")
        self.n_frames = n_frames
        self.backend = backend

    def __call__(self, batch: pa.Table) -> pa.Table:
        if self.backend != "stub":
            raise NotImplementedError(
                f"{self.backend} decode unavailable in this container; "
                "use backend='stub'")
        import pyarrow.compute as pc

        vids = batch.filter(pc.equal(batch["kind"], "video"))
        ids, frames, stamps, payloads = [], [], [], []
        n = self.n_frames
        for mid, dur, p in zip(vids["media_id"].to_pylist(),
                               vids["duration_ms"].to_pylist(),
                               vids["payload"].to_pylist()):
            span = max(1, len(p) // n)
            for f in range(n):
                ids.append(mid)
                frames.append(f)
                stamps.append(int(max(dur, 0) * f // n))
                payloads.append(p[f * span:(f + 1) * span])
        return pa.table(
            {
                "media_id": pa.array(ids, type=pa.int64()),
                "frame_no": pa.array(frames, type=pa.int32()),
                "frame_ms": pa.array(stamps, type=pa.int32()),
                "payload": pa.array(payloads, type=pa.binary()),
            }
        )


def sample_frames(ds, n_frames: int = 4, concurrency: int = 2,
                  batch_size: int = 64):
    """MEDIA_SCHEMA video rows -> FRAME_SCHEMA rows, n_frames per
    video (actor pool; the output has n x the rows of the input, so
    the batch size stays small to bound block growth)."""
    return ds.map_batches(
        FrameSample,
        fn_constructor_kwargs={"n_frames": n_frames},
        batch_format="pyarrow",
        batch_size=batch_size,
        concurrency=concurrency,
        num_cpus=0.25,  # stub decode is cheap; full-CPU actors can starve small sessions
    )
