"""Multimodal payload stages: image/audio/video as opaque binary columns.

The reference's payload side is image files + NumPy arrays moved through the
filesystem (SURVEY.md §1.1: `manga_ocr/ocr.py:102-110` PIL decode,
`run_generate.py:59-60` cv2 writes).  Here payloads stay COLUMNAR: a
``binary`` column plus a typed metadata struct, processed by actor-pool
``map_batches`` stages with small batch sizes (large rows → small batches,
per the memory-aware sizing rule).

The actual codec calls (PIL/cv2/ffmpeg) are STUBBED — the container has no
image/audio libs — behind ``Codec`` classes that raise NotImplementedError
unless a deterministic fake is requested.  The Ray-side plumbing (schemas,
actor signature, batch sizing, output layout) is real and tested; swapping
in a real codec is a one-class change.
"""

from __future__ import annotations

import numpy as np
import pyarrow as pa

MEDIA_SCHEMA = pa.schema(
    [
        ("media_id", pa.int64()),
        ("kind", pa.string()),          # "image" | "audio" | "video"
        ("payload", pa.binary()),        # opaque encoded bytes
        ("width", pa.int32()),           # typed metadata (0 when unknown)
        ("height", pa.int32()),
        ("duration_ms", pa.int32()),
    ]
)

FEATURE_DIM = 32


class Codec:
    """Decode stub.  ``fake=True`` gives a deterministic decode (bytes →
    pseudo-pixels) so pipelines are testable end-to-end in this container."""

    def __init__(self, fake: bool = False):
        self.fake = fake

    def decode_image(self, payload: bytes, width: int, height: int) -> np.ndarray:
        if not self.fake:
            raise NotImplementedError(
                "real image decode needs PIL/cv2 (not in this container); "
                "construct Codec(fake=True) for the deterministic test codec"
            )
        n = max(1, width * height)
        raw = np.frombuffer(payload, dtype=np.uint8)
        reps = int(np.ceil(n / max(1, len(raw)))) if len(raw) else n
        px = np.tile(raw, reps)[:n] if len(raw) else np.zeros(n, np.uint8)
        return px.reshape(max(1, height), -1)

    def sample_frames(self, payload: bytes, duration_ms: int, every_ms: int) -> list[bytes]:
        if not self.fake:
            raise NotImplementedError("real frame sampling needs ffmpeg")
        n = max(1, duration_ms // max(1, every_ms))
        step = max(1, len(payload) // n)
        return [payload[i * step : (i + 1) * step] for i in range(n)]


class MediaFeatureActor:
    """Actor-pool stage: decode → resize → feature-extract, batched.

    ``__init__`` holds the codec + projection matrix (the "model", loaded
    once per actor); ``__call__`` emits a ``list<float>`` feature column and
    decode metadata.  Rows that fail to decode are quarantined via an
    ``error`` column instead of dropped silently (mirrors the reference's
    skip-and-log, run.py:210-212, hardened)."""

    def __init__(self, fake_codec: bool = True, feature_dim: int = FEATURE_DIM,
                 target: tuple[int, int] = (16, 16), seed: int = 42):
        self.codec = Codec(fake=fake_codec)
        self.target = target
        rng = np.random.Generator(np.random.Philox(key=[seed, 0xFEA7]))
        self.proj = rng.standard_normal((target[0] * target[1], feature_dim))

    def _resize(self, img: np.ndarray) -> np.ndarray:
        th, tw = self.target
        h, w = img.shape[:2]
        ridx = (np.arange(th) * h // th).clip(0, h - 1)
        cidx = (np.arange(tw) * w // tw).clip(0, w - 1)
        return img[ridx][:, cidx]

    def __call__(self, batch: pa.Table) -> pa.Table:
        feats: list[list[float] | None] = []
        errors: list[str | None] = []
        widths = batch["width"].to_pylist()
        heights = batch["height"].to_pylist()
        for payload, w, h in zip(batch["payload"].to_pylist(), widths, heights):
            try:
                img = self.codec.decode_image(payload or b"", w or 16, h or 16)
                small = self._resize(img).astype(np.float64).ravel()
                if small.size != self.proj.shape[0]:
                    small = np.resize(small, self.proj.shape[0])
                feats.append(list((small / 255.0) @ self.proj))
                errors.append(None)
            except Exception as exc:  # noqa: BLE001 — quarantine, don't drop
                feats.append(None)
                errors.append(f"{type(exc).__name__}: {exc}")
        out = batch.select(["media_id", "kind", "width", "height"])
        out = out.append_column("features", pa.array(feats, pa.list_(pa.float64())))
        out = out.append_column("decode_error", pa.array(errors, pa.string()))
        return out


def media_feature_pipeline(ds, *, concurrency: int | tuple[int, int] = 2,
                           batch_size: int = 64, fake_codec: bool = True):
    """Large binary rows → SMALL batch_size so batch×concurrency fits the
    worker heap; Ray block splitting handles the rest."""
    return ds.map_batches(
        MediaFeatureActor,
        fn_constructor_kwargs=dict(fake_codec=fake_codec),
        batch_format="pyarrow",
        batch_size=batch_size,
        concurrency=concurrency,
        num_cpus=1,
    )


def make_fake_media_table(n: int = 64, seed: int = 42) -> pa.Table:
    rng = np.random.Generator(np.random.Philox(key=[seed, 0x3D1A]))
    rows = {
        "media_id": pa.array(np.arange(n)),
        "kind": pa.array(["image"] * n),
        "payload": pa.array([rng.integers(0, 256, size=int(rng.integers(64, 2048)),
                                          dtype=np.uint8).tobytes() for _ in range(n)],
                            pa.binary()),
        "width": pa.array(rng.integers(8, 64, n, dtype=np.int32), pa.int32()),
        "height": pa.array(rng.integers(8, 64, n, dtype=np.int32), pa.int32()),
        "duration_ms": pa.array(np.zeros(n, dtype=np.int32), pa.int32()),
    }
    return pa.table(rows, schema=MEDIA_SCHEMA)


class FrameSampleActor:
    """Actor-pool stage: video payload → one row per sampled frame (a
    flat_map over batches; the per-record fan-out of the reference's page →
    crops explosion, process_manga109s.py:163-180, on binary payloads)."""

    def __init__(self, fake_codec: bool = True, every_ms: int = 1000):
        self.codec = Codec(fake=fake_codec)
        self.every_ms = every_ms

    def __call__(self, batch: pa.Table) -> pa.Table:
        ids: list[int] = []
        idxs: list[int] = []
        frames: list[bytes] = []
        errors: list[str | None] = []
        for mid, payload, dur in zip(batch["media_id"].to_pylist(),
                                     batch["payload"].to_pylist(),
                                     batch["duration_ms"].to_pylist()):
            try:
                fs = self.codec.sample_frames(payload or b"", dur or 0, self.every_ms)
                for i, f in enumerate(fs):
                    ids.append(mid); idxs.append(i); frames.append(f); errors.append(None)
            except Exception as exc:  # noqa: BLE001 — quarantine, don't drop
                ids.append(mid); idxs.append(-1); frames.append(b"")
                errors.append(f"{type(exc).__name__}: {exc}")
        return pa.table({
            "media_id": pa.array(ids, pa.int64()),
            "frame_idx": pa.array(idxs, pa.int32()),
            "frame": pa.array(frames, pa.binary()),
            "decode_error": pa.array(errors, pa.string()),
        })


def frame_sample_pipeline(ds, *, every_ms: int = 1000,
                          concurrency: int | tuple[int, int] = (1, 2),
                          batch_size: int = 32, fake_codec: bool = True):
    return ds.map_batches(
        FrameSampleActor,
        fn_constructor_kwargs=dict(fake_codec=fake_codec, every_ms=every_ms),
        batch_format="pyarrow",
        batch_size=batch_size,
        concurrency=concurrency,
        num_cpus=1,
    )
