"""Multimodal payload stages: image/audio/video as opaque binary columns.

The reference's payload side is image files + NumPy arrays moved through the
filesystem (SURVEY.md §1.1: `manga_ocr/ocr.py:102-110` PIL decode,
`run_generate.py:59-60` cv2 writes).  Here payloads stay COLUMNAR: a
``binary`` column plus a typed metadata struct, processed by actor-pool
``map_batches`` stages with small batch sizes (large rows → small batches,
per the memory-aware sizing rule).

Codec support is REAL for every format decodable without third-party libs
(functions/imagecodec.py: uncompressed BMP, netpbm P5/P6, RIFF PCM WAV —
public specs, numpy + stdlib only).  Compressed formats (PNG/JPEG/MP4)
raise NotImplementedError naming the missing lib; ``fake=True`` adds a
deterministic bytes→pixels fallback for *unknown* payloads so quarantine
paths stay testable.  Video frame sampling is REAL when an ffmpeg binary is
available (``sample_frames_ffmpeg``: subprocess → concatenated-PPM stdout →
stdlib split/decode) and falls back to the honest stub otherwise.
"""

from __future__ import annotations

import numpy as np
import pyarrow as pa

from ..functions.imagecodec import (
    audio_features,
    decode_bmp,
    decode_pnm,
    decode_wav,
    encode_bmp,
    encode_ppm,
    encode_wav,
    sniff_kind,
)

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


# Rec. 601 luma weights for RGB -> grayscale
_LUMA = np.array([0.299, 0.587, 0.114])


def _ffmpeg_path() -> str | None:
    """ffmpeg binary if one is usable — the same optional-gate pattern as
    the PIL image path (imagecodec.decode_pil).  ``GRAFT_FFMPEG`` overrides
    PATH lookup (tests inject a stand-in binary to exercise the real
    subprocess path in a container without ffmpeg)."""
    import os
    import shutil

    return os.environ.get("GRAFT_FFMPEG") or shutil.which("ffmpeg")


def sample_frames_ffmpeg(ffmpeg: str, payload: bytes,
                         every_ms: int) -> list[bytes]:
    """REAL frame sampling: payload → temp file (most containers need a
    seekable input) → ``ffmpeg -vf fps=1000/every_ms -f image2pipe -c:v ppm``
    → split the concatenated-PPM stdout into one binary P6 payload per frame
    (imagecodec.split_ppm_stream).  PPM keeps the downstream decode path the
    engine's own stdlib codec — no PIL needed for the frames themselves.
    Reference anchor: generic payload decode manga_ocr/ocr.py:102-110."""
    import os
    import subprocess
    import tempfile

    from ..functions.imagecodec import split_ppm_stream

    fps = 1000.0 / max(1, every_ms)
    with tempfile.NamedTemporaryFile(suffix=".bin", delete=False) as f:
        f.write(payload)
        src = f.name
    try:
        r = subprocess.run(
            [ffmpeg, "-v", "error", "-i", src, "-vf", f"fps={fps}",
             "-f", "image2pipe", "-c:v", "ppm", "-"],
            capture_output=True, timeout=300)
        if r.returncode != 0:
            raise ValueError(
                f"ffmpeg failed (rc={r.returncode}): "
                f"{r.stderr.decode(errors='replace')[:300]}")
        return split_ppm_stream(r.stdout)
    finally:
        os.unlink(src)


class Codec:
    """Format-sniffing decoder.  BMP / PPM / PGM / WAV decode for REAL
    (imagecodec.py); PNG/JPEG decode through PIL when it is importable
    (the reference's Image.open path, manga_ocr/ocr.py:102-110) and raise
    NotImplementedError naming the missing lib otherwise; ``fake=True``
    additionally decodes *unknown* payloads as deterministic pseudo-pixels
    so pipelines stay testable with arbitrary bytes."""

    def __init__(self, fake: bool = False):
        self.fake = fake

    def decode_image(self, payload: bytes, width: int, height: int) -> np.ndarray:
        kind = sniff_kind(payload)
        if kind == "bmp":
            return decode_bmp(payload) @ _LUMA
        if kind in ("ppm", "pgm"):
            return decode_pnm(payload) @ _LUMA
        if kind in ("png", "jpeg"):
            from ..functions.imagecodec import decode_pil

            return decode_pil(payload) @ _LUMA
        if not self.fake:
            raise ValueError(f"undecodable image payload (format: {kind})")
        n = max(1, width * height)
        raw = np.frombuffer(payload, dtype=np.uint8)
        reps = int(np.ceil(n / max(1, len(raw)))) if len(raw) else n
        px = np.tile(raw, reps)[:n] if len(raw) else np.zeros(n, np.uint8)
        return px.reshape(max(1, height), -1)

    def decode_audio(self, payload: bytes) -> tuple[np.ndarray, int]:
        kind = sniff_kind(payload)
        if kind == "wav":
            return decode_wav(payload)
        if not self.fake:
            raise ValueError(f"undecodable audio payload (format: {kind})")
        x = (np.frombuffer(payload, np.uint8).astype(np.float64) - 128.0) / 128.0
        return x, 8000

    def sample_frames(self, payload: bytes, duration_ms: int, every_ms: int) -> list[bytes]:
        # fake=True takes PRECEDENCE over an installed ffmpeg: fake mode
        # feeds arbitrary bytes (no real container), and piping those to
        # ffmpeg would make tests and the media_frames query fail on any
        # host that happens to have ffmpeg while passing in this container.
        if not self.fake:
            ff = _ffmpeg_path()
            if ff is not None:
                return sample_frames_ffmpeg(ff, payload, every_ms)
            raise NotImplementedError(
                "real frame sampling needs ffmpeg (none on PATH; "
                "set GRAFT_FFMPEG to the binary)")
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

    def _feat_one(self, kind: str, payload: bytes, w: int, h: int) -> list[float]:
        if kind == "audio":
            x, rate = self.codec.decode_audio(payload)
            desc = audio_features(x, rate)
            out = np.zeros(self.proj.shape[1])
            out[: min(len(desc), len(out))] = desc[: len(out)]
            return list(out)
        img = self.codec.decode_image(payload, w, h)
        small = self._resize(img).astype(np.float64).ravel()
        if small.size != self.proj.shape[0]:
            small = np.resize(small, self.proj.shape[0])
        return list((small / 255.0) @ self.proj)

    def __call__(self, batch: pa.Table) -> pa.Table:
        feats: list[list[float] | None] = []
        errors: list[str | None] = []
        widths = batch["width"].to_pylist()
        heights = batch["height"].to_pylist()
        # per-row loop is inherent here: each payload is one encoded object
        # (the vectorization unit is the pixel/sample array inside the codec)
        for kind, payload, w, h in zip(batch["kind"].to_pylist(),
                                       batch["payload"].to_pylist(),
                                       widths, heights):
            try:
                feats.append(self._feat_one(kind, payload or b"", w or 16, h or 16))
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


def make_real_media_table(n: int = 64, seed: int = 42) -> pa.Table:
    """Deterministic corpus of REALLY-ENCODED payloads — BMP and PPM images
    plus PCM WAV clips — so the decode path exercised is the production one,
    not the fake.  Round-robin over the three formats."""
    rng = np.random.Generator(np.random.Philox(key=[seed, 0x3EA1]))
    kinds, payloads, ws, hs, durs = [], [], [], [], []
    for i in range(n):
        fmt = ("bmp", "ppm", "wav")[i % 3]
        if fmt == "wav":
            rate = 8000
            t = np.arange(int(rng.integers(rate // 4, rate)), dtype=np.float64)
            freq = float(rng.uniform(100, 1200))
            x = (np.sin(2 * np.pi * freq * t / rate) * 12000).astype(np.int16)
            kinds.append("audio")
            payloads.append(encode_wav(x, rate))
            ws.append(0); hs.append(0)
            durs.append(int(1000 * len(x) / rate))
        else:
            h = int(rng.integers(8, 48)); w = int(rng.integers(8, 48))
            img = rng.integers(0, 256, (h, w, 3), dtype=np.uint8)
            kinds.append("image")
            payloads.append(encode_bmp(img) if fmt == "bmp" else encode_ppm(img))
            ws.append(w); hs.append(h)
            durs.append(0)
    return pa.table({
        "media_id": pa.array(np.arange(n)),
        "kind": pa.array(kinds),
        "payload": pa.array(payloads, pa.binary()),
        "width": pa.array(ws, pa.int32()),
        "height": pa.array(hs, pa.int32()),
        "duration_ms": pa.array(durs, pa.int32()),
    }, schema=MEDIA_SCHEMA)


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
