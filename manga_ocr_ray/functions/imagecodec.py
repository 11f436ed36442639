"""Real payload codecs with zero third-party deps (M22/A2 — the reference
decodes real image files, manga_ocr/ocr.py:102-110; this container has no
PIL/cv2/ffmpeg, so the formats supported are the ones decodable from their
PUBLIC specs with numpy + the stdlib alone):

- BMP  (Windows BITMAPINFOHEADER, uncompressed 8/24/32-bit) — numpy decode.
- PPM/PGM (netpbm P5/P6 binary) — numpy decode.
- WAV  (RIFF PCM) — stdlib ``wave`` + numpy.

Encoders for the same formats exist so test corpora carry REAL encoded
payloads (round-trip property: decode(encode(img)) == img).  Compressed
formats (PNG/JPEG) decode through :func:`decode_pil` when PIL is importable
(the reference's exact path — ``Image.open`` on the payload,
manga_ocr/ocr.py:102-110) and raise NotImplementedError naming the missing
lib otherwise — the dispatch seam is :func:`sniff_kind` +
:func:`decode_image_any`.  MP4 still needs ffmpeg.
"""

from __future__ import annotations

import io
import struct
import wave

import numpy as np

try:  # optional — not in this container; present in most deployments
    from PIL import Image as _PILImage
except ImportError:  # pragma: no cover - exercised via monkeypatch in tests
    _PILImage = None

# ---- format sniffing --------------------------------------------------------


def sniff_kind(payload: bytes) -> str:
    """Magic-byte format id: 'bmp' | 'ppm' | 'pgm' | 'wav' | 'png' | 'jpeg'
    | 'unknown'."""
    if payload[:2] == b"BM":
        return "bmp"
    if payload[:2] == b"P6":
        return "ppm"
    if payload[:2] == b"P5":
        return "pgm"
    if payload[:4] == b"RIFF" and payload[8:12] == b"WAVE":
        return "wav"
    if payload[:8] == b"\x89PNG\r\n\x1a\n":
        return "png"
    if payload[:2] == b"\xff\xd8":
        return "jpeg"
    return "unknown"


# ---- BMP --------------------------------------------------------------------

# BITMAPFILEHEADER: 'BM', u32 file size, u16+u16 reserved, u32 pixel offset.
# BITMAPINFOHEADER: u32 size(40), i32 w, i32 h (positive = bottom-up rows),
# u16 planes, u16 bpp, u32 compression(0 = BI_RGB), u32 image size, two i32
# px/m resolutions, u32 palette colors, u32 important colors.  Rows are
# padded to 4-byte multiples; 24-bit pixels are B,G,R order.

_BMP_FILE = struct.Struct("<2sIHHI")
_BMP_INFO = struct.Struct("<IiiHHIIiiII")


def encode_bmp(img: np.ndarray) -> bytes:
    """uint8 (h, w) grayscale or (h, w, 3) RGB -> 24-bit uncompressed BMP."""
    img = np.asarray(img, dtype=np.uint8)
    if img.ndim == 2:
        img = np.stack([img] * 3, axis=-1)
    h, w, _ = img.shape
    bgr = img[::-1, :, ::-1]  # bottom-up rows, BGR channel order
    pad = (-3 * w) % 4
    rows = np.zeros((h, 3 * w + pad), dtype=np.uint8)
    rows[:, : 3 * w] = bgr.reshape(h, 3 * w)
    pixels = rows.tobytes()
    off = _BMP_FILE.size + _BMP_INFO.size
    head = _BMP_FILE.pack(b"BM", off + len(pixels), 0, 0, off)
    info = _BMP_INFO.pack(40, w, h, 1, 24, 0, len(pixels), 2835, 2835, 0, 0)
    return head + info + pixels


def decode_bmp(payload: bytes) -> np.ndarray:
    """Uncompressed 8/24/32-bit BMP -> uint8 RGB (h, w, 3)."""
    magic, _, _, _, off = _BMP_FILE.unpack_from(payload, 0)
    if magic != b"BM":
        raise ValueError("not a BMP payload")
    hdr_size, w, h, _, bpp, comp = struct.unpack_from("<IiiHHI", payload, _BMP_FILE.size)
    if comp != 0:
        raise NotImplementedError(f"compressed BMP (BI code {comp}) needs PIL")
    if bpp not in (8, 24, 32):
        raise NotImplementedError(f"{bpp}-bit BMP needs PIL")
    flip = h > 0  # positive height = bottom-up storage
    h = abs(h)
    bypp = bpp // 8
    stride = (w * bypp + 3) & ~3
    raw = np.frombuffer(payload, np.uint8, count=stride * h, offset=off)
    rows = raw.reshape(h, stride)[:, : w * bypp]
    if bpp == 8:
        # palette starts right after the info header; entries are B,G,R,0
        pal_off = _BMP_FILE.size + hdr_size
        pal = np.frombuffer(payload, np.uint8, count=off - pal_off, offset=pal_off)
        pal = pal.reshape(-1, 4)[:, :3][:, ::-1]  # -> RGB
        img = pal[rows]
    else:
        px = rows.reshape(h, w, bypp)
        img = px[:, :, 2::-1]  # BGR(A) -> RGB, alpha dropped
    return img[::-1] if flip else img


# ---- PIL-backed compressed formats (optional import) -------------------------


def pil_available() -> bool:
    return _PILImage is not None


def decode_pil(payload: bytes) -> np.ndarray:
    """PNG/JPEG (or anything PIL opens) -> uint8 RGB (h, w, 3).  Mirrors the
    reference's ``Image.open(...).convert('RGB')`` load path
    (manga_ocr/ocr.py:102-110).  Raises NotImplementedError when PIL is not
    importable in this environment."""
    if _PILImage is None:
        raise NotImplementedError("PNG/JPEG decode needs PIL (not in this container)")
    with _PILImage.open(io.BytesIO(payload)) as im:
        return np.asarray(im.convert("RGB"), dtype=np.uint8)


def decode_image_any(payload: bytes) -> np.ndarray:
    """Decode dispatch: spec codecs for the uncompressed public formats,
    PIL (when importable) for everything else -> uint8 RGB (h, w, 3)."""
    kind = sniff_kind(payload)
    if kind == "bmp":
        return decode_bmp(payload)
    if kind in ("ppm", "pgm"):
        return decode_pnm(payload)
    return decode_pil(payload)


# ---- netpbm (PPM P6 / PGM P5) ----------------------------------------------


def encode_ppm(img: np.ndarray) -> bytes:
    """uint8 (h, w, 3) RGB -> binary P6; (h, w) grayscale -> binary P5."""
    img = np.asarray(img, dtype=np.uint8)
    if img.ndim == 2:
        h, w = img.shape
        return b"P5\n%d %d\n255\n" % (w, h) + img.tobytes()
    h, w, _ = img.shape
    return b"P6\n%d %d\n255\n" % (w, h) + img.tobytes()


def _pnm_tokens(payload: bytes, n: int) -> tuple[list[int], int]:
    """First ``n`` whitespace-separated integer tokens after the magic,
    skipping '#' comments; returns (values, offset_past_single_ws)."""
    vals: list[int] = []
    i = 2
    while len(vals) < n:
        while i < len(payload) and payload[i : i + 1].isspace():
            i += 1
        if payload[i : i + 1] == b"#":
            while i < len(payload) and payload[i] != 0x0A:
                i += 1
            continue
        j = i
        while j < len(payload) and not payload[j : j + 1].isspace():
            j += 1
        vals.append(int(payload[i:j]))
        i = j
    return vals, i + 1  # exactly one whitespace byte before raster data


def decode_pnm(payload: bytes) -> np.ndarray:
    """Binary P6 -> uint8 RGB (h, w, 3); binary P5 -> uint8 (h, w, 3)
    (grayscale replicated so downstream sees one layout)."""
    magic = payload[:2]
    if magic not in (b"P5", b"P6"):
        raise ValueError("not a binary PGM/PPM payload")
    (w, h, maxval), off = _pnm_tokens(payload, 3)
    if maxval > 255:
        raise NotImplementedError("16-bit netpbm needs PIL")
    ch = 3 if magic == b"P6" else 1
    raw = np.frombuffer(payload, np.uint8, count=w * h * ch, offset=off)
    if ch == 1:
        return np.stack([raw.reshape(h, w)] * 3, axis=-1)
    return raw.reshape(h, w, 3)


# ---- WAV --------------------------------------------------------------------


def encode_wav(samples: np.ndarray, sample_rate: int = 16000) -> bytes:
    """int16 mono/stereo samples (n,) or (n, ch) -> RIFF PCM WAV."""
    samples = np.asarray(samples, dtype=np.int16)
    ch = 1 if samples.ndim == 1 else samples.shape[1]
    buf = io.BytesIO()
    with wave.open(buf, "wb") as f:
        f.setnchannels(ch)
        f.setsampwidth(2)
        f.setframerate(sample_rate)
        f.writeframes(samples.tobytes())
    return buf.getvalue()


def decode_wav(payload: bytes) -> tuple[np.ndarray, int]:
    """RIFF PCM WAV -> (float64 mono samples in [-1, 1], sample_rate).
    Multi-channel audio is averaged to mono."""
    with wave.open(io.BytesIO(payload), "rb") as f:
        ch, width, rate, n = (f.getnchannels(), f.getsampwidth(),
                              f.getframerate(), f.getnframes())
        raw = f.readframes(n)
    if width == 2:
        x = np.frombuffer(raw, np.int16).astype(np.float64) / 32768.0
    elif width == 1:
        x = (np.frombuffer(raw, np.uint8).astype(np.float64) - 128.0) / 128.0
    else:
        raise NotImplementedError(f"{8 * width}-bit WAV needs soundfile")
    if ch > 1:
        x = x.reshape(-1, ch).mean(axis=1)
    return x, rate


# ---- audio features ---------------------------------------------------------


def audio_features(x: np.ndarray, rate: int, n_bands: int = 8) -> np.ndarray:
    """Deterministic vectorized descriptor: [duration_s, rms, zero-crossing
    rate, spectral centroid (Hz), n_bands log-power bands]."""
    n = len(x)
    if n == 0:
        return np.zeros(4 + n_bands)
    rms = float(np.sqrt(np.mean(x * x)))
    zcr = float(np.mean(np.signbit(x[1:]) != np.signbit(x[:-1])))
    spec = np.abs(np.fft.rfft(x)) ** 2
    freqs = np.fft.rfftfreq(n, d=1.0 / rate)
    centroid = float((freqs * spec).sum() / spec.sum()) if spec.sum() > 0 else 0.0
    edges = np.linspace(0, len(spec), n_bands + 1, dtype=np.int64)
    bands = np.add.reduceat(spec, edges[:-1])
    bands = np.log1p(bands / max(1, n))
    return np.concatenate([[n / rate, rms, zcr, centroid], bands])


# ---- concatenated-PPM stream (ffmpeg image2pipe output) ---------------------


def split_ppm_stream(data: bytes) -> list[bytes]:
    """Split a concatenation of binary P6 frames (what
    ``ffmpeg -f image2pipe -c:v ppm`` writes to stdout) into one payload per
    frame — header-driven slicing, no scanning for magic bytes inside raster
    data."""
    frames: list[bytes] = []
    i = 0
    while i < len(data):
        if data[i : i + 2] != b"P6":
            raise ValueError(f"PPM stream desync at byte {i}")
        (w, h, maxval), off = _pnm_tokens(data[i:], 3)
        if maxval > 255:
            raise NotImplementedError("16-bit netpbm needs PIL")
        end = i + off + w * h * 3
        if end > len(data):
            raise ValueError("truncated PPM frame in stream")
        frames.append(data[i:end])
        i = end
    return frames
