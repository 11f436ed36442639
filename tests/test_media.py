import numpy as np
import pytest

from manga_ocr_ray.stages.media import (
    Codec,
    MediaFeatureActor,
    make_fake_media_table,
    media_feature_pipeline,
)


def test_codec_raises_without_fake():
    # unknown bytes: hard error (no silent fake) unless fake=True
    with pytest.raises(ValueError):
        Codec(fake=False).decode_image(b"x", 4, 4)
    # compressed formats name the missing lib
    with pytest.raises(NotImplementedError):
        Codec(fake=False).decode_image(b"\x89PNG\r\n\x1a\nrest", 4, 4)
    with pytest.raises(NotImplementedError):
        Codec(fake=False).sample_frames(b"x", 1000, 100)


def test_fake_codec_deterministic():
    c = Codec(fake=True)
    a = c.decode_image(b"abcd" * 10, 8, 8)
    b = c.decode_image(b"abcd" * 10, 8, 8)
    assert np.array_equal(a, b)
    frames = c.sample_frames(b"0123456789", 1000, 250)
    assert len(frames) == 4


def test_fake_codec_ignores_installed_ffmpeg(tmp_path, monkeypatch):
    """fake=True must take precedence over an installed ffmpeg: fake-mode
    payloads are arbitrary bytes (no real container), so piping them to a
    real ffmpeg would make the suite environment-dependent."""
    fake_ff = tmp_path / "ffmpeg"
    fake_ff.write_text("#!/bin/sh\necho boom >&2\nexit 3\n")
    fake_ff.chmod(0o755)
    monkeypatch.setenv("GRAFT_FFMPEG", str(fake_ff))
    frames = Codec(fake=True).sample_frames(b"0123456789", 1000, 250)
    assert len(frames) == 4  # deterministic slices, ffmpeg never invoked


def test_media_actor_features_and_quarantine():
    t = make_fake_media_table(16)
    out = MediaFeatureActor(fake_codec=True)(t)
    assert out["decode_error"].null_count == 16  # all decode fine
    feats = out["features"].to_pylist()
    assert all(len(f) == 32 for f in feats)
    # determinism: same actor config → same features
    out2 = MediaFeatureActor(fake_codec=True)(t)
    assert out["features"].to_pylist() == out2["features"].to_pylist()


def test_media_pipeline_ray(ray_session):
    import ray.data as rd

    ds = rd.from_arrow(make_fake_media_table(64)).repartition(4)
    out = media_feature_pipeline(ds, concurrency=2, batch_size=16).to_pandas()
    assert len(out) == 64
    assert out["decode_error"].isna().all()
    assert all(len(f) == 32 for f in out["features"])


def test_frame_sample_pipeline(ray_session):
    import ray.data as rd

    from manga_ocr_ray.stages.media import frame_sample_pipeline, make_fake_media_table

    t = make_fake_media_table(8, seed=9)
    t = t.set_column(t.column_names.index("duration_ms"), "duration_ms",
                     __import__("pyarrow").array([5000] * 8, __import__("pyarrow").int32()))
    out = frame_sample_pipeline(rd.from_arrow(t), every_ms=1000).to_pandas()
    # 5000ms / 1000ms → 5 frames per video
    assert len(out) == 40
    assert out["decode_error"].isna().all()
    assert set(out["frame_idx"]) == {0, 1, 2, 3, 4}
    assert (out.groupby("media_id").size() == 5).all()


# ---- real codecs (imagecodec.py) -------------------------------------------


def test_bmp_roundtrip():
    from manga_ocr_ray.functions.imagecodec import decode_bmp, encode_bmp

    rng = np.random.default_rng(3)
    for h, w in [(1, 1), (5, 7), (16, 16), (13, 31)]:  # odd widths hit row padding
        img = rng.integers(0, 256, (h, w, 3), dtype=np.uint8)
        assert np.array_equal(decode_bmp(encode_bmp(img)), img)
    # grayscale input encodes as replicated RGB
    g = rng.integers(0, 256, (4, 6), dtype=np.uint8)
    out = decode_bmp(encode_bmp(g))
    assert np.array_equal(out[:, :, 0], g) and np.array_equal(out[:, :, 2], g)


def test_pnm_roundtrip():
    from manga_ocr_ray.functions.imagecodec import decode_pnm, encode_ppm

    rng = np.random.default_rng(4)
    img = rng.integers(0, 256, (9, 11, 3), dtype=np.uint8)
    assert np.array_equal(decode_pnm(encode_ppm(img)), img)
    g = rng.integers(0, 256, (9, 11), dtype=np.uint8)
    out = decode_pnm(encode_ppm(g))  # P5 → replicated channels
    assert np.array_equal(out[:, :, 1], g)
    # comment lines in the header are skipped per the netpbm spec
    with_comment = b"P5\n# a comment\n3 2\n255\n" + bytes(range(6))
    assert decode_pnm(with_comment).shape == (2, 3, 3)


def test_wav_roundtrip_and_features():
    from manga_ocr_ray.functions.imagecodec import (audio_features, decode_wav,
                                                    encode_wav)

    rate = 8000
    t = np.arange(rate)  # 1 second
    x = (np.sin(2 * np.pi * 440 * t / rate) * 16000).astype(np.int16)
    y, got_rate = decode_wav(encode_wav(x, rate))
    assert got_rate == rate and len(y) == rate
    assert np.allclose(y, x / 32768.0, atol=1e-9)
    feats = audio_features(y, rate)
    assert abs(feats[0] - 1.0) < 1e-9          # duration
    assert abs(feats[1] - np.sqrt(0.5) * 16000 / 32768) < 1e-3  # sine RMS
    assert abs(feats[3] - 440.0) < 5.0          # spectral centroid at the tone
    # stereo averages to mono
    stereo = np.stack([x, np.zeros_like(x)], axis=1)
    ym, _ = decode_wav(encode_wav(stereo, rate))
    assert np.allclose(ym, x / 65536.0, atol=1e-9)


def test_real_media_pipeline_ray(ray_session):
    import ray.data as rd

    from manga_ocr_ray.stages.media import make_real_media_table

    ds = rd.from_arrow(make_real_media_table(48)).repartition(4)
    out = media_feature_pipeline(ds, concurrency=(1, 2), batch_size=16,
                                 fake_codec=False).to_pandas()
    assert len(out) == 48
    assert out["decode_error"].isna().all()   # every REAL payload decodes
    assert all(len(f) == 32 for f in out["features"])
    # audio features carry the duration in slot 0
    audio = out[out["kind"] == "audio"]
    assert (audio["features"].map(lambda f: f[0]) > 0).all()


def test_real_codec_quarantines_corrupt_payload():
    from manga_ocr_ray.stages.media import make_real_media_table

    t = make_real_media_table(6)
    # truncate one BMP payload so the decode fails
    payloads = t["payload"].to_pylist()
    payloads[0] = payloads[0][:10]
    import pyarrow as pa

    t = t.set_column(t.column_names.index("payload"), "payload",
                     pa.array(payloads, pa.binary()))
    out = MediaFeatureActor(fake_codec=False)(t)
    errs = out["decode_error"].to_pylist()
    assert errs[0] is not None and all(e is None for e in errs[1:])


# ---- external-process-per-actor (A4) ---------------------------------------


def test_external_tool_actor_decodes_and_restarts():
    from manga_ocr_ray.functions.imagecodec import encode_bmp, encode_wav
    from manga_ocr_ray.stages.extproc import ExternalToolActor

    actor = ExternalToolActor()
    try:
        img = np.full((4, 4, 3), 7, dtype=np.uint8)
        r = actor.call_one(encode_bmp(img))
        assert r == {"kind": "bmp", "height": 4, "width": 4, "mean": 7.0}
        first_pid = actor.proc.pid
        # crash the worker; the actor must respawn and keep serving
        crash = actor.call_one(b"CRASH")
        assert crash["kind"] == "error" and "crashed" in crash["error"]
        assert actor.proc.pid != first_pid
        x = (np.ones(800) * 1000).astype(np.int16)
        r2 = actor.call_one(encode_wav(x, 8000))
        assert r2["kind"] == "wav" and r2["n_samples"] == 800
    finally:
        actor.proc.kill()


def test_external_tool_pipeline_ray(ray_session):
    import ray.data as rd

    from manga_ocr_ray.stages.extproc import external_tool_pipeline
    from manga_ocr_ray.stages.media import make_real_media_table

    ds = rd.from_arrow(make_real_media_table(24)).repartition(2)
    out = external_tool_pipeline(ds, concurrency=(1, 2), batch_size=8).to_pandas()
    assert len(out) == 24
    assert out["tool_error"].isna().all()
    assert set(out["tool_kind"]) == {"bmp", "ppm", "wav"}


_PNG_MAGIC = b"\x89PNG\r\n\x1a\n" + b"fakebody"


def test_pil_dispatch_without_pil():
    """In this container PIL is absent: PNG/JPEG payloads must raise
    NotImplementedError naming PIL, through both dispatch layers."""
    from manga_ocr_ray.functions import imagecodec as ic
    from manga_ocr_ray.stages.media import Codec

    assert not ic.pil_available()
    with pytest.raises(NotImplementedError, match="PIL"):
        ic.decode_image_any(_PNG_MAGIC)
    with pytest.raises(NotImplementedError, match="PIL"):
        Codec().decode_image(_PNG_MAGIC, 4, 4)


def test_pil_dispatch_with_pil(monkeypatch):
    """With PIL importable (stubbed here), PNG/JPEG payloads decode through
    Image.open(...).convert('RGB') — the reference's load path."""
    from manga_ocr_ray.functions import imagecodec as ic
    from manga_ocr_ray.stages.media import Codec

    rgb = np.arange(4 * 3 * 3, dtype=np.uint8).reshape(4, 3, 3)

    class _Im:
        def convert(self, mode):
            assert mode == "RGB"
            return rgb

        def __enter__(self):
            return self

        def __exit__(self, *a):
            return False

    class _PIL:
        @staticmethod
        def open(buf):
            assert buf.read(8) == _PNG_MAGIC[:8]
            return _Im()

    monkeypatch.setattr(ic, "_PILImage", _PIL)
    assert ic.pil_available()
    out = ic.decode_image_any(_PNG_MAGIC)
    assert out.shape == (4, 3, 3) and (out == rgb).all()
    gray = Codec().decode_image(_PNG_MAGIC, 3, 4)
    assert gray.shape == (4, 3)


def test_ffmpeg_gated_frame_sampling(tmp_path, monkeypatch):
    """Real frame sampling path (r4 verdict item 7): GRAFT_FFMPEG injects a
    stand-in binary that emits two concatenated P6 frames, exercising the
    subprocess + PPM-stream-split path end-to-end in a container without
    ffmpeg; frames decode with the engine's own stdlib codec."""
    from manga_ocr_ray.functions.imagecodec import decode_pnm, encode_ppm

    a = np.arange(48, dtype=np.uint8).reshape(4, 4, 3)
    b = (255 - a).astype(np.uint8)
    stream = tmp_path / "frames.bin"
    stream.write_bytes(encode_ppm(a) + encode_ppm(b))
    fake_ff = tmp_path / "ffmpeg"
    fake_ff.write_text(f"#!/bin/sh\ncat '{stream}'\n")
    fake_ff.chmod(0o755)
    monkeypatch.setenv("GRAFT_FFMPEG", str(fake_ff))
    frames = Codec(fake=False).sample_frames(b"\x00\x01videobytes", 2000, 1000)
    assert len(frames) == 2
    assert np.array_equal(decode_pnm(frames[0]), a)
    assert np.array_equal(decode_pnm(frames[1]), b)


def test_ffmpeg_failure_raises(tmp_path, monkeypatch):
    fake_ff = tmp_path / "ffmpeg"
    fake_ff.write_text("#!/bin/sh\necho boom >&2\nexit 3\n")
    fake_ff.chmod(0o755)
    monkeypatch.setenv("GRAFT_FFMPEG", str(fake_ff))
    with pytest.raises(ValueError, match="ffmpeg failed"):
        Codec(fake=False).sample_frames(b"x", 1000, 100)


def test_frame_stub_names_ffmpeg_when_absent(monkeypatch):
    monkeypatch.delenv("GRAFT_FFMPEG", raising=False)
    with pytest.raises(NotImplementedError, match="ffmpeg"):
        Codec(fake=False).sample_frames(b"x", 1000, 100)


def test_split_ppm_stream_errors():
    from manga_ocr_ray.functions.imagecodec import encode_ppm, split_ppm_stream

    a = np.zeros((2, 2, 3), dtype=np.uint8)
    good = encode_ppm(a)
    with pytest.raises(ValueError, match="desync"):
        split_ppm_stream(good + b"JUNK")
    with pytest.raises(ValueError, match="truncated"):
        split_ppm_stream(good[:-2])
