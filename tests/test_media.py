import numpy as np
import pytest

from manga_ocr_ray.stages.media import (
    Codec,
    MediaFeatureActor,
    make_fake_media_table,
    media_feature_pipeline,
)


def test_codec_stub_raises_without_fake():
    with pytest.raises(NotImplementedError):
        Codec(fake=False).decode_image(b"x", 4, 4)
    with pytest.raises(NotImplementedError):
        Codec(fake=False).sample_frames(b"x", 1000, 100)


def test_fake_codec_deterministic():
    c = Codec(fake=True)
    a = c.decode_image(b"abcd" * 10, 8, 8)
    b = c.decode_image(b"abcd" * 10, 8, 8)
    assert np.array_equal(a, b)
    frames = c.sample_frames(b"0123456789", 1000, 250)
    assert len(frames) == 4


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
