"""Pipeline-step registry (§2.10): declarative spec → compiled transform."""

import pyarrow as pa
import pytest

from manga_ocr_ray.functions.normalize import post_process
from manga_ocr_ray.registry import STEP_REGISTRY, build_pipeline, register_step


def test_unknown_op_raises_at_compile_time():
    with pytest.raises(KeyError, match="unknown pipeline op"):
        build_pipeline([{"op": "definitely_not_registered"}])


def test_registry_lists_core_ops():
    for op in ("strip_html", "flatten_pdf", "normalize", "token_count",
               "quality", "lang_id", "filter", "select", "limit",
               "extract_turns", "wrap_html", "fingerprint"):
        assert op in STEP_REGISTRY


def test_compiled_pipeline_runs(ray_session):
    import ray.data as rd

    ds = rd.from_arrow(pa.table({
        "doc_id": [1, 2],
        "text": ["hello  world…", "<b>bold</b> move"],
    }))
    pipe = build_pipeline([
        {"op": "strip_html", "in_col": "text", "out_col": "clean"},
        {"op": "normalize", "in_col": "clean", "out_col": "clean"},
        {"op": "token_count", "in_col": "clean", "out_col": "n_tokens"},
        {"op": "select", "columns": ["doc_id", "clean", "n_tokens"]},
    ])
    out = {r["doc_id"]: r for r in pipe(ds).take_all()}
    assert out[1]["clean"] == post_process("hello  world…")
    assert out[2]["clean"] == post_process("bold  move")
    assert set(out[1].keys()) == {"doc_id", "clean", "n_tokens"}


def test_wrap_strip_roundtrip(ray_session):
    import ray.data as rd

    ds = rd.from_arrow(pa.table({"doc_id": [7], "text": ["payload text"]}))
    pipe = build_pipeline([
        {"op": "wrap_html", "in_col": "text", "out_col": "wrapped"},
        {"op": "strip_html", "in_col": "wrapped", "out_col": "stripped"},
    ])
    row = pipe(ds).take_all()[0]
    assert "payload text" in row["stripped"]
    assert "<" not in row["stripped"]
    assert "script" not in row["stripped"].lower()


def test_custom_step_registration(ray_session):
    import ray.data as rd

    @register_step("shout")
    def _shout(in_col: str = "text"):
        def step(ds):
            def fn(t: pa.Table) -> pa.Table:
                import pyarrow.compute as pc

                return t.set_column(
                    t.column_names.index(in_col), in_col, pc.utf8_upper(t[in_col])
                )

            return ds.map_batches(fn, batch_format="pyarrow")

        return step

    pipe = build_pipeline([{"op": "shout"}])
    ds = rd.from_arrow(pa.table({"text": ["quiet"]}))
    assert pipe(ds).take_all()[0]["text"] == "QUIET"
    del STEP_REGISTRY["shout"]


def test_actor_step_params(ray_session):
    import ray.data as rd

    ds = rd.from_arrow(pa.table({
        "doc_id": [1], "text": ["the cat is on the mat and it is very happy"]
    }))
    pipe = build_pipeline([{"op": "lang_id", "concurrency": 1}])
    assert pipe(ds).take_all()[0]["lang_pred"] == "en"
