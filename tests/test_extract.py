"""Golden end-to-end extraction tests (pattern of reference tests/test_ocr.py:21-41:
exact equality against a generated expected fixture)."""

import os

import numpy as np
import pandas as pd
import pyarrow as pa
import pyarrow.parquet as pq
import pytest

from manga_ocr_ray.corpus import make_tables
from manga_ocr_ray.functions.pdf import flatten_pdf
from manga_ocr_ray.stages.extractor import ExtractorActor, extract_json_content
from manga_ocr_ray.functions.html import extract_main_html, strip_html_array


def test_extractor_inverts_corpus_driver_side():
    t, e = make_tables(60, seed=7)
    out = ExtractorActor()(t)
    assert out["extracted_text"].to_pylist() == e["expected_text"].to_pylist()


def test_extractor_metrics_columns():
    t, _ = make_tables(5, seed=1)
    out = ExtractorActor()(t)
    assert out["raw_chars"].to_pylist() == [len(x) for x in t["text"].to_pylist()]
    assert all(c >= 0 for c in out["extracted_chars"].to_pylist())


def test_html_boilerplate_dropped():
    html = (
        "<html><head><title>T</title><script>x</script></head><body>"
        '<nav><a href="/">Home</a></nav><p>keep me</p>'
        '<div><a href="/a">L1</a> <a href="/b">L2</a></div>'
        "<footer>foot</footer></body></html>"
    )
    assert extract_main_html(html) == "keep me"


def test_html_ruby_and_entities():
    got = extract_main_html("<p><ruby>漢字<rt>かんじ</rt></ruby> &amp; x&lt;y</p>")
    assert got.split() == ["漢字", "&", "x<y"]


def test_strip_html_array_keeps_all_text():
    arr = pa.array(["<nav>Home</nav><p>body</p>"])
    assert strip_html_array(arr).to_pylist()[0].split() == ["Home", "body"]


def test_pdf_flatten():
    doc = "Page 1 of 2\nhello wor-\nld line\n1\fPage 2 of 2\nmore text\n2"
    assert flatten_pdf(doc).split() == ["hello", "world", "line", "more", "text"]


def test_json_content():
    assert extract_json_content('{"content": "hi", "x": 1}') == "hi"
    assert extract_json_content("not json") == ""
    assert extract_json_content('["a"]') == ""


def test_extraction_pipeline_ray(ray_session, tmp_path):
    import ray.data as rd
    from manga_ocr_ray.pipelines.extract import (
        extract_turns, run_extraction, verify_against_expected, conversation_merge,
    )
    from manga_ocr_ray.state import manifest as mf

    t, e = make_tables(40, seed=42, mega_every=37, mega_turns=60)
    src = tmp_path / "transcripts.parquet"
    pq.write_table(t, src)
    from manga_ocr_ray.pipelines.extract import read_transcripts

    ds = read_transcripts(str(src))
    out_dir = str(tmp_path / "out")
    res = run_extraction(ds, out_dir, fingerprint="fp1", num_buckets=8, batch_size=256)
    assert res["new_rows"] == t.num_rows
    assert res["skipped_buckets"] == 0

    extracted = rd.read_parquet(mf.data_dir(out_dir))
    assert extracted.count() == t.num_rows

    # golden per-turn equality, key-based
    gold = rd.from_arrow(e)
    assert verify_against_expected(extracted, gold) == 0

    # manifests: every bucket covered, metrics present
    ms = mf.read_manifests(out_dir)
    assert sum(m["rows"] for m in ms) == t.num_rows
    assert all(0 <= m["metrics"]["strip_ratio"] <= 1 for m in ms)

    # resume: a second run skips everything
    res2 = run_extraction(read_transcripts(str(src)), out_dir, fingerprint="fp1", num_buckets=8)
    assert res2["new_rows"] == 0
    assert res2["skipped_buckets"] == len(ms)

    # fingerprint change invalidates
    assert mf.done_buckets(out_dir, "fp2") == set()

    # ordered merge (salted two-stage) matches a pandas reference
    merged = conversation_merge(extracted, chunk_size=16).to_pandas()
    exp_df = e.to_pandas().sort_values(["conv_id", "turn_idx"])
    ref = exp_df.groupby("conv_id")["expected_text"].apply("\n".join)
    got = merged.set_index("conv_id")["merged_text"]
    assert got.sort_index().equals(ref.sort_index())

    mega = merged.set_index("conv_id")["n_turns"]["conv_00000000"]
    assert mega == 60  # mega-conv crossed chunk boundaries and survived

    # deleting ONE bucket's manifest reprocesses exactly that bucket — and
    # rewrites (not appends) its data files, covering the crash window
    # between a bucket write and its manifest commit
    import os

    victim = ms[0]["bucket"]
    victim_rows = ms[0]["rows"]
    os.remove(os.path.join(out_dir, "_manifests", f"bucket={victim}.json"))
    res3 = run_extraction(read_transcripts(str(src)), out_dir, fingerprint="fp1", num_buckets=8)
    assert res3["skipped_buckets"] == len(ms) - 1
    assert res3["new_rows"] == victim_rows
    assert rd.read_parquet(mf.data_dir(out_dir)).count() == t.num_rows  # no dupes
    assert verify_against_expected(rd.read_parquet(mf.data_dir(out_dir)), gold) == 0

    # num_buckets change invalidates manifests TOO (review fix r5): bucket
    # assignment is hash mod num_buckets, so resuming at a different count
    # must trigger a full clean rebuild — never duplicate rows across the
    # old and new partition layouts.
    res4 = run_extraction(read_transcripts(str(src)), out_dir,
                          fingerprint="fp1", num_buckets=16)
    assert res4["new_rows"] == t.num_rows
    assert res4["skipped_buckets"] == 0
    assert rd.read_parquet(mf.data_dir(out_dir)).count() == t.num_rows

    # SHRINK direction (review fix r5): nb=16 → nb=8 → nb=16 again.  The
    # shrink run must prune the orphan nb=16 manifests for buckets >= 8;
    # otherwise the third run reads them as done, skips those buckets, and
    # silently loses their rows while the repair loop deletes their data.
    res5 = run_extraction(read_transcripts(str(src)), out_dir,
                          fingerprint="fp1", num_buckets=8)
    assert res5["new_rows"] == t.num_rows
    assert {m["fingerprint"] for m in mf.read_manifests(out_dir)} \
        == {"fp1|nb=8"}  # no orphan nb=16 manifests survive the shrink
    res6 = run_extraction(read_transcripts(str(src)), out_dir,
                          fingerprint="fp1", num_buckets=16)
    assert res6["skipped_buckets"] == 0
    assert res6["new_rows"] == t.num_rows
    assert rd.read_parquet(mf.data_dir(out_dir)).count() == t.num_rows
    assert sum(m["rows"] for m in mf.read_manifests(out_dir)) == t.num_rows


def test_verify_detects_mismatch(ray_session):
    import ray.data as rd
    from manga_ocr_ray.pipelines.extract import verify_against_expected

    ex = rd.from_items(
        [
            {"conv_id": "c", "turn_idx": 0, "extracted_text": "a"},
            {"conv_id": "c", "turn_idx": 1, "extracted_text": "b"},
        ]
    )
    gold = rd.from_items(
        [
            {"conv_id": "c", "turn_idx": 0, "expected_text": "a"},
            {"conv_id": "c", "turn_idx": 1, "expected_text": "DIFFERENT"},
            {"conv_id": "c", "turn_idx": 2, "expected_text": "missing"},
        ]
    )
    assert verify_against_expected(ex, gold) == 2


def test_quarantine_isolates_poison_rows():
    import pyarrow as pa

    from manga_ocr_ray.stages.extractor import ExtractorActor

    class Poisoned(ExtractorActor):
        def _kernel(self, sub, kind):
            vals = sub.to_pylist()
            if kind == "html" and any("BOOM" in (t or "") for t in vals):
                raise RuntimeError("kernel exploded")
            return super()._kernel(sub, kind)

    batch = pa.table({
        "conv_id": ["c"] * 3,
        "turn_idx": pa.array([0, 1, 2], pa.int32()),
        "text": ["<p>fine one</p>", "<p>BOOM</p>", "<p>fine two</p>"],
        "tool": ["html"] * 3,
    })
    out = Poisoned(quarantine=True, emit_metrics=False, normalize=False)(batch)
    rows = {r["turn_idx"]: r for r in out.to_pylist()}
    assert rows[0]["extracted_text"] == "fine one"
    assert rows[2]["extracted_text"] == "fine two"
    assert rows[1]["extracted_text"] == ""  # quarantined, not dropped
    assert "RuntimeError" in rows[1]["extract_error"]
    assert rows[0]["extract_error"] is None

    # without quarantine the group error propagates (fail-fast default)
    import pytest

    with pytest.raises(RuntimeError):
        Poisoned(quarantine=False, emit_metrics=False, normalize=False)(batch)


def test_extract_turns_quarantine_column(ray_session):
    from manga_ocr_ray.corpus import transcripts_dataset
    from manga_ocr_ray.pipelines.extract import extract_turns

    ds = extract_turns(transcripts_dataset(10, seed=3), num_buckets=4,
                       concurrency=1, quarantine=True)
    t = ds.to_pandas()
    assert "extract_error" in t.columns
    assert t["extract_error"].isna().all()  # healthy corpus → no quarantined rows


def test_retry_budget_and_debug_column(ray_session):
    """Per-row retry-then-quarantine budget (the reference's retry-x4 sample
    loop as a knob) + the debug side-output column."""
    import json

    import pyarrow as pa

    from manga_ocr_ray.stages.extractor import ExtractorActor

    class Flaky(ExtractorActor):
        """Kernel that fails the first 2 attempts for a marked row —
        the transient-external-call shape the budget exists for."""

        def __init__(self, **kw):
            self.seen: dict[str, int] = {}
            super().__init__(**kw)

        def _kernel(self, sub, kind):
            texts = sub.to_pylist()
            if any("BOOM" in t for t in texts):
                key = texts[0]
                self.seen[key] = self.seen.get(key, 0) + 1
                if self.seen[key] <= 2:
                    raise RuntimeError("transient")
            return super()._kernel(sub, kind)

    batch = pa.table({
        "conv_id": ["c", "c", "c"],
        "turn_idx": pa.array([0, 1, 2], pa.int32()),
        "text": ["fine text", "has BOOM marker", "also fine"],
        "tool": ["text", "text", "text"],
    })

    # budget 3: transient failure recovers on attempt 3, nothing quarantined
    a3 = Flaky(quarantine=True, max_attempts=3, debug=True, normalize=False)
    out = a3(batch)
    errs = out["extract_error"].to_pylist()
    assert errs == [None, None, None]
    dbg = [json.loads(x) for x in out["debug_json"].to_pylist()]
    assert dbg[1]["attempts"] == 3 and dbg[0]["attempts"] == 1
    assert not dbg[1]["quarantined"]

    # budget 2: exhausted -> quarantined with attempt count, others unharmed
    a2 = Flaky(quarantine=True, max_attempts=2, debug=True, normalize=False)
    out2 = a2(batch)
    errs2 = out2["extract_error"].to_pylist()
    assert errs2[0] is None and errs2[2] is None
    assert "after 2 attempts" in errs2[1]
    assert out2["extracted_text"].to_pylist()[1] == ""


def test_json_kernel_fast_path_equivalence():
    """The vectorized json fast path must be bit-identical to per-row
    json.loads on every shape: flat literal (fast), escapes, nested content,
    duplicate keys, non-string content, missing content, malformed."""
    import pyarrow as pa

    from manga_ocr_ray.stages.extractor import ExtractorActor, extract_json_content

    payloads = [
        '{"tool": "search", "status": "ok", "content": "plain text", "n": 3}',
        '{"content": "日本語のコンテンツ…", "x": 1.5}',
        '{"content": "with \\"escaped\\" quotes"}',
        '{"content": "line\\nbreak and \\u00e9"}',
        '{"content": {"nested": ["x", 1]}}',
        '{"content": 42}',
        '{"content": "a", "content": "b"}',   # json.loads: last wins
        '{"status": "no content key"}',
        'not json at all',
        '[1, 2, 3]',
        '{"content": ""}',
        '{"a": "fake \\"content\\": \\"inner\\" str", "content": "real"}',
    ]
    got = ExtractorActor._json_kernel(pa.array(payloads, pa.string()))
    want = [extract_json_content(p) for p in payloads]
    assert got == want, list(zip(payloads, got, want))


def test_extractor_fuzz_never_crashes_and_is_deterministic():
    """Robustness property: arbitrary byte soup in any payload kind must
    never raise (poison rows quarantine instead) and two runs over the same
    batch must be bit-identical (north rule: determinism across runs)."""
    from hypothesis import given, settings
    from hypothesis import strategies as st

    from manga_ocr_ray.stages.extractor import extract_batch_task

    kinds = st.sampled_from(["html", "pdf", "json", "text", "", "bogus"])
    junk = st.text(
        st.sampled_from(list('<>{}[]"&;ab1\\\x00\x02\x03\n\t日ｶﾞ …')),
        max_size=40)

    @settings(max_examples=60, deadline=None)
    @given(st.lists(st.tuples(junk, kinds), min_size=1, max_size=12))
    def prop(rows):
        batch = pa.table({
            "conv_id": pa.array([f"c{i}" for i in range(len(rows))]),
            "turn_idx": pa.array(np.arange(len(rows), dtype=np.int32)),
            "role": pa.array(["user"] * len(rows)),
            "tool": pa.array([k for _, k in rows]),
            "ts": pa.array(np.zeros(len(rows), dtype="datetime64[us]")),
            "text": pa.array([t for t, _ in rows], pa.string()),
        })
        out1 = extract_batch_task(batch)
        out2 = extract_batch_task(batch)
        assert out1.equals(out2)
        assert out1.num_rows == len(rows)

    prop()


def test_frozen_end_to_end_vectors():
    """Hand-written payload → extracted-text literals, INDEPENDENT of both
    the corpus generator and post_process (ADVICE r2: the golden-corpus gate
    builds expected_text with the engine's own post_process, so a semantic
    bug there would cancel on both sides; these frozen literals would not).
    One vector per payload kind through the full ExtractorActor chain."""
    import pyarrow as pa

    from manga_ocr_ray.stages.extractor import ExtractorActor

    vectors = [
        ("text", "も う 一度・・・・ done…", "もう一度．．．ｄｏｎｅ．．．"),
        ("html",
         "<html><head><title>skip</title></head>"
         "<body><p>ab cd</p><nav>zz</nav></body></html>",
         "ａｂｃｄ"),
        ("pdf", "intro ta-\nble\fPage 2 of 3\nrest",
         "ｉｎｔｒｏｔａｂｌｅｒｅｓｔ"),
        ("json", '{"tool": "calc", "status": "ok", "content": "1 + 1 = 2…"}',
         "１＋１＝２．．．"),
    ]
    batch = pa.table({
        "conv_id": ["c"] * len(vectors),
        "turn_idx": pa.array(range(len(vectors)), pa.int32()),
        "text": [v[1] for v in vectors],
        "tool": [v[0] for v in vectors],
    })
    out = ExtractorActor()(batch)
    assert out["extracted_text"].to_pylist() == [v[2] for v in vectors]


def test_html_comment_region_interleaving():
    """ADVICE r2: a commented-out region closer must not truncate the fused
    region strip — the comment pass runs first."""
    import pyarrow as pa

    from manga_ocr_ray.functions.html import extract_main_html, extract_main_html_array

    doc = "<p>keep</p><nav> x <!-- </nav> --> y </nav><p>also keep</p>"
    out = extract_main_html(doc)
    assert out == "keep\nalso keep", out   # no ' --> y' leak
    doc2 = "<script> a <!-- </script> --> b </script><p>main</p>"
    assert extract_main_html(doc2) == "main"
    # ill-formed mutual interleaving: defined leftmost-first semantics,
    # scalar and batched twins must agree
    doc3 = '<style> s <script> </style> x </script><p>ok</p>'
    docs = [doc, doc2, doc3]
    batched = extract_main_html_array(pa.array(docs, pa.string())).to_pylist()
    assert batched == [extract_main_html(d) for d in docs]


def test_verify_detects_dup_gold_masking_missing_row(ray_session):
    """Review r4: duplicate gold keys must not absorb a missing extracted
    row — one extracted row matching two identical gold rows produced
    joined_rows == n_gold with zero null rows under the old check."""
    import ray.data as rd

    from manga_ocr_ray.pipelines.extract import verify_against_expected

    ex = rd.from_items([
        {"conv_id": "c", "turn_idx": 0, "extracted_text": "a"},
    ])
    gold = rd.from_items([
        {"conv_id": "c", "turn_idx": 0, "expected_text": "a"},
        {"conv_id": "c", "turn_idx": 0, "expected_text": "a"},
    ])
    assert verify_against_expected(ex, gold) > 0


def test_classify_blocks_vectorized_matches_scalar_property():
    """The Arrow-kernel density classifier must equal the scalar str.find
    loop on adversarial tag soup (anchors, nested markers, entities, empty
    and link-dense blocks, unicode whitespace, raw-marker fallback)."""
    import random

    import pyarrow as pa

    from manga_ocr_ray.functions.html import (extract_main_html,
                                              extract_main_html_array)

    rng = random.Random(17)
    frags = ["<p>", "</p>", "<div>", "</div>", "<a href='y'>", "</a>",
             "text", "  ", "&amp;", "&lt;b&gt;", "<nav>", "</nav>", "<br>",
             "link", "<script>x</script>", "日本語　", "<!-- c -->",
             " ", "\x1c", "word.", "\n", "<td>", "</td>"]
    docs = ["".join(rng.choice(frags) for _ in range(rng.randint(0, 30)))
            for _ in range(300)]
    docs += ["", "<a href=x>only link</a>", "plain", None,
             "a" * 5 + "<a>" + "b" * 100 + "</a>"]
    got = extract_main_html_array(pa.array(docs, pa.string())).to_pylist()
    assert got == [extract_main_html(d or "") for d in docs]
    # pre-existing control chars route through the scalar fallback
    raw = ["pre\x02existing", "x\x00y", "q\x03", "<p>fine</p>"]
    got_raw = extract_main_html_array(pa.array(raw, pa.string())).to_pylist()
    assert got_raw == [extract_main_html(d) for d in raw]


def test_adaptive_batch_size(ray_session):
    """SURVEY §7.5 adaptive batching: wide payload rows shrink the extractor
    batch (bytes knob, not rows); narrow rows keep the 1024 default; lazy
    transformed inputs (size unknown without execution) fall through to
    Ray's default."""
    import ray.data as rd

    from manga_ocr_ray.pipelines.extract import (_adaptive_batch_size,
                                                 extract_turns)

    # wide: 64 rows x ~1 MB payloads -> ~16-row batches
    wide = pa.table({
        "conv_id": pa.array([f"c{i}" for i in range(64)]),
        "turn_idx": pa.array(np.zeros(64, np.int32)),
        "role": pa.array(["user"] * 64),
        "text": pa.array(["x" * 1_000_000] * 64),
        "tool": pa.array([None] * 64, pa.string()),
        "ts": pa.array(np.zeros(64, "datetime64[us]")),
    })
    ds = rd.from_arrow(wide)
    bs = _adaptive_batch_size(ds)
    assert bs is not None and 16 <= bs <= 64

    # narrow: clamps to the 1024 default
    narrow = rd.from_arrow(pa.table({"text": pa.array(["hi"] * 1000)}))
    assert _adaptive_batch_size(narrow) == 1024

    # lazy transformed plan: metadata unknown -> None (never executes)
    lazy = rd.range(10).map_batches(lambda t: t, batch_format="pyarrow")
    assert _adaptive_batch_size(lazy) is None

    # end-to-end over the wide corpus still extracts every row
    out = extract_turns(ds, num_buckets=4, concurrency=(1, 2))
    assert out.count() == 64


def test_task_mode_matches_actor_pool(ray_session):
    """The default reusable-worker task mode and the actor-pool mode run the
    identical kernel — outputs must be bit-equal, and the task-mode cache
    must key on config (quarantine run can't reuse the plain instance)."""
    from manga_ocr_ray.corpus import transcripts_dataset
    from manga_ocr_ray.pipelines.extract import extract_turns

    ds = transcripts_dataset(60, seed=11).materialize()
    key = ["conv_id", "turn_idx"]
    task = extract_turns(ds, num_buckets=4, pool="task").to_pandas() \
        .sort_values(key).reset_index(drop=True)
    actor = extract_turns(ds, num_buckets=4, pool="actor",
                          concurrency=(1, 2)).to_pandas() \
        .sort_values(key).reset_index(drop=True)
    pd.testing.assert_frame_equal(task, actor)

    q = extract_turns(ds, num_buckets=4, pool="task", quarantine=True) \
        .to_pandas()
    assert "extract_error" in q.columns and q["extract_error"].isna().all()

    with pytest.raises(ValueError):
        extract_turns(ds, pool="threads")


def test_merge_barrier_knob_paths_agree(ray_session, monkeypatch):
    """GRAFT_MERGE_BARRIER policy knob (r4 verdict item 4): the staged
    (materialize-barrier, single-node default) and fused (multi-node
    spill-free) execution paths of conversation_merge must produce
    bit-identical merges."""
    from manga_ocr_ray.corpus import transcripts_dataset
    from manga_ocr_ray.pipelines.extract import conversation_merge, extract_turns

    ds = transcripts_dataset(50, seed=23).materialize()
    extracted = extract_turns(ds, num_buckets=4, pool="task").materialize()

    outs = {}
    for env in ["1", "0"]:
        monkeypatch.setenv("GRAFT_MERGE_BARRIER", env)
        outs[env] = conversation_merge(extracted, chunk_size=16).to_pandas() \
            .sort_values("conv_id").reset_index(drop=True)
    pd.testing.assert_frame_equal(outs["1"], outs["0"])
    assert (outs["1"]["n_turns"] > 0).all()
