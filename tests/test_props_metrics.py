"""Equivalence pins for the round-3 exact-semantics fixes.

- parse_props_k vs DuckDB ``TRY_CAST(props->>'k' AS BIGINT)`` on nested /
  quoted / duplicate-key / fractional / malformed payloads (ADVICE r2: the
  old regex matched '"k": N' anywhere; these vectors prove depth-1 + CAST
  coercion semantics now hold).
- LangIdStage vs scalar lang_id on digit/underscore-adjacent stopwords
  (ADVICE r2: \\b saw no boundary before a digit, so 'the123' scored 0).
- edit_distance units: codepoint (CER definition) vs byte (DuckDB
  levenshtein mirror used by the transcript_cer oracle).
"""

import numpy as np
import pyarrow as pa


PROPS_VECTORS = [
    '{"k": 3}',
    '{"k": -4, "x": 1}',
    '{"k": "12"}',            # quoted numeric coerces
    '{"k": " 12 "}',          # CAST trims whitespace
    '{"k": 12.5}',            # CAST rounds half away from zero -> 13
    '{"k": "7.5"}',           # quoted fractional -> 8
    '{"k": -2.5}',            # half away from zero -> -3
    '{"k": true}',            # bool -> NULL
    '{"k": null}',
    '{"k": "abc"}',           # non-numeric -> NULL
    '{"a": {"k": 5}}',        # nested k is NOT top-level -> NULL
    '{"a": [1, {"k": 6}]}',   # k inside array element -> NULL
    '{"k": 3, "k": 7}',       # duplicate keys: DuckDB takes the FIRST
    '{"a": "x,\\"k\\":7,y", "k": 2}',  # '"k":' inside a string value
    '{"kk": 1}',              # key name is not k
    '{}',
    'not json at all "k": 9',  # malformed -> NULL (json_valid=false)
    '{"k": 8, "j": [1,2]}',   # non-flat but valid, top-level int k
    None,
]


def test_parse_props_k_matches_duckdb(ray_session):
    import duckdb

    from manga_ocr_ray.pipelines.relational import parse_props_k

    t = pa.table({
        "event_type": ["e"] * len(PROPS_VECTORS),
        "props": pa.array(PROPS_VECTORS, pa.string()),
    })
    got = parse_props_k(t)["k"].to_pylist()

    con = duckdb.connect()
    con.execute("create table t(props varchar)")
    for p in PROPS_VECTORS:
        con.execute("insert into t values (?)", [p])
    want = [r[0] for r in con.sql(
        "select case when props is not null and json_valid(props) "
        "then try_cast(props->>'k' as bigint) else null end from t"
    ).fetchall()]
    assert got == want, list(zip(PROPS_VECTORS, got, want))


def test_parse_props_k_fast_path_covers_flat_rows():
    """Every flat-int-k row resolves via the RE2 fast path (no json.loads)."""
    from manga_ocr_ray.pipelines import relational as R

    t = pa.table({
        "event_type": ["e", "e"],
        "props": ['{"k": 3, "b": "x"}', '{ "k" : "42" }'],
    })
    calls = []
    orig = R._props_k_slow
    R._props_k_slow = lambda p: calls.append(p) or orig(p)
    try:
        out = R.parse_props_k(t)["k"].to_pylist()
    finally:
        R._props_k_slow = orig
    assert out == [3, 42]
    assert calls == []  # pure fast path


def test_lang_id_stage_matches_scalar_on_boundary_cases(ray_session):
    from manga_ocr_ray.functions.textstats import LangIdStage, lang_id

    texts = [
        "the123 cat456 is789 on the mat",   # digits split words
        "the_x and_y of_z in the house",    # underscores split words
        "das ist2gut und3 nicht4 ein5 haus",
        "the cat is on the mat and it is happy",
        "le chat est dans la maison pour toujours et pas la",
        "12345 67890",
        "",
    ]
    t = pa.table({"doc_id": list(range(len(texts))), "text": texts})
    stage = LangIdStage()
    got = stage(t)["lang_pred"].to_pylist()
    want = [lang_id(s) for s in texts]
    assert got == want, list(zip(texts, got, want))
    # and the fix actually bites: 'the' must be seen inside 'the123'
    assert got[0] == "en" and got[1] == "en"


def test_edit_distance_units():
    import duckdb

    from manga_ocr_ray.functions.metrics import edit_distance

    cases = [("誤", ""), ("あい", "あ"), ("kitten", "sitting"),
             ("こんにちは", "こんばんは"), ("", ""), ("abc", "abc")]
    con = duckdb.connect()
    for a, b in cases:
        want_bytes = con.sql("select levenshtein(?, ?)", params=[a, b]).fetchone()[0]
        assert edit_distance(a, b, unit="byte") == want_bytes, (a, b)
    # codepoint unit is the CER definition
    assert edit_distance("誤", "") == 1
    assert edit_distance("あい", "あ") == 1
    assert edit_distance("kitten", "sitting") == 3
