"""Normalization kernel conformance.

The 11 golden vectors are verbatim from the reference's
tests/test_ocr.py:56-66 (post_process); batch and scalar paths must agree on
arbitrary input (hypothesis).
"""

import pyarrow as pa
from hypothesis import given, settings
from hypothesis import strategies as st

from manga_ocr_ray.functions.h2z import H2Z_FROM, H2Z_TO, h2z, h2z_join_translate
from manga_ocr_ray.functions.normalize import (
    WHITESPACE_CHARS,
    normalize_array,
    normalize_texts,
    post_process,
)

GOLDEN = [
    ("…", "．．．"),
    ("・・", "．．．"),
    ("a b c", "ａｂｃ"),
    ("a　b　c", "ａｂｃ"),
    ("a.b", "ａ．ｂ"),
    ("a..b", "ａ．．．ｂ"),
    ("a・b", "ａ・ｂ"),
    ("a・・b", "ａ．．．ｂ"),
    ("a.・b", "ａ．．．ｂ"),
    ("a...b", "ａ．．．ｂ"),
    ("a....b", "ａ．．．ｂ"),
]


def test_golden_vectors_scalar():
    for inp, want in GOLDEN:
        assert post_process(inp) == want, inp


def test_golden_vectors_batch():
    got = normalize_texts([i for i, _ in GOLDEN])
    assert got == [w for _, w in GOLDEN]


def test_whitespace_set_matches_str_split():
    ws = {c for c in map(chr, range(0x110000)) if c.isspace()}
    assert ws == set(WHITESPACE_CHARS)


def test_h2z_kana_with_dakuten():
    assert h2z("ｶﾞｷﾞｳﾞﾊﾟｱｲ｡｢｣ｰﾝﾞ") == "ガギヴパアイ。「」ーン゛"
    assert h2z("abc 123!?") == "ａｂｃ　１２３！？"


def test_h2z_tables_roundtrip():
    assert len(H2Z_FROM) == len(H2Z_TO)
    assert h2z(H2Z_FROM) == H2Z_TO


def test_normalize_array_nulls():
    arr = pa.chunked_array([pa.array(["a b", None]), pa.array(["…"])])
    out = normalize_array(arr)
    assert out.to_pylist() == ["ａｂ", None, "．．．"]


@settings(max_examples=200, deadline=None)
@given(st.lists(st.text(max_size=40), max_size=8))
def test_batch_equals_scalar(texts):
    assert normalize_texts(texts) == [post_process(t) for t in texts]


@settings(max_examples=100, deadline=None)
@given(st.lists(st.text(alphabet=st.characters(codec="utf-8"), max_size=30), max_size=5))
def test_h2z_batch_equals_scalar(texts):
    assert h2z_join_translate(texts) == [h2z(t) for t in texts]


def test_numpy_normalize_matches_joined_and_scalar():
    """The codepoint-array fast path is property-tested against BOTH the
    joined-string batch path and the scalar reference on adversarial and
    randomized inputs (runs, pairs, astral chars, separators-adjacent)."""
    import random

    from manga_ocr_ray.functions.normalize import (
        normalize_texts, normalize_texts_joined, post_process)

    cases = [
        "", " ", "a b\tc\nd", "テ ス ト", "日本語。。。x", "・・・", "・", ".", "..",
        "….", "…", "……", ".・.", "a…・.b", "ｶﾞｷﾞｸﾞ", "ｳﾞｧ", "ﾊﾟﾋﾟ", "ﾞ", "ﾟｱ",
        "ｶﾞﾞ", "ｶｶﾞ", "abc123!~", " ﾞ ｶ ﾞ", "　 x y", "𝕏😀 . . 𝕏", "ーｰ",
        "\U0001F600…", "ｻﾞｼﾞｽﾞｾﾞｿﾞﾀﾞﾁﾞﾂﾞﾃﾞﾄﾞﾊﾞﾋﾞﾌﾞﾍﾞﾎﾞﾊﾟﾋﾟﾌﾟﾍﾟﾎﾟ",
    ]
    assert (normalize_texts(cases) == normalize_texts_joined(cases)
            == [post_process(t) for t in cases])

    rng = random.Random(7)
    alphabet = list("aA1 .・…ｶﾞﾟｱﾊ\t\n　ガ。ー𝕏😀ﾞ")
    batch = ["".join(rng.choice(alphabet) for _ in range(rng.randrange(0, 40)))
             for _ in range(3000)]
    assert normalize_texts(batch) == normalize_texts_joined(batch)
