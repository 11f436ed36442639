"""Semantic Japanese segmentation (M16): scalar BudouX algorithm vs the
vectorized batch path vs hand-frozen fixtures.

Reference anchor: the BudouX parser loaded once per generator and used for
semantic line-breaking —
manga_ocr_dev/synthetic_data_generator/common/base_generator.py:63,129-155.
"""

import random

import pytest

from manga_ocr_ray.functions.jatok import (
    DEFAULT_JA_MODEL,
    JaSegmenter,
    _model_bias,
    parse,
)

# Alphabet biased toward the model's decision chars so random strings hit
# every rule: particles, punctuation, openers/closers, small kana, spaces.
_ALPHABET = (
    "はがをにでとものへや"      # particles
    "。、！？．!?,"             # break-after punctuation
    "「『（([｛{」』）)]｝}"    # openers / closers
    "ーゃゅょっんち"            # no-break-before kana
    "あいうえおかきくけこ漢字日本語テスト"
    "abcXYZ09 　"
)


def _random_texts(n: int, seed: int) -> list[str]:
    rng = random.Random(seed)
    out = []
    for _ in range(n):
        k = rng.randint(0, 40)
        out.append("".join(rng.choice(_ALPHABET) for _ in range(k)))
    return out


def test_scalar_batch_equivalence():
    """The vectorized packed-key batch path must agree with the scalar
    reference implementation on every string, including empties and
    strings shorter than the widest feature window."""
    texts = _random_texts(500, seed=7) + ["", "あ", "はは", "。。", "に", "　"]
    seg = JaSegmenter()
    batch = seg.segment_batch(texts)
    for t, got in zip(texts, batch):
        assert got == parse(t, DEFAULT_JA_MODEL), repr(t)


def test_concatenation_invariant():
    """Chunks always reassemble the input exactly (segmentation never
    drops or reorders characters)."""
    texts = _random_texts(200, seed=11)
    for t, chunks in zip(texts, JaSegmenter().segment_batch(texts)):
        assert "".join(chunks) == t


def test_default_model_fixtures():
    """Frozen phrase splits for the hand-built bunsetsu-style model."""
    cases = {
        # です is a particle-exception bigram (no break inside the copula)
        "これはペンです。": ["これは", "ペンです。"],
        # break after the closer 」 and after the particle と
        "「わかった。」と言った": ["「わかった。」", "と", "言った"],
        # にち is a particle-exception bigram (こんにちは stays whole)
        "こんにちは世界": ["こんにちは", "世界"],
        # spaces break after, fullwidth too
        "ＡＢ　ＣＤ": ["ＡＢ　", "ＣＤ"],
        # small kana / long vowel never start a chunk
        "きょうはチーズ": ["きょうは", "チーズ"],
        # te-form verb + auxiliary split, punctuation attaches left
        "本を読んでいます。": ["本を", "読んで", "います。"],
        "": [],
    }
    for text, want in cases.items():
        assert parse(text, DEFAULT_JA_MODEL) == want, text
        assert JaSegmenter().segment_batch([text])[0] == want, text


def test_trained_model_bias_convention():
    """A model without __bias__ uses BudouX's -total_weight/2 convention,
    so real trained BudouX JSON weights drop in unchanged."""
    model = {"UW4": {"x": 10.0, "y": 2.0}, "BW2": {"ab": 4.0}}
    assert _model_bias(model) == -8.0
    # score at 'x' = -8 + 10 > 0 -> break before every x (after position 0)
    assert parse("axbx", model) == ["a", "xb", "x"]
    # window guards: BW2 needs both chars in-range; 'ab' fires at i=1
    # (score -8 + 4 = -4, no break) — matches budoux's guard semantics
    assert parse("ab", model) == ["ab"]


def test_explicit_bias_zero_keeps_runs_whole():
    """With __bias__=0 and no positive evidence, nothing breaks."""
    texts = ["latin only words", "漢字漢字漢字", "カタカナカタカナ"]
    for t in texts:
        assert parse(t, {"__bias__": 0.0}) == [t]


@pytest.mark.usefixtures("ray_session")
def test_ja_segment_registry_step():
    """Actor-pool stage through the step registry: model compiled once per
    actor, list<string> chunks + count appended."""
    import pyarrow as pa
    import ray.data as rd

    from manga_ocr_ray.registry import build_pipeline

    texts = ["これはペンです。", "こんにちは世界", ""]
    ds = rd.from_arrow(pa.table({"doc_id": [1, 2, 3], "text": texts}))
    pipe = build_pipeline([
        {"op": "ja_segment", "in_col": "text", "out_col": "ja_chunks",
         "concurrency": 1},
    ])
    rows = sorted(pipe(ds).take_all(), key=lambda r: r["doc_id"])
    for row, text in zip(rows, texts):
        assert row["ja_chunks"] == parse(text, DEFAULT_JA_MODEL)
        assert row["n_ja_chunks"] == len(row["ja_chunks"])


def test_trigram_features_hand_trained_model():
    """The TW1-TW4 trigram templates (empty in DEFAULT_JA_MODEL) with a small
    hand-trained model: hand-derived golden splits + scalar/vectorized
    equality, so a real BudouX JSON model's trigram weights are exercised
    end-to-end.  Window semantics under test: TW2 = chars (i-2, i-1, i),
    TW3 = (i-1, i, i+1), guards drop a feature whose window leaves the
    string."""
    from manga_ocr_ray.functions.jatok import JaSegmenter

    model = {
        "__bias__": 0.0,
        # break BEFORE the char following 'ABC' (TW1 window i-3..i-1)
        "TW1": {"ABC": 10.0},
        # break AT 'z' when preceded by 'xy' (TW2 window i-2..i)
        "TW2": {"xyz": 10.0},
        # suppress the xyz break when 'q' follows (TW3 window i-1..i+1)
        "TW3": {"yzq": -20.0},
        # break two chars BEFORE a 'END' trigram (TW4 window i..i+2)
        "TW4": {"END": 10.0},
    }
    cases = {
        # TW1: break before 'd' (i=4, window chars 1..3 = 'ABC')... i-3..i-1
        "xABCd": ["xABC", "d"],
        # TW2 fires at i of 'z'
        "wxyzw": ["wxy", "zw"],
        # TW3 veto: 'q' after the z cancels the TW2 vote
        "wxyzq": ["wxyzq"],
        # TW4: break where the NEXT three chars are 'END'; guard keeps the
        # string-final window from firing out of range
        "aaENDbb": ["aa", "ENDbb"],
        # TW1 window needs i>=3: 'ABCx' must NOT break at i=3... it does
        # (window 0..2 in range) but never at i<3
        "ABCx": ["ABC", "x"],
    }
    for text, want in cases.items():
        assert parse(text, model) == want, text
    got = JaSegmenter(model).segment_batch(list(cases))
    assert got == [parse(t, model) for t in cases], "vectorized != scalar"
