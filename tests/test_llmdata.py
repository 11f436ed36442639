"""Round-4 wave 3: token-level eval metrics (WER / token-F1 / BLEU-2),
SemDeDup, DSIR importance weights, JSONL source round-trip.

Each vectorized kernel is pinned against a naive scalar twin here; the
value-level gates are the DuckDB oracles in __ray_entry__ (checked by
scripts/check_oracle.py at sf0.001 and sf0.01).
"""

import re

import numpy as np
import pandas as pd
import pyarrow as pa
import pytest

from manga_ocr_ray.functions.metrics import (
    bleu2_from_partials, bleu_partial_batch, edit_distance_ids,
    token_f1_batch, wer_batch)
from manga_ocr_ray.functions.textstats import TOKEN_PATTERN, tokens_with_parent

_TOK = re.compile(TOKEN_PATTERN)

TEXTS = [
    ("the cat sat on the mat", "the cat sat on the mat"),
    ("the cat sat", "a cat sat down"),
    ("", ""),
    ("hello", ""),
    ("", "world"),
    ("a a a b", "a b b b"),
    ("こんにちは 世界", "こんにちは せかい"),
    ("x1 y2 z3", "z3 y2 x1"),
]


def _tbl():
    return pa.table({
        "conv_id": [f"c{i}" for i in range(len(TEXTS))],
        "turn_idx": list(range(len(TEXTS))),
        "extracted_text": [p for p, _ in TEXTS],
        "expected_text": [r for _, r in TEXTS],
    })


def test_tokens_with_parent_matches_scalar_findall():
    texts = [p for p, _ in TEXTS] + ["日本語abcです123", None]
    tok, par = tokens_with_parent(pa.array(texts, pa.string()))
    got = {}
    for t, p in zip(tok.to_pylist(), par):
        got.setdefault(int(p), []).append(t)
    for i, t in enumerate(texts):
        assert got.get(i, []) == _TOK.findall(t or "")


def test_tokens_with_parent_property_random_unicode():
    """Property: the sentinel tokenizer equals scalar findall on arbitrary
    text INCLUDING embedded NULs (a pre-existing \\x00 acts as one more
    separator — tokens can never span it in either implementation)."""
    from hypothesis import given, settings
    from hypothesis import strategies as st

    alphabet = st.sampled_from(list("ab1 ,.\x00漢かカX-"))

    @settings(max_examples=200, deadline=None)
    @given(st.lists(st.text(alphabet, max_size=30), max_size=8))
    def prop(texts):
        tok, par = tokens_with_parent(pa.array(texts, pa.string()))
        got = {}
        for t, p in zip(tok.to_pylist(), par):
            got.setdefault(int(p), []).append(t)
        for i, t in enumerate(texts):
            assert got.get(i, []) == _TOK.findall(t)

    prop()


def test_wer_batch_matches_scalar_twin():
    out = wer_batch(_tbl()).to_pandas().set_index("turn_idx")

    def ref_wer(p, r):
        pt, rt = _TOK.findall(p), _TOK.findall(r)
        dp = list(range(len(rt) + 1))
        for i, ca in enumerate(pt):
            new = [i + 1]
            for j, cb in enumerate(rt):
                new.append(min(dp[j] + (ca != cb), dp[j + 1] + 1, new[-1] + 1))
            dp = new
        return dp[-1], len(rt)

    assert len(out) == len(TEXTS)  # every pair is under the vocab cap here
    for i, (p, r) in enumerate(TEXTS):
        edits, n_ref = ref_wer(p, r)
        assert out.loc[i, "edits"] == edits, (i, p, r)
        assert out.loc[i, "n_ref"] == n_ref
        assert out.loc[i, "wer"] == pytest.approx(edits / max(n_ref, 1))


def test_wer_vocab_cap_filters_both_sides_identically():
    big = " ".join(f"tok{i}" for i in range(120))  # vocab 120 > 90
    t = pa.table({
        "conv_id": ["a", "b"], "turn_idx": [0, 1],
        "extracted_text": [big, "small text"],
        "expected_text": [big + " extra", "small text"],
    })
    out = wer_batch(t).to_pandas()
    assert out["turn_idx"].tolist() == [1]


def test_token_f1_matches_counter_twin():
    from collections import Counter

    out = token_f1_batch(_tbl()).to_pandas().set_index("turn_idx")
    for i, (p, r) in enumerate(TEXTS):
        cp, cr = Counter(_TOK.findall(p)), Counter(_TOK.findall(r))
        common = sum(min(c, cr[t]) for t, c in cp.items())
        assert out.loc[i, "n_common"] == common
        denom = sum(cp.values()) + sum(cr.values())
        want = 1.0 if denom == 0 else 2.0 * common / denom
        assert out.loc[i, "f1"] == pytest.approx(want)


def test_bleu2_matches_naive_twin():
    from collections import Counter

    parts = bleu_partial_batch(_tbl()).to_pandas().sum()
    m = bleu2_from_partials(parts)

    def grams(toks, n):
        return Counter(tuple(toks[i:i + n]) for i in range(len(toks) - n + 1))

    m1 = t1 = m2 = t2 = plen = rlen = 0
    for p, r in TEXTS:
        pt, rt = _TOK.findall(p), _TOK.findall(r)
        plen += len(pt)
        rlen += len(rt)
        for n in (1, 2):
            gp, gr = grams(pt, n), grams(rt, n)
            match = sum(min(c, gr[g]) for g, c in gp.items())
            tot = max(len(pt) - n + 1, 0)
            if n == 1:
                m1, t1 = m1 + match, t1 + tot
            else:
                m2, t2 = m2 + match, t2 + tot
    import math

    assert (m["match1"], m["total1"], m["match2"], m["total2"]) == (m1, t1, m2, t2)
    bp = 1.0 if plen >= rlen else math.exp(1 - rlen / plen)
    want = bp * math.exp(0.5 * (math.log(m1 / t1) + math.log(m2 / t2)))
    assert m["bleu2"] == pytest.approx(want)
    assert 0.0 < m["bleu2"] < 1.0  # perturbed corpus: metric must move


def test_edit_distance_ids_degenerate():
    assert edit_distance_ids(np.array([], dtype=np.int64),
                             np.array([1, 2])) == 2
    assert edit_distance_ids(np.array([1, 2, 3]),
                             np.array([], dtype=np.int64)) == 3


def test_semdedup_drops_planted_duplicates(ray_session):
    import ray.data as rd
    from manga_ocr_ray.pipelines.llmdata import embedding_semdedup

    rng = np.random.default_rng(11)
    base = rng.standard_normal((40, 16))
    base[25] = base[3] * 1.7          # exact direction dup → cosine 1.0
    base[31] = base[9] + 0.01 * rng.standard_normal(16)  # near dup
    ds = rd.from_pandas(pd.DataFrame({
        "vec_id": np.arange(40, dtype=np.int64),
        "embedding": [v.astype(np.float64) for v in base],
    }))
    out = embedding_semdedup(ds, k=4, tau=0.95).set_index("vec_id")
    assert out.loc[3, "keep"] == 1 and out.loc[25, "keep"] == 0
    assert out.loc[9, "keep"] == 1 and out.loc[31, "keep"] == 0
    # clusters of a vector and its planted dup must agree
    assert out.loc[3, "cluster"] == out.loc[25, "cluster"]


def test_prep_pipeline_filters_before_dedup(ray_session, tmp_path):
    """Composition order is part of the contract: a duplicate whose MIN-id
    copy fails the quality gate must still survive via its larger-id copy
    (filter-first), not be dropped by a dedup-first plan."""
    import pyarrow.parquet as pq
    from manga_ocr_ray.pipelines.llmdata import (
        PREP_SALT, doc_prep_pipeline)
    from manga_ocr_ray.functions.hashing import md5_gate64

    good = "the cat and the dog sat on the mat for a while"
    # doc 0: same text but lang-breaking suffix would change content; instead
    # make min-id copy fail the gate by being German (lang filter)
    rows = pd.DataFrame({
        "doc_id": np.arange(6, dtype=np.int64),
        "text": [
            "der schnelle braune fuchs springt",   # 0: de → dropped
            good,                                   # 1: en dup (min surviving id)
            good,                                   # 2: en dup → deduped
            "xyzzy qwerty plugh",                   # 3: en fallback, ratio 0 → dropped
            good + " again",                        # 4: en unique
            good,                                   # 5: en dup → deduped
        ],
    })
    p = tmp_path / "documents.parquet"
    pq.write_table(pa.Table.from_pandas(rows), p)
    out = doc_prep_pipeline(str(tmp_path)).to_pandas()
    gate = md5_gate64(pa.array(np.arange(6, dtype=np.int64)), PREP_SALT) \
        < np.uint64(int(0.8 * 2**64))
    want = {i for i in (1, 4) if gate[i]}
    assert set(out["doc_id"]) == want
    assert (out["lang_pred"] == "en").all()


def test_ppl_bucket_formula_matches_sql_ntile():
    """The vectorized rank→bucket formula must equal SQL ntile(k) for every
    n mod k, including the uneven first buckets."""
    import duckdb

    from manga_ocr_ray.pipelines import llmdata as L

    k = L.PPL_BUCKETS
    for n in (1, 2, 3, 4, 5, 7, 10, 11):
        want = duckdb.sql(
            f"SELECT ntile({k}) OVER (ORDER BY i) FROM range({n}) t(i)"
        ).df().iloc[:, 0].to_numpy()
        rn = np.arange(1, n + 1)
        base, rem = divmod(n, k)
        big = rem * (base + 1)
        got = np.where(rn <= big,
                       (rn - 1) // max(base + 1, 1) + 1,
                       rem + (rn - big - 1) // max(base, 1) + 1)
        assert (got == want).all(), (n, got, want)


def test_knn_classify_recovers_planted_clusters(ray_session):
    """Queries embedded inside a tight same-label cluster must be assigned
    that label; tie-break path (count desc, label asc) hit via k=2."""
    import ray.data as rd
    from manga_ocr_ray.pipelines.llmdata import embedding_knn_classify

    rng = np.random.default_rng(5)
    centers = rng.standard_normal((3, 12)) * 5
    vecs, labels = [], []
    for i in range(60):
        c = i % 3
        vecs.append(centers[c] + 0.05 * rng.standard_normal(12))
        labels.append(c)
    ds = rd.from_pandas(pd.DataFrame({
        "vec_id": np.arange(60, dtype=np.int64),
        "embedding": [v.astype(np.float64) for v in vecs],
        "label": np.array(labels, dtype=np.int32),
    }))
    out = embedding_knn_classify(ds, k=5, n_queries=6).set_index("query_id")
    for q in range(6):
        assert out.loc[q, "pred_label"] == q % 3


def test_dsir_weights_separate_target_from_offtarget(ray_session):
    import ray.data as rd
    from manga_ocr_ray.pipelines.llmdata import doc_dsir_weights

    target = ["the quick brown fox jumps over the lazy dog"] * 20
    other = ["der schnelle braune fuchs springt faul darüber"] * 20
    df = pd.DataFrame({
        "doc_id": np.arange(40, dtype=np.int64),
        "text": target + other,
        "lang": ["en"] * 20 + ["de"] * 20,
    })
    out = doc_dsir_weights(rd.from_pandas(df)).to_pandas().set_index("doc_id")
    en_w = out.loc[:19, "dsir_logw"].mean()
    de_w = out.loc[20:, "dsir_logw"].mean()
    assert en_w > de_w  # target-like docs must score higher
    assert (out["n_feats"] > 0).all()
