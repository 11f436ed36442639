"""G3 metrics (CER / exact match) and the HLL distinct sketch."""

import numpy as np
import pandas as pd
import pyarrow as pa

from manga_ocr_ray.functions.metrics import cer_metrics, edit_distance
from manga_ocr_ray.stages.sketch import approx_distinct, hll_estimate, hll_partial


def test_edit_distance_known_values():
    assert edit_distance("", "") == 0
    assert edit_distance("abc", "") == 3
    assert edit_distance("", "abc") == 3
    assert edit_distance("kitten", "sitting") == 3
    assert edit_distance("flaw", "lawn") == 2
    assert edit_distance("日本語テスト", "日本語ですと") == 3


def test_edit_distance_matches_reference_dp():
    import random

    def ref(a, b):
        dp = list(range(len(b) + 1))
        for i, ca in enumerate(a):
            new = [i + 1]
            for j, cb in enumerate(b):
                new.append(min(dp[j] + (ca != cb), dp[j + 1] + 1, new[-1] + 1))
            dp = new
        return dp[-1]

    rng = random.Random(7)
    for _ in range(200):
        a = "".join(rng.choice("abcd") for _ in range(rng.randint(0, 10)))
        b = "".join(rng.choice("abcd") for _ in range(rng.randint(0, 10)))
        assert edit_distance(a, b) == ref(a, b)


def test_cer_metrics_distributed(ray_session):
    import ray.data as rd

    df = pd.DataFrame({
        "extracted_text": ["hello", "worl", "exact", "ab"],
        "expected_text": ["hello", "world", "exact", "xy"],
    })
    out = cer_metrics(rd.from_pandas(df))
    assert out["n_turns"] == 4
    assert abs(out["exact_match"] - 0.5) < 1e-12
    # edits: 0 + 1 + 0 + 2 = 3; chars: 5+5+5+2 = 17
    assert abs(out["cer"] - 3 / 17) < 1e-12


def test_hll_accuracy_and_merge():
    rng = np.random.default_rng(3)
    h = rng.integers(0, 2**63, size=50_000, dtype=np.uint64)
    est = hll_estimate(hll_partial(np.tile(h, 2)))  # duplicates don't count
    assert abs(est - 50_000) / 50_000 < 0.05
    merged = np.maximum(hll_partial(h[:30_000]), hll_partial(h[30_000:]))
    assert hll_estimate(merged) == hll_estimate(hll_partial(h))


def test_approx_distinct_events(ray_session):
    import duckdb
    import ray.data as rd

    path = "/root/testdata/sf0.001/events.parquet"
    exact = duckdb.sql(f"select count(distinct user_id) from '{path}'").fetchone()[0]
    est = approx_distinct(rd.read_parquet(path, columns=["user_id"]), "user_id")
    assert abs(est - exact) / exact < 0.05


def test_near_dup_cluster_assign(ray_session):
    import ray.data as rd

    from manga_ocr_ray.stages.dedup import near_dup_cluster_assign

    ds = rd.from_arrow(pa.table({"doc_id": [1, 2, 3, 4, 5]}))
    pairs = pd.DataFrame({"id_a": [1, 2, 4], "id_b": [2, 3, 5]})
    out = {r["doc_id"]: r["cluster_rep"]
           for r in near_dup_cluster_assign(ds, pairs).take_all()}
    assert out == {1: 1, 2: 1, 3: 1, 4: 4, 5: 4}


def test_approx_quantiles_accuracy(ray_session):
    import duckdb
    import ray.data as rd

    from manga_ocr_ray.stages.sketch import approx_quantiles

    path = "/root/testdata/sf0.001/orders.parquet"
    ds = rd.read_parquet(path, columns=["o_totalprice"])
    got = approx_quantiles(ds, "o_totalprice", (0.25, 0.5, 0.75))
    want = duckdb.sql(
        f"select quantile_cont(o_totalprice, [0.25, 0.5, 0.75]) from '{path}'"
    ).fetchone()[0]
    for (q, g), w in zip(sorted(got.items()), want):
        assert abs(g - w) / abs(w) < 0.02, (q, g, w)


def test_histogram_merge_associative():
    from manga_ocr_ray.stages.sketch import histogram_partial, histogram_quantile

    rng = np.random.default_rng(11)
    v = rng.normal(100, 15, size=20_000)
    lo, hi = v.min(), np.nextafter(v.max(), np.inf)
    whole = histogram_partial(v, lo, hi)
    parts = histogram_partial(v[:7000], lo, hi) + histogram_partial(v[7000:], lo, hi)
    assert (whole == parts).all()
    med = histogram_quantile(whole, lo, hi, 0.5)
    assert abs(med - np.quantile(v, 0.5)) < (hi - lo) / 2048 * 2


def test_grouped_approx_quantiles_accuracy(ray_session):
    """Per-group histogram quantiles within (hi-lo)/bins of exact per group."""
    import numpy as np
    import pandas as pd
    import ray.data as rd

    from manga_ocr_ray.stages.sketch import grouped_approx_quantiles

    rng = np.random.Generator(np.random.Philox(key=[3, 7]))
    keys = np.repeat(np.array(["a", "b", "c"]), 4000)
    vals = np.concatenate([
        rng.normal(100, 10, 4000),
        rng.exponential(50, 4000),
        rng.uniform(0, 1000, 4000),
    ])
    pdf = pd.DataFrame({"k": keys, "v": vals})
    ds = rd.from_pandas(pdf).repartition(8)
    got = grouped_approx_quantiles(ds, "k", "v", (0.25, 0.5, 0.75), bins=2048).to_pandas()
    assert sorted(got["k"]) == ["a", "b", "c"]
    for k, sub in pdf.groupby("k"):
        lo, hi = sub["v"].min(), sub["v"].max()
        tol = (hi - lo) / 2048 * 2 + 1e-9
        row = got[got["k"] == k].iloc[0]
        for q, col in ((0.25, "q_25"), (0.5, "q_50"), (0.75, "q_75")):
            exact = np.quantile(sub["v"], q)
            assert abs(row[col] - exact) <= tol, (k, q, row[col], exact)


def test_heavy_hitters_misra_gries(ray_session):
    """MG summary: planted heavy hitters survive the merge with counts
    within the n/capacity undercount bound."""
    import numpy as np
    import pandas as pd
    import ray.data as rd

    from manga_ocr_ray.stages.sketch import heavy_hitters

    rng = np.random.Generator(np.random.Philox(key=[5, 9]))
    n = 40_000
    # two heavy hitters at ~10% and ~5%, the rest a long uniform tail
    tail = rng.integers(1000, 9000, size=n)
    vals = np.where(rng.random(n) < 0.10, 7, np.where(rng.random(n) < 0.05, 13, tail))
    pdf = pd.DataFrame({"v": vals.astype(np.int64)})
    out = heavy_hitters(rd.from_pandas(pdf).repartition(16), "v", k=5, capacity=128)
    top = dict(zip(out["item"], out["est_count"]))
    true7 = int((vals == 7).sum())
    assert 7 in top and top[7] <= true7 and top[7] >= true7 - n // 128
    assert out["item"].iloc[0] == 7  # the heaviest item ranks first


def test_mg_loop_twin_same_bound():
    """The vectorized top-capacity partial and the textbook MG decrement
    loop both respect the n/capacity undercount bound on the same block."""
    from manga_ocr_ray.stages.sketch import mg_partial_loop

    rng = np.random.Generator(np.random.Philox(key=[3, 1]))
    n, cap = 20_000, 64
    vals = np.where(rng.random(n) < 0.2, 5, rng.integers(100, 5000, size=n))
    true5 = int((vals == 5).sum())
    mg = mg_partial_loop(vals, cap)
    assert 5 in mg and true5 - n // cap <= mg[5] <= true5
    uniq, counts = np.unique(vals, return_counts=True)
    order = np.argsort(-counts, kind="stable")[:cap]
    kept = dict(zip(uniq[order], counts[order]))
    assert 5 in kept and true5 - n // cap <= kept[5] <= true5


def test_grouped_approx_distinct_accuracy(ray_session):
    import ray.data as rd

    from manga_ocr_ray.stages.sketch import grouped_approx_distinct

    rng = np.random.default_rng(11)
    n_per = {"a": 50, "b": 1000, "c": 20000}
    frames = [pd.DataFrame({"k": k, "v": rng.integers(0, 10 * n, size=5 * n)})
              for k, n in n_per.items()]
    df = pd.concat(frames, ignore_index=True)
    exact = df.groupby("k")["v"].nunique()
    got = grouped_approx_distinct(
        rd.from_pandas(df).repartition(8), "k", "v") \
        .to_pandas().set_index("k")["approx_distinct"]
    for k in n_per:
        assert abs(got[k] - exact[k]) / exact[k] < 0.05, (k, got[k], exact[k])
    # determinism across block layouts
    got2 = grouped_approx_distinct(
        rd.from_pandas(df).repartition(3), "k", "v") \
        .to_pandas().set_index("k")["approx_distinct"]
    assert got.sort_index().tolist() == got2.sort_index().tolist()


def test_grouped_sketches_int64_key(ray_session):
    """Int-keyed grouped sketches stay int64-typed end-to-end — incl. the
    schema-less empty-partition fallback, which must use the caller-declared
    key_type instead of assuming string (review fix r5)."""
    import pyarrow as pa
    import ray.data as rd

    from manga_ocr_ray.stages.sketch import (grouped_approx_distinct,
                                             grouped_approx_quantiles)

    rng = np.random.default_rng(5)
    df = pd.DataFrame({"k": rng.integers(0, 3, size=3000).astype(np.int64),
                       "v": rng.normal(size=3000)})
    ds = rd.from_pandas(df).repartition(6)
    got_q = grouped_approx_quantiles(ds, "k", "v", (0.5,), bins=512,
                                     key_type=pa.int64()).to_pandas()
    assert got_q["k"].dtype == np.int64 and len(got_q) == 3
    med = df.groupby("k")["v"].median()
    for _, row in got_q.iterrows():
        assert abs(row["q_50"] - med[row["k"]]) < 0.05
    got_d = grouped_approx_distinct(ds, "k", "v", key_type=pa.int64()) \
        .to_pandas()
    assert got_d["k"].dtype == np.int64 and len(got_d) == 3
