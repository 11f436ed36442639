"""Unit pins for the round-3 analytic operators (value-hash equality vs the
DuckDB oracles is checked by scripts/check_oracle.py and the driver gate;
these pin the distributed machinery's invariants)."""

import numpy as np
import pandas as pd
import pytest

SF_DIR = "/root/testdata/sf0.001"


def _ntile_sql_rule(n: int, k: int) -> np.ndarray:
    """SQL NTILE reference: first n%k tiles get ceil(n/k) rows."""
    q, r = divmod(n, k)
    sizes = [q + 1] * r + [q] * (k - r) if q else [1] * n
    return np.repeat(np.arange(1, len(sizes) + 1), sizes)[:n]


@pytest.mark.parametrize("n,k", [(10, 4), (15, 8), (3, 8), (16, 4), (1, 5)])
def test_global_ntile_bucket_rule(ray_session, n, k):
    import ray.data as rd

    from manga_ocr_ray.pipelines.analytic import global_ntile

    ds = rd.from_pandas(pd.DataFrame({"v": np.arange(n)[::-1], "id": np.arange(n)}))
    out = global_ntile(ds, ["v", "id"], k).to_pandas().sort_values("v")
    want = _ntile_sql_rule(n, k)
    np.testing.assert_array_equal(out["tile"].to_numpy(), want)


def test_pack_tokens_invariants(ray_session):
    from manga_ocr_ray.pipelines.documents import (PACK_TOKEN_BUDGET,
                                                   q_doc_pack_tokens)

    out = q_doc_pack_tokens(SF_DIR).to_pandas().sort_values("doc_id")
    # pack ids are the offset-division rule: non-decreasing in doc_id order,
    # and each doc's start offset // budget equals its pack
    start = out["n_tokens"].cumsum() - out["n_tokens"]
    np.testing.assert_array_equal(out["pack_id"].to_numpy(),
                                  (start // PACK_TOKEN_BUDGET).to_numpy())
    assert (np.diff(out["pack_id"].to_numpy()) >= 0).all()


def test_lineitem_corr_matches_numpy(ray_session):
    from manga_ocr_ray.pipelines.analytic import q_lineitem_corr

    got = q_lineitem_corr(SF_DIR).to_pandas().set_index("l_returnflag")
    li = pd.read_parquet(f"{SF_DIR}/lineitem.parquet",
                         columns=["l_returnflag", "l_quantity", "l_extendedprice"])
    for flag, g in li.groupby("l_returnflag"):
        want = np.corrcoef(g["l_quantity"], g["l_extendedprice"])[0, 1]
        assert got.loc[flag, "corr_qty_price"] == pytest.approx(want, abs=1e-9)
        assert got.loc[flag, "n"] == len(g)


def test_rollup_levels_consistent(ray_session):
    from manga_ocr_ray.pipelines.analytic import q_events_rollup

    out = q_events_rollup(SF_DIR)  # returns pandas (driver-side finish)
    fine = out[out["day"].notna()]
    per_type = out[out["day"].isna() & out["event_type"].notna()]
    grand = out[out["event_type"].isna()]
    assert len(grand) == 1
    assert grand["n"].iloc[0] == fine["n"].sum()
    merged = fine.groupby("event_type")["n"].sum().rename("fine_n").reset_index() \
                 .merge(per_type[["event_type", "n"]], on="event_type")
    assert (merged["fine_n"] == merged["n"]).all()


def test_stratified_sample_deterministic_and_rate(ray_session):
    from manga_ocr_ray.pipelines.documents import q_doc_stratified_sample

    a = q_doc_stratified_sample(SF_DIR).to_pandas().sort_values("doc_id")
    b = q_doc_stratified_sample(SF_DIR).to_pandas().sort_values("doc_id")
    pd.testing.assert_frame_equal(a.reset_index(drop=True), b.reset_index(drop=True))
    docs = pd.read_parquet(f"{SF_DIR}/documents.parquet", columns=["doc_id", "lang"])
    en_total = (docs["lang"] == "en").sum()
    en_kept = (a["lang"] == "en").sum()
    # binomial(n, 0.5): allow 4 sigma
    assert abs(en_kept - 0.5 * en_total) < 4 * np.sqrt(en_total * 0.25) + 1


def test_decontaminate_flags_planted_leak(ray_session):
    import ray.data as rd

    from manga_ocr_ray.stages.dedup import decontaminate

    bench = pd.DataFrame({"doc_id": [0], "text": ["the secret eval question here"]})
    corpus = pd.DataFrame({
        "doc_id": [1, 2, 3],
        "text": ["contains the secret eval question verbatim",   # leaked 3-gram
                 "totally unrelated text about other things",
                 ""],                                            # empty doc
    })
    out = decontaminate(rd.from_pandas(corpus), rd.from_pandas(bench)) \
        .to_pandas().sort_values("doc_id")
    assert out["contaminated"].tolist() == [1, 0, 0]


# ---- bloom-filter semi-join machinery (stages/bloomjoin.py) ----------------

def test_bloom_no_false_negatives_and_low_fp():
    from manga_ocr_ray.stages.bloomjoin import (_probe_positions, _set_bits,
                                                _test_bits, bloom_params)

    rng = np.random.default_rng(7)
    keys = rng.choice(10_000_000, size=5000, replace=False).astype(np.int64)
    m, k = bloom_params(len(keys))
    words = np.zeros(m // 64, dtype=np.uint64)
    _set_bits(words, _probe_positions(keys, m, k))
    # every inserted key must test positive
    assert _test_bits(words, _probe_positions(keys, m, k)).all()
    # false-positive rate on disjoint probes stays near the design point
    probes = np.setdiff1d(rng.choice(10_000_000, size=20000, replace=False)
                          .astype(np.int64), keys)
    fp = _test_bits(words, _probe_positions(probes, m, k)).mean()
    assert fp < 0.02, fp   # 12 bits/key designs for ~0.03%


def test_bloom_semi_join_exact(ray_session):
    import ray.data as rd

    from manga_ocr_ray.stages.bloomjoin import bloom_semi_join

    rng = np.random.default_rng(3)
    fact = pd.DataFrame({"fk": rng.integers(0, 500, size=4000), "v": np.arange(4000)})
    keyset = pd.DataFrame({"k": np.arange(0, 500, 7)})
    out = bloom_semi_join(rd.from_pandas(fact), "fk",
                          rd.from_pandas(keyset), "k",
                          num_partitions=4).to_pandas()
    want = fact[fact["fk"].isin(set(keyset["k"]))]
    assert sorted(out["v"]) == sorted(want["v"])   # exact despite bloom FPs


def test_q17_matches_naive(ray_session):
    from manga_ocr_ray.pipelines.analytic import q17_avg_yearly

    got = q17_avg_yearly(SF_DIR)["avg_yearly"].iloc[0]
    li = pd.read_parquet(f"{SF_DIR}/lineitem.parquet")
    part = pd.read_parquet(f"{SF_DIR}/part.parquet")
    sub = li.merge(part[part["p_brand"] == "Brand#23"][["p_partkey"]],
                   left_on="l_partkey", right_on="p_partkey")
    avg = sub.groupby("l_partkey")["l_quantity"].transform("mean")
    want = sub.loc[sub["l_quantity"] < 0.2 * avg, "l_extendedprice"].sum() / 7.0
    assert got == pytest.approx(want, rel=1e-9)


def test_inverted_index_postings_sorted(ray_session):
    from manga_ocr_ray.pipelines.documents import q_doc_inverted_index

    out = q_doc_inverted_index(SF_DIR).to_pandas()
    assert (out["df"] > 0).all()
    for _, row in out.head(50).iterrows():
        ids = [int(x) for x in row["postings"].split(",")]
        assert ids == sorted(ids) and len(ids) == row["df"]
        assert len(set(ids)) == len(ids)


def test_active_days_matches_pandas(ray_session):
    from manga_ocr_ray.pipelines.analytic import q_events_user_active_days

    got = q_events_user_active_days(SF_DIR).to_pandas() \
        .sort_values("user_id").reset_index(drop=True)
    ev = pd.read_parquet(f"{SF_DIR}/events.parquet", columns=["user_id", "ts"])
    ev["day"] = ev["ts"].dt.normalize()
    want = ev.groupby("user_id").agg(n_days=("day", "nunique"),
                                     n_events=("ts", "size")).reset_index()
    pd.testing.assert_frame_equal(
        got, want.astype({"n_days": "int64", "n_events": "int64"}))


def test_cohort_retention_matches_pandas(ray_session):
    from manga_ocr_ray.pipelines.analytic import q_events_cohort_retention

    got = q_events_cohort_retention(SF_DIR).to_pandas() \
        .sort_values(["cohort_day", "day_offset"]).reset_index(drop=True)
    ev = pd.read_parquet(f"{SF_DIR}/events.parquet", columns=["user_id", "ts"])
    ev["day"] = ev["ts"].dt.floor("D")
    first = ev.groupby("user_id")["day"].min().rename("cohort")
    ev = ev.join(first, on="user_id")
    ev["day_offset"] = (ev["day"] - ev["cohort"]).dt.days
    want = ev.drop_duplicates(["cohort", "day_offset", "user_id"]) \
             .groupby(["cohort", "day_offset"]).size().rename("n_users").reset_index()
    want["cohort_day"] = want["cohort"].dt.strftime("%Y-%m-%d")
    want = want[["cohort_day", "day_offset", "n_users"]] \
        .sort_values(["cohort_day", "day_offset"]).reset_index(drop=True)
    pd.testing.assert_frame_equal(got, want.astype({"day_offset": "int64",
                                                    "n_users": "int64"}))


def test_freq_spectrum_mass_conservation(ray_session):
    from manga_ocr_ray.pipelines.documents import (q_doc_token_count,
                                                   q_doc_token_freq_spectrum)

    spec = q_doc_token_freq_spectrum(SF_DIR).to_pandas()
    total_from_spec = (spec["freq"] * spec["n_tokens"]).sum()
    total_tokens = q_doc_token_count(SF_DIR).to_pandas()["n_tokens"].sum()
    assert total_from_spec == total_tokens   # sum_k k·S(k) == corpus tokens


def test_skew_join_equals_plain_join(ray_session):
    import ray.data as rd

    from manga_ocr_ray.stages.skewjoin import detect_hot_keys, skew_join_fact_dim

    rng = np.random.default_rng(5)
    # one celebrity key (40% of rows) + uniform tail
    keys = np.where(rng.random(8000) < 0.4, 7, rng.integers(0, 200, size=8000))
    fact = pd.DataFrame({"fk": keys, "v": np.arange(8000)})
    dim = pd.DataFrame({"k": np.arange(200), "name": [f"d{i}" for i in range(200)]})

    hot = detect_hot_keys(rd.from_pandas(fact).repartition(8), "fk", hot_frac=0.05)
    assert 7 in hot                      # the celebrity is detected
    out = skew_join_fact_dim(rd.from_pandas(fact).repartition(8), "fk",
                             rd.from_pandas(dim), "k",
                             num_partitions=4, hot_frac=0.05).to_pandas()
    want = fact.merge(dim, left_on="fk", right_on="k").drop(columns=["k"])
    pd.testing.assert_frame_equal(
        out.sort_values("v").reset_index(drop=True)[["fk", "v", "name"]],
        want.sort_values("v").reset_index(drop=True)[["fk", "v", "name"]])


def test_funnel_strict_order_semantics(ray_session):
    """view→click→purchase must happen in strictly increasing ts order:
    a click BEFORE the first view doesn't count, a purchase between view
    and click doesn't count, equal timestamps don't advance (strict >)."""
    import ray.data as rd
    from manga_ocr_ray.pipelines.analytic import q_events_funnel  # noqa: F401 (import path pin)
    from manga_ocr_ray.pipelines.relational import _shard_by_int  # noqa: F401

    t0 = pd.Timestamp("2024-01-01")
    m = pd.Timedelta(minutes=1)
    rows = []
    # u1 completes in order → 3
    rows += [(1, t0, "view"), (1, t0 + m, "click"), (1, t0 + 2 * m, "purchase")]
    # u2: click before view, purchase after view → stage 1 (click never after view)
    rows += [(2, t0, "click"), (2, t0 + m, "view"), (2, t0 + 2 * m, "purchase")]
    # u3: purchase between view and click → stage 2
    rows += [(3, t0, "view"), (3, t0 + m, "purchase"), (3, t0 + 2 * m, "click")]
    # u4: click at SAME ts as view → strict > means no advance → stage 1
    rows += [(4, t0, "view"), (4, t0, "click")]
    # u5: only error events → stage 0
    rows += [(5, t0, "error")]
    # u6: second view later, click between the views → stage 2 via FIRST view
    rows += [(6, t0, "view"), (6, t0 + m, "click"), (6, t0 + 2 * m, "view")]
    df = pd.DataFrame(rows, columns=["user_id", "ts", "event_type"])

    from manga_ocr_ray.pipelines import analytic as A

    out = (_shard_by_int(rd.from_pandas(df), "user_id")
           .groupby("shard")
           .map_groups(A._funnel_shard, batch_format="pandas")
           .to_pandas().set_index("user_id")["stage"].sort_index())
    assert out.to_dict() == {1: 3, 2: 1, 3: 2, 4: 1, 5: 0, 6: 2}


def test_quality_gate_drops_bottom_decile(ray_session):
    from manga_ocr_ray.pipelines.documents import q_doc_quality_gate

    out = q_doc_quality_gate(SF_DIR).to_pandas()
    import duckdb
    n = duckdb.sql(
        f"SELECT count(*) FROM '/root/testdata/sf0.001/documents.parquet'"
    ).fetchone()[0]
    assert len(out) == n - int(n * 0.10)
    assert out["rn"].min() == int(n * 0.10) + 1


def test_bm25_matches_scalar_replica(ray_session, tmp_path):
    """Distributed BM25 == an independent per-doc scalar computation."""
    import math
    import pyarrow.parquet as pq
    import pyarrow as pa
    from manga_ocr_ray.pipelines.documents import (
        BM25_B, BM25_K1, BM25_TERMS, q_doc_bm25)
    from manga_ocr_ray.functions.textstats import TOKEN_PATTERN
    import re

    docs = {
        1: "table merge fast hash table table",
        2: "slow scan row value merge",
        3: "nothing relevant here at all",
        4: "hash hash hash hash hash hash hash hash",
    }
    pq.write_table(pa.table({"doc_id": list(docs), "text": list(docs.values())}),
                   str(tmp_path / "documents.parquet"))

    out = q_doc_bm25(str(tmp_path)).to_pandas().set_index("doc_id")["bm25"]

    tok = re.compile(TOKEN_PATTERN)
    toks = {d: tok.findall(t) for d, t in docs.items()}
    n = len(docs)
    avgdl = sum(len(v) for v in toks.values()) / n
    df = {t: sum(1 for v in toks.values() if t in v) for t in BM25_TERMS}
    want = {}
    for d, v in toks.items():
        s = 0.0
        for t in BM25_TERMS:
            tf = v.count(t)
            if tf == 0:
                continue
            idf = math.log((n - df[t] + 0.5) / (df[t] + 0.5) + 1.0)
            s += idf * tf * (BM25_K1 + 1) / (
                tf + BM25_K1 * (1 - BM25_B + BM25_B * len(v) / avgdl))
        if s:
            want[d] = s
    assert set(out.index) == set(want)
    for d in want:
        assert abs(out[d] - want[d]) < 1e-9, d


def test_trailing_hour_equal_ts_peers_and_user_walls():
    """RANGE-frame semantics: equal-ts peers are BOTH in each other's frame
    (value-based edge, unlike a ROWS frame) and frames never cross users."""
    import numpy as np
    import pandas as pd

    from manga_ocr_ray.pipelines.analytic import _trailing_hour_shard

    t0 = pd.Timestamp("2024-01-01")
    h = pd.Timedelta(hours=1)
    g = pd.DataFrame({
        "event_id": [1, 2, 3, 4, 5],
        "user_id":  [7, 7, 7, 7, 9],
        # u7: two equal-ts peers, one event exactly 1h later (inclusive edge),
        # one 2h later (out of frame); u9 shares ts with u7's first pair.
        "ts": [t0, t0, t0 + h, t0 + 2 * h, t0],
        "value": [1.00, 2.00, 4.00, 8.00, 16.00],
    })
    out = _trailing_hour_shard(g).set_index("event_id")
    assert out.loc[1, "n_1h"] == 2 and out.loc[2, "n_1h"] == 2  # peers see each other
    assert out.loc[1, "sum_1h"] == 3.00
    assert out.loc[3, "n_1h"] == 3 and out.loc[3, "sum_1h"] == 7.00  # 1h edge inclusive
    assert out.loc[4, "n_1h"] == 2 and out.loc[4, "sum_1h"] == 12.00
    assert out.loc[5, "n_1h"] == 1 and out.loc[5, "sum_1h"] == 16.00  # user wall
    assert out["n_1h"].dtype == np.int64


def test_line_dedup_drops_cross_doc_and_within_doc_dups(ray_session):
    """C4 semantics on a hand corpus: a line occurring in two docs is dropped
    from both; a line occurring twice in ONE doc is dropped too; a doc whose
    every line is duplicated vanishes."""
    import pyarrow as pa

    from manga_ocr_ray.pipelines.documents import TOKENS_PER_LINE, _lines_batch

    w = " ".join(["tok%d" % i for i in range(TOKENS_PER_LINE)])  # line A
    u = " ".join(["unq%d" % i for i in range(TOKENS_PER_LINE)])  # line B
    t = pa.table({"doc_id": pa.array([1, 2, 3], pa.int64()),
                  "text": [w + " " + u,      # doc1: A + B
                           w + " " + w,      # doc2: A + A (within-doc dup)
                           w]})              # doc3: A only → vanishes
    lines = _lines_batch(t).to_pandas()
    assert len(lines) == 5
    counts = lines.groupby("line").size()
    survivors = lines[lines["line"].map(counts) == 1]
    assert survivors["doc_id"].tolist() == [1] and survivors["line"].tolist() == [u]


def test_skew_kurt_matches_direct_formula(ray_session):
    from manga_ocr_ray.pipelines.analytic import q_lineitem_skew_kurt

    got = q_lineitem_skew_kurt(SF_DIR).to_pandas().set_index("l_returnflag")
    li = pd.read_parquet(f"{SF_DIR}/lineitem.parquet",
                         columns=["l_returnflag", "l_extendedprice"])
    for flag, g in li.groupby("l_returnflag"):
        x = g["l_extendedprice"].to_numpy(dtype=np.float64)
        n, mu = len(x), x.mean()
        s = x.std(ddof=1)
        z = (x - mu) / s
        skew = n / ((n - 1) * (n - 2)) * (z**3).sum()
        kurt = (n * (n + 1) / ((n - 1) * (n - 2) * (n - 3)) * (z**4).sum()
                - 3 * (n - 1) ** 2 / ((n - 2) * (n - 3)))
        assert got.loc[flag, "n"] == n
        assert got.loc[flag, "skew_price"] == pytest.approx(skew, abs=1e-9)
        assert got.loc[flag, "kurt_price"] == pytest.approx(kurt, abs=1e-9)


def test_price_histogram_partials_sum_exactly(ray_session):
    from manga_ocr_ray.pipelines.analytic import q_orders_price_histogram

    got = q_orders_price_histogram(SF_DIR).to_pandas().sort_values("bin")
    prices = pd.read_parquet(f"{SF_DIR}/orders.parquet",
                             columns=["o_totalprice"])["o_totalprice"]
    want = (np.round(prices * 100).astype(np.int64) // 2000000).value_counts().sort_index()
    np.testing.assert_array_equal(got["bin"].to_numpy(), want.index.to_numpy())
    np.testing.assert_array_equal(got["n_orders"].to_numpy(), want.to_numpy())
    assert got["n_orders"].sum() == len(prices)
    np.testing.assert_allclose(got["bin_lo"].to_numpy(),
                               got["bin"].to_numpy() * 20000.0)


def test_zipf_slope_matches_polyfit(ray_session):
    from manga_ocr_ray.functions.textstats import TOKEN_PATTERN
    from manga_ocr_ray.pipelines.documents import q_doc_zipf_slope

    got = q_doc_zipf_slope(SF_DIR)
    docs = pd.read_parquet(f"{SF_DIR}/documents.parquet", columns=["text"])
    tf = (docs["text"].str.findall(TOKEN_PATTERN).explode().dropna()
          .value_counts().rename_axis("token").reset_index(name="freq"))
    # deterministic (freq desc, token asc) cut, exactly like the query/oracle
    tf = tf.sort_values(["freq", "token"], ascending=[False, True])
    freqs = tf["freq"].to_numpy(dtype=np.float64)[:100]
    slope = np.polyfit(np.log(np.arange(1, len(freqs) + 1)), np.log(freqs), 1)[0]
    assert got["n_terms"].iloc[0] == len(freqs)
    assert got["zipf_slope"].iloc[0] == pytest.approx(slope, abs=1e-9)
    assert got["zipf_slope"].iloc[0] < 0  # frequencies decay with rank


def test_percentiles_2pass_match_numpy_interpolation(ray_session):
    from manga_ocr_ray.pipelines.analytic import q_orders_percentiles_2pass

    got = q_orders_percentiles_2pass(SF_DIR)
    x = np.sort(pd.read_parquet(f"{SF_DIR}/orders.parquet",
                                columns=["o_totalprice"])["o_totalprice"]
                .to_numpy(dtype=np.float64))
    assert got["n"].iloc[0] == len(x)
    for q, name in ((0.25, "p25"), (0.5, "p50"), (0.75, "p75")):
        pos = (len(x) - 1) * q
        lo, hi = int(np.floor(pos)), int(np.ceil(pos))
        want = x[lo] + (pos - lo) * (x[hi] - x[lo])
        assert got[name].iloc[0] == pytest.approx(want, abs=1e-9)


def test_mutual_info_direct_and_nonnegative(ray_session):
    from manga_ocr_ray.pipelines.analytic import q_events_type_hour_mi

    got = q_events_type_hour_mi(SF_DIR)
    ev = pd.read_parquet(f"{SF_DIR}/events.parquet", columns=["event_type", "ts"])
    c = (ev.assign(hr=ev["ts"].dt.hour)
           .groupby(["event_type", "hr"]).size().rename("n").reset_index())
    n = c["n"].to_numpy(dtype=np.float64)
    t = n.sum()
    nx = c.groupby("event_type")["n"].transform("sum").to_numpy(dtype=np.float64)
    ny = c.groupby("hr")["n"].transform("sum").to_numpy(dtype=np.float64)
    want = (n / t * np.log(n * t / (nx * ny))).sum()
    assert got["n_events"].iloc[0] == int(t)
    assert got["mi_nats"].iloc[0] == pytest.approx(want, abs=1e-12)
    assert got["mi_nats"].iloc[0] >= -1e-12  # MI is non-negative


def test_chi2_matches_direct_contingency(ray_session):
    from manga_ocr_ray.pipelines.analytic import q_events_type_dow_chi2

    got = q_events_type_dow_chi2(SF_DIR)
    ev = pd.read_parquet(f"{SF_DIR}/events.parquet", columns=["event_type", "ts"])
    grid = (ev.assign(dow=ev["ts"].dt.dayofweek + 1)
              .groupby(["event_type", "dow"]).size().unstack(fill_value=0)
              .reindex(columns=range(1, 8), fill_value=0)
              .to_numpy(dtype=np.float64))
    total = grid.sum()
    e = np.outer(grid.sum(axis=1), grid.sum(axis=0)) / total
    want = ((grid - e) ** 2 / e).sum()
    assert got["n_events"].iloc[0] == int(total)
    assert got["chi2"].iloc[0] == pytest.approx(want, abs=1e-9)
    assert got["dof"].iloc[0] == (grid.shape[0] - 1) * 6
    assert got["chi2"].iloc[0] >= 0.0


def test_source_concentration_matches_direct(ray_session):
    from manga_ocr_ray.pipelines.documents import q_doc_source_concentration

    got = q_doc_source_concentration(SF_DIR)
    d = pd.read_parquet(f"{SF_DIR}/documents.parquet", columns=["source"])
    s = d["source"].value_counts(normalize=True).to_numpy(dtype=np.float64)
    assert got["n_docs"].iloc[0] == len(d)
    assert got["n_sources"].iloc[0] == len(s)
    assert got["hhi"].iloc[0] == pytest.approx((s ** 2).sum(), abs=1e-12)
    assert got["top_share"].iloc[0] == pytest.approx(s.max(), abs=1e-12)
    want_h = -(s * np.log(s)).sum() / np.log(len(s))
    assert got["entropy_norm"].iloc[0] == pytest.approx(want_h, abs=1e-12)
    # concentration bounds: 1/k <= hhi <= 1, 0 <= normalized entropy <= 1
    assert 1.0 / len(s) - 1e-12 <= got["hhi"].iloc[0] <= 1.0 + 1e-12
    assert -1e-12 <= got["entropy_norm"].iloc[0] <= 1.0 + 1e-12


def test_winsorized_mean_matches_direct(ray_session):
    from manga_ocr_ray.pipelines.analytic import q_lineitem_winsorized_mean

    got = q_lineitem_winsorized_mean(SF_DIR)
    p = pd.read_parquet(f"{SF_DIR}/lineitem.parquet",
                        columns=["l_extendedprice"])["l_extendedprice"]
    cents = np.sort(np.round(p.to_numpy() * 100).astype(np.int64))
    n = len(cents)
    lo = cents[int(np.ceil(n * 0.05)) - 1]   # smallest with cum count >= ceil
    hi = cents[int(np.ceil(n * 0.95)) - 1]
    want = np.clip(cents, lo, hi).sum() / 100.0 / n
    assert got["n"].iloc[0] == n
    assert got["p5"].iloc[0] == pytest.approx(lo / 100.0, abs=1e-9)
    assert got["p95"].iloc[0] == pytest.approx(hi / 100.0, abs=1e-9)
    assert got["wmean"].iloc[0] == pytest.approx(want, abs=1e-9)
    assert got["p5"].iloc[0] <= got["wmean"].iloc[0] <= got["p95"].iloc[0]


def test_corr_matrix_matches_numpy(ray_session):
    from manga_ocr_ray.pipelines.analytic import q_lineitem_corr_matrix

    got = q_lineitem_corr_matrix(SF_DIR)
    li = pd.read_parquet(f"{SF_DIR}/lineitem.parquet",
                         columns=["l_quantity", "l_extendedprice",
                                  "l_discount", "l_tax"])
    want = np.corrcoef(li.to_numpy(dtype=np.float64), rowvar=False)
    names = ["qty", "price", "disc", "tax"]
    assert got["n"].iloc[0] == len(li)
    for i, a in enumerate(names):
        for j in range(i + 1, 4):
            assert got[f"corr_{a}_{names[j]}"].iloc[0] == pytest.approx(
                want[i, j], abs=1e-10)


def test_user_skew_matches_direct_ranking(ray_session):
    from manga_ocr_ray.pipelines.analytic import q_events_user_skew

    got = q_events_user_skew(SF_DIR)
    ev = pd.read_parquet(f"{SF_DIR}/events.parquet", columns=["user_id"])
    counts = np.sort(ev["user_id"].value_counts().to_numpy())
    k, n = len(counts), counts.sum()
    assert got["n_users"].iloc[0] == k and got["n_events"].iloc[0] == n
    assert got["median_per_user"].iloc[0] == counts[int(np.ceil(0.5 * k)) - 1]
    assert got["p99_per_user"].iloc[0] == counts[int(np.ceil(0.99 * k)) - 1]
    k1 = int(np.ceil(0.01 * k))
    want_share = counts[::-1][:k1].sum() / n  # ties hold equal counts
    assert got["top1pct_share"].iloc[0] == pytest.approx(want_share, abs=1e-12)
    assert got["top1pct_share"].iloc[0] >= k1 / k - 1e-12  # skew >= uniform


def test_top3_per_user_matches_pandas_rank(ray_session):
    from manga_ocr_ray.pipelines.analytic import q_events_top3_per_user

    got = (q_events_top3_per_user(SF_DIR).to_pandas()
           .sort_values(["user_id", "rnk"]).reset_index(drop=True))
    ev = pd.read_parquet(f"{SF_DIR}/events.parquet",
                         columns=["user_id", "event_id", "value"])
    want = ev.sort_values(["user_id", "value", "event_id"],
                          ascending=[True, False, True])
    want = want.groupby("user_id", sort=False).head(3).copy()
    want["rnk"] = (want.groupby("user_id", sort=False).cumcount() + 1)
    want = want.sort_values(["user_id", "rnk"]).reset_index(drop=True)
    pd.testing.assert_frame_equal(
        got[["user_id", "event_id", "value", "rnk"]].astype({"rnk": "int64"}),
        want[["user_id", "event_id", "value", "rnk"]].astype({"rnk": "int64"}))
    assert (got.groupby("user_id").size() <= 3).all()


def test_role_transitions_match_pandas_lead(ray_session):
    import __ray_entry__ as E

    got = (E._q_transcript_role_transitions(SF_DIR).to_pandas()
           .sort_values(["from_role", "to_role"]).reset_index(drop=True))
    tr = pd.read_parquet(f"{E._oracle_corpus()}/transcripts.parquet",
                         columns=["conv_id", "turn_idx", "role"])
    tr = tr.sort_values(["conv_id", "turn_idx"])
    nxt = tr.groupby("conv_id")["role"].shift(-1)
    want = (pd.DataFrame({"from_role": tr["role"], "to_role": nxt})
            .dropna().groupby(["from_role", "to_role"]).size()
            .rename("n_pairs").reset_index()
            .sort_values(["from_role", "to_role"]).reset_index(drop=True))
    pd.testing.assert_frame_equal(got, want, check_dtype=False)
    # every turn except each conversation's last contributes exactly one pair
    n_convs = tr["conv_id"].nunique()
    assert got["n_pairs"].sum() == len(tr) - n_convs


def test_table_checksum_order_invariant_and_content_sensitive(ray_session):
    import hashlib

    from manga_ocr_ray.pipelines.documents import q_doc_table_checksum

    got = q_doc_table_checksum(SF_DIR)
    docs = pd.read_parquet(f"{SF_DIR}/documents.parquet",
                           columns=["doc_id", "text"])
    v = np.uint64(0)
    # fold in a shuffled order — XOR must not care
    for _, row in docs.sample(frac=1.0, random_state=0).iterrows():
        h = hashlib.md5(f"{row.doc_id}|{row.text}".encode()).hexdigest()[:16]
        v ^= np.uint64(int(h, 16))
    assert got["checksum_hex"].iloc[0] == f"{int(v):016x}"
    assert got["n_rows"].iloc[0] == len(docs)
    # flipping one character flips the checksum
    h0 = hashlib.md5(f"{docs.doc_id.iloc[0]}|{docs.text.iloc[0]}".encode()) \
        .hexdigest()[:16]
    h1 = hashlib.md5(f"{docs.doc_id.iloc[0]}|{docs.text.iloc[0]}X".encode()) \
        .hexdigest()[:16]
    assert (v ^ np.uint64(int(h0, 16)) ^ np.uint64(int(h1, 16))) != v


def test_grouping_sets_totals_consistent(ray_session):
    from manga_ocr_ray.pipelines.analytic import q_events_grouping_sets

    out = q_events_grouping_sets(SF_DIR)
    ev = pd.read_parquet(f"{SF_DIR}/events.parquet", columns=["event_type", "ts"])
    per_type = out[out["event_type"].notna()]
    per_dow = out[out["event_type"].isna()]
    assert per_type["n"].sum() == len(ev) == per_dow["n"].sum()
    want_types = ev["event_type"].value_counts()
    for _, row in per_type.iterrows():
        assert row["n"] == want_types[row["event_type"]]
        assert np.isnan(row["dow"])
    # pandas dayofweek is Mon=0; isodow is Mon=1..Sun=7
    want_dow = (ev["ts"].dt.dayofweek + 1).value_counts()
    for _, row in per_dow.iterrows():
        assert row["n"] == want_dow[int(row["dow"])]


def test_strip_ratio_orders_kinds_sensibly(ray_session):
    import __ray_entry__ as E

    out = (E._q_transcript_strip_ratio(SF_DIR).to_pandas()
           .set_index("tool"))
    # html payloads carry the most boilerplate; plain turns the least
    assert out.loc["html", "strip_ratio"] > out.loc["", "strip_ratio"]
    assert (out["strip_ratio"] > 0).all() and (out["strip_ratio"] < 1).all()
    assert (out["extracted_chars"] <= out["raw_chars"]).all()


def test_weighted_median_matches_direct(ray_session):
    from manga_ocr_ray.pipelines.analytic import q_lineitem_weighted_median

    got = q_lineitem_weighted_median(SF_DIR).set_index("l_returnflag")
    li = pd.read_parquet(f"{SF_DIR}/lineitem.parquet",
                         columns=["l_returnflag", "l_extendedprice", "l_quantity"])
    for flag, g in li.groupby("l_returnflag"):
        g = g.sort_values("l_extendedprice")
        w = np.round(g["l_quantity"].to_numpy()).astype(np.int64)
        cw = w.cumsum()
        want = g["l_extendedprice"].to_numpy()[np.flatnonzero(cw >= cw[-1] / 2.0)[0]]
        assert got.loc[flag, "wmedian_price"] == pytest.approx(want, abs=1e-9)
        assert got.loc[flag, "total_qty"] == cw[-1]


def test_weighted_quartiles_match_direct(ray_session):
    from manga_ocr_ray.pipelines.analytic import q_lineitem_weighted_quartiles

    got = q_lineitem_weighted_quartiles(SF_DIR).set_index("l_returnflag")
    li = pd.read_parquet(f"{SF_DIR}/lineitem.parquet",
                         columns=["l_returnflag", "l_extendedprice", "l_quantity"])
    for flag, g in li.groupby("l_returnflag"):
        g = g.sort_values("l_extendedprice")
        w = np.round(g["l_quantity"].to_numpy()).astype(np.int64)
        cw = w.cumsum()
        prices = g["l_extendedprice"].to_numpy()
        for q, col in ((0.25, "wp25"), (0.50, "wp50"), (0.75, "wp75")):
            want = prices[np.flatnonzero(cw >= cw[-1] * q)[0]]
            assert got.loc[flag, col] == pytest.approx(want, abs=1e-9)
        # the grouped multi-threshold path agrees with the single-threshold
        # weighted median at q=0.5 by construction
        assert got.loc[flag, "total_qty"] == cw[-1]
        assert got.loc[flag, "wp25"] <= got.loc[flag, "wp50"] <= got.loc[flag, "wp75"]


def test_ks_statistic_matches_direct_ecdf(ray_session):
    from manga_ocr_ray.pipelines.analytic import q_doc_length_ks

    got = q_doc_length_ks(SF_DIR)
    d = pd.read_parquet(f"{SF_DIR}/documents.parquet", columns=["lang", "n_chars"])
    a = np.sort(d.loc[d["lang"] == "en", "n_chars"].to_numpy())
    b = np.sort(d.loc[d["lang"] != "en", "n_chars"].to_numpy())
    grid = np.unique(np.concatenate([a, b]))
    fa = np.searchsorted(a, grid, side="right") / len(a)
    fb = np.searchsorted(b, grid, side="right") / len(b)
    assert got["ks_stat"].iloc[0] == pytest.approx(np.abs(fa - fb).max(), abs=1e-12)
    assert got["n_en"].iloc[0] == len(a) and got["n_other"].iloc[0] == len(b)
    assert 0.0 <= got["ks_stat"].iloc[0] <= 1.0


def test_token_triangles_match_direct_enumeration(ray_session):
    from itertools import combinations

    from manga_ocr_ray.functions.textstats import TOKEN_PATTERN
    from manga_ocr_ray.pipelines.documents import q_doc_token_triangles

    got = q_doc_token_triangles(SF_DIR)["n_triangles"].iloc[0]
    docs = pd.read_parquet(f"{SF_DIR}/documents.parquet", columns=["text"])
    edges = set()
    for toks in docs["text"].str.findall(TOKEN_PATTERN):
        for x, y in zip(toks, toks[1:]):
            if x != y:
                edges.add((min(x, y), max(x, y)))
    adj = {}
    for u, v in edges:
        adj.setdefault(u, set()).add(v)
        adj.setdefault(v, set()).add(u)
    want = sum(1 for u, v in edges
               for w in adj[u] & adj[v] if v < w)
    assert got == want


def test_source_jaccard_matches_direct_sets(ray_session):
    from manga_ocr_ray.functions.textstats import TOKEN_PATTERN
    from manga_ocr_ray.pipelines.documents import q_source_vocab_jaccard

    got = q_source_vocab_jaccard(SF_DIR).set_index(["source_a", "source_b"])
    docs = pd.read_parquet(f"{SF_DIR}/documents.parquet",
                           columns=["source", "text"])
    vocab = {s: set(g["text"].str.findall(TOKEN_PATTERN).explode().dropna())
             for s, g in docs.groupby("source")}
    checked = 0
    for (a, b), row in got.iterrows():
        inter = len(vocab[a] & vocab[b])
        assert a < b and row["n_common"] == inter
        assert row["jaccard"] == pytest.approx(
            inter / len(vocab[a] | vocab[b]), abs=1e-12)
        checked += 1
    # every intersecting pair present exactly once
    want_pairs = sum(1 for a, b in __import__("itertools").combinations(sorted(vocab), 2)
                     if vocab[a] & vocab[b])
    assert checked == want_pairs


def test_conv_dedup_rep_mapping_and_planted_duplicate(ray_session):
    import pyarrow as pa

    import ray.data as rd
    import __ray_entry__ as E
    from ray.data.aggregate import Min
    from manga_ocr_ray.functions.hashing import content_hash128

    out = E._q_transcript_conv_dedup(SF_DIR).to_pandas()
    # rep is the minimum of its content group → never larger than the member,
    # and a representative always represents itself
    assert (out["rep_conv"] <= out["conv_id"]).all()
    reps = set(out["rep_conv"])
    rep_rows = out[out["conv_id"].isin(reps)]
    assert (rep_rows["rep_conv"] == rep_rows["conv_id"]).all()

    # planted duplicate: two conv_ids with identical merged text collapse to
    # the smaller id through the same hash→min-rep chain the query runs
    merged = pd.DataFrame({"conv_id": ["c1", "c2", "c3"],
                           "merged_text": ["same text", "same text", "other"]})
    ds = rd.from_pandas(merged)

    def keyed(t: pa.Table) -> pa.Table:
        lo, hi = content_hash128(t["merged_text"])
        return pa.table({"conv_id": t["conv_id"],
                         "h_lo": pa.array(lo.view(np.int64)),
                         "h_hi": pa.array(hi.view(np.int64))})

    k = ds.map_batches(keyed, batch_format="pyarrow")
    reps2 = k.groupby(["h_lo", "h_hi"]).aggregate(Min("conv_id", alias_name="rep"))
    got = (k.join(reps2, join_type="inner", num_partitions=1,
                  on=("h_lo", "h_hi"))
           .to_pandas().set_index("conv_id")["rep"].to_dict())
    assert got == {"c1": "c1", "c2": "c1", "c3": "c3"}


def test_events_profile_matches_direct(ray_session):
    from manga_ocr_ray.pipelines.analytic import q_events_profile

    got = q_events_profile(SF_DIR)
    ev = pd.read_parquet(f"{SF_DIR}/events.parquet")
    assert int(got["n_rows"].iloc[0]) == len(ev)
    for c in ["event_id", "ts", "user_id", "event_type", "value", "props"]:
        assert int(got["null_" + c].iloc[0]) == int(ev[c].isna().sum()), c
    assert int(got["event_type_distinct"].iloc[0]) == ev["event_type"].nunique()
    assert got["value_min"].iloc[0] == ev["value"].min()
    assert got["value_max"].iloc[0] == ev["value"].max()
    assert got["ts_min"].iloc[0] == ev["ts"].min()
    assert got["ts_max"].iloc[0] == ev["ts"].max()
    assert got["props_avg_len"].iloc[0] == pytest.approx(
        ev["props"].str.len().sum() / ev["props"].notna().sum(), abs=1e-12)


def test_ri_audit_both_plans_match_direct(ray_session, monkeypatch):
    from manga_ocr_ray.pipelines.analytic import q_orders_ri_audit

    li = pd.read_parquet(f"{SF_DIR}/lineitem.parquet", columns=["l_orderkey"])
    orders = pd.read_parquet(f"{SF_DIR}/orders.parquet",
                             columns=["o_orderkey", "o_custkey"])
    cust = pd.read_parquet(f"{SF_DIR}/customer.parquet", columns=["c_custkey"])
    want = {
        "li_orphans": int((~li["l_orderkey"].isin(orders["o_orderkey"])).sum()),
        "order_orphans": int((~orders["o_custkey"].isin(cust["c_custkey"])).sum()),
        "childless_orders": int((~orders["o_orderkey"].isin(li["l_orderkey"])).sum()),
    }
    # audit must report a NONZERO count somewhere or the fixture proves nothing
    assert any(v > 0 for v in want.values())
    for env in ["0", "5000000"]:  # forced distinct-keys groupby plan + broadcast plan
        monkeypatch.setenv("GRAFT_BROADCAST_MAX_ROWS", env)
        got = q_orders_ri_audit(SF_DIR)
        assert {c: int(got[c].iloc[0]) for c in want} == want, env


def test_context_budget_matches_pandas_cumsum(ray_session):
    import __ray_entry__ as E
    from manga_ocr_ray.functions.textstats import token_count_array
    import pyarrow as pa

    got = (E._q_transcript_context_budget(SF_DIR).to_pandas()
           .sort_values(["conv_id", "turn_idx"]).reset_index(drop=True))
    tr = pd.read_parquet(f"{E._oracle_corpus()}/transcripts.parquet",
                         columns=["conv_id", "turn_idx", "text"])
    tr = tr.sort_values(["conv_id", "turn_idx"]).reset_index(drop=True)
    tr["ntok"] = token_count_array(pa.array(tr["text"])).to_numpy(
        zero_copy_only=False).astype("int64")
    want_cum = tr.groupby("conv_id", sort=False)["ntok"].cumsum()
    assert (got["cum_tokens"].to_numpy() == want_cum.to_numpy()).all()
    assert (got["over_budget"].to_numpy()
            == (want_cum.to_numpy() > E._CONTEXT_BUDGET_TOKENS)).all()
    # running sum is per-conversation monotone nondecreasing
    assert (got.groupby("conv_id")["cum_tokens"].diff().dropna() >= 0).all()


def test_tool_chains_planted_runs(ray_session, monkeypatch, tmp_path):
    """Plant known tool-run shapes (run at conv start, at conv end, split by
    a non-tool turn, zero-tool conv) and pin the gaps-and-islands maxima."""
    import pyarrow as pa
    import pyarrow.parquet as pq
    import __ray_entry__ as E

    rows = []
    # conv A: tool,tool,user,tool -> max 2 (leading run, then singleton)
    for i, tool in enumerate(["search", "search", "", "fetch"]):
        rows.append(("A", i, tool))
    # conv B: user,user -> max 0
    rows += [("B", 0, ""), ("B", 1, "")]
    # conv C: user,tool,tool,tool -> max 3 (trailing run)
    rows += [("C", 0, ""), ("C", 1, "x"), ("C", 2, "y"), ("C", 3, "z")]
    t = pa.table({
        "conv_id": [r[0] for r in rows],
        "turn_idx": pa.array([r[1] for r in rows], pa.int32()),
        "tool": [r[2] or None for r in rows],
        "text": ["w"] * len(rows),
        "role": ["u"] * len(rows),
    })
    corpus = tmp_path / "chains"
    corpus.mkdir()
    pq.write_table(t, corpus / "transcripts.parquet")
    monkeypatch.setattr(E, "_oracle_corpus", lambda: str(corpus))
    got = (E._q_transcript_tool_chains(SF_DIR).to_pandas()
           .set_index("conv_id")["max_tool_chain"].to_dict())
    assert got == {"A": 2, "B": 0, "C": 3}


def test_tool_chains_full_corpus_matches_pandas(ray_session):
    import __ray_entry__ as E

    got = (E._q_transcript_tool_chains(SF_DIR).to_pandas()
           .sort_values("conv_id").reset_index(drop=True))
    tr = pd.read_parquet(f"{E._oracle_corpus()}/transcripts.parquet",
                         columns=["conv_id", "turn_idx", "tool"])
    tr = tr.sort_values(["conv_id", "turn_idx"])
    tr["is_tool"] = tr["tool"].fillna("").ne("")
    # run id increments whenever is_tool flips or conversation changes
    flip = (tr["is_tool"].ne(tr["is_tool"].shift())
            | tr["conv_id"].ne(tr["conv_id"].shift()))
    tr["run"] = flip.cumsum()
    runs = (tr[tr["is_tool"]].groupby(["conv_id", "run"]).size()
            .groupby("conv_id").max())
    want = runs.reindex(tr["conv_id"].unique(), fill_value=0).sort_index()
    assert got["conv_id"].tolist() == list(want.index)
    assert (got["max_tool_chain"].to_numpy() == want.to_numpy()).all()


def test_zscore_matches_pandas(ray_session):
    from manga_ocr_ray.pipelines.analytic import q_events_value_zscore

    got = q_events_value_zscore(SF_DIR).to_pandas()
    ev = pd.read_parquet(f"{SF_DIR}/events.parquet",
                         columns=["event_id", "event_type", "value"])
    grp = ev.groupby("event_type")["value"]
    ev["want_z"] = (ev["value"] - grp.transform("mean")) / grp.transform("std")
    chk = got.merge(ev[["event_id", "want_z"]], on="event_id")
    assert len(chk) == len(ev)
    np.testing.assert_allclose(chk["z"].to_numpy(), chk["want_z"].to_numpy(),
                               rtol=1e-9, atol=1e-12)
    # per-type z-scores are standardized: mean ~0, sample std ~1
    for _, g in got.groupby("event_type"):
        assert abs(g["z"].mean()) < 1e-9
        assert abs(g["z"].std() - 1.0) < 1e-9


def test_latest_by_user_matches_pandas_and_dedups(ray_session):
    from manga_ocr_ray.pipelines.analytic import q_events_latest_by_user

    got = (q_events_latest_by_user(SF_DIR).to_pandas()
           .sort_values("user_id").reset_index(drop=True))
    ev = pd.read_parquet(f"{SF_DIR}/events.parquet")
    want = (ev.sort_values(["user_id", "ts", "event_id"])
            .groupby("user_id", sort=True).tail(1)
            .sort_values("user_id").reset_index(drop=True))
    pd.testing.assert_frame_equal(
        got[want.columns.tolist()], want, check_dtype=False)
    assert got["user_id"].is_unique


def test_unpivot_shape_and_roundtrip(ray_session):
    from manga_ocr_ray.pipelines.analytic import q_lineitem_unpivot

    got = q_lineitem_unpivot(SF_DIR).to_pandas()
    li = pd.read_parquet(f"{SF_DIR}/lineitem.parquet",
                         columns=["l_orderkey", "l_linenumber", "l_quantity",
                                  "l_discount", "l_tax"])
    assert len(got) == 3 * len(li)
    assert set(got["measure"]) == {"l_quantity", "l_discount", "l_tax"}
    # each measure's long slice carries exactly the wide column's values
    key = ["l_orderkey", "l_linenumber"]
    for c in ["l_quantity", "l_discount", "l_tax"]:
        long = (got[got["measure"] == c]
                .sort_values(key + ["value"]).reset_index(drop=True))
        wide = li.rename(columns={c: "value"}) \
            .sort_values(key + ["value"]).reset_index(drop=True)
        assert (long["value"].to_numpy() == wide["value"].to_numpy()).all()
        assert (long["l_orderkey"].to_numpy()
                == wide["l_orderkey"].to_numpy()).all()


def test_sft_pairs_planted_shapes(ray_session, monkeypatch, tmp_path):
    """Pin the K=4 frame, conversation-boundary isolation, the NULL prompt
    for an assistant turn with no history, and newline-bearing text
    surviving the join untrimmed."""
    import pyarrow as pa
    import pyarrow.parquet as pq
    import __ray_entry__ as E

    rows = [
        # conv A: 6 turns, assistant at 1 (1-turn history), 5 (4-turn frame)
        ("A", 0, "user", "q0\nmultiline"),
        ("A", 1, "assistant", "a1"),
        ("A", 2, "user", "q2"),
        ("A", 3, "tool", "t3"),
        ("A", 4, "user", "q4"),
        ("A", 5, "assistant", "a5"),
        # conv B: assistant FIRST turn -> NULL prompt
        ("B", 0, "assistant", "cold-open"),
        ("B", 1, "user", "later"),
    ]
    t = pa.table({
        "conv_id": [r[0] for r in rows],
        "turn_idx": pa.array([r[1] for r in rows], pa.int32()),
        "role": [r[2] for r in rows],
        "text": [r[3] for r in rows],
        "tool": [None] * len(rows),
    })
    corpus = tmp_path / "sft"
    corpus.mkdir()
    pq.write_table(t, corpus / "transcripts.parquet")
    monkeypatch.setattr(E, "_oracle_corpus", lambda: str(corpus))
    got = (E._q_transcript_sft_pairs(SF_DIR).to_pandas()
           .sort_values(["conv_id", "turn_idx"]).reset_index(drop=True))
    assert len(got) == 3
    assert got.loc[0, "prompt"] == "user: q0\nmultiline"   # inner \n kept
    assert got.loc[0, "response"] == "a1"
    # turn 5 sees exactly turns 1-4, oldest first (turn 0 outside the frame)
    assert got.loc[1, "prompt"] == ("assistant: a1\nuser: q2\n"
                                    "tool: t3\nuser: q4")
    assert got.loc[2, "conv_id"] == "B" and pd.isna(got.loc[2, "prompt"])


def test_q21_broadcast_and_bloom_plans_agree(ray_session, monkeypatch):
    """The F-orderkey side is ~half of orders — corpus-sized at web scale —
    so q21 must produce identical blockers through the broadcast plan and
    the bloom-prune + exact semi-join plan above the switch."""
    from manga_ocr_ray.pipelines.tpch2 import q21_blocking_suppliers

    outs = []
    for env in ["5000000", "0"]:   # broadcast plan, then forced bloom plan
        monkeypatch.setenv("GRAFT_BROADCAST_MAX_ROWS", env)
        outs.append(q21_blocking_suppliers(SF_DIR).reset_index(drop=True))
    pd.testing.assert_frame_equal(outs[0], outs[1])
    assert len(outs[0]) > 0


def test_latest_by_user_empty_block_guard(ray_session):
    """A zero-row block must pass the partial kernel untouched (np.r_ of an
    empty comparison plus [True] would misindex an empty take)."""
    import pyarrow as pa
    from manga_ocr_ray.pipelines.analytic import _latest_event_block

    ev = pd.read_parquet(f"{SF_DIR}/events.parquet")
    empty = pa.Table.from_pandas(ev.head(0))
    out = _latest_event_block(empty)
    assert out.num_rows == 0 and out.schema.names == empty.schema.names
    full = _latest_event_block(pa.Table.from_pandas(ev.head(100)))
    assert full.num_rows == ev.head(100)["user_id"].nunique()


def test_sft_pairs_null_role_text_skip_semantics(ray_session, monkeypatch,
                                                 tmp_path):
    """A NULL role or text inside the history frame is SKIPPED (no blank
    line), exactly like the oracle's string_agg; an all-null history is a
    NULL prompt."""
    import duckdb
    import pyarrow as pa
    import pyarrow.parquet as pq
    import __ray_entry__ as E

    rows = [
        ("A", 0, "user", "q0"),
        ("A", 1, None, "ghost"),        # null role -> skipped element
        ("A", 2, "tool", None),         # null text -> skipped element
        ("A", 3, "user", "q3"),
        ("A", 4, "assistant", "a4"),
        ("B", 0, "user", None),         # only-null history
        ("B", 1, "assistant", "b1"),
    ]
    t = pa.table({
        "conv_id": [r[0] for r in rows],
        "turn_idx": pa.array([r[1] for r in rows], pa.int32()),
        "role": [r[2] for r in rows],
        "text": [r[3] for r in rows],
        "tool": [None] * len(rows),
    })
    corpus = tmp_path / "sftnull"
    corpus.mkdir()
    pq.write_table(t, corpus / "transcripts.parquet")
    monkeypatch.setattr(E, "_oracle_corpus", lambda: str(corpus))
    got = (E._q_transcript_sft_pairs(SF_DIR).to_pandas()
           .sort_values(["conv_id", "turn_idx"]).reset_index(drop=True))
    assert got.loc[0, "prompt"] == "user: q0\nuser: q3"
    assert pd.isna(got.loc[1, "prompt"])        # conv B: history all null
    # and the DuckDB twin agrees verbatim
    sql = f"""
SELECT conv_id, turn_idx,
       string_agg(role || ': ' || text, chr(10))
         OVER (PARTITION BY conv_id ORDER BY turn_idx
               ROWS BETWEEN 4 PRECEDING AND 1 PRECEDING) AS prompt,
       text AS response
FROM '{corpus}/transcripts.parquet' QUALIFY role = 'assistant'
"""
    want = (duckdb.sql(sql).df()
            .sort_values(["conv_id", "turn_idx"]).reset_index(drop=True))
    pd.testing.assert_frame_equal(got, want, check_dtype=False)


def test_context_budget_null_text_counts_zero(ray_session, monkeypatch,
                                              tmp_path):
    import pyarrow as pa
    import pyarrow.parquet as pq
    import __ray_entry__ as E

    t = pa.table({
        "conv_id": ["A"] * 3,
        "turn_idx": pa.array([0, 1, 2], pa.int32()),
        "role": ["user", "assistant", "user"],
        "text": ["one two", None, "three"],
        "tool": [None] * 3,
    })
    corpus = tmp_path / "cbnull"
    corpus.mkdir()
    pq.write_table(t, corpus / "transcripts.parquet")
    monkeypatch.setattr(E, "_oracle_corpus", lambda: str(corpus))
    got = (E._q_transcript_context_budget(SF_DIR).to_pandas()
           .sort_values("turn_idx"))
    assert got["cum_tokens"].tolist() == [2, 2, 3]
