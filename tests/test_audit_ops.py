"""Round-5 session-6 wave: transcript fork/loop audits over the planted
audit corpus, event debounce dedup, and the Gopher static quality rules."""

import numpy as np
import pandas as pd
import pyarrow as pa
import pyarrow.parquet as pq

SF_DIR = "/root/testdata/sf0.001"


# ---- audit corpus construction ---------------------------------------------

def test_audit_corpus_planted_shapes(ray_session):
    import __ray_entry__ as E

    aud = pd.read_parquet(f"{E._audit_corpus()}/transcripts.parquet")
    base = pd.read_parquet(f"{E._oracle_corpus()}/transcripts.parquet")
    convs = sorted(base["conv_id"].unique())
    forks = sorted(c for c in aud["conv_id"].unique() if c.endswith("~fork"))
    loops = sorted(c for c in aud["conv_id"].unique() if c.endswith("~loop"))
    assert len(forks) == len(convs[::25]) and len(loops) == len(convs[7::25])
    # fork twin shares EXACTLY its base's first 3 turns
    cid = forks[0][:-5]
    b = base[base["conv_id"] == cid].sort_values("turn_idx")
    f = aud[aud["conv_id"] == forks[0]].sort_values("turn_idx")
    assert f.head(3)[["turn_idx", "role", "text"]].values.tolist() \
        == b.head(3)[["turn_idx", "role", "text"]].values.tolist()
    assert f["text"].iloc[3:].str.startswith("(retry) ").all()
    # loop twin ends with 3 verbatim repeats of its final base turn
    cid = loops[0][:-5]
    b = base[base["conv_id"] == cid].sort_values("turn_idx")
    l = aud[aud["conv_id"] == loops[0]].sort_values("turn_idx")
    assert len(l) == len(b) + 3
    assert (l["text"].tail(4) == b["text"].iloc[-1]).all()
    assert l["turn_idx"].is_monotonic_increasing
    # base rows themselves are untouched
    assert len(aud) == len(base) + sum(
        min(5, (base["conv_id"] == c).sum()) for c in convs[::25]) + sum(
        (base["conv_id"] == c).sum() + 3 for c in convs[7::25])


# ---- transcript_prefix_forks ------------------------------------------------

def _write_transcripts(path, rows):
    t = pa.table({
        "conv_id": [r[0] for r in rows],
        "turn_idx": pa.array([r[1] for r in rows], pa.int32()),
        "role": [r[2] for r in rows],
        "text": [r[3] for r in rows],
        "tool": [None] * len(rows),
        "ts": pa.array([0] * len(rows), pa.timestamp("us")),
    })
    path.mkdir()
    pq.write_table(t, path / "transcripts.parquet")
    return str(path)


def test_prefix_forks_planted(ray_session, monkeypatch, tmp_path):
    import __ray_entry__ as E

    rows = []
    # A and B share their first 3 turns exactly -> one fork group
    for cid in ("A", "B"):
        rows += [(cid, 0, "user", "hi"), (cid, 1, "assistant", "hello"),
                 (cid, 2, "user", "do it"), (cid, 3, "assistant", cid + "!")]
    # C differs from A at turn 2 -> NOT grouped
    rows += [("C", 0, "user", "hi"), ("C", 1, "assistant", "hello"),
             ("C", 2, "user", "do something else")]
    # D/E: 2-turn conversations with identical prefixes -> grouped
    rows += [("D", 0, "user", "short"), ("D", 1, "assistant", "ok"),
             ("E", 0, "user", "short"), ("E", 1, "assistant", "ok")]
    corpus = _write_transcripts(tmp_path / "forks", rows)
    monkeypatch.setattr(E, "_audit_corpus", lambda: corpus)
    got = (E._q_transcript_prefix_forks(SF_DIR).to_pandas()
           .sort_values("fork_rep").reset_index(drop=True))
    assert got["fork_rep"].tolist() == ["A", "D"]
    assert got["n_convs"].tolist() == [2, 2]


def test_prefix_forks_matches_oracle_corpus_count(ray_session):
    """Every planted twin (fork AND loop — loops copy the whole base conv,
    so they share its prefix too) lands in a 2-conversation group."""
    import __ray_entry__ as E

    base = pd.read_parquet(f"{E._oracle_corpus()}/transcripts.parquet")
    convs = sorted(base["conv_id"].unique())
    got = E._q_transcript_prefix_forks(SF_DIR).to_pandas()
    assert len(got) == len(convs[::25]) + len(convs[7::25])
    assert (got["n_convs"] == 2).all()


# ---- transcript_loop_detect --------------------------------------------------

def test_loop_detect_planted(ray_session, monkeypatch, tmp_path):
    import __ray_entry__ as E

    rows = [
        # A: repeat mid-conversation (turns 1,2 identical) and at the end
        ("A", 0, "user", "x"), ("A", 1, "assistant", "same"),
        ("A", 2, "assistant", "same"), ("A", 3, "user", "y"),
        ("A", 4, "user", "y"),
        # B: no repeats; B's first turn equals A's last text — conversation
        # boundary must NOT count as a repeat
        ("B", 0, "user", "y"), ("B", 1, "assistant", "z"),
        # C: null texts — NULL == NULL is not a repeat (SQL lag semantics)
        ("C", 0, "user", None), ("C", 1, "assistant", None),
    ]
    corpus = _write_transcripts(tmp_path / "loops", rows)
    monkeypatch.setattr(E, "_audit_corpus", lambda: corpus)
    got = (E._q_transcript_loop_detect(SF_DIR).to_pandas()
           .set_index("conv_id").sort_index())
    assert got["n_repeat_turns"].tolist() == [2, 0, 0]
    assert got.loc["A", "first_repeat_turn"] == 2
    assert pd.isna(got.loc["B", "first_repeat_turn"])
    assert pd.isna(got.loc["C", "first_repeat_turn"])


# ---- transcript_curation_gate -------------------------------------------------

def test_curation_gate_planted(ray_session, monkeypatch, tmp_path):
    import __ray_entry__ as E

    rows = []
    # A: clean 4-turn alternating conv ending on assistant -> keep
    rows += [("A", 0, "user", "q"), ("A", 1, "assistant", "a"),
             ("A", 2, "user", "q2"), ("A", 3, "assistant", "a2")]
    # B: double user turn -> alternation violation
    rows += [("B", 0, "user", "q"), ("B", 1, "user", "again"),
             ("B", 2, "assistant", "a"), ("B", 3, "assistant", "a2"),
             ("B", 4, "assistant", "a3")]
    # C: tool run (adjacent tool roles are exempt), ends on user -> fails d
    rows += [("C", 0, "user", "q"), ("C", 1, "assistant", "a"),
             ("C", 2, "tool", "r1"), ("C", 3, "tool", "r2"),
             ("C", 4, "user", "thanks")]
    # D: too short
    rows += [("D", 0, "user", "q"), ("D", 1, "assistant", "a")]
    corpus = _write_transcripts(tmp_path / "gate", rows)
    monkeypatch.setattr(E, "_oracle_corpus", lambda: corpus)
    got = (E._q_transcript_curation_gate(SF_DIR).to_pandas()
           .set_index("conv_id").sort_index())
    assert got["keep"].tolist() == [True, False, False, False]
    assert got.loc["B", "n_role_repeats"] == 3
    assert got.loc["C", "n_role_repeats"] == 0
    assert not got.loc["C", "r_ends_assistant"]
    assert not got.loc["D", "r_len"] and got.loc["D", "r_alternation"]


def test_curation_gate_null_roles_fill_to_empty(ray_session, monkeypatch,
                                                tmp_path):
    """NULL roles fill to '' on BOTH plans (review r5s6): two adjacent NULL
    roles ARE an alternation violation ('' == '' and '' != 'tool'), and a
    NULL-role final turn is not assistant-final."""
    import __ray_entry__ as E

    rows = [("N", 0, None, "a"), ("N", 1, None, "b"),
            ("N", 2, "assistant", "c"), ("N", 3, None, "d")]
    corpus = _write_transcripts(tmp_path / "nullrole", rows)
    monkeypatch.setattr(E, "_oracle_corpus", lambda: corpus)
    got = E._q_transcript_curation_gate(SF_DIR).to_pandas().iloc[0]
    assert got["n_role_repeats"] == 1
    assert not got["r_ends_assistant"] and not got["keep"]


def test_curation_gate_full_corpus_matches_pandas(ray_session):
    import __ray_entry__ as E

    got = (E._q_transcript_curation_gate(SF_DIR).to_pandas()
           .sort_values("conv_id").reset_index(drop=True))
    tr = pd.read_parquet(f"{E._oracle_corpus()}/transcripts.parquet",
                         columns=["conv_id", "turn_idx", "role"])
    tr = tr.sort_values(["conv_id", "turn_idx"])
    viol = (tr["role"].eq(tr["role"].shift())
            & tr["conv_id"].eq(tr["conv_id"].shift())
            & tr["role"].ne("tool"))
    want = tr.assign(viol=viol).groupby("conv_id").agg(
        n_turns=("role", "size"), n_role_repeats=("viol", "sum"),
        last_role=("role", "last"),
        has_user=("role", lambda s: (s == "user").any()),
        has_assistant=("role", lambda s: (s == "assistant").any()))
    assert (got["n_turns"].to_numpy()
            == want["n_turns"].to_numpy()).all()
    assert (got["n_role_repeats"].to_numpy()
            == want["n_role_repeats"].to_numpy()).all()
    assert (got["keep"].to_numpy() == (
        want["n_turns"].between(4, 100) & want["has_user"]
        & want["has_assistant"] & want["n_role_repeats"].eq(0)
        & want["last_role"].eq("assistant")).to_numpy()).all()
    assert got["keep"].any() and not got["keep"].all()


# ---- transcript_near_dup -------------------------------------------------------

def test_transcript_near_dup_catches_planted_twins(ray_session):
    """Every planted ~loop twin (J >= 0.97 vs its base) must be caught, and
    every reported pair must be a (base, twin) pair — background template
    overlap tops out at J = 0.43 on corpus v1, far under the 0.6 gate."""
    import __ray_entry__ as E

    got = E._q_transcript_near_dup(SF_DIR)
    pairs = set(zip(got["conv_a"], got["conv_b"]))
    base = pd.read_parquet(f"{E._oracle_corpus()}/transcripts.parquet")
    convs = sorted(base["conv_id"].unique())
    for cid in convs[7::25]:
        assert (cid, cid + "~loop") in pairs
    for a, b in pairs:
        assert b.startswith(a + "~") and b[len(a) + 1:] in ("fork", "loop")


# ---- events_dedup_window ------------------------------------------------------

def test_events_dedup_window_planted(ray_session, tmp_path):
    from manga_ocr_ray.pipelines.analytic import q_events_dedup_window

    h = 3_600_000_000  # one hour in µs
    rows = [
        # user 1 / click: t0, +1h (dropped), +25h (kept: gap 24h exceeded)
        (1, 0 * h, 1, "click"), (2, 1 * h, 1, "click"), (3, 26 * h, 1, "click"),
        # user 1 / view at +1h: different type, kept
        (4, 1 * h, 1, "view"),
        # user 2 / click: exact same ts twice — second is a 0-gap duplicate
        (5, 0 * h, 2, "click"), (6, 0 * h, 2, "click"),
    ]
    t = pa.table({
        "event_id": pa.array([r[0] for r in rows], pa.int64()),
        "ts": pa.array([r[1] for r in rows], pa.timestamp("us")),
        "user_id": pa.array([r[2] for r in rows], pa.int64()),
        "event_type": [r[3] for r in rows],
    })
    d = tmp_path / "ev"
    d.mkdir()
    pq.write_table(t, d / "events.parquet")
    got = q_events_dedup_window(str(d)).to_pandas()
    assert sorted(got["event_id"].tolist()) == [1, 3, 4, 5]


def test_events_dedup_window_matches_pandas(ray_session):
    from manga_ocr_ray.pipelines.analytic import (
        _DEBOUNCE_WINDOW_S, q_events_dedup_window)

    got = q_events_dedup_window(SF_DIR).to_pandas()
    ev = pd.read_parquet(f"{SF_DIR}/events.parquet",
                         columns=["event_id", "ts", "user_id", "event_type"])
    ev = ev.sort_values(["user_id", "event_type", "ts", "event_id"])
    d = ev.groupby(["user_id", "event_type"])["ts"].diff()
    want = ev[d.isna() | (d.dt.total_seconds() > _DEBOUNCE_WINDOW_S)]
    assert sorted(got["event_id"]) == sorted(want["event_id"])


# ---- seeded randomized replicas (ties / nulls / repeats / natural forks) -----

def _random_transcripts(rng, n_convs=30, max_turns=8, null_frac=0.1):
    """Small-alphabet random corpus: forces repeated texts, fork-prefix
    collisions, NULL text/role, and single-turn conversations."""
    rows = []
    texts = ["alpha", "beta", "gamma", ""]
    roles = ["user", "assistant", "tool", None]
    for c in range(n_convs):
        for i in range(int(rng.integers(1, max_turns + 1))):
            t = None if rng.random() < null_frac \
                else texts[int(rng.integers(len(texts)))]
            rows.append((f"c{c:03d}", i, roles[int(rng.integers(len(roles)))], t))
    return rows


def _rows_to_corpus(path, rows):
    t = pa.table({
        "conv_id": [r[0] for r in rows],
        "turn_idx": pa.array([r[1] for r in rows], pa.int32()),
        "role": [r[2] for r in rows],
        "text": [r[3] for r in rows],
        "tool": [None] * len(rows),
        "ts": pa.array([0] * len(rows), pa.timestamp("us")),
    })
    path.mkdir()
    pq.write_table(t, path / "transcripts.parquet")
    return str(path)


def test_loop_detect_randomized_matches_pandas(ray_session, monkeypatch,
                                               tmp_path):
    import __ray_entry__ as E

    for seed in range(3):
        rows = _random_transcripts(np.random.default_rng(seed))
        corpus = _rows_to_corpus(tmp_path / f"ld{seed}", rows)
        monkeypatch.setattr(E, "_audit_corpus", lambda c=corpus: c)
        got = (E._q_transcript_loop_detect(SF_DIR).to_pandas()
               .sort_values("conv_id").reset_index(drop=True))
        tr = pd.DataFrame(rows, columns=["conv_id", "turn_idx", "role", "text"])
        tr = tr.sort_values(["conv_id", "turn_idx"])
        rep = (tr["text"].notna() & tr["text"].eq(tr["text"].shift())
               & tr["conv_id"].eq(tr["conv_id"].shift()))
        want = (tr.assign(rep=rep)
                .groupby("conv_id")
                .apply(lambda g: pd.Series(
                    {"n": int(g["rep"].sum()),
                     "f": g.loc[g["rep"], "turn_idx"].min()}),
                    include_groups=False)
                .sort_index())
        assert got["n_repeat_turns"].tolist() == want["n"].tolist()
        gf = got["first_repeat_turn"].astype("float64")
        assert ((gf.to_numpy() == want["f"].to_numpy())
                | (gf.isna().to_numpy() & want["f"].isna().to_numpy())).all()


def test_prefix_forks_randomized_matches_pandas(ray_session, monkeypatch,
                                                tmp_path):
    import __ray_entry__ as E

    any_forks = False
    for seed in range(3):
        # tiny (role, text) alphabet + short convs so prefix collisions
        # occur naturally across 60 conversations
        rng = np.random.default_rng(100 + seed)
        rows = []
        for c in range(60):
            for i in range(int(rng.integers(1, 4))):
                t = None if rng.random() < 0.1 else ["x", "y"][int(rng.integers(2))]
                rows.append((f"c{c:03d}", i,
                             ["user", "assistant"][int(rng.integers(2))], t))
        corpus = _rows_to_corpus(tmp_path / f"pf{seed}", rows)
        monkeypatch.setattr(E, "_audit_corpus", lambda c=corpus: c)
        got = E._q_transcript_prefix_forks(SF_DIR).to_pandas()
        tr = pd.DataFrame(rows, columns=["conv_id", "turn_idx", "role", "text"])
        tr = tr.sort_values(["conv_id", "turn_idx"])
        tr["part"] = (tr["role"].fillna("") + "\x1f"
                      + tr["text"].fillna("\x1d"))
        firstk = tr.groupby("conv_id").head(3)
        pre = firstk.groupby("conv_id")["part"].agg("\x1e".join)
        grp = pre.reset_index().groupby("part")["conv_id"]
        want = pd.DataFrame({"fork_rep": grp.min(), "n_convs": grp.size()})
        want = (want[want["n_convs"] >= 2]
                .sort_values("fork_rep").reset_index(drop=True))
        if want.empty:
            assert len(got) == 0
            continue
        any_forks = True
        got = got.sort_values("fork_rep").reset_index(drop=True)
        assert got["fork_rep"].tolist() == want["fork_rep"].tolist()
        assert got["n_convs"].tolist() == want["n_convs"].tolist()
    assert any_forks  # at least one seed must actually exercise grouping


def test_curation_gate_randomized_matches_pandas(ray_session, monkeypatch,
                                                 tmp_path):
    import __ray_entry__ as E

    for seed in range(3):
        rows = _random_transcripts(np.random.default_rng(200 + seed),
                                   max_turns=6)
        corpus = _rows_to_corpus(tmp_path / f"cg{seed}", rows)
        monkeypatch.setattr(E, "_oracle_corpus", lambda c=corpus: c)
        got = (E._q_transcript_curation_gate(SF_DIR).to_pandas()
               .sort_values("conv_id").reset_index(drop=True))
        tr = pd.DataFrame(rows, columns=["conv_id", "turn_idx", "role", "text"])
        tr = tr.sort_values(["conv_id", "turn_idx"])
        r = tr["role"].fillna("")
        viol = (r.eq(r.shift()) & tr["conv_id"].eq(tr["conv_id"].shift())
                & r.ne("tool"))
        want = (tr.assign(r=r, viol=viol).groupby("conv_id")
                .agg(n_turns=("r", "size"), n_rep=("viol", "sum"),
                     last_r=("r", "last"),
                     has_u=("r", lambda s: (s == "user").any()),
                     has_a=("r", lambda s: (s == "assistant").any())))
        assert got["n_turns"].tolist() == want["n_turns"].tolist()
        assert got["n_role_repeats"].tolist() == want["n_rep"].tolist()
        keep = (want["n_turns"].between(4, 100) & want["has_u"]
                & want["has_a"] & want["n_rep"].eq(0)
                & want["last_r"].eq("assistant"))
        assert got["keep"].tolist() == keep.tolist()


def test_debounce_randomized_matches_pandas(ray_session, tmp_path):
    from manga_ocr_ray.pipelines.analytic import q_events_dedup_window

    for seed in range(3):
        rng = np.random.default_rng(300 + seed)
        n = 200
        ts_us = rng.integers(0, 120_000_000, n)  # 2-minute span: ties + gaps
        t = pa.table({
            "event_id": pa.array(np.arange(n, dtype=np.int64)),
            "ts": pa.array(ts_us, pa.timestamp("us")),
            "user_id": pa.array(rng.integers(1, 6, n).astype(np.int64)),
            "event_type": [["a", "b"][i] for i in rng.integers(0, 2, n)],
        })
        d = tmp_path / f"ev{seed}"
        d.mkdir()
        pq.write_table(t, d / "events.parquet")
        got = q_events_dedup_window(str(d), window_s=10).to_pandas()
        ev = t.to_pandas().sort_values(["user_id", "event_type", "ts",
                                        "event_id"])
        diff = ev.groupby(["user_id", "event_type"])["ts"].diff()
        want = ev[diff.isna() | (diff.dt.total_seconds() > 10)]
        assert sorted(got["event_id"]) == sorted(want["event_id"])
        assert 0 < len(got) < n  # threshold actually discriminates


# ---- doc_gopher_rules ----------------------------------------------------------

def test_gopher_rules_planted(ray_session, tmp_path):
    import ray.data as rd
    from manga_ocr_ray.pipelines.documents import q_doc_gopher_rules

    good = " ".join(["the quick brown fox jumps over a lazy dog today"] * 6)
    docs = {
        1: good,                                   # passes all four rules
        2: "too short to pass the word count",     # fails r_word_count
        3: " ".join(["勇者は魔王を倒した"] * 60),     # CJK: no alpha/stopwords
        4: good + " " + "#" * 1 + " ##### ### ## # # # # # # # # # # # # #",
    }
    t = pa.table({"doc_id": pa.array(list(docs), pa.int64()),
                  "text": list(docs.values()),
                  "lang": ["en"] * 4, "source": ["t"] * 4,
                  "n_chars": pa.array([len(v) for v in docs.values()],
                                      pa.int64())})
    d = tmp_path / "docs"
    d.mkdir()
    pq.write_table(t, d / "documents.parquet")
    got = (q_doc_gopher_rules(str(d)).to_pandas()
           .set_index("doc_id").sort_index())
    assert got.loc[1, "keep"] and got.loc[1, ["r_word_count", "r_mean_len",
                                              "r_symbol", "r_stopwords"]].all()
    assert not got.loc[2, "r_word_count"] and not got.loc[2, "keep"]
    assert not got.loc[3, "r_mean_len"] and not got.loc[3, "r_stopwords"]
    assert not got.loc[4, "r_symbol"] and not got.loc[4, "keep"]
    assert got.loc[1, "mean_word_len"] == np.float64(
        sum(len(w) for w in good.split()) / len(good.split()))
