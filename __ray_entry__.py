"""Driver contract for the Ray-Data-native extraction engine.

Ray is initialised by the driver BEFORE this module is imported; nothing
here (or in manga_ocr_ray) calls ray.init()/ray.shutdown().

``queries()`` exposes every implemented operator from SURVEY.md §2 plus the
training-data operators (dedup, similarity, text analysis); each SQL-
expressible one has a matching ``oracle_sql()`` entry with identical column
names.  Transcript-pipeline queries run over a fixed deterministic corpus
written to /tmp at import; their oracle is the golden expected table the
corpus generator produces by inverse-rendering payloads from the expected
text, so the driver's value-hash equality IS per-turn text equality (the
reference's tests/test_ocr.py golden fixture, driver-visible).  Caveat: the
generator builds expected_text with the engine's own post_process()
(corpus.py), so this gate verifies payload unwrapping + batch-vs-scalar
normalize agreement but would not catch a semantic bug in post_process
itself; the INDEPENDENT normalize gates are doc_normalize's DuckDB SQL
mirror and the frozen hand-written vectors in tests/test_extract.py.
"""

from __future__ import annotations

import os
import sys
from collections.abc import Callable
from typing import Any

sys.path.insert(0, os.path.dirname(os.path.abspath(__file__)))

import numpy as np
import pandas as pd


def _sf_of(sf_dir: str) -> float:
    base = os.path.basename(sf_dir.rstrip("/"))
    try:
        return float(base.replace("sf", ""))
    except ValueError:
        return 0.01


def _n_convs(sf_dir: str) -> int:
    return max(50, int(40_000 * _sf_of(sf_dir)))


# ---- transcript-domain queries (oracle = the golden expected table) --------
#
# The transcripts table is our domain input (BASELINE input_hint), not a
# driver view, so the flagship's oracle is bootstrapped: a FIXED deterministic
# corpus (pure pyarrow, no Ray) is written to /tmp at import, the query runs
# REAL extraction/merge over the transcripts parquet, and the oracle SQL reads
# the golden expected parquet — the corpus generator inverse-renders payloads
# from the expected text, so value-hash equality IS per-turn text equality
# (the reference's tests/test_ocr.py expected_results.json gate,
# driver-visible).  Shared-normalize caveat: expected_text is built with the
# engine's own post_process(), so a semantic bug there cancels on both sides;
# the independent normalize gates are doc_normalize's SQL mirror and the
# frozen vectors in tests/test_extract.py.  Fixed-size on purpose: this
# pair is the correctness gate; the scaled perf path is entry()/bench.py.

_ORACLE_CORPUS = "/tmp/graft_oracle_corpus_n400_s42_v1"


def _oracle_corpus() -> str:
    """Write the fixed oracle corpus if missing (atomic, content-deterministic)."""
    import pyarrow.parquet as pq

    tr, exp = f"{_ORACLE_CORPUS}/transcripts.parquet", f"{_ORACLE_CORPUS}/expected.parquet"
    if not (os.path.exists(tr) and os.path.exists(exp)):
        from manga_ocr_ray.corpus import make_tables

        os.makedirs(_ORACLE_CORPUS, exist_ok=True)
        t, e = make_tables(400, seed=42, mega_every=97, mega_turns=150)
        for path, table in ((tr, t), (exp, e)):
            tmp = f"{path}.tmp{os.getpid()}"
            pq.write_table(table, tmp)
            os.replace(tmp, path)
    return _ORACLE_CORPUS


def _q_transcript_extract(sf_dir: str):
    import ray.data as rd
    from manga_ocr_ray.pipelines.extract import extract_turns

    ds = rd.read_parquet(f"{_oracle_corpus()}/transcripts.parquet")
    # oracle-scale corpus (~4k rows): a small autoscaling pool, not the
    # cluster-sized default meant for the headline corpus
    out = extract_turns(ds, batch_size=1024, num_buckets=64, concurrency=(1, 4))
    return out.select_columns(["conv_id", "turn_idx", "extracted_text"])


_Q_TRANSCRIPT_EXTRACT_SQL = f"""
SELECT conv_id, turn_idx, expected_text AS extracted_text
FROM '{_ORACLE_CORPUS}/expected.parquet'
"""


def _q_transcript_merge(sf_dir: str):
    import ray.data as rd
    from manga_ocr_ray.pipelines.extract import conversation_merge, extract_turns

    ds = rd.read_parquet(f"{_oracle_corpus()}/transcripts.parquet")
    return conversation_merge(
        extract_turns(ds, num_buckets=16, concurrency=(1, 4)), chunk_size=64)


_Q_TRANSCRIPT_MERGE_SQL = f"""
SELECT conv_id,
       string_agg(expected_text, chr(10) ORDER BY turn_idx) AS merged_text,
       count(*) AS n_turns
FROM '{_ORACLE_CORPUS}/expected.parquet'
GROUP BY conv_id
"""


def _q_transcript_cjk_stats(sf_dir: str):
    """CJK token / char-class kernels value-checked on Japanese-bearing text
    (the documents table is ASCII-only, so this is the oracle row that
    actually exercises the kanji/kana ranges against DuckDB's RE2)."""
    import pyarrow as pa
    import pyarrow.compute as pc
    import ray.data as rd
    from manga_ocr_ray.functions.textstats import (
        HIRAGANA_CLASS, KANJI_CLASS, KATAKANA_CLASS, TOKEN_PATTERN)

    ds = rd.read_parquet(f"{_oracle_corpus()}/expected.parquet")

    def stats(t: pa.Table) -> pa.Table:
        text = t["expected_text"]

        def cnt(pat: str):
            return pc.cast(pc.count_substring_regex(text, pattern=pat), pa.int64())

        return pa.table({
            "conv_id": t["conv_id"], "turn_idx": t["turn_idx"],
            "n_tokens": cnt(TOKEN_PATTERN), "n_kanji": cnt(KANJI_CLASS),
            "n_hiragana": cnt(HIRAGANA_CLASS), "n_katakana": cnt(KATAKANA_CLASS),
        })

    return ds.map_batches(stats, batch_format="pyarrow")


def _transcript_cjk_stats_sql() -> str:
    from manga_ocr_ray.functions.textstats import (
        HIRAGANA_CLASS, KANJI_CLASS, KATAKANA_CLASS, TOKEN_PATTERN)

    return f"""
SELECT conv_id, turn_idx,
       len(regexp_extract_all(expected_text, '{TOKEN_PATTERN}')) AS n_tokens,
       len(regexp_extract_all(expected_text, '{KANJI_CLASS}')) AS n_kanji,
       len(regexp_extract_all(expected_text, '{HIRAGANA_CLASS}')) AS n_hiragana,
       len(regexp_extract_all(expected_text, '{KATAKANA_CLASS}')) AS n_katakana
FROM '{_ORACLE_CORPUS}/expected.parquet'
"""


def _perturbed_extraction():
    """(perturbed extraction, golden expected) datasets over the oracle
    corpus — the shared front half of the CER/WER/F1/BLEU metric gates.
    Deterministically perturbs every 5th turn's prediction (drop first char,
    append '誤') so every metric provably moves; the oracle SQL perturbs the
    expected text identically."""
    import pyarrow.compute as pc
    import ray.data as rd
    from manga_ocr_ray.pipelines.extract import extract_turns

    ds = rd.read_parquet(f"{_oracle_corpus()}/transcripts.parquet")
    extracted = extract_turns(ds, batch_size=1024, num_buckets=64, concurrency=(1, 4))

    def perturb_batch(t):
        import pyarrow as pa

        idx = t["turn_idx"].combine_chunks().to_numpy()
        txt = t["extracted_text"].combine_chunks()
        hit = (idx % 5 == 0) & (
            pc.utf8_length(txt).to_numpy(zero_copy_only=False) > 0)
        mutated = pc.binary_join_element_wise(
            pc.utf8_slice_codeunits(txt, start=1), pa.scalar("誤"), "")
        pred = pc.if_else(pa.array(hit), mutated, txt)
        return t.drop_columns(["extracted_text"]).append_column("extracted_text", pred)

    perturbed = extracted.map_batches(perturb_batch, batch_format="pyarrow")
    expected = rd.read_parquet(f"{_oracle_corpus()}/expected.parquet")
    return perturbed, expected


_PERTURB_SQL = """
  SELECT conv_id, turn_idx, expected_text,
         CASE WHEN turn_idx % 5 = 0 AND length(expected_text) > 0
              THEN substr(expected_text, 2) || '誤'
              ELSE expected_text END AS pred
"""


def _q_transcript_cer(sf_dir: str) -> pd.DataFrame:
    """CER + exact-match over REAL extraction vs the golden table (G3, the
    north-rule metric as a driver query; reference anchor:
    manga_ocr_dev/training/metrics.py:54-81).

    Runs extract_turns, deterministically perturbs every 5th turn's
    prediction (drop first char, append '誤') so the metric provably moves,
    joins the golden expected table on (conv_id, turn_idx), and tree-reduces
    per-batch Levenshtein partials.  The oracle perturbs the expected text
    the same way and uses DuckDB's levenshtein() — value-hash equality
    therefore requires BOTH per-turn extraction exactness AND a correct
    distributed edit-distance aggregate.  unit="byte" because DuckDB's
    levenshtein() edits UTF-8 bytes (verified: levenshtein('誤','')=3);
    pytest pins the codepoint-unit CER separately.  cer/exact_match are one
    division of two exactly-summed int64s → bit-deterministic."""
    from manga_ocr_ray.functions.metrics import cer_against_expected

    perturbed, expected = _perturbed_extraction()
    m = cer_against_expected(perturbed, expected, unit="byte")
    return pd.DataFrame({
        "n_turns": [int(m["n_turns"])],
        "n_exact": [int(m["n_exact"])],
        "edits": [int(m["edits"])],
        "chars": [int(m["chars"])],
        "exact_match": [m["exact_match"]],
        "cer": [m["cer"]],
    })


_Q_TRANSCRIPT_CER_SQL = f"""
WITH p AS (
  SELECT expected_text,
         CASE WHEN turn_idx % 5 = 0 AND length(expected_text) > 0
              THEN substr(expected_text, 2) || '誤'
              ELSE expected_text END AS pred
  FROM '{_ORACLE_CORPUS}/expected.parquet')
SELECT CAST(count(*) AS BIGINT) AS n_turns,
       CAST(sum(CASE WHEN pred = expected_text THEN 1 ELSE 0 END) AS BIGINT) AS n_exact,
       CAST(sum(levenshtein(pred, expected_text)) AS BIGINT) AS edits,
       CAST(sum(strlen(expected_text)) AS BIGINT) AS chars,
       CAST(sum(CASE WHEN pred = expected_text THEN 1 ELSE 0 END) AS DOUBLE)
         / count(*) AS exact_match,
       CAST(sum(levenshtein(pred, expected_text)) AS DOUBLE)
         / sum(strlen(expected_text)) AS cer
FROM p
"""


def _q_transcript_ja_segment(sf_dir: str):
    """Semantic Japanese segmentation (M16) as a value-checked driver query:
    the vectorized BudouX-style batch path (functions/jatok.py) over the
    Japanese-bearing golden text, emitting per-turn phrase-chunk counts.
    The oracle recomputes segmentation INDEPENDENTLY — a DuckDB list-lambda
    over the codepoint array scoring the same UW3/UW4/BW2 feature windows —
    so value-hash equality pins the packed-key numpy kernel against a
    from-scratch SQL implementation of the model, not against itself.
    Reference anchor: BudouX parser per generator, semantic splits —
    manga_ocr_dev/synthetic_data_generator/common/base_generator.py:63,129-155."""
    import pyarrow as pa
    import ray.data as rd

    from manga_ocr_ray.functions.jatok import JaSegmentStage

    ds = rd.read_parquet(f"{_oracle_corpus()}/expected.parquet")
    ds = ds.map_batches(
        JaSegmentStage,
        fn_constructor_kwargs={"text_col": "expected_text", "out_col": "chunks"},
        batch_format="pyarrow", concurrency=(1, 4),
    )

    def project(t: pa.Table) -> pa.Table:
        return t.select(["conv_id", "turn_idx", "n_chunks"])

    return ds.map_batches(project, batch_format="pyarrow")


def _transcript_ja_segment_sql() -> str:
    """From-scratch SQL twin of the default ja-segment model: a break before
    char i iff UW3(prev) + UW4(cur) + BW2(prev||cur) > 0, built from the
    same model constants so the two stay in sync."""
    from manga_ocr_ray.functions.jatok import (
        _BREAK_AFTER_PUNCT, _CLOSERS, _NO_BREAK_BEFORE, _OPENERS,
        _PARTICLE_EXCEPTIONS, _PARTICLES)

    pairs = ", ".join(f"'{p}'" for p in _PARTICLE_EXCEPTIONS)
    return f"""
SELECT conv_id, turn_idx,
  CASE WHEN length(expected_text) = 0 THEN CAST(0 AS BIGINT)
  ELSE CAST(1 + len(list_filter(range(2, length(expected_text) + 1), i ->
    (CASE WHEN strpos('{_PARTICLES}', cs[i-1]) > 0 THEN 100
          WHEN strpos('{_BREAK_AFTER_PUNCT}', cs[i-1]) > 0 THEN 1000
          WHEN strpos('{_CLOSERS}', cs[i-1]) > 0 THEN 500
          WHEN cs[i-1] = ' ' OR cs[i-1] = chr(12288) THEN 1000
          ELSE 0 END)
    + (CASE WHEN strpos('{_NO_BREAK_BEFORE}', cs[i]) > 0 THEN -2000
            WHEN strpos('{_OPENERS}', cs[i]) > 0 THEN 500
            ELSE 0 END)
    + (CASE WHEN (cs[i-1] || cs[i]) IN ({pairs}) THEN -150 ELSE 0 END)
    > 0)) AS BIGINT) END AS n_chunks
FROM (SELECT *, regexp_split_to_array(expected_text, '') AS cs
      FROM '{_ORACLE_CORPUS}/expected.parquet')
"""


def _q_transcript_wer(sf_dir: str):
    """Per-turn word error rate over REAL extraction vs golden (the ASR/OCR
    companion metric to CER): token-unit Levenshtein via the shared numpy
    DP.  Oracle trick: within one (pred, ref) pair edit distance is
    invariant under bijective relabeling, so the SQL twin maps each token to
    a single ASCII byte (chr(32+list_position(vocab, t))) and DuckDB's
    byte-based levenshtein() computes the token distance exactly; turns
    whose combined vocab exceeds the single-byte range are filtered by the
    SAME deterministic predicate on both sides."""
    from manga_ocr_ray.functions.metrics import join_pred_label, wer_batch

    perturbed, expected = _perturbed_extraction()
    joined = join_pred_label(perturbed, expected)
    return joined.map_batches(wer_batch, batch_format="pyarrow")


def _transcript_wer_sql() -> str:
    from manga_ocr_ray.functions.metrics import WER_MAX_VOCAB
    from manga_ocr_ray.functions.textstats import TOKEN_PATTERN

    return f"""
WITH p AS ({_PERTURB_SQL} FROM '{_ORACLE_CORPUS}/expected.parquet'),
 t AS (SELECT conv_id, turn_idx,
              regexp_extract_all(pred, '{TOKEN_PATTERN}') AS ptoks,
              regexp_extract_all(expected_text, '{TOKEN_PATTERN}') AS rtoks
       FROM p),
 v AS (SELECT *, list_distinct(list_concat(ptoks, rtoks)) AS vocab FROM t),
 ms AS (SELECT conv_id, turn_idx, rtoks, vocab,
               -- COALESCE: array_to_string([]) is NULL, not '', in DuckDB
               COALESCE(array_to_string(list_transform(ptoks,
                   x -> chr(32 + list_position(vocab, x))), ''), '') AS mp,
               COALESCE(array_to_string(list_transform(rtoks,
                   x -> chr(32 + list_position(vocab, x))), ''), '') AS mr
        FROM v)
SELECT conv_id, turn_idx,
       CAST(len(rtoks) AS BIGINT) AS n_ref,
       CAST(levenshtein(mp, mr) AS BIGINT) AS edits,
       levenshtein(mp, mr) / greatest(len(rtoks), 1) AS wer
FROM ms WHERE len(vocab) <= {WER_MAX_VOCAB}
"""


def _q_transcript_token_f1(sf_dir: str):
    """Per-turn bag-of-tokens F1 (SQuAD-style span-answer metric) over real
    extraction vs golden — integer multiset-intersection counts plus one
    double; the oracle recomputes the clipped counts via unnest/groupby."""
    from manga_ocr_ray.functions.metrics import join_pred_label, token_f1_batch

    perturbed, expected = _perturbed_extraction()
    joined = join_pred_label(perturbed, expected)
    return joined.map_batches(token_f1_batch, batch_format="pyarrow")


def _transcript_token_f1_sql() -> str:
    from manga_ocr_ray.functions.textstats import TOKEN_PATTERN

    return f"""
WITH p AS ({_PERTURB_SQL} FROM '{_ORACLE_CORPUS}/expected.parquet'),
 pt AS (SELECT conv_id, turn_idx, tok, count(*) AS c FROM (
          SELECT conv_id, turn_idx,
                 unnest(regexp_extract_all(pred, '{TOKEN_PATTERN}')) AS tok
          FROM p) GROUP BY ALL),
 rt AS (SELECT conv_id, turn_idx, tok, count(*) AS c FROM (
          SELECT conv_id, turn_idx,
                 unnest(regexp_extract_all(expected_text, '{TOKEN_PATTERN}')) AS tok
          FROM p) GROUP BY ALL),
 m AS (SELECT pt.conv_id, pt.turn_idx,
              CAST(sum(least(pt.c, rt.c)) AS BIGINT) AS cm
       FROM pt JOIN rt ON pt.conv_id = rt.conv_id
                      AND pt.turn_idx = rt.turn_idx AND pt.tok = rt.tok
       GROUP BY pt.conv_id, pt.turn_idx)
SELECT p.conv_id, p.turn_idx,
       CAST(len(regexp_extract_all(pred, '{TOKEN_PATTERN}')) AS BIGINT) AS n_pred,
       CAST(len(regexp_extract_all(expected_text, '{TOKEN_PATTERN}')) AS BIGINT) AS n_ref,
       COALESCE(m.cm, 0) AS n_common,
       CASE WHEN len(regexp_extract_all(pred, '{TOKEN_PATTERN}'))
               + len(regexp_extract_all(expected_text, '{TOKEN_PATTERN}')) = 0
            THEN 1.0
            ELSE 2.0 * COALESCE(m.cm, 0)
                 / (len(regexp_extract_all(pred, '{TOKEN_PATTERN}'))
                    + len(regexp_extract_all(expected_text, '{TOKEN_PATTERN}')))
       END AS f1
FROM p LEFT JOIN m ON p.conv_id = m.conv_id AND p.turn_idx = m.turn_idx
"""


def _q_transcript_bleu(sf_dir: str) -> pd.DataFrame:
    """Corpus-level BLEU-2 (clipped modified n-gram precision + brevity
    penalty) over real extraction vs golden: per-batch sufficient-statistic
    partials tree-reduce to one row; the four floats are single libm ops off
    exactly-summed int64s."""
    from manga_ocr_ray.functions.metrics import (
        bleu2_from_partials, bleu_partial_batch, join_pred_label)

    perturbed, expected = _perturbed_extraction()
    joined = join_pred_label(perturbed, expected)
    parts = joined.map_batches(bleu_partial_batch, batch_format="pyarrow")
    m = bleu2_from_partials(parts.to_pandas().sum())
    return pd.DataFrame({k: [v] for k, v in m.items()})


def _transcript_bleu_sql() -> str:
    from manga_ocr_ray.functions.textstats import TOKEN_PATTERN

    return f"""
WITH p AS ({_PERTURB_SQL} FROM '{_ORACLE_CORPUS}/expected.parquet'),
 t AS (SELECT conv_id, turn_idx,
              regexp_extract_all(pred, '{TOKEN_PATTERN}') AS ptoks,
              regexp_extract_all(expected_text, '{TOKEN_PATTERN}') AS rtoks
       FROM p),
 big AS (SELECT conv_id, turn_idx,
                list_transform(range(1, len(ptoks)),
                               i -> ptoks[i] || ' ' || ptoks[i+1]) AS pbg,
                list_transform(range(1, len(rtoks)),
                               i -> rtoks[i] || ' ' || rtoks[i+1]) AS rbg
         FROM t),
 c1p AS (SELECT conv_id, turn_idx, g, count(*) AS c FROM
           (SELECT conv_id, turn_idx, unnest(ptoks) AS g FROM t) GROUP BY ALL),
 c1r AS (SELECT conv_id, turn_idx, g, count(*) AS c FROM
           (SELECT conv_id, turn_idx, unnest(rtoks) AS g FROM t) GROUP BY ALL),
 c2p AS (SELECT conv_id, turn_idx, g, count(*) AS c FROM
           (SELECT conv_id, turn_idx, unnest(pbg) AS g FROM big) GROUP BY ALL),
 c2r AS (SELECT conv_id, turn_idx, g, count(*) AS c FROM
           (SELECT conv_id, turn_idx, unnest(rbg) AS g FROM big) GROUP BY ALL),
 m1 AS (SELECT CAST(COALESCE(sum(least(a.c, b.c)), 0) AS BIGINT) AS v
        FROM c1p a JOIN c1r b ON a.conv_id = b.conv_id
                             AND a.turn_idx = b.turn_idx AND a.g = b.g),
 m2 AS (SELECT CAST(COALESCE(sum(least(a.c, b.c)), 0) AS BIGINT) AS v
        FROM c2p a JOIN c2r b ON a.conv_id = b.conv_id
                             AND a.turn_idx = b.turn_idx AND a.g = b.g),
 tots AS (SELECT CAST(sum(len(ptoks)) AS BIGINT) AS t1,
                 CAST(sum(greatest(len(ptoks) - 1, 0)) AS BIGINT) AS t2,
                 CAST(sum(len(ptoks)) AS BIGINT) AS plen,
                 CAST(sum(len(rtoks)) AS BIGINT) AS rlen
          FROM t)
SELECT m1.v AS match1, tots.t1 AS total1, m2.v AS match2, tots.t2 AS total2,
       tots.plen AS pred_len, tots.rlen AS ref_len,
       m1.v / greatest(tots.t1, 1) * 1.0 AS p1,
       m2.v / greatest(tots.t2, 1) * 1.0 AS p2,
       CASE WHEN tots.plen >= tots.rlen THEN 1.0
            ELSE exp(1.0 - tots.rlen / (tots.plen * 1.0)) END AS bp,
       CASE WHEN m1.v > 0 AND m2.v > 0 THEN
         (CASE WHEN tots.plen >= tots.rlen THEN 1.0
               ELSE exp(1.0 - tots.rlen / (tots.plen * 1.0)) END)
         * exp(0.5 * (ln(m1.v * 1.0 / tots.t1) + ln(m2.v * 1.0 / tots.t2)))
       ELSE 0.0 END AS bleu2
FROM m1, m2, tots
"""


def _q_embedding_semdedup(sf_dir: str) -> pd.DataFrame:
    import ray.data as rd
    from manga_ocr_ray.pipelines.llmdata import embedding_semdedup

    ds = rd.read_parquet(f"{sf_dir}/embeddings.parquet",
                         columns=["vec_id", "embedding"])
    return embedding_semdedup(ds)


def _q_doc_dsir_weights(sf_dir: str):
    import ray.data as rd
    from manga_ocr_ray.pipelines.llmdata import doc_dsir_weights

    ds = rd.read_parquet(f"{sf_dir}/documents.parquet",
                         columns=["doc_id", "text", "lang"])
    return doc_dsir_weights(ds)


def _q_source_jsonl_roundtrip(sf_dir: str):
    from manga_ocr_ray.pipelines.llmdata import jsonl_roundtrip

    return jsonl_roundtrip(sf_dir)


def _q_doc_prep_pipeline(sf_dir: str):
    from manga_ocr_ray.pipelines.llmdata import doc_prep_pipeline

    return doc_prep_pipeline(sf_dir)


def _q_doc_ppl_buckets(sf_dir: str):
    from manga_ocr_ray.pipelines.llmdata import doc_ppl_buckets

    return doc_ppl_buckets(sf_dir)


def _q_embedding_knn_classify(sf_dir: str) -> pd.DataFrame:
    import ray.data as rd
    from manga_ocr_ray.pipelines.llmdata import embedding_knn_classify

    ds = rd.read_parquet(f"{sf_dir}/embeddings.parquet")
    return embedding_knn_classify(ds)


def _q_transcript_conv_stats(sf_dir: str):
    """Per-conversation metadata profile over the FULL input schema of the
    north-rule input_hint (conv_id, turn_idx, role, text, tool, ts): turn
    counts by role, tool-call count, wall-clock span.  One map-side
    indicator pass + a combining groupby — the canonical pre-extraction
    corpus triage step (which conversations are agentic, how long they
    run)."""
    import pyarrow as pa
    import pyarrow.compute as pc
    import ray.data as rd
    from ray.data.aggregate import Count, Max, Min, Sum

    ds = rd.read_parquet(f"{_oracle_corpus()}/transcripts.parquet",
                         columns=["conv_id", "role", "tool", "ts"])

    def ind(t: pa.Table) -> pa.Table:
        role = t["role"].combine_chunks().fill_null("")
        tool = t["tool"].combine_chunks().fill_null("")
        return pa.table({
            "conv_id": t["conv_id"],
            "is_user": pc.cast(pc.equal(role, "user"), pa.int64()),
            "is_assistant": pc.cast(pc.equal(role, "assistant"), pa.int64()),
            "is_tool": pc.cast(pc.not_equal(tool, ""), pa.int64()),
            "ts_us": pc.cast(t["ts"], pa.int64()),
        })

    g = (ds.map_batches(ind, batch_format="pyarrow")
         .groupby("conv_id")
         .aggregate(Count(alias_name="n_turns"),
                    Sum("is_user", alias_name="n_user"),
                    Sum("is_assistant", alias_name="n_assistant"),
                    Sum("is_tool", alias_name="n_tool_calls"),
                    Min("ts_us", alias_name="ts_min"),
                    Max("ts_us", alias_name="ts_max")))

    def final(t: pa.Table) -> pa.Table:
        span = (t["ts_max"].to_numpy() - t["ts_min"].to_numpy()) / 1e6
        out = pa.table({
            "conv_id": t["conv_id"],
            "n_turns": pc.cast(t["n_turns"], pa.int64()),
            "n_user": pc.cast(t["n_user"], pa.int64()),
            "n_assistant": pc.cast(t["n_assistant"], pa.int64()),
            "n_tool_calls": pc.cast(t["n_tool_calls"], pa.int64()),
            "span_sec": pa.array(span, pa.float64()),
        })
        return out

    return g.map_batches(final, batch_format="pyarrow")


def _transcript_conv_stats_sql() -> str:
    return f"""
SELECT conv_id, CAST(count(*) AS BIGINT) AS n_turns,
       CAST(sum(CASE WHEN role = 'user' THEN 1 ELSE 0 END) AS BIGINT) AS n_user,
       CAST(sum(CASE WHEN role = 'assistant' THEN 1 ELSE 0 END) AS BIGINT)
         AS n_assistant,
       CAST(sum(CASE WHEN tool IS NOT NULL AND tool <> '' THEN 1 ELSE 0 END)
            AS BIGINT) AS n_tool_calls,
       CAST(date_diff('microsecond', min(ts), max(ts)) AS DOUBLE) / 1000000.0
         AS span_sec
FROM '{_ORACLE_CORPUS}/transcripts.parquet'
GROUP BY conv_id
"""


def _conv_shard_window(columns: list[str], per_shard, *,
                       num_shards: int | None = None,
                       corpus: str | None = None):
    """Shared scaffolding for `lead() OVER (PARTITION BY conv_id ORDER BY
    turn_idx)`-shaped transcript windows (review fix r5 — tool-latency and
    role-transitions previously copy-pasted it): read the projected
    transcript columns, shard by hash(conv_id) so conversations never
    split, and hand each shard — pre-sorted by (conv_id, turn_idx), with
    the shifted boolean ``same_next[i] = conv[i+1] == conv[i]`` — to
    ``per_shard(sorted_table, same_next)``.

    ``num_shards`` defaults to the projected input size / 128 MB (floor 64,
    metadata-only — same rule as conversation_merge's chunk sizing): a fixed
    shard count would put ~15B rows in one in-memory sort at 10^12 turns."""
    import pyarrow as pa
    import pyarrow.compute as pc
    import ray.data as rd
    from manga_ocr_ray.functions.hashing import hash64_array

    ds = rd.read_parquet(f"{corpus or _oracle_corpus()}/transcripts.parquet",
                         columns=columns)
    if num_shards is None:
        num_shards = max(64, int(ds.size_bytes() or 0) // (128 << 20))

    def add_shard(t: pa.Table) -> pa.Table:
        sh = (hash64_array(t["conv_id"]) % np.uint64(num_shards)).astype(np.int32)
        return t.append_column("shard", pa.array(sh))

    def in_shard(g: pa.Table) -> pa.Table:
        g = g.sort_by([("conv_id", "ascending"), ("turn_idx", "ascending")])
        n = g.num_rows
        same_next = np.zeros(n, dtype=bool)
        if n > 1:
            conv = g["conv_id"].combine_chunks()
            same_next[:-1] = pc.equal(conv.slice(1),
                                      conv.slice(0, n - 1)).to_numpy(
                                          zero_copy_only=False)
        return per_shard(g, same_next)

    return (ds.map_batches(add_shard, batch_format="pyarrow")
            .groupby("shard").map_groups(in_shard, batch_format="pyarrow"))


def _q_transcript_tool_latency(sf_dir: str):
    """Per-tool-call response latency: for every turn carrying a tool tag,
    the seconds until the conversation's NEXT turn — ``lead(ts) OVER
    (PARTITION BY conv_id ORDER BY turn_idx)`` re-expressed as the sharded
    vectorized window (hash(conv_id) shards, one Arrow sort + shifted-array
    pass per shard; conversations never split across shards, so the lead is
    exact).  The agent-transcript triage metric for slow tools."""
    import pyarrow as pa
    import pyarrow.compute as pc

    def lead_in_shard(g: pa.Table, same_next: np.ndarray) -> pa.Table:
        ts = pc.cast(g["ts"].combine_chunks(), pa.int64()).to_numpy()
        tool = g["tool"].combine_chunks().fill_null("")
        n = g.num_rows
        lat = np.full(n, np.nan)
        lat[same_next] = (ts[np.flatnonzero(same_next) + 1]
                          - ts[same_next]) / 1e6
        keep = (pc.not_equal(tool, "").to_numpy(zero_copy_only=False)
                & same_next)
        out = pa.table({
            "conv_id": g["conv_id"], "turn_idx": g["turn_idx"], "tool": tool,
            "latency_sec": pa.array(lat, pa.float64()),
        })
        return out.filter(pa.array(keep))

    return _conv_shard_window(["conv_id", "turn_idx", "tool", "ts"],
                              lead_in_shard)


_Q_TRANSCRIPT_TOOL_LATENCY_SQL = f"""
WITH w AS (
  SELECT conv_id, turn_idx, tool,
         date_diff('microsecond', ts,
                   lead(ts) OVER (PARTITION BY conv_id ORDER BY turn_idx))
           / 1000000.0 AS latency_sec
  FROM '{_ORACLE_CORPUS}/transcripts.parquet')
SELECT conv_id, turn_idx, tool, latency_sec
FROM w WHERE tool IS NOT NULL AND tool <> '' AND latency_sec IS NOT NULL
"""


def _q_transcript_role_transitions(sf_dir: str):
    """Markov transition counts between consecutive turn roles within each
    conversation — the conversation-shape audit (user→assistant→tool→…)
    agent-transcript analytics lean on.  Same sharded vectorized window as
    tool-latency above (hash(conv_id) shards, conversations never split, one
    Arrow sort + shifted-equality pass per shard), but each shard REDUCES to
    its |roles|² contingency partial before the shuffle: the combining
    groupby moves O(shards × roles²) rows, never the corpus."""
    import pyarrow as pa
    import pyarrow.compute as pc
    from ray.data.aggregate import Sum

    def transitions_in_shard(g: pa.Table, same_next: np.ndarray) -> pa.Table:
        role = pc.dictionary_encode(g["role"].combine_chunks())
        codes = role.indices.to_numpy(zero_copy_only=False).astype(np.int64)
        vocab = role.dictionary.to_pylist()
        i = np.flatnonzero(same_next)
        r = len(vocab)
        pair_counts = np.bincount(codes[i] * r + codes[i + 1],
                                  minlength=r * r)
        nz = np.flatnonzero(pair_counts)
        return pa.table({
            "from_role": pa.array([vocab[p // r] for p in nz]),
            "to_role": pa.array([vocab[p % r] for p in nz]),
            "n": pa.array(pair_counts[nz].astype(np.int64)),
        })

    agg = (_conv_shard_window(["conv_id", "turn_idx", "role"],
                              transitions_in_shard)
           .groupby(["from_role", "to_role"])
           .aggregate(Sum("n", alias_name="n_pairs")))

    def as_i64(t: pa.Table) -> pa.Table:
        return t.set_column(t.schema.get_field_index("n_pairs"), "n_pairs",
                            pc.cast(t["n_pairs"], pa.int64()))

    return agg.map_batches(as_i64, batch_format="pyarrow")


_Q_TRANSCRIPT_ROLE_TRANSITIONS_SQL = f"""
WITH w AS (
  SELECT role AS from_role,
         lead(role) OVER (PARTITION BY conv_id ORDER BY turn_idx) AS to_role
  FROM '{_ORACLE_CORPUS}/transcripts.parquet')
SELECT from_role, to_role, CAST(count(*) AS BIGINT) AS n_pairs
FROM w WHERE to_role IS NOT NULL GROUP BY 1, 2
"""


_CONTEXT_BUDGET_TOKENS = 512


def _conv_segments(same_next: np.ndarray) -> tuple[np.ndarray, np.ndarray, np.ndarray]:
    """Per-shard conversation-boundary helpers shared by the window
    callbacks: ``same_prev[i]`` (row i-1 is the same conversation), the
    first-row index of each conversation, and each row's 0-based position
    within its conversation."""
    n = len(same_next)
    same_prev = np.zeros(n, dtype=bool)
    same_prev[1:] = same_next[:-1]
    starts = np.flatnonzero(~same_prev)
    pos = np.arange(n) - np.repeat(starts, np.diff(np.append(starts, n)))
    return same_prev, starts, pos


def _q_transcript_context_budget(sf_dir: str):
    """Per-turn RUNNING context size per conversation — ``sum(n_tokens)
    OVER (PARTITION BY conv_id ORDER BY turn_idx ROWS UNBOUNDED
    PRECEDING)`` — plus the over-budget flag a context-window packing /
    truncation pass keys on.  Same sharded vectorized window as
    tool-latency (hash(conv_id) shards, conversations never split): one
    RE2 token-count kernel + one segmented ``np.cumsum`` per shard; no
    per-conversation Python, no second shuffle."""
    import pyarrow as pa
    import pyarrow.compute as pc
    from manga_ocr_ray.functions.textstats import token_count_array

    def cum_in_shard(g: pa.Table, same_next: np.ndarray) -> pa.Table:
        n = g.num_rows
        # NULL text counts as 0 tokens (the SQL twin's windowed sum skips
        # NULLs); without the fill, one NaN poisons the cumsum for every
        # later row in the shard
        ntok = pc.cast(
            token_count_array(g["text"].combine_chunks().fill_null("")),
            pa.int64()).to_numpy(zero_copy_only=False)
        cum = np.cumsum(ntok)
        _, starts, _ = _conv_segments(same_next)     # first turn of each conv
        base = np.repeat(cum[starts] - ntok[starts],
                         np.diff(np.append(starts, n)))
        seg = cum - base
        return pa.table({
            "conv_id": g["conv_id"], "turn_idx": g["turn_idx"],
            "cum_tokens": pa.array(seg, pa.int64()),
            "over_budget": pa.array(seg > _CONTEXT_BUDGET_TOKENS),
        })

    return _conv_shard_window(["conv_id", "turn_idx", "text"], cum_in_shard)


def _transcript_context_budget_sql() -> str:
    from manga_ocr_ray.functions.textstats import TOKEN_PATTERN

    return f"""
WITH w AS (
  SELECT conv_id, turn_idx,
         CAST(sum(len(regexp_extract_all(text, '{TOKEN_PATTERN}'))) OVER
              (PARTITION BY conv_id ORDER BY turn_idx
               ROWS BETWEEN UNBOUNDED PRECEDING AND CURRENT ROW) AS BIGINT)
           AS cum_tokens
  FROM '{_ORACLE_CORPUS}/transcripts.parquet')
SELECT conv_id, turn_idx, cum_tokens,
       cum_tokens > {_CONTEXT_BUDGET_TOKENS} AS over_budget
FROM w
"""


def _q_transcript_tool_chains(sf_dir: str):
    """Longest run of CONSECUTIVE tool-tagged turns per conversation — the
    agentic-loop depth audit (a conversation stuck calling tools 30 turns
    straight is a runaway agent).  Gaps-and-islands re-expressed shard-local:
    conversations never split across hash(conv_id) shards, so each shard
    reduces straight to its per-conversation maxima (run starts/ends from
    shifted boolean masks, per-conv max via ``np.maximum.at``) and the
    groupby moves zero corpus rows — output is conversation-sized."""
    import pyarrow as pa
    import pyarrow.compute as pc

    def chains_in_shard(g: pa.Table, same_next: np.ndarray) -> pa.Table:
        n = g.num_rows
        tool = g["tool"].combine_chunks().fill_null("")
        istool = pc.not_equal(tool, "").to_numpy(zero_copy_only=False)
        same_prev, _, _ = _conv_segments(same_next)
        prev_tool = np.zeros(n, dtype=bool)
        prev_tool[1:] = istool[:-1]
        run_start = istool & ~(prev_tool & same_prev)
        cont_next = np.zeros(n, dtype=bool)
        cont_next[:-1] = istool[1:] & same_next[:-1]
        run_end = istool & ~cont_next
        s_idx, e_idx = np.flatnonzero(run_start), np.flatnonzero(run_end)
        lengths = (e_idx - s_idx + 1).astype(np.int64)
        conv_ord = np.cumsum(~same_prev) - 1          # 0-based conv ordinal
        max_chain = np.zeros(int(conv_ord[-1]) + 1 if n else 0,
                             dtype=np.int64)
        np.maximum.at(max_chain, conv_ord[s_idx], lengths)
        conv_first = np.flatnonzero(~same_prev)
        conv = g["conv_id"].combine_chunks()
        return pa.table({
            "conv_id": conv.take(pa.array(conv_first)),
            "max_tool_chain": pa.array(max_chain),
        })

    return _conv_shard_window(["conv_id", "turn_idx", "tool"],
                              chains_in_shard)


_SFT_CONTEXT_TURNS = 4


def _q_transcript_sft_pairs(sf_dir: str):
    """Transcript → SFT training examples: every assistant turn becomes a
    (prompt, response) pair where the prompt is the last K=4 prior turns
    rendered as ``role: text`` lines — the canonical conversation-to-
    training-data conversion.  Vectorized on the shared conv-shard window:
    K shifted ``take``s of the prefixed column (null where the lag crosses
    a conversation boundary) joined by one ``binary_join_element_wise``
    with null-skip — no per-row Python, no per-conversation group calls.
    Empty history mirrors SQL's NULL (string_agg over an empty frame)."""
    import pyarrow as pa
    import pyarrow.compute as pc

    def sft_in_shard(g: pa.Table, same_next: np.ndarray) -> pa.Table:
        n = g.num_rows
        _, _, pos = _conv_segments(same_next)
        # NULL role or text → NULL pref, exactly the element string_agg
        # skips in the oracle.  pref itself never contains NUL (DuckDB
        # strings can't even hold one), so NUL is a safe join sentinel.
        pref = pc.binary_join_element_wise(
            g["role"].combine_chunks(), g["text"].combine_chunks(), ": ")
        idx = np.arange(n)
        lags = []
        for j in range(_SFT_CONTEXT_TURNS, 0, -1):   # oldest turn first
            valid = pos >= j
            arr = pref.take(pa.array(np.where(valid, idx - j, 0), pa.int64()))
            lags.append(pc.if_else(pa.array(valid), arr,
                                   pa.scalar(None, pa.string())))
        # string_agg-skip semantics with nulls ANYWHERE in the frame (a
        # boundary prefix OR a mid-frame null role/text): join with a NUL
        # sentinel, then drop each sentinel with one adjacent separator —
        # "\x00\n" for non-final skips, "\n\x00" for a final skip, bare
        # "\x00" when every lag was null.  pyarrow's own "skip" mode is
        # unusable here: it DROPS all-null rows, misaligning the batch.
        joined = pc.binary_join_element_wise(
            *lags, "\n", null_handling="replace", null_replacement="\x00")
        for pat in ("\x00\n", "\n\x00", "\x00"):
            joined = pc.replace_substring(joined, pattern=pat, replacement="")
        # empty ⟺ no surviving element (pref always contains ": ") ⟺ SQL NULL
        prompt = pc.if_else(pc.not_equal(joined, ""), joined,
                            pa.scalar(None, pa.string()))
        out = pa.table({"conv_id": g["conv_id"], "turn_idx": g["turn_idx"],
                        "prompt": prompt, "response": g["text"]})
        return out.filter(
            pc.equal(g["role"].combine_chunks(), "assistant"))

    return _conv_shard_window(["conv_id", "turn_idx", "role", "text"],
                              sft_in_shard)


_Q_TRANSCRIPT_SFT_PAIRS_SQL = f"""
SELECT conv_id, turn_idx,
       string_agg(role || ': ' || text, chr(10))
         OVER (PARTITION BY conv_id ORDER BY turn_idx
               ROWS BETWEEN {_SFT_CONTEXT_TURNS} PRECEDING
                        AND 1 PRECEDING) AS prompt,
       text AS response
FROM '{_ORACLE_CORPUS}/transcripts.parquet'
QUALIFY role = 'assistant'
"""


_Q_TRANSCRIPT_TOOL_CHAINS_SQL = f"""
WITH t AS (
  SELECT conv_id, turn_idx,
         (tool IS NOT NULL AND tool <> '') AS is_tool,
         row_number() OVER (PARTITION BY conv_id ORDER BY turn_idx) AS rn
  FROM '{_ORACLE_CORPUS}/transcripts.parquet'),
g AS (
  SELECT conv_id, is_tool,
         rn - row_number() OVER (PARTITION BY conv_id, is_tool
                                 ORDER BY turn_idx) AS grp
  FROM t),
runs AS (
  SELECT conv_id, CAST(count(*) AS BIGINT) AS run_len
  FROM g WHERE is_tool GROUP BY conv_id, grp)
SELECT c.conv_id,
       COALESCE(max(r.run_len), CAST(0 AS BIGINT)) AS max_tool_chain
FROM (SELECT DISTINCT conv_id
      FROM '{_ORACLE_CORPUS}/transcripts.parquet') c
LEFT JOIN runs r USING (conv_id)
GROUP BY c.conv_id
"""


def _q_transcript_strip_ratio(sf_dir: str):
    """Per-payload-kind extraction STRIP RATIO — the north-rule lineage
    metric (SURVEY G3: how much boilerplate the extractor removes per kind)
    as an oracle-gated query over the REAL extraction output.  extract_turns
    already carries raw_chars/extracted_chars per turn, so the metric is one
    combining groupby on the ``tool`` kind column — no extra pass.  The
    oracle recomputes raw lengths from the transcripts table and extracted
    lengths from the golden expected table, so a hash match certifies the
    char accounting AND (again) the per-turn golden equality it rides on."""
    import pyarrow as pa
    import pyarrow.compute as pc
    import ray.data as rd
    from ray.data.aggregate import Count, Sum
    from manga_ocr_ray.pipelines.extract import extract_turns

    ds = rd.read_parquet(f"{_oracle_corpus()}/transcripts.parquet")
    out = extract_turns(ds, batch_size=1024, num_buckets=64, concurrency=(1, 4))
    agg = (out.groupby("tool")
              .aggregate(Count(alias_name="n_turns"),
                         Sum("raw_chars", alias_name="raw_chars"),
                         Sum("extracted_chars", alias_name="extracted_chars")))

    def finish(t: pa.Table) -> pa.Table:
        rc = pc.cast(t["raw_chars"], pa.float64())
        ec = pc.cast(t["extracted_chars"], pa.float64())
        return pa.table({
            "tool": t["tool"],
            "n_turns": pc.cast(t["n_turns"], pa.int64()),
            "raw_chars": pc.cast(t["raw_chars"], pa.int64()),
            "extracted_chars": pc.cast(t["extracted_chars"], pa.int64()),
            "strip_ratio": pc.subtract(pa.scalar(1.0), pc.divide(ec, rc)),
        })

    return agg.map_batches(finish, batch_format="pyarrow")


_Q_TRANSCRIPT_STRIP_RATIO_SQL = f"""
SELECT t.tool, CAST(count(*) AS BIGINT) AS n_turns,
       CAST(sum(length(t.text)) AS BIGINT) AS raw_chars,
       CAST(sum(length(e.expected_text)) AS BIGINT) AS extracted_chars,
       1.0 - CAST(sum(length(e.expected_text)) AS DOUBLE)
             / CAST(sum(length(t.text)) AS DOUBLE) AS strip_ratio
FROM '{_ORACLE_CORPUS}/transcripts.parquet' t
JOIN '{_ORACLE_CORPUS}/expected.parquet' e USING (conv_id, turn_idx)
GROUP BY t.tool
"""


# ---- transcript audit corpus (planted retry-forks and stuck-loops) --------

_AUDIT_CORPUS = "/tmp/graft_audit_corpus_n400_s42_v1"


def _audit_corpus() -> str:
    """Derived transcript corpus with PLANTED retry-forks and stuck-loops,
    written once (atomic, content-deterministic — pure table ops over the
    fixed oracle corpus, no RNG).  The base corpus is generator-unique by
    construction, so the fork/loop audits would be vacuously empty on it;
    planting known shapes keeps their oracles discriminating — the same
    methodology as ``corpus.py``'s planted ruby markup and the sft planted
    corpora.  Every 25th conversation (sorted order) gains a ``~fork`` twin
    sharing its first 3 turns verbatim (a user retry), and every 25th
    offset by 7 gains a ``~loop`` twin whose final turn repeats 3 more
    times (a stuck agent)."""
    import pyarrow as pa
    import pyarrow.parquet as pq

    path = f"{_AUDIT_CORPUS}/transcripts.parquet"
    if not os.path.exists(path):
        base = pq.read_table(f"{_oracle_corpus()}/transcripts.parquet")
        df = base.to_pandas().sort_values(["conv_id", "turn_idx"])
        convs = sorted(df["conv_id"].unique())
        parts = [df]
        for cid in convs[::25]:
            g = df[df["conv_id"] == cid]
            twin = pd.concat([g.head(3), g.iloc[3:5].assign(
                text=lambda x: "(retry) " + x["text"].fillna(""))])
            parts.append(twin.assign(conv_id=cid + "~fork"))
        for cid in convs[7::25]:
            g = df[df["conv_id"] == cid]
            reps = pd.concat([g.tail(1)] * 3, ignore_index=True)
            reps["turn_idx"] = (int(g["turn_idx"].max())
                                + np.arange(1, 4)).astype("int32")
            parts.append(pd.concat([g, reps]).assign(conv_id=cid + "~loop"))
        out = pa.Table.from_pandas(pd.concat(parts, ignore_index=True),
                                   schema=base.schema, preserve_index=False)
        os.makedirs(_AUDIT_CORPUS, exist_ok=True)
        tmp = f"{path}.tmp{os.getpid()}"
        pq.write_table(out, tmp)
        os.replace(tmp, path)
    return _AUDIT_CORPUS


_PREFIX_TURNS = 3


def _q_transcript_prefix_forks(sf_dir: str):
    """Retry/fork detection: groups of conversations sharing an IDENTICAL
    first-``_PREFIX_TURNS``-turn (role, text) prefix — re-submitted prompts
    and agent forks duplicate their opening turns, and a training-data
    pipeline wants one representative per fork group.  Plan: the prefix
    string is assembled per hash(conv_id) shard (conversations never split,
    one Arrow sort + K shifted takes — no per-conversation Python), then
    only (128-bit prefix hash, conv_id) pairs move through ONE groupby —
    prefix text never re-shuffles, the conv_dedup/doc_exact_dedup key
    argument (expected collisions ~1e-14 at 10^12 conversations)."""
    import pyarrow as pa
    import pyarrow.compute as pc
    from ray.data.aggregate import Count, Min
    from manga_ocr_ray.functions.hashing import content_hash128

    def prefix_in_shard(g: pa.Table, same_next: np.ndarray) -> pa.Table:
        n = g.num_rows
        _, starts, _ = _conv_segments(same_next)
        ends = np.append(starts[1:], n)
        part = pc.binary_join_element_wise(
            g["role"].combine_chunks().fill_null(""),
            g["text"].combine_chunks().fill_null("\x1d"), "\x1f")
        parr = part.to_numpy(zero_copy_only=False)
        pre = pd.Series(parr[starts], dtype=object)
        for k in range(1, _PREFIX_TURNS):
            m = starts + k < ends
            nxt = pd.Series(parr[np.minimum(starts + k, n - 1)], dtype=object)
            pre = pre.where(~m, pre + "\x1e" + nxt)
        return pa.table({
            "conv_id": g["conv_id"].combine_chunks().take(pa.array(starts)),
            "prefix": pa.array(pre, pa.string()),
        })

    pre_ds = _conv_shard_window(["conv_id", "turn_idx", "role", "text"],
                                prefix_in_shard, corpus=_audit_corpus())

    def keyed(t: pa.Table) -> pa.Table:
        lo, hi = content_hash128(t["prefix"])
        return pa.table({"conv_id": t["conv_id"],
                         "h_lo": pa.array(lo.view(np.int64)),
                         "h_hi": pa.array(hi.view(np.int64))})

    groups = (pre_ds.map_batches(keyed, batch_format="pyarrow")
              .groupby(["h_lo", "h_hi"])
              .aggregate(Min("conv_id", alias_name="fork_rep"),
                         Count(alias_name="n_convs")))
    return (groups.filter(expr="n_convs >= 2")
            .select_columns(["fork_rep", "n_convs"]))


_Q_TRANSCRIPT_PREFIX_FORKS_SQL = f"""
WITH firstk AS (
  SELECT conv_id,
         coalesce(role, '') || chr(31) || coalesce(text, chr(29)) AS part,
         row_number() OVER (PARTITION BY conv_id ORDER BY turn_idx) AS rn
  FROM '{_AUDIT_CORPUS}/transcripts.parquet'),
p AS (SELECT conv_id, string_agg(part, chr(30) ORDER BY rn) AS pre
      FROM firstk WHERE rn <= {_PREFIX_TURNS} GROUP BY conv_id)
SELECT min(conv_id) AS fork_rep, CAST(count(*) AS BIGINT) AS n_convs
FROM p GROUP BY pre HAVING count(*) >= 2
"""


def _q_transcript_loop_detect(sf_dir: str):
    """Stuck-agent loop audit: per conversation, how many turns REPEAT the
    immediately preceding turn's text verbatim, and the first turn index
    where that happens — a run of identical assistant messages is the
    signature of a retry loop, and a curation pass drops or truncates those
    conversations.  Pure shard-local window (``lag(text)`` equality per
    hash(conv_id) shard, per-conversation reduction via ``np.add.at`` /
    ``np.minimum.at``): the corpus never re-exchanges; output is
    conversation-sized."""
    import pyarrow as pa
    import pyarrow.compute as pc

    def loops_in_shard(g: pa.Table, same_next: np.ndarray) -> pa.Table:
        n = g.num_rows
        same_prev, starts, _ = _conv_segments(same_next)
        text = g["text"].combine_chunks()
        eq_prev = np.zeros(n, dtype=bool)
        if n > 1:
            eq_prev[1:] = pc.equal(text.slice(1), text.slice(0, n - 1)) \
                .fill_null(False).to_numpy(zero_copy_only=False)
        rep = same_prev & eq_prev
        conv_ord = (np.cumsum(~same_prev) - 1) if n else np.zeros(0, np.int64)
        n_convs = len(starts)
        counts = np.zeros(n_convs, dtype=np.int64)
        np.add.at(counts, conv_ord[rep], 1)
        turn = g["turn_idx"].combine_chunks().to_numpy().astype(np.int64)
        first = np.full(n_convs, np.iinfo(np.int64).max, dtype=np.int64)
        np.minimum.at(first, conv_ord[rep], turn[rep])
        return pa.table({
            "conv_id": g["conv_id"].combine_chunks().take(pa.array(starts)),
            "n_repeat_turns": pa.array(counts),
            "first_repeat_turn": pa.array(
                np.where(counts > 0, first, 0).astype(np.int32),
                pa.int32(), mask=counts == 0),
        })

    return _conv_shard_window(["conv_id", "turn_idx", "text"],
                              loops_in_shard, corpus=_audit_corpus())


_Q_TRANSCRIPT_LOOP_DETECT_SQL = f"""
WITH r AS (
  SELECT conv_id, turn_idx,
         coalesce(text = lag(text) OVER (PARTITION BY conv_id
                                         ORDER BY turn_idx), FALSE) AS rep
  FROM '{_AUDIT_CORPUS}/transcripts.parquet')
SELECT conv_id,
       CAST(count(*) FILTER (WHERE rep) AS BIGINT) AS n_repeat_turns,
       min(turn_idx) FILTER (WHERE rep) AS first_repeat_turn
FROM r GROUP BY conv_id
"""


def _q_transcript_near_dup(sf_dir: str) -> pd.DataFrame:
    """Conversation-level NEAR-dup triage on RAW transcripts — the
    pre-extraction composition (ordered raw-turn merge → MinHash+LSH bands
    → exact-Jaccard verify) that drops re-submitted/forked conversations
    BEFORE extraction cost is paid.  The audit corpus's planted ``~loop``
    twins (J ≈ 0.97–1.0) and long-prefix ``~fork`` twins (J up to 0.97)
    are exactly what it must catch; threshold 0.6 sits in a measured
    corpus gap (nearest pair Jaccards 0.567 / 0.669 — no float-tie risk,
    the ADVICE r4 margin rule).  conv_id strings ride the band shuffles as
    64-bit hashes; the string ids come back via a conversation-sized map
    (at web scale, swap the driver map for ``minhash_lsh_pairs_ds`` + one
    hash-keyed conv-id join — pair output is conversation-sized either
    way)."""
    import pyarrow as pa
    import pyarrow.compute as pc
    import ray.data as rd
    from manga_ocr_ray.functions.hashing import hash64_array
    from manga_ocr_ray.pipelines.extract import conversation_merge
    from manga_ocr_ray.stages.dedup import minhash_lsh_pairs

    ds = rd.read_parquet(f"{_audit_corpus()}/transcripts.parquet",
                         columns=["conv_id", "turn_idx", "text"])
    merged = conversation_merge(ds, text_col="text", chunk_size=64)

    def keyed(t: pa.Table) -> pa.Table:
        h = hash64_array(t["conv_id"]).view(np.int64)
        return pa.table({"cid": pa.array(h), "text": t["merged_text"]})

    pairs = minhash_lsh_pairs(merged.map_batches(keyed, batch_format="pyarrow"),
                              threshold=0.6, num_hashes=128, bands=64,
                              id_col="cid", text_col="text")
    ids = (rd.read_parquet(f"{_audit_corpus()}/transcripts.parquet",
                           columns=["conv_id"])
           .map_batches(lambda t: pa.table(
               {"conv_id": pc.unique(t["conv_id"].combine_chunks())}),
               batch_format="pyarrow")
           .to_pandas()["conv_id"].drop_duplicates())
    m = dict(zip(hash64_array(pa.array(ids)).view(np.int64), ids))
    a = pairs["id_a"].map(m).to_numpy(dtype=object)
    b = pairs["id_b"].map(m).to_numpy(dtype=object)
    out = pd.DataFrame({"conv_a": np.minimum(a, b).astype(str),
                        "conv_b": np.maximum(a, b).astype(str)})
    return out.sort_values(["conv_a", "conv_b"]).reset_index(drop=True)


def _transcript_near_dup_sql() -> str:
    from manga_ocr_ray.functions.textstats import SHINGLE_TOKEN_PATTERN

    return f"""
WITH m AS (SELECT conv_id, string_agg(text, chr(10) ORDER BY turn_idx) AS text
           FROM '{_AUDIT_CORPUS}/transcripts.parquet' GROUP BY conv_id),
toks AS (SELECT conv_id,
                regexp_extract_all(lower(text), '{SHINGLE_TOKEN_PATTERN}') ws
         FROM m),
grams AS (SELECT conv_id,
                 CASE WHEN len(ws) < 3 THEN [array_to_string(ws, ' ')]
                      ELSE list_distinct(list_transform(
                               generate_series(1, len(ws)-2),
                               i -> ws[i] || ' ' || ws[i+1] || ' ' || ws[i+2]))
                 END AS gs
          FROM toks)
SELECT conv_a, conv_b FROM (
  SELECT a.conv_id AS conv_a, b.conv_id AS conv_b,
         len(list_intersect(a.gs, b.gs)) * 1.0
           / len(list_distinct(list_concat(a.gs, b.gs))) AS j
  FROM grams a JOIN grams b ON a.conv_id < b.conv_id) t
WHERE j >= 0.6
"""


def _q_transcript_curation_gate(sf_dir: str):
    """Conversation-level TRAINING-DATA GATE — the chat-corpus analog of
    :func:`manga_ocr_ray.pipelines.documents.q_doc_gopher_rules`: keep a
    conversation iff (a) 4–100 turns, (b) it has at least one user AND one
    assistant turn, (c) zero role-alternation violations (adjacent
    same-role turns, tool runs exempt — consecutive tool results are
    legitimate), and (d) it ends on an assistant turn (SFT-ready).  All
    rules are integer/boolean — no float tie can flip the gate.  One pass
    per hash(conv_id) shard computes every rule (``np.add.at`` per-conv
    reductions over the sorted window); output is conversation-sized, the
    corpus never re-exchanges."""
    import pyarrow as pa
    import pyarrow.compute as pc

    def gate_in_shard(g: pa.Table, same_next: np.ndarray) -> pa.Table:
        n = g.num_rows
        same_prev, starts, _ = _conv_segments(same_next)
        ends = np.append(starts[1:], n)
        role = g["role"].combine_chunks().fill_null("")
        rnp = role.to_numpy(zero_copy_only=False)
        conv_ord = (np.cumsum(~same_prev) - 1) if n else np.zeros(0, np.int64)
        n_convs = len(starts)
        n_turns = (ends - starts).astype(np.int64)

        def per_conv_count(mask: np.ndarray) -> np.ndarray:
            out = np.zeros(n_convs, dtype=np.int64)
            np.add.at(out, conv_ord[mask], 1)
            return out

        eq_prev = np.zeros(n, dtype=bool)
        if n > 1:
            eq_prev[1:] = rnp[1:] == rnp[:-1]
        viol = per_conv_count(same_prev & eq_prev & (rnp != "tool"))
        n_user = per_conv_count(rnp == "user")
        n_assistant = per_conv_count(rnp == "assistant")
        ends_assistant = rnp[ends - 1] == "assistant" if n else \
            np.zeros(0, bool)
        r_len = (n_turns >= 4) & (n_turns <= 100)
        r_both = (n_user > 0) & (n_assistant > 0)
        r_alt = viol == 0
        return pa.table({
            "conv_id": g["conv_id"].combine_chunks().take(pa.array(starts)),
            "n_turns": pa.array(n_turns),
            "n_role_repeats": pa.array(viol),
            "r_len": pa.array(r_len),
            "r_both_roles": pa.array(r_both),
            "r_alternation": pa.array(r_alt),
            "r_ends_assistant": pa.array(ends_assistant),
            "keep": pa.array(r_len & r_both & r_alt & ends_assistant),
        })

    return _conv_shard_window(["conv_id", "turn_idx", "role"], gate_in_shard)


_Q_TRANSCRIPT_CURATION_GATE_SQL = f"""
WITH t AS (
  SELECT conv_id, turn_idx, coalesce(role, '') AS role
  FROM '{_ORACLE_CORPUS}/transcripts.parquet'),
v AS (
  SELECT conv_id, turn_idx, role,
         coalesce(role = lag(role) OVER (PARTITION BY conv_id
                                         ORDER BY turn_idx)
                  AND role <> 'tool', FALSE) AS viol
  FROM t),
g AS (
  SELECT conv_id, CAST(count(*) AS BIGINT) AS n_turns,
         CAST(count(*) FILTER (WHERE viol) AS BIGINT) AS n_role_repeats,
         count(*) FILTER (WHERE role = 'user') > 0 AS has_user,
         count(*) FILTER (WHERE role = 'assistant') > 0 AS has_assistant,
         arg_max(role, turn_idx) = 'assistant' AS r_ends_assistant
  FROM v GROUP BY conv_id)
SELECT conv_id, n_turns, n_role_repeats,
       n_turns BETWEEN 4 AND 100 AS r_len,
       has_user AND has_assistant AS r_both_roles,
       n_role_repeats = 0 AS r_alternation,
       r_ends_assistant,
       (n_turns BETWEEN 4 AND 100 AND has_user AND has_assistant
        AND n_role_repeats = 0 AND r_ends_assistant) AS keep
FROM g
"""


def _q_transcript_conv_dedup(sf_dir: str):
    """Exact dedup of MERGED conversations — the flagship-domain composition
    (extraction → ordered per-conversation merge → 128-bit content keys →
    per-content min representative) that collapses copy-paste conversations
    before training.  Only (hash, conv_id) pairs move through the dedup
    groupby and the rep join — merged text never re-shuffles.  The oracle
    partitions the golden merged strings directly, so a hash match certifies
    the whole chain including that 128-bit keys stand in for string equality
    (the doc_exact_dedup argument: expected collisions ~1e-14 at 10^12
    rows)."""
    import pyarrow as pa
    import ray.data as rd
    from ray.data.aggregate import Min
    from manga_ocr_ray.functions.hashing import content_hash128
    from manga_ocr_ray.pipelines.extract import conversation_merge, extract_turns
    from manga_ocr_ray.pipelines.relational import _join_partitions

    ds = rd.read_parquet(f"{_oracle_corpus()}/transcripts.parquet")
    merged = conversation_merge(
        extract_turns(ds, num_buckets=16, concurrency=(1, 4)), chunk_size=64)

    def keyed(t: pa.Table) -> pa.Table:
        lo, hi = content_hash128(t["merged_text"])
        return pa.table({"conv_id": t["conv_id"],
                         "h_lo": pa.array(lo.view(np.int64)),
                         "h_hi": pa.array(hi.view(np.int64))})

    k = merged.map_batches(keyed, batch_format="pyarrow").materialize()
    n_parts = max(1, min(_join_partitions(), k.count() // 1000))
    reps = k.groupby(["h_lo", "h_hi"]).aggregate(
        Min("conv_id", alias_name="rep_conv"))
    out = k.join(reps, join_type="inner", num_partitions=n_parts,
                 on=("h_lo", "h_hi"))
    return out.select_columns(["conv_id", "rep_conv"])


_Q_TRANSCRIPT_CONV_DEDUP_SQL = f"""
WITH m AS (SELECT conv_id,
                  string_agg(expected_text, chr(10) ORDER BY turn_idx) AS t
           FROM '{_ORACLE_CORPUS}/expected.parquet' GROUP BY conv_id)
SELECT conv_id, min(conv_id) OVER (PARTITION BY t) AS rep_conv FROM m
"""


def entry() -> Any:
    """Flagship pipeline at sf0.001 scale: deterministic transcript corpus →
    actor-pool extraction → normalized per-turn output."""
    from manga_ocr_ray.corpus import transcripts_dataset
    from manga_ocr_ray.pipelines.extract import extract_turns

    ds = transcripts_dataset(_n_convs("/root/testdata/sf0.001"), seed=42,
                             mega_every=997, mega_turns=200)
    return extract_turns(ds, batch_size=1024, num_buckets=64)


# ---- similarity / embedding queries ---------------------------------------

def _q_embedding_topk(sf_dir: str) -> pd.DataFrame:
    import ray.data as rd
    from manga_ocr_ray.stages.similarity import knn_topk

    ds = rd.read_parquet(f"{sf_dir}/embeddings.parquet", columns=["vec_id", "embedding"])
    qdf = (
        ds.filter(expr="vec_id < 8").to_pandas().sort_values("vec_id")
    )
    queries = np.stack(qdf["embedding"].to_numpy()).astype(np.float64)
    return knn_topk(ds, queries, k=5, query_ids=qdf["vec_id"].to_numpy())


_Q_EMBEDDING_TOPK_SQL = """
WITH q AS (SELECT vec_id AS query_id, CAST(embedding AS DOUBLE[]) qe
           FROM embeddings WHERE vec_id < 8),
     s AS (SELECT q.query_id, e.vec_id AS neighbor_id,
                  list_cosine_similarity(q.qe, CAST(e.embedding AS DOUBLE[])) AS cosine
           FROM q CROSS JOIN embeddings e WHERE e.vec_id <> q.query_id)
SELECT query_id, rank, neighbor_id FROM (
  SELECT query_id, neighbor_id,
         row_number() OVER (PARTITION BY query_id ORDER BY cosine DESC, neighbor_id) AS rank
  FROM s) t WHERE rank <= 5
"""


def _q_embedding_near_dup(sf_dir: str) -> pd.DataFrame:
    """Oracle gate: the exact O(n²) variant (broadcast matrix — oracle scale
    only; the production default is the LSH path below)."""
    import ray.data as rd
    from manga_ocr_ray.stages.similarity import embedding_near_dup_pairs_exact

    ds = rd.read_parquet(f"{sf_dir}/embeddings.parquet", columns=["vec_id", "embedding"])
    out = embedding_near_dup_pairs_exact(ds, threshold=0.45)
    return out[["id_a", "id_b"]]


def _q_embedding_near_dup_lsh(sf_dir: str) -> pd.DataFrame:
    """The scale path (hyperplane LSH buckets, shard-verified): exact
    precision always; recall tuned to near-exhaustive here
    (target_recall=0.9999, max_tables=64 → (4 planes, 64 tables): a
    threshold-exact pair is missed w.p. (1−p⁴)⁶⁴ ≈ 4e-6, p=0.6485) so the
    seeded LSH recovers the full exact pair set deterministically at BOTH
    test scales and shares the exact oracle.  The production default stays
    (4, 16) / 0.95 recall — the IO-bounded setting; this gate deliberately
    pays 4× table replication to make the strict value-hash gate meaningful
    (the default setting misses one borderline sf0.001 pair by design)."""
    import ray.data as rd
    from manga_ocr_ray.stages.similarity import embedding_near_dup_pairs

    ds = rd.read_parquet(f"{sf_dir}/embeddings.parquet", columns=["vec_id", "embedding"])
    out = embedding_near_dup_pairs(ds, threshold=0.45,
                                   target_recall=0.9999, max_tables=64)
    return out[["id_a", "id_b"]]


_Q_EMBEDDING_NEAR_DUP_SQL = """
SELECT a.vec_id AS id_a, b.vec_id AS id_b
FROM embeddings a JOIN embeddings b ON a.vec_id < b.vec_id
WHERE list_cosine_similarity(CAST(a.embedding AS DOUBLE[]),
                             CAST(b.embedding AS DOUBLE[])) >= 0.45
"""


def _q_embedding_ivf_topk(sf_dir: str) -> pd.DataFrame:
    """Approximate IVF variant (rows-only: approximation ≠ SQL oracle)."""
    import ray.data as rd
    from manga_ocr_ray.stages.similarity import ivf_knn_topk

    ds = rd.read_parquet(f"{sf_dir}/embeddings.parquet", columns=["vec_id", "embedding"])
    qdf = ds.filter(expr="vec_id < 8").to_pandas().sort_values("vec_id")
    queries = np.stack(qdf["embedding"].to_numpy()).astype(np.float64)
    return ivf_knn_topk(ds, queries, k=5)


# ---- dedup queries ---------------------------------------------------------

def _q_doc_minhash_dedup(sf_dir: str) -> pd.DataFrame:
    import ray.data as rd
    from manga_ocr_ray.stages.dedup import minhash_lsh_pairs

    ds = rd.read_parquet(f"{sf_dir}/documents.parquet", columns=["doc_id", "text"])
    pairs = minhash_lsh_pairs(ds, threshold=0.8, num_hashes=128, bands=32)
    return pairs[["id_a", "id_b"]].astype("int64")


def _lang_id_sql() -> str:
    from manga_ocr_ray.functions.textstats import lang_id_sql

    return f"SELECT doc_id, {lang_id_sql('text')} AS lang_pred FROM documents"


def _minhash_pair_sql() -> str:
    from manga_ocr_ray.pipelines.documents import Q_DOC_MINHASH_PAIR_SQL

    return Q_DOC_MINHASH_PAIR_SQL


def _q_doc_ngram_jaccard(sf_dir: str) -> pd.DataFrame:
    import ray.data as rd
    from manga_ocr_ray.stages.dedup import ngram_jaccard_pairs

    ds = rd.read_parquet(f"{sf_dir}/documents.parquet", columns=["doc_id", "text"])
    return ngram_jaccard_pairs(ds, threshold=0.15)[["id_a", "id_b"]].astype("int64")




def _q_doc_simhash_pairs(sf_dir: str) -> pd.DataFrame:
    import ray.data as rd
    from manga_ocr_ray.stages.dedup import simhash_near_dup_pairs

    ds = rd.read_parquet(f"{sf_dir}/documents.parquet", columns=["doc_id", "text"])
    return simhash_near_dup_pairs(ds, max_hamming=3)


def _q_events_approx_users(sf_dir: str) -> pd.DataFrame:
    """HLL approximate distinct users (rows-only: a sketch has no exact SQL
    twin; accuracy is pinned by tests/test_sketch.py instead)."""
    import ray.data as rd
    from manga_ocr_ray.stages.sketch import approx_distinct

    ds = rd.read_parquet(f"{sf_dir}/events.parquet", columns=["user_id"])
    return pd.DataFrame({"approx_users": [approx_distinct(ds, "user_id")]})


def _q_events_type_users_approx(sf_dir: str):
    """Per-group HLL distinct (rows-only: sketch; accuracy pinned by
    tests/test_metrics_sketch.py vs the exact per-group count)."""
    import ray.data as rd
    from manga_ocr_ray.stages.sketch import grouped_approx_distinct

    ds = rd.read_parquet(f"{sf_dir}/events.parquet",
                         columns=["event_type", "user_id"])
    return grouped_approx_distinct(ds, "event_type", "user_id")


def _q_orders_quantiles_approx(sf_dir: str) -> pd.DataFrame:
    """Histogram-sketch quantiles of order totalprice (rows-only: approx;
    accuracy pinned by tests/test_metrics_sketch.py; exact twin =
    orders_price_quantiles)."""
    import ray.data as rd
    from manga_ocr_ray.stages.sketch import approx_quantiles

    ds = rd.read_parquet(f"{sf_dir}/orders.parquet", columns=["o_totalprice"])
    out = approx_quantiles(ds, "o_totalprice", (0.25, 0.5, 0.75))
    return pd.DataFrame({"p25": [out[0.25]], "median": [out[0.5]], "p75": [out[0.75]]})


def _q_events_heavy_users(sf_dir: str) -> pd.DataFrame:
    """Misra-Gries heavy hitters over event user_ids (bounded memory per
    block).  At this scale the column cardinality fits the summary capacity,
    so the sketch is exact and oracle-checkable; beyond capacity it degrades
    gracefully to guaranteed-within-n/capacity estimates (pytest-pinned)."""
    import ray.data as rd
    from manga_ocr_ray.stages.sketch import heavy_hitters

    ds = rd.read_parquet(f"{sf_dir}/events.parquet", columns=["user_id"])
    out = heavy_hitters(ds, "user_id", k=10, capacity=4096)
    return out.rename(columns={"item": "user_id"})


_Q_EVENTS_HEAVY_USERS_SQL = """
SELECT user_id, count(*) AS est_count
FROM events GROUP BY user_id
ORDER BY est_count DESC, user_id LIMIT 10
"""


def _q_orders_quantiles_approx_grouped(sf_dir: str) -> pd.DataFrame:
    """PER-GROUP histogram-sketch quantiles — the scale path behind the exact
    orders_price_quantiles (whose per-group materialization is a skew hazard
    at 10^12 rows).  Rows-only: approx; accuracy pinned in pytest."""
    import ray.data as rd
    from manga_ocr_ray.stages.sketch import grouped_approx_quantiles

    ds = rd.read_parquet(f"{sf_dir}/orders.parquet",
                         columns=["o_orderpriority", "o_totalprice"])
    out = grouped_approx_quantiles(ds, "o_orderpriority", "o_totalprice").to_pandas()
    return out.sort_values("o_orderpriority").reset_index(drop=True)


def _q_embedding_quantize(sf_dir: str):
    """Per-dim min/max scalar quantization to 0..254 (int8-style compression
    for embedding columns) — exploded (vec_id, dim, q) rows."""
    import ray.data as rd
    from manga_ocr_ray.stages.similarity import quantize_embeddings

    ds = rd.read_parquet(f"{sf_dir}/embeddings.parquet", columns=["vec_id", "embedding"])
    return quantize_embeddings(ds)


_Q_EMBEDDING_QUANTIZE_SQL = """
WITH ex AS (
  SELECT vec_id, generate_subscripts(embedding, 1) - 1 AS dim,
         unnest(CAST(embedding AS DOUBLE[])) AS value
  FROM embeddings),
rng AS (SELECT dim, min(value) AS lo, greatest(max(value) - min(value), 1e-30) AS span
        FROM ex GROUP BY dim)
SELECT ex.vec_id, ex.dim,
       CAST(floor((ex.value - rng.lo) / rng.span * 254 + 0.5) AS BIGINT) AS q
FROM ex JOIN rng ON ex.dim = rng.dim
"""


def _q_embedding_kmeans(sf_dir: str) -> pd.DataFrame:
    """Distributed Lloyd's k-means with integer-quantized partial sums —
    deterministic at any cluster size (rows-only: iterative, no SQL twin;
    quality + determinism pytest-pinned)."""
    import ray.data as rd
    from manga_ocr_ray.stages.similarity import kmeans_embeddings

    ds = rd.read_parquet(f"{sf_dir}/embeddings.parquet", columns=["vec_id", "embedding"])
    return kmeans_embeddings(ds, k=8, iters=4)


def _q_embedding_centroids(sf_dir: str):
    """Per-label mean embedding as (label, dim, centroid) scalar rows —
    vector aggregation where only scalar partials shuffle."""
    import ray.data as rd
    from manga_ocr_ray.stages.similarity import label_centroids

    ds = rd.read_parquet(f"{sf_dir}/embeddings.parquet",
                         columns=["vec_id", "embedding", "label"])
    return label_centroids(ds)


_Q_EMBEDDING_CENTROIDS_SQL = """
WITH ex AS (SELECT label,
                   unnest(list_transform(generate_series(1, len(embedding)), i -> i - 1)) AS dim,
                   unnest(CAST(embedding AS DOUBLE[])) AS value
            FROM embeddings)
SELECT CAST(label AS BIGINT) AS label, dim, avg(value) AS centroid
FROM ex GROUP BY label, dim
"""


def _q_doc_lang_id(sf_dir: str):
    import ray.data as rd
    from manga_ocr_ray.functions.textstats import LangIdStage

    ds = rd.read_parquet(f"{sf_dir}/documents.parquet", columns=["doc_id", "text"])
    return ds.map_batches(LangIdStage, batch_format="pyarrow", concurrency=(1, 2)).select_columns(
        ["doc_id", "lang_pred"]
    )


# ---- registry-compiled pipeline (§2.10 plugin surface) ---------------------

def _q_registry_clean(sf_dir: str):
    """Spec-driven pipeline (the reference's config-as-data augmentation
    compiler, training/augmentations.py:49-117, re-expressed): wrap docs in
    HTML noise → strip → normalize → token-count, compiled from a declarative
    step list by manga_ocr_ray.registry.build_pipeline."""
    import ray.data as rd
    from manga_ocr_ray.registry import build_pipeline

    pipe = build_pipeline([
        {"op": "wrap_html", "in_col": "text", "out_col": "wrapped"},
        {"op": "strip_html", "in_col": "wrapped", "out_col": "clean_text"},
        {"op": "normalize", "in_col": "clean_text", "out_col": "clean_text"},
        {"op": "token_count", "in_col": "clean_text", "out_col": "n_tokens"},
        {"op": "select", "columns": ["doc_id", "clean_text", "n_tokens"]},
    ])
    return pipe(rd.read_parquet(f"{sf_dir}/documents.parquet", columns=["doc_id", "text"]))


def _q_spec_clean(sf_dir: str):
    """Same pipeline as registry_clean but driven end-to-end from a YAML spec
    file through the typed loader (spec.py: pydantic validation + env
    interpolation) — shares registry_clean's oracle."""
    from manga_ocr_ray.spec import load_spec, run_spec

    spec_path = f"/tmp/graft_spec_clean_{os.getpid()}.yaml"
    with open(spec_path, "w") as f:
        f.write(f"""
input:
  path: {sf_dir}/documents.parquet
  columns: [doc_id, text]
steps:
  - {{op: wrap_html, in_col: text, out_col: wrapped}}
  - {{op: strip_html, in_col: wrapped, out_col: clean_text}}
  - {{op: normalize, in_col: clean_text, out_col: clean_text}}
  - {{op: token_count, in_col: clean_text, out_col: n_tokens}}
  - {{op: select, columns: [doc_id, clean_text, n_tokens]}}
""")
    try:
        return run_spec(load_spec(spec_path))
    finally:
        os.unlink(spec_path)


def _registry_clean_sql() -> str:
    from manga_ocr_ray.functions.html import strip_html_sql
    from manga_ocr_ray.pipelines.documents import _HTML_POST, _HTML_PRE, normalize_sql

    pre = _HTML_PRE.replace("'", "''")
    post = _HTML_POST.replace("'", "''")
    clean = normalize_sql(strip_html_sql(f"'{pre}' || text || '{post}'"))
    from manga_ocr_ray.functions.textstats import TOKEN_PATTERN

    return (
        f"SELECT doc_id, {clean} AS clean_text, "
        f"len(regexp_extract_all({clean}, '{TOKEN_PATTERN}')) AS n_tokens FROM documents"
    )


def _q_media_features(sf_dir: str):
    """Multimodal decode → feature extraction on an actor pool over binary
    payload rows, using the REAL codecs (uncompressed BMP / netpbm / PCM WAV
    decoded from their public specs with numpy+stdlib — functions/
    imagecodec.py; rows-only: binary payloads have no SQL analog)."""
    import ray.data as rd
    from manga_ocr_ray.stages.media import make_real_media_table, media_feature_pipeline

    n = max(64, int(6400 * _sf_of(sf_dir)))
    ds = rd.from_arrow(make_real_media_table(n)).repartition(max(2, n // 64))
    return media_feature_pipeline(ds, concurrency=(1, 2), batch_size=64,
                                  fake_codec=False)


def _q_media_exttool(sf_dir: str):
    """External-process-per-actor (A4, the reference's persistent renderer
    process — renderer.py:121-171): each actor spawns one worker subprocess
    that decodes payloads over a length-prefixed pipe protocol, restarted on
    crash (rows-only: subprocess output has no SQL analog)."""
    import ray.data as rd
    from manga_ocr_ray.stages.extproc import external_tool_pipeline
    from manga_ocr_ray.stages.media import make_real_media_table

    n = max(48, int(2400 * _sf_of(sf_dir)))
    ds = rd.from_arrow(make_real_media_table(n)).repartition(max(2, n // 48))
    return external_tool_pipeline(ds, concurrency=(1, 2), batch_size=48)


def _q_media_frames(sf_dir: str):
    """Frame-sample fan-out: one row per sampled frame of each fake video
    payload (rows-only: binary payloads have no SQL analog)."""
    import pyarrow as pa

    import ray.data as rd
    from manga_ocr_ray.stages.media import frame_sample_pipeline, make_fake_media_table

    n = max(32, int(3200 * _sf_of(sf_dir)))
    t = make_fake_media_table(n)
    t = t.set_column(t.column_names.index("duration_ms"), "duration_ms",
                     pa.array(np.full(n, 4000, dtype=np.int32), pa.int32()))
    ds = rd.from_arrow(t).repartition(max(2, n // 32))
    return frame_sample_pipeline(ds, every_ms=1000)


def queries() -> dict[str, Callable[[str], Any]]:
    """Ordered so that the first 50 entries (the driver's correctness window)
    are exactly 50 oracle-bearing queries.  ROUND-5 ROTATION (r4 VERDICT
    item 1 — the final certification-completeness pass): the flagship
    transcript gates stay first, the next slots hold every operator whose
    execution PLAN changed during round 5 and therefore needs driver
    re-certification (doc_tfidf_top_terms sharded finish, transcript_merge
    barrier knob, embedding_semdedup Arrow dedup_cluster,
    events_segment_revenue skew-join Arrow hot path, the session-4
    de-shuffled q1/bloom-semi/price-quantiles finishes, the sf0.001 minhash
    recall gate) plus two never-certified round-5 transcript additions
    (conv-dedup, strip-ratio), and the remaining 36 slots are exactly the
    oracle-bearing queries the driver had NEVER certified in rounds 1-4
    (the TPC-H completion wave q2/q4/q6-q16/q18-q22, SemDeDup, DSIR, jsonl
    round-trip, ppl-buckets, winnowing, chunking, BPE pairs, knn-classify,
    conv-stats, tool-latency, fill/clean, percent-rank, MAD, funnel-latency,
    char-entropy, weighted-sample, ntile, dense-rank) — green rows raise
    cumulative driver certification to 133/133 of the round-4 oracle-bearing
    set plus first-time round-5 entries.  Displaced entries were driver-green
    in CORRECTNESS_r02-r04 and stay value-checked by
    scripts/check_oracle.py."""
    from manga_ocr_ray.pipelines import analytic as A
    from manga_ocr_ray.pipelines import documents as D
    from manga_ocr_ray.pipelines import relational as R
    from manga_ocr_ray.pipelines import tpch as T
    from manga_ocr_ray.pipelines import tpch2 as T2
    from manga_ocr_ray.pipelines import textprep as X

    return {
        # flagship transcript pipelines (oracle = golden expected table —
        # the reference's tests/test_ocr.py:21-41 golden gate, driver-visible)
        "transcript_extract": _q_transcript_extract,
        "transcript_merge": _q_transcript_merge,
        "transcript_cjk_stats": _q_transcript_cjk_stats,
        "transcript_cer": _q_transcript_cer,
        "transcript_ja_segment": _q_transcript_ja_segment,
        # operators whose execution plans changed during round 5 (must be
        # driver-RE-certified): q1/bloom-semi/price-quantiles got de-shuffled
        # block-local finishes in session 4, minhash got the sf0.001 recall
        # gate, tfidf/segment-revenue/user-active-days changed in session 1
        "q1_pricing_summary": R.q1_pricing_summary,
        "lineitem_bloom_semi": A.q_lineitem_bloom_semi,
        "orders_price_quantiles": R.q_orders_price_quantiles,
        "doc_minhash_dedup": _q_doc_minhash_dedup,
        # round-5 transcript additions, never driver-certified (on-theme:
        # conversation-level exact dedup of the merged flagship output, and
        # the per-kind extraction strip-ratio metric)
        "transcript_conv_dedup": _q_transcript_conv_dedup,
        "transcript_strip_ratio": _q_transcript_strip_ratio,
        "doc_tfidf_top_terms": D.q_doc_tfidf_top_terms,   # sharded top-5 (r5)
        "events_segment_revenue": A.q_events_segment_revenue,  # Arrow hot path (r5)
        # join removed (Acero empty-partition wedge) — re-certify (r5)
        "events_user_active_days": A.q_events_user_active_days,
        # ---- the 36 never-driver-certified oracle-bearing queries ----
        # TPC-H completion wave (driver schema adaptations, tpch.py/tpch2.py)
        "q2_min_cost_supplier": T2.q2_min_cost_supplier,
        "q4_order_priority": T.q4_order_priority,
        "q6_forecast_revenue": T.q6_forecast_revenue,
        "q7_two_nation_volume": A.q7_two_nation_volume,
        "q8_market_share": T2.q8_market_share,
        "q9_profit_by_nation": T2.q9_profit_by_nation,
        "q10_returned_items": T.q10_returned_items,
        "q11_important_parts": T2.q11_important_parts,
        "q12_late_shipments": T2.q12_late_shipments,
        "q13_order_distribution": T2.q13_order_distribution,
        "q14_promo_effect": T.q14_promo_effect,
        "q15_top_supplier": T.q15_top_supplier,
        "q16_supplier_counts": T2.q16_supplier_counts,
        "q18_large_orders": T.q18_large_orders,
        "q19_disjunctive_revenue": T2.q19_disjunctive_revenue,
        "q20_dominant_suppliers": T2.q20_dominant_suppliers,
        "q21_blocking_suppliers": T2.q21_blocking_suppliers,
        "q22_idle_customers": T.q22_idle_customers,
        # LLM-data / eval-metric wave
        "embedding_semdedup": _q_embedding_semdedup,
        "doc_dsir_weights": _q_doc_dsir_weights,
        "source_jsonl_roundtrip": _q_source_jsonl_roundtrip,
        "doc_ppl_buckets": _q_doc_ppl_buckets,
        "doc_winnowing": X.q_doc_winnowing,
        "doc_chunk_windows": X.q_doc_chunk_windows,
        "doc_bpe_pairs": X.q_doc_bpe_pairs,
        "embedding_knn_classify": _q_embedding_knn_classify,
        "transcript_conv_stats": _q_transcript_conv_stats,
        "transcript_tool_latency": _q_transcript_tool_latency,
        # window/rank/robust-stat remainder
        "events_fill_clean": A.q_events_fill_clean,
        "events_percent_rank": A.q_events_percent_rank,
        "events_value_mad": A.q_events_value_mad,
        "events_funnel_latency": A.q_events_funnel_latency,
        "doc_char_entropy": D.q_doc_char_entropy,
        "doc_weighted_sample": A.q_doc_weighted_sample,
        "orders_ntile": A.q_orders_ntile,
        "parts_dense_rank": A.q_parts_dense_rank,
        # ---- driver window boundary (entries below were driver-certified in
        # r2/r3/r4 — see CORRECTNESS_r0{2,3,4}.json — or are rows-only by
        # design; oracle-bearing ones stay checked by scripts/check_oracle.py) ----
        "transcript_wer": _q_transcript_wer,
        "transcript_token_f1": _q_transcript_token_f1,
        "transcript_bleu": _q_transcript_bleu,
        "embedding_centroids": _q_embedding_centroids,
        "events_heavy_users": _q_events_heavy_users,
        "doc_lang_id": _q_doc_lang_id,
        "events_props": R.q_events_props,
        "order_revenue_join": R.q_order_revenue_join,
        "events_asof_signup": R.q_events_asof_signup,
        "events_first_last": A.q_events_first_last,
        "doc_rarity": D.q_doc_rarity,
        "doc_exact_dedup": D.q_doc_exact_dedup,
        "events_cohort_retention": A.q_events_cohort_retention,
        "doc_token_freq_spectrum": D.q_doc_token_freq_spectrum,
        "events_cube": A.q_events_cube,
        "doc_repeated_spans": D.q_doc_repeated_spans,
        "events_funnel": A.q_events_funnel,
        "doc_quality_gate": D.q_doc_quality_gate,
        "doc_bm25": D.q_doc_bm25,
        "doc_line_dedup": D.q_doc_line_dedup,
        "doc_bigram_lm": D.q_doc_bigram_lm,
        "events_trailing_hour": A.q_events_trailing_hour,
        "events_user_mode": A.q_events_user_mode,
        "doc_pii_scrub": D.q_doc_pii_scrub,
        "doc_pmi_pairs": D.q_doc_pmi_pairs,
        "nation_balance_fullouter": A.q_nation_balance_fullouter,
        "doc_fuzzy_token_join": D.q_doc_fuzzy_token_join,
        "doc_temperature_sample": D.q_doc_temperature_sample,
        "events_hourly_dense": A.q_events_hourly_dense,
        "doc_token_pagerank": D.q_doc_token_pagerank,
        "lineitem_corr": A.q_lineitem_corr,
        "events_value_trend": A.q_events_value_trend,
        "nations_intersect": A.q_nations_intersect,
        "doc_stratified_sample": D.q_doc_stratified_sample,
        "doc_source_cap": D.q_doc_source_cap,
        "doc_decontaminate": D.q_doc_decontaminate,
        "q3_shipping_priority": R.q3_shipping_priority,
        "filter_project": R.q_filter_project,
        "region_customer_count": R.q_region_customer_count,
        "top_customers": R.q_top_customers,
        "orders_price_rank": R.q_orders_price_rank,
        "union_nations": R.q_union_nations,
        "events_hourly": R.q_events_hourly,
        "events_sessions": R.q_events_sessions,
        "top_parts_per_brand": R.q_top_parts_per_brand,
        "doc_split": R.q_doc_split,
        "events_cumulative": R.q_events_cumulative,
        "doc_char_classes": R.q_doc_char_classes,
        "customers_no_orders": R.q_customers_no_orders,
        "event_types": R.q_event_types,
        "doc_normalize": D.q_doc_normalize,
        "doc_flatten_pdf": D.q_doc_flatten_pdf,
        "doc_quality": D.q_doc_quality,
        "doc_fingerprint": D.q_doc_fingerprint,
        "doc_repetition": D.q_doc_repetition,
        "training_mix": D.q_training_mix,
        "events_range_join": R.q_events_range_join,
        "events_lag_lead": R.q_events_lag_lead,
        "events_pivot_daily": R.q_events_pivot_daily,
        "customers_churned_1996": R.q_customers_churned_1996,
        "q5_nation_volume": A.q5_nation_volume,
        "events_rollup": A.q_events_rollup,
        "doc_pack_tokens": D.q_doc_pack_tokens,
        "q17_avg_yearly": A.q17_avg_yearly,
        "doc_prep_pipeline": _q_doc_prep_pipeline,
        "doc_inverted_index": D.q_doc_inverted_index,
        "doc_simhash_pairs": _q_doc_simhash_pairs,
        "embedding_quantize": _q_embedding_quantize,
        "doc_tokens": D.q_doc_tokens,
        "top_orders": R.q_top_orders,
        "doc_strip_html": D.q_doc_strip_html,
        "doc_token_count": D.q_doc_token_count,
        "events_session_ids": R.q_events_session_ids,
        "events_moving_avg": R.q_events_moving_avg,
        "doc_charset_coverage": D.q_doc_charset_coverage,
        "doc_minhash_keep": D.q_doc_minhash_keep,
        "doc_top_tokens": D.q_doc_top_tokens,
        # round-5 session-2 wave: distributed higher moments, shuffle-free
        # histogram partials, Zipf corpus-health fit (below the window —
        # the r5 rotation above is pinned)
        "lineitem_skew_kurt": A.q_lineitem_skew_kurt,
        "orders_price_histogram": A.q_orders_price_histogram,
        "doc_zipf_slope": D.q_doc_zipf_slope,
        "orders_percentiles_2pass": A.q_orders_percentiles_2pass,
        "events_type_hour_mi": A.q_events_type_hour_mi,
        "transcript_role_transitions": _q_transcript_role_transitions,
        "doc_table_checksum": D.q_doc_table_checksum,
        "events_grouping_sets": A.q_events_grouping_sets,
        "registry_clean": _q_registry_clean,
        "lineitem_weighted_median": A.q_lineitem_weighted_median,
        "lineitem_weighted_quartiles": A.q_lineitem_weighted_quartiles,
        "events_type_dow_chi2": A.q_events_type_dow_chi2,
        "doc_source_concentration": D.q_doc_source_concentration,
        "lineitem_winsorized_mean": A.q_lineitem_winsorized_mean,
        "events_top3_per_user": A.q_events_top3_per_user,
        "lineitem_corr_matrix": A.q_lineitem_corr_matrix,
        "events_user_skew": A.q_events_user_skew,
        "doc_length_ks": A.q_doc_length_ks,
        "events_profile": A.q_events_profile,
        "orders_ri_audit": A.q_orders_ri_audit,
        "doc_token_triangles": D.q_doc_token_triangles,
        "source_vocab_jaccard": D.q_source_vocab_jaccard,
        # round-5 session-5 wave: agent-transcript window audits +
        # featurization / compaction / melt relational shapes
        "transcript_context_budget": _q_transcript_context_budget,
        "transcript_tool_chains": _q_transcript_tool_chains,
        "transcript_sft_pairs": _q_transcript_sft_pairs,
        "events_value_zscore": A.q_events_value_zscore,
        "events_latest_by_user": A.q_events_latest_by_user,
        "lineitem_unpivot": A.q_lineitem_unpivot,
        # round-5 session-6 wave: transcript fork/loop audits (planted
        # audit corpus), event debounce dedup, Gopher static quality rules
        "transcript_prefix_forks": _q_transcript_prefix_forks,
        "transcript_loop_detect": _q_transcript_loop_detect,
        "transcript_curation_gate": _q_transcript_curation_gate,
        "transcript_near_dup": _q_transcript_near_dup,
        "events_dedup_window": A.q_events_dedup_window,
        "doc_gopher_rules": D.q_doc_gopher_rules,
        "embedding_topk": _q_embedding_topk,
        "doc_scrub_urls": D.q_doc_scrub_urls,
        "suppliers_with_bigparts": R.q_suppliers_with_bigparts,
        "embedding_near_dup_lsh": _q_embedding_near_dup_lsh,
        "spec_clean": _q_spec_clean,
        "embedding_near_dup": _q_embedding_near_dup,
        "doc_ngram_jaccard": _q_doc_ngram_jaccard,
        "events_approx_users": _q_events_approx_users,
        "events_type_users_approx": _q_events_type_users_approx,
        "orders_quantiles_approx": _q_orders_quantiles_approx,
        "orders_quantiles_approx_grouped": _q_orders_quantiles_approx_grouped,
        "embedding_ivf_topk": _q_embedding_ivf_topk,
        "embedding_kmeans": _q_embedding_kmeans,
        # multimodal (real BMP/PPM/WAV codecs; video frame-sample stubbed)
        "media_features": _q_media_features,
        "media_exttool": _q_media_exttool,
        "media_frames": _q_media_frames,
    }


def oracle_sql() -> dict[str, str]:
    from manga_ocr_ray.pipelines import analytic as A
    from manga_ocr_ray.pipelines import documents as D
    from manga_ocr_ray.pipelines import llmdata as L
    from manga_ocr_ray.pipelines import relational as R
    from manga_ocr_ray.pipelines import tpch as T
    from manga_ocr_ray.pipelines import tpch2 as T2
    from manga_ocr_ray.pipelines import textprep as X

    return {
        # round-3 analytic families
        "q5_nation_volume": A.Q5_NATION_VOLUME_SQL,
        "events_rollup": A.Q_EVENTS_ROLLUP_SQL,
        "doc_line_dedup": D.Q_DOC_LINE_DEDUP_SQL,
        "doc_bigram_lm": D.Q_DOC_BIGRAM_LM_SQL,
        "events_trailing_hour": A.Q_EVENTS_TRAILING_HOUR_SQL,
        "events_user_mode": A.Q_EVENTS_USER_MODE_SQL,
        "doc_pii_scrub": D.Q_DOC_PII_SCRUB_SQL,
        "doc_char_entropy": D.Q_DOC_CHAR_ENTROPY_SQL,
        "doc_pmi_pairs": D.Q_DOC_PMI_PAIRS_SQL,
        "nation_balance_fullouter": A.Q_NATION_BALANCE_FULLOUTER_SQL,
        "doc_fuzzy_token_join": D.Q_DOC_FUZZY_TOKEN_JOIN_SQL,
        "doc_temperature_sample": D.Q_DOC_TEMPERATURE_SAMPLE_SQL,
        "events_hourly_dense": A.Q_EVENTS_HOURLY_DENSE_SQL,
        "doc_token_pagerank": D.q_doc_token_pagerank_sql(),
        "orders_ntile": A.Q_ORDERS_NTILE_SQL,
        "lineitem_corr": A.Q_LINEITEM_CORR_SQL,
        "lineitem_skew_kurt": A.Q_LINEITEM_SKEW_KURT_SQL,
        "orders_price_histogram": A.Q_ORDERS_PRICE_HISTOGRAM_SQL,
        "doc_zipf_slope": D.Q_DOC_ZIPF_SLOPE_SQL,
        "orders_percentiles_2pass": A.Q_ORDERS_PERCENTILES_2PASS_SQL,
        "events_type_hour_mi": A.Q_EVENTS_TYPE_HOUR_MI_SQL,
        "transcript_role_transitions": _Q_TRANSCRIPT_ROLE_TRANSITIONS_SQL,
        "transcript_context_budget": _transcript_context_budget_sql(),
        "transcript_tool_chains": _Q_TRANSCRIPT_TOOL_CHAINS_SQL,
        "transcript_sft_pairs": _Q_TRANSCRIPT_SFT_PAIRS_SQL,
        "events_value_zscore": A.Q_EVENTS_VALUE_ZSCORE_SQL,
        "events_latest_by_user": A.Q_EVENTS_LATEST_BY_USER_SQL,
        "lineitem_unpivot": A.Q_LINEITEM_UNPIVOT_SQL,
        "transcript_prefix_forks": _Q_TRANSCRIPT_PREFIX_FORKS_SQL,
        "transcript_loop_detect": _Q_TRANSCRIPT_LOOP_DETECT_SQL,
        "transcript_curation_gate": _Q_TRANSCRIPT_CURATION_GATE_SQL,
        "transcript_near_dup": _transcript_near_dup_sql(),
        "events_dedup_window": A.Q_EVENTS_DEDUP_WINDOW_SQL,
        "doc_gopher_rules": D.Q_DOC_GOPHER_RULES_SQL,
        "doc_table_checksum": D.Q_DOC_TABLE_CHECKSUM_SQL,
        "events_grouping_sets": A.Q_EVENTS_GROUPING_SETS_SQL,
        "transcript_strip_ratio": _Q_TRANSCRIPT_STRIP_RATIO_SQL,
        "lineitem_weighted_median": A.Q_LINEITEM_WEIGHTED_MEDIAN_SQL,
        "lineitem_weighted_quartiles": A.Q_LINEITEM_WEIGHTED_QUARTILES_SQL,
        "events_type_dow_chi2": A.Q_EVENTS_TYPE_DOW_CHI2_SQL,
        "doc_source_concentration": D.Q_DOC_SOURCE_CONCENTRATION_SQL,
        "lineitem_winsorized_mean": A.Q_LINEITEM_WINSORIZED_MEAN_SQL,
        "events_top3_per_user": A.Q_EVENTS_TOP3_PER_USER_SQL,
        "lineitem_corr_matrix": A.Q_LINEITEM_CORR_MATRIX_SQL,
        "events_user_skew": A.Q_EVENTS_USER_SKEW_SQL,
        "doc_length_ks": A.Q_DOC_LENGTH_KS_SQL,
        "events_profile": A.Q_EVENTS_PROFILE_SQL,
        "orders_ri_audit": A.Q_ORDERS_RI_AUDIT_SQL,
        "doc_token_triangles": D.q_doc_token_triangles_sql(),
        "source_vocab_jaccard": D.Q_SOURCE_VOCAB_JACCARD_SQL,
        "transcript_conv_dedup": _Q_TRANSCRIPT_CONV_DEDUP_SQL,
        "events_value_trend": A.Q_EVENTS_VALUE_TREND_SQL,
        "nations_intersect": A.Q_NATIONS_INTERSECT_SQL,
        "parts_dense_rank": A.Q_PARTS_DENSE_RANK_SQL,
        "q17_avg_yearly": A.Q17_AVG_YEARLY_SQL,
        "lineitem_bloom_semi": A.Q_LINEITEM_BLOOM_SEMI_SQL,
        "events_first_last": A.Q_EVENTS_FIRST_LAST_SQL,
        "events_user_active_days": A.Q_EVENTS_USER_ACTIVE_DAYS_SQL,
        "events_cohort_retention": A.Q_EVENTS_COHORT_RETENTION_SQL,
        "doc_token_freq_spectrum": D.Q_DOC_TOKEN_FREQ_SPECTRUM_SQL,
        "events_segment_revenue": A.Q_EVENTS_SEGMENT_REVENUE_SQL,
        "events_cube": A.Q_EVENTS_CUBE_SQL,
        "events_fill_clean": A.Q_EVENTS_FILL_CLEAN_SQL,
        "doc_repeated_spans": D.q_doc_repeated_spans_sql(),
        "events_funnel": A.Q_EVENTS_FUNNEL_SQL,
        "doc_quality_gate": D.Q_DOC_QUALITY_GATE_SQL,
        "doc_bm25": D.q_doc_bm25_sql(),
        "doc_inverted_index": D.Q_DOC_INVERTED_INDEX_SQL,
        "doc_rarity": D.Q_DOC_RARITY_SQL,
        "doc_tfidf_top_terms": D.q_doc_tfidf_sql(),
        "doc_stratified_sample": D.q_doc_stratified_sample_sql(),
        "doc_source_cap": D.q_doc_source_cap_sql(),
        "doc_pack_tokens": D.q_doc_pack_tokens_sql(),
        "doc_decontaminate": D.q_doc_decontaminate_sql(),
        "q1_pricing_summary": R.Q1_SQL,
        "q3_shipping_priority": R.Q3_SQL,
        "filter_project": R.Q_FILTER_PROJECT_SQL,
        "region_customer_count": R.Q_REGION_CUSTOMER_COUNT_SQL,
        "top_customers": R.Q_TOP_CUSTOMERS_SQL,
        "top_orders": R.Q_TOP_ORDERS_SQL,
        "orders_price_rank": R.Q_ORDERS_PRICE_RANK_SQL,
        "union_nations": R.Q_UNION_NATIONS_SQL,
        "events_hourly": R.Q_EVENTS_HOURLY_SQL,
        "events_props": R.Q_EVENTS_PROPS_SQL,
        "events_sessions": R.Q_EVENTS_SESSIONS_SQL,
        "events_session_ids": R.Q_EVENTS_SESSION_IDS_SQL,
        "top_parts_per_brand": R.Q_TOP_PARTS_PER_BRAND_SQL,
        "doc_split": R.Q_DOC_SPLIT_SQL,
        "order_revenue_join": R.Q_ORDER_REVENUE_JOIN_SQL,
        "events_asof_signup": R.Q_EVENTS_ASOF_SQL,
        "events_cumulative": R.Q_EVENTS_CUMULATIVE_SQL,
        "doc_char_classes": R.Q_DOC_CHAR_CLASSES_SQL,
        "customers_no_orders": R.Q_CUSTOMERS_NO_ORDERS_SQL,
        "suppliers_with_bigparts": R.Q_SUPPLIERS_WITH_BIGPARTS_SQL,
        "q6_forecast_revenue": T.Q6_FORECAST_REVENUE_SQL,
        "q4_order_priority": T.Q4_ORDER_PRIORITY_SQL,
        "q10_returned_items": T.Q10_RETURNED_ITEMS_SQL,
        "q14_promo_effect": T.Q14_PROMO_EFFECT_SQL,
        "q15_top_supplier": T.Q15_TOP_SUPPLIER_SQL,
        "q18_large_orders": T.Q18_LARGE_ORDERS_SQL,
        "q22_idle_customers": T.Q22_IDLE_CUSTOMERS_SQL,
        "q12_late_shipments": T2.Q12_LATE_SHIPMENTS_SQL,
        "q13_order_distribution": T2.Q13_ORDER_DISTRIBUTION_SQL,
        "q19_disjunctive_revenue": T2.Q19_DISJUNCTIVE_REVENUE_SQL,
        "q11_important_parts": T2.q11_important_parts_sql(),
        "q16_supplier_counts": T2.Q16_SUPPLIER_COUNTS_SQL,
        "q2_min_cost_supplier": T2.q2_min_cost_supplier_sql(),
        "q8_market_share": T2.q8_market_share_sql(),
        "q9_profit_by_nation": T2.q9_profit_by_nation_sql(),
        "q20_dominant_suppliers": T2.q20_dominant_suppliers_sql(),
        "q21_blocking_suppliers": T2.q21_blocking_suppliers_sql(),
        "doc_chunk_windows": X.Q_DOC_CHUNK_WINDOWS_SQL,
        "doc_winnowing": X.Q_DOC_WINNOWING_SQL,
        "doc_bpe_pairs": X.Q_DOC_BPE_PAIRS_SQL,
        "events_percent_rank": A.Q_EVENTS_PERCENT_RANK_SQL,
        "events_value_mad": A.Q_EVENTS_VALUE_MAD_SQL,
        "q7_two_nation_volume": A.Q7_TWO_NATION_VOLUME_SQL,
        "events_funnel_latency": A.Q_EVENTS_FUNNEL_LATENCY_SQL,
        "doc_weighted_sample": A.Q_DOC_WEIGHTED_SAMPLE_SQL,
        "event_types": R.Q_EVENT_TYPES_SQL,
        "events_moving_avg": R.Q_EVENTS_MOVING_AVG_SQL,
        "events_range_join": R.Q_EVENTS_RANGE_JOIN_SQL,
        "events_lag_lead": R.Q_EVENTS_LAG_LEAD_SQL,
        "events_pivot_daily": R.Q_EVENTS_PIVOT_DAILY_SQL,
        "customers_churned_1996": R.Q_CUSTOMERS_CHURNED_1996_SQL,
        "events_heavy_users": _Q_EVENTS_HEAVY_USERS_SQL,
        "orders_price_quantiles": R.Q_ORDERS_PRICE_QUANTILES_SQL,
        "doc_token_count": D.Q_DOC_TOKEN_COUNT_SQL,
        "doc_tokens": D.Q_DOC_TOKENS_SQL,
        "registry_clean": _registry_clean_sql(),
        "spec_clean": _registry_clean_sql(),
        "doc_top_tokens": D.Q_DOC_TOP_TOKENS_SQL,
        "doc_repetition": D.Q_DOC_REPETITION_SQL,
        "doc_scrub_urls": D.Q_DOC_SCRUB_URLS_SQL,
        "doc_charset_coverage": D.Q_DOC_CHARSET_COVERAGE_SQL,
        "training_mix": D.q_training_mix_sql(),
        "doc_normalize": D.Q_DOC_NORMALIZE_SQL,
        "doc_strip_html": D.q_doc_strip_html_sql(),
        "doc_flatten_pdf": D.q_doc_flatten_pdf_sql(),
        "doc_quality": D.Q_DOC_QUALITY_SQL,
        "doc_exact_dedup": D.Q_DOC_EXACT_DEDUP_SQL,
        "doc_lang_id": _lang_id_sql(),
        "doc_minhash_dedup": _minhash_pair_sql(),
        "doc_ngram_jaccard": _minhash_pair_sql().replace(">= 0.8", ">= 0.15"),
        "doc_minhash_keep": D.q_doc_minhash_keep_sql(),
        "doc_simhash_pairs": D.simhash_pairs_sql(3),
        "doc_fingerprint": D.fingerprint_sql(),
        "embedding_topk": _Q_EMBEDDING_TOPK_SQL,
        "embedding_near_dup": _Q_EMBEDDING_NEAR_DUP_SQL,
        "embedding_near_dup_lsh": _Q_EMBEDDING_NEAR_DUP_SQL,
        "embedding_centroids": _Q_EMBEDDING_CENTROIDS_SQL,
        "embedding_quantize": _Q_EMBEDDING_QUANTIZE_SQL,
        "transcript_extract": _Q_TRANSCRIPT_EXTRACT_SQL,
        "transcript_merge": _Q_TRANSCRIPT_MERGE_SQL,
        "transcript_cjk_stats": _transcript_cjk_stats_sql(),
        "transcript_cer": _Q_TRANSCRIPT_CER_SQL,
        "transcript_ja_segment": _transcript_ja_segment_sql(),
        "transcript_wer": _transcript_wer_sql(),
        "transcript_token_f1": _transcript_token_f1_sql(),
        "transcript_bleu": _transcript_bleu_sql(),
        "embedding_semdedup": L.embedding_semdedup_sql(),
        "doc_dsir_weights": L.doc_dsir_weights_sql(),
        "source_jsonl_roundtrip": L.JSONL_ROUNDTRIP_SQL,
        "doc_prep_pipeline": L.doc_prep_pipeline_sql(),
        "doc_ppl_buckets": L.doc_ppl_buckets_sql(),
        "embedding_knn_classify": L.embedding_knn_classify_sql(),
        "transcript_conv_stats": _transcript_conv_stats_sql(),
        "transcript_tool_latency": _Q_TRANSCRIPT_TOOL_LATENCY_SQL,
    }


# Guarantee the flagship oracle corpus AND the derived audit corpus exist no
# matter which of (query, oracle SQL) the driver evaluates first — the
# fork/loop/near-dup oracle SQL reads the audit parquet directly, so a
# fresh /tmp must not depend on the Ray query running first (review r5s6).
_oracle_corpus()
_audit_corpus()
