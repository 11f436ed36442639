"""Document-table pipelines: the extraction/normalization kernels and the
training-data operators (dedup, text analysis, similarity) exposed as
oracle-checkable queries over the driver's ``documents``/``embeddings``
tables.

For the extraction kernels the query WRAPS each document in deterministic
HTML/PDF noise first (same concat on the SQL side), so the strip/flatten
kernels are genuinely exercised — not identity on plain text.
"""

from __future__ import annotations

import functools
import os

import numpy as np
import pandas as pd
import pyarrow as pa
import pyarrow.compute as pc

import ray
import ray.data as rd
from ray.data.aggregate import Count, Max, Min, Sum

from ..functions.h2z import DAKUTEN_PAIRS, H2Z_FROM, H2Z_TO
from ..functions.html import strip_html_array, strip_html_sql
from ..functions.normalize import WHITESPACE_CODEPOINTS, normalize_batch
from ..functions.textstats import (SHINGLE_TOKEN_PATTERN, TOKEN_PATTERN,
                                   _STOPWORD_PATTERN)
from ..functions.pdf import flatten_pdf_array, flatten_pdf_sql
from ..functions.textstats import fingerprint_map_batch, quality_batch
from ..stages.dedup import exact_dedup_groups


def _docs(sf_dir: str, columns: list[str]) -> rd.Dataset:
    return rd.read_parquet(f"{sf_dir}/documents.parquet", columns=columns)


# ---- normalize (the [core] post_process kernel, M1) ------------------------

def q_doc_normalize(sf_dir: str) -> rd.Dataset:
    ds = _docs(sf_dir, ["doc_id", "text"])
    return ds.map_batches(
        lambda t: normalize_batch(t, "text").select(["doc_id", "normalized_text"]),
        batch_format="pyarrow",
    )


def normalize_sql(expr: str) -> str:
    """DuckDB expression replicating post_process exactly (see normalize.py).

    whitespace squash uses the exact Python str.isspace() codepoint set;
    h2z is the dakuten replace chain + one translate() with the full tables.
    """
    # \x{...} escapes are safe for every codepoint inside an RE2 class, so no
    # special-casing is needed even for ]/\/^
    ws = "".join(f"\\x{{{cp:04x}}}" for cp in WHITESPACE_CODEPOINTS)
    out = f"regexp_replace({expr}, '[{ws}]+', '', 'g')"
    out = f"regexp_replace({out}, '[・.]{{2,}}', '...', 'g')"
    out = f"replace({out}, '…', '...')"
    for half, full in DAKUTEN_PAIRS:
        out = f"replace({out}, '{half}', '{full}')"
    frm = H2Z_FROM.replace("'", "''")
    to = H2Z_TO.replace("'", "''")
    return f"translate({out}, '{frm}', '{to}')"


Q_DOC_NORMALIZE_SQL = (
    f"SELECT doc_id, {normalize_sql('text')} AS normalized_text FROM documents"
)


# ---- HTML strip over deterministically wrapped docs ------------------------

_HTML_PRE = (
    "<html><head><title>T</title><style>p { color: red; }</style>"
    "<script>var x = 1;</script></head><body><!-- note --><p>"
)
_HTML_POST = "</p><div>tail &amp; end</div></body></html>"


def q_doc_strip_html(sf_dir: str) -> rd.Dataset:
    ds = _docs(sf_dir, ["doc_id", "text"])

    def wrap_strip(t: pa.Table) -> pa.Table:
        wrapped = pc.binary_join_element_wise(
            pa.scalar(_HTML_PRE), t["text"].combine_chunks(), pa.scalar(_HTML_POST), ""
        )
        return pa.table({"doc_id": t["doc_id"], "stripped_text": strip_html_array(wrapped)})

    return ds.map_batches(wrap_strip, batch_format="pyarrow")


def q_doc_strip_html_sql() -> str:
    pre = _HTML_PRE.replace("'", "''")
    post = _HTML_POST.replace("'", "''")
    inner = f"'{pre}' || text || '{post}'"
    return f"SELECT doc_id, {strip_html_sql(inner)} AS stripped_text FROM documents"


# ---- PDF flatten over deterministically paged docs -------------------------

def q_doc_flatten_pdf(sf_dir: str) -> rd.Dataset:
    ds = _docs(sf_dir, ["doc_id", "text"])

    def wrap_flatten(t: pa.Table) -> pa.Table:
        wrapped = pc.binary_join_element_wise(
            pa.scalar("Page 1 of 2\n"), t["text"].combine_chunks(),
            pa.scalar("\n1\fPage 2 of 2\nsecond pa-\nge text\n2"), "",
        )
        return pa.table({"doc_id": t["doc_id"], "flat_text": flatten_pdf_array(wrapped)})

    return ds.map_batches(wrap_flatten, batch_format="pyarrow")


def q_doc_flatten_pdf_sql() -> str:
    inner = (
        "'Page 1 of 2' || chr(10) || text || chr(10) || '1' || chr(12) || "
        "'Page 2 of 2' || chr(10) || 'second pa-' || chr(10) || 'ge text' || chr(10) || '2'"
    )
    return f"SELECT doc_id, {flatten_pdf_sql(inner)} AS flat_text FROM documents"


# ---- text analysis ---------------------------------------------------------

def q_doc_quality(sf_dir: str) -> rd.Dataset:
    ds = _docs(sf_dir, ["doc_id", "text"])
    return ds.map_batches(lambda t: quality_batch(t, "text"), batch_format="pyarrow")


Q_DOC_QUALITY_SQL = rf"""
SELECT doc_id,
       length(text) AS n_chars,
       len(regexp_extract_all(text, '{TOKEN_PATTERN}')) AS n_tokens,
       len(regexp_extract_all(text, '[.,!?;:]')) AS n_punct,
       len(regexp_extract_all(text, '{_STOPWORD_PATTERN}')) AS n_stopwords,
       len(regexp_extract_all(text, '{_STOPWORD_PATTERN}'))
         * 1.0 / greatest(len(regexp_extract_all(text, '{TOKEN_PATTERN}')), 1) AS stopword_ratio,
       len(regexp_extract_all(text, '[.,!?;:]')) * 1.0 / greatest(length(text), 1) AS punct_ratio
FROM documents
"""


def q_doc_gopher_rules(sf_dir: str) -> rd.Dataset:
    """Gopher-style STATIC quality ruleset (Rae et al. 2021, appendix A1.1 —
    the published rule filter, vs :func:`q_doc_quality_gate`'s corpus-
    percentile cutoff): per document, word count in [50, 100k], mean
    alphabetic word length in [3, 10], symbol-to-word ratio (``#`` /
    ellipsis) ≤ 0.1, and ≥ 2 English stopwords present.  All four rules are
    integer comparisons (``3·words ≤ alpha`` instead of ``alpha/words ≥ 3``)
    so no float tie can flip a boolean between this plan and the SQL twin.
    One RE2 pass per rule inside ``map_batches`` — zero shuffle, the ideal
    100-TB shape (the gate is a pure map)."""
    ds = _docs(sf_dir, ["doc_id", "text"])

    def rules(t: pa.Table) -> pa.Table:
        text = t["text"]

        def n(pattern: str) -> pa.Array:
            return pc.cast(pc.count_substring_regex(text, pattern=pattern),
                           pa.int64())

        words, alpha = n(TOKEN_PATTERN), n("[A-Za-z]")
        stop = n(_STOPWORD_PATTERN)
        sym = n(r"#|\.\.\.|…")
        r_words = pc.and_(pc.greater_equal(words, 50),
                          pc.less_equal(words, 100_000))
        r_len = pc.and_(
            pc.less_equal(pc.multiply(words, 3), alpha),
            pc.less_equal(alpha, pc.multiply(words, 10)))
        r_sym = pc.less_equal(pc.multiply(sym, 10), words)
        r_stop = pc.greater_equal(stop, 2)
        mean_len = pc.divide(
            pc.cast(alpha, pa.float64()),
            pc.cast(pc.max_element_wise(words, pa.scalar(1, pa.int64())),
                    pa.float64()))
        return pa.table({
            "doc_id": t["doc_id"], "n_words": words,
            "mean_word_len": mean_len,
            "r_word_count": r_words, "r_mean_len": r_len,
            "r_symbol": r_sym, "r_stopwords": r_stop,
            "keep": pc.and_(pc.and_(r_words, r_len),
                            pc.and_(r_sym, r_stop)),
        })

    return ds.map_batches(rules, batch_format="pyarrow")


Q_DOC_GOPHER_RULES_SQL = rf"""
WITH s AS (
  SELECT doc_id,
         len(regexp_extract_all(text, '{TOKEN_PATTERN}')) AS n_words,
         len(regexp_extract_all(text, '[A-Za-z]')) AS n_alpha,
         len(regexp_extract_all(text, '{_STOPWORD_PATTERN}')) AS n_stop,
         len(regexp_extract_all(text, '#|\.\.\.|…')) AS n_sym
  FROM documents)
SELECT doc_id, CAST(n_words AS BIGINT) AS n_words,
       CAST(n_alpha AS DOUBLE) / greatest(n_words, 1) AS mean_word_len,
       n_words BETWEEN 50 AND 100000 AS r_word_count,
       (3 * n_words <= n_alpha AND n_alpha <= 10 * n_words) AS r_mean_len,
       10 * n_sym <= n_words AS r_symbol,
       n_stop >= 2 AS r_stopwords,
       (n_words BETWEEN 50 AND 100000
        AND 3 * n_words <= n_alpha AND n_alpha <= 10 * n_words
        AND 10 * n_sym <= n_words AND n_stop >= 2) AS keep
FROM s
"""


# ---- dedup -----------------------------------------------------------------

def q_doc_exact_dedup(sf_dir: str) -> rd.Dataset:
    return exact_dedup_groups(_docs(sf_dir, ["doc_id", "text"]))


Q_DOC_EXACT_DEDUP_SQL = """
SELECT min(doc_id) AS keep_doc_id, count(*) AS n_copies
FROM documents GROUP BY text
"""


def q_doc_fingerprint(sf_dir: str) -> rd.Dataset:
    """Rolling-hash winnowing fingerprints (rows-only check: not SQL-expressible)."""
    ds = _docs(sf_dir, ["doc_id", "text"])
    return ds.map_batches(
        lambda t: fingerprint_map_batch(t, "text").select(["doc_id", "fingerprint"]),
        batch_format="pyarrow",
    )


# ---- token counting (training-data op; whitespace+BPE-ish regex) -----------

def q_doc_token_count(sf_dir: str) -> rd.Dataset:
    from ..functions.textstats import token_count_array

    ds = _docs(sf_dir, ["doc_id", "text"])

    def counts(t: pa.Table) -> pa.Table:
        return pa.table({
            "doc_id": t["doc_id"],
            "n_tokens": pc.cast(token_count_array(t["text"]), pa.int64()),
        })

    return ds.map_batches(counts, batch_format="pyarrow")


Q_DOC_TOKEN_COUNT_SQL = f"""
SELECT doc_id, len(regexp_extract_all(text, '{TOKEN_PATTERN}')) AS n_tokens
FROM documents
"""


# ---- flat_map: explode documents into (doc_id, tok_idx, token) rows --------
# The XML→rows flattener pattern (S6/M6/M7, process_manga109s.py:71-144) as a
# fully vectorized Arrow explode: split_pattern_regex → list_flatten +
# list_parent_indices; no Python row loop.

def _explode_tokens(t: pa.Table) -> pa.Table:
    """One batch of documents → (doc_id, tok_idx, token) rows, vectorized.

    "Extract all matches" via vectorized kernels (Arrow has no
    extract-all): wrap every TOKEN_PATTERN match in \\x00 sentinels,
    split on the sentinel, keep only full-pattern matches — this keeps
    single-kanji tokens separate, which a complement-class split can't.
    """
    wrapped = pc.replace_substring_regex(
        t["text"].combine_chunks(), pattern=f"({TOKEN_PATTERN})",
        replacement="\x00\\1\x00")
    toks = pc.split_pattern(wrapped, "\x00")
    flat = pc.list_flatten(toks)
    parent = pc.list_parent_indices(toks).to_numpy()
    keep_arr = pc.and_(
        pc.not_equal(pc.utf8_length(flat), pa.scalar(0)),
        pc.match_substring_regex(flat, f"^(?:{TOKEN_PATTERN})$"),
    )
    keep = keep_arr.to_numpy(zero_copy_only=False)  # drop inter-match spans
    parent = parent[keep]
    # 0-based position among kept tokens of the same doc (parents are
    # contiguous after flatten, so a segmented cumcount suffices)
    pos = np.arange(parent.size, dtype=np.int64)
    if parent.size:
        starts = np.flatnonzero(np.r_[True, np.diff(parent) != 0])
        pos = pos - np.repeat(pos[starts], np.diff(np.r_[starts, parent.size]))
    doc_ids = t["doc_id"].combine_chunks().to_numpy()[parent]
    return pa.table({
        "doc_id": pa.array(doc_ids, pa.int64()),
        "tok_idx": pa.array(pos, pa.int64()),
        "token": flat.filter(keep_arr),
    })


def q_doc_tokens(sf_dir: str) -> rd.Dataset:
    ds = _docs(sf_dir, ["doc_id", "text"])
    return ds.map_batches(_explode_tokens, batch_format="pyarrow")


Q_DOC_TOKENS_SQL = f"""
WITH toks AS (SELECT doc_id, regexp_extract_all(text, '{TOKEN_PATTERN}') ts FROM documents)
SELECT doc_id,
       unnest(list_transform(generate_series(1, len(ts)), i -> i - 1)) AS tok_idx,
       unnest(ts) AS token
FROM toks
"""


# ---- near-dup clustering: connected components over LSH pairs ---------------

def q_doc_minhash_keep(sf_dir: str) -> rd.Dataset:
    """Every document with its near-dup cluster representative (min doc_id
    over the connected component of exact-Jaccard≥0.8 LSH pairs).  Oracle:
    recursive-CTE reachability closure in DuckDB.

    Fully distributed end to end: LSH pairs stay a Dataset, connected
    components run as min-label propagation + pointer jumping
    (``cluster_reps_ds`` — two joins + a groupby per round over the
    pair-touched label table), and the corpus picks up its rep via one LEFT
    OUTER hash join.  Nothing corpus- or pair-sized touches the driver.
    The driver-side union-find twin (``near_dup_cluster_assign``) remains as
    the small-scale path, pinned equal in tests/test_dedup.py."""
    from ..stages.dedup import minhash_lsh_pairs_ds, near_dup_cluster_assign_ds

    ds = _docs(sf_dir, ["doc_id", "text"])
    pairs = minhash_lsh_pairs_ds(ds, threshold=0.8, num_hashes=128, bands=32)
    out = near_dup_cluster_assign_ds(_docs(sf_dir, ["doc_id"]), pairs)
    return out.select_columns(["doc_id", "cluster_rep"])


Q_DOC_MINHASH_PAIR_SQL = f"""
WITH toks AS (SELECT doc_id, regexp_extract_all(lower(text), '{SHINGLE_TOKEN_PATTERN}') ws FROM documents),
grams AS (SELECT doc_id,
                 CASE WHEN len(ws) < 3 THEN [array_to_string(ws, ' ')]
                      ELSE list_distinct(list_transform(generate_series(1, len(ws)-2),
                                         i -> ws[i] || ' ' || ws[i+1] || ' ' || ws[i+2]))
                 END AS gs
          FROM toks)
SELECT id_a, id_b FROM (
  SELECT a.doc_id AS id_a, b.doc_id AS id_b,
         len(list_intersect(a.gs, b.gs)) * 1.0
           / len(list_distinct(list_concat(a.gs, b.gs))) AS j
  FROM grams a JOIN grams b ON a.doc_id < b.doc_id) t
WHERE j >= 0.8
"""


def q_doc_minhash_keep_sql() -> str:
    # reuse the exact pair predicate of the minhash oracle, then take the
    # reachability closure and keep the min reachable id per doc
    return f"""
WITH RECURSIVE pair AS ({Q_DOC_MINHASH_PAIR_SQL}),
edges AS (SELECT id_a AS a, id_b AS b FROM pair
          UNION ALL SELECT id_b, id_a FROM pair),
reach(src, dst) AS (
  SELECT doc_id, doc_id FROM documents
  UNION
  SELECT r.src, e.b FROM reach r JOIN edges e ON e.a = r.dst
)
SELECT src AS doc_id, min(dst) AS cluster_rep FROM reach GROUP BY src
"""


# ---- token frequency: explode → groupby → top-k ----------------------------

def q_doc_top_tokens(sf_dir: str) -> pd.DataFrame:
    """Corpus-wide 20 most frequent tokens — the wordcount composition
    (vectorized explode → map-side-combining groupby → sort+limit)."""
    from ray.data.aggregate import Count

    tokens = q_doc_tokens(sf_dir).select_columns(["token"])
    counts = tokens.groupby("token").aggregate(Count(alias_name="n"))
    top = counts.sort(["n", "token"], descending=[True, False]).limit(20).to_pandas()
    return top[["token", "n"]]


Q_DOC_TOP_TOKENS_SQL = f"""
WITH toks AS (SELECT unnest(regexp_extract_all(text, '{TOKEN_PATTERN}')) AS token
              FROM documents)
SELECT token, count(*) AS n FROM toks
GROUP BY token ORDER BY n DESC, token LIMIT 20
"""


def simhash_pairs_sql(max_hamming: int = 3) -> str:
    """DuckDB oracle replicating stages.dedup.simhash64 bit-for-bit: the
    engine's token hash is the first 8 md5 bytes big-endian — exactly
    CAST('0x' || substr(md5(token),1,16) AS UBIGINT) — so the TF-weighted
    bit votes, the sign rule and the final hamming agree exactly."""
    return f"""
WITH tok AS (
  SELECT doc_id, unnest(regexp_extract_all(lower(text), '{SHINGLE_TOKEN_PATTERN}')) AS token
  FROM documents),
tf AS (
  SELECT doc_id, token, count(*) AS cnt,
         CAST(('0x' || substr(md5(token), 1, 16)) AS UBIGINT) AS h
  FROM tok GROUP BY doc_id, token),
bits AS (
  SELECT doc_id, b.b AS bit,
         sum(CASE WHEN (h >> b.b) & 1 = 1 THEN cnt ELSE -cnt END) AS score
  FROM tf, (SELECT unnest(generate_series(0, 63)) AS b) b
  GROUP BY doc_id, b.b),
sh AS (
  SELECT doc_id,
         CAST(sum(CASE WHEN score > 0 THEN CAST(power(2, bit) AS HUGEINT) ELSE 0 END) AS UBIGINT) AS sim
  FROM bits GROUP BY doc_id),
alldocs AS (
  SELECT d.doc_id, COALESCE(s.sim, 0) AS sim FROM documents d LEFT JOIN sh s USING (doc_id))
SELECT a.doc_id AS id_a, b.doc_id AS id_b,
       CAST(bit_count(xor(a.sim, b.sim)) AS BIGINT) AS hamming
FROM alldocs a JOIN alldocs b ON a.doc_id < b.doc_id
WHERE bit_count(xor(a.sim, b.sim)) <= {max_hamming}
"""


def fingerprint_sql() -> str:
    """DuckDB oracle replicating functions.textstats.fingerprint_batch
    bit-for-bit: the 8-byte rolling polynomial hash (FNV prime, mod 2^64),
    the splitmix64 finalizer (64x64 multiplies split into 32-bit halves to
    stay inside signed INT128), min-4 WITH multiplicity (np.partition keeps
    duplicate hashes — XOR of an equal pair cancels), XOR-fold, signed cast.
    Assumes single-byte text (ord == utf-8 byte; the documents table is
    ASCII) and length >= 8 (the engine's short-text fallback is blake2b,
    which SQL cannot mirror)."""
    P, M = 1099511628211, 1 << 64
    pw = [pow(P, 7 - k, M) for k in range(8)]
    terms = " + ".join(
        f"CAST(ord(substr(text, i+{k}, 1)) AS HUGEINT) * {pw[k]}" for k in range(8))
    c1, c2 = 0xBF58476D1CE4E5B9, 0x94D049BB133111EB

    def mulmod(x: str, c: int) -> str:
        return (f"(CAST(({x}) % 4294967296 AS HUGEINT) * {c} "
                f"+ ((CAST(({x}) >> 32 AS HUGEINT) * {c}) % 4294967296) * 4294967296) % {M}")

    return f"""
WITH pos AS (SELECT doc_id, text, unnest(generate_series(1, length(text) - 7)) AS i FROM documents),
roll AS (SELECT doc_id, i, CAST(({terms}) % {M} AS UBIGINT) AS acc FROM pos),
s1 AS (SELECT doc_id, i, xor(acc, acc >> 30) AS x FROM roll),
m1 AS (SELECT doc_id, i, CAST({mulmod('x', c1)} AS UBIGINT) AS x FROM s1),
s2 AS (SELECT doc_id, i, xor(x, x >> 27) AS x FROM m1),
m2 AS (SELECT doc_id, i, CAST({mulmod('x', c2)} AS UBIGINT) AS x FROM s2),
m3 AS (SELECT doc_id, i, xor(x, x >> 31) AS h FROM m2),
ranked AS (SELECT doc_id, h, row_number() OVER (PARTITION BY doc_id ORDER BY h, i) AS rn FROM m3),
fp AS (SELECT doc_id, bit_xor(h) AS f FROM ranked WHERE rn <= 4 GROUP BY doc_id)
SELECT doc_id, CAST(CASE WHEN f >= CAST({1 << 63} AS UBIGINT)
       THEN CAST(f AS HUGEINT) - {M} ELSE CAST(f AS HUGEINT) END AS BIGINT) AS fingerprint
FROM fp
"""


# ---- repetition detection (dup n-gram ratio; Gopher/RefinedWeb-style) ------

def q_doc_repetition(sf_dir: str) -> rd.Dataset:
    """Per-doc duplicate word-3gram fraction: 1 - distinct/total — the
    standard repetition quality signal for training-data filtering.  Engine
    counts hashed token-window shingles (vectorized, no per-doc Python); the
    oracle counts string n-grams — equal up to 64-bit hash collisions, which
    the value gate would expose."""
    from ..stages.dedup import _batch_shingle_hashes

    ds = _docs(sf_dir, ["doc_id", "text"])

    def rep(t: pa.Table) -> pa.Table:
        sh, par = _batch_shingle_hashes(t["text"], 3)
        n = t.num_rows
        total = np.bincount(par, minlength=n).astype(np.float64)
        # distinct per doc: sort (par, sh) then count run starts per segment
        order = np.lexsort((sh, par))
        ps, ss = par[order], sh[order]
        new = np.empty(ps.shape, dtype=bool)
        if len(ps):
            new[0] = True
            new[1:] = (ps[1:] != ps[:-1]) | (ss[1:] != ss[:-1])
        distinct = np.bincount(ps[new], minlength=n).astype(np.float64)
        ratio = 1.0 - distinct / np.maximum(total, 1.0)
        return pa.table({
            "doc_id": t["doc_id"],
            "n_ngrams": pa.array(total.astype(np.int64)),
            "dup_ngram_ratio": pa.array(ratio),
        })

    return ds.map_batches(rep, batch_format="pyarrow")


Q_DOC_REPETITION_SQL = f"""
WITH toks AS (SELECT doc_id, regexp_extract_all(lower(text), '{SHINGLE_TOKEN_PATTERN}') ws FROM documents),
grams AS (SELECT doc_id,
                 CASE WHEN len(ws) < 3 THEN [array_to_string(ws, ' ')]
                      ELSE list_transform(generate_series(1, len(ws)-2),
                                          i -> ws[i] || ' ' || ws[i+1] || ' ' || ws[i+2])
                 END AS gs
          FROM toks)
SELECT doc_id, len(gs) AS n_ngrams,
       1.0 - len(list_distinct(gs)) * 1.0 / greatest(len(gs), 1) AS dup_ngram_ratio
FROM grams
"""


# ---- URL / email scrub (PII-lite pipeline op) ------------------------------

_URL_PAT = r"https?://[^ \t\n]+"
_EMAIL_PAT = r"[A-Za-z0-9._%+-]+@[A-Za-z0-9.-]+\.[A-Za-z]{2,}"
# deterministic injected tail so the kernels are genuinely exercised on the
# url-free documents table (same trick as the HTML/PDF wrap queries)
_SCRUB_TAIL = " see https://example.com/a?b=1#f and mail bob.smith+x@ex.co.jp ."


def q_doc_scrub_urls(sf_dir: str) -> rd.Dataset:
    ds = _docs(sf_dir, ["doc_id", "text"])

    def scrub(t: pa.Table) -> pa.Table:
        text = pc.binary_join_element_wise(
            t["text"].combine_chunks(), pa.scalar(_SCRUB_TAIL), "")
        n_urls = pc.cast(pc.count_substring_regex(text, pattern=_URL_PAT), pa.int64())
        n_emails = pc.cast(pc.count_substring_regex(text, pattern=_EMAIL_PAT), pa.int64())
        out = pc.replace_substring_regex(text, pattern=_URL_PAT, replacement="<URL>")
        out = pc.replace_substring_regex(out, pattern=_EMAIL_PAT, replacement="<EMAIL>")
        return pa.table({"doc_id": t["doc_id"], "n_urls": n_urls,
                         "n_emails": n_emails, "scrubbed": out})

    return ds.map_batches(scrub, batch_format="pyarrow")


Q_DOC_SCRUB_URLS_SQL = f"""
WITH w AS (SELECT doc_id, text || '{_SCRUB_TAIL.replace("'", "''")}' AS text FROM documents)
SELECT doc_id,
       len(regexp_extract_all(text, '{_URL_PAT}')) AS n_urls,
       len(regexp_extract_all(text, '{_EMAIL_PAT}')) AS n_emails,
       regexp_replace(regexp_replace(text, '{_URL_PAT}', '<URL>', 'g'),
                      '{_EMAIL_PAT}', '<EMAIL>', 'g') AS scrubbed
FROM w
"""


# ---- charset coverage predicate (M21: the font-support check) --------------

# "Font charset": printable ASCII, CJK punctuation + kana, han, full/half-
# width forms, ellipsis — per-char membership like the reference's
# is_char_font_supported (utils.py) with a fixed charset.
SUPPORTED_CLASS = (
    r"[ -~\x{3000}-\x{30ff}\x{4e00}-\x{9fff}\x{ff01}-\x{ff9f}\x{2026}]"
)


def q_doc_charset_coverage(sf_dir: str) -> rd.Dataset:
    ds = _docs(sf_dir, ["doc_id", "text"])
    neg = SUPPORTED_CLASS.replace("[", "[^", 1)

    def cov(t: pa.Table) -> pa.Table:
        text = t["text"]
        n_unsupported = pc.cast(
            pc.count_substring_regex(text, pattern=neg), pa.int64())
        return pa.table({
            "doc_id": t["doc_id"],
            "n_unsupported": n_unsupported,
            "is_supported": pc.equal(n_unsupported, pa.scalar(0, pa.int64())),
        })

    return ds.map_batches(cov, batch_format="pyarrow")


Q_DOC_CHARSET_COVERAGE_SQL = f"""
SELECT doc_id,
       len(regexp_extract_all(text, '{SUPPORTED_CLASS.replace("[", "[^", 1)}')) AS n_unsupported,
       len(regexp_extract_all(text, '{SUPPORTED_CLASS.replace("[", "[^", 1)}')) = 0 AS is_supported
FROM documents
"""


# ---- training-mix builder: the end-to-end data-curation composition --------

def q_training_mix(sf_dir: str) -> rd.Dataset:
    """The full curation pipeline in one Dataset graph: exact-dedup winners
    (128-bit content keys) → quality gate (token count + repetition) →
    language gate (en) → (doc_id, text).  Every stage streams; the only
    shuffles are the dedup groupby+join.  This is the "switch your pipeline
    to this engine" showcase query — each stage is the production operator,
    and the whole composition is value-checked against one SQL statement."""
    from ..functions.textstats import LangIdStage, token_count_array
    from ..stages.dedup import _batch_shingle_hashes, exact_dedup

    ds = _docs(sf_dir, ["doc_id", "text"])
    deduped = exact_dedup(ds)  # keep min-id row per distinct content

    def quality_gate(t: pa.Table) -> pa.Table:
        n_tok = pc.cast(token_count_array(t["text"]), pa.int64()).to_numpy()
        sh, par = _batch_shingle_hashes(t["text"], 3)
        total = np.bincount(par, minlength=t.num_rows).astype(np.float64)
        order = np.lexsort((sh, par))
        ps, ss = par[order], sh[order]
        new = np.empty(ps.shape, dtype=bool)
        if len(ps):
            new[0] = True
            new[1:] = (ps[1:] != ps[:-1]) | (ss[1:] != ss[:-1])
        distinct = np.bincount(ps[new], minlength=t.num_rows).astype(np.float64)
        dup_ratio = 1.0 - distinct / np.maximum(total, 1.0)
        keep = (n_tok >= 20) & (dup_ratio <= 0.2)
        return t.filter(pa.array(keep))

    gated = deduped.map_batches(quality_gate, batch_format="pyarrow")
    lang = gated.map_batches(LangIdStage, fn_constructor_kwargs={},
                             batch_format="pyarrow", concurrency=(1, 2))
    return (lang.filter(expr="lang_pred == 'en'")
            .select_columns(["doc_id", "text"]))


def q_training_mix_sql() -> str:
    from ..functions.textstats import TOKEN_PATTERN, lang_id_sql

    return f"""
WITH keep AS (
  SELECT min(doc_id) AS doc_id FROM documents GROUP BY text),
dd AS (SELECT d.doc_id, d.text FROM documents d JOIN keep USING (doc_id)),
toks AS (SELECT doc_id, text, regexp_extract_all(lower(text), '{SHINGLE_TOKEN_PATTERN}') ws FROM dd),
grams AS (SELECT doc_id, text,
                 CASE WHEN len(ws) < 3 THEN [array_to_string(ws, ' ')]
                      ELSE list_transform(generate_series(1, len(ws)-2),
                                          i -> ws[i] || ' ' || ws[i+1] || ' ' || ws[i+2])
                 END AS gs
          FROM toks),
gate AS (
  SELECT doc_id, text FROM grams
  WHERE len(regexp_extract_all(text, '{TOKEN_PATTERN}')) >= 20
    AND 1.0 - len(list_distinct(gs)) * 1.0 / greatest(len(gs), 1) <= 0.2)
SELECT doc_id, text FROM gate WHERE ({lang_id_sql('text')}) = 'en'
"""


# ---- TF-IDF top terms (round 3) ---------------------------------------------

def _idf_broadcast_max() -> int:
    """Vocabulary-cardinality switch between the broadcast-idf and hash-join
    execution plans of the tf-idf family — the shared
    ``relational._broadcast_max_rows`` knob (at web scale the distinct-token
    table is ~10^9 rows; the join partitions follow the bigram-LM
    cardinality-sizing pattern)."""
    from .relational import _broadcast_max_rows

    return _broadcast_max_rows()


def q_doc_tfidf_top_terms(sf_dir: str) -> rd.Dataset:
    """Top-5 terms per document by smoothed TF-IDF
    (``tf * (ln((N+1)/(df+1)) + 1)``, sklearn's smooth-idf formula).

    Distributed plan: the vectorized token exploder → one combining
    groupby(doc_id, token) for TF → df derived from THAT table (already
    one row per (doc, token)) with a second combining groupby(token).
    The df table is vocabulary-sized, so how it meets the tf stream is
    cardinality-switched (``_idf_broadcast_max``): small vocab → one
    ``ray.put`` broadcast + map-side lookup; large vocab → hash join on
    ``token`` with partitions sized to the measured cardinality (an empty
    hash partition of the sparse side loses its schema inside Acero — the
    bigram-LM wedge guard).  Per-doc top-5 via a hash-shard groupby + one
    vectorized sort/cumcount pass per shard (per-DOC map_groups would pay
    Ray's per-group overhead once per corpus key — r4 verdict's last weak
    item).  N (corpus doc count) is the only driver-side scalar either
    way."""
    import ray as _ray

    from .relational import _join_partitions

    n_docs = _docs(sf_dir, ["doc_id"]).count()
    toks = q_doc_tokens(sf_dir).select_columns(["doc_id", "token"])
    tf = toks.groupby(["doc_id", "token"]).aggregate(Count(alias_name="tf")) \
             .materialize()  # feeds both the df agg and the idf lookup
    dfd = tf.groupby("token").aggregate(Count(alias_name="df")).materialize()
    n_vocab = dfd.count()

    if n_vocab > _idf_broadcast_max():
        n_parts = max(1, min(_join_partitions(), n_vocab // 1000))
        joined = tf.join(dfd, join_type="inner", num_partitions=n_parts,
                         on=("token",))

        def score_join(t: pa.Table) -> pa.Table:
            dfv = t["df"].to_numpy().astype(np.float64)
            s = t["tf"].to_numpy().astype(np.float64) \
                * (np.log((n_docs + 1.0) / (dfv + 1.0)) + 1.0)
            return pa.table({"doc_id": t["doc_id"], "token": t["token"],
                             "tf": pc.cast(t["tf"], pa.int64()),
                             "score": pa.array(s, pa.float64())})

        scored = joined.map_batches(score_join, batch_format="pyarrow")
    else:
        dfp = dfd.to_pandas()
        idf = dfp.set_index("token")["df"].astype(np.float64)
        idf = np.log((n_docs + 1.0) / (idf + 1.0)) + 1.0
        idf_ref = _ray.put(idf)

        class Score:
            def __init__(self, ref):
                self.idf = _ray.get(ref)

            def __call__(self, b: pd.DataFrame) -> pd.DataFrame:
                s = b["tf"].to_numpy(dtype=np.float64) \
                    * b["token"].map(self.idf).to_numpy(dtype=np.float64)
                return pd.DataFrame({"doc_id": b["doc_id"], "token": b["token"],
                                     "tf": b["tf"].astype("int64"), "score": s})

        scored = tf.map_batches(Score, fn_constructor_args=(idf_ref,),
                                batch_format="pandas", concurrency=(1, 8))

    # Per-doc top-5 finish: group COUNT is corpus-sized (one group per doc),
    # so a per-doc map_groups would pay Ray's per-group overhead 10^12 times
    # at web scale.  Hash-shard on doc_id instead and run ONE vectorized
    # pandas pass per shard (sort + C-level cumcount — the same amortization
    # as conversation_merge / doc_rarity / the line-dedup reassembly).
    from .relational import _shard_by_int

    def top5_shard(g: pd.DataFrame) -> pd.DataFrame:
        g = g.sort_values(["doc_id", "score", "token"],
                          ascending=[True, False, True], kind="mergesort")
        rnk = g.groupby("doc_id", sort=False).cumcount().to_numpy() + 1
        g = g.assign(rnk=rnk.astype(np.int64))
        return g[g["rnk"] <= 5].drop(columns=["shard"])

    return _shard_by_int(scored, "doc_id").groupby("shard").map_groups(
        top5_shard, batch_format="pandas")


def q_doc_tfidf_sql() -> str:
    return f"""
WITH toks AS (
  SELECT doc_id, unnest(regexp_extract_all(text, '{TOKEN_PATTERN}')) AS token
  FROM documents),
tf AS (SELECT doc_id, token, count(*) AS tf FROM toks GROUP BY doc_id, token),
df AS (SELECT token, count(*) AS df FROM tf GROUP BY token),
n AS (SELECT count(*) AS n_docs FROM documents),
scored AS (
  SELECT tf.doc_id, tf.token, tf.tf,
         tf.tf * (ln((n.n_docs + 1.0) / (df.df + 1.0)) + 1.0) AS score,
         row_number() OVER (PARTITION BY tf.doc_id
                            ORDER BY tf.tf * (ln((n.n_docs + 1.0) / (df.df + 1.0)) + 1.0) DESC,
                                     tf.token) AS rnk
  FROM tf JOIN df USING (token) CROSS JOIN n)
SELECT doc_id, token, CAST(tf AS BIGINT) AS tf, score, rnk
FROM scored WHERE rnk <= 5
"""


# ---- deterministic stratified sampling (round 3) -----------------------------

STRATIFIED_RATES = {"en": 0.5, "zh": 0.25}
STRATIFIED_DEFAULT_RATE = 0.1
_STRAT_SALT = ":strat1"


def _rate_threshold_hex(rate: float) -> str:
    return format(int(rate * 2**64), "016x")


def q_doc_stratified_sample(sf_dir: str) -> rd.Dataset:
    """Deterministic per-language downsampling: keep a doc iff the first 64
    bits of ``md5(doc_id || salt)`` fall under its stratum's rate — the
    standard hash-gate sampler (reproducible at any cluster size / block
    layout, no RNG state to coordinate, mirrors to SQL as a lowercase-hex
    string compare).  md5 here is a sampling gate, not a security boundary;
    the gate is the batched DuckDB-md5 kernel (``functions.hashing``), not
    a per-row hashlib loop."""
    from ..functions.hashing import md5_gate64

    ds = _docs(sf_dir, ["doc_id", "lang"])

    def keep(t: pa.Table) -> pa.Table:
        langs = t["lang"].combine_chunks().to_pylist()
        thr = np.fromiter(
            (int(STRATIFIED_RATES.get(l, STRATIFIED_DEFAULT_RATE) * 2**64)
             for l in langs), dtype=np.uint64, count=len(langs))
        hs = md5_gate64(t["doc_id"], _STRAT_SALT)
        return t.filter(pa.array(hs < thr))

    return ds.map_batches(keep, batch_format="pyarrow")


def q_doc_stratified_sample_sql() -> str:
    cases = " ".join(
        f"WHEN '{lang}' THEN '{_rate_threshold_hex(rate)}'"
        for lang, rate in STRATIFIED_RATES.items())
    default = _rate_threshold_hex(STRATIFIED_DEFAULT_RATE)
    return f"""
SELECT doc_id, lang FROM documents
WHERE substring(md5(CAST(doc_id AS VARCHAR) || '{_STRAT_SALT}'), 1, 16)
      < (CASE lang {cases} ELSE '{default}' END)
"""


# ---- token-budget sequence packing (round 3) ----------------------------------

PACK_TOKEN_BUDGET = 512


def q_doc_pack_tokens(sf_dir: str) -> rd.Dataset:
    """Assign each document to a fixed-token-budget training pack by its
    START OFFSET in the doc_id-ordered token stream:
    ``pack_id = (prefix_tokens_before_doc) // budget``.

    This is the offset-division packing rule (a doc may straddle a pack
    boundary — the trainer's concat-then-chunk view), chosen over greedy
    reset packing because it is a pure prefix-sum: sort(doc_id) →
    per-block token totals (one int each) → driver prefix sum → per-block
    vectorized cumsum + base.  Rows never pass through the driver; the
    same global-enumeration machinery as ``global_rank``/``global_ntile``."""
    import ray as _ray

    ds = q_doc_token_count(sf_dir)  # (doc_id, n_tokens) — oracle-mirrored kernel
    srt = ds.sort(["doc_id"]).materialize()
    refs = srt.get_internal_block_refs()

    @_ray.remote
    def _tok_sum(block) -> int:
        t = block if isinstance(block, pa.Table) else pa.Table.from_pandas(block)
        return int(pc.sum(t["n_tokens"]).as_py() or 0)

    @_ray.remote
    def _assign(base: int, block) -> pa.Table:
        t = block if isinstance(block, pa.Table) else pa.Table.from_pandas(block)
        n = t["n_tokens"].combine_chunks().to_numpy().astype(np.int64)
        start = base + np.cumsum(n) - n
        return t.append_column("pack_id", pa.array(start // PACK_TOKEN_BUDGET))

    sums = _ray.get([_tok_sum.remote(r) for r in refs])
    bases = np.concatenate(([0], np.cumsum(sums)[:-1]))
    return rd.from_arrow_refs(
        [_assign.remote(int(b), r) for b, r in zip(bases, refs)])


def q_doc_pack_tokens_sql() -> str:
    return f"""
WITH tc AS (SELECT doc_id,
                   len(regexp_extract_all(text, '{TOKEN_PATTERN}')) AS n_tokens
            FROM documents)
SELECT doc_id, CAST(n_tokens AS BIGINT) AS n_tokens,
       CAST((sum(n_tokens) OVER (ORDER BY doc_id ROWS UNBOUNDED PRECEDING)
             - n_tokens) // {PACK_TOKEN_BUDGET} AS BIGINT) AS pack_id
FROM tc
"""


# ---- benchmark decontamination (round 3) --------------------------------------

DECON_BENCH_MOD = 97  # docs with doc_id % 97 == 0 stand in for the eval set


def q_doc_decontaminate(sf_dir: str) -> rd.Dataset:
    """Flag training docs that share a word 3-gram with the benchmark/eval
    set (test-set-leakage guard).  The benchmark here is the deterministic
    doc_id % 97 == 0 slice of the corpus; its distinct string shingles
    broadcast via ``ray.put`` and the corpus streams through one actor-pool
    stage — no shuffle, no corpus materialization.  Oracle: the same string
    shingles in DuckDB (list_has_any vs the aggregated benchmark grams)."""
    from ..stages.dedup import decontaminate

    def is_bench(t: pa.Table, keep_bench: bool) -> pa.Table:
        # pyarrow.compute has no integer mod kernel — one numpy pass
        ids = t["doc_id"].combine_chunks().to_numpy()
        m = (ids % DECON_BENCH_MOD) == 0
        return t.filter(pa.array(m if keep_bench else ~m))

    docs = _docs(sf_dir, ["doc_id", "text"])
    bench = docs.map_batches(lambda t: is_bench(t, True), batch_format="pyarrow")
    corpus = docs.map_batches(lambda t: is_bench(t, False), batch_format="pyarrow")
    return decontaminate(corpus, bench)


def q_doc_decontaminate_sql() -> str:
    return f"""
WITH toks AS (SELECT doc_id, regexp_extract_all(lower(text), '{SHINGLE_TOKEN_PATTERN}') ws
              FROM documents),
grams AS (SELECT doc_id,
                 CASE WHEN len(ws) < 3 THEN [array_to_string(ws, ' ')]
                      ELSE list_distinct(list_transform(generate_series(1, len(ws)-2),
                                         i -> ws[i] || ' ' || ws[i+1] || ' ' || ws[i+2]))
                 END AS gs
          FROM toks),
bench AS (SELECT list(DISTINCT g) AS bgs
          FROM (SELECT unnest(gs) AS g FROM grams WHERE doc_id % {DECON_BENCH_MOD} = 0))
SELECT g.doc_id,
       CAST(CASE WHEN list_has_any(g.gs, bench.bgs) THEN 1 ELSE 0 END AS BIGINT)
         AS contaminated
FROM grams g CROSS JOIN bench
WHERE g.doc_id % {DECON_BENCH_MOD} <> 0
"""


# ---- inverted index build (token → sorted posting list) ---------------------

def q_doc_inverted_index(sf_dir: str) -> rd.Dataset:
    """Inverted-index construction — the core retrieval/decontamination data
    structure: one row per vocabulary term with its document frequency and
    the sorted posting list (comma-joined doc ids).

    Plan: tokens explode (the vectorized Arrow explode of q_doc_tokens) →
    distinct (token, doc) pairs via one combining groupby → hash-shard by
    TOKEN (same amortization trick as sessionization: Ray's per-group task
    overhead is paid per SHARD, and one pandas pass builds every posting
    list in the shard).  Output is vocabulary-sized (sublinear in corpus);
    at 100 TB a stop-word's posting list is the skew risk — the per-shard
    pass is O(shard rows) regardless, and a production sink would cap or
    block-compress hot terms (documented, not applied, so the oracle stays
    exact)."""
    from ..functions.hashing import hash64_array
    from .relational import _broadcast_max_rows, _default_shards

    def build_flat(g: pd.DataFrame) -> pd.DataFrame:
        g = g.sort_values(["token", "doc_id"], kind="mergesort")
        ids = g["doc_id"].astype(str).astype(object)
        out = g.assign(_s=ids).groupby("token", sort=True).agg(
            df=("doc_id", "size"), postings=("_s", ",".join))
        out["df"] = out["df"].astype("int64")
        return out.reset_index()

    # Small path: per-block distinct (token, doc) partials (the posting
    # material, block-deduped) combine on the driver into the full index —
    # no corpus-wide multi-key groupby, no shard shuffle.  Past the
    # broadcast bound the distributed plan below takes over.
    def ppairs(t: pa.Table) -> pa.Table:
        ex = _explode_tokens(t)
        df = pd.DataFrame({"token": ex["token"].to_pandas(),
                           "doc_id": ex["doc_id"].to_numpy()})
        df = df.drop_duplicates()
        return pa.table({"token": pa.array(df["token"], pa.string()),
                         "doc_id": pa.array(df["doc_id"], pa.int64())})

    partials = _docs(sf_dir, ["doc_id", "text"]).map_batches(
        ppairs, batch_format="pyarrow", batch_size=None).materialize()
    if partials.count() <= _broadcast_max_rows():
        pdf = partials.to_pandas().drop_duplicates()
        return rd.from_pandas(build_flat(pdf))

    toks = q_doc_tokens(sf_dir).select_columns(["doc_id", "token"])
    pairs = toks.groupby(["token", "doc_id"]).aggregate(Count(alias_name="_tf"))
    S = np.uint64(_default_shards())

    def add_shard(t: pa.Table) -> pa.Table:
        h = hash64_array(t["token"]) % S
        return pa.table({"token": t["token"], "doc_id": t["doc_id"],
                         "shard": pa.array(h.astype(np.int32))})

    def build(g: pd.DataFrame) -> pd.DataFrame:
        g = g.sort_values(["token", "doc_id"], kind="mergesort")
        ids = g["doc_id"].astype(str).astype(object)
        out = g.assign(_s=ids).groupby("token", sort=True).agg(
            df=("doc_id", "size"), postings=("_s", ",".join))
        out["df"] = out["df"].astype("int64")
        return out.reset_index()

    return pairs.map_batches(add_shard, batch_format="pyarrow") \
                .groupby("shard").map_groups(build, batch_format="pandas") \
                .select_columns(["token", "df", "postings"])


Q_DOC_INVERTED_INDEX_SQL = f"""
WITH toks AS (SELECT DISTINCT doc_id,
                     unnest(regexp_extract_all(text, '{TOKEN_PATTERN}')) AS token
              FROM documents)
SELECT token, count(*) AS df,
       string_agg(CAST(doc_id AS VARCHAR), ',' ORDER BY doc_id) AS postings
FROM toks GROUP BY token
"""


# ---- token-rarity quality score ---------------------------------------------

def q_doc_rarity(sf_dir: str) -> rd.Dataset:
    """Per-document token-rarity score: the tf-weighted mean document
    frequency of a doc's tokens — a corpus-level quality signal (low mean df
    = the doc is dominated by rare/garbled terms; high = boilerplate).

    Distributed plan: one combining groupby(doc_id, token) collapses the
    token stream to (doc, token, tf) — everything downstream works on that
    smaller table, with sum_df = Σ tf·df and n_tokens = Σ tf recovered
    exactly in int64.  The df table is vocabulary-sized, so it meets the tf
    table via the same cardinality switch as q_doc_tfidf_top_terms: small
    vocab → ``ray.put`` broadcast lookup; large vocab → hash join on
    ``token`` with cardinality-sized partitions (never a driver pandas
    Series of a 10^9-row vocabulary).  The division happens once per doc at
    the end, so the float matches the oracle exactly."""
    import ray as _ray

    from .relational import _join_partitions

    toks = q_doc_tokens(sf_dir).select_columns(["doc_id", "token"])
    tfd = toks.groupby(["doc_id", "token"]).aggregate(
        Count(alias_name="tf")).materialize()
    dfd = tfd.groupby("token").aggregate(Count(alias_name="df")).materialize()
    n_vocab = dfd.count()

    def weighted(t: pa.Table) -> pa.Table:
        tf = t["tf"].to_numpy().astype(np.int64)
        df = t["df"].to_numpy().astype(np.int64)
        return pa.table({"doc_id": t["doc_id"],
                         "wdf": pa.array(tf * df, pa.int64()),
                         "tf": pa.array(tf, pa.int64())})

    if n_vocab > _idf_broadcast_max():
        n_parts = max(1, min(_join_partitions(), n_vocab // 1000))
        pairs = tfd.join(dfd, join_type="inner", num_partitions=n_parts,
                         on=("token",)).map_batches(
            weighted, batch_format="pyarrow")
    else:
        df_ref = _ray.put(
            dfd.to_pandas().set_index("token")["df"].astype(np.int64))

        class AddDf:
            def __init__(self, ref):
                self.df = _ray.get(ref)

            def __call__(self, b: pd.DataFrame) -> pd.DataFrame:
                tf = b["tf"].to_numpy(dtype=np.int64)
                df = b["token"].map(self.df).to_numpy(dtype=np.int64)
                return pd.DataFrame({"doc_id": b["doc_id"],
                                     "wdf": tf * df, "tf": tf})

        pairs = tfd.map_batches(AddDf, fn_constructor_args=(df_ref,),
                                batch_format="pandas", concurrency=(1, 8))

    agg = pairs.groupby("doc_id").aggregate(Sum("wdf", alias_name="sum_df"),
                                            Sum("tf", alias_name="n_tokens"))

    def finish(t: pa.Table) -> pa.Table:
        s = t["sum_df"].combine_chunks().to_numpy().astype(np.float64)
        n = t["n_tokens"].combine_chunks().to_numpy().astype(np.float64)
        return pa.table({"doc_id": t["doc_id"],
                         "n_tokens": pc.cast(t["n_tokens"], pa.int64()),
                         "sum_df": pc.cast(t["sum_df"], pa.int64()),
                         "mean_df": s / n})

    return agg.map_batches(finish, batch_format="pyarrow")


Q_DOC_RARITY_SQL = f"""
WITH toks AS (SELECT doc_id, unnest(regexp_extract_all(text, '{TOKEN_PATTERN}')) AS token
              FROM documents),
dfs AS (SELECT token, count(DISTINCT doc_id) AS df FROM toks GROUP BY token)
SELECT t.doc_id, count(*) AS n_tokens, CAST(sum(d.df) AS BIGINT) AS sum_df,
       CAST(sum(d.df) AS DOUBLE) / count(*) AS mean_df
FROM toks t JOIN dfs d USING (token)
GROUP BY t.doc_id
"""


# ---- token frequency spectrum (frequency-of-frequencies / Zipf audit) --------

def q_doc_token_freq_spectrum(sf_dir: str) -> rd.Dataset:
    """Vocabulary frequency spectrum — how many distinct tokens occur exactly
    k times (the Zipf/Good-Turing "frequency of frequencies" used to audit
    corpus naturalness and tokenizer health).  Two chained combining
    groupbys: per-token counts (vocabulary-sized), then counts-of-counts
    (tiny); the raw token stream shuffles once."""
    toks = q_doc_tokens(sf_dir).select_columns(["token"])
    tf = toks.groupby("token").aggregate(Count(alias_name="freq"))
    spec = tf.groupby("freq").aggregate(Count(alias_name="n_tokens"))

    def as_i64(t: pa.Table) -> pa.Table:
        return pa.table({"freq": pc.cast(t["freq"], pa.int64()),
                         "n_tokens": pc.cast(t["n_tokens"], pa.int64())})

    return spec.map_batches(as_i64, batch_format="pyarrow")


Q_DOC_TOKEN_FREQ_SPECTRUM_SQL = f"""
WITH tf AS (SELECT token, count(*) AS c
            FROM (SELECT unnest(regexp_extract_all(text, '{TOKEN_PATTERN}')) AS token
                  FROM documents)
            GROUP BY token)
SELECT c AS freq, count(*) AS n_tokens FROM tf GROUP BY c
"""


# ---- cross-document repeated-span detection (substring-dedup core) ----------

def _doc_grams(sf_dir: str, k: int = 3) -> rd.Dataset:
    """(doc_id, pos, gram) rows — every k-token window of every document,
    built fully vectorized: one Arrow explode per batch (the q_doc_tokens
    machinery), then the k-gram strings come from ``binary_join_element_wise``
    over SHIFTED SLICES of the flat token array (no Python per token), with a
    parent mask keeping only windows that stay inside one document."""

    ds = _docs(sf_dir, ["doc_id", "text"])

    def grams(t: pa.Table) -> pa.Table:
        return _grams_table(t, k)

    return ds.map_batches(grams, batch_format="pyarrow")


def _grams_table(t: pa.Table, k: int) -> pa.Table:
    wrapped = pc.replace_substring_regex(
        t["text"].combine_chunks(), pattern=f"({TOKEN_PATTERN})",
        replacement="\x00\\1\x00")
    toks = pc.split_pattern(wrapped, "\x00")
    flat = pc.list_flatten(toks)
    parent = pc.list_parent_indices(toks).to_numpy()
    keep_arr = pc.and_(
        pc.not_equal(pc.utf8_length(flat), pa.scalar(0)),
        pc.match_substring_regex(flat, f"^(?:{TOKEN_PATTERN})$"))
    keep = keep_arr.to_numpy(zero_copy_only=False)
    flat = flat.filter(keep_arr)
    parent = parent[keep]
    n = len(flat)
    if n < k:
        return pa.table({"doc_id": pa.array([], pa.int64()),
                         "pos": pa.array([], pa.int64()),
                         "g": pa.array([], pa.string())})
    # per-doc position (segmented cumcount over contiguous parents)
    pos = np.arange(n, dtype=np.int64)
    starts = np.flatnonzero(np.r_[True, np.diff(parent) != 0])
    pos = pos - np.repeat(pos[starts], np.diff(np.r_[starts, n]))
    # k-gram join of shifted slices; valid where the window's first and
    # last token share a parent (parents are sorted, so equality at the
    # endpoints implies the whole window is in one doc)
    parts = [flat.slice(i, n - k + 1) for i in range(k)]
    joined = pc.binary_join_element_wise(*parts, " ")
    valid = parent[: n - k + 1] == parent[k - 1:]
    doc_ids = t["doc_id"].combine_chunks().to_numpy()[parent[: n - k + 1]]
    vmask = pa.array(valid)
    return pa.table({
        "doc_id": pa.array(doc_ids, pa.int64()).filter(vmask),
        "pos": pa.array(pos[: n - k + 1], pa.int64()).filter(vmask),
        "g": joined.filter(vmask),
    })


def q_doc_repeated_spans(sf_dir: str, k: int = 3) -> rd.Dataset:
    """Cross-document repeated spans — the detection core of exact substring
    dedup ("Deduplicating Training Data Makes Language Models Better", Lee
    et al. 2022): maximal token runs covered by k-grams that occur in MORE
    THAN ONE document.  Downstream curation trims or drops these spans.

    Plan (corpus shuffles k-gram strings once, ~20 B/row):
    - gram stream (vectorized, `_doc_grams`) → distinct (g, doc) pairs via
      one combining groupby → grams with doc-count > 1 (the duplicated-gram
      vocabulary, sublinear) — met by the gram stream via the shared
      cardinality switch (``relational._broadcast_max_rows``): small dup
      vocab → broadcast membership set; large → hash join on ``g`` with
      cardinality-sized partitions (the TF-IDF idf pattern — a 10^9-gram
      dup table would OOM the driver as a pandas Index);
    - the gram stream re-derives (cheap kernels — recompute beats pinning a
      corpus-sized intermediate) and keeps only duplicated positions;
    - maximal runs via the gaps-and-islands trick per doc — hash-shard by
      doc, ONE vectorized pandas pass per shard (pos − rank is constant
      within a run), outputs (doc_id, span_start, span_tokens)."""
    import ray as _ray

    from .relational import _broadcast_max_rows, _join_partitions, _shard_by_int

    grams = _doc_grams(sf_dir, k)

    # "occurs in MORE THAN ONE distinct doc" ⟺ min(doc) != max(doc), so the
    # dup vocabulary needs only per-gram (lo, hi) doc bounds.  Block-local
    # partials shrink the exchange to distinct-g per block; the combine is
    # a driver pandas pass when the partial stream is broadcast-small, else
    # a groupby over the (already block-deduped) partials — never a
    # corpus-wide distinct (g, doc) shuffle + second count groupby.
    def pminmax(t: pa.Table) -> pa.Table:
        df = pd.DataFrame({"g": t["g"].to_pandas(),
                           "d": t["doc_id"].to_pandas()})
        gr = df.groupby("g", sort=False)["d"].agg(["min", "max"])
        return pa.table({"g": pa.array(gr.index, pa.string()),
                         "_lo": pa.array(gr["min"], pa.int64()),
                         "_hi": pa.array(gr["max"], pa.int64())})

    partials = grams.map_batches(pminmax, batch_format="pyarrow") \
                    .materialize()
    if partials.count() <= _broadcast_max_rows():
        pdf = partials.to_pandas()
        gr = pdf.groupby("g", sort=False).agg(
            lo=("_lo", "min"), hi=("_hi", "max"))
        dup = rd.from_arrow(pa.table({
            "g": pa.array(gr.index[gr["lo"] != gr["hi"]], pa.string())}))
        dup = dup.materialize()
    else:
        dup = partials.groupby("g").aggregate(
            Min("_lo", alias_name="_lo2"), Max("_hi", alias_name="_hi2"))
        dup = dup.map_batches(
            lambda t: t.filter(pc.not_equal(t["_lo2"], t["_hi2"]))
                       .select(["g"]),
            batch_format="pyarrow").materialize()
    n_dup = dup.count()

    def islands(gdf: pd.DataFrame) -> pd.DataFrame:
        if not len(gdf):
            return pd.DataFrame({"doc_id": pd.Series([], dtype=np.int64),
                                 "span_start": pd.Series([], dtype=np.int64),
                                 "span_tokens": pd.Series([], dtype=np.int64)})
        gdf = gdf.sort_values(["doc_id", "pos"], kind="mergesort")
        pos = gdf["pos"].to_numpy(np.int64)
        doc = gdf["doc_id"].to_numpy(np.int64)
        new_run = np.r_[True, (np.diff(doc) != 0) | (np.diff(pos) != 1)]
        starts = np.flatnonzero(new_run)
        ends = np.r_[starts[1:], len(pos)] - 1
        return pd.DataFrame({
            "doc_id": doc[starts],
            "span_start": pos[starts],
            "span_tokens": pos[ends] - pos[starts] + k,
        })

    if n_dup > _broadcast_max_rows():
        n_parts = max(1, min(_join_partitions(), n_dup // 1000))
        marked = grams.join(dup, join_type="inner", num_partitions=n_parts,
                            on=("g",)).select_columns(["doc_id", "pos"])
        return _shard_by_int(marked, "doc_id").groupby("shard") \
            .map_groups(islands, batch_format="pandas") \
            .select_columns(["doc_id", "span_start", "span_tokens"])

    # Broadcast path: the gram stream never leaves its batch, and every
    # batch holds WHOLE documents (grams derive from the docs in the same
    # batch), so mark + maximal-run islands fuse into the gram pass — the
    # second corpus pass has NO shuffle at all.
    dup_ref = _ray.put(pd.Index(dup.to_pandas()["g"]))

    class MarkIslands:
        def __init__(self, ref):
            self.dup = _ray.get(ref)

        def __call__(self, t: pa.Table) -> pd.DataFrame:
            g = _grams_table(t, k)
            m = pd.Series(g["g"].to_pandas()).isin(self.dup).to_numpy()
            b = pd.DataFrame({
                "doc_id": g["doc_id"].to_numpy()[m],
                "pos": g["pos"].to_numpy()[m]})
            return islands(b)

    return (_docs(sf_dir, ["doc_id", "text"])
            .map_batches(MarkIslands, fn_constructor_args=(dup_ref,),
                         batch_format="pyarrow", batch_size=None,
                         concurrency=(1, 8)))


def q_doc_repeated_spans_sql(k: int = 3) -> str:
    gram_expr = " || ' ' || ".join(f"ws[i+{j}]" for j in range(k))
    return f"""
WITH toks AS (SELECT doc_id, regexp_extract_all(text, '{TOKEN_PATTERN}') ws
              FROM documents),
grams AS (
  SELECT doc_id,
         unnest(list_transform(generate_series(1, greatest(len(ws)-{k-1}, 0)),
                i -> i - 1)) AS pos,
         unnest(list_transform(generate_series(1, greatest(len(ws)-{k-1}, 0)),
                i -> {gram_expr})) AS g
  FROM toks),
dup AS (SELECT g FROM grams GROUP BY g HAVING count(DISTINCT doc_id) > 1),
marked AS (SELECT doc_id, pos,
                  pos - row_number() OVER (PARTITION BY doc_id ORDER BY pos) AS grp
           FROM grams JOIN dup USING (g))
SELECT doc_id, min(pos) AS span_start, max(pos) - min(pos) + {k} AS span_tokens
FROM marked GROUP BY doc_id, grp
"""


# ---- percentile-threshold quality gate (Gopher-style dynamic cutoff) --------

def q_doc_quality_gate(sf_dir: str, drop_frac: float = 0.10) -> rd.Dataset:
    """Drop the WORST ``drop_frac`` of the corpus by stopword_ratio — the
    Gopher/CCNet curation pattern where the filter threshold is a corpus
    percentile, not a fixed constant, so the gate adapts to the corpus.

    Rank-based (not value-threshold) semantics: docs are totally ordered by
    (stopword_ratio asc, doc_id) and the bottom ``floor(n·drop_frac)`` ranks
    are dropped — exact, deterministic, no float-threshold tie ambiguity.
    Distribution: the vectorized quality kernel streams, then one
    range-partitioned sort + per-block offsets (``global_rank`` — rows never
    funnel through the driver; only per-block counts do).  At 10^12 docs the
    sort carries only (doc_id, ratio) — 16 B/row, not the text."""
    from .relational import global_rank

    ds = _docs(sf_dir, ["doc_id", "text"])
    scored = ds.map_batches(
        lambda t: quality_batch(t, "text").select(["doc_id", "stopword_ratio"]),
        batch_format="pyarrow")
    ranked = global_rank(scored, ["stopword_ratio", "doc_id"], rank_col="rn")
    n = ranked.count()
    cutoff = int(n * drop_frac)
    return ranked.filter(expr=f"rn > {cutoff}")


Q_DOC_QUALITY_GATE_SQL = rf"""
WITH s AS (
  SELECT doc_id,
         len(regexp_extract_all(text, '{_STOPWORD_PATTERN}'))
           * 1.0 / greatest(len(regexp_extract_all(text, '{TOKEN_PATTERN}')), 1)
           AS stopword_ratio
  FROM documents),
r AS (SELECT doc_id, stopword_ratio,
             row_number() OVER (ORDER BY stopword_ratio, doc_id) AS rn,
             count(*) OVER () AS n
      FROM s)
SELECT doc_id, stopword_ratio, rn FROM r
WHERE rn > CAST(floor(n * 0.10) AS BIGINT)
"""


# ---- BM25 retrieval scoring (completes the retrieval pillar: inverted
# ---- index → candidate docs, BM25 → ranking, ANN → dense retrieval) ---------

BM25_TERMS = ["table", "merge", "fast", "hash"]
BM25_K1 = 1.2
BM25_B = 0.75


def q_doc_bm25(sf_dir: str) -> rd.Dataset:
    """Okapi BM25 score of every matching document against a fixed query
    (idf = ln((N−df+0.5)/(df+0.5)+1), the Robertson/Sparck-Jones form).

    Distributed plan — nothing corpus-sized touches the driver:
    - doc lengths: one combining groupby(doc_id) over the token stream;
    - per-(doc, term) tf: the token stream is pruned MAP-SIDE to the ≤4
      query terms (an ``is_in`` Arrow kernel) before its groupby, so the
      tf shuffle carries only matching rows;
    - df/N/avgdl: query-term-bounded (≤4 rows) and two scalars — the only
      driver-side values, broadcast into the scorer;
    - tf ⋈ doclen: hash join on doc_id (both sides one-row-per-doc-ish;
      the join reuses the same key the groupbys just partitioned on);
    - final score: vectorized formula per (doc, term) row, then one
      combining groupby(doc_id) Sum (≤4 float terms per doc; the SQL twin
      agrees to well past the hash compare's 6 decimals)."""
    import ray as _ray

    toks = q_doc_tokens(sf_dir).select_columns(["doc_id", "token"])
    dl = toks.groupby("doc_id").aggregate(Count(alias_name="dl")).materialize()
    n_docs = dl.count()
    avgdl = int(dl.sum("dl")) * 1.0 / n_docs

    terms = pa.array(BM25_TERMS)
    tf = toks.map_batches(
        lambda t: t.filter(pc.is_in(t["token"], value_set=terms)),
        batch_format="pyarrow") \
        .groupby(["doc_id", "token"]).aggregate(Count(alias_name="tf")) \
        .materialize()
    # tf is pruned to the query terms BEFORE this groupby, so dfp here is
    # ≤ len(BM25_TERMS) rows — a bounded broadcast, NOT the vocabulary-sized
    # df table that q_doc_tfidf_top_terms / q_doc_rarity cardinality-switch on
    dfp = tf.groupby("token").aggregate(Count(alias_name="df")).to_pandas()
    idf = pd.Series(
        np.log((n_docs - dfp["df"].to_numpy(dtype=np.float64) + 0.5)
               / (dfp["df"].to_numpy(dtype=np.float64) + 0.5) + 1.0),
        index=dfp["token"])
    idf_ref = _ray.put(idf)

    # partition count sized to the (known, materialized) key cardinality so
    # no hash partition is empty — an empty right partition loses its schema
    # inside Acero and kills the join (same wedge the bloom/skew joins guard)
    n_parts = max(1, min(_bm25_partitions(), n_docs // 1000))
    joined = tf.join(dl, join_type="inner", num_partitions=n_parts,
                     on=("doc_id",))

    class Score:
        def __init__(self, ref, avgdl):
            self.idf = _ray.get(ref)
            self.avgdl = avgdl

        def __call__(self, b: pd.DataFrame) -> pd.DataFrame:
            t = b["tf"].to_numpy(dtype=np.float64)
            d = b["dl"].to_numpy(dtype=np.float64)
            s = b["token"].map(self.idf).to_numpy(dtype=np.float64) \
                * t * (BM25_K1 + 1.0) \
                / (t + BM25_K1 * (1.0 - BM25_B + BM25_B * d / self.avgdl))
            return pd.DataFrame({"doc_id": b["doc_id"], "s": s})

    scored = joined.map_batches(Score, fn_constructor_args=(idf_ref, avgdl),
                                batch_format="pandas", concurrency=(1, 8))
    agg = scored.groupby("doc_id").aggregate(
        Sum("s", alias_name="bm25"), Count(alias_name="n_terms"))

    def as_types(t: pa.Table) -> pa.Table:
        return pa.table({"doc_id": t["doc_id"],
                         "bm25": pc.cast(t["bm25"], pa.float64()),
                         "n_terms": pc.cast(t["n_terms"], pa.int64())})

    return agg.map_batches(as_types, batch_format="pyarrow")


def _bm25_partitions() -> int:
    from .relational import _join_partitions

    return _join_partitions()


def q_doc_bm25_sql() -> str:
    terms = ", ".join(f"'{t}'" for t in BM25_TERMS)
    return rf"""
WITH toks AS (SELECT doc_id, unnest(regexp_extract_all(text, '{TOKEN_PATTERN}')) AS token
              FROM documents),
dl AS (SELECT doc_id, count(*) AS dl FROM toks GROUP BY doc_id),
stats AS (SELECT count(*) AS n, sum(dl) * 1.0 / count(*) AS avgdl FROM dl),
tf AS (SELECT doc_id, token, count(*) AS tf FROM toks
       WHERE token IN ({terms}) GROUP BY doc_id, token),
df AS (SELECT token, count(*) AS df FROM tf GROUP BY token)
SELECT t.doc_id,
       sum(ln((s.n - d.df + 0.5) / (d.df + 0.5) + 1.0)
           * t.tf * ({BM25_K1} + 1.0)
           / (t.tf + {BM25_K1} * (1.0 - {BM25_B} + {BM25_B} * l.dl / s.avgdl)))
         AS bm25,
       count(*) AS n_terms
FROM tf t JOIN df d USING (token) JOIN dl l USING (doc_id), stats s
GROUP BY t.doc_id
"""


# ---- C4-style cross-corpus line-level dedup ---------------------------------
# The reference dedups whole payloads by content equality (run.py:29-51
# are_images_identical); the corpus-scale text analog is C4/RefinedWeb line
# dedup: drop every LINE that occurs more than once across the corpus, then
# reassemble each document from its surviving lines in order.  The driver's
# documents table has no newlines, so "lines" are deterministic 8-token
# windows (same reshaping in the SQL twin) — the dedup semantics are the
# real operator either way.

TOKENS_PER_LINE = 8


def _lines_batch(t: pa.Table) -> pa.Table:
    """One batch of documents → (doc_id, line_no, line) rows, vectorized:
    token explode, then consecutive TOKENS_PER_LINE tokens of one doc are
    space-joined via a ListArray reslice + binary_join (no Python row loop)."""
    ex = _explode_tokens(t)
    doc_ids = ex["doc_id"].to_numpy()
    if doc_ids.size == 0:
        return pa.table({"doc_id": pa.array([], pa.int64()),
                         "line_no": pa.array([], pa.int64()),
                         "line": pa.array([], pa.string())})
    line_no = ex["tok_idx"].to_numpy() // TOKENS_PER_LINE
    change = np.r_[True, (doc_ids[1:] != doc_ids[:-1])
                   | (line_no[1:] != line_no[:-1])]
    starts = np.flatnonzero(change)
    offsets = np.r_[starts, doc_ids.size].astype(np.int32)
    lists = pa.ListArray.from_arrays(pa.array(offsets),
                                     ex["token"].combine_chunks())
    return pa.table({
        "doc_id": pa.array(doc_ids[starts], pa.int64()),
        "line_no": pa.array(line_no[starts], pa.int64()),
        "line": pc.binary_join(lists, " "),
    })


def q_doc_line_dedup(sf_dir: str) -> rd.Dataset:
    """Drop every line occurring >1 time corpus-wide; reassemble documents.

    Distributed plan (the 100-TB shape):
    - line construction is shuffle-free (per-batch, docs never split);
    - the occurrence count groupby and the count join both key on the
      128-bit blake2b line hash (two int64 cols), NOT the line string, so
      only (hash, id) columns travel the two all-to-all exchanges;
    - reassembly reuses the conversation-merge shard trick: hash-shard on
      doc_id + one vectorized pandas ordered-concat per shard (per-doc
      map_groups would pay Ray's per-group overhead once per document).
    Docs whose every line is duplicated vanish (C4 semantics).
    """
    from ..stages.dedup import _HASH_KEYS, add_content_hash
    from .relational import (_broadcast_max_rows, _join_partitions,
                             _shard_by_int)

    def reassemble(g: pd.DataFrame) -> pd.DataFrame:
        if not len(g):
            return pd.DataFrame({"doc_id": pd.Series([], dtype=np.int64),
                                 "clean_text": pd.Series([], dtype=str),
                                 "n_lines": pd.Series([], dtype=np.int64)})
        g = g.sort_values(["doc_id", "line_no"], kind="mergesort")
        agg = g.groupby("doc_id", sort=False)["line"].agg(
            clean_text=" ".join, n_lines="size")
        agg["n_lines"] = agg["n_lines"].astype(np.int64)
        return agg.reset_index()

    docs = _docs(sf_dir, ["doc_id", "text"])

    # Per-block partial line counts (block-local dedupe shrinks the
    # exchange); the duplicated-line vocabulary is SUBLINEAR, so when the
    # partial stream is broadcast-small the dup set ships once and the
    # second pass filters + reassembles inside the batch (docs never split
    # across batches) — no shuffle at all.  A web-scale partial stream
    # falls back to the 128-bit-hash-keyed groupby + count join.
    def pcounts(t: pa.Table) -> pa.Table:
        lt = _lines_batch(t)
        g = pd.Series(lt["line"].to_pandas()).value_counts(sort=False)
        return pa.table({"line": pa.array(g.index, pa.string()),
                         "n": pa.array(g.to_numpy(), pa.int64())})

    partials = docs.map_batches(pcounts, batch_format="pyarrow",
                                batch_size=None).materialize()
    if partials.count() <= _broadcast_max_rows():
        pdf = partials.to_pandas()
        tot = pdf.groupby("line", sort=False)["n"].sum()
        dup_ref = ray.put(pd.Index(tot.index[tot.to_numpy() > 1]))

        class DropDupLines:
            def __init__(self, ref):
                self.dup = ray.get(ref)

            def __call__(self, t: pa.Table) -> pd.DataFrame:
                lt = _lines_batch(t)
                keep = ~pd.Series(lt["line"].to_pandas()).isin(self.dup) \
                    .to_numpy()
                return reassemble(pd.DataFrame({
                    "doc_id": lt["doc_id"].to_numpy()[keep],
                    "line_no": lt["line_no"].to_numpy()[keep],
                    "line": pd.Series(lt["line"].to_pandas()).to_numpy()[keep],
                }))

        return docs.map_batches(DropDupLines, fn_constructor_args=(dup_ref,),
                                batch_format="pyarrow", batch_size=None,
                                concurrency=(1, 8))

    lines = docs.map_batches(_lines_batch, batch_format="pyarrow")
    hashed = lines.map_batches(
        lambda t: add_content_hash(t, "line"), batch_format="pyarrow")
    counts = (hashed.select_columns(_HASH_KEYS)
              .groupby(_HASH_KEYS).aggregate(Count(alias_name="n_copies")))
    joined = hashed.join(counts, join_type="inner",
                         num_partitions=_join_partitions(), on=tuple(_HASH_KEYS))

    def survivors(t: pa.Table) -> pa.Table:
        t = t.filter(pc.equal(t["n_copies"], pa.scalar(1)))
        return t.select(["doc_id", "line_no", "line"])

    surv = joined.map_batches(survivors, batch_format="pyarrow")
    return _shard_by_int(surv, "doc_id").groupby("shard").map_groups(
        reassemble, batch_format="pandas")


Q_DOC_LINE_DEDUP_SQL = f"""
WITH toks AS ({Q_DOC_TOKENS_SQL}),
lines AS (SELECT doc_id, tok_idx // {TOKENS_PER_LINE} AS line_no,
                 string_agg(token, ' ' ORDER BY tok_idx) AS line
          FROM toks GROUP BY doc_id, tok_idx // {TOKENS_PER_LINE}),
cnt AS (SELECT line, count(*) AS c FROM lines GROUP BY line)
SELECT l.doc_id,
       string_agg(l.line, ' ' ORDER BY l.line_no) AS clean_text,
       count(*) AS n_lines
FROM lines l JOIN cnt USING (line)
WHERE cnt.c = 1
GROUP BY l.doc_id
"""


# ---- bigram-LM quality score (CCNet-style perplexity proxy) -----------------

def _bigrams_batch(t: pa.Table, pair_key: bool = True) -> pa.Table:
    """One batch of documents → (doc_id, prev, cur) adjacent-token pairs
    (pairs never cross documents; vectorized slice of the explode output).

    ``pair_key=False`` skips the fused pair-string column for consumers that
    only read (prev, cur) — the concat is a corpus-sized allocation, a full
    wasted pass when nothing downstream groups on it (review fix r5)."""
    ex = _explode_tokens(t)
    doc_ids = ex["doc_id"].to_numpy()
    if doc_ids.size == 0:
        cols = {"doc_id": pa.array([], pa.int64()),
                "prev": pa.array([], pa.string()),
                "cur": pa.array([], pa.string())}
        if pair_key:
            cols["pair"] = pa.array([], pa.string())
        return pa.table(cols)
    same_doc = doc_ids[1:] == doc_ids[:-1]
    toks = ex["token"].combine_chunks()
    mask = pa.array(same_doc)
    prev = toks.slice(0, len(toks) - 1).filter(mask)
    cur = toks.slice(1).filter(mask)
    cols = {
        "doc_id": pa.array(doc_ids[:-1][same_doc], pa.int64()),
        "prev": prev,
        "cur": cur,
    }
    if pair_key:
        # fused single-string pair key: single-key groupbys/joins take the
        # fast path (multi-key sort-aggregates pay per-key per-block cost)
        cols["pair"] = pc.binary_join_element_wise(prev, cur, "\x00")
    return pa.table(cols)


def q_doc_bigram_lm(sf_dir: str) -> rd.Dataset:
    """Average negative log-likelihood of each document under a bigram LM
    trained on the corpus itself (the CCNet/Wikipedia-LM quality-filter
    shape, with corpus-self counts instead of an external KenLM): for each
    adjacent pair, logp = ln(count(prev,cur) / count(prev as bigram head));
    score = -mean(logp).  High avg_nll = surprising token sequences.

    Distributed plan: bigram construction is shuffle-free; counts group on
    SINGLE keys (the fused pair string and the head token).  The count
    tables are vocabulary-sized, so they meet the pair stream through the
    shared cardinality switch: below ``_broadcast_max_rows`` the per-pair
    logp table broadcasts once and the pair stream never shuffles at all —
    each batch looks up lp and emits per-doc PARTIAL sums, leaving one tiny
    combining groupby; a web-scale vocabulary falls back to single-key hash
    joins with cardinality-sized partitions (the bm25 wedge guard)."""
    from .relational import _broadcast_max_rows, _join_partitions

    docs = _docs(sf_dir, ["doc_id", "text"])

    # Per-block partial pair counts (block-deduped); the pair vocabulary is
    # sublinear, so the lp table usually builds on the driver and ships
    # once.  c1 (head counts) derives from c2 — never a second corpus pass.
    # NB: fused keys contain \x00 — pandas' object-string hashtable
    # (groupby/unique/drop_duplicates) truncates at NUL and silently merges
    # distinct keys (verified on pandas 2.2.2), so every groupby touching
    # the pair key is Arrow (NUL-safe); Series.map is NUL-safe and stays.
    def pcounts(t: pa.Table) -> pa.Table:
        pt = _bigrams_batch(t)
        g = pa.TableGroupBy(pt.select(["pair"]), "pair").aggregate(
            [("pair", "count")])
        return pa.table({"pair": g["pair"],
                         "n": pc.cast(g["pair_count"], pa.int64())})

    partials = docs.map_batches(pcounts, batch_format="pyarrow",
                                batch_size=None).materialize()
    if partials.count() <= _broadcast_max_rows():
        pt_all = pa.Table.from_pandas(partials.to_pandas(),
                                      preserve_index=False)
        cg = pa.TableGroupBy(pt_all, "pair").aggregate([("n", "sum")])
        c2g = pd.Series(cg["n_sum"].to_numpy(),
                        index=pd.Index(cg["pair"].to_pandas()))
        heads = np.asarray(c2g.index.str.split("\x00", n=1).str[0])
        c1_of_head = c2g.groupby(heads).transform("sum")
        lp = pd.Series(
            np.log(c2g.to_numpy(np.float64)
                   / c1_of_head.to_numpy(np.float64)),
            index=c2g.index)
        lp_ref = ray.put(lp)

        class DocNLL:
            """Fused: bigrams re-derive inside the doc batch (docs never
            split across batches), lp looks up broadcast, per-doc result
            finalizes in place — the second pass has NO shuffle."""

            def __init__(self, ref):
                self.lp = ray.get(ref)

            def __call__(self, t: pa.Table) -> pa.Table:
                pt = _bigrams_batch(t)
                b = pd.DataFrame({
                    "doc_id": pt["doc_id"].to_numpy(),
                    "lp": pd.Series(pt["pair"].to_pandas())
                          .map(self.lp).to_numpy(np.float64)})
                g = b.groupby("doc_id", sort=False)["lp"] \
                     .agg(["sum", "size"]).reset_index()
                nb = g["size"].to_numpy(np.int64)
                return pa.table({
                    "doc_id": pa.array(g["doc_id"], pa.int64()),
                    "n_bigrams": pa.array(nb, pa.int64()),
                    "avg_nll": pa.array(-g["sum"].to_numpy(np.float64) / nb,
                                        pa.float64())})

        return docs.map_batches(DocNLL, fn_constructor_args=(lp_ref,),
                                batch_format="pyarrow", batch_size=None,
                                concurrency=(1, 8))

    c2 = partials.groupby("pair").aggregate(
        Sum("n", alias_name="c2")).materialize()
    pairs = docs.map_batches(_bigrams_batch, batch_format="pyarrow")
    def _head(t: pa.Table) -> pa.Table:
        head = pc.list_element(pc.split_pattern(
            t["pair"], "\x00", max_splits=1), 0)
        return pa.table({"prev": head, "c2": t["c2"]})

    c1 = (c2.map_batches(_head, batch_format="pyarrow")
          .groupby("prev").aggregate(Sum("c2", alias_name="c1"))
          .materialize())
    n_parts = max(1, min(_join_partitions(), c1.count() // 1000))
    scored = (pairs.join(c2, join_type="inner", num_partitions=n_parts,
                         on=("pair",))
              .join(c1, join_type="inner", num_partitions=n_parts,
                    on=("prev",)))

    def logp(t: pa.Table) -> pa.Table:
        lp = np.log(t["c2"].to_numpy().astype(np.float64)
                    / t["c1"].to_numpy().astype(np.float64))
        return pa.table({"doc_id": t["doc_id"], "lp": pa.array(lp)})

    agg = scored.map_batches(logp, batch_format="pyarrow") \
        .groupby("doc_id").aggregate(Sum("lp", alias_name="sum_lp"),
                                     Count(alias_name="n_bigrams"))

    def final(t: pa.Table) -> pa.Table:
        nll = -t["sum_lp"].to_numpy() / t["n_bigrams"].to_numpy()
        return pa.table({"doc_id": t["doc_id"],
                         "n_bigrams": pc.cast(t["n_bigrams"], pa.int64()),
                         "avg_nll": pa.array(nll, pa.float64())})

    return agg.map_batches(final, batch_format="pyarrow")


Q_DOC_BIGRAM_LM_SQL = f"""
WITH toks AS ({Q_DOC_TOKENS_SQL}),
big AS (SELECT a.doc_id, a.token AS prev, b.token AS cur
        FROM toks a JOIN toks b
          ON a.doc_id = b.doc_id AND b.tok_idx = a.tok_idx + 1),
c2 AS (SELECT prev, cur, count(*) AS c2 FROM big GROUP BY prev, cur),
c1 AS (SELECT prev, count(*) AS c1 FROM big GROUP BY prev)
SELECT doc_id, count(*) AS n_bigrams,
       -sum(ln(c2 * 1.0 / c1)) / count(*) AS avg_nll
FROM big JOIN c2 USING (prev, cur) JOIN c1 USING (prev)
GROUP BY doc_id
"""


# ---- PII scrub (per-doc injected phone / IPv4 / card, then redact) ----------
# Same design as doc_scrub_urls: the documents table has no PII, so the
# query INJECTS deterministic per-doc PII (derived from doc_id — every doc
# differs, unlike the fixed _SCRUB_TAIL) with the identical concat on the
# SQL side, then the scrubber kernels are genuinely exercised.

_CARD_PAT = r"\b(?:\d{4}-){3}\d{4}\b"
_PHONE_PAT = r"\b\d{3}-\d{3}-\d{4}\b"
_IPV4_PAT = r"\b(?:\d{1,3}\.){3}\d{1,3}\b"


def q_doc_pii_scrub(sf_dir: str) -> rd.Dataset:
    """Redact card→phone→IP in that order (card first: its grouped digits
    contain phone-shaped substrings that \\b alone would not protect once
    the card text is partially rewritten)."""
    ds = _docs(sf_dir, ["doc_id", "text"])

    def scrub(t: pa.Table) -> pa.Table:
        did = t["doc_id"].combine_chunks().to_numpy()  # no pc modulo kernel
        phone = pc.binary_join_element_wise(
            pa.array(["call 415-555-"] * len(t)),
            pc.utf8_lpad(pa.array((did % 10000).astype(str)), 4, "0"), "")
        ip = pc.binary_join_element_wise(
            pa.array(["from 10.0."] * len(t)),
            pa.array((did % 256).astype(str)), ".",
            pa.array((did * 7 % 256).astype(str)), "")
        text = pc.binary_join_element_wise(
            t["text"].combine_chunks(), phone, ip,
            pa.array(["card 4111-1111-1111-1111 done"] * len(t)), " ")
        n_pii = pc.add(
            pc.add(pc.count_substring_regex(text, pattern=_CARD_PAT),
                   pc.count_substring_regex(text, pattern=_PHONE_PAT)),
            pc.count_substring_regex(text, pattern=_IPV4_PAT))
        out = pc.replace_substring_regex(text, pattern=_CARD_PAT,
                                         replacement="<CARD>")
        out = pc.replace_substring_regex(out, pattern=_PHONE_PAT,
                                         replacement="<PHONE>")
        out = pc.replace_substring_regex(out, pattern=_IPV4_PAT,
                                         replacement="<IP>")
        return pa.table({"doc_id": t["doc_id"],
                         "n_pii": pc.cast(n_pii, pa.int64()),
                         "scrubbed": out})

    return ds.map_batches(scrub, batch_format="pyarrow")


Q_DOC_PII_SCRUB_SQL = rf"""
WITH w AS (SELECT doc_id,
                  text || ' call 415-555-' || lpad(CAST(doc_id % 10000 AS VARCHAR), 4, '0')
                       || ' from 10.0.' || CAST(doc_id % 256 AS VARCHAR)
                       || '.' || CAST((doc_id * 7) % 256 AS VARCHAR)
                       || ' card 4111-1111-1111-1111 done' AS text
           FROM documents)
SELECT doc_id,
       len(regexp_extract_all(text, '{_CARD_PAT}'))
         + len(regexp_extract_all(text, '{_PHONE_PAT}'))
         + len(regexp_extract_all(text, '{_IPV4_PAT}')) AS n_pii,
       regexp_replace(regexp_replace(regexp_replace(text,
           '{_CARD_PAT}', '<CARD>', 'g'),
           '{_PHONE_PAT}', '<PHONE>', 'g'),
           '{_IPV4_PAT}', '<IP>', 'g') AS scrubbed
FROM w
"""


# ---- per-doc character entropy (gibberish / low-diversity signal) -----------

def q_doc_char_entropy(sf_dir: str) -> rd.Dataset:
    """Shannon entropy (nats) of each document's character distribution —
    the cheap gibberish/repetition quality signal.  Fully vectorized: the
    batch's texts decode into ONE uint32 codepoint array (the normalize-
    kernel trick), per-(doc, char) counts come from a single ``np.unique``
    over packed (doc_ix << 21 | codepoint) keys, and per-doc sums from one
    ``np.add.at`` — no shuffle at all (one output row per input row)."""
    ds = _docs(sf_dir, ["doc_id", "text"])

    def ent(t: pa.Table) -> pa.Table:
        texts = t["text"].combine_chunks().fill_null("")
        lens = pc.utf8_length(texts).to_numpy(zero_copy_only=False).astype(np.int64)
        cp = np.frombuffer("".join(texts.to_pylist()).encode("utf-32-le"),
                           dtype=np.uint32).astype(np.int64)
        doc_ix = np.repeat(np.arange(lens.size, dtype=np.int64), lens)
        uniq, counts = np.unique((doc_ix << 21) | cp, return_counts=True)
        udoc = (uniq >> 21)
        p = counts / lens[udoc]
        entropy = np.zeros(lens.size, np.float64)
        np.add.at(entropy, udoc, -p * np.log(p))
        keep = lens > 0  # empty docs have no char rows in the SQL twin
        return pa.table({
            "doc_id": t["doc_id"].combine_chunks().filter(pa.array(keep)),
            "n_chars": pa.array(lens[keep]),
            "entropy": pa.array(entropy[keep]),
        })

    return ds.map_batches(ent, batch_format="pyarrow")


Q_DOC_CHAR_ENTROPY_SQL = """
WITH ch AS (SELECT doc_id, unnest(regexp_extract_all(text, '.')) AS c FROM documents),
cc AS (SELECT doc_id, c, count(*) AS k FROM ch GROUP BY doc_id, c),
n AS (SELECT doc_id, sum(k) AS n FROM cc GROUP BY doc_id)
SELECT cc.doc_id, CAST(max(n.n) AS BIGINT) AS n_chars,
       -sum((k * 1.0 / n.n) * ln(k * 1.0 / n.n)) AS entropy
FROM cc JOIN n USING (doc_id) GROUP BY cc.doc_id
"""


# ---- PMI collocations (word2vec/phrase-mining shape) -------------------------

PMI_MIN_COUNT = 5
PMI_TOP_K = 20


def q_doc_pmi_pairs(sf_dir: str) -> rd.Dataset:
    """Top-20 adjacent-token collocations by pointwise mutual information
    ln(c_xy·N / (c_head·c_tail)), min pair count 5 — the phrase-mining /
    word2vec-negative-sampling statistic.  Count tables are vocabulary-
    sized; the only corpus-sized exchange is the pair groupby; the final
    sort runs over the ≥min_count survivors only."""
    from .relational import _join_partitions

    pairs = _docs(sf_dir, ["doc_id", "text"]).map_batches(
        functools.partial(_bigrams_batch, pair_key=False),
        batch_format="pyarrow").drop_columns(["doc_id"])
    c2 = pairs.groupby(["prev", "cur"]).aggregate(Count(alias_name="c2"))
    heads = pairs.select_columns(["prev"]).groupby("prev").aggregate(
        Count(alias_name="ch"))
    tails = pairs.select_columns(["cur"]).groupby("cur").aggregate(
        Count(alias_name="ct"))
    c2 = c2.filter(expr=f"c2 >= {PMI_MIN_COUNT}").materialize()
    n_pairs = int(heads.sum("ch"))
    # Partitions sized to c2's POST-FILTER cardinality (the bigram-LM wedge
    # guard): the min-count filter can leave very few surviving pairs, and an
    # empty hash partition loses its schema inside Acero and kills the join.
    n_parts = max(1, min(_join_partitions(), c2.count() // 1000))
    joined = (c2.join(heads, join_type="inner", num_partitions=n_parts,
                      on=("prev",))
              .join(tails, join_type="inner", num_partitions=n_parts,
                    on=("cur",)))

    def pmi(t: pa.Table) -> pa.Table:
        # float64 BEFORE the multiply: c2*N in int64 overflows at 10^12-row
        # scale (c2 and N are both corpus-sized counts)
        c2v = t["c2"].to_numpy().astype(np.float64)
        ratio = (c2v * float(n_pairs)) \
            / (t["ch"].to_numpy().astype(np.float64)
               * t["ct"].to_numpy().astype(np.float64))
        return pa.table({"prev": t["prev"], "cur": t["cur"],
                         "n_xy": pc.cast(t["c2"], pa.int64()),
                         "pmi": pa.array(np.log(ratio))})

    return (joined.map_batches(pmi, batch_format="pyarrow")
            .sort(["pmi", "prev", "cur"], descending=[True, False, False])
            .limit(PMI_TOP_K))


Q_DOC_PMI_PAIRS_SQL = f"""
WITH toks AS ({Q_DOC_TOKENS_SQL}),
big AS (SELECT a.doc_id, a.token AS prev, b.token AS cur
        FROM toks a JOIN toks b
          ON a.doc_id = b.doc_id AND b.tok_idx = a.tok_idx + 1),
c2 AS (SELECT prev, cur, count(*) AS n_xy FROM big GROUP BY prev, cur
       HAVING count(*) >= {PMI_MIN_COUNT}),
heads AS (SELECT prev, count(*) AS ch FROM big GROUP BY prev),
tails AS (SELECT cur, count(*) AS ct FROM big GROUP BY cur),
n AS (SELECT count(*) AS n FROM big)
SELECT prev, cur, n_xy, ln(n_xy * n.n / (ch * 1.0 * ct)) AS pmi
FROM c2 JOIN heads USING (prev) JOIN tails USING (cur), n
ORDER BY pmi DESC, prev, cur LIMIT {PMI_TOP_K}
"""


# ---- fuzzy string self-join (FastSS deletion neighborhoods) ------------------

FUZZY_MAX_DIST = 2


def _deletion_neighborhood(tok: str, k: int = FUZZY_MAX_DIST) -> set[str]:
    """All strings reachable by deleting ≤ k characters (incl. tok itself).
    FastSS (Bocek et al. 2007): lev(a, b) ≤ k  ⟺  the k-deletion
    neighborhoods of a and b intersect — candidates are a guaranteed
    superset, the exact verify restores precision."""
    out, frontier = {tok}, {tok}
    for _ in range(k):
        frontier = {s[:i] + s[i + 1:] for s in frontier for i in range(len(s))}
        out |= frontier
    return out


def q_doc_fuzzy_token_join(sf_dir: str) -> rd.Dataset:
    """Vocabulary pairs within edit distance ≤ 2 (typo/variant detection —
    the data-cleaning fuzzy self-join).

    Distributed plan: the corpus-sized exchange is only the vocabulary
    groupby; everything after runs at VOCAB scale.  Deletion variants
    explode per vocab batch (loops here iterate the vocabulary, not the
    corpus), candidate pairs form inside hash-sharded variant buckets,
    duplicates collapse in one combining groupby, and the exact
    byte-Levenshtein verify (DuckDB-equal: functions/metrics.py
    edit_distance) runs once per distinct candidate pair."""
    from ..functions.hashing import hash64_array
    from ..functions.metrics import edit_distance

    vocab = (q_doc_tokens(sf_dir).select_columns(["token"])
             .groupby("token").aggregate(Count(alias_name="n"))
             .drop_columns(["n"]))

    def variants(t: pa.Table) -> pa.Table:
        toks, vs = [], []
        for tok in t["token"].to_pylist():
            for v in _deletion_neighborhood(tok):
                toks.append(tok)
                vs.append(v)
        return pa.table({"token": pa.array(toks, pa.string()),
                         "variant": pa.array(vs, pa.string())})

    ex = vocab.map_batches(variants, batch_format="pyarrow")

    def add_shard(t: pa.Table) -> pa.Table:
        h = hash64_array(t["variant"].combine_chunks())
        return t.append_column(
            "shard", pa.array((h % np.uint64(64)).astype(np.int32)))

    def pairs_in_shard(g: pd.DataFrame) -> pd.DataFrame:
        out_a: list[str] = []
        out_b: list[str] = []
        for _, grp in g.groupby("variant", sort=False):
            ts = sorted(set(grp["token"]))
            for i in range(len(ts)):
                for j in range(i + 1, len(ts)):
                    out_a.append(ts[i])
                    out_b.append(ts[j])
        return pd.DataFrame({"tok_a": out_a, "tok_b": out_b})

    cand = (ex.map_batches(add_shard, batch_format="pyarrow")
            .groupby("shard").map_groups(pairs_in_shard, batch_format="pandas")
            .groupby(["tok_a", "tok_b"]).aggregate(Count(alias_name="nbuckets"))
            .drop_columns(["nbuckets"]))

    def verify(t: pa.Table) -> pa.Table:
        a = t["tok_a"].to_pylist()
        b = t["tok_b"].to_pylist()
        d = np.fromiter((edit_distance(x, y, unit="byte") for x, y in zip(a, b)),
                        dtype=np.int64, count=len(a))
        keep = d <= FUZZY_MAX_DIST
        return pa.table({"tok_a": pa.array(a, pa.string()).filter(pa.array(keep)),
                         "tok_b": pa.array(b, pa.string()).filter(pa.array(keep)),
                         "dist": pa.array(d[keep])})

    return cand.map_batches(verify, batch_format="pyarrow")


Q_DOC_FUZZY_TOKEN_JOIN_SQL = f"""
WITH toks AS (SELECT unnest(regexp_extract_all(text, '{TOKEN_PATTERN}')) AS t
              FROM documents),
v AS (SELECT DISTINCT t FROM toks)
SELECT a.t AS tok_a, b.t AS tok_b,
       CAST(levenshtein(a.t, b.t) AS BIGINT) AS dist
FROM v a JOIN v b ON a.t < b.t AND levenshtein(a.t, b.t) <= {FUZZY_MAX_DIST}
"""


# ---- temperature source mixing (multinomial α-sampling, T5/LLaMA shape) ------

_TMIX_SALT = "tmix"


def q_doc_temperature_sample(sf_dir: str) -> rd.Dataset:
    """Rebalance the per-language mix toward p_s ∝ count_l^α with α = 0.5 —
    the multinomial temperature sampling used to up-weight small languages/sources in
    LLM training mixes.  Keep rate r_l = sqrt(c_min / c_l) (smallest language
    keeps everything; expected kept count ∝ sqrt(c_l)), gated per row by the
    same deterministic md5 hash gate as q_doc_stratified_sample.

    α is fixed at 0.5 ON PURPOSE: the rate is then one IEEE-exact division
    + one IEEE-exact sqrt, so numpy and DuckDB compute bit-identical
    thresholds (a general pow(c, α−1) can differ by 1 ulp between libms and
    flip a boundary row).  Scale: language counts are a tiny combining
    groupby; rates broadcast into the gate closure; the filter is map-side
    — no corpus-sized shuffle at all."""
    from ..functions.hashing import md5_gate64

    counts = (_docs(sf_dir, ["lang"]).groupby("lang")
              .aggregate(Count(alias_name="c")).to_pandas())
    cmin = int(counts["c"].min())
    # floor(rate * 2^60): 60-bit threshold == 15 hex chars of the md5 gate
    thr_by_lang = {
        s: (1 << 60) if c <= cmin
        else int(np.sqrt(cmin * 1.0 / c) * (1 << 60))
        for s, c in zip(counts["lang"], counts["c"])
    }
    ds = _docs(sf_dir, ["doc_id", "lang"])

    def keep(t: pa.Table) -> pa.Table:
        srcs = t["lang"].combine_chunks().to_pylist()
        thr = np.fromiter((thr_by_lang.get(s, 1 << 60) for s in srcs),
                          dtype=np.uint64, count=len(srcs))
        hs = md5_gate64(t["doc_id"], _TMIX_SALT) >> np.uint64(4)
        return t.filter(pa.array(hs < thr))

    return ds.map_batches(keep, batch_format="pyarrow")


Q_DOC_TEMPERATURE_SAMPLE_SQL = f"""
WITH c AS (SELECT lang, count(*) AS c FROM documents GROUP BY lang),
m AS (SELECT min(c) AS cmin FROM c),
t AS (SELECT lang,
             CASE WHEN c.c <= m.cmin THEN 'g'
                  ELSE lpad(lower(to_hex(CAST(floor(sqrt(m.cmin * 1.0 / c.c)
                                              * 1152921504606846976) AS BIGINT))),
                            15, '0') END AS thr
      FROM c, m)
SELECT d.doc_id, d.lang
FROM documents d JOIN t USING (lang)
WHERE substring(md5(CAST(d.doc_id AS VARCHAR) || '{_TMIX_SALT}'), 1, 15) < t.thr
"""


# ---- PageRank over the token co-occurrence graph (iterative Dataset algo) ----

PR_DAMPING = 0.85
PR_ITERS = 3


def _pr_pairs_batch(t: pa.Table) -> pa.Table:
    """One batch of documents → fused ``prev\\x00cur`` pair keys, with a
    SENTINEL pair ``tok\\x00`` (empty successor) for each document's last
    token.  Every token occurrence therefore appears exactly once as a pair
    head, so ONE single-key groupby over this stream yields the edge
    weights (cur != ''), the out-weights (sum per head over real edges)
    AND the full node set (distinct heads) — one corpus pass instead of
    three."""
    ex = _explode_tokens(t)
    doc_ids = ex["doc_id"].to_numpy()
    toks = ex["token"].combine_chunks()
    if doc_ids.size == 0:
        return pa.table({"pair": pa.array([], pa.string())})
    shifted = pa.concat_arrays(
        [toks.slice(1), pa.array([""], pa.string())])
    same_doc = np.concatenate(
        [doc_ids[1:] == doc_ids[:-1], np.array([False])])
    cur = pc.if_else(pa.array(same_doc), shifted, "")
    return pa.table({"pair": pc.binary_join_element_wise(toks, cur, "\x00")})


def q_doc_token_pagerank(sf_dir: str) -> rd.Dataset:
    """PageRank (damping 0.85, 3 unrolled power iterations) over the
    directed bigram graph: nodes = vocabulary, edge prev→cur weighted by
    bigram count, out-normalized.  The iterative-Dataset-algorithm shape:
    every iteration is one hash join (edges ⋈ ranks on the src key) + one
    combining groupby (incoming mass per dst) + one zero-filled left join
    back onto the node set — rank state lives in a Dataset, never on the
    driver, so the same plan runs at a 10^9-node graph.  Dangling nodes
    (no out-edges) leak their mass, identically on both sides; join
    partitions DERIVE from the measured node count (the bigram-LM
    cardinality-sizing pattern: ≥1 so the tiny-vocab empty-partition wedge
    guard holds, growing with the vocabulary so a 10^9-node graph doesn't
    funnel every iteration through one partition)."""
    from .relational import _join_partitions

    # ONE corpus pass: single-key groupby over the sentinel pair stream
    # yields edges + out-weights + node set (see _pr_pairs_batch).
    allp = (_docs(sf_dir, ["doc_id", "text"])
            .map_batches(_pr_pairs_batch, batch_format="pyarrow")
            .groupby("pair").aggregate(Count(alias_name="w"))
            .materialize())  # vocabulary-sized

    def split(t: pa.Table) -> pa.Table:
        s = pc.split_pattern(t["pair"], "\x00", max_splits=1)
        return pa.table({"prev": pc.list_element(s, 0),
                         "cur": pc.list_element(s, 1), "w": t["w"]})

    allp = allp.map_batches(split, batch_format="pyarrow").materialize()

    # Cardinality switch: the aggregated pair table is vocabulary-sized.
    # Below the broadcast bound the whole graph fits the driver, where the
    # three power iterations are a numpy bincount loop — 9+ distributed ops
    # collapse to one. A web-scale vocabulary takes the Dataset-iterative
    # path below (rank state never leaves the cluster).
    from .relational import _broadcast_max_rows
    if allp.count() <= _broadcast_max_rows():
        g = allp.to_pandas()
        toks, inv = np.unique(
            np.concatenate([g["prev"].to_numpy(), g["cur"].to_numpy()]),
            return_inverse=True)
        src, dst = inv[:len(g)], inv[len(g):]
        real = g["cur"].to_numpy() != ""
        src_r, dst_r = src[real], dst[real]
        w = g["w"].to_numpy(np.float64)[real]
        ow = np.bincount(src_r, weights=w, minlength=len(toks))
        wn = w / ow[src_r]
        n = int((toks != "").sum())
        rank = np.full(len(toks), 1.0 / n)
        base = (1.0 - PR_DAMPING) / n
        for _ in range(PR_ITERS):
            m = np.bincount(dst_r, weights=wn * rank[src_r],
                            minlength=len(toks))
            rank = base + PR_DAMPING * m
        keep = toks != ""
        return rd.from_arrow(pa.table({
            "token": pa.array(toks[keep], pa.string()),
            "rank": pa.array(rank[keep], pa.float64())}))

    edges = allp.filter(expr="cur != ''")
    outw = (edges.groupby("prev")
            .aggregate(Sum("w", alias_name="ow")).materialize())
    n_parts = max(1, min(_join_partitions(), outw.count() // 1000))
    edges = edges.join(outw, join_type="inner", num_partitions=n_parts,
                       on=("prev",))

    def norm(t: pa.Table) -> pa.Table:
        wn = t["w"].to_numpy() * 1.0 / t["ow"].to_numpy()
        return pa.table({"prev": t["prev"], "cur": t["cur"],
                         "wn": pa.array(wn, pa.float64())})

    edges = edges.map_batches(norm, batch_format="pyarrow").materialize()
    nodes = (allp.groupby("prev").aggregate(Count(alias_name="_n"))
             .map_batches(lambda t: pa.table({"token": t["prev"]}),
                          batch_format="pyarrow").materialize())
    n_nodes = nodes.count()
    n_parts = max(1, min(_join_partitions(), n_nodes // 1000))
    base = (1.0 - PR_DAMPING) / n_nodes

    def init(t: pa.Table) -> pa.Table:
        return pa.table({"token": t["token"],
                         "rank": pa.array(np.full(len(t), 1.0 / n_nodes))})

    rank = nodes.map_batches(init, batch_format="pyarrow")
    for _ in range(PR_ITERS):
        contrib = edges.join(rank, join_type="inner", num_partitions=n_parts,
                             on=("prev",), right_on=("token",))

        def mass(t: pa.Table) -> pa.Table:
            m = t["wn"].to_numpy() * t["rank"].to_numpy()
            return pa.table({"cur": t["cur"], "m": pa.array(m)})

        summed = (contrib.map_batches(mass, batch_format="pyarrow")
                  .groupby("cur").aggregate(Sum("m", alias_name="m")))
        joined = nodes.join(summed, join_type="left_outer",
                            num_partitions=n_parts,
                            on=("token",), right_on=("cur",))

        def update(t: pa.Table) -> pa.Table:
            m = t["m"].fill_null(0.0).to_numpy(zero_copy_only=False)
            return pa.table({"token": t["token"],
                             "rank": pa.array(base + PR_DAMPING * m)})

        rank = joined.map_batches(update, batch_format="pyarrow").materialize()
    return rank


def q_doc_token_pagerank_sql() -> str:
    d, it = PR_DAMPING, PR_ITERS
    sql = f"""
WITH toks AS ({Q_DOC_TOKENS_SQL}),
big AS (SELECT a.token AS prev, b.token AS cur
        FROM toks a JOIN toks b ON a.doc_id = b.doc_id AND b.tok_idx = a.tok_idx + 1),
edges AS (SELECT prev, cur, count(*) AS w FROM big GROUP BY prev, cur),
outw AS (SELECT prev, sum(w) AS ow FROM edges GROUP BY prev),
e AS (SELECT prev, cur, w * 1.0 / ow AS wn FROM edges JOIN outw USING (prev)),
nodes AS (SELECT DISTINCT token AS t FROM toks),
nn AS (SELECT count(*) AS n FROM nodes),
r0 AS (SELECT t, 1.0 / nn.n AS r FROM nodes, nn)"""
    prev = "r0"
    for i in range(1, it + 1):
        sql += f""",
s{i} AS (SELECT e.cur, sum(e.wn * {prev}.r) AS m
         FROM e JOIN {prev} ON e.prev = {prev}.t GROUP BY e.cur),
r{i} AS (SELECT nodes.t,
                (1.0 - {d}) / nn.n + {d} * COALESCE(s{i}.m, 0.0) AS r
         FROM nodes CROSS JOIN nn LEFT JOIN s{i} ON s{i}.cur = nodes.t)"""
        prev = f"r{i}"
    sql += f"\nSELECT t AS token, r AS rank FROM {prev}"
    return sql


# ---- per-source document cap (round 3) -----------------------------------

SOURCE_CAP_K = 15
_CAP_SALT = ":cap1"


def q_doc_source_cap(sf_dir: str) -> rd.Dataset:
    """At-most-K docs per source — the Gopher/C4-style per-domain cap that
    stops one crawl host from dominating a training mix.  Selection is a
    deterministic per-group reservoir: keep the K docs whose
    ``md5(doc_id || salt)`` hex is smallest (tie-break doc_id), so the
    choice is reproducible at any cluster size / block layout and mirrors
    to SQL as a ``row_number() OVER (PARTITION BY source ORDER BY md5..)``.

    Scale shape (sources are HOT keys — a handful of groups over the whole
    corpus): a naive ``groupby(source).map_groups`` would funnel the full
    corpus through a few tasks.  Instead each block keeps its own K
    smallest per source present in the block (combiner), so the exchange
    carries at most ``K x sources`` rows per block and the final per-group
    selection handles bounded input regardless of corpus size.  Only
    (doc_id, source, hkey) ever shuffles.
    """
    from ..functions.hashing import md5_hex32

    ds = _docs(sf_dir, ["doc_id", "source"])

    def partial_topk(t: pa.Table) -> pd.DataFrame:
        df = t.to_pandas()
        df["hkey"] = md5_hex32(t["doc_id"], _CAP_SALT)
        return (df.sort_values(["hkey", "doc_id"])
                  .groupby("source", sort=False).head(SOURCE_CAP_K))

    def final_topk(g: pd.DataFrame) -> pd.DataFrame:
        return (g.sort_values(["hkey", "doc_id"]).head(SOURCE_CAP_K)
                 [["doc_id", "source"]])

    return (ds.map_batches(partial_topk, batch_format="pyarrow")
              .groupby("source").map_groups(final_topk, batch_format="pandas"))


def q_doc_source_cap_sql() -> str:
    return f"""
SELECT doc_id, source FROM (
  SELECT doc_id, source,
         row_number() OVER (
           PARTITION BY source
           ORDER BY md5(CAST(doc_id AS VARCHAR) || '{_CAP_SALT}'), doc_id) AS rn
  FROM documents) WHERE rn <= {SOURCE_CAP_K}
"""


def q_doc_source_concentration(sf_dir: str) -> pd.DataFrame:
    """Source-mix concentration audit: Herfindahl–Hirschman index Σ shareᵢ²,
    normalized Shannon entropy −Σ sᵢ·ln sᵢ / ln k, and the largest single
    source's share — the one-row dashboard a training-mix pipeline checks
    before/after the per-source cap above (is one crawl host dominating?).
    ONE combining groupby over the handful of sources; the driver finishes
    on the source-bounded table."""
    ds = _docs(sf_dir, ["source"])
    c = (ds.groupby("source").aggregate(Count(alias_name="n")).to_pandas())
    n = c["n"].to_numpy(dtype=np.float64)
    s = n / n.sum()
    k = len(s)
    entropy_norm = float(-(s * np.log(s)).sum() / np.log(k)) if k > 1 else 0.0
    return pd.DataFrame({
        "n_docs": [int(n.sum())],
        "n_sources": [k],
        "hhi": [float((s ** 2).sum())],
        "top_share": [float(s.max())],
        "entropy_norm": [entropy_norm],
    })


Q_DOC_SOURCE_CONCENTRATION_SQL = """
WITH c AS (SELECT source, CAST(count(*) AS DOUBLE) AS n
           FROM documents GROUP BY 1),
tot AS (SELECT sum(n) AS t, count(*) AS k FROM c)
SELECT CAST(min(tot.t) AS BIGINT) AS n_docs,
       CAST(min(tot.k) AS BIGINT) AS n_sources,
       sum(pow(c.n / tot.t, 2)) AS hhi,
       max(c.n / tot.t) AS top_share,
       CASE WHEN min(tot.k) > 1
            THEN -sum(c.n / tot.t * ln(c.n / tot.t)) / ln(min(tot.k))
            ELSE 0.0 END AS entropy_norm
FROM c CROSS JOIN tot
"""


# ---- Zipf-law exponent of the token distribution ------------------------------

def q_doc_zipf_slope(sf_dir: str, top_n: int = 100) -> pd.DataFrame:
    """Zipf exponent of the corpus vocabulary: the OLS slope of ln(freq) on
    ln(rank) over the top-N tokens — the standard one-number corpus-health
    audit (natural text reads ≈ −1; templated/spam corpora flatten).  The
    corpus-sized work is ONE per-token combining groupby (the q_doc_tokens
    explode, same as the frequency spectrum above); the rank sort touches only
    vocabulary-sized counts, and the driver finishes on ≤N rows — bounded by
    construction.  Tie order (freq desc, token asc) is total because tokens
    are distinct, so the top-N cut is deterministic and matches the SQL
    ``row_number() OVER (ORDER BY freq DESC, token)`` oracle exactly; the
    closed-form centered OLS mirrors DuckDB's regr_slope (covar_pop/var_pop)
    to ~1e-12."""
    toks = q_doc_tokens(sf_dir).select_columns(["token"])
    tf = toks.groupby("token").aggregate(Count(alias_name="freq"))
    top = (tf.sort(["freq", "token"], descending=[True, False])
             .limit(top_n).to_pandas())
    y = np.log(top["freq"].to_numpy(dtype=np.float64))
    x = np.log(np.arange(1, len(top) + 1, dtype=np.float64))
    xc = x - x.mean()
    slope = float((xc * (y - y.mean())).sum() / (xc * xc).sum())
    return pd.DataFrame({"n_terms": [len(top)], "zipf_slope": [slope]})


Q_DOC_ZIPF_SLOPE_SQL = f"""
WITH tf AS (SELECT token, count(*) AS freq
            FROM (SELECT unnest(regexp_extract_all(text, '{TOKEN_PATTERN}')) AS token
                  FROM documents)
            GROUP BY token),
top AS (SELECT freq, row_number() OVER (ORDER BY freq DESC, token) AS rn
        FROM tf ORDER BY freq DESC, token LIMIT 100)
SELECT count(*) AS n_terms, regr_slope(ln(freq), ln(rn)) AS zipf_slope FROM top
"""


# ---- order-independent distributed table checksum ------------------------------

def q_doc_table_checksum(sf_dir: str) -> pd.DataFrame:
    """Order-independent content fingerprint of the documents table: XOR of
    the md5-low-64 of every ``doc_id|text`` row.  XOR is commutative and
    associative, so ANY block layout / task order / cluster size produces the
    same 64 bits — the cheap answer to "did the resumed / repartitioned /
    re-run output change?" that a 100-TB pipeline wants after every stage
    (compare two checksums instead of joining two corpora).  Each block
    reduces to ONE partial (xor, count); the driver folds block partials —
    no shuffle at all.  Hash kernel is the batched DuckDB-md5 gate
    (functions/hashing.py md5_gate64), so the SQL oracle mirrors it
    bit-for-bit."""
    from ..functions.hashing import md5_gate64

    ds = _docs(sf_dir, ["doc_id", "text"])

    def partial(t: pa.Table) -> pa.Table:
        key = pc.binary_join_element_wise(
            pc.cast(t["doc_id"], pa.string()), t["text"], "|")
        h = md5_gate64(key)
        x = np.bitwise_xor.reduce(h) if len(h) else np.uint64(0)
        return pa.table({"xor_part": pa.array([np.uint64(x).view(np.int64)]),
                         "n": pa.array([len(h)], pa.int64())})

    parts = ds.map_batches(partial, batch_format="pyarrow").to_pandas()
    v = np.bitwise_xor.reduce(parts["xor_part"].to_numpy().view(np.uint64)) \
        if len(parts) else np.uint64(0)
    return pd.DataFrame({"checksum_hex": [f"{int(v):016x}"],
                         "n_rows": [int(parts["n"].sum())]})


Q_DOC_TABLE_CHECKSUM_SQL = """
SELECT lower(lpad(to_hex(bit_xor(
         CAST(('0x' || substring(md5(CAST(doc_id AS VARCHAR) || '|' || text),
                                 1, 16)) AS UBIGINT))), 16, '0')) AS checksum_hex,
       CAST(count(*) AS BIGINT) AS n_rows
FROM documents
"""


# ---- triangle counting on the token-adjacency graph ---------------------------

def q_doc_token_triangles(sf_dir: str) -> pd.DataFrame:
    """Triangle count of the token-adjacency graph (distinct undirected
    adjacent-token pairs) — the classic distributed graph statistic (the
    clustering-coefficient numerator).  Plan: canonically orient every edge
    (u < v, UTF-8 order — identical in Arrow and DuckDB), block-local Arrow
    dedup then ONE combining groupby gives the distinct edge set; wedges
    u–v–w come from one hash join of the edge list with itself (u<v<w holds
    by construction, so each triangle is built exactly once), closed by a
    second join against the edge set on (u, w).  Edge/wedge streams are
    vocabulary-bounded, never corpus-sized.  (At web scale the standard
    refinement — orient by degree instead of lexicographically — bounds the
    wedge fan-out of hub nodes; lexicographic orientation keeps the oracle
    twin exact here.)"""
    from .relational import _join_partitions

    pairs = _docs(sf_dir, ["doc_id", "text"]).map_batches(
        functools.partial(_bigrams_batch, pair_key=False),
        batch_format="pyarrow").drop_columns(["doc_id"])

    def orient(t: pa.Table) -> pa.Table:
        p, c = t["prev"].combine_chunks(), t["cur"].combine_chunks()
        lt = pc.less(p, c)
        tbl = pa.table({"u": pc.if_else(lt, p, c), "v": pc.if_else(lt, c, p)})
        tbl = tbl.filter(pc.invert(pc.equal(p, c)))
        return pa.TableGroupBy(tbl, ["u", "v"]).aggregate([])  # block dedup

    edges = (pairs.map_batches(orient, batch_format="pyarrow")
                  .groupby(["u", "v"]).aggregate(Count(alias_name="c"))
                  .drop_columns(["c"]).materialize())
    n_parts = max(1, min(_join_partitions(), edges.count() // 1000))
    as_vw = edges.map_batches(
        lambda t: pa.table({"v": t["u"], "w": t["v"]}), batch_format="pyarrow")
    as_uw = edges.map_batches(
        lambda t: pa.table({"u": t["u"], "w": t["v"]}), batch_format="pyarrow")
    wedges = edges.join(as_vw, join_type="inner", num_partitions=n_parts,
                        on=("v",))
    closed = wedges.join(as_uw, join_type="inner", num_partitions=n_parts,
                         on=("u", "w"))
    return pd.DataFrame({"n_triangles": [closed.count()]})


def q_doc_token_triangles_sql() -> str:
    return f"""
WITH toks AS ({Q_DOC_TOKENS_SQL}),
big AS (SELECT a.token AS prev, b.token AS cur
        FROM toks a JOIN toks b
          ON a.doc_id = b.doc_id AND b.tok_idx = a.tok_idx + 1),
e AS (SELECT DISTINCT least(prev, cur) AS u, greatest(prev, cur) AS v
      FROM big WHERE prev <> cur)
SELECT CAST(count(*) AS BIGINT) AS n_triangles
FROM e e1 JOIN e e2 ON e2.u = e1.v JOIN e e3 ON e3.u = e1.u AND e3.v = e2.v
"""


# ---- pairwise source-vocabulary Jaccard (corpus-slice similarity) -------------

def q_source_vocab_jaccard(sf_dir: str) -> pd.DataFrame:
    """Jaccard similarity of the token vocabularies of every source pair —
    the corpus-comparison matrix a data-mixing pipeline consults before
    blending a new source (near-1 pairs are redundant feeds; near-0 pairs
    shift the mix).  Plan: block-local Arrow dedup + ONE combining groupby
    gives distinct (source, token); per-source sizes are a tiny groupby;
    intersections come from one token-keyed self-join pre-filtered to
    (a < b), so the exchange is bounded by Σ_token deg(token)² ≤
    |sources|²·vocab, never the corpus.  Driver sees |sources|²/2 rows."""
    from .relational import _join_partitions

    from ..functions.textstats import tokens_with_parent

    ds = _docs(sf_dir, ["source", "text"])

    def distinct_pairs(t: pa.Table) -> pa.Table:
        tok, par = tokens_with_parent(t["text"])
        src = t["source"].combine_chunks().take(pa.array(par))
        return pa.TableGroupBy(pa.table({"source": src, "token": tok}),
                               ["source", "token"]).aggregate([])

    st = (ds.map_batches(distinct_pairs, batch_format="pyarrow")
            .groupby(["source", "token"]).aggregate(Count(alias_name="c"))
            .drop_columns(["c"]).materialize())
    sizes = (st.groupby("source").aggregate(Count(alias_name="n"))
               .to_pandas().set_index("source")["n"])
    n_parts = max(1, min(_join_partitions(), st.count() // 1000))
    a = st.map_batches(lambda t: pa.table({"token": t["token"],
                                           "sa": t["source"]}),
                       batch_format="pyarrow")
    b = st.map_batches(lambda t: pa.table({"token": t["token"],
                                           "sb": t["source"]}),
                       batch_format="pyarrow")
    inter = (a.join(b, join_type="inner", num_partitions=n_parts, on=("token",))
              .map_batches(lambda t: t.filter(pc.less(t["sa"], t["sb"])),
                           batch_format="pyarrow")
              .groupby(["sa", "sb"]).aggregate(Count(alias_name="n_common"))
              .to_pandas())
    na = inter["sa"].map(sizes).to_numpy(dtype=np.int64)
    nb = inter["sb"].map(sizes).to_numpy(dtype=np.int64)
    ni = inter["n_common"].to_numpy(dtype=np.int64)
    out = pd.DataFrame({
        "source_a": inter["sa"], "source_b": inter["sb"],
        "n_common": ni.astype(np.int64),
        "jaccard": ni.astype(np.float64) / (na + nb - ni),
    })
    return out.sort_values(["source_a", "source_b"]).reset_index(drop=True)


Q_SOURCE_VOCAB_JACCARD_SQL = f"""
WITH st AS (SELECT DISTINCT source, token
            FROM (SELECT source,
                         unnest(regexp_extract_all(text, '{TOKEN_PATTERN}')) AS token
                  FROM documents)),
sizes AS (SELECT source, count(*) AS n FROM st GROUP BY source),
inter AS (SELECT a.source AS source_a, b.source AS source_b,
                 CAST(count(*) AS BIGINT) AS n_common
          FROM st a JOIN st b USING (token)
          WHERE a.source < b.source GROUP BY 1, 2)
SELECT source_a, source_b, n_common,
       n_common * 1.0 / (x.n + y.n - n_common) AS jaccard
FROM inter JOIN sizes x ON x.source = source_a
           JOIN sizes y ON y.source = source_b
"""
