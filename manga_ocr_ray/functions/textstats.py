"""Text-analysis kernels: token counting, quality scoring, language ID,
document fingerprinting.

The large-scale-training-pipeline operators layered over the reference's
char-class utilities (manga_ocr_dev/synthetic_data_generator/common/
utils.py:60-151 — kanji/hiragana/katakana/ascii predicates), re-expressed as
vectorized kernels over Arrow string arrays.
"""

from __future__ import annotations

import re

import numpy as np
import pyarrow as pa
import pyarrow.compute as pc

from .hashing import content_hash64, mix64

# CJK-aware tokenization (the reference is a Japanese-text system: BudouX
# semantic splitting base_generator.py:129-155; kana/kanji predicates
# common/utils.py:60-151).  Codepoint-range classes, matching the reference's
# unicodedata.name-based predicates over the BMP blocks that occur in text:
#   kanji    = CJK Unified Ideographs (+ext A)        U+3400-4DBF, U+4E00-9FFF
#   hiragana = Hiragana block                          U+3041-309F
#   katakana = Katakana (+phonetic ext, halfwidth)     U+30A0-30FF, U+31F0-31FF,
#                                                      U+FF66-FF9F
# (The combining kana voicing marks U+3099-309C carry BOTH names in Unicode;
# the reference double-counts them, this range kernel counts them as the
# hiragana block they live in.)
# A token is a latin/digit run, a hiragana run, a katakana run, or ONE kanji
# — so Japanese text no longer counts 0 tokens.  Same RE2 pattern is used by
# the Arrow kernels and the DuckDB oracles.
_HIRA = "ぁ-ゟ"
_KATA = "゠-ヿㇰ-ㇿｦ-ﾟ"
_HAN = "㐀-䶿一-鿿"
TOKEN_PATTERN = rf"[A-Za-z0-9]+|[{_HIRA}]+|[{_KATA}]+|[{_HAN}]"
# shingling runs over lower()ed text, so the latin class is lowercase there
SHINGLE_TOKEN_PATTERN = rf"[a-z0-9]+|[{_HIRA}]+|[{_KATA}]+|[{_HAN}]"
KANJI_CLASS = f"[{_HAN}]"
HIRAGANA_CLASS = f"[{_HIRA}]"
KATAKANA_CLASS = f"[{_KATA}]"
PUNCT_PATTERN = r"[.,!?;:]"
STOPWORDS_EN = ("the", "a", "an", "and", "of", "to", "in", "is", "on", "for")
_STOPWORD_PATTERN = r"(?i)\b(?:" + "|".join(STOPWORDS_EN) + r")\b"


def token_count_array(arr: pa.Array | pa.ChunkedArray) -> pa.Array:
    """Whitespace-ish token count = matches of TOKEN_PATTERN (RE2 kernel)."""
    return pc.count_substring_regex(arr, pattern=TOKEN_PATTERN)


def tokens_with_parent(
    texts: pa.Array | pa.ChunkedArray, pattern: str = TOKEN_PATTERN,
) -> tuple[pa.Array, np.ndarray]:
    """(flat token strings, parent row index) for a whole batch — the
    vectorized equivalent of per-row ``regexp_extract_all(text, pattern)``
    (DuckDB oracle twin), Arrow-only: sentinel-wrap every match, split on
    the sentinel, keep pieces that fully match.  ``parent`` is nondecreasing
    (tokens grouped per row, in document order).  Unlike the dedup
    tokenizer this does NOT lowercase — it mirrors the oracle-visible
    TOKEN_PATTERN semantics used by the metric/quality queries."""
    if isinstance(texts, pa.ChunkedArray):
        texts = texts.combine_chunks()
    wrapped = pc.replace_substring_regex(
        texts.fill_null(""), pattern=f"({pattern})", replacement="\x00\\1\x00")
    toks = pc.split_pattern(wrapped, "\x00")
    flat = pc.list_flatten(toks)
    keep_arr = pc.and_(
        pc.not_equal(pc.utf8_length(flat), pa.scalar(0)),
        pc.match_substring_regex(flat, f"^(?:{pattern})$"),
    )
    keep = keep_arr.to_numpy(zero_copy_only=False)
    parent = pc.list_parent_indices(toks).to_numpy()[keep]
    return flat.filter(keep_arr), parent


def bigrams_with_parent(tok: np.ndarray,
                        par: np.ndarray) -> tuple[np.ndarray, np.ndarray]:
    """Within-row adjacent-token bigram strings ('a b') via shifted arrays
    masked at row boundaries — the SINGLE definition shared by every
    oracle-mirrored gram stream (BLEU, DSIR): tokens cannot contain spaces
    (TOKEN_PATTERN), so the joined form is unambiguous and mirrors
    ``toks[i] || ' ' || toks[i+1]`` in SQL exactly."""
    if tok.size < 2:
        return np.empty(0, dtype=object), np.empty(0, dtype=par.dtype)
    valid = par[:-1] == par[1:]
    sep = np.full(int(valid.sum()), " ", dtype=object)
    return tok[:-1][valid] + sep + tok[1:][valid], par[:-1][valid]


def quality_batch(batch: pa.Table, text_col: str = "text") -> pa.Table:
    """Per-document quality stats, all RE2/Arrow kernels (no Python rows):

    n_chars, n_tokens, n_punct, n_stopwords, stopword_ratio, punct_ratio.
    SQL-mirrorable: length() + len(regexp_extract_all()) in DuckDB.
    """
    text = batch[text_col]
    n_chars = pc.utf8_length(text)
    n_tokens = pc.count_substring_regex(text, pattern=TOKEN_PATTERN)
    n_punct = pc.count_substring_regex(text, pattern=PUNCT_PATTERN)
    n_stop = pc.count_substring_regex(text, pattern=_STOPWORD_PATTERN)
    denom_t = pc.max_element_wise(n_tokens, pa.scalar(1, n_tokens.type))
    denom_c = pc.max_element_wise(n_chars, pa.scalar(1, n_chars.type))
    out = batch.select([c for c in batch.column_names if c != text_col])
    out = out.append_column("n_chars", pc.cast(n_chars, pa.int64()))
    out = out.append_column("n_tokens", pc.cast(n_tokens, pa.int64()))
    out = out.append_column("n_punct", pc.cast(n_punct, pa.int64()))
    out = out.append_column("n_stopwords", pc.cast(n_stop, pa.int64()))
    out = out.append_column(
        "stopword_ratio", pc.divide(pc.cast(n_stop, pa.float64()), pc.cast(denom_t, pa.float64()))
    )
    out = out.append_column(
        "punct_ratio", pc.divide(pc.cast(n_punct, pa.float64()), pc.cast(denom_c, pa.float64()))
    )
    return out


# ---- language ID (n-gram / stopword heuristic) ----------------------------

# Tiny per-language stopword seed lists (public common function words).
_LANG_STOPWORDS: dict[str, tuple[str, ...]] = {
    "en": ("the", "and", "of", "to", "is", "in", "that", "it", "for", "was"),
    "de": ("der", "die", "das", "und", "ist", "nicht", "ein", "mit", "für", "von"),
    "fr": ("le", "la", "les", "et", "est", "une", "pour", "dans", "que", "pas"),
    "es": ("el", "la", "los", "las", "es", "una", "por", "para", "con", "del"),
}
_WORD_RE = re.compile(r"[^\W\d_]+", re.UNICODE)


def lang_id(text: str) -> str:
    """Deterministic heuristic language ID.

    Codepoint-range vote for CJK scripts (kana → ja, hangul → ko, han → zh),
    else best stopword-overlap among latin languages, else 'und'.
    """
    kana = han = hangul = 0
    for ch in text:
        cp = ord(ch)
        if 0x3040 <= cp <= 0x30FF or 0xFF66 <= cp <= 0xFF9F:
            kana += 1
        elif 0x4E00 <= cp <= 0x9FFF:
            han += 1
        elif 0xAC00 <= cp <= 0xD7A3:
            hangul += 1
    n = max(1, len(text))
    if kana / n > 0.05:
        return "ja"
    if hangul / n > 0.05:
        return "ko"
    if han / n > 0.05:
        return "zh"
    words = [w.lower() for w in _WORD_RE.findall(text)]
    if not words:
        return "und"
    best, best_score = "und", 0
    for lang, stops in _LANG_STOPWORDS.items():
        score = sum(1 for w in words if w in stops)
        if score > best_score:
            best, best_score = lang, score
    return best if best_score > 0 else "en" if all(w.isascii() for w in words) else "und"


class LangIdStage:
    """Actor-pool stage: per-batch VECTORIZED language ID — the CJK counts
    and the per-language stopword scores are RE2 count kernels over the whole
    column; only the argmax/threshold decision runs in numpy.  Patterns are
    compiled once per actor in ``__init__``.  Semantics identical to the SQL
    mirror (both use RE2 ``\\p{L}``) and to the scalar :func:`lang_id` on
    all inputs EXCEPT Nl/No number-letters (Ⅻ, ①), which Python's ``\\w``
    tokenizes but RE2's ``\\p{L}`` does not — see the __init__ comment;
    stage ↔ scalar agreement on ordinary text is pinned by pytest."""

    _KANA = r"[\x{3040}-\x{30ff}\x{ff66}-\x{ff9f}]"
    _HAN = r"[\x{4e00}-\x{9fff}]"
    _HANGUL = r"[\x{ac00}-\x{d7a3}]"
    _WORD = r"[\p{L}]+"

    def __init__(self, text_col: str = "text", out_col: str = "lang_pred"):
        self.text_col = text_col
        self.out_col = out_col
        self.langs = list(_LANG_STOPWORDS)
        # Stopwords are counted on a SEPARATOR-NORMALIZED copy of the text:
        # lower() then replace every non-letter run with TWO spaces and pad
        # the ends, so ``" the "`` matches with plain non-overlapping regex
        # scanning even for adjacent stopwords ("of the" → "of  the" — each
        # match consumes one of the two separator spaces).  This reproduces
        # the scalar tokenizer's split-on-digits/underscore semantics that a
        # plain \b alternation gets wrong ("the123" must count "the": \b
        # sees no boundary before a digit).  Residual divergence from the
        # scalar [^\W\d_]+ tokenizer: RE2's \p{L} excludes Nl/No number
        # letters (Ⅻ, ①) that Python's \w includes — the SQL oracle uses
        # \p{L} too, so stage ↔ oracle agree exactly.
        self.stop_pats = {
            lang: " (?:" + "|".join(stops) + ") "
            for lang, stops in _LANG_STOPWORDS.items()
        }

    def __call__(self, batch: pa.Table) -> pa.Table:
        text = batch[self.text_col].fill_null("")
        if isinstance(text, pa.ChunkedArray):
            text = text.combine_chunks()

        def cnt(pat: str) -> np.ndarray:
            return pc.count_substring_regex(text, pattern=pat).to_numpy(
                zero_copy_only=False).astype(np.float64)

        n = np.maximum(pc.utf8_length(text).to_numpy(zero_copy_only=False), 1)
        kana, han, hangul = cnt(self._KANA), cnt(self._HAN), cnt(self._HANGUL)
        n_words = cnt(self._WORD)
        # separator-normalized copy for exact word-boundary stopword counts
        folded = pc.binary_join_element_wise(
            pa.scalar(" "),
            pc.replace_substring_regex(
                pc.utf8_lower(text), pattern=r"[^\p{L}]+", replacement="  "),
            pa.scalar(" "), "")

        def cnt_stop(pat: str) -> np.ndarray:
            return pc.count_substring_regex(folded, pattern=pat).to_numpy(
                zero_copy_only=False).astype(np.float64)

        scores = np.stack([cnt_stop(self.stop_pats[lang]) for lang in self.langs])
        best_i = scores.argmax(axis=0)  # first-in-dict-order wins ties
        best_s = scores.max(axis=0)
        # non-ascii LETTERS ([^ascii ∪ non-letter] = letters outside ascii):
        # >0 iff some word is non-ascii, the scalar fallback's condition
        non_ascii_word = cnt(r"[^\x00-\x7f\P{L}]")

        latin = np.where(best_s > 0,
                         np.array(self.langs, dtype=object)[best_i], "und")
        # fallback: every word pure-ascii -> 'en'
        latin = np.where((best_s == 0) & (non_ascii_word == 0), "en", latin)
        preds = np.where(n_words == 0, "und", latin)
        preds = np.where(han / n > 0.05, "zh", preds)
        preds = np.where(hangul / n > 0.05, "ko", preds)
        preds = np.where(kana / n > 0.05, "ja", preds)
        return batch.append_column(self.out_col, pa.array(list(preds), pa.string()))


# ---- document fingerprint (rolling-hash shingle sketch) -------------------

def fingerprint_batch(texts: list[str], num_hashes: int = 4, shingle: int = 8) -> np.ndarray:
    """Winnowing-style doc fingerprint: min-k of rolling byte-shingle hashes,
    XOR-folded into one uint64 per document.  Pure function of content."""
    out = np.empty(len(texts), dtype=np.uint64)
    for i, t in enumerate(texts):
        data = np.frombuffer(t.encode("utf-8"), dtype=np.uint8)
        if len(data) < shingle:
            out[i] = mix64(content_hash64([t]))[0]
            continue
        # vectorized rolling hash: polynomial over a sliding window
        n = len(data) - shingle + 1
        acc = np.zeros(n, dtype=np.uint64)
        for off in range(shingle):
            acc = acc * np.uint64(1099511628211) + data[off : off + n].astype(np.uint64)
        hashes = mix64(acc)
        k = min(num_hashes, len(hashes))
        mins = np.partition(hashes, k - 1)[:k]
        out[i] = np.bitwise_xor.reduce(mins)
    return out


def fingerprint_map_batch(batch: pa.Table, text_col: str = "text") -> pa.Table:
    fps = fingerprint_batch(batch[text_col].fill_null("").to_pylist())
    return batch.append_column("fingerprint", pa.array(fps.astype(np.int64)))


def lang_id_sql(expr: str = "text") -> str:
    """DuckDB SQL expression replicating :class:`LangIdStage` exactly (and
    the scalar :func:`lang_id` up to the Nl/No number-letter tokenizer
    divergence noted on the class).

    CJK codepoint-fraction votes in the same order (ja → ko → zh), then
    stopword argmax over the same lists with first-in-dict-order winning
    ties, then the ascii→'en' fallback."""
    n = f"greatest(length({expr}), 1)"
    kana = f"len(regexp_extract_all({expr}, '[\\x{{3040}}-\\x{{30ff}}\\x{{ff66}}-\\x{{ff9f}}]'))"
    han = f"len(regexp_extract_all({expr}, '[\\x{{4e00}}-\\x{{9fff}}]'))"
    hangul = f"len(regexp_extract_all({expr}, '[\\x{{ac00}}-\\x{{d7a3}}]'))"
    ws = f"regexp_extract_all(lower({expr}), '[\\p{{L}}]+')"
    scores = {}
    for lang, stops in _LANG_STOPWORDS.items():
        lst = ", ".join(f"'{w}'" for w in stops)
        scores[lang] = f"len(list_filter({ws}, w -> list_contains([{lst}], w)))"
    s = scores
    all_ascii = f"len(list_filter({ws}, w -> regexp_matches(w, '^[\\x00-\\x7f]+$'))) = len({ws})"
    return f"""CASE
  WHEN {kana} * 1.0 / {n} > 0.05 THEN 'ja'
  WHEN {hangul} * 1.0 / {n} > 0.05 THEN 'ko'
  WHEN {han} * 1.0 / {n} > 0.05 THEN 'zh'
  WHEN len({ws}) = 0 THEN 'und'
  WHEN {s['en']} > 0 AND {s['en']} >= greatest({s['de']}, {s['fr']}, {s['es']}) THEN 'en'
  WHEN {s['de']} > 0 AND {s['de']} >= greatest({s['fr']}, {s['es']}) THEN 'de'
  WHEN {s['fr']} > 0 AND {s['fr']} >= {s['es']} THEN 'fr'
  WHEN {s['es']} > 0 THEN 'es'
  WHEN {all_ascii} THEN 'en'
  ELSE 'und'
END"""
