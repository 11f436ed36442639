"""HTML boilerplate-strip and main-content extraction kernels.

Two levels, both deterministic (north-rule: bit-identical across cluster
sizes — pure functions of the row, no RNG):

- :func:`strip_html_array` — a fixed chain of RE2 regex passes over an Arrow
  string array (``pyarrow.compute.replace_substring_regex``), exactly
  mirrorable in DuckDB SQL (see :func:`strip_html_sql`).  Removes comments,
  ``<script>``/``<style>`` regions, ruby readings (``<rt>``), all remaining
  tags, and decodes the common named entities.  This is the vectorized
  analog of the reference's markup-to-text inverse (the reference *generates*
  ruby/tcy markup at manga_ocr_dev/synthetic_data_generator/generator.py:184-280;
  we extract through it).

- :func:`extract_main_html` — the "deterministic span-extraction model" of
  the north star: additionally drops boilerplate regions (``nav``/``header``/
  ``footer``/``aside``) and applies a DOM-block text/link-density heuristic
  (blocks whose anchor-text fraction exceeds ``MAX_LINK_DENSITY`` are
  classified boilerplate and dropped).  Per-block scoring is per-row Python
  over compiled regexes; the whole-document passes stay vectorized.
"""

from __future__ import annotations

import re

import pyarrow as pa
import pyarrow.compute as pc

# ---- chain shared by the vectorized kernel and the DuckDB oracle ----------
# (pattern, replacement) executed in order with RE2 global replace.
_STRIP_STEPS: list[tuple[str, str]] = [
    (r"(?s)<!--.*?-->", " "),
    (r"(?is)<script\b[^>]*>.*?</script>", " "),
    (r"(?is)<style\b[^>]*>.*?</style>", " "),
    (r"(?is)<rt\b[^>]*>.*?</rt>", ""),  # ruby reading, not main text
    (r"(?s)<[^>]*>", " "),
]
# Named-entity decode; &amp; LAST so "&amp;lt;" decodes to "&lt;" not "<".
_ENTITY_STEPS: list[tuple[str, str]] = [
    ("&lt;", "<"),
    ("&gt;", ">"),
    ("&quot;", '"'),
    ("&#39;", "'"),
    ("&apos;", "'"),
    ("&nbsp;", " "),
    ("&amp;", "&"),
]

MAX_LINK_DENSITY = 0.4

_BOILERPLATE_TAGS = ("head", "nav", "header", "footer", "aside")

# Whole-document region passes.  COMMENTS run as their own pass FIRST: a
# comment may contain a commented-out region closer ("<nav> x <!-- </nav>
# --> y </nav>"), and a fused alternation would let the nav alternative
# consume up to the closer inside the comment, leaking " --> y" into kept
# text (ADVICE r2).  The remaining region passes (script/style/rt/
# boilerplate) are fused into ONE alternation (RE2 has no backreferences,
# so each region keeps its own open..close alternative); every replacement
# is " ".  Two scans per document instead of nine.
#
# Defined semantics for MUTUALLY interleaved raw-text regions (a <script>
# whose JS string contains a literal "</style>", etc.): leftmost-first —
# whichever region opens first is consumed to its own first closer.  Such
# documents are ill-formed HTML with no canonical parse; the pinned
# fixtures in tests/test_extract.py cover both the comment case and an
# interleaved-region case.
_COMMENT_PAT = _STRIP_STEPS[0][0]
_COMMENT_PY = re.compile(_COMMENT_PAT)
_PRE_STEPS_RE2: list[str] = [p for p, _ in _STRIP_STEPS[1:4]] + [
    rf"(?is)<{t}\b[^>]*>.*?</{t}>" for t in _BOILERPLATE_TAGS
]
_PRE_FUSED = "(?is)(?:" + "|".join(
    p.replace("(?s)", "").replace("(?is)", "") for p in _PRE_STEPS_RE2
) + ")"
_PRE_FUSED_PY = re.compile(_PRE_FUSED)
_BLOCK_SPLIT_RE = re.compile(
    r"(?i)</?(?:p|div|h[1-6]|li|ul|ol|table|tr|td|th|main|article|section|"
    r"body|html|head|blockquote|pre|br)\b[^>]*>"
)
_ANCHOR_RE = re.compile(r"(?is)<a\b[^>]*>(.*?)</a>")
_TAG_RE = re.compile(r"(?s)<[^>]*>")


def strip_html_array(arr: pa.Array | pa.ChunkedArray) -> pa.Array | pa.ChunkedArray:
    """Vectorized tag strip + entity decode (RE2 kernels, zero Python rows)."""
    for pat, rep in _STRIP_STEPS:
        arr = pc.replace_substring_regex(arr, pattern=pat, replacement=rep)
    for lit, rep in _ENTITY_STEPS:
        arr = pc.replace_substring(arr, pattern=lit, replacement=rep)
    return arr


def strip_html_sql(expr: str) -> str:
    """DuckDB SQL expression computing strip_html_array(expr) exactly."""
    out = expr
    for pat, rep in _STRIP_STEPS:
        out = f"regexp_replace({out}, '{pat}', '{rep}', 'g')"
    for lit, rep in _ENTITY_STEPS:
        rep_sql = rep.replace("'", "''")
        out = f"replace({out}, '{lit.replace(chr(39), chr(39) * 2)}', '{rep_sql}')"
    return out


def _decode_entities(text: str) -> str:
    if "&" not in text:
        return text
    for lit, rep in _ENTITY_STEPS:
        text = text.replace(lit, rep)
    return text


# Anchor text is wrapped in \x02..\x03 markers BEFORE tags are stripped, with
# a space on each side standing in for the removed <a>/</a> tags, so the kept
# text is byte-identical to the old per-block _TAG_RE.sub(" ") path.  Block
# boundary tags become \x00.  All three passes are RE2 kernels; the per-row
# remainder is C-level str.find/split only.
_ANCHOR_WRAP_PAT = r"(?is)<a\b[^>]*>(.*?)</a>"
_TAG_PAT = r"(?s)<[^>]*>"


def _classify_blocks(marked: str) -> str:
    """Density classification for ONE marker-annotated, tag-stripped doc:
    \x00 = block boundary, \x02..\x03 = anchor text (each marker carries one
    stand-in space inside).  Drop empty and link-dense blocks, decode
    entities, join with newlines."""
    kept: list[str] = []
    for block in marked.split("\x00"):
        if "\x02" in block:
            anchor_chars = 0
            i = block.find("\x02")
            while i != -1:
                j = block.find("\x03", i + 1)
                if j == -1:
                    break  # anchor split across blocks: not counted (as before)
                anchor_chars += max(0, j - i - 3)  # minus the 2 stand-in spaces
                i = block.find("\x02", j + 1)
            text = block.replace("\x02", "").replace("\x03", "")
        else:
            anchor_chars = 0
            text = block.replace("\x03", "")
        stripped = text.strip()
        if not stripped:
            continue
        if anchor_chars / max(1, len(stripped)) > MAX_LINK_DENSITY:
            continue
        kept.append(_decode_entities(stripped))
    return "\n".join(kept)


_ANCHOR_WRAP_PY = re.compile(_ANCHOR_WRAP_PAT)
_TAG_PY = re.compile(_TAG_PAT)


def extract_main_html(html: str) -> str:
    """Main-content extraction for ONE document — same five passes as the
    batched path (exact twins): comment strip → fused region strip → anchor
    marking → block boundaries → tag strip → density classification."""
    html = _COMMENT_PY.sub(" ", html)
    html = _PRE_FUSED_PY.sub(" ", html)
    html = _ANCHOR_WRAP_PY.sub("\x02 \\1 \x03", html)
    html = _BLOCK_SPLIT_RE.sub("\x00", html)
    html = _TAG_PY.sub(" ", html)
    return _classify_blocks(html)


# Python str.strip()'s exact whitespace set (Unicode White_Space plus the
# \x1c-\x1f separators CPython additionally treats as space), built from
# str.isspace itself so it can never drift (no astral codepoint is space).
# utf8_trim with this set makes the vectorized trim equal Python .strip().
_PY_WHITESPACE = "".join(chr(c) for c in range(0x10000) if chr(c).isspace())

_ANCHOR_PAIR_PAT = r"(?s)\x02.*?\x03"


def _classify_blocks_array(marked: pa.Array) -> pa.Array:
    """Vectorized :func:`_classify_blocks` over a whole column — the per-row
    str.find loop becomes ~8 Arrow kernel passes over the flattened blocks.

    Anchor accounting: the scalar loop pairs each \\x02 with the next \\x03
    and counts ``j-i-3`` chars; the regex ``\\x02.*?\\x03`` produces the
    identical non-overlapping pairing, so per block
    ``anchor_chars = Σ match_len − 4·n_pairs`` (each match carries the two
    markers + two stand-in spaces).  The scalar ``max(0, ·)`` clamp can only
    bite when markers pre-exist in the INPUT text — the caller falls back to
    the scalar path for such batches, so the two implementations stay
    bit-equal everywhere (property-pinned)."""
    import numpy as np

    n_docs = len(marked)
    blocks = pc.split_pattern(marked, "\x00")
    flat = pc.list_flatten(blocks)
    parent = pc.list_parent_indices(blocks).to_numpy()

    lens = pc.utf8_length(flat)
    n_pairs = pc.count_substring_regex(flat, pattern=_ANCHOR_PAIR_PAT)
    depaired = pc.replace_substring_regex(flat, pattern=_ANCHOR_PAIR_PAT,
                                          replacement="")
    anchor_chars = (
        lens.to_numpy(zero_copy_only=False)
        - pc.utf8_length(depaired).to_numpy(zero_copy_only=False)
        - 4 * n_pairs.to_numpy(zero_copy_only=False)
    )
    text = pc.replace_substring(flat, pattern="\x02", replacement="")
    text = pc.replace_substring(text, pattern="\x03", replacement="")
    stripped = pc.utf8_trim(text, characters=_PY_WHITESPACE)
    slen = pc.utf8_length(stripped).to_numpy(zero_copy_only=False)
    keep = (slen > 0) & ~(anchor_chars / np.maximum(1, slen) > MAX_LINK_DENSITY)

    kept = stripped.filter(pa.array(keep))
    for lit, rep in _ENTITY_STEPS:
        kept = pc.replace_substring(kept, pattern=lit, replacement=rep)
    counts = np.bincount(parent[keep], minlength=n_docs)
    offsets = np.zeros(n_docs + 1, dtype=np.int64)
    np.cumsum(counts, out=offsets[1:])
    la = pa.ListArray.from_arrays(offsets.astype(np.int32), kept)
    return pc.binary_join(la, "\n")


def extract_main_html_array(arr: pa.Array | pa.ChunkedArray) -> pa.Array:
    """Batched main-content extraction: all five document passes run as RE2
    Arrow kernels (comment strip, fused region strip, anchor marking, block
    boundaries, tag strip) and the density classification is vectorized too
    (:func:`_classify_blocks_array`) — zero per-row Python in the hot path.
    Batches whose INPUT text already contains marker/boundary control chars
    (\\x00/\\x02/\\x03 — never produced by the wrap passes themselves) fall
    back to the scalar classifier, whose clamp semantics define the
    contract for that ill-formed case."""
    if isinstance(arr, pa.ChunkedArray):
        arr = arr.combine_chunks()
    raw_markers = pc.any(pc.match_substring_regex(
        arr.fill_null(""), r"[\x00\x02\x03]")).as_py()
    arr2 = pc.replace_substring_regex(arr, pattern=_COMMENT_PAT, replacement=" ")
    arr2 = pc.replace_substring_regex(arr2, pattern=_PRE_FUSED, replacement=" ")
    arr2 = pc.replace_substring_regex(arr2, pattern=_ANCHOR_WRAP_PAT,
                                      replacement="\x02 \\1 \x03")
    arr2 = pc.replace_substring_regex(arr2, pattern=_BLOCK_SPLIT_RE.pattern,
                                      replacement="\x00")
    arr2 = pc.replace_substring_regex(arr2, pattern=_TAG_PAT, replacement=" ")
    if isinstance(arr2, pa.ChunkedArray):
        arr2 = arr2.combine_chunks()
    if raw_markers:
        return pa.array([_classify_blocks(t) for t in arr2.to_pylist()],
                        pa.string())
    return _classify_blocks_array(arr2)


def extract_main_html_batch(texts: list[str]) -> list[str]:
    return [extract_main_html(t) for t in texts]
