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
_BOILERPLATE_RE = [
    re.compile(rf"(?is)<{t}\b[^>]*>.*?</{t}>") for t in _BOILERPLATE_TAGS
]
_PRE_RE = [re.compile(p, 0) for p, _ in _STRIP_STEPS[:4]]
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


def _extract_blocks(html: str) -> str:
    """Block classification for ONE pre-stripped document (comments/script/
    style/rt/boilerplate regions already removed): split into DOM blocks →
    drop empty / link-dense blocks → strip inline tags → decode entities →
    join blocks with newlines."""
    blocks = _BLOCK_SPLIT_RE.split(html)
    kept: list[str] = []
    for block in blocks:
        has_tag = "<" in block
        if has_tag and ("<a" in block or "<A" in block):
            anchor_chars = sum(
                len(_TAG_RE.sub("", m)) for m in _ANCHOR_RE.findall(block)
            )
        else:
            anchor_chars = 0
        text = _TAG_RE.sub(" ", block) if has_tag else block
        stripped = text.strip()
        if not stripped:
            continue
        if anchor_chars / max(1, len(stripped)) > MAX_LINK_DENSITY:
            continue
        kept.append(_decode_entities(stripped))
    return "\n".join(kept)


def extract_main_html(html: str) -> str:
    """Main-content extraction for ONE document.

    Steps: drop comments/script/style/rt → drop boilerplate-tagged regions →
    :func:`_extract_blocks`.  The batched hot path is
    :func:`extract_main_html_array`, which runs the 9 whole-document regex
    passes as RE2 Arrow kernels instead of per-row Python.
    """
    for rx in _PRE_RE:
        html = rx.sub(" ", html)
    for rx in _BOILERPLATE_RE:
        html = rx.sub(" ", html)
    return _extract_blocks(html)


# whole-document passes for the vectorized path, in extract_main_html order
_PRE_STEPS_RE2: list[str] = [p for p, _ in _STRIP_STEPS[:4]] + [
    rf"(?is)<{t}\b[^>]*>.*?</{t}>" for t in _BOILERPLATE_TAGS
]


def extract_main_html_array(arr: pa.Array | pa.ChunkedArray) -> pa.Array:
    """Batched main-content extraction: the 9 whole-document strip passes run
    vectorized (RE2 kernels over the whole array); only the per-block
    text/link-density classification stays per-row Python."""
    for pat in _PRE_STEPS_RE2:
        arr = pc.replace_substring_regex(arr, pattern=pat, replacement=" ")
    if isinstance(arr, pa.ChunkedArray):
        arr = arr.combine_chunks()
    return pa.array([_extract_blocks(t) for t in arr.to_pylist()], pa.string())


def extract_main_html_batch(texts: list[str]) -> list[str]:
    return [extract_main_html(t) for t in texts]
