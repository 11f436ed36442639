"""Half-width → full-width (hankaku → zenkaku) folding, vectorized.

Reimplements, from public Unicode knowledge, the exact semantics of
``jaconv.h2z(text, ascii=True, digit=True)`` (kana=True by default) as used
by the reference normalizer (see /root/reference/manga_ocr/ocr.py:155 and the
golden vectors in /root/reference/tests/test_ocr.py:56-66).  No jaconv code is
used; the mapping is the standard Unicode half-width/full-width forms block:

- ASCII printable ``U+0021..U+007E`` -> ``U+FF01..U+FF5E`` (uniform +0xFEE0
  shift; covers letters, digits and punctuation), and space ``U+0020`` ->
  ideographic space ``U+3000``.
- Half-width katakana ``U+FF61..U+FF9F`` -> full-width equivalents, with
  two-codepoint dakuten/handakuten sequences (e.g. ``ｶ`` + ``ﾞ``) merged into
  the single precomposed full-width character (``ガ``) first, as jaconv's
  kana mode does.

The batch entry point :func:`h2z_join_translate` performs ONE C-level
``str.translate`` call per batch (strings joined on ``\\x00``), not a Python
loop of per-row conversions.
"""

from __future__ import annotations

# --- single-codepoint table ------------------------------------------------

# ASCII (includes digits; jaconv's ascii=True+digit=True union) + space.
_H2Z: dict[int, int] = {cp: cp - 0x21 + 0xFF01 for cp in range(0x21, 0x7F)}
_H2Z[0x20] = 0x3000  # space -> ideographic space

# Half-width katakana singles U+FF61..U+FF9F, in codepoint order.
_HALF_KANA = (
    "｡｢｣､･ｦｧｨｩｪｫｬｭｮｯｰｱｲｳｴｵｶｷｸｹｺｻｼｽｾｿﾀﾁﾂﾃﾄﾅﾆﾇﾈﾉﾊﾋﾌﾍﾎﾏﾐﾑﾒﾓﾔﾕﾖﾗﾘﾙﾚﾛﾜﾝﾞﾟ"
)
_FULL_KANA = (
    "。「」、・ヲァィゥェォャュョッーアイウエオカキクケコサシスセソタチツテトナニヌネノ"
    "ハヒフヘホマミムメモヤユヨラリルレロワン゛゜"
)
assert len(_HALF_KANA) == len(_FULL_KANA) == 0xFF9F - 0xFF61 + 1
for _h, _f in zip(_HALF_KANA, _FULL_KANA):
    _H2Z[ord(_h)] = ord(_f)

# --- two-codepoint dakuten / handakuten merges (applied BEFORE translate) ---

_DAKUTEN_PAIRS: list[tuple[str, str]] = []
for _half_row, _full_row in (
    ("ｶｷｸｹｺ", "ガギグゲゴ"),
    ("ｻｼｽｾｿ", "ザジズゼゾ"),
    ("ﾀﾁﾂﾃﾄ", "ダヂヅデド"),
    ("ﾊﾋﾌﾍﾎ", "バビブベボ"),
):
    for _h, _f in zip(_half_row, _full_row):
        _DAKUTEN_PAIRS.append((_h + "ﾞ", _f))
for _h, _f in zip("ﾊﾋﾌﾍﾎ", "パピプペポ"):
    _DAKUTEN_PAIRS.append((_h + "ﾟ", _f))
_DAKUTEN_PAIRS.append(("ｳﾞ", "ヴ"))

_SEP = "\x00"


def h2z(text: str) -> str:
    """Scalar reference implementation (used by tests / the row oracle)."""
    for half, full in _DAKUTEN_PAIRS:
        if half in text:
            text = text.replace(half, full)
    return text.translate(_H2Z)


def h2z_join_translate(texts: list[str]) -> list[str]:
    """Batch conversion: one ``str.translate`` over the whole batch.

    ``\\x00`` is used as the row separator; it is not in any mapping so it is
    preserved.  Rows containing NUL (never produced by our corpus, and not
    representable in most text sources) fall back to per-row conversion.
    """
    if not texts:
        return []
    if any(_SEP in t for t in texts):
        return [h2z(t) for t in texts]
    big = _SEP.join(texts)
    for half, full in _DAKUTEN_PAIRS:
        if half in big:
            big = big.replace(half, full)
    return big.translate(_H2Z).split(_SEP)


# Exported for the DuckDB oracle: parallel from/to strings for translate(),
# and the dakuten replace() chain.
H2Z_FROM = "".join(chr(cp) for cp in sorted(_H2Z))
H2Z_TO = "".join(chr(_H2Z[cp]) for cp in sorted(_H2Z))
DAKUTEN_PAIRS = tuple(_DAKUTEN_PAIRS)
