"""PDF-layout flattening kernels (fully vectorized, SQL-mirrorable).

The "PDF" payloads are layout-flattened text as a PDF text extractor would
emit: form-feed page breaks, running page headers/footers, hard line wraps
and end-of-line hyphenation of long words.  Flattening inverts that layout,
deterministically (analog of the reference's line-breaking generator,
manga_ocr_dev/synthetic_data_generator/base_generator.py:157-196, run in
reverse):

1. drop form feeds,
2. drop ``Page N of M`` header lines and bare page-number footer lines,
3. dehyphenate across line breaks (``ta-\\nble`` → ``table``; only between
   ASCII letters so real hyphens survive),
4. unwrap remaining line breaks to spaces.

Every step is one RE2 pass over the Arrow array.
"""

from __future__ import annotations

import pyarrow as pa
import pyarrow.compute as pc

# (pattern, replacement) in order; RE2 syntax, \1 backrefs in replacement.
PDF_FLATTEN_STEPS: list[tuple[str, str]] = [
    (r"\f", "\n"),
    (r"(?m)^[ \t]*Page \d+(?: of \d+)?[ \t]*$", ""),
    (r"(?m)^[ \t]*\d+[ \t]*$", ""),
    # collapse the blank lines left by header/footer removal so end-of-line
    # hyphenation across page boundaries still dehyphenates
    (r"\n{2,}", "\n"),
    (r"([a-zA-Z])-\n([a-zA-Z])", r"\1\2"),
    (r"\n+", " "),
]


def flatten_pdf_array(arr: pa.Array | pa.ChunkedArray) -> pa.Array | pa.ChunkedArray:
    for pat, rep in PDF_FLATTEN_STEPS:
        arr = pc.replace_substring_regex(arr, pattern=pat, replacement=rep)
    return arr


def flatten_pdf_sql(expr: str) -> str:
    """DuckDB SQL expression computing flatten_pdf_array(expr) exactly.

    DuckDB single-quoted literals are not backslash-escaped, so regex
    patterns pass through verbatim; only single quotes need doubling.
    """
    out = expr
    for pat, rep in PDF_FLATTEN_STEPS:
        out = f"regexp_replace({out}, '{pat.replace(chr(39), chr(39)*2)}', '{rep}', 'g')"
    return out


def flatten_pdf(text: str) -> str:
    """Scalar reference implementation (tests / row oracle)."""
    import re

    for pat, rep in PDF_FLATTEN_STEPS:
        text = re.sub(pat, rep, text)
    return text
