"""RE2-compatible flat-JSON shape validation for vectorized fast paths.

A payload matching FLAT_JSON_RE is a VALID JSON object whose values are all
scalars (string/number/bool/null, no nested containers).  On such rows a
top-level key can be located with one regex: string values cannot fake a key
because their inner quotes are escaped, and there is no depth below 1.  Used
by the extractor's tool-payload fast path and the events_props parser; rows
failing the shape check fall back to per-row ``json.loads`` with identical
semantics (pinned by tests).
"""

from __future__ import annotations

JSON_STR = r'"(?:[^"\\]|\\.)*"'
JSON_SCALAR = rf'(?:{JSON_STR}|-?\d+(?:\.\d+)?(?:[eE][+-]?\d+)?|true|false|null)'
FLAT_JSON_RE = (
    rf'^\s*\{{\s*(?:{JSON_STR}\s*:\s*{JSON_SCALAR}'
    rf'(?:\s*,\s*{JSON_STR}\s*:\s*{JSON_SCALAR})*\s*)?\}}\s*$'
)
