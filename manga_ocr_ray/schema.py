"""Declared Arrow schemas for the engine's tables.

The reference keeps every schema implicit in pandas/CSV conventions (SURVEY.md
§1.1); here each table's schema is an explicit ``pyarrow.Schema`` asserted at
stage boundaries.  The transcripts shape is the authoritative ``input_hint``
from BASELINE.json.
"""

from __future__ import annotations

import pyarrow as pa

TRANSCRIPTS_SCHEMA = pa.schema(
    [
        ("conv_id", pa.string()),
        ("turn_idx", pa.int32()),
        ("role", pa.string()),
        ("text", pa.string()),
        ("tool", pa.string()),
        ("ts", pa.timestamp("us")),
    ]
)

EXPECTED_TURNS_SCHEMA = pa.schema(
    [
        ("conv_id", pa.string()),
        ("turn_idx", pa.int32()),
        ("expected_text", pa.string()),
    ]
)

EXTRACTED_SCHEMA = pa.schema(
    [
        ("conv_id", pa.string()),
        ("turn_idx", pa.int32()),
        ("role", pa.string()),
        ("tool", pa.string()),
        ("ts", pa.timestamp("us")),
        ("extracted_text", pa.string()),
        ("raw_chars", pa.int64()),
        ("extracted_chars", pa.int64()),
        ("bucket", pa.int32()),
    ]
)


def assert_schema_contains(actual: pa.Schema, expected: pa.Schema, where: str = "") -> None:
    """Stage-boundary check: every expected field present with matching type."""
    for field in expected:
        got = actual.field(field.name) if field.name in actual.names else None
        if got is None or got.type != field.type:
            raise TypeError(
                f"schema mismatch{' at ' + where if where else ''}: "
                f"want {field.name}:{field.type}, got {got.type if got else 'missing'}"
            )
