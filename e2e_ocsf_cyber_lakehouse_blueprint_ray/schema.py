"""Arrow schemas for the engine's tables.

Transcript schema comes from BASELINE.json ``input_hint``:
(conv_id:string, turn_idx:int32, role:string, text:string, tool:string,
ts:timestamp). Medallion schemas mirror the reference's bronze/silver layout
(metadata columns FIRST, raw ``data`` column LAST —
/root/reference/transformations/pipelines/github/audit_logs/bronze_github_audit_logs.py:52-63,
silver_github_audit_logs.py:29-70).
"""

from __future__ import annotations

import pyarrow as pa

TRANSCRIPT = pa.schema(
    [
        ("conv_id", pa.string()),
        ("turn_idx", pa.int32()),
        ("role", pa.string()),
        ("text", pa.string()),
        ("tool", pa.string()),
        ("ts", pa.timestamp("us")),
    ]
)

#: MERGE source = transcript columns + op in {update, insert, delete}
#: (FIXTURES.md §2).
MERGE_SOURCE = TRANSCRIPT.append(pa.field("op", pa.string()))

#: columns whose min/max/null-count are tracked in the manifest (scan-prune
#: keys). Analog of Delta per-file column statistics.
TRANSCRIPT_STATS_COLS = ["conv_id", "turn_idx", "ts"]

#: bronze layer: 7 metadata columns first, raw variant last
#: (bronze_github_audit_logs.py:52-63).
BRONZE_META_COLS = [
    "_event_time",
    "_event_date",
    "_file_path",
    "_source",
    "_source_type",
    "_ingest_time",
    "_hostname",
]

BRONZE = pa.schema(
    [
        ("_event_time", pa.timestamp("us")),
        ("_event_date", pa.date32()),
        ("_file_path", pa.string()),
        ("_source", pa.string()),
        ("_source_type", pa.string()),
        ("_ingest_time", pa.timestamp("us")),
        ("_hostname", pa.string()),
        ("data", pa.string()),  # variant analog: raw JSON document
    ]
)


def sort_key(schema: pa.Schema) -> list[str]:
    """Default in-file sort key for a table (stable scan-order invariant)."""
    names = set(schema.names)
    if {"conv_id", "turn_idx"} <= names:
        return ["conv_id", "turn_idx"]
    if "_event_time" in names:
        return ["_event_time"]
    if "time" in names:
        return ["time"]
    return []
