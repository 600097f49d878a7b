"""Expression layer: the Spark-SQL scalar functions the reference uses,
re-expressed as vectorized pyarrow.compute kernels (SURVEY.md §2.3).

Every helper maps 1:1 to a construct in the reference's ``selectExpr``
strings — e.g. ``try_variant_get`` (silver_github_audit_logs.py:40-66),
``CASE WHEN ... LIKE`` chains (gold severity/activity derivations),
``named_struct``/``array``/``map`` literals (gold_github_audit_logs.py:38-96),
``from_unixtime``/``to_timestamp``/``to_date``
(bronze_*_audit_logs.py:20-21), ``CONCAT``/``COALESCE``. All operate on
whole Arrow arrays — never per-row Python in the hot path; the single
exception is JSON parsing, which is one ``json.loads`` per row inside a
batch (the same cost Spark's variant parser pays) feeding vectorized
projection of MANY fields from one parse.
"""

from __future__ import annotations

import json
import re
from datetime import datetime, timezone

import numpy as np
import pyarrow as pa
import pyarrow.compute as pc

# -- JSON / variant ---------------------------------------------------------

_TYPE_MAP = {
    "STRING": pa.string(),
    "BIGINT": pa.int64(),
    "INT": pa.int32(),
    "DOUBLE": pa.float64(),
    "BOOLEAN": pa.bool_(),
    "TIMESTAMP": pa.timestamp("us"),
}

_PATH_RE = re.compile(r"\.([A-Za-z_][A-Za-z0-9_]*)|\[(\d+)\]")


def parse_path(path: str) -> list:
    """'$.a.b[0].c' → ['a', 'b', 0, 'c'] (JSONPath subset the reference uses,
    incl. array indexing '$.attributes.container[0]'
    silver_atlassian_audit_logs.py:40-78)."""
    if not path.startswith("$"):
        raise ValueError(f"bad path {path!r}")
    steps: list = []
    for m in _PATH_RE.finditer(path[1:]):
        steps.append(m.group(1) if m.group(1) is not None else int(m.group(2)))
    return steps


def _walk(doc, steps):
    for s in steps:
        if doc is None:
            return None
        if isinstance(s, int):
            if not isinstance(doc, list) or s >= len(doc):
                return None
            doc = doc[s]
        else:
            if not isinstance(doc, dict):
                return None
            doc = doc.get(s)
    return doc


def _coerce(v, typ: str):
    """try_-semantics: null on missing OR type mismatch (never raises)."""
    if v is None:
        return None
    try:
        if typ == "STRING":
            if isinstance(v, (dict, list)):
                return json.dumps(v, separators=(",", ":"), sort_keys=True)
            if isinstance(v, bool):
                return "true" if v else "false"
            return str(v)
        if typ in ("BIGINT", "INT"):
            if isinstance(v, bool) or isinstance(v, (dict, list)):
                return None
            return int(v)
        if typ == "DOUBLE":
            if isinstance(v, bool) or isinstance(v, (dict, list)):
                return None
            return float(v)
        if typ == "BOOLEAN":
            return v if isinstance(v, bool) else None
    except (TypeError, ValueError):
        return None
    return None


class VariantExtractor:
    """Multi-field typed extraction from a raw-JSON column in ONE parse pass.

    Analog of N ``try_variant_get(data, '$.path', 'TYPE')`` expressions over
    the same variant column (silver_*_audit_logs.py:29-82): the document is
    parsed once per row; every requested (path, type) projects from that
    parse. Compile once (per actor / per pipeline build), call per batch.
    """

    def __init__(self, fields: list[tuple[str, str | None, str]]):
        """fields: [(out_name, '$.json.path', 'TYPE'), ...]; path None ⇒
        typed NULL column (``CAST(NULL AS T)`` select-list entries, e.g.
        silver_atlassian_audit_logs.py:78 container_type)."""
        self.fields = [(n, parse_path(p) if p is not None else None, t) for n, p, t in fields]

    def __call__(self, data: pa.Array | pa.ChunkedArray) -> dict[str, pa.Array]:
        docs = []
        for s in data.to_pylist():
            if s is None:
                docs.append(None)
                continue
            try:
                docs.append(json.loads(s))
            except (ValueError, TypeError):
                docs.append(None)
        out = {}
        for name, steps, typ in self.fields:
            if steps is None:
                out[name] = pa.nulls(len(docs), _TYPE_MAP[typ])
                continue
            vals = [_coerce(_walk(d, steps), typ) for d in docs]
            out[name] = pa.array(vals, type=_TYPE_MAP[typ])
        return out


def try_variant_get(data: pa.Array, path: str, typ: str) -> pa.Array:
    """Single-field form (prefer VariantExtractor for many fields)."""
    return VariantExtractor([("v", path, typ)])(data)["v"]


# -- casts / temporal -------------------------------------------------------

def from_unixtime_ms(arr: pa.Array) -> pa.Array:
    """epoch-milliseconds → timestamp[us] (bronze_github_audit_logs.py:20)."""
    return pc.multiply(pc.cast(arr, pa.int64()), 1000).cast(pa.timestamp("us"))


def from_unixtime_s(arr: pa.Array) -> pa.Array:
    """epoch-seconds → timestamp[us] (bronze_slack_audit_logs.py:20)."""
    return pc.multiply(pc.cast(arr, pa.int64()), 1_000_000).cast(pa.timestamp("us"))


def to_timestamp_iso(arr: pa.Array) -> pa.Array:
    """ISO-8601 strings → timestamp[us] normalized to UTC, null on parse
    failure (Spark ``to_timestamp`` semantics, bronze_atlassian_audit_logs.py:20).

    Offset-bearing strings (``+05:30``, ``Z``) are CONVERTED to UTC via a
    ``%z``-aware parse — not stripped — and fractional seconds are kept
    (re-added as integer microseconds, since ``%z`` + ``%f`` can't combine in
    one strptime format). Offset-less strings are treated as UTC.
    """
    arr = arr.combine_chunks() if isinstance(arr, pa.ChunkedArray) else arr
    # capture fractional seconds (pad/truncate to 6 digits = microseconds)
    frac = pc.extract_regex(arr, r"\.(?P<f>\d+)")
    frac_str = pc.struct_field(frac, "f")
    frac_us = pc.cast(
        pc.utf8_slice_codeunits(
            pc.binary_join_element_wise(pc.fill_null(frac_str, "0"), "000000", ""), 0, 6
        ),
        pa.int64(),
    )
    # normalize: drop fraction, 'Z'→'+0000', '+05:30'→'+0530', none→'+0000'
    base = pc.replace_substring_regex(arr, r"\.\d+", "")
    base = pc.replace_substring_regex(base, r"Z$", "+0000")
    base = pc.replace_substring_regex(base, r"([+-]\d\d):(\d\d)$", r"\1\2")
    has_off = pc.match_substring_regex(base, r"[+-]\d{4}$")
    base = pc.if_else(
        pc.fill_null(has_off, False),
        base,
        pc.binary_join_element_wise(pc.fill_null(base, ""), "+0000", ""),
    )
    ts = pc.strptime(base, format="%Y-%m-%dT%H:%M:%S%z", unit="us", error_is_null=True)
    ts = pc.cast(ts, pa.timestamp("us"))  # tz=UTC → naive UTC instant
    return pc.cast(pc.add(pc.cast(ts, pa.int64()), frac_us), pa.timestamp("us"))


def to_date(ts: pa.Array) -> pa.Array:
    """timestamp → date32 (bronze_github_audit_logs.py:21 ``to_date``)."""
    return pc.cast(ts, pa.date32())


def current_timestamp(n: int) -> pa.Array:
    """``current_timestamp()`` analog (bronze_github_audit_logs.py:24);
    one wall-clock read per batch, broadcast."""
    now = datetime.now(timezone.utc).replace(tzinfo=None)
    return pa.array([now] * n, pa.timestamp("us"))


def lit(value, n: int, typ: pa.DataType | None = None) -> pa.Array:
    if typ is not None:
        return pa.array([value] * n, typ)
    return pa.array([value] * n)


def nulls(n: int, typ: pa.DataType) -> pa.Array:
    """``CAST(NULL AS T)`` (gold_github_audit_logs.py:87,94)."""
    return pa.nulls(n, typ)


# -- conditionals / string ops ---------------------------------------------

def like_to_regex(pattern: str) -> str:
    """SQL LIKE pattern → anchored regex (``%``→``.*``, ``_``→``.``)."""
    out = []
    for ch in pattern:
        if ch == "%":
            out.append(".*")
        elif ch == "_":
            out.append(".")
        else:
            out.append(re.escape(ch))
    return "^" + "".join(out) + "$"


def sql_like(arr: pa.Array, pattern: str) -> pa.Array:
    return pc.match_substring_regex(arr, like_to_regex(pattern))


def rlike(arr: pa.Array, pattern: str) -> pa.Array:
    """``RLIKE`` = unanchored regex match (gold M3 action filters)."""
    return pc.match_substring_regex(arr, pattern)


def case_when(pairs: list[tuple[pa.Array, object]], default, out_type: pa.DataType) -> pa.Array:
    """``CASE WHEN c1 THEN v1 WHEN c2 THEN v2 ... ELSE d END`` — vectorized.

    Conditions are boolean arrays; values are scalars or arrays. Mirrors the
    severity/activity derivations (gold_github_audit_logs.py:55-69).
    """
    n = len(pairs[0][0])
    result = pa.nulls(n, out_type)
    if default is not None:
        default_arr = default if isinstance(default, (pa.Array, pa.ChunkedArray)) else lit(default, n, out_type)
        result = default_arr
    done = pa.array(np.zeros(n, dtype=bool))
    for cond, val in pairs:
        cond = pc.fill_null(cond, False)
        use = pc.and_not(cond, done)
        val_arr = val if isinstance(val, (pa.Array, pa.ChunkedArray)) else lit(val, n, out_type)
        result = pc.if_else(use, val_arr, result)
        done = pc.or_(done, use)
    return pc.cast(result, out_type)


def coalesce(*arrays) -> pa.Array:
    return pc.coalesce(*arrays)


def concat(*parts) -> pa.Array:
    """``CONCAT(...)`` — null if any part null (SQL semantics)."""
    n = max(len(p) for p in parts if isinstance(p, (pa.Array, pa.ChunkedArray)))
    arrs = [p if isinstance(p, (pa.Array, pa.ChunkedArray)) else lit(p, n, pa.string()) for p in parts]
    return pc.binary_join_element_wise(*arrs, "", null_handling="emit_null")


def concat_ws(sep: str, *parts) -> pa.Array:
    n = max(len(p) for p in parts if isinstance(p, (pa.Array, pa.ChunkedArray)))
    arrs = [p if isinstance(p, (pa.Array, pa.ChunkedArray)) else lit(p, n, pa.string()) for p in parts]
    return pc.binary_join_element_wise(*arrs, sep, null_handling="skip")


def split_index(arr: pa.Array, sep: str, i: int) -> pa.Array:
    """``split(s, sep)[i]`` (gold_atlassian_audit_logs.py:167)."""
    return pc.list_element(pc.split_pattern(arr, sep), i)


# -- nested builders --------------------------------------------------------

def named_struct(fields: dict[str, pa.Array], mask: pa.Array | None = None) -> pa.StructArray:
    """``named_struct(...)`` (gold_github_audit_logs.py:38-50); optional
    validity mask for ``CASE WHEN x IS NOT NULL THEN named_struct(...) END``
    (gold_github_audit_logs.py:218)."""
    names = list(fields)
    arrays = [fields[k] if isinstance(fields[k], pa.Array) else fields[k].combine_chunks() for k in names]
    if mask is not None:
        mask = pc.fill_null(mask, False)
        null_mask = pc.invert(mask).to_numpy(zero_copy_only=False)
        return pa.StructArray.from_arrays(arrays, names, mask=pa.array(null_mask))
    return pa.StructArray.from_arrays(arrays, names)


def struct_array_literal(structs: list[pa.StructArray]) -> pa.ListArray:
    """``array(named_struct(...), named_struct(...), ...)`` — a fixed-length
    list of per-row structs (gold_github_audit_logs.py:89-96)."""
    n = len(structs[0])
    k = len(structs)
    # interleave row-wise: out[i] = [s0[i], s1[i], ...]; element j of row i
    # sits at position j*n + i of the concatenated struct arrays.
    idx = np.arange(n * k)
    concat_structs = pa.concat_arrays([s for s in structs])
    take_positions = pa.array((idx % k) * n + idx // k)
    flat = concat_structs.take(take_positions)
    offsets = pa.array(np.arange(0, (n + 1) * k, k, dtype=np.int32))
    return pa.ListArray.from_arrays(offsets, flat)


def string_array_literal(values: list[str], n: int) -> pa.ListArray:
    """``array('cloud','datetime')`` broadcast to n rows
    (gold_github_audit_logs.py:41)."""
    flat = pa.array(values * n, pa.string())
    k = len(values)
    offsets = pa.array(np.arange(0, (n + 1) * k, k, dtype=np.int32))
    return pa.ListArray.from_arrays(offsets, flat)


def single_item_list(arr: pa.Array, mask: pa.Array | None = None) -> pa.ListArray:
    """``array(x)`` per row — optionally ``CASE WHEN m THEN array(x) ELSE
    CAST(NULL AS ARRAY<T>) END`` via ``mask`` (gold_github_audit_logs.py:217
    privileges)."""
    arr = arr.combine_chunks() if isinstance(arr, pa.ChunkedArray) else arr
    n = len(arr)
    if mask is not None:
        # null rows must have ZERO-length spans (Parquet rejects lists with
        # non-zero-length null components)
        m = pc.fill_null(mask, False).to_numpy(zero_copy_only=False)
        offsets = pa.array(np.r_[0, np.cumsum(m.astype(np.int32))].astype(np.int32))
        return pa.ListArray.from_arrays(offsets, arr.filter(pa.array(m)), mask=pa.array(~m))
    return pa.ListArray.from_arrays(pa.array(np.arange(n + 1, dtype=np.int32)), arr)


def pair_list(a: pa.Array, b: pa.Array, mask: pa.Array | None = None) -> pa.ListArray:
    """``array(x, y)`` per row with optional row validity — the coordinates
    builder (gold_atlassian_audit_logs.py:167)."""
    a = a.combine_chunks() if isinstance(a, pa.ChunkedArray) else a
    b = b.combine_chunks() if isinstance(b, pa.ChunkedArray) else b
    n = len(a)
    idx = np.arange(2 * n)
    flat = pa.concat_arrays([a, b]).take(pa.array((idx % 2) * n + idx // 2))
    if mask is not None:
        # zero-length spans for null rows (Parquet-writable layout)
        m = pc.fill_null(mask, False).to_numpy(zero_copy_only=False)
        offsets = pa.array(np.r_[0, np.cumsum(2 * m.astype(np.int32))].astype(np.int32))
        keep = pa.array(np.repeat(m, 2))
        return pa.ListArray.from_arrays(offsets, flat.filter(keep), mask=pa.array(~m))
    return pa.ListArray.from_arrays(pa.array(np.arange(0, 2 * (n + 1), 2, dtype=np.int32)), flat)


def null_map(n: int) -> pa.Array:
    """``CAST(NULL AS MAP<STRING, STRING>)`` (gold_github_audit_logs.py:94)."""
    return pa.nulls(n, pa.map_(pa.string(), pa.string()))


def map_literal(kv: dict[str, pa.Array | str], n: int) -> pa.MapArray:
    """``map('k1', v1, 'k2', v2)`` (gold_github_audit_logs.py:215)."""
    keys = list(kv)
    k = len(keys)
    key_flat = pa.array(keys * n, pa.string())
    val_cols = []
    for key in keys:
        v = kv[key]
        val_cols.append(v if isinstance(v, (pa.Array, pa.ChunkedArray)) else lit(v, n, pa.string()))
    # interleave values row-wise
    vals = pa.concat_arrays([c.combine_chunks() if isinstance(c, pa.ChunkedArray) else c for c in val_cols])
    idx = np.arange(n * k)
    take_positions = pa.array((idx % k) * n + idx // k)
    val_flat = vals.take(take_positions)
    offsets = pa.array(np.arange(0, (n + 1) * k, k, dtype=np.int32))
    return pa.MapArray.from_arrays(offsets, key_flat, val_flat)
