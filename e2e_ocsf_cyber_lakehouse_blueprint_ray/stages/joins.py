"""Temporal joins the Dataset API lacks: as-of join and interval join.

Two execution shapes, matching the engine's join strategy (see
pipelines/queries.py module docstring):

* **Broadcast** (`asof_join`, `interval_probe`): the right side is
  dimension-like. A composite-rank index (dense key code × global ts rank)
  is built once driver-side and `ray.put` once; every probe batch then
  resolves matches with four `np.searchsorted` calls — no per-row or
  per-key Python loop, no shuffle of the fact table. Safe while
  ``n_right_keys * (n_right_unique_ts + 2) < 2**63`` (any realistic
  broadcast side; a right table that big should use the partitioned path).
* **Partitioned** (`asof_join_partitioned`): both sides are large. The two
  datasets are union'd with a side tag and co-grouped by key
  (`groupby(key).map_groups`), so each group holds one key's rows from
  both sides; the per-group kernel is a sort + `searchsorted`. Partitioning
  assumption: one key's rows (both sides) fit in a worker — as-of
  semantics need the whole right history of a key in one place, so hot
  keys cannot be salted. Use the broadcast path when the right side is
  small instead.

Reference parity note: the reference blueprint has no joins at all
(SURVEY.md §2.7) — these are part of the training-data operator set the
brief adds (event sequence stitching / feature windows over transcript
tables).
"""

from __future__ import annotations

from dataclasses import dataclass

import numpy as np
import pyarrow as pa
import pyarrow.compute as pc


def _ts_i64(arr: pa.ChunkedArray | pa.Array) -> np.ndarray:
    """timestamp[us] (or int) column -> int64 numpy view."""
    a = arr.combine_chunks() if isinstance(arr, pa.ChunkedArray) else arr
    if pa.types.is_timestamp(a.type):
        a = a.cast(pa.int64())
    return a.to_numpy(zero_copy_only=False).astype(np.int64)


@dataclass
class _CompositeIndex:
    """Right side sorted by (key, ts) + the composite-rank arrays."""

    uk: np.ndarray  # sorted unique keys
    uts: np.ndarray  # sorted unique ts (int64 us)
    comp: np.ndarray  # kcode * M + ts_rank, ascending
    m: int
    rk: np.ndarray  # sorted right keys (for validity checks)
    rts: np.ndarray  # sorted right ts
    payload: dict[str, np.ndarray]  # right value columns, in sorted order


def build_index(right: pa.Table, key: str, ts: str, payload: list[str]) -> _CompositeIndex:
    rk = right[key].combine_chunks().to_numpy(zero_copy_only=False).astype(np.int64)
    rts = _ts_i64(right[ts])
    order = np.lexsort((rts, rk))
    rk, rts = rk[order], rts[order]
    uk = np.unique(rk)
    uts = np.unique(rts)
    m = len(uts) + 2
    if len(uk) and len(uk) * m >= 2**62:  # pragma: no cover - size guard
        raise ValueError("right side too large for the broadcast composite index; "
                         "use asof_join_partitioned")
    kcode = np.searchsorted(uk, rk)
    comp = kcode * m + np.searchsorted(uts, rts)
    vals = {c: right[c].combine_chunks().to_numpy(zero_copy_only=False)[order] for c in payload}
    return _CompositeIndex(uk=uk, uts=uts, comp=comp, m=m, rk=rk, rts=rts, payload=vals)


def _probe_keys(ix: _CompositeIndex, lk: np.ndarray) -> tuple[np.ndarray, np.ndarray]:
    kcode = np.searchsorted(ix.uk, lk)
    kc = np.clip(kcode, 0, max(len(ix.uk) - 1, 0))
    found = (ix.uk[kc] == lk) if len(ix.uk) else np.zeros(len(lk), bool)
    return kc, found


def asof_probe(ix: _CompositeIndex, lk: np.ndarray, lt: np.ndarray, *,
               direction: str = "backward", tolerance_us: int | None = None,
               strict: bool = False) -> tuple[np.ndarray, np.ndarray]:
    """Vectorized as-of lookup. Returns (match_mask, right_row_index).

    backward: latest right row with rts <= lt (rts < lt if strict);
    forward:  earliest right row with rts >= lt (rts > lt if strict).
    Ties on (key, ts) resolve to the right row latest in the index's
    stable (key, ts) sort — dedupe the right side per (key, ts) first for
    engine-independent results.
    """
    if len(ix.comp) == 0:
        z = np.zeros(len(lk), dtype=np.int64)
        return np.zeros(len(lk), dtype=bool), z
    kc, found = _probe_keys(ix, lk)
    if direction == "backward":
        side = "left" if strict else "right"
        rank = np.searchsorted(ix.uts, lt, side=side)
        pos = np.searchsorted(ix.comp, kc * ix.m + rank, side="left") - 1
        pc_ = np.clip(pos, 0, max(len(ix.comp) - 1, 0))
        ok = found & (pos >= 0) & (len(ix.comp) > 0)
        ok &= (ix.rk[pc_] == lk) & ((ix.rts[pc_] < lt) if strict else (ix.rts[pc_] <= lt))
        if tolerance_us is not None:
            ok &= (lt - ix.rts[pc_]) <= tolerance_us
    elif direction == "forward":
        side = "right" if strict else "left"
        rank = np.searchsorted(ix.uts, lt, side=side)
        pos = np.searchsorted(ix.comp, kc * ix.m + rank, side="left")
        pc_ = np.clip(pos, 0, max(len(ix.comp) - 1, 0))
        ok = found & (pos < len(ix.comp)) & (len(ix.comp) > 0)
        ok &= (ix.rk[pc_] == lk) & ((ix.rts[pc_] > lt) if strict else (ix.rts[pc_] >= lt))
        if tolerance_us is not None:
            ok &= (ix.rts[pc_] - lt) <= tolerance_us
    else:
        raise ValueError(f"direction must be backward|forward, got {direction!r}")
    return ok, pc_


def interval_probe(ix: _CompositeIndex, lk: np.ndarray, lt: np.ndarray, *,
                   before_us: int, after_us: int) -> tuple[np.ndarray, np.ndarray]:
    """Vectorized range lookup: per left row, the [lo, hi) slice of right
    rows with the same key and rts in [lt - before_us, lt + after_us]."""
    kc, found = _probe_keys(ix, lk)
    lo_rank = np.searchsorted(ix.uts, lt - before_us, side="left")
    hi_rank = np.searchsorted(ix.uts, lt + after_us, side="right")
    lo = np.searchsorted(ix.comp, kc * ix.m + lo_rank, side="left")
    hi = np.searchsorted(ix.comp, kc * ix.m + hi_rank, side="left")
    lo[~found] = 0
    hi[~found] = 0
    return lo, np.maximum(hi, lo)


def expand_pairs(lo: np.ndarray, hi: np.ndarray) -> tuple[np.ndarray, np.ndarray]:
    """Ragged [lo, hi) slices -> (left_row_idx, right_row_idx) pair arrays."""
    counts = hi - lo
    total = int(counts.sum())
    left_idx = np.repeat(np.arange(len(lo)), counts)
    starts = np.cumsum(counts) - counts
    offs = np.arange(total, dtype=np.int64) - np.repeat(starts, counts)
    return left_idx, np.repeat(lo, counts) + offs


def segment_sums(lo: np.ndarray, hi: np.ndarray, values: np.ndarray) -> np.ndarray:
    """Sum of ``values[lo_i:hi_i]`` per row without materializing pairs
    (prefix-sum difference; exact for int64 values)."""
    presum = np.concatenate(([0], np.cumsum(values.astype(np.int64))))
    return presum[hi] - presum[lo]


def _payload_array(vals: np.ndarray, idx: np.ndarray, ok: np.ndarray,
                   typ: pa.DataType) -> pa.Array:
    if len(vals) == 0:
        return pa.nulls(len(idx), typ)
    out = vals[idx]
    return pa.array(out, type=typ, mask=~ok) if ok is not None else pa.array(out, type=typ)


def asof_join(left_ds, right: pa.Table, *, key: str, ts: str,
              right_key: str | None = None, right_ts: str | None = None,
              payload: list[str] | None = None, direction: str = "backward",
              tolerance_us: int | None = None, strict: bool = False,
              out_types: dict[str, pa.DataType] | None = None):
    """Broadcast as-of join: left Dataset × small right pa.Table.

    Appends each payload column to every left row (null when no match).
    The index ships through the object store once (`ray.put`); probe
    batches run zero-copy Arrow with searchsorted-only lookups.
    """
    import ray

    rkey, rts_col = right_key or key, right_ts or ts
    payload = payload or [c for c in right.column_names if c not in (rkey, rts_col)]
    types = {c: (out_types or {}).get(c, right.schema.field(c).type) for c in payload}
    ref = ray.put(build_index(right, rkey, rts_col, payload))

    def probe(b: pa.Table) -> pa.Table:
        ix = ray.get(ref)
        lk = b[key].combine_chunks().to_numpy(zero_copy_only=False).astype(np.int64)
        lt = _ts_i64(b[ts])
        ok, idx = asof_probe(ix, lk, lt, direction=direction,
                             tolerance_us=tolerance_us, strict=strict)
        for c in payload:
            b = b.append_column(c, _payload_array(ix.payload[c], idx, ok, types[c]))
        return b

    return left_ds.map_batches(probe, batch_format="pyarrow")


def interval_join_agg(left_ds, right: pa.Table, *, key: str, ts: str,
                      right_key: str | None = None, right_ts: str | None = None,
                      before_us: int, after_us: int = 0,
                      sum_cols: tuple[str, ...] = (), count_col: str = "n_win",
                      keep_cols: list[str] | None = None):
    """Broadcast interval join, pre-aggregated: per left row, the count and
    exact int64 sums of right rows with the same key and ts in
    ``[ts - before_us, ts + after_us]``. Sums use the prefix-sum trick
    (`segment_sums`) so no pair expansion ever materializes — the pair
    count can be quadratic, the work here stays O(batch · log right).
    ``sum_cols`` must be int64 right columns (round to cents first)."""
    import ray

    rkey, rcol = right_key or key, right_ts or ts
    ref = ray.put(build_index(right, rkey, rcol, list(sum_cols)))

    def probe(b: pa.Table) -> pa.Table:
        ix = ray.get(ref)
        lk = b[key].combine_chunks().to_numpy(zero_copy_only=False).astype(np.int64)
        lt = _ts_i64(b[ts])
        lo, hi = interval_probe(ix, lk, lt, before_us=before_us, after_us=after_us)
        if keep_cols is not None:
            b = b.select(keep_cols)
        b = b.append_column(count_col, pa.array((hi - lo).astype(np.int64)))
        for c in sum_cols:
            b = b.append_column(f"sum_{c}", pa.array(segment_sums(lo, hi, ix.payload[c])))
        return b

    return left_ds.map_batches(probe, batch_format="pyarrow")


def hash_join(left_ds, right_ds, *, on, how: str = "inner",
              num_buckets: int = 64, right_suffix: str = "_r"):
    """Generic distributed hash join for two LARGE Datasets (when neither
    side fits a broadcast — the broadcast lookup in pipelines/queries.py is
    the right tool otherwise).

    Shape: both sides are tagged, padded to a shared schema, and
    co-partitioned by ``hash(key) % num_buckets`` — ONE shuffle keyed by a
    small int. Each bucket group then runs a vectorized in-worker Arrow
    (Acero) ``Table.join`` between its two sides. Bucketing (instead of
    grouping by the raw key) bounds the group count at ``num_buckets`` —
    no per-key Python call — and spreads keys uniformly; size it so
    |input| / num_buckets fits a worker. A single hot KEY still lands in
    one bucket (join semantics require it); a hot-key × hot-key join is
    inherently quadratic in output and should be pre-aggregated instead.

    ``how``: "inner", "left outer", "full outer" (bucket-local correct
    because both sides of a key co-locate). Right columns whose names
    collide with left ones are renamed with ``right_suffix``. Null join
    keys never match (SQL semantics).
    """
    on = [on] if isinstance(on, str) else list(on)
    if how not in ("inner", "left outer", "full outer"):
        raise ValueError(f"unsupported join type {how!r}")

    def _arrow_schema(ds) -> pa.Schema:
        s = ds.schema()
        return s.base_schema if hasattr(s, "base_schema") else s

    lsch, rsch = _arrow_schema(left_ds), _arrow_schema(right_ds)
    left_cols = list(lsch.names)
    ren = {c: (f"{c}{right_suffix}" if c in left_cols and c not in on else c)
           for c in rsch.names}
    right_value_cols = [ren[c] for c in rsch.names if c not in on]
    out_cols = left_cols + right_value_cols
    union_fields = (
        [(c, lsch.field(c).type) for c in left_cols]
        + [(ren[c], rsch.field(c).type) for c in rsch.names if c not in on]
    )
    union_names = [n for n, _ in union_fields]
    union_types = dict(union_fields)

    def _bucket(b: pa.Table) -> pa.Array:
        import polars as pl

        h = np.zeros(b.num_rows, dtype=np.uint64)
        for i, c in enumerate(on):
            hc = pl.from_arrow(b[c].combine_chunks()).hash(seed=i).to_numpy()
            h ^= hc.astype(np.uint64) * np.uint64(0x9E3779B97F4A7C15)
        return pa.array((h % num_buckets).astype(np.int32))

    def tag(side: int, names_in: list[str], rename: dict | None):
        def fn(b: pa.Table) -> pa.Table:
            cols = {}
            for c in names_in:
                cols[rename[c] if rename else c] = b[c]
            out = {n: cols.get(n, pa.nulls(b.num_rows, union_types[n]))
                   for n in union_names}
            out["_side"] = pa.array(np.full(b.num_rows, side, np.int8))
            out["_b"] = _bucket(b)
            return pa.table(out)

        return fn

    u = left_ds.map_batches(tag(1, left_cols, None), batch_format="pyarrow").union(
        right_ds.map_batches(tag(0, list(rsch.names), ren), batch_format="pyarrow")
    )

    right_keys = on + right_value_cols

    def join_bucket(g: pa.Table) -> pa.Table:
        side = g["_side"].combine_chunks().to_numpy(zero_copy_only=False)
        lt = g.filter(pa.array(side == 1)).select(left_cols)
        rt = g.filter(pa.array(side == 0)).select(right_keys)
        joined = lt.join(rt, keys=on, join_type=how)
        return joined.select(out_cols).combine_chunks()

    return u.groupby("_b").map_groups(join_bucket, batch_format="pyarrow")


def semi_join(left_ds, keys, *, on: str, anti: bool = False):
    """Broadcast semi/anti join — the blocklist/allowlist curation filter
    (keep documents whose id IS / IS NOT in a key set).

    The key side is deduped + null-stripped driver-side and ``ray.put``
    ONCE; every task then filters its batch with one vectorized
    ``pc.is_in`` — no shuffle, fully streaming, zero-copy left side. Use
    this whenever the key side fits a broadcast (a blocklist of even 10^8
    64-bit ids is <1 GB); a genuinely large key side should go through
    ``hash_join(how="inner")`` + project instead.

    Null-key semantics match SQL EXISTS / NOT EXISTS: semi drops null-key
    rows (no match possible), anti KEEPS them.

    ``keys``: pa.Table (column ``on``), pa.Array/ChunkedArray, or a Ray
    Dataset (materialized driver-side — key sets are small by contract).
    """
    import ray

    if hasattr(keys, "take_all") and not isinstance(keys, (pa.Table, pa.Array, pa.ChunkedArray)):
        import pyarrow as _pa

        rows = keys.take_all()
        keys = _pa.array([r[on] for r in rows])
    if isinstance(keys, pa.Table):
        keys = keys[on]
    if isinstance(keys, pa.ChunkedArray):
        keys = keys.combine_chunks()
    keys = pc.unique(keys.drop_null())
    key_ref = ray.put(keys)
    is_anti = anti

    def fn(b: pa.Table) -> pa.Table:
        vs = ray.get(key_ref)
        isin = pc.fill_null(pc.is_in(b[on], value_set=vs), False)
        return b.filter(pc.invert(isin) if is_anti else isin)

    return left_ds.map_batches(fn, batch_format="pyarrow")


def anti_join(left_ds, keys, *, on: str):
    """NOT EXISTS filter: left rows whose ``on`` key is absent from the
    broadcast key set (null-key rows kept, SQL semantics)."""
    return semi_join(left_ds, keys, on=on, anti=True)


def asof_join_partitioned(left_ds, right_ds, *, key: str, ts: str,
                          payload: list[str], direction: str = "backward",
                          tolerance_us: int | None = None, strict: bool = False):
    """Shuffle as-of join for a large right side: tag + union + co-group by
    key, per-group sort + searchsorted. One key's rows must fit in a
    worker (see module docstring); output schema = left columns + payload.
    """
    def _arrow_schema(ds) -> pa.Schema:
        s = ds.schema()
        return s.base_schema if hasattr(s, "base_schema") else s

    left_schema = _arrow_schema(left_ds)
    right_schema = _arrow_schema(right_ds)
    left_cols = list(left_schema.names)
    left_types = {c: left_schema.field(c).type for c in left_cols}
    right_schema_types = {c: right_schema.field(c).type for c in payload}

    def tag_left(b: pa.Table) -> pa.Table:
        b = b.append_column("_side", pa.array(np.ones(len(b), np.int8)))
        for c in payload:
            b = b.append_column(c, pa.nulls(len(b), right_schema_types[c]))
        return b

    def tag_right(b: pa.Table) -> pa.Table:
        out = {key: b[key], ts: b[ts], "_side": pa.array(np.zeros(len(b), np.int8))}
        for c in left_cols:
            if c not in (key, ts):
                out[c] = pa.nulls(len(b), left_types[c])
        for c in payload:
            out[c] = b[c]
        return pa.table(out)

    cols = left_cols + ["_side"] + [c for c in payload if c not in left_cols]

    def reorder(b: pa.Table) -> pa.Table:
        return b.select(cols)

    u = left_ds.map_batches(tag_left, batch_format="pyarrow").map_batches(reorder, batch_format="pyarrow") \
        .union(right_ds.map_batches(tag_right, batch_format="pyarrow").map_batches(reorder, batch_format="pyarrow"))

    def group_fn(g: pa.Table) -> pa.Table:
        side = g["_side"].combine_chunks().to_numpy(zero_copy_only=False)
        lmask = side == 1
        left = g.filter(pa.array(lmask))
        right = g.filter(pa.array(~lmask))
        left = left.drop_columns(["_side"] + payload)
        if len(right) == 0:
            for c in payload:
                left = left.append_column(c, pa.nulls(len(left), right_schema_types[c]))
            return left
        rts = _ts_i64(right[ts])
        order = np.argsort(rts, kind="stable")
        rts = rts[order]
        lt = _ts_i64(left[ts])
        if direction == "backward":
            pos = np.searchsorted(rts, lt, side="left" if strict else "right") - 1
            pc_ = np.clip(pos, 0, len(rts) - 1)
            ok = (pos >= 0) & ((rts[pc_] < lt) if strict else (rts[pc_] <= lt))
            if tolerance_us is not None:
                ok &= (lt - rts[pc_]) <= tolerance_us
        else:
            pos = np.searchsorted(rts, lt, side="right" if strict else "left")
            pc_ = np.clip(pos, 0, len(rts) - 1)
            ok = (pos < len(rts)) & ((rts[pc_] > lt) if strict else (rts[pc_] >= lt))
            if tolerance_us is not None:
                ok &= (rts[pc_] - lt) <= tolerance_us
        for c in payload:
            vals = right[c].combine_chunks().to_numpy(zero_copy_only=False)[order]
            left = left.append_column(c, _payload_array(vals, pc_, ok, right_schema_types[c]))
        return left

    return u.groupby(key).map_groups(group_fn, batch_format="pyarrow")
