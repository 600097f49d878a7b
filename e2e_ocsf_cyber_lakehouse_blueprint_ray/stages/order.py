"""Distributed ordering primitives: bucketed global offsets → deterministic
shuffle rank and sequence packing.

Training-data prep needs GLOBAL positions (a reproducible shuffle order, the
token offset where each document lands in a packed sequence stream) — i.e. a
distributed prefix sum. Ray Data has no scan/prefix operator, so both ops
here use the same two-pass shape that holds at 100 TB:

1. every row gets an integer ``_bucket`` whose ascending order is a PREFIX
   of the target global order (md5-key high byte for shuffle; doc_id range
   for packing);
2. pass 1: ``groupby(_bucket)`` count/sum — the shuffle moves ONE row per
   bucket (bucket-cardinality, not corpus-cardinality); the driver turns
   that into exclusive per-bucket offsets (a dict of a few thousand ints);
3. pass 2: ``groupby(_bucket).map_groups`` — each bucket sorts its own rows
   and adds ``bucket_offset + local_prefix``.

Bucket cardinality is the scale knob: buckets must (a) be many × cluster
cores for parallelism and (b) each fit in a task (≈ corpus/buckets rows).
2⁸ md5 buckets / 64-doc ranges suit the test fixtures; a 10¹²-row corpus
uses 2–3 key bytes / larger ranges — same code, different constant.

No reference analog (the reference has no ordering ops); this is graft
machinery for the LLM-data pipeline axis.
"""

from __future__ import annotations

import hashlib

import numpy as np
import pyarrow as pa
import pyarrow.compute as pc


def exclusive_bucket_offsets(
    ds, bucket_col: str, weight_col: str | None = None
) -> tuple[dict[int, int], int]:
    """Exclusive prefix offset per bucket (ascending bucket order).

    ``weight_col=None`` counts rows; otherwise sums the weight. A per-batch
    COMBINER pre-aggregates before the groupby, so the shuffle moves at most
    buckets × blocks partial rows — never the corpus — and only the final
    per-bucket sums reach the driver. Returns (offsets, grand_total).
    """

    def partial(b: pa.Table) -> pa.Table:
        w = (
            pa.array(np.ones(b.num_rows, np.int64))
            if weight_col is None
            else pc.cast(b[weight_col], pa.int64())
        )
        g = pa.table({bucket_col: b[bucket_col], "_w": w}).group_by(
            bucket_col
        ).aggregate([("_w", "sum")])
        return pa.table({bucket_col: g[bucket_col], "_w": g["_w_sum"]})

    agg = ds.map_batches(partial, batch_format="pyarrow").groupby(bucket_col).sum("_w")
    vcol = "sum(_w)"
    rows = agg.take_all()  # bucket-cardinality rows, by construction small
    rows.sort(key=lambda r: r[bucket_col])
    offsets: dict[int, int] = {}
    acc = 0
    for r in rows:
        offsets[r[bucket_col]] = acc
        acc += int(r[vcol])
    return offsets, acc


# -- deterministic global shuffle -------------------------------------------

def _shuffle_keys(ids: list, salt: str) -> list[str]:
    return [hashlib.md5(f"{i}|{salt}".encode()).hexdigest() for i in ids]


def add_shuffle_key(batch: pa.Table, *, id_col: str = "doc_id", salt: str = "") -> pa.Table:
    """md5 content key + high-byte bucket. Oracle mirror:
    ``md5(CAST(id AS VARCHAR) || '|<salt>')``."""
    keys = _shuffle_keys(batch[id_col].to_pylist(), salt)
    buckets = pa.array([int(k[:2], 16) for k in keys], pa.int64())
    return pa.table(
        {id_col: batch[id_col], "_key": pa.array(keys, pa.string()), "_bucket": buckets}
    )


def shuffle_rank(ds, *, id_col: str = "doc_id", salt: str = "", out_col: str = "rank"):
    """Deterministic global shuffle: rank every row by md5(id|salt).

    The epoch-reshuffle primitive for training-data ordering — changing the
    salt permutes the corpus, and the same (corpus, salt) always yields the
    same order at any partitioning / cluster size. Input needs only the id
    column (callers should column-prune the read); the md5 key is recomputed
    in pass 2 rather than materialized between passes.
    """
    keyed = ds.map_batches(
        add_shuffle_key, fn_kwargs=dict(id_col=id_col, salt=salt), batch_format="pyarrow"
    )
    offsets, _ = exclusive_bucket_offsets(keyed, "_bucket")

    def rank_group(t: pa.Table) -> pa.Table:
        idx = pc.sort_indices(t, sort_keys=[("_key", "ascending"), (id_col, "ascending")])
        t = t.take(idx)
        start = offsets[t["_bucket"][0].as_py()]
        return pa.table(
            {
                id_col: t[id_col],
                out_col: pa.array(start + np.arange(t.num_rows, dtype=np.int64), pa.int64()),
            }
        )

    return keyed.groupby("_bucket").map_groups(rank_group, batch_format="pyarrow")


def ordered_prefix_sums(
    ds, *, bucket_col: str, sort_keys: list[str], weight_col: str, out_col: str
):
    """Exclusive running total of ``weight_col`` in (bucket asc, sort_keys
    asc) global order — the generic second half of the two-pass scheme.
    Appends ``out_col`` to every row; callers provide the ``bucket_col``
    (which must be an order-prefix of the target global order)."""
    offsets, _ = exclusive_bucket_offsets(ds, bucket_col, weight_col=weight_col)

    def g(t: pa.Table) -> pa.Table:
        idx = pc.sort_indices(t, sort_keys=[(k, "ascending") for k in sort_keys])
        t = t.take(idx)
        n = t[weight_col].to_numpy(zero_copy_only=False).astype(np.int64)
        start = offsets[t[bucket_col][0].as_py()] + np.concatenate(
            [[0], np.cumsum(n)[:-1]]
        ).astype(np.int64)
        return t.append_column(out_col, pa.array(start, pa.int64()))

    return ds.groupby(bucket_col).map_groups(g, batch_format="pyarrow")


def budget_select(ds, *, id_col: str = "doc_id", token_col: str = "n_tokens", budget: int):
    """Token-budget corpus selection: greedily keep the LONGEST documents
    (ties by id) until the global token budget is reached — a corpus-sizing
    primitive for training-data curation. A doc is kept iff the running
    token total BEFORE it is under the budget, so the result is exactly the
    SQL window ``SUM ... OVER (ORDER BY n_tokens DESC, id)`` cutoff and is
    partition/cluster-size invariant. Bucket = −n_tokens (ascending bucket
    order ⇔ longest-first); bucket cardinality = distinct doc lengths."""

    def add_bucket(b: pa.Table) -> pa.Table:
        n = b[token_col].to_numpy(zero_copy_only=False).astype(np.int64)
        return b.append_column("_bucket", pa.array(-n, pa.int64()))

    keyed = ds.map_batches(add_bucket, batch_format="pyarrow")
    pre = ordered_prefix_sums(
        keyed, bucket_col="_bucket", sort_keys=[id_col], weight_col=token_col,
        out_col="start_tok",
    )

    def keep(b: pa.Table) -> pa.Table:
        b = b.filter(pc.less(b["start_tok"], budget))
        return b.select([id_col, token_col, "start_tok"])

    return pre.map_batches(keep, batch_format="pyarrow")


# -- sequence packing --------------------------------------------------------

def pack_sequences(
    ds,
    *,
    id_col: str = "doc_id",
    token_col: str = "n_tokens",
    seq_len: int = 512,
    docs_per_bucket: int = 64,
):
    """Concat-then-split sequence packing (the standard LLM pretraining
    layout): documents are concatenated in ``id_col`` order and the token
    stream is cut into fixed ``seq_len`` windows. Emits, per document, its
    global start offset and the pack window(s) it lands in:

        (id, n_tokens, start_tok, pack_id, pack_offset, n_spans)

    ``start_tok`` is an exclusive prefix sum of token counts in id order —
    computed with the two-pass bucket scheme (see module docstring), so no
    stage ever sees more than one bucket of rows.
    """
    dpb = np.int64(docs_per_bucket)

    def add_bucket(b: pa.Table) -> pa.Table:
        ids = b[id_col].to_numpy(zero_copy_only=False).astype(np.int64)
        return b.append_column("_bucket", pa.array(ids // dpb, pa.int64()))

    keyed = ds.map_batches(add_bucket, batch_format="pyarrow")
    offsets, _ = exclusive_bucket_offsets(keyed, "_bucket", weight_col=token_col)

    def pack_group(t: pa.Table) -> pa.Table:
        idx = pc.sort_indices(t, sort_keys=[(id_col, "ascending")])
        t = t.take(idx)
        n = t[token_col].to_numpy(zero_copy_only=False).astype(np.int64)
        bucket_start = offsets[t["_bucket"][0].as_py()]
        start = bucket_start + np.concatenate([[0], np.cumsum(n)[:-1]]).astype(np.int64)
        pack_id = start // seq_len
        n_spans = (start + np.maximum(n, 1) - 1) // seq_len - pack_id + 1
        return pa.table(
            {
                id_col: t[id_col],
                token_col: pa.array(n, pa.int64()),
                "start_tok": pa.array(start, pa.int64()),
                "pack_id": pa.array(pack_id, pa.int64()),
                "pack_offset": pa.array(start % seq_len, pa.int64()),
                "n_spans": pa.array(n_spans, pa.int64()),
            }
        )

    return keyed.groupby("_bucket").map_groups(pack_group, batch_format="pyarrow")


def rolling_sum(
    ds,
    *,
    key: str,
    order_cols: list[str],
    value_col: str,
    window: int,
    out_col: str = "rolling",
):
    """Ordered window aggregate: per ``key``, SUM(value) OVER (ORDER BY
    order_cols ROWS BETWEEN window-1 PRECEDING AND CURRENT ROW) — the
    per-key sliding window the Dataset API lacks.

    Shape (the engine's skew-proof sort + segment pattern, cf.
    q_events_sessionize): ONE global range sort on (key, *order_cols) —
    Ray balances blocks by rows, so a hot key spans blocks instead of
    pinning a reducer — then one vectorized pass per sorted block computes
    prefix-sum rolling windows with run resets. Only rows whose window
    could cross a block edge are incomplete: ≤ (window−1) head rows of a
    block's first run, recomputed on the driver from the ≤ (window−1)
    trailing context rows each block also emits — O(blocks × window) rows,
    independent of key skew. ``value_col`` must be int64 (round floats to
    cents first; exact sums, engine-independent hashes).
    """
    import ray.data as rd

    w = int(window)
    if w < 1:
        raise ValueError("window must be >= 1")
    SENT = -(2**62)

    def per_block(b: pa.Table) -> pa.Table:
        n = b.num_rows
        if n == 0:
            return b.append_column(out_col, pa.array([], pa.int64())).append_column(
                "_edge", pa.array([], pa.int8())
            )
        k = b[key].to_numpy(zero_copy_only=False)
        v = b[value_col].to_numpy(zero_copy_only=False).astype(np.int64)
        starts = np.flatnonzero(np.r_[True, k[1:] != k[:-1]])
        ends = np.r_[starts[1:], n]
        run_start = np.repeat(starts, ends - starts)
        j = np.arange(n)
        cs = np.r_[0, np.cumsum(v)]
        lo = np.maximum(j - w + 1, run_start)
        roll = cs[j + 1] - cs[lo]
        # head rows: first run of the block, within w-1 of the block edge —
        # their window may continue into the previous block
        head = (run_start == 0) & (j - run_start < w - 1)
        # context rows: last run's trailing min(w-1, len) rows — the next
        # block's heads may need them (emitted as context only, not output)
        last_start = starts[-1]
        ctx = (run_start == last_start) & (j >= n - (w - 1)) if w > 1 else np.zeros(n, bool)
        edge = np.where(head, 1, 0) + np.where(ctx, 2, 0)  # 1=head 2=ctx 3=both
        out = b.append_column(out_col, pa.array(np.where(head, SENT, roll)))
        return out.append_column("_edge", pa.array(edge.astype(np.int8)))

    sorted_ds = ds.sort([key] + order_cols)
    marked = sorted_ds.map_batches(per_block, batch_format="pyarrow", batch_size=None).materialize()

    # completed rows = everything that is not a head (flags 0 and 2 —
    # context-only rows carry correct windows, they are just INPUTS for the
    # next block's heads)
    done = marked.map_batches(
        lambda b: b.filter(
            pc.equal(pc.bit_wise_and(b["_edge"], 1), 0)
        ).drop_columns(["_edge"]),
        batch_format="pyarrow",
    )
    edge_parts = [
        b.filter(pc.greater(b["_edge"], 0))
        for b in marked.iter_batches(batch_size=None, batch_format="pyarrow")
    ]
    edge_parts = [b for b in edge_parts if b.num_rows]
    if not edge_parts:
        return done
    et = pa.concat_tables(edge_parts, promote_options="default").combine_chunks()
    et = et.sort_by([(key, "ascending")] + [(c, "ascending") for c in order_cols])
    k = et[key].to_numpy(zero_copy_only=False)
    v = et[value_col].to_numpy(zero_copy_only=False).astype(np.int64)
    flags = et["_edge"].to_numpy(zero_copy_only=False)
    starts = np.flatnonzero(np.r_[True, k[1:] != k[:-1]])
    run_start = np.repeat(starts, np.r_[starts[1:], len(k)] - starts)
    j = np.arange(len(k))
    cs = np.r_[0, np.cumsum(v)]
    lo = np.maximum(j - w + 1, run_start)
    roll = cs[j + 1] - cs[lo]
    # within w-1 of a head row every real predecessor is present in the
    # edge union (each trailing segment ships its last w-1 rows), so the
    # union-order window IS the true window for head rows
    fixed = (
        et.set_column(et.schema.get_field_index(out_col), out_col, pa.array(roll))
        .filter(pa.array((flags == 1) | (flags == 3)))
        .drop_columns(["_edge"])
    )
    return done.union(rd.from_arrow(fixed))


def lag(
    ds,
    *,
    key: str,
    order_cols: list[str],
    value_col: str,
    offset: int = 1,
    out_col: str = "lag",
):
    """Per-key LAG(value, offset): each row gets the value of the row
    ``offset`` positions earlier in its key's (order_cols) order, null at
    the run head — the other ordered-window primitive (LEAD(v, n) ≡
    LAG over the reversed order). Same skew-proof shape as rolling_sum:
    one global range sort, vectorized per-block shift with run resets,
    and ≤ offset head rows per block fixed from ≤ offset trailing context
    rows — O(blocks × offset) driver work."""
    import ray.data as rd

    d = int(offset)
    if d < 1:
        raise ValueError("offset must be >= 1")

    def per_block(b: pa.Table) -> pa.Table:
        n = b.num_rows
        if n == 0:
            return b.append_column(out_col, b[value_col]).append_column(
                "_edge", pa.array([], pa.int8())
            )
        k = b[key].to_numpy(zero_copy_only=False)
        starts = np.flatnonzero(np.r_[True, k[1:] != k[:-1]])
        ends = np.r_[starts[1:], n]
        run_start = np.repeat(starts, ends - starts)
        j = np.arange(n)
        src = j - d
        valid = src >= run_start
        lagv = b[value_col].take(pa.array(np.where(valid, src, 0)))
        lagv = pc.if_else(pa.array(valid), lagv, pa.nulls(n, b[value_col].type))
        head = (run_start == 0) & (j - run_start < d)
        last_start = starts[-1]
        ctx = (run_start == last_start) & (j >= n - d)
        edge = np.where(head, 1, 0) + np.where(ctx, 2, 0)
        return b.append_column(out_col, lagv).append_column(
            "_edge", pa.array(edge.astype(np.int8))
        )

    marked = (
        ds.sort([key] + order_cols)
        .map_batches(per_block, batch_format="pyarrow", batch_size=None)
        .materialize()
    )
    done = marked.map_batches(
        lambda b: b.filter(pc.equal(pc.bit_wise_and(b["_edge"], 1), 0)).drop_columns(
            ["_edge"]
        ),
        batch_format="pyarrow",
    )
    edge_parts = [
        b.filter(pc.greater(b["_edge"], 0))
        for b in marked.iter_batches(batch_size=None, batch_format="pyarrow")
    ]
    edge_parts = [b for b in edge_parts if b.num_rows]
    if not edge_parts:
        return done
    et = pa.concat_tables(edge_parts, promote_options="default").combine_chunks()
    et = et.sort_by([(key, "ascending")] + [(c, "ascending") for c in order_cols])
    k = et[key].to_numpy(zero_copy_only=False)
    flags = et["_edge"].to_numpy(zero_copy_only=False)
    starts = np.flatnonzero(np.r_[True, k[1:] != k[:-1]])
    run_start = np.repeat(starts, np.r_[starts[1:], len(k)] - starts)
    j = np.arange(len(k))
    src = j - d
    valid = src >= run_start
    lagv = et[value_col].take(pa.array(np.where(valid, src, 0)))
    lagv = pc.if_else(pa.array(valid), lagv, pa.nulls(len(k), et[value_col].type))
    fixed = (
        et.set_column(et.schema.get_field_index(out_col), out_col, lagv)
        .filter(pa.array((flags == 1) | (flags == 3)))
        .drop_columns(["_edge"])
    )
    return done.union(rd.from_arrow(fixed))


def lead(
    ds,
    *,
    key: str,
    order_cols: list[str],
    value_col: str,
    offset: int = 1,
    out_col: str = "lead",
):
    """Per-key LEAD(value, offset): the value ``offset`` rows AHEAD in the
    key's order, null at the run tail. Mirror of :func:`lag` — incomplete
    rows are now a block's LAST run's trailing ``offset`` rows (their
    source row may live in the next block), and the context shipped for
    the fix-up is each block's FIRST run's leading ``offset`` rows."""
    import ray.data as rd

    d = int(offset)
    if d < 1:
        raise ValueError("offset must be >= 1")

    def per_block(b: pa.Table) -> pa.Table:
        n = b.num_rows
        if n == 0:
            return b.append_column(out_col, b[value_col]).append_column(
                "_edge", pa.array([], pa.int8())
            )
        k = b[key].to_numpy(zero_copy_only=False)
        starts = np.flatnonzero(np.r_[True, k[1:] != k[:-1]])
        ends = np.r_[starts[1:], n]
        run_end = np.repeat(ends, ends - starts)
        j = np.arange(n)
        src = j + d
        valid = src < run_end
        leadv = b[value_col].take(pa.array(np.where(valid, src, 0)))
        leadv = pc.if_else(pa.array(valid), leadv, pa.nulls(n, b[value_col].type))
        # heads (incomplete): last run's trailing d rows — their true source
        # may continue in the NEXT block
        last_start = starts[-1]
        head = (np.repeat(starts, ends - starts) == last_start) & (j >= n - d)
        # context: first run's leading d rows feed the PREVIOUS block's heads
        ctx = (np.repeat(starts, ends - starts) == 0) & (j < d)
        edge = np.where(head, 1, 0) + np.where(ctx, 2, 0)
        return b.append_column(out_col, leadv).append_column(
            "_edge", pa.array(edge.astype(np.int8))
        )

    marked = (
        ds.sort([key] + order_cols)
        .map_batches(per_block, batch_format="pyarrow", batch_size=None)
        .materialize()
    )
    done = marked.map_batches(
        lambda b: b.filter(pc.equal(pc.bit_wise_and(b["_edge"], 1), 0)).drop_columns(
            ["_edge"]
        ),
        batch_format="pyarrow",
    )
    edge_parts = [
        b.filter(pc.greater(b["_edge"], 0))
        for b in marked.iter_batches(batch_size=None, batch_format="pyarrow")
    ]
    edge_parts = [b for b in edge_parts if b.num_rows]
    if not edge_parts:
        return done
    et = pa.concat_tables(edge_parts, promote_options="default").combine_chunks()
    et = et.sort_by([(key, "ascending")] + [(c, "ascending") for c in order_cols])
    k = et[key].to_numpy(zero_copy_only=False)
    flags = et["_edge"].to_numpy(zero_copy_only=False)
    starts = np.flatnonzero(np.r_[True, k[1:] != k[:-1]])
    run_end = np.repeat(np.r_[starts[1:], len(k)], np.r_[starts[1:], len(k)] - starts)
    j = np.arange(len(k))
    src = j + d
    valid = src < run_end
    leadv = et[value_col].take(pa.array(np.where(valid, src, 0)))
    leadv = pc.if_else(pa.array(valid), leadv, pa.nulls(len(k), et[value_col].type))
    fixed = (
        et.set_column(et.schema.get_field_index(out_col), out_col, leadv)
        .filter(pa.array((flags == 1) | (flags == 3)))
        .drop_columns(["_edge"])
    )
    return done.union(rd.from_arrow(fixed))
