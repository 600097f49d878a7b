"""Snapshot change feed (CDC) — the Delta Change Data Feed analog.

``snapshot_changes(t, A, B)`` emits the net row-level difference between two
snapshots as full rows labeled ``change ∈ {'added', 'removed'}``. The trick
that makes this cheap on a 10^12-row table: rows can only differ inside
files that CHANGED between the snapshots, and the manifest diff names those
files directly —

    read ONLY (files in A − B) ∪ (files in B − A)     (one pruned read)
    side = −1 for A-only files, +1 for B-only files    (vectorized is_in on
                                                        the path column)
    sort by a 64-bit content hash                      (the ONE shuffle;
                                                        key is 8 bytes/row)
    per block: Arrow C++ group_by(content-key string) → sum(side); groups
    whose hash is the block's min/max MAY straddle a block boundary, so
    those are held out as partials — ≤ 2 distinct hashes per block, a
    driver-side exact combine over O(blocks) rows finishes them
    net < 0 ⇒ 'removed', net > 0 ⇒ 'added', 0 ⇒ carried (compaction /
    clustering moves cancel out — a pure-maintenance diff is EMPTY)

Netting always groups by the FULL row content — encoded as one exact,
NON-NULL key string per row (nullable raw columns make unreliable Arrow
group keys; the hash only routes the shuffle) — so 64-bit collisions can
never cancel or merge distinct rows. An
update surfaces as one 'removed' (old version) plus one 'added' (new
version). Multiset note: nets are emitted once per distinct content with
``|net|`` = 1 expected for keyed tables; duplicate-row tables net to ±k and
are emitted once per distinct content (documented, not expanded k times).

Reference analog: Delta Change Data Feed, which the reference's table flags
opt into implicitly via row-level DML support
(/root/reference/utilities/utils.py:90-95); the reference's
``metadata.log_version`` selective-deletion convention
(/root/reference/transformations/mappings/ocsf/iam/gold_github_audit_logs.py:36-37)
is the intended consumer of such a feed. Schema evolution between the two
snapshots is supported: both sides align to the TARGET snapshot's schema
(old-side files null-fill evolved columns), so carried rows still cancel
across an evolution + rewrite.
"""

from __future__ import annotations

import os

import numpy as np
import pyarrow as pa
import pyarrow.compute as pc

from ..table import Table

_NET, _EDGE, _HASH, _KEY = "_net", "_edge", "_h", "_k"


def _content_key(t: pa.Table, cols: list[str]) -> pa.Array:
    """One string per row encoding the full row content (\\x1f-joined,
    nulls → \\x00): hashed for routing; exact grouping uses the columns."""
    parts = []
    for c in cols:
        col = t[c]
        if pa.types.is_timestamp(col.type):
            col = col.cast(pa.int64())
        parts.append(pc.cast(col, pa.string()))
    parts.append("\x1f")
    return pc.binary_join_element_wise(
        *parts, null_handling="replace", null_replacement="\x00"
    ).combine_chunks()


def _net_table(t: pa.Table, cols: list[str]) -> pa.Table:
    """Exact per-content signed sum. Groups by the non-null content-key
    string (grouping by raw nullable columns is unreliable in Arrow's hash
    aggregate); content columns ride along via ``min``, which is exact
    because every row in a group is identical by construction."""
    agg = t.group_by([_KEY]).aggregate(
        [(_NET, "sum")] + [(c, "min") for c in cols + [_HASH]]
    )
    out = {c: agg[f"{c}_min"] for c in cols}
    out[_HASH] = agg[f"{_HASH}_min"]
    out[_KEY] = agg[_KEY]
    out[_NET] = agg[f"{_NET}_sum"]
    return pa.table(out)


def _label(t: pa.Table, cols: list[str]) -> pa.Table:
    nz = t.filter(pc.not_equal(t[_NET], 0))
    change = pc.if_else(pc.greater(nz[_NET], 0), pa.scalar("added"), pa.scalar("removed"))
    return nz.select(cols).append_column("change", change)


#: phase-1 partials fold on the driver below this many rows (~24 B each);
#: above it a distributed narrow-row sort takes over. Env-tunable so the
#: two paths can be A/B-measured on one input (0 forces the distributed
#: fold — the 100-TB shape — everywhere).
PARTIAL_DRIVER_MAX_ROWS = int(
    os.environ.get("ENGINE_CHANGES_PARTIAL_DRIVER_MAX_ROWS", 8_000_000)
)
#: phase-2 matching rows net on the driver below this many changed hashes
#: (full rows — keep the cap conservative); above it the distributed exact
#: netting runs on the subset
SUBSET_DRIVER_MAX_ROWS = 500_000


def snapshot_changes(table: Table, from_id: int, to_id: int):
    """Lazy Dataset of net row changes between two snapshots: full rows of
    ``to_id``'s schema plus a ``change`` column.

    Two phases so the shuffle is proportional to the CHANGE set, not the
    rewritten file set: (1) net per 128-bit content hash — per-batch
    pre-aggregated (h1, h2, net) partials, 24 bytes/row through the
    groupby; (2) re-read the diff files keeping only rows of nonzero-net
    hashes (broadcast sorted hash set, searchsorted membership) and run
    the exact content-key netting on that churn-sized subset. A pure
    maintenance diff finishes after phase 1 with an empty hash set. When
    the changed set exceeds the broadcast budget the exact netting simply
    runs over everything (the diff ≈ the data then). Phase-1 zero-nets of
    two DISTINCT contents would need a 128-bit hash collision; phase 2
    stays content-exact.
    """
    import sys
    import time

    import ray.data as rd

    prof = os.environ.get("ENGINE_PROFILE_CHANGES")
    t_start = time.perf_counter()

    ent_a, ent_b = table.entries(from_id), table.entries(to_id)
    ea = set(ent_a["path"].to_pylist())
    eb = set(ent_b["path"].to_pylist())
    removed_paths = sorted(ea - eb)
    added_paths = sorted(eb - ea)
    bytes_by_path = {
        r["path"]: r["bytes"]
        for ent in (ent_a, ent_b)
        for r in ent.select(["path", "bytes"]).to_pylist()
    }
    schema = table.schema(to_id)
    cols = list(schema.names)
    out_schema = schema.append(pa.field("change", pa.string()))
    if not removed_paths and not added_paths:
        return rd.from_arrow(out_schema.empty_table())

    def _aligned(b: pa.Table) -> pa.Table:
        # align to the target snapshot's schema: evolved (added) columns
        # null-fill on the old side, so a row whose file predates the
        # evolution diffs as removed(old shape) + added(new shape) only
        # when its content actually changed under the target schema
        return pa.table(
            {
                c: (
                    b[c].cast(schema.field(c).type)
                    if c in b.schema.names
                    else pa.nulls(b.num_rows, schema.field(c).type)
                )
                for c in cols
            }
        )

    def _hashes(a: pa.Table) -> tuple[np.ndarray, np.ndarray]:
        # vectorized 2×64-bit row hash straight off the columns — no
        # per-row key-string materialization in the full-data phase
        import polars as pl

        df = pl.from_arrow(a)
        h1 = df.hash_rows(seed=0).to_numpy().astype(np.uint64).astype(np.int64)
        h2 = df.hash_rows(seed=1).to_numpy().astype(np.uint64).astype(np.int64)
        return h1, h2

    def _sides(fn_factory):
        # Pin the target snapshot's schema on BOTH diff sides: a side's path
        # set can mix pre- and post-evolution files (evolution rewrites no
        # data), and pyarrow.dataset otherwise infers the read schema from
        # one sampled fragment — a pre-evolution sample would silently drop
        # evolved columns, so carried rows fail to cancel and the feed emits
        # spurious removed+added pairs. With the pin, missing columns
        # null-fill per fragment and _aligned is a cheap no-op.
        sides = []
        for paths, side_val in ((removed_paths, -1), (added_paths, 1)):
            if paths:
                # size the read's block count from the diff bytes, not Ray's
                # min-200-blocks default: a post-maintenance diff is a few
                # hundred SMALL files and the default turns each into its
                # own read task — pure per-task overhead that made the feed
                # cost near-constant across sf (zstd ≈ 3× expansion est.)
                side_bytes = sum(bytes_by_path.get(p, 0) for p in paths)
                n_blocks = max(
                    table.config.rewrite_concurrency,
                    min(
                        4096,
                        -(-(side_bytes * 3) // table.config.target_file_bytes),
                    ),
                )
                sides.append(
                    rd.read_parquet(
                        [os.path.join(table.dir, p) for p in paths],
                        schema=schema,
                        override_num_blocks=min(n_blocks, len(paths) * 4),
                    ).map_batches(fn_factory(side_val), batch_format="pyarrow")
                )
        return sides[0] if len(sides) == 1 else sides[0].union(sides[1])

    # -- phase 1: hash-level netting over narrow partials -------------------
    def hash_partial(side_val: int):
        def fn(b: pa.Table) -> pa.Table:
            a = _aligned(b)
            h1, h2 = _hashes(a)
            t = pa.table(
                {
                    "_h1": pa.array(h1),
                    "_h2": pa.array(h2),
                    _NET: pa.array(np.full(b.num_rows, side_val, np.int64)),
                }
            )
            return t.group_by(["_h1", "_h2"]).aggregate([(_NET, "sum")])

        return fn

    # The partials are one 24-byte row per distinct content per batch. Up to
    # the cap they fold on the driver (one Arrow group_by — the mergeable-
    # partials pattern, cf. HLL/k-means); past it, a distributed sort on the
    # narrow rows + per-block netting + edge combine takes over, where the
    # sort's fixed per-block overhead is amortized by the (then large) diff.
    parts: list[pa.Table] = []
    n_part = 0
    overflow = False
    part_iter = _sides(hash_partial).iter_batches(batch_size=None, batch_format="pyarrow")
    for b in part_iter:
        parts.append(b.select(["_h1", "_h2", f"{_NET}_sum"]))
        n_part += b.num_rows
        if n_part > PARTIAL_DRIVER_MAX_ROWS:
            overflow = True
            break

    if not overflow:
        if not parts:
            return rd.from_arrow(out_schema.empty_table())
        pt = pa.concat_tables(parts).combine_chunks()
        agg = pt.group_by(["_h1", "_h2"]).aggregate([(f"{_NET}_sum", "sum")])
        nz = agg.filter(pc.not_equal(agg[f"{_NET}_sum_sum"], 0))
        changed1 = nz["_h1"].to_numpy(zero_copy_only=False).astype(np.int64)
        changed2 = nz["_h2"].to_numpy(zero_copy_only=False).astype(np.int64)
    else:
        # distributed hash netting: sort the narrow partial rows and net per
        # block, holding out block-edge hashes for a tiny driver combine
        del parts, part_iter

        def per_block_hash_net(b: pa.Table) -> pa.Table:
            if b.num_rows == 0:
                return pa.table(
                    {
                        "_h1": pa.array([], pa.int64()),
                        "_h2": pa.array([], pa.int64()),
                        "net": pa.array([], pa.int64()),
                        "_edge": pa.array([], pa.bool_()),
                    }
                )
            agg = b.group_by(["_h1", "_h2"]).aggregate([(f"{_NET}_sum", "sum")])
            agg = pa.table(
                {
                    "_h1": agg["_h1"],
                    "_h2": agg["_h2"],
                    "net": agg[f"{_NET}_sum_sum"],
                }
            )
            hmin, hmax = pc.min_max(b["_h1"]).values()
            edge = pc.or_(pc.equal(agg["_h1"], hmin), pc.equal(agg["_h1"], hmax))
            keep = pc.or_(edge, pc.not_equal(agg["net"], 0))
            return agg.filter(keep).append_column("_edge", edge.filter(keep))

        hn = (
            _sides(hash_partial)
            .sort("_h1")
            .map_batches(per_block_hash_net, batch_format="pyarrow", batch_size=None)
        )
        interior1: list[np.ndarray] = []
        interior2: list[np.ndarray] = []
        edge_parts1: list[pa.Table] = []
        for b in hn.iter_batches(batch_size=None, batch_format="pyarrow"):
            nzb = b.filter(pc.and_(pc.invert(b["_edge"]), pc.not_equal(b["net"], 0)))
            interior1.append(nzb["_h1"].to_numpy(zero_copy_only=False).astype(np.int64))
            interior2.append(nzb["_h2"].to_numpy(zero_copy_only=False).astype(np.int64))
            e = b.filter(b["_edge"])
            if e.num_rows:
                edge_parts1.append(e.drop_columns(["_edge"]))
        if edge_parts1:
            et1 = pa.concat_tables(edge_parts1).combine_chunks()
            ea1 = et1.group_by(["_h1", "_h2"]).aggregate([("net", "sum")])
            nze = ea1.filter(pc.not_equal(ea1["net_sum"], 0))
            interior1.append(nze["_h1"].to_numpy(zero_copy_only=False).astype(np.int64))
            interior2.append(nze["_h2"].to_numpy(zero_copy_only=False).astype(np.int64))
        changed1 = np.concatenate(interior1) if interior1 else np.array([], np.int64)
        changed2 = np.concatenate(interior2) if interior2 else np.array([], np.int64)

    if prof:
        print(
            f"[changes] phase1 {time.perf_counter() - t_start:.2f}s "
            f"files={len(removed_paths)}+{len(added_paths)} "
            f"partials={n_part} changed={len(changed1)} overflow={overflow}",
            file=sys.stderr, flush=True,
        )
        t_p2 = time.perf_counter()
    if len(changed1) == 0:
        return rd.from_arrow(out_schema.empty_table())

    # -- phase 2: exact content netting over the churn-sized subset ---------
    import ray

    order = np.argsort(changed1, kind="stable")
    cref = ray.put((changed1[order], changed2[order]))

    def tag_subset(side_val: int):
        def fn(b: pa.Table) -> pa.Table:
            a = _aligned(b)
            h1, h2 = _hashes(a)
            c1, c2 = ray.get(cref)
            pos = np.searchsorted(c1, h1)
            posc = np.clip(pos, 0, max(len(c1) - 1, 0))
            hit = (c1[posc] == h1) if len(c1) else np.zeros(len(h1), bool)
            ok = hit & (c2[posc] == h2)
            # h1 ties in the changed set: scan the tie run for a matching h2
            amb = hit & ~ok
            for i in np.flatnonzero(amb):
                j = pos[i]
                while j < len(c1) and c1[j] == h1[i]:
                    if c2[j] == h2[i]:
                        ok[i] = True
                        break
                    j += 1
            mask = pa.array(ok)
            a = a.filter(mask)
            # the exact content key is only built for the churn-sized subset
            key = _content_key(a, cols)
            side = pa.array(np.full(a.num_rows, side_val, np.int64))
            return (
                a.append_column(_KEY, key)
                .append_column(_NET, side)
                .append_column(_HASH, pa.array(h1[ok]))
            )

        return fn

    subset = _sides(tag_subset)
    if len(changed1) <= SUBSET_DRIVER_MAX_ROWS:
        # churn-bounded: collect the matching rows and net exactly in one
        # Arrow group_by on the driver — no shuffle at all
        rows = [
            b
            for b in subset.iter_batches(batch_size=None, batch_format="pyarrow")
            if b.num_rows
        ]
        if not rows:
            return rd.from_arrow(out_schema.empty_table())
        rt = pa.concat_tables(rows).combine_chunks()
        out = rd.from_arrow(_label(_net_table(rt, cols), cols).cast(out_schema))
        if prof:
            print(
                f"[changes] phase2 {time.perf_counter() - t_p2:.2f}s "
                f"subset_rows={rt.num_rows} (driver-fold path)",
                file=sys.stderr, flush=True,
            )
        return out

    # large churn: the original distributed exact netting over the subset
    def per_block_net(b: pa.Table) -> pa.Table:
        if b.num_rows == 0:
            return b.append_column(_EDGE, pa.array([], pa.bool_()))
        agg = _net_table(b, cols)
        hmin, hmax = pc.min_max(b[_HASH]).values()
        edge = pc.or_(pc.equal(agg[_HASH], hmin), pc.equal(agg[_HASH], hmax))
        keep = pc.or_(edge, pc.not_equal(agg[_NET], 0))
        return agg.filter(keep).append_column(_EDGE, edge.filter(keep))

    netted = (
        subset.sort(_HASH)
        .map_batches(per_block_net, batch_format="pyarrow", batch_size=None)
        .materialize()  # diff-sized, not table-sized: read twice below
    )
    interior = netted.map_batches(
        lambda b: _label(b.filter(pc.invert(b[_EDGE])), cols), batch_format="pyarrow"
    )
    edge_parts = [
        b.filter(b[_EDGE])
        for b in netted.iter_batches(batch_size=None, batch_format="pyarrow")
    ]
    edge_parts = [b for b in edge_parts if b.num_rows]
    if edge_parts:
        et = pa.concat_tables(edge_parts).combine_chunks()
        edge_final = _label(_net_table(et, cols), cols).cast(out_schema)
        return interior.union(rd.from_arrow(edge_final))
    return interior
