"""Stratified sampling with EXACT per-group quotas.

``hash_sample`` / ``mixture_sample`` (stages/text.py) are probabilistic —
each row decides alone, so group sizes drift binomially. Curation recipes
often need exact strata ("25 docs per language, deterministic"): keep, per
group, the Q rows with the smallest (md5(text), id) — a content-keyed
deterministic choice identical to SQL
``row_number() OVER (PARTITION BY g ORDER BY md5(text), id) <= Q``.

Scale shape (same as a distributed top-k): a per-batch COMBINER keeps at
most Q rows per group inside each batch, so the ``groupby(group)`` shuffle
moves ≤ blocks×Q×groups rows — never the corpus — and the final per-group
pick runs over those partials only. Skew-safe by construction: a hot group
contributes Q rows per upstream block, not its full membership.

No reference analog; graft machinery for the LLM-data pipeline axis.
"""

from __future__ import annotations

import hashlib

import numpy as np
import pyarrow as pa
import pyarrow.compute as pc


def _first_q_per_group(t: pa.Table, group_col: str, id_col: str, q: int) -> pa.Table:
    """Rows with rank < q within group under (group, _key, id) order —
    vectorized run-boundary scan, no Python per row."""
    idx = pc.sort_indices(
        t,
        sort_keys=[(group_col, "ascending"), ("_key", "ascending"), (id_col, "ascending")],
    )
    t = t.take(idx)
    g = t[group_col].to_numpy(zero_copy_only=False)
    if len(g) == 0:
        return t
    new_run = np.r_[True, g[1:] != g[:-1]]
    run_id = np.cumsum(new_run) - 1
    starts = np.flatnonzero(new_run)
    pos = np.arange(len(g)) - starts[run_id]
    return t.filter(pa.array(pos < q))


def stratified_topq(
    ds, *, group_col: str, q: int, id_col: str = "doc_id", text_col: str = "text"
):
    """Exact-quota stratified sample: per group, the Q docs with the
    smallest (md5(text), id). Returns (id, group) rows."""

    def partial(b: pa.Table) -> pa.Table:
        keys = [
            hashlib.md5(t.encode("utf-8")).hexdigest() if t is not None else None
            for t in b[text_col].to_pylist()
        ]
        t = pa.table(
            {
                id_col: b[id_col],
                group_col: b[group_col],
                "_key": pa.array(keys, pa.string()),
            }
        )
        return _first_q_per_group(t, group_col, id_col, q)

    parts = ds.map_batches(partial, batch_format="pyarrow")

    def final(g: pa.Table) -> pa.Table:
        return _first_q_per_group(g, group_col, id_col, q).select([id_col, group_col])

    return parts.groupby(group_col).map_groups(final, batch_format="pyarrow")
