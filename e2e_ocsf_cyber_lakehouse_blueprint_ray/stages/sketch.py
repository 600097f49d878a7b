"""Mergeable sketches for 100-TB-scale profiling queries.

HyperLogLog distinct counting: each batch reduces to a fixed 2^p-byte
register array (a *mergeable* partial — elementwise max), so a
distinct-count over any input size moves only ``n_blocks × 2^p`` bytes to
the final combine instead of shuffling keys. This is the engine's pattern
for verification-count jobs where an exact `groupby` would be an
all-to-all on a 10^12-row table (SURVEY.md §2.6 verification counts; the
reference runs exact COUNT(DISTINCT) on Spark — at the brief's scale a
sketch is the only shape that avoids a full shuffle).

Estimator: standard bias-corrected HLL (Flajolet et al. 2007) with
linear-counting fallback in the small range; 64-bit polars hash, so no
large-range correction is needed. Deterministic for a given input set —
the estimate is reproducible across runs and partitionings (max is
commutative/associative).
"""

from __future__ import annotations

import numpy as np
import pyarrow as pa


def _hash64(arr: pa.ChunkedArray | pa.Array) -> np.ndarray:
    import polars as pl

    col = arr.combine_chunks() if isinstance(arr, pa.ChunkedArray) else arr
    h = pl.from_arrow(pa.table({"x": col}))["x"].hash(seed=0)
    return h.to_numpy().astype(np.uint64)


def hll_registers(values: np.ndarray, p: int = 14) -> np.ndarray:
    """uint8[2^p] register array for one batch of 64-bit hashes.

    Vectorized: register index = top p bits; rank = leading-zero count of
    the remaining (64-p) bits + 1, computed exactly via float64 frexp
    (the masked value is < 2^50 for p >= 14, exactly representable);
    per-register max via sort + maximum.reduceat — no Python loop."""
    m = 1 << p
    reg = np.zeros(m, dtype=np.uint8)
    if len(values) == 0:
        return reg
    j = (values >> np.uint64(64 - p)).astype(np.int64)
    w = values & np.uint64((1 << (64 - p)) - 1)
    bitlen = np.frexp(w.astype(np.float64))[1]  # exact: w < 2^(64-p) <= 2^50
    rank = np.where(w == 0, 64 - p + 1, 64 - p - bitlen + 1).astype(np.uint8)
    order = np.argsort(j, kind="stable")
    js, rs = j[order], rank[order]
    starts = np.flatnonzero(np.r_[True, js[1:] != js[:-1]])
    reg[js[starts]] = np.maximum.reduceat(rs, starts)
    return reg


def hll_merge(regs: list[np.ndarray]) -> np.ndarray:
    out = regs[0].copy()
    for r in regs[1:]:
        np.maximum(out, r, out=out)
    return out


def hll_estimate(reg: np.ndarray) -> float:
    m = float(len(reg))
    alpha = 0.7213 / (1.0 + 1.079 / m)
    est = alpha * m * m / np.sum(np.float64(2.0) ** -reg.astype(np.float64))
    if est <= 2.5 * m:
        zeros = int(np.count_nonzero(reg == 0))
        if zeros:
            est = m * np.log(m / zeros)
    return float(est)


def distinct_count_hll(ds, col: str, *, p: int = 14, batch_size: int | None = None):
    """Distributed distinct-count estimate of ``ds[col]``.

    Per-batch partials (one 2^p-byte row each) stream back to a driver-side
    elementwise-max merge — bytes moved are O(blocks), never O(rows).
    Returns a one-row pa.Table ``{n_distinct_est: int64}``.
    """

    def partial(b: pa.Table) -> pa.Table:
        reg = hll_registers(_hash64(b[col]), p)
        return pa.table({"reg": pa.array([reg.tobytes()], pa.binary())})

    rows = ds.map_batches(partial, batch_format="pyarrow", batch_size=batch_size).take_all()
    regs = [np.frombuffer(r["reg"], dtype=np.uint8) for r in rows]
    merged = hll_merge(regs) if regs else np.zeros(1 << p, np.uint8)
    return pa.table({"n_distinct_est": pa.array([int(round(hll_estimate(merged)))], pa.int64())})


def group_quantiles_disc(ds, group_col: str, value_col: str,
                         qs: tuple[float, ...] = (0.5, 0.95, 0.99),
                         names: tuple[str, ...] = ("p50", "p95", "p99")):
    """Exact per-group discrete quantiles (``sorted[ceil(q*n)-1]``, matching
    DuckDB's quantile_disc). Shuffles only (group, value) pairs; per-group
    work is one vectorized sort. Assumes one group's values fit a worker —
    for unbounded groups use a per-batch histogram partial instead."""

    def per_group(g: pa.Table) -> pa.Table:
        v = np.sort(g[value_col].to_numpy(zero_copy_only=False))
        n = len(v)
        idx = np.minimum(np.ceil(np.array(qs) * n).astype(np.int64) - 1, n - 1)
        idx = np.maximum(idx, 0)
        out = {group_col: pa.array([g[group_col][0].as_py()])}
        for name, i in zip(names, idx):
            out[name] = pa.array([float(v[i])], pa.float64())
        return pa.table(out)

    return ds.groupby(group_col).map_groups(per_group, batch_format="pyarrow")
