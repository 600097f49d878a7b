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
import pyarrow.compute as pc


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


# -- frequent items (Misra-Gries) -------------------------------------------


def mg_compress(keys: np.ndarray, counts: np.ndarray, m: int) -> tuple[np.ndarray, np.ndarray]:
    """Compress exact/merged counters to a Misra-Gries summary of ≤ m
    positive counters: subtract the (m+1)-th largest count from everything
    and drop non-positives. Underestimates each survivor by ≤ that pivot;
    summed over merges the total error stays ≤ n/(m+1) (Agarwal et al.,
    'Mergeable Summaries', PODS'12)."""
    if len(keys) <= m:
        return keys, counts
    pivot = np.partition(counts, len(counts) - m - 1)[len(counts) - m - 1]
    kept = counts - pivot
    mask = kept > 0
    return keys[mask], kept[mask]


def mg_token_partials(batch: pa.Table, *, text_col: str = "text", m: int = 512) -> pa.Table:
    """One MG summary row per batch over whitespace tokens: exact in-batch
    value_counts compressed to ≤ m counters, plus the batch token total.
    O(m) bytes leave each batch regardless of vocabulary size — the
    bounded-memory half of heavy-hitter detection when the exact
    vocabulary-sized groupby (text.token_partial_counts) would not fit."""
    from .text import _token_lists

    toks = _token_lists(batch[text_col])
    flat = toks.flatten()
    total = len(flat)
    if total == 0:
        return pa.table(
            {
                "keys": pa.array([[]], pa.list_(pa.string())),
                "counts": pa.array([[]], pa.list_(pa.int64())),
                "n_tokens": pa.array([0], pa.int64()),
            }
        )
    vc = flat.value_counts()
    keys = vc.field("values").to_numpy(zero_copy_only=False)
    counts = vc.field("counts").to_numpy(zero_copy_only=False).astype(np.int64)
    keys, counts = mg_compress(keys, counts, m)
    return pa.table(
        {
            "keys": pa.array([keys.tolist()], pa.list_(pa.string())),
            "counts": pa.array([counts.tolist()], pa.list_(pa.int64())),
            "n_tokens": pa.array([total], pa.int64()),
        }
    )


def frequent_tokens(ds, *, text_col: str = "text", phi: float = 0.003, m: int | None = None):
    """EXACT heavy hitters (tokens with count ≥ ceil(phi·total)) in two
    streaming passes:

    1. Misra-Gries candidate sweep — per-batch O(m) summaries, O(blocks·m)
       driver merge. With m ≥ 2/phi the MG guarantee makes the candidate
       set a SUPERSET of the true heavy hitters (error < phi·total/2).
    2. Exact verify — broadcast the candidate array, count ONLY candidate
       tokens per batch (candidate-sized partials, not vocabulary-sized),
       small groupby, threshold filter.

    Returns a pa.Table (token, n_total) sorted by (-n_total, token).
    """
    import ray

    m = m or max(16, int(np.ceil(2.0 / phi)))
    part_ds = ds.map_batches(
        lambda b: mg_token_partials(b, text_col=text_col, m=m), batch_format="pyarrow"
    )
    acc: dict[str, int] = {}
    total = 0
    for b in part_ds.iter_batches(batch_size=None, batch_format="pyarrow"):
        for ks, cs, n in zip(
            b["keys"].to_pylist(), b["counts"].to_pylist(), b["n_tokens"].to_pylist()
        ):
            total += n
            for k_, c_ in zip(ks, cs):
                acc[k_] = acc.get(k_, 0) + c_
            if len(acc) > 4 * m:  # keep the driver fold bounded
                keys = np.array(list(acc.keys()), dtype=object)
                counts = np.array(list(acc.values()), dtype=np.int64)
                keys, counts = mg_compress(keys, counts, m)
                acc = dict(zip(keys.tolist(), counts.tolist()))
    if not acc or total == 0:
        return pa.table({"token": pa.array([], pa.string()), "n_total": pa.array([], pa.int64())})
    cand = pa.array(sorted(acc.keys()), pa.string())
    cand_ref = ray.put(cand)
    thresh = int(np.ceil(phi * total))

    def verify(b: pa.Table) -> pa.Table:
        from .text import _token_lists

        cv = ray.get(cand_ref)
        flat = _token_lists(b[text_col]).flatten()
        hit = flat.filter(pc.is_in(flat, value_set=cv))
        if len(hit) == 0:
            return pa.table({"token": pa.array([], pa.string()), "n": pa.array([], pa.int64())})
        vc = hit.value_counts()
        return pa.table(
            {"token": vc.field("values"), "n": pc.cast(vc.field("counts"), pa.int64())}
        )

    from ray.data.aggregate import Sum

    agg = (
        ds.map_batches(verify, batch_format="pyarrow")
        .groupby("token")
        .aggregate(Sum("n"))
    )
    rows = agg.take_all()  # ≤ |candidates| rows
    toks = [r["token"] for r in rows if r["sum(n)"] >= thresh]
    ns = [int(r["sum(n)"]) for r in rows if r["sum(n)"] >= thresh]
    out = pa.table({"token": pa.array(toks, pa.string()), "n_total": pa.array(ns, pa.int64())})
    idx = pc.sort_indices(
        out, sort_keys=[("n_total", "descending"), ("token", "ascending")]
    )
    return out.take(idx)
