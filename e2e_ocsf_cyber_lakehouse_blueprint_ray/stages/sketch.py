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


# -- exact global quantiles (distributed selection) -------------------------


def _sortable_f64(vals: np.ndarray) -> np.ndarray:
    """float64 → uint64 keys whose unsigned order equals float order
    (sign bit flipped for positives, all bits for negatives; no NaNs)."""
    bu = np.ascontiguousarray(vals, dtype=np.float64).view(np.uint64)
    sign = bu >> np.uint64(63)
    flip = np.where(sign == 1, np.uint64(0xFFFFFFFFFFFFFFFF), np.uint64(0x8000000000000000))
    return bu ^ flip


def global_quantile_disc(
    ds,
    col: str,
    qs: list[float],
    *,
    max_candidates: int = 1_000_000,
):
    """EXACT discrete quantiles of one numeric column at any scale — the
    global counterpart of ``group_quantiles_disc`` (which needs each group
    in one worker). DuckDB ``quantile_disc`` semantics: the STORED value at
    rank ceil(q·n) of the sorted order, so results hash engine-identically.

    Distributed selection by radix refinement: floats map to order-
    preserving uint64 keys, and each pass histograms the next 16 key bits
    INSIDE every quantile's candidate prefix — a per-batch combiner emits
    at most (quantiles × 65536) count rows, the driver folds O(blocks)
    partials and narrows each rank to one bucket. After ≤ 3 refine passes
    (or as soon as a candidate range holds ≤ ``max_candidates`` rows) a
    final pass collects just the candidate values and picks the rank
    exactly. Every pass is one streaming scan; nothing shuffles.

    Returns a pa.Table (q, value) ordered by q. Nulls are ignored
    (SQL aggregate semantics); NaNs are unsupported.
    """
    qs = sorted(qs)

    def keys_of(b: pa.Table) -> np.ndarray:
        c = b[col]
        if c.null_count:
            c = c.drop_null()
        vals = c.to_numpy(zero_copy_only=False).astype(np.float64)
        return _sortable_f64(vals)

    # pass 0: total count + top-16-bit histogram in one sweep
    def hist_top(b: pa.Table) -> pa.Table:
        k = keys_of(b)
        if len(k) == 0:
            return pa.table({"bucket": pa.array([], pa.int64()), "n": pa.array([], pa.int64())})
        counts = np.bincount((k >> np.uint64(48)).astype(np.int64), minlength=0)
        nz = np.flatnonzero(counts)
        return pa.table({"bucket": pa.array(nz, pa.int64()), "n": pa.array(counts[nz], pa.int64())})

    def fold(ds_part) -> dict[int, int]:
        acc: dict[int, int] = {}
        for b in ds_part.iter_batches(batch_size=None, batch_format="pyarrow"):
            for bk, n in zip(b["bucket"].to_pylist(), b["n"].to_pylist()):
                acc[bk] = acc.get(bk, 0) + n
        return acc

    acc = fold(ds.map_batches(hist_top, batch_format="pyarrow"))
    total = sum(acc.values())
    if total == 0:
        return pa.table({"q": pa.array(qs, pa.float64()), "value": pa.nulls(len(qs), pa.float64())})
    # 1-based target rank per q (ceil(q·n), clamped to [1, n])
    ranks = [min(max(1, int(np.ceil(q * total))), total) for q in qs]

    # per-q state: (prefix, prefix_bits, rank_remaining_within_prefix, count_in_prefix)
    state = []
    for r in ranks:
        cum = 0
        for bk in sorted(acc):
            if cum + acc[bk] >= r:
                state.append([bk, 16, r - cum, acc[bk]])
                break
            cum += acc[bk]

    shift = 32
    while shift >= 0 and any(st[3] > max_candidates for st in state):
        prefixes = {(st[0], st[1]) for st in state}
        pref_list = sorted(prefixes)
        sh = np.uint64(shift)

        def hist_ref(b: pa.Table, _pl=tuple(pref_list), _sh=int(shift)) -> pa.Table:
            k = keys_of(b)
            out_p, out_b, out_n = [], [], []
            for pi, (pref, pbits) in enumerate(_pl):
                top = k >> np.uint64(64 - pbits)
                m = top == np.uint64(pref)
                if not m.any():
                    continue
                sub = (k[m] >> np.uint64(_sh)) & np.uint64(0xFFFF)
                counts = np.bincount(sub.astype(np.int64))
                nz = np.flatnonzero(counts)
                out_p.extend([pi] * len(nz))
                out_b.extend(nz.tolist())
                out_n.extend(counts[nz].tolist())
            return pa.table({"p": pa.array(out_p, pa.int64()), "bucket": pa.array(out_b, pa.int64()), "n": pa.array(out_n, pa.int64())})

        acc2: dict[tuple[int, int], int] = {}
        for b in ds.map_batches(hist_ref, batch_format="pyarrow").iter_batches(
            batch_size=None, batch_format="pyarrow"
        ):
            for p, bk, n in zip(b["p"].to_pylist(), b["bucket"].to_pylist(), b["n"].to_pylist()):
                acc2[(p, bk)] = acc2.get((p, bk), 0) + n
        for st in state:
            if st[3] <= max_candidates:
                continue
            pi = pref_list.index((st[0], st[1]))
            cum = 0
            for bk in sorted(k2 for (p2, k2) in acc2 if p2 == pi):
                n = acc2[(pi, bk)]
                if cum + n >= st[2]:
                    st[0] = (st[0] << 16) | bk
                    st[1] += 16
                    st[2] -= cum
                    st[3] = n
                    break
                cum += n
        shift -= 16

    # final pass: collect candidate values per q and pick the rank exactly
    pref_list = sorted({(st[0], st[1]) for st in state})

    def collect(b: pa.Table, _pl=tuple(pref_list)) -> pa.Table:
        k = keys_of(b)
        out_p, out_k = [], []
        for pi, (pref, pbits) in enumerate(_pl):
            top = k >> np.uint64(64 - pbits)
            m = top == np.uint64(pref)
            if m.any():
                sub = k[m]
                out_p.extend([pi] * len(sub))
                out_k.extend(sub.tolist())
        return pa.table({"p": pa.array(out_p, pa.int64()), "k": pa.array(np.array(out_k, dtype=np.uint64).astype(np.int64))})

    buckets: dict[int, list] = {}
    for b in ds.map_batches(collect, batch_format="pyarrow").iter_batches(
        batch_size=None, batch_format="pyarrow"
    ):
        for p, kk in zip(b["p"].to_pylist(), b["k"].to_numpy(zero_copy_only=False)):
            buckets.setdefault(p, []).append(kk)
    values = []
    for st in state:
        pi = pref_list.index((st[0], st[1]))
        ks = np.sort(np.asarray(buckets[pi], dtype=np.int64).astype(np.uint64))
        key = ks[st[2] - 1]
        sign = key >> np.uint64(63)
        flip = np.uint64(0x8000000000000000) if sign == 1 else np.uint64(0xFFFFFFFFFFFFFFFF)
        values.append(float(np.uint64(key ^ flip).view(np.float64)))
    return pa.table({"q": pa.array(qs, pa.float64()), "value": pa.array(values, pa.float64())})
