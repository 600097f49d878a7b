"""Similarity search over an embedding column (list<float>).

- ``brute_force_topk``: the baseline — each batch does ONE float64 matmul
  against a broadcast normalized query matrix (ray.put once), emits its
  local top-k per query, and a tiny ``groupby(query_id)`` reduce merges
  local top-ks into global top-ks. Data moved per batch: k rows per query,
  not the corpus.
- ``ivf_topk``: the scale path — k-means centroids (fit once on a sample,
  deterministic seed, broadcast), per-batch cluster assignment, and each
  query only scores rows whose cluster is among its ``nprobe`` nearest
  centroids. Same output schema; recall < 1 by design.
"""

from __future__ import annotations

import numpy as np
import pyarrow as pa

from ..config import EngineConfig, DEFAULT


def _normalize(m: np.ndarray) -> np.ndarray:
    m = m.astype(np.float64)
    return m / np.maximum(np.linalg.norm(m, axis=1, keepdims=True), 1e-12)


def vec_matrix(col: pa.ChunkedArray | pa.Array, dtype=np.float64) -> np.ndarray:
    """list<float> column → (n, d) matrix WITHOUT a per-row Python pass:
    flatten the list child buffer (zero-copy) and reshape. Requires equal
    list lengths (an embedding column's invariant — checked); null-free."""
    arr = col.combine_chunks() if isinstance(col, pa.ChunkedArray) else col
    if arr.null_count:
        raise ValueError("embedding column contains nulls")
    n = len(arr)
    if n == 0:
        return np.empty((0, 0), dtype=dtype)
    flat = arr.flatten().to_numpy(zero_copy_only=False)
    if flat.size % n:
        raise ValueError("ragged embedding column")
    d = flat.size // n
    if isinstance(arr, (pa.ListArray, pa.LargeListArray)):
        offs = arr.offsets.to_numpy(zero_copy_only=False)
        if not (np.diff(offs) == d).all():
            raise ValueError("ragged embedding column")
    return flat.astype(dtype, copy=False).reshape(n, d)


def _topk_rows(sims, bid, qids, k):
    """local top-k rows (query_id, vec_id, cosine) from a (b, Q) sim matrix
    — one argpartition over the whole matrix, no per-query Python loop."""
    n, q = sims.shape
    kk = min(k, n)
    if kk == 0:
        top = np.empty((0, q), dtype=np.int64)
    elif kk < n:
        top = np.argpartition(-sims, kk - 1, axis=0)[:kk]  # (kk, Q)
    else:
        top = np.tile(np.arange(n)[:, None], (1, q))
    scores = np.take_along_axis(sims, top, axis=0) if kk else np.empty((0, q))
    return pa.table(
        {
            "query_id": pa.array(np.repeat(qids.astype(np.int64), kk)),
            "vec_id": pa.array(bid[top.T.reshape(-1)].astype(np.int64)),
            "cosine": pa.array(scores.T.reshape(-1).astype(np.float64)),
        }
    )


def _final_topk(k: int, exclude_self: bool):
    def reduce_group(g: pa.Table) -> pa.Table:
        q = g["query_id"].to_numpy(zero_copy_only=False)
        v = g["vec_id"].to_numpy(zero_copy_only=False)
        s = g["cosine"].to_numpy(zero_copy_only=False)
        mask = np.ones(len(g), dtype=bool)
        if exclude_self:
            mask = v != q
        # deterministic: sort by (-cosine, vec_id)
        order = np.lexsort((v[mask], -s[mask]))[:k]
        vv, ss = v[mask][order], s[mask][order]
        return pa.table(
            {
                "query_id": pa.array([int(q[0])] * len(vv), pa.int64()),
                "vec_id": pa.array(vv, pa.int64()),
                "rank": pa.array(np.arange(1, len(vv) + 1, dtype=np.int64)),
                "cosine": pa.array(ss, pa.float64()),
            }
        )

    return reduce_group


def brute_force_topk(
    ds,
    queries: np.ndarray,
    query_ids: np.ndarray,
    *,
    k: int = 10,
    exclude_self: bool = True,
    id_col: str = "vec_id",
    vec_col: str = "embedding",
    config: EngineConfig = DEFAULT,
):
    """Exact cosine top-k; returns Dataset (query_id, vec_id, rank, cosine)."""
    import ray

    qref = ray.put((_normalize(queries), query_ids.astype(np.int64)))

    def local(batch: pa.Table) -> pa.Table:
        qn, qids = ray.get(qref)
        v = vec_matrix(batch[vec_col])
        bid = batch[id_col].to_numpy(zero_copy_only=False).astype(np.int64)
        vn = _normalize(v)
        sims = vn @ qn.T  # (b, Q)
        return _topk_rows(sims, bid, qids, k + (1 if exclude_self else 0))

    local_ds = ds.map_batches(local, batch_format="pyarrow", batch_size=config.batch_size)
    return local_ds.groupby("query_id").map_groups(_final_topk(k, exclude_self), batch_format="pyarrow")


def kmeans_fit(sample: np.ndarray, n_clusters: int, *, iters: int = 10, seed: int = 11) -> np.ndarray:
    """Plain deterministic Lloyd k-means on a (normalized) sample."""
    x = _normalize(sample)
    rng = np.random.default_rng(seed)
    cent = x[rng.choice(len(x), size=min(n_clusters, len(x)), replace=False)]
    for _ in range(iters):
        assign = np.argmax(x @ cent.T, axis=1)
        for c in range(len(cent)):
            pts = x[assign == c]
            if len(pts):
                v = pts.mean(axis=0)
                cent[c] = v / max(np.linalg.norm(v), 1e-12)
    return cent


def kmeans_fit_streaming(
    ds,
    n_clusters: int,
    *,
    vec_col: str = "embedding",
    iters: int = 10,
    seed: int = 11,
    init_sample_rows: int = 4096,
    config: EngineConfig = DEFAULT,
) -> np.ndarray:
    """Distributed Lloyd k-means over a Dataset — the scale path for the
    coarse quantizer that ``kmeans_fit`` trains on a driver sample.

    Per iteration: broadcast the (K, d) centroids once (``ray.put``), each
    batch computes assignments with one matmul and emits ONE partial row —
    per-centroid float64 sums (K·d) plus counts (K) via ``np.add.at`` — and
    the driver folds the O(blocks) partials into the next centroids. One
    streaming pass per iteration, no shuffle, nothing driver-side except
    the (K, d) reduce; at 100 TB each pass is scan-bound. Centroids are
    L2-normalized each round (spherical k-means, cosine geometry —
    matching ``kmeans_fit``/IVF). Determinism: partial sums are exact per
    batch; the cross-block fold is float64 addition whose order Ray does
    not fix, so centroids are reproducible to ~1 ulp, not bitwise.
    """
    import ray

    init = ds.limit(init_sample_rows).take_batch(init_sample_rows, batch_format="pyarrow")
    x0 = _normalize(vec_matrix(init[vec_col]))
    rng = np.random.default_rng(seed)
    cent = x0[rng.choice(len(x0), size=min(n_clusters, len(x0)), replace=False)].copy()
    k, d = cent.shape

    for _ in range(iters):
        cref = ray.put(cent)

        def partial(batch: pa.Table) -> pa.Table:
            c = ray.get(cref)
            vn = _normalize(vec_matrix(batch[vec_col]))
            assign = np.argmax(vn @ c.T, axis=1)
            sums = np.zeros((k, d), dtype=np.float64)
            np.add.at(sums, assign, vn)
            counts = np.bincount(assign, minlength=k).astype(np.int64)
            return pa.table(
                {
                    "sums": pa.array([sums.reshape(-1)], pa.list_(pa.float64())),
                    "counts": pa.array([counts], pa.list_(pa.int64())),
                }
            )

        tot = np.zeros((k, d), dtype=np.float64)
        cnt = np.zeros(k, dtype=np.int64)
        part_ds = ds.map_batches(partial, batch_format="pyarrow", batch_size=config.batch_size)
        for b in part_ds.iter_batches(batch_size=None, batch_format="pyarrow"):
            tot += vec_matrix(b["sums"]).sum(axis=0).reshape(k, d)
            cnt += vec_matrix(b["counts"], dtype=np.int64).sum(axis=0)
        live = cnt > 0
        cent[live] = tot[live] / np.maximum(
            np.linalg.norm(tot[live], axis=1, keepdims=True), 1e-12
        )
    return cent


def ivf_prune(
    vn: np.ndarray, bid: np.ndarray, cent: np.ndarray, allowed_by_cluster: np.ndarray
) -> tuple[np.ndarray, np.ndarray, np.ndarray]:
    """Assign rows to centroids and DROP every row outside the union of
    probed clusters BEFORE any query scoring. Returns the surviving
    (vectors, ids, per-row allowed mask (b', Q)). Split out so tests can
    assert the scored-row count is strictly below brute force."""
    assign = np.argmax(vn @ cent.T, axis=1)  # (b,) — the IVF assignment cost
    keep = allowed_by_cluster[assign].any(axis=1)  # row in ANY query's probes
    return vn[keep], bid[keep], allowed_by_cluster[assign[keep]]


def add_centroid_assignment(
    ds,
    centroids: np.ndarray,
    *,
    vec_col: str = "embedding",
    out_col: str = "centroid",
    config: EngineConfig = DEFAULT,
):
    """Persist each vector's nearest-centroid id as a column — the IVF build
    step. Written once (e.g. into a table clustered/partitioned by it), it
    turns every later ``ivf_topk(assign_col=...)`` into pure scan-side work:
    no per-batch assignment matmul, and with per-file centroid stats the
    scan prunes whole files for the probed clusters."""
    import ray

    cent = _normalize(centroids)
    cref = ray.put(cent)

    def assign(batch: pa.Table) -> pa.Table:
        c = ray.get(cref)
        v = vec_matrix(batch[vec_col])
        a = np.argmax(_normalize(v) @ c.T, axis=1).astype(np.int32)
        return batch.append_column(out_col, pa.array(a))

    return ds.map_batches(assign, batch_format="pyarrow", batch_size=config.batch_size)


def ivf_topk(
    ds,
    queries: np.ndarray,
    query_ids: np.ndarray,
    centroids: np.ndarray,
    *,
    k: int = 10,
    nprobe: int = 4,
    exclude_self: bool = True,
    id_col: str = "vec_id",
    vec_col: str = "embedding",
    assign_col: str | None = None,
    config: EngineConfig = DEFAULT,
):
    """IVF-style ANN: only rows whose centroid is in SOME query's nprobe
    nearest centroid set are scored — rows outside the probed-cluster union
    are dropped before the query matmul, so per-row cost is the (b × C)
    assignment instead of the (b × Q) brute-force scoring (C = #centroids).
    At full scale, persist the assignment as a table column (cluster the
    table by it) and the per-batch assignment matmul disappears too: the
    scan prunes whole files by centroid id. Approximate (recall < 1)."""
    import ray

    qn = _normalize(queries)
    cent = _normalize(centroids)
    probe = np.argsort(-(qn @ cent.T), axis=1)[:, :nprobe]  # (Q, nprobe)
    # (C, Q) bool: cluster c probed by query q — one table lookup per row
    allowed_by_cluster = np.zeros((len(cent), len(qn)), dtype=bool)
    for qi in range(len(qn)):
        allowed_by_cluster[probe[qi], qi] = True
    qref = ray.put((qn, query_ids.astype(np.int64), cent, allowed_by_cluster))

    def local(batch: pa.Table) -> pa.Table:
        qn_, qids, cent_, allowed_ = ray.get(qref)
        bid = batch[id_col].to_numpy(zero_copy_only=False).astype(np.int64)
        if assign_col is not None and assign_col in batch.schema.names:
            # precomputed assignment (add_centroid_assignment): prune by the
            # stored column BEFORE even decoding the pruned-away vectors
            assign = batch[assign_col].to_numpy(zero_copy_only=False).astype(np.int64)
            keep = allowed_[assign].any(axis=1)
            sub = batch.filter(pa.array(keep))
            vn_s = _normalize(vec_matrix(sub[vec_col])) if sub.num_rows else np.empty((0, qn_.shape[1]))
            bid_s = bid[keep]
            allowed_rows = allowed_[assign[keep]]
        else:
            v = vec_matrix(batch[vec_col])
            vn_s, bid_s, allowed_rows = ivf_prune(_normalize(v), bid, cent_, allowed_)
        if len(vn_s) == 0:
            return pa.table(
                {
                    "query_id": pa.array([], pa.int64()),
                    "vec_id": pa.array([], pa.int64()),
                    "cosine": pa.array([], pa.float64()),
                }
            )
        sims = vn_s @ qn_.T  # (b', Q) — pruned rows only
        sims = np.where(allowed_rows, sims, -2.0)  # per-query probe mask
        return _topk_rows(sims, bid_s, qids, k + (1 if exclude_self else 0))

    local_ds = ds.map_batches(local, batch_format="pyarrow", batch_size=config.batch_size)
    out = local_ds.groupby("query_id").map_groups(_final_topk(k, exclude_self), batch_format="pyarrow")

    def drop_masked(batch: pa.Table) -> pa.Table:
        import pyarrow.compute as pc

        return batch.filter(pc.greater(batch["cosine"], -1.5))

    return out.map_batches(drop_masked, batch_format="pyarrow")
