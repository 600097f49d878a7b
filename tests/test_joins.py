"""As-of / interval join kernels (stages/joins.py): the composite-rank
probe against a brute-force reference, the broadcast Dataset stage against
DuckDB's ASOF JOIN, and partitioned-path equivalence."""

import numpy as np
import pyarrow as pa
import pytest

from e2e_ocsf_cyber_lakehouse_blueprint_ray.stages import joins


def _brute_asof(rk, rts, lk, lt, direction, strict, tol):
    out = []
    for k, t in zip(lk, lt):
        cand = [
            (ts, i) for i, (k2, ts) in enumerate(zip(rk, rts))
            if k2 == k and (
                (ts < t if strict else ts <= t) if direction == "backward"
                else (ts > t if strict else ts >= t))
            and (tol is None or abs(t - ts) <= tol)
        ]
        if not cand:
            out.append(None)
        elif direction == "backward":
            out.append(max(cand)[0])
        else:
            out.append(min(cand)[0])
    return out


@pytest.mark.parametrize("direction", ["backward", "forward"])
@pytest.mark.parametrize("strict", [False, True])
@pytest.mark.parametrize("tol", [None, 5])
def test_asof_probe_matches_bruteforce(direction, strict, tol):
    rng = np.random.default_rng(7)
    n_r, n_l = 200, 300
    rk = rng.integers(0, 12, n_r)
    rts = rng.integers(0, 50, n_r)
    right = pa.table({"k": pa.array(rk, pa.int64()), "ts": pa.array(rts, pa.int64()),
                      "v": pa.array(rts * 10, pa.int64())})
    ix = joins.build_index(right, "k", "ts", ["v"])
    lk = rng.integers(0, 14, n_l)  # includes keys absent from the right
    lt = rng.integers(-5, 55, n_l)
    ok, idx = joins.asof_probe(ix, lk, lt, direction=direction,
                               tolerance_us=tol, strict=strict)
    expect = _brute_asof(rk, rts, lk, lt, direction, strict, tol)
    got = [int(ix.rts[i]) if o else None for o, i in zip(ok, idx)]
    assert got == expect


def test_interval_probe_matches_bruteforce():
    rng = np.random.default_rng(11)
    rk = rng.integers(0, 8, 150)
    rts = rng.integers(0, 40, 150)
    vals = rng.integers(0, 100, 150)
    right = pa.table({"k": pa.array(rk, pa.int64()), "ts": pa.array(rts, pa.int64()),
                      "v": pa.array(vals, pa.int64())})
    ix = joins.build_index(right, "k", "ts", ["v"])
    lk = rng.integers(0, 10, 200)
    lt = rng.integers(0, 45, 200)
    lo, hi = joins.interval_probe(ix, lk, lt, before_us=7, after_us=3)
    sums = joins.segment_sums(lo, hi, ix.payload["v"])
    li, ri = joins.expand_pairs(lo, hi)
    for row, (k, t) in enumerate(zip(lk, lt)):
        match = [(int(v)) for k2, ts, v in zip(rk, rts, vals)
                 if k2 == k and t - 7 <= ts <= t + 3]
        assert hi[row] - lo[row] == len(match)
        assert sums[row] == sum(match)
        pair_vals = sorted(int(ix.payload["v"][i]) for i in ri[li == row])
        assert pair_vals == sorted(match)


def test_asof_probe_empty_right():
    right = pa.table({"k": pa.array([], pa.int64()), "ts": pa.array([], pa.int64()),
                      "v": pa.array([], pa.int64())})
    ix = joins.build_index(right, "k", "ts", ["v"])
    ok, idx = joins.asof_probe(ix, np.array([1, 2]), np.array([10, 20]))
    assert not ok.any()
    lo, hi = joins.interval_probe(ix, np.array([1]), np.array([10]), before_us=5, after_us=5)
    assert (hi - lo == 0).all()
    assert joins._payload_array(ix.payload["v"], idx, ok, pa.int64()).null_count == 2


def _mk_tables(seed=3):
    rng = np.random.default_rng(seed)
    n_l, n_r = 400, 120
    left = pa.table({
        "id": pa.array(np.arange(n_l), pa.int64()),
        "k": pa.array(rng.integers(0, 15, n_l), pa.int64()),
        "ts": pa.array(rng.integers(0, 10_000, n_l), pa.int64()).cast(pa.timestamp("us")),
    })
    # dedupe right per (k, ts) so as-of ties are engine-independent
    right = pa.table({
        "k": pa.array(rng.integers(0, 12, n_r), pa.int64()),
        "ts": pa.array(rng.integers(0, 10_000, n_r), pa.int64()).cast(pa.timestamp("us")),
        "payload": pa.array(rng.integers(0, 10**6, n_r), pa.int64()),
    }).group_by(["k", "ts"]).aggregate([("payload", "max")]).rename_columns(
        ["k", "ts", "payload"])
    return left, right


def test_asof_join_broadcast_matches_duckdb(ray_session):
    import duckdb
    import ray.data as rd

    left, right = _mk_tables()
    out = joins.asof_join(rd.from_arrow(left), right, key="k", ts="ts",
                          payload=["payload"]).to_pandas().sort_values("id", ignore_index=True)
    con = duckdb.connect()
    con.register("l", left)
    con.register("r", right)
    exp = con.execute("""
        SELECT l.id, l.k, l.ts, r.payload
        FROM l ASOF LEFT JOIN r ON l.k = r.k AND l.ts >= r.ts
        ORDER BY l.id
    """).df()
    assert out["payload"].fillna(-1).tolist() == exp["payload"].fillna(-1).tolist()


def test_asof_partitioned_equals_broadcast(ray_session):
    import ray.data as rd

    left, right = _mk_tables(seed=9)
    bcast = joins.asof_join(rd.from_arrow(left), right, key="k", ts="ts",
                            payload=["payload"]).to_pandas()
    part = joins.asof_join_partitioned(
        rd.from_arrow(left), rd.from_arrow(right), key="k", ts="ts",
        payload=["payload"]).to_pandas()
    bcast = bcast.sort_values("id", ignore_index=True)
    part = part[bcast.columns].sort_values("id", ignore_index=True)
    assert part["payload"].fillna(-1).tolist() == bcast["payload"].fillna(-1).tolist()
    assert len(part) == len(bcast)


def test_interval_join_agg_stage(ray_session):
    import ray.data as rd

    rng = np.random.default_rng(5)
    n = 300
    ev = pa.table({
        "id": pa.array(np.arange(n), pa.int64()),
        "k": pa.array(rng.integers(0, 6, n), pa.int64()),
        "ts": pa.array(rng.integers(0, 500, n), pa.int64()),
        "v": pa.array(rng.integers(0, 50, n), pa.int64()),
    })
    out = joins.interval_join_agg(
        rd.from_arrow(ev.select(["id", "k", "ts"])), ev.select(["k", "ts", "v"]),
        key="k", ts="ts", before_us=20, after_us=0, sum_cols=("v",),
        keep_cols=["id"]).to_pandas().sort_values("id", ignore_index=True)
    kk = ev["k"].to_numpy()
    tt = ev["ts"].to_numpy()
    vv = ev["v"].to_numpy()
    for row in range(0, n, 37):
        m = (kk == kk[row]) & (tt >= tt[row] - 20) & (tt <= tt[row])
        assert out["n_win"][row] == m.sum()
        assert out["sum_v"][row] == vv[m].sum()


def _hj_fixture():
    rng = np.random.default_rng(7)
    lk = rng.integers(0, 40, 300)
    left = pa.table(
        {
            "k": pa.array(lk, pa.int64()),
            "lv": pa.array(np.arange(300, dtype=np.int64)),
            "name": pa.array([f"L{v}" for v in range(300)]),
        }
    )
    rk = rng.integers(10, 60, 120)  # keys 40-59 unmatched on left, 0-9 on right
    right = pa.table(
        {
            "k": pa.array(rk, pa.int64()),
            "rv": pa.array(np.arange(120, dtype=np.int64) * 10),
            "name": pa.array([f"R{v}" for v in range(120)]),  # collides with left
        }
    )
    return left, right


def _duck_join(left, right, how):
    import duckdb

    con = duckdb.connect()
    con.register("l", left)
    con.register("r", right)
    jt = {"inner": "JOIN", "left outer": "LEFT JOIN", "full outer": "FULL JOIN"}[how]
    q = f"""SELECT coalesce(l.k, r.k) AS k, l.lv, l.name, r.rv, r.name AS name_r
            FROM l {jt} r ON l.k = r.k"""
    return con.execute(q).arrow()


def _sorted_rows(t: pa.Table):
    cols = sorted(t.column_names)
    return sorted(zip(*[t[c].to_pylist() for c in cols]), key=lambda r: tuple((v is None, v) for v in r))


@pytest.mark.parametrize("how", ["inner", "left outer", "full outer"])
def test_hash_join_matches_duckdb(ray_session, how):
    import ray.data as rd

    left, right = _hj_fixture()
    got_ds = joins.hash_join(
        rd.from_arrow(left).repartition(5),
        rd.from_arrow(right).repartition(3),
        on="k",
        how=how,
        num_buckets=8,
    )
    got = pa.concat_tables(
        got_ds.iter_batches(batch_size=None, batch_format="pyarrow"),
        promote_options="default",
    )
    assert set(got.column_names) == {"k", "lv", "name", "rv", "name_r"}
    exp = _duck_join(left, right, how)
    assert got.num_rows == exp.num_rows
    assert _sorted_rows(got) == _sorted_rows(exp)


def test_hash_join_multi_key(ray_session):
    import duckdb
    import ray.data as rd

    left = pa.table(
        {
            "a": pa.array([1, 1, 2, 2, 3], pa.int64()),
            "b": pa.array(["x", "y", "x", "y", "x"]),
            "lv": pa.array([10, 11, 12, 13, 14], pa.int64()),
        }
    )
    right = pa.table(
        {
            "a": pa.array([1, 2, 2, 4], pa.int64()),
            "b": pa.array(["x", "y", "y", "x"]),
            "rv": pa.array([100, 200, 201, 400], pa.int64()),
        }
    )
    got_ds = joins.hash_join(
        rd.from_arrow(left), rd.from_arrow(right), on=["a", "b"], how="inner", num_buckets=4
    )
    got = pa.concat_tables(got_ds.iter_batches(batch_size=None, batch_format="pyarrow"))
    con = duckdb.connect()
    con.register("l", left)
    con.register("r", right)
    exp = con.execute("SELECT l.a, l.b, l.lv, r.rv FROM l JOIN r USING (a, b)").arrow()
    assert _sorted_rows(got) == _sorted_rows(exp)


def test_semi_and_anti_join_sql_semantics(ray_session):
    """Broadcast semi/anti join vs DuckDB EXISTS / NOT EXISTS, including
    null-key rows (semi drops them, anti keeps them) and duplicate keys on
    the key side (deduped — each left row emitted at most once)."""
    import duckdb
    import ray.data as rd

    left = pa.table(
        {
            "doc_id": pa.array([1, 2, 3, 4, None, 6], pa.int64()),
            "v": pa.array(["a", "b", "c", "d", "e", "f"]),
        }
    )
    keys = pa.array([2, 2, 4, None, 99], pa.int64())

    semi = joins.semi_join(rd.from_arrow(left), keys, on="doc_id").take_all()
    anti = joins.anti_join(rd.from_arrow(left), keys, on="doc_id").take_all()

    con = duckdb.connect()
    con.register("l", left)
    con.register("k", pa.table({"doc_id": keys}))
    exp_semi = con.sql(
        "SELECT * FROM l WHERE EXISTS (SELECT 1 FROM k WHERE k.doc_id = l.doc_id) ORDER BY doc_id"
    ).fetchall()
    exp_anti = con.sql(
        "SELECT * FROM l WHERE NOT EXISTS (SELECT 1 FROM k WHERE k.doc_id = l.doc_id) "
        "ORDER BY doc_id NULLS FIRST"
    ).fetchall()
    semi_rows = sorted([(r["doc_id"], r["v"]) for r in semi])
    anti_rows = sorted(
        [(r["doc_id"], r["v"]) for r in anti], key=lambda x: (x[0] is not None, x[0] or 0)
    )
    assert semi_rows == [tuple(r) for r in exp_semi]
    assert anti_rows == [tuple(r) for r in exp_anti]
    # key side as a Ray Dataset works too
    semi2 = joins.semi_join(
        rd.from_arrow(left), rd.from_arrow(pa.table({"doc_id": keys})), on="doc_id"
    ).take_all()
    assert sorted([(r["doc_id"], r["v"]) for r in semi2]) == semi_rows
