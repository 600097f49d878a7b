"""HyperLogLog sketch + exact group quantiles (stages/sketch.py)."""

import numpy as np
import pyarrow as pa

from e2e_ocsf_cyber_lakehouse_blueprint_ray.stages import sketch


def test_hll_error_bound():
    # 200k distinct int64 values; p=14 -> sigma ~0.81%, assert within 3 sigma
    vals = pa.table({"x": pa.array(np.arange(200_000, dtype=np.int64))})
    reg = sketch.hll_registers(sketch._hash64(vals["x"]), p=14)
    est = sketch.hll_estimate(reg)
    assert abs(est / 200_000 - 1.0) < 0.025


def test_hll_merge_equals_single_pass():
    rng = np.random.default_rng(3)
    vals = rng.integers(0, 10**12, 50_000)
    h = sketch._hash64(pa.table({"x": pa.array(vals)})["x"])
    whole = sketch.hll_registers(h, p=12)
    parts = [sketch.hll_registers(h[i::4], p=12) for i in range(4)]
    assert np.array_equal(sketch.hll_merge(parts), whole)


def test_hll_small_range_linear_counting():
    vals = pa.table({"x": pa.array(np.arange(300, dtype=np.int64))})
    reg = sketch.hll_registers(sketch._hash64(vals["x"]), p=14)
    est = sketch.hll_estimate(reg)
    assert abs(est - 300) < 10  # linear-counting regime is near-exact here


def test_distinct_count_hll_dataset(ray_session):
    import ray.data as rd

    t = pa.table({"k": pa.array(np.arange(20_000, dtype=np.int64) % 5_000)})
    out = sketch.distinct_count_hll(rd.from_arrow(t), "k")
    est = out["n_distinct_est"][0].as_py()
    assert abs(est / 5_000 - 1.0) < 0.03


def test_group_quantiles_disc(ray_session):
    import ray.data as rd

    rng = np.random.default_rng(7)
    g = rng.integers(0, 4, 2_000)
    v = rng.normal(size=2_000)
    t = pa.table({"grp": pa.array([f"g{i}" for i in g]), "value": pa.array(v)})
    out = sketch.group_quantiles_disc(rd.from_arrow(t), "grp", "value").to_pandas()
    out = out.set_index("grp").sort_index()
    for gi in range(4):
        vals = np.sort(v[g == gi])
        n = len(vals)
        for q, name in ((0.5, "p50"), (0.95, "p95"), (0.99, "p99")):
            expect = vals[min(n - 1, int(np.ceil(q * n)) - 1)]
            assert out.loc[f"g{gi}", name] == expect


def test_frequent_tokens_exact_with_planted_hitters(ray_session):
    import collections

    import numpy as np
    import ray.data as rd

    from e2e_ocsf_cyber_lakehouse_blueprint_ray.stages import sketch

    rng = np.random.default_rng(13)
    docs = []
    # long-tail vocabulary + two planted heavy hitters
    for i in range(600):
        words = [f"w{rng.integers(0, 3000)}" for _ in range(20)]
        if i % 3 == 0:
            words += ["hot"] * 4
        if i % 5 == 0:
            words += ["warm"] * 3
        docs.append(" ".join(words))
    t = pa.table({"text": pa.array(docs)})
    ds = rd.from_arrow(t).repartition(9)

    phi = 0.02
    got = sketch.frequent_tokens(ds, phi=phi, m=128)

    counts = collections.Counter(w for d in docs for w in d.split())
    total = sum(counts.values())
    import math

    thresh = math.ceil(phi * total)
    expected = sorted(
        ((w, c) for w, c in counts.items() if c >= thresh), key=lambda x: (-x[1], x[0])
    )
    assert list(zip(got["token"].to_pylist(), got["n_total"].to_pylist())) == expected
    assert "hot" in got["token"].to_pylist()


def test_mg_compress_guarantee():
    import numpy as np

    from e2e_ocsf_cyber_lakehouse_blueprint_ray.stages import sketch

    rng = np.random.default_rng(1)
    counts = rng.integers(1, 100, 500).astype(np.int64)
    keys = np.array([f"k{i}" for i in range(500)], dtype=object)
    m = 32
    k2, c2 = sketch.mg_compress(keys, counts, m)
    assert len(k2) <= m
    # every surviving counter underestimates by the same bounded pivot
    orig = dict(zip(keys.tolist(), counts.tolist()))
    pivot = {orig[k] - c for k, c in zip(k2.tolist(), c2.tolist())}
    assert len(pivot) == 1 and pivot.pop() <= counts.sum() // (m + 1)


def test_global_quantile_disc_matches_duckdb(ray_session):
    import duckdb
    import numpy as np
    import ray.data as rd

    from e2e_ocsf_cyber_lakehouse_blueprint_ray.stages import sketch

    rng = np.random.default_rng(7)
    cases = [
        np.r_[rng.normal(10, 5, 20000), rng.uniform(-100, -50, 3000), np.full(500, 3.25)],
        np.full(5000, 42.0),                       # constant column
        np.r_[np.full(4000, -1.5), np.full(4000, 2.5)],  # two values
        rng.uniform(0, 1e-9, 9000),                # tiny magnitudes, one bucket
    ]
    qs = [0.01, 0.25, 0.5, 0.75, 0.99]
    for vals in cases:
        t = pa.table({"v": pa.array(vals, pa.float64())})
        ds = rd.from_arrow(t).repartition(6)
        # tiny max_candidates forces the multi-pass radix refinement
        got = sketch.global_quantile_disc(ds, "v", qs, max_candidates=64)
        con = duckdb.connect()
        con.register("t", t)
        exp = con.execute(f"SELECT quantile_disc(v, {qs}) FROM t").fetchone()[0]
        assert got["value"].to_pylist() == exp  # bit-exact stored values
