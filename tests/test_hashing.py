import numpy as np
import pyarrow as pa

from e2e_ocsf_cyber_lakehouse_blueprint_ray import hashing as hx


def test_hash64_stable_and_vectorized():
    arr = pa.array(["a", "b", "a", None, "c"])
    out = hx.hash64_column(arr)
    assert out.dtype == np.uint64
    assert out[0] == out[2] == hx.hash64_str("a")
    assert out[0] != out[1]


def test_morton_matches_scalar_reference():
    rng = np.random.default_rng(7)
    a = rng.integers(0, 2**32, 200, dtype=np.uint64)
    b = rng.integers(0, 2**32, 200, dtype=np.uint64)
    fast = hx.morton2(a, b)
    for i in range(200):
        assert int(fast[i]) == hx.morton2_scalar(int(a[i]), int(b[i]))


def test_morton_orders_nearby_points_together():
    # same conv hash, increasing ts-bucket → strictly increasing keys
    a = np.full(10, 12345, dtype=np.uint64)
    b = np.arange(10, dtype=np.uint64)
    k = hx.morton2(a, b)
    assert (np.diff(k.astype(np.int64)) > 0).all()


def test_hilbert_roundtrip():
    rng = np.random.default_rng(3)
    for order in (8, 16, 32):
        x = rng.integers(0, 2**order, 500, dtype=np.uint64)
        y = rng.integers(0, 2**order, 500, dtype=np.uint64)
        d = hx.hilbert_xy2d(order, x, y)
        x2, y2 = hx.hilbert_d2xy(order, d)
        assert (x == x2).all() and (y == y2).all()


def test_hilbert_distinct_and_bounded():
    order = 8
    xs, ys = np.meshgrid(np.arange(2**order), np.arange(4))
    d = hx.hilbert_xy2d(order, xs.ravel().astype(np.uint64), ys.ravel().astype(np.uint64))
    assert len(set(d.tolist())) == d.size
    assert int(d.max()) < 4 ** order


def test_curve_key_both_curves():
    h = np.array([hx.hash64_str("conv-1"), hx.hash64_str("conv-2")], dtype=np.uint64)
    ts = np.array([0, 3_600_000_000], dtype=np.int64)
    for c in ("zorder", "hilbert"):
        k = hx.curve_key(h, ts, bucket_s=3600, curve=c)
        assert k.dtype == np.uint64 and len(k) == 2


def test_morton_nd_matches_scalar_reference():
    import numpy as np
    import pytest

    from e2e_ocsf_cyber_lakehouse_blueprint_ray import hashing

    rng = np.random.default_rng(5)
    for nd in (2, 3, 4):
        bits = 63 // nd
        coords = [
            rng.integers(0, 1 << bits, 200).astype(np.uint64) for _ in range(nd)
        ]
        got = hashing.morton_nd(coords, bits)

        def scalar(vals):
            out = 0
            for b in range(bits):
                for d, v in enumerate(vals):
                    out |= ((int(v) >> b) & 1) << (b * nd + d)
            return out

        exp = [scalar([c[i] for c in coords]) for i in range(200)]
        assert got.tolist() == exp
    with pytest.raises(ValueError):
        hashing.morton_nd([np.zeros(1, np.uint64)] * 5, 16)
