"""Ordering primitives (deterministic shuffle, sequence packing) and
test-set decontamination."""

import numpy as np
import pyarrow as pa
import pytest

from e2e_ocsf_cyber_lakehouse_blueprint_ray.stages import decontaminate, order, text

SF = "/root/testdata/sf0.001"


@pytest.fixture(scope="module")
def ids_ds(ray_session):
    import ray.data as rd

    return rd.read_parquet(f"{SF}/documents.parquet", columns=["doc_id"])


def test_shuffle_rank_is_a_permutation(ids_ds):
    rows = order.shuffle_rank(ids_ds, salt="s").take_all()
    ranks = sorted(r["rank"] for r in rows)
    assert ranks == list(range(len(rows)))
    # determinism: same salt → same rank per id
    again = {r["doc_id"]: r["rank"] for r in order.shuffle_rank(ids_ds, salt="s").take_all()}
    assert all(again[r["doc_id"]] == r["rank"] for r in rows)


def test_shuffle_rank_salt_reshuffles_and_is_partition_invariant(ray_session):
    import ray.data as rd

    t = pa.table({"doc_id": pa.array(range(200), pa.int64())})
    a = {r["doc_id"]: r["rank"] for r in order.shuffle_rank(rd.from_arrow(t), salt="e0").take_all()}
    b = {r["doc_id"]: r["rank"] for r in order.shuffle_rank(rd.from_arrow(t), salt="e1").take_all()}
    assert a != b  # salt change permutes
    # partition-invariance: many tiny blocks, same ranks
    many = rd.from_arrow(t).repartition(17)
    c = {r["doc_id"]: r["rank"] for r in order.shuffle_rank(many, salt="e0").take_all()}
    assert c == a


def test_pack_sequences_prefix_invariants(ray_session):
    import ray.data as rd

    rng = np.random.default_rng(7)
    n = rng.integers(1, 40, size=300).astype(np.int64)
    t = pa.table(
        {"doc_id": pa.array(range(300), pa.int64()), "n_tokens": pa.array(n, pa.int64())}
    )
    out = order.pack_sequences(
        rd.from_arrow(t).repartition(9), seq_len=64, docs_per_bucket=32
    ).take_all()
    out.sort(key=lambda r: r["doc_id"])
    # start_tok is the exclusive prefix sum in doc_id order
    expect = np.concatenate([[0], np.cumsum(n)[:-1]])
    got = np.array([r["start_tok"] for r in out])
    assert np.array_equal(got, expect)
    for r in out:
        assert r["pack_id"] == r["start_tok"] // 64
        assert r["pack_offset"] == r["start_tok"] % 64
        last_tok = r["start_tok"] + max(r["n_tokens"], 1) - 1
        assert r["n_spans"] == last_tok // 64 - r["pack_id"] + 1
        assert r["n_spans"] >= 1


def test_budget_select_longest_first_cutoff(ray_session):
    import ray.data as rd

    rng = np.random.default_rng(11)
    n = rng.integers(1, 50, size=200).astype(np.int64)
    t = pa.table(
        {"doc_id": pa.array(range(200), pa.int64()), "n_tokens": pa.array(n, pa.int64())}
    )
    budget = int(n.sum() // 3)
    out = order.budget_select(rd.from_arrow(t).repartition(7), budget=budget).take_all()
    # reference: greedy longest-first (ties by id), keep while running total < budget
    order_ids = sorted(range(200), key=lambda i: (-n[i], i))
    acc, expect = 0, set()
    for i in order_ids:
        if acc < budget:
            expect.add(i)
        acc += n[i]
    assert {r["doc_id"] for r in out} == expect
    # start_tok consistent with that order
    got = {r["doc_id"]: r["start_tok"] for r in out}
    acc = 0
    for i in order_ids:
        if i in got:
            assert got[i] == acc
        acc += n[i]


def test_stratified_topq_exact_quota_partition_invariant(ray_session):
    import hashlib

    import ray.data as rd

    from e2e_ocsf_cyber_lakehouse_blueprint_ray.stages import sample

    groups = [f"g{i % 3}" for i in range(90)]
    texts = [f"doc number {i} content" for i in range(90)]
    t = pa.table(
        {
            "doc_id": pa.array(range(90), pa.int64()),
            "lang": pa.array(groups, pa.string()),
            "text": pa.array(texts, pa.string()),
        }
    )
    out = sample.stratified_topq(
        rd.from_arrow(t).repartition(13), group_col="lang", q=5
    ).take_all()
    per = {}
    for r in out:
        per.setdefault(r["lang"], set()).add(r["doc_id"])
    assert all(len(v) == 5 for v in per.values()) and len(per) == 3
    # matches the driver-side definition: smallest (md5(text), id) per group
    for g in per:
        ids = [i for i in range(90) if groups[i] == g]
        ids.sort(key=lambda i: (hashlib.md5(texts[i].encode()).hexdigest(), i))
        assert per[g] == set(ids[:5])
    # partition invariance
    again = sample.stratified_topq(rd.from_arrow(t), group_col="lang", q=5).take_all()
    assert {(r["lang"], r["doc_id"]) for r in again} == {
        (r["lang"], r["doc_id"]) for r in out
    }


def test_repetition_stats_kernel():
    b = pa.table(
        {
            "doc_id": pa.array([0, 1, 2], pa.int64()),
            "text": pa.array(["a a a b", "x y z", ""], pa.string()),
        }
    )
    out = text.repetition_stats(b).to_pylist()
    assert out[0] == {
        "doc_id": 0, "n_tokens": 4, "n_distinct": 2, "top_count": 3, "top_frac": 0.75,
    }
    assert out[1]["n_distinct"] == 3 and out[1]["top_count"] == 1
    assert out[2]["n_tokens"] == 1  # "" splits to [''] like the SQL oracle


def test_decontaminate_planted_grams(ray_session):
    import ray.data as rd

    probe_text = "alpha beta gamma delta epsilon zeta eta theta iota kappa"
    docs = pa.table(
        {
            "doc_id": pa.array([0, 1, 2, 3], pa.int64()),
            "text": pa.array(
                [
                    probe_text,  # the probe doc
                    # contains tokens 1..8 of the probe (one 8-gram, 2 positions? no: 1 window)
                    "xx beta gamma delta epsilon zeta eta theta iota yy",
                    "totally clean text with no overlap at all here ok",
                    # contains two probe 8-gram positions (tokens 0..9 intact)
                    "pad " + probe_text + " pad",
                ],
                pa.string(),
            ),
        }
    )
    ds = rd.from_arrow(docs)
    probe = ds.map_batches(
        lambda b: b.filter(pa.compute.equal(b["doc_id"], 0)), batch_format="pyarrow"
    )
    train = ds.map_batches(
        lambda b: b.filter(pa.compute.not_equal(b["doc_id"], 0)), batch_format="pyarrow"
    )
    ref, n_grams = decontaminate.build_probe_set(probe, k=8)
    assert n_grams == 3  # 10 tokens → 3 sliding 8-grams
    out = {r["doc_id"]: r["n_contaminated"] for r in
           decontaminate.mark_contaminated(train, ref, k=8).take_all()}
    assert out == {1: 1, 2: 0, 3: 3}
    dropped = decontaminate.mark_contaminated(train, ref, k=8, drop_clean=True).take_all()
    assert sorted(r["doc_id"] for r in dropped) == [1, 3]


def test_rolling_sum_matches_duckdb_window(ray_session):
    """Per-key ROWS-window sums vs DuckDB's window function — including a
    hot key long enough to span many sorted blocks (the head/context
    stitching path)."""
    import duckdb
    import numpy as np
    import ray.data as rd

    from e2e_ocsf_cyber_lakehouse_blueprint_ray.stages import order as order_mod

    rng = np.random.default_rng(21)
    uid = np.r_[rng.integers(0, 25, 800), np.full(400, 7)]  # key 7 is hot
    seq = np.arange(len(uid))
    rng.shuffle(seq)  # arbitrary input order; op must sort
    t = pa.table(
        {
            "user_id": pa.array(uid[seq], pa.int64()),
            "seq": pa.array(seq, pa.int64()),
            "val": pa.array(rng.integers(-50, 50, len(uid))[seq], pa.int64()),
        }
    )
    for w in (1, 3, 8):
        got_ds = order_mod.rolling_sum(
            rd.from_arrow(t).repartition(11),
            key="user_id",
            order_cols=["seq"],
            value_col="val",
            window=w,
        )
        got = pa.concat_tables(
            got_ds.iter_batches(batch_size=None, batch_format="pyarrow"),
            promote_options="default",
        ).sort_by([("user_id", "ascending"), ("seq", "ascending")])
        con = duckdb.connect()
        con.register("t", t)
        exp = con.execute(
            f"""SELECT user_id, seq, val,
                       SUM(val) OVER (PARTITION BY user_id ORDER BY seq
                                      ROWS BETWEEN {w - 1} PRECEDING AND CURRENT ROW) AS rolling
                FROM t ORDER BY user_id, seq"""
        ).arrow()
        assert got.num_rows == exp.num_rows, f"w={w}"
        assert got["rolling"].to_pylist() == exp["rolling"].to_pylist(), f"w={w}"
        assert got["seq"].to_pylist() == exp["seq"].to_pylist(), f"w={w}"


def test_lag_matches_duckdb(ray_session):
    import duckdb
    import numpy as np
    import ray.data as rd

    from e2e_ocsf_cyber_lakehouse_blueprint_ray.stages import order as order_mod

    rng = np.random.default_rng(33)
    uid = np.r_[rng.integers(0, 20, 600), np.full(300, 4)]  # hot key 4
    seq = np.arange(len(uid))
    rng.shuffle(seq)
    t = pa.table(
        {
            "user_id": pa.array(uid[seq], pa.int64()),
            "seq": pa.array(seq, pa.int64()),
            "val": pa.array(rng.integers(0, 1000, len(uid))[seq], pa.int64()),
        }
    )
    for d in (1, 4):
        got_ds = order_mod.lag(
            rd.from_arrow(t).repartition(9),
            key="user_id", order_cols=["seq"], value_col="val", offset=d,
        )
        got = pa.concat_tables(
            got_ds.iter_batches(batch_size=None, batch_format="pyarrow"),
            promote_options="default",
        ).sort_by([("user_id", "ascending"), ("seq", "ascending")])
        con = duckdb.connect()
        con.register("t", t)
        exp = con.execute(
            f"""SELECT user_id, seq, val,
                       LAG(val, {d}) OVER (PARTITION BY user_id ORDER BY seq) AS lag
                FROM t ORDER BY user_id, seq"""
        ).arrow()
        assert got["lag"].to_pylist() == exp["lag"].to_pylist(), f"d={d}"


def test_lead_matches_duckdb(ray_session):
    import duckdb
    import numpy as np
    import ray.data as rd

    from e2e_ocsf_cyber_lakehouse_blueprint_ray.stages import order as order_mod

    rng = np.random.default_rng(44)
    uid = np.r_[rng.integers(0, 18, 500), np.full(250, 9)]
    seq = np.arange(len(uid))
    rng.shuffle(seq)
    t = pa.table(
        {
            "user_id": pa.array(uid[seq], pa.int64()),
            "seq": pa.array(seq, pa.int64()),
            "val": pa.array(rng.integers(0, 999, len(uid))[seq], pa.int64()),
        }
    )
    for d in (1, 3):
        got_ds = order_mod.lead(
            rd.from_arrow(t).repartition(8),
            key="user_id", order_cols=["seq"], value_col="val", offset=d,
        )
        got = pa.concat_tables(
            got_ds.iter_batches(batch_size=None, batch_format="pyarrow"),
            promote_options="default",
        ).sort_by([("user_id", "ascending"), ("seq", "ascending")])
        con = duckdb.connect()
        con.register("t", t)
        exp = con.execute(
            f"""SELECT user_id, seq, val,
                       LEAD(val, {d}) OVER (PARTITION BY user_id ORDER BY seq) AS lead
                FROM t ORDER BY user_id, seq"""
        ).arrow()
        assert got["lead"].to_pylist() == exp["lead"].to_pylist(), f"d={d}"
