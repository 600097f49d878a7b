"""Skew safety (FIXTURES.md §4 invariant 6): hot conversations route through
salted repartitioning, spread across shards, and the scan-order invariant
survives."""

import numpy as np
import pyarrow as pa
import pyarrow.compute as pc

from e2e_ocsf_cyber_lakehouse_blueprint_ray import config as cfg, synth
from e2e_ocsf_cyber_lakehouse_blueprint_ray.stages import repartition

CONF = cfg.test_config(salt_chunk_rows=16)  # sf0.001 hot convs have 50 turns


def test_hot_conv_spreads_across_shards():
    base = synth.transcripts(0.001)
    hot = base.filter(pc.equal(base["conv_id"], "conv-00000000"))
    assert hot.num_rows > CONF.salt_chunk_rows  # hot conv exceeds one salt chunk
    shards = repartition.salted_shard(hot, num_shards=32, salt_chunk_rows=CONF.salt_chunk_rows)
    assert len(set(shards.tolist())) > 1  # hot conv salted across shards
    # a normal-size conv stays on ONE shard
    cold = base.filter(pc.equal(base["conv_id"], "conv-00000100"))
    cold_shards = repartition.salted_shard(
        cold, num_shards=32, salt_chunk_rows=CONF.salt_chunk_rows
    )
    assert len(set(cold_shards.tolist())) == 1


def test_salted_chunks_are_contiguous_turn_ranges():
    base = synth.transcripts(0.001)
    hot = base.filter(pc.equal(base["conv_id"], "conv-00000001"))
    hot = hot.take(pc.sort_indices(hot, sort_keys=[("turn_idx", "ascending")]))
    shards = repartition.salted_shard(hot, num_shards=32, salt_chunk_rows=CONF.salt_chunk_rows)
    turn = hot["turn_idx"].to_numpy(zero_copy_only=False)
    # same salt bucket ⇔ same turn_idx // chunk → shard changes exactly at
    # chunk boundaries
    expect = turn // CONF.salt_chunk_rows
    assert (np.diff(shards) != 0).sum() == (np.diff(expect) != 0).sum()


def test_salted_map_shards_preserves_multiset_and_order(ray_session):
    import ray.data as rd

    base = synth.transcripts(0.001)
    ds = rd.from_arrow(base)

    def check_sorted(t: pa.Table) -> pa.Table:
        idx = pc.sort_indices(
            t, sort_keys=[("conv_id", "ascending"), ("turn_idx", "ascending")]
        )
        assert t.equals(t.take(idx))  # fn receives shard pre-sorted
        return t

    out_rows = repartition.salted_map_shards(ds, check_sorted, config=CONF).take_all()
    got = pa.Table.from_pylist(out_rows, schema=base.schema)
    got = got.take(
        pc.sort_indices(got, sort_keys=[("conv_id", "ascending"), ("turn_idx", "ascending")])
    )
    expect = base.take(
        pc.sort_indices(base, sort_keys=[("conv_id", "ascending"), ("turn_idx", "ascending")])
    )
    assert got.equals(expect)


def test_sessionize_pipeline_is_skew_exact(ray_session, tmp_path):
    """Query-path skew test (round-1 verdict item): a HOT user whose events
    span many blocks still sessionizes exactly — the sort+segment-merge
    pipeline never needs the whole user in one task."""
    import pyarrow.parquet as pq

    from e2e_ocsf_cyber_lakehouse_blueprint_ray.pipelines.queries import q_events_sessionize

    rng = np.random.default_rng(3)
    n_hot, n_cold_users, per_cold = 20_000, 50, 40
    # hot user 1: gaps alternating small/large around the 1800s boundary
    gaps = rng.choice([60, 120, 2000, 5000], size=n_hot - 1).astype(np.int64)
    ts_hot = 1_700_000_000_000_000 + np.r_[0, np.cumsum(gaps * 1_000_000)]
    users = [1] * n_hot
    ts = list(ts_hot)
    for u in range(2, 2 + n_cold_users):
        start = 1_700_000_000_000_000 + u * 10**9
        for i in range(per_cold):
            users.append(u)
            ts.append(start + i * 600 * 1_000_000)  # 10-min gaps: one session
    event_id = np.arange(len(users), dtype=np.int64)
    t = pa.table(
        {
            "user_id": pa.array(users, pa.int64()),
            "event_id": pa.array(event_id),
            "ts": pa.array(np.array(ts, dtype=np.int64)).cast(pa.timestamp("us")),
            # extra cols so the parquet read matches the query's column pruning
            "event_type": pa.array(["click"] * len(users)),
            "value": pa.array(np.zeros(len(users))),
            "props": pa.array(["{}"] * len(users)),
        }
    )
    pq.write_table(t, str(tmp_path / "events.parquet"))
    got = {r["user_id"]: (r["n_events"], r["n_sessions"])
           for r in q_events_sessionize(str(tmp_path)).take_all()}
    exp_hot_sessions = 1 + int((gaps > 1800).sum())
    assert got[1] == (n_hot, exp_hot_sessions)
    for u in range(2, 2 + n_cold_users):
        assert got[u] == (per_cold, 1)


def test_render_conversations_merges_multiblock_conv(ray_session):
    import ray.data as rd

    from e2e_ocsf_cyber_lakehouse_blueprint_ray.pipelines import derive

    # one hot conv spread over 4 input blocks + one cold conv, shuffled input
    n_hot = 1000
    hot = pa.table(
        {
            "conv_id": pa.array(["conv-hot"] * n_hot),
            "turn_idx": pa.array(np.arange(n_hot, dtype=np.int32)),
            "role": pa.array(["user", "assistant"] * (n_hot // 2)),
            "text": pa.array([f"turn {i}" for i in range(n_hot)]),
        }
    )
    cold = pa.table(
        {
            "conv_id": pa.array(["conv-cold"] * 2),
            "turn_idx": pa.array(np.array([1, 0], dtype=np.int32)),
            "role": pa.array(["assistant", "user"]),
            "text": pa.array(["second", "first"]),
        }
    )
    blocks = [hot.slice(i * 250, 250) for i in range(4)] + [cold]
    got = {r["conv_id"]: r for r in derive.render_conversations(rd.from_arrow(blocks)).take_all()}
    assert got["conv-cold"]["rendered"] == "user: first\nassistant: second"
    assert got["conv-cold"]["n_turns"] == 2
    roles = ["user", "assistant"] * (n_hot // 2)
    exp = "\n".join(f"{r}: turn {i}" for i, r in enumerate(roles))
    assert got["conv-hot"]["n_turns"] == n_hot
    assert got["conv-hot"]["rendered"] == exp
