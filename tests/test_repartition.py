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
