"""Multi-writer / isolation semantics: concurrent appends serialized by the
metastore actor (the reference's 15-flows→6-sinks Delta concurrency,
gold_ocsf_iam_event_classes_delta_sinks.py:184-305) and optimistic-commit
conflict handling between racing maintenance jobs."""

import pyarrow as pa
import pytest

from e2e_ocsf_cyber_lakehouse_blueprint_ray import config as cfg, synth
from e2e_ocsf_cyber_lakehouse_blueprint_ray.schema import TRANSCRIPT, TRANSCRIPT_STATS_COLS
from e2e_ocsf_cyber_lakehouse_blueprint_ray.stages import compact
from e2e_ocsf_cyber_lakehouse_blueprint_ray.table import ConflictError, Table

CONF = cfg.test_config()


def test_concurrent_appends_via_metastore_actor(tmp_table_dir, ray_session):
    import ray

    data = synth.transcripts(0.001)
    t = Table.create(
        tmp_table_dir,
        TRANSCRIPT,
        partition_spec=f"hash:conv_id:{CONF.num_partitions}",
        config=CONF,
        stats_cols=TRANSCRIPT_STATS_COLS,
    )

    @ray.remote
    def writer(i: int, table_dir: str, payload: dict) -> int:
        tt = Table(table_dir, CONF)
        chunk = pa.Table.from_pydict(payload, schema=TRANSCRIPT)
        return tt.write_table(
            chunk, rows_per_file=200, operation=f"append-{i}", name_prefix=f"w{i}", use_actor=True
        )

    n_writers = 6
    per = data.num_rows // n_writers
    sids = ray.get(
        [
            writer.remote(i, t.dir, data.slice(i * per, per).to_pydict())
            for i in range(n_writers)
        ]
    )
    # every commit got a distinct snapshot id, all rows landed exactly once
    assert len(set(sids)) == n_writers
    assert t.current_snapshot_id() == max(sids)
    assert t.read_arrow().num_rows == per * n_writers


def test_concurrent_file_based_commits_do_not_lose_appends(tmp_table_dir, ray_session):
    """Optimistic file-based protocol (no actor): append-only commits from
    parallel tasks retry on id collision and never drop files."""
    import ray

    t = Table.create(
        tmp_table_dir,
        TRANSCRIPT,
        partition_spec="none",
        config=CONF,
        stats_cols=TRANSCRIPT_STATS_COLS,
    )
    data = synth.transcripts(0.001).slice(0, 600)

    @ray.remote
    def writer(i: int, table_dir: str, payload: dict) -> int:
        tt = Table(table_dir, CONF)
        chunk = pa.Table.from_pydict(payload, schema=TRANSCRIPT)
        return tt.write_table(chunk, rows_per_file=100, operation=f"a{i}", name_prefix=f"f{i}")

    sids = ray.get(
        [writer.remote(i, t.dir, data.slice(i * 100, 100).to_pydict()) for i in range(6)]
    )
    assert sorted(sids) == list(range(1, 7))
    assert t.read_arrow().num_rows == 600


def test_racing_compactions_conflict_cleanly(tmp_table_dir, ray_session):
    """Two maintenance jobs planning against the same parent: the second
    commit must fail with ConflictError (its removed files are gone), never
    corrupt the table."""
    data = synth.transcripts(0.001)
    t = Table.create(
        tmp_table_dir,
        TRANSCRIPT,
        partition_spec=f"hash:conv_id:{CONF.num_partitions}",
        config=CONF,
        stats_cols=TRANSCRIPT_STATS_COLS,
    )
    t.write_table(data, rows_per_file=300)
    parent = t.current_snapshot_id()
    ents = t.entries()
    # job A commits a compaction normally
    compact.compact(t)
    # job B (stale plan against the old parent) tries to remove now-dead files
    with pytest.raises(ConflictError):
        t.commit(
            added=None,
            removed=ents["path"].to_pylist()[:2],
            operation="stale-compact",
            expected_parent=parent,
        )
    # table unharmed
    from tests.test_table import sorted_scan

    import pyarrow.compute as pc

    expect = data.take(
        pc.sort_indices(data, sort_keys=[("conv_id", "ascending"), ("turn_idx", "ascending")])
    )
    assert sorted_scan(t).equals(expect)


def test_mixed_op_storm_consistency(tmp_table_dir, ray_session):
    """Appends + deletes + compactions + merges racing through the
    metastore actor: every op either commits atomically or raises
    ConflictError cleanly — the final scan equals replaying the COMMITTED
    ops' semantics, with no lost rows, duplicates, or dangling files."""
    import os

    import numpy as np
    import pyarrow.compute as pc
    import ray

    from e2e_ocsf_cyber_lakehouse_blueprint_ray.stages import delete as delete_mod
    from e2e_ocsf_cyber_lakehouse_blueprint_ray.stages import merge as merge_mod

    data = synth.transcripts(0.001)
    t = Table.create(
        tmp_table_dir,
        TRANSCRIPT,
        partition_spec=f"hash:conv_id:{CONF.num_partitions}",
        config=CONF,
        stats_cols=TRANSCRIPT_STATS_COLS,
    )
    base = data.slice(0, 6000)
    t.write_table(base, rows_per_file=300)
    ts64 = np.sort(base["ts"].cast(pa.int64()).to_numpy(zero_copy_only=False))
    lo, hi = int(ts64[500]), int(ts64[1000])

    extra = data.slice(6000, 1000)
    # shift appended rows' ts far past the delete range so the append/delete
    # commit order cannot change which rows the delete matches
    extra = extra.set_column(
        extra.schema.get_field_index("ts"),
        "ts",
        pa.compute.add(extra["ts"].cast(pa.int64()), 10**15).cast(pa.timestamp("us")),
    )

    @ray.remote
    def do_append(table_dir):
        tt = Table(table_dir, CONF)
        return ("append", tt.write_table(extra, rows_per_file=200, name_prefix="storm", use_actor=True))

    @ray.remote
    def do_compact(table_dir):
        tt = Table(table_dir, CONF)
        try:
            return ("compact", compact.compact(tt, use_actor=True))
        except ConflictError:
            return ("compact", None)

    @ray.remote
    def do_delete(table_dir):
        tt = Table(table_dir, CONF)
        try:
            return ("delete", delete_mod.delete_where(tt, "ts", lo, hi, use_actor=True))
        except ConflictError:
            return ("delete", None)

    @ray.remote
    def do_merge(table_dir):
        tt = Table(table_dir, CONF)
        src = synth.merge_source(base.slice(0, 2000))
        try:
            return ("merge", merge_mod.merge(tt, src, use_actor=True))
        except ConflictError:
            return ("merge", None)

    results = ray.get(
        [do_append.remote(t.dir), do_compact.remote(t.dir),
         do_delete.remote(t.dir), do_merge.remote(t.dir)]
    )
    outcomes = dict(results)
    assert outcomes["append"] is not None  # appends never conflict

    got = t.read_arrow()
    # structural invariants that hold under ANY commit interleaving:
    # no duplicate (conv_id, turn_idx, text) keys beyond the base multiset,
    # appended rows all present, manifest references only existing files
    key = pc.binary_join_element_wise(
        got["conv_id"], pc.cast(got["turn_idx"], pa.string()), got["text"], "\x1f"
    )
    assert len(set(key.to_pylist())) == got.num_rows, "duplicate rows leaked"
    extra_keys = set(
        pc.binary_join_element_wise(
            extra["conv_id"], pc.cast(extra["turn_idx"], pa.string()), extra["text"], "\x1f"
        ).to_pylist()
    )
    assert extra_keys <= set(key.to_pylist()), "appended rows lost"
    for p in t.entries()["path"].to_pylist():
        assert os.path.exists(os.path.join(t.dir, p))
    # row count equals replaying the COMMITTED ops in commit (snapshot-id)
    # order on the driver — apply_merge_expected is a generic upsert, so the
    # replay is order-faithful whichever op won the race
    committed = sorted(
        (sid, name) for name, sid in outcomes.items()
        if name in ("merge", "delete") and sid is not None
    )
    expected = base
    for _, name in committed:
        if name == "merge":
            expected = synth.apply_merge_expected(
                expected, synth.merge_source(base.slice(0, 2000))
            )
        else:
            e64 = expected["ts"].cast(pa.int64())
            expected = expected.filter(pc.or_(pc.less(e64, lo), pc.greater(e64, hi)))
    assert got.num_rows == expected.num_rows + extra.num_rows
