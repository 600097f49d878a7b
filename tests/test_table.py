import json
import os

import pyarrow as pa
import pyarrow.compute as pc
import pytest

from e2e_ocsf_cyber_lakehouse_blueprint_ray import config as cfg
from e2e_ocsf_cyber_lakehouse_blueprint_ray import synth
from e2e_ocsf_cyber_lakehouse_blueprint_ray.schema import TRANSCRIPT, TRANSCRIPT_STATS_COLS
from e2e_ocsf_cyber_lakehouse_blueprint_ray.state import manifest
from e2e_ocsf_cyber_lakehouse_blueprint_ray.table import ConflictError, Table

CONF = cfg.test_config()


def make_table(d, data=None, rows_per_file=300):
    t = Table.create(
        d,
        TRANSCRIPT,
        partition_spec=f"hash:conv_id:{CONF.num_partitions}",
        config=CONF,
        stats_cols=TRANSCRIPT_STATS_COLS,
    )
    if data is not None:
        t.write_table(data, rows_per_file=rows_per_file)
    return t


def sorted_scan(t: Table, snapshot_id=None) -> pa.Table:
    out = t.read_arrow(snapshot_id=snapshot_id)
    idx = pc.sort_indices(out, sort_keys=[("conv_id", "ascending"), ("turn_idx", "ascending")])
    return out.take(idx)


def test_create_and_snapshot0(tmp_table_dir):
    t = make_table(tmp_table_dir)
    assert t.current_snapshot_id() == 0
    assert t.entries().num_rows == 0
    assert t.schema().equals(TRANSCRIPT)


def test_write_read_roundtrip(tmp_table_dir):
    data = synth.transcripts(0.001)
    t = make_table(tmp_table_dir, data)
    assert t.current_snapshot_id() == 1
    ents = t.entries()
    assert ents.num_rows > 10  # many small files
    assert int(pc.sum(ents["rows"]).as_py()) == data.num_rows
    back = sorted_scan(t)
    expect = data.take(
        pc.sort_indices(data, sort_keys=[("conv_id", "ascending"), ("turn_idx", "ascending")])
    )
    assert back.equals(expect)


def test_stats_match_recomputation(tmp_table_dir):
    data = synth.transcripts(0.001)
    t = make_table(tmp_table_dir, data)
    import pyarrow.parquet as pq

    for r in t.entries().to_pylist()[:5]:
        st = json.loads(r["stats"])
        actual = pq.read_table(os.path.join(t.dir, r["path"]))
        assert r["rows"] == actual.num_rows
        recomputed = manifest.compute_stats(actual, TRANSCRIPT_STATS_COLS)
        assert st == json.loads(json.dumps(recomputed))


def test_scan_pruning_by_stats(tmp_table_dir):
    data = synth.transcripts(0.001)
    t = make_table(tmp_table_dir, data)
    target = "conv-00000042"
    pruned = t.pruned_entries(predicates={"conv_id": (target, target)})
    assert 0 < pruned.num_rows < t.entries().num_rows
    got = pa.concat_tables(
        __import__("pyarrow.parquet", fromlist=["x"]).read_table(os.path.join(t.dir, p))
        for p in pruned["path"].to_pylist()
    )
    got = got.filter(pc.equal(got["conv_id"], target))
    expect = data.filter(pc.equal(data["conv_id"], target))
    assert got.num_rows == expect.num_rows


def test_string_truncation_upper_bound():
    s = "z" * 100
    up = manifest.truncate_max(s)
    assert up is not None and up >= s and len(up) <= 64
    assert manifest.truncate_min(s) <= s


def test_commit_conflict_on_nonlive_files(tmp_table_dir):
    data = synth.transcripts(0.001)
    t = make_table(tmp_table_dir, data)
    with pytest.raises(ConflictError):
        t.commit(added=None, removed=["data/part-0/nope.parquet"], operation="bad")


def test_snapshot_isolation_pinned_reader(tmp_table_dir):
    data = synth.transcripts(0.001)
    t = make_table(tmp_table_dir, data)
    s1 = t.current_snapshot_id()
    more = data.slice(0, 100)
    t.write_table(more, rows_per_file=50, operation="append2", name_prefix="m")
    assert t.current_snapshot_id() == s1 + 1
    assert t.read_arrow(snapshot_id=s1).num_rows == data.num_rows
    assert t.read_arrow().num_rows == data.num_rows + 100


def test_rollback_time_travel(tmp_table_dir, ray_session):
    from e2e_ocsf_cyber_lakehouse_blueprint_ray.stages import compact as compact_mod
    from e2e_ocsf_cyber_lakehouse_blueprint_ray.stages import merge as merge_mod

    data = synth.transcripts(0.001)
    t = make_table(tmp_table_dir, data)          # snap 1
    compact_mod.compact(t)                        # snap 2
    src = synth.merge_source(data)
    merge_mod.merge(t, src)                       # snap 3 (mutated)
    pre = sorted_scan(t, snapshot_id=2)
    sid = t.rollback(2)                           # snap 4 = content of snap 2
    assert sid == 4
    assert sorted_scan(t).equals(pre)
    # the merged snapshot remains readable (history preserved)
    assert sorted_scan(t, snapshot_id=3).num_rows != pre.num_rows


def test_commit_self_heals_orphaned_snapshot(tmp_path):
    """A snapshot file published WITHOUT a pointer update (committer crashed
    between try_write_snapshot and set_current, or a pointer write was lost)
    must not wedge the table: the next commit builds on it and heals the
    CURRENT pointer."""
    data = synth.transcripts(0.001)
    t = make_table(str(tmp_path / "tbl"), data.slice(0, 300))
    assert t.current_snapshot_id() == 1
    # orphan snap-2: identical live set, pointer NOT advanced
    ents, meta = t.snapshot(1)
    assert manifest.try_write_snapshot(
        t.dir, 2, ents, parent_id=1, operation="orphan",
        schema=meta["schema"], partition_spec=meta["partition_spec"],
    )
    # pointer still 1 — simulate the crash window
    assert manifest.current_id(t.dir) == 1
    sid = t.write_table(data.slice(300, 200), name_prefix="w2")
    assert sid == 3  # built on the orphan, not colliding with its id
    assert t.current_snapshot_id() == 3
    got = sorted_scan(t)
    assert got.num_rows == 500


def test_commit_rejects_duplicate_added_paths(tmp_path):
    data = synth.transcripts(0.001).slice(0, 100)
    t = make_table(str(tmp_path / "tbl"), data)
    live = t.entries()
    # re-adding a live path must conflict (would double-reference the file)
    with pytest.raises(ConflictError):
        t.commit(added=live.slice(0, 1), removed=[], operation="dup")
    # duplicate paths within one added set must conflict
    dup = pa.concat_tables([live.slice(0, 1), live.slice(0, 1)])
    with pytest.raises(ConflictError):
        t.commit(added=dup, removed=[live["path"][0].as_py()], operation="dup2")


def test_set_current_never_regresses(tmp_path):
    data = synth.transcripts(0.001).slice(0, 100)
    t = make_table(str(tmp_path / "tbl"), data)
    t.write_table(data.slice(0, 50), name_prefix="x")  # snap 2
    assert t.current_snapshot_id() == 2
    manifest.set_current(t.dir, 1)  # stale writer tries to move back
    assert t.current_snapshot_id() == 2


def test_history_and_timestamp_as_of(tmp_table_dir):
    import time

    data = synth.transcripts(0.001)
    t = make_table(tmp_table_dir, data.slice(0, 300))
    time.sleep(0.05)
    mark = time.time()
    time.sleep(0.05)
    t.write_table(data.slice(300, 300), name_prefix="w2")
    h = t.history()
    assert [r["snapshot_id"] for r in h] == [0, 1, 2]
    assert h[2]["operation"] == "append" and h[2]["parent_id"] == 1
    assert h[0]["created_at"] <= h[1]["created_at"] <= h[2]["created_at"]
    # AS OF the marked instant resolves to snapshot 1, not 2
    assert t.snapshot_id_as_of(mark) == 1
    assert t.read_arrow(snapshot_id=t.snapshot_id_as_of(mark)).num_rows == 300
    assert t.snapshot_id_as_of(time.time()) == 2
    with pytest.raises(ValueError):
        t.snapshot_id_as_of(h[0]["created_at"] - 100)
    # rollback by timestamp: table content returns to the AS OF state
    t.rollback(t.snapshot_id_as_of(mark))
    assert t.read_arrow().num_rows == 300
