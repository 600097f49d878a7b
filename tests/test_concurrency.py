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
