"""Append + maintenance interleaving: a compaction planned against snapshot
S must commit cleanly even when an append lands between its plan and its
commit — and the appended rows must survive (the reference leans on Delta
optimistic concurrency for this, pre_setup_ocsf_tables.py:79-82)."""

import pyarrow.compute as pc

from e2e_ocsf_cyber_lakehouse_blueprint_ray import synth
from e2e_ocsf_cyber_lakehouse_blueprint_ray.stages import compact, optimize, rewrite
from e2e_ocsf_cyber_lakehouse_blueprint_ray.state import lineage
from tests.test_table import CONF, make_table, sorted_scan


def test_append_between_plan_and_commit_survives(tmp_table_dir, ray_session):
    data = synth.transcripts(0.001)
    t = make_table(tmp_table_dir, data, rows_per_file=300)
    parent = t.current_snapshot_id()

    # plan compaction against snapshot 1
    bins = compact.plan_compaction(t)
    assert bins
    job_id = lineage.job_id_for("compact", parent)
    added = rewrite.run_bins(
        t, bins, job_id, sort_mode="key", sort_key=["conv_id", "turn_idx"]
    )

    # a concurrent append commits snapshot 2 while compaction is in flight
    extra = data.slice(0, 123)
    t.write_table(extra, rows_per_file=100, operation="late-append", name_prefix="late")
    assert t.current_snapshot_id() == parent + 1

    # compaction's commit rebases: its removed files are still live
    import json

    removed = [p for b in bins for p in json.loads(b["inputs_json"])]
    sid = t.commit(
        added=added,
        removed=removed,
        operation="compact",
        expected_parent=parent,
        job_id=job_id,
    )
    assert sid == parent + 2
    # every row — original AND late-appended — survives exactly once
    got = t.read_arrow()
    assert got.num_rows == data.num_rows + extra.num_rows


def test_optimize_sequence(tmp_table_dir, ray_session):
    data = synth.transcripts(0.001)
    t = make_table(tmp_table_dir, data, rows_per_file=300)
    out = optimize.optimize(t, expire_keep_last=1)
    assert out["compact"] is not None and out["cluster"] is not None
    assert t.current_snapshot_id() in out["expire"]
    expect = data.take(
        pc.sort_indices(data, sort_keys=[("conv_id", "ascending"), ("turn_idx", "ascending")])
    )
    assert sorted_scan(t).equals(expect)
    # idempotent: nothing left to do
    again = optimize.optimize(t)
    assert again["compact"] is None
