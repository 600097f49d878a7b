"""Continuous-operation scenarios: multi-wave incremental ingest through the
whole medallion, and crash atomicity of the global cluster job."""

import pyarrow.compute as pc
import pytest

from e2e_ocsf_cyber_lakehouse_blueprint_ray import config as cfg, synth
from e2e_ocsf_cyber_lakehouse_blueprint_ray.pipelines.medallion import GOLD_TABLES, Medallion
from e2e_ocsf_cyber_lakehouse_blueprint_ray.stages import cluster as cluster_mod
from e2e_ocsf_cyber_lakehouse_blueprint_ray.stages import optimize as optimize_mod
from tests.test_table import CONF, make_table, sorted_scan


def test_two_wave_incremental_medallion(tmp_path_factory, ray_session):
    """New JSONL files arriving after the first full run flow through
    bronze→silver→gold incrementally — only the new events are processed,
    totals accumulate, and a maintenance OPTIMIZE pass on a gold table
    changes nothing about its content."""
    root = tmp_path_factory.mktemp("cont")
    fixtures = str(root / "raw")
    synth.write_audit_fixture(fixtures, n_per_source=50, wave="w1", start=0)
    m = Medallion(str(root / "tables"), cfg.test_config())
    m.run_all(fixtures, use_actor_gold=False)
    s1 = m.summary()
    total1 = int(pc.sum(s1["n_events"]).as_py()) if s1.num_rows else 0

    # wave 2 lands: 30 NEW events per source
    synth.write_audit_fixture(fixtures, n_per_source=30, wave="w2", start=1000)
    m.run_bronze(fixtures)
    m.run_silver()
    m.run_gold(use_actor=False)
    for src in ("github", "slack", "atlassian"):
        assert m.table(f"bronze_{src}_audit_logs").read_arrow().num_rows == 80
        assert m.table(f"silver_{src}_audit_logs").read_arrow().num_rows == 80
    s2 = m.summary()
    total2 = int(pc.sum(s2["n_events"]).as_py())
    assert total2 >= total1  # gold accumulated (wave-2 routed events added)

    # a third run with nothing new is a complete no-op
    assert all(v is None for v in m.run_bronze(fixtures).values())
    assert all(v is None for v in m.run_silver().values())
    assert all(v is None for v in m.run_gold(use_actor=False).values())

    # maintenance on a gold table preserves its scan content
    name = next(n for c, n in GOLD_TABLES.items() if m.table(n).read_arrow().num_rows > 0)
    g = m.table(name)
    before = g.read_arrow().sort_by([("time", "ascending"), ("_source", "ascending")])
    optimize_mod.optimize(g)  # key-less gold table: clusters by time alone
    after = g.read_arrow().sort_by([("time", "ascending"), ("_source", "ascending")])
    assert after.num_rows == before.num_rows


def test_global_cluster_crash_is_atomic(tmp_table_dir, ray_session):
    """A failure inside the global-sort cluster pipeline leaves the table on
    its previous snapshot; the rerun succeeds and scan equality holds."""
    data = synth.transcripts(0.001)
    t = make_table(tmp_table_dir, data, rows_per_file=300)
    parent = t.current_snapshot_id()

    import e2e_ocsf_cyber_lakehouse_blueprint_ray.stages.cluster as C

    orig = C._write_sorted_batch

    def boom(batch, **kw):
        raise RuntimeError("injected writer crash")

    C._write_sorted_batch = boom
    try:
        with pytest.raises(Exception):
            cluster_mod.cluster(t, mode="global", curve="zorder")
    finally:
        C._write_sorted_batch = orig
    assert t.current_snapshot_id() == parent  # no partial commit
    # rerun succeeds; orphan staging files from the crash are invisible to
    # readers and removable
    sid = cluster_mod.cluster(t, mode="global", curve="zorder")
    assert sid == parent + 1
    expect = data.take(
        pc.sort_indices(data, sort_keys=[("conv_id", "ascending"), ("turn_idx", "ascending")])
    )
    assert sorted_scan(t).equals(expect)
    from e2e_ocsf_cyber_lakehouse_blueprint_ray.stages import expire

    expire.remove_orphans(t)
    assert sorted_scan(t).equals(expect)
