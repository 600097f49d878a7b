"""Bronze → silver → gold medallion pipeline on the audit-log fixtures
(reference EP1-EP3, SURVEY.md §3)."""

import json

import pyarrow.compute as pc
import pytest

from e2e_ocsf_cyber_lakehouse_blueprint_ray import config as cfg, synth
from e2e_ocsf_cyber_lakehouse_blueprint_ray.functions.ocsf import GoldTransform, flows
from e2e_ocsf_cyber_lakehouse_blueprint_ray.pipelines.medallion import GOLD_TABLES, Medallion
from e2e_ocsf_cyber_lakehouse_blueprint_ray.sources.jsonl import ingest_jsonl


@pytest.fixture(scope="module")
def medallion(tmp_path_factory, ray_session):
    root = tmp_path_factory.mktemp("medallion")
    fixtures = str(root / "raw")
    synth.write_audit_fixture(fixtures, n_per_source=125)
    m = Medallion(str(root / "tables"), cfg.test_config())
    m.run_all(fixtures, use_actor_gold=True)
    return m, fixtures


def test_bronze_shape_and_metadata(medallion):
    m, _ = medallion
    for src in ("github", "slack", "atlassian"):
        t = m.table(f"bronze_{src}_audit_logs")
        got = t.read_arrow()
        assert got.num_rows == 125
        names = got.schema.names
        assert names[:7] == [
            "_event_time", "_event_date", "_file_path", "_source",
            "_source_type", "_ingest_time", "_hostname",
        ]
        assert names[-1] == "data"  # raw variant LAST
        assert got["_event_time"].null_count == 0
        assert set(got["_source"].to_pylist()) == {src}
        # _file_path populated from the reader (S2)
        assert all(p and p.endswith(".jsonl") for p in got["_file_path"].to_pylist())


def test_bronze_ingest_is_incremental(medallion):
    m, fixtures = medallion
    from e2e_ocsf_cyber_lakehouse_blueprint_ray.functions.meta import BronzeMeta

    t = m.table("bronze_github_audit_logs")
    sid, new = ingest_jsonl(t, f"{fixtures}/github", BronzeMeta("github"))
    assert sid is None and new == []  # exactly-once: nothing new to consume


def test_silver_typed_extraction(medallion):
    m, _ = medallion
    t = m.table("silver_github_audit_logs")
    got = t.read_arrow()
    assert got.num_rows == 125
    assert got["action"].null_count == 0
    assert got["created_at_ms"].type == "int64"
    assert got["hook_id"].type == "int32"
    # null-on-missing semantics: optional field has some nulls, some values
    emails = got["email"].to_pylist()
    assert any(e is None for e in emails) and any(e for e in emails)
    # extraction agrees with raw JSON (try_variant_get parity)
    raw = [json.loads(s) for s in got["data"].to_pylist()]
    assert got["actor"].to_pylist() == [d.get("actor") for d in raw]
    at = m.table("silver_atlassian_audit_logs").read_arrow()
    # array-index path '$.attributes.container[0].id'
    assert at["container_id"].null_count < at.num_rows
    assert at["risk_score"].type == "int32"


def test_gold_routing_and_nested_shape(medallion):
    m, _ = medallion
    total = 0
    for cls, name in GOLD_TABLES.items():
        t = m.table(name)
        got = t.read_arrow()
        total += got.num_rows
        if got.num_rows == 0:
            continue
        assert set(got["class_uid"].to_pylist()) == {
            {"account_change": 3001, "authentication": 3002, "authorize_session": 3003,
             "entity_management": 3004, "user_access": 3005, "group_management": 3006}[cls]
        }
        md = got["metadata"].to_pylist()[0]
        assert md["version"] == "1.7.0"
        assert md["profiles"] == ["cloud", "datetime"]
        assert "@audit_logs__1.0" in md["log_version"]
        row0 = got.to_pylist()[0]
        assert row0["actor"]["user"]["type_id"] == 1
        assert len(row0["observables"]) == 2
        assert row0["enrichments"][1]["name"] == "source"
        assert json.loads(row0["unmapped"]["raw_data"])  # to_json(data) analog
        # multi-source sinks discriminate via _source (README.md:41 analog)
        assert set(got["_source"].to_pylist()) <= {"github", "slack", "atlassian"}
    assert total > 0


def test_gold_regex_routing_matches_reference_semantics(medallion):
    """Every routed row's action matches the class regex; rows matching no
    regex appear in no gold table."""
    import re

    m, _ = medallion
    from e2e_ocsf_cyber_lakehouse_blueprint_ray.functions.ocsf import CLASS_REGEX

    for cls, name in GOLD_TABLES.items():
        got = m.table(name).read_arrow()
        if got.num_rows == 0:
            continue
        for src in set(got["_source"].to_pylist()):
            rx = re.compile(CLASS_REGEX[(src, cls)])
            sub = got.filter(pc.equal(got["_source"], src))
            actions = [m_["event_code"] for m_ in sub["metadata"].to_pylist()]
            assert all(rx.search(a) for a in actions)


def test_gold_authentication_extras(medallion):
    m, _ = medallion
    got = m.table(GOLD_TABLES["authentication"]).read_arrow()
    if got.num_rows:
        assert "src_endpoint" in got.schema.names
        assert "auth_protocol_id" in got.schema.names
        se = got["src_endpoint"].to_pylist()[0]
        assert "location" in se and "ip" in se


def test_gold_incremental_noop(medallion):
    m, _ = medallion
    out = m.run_gold()
    assert all(v is None for v in out.values())  # nothing new upstream


def test_fifteen_flows_registered():
    assert len(flows()) == 15
    GoldTransform("github", "account_change")  # constructs + compiles


def test_gold_union_mode_equals_flow_mode(tmp_path_factory, ray_session):
    """S6 alternative: per-class Dataset.union of 3 transformed streams →
    single append; result matches the 3-appends-per-sink mode."""
    import pyarrow.compute as pc_

    root = tmp_path_factory.mktemp("medallion_union")
    fixtures = str(root / "raw")
    synth.write_audit_fixture(fixtures, n_per_source=60)
    m = Medallion(str(root / "tables"), cfg.test_config())
    m.setup()
    m.run_bronze(fixtures)
    m.run_silver()
    out = m.run_gold(union=True, use_actor=False)
    assert any(v is not None for v in out.values())
    # rerun is a no-op (incremental consumption recorded per flow)
    out2 = m.run_gold(union=True, use_actor=False)
    assert all(v is None for v in out2.values())
    # counts match an independently-run flow-mode medallion
    m2 = Medallion(str(root / "tables2"), cfg.test_config())
    m2.setup()
    m2.run_bronze(fixtures)
    m2.run_silver()
    m2.run_gold(union=False, use_actor=False)
    for cls, name in GOLD_TABLES.items():
        a = m.table(name).read_arrow(columns=["class_uid"]).num_rows
        b = m2.table(name).read_arrow(columns=["class_uid"]).num_rows
        assert a == b, cls


def test_summary_query(medallion):
    m, _ = medallion
    s = m.summary()
    assert s.num_rows > 0
    assert s.schema.names == ["_source", "class_name", "n_events"]
    assert int(pc.sum(s["n_events"]).as_py()) > 0
