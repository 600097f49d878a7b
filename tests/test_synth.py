import pyarrow.compute as pc

from e2e_ocsf_cyber_lakehouse_blueprint_ray import synth
from e2e_ocsf_cyber_lakehouse_blueprint_ray.schema import TRANSCRIPT


def test_transcripts_deterministic_and_shaped():
    t1 = synth.transcripts(0.001)
    t2 = synth.transcripts(0.001)
    assert t1.schema.equals(TRANSCRIPT)
    assert t1.equals(t2)
    assert t1.num_rows > 5000
    # hot conversations exist
    counts = t1.group_by("conv_id").aggregate([("turn_idx", "count")])
    assert pc.max(counts["turn_idx_count"]).as_py() == synth.hot_turns(0.001)
    # turn_idx contiguous within a conv
    one = t1.filter(pc.equal(t1["conv_id"], "conv-00000009"))
    idx = sorted(one["turn_idx"].to_pylist())
    assert idx == list(range(len(idx)))
    # ts strictly increasing within conv
    ts = [v for _, v in sorted(zip(one["turn_idx"].to_pylist(), one["ts"].to_pylist()))]
    assert all(a < b for a, b in zip(ts, ts[1:]))


def test_merge_source_and_expected():
    base = synth.transcripts(0.001)
    src = synth.merge_source(base)
    ops = set(src["op"].to_pylist())
    assert ops == {"update", "insert", "delete"}
    exp = synth.apply_merge_expected(base, src)
    n_del = len(src.filter(pc.equal(src["op"], "delete")))
    n_ins = len(src.filter(pc.equal(src["op"], "insert")))
    assert exp.num_rows == base.num_rows - n_del + n_ins
    assert any(t.startswith("edited:") for t in exp["text"].to_pylist()[:5000])


def test_audit_fixture_jsonl(tmp_path):
    paths = synth.write_audit_fixture(str(tmp_path), n_per_source=25)
    import json

    assert set(paths) == {"github", "slack", "atlassian"}
    line = open(paths["github"][0]).readline()
    doc = json.loads(line)
    assert {"id", "action", "created_at", "actor"} <= set(doc)
