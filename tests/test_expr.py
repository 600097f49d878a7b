import json

import pyarrow as pa
import pyarrow.compute as pc

from e2e_ocsf_cyber_lakehouse_blueprint_ray import expr


def test_try_variant_get_typed_and_null_on_mismatch():
    data = pa.array(
        [
            json.dumps({"a": {"b": 5}, "arr": [{"x": "v0"}, {"x": "v1"}], "s": "txt", "f": 1.5}),
            json.dumps({"a": {"b": "not-an-int"}, "s": 9}),
            "not json",
            None,
        ]
    )
    assert expr.try_variant_get(data, "$.a.b", "BIGINT").to_pylist() == [5, None, None, None]
    assert expr.try_variant_get(data, "$.arr[1].x", "STRING").to_pylist() == ["v1", None, None, None]
    assert expr.try_variant_get(data, "$.s", "STRING").to_pylist() == ["txt", "9", None, None]
    assert expr.try_variant_get(data, "$.missing", "DOUBLE").to_pylist() == [None] * 4
    assert expr.try_variant_get(data, "$.f", "DOUBLE").to_pylist() == [1.5, None, None, None]


def test_temporal_conversions():
    ms = pa.array([1735689600000])
    assert expr.from_unixtime_ms(ms).to_pylist()[0].year == 2025
    s = pa.array([1735689600])
    assert expr.from_unixtime_s(s).to_pylist()[0].year == 2025
    iso = pa.array(["2025-01-15T10:30:00.000Z", "garbage", None])
    out = expr.to_timestamp_iso(iso).to_pylist()
    assert out[0].day == 15 and out[1] is None and out[2] is None
    # offsets CONVERT to UTC (Spark to_timestamp semantics), sub-second kept
    tz = pa.array(
        ["2025-01-15T10:30:00+05:30", "2025-01-15T10:30:00.250-02:00", "2025-01-15T10:30:00"]
    )
    got = expr.to_timestamp_iso(tz).to_pylist()
    assert (got[0].hour, got[0].minute) == (5, 0)
    assert (got[1].hour, got[1].microsecond) == (12, 250000)
    assert got[2].hour == 10  # offset-less = UTC


def test_case_when_and_like():
    action = pa.array(["org.delete_x", "org.create_y", "other", None])
    sev = expr.case_when(
        [
            (expr.sql_like(action, "%delete%"), 4),
            (expr.sql_like(action, "%create%"), 2),
        ],
        1,
        pa.int32(),
    )
    assert sev.to_pylist() == [4, 2, 1, 1]
    assert expr.rlike(action, r"org\.(delete|create)").to_pylist() == [True, True, False, None]


def test_concat_and_split():
    a = pa.array(["x", None])
    out = expr.concat(a, "@", pa.array(["y", "z"]))
    assert out.to_pylist() == ["x@y", None]
    ws = expr.concat_ws("-", a, pa.array(["y", "z"]))
    assert ws.to_pylist() == ["x-y", "z"]
    sp = expr.split_index(pa.array(["1,2,3"]), ",", 1)
    assert sp.to_pylist() == ["2"]


def test_nested_builders():
    n = 3
    s = expr.named_struct({"a": pa.array([1, 2, 3]), "b": expr.lit("k", n, pa.string())})
    assert s.to_pylist() == [{"a": 1, "b": "k"}, {"a": 2, "b": "k"}, {"a": 3, "b": "k"}]
    masked = expr.named_struct({"a": pa.array([1, 2, 3])}, mask=pa.array([True, False, True]))
    assert masked.to_pylist()[1] is None
    lst = expr.struct_array_literal(
        [
            expr.named_struct({"v": pa.array(["a0", "a1", "a2"])}),
            expr.named_struct({"v": pa.array(["b0", "b1", "b2"])}),
        ]
    )
    assert lst.to_pylist()[1] == [{"v": "a1"}, {"v": "b1"}]
    arr = expr.string_array_literal(["cloud", "datetime"], 2)
    assert arr.to_pylist() == [["cloud", "datetime"]] * 2
    m = expr.map_literal({"ref": pa.array(["r0", "r1"]), "vis": "public"}, 2)
    assert m.to_pylist()[1] == [("ref", "r1"), ("vis", "public")]


def test_coalesce_and_nulls():
    a = pa.array([None, "x"])
    assert expr.coalesce(a, pa.scalar("d")).to_pylist() == ["d", "x"]
    assert expr.nulls(2, pa.string()).to_pylist() == [None, None]
