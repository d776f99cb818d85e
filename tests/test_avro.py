"""Avro OCF writer/reader roundtrip + determinism (SURVEY.md §5 unit slice)."""

import hashlib

from e2e_ocsf_cyber_lakehouse_blueprint_spark.format import avro
from e2e_ocsf_cyber_lakehouse_blueprint_spark.format.manifest import (
    MANIFEST_ENTRY_SCHEMA,
    truncate_lower,
    truncate_upper,
)

SCHEMA = {
    "type": "record",
    "name": "r",
    "fields": [
        {"name": "s", "type": "string"},
        {"name": "i", "type": "long"},
        {"name": "f", "type": "double"},
        {"name": "b", "type": "boolean"},
        {"name": "opt", "type": ["null", "string"]},
        {"name": "m", "type": {"type": "map", "values": "long"}},
        {"name": "a", "type": {"type": "array", "items": "string"}},
    ],
}


def _records(n=2500):
    return [
        {
            "s": f"row-{i}",
            "i": i * 7 - 3,
            "f": i * 0.5,
            "b": i % 2 == 0,
            "opt": None if i % 3 == 0 else f"opt-{i}",
            "m": {"x": i, "y": -i},
            "a": [f"a{i}", f"b{i}"],
        }
        for i in range(n)
    ]


def test_roundtrip(tmp_path):
    path = str(tmp_path / "t.avro")
    recs = _records()
    avro.write_ocf(path, SCHEMA, recs)
    schema, back = avro.read_ocf(path)
    assert schema == SCHEMA
    assert back == recs


def test_multi_block_and_empty(tmp_path):
    path = str(tmp_path / "t.avro")
    avro.write_ocf(path, SCHEMA, _records(5), block_size=2)
    _, back = avro.read_ocf(path)
    assert len(back) == 5
    avro.write_ocf(path + "2", SCHEMA, [])
    _, back = avro.read_ocf(path + "2")
    assert back == []


def test_deterministic_bytes(tmp_path):
    p1, p2 = str(tmp_path / "x.avro"), str(tmp_path / "sub")
    import os

    os.makedirs(p2)
    p2 = p2 + "/x.avro"
    recs = _records(100)
    avro.write_ocf(p1, SCHEMA, recs)
    avro.write_ocf(p2, SCHEMA, recs)
    h = lambda p: hashlib.md5(open(p, "rb").read()).hexdigest()
    assert h(p1) == h(p2)  # same name + same records => identical bytes


def test_zigzag_edge_values(tmp_path):
    schema = {"type": "record", "name": "z", "fields": [{"name": "v", "type": "long"}]}
    vals = [0, -1, 1, 2**62, -(2**62), 127, -128]
    path = str(tmp_path / "z.avro")
    avro.write_ocf(path, schema, [{"v": v} for v in vals])
    _, back = avro.read_ocf(path)
    assert [r["v"] for r in back] == vals


def test_manifest_schema_shape(tmp_path):
    entry = {
        "status": 1,
        "snapshot_id": 7,
        "path": "/x/y.parquet",
        "file_format": "parquet",
        "partition": {"ts_day": "2025-01-01", "conv_bucket": None},
        "record_count": 10,
        "file_size_bytes": 1234,
        "lower_bounds": {"conv_id": '"conv-0"'},
        "upper_bounds": {"conv_id": '"conv-9"'},
        "null_counts": {"tool": 3},
        "content": "data",
        "covered_paths": [],
    }
    path = str(tmp_path / "m.avro")
    avro.write_ocf(path, MANIFEST_ENTRY_SCHEMA, [entry])
    _, back = avro.read_ocf(path)
    # pre-bloom entries encode via the schema default and decode with it
    assert back == [{**entry, "blooms": {}, "data_sequence": 0,
                     "eq_columns": [], "sort_order": None}]


def test_truncate_bounds():
    s = "abc" * 50
    assert truncate_lower(s) == s[:32]
    up = truncate_upper(s)
    assert len(up) <= 32 and up > s  # valid upper bound after truncation
    assert truncate_upper("short") == "short"
    assert truncate_upper(chr(0x10FFFF) * 40) is None
