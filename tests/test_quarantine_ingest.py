"""Validated ingest with malformed-row quarantine (sources.read_with_quarantine)."""

import pytest

from mack_spark.sources import read_with_quarantine


def test_jsonl_split(spark, tmp_path):
    p = tmp_path / "in.jsonl"
    p.write_text(
        '{"id": 1, "name": "ok"}\n'
        "this is not json\n"
        '{"id": 2, "name": "fine"}\n'
        '{"id": "NaN-ish", "name": 3'  # truncated object
    )
    good, quar = read_with_quarantine(
        spark, str(p), "id bigint, name string", fmt="jsonl"
    )
    g = {(r["id"], r["name"]) for r in good.collect()}
    assert g == {(1, "ok"), (2, "fine")}
    q = [r["raw_record"] for r in quar.collect()]
    assert len(q) == 2 and "this is not json" in q[0] or "this is not json" in q
    assert "_corrupt_record" not in good.columns


def test_csv_split_on_type_mismatch(spark, tmp_path):
    p = tmp_path / "in.csv"
    p.write_text("id,qty\n1,10\nnope,not-a-number\n3,30\n")
    good, quar = read_with_quarantine(
        spark, str(p), "id bigint, qty bigint", fmt="csv"
    )
    assert {(r["id"], r["qty"]) for r in good.collect()} == {(1, 10), (3, 30)}
    assert quar.count() == 1
    assert "nope" in quar.collect()[0]["raw_record"]


def test_requires_schema_and_known_fmt(spark, tmp_path):
    with pytest.raises(TypeError, match="explicit schema"):
        read_with_quarantine(spark, str(tmp_path), None)
    with pytest.raises(ValueError, match="unsupported fmt"):
        read_with_quarantine(spark, str(tmp_path), "id int", fmt="xml")
