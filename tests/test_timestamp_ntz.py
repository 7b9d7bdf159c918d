"""timestampNtz protocol declarations (round 12): a table whose schema
contains TIMESTAMP_NTZ anywhere must declare the reader+writer feature
(delta PROTOCOL.md §Timestamp without timezone) — reads landed earlier
(the feature is accepted); this pins that tables this writer CREATES or
EVOLVES declare it too, instead of emitting a legacy-protocol log an
old reader would misinterpret."""

import datetime

from mack_spark.sources.delta_log import DeltaProtocolTable


def _feats(t):
    p = t.snapshot().protocol
    return (p.get("minReaderVersion"), p.get("minWriterVersion"),
            set(p.get("readerFeatures") or []),
            set(p.get("writerFeatures") or []))


class TestTimestampNtzProtocol:
    def test_create_declares_feature(self, spark, tmp_path):
        df = spark.createDataFrame(
            [(1, datetime.datetime(2026, 1, 2, 3, 4, 5))],
            "pk int, ts timestamp_ntz",
        )
        t = DeltaProtocolTable.create(spark, str(tmp_path / "t"), df)
        r, w, rf, wf = _feats(t)
        assert (r, w) == (3, 7)
        assert "timestampNtz" in rf and "timestampNtz" in wf
        got = t.to_df().collect()[0]
        assert got["ts"] == datetime.datetime(2026, 1, 2, 3, 4, 5)

    def test_nested_ntz_detected(self, spark, tmp_path):
        df = spark.createDataFrame(
            [(1, [datetime.datetime(2026, 1, 1)])],
            "pk int, tss array<timestamp_ntz>",
        )
        t = DeltaProtocolTable.create(spark, str(tmp_path / "n"), df)
        _, _, rf, wf = _feats(t)
        assert "timestampNtz" in rf and "timestampNtz" in wf

    def test_plain_timestamp_stays_legacy(self, spark, tmp_path):
        df = spark.createDataFrame(
            [(1, datetime.datetime(2026, 1, 1))], "pk int, ts timestamp"
        )
        t = DeltaProtocolTable.create(spark, str(tmp_path / "p"), df)
        r, w, rf, wf = _feats(t)
        assert (r, w) == (1, 2) and not rf and not wf

    def test_merge_schema_evolution_upgrades(self, spark, tmp_path):
        df = spark.createDataFrame([(1, "a")], "pk int, name string")
        t = DeltaProtocolTable.create(spark, str(tmp_path / "e"), df)
        t.append(
            spark.createDataFrame(
                [(2, "b", datetime.datetime(2026, 2, 2))],
                "pk int, name string, ts timestamp_ntz",
            ),
            merge_schema=True,
        )
        r, w, rf, wf = _feats(t)
        assert (r, w) == (3, 7)
        assert "timestampNtz" in rf and "timestampNtz" in wf
        # evolved rows read back; old rows NULL-fill
        rows = {r["pk"]: r["ts"] for r in t.to_df().collect()}
        assert rows[1] is None
        assert rows[2] == datetime.datetime(2026, 2, 2)

    def test_add_column_upgrades(self, spark, tmp_path):
        df = spark.createDataFrame([(1,)], "pk int")
        t = DeltaProtocolTable.create(spark, str(tmp_path / "a"), df)
        t.add_column("ts", "timestamp_ntz")
        r, w, rf, wf = _feats(t)
        assert (r, w) == (3, 7)
        assert "timestampNtz" in rf and "timestampNtz" in wf
        assert t.to_df().collect()[0]["ts"] is None
