"""In-commit timestamps (round 11, VERDICT-r10 #8's second half):
``delta.enableInCommitTimestamps=true`` (writer feature
``inCommitTimestamp``) stamps a monotonically increasing
``commitInfo.inCommitTimestamp`` on every commit — the spec's commit
clock that survives log-file mtime rewrites — and CDF/history readers
prefer it over the advisory ``timestamp``.
"""

import json
import os

import pytest
from pyspark.sql import functions as F

from mack_spark.sources.delta_log import DeltaProtocolTable

ICT = {"delta.enableInCommitTimestamps": "true"}


def _cis(t):
    """version → commitInfo, from the raw log."""
    out = {}
    logdir = os.path.join(t.path, "_delta_log")
    for f in sorted(os.listdir(logdir)):
        if not f.endswith(".json"):
            continue
        v = int(f.split(".")[0])
        for line in open(os.path.join(logdir, f)):
            line = line.strip()
            if line:
                a = json.loads(line)
                if "commitInfo" in a:
                    out[v] = a["commitInfo"]
                break
    return out


class TestInCommitTimestamps:
    def test_enablement_upgrades_protocol_and_records_point(
        self, spark, tmp_path
    ):
        df = spark.range(5).selectExpr("cast(id as int) pkey")
        t = DeltaProtocolTable.create(spark, str(tmp_path / "t"), df)
        t.append(spark.createDataFrame([(9,)], "pkey int"))
        t.set_properties(dict(ICT))
        snap = t.snapshot()
        proto = snap.protocol
        assert proto["minWriterVersion"] == 7
        assert "inCommitTimestamp" in proto["writerFeatures"]
        # ICT is writer-only: the reader version did not bump
        assert proto["minReaderVersion"] == 1
        cfg = snap.metadata["configuration"]
        assert cfg["delta.inCommitTimestampEnablementVersion"] == "2"
        assert "delta.inCommitTimestampEnablementTimestamp" in cfg

    def test_commits_carry_monotonic_ict(self, spark, tmp_path):
        df = spark.range(5).selectExpr("cast(id as int) pkey")
        t = DeltaProtocolTable.create(
            spark, str(tmp_path / "t"), df, properties=dict(ICT)
        )
        t.append(spark.createDataFrame([(9,)], "pkey int"))
        t.delete_where("pkey = 0")
        cis = _cis(t)
        icts = [cis[v].get("inCommitTimestamp") for v in sorted(cis)]
        assert all(x is not None for x in icts)
        assert icts == sorted(icts) and len(set(icts)) == len(icts)

    def test_ict_survives_clock_regression(self, spark, tmp_path):
        """A commit whose wall clock reads EARLIER than the previous
        commit's ICT still advances: max(now, prev + 1)."""
        df = spark.range(3).selectExpr("cast(id as int) pkey")
        t = DeltaProtocolTable.create(
            spark, str(tmp_path / "t"), df, properties=dict(ICT)
        )
        # forge a previous ICT far in the future
        vf = os.path.join(t.path, "_delta_log", "%020d.json" % 0)
        lines = open(vf).read().splitlines()
        a = json.loads(lines[0])
        future = 4102444800000  # year 2100
        a["commitInfo"]["inCommitTimestamp"] = future
        lines[0] = json.dumps(a, separators=(",", ":"))
        open(vf, "w").write("\n".join(lines) + "\n")
        t.append(spark.createDataFrame([(9,)], "pkey int"))
        cis = _cis(t)
        assert cis[1]["inCommitTimestamp"] == future + 1

    def test_cdf_prefers_ict(self, spark, tmp_path):
        """Batch table_changes and the streaming CDF source use the
        in-commit timestamp, not the advisory commitInfo.timestamp."""
        import datetime

        from mack_spark.streaming.delta_source import _cdf_units, _table

        df = spark.range(3).selectExpr("cast(id as int) pkey")
        t = DeltaProtocolTable.create(
            spark, str(tmp_path / "t"), df,
            properties=dict(ICT, **{"delta.enableChangeDataFeed": "true"}),
        )
        # forge divergent timestamps on the create commit
        vf = os.path.join(t.path, "_delta_log", "%020d.json" % 0)
        lines = open(vf).read().splitlines()
        a = json.loads(lines[0])
        a["commitInfo"]["timestamp"] = 1000  # bogus advisory clock
        ict = a["commitInfo"]["inCommitTimestamp"]
        lines[0] = json.dumps(a, separators=(",", ":"))
        open(vf, "w").write("\n".join(lines) + "\n")
        [row] = (
            t.table_changes(0, 0).select("_commit_timestamp").distinct()
            .collect()
        )
        got_ms = int(
            row[0].replace(tzinfo=datetime.timezone.utc).timestamp() * 1000
        )
        assert got_ms == ict  # not 1000
        [unit] = [
            u for u in _cdf_units(_table(t.path), t.path, 0)
        ][:1]
        assert unit["overlay"]["_commit_timestamp"] == str(ict)

    def test_foreign_ict_table_writable(self, spark, tmp_path):
        """A foreign writer-7 log declaring inCommitTimestamp accepts
        our commits, and they continue the ICT chain."""
        df = spark.range(3).selectExpr("cast(id as int) pkey")
        t = DeltaProtocolTable.create(
            spark, str(tmp_path / "t"), df, properties=dict(ICT)
        )
        t2 = DeltaProtocolTable(spark, t.path)  # fresh handle
        t2.append(spark.createDataFrame([(7,)], "pkey int"))
        cis = _cis(t2)
        assert cis[1]["inCommitTimestamp"] > cis[0]["inCommitTimestamp"]
