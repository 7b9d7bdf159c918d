"""Domain metadata (Delta spec §Domain Metadata, writer feature
``domainMetadata``): opaque per-domain coordination state carried by
the log — latest action per domain wins, ``removed=true`` tombstones,
live domains survive checkpoint-based replay, and first use upgrades
the protocol to a table-features log declaring the feature."""

import json
import os

import pytest

from mack_spark.sources.delta_log import (
    CHECKPOINT_INTERVAL,
    DeltaProtocolError,
    DeltaProtocolTable,
)


def _mk(spark, tmp_path, name="dm"):
    return DeltaProtocolTable.create(
        spark, str(tmp_path / name), spark.createDataFrame([(1,)], "k int")
    )


class TestDomainMetadata:
    def test_set_get_latest_wins(self, spark, tmp_path):
        t = _mk(spark, tmp_path)
        t.set_domain_metadata("owner.retention", {"days": 30})
        t.set_domain_metadata("owner.retention", {"days": 7})
        t.set_domain_metadata("other.domain", "raw-string")
        assert t.domain_metadata() == {
            "other.domain": "raw-string",
            "owner.retention": '{"days":7}',
        }

    def test_remove_tombstones(self, spark, tmp_path):
        t = _mk(spark, tmp_path)
        t.set_domain_metadata("d1", "x")
        t.remove_domain_metadata("d1")
        assert t.domain_metadata() == {}
        with pytest.raises(ValueError, match="no domain metadata"):
            t.remove_domain_metadata("d1")

    def test_protocol_upgraded_once(self, spark, tmp_path):
        t = _mk(spark, tmp_path)
        t.set_domain_metadata("d1", "x")
        p = t.snapshot().protocol
        assert p["minWriterVersion"] == 7
        assert "domainMetadata" in p["writerFeatures"]
        v = t.snapshot().version
        t.set_domain_metadata("d2", "y")
        # second set commits no second protocol action
        acts = [json.loads(x) for x in open(os.path.join(
            t.path, "_delta_log", "%020d.json" % (v + 1)
        )) if x.strip()]
        assert not any("protocol" in a for a in acts)

    def test_survives_checkpoint_replay(self, spark, tmp_path):
        t = _mk(spark, tmp_path)
        t.set_domain_metadata("keep.me", {"v": 1})
        t.set_domain_metadata("drop.me", "gone")
        t.remove_domain_metadata("drop.me")
        while t.snapshot().version % CHECKPOINT_INTERVAL != 0:
            t.append(spark.createDataFrame([(9,)], "k int"))
        # fresh handle, JSON tail truncated to post-checkpoint commits
        assert DeltaProtocolTable(spark, t.path).domain_metadata() == {
            "keep.me": '{"v":1}'
        }
        # the checkpoint parquet itself carries the action
        import pyarrow.parquet as pq

        cps = [f for f in os.listdir(os.path.join(t.path, "_delta_log"))
               if ".checkpoint." in f and f.endswith(".parquet")]
        assert any(
            "domainMetadata" in pq.read_table(
                os.path.join(t.path, "_delta_log", f)
            ).column_names
            for f in cps
        )

    def test_foreign_writer_refusal_is_loud(self, spark, tmp_path):
        """A writer-7 table declaring a feature we don't implement is
        still refused — domainMetadata joining the supported set must
        not have widened the acceptance."""
        t = _mk(spark, tmp_path)
        t.set_domain_metadata("d", "x")
        f = os.path.join(t.path, "_delta_log", "%020d.json" % 1)
        acts = [json.loads(x) for x in open(f) if x.strip()]
        for a in acts:
            if "protocol" in a:
                a["protocol"]["writerFeatures"].append("icebergCompatV2")
        with open(f, "w") as fh:
            fh.write("\n".join(json.dumps(a) for a in acts) + "\n")
        with pytest.raises(DeltaProtocolError, match="icebergCompatV2"):
            t.append(spark.createDataFrame([(2,)], "k int"))
