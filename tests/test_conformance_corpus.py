"""Round-14: FOREIGN-ARTIFACT conformance sweep (VERDICT r13 "Next
round" #2). tests/fixtures/conformance/ holds `_delta_log`s this
engine did NOT write — byte-assembled per the public Delta PROTOCOL.md
by scripts/build_conformance_corpus.py (stdlib + pyarrow only, zero
mack_spark imports). Every variant must replay and read to its pinned
expected.json through DeltaProtocolTable; variant-specific protocol
behaviors (checkpoint-only replay, DV row masking, mapping resolution,
identity high-water marks, ICT time travel, row-id attachment,
partition literal attach) get their own assertions.

The second half is the WRITER shape-checker: this engine's own output
swept action-line-by-action-line against spec field-presence rules per
action type, so the writer's artifacts stay the shape a foreign reader
expects.
"""

import json
import os
import shutil

import pytest

from mack_spark.sources.delta_log import (
    DeltaProtocolTable,
    clear_replay_cache,
)

CORPUS = os.path.join(
    os.path.dirname(os.path.abspath(__file__)), "fixtures", "conformance"
)
VARIANTS = sorted(
    d for d in os.listdir(CORPUS)
    if os.path.isdir(os.path.join(CORPUS, d))
)


def _load(tmp_path, variant):
    """Copy the fixture to a scratch dir (tests never mutate the
    committed corpus) and open it."""
    src = os.path.join(CORPUS, variant)
    dst = str(tmp_path / variant)
    shutil.copytree(os.path.join(src, "table"), dst)
    clear_replay_cache(dst)
    with open(os.path.join(src, "expected.json")) as fh:
        expected = json.load(fh)
    return dst, expected


class TestCorpusSweep:
    @pytest.mark.parametrize("variant", VARIANTS)
    def test_reads_to_pinned_rows(self, spark, tmp_path, variant):
        path, expected = _load(tmp_path, variant)
        t = DeltaProtocolTable(spark, path)
        df = t.to_df()
        assert df.columns == expected["columns"]
        got = sorted([list(r) for r in df.collect()])
        assert got == sorted(expected["rows"])
        assert t.snapshot().version == expected["facts"]["version"]

    @pytest.mark.parametrize("variant", VARIANTS)
    def test_filters_and_projection(self, spark, tmp_path, variant):
        # pushdown paths (explicit-schema scan, DV mask, mapping
        # rename, partition literal) must survive filter + projection
        path, expected = _load(tmp_path, variant)
        t = DeltaProtocolTable(spark, path)
        first = expected["columns"][0]
        df = t.to_df().select(first).where(f"`{first}` IS NOT NULL")
        assert df.count() == len(expected["rows"])


class TestVariantBehaviors:
    def test_classic_checkpoint_replays_without_json(
        self, spark, tmp_path
    ):
        path, expected = _load(tmp_path, "classic_checkpoint")
        t = DeltaProtocolTable(spark, path)
        # the JSON below the checkpoint is gone: state still complete,
        # and the checkpointed SetTransaction watermark survives
        assert t.snapshot().txns.get("app-x") == expected[
            "facts"
        ]["txn_app_x"]
        # time travel below the cleaned range fails loudly, at the
        # cleaned boundary works
        assert t.snapshot(version_as_of=4).version == 4

    def test_multipart_parts_all_required(self, spark, tmp_path):
        path, _ = _load(tmp_path, "multipart_checkpoint")
        part1 = os.path.join(
            path, "_delta_log",
            "%020d.checkpoint.%010d.%010d.parquet" % (2, 2, 2),
        )
        os.unlink(part1)
        clear_replay_cache(path)
        with pytest.raises(Exception, match="incomplete|missing"):
            DeltaProtocolTable(spark, path).snapshot()

    def test_dv_inline_masks_positions(self, spark, tmp_path):
        path, _ = _load(tmp_path, "dv_inline")
        t = DeltaProtocolTable(spark, path)
        got = sorted(r["k"] for r in t.to_df().collect())
        assert got == [j for j in range(10) if j not in (2, 3, 7)]
        # pre-delete version still sees every row
        assert t.to_df(version_as_of=0).count() == 10

    def test_dv_file_crc_verified(self, spark, tmp_path):
        path, _ = _load(tmp_path, "dv_file")
        t = DeltaProtocolTable(spark, path)
        assert t.to_df().count() == 6
        # corrupt one bitmap byte: the CRC check must refuse loudly
        bin_path = [
            os.path.join(path, f) for f in os.listdir(path)
            if f.startswith("deletion_vector_")
        ][0]
        blob = bytearray(open(bin_path, "rb").read())
        blob[9] ^= 0xFF
        with open(bin_path, "wb") as fh:
            fh.write(bytes(blob))
        clear_replay_cache(path)
        with pytest.raises(Exception, match="checksum|magic|cookie"):
            DeltaProtocolTable(spark, path).to_df().count()

    def test_mapping_name_physical_stats_prune(self, spark, tmp_path):
        path, _ = _load(tmp_path, "column_mapping_name")
        t = DeltaProtocolTable(spark, path)
        # logical rename resolution end-to-end
        assert t.to_df().where("k = 2").collect()[0]["v"] == "b"

    def test_mapping_id_ignores_physical_names(self, spark, tmp_path):
        path, _ = _load(tmp_path, "column_mapping_id")
        t = DeltaProtocolTable(spark, path)
        rows = {r["k"]: r["v"] for r in t.to_df().collect()}
        assert rows == {7: "x", 8: "y"}

    def test_identity_hwm_respected_on_append(self, spark, tmp_path):
        path, expected = _load(tmp_path, "identity")
        t = DeltaProtocolTable(spark, path)
        t.append(spark.createDataFrame([("e",), ("f",)], "v string"))
        got = sorted(r["rid"] for r in t.to_df().collect())
        # generation continues past the foreign high-water mark
        assert got == [1, 2, 3, 4, 5, 6]

    def test_ict_time_travel(self, spark, tmp_path):
        path, expected = _load(tmp_path, "ict")
        t = DeltaProtocolTable(spark, path)
        icts = expected["facts"]["icts"]
        # timestamp_as_of resolves against IN-COMMIT timestamps, not
        # file mtimes (the fixture's mtimes are checkout-time)
        df = t.to_df(timestamp_as_of=icts[1])
        assert df.count() == 2
        df = t.to_df(timestamp_as_of=icts[2] + 1)
        assert df.count() == 3
        # and this writer CONTINUES the monotonic clock on append
        t.append(spark.createDataFrame([(9, "z")], "k int, v string"))
        hist = t.history()
        new_ict = hist[0].get("inCommitTimestamp")
        assert new_ict is not None and new_ict > icts[2]

    def test_row_tracking_base_row_ids(self, spark, tmp_path):
        path, expected = _load(tmp_path, "row_tracking")
        t = DeltaProtocolTable(spark, path)
        ids = {
            str(r["k"]): r["_row_id"]
            for r in t.to_df(with_row_ids=True).collect()
        }
        assert ids == expected["facts"]["row_ids"]
        # appends allocate past the foreign domain high-water mark
        t.append(spark.createDataFrame([(9, "z")], "k int, v string"))
        new_ids = sorted(
            r["_row_id"]
            for r in t.to_df(with_row_ids=True).collect()
        )
        assert new_ids == [0, 1, 2, 3, 4, 5]

    def test_stats_parsed_struct_reencodes(self, spark, tmp_path):
        """A writeStatsAsJson=false checkpoint (struct-only stats) must
        still feed file skipping: the replayed adds carry re-encoded
        JSON stats matching the struct's bounds."""
        path, expected = _load(tmp_path, "stats_parsed_checkpoint")
        t = DeltaProtocolTable(spark, path)
        snap = t.snapshot()
        want = expected["facts"]["stats_from_struct"]
        for fname, (lo, hi) in want.items():
            st = snap.file_stats(fname)
            assert st is not None, fname
            assert st["minValues"]["k"] == lo
            assert st["maxValues"]["k"] == hi
            assert st["numRecords"] == 3
        # and the bounds actually prune: a keyed delete of one file's
        # range touches exactly that file
        res = t.delete_where("k = 11")
        assert res["touched_files"] == 1

    def test_write_stats_as_struct_roundtrip(self, spark, tmp_path):
        """delta.checkpoint.writeStatsAsStruct: this writer's own
        checkpoints carry the typed stats_parsed struct, and a reader
        given ONLY the struct (stats column nulled) reconstructs the
        same bounds — both conformance directions."""
        import datetime as dt

        import pyarrow.parquet as pq

        df = spark.createDataFrame(
            [(i, f"v{i}", dt.date(2020, 1, 1 + i)) for i in range(5)],
            "k int, v string, d date",
        ).coalesce(1)
        t = DeltaProtocolTable.create(
            spark, str(tmp_path / "s"), df,
            properties={
                "delta.checkpoint.writeStatsAsStruct": "true",
                "delta.checkpointInterval": "1",
            },
        )
        t.append(df)  # v1 → checkpoint at interval 1
        cp = os.path.join(
            t.path, "_delta_log", "%020d.checkpoint.parquet" % 1
        )
        tbl = pq.read_table(cp)
        adds = [a for a in tbl.column("add").to_pylist() if a]
        assert all(a.get("stats_parsed") for a in adds)
        sp = adds[0]["stats_parsed"]
        assert sp["numRecords"] == 5
        assert sp["minValues"]["k"] == 0 and sp["maxValues"]["k"] == 4
        assert sp["minValues"]["d"] == dt.date(2020, 1, 1)
        # reverse direction: null out the JSON stats, drop the replay
        # cache, and confirm the struct alone feeds file skipping
        import pyarrow as pa

        cols = {n: tbl.column(n) for n in tbl.schema.names}
        new_adds = [
            None if a is None else dict(a, stats=None)
            for a in tbl.column("add").to_pylist()
        ]
        add_field = tbl.schema.field("add").type
        cols["add"] = pa.array(new_adds, type=add_field)
        pq.write_table(
            pa.table(cols), cp, compression="snappy"
        )
        clear_replay_cache(t.path)
        t2 = DeltaProtocolTable(spark, t.path)
        st = t2.snapshot()
        some = next(iter(st.files))
        fs = st.file_stats(some)
        assert fs is not None and fs["minValues"]["k"] == 0
        assert t2.to_df().count() == 10

    def test_write_stats_as_json_false(self, spark, tmp_path):
        """writeStatsAsJson=false + writeStatsAsStruct=true: checkpoint
        adds carry ONLY the struct; replay re-encodes it and skipping
        survives a checkpoint-based cold read."""
        import pyarrow.parquet as pq

        df = spark.createDataFrame(
            [(i, i * 2) for i in range(20)], "k int, v int"
        ).coalesce(2)
        t = DeltaProtocolTable.create(
            spark, str(tmp_path / "j"), df,
            properties={
                "delta.checkpoint.writeStatsAsStruct": "true",
                "delta.checkpoint.writeStatsAsJson": "false",
                "delta.checkpointInterval": "1",
            },
        )
        t.append(df)
        cp = os.path.join(
            t.path, "_delta_log", "%020d.checkpoint.parquet" % 1
        )
        adds = [a for a in pq.read_table(cp).column("add").to_pylist()
                if a]
        assert all(a.get("stats") is None for a in adds)
        assert all(a.get("stats_parsed") for a in adds)
        clear_replay_cache(t.path)
        t2 = DeltaProtocolTable(spark, t.path)
        snap = t2.snapshot()
        assert all(
            snap.file_stats(p) is not None for p in snap.files
        )
        assert t2.to_df().count() == 40

    def test_partitioned_literal_attach(self, spark, tmp_path):
        path, _ = _load(tmp_path, "partitioned")
        t = DeltaProtocolTable(spark, path)
        # files exclude the partition column and use NO col=val dirs;
        # the values attach from the log, and partition pruning still
        # reads only matching files
        east = t.to_df().where("p = 'east'")
        assert sorted(r["k"] for r in east.collect()) == [1, 2]

    def test_corpus_is_foreign(self):
        """The generator script must not import the engine — the corpus
        is only evidence if another hand wrote it."""
        gen = os.path.join(
            os.path.dirname(os.path.dirname(os.path.abspath(__file__))),
            "scripts", "build_conformance_corpus.py",
        )
        src = open(gen).read()
        assert "import mack_spark" not in src
        assert "from mack_spark" not in src


# --------------------------------------------------------------- writer

REQUIRED = {
    "add": {"path", "partitionValues", "size", "modificationTime",
            "dataChange"},
    "remove": {"path", "dataChange"},
    "metaData": {"id", "format", "schemaString", "partitionColumns",
                 "configuration"},
    "protocol": {"minReaderVersion", "minWriterVersion"},
    "txn": {"appId", "version"},
    "domainMetadata": {"domain", "configuration", "removed"},
    "cdc": {"path", "partitionValues", "size", "dataChange"},
}


def _sweep_log(path) -> int:
    """Assert spec field-presence on every action line of a log this
    ENGINE wrote. Returns the number of actions checked."""
    logdir = os.path.join(path, "_delta_log")
    n = 0
    for fn in sorted(os.listdir(logdir)):
        if not (fn.endswith(".json") and fn[:20].isdigit()):
            continue
        for line in open(os.path.join(logdir, fn)):
            line = line.strip()
            if not line:
                continue
            a = json.loads(line)
            assert len(a) == 1, f"multi-key action line in {fn}: {a}"
            kind, val = next(iter(a.items()))
            if kind == "commitInfo":
                assert "timestamp" in val, fn
                n += 1
                continue
            assert kind in REQUIRED, f"unknown action {kind} in {fn}"
            missing = REQUIRED[kind] - set(val)
            assert not missing, f"{kind} in {fn} missing {missing}"
            if kind == "metaData":
                s = json.loads(val["schemaString"])
                assert s["type"] == "struct" and s["fields"], fn
                assert val["format"]["provider"] == "parquet", fn
            if kind == "protocol":
                if val["minWriterVersion"] == 7:
                    assert "writerFeatures" in val, fn
                if val.get("minReaderVersion") == 3:
                    assert "readerFeatures" in val, fn
            if kind == "add":
                assert isinstance(val["partitionValues"], dict), fn
                assert val["size"] >= 0, fn
                dv = val.get("deletionVector")
                if dv is not None:
                    assert {"storageType", "pathOrInlineDv",
                            "sizeInBytes", "cardinality"} <= set(dv), fn
            n += 1
    return n


class TestWriterShape:
    def test_writer_log_lines_spec_shaped(self, spark, tmp_path):
        from pyspark.sql import functions as F

        path = str(tmp_path / "wshape")
        df = spark.createDataFrame(
            [(i, f"r{i}", "e" if i % 2 == 0 else "w") for i in range(40)],
            "k int, v string, p string",
        )
        t = DeltaProtocolTable.create(
            spark, path, df, partition_by=["p"],
            properties={"delta.checkpointInterval": "3"},
        )
        t.append(df.select((F.col("k") + 100).alias("k"), "v", "p"))
        t.delete_where("k % 7 = 1")
        t.update_where("k = 2", {"v": "'u'"})
        t.optimize(target_file_bytes=1 << 20)
        t.append(
            df.limit(1), txn_app_id="shape-app", txn_version=1
        )                                     # SetTransaction
        n = _sweep_log(path)
        # second table: deletion-vector writes (unpartitioned — DV
        # descriptors are per-file)
        path2 = str(tmp_path / "wshape-dv")
        t2 = DeltaProtocolTable.create(
            spark, path2, df.select("k", "v"),
            properties={"delta.enableDeletionVectors": "true"},
        )
        t2.delete_where("k % 7 = 1")          # DV write
        n += _sweep_log(path2)
        assert n >= 20  # real coverage, not an empty sweep

    def test_writer_checkpoint_spec_shaped(self, spark, tmp_path):
        import pyarrow.parquet as pq

        path = str(tmp_path / "wcp")
        t = DeltaProtocolTable.create(
            spark, path,
            spark.createDataFrame([(1, "a")], "k int, v string"),
            properties={"delta.checkpointInterval": "2"},
        )
        for i in range(4):
            t.append(spark.createDataFrame(
                [(10 + i, "b")], "k int, v string"
            ))
        logdir = os.path.join(path, "_delta_log")
        cps = [f for f in os.listdir(logdir)
               if f.endswith(".checkpoint.parquet")]
        assert cps, "no checkpoint written"
        tbl = pq.read_table(os.path.join(logdir, sorted(cps)[-1]))
        names = set(tbl.schema.names)
        assert {"protocol", "metaData", "add"} <= names
        # exactly one protocol and one metaData row, each complete
        protos = [p for p in tbl.column("protocol").to_pylist() if p]
        metas = [m for m in tbl.column("metaData").to_pylist()
                 if m and any(v is not None for v in m.values())]
        assert len([p for p in protos
                    if any(v is not None for v in p.values())]) == 1
        assert len(metas) == 1
        assert metas[0]["schemaString"]
        # _last_checkpoint parses and points at the file
        lc = json.load(open(os.path.join(logdir, "_last_checkpoint")))
        assert "%020d.checkpoint.parquet" % lc["version"] in cps

    def test_writer_output_reads_back_foreign_style(
        self, spark, tmp_path
    ):
        """Read the engine's own table through a FRESH handle with the
        replay cache dropped — the on-disk artifacts alone must carry
        the state (no in-memory crutch)."""
        path = str(tmp_path / "wrt")
        t = DeltaProtocolTable.create(
            spark, path,
            spark.createDataFrame(
                [(i, f"x{i}") for i in range(10)], "k int, v string"
            ),
        )
        t.delete_where("k >= 8")
        clear_replay_cache(path)
        t2 = DeltaProtocolTable(spark, path)
        assert sorted(r["k"] for r in t2.to_df().collect()) == list(
            range(8)
        )


class TestRound15Variants:
    """Variant-specific assertions for the r15 corpus additions."""

    def test_stats_parsed_dv_bounds_and_mask(self, spark, tmp_path):
        path, expected = _load(tmp_path, "stats_parsed_dv_checkpoint")
        t = DeltaProtocolTable(spark, path)
        snap = t.snapshot()
        # struct-only stats re-encoded: bounds present for the DV-free
        # file, and they prune a keyed delete to exactly that file
        want = expected["facts"]["stats_from_struct"]
        for fname, (lo, hi) in want.items():
            st = snap.file_stats(fname)
            assert st is not None, fname
            assert st["minValues"]["k"] == lo
            assert st["maxValues"]["k"] == hi
        res = t.delete_where("k = 102")
        assert res["touched_files"] == 1
        # and the DV'd rows stayed deleted through the checkpoint read
        ks = {r["k"] for r in t.to_df().collect()}
        assert 1 not in ks and 4 not in ks and 102 not in ks

    def test_liquid_clustering_surfaced_and_incremental(
        self, spark, tmp_path
    ):
        path, expected = _load(tmp_path, "liquid_clustered")
        t = DeltaProtocolTable(spark, path)
        snap = t.snapshot()
        assert t.clustering_columns(snap) == (
            expected["facts"]["clustering_columns"]
        )
        # foreign liquid tags honored: files tagged by the foreign
        # clustering pass but SMALL are still re-clustered; what
        # matters is the tail is picked up and rows survive exactly
        before = set(snap.files)
        assert set(expected["facts"]["liquid_files"]) <= before
        res = t.optimize(min_file_bytes=1)  # right-size floor: 1 byte
        snap2 = t.snapshot()
        # the liquid file was right-sized and DV-free → untouched
        for f in expected["facts"]["liquid_files"]:
            assert f in snap2.files, "foreign liquid file was rewritten"
        for f in expected["facts"]["tail_files"]:
            assert f not in snap2.files, "untagged tail not re-clustered"
        got = sorted([list(r) for r in t.to_df().collect()])
        assert got == sorted(expected["rows"])
        assert res["rewritten"] >= 1

    def test_preview_widening_under_mapping(self, spark, tmp_path):
        path, expected = _load(tmp_path, "type_widening_preview_mapped")
        t = DeltaProtocolTable(spark, path)
        snap = t.snapshot()
        assert snap.physical_names() == expected["facts"]["physical"]
        types = {f.name: f.dataType.simpleString()
                 for f in snap.schema.fields}
        assert types == {"k": "bigint", "amt": "double"}
        # this writer can continue the table: append through the
        # mapped+widened schema and read back
        t.append(spark.createDataFrame([(7, 7.5)], "k long, amt double"))
        got = sorted(r["k"] for r in t.to_df().collect())
        assert got == [1, 2, 7, 2**41]
