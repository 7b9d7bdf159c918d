"""The storage-backend seam: operators mutate tables ONLY through the
two methods a Delta backend replaces (``append`` / ``merge_overwrite``),
so swapping ManagedTable for a Delta-backed table is a construction-time
choice, never an operator change (VERDICT r1 item 4; reference substrate
mack/__init__.py:125-139, :190-192)."""

import inspect
import os
import re

import pytest

import mack_spark
from mack_spark import tables
from mack_spark.tables import DeltaBackedTable, ManagedTable, open_table

PKG_DIR = os.path.dirname(mack_spark.__file__)

# Modules allowed to issue raw DataFrame writes:
#  - tables.py IS the backend layer;
#  - sources/ is the user-facing sink module (writes plain files the
#    user asked for, not managed-table mutations);
#  - sources/delta_log.py IS a storage backend too (the open-protocol
#    Delta writer commits parquet data files + _delta_log actions).
_RAW_WRITE_ALLOWED = {
    "tables.py",
    os.path.join("sources", "__init__.py"),
    os.path.join("sources", "delta_log.py"),
}


def _py_sources():
    for root, _dirs, names in os.walk(PKG_DIR):
        for n in names:
            if n.endswith(".py"):
                full = os.path.join(root, n)
                yield os.path.relpath(full, PKG_DIR), open(full).read()


def test_no_raw_writes_outside_backend_and_sinks():
    offenders = []
    for rel, src in _py_sources():
        if rel in _RAW_WRITE_ALLOWED:
            continue
        for i, line in enumerate(src.splitlines(), 1):
            if re.search(r"\.write\.|\bsaveAsTable\(|\.writeTo\(", line):
                offenders.append(f"{rel}:{i}: {line.strip()}")
    assert offenders == [], (
        "raw write call sites outside the backend/sink layer:\n"
        + "\n".join(offenders)
    )


def test_mutations_route_through_append_or_merge_overwrite_only():
    """Outside the backend layer, the only table-mutating calls are
    ``.append(`` on a table object and ``.merge_overwrite(`` — never
    ``.overwrite(`` (backend-internal) nor meta-file surgery."""
    # sql_ddl.py is a statement→backend DISPATCHER, not an operator:
    # CREATE OR REPLACE ... AS SELECT is literally the overwrite
    # operation, so the front-end may name it (same standing as
    # sql_dml.py routing MERGE/UPDATE/DELETE onto the backend methods)
    dispatcher_allowed = {"sql_ddl.py"}
    offenders = []
    for rel, src in _py_sources():
        if rel == "tables.py" or rel in dispatcher_allowed:
            continue
        for i, line in enumerate(src.splitlines(), 1):
            if re.search(r"\btable\.overwrite\(|\._write_meta\(\s*\{", line):
                offenders.append(f"{rel}:{i}: {line.strip()}")
    assert offenders == [], (
        "table mutations bypassing the seam:\n" + "\n".join(offenders)
    )


def test_open_table_picks_managed_backend_here(spark, tmp_path):
    path = str(tmp_path / "t")
    ManagedTable.create(
        spark, path, df=spark.createDataFrame([(1, "a")], ["id", "v"])
    )
    t = open_table(spark, path)
    assert isinstance(t, ManagedTable)
    assert t.toDF().count() == 1


def test_delta_adapter_matches_managed_interface():
    """Every public method/property operators use on ManagedTable exists
    on DeltaBackedTable with a compatible signature."""
    needed = [
        "toDF", "append", "merge_overwrite", "overwrite", "detail",
        "history", "set_properties", "add_constraint", "declared_schema",
    ]
    for name in needed:
        assert hasattr(DeltaBackedTable, name), f"adapter missing {name}"
    for name in ("append", "merge_overwrite", "overwrite"):
        m_sig = inspect.signature(getattr(ManagedTable, name))
        d_sig = inspect.signature(getattr(DeltaBackedTable, name))
        assert list(m_sig.parameters) == list(d_sig.parameters), name


def test_delta_adapter_requires_delta(spark, tmp_path):
    if tables._delta_table_cls() is not None:
        pytest.skip("delta-spark installed; adapter is constructible")
    with pytest.raises(ImportError):
        DeltaBackedTable(spark, str(tmp_path))


# ------------------------------------------------------------- keyed merge
# KeyedMerge clause construction, driven with a recording fake so the
# Delta MERGE path is interface-tested without delta-spark installed.


class _FakeBuilder:
    def __init__(self, log):
        self.log = log

    def merge(self, source, condition):
        self.log.append(("merge", condition))
        return self

    def whenMatchedUpdate(self, condition=None, set=None):
        self.log.append(("whenMatchedUpdate", condition, dict(set)))
        return self

    def whenMatchedDelete(self, condition=None):
        self.log.append(("whenMatchedDelete", condition))
        return self

    def whenNotMatchedInsertAll(self, condition=None):
        self.log.append(("whenNotMatchedInsertAll", condition))
        return self

    def whenNotMatchedInsert(self, condition=None, values=None):
        self.log.append(("whenNotMatchedInsert", condition, dict(values)))
        return self

    def execute(self):
        self.log.append(("execute",))


class _FakeDeltaTable:
    def __init__(self):
        self.log = []

    def alias(self, a):
        self.log.append(("alias", a))
        return _FakeBuilder(self.log)


def _scd_frames(spark):
    base = spark.createDataFrame(
        [(1, "A", True, None, None)],
        "pkey int, attr string, is_current boolean, effective_time timestamp, end_time timestamp",
    )
    updates = spark.createDataFrame(
        [(1, "A2", None)], "pkey int, attr string, effective_time timestamp"
    )
    return base, updates


def test_scd2_keyed_merge_compiles_reference_clauses(spark):
    from mack_spark.scd import scd2_keyed_merge
    from mack_spark.tables import apply_keyed_merge

    base, updates = _scd_frames(spark)
    km = scd2_keyed_merge(
        base, updates, "pkey", ["attr"],
        "is_current", "effective_time", "end_time",
    )
    # staged source carries the dual-row mergeKey idiom
    assert km.source.columns[0] == "mergeKey"
    staged = {(r["mergeKey"], r["attr"]) for r in km.source.collect()}
    assert staged == {(None, "A2"), (1, "A2")}

    fake = _FakeDeltaTable()
    apply_keyed_merge(fake, km)
    ops = [e[0] for e in fake.log]
    assert ops == ["alias", "merge", "whenMatchedUpdate", "whenNotMatchedInsert", "execute"]
    assert fake.log[1][1] == "base.`pkey` = staged.mergeKey"
    upd_cond, upd_set = fake.log[2][1], fake.log[2][2]
    assert "base.`is_current` = true" in upd_cond and "staged.`attr` <> base.`attr`" in upd_cond
    assert upd_set == {"is_current": "false", "end_time": "staged.`effective_time`"}
    ins_cond, ins = fake.log[3][1], fake.log[3][2]
    assert ins_cond is None  # reference scd2 has an unconditional insert
    assert ins["pkey"] == "staged.`pkey`" and ins["is_current"] == "true"
    assert ins["end_time"] == "null"


def test_kill_duplicates_keyed_merge_is_delete(spark):
    from mack_spark.tables import KeyedMerge, apply_keyed_merge

    src = spark.createDataFrame([(1,)], ["c1"])
    km = KeyedMerge(source=src, condition="t.`c1` <=> s.`c1`", matched_delete=True)
    fake = _FakeDeltaTable()
    apply_keyed_merge(fake, km)
    assert ("whenMatchedDelete", None) in fake.log
    assert ("whenNotMatchedInsertAll",) not in fake.log


def test_managed_table_ignores_keyed_merge(spark, tmp_path):
    """The parquet backend commits the post-state even when a KeyedMerge
    rides along (it has no MERGE executor)."""
    import mack_spark as mk

    t = ManagedTable.create(
        spark, str(tmp_path / "km"),
        df=spark.createDataFrame([(1, "a"), (2, "a"), (3, "b")], ["pkey", "c1"]),
    )
    mk.kill_duplicates(t, ["c1"])
    assert [r["c1"] for r in t.toDF().collect()] == ["b"]


# -------------------------------------------------- descriptor semantics
# The recording-fake tests above pin the SHAPE of the compiled clauses;
# these pin their MEANING: interpreting the KeyedMerge descriptor with a
# faithful pure-DataFrame MERGE executor (tests/merge_interpreter.py)
# must reproduce scd2_post_state — the plan the parquet backend commits
# — on randomized bases and update batches. A wrong clause set,
# condition string, or staging expression diverges here.


def _random_scd2_inputs(spark, seed):
    import random

    rng = random.Random(seed)
    attrs = ["red", "blue", "green", None]
    eff0 = "2020-01-01"
    base_rows = []
    for pk in range(rng.randint(3, 12)):
        versions = rng.randint(0, 2)  # 0 = pkey absent from base
        for v in range(versions):
            is_cur = v == versions - 1 and rng.random() < 0.85
            base_rows.append(
                (
                    pk,
                    rng.choice(attrs),
                    is_cur,
                    f"{eff0} 00:00:0{v}",
                    None if is_cur else f"{eff0} 00:00:0{v + 1}",
                )
            )
    upd_rows = []
    for pk in rng.sample(range(16), rng.randint(1, 8)):  # unique pkeys
        upd_rows.append((pk, rng.choice(attrs), "2021-06-01 00:00:00"))
    from pyspark.sql import functions as F

    base = spark.createDataFrame(
        base_rows or [(0, "red", True, f"{eff0} 00:00:00", None)],
        "pkey int, attr string, is_current boolean, effective_time string, end_time string",
    ).select(
        "pkey",
        "attr",
        "is_current",
        F.to_timestamp("effective_time").alias("effective_time"),
        F.to_timestamp("end_time").alias("end_time"),
    )
    updates = spark.createDataFrame(
        upd_rows, "pkey int, attr string, effective_time string"
    ).select("pkey", "attr", F.to_timestamp("effective_time").alias("effective_time"))
    return base, updates


# slow (~55 s): exhaustive descriptor/post-state equivalence; the per-operation seam tests pin the contract
@pytest.mark.slow
def test_keyed_merge_descriptor_equals_post_state(spark):
    from merge_interpreter import interpret_keyed_merge

    from mack_spark.scd import scd2_keyed_merge, scd2_post_state

    for seed in range(12):
        base, updates = _random_scd2_inputs(spark, seed)
        km = scd2_keyed_merge(
            base, updates, "pkey", ["attr"],
            "is_current", "effective_time", "end_time",
        )
        merged = interpret_keyed_merge(base, km)
        expected = scd2_post_state(
            base, updates, "pkey", ["attr"],
            "is_current", "effective_time", "end_time",
        )
        nonesafe = lambda t: tuple((v is None, v) for v in t)
        a = sorted((tuple(r) for r in merged.collect()), key=nonesafe)
        e = sorted((tuple(r) for r in expected.collect()), key=nonesafe)
        assert a == e, f"seed={seed}: merge clauses diverge from post-state\n{a}\n{e}"


def test_keyed_merge_interpreter_rejects_ambiguous_source(spark):
    """Duplicate update pkeys match one target row twice — the
    interpreter must refuse like Delta does, not pick a winner."""
    import pytest as _pytest

    from merge_interpreter import interpret_keyed_merge

    from mack_spark.scd import scd2_keyed_merge

    from pyspark.sql import functions as F

    base = spark.createDataFrame(
        [(1, "red", True, "2020-01-01 00:00:00", None)],
        "pkey int, attr string, is_current boolean, effective_time string, end_time string",
    ).select(
        "pkey", "attr", "is_current",
        F.to_timestamp("effective_time").alias("effective_time"),
        F.to_timestamp("end_time").alias("end_time"),
    )
    updates = spark.createDataFrame(
        [(1, "blue", "2021-01-01 00:00:00"), (1, "green", "2021-01-01 00:00:00")],
        "pkey int, attr string, effective_time string",
    ).select("pkey", "attr", F.to_timestamp("effective_time").alias("effective_time"))
    km = scd2_keyed_merge(
        base, updates, "pkey", ["attr"],
        "is_current", "effective_time", "end_time",
    )
    with _pytest.raises(ValueError, match="ambiguous"):
        interpret_keyed_merge(base, km).collect()


def test_insert_condition_compiles_and_interprets(spark):
    """The rollup-refresh descriptor shape: conditional update, delete
    for zero-count groups, CONDITIONAL insert. The native compile must
    attach the insert condition; the interpreter must honor it (a new
    group with n=0 appears nowhere)."""
    from conftest import assert_df_equality
    from merge_interpreter import interpret_keyed_merge

    from mack_spark.tables import KeyedMerge, apply_keyed_merge

    base = spark.createDataFrame(
        [("a", 2, 10), ("b", 1, 5)], "grp string, n_events int, fp int"
    )
    src = spark.createDataFrame(
        [("a", 3, 12), ("b", 0, 0), ("c", 0, 0), ("d", 4, 7)],
        "grp string, n_events int, fp int",
    )
    km = KeyedMerge(
        source=src,
        condition="t.`grp` <=> s.`grp`",
        matched_update={"n_events": "s.`n_events`", "fp": "s.`fp`"},
        matched_update_condition="s.`n_events` > 0",
        matched_delete=True,
        not_matched_insert="*",
        not_matched_condition="s.`n_events` > 0",
        target_key_col="grp",
        source_key_col="grp",
        null_safe=True,
    )
    fake = _FakeDeltaTable()
    apply_keyed_merge(fake, km)
    ops = {e[0]: e for e in fake.log}
    assert ops["whenNotMatchedInsertAll"][1] == "s.`n_events` > 0"
    assert ops["whenMatchedUpdate"][1] == "s.`n_events` > 0"
    assert ops["whenMatchedDelete"][1] is None

    out = interpret_keyed_merge(base, km)
    expected = spark.createDataFrame(
        [("a", 3, 12), ("d", 4, 7)], "grp string, n_events int, fp int"
    )
    assert_df_equality(out, expected)


def test_delete_update_where_route_native_on_delta(spark):
    """delete_where/update_where dispatch to the Delta adapter's native
    DeltaTable.delete/update instead of the parquet post-state path."""
    from mack_spark.tables import delete_where, update_where

    class _Rec:
        def __init__(self):
            self.log = []

        def delete(self, condition):
            self.log.append(("delete", condition))

        def update(self, condition=None, set=None):
            self.log.append(("update", condition, dict(set)))

    fake = DeltaBackedTable.__new__(DeltaBackedTable)
    fake.spark = spark
    fake.path = "/nowhere"
    fake._dt = _Rec()

    delete_where(fake, "k < 10")
    update_where(fake, "k = 1", {"v": "upper(v)"})
    assert fake._dt.log == [
        ("delete", "k < 10"),
        ("update", "k = 1", {"v": "upper(v)"}),
    ]


def test_delta_adapter_has_delete_update():
    for name in ("delete", "update"):
        assert hasattr(DeltaBackedTable, name)
