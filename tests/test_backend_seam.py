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
#    user asked for, not managed-table mutations).
_RAW_WRITE_ALLOWED = {"tables.py", os.path.join("sources", "__init__.py")}


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
    offenders = []
    for rel, src in _py_sources():
        if rel == "tables.py":
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
