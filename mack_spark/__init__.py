"""mack_spark — a PySpark-native table-operations and data-pipeline engine.

Re-expresses the full capability surface of the reference library
(MrPowers/mack, /root/reference/mack/__init__.py) as idiomatic PySpark:
stateless functions over ``(ManagedTable | DataFrame)`` inputs, zero
row-at-a-time UDFs in the core, every heavy operation delegated to
Catalyst (predicate pushdown, column pruning, AQE, broadcast joins).

The reference depends on Delta Lake for its transactional substrate.
This engine runs on any of two backends:

* ``delta`` (when the ``delta-spark`` package is importable) — production
  path: MERGE is executed by Delta's file-pruned rewrite.
* versioned parquet (always available) — a minimal ACID-ish table layout
  (``v=N`` snapshot dirs + a JSON meta pointer) used for tests and
  environments without Delta. Operators express the *post-state* as a
  single lazy DataFrame plan, so the physical commit is one write.

Beyond the reference surface, :mod:`mack_spark.operators` adds the
LLM-data-pipeline layer (exact/near dedup, similarity search, text
analysis, multimodal plumbing) and :mod:`mack_spark.streaming` the
Structured Streaming variants; all designed for 100 TB scale (see each
docstring's SCALE note).
"""

from mack_spark.fmt import humanize_bytes, humanize_bytes_binary
from mack_spark.sources.delta_log import DeltaProtocolTable
from mack_spark.tables import (
    ConcurrentModificationError,
    ManagedTable,
    copy_table,
    delete_where,
    update_where,
    rename_table,
    rename_catalog_table,
    latest_version,
    file_sizes,
    optimize_compact,
    vacuum,
    shallow_clone,
    table_changes,
    show_file_sizes,
    delta_file_sizes,
    show_delta_file_sizes,
    rename_delta_table,
)
from mack_spark.keys import (
    is_composite_key_candidate,
    find_composite_key_candidates,
    with_md5_cols,
)
from mack_spark.scd import type_2_scd_upsert, type_2_scd_generic_upsert
from mack_spark.sql_dml import DeltaSqlDml, execute_dml
from mack_spark.sql_ddl import DeltaSqlSession
from mack_spark.dedup import (
    kill_duplicates,
    drop_duplicates_pkey,
    drop_duplicates,
    append_without_duplicates,
)
from mack_spark.appends import (
    validate_append,
    constraint_append,
    constraint_append_protocol,
)
from mack_spark.rollup import (
    create_rollup,
    refresh_rollup_incremental,
    create_rollup_protocol,
    refresh_rollup_incremental_protocol,
    rollup_as_view,
)

__version__ = "0.1.0"

__all__ = [
    "update_where",
    "delete_where",
    "ConcurrentModificationError",
    "ManagedTable",
    "DeltaProtocolTable",
    "type_2_scd_upsert",
    "type_2_scd_generic_upsert",
    "kill_duplicates",
    "drop_duplicates_pkey",
    "drop_duplicates",
    "append_without_duplicates",
    "validate_append",
    "constraint_append",
    "constraint_append_protocol",
    "create_rollup",
    "refresh_rollup_incremental",
    "create_rollup_protocol",
    "refresh_rollup_incremental_protocol",
    "rollup_as_view",
    "copy_table",
    "rename_table",
    "rename_catalog_table",
    "latest_version",
    "file_sizes",
    "optimize_compact",
    "vacuum",
    "shallow_clone",
    "table_changes",
    "show_file_sizes",
    "delta_file_sizes",
    "show_delta_file_sizes",
    "rename_delta_table",
    "is_composite_key_candidate",
    "find_composite_key_candidates",
    "with_md5_cols",
    "humanize_bytes",
    "humanize_bytes_binary",
    "DeltaSqlDml",
    "DeltaSqlSession",
    "execute_dml",
]
