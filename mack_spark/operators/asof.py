"""As-of (nearest-prior) join — an operator the DataFrame API lacks.

The naive formulation is a range join (``l.key = r.key AND l.ts >=
r.ts`` then keep the max ``r.ts`` per left row), which Spark executes
as a broadcast-nested-loop or an exploding sort-merge over the
inequality — O(rows_l × rows_r) per key in the worst case. This
implementation instead UNIONS the two sides and takes a running
``last(ignorenulls)`` over a (key, time)-sorted window:

* one shuffle total (on the key columns), no join operator at all;
* per-row state is O(1) — the window frame is
  ``rowsBetween(unboundedPreceding, currentRow)`` with ``last`` —
  so executors stream each key-group once;
* 100 TB-safe: cost is sort+shuffle of |L| + |R| rows, independent of
  match fan-out (the failure mode of the range-join form).

Semantics: backward inclusive — each left row matches the right row
with the greatest ``ts_col`` <= the left row's, per key. Right rows at
the exact same timestamp as a left row DO match (right sorts before
left on ties). If multiple right rows share (key, ts), pass
``right_tiebreak_col`` to make the winner deterministic (the greatest
tiebreak value wins), mirroring e.g. DuckDB's ASOF JOIN after an
equivalent dedup.
"""

from __future__ import annotations

from typing import List, Optional

from pyspark.sql import DataFrame, Window
from pyspark.sql import functions as F
from pyspark.sql import types as T


def asof_join(
    left: DataFrame,
    right: DataFrame,
    key_cols: List[str],
    ts_col: str,
    right_value_cols: List[str],
    suffix: str = "_matched",
    right_tiebreak_col: Optional[str] = None,
) -> DataFrame:
    """For each left row, attach the most recent right row at or before
    its timestamp (per key). Right-side columns come back as
    ``<name><suffix>`` (including the timestamp); unmatched left rows
    keep NULLs.

    The right row travels as ONE struct ``(ts, *right_value_cols)`` and
    the window forward-fills that struct atomically, so every matched
    column comes from the SAME right row — a per-column
    ``last(ignorenulls)`` would stitch a genuinely-NULL value column
    from an older right row, diverging from true as-of semantics (and
    from DuckDB's ASOF JOIN) on NULL-bearing right rows.
    """
    left_only = [c for c in left.columns if c not in key_cols and c != ts_col]
    r_cols = list(right_value_cols)
    if right_tiebreak_col and right_tiebreak_col not in r_cols:
        r_cols.append(right_tiebreak_col)

    payload_type = T.StructType(
        [T.StructField(ts_col, right.schema[ts_col].dataType)]
        + [T.StructField(c, right.schema[c].dataType) for c in r_cols]
    )
    l_side = left.select(
        *key_cols,
        F.col(ts_col),
        F.lit(1).alias("__side"),
        *[F.col(c) for c in left_only],
        F.lit(None).cast(payload_type).alias("__r"),
    )
    r_side = right.select(
        *key_cols,
        F.col(ts_col),
        F.lit(0).alias("__side"),
        *[F.lit(None).cast(left.schema[c].dataType).alias(c) for c in left_only],
        F.struct(
            F.col(ts_col), *[F.col(c) for c in r_cols]
        ).cast(payload_type).alias("__r"),
    )

    order = [F.col(ts_col).asc(), F.col("__side").asc()]
    if right_tiebreak_col:
        order.append(
            F.col("__r").getField(right_tiebreak_col).asc_nulls_first()
        )
    w = (
        Window.partitionBy(*key_cols)
        .orderBy(*order)
        .rowsBetween(Window.unboundedPreceding, Window.currentRow)
    )
    filled = F.last("__r", ignorenulls=True).over(w)
    matched = [
        filled.getField(c).alias(f"{c}{suffix}")
        for c in [ts_col, *right_value_cols]
    ]
    combined = l_side.unionByName(r_side)
    return (
        combined.select(*key_cols, ts_col, "__side", *left_only, *matched)
        .filter(F.col("__side") == 1)
        .drop("__side")
    )
