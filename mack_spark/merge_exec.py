"""Pure-DataFrame interpreter for :class:`mack_spark.tables.KeyedMerge`.

Executes the exact clause semantics ``DeltaTable.merge`` applies to the
descriptor subset ``apply_keyed_merge`` emits (reference
mack/__init__.py:125-139):

* target rows matched by the ``condition`` get the FIRST applicable
  matched clause, in the order apply_keyed_merge registers them
  (update, then delete); a NULL clause condition means not-applicable
  (three-valued SQL, same as Delta);
* a target row matched by MORE THAN ONE source row is an error
  (Delta's ``DeltaUnsupportedOperationException`` for ambiguous merges);
* source rows matching no target row take the not-matched insert
  clause; inserted values are cast to the target schema.

Execution shape mirrors Delta's real MERGE two-phase plan:

* **phase 1 — ambiguity probe**: one inner join projected down to
  ``__tid`` + the condition's columns (Catalyst column-prunes the scan
  to just the join keys), grouped to detect a target row matched by
  multiple source rows. This is the cheap, key-only pass.
* **phase 2 — single rewrite join**: ONE ``full_outer`` join with
  presence markers on both sides; every output branch (updated /
  kept-matched / delete-dropped / unmatched-target / inserted) is a
  CASE over that one join, and the target-schema casts are folded into
  the same single projection. The touched data moves through exactly
  one join, where the previous interpreter executed the target×source
  join four times (inner + probe + two anti joins) and stacked
  O(2·width) ``withColumn`` cast projections on top.

Two consumers: tests/test_backend_seam.py verifies that interpreting
``scd2_keyed_merge`` equals ``scd2_post_state`` on arbitrary inputs,
and :meth:`mack_spark.sources.delta_log.DeltaProtocolTable.merge`
executes descriptors through it as phase 2 of a real, file-pruned
Delta-protocol MERGE commit.
"""

from pyspark.sql import DataFrame
from pyspark.sql import functions as F

# marker columns; stripped from the output projection
_TID = "__mack_merge_tid"
_SRC = "__mack_merge_src"


def interpret_keyed_merge(
    base: DataFrame, km, assume_unambiguous: bool = False
) -> DataFrame:
    """``assume_unambiguous=True`` skips the phase-1 probe; callers pass
    it when they have already PROVEN no target row can match two source
    rows (e.g. :meth:`DeltaProtocolTable.merge` observes all-unique
    source keys under a condition that implies key equality)."""
    t, s = km.target_alias, km.source_alias
    out_cols = base.columns
    tb = base.withColumn(_TID, F.monotonically_increasing_id()).alias(t)
    src = km.source.withColumn(_SRC, F.lit(True)).alias(s)
    on = F.expr(km.condition)

    # phase 1: ambiguity probe. groupBy(__tid).count() only references
    # the join condition's columns, so Catalyst prunes both scans to the
    # key columns — this is the "touched-key detect" pass, not a second
    # read of the data columns.
    if not assume_unambiguous:
        dup = (
            tb.join(src, on, "inner")
            .groupBy(_TID)
            .count()
            .filter(F.col("count") > 1)
            .limit(1)
            .count()
        )
        if dup:
            raise ValueError(
                "ambiguous merge: a target row is matched by multiple"
                " source rows"
            )

    # phase 2: one full-outer rewrite join
    joined = tb.join(src, on, "full_outer")
    t_present = F.col(f"{t}.`{_TID}`").isNotNull()
    s_present = F.col(f"{s}.`{_SRC}`").isNotNull()

    if km.matched_update is None:
        upd_applies = F.lit(False)
    elif km.matched_update_condition is None:
        upd_applies = F.lit(True)
    else:
        upd_applies = F.coalesce(
            F.expr(km.matched_update_condition), F.lit(False)
        )
    if km.matched_delete is None:
        del_applies = F.lit(False)
    elif km.matched_delete is True:
        del_applies = F.lit(True)
    else:
        del_applies = F.coalesce(F.expr(km.matched_delete), F.lit(False))

    is_update = t_present & s_present & upd_applies
    kept_matched = t_present & s_present & ~upd_applies & ~del_applies
    target_only = t_present & ~s_present

    if km.not_matched_insert is None:
        insert_ok = F.lit(False)
    else:
        insert_ok = ~t_present & s_present
        cond = getattr(km, "not_matched_condition", None)
        if cond:
            insert_ok = insert_ok & F.coalesce(F.expr(cond), F.lit(False))

    def _insert_expr(c):
        if km.not_matched_insert == "*":
            return F.col(f"{s}.`{c}`")
        return F.expr(km.not_matched_insert[c])

    # single projection: per-row CASE picks the branch value, cast to
    # the target schema like Delta's write path does (matched clause
    # expressions, e.g. "false" or "staged.`eff`", parse untyped)
    fields = {f.name: f for f in base.schema.fields}
    cols = []
    for c in out_cols:
        upd_expr = (
            F.expr(km.matched_update[c])
            if c in (km.matched_update or {})
            else F.col(f"{t}.`{c}`")
        )
        val = F.when(is_update, upd_expr).when(
            t_present, F.col(f"{t}.`{c}`")
        )
        if km.not_matched_insert is not None:
            val = val.otherwise(_insert_expr(c))
        cols.append(val.cast(fields[c].dataType).alias(c))

    keep = is_update | kept_matched | target_only | insert_ok
    return joined.where(keep).select(*cols)
