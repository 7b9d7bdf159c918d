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

    # whenNotMatchedBySource clauses (delta-spark 2.3+): target rows no
    # source row matched take the first applicable of update → delete;
    # rows matching neither clause are kept verbatim
    nms_update = getattr(km, "not_matched_by_source_update", None)
    nms_update_cond = getattr(
        km, "not_matched_by_source_update_condition", None
    )
    nms_delete = getattr(km, "not_matched_by_source_delete", None)
    if nms_update is None:
        nms_upd_applies = F.lit(False)
    elif nms_update_cond is None:
        nms_upd_applies = F.lit(True)
    else:
        nms_upd_applies = F.coalesce(F.expr(nms_update_cond), F.lit(False))
    if nms_delete is None:
        nms_del_applies = F.lit(False)
    elif nms_delete is True:
        nms_del_applies = F.lit(True)
    else:
        nms_del_applies = F.coalesce(F.expr(nms_delete), F.lit(False))
    nms_is_update = target_only & nms_upd_applies
    nms_kept = target_only & ~nms_upd_applies & ~nms_del_applies

    if km.not_matched_insert is None:
        insert_ok = F.lit(False)
    else:
        insert_ok = ~t_present & s_present
        cond = getattr(km, "not_matched_condition", None)
        if cond:
            insert_ok = insert_ok & F.coalesce(F.expr(cond), F.lit(False))

    src_cols = set(km.source.columns)

    def _insert_expr(c):
        if km.not_matched_insert == "*":
            # INSERT *: by-name; target columns the source lacks are
            # NULL (delta's insert-all rule — e.g. after evolution the
            # source may not carry every target column)
            return F.col(f"{s}.`{c}`") if c in src_cols else F.lit(None)
        if c in km.not_matched_insert:
            return F.expr(km.not_matched_insert[c])
        # Delta's explicit-values INSERT: unspecified columns are NULL
        return F.lit(None)

    def _upd_expr(c):
        # UPDATE SET * (whenMatchedUpdateAll): same-named source column
        # when the source carries one, else the target value
        if km.matched_update == "*":
            return (
                F.col(f"{s}.`{c}`") if c in src_cols
                else F.col(f"{t}.`{c}`")
            )
        if c in (km.matched_update or {}):
            return F.expr(km.matched_update[c])
        return F.col(f"{t}.`{c}`")

    # single projection: per-row CASE picks the branch value, cast to
    # the target schema like Delta's write path does (matched clause
    # expressions, e.g. "false" or "staged.`eff`", parse untyped)
    fields = {f.name: f for f in base.schema.fields}
    cols = []
    for c in out_cols:
        upd_expr = _upd_expr(c)
        nms_upd_expr = (
            F.expr(nms_update[c])
            if c in (nms_update or {})
            else F.col(f"{t}.`{c}`")
        )
        val = (
            F.when(is_update, upd_expr)
            .when(nms_is_update, nms_upd_expr)
            .when(t_present, F.col(f"{t}.`{c}`"))
        )
        if km.not_matched_insert is not None:
            val = val.otherwise(_insert_expr(c))
        cols.append(val.cast(fields[c].dataType).alias(c))

    keep = is_update | kept_matched | nms_is_update | nms_kept | insert_ok
    return joined.where(keep).select(*cols)


def merge_changes(base: DataFrame, km, change_type_col: str = "_change_type") -> DataFrame:
    """Row-level change feed of a :class:`KeyedMerge` over ``base`` —
    Delta Change Data Feed's MERGE semantics: inserted rows appear as
    ``insert``, updated rows as an ``update_preimage``/
    ``update_postimage`` pair, matched-delete rows as ``delete``;
    copied-through rows (kept matched, unmatched target) emit nothing.

    ONE full-outer join (same shape as :func:`interpret_keyed_merge`'s
    phase 2): each joined row projects an ARRAY of change structs —
    empty for copies, two entries for updates — then explodes. Callers
    writing both the merged table AND the change feed should persist
    ``base`` (and the source) so the two joins share their inputs.
    """
    t, s = km.target_alias, km.source_alias
    out_cols = base.columns
    tb = base.withColumn(_TID, F.monotonically_increasing_id()).alias(t)
    src = km.source.withColumn(_SRC, F.lit(True)).alias(s)
    joined = tb.join(src, F.expr(km.condition), "full_outer")
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
    is_delete = t_present & s_present & ~upd_applies & del_applies
    target_only = t_present & ~s_present
    nms_update = getattr(km, "not_matched_by_source_update", None)
    nms_update_cond = getattr(
        km, "not_matched_by_source_update_condition", None
    )
    nms_delete = getattr(km, "not_matched_by_source_delete", None)
    if nms_update is None:
        nms_upd_applies = F.lit(False)
    elif nms_update_cond is None:
        nms_upd_applies = F.lit(True)
    else:
        nms_upd_applies = F.coalesce(F.expr(nms_update_cond), F.lit(False))
    if nms_delete is None:
        nms_del_applies = F.lit(False)
    elif nms_delete is True:
        nms_del_applies = F.lit(True)
    else:
        nms_del_applies = F.coalesce(F.expr(nms_delete), F.lit(False))
    nms_is_update = target_only & nms_upd_applies
    nms_is_delete = target_only & ~nms_upd_applies & nms_del_applies
    if km.not_matched_insert is None:
        insert_ok = F.lit(False)
    else:
        insert_ok = ~t_present & s_present
        cond = getattr(km, "not_matched_condition", None)
        if cond:
            insert_ok = insert_ok & F.coalesce(F.expr(cond), F.lit(False))

    fields = {f.name: f for f in base.schema.fields}

    def _entry(kind: str, value_for):
        vals = [
            value_for(c).cast(fields[c].dataType).alias(c) for c in out_cols
        ]
        return F.struct(
            F.lit(kind).alias(change_type_col), *vals
        )

    def _pre(c):
        return F.col(f"{t}.`{c}`")

    src_cols = set(km.source.columns)

    def _post(c):
        if km.matched_update == "*":
            return (
                F.col(f"{s}.`{c}`") if c in src_cols
                else F.col(f"{t}.`{c}`")
            )
        if c in (km.matched_update or {}):
            return F.expr(km.matched_update[c])
        return F.col(f"{t}.`{c}`")

    def _ins(c):
        if km.not_matched_insert == "*":
            return F.col(f"{s}.`{c}`") if c in src_cols else F.lit(None)
        if c in km.not_matched_insert:
            return F.expr(km.not_matched_insert[c])
        return F.lit(None)

    def _nms_post(c):
        if c in (nms_update or {}):
            return F.expr(nms_update[c])
        return F.col(f"{t}.`{c}`")

    # the otherwise branch must be an EMPTY array of the same struct
    # type; a zero-length slice of a typed one-entry array names the
    # type without spelling it out
    empty = F.slice(F.array(_entry("insert", _pre)), 1, 0)
    # build the insert entry only when an insert clause exists — a
    # merge without one (update/delete-only, nms-only) must not
    # dereference the absent clause while constructing a branch that
    # can never fire
    ins_branch = (
        F.array(_entry("insert", _ins))
        if km.not_matched_insert is not None
        else empty
    )
    changes = (
        F.when(is_update, F.array(_entry("update_preimage", _pre),
                                  _entry("update_postimage", _post)))
        .when(is_delete, F.array(_entry("delete", _pre)))
        .when(nms_is_update,
              F.array(_entry("update_preimage", _pre),
                      _entry("update_postimage", _nms_post)))
        .when(nms_is_delete, F.array(_entry("delete", _pre)))
        .when(insert_ok, ins_branch)
        .otherwise(empty)
    )
    ex = joined.select(F.explode(changes).alias("__c"))
    return ex.select(
        *[F.col(f"__c.`{c}`").alias(c) for c in out_cols],
        F.col(f"__c.`{change_type_col}`").alias(change_type_col),
    )
