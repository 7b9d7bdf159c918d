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

Two consumers: tests/test_backend_seam.py verifies that interpreting
``scd2_keyed_merge`` equals ``scd2_post_state`` on arbitrary inputs,
and :meth:`mack_spark.sources.delta_log.DeltaProtocolTable.merge`
executes descriptors through it as phase 2 of a real, file-pruned
Delta-protocol MERGE commit.
"""

from pyspark.sql import DataFrame
from pyspark.sql import functions as F


def interpret_keyed_merge(base: DataFrame, km) -> DataFrame:
    t, s = km.target_alias, km.source_alias
    out_cols = base.columns
    tb = base.withColumn("__tid", F.monotonically_increasing_id()).alias(t)
    src = km.source.alias(s)
    on = F.expr(km.condition)

    pairs = tb.join(src, on, "inner")
    dup = (
        pairs.groupBy("__tid").count().filter(F.col("count") > 1).limit(1).count()
    )
    if dup:
        raise ValueError(
            "ambiguous merge: a target row is matched by multiple source rows"
        )

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

    updated = pairs.where(upd_applies).select(
        *[
            F.expr(km.matched_update[c]).alias(c)
            if c in (km.matched_update or {})
            else F.col(f"{t}.`{c}`").alias(c)
            for c in out_cols
        ]
    )
    kept_matched = pairs.where(~upd_applies & ~del_applies).select(
        *[F.col(f"{t}.`{c}`").alias(c) for c in out_cols]
    )
    unmatched_target = tb.join(src, on, "left_anti").select(
        *[F.col(f"`{c}`").alias(c) for c in out_cols]
    )
    result = updated.unionByName(kept_matched).unionByName(unmatched_target)

    if km.not_matched_insert is not None:
        new_src = src.join(tb, on, "left_anti")
        cond = getattr(km, "not_matched_condition", None)
        if cond:
            new_src = new_src.where(F.coalesce(F.expr(cond), F.lit(False)))
        if km.not_matched_insert == "*":
            inserts = new_src.select(
                *[F.col(f"{s}.`{c}`").alias(c) for c in out_cols]
            )
        else:
            inserts = new_src.select(
                *[
                    F.expr(km.not_matched_insert[c]).alias(c)
                    for c in out_cols
                ]
            )
        for f in base.schema.fields:
            inserts = inserts.withColumn(f.name, F.col(f.name).cast(f.dataType))
        result = result.unionByName(inserts)
    # matched clause expressions (e.g. "false", "staged.`eff`") parse
    # untyped; normalize every column to the target schema like Delta's
    # write path does
    for f in base.schema.fields:
        result = result.withColumn(f.name, F.col(f.name).cast(f.dataType))
    return result
