"""Interleaved A/B harness for per-query variants (r16).

Times two builder variants of the same query in ONE warm session,
alternating A,B,A,B,... so host drift hits both arms equally (the only
methodology that survived this box's ±12% run-to-run noise in r15).
Reports min and median per arm. Sink and warm-up match bench.py.

Usage:
    python scripts/ab_spread.py [--sf DIR] [--reps N] query ...

Each query name maps to a (variant_a, variant_b) pair registered in
VARIANTS below; A is the current tree's behavior, B the candidate.
"""

from __future__ import annotations

import os
import statistics
import sys
import time

sys.path.insert(0, os.path.dirname(os.path.dirname(os.path.abspath(__file__))))

from pyspark.sql import functions as F

from mack_spark.session import get_session
from mack_spark.sources import load_table


def _percentile_variant(table, cols, spread):
    def build(spark, sf_dir):
        from mack_spark.operators.profile import numeric_outlier_fences

        return numeric_outlier_fences(
            load_table(spark, sf_dir, table, spread=spread), cols
        )

    return build


def _robust_variant(spread):
    def build(spark, sf_dir):
        from mack_spark.operators.profile import grouped_robust_stats

        return grouped_robust_stats(
            load_table(spark, sf_dir, "documents", spread=spread),
            "lang", "n_chars",
        )

    return build


def _rfm_variant(spread):
    def build(spark, sf_dir):
        import __spark_entry__ as entrymod

        # reuse the declared builder but swap the input spread by
        # rebinding _t for the call
        q = entrymod.queries()["customer_rfm"]
        orig = entrymod._t

        def t(spark_, sf_dir_, name, spread_=False):
            return orig(spark_, sf_dir_, name,
                        spread=spread if name == "orders" else spread_)

        entrymod._t = t
        try:
            return q(spark, sf_dir)
        finally:
            entrymod._t = orig

    return build


def _percentiles_variant(spread):
    def build(spark, sf_dir):
        from mack_spark.operators.profile import exact_percentiles

        return exact_percentiles(
            load_table(spark, sf_dir, "orders", spread=spread),
            "o_totalprice",
        )

    return build


def _deciles_variant(spread):
    def build(spark, sf_dir):
        from mack_spark.operators.profile import equal_frequency_histogram

        return equal_frequency_histogram(
            load_table(spark, sf_dir, "documents", spread=spread),
            "n_chars", 10,
        )

    return build


def _entry_spread_variant(qname, force_spread):
    """Run the DECLARED builder with every ``_t`` load's spread forced
    to ``force_spread`` — A/B's the per-query annotation itself (r16
    re-judge of the r15 spread landings, VERDICT item 8)."""

    def build(spark, sf_dir):
        import __spark_entry__ as entrymod

        q = entrymod.queries()[qname]
        orig = entrymod._t

        def t(spark_, sf_dir_, name, spread=False, **kw):
            return orig(spark_, sf_dir_, name, spread=force_spread, **kw)

        entrymod._t = t
        try:
            return q(spark, sf_dir)
        finally:
            entrymod._t = orig

    return build


VARIANTS = {
    # r16 re-judge: A = annotated (spread=True, current tree),
    # B = un-annotated
    "grouped_correlations": (
        _entry_spread_variant("grouped_correlations", True),
        _entry_spread_variant("grouped_correlations", False),
    ),
    "salted_join_revenue": (
        _entry_spread_variant("salted_join_revenue", True),
        _entry_spread_variant("salted_join_revenue", False),
    ),
    "numeric_outliers": (
        _percentile_variant(
            "lineitem",
            ["l_quantity", "l_extendedprice", "l_discount", "l_tax"],
            False,
        ),
        _percentile_variant(
            "lineitem",
            ["l_quantity", "l_extendedprice", "l_discount", "l_tax"],
            True,
        ),
    ),
    "lang_robust_stats": (_robust_variant(False), _robust_variant(True)),
    "customer_rfm": (_rfm_variant(False), _rfm_variant(True)),
    "totalprice_percentiles": (
        _percentiles_variant(False), _percentiles_variant(True),
    ),
    "doclen_deciles": (_deciles_variant(False), _deciles_variant(True)),
}


def main() -> None:
    args = sys.argv[1:]
    sf_dir = "/root/testdata/sf0.1"
    reps = 4
    names = []
    i = 0
    while i < len(args):
        a = args[i]
        if a == "--sf":
            sf_dir = args[i + 1]; i += 2
        elif a == "--reps":
            reps = int(args[i + 1]); i += 2
        else:
            names.append(a); i += 1
    if not names:
        names = list(VARIANTS)

    spark = get_session("mack_spark-ab")
    spark.sparkContext.setLogLevel("ERROR")
    warm = "/root/testdata/sf0.001"

    for name in names:
        va, vb = VARIANTS[name]
        for fn in (va, vb):
            try:
                fn(spark, warm).write.format("noop").mode("overwrite").save()
            except Exception as e:  # warm-up only
                print(f"warm {name}: {e}", file=sys.stderr)
        times: dict[str, list[float]] = {"A": [], "B": []}
        for _ in range(reps):
            for label, fn in (("A", va), ("B", vb)):
                spark.sparkContext.setJobDescription(f"{name}:{label}")
                t0 = time.monotonic()
                fn(spark, sf_dir).write.format("noop").mode(
                    "overwrite"
                ).save()
                times[label].append(time.monotonic() - t0)
        spark.sparkContext.setJobDescription(None)
        a, b = times["A"], times["B"]
        print(
            f"{name}: A(min={min(a):.2f} med={statistics.median(a):.2f}) "
            f"B(min={min(b):.2f} med={statistics.median(b):.2f}) "
            f"raw A={[round(x,2) for x in a]} B={[round(x,2) for x in b]}",
            flush=True,
        )


if __name__ == "__main__":
    main()
