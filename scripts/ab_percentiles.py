"""Corrected A/B harness for the r16 exact_percentiles rewrite.

Two traps the first harness fell into (documented in
OPTIMIZATION_r16.md Change 3):
1. Several declared builders import operators from the PACKAGE
   (``from mack_spark.operators import exact_percentiles``), so a
   monkeypatch of only ``mack_spark.operators.profile`` leaves both
   arms running the same code — this harness patches the package
   re-exports too.
2. A fixed old-then-new arm order adds a first-position penalty;
   arms alternate per rep here.

The OLD arm expects the pre-f3f8e5a implementation at
/tmp/oldmod/profile_old.py (``git show f3f8e5a^:mack_spark/operators/profile.py``).
"""
import os, sys, time

sys.path.insert(0, "/root/repo")
import mack_spark.operators as ops_pkg
import mack_spark.operators.profile as prof_mod
import __spark_entry__ as entrymod
from mack_spark.session import get_session

SF = "/root/testdata/sf0.1"
QS = ["totalprice_percentiles", "doclen_deciles", "length_drift_psi"]
NEW_SRC = open("/root/repo/mack_spark/operators/profile.py").read()
OLD_SRC = open("/tmp/oldmod/profile_old.py").read()


def install(src):
    code = compile(src, prof_mod.__file__, "exec")
    ns = dict(prof_mod.__dict__)
    exec(code, ns)
    for k, v in ns.items():
        setattr(prof_mod, k, v)
        if hasattr(ops_pkg, k) and callable(v):
            setattr(ops_pkg, k, v)


spark = get_session()
spark.sparkContext.setLogLevel("ERROR")
queries = entrymod.queries()


def run(name):
    t0 = time.monotonic()
    queries[name](spark, SF).write.format("noop").mode("overwrite").save()
    return time.monotonic() - t0


res = {q: {"old": [], "new": []} for q in QS}
for q in QS:
    install(NEW_SRC); run(q)
    install(OLD_SRC); run(q)  # warm both arms
for rep in range(8):
    order = (("old", OLD_SRC), ("new", NEW_SRC))
    if rep % 2:
        order = order[::-1]
    for q in QS:
        for tag, src in order:
            install(src)
            res[q][tag].append(run(q))
for q in QS:
    o, n = min(res[q]["old"]), min(res[q]["new"])
    print(f"{q}: old_min={o:.3f} new_min={n:.3f} speedup={o/n:.2f}x")
    print(f"  old={['%.2f' % x for x in res[q]['old']]}")
    print(f"  new={['%.2f' % x for x in res[q]['new']]}")
