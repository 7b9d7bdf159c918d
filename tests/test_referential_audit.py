"""referential_audit: orphans, duplicate keys, NULL keys between tables."""

from mack_spark.operators.audit import referential_audit


def test_referential_audit_all_categories(spark):
    left = spark.createDataFrame(
        [(1, "a"), (1, "b"), (2, "c"), (None, "d")], "k long, v string"
    )
    right = spark.createDataFrame(
        [(2, "x"), (3, "y"), (None, "z"), (None, "w")], "k long, v string"
    )
    r = referential_audit(left, right, "k", "k").collect()[0]
    assert r["n_left"] == 4 and r["n_right"] == 4
    assert r["n_left_null_keys"] == 1 and r["n_right_null_keys"] == 2
    # left key 1 has two rows -> one duplicate beyond the first
    assert r["n_left_dup_keys"] == 1 and r["n_right_dup_keys"] == 0
    # left key 1 (2 rows) has no right match; right key 3 has no left match
    assert r["n_left_orphans"] == 2 and r["n_right_orphans"] == 1


def test_referential_audit_clean_one_to_one(spark):
    df = spark.createDataFrame([(i, str(i)) for i in range(10)], "k long, v string")
    r = referential_audit(df, df, "k", "k").collect()[0]
    assert r["n_left"] == 10 and r["n_right"] == 10
    assert all(
        r[c] == 0
        for c in (
            "n_left_null_keys",
            "n_right_null_keys",
            "n_left_dup_keys",
            "n_right_dup_keys",
            "n_left_orphans",
            "n_right_orphans",
        )
    )
