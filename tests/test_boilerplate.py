"""Boilerplate line removal (operators/boilerplate.py)."""

import pytest
from pyspark.sql import functions as F

from mack_spark.operators.boilerplate import line_doc_frequency, strip_boilerplate

DOCS = [
    (1, "unique intro\ncookie banner\nreal content one"),
    (2, "cookie banner\nreal content two\nfooter text"),
    (3, "footer text\ncookie banner\nreal content three"),
    (4, "cookie banner"),
    (5, ""),
]


@pytest.fixture(scope="module")
def docs(spark):
    return spark.createDataFrame(DOCS, "doc_id int, text string")


def test_line_doc_frequency(docs):
    freq = {r["line"]: r["n_docs"] for r in line_doc_frequency(docs).collect()}
    assert freq["cookie banner"] == 4
    assert freq["footer text"] == 2
    assert freq["unique intro"] == 1
    assert "" not in freq


def test_strip_preserves_order_and_uniques(docs):
    out = {r["doc_id"]: r for r in strip_boilerplate(docs, min_docs=2).collect()}
    assert out[1]["clean_text"] == "unique intro\nreal content one"
    assert out[2]["clean_text"] == "real content two"
    assert out[3]["clean_text"] == "real content three"
    assert out[4]["clean_text"] == "" and out[4]["n_lines"] == 1 and out[4]["n_kept"] == 0
    assert out[5]["clean_text"] == "" and out[5]["n_lines"] == 0
    assert out[1]["n_lines"] == 3 and out[1]["n_kept"] == 2


def test_within_doc_repeats_count_once(spark):
    df = spark.createDataFrame(
        [(1, "same\nsame\nsame"), (2, "other")], "doc_id int, text string"
    )
    freq = {r["line"]: r["n_docs"] for r in line_doc_frequency(df).collect()}
    assert freq["same"] == 1  # repeats within one doc are one doc
    out = {r["doc_id"]: r["clean_text"] for r in strip_boilerplate(df).collect()}
    assert out[1] == "same\nsame\nsame"  # df=1 < min_docs -> kept


def test_min_docs_validation(docs):
    with pytest.raises(ValueError, match="min_docs"):
        strip_boilerplate(docs, min_docs=1)


def test_no_python_stage(docs):
    plan = (
        strip_boilerplate(docs)._jdf.queryExecution().executedPlan().toString()
    )
    assert "BatchEvalPython" not in plan and "ArrowEvalPython" not in plan
