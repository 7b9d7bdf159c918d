"""PII redaction operators (mack_spark/operators/redact.py): pattern
coverage, application order, counting, rollup, URL stripping, and the
map-only (no Exchange) plan guarantee."""

import pytest
from pyspark.sql import functions as F

from mack_spark.operators.redact import (
    PII_PATTERNS,
    pii_counts,
    pii_rollup,
    redact_pii,
    strip_urls,
)

SAMPLE = (
    "write bob.smith+spam@corp.example.co or visit "
    "https://example.com/a?b=c#frag from 192.168.1.100, "
    "call (415) 555-2671 or 415-555-2671, ssn 123-45-6789 end"
)


@pytest.fixture(scope="module")
def sample_df(spark):
    return spark.createDataFrame(
        [(1, SAMPLE), (2, "no pii here at all"), (3, None)],
        "id int, text string",
    )


class TestRedact:
    def test_all_kinds_redacted(self, sample_df):
        out = {r["id"]: r["text"] for r in redact_pii(sample_df, "text").collect()}
        red = out[1]
        for token in ("<EMAIL>", "<URL>", "<IPV4>", "<PHONE>", "<SSN>"):
            assert token in red, (token, red)
        # no residual pii fragments
        assert "example.co" not in red.replace("<URL>", "")
        assert "192.168" not in red and "555-2671" not in red
        assert "123-45-6789" not in red
        assert out[2] == "no pii here at all"
        assert out[3] is None

    def test_url_redacted_before_ip_like_hosts(self, spark):
        df = spark.createDataFrame(
            [(1, "fetch http://10.0.0.1/path and ping 10.0.0.2")],
            "id int, text string",
        )
        red = redact_pii(df, "text").collect()[0]["text"]
        assert red == "fetch <URL> and ping <IPV4>"

    def test_phone_shapes(self, spark):
        df = spark.createDataFrame(
            [(1, "(212) 555-0000"), (2, "212-555-0000"), (3, "2125550000")],
            "id int, text string",
        )
        out = {r["id"]: r["text"] for r in redact_pii(df, "text", ["phone"]).collect()}
        assert out[1] == "<PHONE>" and out[2] == "<PHONE>"
        assert out[3] == "2125550000"  # bare 10-digit runs left alone

    def test_unknown_kind_raises(self, sample_df):
        with pytest.raises(ValueError, match="unknown PII kinds"):
            redact_pii(sample_df, "text", kinds=["email", "iban"])

    def test_counts_and_total(self, sample_df):
        rows = {r["id"]: r for r in pii_counts(sample_df, "text").collect()}
        r1 = rows[1]
        assert (r1["n_email"], r1["n_url"], r1["n_ipv4"]) == (1, 1, 1)
        assert r1["n_phone"] == 2 and r1["n_ssn"] == 1
        assert r1["n_pii_total"] == 6
        assert rows[2]["n_pii_total"] == 0

    def test_rollup_grouped(self, spark):
        df = spark.createDataFrame(
            [("a", "x@y.io"), ("a", "clean"), ("b", "see 1.2.3.4 and 5.6.7.8")],
            "src string, text string",
        )
        out = {
            r["src"]: r
            for r in pii_rollup(df, "text", group_cols=["src"]).collect()
        }
        assert out["a"]["n_docs"] == 2
        assert out["a"]["total_email"] == 1 and out["a"]["docs_with_pii"] == 1
        assert out["b"]["total_ipv4"] == 2 and out["b"]["docs_with_pii"] == 1

    def test_strip_urls_collapses_whitespace(self, spark):
        df = spark.createDataFrame(
            [(1, "pre https://a.io/x  mid  http://b.io post")],
            "id int, text string",
        )
        assert (
            strip_urls(df, "text").collect()[0]["text"] == "pre mid post"
        )

    def test_map_only_plan(self, sample_df):
        """Scrubbing must stay a single map stage: no Exchange, no UDF."""
        plan = (
            pii_counts(redact_pii(sample_df, "text"), "text")
            ._jdf.queryExecution()
            .executedPlan()
            .toString()
        )
        assert "Exchange" not in plan
        assert "BatchEvalPython" not in plan and "ArrowEvalPython" not in plan

    def test_patterns_are_re2_safe(self):
        """The Java∩RE2 contract: every pattern must compile in a
        RE2-semantics engine (DuckDB) — no lookaround/backreferences."""
        import duckdb

        con = duckdb.connect()
        for kind, pat in PII_PATTERNS.items():
            n = con.execute(
                "select len(regexp_extract_all(?, ?))", [SAMPLE, pat]
            ).fetchone()[0]
            assert n >= 0, kind
        assert (
            con.execute(
                "select regexp_replace(?, ?, '<EMAIL>', 'g')",
                [SAMPLE, PII_PATTERNS["email"]],
            ).fetchone()[0].count("<EMAIL>")
            == 1
        )


class TestUnigramQuality:
    def test_scores_rank_junk_below_common_text(self, spark):
        from mack_spark.operators.textstats import unigram_logprob_score

        docs = [
            (1, "the cat sat on the mat the cat"),
            (2, "the dog sat on the mat"),
            (3, "zxqv jkwp qqzz vvxx"),  # corpus-rare junk
            (4, ""),
        ]
        df = spark.createDataFrame(docs, "doc_id int, text string")
        out = {r["doc_id"]: r for r in unigram_logprob_score(df).collect()}
        assert out[3]["avg_logprob"] < out[1]["avg_logprob"]
        assert out[3]["pseudo_ppl"] > out[1]["pseudo_ppl"]
        assert out[4]["n_tokens"] == 0 and out[4]["avg_logprob"] == 0.0

    def test_exact_two_token_model(self, spark):
        import math

        from mack_spark.operators.textstats import unigram_logprob_score

        # corpus: "a a a b" -> counts a=3, b=1; total=4, vocab=2
        df = spark.createDataFrame(
            [(1, "a a a"), (2, "b")], "doc_id int, text string"
        )
        out = {r["doc_id"]: r for r in unigram_logprob_score(df).collect()}
        pa = math.log((3 + 0.5) / (4 + 0.5 * 2))
        pb = math.log((1 + 0.5) / (4 + 0.5 * 2))
        qa = math.floor(pa * 1e6) / 1e6
        qb = math.floor(pb * 1e6) / 1e6
        assert out[1]["avg_logprob"] == round(qa, 6)
        assert out[2]["avg_logprob"] == round(qb, 6)
        assert out[2]["avg_logprob"] < out[1]["avg_logprob"]
