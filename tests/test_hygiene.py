"""Unit tests for the corpus-hygiene operators (pii, span dedup,
url/domain, fixed-k stratum sampling)."""

from __future__ import annotations

import pytest
from pyspark.sql import functions as F

from synch_spark.operators import pii
from synch_spark.plans.hygiene import SAMPLE_K, span_report


@pytest.fixture(scope="module")
def pii_rows(spark):
    rows = [
        (1, "mail me at alice.smith+x@sub.example.co.uk today"),
        (2, "call 555-123-4567 or 555-999-0000 now"),
        (3, "server at 192.168.1.17 went down"),
        (4, "clean text with no sensitive content at all"),
        (5, "bob@ex.io and 10.0.0.1 and 555-000-1111 together"),
    ]
    return spark.createDataFrame(rows, ["id", "text"])


def test_pii_counts(spark, pii_rows):
    got = {
        r["id"]: (r["e"], r["p"], r["i"])
        for r in pii_rows.select(
            "id",
            pii.pii_count("text", "email").alias("e"),
            pii.pii_count("text", "phone").alias("p"),
            pii.pii_count("text", "ipv4").alias("i"),
        ).collect()
    }
    assert got == {1: (1, 0, 0), 2: (0, 2, 0), 3: (0, 0, 1),
                   4: (0, 0, 0), 5: (1, 1, 1)}


def test_redact_order_email_first(spark):
    # the email's digit-bearing domain must be consumed by [EMAIL]
    # before the ipv4 pattern can see it
    df = spark.createDataFrame([("x u1@h123.a12.com y 1.2.3.4",)], ["text"])
    out = df.select(pii.redact("text").alias("r")).collect()[0]["r"]
    assert out == "x [EMAIL] y [IPV4]"


def test_redact_replaces_all_occurrences(spark, pii_rows):
    out = {r["id"]: r["r"] for r in
           pii_rows.select("id", pii.redact("text").alias("r")).collect()}
    assert out[2] == "call [PHONE] or [PHONE] now"
    assert out[5] == "[EMAIL] and [IPV4] and [PHONE] together"
    assert out[4] == "clean text with no sensitive content at all"


def test_has_pii_gate(spark, pii_rows):
    kept = {r["id"] for r in pii_rows.filter(~pii.has_pii("text")).collect()}
    assert kept == {4}


def _mkdocs(spark, rows):
    return spark.createDataFrame(rows, ["doc_id", "source", "text"])


def test_span_report_detects_shared_span(spark):
    shared = " ".join(f"w{i}" for i in range(15))  # 15-token common span
    docs = _mkdocs(spark, [
        (1, "a", f"{shared} tail one two three"),
        (2, "a", f"head {shared} other suffix here"),
        (3, "a", "totally different words " + " ".join(
            f"u{i}" for i in range(20))),
    ])
    row = {r["source"]: r for r in span_report(docs, span_w=12).collect()}["a"]
    assert row["n_docs"] == 3
    assert row["n_docs_with_dup"] == 2
    # 15-token span at stride 1 with w=12 -> 4 duplicated windows/doc,
    # one run of 4 -> max span = 4 + 11 = 15
    assert row["dup_windows"] == 8
    assert row["max_span_tokens"] == 15


def test_span_report_no_dups(spark):
    docs = _mkdocs(spark, [
        (1, "a", " ".join(f"a{i}" for i in range(30))),
        (2, "a", " ".join(f"b{i}" for i in range(30))),
        (3, "b", "short doc"),  # < w tokens: zero windows, still counted
    ])
    rows = {r["source"]: r for r in span_report(docs, span_w=12).collect()}
    assert rows["a"]["dup_windows"] == 0
    assert rows["a"]["max_span_tokens"] == 0
    assert rows["a"]["total_windows"] == 2 * (30 - 12 + 1)
    assert rows["b"]["n_docs"] == 1 and rows["b"]["total_windows"] == 0
    assert rows["b"]["dup_ratio"] == 0.0


def test_span_report_within_doc_repeat_not_cross_doc(spark):
    # the same window repeated INSIDE one doc is q62's business, not a
    # cross-doc duplicated span
    body = " ".join(f"w{i}" for i in range(12))
    docs = _mkdocs(spark, [
        (1, "a", f"{body} {body}"),
        (2, "a", " ".join(f"z{i}" for i in range(25))),
    ])
    row = span_report(docs, span_w=12).collect()[0]
    assert row["n_docs_with_dup"] == 0 and row["dup_windows"] == 0


def test_per_stratum_sample_exact_k(spark, tmp_path):
    import pandas as pd

    from synch_spark.plans.hygiene import q116_per_stratum_sample

    d = tmp_path / "sf"
    d.mkdir()
    pd.DataFrame({
        "doc_id": range(100),
        "text": ["x"] * 100,
        "lang": ["en"] * 90 + ["de"] * 10,
        "source": ["web"] * 50 + ["books"] * 50,
        "n_chars": [1] * 100,
    }).to_parquet(d / "documents.parquet")
    out = q116_per_stratum_sample(spark, str(d)).toPandas()
    sizes = out.groupby(["source", "lang"]).size().to_dict()
    # strata: web/en=50, books/en=40, books/de=10 -> all capped at K
    assert sizes == {("web", "en"): SAMPLE_K, ("books", "en"): SAMPLE_K,
                     ("books", "de"): SAMPLE_K}
    # deterministic across runs
    again = q116_per_stratum_sample(spark, str(d)).toPandas()
    assert out.equals(again)
