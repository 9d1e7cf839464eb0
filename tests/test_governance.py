"""Governance operators (queries/governance.py) — behavioral
properties beyond the registry's oracle parity: redaction must be
COMPLETE (no residual PII matches) and IDEMPOTENT (re-redacting
changes nothing), the properties an auditor actually checks.
"""

from __future__ import annotations

from pyspark.sql import functions as F

from bigdata_flightanalysis_spark.queries.governance import (
    EMAIL_RE,
    ID_RE,
    PHONE_RE,
    _pii_enriched,
)
from bigdata_flightanalysis_spark.sources.readers import read_table
from tests.conftest import SF_DIR


def _redact(col):
    return F.regexp_replace(
        F.regexp_replace(
            F.regexp_replace(col, EMAIL_RE, "<EMAIL>"), PHONE_RE, "<PHONE>"
        ),
        ID_RE,
        "<ID>",
    )


def test_enrichment_plants_every_pii_kind(spark):
    docs = _pii_enriched(read_table(spark, SF_DIR, "documents"))
    counts = docs.agg(
        F.sum(F.regexp_count("enriched", F.lit(EMAIL_RE))).alias("e"),
        F.sum(F.regexp_count("enriched", F.lit(PHONE_RE))).alias("p"),
        F.sum(F.regexp_count("enriched", F.lit(ID_RE))).alias("i"),
        F.count("*").alias("n"),
    ).first()
    # one planted instance of each kind per doc
    assert counts["e"] == counts["p"] == counts["i"] == counts["n"]


def test_redaction_is_complete_and_idempotent(spark):
    docs = _pii_enriched(read_table(spark, SF_DIR, "documents"))
    once = docs.select(_redact(F.col("enriched")).alias("red"))
    residual = once.agg(
        F.sum(F.regexp_count("red", F.lit(EMAIL_RE))).alias("e"),
        F.sum(F.regexp_count("red", F.lit(PHONE_RE))).alias("p"),
        F.sum(F.regexp_count("red", F.lit(ID_RE))).alias("i"),
    ).first()
    assert residual["e"] == residual["p"] == residual["i"] == 0
    twice = once.select("red", _redact(F.col("red")).alias("red2"))
    assert twice.filter(F.col("red") != F.col("red2")).count() == 0


def test_url_domains_are_wellformed(spark):
    from bigdata_flightanalysis_spark.queries.catalog import load_all

    rows = load_all()["doc_url_domains"].fn(spark, SF_DIR).collect()
    assert 0 < len(rows) <= 15
    counts = [r["n_urls"] for r in rows]
    assert counts == sorted(counts, reverse=True)
    for r in rows:
        assert "://" not in r["domain"] and "/" not in r["domain"]
