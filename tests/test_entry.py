"""Driver-contract smoke tests for __spark_entry__.py."""

from __future__ import annotations

import __spark_entry__ as e


def test_entry_returns_rows(spark):
    df = e.entry(spark)
    assert df.count() > 0
    assert "c_mktsegment" in df.columns


def test_queries_and_oracles_aligned():
    qs = e.queries()
    oracles = e.oracle_sql()
    assert len(qs) >= 20
    assert set(oracles) <= set(qs)
    # every oracle is non-empty SQL
    for name, sql in oracles.items():
        assert "SELECT" in sql.upper(), name


def test_every_registry_query_runs_at_smoke_sf(spark):
    """Driver t1-smoke twin: every query (including the rows-only
    three) must execute and return a stable schema at sf0.001."""
    qs = e.queries()
    for name, fn in qs.items():
        df = fn(spark, "/root/testdata/sf0.001")
        assert df.columns, name
        df.limit(5).collect()  # forces execution of the whole plan


def test_rotation_staging_is_valid():
    """The verification-window staging must fail fast on BOTH silent
    failure modes: names missing from the registry (round-4 incident)
    and duplicated names (a duplicate collapses in the reorder dict,
    silently shifting an unstaged query into the externally-verified
    window). load_all() itself raises on either; this pins the
    contract plus the window arithmetic."""
    from bigdata_flightanalysis_spark.queries import catalog

    names = list(catalog.load_all())  # raises on missing/duplicate
    vf = catalog._VERIFY_FIRST
    assert len(set(vf)) == len(vf)
    assert len(vf) >= 50, "staging must cover the driver's ~50-row window"
    assert names[: len(vf)] == list(vf)
