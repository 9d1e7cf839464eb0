"""Differential tests: every registered query vs its DuckDB oracle.

This mirrors the driver's t2 harness (``__spark_entry__.py``):
row-count + column names + order-insensitive exact value comparison.
Runs at sf0.001 for speed; the driver re-checks at sf0.01.
"""

from __future__ import annotations


import duckdb
import pytest

from bigdata_flightanalysis_spark.queries.catalog import load_all
from bigdata_flightanalysis_spark.schemas import TABLE_NAMES

REGISTRY = load_all()
ORACLE_QUERIES = sorted(n for n, q in REGISTRY.items() if q.oracle is not None)
ROWS_ONLY_QUERIES = sorted(n for n, q in REGISTRY.items() if q.oracle is None)


@pytest.fixture(scope="module")
def duck(sf_dir):
    con = duckdb.connect()
    for t in TABLE_NAMES:
        con.execute(
            f"CREATE VIEW {t} AS SELECT * FROM '{sf_dir}/{t}.parquet'"
        )
    yield con
    con.close()


# the ONE canonicalization definition (r16 review: three hand-rolled
# copies used to drift independently)
from bigdata_flightanalysis_spark.parity import rows_sorted as _rows_sorted


@pytest.mark.parametrize("name", ORACLE_QUERIES)
def test_query_matches_oracle(name, spark, sf_dir, duck):
    q = REGISTRY[name]
    sdf = q.fn(spark, sf_dir)
    spark_cols = sdf.columns
    spark_rows = [tuple(r) for r in sdf.collect()]

    rel = duck.execute(q.oracle)
    duck_cols = [d[0] for d in rel.description]
    duck_rows = rel.fetchall()

    assert sorted(spark_cols) == sorted(duck_cols), (
        f"{name}: column mismatch {spark_cols} vs {duck_cols}"
    )
    assert len(spark_rows) == len(duck_rows), (
        f"{name}: row count {len(spark_rows)} vs {len(duck_rows)}"
    )
    a = _rows_sorted(spark_cols, spark_rows)
    b = _rows_sorted(duck_cols, duck_rows)
    mismatches = [(x, y) for x, y in zip(a, b) if x != y]
    assert not mismatches, f"{name}: first value mismatches: {mismatches[:3]}"


@pytest.mark.parametrize("name", ROWS_ONLY_QUERIES)
def test_rows_only_query_runs(name, spark, sf_dir):
    sdf = REGISTRY[name].fn(spark, sf_dir)
    assert len(sdf.columns) > 0
    assert sdf.count() >= 0
