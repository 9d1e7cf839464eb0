"""functions/scalar.py guards: typed_fillna's type matrix and the
dsum/exact_avg NaN contract (r15 review)."""

from __future__ import annotations

import pytest
from pyspark.sql import functions as F

from bigdata_flightanalysis_spark.functions.scalar import (
    dsum,
    exact_avg,
    typed_fillna,
)


def test_typed_fillna_accepts_decimal_columns(spark):
    """Spark fills decimal columns from int/float values correctly;
    the wrapper's type matrix used to reject them with a factually
    wrong 'Spark would silently no-op this fill' (r15 review)."""
    from decimal import Decimal

    df = spark.createDataFrame([(None,), (Decimal("2.50"),)], "d decimal(10,2)")
    out = typed_fillna(df, {"d": 1.5})
    vals = sorted(float(r["d"]) for r in out.collect())
    assert vals == [1.5, 2.5]
    # the original mismatch detection still fires
    with pytest.raises(TypeError, match="does not match"):
        typed_fillna(df, {"d": "oops"})


def test_dsum_raises_on_nan_instead_of_dropping(spark):
    """Casting NaN to DECIMAL yields NULL, so an unguarded dsum
    SKIPPED the row and returned a finite wrong total (plain double
    SUM propagates NaN; the DuckDB twin errors). The guard makes the
    contract loud on both engines (r15 review)."""
    clean = spark.createDataFrame([(1.0,), (2.5,)], "v double")
    assert clean.agg(dsum("v", "s")).first()["s"] == 3.5
    assert clean.agg(exact_avg("v", "a")).first()["a"] == 1.75
    dirty = spark.createDataFrame([(float("nan"),), (1.0,)], "v double")
    with pytest.raises(Exception, match="NaN"):
        dirty.agg(dsum("v", "s")).first()
    with pytest.raises(Exception, match="NaN"):
        dirty.agg(exact_avg("v", "a")).first()
    # NULLs still pass through (ignored by SUM on both engines)
    nulled = spark.createDataFrame([(None,), (1.0,)], "v double")
    assert nulled.agg(dsum("v", "s")).first()["s"] == 1.0
