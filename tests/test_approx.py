"""approx_count_distinct must stay within its configured error bound
of the exact answer (rows-only driver check otherwise)."""

from __future__ import annotations

from pyspark.sql import functions as F

from bigdata_flightanalysis_spark.queries.catalog import load_all
from bigdata_flightanalysis_spark.sources.readers import read_table

SF = "/root/testdata/sf0.01"


def test_approx_distinct_within_bound(spark):
    approx = {
        r["event_type"]: r["approx_users"]
        for r in load_all()["approx_distinct_users_by_type"].fn(spark, SF).collect()
    }
    exact = {
        r["event_type"]: r["exact"]
        for r in read_table(spark, SF, "events")
        .groupBy("event_type")
        .agg(F.countDistinct("user_id").alias("exact"))
        .collect()
    }
    assert approx.keys() == exact.keys()
    for t in exact:
        rel_err = abs(approx[t] - exact[t]) / exact[t]
        assert rel_err <= 0.05, (t, approx[t], exact[t])
