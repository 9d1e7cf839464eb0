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


def test_count_min_sketch_partition_order_invariant(spark, sf_dir):
    from bigdata_flightanalysis_spark.operators.sketches import (
        count_min_sketch_bytes,
    )

    ev = read_table(spark, sf_dir, "events").select("user_id")
    a = count_min_sketch_bytes(ev.repartition(1), "user_id")
    b = count_min_sketch_bytes(ev.repartition(8), "user_id")
    assert a == b  # integer counters + fixed seed → merge-order invariant


def test_approx_top_k_exact_in_small_cardinality_regime(spark, sf_dir):
    from bigdata_flightanalysis_spark.operators.sketches import (
        approx_top_k_items,
    )
    from pyspark.sql import functions as F

    ev = read_table(spark, sf_dir, "events")
    got = [(r["item"], r["est_count"]) for r in
           approx_top_k_items(ev, "event_type", 5).collect()]
    exact = sorted(
        [(r["event_type"], r["n"]) for r in
         ev.groupBy("event_type").agg(F.count("*").alias("n")).collect()],
        key=lambda t: (-t[1], t[0]),
    )
    assert got == exact
