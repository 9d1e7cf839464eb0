"""Physical-plan introspection helpers — the engine's own view of what
Catalyst actually planned, used by the plan-contract tests
(tests/test_plans.py) and the `plans` CLI.

At 100 TB the plan IS the product: a wrong join strategy or a missing
pushdown is a 100× regression that no small-SF correctness test can
see. These helpers make the load-bearing plan properties inspectable
and assertable.
"""

from __future__ import annotations

import contextlib
import io
import re

from pyspark.sql import DataFrame


def executed_plan(df: DataFrame) -> str:
    """The physical plan string (pre-execution; adaptive plans show
    their initial form until the DataFrame itself is executed)."""
    return df._jdf.queryExecution().executedPlan().toString()


def formatted_explain(df: DataFrame) -> str:
    """`explain("formatted")` output as a string — unlike the plan
    toString, scan nodes print their FULL PushedFilters/ReadSchema
    (the plan string truncates long filter lists)."""
    buf = io.StringIO()
    with contextlib.redirect_stdout(buf):
        df.explain("formatted")
    return buf.getvalue()


def plan_stats(df: DataFrame) -> dict[str, int]:
    """Count the plan features that matter at scale."""
    plan = executed_plan(df)
    return {
        "scans": plan.count("Scan parquet"),
        "hash_exchanges": plan.count("Exchange hashpartitioning"),
        "range_exchanges": plan.count("Exchange rangepartitioning"),
        "broadcast_joins": plan.count("BroadcastHashJoin"),
        "sort_merge_joins": plan.count("SortMergeJoin"),
        "shuffled_hash_joins": plan.count("ShuffledHashJoin"),
        "nested_loop_joins": plan.count("BroadcastNestedLoopJoin")
        + plan.count("CartesianProduct"),
        # word-bounded: a bare substring count would also match every
        # WindowGroupLimit node (the per-group top-N pushdown Spark
        # plans NEXT TO a Window), overcounting one logical window as 3
        "windows": len(re.findall(r"\bWindow\b", plan)),
        "python_row_udfs": plan.count("BatchEvalPython"),
        "arrow_python": plan.count("ArrowEvalPython") + plan.count("MapInPandas"),
    }


def main(argv: list[str] | None = None) -> None:
    """`python -m bigdata_flightanalysis_spark.plans.introspect <query>`
    — print a query's formatted explain + feature counts."""
    import argparse

    from bigdata_flightanalysis_spark.queries.catalog import load_all
    from bigdata_flightanalysis_spark.session import get_session

    parser = argparse.ArgumentParser(description=__doc__)
    parser.add_argument("name")
    parser.add_argument("--sf-dir", default="/root/testdata/sf0.01")
    args = parser.parse_args(argv)
    registry = load_all()
    if args.name not in registry:
        # usage error BEFORE the Spark spin-up, with suggestions —
        # not a bare KeyError traceback after a 6s session build
        # (r16 review)
        import difflib

        close = difflib.get_close_matches(args.name, registry, n=5)
        hint = f"; did you mean: {', '.join(close)}?" if close else ""
        parser.error(
            f"unknown query {args.name!r}{hint} "
            f"({len(registry)} registered — list them via "
            "`python -m bigdata_flightanalysis_spark list`)"
        )
    spark = get_session("plan-introspect")
    df = registry[args.name].fn(spark, args.sf_dir)
    print(formatted_explain(df))
    for k, v in plan_stats(df).items():
        print(f"{k:20s} {v}")


if __name__ == "__main__":
    main()
