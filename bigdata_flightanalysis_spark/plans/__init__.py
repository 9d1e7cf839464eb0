"""Physical-plan introspection (SURVEY.md §4)."""

from bigdata_flightanalysis_spark.plans.introspect import (  # noqa: F401
    executed_plan,
    formatted_explain,
    plan_stats,
)
