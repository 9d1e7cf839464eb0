from bigdata_flightanalysis_spark.operators.relational import (
    deduplicate_exact,
    per_group_top_n,
    semi_filter_topk,
    top_k,
)

__all__ = [
    "deduplicate_exact",
    "per_group_top_n",
    "semi_filter_topk",
    "top_k",
]
