from bigdata_flightanalysis_spark.functions.scalar import (
    case_map,
    dsum,
    exact_avg,
    hhmm_to_hour,
    threshold_label,
)
from bigdata_flightanalysis_spark.functions.text import (
    md5_long,
    normalize_text,
    tokenize,
    word_shingles,
)
from bigdata_flightanalysis_spark.functions.vector import (
    cosine_similarity,
    dot_product,
    l2_norm,
)

__all__ = [
    "case_map",
    "dsum",
    "exact_avg",
    "hhmm_to_hour",
    "threshold_label",
    "md5_long",
    "normalize_text",
    "tokenize",
    "word_shingles",
    "cosine_similarity",
    "dot_product",
    "l2_norm",
]
