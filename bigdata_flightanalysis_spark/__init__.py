"""bigdata_flightanalysis_spark — a PySpark-native analytics engine.

A brand-new, Spark-first engine with the query and data-processing
capabilities of the reference repo ``gabe1227/BigData-FlightAnalysis``
(a ~260-line PySpark batch pipeline; see SURVEY.md), generalized into a
tested operator library designed for 100 TB scale:

- explicit-schema sources/sinks (the reference reads schemaless CSV,
  ``Code/flight_analysis.py:15-16``),
- a relational operator library (projections, filters, joins, aggs,
  windows, top-K) expressed declaratively so Catalyst/Tungsten plan it,
- the flight-analysis pipeline itself as a composable library
  (``pipeline.flights``), covering ``Code/flight_analysis.py`` end-to-end,
- LLM-data-pipeline extensions: dedup (exact / MinHash-LSH / SimHash),
  similarity search over embeddings, text analysis, event-time windows
  and Structured Streaming variants.

Everything here is stock PySpark (DataFrame / SQL / Structured
Streaming) — no custom Catalyst rules are required (SURVEY.md §4).
"""

from bigdata_flightanalysis_spark.session import get_session

__all__ = ["get_session"]
__version__ = "0.1.0"
