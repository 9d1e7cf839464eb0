from bigdata_flightanalysis_spark.queries.catalog import REGISTRY, EngineQuery, register

__all__ = ["REGISTRY", "EngineQuery", "register"]
