from bigdata_flightanalysis_spark.sources.readers import (
    load_star,
    read_csv,
    read_table,
)
from bigdata_flightanalysis_spark.sources.writers import write_csv, write_parquet

__all__ = ["read_table", "read_csv", "load_star", "write_csv", "write_parquet"]
