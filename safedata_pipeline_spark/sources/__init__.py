from safedata_pipeline_spark.sources.tables import TABLES, load_table, load_tables
from safedata_pipeline_spark.sources.csv import read_csv, write_csv

__all__ = ["TABLES", "load_table", "load_tables", "read_csv", "write_csv"]
