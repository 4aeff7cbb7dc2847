"""Source connectors: staged CSV, Parquet lake tables, JDBC federation."""

from etl_tj_project_spark.sources.csv import read_csv_staging  # noqa: F401
from etl_tj_project_spark.sources.testdata import load_table, load_tables  # noqa: F401
