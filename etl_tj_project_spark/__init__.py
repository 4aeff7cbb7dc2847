"""etl_tj_project_spark — a PySpark-native analytics engine with the query
and data-processing capabilities of the reference ETL project
(awinardi1004/etl-tj-project), re-expressed Spark-first.

The reference executes every transform as SQL/PL-pgSQL inside PostgreSQL,
orchestrated by Airflow (see SURVEY.md). This package expresses the same
relational semantics as declarative DataFrame lineage so Catalyst handles
pushdown, pruning, join strategy and codegen, and the identical code runs
from kilobytes (reference CSVs) to ~100 TB (partitioned Parquet lake).

Layout:
  session.py    SparkSession builders + scale-tuned runtime confs
  schemas.py    explicit StructTypes for every source/dim/agg table
  functions/    norm_body, to_bool_safe, text/vector expression builders
  sources/      CSV staging, Parquet, JDBC, testdata loaders
  operators/    projections, dims, aggregates, dedup, similarity, multimodal
  plans/        run_daily orchestration (the reference's DAG 2)
  streaming/    Structured Streaming variant of the daily pipeline
  io.py         partitioned writers (dynamic partition overwrite)
"""

__version__ = "0.1.0"
