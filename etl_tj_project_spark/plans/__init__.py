"""Driver-side orchestration plans (the reference's DAGs as plain code)."""

from etl_tj_project_spark.plans.daily import run_daily, load_dims  # noqa: F401
