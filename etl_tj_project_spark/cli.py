"""Command-line driver — the user surface the reference exposes through
Airflow DAG runs, as plain commands:

    python -m etl_tj_project_spark.cli load-dims --data-dir DATA --warehouse WH
    python -m etl_tj_project_spark.cli run-daily --ds 2025-07-15 \
        --data-dir DATA --warehouse WH
    python -m etl_tj_project_spark.cli backfill --start 2025-07-01 \
        --end 2025-07-31 --data-dir DATA --warehouse WH

``run-daily`` is DAG 2 for one logical date (reads raw transaction CSVs
from ``--data-dir``, dims from the warehouse, writes the three aggregates
with dynamic partition overwrite); ``backfill`` loops it over a date range
(the reference's ``catchup`` equivalent — each day is independently
idempotent, so a crashed backfill just re-runs). On a cluster, submit this
module via ``spark-submit``; locally it builds a ``local[*]`` session.
"""

from __future__ import annotations

import argparse
import datetime as dt
import sys

from etl_tj_project_spark import io as lake_io
from etl_tj_project_spark.plans import daily
from etl_tj_project_spark.session import get_spark


def _dims_from_warehouse(spark, wh: daily.Warehouse):
    return {
        name: lake_io.read_table(spark, wh.dim(name))
        for name in ("routes", "shelter_corridor", "realisasi_bus")
    }


def _run_daily(spark, ds: str, data_dir: str, wh: daily.Warehouse) -> dict[str, int]:
    bus_raw, halte_raw = daily.raw_trx_from_csv(spark, data_dir)
    dims = _dims_from_warehouse(spark, wh)
    out = daily.run_daily(
        spark,
        ds,
        bus_raw=bus_raw,
        halte_raw=halte_raw,
        routes=dims["routes"],
        realisasi_bus=dims["realisasi_bus"],
        shelter_corridor=dims["shelter_corridor"],
        wh=wh,
    )
    # The reference's post-load verification counts (dag_datapelangan.py:
    # 236-239) — read back what was written.
    return {
        name: lake_io.read_table(spark, wh.agg(name))
        .filter(f"tanggal = DATE '{ds}'")
        .count()
        for name in out
    }


def main(argv: list[str] | None = None) -> int:
    p = argparse.ArgumentParser(prog="etl_tj_project_spark")
    sub = p.add_subparsers(dest="cmd", required=True)

    p_dims = sub.add_parser("load-dims", help="stage + promote dimension CSVs")
    p_dims.add_argument("--data-dir", required=True)
    p_dims.add_argument("--warehouse", required=True)

    p_day = sub.add_parser("run-daily", help="one logical date of DAG 2")
    p_day.add_argument("--ds", required=True, help="YYYY-MM-DD")
    p_day.add_argument("--data-dir", required=True)
    p_day.add_argument("--warehouse", required=True)

    p_bf = sub.add_parser("backfill", help="run-daily over [start, end]")
    p_bf.add_argument("--start", required=True)
    p_bf.add_argument("--end", required=True)
    p_bf.add_argument("--data-dir", required=True)
    p_bf.add_argument("--warehouse", required=True)

    args = p.parse_args(argv)
    spark = get_spark("etl_tj_cli")
    wh = daily.Warehouse(args.warehouse)
    try:
        if args.cmd == "load-dims":
            dims = daily.load_dims(spark, args.data_dir, wh)
            for name, df in dims.items():
                print(f"{name}: {df.count()} rows")
        elif args.cmd == "run-daily":
            counts = _run_daily(spark, args.ds, args.data_dir, wh)
            for name, n in counts.items():
                print(f"{name}[{args.ds}]: {n} rows")
        elif args.cmd == "backfill":
            d = dt.date.fromisoformat(args.start)
            end = dt.date.fromisoformat(args.end)
            while d <= end:
                counts = _run_daily(spark, d.isoformat(), args.data_dir, wh)
                total = sum(counts.values())
                print(f"{d.isoformat()}: {total} aggregate rows")
                d += dt.timedelta(days=1)
        return 0
    finally:
        spark.stop()


if __name__ == "__main__":
    sys.exit(main())
