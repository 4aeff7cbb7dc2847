"""Typed cleaning views over raw transaction tables.

Reference parity: ``src.vw_trx_bus_raw`` / ``src.vw_trx_halte_raw``
(dags/dag_datapelangan.py:68-86) — a typed, normalized projection over the
all-text facts (S3 + P1 + F1/F13/F14 + UD1/UD2 in SURVEY §2).

These are pure ``select`` lineage: Catalyst collapses them into the scan,
so at 100 TB the casts/normalizations ride along with predicate pushdown
and column pruning instead of materializing an intermediate.
"""

from __future__ import annotations

from pyspark.sql import DataFrame
from pyspark.sql import functions as F

from etl_tj_project_spark.functions.cleaning import norm_body, to_bool_safe
from etl_tj_project_spark.schemas import AMOUNT


def _common_typed_columns() -> list:
    return [
        # CAST(waktu_transaksi AS timestamp)::date — text → ts → date
        F.col("waktu_transaksi")
        .try_cast("timestamp")
        .cast("date")
        .alias("tanggal"),
        F.upper(F.col("card_type_var")).alias("card_type"),
        F.col("fare_int").try_cast(AMOUNT).alias("amount"),
        F.upper(F.col("status_var")).alias("status_var"),
    ]


def vw_trx_bus(raw: DataFrame) -> DataFrame:
    """Typed bus-transaction view (ref dag_datapelangan.py:68-76)."""
    return raw.select(
        *_common_typed_columns(),
        norm_body(F.col("no_body_var")).alias("no_body_norm"),
        to_bool_safe(F.col("gate_in_boo")).alias("gate_in_boo"),
    )


def vw_trx_halte(raw: DataFrame) -> DataFrame:
    """Typed halte-transaction view (ref dag_datapelangan.py:78-86)."""
    return raw.select(
        *_common_typed_columns(),
        F.col("shelter_name_var"),
        to_bool_safe(F.col("gate_in_boo")).alias("gate_in_boo"),
    )


def filter_day_success(view: DataFrame, ds: str) -> DataFrame:
    """The reference's manual federation pushdown (P2+P3) as a declarative
    filter: ``status_var='S' AND tanggal = DATE ds``
    (ref dag_datapelangan.py:175-177,182-184). Catalyst pushes both into
    the scan (partition pruning on a `tanggal`-partitioned lake)."""
    return view.filter(
        (F.col("status_var") == "S") & (F.col("tanggal") == F.lit(ds).cast("date"))
    )
