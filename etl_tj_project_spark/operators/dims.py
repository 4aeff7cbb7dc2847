"""Dimension promotion: all-text staging → typed dimension tables.

Reference parity (dags/stage_csv_dims_to_pg.py:122-154):
* routes:            trim key, NULL-reject, upsert ON CONFLICT (S5)
* shelter_corridor:  trim key, NULLIF('')::int corridor, upsert (S5)
* realisasi_bus:     truncate-and-reload with regex-dispatched date parse
                     + norm_body materialized at load time (S6, F10-F12)

Upsert semantics on a MERGE-less lake format: dims are broadcast-sized, so
we recompute wholesale — for a full reload last-writer-wins equals the
reference's steady state. ``upsert_dim`` also supports true incremental
upsert (anti-join + union) for callers that feed deltas.

The regex date dispatch deliberately reproduces the reference's behavior
of loading NULL for `M/D/YYYY` single-digit-month dates (they match
neither pattern — SURVEY §5 says: do NOT "fix" this).
"""

from __future__ import annotations

from pyspark.sql import Column, DataFrame
from pyspark.sql import functions as F

from etl_tj_project_spark.functions.cleaning import norm_body, nullif_empty


def promote_routes(staging: DataFrame) -> DataFrame:
    """dw.routes ← trim(route_code), route_name WHERE route_code IS NOT NULL."""
    return (
        staging.filter(F.col("route_code").isNotNull())
        .select(
            F.trim(F.col("route_code")).alias("route_code"),
            F.col("route_name"),
        )
        # ON CONFLICT (route_code) DO UPDATE — within one load, last write
        # wins per key; dropDuplicates on the key reproduces the steady
        # state of repeated upserts from a deduplicated source.
        .dropDuplicates(["route_code"])
    )


def promote_shelter_corridor(staging: DataFrame) -> DataFrame:
    """dw.shelter_corridor ← trimmed key, NULLIF('')::int corridor."""
    return (
        staging.filter(F.col("shelter_name_var").isNotNull())
        .select(
            F.trim(F.col("shelter_name_var")).alias("shelter_name_var"),
            nullif_empty(F.trim(F.col("corridor_code")))
            .try_cast("int")
            .alias("corridor_code"),
            F.col("corridor_name"),
        )
        .dropDuplicates(["shelter_name_var"])
    )


def parse_realisasi_date(c: Column) -> Column:
    """Regex-dispatched date parse (ref stage_csv_dims_to_pg.py:145-151).

    Only ISO `YYYY-MM-DD` and `DD/MM/YYYY` parse; anything else (including
    the reference data's own `M/D/YYYY`) → NULL, faithfully.
    """
    return (
        F.when(c.rlike(r"^\d{4}-\d{2}-\d{2}$"), F.to_date(c, "yyyy-MM-dd"))
        .when(c.rlike(r"^\d{2}/\d{2}/\d{4}$"), F.to_date(c, "dd/MM/yyyy"))
        .otherwise(F.lit(None).cast("date"))
    )


def promote_realisasi_bus(staging: DataFrame) -> DataFrame:
    """dw.realisasi_bus ← parsed date, norm_body key, route (full reload)."""
    return staging.select(
        parse_realisasi_date(F.col("tanggal_realisasi")).alias("tanggal_realisasi"),
        norm_body(F.col("bus_body_no")).alias("bus_body_no_norm"),
        F.col("rute_realisasi"),
    )


def upsert_dim(existing: DataFrame, incoming: DataFrame, key: str) -> DataFrame:
    """Incremental keyed upsert (ON CONFLICT DO UPDATE) without MERGE:
    keep existing rows whose key is absent from incoming, then union the
    incoming rows. Both sides stay distributed; with a broadcast-sized
    incoming delta the anti-join is shuffle-free."""
    survivors = existing.join(
        F.broadcast(incoming.select(key).distinct()), on=key, how="left_anti"
    )
    return survivors.unionByName(incoming)
