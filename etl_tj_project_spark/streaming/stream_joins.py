"""Watermarked stream-stream joins: click→purchase attribution.

Each purchase joins to the same user's clicks from the preceding
attribution window. Both sides carry watermarks and the join carries a
time-range constraint — that pair is what lets Spark BOUND the join
state: a buffered click can be dropped once the watermark passes
click_ts + window (without the range constraint, both sides' state grows
forever and a 100 TB/day stream OOMs in hours).

The batch twin (same function applied to static DataFrames — Spark
accepts the identical plan both ways) is what the equivalence test
checks against an availableNow streaming run.
"""

from __future__ import annotations

from pyspark.sql import DataFrame
from pyspark.sql import functions as F


def click_purchase_attribution(
    clicks: DataFrame,
    purchases: DataFrame,
    window: str = "1 hour",
    watermark: str = "2 hours",
) -> DataFrame:
    """(purchase_id, user_id, purchase_ts, click_id, click_ts) for every
    click of the same user within ``window`` before the purchase
    (inclusive). Works on two streaming DataFrames (state-bounded
    stream-stream inner join) or two static ones (plain range join).
    """
    c = clicks.select(
        F.col("user_id").alias("c_user_id"),
        F.col("event_id").alias("click_id"),
        F.col("ts").alias("click_ts"),
    )
    p = purchases.select(
        F.col("user_id").alias("p_user_id"),
        F.col("event_id").alias("purchase_id"),
        F.col("ts").alias("purchase_ts"),
    )
    if clicks.isStreaming:
        c = c.withWatermark("click_ts", watermark)
        p = p.withWatermark("purchase_ts", watermark)
    cond = (
        (F.col("c_user_id") == F.col("p_user_id"))
        & (F.col("click_ts") <= F.col("purchase_ts"))
        & (
            F.col("click_ts")
            >= F.col("purchase_ts") - F.expr(f"INTERVAL {window}")
        )
    )
    return p.join(c, cond, "inner").select(
        "purchase_id",
        F.col("p_user_id").alias("user_id"),
        "purchase_ts",
        "click_id",
        "click_ts",
    )
