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


def enrich_with_dim(
    events: DataFrame, user_dim: DataFrame, on: str = "user_id"
) -> DataFrame:
    """Stream-static enrichment: left-join a (streaming or static) event
    flow to a static dimension on ``on``, keeping unmatched events with
    NULL attributes (the reference's J2/J3 left-join-to-dim semantics,
    lifted to a stream).

    Stream-static joins need no watermark — the static side is not
    state, it is re-read (and re-broadcast when small) per micro-batch,
    which also means a dim refresh between batches is picked up for
    free. At 100 TB/day the dim stays broadcast-sized by construction
    (per-key attributes), so each micro-batch is a map-side hash join
    with zero shuffle of the stream.
    """
    dim = user_dim
    dup = [c for c in dim.columns if c != on and c in events.columns]
    for c in dup:
        dim = dim.withColumnRenamed(c, f"dim_{c}")
    return events.join(F.broadcast(dim), on, "left")
