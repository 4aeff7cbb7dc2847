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


def click_purchase_attribution_outer(
    clicks: DataFrame,
    purchases: DataFrame,
    window: str = "1 hour",
    watermark: str = "2 hours",
) -> DataFrame:
    """LEFT OUTER variant of :func:`click_purchase_attribution`: EVERY
    purchase emits — purchases with at least one qualifying click fan
    out exactly like the inner join, and purchases with NO click in the
    preceding ``window`` emit ONE row with NULL click columns.

    The classic stream-stream outer-join watermark trap lives in the
    NULL rows' timing: Spark cannot know a purchase is unmatched until
    no future click could still qualify, so the NULL row is emitted
    only once the watermark passes the purchase's match-eligibility
    range — in a micro-batch AFTER the purchase's own, and exactly
    once (the purchase's join state is dropped as the row is emitted).
    A pipeline that treats the outer join's output as complete "as of
    the purchase's batch" silently misses every not-yet-flushed NULL
    row; the equality-to-batch test in tests/test_streaming.py pins
    both the exactly-once NULL emission and its deferral until
    watermark passage on a bounded multi-batch replay.

    State bounding is the same pair as the inner join — watermarks on
    BOTH event-time columns plus the time-range join constraint. Spark
    additionally REQUIRES them for outer stream-stream joins (without
    the constraint the unmatched side could never be declared final).
    At 100 TB/day the state is O(window x arrival rate), same as the
    inner join, plus the unmatched-purchase buffer the watermark
    drains. Works identically on two static frames (plain left join)
    for the batch twin.
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
    return p.join(c, cond, "left_outer").select(
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
