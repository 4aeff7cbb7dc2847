"""Property-based parity for the interval operators: the bin-bucketed
join rewrite and the running-max-end overlap merge vs independent pure-
Python models, over Hypothesis-generated interval sets.

Batch-per-example like test_property_cleaning: each Hypothesis example
builds ONE pair of DataFrames and runs ONE job, keeping the suite fast.
Integers are kept small so the brute-force models stay trivial.
"""

from __future__ import annotations

from hypothesis import HealthCheck, given, settings
from hypothesis import strategies as st

from etl_tj_project_spark.operators.joins import binned_interval_join

POINT = st.integers(min_value=-50, max_value=50)
IVS = st.lists(
    st.tuples(POINT, st.integers(min_value=0, max_value=25)),
    min_size=0,
    max_size=12,
)
PTS = st.lists(POINT, min_size=0, max_size=15)
BIN_W = st.sampled_from([1, 3, 7, 10])


@settings(
    max_examples=25,
    deadline=None,
    suppress_health_check=[HealthCheck.too_slow],
)
@given(points=PTS, ivs=IVS, w=BIN_W)
def test_binned_interval_join_equals_bruteforce(spark, points, ivs, w):
    pts_df = spark.createDataFrame(
        [(i, p) for i, p in enumerate(points)] or [(None, None)],
        "pid long, p long",
    ).filter("pid IS NOT NULL")
    iv_df = spark.createDataFrame(
        [(j, lo, lo + span) for j, (lo, span) in enumerate(ivs)]
        or [(None, None, None)],
        "iid long, lo long, hi long",
    ).filter("iid IS NOT NULL")
    got = {
        (r.pid, r.iid)
        for r in binned_interval_join(
            pts_df, iv_df, "p", "lo", "hi", bin_width=w
        ).collect()
    }
    want = {
        (i, j)
        for i, p in enumerate(points)
        for j, (lo, span) in enumerate(ivs)
        if lo <= p <= lo + span
    }
    assert got == want


def _merge_model(ivs: list[tuple[int, int]]) -> list[tuple[int, int]]:
    """Classic sweep: sort by (lo, hi), extend while overlapping/touching."""
    out: list[list[int]] = []
    for lo, hi in sorted(ivs):
        if out and lo <= out[-1][1]:
            out[-1][1] = max(out[-1][1], hi)
        else:
            out.append([lo, hi])
    return [tuple(x) for x in out]


@settings(
    max_examples=25,
    deadline=None,
    suppress_health_check=[HealthCheck.too_slow],
)
@given(ivs=IVS)
def test_interval_merge_overlaps_equals_sweep_model(spark, ivs):
    """The registered running-max-end islands rewrite must agree with
    the textbook sweep on arbitrary (incl. fully-contained) intervals."""
    from pyspark.sql import Window
    from pyspark.sql import functions as F

    rows = [(lo, lo + span) for lo, span in ivs]
    df = spark.createDataFrame(rows or [(None, None)], "lo long, hi long").filter(
        "lo IS NOT NULL"
    )
    # Same formulation as the interval_merge_overlaps registry entry:
    # island starts where lo exceeds the running max hi of PRIOR rows.
    w = Window.orderBy("lo", "hi")
    prior_max = F.max("hi").over(w.rowsBetween(Window.unboundedPreceding, -1))
    isl = df.withColumn(
        "new_isl",
        F.when(
            prior_max.isNull() | (F.col("lo") > prior_max), 1
        ).otherwise(0),
    ).withColumn(
        "isl", F.sum("new_isl").over(w.rowsBetween(Window.unboundedPreceding, 0))
    )
    got = sorted(
        (r.lo, r.hi)
        for r in isl.groupBy("isl")
        .agg(F.min("lo").alias("lo"), F.max("hi").alias("hi"))
        .collect()
    )
    assert got == _merge_model(rows)


# ---------------------------------------------------------------------------
# Sessionization property parity (gap rule vs pure-Python model)
# ---------------------------------------------------------------------------

EVENTS = st.lists(
    st.tuples(
        st.integers(min_value=0, max_value=2),       # user
        st.integers(min_value=0, max_value=10_000),  # ts (abstract units)
    ),
    min_size=0,
    max_size=30,
)
GAP = st.sampled_from([1, 50, 500])


@settings(
    max_examples=25,
    deadline=None,
    suppress_health_check=[HealthCheck.too_slow],
)
@given(events=EVENTS, gap=GAP)
def test_gap_sessionization_matches_model(spark, events, gap):
    """The lag+running-sum sessionization (the registered `sessionize`
    formulation, gap parameterized) must agree with a sequential model
    on arbitrary streams — including simultaneous timestamps, where the
    event_id tiebreak keeps both deterministic."""
    from pyspark.sql import Window
    from pyspark.sql import functions as F

    rows = [(eid, u, ts) for eid, (u, ts) in enumerate(events)]
    df = spark.createDataFrame(
        rows or [(None, None, None)], "event_id long, user_id long, ts_us long"
    ).filter("event_id IS NOT NULL")
    w_order = Window.partitionBy("user_id").orderBy("ts_us", "event_id")
    w_run = w_order.rowsBetween(Window.unboundedPreceding, Window.currentRow)
    is_new = F.when(
        F.col("ts_us") - F.lag("ts_us").over(w_order) > gap, F.lit(1)
    ).otherwise(F.lit(0))
    got = {
        r.event_id: r.session_id
        for r in df.withColumn("is_new", is_new)
        .select(
            "event_id",
            F.sum("is_new").over(w_run).cast("long").alias("session_id"),
        )
        .collect()
    }

    want: dict[int, int] = {}
    by_user: dict[int, list] = {}
    for eid, u, ts in rows:
        by_user.setdefault(u, []).append((ts, eid))
    for u, evs in by_user.items():
        evs.sort()
        sid, prev = 0, None
        for ts, eid in evs:
            if prev is not None and ts - prev > gap:
                sid += 1
            want[eid] = sid
            prev = ts
    assert got == want
