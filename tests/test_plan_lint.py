"""Exhaustive physical-plan lint over EVERY registry entry.

test_scale_plans.py pins the scale properties of chosen plans; this
sweep pins two structural scale-killers across the whole 250+ entry
registry so no future entry can reintroduce them silently:

* **CartesianProduct** — a non-broadcast cartesian join is quadratic in
  rows; at 100 TB it never finishes. (Broadcast nested-loop joins
  against one-row/KB frames are a different node and remain legal.)
* **Exchange SinglePartition over unreduced input** — funneling a fact
  stream into one task serializes the cluster. A single-partition
  exchange is legal ONLY above an already-reduced stream: an aggregate
  (group count ~ KB), a TakeOrdered/Limit, or a broadcast-built
  one-row frame. The lint walks the plan tree and demands such a
  reducer somewhere in the exchange's SUBTREE.

Planning all entries costs ~1.5 min at sf0.001 (a handful of entries
run bounded construction-time jobs); it is the price of making "no
scale-killers, plan-asserted" a registry-wide invariant instead of a
per-query promise.
"""

from __future__ import annotations

import re

import pytest

from etl_tj_project_spark import harness
from tests.conftest import SF_SMOKE

# Node names that prove the stream feeding an Exchange SinglePartition
# was already reduced to aggregate/limit scale.
_REDUCERS = re.compile(
    r"HashAggregate|SortAggregate|ObjectHashAggregate|"
    r"TakeOrderedAndProject|CollectLimit|GlobalLimit|LocalLimit|"
    r"BroadcastExchange|Expand"
)


def _subtree(lines: list[str], idx: int) -> list[str]:
    """Lines of the plan subtree rooted at ``lines[idx]``, using the
    tree-drawing prefix depth (position of the node marker)."""

    def depth(ln: str) -> int:
        m = re.search(r"[+*][- ]|:-", ln)
        return m.start() if m else 0

    d0 = depth(lines[idx])
    out = []
    for ln in lines[idx + 1:]:
        if ln.strip() and depth(ln) <= d0 and re.search(r"[+*][- ]|:-", ln):
            break
        out.append(ln)
    return out


@pytest.fixture(scope="module")
def all_plans(spark):
    plans: dict[str, str] = {}
    for name, e in harness.REGISTRY.items():
        plans[name] = (
            e.spark(spark, SF_SMOKE)
            ._jdf.queryExecution()
            .executedPlan()
            .toString()
        )
    return plans


def test_no_cartesian_product_anywhere(all_plans):
    offenders = [n for n, p in all_plans.items() if "CartesianProduct" in p]
    assert not offenders, offenders


# Entries whose single-partition exchange is legal WITHOUT a reducer in
# its subtree, each with the reason the lint can't see textually.
_SINGLE_PARTITION_ALLOW = {
    # operators/dedup.narrow_persisted: the few-MB cached candidate-pair
    # table is repartitioned to ceil(rows / 2M) partitions (capped by
    # shuffle width) so downstream multi-join stages aren't
    # scheduling-bound; 1 partition is the SMOKE-SF value of a
    # size-dispatched formula, not a fixed funnel — at scale the same
    # call yields rows/2M partitions.
    "graph_triangle_count",
    # Same narrow_persisted size dispatch, applied to both the
    # canonicalize manifest and the survivor pair table.
    "graph_triangle_count_canonical",
    "graph_residual_clustering_coefficient",
    # Round 16: same narrow_persisted size dispatch on the residual
    # pair table feeding the LCC + merge-edge stages (1 partition is
    # the smoke-SF value of the rows/2M formula, not a fixed funnel).
    "dedup_lcc_second_pass",
}


def test_single_partition_exchanges_sit_above_reducers(all_plans):
    offenders: list[tuple[str, str]] = []
    for name, plan in all_plans.items():
        if name in _SINGLE_PARTITION_ALLOW:
            continue
        lines = plan.splitlines()
        for i, ln in enumerate(lines):
            if "Exchange SinglePartition" not in ln:
                continue
            sub = "\n".join(_subtree(lines, i))
            if not _REDUCERS.search(sub):
                offenders.append((name, ln.strip()[:80]))
    assert not offenders, offenders


def test_no_full_table_sort_without_range_partitioning(all_plans):
    """A global Sort must ride a rangepartitioning exchange (distributed
    sort) — a Sort directly above Exchange SinglePartition over a fact
    scan would serialize the corpus through one task. (Sorts inside a
    single partition after aggregation are fine and common.)"""
    offenders = []
    for name, plan in all_plans.items():
        lines = plan.splitlines()
        for i, ln in enumerate(lines):
            if "Exchange SinglePartition" not in ln:
                continue
            # The PARENT chain right above the exchange: a global Sort
            # consuming the single partition.
            above = lines[max(0, i - 1)]
            if re.search(r"\bSort\b", above):
                sub = "\n".join(_subtree(lines, i))
                if not _REDUCERS.search(sub):
                    offenders.append((name, above.strip()[:80]))
    assert not offenders, offenders
