"""Plan-shape regression guard for the bench HEADLINE queries.

Every headline query's physical-plan NODE SEQUENCE is pinned against
the committed baseline (tools/plan_fingerprints.json). The fingerprint
is invariant to expression ids / paths / stats, so this fails exactly
when a plan's SHAPE silently changes — a broadcast join flipping to
sort-merge, a new exchange appearing, a pushdown getting lost, a
TakeOrderedAndProject degrading to global sort. Those are the
regressions wall-clock noise can hide at bench scale but that dominate
at 100 TB.

Intentional plan changes: regenerate the baseline with
    python tools/gen_plan_fingerprints.py
and commit the diff — the REVIEWED diff is the point.
"""

from __future__ import annotations

import json
import os

import pytest

REPO = os.path.dirname(os.path.dirname(os.path.abspath(__file__)))
BASELINE = os.path.join(REPO, "tools", "plan_fingerprints.json")


def test_headline_plan_shapes_match_committed_baseline(spark):
    import sys

    sys.path.insert(0, REPO)
    import bench
    from tools.gen_plan_fingerprints import CACHE_SENSITIVE, snapshot

    if not os.path.exists(BASELINE):
        pytest.fail(
            "tools/plan_fingerprints.json missing — run "
            "tools/gen_plan_fingerprints.py and commit it"
        )
    with open(BASELINE) as fh:
        want = json.load(fh)
    got = snapshot(spark)
    # Every headline query must be pinned (a new headline entry without
    # a committed fingerprint is itself a finding).
    from etl_tj_project_spark import harness

    expected_names = {
        n
        for n in bench.HEADLINE
        if n in harness.REGISTRY and n not in CACHE_SENSITIVE
    }
    assert set(want) == expected_names, (
        "baseline out of date with HEADLINE: regenerate "
        f"(missing={sorted(expected_names - set(want))}, "
        f"stale={sorted(set(want) - expected_names)})"
    )
    diffs = {
        n: (want[n], got[n]) for n in sorted(expected_names)
        if want.get(n) != got.get(n)
    }
    assert not diffs, (
        "plan SHAPE changed for: "
        + ", ".join(diffs)
        + " — if intentional, regenerate tools/plan_fingerprints.json"
    )
