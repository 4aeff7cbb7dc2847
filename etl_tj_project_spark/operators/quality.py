"""Data-quality expectations: declarative checks evaluated as exact
violation counts — the publish gate a production pipeline runs between
computing a day's outputs and committing them (pairs with
io.commit_partitions_atomic: expectations red → day not published).

Execution shape, chosen for 100 TB:
* all ROW-LEVEL rules against one table (not-null, range, regex, set
  membership) fold into a SINGLE conditional-aggregation scan — adding a
  rule adds a column, not a pass;
* uniqueness is one groupBy on the key (the same shuffle a dedup would
  pay), counting surplus rows;
* referential integrity is one anti-join, broadcast when the parent key
  side is dim-sized.

Every check returns exact BIGINT counts, so the whole report is
cross-engine hashable (registered as ``dq_expectations``).
"""

from __future__ import annotations

from pyspark.sql import Column, DataFrame
from pyspark.sql import functions as F

REPORT_COLS = ("rule", "n_violations")


def row_rules_report(df: DataFrame, rules: dict[str, Column]) -> DataFrame:
    """Evaluate named row-level predicates (True = VIOLATION) in one
    conditional-aggregation scan; returns (rule, n_violations) rows."""
    # Internal aliases are sanitized (rule names carry dots); the display
    # name appears only as a string literal in the stack().
    aggs = [
        F.sum(F.when(pred, 1).otherwise(0)).cast("long").alias(f"__r{i}")
        for i, pred in enumerate(rules.values())
    ]
    wide = df.agg(*aggs)
    stack = ", ".join(
        "'" + name.replace("'", "\\'") + f"', __r{i}"
        for i, name in enumerate(rules)
    )
    return wide.selectExpr(
        f"stack({len(rules)}, {stack}) as (rule, n_violations)"
    )


def unique_report(df: DataFrame, cols: list[str], rule: str) -> DataFrame:
    """Surplus-row count over the candidate key (0 when unique)."""
    surplus = (
        df.groupBy(*cols)
        .agg(F.count(F.lit(1)).alias("n"))
        .agg(F.sum(F.col("n") - 1).cast("long").alias("n_violations"))
    )
    return surplus.select(F.lit(rule).alias("rule"), "n_violations")


def ref_integrity_report(
    child: DataFrame,
    child_col: str,
    parent: DataFrame,
    parent_col: str,
    rule: str,
    broadcast_parent: bool = True,
) -> DataFrame:
    """Count of child rows whose non-null key has no parent row."""
    keys = parent.select(F.col(parent_col).alias(child_col)).distinct()
    if broadcast_parent:
        keys = F.broadcast(keys)
    orphans = (
        child.filter(F.col(child_col).isNotNull())
        .join(keys, on=child_col, how="left_anti")
        .agg(F.count(F.lit(1)).cast("long").alias("n_violations"))
    )
    return orphans.select(F.lit(rule).alias("rule"), "n_violations")


def combine_reports(*reports: DataFrame) -> DataFrame:
    out = reports[0]
    for r in reports[1:]:
        out = out.unionByName(r)
    return out
