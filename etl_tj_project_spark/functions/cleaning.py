"""The reference's two scalar UDFs, rebuilt as native Column expressions.

Reference definitions (semantics studied, not copied):
* ``norm_body(text) -> text``   — dags/dag_datapelangan.py:46-56 and
  dags/stage_csv_dims_to_pg.py:41-51 (defined twice, identically).
* ``to_bool_safe(any) -> bool`` — dags/dag_datapelangan.py:58-66.

Both are expressed as compositions of built-in functions so they are
vectorized JVM-side and remain foldable/pushdown-able — a row-at-a-time
Python UDF here would serialize every row of a 100 TB fact table through
the Python worker.

Semantic parity traps handled explicitly:
* Postgres ``substring(s from 'regex')`` returns NULL on no-match;
  Spark ``regexp_extract`` returns ``''`` — wrapped with ``nullif``.
* Postgres ``||`` concat propagates NULL; Spark ``concat`` does too
  (``F.concat``, not ``concat_ws``).
* Postgres ``x::boolean`` raises on junk (the reference traps the error
  and returns NULL); Spark's ``try_cast`` yields NULL directly, which is
  also correct under ANSI mode (Spark 4 default).
"""

from __future__ import annotations

from pyspark.sql import Column
from pyspark.sql import functions as F


def _col(c: Column | str) -> Column:
    return c if isinstance(c, Column) else F.col(c)


def nullif_empty(c: Column | str) -> Column:
    """``NULLIF(c, '')`` — empty string to NULL (reference F8)."""
    return F.nullif(_col(c), F.lit(""))


def norm_body(c: Column | str) -> Column:
    """Normalize a dirty bus-body code to ``AAA-###`` (reference UD1).

    Semantics: strip every non-alphanumeric; if the input is NULL or the
    stripped string is empty, return NULL. Otherwise
    ``UPPER(<first 3 consecutive letters>) || '-' ||
    lpad(<first run of 1-3 digits>, 3, '0')``.

    Deliberately lossy (``KLG4590`` → ``KLG-459``) — the loss is what
    produces the J1 join fan-out the reference exhibits (515 raw bodies →
    487 normalized keys → 571 join rows; SURVEY §5). If either regex finds
    no match the whole expression is NULL (Postgres NULL-propagating
    concat), e.g. a body with no digits or fewer than 3 consecutive
    letters.
    """
    s = _col(c)
    only = F.regexp_replace(s, r"[^A-Za-z0-9]", "")
    letters = nullif_empty(F.regexp_extract(only, r"([A-Za-z]{3})", 1))
    digits = nullif_empty(F.regexp_extract(only, r"([0-9]{1,3})", 1))
    normalized = F.concat(F.upper(letters), F.lit("-"), F.lpad(digits, 3, "0"))
    return F.when(s.isNull() | (only == ""), F.lit(None).cast("string")).otherwise(
        normalized
    )


# Accepted literals, checked after uppercasing (reference UD2).
_TRUTHY = ("TRUE", "T", "1", "Y", "YES")
_FALSY = ("FALSE", "F", "0", "N", "NO")


def to_bool_safe(c: Column | str) -> Column:
    """Never-raising boolean coercion (reference UD2).

    Uppercase the text form of the input, then:
    TRUE/T/1/Y/YES → true; FALSE/F/0/N/NO → false; '' (or NULL input) →
    NULL; anything else falls through to a boolean cast whose failure is
    swallowed to NULL (``try_cast``).
    """
    s = _col(c)
    t = F.upper(F.coalesce(s.cast("string"), F.lit("")))
    return (
        F.when(t.isin(*_TRUTHY), F.lit(True))
        .when(t.isin(*_FALSY), F.lit(False))
        .when(t == "", F.lit(None).cast("boolean"))
        .otherwise(s.cast("string").try_cast("boolean"))
    )


def norm_body_sql(expr: str) -> str:
    """ANSI-SQL rendering of :func:`norm_body` over ``expr``.

    Used for DuckDB-oracle parity and for users who drive the engine via
    ``spark.sql``; the regexp functions used exist with identical
    semantics in Spark SQL and DuckDB (DuckDB needs the explicit 'g' flag
    on regexp_replace — Spark replaces globally by default).
    """
    only = f"regexp_replace({expr}, '[^A-Za-z0-9]', '', 'g')"
    letters = f"nullif(regexp_extract({only}, '([A-Za-z]{{3}})', 1), '')"
    digits = f"nullif(regexp_extract({only}, '([0-9]{{1,3}})', 1), '')"
    return (
        f"CASE WHEN {expr} IS NULL OR {only} = '' THEN NULL "
        f"ELSE upper({letters}) || '-' || lpad({digits}, 3, '0') END"
    )


def to_bool_safe_sql(expr: str) -> str:
    """ANSI-SQL rendering of :func:`to_bool_safe` (DuckDB-compatible)."""
    t = f"upper(coalesce(CAST({expr} AS VARCHAR), ''))"
    truthy = ", ".join(f"'{v}'" for v in _TRUTHY)
    falsy = ", ".join(f"'{v}'" for v in _FALSY)
    return (
        f"CASE WHEN {t} IN ({truthy}) THEN TRUE "
        f"WHEN {t} IN ({falsy}) THEN FALSE "
        f"WHEN {t} = '' THEN NULL "
        f"ELSE TRY_CAST({expr} AS BOOLEAN) END"
    )
