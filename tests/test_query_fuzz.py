"""Differential predicate fuzzing: randomly generated (seeded,
reproducible) filter expressions over lineitem run through BOTH engines
and must hash-match — the registry proves chosen queries, this probes
the space between them (operator precedence, type coercion, NULL
propagation, NaN-free double arithmetic).

Grammar is the cross-engine-deterministic subset the repo's conventions
allow: doubles via explicit CAST, + - * (no division — ANSI throw on
zero), comparisons, AND/OR/NOT, string equality on a categorical
column. Every run generates the same 40 predicates (fixed seed)."""

from __future__ import annotations

import random

import pytest

from etl_tj_project_spark.sources.testdata import load_table
from tests.conftest import SF_SMOKE
from tests.oracle_compare import compare, duck_connection

NUM_COLS = ["l_quantity", "l_extendedprice", "l_discount", "l_linenumber"]
STR_VALS = ["A", "N", "R"]


def _num(rng: random.Random, depth: int) -> str:
    if depth <= 0 or rng.random() < 0.4:
        if rng.random() < 0.85:
            return f"CAST({rng.choice(NUM_COLS)} AS DOUBLE)"
        return f"{rng.randint(-50, 200)}.0"
    op = rng.choice(["+", "-", "*"])
    return f"({_num(rng, depth - 1)} {op} {_num(rng, depth - 1)})"


def _pred(rng: random.Random, depth: int) -> str:
    if depth <= 0 or rng.random() < 0.35:
        if rng.random() < 0.25:
            return f"l_returnflag = '{rng.choice(STR_VALS)}'"
        cmp_op = rng.choice(["<", "<=", ">", ">=", "="])
        return f"{_num(rng, 2)} {cmp_op} {_num(rng, 2)}"
    r = rng.random()
    if r < 0.45:
        return f"({_pred(rng, depth - 1)} AND {_pred(rng, depth - 1)})"
    if r < 0.9:
        return f"({_pred(rng, depth - 1)} OR {_pred(rng, depth - 1)})"
    return f"(NOT {_pred(rng, depth - 1)})"


def _gen(n: int) -> list[str]:
    rng = random.Random(20260813)
    return [_pred(rng, 3) for _ in range(n)]


PREDICATES = _gen(40)


@pytest.fixture(scope="module")
def duck():
    con = duck_connection(SF_SMOKE)
    yield con
    con.close()


@pytest.fixture(scope="module")
def li_view(spark):
    load_table(spark, SF_SMOKE, "lineitem").createOrReplaceTempView(
        "__fuzz_lineitem"
    )
    return "__fuzz_lineitem"


@pytest.mark.parametrize("idx", range(len(PREDICATES)))
def test_random_predicate_matches_oracle(spark, duck, li_view, idx):
    pred = PREDICATES[idx]
    sql = (
        "SELECT l_orderkey, l_linenumber FROM {t} WHERE " + pred
    )
    sdf = spark.sql(sql.format(t=li_view))
    compare(sdf, duck, sql.format(t="lineitem"))


def test_fuzz_predicates_are_not_vacuous(spark, li_view):
    """The generated family must actually exercise the data: at least
    40% of predicates select a non-empty, non-total subset."""
    total = spark.table(li_view).count()
    selective = 0
    for pred in PREDICATES:
        n = spark.sql(
            f"SELECT COUNT(*) AS n FROM {li_view} WHERE {pred}"
        ).collect()[0].n
        if 0 < n < total:
            selective += 1
    assert selective >= len(PREDICATES) * 0.4, selective


# ---------------------------------------------------------------------------
# Aggregate fuzzing: grouped sums/counts/min/max over random numeric
# expressions. SUM of doubles would be shuffle-order-dependent, so sums
# go through DECIMAL(28,6) internally (exact) and pin to DOUBLE on
# output — the repo-wide convention, here applied to generated queries.
# ---------------------------------------------------------------------------

def _agg_query(rng: random.Random) -> str:
    expr = _num(rng, 2)
    agg = rng.choice(
        [
            f"CAST(CAST(SUM(CAST(({expr}) AS DECIMAL(28,6))) AS DOUBLE) AS DOUBLE)",
            f"MIN({expr})",
            f"MAX({expr})",
            f"COUNT(CASE WHEN {_pred(rng, 1)} THEN 1 END)",
        ]
    )
    return (
        "SELECT l_returnflag, l_linestatus, COUNT(*) AS n, "
        + agg
        + " AS m FROM {t} WHERE "
        + _pred(rng, 2)
        + " GROUP BY l_returnflag, l_linestatus"
    )


AGG_QUERIES = [
    _agg_query(random.Random(911_000 + i)) for i in range(15)
]


@pytest.mark.parametrize("idx", range(len(AGG_QUERIES)))
def test_random_grouped_aggregate_matches_oracle(spark, duck, li_view, idx):
    sql = AGG_QUERIES[idx]
    sdf = spark.sql(sql.format(t=li_view))
    compare(sdf, duck, sql.format(t="lineitem"))


# ---------------------------------------------------------------------------
# Window-function differential fuzzing
# ---------------------------------------------------------------------------
#
# Same philosophy as the predicate fuzzer, applied to the window executor:
# randomly generated (seeded) PARTITION BY / ORDER BY / ROWS-frame
# combinations must hash-match across engines. The grammar is restricted
# to the deterministic subset the repo's conventions demand:
#  * every ORDER BY ends with a tiebreak over EVERY column the query
#    references — (l_orderkey, l_linenumber) is NOT unique in the
#    synthetic lineitem (6000 rows / 4599 distinct at sf0.001), so a
#    short tiebreak leaves lag/lead seeing an arbitrary neighbor; with
#    the full-column tiebreak any remaining ties are indistinguishable
#    w.r.t. all referenced columns, which makes the OUTPUT multiset
#    order-independent even where the row order is not total;
#  * frame aggregates run on BIGINT (l_quantity is integral; CAST is
#    exact), never on doubles, so accumulation order cannot drift;
#  * only ROWS frames (RANGE peer semantics differ more subtly and are
#    pinned separately by window_range_frame / window_null_ordering_pack).

WIN_PARTITIONS = [
    "l_returnflag",
    "l_linestatus",
    "l_returnflag, l_linestatus",
    "l_suppkey % 4",
]
WIN_SORTS = [
    "l_quantity",
    "l_extendedprice DESC",
    "l_shipdate",
    "l_discount DESC",
]


def _win_exprs(rng: random.Random) -> str:
    part = rng.choice(WIN_PARTITIONS)
    sort = rng.choice(WIN_SORTS)
    tiebreak = (
        "l_orderkey, l_linenumber, l_quantity, l_extendedprice, "
        "l_discount, l_shipdate"
    )
    over_ranked = f"PARTITION BY {part} ORDER BY {sort}, {tiebreak}"
    qty = "CAST(l_quantity AS BIGINT)"
    lo = rng.randint(1, 5)
    frame = rng.choice(
        [
            f"ROWS BETWEEN {lo} PRECEDING AND CURRENT ROW",
            "ROWS BETWEEN UNBOUNDED PRECEDING AND CURRENT ROW",
            f"ROWS BETWEEN {lo} PRECEDING AND {rng.randint(0, 2)} FOLLOWING",
        ]
    )
    fn = rng.random()
    if fn < 0.3:
        expr = f"{rng.choice(['row_number()', 'rank()', 'dense_rank()'])} OVER ({over_ranked})"
    elif fn < 0.55:
        expr = f"SUM({qty}) OVER ({over_ranked} {frame})"
    elif fn < 0.7:
        expr = f"COUNT(*) OVER ({over_ranked} {frame})"
    elif fn < 0.85:
        expr = (
            f"{rng.choice(['MIN', 'MAX'])}({qty}) OVER ({over_ranked} {frame})"
        )
    else:
        off = rng.randint(1, 3)
        expr = (
            f"{rng.choice(['lag', 'lead'])}({qty}, {off}, -1)"
            f" OVER ({over_ranked})"
        )
    return f"CAST({expr} AS BIGINT)"


def _gen_windows(n: int) -> list[str]:
    rng = random.Random(20260814)
    return [_win_exprs(rng) for _ in range(n)]


WINDOW_EXPRS = _gen_windows(25)


@pytest.mark.parametrize("idx", range(len(WINDOW_EXPRS)))
def test_random_window_matches_oracle(spark, duck, li_view, idx):
    expr = WINDOW_EXPRS[idx]
    sql = (
        "SELECT l_orderkey, l_linenumber, " + expr + " AS w FROM {t}"
    )
    sdf = spark.sql(sql.format(t=li_view))
    compare(sdf, duck, sql.format(t="lineitem"))


# ---------------------------------------------------------------------------
# Aggregation differential fuzzing
# ---------------------------------------------------------------------------
#
# Random GROUP BY key sets x aggregate lists over the exact-arithmetic
# subset (COUNT always; SUM/MIN/MAX on BIGINT; conditional aggregation
# via FILTER-free CASE so the same text runs on both engines).

AGG_KEYS = [
    ["l_returnflag"],
    ["l_linestatus"],
    ["l_suppkey % 3"],
    ["CAST(l_shipdate AS DATE)"],
    ["l_returnflag", "l_linestatus"],
]


def _agg_exprs(rng: random.Random) -> tuple[str, str, str]:
    key_exprs = rng.choice(AGG_KEYS)
    # Expression keys auto-name differently per engine — alias them.
    key_sel = ", ".join(f"{e} AS k{i}" for i, e in enumerate(key_exprs))
    key_grp = ", ".join(key_exprs)
    qty = "CAST(l_quantity AS BIGINT)"
    cents = "CAST(round(l_extendedprice * 100, 0) AS BIGINT)"
    # Every SUM is wrapped: DuckDB SUM(BIGINT) widens to HUGEINT, which
    # the compare harness (correctly) refuses to canonicalize.
    pool = [
        "CAST(COUNT(*) AS BIGINT)",
        f"CAST(SUM({qty}) AS BIGINT)",
        f"MIN({qty})",
        f"MAX({cents})",
        f"CAST(SUM(CASE WHEN l_returnflag = 'R' THEN {qty} ELSE 0 END)"
        " AS BIGINT)",
        "CAST(SUM(CASE WHEN l_discount > 0.05 THEN 1 ELSE 0 END)"
        " AS BIGINT)",
        "CAST(COUNT(DISTINCT l_suppkey) AS BIGINT)",
        f"MAX(CASE WHEN l_linestatus = 'O' THEN {cents} END)",
    ]
    aggs = rng.sample(pool, rng.randint(2, 4))
    cols = ", ".join(f"{a} AS a{i}" for i, a in enumerate(aggs))
    return key_sel, key_grp, cols


def _gen_aggs(n: int) -> list[tuple[str, str, str]]:
    rng = random.Random(20260815)
    return [_agg_exprs(rng) for _ in range(n)]


AGG_CASES = _gen_aggs(20)


@pytest.mark.parametrize("idx", range(len(AGG_CASES)))
def test_random_aggregate_matches_oracle(spark, duck, li_view, idx):
    key_sel, key_grp, cols = AGG_CASES[idx]
    sql = f"SELECT {key_sel}, {cols} FROM {{t}} GROUP BY {key_grp}"
    sdf = spark.sql(sql.format(t=li_view))
    compare(sdf, duck, sql.format(t="lineitem"))


# ---------------------------------------------------------------------------
# Join differential fuzzing
# ---------------------------------------------------------------------------
#
# lineitem x orders on the real key under random join types and random
# residual predicates from the predicate grammar. SEMI/ANTI are spelled
# EXISTS/NOT EXISTS (the form both engines parse identically).

def _gen_joins(n: int) -> list[tuple[str, str]]:
    rng = random.Random(20260816)
    out = []
    for _ in range(n):
        kind = rng.choice(["inner", "left", "semi", "anti"])
        pred = _pred(rng, 2)
        out.append((kind, pred))
    return out


JOIN_CASES = _gen_joins(15)


@pytest.fixture(scope="module")
def o_view(spark):
    load_table(spark, SF_SMOKE, "orders").createOrReplaceTempView(
        "__fuzz_orders"
    )
    return "__fuzz_orders"


@pytest.mark.parametrize("idx", range(len(JOIN_CASES)))
def test_random_join_matches_oracle(spark, duck, li_view, o_view, idx):
    kind, pred = JOIN_CASES[idx]
    if kind in ("inner", "left"):
        join = "JOIN" if kind == "inner" else "LEFT JOIN"
        sql = (
            "SELECT l.l_orderkey, l.l_linenumber, o.o_orderstatus "
            f"FROM {{t}} l {join} {{o}} o ON o.o_orderkey = l.l_orderkey "
            f"WHERE {pred}"
        )
    else:
        neg = "" if kind == "semi" else "NOT "
        sql = (
            "SELECT l.l_orderkey, l.l_linenumber "
            f"FROM {{t}} l WHERE {neg}EXISTS ("
            "SELECT 1 FROM {o} o WHERE o.o_orderkey = l.l_orderkey) "
            f"AND {pred}"
        )
    sdf = spark.sql(sql.format(t=li_view, o=o_view))
    compare(sdf, duck, sql.format(t="lineitem", o="orders"))


# ---------------------------------------------------------------------------
# Set-operation differential fuzzing
# ---------------------------------------------------------------------------
#
# UNION / UNION ALL / INTERSECT / EXCEPT between two randomly-predicated
# projections of lineitem. DISTINCT-flavored set ops are the interesting
# surface (bag vs set semantics, NULL equality inside set ops).

def _gen_setops(n: int) -> list[tuple[str, str, str]]:
    rng = random.Random(20260817)
    out = []
    for _ in range(n):
        op = rng.choice(["UNION", "UNION ALL", "INTERSECT", "EXCEPT"])
        out.append((op, _pred(rng, 2), _pred(rng, 2)))
    return out


SETOP_CASES = _gen_setops(15)


@pytest.mark.parametrize("idx", range(len(SETOP_CASES)))
def test_random_setop_matches_oracle(spark, duck, li_view, idx):
    op, p1, p2 = SETOP_CASES[idx]
    sql = (
        "SELECT l_orderkey, l_linenumber, l_returnflag FROM {t} "
        f"WHERE {p1} {op} "
        "SELECT l_orderkey, l_linenumber, l_returnflag FROM {t} "
        f"WHERE {p2}"
    )
    sdf = spark.sql(sql.format(t=li_view))
    compare(sdf, duck, sql.format(t="lineitem"))


# ---------------------------------------------------------------------------
# String-function differential fuzzing
# ---------------------------------------------------------------------------
#
# Portable string subset (identical semantics verified by the function
# packs, here recombined randomly): upper/lower/trim/reverse, substr
# with positive offsets, lpad/rpad, replace, ||-concat, length/instr.
# Dialect-divergent members (split_part, negative substr offsets, regex
# replacement) stay in their hand-pinned pack entries.

def _str_expr(rng: random.Random, depth: int) -> str:
    base = rng.choice(
        ["o_orderpriority", "o_orderstatus", "o_orderpriority"]
    )
    if depth <= 0 or rng.random() < 0.35:
        return base
    inner = _str_expr(rng, depth - 1)
    r = rng.random()
    if r < 0.15:
        return f"upper({inner})"
    if r < 0.3:
        return f"lower({inner})"
    if r < 0.4:
        return f"trim({inner})"
    if r < 0.5:
        return f"reverse({inner})"
    if r < 0.62:
        i, n = rng.randint(1, 4), rng.randint(1, 6)
        return f"substr({inner}, {i}, {n})"
    if r < 0.74:
        fn = rng.choice(["lpad", "rpad"])
        return f"{fn}({inner}, {rng.randint(1, 12)}, '{rng.choice('xy_')}')"
    if r < 0.86:
        a, b = rng.sample(["1", "2", "-", "U", "E", "N"], 2)
        return f"replace({inner}, '{a}', '{b}')"
    return f"({inner} || '{rng.choice(['#', '/', ''])}' || {_str_expr(rng, depth - 1)})"


def _gen_strs(n: int) -> list[str]:
    rng = random.Random(20260818)
    return [_str_expr(rng, 3) for _ in range(n)]


STR_EXPRS = _gen_strs(20)


@pytest.mark.parametrize("idx", range(len(STR_EXPRS)))
def test_random_string_expr_matches_oracle(spark, duck, o_view, idx):
    expr = STR_EXPRS[idx]
    sql = (
        "SELECT o_orderkey, " + expr + " AS s, "
        f"CAST(length({expr}) AS BIGINT) AS n, "
        f"CAST(instr({expr}, '-') AS BIGINT) AS pos "
        "FROM {o}"
    )
    sdf = spark.sql(sql.format(o=o_view))
    compare(sdf, duck, sql.format(o="orders"))


# ---------------------------------------------------------------------------
# Conditional-expression differential fuzzing (round 7)
# ---------------------------------------------------------------------------
#
# CASE WHEN / COALESCE / NULLIF over INTEGER-exact operands (the
# existing predicate grammar supplies the conditions): probes lazy
# branch evaluation, NULL propagation through conditionals, and
# branch-type unification — all engine codepaths the registry's chosen
# queries exercise only at fixed shapes. Integer operands keep the
# comparison bit-exact by construction.

_INT_TERMS = [
    "CAST(l_quantity AS BIGINT)",
    "CAST(round(l_extendedprice * 100, 0) AS BIGINT)",
    "CAST(l_linenumber AS BIGINT)",
    "(l_suppkey % 7)",
]


def _int_expr(rng: random.Random, depth: int) -> str:
    if depth <= 0 or rng.random() < 0.45:
        if rng.random() < 0.8:
            return rng.choice(_INT_TERMS)
        return str(rng.randint(-20, 100))
    op = rng.choice(["+", "-", "*"])
    return f"({_int_expr(rng, depth - 1)} {op} {_int_expr(rng, depth - 1)})"


def _case_cols(rng: random.Random) -> str:
    branches = "".join(
        f"WHEN {_pred(rng, 1)} THEN {_int_expr(rng, 1)} "
        for _ in range(rng.randint(1, 3))
    )
    case = f"CASE {branches}ELSE {_int_expr(rng, 1)} END"
    # NULLIF introduces NULLs mid-expression; COALESCE must swallow
    # them identically in both engines.
    coal = (
        f"COALESCE(NULLIF({_int_expr(rng, 1)}, {rng.randint(0, 30)}), "
        f"{_int_expr(rng, 0)})"
    )
    # A CASE with no ELSE: the implicit NULL arm.
    noelse = f"CASE WHEN {_pred(rng, 1)} THEN {_int_expr(rng, 1)} END"
    return (
        f"CAST({case} AS BIGINT) AS c0, CAST({coal} AS BIGINT) AS c1, "
        f"CAST({noelse} AS BIGINT) AS c2"
    )


def _gen_cases(n: int) -> list[str]:
    rng = random.Random(20260819)
    return [_case_cols(rng) for _ in range(n)]


CASE_COLS = _gen_cases(12)


@pytest.mark.parametrize("idx", range(len(CASE_COLS)))
def test_random_conditional_matches_oracle(spark, duck, li_view, idx):
    sql = (
        "SELECT l_orderkey, l_linenumber, " + CASE_COLS[idx] + " FROM {t}"
    )
    sdf = spark.sql(sql.format(t=li_view))
    compare(sdf, duck, sql.format(t="lineitem"))


# ---------------------------------------------------------------------------
# Date-part differential fuzzing (round 7)
# ---------------------------------------------------------------------------
#
# EXTRACT and date_trunc over the timestamp column, grouped with
# integer aggregates: probes calendar math (year/month/quarter/week
# boundaries, truncation) where engines classically diverge. Output
# columns are BIGINT counts and extracted parts — bit-exact by
# construction. (week is EXCLUDED: Spark counts ISO weeks of the year
# starting at the year's first Thursday; DuckDB's `week` differs on
# year-boundary days.)

_DATE_PARTS = ["year", "month", "day", "quarter"]
_TRUNC_UNITS = ["year", "month", "quarter"]


def _date_case(rng: random.Random) -> tuple[str, str, str]:
    part = rng.choice(_DATE_PARTS)
    unit = rng.choice(_TRUNC_UNITS)
    keys = (
        f"CAST(EXTRACT({part} FROM l_shipdate) AS BIGINT) AS k0, "
        f"CAST(date_trunc('{unit}', l_shipdate) AS DATE) AS k1"
    )
    grp = f"EXTRACT({part} FROM l_shipdate), date_trunc('{unit}', l_shipdate)"
    qty = "CAST(l_quantity AS BIGINT)"
    aggs = (
        f"CAST(COUNT(*) AS BIGINT) AS n, CAST(SUM({qty}) AS BIGINT) AS sq, "
        f"CAST(MIN(l_shipdate) AS DATE) AS d0"
    )
    return keys, grp, aggs


def _gen_dates(n: int) -> list[tuple[str, str, str]]:
    rng = random.Random(20260820)
    return [_date_case(rng) for _ in range(n)]


DATE_CASES = _gen_dates(10)


@pytest.mark.parametrize("idx", range(len(DATE_CASES)))
def test_random_datepart_matches_oracle(spark, duck, li_view, idx):
    keys, grp, aggs = DATE_CASES[idx]
    sql = f"SELECT {keys}, {aggs} FROM {{t}} GROUP BY {grp}"
    sdf = spark.sql(sql.format(t=li_view))
    compare(sdf, duck, sql.format(t="lineitem"))


# ---------------------------------------------------------------------------
# Set-membership & range differential fuzzing (round 7)
# ---------------------------------------------------------------------------
#
# IN / NOT IN / BETWEEN with and without a NULL in the list: NOT IN
# against a list containing NULL is three-valued-logic's classic trap
# (never TRUE, so rows vanish) — both engines must agree row-for-row.
# The registry pins the subquery form (not_in_null_semantics); this
# probes the literal-list form at random shapes.

def _member_pred(rng: random.Random) -> str:
    col = rng.choice(["(l_suppkey % 11)", "CAST(l_quantity AS BIGINT)",
                      "CAST(l_linenumber AS BIGINT)"])
    vals = sorted(rng.sample(range(0, 30), rng.randint(2, 5)))
    lst = ", ".join(str(v) for v in vals)
    r = rng.random()
    if r < 0.3:
        return f"{col} IN ({lst})"
    if r < 0.55:
        return f"{col} NOT IN ({lst})"
    if r < 0.7:
        # The trap arm: NULL in the NOT IN list.
        return f"(NOT ({col} IN ({lst}, NULL)) OR {col} IS NULL)"
    lo, hi = sorted(rng.sample(range(0, 40), 2))
    if r < 0.85:
        return f"{col} BETWEEN {lo} AND {hi}"
    return f"{col} NOT BETWEEN {lo} AND {hi}"


def _gen_members(n: int) -> list[str]:
    rng = random.Random(20260821)
    return [
        f"({_member_pred(rng)} {'AND' if rng.random() < 0.5 else 'OR'} "
        f"{_member_pred(rng)})"
        for _ in range(n)
    ]


MEMBER_PREDS = _gen_members(12)


@pytest.mark.parametrize("idx", range(len(MEMBER_PREDS)))
def test_random_membership_matches_oracle(spark, duck, li_view, idx):
    sql = (
        "SELECT l_orderkey, l_linenumber FROM {t} WHERE "
        + MEMBER_PREDS[idx]
    )
    sdf = spark.sql(sql.format(t=li_view))
    compare(sdf, duck, sql.format(t="lineitem"))


# ---------------------------------------------------------------------------
# Multi-dimensional aggregation differential fuzzing (round 7)
# ---------------------------------------------------------------------------
#
# ROLLUP / CUBE / GROUPING SETS over random key subsets: probes the
# NULL-marker semantics of super-aggregate rows (a NULL key cell must
# mean "all values" identically in both engines) beyond the registry's
# fixed rollup_agg shape. Keys are chosen non-null so NULL cells are
# unambiguous markers.

_GS_KEYS = ["l_returnflag", "l_linestatus", "(l_suppkey % 3)"]


def _gs_case(rng: random.Random) -> tuple[str, str]:
    ks = rng.sample(_GS_KEYS, rng.randint(2, 3))
    form = rng.choice(["ROLLUP", "CUBE", "SETS"])
    if form == "SETS":
        subsets = ["(" + ", ".join(ks) + ")", "()"]
        if rng.random() < 0.7:
            subsets.insert(1, "(" + ks[0] + ")")
        grp = f"GROUPING SETS ({', '.join(subsets)})"
    else:
        grp = f"{form} ({', '.join(ks)})"
    sel = ", ".join(f"{k} AS k{i}" for i, k in enumerate(ks))
    return sel, grp


def _gen_gs(n: int) -> list[tuple[str, str]]:
    rng = random.Random(20260822)
    return [_gs_case(rng) for _ in range(n)]


GS_CASES = _gen_gs(10)


@pytest.mark.parametrize("idx", range(len(GS_CASES)))
def test_random_grouping_sets_matches_oracle(spark, duck, li_view, idx):
    sel, grp = GS_CASES[idx]
    qty = "CAST(l_quantity AS BIGINT)"
    sql = (
        f"SELECT {sel}, CAST(COUNT(*) AS BIGINT) AS n, "
        f"CAST(SUM({qty}) AS BIGINT) AS sq FROM {{t}} GROUP BY {grp}"
    )
    sdf = spark.sql(sql.format(t=li_view))
    compare(sdf, duck, sql.format(t="lineitem"))


# ---------------------------------------------------------------------------
# HAVING & deterministic top-k differential fuzzing (round 7)
# ---------------------------------------------------------------------------
#
# HAVING filters over aggregate values, and ORDER BY ... LIMIT with a
# TOTAL sort key (unique tiebreak columns appended — cross-engine tie
# order is undefined otherwise, so the grammar makes ties impossible
# rather than hoping).

def _having_case(rng: random.Random) -> tuple[str, str, str, str]:
    key = rng.choice(["l_returnflag", "l_linestatus", "(l_suppkey % 5)"])
    qty = "CAST(l_quantity AS BIGINT)"
    agg = rng.choice(
        ["CAST(COUNT(*) AS BIGINT)", f"CAST(SUM({qty}) AS BIGINT)",
         f"MAX({qty})"]
    )
    hav = rng.choice(
        [f"COUNT(*) > {rng.randint(1, 2000)}",
         f"SUM({qty}) > {rng.randint(100, 60000)}",
         f"MIN({qty}) >= {rng.randint(1, 10)}"]
    )
    return key, agg, hav, ""


def _gen_having(n: int) -> list[tuple[str, str, str, str]]:
    rng = random.Random(20260823)
    return [_having_case(rng) for _ in range(n)]


HAVING_CASES = _gen_having(8)


@pytest.mark.parametrize("idx", range(len(HAVING_CASES)))
def test_random_having_matches_oracle(spark, duck, li_view, idx):
    key, agg, hav, _ = HAVING_CASES[idx]
    sql = (
        f"SELECT {key} AS k, {agg} AS a FROM {{t}} "
        f"GROUP BY {key} HAVING {hav}"
    )
    sdf = spark.sql(sql.format(t=li_view))
    compare(sdf, duck, sql.format(t="lineitem"))


def _gen_topk(n: int) -> list[tuple[str, str, int]]:
    rng = random.Random(20260824)
    out = []
    for _ in range(n):
        expr = _int_expr(rng, 1)
        direction = rng.choice(["ASC", "DESC"])
        out.append((expr, direction, rng.randint(3, 50)))
    return out


TOPK_CASES = _gen_topk(8)


@pytest.mark.parametrize("idx", range(len(TOPK_CASES)))
def test_random_ordered_limit_matches_oracle(spark, duck, li_view, idx):
    expr, direction, k = TOPK_CASES[idx]
    # l_orderkey+l_linenumber appended: a total order, so LIMIT is
    # deterministic in both engines.
    sql = (
        f"SELECT l_orderkey, l_linenumber, CAST({expr} AS BIGINT) AS v "
        f"FROM {{t}} ORDER BY v {direction}, l_orderkey, l_linenumber "
        f"LIMIT {k}"
    )
    sdf = spark.sql(sql.format(t=li_view))
    compare(sdf, duck, sql.format(t="lineitem"))


# ---------------------------------------------------------------------------
# String ordering in window frames (round 8): empty string vs NULL
# under both NULLS options and both directions
# ---------------------------------------------------------------------------
#
# Both engines use binary collation by default, so '' < 'A' everywhere;
# the hazard is NULL placement (default NULLS ordering differs by
# engine and direction) and frame composition when NULLs/empties sit at
# frame edges. The grammar always SPELLS the NULLS option explicitly
# (the repo-wide rule: never rely on an engine default) and appends a
# unique tiebreak so every window order is total.

_STR_WITH_HOLES = (
    "CASE WHEN l_linenumber % 7 = 0 THEN NULL "
    "WHEN l_suppkey % 5 = 0 THEN '' "
    "ELSE l_returnflag || CAST(l_suppkey % 10 AS STRING) END"
)


def _strwin_case(rng: random.Random) -> tuple[str, str]:
    part = rng.choice(["l_returnflag", "l_linestatus", "(l_suppkey % 4)"])
    direction = rng.choice(["ASC", "DESC"])
    nulls = rng.choice(["NULLS FIRST", "NULLS LAST"])
    order_s = f"s {direction} {nulls}"
    total = f"{order_s}, l_orderkey, l_linenumber"
    fn = rng.choice(
        [
            # rank over s alone: deterministic under ties by definition
            f"RANK() OVER (PARTITION BY {part} ORDER BY {order_s})",
            f"DENSE_RANK() OVER (PARTITION BY {part} ORDER BY {order_s})",
            f"ROW_NUMBER() OVER (PARTITION BY {part} ORDER BY {total})",
            f"FIRST_VALUE(s) OVER (PARTITION BY {part} ORDER BY {total} "
            "ROWS BETWEEN UNBOUNDED PRECEDING AND CURRENT ROW)",
            f"LAST_VALUE(s) OVER (PARTITION BY {part} ORDER BY {total} "
            "ROWS BETWEEN 2 PRECEDING AND CURRENT ROW)",
            f"LEAD(s, 1) OVER (PARTITION BY {part} ORDER BY {total})",
            f"LAG(s, 1, '<none>') OVER (PARTITION BY {part} ORDER BY {total})",
            f"COUNT(s) OVER (PARTITION BY {part} ORDER BY {total} "
            "ROWS BETWEEN UNBOUNDED PRECEDING AND CURRENT ROW)",
        ]
    )
    return part, fn


def _gen_strwin(n: int) -> list[tuple[str, str]]:
    rng = random.Random(20260825)
    return [_strwin_case(rng) for _ in range(n)]


STRWIN_CASES = _gen_strwin(12)


@pytest.mark.parametrize("idx", range(len(STRWIN_CASES)))
def test_random_string_window_matches_oracle(spark, duck, li_view, idx):
    part, fn = STRWIN_CASES[idx]
    sql = (
        f"SELECT l_orderkey, l_linenumber, s, {fn} AS w FROM "
        f"(SELECT l_orderkey, l_linenumber, l_returnflag, l_linestatus, "
        f"l_suppkey, {_STR_WITH_HOLES} AS s FROM {{t}}) base"
    )
    sdf = spark.sql(sql.format(t=li_view))
    compare(sdf, duck, sql.format(t="lineitem"))


def test_string_window_source_has_nulls_and_empties(spark, li_view):
    """The class is vacuous unless the derived column actually contains
    NULL, '' and regular values in the smoke data."""
    row = spark.sql(
        f"SELECT COUNT(CASE WHEN s IS NULL THEN 1 END) AS n_null, "
        f"COUNT(CASE WHEN s = '' THEN 1 END) AS n_empty, "
        f"COUNT(CASE WHEN s > '' THEN 1 END) AS n_str FROM "
        f"(SELECT {_STR_WITH_HOLES} AS s FROM {li_view}) b"
    ).collect()[0]
    assert row.n_null > 0 and row.n_empty > 0 and row.n_str > 0, row


# ---------------------------------------------------------------------------
# Decimal precision/rounding boundaries (round 8): wide-precision sums
# and ROUND at digit boundaries
# ---------------------------------------------------------------------------
#
# Engines diverge on decimal arithmetic in two places: result-type
# inference for products (Spark p1+p2+1, DuckDB p1+p2) and rounding
# mode. The grammar normalizes every intermediate with an explicit CAST
# (the repo-wide convention) and exercises ROUND on exact DECIMAL
# digits, where both engines do HALF_UP away from zero — a divergence
# here is a real bug, not a representation artifact. Sums run at
# DECIMAL(38,x), the max-precision boundary.

def _dec_case(rng: random.Random) -> tuple[str, str, int]:
    key = rng.choice(["l_returnflag", "l_linestatus", "(l_partkey % 3)"])
    a = rng.choice(["l_extendedprice", "l_quantity"])
    b = rng.choice(["l_discount", "l_tax"])
    expr = rng.choice(
        [
            f"CAST(CAST({a} AS DECIMAL(18,2)) * CAST({b} AS DECIMAL(18,2)) "
            "AS DECIMAL(38,4))",
            f"CAST(CAST({a} AS DECIMAL(18,2)) + CAST({b} AS DECIMAL(18,2)) "
            "AS DECIMAL(38,4))",
            f"CAST(CAST({a} AS DECIMAL(18,2)) - "
            f"CAST({rng.randint(0, 40)}.{rng.randint(0, 9)}5 "
            "AS DECIMAL(18,3)) AS DECIMAL(38,4))",
        ]
    )
    d = rng.randint(0, 3)
    return key, expr, d


def _gen_dec(n: int) -> list[tuple[str, str, int]]:
    rng = random.Random(20260826)
    return [_dec_case(rng) for _ in range(n)]


DEC_CASES = _gen_dec(12)


@pytest.mark.parametrize("idx", range(len(DEC_CASES)))
def test_random_decimal_rounding_matches_oracle(spark, duck, li_view, idx):
    # All arithmetic, rounding and summation happen EXACTLY in decimal;
    # only the final representation pins to DOUBLE (repo convention —
    # compare() rejects DECIMAL outputs), which is lossless here: every
    # aggregate fits 2^53 at scale 4.
    key, expr, d = DEC_CASES[idx]
    sql = (
        f"SELECT {key} AS k, "
        f"CAST(CAST(SUM({expr}) AS DECIMAL(38,4)) AS DOUBLE) AS s38, "
        f"CAST(CAST(SUM(CAST(ROUND({expr}, {d}) AS DECIMAL(38,4))) "
        f"AS DECIMAL(38,4)) AS DOUBLE) AS sr, "
        f"CAST(CAST(MIN(ROUND({expr}, {d})) AS DECIMAL(38,4)) AS DOUBLE) "
        f"AS mn, "
        f"CAST(CAST(MAX(ROUND({expr}, {d})) AS DECIMAL(38,4)) AS DOUBLE) "
        f"AS mx "
        f"FROM {{t}} GROUP BY {key}"
    )
    sdf = spark.sql(sql.format(t=li_view))
    compare(sdf, duck, sql.format(t="lineitem"))


def test_decimal_round_exercises_half_boundary(spark, li_view):
    """At least one generated subtraction case lands values ending in
    exactly .x5 (the 5-at-the-boundary digits ROUND must decide), so
    the class genuinely probes the rounding mode."""
    hits = 0
    for _key, expr, d in DEC_CASES:
        if "AS DECIMAL(18,3))" in expr:
            # expr = value(scale 2) - const whose scale-2 digit is 5:
            # rows whose difference still ends in 5 at scale 2 put
            # ROUND(expr, 1) exactly on the half boundary.
            n = spark.sql(
                f"SELECT COUNT(*) AS n FROM __fuzz_lineitem "
                f"WHERE ABS(CAST(({expr}) * 100 AS BIGINT)) % 10 = 5"
            ).collect()[0].n
            hits += n
    assert hits > 0, "no half-boundary digits generated"


# ---------------------------------------------------------------------------
# Date arithmetic (round 8): dual-SQL class — the engines' syntaxes
# genuinely differ here (Spark date_add/add_months/datediff(end,start)
# vs DuckDB date + n / + TO_MONTHS / datediff('day', start, end)), so
# the generator emits a (spark_sql, duck_sql) PAIR per case and the
# compare pins that the different spellings agree on values: day
# arithmetic over year boundaries, month arithmetic with end-of-month
# clamping (Jan 31 + 1 month), signed offsets, last_day.
# ---------------------------------------------------------------------------

def _date_source(rng: random.Random) -> tuple[str, str]:
    """(spark_expr, duck_expr) for a date source. The synthetic
    lineitem has ONE date column, so the second source is derived by a
    row-dependent day shift — spelled per-engine."""
    if rng.random() < 0.5:
        e = "CAST(l_shipdate AS DATE)"
        return e, e
    shift = f"(CAST(l_suppkey % 90 AS INT) - {rng.randint(0, 60)})"
    return (
        f"date_add(CAST(l_shipdate AS DATE), {shift})",
        f"(CAST(l_shipdate AS DATE) + {shift})",
    )


def _datearith_case(rng: random.Random) -> tuple[str, str]:
    sa, da = _date_source(rng)
    sb, db = _date_source(rng)
    kd = rng.randint(-400, 400)
    km = rng.randint(-25, 25)
    form = rng.choice(["days", "months", "diff", "lastday"])
    if form == "days":
        return f"date_add({sa}, {kd})", f"({da} + ({kd}))"
    if form == "months":
        return (
            f"add_months({sa}, {km})",
            f"CAST({da} + TO_MONTHS({km}) AS DATE)",
        )
    if form == "diff":
        return (
            f"CAST(datediff({sa}, {sb}) AS BIGINT)",
            f"CAST(datediff('day', {db}, {da}) AS BIGINT)",
        )
    return f"last_day({sa})", f"last_day({da})"


def _gen_datearith(n: int) -> list[tuple[str, str]]:
    rng = random.Random(20260827)
    return [_datearith_case(rng) for _ in range(n)]


DATEARITH_CASES = _gen_datearith(12)


@pytest.mark.parametrize("idx", range(len(DATEARITH_CASES)))
def test_random_date_arith_matches_oracle(spark, duck, li_view, idx):
    s_expr, d_expr = DATEARITH_CASES[idx]
    s_sql = (
        f"SELECT l_orderkey, l_linenumber, {s_expr} AS v FROM {li_view}"
    )
    d_sql = f"SELECT l_orderkey, l_linenumber, {d_expr} AS v FROM lineitem"
    sdf = spark.sql(s_sql)
    compare(sdf, duck, d_sql)


def test_date_arith_hits_month_end_clamp(spark, li_view):
    """The months form is vacuous unless some source dates sit past the
    28th, where add_months must clamp (e.g. Jan 31 + 1m -> Feb 29/28)."""
    n = spark.sql(
        f"SELECT COUNT(*) AS n FROM {li_view} "
        "WHERE day(CAST(l_shipdate AS DATE)) >= 29"
    ).collect()[0].n
    assert n > 0, "no month-end dates in the smoke data"


# ---------------------------------------------------------------------------
# UNION type-coercion (round 8): set-operation branch widening
# ---------------------------------------------------------------------------
#
# Each engine widens UNION branches by its own promotion lattice; the
# grammar unions differently-typed branch expressions that BOTH engines
# accept (int/bigint/double/decimal; string||int rendering) and pins
# the merged column to an explicit outer type per the repo convention —
# so what's actually probed is the INNER branch coercion (value
# semantics of widening, decimal->double rendering, int->string
# rendering), not the engines' type-display strings.

_COERCE_BRANCHES = [
    ("CAST(l_linenumber AS INT)", "num"),
    ("CAST(l_suppkey AS BIGINT)", "num"),
    ("CAST(l_quantity AS DOUBLE)", "num"),
    ("CAST(l_extendedprice AS DECIMAL(18,2))", "num"),
    ("CAST(l_tax AS DECIMAL(20,4))", "num"),
    ("l_returnflag", "str"),
    ("CAST(l_linenumber AS STRING)", "str"),
]


def _coerce_case(rng: random.Random) -> tuple[str, str, str]:
    kind = rng.choice(["num", "str"])
    pool = [e for e, k in _COERCE_BRANCHES if k == kind]
    a, b = rng.sample(pool, 2)
    out = "DOUBLE" if kind == "num" else "STRING"
    return a, b, out


def _gen_coerce(n: int) -> list[tuple[str, str, str]]:
    rng = random.Random(20260828)
    return [_coerce_case(rng) for _ in range(n)]


COERCE_CASES = _gen_coerce(10)


@pytest.mark.parametrize("idx", range(len(COERCE_CASES)))
def test_random_union_coercion_matches_oracle(spark, duck, li_view, idx):
    a, b, out = COERCE_CASES[idx]
    sql = (
        f"SELECT l_orderkey, l_linenumber, CAST(v AS {out}) AS v FROM ("
        f"SELECT l_orderkey, l_linenumber, {a} AS v FROM {{t}} "
        f"WHERE l_linenumber % 2 = 0 "
        f"UNION ALL "
        f"SELECT l_orderkey, l_linenumber, {b} AS v FROM {{t}} "
        f"WHERE l_linenumber % 2 = 1) u"
    )
    sdf = spark.sql(sql.format(t=li_view))
    compare(sdf, duck, sql.format(t="lineitem"))


# ---------------------------------------------------------------------------
# Correlated subqueries (round 8): EXISTS / NOT EXISTS / IN / scalar
# ---------------------------------------------------------------------------
#
# The registry proves chosen semi/anti-join shapes; this probes random
# correlated predicates, where the engines' decorrelation rewrites
# (Spark's RewritePredicateSubquery vs DuckDB's flattening) can disagree
# on duplicate handling, NULL-key matches, and empty-group scalars. The
# scalar form uses COUNT/MIN/MAX only (empty correlation group: COUNT
# gives 0, MIN/MAX give NULL — both engines, but only if the rewrite
# preserves the outer row), wrapped in COALESCE so the output stays
# deterministic and non-NULL comparisons don't mask a lost row.

def _corr_case(rng: random.Random) -> tuple[str, str]:
    inner_pred = _pred(rng, 1).replace("l_", "i.l_")
    corr = rng.choice(
        [
            "i.l_orderkey = o.l_orderkey AND i.l_linenumber <> o.l_linenumber",
            "i.l_suppkey = o.l_suppkey AND i.l_orderkey < o.l_orderkey",
            "i.l_partkey = o.l_partkey AND i.l_linenumber > o.l_linenumber",
        ]
    )
    form = rng.choice(["exists", "not_exists", "in", "scalar"])
    if form == "exists":
        sel = "TRUE AS v"
        pred = f"EXISTS (SELECT 1 FROM {{t}} i WHERE {corr} AND {inner_pred})"
    elif form == "not_exists":
        sel = "TRUE AS v"
        pred = (
            f"NOT EXISTS (SELECT 1 FROM {{t}} i WHERE {corr} "
            f"AND {inner_pred})"
        )
    elif form == "in":
        sel = "TRUE AS v"
        pred = (
            f"o.l_linenumber IN (SELECT i.l_linenumber FROM {{t}} i "
            f"WHERE {corr} AND {inner_pred})"
        )
    else:
        agg = rng.choice(
            [
                "COALESCE(CAST(COUNT(*) AS BIGINT), 0)",
                "COALESCE(CAST(MIN(i.l_linenumber) AS BIGINT), -1)",
                "COALESCE(CAST(MAX(i.l_suppkey) AS BIGINT), -1)",
            ]
        )
        sel = (
            f"(SELECT {agg} FROM {{t}} i WHERE {corr} AND {inner_pred}) AS v"
        )
        pred = "o.l_linenumber <= 3"
    return sel, pred


def _gen_corr(n: int) -> list[tuple[str, str]]:
    rng = random.Random(20260829)
    return [_corr_case(rng) for _ in range(n)]


CORR_CASES = _gen_corr(12)


@pytest.mark.parametrize("idx", range(len(CORR_CASES)))
def test_random_correlated_subquery_matches_oracle(spark, duck, li_view, idx):
    sel, pred = CORR_CASES[idx]
    sql = (
        f"SELECT o.l_orderkey, o.l_linenumber, {sel} "
        f"FROM {{t}} o WHERE {pred}"
    )
    sdf = spark.sql(sql.format(t=li_view))
    compare(sdf, duck, sql.format(t="lineitem"))


def test_correlated_class_covers_all_forms_non_vacuously(spark, li_view):
    """Every correlated form must appear, and each of EXISTS / NOT
    EXISTS / IN must have at least one case selecting a strict
    non-empty subset. (Individual random cases MAY be degenerate —
    e.g. an always-false inner predicate — and still probe the
    decorrelation rewrite's empty-result path; the class as a whole
    must not be.)"""
    forms = {"exists": 0, "not_exists": 0, "in": 0, "scalar": 0}
    selective = {"exists": 0, "not_exists": 0, "in": 0}
    total = spark.table(li_view).count()
    for sel, pred in CORR_CASES:
        if sel.startswith("(SELECT"):
            forms["scalar"] += 1
            continue
        if pred.startswith("NOT EXISTS"):
            form = "not_exists"
        elif pred.startswith("EXISTS"):
            form = "exists"
        else:
            form = "in"
        forms[form] += 1
        n = (
            spark.sql(
                f"SELECT COUNT(*) AS n FROM {li_view} o WHERE "
                + pred.format(t=li_view)
            )
            .collect()[0]
            .n
        )
        if 0 < n < total:
            selective[form] += 1
    assert all(v > 0 for v in forms.values()), forms
    assert all(v > 0 for v in selective.values()), selective


# ---------------------------------------------------------------------------
# Numeric RANGE window frames (round 8): value-based frame boundaries
# ---------------------------------------------------------------------------
#
# RANGE frames are defined on ORDER-key VALUES, so peers (ties) always
# enter the frame together — the result is tie-order-independent by
# construction, which makes random frames safely hash-comparable. What
# the engines can disagree on: peer-group inclusion at exact boundary
# values, frames anchored entirely ahead/behind the current row, and
# integer-vs-decimal offset arithmetic on the key. Sums go through
# DECIMAL (exact, order-insensitive) per the repo convention; the order
# key is non-NULL (l_quantity / l_extendedprice / derived ints) so this
# class probes frame arithmetic, not NULL-peer placement (the string
# window class above owns NULL ordering).

def _rangewin_case(rng: random.Random) -> tuple[str, str, str]:
    part = rng.choice(["l_returnflag", "l_linestatus", "(l_suppkey % 3)"])
    key = rng.choice(
        [
            "CAST(l_quantity AS DOUBLE)",
            "CAST(l_extendedprice AS DOUBLE)",
            "CAST(l_partkey % 1000 AS INT)",
        ]
    )
    lo, hi = sorted((rng.randint(0, 500), rng.randint(0, 500)))
    frame = rng.choice(
        [
            f"RANGE BETWEEN {lo} PRECEDING AND CURRENT ROW",
            f"RANGE BETWEEN CURRENT ROW AND {hi} FOLLOWING",
            f"RANGE BETWEEN {lo} PRECEDING AND {hi} FOLLOWING",
            f"RANGE BETWEEN UNBOUNDED PRECEDING AND {hi} FOLLOWING",
        ]
    )
    # (inner window aggregate, outer cast template) — the OVER clause
    # must bind to the aggregate itself; representation pinning wraps
    # the whole window expression afterwards.
    inner, outer = rng.choice(
        [
            ("COUNT(*)", "CAST({w} AS BIGINT)"),
            ("MIN(l_linenumber)", "CAST({w} AS BIGINT)"),
            ("MAX(l_linenumber)", "CAST({w} AS BIGINT)"),
            (
                "SUM(CAST(l_quantity AS DECIMAL(28,6)))",
                "CAST(CAST({w} AS DECIMAL(38,6)) AS DOUBLE)",
            ),
        ]
    )
    win = f"{inner} OVER (PARTITION BY {part} ORDER BY {key} {frame})"
    return part, key, outer.format(w=win)


def _gen_rangewin(n: int) -> list[tuple[str, str, str]]:
    rng = random.Random(20260830)
    return [_rangewin_case(rng) for _ in range(n)]


RANGEWIN_CASES = _gen_rangewin(16)  # 16 covers all 4 aggs x all 4 frames


@pytest.mark.parametrize("idx", range(len(RANGEWIN_CASES)))
def test_random_range_frame_matches_oracle(spark, duck, li_view, idx):
    part, key, fn = RANGEWIN_CASES[idx]
    sql = (
        f"SELECT l_orderkey, l_linenumber, {fn} AS w FROM {{t}}"
    )
    sdf = spark.sql(sql.format(t=li_view))
    compare(sdf, duck, sql.format(t="lineitem"))


def test_range_frames_have_ties_to_probe(spark, li_view):
    """RANGE semantics only differ from ROWS when the order key has
    peers — assert every generated key column actually contains ties
    within at least one partition."""
    keys = {key for _p, key, _f in RANGEWIN_CASES}
    for key in keys:
        n = spark.sql(
            f"SELECT COUNT(*) AS n FROM (SELECT {key} AS k, COUNT(*) AS c "
            f"FROM {li_view} GROUP BY {key} HAVING COUNT(*) > 1) t"
        ).collect()[0].n
        assert n > 0, f"no ties for RANGE key {key}"


# ---------------------------------------------------------------------------
# String functions (round 8): composition chains over NULL/''/varied-len
# ---------------------------------------------------------------------------
#
# Random compositions of the string stdlib both engines share by NAME
# (substr/lpad/rpad/left/right/repeat/reverse/translate/split_part/
# instr/upper/lower/trim/replace/||) over a derived column containing
# NULL, '' and strings of varied length — probing 1-based indexing,
# out-of-range clamps, zero-length results, and NULL propagation
# (composition chains mean one function's edge output feeds the next's
# edge input). Constrained to where the engines agree BY DESIGN:
# substr START is generated >= 1 (position 0 is a pinned divergence —
# DuckDB spends index 0 from the length budget, Spark clamps 0 to 1;
# asserted below so the exclusion stays justified), pads are non-empty
# (DuckDB raises on pad='', Spark returns ''), split_part index >= 1
# (index-0 raises in Spark, returns '' in DuckDB), and negative
# left/right offsets are excluded.

_FUZZ_STR_SRC = (
    "CASE WHEN l_partkey % 11 = 0 THEN NULL "
    "WHEN l_suppkey % 7 = 0 THEN '' "
    "ELSE l_returnflag || l_linestatus || '-' || "
    "CAST(l_partkey % 1000 AS STRING) || repeat(l_linestatus, "
    "CAST(l_suppkey % 4 AS INT)) END"
)


def _str_wrap(rng: random.Random, e: str) -> str:
    form = rng.choice(
        [
            "substr", "lpad", "rpad", "left", "right", "repeat_lit",
            "reverse", "translate", "split_part", "case_flip", "replace",
            "trim_concat",
        ]
    )
    if form == "substr":
        return f"substr({e}, {rng.randint(1, 8)}, {rng.randint(0, 6)})"
    if form == "lpad":
        return f"lpad({e}, {rng.randint(0, 10)}, '{rng.choice(['x', 'xy'])}')"
    if form == "rpad":
        return f"rpad({e}, {rng.randint(0, 10)}, '{rng.choice(['x', 'xy'])}')"
    if form == "left":
        return f"left({e}, {rng.randint(0, 9)})"
    if form == "right":
        return f"right({e}, {rng.randint(0, 9)})"
    if form == "repeat_lit":
        return f"substr(repeat({e}, {rng.randint(0, 2)}), 1, 12)"
    if form == "reverse":
        return f"reverse({e})"
    if form == "translate":
        return f"translate({e}, 'ANF-', 'anf_')"
    if form == "split_part":
        # split_part is the one stdlib function whose NULL propagation
        # DIVERGES (DuckDB: NULL -> '', Spark: NULL -> NULL; pinned
        # below) — spell the ANSI propagation explicitly so the case
        # stays comparable without silently coalescing the input.
        return (
            f"CASE WHEN {e} IS NULL THEN NULL "
            f"ELSE split_part({e}, '-', {rng.randint(1, 3)}) END"
        )
    if form == "case_flip":
        return rng.choice([f"upper({e})", f"lower({e})"])
    if form == "replace":
        return f"replace({e}, '{rng.choice(['-', 'O', 'F'])}', '{rng.choice(['', '#'])}')"
    return f"trim(' ' || {e} || ' ')"


def _strfn_case(rng: random.Random) -> str:
    e = "s"
    for _ in range(rng.randint(1, 3)):
        e = _str_wrap(rng, e)
    # Pair the transformed string with an integer probe of it (instr is
    # shared by name; its not-found 0 and NULL-in -> NULL both agree).
    return (
        f"{e} AS v, CAST(instr({e}, '{rng.choice(['a', '-', 'x', 'N'])}') "
        f"AS BIGINT) AS pos, CAST(length({e}) AS BIGINT) AS len"
    )


def _gen_strfn(n: int) -> list[str]:
    rng = random.Random(20260831)
    return [_strfn_case(rng) for _ in range(n)]


STRFN_CASES = _gen_strfn(14)


@pytest.mark.parametrize("idx", range(len(STRFN_CASES)))
def test_random_string_function_chain_matches_oracle(spark, duck, li_view, idx):
    sel = STRFN_CASES[idx]
    sql = (
        f"SELECT l_orderkey, l_linenumber, {sel} FROM "
        f"(SELECT l_orderkey, l_linenumber, {_FUZZ_STR_SRC} AS s "
        f"FROM {{t}}) base"
    )
    sdf = spark.sql(sql.format(t=li_view))
    compare(sdf, duck, sql.format(t="lineitem"))


def test_substr_position_zero_divergence_is_real(spark, duck):
    """The class generates substr starts >= 1 because position 0 is a
    REAL engine divergence — pin it so the exclusion comment stays
    honest (if an engine upgrade aligns them, this fails and the
    grammar can widen)."""
    s = spark.sql("SELECT substr('hello', 0, 3) AS v").collect()[0].v
    d = duck.execute("SELECT substr('hello', 0, 3)").fetchone()[0]
    assert s == "hel" and d == "he", (s, d)


def test_split_part_null_divergence_is_real(spark, duck):
    """split_part is the one shared-name string function whose NULL
    propagation diverges: Spark follows ANSI (NULL in -> NULL out),
    DuckDB returns ''. The grammar spells the propagation explicitly
    for that wrapper; this pin keeps the workaround justified."""
    s = spark.sql(
        "SELECT split_part(CAST(NULL AS STRING), '-', 1) AS v"
    ).collect()[0].v
    d = duck.execute("SELECT split_part(NULL, '-', 1)").fetchone()[0]
    assert s is None and d == "", (s, d)


def test_string_chain_source_varies(spark, li_view):
    """Class is vacuous unless the derived source has NULLs, empties,
    and at least 4 distinct lengths (edge inputs for every wrapper)."""
    row = spark.sql(
        f"SELECT COUNT(CASE WHEN s IS NULL THEN 1 END) AS n_null, "
        f"COUNT(CASE WHEN s = '' THEN 1 END) AS n_empty, "
        f"COUNT(DISTINCT length(s)) AS n_lens FROM "
        f"(SELECT {_FUZZ_STR_SRC} AS s FROM {li_view}) b"
    ).collect()[0]
    assert row.n_null > 0 and row.n_empty > 0 and row.n_lens >= 4, row


# ---------------------------------------------------------------------------
# TRY_CAST edge strings (round 8): the ANSI-migration safety contract
# ---------------------------------------------------------------------------
#
# try_cast is the repo's ANSI-mode safety valve (try_arithmetic_pack),
# so its NULL-on-failure boundary must be known EXACTLY. Probing found
# the engines agree on: whitespace trimming, '+'/'-0'/leading-zero
# forms, '' -> NULL, thousands separators -> NULL, overflow -> NULL,
# scientific notation INTO DOUBLE, inf/NaN into DOUBLE, and date
# parsing (non-padded '1996-2-3' accepted, invalid days and compact
# '19960203' rejected, surrounding spaces trimmed) — the grammar stays
# inside that subset. They DIVERGE in three pinned places (tests
# below): DuckDB routes decimal-format and scientific-format strings
# into INT by parse-then-round (Spark: strict integral format -> NULL),
# and DuckDB rounds half-away on NUMERIC double->int casts where Spark
# truncates toward zero — so the grammar never casts a non-integral
# string or a fractional numeric to an integer type.

def _tryc_case(rng: random.Random) -> tuple[str, str]:
    form = rng.choice(
        ["spaces", "plus", "zeros", "tail_junk", "empties", "overflow",
         "date_str", "date_spaces", "sci_double"]
    )
    if form == "spaces":
        return (
            f"' ' || CAST(l_partkey % {rng.randint(50, 2000)} AS STRING) "
            f"|| ' '",
            "BIGINT",
        )
    if form == "plus":
        return (f"'+' || CAST(l_suppkey % {rng.randint(10, 99)} AS STRING)",
                "INTEGER")
    if form == "zeros":
        return ("'00' || CAST(l_linenumber AS STRING)", "INTEGER")
    if form == "tail_junk":
        return (
            f"CAST(l_partkey AS STRING) || CASE WHEN l_suppkey % "
            f"{rng.randint(2, 5)} = 0 THEN 'x' ELSE '' END",
            "BIGINT",
        )
    if form == "empties":
        return (
            f"CASE WHEN l_linenumber % 2 = 0 THEN '' "
            f"ELSE CAST(l_suppkey % {rng.randint(100, 999)} AS STRING) END",
            "INTEGER",
        )
    if form == "overflow":
        # Always > 2^31 as a BIGINT-valid string: INTEGER must NULL it.
        return ("CAST(l_partkey + 3000000000 AS STRING)", "INTEGER")
    if form == "date_str":
        return ("CAST(CAST(l_shipdate AS DATE) AS STRING)", "DATE")
    if form == "date_spaces":
        return ("' ' || CAST(CAST(l_shipdate AS DATE) AS STRING) || ' '",
                "DATE")
    return (
        f"CAST(l_quantity AS STRING) || 'e{rng.randint(0, 3)}'",
        "DOUBLE",
    )


def _gen_tryc(n: int) -> list[tuple[str, str]]:
    rng = random.Random(20260901)
    return [_tryc_case(rng) for _ in range(n)]


TRYC_CASES = _gen_tryc(14)


@pytest.mark.parametrize("idx", range(len(TRYC_CASES)))
def test_random_try_cast_matches_oracle(spark, duck, li_view, idx):
    src, target = TRYC_CASES[idx]
    sql = (
        f"SELECT l_orderkey, l_linenumber, "
        f"try_cast(({src}) AS {target}) AS v FROM {{t}}"
    )
    sdf = spark.sql(sql.format(t=li_view))
    compare(sdf, duck, sql.format(t="lineitem"))


def test_try_cast_divergences_are_real(spark, duck):
    """The three excluded forms are REAL divergences — pin them so the
    grammar exclusions stay justified across engine upgrades."""
    rows = spark.sql(
        "SELECT try_cast('12.7' AS INTEGER) AS a, "
        "try_cast('1e3' AS INTEGER) AS b, "
        "CAST(try_cast(12.7 AS INTEGER) AS INT) AS c, "
        "CAST(try_cast(-12.5 AS INTEGER) AS INT) AS d"
    ).collect()[0]
    assert (rows.a, rows.b, rows.c, rows.d) == (None, None, 12, -12), rows
    drow = duck.execute(
        "SELECT try_cast('12.7' AS INTEGER), try_cast('1e3' AS INTEGER), "
        "try_cast(12.7 AS INTEGER), try_cast(-12.5 AS INTEGER)"
    ).fetchone()
    assert drow == (13, 1000, 13, -13), drow


def test_try_cast_class_produces_both_nulls_and_values(spark, li_view):
    """Each generated case family must exercise BOTH outcomes somewhere
    (a class whose try_casts all succeed — or all fail — probes no
    boundary). Checked across the class, not per case: e.g. the
    overflow form is all-NULL by design while spaces is all-valid."""
    n_null = n_val = 0
    for src, target in TRYC_CASES:
        row = spark.sql(
            f"SELECT COUNT(CASE WHEN try_cast(({src}) AS {target}) "
            f"IS NULL THEN 1 END) AS nn, "
            f"COUNT(try_cast(({src}) AS {target})) AS nv FROM {li_view}"
        ).collect()[0]
        n_null += row.nn
        n_val += row.nv
    assert n_null > 0 and n_val > 0, (n_null, n_val)


# ---------------------------------------------------------------------------
# Integer arithmetic dual-SQL (round 8): mod sign / intdiv / bitwise
# ---------------------------------------------------------------------------
#
# Signed modulo, integer division and bitwise operators are classic
# cross-engine hazards (C-style truncation vs floored division, % sign
# conventions, shift semantics) AND the spellings differ (Spark `div` /
# `^` / shiftleft-shiftright vs DuckDB `//` / xor() / `<<` `>>`), so
# this is a dual-SQL class like date arithmetic: each case emits a
# (spark_expr, duck_expr) pair that must agree on values. Probing
# confirmed both engines truncate intdiv toward zero and give % the
# dividend's sign — the class pins that agreement over generated
# signed operands (derived columns crossing zero), all-BIGINT exact.

def _int_src(rng: random.Random) -> str:
    # A signed derived operand, same spelling both engines. Modulus is
    # kept > offset + 9 so every generated operand GENUINELY crosses
    # zero on the data (l_partkey % m spans 0..m-1).
    off = rng.randint(5, 40)
    return (
        f"CAST(l_partkey % {rng.randint(off + 10, 200)} - "
        f"{off} AS BIGINT)"
    )


def _intarith_case(rng: random.Random) -> tuple[str, str]:
    a, b = _int_src(rng), _int_src(rng)
    k = rng.randint(2, 13)
    n = rng.randint(0, 5)
    form = rng.choice(["mod", "intdiv", "band", "bor", "bxor", "shl",
                       "shr", "glmix"])
    if form == "mod":
        e = f"({a}) % {k}"
        return e, e
    if form == "intdiv":
        return f"({a}) div {k}", f"({a}) // {k}"
    if form == "band":
        e = f"({a}) & ({b})"
        return e, e
    if form == "bor":
        e = f"({a}) | ({b})"
        return e, e
    if form == "bxor":
        return f"({a}) ^ ({b})", f"xor({a}, {b})"
    if form == "shl":
        # DuckDB RAISES on left-shifting a negative number where Spark
        # computes a value (pinned below) — shift magnitudes only.
        return f"shiftleft(abs({a}), {n})", f"abs({a}) << {n}"
    if form == "shr":
        return f"shiftright({a}, {n})", f"({a}) >> {n}"
    e = f"greatest({a}, {b}, 0) - least({a}, {b}, 0)"
    return e, e


def _gen_intarith(n: int) -> list[tuple[str, str]]:
    rng = random.Random(20260902)
    return [_intarith_case(rng) for _ in range(n)]


INTARITH_CASES = _gen_intarith(12)


@pytest.mark.parametrize("idx", range(len(INTARITH_CASES)))
def test_random_integer_arith_matches_oracle(spark, duck, li_view, idx):
    s_expr, d_expr = INTARITH_CASES[idx]
    s_sql = (
        f"SELECT l_orderkey, l_linenumber, CAST({s_expr} AS BIGINT) AS v "
        f"FROM {li_view}"
    )
    d_sql = (
        f"SELECT l_orderkey, l_linenumber, CAST({d_expr} AS BIGINT) AS v "
        f"FROM lineitem"
    )
    compare(spark.sql(s_sql), duck, d_sql)


def test_integer_arith_operands_cross_zero(spark, li_view):
    """Sign semantics are only probed if generated operands are genuinely
    signed: every distinct derived operand must produce both negative
    and positive values on the smoke data."""
    import re as _re

    srcs = set()
    for s_expr, _d in INTARITH_CASES:
        srcs.update(_re.findall(r"CAST\(l_partkey % \d+ - \d+ AS BIGINT\)", s_expr))
    assert srcs
    for src in srcs:
        row = spark.sql(
            f"SELECT COUNT(CASE WHEN {src} < 0 THEN 1 END) AS neg, "
            f"COUNT(CASE WHEN {src} > 0 THEN 1 END) AS pos FROM {li_view}"
        ).collect()[0]
        assert row.neg > 0 and row.pos > 0, (src, row)


def test_negative_left_shift_divergence_is_real(spark, duck):
    """DuckDB raises Out of Range on left-shifting a negative number;
    Spark computes the two's-complement result. Pinned so the abs()
    guard in the shift form stays justified."""
    s = spark.sql("SELECT shiftleft(-4, 1) AS v").collect()[0].v
    assert s == -8, s
    import duckdb as _dd

    try:
        duck.execute("SELECT (-4) << 1").fetchone()
    except _dd.OutOfRangeException:
        return
    raise AssertionError("DuckDB now allows negative left shift")


# ---------------------------------------------------------------------------
# JSON path extraction dual-SQL (round 8): scalar leaves + edge shapes
# ---------------------------------------------------------------------------
#
# JSON extraction has fully different spellings (Spark get_json_object
# vs DuckDB json_extract_string) but — probed — identical scalar-leaf
# semantics: unquoted strings, numbers normalized the same way
# (1.50 -> '1.5'), booleans as 'true'/'false', JSON null -> SQL NULL,
# missing path -> NULL, NULL document -> NULL. The one divergence is
# MALFORMED documents: Spark returns NULL, DuckDB raises (pinned
# below) — so every generated document is well-formed by construction
# (built from columns with || inside quoted/numeric slots). Grammar
# extracts scalar leaves and array elements only; object-valued
# extraction re-serialization is not probed.

_JSON_DOC = (
    "'{\"id\": ' || CAST(l_partkey AS STRING) || "
    "', \"tag\": \"' || l_returnflag || '\", "
    "\"nest\": {\"q\": ' || CAST(l_linenumber AS STRING) || "
    "'}, \"arr\": [' || CAST(l_suppkey % 10 AS STRING) || ', ' || "
    "CAST(l_linenumber AS STRING) || ']' || "
    "CASE WHEN l_suppkey % 3 = 0 THEN ', \"opt\": null' "
    "WHEN l_suppkey % 3 = 1 THEN ', \"opt\": ' || "
    "CAST(l_suppkey AS STRING) ELSE '' END || '}'"
)

_JSON_PATHS = ["$.id", "$.tag", "$.nest.q", "$.arr[0]", "$.arr[1]",
               "$.opt", "$.missing", "$.nest.absent"]


def _json_case(rng: random.Random) -> str:
    return rng.choice(_JSON_PATHS)


def _gen_json(n: int) -> list[str]:
    rng = random.Random(20260903)
    return [_json_case(rng) for _ in range(n)]


JSONPATH_CASES = _gen_json(16)  # 16 covers every path shape


@pytest.mark.parametrize("idx", range(len(JSONPATH_CASES)))
def test_random_json_path_matches_oracle(spark, duck, li_view, idx):
    path = JSONPATH_CASES[idx]
    s_sql = (
        f"SELECT l_orderkey, l_linenumber, "
        f"get_json_object({_JSON_DOC}, '{path}') AS v FROM {li_view}"
    )
    d_sql = (
        f"SELECT l_orderkey, l_linenumber, "
        f"json_extract_string({_JSON_DOC}, '{path}') AS v FROM lineitem"
    )
    compare(spark.sql(s_sql), duck, d_sql)


def test_malformed_json_divergence_is_real(spark, duck):
    """Spark's get_json_object NULLs malformed documents; DuckDB's
    json_extract_string raises — pinned so the well-formed-by-
    construction grammar constraint stays justified."""
    s = spark.sql(
        "SELECT get_json_object('not json', '$.a') AS v"
    ).collect()[0].v
    assert s is None, s
    import duckdb as _dd

    try:
        duck.execute("SELECT json_extract_string('not json', '$.a')").fetchone()
    except _dd.Error:
        return
    raise AssertionError("DuckDB now tolerates malformed JSON")


def test_json_class_covers_every_path_shape(spark, li_view):
    """All three leaf kinds (number, string, nested), an array index,
    the tri-state optional key, and a missing path must each appear in
    the generated set — and the optional key must actually take all
    three states (absent / JSON null / number) on the smoke data."""
    kinds = {
        "num": any(p == "$.id" for p in JSONPATH_CASES),
        "str": any(p == "$.tag" for p in JSONPATH_CASES),
        "nest": any(p == "$.nest.q" for p in JSONPATH_CASES),
        "arr": any(p.startswith("$.arr") for p in JSONPATH_CASES),
        "opt": any(p == "$.opt" for p in JSONPATH_CASES),
        "miss": any("missing" in p or "absent" in p for p in JSONPATH_CASES),
    }
    assert all(kinds.values()), kinds
    row = spark.sql(
        f"SELECT COUNT(CASE WHEN s % 3 = 0 THEN 1 END) AS a, "
        f"COUNT(CASE WHEN s % 3 = 1 THEN 1 END) AS b, "
        f"COUNT(CASE WHEN s % 3 = 2 THEN 1 END) AS c FROM "
        f"(SELECT l_suppkey AS s FROM {li_view}) t"
    ).collect()[0]
    assert row.a > 0 and row.b > 0 and row.c > 0, row


# ---------------------------------------------------------------------------
# FILTER-clause and DISTINCT aggregates (round 8): selective accumulation
# ---------------------------------------------------------------------------
#
# The FILTER clause and DISTINCT aggregation interact with partial
# (map-side) aggregation in Spark's physical planning — a FILTER'd or
# DISTINCT aggregate plans differently from a plain one (expand +
# two-phase for DISTINCT), so random combinations probe plan shapes the
# chosen registry entries don't. Grammar: integer-exact expressions
# only (COUNT / SUM(DISTINCT bigint) are set-determined; no doubles),
# random FILTER predicates from the predicate grammar, including the
# FILTER + DISTINCT combination (probed: both engines support it).
# Multi-argument COUNT(DISTINCT x, y) is EXCLUDED — Spark accepts it,
# DuckDB has no such overload (dialect surface gap, not a value
# divergence; spell it COUNT(DISTINCT struct) if ever needed).

def _fdagg_case(rng: random.Random) -> tuple[str, str]:
    key = rng.choice(["l_returnflag", "l_linestatus", "(l_suppkey % 5)"])
    e = rng.choice(
        ["CAST(l_linenumber AS BIGINT)", "CAST(l_suppkey % 40 AS BIGINT)",
         "CAST(l_partkey % 25 AS BIGINT)"]
    )
    p = _pred(rng, 1)
    agg = rng.choice(
        [
            f"COUNT(*) FILTER (WHERE {p})",
            f"COUNT({e}) FILTER (WHERE {p})",
            f"COUNT(DISTINCT {e})",
            f"SUM(DISTINCT {e})",
            f"COUNT(DISTINCT {e}) FILTER (WHERE {p})",
            f"SUM(DISTINCT {e}) FILTER (WHERE {p})",
            f"MIN({e}) FILTER (WHERE {p})",
            f"MAX({e}) FILTER (WHERE {p})",
        ]
    )
    return key, f"CAST({agg} AS BIGINT)"


def _gen_fdagg(n: int) -> list[tuple[str, str]]:
    rng = random.Random(20260904)
    return [_fdagg_case(rng) for _ in range(n)]


FDAGG_CASES = _gen_fdagg(14)


@pytest.mark.parametrize("idx", range(len(FDAGG_CASES)))
def test_random_filter_distinct_agg_matches_oracle(spark, duck, li_view, idx):
    key, agg = FDAGG_CASES[idx]
    sql = (
        f"SELECT {key} AS k, CAST(COUNT(*) AS BIGINT) AS n, {agg} AS m "
        f"FROM {{t}} GROUP BY {key}"
    )
    sdf = spark.sql(sql.format(t=li_view))
    compare(sdf, duck, sql.format(t="lineitem"))


def test_filter_distinct_class_filters_are_selective(spark, li_view):
    """FILTER probes nothing if every generated predicate keeps all or
    no rows — at least half must be strictly selective."""
    import re as _re

    preds = []
    for _k, agg in FDAGG_CASES:
        m = _re.search(r"FILTER \(WHERE (.*)\) AS BIGINT\)$", agg)
        if m:
            preds.append(m.group(1))
    assert preds
    total = spark.table(li_view).count()
    selective = 0
    for p in preds:
        n = spark.sql(
            f"SELECT COUNT(*) AS n FROM {li_view} WHERE {p}"
        ).collect()[0].n
        if 0 < n < total:
            selective += 1
    assert selective * 2 >= len(preds), (selective, len(preds))


# ---------------------------------------------------------------------------
# Array/list functions dual-SQL (round 8): fully different spellings
# ---------------------------------------------------------------------------
#
# Spark's array_* and DuckDB's list_* families share NO spelling but —
# probed — agree on the semantics that matter: 1-based indexing,
# negative indices from the end, out-of-bounds -> NULL (try_element_at
# vs list_extract), position 0-on-miss, join-skips-NULL-elements,
# max-ignores-NULLs, concat, reverse, sort. Two shapes need care:
# array_distinct preserves first-seen order in Spark while DuckDB's
# list_distinct returns ARBITRARY order — both sides sort after
# distinct so values compare; and slice is slice(arr, start, LENGTH)
# in Spark vs list_slice(arr, begin, END-inclusive) in DuckDB — the
# generator emits matched bounds. Element index 0 is EXCLUDED and
# pinned: Spark raises INVALID_INDEX_OF_ZERO (even via try_element_at)
# where DuckDB returns NULL. Arrays are row-built, all-BIGINT,
# NULL-free (the one agreed NULL behavior — join skipping — is pinned
# by the string class's source; null ELEMENT placement inside sort
# differs in spelling enough to stay out of a random grammar).

_ARR_S = ("array(CAST(l_linenumber AS BIGINT), CAST(l_suppkey % 10 AS "
          "BIGINT), CAST(l_partkey % 7 AS BIGINT))")
_ARR_D = ("[CAST(l_linenumber AS BIGINT), CAST(l_suppkey % 10 AS "
          "BIGINT), CAST(l_partkey % 7 AS BIGINT)]")
_ARR2_S = "array(CAST(l_partkey % 5 AS BIGINT), CAST(l_suppkey % 3 AS BIGINT))"
_ARR2_D = "[CAST(l_partkey % 5 AS BIGINT), CAST(l_suppkey % 3 AS BIGINT)]"


def _arr_case(rng: random.Random) -> tuple[str, str]:
    k = rng.randint(0, 9)
    i = rng.choice([-3, -2, -1, 1, 2, 3, 9])
    form = rng.choice(
        ["contains", "extract", "sortjoin", "distinctsort", "size",
         "revjoin", "position", "concatjoin", "sum", "mx", "slicejoin"]
    )
    if form == "contains":
        return (f"array_contains({_ARR_S}, {k})",
                f"list_contains({_ARR_D}, {k})")
    if form == "extract":
        return (f"try_element_at({_ARR_S}, {i})",
                f"list_extract({_ARR_D}, {i})")
    if form == "sortjoin":
        return (f"array_join(sort_array({_ARR_S}), ',')",
                f"array_to_string(list_sort({_ARR_D}, 'ASC'), ',')")
    if form == "distinctsort":
        return (
            f"array_join(sort_array(array_distinct({_ARR_S})), ',')",
            f"array_to_string(list_sort(list_distinct({_ARR_D}), 'ASC'), ',')",
        )
    if form == "size":
        return f"size({_ARR_S})", f"len({_ARR_D})"
    if form == "revjoin":
        return (f"array_join(reverse({_ARR_S}), ',')",
                f"array_to_string(list_reverse({_ARR_D}), ',')")
    if form == "position":
        return (f"CAST(array_position({_ARR_S}, {k}) AS BIGINT)",
                f"CAST(list_position({_ARR_D}, {k}) AS BIGINT)")
    if form == "concatjoin":
        return (f"array_join(concat({_ARR_S}, {_ARR2_S}), ',')",
                f"array_to_string(list_concat({_ARR_D}, {_ARR2_D}), ',')")
    if form == "sum":
        return (f"aggregate({_ARR_S}, 0L, (a, x) -> a + x)",
                f"CAST(list_sum({_ARR_D}) AS BIGINT)")
    if form == "mx":
        return f"array_max({_ARR_S})", f"list_max({_ARR_D})"
    s, n = rng.randint(1, 3), rng.randint(1, 2)
    return (f"array_join(slice({_ARR_S}, {s}, {n}), ',')",
            f"array_to_string(list_slice({_ARR_D}, {s}, {s + n - 1}), ',')")


def _gen_arr(n: int) -> list[tuple[str, str]]:
    rng = random.Random(20260918)
    return [_arr_case(rng) for _ in range(n)]


ARR_CASES = _gen_arr(18)  # this seed/count covers all 11 forms


@pytest.mark.parametrize("idx", range(len(ARR_CASES)))
def test_random_array_function_matches_oracle(spark, duck, li_view, idx):
    s_expr, d_expr = ARR_CASES[idx]
    s_sql = (
        f"SELECT l_orderkey, l_linenumber, {s_expr} AS v FROM {li_view}"
    )
    d_sql = f"SELECT l_orderkey, l_linenumber, {d_expr} AS v FROM lineitem"
    compare(spark.sql(s_sql), duck, d_sql)


def test_array_index_zero_divergence_is_real(spark, duck):
    """Element index 0: Spark raises INVALID_INDEX_OF_ZERO even through
    try_element_at; DuckDB's list_extract returns NULL. Pinned so the
    grammar's index-0 exclusion stays justified."""
    d = duck.execute("SELECT list_extract([1,2,3], 0)").fetchone()[0]
    assert d is None, d
    try:
        spark.sql("SELECT try_element_at(array(1,2,3), 0) AS v").collect()
    except Exception as exc:
        assert "INVALID_INDEX_OF_ZERO" in str(exc), exc
        return
    raise AssertionError("Spark now tolerates array index 0")


def test_array_class_covers_all_forms(spark):
    """Every dual-spelled form must appear at least once in the
    generated set (a missing form probes nothing)."""
    markers = ["array_contains", "try_element_at", "sort_array(array(",
               "array_distinct", "size(", "reverse(", "array_position",
               "concat(", "aggregate(", "array_max", "slice("]
    joined = " ".join(s for s, _d in ARR_CASES)
    missing = [m for m in markers if m not in joined]
    assert not missing, missing


# ---------------------------------------------------------------------------
# Regexp functions dual-SQL (round 8): Java regex vs RE2 on the shared
# subset
# ---------------------------------------------------------------------------
#
# Spark compiles Java regex, DuckDB compiles RE2 — the repo already
# pins their backreference gap (regex_backreference_pack). This class
# fuzzes the SHARED subset: bracket classes, greedy/lazy/bounded
# quantifiers, alternation, anchors, groups — probed to behave
# identically (including lazy 'a+?' and no-match -> '' for extract,
# NULL -> NULL). Patterns are built WITHOUT backslashes ([0-9] not \d):
# Spark string literals process backslash escapes, DuckDB's don't, so
# a backslash pattern can't be spelled identically — bracket classes
# sidestep the whole hazard. Two dialect differences are handled
# dual-SQL: the match predicate (RLIKE vs regexp_matches) and
# regexp_replace's default scope (Spark replaces ALL occurrences,
# DuckDB only the FIRST without the 'g' flag — pinned below).

_RX_PIECES = ["[0-9]+", "[0-9]{1,2}", "[a-z]+", "[A-Z]+?", "(R|N|A)",
              "-[0-9]", "[^-]+"]


def _rx_pattern(rng: random.Random) -> str:
    n = rng.randint(1, 2)
    pat = "".join(rng.choice(_RX_PIECES) for _ in range(n))
    if rng.random() < 0.25:
        pat = "^" + pat
    return pat


def _rx_case(rng: random.Random) -> tuple[str, str]:
    pat = _rx_pattern(rng)
    form = rng.choice(["extract", "match", "replace"])
    if form == "extract":
        e = f"regexp_extract(s, '({pat})', 1)"
        return e, e
    if form == "match":
        return (
            f"CASE WHEN s RLIKE '{pat}' THEN 1 ELSE 0 END",
            f"CASE WHEN regexp_matches(s, '{pat}') THEN 1 ELSE 0 END",
        )
    return (
        f"regexp_replace(s, '{pat}', '#')",
        f"regexp_replace(s, '{pat}', '#', 'g')",
    )


def _gen_rx(n: int) -> list[tuple[str, str]]:
    rng = random.Random(20260906)
    return [_rx_case(rng) for _ in range(n)]


RX_CASES = _gen_rx(14)


@pytest.mark.parametrize("idx", range(len(RX_CASES)))
def test_random_regexp_matches_oracle(spark, duck, li_view, idx):
    s_expr, d_expr = RX_CASES[idx]
    base_s = (
        f"(SELECT l_orderkey, l_linenumber, {_FUZZ_STR_SRC} AS s "
        f"FROM {li_view}) b"
    )
    base_d = (
        f"(SELECT l_orderkey, l_linenumber, {_FUZZ_STR_SRC} AS s "
        f"FROM lineitem) b"
    )
    s_sql = f"SELECT l_orderkey, l_linenumber, {s_expr} AS v FROM {base_s}"
    d_sql = f"SELECT l_orderkey, l_linenumber, {d_expr} AS v FROM {base_d}"
    compare(spark.sql(s_sql), duck, d_sql)


def test_regexp_replace_default_scope_divergence_is_real(spark, duck):
    """Spark regexp_replace replaces ALL matches by default; DuckDB
    replaces only the FIRST unless passed the 'g' flag — pinned so the
    dual-SQL 'g' spelling stays justified."""
    s = spark.sql(
        "SELECT regexp_replace('a1b2', '[0-9]', 'X') AS v"
    ).collect()[0].v
    d1 = duck.execute(
        "SELECT regexp_replace('a1b2', '[0-9]', 'X')"
    ).fetchone()[0]
    dg = duck.execute(
        "SELECT regexp_replace('a1b2', '[0-9]', 'X', 'g')"
    ).fetchone()[0]
    assert s == "aXbX" and d1 == "aXb2" and dg == "aXbX", (s, d1, dg)


def test_regexp_class_covers_all_forms_and_lazy(spark):
    """All three forms must appear, and at least one generated pattern
    must carry a lazy or bounded quantifier (the subtle subset)."""
    forms = {"extract": 0, "RLIKE": 0, "replace(": 0}
    subtle = 0
    for s_expr, _d in RX_CASES:
        if "regexp_extract" in s_expr:
            forms["extract"] += 1
        elif "RLIKE" in s_expr:
            forms["RLIKE"] += 1
        else:
            forms["replace("] += 1
        if "+?" in s_expr or "{1,2}" in s_expr:
            subtle += 1
    assert all(v > 0 for v in forms.values()), forms
    assert subtle > 0, RX_CASES


# ---------------------------------------------------------------------------
# Timestamp/interval arithmetic (round 8): sub-day grain over events
# ---------------------------------------------------------------------------
#
# The date-arithmetic class covers day/month grain over lineitem; this
# one covers the STREAMING grain — hour/minute truncation, INTERVAL
# shifts, epoch bucketing (the window-assignment arithmetic every
# watermarked aggregation depends on) — over the events table's real
# timestamps (nanosecond parquet normalized by load_table, session
# pinned UTC so epoch values are engine-independent). Same spelling
# both engines except epoch extraction (Spark unix_timestamp vs DuckDB
# epoch — dual-SQL). Sub-second precision stays out of the grammar:
# values are truncated to second-or-coarser before output so the
# micro/nano representation gap can't leak into the hash.

def _tsarith_case(rng: random.Random) -> tuple[str, str]:
    unit = rng.choice(["hour", "minute", "day"])
    k = rng.randint(1, 180)
    form = rng.choice(["trunc", "shift_trunc", "epoch_bucket", "part_key"])
    if form == "trunc":
        # DuckDB's date_trunc('day') returns DATE while Spark returns
        # TIMESTAMP — pin the output type explicitly on both sides.
        e = f"CAST(date_trunc('{unit}', ts) AS TIMESTAMP)"
        return e, e
    if form == "shift_trunc":
        iv = rng.choice([f"INTERVAL {k} MINUTE", f"INTERVAL {k % 48} HOUR"])
        e = f"CAST(date_trunc('{unit}', ts + {iv}) AS TIMESTAMP)"
        return e, e
    if form == "epoch_bucket":
        # Trap found while building this class: DuckDB's // only FLOORS
        # for integer operands — on DOUBLE (epoch() returns DOUBLE) it
        # is plain division, and the rounding double->BIGINT cast (the
        # pinned divergence) then mis-buckets values in the top ~half
        # of every window. Integer-cast the epoch BEFORE dividing.
        w = rng.choice([300, 900, 3600])
        return (
            f"CAST(unix_timestamp(date_trunc('second', ts)) "
            f"div {w} AS BIGINT)",
            f"CAST(CAST(epoch(date_trunc('second', ts)) AS BIGINT) "
            f"// {w} AS BIGINT)",
        )
    e = rng.choice(
        ["CAST(hour(ts) AS BIGINT)", "CAST(minute(ts) AS BIGINT)",
         "CAST(hour(ts - INTERVAL 30 MINUTE) AS BIGINT)"]
    )
    return e, e


def _gen_tsarith(n: int) -> list[tuple[str, str]]:
    rng = random.Random(20260907)
    return [_tsarith_case(rng) for _ in range(n)]


TSARITH_CASES = _gen_tsarith(12)


@pytest.fixture(scope="module")
def ev_view(spark):
    load_table(spark, SF_SMOKE, "events").createOrReplaceTempView(
        "__fuzz_events"
    )
    return "__fuzz_events"


@pytest.mark.parametrize("idx", range(len(TSARITH_CASES)))
def test_random_ts_arith_matches_oracle(spark, duck, ev_view, idx):
    s_expr, d_expr = TSARITH_CASES[idx]
    s_sql = (
        f"SELECT {s_expr} AS k, CAST(COUNT(*) AS BIGINT) AS n, "
        f"CAST(COUNT(DISTINCT user_id) AS BIGINT) AS u "
        f"FROM {ev_view} GROUP BY {s_expr}"
    )
    d_sql = (
        f"SELECT {d_expr} AS k, CAST(COUNT(*) AS BIGINT) AS n, "
        f"CAST(COUNT(DISTINCT user_id) AS BIGINT) AS u "
        f"FROM events GROUP BY {d_expr}"
    )
    compare(spark.sql(s_sql), duck, d_sql)


def test_ts_arith_class_groups_are_plural(spark, ev_view):
    """Truncation probes nothing if every case collapses to one group
    (or one group per row) — each generated key must land strictly
    between, except day-grain truncs of a short-span table may
    legitimately produce few groups (require >= 2)."""
    total = spark.table(ev_view).count()
    for s_expr, _d in TSARITH_CASES:
        n = spark.sql(
            f"SELECT COUNT(DISTINCT {s_expr}) AS n FROM {ev_view}"
        ).collect()[0].n
        assert 2 <= n < total, (s_expr, n, total)


# ---------------------------------------------------------------------------
# Map functions dual-SQL (round 8): construction, lookup, introspection
# ---------------------------------------------------------------------------
#
# Fully different construction spellings (Spark's interleaved
# map(k1,v1,k2,v2) vs DuckDB's two-list map([k...],[v...])) and lookup
# shapes (Spark element_at returns the SCALAR or NULL; DuckDB's
# map_extract returns a LIST — [] on miss — so the oracle spelling
# indexes [1] to scalar-ize, list-OOB giving the same NULL). size vs
# cardinality, array_join vs array_to_string over map_keys/map_values
# (both engines preserve construction order). Values are row-derived
# BIGINTs; lookup keys hit, miss, and depend on row data.

def _map_case(rng: random.Random) -> tuple[str, str]:
    v1 = f"CAST(l_linenumber AS BIGINT)"
    v2 = f"CAST(l_suppkey % {rng.randint(5, 50)} AS BIGINT)"
    v3 = f"CAST(l_partkey % {rng.randint(3, 9)} AS BIGINT)"
    s_map = f"map('a', {v1}, 'b', {v2}, 'c', {v3})"
    d_map = f"map(['a', 'b', 'c'], [{v1}, {v2}, {v3}])"
    # A row-dependent key that sometimes exists ('a'/'b'/'c') and
    # sometimes doesn't ('x'), exercising lookup on data, not literals.
    dyn_key = ("CASE WHEN l_suppkey % 4 = 0 THEN 'x' ELSE "
               "substr('abc', CAST(l_suppkey % 3 AS INT) + 1, 1) END")
    form = rng.choice(["hit", "miss", "dyn", "size", "keys", "vals"])
    if form == "hit":
        k = rng.choice(["'a'", "'b'", "'c'"])
        return (f"element_at({s_map}, {k})",
                f"map_extract({d_map}, {k})[1]")
    if form == "miss":
        return (f"element_at({s_map}, 'z')",
                f"map_extract({d_map}, 'z')[1]")
    if form == "dyn":
        return (f"element_at({s_map}, {dyn_key})",
                f"map_extract({d_map}, {dyn_key})[1]")
    if form == "size":
        return (f"CAST(size({s_map}) AS BIGINT)",
                f"CAST(cardinality({d_map}) AS BIGINT)")
    if form == "keys":
        return (f"array_join(map_keys({s_map}), ',')",
                f"array_to_string(map_keys({d_map}), ',')")
    return (f"array_join(map_values({s_map}), ',')",
            f"array_to_string(map_values({d_map}), ',')")


def _gen_map(n: int) -> list[tuple[str, str]]:
    rng = random.Random(20260908)
    return [_map_case(rng) for _ in range(n)]


MAP_CASES = _gen_map(12)


@pytest.mark.parametrize("idx", range(len(MAP_CASES)))
def test_random_map_function_matches_oracle(spark, duck, li_view, idx):
    s_expr, d_expr = MAP_CASES[idx]
    s_sql = (
        f"SELECT l_orderkey, l_linenumber, {s_expr} AS v FROM {li_view}"
    )
    d_sql = f"SELECT l_orderkey, l_linenumber, {d_expr} AS v FROM lineitem"
    compare(spark.sql(s_sql), duck, d_sql)


def test_map_class_covers_hit_miss_and_introspection(spark):
    """Lookups must include a guaranteed hit, a guaranteed miss, and a
    row-dependent key; at least one of size/keys/values must appear."""
    joined = " | ".join(s for s, _d in MAP_CASES)
    assert "element_at" in joined
    assert ", 'z')" in joined, "no guaranteed-miss lookup"
    assert "CASE WHEN l_suppkey % 4" in joined, "no row-dependent key"
    assert ("size(" in joined or "map_keys" in joined
            or "map_values" in joined)


# ---------------------------------------------------------------------------
# Decimal narrowing casts / overflow (round 9): TRY_CAST to narrower
# DECIMAL(p,s) — dual-SQL, with two NEW pinned engine divergences
# ---------------------------------------------------------------------------
#
# Probed divergences (each pinned with a convergence-watch test below):
#
# * Narrowing-cast ROUNDING MODE: casting a decimal to a smaller scale
#   ROUNDS HALF_UP (away from zero) in Spark but TRUNCATES toward zero
#   in DuckDB: TRY_CAST(2.345 AS DECIMAL(3,2)) = 2.35 vs 2.34,
#   -2.345 -> -2.35 vs -2.34.
# * OVERFLOW AT THE ROUNDING BOUNDARY, a direct consequence:
#   TRY_CAST(99.995 AS DECIMAL(4,2)) rounds to 100.00 and overflows to
#   NULL in Spark; DuckDB truncates to 99.99 and keeps the row.
# * Decimal DIVISION result scale: Spark divides exactly at its
#   inferred result scale then casts, DuckDB divides in DOUBLE —
#   CAST(7.00/3.00 AS DOUBLE) = 2.3333333333333 vs 2.3333333333333335.
#   Division is excluded from this grammar (as from the others).
#
# The dual-SQL normalization: the DuckDB twin rounds explicitly before
# the narrowing cast — TRY_CAST(ROUND(e, s) AS DECIMAL(p,s)) — because
# DuckDB ROUND on decimals IS half-away-from-zero, matching Spark's
# cast-time HALF_UP, including the overflow-after-round NULL. Overflow
# rows (integer digits exceeding p-s) must agree as NULL in both.

def _narrow_case(rng: random.Random) -> tuple[str, str, int, int]:
    a = rng.choice(["l_extendedprice", "l_quantity", "l_discount"])
    b = rng.choice(["l_tax", "l_quantity", "l_discount"])
    base = rng.choice(
        [
            f"CAST({a} AS DECIMAL(12,2))",
            f"CAST(CAST({a} AS DECIMAL(12,2)) + CAST({b} AS DECIMAL(12,2)) "
            "AS DECIMAL(14,2))",
            f"CAST(CAST(0 AS DECIMAL(12,2)) - CAST({a} AS DECIMAL(12,2)) "
            "AS DECIMAL(14,2))",
            f"CAST(CAST({a} AS DECIMAL(12,2)) * CAST({b} AS DECIMAL(8,2)) "
            "AS DECIMAL(22,4))",
        ]
    )
    # Narrow targets: s below the source scale forces the rounding-mode
    # path; small p-s forces overflow-to-NULL on large rows. p > s keeps
    # at least one integer digit (p == s is its own hazard family).
    s = rng.randint(0, 3)
    p = s + rng.randint(1, 5)
    return base, f"DECIMAL({p},{s})", p, s


def _gen_narrow(n: int) -> list[tuple[str, str, int, int]]:
    rng = random.Random(20260915)
    return [_narrow_case(rng) for _ in range(n)]


NARROW_CASES = _gen_narrow(14)


@pytest.mark.parametrize("idx", range(len(NARROW_CASES)))
def test_random_decimal_narrowing_matches_oracle(spark, duck, li_view, idx):
    base, target, _p, s = NARROW_CASES[idx]
    s_sql = (
        f"SELECT l_orderkey, l_linenumber, "
        f"CAST(TRY_CAST({base} AS {target}) AS DOUBLE) AS v "
        f"FROM {li_view}"
    )
    d_sql = (
        f"SELECT l_orderkey, l_linenumber, "
        f"CAST(TRY_CAST(ROUND({base}, {s}) AS {target}) AS DOUBLE) AS v "
        f"FROM lineitem"
    )
    compare(spark.sql(s_sql), duck, d_sql)


def test_narrowing_class_produces_nulls_and_roundings(spark, li_view):
    """Vacuity guard: across the cases, the narrowing must actually
    (a) overflow some rows to NULL and (b) change some values by
    rounding — otherwise the class only re-tests identity casts."""
    nulls = rounded = 0
    for base, target, _p, s in NARROW_CASES:
        row = spark.sql(
            f"SELECT COUNT(*) - COUNT(TRY_CAST({base} AS {target})) AS n, "
            f"SUM(CASE WHEN CAST(TRY_CAST({base} AS {target}) AS DOUBLE) "
            f"<> CAST({base} AS DOUBLE) THEN 1 ELSE 0 END) AS r "
            f"FROM {li_view}"
        ).collect()[0]
        nulls += row.n
        rounded += row.r or 0
    assert nulls > 0, "no overflow-to-NULL rows generated"
    assert rounded > 0, "no rounding-mode rows generated"


def test_pin_decimal_narrowing_cast_rounding_divergence(spark, duck):
    """PINNED divergence: Spark narrows decimal scale with HALF_UP
    (away from zero), DuckDB truncates toward zero. Fails if either
    engine changes — then the ROUND() normalization in the narrowing
    class above must be revisited."""
    s = spark.sql(
        "SELECT CAST(TRY_CAST(2.345 AS DECIMAL(3,2)) AS DOUBLE) AS a, "
        "CAST(TRY_CAST(-2.345 AS DECIMAL(3,2)) AS DOUBLE) AS b"
    ).collect()[0]
    assert (s.a, s.b) == (2.35, -2.35)
    d = duck.sql(
        "SELECT CAST(TRY_CAST(2.345 AS DECIMAL(3,2)) AS DOUBLE) AS a, "
        "CAST(TRY_CAST(-2.345 AS DECIMAL(3,2)) AS DOUBLE) AS b"
    ).fetchone()
    assert d == (2.34, -2.34)


def test_pin_decimal_overflow_at_rounding_boundary(spark, duck):
    """PINNED divergence (consequence of the rounding mode): 99.995
    into DECIMAL(4,2) rounds to 100.00 and overflows to NULL in Spark;
    DuckDB truncates to 99.99 and keeps the value."""
    s = spark.sql(
        "SELECT TRY_CAST(99.995 AS DECIMAL(4,2)) AS v"
    ).collect()[0].v
    assert s is None
    d = duck.sql("SELECT TRY_CAST(99.995 AS DECIMAL(4,2)) AS v").fetchone()[0]
    assert float(d) == 99.99


def test_pin_decimal_division_scale_divergence(spark, duck):
    """PINNED divergence justifying the grammar's division exclusion:
    Spark divides decimals exactly at its inferred result scale (13
    fractional digits for (10,2)/(10,2)) before the double cast;
    DuckDB divides in DOUBLE natively — the low bits differ."""
    expr = (
        "CAST(CAST(7.00 AS DECIMAL(10,2)) / CAST(3.00 AS DECIMAL(10,2)) "
        "AS DOUBLE)"
    )
    s = spark.sql(f"SELECT {expr} AS v").collect()[0].v
    d = duck.sql(f"SELECT {expr} AS v").fetchone()[0]
    assert s == 2.3333333333333
    assert d == 2.3333333333333335
    assert s != d


# ---------------------------------------------------------------------------
# NULL-key joins / null-safe equality (round 9): the join-semantics
# surface the existing join class never touches — keys with injected
# NULLs, FULL OUTER joins, and `=` vs `IS NOT DISTINCT FROM`
# ---------------------------------------------------------------------------
#
# SQL NULL join keys never match under plain `=` (so they surface as
# unmatched rows under LEFT/FULL), but DO match each other under the
# null-safe operator — and the three join kinds x two operators give six
# distinct unmatched-row regimes. Both sides pre-aggregate to one row
# per key so the FULL join stays small and every output is exactly
# determined. The generated key expressions inject NULLs at a random
# modulus on BOTH sides so the null-bucket genuinely exists (vacuity
# guard below).

def _nullkey_case(rng: random.Random) -> tuple[str, str, str, str]:
    k = rng.choice([7, 11, 13])
    null_l = rng.randint(0, 4)
    null_r = rng.randint(0, 4)
    key_l = (
        f"CASE WHEN l_orderkey % 5 = {null_l} THEN NULL "
        f"ELSE l_orderkey % {k} END"
    )
    key_r = (
        f"CASE WHEN o_orderkey % 5 = {null_r} THEN NULL "
        f"ELSE o_orderkey % {k} END"
    )
    kind = rng.choice(["JOIN", "LEFT JOIN", "FULL JOIN"])
    op = rng.choice(["=", "IS NOT DISTINCT FROM"])
    return key_l, key_r, kind, op


def _gen_nullkey(n: int) -> list[tuple[str, str, str, str]]:
    rng = random.Random(20260815)
    return [_nullkey_case(rng) for _ in range(n)]


NULLKEY_CASES = _gen_nullkey(14)


def _nullkey_sql(case, li_name: str, o_name: str) -> str:
    key_l, key_r, kind, op = case
    return (
        "SELECT l.k AS k_l, o.k AS k_o, l.cnt AS cnt_l, o.cnt AS cnt_o "
        f"FROM (SELECT {key_l} AS k, CAST(COUNT(*) AS BIGINT) AS cnt "
        f"      FROM {li_name} GROUP BY 1) l "
        f"{kind} "
        f"(SELECT {key_r} AS k, CAST(COUNT(*) AS BIGINT) AS cnt "
        f"      FROM {o_name} GROUP BY 1) o "
        f"ON l.k {op} o.k"
    )


@pytest.mark.parametrize("idx", range(len(NULLKEY_CASES)))
def test_random_nullkey_join_matches_oracle(spark, duck, li_view, o_view, idx):
    case = NULLKEY_CASES[idx]
    sdf = spark.sql(_nullkey_sql(case, li_view, o_view))
    compare(sdf, duck, _nullkey_sql(case, "lineitem", "orders"))


def test_nullkey_class_is_not_vacuous(spark, li_view, o_view):
    """The class must actually exercise (a) NULL keys on both sides,
    (b) at least one FULL JOIN and one null-safe operator, and (c) a
    case where `=` and `IS NOT DISTINCT FROM` would differ (a NULL
    bucket exists on both sides simultaneously for some case)."""
    kinds = {c[2] for c in NULLKEY_CASES}
    ops = {c[3] for c in NULLKEY_CASES}
    assert "FULL JOIN" in kinds and "JOIN" in kinds
    assert ops == {"=", "IS NOT DISTINCT FROM"}
    both_null = 0
    for key_l, key_r, _kind, _op in NULLKEY_CASES:
        row = spark.sql(
            f"SELECT (SELECT COUNT(*) FROM {li_view} "
            f"        WHERE ({key_l}) IS NULL) AS nl, "
            f"       (SELECT COUNT(*) FROM {o_view} "
            f"        WHERE ({key_r}) IS NULL) AS no"
        ).collect()[0]
        if row.nl > 0 and row.no > 0:
            both_null += 1
    assert both_null > 0, "no case has NULL keys on both sides"


# ---------------------------------------------------------------------------
# LATERAL derived tables (round 9): the correlated-subquery machinery
# through the OTHER front door — FROM-clause LATERAL, which Spark plans
# as a LateralJoin and DuckDB flattens at bind time
# ---------------------------------------------------------------------------
#
# The correlated class (CORR_CASES) probes WHERE/SELECT-position
# subqueries; LATERAL exercises a separate parse + plan path (Spark's
# DecorrelateInnerQuery on a join operator) with its own hazard set:
# empty-group scalars under CROSS vs LEFT lateral.
#
# PINNED divergence #13 (found by this class's first run): for a
# comma/CROSS LATERAL whose body is an ungrouped MIN/MAX/SUM aggregate,
# an EMPTY correlation group yields one NULL row in Spark (scalar
# aggregate semantics — the outer row survives with v = NULL) but ZERO
# rows in DuckDB (join semantics — the outer row is DROPPED; 215 vs
# 208 rows on case 3). COUNT bodies agree (one 0 row in both). The
# dual-SQL normalization: the oracle spells every comma-lateral as
# LEFT JOIN LATERAL ... ON TRUE, which matches Spark's keep-with-NULL
# exactly (and is a no-op for COUNT bodies).

def _lateral_case(rng: random.Random) -> tuple[str, str, str]:
    agg = rng.choice(
        [
            "CAST(COUNT(*) AS BIGINT)",
            "CAST(MAX(i.l_quantity * 100) AS BIGINT)",
            "CAST(MIN(i.l_linenumber) AS BIGINT)",
            "CAST(SUM(CAST(i.l_quantity AS BIGINT)) AS BIGINT)",
        ]
    )
    inner_pred = rng.choice(
        [
            "i.l_linenumber >= 2",
            "i.l_quantity > 25",
            "i.l_returnflag = 'R'",
            "i.l_shipdate >= DATE '1995-01-01'",
        ]
    )
    kind = rng.choice([",", "LEFT JOIN"])
    return agg, inner_pred, kind


def _gen_lateral(n: int) -> list[tuple[str, str, str]]:
    rng = random.Random(20260915)
    return [_lateral_case(rng) for _ in range(n)]


LATERAL_CASES = _gen_lateral(10)


def _lateral_sql(case, o_name: str, li_name: str, oracle: bool = False) -> str:
    agg, inner_pred, kind = case
    # Divergence-#13 normalization: DuckDB's comma-lateral drops outer
    # rows on empty aggregate groups; LEFT JOIN LATERAL ... ON TRUE is
    # the DuckDB spelling of Spark's keep-with-NULL comma-lateral.
    if oracle and kind == ",":
        kind = "LEFT JOIN"
    on = " ON TRUE" if kind == "LEFT JOIN" else ""
    return (
        f"SELECT o.o_orderkey, t.v FROM {o_name} o {kind} "
        f"LATERAL (SELECT {agg} AS v FROM {li_name} i "
        f"WHERE i.l_orderkey = o.o_orderkey AND {inner_pred}) t{on} "
        f"WHERE o.o_orderkey % 7 = 0"
    )


@pytest.mark.parametrize("idx", range(len(LATERAL_CASES)))
def test_random_lateral_matches_oracle(spark, duck, li_view, o_view, idx):
    case = LATERAL_CASES[idx]
    sdf = spark.sql(_lateral_sql(case, o_view, li_view))
    compare(sdf, duck, _lateral_sql(case, "orders", "lineitem", oracle=True))


def test_pin_cross_lateral_empty_group_divergence(spark, duck):
    """PINNED divergence #13: comma/CROSS LATERAL over an ungrouped
    MAX on an empty correlation group — Spark keeps the outer row with
    NULL (scalar-aggregate semantics), DuckDB drops it (join
    semantics). Fails if either engine changes, at which point the
    LEFT-JOIN normalization in _lateral_sql must be revisited."""
    s = spark.sql(
        "SELECT o.k, t.v FROM (SELECT 1 AS k UNION ALL SELECT 2) o, "
        "LATERAL (SELECT MAX(l.v) AS v FROM (SELECT 1 AS k, 10 AS v) l "
        "WHERE l.k = o.k) t"
    ).collect()
    assert sorted((r.k, r.v) for r in s) == [(1, 10), (2, None)]
    d = duck.sql(
        "SELECT o.k, t.v FROM (SELECT 1 AS k UNION ALL SELECT 2) o, "
        "LATERAL (SELECT MAX(l.v) AS v FROM (SELECT 1 AS k, 10 AS v) l "
        "WHERE l.k = o.k) t"
    ).fetchall()
    assert sorted(d) == [(1, 10)]


def test_lateral_class_is_not_vacuous(spark, li_view, o_view):
    """At least one case must produce a NULL scalar (empty correlation
    group under MIN/MAX/SUM) so the INNER-lateral keep-with-NULL
    semantics are genuinely probed."""
    nulls = 0
    for case in LATERAL_CASES:
        if "COUNT" in case[0]:
            continue
        df = spark.sql(_lateral_sql(case, o_view, li_view))
        nulls += df.filter("v IS NULL").count()
    assert nulls > 0, "no empty correlation groups generated"


# ---------------------------------------------------------------------------
# GROUPING() disambiguation + HAVING over multi-group aggregation
# (round 10 — VERDICT r9 item 5)
# ---------------------------------------------------------------------------
#
# The existing grouping-sets class (round 7) uses NON-NULL keys and no
# HAVING, so it never probes the two semantics that make the expand +
# multi-group physical shape tricky: (a) GROUPING() flags telling a
# DATA NULL key cell apart from a super-aggregate marker NULL — here
# keys are built with NULLIF so data NULLs genuinely occur — and
# (b) HAVING evaluated per EXPANDED group (super-aggregate rows must
# pass/fail the aggregate predicate independently of their leaf rows).
# GROUPING() return types differ (Spark TINYINT/INT vs DuckDB BIGINT):
# both sides pin CAST(... AS INTEGER). Shared SQL text otherwise.

_GSHAV_KEYS = [
    "NULLIF(l_returnflag, 'N')",          # data NULLs: ~1/3 of rows
    "NULLIF(l_linestatus, 'F')",          # data NULLs: ~1/2 of rows
    "(l_suppkey % 3)",                    # never NULL
]


def _gshav_case(rng: random.Random) -> tuple[str, str, str, str]:
    ks = rng.sample(_GSHAV_KEYS, rng.randint(2, 3))
    form = rng.choice(["ROLLUP", "CUBE", "SETS"])
    if form == "SETS":
        subsets = ["(" + ", ".join(ks) + ")", "()"]
        if rng.random() < 0.7:
            subsets.insert(1, "(" + ks[0] + ")")
        if rng.random() < 0.4 and len(ks) >= 2:
            subsets.insert(1, "(" + ks[1] + ")")
        grp = f"GROUPING SETS ({', '.join(subsets)})"
    else:
        grp = f"{form} ({', '.join(ks)})"
    sel = ", ".join(f"{k} AS k{i}" for i, k in enumerate(ks))
    gsel = ", ".join(
        f"CAST(GROUPING({k}) AS INTEGER) AS g{i}" for i, k in enumerate(ks)
    )
    qty = "CAST(l_quantity AS BIGINT)"
    hav = rng.choice(
        [f"COUNT(*) > {rng.randint(50, 3000)}",
         f"SUM({qty}) > {rng.randint(1000, 80000)}",
         f"COUNT(*) > {rng.randint(50, 500)} AND MIN({qty}) >= 1",
         f"MAX({qty}) >= {rng.randint(30, 50)}"]
    )
    return sel, gsel, grp, hav


def _gen_gshav(n: int) -> list[tuple[str, str, str, str]]:
    rng = random.Random(20260830)
    return [_gshav_case(rng) for _ in range(n)]


GSHAV_CASES = _gen_gshav(14)


def _gshav_sql(case, t: str) -> str:
    sel, gsel, grp, hav = case
    qty = "CAST(l_quantity AS BIGINT)"
    return (
        f"SELECT {sel}, {gsel}, CAST(COUNT(*) AS BIGINT) AS n, "
        f"CAST(SUM({qty}) AS BIGINT) AS sq "
        f"FROM {t} GROUP BY {grp} HAVING {hav}"
    )


@pytest.mark.parametrize("idx", range(len(GSHAV_CASES)))
def test_random_grouping_having_matches_oracle(spark, duck, li_view, idx):
    case = GSHAV_CASES[idx]
    sdf = spark.sql(_gshav_sql(case, li_view))
    compare(sdf, duck, _gshav_sql(case, "lineitem"))


def test_grouping_having_class_is_not_vacuous(spark, li_view):
    """The class must genuinely probe what it claims: across the cases
    (1) some surviving row is a super-aggregate (a grouping flag = 1),
    (2) some surviving row carries a DATA NULL key (cell NULL while its
    grouping flag = 0) — the ambiguity GROUPING() exists to resolve —
    and (3) HAVING actually filters (some case returns fewer rows than
    its unfiltered twin)."""
    saw_super = saw_data_null = saw_filtering = False
    for case in GSHAV_CASES:
        sel, gsel, grp, hav = case
        rows = spark.sql(_gshav_sql(case, li_view)).collect()
        nk = sel.count(" AS k")
        for r in rows:
            for i in range(nk):
                if r[f"g{i}"] == 1:
                    saw_super = True
                if r[f"g{i}"] == 0 and r[f"k{i}"] is None:
                    saw_data_null = True
        unfiltered = spark.sql(
            _gshav_sql((sel, gsel, grp, "TRUE"), li_view)
        ).count()
        if len(rows) < unfiltered:
            saw_filtering = True
    assert saw_super, "no super-aggregate row survived any HAVING"
    assert saw_data_null, "no data-NULL key row observed (NULLIF vacuous)"
    assert saw_filtering, "HAVING never filtered anything"


# ---------------------------------------------------------------------------
# Composed-shape differential fuzzing: WINDOW over JOIN / SET-OP input
# ---------------------------------------------------------------------------
#
# VERDICT r10 item 6: the 32 prior classes randomize each shape in
# ISOLATION; this class composes them — a window function whose input is
# a LEFT JOIN (unmatched rows inject genuine NULLs into the partition
# key) or a UNION [ALL] (each branch derives a different NULLIF key) —
# to probe optimizer rewrite interactions (window pushdown through
# joins/unions, partition-key NULL grouping, null-ordering in composed
# sorts). Determinism rules inherited from the window class, plus one
# new one: ANY nullable expression in an ORDER BY carries an EXPLICIT
# NULLS FIRST/LAST (Spark defaults NULLS FIRST for ASC, DuckDB NULLS
# LAST — the one dialect divergence composition would otherwise trip).

_CW_NK_JOIN = [
    # Nullable partition keys derived from the OUTER side of the join:
    # NULL where the lineitem row found no (filtered) order.
    "o.o_orderpriority",
    "NULLIF(o.o_orderstatus, 'F')",
    "o.o_custkey % 7",
    "CASE WHEN o.o_totalprice > 150000 THEN l.l_returnflag END",
]
_CW_OPRED = [
    "o_orderkey % 2 = 0",
    "o_orderstatus = 'O'",
    "o_totalprice > 120000",
    "o_orderkey % 3 <> 1",
]
_CW_NK_UNION = [
    ("NULLIF(l_returnflag, 'R')", "NULLIF(l_linestatus, 'O')"),
    ("NULLIF(l_linestatus, 'F')", "CASE WHEN l_discount > 0.05 THEN 'd' END"),
    ("CASE WHEN l_quantity > 25 THEN l_returnflag END",
     "NULLIF(l_returnflag, 'A')"),
]
_CW_SORTS = [
    "l_quantity",
    "l_extendedprice DESC",
    "l_shipdate",
]


def _cw_window(rng: random.Random, nullable_sort: str | None) -> str:
    """A window expression over partition key nk; ORDER BY leads with
    either a base sort or the nullable key itself (explicit NULLS
    placement), then the full-column tiebreak incl. nk."""
    nulls = rng.choice(["NULLS FIRST", "NULLS LAST"])
    if nullable_sort is not None and rng.random() < 0.4:
        lead = f"{nullable_sort} {nulls}"
    else:
        lead = f"{rng.choice(_CW_SORTS)}"
    tiebreak = (
        "l_orderkey, l_linenumber, l_quantity, l_extendedprice, "
        "l_discount, l_shipdate, nk " + rng.choice(["NULLS FIRST",
                                                    "NULLS LAST"])
    )
    over = f"PARTITION BY nk ORDER BY {lead}, {tiebreak}"
    qty = "CAST(l_quantity AS BIGINT)"
    lo = rng.randint(1, 4)
    frame = rng.choice(
        [
            f"ROWS BETWEEN {lo} PRECEDING AND CURRENT ROW",
            "ROWS BETWEEN UNBOUNDED PRECEDING AND CURRENT ROW",
        ]
    )
    fn = rng.random()
    if fn < 0.35:
        expr = (
            f"{rng.choice(['row_number()', 'rank()', 'dense_rank()'])}"
            f" OVER ({over})"
        )
    elif fn < 0.6:
        expr = f"SUM({qty}) OVER ({over} {frame})"
    elif fn < 0.8:
        expr = f"COUNT(*) OVER ({over} {frame})"
    else:
        expr = (
            f"{rng.choice(['lag', 'lead'])}({qty}, {rng.randint(1, 3)}, -1)"
            f" OVER ({over})"
        )
    return f"CAST({expr} AS BIGINT)"


def _gen_composed_windows(n: int) -> list[tuple[str, ...]]:
    rng = random.Random(20260818)
    out: list[tuple[str, ...]] = []
    for _ in range(n):
        if rng.random() < 0.5:
            nk = rng.choice(_CW_NK_JOIN)
            opred = rng.choice(_CW_OPRED)
            # o_orderstatus is nullable post-join: usable as a nullable
            # lead sort when the key itself isn't a string CASE.
            win = _cw_window(rng, "o_orderstatus")
            out.append(("join", nk, opred, win))
        else:
            nk1, nk2 = rng.choice(_CW_NK_UNION)
            op = rng.choice(["UNION", "UNION ALL"])
            p1, p2 = _pred(rng, 2), _pred(rng, 2)
            win = _cw_window(rng, None)
            out.append(("union", nk1, nk2, op, p1, p2, win))
    return out


COMPOSED_WIN_CASES = _gen_composed_windows(24)

_CW_LI_COLS = (
    "l_orderkey, l_linenumber, l_quantity, l_extendedprice, "
    "l_discount, l_shipdate, l_returnflag, l_linestatus"
)


def _composed_win_sql(case: tuple[str, ...], li: str, o: str) -> str:
    if case[0] == "join":
        _, nk, opred, win = case
        src = (
            f"SELECT {', '.join('l.' + c for c in _CW_LI_COLS.split(', '))},"
            f" o.o_orderstatus, {nk} AS nk "
            f"FROM {li} l LEFT JOIN (SELECT * FROM {o} WHERE {opred}) o "
            "ON o.o_orderkey = l.l_orderkey"
        )
        win_fixed = win
    else:
        _, nk1, nk2, op, p1, p2, win = case
        src = (
            f"SELECT {_CW_LI_COLS}, {nk1} AS nk FROM {li} WHERE {p1} "
            f"{op} "
            f"SELECT {_CW_LI_COLS}, {nk2} AS nk FROM {li} WHERE {p2}"
        )
        # The union source has no o_orderstatus column.
        win_fixed = win
    return (
        f"WITH src AS ({src}) "
        f"SELECT l_orderkey, l_linenumber, nk, {win_fixed} AS w FROM src"
    )


@pytest.mark.parametrize("idx", range(len(COMPOSED_WIN_CASES)))
def test_random_composed_window_matches_oracle(
    spark, duck, li_view, o_view, idx
):
    case = COMPOSED_WIN_CASES[idx]
    sdf = spark.sql(_composed_win_sql(case, li_view, o_view))
    compare(sdf, duck, _composed_win_sql(case, "lineitem", "orders"))


def test_composed_window_class_is_not_vacuous(spark, li_view, o_view):
    """The composition must genuinely probe what it claims: across the
    cases, (1) some join-sourced case has a NULL partition key (the
    LEFT JOIN's order filter really drops matches), (2) some
    union-sourced case has a NULL partition key (NULLIF/CASE really
    fires), and (3) nearly every case's key has >= 2 distinct
    partitions (the window is partitioned, not global) — a couple of
    empty/degenerate sources are tolerated (random predicates can
    select nothing; the differential check still covers that shape)."""
    saw_join_null = saw_union_null = False
    multi_part = 0
    for case in COMPOSED_WIN_CASES:
        sql = _composed_win_sql(case, li_view, o_view)
        src_sql = sql.split("WITH src AS (")[1].rsplit(") SELECT", 1)[0]
        probe = spark.sql(
            f"SELECT COUNT(CASE WHEN nk IS NULL THEN 1 END) AS n_null, "
            f"COUNT(DISTINCT nk) AS n_keys FROM ({src_sql})"
        ).collect()[0]
        # Distinct partitions include the NULL partition.
        n_parts = probe.n_keys + (1 if probe.n_null > 0 else 0)
        if n_parts >= 2:
            multi_part += 1
        if case[0] == "join" and probe.n_null > 0:
            saw_join_null = True
        if case[0] == "union" and probe.n_null > 0:
            saw_union_null = True
    assert multi_part >= len(COMPOSED_WIN_CASES) - 2, multi_part
    assert saw_join_null, "no join case produced a NULL partition key"
    assert saw_union_null, "no union case produced a NULL partition key"


# ---------------------------------------------------------------------------
# Composed-shape differential fuzzing #2: JOIN of two AGGREGATES
# ---------------------------------------------------------------------------
#
# The second composition axis (round 11): two independently-grouped
# subqueries joined on their (NULLABLE) group keys. Probes aggregate
# pushdown / join-reordering interplay plus the NULL-key equi-join rule
# (NULL groups exist on both sides after NULLIF keys, but = never
# matches them — the composed shape must agree with DuckDB on exactly
# which groups pair up) and join-type asymmetry (LEFT keeps the NULL
# group from one side only).

_JA_KEYS = [
    "NULLIF(l_returnflag, 'R')",
    "NULLIF(l_linestatus, 'O')",
    "CASE WHEN l_quantity > 30 THEN l_returnflag END",
    "NULLIF(CAST(l_suppkey % 5 AS BIGINT), 2)",
]


def _ja_aggs(rng: random.Random) -> str:
    qty = "CAST(l_quantity AS BIGINT)"
    cents = "CAST(round(l_extendedprice * 100, 0) AS BIGINT)"
    pool = [
        "CAST(COUNT(*) AS BIGINT)",
        f"CAST(SUM({qty}) AS BIGINT)",
        f"MIN({qty})",
        f"MAX({cents})",
        "CAST(COUNT(DISTINCT l_suppkey) AS BIGINT)",
    ]
    return rng.choice(pool)


def _gen_join_aggs(n: int) -> list[tuple[str, str, str, str, str, str]]:
    rng = random.Random(20260819)
    out = []
    for _ in range(n):
        k = rng.choice(_JA_KEYS)
        out.append(
            (
                k,
                _pred(rng, 2),
                _ja_aggs(rng),
                _pred(rng, 2),
                _ja_aggs(rng),
                rng.choice(["JOIN", "LEFT JOIN"]),
            )
        )
    return out


JOIN_AGG_CASES = _gen_join_aggs(18)


def _join_agg_sql(case: tuple[str, ...], t: str) -> str:
    k, p1, a1, p2, a2, jt = case
    # Both sides group by the SAME key expression over differently
    # filtered inputs; the join is on the nullable key, so NULL groups
    # never pair (SQL equality) — LEFT JOIN resurfaces the left NULL
    # group with NULL right-side aggregates.
    return (
        f"WITH s1 AS (SELECT {k} AS k, {a1} AS v1 FROM {t} "
        f"WHERE {p1} GROUP BY {k}), "
        f"s2 AS (SELECT {k} AS k, {a2} AS v2 FROM {t} "
        f"WHERE {p2} GROUP BY {k}) "
        f"SELECT s1.k AS k, s1.v1, s2.v2 FROM s1 {jt} s2 ON s1.k = s2.k"
    )


@pytest.mark.parametrize("idx", range(len(JOIN_AGG_CASES)))
def test_random_join_of_aggregates_matches_oracle(spark, duck, li_view, idx):
    case = JOIN_AGG_CASES[idx]
    sdf = spark.sql(_join_agg_sql(case, li_view))
    compare(sdf, duck, _join_agg_sql(case, "lineitem"))


def test_join_agg_class_is_not_vacuous(spark, li_view):
    """(1) some case's grouped sides genuinely contain a NULL group,
    (2) some LEFT JOIN case keeps an unmatched left group (NULL v2) —
    the two semantics this composition exists to probe."""
    saw_null_group = saw_unmatched = False
    for case in JOIN_AGG_CASES:
        k, p1, _a1, _p2, _a2, jt = case
        has_null = spark.sql(
            f"SELECT COUNT(*) AS n FROM (SELECT {k} AS k FROM {li_view} "
            f"WHERE {p1}) WHERE k IS NULL"
        ).collect()[0].n
        if has_null:
            saw_null_group = True
        if jt == "LEFT JOIN":
            rows = spark.sql(_join_agg_sql(case, li_view)).collect()
            if any(r.v2 is None and r.v1 is not None for r in rows):
                saw_unmatched = True
    assert saw_null_group, "no case produced a NULL group"
    assert saw_unmatched, "no LEFT JOIN case kept an unmatched left group"


# ---------------------------------------------------------------------------
# Recursive CTE fuzzing (round 12): Spark 4's UnionLoop vs DuckDB's
# recursive executor on randomized linear recursions — seeds from a
# grouped scan, a random affine step, a random bound. Probes iteration
# count, accumulator arithmetic, and anchor-duplicate semantics, the
# three places a recursion can silently diverge.
# ---------------------------------------------------------------------------

def _gen_recursive(n: int) -> list[tuple[int, int]]:
    rng = random.Random(20260825)
    return [(rng.randint(1, 7), rng.randint(10, 60)) for _ in range(n)]


RECURSIVE_CASES = _gen_recursive(8)


def _recursive_sql(step: int, bound: int, t: str) -> str:
    return f"""
    WITH RECURSIVE r(k, n, acc) AS (
      SELECT l_linenumber, CAST(l_linenumber AS BIGINT),
             CAST(0 AS BIGINT)
      FROM {t} GROUP BY l_linenumber
      UNION ALL
      SELECT k, n + {step}, acc + n FROM r WHERE n < {bound}
    )
    SELECT k,
           CAST(max(n) AS BIGINT)   AS n_final,
           CAST(max(acc) AS BIGINT) AS acc_total,
           CAST(count(*) AS BIGINT) AS n_rows
    FROM r GROUP BY k
    """


@pytest.mark.parametrize("idx", range(len(RECURSIVE_CASES)))
def test_random_recursive_cte_matches_oracle(spark, duck, li_view, idx):
    step, bound = RECURSIVE_CASES[idx]
    sdf = spark.sql(_recursive_sql(step, bound, li_view))
    compare(sdf, duck, _recursive_sql(step, bound, "lineitem"))


def test_recursive_class_is_not_vacuous(spark, li_view):
    """Every case must actually ITERATE (n_rows > 1 for some seed) —
    a bound below every seed value would make the class test nothing
    but the anchor."""
    for step, bound in RECURSIVE_CASES:
        rows = spark.sql(_recursive_sql(step, bound, li_view)).collect()
        assert any(r.n_rows > 1 for r in rows), (step, bound)


# ---------------------------------------------------------------------------
# Correlated LATERAL fuzzing (round 12): randomized per-group top-k
# through the LATERAL (ORDER BY ... LIMIT k) decorrelation — random
# affine-mod ordering expression, direction, and k. Probes the
# WindowGroupLimit rewrite against DuckDB's direct lateral execution.
# ---------------------------------------------------------------------------

def _gen_lateral_topk(n: int) -> list[tuple[int, int, int, str, int]]:
    rng = random.Random(20260826)
    out = []
    for _ in range(n):
        out.append((
            rng.randint(1, 13),        # a
            rng.randint(0, 97),        # b
            rng.choice([7, 11, 13, 17, 19]),  # m
            rng.choice(["ASC", "DESC"]),
            rng.randint(1, 4),         # k
        ))
    return out


LATERAL_TOPK_CASES = _gen_lateral_topk(6)


def _lateral_topk_sql(a: int, b: int, m: int, d: str, k: int,
                      nat: str, cust: str) -> str:
    return f"""
    SELECT n.n_nationkey, t.c_custkey
    FROM {nat} n,
    LATERAL (
      SELECT c_custkey FROM {cust} c
      WHERE c.c_nationkey = n.n_nationkey
      ORDER BY (c_custkey * {a} + {b}) % {m} {d}, c_custkey
      LIMIT {k}
    ) t
    """


@pytest.fixture(scope="module")
def cust_nat_views(spark):
    load_table(spark, SF_SMOKE, "customer").createOrReplaceTempView(
        "fuzz_customer"
    )
    load_table(spark, SF_SMOKE, "nation").createOrReplaceTempView(
        "fuzz_nation"
    )
    return "fuzz_nation", "fuzz_customer"


@pytest.mark.parametrize("idx", range(len(LATERAL_TOPK_CASES)))
def test_random_lateral_topk_matches_oracle(spark, duck, cust_nat_views, idx):
    a, b, m, d, k = LATERAL_TOPK_CASES[idx]
    nat, cust = cust_nat_views
    sdf = spark.sql(_lateral_topk_sql(a, b, m, d, k, nat, cust))
    compare(sdf, duck, _lateral_topk_sql(a, b, m, d, k, "nation", "customer"))


# ---------------------------------------------------------------------------
# Set-intersection similarity fuzzing (round 15): the guardrail
# entries' verify stage decides Jaccard/containment membership with
# size(array_intersect(...)) over distinct token arrays and integer
# cross-multiplication. This class probes exactly those primitives on
# randomized (tokenizer, threshold, sample) triples: Spark's
# array_distinct/array_intersect/size against DuckDB's
# list_distinct/list_intersect/len must agree on every qualifying
# pair AND on the intersection cardinalities themselves. Divergence
# candidates: dedup behavior of intersect with pre-distinct inputs,
# split-vs-regexp_split tokenization of repeated whitespace, and the
# rational-threshold integer arithmetic.
# ---------------------------------------------------------------------------

def _gen_setsim(n: int) -> list[tuple[int, int, int, int]]:
    rng = random.Random(20260901)
    out = []
    for _ in range(n):
        t_den = rng.choice([3, 4, 5, 7])
        t_num = rng.randint(1, t_den - 1)
        out.append((
            rng.randint(0, 6),   # sample residue: doc_id % 7 <= r
            t_num,
            t_den,
            rng.choice([0, 1]),  # 0 = symmetric Jaccard, 1 = containment on a
        ))
    return out


SETSIM_CASES = _gen_setsim(12)


def _setsim_sql(r: int, t_num: int, t_den: int, contain: int,
                t: str, duckdb: bool) -> str:
    if duckdb:
        toks = (
            "list_distinct(regexp_split_to_array(trim(lower(text)), "
            "'\\s+'))"
        )
        inter = "len(list_intersect(a.s, b.s))"
        sz = "len"
    else:
        toks = r"array_distinct(split(trim(lower(text)), '\\s+'))"
        inter = "size(array_intersect(a.s, b.s))"
        sz = "size"
    cond = (
        f"{t_den} * n_inter >= {t_num} * sz_a"
        if contain
        else f"{t_den} * n_inter >= {t_num} * (sz_a + sz_b - n_inter)"
    )
    return f"""
    WITH t AS (
      SELECT doc_id, {toks} AS s FROM {t}
      WHERE trim(text) <> '' AND doc_id % 7 <= {r}
    ), pairs AS (
      SELECT a.doc_id AS doc_a, b.doc_id AS doc_b,
             CAST({inter} AS BIGINT) AS n_inter,
             CAST({sz}(a.s) AS BIGINT) AS sz_a,
             CAST({sz}(b.s) AS BIGINT) AS sz_b
      FROM t a JOIN t b ON a.doc_id < b.doc_id
    )
    SELECT doc_a, doc_b, n_inter, sz_a, sz_b
    FROM pairs WHERE {cond}
    """


@pytest.fixture(scope="module")
def docs_view(spark):
    load_table(spark, SF_SMOKE, "documents").createOrReplaceTempView(
        "fuzz_documents"
    )
    return "fuzz_documents"


@pytest.mark.parametrize("idx", range(len(SETSIM_CASES)))
def test_random_set_similarity_matches_oracle(spark, duck, docs_view, idx):
    r, t_num, t_den, contain = SETSIM_CASES[idx]
    sdf = spark.sql(_setsim_sql(r, t_num, t_den, contain, docs_view, False))
    compare(sdf, duck, _setsim_sql(r, t_num, t_den, contain, "documents", True))


def test_setsim_class_is_not_vacuous(spark, docs_view):
    """(1) some case returns qualifying pairs, (2) some case EXCLUDES
    pairs (the threshold genuinely filters — an always-true condition
    would test the join, not the similarity arithmetic), and (3) both
    the Jaccard and containment forms appear in the case list."""
    kinds = {c[3] for c in SETSIM_CASES}
    assert kinds == {0, 1}
    saw_rows = saw_filtering = False
    for r, t_num, t_den, contain in SETSIM_CASES:
        kept = spark.sql(
            _setsim_sql(r, t_num, t_den, contain, docs_view, False)
        ).count()
        total = spark.sql(
            _setsim_sql(r, 0, 1, contain, docs_view, False)
        ).count()
        if kept > 0:
            saw_rows = True
        if kept < total:
            saw_filtering = True
    assert saw_rows, "no case produced a qualifying pair"
    assert saw_filtering, "no case's threshold excluded anything"


# ---------------------------------------------------------------------------
# GROUP BY ALL fuzzing (round 15): both engines resolve GROUP BY ALL
# by classifying each select-list item as key or aggregate. Randomized
# mixes of computed keys (NULL-producing expressions included) and
# aggregates probe that the two resolvers classify identically — a
# misclassification yields a wrong grouping, not an error, so only a
# differential check catches it.
# ---------------------------------------------------------------------------

def _gen_gball(n: int) -> list[tuple[str, str, str]]:
    rng = random.Random(20260902)
    keys = [
        "l_returnflag",
        "NULLIF(l_linestatus, 'O')",
        "CAST(l_suppkey % 4 AS BIGINT)",
        "CASE WHEN l_quantity > 25 THEN 'hi' ELSE 'lo' END",
    ]
    aggs = [
        "CAST(COUNT(*) AS BIGINT)",
        "CAST(SUM(CAST(l_quantity AS BIGINT)) AS BIGINT)",
        "MIN(CAST(l_linenumber AS BIGINT))",
        "CAST(COUNT(DISTINCT l_suppkey) AS BIGINT)",
    ]
    out = []
    for _ in range(n):
        k1, k2 = rng.sample(keys, 2)
        out.append((k1, k2, rng.choice(aggs)))
    return out


GBALL_CASES = _gen_gball(10)


def _gball_sql(k1: str, k2: str, agg: str, t: str) -> str:
    return (
        f"SELECT {k1} AS k1, {k2} AS k2, {agg} AS v "
        f"FROM {t} GROUP BY ALL"
    )


@pytest.mark.parametrize("idx", range(len(GBALL_CASES)))
def test_random_group_by_all_matches_oracle(spark, duck, li_view, idx):
    k1, k2, agg = GBALL_CASES[idx]
    sdf = spark.sql(_gball_sql(k1, k2, agg, li_view))
    compare(sdf, duck, _gball_sql(k1, k2, agg, "lineitem"))


def test_gball_class_is_not_vacuous(spark, li_view):
    """Some case must produce a NULL key group (the classification
    hazard GROUP BY ALL shares with explicit grouping) and more than
    one group overall."""
    saw_null = saw_groups = False
    for k1, k2, agg in GBALL_CASES:
        rows = spark.sql(_gball_sql(k1, k2, agg, li_view)).collect()
        if len(rows) > 1:
            saw_groups = True
        if any(r.k1 is None or r.k2 is None for r in rows):
            saw_null = True
    assert saw_groups and saw_null


# ---------------------------------------------------------------------------
# Connected-components fuzzing (round 16): the recursive-CTE min-label
# walk is the oracle primitive the canonicalize manifest leans on — and
# round 16's second-pass oracle runs it TWICE in one WITH chain. The
# registry proves it on the LSH graphs the corpus happens to produce;
# this class probes randomized graph topologies (chains, cliques,
# stars, disjoint unions, dense multi-component tangles) where Spark's
# size-dispatched connected_components operator and DuckDB's recursive
# walk must assign identical min-reachable-id labels to every node.
# ---------------------------------------------------------------------------

def _gen_cc_graphs(n: int) -> list[list[tuple[int, int]]]:
    rng = random.Random(20260816)
    graphs = []
    for _ in range(n):
        nodes = rng.randint(4, 24)
        style = rng.random()
        edges: set = set()
        if style < 0.3:
            # chain fragments: adversarial depth for label propagation
            ids = list(range(1, nodes + 1))
            rng.shuffle(ids)
            for a, b in zip(ids, ids[1:]):
                if rng.random() < 0.8:
                    edges.add((min(a, b), max(a, b)))
        elif style < 0.55:
            # k cliques (the duplicate-family shape)
            ids = list(range(1, nodes + 1))
            rng.shuffle(ids)
            k = rng.randint(2, 4)
            for i in range(0, nodes, k):
                grp = ids[i:i + k]
                for x in grp:
                    for y in grp:
                        if x < y:
                            edges.add((x, y))
        else:
            # random sparse tangle
            for _e in range(rng.randint(1, 2 * nodes)):
                a, b = rng.randint(1, nodes), rng.randint(1, nodes)
                if a != b:
                    edges.add((min(a, b), max(a, b)))
        if not edges:
            edges.add((1, 2))
        graphs.append(sorted(edges))
    return graphs


CC_GRAPHS = _gen_cc_graphs(12)


def _cc_oracle_sql(edges: list[tuple[int, int]]) -> str:
    vals = ", ".join(f"({a}, {b})" for a, b in edges)
    return f"""
    WITH RECURSIVE e(doc_a, doc_b) AS (VALUES {vals}),
    sym AS (
      SELECT doc_a AS n, doc_b AS m FROM e
      UNION
      SELECT doc_b AS n, doc_a AS m FROM e
    ),
    walk(n, r) AS (
      SELECT n, m FROM sym
      UNION
      SELECT w.n, s.m FROM walk w JOIN sym s ON s.n = w.r
    )
    SELECT CAST(n AS BIGINT) AS node,
           CAST(least(n, MIN(r)) AS BIGINT) AS component_id
    FROM walk GROUP BY n
    """


@pytest.mark.parametrize("idx", range(len(CC_GRAPHS)))
def test_random_graph_components_match_oracle(spark, duck, idx):
    from etl_tj_project_spark.operators import dedup as dd

    edges = CC_GRAPHS[idx]
    df = spark.createDataFrame(edges, "doc_a long, doc_b long")
    labels = dd.materialize_labels(
        dd.connected_components(df, "doc_a", "doc_b")
    ).select("node", "component_id")
    compare(labels, duck, _cc_oracle_sql(edges))


def test_cc_graph_class_is_not_vacuous(spark):
    """The generated topologies must include a multi-component graph,
    a chain of depth >= 4 (so min-label genuinely propagates), and a
    clique — otherwise the class is probing trivial shapes."""
    from etl_tj_project_spark.operators import dedup as dd

    saw_multi = saw_deep = saw_clique = False
    for edges in CC_GRAPHS:
        adj: dict = {}
        for a, b in edges:
            adj.setdefault(a, set()).add(b)
            adj.setdefault(b, set()).add(a)
        comps = []
        seen: set = set()
        for start in adj:
            if start in seen:
                continue
            stack, comp = [start], set()
            while stack:
                x = stack.pop()
                if x in comp:
                    continue
                comp.add(x)
                stack.extend(adj[x] - comp)
            seen |= comp
            comps.append(comp)
        if len(comps) >= 2:
            saw_multi = True
        if any(len(c) >= 5 and all(len(adj[v]) <= 2 for v in c)
               for c in comps):
            saw_deep = True
        if any(
            len(c) >= 3
            and all(len(adj[v] & c) == len(c) - 1 for v in c)
            for c in comps
        ):
            saw_clique = True
    assert saw_multi and saw_deep and saw_clique


# ---------------------------------------------------------------------------
# Delta-apply fuzzing (round 17, VERDICT r16 item 7): the LCC second
# pass has three stages — delta computation (oracle-hash-checked by the
# driver), CC over merge edges (the round-16 CC class above), and the
# APPLY step (graph.apply_lcc_second_pass) that folds the delta into
# the first-pass manifest. Apply was the one stage only example-based
# pytest covered. This class generates randomized (manifest, delta)
# pairs obeying the delta contract — merged_component_id = min member
# SURVIVOR id (a canonical-id-space value, deliberately disjoint from
# the component-id space so a column mix-up cannot cancel out),
# new_canonical = longest-doc/lowest-id member, n_docs_total = summed
# member mass — and pins apply(manifest, delta) against a one-shot
# merged-manifest oracle, including the empty-delta (identity) and
# single-giant-group (total collapse) boundaries.
# ---------------------------------------------------------------------------

def _gen_apply_cases(
    n: int,
) -> list[tuple[list[tuple], list[tuple]]]:
    rng = random.Random(20260817)
    cases = []
    for ci in range(n):
        k = rng.randint(3, 12)
        comp_ids = sorted(rng.sample(range(1, 400), k))
        manifest = []
        for cid in comp_ids:
            # Canonical ids live in a DISJOINT value space (>= 1000)
            # from component ids: the real manifest's component_id is
            # a min member DOC id while canonical is the longest doc,
            # and apply must never conflate the two columns.
            manifest.append(
                (cid, 1000 + cid * 3, rng.randint(10, 500),
                 rng.randint(1, 9))
            )
        man_by_id = {m[0]: m for m in manifest}
        fam = comp_ids[:]
        rng.shuffle(fam)
        groups: list[list[int]] = []
        if ci == 0:
            pass  # boundary: empty delta — apply is the identity
        elif ci == 1:
            groups = [fam]  # boundary: ALL families, one giant group
        else:
            i = 0
            while i + 1 < len(fam):
                if rng.random() < 0.6:
                    size = min(rng.randint(2, 4), len(fam) - i)
                    groups.append(fam[i:i + size])
                    i += size
                else:
                    i += 1
        delta = []
        for grp in groups:
            survivors = {c: man_by_id[c][1] for c in grp}
            merged_id = min(survivors.values())
            newc = sorted(
                grp, key=lambda c: (-man_by_id[c][2], man_by_id[c][1])
            )[0]
            nd = sum(man_by_id[c][3] for c in grp)
            for c in grp:
                delta.append(
                    (merged_id, c, survivors[c], man_by_id[newc][1],
                     len(grp), nd)
                )
        cases.append((manifest, delta))
    return cases


APPLY_CASES = _gen_apply_cases(12)

_MANIFEST_SCHEMA = (
    "component_id long, canonical_doc_id long, canonical_n_chars long, "
    "n_members long"
)
_DELTA_SCHEMA = (
    "merged_component_id long, component_id long, survivor_doc_id long, "
    "new_canonical_doc_id long, n_families long, n_docs_total long"
)


def _apply_oracle_sql(
    manifest: list[tuple], delta: list[tuple]
) -> str:
    mvals = ", ".join(f"({a}, {b}, {c}, {d})" for a, b, c, d in manifest)
    base = (
        "SELECT CAST(component_id AS BIGINT) AS component_id, "
        "CAST(canonical_doc_id AS BIGINT) AS canonical_doc_id, "
        "CAST(canonical_n_chars AS BIGINT) AS canonical_n_chars, "
        "CAST(n_members AS BIGINT) AS n_members"
    )
    if not delta:
        return (
            f"WITH manifest(component_id, canonical_doc_id, "
            f"canonical_n_chars, n_members) AS (VALUES {mvals}) "
            f"{base} FROM manifest"
        )
    dvals = ", ".join(
        f"({a}, {b}, {c}, {d}, {e}, {f})" for a, b, c, d, e, f in delta
    )
    return f"""
    WITH manifest(component_id, canonical_doc_id, canonical_n_chars,
                  n_members) AS (VALUES {mvals}),
    delta(merged_component_id, component_id, survivor_doc_id,
          new_canonical_doc_id, n_families, n_docs_total)
      AS (VALUES {dvals}),
    merged AS (
      SELECT DISTINCT d.merged_component_id AS component_id,
             d.new_canonical_doc_id AS canonical_doc_id,
             m.canonical_n_chars,
             d.n_docs_total AS n_members
      FROM delta d
      JOIN manifest m ON m.canonical_doc_id = d.new_canonical_doc_id
    ),
    untouched AS (
      SELECT component_id, canonical_doc_id, canonical_n_chars,
             n_members
      FROM manifest
      WHERE component_id NOT IN (SELECT component_id FROM delta)
    ),
    unioned AS (
      SELECT * FROM untouched UNION ALL SELECT * FROM merged
    )
    {base} FROM unioned
    """


@pytest.mark.parametrize("idx", range(len(APPLY_CASES)))
def test_random_delta_apply_matches_oracle(spark, duck, idx):
    from etl_tj_project_spark.operators.graph import apply_lcc_second_pass

    manifest, delta = APPLY_CASES[idx]
    mdf = spark.createDataFrame(manifest, _MANIFEST_SCHEMA)
    ddf = spark.createDataFrame(delta, _DELTA_SCHEMA)
    out = apply_lcc_second_pass(mdf, ddf)
    compare(out, duck, _apply_oracle_sql(manifest, delta))


def test_delta_apply_class_is_not_vacuous(spark):
    """The generated cases must include the empty delta (identity), a
    single group swallowing EVERY family (untouched branch empty), and
    at least three cases with >= 2 merge groups AND >= 1 untouched
    family (both branches populated) — plus at least one group whose
    new canonical is NOT its merged_component_id's survivor (the keep
    rule and the CC label genuinely disagree somewhere)."""
    saw_empty = saw_total = 0
    saw_mixed = 0
    saw_split_roles = 0
    for manifest, delta in APPLY_CASES:
        comp_ids = {m[0] for m in manifest}
        touched = {d[1] for d in delta}
        groups = {}
        for d in delta:
            groups.setdefault(d[0], []).append(d)
        if not delta:
            saw_empty += 1
        elif touched == comp_ids and len(groups) == 1:
            saw_total += 1
        if len(groups) >= 2 and touched < comp_ids:
            saw_mixed += 1
        for rows in groups.values():
            merged_id = rows[0][0]
            newc = rows[0][3]
            if newc != merged_id:
                saw_split_roles += 1
                break
    assert saw_empty >= 1
    assert saw_total >= 1
    assert saw_mixed >= 3, saw_mixed
    assert saw_split_roles >= 1
