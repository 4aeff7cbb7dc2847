"""Property-based parity: the native-expression rebuilds of the
reference's UDFs (functions/cleaning.py) vs an independent pure-Python
model of the documented semantics (SURVEY §2.8), over Hypothesis-generated
inputs.

Each example is a whole batch of strings evaluated in ONE Spark job (a
per-example job would make the suite minutes-slow). Alphabet is printable
ASCII: the UDF semantics are ASCII-regex based, and locale-dependent
upper-casing of exotic Unicode is outside the contract.
"""

from __future__ import annotations

import re

from hypothesis import HealthCheck, given, settings
from hypothesis import strategies as st

from pyspark.sql import functions as F
from pyspark.sql import types as T

from etl_tj_project_spark.functions.cleaning import norm_body, to_bool_safe

ASCII = st.text(
    alphabet=st.characters(min_codepoint=32, max_codepoint=126), max_size=24
)
MAYBE_STR = st.one_of(st.none(), ASCII)

_TRUTHY = {"TRUE", "T", "1", "Y", "YES"}
_FALSY = {"FALSE", "F", "0", "N", "NO"}
# Spark's string→boolean cast: trimmed, case-insensitive literal set.
_CAST_TRUE = {"true", "t", "y", "yes", "1"}
_CAST_FALSE = {"false", "f", "n", "no", "0"}


def norm_body_model(s: str | None) -> str | None:
    if s is None:
        return None
    only = re.sub(r"[^A-Za-z0-9]", "", s)
    if only == "":
        return None
    m_letters = re.search(r"([A-Za-z]{3})", only)
    m_digits = re.search(r"([0-9]{1,3})", only)
    if not m_letters or not m_digits:
        return None  # NULL-propagating concat
    return m_letters.group(1).upper() + "-" + m_digits.group(1).zfill(3)


def to_bool_safe_model(s: str | None) -> bool | None:
    t = (s or "").upper()
    if t in _TRUTHY:
        return True
    if t in _FALSY:
        return False
    if t == "":
        return None
    v = s.strip().lower()
    if v in _CAST_TRUE:
        return True
    if v in _CAST_FALSE:
        return False
    return None  # try_cast swallows junk


def _run_batch(spark, values, expr_builder):
    df = spark.createDataFrame(
        [(i, v) for i, v in enumerate(values)],
        T.StructType(
            [
                T.StructField("i", T.IntegerType(), False),
                T.StructField("s", T.StringType(), True),
            ]
        ),
    )
    rows = df.select("i", expr_builder(F.col("s")).alias("out")).collect()
    return [r.out for r in sorted(rows, key=lambda r: r.i)]


@settings(
    max_examples=12,
    deadline=None,
    suppress_health_check=[HealthCheck.function_scoped_fixture],
)
@given(values=st.lists(MAYBE_STR, min_size=1, max_size=64))
def test_norm_body_matches_model(spark, values):
    got = _run_batch(spark, values, norm_body)
    want = [norm_body_model(v) for v in values]
    assert got == want, list(zip(values, got, want))


@settings(
    max_examples=12,
    deadline=None,
    suppress_health_check=[HealthCheck.function_scoped_fixture],
)
@given(values=st.lists(MAYBE_STR, min_size=1, max_size=64))
def test_to_bool_safe_matches_model(spark, values):
    got = _run_batch(spark, values, to_bool_safe)
    want = [to_bool_safe_model(v) for v in values]
    assert got == want, list(zip(values, got, want))


# Directed seeds for the corners Hypothesis may not hit every run.
SEEDS = [
    None, "", "   ", "KLG4590", "BRT53_A", "BRT367", "abc", "abc12",
    "12abc3", "ab1", "a1b2c3", "....", "AbC-9", "yes", " TRUE ", "nO",
    "2", "junk", "0.0", "ß",
]


def test_seed_corpus(spark):
    got_n = _run_batch(spark, SEEDS, norm_body)
    want_n = [norm_body_model(v) for v in SEEDS]
    assert got_n == want_n, list(zip(SEEDS, got_n, want_n))
    got_b = _run_batch(spark, SEEDS, to_bool_safe)
    want_b = [to_bool_safe_model(v) for v in SEEDS]
    assert got_b == want_b, list(zip(SEEDS, got_b, want_b))
