"""Python UDTF (user-defined table function) surface — Spark 4's
row-to-rows Python API, covered the same way the StatefulProcessor API
is: a real working operator + equivalence test, NOT used in the hot
query path.

Policy (SCALE.md §4): Python is the slow path. Every registered query
keeps tokenization/spans as native expressions (split/posexplode —
whole-stage-codegen'd); this UDTF exists because the API is part of
the engine surface a user migrating Python row-logic will reach for,
and the test pins that the UDTF's output is EQUAL to the expression
form — so promoting UDTF prototypes to expressions is a proven-safe
refactor, not a semantics gamble.
"""

from __future__ import annotations

from pyspark.sql.functions import udtf


@udtf(returnType="pos: int, start: int, term: string")
class TokenSpans:
    """One output row per whitespace token: (token index, character
    start offset, lowercased token) — the span bookkeeping a
    highlight/alignment pipeline needs, which the plain split()
    expression discards.

    Stateless per row (safe under Spark's UDTF retry semantics);
    emits nothing for NULL/empty text.
    """

    def eval(self, text: str):  # noqa: D102
        if not text:
            return
        pos = 0
        i = 0
        n = len(text)
        while i < n:
            while i < n and text[i].isspace():
                i += 1
            if i >= n:
                break
            start = i
            while i < n and not text[i].isspace():
                i += 1
            yield pos, start, text[start:i].lower()
            pos += 1
