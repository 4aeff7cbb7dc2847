"""End-to-end training-corpus preparation: the composition a pretraining
data pipeline runs over raw documents before tokenization.

Stages (each individually oracle-checked via the harness; this module is
the composition):

1. quality filter   — expression-only thresholds on length / token count
                      / punctuation / alpha / stopword ratios
2. language filter  — marker-token language ID against an allowlist
3. exact dedup      — normalized-text fingerprint, keep lowest id
4. near dedup       — MinHash-LSH candidates → Jaccard verify → greedy
                      drop (operators/dedup.drop_near_duplicates)

Scale shape: stages 1-2 are pure projections/filters (no shuffle, fully
pushed into the scan pass); stage 3 is one fingerprint shuffle; stage 4
is the LSH pipeline (signature projection + band self-join bounded by
candidate count). The stage order is deliberate — cheap row-local filters
shrink the corpus before any shuffle happens.
"""

from __future__ import annotations

from dataclasses import dataclass

from pyspark.sql import DataFrame
from pyspark.sql import functions as F

from etl_tj_project_spark.functions import text as tx
from etl_tj_project_spark.operators.dedup import (
    drop_exact_duplicates,
    drop_near_duplicates,
)


@dataclass(frozen=True)
class QualityThresholds:
    """Filter bounds; defaults tuned for short synthetic docs — real
    corpora raise min_tokens substantially."""

    min_chars: int = 20
    min_tokens: int = 5
    max_punct_ratio: float = 0.2
    min_alpha_ratio: float = 0.6
    max_stopword_ratio: float = 0.7


def quality_filter(
    df: DataFrame, text_col: str = "text", th: QualityThresholds | None = None
) -> DataFrame:
    """Keep documents passing every quality bound (expression-only)."""
    th = th or QualityThresholds()
    m = tx.quality_metrics(text_col)
    return df.filter(
        (m["n_chars"] >= th.min_chars)
        & (m["n_tokens"] >= th.min_tokens)
        & (m["punct_ratio"] <= th.max_punct_ratio)
        & (m["alpha_ratio"] >= th.min_alpha_ratio)
        & (m["stopword_ratio"] <= th.max_stopword_ratio)
    )


def language_filter(
    df: DataFrame, text_col: str = "text", allow: tuple[str, ...] = ("en",)
) -> DataFrame:
    """Keep documents whose predicted language is in the allowlist."""
    return df.filter(tx.lang_id(text_col).isin(*allow))


def prepare_corpus(
    df: DataFrame,
    id_col: str = "doc_id",
    text_col: str = "text",
    th: QualityThresholds | None = None,
    languages: tuple[str, ...] = ("en",),
    near_dup_threshold: float = 0.8,
) -> DataFrame:
    """quality → language → exact dedup → near dedup, in that order."""
    out = quality_filter(df, text_col, th)
    out = language_filter(out, text_col, languages)
    out = drop_exact_duplicates(out, text_col, id_col)
    return drop_near_duplicates(
        out, id_col, text_col, threshold=near_dup_threshold
    )
