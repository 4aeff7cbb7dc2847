"""Distributed BPE (byte-pair-encoding) tokenizer training.

The tokenizer-vocabulary build step of a training-data pipeline,
expressed Spark-first. The classic formulation (Sennrich et al. 2016)
iterates: count adjacent symbol pairs weighted by word frequency, merge
the most frequent pair everywhere, repeat. The scale-critical insight is
that everything runs over the WORD VOCABULARY (unique words + counts),
not the corpus: a 100 TB corpus has a vocabulary orders of magnitude
smaller, produced by one exact-dedup shuffle, after which every
iteration is vocabulary-sized.

All per-iteration work is native Column expressions (zip_with for
adjacent pairs, a left-fold ``aggregate`` for the merge) — no Python in
the loop. The only driver materialization is the argmax pair: ONE row
per iteration, the same constant-size collect discipline as the Lloyd
k-means trainer. Ties break deterministically (count desc, then pair
lexicographic) so two engines — or two runs — produce identical merge
sequences.
"""

from __future__ import annotations

from pyspark.sql import DataFrame, Window
from pyspark.sql import functions as F


def word_vocab(docs: DataFrame, text_col: str = "text") -> DataFrame:
    """Corpus → (word, freq): lowercase [a-z]+ tokens, exact counts.
    The one corpus-sized shuffle; everything after runs on the vocab."""
    words = docs.select(
        F.explode(
            F.expr(f"regexp_extract_all(lower({text_col}), '[a-z]+', 0)")
        ).alias("word")
    )
    return words.groupBy("word").agg(F.count(F.lit(1)).alias("freq"))


def with_symbols(vocab: DataFrame) -> DataFrame:
    """Attach the initial symbol sequence: one single-character symbol
    per letter (``split`` on the empty pattern)."""
    return vocab.withColumn("symbols", F.split("word", ""))


def _adjacent_pairs(symbols: F.Column) -> F.Column:
    n = F.size(symbols)
    return F.zip_with(
        F.slice(symbols, 1, n - 1),
        F.slice(symbols, 2, n - 1),
        lambda a, b: F.struct(a.alias("a"), b.alias("b")),
    )


def pair_counts(vocab_sym: DataFrame) -> DataFrame:
    """(a, b, total) for every adjacent symbol pair, weighted by word
    frequency — the statistic each BPE iteration takes its argmax over."""
    return (
        vocab_sym.select(
            "freq", F.explode(_adjacent_pairs(F.col("symbols"))).alias("p")
        )
        .groupBy(F.col("p.a").alias("a"), F.col("p.b").alias("b"))
        .agg(F.sum("freq").alias("total"))
    )


def merge_pair(vocab_sym: DataFrame, a: str, b: str) -> DataFrame:
    """Apply one merge (a, b) → ab to every symbol sequence.

    A left fold over the sequence: append each symbol, except when the
    accumulator ends with ``a`` and the incoming symbol is ``b`` — then
    replace that tail with the merged symbol. This is exactly BPE's
    greedy left-to-right non-overlapping replacement ("aaa" under (a,a)
    becomes [aa, a]), as a pure JVM-side expression.
    """
    la, lb = F.lit(a), F.lit(b)
    merged = F.lit(a + b)

    def step(acc: F.Column, s: F.Column) -> F.Column:
        tail_is_a = (F.size(acc) > 0) & (F.element_at(acc, -1) == la)
        return F.when(
            tail_is_a & (s == lb),
            F.concat(F.slice(acc, 1, F.size(acc) - 1), F.array(merged)),
        ).otherwise(F.concat(acc, F.array(s)))

    folded = F.aggregate(
        F.col("symbols"), F.array().cast("array<string>"), step
    )
    return vocab_sym.withColumn("symbols", folded)


def top_pair(vocab_sym: DataFrame) -> tuple[str, str, int] | None:
    """The argmax pair with the deterministic (total desc, a, b) order;
    None when no word has two symbols left. A one-row driver collect."""
    rows = (
        pair_counts(vocab_sym)
        .orderBy(F.col("total").desc(), F.col("a"), F.col("b"))
        .limit(1)
        .collect()
    )
    if not rows:
        return None
    r = rows[0]
    return r["a"], r["b"], r["total"]


def train_bpe(
    docs: DataFrame, text_col: str = "text", n_merges: int = 10
) -> list[tuple[str, str, int]]:
    """Learn ``n_merges`` BPE merges. Returns [(a, b, pair_count)] in
    merge order. ``localCheckpoint`` truncates the per-iteration fold
    expressions from the lineage, exactly like the label-propagation
    loop — without it the analyzed plan deepens every iteration.
    """
    vocab = with_symbols(word_vocab(docs, text_col)).localCheckpoint()
    merges: list[tuple[str, str, int]] = []
    for _ in range(n_merges):
        best = top_pair(vocab)
        if best is None or best[2] < 2:
            break
        a, b, total = best
        merges.append((a, b, total))
        vocab = merge_pair(vocab, a, b).localCheckpoint()
    return merges


def encode_corpus_vocab(
    docs: DataFrame,
    merges: list[tuple[str, ...]],
    text_col: str = "text",
) -> DataFrame:
    """Distributed corpus ENCODING — the second half of tokenizer work:
    apply a learned merge table to every document's words. Returns
    (word, freq, symbols) where ``symbols`` is the word's BPE token
    sequence under ``merges`` (applied in order, greedy left-to-right —
    exactly :func:`encode_with_merges`).

    Scale shape: the merge folds run over the distinct-word VOCABULARY
    (one exact-dedup shuffle builds it), never per corpus occurrence —
    at 100 TB the vocabulary is orders of magnitude smaller than the
    corpus, and per-document token streams are recoverable by joining
    the encoded vocab back on the word key. All ``len(merges)`` folds
    compose into ONE declarative expression tree (no per-merge
    materialization, no Python in the data path).
    """
    vocab = with_symbols(word_vocab(docs, text_col))
    for a, b, *_ in merges:
        vocab = merge_pair(vocab, a, b)
    return vocab


def encode_with_merges(word: str, merges: list[tuple[str, str, int]]) -> list[str]:
    """Reference (driver-side) encoder: apply the learned merge list to
    one word — used by tests to cross-check the distributed trainer."""
    symbols = list(word)
    for a, b, _ in merges:
        out: list[str] = []
        for s in symbols:
            if out and out[-1] == a and s == b:
                out[-1] = a + b
            else:
                out.append(s)
        symbols = out
    return symbols
