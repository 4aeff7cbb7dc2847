"""Distributed BPE trainer (operators/bpe.py) vs a pure-Python reference.

The distributed loop must reproduce the classic single-machine algorithm
merge-for-merge: same pair counts, same argmax under the (count desc,
pair lexicographic) tie-break, same greedy left-to-right merge
application. Any divergence (fold semantics, tie order, overlap
handling) shows up as a differing merge sequence.
"""

from __future__ import annotations

import collections
import re

from etl_tj_project_spark.operators import bpe
from tests.conftest import SF_SMOKE
from etl_tj_project_spark.sources.testdata import load_table


def ref_train(texts: list[str], n_merges: int) -> list[tuple[str, str, int]]:
    vocab: collections.Counter[str] = collections.Counter()
    for t in texts:
        vocab.update(re.findall(r"[a-z]+", t.lower()))
    seqs: dict[str, list[str]] = {w: list(w) for w in vocab}
    merges: list[tuple[str, str, int]] = []
    for _ in range(n_merges):
        pc: collections.Counter[tuple[str, str]] = collections.Counter()
        for w, syms in seqs.items():
            f = vocab[w]
            for a, b in zip(syms, syms[1:]):
                pc[(a, b)] += f
        if not pc:
            break
        (a, b), total = min(pc.items(), key=lambda kv: (-kv[1], kv[0]))
        if total < 2:
            break
        merges.append((a, b, total))
        for w, syms in seqs.items():
            out: list[str] = []
            for s in syms:
                if out and out[-1] == a and s == b:
                    out[-1] = a + b
                else:
                    out.append(s)
            seqs[w] = out
    return merges


def test_fold_merge_is_greedy_nonoverlapping(spark):
    df = spark.createDataFrame([("aaa",), ("abab",), ("ba",)], "word string")
    sym = bpe.with_symbols(df.withColumn("freq", bpe.F.lit(1)))
    merged = {
        r["word"]: r["symbols"]
        for r in bpe.merge_pair(sym, "a", "a").collect()
    }
    assert merged["aaa"] == ["aa", "a"]  # greedy left-to-right, no chain
    assert merged["abab"] == ["a", "b", "a", "b"]
    merged2 = {
        r["word"]: r["symbols"]
        for r in bpe.merge_pair(sym, "a", "b").collect()
    }
    assert merged2["abab"] == ["ab", "ab"]
    assert merged2["ba"] == ["b", "a"]


def test_trainer_matches_reference_on_corpus(spark):
    docs = load_table(spark, SF_SMOKE, "documents")
    texts = [r["text"] for r in docs.select("text").collect()]
    expected = ref_train(texts, 12)
    got = bpe.train_bpe(docs, n_merges=12)
    assert got == expected
    assert len(got) == 12  # the corpus is rich enough to fill every step


def test_encoder_applies_merges_in_order():
    merges = [("l", "o", 9), ("lo", "w", 5)]
    assert bpe.encode_with_merges("lower", merges) == ["low", "e", "r"]
    assert bpe.encode_with_merges("hello", merges) == ["h", "e", "l", "lo"]
