"""Round-12 pack invariants: containment prefix-filter completeness,
the CUSUM window identity, chunking coverage/overlap properties,
recursive-CTE closed-form agreement, LATERAL/window equivalence, and
Matryoshka recall bounds.

Oracle-hash parity for all six entries runs in the replay/driver gate;
these tests pin the ALGORITHMIC claims the oracles can't express (e.g.
"the prefix filter misses nothing" is only meaningful against an
independent brute-force recomputation, and "CUSUM == the sequential
recursion" needs an actual sequential loop to compare against).
"""

from __future__ import annotations

import hashlib
import math

import pytest
from pyspark.sql import functions as F

from etl_tj_project_spark import harness
from etl_tj_project_spark.operators import dedup as dd
from tests.conftest import SF_SMOKE


# -------------------------------------------------------------------------
# Containment: zero false negatives / positives vs brute force
# -------------------------------------------------------------------------

def _brute_containment(rows, ngram, t_num, t_den):
    """Independent all-pairs containment over distinct word-ngram sets."""
    shingles = {}
    for doc_id, text in rows:
        toks = text.strip().lower().split() if text and text.strip() else []
        if not toks:
            shingles[doc_id] = set()
            continue
        n = max(len(toks) - (ngram - 1), 1)
        shingles[doc_id] = {
            " ".join(toks[i : i + ngram]) for i in range(n)
        }
    out = {}
    ids = sorted(shingles)
    for a in ids:
        sa = shingles[a]
        if not sa:
            continue
        for b in ids:
            if a == b or not shingles[b]:
                continue
            inter = len(sa & shingles[b])
            if t_den * inter >= t_num * len(sa):
                out[(a, b)] = (inter, len(sa), inter * 1000 // len(sa))
    return out


@pytest.mark.parametrize("t_num,t_den", [(1, 2), (4, 5), (9, 10), (1, 1)])
def test_containment_matches_brute_force(spark, t_num, t_den):
    docs = spark.read.parquet(f"{SF_SMOKE}/documents.parquet")
    rows = [(r.doc_id, r.text) for r in docs.select("doc_id", "text").collect()]
    expect = _brute_containment(rows, 3, t_num, t_den)
    got = {
        (r.doc_a, r.doc_b): (r.n_inter, r.sz_a, r.containment_milli)
        for r in dd.prefix_filter_containment_pairs(
            docs, "doc_id", "text", ngram=3, t_num=t_num, t_den=t_den
        ).collect()
    }
    assert got == expect  # exact: no false negatives AND no false positives


def test_containment_is_directional(spark):
    """A short doc quoted inside a long one: containment fires small→big
    but not big→small — the asymmetry that motivates the operator."""
    docs = spark.createDataFrame(
        [
            (1, "alpha beta gamma delta epsilon zeta"),
            (2, "alpha beta gamma delta epsilon zeta eta theta iota kappa "
                "lamda mu nu xi omicron pi rho sigma tau upsilon"),
        ],
        "doc_id long, text string",
    )
    pairs = {
        (r.doc_a, r.doc_b): r.containment_milli
        for r in dd.prefix_filter_containment_pairs(
            docs, "doc_id", "text", ngram=3, t_num=4, t_den=5
        ).collect()
    }
    assert (1, 2) in pairs and pairs[(1, 2)] == 1000
    assert (2, 1) not in pairs


# -------------------------------------------------------------------------
# CUSUM: the window identity vs the sequential recursion
# -------------------------------------------------------------------------

def test_cusum_equals_sequential_recursion(spark):
    ent = harness.REGISTRY["cusum_changepoint_daily"]
    got = {
        (r.event_type, str(r.day)): (r.cnt, r.cusum_milli, r.changepoint_flag)
        for r in ent.spark(spark, SF_SMOKE).collect()
    }
    # Independent sequential recomputation: S_t = max(0, S_{t-1} + x_t).
    ev = spark.read.parquet(f"{SF_SMOKE}/events.parquet")
    daily = (
        ev.groupBy("event_type", F.col("ts").cast("date").alias("day"))
        .agg(F.count(F.lit(1)).alias("cnt"))
        .collect()
    )
    by_type: dict[str, list] = {}
    for r in daily:
        by_type.setdefault(r.event_type, []).append((str(r.day), r.cnt))
    expect = {}
    for et, series in by_type.items():
        series.sort()
        total = sum(c for _, c in series)
        mean_milli = total * 1000 // len(series)
        slack = mean_milli // 10
        s = 0
        for day, cnt in series:
            s = max(0, s + cnt * 1000 - mean_milli - slack)
            expect[(et, day)] = (cnt, s, 1 if s > mean_milli else 0)
    assert got == expect


# -------------------------------------------------------------------------
# Chunking: coverage, overlap, reconstruction
# -------------------------------------------------------------------------

def test_chunk_coverage_and_overlap(spark):
    ent = harness.REGISTRY["chunk_documents_overlap"]
    chunks = ent.spark(spark, SF_SMOKE).collect()
    docs = {
        r.doc_id: (r.text.strip().split() if r.text.strip() else [])
        for r in spark.read.parquet(f"{SF_SMOKE}/documents.parquet").collect()
    }
    by_doc: dict[int, list] = {}
    for c in chunks:
        by_doc.setdefault(c.doc_id, []).append(c)
    for doc_id, toks in docs.items():
        got = sorted(by_doc.get(doc_id, []), key=lambda c: c.chunk_idx)
        if not toks:
            assert got == []
            continue
        # Chunk count: one start per stride position below len(toks).
        assert len(got) == (len(toks) + 23) // 24
        covered_to = 0
        for c in got:
            assert c.start_tok == c.chunk_idx * 24
            piece = toks[c.start_tok : c.start_tok + 32]
            assert c.n_tokens == len(piece)
            assert c.chunk_md5 == hashlib.md5(
                " ".join(piece).encode()
            ).hexdigest()
            # Each chunk starts inside (or at the edge of) covered text —
            # no token gap between consecutive chunks.
            assert c.start_tok <= covered_to
            covered_to = max(covered_to, c.start_tok + c.n_tokens)
        assert covered_to == len(toks)  # full coverage


# -------------------------------------------------------------------------
# Recursive CTE: closed form for the binary-key tree
# -------------------------------------------------------------------------

def test_recursive_depth_matches_closed_form(spark):
    ent = harness.REGISTRY["recursive_cte_tree_depth"]
    for r in ent.spark(spark, SF_SMOKE).collect():
        # Keys 0 and 1 never iterate (node > 1 fails) → depth 0.
        if r.s_suppkey >= 1:
            assert r.depth_to_root == int(math.floor(math.log2(r.s_suppkey)))
        else:
            assert r.depth_to_root == 0
        # anc_sum = sum of key div 2^i for i=1..depth
        k, s = r.s_suppkey, 0
        while k > 1:
            k //= 2
            s += k
        assert r.anc_key_sum == s


# -------------------------------------------------------------------------
# LATERAL: equals the window-function formulation
# -------------------------------------------------------------------------

def test_lateral_equals_window_topk(spark):
    from pyspark.sql import Window

    ent = harness.REGISTRY["lateral_correlated_topk"]
    got = {
        (r.n_name, r.c_custkey) for r in ent.spark(spark, SF_SMOKE).collect()
    }
    cust = spark.read.parquet(f"{SF_SMOKE}/customer.parquet")
    nat = spark.read.parquet(f"{SF_SMOKE}/nation.parquet")
    w = Window.partitionBy("c_nationkey").orderBy(
        F.col("c_acctbal").desc(), "c_custkey"
    )
    expect = {
        (r.n_name, r.c_custkey)
        for r in cust.withColumn("rn", F.row_number().over(w))
        .filter(F.col("rn") <= 2)
        .join(nat, F.col("c_nationkey") == F.col("n_nationkey"))
        .collect()
    }
    assert got == expect


# -------------------------------------------------------------------------
# Matryoshka recall: structural bounds + self-consistency
# -------------------------------------------------------------------------

def test_matryoshka_recall_bounds(spark):
    ent = harness.REGISTRY["embedding_matryoshka_prefix_recall"]
    rows = ent.spark(spark, SF_SMOKE).collect()
    assert len(rows) == 20
    for r in rows:
        assert 0 <= r.n_overlap <= 10
        assert r.recall_milli == r.n_overlap * 100
    # Prefix ranking must carry SOME signal at 16/64 dims: on average
    # strictly better than the ~10/499 expected under a random ranking.
    assert sum(r.n_overlap for r in rows) / len(rows) > 1.0


# -------------------------------------------------------------------------
# Wave 2: LOCF/NOCB, business days, log2 buckets
# -------------------------------------------------------------------------

def test_locf_nocb_match_sequential_scan(spark):
    ent = harness.REGISTRY["locf_backfill_pack"]
    got = {
        r.event_id: (r.value_masked, r.locf_value, r.nocb_value)
        for r in ent.spark(spark, SF_SMOKE).collect()
    }
    from etl_tj_project_spark.sources.testdata import load_table

    ev = (
        load_table(spark, SF_SMOKE, "events")
        .select("event_id", "user_id", F.unix_micros("ts").alias("ts_us"),
                "event_type", "value")
        .collect()
    )
    by_user: dict[int, list] = {}
    for r in ev:
        masked = None if r.event_type == "error" else r.value
        by_user.setdefault(r.user_id, []).append((r.ts_us, r.event_id, masked))
    expect = {}
    for rows in by_user.values():
        rows.sort()
        carried = None
        fwd = []
        for ts, eid, v in rows:
            carried = v if v is not None else carried
            fwd.append(carried)
        nxt = None
        back = [None] * len(rows)
        for i in range(len(rows) - 1, -1, -1):
            nxt = rows[i][2] if rows[i][2] is not None else nxt
            back[i] = nxt
        for (ts, eid, v), f, b in zip(rows, fwd, back):
            expect[eid] = (v, f, b)
    assert got == expect


def test_business_day_pack_invariants(spark):
    import datetime as dt

    ent = harness.REGISTRY["business_day_pack"]
    for r in ent.spark(spark, SF_SMOKE).collect():
        d = r.order_date
        assert r.next_bday > d and r.next_bday.weekday() < 5
        assert r.bday_plus5.weekday() < 5
        # roll-to-Monday-then-a-week semantics
        roll = {5: 2, 6: 1}.get(d.weekday(), 0)
        assert r.bday_plus5 == d + dt.timedelta(days=roll + 7)
        assert r.bdays_next30 == sum(
            1 for i in range(1, 31)
            if (d + dt.timedelta(days=i)).weekday() < 5
        )


def test_log2_buckets_are_bit_lengths(spark):
    ent = harness.REGISTRY["log2_bucket_histogram"]
    rows = ent.spark(spark, SF_SMOKE).collect()
    assert rows
    for r in rows:
        assert r.log2_bucket == r.min_cents.bit_length() - 1
        assert r.log2_bucket == r.max_cents.bit_length() - 1
        assert 2 ** r.log2_bucket <= r.min_cents <= r.max_cents
        assert r.max_cents < 2 ** (r.log2_bucket + 1)


# -------------------------------------------------------------------------
# Waves 3-4: pipe syntax, collation, fertility, canonicalization, fluency
# -------------------------------------------------------------------------

def test_pipe_syntax_equals_nested_form(spark):
    ent = harness.REGISTRY["sql_pipe_syntax_agg"]
    got = {
        (r.o_orderpriority, r.n_orders)
        for r in ent.spark(spark, SF_SMOKE).collect()
    }
    from etl_tj_project_spark.sources.testdata import load_table

    o = load_table(spark, SF_SMOKE, "orders")
    expect = {
        (r.o_orderpriority, r.n)
        for r in o.filter(F.col("o_orderstatus") == "F")
        .groupBy("o_orderpriority")
        .agg(F.count(F.lit(1)).alias("n"))
        .filter(F.col("n") > 100)
        .collect()
    }
    assert got == expect


def test_collation_distinct_counts_ordered(spark):
    ent = harness.REGISTRY["collation_lcase_semantics"]
    row = ent.spark(spark, SF_SMOKE).collect()[0]
    # Case-mangling inflates binary distincts; the collated count must
    # recover the true (case-insensitive) cardinality, which can never
    # exceed the binary one. Every row equals its own source under the
    # case-insensitive comparison.
    assert row.distinct_lcase <= row.distinct_binary
    assert row.distinct_lcase >= 1
    from etl_tj_project_spark.sources.testdata import load_table

    n_part = load_table(spark, SF_SMOKE, "part").count()
    assert row.eq_lcase_rows == n_part


def test_fertility_bounds(spark):
    ent = harness.REGISTRY["bpe_fertility_by_lang"]
    rows = ent.spark(spark, SF_SMOKE).collect()
    assert rows
    for r in rows:
        # a word is at least one piece, at most its character count;
        # milli mean must be >= 1000 (>= 1 piece/word)
        assert r.fertility_milli >= 1000
        assert r.n_pieces_total >= r.n_words


def test_canonicalize_partitions_the_corpus(spark):
    ent = harness.REGISTRY["dedup_cluster_canonicalize"]
    rows = ent.spark(spark, SF_SMOKE).collect()
    from etl_tj_project_spark.sources.testdata import load_table

    docs = {
        r.doc_id: r.n_chars
        for r in load_table(spark, SF_SMOKE, "documents").collect()
    }
    # Every document belongs to exactly one cluster; canonicals are
    # distinct docs; each canonical's length is the max of its cluster
    # (spot: canonical_n_chars matches the doc table).
    assert sum(r.n_members for r in rows) == len(docs)
    canon_ids = [r.canonical_doc_id for r in rows]
    assert len(canon_ids) == len(set(canon_ids))
    for r in rows:
        assert docs[r.canonical_doc_id] == r.canonical_n_chars
        assert r.n_members >= 1


def test_bigram_fluency_detects_garbled_text(spark):
    """A document whose bigrams are corpus-typical must outscore a
    garbled (reversed-order) variant of the same words — the signal the
    operator exists to provide."""
    base = [
        "the quick brown fox jumps over the lazy dog",
        "the quick brown fox runs over the lazy cat",
        "the quick brown fox jumps over the lazy cat",
        "dog lazy the over jumps fox brown quick the",  # garbled
    ]
    docs = spark.createDataFrame(
        [(i, t) for i, t in enumerate(base)], "doc_id long, text string"
    )
    # Re-express the entry's exact pipeline inline over the local frame
    # (the registry builder is bound to the testdata loader).
    t = F.when(
        F.trim("text") == "", F.array().cast("array<string>")
    ).otherwise(F.split(F.trim(F.lower(F.col("text"))), r"\s+"))
    toks = docs.select("doc_id", t.alias("t")).filter(F.size("t") >= 2)
    bi = toks.select(
        "doc_id",
        F.explode(
            F.expr(
                "transform(sequence(1, size(t) - 1), "
                "i -> struct(t[i-1] AS w1, t[i] AS w2))"
            )
        ).alias("p"),
    ).select("doc_id", F.col("p.w1").alias("w1"), F.col("p.w2").alias("w2"))
    uni = bi.groupBy(F.col("w1").alias("w")).agg(F.count(F.lit(1)).alias("c1"))
    big = bi.groupBy("w1", "w2").agg(F.count(F.lit(1)).alias("c2"))
    scored = (
        bi.join(big, ["w1", "w2"])
        .join(uni, bi["w1"] == uni["w"])
        .select("doc_id", F.expr("c2 * 1000 div c1").alias("cont_milli"))
    )
    out = {
        r.doc_id: r.fluency
        for r in scored.groupBy("doc_id")
        .agg(F.expr("sum(cont_milli) div count(*)").alias("fluency"))
        .collect()
    }
    assert out[0] > out[3] and out[1] > out[3] and out[2] > out[3]
