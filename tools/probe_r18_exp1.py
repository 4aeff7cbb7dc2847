"""Round-18 experiment 1:
(a) pfj verify: array_intersect on string arrays vs dense-int-id arrays.
(b) pq_topk: planning vs execution split; literal codebooks vs
    broadcast one-row codebook table.
(c) corpus stats: vocab size, toks rows, avg set size.
"""
from __future__ import annotations

import sys
import time

sys.path.insert(0, "/root/repo")

from pyspark.sql import functions as F  # noqa: E402

from etl_tj_project_spark.session import get_spark  # noqa: E402
from etl_tj_project_spark.sources.testdata import load_table  # noqa: E402

SF = "/root/testdata/sf0.1"


def force(df):
    df.write.format("noop").mode("overwrite").save()


def t(label, df, reps=3):
    best = float("inf")
    for _ in range(reps):
        t0 = time.perf_counter()
        force(df)
        best = min(best, time.perf_counter() - t0)
    print(f"TIME {label} {best:.3f}", flush=True)
    return best


def main():
    import os

    os.environ.setdefault("SPARK_GRAFT_CPUS", "32")
    spark = get_spark("probe_r18_exp1")
    spark.sparkContext.setLogLevel("ERROR")

    from etl_tj_project_spark.operators import dedup as dd

    d = load_table(spark, SF, "documents")
    id_col, text_col, t_num, t_den = "doc_id", "text", 4, 5
    toks = dd._persist_once(
        dd._ensure_parallelism(d).select(
            F.col(id_col).alias("__id"),
            F.explode(
                F.array_distinct(
                    F.when(F.trim(F.col(text_col)) == "", F.array()).otherwise(
                        F.split(F.trim(F.lower(F.col(text_col))), r"\s+")
                    )
                )
            ).alias("__term"),
        )
    )
    force(toks)
    print("ROWS toks", toks.count(), flush=True)
    dfreq = toks.groupBy("__term").agg(F.count(F.lit(1)).cast("long").alias("__df"))
    print("ROWS vocab", dfreq.count(), flush=True)
    print(
        "STAT set_size",
        toks.groupBy("__id").count().agg(
            F.min("count"), F.avg("count"), F.max("count")
        ).collect(),
        flush=True,
    )
    print(
        "STAT term_len",
        dfreq.agg(F.avg(F.length("__term")), F.max(F.length("__term"))).collect(),
        flush=True,
    )

    # Build the candidate set once (persist so both verify variants see
    # the same input and we time ONLY the verify stage).
    from pyspark.sql import Window as _W

    sizes = toks.groupBy("__id").agg(F.count(F.lit(1)).cast("long").alias("__sz"))
    rn = F.row_number().over(_W.partitionBy("__id").orderBy("__df", "__term"))
    ranked = (
        toks.join(dfreq, "__term")
        .join(sizes, "__id")
        .select("__id", "__term", "__sz", rn.alias("__rn"))
    )
    req = F.expr(f"({t_num}L * __sz + {t_den - 1}L) div {t_den}L").cast("long")
    prefix = ranked.filter(
        F.col("__rn") <= F.col("__sz") - req + F.lit(1)
    ).select("__id", "__term", "__rn", "__sz")
    pa = prefix.select(
        F.col("__id").alias("doc_a"), "__term",
        F.col("__rn").alias("__ra"), F.col("__sz").alias("__sza"),
    )
    pb = prefix.select(
        F.col("__id").alias("doc_b"), "__term",
        F.col("__rn").alias("__rb"), F.col("__sz").alias("__szb"),
    )
    pair_req = F.expr(
        f"({t_num}L * (__sza + __szb) + {t_num + t_den - 1}L)"
        f" div {t_num + t_den}L"
    )
    cand = (
        pa.join(pb, "__term")
        .filter(F.col("doc_a") < F.col("doc_b"))
        .filter(
            F.lit(t_num) * F.greatest("__sza", "__szb")
            <= F.lit(t_den) * F.least("__sza", "__szb")
        )
        .filter(
            F.lit(1)
            + F.least(F.col("__sza") - F.col("__ra"), F.col("__szb") - F.col("__rb"))
            >= pair_req
        )
        .select("doc_a", "doc_b")
        .distinct()
        .persist()
    )
    force(cand)

    # Variant A: current — string-array tok_sets
    tok_sets_str = toks.groupBy("__id").agg(
        F.sort_array(F.collect_list("__term")).alias("__set"),
        F.count(F.lit(1)).cast("long").alias("__sz"),
    ).persist()
    force(tok_sets_str)

    def verify(tok_sets):
        sa = tok_sets.select(
            F.col("__id").alias("doc_a"),
            F.col("__set").alias("__seta"),
            F.col("__sz").alias("sz_a"),
        )
        sb = tok_sets.select(
            F.col("__id").alias("doc_b"),
            F.col("__set").alias("__setb"),
            F.col("__sz").alias("sz_b"),
        )
        scored = (
            cand.join(sa, "doc_a")
            .join(sb, "doc_b")
            .withColumn(
                "n_inter",
                F.size(F.array_intersect("__seta", "__setb")).cast("long"),
            )
        )
        union = F.col("sz_a") + F.col("sz_b") - F.col("n_inter")
        return scored.filter(
            F.lit(t_den) * F.col("n_inter") >= F.lit(t_num) * union
        ).select("doc_a", "doc_b", "n_inter", "sz_a", "sz_b")

    t("verify_str", verify(tok_sets_str))

    # Variant B: dense int token ids (global rank over the vocab).
    tid = dfreq.select(
        "__term",
        F.row_number().over(_W.orderBy("__df", "__term")).alias("__tid"),
    )
    toks_int = toks.join(tid, "__term").select("__id", "__tid")
    tok_sets_int = toks_int.groupBy("__id").agg(
        F.sort_array(F.collect_list("__tid")).alias("__set"),
        F.count(F.lit(1)).cast("long").alias("__sz"),
    ).persist()
    force(tok_sets_int)
    t("verify_int", verify(tok_sets_int))

    # Variant C: int ids + intersect via aggregate over sorted arrays?
    # (skipped: no JVM-pure merge form without per-element lambda cost)

    # Variant D: bitmap (vocab fits in a few longs) — exactness check of
    # feasibility only if vocab <= 4096.
    nvocab = tid.count()
    if nvocab <= 4096:
        nwords = (nvocab + 63) // 64
        bits = toks_int.groupBy("__id").agg(
            F.expr(
                "aggregate(collect_list(__tid), "
                f"array_repeat(0L, {nwords}), "
                "(acc, t) -> transform(acc, (w, i) -> "
                "CASE WHEN (t-1) div 64 = i THEN w | shiftleft(1L, "
                "CAST((t-1) % 64 AS INT)) ELSE w END))"
            ).alias("__bits"),
            F.count(F.lit(1)).cast("long").alias("__sz"),
        ).persist()
        force(bits)
        ba = bits.select(
            F.col("__id").alias("doc_a"), F.col("__bits").alias("__ba"),
            F.col("__sz").alias("sz_a"),
        )
        bb = bits.select(
            F.col("__id").alias("doc_b"), F.col("__bits").alias("__bb"),
            F.col("__sz").alias("sz_b"),
        )
        inter = F.aggregate(
            F.zip_with("__ba", "__bb", lambda x, y: F.bit_count(x.bitwiseAND(y))),
            F.lit(0),
            lambda acc, v: acc + v,
        ).cast("long")
        scored = (
            cand.join(ba, "doc_a").join(bb, "doc_b")
            .withColumn("n_inter", inter)
        )
        union = F.col("sz_a") + F.col("sz_b") - F.col("n_inter")
        out = scored.filter(
            F.lit(t_den) * F.col("n_inter") >= F.lit(t_num) * union
        ).select("doc_a", "doc_b", "n_inter", "sz_a", "sz_b")
        t("verify_bitmap", out)

    # Equality check int vs str verify outputs
    a = verify(tok_sets_str)
    b = verify(tok_sets_int)
    print("CHECK int_eq", a.exceptAll(b).count(), b.exceptAll(a).count(), flush=True)

    # ---- PQ planning vs execution -------------------------------------
    from etl_tj_project_spark.operators import similarity as sim

    e = load_table(spark, SF, "embeddings")
    books, train = sim.train_pq_with_cache(e, m=8, ksub=16, iters=2)
    q = train.filter(F.col("vec_id") == 0)
    for rep in range(3):
        t0 = time.perf_counter()
        top = sim.pq_topk(train, q, k=10, codebooks=books, oversample=8).select(
            "vec_id",
            F.round("approx_l2sq", 6).alias("approx_l2sq"),
            F.round("cosine", 9).alias("cosine"),
        )
        t1 = time.perf_counter()
        top._jdf.queryExecution().executedPlan()
        t2 = time.perf_counter()
        rows = top.collect()
        t3 = time.perf_counter()
        print(
            f"TIME pq.build {t1-t0:.3f} plan {t2-t1:.3f} exec {t3-t2:.3f}",
            flush=True,
        )
    train.unpersist()
    spark.stop()


if __name__ == "__main__":
    main()
