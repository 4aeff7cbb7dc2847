"""Round-18 measurement probe (guide §1): sub-plan wall-clock breakdown
for the top-4 heaviest headline queries. Replicates each query's internal
frames in execution order, noop-forcing each sub-frame so the persisted
stages warm exactly as they do inside the real query; the LAST number of
each block is the residual (full query on warm caches).

Run on an idle host; output is TIME lines (tr '\r' '\n' | grep ^TIME).
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


def t(label, df, reps=2):
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
    spark = get_spark("probe_r18")
    spark.sparkContext.setLogLevel("ERROR")

    from etl_tj_project_spark import harness

    # --- dedup_prefix_filter_jaccard breakdown -------------------------
    from etl_tj_project_spark.operators import dedup as dd

    d = load_table(spark, SF, "documents")
    id_col, text_col, t_num, t_den = "doc_id", "text", 4, 5
    # body replica of prefix_filter_jaccard_pairs (measurement only)
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
    t0 = time.perf_counter()
    force(toks)
    print(f"TIME pfj.toks_cold {time.perf_counter() - t0:.3f}", flush=True)
    sizes = toks.groupBy("__id").agg(F.count(F.lit(1)).cast("long").alias("__sz"))
    dfreq = toks.groupBy("__term").agg(F.count(F.lit(1)).cast("long").alias("__df"))
    from pyspark.sql import Window as _W

    rn = F.row_number().over(_W.partitionBy("__id").orderBy("__df", "__term"))
    ranked = (
        toks.join(dfreq, "__term")
        .join(sizes, "__id")
        .select("__id", "__term", "__sz", rn.alias("__rn"))
    )
    req = F.expr(f"({t_num}L * __sz + {t_den - 1}L) div {t_den}L").cast("long")
    prefix = dd._persist_once(
        ranked.filter(F.col("__rn") <= F.col("__sz") - req + F.lit(1)).select(
            "__id", "__term", "__rn", "__sz"
        )
    )
    t0 = time.perf_counter()
    force(prefix)
    print(f"TIME pfj.prefix_cold {time.perf_counter() - t0:.3f}", flush=True)
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
    cand_raw = (
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
    )
    cand = cand_raw.distinct()
    t("pfj.cand_raw_warm", cand_raw)
    t("pfj.cand_distinct_warm", cand)
    print("ROWS pfj.cand_raw", cand_raw.count(), flush=True)
    print("ROWS pfj.cand", cand.count(), flush=True)
    tok_sets = dd._persist_once(
        toks.groupBy("__id").agg(
            F.sort_array(F.collect_list("__term")).alias("__set"),
            F.count(F.lit(1)).cast("long").alias("__sz"),
        )
    )
    t0 = time.perf_counter()
    force(tok_sets)
    print(f"TIME pfj.tok_sets_cold {time.perf_counter() - t0:.3f}", flush=True)
    print("ROWS pfj.tok_sets", tok_sets.count(), flush=True)
    print(
        "ROWS pfj.distinct_sets",
        tok_sets.select("__set").distinct().count(),
        flush=True,
    )
    # full warm query (everything persisted): cand + verify cost
    full = harness.REGISTRY["dedup_prefix_filter_jaccard"].spark(spark, SF)
    t("pfj.full_warm", full)
    # verify-only residual: join cached cand? cand is not persisted in the
    # real query; estimate verify = full_warm - cand_distinct_warm.

    # --- ann_pq_trained_topk breakdown ---------------------------------
    from etl_tj_project_spark.operators import similarity as sim

    for rep in range(3):
        e = load_table(spark, SF, "embeddings")
        t0 = time.perf_counter()
        books, train = sim.train_pq_with_cache(e, m=8, ksub=16, iters=2)
        t1 = time.perf_counter()
        print(f"TIME pq.train {t1 - t0:.3f}", flush=True)
        q = train.filter(F.col("vec_id") == 0)
        top = sim.pq_topk(train, q, k=10, codebooks=books, oversample=8).select(
            "vec_id",
            F.round("approx_l2sq", 6).alias("approx_l2sq"),
            F.round("cosine", 9).alias("cosine"),
        )
        rows = top.collect()
        t2 = time.perf_counter()
        print(f"TIME pq.topk_collect {t2 - t1:.3f}", flush=True)
        train.unpersist()
        out = spark.createDataFrame(rows, top.schema)
        force(out)
        print(f"TIME pq.materialize {time.perf_counter() - t2:.3f}", flush=True)

    # --- graph_triangle_count breakdown --------------------------------
    from etl_tj_project_spark.operators import dedup as _dd
    from etl_tj_project_spark.operators.graph import triangle_count_oriented

    for rep in range(2):
        d2 = load_table(spark, SF, "documents")
        t0 = time.perf_counter()
        pairs = _dd.lsh_candidate_pairs(d2, "doc_id", "text", 8, 4)
        pairs = _dd.narrow_persisted(pairs, "doc_a")
        force(pairs)
        t1 = time.perf_counter()
        print(f"TIME tri.pairs {t1 - t0:.3f}", flush=True)
        force(triangle_count_oriented(pairs))
        print(f"TIME tri.wedges {time.perf_counter() - t1:.3f}", flush=True)

    # --- containment breakdown ------------------------------------------
    full_cont = harness.REGISTRY["dedup_containment_ngram"].spark(spark, SF)
    t("cont.full_first", full_cont, reps=1)
    t("cont.full_warm", full_cont)

    # warm re-checks of the headline numbers for context
    t("pfj.full_warm2", full)

    spark.stop()


if __name__ == "__main__":
    main()
