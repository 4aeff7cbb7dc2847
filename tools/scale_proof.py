"""One-shot sf1.0 scale proof (VERDICT r10 item 3): measure the headline
query set at a 10x key-shifted inflation of sf0.1 (6M-row lineitem) and
print per-query sf0.1 vs sf1.0 seconds + the scaling ratio.

Why key-shifted inflation instead of byte-duplication: byte copies make
every row a 10x exact duplicate, which quadratically blows up the
near-dup self-join surface (10 identical docs share every LSH band) and
understates distinct-key cardinality growth. Here fact keys are SHIFTED
per copy (l_orderkey/o_orderkey move together so the join fan-out is
preserved; doc_id shifts and copies i>0 get one appended sentinel token
so copies are near- but not exact duplicates), dims stay fixed — the
TPC-H scaling rule, and the realistic 100 TB regime (fact grows, dims
don't).

Usage: python tools/scale_proof.py [out_json]
Writes the staged dataset under a temp dir (removed afterwards) and the
JSON record to stdout + optional file. Run on an idle host (check
bench._cpu_calibration_parallel() ~ 0.08 first — verify-skill rule).
"""

from __future__ import annotations

import json
import os
import shutil
import sys
import tempfile
import time

sys.path.insert(0, os.path.dirname(os.path.dirname(os.path.abspath(__file__))))

SRC = os.environ.get("SPARK_GRAFT_SF_DIR", "/root/testdata/sf0.1")
CPUS = os.environ.get("SPARK_GRAFT_CPUS", "32")
INFLATE = 10

QUERIES = [
    # VERDICT r10 item 3's named set...
    "u2_two_branch_union_agg",
    "tpch_q1_pricing_summary",
    "tpch_q3_shipping_priority",
    "tpch_q18_large_orders",
    "dedup_exact",
    "dedup_minhash_lsh",
    "dedup_connected_components",
    "dedup_paragraph_chunks",
    # ...plus the r11 additions (a distributed sort and a corpus-wide
    # classifier are exactly the shapes a scale point should cover).
    "sorted_export_ntile_ranges",
    "quality_classifier_inference",
    # Round-12 document-bound additions: the prefix-filtered containment
    # self-join (candidate growth is THE scale question), shuffle-free
    # chunking (should be ~IO-linear), the bigram-LM join-back, and the
    # full dedup decision (LSH -> CC -> canonical pick). Events/
    # embeddings tables don't inflate, so their entries stay out.
    "dedup_containment_ngram",
    "chunk_documents_overlap",
    "bigram_fluency_score",
    "dedup_cluster_canonicalize",
]

SHIFTED = {
    "lineitem": ("l_orderkey",),
    "orders": ("o_orderkey",),
    "documents": ("doc_id",),
}


def build_sf1(spark, out_dir: str) -> None:
    """10x the fact tables with disjoint key ranges; copy dims as-is."""
    from pyspark.sql import functions as F

    from etl_tj_project_spark.sources.testdata import load_table

    os.makedirs(out_dir, exist_ok=True)
    all_tables = [
        "region", "nation", "customer", "supplier", "part",
        "orders", "lineitem", "events", "documents", "embeddings",
    ]
    for t in all_tables:
        src = os.path.join(SRC, f"{t}.parquet")
        dst = os.path.join(out_dir, f"{t}.parquet")
        if t not in SHIFTED:
            # Untransformed tables: byte-copy so formats (e.g. events'
            # TIMESTAMP(NANOS)) stay exactly as the driver wrote them.
            if os.path.isdir(src):
                shutil.copytree(src, dst)
            else:
                os.makedirs(dst)
                shutil.copyfile(src, os.path.join(dst, "part-00000.parquet"))
            continue
        df = load_table(spark, SRC, t)
        key = SHIFTED[t][0]
        shift = df.agg(F.max(key)).first()[0] + 1
        copies = df.select(
            F.explode(F.sequence(F.lit(0), F.lit(INFLATE - 1))).alias("__c"),
            "*",
        )
        out = copies.withColumn(key, F.col(key) + F.col("__c") * shift)
        if t == "documents":
            # Copies are NEAR duplicates (one sentinel token differs),
            # not exact ones — keeps the LSH/minhash surface realistic.
            out = out.withColumn(
                "text",
                F.when(F.col("__c") == 0, F.col("text")).otherwise(
                    F.concat(F.col("text"), F.lit(" zcopy"),
                             F.col("__c").cast("string"))
                ),
            )
        out.drop("__c").repartition(32).write.mode("overwrite").parquet(dst)


def main() -> None:
    from pyspark.sql import SparkSession

    import bench
    from etl_tj_project_spark import harness

    spark = (
        SparkSession.builder.master(f"local[{CPUS}]")
        .config("spark.sql.shuffle.partitions", "32")
        .config("spark.driver.memory", "16g")
        .config("spark.ui.showConsoleProgress", "false")
        .getOrCreate()
    )
    spark.sparkContext.setLogLevel("ERROR")

    def force(df) -> None:
        df.write.format("noop").mode("overwrite").save()

    calib_pre = bench._cpu_calibration_parallel()
    work = tempfile.mkdtemp(prefix="tj_sf1_")
    try:
        t0 = time.perf_counter()
        build_sf1(spark, work)
        build_sec = round(time.perf_counter() - t0, 1)
        li_rows = spark.read.parquet(
            os.path.join(work, "lineitem.parquet")
        ).count()

        # Warm codegen at smoke scale, then interleaved best-of-2 at
        # BOTH scales in the same session (house A/B rule: scaling
        # ratios come from one load regime, not two sessions).
        for n in QUERIES:
            force(harness.REGISTRY[n].spark(spark, "/root/testdata/sf0.001"))
        out: dict[str, dict] = {}
        for n in QUERIES:
            rec = {"sf0.1": float("inf"), "sf1.0": float("inf")}
            for _ in range(2):
                for label, d in (("sf0.1", SRC), ("sf1.0", work)):
                    t0 = time.perf_counter()
                    force(harness.REGISTRY[n].spark(spark, d))
                    rec[label] = min(
                        rec[label], round(time.perf_counter() - t0, 3)
                    )
            rec["ratio"] = round(rec["sf1.0"] / rec["sf0.1"], 2)
            out[n] = rec
            print("TIMED", n, json.dumps(rec), flush=True)
        calib_post = bench._cpu_calibration_parallel()
        record = {
            "inflate_x": INFLATE,
            "lineitem_rows_sf1": li_rows,
            "build_sec": build_sec,
            "cpu_calib_parallel": [calib_pre, calib_post],
            "queries": out,
            "total_sf01": round(sum(v["sf0.1"] for v in out.values()), 2),
            "total_sf1": round(sum(v["sf1.0"] for v in out.values()), 2),
        }
        line = json.dumps(record)
        print("RESULT " + line, flush=True)
        if len(sys.argv) > 1:
            with open(sys.argv[1], "w") as fh:
                fh.write(line + "\n")
    finally:
        shutil.rmtree(work, ignore_errors=True)


if __name__ == "__main__":
    main()
