"""Constant-dup-RATE sf1.0 control for connected components (VERDICT
r11 item 5 / SCALE.md §24's open question).

The r11 scale proof inflated documents with key-shifted NEAR-DUP copies
(one sentinel token appended), which by construction super-sizes LSH
cliques: every copy family shares almost all shingles, so candidate
edges grow superlinearly in copy count and CC measured 16.9× wall at
10× data. That confounds "the graph got denser" with "the algorithm
degrades". This control separates them with a measurement:

* copies here get a per-copy CAESAR ROTATION of the [a-z0-9] ring
  applied to every character (copy 0 untouched). The minhash path
  shingles CHAR 8-grams of normalized_text (lower + strip
  non-alphanumerics), and a character bijection preserves every
  within-copy set relation EXACTLY while making a cross-copy 8-gram
  match require an 8-char coincidence between one doc's text and
  another's rotation — vanishing. (First attempt suffixed every TOKEN
  with `_c<i>`; normalization strips the underscore and most 8-char
  windows avoid the one digit, so copies stayed near-dups of each
  other and edges measured 74x — a token-level rename does NOT
  isolate a char-shingle dedup. The rename must act at the same
  granularity the shingles do.)
* WITHIN a copy index the corpus is character-isomorphic to sf0.1,
  so the duplicate structure — families, rates, clique sizes — is
  exactly sf0.1's, ten times over;
* therefore LSH candidate edges must grow ~linearly (≈10×) and a CC
  implementation that is O(E · rounds) should show near-linear wall
  growth. If it doesn't, THAT is an algorithmic finding, not an
  inflation artifact.

Caveat recorded with the result: minhash band collisions are not
strictly rename-invariant (md5 values change under rotation), so the
edge count per copy index can wobble around sf0.1's — the edge-count
axis is REPORTED so the ratio is read against measured edges, not
assumed ones.

Usage: python tools/scale_cc_control.py [out_json]
Writes a JSON record (stdout + optional file) with wall seconds, the
candidate-edge and component axes at both scales, and calib brackets.
Run on an idle host (bench._cpu_calibration_parallel() ~ 0.08).
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


def build_control(spark, out_dir: str) -> None:
    """documents only: 10x fresh-doc inflation at constant dup rate."""
    from pyspark.sql import functions as F

    from etl_tj_project_spark.sources.testdata import load_table

    os.makedirs(out_dir, exist_ok=True)
    df = load_table(spark, SRC, "documents")
    shift = df.agg(F.max("doc_id")).first()[0] + 1
    copies = df.select(
        F.explode(F.sequence(F.lit(0), F.lit(INFLATE - 1))).alias("__c"), "*"
    )
    # Copy 0 byte-identical; copies i>0 get a Caesar rotation of the
    # [a-z0-9] ring applied per CHARACTER — a bijection at exactly the
    # granularity the minhash path shingles (char 8-grams of
    # normalized_text), so within-copy duplicate structure is exactly
    # sf0.1's while cross-copy 8-gram overlap is an 8-char coincidence.
    ring = "abcdefghijklmnopqrstuvwxyz0123456789"
    text = F.col("text")
    for i in range(1, INFLATE):
        rot = ring[i:] + ring[:i]
        text = F.when(
            F.col("__c") == i, F.translate(F.col("text"), ring, rot)
        ).otherwise(text)
    out = (
        copies.withColumn("doc_id", F.col("doc_id") + F.col("__c") * shift)
        .withColumn("text", text)
        .drop("__c")
    )
    out.repartition(32).write.mode("overwrite").parquet(
        os.path.join(out_dir, "documents.parquet")
    )


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
    work = tempfile.mkdtemp(prefix="tj_cc_ctrl_")
    try:
        t0 = time.perf_counter()
        build_control(spark, work)
        build_sec = round(time.perf_counter() - t0, 1)

        # Axes first (counts, not timing-sensitive): candidate edges
        # from the same LSH entry CC consumes, and the component count.
        edges = {
            "sf0.1": harness.REGISTRY["dedup_minhash_lsh"]
            .spark(spark, SRC)
            .count(),
            "control": harness.REGISTRY["dedup_minhash_lsh"]
            .spark(spark, work)
            .count(),
        }
        comps = {
            "sf0.1": harness.REGISTRY["dedup_connected_components"]
            .spark(spark, SRC)
            .count(),
            "control": harness.REGISTRY["dedup_connected_components"]
            .spark(spark, work)
            .count(),
        }

        # Warm codegen, then interleaved best-of-2 at both scales in
        # one session (house A/B rule).
        CONTROL_QUERIES = (
            "dedup_minhash_lsh",
            "dedup_connected_components",
            # Round-12 additions: the two operators whose near-dup-
            # inflation scale rows read ~30x (scale_proof_r12.json) —
            # this control separates quadratic-in-family-size OUTPUT
            # growth from operator scaling at constant dup rate.
            "dedup_containment_ngram",
            "dedup_cluster_canonicalize",
        )
        for q in CONTROL_QUERIES:
            force(harness.REGISTRY[q].spark(spark, "/root/testdata/sf0.001"))
        out: dict[str, dict] = {}
        for q in CONTROL_QUERIES:
            rec = {"sf0.1": float("inf"), "control": float("inf")}
            for _ in range(2):
                for label, d in (("sf0.1", SRC), ("control", work)):
                    t0 = time.perf_counter()
                    force(harness.REGISTRY[q].spark(spark, d))
                    rec[label] = min(
                        rec[label], round(time.perf_counter() - t0, 3)
                    )
            rec["ratio"] = round(rec["control"] / rec["sf0.1"], 2)
            out[q] = rec
            print("TIMED", q, json.dumps(rec), flush=True)
        calib_post = bench._cpu_calibration_parallel()
        record = {
            "inflate_x": INFLATE,
            "build_sec": build_sec,
            "edge_axis": edges,
            "edge_ratio": round(edges["control"] / max(edges["sf0.1"], 1), 2),
            "component_axis": comps,
            "component_ratio": round(
                comps["control"] / max(comps["sf0.1"], 1), 2
            ),
            "cpu_calib_parallel": [calib_pre, calib_post],
            "queries": out,
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
