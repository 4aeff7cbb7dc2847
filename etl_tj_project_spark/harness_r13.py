"""Round-13 pack: the containment guardrail made executable, and the
streaming dedup surface registered.

SCALE.md §25b measured that asymmetric containment under near-dup COPY
inflation is output-bound — a 10-copy family genuinely has ~100x the
qualifying ordered pairs — and recorded "canonicalize families before
pairwise ops" as the production guardrail. VERDICT r12 item 3 demands
that guardrail as a shipped, oracle-checked OPERATOR rather than a
docstring note. ``dedup_containment_canonical`` is that operator: the
full dedup DECISION pipeline (LSH candidates → connected components →
one canonical survivor per cluster) feeding the exact prefix-filtered
containment join over the survivors UNIONED with a deterministic
contained-fragment probe set (round 14: the synthetic corpus has no
natural 80%-containment pair among survivors, so without probes the
entry returned 0 rows and its oracle check was vacuous — VERDICT r13
item 1a). The companion strain runner
(strain.py run_containment_guardrail_strain) proves the point
quantitatively: at a 4x exact-copy corpus the candidate-join input
drops >= replicas^2 while the final pair set is IDENTICAL to the
base-corpus run.

``stream_dedup_watermark`` registers the streaming dedup primitive
(``dropDuplicatesWithinWatermark``) as a first-class entry: a REAL
Structured Streaming query (file source, availableNow trigger, memory
sink) over a duplicate-injected copy of the events table, with batch
exact dedup as its DuckDB equality oracle — VERDICT r12 item 2's
"bounded replay" form. State is bounded by the watermark horizon, the
property that keeps exactly-once ingest dedup viable at 10^12 events.

Cross-engine determinism: injected duplicates are exact row copies, so
keep-first vs keep-any cannot diverge; output is projected to the raw
event columns and compared as an unordered multiset.
"""

from __future__ import annotations

import os
import shutil
import tempfile

from pyspark.sql import DataFrame, SparkSession
from pyspark.sql import functions as F

from etl_tj_project_spark.harness import register
from etl_tj_project_spark.operators import dedup as dd
from etl_tj_project_spark.sources.testdata import load_table

# =========================================================================
# The containment guardrail, composed end-to-end
# =========================================================================


def _containment_canonical_oracle() -> str:
    """Canonicalize (recursive-CTE connected components over the
    DuckDB-restated MinHash band graph — the shared SQL twin
    ``dd.canonicalize_manifest_sql``, byte-identical to the
    dedup_cluster_canonicalize oracle), splice in the deterministic
    contained-fragment probe set, then restate the containment
    all-pairs join over survivors + probes. Built entirely from
    operators/dedup.py twins — no harness_r12 import, which was the
    r13 circular-import bug (importing harness_r12 first deadlocked
    on the partially initialized module)."""
    canon = dd.canonicalize_manifest_sql(
        "documents", "doc_id", "text", "n_chars", num_hashes=8, bands=4
    )
    probes = dd.containment_probe_corpus_sql("docs", "doc_id", "text")
    return f"""
    WITH canon AS MATERIALIZED ({canon}),
    docs AS (
      SELECT d.doc_id, d.text
      FROM documents d
      JOIN canon c ON c.canonical_doc_id = d.doc_id
    ), corpus AS ({probes}), t AS (
      SELECT doc_id,
             CASE WHEN trim(text) = '' THEN CAST([] AS VARCHAR[])
                  ELSE regexp_split_to_array(trim(lower(text)), '\\s+')
             END AS toks
      FROM corpus
    ), s AS MATERIALIZED (
      SELECT doc_id,
             unnest(list_distinct(
               CASE WHEN len(toks) = 0 THEN CAST([] AS VARCHAR[])
               ELSE list_transform(range(1, greatest(len(toks) - 2, 1) + 1),
                    i -> array_to_string(toks[i:i+2], ' ')) END)) AS term
      FROM t
    ), sz AS (
      SELECT doc_id, count(*) AS sz FROM s GROUP BY doc_id
    ), inter AS (
      SELECT a.doc_id AS doc_a, b.doc_id AS doc_b, count(*) AS n_inter
      FROM s a JOIN s b USING (term)
      WHERE a.doc_id <> b.doc_id
      GROUP BY 1, 2
    )
    SELECT i.doc_a, i.doc_b,
           CAST(i.n_inter AS BIGINT) AS n_inter,
           CAST(z.sz AS BIGINT)      AS sz_a,
           CAST(i.n_inter * 1000 // z.sz AS BIGINT) AS containment_milli
    FROM inter i JOIN sz z ON z.doc_id = i.doc_a
    WHERE 5 * i.n_inter >= 4 * z.sz
    """


@register(
    "dedup_containment_canonical",
    _containment_canonical_oracle(),
    doc="SCALE.md §25b's guardrail as an operator (VERDICT r12 item 3): "
        "collapse near-dup families FIRST (LSH bands → connected "
        "components → longest-doc canonical per cluster — the "
        "dedup_cluster_canonicalize manifest, reused through its "
        "parquet-materialized CC entry), THEN run the exact "
        "prefix-filtered containment join over only the canonical "
        "survivors. At adversarial duplicate density the direct join "
        "is output-bound (a k-copy family has ~k^2 qualifying pairs); "
        "canonicalize-first removes those families before the "
        "candidate join exists, so the pairwise stage scales with the "
        "CANONICAL corpus. The strain runner proves the drop is >= "
        "replicas^2 on a 4x exact-copy corpus with the final pair set "
        "unchanged. Survivors are unioned with the deterministic "
        "contained-fragment PROBE set (token-prefix excerpts of every "
        "10th survivor, C(probe->source)=1.0 by construction — "
        "dd.containment_probe_corpus) standing in for the contained-"
        "fragment class a real corpus has but the synthetic smoke "
        "corpus lacks, so the oracle hash compares NON-EMPTY results "
        "at every scale (VERDICT r13 item 1a: no vacuous empty==empty "
        "green). Oracle restates all three stages in one WITH chain "
        "(recursive-CTE CC + probe splice + all-pairs containment). Selection rule (direct vs canonical): COVERAGE.md round 16",
)
def dedup_containment_canonical(spark: SparkSession, sf_dir: str) -> DataFrame:
    from etl_tj_project_spark.harness_r12 import shared_family_manifest

    d = load_table(spark, sf_dir, "documents")
    manifest = shared_family_manifest(spark, sf_dir)
    reps = d.join(
        manifest.select(
            F.col("canonical_doc_id").alias("doc_id")
        ),
        "doc_id",
        "left_semi",
    )
    corpus = dd.containment_probe_corpus(reps, "doc_id", "text")
    return dd.prefix_filter_containment_pairs(
        corpus, "doc_id", "text", ngram=3, t_num=4, t_den=5
    )


def _jaccard_canonical_oracle() -> str:
    """Canonicalize (shared recursive-CTE CC twin), then restate the
    EXACT all-pairs Jaccard join over the survivors. The Spark side
    runs the lossless prefix-filtered form; the oracle may use the
    direct all-pairs form because prefix filtering has zero false
    negatives — same result set, oracle-scale corpus."""
    canon = dd.canonicalize_manifest_sql(
        "documents", "doc_id", "text", "n_chars", num_hashes=8, bands=4
    )
    return f"""
    WITH canon AS MATERIALIZED ({canon}),
    docs AS (
      SELECT d.doc_id, d.text
      FROM documents d
      JOIN canon c ON c.canonical_doc_id = d.doc_id
    ), t AS MATERIALIZED (
      SELECT doc_id,
             unnest(list_distinct(
               CASE WHEN trim(text) = '' THEN CAST([] AS VARCHAR[])
                    ELSE regexp_split_to_array(trim(lower(text)), '\\s+')
               END)) AS term
      FROM docs
    ), sz AS MATERIALIZED (
      SELECT doc_id, CAST(count(*) AS BIGINT) AS sz FROM t GROUP BY doc_id
    ), inter AS (
      SELECT a.doc_id AS doc_a, b.doc_id AS doc_b,
             CAST(count(*) AS BIGINT) AS n_inter
      FROM t a JOIN t b ON a.term = b.term AND a.doc_id < b.doc_id
      GROUP BY 1, 2
    )
    SELECT i.doc_a, i.doc_b, i.n_inter, za.sz AS sz_a, zb.sz AS sz_b,
           round(CAST(i.n_inter AS DOUBLE)
                 / CAST(za.sz + zb.sz - i.n_inter AS DOUBLE), 6) AS jaccard
    FROM inter i
    JOIN sz za ON za.doc_id = i.doc_a
    JOIN sz zb ON zb.doc_id = i.doc_b
    WHERE 5 * i.n_inter >= 4 * (za.sz + zb.sz - i.n_inter)
    """


@register(
    "dedup_jaccard_canonical",
    _jaccard_canonical_oracle(),
    doc="The §25b/§26 guardrail applied to the SYMMETRIC set-similarity "
        "join (round 14): canonicalize near-dup families first (LSH -> "
        "connected components -> longest-doc survivor), THEN run the "
        "exact prefix-filtered Jaccard self-join at t=4/5 over only "
        "the survivors. SCALE.md §26 measured why this exists: on the "
        "copy-inflated corpus the direct Jaccard join is output-bound "
        "(qualifying pairs 2.97M -> 197.6M at 10x) — collapsing "
        "families before the pairwise stage removes the replicas^2 "
        "pair lift at its source, the same guardrail the containment "
        "variant ships as dedup_containment_canonical. No probe set "
        "needed here: the symmetric join over survivors is naturally "
        "non-vacuous on this corpus (the small vocabulary keeps "
        "genuine >=0.8-Jaccard survivor pairs at every scale). Oracle "
        "restates canonicalize + EXACT all-pairs Jaccard in one WITH "
        "chain (prefix filtering is lossless, so all-pairs == the "
        "prefix-filtered result by construction). Selection rule (direct vs canonical): COVERAGE.md round 16",
)
def dedup_jaccard_canonical(spark: SparkSession, sf_dir: str) -> DataFrame:
    from etl_tj_project_spark.harness_r12 import shared_family_manifest

    d = load_table(spark, sf_dir, "documents")
    manifest = shared_family_manifest(spark, sf_dir)
    reps = d.join(
        manifest.select(F.col("canonical_doc_id").alias("doc_id")),
        "doc_id",
        "left_semi",
    )
    return dd.prefix_filter_jaccard_pairs(reps, "doc_id", "text", 4, 5)


# =========================================================================
# Streaming dedup entry: dropDuplicatesWithinWatermark, bounded replay
# =========================================================================


@register(
    "stream_dedup_watermark",
    """
    SELECT CAST(event_id AS BIGINT) AS event_id,
           CAST(user_id AS BIGINT)  AS user_id,
           event_type,
           CAST(value AS DOUBLE)    AS value
    FROM events
    """,
    doc="Streaming exactly-once ingest dedup (VERDICT r12 item 2): a "
        "REAL Structured Streaming run — file source over a "
        "duplicate-injected copy of events (every 7th event written "
        "twice), withWatermark + dropDuplicatesWithinWatermark on "
        "event_id, availableNow trigger, memory sink — whose result "
        "must equal batch exact dedup, which is just `events` itself "
        "since injected rows are exact copies. State holds a key only "
        "until the watermark passes it, so state size is bounded by "
        "the duplicate-arrival window, not stream history — the "
        "property that keeps ingest dedup viable at 10^12 events. "
        "Injected duplicates are byte-identical rows, so keep-first "
        "vs keep-any cannot diverge; ts is projected out because the "
        "oracle hash treats the raw event payload as the identity",
)
def stream_dedup_watermark(spark: SparkSession, sf_dir: str) -> DataFrame:
    from etl_tj_project_spark.streaming.stateful import dedup_stream

    ev = load_table(spark, sf_dir, "events").select(
        "event_id", "user_id", "event_type", "value", "ts"
    )
    # Build the duplicate-injected source dir: full table + every 7th
    # row again. Deterministic (no RNG), byte-identical copies.
    work = tempfile.mkdtemp(prefix="tj_stream_dedup_")
    src = os.path.join(work, "src")
    name = f"stream_dedup_{abs(hash(work)) % (1 << 30)}"
    try:
        dupes = ev.filter(F.col("event_id") % 7 == 0)
        ev.unionAll(dupes).write.mode("overwrite").parquet(src)

        stream = (
            spark.readStream.format("parquet")
            .schema(spark.read.parquet(src).schema)
            .load(src)
        )
        deduped = dedup_stream(
            stream, ["event_id"], watermark_col="ts", watermark="36500 days"
        )
        q = (
            deduped.select("event_id", "user_id", "event_type", "value")
            .writeStream.format("memory")
            .queryName(name)
            .outputMode("append")
            .trigger(availableNow=True)
            .start()
        )
        try:
            # awaitTermination(timeout) returns False on timeout — an
            # unchecked False would read a PARTIAL memory-sink table
            # and record a false correctness failure (ADVICE r13).
            if not q.awaitTermination(300):
                raise RuntimeError(
                    "stream_dedup_watermark: streaming query did not "
                    "finish within 300s"
                )
            # Materialize OFF the memory-sink table before the temp
            # source dir is deleted: the driver collects the returned
            # frame after this function exits. sf0.01 events is 60k
            # rows — bounded replay, per the entry's charter; a 100 TB
            # deployment points the same dedup_stream at a real sink.
            out = spark.createDataFrame(
                spark.table(name).collect(),
                schema=spark.table(name).schema,
            )
        finally:
            # Idempotent after normal termination; on the timeout path
            # it halts the query BEFORE the source dir is deleted below
            # (ADVICE r13: rmtree under a live query caused background
            # FAILED_READ errors). The memory-sink temp view is dropped
            # so repeated runs don't accrete tables in the catalog.
            q.stop()
            spark.catalog.dropTempView(name)
        return out.select(
            F.col("event_id").cast("long"),
            F.col("user_id").cast("long"),
            "event_type",
            F.col("value").cast("double"),
        )
    finally:
        shutil.rmtree(work, ignore_errors=True)
