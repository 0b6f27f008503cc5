"""Graph materialization + per-partition checkpoint/lineage
(SURVEY.md §2.1 S7/S8, §4 item 4; north rule: "resumable from
checkpoint with per-partition lineage + metrics").

Output layout under ``out_dir`` (parquet here; on a cluster the same
writes go through ``.writeTo(...).using("iceberg")`` — the layout and
manifest logic are format-agnostic):

    triples/bucket=NNN/*.parquet    edge table (doc)-[has_phenotype]->(hpo)
    nodes_docs/*.parquet            document node table
    nodes_hpo/*.parquet             ontology concept node table
    manifest/*.parquet              per-bucket lineage + metrics

Checkpoint unit: ``bucket = pmod(xxhash64(doc_id), n_buckets)`` — a
deterministic, data-defined partition of the corpus. A bucket is done
iff a manifest row exists for it; resume = anti-join pending buckets
against the manifest and process only those. Lineage per bucket:

    (bucket, n_docs, n_triples, doc_xor, wall_sec, ts)

``doc_xor`` is the XOR of the doc_id sha256 prefixes — an
order-independent content fingerprint of exactly which documents the
bucket covered: any input drift (added/removed/changed content) flips
the fingerprint, so stale checkpoints are detectable, and because
doc_id = sha2(content) the manifest also witnesses the per-row content
sha256 invariant end-to-end.
"""

from __future__ import annotations

import os
import time

from pyspark.sql import DataFrame, SparkSession
from pyspark.sql import functions as F

from .config import PipelineConfig
from .corpus import with_doc_id
from .ontology import Ontology
from .pipeline import annotate


def bucket_of(col: F.Column, n_buckets: int) -> F.Column:
    return F.pmod(F.xxhash64(col), F.lit(n_buckets)).cast("int")


def _doc_xor(doc_id_col: str = "doc_id") -> F.Column:
    # first 15 hex chars -> bigint, XOR-reduced (order-independent)
    return F.expr(
        f"bit_xor(cast(conv(substring({doc_id_col}, 1, 15), 16, 10) as bigint))"
    )


def read_manifest(spark: SparkSession, out_dir: str) -> DataFrame | None:
    path = os.path.join(out_dir, "manifest")
    try:
        return spark.read.parquet(path)
    except Exception:
        return None


def completed_buckets(spark: SparkSession, out_dir: str) -> set[int]:
    m = read_manifest(spark, out_dir)
    if m is None:
        return set()
    return {r.bucket for r in m.select("bucket").distinct().collect()}


def write_nodes(
    spark: SparkSession, docs: DataFrame, onto: Ontology, out_dir: str
) -> None:
    """Node tables: documents (content-addressed) and HPO concepts."""
    doc_nodes = with_doc_id(docs).select(
        "doc_id", "repo", "path", "commit", "lang", F.length("content").alias("n_chars")
    )
    doc_nodes.write.mode("overwrite").parquet(os.path.join(out_dir, "nodes_docs"))
    onto.terms_df(spark).write.mode("overwrite").parquet(
        os.path.join(out_dir, "nodes_hpo")
    )


def run_with_checkpoint(
    spark: SparkSession,
    docs: DataFrame,
    onto: Ontology,
    out_dir: str,
    cfg: PipelineConfig = PipelineConfig(),
    n_buckets: int = 16,
    fail_after_buckets: int | None = None,
) -> dict:
    """Annotate ``docs`` into the edge table with per-bucket checkpoints.

    Re-invoking after an interruption resumes: buckets present in the
    manifest are skipped (their triples are already on disk). Buckets
    are processed in deterministic order; ``fail_after_buckets`` lets
    tests simulate a mid-job crash.

    Scale note: one Spark job per bucket keeps the checkpoint unit
    coarse (a 10^12-file corpus at n_buckets=10^4 gives ~10^8 docs per
    job — each still a fully parallel pipeline run); the driver-side
    loop is over buckets, never over rows.
    """
    docs_b = with_doc_id(docs).withColumn("bucket", bucket_of(F.col("doc_id"), n_buckets))
    done = completed_buckets(spark, out_dir)
    pending = sorted(
        r.bucket for r in docs_b.select("bucket").distinct().collect()
        if r.bucket not in done
    )
    triples_dir = os.path.join(out_dir, "triples")
    manifest_dir = os.path.join(out_dir, "manifest")
    processed = 0
    for b in pending:
        if fail_after_buckets is not None and processed >= fail_after_buckets:
            break
        t0 = time.time()
        part = docs_b.filter(F.col("bucket") == b).drop("bucket", "doc_id")
        triples = annotate(spark, part, onto, cfg).withColumn("bucket", F.lit(b))
        triples.write.mode("append").partitionBy("bucket").parquet(triples_dir)
        stats = (
            with_doc_id(part)
            .agg(
                F.count("*").alias("n_docs"),
                _doc_xor().alias("doc_xor"),
            )
            .collect()[0]
        )
        n_triples = spark.read.parquet(triples_dir).filter(
            F.col("bucket") == b
        ).count()
        manifest_row = spark.createDataFrame(
            [
                (
                    b,
                    stats.n_docs,
                    n_triples,
                    int(stats.doc_xor or 0),
                    round(time.time() - t0, 3),
                )
            ],
            "bucket INT, n_docs LONG, n_triples LONG, doc_xor LONG, wall_sec DOUBLE",
        )
        manifest_row.write.mode("append").parquet(manifest_dir)
        processed += 1
    return {
        "resumed_from": len(done),
        "processed": processed,
        "pending_before": len(pending),
    }


def verify_manifest(spark: SparkSession, docs: DataFrame, out_dir: str, n_buckets: int) -> DataFrame:
    """Recompute per-bucket doc fingerprints from the CURRENT input and
    diff against the stored manifest — detects input drift under a
    checkpoint. Returns rows that disagree (empty == clean)."""
    m = read_manifest(spark, out_dir)
    docs_b = (
        with_doc_id(docs)
        .withColumn("bucket", bucket_of(F.col("doc_id"), n_buckets))
        .groupBy("bucket")
        .agg(F.count("*").alias("n_docs_now"), _doc_xor().alias("doc_xor_now"))
    )
    return (
        m.join(docs_b, on="bucket", how="full")
        .filter(
            (F.col("n_docs") != F.col("n_docs_now"))
            | (F.col("doc_xor") != F.col("doc_xor_now"))
            | F.col("n_docs").isNull()
            | F.col("n_docs_now").isNull()
        )
    )


def read_triples(spark: SparkSession, out_dir: str) -> DataFrame:
    return spark.read.parquet(os.path.join(out_dir, "triples"))
