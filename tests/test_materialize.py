"""Checkpoint / lineage / resume (north rule resumability)."""

import pyspark.sql.functions as F
import pytest

from phenobert_spark.config import PipelineConfig
from phenobert_spark.corpus import synthesize_corpus
from phenobert_spark.materialize import (
    completed_buckets,
    read_manifest,
    read_triples,
    run_with_checkpoint,
    verify_manifest,
    write_nodes,
)
from phenobert_spark.pipeline import annotate


@pytest.fixture()
def corpus(spark, onto):
    docs, gold = synthesize_corpus(spark, onto, n_docs=24)
    return docs


def test_resume_after_crash(spark, onto, corpus, tmp_path):
    out = str(tmp_path / "graph")
    cfg = PipelineConfig()
    # crash after 3 buckets
    r1 = run_with_checkpoint(
        spark, corpus, onto, out, cfg, n_buckets=8, fail_after_buckets=3
    )
    assert r1["processed"] == 3
    done_mid = completed_buckets(spark, out)
    assert len(done_mid) == 3
    # resume: must process ONLY the remaining buckets
    r2 = run_with_checkpoint(spark, corpus, onto, out, cfg, n_buckets=8)
    assert r2["resumed_from"] == 3
    assert r2["processed"] == r2["pending_before"]
    # final result equals a single-shot run
    got = {
        tuple(r)
        for r in read_triples(spark, out)
        .drop("bucket")
        .select("doc_id", "hpo_id", "start", "end")
        .collect()
    }
    want = {
        tuple(r)
        for r in annotate(spark, corpus, onto, cfg)
        .select("doc_id", "hpo_id", "start", "end")
        .collect()
    }
    assert got == want


def test_rerun_is_noop(spark, onto, corpus, tmp_path):
    out = str(tmp_path / "graph")
    run_with_checkpoint(spark, corpus, onto, out, n_buckets=4)
    n1 = read_triples(spark, out).count()
    r = run_with_checkpoint(spark, corpus, onto, out, n_buckets=4)
    assert r["processed"] == 0  # everything checkpointed
    assert read_triples(spark, out).count() == n1  # no duplicate appends


def test_manifest_lineage_detects_drift(spark, onto, corpus, tmp_path):
    out = str(tmp_path / "graph")
    run_with_checkpoint(spark, corpus, onto, out, n_buckets=4)
    assert verify_manifest(spark, corpus, out, n_buckets=4).count() == 0
    # mutate the corpus: drop a doc -> fingerprint must flip somewhere
    drifted = corpus.limit(20)
    assert verify_manifest(spark, drifted, out, n_buckets=4).count() > 0


def test_manifest_metrics(spark, onto, corpus, tmp_path):
    out = str(tmp_path / "graph")
    run_with_checkpoint(spark, corpus, onto, out, n_buckets=4)
    m = read_manifest(spark, out)
    rows = m.collect()
    assert sum(r.n_docs for r in rows) == 24
    assert all(r.wall_sec > 0 for r in rows)
    assert sum(r.n_triples for r in rows) == read_triples(spark, out).count()


def test_node_tables(spark, onto, corpus, tmp_path):
    out = str(tmp_path / "graph")
    write_nodes(spark, corpus, onto, out)
    docs_nodes = spark.read.parquet(f"{out}/nodes_docs")
    hpo_nodes = spark.read.parquet(f"{out}/nodes_hpo")
    assert docs_nodes.count() == 24
    assert {f.name for f in docs_nodes.schema.fields} >= {"doc_id", "repo", "path"}
    assert hpo_nodes.count() == len(onto.names)


def test_single_input_scan_regardless_of_buckets(spark, onto, tmp_path):
    """The whole checkpointed run must read the input exactly once —
    never once per bucket (VERDICT r1 'What's wrong' #5)."""
    acc = spark.sparkContext.accumulator(0)
    docs, _ = synthesize_corpus(spark, onto, n_docs=12)

    def counting(batches):
        for pdf in batches:
            acc.add(len(pdf))
            yield pdf

    instrumented = docs.mapInPandas(counting, docs.schema)
    run_with_checkpoint(spark, instrumented, onto, str(tmp_path / "g"), n_buckets=16)
    assert acc.value == 12


def test_partial_write_without_manifest_is_replaced(spark, onto, corpus, tmp_path):
    """Crash AFTER the triples write but BEFORE the manifest commit:
    resume must overwrite the orphaned partitions, never append
    duplicates (ADVICE r1: idempotent bucket writes)."""
    import shutil

    out = str(tmp_path / "graph")
    run_with_checkpoint(spark, corpus, onto, out, n_buckets=4, fail_after_buckets=2)
    shutil.rmtree(f"{out}/manifest")  # simulate the crash window
    run_with_checkpoint(spark, corpus, onto, out, n_buckets=4)
    got = (
        read_triples(spark, out)
        .groupBy("doc_id", "hpo_id", "start", "end")
        .count()
        .collect()
    )
    want = {
        (r.doc_id, r.hpo_id, r.start, r.end): r["count"]
        for r in annotate(spark, corpus, onto, PipelineConfig())
        .groupBy("doc_id", "hpo_id", "start", "end")
        .count()
        .collect()
    }
    assert {(r.doc_id, r.hpo_id, r.start, r.end): r["count"] for r in got} == want


def test_annotate_delta_incremental_ingest(spark, onto, corpus, tmp_path):
    """Day-N+1 ingest (materialize.annotate_delta): after the corpus
    gains docs and loses docs, only drifted buckets reprocess, and the
    resulting triple table is EXACTLY what a from-scratch run over the
    new snapshot produces — additions appear, deletions disappear."""
    from phenobert_spark.materialize import annotate_delta

    out = str(tmp_path / "g")
    run_with_checkpoint(spark, corpus, onto, out, n_buckets=8)

    extra, _ = synthesize_corpus(spark, onto, n_docs=30)
    extra = extra.orderBy("path").limit(3).withColumn(
        "path", F.concat(F.lit("new/"), F.col("path"))
    )
    dropped = corpus.orderBy("path").limit(1)
    day2 = corpus.join(dropped, on="path", how="left_anti").unionByName(extra)

    res = annotate_delta(spark, day2, onto, out, n_buckets=8)
    assert res["invalidated"], "drifted buckets must be detected"
    assert res["processed"] == len(res["invalidated"]) < 8
    # lineage is clean again for the new snapshot...
    assert verify_manifest(spark, day2, out, n_buckets=8).count() == 0
    # ...and the graph equals a from-scratch build over day2
    scratch = str(tmp_path / "scratch")
    run_with_checkpoint(spark, day2, onto, scratch, n_buckets=8)
    cols = ["doc_id", "hpo_id"]
    a = {tuple(r) for r in read_triples(spark, out).select(*cols).collect()}
    b = {tuple(r) for r in read_triples(spark, scratch).select(*cols).collect()}
    assert a == b
    # idempotent: same snapshot again -> nothing to do
    res2 = annotate_delta(spark, day2, onto, out, n_buckets=8)
    assert res2["invalidated"] == [] and res2["processed"] == 0


def test_write_zordered_confines_file_zones(spark, tmp_path):
    """The clustered writer must leave per-file value ranges far
    narrower than the global range on BOTH z dimensions — that
    narrowing IS the file-skipping payoff (q201's arithmetic on the
    real filesystem)."""
    import glob
    import os

    from phenobert_spark.materialize import write_zordered

    rows = [(i, i % 64, (i * 7) % 64) for i in range(4096)]
    df = spark.createDataFrame(rows, "id long, x long, y long")
    out = str(tmp_path / "zordered")
    write_zordered(df, out, zcols=("x", "y"), n_files=16, bits=6)

    files = sorted(glob.glob(os.path.join(out, "part-*.parquet")))
    assert 2 <= len(files) <= 16
    import pyarrow.parquet as pq

    widths_x, widths_y = [], []
    for f in files:
        t = pq.read_table(f)
        xs, ys = t.column("x").to_pylist(), t.column("y").to_pylist()
        widths_x.append(max(xs) - min(xs))
        widths_y.append(max(ys) - min(ys))
    # global width is 63 on both axes; clustered files must average
    # well under half of it on each
    assert sum(widths_x) / len(widths_x) < 32
    assert sum(widths_y) / len(widths_y) < 32
    # schema round-trips without the transient key
    got = spark.read.parquet(out)
    assert set(got.columns) == {"id", "x", "y"}
    assert got.count() == 4096
