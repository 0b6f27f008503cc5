"""Similarity-search operators (operators/similarity.py)."""

import pyspark.sql.functions as F

from phenobert_spark.operators.similarity import cosine_topk_pandas, ivf_topk

SF = "/root/testdata/sf0.001"


def test_pandas_topk_matches_relational_oracle(spark):
    """The numpy path must agree with the relational q19 implementation."""
    from phenobert_spark.plans.contract_queries import QUERIES

    e = spark.read.parquet(f"{SF}/embeddings.parquet")
    a = {tuple(r) for r in cosine_topk_pandas(spark, e, n_queries=5, k=3).collect()}
    b = {tuple(r) for r in QUERIES["q19_cosine_topk"](spark, SF).collect()}
    assert a == b


def test_ivf_recall_vs_bruteforce(spark):
    """IVF with nprobe=4 over 8 buckets must recover most of the true
    top-3 neighbors (approximate by design, bounded loss)."""
    e = spark.read.parquet(f"{SF}/embeddings.parquet")
    queries = e.filter(F.col("vec_id") < 10)
    exact = cosine_topk_pandas(spark, e, n_queries=10, k=3)
    approx = ivf_topk(spark, e, queries, n_centroids=8, k=3, nprobe=4)
    exact_set = {(r.qid, r.nid) for r in exact.collect()}
    approx_set = {(r.qid, r.nid) for r in approx.collect()}
    recall = len(exact_set & approx_set) / len(exact_set)
    assert recall >= 0.5, f"IVF recall {recall}"
    # every query answered with k results
    assert approx.groupBy("qid").count().filter("count != 3").count() == 0


def test_ivf_full_probe_equals_bruteforce(spark):
    """nprobe == n_centroids searches every bucket -> exact results."""
    e = spark.read.parquet(f"{SF}/embeddings.parquet").filter(F.col("vec_id") < 120)
    queries = e.filter(F.col("vec_id") < 5)
    exact = cosine_topk_pandas(spark, e, n_queries=5, k=3)
    full = ivf_topk(spark, e, queries, n_centroids=8, k=3, nprobe=8)
    assert {(r.qid, r.nid) for r in exact.collect()} == {
        (r.qid, r.nid) for r in full.collect()
    }
