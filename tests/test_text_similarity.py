"""tf-idf sparse vectors / inverted-index cosine (operators/text.py)
and fixed-iteration PageRank (operators/kg_metrics.py) against
hand-computed numpy twins."""

import math

import numpy as np
import pyspark.sql.functions as F
import pytest

from phenobert_spark.operators.kg_metrics import pagerank
from phenobert_spark.operators.text import sparse_cosine_pairs, tfidf_vectors

DOCS = [
    (1, "spark shuffles data between executors"),
    (2, "spark shuffles data between partitions"),
    (3, "ontology concepts form a directed acyclic graph"),
    (4, "a graph of ontology concepts"),
    (5, "completely unrelated words here"),
]


def _numpy_tfidf(rows):
    """Dense numpy twin of tfidf_vectors."""
    toks = {d: t.lower().strip().split() for d, t in rows}
    vocab = sorted({w for ts in toks.values() for w in ts})
    n = len(rows)
    df = {w: sum(w in set(ts) for ts in toks.values()) for w in vocab}
    vecs = {}
    for d, ts in toks.items():
        v = np.array(
            [ts.count(w) * math.log(n / df[w]) for w in vocab], dtype=np.float64
        )
        nm = np.linalg.norm(v)
        vecs[d] = v / nm if nm > 0 else v
    return vocab, df, vecs


def test_tfidf_vectors_match_numpy(spark):
    d = spark.createDataFrame(DOCS, "doc_id int, text string")
    vocab, df, vecs = _numpy_tfidf(DOCS)
    got = tfidf_vectors(d).collect()
    for r in got:
        want = vecs[r.doc_id][vocab.index(r.token)]
        assert r.w == pytest.approx(want, abs=1e-12), (r.doc_id, r.token)
    # idf-0 tokens (df == N) carry weight 0 but are present; unit norm
    by_doc = {}
    for r in got:
        by_doc.setdefault(r.doc_id, []).append(r.w)
    for d_id, ws in by_doc.items():
        assert math.sqrt(sum(w * w for w in ws)) == pytest.approx(1.0, abs=1e-9)


def test_sparse_cosine_pairs_match_numpy(spark):
    d = spark.createDataFrame(DOCS, "doc_id int, text string")
    _, df, vecs = _numpy_tfidf(DOCS)
    got = {
        (r.doc_a, r.doc_b): r.cos
        for r in sparse_cosine_pairs(
            tfidf_vectors(d), threshold=0.05, max_df_ratio=1.0
        ).collect()
    }
    # with no df pruning the sparse dot == dense numpy cosine
    for (a, b), cos in got.items():
        assert cos == pytest.approx(float(vecs[a] @ vecs[b]), abs=1e-9)
    # near-dup pair (1,2) present and high; unrelated doc 5 absent
    assert got[(1, 2)] > 0.5
    assert got[(3, 4)] > 0.2
    assert not any(5 in p for p in got)


def test_sparse_cosine_df_pruning_is_lower_bound(spark):
    """Pruned stopword-grade tokens only REMOVE positive mass: every
    pruned cosine <= unpruned cosine, and pairs sharing only common
    tokens disappear."""
    d = spark.createDataFrame(DOCS, "doc_id int, text string")
    vec = tfidf_vectors(d)
    full = {
        (r.doc_a, r.doc_b): r.cos
        for r in sparse_cosine_pairs(vec, 0.0, max_df_ratio=1.0).collect()
    }
    pruned = {
        (r.doc_a, r.doc_b): r.cos
        for r in sparse_cosine_pairs(vec, 0.0, max_df_ratio=0.5).collect()
    }
    for p, c in pruned.items():
        assert c <= full[p] + 1e-12


def test_pagerank_matches_numpy_power_iteration(spark):
    edges = spark.createDataFrame(
        [("a", "c"), ("b", "c"), ("c", "d"), ("d", "a"), ("a", "d")],
        "src string, dst string",
    )
    got = {r.node: r.rank for r in pagerank(edges, damping=0.85, iters=5).collect()}
    nodes = ["a", "b", "c", "d"]
    idx = {n: i for i, n in enumerate(nodes)}
    out = {"a": ["c", "d"], "b": ["c"], "c": ["d"], "d": ["a"]}
    r = np.full(4, 1 / 4)
    for _ in range(5):
        nxt = np.full(4, 0.15 / 4)
        for u, vs in out.items():
            for v in vs:
                nxt[idx[v]] += 0.85 * r[idx[u]] / len(vs)
        r = nxt
    for n in nodes:
        assert got[n] == pytest.approx(r[idx[n]], abs=1e-12), n
    # b has no in-edges: teleport mass only
    assert got["b"] == pytest.approx(0.15 / 4, abs=1e-15)


def test_pagerank_fixed_iters_deterministic_across_partitioning(spark):
    edges = spark.createDataFrame(
        [(f"u{i}", f"u{(i * 7) % 23}") for i in range(60)],
        "src string, dst string",
    )
    a = sorted(
        (r.node, round(r.rank, 10))
        for r in pagerank(edges.coalesce(1), iters=4).collect()
    )
    b = sorted(
        (r.node, round(r.rank, 10))
        for r in pagerank(edges.repartition(13), iters=4).collect()
    )
    assert a == b
