import heapq
import math
import random

import pytest

from phenobert_spark.operators.closure import sssp_distances
from phenobert_spark.operators.retrieval import bm25_scores, rrf_fuse


def test_sssp_prefers_lighter_longer_path(spark):
    edges = [(1, 2, 10.0), (1, 3, 1.0), (3, 2, 2.0), (2, 4, 1.0)]
    e = spark.createDataFrame(edges, "src bigint, dst bigint, w double")
    s = spark.createDataFrame([(1,)], "node bigint")
    got = {r.node: r.dist for r in sssp_distances(e, s).collect()}
    assert got == {1: 0.0, 2: 3.0, 3: 1.0, 4: 4.0}


def _dijkstra(edges, sources):
    adj = {}
    for a, b, w in edges:
        adj.setdefault(a, []).append((b, w))
    dist = {}
    pq = [(0.0, s) for s in sources]
    while pq:
        d, u = heapq.heappop(pq)
        if u in dist:
            continue
        dist[u] = d
        for v, w in adj.get(u, []):
            if v not in dist:
                heapq.heappush(pq, (d + w, v))
    return dist


def test_sssp_matches_dijkstra_random(spark):
    rng = random.Random(11)
    edges = [
        (a, b, float(rng.randint(1, 9)))
        for a in range(50)
        for b in range(50)
        if a != b and rng.random() < 0.05
    ]
    sources = [0, 7]
    e = spark.createDataFrame(edges, "src bigint, dst bigint, w double")
    s = spark.createDataFrame([(x,) for x in sources], "node bigint")
    got = {r.node: r.dist for r in sssp_distances(e, s).collect()}
    assert got == _dijkstra(edges, sources)


def test_sssp_raises_past_budget(spark):
    chain = [(i, i + 1, 1.0) for i in range(8)]
    e = spark.createDataFrame(chain, "src bigint, dst bigint, w double")
    s = spark.createDataFrame([(0,)], "node bigint")
    with pytest.raises(RuntimeError, match="max_iters"):
        sssp_distances(e, s, max_iters=2)


def test_bm25_hand_computed(spark):
    docs = spark.createDataFrame(
        [
            (1, "spark spark window"),
            (2, "window table row"),
            (3, "hash join plan"),
        ],
        "doc_id bigint, text string",
    )
    got = {r.id: r for r in bm25_scores(docs, ["spark", "hash"]).collect()}
    n, avg_len = 3.0, 3.0
    k1, b = 1.2, 0.75

    def score(tf, df, dl):
        idf = math.log((n - df + 0.5) / (df + 0.5) + 1)
        return idf * tf * (k1 + 1) / (tf + k1 * (1 - b + b * dl / avg_len))

    assert got[1].tf_0 == 2 and got[1].tf_1 == 0
    assert abs(got[1].score - score(2, 1, 3)) < 1e-12
    assert abs(got[3].score - score(1, 1, 3)) < 1e-12
    assert got[2].score == 0.0
    # more occurrences of an equally-rare term => higher score
    assert got[1].score > got[3].score


def test_rrf_fusion_hand_computed(spark):
    r1 = spark.createDataFrame([(10, 1), (11, 2), (12, 3)], "id bigint, rank int")
    r2 = spark.createDataFrame([(11, 1), (13, 2)], "id bigint, rank int")
    got = {r.id: r.rrf for r in rrf_fuse([r1, r2]).collect()}
    assert abs(got[10] - 1 / 61) < 1e-15
    assert abs(got[11] - (1 / 62 + 1 / 61)) < 1e-15
    assert abs(got[12] - 1 / 63) < 1e-15
    assert abs(got[13] - 1 / 62) < 1e-15
    # the doc present in both lists outranks single-list docs here
    assert got[11] == max(got.values())
