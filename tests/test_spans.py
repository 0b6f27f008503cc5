"""Span algebra: window formulation vs brute-force oracle (SURVEY.md J3/J4)."""

import random

import pyspark.sql.functions as F

from phenobert_spark.operators.spans import (
    keep_maximal_spans,
    maximal_spans_bruteforce,
    suppress_contained_in,
)

SCHEMA = "doc_id string, start int, end int"


def _random_spans(seed, n_docs=5, n_spans=40):
    rng = random.Random(seed)
    rows = []
    for d in range(n_docs):
        seen = set()
        for _ in range(n_spans):
            s = rng.randint(0, 80)
            e = s + rng.randint(1, 30)
            if (s, e) not in seen:
                seen.add((s, e))
                rows.append((f"doc{d}", s, e))
    return rows


def test_keep_maximal_matches_bruteforce(spark):
    for seed in (1, 2, 3):
        df = spark.createDataFrame(_random_spans(seed), SCHEMA)
        fast = {tuple(r) for r in keep_maximal_spans(df).collect()}
        slow = {tuple(r) for r in maximal_spans_bruteforce(df).collect()}
        assert fast == slow


def test_keep_maximal_simple_case(spark):
    rows = [("d", 0, 10), ("d", 2, 5), ("d", 0, 10 + 5), ("d", 12, 20), ("d", 15, 20)]
    df = spark.createDataFrame(rows, SCHEMA)
    got = {(r.start, r.end) for r in keep_maximal_spans(df).collect()}
    assert got == {(0, 15), (12, 20)}


def test_suppress_contained_in(spark):
    probe = spark.createDataFrame(
        [("d", 2, 5), ("d", 11, 14), ("d", 0, 10), ("e", 2, 5)], SCHEMA
    )
    anchors = spark.createDataFrame([("d", 0, 10)], SCHEMA)
    got = {tuple(r) for r in suppress_contained_in(probe, anchors).collect()}
    # (d,2,5) inside anchor -> dropped; (d,0,10) equals anchor -> dropped
    # (identical span already matched); (d,11,14) outside; doc e unaffected.
    assert got == {("d", 11, 14), ("e", 2, 5)}


def test_suppress_contained_bruteforce_equivalence(spark):
    rng = random.Random(7)
    rows = _random_spans(7)
    anchors = [r for r in rows if rng.random() < 0.3]
    probes = [r for r in rows if r not in anchors]
    p = spark.createDataFrame(probes, SCHEMA)
    a = spark.createDataFrame(anchors, SCHEMA)
    fast = {tuple(r) for r in suppress_contained_in(p, a).collect()}
    slow = set()
    for d, s, e in probes:
        if not any(ad == d and as_ <= s and e <= ae for ad, as_, ae in anchors):
            slow.add((d, s, e))
    assert fast == slow


def test_suppress_containing(spark):
    from phenobert_spark.operators.spans import suppress_containing

    probe = spark.createDataFrame(
        [("d", 0, 10), ("d", 2, 5), ("d", 11, 14), ("d", 3, 6), ("e", 0, 10)],
        SCHEMA,
    )
    anchors = spark.createDataFrame([("d", 3, 6)], SCHEMA)
    got = {tuple(r) for r in suppress_containing(probe, anchors).collect()}
    # (d,0,10) contains the anchor -> dropped; (d,3,6) equals the anchor
    # -> dropped; (d,2,5) overlaps but does not contain -> kept
    assert got == {("d", 2, 5), ("d", 11, 14), ("e", 0, 10)}


def test_suppress_containing_bruteforce_equivalence(spark):
    from phenobert_spark.operators.spans import suppress_containing

    rng = random.Random(13)
    rows = _random_spans(13)
    anchors = [r for r in rows if rng.random() < 0.3]
    probes = [r for r in rows if r not in anchors]
    p = spark.createDataFrame(probes, SCHEMA)
    a = spark.createDataFrame(anchors, SCHEMA)
    fast = {tuple(r) for r in suppress_containing(p, a).collect()}
    slow = set()
    for d, s, e in probes:
        if not any(ad == d and s <= as_ and ae <= e for ad, as_, ae in anchors):
            slow.add((d, s, e))
    assert fast == slow


def test_coalesce_runs_gaps_and_islands(spark):
    """{1,2,3,7,8} -> [1,3],[7,8]; duplicate seq values dedup; a
    singleton group emits one length-1 run."""
    from phenobert_spark.operators.spans import coalesce_runs

    df = spark.createDataFrame(
        [(1, "a", 1), (1, "a", 2), (1, "a", 2), (1, "a", 3),
         (1, "a", 7), (1, "a", 8), (2, "b", 5)],
        "k int, rel string, seq int",
    )
    got = sorted(
        (r.k, r.rel, r.run_start, r.run_end, r.run_len)
        for r in coalesce_runs(df, ["k", "rel"], "seq").collect()
    )
    assert got == [(1, "a", 1, 3, 3), (1, "a", 7, 8, 2), (2, "b", 5, 5, 1)]
