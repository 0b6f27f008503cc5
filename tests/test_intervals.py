import random

import pytest

from phenobert_spark.operators.intervals import (
    coalesce_intervals,
    interval_overlap_join,
)


def _coalesce_ref(rows):
    """Driver-side islands reference over (key, start, end)."""
    out = []
    by_key = {}
    for k, s, e in rows:
        by_key.setdefault(k, []).append((s, e))
    for k, ivs in by_key.items():
        ivs.sort()
        cur_s, cur_e, n = ivs[0][0], ivs[0][1], 1
        for s, e in ivs[1:]:
            if s <= cur_e:
                cur_e = max(cur_e, e)
                n += 1
            else:
                out.append((k, cur_s, cur_e, n))
                cur_s, cur_e, n = s, e, 1
        out.append((k, cur_s, cur_e, n))
    return sorted(out)


def test_coalesce_touching_overlapping_and_contained(spark):
    rows = [
        # key 1: [0,10) touches [10,20) -> merge; [25,30) separate;
        # [26,27) contained -> same island, n_rows counts it
        (1, 0, 10), (1, 10, 20), (1, 25, 30), (1, 26, 27),
        # key 2: out-of-order input, running max must carry the long
        # interval over the short one ([0,100) swallows [5,8), [50,60))
        (2, 50, 60), (2, 0, 100), (2, 5, 8), (2, 150, 160),
    ]
    df = spark.createDataFrame(rows, "key bigint, start bigint, end bigint")
    got = sorted(
        (r.key, r.start, r["end"], r.n_rows)
        for r in coalesce_intervals(df).collect()
    )
    assert got == _coalesce_ref(rows)
    assert (1, 0, 20, 2) in got and (2, 0, 100, 3) in got


def test_coalesce_random_matches_reference(spark):
    rng = random.Random(71)
    rows = [
        (rng.randrange(5), s := rng.randrange(0, 500), s + rng.randrange(1, 40))
        for _ in range(300)
    ]
    df = spark.createDataFrame(rows, "key bigint, start bigint, end bigint")
    got = sorted(
        (r.key, r.start, r["end"], r.n_rows)
        for r in coalesce_intervals(df).collect()
    )
    assert got == _coalesce_ref(rows)


def _overlap_ref(left, right):
    out = set()
    for k1, i1, s1, e1 in left:
        for k2, i2, s2, e2 in right:
            if k1 == k2 and s1 < e2 and s2 < e1:
                out.add((k1, i1, i2, max(s1, s2), min(e1, e2)))
    return out


def test_overlap_join_boundary_semantics(spark):
    # half-open: [0,10) and [10,20) do NOT overlap; [0,11)/[10,20) do.
    left = [(1, 100, 0, 10), (1, 101, 0, 11), (2, 102, 0, 5)]
    right = [(1, 200, 10, 20), (2, 201, 3, 4)]
    l = spark.createDataFrame(left, "key bigint, id bigint, start bigint, end bigint")
    r = spark.createDataFrame(right, "key bigint, id bigint, start bigint, end bigint")
    got = {
        (x.key, x.left_id, x.right_id, x.overlap_start, x.overlap_end)
        for x in interval_overlap_join(l, r, bucket=4).collect()
    }
    assert got == _overlap_ref(left, right)
    assert (1, 101, 200, 10, 11) in got and (2, 102, 201, 3, 4) in got


def test_overlap_join_random_multiple_buckets(spark):
    rng = random.Random(73)

    def mk(n, base):
        return [
            (
                rng.randrange(4),
                base + i,
                s := rng.randrange(0, 300),
                s + rng.randrange(1, 60),
            )
            for i in range(n)
        ]

    left, right = mk(60, 1000), mk(60, 2000)
    l = spark.createDataFrame(left, "key bigint, id bigint, start bigint, end bigint")
    r = spark.createDataFrame(right, "key bigint, id bigint, start bigint, end bigint")
    # bucket far smaller than spans: every interval tiles many cells,
    # exercising the distinct-dedup path
    got = {
        (x.key, x.left_id, x.right_id, x.overlap_start, x.overlap_end)
        for x in interval_overlap_join(l, r, bucket=7).collect()
    }
    assert got == _overlap_ref(left, right)


def test_overlap_join_guards(spark):
    l = spark.createDataFrame(
        [(1, 1, 0, 10_000)], "key bigint, id bigint, start bigint, end bigint"
    )
    r = spark.createDataFrame(
        [(1, 2, 5, 6)], "key bigint, id bigint, start bigint, end bigint"
    )
    with pytest.raises(ValueError):
        interval_overlap_join(l, r, bucket=0)
    with pytest.raises(Exception, match="too many buckets"):
        interval_overlap_join(
            l, r, bucket=1, max_buckets_per_interval=100
        ).collect()
    # empty/degenerate intervals (start >= end) are dropped, not errors
    bad = spark.createDataFrame(
        [(1, 3, 10, 10)], "key bigint, id bigint, start bigint, end bigint"
    )
    assert interval_overlap_join(bad, r, bucket=4).count() == 0
