"""As-of join (operators/asof.py): hand-computed matches, tie and
tolerance semantics, brute-force parity on random data."""

import datetime as dt

import pyspark.sql.functions as F
import pytest

from phenobert_spark.operators.asof import asof_join


def _ts(s):
    return dt.datetime(2024, 1, 1) + dt.timedelta(seconds=s)


@pytest.fixture(scope="module")
def frames(spark):
    left = spark.createDataFrame(
        [
            (100, 1, _ts(50)),   # matches b at t=40
            (101, 1, _ts(10)),   # before any b -> NULL
            (102, 1, _ts(40)),   # equal ts -> inclusive match (tie: max id)
            (103, 2, _ts(99)),   # key with no right rows -> NULL
        ],
        "event_id bigint, user_id bigint, ts timestamp",
    )
    right = spark.createDataFrame(
        [
            (1, 1, _ts(20), 1.0),
            (2, 1, _ts(40), 2.0),
            (3, 1, _ts(40), 3.0),   # same ts as 2: max event_id wins
            (4, 1, _ts(60), 4.0),
        ],
        "event_id bigint, user_id bigint, ts timestamp, value double",
    )
    return left, right


def test_asof_basic_ties_and_nulls(spark, frames):
    left, right = frames
    out = {
        r.event_id: (r.matched_event_id, r.matched_value)
        for r in asof_join(
            left, right, right_cols=["ts", "event_id", "value"],
            tiebreak="event_id",
        ).collect()
    }
    assert out[100] == (3, 3.0)     # latest <= 50 is t=40, tie -> id 3
    assert out[101] == (None, None)
    assert out[102] == (3, 3.0)     # inclusive at equal ts
    assert out[103] == (None, None)


def test_asof_tolerance_nulls_stale_matches(spark, frames):
    left, right = frames
    out = {
        r.event_id: r.matched_event_id
        for r in asof_join(
            left, right, right_cols=["ts", "event_id", "value"],
            tiebreak="event_id",
            tolerance=F.expr("INTERVAL 5 SECONDS"),
        ).collect()
    }
    assert out[102] == 3            # lag 0 <= 5s
    assert out[100] is None         # lag 10s > 5s -> nulled
    assert out[101] is None and out[103] is None


def test_asof_matches_bruteforce_random(spark):
    import random

    rng = random.Random(7)
    lrows = [
        (i, rng.randint(1, 5), _ts(rng.randint(0, 500)))
        for i in range(200)
    ]
    rrows = [
        (i, rng.randint(1, 5), _ts(rng.randint(0, 500)), float(i))
        for i in range(300)
    ]
    left = spark.createDataFrame(
        lrows, "event_id bigint, user_id bigint, ts timestamp"
    )
    right = spark.createDataFrame(
        rrows, "event_id bigint, user_id bigint, ts timestamp, value double"
    )
    got = {
        r.event_id: r.matched_event_id
        for r in asof_join(
            left, right, right_cols=["ts", "event_id", "value"],
            tiebreak="event_id",
        ).collect()
    }
    for lid, lkey, lts in lrows:
        cands = [
            (rts, rid) for rid, rkey, rts, _ in rrows
            if rkey == lkey and rts <= lts
        ]
        want = max(cands)[1] if cands else None
        assert got[lid] == want, lid


def test_asof_no_range_join_in_plan(spark, frames):
    left, right = frames
    plan = (
        asof_join(left, right, right_cols=["ts", "event_id", "value"])
        ._jdf.queryExecution().executedPlan().toString()
    )
    assert "CartesianProduct" not in plan
    assert "BroadcastNestedLoopJoin" not in plan


def test_asof_ts_only_right_frame(spark, frames):
    # right frame carrying ONLY (key, ts): matched_ts is the whole
    # payload; tiebreak falls back to ts itself instead of raising.
    left, right = frames
    out = {
        r.event_id: r.matched_ts
        for r in asof_join(left, right.select("user_id", "ts")).collect()
    }
    assert out[100] == _ts(40)
    assert out[101] is None
    assert out[102] == _ts(40)
    assert out[103] is None
