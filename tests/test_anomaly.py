import datetime as dt
import math

import pytest

from phenobert_spark.operators.anomaly import hourly_count_anomalies


def _mk_events(spark, counts, key="k"):
    """counts[i] events in hour i (UTC epoch hours from a fixed base)."""
    base = dt.datetime(2024, 1, 1, 0, 0, 0)
    rows = []
    eid = 0
    for h, n in enumerate(counts):
        for _ in range(n):
            rows.append((eid, base + dt.timedelta(hours=h, minutes=1), key))
            eid += 1
    return spark.createDataFrame(
        rows, "event_id bigint, ts timestamp, event_type string"
    )


def test_anomaly_spike_flagged_and_stats_exact(spark):
    counts = [10, 11, 9, 10, 12, 10, 9, 11, 50]  # spike in the last hour
    ev = _mk_events(spark, counts)
    out = sorted(
        hourly_count_anomalies(
            ev, trailing=24, z_thresh=3.0, min_history=6
        ).collect(),
        key=lambda r: r.hour_start,
    )
    # first 6 hours: not enough history -> no stats, never anomalous
    for r in out[:6]:
        assert r.mu is None and r.z is None and not r.is_anomaly
    last = out[-1]
    hist = counts[:-1]
    mu = sum(hist) / len(hist)
    var = (sum(x * x for x in hist) - sum(hist) ** 2 / len(hist)) / (
        len(hist) - 1
    )
    z = (50 - mu) / math.sqrt(var)
    assert abs(last.mu - mu) < 1e-9
    assert abs(last.z - z) < 1e-9
    assert last.is_anomaly
    # the quiet hour before the spike is not flagged
    assert not out[-2].is_anomaly


def test_anomaly_zero_variance_not_flagged(spark):
    ev = _mk_events(spark, [5] * 8 + [9])
    out = sorted(
        hourly_count_anomalies(ev, min_history=6).collect(),
        key=lambda r: r.hour_start,
    )
    last = out[-1]
    # constant history -> sigma 0 -> z undefined, never flagged
    assert last.sigma == 0.0 and last.z is None and not last.is_anomaly


def test_anomaly_min_history_validation(spark):
    ev = _mk_events(spark, [1, 2])
    with pytest.raises(ValueError, match="min_history"):
        hourly_count_anomalies(ev, min_history=1)
