"""Ordered funnel analysis over an event stream.

The product-analytics classic (ClickHouse ``windowFunnel``, Amplitude
funnels): given an ordered list of stages, find for every user the
first time each stage was reached STRICTLY AFTER the previous stage's
matched time — i.e. the stages must occur in order, not merely all
occur.

Scale plan: stage k is one equi-join on the user key against the
stage-(k-1) match frame plus one keyed min-aggregate — k small and
fixed, every shuffle keyed on the user, so consecutive stages
co-partition and the event table is scanned once per stage with the
stage-type filter pushed to the scan. No window over the full event
table, no per-row Python. The alternative single-pass
sort-within-user formulation needs the whole event history in one
window partition per user — strictly worse under hot-user skew.
"""

from __future__ import annotations

from pyspark.sql import DataFrame
from pyspark.sql import functions as F


def funnel(
    events: DataFrame,
    stages: list[str],
    user_col: str = "user_id",
    ts_col: str = "ts",
    type_col: str = "event_type",
    max_span=None,
) -> DataFrame:
    """Per-user funnel match times: one row per user who reached
    stage 1, with columns ``t1..tk`` (timestamp of the first in-order
    match per stage, NULL once the funnel is abandoned).

    ``max_span``: optional Column interval (e.g.
    ``F.expr("INTERVAL 1 HOUR")``); later stages must match within
    ``t1 + max_span`` (the ClickHouse window semantics).
    """
    if not stages:
        raise ValueError("funnel needs at least one stage")
    out = (
        events.filter(F.col(type_col) == stages[0])
        .groupBy(F.col(user_col).alias("user_id"))
        .agg(F.min(ts_col).alias("t1"))
    )
    for k, stage in enumerate(stages[1:], start=2):
        ev = events.filter(F.col(type_col) == stage).select(
            F.col(user_col).alias("user_id"), F.col(ts_col).alias("_t")
        )
        cond = F.col("_t") > F.col(f"t{k - 1}")
        if max_span is not None:
            cond = cond & (F.col("_t") <= F.col("t1") + max_span)
        nxt = (
            ev.join(out.select("user_id", "t1", f"t{k - 1}"), on="user_id")
            .filter(cond)
            .groupBy("user_id")
            .agg(F.min("_t").alias(f"t{k}"))
        )
        out = out.join(nxt, on="user_id", how="left")
    return out


def funnel_counts(
    events: DataFrame,
    stages: list[str],
    **kwargs,
) -> DataFrame:
    """Stage-level conversion summary: (stage_idx, stage, n_users)
    with n_users = users whose funnel reached that stage in order.
    One extra single-row-per-user aggregate over :func:`funnel`."""
    f = funnel(events, stages, **kwargs)
    counts = f.agg(
        *[
            F.count(f"t{k}").cast("bigint").alias(f"t{k}")
            for k in range(1, len(stages) + 1)
        ]
    )
    pairs = F.array(
        *[
            F.struct(
                F.lit(k).alias("stage_idx"),
                F.lit(stage).alias("stage"),
                F.col(f"t{k}").alias("n_users"),
            )
            for k, stage in enumerate(stages, start=1)
        ]
    )
    return counts.select(F.explode(pairs).alias("s")).select(
        "s.stage_idx", "s.stage", "s.n_users"
    )
