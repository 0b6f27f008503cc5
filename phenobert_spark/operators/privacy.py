"""Privacy-compliance gates: k-anonymity and l-diversity reports.

A corpus release (or a feature table derived from user events) has to
pass re-identification checks before it ships; the standard pair:

* **k-anonymity** (Sweeney 2002): every quasi-identifier combination
  (the columns an attacker can link externally — zip, age band,
  segment) must describe at least ``k`` rows, else those rows are
  re-identifiable.
* **l-diversity** (Machanavalli et al. 2007): within every QI group
  the SENSITIVE attribute must take at least ``l`` distinct values,
  else membership in the group leaks the sensitive value even when
  k-anonymity holds (the homogeneity attack).

Both are single QI-keyed aggregations with map-side combine — the
10^12-row pass is the word-count shape; group cardinality =
|QI-value space|. The reports return the violating groups (the
actionable artifact: which cells need generalization/suppression)
plus one summary row each; complements the row-level scrubbing in
``operators/text.pii_redact``.
"""

from __future__ import annotations

from pyspark.sql import DataFrame
from pyspark.sql import functions as F


def k_anonymity_groups(
    df: DataFrame, qi_cols: list[str], k: int = 5
) -> DataFrame:
    """Per-QI-combination sizes with the anonymity flag:
    ``(*qi_cols, n, is_anonymous)``. ``is_anonymous`` = n >= k."""
    if not qi_cols:
        raise ValueError("qi_cols must be non-empty")
    if k < 2:
        raise ValueError("k must be >= 2")
    return df.groupBy(*qi_cols).agg(
        F.count("*").alias("n")
    ).withColumn("is_anonymous", F.col("n") >= k)


def k_anonymity_summary(
    df: DataFrame, qi_cols: list[str], k: int = 5
) -> DataFrame:
    """One-row release gate: ``(k, n_rows, n_groups,
    n_violating_groups, n_rows_at_risk, min_group_size, passes)`` —
    ``passes`` iff every QI group has >= k rows."""
    g = k_anonymity_groups(df, qi_cols, k)
    return g.agg(
        F.lit(int(k)).cast("long").alias("k"),
        F.sum("n").cast("long").alias("n_rows"),
        F.count("*").cast("long").alias("n_groups"),
        F.sum((~F.col("is_anonymous")).cast("long")).alias(
            "n_violating_groups"
        ),
        F.sum(
            F.when(~F.col("is_anonymous"), F.col("n")).otherwise(0)
        ).cast("long").alias("n_rows_at_risk"),
        F.min("n").cast("long").alias("min_group_size"),
        (F.min("n") >= k).alias("passes"),
    )


def l_diversity_groups(
    df: DataFrame,
    qi_cols: list[str],
    sensitive_col: str,
    l_threshold: int = 2,
) -> DataFrame:
    """Per-QI-combination sensitive-value diversity:
    ``(*qi_cols, n, n_distinct_sensitive, is_diverse)``. A group
    with one sensitive value leaks it to anyone who can place a
    person in the group — regardless of the group's size."""
    if not qi_cols:
        raise ValueError("qi_cols must be non-empty")
    if l_threshold < 2:
        raise ValueError("l_threshold must be >= 2")
    return df.groupBy(*qi_cols).agg(
        F.count("*").alias("n"),
        F.countDistinct(sensitive_col).alias("n_distinct_sensitive"),
    ).withColumn(
        "is_diverse", F.col("n_distinct_sensitive") >= l_threshold
    )
