"""Classifier / annotator evaluation: ROC-AUC and Cohen's kappa.

A KG-construction pipeline ships scored decisions everywhere — the
linker's concept scores (linking/infer.py), ER match scores
(entity_resolution.blocked_matches), rule confidences
(kg_metrics.rule-based completion) — and the two evaluation questions
that recur are *"does the score rank positives above negatives?"*
(ROC-AUC, threshold-free) and *"do two annotators / two pipeline
versions agree beyond chance?"* (Cohen's kappa, the standard
inter-annotator statistic for annotation campaigns like the
reference's GSC+ corpus, whose gold labels are themselves
double-annotated; cf. reference evaluation protocol my_evaluate.py).

Scale design
------------
Both metrics reduce to tiny keyed aggregations:

* ``roc_auc`` uses the Mann-Whitney rank identity with midranks for
  ties, but NEVER ranks individual rows: rows are first aggregated to
  DISTINCT SCORE level (map-side combinable ``groupBy(score)``), and
  the single ordered cumulative runs over distinct scores only. At
  100 TB the row count is unbounded but the distinct-score
  cardinality is bounded by the score's precision — quantize scores
  (e.g. round to 1e-6) and the final window is a few-million-row
  single partition at worst, while the 10^12-row pass is a pure
  partial aggregate. This is exactly how the exact-AUC job stays one
  shuffle; a histogram-bucket approximation is NOT needed.
* ``cohen_kappa`` is two marginal counts and one diagonal count —
  three map-side-combinable aggregates and a broadcast-sized join.

Both return 1-row DataFrames with ROUND(…, 6) values so a DuckDB twin
reproduces them bit-for-bit (contract queries q192/q193).
"""

from __future__ import annotations

from pyspark.sql import DataFrame, Window
from pyspark.sql import functions as F


def roc_auc(
    df: DataFrame,
    label_col: str,
    score_col: str,
) -> DataFrame:
    """Exact tie-aware ROC-AUC (Mann-Whitney U with midranks).

    ``label_col``: boolean or 0/1 integer; ``score_col``: any
    orderable numeric. Returns one row
    ``(auc, n_pos, n_neg, n_distinct_scores)`` with ``auc`` rounded
    to 6 places.

    Identity: with midranks ``r_i`` over ascending score,
    ``AUC = (Σ_{i∈pos} r_i − n_pos(n_pos+1)/2) / (n_pos·n_neg)``.
    The midrank of every row in a tied score group is
    ``(#rows below group) + (group size + 1)/2``, so the whole
    statistic is computable from per-score aggregates — no per-row
    rank is ever materialized.
    """
    g = (
        df.select(
            F.col(score_col).alias("_s"),
            F.col(label_col).cast("int").alias("_y"),
        )
        .groupBy("_s")
        .agg(
            F.count("*").alias("_n"),
            F.sum("_y").alias("_np"),
        )
    )
    # Ordered cumulative over DISTINCT scores only. Single partition
    # by construction — acceptable because the input to this window
    # is the aggregated score histogram, not the row set.
    w = Window.orderBy("_s").rowsBetween(Window.unboundedPreceding, -1)
    ranked = g.withColumn("_below", F.coalesce(F.sum("_n").over(w), F.lit(0)))
    out = ranked.agg(
        F.sum(F.col("_np") * (F.col("_below") + (F.col("_n") + 1) / 2.0)).alias(
            "_rpos"
        ),
        F.sum("_np").alias("n_pos"),
        F.sum(F.col("_n") - F.col("_np")).alias("n_neg"),
        F.count("*").alias("n_distinct_scores"),
    )
    return out.select(
        F.round(
            # single-class input (no positives or no negatives) has no
            # defined AUC: report NULL with the counts intact instead
            # of an ANSI divide-by-zero (mirrors cohen_kappa's p_e=1
            # guard).
            F.when(
                F.col("n_pos") * F.col("n_neg") > 0,
                (F.col("_rpos") - F.col("n_pos") * (F.col("n_pos") + 1) / 2.0)
                / (F.col("n_pos") * F.col("n_neg")),
            ),
            6,
        ).alias("auc"),
        F.col("n_pos").cast("long").alias("n_pos"),
        F.col("n_neg").cast("long").alias("n_neg"),
        F.col("n_distinct_scores").cast("long").alias("n_distinct_scores"),
    )


def cohen_kappa(
    df: DataFrame,
    rater_a: str,
    rater_b: str,
) -> DataFrame:
    """Cohen's kappa between two label columns over the same items.

    Returns one row ``(kappa, p_observed, p_expected, n_items)``,
    all rates rounded to 6 places. ``κ = (p_o − p_e)/(1 − p_e)``
    where ``p_e = Σ_l (n_a,l/n)(n_b,l/n)``. Perfect-agreement inputs
    (``p_e = 1``) return kappa NULL rather than 0/0.

    Plan: one count of the agreement diagonal plus two label-marginal
    counts, joined on the label — every aggregate map-side
    combinable, the join broadcast-sized (label-space cardinality).
    """
    pairs = df.select(
        F.col(rater_a).alias("_a"), F.col(rater_b).alias("_b")
    )
    n_and_po = pairs.agg(
        F.count("*").alias("_n"),
        F.sum((F.col("_a") == F.col("_b")).cast("long")).alias("_agree"),
    )
    ma = pairs.groupBy(F.col("_a").alias("_l")).agg(
        F.count("*").alias("_na")
    )
    mb = pairs.groupBy(F.col("_b").alias("_l")).agg(
        F.count("*").alias("_nb")
    )
    pe_num = (
        ma.join(mb, on="_l", how="inner")
        .agg(F.sum(F.col("_na") * F.col("_nb")).alias("_pe_num"))
    )
    out = n_and_po.crossJoin(pe_num).select(
        (F.col("_agree") / F.col("_n")).alias("_po"),
        (F.coalesce(F.col("_pe_num"), F.lit(0)) / (F.col("_n") * F.col("_n"))).alias(
            "_pe"
        ),
        F.col("_n").cast("long").alias("n_items"),
    )
    return out.select(
        F.round(
            F.when(
                F.col("_pe") < 1.0,
                (F.col("_po") - F.col("_pe")) / (1.0 - F.col("_pe")),
            ),
            6,
        ).alias("kappa"),
        F.round("_po", 6).alias("p_observed"),
        F.round("_pe", 6).alias("p_expected"),
        "n_items",
    )
