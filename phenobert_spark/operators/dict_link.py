"""Step-1 dictionary entity linking (SURVEY.md §2.3 J1; reference
``matchPhrase2HPO`` util.py:409-421 applied at util.py:1044-1052).

Two broadcast hash joins against the ontology surface-form dimension:

1. exact sorted-bag key,
2. lemma-fallback key for the misses,
3. stemmed-key tier for the remaining misses (``coalesce`` of the
   three; morphological-variant extension beyond the reference).

The dictionary is ~48.6k rows (BASELINE.md) — a textbook broadcast
dimension; Catalyst plans both joins as BroadcastHashJoin with zero
shuffle. Matched rows carry score 1.0 (util.py:1052).
"""

from __future__ import annotations

from pyspark.sql import DataFrame
from pyspark.sql import functions as F


def dictionary_link(candidates: DataFrame, dict_df: DataFrame) -> DataFrame:
    """candidates(key, lemma_key, ...) x dict(key, hpo_id, prio) ->
    + columns (hpo_id nullable, score nullable).

    A key can appear once in dict_df (unique by construction). The
    strict-key match wins; lemma-key match fills the misses — the exact
    composition of the reference's two-probe lookup.
    """
    d1 = F.broadcast(
        dict_df.filter(F.col("prio") <= 1).select(
            F.col("key").alias("_k1"), F.col("hpo_id").alias("_h1")
        )
    )
    d2 = F.broadcast(
        dict_df.filter(F.col("prio") <= 1).select(
            F.col("key").alias("_k2"), F.col("hpo_id").alias("_h2")
        )
    )
    d3 = F.broadcast(
        dict_df.filter(F.col("prio") == 2).select(
            F.col("key").alias("_k3"), F.col("hpo_id").alias("_h3")
        )
    )
    # prio 3: synonym-substituted variant keys in lemma space (mined
    # from same-concept surface forms, ontology.synonym_pairs) — probed
    # by the same lemma_key column, one more broadcast hash join.
    d4 = F.broadcast(
        dict_df.filter(F.col("prio") == 3).select(
            F.col("key").alias("_k4"), F.col("hpo_id").alias("_h4")
        )
    )
    out = (
        candidates.join(d1, F.col("key") == F.col("_k1"), "left")
        .join(d2, F.col("lemma_key") == F.col("_k2"), "left")
        .join(d3, F.col("stem_key") == F.col("_k3"), "left")
        .join(d4, F.col("lemma_key") == F.col("_k4"), "left")
        .withColumn(
            "hpo_id",
            F.coalesce(F.col("_h1"), F.col("_h2"), F.col("_h3"), F.col("_h4")),
        )
        .withColumn(
            "score",
            F.when(F.coalesce(F.col("_h1"), F.col("_h2")).isNotNull(), F.lit(1.0))
            .when(F.col("_h3").isNotNull(), F.lit(0.9))
            .when(F.col("_h4").isNotNull(), F.lit(0.85))
            .cast("double"),
        )
        .drop("_k1", "_h1", "_k2", "_h2", "_k3", "_h3", "_k4", "_h4")
    )
    return out
