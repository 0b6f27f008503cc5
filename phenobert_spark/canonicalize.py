"""Canonicalization (SURVEY.md §2.3 J2, §2.2 F4; reference
eval_all.py:105-118, util.py:319-323).

* alt-id -> canonical id: broadcast left join + coalesce,
* phenotypic-abnormality subtree filter: broadcast semi-join,
* optional ancestor-redundancy dedup: drop a (doc, hpo) triple whose
  hpo is a strict ancestor of another hpo emitted for the same doc
  (closure semi-join; SURVEY.md §7.2 step 5).
"""

from __future__ import annotations

from pyspark.sql import DataFrame, SparkSession
from pyspark.sql import functions as F

from .ontology import Ontology


def _alt_df(spark: SparkSession, onto: Ontology) -> DataFrame:
    rows = sorted(onto.alt_ids.items())
    return spark.createDataFrame(rows or [("__none__", "__none__")], "alt STRING, canon STRING")


def canonicalize_ids(
    df: DataFrame, spark: SparkSession, onto: Ontology, col: str = "hpo_id"
) -> DataFrame:
    alt = F.broadcast(_alt_df(spark, onto))
    return (
        df.join(alt, df[col] == alt["alt"], "left")
        .withColumn(col, F.coalesce(F.col("canon"), F.col(col)))
        .drop("alt", "canon")
    )


def filter_abnormal(
    df: DataFrame, spark: SparkSession, onto: Ontology, col: str = "hpo_id"
) -> DataFrame:
    """Keep only ids under HP:0000118 (root excluded), the reference's
    phenotypic_abnormalityNT gate (util.py:1050)."""
    members = spark.createDataFrame(
        [(h,) for h in sorted(onto.abnormal_set)], f"{col}: string"
    )
    return df.join(F.broadcast(members), on=col, how="left_semi")


def drop_redundant_ancestors(
    triples: DataFrame, spark: SparkSession, onto: Ontology
) -> DataFrame:
    """Optional KG cleanup: if a doc asserts both X and an ancestor of X,
    drop the ancestor (the more specific concept subsumes it)."""
    anc_rows = [
        (node, anc)
        for node, ancs in sorted(onto.ancestors().items())
        for anc in sorted(ancs)
        if anc != node
    ]
    if not anc_rows:
        return triples
    anc = F.broadcast(
        spark.createDataFrame(anc_rows, "node STRING, anc STRING")
    )
    specific = (
        triples.select("doc_id", F.col("hpo_id").alias("node"))
        .distinct()
        .join(anc, on="node")
        .select("doc_id", F.col("anc").alias("hpo_id"))
        .distinct()
    )
    return triples.join(specific, on=["doc_id", "hpo_id"], how="left_anti")
