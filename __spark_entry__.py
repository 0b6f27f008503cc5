"""Driver contract for the spark-graft builder (PySpark target).

``entry(spark)`` runs the flagship KG-construction pipeline (documents
-> (doc_id, has_phenotype, HPO:ID) triples) over the sf0.001 documents
table mapped into the engine's corpus schema, plus the deterministic
fixture corpus so the result always contains real triples.

``queries()`` / ``oracle_sql()`` expose the operator registry in
``phenobert_spark/plans/contract_queries.py`` (SURVEY.md §2 coverage;
each Spark implementation paired with a DuckDB-runnable ANSI oracle).
"""

from __future__ import annotations

from collections.abc import Callable

from pyspark.sql import DataFrame, SparkSession


def entry(spark: SparkSession) -> DataFrame:
    """Flagship query on /root/testdata/sf0.001: the full annotation
    pipeline (skew-chunked candidate generation -> broadcast dictionary
    linking -> span dedup -> canonicalized triples)."""
    from pyspark.sql import functions as F

    from phenobert_spark.config import PipelineConfig
    from phenobert_spark.corpus import DOCUMENTS_SCHEMA, synthesize_corpus
    from phenobert_spark.ontology import get_ontology
    from phenobert_spark.pipeline import annotate

    onto = get_ontology()
    raw = spark.read.parquet("/root/testdata/sf0.001/documents.parquet")
    docs = raw.select(
        F.lit("testdata").alias("repo"),
        F.concat(F.lit("doc_"), F.col("doc_id")).alias("path"),
        F.lit("0" * 40).alias("commit"),
        F.col("lang"),
        F.col("text").alias("content"),
    )
    fixture_docs, _ = synthesize_corpus(spark, onto, n_docs=10)
    all_docs = docs.unionByName(fixture_docs)
    return annotate(spark, all_docs, onto, PipelineConfig())


def queries() -> dict[str, Callable[[SparkSession, str], DataFrame]]:
    from phenobert_spark.plans.contract_queries import QUERIES

    return dict(QUERIES)


def oracle_sql() -> dict[str, str]:
    from phenobert_spark.plans.contract_queries import ORACLES

    return dict(ORACLES)
