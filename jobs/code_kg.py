"""spark-submit entry point: the CODE-corpus knowledge graph — the
structural layer a source-repository corpus carries alongside the
flagship phenotype triples (jobs/annotate_corpus.py).

    spark-submit --master <cluster> --py-files phenobert_spark.zip \
        jobs/code_kg.py \
        --input  <documents source: Iceberg table | parquet | dir> \
        --output <dir> \
        [--pr-iters 5] [--vocab-top 1000]

From the ``documents(repo, path, commit, lang, content)`` table it
materializes, in one pass family:

    <output>/import_edges/   (repo, path, lang, module) file-level
                             dependency triples — (file, imports,
                             module) — mined by the q194-verified
                             per-language regex extraction
    <output>/module_rollup/  (repo, root, n_files, n_imports) —
                             repo -> dependency-root rollup, the node
                             table of the repo/dependency KG layer
    <output>/module_pagerank/ centrality over the repo->root
                             dependency graph (fixed-iteration,
                             q113-verified arithmetic): which
                             dependencies the corpus actually pivots
                             on — license contamination and
                             supply-chain blast-radius ranking
    <output>/identifier_vocab/ top --vocab-top identifier subtokens
                             (q195-verified splitter): vocab
                             construction input for code models
    <output>/licenses/       per-repo license rollup (q174-verified
                             detector) joined with each repo's
                             dependency count — the compliance view
    <output>/summary/        one-row profile (files, repos, edge and
                             module counts)

Scale shape: extraction and identifier splitting are map-only Column
algebra over the 10^12-file scan (zero Python, zero shuffle); every
rollup shuffles on its natural key with map-side combine; the
PageRank loop joins rank onto the repo->root edge table, whose
cardinality is repos x distinct-roots — metadata-sized next to the
corpus. The only corpus-sized shuffle in the whole job is the edge
distinct, keyed on the edge itself.
"""

from __future__ import annotations

import argparse

from pyspark.sql import functions as F


def main(argv: list[str] | None = None, spark=None) -> None:
    p = argparse.ArgumentParser()
    p.add_argument("--input", required=True)
    p.add_argument("--output", required=True)
    p.add_argument("--pr-iters", type=int, default=5)
    p.add_argument("--vocab-top", type=int, default=1000)
    args = p.parse_args(argv)

    from phenobert_spark.config import get_spark
    from phenobert_spark.operators.code_analysis import (
        extract_import_edges,
        identifier_vocab,
        import_rollup,
    )
    from phenobert_spark.operators.kg_metrics import pagerank
    from phenobert_spark.operators.license import license_rollup
    from phenobert_spark.sources.tables import read_documents

    owns_session = spark is None
    if owns_session:
        spark = get_spark(app_name="code-kg")

    docs = read_documents(spark, args.input)

    edges = extract_import_edges(docs).localCheckpoint(eager=False)
    edges.write.mode("overwrite").parquet(f"{args.output}/import_edges")

    rollup = import_rollup(edges).localCheckpoint(eager=False)
    rollup.write.mode("overwrite").parquet(f"{args.output}/module_rollup")

    dep_graph = rollup.select(
        F.col("repo").alias("src"), F.col("root").alias("dst")
    )
    pagerank(dep_graph, iters=args.pr_iters).write.mode(
        "overwrite"
    ).parquet(f"{args.output}/module_pagerank")

    vocab = (
        identifier_vocab(docs)
        .orderBy(F.desc("n"), "token")
        .limit(args.vocab_top)
    )
    vocab.write.mode("overwrite").parquet(f"{args.output}/identifier_vocab")

    deps_per_repo = rollup.groupBy("repo").agg(
        F.count("*").alias("n_dependency_roots")
    )
    lic = (
        license_rollup(docs)
        .join(deps_per_repo, on="repo", how="left")
        .fillna({"n_dependency_roots": 0})
    )
    lic.write.mode("overwrite").parquet(f"{args.output}/licenses")

    summary = (
        docs.agg(
            F.count("*").alias("n_files"),
            F.countDistinct("repo").alias("n_repos"),
        )
        .crossJoin(
            edges.agg(
                F.count("*").alias("n_import_edges"),
                F.countDistinct("module").alias("n_modules"),
            )
        )
    )
    summary.write.mode("overwrite").parquet(f"{args.output}/summary")

    if owns_session:
        spark.stop()


if __name__ == "__main__":
    main()
