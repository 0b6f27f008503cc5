"""spark-submit entry point: one-pass corpus statistics report.

    spark-submit --master <cluster> --py-files phenobert_spark.zip \
        jobs/corpus_stats.py \
        --input  <documents parquet (doc_id, text, lang, source, n_chars)> \
        --output <dir> \
        [--hll-p 12] [--quantile-bucket 64] [--heavy-hitters 50]

Composes the deterministic-sketch family (operators/sketches.py) into
the daily "what is in this corpus" report a training pipeline runs
before mixing/filtering decisions:

    <output>/distinct_docs/     HLL distinct doc_ids per (lang, source)
    <output>/length_quantiles/  p50/p90/p99 n_chars per lang (histogram)
    <output>/heavy_tokens/      top-K corpus tokens: exact count + CMS
                                estimate side by side (sketch audit)
    <output>/hll_registers/     raw registers per (lang, source) — the
                                MERGEABLE artifact: tomorrow's run (or
                                another cluster's shard) combines by
                                groupBy-max without touching raw keys

Every output is engine-portable (md5-derived hashes, integer cells),
so downstream consumers can re-verify any number in DuckDB/Trino —
the q120/q121/q128 oracles do exactly that on the contract tables.
The whole job is two corpus passes (token explode + doc-level pass);
nothing key-cardinality-sized crosses the wire.
"""

from __future__ import annotations

import argparse

from pyspark.sql import functions as F


def main(argv: list[str] | None = None, spark=None) -> None:
    p = argparse.ArgumentParser()
    p.add_argument("--input", required=True)
    p.add_argument("--output", required=True)
    p.add_argument("--hll-p", type=int, default=12)
    p.add_argument("--quantile-bucket", type=int, default=64)
    p.add_argument("--heavy-hitters", type=int, default=50)
    args = p.parse_args(argv)

    from phenobert_spark.config import get_spark
    from phenobert_spark.operators.sketches import (
        countmin_estimate,
        countmin_table,
        histogram_quantiles,
        hll_distinct,
        hll_registers,
    )
    from phenobert_spark.operators.text import whitespace_tokens

    owns_session = spark is None
    if owns_session:
        spark = get_spark(app_name="corpus-stats")
    docs = spark.read.parquet(args.input)

    regs = hll_registers(docs, "doc_id", ["lang", "source"], p=args.hll_p)
    regs.write.mode("overwrite").parquet(f"{args.output}/hll_registers")
    hll_distinct(docs, "doc_id", ["lang", "source"], p=args.hll_p).write.mode(
        "overwrite"
    ).parquet(f"{args.output}/distinct_docs")

    histogram_quantiles(
        docs, "n_chars", ["lang"], [0.5, 0.9, 0.99],
        bucket_width=args.quantile_bucket,
    ).write.mode("overwrite").parquet(f"{args.output}/length_quantiles")

    toks = docs.select(
        F.explode(whitespace_tokens(F.col("text"))).alias("tok")
    )
    exact = toks.groupBy("tok").agg(
        F.count("*").cast("bigint").alias("exact_n")
    )
    probes = exact.orderBy(F.desc("exact_n"), "tok").limit(
        args.heavy_hitters
    )
    table = countmin_table(toks, "tok", depth=4, width_bits=12)
    est = countmin_estimate(
        table, probes.select("tok"), "tok", depth=4, width_bits=12
    )
    probes.join(est.withColumnRenamed("key", "tok"), on="tok").select(
        "tok", "exact_n", F.col("est").cast("bigint").alias("cms_est")
    ).orderBy(F.desc("exact_n"), "tok").write.mode("overwrite").parquet(
        f"{args.output}/heavy_tokens"
    )

    if owns_session:
        spark.stop()


if __name__ == "__main__":
    main()
