"""Dump .explain("formatted") for the named contract queries (and the
kg_pagerank bench composition) to <outdir>/<name>_<tag>.txt.

Usage: python tools/dump_plans.py <outdir> <tag> <query> [query ...]
  (query "kg_pagerank" dumps the bench's pagerank composition)
"""

import contextlib
import io
import sys

sys.path.insert(0, ".")

from pyspark.sql import functions as F  # noqa: E402

from phenobert_spark.config import get_spark  # noqa: E402


def main():
    outdir, tag = sys.argv[1], sys.argv[2]
    names = sys.argv[3:]
    sf_dir = "/root/testdata/sf0.1"
    spark = get_spark(app_name="dump-plans")
    spark.sparkContext.setLogLevel("ERROR")
    from phenobert_spark.plans.contract_queries import QUERIES

    for name in names:
        if name == "kg_pagerank":
            # the operator returns an eagerly-checkpointed RDD (whose
            # explain is a bare RDD scan), so mirror ONE loop-body
            # update of operators/kg_metrics.pagerank here to expose
            # the per-iteration plan the operator repeats
            li = spark.read.parquet(f"{sf_dir}/lineitem.parquet")
            edges = li.select(
                F.concat(F.lit("O"), F.col("l_orderkey")).alias("src"),
                F.concat(F.lit("S"), F.col("l_suppkey")).alias("dst"),
            ).distinct()
            ep = (
                edges.select(F.col("src").alias("_s"), F.col("dst").alias("_t"))
                .repartition("_s")
                .persist()
            )
            deg = ep.groupBy("_s").agg(
                F.count("*").cast("double").alias("_od")
            ).persist()
            nodes = (
                deg.select(F.col("_s").alias("node"))
                .unionByName(ep.select(F.col("_t").alias("node")).distinct())
                .distinct()
                .persist()
            )
            n = float(nodes.count())
            rank = nodes.select("node", F.lit(1.0 / n).alias("rank"))
            w = deg.join(rank.withColumnRenamed("node", "_s"), on="_s").select(
                "_s", (F.col("rank") / F.col("_od")).alias("_w")
            )
            contrib = (
                ep.join(w, on="_s")
                .groupBy(F.col("_t").alias("node"))
                .agg(F.sum("_w").alias("_in"))
            )
            df = nodes.join(contrib, on="node", how="left").select(
                "node",
                (
                    F.lit(0.15 / n)
                    + F.lit(0.85) * F.coalesce(F.col("_in"), F.lit(0.0))
                ).alias("rank"),
            )
        else:
            df = QUERIES[name](spark, sf_dir)
        buf = io.StringIO()
        with contextlib.redirect_stdout(buf):
            df.explain("formatted")
        path = f"{outdir}/{name}_{tag}.txt"
        with open(path, "w") as f:
            f.write(buf.getvalue())
        print("wrote", path)
    spark.stop()


if __name__ == "__main__":
    main()
