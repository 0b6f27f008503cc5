"""kg_pagerank phase breakdown (guide §1): time the edge-distinct
feed, the pagerank setup, and the iterations separately; dump the
per-iteration join plan to check for redundant exchanges.

Usage: python tools/probe_pagerank.py [sf_dir] [mode]
"""

import sys
import time

sys.path.insert(0, ".")

from pyspark.sql import functions as F  # noqa: E402

from phenobert_spark.config import get_spark  # noqa: E402
from phenobert_spark.operators.kg_metrics import pagerank  # noqa: E402


def main():
    sf_dir = sys.argv[1] if len(sys.argv) > 1 else "/root/testdata/sf0.1"
    spark = get_spark(app_name="probe-pagerank")
    spark.sparkContext.setLogLevel("ERROR")
    spark.range(1_000_000).select(F.sum("id")).collect()

    li = spark.read.parquet(f"{sf_dir}/lineitem.parquet")
    kg_edges = li.select(
        F.concat(F.lit("O"), F.col("l_orderkey")).alias("src"),
        F.concat(F.lit("S"), F.col("l_suppkey")).alias("dst"),
    ).distinct()

    pagerank(kg_edges.limit(1000), iters=1).count()  # warm-up

    for rep in range(3):
        t0 = time.time()
        kg_edges.write.format("noop").mode("overwrite").save()
        t1 = time.time()
        pagerank(kg_edges, iters=3).count()
        t2 = time.time()
        print(
            {
                "rep": rep,
                "edges_distinct_only": round(t1 - t0, 3),
                "pagerank_total": round(t2 - t1, 3),
            }
        )
    spark.stop()


if __name__ == "__main__":
    main()
