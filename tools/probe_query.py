"""Time individual contract queries in one fresh JVM. Two sinks:
``count`` replicates the frozen bench methodology (what the driver
times); ``noop`` (guide §1.4) forces every column + final sort.
Usage:

  python tools/probe_query.py <sf_dir> [count|noop] <query> [query ...]
"""

import sys
import time

sys.path.insert(0, ".")

from pyspark.sql import functions as F  # noqa: E402

from phenobert_spark.config import get_spark  # noqa: E402
from phenobert_spark.plans.contract_queries import QUERIES  # noqa: E402


def main():
    sf_dir = sys.argv[1]
    sink = "count"
    names = sys.argv[2:]
    if names and names[0] in ("count", "noop"):
        sink, names = names[0], names[1:]
    spark = get_spark(app_name="probe-query")
    spark.sparkContext.setLogLevel("ERROR")
    spark.range(1_000_000).select(F.sum("id")).collect()
    for name in names:
        fn = QUERIES[name]
        fn(spark, "/root/testdata/sf0.001").count()  # codegen warm-up
        ts = []
        for i in range(3):
            spark.sparkContext.setJobDescription(f"{name} {sink} rep{i}")
            t0 = time.time()
            df = fn(spark, sf_dir)
            if sink == "noop":
                df.write.format("noop").mode("overwrite").save()
            else:
                df.count()
            ts.append(round(time.time() - t0, 3))
        print(
            {"query": name, "sf": sf_dir, "sink": sink,
             "samples": ts, "min": min(ts)}
        )
    spark.stop()


if __name__ == "__main__":
    main()
