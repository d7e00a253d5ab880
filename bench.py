"""Benchmark harness: runs the headline queries at $SPARK_GRAFT_SF_DIR (default
sf0.1) on local[$SPARK_GRAFT_CPUS] and prints ONE JSON line.

Execution uses the noop sink (full pipeline runs, nothing returned to the
driver) so timings measure the engine, not result transfer. One warm query
first so JVM/codegen warmup isn't billed to the first measured query.
"""

from __future__ import annotations

import json
import os
import sys
import time

sys.path.insert(0, os.path.dirname(os.path.abspath(__file__)))

SF_DIR = os.environ.get("SPARK_GRAFT_SF_DIR", "/root/testdata/sf0.1")
CPUS = os.environ.get("SPARK_GRAFT_CPUS", "32")

# The whole contract surface is benchmarked — every queries() entry, in
# registry order — so per-round comparisons cover every operator and a newly
# registered query can never be silently missing from the bench.


def main() -> None:
    os.environ["SPARK_GRAFT_CPUS"] = CPUS
    from iceberg_evolve_spark.sources import get_session
    import __spark_entry__ as entry_mod

    spark = get_session(app_name="iceberg-evolve-spark-bench")
    spark.sparkContext.setLogLevel("ERROR")

    qs = entry_mod.queries()

    def run(name: str) -> float:
        t0 = time.time()
        qs[name](spark, SF_DIR).write.format("noop").mode("overwrite").save()
        return time.time() - t0

    # warmup: touch all tables + codegen paths once; also fit a 3-row KMeans so
    # one-time MLlib class loading isn't billed to the IVF query. The
    # documents/embeddings scans + shingle/hash codegen get the same treatment
    # (the registry rotation means a dedup query now runs first and would
    # otherwise absorb every first-touch cost).
    run("q1_pricing_summary")
    run("dedup_minhash_signatures")
    run("ann_topk_bruteforce")
    from pyspark.ml.clustering import KMeans
    from pyspark.ml.functions import array_to_vector
    from pyspark.sql import functions as F

    tiny = spark.createDataFrame(
        [([0.0, 0.0],), ([1.0, 1.0],), ([2.0, 2.0],)], "v array<double>"
    ).select(array_to_vector(F.col("v")).alias("features"))
    KMeans(k=2, seed=1, maxIter=1).fit(tiny)
    # ... and spawn one Arrow Python worker per core (interpreter + pandas
    # import is a one-time cost; without this the first WIDE mapInPandas query
    # gets billed ~30 cold starts)
    spark.range(0, int(CPUS), 1, int(CPUS)).mapInPandas(
        lambda it: it, "id long"
    ).write.format("noop").mode("overwrite").save()

    timings: dict[str, float] = {}
    for name in qs:
        timings[name] = round(run(name), 3)

    total = round(sum(timings.values()), 3)
    sf = SF_DIR.rstrip("/").split("sf")[-1]
    print(
        json.dumps(
            {
                "metric": "headline_queries_total",
                "value": total,
                "unit": "sec",
                "queries": timings,
                "sf": float(sf),
                "cpus": int(CPUS),
            }
        )
    )
    spark.stop()


if __name__ == "__main__":
    main()
