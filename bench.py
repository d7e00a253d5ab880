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

HEADLINE = [
    "q1_pricing_summary",
    "q3_shipping_priority",
    "q5_local_supplier_volume",
    "q6_forecast_revenue",
    "top_orders_per_customer",
    "events_sessionize",
    "events_hourly_counts",
    "events_json_kpis",
    "dedup_exact",
    "dedup_ngram_jaccard",
    "dedup_minhash_lsh",
    "dedup_simhash",
    "dedup_embedding_cosine",
    "ann_topk_bruteforce",
    "text_stats",
    "lang_id",
    "doc_fingerprint",
    "bpe_token_counts",
    "multimodal_features",
    "migrate_customer",
]


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

    # warmup: touch all tables + codegen paths once
    run("q1_pricing_summary")

    timings: dict[str, float] = {}
    for name in HEADLINE:
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
