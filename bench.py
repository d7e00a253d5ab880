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

# Every queries() entry, in registry order — the whole contract surface is
# benchmarked so per-round comparisons cover every operator.
HEADLINE = [
    "q1_pricing_summary",
    "q3_shipping_priority",
    "q5_local_supplier_volume",
    "q6_forecast_revenue",
    "q4_priority_semijoin",
    "q7_nation_volume",
    "q10_returned_items",
    "q12_priority_by_flag",
    "q14_promo_share",
    "q15_top_supplier",
    "q18_large_orders",
    "q19_bracket_revenue",
    "orders_rollup",
    "customers_without_orders",
    "nation_distinct_counts",
    "parts_above_brand_avg",
    "daily_revenue_moving_avg",
    "customer_balance_quartiles",
    "orders_pivot_priority",
    "balance_order_setops",
    "totalprice_percentiles",
    "asof_latest_order",
    "range_join_click_views",
    "events_time_rollup",
    "events_funnel",
    "orders_geomean",
    "doc_token_chunks",
    "top_orders_per_customer",
    "events_sessionize",
    "events_hourly_counts",
    "events_json_kpis",
    "dedup_exact",
    "dedup_ngram_jaccard",
    "dedup_minhash_signatures",
    "dedup_minhash_lsh",
    "dedup_simhash",
    "dedup_embedding_cosine",
    "ann_topk_bruteforce",
    "ann_topk_ivf",
    "text_stats",
    "lang_id",
    "doc_fingerprint",
    "bpe_token_counts",
    "multimodal_features",
    "merge_customer_updates",
    "q22_dormant_rich_customers",
    "nation_revenue_share",
    "cheapest_supplier_per_part",
    "schema_of_lineitem",
    "schema_diff_by_name",
    "evolve_users_diff",
    "evolve_users_plan",
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

    # warmup: touch all tables + codegen paths once; also fit a 3-row KMeans so
    # one-time MLlib class loading isn't billed to the IVF query
    run("q1_pricing_summary")
    from pyspark.ml.clustering import KMeans
    from pyspark.ml.functions import array_to_vector
    from pyspark.sql import functions as F

    tiny = spark.createDataFrame(
        [([0.0, 0.0],), ([1.0, 1.0],), ([2.0, 2.0],)], "v array<double>"
    ).select(array_to_vector(F.col("v")).alias("features"))
    KMeans(k=2, seed=1, maxIter=1).fit(tiny)

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
