"""SparkSession factory with the settings this engine assumes.

Key choices (and why they matter at 100 TB):

* AQE on — runtime coalescing of shuffle partitions, skew-join splitting.
* ``spark.sql.session.timeZone=UTC`` — deterministic timestamp semantics across
  engines (the DuckDB oracle compares timestamp values).
* shuffle partitions default sized for the local harness; a real cluster sets
  this to ~2-3× total cores (or relies on AQE coalescing from a high initial
  value).
* Arrow enabled for the Pandas-UDF (multimodal) path with a bounded batch size
  so MB-scale binary payloads can't blow an executor.
"""

from __future__ import annotations

import os

from pyspark.sql import SparkSession


def get_session(
    app_name: str = "iceberg-evolve-spark",
    master: str | None = None,
    shuffle_partitions: int | None = None,
) -> SparkSession:
    cpus = os.environ.get("SPARK_GRAFT_CPUS", "32")
    master = master or f"local[{cpus}]"
    shuffle_partitions = shuffle_partitions or int(cpus)
    return (
        SparkSession.builder.master(master)
        .appName(app_name)
        # local[N] runs driver and executors in ONE JVM: the default 1g heap
        # that is fine at sf0.1 collapses into GC thrash at sf1 (32 threads
        # sharing shuffle/codegen buffers). The box has 128 GiB; 16g is the
        # measured knee — parts_pagerank at sf1 went >560 s (GCLocker
        # retries) on the default and 29.7 s at 16g. Only effective at JVM
        # launch; a pre-existing session keeps its heap.
        .config(
            "spark.driver.memory",
            os.environ.get("SPARK_GRAFT_DRIVER_MEM", "16g"),
        )
        .config("spark.sql.shuffle.partitions", str(shuffle_partitions))
        .config("spark.sql.session.timeZone", "UTC")
        .config("spark.sql.adaptive.enabled", "true")
        .config("spark.sql.adaptive.coalescePartitions.enabled", "true")
        .config("spark.sql.adaptive.skewJoin.enabled", "true")
        .config("spark.sql.execution.arrow.pyspark.enabled", "true")
        .config("spark.sql.execution.arrow.maxRecordsPerBatch", "4096")
        .config("spark.sql.parquet.filterPushdown", "true")
        # events.parquet stores ts as TIMESTAMP(NANOS); Spark can't read nanos
        # natively — read as long, converted in load_table (TESTDATA quirk)
        .config("spark.sql.legacy.parquet.nanosAsLong", "true")
        .config("spark.ui.enabled", "false")
        .getOrCreate()
    )
