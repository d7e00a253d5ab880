"""CDC envelope ingestion — Debezium-style change events applied to a
snapshot.

A CDC feed delivers JSON envelopes ``{op: c|u|d, ts_ms, after: {...},
before: {...}}`` per changed row. Ingestion = parse (typed, JVM-side
``from_json`` — malformed envelopes surface as NULL structs, never a task
crash), reduce to the LAST change per key (event-time, deterministic
tie-break), then one key-partitioned merge against the snapshot:
upserts override, deletes drop, unchanged rows pass through.

Scale shape: the envelope stream aggregates to one row per CHANGED key
before the snapshot is touched (map-side combinable argmax); the merge is
one full-outer join on the snapshot's own key — the day's CDC volume,
not the table, sets the cost. Composes with ``operators/scd.py``'s
``scd2_apply_changes`` when history (not just current state) is
maintained.

The reference repo evolves SCHEMAS between snapshots; this module evolves
the DATA between snapshots — same loop, other half.
"""

from __future__ import annotations

from pyspark.sql import Column, DataFrame, Window
from pyspark.sql import functions as F
from pyspark.sql import types as T


def cdc_envelope_schema(row_schema: T.StructType) -> T.StructType:
    """The envelope type for a given row payload type."""
    return T.StructType(
        [
            T.StructField("op", T.StringType()),
            T.StructField("ts_ms", T.LongType()),
            T.StructField("before", row_schema),
            T.StructField("after", row_schema),
        ]
    )


def parse_cdc_envelopes(
    raw: DataFrame, json_col: str, row_schema: T.StructType
) -> DataFrame:
    """Typed parse of JSON envelopes → (op, ts_ms, before, after) columns.
    Unparseable rows yield NULL op and can be routed to a dead-letter sink
    (the ``read_json_quarantine`` discipline)."""
    env = F.from_json(F.col(json_col), cdc_envelope_schema(row_schema))
    return raw.select(
        env["op"].alias("op"),
        env["ts_ms"].alias("ts_ms"),
        env["before"].alias("before"),
        env["after"].alias("after"),
    )


def apply_cdc(
    snapshot: DataFrame,
    changes: DataFrame,
    key: str,
) -> DataFrame:
    """Apply parsed CDC changes to a snapshot (current-state semantics).

    ``changes`` must carry (op, ts_ms, before, after) as produced by
    :func:`parse_cdc_envelopes`. Per key, the change with the highest
    ``ts_ms`` wins (ties: delete beats upsert — the conservative order,
    then larger op string for totality). c/u upsert ``after``; d deletes.
    Returns the post-change snapshot with the snapshot's schema."""
    keyed = (
        changes.select(
            F.coalesce(F.col(f"after.{key}"), F.col(f"before.{key}")).alias("_k"),
            "op",
            "ts_ms",
            "after",
        )
        .filter(F.col("op").isin("c", "u", "d"))
        # a c/u envelope whose after payload failed to parse must not
        # upsert a ghost row of NULLs — route it to dead-letter upstream
        .filter((F.col("op") == "d") | F.col("after").isNotNull())
    )
    w = Window.partitionBy("_k").orderBy(
        F.col("ts_ms").desc(),
        (F.col("op") == "d").cast("int").desc(),
        F.col("op").desc(),
    )
    last = (
        keyed.withColumn("_rn", F.row_number().over(w))
        .filter(F.col("_rn") == 1)
        .drop("_rn")
    )
    cols = snapshot.columns
    upserts = last.filter(F.col("op") != "d").select(
        *[F.col(f"after.{c}").alias(c) for c in cols]
    )
    touched = last.select(F.col("_k").alias(key))
    survivors = snapshot.join(touched, key, "left_anti")
    return survivors.unionByName(upserts)
