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

from pyspark.sql import DataFrame
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
    # Parse ONCE behind its own projection: selecting the four fields straight
    # off the ``from_json`` expression would let projection collapse inline a
    # separate full parse per field (and predicate pushdown inline more copies
    # into downstream filters — measured 7 parses per row in the CDC entry's
    # executed plan). CollapseProject refuses to substitute a non-cheap
    # expression referenced more than once, so the two-step select keeps
    # exactly one JsonToStructs per row; the field accesses below are plain
    # GetStructField over the parsed attribute.
    parsed = raw.select(env.alias("_env"))
    return parsed.select(
        F.col("_env.op").alias("op"),
        F.col("_env.ts_ms").alias("ts_ms"),
        F.col("_env.before").alias("before"),
        F.col("_env.after").alias("after"),
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
    op = F.col("op")
    # Envelope eligibility: a recognized op, and — for c/u — a parseable
    # after payload (an envelope whose after failed to parse must not upsert
    # a ghost row of NULLs; route it to dead-letter upstream). Folded into
    # the argmax below as a WHEN → NULL (``max`` skips nulls) instead of a
    # pre-aggregation filter: a filter here would be pushed below the parse
    # projection and re-inline the full JSON parse once per predicate
    # (measured 7 parses per row in the executed plan; now exactly 1).
    eligible = op.isin("c", "u", "d") & ((op == "d") | F.col("after").isNotNull())
    keyed = changes.select(
        F.coalesce(F.col(f"after.{key}"), F.col(f"before.{key}")).alias("_k"),
        F.when(
            eligible,
            # ordering fields first: per key the greatest (ts_ms, is-delete,
            # op) wins — the exact ordering the previous window sorted by —
            # with the payload riding along as the struct tail
            F.struct(
                F.col("ts_ms"),
                (op == "d").cast("int").alias("_d"),
                op,
                F.col("after"),
            ),
        ).alias("_cand"),
    )
    # Last change per key as a MAP-SIDE-COMBINABLE argmax: partial
    # aggregation ships one candidate per key per map task instead of
    # shuffling + sorting every envelope, and — unlike the earlier window +
    # anti-join + union shape, which referenced this subtree twice — the
    # whole envelope pipeline (including its JSON parse) is evaluated
    # exactly ONCE because the merge below is a single full-outer join.
    # Keys whose envelopes were ALL ineligible aggregate to NULL and are
    # dropped, matching the previous filter semantics.
    last = (
        keyed.groupBy("_k")
        .agg(F.max("_cand").alias("_m"))
        .filter(F.col("_m").isNotNull())
        .select(
            "_k",
            F.struct(
                F.col("_m.op").alias("op"), F.col("_m.after").alias("after")
            ).alias("_ch"),
        )
    )
    cols = snapshot.columns
    # One key-partitioned full-outer merge: unmatched snapshot rows pass
    # through, c/u changes take the after payload (whether or not the key
    # existed), d drops the key. Row-for-row identical to the previous
    # survivors ∪ upserts formulation.
    merged = snapshot.join(last, snapshot[key] == last["_k"], "full_outer")
    ch = last["_ch"]
    changed = ch.isNotNull()
    return merged.filter(~changed | (ch.getField("op") != "d")).select(
        *[
            F.when(changed, ch.getField("after").getField(c))
            .otherwise(snapshot[c])
            .alias(c)
            for c in cols
        ]
    )
