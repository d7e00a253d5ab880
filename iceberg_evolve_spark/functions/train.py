"""In-engine model TRAINING, bit-reproducibly — the batch perceptron.

Training-data pipelines do not just *apply* quality classifiers, they TRAIN
them on the corpus (CCNet trains a fastText LM-quality classifier; Llama-style
recipes train fastText/logistic filters on curated-vs-crawl labels). This
module runs that training step inside the engine, in arithmetic exact enough
that an unrolled SQL oracle replays every round's weights bit-for-bit — the
same discipline as the fixed-point PageRank (`graph.py`) and the hash-gated
BPE trainer (`text.py`).

The model is the batch perceptron (Rosenblatt 1958; batch variant: one update
per EPOCH from the sum of misclassified examples):

    margin_i = Σ_j x_ij · w_j          (integers — no learning rate, no scale)
    mistake  = y_i · margin_i <= 0     (y ∈ {-1, +1}; ties count as mistakes)
    w_j ← w_j + Σ_{mistakes} y_i · x_ij

Chosen over gradient descent ON PURPOSE: perceptron updates are pure integer
sums — no learning-rate float, no normalization, no rounding mode — so the
result is independent of partitioning and identical across engines. (It only
converges when the data is linearly separable; for a quality/language filter
the per-round mistake count IS the readout, and a fixed round count is the
contract, as with `label_propagation`.)

Scale shape per round: ONE map-side-combined aggregation over the feature
relation (8 conditional sums + a count), with the current weights folded into
the plan as literals (the `docs_model_score` trick — the model rides in
codegen, the data is never joined against it). The 8 scalars per round cross
the driver exactly like PageRank's convergence scalar: bounded, 9 values.
At 100 TB each epoch is one scan — the map-side combine means the shuffle
carries 9 numbers per task, nothing else.

Overflow: |margin| ≤ d · max|x| · max|w|; weights grow at most by
Σ_mistakes |x| per round. All sums are carried as DECIMAL(38,0) inside the
aggregation and cast back to BIGINT — callers keep features small (clamped
counts), as the oracle replays the same arithmetic in HUGEINT.
"""

from __future__ import annotations

from pyspark.sql import DataFrame
from pyspark.sql import functions as F


def perceptron_train(
    features: DataFrame,
    feature_cols: list[str],
    label_col: str,
    rounds: int = 4,
) -> list[dict]:
    """Train a batch perceptron on ``features`` (integer feature columns,
    label in {-1, +1}). Returns one dict per round:
    ``{"round", "n_mistakes", "w": [w_j AFTER the round's update]}``.

    ``n_mistakes`` is evaluated under the weights the round STARTED with, so
    round 1 reports the zero-weight mistake count (= all rows, since
    y·0 <= 0) — the same convention the SQL oracle unrolls.
    """
    d = len(feature_cols)
    w = [0] * d
    out: list[dict] = []
    features = features.persist()
    try:
        for r in range(1, rounds + 1):
            margin = None
            for j, c in enumerate(feature_cols):
                term = F.col(c).cast("decimal(38,0)") * F.lit(w[j]).cast(
                    "decimal(38,0)"
                )
                margin = term if margin is None else margin + term
            mis = (F.col(label_col).cast("decimal(38,0)") * margin) <= 0
            aggs = [
                F.sum(
                    F.when(
                        mis,
                        F.col(label_col).cast("decimal(38,0)")
                        * F.col(c).cast("decimal(38,0)"),
                    ).otherwise(F.lit(0).cast("decimal(38,0)"))
                ).alias(f"d{j}")
                for j, c in enumerate(feature_cols)
            ]
            aggs.append(F.sum(mis.cast("long")).alias("n_mistakes"))
            # Loud-failure guard: under Spark's non-ANSI mode a per-row
            # DECIMAL(38,0) overflow in the margin yields NULL, which would
            # make `mis` NULL and silently count the row as correctly
            # classified while the HUGEINT oracle keeps computing. Count
            # NULL margins (a null feature value nulls the margin the same
            # way — also a contract violation) and refuse.
            aggs.append(
                F.sum(margin.isNull().cast("long")).alias("_null_margins")
            )
            row = features.agg(*aggs).first()  # 10 scalars cross the driver
            if int(row["_null_margins"] or 0) != 0:
                raise ArithmeticError(
                    f"round {r}: {row['_null_margins']} rows have NULL "
                    "margins (DECIMAL(38,0) overflow or NULL features) — "
                    "results would silently diverge from exact arithmetic; "
                    "clamp feature magnitudes"
                )
            w = [w[j] + int(row[f"d{j}"]) for j in range(d)]
            out.append(
                {"round": r, "n_mistakes": int(row["n_mistakes"]), "w": list(w)}
            )
    finally:
        features.unpersist()
    return out


def perceptron_unrolled_sql(
    features_cte: str, feature_cols: list[str], rounds: int = 4
) -> str:
    """DuckDB oracle twin: the same rounds unrolled as chained CTEs.
    ``features_cte`` must produce the integer ``feature_cols`` plus a ``y``
    column in {-1, +1}. Emits one row per round:
    (round, n_mistakes, w0..w{d-1}) — weights AFTER the round's update,
    mistakes BEFORE it, matching :func:`perceptron_train`.

    Every CTE is MATERIALIZED: each weight CTE is referenced twice (by the
    next round's delta aggregate and the next weight update), so an inlining
    planner would re-evaluate the whole prior-round chain 2^rounds times
    (the k-core lesson, `graph.py:k_core_unrolled_sql`)."""
    d = len(feature_cols)
    parts = [f"pt_f AS MATERIALIZED (SELECT * FROM ({features_cte}))"]
    parts.append(
        "pt_w0 AS MATERIALIZED (SELECT "
        + ", ".join(f"CAST(0 AS HUGEINT) AS w{j}" for j in range(d))
        + ")"
    )
    for r in range(1, rounds + 1):
        margin = " + ".join(
            f"CAST(f.{c} AS HUGEINT) * w.w{j}"
            for j, c in enumerate(feature_cols)
        )
        deltas = ", ".join(
            f"CAST(SUM(CASE WHEN CAST(f.y AS HUGEINT) * ({margin}) <= 0 "
            f"THEN CAST(f.y AS HUGEINT) * CAST(f.{c} AS HUGEINT) "
            f"ELSE 0 END) AS HUGEINT) AS d{j}"
            for j, c in enumerate(feature_cols)
        )
        parts.append(
            f"""pt_r{r} AS MATERIALIZED (
  SELECT {deltas},
         CAST(SUM(CASE WHEN CAST(f.y AS HUGEINT) * ({margin}) <= 0
                       THEN 1 ELSE 0 END) AS BIGINT) AS n_mistakes
  FROM pt_f f, pt_w{r - 1} w)"""
        )
        parts.append(
            f"pt_w{r} AS MATERIALIZED (SELECT "
            + ", ".join(
                f"w.w{j} + r.d{j} AS w{j}" for j in range(d)
            )
            + f" FROM pt_w{r - 1} w, pt_r{r} r)"
        )
    selects = [
        (
            f"SELECT {r} AS round, r.n_mistakes, "
            + ", ".join(f"CAST(w.w{j} AS BIGINT) AS w{j}" for j in range(d))
            + f" FROM pt_r{r} r, pt_w{r} w"
        )
        for r in range(1, rounds + 1)
    ]
    return (
        "WITH "
        + ",\n".join(parts)
        + "\n"
        + "\nUNION ALL\n".join(selects)
        + "\nORDER BY round"
    )
