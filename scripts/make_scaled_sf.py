"""Build an sf-N* measurement dataset by deterministic replication of a
driver-generated sf directory (default: sf0.1 x 10 -> "sf1" in /tmp).

Purpose: scaling-exponent evidence ABOVE the largest driver-provided scale
(BASELINE.md "scale evidence" table). The driver's generator is not
available, so this replicates its sf0.1 output with per-replica key
remapping chosen so the WORKLOAD SHAPE scales the way a real 10x corpus
would, rather than creating degenerate duplicates:

- ``documents``: every replica r > 0 salts the words at positions
  ≡ 0 (mod 7) with the replica index. ~1/7 of words change, so 5-shingle
  Jaccard between a doc and its replica is ~0.29 — far below the dedup
  thresholds. Replicas are therefore NEW documents (vocabulary and
  shingle space grow like a larger crawl), not near-duplicates; without
  this, exact 10x copies would inflate every LSH bucket 10x and the
  pair stage 100x, poisoning the scaling measurement.
- ``embeddings``: vectors are rolled by r positions (norm and coordinate
  distribution preserved, cosine neighborhoods genuinely new).
- ``customer``: keys offset per replica; names regenerated from the new
  key in the original ``Customer#%09d`` format so the entity-resolution
  blocking-key distribution (name prefix x nation) keeps its per-block
  sizes instead of collapsing replicas into shared blocks.
- ``orders``/``lineitem``/``part``/``events``: keys offset per replica
  (custkey/orderkey/partkey consistently, so joins and the co-purchase
  graph scale as 10 disjoint copies); dates, amounts, and categorical
  columns untouched, so per-day/per-brand densities grow 10x like real
  traffic.
- ``region``/``nation``/``supplier``: dimensions stay 1x (as TPC-H
  scales nation/region).

Usage:  python scripts/make_scaled_sf.py [--factor 10] [--src
/root/testdata/sf0.1] [--out /tmp/sf1]
"""

from __future__ import annotations

import argparse
import os
import shutil

import numpy as np
import pyarrow as pa
import pyarrow.compute as pc
import pyarrow.parquet as pq


def _salt_text(text: str, r: int) -> str:
    words = text.split()
    return " ".join(
        f"{w}{r}" if i % 7 == 0 else w for i, w in enumerate(words)
    )


def scale_documents(src: str, out: str, factor: int) -> None:
    t = pq.read_table(src)
    n = t.num_rows
    off = int(pc.max(t["doc_id"]).as_py()) + 1
    parts = [t]
    texts = t["text"].to_pylist()
    for r in range(1, factor):
        parts.append(
            pa.table(
                {
                    "doc_id": pc.add(t["doc_id"], r * off),
                    "text": pa.array([_salt_text(x, r) for x in texts]),
                    "lang": t["lang"],
                    "source": t["source"],
                    "n_chars": t["n_chars"],
                }
            )
        )
    pq.write_table(pa.concat_tables(parts), out)


def scale_embeddings(src: str, out: str, factor: int) -> None:
    t = pq.read_table(src)
    off = int(pc.max(t["vec_id"]).as_py()) + 1
    vecs = np.array(t["embedding"].to_pylist(), dtype=np.float32)
    parts = [t]
    for r in range(1, factor):
        parts.append(
            pa.table(
                {
                    "vec_id": pc.add(t["vec_id"], r * off),
                    "embedding": pa.array(
                        list(np.roll(vecs, r, axis=1)),
                        type=t.schema.field("embedding").type,
                    ),
                    "label": t["label"],
                }
            )
        )
    pq.write_table(pa.concat_tables(parts), out)


def scale_customer(src: str, out: str, factor: int) -> None:
    t = pq.read_table(src)
    off = int(pc.max(t["c_custkey"]).as_py()) + 1
    parts = [t]
    for r in range(1, factor):
        keys = pc.add(t["c_custkey"], r * off)
        names = pa.array([f"Customer#{int(k):09d}" for k in keys.to_pylist()])
        parts.append(
            pa.table(
                {
                    "c_custkey": keys,
                    "c_name": names,
                    "c_nationkey": t["c_nationkey"],
                    "c_acctbal": t["c_acctbal"],
                    "c_mktsegment": t["c_mktsegment"],
                }
            )
        )
    pq.write_table(pa.concat_tables(parts), out)


def scale_keyed(
    src: str, out: str, factor: int, offsets: dict[str, int]
) -> None:
    """Replicate with per-column key offsets; all other columns repeat."""
    t = pq.read_table(src)
    parts = [t]
    for r in range(1, factor):
        cols = {}
        for name in t.column_names:
            col = t[name]
            cols[name] = pc.add(col, r * offsets[name]) if name in offsets else col
        parts.append(pa.table(cols))
    pq.write_table(pa.concat_tables(parts), out)


def main() -> None:
    ap = argparse.ArgumentParser()
    ap.add_argument("--factor", type=int, default=10)
    ap.add_argument("--src", default="/root/testdata/sf0.1")
    ap.add_argument("--out", default="/tmp/sf1")
    a = ap.parse_args()
    os.makedirs(a.out, exist_ok=True)

    def p(name: str, d: str) -> str:
        return os.path.join(d, f"{name}.parquet")

    import duckdb

    maxes = {
        n: duckdb.sql(
            f"SELECT CAST(MAX({k}) AS BIGINT) FROM '{p(n, a.src)}'"
        ).fetchone()[0]
        + 1
        for n, k in [
            ("orders", "o_orderkey"),
            ("customer", "c_custkey"),
            ("part", "p_partkey"),
            ("events", "event_id"),
        ]
    }
    umax = (
        duckdb.sql(
            f"SELECT CAST(MAX(user_id) AS BIGINT) FROM '{p('events', a.src)}'"
        ).fetchone()[0]
        + 1
    )

    scale_documents(p("documents", a.src), p("documents", a.out), a.factor)
    scale_embeddings(p("embeddings", a.src), p("embeddings", a.out), a.factor)
    scale_customer(p("customer", a.src), p("customer", a.out), a.factor)
    scale_keyed(
        p("orders", a.src), p("orders", a.out), a.factor,
        {"o_orderkey": maxes["orders"], "o_custkey": maxes["customer"]},
    )
    scale_keyed(
        p("lineitem", a.src), p("lineitem", a.out), a.factor,
        {"l_orderkey": maxes["orders"], "l_partkey": maxes["part"]},
    )
    scale_keyed(
        p("part", a.src), p("part", a.out), a.factor,
        {"p_partkey": maxes["part"]},
    )
    scale_keyed(
        p("events", a.src), p("events", a.out), a.factor,
        {"event_id": maxes["events"], "user_id": umax},
    )
    for dim in ("region", "nation", "supplier"):
        shutil.copyfile(p(dim, a.src), p(dim, a.out))
    for n in (
        "documents embeddings customer orders lineitem part events "
        "region nation supplier"
    ).split():
        print(n, pq.read_metadata(p(n, a.out)).num_rows)


if __name__ == "__main__":
    main()
