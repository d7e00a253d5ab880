"""A custom Python DataSource (Spark 4 ``pyspark.sql.datasource`` API):
deterministic synthetic document corpus.

Demonstrates the full custom-source contract — name registration, schema
declaration, option handling, and *partition planning* (the source tells Spark
how to parallelize itself; each ``InputPartition`` is read independently on an
executor). Rows are derived purely from (seed, doc_id) via the portable 60-bit
hash, so the corpus is bit-identical at any parallelism — the same
content-addressed determinism the sampling/sketch operators rely on.

Use cases: load-generation for scale tests without staging files, and a
reference implementation for wrapping real external systems (an HTTP API, a
proprietary store) as first-class Spark relations.

Usage::

    spark.dataSource.register(SyntheticDocsDataSource)
    df = (spark.read.format("synthetic_docs")
          .option("rows", 10_000).option("partitions", 16)
          .option("seed", 7).load())
"""

from __future__ import annotations

import hashlib
from collections.abc import Iterator

from pyspark.sql.datasource import DataSource, DataSourceReader, InputPartition

_WORDS = (
    "data table row column spark query join filter agg scan value part hash "
    "fast slow small large the a of and batch window order line customer"
).split()

_LANGS = ("en", "de", "fr")
_SOURCES = ("web", "wiki", "books")

SCHEMA = "doc_id bigint, text string, lang string, source string, n_chars int"


def _h(seed: int, doc_id: int, salt: str) -> int:
    raw = hashlib.md5(f"{seed}|{doc_id}|{salt}".encode()).hexdigest()[:15]
    return int(raw, 16)


def make_doc(seed: int, doc_id: int) -> tuple[int, str, str, str, int]:
    """Pure function (seed, doc_id) → row; shared by reader and tests."""
    n_words = 5 + _h(seed, doc_id, "len") % 60
    words = [
        _WORDS[_h(seed, doc_id, f"w{j}") % len(_WORDS)] for j in range(n_words)
    ]
    text = " ".join(words)
    lang = _LANGS[_h(seed, doc_id, "lang") % len(_LANGS)]
    source = _SOURCES[_h(seed, doc_id, "src") % len(_SOURCES)]
    return doc_id, text, lang, source, len(text)


class _Partition(InputPartition):
    def __init__(self, start: int, end: int, seed: int):
        self.start, self.end, self.seed = start, end, seed


class SyntheticDocsReader(DataSourceReader):
    def __init__(self, options: dict):
        self.rows = int(options.get("rows", 1000))
        self.num_partitions = int(options.get("partitions", 8))
        self.seed = int(options.get("seed", 42))

    def partitions(self) -> list[InputPartition]:
        n, p = self.rows, max(1, self.num_partitions)
        step = (n + p - 1) // p
        return [
            _Partition(i, min(i + step, n), self.seed) for i in range(0, n, step)
        ]

    def read(self, partition: _Partition) -> Iterator[tuple]:
        for doc_id in range(partition.start, partition.end):
            yield make_doc(partition.seed, doc_id)


class SyntheticDocsDataSource(DataSource):
    @classmethod
    def name(cls) -> str:
        return "synthetic_docs"

    def schema(self) -> str:
        return SCHEMA

    def reader(self, schema) -> SyntheticDocsReader:
        return SyntheticDocsReader(self.options)


# ---------------------------------------------------------------------------
# Streaming flavor: the same corpus as an unbounded micro-batched stream
# ---------------------------------------------------------------------------

try:  # SimpleDataSourceStreamReader: PySpark >= 4.0
    from pyspark.sql.datasource import SimpleDataSourceStreamReader
except ImportError:  # pragma: no cover
    SimpleDataSourceStreamReader = None  # type: ignore[assignment]


if SimpleDataSourceStreamReader is not None:

    class SyntheticDocsStreamReader(SimpleDataSourceStreamReader):
        """Offset-tracked micro-batch reader over the same deterministic
        corpus: the offset is simply the next doc_id, so exactly-once replay
        (``readBetweenOffsets``) is a pure recomputation — the custom-source
        analogue of a replayable log. Emits ``batch_rows`` docs per batch up
        to ``rows`` total, then empty batches."""

        def __init__(self, options: dict):
            self.batch_rows = int(options.get("batch_rows", 100))
            self.max_rows = int(options.get("rows", 1000))
            self.seed = int(options.get("seed", 42))

        def initialOffset(self) -> dict:
            return {"next": 0}

        def read(self, start: dict):
            s = int(start["next"])
            e = min(s + self.batch_rows, self.max_rows)
            rows = iter([make_doc(self.seed, i) for i in range(s, e)])
            return rows, {"next": e}

        def readBetweenOffsets(self, start: dict, end: dict):
            return iter(
                [make_doc(self.seed, i) for i in range(int(start["next"]), int(end["next"]))]
            )

    def _simple_stream_reader(self, schema):  # noqa: ANN001
        return SyntheticDocsStreamReader(self.options)

    SyntheticDocsDataSource.simpleStreamReader = _simple_stream_reader  # type: ignore[attr-defined]
