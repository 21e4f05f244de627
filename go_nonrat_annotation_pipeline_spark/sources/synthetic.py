"""Custom Python Data Source (Spark 4 DataSource API): a deterministic
synthetic-corpus generator — `spark.read.format("synthetic_docs")`.

Why a generator source: load-testing the corpus operators (dedup,
chunking, packing) at arbitrary scale without materializing input —
the source IS the scale knob. Design points that make it cluster-real:

- **Partition-parallel**: `partitions()` splits the id range into
  `numPartitions` `InputPartition`s; every executor generates its slice
  independently — no driver bottleneck, no storage.
- **Deterministic per row, independent of partitioning**: doc content
  is a pure function of doc_id (splitmix64-style mixing), so any
  partitioning/retry/speculative re-run produces identical data.
- **Arrow-batched**: `read()` yields pyarrow RecordBatches (the fast
  path — tuple-yield would cross Python row-at-a-time).
"""

from __future__ import annotations

from pyspark.sql.datasource import (
    DataSource,
    DataSourceReader,
    InputPartition,
    SimpleDataSourceStreamReader,
)

_VOCAB = [
    "spark", "scan", "join", "hash", "sort", "merge", "batch", "stream",
    "window", "table", "order", "key", "part", "dup", "small", "fast",
]
_LANGS = ["en", "es", "de", "fr"]
_MASK = (1 << 64) - 1


def _mix(x: int) -> int:
    """splitmix64 finalizer — avalanche a counter into 64 pseudo-random
    bits (public-domain constant set)."""
    x = (x + 0x9E3779B97F4A7C15) & _MASK
    x = ((x ^ (x >> 30)) * 0xBF58476D1CE4E5B9) & _MASK
    x = ((x ^ (x >> 27)) * 0x94D049BB133111EB) & _MASK
    return x ^ (x >> 31)


def make_doc(doc_id: int) -> tuple[int, str, str, str, int]:
    h = _mix(doc_id)
    n_words = 8 + (h & 31)
    words = [
        _VOCAB[_mix(doc_id * 64 + i) % len(_VOCAB)] for i in range(n_words)
    ]
    text = " ".join(words)
    return (
        doc_id,
        text,
        _LANGS[(h >> 8) % len(_LANGS)],
        f"src{(h >> 16) % 5}",
        len(text),
    )


class _IdRange(InputPartition):
    def __init__(self, start: int, end: int):
        self.start, self.end = start, end


class SyntheticDocsReader(DataSourceReader):
    def __init__(self, options):
        self.rows = int(options.get("rows", 1000))
        self.num_partitions = int(options.get("numPartitions", 8))

    def partitions(self):
        step = max(1, -(-self.rows // self.num_partitions))
        return [
            _IdRange(i, min(i + step, self.rows))
            for i in range(0, self.rows, step)
        ]

    def read(self, partition: _IdRange):
        import pyarrow as pa

        batch = 4096
        for lo in range(partition.start, partition.end, batch):
            hi = min(lo + batch, partition.end)
            cols = list(zip(*(make_doc(i) for i in range(lo, hi))))
            yield pa.record_batch(
                [
                    pa.array(cols[0], pa.int64()),
                    pa.array(cols[1], pa.string()),
                    pa.array(cols[2], pa.string()),
                    pa.array(cols[3], pa.string()),
                    pa.array(cols[4], pa.int64()),
                ],
                names=["doc_id", "text", "lang", "source", "n_chars"],
            )


class SyntheticDocsStreamReader(SimpleDataSourceStreamReader):
    """Bounded micro-batch stream over the same deterministic corpus:
    offset = next doc_id; each batch advances by `rowsPerBatch` until
    `rows`. Restart-safe — a replayed offset range regenerates identical
    rows (the same exactly-once contract a file/Kafka source gives a
    deterministic topic)."""

    def __init__(self, options):
        self.rows = int(options.get("rows", 1000))
        self.per_batch = int(options.get("rowsPerBatch", 250))

    def initialOffset(self):
        return {"next": 0}

    def read(self, start):
        lo = start["next"]
        hi = min(lo + self.per_batch, self.rows)
        # a list ITERATOR: the runtime calls next() on it (prefetch
        # cache) and pickles the rest — generators can't pickle, lists
        # aren't iterators; iter(list) satisfies both
        return iter([make_doc(i) for i in range(lo, hi)]), {"next": hi}

    def readBetweenOffsets(self, start, end):
        return iter([make_doc(i) for i in range(start["next"], end["next"])])


class SyntheticDocsDataSource(DataSource):
    @classmethod
    def name(cls) -> str:
        return "synthetic_docs"

    def schema(self) -> str:
        return (
            "doc_id bigint, text string, lang string, source string, "
            "n_chars bigint"
        )

    def reader(self, schema) -> SyntheticDocsReader:
        return SyntheticDocsReader(self.options)

    def simpleStreamReader(self, schema) -> SyntheticDocsStreamReader:
        return SyntheticDocsStreamReader(self.options)


def register(spark) -> None:
    spark.dataSource.register(SyntheticDocsDataSource)
