"""Custom Python Data Source (Spark 4 ``pyspark.sql.datasource`` API).

The modern way to plug a non-file system into Spark from Python: the engine
asks the source for its schema and partition list, then calls ``read`` ONCE
PER PARTITION on executors — so a Python source parallelizes like any scan
instead of funneling through the driver (the reference's psycopg2 loop
shape). This source generates a deterministic keyed stream from a
multiplicative hash, so its output is exactly reproducible in SQL — making
a *custom Python data source* oracle-checkable, not just demo-able.

At scale: partition count is an option (default 8); each partition yields
its own id range lazily (generator — rows never materialize as a list), so
the source behaves like a splittable input format.
"""

from __future__ import annotations

from pyspark.sql.datasource import DataSource, DataSourceReader, InputPartition

#: Knuth multiplicative constant — the per-id hash both engines replay.
_MULT = 2654435761
_MOD = 2**32


class DeterministicRangeDataSource(DataSource):
    """``spark.read.format("deterministic_range").option("n", …)``."""

    @classmethod
    def name(cls) -> str:
        return "deterministic_range"

    def schema(self) -> str:
        return "id BIGINT, bucket INT, score DOUBLE"

    def reader(self, schema) -> "_Reader":
        return _Reader(self.options)


class _Reader(DataSourceReader):
    def __init__(self, options) -> None:
        self.n = int(options.get("n", 1000))
        self.n_parts = int(options.get("partitions", 8))

    def partitions(self):
        return [InputPartition(i) for i in range(self.n_parts)]

    def read(self, partition):
        i = partition.value
        lo = i * self.n // self.n_parts
        hi = (i + 1) * self.n // self.n_parts
        for rid in range(lo, hi):
            h = (rid * _MULT) % _MOD
            yield (rid, h % 7, (h % 1000) / 100.0)


def register(spark) -> None:
    """Idempotent registration on the session."""
    spark.dataSource.register(DeterministicRangeDataSource)
