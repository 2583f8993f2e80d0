"""Custom Python DataSource (Spark 4 `pyspark.sql.datasource` API)
exposing the synthetic order generator as a first-class format:

    register_synthetic_source(spark)
    spark.read.format("synthetic_orders").option("n", 1000).load()
    spark.readStream.format("synthetic_orders").option("rowsPerBatch", 50).load()

This is the idiomatic Spark-4 answer to the reference's producer
(SURVEY.md §2.1 S3, producer.py:98-154): instead of a driver-side loop
publishing to a broker, the source IS the generator — batch reads are
partitioned `InputPartition` ranges that executors fill independently,
and the streaming variant keeps offset state exactly like a Kafka
source would (initial/latest offset, replayable ranges — the §2.6 F1
offset-bookkeeping contract, here owned by the engine's checkpoint).

Value derivation is the pure-Python twin of sources/generator.py's
JVM expressions — same sha256 hash family, same rounding — asserted
bit-identical in tests/test_python_datasource.py, so every routing /
aggregation result is independent of which generator produced the rows.

Scale posture: batch partitions are (start, end) ranges — 1000
executors fill 1000 disjoint ranges with zero coordination. The stream
reader is the partition-parallel `DataSourceStreamReader` flavor
(round-9 upgrade from the driver-side `SimpleDataSourceStreamReader`):
the driver only advances a scalar offset in `latestOffset()`; each
microbatch's [start, end) row range is split into `numPartitions`
disjoint sub-ranges that EXECUTORS fill independently — no row is ever
generated driver-side, which removes the last driver-side ingest from
the tree and is the same planning shape a real Kafka source uses
(offsets on the driver, data on the executors).
"""

from __future__ import annotations

import hashlib
from decimal import ROUND_HALF_UP, Decimal

from pyspark.sql.datasource import (
    DataSource,
    DataSourceReader,
    DataSourceStreamReader,
    InputPartition,
)

from .generator import _WORDS

_SCHEMA = "orderId string, product string, price float"


def _sha_hex(s: str) -> str:
    return hashlib.sha256(s.encode()).hexdigest()


def _order_tuple(row_id: int, seed: int) -> tuple[str, str, float]:
    """Pure-Python twin of generator._order_columns for one row id.

    Must stay bit-identical to the JVM derivation:
    - key hash -> uuid4-shaped id from fixed hex substrings
    - word index = first 7 hex chars of sha256(salt || key) mod len(WORDS)
    - price = round_half_up(u * 1495 + 5, 2) as float32, where
      u = first 8 hex chars of sha256('price:' || key) / 2^32
    """
    key = f"seed{seed}:{row_id}"
    kh = _sha_hex(key)
    order_id = "-".join([kh[0:8], kh[8:12], kh[12:16], kh[16:20], kh[20:32]])

    def word(salt: str) -> str:
        return _WORDS[int(_sha_hex(salt + key)[:7], 16) % len(_WORDS)]

    u = int(_sha_hex("price:" + key)[:8], 16) / 4294967296.0
    raw = u * (1500.0 - 5.0) + 5.0
    # Spark's round(double, 2) is BigDecimal HALF_UP on the exact binary
    # expansion; Decimal(float) reproduces that exactly (python round()
    # would banker's-round and drift on ties)
    price = float(Decimal(raw).quantize(Decimal("0.01"), rounding=ROUND_HALF_UP))
    return (order_id, f"{word('w1:')} {word('w2:')}", price)


class _RangePartition(InputPartition):
    def __init__(self, start: int, end: int):
        self.start = start
        self.end = end


class _SyntheticOrdersBatchReader(DataSourceReader):
    def __init__(self, options):
        self.n = int(options.get("n", 15))
        self.seed = int(options.get("seed", 42))
        self.num_partitions = int(options.get("numPartitions", 8))

    def partitions(self):
        k = max(1, min(self.num_partitions, self.n or 1))
        step = (self.n + k - 1) // k if self.n else 1
        return [
            _RangePartition(i, min(i + step, self.n)) for i in range(0, self.n, step)
        ] or [_RangePartition(0, 0)]

    def read(self, partition: _RangePartition):
        for row_id in range(partition.start, partition.end):
            yield _order_tuple(row_id, self.seed)


class _SyntheticOrdersStreamReader(DataSourceStreamReader):
    """Partition-parallel offset-tracked stream: offset = next row id to
    emit (the same ``{"next": N}`` JSON shape as the earlier
    SimpleDataSourceStreamReader, so existing checkpoints replay).

    The driver advances the scalar offset by ``rowsPerBatch`` per
    trigger in ``latestOffset()``; ``partitions(start, end)`` splits the
    microbatch's row range into ``numPartitions`` disjoint sub-ranges;
    ``read(partition)`` runs ON EXECUTORS and regenerates rows as a pure
    function of row id — so replay of any committed range is identical
    by construction (the at-least-once story the reference implements by
    hand with Kafka commits, consumer.py:179-191), and no data is ever
    produced driver-side."""

    def __init__(self, options):
        self.seed = int(options.get("seed", 42))
        self.rows_per_batch = int(options.get("rowsPerBatch", 50))
        self.num_partitions = int(options.get("numPartitions", 4))
        self._latest = 0

    def initialOffset(self):
        return {"next": 0}

    def latestOffset(self):
        self._latest += self.rows_per_batch
        return {"next": self._latest}

    def partitions(self, start: dict, end: dict):
        first, last = int(start["next"]), int(end["next"])
        # Restart recovery: on resume the engine re-plans the offset
        # log's last batch BEFORE calling latestOffset() (the same
        # contract pyspark's _SimpleStreamReaderWrapper documents and
        # relies on), so a fresh reader learns the checkpointed
        # frontier here — without this, latestOffset() would restart
        # from 0 and re-emit every range as it caught back up
        # (measured: 100 duplicate rows in the restart probe).
        self._latest = max(self._latest, last)
        if last <= first:
            return []
        k = max(1, min(self.num_partitions, last - first))
        step = (last - first + k - 1) // k
        return [
            _RangePartition(i, min(i + step, last))
            for i in range(first, last, step)
        ]

    def read(self, partition: _RangePartition):
        for row_id in range(partition.start, partition.end):
            yield _order_tuple(row_id, self.seed)

    def commit(self, end: dict) -> None:
        # a restarted query resumes from the checkpointed offset; make
        # sure latestOffset() never runs backwards from a committed end
        self._latest = max(self._latest, int(end["next"]))


class SyntheticOrdersDataSource(DataSource):
    @classmethod
    def name(cls) -> str:
        return "synthetic_orders"

    def schema(self) -> str:
        return _SCHEMA

    def reader(self, schema):
        return _SyntheticOrdersBatchReader(self.options)

    def streamReader(self, schema):
        return _SyntheticOrdersStreamReader(self.options)


def register_synthetic_source(spark) -> None:
    """Register the format with this session.

    Ships the package zip for executor workers AND registers this
    module for pickle-by-value: the streaming source planner runs in a
    separate driver-side Python worker (python_streaming_source_runner)
    that does not see addPyFile paths, so the reader classes must be
    self-contained in the pickle stream. This module only references
    stdlib + pyspark + its own globals (_WORDS is imported into this
    namespace), so by-value serialization is complete."""
    import sys

    from pyspark import cloudpickle

    from ..shipping import ship_package

    ship_package(spark)
    cloudpickle.register_pickle_by_value(sys.modules[__name__])
    spark.dataSource.register(SyntheticOrdersDataSource)
