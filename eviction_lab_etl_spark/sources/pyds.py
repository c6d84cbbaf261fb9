"""Custom connector via the Python Data Source API (Spark 4, SPARK-44076).

The reference ingests from bespoke sources (census CSV endpoints, generated
fixtures) through hand-rolled scripts; the warehouse-native equivalent is a
first-class CONNECTOR: a ``DataSource`` subclass whose reader declares its
own input partitions and yields rows per partition, giving Spark a real
distributed scan (one task per partition, no driver materialization) over
any system Python can reach. This module demonstrates the full surface with
a deterministic synthetic-telemetry source — the generation rule is pure
arithmetic on the global row index, so a SQL oracle can state the expected
content exactly and the driver can value-hash a custom connector the same
way it hashes a parquet scan.

At 100 TB the same shape holds: ``partitions()`` returns one split per
shard/file/offset-range of the external system and each task pulls only its
split. The rows cross into the JVM through Arrow batches (the API's
transport), not row-at-a-time pickling.
"""

from __future__ import annotations

from pyspark.sql.datasource import DataSource, DataSourceReader, InputPartition


class SyntheticTelemetrySource(DataSource):
    """``spark.read.format("synthetic_telemetry")`` — options:
    ``shards`` (input partitions) and ``rows`` (rows per shard).

    Row rule for global index i: (event_id=i, shard=i div rows,
    value=(i*i) mod 97) — deterministic, partition-independent content.
    """

    @classmethod
    def name(cls) -> str:
        return "synthetic_telemetry"

    def schema(self) -> str:
        return "event_id bigint, shard int, value bigint"

    def reader(self, schema) -> "SyntheticTelemetryReader":
        return SyntheticTelemetryReader(
            shards=int(self.options.get("shards", 8)),
            rows=int(self.options.get("rows", 1000)),
        )


class SyntheticTelemetryReader(DataSourceReader):
    def __init__(self, shards: int, rows: int) -> None:
        self.shards = shards
        self.rows = rows

    def partitions(self):  # one Spark task per shard
        return [InputPartition(s) for s in range(self.shards)]

    def read(self, partition: InputPartition):
        base = partition.value * self.rows
        for k in range(self.rows):
            i = base + k
            yield (i, partition.value, (i * i) % 97)


def register(spark) -> None:
    """Idempotent per-session registration (driver sessions arrive bare)."""
    spark.dataSource.register(SyntheticTelemetrySource)
