"""Custom connector surface: a Python DataSource (Spark 4 API).

The reference's only ingress is "S3 object arrives" (reference
lambda/s3_event_handler.py:21-70); a generalized engine also needs a
connector SDK for sources Spark does not ship -- device gateways,
internal APIs, synthetic load. This module registers ``sensor_synthetic``,
a deterministic IoT-reading generator, as a first-class DataSource usable
as ``spark.read.format("sensor_synthetic")`` and
``spark.readStream.format("sensor_synthetic")``.

Scale design: the batch reader splits the requested row range into
``partitions`` input partitions, each generated independently executor-side
(no driver materialization, no skew -- ranges are equal width); the value
function is a pure hash of the global row index, so the dataset is
identical regardless of partition count (asserted in tests). The stream
reader advances a monotone row-index offset per micro-batch and replays
any offset range deterministically, which is exactly the contract Spark's
checkpoint recovery expects of a source.
"""

from __future__ import annotations

import hashlib
from collections.abc import Iterator, Sequence
from datetime import datetime, timedelta, timezone

from pyspark.sql.datasource import (
    DataSource,
    DataSourceReader,
    DataSourceStreamReader,
    InputPartition,
)
from pyspark.sql.types import StructType

SENSOR_DDL = (
    "device_id string, ts timestamp, temperature double, humidity double"
)
_EPOCH = datetime(2026, 1, 1, tzinfo=timezone.utc)


def _reading(i: int, n_devices: int):
    """Pure function row-index -> reading; identical on every executor."""
    h = int(hashlib.md5(f"sensor:{i}".encode()).hexdigest()[:12], 16)
    return (
        f"device-{i % n_devices}",
        (_EPOCH + timedelta(seconds=10 * i)).replace(tzinfo=None),
        round((h % 5000) / 100.0 - 10.0, 2),  # -10.00 .. 39.99 degC
        round((h // 5000) % 10000 / 100.0, 2),  # 0.00 .. 99.99 %RH
    )


class _RangePartition(InputPartition):
    def __init__(self, start: int, end: int):
        self.start = start
        self.end = end


class _SensorBatchReader(DataSourceReader):
    def __init__(self, options):
        self.rows = int(options.get("rows", 1000))
        self.n_parts = int(options.get("partitions", 8))
        self.n_devices = int(options.get("devices", 25))
        self.lo = 0
        self.hi = self.rows

    def pushFilters(self, filters):
        """Native pushdown (Spark 4.1 connector API): ``ts`` comparisons
        invert to row-index bounds (ts = epoch + 10s*i), so the generator
        never produces the pruned range -- the connector analogue of
        parquet row-group pruning. Every filter is also returned, letting
        Spark re-apply it post-scan: pruning stays a pure optimization
        and boundary semantics cannot drift.
        """
        from pyspark.sql.datasource import (
            EqualTo,
            GreaterThan,
            GreaterThanOrEqual,
            LessThan,
            LessThanOrEqual,
        )

        bound_types = (
            GreaterThan,
            GreaterThanOrEqual,
            LessThan,
            LessThanOrEqual,
            EqualTo,
        )
        for f in filters:
            # other shapes arrive too (IsNotNull, ...) -- ignore them
            if getattr(f, "attribute", None) != ("ts",) or not isinstance(
                f, bound_types
            ):
                continue
            idx = (f.value.replace(tzinfo=timezone.utc) - _EPOCH) / timedelta(
                seconds=10
            )
            if isinstance(f, (GreaterThan, GreaterThanOrEqual)):
                self.lo = max(self.lo, int(idx))
            if isinstance(f, (LessThan, LessThanOrEqual, EqualTo)):
                self.hi = min(self.hi, int(idx) + 2)
            if isinstance(f, EqualTo):
                self.lo = max(self.lo, int(idx))
        return filters  # Spark re-evaluates everything post-scan

    def partitions(self) -> Sequence[InputPartition]:
        lo, hi = self.lo, max(self.lo, self.hi)
        n = hi - lo
        if n == 0:
            return [_RangePartition(0, 0)]
        step = max(1, -(-n // self.n_parts))
        return [
            _RangePartition(s, min(s + step, hi))
            for s in range(lo, hi, step)
        ]

    def read(self, partition: _RangePartition) -> Iterator[tuple]:
        for i in range(partition.start, partition.end):
            yield _reading(i, self.n_devices)


class _SensorStreamReader(DataSourceStreamReader):
    """Micro-batch offsets are row indices; every range replays exactly."""

    def __init__(self, options):
        self.n_devices = int(options.get("devices", 25))
        self.batch_rows = int(options.get("rowsPerBatch", 100))
        self._offset = 0

    def initialOffset(self):
        return {"index": 0}

    def latestOffset(self):
        self._offset += self.batch_rows
        return {"index": self._offset}

    def partitions(self, start, end) -> Sequence[InputPartition]:
        return [_RangePartition(start["index"], end["index"])]

    def read(self, partition: _RangePartition) -> Iterator[tuple]:
        for i in range(partition.start, partition.end):
            yield _reading(i, self.n_devices)

    def commit(self, end) -> None:
        pass


class SensorSyntheticDataSource(DataSource):
    """``format("sensor_synthetic")``: options rows, partitions, devices,
    rowsPerBatch (stream)."""

    @classmethod
    def name(cls) -> str:
        return "sensor_synthetic"

    def schema(self) -> str:
        return SENSOR_DDL

    def reader(self, schema: StructType) -> DataSourceReader:
        return _SensorBatchReader(self.options)

    def streamReader(self, schema: StructType) -> DataSourceStreamReader:
        return _SensorStreamReader(self.options)


def register_sensor_source(spark) -> None:
    spark.dataSource.register(SensorSyntheticDataSource)
