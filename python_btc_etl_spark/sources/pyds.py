"""Custom Python Data Source (Spark 4 DataSource API): a deterministic
synthetic minute-bar generator.

The reference's only source is a directory of CSV files (reference
btc_etl.py:104-134); this shows the engine's source surface is
EXTENSIBLE — the same API would wrap an exchange REST endpoint, a
message queue, or a proprietary format. The generator is seedless and
closed-form (values are pure functions of the global minute index), so
the DuckDB oracle reproduces every row with the same integer
arithmetic — the source itself is differentially testable.

Scale notes:
- ``partitions()`` returns one InputPartition per day → Spark schedules
  each day as an independent task; a 100 TB equivalent (an API with a
  date-range endpoint) parallelizes identically;
- the reader yields plain tuples; Arrow RecordBatches are the upgrade
  path for wide/high-volume sources;
- all values derive from int64 math (no floats in the generator state),
  so there is no cross-partition or cross-engine drift.
"""

from __future__ import annotations

from pyspark.sql.datasource import DataSource, DataSourceReader, InputPartition

MINUTES_PER_DAY = 1440
PRICE_MOD = 40_000
PRICE_BASE = 10_000
VOL_MOD = 97


class DayPartition(InputPartition):
    def __init__(self, day: int) -> None:
        self.day = day


class SyntheticBarsReader(DataSourceReader):
    def __init__(self, options) -> None:
        self.n_days = int(options.get("days", "2"))

    def partitions(self):
        return [DayPartition(d) for d in range(self.n_days)]

    def read(self, partition: DayPartition):
        day = partition.day
        for m in range(MINUTES_PER_DAY):
            g = day * MINUTES_PER_DAY + m  # global minute index
            # closed-form int64 "price walk": deterministic, engine-agnostic
            px = PRICE_BASE + (g * g * 31 + g * 17) % PRICE_MOD
            vol = (g * 13) % VOL_MOD + 1
            yield (day, m, float(px), float(px + g % 7), float(vol))


class SyntheticBars(DataSource):
    @classmethod
    def name(cls) -> str:
        return "synthetic_bars"

    def schema(self) -> str:
        return "day int, minute int, open double, close double, volume double"

    def reader(self, schema) -> SyntheticBarsReader:
        return SyntheticBarsReader(self.options)


def register(spark) -> None:
    spark.dataSource.register(SyntheticBars)
