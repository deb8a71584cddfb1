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

from pyspark.sql.datasource import (
    DataSource,
    DataSourceReader,
    DataSourceStreamReader,
    EqualTo,
    GreaterThan,
    GreaterThanOrEqual,
    In,
    InputPartition,
    LessThan,
    LessThanOrEqual,
)

MINUTES_PER_DAY = 1440
PRICE_MOD = 40_000
PRICE_BASE = 10_000
VOL_MOD = 97
STREAM_STEP = 480  # minutes per micro-batch → 2 days drain in 6 batches


def _bar(g: int) -> tuple:
    """Closed-form bar for global minute index g — shared by the batch
    and stream readers so both are oracle-reproducible."""
    px = PRICE_BASE + (g * g * 31 + g * 17) % PRICE_MOD
    vol = (g * 13) % VOL_MOD + 1
    return (g // MINUTES_PER_DAY, g % MINUTES_PER_DAY, float(px), float(px + g % 7), float(vol))


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
            yield _bar(day * MINUTES_PER_DAY + m)


class PrunedDayPartition(InputPartition):
    def __init__(self, day: int, days_planned: int) -> None:
        self.day, self.days_planned = day, days_planned


class PushdownBarsReader(DataSourceReader):
    """Batch reader with FILTER PUSHDOWN (Spark 4.1 ``pushFilters``):
    day-range predicates prune the generated partitions at PLANNING time
    — the Python-data-source analogue of parquet partition pruning, and
    the shape a REST/date-range or JDBC wrapper would use to turn WHERE
    clauses into request parameters.

    Pushdown is made OBSERVABLE THROUGH THE DATA: every emitted row
    carries ``days_planned`` = the number of day partitions planned
    after pruning. If Spark failed to push the day predicates, the
    reader would plan all ``days`` partitions and the column would hold
    the unpruned count — the oracle pins the pruned value, so the
    differential genuinely gates that pushdown happened (a plan-only
    check could pass while the source re-scanned everything).

    Requires ``spark.sql.python.filterPushdown.enabled=true`` (runtime-
    settable SQLConf; the audit query sets it)."""

    def __init__(self, options) -> None:
        self.n_days = int(options.get("days", "4"))
        self.lo, self.hi = 0, self.n_days

    def pushFilters(self, filters):
        rest = []
        for f in filters:
            if isinstance(f, EqualTo) and f.attribute == ("day",):
                self.lo = max(self.lo, int(f.value))
                self.hi = min(self.hi, int(f.value) + 1)
            elif isinstance(f, GreaterThanOrEqual) and f.attribute == ("day",):
                self.lo = max(self.lo, int(f.value))
            elif isinstance(f, GreaterThan) and f.attribute == ("day",):
                self.lo = max(self.lo, int(f.value) + 1)
            elif isinstance(f, LessThan) and f.attribute == ("day",):
                self.hi = min(self.hi, int(f.value))
            elif isinstance(f, LessThanOrEqual) and f.attribute == ("day",):
                self.hi = min(self.hi, int(f.value) + 1)
            elif isinstance(f, In) and f.attribute == ("day",):
                vals = [int(v) for v in f.value]
                self.lo = max(self.lo, min(vals))
                self.hi = min(self.hi, max(vals) + 1)
                # range cover only — membership gaps still need Spark's
                # post-filter, so the In filter is returned as residual
                rest.append(f)
            else:
                rest.append(f)
        return rest

    def partitions(self):
        planned = max(0, self.hi - self.lo)
        if planned == 0:
            return [PrunedDayPartition(-1, 0)]  # contradictory range
        return [PrunedDayPartition(d, planned) for d in range(self.lo, self.hi)]

    def read(self, partition: PrunedDayPartition):
        if partition.day < 0:
            return
        for m in range(MINUTES_PER_DAY):
            day, minute, op, cl, vol = _bar(partition.day * MINUTES_PER_DAY + m)
            yield (day, minute, op, cl, vol, partition.days_planned)


class PushdownBars(DataSource):
    @classmethod
    def name(cls) -> str:
        return "synthetic_bars_pd"

    def schema(self) -> str:
        return (
            "day int, minute int, open double, close double, volume double,"
            " days_planned int"
        )

    def reader(self, schema) -> PushdownBarsReader:
        return PushdownBarsReader(self.options)


class RangePartition(InputPartition):
    def __init__(self, start: int, end: int) -> None:
        self.start, self.end = start, end


class SyntheticBarsStreamReader(DataSourceStreamReader):
    """Streaming face of the same source (Spark 4 DataSourceStreamReader):
    the offset is the global minute index, each micro-batch advances it by
    ``step`` until the configured day count is exhausted — the shape of a
    paginated REST/queue poller.

    Restart semantics: a fresh reader instance starts with ``_cur = 0``,
    but on restart Spark replans from the CHECKPOINTED offset — it calls
    ``partitions(committed_start, latest_end)`` where ``committed_start``
    may be ahead of this instance's counter. ``partitions`` therefore
    fast-forwards ``_cur`` to the committed start and treats an inverted
    range as empty, so already-committed minute ranges are never
    re-emitted (no double-counting); the next ``latestOffset`` resumes
    from the committed position (exactly-once)."""

    def __init__(self, options) -> None:
        self.n_total = int(options.get("days", "2")) * MINUTES_PER_DAY
        self.step = int(options.get("step", str(STREAM_STEP)))
        self._cur = 0

    def initialOffset(self) -> dict:
        return {"m": 0}

    def latestOffset(self) -> dict:
        self._cur = min(self._cur + self.step, self.n_total)
        return {"m": self._cur}

    def partitions(self, start: dict, end: dict):
        # Restart resync: the checkpointed start is authoritative. A
        # just-restarted instance's _cur (and thus latestOffset) can lag
        # it, producing end < start — emit nothing for that batch and
        # fast-forward so the next latestOffset() continues from the
        # committed position instead of re-covering committed ranges.
        lo, hi = start["m"], end["m"]
        self._cur = max(self._cur, lo)
        if hi < lo:
            return [RangePartition(lo, lo)]
        # One partition per covered day-slice keeps task granularity
        # aligned with the batch reader's per-day partitions.
        parts = []
        while lo < hi:
            nxt = min(hi, (lo // MINUTES_PER_DAY + 1) * MINUTES_PER_DAY)
            parts.append(RangePartition(lo, nxt))
            lo = nxt
        return parts or [RangePartition(lo, hi)]

    def read(self, partition: RangePartition):
        for g in range(partition.start, partition.end):
            yield _bar(g)

    def commit(self, end: dict) -> None:
        pass


class SyntheticBars(DataSource):
    @classmethod
    def name(cls) -> str:
        return "synthetic_bars"

    def schema(self) -> str:
        return "day int, minute int, open double, close double, volume double"

    def reader(self, schema) -> SyntheticBarsReader:
        return SyntheticBarsReader(self.options)

    def streamReader(self, schema) -> SyntheticBarsStreamReader:
        return SyntheticBarsStreamReader(self.options)

    def streamWriter(self, schema, overwrite: bool) -> "JsonDirStreamWriter":
        return JsonDirStreamWriter(self.options)

    def writer(self, schema, overwrite: bool) -> "JsonDirWriter":
        # The connector's THIRD face: df.write.format("synthetic_bars")
        # .option("path", dir).save() lands JSON-lines with two-phase
        # commit (JsonDirWriter below).
        return JsonDirWriter(self.options, overwrite)


def register(spark) -> None:
    # Python data source registration binds to the JVM's ACTIVE session,
    # not necessarily the one this handle wraps: any query that ran on a
    # cloned session (spark.newSession(), e.g. aqe_skew_join's conf
    # sandbox) leaves the clone active, and a subsequent register() would
    # silently land there — later lookups on this session then fail with
    # DATA_SOURCE_NOT_FOUND. Pin the active session to this handle first.
    try:
        spark._jvm.org.apache.spark.sql.classic.SparkSession.setActiveSession(
            spark._jsparkSession
        )
    except Exception:  # pragma: no cover — JVM API moved; registration may still work
        pass
    spark.dataSource.register(SyntheticBars)
    spark.dataSource.register(PushdownBars)


# ---------------------------------------------------------------------------
# Writer face: a JSON-lines directory sink with two-phase commit
# ---------------------------------------------------------------------------

from dataclasses import dataclass  # noqa: E402

from pyspark.sql.datasource import (  # noqa: E402
    DataSourceStreamWriter,
    DataSourceWriter,
    WriterCommitMessage,
)


@dataclass
class _FileCommit(WriterCommitMessage):
    tmp_path: str
    n_rows: int


class JsonDirWriter(DataSourceWriter):
    """Executor-side writer: each task streams its partition to a
    UNIQUELY-NAMED temp file, and only the driver-side commit() renames
    the complete set into place and drops a ``_SUCCESS`` manifest —
    the classic two-phase commit that makes task retries and
    speculative duplicates harmless (a failed/duplicate attempt's temp
    file is simply never committed). abort() removes every temp file.
    This is the sink-side mirror of the reader's exactly-once story
    (reference analogue: the Redis processed-set guarding re-inserts,
    reference btc_etl.py:137-147 — here the atomicity is filesystem
    rename, no external state).

    Deployment constraint: write() creates temp files on the executor's
    local disk and commit() renames them driver-side, so the two-phase
    guarantee holds only when driver and executors share one filesystem
    (local mode — this repo's bench target — or a shared mount/NFS). On
    a multi-node cluster, point ``path`` at shared storage or use the
    built-in file sinks, whose commit protocol ships commit messages,
    not paths. ``_SUCCESS`` describes the files of the LATEST commit
    (per-commit manifest semantics, like a streaming sink's per-batch
    log); on append it does not enumerate files from earlier commits."""

    def __init__(self, options, overwrite: bool) -> None:
        self.path = options.get("path")
        if not self.path:
            raise ValueError("option 'path' is required for the jsonl writer")
        self.overwrite = overwrite

    def write(self, iterator):
        import json
        import os
        import uuid

        os.makedirs(self.path, exist_ok=True)
        tmp = os.path.join(self.path, f".part-{uuid.uuid4().hex}.jsonl.tmp")
        n = 0
        with open(tmp, "w") as fh:
            for row in iterator:
                fh.write(json.dumps(row.asDict(), default=str) + "\n")
                n += 1
        return _FileCommit(tmp_path=tmp, n_rows=n)

    def commit(self, messages) -> None:
        import json
        import os

        if self.overwrite:
            for f in os.listdir(self.path):
                if f.endswith(".jsonl"):
                    os.remove(os.path.join(self.path, f))
        manifest = []
        for m in messages:
            # Transform ONLY the basename (".part-<id>.jsonl.tmp" →
            # "part-<id>.jsonl"): a str.replace over the whole path would
            # also rewrite a user-supplied directory that happens to
            # contain ".tmp" or "/.part-", renaming into the wrong place.
            d, base = os.path.dirname(m.tmp_path), os.path.basename(m.tmp_path)
            final = os.path.join(d, base.removeprefix(".").removesuffix(".tmp"))
            os.rename(m.tmp_path, final)
            manifest.append({"file": os.path.basename(final), "rows": m.n_rows})
        with open(os.path.join(self.path, "_SUCCESS"), "w") as fh:
            json.dump({"files": manifest, "total": sum(x["rows"] for x in manifest)}, fh)

    def abort(self, messages) -> None:
        import os

        for m in messages:
            try:
                os.remove(m.tmp_path)
            except OSError:
                pass


class JsonDirStreamWriter(DataSourceStreamWriter):
    """Streaming sink face of the custom source: same executor-side
    temp-file + driver-side rename two-phase commit as JsonDirWriter,
    but per MICRO-BATCH — commit(messages, batchId) renames that
    batch's files into place under a batch prefix and drops a
    ``_SUCCESS_batch<id>`` manifest, so the sink's durable state is an
    append-only sequence of per-batch manifests (the changelog a
    downstream loader tails). A failed batch's attempt files are never
    renamed — replay after restart is idempotent at batch granularity,
    mirroring the checkpointed reader offsets. Same shared-filesystem
    constraint as the batch writer (class doc above)."""

    def __init__(self, options) -> None:
        self.path = options.get("path")
        if not self.path:
            raise ValueError("option 'path' is required for the jsonl stream writer")

    def write(self, iterator):
        import json
        import os
        import uuid

        os.makedirs(self.path, exist_ok=True)
        tmp = os.path.join(self.path, f".part-{uuid.uuid4().hex}.jsonl.tmp")
        n = 0
        with open(tmp, "w") as fh:
            for row in iterator:
                fh.write(json.dumps(row.asDict(), default=str) + "\n")
                n += 1
        return _FileCommit(tmp_path=tmp, n_rows=n)

    def commit(self, messages, batchId: int) -> None:
        import json
        import os

        manifest = []
        for m in messages:
            d, base = os.path.dirname(m.tmp_path), os.path.basename(m.tmp_path)
            final = os.path.join(
                d, f"batch{batchId}-" + base.removeprefix(".").removesuffix(".tmp")
            )
            os.rename(m.tmp_path, final)
            manifest.append({"file": os.path.basename(final), "rows": m.n_rows})
        with open(os.path.join(self.path, f"_SUCCESS_batch{batchId}"), "w") as fh:
            json.dump(
                {"batch": batchId, "files": manifest,
                 "total": sum(x["rows"] for x in manifest)},
                fh,
            )

    def abort(self, messages, batchId: int) -> None:
        import os

        for m in messages:
            try:
                os.remove(m.tmp_path)
            except OSError:
                pass
