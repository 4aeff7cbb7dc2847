"""Spark 4 Python Data Source: a deterministic synthetic-log source
with partition planning and predicate pushdown.

The newest extension surface in the engine (pyspark.sql.datasource):
a custom source written in pure Python that still behaves like a real
table — it reports its own InputPartitions (so Spark schedules one task
per split, exactly like a file source) and accepts pushed filters (so a
``level = 'ERROR'`` predicate is evaluated inside the generator instead
of materializing every row and filtering after the exchange).

Why it matters at 100 TB: the Python Data Source API is how a bespoke
internal format (a proprietary log store, an RPC-backed catalog, a
feature service) joins the lake without a JVM connector. The two
properties demonstrated here — split planning and filter pushdown —
are precisely the ones that decide whether such a source scales or
serializes through one task and ships unfiltered bytes.

Rows are a closed-form function of (partition, offset), so tests can
assert exact contents; no randomness, no state.
"""

from __future__ import annotations

from pyspark.sql.datasource import (
    DataSource,
    DataSourceReader,
    EqualTo,
    InputPartition,
)
from pyspark.sql.types import StructType

_LEVELS = ("DEBUG", "INFO", "WARN", "ERROR")

SCHEMA_DDL = "log_id bigint, part int, level string, msg string"


def row_at(part: int, offset: int, rows_per_part: int):
    """The closed-form row: deterministic, restatable by any oracle."""
    log_id = part * rows_per_part + offset
    level = _LEVELS[(log_id * 7) % len(_LEVELS)]
    return (log_id, part, level, f"event-{log_id % 100}")


class _SynthLogPartition(InputPartition):
    def __init__(self, part: int, rows: int):
        self.part = part
        self.rows = rows


class SynthLogReader(DataSourceReader):
    def __init__(self, options):
        self.rows_per_part = int(options.get("rows_per_part", "100"))
        self.num_parts = int(options.get("partitions", "4"))
        self.level_eq: str | None = None  # set by pushFilters

    def pushFilters(self, filters):
        """Accept ``level = <lit>`` equality; everything else stays with
        Spark. Returning the unsupported remainder is the contract —
        Spark re-applies those post-scan, so pushdown can never change
        results, only where the work happens."""
        remaining = []
        for f in filters:
            if (
                isinstance(f, EqualTo)
                and f.attribute == ("level",)
                and self.level_eq is None
            ):
                self.level_eq = str(f.value)
            else:
                remaining.append(f)
        return iter(remaining)

    def partitions(self):
        return [
            _SynthLogPartition(p, self.rows_per_part)
            for p in range(self.num_parts)
        ]

    def read(self, partition: _SynthLogPartition):
        for off in range(partition.rows):
            row = row_at(partition.part, off, partition.rows)
            if self.level_eq is not None and row[2] != self.level_eq:
                continue  # filtered inside the generator — pushed down
            yield row


class SynthLogDataSource(DataSource):
    @classmethod
    def name(cls):
        return "synthlog"

    def schema(self):
        return SCHEMA_DDL

    def reader(self, schema: StructType):
        return SynthLogReader(self.options)


def register(spark) -> None:
    spark.dataSource.register(SynthLogDataSource)


# --- streaming side: a custom micro-batch source with offset replay -------

from pyspark.sql.datasource import SimpleDataSourceStreamReader  # noqa: E402


class SynthLogStreamReader(SimpleDataSourceStreamReader):
    """Micro-batch stream over the same closed-form rows: each batch
    advances the offset by ``batch_rows`` until ``max_rows`` is reached.

    Exactly-once comes from the offset contract, not from luck:
    ``read(start)`` returns (rows, nextOffset) and
    ``readBetweenOffsets(start, end)`` must REPLAY the identical rows
    when a batch is recovered after a crash — trivially true here
    because rows are a pure function of the offset range. That purity
    is the property a real custom source (a log cursor, a change feed)
    must engineer; this reader demonstrates the contract against
    Spark's actual recovery path.
    """

    def __init__(self, options):
        self.batch_rows = int(options.get("batch_rows", "25"))
        self.max_rows = int(options.get("max_rows", "100"))

    def initialOffset(self):
        return {"pos": 0}

    def _rows(self, lo: int, hi: int):
        # iter(list), precisely: Spark's simple-stream prefetch cache
        # needs BOTH next() (it peeks the first row in
        # add_result_to_cache — a bare list raises TypeError) AND
        # copy.copy() for replay (a generator can't be copied).
        # A list_iterator satisfies both.
        return iter(
            [row_at(0, off, self.max_rows) for off in range(lo, hi)]
        )

    def read(self, start: dict):
        lo = int(start["pos"])
        hi = min(lo + self.batch_rows, self.max_rows)
        return self._rows(lo, hi), {"pos": hi}

    def readBetweenOffsets(self, start: dict, end: dict):
        return self._rows(int(start["pos"]), int(end["pos"]))

    def commit(self, end: dict):
        pass  # nothing to clean up — rows are synthesized, not buffered


class SynthLogStreamDataSource(DataSource):
    @classmethod
    def name(cls):
        return "synthlog_stream"

    def schema(self):
        return SCHEMA_DDL

    def simpleStreamReader(self, schema: StructType):
        return SynthLogStreamReader(self.options)


def register_stream(spark) -> None:
    spark.dataSource.register(SynthLogStreamDataSource)
