"""Custom Python DataSource (Spark 4 ``pyspark.sql.datasource`` API).

The sources surface beyond file formats: a DataSource subclass plugs a
NEW format into ``spark.read.format(...)`` with its own partition
planning — the extension point a pipeline uses for internal services,
synthetic backfills, or bespoke wire formats when no JVM connector
exists.

This one is a deterministic synthetic event generator
(``synthetic_events``): every row is pure integer arithmetic on the
row id, so any engine can reproduce the dataset exactly — which makes
the source itself ORACLE-CHECKABLE (plans/relational registers a query
reading through it whose DuckDB twin regenerates the rows from
``range()``).

Scale shape: ``partitions()`` splits the id space into ``parts`` equal
ranges; each executor materializes only its range (generator, no
driver-side list), so the source parallelizes like any file scan.
Python-process rows are the cost — fine for synthetic/backfill volumes;
real high-volume feeds belong in a JVM connector or Arrow-batched
reader.
"""

from __future__ import annotations

from pyspark.sql.datasource import (
    DataSource,
    DataSourceReader,
    InputPartition,
    SimpleDataSourceStreamReader,
)

N_USERS = 97
EVENT_TYPES = ["view", "click", "purchase", "signup", "error"]


def synth_row(i: int) -> tuple:
    """The generator formula — shared by the reader and any oracle.

    Pure integer arithmetic; value has one decimal digit so float
    rendering is exact in every engine.
    """
    return (i, i % N_USERS, EVENT_TYPES[i % len(EVENT_TYPES)],
            ((i * 37) % 1000) / 10.0)


class SyntheticEventsReader(DataSourceReader):
    def __init__(self, options):
        self.n = int(options.get("n", 1000))
        self.parts = int(options.get("parts", 8))

    def partitions(self):
        # Ceil division: at most ``parts`` balanced ranges even when n
        # is not divisible (floor division would mint a parts+1-th
        # straggler of n % parts rows).
        per = max(1, -(-self.n // self.parts))
        out = []
        start = 0
        while start < self.n:
            cnt = min(per, self.n - start)
            out.append(InputPartition((start, cnt)))
            start += cnt
        return out

    def read(self, partition):
        start, cnt = partition.value
        for i in range(start, start + cnt):
            yield synth_row(i)


class SyntheticEventsDataSource(DataSource):
    """``spark.read.format("synthetic_events").option("n", ...)``."""

    @classmethod
    def name(cls) -> str:
        return "synthetic_events"

    def schema(self) -> str:
        return ("event_id bigint, user_id bigint, "
                "event_type string, value double")

    def reader(self, schema) -> SyntheticEventsReader:
        return SyntheticEventsReader(self.options)


def register_synthetic_source(spark) -> None:
    """Register the format on a session.

    Unconditional: ``spark.dataSource.register`` is PER-SESSION state
    (a second session of the same application needs its own call), and
    re-registering an existing name is a safe overwrite — so any guard
    keyed wider than the session would silently skip real sessions.
    """
    spark.dataSource.register(SyntheticEventsDataSource)


class SyntheticEventsStreamReader(SimpleDataSourceStreamReader):
    """Streaming half of the synthetic source.

    Offsets are plain row positions ({"pos": k}); each poll returns
    everything available up to the configured end (``n``), so an
    availableNow run drains the source in one deterministic batch and a
    continuous run re-polls as the end grows. readBetweenOffsets makes
    replay exact — the same positions always regenerate the same rows,
    which is the whole recovery contract.
    """

    def __init__(self, options):
        self.n = int(options.get("n", 1000))

    def initialOffset(self):
        return {"pos": 0}

    def read(self, start):
        # List-backed iterators, not generators: the runner's prefetch
        # cache copy.copy()s the iterator for replay, which a generator
        # cannot satisfy. SimpleDataSourceStreamReader is a driver-side
        # prefetch API by contract, so materializing the batch is the
        # intended cost model (bounded by n / poll cadence).
        pos = start["pos"]
        end = max(pos, self.n)
        return iter([synth_row(i) for i in range(pos, end)]), {"pos": end}

    def readBetweenOffsets(self, start, end):
        return iter([synth_row(i)
                     for i in range(start["pos"], end["pos"])])


class SyntheticEventsStreamDataSource(DataSource):
    """``spark.readStream.format("synthetic_events_stream")``."""

    @classmethod
    def name(cls) -> str:
        return "synthetic_events_stream"

    def schema(self) -> str:
        return ("event_id bigint, user_id bigint, "
                "event_type string, value double")

    def simpleStreamReader(self, schema) -> SyntheticEventsStreamReader:
        return SyntheticEventsStreamReader(self.options)


def register_synthetic_stream_source(spark) -> None:
    """Per-session registration (see register_synthetic_source)."""
    spark.dataSource.register(SyntheticEventsStreamDataSource)
