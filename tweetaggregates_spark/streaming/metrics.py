"""Ops observability (SURVEY §2.4 W6: the reference logs KB read per
5-min window, TwitterStream.cs:50-64; §2.5 A7 heartbeat counter,
RocksDBStore.cs:90-92).

Spark-native equivalent: a StreamingQueryListener collecting rows/sec
and cumulative row counts per query — no operator in the data path at
all (the reference spends a Trill window on this; here it's free
engine telemetry)."""

from __future__ import annotations

from pyspark.sql.streaming import StreamingQueryListener


class ThroughputListener(StreamingQueryListener):
    """Collects per-query progress: cumulative input rows and the last
    processedRowsPerSecond — the reference's KB-per-window log line and
    running total fold, as engine telemetry."""

    def __init__(self) -> None:
        self.totals: dict[str, int] = {}
        self.last_rate: dict[str, float] = {}

    def onQueryStarted(self, event) -> None:  # noqa: N802
        pass

    def onQueryProgress(self, event) -> None:  # noqa: N802
        p = event.progress
        name = p.name or p.id
        self.totals[name] = self.totals.get(name, 0) + (p.numInputRows or 0)
        if p.processedRowsPerSecond is not None:
            self.last_rate[name] = p.processedRowsPerSecond

    def onQueryIdle(self, event) -> None:  # noqa: N802
        pass

    def onQueryTerminated(self, event) -> None:  # noqa: N802
        pass
