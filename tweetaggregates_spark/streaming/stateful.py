"""Custom stateful streaming operators (SURVEY §2.4 W8 extension —
Trill offers user-defined stateful operators; Spark's equivalent is
``applyInPandasWithState``).

``running_entity_totals``: per-key running aggregate maintained across
micro-batches in the state store — the canonical template for any
custom stateful op (session enrichment, CDC merge, online features).

Scale: state is partitioned by the grouping key across executors; use
the RocksDB state store provider when per-key state exceeds executor
heap. Arrow batches move rows; state round-trips once per key per
micro-batch, not per row.
"""

from __future__ import annotations

from collections.abc import Iterator
from typing import Any

import pandas as pd
from pyspark.sql import DataFrame
from pyspark.sql.streaming.state import GroupState, GroupStateTimeout
from pyspark.sql.types import (
    DoubleType,
    LongType,
    StructField,
    StructType,
)

OUTPUT_SCHEMA = StructType(
    [
        StructField("user_id", LongType()),
        StructField("total_events", LongType()),
        StructField("total_value", DoubleType()),
    ]
)

STATE_SCHEMA = StructType(
    [
        StructField("n", LongType()),
        StructField("v", DoubleType()),
    ]
)


def _update(
    key: tuple[Any, ...],
    batches: Iterator[pd.DataFrame],
    state: GroupState,
) -> Iterator[pd.DataFrame]:
    n, v = state.get if state.exists else (0, 0.0)
    for pdf in batches:
        n += len(pdf)
        v += float(pdf["value"].sum())
    state.update((n, v))
    yield pd.DataFrame(
        {"user_id": [key[0]], "total_events": [n], "total_value": [v]}
    )


def running_entity_totals(events: DataFrame) -> DataFrame:
    """Streaming DataFrame (user_id, value, ...) -> per-batch updated
    running totals per user, state kept in the state store."""
    return events.groupBy("user_id").applyInPandasWithState(
        _update,
        OUTPUT_SCHEMA,
        STATE_SCHEMA,
        "update",
        GroupStateTimeout.NoTimeout,
    )
