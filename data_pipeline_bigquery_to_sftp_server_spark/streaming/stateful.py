"""Custom stateful streaming operator (SURVEY §2.9: 'stateful
applyInPandasWithState'): a per-user running counter with timeout —
the canonical shape for sessionized/accumulating state Spark's built-in
windows can't express (e.g. 'alert after N errors since last purchase').

State is one small tuple per key, bounded by key cardinality; the
GroupState machinery checkpoints it, so the operator is fault-tolerant
without any custom code.
"""

from __future__ import annotations

from collections.abc import Iterator

import pandas as pd
from pyspark.sql import DataFrame
from pyspark.sql.streaming.state import GroupState, GroupStateTimeout

OUTPUT_SCHEMA = "user_id long, n_errors_since_purchase long, alert boolean"
STATE_SCHEMA = "n_errors long"


def _track_errors(
    key: tuple,
    pdfs: Iterator[pd.DataFrame],
    state: GroupState,
) -> Iterator[pd.DataFrame]:
    """Count error events per user, reset on purchase; alert at >= 3."""
    (n_errors,) = state.get if state.exists else (0,)
    for pdf in pdfs:
        for _, row in pdf.sort_values("ts").iterrows():
            if row["event_type"] == "purchase":
                n_errors = 0
            elif row["event_type"] == "error":
                n_errors += 1
    state.update((n_errors,))
    yield pd.DataFrame(
        {
            "user_id": [key[0]],
            "n_errors_since_purchase": [n_errors],
            "alert": [n_errors >= 3],
        }
    )


def errors_since_purchase(events: DataFrame) -> DataFrame:
    """Apply the stateful tracker to a *streaming* events DataFrame
    grouped by user. Use outputMode('update') with the returned stream.
    """
    return (
        events.groupBy("user_id")
        .applyInPandasWithState(
            _track_errors,
            outputStructType=OUTPUT_SCHEMA,
            stateStructType=STATE_SCHEMA,
            outputMode="update",
            timeoutConf=GroupStateTimeout.NoTimeout,
        )
    )
