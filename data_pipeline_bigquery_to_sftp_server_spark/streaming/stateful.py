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

OUTPUT_SCHEMA = (
    "user_id long, n_errors_since_purchase long, alert boolean, n_seen long"
)
STATE_SCHEMA = "n_errors long, n_seen long"


def _track_errors(
    key: tuple,
    pdfs: Iterator[pd.DataFrame],
    state: GroupState,
) -> Iterator[pd.DataFrame]:
    """Count error events per user, reset on purchase; alert at >= 3.
    ``n_seen`` counts every event ever processed for the key — a
    monotone version stamp, so in update-mode output the row with the
    max n_seen per key IS the final state (micro-batch emission order
    need not be tracked by the consumer)."""
    n_errors, n_seen = state.get if state.exists else (0, 0)
    for pdf in pdfs:
        for _, row in pdf.sort_values("ts").iterrows():
            n_seen += 1
            if row["event_type"] == "purchase":
                n_errors = 0
            elif row["event_type"] == "error":
                n_errors += 1
    state.update((n_errors, n_seen))
    yield pd.DataFrame(
        {
            "user_id": [key[0]],
            "n_errors_since_purchase": [n_errors],
            "alert": [n_errors >= 3],
            "n_seen": [n_seen],
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
