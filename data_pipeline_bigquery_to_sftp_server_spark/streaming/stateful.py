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
    batch = pd.concat(list(pdfs), ignore_index=True)
    if len(batch):
        # vectorized segment form (r11 verdict #6 — no per-row Python):
        # a purchase resets the counter, so the batch's contribution is
        # the error count AFTER its last purchase; with no purchase the
        # whole batch's errors add to the carried count. Stable ts sort
        # keeps delivery order on timestamp ties, matching the
        # row-at-a-time form this replaces.
        batch = batch.sort_values("ts", kind="stable")
        n_seen += len(batch)
        is_purchase = (batch["event_type"] == "purchase").to_numpy()
        is_error = (batch["event_type"] == "error").to_numpy()
        if is_purchase.any():
            last_p = len(is_purchase) - 1 - int(is_purchase[::-1].argmax())
            n_errors = int(is_error[last_p + 1 :].sum())
        else:
            n_errors += int(is_error.sum())
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


# ---------------------------------------------------------------------------
# Carried ordered-sequence state (r10 verdict #4): the general tier for
# the Markov-transition family. q_streaming_transitions is exact only
# because its producer hash-partitions arriving files BY USER, so each
# micro-batch holds complete per-user sequences. A producer that can't
# control file layout (the common case: a time-ordered event log rolled
# into files by arrival window) splits a user's sequence ACROSS
# micro-batches — the per-batch lead() window then silently drops every
# cross-batch pair. This operator carries the last event type per user
# in GroupState, so the pair that spans a batch boundary is emitted
# when its second half arrives.
#
# Exactness contract: batches must arrive in per-user event order
# (true for a time-rolled log: file k holds a contiguous (ts, event_id)
# range and files are delivered oldest-first); within a batch the
# operator sorts by (ts_us, event_id) itself. State is ONE short string
# per user — bounded by user cardinality, checkpointed by the GroupState
# machinery, so the operator is fault-tolerant and restart-safe without
# an epoch gate (GroupState replays are handled by Spark's own commit
# log, unlike the hand-held foreachBatch absorbs).
# ---------------------------------------------------------------------------

TRANSITION_OUTPUT_SCHEMA = "user_id long, from_type string, to_type string"
TRANSITION_STATE_SCHEMA = "last_type string"


def _emit_transitions(
    key: tuple,
    pdfs: Iterator[pd.DataFrame],
    state: GroupState,
) -> Iterator[pd.DataFrame]:
    """Emit one row per consecutive (from_type, to_type) pair in the
    user's event order, stitching across micro-batches via the carried
    last event type."""
    (last_type,) = state.get if state.exists else (None,)
    batch = pd.concat(list(pdfs), ignore_index=True)
    if len(batch):
        batch = batch.sort_values(["ts_us", "event_id"])
        types = batch["event_type"].tolist()
        seq = ([last_type] if last_type is not None else []) + types
        state.update((types[-1],))
        if len(seq) >= 2:
            yield pd.DataFrame(
                {
                    "user_id": key[0],
                    "from_type": seq[:-1],
                    "to_type": seq[1:],
                }
            )
    elif last_type is not None:
        state.update((last_type,))


def transitions_stateful(events: DataFrame) -> DataFrame:
    """Apply the carried-state transition extractor to a *streaming*
    DataFrame of ``(user_id long, event_id long, event_type string,
    ts_us long)``. Use outputMode('append'); the sink accumulates one
    row per transition pair, batch boundaries notwithstanding."""
    return events.groupBy("user_id").applyInPandasWithState(
        _emit_transitions,
        outputStructType=TRANSITION_OUTPUT_SCHEMA,
        stateStructType=TRANSITION_STATE_SCHEMA,
        outputMode="append",
        timeoutConf=GroupStateTimeout.NoTimeout,
    )


def transitions_stateful_tws(events: DataFrame) -> DataFrame:
    """The Spark-4 ``transformWithStateInPandas`` deployment of the
    same operator — the state-v2 engine (RocksDB store, typed
    ValueState, timers, schema evolution on state). ENVIRONMENTAL
    GATE: the TWS Python runner requires ``google.protobuf``, which
    this container lacks (verified: the runner crashes with
    ImportError at init) — the multimodal-codec convention applies:
    the gate raises with the exact dependency, and the
    applyInPandasWithState tier above is the tested default with
    identical semantics. On a cluster with protobuf installed this
    body is the drop-in upgrade (same sort + stitch logic via a
    ``StatefulProcessor`` holding one ValueState('last_type'))."""
    try:
        from google.protobuf import descriptor  # noqa: F401
    except ImportError as e:
        raise NotImplementedError(
            "transformWithStateInPandas requires google.protobuf in the "
            "Python workers (absent in this container); use "
            "transitions_stateful (applyInPandasWithState) — identical "
            "semantics, tested here"
        ) from e
    import pandas as pd  # local: only reached when the gate passes
    from pyspark.sql.streaming.stateful_processor import (
        StatefulProcessor,
        StatefulProcessorHandle,
    )

    class _TransitionProcessor(StatefulProcessor):
        def init(self, handle: StatefulProcessorHandle) -> None:
            self._last = handle.getValueState("last", "last_type string")

        def handleInputRows(self, key, rows, timerValues):
            last = self._last.get()[0] if self._last.exists() else None
            batch = pd.concat(list(rows), ignore_index=True)
            if not len(batch):
                return
            batch = batch.sort_values(["ts_us", "event_id"])
            types = batch["event_type"].tolist()
            seq = ([last] if last is not None else []) + types
            self._last.update((types[-1],))
            if len(seq) >= 2:
                yield pd.DataFrame(
                    {
                        "user_id": key[0],
                        "from_type": seq[:-1],
                        "to_type": seq[1:],
                    }
                )

        def close(self) -> None:
            pass

    return events.groupBy("user_id").transformWithStateInPandas(
        _TransitionProcessor(),
        outputStructType=TRANSITION_OUTPUT_SCHEMA,
        outputMode="Append",
        timeMode="None",
    )
