"""Session-scoped registry for operator-internal persisted frames.

Several operators persist a shared intermediate so two consumers cost
one corpus scan (bm25's per-doc stats, the LM's tokenized base, the
duplicate-span gram base, the heavy-hitter candidate summary, the
prefix-filter shingle base). The persist is the right plan shape, but
``DataFrame.persist`` has session lifetime: repeated operator calls in
a long-lived session accumulate cached frames until executor storage
evicts them under pressure.

This registry centralizes the lifecycle: operators route their
persists through :func:`persist_tracked`, and a long-running service
calls :func:`clear_operator_caches` between pipeline runs (also
registered ``atexit`` so test/bench sessions leave nothing pinned).
Unpersisting is always safe — lineage is intact, a later consumer just
recomputes — so eviction is a performance knob, never a correctness
one.
"""

from __future__ import annotations

import atexit

from pyspark.sql import DataFrame
from pyspark.storagelevel import StorageLevel

# Strong refs on purpose: dropping the Python wrapper does NOT release
# the JVM-side cache entry, so the registry must keep the handle alive
# until clear_operator_caches() unpersists it.
_TRACKED: list[DataFrame] = []


def persist_tracked(
    df: DataFrame, level: StorageLevel | None = None
) -> DataFrame:
    """``df.persist()`` that the session can bulk-release later."""
    df = df.persist(level) if level is not None else df.persist()
    _TRACKED.append(df)
    return df


def clear_operator_caches() -> None:
    """Unpersist every tracked operator intermediate (idempotent).

    Call between pipeline runs in a long-lived session; registered
    ``atexit`` as a backstop. Blocking=False: eviction proceeds async
    on the JVM side."""
    while _TRACKED:
        df = _TRACKED.pop()
        try:
            df.unpersist()
        except Exception:
            pass  # session already stopped — nothing to release


atexit.register(clear_operator_caches)


class CheckpointChain:
    """Per-round ``localCheckpoint`` for iterative operators WITH
    bounded block storage (r9 advice): lineage truncation keeps the
    driver's logical plan constant-size, but the checkpointed RDD
    blocks of every round otherwise linger until GC/ContextCleaner
    notices — a long session running many trains accumulates them.
    ``step()`` eagerly checkpoints the round's frame, then releases the
    PREVIOUS round's blocks, so at most two generations are ever held.

    Safety contract (why release-after-materialize is sound): a
    localCheckpoint has NO lineage — lost blocks are unrecoverable —
    so the previous round may only be released once nothing will read
    it again. Eager materialization of round k consumes round k-1
    completely; any OTHER frame derived from round k-1 (e.g. the BPE
    trainer's per-round argmax) must itself be eagerly checkpointed
    BEFORE the next step() call. The final step's blocks are never
    released — the caller's result reads them.
    """

    def __init__(self) -> None:
        self._prev = None  # py4j handle of the last round's java RDD

    def step(self, df: DataFrame) -> DataFrame:
        out = df.localCheckpoint(eager=True)
        # Dataset.localCheckpoint wraps the materialized internal RDD in
        # a LogicalRDD — its .rdd() is the exact persisted handle, so no
        # getPersistentRDDs() diffing (which could misattribute
        # concurrently-materialized cached frames).
        handle = out._jdf.queryExecution().analyzed().rdd()
        if self._prev is not None:
            try:
                self._prev.unpersist(False)
            except Exception:
                pass  # session shutting down — nothing to release
        self._prev = handle
        return out
