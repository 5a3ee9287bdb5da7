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
