"""Session-scoped registry of operator-persisted intermediates.

Several operators persist a mid-pipeline relation that multiple
downstream branches consume (SRP signatures, LSH-tuning shingles,
n-gram hash tables, contamination gram hashes). Those cache entries
must outlive the operator FUNCTION (the caller's action happens
later), so the operators cannot unpersist them — but leaving them
to StorageLevel LRU eviction makes a long session's memory profile
depend on eviction order: an 86-query sweep was measured (round 3)
inflating unrelated late-catalog queries up to ~12× via eviction +
GC pressure.

``tracked_persist`` is a drop-in ``df.persist()`` that also
registers the DataFrame handle (a strong reference on purpose: the
JVM cache outlives the operator's local Python variable, so a weak
reference would be dead exactly when the cache needs freeing; the
handle itself is a few hundred bytes of plan pointer, not data);
``release_caches`` unpersists every tracked relation and clears the
registry. Call it between logical units of work: after a query's
action in a sweep (bench.py does), or at pipeline stage boundaries
in a long-lived session. It is precise where
``spark.catalog.clearCache()`` is a sledgehammer: caches the CALLER
created stay warm.
"""

from __future__ import annotations

import sys

from pyspark.sql import DataFrame

_TRACKED: list[DataFrame] = []


def tracked_persist(df: DataFrame, storage_level=None) -> DataFrame:
    """``df.persist()`` + registration for later ``release_caches``."""
    persisted = df.persist() if storage_level is None else df.persist(storage_level)
    _TRACKED.append(persisted)
    return persisted


def release_caches() -> int:
    """Unpersist every tracked relation; returns how many."""
    released = 0
    while _TRACKED:
        df = _TRACKED.pop()
        try:
            df.unpersist()
            released += 1
        except Exception as exc:
            # Expected when the owning session already stopped
            # (py4j connection/JVM gone); log rather than swallow so
            # a genuine unpersist failure on a live session is
            # visible in stderr and the released-count mismatch has
            # an explanation.
            print(
                f"cache_registry: unpersist failed ({exc!r}) — "
                "handle dropped without freeing",
                file=sys.stderr,
            )
    return released
