"""Query-scoped persist tracking.

Several operators persist intermediates that feed multiple plan branches
(shingle relations, normalized vectors, CC edge lists). A bare
``.persist()`` with no ``unpersist()`` pins those blocks for the session
lifetime — across a bench run the block manager fills with dead caches.

``scoped_persist`` registers the cached frame in a module-level scope;
``release_scoped`` (called by the registry wrapper before EACH query
invocation) unpersists everything the previous query left behind. The
returned result of a query can therefore still consume its own caches
lazily — they are only released when the next query starts.
"""

from __future__ import annotations

from pyspark.sql import DataFrame

_SCOPED: list[DataFrame] = []
_DEPTH = 0  # registered-query nesting depth (see registry.query wrapper)


class query_scope:
    """Context manager the registry wrapper enters per query call.
    Releases the previous query's caches only on TOP-LEVEL entry —
    composed queries (one registered query calling another, e.g.
    cluster-assignment → minhash-pairs) must not release their caller's
    freshly-persisted intermediates mid-plan."""

    def __enter__(self):
        global _DEPTH
        if _DEPTH == 0:
            release_scoped()
        _DEPTH += 1
        return self

    def __exit__(self, *exc):
        global _DEPTH
        _DEPTH -= 1
        return False


def scoped_persist(df: DataFrame) -> DataFrame:
    out = df.persist()
    _SCOPED.append(out)
    return out


def track(df: DataFrame) -> DataFrame:
    """Register an already-persisted frame for scoped release."""
    _SCOPED.append(df)
    return df


def release_scoped() -> int:
    n = 0
    while _SCOPED:
        df = _SCOPED.pop()
        try:
            df.unpersist()
            n += 1
        except Exception:  # session already stopped, etc.
            pass
    return n
