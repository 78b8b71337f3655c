"""Loud-fail streaming wait (VERDICT r6 #7).

``q.awaitTermination(300)`` converts a task failure into a silent
multi-minute stall: the call just times out and the caller reads an
empty/partial result. This helper polls in short bounded waits and
re-raises the query's OWN StreamingQueryException the moment it
appears, turning a hang or task crash into an immediate diagnostic;
an honest timeout raises TimeoutError carrying the query status.
"""

from __future__ import annotations

import time


def await_or_raise(q, timeout: float = 300.0) -> None:
    """Wait for an availableNow streaming query to drain; raise its own
    exception immediately on failure, TimeoutError on stall."""
    deadline = time.monotonic() + timeout
    while q.isActive:
        ex = q.exception()
        if ex is not None:
            q.stop()
            raise ex
        if time.monotonic() > deadline:
            status = q.status
            q.stop()
            raise TimeoutError(
                f"streaming query did not finish within {timeout:.0f}s: "
                f"{status}"
            )
        # bounded 1 s waits keep the poll cheap (returns early on
        # termination), while failure latency stays ≈1 s not `timeout`
        q.awaitTermination(1)
    ex = q.exception()
    if ex is not None:
        raise ex
    q.stop()
