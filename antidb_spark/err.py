"""Engine errors (reference analog: antidb/err.py)."""

from __future__ import annotations


class QueryStartGtEndError(ValueError):
    """Range query with start > end (reference err.py:8-14, raised by
    prs.py:50-52; pinned by tests.py:309-314)."""

    def __init__(self, start, end):
        super().__init__(
            f"range query start {start!r} sorts after end {end!r}"
        )
        self.start = start
        self.end = end
