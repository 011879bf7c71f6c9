"""Engine errors (reference analog: antidb/err.py)."""

from __future__ import annotations


class UnknownSnapshotError(KeyError):
    """Time-travel read of a snapshot id that was never committed (or
    whose metadata was removed by ``expire_snapshots``)."""

    def __init__(self, table: str, snapshot_id: str):
        super().__init__(
            f"table {table!r} has no snapshot {snapshot_id!r} "
            "(never committed, or expired)"
        )
        self.table = table
        self.snapshot_id = snapshot_id


class SnapshotExpiredError(FileNotFoundError):
    """Time-travel read of a known snapshot whose data files were
    garbage-collected (a later ``replace`` dropped its generation, or
    ``expire_snapshots`` removed unreferenced files)."""

    def __init__(self, table: str, snapshot_id: str, missing: list[str]):
        super().__init__(
            f"snapshot {snapshot_id!r} of table {table!r} references "
            f"{len(missing)} data file(s) no longer on disk "
            f"(first: {missing[0]!r})"
        )
        self.table = table
        self.snapshot_id = snapshot_id
        self.missing = missing


class QueryStartGtEndError(ValueError):
    """Range query with start > end (reference err.py:8-14, raised by
    prs.py:50-52; pinned by tests.py:309-314)."""

    def __init__(self, start, end):
        super().__init__(
            f"range query start {start!r} sorts after end {end!r}"
        )
        self.start = start
        self.end = end
