"""Exactly-once ``foreachBatch`` delivery over at-least-once replay.

Structured Streaming's contract: after a failure, the SAME epoch is
redelivered with the SAME ``batch_id``. A non-transactional sink
therefore double-applies unless it records which batch ids it has
committed and no-ops on redelivery — the standard idempotent-sink
recipe (what Delta's ``txnAppId``/``txnVersion`` options implement
natively, and what any JDBC/object-store sink must hand-roll).

:class:`IdempotentBatchSink` is that recipe as a reusable wrapper. The
commit registry here is in-memory (sufficient for the single-driver
fixture runs and for tests that simulate redelivery); the docstring
contract a production deployment must keep is that the registry write
happens ATOMICALLY with the data write (same transaction / same
rename), otherwise a crash between the two reintroduces the duplicate
— the module deliberately exposes ``commit_store`` so a Delta- or
DB-backed dict-like can be swapped in.
"""

from __future__ import annotations

from collections.abc import Callable, MutableMapping
from typing import Any

from pyspark.sql import DataFrame


class IdempotentBatchSink:
    """Wrap a batch-apply function so redelivered batch ids no-op.

    ``commit_store``: dict-like mapping batch_id -> True. Default is a
    plain dict (driver-memory, test/demo scope); swap in a durable
    store for production (see module docstring for the atomicity
    contract).
    """

    def __init__(
        self,
        apply_fn: Callable[[DataFrame, int], None],
        commit_store: MutableMapping[int, Any] | None = None,
    ):
        self.apply_fn = apply_fn
        self.commits: MutableMapping[int, Any] = (
            commit_store if commit_store is not None else {}
        )
        self.applied = 0
        self.skipped = 0

    def __call__(self, batch_df: DataFrame, batch_id: int) -> None:
        if batch_id in self.commits:
            self.skipped += 1
            return
        self.apply_fn(batch_df, batch_id)
        self.commits[batch_id] = True
        self.applied += 1
