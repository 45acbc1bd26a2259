"""Single-maintainer fencing for maintained sidecar states.

The table WRITE path is multi-writer via OCC (reference:
hudi-client-common/.../transaction/TransactionManager.java + lock
providers). The maintained states layered beside tables —
IncrementalDeduper, IvfIndexMaintainer, DriftMonitor,
CorpusSketchMaintainer, SplitMaintainer — are SINGLE-maintainer by contract: state is a
watermark sidecar plus derived files, republished wholesale per fold,
with no conflict-resolution story. Two concurrent folds on one state
dir would interleave read-modify-write publishes (lost updates, or a
watermark ahead of the data it claims to cover).

This guard turns that contract violation from silent corruption into a
clean, immediate error on the second caller: each fold runs inside a
create-if-absent lock on the state directory (the same
timeline.LockProvider mechanics as the table lock, including stale-
holder mtime reclamation for crashed maintainers). Fail-fast by
design — a maintainer is a scheduled service, so a contended lock means
a second LIVE scheduler is misconfigured; queuing behind it would just
hide the misconfiguration.
"""

from __future__ import annotations

import functools
import os
from contextlib import contextmanager

from ..timeline import LockProvider

__all__ = ["ConcurrentMaintainerError", "maintainer_lock", "locked_fold"]


class ConcurrentMaintainerError(RuntimeError):
    """A second maintainer attempted to fold the same state directory."""


@contextmanager
def maintainer_lock(fs, state_path: str, timeout_s: float = 5.0,
                    expiry_s: float = 600.0):
    """Exclusive fold section for one maintained-state directory.

    ``fs`` is the owning table's storage (used only to ensure the lock's
    parent dir exists); the lock itself goes through the AtomicStorage
    seam like every other conditional create."""
    fs.makedirs(os.path.join(state_path, ".hoodie"))
    lp = LockProvider(state_path, timeout_s=timeout_s, expiry_s=expiry_s)
    try:
        lp.__enter__()
    except TimeoutError as e:
        raise ConcurrentMaintainerError(
            f"another maintainer holds {state_path} — maintained states "
            "are single-maintainer by contract; run one scheduler per "
            "state directory") from e
    try:
        yield
    finally:
        lp.__exit__(None, None, None)


def locked_fold(method):
    """Decorator: run a maintainer's state-mutating method inside
    :func:`maintainer_lock` on the instance's ``_lock_dir``.

    Re-entrant per INSTANCE (catch_up → rebuild/advance chains take the
    lock once), which is exactly the contract's grain: the guard exists
    to make a second maintainer OBJECT (another process or another
    scheduler in this process) fail cleanly, not to serialize calls on
    the one legitimate instance."""

    @functools.wraps(method)
    def wrapper(self, *args, **kwargs):
        if getattr(self, "_fold_lock_held", False):
            return method(self, *args, **kwargs)
        with maintainer_lock(self.fs, self._lock_dir):
            self._fold_lock_held = True
            try:
                return method(self, *args, **kwargs)
            finally:
                self._fold_lock_held = False
    return wrapper
