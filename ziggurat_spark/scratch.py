"""Session-scoped scratch directories for operator state.

Streaming/iterative operators materialize state (band indexes, cell
partitions, retry queues) under temp directories. A bare
``tempfile.mkdtemp`` leaks those forever — repeated bench passes
accumulate GB-scale parquet rewrites on disk (round-6 ADVICE). Every
operator workdir is therefore allocated UNDER one per-process scratch
root that is removed at interpreter exit: deletion happens only after
every lazily-read DataFrame has been materialized (the process is
exiting), so cleanup can never race a pending scan, and a crashed run
leaves at most one root to sweep.
"""

from __future__ import annotations

import atexit
import shutil
import tempfile

_SESSION_ROOT: str | None = None


def scratch_dir(prefix: str) -> str:
    """A fresh scratch directory under the per-process root (created
    lazily, removed at exit). Drop-in for ``tempfile.mkdtemp``."""
    global _SESSION_ROOT
    if _SESSION_ROOT is None:
        _SESSION_ROOT = tempfile.mkdtemp(prefix="zs_scratch_")
        atexit.register(shutil.rmtree, _SESSION_ROOT, ignore_errors=True)
    return tempfile.mkdtemp(prefix=prefix, dir=_SESSION_ROOT)
