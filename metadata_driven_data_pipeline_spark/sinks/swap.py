"""Crash-safe directory swap for staging-path writes.

Every rewrite-in-place table in this engine (consolidation, compaction,
streaming monitor grids) writes to a staging directory first and then
swaps it into place. A naive ``rmtree(path); move(staging, path)`` has a
silent-data-loss window: a crash between the two calls leaves NOTHING at
``path``, and a restart that treats "missing" as "first run" bootstraps
fresh state from the current batch alone.

This module closes the window with a rename-aside protocol (directory
renames are atomic on a POSIX filesystem when source and destination
share a filesystem — staging and the ``__prev`` holder are path
siblings, so they do):

swap:     1. remove any completed ``path__prev`` leftover
          2. ``os.rename(path, path__prev)``        (atomic)
          3. ``os.rename(staging, path)``           (atomic)
          4. remove ``path__prev``

recover:  if ``path`` is missing but ``path__prev`` exists, a crash hit
          between steps 2 and 3 — roll ``path__prev`` back to ``path``.

Crash at any point leaves either the old state or the new state
reachable: before 2 → old intact; between 2 and 3 → old in ``__prev``
(recover() restores it; the interrupted batch replays from the
checkpoint); between 3 and 4 → new committed, stale ``__prev`` removed
by the next swap's step 1.

Object-store note: S3-style stores have no atomic directory rename; at
that tier the right tool is a table format with a commit log. This
protocol is exact on local/NFS/HDFS-style filesystems and is strictly
safer than rmtree+move everywhere.
"""

from __future__ import annotations

import os
import shutil


def _prev(path: str) -> str:
    return path.rstrip("/") + "__prev"


def recover_swap(path: str) -> bool:
    """Roll back a swap interrupted between rename-aside and
    rename-into-place. Returns True if a rollback happened. Call before
    reading state that a swap maintains (the monitor/consolidation
    readers do)."""
    prev = _prev(path)
    if not os.path.exists(path) and os.path.exists(prev):
        os.rename(prev, path)
        return True
    return False


def atomic_swap(path: str, staging: str) -> None:
    """Replace the directory at ``path`` with ``staging`` without ever
    leaving a state where neither old nor new content is reachable."""
    prev = _prev(path)
    shutil.rmtree(prev, ignore_errors=True)
    if os.path.exists(path):
        os.rename(path, prev)
    # staging is a sibling of path (same parent directory/filesystem),
    # so this is an atomic rename; shutil.move degrades to copy only
    # across filesystems, where the recover() protocol still bounds the
    # loss to the interrupted batch.
    shutil.move(staging, path)
    shutil.rmtree(prev, ignore_errors=True)
