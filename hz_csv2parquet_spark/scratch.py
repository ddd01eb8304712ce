"""Session-scoped scratch directories.

Catalog queries that build throwaway TxTables (queries_txlog.py) and
streaming checkpoints (streaming/cdc.py) need real on-disk paths; a
bare ``tempfile.mkdtemp`` leaks one directory per query per run —
the round-9 audit found 433 of them in /tmp. Every scratch dir is
registered here and removed at interpreter exit, so repeated catalog
/ bench / pytest runs leave no residue.
"""

from __future__ import annotations

import atexit
import shutil
import tempfile

_DIRS: list[str] = []


def scratch_dir(prefix: str) -> str:
    """A fresh temp directory cleaned up at interpreter exit."""
    d = tempfile.mkdtemp(prefix=prefix)
    _DIRS.append(d)
    return d


@atexit.register
def _cleanup() -> None:
    while _DIRS:
        shutil.rmtree(_DIRS.pop(), ignore_errors=True)
