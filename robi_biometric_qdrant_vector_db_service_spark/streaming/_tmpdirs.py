"""Tracked temp directories for the streaming fixtures (r15 VERDICT item
6): staging caches, per-run hard-link dirs, state stores, and checkpoint
locations all live in ``tempfile.mkdtemp`` directories whose lifetime is
the Spark session — they must not survive the process.  Every streaming
module allocates through ``tracked_mkdtemp``, which registers ONE atexit
sweep that removes whatever is still on disk when the interpreter exits
(errors ignored: a dir a test already cleaned, or that the OS tmp reaper
beat us to, is success).

Production note: none of this exists at 100 TB — the staging dirs stand
in for the lake tables / object-store checkpoints a real deployment
owns; the sweep is strictly a test-fixture hygiene concern.
"""

from __future__ import annotations

import atexit
import shutil
import tempfile

_tracked: list[str] = []
_registered = False


def _sweep() -> None:
    for d in _tracked:
        shutil.rmtree(d, ignore_errors=True)
    _tracked.clear()


def tracked_mkdtemp(prefix: str) -> str:
    """``tempfile.mkdtemp`` that is removed at interpreter exit."""
    global _registered
    if not _registered:
        atexit.register(_sweep)
        _registered = True
    d = tempfile.mkdtemp(prefix=prefix)
    _tracked.append(d)
    return d
