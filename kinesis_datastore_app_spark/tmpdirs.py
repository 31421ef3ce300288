"""Self-cleaning temp dirs for streaming checkpoints and sinks.

Every streaming key allocates a FRESH checkpoint/sink dir per
invocation — required: Structured Streaming refuses to share a
checkpoint between distinct queries, and reusing one would resume the
previous run instead of replaying — so without cleanup every
bench/sweep run leaks them (≈2000 dirs observed in /tmp before this
module existed). All allocations go under one root; each new
allocation prunes same-prefix siblings whose activity is past an age
gate, so concurrent and just-finished streams keep their dirs while
prior runs' are collected.

Activity = the newest mtime among the dir and its IMMEDIATE children:
a live checkpoint's offsets/ and commits/ subdirs are touched every
micro-batch, so a long-running stream stays young even though its top
dir's mtime never changes after creation.
"""

from __future__ import annotations

import os
import shutil
import tempfile
import time

ROOT = os.path.join(tempfile.gettempdir(), "kdas_stream_tmp")
_AGE_S = 1800


def _activity_mtime(path: str) -> float:
    try:
        newest = os.stat(path).st_mtime
        for child in os.listdir(path):
            try:
                newest = max(
                    newest, os.stat(os.path.join(path, child)).st_mtime
                )
            except OSError:
                continue
        return newest
    except OSError:
        return time.time()  # vanished/unreadable: treat as active


def scratch_tmpdir(prefix: str) -> str:
    """mkdtemp under the shared root, collecting same-prefix siblings
    whose activity mtime is older than the age gate."""
    os.makedirs(ROOT, exist_ok=True)
    now = time.time()
    try:
        entries = os.listdir(ROOT)
    except OSError:
        entries = []
    for d in entries:
        if not d.startswith(prefix):
            continue
        p = os.path.join(ROOT, d)
        if now - _activity_mtime(p) >= _AGE_S:
            shutil.rmtree(p, ignore_errors=True)
    return tempfile.mkdtemp(prefix=prefix, dir=ROOT)
