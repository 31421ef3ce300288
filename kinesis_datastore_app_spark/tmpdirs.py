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
dir's mtime never changes after creation. Callers whose writes land
DEEPER than one level (e.g. a cold-bench scratch building GB-scale
artifacts inside tag subdirs) must pass an age_s comfortably above
their worst-case single-build time instead.
"""

from __future__ import annotations

import os
import shutil
import stat as stat_mod
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


def prune_aged(base: str, prefix: str, age_s: float, activity=None) -> None:
    """Collect ``base``'s entries named ``prefix*`` whose activity mtime
    (top-level mtime by default; pass ``activity`` for a deeper probe)
    is older than ``age_s``. The shared loop behind every age-gated
    scratch cleaner in this repo — one place to fix staleness
    semantics."""
    probe = activity or (lambda p: _activity_mtime_top(p))
    try:
        entries = os.listdir(base)
    except OSError:
        return
    now = time.time()
    for d in entries:
        if not d.startswith(prefix):
            continue
        p = os.path.join(base, d)
        if now - probe(p) >= age_s:
            shutil.rmtree(p, ignore_errors=True)


def _activity_mtime_top(path: str) -> float:
    try:
        return os.stat(path).st_mtime
    except OSError:
        return time.time()


def scratch_tmpdir(prefix: str, age_s: float = _AGE_S) -> str:
    """mkdtemp under the shared root, collecting same-prefix siblings
    whose activity mtime is older than the age gate. Falls back to a
    plain private mkdtemp (no shared root, no pruning) if the root
    exists but is not owned by this user — a predictable path in a
    world-writable tmp must never be trusted cross-user."""
    try:
        os.makedirs(ROOT, mode=0o700, exist_ok=True)
    except FileExistsError:
        # a plain FILE squatting on the predictable path (exist_ok only
        # suppresses for directories): never trust it, never crash —
        # fall back to a private dir (round-8 review)
        return tempfile.mkdtemp(prefix=prefix)
    try:
        st = os.lstat(ROOT)  # lstat: a symlink at the predictable path
        # must not be followed into an attacker-chosen target (os.stat
        # would pass the uid check through a link to a victim-owned dir
        # and prune_aged would then rmtree inside it)
        if (
            stat_mod.S_ISLNK(st.st_mode)
            or not stat_mod.S_ISDIR(st.st_mode)
            or st.st_uid != os.getuid()
        ):
            return tempfile.mkdtemp(prefix=prefix)
    except (OSError, AttributeError):  # AttributeError: no getuid (win)
        pass
    prune_aged(ROOT, prefix, age_s, activity=_activity_mtime)
    return tempfile.mkdtemp(prefix=prefix, dir=ROOT)
