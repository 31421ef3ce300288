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


def _activity_mtime_deep(path: str) -> float:
    """Newest mtime anywhere under ``path`` (full walk). For build
    staging whose writes land ARBITRARILY deep — a live Spark job
    commits under ``<tmp>/_temporary/0/task_*/``, so neither the top
    mtime nor the one-level probe moves while data is actively being
    written two levels down (round-11 ADVICE, medium: a concurrent
    builder whose job outlived the age gate had its tmp rmtree'd
    mid-write; the committer can then still succeed on the surviving
    tasks and publish a silently incomplete artifact). Cost is one
    listdir tree over a single staging dir, only ever paid on the cold
    retry path that prunes. Unreadable entries are skipped; a vanished
    root reads as active (never prune what we cannot observe)."""
    try:
        newest = os.stat(path).st_mtime
    except OSError:
        return time.time()
    for dirpath, dirnames, filenames in os.walk(path):
        for name in (*dirnames, *filenames):
            try:
                newest = max(
                    newest, os.stat(os.path.join(dirpath, name)).st_mtime
                )
            except OSError:
                continue
    return newest


def ensure_trusted_dir(path: str) -> bool:
    """Create-and-trust-check a PREDICTABLE directory path in a
    world-writable tmp — THE single definition of the squat-file /
    symlink / foreign-owner check (round-10 review: catalog and this
    module had hand-rolled copies with already-divergent details; a
    hardening fix must land once). True = ``path`` exists, is a real
    directory (lstat, so a symlink at the predictable path is never
    followed into an attacker-chosen target — os.stat would pass the
    uid check through a link to a victim-owned dir and a pruner would
    then rmtree inside it), and is owned by this user. False = do not
    use it."""
    try:
        os.makedirs(path, mode=0o700, exist_ok=True)
    except OSError:
        # a plain FILE squatting on the predictable path raises
        # FileExistsError (exist_ok only suppresses for directories):
        # never trust it, never crash (round-8 review)
        return False
    try:
        st = os.lstat(path)
        if (
            stat_mod.S_ISLNK(st.st_mode)
            or not stat_mod.S_ISDIR(st.st_mode)
            or (hasattr(os, "getuid") and st.st_uid != os.getuid())
        ):
            return False
    except OSError:
        return False
    return True


def scratch_tmpdir(prefix: str, age_s: float = _AGE_S) -> str:
    """mkdtemp under the shared root, collecting same-prefix siblings
    whose activity mtime is older than the age gate. Falls back to a
    plain private mkdtemp (no shared root, no pruning) if the root
    fails the trust check — a predictable path in a world-writable tmp
    must never be trusted cross-user."""
    if not ensure_trusted_dir(ROOT):
        return tempfile.mkdtemp(prefix=prefix)
    prune_aged(ROOT, prefix, age_s, activity=_activity_mtime)
    return tempfile.mkdtemp(prefix=prefix, dir=ROOT)
