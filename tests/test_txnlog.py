"""Contract tests for the optimistic-concurrency transaction log
(kinesis_datastore_app_spark/txnlog.py) — the round-8 answer to the
round-7 verdict's missing #2 (concurrent-writer semantics): two writers
racing one table must serialize, not silently last-write-win.

No Spark session needed for the log itself (it is engine-agnostic
metadata); the copy-on-write snapshot test uses pyarrow/pandas as the
snapshot payload so the interleaving is fully deterministic and fast.
"""

from __future__ import annotations

import os
import threading

import pandas as pd
import pytest

from kinesis_datastore_app_spark.txnlog import (
    CommitConflict,
    LeaseHeld,
    WriterLease,
    cas_commit,
    commit_snapshot,
    occ_commit,
    read_latest,
    snapshot_path,
)


def test_interleaved_writers_serialize_not_lww(tmp_path):
    """The exact race the old read-modify-write manifest lost: both
    writers read version 0; A commits; B's CAS on v1 must FAIL (not
    clobber), and B's occ rebase must land v2 containing BOTH deltas."""
    root = str(tmp_path / "t")
    # both writers observe the same initial state
    assert read_latest(root) == (0, None)
    assert read_latest(root) == (0, None)
    # A wins v1
    cas_commit(root, 1, {"files": ["a"]})
    # B raced for the same version: loud conflict, never a silent drop
    with pytest.raises(CommitConflict):
        cas_commit(root, 1, {"files": ["b"]})
    # B rebases: re-derives its payload from the CURRENT state
    v, payload = occ_commit(
        root, lambda prev, pv: {"files": (prev or {"files": []})["files"] + ["b"]}
    )
    assert v == 2
    assert read_latest(root) == (2, {"files": ["a", "b"]})


def test_thread_race_every_delta_survives_and_history_is_contiguous(tmp_path):
    """N genuinely concurrent appenders: the final state holds every
    writer's delta exactly once and the version history is the contiguous
    1..N sequence (each version derived from its predecessor)."""
    root = str(tmp_path / "t")
    n = 12
    barrier = threading.Barrier(n)
    errs: list[Exception] = []

    def writer(tok: str) -> None:
        def apply(prev, pv):
            return {"files": (prev or {"files": []})["files"] + [tok]}

        barrier.wait()
        try:
            occ_commit(root, apply)
        except Exception as e:  # pragma: no cover - surfaced via errs
            errs.append(e)

    ts = [threading.Thread(target=writer, args=(f"w{i}",)) for i in range(n)]
    for t in ts:
        t.start()
    for t in ts:
        t.join()
    assert not errs
    v, payload = read_latest(root)
    assert v == n
    assert sorted(payload["files"]) == sorted(f"w{i}" for i in range(n))
    # contiguous history: every intermediate version file exists
    names = sorted(os.listdir(os.path.join(root, "_txn")))
    assert names == [f"v{i:012d}.json" for i in range(1, n + 1)]


def test_cow_snapshot_interleaved_merge_is_serializable(tmp_path):
    """Two writers MERGE deltas into one keyed snapshot with a forced
    interleave: B reads the empty table, A commits its merge, B's CAS
    loses and its merge_fn is re-run against A's snapshot (rebase). The
    final snapshot must equal the SERIAL application of both deltas, and
    B's rebase must have genuinely happened (merge_fn ran twice)."""
    root = str(tmp_path / "snap")
    os.makedirs(root)

    def write_snap(prev_dir: str | None, delta: dict[int, int], name: str) -> str:
        prev = (
            pd.read_parquet(os.path.join(prev_dir, "part.parquet"))
            if prev_dir is not None
            else pd.DataFrame({"k": [], "n": []}).astype({"k": int, "n": int})
        )
        d = pd.DataFrame({"k": list(delta), "n": list(delta.values())})
        merged = (
            pd.concat([prev, d]).groupby("k", as_index=False)["n"].sum()
        )
        out = os.path.join(root, name)
        os.makedirs(out)
        merged.to_parquet(os.path.join(out, "part.parquet"), index=False)
        return name

    a_committed = threading.Event()
    b_calls = []

    def b_merge(prev_dir: str | None) -> str:
        b_calls.append(prev_dir)
        if len(b_calls) == 1:
            # B has READ its base (the empty table); now let A commit
            # first so B's CAS loses — deterministic conflict
            a_committed.wait(timeout=30)
        return write_snap(prev_dir, {1: 10, 2: 20}, f"snap-b{len(b_calls)}")

    def run_b():
        commit_snapshot(root, b_merge)

    tb = threading.Thread(target=run_b)
    tb.start()
    # wait until B has read its base state, then commit A
    while not b_calls:
        pass
    commit_snapshot(root, lambda prev: write_snap(prev, {2: 5, 3: 7}, "snap-a"))
    a_committed.set()
    tb.join()

    assert len(b_calls) == 2  # the rebase really ran
    assert b_calls[1] is not None and b_calls[1].endswith("snap-a")
    v, payload = read_latest(root)
    assert v == 2
    final = pd.read_parquet(
        os.path.join(snapshot_path(root, payload), "part.parquet")
    ).set_index("k")["n"].to_dict()
    # serial outcome: both deltas applied, overlapping key 2 summed
    assert final == {1: 10, 2: 25, 3: 7}


def test_writer_lease_excludes_live_and_breaks_stale(tmp_path):
    root = str(tmp_path / "state")
    lease = WriterLease(root).acquire()
    with pytest.raises(LeaseHeld):
        WriterLease(root).acquire()
    lease.release()
    # released: next writer proceeds
    with WriterLease(root):
        pass
    # crashed holder: lease file left behind with an expired heartbeat
    # (stop the live beat first or it would re-touch the backdated file)
    stale = WriterLease(root, ttl_s=0.0).acquire()
    stale._hb_stop.set()
    stale._hb_thread.join(timeout=5)
    os.utime(stale.path, (0, 0))
    WriterLease(root, ttl_s=600.0).acquire().release()


def test_crash_between_stage_and_commit_stays_invisible(tmp_path):
    """A writer that stages work but dies before its CAS leaves the
    latest version untouched — readers never see the partial job."""
    root = str(tmp_path / "t")
    cas_commit(root, 1, {"files": ["a"]})
    # writer 2 "crashes": its staged tmp data exists, no commit happened
    (tmp_path / "t" / "orphan-staged-file").write_text("x")
    assert read_latest(root) == (1, {"files": ["a"]})


def test_lease_heartbeat_keeps_long_holds_alive(tmp_path):
    """Round-8 review finding: a holder running LONGER than the TTL must
    stay protected (the background heartbeat keeps the lease live), and
    a genuinely crashed holder must be breakable after ~ttl — not after
    some multiple of it."""
    import time

    root = str(tmp_path / "state")
    lease = WriterLease(root, ttl_s=0.3).acquire()
    time.sleep(1.0)  # hold for >3x the TTL
    with pytest.raises(LeaseHeld):
        WriterLease(root, ttl_s=0.3).acquire()  # still protected
    lease.release()
    # crash: a holder that never heartbeats again (simulated by killing
    # the beat and backdating) is breakable by the next writer
    dead = WriterLease(root, ttl_s=0.3).acquire()
    dead._hb_stop.set()
    dead._hb_thread.join(timeout=5)
    time.sleep(0.4)
    WriterLease(root, ttl_s=0.3).acquire().release()


def test_lease_acquire_retries_when_holder_releases_mid_race(tmp_path, monkeypatch):
    """A release landing between a loser's failed O_EXCL and its stat
    must read as 'free now' (retry wins), not a spurious LeaseHeld."""
    root = str(tmp_path / "state")
    holder = WriterLease(root).acquire()
    contender = WriterLease(root)

    real_stat = os.stat
    released = []

    def stat_after_release(path, *a, **kw):
        if path == contender.path and not released:
            holder.release()
            released.append(True)
            raise FileNotFoundError(path)
        return real_stat(path, *a, **kw)

    monkeypatch.setattr(os, "stat", stat_after_release)
    contender.acquire()  # must succeed via retry, not raise LeaseHeld
    monkeypatch.undo()
    contender.release()


def test_touch_refreshes_superseded_vintages(tmp_path, monkeypatch):
    """Round-8 review finding: after a fixture regeneration the warm
    reads address the NEW tag only — the GC-protection touch must still
    refresh the SUPERSEDED dirs this process addressed earlier (they are
    the only dirs the GC deletes)."""
    import kinesis_datastore_app_spark.catalog as cat

    old = tmp_path / "old-tag"
    new = tmp_path / "new-tag"
    old.mkdir()
    new.mkdir()
    monkeypatch.setattr(cat, "_addressed_tags", {str(old)})
    monkeypatch.setattr(cat, "_last_touch_all", 0.0)
    os.utime(old, (0, 0))  # superseded an age ago
    cat._touch_tag(str(new))  # warm activity on the CURRENT vintage
    assert os.stat(old).st_mtime > 1, "superseded vintage was not refreshed"
