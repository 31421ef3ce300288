"""Resharding semantics for the custom Kinesis-style connector.

A production Kinesis stream at scale resharding is not optional: shard
split/merge is how throughput capacity follows load, and the connector
contract it imposes — hash-range routing, shard lineage, per-key order
across the parent->child handoff, exactly-once across the boundary —
is exactly what these tests pin against the simulator's reshard mode
(`sources/kinesis_sim.py`). The reference app never reshards (static
shardCount, KinesisSync.java:49) — this is the scale-path extension on
top of its contract.
"""

from __future__ import annotations

import json
import time

import pytest
from hypothesis import given, settings
from hypothesis import strategies as st

from kinesis_datastore_app_spark.sources.kinesis_sim import (
    HASH_SPACE,
    _key_hash,
    _register_source,
    _trade,
    shard_lineage,
)

# split shard 1 at 400, then merge shards 2,3 at 800 — both boundaries
# interior to the 1200-record stream; the streaming tests use batch
# sizes that do NOT divide the event indexes, so micro-batches STRADDLE
# the reshard boundaries (parent tail + child head inside one batch)
_EVENTS = [
    {"at": 400, "op": "split", "shard": 1},
    {"at": 800, "op": "merge", "shards": [2, 3]},
]
_N = 1200
_SHARDS = 4


def _owner_at(spans, i, h):
    """Independent routing check: the unique OPEN span at record index i
    whose hash range contains h."""
    owners = [
        sp
        for sp in spans
        if sp.open_i <= i < (sp.close_i if sp.close_i is not None else 10**18)
        and sp.hash_lo <= h < sp.hash_hi
    ]
    assert len(owners) == 1, (i, h, [sp.as_tuple() for sp in owners])
    return owners[0].shard_id


@settings(max_examples=40, deadline=None)
@given(data=st.data())
def test_lineage_partition_invariant(data):
    """At EVERY record index the open shards' hash ranges exactly
    partition [0, HASH_SPACE): splits and merges transfer range
    ownership, never losing or overlapping a key hash. Children always
    name their closed parents (the DescribeStream lineage walk)."""
    shards = data.draw(st.integers(min_value=1, max_value=6))
    spans = shard_lineage(shards, [])
    events = []
    at = 0
    for _ in range(data.draw(st.integers(min_value=0, max_value=8))):
        at += data.draw(st.integers(min_value=1, max_value=50))
        open_spans = sorted(
            (sp for sp in spans if sp.close_i is None), key=lambda s: s.hash_lo
        )
        splittable = [sp for sp in open_spans if sp.hash_hi - sp.hash_lo >= 2]
        ops = []
        if splittable:
            ops.append("split")
        if len(open_spans) >= 2:
            ops.append("merge")
        op = data.draw(st.sampled_from(ops))
        if op == "split":
            sid = data.draw(st.sampled_from([sp.shard_id for sp in splittable]))
            events.append({"at": at, "op": "split", "shard": sid})
        else:
            k = data.draw(st.integers(min_value=0, max_value=len(open_spans) - 2))
            events.append(
                {
                    "at": at,
                    "op": "merge",
                    "shards": [open_spans[k].shard_id, open_spans[k + 1].shard_id],
                }
            )
        spans = shard_lineage(shards, events)

    boundaries = sorted({0, at + 1, *(e["at"] for e in events)})
    for i in boundaries:
        open_now = sorted(
            (
                sp
                for sp in spans
                if sp.open_i <= i
                and (sp.close_i is None or i < sp.close_i)
            ),
            key=lambda s: s.hash_lo,
        )
        assert open_now[0].hash_lo == 0
        assert open_now[-1].hash_hi == HASH_SPACE
        for a, b in zip(open_now, open_now[1:]):
            assert a.hash_hi == b.hash_lo, "gap/overlap in hash ranges"
    by_id = {sp.shard_id: sp for sp in spans}
    for sp in spans:
        for p in sp.parents:
            assert by_id[p].close_i == sp.open_i, "child opens when parent closes"


def test_lineage_rejects_invalid_plans():
    with pytest.raises(ValueError, match="non-adjacent"):
        shard_lineage(4, [{"at": 10, "op": "merge", "shards": [0, 2]}])
    with pytest.raises(ValueError, match="out of order"):
        shard_lineage(
            4,
            [
                {"at": 20, "op": "split", "shard": 0},
                {"at": 10, "op": "split", "shard": 1},
            ],
        )
    with pytest.raises(ValueError, match="unknown/closed"):
        shard_lineage(
            4,
            [
                {"at": 10, "op": "split", "shard": 1},
                {"at": 20, "op": "split", "shard": 1},
            ],
        )


def test_reshard_batch_routing(spark):
    """Batch read under a split+merge plan: every record appears exactly
    once, owned by the unique shard whose hash range covers its
    partition key at its index (checked independently), seq_no = the
    global index."""
    _register_source(spark)
    df = (
        spark.read.format("kinesis_sim")
        .option("n", _N)
        .option("shards", _SHARDS)
        .option("reshard", json.dumps(_EVENTS))
        .load()
    )
    rows = df.collect()
    assert len(rows) == _N
    spans = shard_lineage(_SHARDS, _EVENTS)
    seen = set()
    for r in rows:
        assert r.seq_no == r.arrival_s
        i = r.seq_no
        assert i not in seen
        seen.add(i)
        key = _trade(i)["tickerSymbol"]
        assert r.partition_key == key
        assert r.shard_id == _owner_at(spans, i, _key_hash(key))
    assert seen == set(range(_N))


def _read_stream(spark, tmp_path, n, per_batch, events):
    _register_source(spark)
    out = str(tmp_path / "out")
    q = (
        spark.readStream.format("kinesis_sim")
        .option("n", n)
        .option("shards", _SHARDS)
        .option("records_per_batch", per_batch)
        .option("reshard", json.dumps(events))
        .load()
        .writeStream.format("parquet")
        .option("path", out)
        .option("checkpointLocation", str(tmp_path / "ckpt"))
        .trigger(processingTime="300 milliseconds")
        .start()
    )
    deadline = time.time() + 90
    while time.time() < deadline:
        try:
            if spark.read.parquet(out).count() >= n:
                break
        except Exception:
            pass
        time.sleep(0.3)
    q.stop()
    q.awaitTermination()
    return spark.read.parquet(out)


def test_reshard_stream_equals_batch(spark, tmp_path):
    """The stream view of a resharding shard set delivers EXACTLY the
    batch content — no record lost or duplicated at an offset boundary,
    a reshard boundary, or their intersection. per_batch=350 does not
    divide the event indexes (400, 800), so batch [350,700) straddles
    the split and [700,1050) straddles the merge: the interior clipping
    of a span window inside one offset range is really exercised."""
    stream_df = _read_stream(spark, tmp_path, _N, 350, _EVENTS)
    batch_df = (
        spark.read.format("kinesis_sim")
        .option("n", _N)
        .option("shards", _SHARDS)
        .option("reshard", json.dumps(_EVENTS))
        .load()
    )
    cols = ["shard_id", "seq_no", "partition_key", "arrival_s"]
    s = sorted(map(tuple, stream_df.select(*cols).collect()))
    b = sorted(map(tuple, batch_df.select(*cols).collect()))
    assert s == b
    assert len(s) == _N


def test_reshard_per_key_order_across_handoff(spark):
    """Per-key order across the parent->child handoff: each partition
    key's records have strictly increasing seq_nos, change owning shard
    ONLY at reshard boundaries, and every ownership transition follows
    the lineage graph (the new owner names the old one as a parent)."""
    _register_source(spark)
    rows = (
        spark.read.format("kinesis_sim")
        .option("n", _N)
        .option("shards", _SHARDS)
        .option("reshard", json.dumps(_EVENTS))
        .load()
        .collect()
    )
    spans = shard_lineage(_SHARDS, _EVENTS)
    parents = {sp.shard_id: set(sp.parents) for sp in spans}
    event_ats = {e["at"] for e in _EVENTS}
    by_key: dict = {}
    for r in rows:
        by_key.setdefault(r.partition_key, []).append((r.seq_no, r.shard_id))
    assert len(by_key) > 3, "fixture should spread keys over shards"
    transitions = 0
    for key, recs in by_key.items():
        recs.sort()
        for (s0, sh0), (s1, sh1) in zip(recs, recs[1:]):
            assert s0 < s1
            if sh0 != sh1:
                transitions += 1
                assert sh0 in parents[sh1], (key, sh0, sh1)
                # the handoff happens exactly at a reshard boundary:
                # last parent record before `at`, first child record after
                boundary = next(
                    sp.open_i for sp in spans if sp.shard_id == sh1
                )
                assert boundary in event_ats
                assert s0 < boundary <= s1
    assert transitions > 0, "plan must actually move at least one key"


def test_reshard_routing_preserves_content():
    """Resharding changes ROUTING only, never the data: the union of all
    shard spans' rows carries exactly the same (seq-ordered) trade
    payloads the static reader would emit for the same n — pure-Python
    check over the row generators, no Spark needed."""
    from kinesis_datastore_app_spark.sources.kinesis_sim import (
        _reshard_rows,
        _rows,
    )

    spans = shard_lineage(_SHARDS, _EVENTS)
    resharded = {}
    for sp in spans:
        for r in _reshard_rows(sp.as_tuple(), 0, _N):
            assert r[1] not in resharded, "duplicate global seq"
            resharded[r[1]] = (r[2], r[3])  # key, payload

    static = {}
    for s in range(_SHARDS):
        for r in _rows(s, _SHARDS, 0, _N):
            static[r[4]] = (r[2], r[3])  # arrival_s = global index

    assert resharded == static


def test_reshard_stream_restart_exactly_once(spark, tmp_path):
    """Kill the resharding stream BEFORE the first reshard boundary and
    restart from the checkpoint: the replay drives through both the
    split and the merge and must end with exactly one copy of every
    record — the exactly-once contract holds across reshard events, not
    just static offset ranges. per_batch=70 does not divide the event
    indexes (300, 500): batches [280,350) and [490,560) straddle them."""
    from tests.conftest import kill_restart_stream

    n, events = 800, [
        {"at": 300, "op": "split", "shard": 0},
        {"at": 500, "op": "merge", "shards": [1, 2]},
    ]
    df = kill_restart_stream(
        spark,
        tmp_path,
        n,
        {
            "shards": _SHARDS,
            "records_per_batch": 70,
            "reshard": json.dumps(events),
        },
    )
    assert df.count() == n
    assert df.select("seq_no").distinct().count() == n
