"""Structural scaling invariants (round 5).

The wall-clock scaling probe (`tools/scale_probe.py`) found a real
quadratic in `sim_search_ivf` — the IVF list count grew linearly with
the corpus — that three rounds of correctness gates and plan audits
missed, because at a FIXED scale factor a super-linear term is
invisible. These tests pin the probe's lessons as deterministic
ROW-COUNT invariants over m-scaled corpora (timing asserts would flake
on a shared box; counts cannot): run the operator's sizing logic at two
corpus sizes and assert the structural quantity scales the way the
100 TB design claims.

Corpora come from the probe's own builder at sf0.01 (500 docs / 500
vectors at m=1), cached in fingerprinted scratch like every fixture
artifact.
"""

from __future__ import annotations

import os
import sys

import pytest
from pyspark.sql import functions as F

sys.path.insert(0, os.path.dirname(os.path.dirname(os.path.abspath(__file__))))

from tools.scale_probe import _probe_dir

# Honor the same fixture override as the rest of the oracle suite
# (conftest.SF_ORACLE) instead of hardcoding a path.
SF = os.environ.get("SPARK_GRAFT_TEST_SF_DIR", "/root/testdata/sf0.01")
M = 4


@pytest.fixture(scope="module")
def dirs(spark):
    return {1: _probe_dir(spark, SF, 1), M: _probe_dir(spark, SF, M)}


def test_ivf_list_count_stays_constant(spark, dirs):
    """The round-5 defect, pinned: the IVF index must keep ~N_LISTS_TARGET
    lists at ANY corpus size (the old constant stride grew lists linearly
    with the corpus, making the n x n_lists assignment quadratic). Count
    the centroids the operator's own sizing logic selects at 1x and 4x:
    both must be within one stride-rounding of the target, so the 4x
    corpus must NOT have ~4x the lists."""
    from kinesis_datastore_app_spark.catalog import table
    from kinesis_datastore_app_spark.llm.simsearch import (
        CENTROID_PHASE,
        N_LISTS_TARGET,
    )

    lists = {}
    for m, d in dirs.items():
        e = table(spark, d, "embeddings")
        n = e.count()
        stride = (n + N_LISTS_TARGET - 1) // N_LISTS_TARGET
        phase = min(CENTROID_PHASE, stride - 1)
        lists[m] = e.filter(F.col("vec_id") % stride == phase).count()
    # vec_ids are copy-offset (not contiguous), so the modular sample can
    # land under the target but never meaningfully above it, and the 4x
    # count must stay in the same band instead of quadrupling.
    assert lists[M] <= N_LISTS_TARGET + 1, lists
    assert lists[M] <= 2 * lists[1], lists


def test_minhash_pairs_exactly_linear(spark, dirs):
    """The probe corpus's first-letter rotation is a bijection on the
    shingle space per copy, so dedup_near_minhash's output at m=4 must be
    EXACTLY 4 copies of the m=1 output — any cross-copy pair or missing
    within-copy pair means the collapse/LSH/expansion machinery leaks
    between independent sub-corpora."""
    from kinesis_datastore_app_spark.llm.dedup import (
        _mh_collapse,
        _mhv_shingle_hashes,
        _minhash_pairs,
    )
    from kinesis_datastore_app_spark.catalog import table

    counts = {}
    for m, d in dirs.items():
        corpus = table(spark, d, "documents").select(
            "doc_id", F.lower(F.col("text")).alias("text")
        )
        members, rsh = _mh_collapse(_mhv_shingle_hashes(corpus))
        counts[m] = _minhash_pairs(members, rsh).count()
    assert counts[M] == M * counts[1], counts


def test_minhash_lsh_candidates_stay_linear(spark, dirs):
    """Candidate volume (the pre-verification quadratic risk) must scale
    linearly in m: copies occupy disjoint shingle spaces, so band-bucket
    collisions cannot cross copies — candidates at m=4 are exactly 4x the
    m=1 candidates plus at most a sliver of accidental mod-P collisions."""
    from kinesis_datastore_app_spark.llm.dedup import (
        _MH_A,
        _MH_B,
        _MH_BANDS,
        _MH_K,
        _MH_ROWS,
        _MHV_P,
        _mh_collapse,
        _mhv_shingle_hashes,
    )
    from kinesis_datastore_app_spark.catalog import table

    def candidates(d: str) -> int:
        corpus = table(spark, d, "documents").select(
            "doc_id", F.lower(F.col("text")).alias("text")
        )
        members, rsh = _mh_collapse(_mhv_shingle_hashes(corpus))
        mh = rsh.groupBy("doc_id").agg(
            *[
                F.min(
                    (F.lit(_MH_A[k]) * F.col("shv") + _MH_B[k]) % _MHV_P
                ).alias(f"mh{k}")
                for k in range(_MH_K)
            ]
        )

        def sig(b: int):
            out = F.col(f"mh{b * _MH_ROWS}")
            for r in range(1, _MH_ROWS):
                out = (out * 31 + F.col(f"mh{b * _MH_ROWS + r}")) % _MHV_P
            return out

        bands = mh.select(
            "doc_id",
            F.explode(
                F.array(
                    *[
                        F.struct(F.lit(b).alias("band"), sig(b).alias("sig"))
                        for b in range(_MH_BANDS)
                    ]
                )
            ).alias("bs"),
        ).select("doc_id", "bs.band", "bs.sig")
        return (
            bands.alias("x")
            .join(
                bands.alias("y"),
                (F.col("x.band") == F.col("y.band"))
                & (F.col("x.sig") == F.col("y.sig"))
                & (F.col("x.doc_id") < F.col("y.doc_id")),
            )
            .select("x.doc_id", "y.doc_id")
            .distinct()
            .count()
        )

    c1, cm = candidates(dirs[1]), candidates(dirs[M])
    assert cm <= M * c1 + max(5, c1 // 10), (c1, cm)


def test_ground_truth_sample_sizes_stay_bounded(spark, dirs):
    """The round-5 probe's second catch, pinned: the sampled ground-truth
    verifiers (dedup_embedding_cosine, dedup_edit_distance) must select a
    ~constant-size sample at ANY corpus size — the old constant strides
    let the sample grow with the corpus, hiding an unbounded quadratic
    inside documented 'exact small tail' ops. Count what each op's own
    sizing logic samples at 1x and 4x: bounded by target (+ rounding),
    never ~4x."""
    from kinesis_datastore_app_spark.catalog import corpus_count, table
    from kinesis_datastore_app_spark.llm.dedup import _EDIT_SAMPLE_TARGET
    from kinesis_datastore_app_spark.llm.simsearch import _COS_SAMPLE_TARGET

    for tbl, id_col, target in (
        ("embeddings", "vec_id", _COS_SAMPLE_TARGET),
        ("documents", "doc_id", _EDIT_SAMPLE_TARGET),
    ):
        sampled = {}
        for m, d in dirs.items():
            n = corpus_count(spark, d, tbl)
            stride = (n + target - 1) // target
            sampled[m] = (
                table(spark, d, tbl).filter(F.col(id_col) % stride == 0).count()
            )
        # copy-offset ids make the modular sample land at-or-under the
        # target; the scaled corpus must stay in the same band, never
        # scale with m
        assert sampled[M] <= target + M, (tbl, sampled)
        assert sampled[M] <= 2 * max(sampled[1], 1), (tbl, sampled)


def test_chunk_grid_cell_sizes_stay_bounded(spark):
    """Structural form of the skew bound: on a seeded hot key (f=600,
    cap=64 → c=10 chunks, 55 grid cells) every (key, gi, gj) join cell
    holds ≤ ~cap rows per side (hash-balanced, 3× slack), so no task's
    join work exceeds ~cap² however hot the key — the row-count
    invariant behind _skew_bounded_self_pairs' per-task claim."""
    from kinesis_datastore_app_spark.llm.dedup import _tag_chunks

    cap = 64
    df = spark.createDataFrame(
        [("hot", d) for d in range(600)], "shingle string, doc_id long"
    )
    tagged = _tag_chunks(df, ["shingle"], cap)
    left = tagged.select(
        "shingle",
        "doc_id",
        F.col("_g").alias("_gi"),
        F.explode(F.sequence(F.col("_g"), F.col("_c") - 1)).alias("_gj"),
    )
    right = tagged.select(
        "shingle",
        "doc_id",
        F.explode(F.sequence(F.lit(0), F.col("_g"))).alias("_gi"),
        F.col("_g").alias("_gj"),
    )
    for side in (left, right):
        per_cell = (
            side.groupBy("shingle", "_gi", "_gj")
            .count()
            .agg(F.max("count"))
            .first()[0]
        )
        assert per_cell <= 3 * cap, per_cell
    # the replication overhead must stay c+1 rows per input row
    c = tagged.select(F.max("_c")).first()[0]
    assert c == 10
    assert left.count() + right.count() == 600 * (c + 1)


def test_outer_join_output_exactly_linear(spark, dirs):
    """Round-9 stream_stream_join_outer: probe copies offset user_id per
    copy, so purchase↔error pairings cannot cross copies — the outer
    join's output (matched pairs + one null row per unmatched purchase)
    at m=4 must be EXACTLY 4x the m=1 output. A super-linear term here
    would mean the join state pairs rows across independent
    sub-universes (the quadratic failure a watermarked time-bound join
    exists to prevent)."""
    from kinesis_datastore_app_spark import registry

    registry.load_all()
    counts = {
        m: registry.QUERIES["stream_stream_join_outer"](spark, d).count()
        for m, d in dirs.items()
    }
    assert counts[M] == M * counts[1], counts


def test_sem_bits_bounds_verify_bucket_cardinality():
    """dedup_semantic_cluster's adaptive SRP depth: 2^B sub-buckets per
    coarse cluster must keep the EXPECTED (cluster, sig) bucket
    cardinality <= SEM_BUCKET_TARGET at every corpus size (the verify
    self-join's pair grid stays bounded), and the depth must be
    minimal (no over-splitting, which would cost recall for nothing)."""
    from kinesis_datastore_app_spark.llm.simsearch import (
        SEM_BUCKET_TARGET,
        SEM_COARSE,
        _sem_bits,
    )

    denom = SEM_COARSE * SEM_BUCKET_TARGET
    for n in (1, 5, denom, denom + 1, 5_000, 80_000, 10**6, 10**9):
        b = _sem_bits(n)
        need = (n + denom - 1) // denom
        assert (1 << b) >= need, (n, b)  # expected cardinality bounded
        if b:
            assert (1 << (b - 1)) < need, (n, b)  # minimal depth
