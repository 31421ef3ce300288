"""Deduplication operators for training-data pipelines (SURVEY.md §2.B10).

Reference motivation: the async double-send (KinesisAsync.java:96-97)
makes exact dedup part of the reference's own semantics
(operators/aggregates.py:dedup_exact); near-dup dedup generalizes it to
content similarity, the workhorse of LLM corpus prep.

Family:
* exact        — hash groupBy on content hash (dedup_doc_exact);
* n-gram Jaccard — exact pairwise similarity on shingle sets (oracle-
  checked); the brute-force ground truth;
* MinHash+LSH  — identical-content collapse → banded signatures →
  candidate buckets → exact verify → group expansion; the 100 TB path:
  cost is O(docs × bands) + per-bucket representative pairs, never
  all-pairs, and verbatim-copy mega-clusters are single nodes;
* SimHash      — 48-bit shingle-feature fingerprints, identical-print
  collapse, complete hamming ≤ 3 pairs via 4×12-bit block buckets.

All MinHash/SimHash primitives are pure Catalyst expressions (modular
integer hashes, explode, groupBy-min, bit ops) — no Python in the hot
path, linear shuffles only, and every hash is engine-independent so the
DuckDB oracles replay candidate generation bit-for-bit.
"""

from __future__ import annotations

import functools

from pyspark.sql import DataFrame, SparkSession
from pyspark.sql import functions as F

from kinesis_datastore_app_spark.catalog import (
    corpus_count,
    published_parquet,
    scratch_tag,
    table,
)
from kinesis_datastore_app_spark.checkpointing import (
    materialize_swap,
    persistent_rdd_ids,
    unpersist_rdd_ids,
)
from kinesis_datastore_app_spark.llm.tokenization import tokens
from kinesis_datastore_app_spark.registry import register

# --------------------------------------------------------------------------
# shared shingling
# --------------------------------------------------------------------------


# the tokenization contract lives in llm/tokenization.py — dedup's
# shingle builders must ride the SAME token stream as text/pipeline/
# multimodal or their outputs stop composing (round-8 review: this was
# a byte-identical private copy that could drift)
_tokens = tokens


def _shingles(df: DataFrame, n: int = 3) -> DataFrame:
    """doc_id → exploded distinct n-gram (word) shingles, built with
    transform over token indexes — all JVM-side."""
    toks = _tokens()
    idxs = F.sequence(F.lit(0), F.greatest(F.size(toks) - n, F.lit(0)))
    shingle = F.transform(
        idxs, lambda i: F.concat_ws(" ", F.slice(toks, i + 1, n))
    )
    return df.select(
        "doc_id", F.explode(F.array_distinct(shingle)).alias("shingle")
    ).filter(F.length("shingle") > 0)


# The MinHash pipeline reads the shingle set three times (signatures,
# set sizes, exact verify). Materialize the inverted index ONCE per
# (sf, n) to scratch parquet and read it back, instead of holding a
# persist()ed DataFrame in a module-level cache (unbounded executor-
# memory residency across a long session — flagged in round 1). At
# 100 TB this is exactly the "checkpoint the inverted index to storage
# between candidate generation and verification" step; the three
# downstream references become plain columnar scans with pushdown, and
# no RDD blocks outlive the query. Publication is atomic (write to a
# temp dir, rename into place) so a crashed writer never leaves a
# partial dir that later runs would silently reuse.


def _shingles_cached(spark: SparkSession, sf_dir: str, n: int) -> DataFrame:
    # Fingerprinted cache key (size+mtime of documents.parquet): a
    # regenerated fixture or basename collision addresses a fresh dir,
    # never silently reusing stale shingles.
    return _published_parquet(
        spark,
        sf_dir,
        f"shingles_n{n}",
        lambda: _shingles(table(spark, sf_dir, "documents"), n),
    )


# Per-shingle document-frequency cap for the exact inverted-index pair
# join: a shingle shared by f docs yields f·(f-1)/2 candidate rows, ALL
# through the one reducer that owns that join key — at web scale a
# boilerplate 2-gram in 10⁶ docs is 5·10¹¹ rows through one task (the
# "hot shingle" skew bomb). Above the cap the key's posting list is
# hash-split into c = ⌈df/cap⌉ chunks and every chunk PAIR (i ≤ j)
# becomes its own join key, so per-task join work and output are both
# bounded by ~cap² regardless of df. 1024 keeps the fixture corpora
# entirely on the plain path (max df ≪ 1024) while the property tests
# force the chunked path with cap=2.
_HOT_SHINGLE_CAP = 1024

# Measured-scale memo for the adaptive plan dispatches below (pair-join
# max chunk count, expansion max group size): one int per
# (operator, fixture fingerprint) of driver state. Keyed on the corpus
# fingerprint like every scratch artifact, so a regenerated fixture
# re-measures instead of serving a stale plan choice.
_MAXN_CACHE: dict[str, int] = {}


def _chunk_count(n_col: str, cap: int):
    """⌈n/cap⌉ as int — THE chunk-count formula. Single definition
    shared by ``_tag_chunks`` and ``_expand_groups`` so the pair-join
    and expansion legs can never drift apart."""
    return F.expr(f"CAST(({n_col} + {cap - 1}) DIV {cap} AS INT)")


def _chunk_of(id_col: str):
    """This row's hash chunk in [0, _c) — the single chunk-assignment
    formula (pmod handles xxhash64's negative range)."""
    return F.pmod(F.xxhash64(id_col), F.col("_c")).cast("int")


def _tag_chunks(
    df: DataFrame,
    key_cols: list[str],
    cap: int = _HOT_SHINGLE_CAP,
    id_col: str = "doc_id",
) -> DataFrame:
    """Append the chunk columns ``_c`` (per-key chunk count ⌈freq/cap⌉)
    and ``_g`` (this row's hash chunk) that ``_skew_bounded_self_pairs``
    consumes. The frequency table is a per-key aggregate joined back
    WITHOUT a broadcast hint on purpose: at fixture scale AQE picks a
    broadcast hash join (the tag costs no posting shuffle), and when
    the distinct key count outgrows the broadcast threshold it degrades
    to a sort-merge join on the same key the pair join shuffles on."""
    freq = df.groupBy(*key_cols).agg(F.count(F.lit(1)).alias("_kf"))
    return (
        df.join(freq, key_cols)
        .withColumn("_c", _chunk_count("_kf", cap))
        .withColumn("_g", _chunk_of(id_col))
        .drop("_kf")
    )


def _skew_bounded_self_pairs(
    df: DataFrame,
    key_cols: list[str],
    cap: int = _HOT_SHINGLE_CAP,
    id_col: str = "doc_id",
    payload: tuple[str, ...] = (),
    pretagged: bool = False,
    stats_key: str | None = None,
) -> DataFrame:
    """All unordered same-key row pairs of ``df`` — the within-key
    self-join every candidate generator here uses (inverted shingle
    index, MinHash band buckets, SimHash block buckets) — with per-task
    work bounded by ``cap`` however hot any single key gets.

    Cold keys (frequency ≤ cap) take the plain self-join. Hot keys are
    the balanced-within-key all-pairs shape — the self-join
    specialization of output-balanced theta-join partitioning (Okcan &
    Riedewald, "Processing Theta-Joins using MapReduce", SIGMOD'11:
    cover the output matrix with bounded cells, assign cells to
    reducers), and the join analog of salted aggregation: each row gets
    a hash chunk g ∈ [0, c = ⌈f/cap⌉), then
    replicates into every chunk-pair key it participates in — left role
    under (g, j) for j ∈ [g, c), right role under (i, g) for
    i ∈ [0, g] — and the join key becomes (key, gi, gj). Every
    unordered row pair meets under exactly one chunk-pair key (for
    gx < gy only (gx, gy); for gx = gy the diagonal key with an id
    tie-break), so the pair multiset is EXACT — this redistributes the
    quadratic key across ~c²/2 tasks, it never drops or double-counts a
    candidate (the loss-free replacement for the round-4 bucket cap,
    which dropped 72% of true simhash pairs). Replication cost is c+1
    rows per hot row — O(f²/cap), strictly below the f²/2 pair output
    it feeds. The frequency computation groups on the same key the join
    shuffles on, so both sides arrive co-partitioned.

    Output: one row per unordered pair and shared key occurrence, with
    ``{id_col}_a < {id_col}_b`` and each payload column carried as
    ``{p}_a``/``{p}_b`` alongside its id (payload must be functionally
    dependent on the id, e.g. a doc's simhash print).

    A key at-or-under the cap degenerates to c = 1: one chunk, one
    replica per side, the single diagonal key with the id tie-break —
    byte-identical work to the plain self-join — so there is ONE code
    path, no cold/hot branch (an earlier branched form read the tagged
    posting list four times and doubled fixture-scale cost). When the
    input is itself an ingest artifact (MinHash bands, SimHash blocks),
    pass ``pretagged=True`` and bake the ``_c``/``_g`` chunk columns
    into the artifact via ``_tag_chunks`` — the frequency pass is pure
    corpus-derived index state, so it belongs in the ingest build, not
    in every query. ``stats_key`` additionally enables the adaptive
    dispatch (same idiom as ``connected_components`` and the expansion
    below): one memoized driver int — the table's max chunk count —
    and when it is 1 (no key anywhere near the cap) the plan is the
    classic two-shuffle self-join with no Generate pass at all; the
    chunk grid only enters the plan for a corpus that measurably needs
    it."""
    ida, idb = F.col(f"a.{id_col}"), F.col(f"b.{id_col}")
    key_eq = [F.col(f"a.{k}") == F.col(f"b.{k}") for k in key_cols]
    tagged = df if pretagged else _tag_chunks(df, key_cols, cap, id_col)
    base = [*key_cols, id_col, *payload]
    if stats_key is not None:
        memo_key = f"{stats_key}|cap{cap}"
        max_c = _MAXN_CACHE.get(memo_key)
        if max_c is None:
            # one-time memoized measurement: for a pre-tagged artifact
            # read _c straight off the columnar scan; otherwise the max
            # is fully determined by the per-key frequency aggregate —
            # one shuffle, no join back onto the posting table
            if pretagged:
                max_c = tagged.agg(F.max("_c")).first()[0] or 1
            else:
                max_c = (
                    df.groupBy(*key_cols)
                    .agg(F.count(F.lit(1)).alias("_kf"))
                    .agg(F.max(_chunk_count("_kf", cap)))
                    .first()[0]
                    or 1
                )
            _MAXN_CACHE[memo_key] = max_c
        if max_c == 1:
            plain = (tagged if pretagged else df).select(*base)
            joined = plain.alias("a").join(
                plain.alias("b"),
                functools.reduce(lambda x, y: x & y, key_eq) & (ida < idb),
            )
            cols = [ida.alias(f"{id_col}_a"), idb.alias(f"{id_col}_b")]
            for p in payload:
                cols.append(F.col(f"a.{p}").alias(f"{p}_a"))
                cols.append(F.col(f"b.{p}").alias(f"{p}_b"))
            return joined.select(*cols)
    left = tagged.select(
        *base,
        F.col("_g").alias("_gi"),
        F.explode(F.sequence(F.col("_g"), F.col("_c") - 1)).alias("_gj"),
    )
    right = tagged.select(
        *base,
        F.explode(F.sequence(F.lit(0), F.col("_g"))).alias("_gi"),
        F.col("_g").alias("_gj"),
    )
    # merge hint on BOTH sides: the grid join must exchange on
    # (key, gi, gj) to do its job. Left to its own devices Spark
    # broadcasts the byte-small replicated side, which (a) concentrates
    # the entire pair generation on the probe side's ARBITRARY input
    # partitioning — the exact single-task funnel the grid exists to
    # prevent — and (b) pays hash-chain traversal for the cap-deep
    # duplicate keys (measured 72 s vs 9 s for SMJ on a 3.2e9-pair hot
    # key at local[32]; plain single-key join: 9.6 s).
    joined = left.alias("a").hint("merge").join(
        right.alias("b").hint("merge"),
        functools.reduce(lambda x, y: x & y, key_eq)
        & (F.col("a._gi") == F.col("b._gi"))
        & (F.col("a._gj") == F.col("b._gj"))
        # off-diagonal keys hold disjoint chunks (no self/dup pairs
        # possible); the diagonal needs the usual id tie-break
        & ((F.col("a._gi") != F.col("a._gj")) | (ida < idb)),
    )
    # emit with ids ordered; payload stays attached to its own row
    first = ida < idb
    cols = [
        F.least(ida, idb).alias(f"{id_col}_a"),
        F.greatest(ida, idb).alias(f"{id_col}_b"),
    ]
    for p in payload:
        pa, pb = F.col(f"a.{p}"), F.col(f"b.{p}")
        cols.append(F.when(first, pa).otherwise(pb).alias(f"{p}_a"))
        cols.append(F.when(first, pb).otherwise(pa).alias(f"{p}_b"))
    return joined.select(*cols)


def _shingle_pair_counts(
    sh: DataFrame,
    cap: int = _HOT_SHINGLE_CAP,
    stats_key: str | None = None,
) -> DataFrame:
    """Exact (doc_a < doc_b, n_common) shared-shingle counts via the
    skew-bounded inverted-index self-join (see
    ``_skew_bounded_self_pairs`` — one pair row per shared shingle,
    counted here into the intersection size)."""
    return (
        _skew_bounded_self_pairs(sh, ["shingle"], cap, stats_key=stats_key)
        .groupBy(
            F.col("doc_id_a").alias("doc_a"), F.col("doc_id_b").alias("doc_b")
        )
        .agg(F.count(F.lit(1)).alias("n_common"))
    )


_EXACT_ORACLE = """
SELECT md5(text) AS content_hash,
       COUNT(*) AS n_copies,
       MIN(doc_id) AS keeper_doc_id
FROM (SELECT doc_id, text FROM documents
      UNION ALL
      SELECT doc_id + 2305843009213693952 AS doc_id, text FROM documents WHERE doc_id % 5 = 0)
GROUP BY md5(text)
"""


@register("dedup_doc_exact", oracle=_EXACT_ORACLE)
def dedup_doc_exact(spark: SparkSession, sf_dir: str) -> DataFrame:
    """Exact content dedup: hash-groupBy on md5(text) over a corpus where
    20% of docs were re-ingested under new ids. Keeps the smallest id —
    deterministic keeper selection (min is order-independent)."""
    d = table(spark, sf_dir, "documents").select("doc_id", "text")
    doubled = d.unionByName(
        d.filter(F.col("doc_id") % 5 == 0).select(
            (F.col("doc_id") + (1 << 61)).alias("doc_id"), "text"
        )
    )
    return doubled.groupBy(F.md5(F.col("text").cast("binary")).alias("content_hash")).agg(
        F.count(F.lit(1)).alias("n_copies"),
        F.min("doc_id").alias("keeper_doc_id"),
    )


# Shared CTE block: doc_id%10 sample → 2-gram shingles → pair intersection
# counts (reused by the pair query and the connected-components oracle).
_JACCARD_CTES = """
docs AS (SELECT doc_id, text FROM documents WHERE doc_id % 10 = 0),
toks AS (
  SELECT doc_id, list_transform(
           range(greatest(len(string_split(lower(text), ' ')) - 2, 0) + 1),
           i -> array_to_string(string_split(lower(text), ' ')[i + 1 : i + 2], ' ')
         ) AS all_sh
  FROM docs
),
sh AS (
  -- len(s) > 0 mirrors the Spark side's F.length(shingle) > 0 exactly:
  -- without it an empty-text doc (split('') = ['']) keeps one ''
  -- shingle here while Spark drops it, and two empty docs would pair
  -- at jaccard 1.0 in the oracle only (round-8 review finding)
  SELECT DISTINCT doc_id,
         unnest(list_filter(list_distinct(all_sh), s -> len(s) > 0)) AS shingle
  FROM toks
),
sizes AS (SELECT doc_id, COUNT(*) AS n_sh FROM sh GROUP BY doc_id),
pairs AS (
  SELECT a.doc_id AS doc_a, b.doc_id AS doc_b, COUNT(*) AS n_common
  FROM sh a JOIN sh b ON a.shingle = b.shingle AND a.doc_id < b.doc_id
  GROUP BY a.doc_id, b.doc_id
)
"""

_JACCARD_ORACLE = f"""
WITH {_JACCARD_CTES}
SELECT p.doc_a, p.doc_b,
       round(CAST(p.n_common AS DOUBLE)
             / (sa.n_sh + sb.n_sh - p.n_common), 9) AS jaccard
FROM pairs p
JOIN sizes sa ON sa.doc_id = p.doc_a
JOIN sizes sb ON sb.doc_id = p.doc_b
WHERE CAST(p.n_common AS DOUBLE) / (sa.n_sh + sb.n_sh - p.n_common) >= 0.05
"""


@register("dedup_ngram_jaccard", oracle=_JACCARD_ORACLE)
def dedup_ngram_jaccard(spark: SparkSession, sf_dir: str) -> DataFrame:
    """Exact n-gram-Jaccard near-dup pairs (ground truth for the
    approximate variants): 2-gram shingles (threshold 0.05 — the synthetic
    corpus has no true near-dups, so the gate sits in the top tail of its
    similarity distribution), inverted-index join on shingle
    (NOT all-pairs — only docs sharing a shingle meet), Jaccard from
    intersection/union counts. The shingle join is the scalable shape:
    candidate generation is bounded by shared-shingle frequency, and hot
    shingles (stopword runs — the per-key skew bomb) are chunk-split
    above ``_HOT_SHINGLE_CAP`` by ``_shingle_pair_counts``, bounding any
    single task's join work at ~cap² without dropping a pair. The
    shingle set comes from the published ``shingles_n2`` ingest artifact
    (the pair count reads it from several join sides — df tagging, both
    chunk roles, sizes — so each read must be a columnar scan, not a
    re-run of the explode; the doc_id%10 sample is a pushed-down
    filter on that scan)."""
    sh = _shingles_cached(spark, sf_dir, 2).filter(F.col("doc_id") % 10 == 0)
    sizes = sh.groupBy("doc_id").agg(F.count(F.lit(1)).alias("n_sh"))
    pairs = _shingle_pair_counts(
        sh, stats_key=f"sh2s10:{scratch_tag(sf_dir, 'documents')}"
    )
    sa = sizes.alias("sa")
    sb = sizes.alias("sb")
    jac = F.col("n_common").cast("double") / (
        F.col("sa.n_sh") + F.col("sb.n_sh") - F.col("n_common")
    )
    return (
        pairs.join(sa, F.col("doc_a") == F.col("sa.doc_id"))
        .join(sb, F.col("doc_b") == F.col("sb.doc_id"))
        .filter(jac >= 0.05)
        .select("doc_a", "doc_b", F.round(jac, 9).alias("jaccard"))
    )


# --------------------------------------------------------------------------
# MinHash / SimHash near-dup detection
# --------------------------------------------------------------------------
# Both operators live AFTER the shared engine-independent hash machinery
# below (they reuse it): see dedup_near_minhash / dedup_simhash past the
# *_verify twins. Round-5 redesign notes (replaces the round-4
# _MAX_LSH_BUCKET cap, which was measured to be lossy at sf0.1: the
# oversized 16-bit simhash buckets were key collisions among correlated
# unigram fingerprints — 830 docs / 829 distinct digests in the largest —
# not near-identical clusters, so excluding them dropped ~72% of true
# pairs):
#
# * features are 3-gram SHINGLE hashes, not unigram tokens — the ~30-word
#   synthetic vocabulary saturates unigram sign-votes (all fingerprints
#   converge and 16-bit block keys collide en masse); the shingle space
#   is vocab³ and separates cleanly (max 12-bit block bucket at sf0.1:
#   8 docs, vs 830 before);
# * identical-content mass is COLLAPSED to one representative per group
#   before any quadratic step (minhash: identical shingle-set digest;
#   simhash: identical fingerprint) and expanded back into output pairs
#   afterwards — this, not a lossy bucket cap, is the bound that keeps a
#   boilerplate mega-cluster (a million verbatim copies at 100 TB) from
#   blowing up the bucket self-join: the cluster is ONE node during
#   candidate generation, and the final pair expansion is output-sized
#   work by definition;
# * every hash is engine-independent integer arithmetic (the same
#   polynomial/LCG machinery as the *_verify twins), so both operators
#   now carry full DuckDB oracles — the driver hash-checks them end to
#   end instead of the old rows-only "no_oracle" row.


# --------------------------------------------------------------------------
# mutant-seeded recall twins of the two near-dup paths
# --------------------------------------------------------------------------
# Since round 5 the main operators are themselves hash-verifiable (same
# engine-independent integer-hash machinery). The twins remain for a
# different job: their corpora are seeded with deterministic mutants
# (half-truncation / single-token-edit) so the bucket joins PROVABLY
# catch real near-dups — the synthetic fixture has almost none of its
# own — and the recall floors are property-tested
# (tests/test_properties.py::test_verify_twins_catch_seeded_mutants).
# Both run the full pipeline shapes (minhash → banded LSH buckets →
# candidate equi-join → exact verify; simhash bit votes → fingerprint →
# block buckets → hamming) on polynomial/minstd-LCG BIGINT hashes, so
# DuckDB replays candidate generation bit-for-bit.

_MHV_P = 1_000_000_007
_MHV_K = 16  # minhash functions: 8 bands x 2 rows — ~0.9 recall at j=0.5
_MHV_BANDS = 8
_MHV_ROWS = _MHV_K // _MHV_BANDS


def _band_sig_sql(b: int, rows: int) -> str:
    """Band-signature fold in SQL, mirroring _banded_sigs step for step
    — the SINGLE definition both minhash pipelines (the 16-hash twin and
    the 32-hash main operator) replay, so the fold can never drift
    between them (round-8 review: the two copies differed only in
    constants and had to be kept bit-identical by hand)."""
    out = f"mh{b * rows}"
    for r in range(1, rows):
        out = f"(({out}) * 31 + mh{b * rows + r}) % {_MHV_P}"
    return out


def _sig_sql(b: int) -> str:
    return _band_sig_sql(b, _MHV_ROWS)


# Shared minstd permutation coefficients: hash k is a_k·shv + b_k mod P
# with a_k = 48271^(k+1), b_k = 16807·(k+1). ONE list serves both
# pipelines — the twin uses the first _MHV_K, the main operator the
# first _MH_K (=32).
_COEF_A = [pow(48271, k + 1, _MHV_P) for k in range(64)]
_COEF_B = [(16807 * (k + 1)) % _MHV_P for k in range(64)]
_MHV_A = _COEF_A[:_MHV_K]
_MHV_B = _COEF_B[:_MHV_K]


def _banded_sigs(
    sh: DataFrame, a: list[int], b: list[int], n_bands: int, rows: int
) -> DataFrame:
    """(doc_id, band, sig): banded minhash signatures — groupBy-min
    permutations folded into band keys. The single Python twin of
    _band_sig_sql, parameterized by coefficient slice and geometry."""
    k = n_bands * rows
    mh = sh.groupBy("doc_id").agg(
        *[
            F.min((F.lit(a[j]) * F.col("shv") + b[j]) % _MHV_P).alias(f"mh{j}")
            for j in range(k)
        ]
    )

    def _sig(bb: int):
        out = F.col(f"mh{bb * rows}")
        for r in range(1, rows):
            out = (out * 31 + F.col(f"mh{bb * rows + r}")) % _MHV_P
        return out

    return mh.select(
        "doc_id",
        F.explode(
            F.array(
                *[
                    F.struct(F.lit(bb).alias("band"), _sig(bb).alias("sig"))
                    for bb in range(n_bands)
                ]
            )
        ).alias("bs"),
    ).select("doc_id", "bs.band", "bs.sig")
# Mutant doc ids = original + offset. 1<<61, NOT a small fixed constant:
# a 500k offset aliases real doc_ids once the corpus exceeds 500k docs —
# the same scale-latent id-collision class fixed in multimodal
# (_DUP_OFFSET = 1<<61) and text_decontaminate (negative ids). 2^61 is
# far above any realistic doc_id while original + offset stays inside
# int64 (doc_id would need to exceed 2^62 to overflow).
_MUT_OFF = 1 << 61

# corpus: every 10th doc, plus a half-length mutant of every 30th —
# containment ~1 against its source, Jaccard ~0.5: inside LSH reach.
_TWIN_CORPUS_SQL = """
SELECT doc_id, lower(text) AS text FROM documents WHERE doc_id % 10 = 0
UNION ALL
SELECT doc_id + 2305843009213693952 AS doc_id,
       array_to_string(string_split(lower(text), ' ')
         [1 : greatest(len(string_split(lower(text), ' ')) // 2, 1)], ' ')
FROM documents WHERE doc_id % 10 = 0 AND doc_id % 3 = 0
"""


def _twin_corpus(spark: SparkSession, sf_dir: str) -> DataFrame:
    d = table(spark, sf_dir, "documents")
    base = d.filter(F.col("doc_id") % 10 == 0).select(
        "doc_id", F.lower(F.col("text")).alias("text")
    )
    toks = _tokens()
    half = F.array_join(
        F.slice(toks, 1, F.greatest(F.floor(F.size(toks) / 2).cast("int"), F.lit(1))),
        " ",
    )
    mut = (
        d.filter((F.col("doc_id") % 10 == 0) & (F.col("doc_id") % 3 == 0))
        .select((F.col("doc_id") + _MUT_OFF).alias("doc_id"), half.alias("text"))
    )
    return base.unionByName(mut)


def _mhv_shingle_hashes(corpus: DataFrame) -> DataFrame:
    """(doc_id, shv): distinct 3-gram shingle hashes via the polynomial
    token-value fold — replicated verbatim in the oracle SQL."""
    vals = F.transform(
        F.split(F.col("text"), " "), lambda t: F.ascii(t) * 7 + F.length(t)
    )
    shv = F.transform(
        F.sequence(F.lit(1), F.greatest(F.size(vals) - 2, F.lit(1))),
        lambda i: (
            (F.element_at(vals, i).cast("bigint") * 31 + F.element_at(vals, i + 1))
            % _MHV_P
            * 31
            + F.element_at(vals, i + 2)
        )
        % _MHV_P,
    )
    return (
        corpus.filter(F.size(vals) >= 3)
        .select("doc_id", F.explode(F.array_distinct(shv)).alias("shv"))
    )


_MHV_SH_SQL = f"""
  SELECT DISTINCT doc_id, unnest(list_distinct(list_transform(
           range(1, greatest(len(vals) - 2, 1) + 1),
           i -> ((vals[i] * 31 + vals[i + 1]) % {_MHV_P} * 31 + vals[i + 2]) % {_MHV_P}
         ))) AS shv
  FROM (SELECT doc_id,
               list_transform(string_split(text, ' '),
                              t -> CAST(ascii(t) * 7 + length(t) AS BIGINT)) AS vals
        FROM corpus)
  WHERE len(vals) >= 3
"""

_MHV_ORACLE = f"""
WITH corpus AS ({_TWIN_CORPUS_SQL}),
sh AS ({_MHV_SH_SQL}),
mh AS (
  SELECT doc_id,
         {", ".join(f"MIN(({_MHV_A[k]} * shv + {_MHV_B[k]}) % {_MHV_P}) AS mh{k}" for k in range(_MHV_K))}
  FROM sh GROUP BY doc_id
),
sigs AS (
  SELECT doc_id,
         {", ".join(f"{_sig_sql(b)} AS sig{b}" for b in range(_MHV_BANDS))}
  FROM mh
),
bands AS (
  {" UNION ALL ".join(f"SELECT doc_id, {b} AS band, sig{b} AS sig FROM sigs" for b in range(_MHV_BANDS))}
),
cand AS (
  SELECT DISTINCT x.doc_id AS doc_a, y.doc_id AS doc_b
  FROM bands x JOIN bands y
    ON x.band = y.band AND x.sig = y.sig AND x.doc_id < y.doc_id
),
sizes AS (SELECT doc_id, COUNT(*) AS n_sh FROM sh GROUP BY doc_id),
common AS (
  SELECT c.doc_a, c.doc_b, COUNT(*) AS n_common
  FROM cand c
  JOIN sh a ON a.doc_id = c.doc_a
  JOIN sh b ON b.doc_id = c.doc_b AND b.shv = a.shv
  GROUP BY c.doc_a, c.doc_b
)
SELECT m.doc_a, m.doc_b,
       round(CAST(m.n_common AS DOUBLE)
             / (sa.n_sh + sb.n_sh - m.n_common), 9) AS jaccard
FROM common m
JOIN sizes sa ON sa.doc_id = m.doc_a
JOIN sizes sb ON sb.doc_id = m.doc_b
"""


# The generic fingerprint-keyed scratch memo now lives in catalog.py
# (published_parquet) so the ANN index artifacts can use it too; this
# module's artifacts all derive from `documents`, the default source.
_published_parquet = published_parquet


def _shv_index_cached(
    spark: SparkSession, sf_dir: str, corpus_fn, subdir: str,
    reap_family: str | None = None,
) -> DataFrame:
    """Shingle-hash index for a corpus, memoized to scratch — read
    several times downstream (signatures, set sizes, exact verify).
    ``reap_family`` threads through to published_parquet so a renamed
    index artifact's superseded sibling is collected on the next cold
    build (round-10 ADVICE: the r9 shv_full_3g → shv_full_3g_p1e9 rename
    left the old full-corpus index — one of the largest artifacts in the
    tag dir — leaking until whole-vintage collection)."""
    return _published_parquet(
        spark,
        sf_dir,
        subdir,
        lambda: _mhv_shingle_hashes(corpus_fn(spark, sf_dir)),
        reap_family=reap_family,
    )


def _mhv_sh_cached(spark: SparkSession, sf_dir: str) -> DataFrame:
    return _shv_index_cached(
        spark, sf_dir, _twin_corpus, f"mhv_shingles_3g_s10m3o{_MUT_OFF}",
        reap_family="mhv_shingles_",
    )


def _full_corpus(spark: SparkSession, sf_dir: str) -> DataFrame:
    return table(spark, sf_dir, "documents").select(
        "doc_id", F.lower(F.col("text")).alias("text")
    )


def _full_sh_cached(spark: SparkSession, sf_dir: str) -> DataFrame:
    return _shv_index_cached(
        spark, sf_dir, _full_corpus, "shv_full_3g_p1e9", reap_family="shv_full_"
    )


_FULL_CORPUS_SQL = "SELECT doc_id, lower(text) AS text FROM documents"


def _mhv_band_sigs(sh: DataFrame) -> DataFrame:
    """(doc_id, band, sig): the twin's banded minhash signatures —
    16-way groupBy-min permutations folded into band keys, untagged."""
    return _banded_sigs(sh, _MHV_A, _MHV_B, _MHV_BANDS, _MHV_ROWS)


@register("dedup_minhash_verify", oracle=_MHV_ORACLE)
def dedup_minhash_verify(spark: SparkSession, sf_dir: str) -> DataFrame:
    """Hash-verifiable MinHash+LSH twin of dedup_near_minhash: identical
    plan shape (shingle explode → 16-way groupBy-min signatures → 8
    banded bucket equi-join → exact-Jaccard verify on candidates only,
    never all-pairs), but every hash is engine-independent integer
    arithmetic, so the DuckDB oracle replays the exact candidate set and
    the driver hash-checks the LSH mechanics end to end. Shuffles stay
    linear in corpus size; the quadratic step runs only inside buckets.
    """
    sh = _mhv_sh_cached(spark, sf_dir)
    # the chunk-tagged band table is the twin's LSH index — published
    # once per vintage (same pattern as the main op's v2 bands artifact)
    # name bakes EVERY parameter the artifact depends on: band geometry,
    # the source shingle gram width (3g — matches mhv_shingles_3g_…),
    # the hash modulus, corpus sampling constants, and the chunk cap
    bands = _published_parquet(
        spark,
        sf_dir,
        f"mhv_bands_k{_MHV_K}b{_MHV_BANDS}_3g_p1e9_s10m3o{_MUT_OFF}"
        f"c{_HOT_SHINGLE_CAP}",
        lambda: _tag_chunks(_mhv_band_sigs(sh), ["band", "sig"]),
        reap_family="mhv_bands_",
    )
    # skew-bounded bucket self-join: a hot (band, sig) bucket (an LSH
    # collision pile-up) chunk-splits instead of funneling its pair
    # quadratic through one task; candidate SET identical
    cand = (
        _skew_bounded_self_pairs(
            bands,
            ["band", "sig"],
            pretagged=True,
            stats_key=f"mhvband:{scratch_tag(sf_dir, 'documents')}",
        )
        .select(
            F.col("doc_id_a").alias("doc_a"), F.col("doc_id_b").alias("doc_b")
        )
        .distinct()
    )
    sizes = sh.groupBy("doc_id").agg(F.count(F.lit(1)).alias("n_sh"))
    common = (
        cand.join(sh.alias("sa"), F.col("doc_a") == F.col("sa.doc_id"))
        .join(
            sh.alias("sb"),
            (F.col("doc_b") == F.col("sb.doc_id"))
            & (F.col("sa.shv") == F.col("sb.shv")),
        )
        .groupBy("doc_a", "doc_b")
        .agg(F.count(F.lit(1)).alias("n_common"))
    )
    jac = F.col("n_common").cast("double") / (
        F.col("za.n_sh") + F.col("zb.n_sh") - F.col("n_common")
    )
    return (
        common.join(sizes.alias("za"), F.col("doc_a") == F.col("za.doc_id"))
        .join(sizes.alias("zb"), F.col("doc_b") == F.col("zb.doc_id"))
        .select("doc_a", "doc_b", F.round(jac, 9).alias("jaccard"))
    )


_SHV_M = 2147483647  # minstd modulus — 31-bit token hashes
# Parameterized SimHash print geometry (round 6). The round-5 scaling
# probe measured the previously-pinned 48-bit / 4×12-block print
# saturating past ~1e5 distinct prints (block-bucket collision mass →
# n²/4096; wall-clock exponent 0.64 at 24× corpus). The production
# shape is now 64-bit prints in 4 blocks of 16 bits: each block key
# has 65536 values, pushing saturation out ~16× while keeping the
# Manku-Jain-Sarma pigeonhole guarantee (hamming ≤ BLOCKS-1 ⇒ some
# block intact). One independent minstd-LCG stream feeds each block's
# 16-bit slice. Bit 63 is the BIGINT sign bit: both engines build its
# print term as -(2^63) and every block-key extraction masks AFTER the
# (arithmetic) shift, so keys and bit_count(xor(...)) agree
# bit-for-bit between Spark and DuckDB.
_SHV_BLOCKS = 4
_SHV_BLOCK_BITS = 16
_SHV_BITS = _SHV_BLOCKS * _SHV_BLOCK_BITS
_SHV_HAM_T = 16  # twin's verify threshold — 25% of width, as 12/48 was
_SHV_TAGS = (11, 13, 7, 5)  # twin's LCG stream tags, one per block
_SH_TAGS = (17, 19, 23, 29)  # main op's LCG stream tags
_SHV_GEOM = f"b{_SHV_BITS}x{_SHV_BLOCKS}"  # baked into artifact names
# The twin probes far past the aligned blocks' hamming ≤ 3 guarantee
# (threshold 16), so it buckets on a Manku-style sliding-window family:
# every 16-bit window at a 4-bit offset (offsets 0,4,...,48 — a strict
# superset of the 4 aligned blocks, so the ≤ 3 guarantee is kept).
# Candidate recall at hamming ~6-10 rises from ~0.6 to ~0.9 (a pair is
# caught iff SOME 4-bit-aligned 16-bit window is flip-free), while keys
# stay 16-bit — collision mass per window is still n²/65536, only a
# 13/4 constant over the aligned family, never quadratic.
_SHV_TWIN_OFFS = tuple(range(0, _SHV_BITS - _SHV_BLOCK_BITS + 1, 4))


def _shv_bit_sql(b: int) -> str:
    s, off = divmod(b, _SHV_BLOCK_BITS)
    return f"((h{s} >> {off}) & 1)"


def _shv_th_sql(tags) -> str:
    """One minstd-LCG hash stream per block, mirrored in Spark by
    _shv_fingerprint — same arithmetic, same tags."""
    return ",\n         ".join(
        f"(48271 * ((48271 * (shv * 8 + {t})) % {_SHV_M})) % {_SHV_M} AS h{s}"
        for s, t in enumerate(tags)
    )


def _shv_pow2_sql(b: int) -> str:
    # bit 63 = BIGINT sign bit: its print term is -(2^63). It is the
    # LAST addend in the fold, so partial sums of bits 0..62 stay
    # within the positive BIGINT range before it lands.
    if b == 63:
        return "CAST(-9223372036854775808 AS BIGINT)"
    return f"CAST({1 << b} AS BIGINT)"


# The simhash twin's corpus uses a SINGLE-TOKEN-EDIT mutant (middle
# token removed) instead of the minhash twin's half-truncation: simhash
# measures whole-document feature-set similarity, and a half document
# sits near the decision boundary, while a one-token edit flips ~3
# fingerprint bits — inside the 4-block guarantee (any pair within
# hamming 3 shares an intact block), i.e. exactly the re-ingested-with-
# a-tiny-change duplicate class simhash exists to catch. Features are
# 3-gram SHINGLE hashes, not unigram tokens:
# the synthetic corpus has a ~30-word vocabulary, so every unigram is
# a stopword and unigram sign-votes saturate (all fingerprints
# converge); the shingle space is vocab³ and separates cleanly
# (measured on this corpus at the 64-bit width: mutant pairs hamming
# ≲ 14/64, unrelated pairs median ~32/64).
_SHV_CORPUS_SQL = """
SELECT doc_id, lower(text) AS text FROM documents WHERE doc_id % 10 = 0
UNION ALL
SELECT doc_id + 2305843009213693952 AS doc_id,
       array_to_string(list_transform(
         list_filter(range(1, len(string_split(lower(text), ' ')) + 1),
                     i -> i != greatest(len(string_split(lower(text), ' ')) // 2, 1)),
         i -> string_split(lower(text), ' ')[i]), ' ')
FROM documents WHERE doc_id % 10 = 0 AND doc_id % 3 = 0
"""


def _shv_corpus(spark: SparkSession, sf_dir: str) -> DataFrame:
    d = table(spark, sf_dir, "documents")
    base = d.filter(F.col("doc_id") % 10 == 0).select(
        "doc_id", F.lower(F.col("text")).alias("text")
    )
    toks = _tokens()
    mid = F.greatest(F.floor(F.size(toks) / 2).cast("int"), F.lit(1))
    idxs = F.filter(F.sequence(F.lit(1), F.size(toks)), lambda i: i != mid)
    light = F.array_join(
        F.transform(idxs, lambda i: F.element_at(toks, i)), " "
    )
    mut = (
        d.filter((F.col("doc_id") % 10 == 0) & (F.col("doc_id") % 3 == 0))
        .select((F.col("doc_id") + _MUT_OFF).alias("doc_id"), light.alias("text"))
    )
    return base.unionByName(mut)


_SHV_ORACLE = f"""
WITH corpus AS ({_SHV_CORPUS_SQL}),
sh AS ({_MHV_SH_SQL}),
th AS (
  SELECT doc_id,
         {_shv_th_sql(_SHV_TAGS)}
  FROM sh
),
votes AS (
  SELECT doc_id,
         {", ".join(f"SUM(CASE WHEN {_shv_bit_sql(b)} = 1 THEN 1 ELSE -1 END) AS v{b}" for b in range(_SHV_BITS))}
  FROM th GROUP BY doc_id
),
fp AS (
  SELECT doc_id,
         ({" + ".join(f"CASE WHEN v{b} > 0 THEN {_shv_pow2_sql(b)} ELSE 0 END" for b in range(_SHV_BITS))}) AS print
  FROM votes
),
blocks AS (
  {" UNION ALL ".join(f"SELECT doc_id, {off} AS blk, (print >> {off}) & {(1 << _SHV_BLOCK_BITS) - 1} AS key, print FROM fp" for off in _SHV_TWIN_OFFS)}
),
cand AS (
  SELECT DISTINCT x.doc_id AS doc_a, y.doc_id AS doc_b,
                  x.print AS pa, y.print AS pb
  FROM blocks x JOIN blocks y
    ON x.blk = y.blk AND x.key = y.key AND x.doc_id < y.doc_id
)
SELECT doc_a, doc_b, CAST(bit_count(xor(pa, pb)) AS INT) AS hamming
FROM cand WHERE bit_count(xor(pa, pb)) <= {_SHV_HAM_T}
"""


@register("dedup_simhash_verify", oracle=_SHV_ORACLE)
def dedup_simhash_verify(spark: SparkSession, sf_dir: str) -> DataFrame:
    """Hash-verifiable SimHash twin of dedup_simhash: same plan shape
    (distinct-feature explode → per-bit sign-vote groupBy →
    fingerprint → block-key bucket equi-join → exact hamming filter)
    on minstd-LCG shingle hashes both engines compute identically.
    64-bit print, bucketed on the sliding 16-bit-window family (4-bit
    offsets — see _SHV_TWIN_OFFS): pairs within hamming 3 are caught by
    guarantee, and the seeded single-token-edit mutants (hamming ~6-10
    at this width) with ~0.9 measured recall — one equi-join, never an
    all-pairs hamming scan."""
    # Memoized like the main op's prints (fingerprint-keyed scratch):
    # the 64-wide sign-vote aggregation is the expensive stage and is
    # pure corpus-derived state — build once per fixture vintage, serve
    # plain columnar scans afterwards (measured: 2.7 s -> sub-second
    # steady state at sf0.1). The artifact name bakes EVERY algorithm
    # parameter — geometry, LCG tags, and the corpus sampling constants
    # (every-10th base, every-3rd mutant, id offset) — so editing any
    # of them rebuilds instead of serving a stale index.
    fp = _published_parquet(
        spark,
        sf_dir,
        f"shv_twin_prints_{_SHV_GEOM}"
        f"t{'_'.join(map(str, _SHV_TAGS))}_s10m3o{_MUT_OFF}",
        lambda: _shv_fingerprint(
            _mhv_shingle_hashes(_shv_corpus(spark, sf_dir)), _SHV_TAGS
        ),
        reap_family="shv_twin_prints_",
    )

    def _twin_blocks():
        return _block_keys(
            fp, "doc_id", [(off, off) for off in _SHV_TWIN_OFFS]
        )

    # chunk-tagged sliding-window block index, published per vintage
    # like the main op's (derived from the prints artifact above). The
    # name bakes the FULL WINDOW FAMILY (every offset, not a first/last
    # summary that a non-uniform edit could alias), not just the
    # geometry: any edit of _SHV_TWIN_OFFS must address a fresh
    # artifact; superseded names under the family stem are collected by
    # published_parquet's reap_family (the generalized form of the
    # reaper that used to live inline here — round-9 review).
    blockidx_name = (
        f"shv_twin_blockidx_{_SHV_GEOM}"
        f"w{'_'.join(map(str, _SHV_TWIN_OFFS))}"
        f"t{'_'.join(map(str, _SHV_TAGS))}_s10m3o{_MUT_OFF}"
        f"c{_HOT_SHINGLE_CAP}"
    )
    blocks = _published_parquet(
        spark,
        sf_dir,
        blockidx_name,
        lambda: _tag_chunks(_twin_blocks(), ["blk", "key"]),
        reap_family="shv_twin_blockidx_",
    )
    # skew-bounded block-bucket self-join (hot 16-bit windows
    # chunk-split; candidate SET identical), prints carried as payload
    cand = (
        _skew_bounded_self_pairs(
            blocks,
            ["blk", "key"],
            payload=("print",),
            pretagged=True,
            stats_key=f"shvblk:{scratch_tag(sf_dir, 'documents')}",
        )
        .select(
            F.col("doc_id_a").alias("doc_a"),
            F.col("doc_id_b").alias("doc_b"),
            F.col("print_a").alias("pa"),
            F.col("print_b").alias("pb"),
        )
        .distinct()
    )
    return cand.select(
        "doc_a",
        "doc_b",
        F.bit_count(F.col("pa").bitwiseXOR(F.col("pb"))).cast("int").alias("hamming"),
    ).filter(F.col("hamming") <= _SHV_HAM_T)


# --------------------------------------------------------------------------
# the main MinHash / SimHash operators (full corpus, collapse-first)
# --------------------------------------------------------------------------
# See the redesign notes at the top of this section (above the twins).
# Reference parity: generalizes the reference's exact double-send dedup
# (KinesisAsync.java:96-97) to content-similarity dedup over documents.

_MH_K = 32
# 8 bands × 4 rows. Banding recall is 1-(1-j^r)^b: ≈0.40 at j=0.5,
# 0.67 at 0.6, 0.89 at 0.7, 0.985 at 0.8 — so this geometry RELIABLY
# catches j ≳ 0.7 and trades away the 0.5-0.65 tail for candidate
# precision (fewer false candidates to exact-verify; r=4 suppresses
# low-j collisions steeply, which is what bounds verify cost at
# 100 TB). High recall AT j=0.5 would need r=2 (1-(1-0.25)^16 ≈ 0.99
# from the same 32 perms) at ~16x the low-similarity candidate volume.
# The r9 review caught the previous comment claiming "jaccard ≳ 0.5
# with high recall" — wrong by the formula above; the OUTPUT contract
# (exactly the banded candidates that verify at j ≥ 0.5, oracle-exact)
# is unchanged.
_MH_BANDS = 8
_MH_ROWS = _MH_K // _MH_BANDS
_MH_A = _COEF_A[:_MH_K]
_MH_B = _COEF_B[:_MH_K]


def _mh_sig_sql(b: int) -> str:
    return _band_sig_sql(b, _MH_ROWS)


# Identical-shingle-set collapse: a symmetric (order-independent) digest
# (count, Σshv mod P, Σshv² mod P) keys exact-content groups; gid = min
# doc_id per group. A digest collision would merge two genuinely distinct
# docs — probability ~n²/P² per pair — and both engines would make the
# SAME merge (the digest arithmetic is identical), so the oracle check
# stays exact; the approximation is documented, not silent.
_MH_COLLAPSE_SQL = f"""
digests AS (
  SELECT doc_id, COUNT(*) AS n_sh,
         CAST(SUM(shv) % {_MHV_P} AS BIGINT) AS s1,
         CAST(SUM((shv * shv) % {_MHV_P}) % {_MHV_P} AS BIGINT) AS s2
  FROM sh GROUP BY doc_id
),
gmap AS (
  SELECT n_sh, s1, s2, MIN(doc_id) AS gid
  FROM digests GROUP BY n_sh, s1, s2
),
members AS (
  SELECT d.doc_id, g.gid
  FROM digests d
  JOIN gmap g ON d.n_sh = g.n_sh AND d.s1 = g.s1 AND d.s2 = g.s2
),
rsh AS (SELECT s.doc_id, s.shv FROM sh s JOIN gmap g ON s.doc_id = g.gid)
"""

_MH_ORACLE = f"""
WITH corpus AS ({_FULL_CORPUS_SQL}),
sh AS ({_MHV_SH_SQL}),
{_MH_COLLAPSE_SQL},
mh AS (
  SELECT doc_id,
         {", ".join(f"MIN(({_MH_A[k]} * shv + {_MH_B[k]}) % {_MHV_P}) AS mh{k}" for k in range(_MH_K))}
  FROM rsh GROUP BY doc_id
),
sigs AS (
  SELECT doc_id,
         {", ".join(f"{_mh_sig_sql(b)} AS sig{b}" for b in range(_MH_BANDS))}
  FROM mh
),
bands AS (
  {" UNION ALL ".join(f"SELECT doc_id, {b} AS band, sig{b} AS sig FROM sigs" for b in range(_MH_BANDS))}
),
cand AS (
  SELECT DISTINCT x.doc_id AS ga, y.doc_id AS gb
  FROM bands x JOIN bands y
    ON x.band = y.band AND x.sig = y.sig AND x.doc_id < y.doc_id
),
sizes AS (SELECT doc_id, COUNT(*) AS n_sh FROM rsh GROUP BY doc_id),
common AS (
  SELECT c.ga, c.gb, COUNT(*) AS n_common
  FROM cand c
  JOIN rsh a ON a.doc_id = c.ga
  JOIN rsh b ON b.doc_id = c.gb AND b.shv = a.shv
  GROUP BY c.ga, c.gb
),
ver AS (
  SELECT m.ga, m.gb,
         round(CAST(m.n_common AS DOUBLE)
               / (sa.n_sh + sb.n_sh - m.n_common), 9) AS jaccard
  FROM common m
  JOIN sizes sa ON sa.doc_id = m.ga
  JOIN sizes sb ON sb.doc_id = m.gb
  WHERE CAST(m.n_common AS DOUBLE) / (sa.n_sh + sb.n_sh - m.n_common) >= 0.5
)
SELECT least(ma.doc_id, mb.doc_id) AS doc_a,
       greatest(ma.doc_id, mb.doc_id) AS doc_b, v.jaccard
FROM ver v
JOIN members ma ON ma.gid = v.ga
JOIN members mb ON mb.gid = v.gb
UNION ALL
SELECT a.doc_id AS doc_a, b.doc_id AS doc_b, CAST(1.0 AS DOUBLE) AS jaccard
FROM members a JOIN members b ON a.gid = b.gid AND a.doc_id < b.doc_id
"""


def _mh_collapse(sh: DataFrame) -> tuple[DataFrame, DataFrame]:
    """(members(doc_id, gid), rsh = representatives' shingle rows)."""
    dig = sh.groupBy("doc_id").agg(
        F.count(F.lit(1)).alias("n_sh"),
        (F.sum("shv") % _MHV_P).alias("s1"),
        (F.sum((F.col("shv") * F.col("shv")) % _MHV_P) % _MHV_P).alias("s2"),
    )
    gmap = dig.groupBy("n_sh", "s1", "s2").agg(F.min("doc_id").alias("gid"))
    members = dig.join(gmap, ["n_sh", "s1", "s2"]).select("doc_id", "gid")
    rsh = sh.join(gmap.select(F.col("gid").alias("doc_id")).distinct(), "doc_id")
    return members, rsh


def _mh_collapse_cached(
    spark: SparkSession, sf_dir: str
) -> tuple[DataFrame, DataFrame]:
    """Memoized content-group map + representative shingle index. The
    query plan reads rsh four times (signatures, sizes, verify ×2) —
    without the memo each reference replays the digest groupBy + join."""
    members = _published_parquet(
        spark,
        sf_dir,
        "mh_members_3g_p1e9v1",
        lambda: _mh_collapse(_full_sh_cached(spark, sf_dir))[0],
        reap_family="mh_members_",
    )
    # rsh derives from the published members (representatives = rows with
    # doc_id == gid) instead of re-running the whole digest collapse a
    # second time on a cold cache — the cold build does ONE collapse.
    rsh = _published_parquet(
        spark,
        sf_dir,
        "mh_rsh_3g_p1e9v1",
        lambda: _full_sh_cached(spark, sf_dir).join(
            members.filter(F.col("doc_id") == F.col("gid")).select("doc_id"),
            "doc_id",
        ),
        reap_family="mh_rsh_",
    )
    return members, rsh


def _expand_groups(
    pairs: DataFrame,
    members: DataFrame,
    value_col: str,
    intra_value,
    cap: int = _HOT_SHINGLE_CAP,
    stats_key: str | None = None,
) -> DataFrame:
    """Expand representative-level pairs (ga, gb, value) into member-level
    doc pairs, plus the intra-group pairs (same content) at intra_value.
    Groups are disjoint, so least/greatest keeps pairs unique + ordered.

    The expansion is output-sized by definition, but without care all of
    a mega-group's output funnels through the ONE task owning its gid
    join key (10⁵ verbatim copies → 5·10⁹ intra rows in one task). The
    guard is ADAPTIVE when the caller provides a ``stats_key``,
    dispatching like ``connected_components`` (cheap path first, switch
    on a measured scale trigger): one memoized bounded driver int — the
    largest group size — picks the plan. At or under the cap every
    group fits one task's plain expansion (the two-join output-sized
    path, no chunk machinery — measured ~0.3 s/query of pure
    broadcast-build overhead saved at fixture scale). Without a
    ``stats_key`` the plan is always the lazy scale-safe chunked form —
    no measurement job runs at DataFrame-construction time, mirroring
    ``_skew_bounded_self_pairs``. Past the cap
    both legs go skew-bounded: intra pairs via
    ``_skew_bounded_self_pairs`` on gid, and the cross product via
    member chunking — each group's member list is hash-split into
    ⌈n/cap⌉ chunks, the pair row replicates across the A side's chunk
    indexes, and the (pair, A-member) rows replicate across the B
    side's, so each (gid, chunk) join key holds ≤ cap members and no
    task emits more than ~its input × cap rows. Replication overhead is
    ≤ output/cap rows per leg. Row multiset identical on both paths
    (property-tested chunked == plain)."""
    sizes = members.groupBy("gid").agg(F.count(F.lit(1)).alias("_n"))
    plain_ok = False
    if stats_key is not None:
        # cap in the memo key: the cached int is a dispatch decision
        # RELATIVE to the cap it was measured against
        memo_key = f"{stats_key}|cap{cap}"
        max_n = _MAXN_CACHE.get(memo_key)
        if max_n is None:
            max_n = sizes.agg(F.max("_n")).first()[0] or 0
            _MAXN_CACHE[memo_key] = max_n
        plain_ok = max_n <= cap
    if plain_ok:
        ma, mb = members.alias("ma"), members.alias("mb")
        cross = (
            pairs.join(ma, F.col("ma.gid") == F.col("ga"))
            .join(mb, F.col("mb.gid") == F.col("gb"))
            .select(
                F.least(F.col("ma.doc_id"), F.col("mb.doc_id")).alias("doc_a"),
                F.greatest(F.col("ma.doc_id"), F.col("mb.doc_id")).alias(
                    "doc_b"
                ),
                F.col(value_col),
            )
        )
        intra = (
            members.alias("ia")
            .join(
                members.alias("ib"),
                (F.col("ia.gid") == F.col("ib.gid"))
                & (F.col("ia.doc_id") < F.col("ib.doc_id")),
            )
            .select(
                F.col("ia.doc_id").alias("doc_a"),
                F.col("ib.doc_id").alias("doc_b"),
                intra_value.alias(value_col),
            )
        )
        return cross.unionByName(intra)
    chunks = sizes.select("gid", _chunk_count("_n", cap).alias("_c"))
    # chunks is a per-gid aggregate (no broadcast hint: AQE broadcasts
    # it at fixture scale, sort-merge beyond the threshold); m keeps _c
    # so BOTH legs below consume the same tagged frame — the intra leg
    # passes pretagged=True instead of re-counting group sizes. Chunk
    # formulas come from the shared _chunk_count/_chunk_of definitions.
    m = (
        members.join(chunks, "gid")
        .withColumn("_g", _chunk_of("doc_id"))
        .select("gid", "doc_id", "_c", "_g")
    )
    pa = pairs.join(
        chunks.select(F.col("gid").alias("ga"), F.col("_c").alias("_ca")), "ga"
    ).join(
        chunks.select(F.col("gid").alias("gb"), F.col("_c").alias("_cb")), "gb"
    )
    # merge hints for the same reason as the pair grid: these joins must
    # exchange on (gid, chunk) to distribute a mega-group's fan-out —
    # a broadcast of either side would replay it through one task
    step1 = (
        pa.withColumn("_ai", F.explode(F.sequence(F.lit(0), F.col("_ca") - 1)))
        .hint("merge")
        .join(
            m.alias("ma").hint("merge"),
            (F.col("ma.gid") == F.col("ga")) & (F.col("ma._g") == F.col("_ai")),
        )
        .select("gb", value_col, "_cb", F.col("ma.doc_id").alias("_da"))
    )
    cross = (
        step1.withColumn("_bj", F.explode(F.sequence(F.lit(0), F.col("_cb") - 1)))
        .hint("merge")
        .join(
            m.alias("mb").hint("merge"),
            (F.col("mb.gid") == F.col("gb")) & (F.col("mb._g") == F.col("_bj")),
        )
        .select(
            F.least(F.col("_da"), F.col("mb.doc_id")).alias("doc_a"),
            F.greatest(F.col("_da"), F.col("mb.doc_id")).alias("doc_b"),
            F.col(value_col),
        )
    )
    intra = _skew_bounded_self_pairs(m, ["gid"], pretagged=True).select(
        F.col("doc_id_a").alias("doc_a"),
        F.col("doc_id_b").alias("doc_b"),
        intra_value.alias(value_col),
    )
    return cross.unionByName(intra)


@register("dedup_near_minhash", oracle=_MH_ORACLE)
def dedup_near_minhash(spark: SparkSession, sf_dir: str) -> DataFrame:
    """MinHash + LSH near-dup pairs, pure DataFrame ops. Output contract:
    exactly the banded candidates that exact-verify at jaccard ≥ 0.5
    (oracle replays the candidate generation bit-for-bit). Recall is
    the 8×4 banding curve — ≈0.40 at j=0.5 rising to 0.89 at 0.7 and
    0.985 at 0.8 (see the _MH_BANDS note): the geometry deliberately
    trades the 0.5-0.65 tail for candidate precision, i.e. bounded
    exact-verify cost at 100 TB; tune b×r for a different operating
    point.

    Pipeline: distinct 3-gram shingle hashes → identical-content collapse
    (symmetric set digest → representative) → 32 minhash permutations
    (one groupBy-min, no UDF) → 8×4 banded signatures → bucket equi-join
    on (band, sig) for candidates → exact Jaccard verify on candidates
    only → expand groups back into member pairs (intra-group = 1.0).

    100 TB shape: shuffles are linear in corpus size (shingle explode,
    doc-level groupBy, band-bucket join); verbatim-copy mega-clusters are
    single nodes through every quadratic step (the collapse), and the
    final expansion is output-sized by definition. Engine-independent
    integer hashes → the DuckDB oracle replays candidates bit-for-bit."""
    members, rsh = _mh_collapse_cached(spark, sf_dir)
    # The band-signature table IS the LSH index — pure corpus-derived
    # state (32 minhash permutations folded into 8 band keys per
    # representative), built once per fixture vintage on ingest like the
    # shingle/print/codebook artifacts. Candidate generation and the
    # exact-Jaccard verify stay live query-time work.
    # v2: the artifact bakes the skew-chunk columns (_c/_g per band
    # bucket) — the frequency pass is corpus-derived index state, so it
    # runs once at ingest, not per query
    bands = _published_parquet(
        spark,
        sf_dir,
        f"mh_bands_3g_k{_MH_K}b{_MH_BANDS}p1e9c{_HOT_SHINGLE_CAP}v2",
        lambda: _tag_chunks(_mh_band_sigs(rsh), ["band", "sig"]),
        reap_family="mh_bands_",
    )
    return _minhash_pairs_from_bands(
        members, rsh, bands,
        stats_key=f"mh:{scratch_tag(sf_dir, 'documents')}",
    )


def _mh_band_sigs(rsh: DataFrame) -> DataFrame:
    """(doc_id, band, sig): banded minhash signatures over the collapsed
    representatives' shingle index — the LSH index build."""
    return _banded_sigs(rsh, _MH_A, _MH_B, _MH_BANDS, _MH_ROWS)


def _minhash_pairs(members: DataFrame, rsh: DataFrame) -> DataFrame:
    """Core MinHash+LSH pipeline over a collapsed corpus — factored out
    so tests can drive it with synthetic corpora (e.g. the boilerplate
    mega-cluster case) without going through the fixture scratch cache.
    Tags chunks live (same columns the published artifact bakes)."""
    return _minhash_pairs_from_bands(
        members, rsh, _tag_chunks(_mh_band_sigs(rsh), ["band", "sig"])
    )


def _minhash_pairs_from_bands(
    members: DataFrame,
    rsh: DataFrame,
    bands: DataFrame,
    stats_key: str | None = None,
) -> DataFrame:
    # skew-bounded band-bucket self-join: even after the
    # identical-content collapse, a hot (band, sig) bucket of
    # near-identical-but-distinct reps would funnel its pair quadratic
    # through one task — chunk-split it (bands arrive pre-tagged from
    # the ingest artifact); candidate SET identical
    cand = (
        _skew_bounded_self_pairs(
            bands,
            ["band", "sig"],
            pretagged=True,
            stats_key=f"{stats_key}:bands" if stats_key else None,
        )
        .select(F.col("doc_id_a").alias("ga"), F.col("doc_id_b").alias("gb"))
        .distinct()
    )
    sizes = rsh.groupBy("doc_id").agg(F.count(F.lit(1)).alias("n_sh"))
    common = (
        cand.join(rsh.alias("sa"), F.col("ga") == F.col("sa.doc_id"))
        .join(
            rsh.alias("sb"),
            (F.col("gb") == F.col("sb.doc_id"))
            & (F.col("sa.shv") == F.col("sb.shv")),
        )
        .groupBy("ga", "gb")
        .agg(F.count(F.lit(1)).alias("n_common"))
    )
    jac = F.col("n_common").cast("double") / (
        F.col("za.n_sh") + F.col("zb.n_sh") - F.col("n_common")
    )
    ver = (
        common.join(sizes.alias("za"), F.col("ga") == F.col("za.doc_id"))
        .join(sizes.alias("zb"), F.col("gb") == F.col("zb.doc_id"))
        .filter(jac >= 0.5)
        .select("ga", "gb", F.round(jac, 9).alias("jaccard"))
    )
    return _expand_groups(
        ver, members, "jaccard", F.lit(1.0), stats_key=stats_key
    )


_SH_HAM_MAIN = _SHV_BLOCKS - 1  # the pigeonhole-complete threshold


def _shv_fingerprint(sh: DataFrame, tags) -> DataFrame:
    """(doc_id, print): 64-bit simhash over shingle-hash features via
    four independent minstd-LCG bit streams (one 16-bit slice per
    block) — same arithmetic as the oracle. Bit 63's print term is
    -(2^63) (the BIGINT sign bit), added last so partial sums never
    overflow."""
    hs = [
        (F.lit(48271) * ((F.lit(48271) * (F.col("shv") * 8 + t)) % _SHV_M))
        % _SHV_M
        for t in tags
    ]

    def _bit(b: int):
        s, off = divmod(b, _SHV_BLOCK_BITS)
        return F.shiftright(hs[s], off).bitwiseAND(F.lit(1))

    def _pow2(b: int):
        v = -(2**63) if b == 63 else (1 << b)
        return F.lit(v).cast("bigint")

    votes = (
        sh.select(
            "doc_id",
            *[
                F.when(_bit(b) == 1, 1).otherwise(-1).alias(f"v{b}")
                for b in range(_SHV_BITS)
            ],
        )
        .groupBy("doc_id")
        .agg(*[F.sum(f"v{b}").alias(f"v{b}") for b in range(_SHV_BITS)])
    )
    return votes.select(
        "doc_id",
        sum(
            [
                F.when(F.col(f"v{b}") > 0, _pow2(b)).otherwise(
                    F.lit(0).cast("bigint")
                )
                for b in range(_SHV_BITS)
            ],
            F.lit(0).cast("bigint"),
        ).alias("print"),
    )


_SH_ORACLE = f"""
WITH corpus AS ({_FULL_CORPUS_SQL}),
sh AS ({_MHV_SH_SQL}),
th AS (
  SELECT doc_id,
         {_shv_th_sql(_SH_TAGS)}
  FROM sh
),
votes AS (
  SELECT doc_id,
         {", ".join(f"SUM(CASE WHEN {_shv_bit_sql(b)} = 1 THEN 1 ELSE -1 END) AS v{b}" for b in range(_SHV_BITS))}
  FROM th GROUP BY doc_id
),
fp AS (
  SELECT doc_id,
         ({" + ".join(f"CASE WHEN v{b} > 0 THEN {_shv_pow2_sql(b)} ELSE 0 END" for b in range(_SHV_BITS))}) AS print
  FROM votes
),
gp AS (SELECT print, MIN(doc_id) AS gid FROM fp GROUP BY print),
blocks AS (
  {" UNION ALL ".join(f"SELECT gid, {blk} AS blk, (print >> {blk * _SHV_BLOCK_BITS}) & {(1 << _SHV_BLOCK_BITS) - 1} AS key, print FROM gp" for blk in range(_SHV_BLOCKS))}
),
near AS (
  SELECT DISTINCT x.gid AS ga, y.gid AS gb,
         CAST(bit_count(xor(x.print, y.print)) AS INT) AS hamming
  FROM blocks x JOIN blocks y
    ON x.blk = y.blk AND x.key = y.key AND x.gid < y.gid
  WHERE bit_count(xor(x.print, y.print)) <= {_SH_HAM_MAIN}
),
members AS (SELECT f.doc_id, g.gid FROM fp f JOIN gp g ON f.print = g.print)
SELECT least(ma.doc_id, mb.doc_id) AS doc_a,
       greatest(ma.doc_id, mb.doc_id) AS doc_b, n.hamming
FROM near n
JOIN members ma ON ma.gid = n.ga
JOIN members mb ON mb.gid = n.gb
UNION ALL
SELECT a.doc_id AS doc_a, b.doc_id AS doc_b, CAST(0 AS INT) AS hamming
FROM members a JOIN members b ON a.gid = b.gid AND a.doc_id < b.doc_id
"""


@register("dedup_simhash", oracle=_SH_ORACLE)
def dedup_simhash(spark: SparkSession, sf_dir: str) -> DataFrame:
    """SimHash near-dup pairs: EXACTLY the doc pairs whose 64-bit
    shingle-feature simhash prints differ in ≤ 3 bits.

    Per-bit sign votes over distinct 3-gram shingle hashes → 64-bit
    print → identical-print collapse (gid = min doc_id) → block-key
    bucket equi-join over DISTINCT prints (4 blocks × 16 bits; any pair
    within hamming 3 shares an intact block — Charikar fingerprints with
    the Manku-Jain-Sarma block arrangement) → hamming ≤ 3 filter →
    expand print groups back into member pairs (intra-group = 0).

    The collapse is what bounds a boilerplate mega-cluster at 100 TB:
    a million verbatim copies are ONE node in the bucket join, and the
    quadratic work left is proportional to distinct content. Output is
    complete (pigeonhole over the 4 blocks), so there is no silent
    recall loss — the round-4 bucket cap this replaces dropped 72% of
    true pairs at sf0.1 by excluding collision buckets wholesale. The
    16-bit block keys (65536 values; widened from round 5's 12-bit,
    whose collision mass the scaling probe measured going super-linear
    past ~1e5 distinct prints) keep the bucket join sub-quadratic out
    to ~1e7 distinct prints per shuffle partition range."""
    fp = _published_parquet(
        spark,
        sf_dir,
        f"shv_prints_{_SHV_GEOM}p1e9t{'_'.join(map(str, _SH_TAGS))}",
        lambda: _shv_fingerprint(_full_sh_cached(spark, sf_dir), _SH_TAGS),
        reap_family="shv_prints_",
    )
    # members is PUBLISHED like minhash's mh_members (round-8 review):
    # the identical-print collapse (groupBy over fp + join back) is pure
    # corpus-derived index state — rebuilding it on every warm query was
    # the one per-query pass left in this pipeline; now the warm path is
    # two columnar scans (members + blocks), nothing else.
    members = _published_parquet(
        spark,
        sf_dir,
        f"shv_members_{_SHV_GEOM}t{'_'.join(map(str, _SH_TAGS))}",
        lambda: _sh_group_map(fp)[1],
        reap_family="shv_members_",
    )
    # the chunk-tagged block table IS the SimHash bucket index — pure
    # corpus-derived state (built FROM the prints artifact), published
    # once per vintage so queries read tagged buckets instead of
    # re-exploding and re-counting them. The cold build derives the
    # representative set FROM the published members artifact (one row
    # per gid where doc_id == gid, print joined back from fp) instead
    # of re-running _sh_group_map's groupBy — the collapse aggregation
    # runs ONCE per cold build, the same fix _mh_collapse_cached got in
    # round 8 (r9 review caught this pipeline still doing it twice).
    blocks = _published_parquet(
        spark,
        sf_dir,
        f"shv_blockidx_{_SHV_GEOM}t{'_'.join(map(str, _SH_TAGS))}"
        f"c{_HOT_SHINGLE_CAP}",
        lambda: _tag_chunks(
            _sh_blocks(
                members.filter(F.col("doc_id") == F.col("gid"))
                .join(fp, "doc_id")
                .select("print", "gid")
            ),
            ["blk", "key"],
            id_col="gid",
        ),
        reap_family="shv_blockidx_",
    )
    return _simhash_from_blocks(
        members, blocks, stats_key=f"sh:{scratch_tag(sf_dir, 'documents')}"
    )


def _sh_group_map(fp: DataFrame) -> tuple[DataFrame, DataFrame]:
    """(gp, members): identical-print collapse — gp = one row per
    distinct print (gid = min doc_id), members = doc→gid map."""
    gp = fp.groupBy("print").agg(F.min("doc_id").alias("gid"))
    members = fp.join(gp, "print").select("doc_id", "gid")
    return gp, members


def _block_keys(fp: DataFrame, id_col: str, windows) -> DataFrame:
    """(id, print, blk, key): one row per (label, shift) window — key is
    the 16-bit field of the print at that shift. THE single definition
    of the block-key extraction (mask-after-shift sign handling is
    engine-parity-critical, so it lives in exactly one place); the main
    op passes aligned block windows, the twin its sliding family."""
    return fp.select(
        id_col,
        "print",
        F.explode(
            F.array(
                *[
                    F.struct(
                        F.lit(label).alias("blk"),
                        F.shiftright(F.col("print"), shift)
                        .bitwiseAND(F.lit((1 << _SHV_BLOCK_BITS) - 1))
                        .alias("key"),
                    )
                    for label, shift in windows
                ]
            )
        ).alias("bk"),
    ).select(id_col, "print", "bk.blk", "bk.key")


def _sh_blocks(gp: DataFrame) -> DataFrame:
    """Block-key explode of the distinct prints (4 × 16-bit aligned
    windows) — the SimHash bucket index, untagged."""
    return _block_keys(
        gp,
        "gid",
        [(blk, blk * _SHV_BLOCK_BITS) for blk in range(_SHV_BLOCKS)],
    )


def _simhash_from_blocks(
    members: DataFrame, blocks: DataFrame, stats_key: str | None = None
) -> DataFrame:
    """Candidate join + hamming gate + member expansion over a
    chunk-tagged block index (see _tag_chunks)."""
    # skew-bounded block-bucket self-join over distinct prints: a hot
    # 16-bit block key chunk-splits instead of funneling its pair
    # quadratic through one task; candidate SET identical
    near = (
        _skew_bounded_self_pairs(
            blocks,
            ["blk", "key"],
            id_col="gid",
            payload=("print",),
            pretagged=True,
            stats_key=f"{stats_key}:blocks" if stats_key else None,
        )
        .select(
            F.col("gid_a").alias("ga"),
            F.col("gid_b").alias("gb"),
            F.bit_count(F.col("print_a").bitwiseXOR(F.col("print_b")))
            .cast("int")
            .alias("hamming"),
        )
        .filter(F.col("hamming") <= _SH_HAM_MAIN)
        .distinct()
    )
    return _expand_groups(
        near, members, "hamming", F.lit(0).cast("int"), stats_key=stats_key
    )


def _simhash_pairs(fp: DataFrame) -> DataFrame:
    """Core SimHash block-bucket pipeline over (doc_id, print) — factored
    out so tests can drive it with synthetic corpora. Tags chunks live
    (same columns the published block-index artifact bakes)."""
    gp, members = _sh_group_map(fp)
    blocks = _tag_chunks(_sh_blocks(gp), ["blk", "key"], id_col="gid")
    return _simhash_from_blocks(members, blocks)


# Ground-truth sample size: stride = ceil(n / target) caps the sampled
# subset at ~20 docs whatever the corpus size, keeping the exact
# all-pairs Levenshtein O(target²) — constant (the round-5 scaling
# probe measured the previous constant %25 stride going quadratic:
# exponent 0.97 at 16x). At sf0.01 (500 docs) the adaptive stride is
# exactly the old 25, so gate-scale output is unchanged.
_EDIT_SAMPLE_TARGET = 20

_EDIT_ORACLE = f"""
WITH params AS (
  SELECT GREATEST(
           CAST((COUNT(*) + {_EDIT_SAMPLE_TARGET - 1}) // {_EDIT_SAMPLE_TARGET}
                AS BIGINT), 1) AS stride
  FROM documents
)
SELECT a.doc_id AS doc_a, b.doc_id AS doc_b,
       levenshtein(substr(a.text, 1, 80), substr(b.text, 1, 80)) AS edit_dist
FROM documents a JOIN documents b ON a.doc_id < b.doc_id
CROSS JOIN params
WHERE a.doc_id % params.stride = 0 AND b.doc_id % params.stride = 0
  AND levenshtein(substr(a.text, 1, 80), substr(b.text, 1, 80)) <= 55
"""


@register("dedup_edit_distance", oracle=_EDIT_ORACLE)
def dedup_edit_distance(spark: SparkSession, sf_dir: str) -> DataFrame:
    """Edit-distance near-dup pairs on 80-char prefixes over a bounded
    ~20-doc sample (corpus-adaptive stride — the sample, and so the
    quadratic, does NOT grow with the corpus): Levenshtein is O(len²)
    per pair and all-pairs is O(n²) — exact small tails only. The scale
    path stays MinHash/SimHash for candidate generation with edit
    distance as the precise verifier on candidates; prefix truncation
    bounds per-pair cost (a standard blocking trick)."""
    n = corpus_count(spark, sf_dir, "documents")
    # max(1, ...): an empty/degenerate corpus yields stride 0 and a
    # modulo-by-zero (ANSI DIVIDE_BY_ZERO in Spark, a hard error in the
    # DuckDB oracle) instead of a clean empty result — r9 review
    stride = max(1, (n + _EDIT_SAMPLE_TARGET - 1) // _EDIT_SAMPLE_TARGET)
    d = (
        table(spark, sf_dir, "documents")
        .filter(F.col("doc_id") % stride == 0)
        .select("doc_id", F.substring("text", 1, 80).alias("prefix"))
    )
    a, b = d.alias("a"), d.alias("b")
    dist = F.levenshtein(F.col("a.prefix"), F.col("b.prefix"))
    return (
        a.join(b, F.col("a.doc_id") < F.col("b.doc_id"))
        .select(
            F.col("a.doc_id").alias("doc_a"),
            F.col("b.doc_id").alias("doc_b"),
            dist.alias("edit_dist"),
        )
        .filter(F.col("edit_dist") <= 55)
    )


# The near-dup edge list + symmetrization as a shared CTE block: ONE
# definition for every oracle built on the graph (_CC_ORACLE here,
# _PAGERANK_ORACLE in operators/graph.py) — the threshold literal was
# previously duplicated per oracle and could drift from neardup_edges.
_EDGES_SYM_CTES = """
edges AS (
  SELECT p.doc_a, p.doc_b
  FROM pairs p
  JOIN sizes sa ON sa.doc_id = p.doc_a
  JOIN sizes sb ON sb.doc_id = p.doc_b
  WHERE CAST(p.n_common AS DOUBLE) / (sa.n_sh + sb.n_sh - p.n_common) >= 0.05
),
sym AS (
  SELECT doc_a AS src, doc_b AS dst FROM edges
  UNION
  SELECT doc_b, doc_a FROM edges
)"""

_CC_ORACLE = f"""
WITH RECURSIVE {_JACCARD_CTES},
{_EDGES_SYM_CTES},
reach(src, dst) AS (
  SELECT doc_id, doc_id FROM docs
  UNION
  SELECT r.src, s.dst FROM reach r JOIN sym s ON r.dst = s.src
)
SELECT src AS doc_id, MIN(dst) AS component
FROM reach GROUP BY src
"""


def neardup_edges(spark: SparkSession, sf_dir: str) -> DataFrame:
    """The near-dup edge list (exact n-gram-Jaccard pairs ≥ 0.05),
    materialized once per sf to scratch parquet — the iterative consumers
    (connected components, PageRank) re-read it every iteration, and at
    100 TB an edge list feeding a multi-round algorithm is always
    checkpointed to storage first so iterations scan a compact columnar
    file instead of re-running the shingle self-join. Same atomic
    temp-dir + rename publish as the shingle index."""
    return _published_parquet(
        spark,
        sf_dir,
        # s10: the doc_id%10 node-sample literal is baked into the name so a
        # sample edit addresses a fresh artifact instead of silently
        # serving stale edges (published_parquet contract; r9 review)
        "neardup_edges_2g_t005_s10",
        lambda: dedup_ngram_jaccard(spark, sf_dir).select("doc_a", "doc_b"),
        reap_family="neardup_edges_",
    )


def neardup_graph(spark: SparkSession, sf_dir: str):
    """The near-dup graph both iterative consumers operate on, built
    ONCE: (nodes, symmetrized-edges) with the edge frame persisted.
    Connected components and PageRank must agree on the node sample and
    symmetrization (dedup keeps the most CENTRAL copy per COMPONENT, so
    the two outputs compose) — a private copy in each consumer could
    silently drift. Caller owns sym's unpersist."""
    edges = neardup_edges(spark, sf_dir)
    nodes = (
        table(spark, sf_dir, "documents")
        .filter(F.col("doc_id") % 10 == 0)
        .select("doc_id")
    )
    sym = (
        edges.selectExpr("doc_a AS src", "doc_b AS dst")
        .unionByName(edges.selectExpr("doc_b AS src", "doc_a AS dst"))
        .persist()
    )
    return nodes, sym


_CC_MAX_ITER = 50
_CKPT_EVERY = 5  # localCheckpoint cadence for iterative driver loops


class PropagationCapExceeded(RuntimeError):
    """min-label propagation hit its diameter cap before convergence —
    the dedicated sentinel `connected_components` dispatches on, so an
    unrelated RuntimeError from the loop's internals surfaces instead
    of silently triggering a full star-contraction recompute."""


def min_label_propagate(
    nodes: DataFrame,
    sym: DataFrame,
    max_iter: int = _CC_MAX_ITER,
    ckpt_every: int = _CKPT_EVERY,
) -> DataFrame:
    """Pregel-style min-label propagation to convergence.

    ``nodes``: one column ``doc_id``; ``sym``: symmetrized edges
    ``(src, dst)``. Every ``ckpt_every`` iterations the label frame is
    ``localCheckpoint(eager=True)``-ed: the plan is cut to the
    materialized blocks, so lineage (and with it plan-compile time and
    failure-recovery cost) stays O(ckpt_every) instead of O(iterations).
    Raises if the iteration cap is hit before ``changed == 0`` — an
    unconverged label frame is silently-wrong components, never returned.
    """
    from pyspark.sql import Observation

    labels = nodes.select("doc_id", F.col("doc_id").alias("component")).persist()
    labels_ckpt_ids: set[int] = set()
    for it in range(max_iter):
        # the node's own row carries is_self=1, so the min-reduce can emit
        # BOTH the new label (min over self+neighbors) and the old one
        # (the self row's label) in one aggregation — the convergence
        # check then rides the same materializing action via observe()
        # instead of costing a labels-join (3 shuffles) per iteration
        msgs = sym.join(
            labels.withColumnRenamed("doc_id", "src_id"),
            F.col("src") == F.col("src_id"),
        ).select(
            F.col("dst").alias("doc_id"), "component", F.lit(0).alias("is_self")
        )
        self_rows = labels.select("doc_id", "component", F.lit(1).alias("is_self"))
        obs = Observation(f"cc_iter_{it}")
        new_labels = (
            self_rows.unionByName(msgs)
            .groupBy("doc_id")
            .agg(
                F.min("component").alias("component"),
                F.max(F.when(F.col("is_self") == 1, F.col("component"))).alias(
                    "old"
                ),
            )
            .observe(
                obs,
                # old IS NULL counts as changed: a node reached only as
                # a message target (present in sym, absent from nodes)
                # has no self row, so old = NULL — `component < old`
                # would be NULL-uncounted and an iteration introducing
                # only such nodes would read changed == 0 and return
                # un-propagated labels (round-8 review; in-repo callers
                # always pass endpoint-complete nodes, this pins the
                # utility contract for ones that don't)
                F.count(
                    F.when(
                        F.col("old").isNull()
                        | (F.col("component") < F.col("old")),
                        1,
                    )
                ).alias("changed"),
            )
            .select("doc_id", "component")
        )
        # materialize_swap also releases the PREDECESSOR's storage —
        # including checkpoint blocks, which plain unpersist() can't see
        # (they live outside the CacheManager) — so no block set leaks
        # per checkpoint cadence.
        labels, labels_ckpt_ids = materialize_swap(
            labels, labels_ckpt_ids, new_labels, (it + 1) % ckpt_every == 0
        )
        changed = obs.get["changed"]
        if changed == 0:
            return labels
    # release the unconverged frame's storage (cache entry or checkpoint
    # blocks) BEFORE raising: the connected_components fallback would
    # otherwise strand an O(|nodes|) block set for the session on
    # exactly the deep-graph path it exists to handle
    if labels_ckpt_ids:
        unpersist_rdd_ids(labels.sparkSession, labels_ckpt_ids)
    else:
        labels.unpersist()
    raise PropagationCapExceeded(
        f"min-label propagation did not converge in {max_iter} iterations "
        "(graph diameter exceeds the cap); raise max_iter or switch to "
        "alternating-star contraction"
    )


_STAR_MAX_ROUNDS = 40


def star_contract_components(
    nodes: DataFrame,
    sym: DataFrame,
    max_rounds: int = _STAR_MAX_ROUNDS,
    ckpt_every: int = 1,
    rounds_out: list | None = None,
) -> DataFrame:
    """Alternating large-/small-star contraction (Kiveris et al.,
    "Connected Components in MapReduce and Beyond", SoCC'14): connected
    components in O(log n) rounds INDEPENDENT of graph diameter — the
    switch for deep/giant components (web-scale boilerplate clusters,
    re-crawl chains) where min-label propagation needs ~diameter rounds.

    Edges live in canonical pointer form (child u > parent v).
    Large-star: every node links its larger neighbors to
    m = min(N(u) ∪ {u}); small-star: every node links its smaller
    neighbors and itself to their minimum. Each operation is one
    groupBy + one equi-join over the current edge set — no all-pairs
    step, and the edge count never exceeds the input's. The alternation
    converges to a star forest whose centers are the component minima,
    detected by an edge-multiset fingerprint (count + bounded hash sum:
    two longs of driver state per round). Same output contract as
    min_label_propagate — (doc_id, component = min doc_id reachable).
    Lineage is localCheckpoint-truncated EVERY round (ckpt_every=1):
    each round references the edge frame ~6 times (symmetrize + two
    join sides + small-star parts), so un-truncated plans grow ~6^r and
    OOM the plan builder within a handful of rounds — unlike the
    min-label loop's ~2 refs/iteration, which tolerates a cadence of 5.
    The star-forest shape is asserted before returning (never a partial
    contraction).
    """
    e = (
        sym.filter(F.col("src") != F.col("dst"))
        .select(
            F.greatest("src", "dst").alias("u"),
            F.least("src", "dst").alias("v"),
        )
        .distinct()
        .persist()
    )
    e_mat = e  # the frame holding storage (persist/checkpoint target)
    e_ckpt_ids: set[int] = set()
    prev_fp: tuple | None = None
    converged = e.limit(1).count() == 0  # edgeless graph: all singletons
    rnd = -1
    for rnd in range(max_rounds):
        if converged:
            break
        # large-star: m_u = min over the FULL neighborhood ∪ {u} (needs
        # both edge directions); each canonical edge (u > v) is u's
        # membership in N(v) with u > v, so it re-points to m_v.
        sym_e = e.unionByName(
            e.select(F.col("v").alias("u"), F.col("u").alias("v"))
        )
        mins = (
            sym_e.groupBy("u")
            .agg(F.min("v").alias("mn"))
            .select(F.col("u").alias("a"), F.least("mn", "u").alias("m"))
        )
        large = (
            e.join(mins, F.col("v") == F.col("a"))
            .select("u", F.col("m").alias("v"))
            .filter(F.col("u") != F.col("v"))
            .distinct()
        )
        # small-star on pointer edges: m_u = min of u's smaller
        # neighbors; u and every other smaller neighbor re-point to it.
        # The grouped side is renamed (su/m) before re-joining `large`:
        # joining a frame with its own aggregate re-uses attribute ids
        # across the union branches and trips Catalyst's checkpoint
        # resolution ("key not found" on the shared attribute).
        mins_s = (
            large.groupBy("u")
            .agg(F.min("v").alias("m"))
            .select(F.col("u").alias("su"), "m")
        )
        small = (
            mins_s.select(F.col("su").alias("u"), F.col("m").alias("v"))
            .unionByName(
                large.join(mins_s, F.col("u") == F.col("su"))
                .filter(F.col("v") != F.col("m"))
                .select(F.col("v").alias("u"), F.col("m").alias("v"))
            )
            .distinct()
        )
        e_mat, e_ckpt_ids = materialize_swap(
            e_mat, e_ckpt_ids, small, (rnd + 1) % ckpt_every == 0
        )
        # Re-alias on top of the checkpointed frame: the next round
        # self-joins it, and Catalyst's relation dedup misses shared
        # LogicalRDD attributes two checkpoints deep ("key not found:
        # u#N" at plan time); fresh Alias exprIds sidestep it. Keep
        # e_mat (the frame the CacheManager actually knows) separate:
        # unpersist() on the Project wrapper would be a silent no-op.
        e = e_mat.select(F.col("u").alias("u"), F.col("v").alias("v"))
        # multiset fingerprint: count + sum of bounded per-edge hashes
        # (mod 1e9+7 keeps the ANSI-mode long sum overflow-free out to
        # ~9e9 edges); a stable fingerprint across a full round means
        # large∘small hit its fixed point — a star forest.
        fp_row = e.agg(
            F.count(F.lit(1)).alias("n"),
            F.sum((F.xxhash64("u", "v") % F.lit(1_000_000_007)).cast("long")).alias(
                "h"
            ),
        ).collect()[0]
        fp = (fp_row.n, fp_row.h)
        if fp == prev_fp:
            converged = True
            break
        prev_fp = fp
    if not converged:
        # release the edge frame's storage (cache entry or checkpoint
        # blocks) BEFORE raising — same leak class min_label_propagate's
        # raise path releases: checkpoint blocks live outside the
        # CacheManager, so only unpersist_rdd_ids can free them.
        # e_mat, not e: e is a Project wrapper whose unpersist is a no-op.
        if e_ckpt_ids:
            unpersist_rdd_ids(e.sparkSession, e_ckpt_ids)
        else:
            e_mat.unpersist()
        raise RuntimeError(
            f"star contraction did not converge in {max_rounds} rounds "
            "— not expected for any graph (O(log n) bound); investigate"
        )
    if rounds_out is not None:
        # test hook: expose how many rounds convergence took, so the
        # O(log n)-vs-diameter claim is assertable
        rounds_out.append(rnd + 1)
    parents = e.groupBy("u").agg(
        F.min("v").alias("component"), F.count(F.lit(1)).alias("n_parents")
    )
    # fixed-point shape check: every child points at exactly one root
    multi = parents.filter(F.col("n_parents") > 1).limit(1).count()
    if multi:
        # same storage release as the non-convergence raise above: this
        # raise path must not strand e's checkpoint blocks either
        if e_ckpt_ids:
            unpersist_rdd_ids(e.sparkSession, e_ckpt_ids)
        else:
            e_mat.unpersist()
        raise RuntimeError("star contraction fixed point is not a star forest")
    # Label the SAME id set min_label_propagate labels (r9 review): nodes
    # PLUS every sym endpoint — message-only endpoints (in sym, absent
    # from nodes) got label rows on the min-label path, and the two
    # paths must agree row-for-row or the result silently changes shape
    # exactly when the diameter cap flips the dispatch. Children are in
    # parents.u; roots never appear as u at the fixed point and
    # coalesce to themselves (a root IS its component's min).
    ids = (
        nodes.select("doc_id")
        .unionByName(sym.select(F.col("src").alias("doc_id")))
        .unionByName(sym.select(F.col("dst").alias("doc_id")))
        .distinct()
    )
    labels = (
        ids.join(
            parents.select(F.col("u").alias("doc_id"), "component"),
            "doc_id",
            "left",
        )
        .select(
            "doc_id",
            F.coalesce("component", F.col("doc_id")).alias("component"),
        )
    )
    # Materialize the O(nodes) result and release the O(edges) round
    # state BEFORE returning (r9 review): the lazily-returned frame
    # otherwise pins the final round's edge checkpoint blocks — which
    # live outside the CacheManager, so a direct caller (anyone but
    # dedup_cluster_cc's storage-bracketed build) had no way to free
    # them and stranded an edge-frame block set per call.
    labels = labels.localCheckpoint(eager=True)
    if e_ckpt_ids:
        unpersist_rdd_ids(labels.sparkSession, e_ckpt_ids)
    else:
        e_mat.unpersist()
    return labels


def connected_components(
    nodes: DataFrame, sym: DataFrame, diameter_cap: int = _CC_MAX_ITER
) -> DataFrame:
    """Scale dispatch for connected components: min-label propagation
    first (cheapest per round; near-dup similarity graphs are shallow,
    so it converges in a handful of rounds), switching to alternating
    star contraction when the diameter cap trips — the
    diameter-independent O(log n) path for web-scale deep components.
    Both produce the identical (doc_id, component = min reachable
    doc_id) labeling, property-tested equal on shallow and deep graphs.
    """
    try:
        return min_label_propagate(nodes, sym, max_iter=diameter_cap)
    except PropagationCapExceeded:
        return star_contract_components(nodes, sym)


@register("dedup_cluster_cc", oracle=_CC_ORACLE)
def dedup_cluster_cc(spark: SparkSession, sf_dir: str) -> DataFrame:
    """Connected components over the near-dup graph — the step that turns
    pairwise similarities into dedup GROUPS (keep one doc per component).
    Implementation is Pregel-style min-label propagation
    (``min_label_propagate``): each iteration every node takes the min
    component id over itself and its neighbors; converges in
    graph-diameter iterations (near-dup components are shallow). This is
    the engine's iterative-algorithm surface: a driver-side loop over
    DataFrame ops with per-iteration persist, a convergence count, a
    localCheckpoint every few rounds to truncate lineage, and a hard
    error (never a silent wrong answer) if the cap is hit — at which
    point the ``connected_components`` dispatch switches to alternating
    large-/small-star contraction (diameter-independent O(log n)
    rounds), the 100 TB path for deep/giant components, property-tested
    label-identical to min-label on shallow AND deep graphs.
    Oracle: DuckDB recursive CTE reachability (component =
    MIN(reachable node))."""
    # The label table is the dedup GROUP MAP — the table downstream
    # dedup consumers read to pick one keeper per component — so it is
    # published once per fixture vintage like the shingle/print/ANN
    # artifacts; the iterative build below is the cold path.
    #
    # Storage-diff bracket around the cold build (round-8 review): the
    # labels frame the iterative loop returns HOLDS storage (a persist
    # or the final localCheckpoint's blocks — materialize_swap's "final
    # frame survives, it IS the result" contract), but here the result
    # is the parquet artifact, and the frame is abandoned right after
    # the write — stranding O(nodes) blocks for the session. Release
    # everything the build persisted once the publish lands. Same
    # single-threaded-driver caveat as checkpointing.py: the id diff
    # would mis-attribute a concurrent query's persists (no caller runs
    # one during a cold artifact build).
    before = persistent_rdd_ids(spark)
    out = _published_parquet(
        spark,
        sf_dir,
        "cc_labels_2g_t005_s10",
        lambda: _cc_build(spark, sf_dir),
        reap_family="cc_labels_",
    )
    leaked = persistent_rdd_ids(spark) - before
    if leaked:
        unpersist_rdd_ids(spark, leaked)
    return out


def _cc_build(spark: SparkSession, sf_dir: str) -> DataFrame:
    nodes, sym = neardup_graph(spark, sf_dir)
    try:
        return connected_components(nodes, sym)
    finally:
        # finally, not success-only: if the star-contraction fallback
        # raises after min-label hit its cap, the persisted O(2x edges)
        # frame must still be released (round-8 review — the loop bodies
        # release their own state on raise paths; this was the one
        # stranded frame left)
        sym.unpersist()


_CONTAINMENT_T = 0.2

_CONTAINMENT_ORACLE = f"""
WITH {_JACCARD_CTES}
SELECT p.doc_a, p.doc_b,
       round(CAST(p.n_common AS DOUBLE) / sa.n_sh, 9) AS cont_a_in_b,
       round(CAST(p.n_common AS DOUBLE) / sb.n_sh, 9) AS cont_b_in_a
FROM pairs p
JOIN sizes sa ON sa.doc_id = p.doc_a
JOIN sizes sb ON sb.doc_id = p.doc_b
WHERE greatest(CAST(p.n_common AS DOUBLE) / sa.n_sh,
               CAST(p.n_common AS DOUBLE) / sb.n_sh) >= {_CONTAINMENT_T}
"""


@register("dedup_containment", oracle=_CONTAINMENT_ORACLE)
def dedup_containment(spark: SparkSession, sf_dir: str) -> DataFrame:
    """Shingle-containment near-dup pairs: containment(A→B) =
    |A∩B| / |A| — the ASYMMETRIC similarity that catches doc-inside-doc
    duplication (quotes, wrapper boilerplate, a page embedded in a
    longer crawl), which symmetric Jaccard structurally under-scores
    (a 50-word doc fully contained in a 500-word doc has Jaccard ≈ 0.1
    but containment 1.0). Same scalable shape as dedup_ngram_jaccard:
    skew-bounded inverted-index join on shared shingles
    (``_shingle_pair_counts`` — hot shingles chunk-split, nothing
    dropped), then both containment directions come free from the same
    (n_common, |A|, |B|) counts — no extra pass. Shares the
    ``shingles_n2`` ingest artifact with dedup_ngram_jaccard (each of
    the pair count's join-side reads is a columnar scan with the
    doc_id%10 sample pushed down)."""
    sh = _shingles_cached(spark, sf_dir, 2).filter(F.col("doc_id") % 10 == 0)
    sizes = sh.groupBy("doc_id").agg(F.count(F.lit(1)).alias("n_sh"))
    pairs = _shingle_pair_counts(
        sh, stats_key=f"sh2s10:{scratch_tag(sf_dir, 'documents')}"
    )
    sa = sizes.alias("sa")
    sb = sizes.alias("sb")
    c_ab = F.col("n_common").cast("double") / F.col("sa.n_sh")
    c_ba = F.col("n_common").cast("double") / F.col("sb.n_sh")
    return (
        pairs.join(sa, F.col("doc_a") == F.col("sa.doc_id"))
        .join(sb, F.col("doc_b") == F.col("sb.doc_id"))
        .filter(F.greatest(c_ab, c_ba) >= _CONTAINMENT_T)
        .select(
            "doc_a",
            "doc_b",
            F.round(c_ab, 9).alias("cont_a_in_b"),
            F.round(c_ba, 9).alias("cont_b_in_a"),
        )
    )


# Duplicated-span inventory: the exact-substring-dedup building block
# (Lee et al. 2022 shape at shingle granularity) — which literal
# 8-token spans recur across distinct documents. Doc-level dedup
# (minhash/containment) misses these; this is what you mask or strip.
_SPAN_N = 8

_SPAN_ORACLE = f"""
WITH t AS (
  SELECT doc_id, string_split(lower(text), ' ') AS toks FROM documents
),
sh AS (
  SELECT doc_id,
         unnest(list_transform(
           range(1, len(toks) - {_SPAN_N} + 2),
           i -> array_to_string(list_slice(toks, i, i + {_SPAN_N} - 1), ' ')
         )) AS span
  FROM t WHERE len(toks) >= {_SPAN_N}
)
SELECT md5(span) AS span_hash,
       MIN(span) AS span,
       CAST(COUNT(DISTINCT doc_id) AS BIGINT) AS n_docs,
       CAST(COUNT(*) AS BIGINT) AS n_occurrences,
       MIN(doc_id) AS example_doc
FROM sh
GROUP BY md5(span)
HAVING COUNT(DISTINCT doc_id) >= 2
"""


@register("dedup_span_inventory", oracle=_SPAN_ORACLE)
def dedup_span_inventory(spark: SparkSession, sf_dir: str) -> DataFrame:
    """Cross-document duplicated spans: every {N}-token window that
    appears verbatim in >= 2 distinct documents, with occurrence counts
    and an example document — the target list for exact-substring
    deduplication (strip or mask recurring boilerplate that document-
    level near-dup never sees).

    Scale shape: one Generate per document (sliding windows over the
    token array, all codegen), then a hash aggregate keyed on the
    span's 128-bit digest — the exchange carries (digest, partial
    counts) after map-side combine, and the HAVING >= 2 filter runs in
    the final aggregate. Grouping on the digest rather than the span
    text keeps the shuffle key fixed-width; the span text itself rides
    along as a MIN (any value — equal keys have equal text mod md5
    collisions)."""
    d = table(spark, sf_dir, "documents")
    toks = _tokens()
    t = d.select("doc_id", toks.alias("toks")).filter(F.size("toks") >= _SPAN_N)
    sh = t.select(
        "doc_id",
        F.explode(
            F.transform(
                F.sequence(F.lit(1), F.size("toks") - _SPAN_N + 1),
                lambda i: F.array_join(F.slice(F.col("toks"), i, _SPAN_N), " "),
            )
        ).alias("span"),
    )
    return (
        sh.groupBy(F.md5(F.col("span").cast("binary")).alias("span_hash"))
        .agg(
            F.min("span").alias("span"),
            F.countDistinct("doc_id").alias("n_docs"),
            F.count(F.lit(1)).alias("n_occurrences"),
            F.min("doc_id").alias("example_doc"),
        )
        .filter(F.col("n_docs") >= 2)
    )
