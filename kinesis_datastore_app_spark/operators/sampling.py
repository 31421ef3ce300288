"""Deterministic sampling / dataset-split operators (training-data pipeline).

At 100 TB, `df.sample()` is the wrong tool for dataset curation: its
random stream depends on the physical partitioning, so the sample changes
whenever the cluster size, file layout, or AQE decisions change — a
reproducibility bug in any training pipeline. These operators derive the
randomness from the ROW's own key with the same minstd LCG used by the
trade generator (trades/generator.py): pure integer arithmetic, identical
under any partitioning, and expressible in ANSI SQL so the oracle replays
it exactly. This is also what makes train/test splits stable across
re-runs — membership is a function of the key, not of execution.

All three are single-pass, shuffle-free except the stratified variant's
one window shuffle on the stratum key.
"""

from __future__ import annotations

import functools
import operator as _op

from pyspark.sql import Column, DataFrame, SparkSession, Window
from pyspark.sql import functions as F

from kinesis_datastore_app_spark.catalog import table
from kinesis_datastore_app_spark.registry import register

_A, _M = 48271, 2147483647  # Park-Miller minstd (public constants)
# sampler stream tag (note: NOT independent of the trade generator's
# streams — generator.py's s0 = i*4+(k+1) covers every positive integer,
# so no tag can decorrelate from it; fine across unrelated tables, but
# do not compose trade uniforms with document-sample uniforms)
_TAG = 5

# Seed discipline: every seed expression reduces the raw key mod M
# BEFORE the multiply, with a NON-NEGATIVE (pmod) reduction. 48271 * s
# only stays inside int64 for s < 2^46; a raw 64-bit id (hash-derived
# keys, or row ids at the 100 TB design scale) would abort under ANSI
# Spark and wrap negative elsewhere — turning 'u < rate' into
# keep-everything. And `%` is DIVIDEND-SIGNED in both Spark and DuckDB,
# so a plain (i % M) on the negative half of hash-derived keys returned
# u < 0: every sampler kept 100% of those rows, both engines agreeing
# on the wrong thing so the differential could never catch it (round-10
# review, verified by live probe). pmod is output-identical for every
# non-negative id, which covers all fixtures. The key also casts to
# BIGINT first: int32 inputs would overflow the *mult step under ANSI.
#
# ONE parameterized helper pair — the bootstrap stream (mult 512,
# _BOOT_TAG, +resample term) previously re-implemented the discipline
# in two more function bodies, so a fix here could silently miss it.


def _lcg_u_col(i: Column, mult: int, tag: int, extra: Column | None = None) -> Column:
    key = F.pmod(i.cast("bigint"), F.lit(_M))
    s0 = key * F.lit(mult) + F.lit(tag)
    if extra is not None:
        s0 = s0 + extra
    s0 = s0 % F.lit(_M)  # all terms non-negative: % == pmod here
    h1 = (F.lit(_A) * s0) % F.lit(_M)
    h2 = (F.lit(_A) * h1) % F.lit(_M)
    return h2.cast("double") / F.lit(float(_M))


def _lcg_u_sql(i: str, mult: int, tag: int, extra: str | None = None) -> str:
    key = f"((CAST(({i}) AS BIGINT) % {_M} + {_M}) % {_M})"
    terms = f"{key} * {mult} + {tag}" + (f" + ({extra})" if extra else "")
    s0 = f"(({terms}) % {_M})"
    h1 = f"(({_A} * {s0}) % {_M})"
    h2 = f"(({_A} * {h1}) % {_M})"
    return f"(CAST({h2} AS DOUBLE) / {float(_M)})"


def _u_col(i: Column) -> Column:
    """Key-derived uniform in (0,1): double-stepped minstd LCG on the key."""
    return _lcg_u_col(i, 8, _TAG)


def _u_sql(i: str) -> str:
    return _lcg_u_sql(i, 8, _TAG)


SAMPLE_RATE = 0.2

_BERNOULLI_ORACLE = f"""
SELECT doc_id, lang, source, n_chars
FROM documents
WHERE {_u_sql("doc_id")} < {SAMPLE_RATE}
"""


@register("sample_bernoulli", oracle=_BERNOULLI_ORACLE)
def sample_bernoulli(spark: SparkSession, sf_dir: str) -> DataFrame:
    """Reproducible Bernoulli sample: keep a row iff its key-derived
    uniform < rate. Unlike df.sample(), membership is a pure function of
    doc_id — the same docs are sampled on 1 core or 1000 executors, and
    the filter stays a codegen'd scan predicate (no extra pass)."""
    d = table(spark, sf_dir, "documents")
    return d.filter(_u_col(F.col("doc_id")) < SAMPLE_RATE).select(
        "doc_id", "lang", "source", "n_chars"
    )


_SPLIT_ORACLE = f"""
SELECT doc_id,
       CASE WHEN {_u_sql("doc_id")} < 0.8 THEN 'train'
            WHEN {_u_sql("doc_id")} < 0.9 THEN 'val'
            ELSE 'test' END AS split,
       n_chars
FROM documents
"""


@register("split_train_test", oracle=_SPLIT_ORACLE)
def split_train_test(spark: SparkSession, sf_dir: str) -> DataFrame:
    """Deterministic 80/10/10 train/val/test assignment from the key's
    uniform — every re-run, engine, and cluster shape yields the same
    membership (the property that keeps eval sets uncontaminated when the
    corpus is re-processed). One thresholded expression, no shuffle."""
    d = table(spark, sf_dir, "documents")
    u = _u_col(F.col("doc_id"))
    return d.select(
        "doc_id",
        F.when(u < 0.8, "train").when(u < 0.9, "val").otherwise("test").alias("split"),
        "n_chars",
    )


K_PER_STRATUM = 20

_STRATIFIED_ORACLE = f"""
SELECT label, vec_id
FROM embeddings
QUALIFY row_number() OVER (PARTITION BY label
                           ORDER BY {_u_sql("vec_id")}, vec_id) <= {K_PER_STRATUM}
"""


@register("sample_stratified", oracle=_STRATIFIED_ORACLE)
def sample_stratified(spark: SparkSession, sf_dir: str) -> DataFrame:
    """Exact k-per-stratum sample: order each label's rows by their
    key-derived uniform (a deterministic shuffle) and keep the first k.
    One hash shuffle on the stratum key; Spark's WindowGroupLimit keeps
    only k rows per label per task before the exchange, so the full
    stratum never materializes — the balanced-subset primitive for
    class-balanced training data."""
    e = table(spark, sf_dir, "embeddings")
    w = Window.partitionBy("label").orderBy(_u_col(F.col("vec_id")), "vec_id")
    return (
        e.withColumn("rn", F.row_number().over(w))
        .filter(F.col("rn") <= K_PER_STRATUM)
        .select("label", "vec_id")
    )


_WEIGHT_CAP = 2000.0

_WEIGHTED_ORACLE = f"""
SELECT doc_id,
       n_chars,
       least(1.0, CAST(n_chars AS DOUBLE) / {_WEIGHT_CAP}) AS keep_p
FROM documents
WHERE {_u_sql("doc_id")} < least(1.0, CAST(n_chars AS DOUBLE) / {_WEIGHT_CAP})
"""


@register("sample_weighted", oracle=_WEIGHTED_ORACLE)
def sample_weighted(spark: SparkSession, sf_dir: str) -> DataFrame:
    """Importance-weighted Bernoulli sample: each document's inclusion
    probability scales with its weight (here length-derived,
    min(1, n_chars/2000)) — the data-mixing primitive for up/down-
    weighting sources in a training corpus while keeping per-row cost at
    one comparison. Membership stays a pure function of (doc_id,
    n_chars): reproducible under any partitioning, and the emitted
    keep_p column is what a downstream loss-reweighting step divides by
    (Horvitz-Thompson correction). Pure rational arithmetic — no
    transcendentals whose last-ulp behavior could differ across engines."""
    d = table(spark, sf_dir, "documents")
    keep_p = F.least(
        F.lit(1.0), F.col("n_chars").cast("double") / F.lit(_WEIGHT_CAP)
    )
    return (
        d.select("doc_id", "n_chars", keep_p.alias("keep_p"))
        .filter(_u_col(F.col("doc_id")) < F.col("keep_p"))
    )


# Weight = source-name suffix + 1; a source whose name does not parse
# RAISES in both engines (round-10 review: the bare TRY_CAST silently
# NULLed a non-conforming source's weight, which dropped ALL of that
# source's rows from the output corpus and inflated every other
# source's keep_p — a silent curation hole the differential could never
# catch because both sides agreed).
_W_SQL = (
    "CASE WHEN TRY_CAST(substr(source, 4) AS INT) IS NULL"
    " THEN CAST(error('sample_mixture: source ' || source ||"
    " ' does not match src<digits>') AS INT)"
    " ELSE TRY_CAST(substr(source, 4) AS INT) END"
)

_MIXTURE_ORACLE = f"""
WITH c AS (SELECT source, COUNT(*) AS n FROM documents GROUP BY source),
t AS (SELECT SUM(n) AS total,
             SUM({_W_SQL} + 1) AS sumw
      FROM c),
k AS (
  SELECT c.source,
         CAST(c.n AS DOUBLE) / t.total AS share,
         CAST(TRY_CAST(substr(c.source, 4) AS INT) + 1 AS DOUBLE) / t.sumw
             AS tshare
  FROM c, t
),
a AS (SELECT MIN(share / tshare) AS alpha FROM k),
kp AS (SELECT k.source, round(a.alpha * k.tshare / k.share, 9) AS keep_p
       FROM k, a)
SELECT d.doc_id, d.source, kp.keep_p
FROM documents d JOIN kp USING (source)
WHERE {_u_sql("d.doc_id")} < kp.keep_p
"""


def mixture_keep_p(c: DataFrame, w_int: Column) -> DataFrame:
    """(source, keep_p) from a per-source count frame ``c`` (columns
    source, n) and the integer target-weight expression ``w_int`` —
    the shared mixture math behind sample_mixture and
    pipeline_training_manifest.

    r14 restructure (guide §2.4 — share one exchange): the previous
    c → t → k → a → kp chain built t and a as separate aggregates and
    crossJoined them back, so Catalyst re-computed the count subtree
    (a full corpus scan + groupBy each) FOUR times inside one plan —
    measured 11–13 Exchanges per key. All four whole-frame statistics
    (total, sumw, and alpha over the derived shares) are now window
    aggregates over ONE single-partition exchange of the
    group-cardinality-sized count frame (≤ tens of rows — the window
    partition is a literal, so no data-sized skew is possible).
    Arithmetic is bit-identical to the oracle's: integer SUMs are
    exact under any order, and every double op (share, tshare,
    share/tshare, MIN, the rounded keep_p product) is the same
    expression tree as before."""
    wall = Window.partitionBy(F.lit(1))
    w = w_int.cast("double")
    k = c.select(
        "source",
        (F.col("n").cast("double") / F.sum("n").over(wall)).alias("share"),
        (w / F.sum(w_int).over(wall)).alias("tshare"),
    )
    return k.select(
        "source",
        F.round(
            F.min(F.col("share") / F.col("tshare")).over(wall)
            * F.col("tshare")
            / F.col("share"),
            9,
        ).alias("keep_p"),
    )


@register("sample_mixture", oracle=_MIXTURE_ORACLE)
def sample_mixture(spark: SparkSession, sf_dir: str) -> DataFrame:
    """Target-mixture downsampling: resample the corpus so per-source
    proportions hit a target mixture (here weight ∝ source suffix + 1 —
    deterministic and oracle-replayable) WITHOUT upsampling any source.
    alpha = min_s(share_s / target_s) is the largest feasible scale, so
    the binding source keeps 100% and every other source thins to
    alpha * target_s / share_s — the standard data-mixing step when
    assembling a training corpus from heterogeneous sources.

    Cost shape: one grouped count (source cardinality is tiny), the
    20-row keep-probability table broadcasts back, and membership stays
    the key-derived-uniform filter — reproducible under any partitioning
    and executable at scan speed. The emitted keep_p is the
    Horvitz-Thompson correction factor for downstream loss weighting."""
    d = table(spark, sf_dir, "documents")
    # guarded weight: raise on a non-conforming source name instead of
    # TRY_CAST's silent NULL (see _W_SQL note — the oracle raises too)
    w_guard = (
        "CASE WHEN TRY_CAST(substring(source, 4) AS INT) IS NULL"
        " THEN CAST(raise_error(concat('sample_mixture: source ', source,"
        " ' does not match src<digits>')) AS INT)"
        " ELSE TRY_CAST(substring(source, 4) AS INT) END"
    )
    c = d.groupBy("source").agg(F.count(F.lit(1)).alias("n"))
    kp = mixture_keep_p(c, F.expr(w_guard) + 1)
    return (
        d.join(F.broadcast(kp), "source")
        .filter(_u_col(F.col("doc_id")) < F.col("keep_p"))
        .select("doc_id", "source", "keep_p")
    )


RESERVOIR_K = 200

_RESERVOIR_ORACLE = f"""
SELECT doc_id, source, round({_u_sql("doc_id")}, 9) AS draw
FROM documents
ORDER BY {_u_sql("doc_id")}, doc_id
LIMIT {RESERVOIR_K}
"""


@register("sample_reservoir", oracle=_RESERVOIR_ORACLE)
def sample_reservoir(spark: SparkSession, sf_dir: str) -> DataFrame:
    """Exact-size uniform sample of K rows via bottom-k selection: keep
    the K rows with the smallest key-derived uniforms. This is the
    distributed form of reservoir sampling — each partition keeps its
    local bottom-K and a constant-size merge picks the global bottom-K
    (TakeOrderedAndProject: no shuffle of the data, only K rows per
    partition move) — with the classic algorithm's statistical guarantee
    (every row equally likely) but none of its sequential-scan state.
    Unlike sample_bernoulli (fixed rate, variable size), the output size
    is exactly K regardless of corpus size, and membership is a pure
    function of doc_id: the same K docs on 1 core or 1000 executors."""
    d = table(spark, sf_dir, "documents")
    u = _u_col(F.col("doc_id"))
    return (
        d.select("doc_id", "source", F.round(u, 9).alias("draw"), u.alias("_u"))
        .orderBy("_u", "doc_id")
        .limit(RESERVOIR_K)
        .select("doc_id", "source", "draw")
    )


# Poisson(1) bootstrap: the scale-correct resampling scheme (a true
# bootstrap draws n rows WITH replacement — a global operation; Poisson
# bootstrap gives each row an independent Poisson(1) multiplicity, which
# is exact in distribution as n grows and needs no coordination at all).
# Multiplicities come from the same key-derived LCG as the samplers, so
# every resample is reproducible under any partitioning. Inverse-CDF
# thresholds are full-precision literals shared with the oracle.
_BOOT_R = 8
_BOOT_TAG = 256  # seed stream: event_id * 512 + 256 + r
_POISSON_CUM = (
    0.36787944117144233,
    0.7357588823428847,
    0.9196986029286058,
    0.9810118431238462,
    0.9963401531726563,
    0.9994058151824183,
)


def _boot_u_col(i: Column, r: Column) -> Column:
    # the bootstrap stream of the shared LCG helper (seed-discipline
    # note at module top); r = resample_id >= 0
    return _lcg_u_col(i, 512, _BOOT_TAG, extra=r)


def _boot_u_sql(i: str, r: str) -> str:
    return _lcg_u_sql(i, 512, _BOOT_TAG, extra=r)


def _poisson_k_col(u: Column) -> Column:
    k = F.lit(len(_POISSON_CUM))
    for j in range(len(_POISSON_CUM) - 1, -1, -1):
        k = F.when(u < F.lit(_POISSON_CUM[j]), F.lit(j)).otherwise(k)
    return k


def _poisson_k_sql(u: str) -> str:
    branches = " ".join(
        f"WHEN {u} < {c!r} THEN {j}" for j, c in enumerate(_POISSON_CUM)
    )
    return f"(CASE {branches} ELSE {len(_POISSON_CUM)} END)"


_BOOTSTRAP_ORACLE = f"""
WITH drawn AS (
  SELECT r.range AS resample_id, value,
         {_poisson_k_sql(_boot_u_sql("event_id", "r.range"))} AS mult
  FROM events CROSS JOIN range(0, {_BOOT_R}) r
)
SELECT CAST(resample_id AS INT) AS resample_id,
       CAST(SUM(mult) AS BIGINT) AS n_eff,
       round(CAST(SUM(CAST(value * mult AS DECIMAL(38,2))) AS DOUBLE)
             / SUM(mult), 6) AS mean_value
FROM drawn
GROUP BY resample_id
"""


@register("sample_poisson_bootstrap", oracle=_BOOTSTRAP_ORACLE)
def sample_poisson_bootstrap(spark: SparkSession, sf_dir: str) -> DataFrame:
    """Bootstrap confidence distribution for a metric (mean event value)
    via 8 (_BOOT_R) Poisson(1) resamples. One scan: each row explodes into its
    8 (resample, multiplicity) pairs — multiplicity is a pure function
    of (event_id, resample) through the minstd LCG, so the resample is
    identical on any cluster shape — and a partial-aggregated 8-group
    rollup produces the bootstrap distribution. At 100 TB: the exchange
    carries 8 rows per input partition; contrast df.sample(withReplacement)
    per resample, which re-scans the corpus R times and is partitioning-
    dependent."""
    e = table(spark, sf_dir, "events").select("event_id", "value")
    drawn = e.select(
        "value",
        F.explode(F.sequence(F.lit(0), F.lit(_BOOT_R - 1))).alias("resample_id"),
        F.col("event_id"),
    ).select(
        "resample_id",
        "value",
        _poisson_k_col(
            _boot_u_col(F.col("event_id"), F.col("resample_id"))
        ).alias("mult"),
    )
    return drawn.groupBy(F.col("resample_id").cast("int").alias("resample_id")).agg(
        F.sum("mult").alias("n_eff"),
        F.round(
            F.sum((F.col("value") * F.col("mult")).cast("decimal(38,2)")).cast(
                "double"
            )
            / F.sum("mult"),
            6,
        ).alias("mean_value"),
    )


# Class-balanced downsampling: cap every class at the minority class's
# count — the classifier-training rebalance (and the per-domain cap a
# data-mixing pipeline applies before weighting).
_BALANCED_ORACLE = """
WITH counts AS (
  SELECT label, COUNT(*) AS n FROM embeddings GROUP BY label
),
m AS (SELECT MIN(n) AS m FROM counts),
ranked AS (
  SELECT vec_id, label,
         row_number() OVER (PARTITION BY label ORDER BY vec_id) AS rn
  FROM embeddings
)
SELECT r.vec_id, r.label
FROM ranked r CROSS JOIN m
WHERE r.rn <= m.m
"""


_BALANCED_B = 4096  # histogram fan-out per refinement pass




@register("sample_balanced_class", oracle=_BALANCED_ORACLE)
def sample_balanced_class(spark: SparkSession, sf_dir: str) -> DataFrame:
    """Balance classes by downsampling every label to the minority
    count m — keeping, deterministically, each label's m smallest
    vec_ids. Scale path (no per-label sort anywhere): distributed exact
    selection. One count pass gives per-label (n, min, max) — bounded
    by the label cardinality — then iterative bucket-histogram
    refinement finds each label's m-th smallest vec_id: every pass
    buckets the surviving interval into up to 4096 (_BALANCED_B) fixed-width ranges, the
    exchange carries labels x B partial counts (map-combined), and the
    crossing bucket shrinks the interval 4096x (see _BALANCED_B), so a 10^12-row class
    resolves in ~4 passes with O(labels x B) driver state per pass.
    The final plan is a broadcast-joined scan filter (vec_id <=
    t_label) — no Window.partitionBy(label), so no single-reducer
    majority-class sort at 100 TB (the flaw in the naive rank-window
    form this replaces).
    """
    e = table(spark, sf_dir, "embeddings").select("vec_id", "label")
    stats = {
        r["label"]: (r["n"], r["lo"], r["hi"])
        for r in e.groupBy("label")
        .agg(
            F.count(F.lit(1)).alias("n"),
            F.min("vec_id").alias("lo"),
            F.max("vec_id").alias("hi"),
        )
        .collect()
    }
    m = min(n for n, _, _ in stats.values())
    # Per-label selection state: find the k-th smallest vec_id in
    # [lo, hi] (k is 1-based); shrink intervals until each is exact.
    state = {lab: (m, lo, hi) for lab, (n, lo, hi) in stats.items()}
    thresholds: dict = {}
    while state:
        conds, width_of = [], {}
        for lab, (_, lo, hi) in state.items():
            width_of[lab] = hi - lo + 1
            conds.append((F.col("label") == lab) & F.col("vec_id").between(lo, hi))
        live = e.filter(functools.reduce(_op.or_, conds))
        # per-pass fan-out clamp: (vec_id - lo) * B must stay inside
        # int64, so sparse/hashed 64-bit id spaces (width > 2^51) shrink
        # B for the first passes instead of overflowing — ANSI Spark
        # would abort, non-ANSI would wrap to negative buckets and
        # desynchronize the histogram from the exact inversion below.
        # Floor 2 keeps every pass halving (bounded pass count); widths
        # beyond 2^61 (a near-full int64 id range) are out of contract.
        b_pass = max(2, min(_BALANCED_B, (1 << 61) // max(width_of.values())))
        lo_map = F.create_map(
            *[F.lit(v) for lab, (_, lo, _) in state.items() for v in (lab, lo)]
        )
        w_map = F.create_map(
            *[F.lit(v) for lab in state for v in (lab, width_of[lab])]
        )
        # exact INTEGRAL bucket arithmetic (SQL `div`), mirroring the
        # ceiling-division bound inversion below — double division
        # misbuckets boundary values once widths pass ~2^40, making the
        # histogram inconsistent with the inverted bounds (advisor, r4)
        live = live.select(
            "label",
            "vec_id",
            lo_map[F.col("label")].alias("_lo"),
            w_map[F.col("label")].alias("_w"),
        )
        bucket = F.expr(f"((vec_id - _lo) * {b_pass}) div _w")
        hist = (
            live.groupBy("label", bucket.alias("b"))
            .agg(F.count(F.lit(1)).alias("c"))
            .collect()
        )
        per_label: dict = {}
        for r in hist:
            per_label.setdefault(r["label"], {})[r["b"]] = r["c"]
        nxt = {}
        for lab, (k, lo, hi) in state.items():
            width = hi - lo + 1
            cum = 0
            for b in sorted(per_label.get(lab, {})):
                c = per_label[lab][b]
                if cum + c >= k:
                    # bucket b holds v iff b <= (v-lo)*B/width < b+1, so
                    # its bounds invert with CEILING division on the left
                    # (B = b_pass, the same clamped fan-out the histogram
                    # bucketed with)
                    b_lo = lo + -((-b * width) // b_pass)
                    b_hi = lo + -((-(b + 1) * width) // b_pass) - 1
                    if b_lo == b_hi:
                        thresholds[lab] = b_lo
                    else:
                        nxt[lab] = (k - cum, b_lo, b_hi)
                    break
                cum += c
        # every live label must have found its crossing bucket — a miss
        # means the histogram disagrees with the bound inversion, and
        # silently dropping the label would discard its rows in the
        # final inner join (advisor, r4)
        missed = set(state) - set(nxt) - set(thresholds)
        if missed:
            raise RuntimeError(f"no crossing bucket for labels {missed}")
        state = nxt
    t_df = F.broadcast(
        spark.createDataFrame(
            [(lab, int(t)) for lab, t in thresholds.items()], "label int, t bigint"
        )
    )
    return (
        e.join(t_df, "label")
        .filter(F.col("vec_id") <= F.col("t"))
        .select("vec_id", "label")
    )


# Temperature-scaled mixture sampling: weight_s ∝ n_s^(1/T). T=2 (the
# sqrt rule) is the standard multilingual/multi-source rebalance — it
# upweights small sources RELATIVELY without letting any single giant
# source dominate the mix (used for mBERT/XLM-style corpus mixing).
_TEMP_BUDGET = 0.5  # expected kept fraction of the corpus

_TEMPERATURE_ORACLE = f"""
WITH c AS (SELECT source, COUNT(*) AS n FROM documents GROUP BY source),
w AS (SELECT source, n, round(sqrt(CAST(n AS DOUBLE)), 9) AS w9 FROM c),
t AS (SELECT SUM(n) AS total,
             CAST(SUM(CAST(w9 AS DECIMAL(38,9))) AS DOUBLE) AS sumw
      FROM w),
kp AS (SELECT w.source,
              round(LEAST(1.0, ({_TEMP_BUDGET} * t.total / t.sumw) / w.w9), 9)
                  AS keep_p
       FROM w, t)
SELECT d.doc_id, d.source, kp.keep_p
FROM documents d JOIN kp USING (source)
WHERE {{u}} < kp.keep_p
""".format(u=_u_sql("d.doc_id"))


@register("sample_temperature", oracle=_TEMPERATURE_ORACLE)
def sample_temperature(spark: SparkSession, sf_dir: str) -> DataFrame:
    """Temperature-scaled source mixing (T=2): per-source keep
    probability ∝ n_s^(1/T) / n_s = 1/sqrt(n_s), normalized so the
    expected kept volume is _TEMP_BUDGET of the corpus and clamped at 1
    (no upsampling — a tiny source keeps everything and the budget
    shortfall is accepted, the standard no-replacement convention;
    contrast sample_mixture's exact-target alpha). The classic sqrt
    rebalance for multi-source training corpora: giant sources thin
    hardest, small sources survive.

    Float discipline: the per-source weight sqrt(n) is pinned to 9
    decimals and the normalizer is an exact decimal sum of the pinned
    terms, so keep_p is bit-identical across engines and partitionings;
    membership is the shared key-derived-uniform filter. Cost shape:
    one tiny grouped count, a source-cardinality keep-p table broadcast
    back, membership at scan speed — same plan family as
    sample_mixture."""
    d = table(spark, sf_dir, "documents")
    c = d.groupBy("source").agg(F.count(F.lit(1)).alias("n"))
    w = c.select(
        "source",
        "n",
        F.round(F.sqrt(F.col("n").cast("double")), 9).alias("w9"),
    )
    t = w.agg(
        F.sum("n").alias("total"),
        F.sum(F.col("w9").cast("decimal(38,9)")).cast("double").alias("sumw"),
    )
    kp = w.crossJoin(F.broadcast(t)).select(
        "source",
        F.round(
            F.least(
                F.lit(1.0),
                (F.lit(_TEMP_BUDGET) * F.col("total") / F.col("sumw"))
                / F.col("w9"),
            ),
            9,
        ).alias("keep_p"),
    )
    return (
        d.join(F.broadcast(kp), "source")
        .filter(_u_col(F.col("doc_id")) < F.col("keep_p"))
        .select("doc_id", "source", "keep_p")
    )
