"""End-to-end training-data curation pipeline as ONE declarative plan.

Composes the engine's curation primitives — quality gate, exact content
dedup, deterministic train/val/test split — into a single DataFrame
program. The value of declaring the whole pipeline (vs materializing
between stages) is that Catalyst fuses it: the quality filter pushes into
the scan, dedup is the only shuffle, and the split is a free projection
on top — at 100 TB the corpus is read once and shuffled once.
"""

from __future__ import annotations

from pyspark.sql import DataFrame, SparkSession, Window
from pyspark.sql import functions as F

from kinesis_datastore_app_spark.catalog import table
from kinesis_datastore_app_spark.operators.sampling import _M, _u_col, _u_sql
from kinesis_datastore_app_spark.llm.tokenization import tokens
from kinesis_datastore_app_spark.registry import register

MIN_CHARS = 100

_CURATION_ORACLE = f"""
WITH clean AS (
  SELECT doc_id, text, lang, n_chars FROM documents
  WHERE n_chars >= {MIN_CHARS} AND lang IS NOT NULL
),
deduped AS (
  SELECT doc_id, lang, n_chars
  FROM clean
  QUALIFY row_number() OVER (PARTITION BY md5(text) ORDER BY doc_id) = 1
)
SELECT doc_id, lang, n_chars,
       CASE WHEN {_u_sql("doc_id")} < 0.8 THEN 'train'
            WHEN {_u_sql("doc_id")} < 0.9 THEN 'val'
            ELSE 'test' END AS split
FROM deduped
"""


@register("pipeline_curation", oracle=_CURATION_ORACLE)
def pipeline_curation(spark: SparkSession, sf_dir: str) -> DataFrame:
    """Quality gate → exact dedup (keep lowest doc_id per content hash) →
    deterministic split, fused into one plan: the length/lang predicates
    reach the parquet scan (pushed filters), the content-hash dedup is
    the single shuffle (WindowGroupLimit caps it at one row per hash per
    task before the exchange), and split assignment is a key-derived
    expression (partitioning-invariant, see operators/sampling.py)."""
    d = table(spark, sf_dir, "documents").filter(
        (F.col("n_chars") >= MIN_CHARS) & F.col("lang").isNotNull()
    )
    w = Window.partitionBy(F.md5(F.col("text").cast("binary"))).orderBy("doc_id")
    deduped = (
        d.withColumn("rn", F.row_number().over(w))
        .filter(F.col("rn") == 1)
    )
    u = _u_col(F.col("doc_id"))
    return deduped.select(
        "doc_id",
        "lang",
        "n_chars",
        F.when(u < 0.8, "train").when(u < 0.9, "val").otherwise("test").alias("split"),
    )


_MANIFEST_ORACLE = f"""
WITH gated AS (
    SELECT doc_id, source, n_chars, text FROM documents
    WHERE n_chars >= 64 AND lang IS NOT NULL
),
c AS (SELECT source, COUNT(*) AS n FROM gated GROUP BY source),
t AS (SELECT SUM(n) AS total,
             SUM(TRY_CAST(substr(source, 4) AS INT) + 1) AS sumw FROM c),
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
SELECT g.doc_id,
       g.source,
       kp.keep_p,
       CASE WHEN {_u_sql(f"((g.doc_id % {_M}) * 131 + 17)")} < 0.9 THEN 'train'
            ELSE 'val' END AS split,
       CAST(len(string_split(g.text, ' ')) AS BIGINT) AS n_tokens
FROM gated g JOIN kp USING (source)
WHERE {_u_sql("g.doc_id")} < kp.keep_p
"""


@register("pipeline_training_manifest", oracle=_MANIFEST_ORACLE)
def pipeline_training_manifest(spark: SparkSession, sf_dir: str) -> DataFrame:
    """Training-manifest build, fused: quality gate → target-mixture
    downsample → train/val split → token budget, declared as ONE plan.
    The gate predicates push into the parquet scan; the only shuffle is
    the tiny per-source count behind the mixture keep-probabilities
    (group-cardinality-sized, broadcast back); membership, split and
    token count are all key-derived or per-row expressions riding that
    same scan. The split uses an independent LCG stream (key*131+17) so
    mixture membership and split assignment are uncorrelated — reusing
    one uniform for both would bias val toward low-keep_p sources.
    This is the manifest a trainer consumes: doc, source, inclusion
    probability (for loss reweighting), split, token count."""
    d = table(spark, sf_dir, "documents").filter(
        (F.col("n_chars") >= 64) & F.col("lang").isNotNull()
    )
    # shared mixture math, one single-partition exchange over the tiny
    # count frame instead of the 4x-recomputed crossJoin chain (r14,
    # guide §2.4) — see operators/sampling.mixture_keep_p
    from kinesis_datastore_app_spark.operators.sampling import (
        mixture_keep_p,
    )

    c = d.groupBy("source").agg(F.count(F.lit(1)).alias("n"))
    kp = mixture_keep_p(
        c, F.expr("TRY_CAST(substring(source, 4) AS INT) + 1")
    )
    # reduce the raw key mod M BEFORE the multiply (sampling.py's seed
    # discipline): doc_id * 131 on a 64-bit id overflows int64 ahead of
    # the helper's own mod — non-ANSI Spark wraps negative (u < 0 ->
    # everything lands 'train') while DuckDB errors. Same residue mod M,
    # so fixture outputs are unchanged.
    u_split = _u_col((F.col("doc_id") % _M) * 131 + 17)
    return (
        d.join(F.broadcast(kp), "source")
        .filter(_u_col(F.col("doc_id")) < F.col("keep_p"))
        .select(
            "doc_id",
            "source",
            "keep_p",
            F.when(u_split < 0.9, "train").otherwise("val").alias("split"),
            F.size(F.split(F.col("text"), " ")).cast("bigint").alias("n_tokens"),
        )
    )


_CARD_SHORT = 100

_DATASET_CARD_ORACLE = f"""
WITH g AS (
  SELECT source, lang,
         CAST(COUNT(*) AS BIGINT) AS n_docs,
         CAST(SUM(n_chars) AS BIGINT) AS total_chars,
         CAST(SUM(len(string_split(text, ' '))) AS BIGINT) AS total_tokens,
         CAST(COUNT(*) FILTER (WHERE n_chars < {_CARD_SHORT}) AS BIGINT)
             AS n_short
  FROM documents
  GROUP BY source, lang
),
t AS (SELECT SUM(n_docs) AS total FROM g)
SELECT g.source, g.lang, g.n_docs, g.total_chars, g.total_tokens, g.n_short,
       round(CAST(g.n_docs AS DOUBLE) / t.total, 9) AS corpus_share
FROM g, t
"""


@register("pipeline_dataset_card", oracle=_DATASET_CARD_ORACLE)
def pipeline_dataset_card(spark: SparkSession, sf_dir: str) -> DataFrame:
    """Dataset-card manifest: per (source, lang) document counts, char
    and token volumes, short-doc counts and corpus share — the summary
    table every released training corpus ships with, and the input to
    mixture planning (sample_mixture consumes exactly these shares).

    One scan, one grouped aggregation to group-cardinality-sized output;
    the corpus total joins back as a broadcast of a 1-row aggregate. All
    counters are integers (exact under any partitioning); the only
    float, corpus_share, is a single correctly-rounded division."""
    d = table(spark, sf_dir, "documents")
    g = d.groupBy("source", "lang").agg(
        F.count(F.lit(1)).alias("n_docs"),
        F.sum("n_chars").alias("total_chars"),
        F.sum(F.size(F.split(F.col("text"), " "))).cast("bigint").alias("total_tokens"),
        F.count(F.when(F.col("n_chars") < _CARD_SHORT, 1)).alias("n_short"),
    )
    t = g.agg(F.sum("n_docs").alias("total"))
    return g.crossJoin(F.broadcast(t)).select(
        "source",
        "lang",
        "n_docs",
        "total_chars",
        "total_tokens",
        "n_short",
        F.round(F.col("n_docs").cast("double") / F.col("total"), 9).alias(
            "corpus_share"
        ),
    )


# Length-based curriculum phases (short -> long is the standard training
# curriculum): tercile boundaries come from exact order statistics of the
# token count, found by bounded histogram refinement — not a global sort,
# and not an unbounded distinct-value collect.
_CURR_B = 4096  # histogram fan-out per refinement pass


def _order_stats(df, col: str, ks: list[int], lo: int, hi: int) -> dict[int, int]:
    """Exact k-th smallest values of integer column ``col`` for EVERY
    rank in ``ks``, via iterative bucket-histogram refinement: each pass
    buckets every still-unresolved rank's surviving interval into {B}
    fixed-width ranges with ONE shared map-combined groupBy (exchange
    and driver state O(|ks| × B)), and each crossing bucket shrinks its
    interval 4096x (see _CURR_B) — a 10^12-row column resolves in ~4 shared passes
    total, not ~4 per rank. The scale-safe replacement for collecting
    the full value histogram (or sorting)."""
    if lo is None or hi is None:
        # empty input: min/max aggregate to NULL — fail loudly at the
        # boundary instead of a None-comparison TypeError deep in the
        # refinement loop (round-8 review)
        raise ValueError(
            f"_order_stats: empty input for column {col!r} (lo/hi is NULL)"
        )
    state = {k: (k, lo, hi) for k in ks}  # rank -> (k within interval, lo, hi)
    out: dict[int, int] = {}
    while state:
        live = {}
        for rank, (k, rlo, rhi) in state.items():
            if rlo >= rhi:
                out[rank] = rlo
            else:
                live[rank] = (k, rlo, rhi)
        if not live:
            break
        state = live
        # one pass: bucket each unresolved rank's interval side by side
        bucket_cols = []
        for rank, (_, rlo, rhi) in state.items():
            width = rhi - rlo + 1
            # exact INTEGRAL bucket arithmetic (SQL `div`) — double
            # division misbuckets boundary values once widths pass
            # ~2^40, breaking the ceiling-division bound inversion
            # below (advisor, r4)
            bucket_cols.append(
                F.when(
                    F.col(col).between(rlo, rhi),
                    F.expr(f"(({col} - {rlo}) * {_CURR_B}) div {width}"),
                )
                .otherwise(None)
                .alias(f"b{rank}")
            )
        grouped = (
            df.select(*bucket_cols)
            .groupBy(*[f"b{rank}" for rank in state])
            .agg(F.count(F.lit(1)).alias("c"))
            .collect()
        )
        nxt = {}
        for rank, (k, rlo, rhi) in state.items():
            counts: dict[int, int] = {}
            for r in grouped:
                b = r[f"b{rank}"]
                if b is not None:
                    counts[b] = counts.get(b, 0) + r["c"]
            width = rhi - rlo + 1
            cum = 0
            for b in sorted(counts):
                c = counts[b]
                if cum + c >= k:
                    # bucket b holds v iff b <= (v-lo)*B/width < b+1:
                    # bounds invert with ceiling division on the left
                    nxt[rank] = (
                        k - cum,
                        rlo + -((-b * width) // _CURR_B),
                        rlo + -((-(b + 1) * width) // _CURR_B) - 1,
                    )
                    break
                cum += c
        # every unresolved rank must have found its crossing bucket —
        # a miss would surface later as a KeyError on the thresholds
        # map; fail here with the ranks named instead (advisor, r4)
        missed = set(state) - set(nxt)
        if missed:
            raise RuntimeError(f"no crossing bucket for ranks {missed}")
        state = nxt
    return out


def _order_stat(df, col: str, k: int, lo: int, hi: int) -> int:
    """Single-rank convenience wrapper over _order_stats."""
    return _order_stats(df, col, [k], lo, hi)[k]
_CURRICULUM_ORACLE = """
WITH d AS (
  SELECT doc_id, len(string_split(lower(text), ' ')) AS n_tokens FROM documents
),
tot AS (SELECT COUNT(*) AS n FROM d),
h AS (SELECT n_tokens AS v, COUNT(*) AS c FROM d GROUP BY v),
cum AS (SELECT v, SUM(c) OVER (ORDER BY v) AS cum FROM h),
b AS (SELECT (SELECT MIN(v) FROM cum, tot WHERE 3 * cum >= n) AS b1,
             (SELECT MIN(v) FROM cum, tot WHERE 3 * cum >= 2 * n) AS b2)
SELECT d.doc_id, d.n_tokens,
       CAST(CASE WHEN d.n_tokens <= b.b1 THEN 0
                 WHEN d.n_tokens <= b.b2 THEN 1
                 ELSE 2 END AS INT) AS phase
FROM d CROSS JOIN b
"""


@register("pipeline_curriculum", oracle=_CURRICULUM_ORACLE)
def pipeline_curriculum(spark: SparkSession, sf_dir: str) -> DataFrame:
    """Curriculum bucketing: assign each document a training phase
    (0/1/2) by token-count terciles — shortest third first, the
    classic length curriculum. The tercile boundaries are the exact
    ceil(N/3)-th and ceil(2N/3)-th order statistics of the integer
    token count, found by _order_stat's bounded histogram refinement —
    no global sort or single-partition window touches the corpus, and
    (unlike collecting the full distinct-count histogram) driver memory
    is O({B}) per pass regardless of how long documents get. The final
    phase assignment is a pure projection against two broadcast-literal
    boundaries. Boundary rule: phase p ends at the smallest count v
    with 3·cum(v) >= (p+1)·N, so ties stay in the earlier phase in
    both engines (no fractional interpolation, no float)."""
    d = table(spark, sf_dir, "documents").select(
        "doc_id",
        F.size(tokens()).alias("n_tokens"),
    )
    row = d.agg(
        F.count(F.lit(1)).alias("n"),
        F.min("n_tokens").alias("lo"),
        F.max("n_tokens").alias("hi"),
    ).collect()[0]
    n, lo, hi = row["n"], row["lo"], row["hi"]
    k1, k2 = -(-n // 3), -(-2 * n // 3)
    stats = _order_stats(d, "n_tokens", [k1, k2], lo, hi)
    b1, b2 = stats[k1], stats[k2]
    return d.select(
        "doc_id",
        "n_tokens",
        F.when(F.col("n_tokens") <= b1, 0)
        .when(F.col("n_tokens") <= b2, 1)
        .otherwise(2)
        .cast("int")
        .alias("phase"),
    )


# Incremental ingestion gate: dedup a NEW batch against the existing
# corpus without re-deduplicating the corpus — the continual-ingestion
# flow (at 100 TB you never re-process the accepted corpus; the batch
# probes its digest set and shingle index). The fixture constructs the
# batch from three deterministic slices: genuinely-new docs, verbatim
# re-ingests (must reject exact), and lowercased half-truncations
# (must reject as near-dup via containment).
_INC_SHINGLE_N = 3
_INC_STOP_DF = 50       # drop shingles present in > this many corpus docs
_INC_CONT_T = 0.5
# Synthetic batch ids: 2^61-scale offsets, NOT small fixed constants —
# a 600k/700k offset aliases real doc_ids (and each other) once the
# corpus outgrows it, merging two different documents under one
# batch_id (same scale-latent id-collision class fixed in dedup.py
# _MUT_OFF, multimodal _DUP_OFFSET, text_decontaminate negative ids).
_INC_EXACT_OFF = 1 << 61
_INC_TRUNC_OFF = (1 << 61) + (1 << 60)

_INC_DEDUP_ORACLE = f"""
WITH corpus AS (
  SELECT doc_id, text FROM documents WHERE doc_id % 10 != 9
),
batch AS (
  SELECT doc_id AS batch_id, text FROM documents WHERE doc_id % 10 = 9
  UNION ALL
  SELECT doc_id + {_INC_EXACT_OFF}, text FROM documents
  WHERE doc_id % 10 != 9 AND doc_id % 7 = 3
  UNION ALL
  SELECT doc_id + {_INC_TRUNC_OFF},
         array_to_string(
           string_split(lower(text), ' ')[1 :
             greatest(len(string_split(lower(text), ' ')) // 2, 1)], ' ')
  FROM documents
  WHERE doc_id % 10 != 9 AND doc_id % 7 != 3 AND doc_id % 11 = 5
),
c_sh AS (
  SELECT doc_id, shingle FROM (
    SELECT DISTINCT doc_id, unnest(list_distinct(list_transform(
             range(greatest(len(string_split(lower(text), ' ')) - {_INC_SHINGLE_N}, 0) + 1),
             i -> array_to_string(string_split(lower(text), ' ')[i + 1 : i + {_INC_SHINGLE_N}], ' ')
           ))) AS shingle
    FROM corpus
  ) WHERE len(shingle) > 0  -- mirror the Spark side's empty-shingle filter
),
b_sh AS (
  SELECT batch_id, shingle FROM (
    SELECT DISTINCT batch_id, unnest(list_distinct(list_transform(
             range(greatest(len(string_split(lower(text), ' ')) - {_INC_SHINGLE_N}, 0) + 1),
             i -> array_to_string(string_split(lower(text), ' ')[i + 1 : i + {_INC_SHINGLE_N}], ' ')
           ))) AS shingle
    FROM batch
  ) WHERE len(shingle) > 0
),
keep_sh AS (
  SELECT shingle FROM c_sh GROUP BY shingle HAVING COUNT(*) <= {_INC_STOP_DF}
),
b_kept AS (SELECT b.batch_id, b.shingle FROM b_sh b JOIN keep_sh USING (shingle)),
sizes AS (SELECT batch_id, COUNT(*) AS n_sh FROM b_kept GROUP BY batch_id),
cand AS (
  SELECT bk.batch_id, MAX(cnt) AS n_best FROM (
    SELECT b.batch_id, c.doc_id, COUNT(*) AS cnt
    FROM b_kept b JOIN c_sh c USING (shingle)
    GROUP BY b.batch_id, c.doc_id
  ) bk GROUP BY bk.batch_id
),
c_md5 AS (SELECT DISTINCT md5(text) AS h FROM corpus)
SELECT b.batch_id,
       CASE WHEN c_md5.h IS NOT NULL THEN 'exact_dup'
            WHEN s.n_sh > 0 AND cand.n_best IS NOT NULL
                 AND CAST(cand.n_best AS DOUBLE) / s.n_sh >= {_INC_CONT_T}
                 THEN 'near_dup'
            ELSE 'kept' END AS verdict,
       round(CASE WHEN s.n_sh > 0 AND cand.n_best IS NOT NULL
                  THEN CAST(cand.n_best AS DOUBLE) / s.n_sh
                  ELSE 0.0 END, 9) AS best_containment,
       CAST(COALESCE(s.n_sh, 0) AS BIGINT) AS n_sh
FROM batch b
LEFT JOIN c_md5 ON c_md5.h = md5(b.text)
LEFT JOIN sizes s ON s.batch_id = b.batch_id
LEFT JOIN cand ON cand.batch_id = b.batch_id
"""


@register("pipeline_incremental_dedup", oracle=_INC_DEDUP_ORACLE)
def pipeline_incremental_dedup(spark: SparkSession, sf_dir: str) -> DataFrame:
    """Incremental batch-vs-corpus dedup gate: an arriving batch is
    rejected per document as exact_dup (content digest already in the
    corpus), near_dup (>= {T} of its informative shingles contained in
    some single corpus doc), or kept. The corpus side is only ever
    PROBED — digest set and shingle inverted index — never re-deduped;
    that asymmetry is what makes continual ingestion affordable at
    100 TB (batch-sized work against indexed state, exactly how
    dedup_near_minhash's scratch index is meant to be reused).

    Stop-shingles (document frequency > {DF} in the corpus) are dropped
    before the candidate join — the posting-list cap that keeps the
    inverted-index join bounded under Zipf-heavy shingle distributions;
    the containment denominator counts only kept shingles, mirrored in
    the oracle."""
    d = table(spark, sf_dir, "documents")
    toks = tokens()
    corpus = d.filter(F.col("doc_id") % 10 != 9).select("doc_id", "text")
    half = F.array_join(
        F.slice(toks, 1, F.greatest((F.size(toks) / 2).cast("int"), F.lit(1))), " "
    )
    batch = (
        d.filter(F.col("doc_id") % 10 == 9)
        .select(F.col("doc_id").alias("batch_id"), "text")
        .unionByName(
            d.filter((F.col("doc_id") % 10 != 9) & (F.col("doc_id") % 7 == 3)).select(
                (F.col("doc_id") + _INC_EXACT_OFF).alias("batch_id"), "text"
            )
        )
        .unionByName(
            d.filter(
                (F.col("doc_id") % 10 != 9)
                & (F.col("doc_id") % 7 != 3)
                & (F.col("doc_id") % 11 == 5)
            ).select((F.col("doc_id") + _INC_TRUNC_OFF).alias("batch_id"), half.alias("text"))
        )
    )

    # Single shingle definition (round-8 review): dedup._shingles is THE
    # construction (its (id, shingle) output is already distinct given
    # unique ids — the local copy's trailing .distinct() was a full
    # extra shuffle of the op's largest intermediate that could never
    # drop a row). The corpus side reads the per-vintage materialized
    # index (shingles_n3 — the "indexed state" this op's docstring
    # promises to reuse) with the sample filter pushed into the scan;
    # only the batch side (synthetic ids + mutated texts) shingles live.
    from kinesis_datastore_app_spark.llm.dedup import (
        _shingles,
        _shingles_cached,
    )

    c_sh = _shingles_cached(spark, sf_dir, _INC_SHINGLE_N).filter(
        F.col("doc_id") % 10 != 9
    )
    b_sh = _shingles(
        batch.withColumnRenamed("batch_id", "doc_id"), _INC_SHINGLE_N
    ).withColumnRenamed("doc_id", "batch_id")
    keep = (
        c_sh.groupBy("shingle")
        .agg(F.count(F.lit(1)).alias("df"))
        .filter(F.col("df") <= _INC_STOP_DF)
        .select("shingle")
    )
    b_kept = b_sh.join(keep, "shingle")
    sizes = b_kept.groupBy("batch_id").agg(F.count(F.lit(1)).alias("n_sh"))
    cand = (
        b_kept.join(c_sh, "shingle")
        .groupBy("batch_id", "doc_id")
        .agg(F.count(F.lit(1)).alias("cnt"))
        .groupBy("batch_id")
        .agg(F.max("cnt").alias("n_best"))
    )
    c_md5 = corpus.select(F.md5(F.col("text").cast("binary")).alias("h")).distinct()
    probe = batch.withColumn("h", F.md5(F.col("text").cast("binary")))
    joined = (
        probe.join(c_md5.withColumn("is_exact", F.lit(True)), "h", "left")
        .join(sizes, "batch_id", "left")
        .join(cand, "batch_id", "left")
    )
    cont_ok = (F.col("n_sh") > 0) & F.col("n_best").isNotNull()
    cont = F.col("n_best").cast("double") / F.col("n_sh")
    return joined.select(
        "batch_id",
        F.when(F.col("is_exact"), "exact_dup")
        .when(cont_ok & (cont >= _INC_CONT_T), "near_dup")
        .otherwise("kept")
        .alias("verdict"),
        F.round(F.when(cont_ok, cont).otherwise(F.lit(0.0)), 9).alias(
            "best_containment"
        ),
        F.coalesce(F.col("n_sh"), F.lit(0)).alias("n_sh"),
    )


# Shard export: the delivery step — write the curated corpus as N
# balanced shard files plus the manifest a trainer's data loader
# consumes. Shard assignment is key-derived (doc_id % N), so the
# export is reproducible under any partitioning.
_EXPORT_SHARDS = 8

_EXPORT_ORACLE = f"""
WITH curated AS (
  SELECT doc_id, text, CAST(doc_id % {_EXPORT_SHARDS} AS INT) AS shard
  FROM documents WHERE n_chars >= 100
)
SELECT shard,
       CAST(COUNT(*) AS BIGINT) AS n_docs,
       CAST(SUM(len(string_split(text, ' '))) AS BIGINT) AS n_tokens,
       CAST(SUM(n_chars) AS BIGINT) AS n_chars,
       CAST(MIN(doc_id) AS BIGINT) AS min_doc,
       CAST(MAX(doc_id) AS BIGINT) AS max_doc
FROM (SELECT c.*, d.n_chars FROM curated c JOIN documents d USING (doc_id))
GROUP BY shard
"""


@register("pipeline_export_shards", oracle=_EXPORT_ORACLE)
def pipeline_export_shards(spark: SparkSession, sf_dir: str) -> DataFrame:
    """Training-shard export + manifest: the curated corpus lands as
    {N} shard directories (one writer task per shard via repartition on
    the shard key — no small-file spray), and the returned manifest
    (docs, tokens, chars, id range per shard) is what the training
    data-loader reads to plan epochs. Shard membership is doc_id % {N}:
    reproducible on any cluster, and uniformly balanced for dense ids
    (the dataset-card / mixture steps upstream handle WEIGHTED
    balancing). One scan + one write + one manifest aggregate; at
    100 TB the shard count scales with the loader's read parallelism,
    not with this job's task count."""
    import uuid as _uuid

    from kinesis_datastore_app_spark.catalog import scratch_path
    from kinesis_datastore_app_spark.tmpdirs import _activity_mtime, prune_aged

    d = table(spark, sf_dir, "documents").filter(F.col("n_chars") >= 100)
    curated = d.select(
        "doc_id",
        "text",
        "n_chars",
        (F.col("doc_id") % _EXPORT_SHARDS).cast("int").alias("shard"),
    )
    # Per-invocation run dir, age-gated cleanup (round-8 review): a
    # shared stable path + mode("overwrite") raced concurrent
    # invocations — writer A's overwrite deletes part-files under
    # writer B's lazy read-back (FileNotFoundException or a half-built
    # manifest). Unique dirs make each run's read-back self-consistent;
    # prune_aged collects old runs once no live reader plausibly holds
    # them (the keyed-sink pattern, _prune_old_sink_dirs).
    base = scratch_path(sf_dir, "documents", "training_shards_runs")
    prune_aged(base, "run_", 3600, activity=_activity_mtime)
    path = f"{base}/run_{_uuid.uuid4().hex[:12]}"
    curated.repartition(F.col("shard")).write.mode("overwrite").partitionBy(
        "shard"
    ).parquet(path)
    back = spark.read.parquet(path)
    return back.groupBy(F.col("shard").cast("int").alias("shard")).agg(
        F.count(F.lit(1)).alias("n_docs"),
        F.sum(F.size(F.split(F.col("text"), " "))).cast("bigint").alias("n_tokens"),
        F.sum("n_chars").alias("n_chars"),
        F.min("doc_id").alias("min_doc"),
        F.max("doc_id").alias("max_doc"),
    )


# Curation-funnel report: documents surviving each successive gate —
# the pipeline-observability row that says WHERE the corpus shrinks.
_FUNNEL_MIN_CHARS = 100
_FUNNEL_REP_DUP_WORD = 0.63

_CURATION_FUNNEL_ORACLE = f"""
WITH d AS (
  SELECT doc_id, text, lang, n_chars,
         1.0 - CAST(len(list_distinct(string_split(lower(text), ' ')))
                    AS DOUBLE) / len(string_split(lower(text), ' '))
           AS dup_word_frac,
         md5(text) AS h
  FROM documents
),
g AS (
  SELECT *,
         (n_chars >= {_FUNNEL_MIN_CHARS}) AS pass_len,
         (n_chars >= {_FUNNEL_MIN_CHARS} AND lang IS NOT NULL) AS pass_lang,
         (n_chars >= {_FUNNEL_MIN_CHARS} AND lang IS NOT NULL
          AND dup_word_frac <= {_FUNNEL_REP_DUP_WORD}) AS pass_rep
  FROM d
),
u AS (
  SELECT COUNT(*) AS n_dedup FROM (
    SELECT h FROM g WHERE pass_rep GROUP BY h
  )
)
SELECT CAST(COUNT(*) AS BIGINT) AS n_total,
       CAST(SUM(CASE WHEN pass_len THEN 1 ELSE 0 END) AS BIGINT) AS n_after_length,
       CAST(SUM(CASE WHEN pass_lang THEN 1 ELSE 0 END) AS BIGINT) AS n_after_lang,
       CAST(SUM(CASE WHEN pass_rep THEN 1 ELSE 0 END) AS BIGINT)
         AS n_after_repetition,
       CAST(ANY_VALUE(u.n_dedup) AS BIGINT) AS n_after_dedup
FROM g CROSS JOIN u
"""


@register("pipeline_curation_funnel", oracle=_CURATION_FUNNEL_ORACLE)
def pipeline_curation_funnel(spark: SparkSession, sf_dir: str) -> DataFrame:
    """Gate-by-gate survival counts for the curation pipeline (length →
    language → repetition → exact dedup): the observability row that
    tells you WHICH gate is eating the corpus before you ship a
    manifest. Monotone by construction. One scan computes every gate
    flag as conditional aggregates; the dedup stage is the only
    shuffle (distinct content hashes among repetition survivors) and
    joins back as a 1-row broadcast. The same row per (source, day) is
    the curation dashboard at 100 TB — identical plan, two more group
    keys."""
    d = table(spark, sf_dir, "documents")
    toks = tokens()
    dup_word = 1.0 - F.size(F.array_distinct(toks)).cast("double") / F.size(toks)
    g = d.select(
        "doc_id",
        "lang",
        "n_chars",
        F.md5(F.col("text").cast("binary")).alias("h"),
        (F.col("n_chars") >= _FUNNEL_MIN_CHARS).alias("pass_len"),
        ((F.col("n_chars") >= _FUNNEL_MIN_CHARS) & F.col("lang").isNotNull()).alias(
            "pass_lang"
        ),
        (
            (F.col("n_chars") >= _FUNNEL_MIN_CHARS)
            & F.col("lang").isNotNull()
            & (dup_word <= _FUNNEL_REP_DUP_WORD)
        ).alias("pass_rep"),
    )
    u = g.filter(F.col("pass_rep")).select("h").distinct().agg(
        F.count(F.lit(1)).alias("n_dedup")
    )
    return g.crossJoin(F.broadcast(u)).agg(
        F.count(F.lit(1)).alias("n_total"),
        F.sum(F.when(F.col("pass_len"), 1).otherwise(0)).alias("n_after_length"),
        F.sum(F.when(F.col("pass_lang"), 1).otherwise(0)).alias("n_after_lang"),
        F.sum(F.when(F.col("pass_rep"), 1).otherwise(0)).alias(
            "n_after_repetition"
        ),
        F.first("n_dedup").alias("n_after_dedup"),
    )


def _canonical_url_expr(url):
    """THE canonicalization rule set as one column expression (single
    definition for the operator and the property test): strip fragment,
    lowercase, drop the default :443 port, fold a slash-before-query
    into the query separator, drop utm_*/ref= tracking params, sort the
    remaining params. (A trailing slash on a query-less URL is
    deliberately untouched — ambiguous on real sites.)

    The port strip is ANCHORED TO THE AUTHORITY (round-9 review): a
    bare ':443/' substring replace corrupted ':443' occurrences inside
    query-param VALUES (e.g. a next=https://b.com:443/x redirect param
    — false collapse with its portless twin) and missed a port with no
    following slash ('https://a.com:443?a=1' — missed collapse). The
    pattern is RE2-compatible (capture, not lookahead) so the DuckDB
    oracle can mirror it."""
    # The slash fold is ANCHORED to the path-query boundary (round-10
    # review, same class as the :443 fix above): an unanchored '/\?'
    # replaces ALL occurrences in Spark but only the FIRST in DuckDB
    # (no 'g' flag) — an engine divergence on any URL with '/?' inside
    # a query-param value (next=/x/?y=1), which Spark additionally
    # corrupts. '^([^?]*)/\?' can only match the slash before the FIRST
    # '?' (the real separator), matches at most once in both engines,
    # and leaves values untouched. RE2-safe (capture, no lookbehind).
    u1 = F.regexp_replace(
        F.regexp_replace(
            F.lower(F.regexp_replace(url, r"#.*$", "")),
            r"^(https://[^/:?#]+):443([/?]|$)",
            "$1$2",
        ),
        r"^([^?]*)/\?",
        "$1?",
    )
    base = F.regexp_extract(u1, r"^([^?]*)", 1)
    q = F.regexp_extract(u1, r"\?(.*)$", 1)
    qq = F.array_join(
        F.sort_array(
            F.filter(
                F.split(q, "&"),
                lambda p: ~(p.startswith("utm_") | p.startswith("ref=")),
            )
        ),
        "&",
    )
    return F.concat(
        base, F.when(qq == "", F.lit("")).otherwise(F.concat(F.lit("?"), qq))
    )


_URL_CANON_ORACLE = """
WITH raw AS (
  SELECT doc_id,
         'site' || CAST((doc_id // 4) % 7 AS VARCHAR) || '.Example.COM' AS host,
         '/p/' || CAST(doc_id // 4 AS VARCHAR) AS path,
         doc_id % 4 AS v
  FROM documents
),
messy AS (
  SELECT doc_id,
         CASE v
           WHEN 0 THEN 'https://' || lower(host) || path || '?a=1&b=2'
           WHEN 1 THEN 'https://' || upper(host) || path || '?b=2&a=1#frag'
           WHEN 2 THEN 'https://' || lower(host) || path || '/?utm_source=feed&a=1&b=2'
           ELSE        'https://' || lower(host) || ':443' || path || '?a=1&ref=tw&b=2'
         END AS url
  FROM raw
),
canon AS (
  SELECT doc_id,
         regexp_replace(
           regexp_replace(lower(regexp_replace(url, '#.*$', '')),
                          '^(https://[^/:?#]+):443([/?]|$)', '\\1\\2'),
           '^([^?]*)/\\?', '\\1?') AS u1
  FROM messy
),
parts AS (
  SELECT doc_id,
         regexp_extract(u1, '^([^?]*)', 1) AS base,
         regexp_extract(u1, '\\?(.*)$', 1) AS q
  FROM canon
),
cleaned AS (
  SELECT doc_id,
         base || CASE WHEN qq = '' THEN '' ELSE '?' || qq END AS canonical_url
  FROM (
    SELECT doc_id, base,
           array_to_string(
             list_sort(list_filter(string_split(q, '&'),
                        p -> NOT (p LIKE 'utm\\_%' ESCAPE '\\'
                                  OR p LIKE 'ref=%'))),
             '&') AS qq
    FROM parts
  )
)
SELECT canonical_url,
       COUNT(*) AS n_variants,
       MIN(doc_id) AS keep_doc_id
FROM cleaned
GROUP BY canonical_url
"""


@register("dedup_url_canonical", oracle=_URL_CANON_ORACLE)
def dedup_url_canonical(spark: SparkSession, sf_dir: str) -> DataFrame:
    """Canonical-URL dedup — the FIRST pass of every web-crawl curation
    pipeline (cheaper than any content hash: no payload read needed):
    normalize each URL (strip fragment, lowercase, drop the default
    :443 port, strip the trailing slash before a query, drop
    utm_*/ref= tracking params, sort the remaining query params), then
    collapse to one keeper per canonical URL (deterministic MIN doc_id)
    with the variant count for crawl-frontier accounting.

    The fixture synthesizes four messy variants per logical page from
    doc_id alone (host-case, param order + fragment, trailing slash +
    utm_, default port + ref=) so every canonicalization rule is
    exercised and provably collapses; the oracle replays the same
    construction and rules in SQL. All string work is codegen
    projection at scan speed; the only exchange is the groupBy on the
    canonical key — at 100 TB that is the cheapest possible dedup
    shuffle (short keys, no payload), and per-host skew (one giant
    site) is absorbed by partial aggregation since the aggregates are
    associative counts/mins."""
    d = table(spark, sf_dir, "documents")
    page = F.expr("doc_id DIV 4")
    host = F.concat(
        F.lit("site"), (page % 7).cast("string"), F.lit(".Example.COM")
    )
    path = F.concat(F.lit("/p/"), page.cast("string"))
    v = F.col("doc_id") % 4
    url = (
        F.when(v == 0, F.concat(F.lit("https://"), F.lower(host), path, F.lit("?a=1&b=2")))
        .when(v == 1, F.concat(F.lit("https://"), F.upper(host), path, F.lit("?b=2&a=1#frag")))
        .when(v == 2, F.concat(F.lit("https://"), F.lower(host), path, F.lit("/?utm_source=feed&a=1&b=2")))
        .otherwise(
            F.concat(F.lit("https://"), F.lower(host), F.lit(":443"), path, F.lit("?a=1&ref=tw&b=2"))
        )
    )
    return (
        d.select("doc_id", _canonical_url_expr(url).alias("canonical_url"))
        .groupBy("canonical_url")
        .agg(
            F.count(F.lit(1)).alias("n_variants"),
            F.min("doc_id").alias("keep_doc_id"),
        )
    )
