"""Text-analysis operators for training-data pipelines (SURVEY.md §2.B10).

All hot-path computation is Catalyst expressions (regexp, split,
aggregate over token arrays) — language ID, quality scoring, token
counting and fingerprinting run inside whole-stage codegen with zero
Python per row, so they stream over 100 TB of documents at scan speed.
"""

from __future__ import annotations

from pyspark.sql import DataFrame, SparkSession, Window
from pyspark.sql import functions as F

from kinesis_datastore_app_spark.catalog import scratch_tag, table
from kinesis_datastore_app_spark.llm.tokenization import tokens
from kinesis_datastore_app_spark.registry import register

# ---------------------------------------------------------------------------
# Size-gated dimension broadcast (round-9; the round-8 verdict's watch
# item). The corpus-derived vocab/df tables these operators join back
# onto the token stream are Zipf-bounded — sub-linear in corpus size —
# but unbounded in principle (a 100 TB web crawl's distinct-unigram set
# reaches billions: ids, urls, typos). A FORCED broadcast of such a
# table is the same failure class as broadcasting an SF-growing join
# side. The gate measures the dimension's row count once per fixture
# fingerprint (the _MAXN_CACHE idiom from llm/dedup.py) and applies the
# broadcast hint only under _VOCAB_BROADCAST_MAX rows (~150 MB at
# ~40 B/row — comfortably inside executor memory); above it the hint is
# omitted and the join degrades to a shuffle hash/sort-merge join on
# the same key. Threshold documented in SCALE.md.
# ---------------------------------------------------------------------------

_VOCAB_BROADCAST_MAX = 4_000_000
_VOCAB_COUNT_CACHE: dict[str, int] = {}
# Test hook (tests/test_llm_quality.py): "broadcast" / "shuffle" force
# one dispatch path so both are exercised on the fixture corpus.
_FORCE_VOCAB_DISPATCH: str | None = None


def _gated_broadcast(dim: DataFrame, sf_dir: str, memo_key: str) -> DataFrame:
    """`dim` with a broadcast hint iff its measured row count is under
    the gate. The count is one aggregate job, memoized per (fixture
    fingerprint, dimension identity) so repeat invocations are free and
    a regenerated fixture re-measures automatically."""
    if _FORCE_VOCAB_DISPATCH == "broadcast":
        return F.broadcast(dim)
    if _FORCE_VOCAB_DISPATCH == "shuffle":
        return dim
    try:
        tag = scratch_tag(sf_dir, "documents")
    except OSError:
        tag = f"nofile:{sf_dir.rstrip('/')}"
    key = f"{tag}|{memo_key}"
    n = _VOCAB_COUNT_CACHE.get(key)
    if n is None:
        n = dim.count()
        _VOCAB_COUNT_CACHE[key] = n
    return F.broadcast(dim) if n <= _VOCAB_BROADCAST_MAX else dim

_TOKENIZE_ORACLE = """
SELECT doc_id,
       len(string_split(lower(text), ' ')) AS n_tokens,
       len(list_distinct(string_split(lower(text), ' '))) AS n_distinct,
       array_to_string(list_sort(list_distinct(string_split(lower(text), ' ')))[1:5], '|')
         AS vocab_head
FROM documents
"""


@register("text_tokenize", oracle=_TOKENIZE_ORACLE)
def text_tokenize(spark: SparkSession, sf_dir: str) -> DataFrame:
    """Normalization + tokenization: lowercase, whitespace split, vocab
    stats per document."""
    d = table(spark, sf_dir, "documents")
    toks = tokens()
    vocab = F.sort_array(F.array_distinct(toks))
    return d.select(
        "doc_id",
        F.size(toks).alias("n_tokens"),
        F.size(F.array_distinct(toks)).alias("n_distinct"),
        F.array_join(F.slice(vocab, 1, 5), "|").alias("vocab_head"),
    )


_TOKEN_COUNT_ORACLE = """
SELECT doc_id,
       len(string_split(text, ' ')) AS ws_tokens,
       len(regexp_extract_all(text, '[A-Za-z]+|[0-9]+|[^A-Za-z0-9 ]')) AS bpe_ish_tokens,
       CAST(ceil(length(text) / 4.0) AS BIGINT) AS byte_len_estimate
FROM documents
"""


@register("text_token_count", oracle=_TOKEN_COUNT_ORACLE)
def text_token_count(spark: SparkSession, sf_dir: str) -> DataFrame:
    """Token counting three ways: whitespace, a BPE-ish regex (letter
    runs / digit runs / single punctuation — the standard pre-tokenizer
    shape), and the chars/4 LLM-token estimate."""
    d = table(spark, sf_dir, "documents")
    return d.select(
        "doc_id",
        F.size(F.split(F.col("text"), " ")).alias("ws_tokens"),
        F.size(F.regexp_extract_all(F.col("text"), F.lit("[A-Za-z]+|[0-9]+|[^A-Za-z0-9 ]"), 0)).alias(
            "bpe_ish_tokens"
        ),
        F.ceil(F.length("text") / 4.0).cast("bigint").alias("byte_len_estimate"),
    )


_STOPWORDS = "the,a,of,and,to,in,is,for,on,with"

_QUALITY_ORACLE = f"""
WITH t AS (
  SELECT doc_id,
         length(text) AS n_chars_measured,
         len(string_split(lower(text), ' ')) AS n_tokens,
         len(list_filter(string_split(lower(text), ' '),
                         x -> list_contains(string_split('{_STOPWORDS}', ','), x)))
           AS n_stop,
         length(text) - length(regexp_replace(text, '[^A-Za-z0-9 ]', '', 'g'))
           AS n_punct
  FROM documents
)
SELECT doc_id, n_chars_measured, n_tokens,
       round(CAST(n_stop AS DOUBLE) / n_tokens, 9) AS stopword_ratio,
       round(CAST(n_punct AS DOUBLE) / n_chars_measured, 9) AS punct_ratio,
       round(CAST(n_chars_measured AS DOUBLE) / n_tokens, 9) AS mean_token_len,
       (n_tokens BETWEEN 10 AND 100000
        AND CAST(n_stop AS DOUBLE) / n_tokens > 0.01
        AND CAST(n_punct AS DOUBLE) / n_chars_measured < 0.3) AS passes_quality
FROM t
"""


@register("text_quality", oracle=_QUALITY_ORACLE)
def text_quality(spark: SparkSession, sf_dir: str) -> DataFrame:
    """Heuristic quality scoring (Gopher/C4-style gates): length bounds,
    stopword ratio, punctuation density, mean token length → boolean
    keep/drop. Pure expressions; the filter predicate pushes into the
    scan of the kept-columns projection at scale."""
    d = table(spark, sf_dir, "documents")
    lower_toks = tokens()
    stop_arr = F.split(F.lit(_STOPWORDS), ",")
    n_tokens = F.size(lower_toks)
    n_stop = F.size(F.filter(lower_toks, lambda x: F.array_contains(stop_arr, x)))
    n_chars = F.length("text")
    n_punct = n_chars - F.length(F.regexp_replace(F.col("text"), "[^A-Za-z0-9 ]", ""))
    stop_ratio = n_stop.cast("double") / n_tokens
    punct_ratio = n_punct.cast("double") / n_chars
    return d.select(
        "doc_id",
        n_chars.alias("n_chars_measured"),
        n_tokens.alias("n_tokens"),
        F.round(stop_ratio, 9).alias("stopword_ratio"),
        F.round(punct_ratio, 9).alias("punct_ratio"),
        F.round(n_chars.cast("double") / n_tokens, 9).alias("mean_token_len"),
        (
            n_tokens.between(10, 100000) & (stop_ratio > 0.01) & (punct_ratio < 0.3)
        ).alias("passes_quality"),
    )


_LANGID_ORACLE = """
WITH t AS (
  SELECT doc_id, lang AS labeled_lang,
         length(text) AS n,
         length(regexp_replace(text, '[^a-zA-Z ]', '', 'g')) AS n_latin,
         length(regexp_replace(text, '[^0-9]', '', 'g')) AS n_digit
  FROM documents
)
SELECT doc_id, labeled_lang,
       round(CAST(n_latin AS DOUBLE) / n, 9) AS latin_ratio,
       CASE WHEN CAST(n_latin AS DOUBLE) / n > 0.9 THEN 'latin'
            WHEN CAST(n_digit AS DOUBLE) / n > 0.5 THEN 'numeric'
            ELSE 'other' END AS script_class
FROM t
"""


@register("text_langid", oracle=_LANGID_ORACLE)
def text_langid(spark: SparkSession, sf_dir: str) -> DataFrame:
    """Language-ID stage 1: script classification by character-class
    ratios (the cheap pushdown-able gate before an n-gram model; the
    fixture corpus is synthetic word soup, so the statistical stage-2
    profile scoring lives in tests/ as a seeded property check)."""
    d = table(spark, sf_dir, "documents")
    n = F.length("text")
    n_latin = F.length(F.regexp_replace(F.col("text"), "[^a-zA-Z ]", ""))
    n_digit = F.length(F.regexp_replace(F.col("text"), "[^0-9]", ""))
    latin_ratio = n_latin.cast("double") / n
    return d.select(
        "doc_id",
        F.col("lang").alias("labeled_lang"),
        F.round(latin_ratio, 9).alias("latin_ratio"),
        F.when(latin_ratio > 0.9, "latin")
        .when(n_digit.cast("double") / n > 0.5, "numeric")
        .otherwise("other")
        .alias("script_class"),
    )


_FPRINT_ORACLE = """
WITH v AS (
  SELECT doc_id,
         list_transform(string_split(lower(text), ' '),
                        t -> ascii(t) * 7 + length(t)) AS vals
  FROM documents
)
SELECT doc_id,
       list_reduce(vals, (acc, x) -> (acc * 31 + x) % 1000000007) AS fingerprint
FROM v
"""


@register("text_fingerprint", oracle=_FPRINT_ORACLE)
def text_fingerprint(spark: SparkSession, sf_dir: str) -> DataFrame:
    """Document fingerprint: polynomial rolling hash over the token
    stream (order-sensitive — reordered docs get different prints,
    unlike bag-of-words hashes). Pure integer fold, engine-independent."""
    d = table(spark, sf_dir, "documents")
    toks = tokens()
    vals = F.transform(toks, lambda t: F.ascii(t) * 7 + F.length(t))
    fp = F.aggregate(
        F.slice(vals, 2, F.greatest(F.size(vals) - 1, F.lit(0))),
        F.element_at(vals, 1).cast("bigint"),
        lambda acc, x: (acc * 31 + x) % 1000000007,
    )
    return d.select("doc_id", fp.alias("fingerprint"))


_TFIDF_ORACLE = """
WITH tok AS (
  SELECT doc_id, unnest(string_split(lower(text), ' ')) AS term
  FROM documents WHERE doc_id % 20 = 0
),
tf AS (SELECT doc_id, term, COUNT(*) AS tf FROM tok GROUP BY doc_id, term),
df AS (SELECT term, COUNT(DISTINCT doc_id) AS df FROM tok GROUP BY term),
n AS (SELECT COUNT(DISTINCT doc_id) AS n_docs
      FROM documents WHERE doc_id % 20 = 0)
SELECT tf.doc_id, tf.term, tf.tf, df.df,
       round(tf.tf * ln((n.n_docs + 1.0) / (df.df + 1.0)), 9) AS tfidf
FROM tf JOIN df USING (term) CROSS JOIN n
"""


def _tfidf_scored(spark: SparkSession, sf_dir: str) -> DataFrame:
    """The shared TF-IDF scoring plan (doc_id, term, tf, df, tfidf) over
    the doc_id %% 20 sample — one definition for text_tfidf and
    text_keyword_extract so the smoothing/sampling contract can't
    drift between them. n_docs counts the UN-exploded document side
    (split() always yields a token, so it equals the distinct count
    over the token relation — without a second scan+explode of text)."""
    d = table(spark, sf_dir, "documents").filter(F.col("doc_id") % 20 == 0)
    tok = d.select(
        "doc_id", F.explode(tokens()).alias("term")
    )
    tf = tok.groupBy("doc_id", "term").agg(F.count(F.lit(1)).alias("tf"))
    df = tok.groupBy("term").agg(F.countDistinct("doc_id").alias("df"))
    n_docs = d.select(F.countDistinct("doc_id").alias("n_docs"))
    return (
        tf.join(_gated_broadcast(df, sf_dir, "tfidf_df"), "term")
        .crossJoin(F.broadcast(n_docs))
        .select(
            "doc_id",
            "term",
            "tf",
            "df",
            F.round(
                F.col("tf") * F.log((F.col("n_docs") + 1.0) / (F.col("df") + 1.0)), 9
            ).alias("tfidf"),
        )
    )


@register("text_tfidf", oracle=_TFIDF_ORACLE)
def text_tfidf(spark: SparkSession, sf_dir: str) -> DataFrame:
    """TF-IDF from first principles as two aggregations + a broadcast-able
    dimension join (term → df). The SQL-checkable twin of HashingTF+IDF;
    at 100 TB the df table is the only global state and it's tiny."""
    return _tfidf_scored(spark, sf_dir)


PACK_CAP = 256  # token budget per packed training sequence
PACK_SHARDS = 8

_PACK_ORACLE = f"""
WITH toks AS (
  SELECT doc_id, doc_id % {PACK_SHARDS} AS shard,
         len(string_split(text, ' ')) AS n_tokens
  FROM documents
),
cum AS (
  SELECT doc_id, shard, n_tokens,
         SUM(n_tokens) OVER (PARTITION BY shard ORDER BY doc_id
                             ROWS UNBOUNDED PRECEDING) - n_tokens AS prev_cum
  FROM toks
)
SELECT doc_id, shard,
       CAST(floor(prev_cum / {PACK_CAP}) AS BIGINT) * {PACK_SHARDS} + shard AS seq_id,
       n_tokens
FROM cum
"""


@register("text_pack_sequences", oracle=_PACK_ORACLE)
def text_pack_sequences(spark: SparkSession, sf_dir: str) -> DataFrame:
    """Sequence packing for pretraining: assign documents to fixed
    token-budget training sequences by contiguous streaming within a
    shard (seq = floor(running-tokens / cap)). Packing is inherently
    order-dependent, so the scale design shards FIRST (doc_id % shards)
    and packs within each shard independently — one hash shuffle + a
    per-partition sort instead of the global single-partition window a
    naive packer needs; shards pack in parallel on 1000 executors. The
    greedy best-fit variant trades determinism for ~2% less padding —
    contiguous packing is what keeps the op replayable (and
    oracle-checkable). seq_id interleaves (seq-within-shard × shards +
    shard), which is collision-free at ANY corpus size — a fixed
    per-shard id range would overflow into the next shard's range once
    one shard accumulates enough tokens (at 10^13 tokens each shard
    holds ~4×10^9 sequences, far past any fixed offset)."""
    d = table(spark, sf_dir, "documents").select(
        "doc_id",
        (F.col("doc_id") % PACK_SHARDS).alias("shard"),
        F.size(F.split(F.col("text"), " ")).alias("n_tokens"),
    )
    w = (
        Window.partitionBy("shard")
        .orderBy("doc_id")
        .rowsBetween(Window.unboundedPreceding, Window.currentRow)
    )
    return d.withColumn(
        "prev_cum", F.sum("n_tokens").over(w) - F.col("n_tokens")
    ).select(
        "doc_id",
        "shard",
        (F.floor(F.col("prev_cum") / PACK_CAP) * PACK_SHARDS + F.col("shard")).alias("seq_id"),
        "n_tokens",
    )


_EMAIL_RE = r"[A-Za-z0-9._%+-]+@[A-Za-z0-9.-]+\.[A-Za-z]{2,}"
_PHONE_RE = r"\+1-555-[0-9]{4}"

_PII_ORACLE = rf"""
WITH pii AS (
  SELECT doc_id,
         concat('u', CAST(doc_id AS VARCHAR), '@mail', CAST(doc_id % 7 AS VARCHAR),
                '.com wrote: ', substr(text, 1, 80),
                ' call +1-555-', lpad(CAST(doc_id % 10000 AS VARCHAR), 4, '0')) AS raw
  FROM documents
  WHERE doc_id % 3 = 0
)
SELECT doc_id,
       regexp_replace(
         regexp_replace(raw, '{_EMAIL_RE}', '<EMAIL>', 'g'),
         '{_PHONE_RE}', '<PHONE>', 'g') AS redacted,
       CAST(len(regexp_extract_all(raw, '{_EMAIL_RE}')) AS BIGINT) AS n_emails
FROM pii
"""


@register("text_pii_redact", oracle=_PII_ORACLE)
def text_pii_redact(spark: SparkSession, sf_dir: str) -> DataFrame:
    """PII redaction over document text: regex-scrub emails and phone
    numbers, plus a per-row match count for audit metrics. PII is
    synthesized deterministically from doc_id (the fixture corpus has
    none), so both engines scrub an identical string. The patterns are
    RE2-safe (no backrefs/lookaround) → identical semantics in Java regex
    and DuckDB RE2. Pure codegen projection — linear scan at 100 TB; a
    production pass would fuse all pattern families into one alternation
    to keep it single-pass."""
    d = table(spark, sf_dir, "documents").filter(F.col("doc_id") % 3 == 0)
    raw = F.concat(
        F.lit("u"),
        F.col("doc_id").cast("string"),
        F.lit("@mail"),
        (F.col("doc_id") % 7).cast("string"),
        F.lit(".com wrote: "),
        F.substring(F.col("text"), 1, 80),
        F.lit(" call +1-555-"),
        F.lpad((F.col("doc_id") % 10000).cast("string"), 4, "0"),
    )
    with_raw = d.select("doc_id", raw.alias("raw"))
    return with_raw.select(
        "doc_id",
        F.regexp_replace(
            F.regexp_replace(F.col("raw"), _EMAIL_RE, "<EMAIL>"),
            _PHONE_RE,
            "<PHONE>",
        ).alias("redacted"),
        F.size(F.regexp_extract_all(F.col("raw"), F.lit(_EMAIL_RE), 0))
        .cast("bigint")
        .alias("n_emails"),
    )


_RARITY_ORACLE = """
WITH toks AS (
  SELECT doc_id, unnest(string_split(lower(text), ' ')) AS tok
  FROM documents
),
vocab AS (SELECT tok, COUNT(*) AS c FROM toks GROUP BY tok)
SELECT t.doc_id,
       COUNT(*) AS n_tokens,
       CAST(SUM(v.c) AS BIGINT) AS sum_freq,
       COUNT(*) FILTER (WHERE v.c <= 2) AS n_rare,
       round(CAST(SUM(v.c) AS DOUBLE) / COUNT(*), 9) AS mean_freq
FROM toks t JOIN vocab v ON v.tok = t.tok
GROUP BY t.doc_id
"""


@register("text_rarity_score", oracle=_RARITY_ORACLE)
def text_rarity_score(spark: SparkSession, sf_dir: str) -> DataFrame:
    """Corpus-statistics quality scoring — the unigram-LM signal used to
    filter pretraining data (documents dominated by corpus-rare tokens
    are boilerplate, OCR noise, or mojibake). Two-pass self-supervised
    shape: pass 1 aggregates global unigram counts from the corpus
    itself; pass 2 joins counts back per token and scores each document
    by total/mean corpus frequency and its rare-token count. All-integer
    aggregation (counts, not log-probs) so the result is exactly
    order-independent — the one float, mean_freq, is a single correctly-
    rounded integer division, identical in both engines. Scale: the
    vocab aggregate is Zipf-skewed but tiny relative to the corpus
    (millions of rows at 100 TB) — size-gate-broadcast it back for
    pass 2 (_gated_broadcast: measured count vs _VOCAB_BROADCAST_MAX)
    so the only shuffle on the big side is the per-doc re-aggregation,
    degrading to a shuffle join for a vocab that outgrows memory."""
    toks = (
        table(spark, sf_dir, "documents")
        .select("doc_id", F.explode(tokens()).alias("tok"))
    )
    vocab = toks.groupBy("tok").agg(F.count(F.lit(1)).alias("c"))
    return (
        toks.join(_gated_broadcast(vocab, sf_dir, "unigram_vocab"), "tok")
        .groupBy("doc_id")
        .agg(
            F.count(F.lit(1)).alias("n_tokens"),
            F.sum("c").alias("sum_freq"),
            F.count(F.when(F.col("c") <= 2, 1)).alias("n_rare"),
            F.round(
                F.sum("c").cast("double") / F.count(F.lit(1)), 9
            ).alias("mean_freq"),
        )
    )


_DECON_N = 5  # shingle width for contamination detection
_DECON_MIN_SHARED = 3

_DECON_ORACLE = f"""
WITH bench AS (
    SELECT doc_id AS bench_id, text FROM documents WHERE doc_id % 97 = 0
),
crawl AS (
    SELECT doc_id, text FROM documents
    UNION ALL
    SELECT -bench_id - 1 AS doc_id, text FROM bench
),
csh AS (
    SELECT DISTINCT doc_id, unnest(list_distinct(list_transform(
        range(greatest(len(string_split(lower(text), ' ')) - {_DECON_N}, 0) + 1),
        i -> array_to_string(
            string_split(lower(text), ' ')[i + 1 : i + {_DECON_N}], ' ')
    ))) AS shingle
    FROM crawl
),
bsh AS (
    SELECT DISTINCT bench_id, unnest(list_distinct(list_transform(
        range(greatest(len(string_split(lower(text), ' ')) - {_DECON_N}, 0) + 1),
        i -> array_to_string(
            string_split(lower(text), ' ')[i + 1 : i + {_DECON_N}], ' ')
    ))) AS shingle
    FROM bench
)
SELECT c.doc_id, b.bench_id, CAST(COUNT(*) AS BIGINT) AS n_shared
FROM csh c JOIN bsh b ON c.shingle = b.shingle
WHERE c.doc_id <> b.bench_id
GROUP BY c.doc_id, b.bench_id
HAVING COUNT(*) >= {_DECON_MIN_SHARED}
"""


@register("text_decontaminate", oracle=_DECON_ORACLE)
def text_decontaminate(spark: SparkSession, sf_dir: str) -> DataFrame:
    """Benchmark decontamination: flag crawl documents sharing >= 3
    (_DECON_MIN_SHARED) distinct 5-gram (_DECON_N) shingles with an eval
    set — the curation step that keeps test data out of training
    corpora. Same inverted-index shape as dedup_ngram_jaccard: docs meet
    ONLY through shared shingles (never all-pairs), and a real eval set
    is tiny by construction, so at 100 TB AQE broadcasts its shingle
    set and the crawl side never shuffles — detection rides a scan.
    (The choice is AQE's, not a hint: the FIXTURE's bench side is a
    1/97 corpus sample, which grows with SF.)

    The synthetic corpus shares no natural 5-grams across documents, so
    the fixture re-ingests each bench doc verbatim under a NEGATIVE id,
    -bench_id - 1 (the realistic worst case: benchmark text copied
    wholesale into a crawl page), constructed identically in the
    oracle. Negative ids are disjoint from real doc_ids (non-negative
    by fixture contract) at ANY corpus size — a fixed positive offset
    would collide with real documents once the corpus outgrew it."""
    from kinesis_datastore_app_spark.llm.dedup import _shingles, _shingles_cached

    docs = table(spark, sf_dir, "documents")
    bench = docs.filter(F.col("doc_id") % 97 == 0).select(
        F.col("doc_id").alias("bench_id"), "text"
    )
    # Crawl shingles = the corpus's materialized shingle index (shared
    # with the dedup family — built once per (fixture, n) to scratch
    # parquet, then a columnar scan) plus the re-ingested bench docs'
    # shingles computed inline (tiny side).
    bsh = _shingles(
        bench.select(F.col("bench_id").alias("doc_id"), "text"), _DECON_N
    ).select(F.col("doc_id").alias("bench_id"), "shingle")
    # the re-ingested crawl copy's shingle set is BY CONSTRUCTION the
    # bench doc's own — derive it from the one _shingles plan with an
    # id rename instead of shingling the same text twice (round-10
    # review: two call sites whose n/tokenization had to stay in
    # lockstep)
    csh = _shingles_cached(spark, sf_dir, _DECON_N).unionByName(
        bsh.select((-F.col("bench_id") - 1).alias("doc_id"), "shingle")
    )
    return (
        # No forced broadcast on bsh: a REAL eval set is fixed-size, but
        # this fixture synthesizes it as a 1/97 corpus sample — an
        # SF-growing frame (round-9 audit). AQE broadcasts it at any
        # realistic eval-set size and degrades to a shuffle join on the
        # shingle key if a caller ever feeds a corpus-sized "bench".
        csh.join(bsh, "shingle")
        .filter(F.col("doc_id") != F.col("bench_id"))
        .groupBy("doc_id", "bench_id")
        .agg(F.count(F.lit(1)).alias("n_shared"))
        .filter(F.col("n_shared") >= _DECON_MIN_SHARED)
    )


_NGRAM_N = 3
_NGRAM_TOPK = 100

_NGRAM_COUNTS_ORACLE = f"""
WITH toks AS (
  SELECT doc_id, string_split(lower(text), ' ') AS tk FROM documents
),
ng AS (
  SELECT doc_id, unnest(list_transform(
           range(greatest(len(tk) - {_NGRAM_N}, 0) + 1),
           i -> array_to_string(tk[i + 1 : i + {_NGRAM_N}], ' ')
         )) AS ngram
  FROM toks WHERE len(tk) > 0
)
SELECT ngram,
       CAST(COUNT(*) AS BIGINT) AS n_occurrences,
       CAST(COUNT(DISTINCT doc_id) AS BIGINT) AS n_docs
FROM ng
GROUP BY ngram
ORDER BY n_occurrences DESC, ngram
LIMIT {_NGRAM_TOPK}
"""


@register("text_ngram_counts", oracle=_NGRAM_COUNTS_ORACLE)
def text_ngram_counts(spark: SparkSession, sf_dir: str) -> DataFrame:
    """Corpus-level n-gram frequency table (top-K by occurrence count) —
    the statistic a tokenizer-training / BPE-merge pipeline computes
    first, and the input to boilerplate detection (an n-gram appearing
    in a large share of documents is template text, not content).

    One explode + one grouped count over the corpus; the top-K is a
    TakeOrderedAndProject (per-partition top-K, constant-size merge —
    the full n-gram vocabulary never moves to one node). At 100 TB the
    vocabulary aggregate is the classic Zipf-skew case: partial
    aggregation absorbs the hot head map-side, so the shuffled rows per
    hot n-gram are O(partitions), not O(occurrences)."""
    toks = table(spark, sf_dir, "documents").select(
        "doc_id", tokens().alias("tk")
    ).filter(F.size("tk") > 0)
    idxs = F.sequence(F.lit(0), F.greatest(F.size("tk") - _NGRAM_N, F.lit(0)))
    ng = toks.select(
        "doc_id",
        F.explode(
            F.transform(idxs, lambda i: F.concat_ws(" ", F.slice(F.col("tk"), i + 1, _NGRAM_N)))
        ).alias("ngram"),
    )
    return (
        ng.groupBy("ngram")
        .agg(
            F.count(F.lit(1)).alias("n_occurrences"),
            F.countDistinct("doc_id").alias("n_docs"),
        )
        .orderBy(F.desc("n_occurrences"), "ngram")
        .limit(_NGRAM_TOPK)
    )


# Gopher-style repetition gates (Rae et al. 2021, table A1 shape):
# thresholds sit just above the corpus p75-p90 so the boolean is a real
# split, not constant.
_REP_MAX_DUP_WORD = 0.63
_REP_MAX_TOP_CHAR = 0.15
_REP_MAX_DUP_2GRAM = 0.06

_REPETITION_ORACLE = f"""
WITH t AS (
  SELECT doc_id, string_split(lower(text), ' ') AS toks FROM documents
),
s AS (
  SELECT doc_id, toks, len(toks) AS n,
         list_transform(range(1, len(toks)), i -> toks[i] || ' ' || toks[i+1]) AS g2
  FROM t
),
m AS (
  SELECT doc_id, n,
         1.0 - CAST(len(list_distinct(toks)) AS DOUBLE) / n AS dup_word_frac_raw,
         CAST(list_max(list_transform(list_distinct(toks),
                tk -> len(list_filter(toks, x -> x = tk)) * length(tk))) AS DOUBLE)
           / length(array_to_string(toks, '')) AS top_word_char_frac_raw,
         CASE WHEN len(g2) > 0
              THEN 1.0 - CAST(len(list_distinct(g2)) AS DOUBLE) / len(g2)
              ELSE 0.0 END AS dup_2gram_frac_raw
  FROM s
)
SELECT doc_id, n AS n_tokens,
       round(dup_word_frac_raw, 9) AS dup_word_frac,
       round(top_word_char_frac_raw, 9) AS top_word_char_frac,
       round(dup_2gram_frac_raw, 9) AS dup_2gram_frac,
       (dup_word_frac_raw <= {_REP_MAX_DUP_WORD}
        AND top_word_char_frac_raw <= {_REP_MAX_TOP_CHAR}
        AND dup_2gram_frac_raw <= {_REP_MAX_DUP_2GRAM}) AS passes_repetition
FROM m
"""


@register("text_repetition", oracle=_REPETITION_ORACLE)
def text_repetition(spark: SparkSession, sf_dir: str) -> DataFrame:
    """Repetition-based quality gates (the Gopher signals missing from
    text_quality's length/stopword/punct set): duplicate-word fraction,
    duplicate-2-gram fraction, and the character share of the single
    most frequent word — the three signals that catch looped generation,
    keyword-stuffed spam, and boilerplate that length gates pass.

    All three are per-document array expressions inside whole-stage
    codegen — no explode, no shuffle, no corpus state: the operator
    filters at scan speed over 100 TB. The top-word scan is
    O(distinct * tokens) per document (bounded by document length, not
    corpus size). Every ratio derives from exact integer counts, so the
    doubles are correctly-rounded quotients — identical in both engines;
    the gate compares the raw quotients, the output pins them to 9
    places."""
    d = table(spark, sf_dir, "documents")
    toks = tokens()
    t = d.select("doc_id", toks.alias("toks"), F.size(toks).alias("n"))
    g2 = F.zip_with(
        F.expr("slice(toks, 1, n - 1)"),
        F.expr("slice(toks, 2, n - 1)"),
        lambda a, b: F.concat_ws(" ", a, b),
    )
    m = t.select(
        "doc_id",
        F.col("n").alias("n_tokens"),
        (1.0 - F.size(F.array_distinct("toks")).cast("double") / F.col("n")).alias(
            "dw"
        ),
        (
            F.array_max(
                F.transform(
                    F.array_distinct("toks"),
                    lambda tk: F.size(F.filter(F.col("toks"), lambda x: x == tk))
                    * F.length(tk),
                )
            ).cast("double")
            / F.length(F.array_join("toks", ""))
        ).alias("twc"),
        F.when(
            F.size(g2) > 0,
            1.0 - F.size(F.array_distinct(g2)).cast("double") / F.size(g2),
        )
        .otherwise(F.lit(0.0))
        .alias("d2g"),
    )
    return m.select(
        "doc_id",
        "n_tokens",
        F.round("dw", 9).alias("dup_word_frac"),
        F.round("twc", 9).alias("top_word_char_frac"),
        F.round("d2g", 9).alias("dup_2gram_frac"),
        (
            (F.col("dw") <= _REP_MAX_DUP_WORD)
            & (F.col("twc") <= _REP_MAX_TOP_CHAR)
            & (F.col("d2g") <= _REP_MAX_DUP_2GRAM)
        ).alias("passes_repetition"),
    )


_LM_ORACLE = """
WITH toks AS (
  SELECT doc_id, unnest(string_split(lower(text), ' ')) AS tok FROM documents
),
vocab AS (SELECT tok, COUNT(*) AS c FROM toks GROUP BY tok),
tot AS (SELECT SUM(c) AS total FROM vocab)
SELECT t.doc_id,
       COUNT(*) AS n_tokens,
       round(CAST(SUM(CAST(round(-log2(CAST(v.c AS DOUBLE) / tot.total), 9)
                           AS DECIMAL(38,12))) AS DOUBLE) / COUNT(*), 6)
         AS bits_per_token
FROM toks t JOIN vocab v ON v.tok = t.tok CROSS JOIN tot
GROUP BY t.doc_id
"""


@register("text_lm_score", oracle=_LM_ORACLE)
def text_lm_score(spark: SparkSession, sf_dir: str) -> DataFrame:
    """Unigram language-model scoring — the CCNet-style filter signal:
    average -log2 p(token) under the corpus's own unigram distribution
    ("bits per token"; 2^x is the unigram perplexity). Documents far
    above the corpus average are noise/mojibake, far below are
    degenerate repetition — the standard pretraining-quality axis that
    complements text_rarity_score's integer counts with an actual
    likelihood.

    Two-pass shape, same as text_rarity_score: the vocab aggregate is
    tiny (Zipf) and size-gate-broadcast back (_gated_broadcast); the
    only big-side shuffle is the per-doc re-aggregation. Float discipline: each per-token log-prob is
    rounded to 9 places THEN exact-decimal-summed, so the per-document
    sum is shuffle-order-independent and bit-identical across engines
    (the sum-of-doubles alternative is neither)."""
    toks = table(spark, sf_dir, "documents").select(
        "doc_id", F.explode(tokens()).alias("tok")
    )
    vocab = toks.groupBy("tok").agg(F.count(F.lit(1)).alias("c"))
    total = vocab.agg(F.sum("c").alias("total"))
    scored = (
        toks.join(_gated_broadcast(vocab, sf_dir, "unigram_vocab"), "tok")
        .crossJoin(F.broadcast(total))
        .select(
            "doc_id",
            F.round(-F.log2(F.col("c").cast("double") / F.col("total")), 9).alias(
                "nll"
            ),
        )
    )
    return scored.groupBy("doc_id").agg(
        F.count(F.lit(1)).alias("n_tokens"),
        F.round(
            F.sum(F.col("nll").cast("decimal(38,12)")).cast("double")
            / F.count(F.lit(1)),
            6,
        ).alias("bits_per_token"),
    )


# First BPE iteration: corpus-wide adjacent-symbol-pair frequencies at
# the character level (the merge-candidate table a byte-pair-encoding
# tokenizer trainer recomputes each round). Top-K with a total order so
# the LIMIT is deterministic.
_BPE_TOPK = 32

_BPE_ORACLE = f"""
WITH toks AS (
  SELECT unnest(string_split(lower(text), ' ')) AS tok FROM documents
),
pairs AS (
  SELECT unnest(list_transform(range(1, length(tok)),
                               i -> substring(tok, CAST(i AS INT), 2))) AS pair
  FROM toks WHERE length(tok) >= 2
)
SELECT pair, COUNT(*) AS n_occurrences
FROM pairs GROUP BY pair
ORDER BY n_occurrences DESC, pair
LIMIT {_BPE_TOPK}
"""


@register("text_bpe_pairs", oracle=_BPE_ORACLE)
def text_bpe_pairs(spark: SparkSession, sf_dir: str) -> DataFrame:
    """Byte-pair-encoding merge statistics: the top-32 (see _BPE_TOPK) most frequent
    adjacent character pairs across all corpus tokens — iteration 0 of
    BPE tokenizer training (each subsequent round would merge the top
    pair and recount; the counting plan is identical every round).

    Scale shape: two codegen Generates (token explode, pair explode)
    feed a hash aggregate whose key domain is bounded by the symbol
    alphabet squared (~1-2k pairs regardless of corpus size) — the
    shuffle after map-side partial aggregation carries one row per
    (partition, pair), so 100 TB of text reduces to kilobytes of
    exchange. Final top-K plans as TakeOrderedAndProject (bounded heap
    per partition + driver merge), never a global sort."""
    d = table(spark, sf_dir, "documents")
    toks = d.select(
        F.explode(tokens()).alias("tok")
    ).filter(F.length("tok") >= 2)
    pairs = toks.select(
        F.explode(
            F.expr("transform(sequence(1, length(tok) - 1), i -> substring(tok, i, 2))")
        ).alias("pair")
    )
    return (
        pairs.groupBy("pair")
        .agg(F.count(F.lit(1)).alias("n_occurrences"))
        .orderBy(F.desc("n_occurrences"), "pair")
        .limit(_BPE_TOPK)
    )


# Overlapping-window chunking (RAG / context-window prep): fixed-size
# token chunks with a stride overlap, one output row per chunk.
_CHUNK_SIZE = 64
_CHUNK_STRIDE = 48

_CHUNK_ORACLE = f"""
WITH t AS (
  SELECT doc_id, string_split(lower(text), ' ') AS toks,
         len(string_split(lower(text), ' ')) AS n
  FROM documents
),
starts AS (
  SELECT doc_id, toks, n,
         CAST(unnest(range(0, n, {_CHUNK_STRIDE})) AS INT) AS start
  FROM t
)
SELECT doc_id,
       CAST(start / {_CHUNK_STRIDE} AS INT) AS chunk_idx,
       CAST(len(list_slice(toks, start + 1, start + {_CHUNK_SIZE})) AS INT)
         AS n_tokens,
       array_to_string(list_slice(toks, start + 1, start + 3), ' ')
         AS chunk_head
FROM starts
"""


@register("text_chunk_overlap", oracle=_CHUNK_ORACLE)
def text_chunk_overlap(spark: SparkSession, sf_dir: str) -> DataFrame:
    """Sliding-window document chunking: _CHUNK_SIZE-token chunks every
    _CHUNK_STRIDE tokens (the 25% overlap that retrieval-augmentation and
    long-context training pipelines use so no boundary-spanning passage
    is lost). Emits (doc_id, chunk_idx, n_tokens, head); a real pipeline
    would carry the chunk text — the plan is identical.

    Pure per-row computation: tokenize once, explode the arithmetic
    start sequence (codegen Generate — rows multiply by ~n/stride, the
    unavoidable output factor), slice the token array per start. No
    shuffle, no state, no corpus pass — chunking 100 TB is exactly one
    scan at whatever parallelism the files give. Chunk identity is
    (doc_id, chunk_idx), deterministic under any partitioning."""
    d = table(spark, sf_dir, "documents")
    toks = tokens()
    t = d.select("doc_id", toks.alias("toks"), F.size(toks).alias("n"))
    s = t.select(
        "doc_id",
        "toks",
        F.explode(
            F.sequence(F.lit(0), F.col("n") - 1, F.lit(_CHUNK_STRIDE))
        ).alias("start"),
    )
    chunk = F.slice(F.col("toks"), F.col("start") + 1, _CHUNK_SIZE)
    return s.select(
        "doc_id",
        (F.col("start") / _CHUNK_STRIDE).cast("int").alias("chunk_idx"),
        F.size(chunk).cast("int").alias("n_tokens"),
        F.array_join(F.slice(F.col("toks"), F.col("start") + 1, 3), " ").alias(
            "chunk_head"
        ),
    )


# Frequency-cut vocabulary builder: top-V tokens by corpus frequency
# with cumulative coverage — the classical vocab construction step
# (what a BPE trainer initializes from) and the direct measure of the
# UNK rate a given vocab size buys.
_VOCAB_V = 256

_VOCAB_ORACLE = f"""
WITH toks AS (
  SELECT unnest(string_split(lower(text), ' ')) AS tok FROM documents
),
counts AS (
  SELECT tok, COUNT(*) AS n FROM toks GROUP BY tok
),
tot AS (SELECT SUM(n) AS total FROM counts),
top AS (
  SELECT tok, n, row_number() OVER (ORDER BY n DESC, tok) AS rank
  FROM counts ORDER BY n DESC, tok LIMIT {_VOCAB_V}
)
SELECT top.rank AS rank, top.tok AS token, CAST(top.n AS BIGINT) AS n_occurrences,
       round(CAST(SUM(top.n) OVER (ORDER BY top.rank) AS DOUBLE) / tot.total, 9)
         AS cum_coverage
FROM top CROSS JOIN tot
"""


@register("pipeline_tokenizer_vocab", oracle=_VOCAB_ORACLE)
def pipeline_tokenizer_vocab(spark: SparkSession, sf_dir: str) -> DataFrame:
    """Vocabulary construction with coverage accounting: the top-V
    (_VOCAB_V) corpus tokens ranked by frequency, each row carrying the cumulative
    share of all token occurrences the vocabulary covers up to that
    rank (1 - cum_coverage at the cut IS the UNK rate).

    Scale shape: the corpus-wide count is one partial-aggregated
    shuffle bounded by vocabulary size (Zipf head absorbed map-side);
    the top-V cut plans as TakeOrderedAndProject; the rank and running
    coverage windows run over the BOUNDED V-row result (the
    global-window sweep test's bounded-subtree exemption — O(V), not
    O(corpus)). Coverage is an exact integer ratio rounded once."""
    toks = table(spark, sf_dir, "documents").select(
        F.explode(tokens()).alias("tok")
    )
    counts = toks.groupBy("tok").agg(F.count(F.lit(1)).alias("n"))
    total = counts.agg(F.sum("n").alias("total"))
    top = counts.orderBy(F.desc("n"), "tok").limit(_VOCAB_V)
    w_rank = Window.orderBy(F.desc("n"), "tok")
    ranked = top.select(
        F.row_number().over(w_rank).alias("rank"),
        F.col("tok").alias("token"),
        F.col("n").alias("n_occurrences"),
    )
    w_cum = Window.orderBy("rank").rowsBetween(Window.unboundedPreceding, 0)
    return ranked.crossJoin(F.broadcast(total)).select(
        "rank",
        "token",
        "n_occurrences",
        F.round(
            F.sum("n_occurrences").over(w_cum).cast("double") / F.col("total"), 9
        ).alias("cum_coverage"),
    )


# Per-document keyword extraction: the top TF-IDF terms per document —
# what a retrieval/tagging pipeline stores as sparse document features.
_KW_K = 3

_KEYWORD_ORACLE = f"""
WITH tok AS (
  SELECT doc_id, unnest(string_split(lower(text), ' ')) AS term
  FROM documents WHERE doc_id % 20 = 0
),
tf AS (SELECT doc_id, term, COUNT(*) AS tf FROM tok GROUP BY doc_id, term),
df AS (SELECT term, COUNT(DISTINCT doc_id) AS df FROM tok GROUP BY term),
n AS (SELECT COUNT(DISTINCT doc_id) AS n_docs
      FROM documents WHERE doc_id % 20 = 0),
scored AS (
  SELECT tf.doc_id, tf.term,
         round(tf.tf * ln((n.n_docs + 1.0) / (df.df + 1.0)), 9) AS tfidf
  FROM tf JOIN df USING (term) CROSS JOIN n
)
SELECT doc_id, CAST(rank AS INT) AS rank, term, tfidf
FROM (SELECT doc_id, term, tfidf,
             row_number() OVER (PARTITION BY doc_id
                                ORDER BY tfidf DESC, term) AS rank
      FROM scored)
WHERE rank <= {_KW_K}
"""


@register("text_keyword_extract", oracle=_KEYWORD_ORACLE)
def text_keyword_extract(spark: SparkSession, sf_dir: str) -> DataFrame:
    """Keyword extraction: each document's top-3 (see _KW_K) terms by TF-IDF with
    a deterministic (score DESC, term) tie-break — the sparse feature
    tagging step downstream of text_tfidf's scoring. The per-document
    top-k is a rank window partitioned by doc_id: Spark's
    WindowGroupLimit keeps a k-heap below the exchange, so the full
    scored posting list never sorts globally; the df dimension is the
    only corpus-wide state and it broadcasts. Scoring is _tfidf_scored,
    the same plan text_tfidf registers."""
    scored = _tfidf_scored(spark, sf_dir).select("doc_id", "term", "tfidf")
    w = Window.partitionBy("doc_id").orderBy(F.desc("tfidf"), "term")
    return (
        scored.withColumn("rank", F.row_number().over(w))
        .filter(F.col("rank") <= _KW_K)
        .select("doc_id", F.col("rank").cast("int").alias("rank"), "term", "tfidf")
    )


# Jensen-Shannon divergence between two sources' unigram distributions
# — the symmetric, bounded corpus-similarity metric a mixture planner
# uses to decide whether two feeds are redundant. Add-one smoothing
# over the joint vocabulary totalizes the logs.
_JSD_A, _JSD_B = "src1", "src2"

_JSD_ORACLE = f"""
WITH tok AS (
  SELECT source, unnest(string_split(lower(text), ' ')) AS tok
  FROM documents WHERE source IN ('{_JSD_A}', '{_JSD_B}')
),
c AS (
  SELECT tok,
         COUNT(*) FILTER (WHERE source = '{_JSD_A}') AS ca,
         COUNT(*) FILTER (WHERE source = '{_JSD_B}') AS cb
  FROM tok GROUP BY tok
),
t AS (SELECT SUM(ca) AS na, SUM(cb) AS nb, COUNT(*) AS v FROM c),
p AS (
  SELECT c.tok,
         CAST(c.ca + 1 AS DOUBLE) / (t.na + t.v) AS pa,
         CAST(c.cb + 1 AS DOUBLE) / (t.nb + t.v) AS pb
  FROM c CROSS JOIN t
)
SELECT tok,
       round(pa, 9) AS p_a,
       round(pb, 9) AS p_b,
       round(0.5 * pa * log2(pa / ((pa + pb) / 2))
             + 0.5 * pb * log2(pb / ((pa + pb) / 2)), 9) AS jsd_term
FROM p
"""


@register("text_js_divergence", oracle=_JSD_ORACLE)
def text_js_divergence(spark: SparkSession, sf_dir: str) -> DataFrame:
    """Per-token Jensen-Shannon divergence terms between two sources'
    smoothed unigram distributions (Σ terms = JSD, 0 = identical, 1 bit
    = disjoint) — the symmetric alternative to one-sided KL for
    corpus-mix planning, and the token-level view shows WHICH words
    drive the divergence. One conditional-aggregate pass builds both
    distributions (same shape as dq_distribution_drift), the totals row
    broadcasts back, and every term is pinned so the sum is engine-
    exact. Exchange bounded by vocabulary, not corpus."""
    tok = (
        table(spark, sf_dir, "documents")
        .filter(F.col("source").isin(_JSD_A, _JSD_B))
        .select(
            "source", F.explode(tokens()).alias("tok")
        )
    )
    c = tok.groupBy("tok").agg(
        F.count_if(F.col("source") == _JSD_A).alias("ca"),
        F.count_if(F.col("source") == _JSD_B).alias("cb"),
    )
    t = c.agg(
        F.sum("ca").alias("na"), F.sum("cb").alias("nb"), F.count(F.lit(1)).alias("v")
    )
    p = c.crossJoin(F.broadcast(t)).select(
        "tok",
        ((F.col("ca") + 1).cast("double") / (F.col("na") + F.col("v"))).alias("pa"),
        ((F.col("cb") + 1).cast("double") / (F.col("nb") + F.col("v"))).alias("pb"),
    )
    pa, pb = F.col("pa"), F.col("pb")
    m = (pa + pb) / 2
    return p.select(
        "tok",
        F.round(pa, 9).alias("p_a"),
        F.round(pb, 9).alias("p_b"),
        F.round(0.5 * pa * F.log2(pa / m) + 0.5 * pb * F.log2(pb / m), 9).alias(
            "jsd_term"
        ),
    )
