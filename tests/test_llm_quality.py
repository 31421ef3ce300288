"""Quality gates for the approximate operators (no SQL oracle → these
tests are their correctness story, SURVEY.md §5.2.3/5.2.5):

* MinHash-LSH: precision 1.0 (candidates are exact-verified) and high
  recall vs exact n-gram Jaccard;
* SRP-LSH similarity search: returned scores must equal the brute-force
  scores (correctness), with measurable recall@k;
* seeded trade generator: §1.5 distribution properties;
* watermark append-mode output is a subset of the batch tumbling rollup.
"""

from __future__ import annotations

import pytest
from pyspark.sql import functions as F

from kinesis_datastore_app_spark import registry

registry.load_all()

SF = "/root/testdata/sf0.001"


def _exact_jaccard_pairs(spark, sf_dir, threshold):
    """All-pairs exact Jaccard ≥ threshold over the SAME shingle-hash
    feature space the operators use (brute-force ground truth)."""
    from kinesis_datastore_app_spark.llm.dedup import _full_sh_cached

    sh = _full_sh_cached(spark, sf_dir)
    sizes = sh.groupBy("doc_id").agg(F.count(F.lit(1)).alias("n_sh"))
    pairs = (
        sh.alias("a")
        .join(
            sh.alias("b"),
            (F.col("a.shv") == F.col("b.shv"))
            & (F.col("a.doc_id") < F.col("b.doc_id")),
        )
        .groupBy(F.col("a.doc_id").alias("doc_a"), F.col("b.doc_id").alias("doc_b"))
        .agg(F.count(F.lit(1)).alias("n_common"))
    )
    jac = F.col("n_common").cast("double") / (
        F.col("sa.n_sh") + F.col("sb.n_sh") - F.col("n_common")
    )
    exact = (
        pairs.join(sizes.alias("sa"), F.col("doc_a") == F.col("sa.doc_id"))
        .join(sizes.alias("sb"), F.col("doc_b") == F.col("sb.doc_id"))
        .filter(jac >= threshold)
        .select("doc_a", "doc_b", F.round(jac, 9).alias("jaccard"))
    )
    return {(r.doc_a, r.doc_b): r.jaccard for r in exact.collect()}


def test_minhash_precision_and_recall(spark):
    approx = registry.QUERIES["dedup_near_minhash"](spark, SF)
    approx_pairs = {(r.doc_a, r.doc_b): r.jaccard for r in approx.collect()}
    exact_pairs = _exact_jaccard_pairs(spark, SF, 0.5)

    # precision 1.0: every reported pair is a true >= 0.5 pair w/ exact score
    for k, v in approx_pairs.items():
        assert k in exact_pairs and abs(exact_pairs[k] - v) < 1e-9, k
    # recall: banded MinHash at 8x4 should catch nearly all j>=0.6 pairs
    strong = {k for k, v in exact_pairs.items() if v >= 0.6}
    assert strong, "ground truth has no strong pairs — test is vacuous"
    caught = len(strong & set(approx_pairs))
    assert caught / len(strong) >= 0.9, (caught, len(strong))


def test_minhash_recall_at_sf01(spark):
    """Round-5 regression gate for the retired bucket cap: at sf0.1 (the
    scale where the cap silently dropped 72% of simhash pairs and would
    have clipped any >200-doc minhash bucket) the LSH output must still
    be non-empty, exact-precision, and near-complete on strong pairs."""
    sf = "/root/testdata/sf0.1"
    approx = registry.QUERIES["dedup_near_minhash"](spark, sf)
    approx_pairs = {(r.doc_a, r.doc_b): r.jaccard for r in approx.collect()}
    assert approx_pairs, "sf0.1 output empty — recall gate is vacuous"
    exact_pairs = _exact_jaccard_pairs(spark, sf, 0.5)
    for k, v in approx_pairs.items():
        assert k in exact_pairs and abs(exact_pairs[k] - v) < 1e-9, k
    strong = {k for k, v in exact_pairs.items() if v >= 0.6}
    caught = len(strong & set(approx_pairs))
    assert caught / len(strong) >= 0.9, (caught, len(strong))


def test_lsh_simsearch_scores_match_bruteforce(spark):
    brute = registry.QUERIES["sim_search"](spark, SF)
    truth = {(r.query_id, r.vec_id): r.cos_sim for r in brute.collect()}
    lsh = registry.QUERIES["sim_search_lsh"](spark, SF)
    rows = lsh.collect()
    assert rows, "LSH search returned nothing"
    # correctness: any (query, vec) LSH returns that brute-force also ranked
    # in top-k must carry the identical score
    overlap = [r for r in rows if (r.query_id, r.vec_id) in truth]
    for r in overlap:
        assert abs(truth[(r.query_id, r.vec_id)] - r.cos_sim) < 1e-9
    # sanity recall: with one 12-bit table expect at least some overlap
    assert len(overlap) >= 1


def test_ivf_simsearch_recall_vs_bruteforce(spark):
    brute = registry.QUERIES["sim_search"](spark, SF)
    truth = {(r.query_id, r.vec_id): r.cos_sim for r in brute.collect()}
    ivf = registry.QUERIES["sim_search_ivf"](spark, SF)
    rows = ivf.collect()
    assert rows, "IVF search returned nothing"
    # any pair IVF returns that brute-force also ranked in top-k must
    # carry the identical score (the re-rank is exact)
    overlap = [r for r in rows if (r.query_id, r.vec_id) in truth]
    for r in overlap:
        assert abs(truth[(r.query_id, r.vec_id)] - r.cos_sim) < 1e-9
    # probing 2 of ~8 lists should recover a reasonable share of true
    # neighbors (nearest lists are where the neighbors concentrate)
    assert len(overlap) / len(truth) >= 0.3, (len(overlap), len(truth))


def _bruteforce_simhash_pairs(spark, sf_dir):
    """All-pairs hamming ≤ 3 over the docs' 64-bit prints — the complete
    answer dedup_simhash claims to produce exactly."""
    from kinesis_datastore_app_spark.llm.dedup import (
        _SH_TAGS,
        _full_sh_cached,
        _shv_fingerprint,
    )

    fp = _shv_fingerprint(_full_sh_cached(spark, sf_dir), _SH_TAGS)
    a, b = fp.alias("a"), fp.alias("b")
    brute = (
        a.join(b, F.col("a.doc_id") < F.col("b.doc_id"))
        .select(
            F.col("a.doc_id").alias("doc_a"),
            F.col("b.doc_id").alias("doc_b"),
            F.bit_count(F.col("a.print").bitwiseXOR(F.col("b.print")))
            .cast("int")
            .alias("hamming"),
        )
        .filter(F.col("hamming") <= 3)
    )
    return {(r.doc_a, r.doc_b): r.hamming for r in brute.collect()}


def test_simhash_equals_bruteforce(spark):
    """dedup_simhash's 4×16-bit block join must be COMPLETE for
    hamming ≤ 3 (pigeonhole) — exact set equality with brute force."""
    out = {
        (r.doc_a, r.doc_b): r.hamming
        for r in registry.QUERIES["dedup_simhash"](spark, SF).collect()
    }
    assert out == _bruteforce_simhash_pairs(spark, SF)
    assert out, "sf0.001 simhash output empty — equality check is vacuous"


def test_simhash_equals_bruteforce_at_sf01(spark):
    """Round-5 regression gate for the retired bucket cap: the sf0.1
    corpus is exactly where the cap broke recall (-72% of pairs); the
    block join must reproduce brute force with no exclusions."""
    sf = "/root/testdata/sf0.1"
    out = {
        (r.doc_a, r.doc_b): r.hamming
        for r in registry.QUERIES["dedup_simhash"](spark, sf).collect()
    }
    assert out == _bruteforce_simhash_pairs(spark, sf)
    assert len(out) >= 100, "sf0.1 simhash output suspiciously small"


def test_trade_generator_distribution(spark):
    from kinesis_datastore_app_spark.trades.generator import TICKERS, trades

    df = trades(spark, 5000).cache()
    means = dict(TICKERS)
    rows = df.collect()
    assert len(rows) == 5000
    ids = [r.id for r in rows]
    assert sorted(ids) == list(range(1, 5001))  # monotone unique ids (A2)
    n_sell = sum(1 for r in rows if r.tradeType == "SELL")
    assert 0.35 < n_sell / 5000 < 0.45  # PROBABILITY_SELL = 0.4
    seen = set()
    for r in rows:
        assert r.tickerSymbol in means
        seen.add(r.tickerSymbol)
        m = means[r.tickerSymbol]
        assert m * 0.8 - 0.01 <= r.price <= m * 1.2 + 0.01  # ±20% deviation
        assert round(r.price, 2) == r.price  # 2-decimal rounding (A3)
        assert 1 <= r.quantity <= 10000
    assert len(seen) == 25  # full universe hit at n=5000
    df.unpersist()


def test_watermark_output_subset_of_batch(spark):
    streamed = registry.QUERIES["stream_watermark"](spark, SF)
    got = {(r.window_start, r.event_type): r.n for r in streamed.collect()}
    assert got, "watermarked stream emitted nothing"
    from kinesis_datastore_app_spark.catalog import table

    batch = (
        table(spark, SF, "events")
        .groupBy(F.date_trunc("hour", F.col("ts")).alias("window_start"), "event_type")
        .agg(F.count(F.lit(1)).alias("n"))
    )
    full = {(r.window_start, r.event_type): r.n for r in batch.collect()}
    # every emitted window exists in the batch result, with the streamed
    # count never exceeding it (late rows behind the lagged filter
    # watermark are dropped — the fixture demotes every 10th event two
    # batches, so SOME windows must come up short)
    for k, v in got.items():
        assert k in full and v <= full[k], k
    assert sum(got.values()) < sum(
        full[k] for k in got
    ), "no late rows were dropped — fixture no longer exercises the drop path"


def test_pq_simsearch_recall_vs_bruteforce(spark):
    brute = registry.QUERIES["sim_search"](spark, SF)
    truth = {(r.query_id, r.vec_id): r.cos_sim for r in brute.collect()}
    pq = registry.QUERIES["sim_search_pq"](spark, SF)
    rows = pq.collect()
    assert rows, "PQ search returned nothing"
    # exact re-rank: any pair PQ shares with brute force carries the
    # identical score
    overlap = [r for r in rows if (r.query_id, r.vec_id) in truth]
    for r in overlap:
        assert abs(truth[(r.query_id, r.vec_id)] - r.cos_sim) < 1e-9
    # ADC over a 16-codeword-per-subspace stride codebook, 60 candidates
    # re-ranked to 10: stride codebooks on unclustered random vectors are
    # PQ's worst case — expect a meaningful (not high) share recovered
    assert len(overlap) / len(truth) >= 0.3, (len(overlap), len(truth))


# ---------------------------------------------------------------------------
# Skew-chunk grid ENGAGED, full-operator differential (round-8 top item).
#
# At fixture scale the adaptive dispatch (_MAXN_CACHE) always picks the
# classic self-join plan — the grid path behind all six LSH/pair keys had
# only unit-level (forced-low-cap) evidence. This corpus is seeded so the
# REAL cap (1024) is exceeded end-to-end: 1120 near-identical docs where
# doc i replaces the LAST of 72 base tokens with a collision-free unique
# token (features are ascii(first)*7+len, so uniques are 'z'*(100+i) —
# feature 954+i, disjoint from the base tokens' 682..859 range; a
# same-feature collision would silently COLLAPSE docs into one group and
# un-engage the grid). Every shared 2-gram then has df≈1122 > 1024 (the
# inverted-index grid engages with c=2) and ~94% of docs share each
# 4-row band signature (the LSH band-bucket grid engages), while the
# outputs stay small enough to hash against DuckDB.
# ---------------------------------------------------------------------------


def _hot_grid_dir(tmp_path_factory) -> str:
    import pyarrow as pa
    import pyarrow.parquet as papq

    base = [chr(97 + j % 26) * (3 + j // 26) for j in range(72)]
    ids, texts = [], []
    for i in range(1120):
        toks = base[:-1] + ["z" * (100 + i)]
        ids.append(10 * (i + 1))
        texts.append(" ".join(toks))
    # verbatim copies of doc 10 (collapse + intra-pair expansion path)
    for cid in (111000, 111010):
        ids.append(cid)
        texts.append(texts[0])
    # unrelated docs OUTSIDE the %10 sample (exercise the pushed filter)
    for j in range(7):
        ids.append(200001 + j)
        texts.append(" ".join("z" * (1500 + j * 10 + k) for k in range(10)))
    d = tmp_path_factory.mktemp("hotgrid")
    papq.write_table(
        pa.table({"doc_id": pa.array(ids, pa.int64()), "text": texts}),
        str(d / "documents.parquet"),
    )
    return str(d)


@pytest.fixture(scope="module")
def hot_grid_dir(tmp_path_factory):
    return _hot_grid_dir(tmp_path_factory)


def _oracle_on_documents(sql: str, sf_dir: str):
    import duckdb

    con = duckdb.connect()
    con.execute(
        "CREATE VIEW documents AS "
        f"SELECT * FROM read_parquet('{sf_dir}/documents.parquet')"
    )
    return con.execute(sql).fetchdf()


def _run_grid_key_differential(spark, key: str, sf_dir: str, memo_keys):
    """Full-operator check with the grid ENGAGED: (1) the adaptive
    dispatch measured max chunk count >= 2 and the grid columns are in
    the plan; (2) output == DuckDB oracle replay (driver-mirror compare);
    (3) output == the forced-classic plan (memo overridden to 1)."""
    from kinesis_datastore_app_spark.llm.dedup import (
        _HOT_SHINGLE_CAP,
        _MAXN_CACHE,
    )
    from tests.oracle_harness import compare

    grid_df = registry.QUERIES[key](spark, sf_dir)
    for mk in memo_keys:
        full = f"{mk}|cap{_HOT_SHINGLE_CAP}"
        assert _MAXN_CACHE.get(full, 1) >= 2, (
            f"{key}: dispatch did not measure an above-cap key for {full} "
            f"— the grid never engaged; corpus seed broken"
        )
    plan = grid_df._jdf.queryExecution().optimizedPlan().toString()
    assert "_gj" in plan, f"{key}: grid chunk columns absent from the plan"
    compare(grid_df, _oracle_on_documents(registry.ORACLE[key], sf_dir), key)

    # classic-plan A/B: same corpus, dispatch forced to the plain
    # self-join (semantically identical, skew-prone) — exact multiset
    # equality, JVM-side
    saved = {}
    for mk in memo_keys:
        full = f"{mk}|cap{_HOT_SHINGLE_CAP}"
        saved[full] = _MAXN_CACHE[full]
        _MAXN_CACHE[full] = 1
    try:
        classic_df = registry.QUERIES[key](spark, sf_dir)
        cplan = classic_df._jdf.queryExecution().optimizedPlan().toString()
        assert "_gj" not in cplan, f"{key}: forced-classic plan still gridded"
        assert grid_df.exceptAll(classic_df).limit(1).count() == 0
        assert classic_df.exceptAll(grid_df).limit(1).count() == 0
    finally:
        _MAXN_CACHE.update(saved)


def test_grid_engaged_dedup_ngram_jaccard(spark, hot_grid_dir):
    from kinesis_datastore_app_spark.catalog import scratch_tag

    tag = scratch_tag(hot_grid_dir, "documents")
    _run_grid_key_differential(
        spark, "dedup_ngram_jaccard", hot_grid_dir, [f"sh2s10:{tag}"]
    )


def test_grid_engaged_dedup_containment(spark, hot_grid_dir):
    from kinesis_datastore_app_spark.catalog import scratch_tag

    tag = scratch_tag(hot_grid_dir, "documents")
    _run_grid_key_differential(
        spark, "dedup_containment", hot_grid_dir, [f"sh2s10:{tag}"]
    )


def test_grid_engaged_dedup_near_minhash(spark, hot_grid_dir):
    from kinesis_datastore_app_spark.catalog import scratch_tag

    tag = scratch_tag(hot_grid_dir, "documents")
    _run_grid_key_differential(
        spark, "dedup_near_minhash", hot_grid_dir, [f"mh:{tag}:bands"]
    )


def test_embed_generate_feeds_similarity_consumer(spark):
    """End-to-end producer->consumer composition: the generated
    embedding column must (a) carry the exact schema the ANN consumers
    read from the fixture table, (b) come from a SHUFFLE-FREE plan
    (pure Arrow-batched map over the scan), and (c) support the
    brute-force cosine top-k consumer with deterministic output across
    re-runs (a nondeterministic encoder would poison every downstream
    index artifact)."""
    from pyspark.sql import Window

    from kinesis_datastore_app_spark.llm.embeddings import (
        EMB_GEN_DIM,
        embed_generate_frame,
    )
    from kinesis_datastore_app_spark.llm.simsearch import _dot, _norm

    emb = embed_generate_frame(spark, SF)
    assert dict(emb.dtypes)["embedding"] == "array<double>"
    plan = emb._jdf.queryExecution().executedPlan().toString()
    assert "Exchange" not in plan, "embedding generation must not shuffle"

    rows = emb.collect()
    assert rows and all(len(r.embedding) == EMB_GEN_DIM for r in rows)
    assert all(-1.0 <= x < 1.0 for r in rows for x in r.embedding)

    # the consumer: brute-force cosine top-3 for 2 query docs, exactly
    # the sim_search dataflow but over the GENERATED column
    e = emb.select("doc_id", "embedding").withColumn(
        "nrm", _norm(F.col("embedding"))
    )
    q = e.filter(F.col("doc_id") < 20).select(
        F.col("doc_id").alias("query_id"),
        F.col("embedding").alias("qv"),
        F.col("nrm").alias("qnrm"),
    )
    w = Window.partitionBy("query_id").orderBy(F.col("cos_sim").desc(), "doc_id")
    topk = (
        e.join(F.broadcast(q), F.col("doc_id") != F.col("query_id"))
        .select(
            "query_id",
            "doc_id",
            F.round(
                _dot(F.col("qv"), F.col("embedding"))
                / (F.col("qnrm") * F.col("nrm")),
                6,
            ).alias("cos_sim"),
        )
        .withColumn("rn", F.row_number().over(w))
        .filter(F.col("rn") <= 3)
        .select("query_id", "doc_id", "cos_sim")
    )
    got = sorted((r.query_id, r.doc_id, r.cos_sim) for r in topk.collect())
    assert got, "consumer returned nothing"
    # determinism across a full re-generation
    again = sorted((r.query_id, r.doc_id, r.cos_sim) for r in topk.collect())
    assert got == again


@pytest.mark.parametrize(
    "key", ["text_tfidf", "text_rarity_score", "text_lm_score"]
)
def test_vocab_gate_both_dispatch_paths(spark, key):
    """Round-9 size gate (_gated_broadcast): the vocab/df dimension join
    must produce IDENTICAL results whether the gate picks the broadcast
    hint (measured count under _VOCAB_BROADCAST_MAX) or the plain
    shuffle join (count above it) — and the two forced plans must
    actually differ by exactly that hint, so the test can't pass
    vacuously with the gate wired to a no-op."""
    from kinesis_datastore_app_spark.llm import text as T

    def hints(df):
        return df._jdf.queryExecution().analyzed().toString().count("ResolvedHint")

    saved = T._FORCE_VOCAB_DISPATCH
    try:
        T._FORCE_VOCAB_DISPATCH = "broadcast"
        bc = registry.QUERIES[key](spark, SF)
        T._FORCE_VOCAB_DISPATCH = "shuffle"
        sh = registry.QUERIES[key](spark, SF)
        assert hints(bc) == hints(sh) + 1, (
            f"{key}: forced dispatch did not toggle exactly the vocab hint"
        )
        assert bc.exceptAll(sh).limit(1).count() == 0
        assert sh.exceptAll(bc).limit(1).count() == 0
    finally:
        T._FORCE_VOCAB_DISPATCH = saved


def test_vocab_gate_measures_and_memoizes(spark):
    """The un-forced gate measures the dimension once per fixture
    fingerprint and dispatches on the threshold: under it -> hint
    applied; with the threshold forced to 0 and a cleared memo -> no
    hint. Also pins that the memo key is fingerprint-scoped (a second
    call reuses the cached count: cache size stays put)."""
    from kinesis_datastore_app_spark.llm import text as T

    def hints(df):
        return df._jdf.queryExecution().analyzed().toString().count("ResolvedHint")

    saved_max = T._VOCAB_BROADCAST_MAX
    saved_cache = dict(T._VOCAB_COUNT_CACHE)
    assert T._FORCE_VOCAB_DISPATCH is None
    try:
        T._VOCAB_COUNT_CACHE.clear()
        small = registry.QUERIES["text_rarity_score"](spark, SF)
        n_small = hints(small)
        assert len(T._VOCAB_COUNT_CACHE) == 1, "gate did not measure"
        (measured,) = T._VOCAB_COUNT_CACHE.values()
        assert 0 < measured <= T._VOCAB_BROADCAST_MAX
        # repeat call: memo hit, no second measurement entry
        registry.QUERIES["text_rarity_score"](spark, SF)
        assert len(T._VOCAB_COUNT_CACHE) == 1
        # threshold 0: same corpus now counts as over-gate -> no hint
        T._VOCAB_BROADCAST_MAX = 0
        big = registry.QUERIES["text_rarity_score"](spark, SF)
        assert hints(small) == hints(big) + 1
    finally:
        T._VOCAB_BROADCAST_MAX = saved_max
        T._VOCAB_COUNT_CACHE.clear()
        T._VOCAB_COUNT_CACHE.update(saved_cache)


# ---------------------------------------------------------------------------
# Honest-recall gates for the 8×4 MinHash banding curve (round-10;
# round-9 verdict item 5). The r9 review corrected the docs to state the
# true recall curve (P(candidate) = 1-(1-j^r)^b: ≈0.46 at j=0.52, 0.90
# at 0.71, 0.98 at 0.79 — the 0.5-0.65 tail is deliberately traded for
# candidate precision). These tests PIN that statement: a seeded-mutant
# corpus with construction-exact jaccard levels measures the realized
# candidate recall per level and requires (a) floors at j≈0.7 / j≈0.8
# and (b) the 0.5-0.65 band to MATCH the banding formula within binomial
# tolerance — so the documented trade-off stays true as the constants
# change (the expectation is recomputed from _MH_BANDS/_MH_ROWS, not
# hard-coded).
#
# Corpus construction (memory-safe per the engine's token hash
# ascii(first)*7 + len): each pair interleaves a pair-unique salt token
# 'z'*(100+p) between short shared base tokens, so EVERY 3-gram shingle
# involves the salt and the pair's shingle universe is disjoint from
# every other pair's — minhash outcomes are decorrelated across pairs
# (shared universes + fixed hash coefficients would make all pairs band
# identically and recall read 0 or 1 per level). The mutant replaces the
# base tail after k prefix tokens; with 36 base tokens (72 interleaved,
# 70 distinct shingles) exact jaccard = (k-1)/(71-k) by construction.
# ---------------------------------------------------------------------------

_RECALL_N_BASE = 36
_RECALL_PAIRS_PER_LEVEL = 120
_RECALL_LEVELS = (25, 26, 27, 30, 32)  # prefix k → j ≈ .52 .56 .59 .71 .79


def _banding_p(j: float) -> float:
    from kinesis_datastore_app_spark.llm.dedup import _MH_BANDS, _MH_ROWS

    return 1.0 - (1.0 - j**_MH_ROWS) ** _MH_BANDS


def _recall_level_j(k: int) -> float:
    n = _RECALL_N_BASE
    return (k - 1) / (2 * n - 1 - k)


def _seeded_mutant_corpus(out_dir: str, extra_docs=None) -> dict:
    """Write documents.parquet with the seeded pairs (plus optional real
    rows); return {(orig_id, mut_id): (k, exact_j)}."""
    import os

    import pyarrow as pa
    import pyarrow.parquet as papq

    n = _RECALL_N_BASE
    base = [chr(97 + t % 26) * (3 + t // 26) for t in range(n)]
    # token val = ascii(first)*7 + len ⇒ letters at len 30/31 ALIAS other
    # letters at len 3/4 (Δascii·7 = Δlen) — the memory-documented trap.
    # 'z'*(800+t) puts tail vals at 1654+, disjoint from base (682..858)
    # and from every salt (954..1553 for p < 600).
    mut_tail = ["z" * (800 + t) for t in range(n)]
    ids, texts, truth = [], [], {}
    p = 0
    for k in _RECALL_LEVELS:
        for _ in range(_RECALL_PAIRS_PER_LEVEL):
            salt = "z" * (100 + p)
            orig = []
            for t in range(n):
                orig += [base[t], salt]
            mut = []
            for t in range(n):
                mut += [base[t] if t < k else mut_tail[t], salt]
            oid, mid = 10_000_000 + 2 * p, 10_000_000 + 2 * p + 1
            ids += [oid, mid]
            texts += [" ".join(orig), " ".join(mut)]
            truth[(oid, mid)] = (k, _recall_level_j(k))
            p += 1
    if extra_docs is not None:
        ids += list(extra_docs[0])
        texts += list(extra_docs[1])
    papq.write_table(
        pa.table({"doc_id": pa.array(ids, pa.int64()), "text": texts}),
        os.path.join(out_dir, "documents.parquet"),
    )
    return truth


def _assert_recall_curve(spark, sf_dir: str, truth: dict) -> None:
    out = registry.QUERIES["dedup_near_minhash"](spark, sf_dir)
    got = {
        (r.doc_a, r.doc_b): r.jaccard
        for r in out.filter(
            (F.col("doc_a") >= 10_000_000) & (F.col("doc_b") >= 10_000_000)
        ).collect()
    }
    # precision on the seeded slice: every reported seeded pair is a real
    # seeded pair with the construction-exact jaccard
    for pair, j in got.items():
        assert pair in truth, f"phantom pair {pair}"
        assert abs(j - truth[pair][1]) < 1e-6, (pair, j, truth[pair])

    by_k: dict[int, list[bool]] = {k: [] for k in _RECALL_LEVELS}
    for pair, (k, _) in truth.items():
        by_k[k].append(pair in got)
    measured = {k: sum(v) / len(v) for k, v in by_k.items()}
    expect = {k: _banding_p(_recall_level_j(k)) for k in _RECALL_LEVELS}

    # (a) floors where the curve PROMISES recall (docs: 0.89 at j=0.7,
    # 0.985 at 0.8) — formula-relative so a constants change re-derives
    # them, plus the documented hard floors
    for k, hard in ((30, 0.80), (32, 0.93)):
        assert measured[k] >= expect[k] - 0.10 and measured[k] >= hard, (
            f"k={k} j={_recall_level_j(k):.3f}: measured {measured[k]:.3f} "
            f"below promise (formula {expect[k]:.3f}, hard floor {hard})"
        )
    # (b) the traded-away 0.5-0.65 band must MATCH the formula — recall
    # silently ABOVE the curve would mean the geometry changed (more
    # candidates at low j = the 100 TB verify-cost bound moved), below
    # means the documented promise broke
    low = [k for k in _RECALL_LEVELS if _recall_level_j(k) < 0.65]
    for k in low:
        assert abs(measured[k] - expect[k]) <= 0.13, (
            f"k={k} j={_recall_level_j(k):.3f}: measured {measured[k]:.3f} "
            f"vs banding formula {expect[k]:.3f} — outside binomial "
            f"tolerance; the documented trade-off no longer holds"
        )
    pooled_m = sum(measured[k] for k in low) / len(low)
    pooled_e = sum(expect[k] for k in low) / len(low)
    assert abs(pooled_m - pooled_e) <= 0.10, (
        f"pooled 0.5-0.65 band recall {pooled_m:.3f} vs formula "
        f"{pooled_e:.3f}"
    )


def test_minhash_banding_recall_matches_formula(spark, tmp_path):
    truth = _seeded_mutant_corpus(str(tmp_path))
    _assert_recall_curve(spark, str(tmp_path), truth)


def test_minhash_banding_recall_matches_formula_with_sf01_corpus(
    spark, tmp_path
):
    """Same gate with the full sf0.1 documents table mixed in: the real
    corpus must not perturb the seeded pairs' banding (bucket contention,
    collapse, or grid dispatch changing candidate generation would show
    up here)."""
    import duckdb

    real = duckdb.sql(
        "SELECT doc_id, text FROM "
        "read_parquet('/root/testdata/sf0.1/documents.parquet')"
    ).fetchall()
    truth = _seeded_mutant_corpus(
        str(tmp_path),
        extra_docs=([r[0] for r in real], [r[1] for r in real]),
    )
    _assert_recall_curve(spark, str(tmp_path), truth)


def test_semantic_cluster_recall_on_seeded_mutants(spark):
    """dedup_semantic_cluster is approximate (a mutant pair is missed
    only if the coarse assignment or an SRP plane separates it) — this
    pins the recall claim with SEEDED near-duplicate embeddings: 12
    corpus vectors get a tiny deterministic perturbation (cos ≈ 0.9999)
    appended under fresh ids; the pipeline must recover ≥ 10 of the 12
    planted pairs (a tiny-angle pair flips an SRP bit with probability
    ~angle/pi per plane — near zero here), and every emitted pair must
    satisfy the exact-cosine gate (precision 1.0 by construction: the
    verify stage IS exact cosine)."""
    from pyspark.sql import functions as F

    from kinesis_datastore_app_spark.catalog import table
    from kinesis_datastore_app_spark.llm.simsearch import (
        SEM_THRESH,
        semantic_cluster_pairs,
    )

    sf_dir = "/root/testdata/sf0.01"
    e = table(spark, sf_dir, "embeddings").select(
        "vec_id", F.col("embedding").cast("array<double>").alias("v")
    )
    base = e.orderBy("vec_id").limit(12).collect()
    max_id = e.agg(F.max("vec_id")).collect()[0][0]
    mutants, truth = [], set()
    for i, r in enumerate(base):
        mid = max_id + 1 + i
        v = list(r.v)
        v[i % len(v)] += 0.003  # tiny deterministic nudge
        mutants.append((mid, v))
        truth.add((r.vec_id, mid))
    doctored = e.unionByName(
        spark.createDataFrame(mutants, "vec_id bigint, v array<double>")
    )
    n = doctored.count()
    pairs = semantic_cluster_pairs(spark, doctored, n)
    got = {
        (a, b)
        for a, b in pairs.select("vec_a", "vec_b")
        .collect()
    }
    found = truth & got
    assert len(found) >= 10, (
        f"semantic dedup recalled only {len(found)}/12 planted pairs"
    )
    # every emitted pair really clears the exact gate (verify IS exact)
    min_sim = pairs.agg(F.min("cos_sim")).collect()[0][0]
    assert min_sim > SEM_THRESH - 1e-6
