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
