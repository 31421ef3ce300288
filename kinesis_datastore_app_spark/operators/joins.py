"""Join operators (SURVEY.md §2.B3).

The reference has no joins (§0); this is the generalized surface. Strategy
notes per operator record how the plan should look at 100 TB — broadcast
for dimension tables (no shuffle of the fact side), sort-merge/shuffled
hash with AQE skew handling for fact-to-fact, and a windowed composition
for as-of (one shuffle by key, no nested loop).
"""

from __future__ import annotations

from pyspark.sql import DataFrame, SparkSession, Window
from pyspark.sql import functions as F

from kinesis_datastore_app_spark.catalog import table
from kinesis_datastore_app_spark.numerics import dsum, sql_dsum
from kinesis_datastore_app_spark.registry import register

_INNER_ORACLE = """
SELECT o.o_orderkey, o.o_totalprice, c.c_name, c.c_mktsegment
FROM orders o JOIN customer c ON o.o_custkey = c.c_custkey
WHERE c.c_mktsegment = 'BUILDING'
"""


@register("join_inner_equi", oracle=_INNER_ORACLE)
def join_inner_equi(spark: SparkSession, sf_dir: str) -> DataFrame:
    """Equi inner join; Catalyst/AQE picks broadcast vs sort-merge by size."""
    o = table(spark, sf_dir, "orders")
    c = table(spark, sf_dir, "customer").filter(F.col("c_mktsegment") == "BUILDING")
    return o.join(c, o.o_custkey == c.c_custkey, "inner").select(
        "o_orderkey", "o_totalprice", "c_name", "c_mktsegment"
    )


_BCAST_ORACLE = f"""
SELECT p.p_brand,
       {sql_dsum("l.l_extendedprice * (1 - l.l_discount)", 4)} AS revenue,
       COUNT(*) AS n_items
FROM lineitem l JOIN part p ON l.l_partkey = p.p_partkey
WHERE p.p_size <= 15
GROUP BY p.p_brand
"""


@register("join_broadcast", oracle=_BCAST_ORACLE)
def join_broadcast(spark: SparkSession, sf_dir: str) -> DataFrame:
    """Fact ⋈ broadcast(dim): the 100 TB pattern for dimension joins — the
    dim ships to every executor, the fact table never shuffles."""
    l = table(spark, sf_dir, "lineitem")
    p = table(spark, sf_dir, "part").filter(F.col("p_size") <= 15)
    return (
        l.join(F.broadcast(p), l.l_partkey == p.p_partkey)
        .groupBy("p_brand")
        .agg(
            dsum(F.col("l_extendedprice") * (1 - F.col("l_discount")), 4).alias("revenue"),
            F.count(F.lit(1)).alias("n_items"),
        )
    )


_OUTER_ORACLE = """
SELECT c.c_custkey, c.c_name, o.o_orderkey, o.o_totalprice
FROM (SELECT * FROM customer WHERE c_custkey < 50) c
FULL OUTER JOIN (SELECT * FROM orders WHERE o_orderstatus = 'F') o
  ON o.o_custkey = c.c_custkey
"""


@register("join_outer", oracle=_OUTER_ORACLE)
def join_outer(spark: SparkSession, sf_dir: str) -> DataFrame:
    """Full outer join with unmatched rows on both sides (null padding)."""
    c = table(spark, sf_dir, "customer").filter(F.col("c_custkey") < 50)
    o = table(spark, sf_dir, "orders").filter(F.col("o_orderstatus") == "F")
    return o.join(c, o.o_custkey == c.c_custkey, "full").select(
        "c_custkey", "c_name", "o_orderkey", "o_totalprice"
    )


_OUTER_LEFT_ORACLE = """
SELECT c.c_custkey, c.c_name, o.o_orderkey, o.o_totalprice
FROM customer c
LEFT JOIN (SELECT * FROM orders WHERE o_orderstatus = 'F') o
  ON o.o_custkey = c.c_custkey
"""


@register("join_outer_left", oracle=_OUTER_LEFT_ORACLE)
def join_outer_left(spark: SparkSession, sf_dir: str) -> DataFrame:
    """Left outer join: every customer survives, unmatched rows padded
    with nulls. Scale note: the preserved (left) side can still be the
    broadcast-join STREAM side — only the build side must be small — so
    dim-filtered left joins broadcast exactly like inner joins; a
    big-big left join falls back to the sort-merge shuffle on the key."""
    c = table(spark, sf_dir, "customer")
    o = table(spark, sf_dir, "orders").filter(F.col("o_orderstatus") == "F")
    return c.join(o, c.c_custkey == o.o_custkey, "left").select(
        "c_custkey", "c_name", "o_orderkey", "o_totalprice"
    )


_OUTER_RIGHT_ORACLE = """
SELECT o.o_orderkey, o.o_orderstatus, c.c_custkey, c.c_name
FROM (SELECT * FROM orders WHERE o_totalprice > 100000) o
RIGHT JOIN (SELECT * FROM customer WHERE c_custkey < 100) c
  ON o.o_custkey = c.c_custkey
"""


@register("join_outer_right", oracle=_OUTER_RIGHT_ORACLE)
def join_outer_right(spark: SparkSession, sf_dir: str) -> DataFrame:
    """Right outer join (the mirrored preserve side): every filtered
    customer survives even with no qualifying order. Catalyst normalizes
    right outer to left outer with swapped children, so the physical
    strategy menu is identical — expressed here as the user would write
    it to complete the SURVEY §2.B3 left/right/full contract."""
    o = table(spark, sf_dir, "orders").filter(F.col("o_totalprice") > 100000)
    c = table(spark, sf_dir, "customer").filter(F.col("c_custkey") < 100)
    return o.join(c, o.o_custkey == c.c_custkey, "right").select(
        "o_orderkey", "o_orderstatus", "c_custkey", "c_name"
    )


_SEMI_ORACLE = """
SELECT c_custkey, c_name, c_acctbal
FROM customer c
WHERE EXISTS (SELECT 1 FROM orders o
              WHERE o.o_custkey = c.c_custkey AND o.o_totalprice > 300000)
"""


@register("join_semi", oracle=_SEMI_ORACLE)
def join_semi(spark: SparkSession, sf_dir: str) -> DataFrame:
    """EXISTS as left-semi: no row multiplication, build side only probed."""
    c = table(spark, sf_dir, "customer")
    o = table(spark, sf_dir, "orders").filter(F.col("o_totalprice") > 300000)
    return c.join(o, c.c_custkey == o.o_custkey, "left_semi").select(
        "c_custkey", "c_name", "c_acctbal"
    )


_ANTI_ORACLE = """
SELECT c_custkey, c_name
FROM customer c
WHERE NOT EXISTS (SELECT 1 FROM orders o
                  WHERE o.o_custkey = c.c_custkey AND o.o_totalprice > 350000)
"""


@register("join_anti", oracle=_ANTI_ORACLE)
def join_anti(spark: SparkSession, sf_dir: str) -> DataFrame:
    """NOT EXISTS as left-anti."""
    c = table(spark, sf_dir, "customer")
    o = table(spark, sf_dir, "orders").filter(F.col("o_totalprice") > 350000)
    return c.join(o, c.c_custkey == o.o_custkey, "left_anti").select("c_custkey", "c_name")


_THETA_ORACLE = """
SELECT s.s_suppkey, s.s_name, c.c_custkey, c.c_acctbal
FROM supplier s JOIN customer c
  ON c.c_acctbal BETWEEN s.s_acctbal - 100 AND s.s_acctbal + 100
"""


@register("join_theta", oracle=_THETA_ORACLE)
def join_theta(spark: SparkSession, sf_dir: str) -> DataFrame:
    """Non-equi (range) join → BroadcastNestedLoopJoin. Only sane when one
    side broadcasts; the scale path for big range joins is bucketized
    equi-join on a coarsened range key + residual filter."""
    s = table(spark, sf_dir, "supplier")
    c = table(spark, sf_dir, "customer")
    cond = c.c_acctbal.between(s.s_acctbal - 100, s.s_acctbal + 100)
    return F.broadcast(s).join(c, cond, "inner").select(
        "s_suppkey", "s_name", "c_custkey", "c_acctbal"
    )


_ASOF_ORACLE = """
SELECT p.event_id, p.user_id, p.ts, c.ts AS asof_click_ts
FROM (SELECT event_id, user_id, ts FROM events WHERE event_type = 'purchase') p
ASOF LEFT JOIN (SELECT user_id, ts FROM events WHERE event_type = 'click') c
  ON p.user_id = c.user_id AND p.ts >= c.ts
"""


def _tagged_asof_union(e: DataFrame, anchor_type: str, match_type: str,
                       match_col: str, tag_col: str):
    """The as-of composition both asof operators share: anchor rows
    (tag 1) carry a NULL match-ts, match rows (tag 0) carry their own
    ts, unioned and windowed over (ts, tag). The load-bearing subtlety
    lives HERE, once: among ts ties the tag sorts match rows FIRST, so
    a same-ts match resolves — ASOF's >= semantics. Returns the tagged
    union plus the backward and forward frame specs (a backward-only
    caller ignores the forward one; Catalyst plans one Exchange + one
    sort either way)."""
    anchors = e.filter(F.col("event_type") == anchor_type).select(
        "event_id", "user_id", "ts",
        F.lit(None).cast("timestamp").alias(match_col),
        F.lit(1).alias(tag_col),
    )
    matches = e.filter(F.col("event_type") == match_type).select(
        F.lit(None).cast("long").alias("event_id"), "user_id", "ts",
        F.col("ts").alias(match_col), F.lit(0).alias(tag_col),
    )
    order = Window.partitionBy("user_id").orderBy("ts", tag_col)
    back = order.rowsBetween(Window.unboundedPreceding, Window.currentRow)
    fwd = order.rowsBetween(Window.currentRow, Window.unboundedFollowing)
    return anchors.unionByName(matches), back, fwd


@register("join_asof", oracle=_ASOF_ORACLE)
def join_asof(spark: SparkSession, sf_dir: str) -> DataFrame:
    """As-of join (nearest earlier event), Spark-first composition.

    Spark has no native ASOF JOIN; instead of a per-group pandas
    merge_asof (Python boundary, memory-bound per key), compose it from a
    union + running `last(ignorenulls)` window (_tagged_asof_union): the
    running last non-null click-ts AT each purchase row IS the as-of
    match. One shuffle on user_id, fully JVM-side, streams at any scale.
    """
    e = table(spark, sf_dir, "events")
    u, back, _ = _tagged_asof_union(e, "purchase", "click", "click_ts", "is_p")
    return (
        u.withColumn("asof_click_ts", F.last("click_ts", ignorenulls=True).over(back))
        .filter(F.col("is_p") == 1)
        .select("event_id", "user_id", "ts", "asof_click_ts")
    )


_CROSS_ORACLE = """
SELECT r.r_name, n.n_name, r.r_regionkey = n.n_regionkey AS same_region
FROM region r CROSS JOIN nation n
"""


@register("join_cross", oracle=_CROSS_ORACLE)
def join_cross(spark: SparkSession, sf_dir: str) -> DataFrame:
    """Cartesian product (tiny dims only; guarded by explicit crossJoin)."""
    r = table(spark, sf_dir, "region")
    n = table(spark, sf_dir, "nation")
    return r.crossJoin(n).select(
        "r_name", "n_name", (F.col("r_regionkey") == F.col("n_regionkey")).alias("same_region")
    )


_SKEW_SALTED_ORACLE = f"""
SELECT o.o_orderkey, o.o_custkey, COUNT(*) AS n_items,
       {sql_dsum("l.l_quantity")} AS qty
FROM orders o JOIN lineitem l ON l.l_orderkey = o.o_orderkey
WHERE o.o_orderpriority = '1-URGENT'
GROUP BY o.o_orderkey, o.o_custkey
"""


@register("join_skew_salted", oracle=_SKEW_SALTED_ORACLE)
def join_skew_salted(spark: SparkSession, sf_dir: str) -> DataFrame:
    """Manual skew salting for a big⋈big equi-join: the probe side gets a
    salt that is row-dependent but NOT key-dependent (so one hot key's rows
    spread across SALT partitions); the build side replicates ×SALT via an
    explode. Join on (key, salt) → each hot key becomes SALT evenly-sized
    shuffle partitions. Output provably identical to the plain join (same
    oracle shape as join_inner_equi's family). AQE's skewedJoin does this
    adaptively at runtime; this operator is the explicit form for when
    stats are missing or the source is a stream (AQE can't re-plan a
    running stage's input).
    """
    SALT = 8
    o = (
        table(spark, sf_dir, "orders")
        .filter(F.col("o_orderpriority") == "1-URGENT")
        .withColumn("salt", F.explode(F.sequence(F.lit(0), F.lit(SALT - 1))))
    )
    l = table(spark, sf_dir, "lineitem").withColumn(
        "salt", F.pmod(F.hash("l_linenumber", "l_partkey"), F.lit(SALT))
    )
    return (
        o.join(l, (o.o_orderkey == l.l_orderkey) & (o.salt == l.salt))
        .groupBy("o_orderkey", "o_custkey")
        .agg(F.count(F.lit(1)).alias("n_items"), dsum(F.col("l_quantity")).alias("qty"))
    )


_RANGE_BUCKETED_ORACLE = _THETA_ORACLE  # identical semantics, scale-path plan


@register("join_range_bucketed", oracle=_RANGE_BUCKETED_ORACLE)
def join_range_bucketed(spark: SparkSession, sf_dir: str) -> DataFrame:
    """The 100 TB plan for join_theta's range predicate: coarsen the range
    key into width-W buckets, explode each left row to its bucket ±1
    (covers every row within W), equi-join on the bucket (hash shuffle,
    NOT a nested loop), then apply the exact range predicate as a
    residual filter. Identical output to join_theta — the oracle is the
    same SQL — but the quadratic candidate space becomes per-bucket.

    W = the range half-width (100) so each probe row lands in exactly 3
    candidate buckets regardless of data volume.
    """
    W = 100
    s = table(spark, sf_dir, "supplier").select(
        "s_suppkey", "s_name", "s_acctbal",
        F.explode(
            F.array(
                F.floor(F.col("s_acctbal") / W) - 1,
                F.floor(F.col("s_acctbal") / W),
                F.floor(F.col("s_acctbal") / W) + 1,
            )
        ).alias("bucket"),
    )
    c = table(spark, sf_dir, "customer").withColumn(
        "bucket", F.floor(F.col("c_acctbal") / W)
    )
    return (
        s.join(c, "bucket")
        .filter(F.col("c_acctbal").between(F.col("s_acctbal") - W, F.col("s_acctbal") + W))
        .select("s_suppkey", "s_name", "c_custkey", "c_acctbal")
    )


_BUCKETED_ORACLE = f"""
SELECT o.o_orderpriority, COUNT(*) AS n_items, {sql_dsum("l.l_quantity")} AS qty
FROM orders o JOIN lineitem l ON l.l_orderkey = o.o_orderkey
GROUP BY o.o_orderpriority
"""


@register("join_bucketed_colocated", oracle=_BUCKETED_ORACLE)
def join_bucketed_colocated(spark: SparkSession, sf_dir: str) -> DataFrame:
    """Shuffle-FREE fact⋈fact join via bucketing: both tables are written
    bucketBy(join key) + sortBy into the warehouse once; the join then
    reads co-located, pre-sorted buckets — SortMergeJoin with NO Exchange
    on either side (asserted in tests/). This is the amortization play at
    100 TB: pay one shuffle at ingest, every subsequent key join is
    exchange-free. Bucket count 8 here; at scale set it so each bucket is
    ~100-500 MB and keep it identical on both tables.

    Table names carry the fixture fingerprint (catalog.scratch_tag), so
    two datasets — or two vintages of one dataset — can never alias onto
    one warehouse path, and a vintage's ingest runs ONCE per session
    instead of on every invocation (the amortization the operator
    exists to demonstrate; repeated drop+rewrite also raced concurrent
    sessions sharing the warehouse). Superseded same-basename vintages
    are dropped on a cold ingest, mirroring catalog._prune_stale_tags."""
    import re
    import shutil

    from kinesis_datastore_app_spark.catalog import scratch_tag

    spark.sql("CREATE DATABASE IF NOT EXISTS kdas")
    warehouse = spark.conf.get("spark.sql.warehouse.dir").removeprefix("file:")

    def vintage_table(name: str, src_table: str, writer) -> str:
        import os
        import time

        from kinesis_datastore_app_spark.catalog import _PRUNE_GRACE_S

        tag = re.sub(r"[^0-9a-zA-Z]", "_", scratch_tag(sf_dir, src_table))
        full = f"kdas.{name}_{tag}"
        if spark.catalog.tableExists(full):
            # warm resolve keeps the vintage young (the catalog pruner's
            # _touch_tag pattern): a long-lived session's in-use table
            # must not age into another session's GC window
            try:
                os.utime(f"{warehouse}/kdas.db/{full.split('.', 1)[1]}")
            except OSError:
                pass
            return full
        # cold ingest for this vintage: GC superseded vintages of the
        # same (operator, dataset-basename) first — same-basename ONLY
        # and AGE-GATED by _PRUNE_GRACE_S (round-10 review: the ungated
        # drop mirrored catalog._prune_stale_tags in name but not in its
        # two safety properties — a concurrent session's lazy DataFrames
        # over the superseded vintage, or a different same-basename
        # dataset's tables, were dropped mid-read on every cold ingest).
        # The in-memory catalog forgets entries across sessions while
        # their dirs persist, so clear this vintage's own leftover dir
        # too before writing.
        base = re.sub(
            r"[^0-9a-zA-Z]", "_", sf_dir.rstrip("/").rsplit("/", 1)[-1]
        )
        try:
            for d in os.listdir(f"{warehouse}/kdas.db"):
                if d.startswith(f"{name}_{base}_") and d != full.split(".", 1)[1]:
                    try:
                        age = time.time() - os.stat(f"{warehouse}/kdas.db/{d}").st_mtime
                    except OSError:
                        continue
                    if age < _PRUNE_GRACE_S:
                        continue
                    spark.sql(f"DROP TABLE IF EXISTS kdas.{d}")
                    shutil.rmtree(f"{warehouse}/kdas.db/{d}", ignore_errors=True)
        except OSError:
            pass
        shutil.rmtree(f"{warehouse}/kdas.db/{full.split('.', 1)[1]}", ignore_errors=True)
        writer(full)
        return full

    o_t = vintage_table(
        "orders_bucketed",
        "orders",
        lambda t: table(spark, sf_dir, "orders")
        .select("o_orderkey", "o_orderpriority")
        .write.bucketBy(8, "o_orderkey")
        .sortBy("o_orderkey")
        .mode("overwrite")
        .saveAsTable(t),
    )
    l_t = vintage_table(
        "lineitem_bucketed",
        "lineitem",
        lambda t: table(spark, sf_dir, "lineitem")
        .select("l_orderkey", "l_quantity")
        .write.bucketBy(8, "l_orderkey")
        .sortBy("l_orderkey")
        .mode("overwrite")
        .saveAsTable(t),
    )
    o = spark.table(o_t)
    l = spark.table(l_t)
    # hint("merge") pins SortMergeJoin: at fixture scale AQE would rather
    # broadcast the small side (hiding the point); at 100 TB fact⋈fact is
    # SMJ regardless, and over matching buckets it needs no Exchange
    return (
        o.hint("merge").join(l, o.o_orderkey == l.l_orderkey)
        .groupBy("o_orderpriority")
        .agg(F.count(F.lit(1)).alias("n_items"), dsum(F.col("l_quantity")).alias("qty"))
    )


_NAAJ_ORACLE = """
SELECT o_orderkey, o_custkey
FROM orders
WHERE o_custkey NOT IN (SELECT c_custkey FROM customer
                        WHERE c_mktsegment = 'MACHINERY')
"""


@register("join_null_aware_anti", oracle=_NAAJ_ORACLE)
def join_null_aware_anti(spark: SparkSession, sf_dir: str) -> DataFrame:
    """NOT IN as a null-aware anti join: NOT IN's three-valued logic is
    NOT a plain left_anti — one NULL in the subquery legally empties the
    whole result (tested in tests/). Expressed via spark.sql so Catalyst
    plans its dedicated null-aware anti join (single-column broadcast
    NAAJ); at scale the subquery side must broadcast — if it can't,
    rewrite the query to left_anti after proving/filtering non-null keys,
    which is also the faster plan. The DataFrame API's left_anti twin is
    join_anti."""
    table(spark, sf_dir, "orders").createOrReplaceTempView("naaj_orders")
    table(spark, sf_dir, "customer").createOrReplaceTempView("naaj_customer")
    return spark.sql(
        """
        SELECT o_orderkey, o_custkey
        FROM naaj_orders
        WHERE o_custkey NOT IN (SELECT c_custkey FROM naaj_customer
                                WHERE c_mktsegment = 'MACHINERY')
        """
    )


_LATERAL_ORACLE = """
SELECT c.c_custkey, t.o_orderkey, t.o_totalprice
FROM customer c, LATERAL (
  SELECT o_orderkey, o_totalprice FROM orders o
  WHERE o.o_custkey = c.c_custkey
  ORDER BY o_totalprice DESC, o_orderkey LIMIT 2) t
"""


@register("join_lateral", oracle=_LATERAL_ORACLE)
def join_lateral(spark: SparkSession, sf_dir: str) -> DataFrame:
    """Correlated LATERAL subquery with per-row LIMIT (top-2 orders per
    customer). Catalyst decorrelates it into a window row_number ≤ k over
    one join — no nested-loop re-execution per outer row (verified in the
    optimized plan: Window + Filter, not a correlated subplan). The same
    rewrite is why this stays one shuffle at 100 TB instead of
    customer-count query executions."""
    table(spark, sf_dir, "customer").createOrReplaceTempView("v_customer")
    table(spark, sf_dir, "orders").createOrReplaceTempView("v_orders")
    return spark.sql(
        """
        SELECT c.c_custkey, t.o_orderkey, t.o_totalprice
        FROM v_customer c, LATERAL (
          SELECT o_orderkey, o_totalprice FROM v_orders o
          WHERE o.o_custkey = c.c_custkey
          ORDER BY o_totalprice DESC, o_orderkey LIMIT 2) t
        """
    )


# Bloom-pruned semi join: the runtime-filter pattern (Spark's own
# spark.sql.optimizer.runtime.bloomFilter injects the same shape into
# shuffle joins) made explicit so the plan is inspectable: hash the
# small side's keys into a PACKED bitmap (m bits as m/60 long words),
# broadcast it, drop non-matching big rows BEFORE the exact join with an
# O(1) indexed probe per hash. The bloom admits false positives only —
# the exact semi join behind it makes the result identical to the plain
# semi join, which is exactly what the oracle checks. m is a constant
# (FP-rate knob), so the broadcast is bounded regardless of data scale.
_BLOOM_M = 1 << 16
_BLOOM_SEEDS = (1, 2, 3)
_BLOOM_WORD = 60

_BLOOM_ORACLE = """
SELECT o_orderpriority,
       CAST(COUNT(*) AS BIGINT) AS n_orders,
       CAST(COUNT(DISTINCT o_custkey) AS BIGINT) AS n_custs,
       MAX(o_totalprice) AS max_price
FROM orders
WHERE o_custkey IN (SELECT c_custkey FROM customer
                    WHERE c_mktsegment = 'BUILDING')
GROUP BY o_orderpriority
"""


@register("join_bloom_pruned", oracle=_BLOOM_ORACLE)
def join_bloom_pruned(spark: SparkSession, sf_dir: str) -> DataFrame:
    """Semi join with an explicit Bloom pre-filter: orders placed by
    BUILDING-segment customers, rolled up by priority.

    Why this exists as its own operator: at 100 TB the expensive part of
    a selective join is shuffling fact rows that will not survive it. A
    Bloom filter built from the dim side's keys (k xxhash64 probes into
    an m-bit space, packed into m/60 long words) is broadcast to every
    scan task and eliminates almost all doomed rows at scan speed,
    before any exchange — each probe is one array index + one bitwise
    AND, O(1) per hash (an unpacked set-of-positions representation
    would pay a linear array scan per probe). The packing itself is an
    aggregation: bit_or per word after map-side combine, then one dense
    transform on a single row — the build never leaves the DataFrame
    layer. False positives pass the bloom and die in the exact join;
    false negatives cannot occur, so the result equals the plain semi
    join the oracle runs. Spark's AQE injects this same runtime filter
    automatically for shuffle joins — the explicit version keeps the
    pattern working when the join is broadcast or the planner's
    heuristics decline."""
    cust = (
        table(spark, sf_dir, "customer")
        .filter(F.col("c_mktsegment") == "BUILDING")
        .select("c_custkey")
    )

    def probes(key: str):
        return [
            F.pmod(F.xxhash64(F.col(key), F.lit(s)), F.lit(_BLOOM_M))
            for s in _BLOOM_SEEDS
        ]

    sparse = (
        cust.select(F.explode(F.array(*probes("c_custkey"))).alias("bit"))
        .select(
            F.expr(f"bit div {_BLOOM_WORD}").alias("w"),
            F.expr(
                f"shiftleft(CAST(1 AS BIGINT), CAST(bit % {_BLOOM_WORD} AS INT))"
            ).alias("m"),
        )
        .groupBy("w")
        .agg(F.expr("bit_or(m)").alias("word"))
    )
    n_words = _BLOOM_M // _BLOOM_WORD + 1
    # Densify the sparse words into one m/60-long array (single bounded
    # row — m is a constant, so this is O(1) state however big the data).
    packed = sparse.agg(
        F.map_from_entries(
            F.collect_list(F.struct(F.col("w"), F.col("word")))
        ).alias("sw")
    ).select(
        F.transform(
            F.sequence(F.lit(0), F.lit(n_words - 1)),
            lambda i: F.coalesce(
                F.element_at(F.col("sw"), i.cast("bigint")), F.lit(0).cast("bigint")
            ),
        ).alias("bits")
    )
    o = table(spark, sf_dir, "orders").select(
        "o_custkey", "o_orderpriority", "o_totalprice"
    )
    # probe with the SAME probes() expressions the build used — one
    # hash definition, so build and probe can never drift (drift =
    # bloom false negatives = silently dropped rows). Hashes land in
    # named columns so each xxhash64 evaluates once per row (the word
    # index and the bit mask both read it).
    hcols = {f"_h{i}": h for i, h in enumerate(probes("o_custkey"))}
    cond = None
    for i in range(len(_BLOOM_SEEDS)):
        h = F.col(f"_h{i}")
        word = F.element_at(
            F.col("bits"), F.floor(h / _BLOOM_WORD).cast("int") + 1
        )
        # F.shiftleft takes a literal bit count; the column-typed count
        # needs the SQL form — still reading the ONE named hash column
        mask = F.expr(
            f"shiftleft(CAST(1 AS BIGINT), CAST(_h{i} % {_BLOOM_WORD} AS INT))"
        )
        c = word.bitwiseAND(mask) != 0
        cond = c if cond is None else (cond & c)
    pruned = (
        o.withColumns(hcols)
        .join(F.broadcast(packed))
        .filter(cond)
        .drop("bits", *hcols)
    )
    # The exact-verify side is the BUILDING customer subset — an
    # SF-GROWING frame (~1/5 of customer). No broadcast hint: AQE
    # broadcasts it at fixture scale and degrades to a shuffle semi
    # join at 100 TB, where a forced hint would OOM the build side.
    # (The bloom bit-array broadcast above stays — constant m bits.)
    exact = pruned.join(cust, pruned["o_custkey"] == cust["c_custkey"], "semi")
    return exact.groupBy("o_orderpriority").agg(
        F.count(F.lit(1)).alias("n_orders"),
        F.countDistinct("o_custkey").alias("n_custs"),
        F.max("o_totalprice").alias("max_price"),
    )


_ASOF_NEAREST_ORACLE = """
WITH u AS (
  SELECT event_id, user_id, ts, NULL AS p_ts, 1 AS is_e
  FROM events WHERE event_type = 'error'
  UNION ALL
  SELECT NULL, user_id, ts, ts, 0 FROM events WHERE event_type = 'purchase'
),
m AS (
  SELECT event_id, user_id, ts, is_e,
         last_value(p_ts IGNORE NULLS) OVER (
           PARTITION BY user_id ORDER BY ts, is_e
           ROWS BETWEEN UNBOUNDED PRECEDING AND CURRENT ROW) AS prev_ts,
         first_value(p_ts IGNORE NULLS) OVER (
           PARTITION BY user_id ORDER BY ts, is_e
           ROWS BETWEEN CURRENT ROW AND UNBOUNDED FOLLOWING) AS next_ts
  FROM u
)
SELECT event_id, user_id, ts,
       CASE WHEN prev_ts IS NULL THEN next_ts
            WHEN next_ts IS NULL THEN prev_ts
            WHEN epoch_us(ts) - epoch_us(prev_ts)
                 <= epoch_us(next_ts) - epoch_us(ts) THEN prev_ts
            ELSE next_ts END AS nearest_purchase_ts
FROM m WHERE is_e = 1
"""


@register("join_asof_nearest", oracle=_ASOF_NEAREST_ORACLE)
def join_asof_nearest(spark: SparkSession, sf_dir: str) -> DataFrame:
    """Nearest-event as-of join (both directions): for every error event,
    the closest purchase by the same user — earlier OR later, ties to
    the earlier (the sensor-alignment/nearest-context variant that
    backward-only ASOF can't express). Same composition as join_asof
    (_tagged_asof_union), one extra window: running last-non-null for
    the backward candidate and leading first-non-null for the forward
    candidate — both windows share ONE hash shuffle on user_id and one
    sort (Catalyst plans a single Exchange; the two frames are two
    passes over the sorted run). Distance compare in exact integer
    microseconds."""
    e = table(spark, sf_dir, "events")
    u, back, fwd = _tagged_asof_union(e, "error", "purchase", "p_ts", "is_e")
    m = (
        u.withColumn("prev_ts", F.last("p_ts", ignorenulls=True).over(back))
        .withColumn("next_ts", F.first("p_ts", ignorenulls=True).over(fwd))
        .filter(F.col("is_e") == 1)
    )
    prev_d = F.unix_micros(F.col("ts")) - F.unix_micros(F.col("prev_ts"))
    next_d = F.unix_micros(F.col("next_ts")) - F.unix_micros(F.col("ts"))
    return m.select(
        "event_id",
        "user_id",
        "ts",
        F.when(F.col("prev_ts").isNull(), F.col("next_ts"))
        .when(F.col("next_ts").isNull(), F.col("prev_ts"))
        .when(prev_d <= next_d, F.col("prev_ts"))
        .otherwise(F.col("next_ts"))
        .alias("nearest_purchase_ts"),
    )


# Null-safe equality join (<=> / IS NOT DISTINCT FROM): NULL keys match
# each other instead of vanishing — the semantics MERGE/upsert pipelines
# need when the business key is nullable. Null keys are made rare
# (every 97th customer / 193rd order) so the null-null match stays a
# bounded block, as it must at scale (null-heavy keys are a skew bomb
# under <=>; production fix is routing nulls to a surrogate key).
_NULL_SAFE_ORACLE = """
WITH c AS (
  SELECT CASE WHEN c_custkey % 97 = 0 THEN NULL ELSE c_custkey END AS k,
         c_name
  FROM customer WHERE c_custkey % 3 = 0
),
o AS (
  SELECT CASE WHEN o_custkey % 193 = 0 THEN NULL ELSE o_custkey END AS k,
         o_orderkey
  FROM orders WHERE o_orderkey % 50 = 0
)
SELECT o.o_orderkey, c.k AS cust_k, c.c_name
FROM o JOIN c ON o.k IS NOT DISTINCT FROM c.k
"""


@register("join_null_safe", oracle=_NULL_SAFE_ORACLE)
def join_null_safe(spark: SparkSession, sf_dir: str) -> DataFrame:
    """Null-safe equi join via <=>: rows whose keys are BOTH NULL pair
    up (plain = drops them — three-valued logic). Catalyst treats <=>
    as an equi-join key (null hashes to a bucket like any value), so
    the plan is still a hash join, not a nested loop — but every NULL
    row lands in ONE bucket, which is why the fixture keeps nulls rare
    and why, at 100 TB, nullable business keys get a surrogate before
    the join (the same skew discipline as join_skew_salted)."""
    c = (
        table(spark, sf_dir, "customer")
        .filter(F.col("c_custkey") % 3 == 0)
        .select(
            F.when(F.col("c_custkey") % 97 == 0, None)
            .otherwise(F.col("c_custkey"))
            .alias("ck"),
            "c_name",
        )
    )
    o = (
        table(spark, sf_dir, "orders")
        .filter(F.col("o_orderkey") % 50 == 0)
        .select(
            F.when(F.col("o_custkey") % 193 == 0, None)
            .otherwise(F.col("o_custkey"))
            .alias("ok"),
            "o_orderkey",
        )
    )
    return o.join(c, o["ok"].eqNullSafe(c["ck"])).select(
        "o_orderkey", F.col("ck").alias("cust_k"), "c_name"
    )
