"""Scalar function families (SURVEY.md §2.B7).

Reference ties: `round(price, 2)` is the generator's price rounding
(StockTradeGenerator.java:70, A3); `format_string` is the display
projection `"ID %d: %s %d shares of %s for $%.02f"` (StockTrade.java:81-86,
A13) and the consumer's `"Seq No: {seq} - {payload}"` line
(KinesisSync.java:121, A12); the JSON family generalizes the lenient
Jackson wire format (StockTrade.java:65-79, A5/A6).

All functions are JVM-side Catalyst expressions inside whole-stage codegen
— zero Python boundary, so per-row cost is identical at any scale.

Cross-engine notes baked into the queries:
* `%.2f` formatting is only applied to 2-decimal-clean doubles (exact —
  no rounding-mode divergence between Java's Formatter and DuckDB's printf);
* double→int casts truncate in Spark but round in DuckDB → oracle uses
  CAST(trunc(x)) to pin truncation semantics;
* transcendentals (ln/log10) can differ by 1 ulp between libm
  implementations → results rounded to 9 decimals on both sides.
"""

from __future__ import annotations

from pyspark.sql import DataFrame, SparkSession
from pyspark.sql import functions as F

from kinesis_datastore_app_spark.catalog import table
from kinesis_datastore_app_spark.registry import register

_STRING_ORACLE = """
SELECT c_custkey,
       upper(c_name) AS name_uc,
       lower(c_mktsegment) AS seg_lc,
       substring(c_name, 1, 8) AS name_prefix,
       concat_ws('|', c_mktsegment, c_name) AS tagged,
       length(c_name) AS name_len,
       trim(concat('  ', c_name, ' ')) AS name_trimmed,
       regexp_extract(c_name, '([0-9]+)', 1) AS name_digits,
       replace(c_name, 'Customer', 'Cust') AS name_short,
       printf('ID %d: %s', c_custkey, c_mktsegment) AS display
FROM customer
"""


@register("fn_string", oracle=_STRING_ORACLE)
def fn_string(spark: SparkSession, sf_dir: str) -> DataFrame:
    """String family incl. the A13-style printf display projection."""
    c = table(spark, sf_dir, "customer")
    return c.select(
        "c_custkey",
        F.upper("c_name").alias("name_uc"),
        F.lower("c_mktsegment").alias("seg_lc"),
        F.substring("c_name", 1, 8).alias("name_prefix"),
        F.concat_ws("|", "c_mktsegment", "c_name").alias("tagged"),
        F.length("c_name").alias("name_len"),
        F.trim(F.concat(F.lit("  "), F.col("c_name"), F.lit(" "))).alias("name_trimmed"),
        F.regexp_extract("c_name", "([0-9]+)", 1).alias("name_digits"),
        F.replace(F.col("c_name"), F.lit("Customer"), F.lit("Cust")).alias("name_short"),
        F.format_string("ID %d: %s", "c_custkey", "c_mktsegment").alias("display"),
    )


_TRADE_DISPLAY_ORACLE = """
SELECT l_orderkey, l_linenumber,
       printf('ID %d: %s %d shares for $%.2f',
              l_orderkey, l_returnflag, CAST(trunc(l_quantity) AS BIGINT),
              l_extendedprice) AS display
FROM lineitem
WHERE l_orderkey % 50 = 0
"""


@register("fn_display_projection", oracle=_TRADE_DISPLAY_ORACLE)
def fn_display_projection(spark: SparkSession, sf_dir: str) -> DataFrame:
    """The reference's StockTrade.toString projection (StockTrade.java:
    81-86): `ID %d: %s %d shares of %s for $%.02f`, re-expressed over the
    fixture fact table. %.2f on 2-decimal-clean doubles is exact."""
    l = table(spark, sf_dir, "lineitem")
    return l.filter(F.col("l_orderkey") % 50 == 0).select(
        "l_orderkey",
        "l_linenumber",
        F.format_string(
            "ID %d: %s %d shares for $%.2f",
            "l_orderkey",
            "l_returnflag",
            F.col("l_quantity").cast("bigint"),
            "l_extendedprice",
        ).alias("display"),
    )


_DATE_ORACLE = """
SELECT o_orderkey,
       CAST(year(o_orderdate) AS INT) AS yr,
       CAST(month(o_orderdate) AS INT) AS mo,
       CAST(day(o_orderdate) AS INT) AS dom,
       date_trunc('month', o_orderdate) AS month_start,
       CAST(CAST(o_orderdate AS DATE) + 30 AS VARCHAR) AS plus_30d,
       CAST(date_diff('day', TIMESTAMP '1995-01-01 00:00:00', o_orderdate) AS INT)
         AS days_since_95,
       CAST(floor(epoch(o_orderdate)) AS BIGINT) AS unix_sec
FROM orders
"""


@register("fn_date", oracle=_DATE_ORACLE)
def fn_date(spark: SparkSession, sf_dir: str) -> DataFrame:
    """Date/time family: extract, trunc, arithmetic, epoch."""
    o = table(spark, sf_dir, "orders")
    return o.select(
        "o_orderkey",
        F.year("o_orderdate").alias("yr"),
        F.month("o_orderdate").alias("mo"),
        F.dayofmonth("o_orderdate").alias("dom"),
        F.date_trunc("month", F.col("o_orderdate")).alias("month_start"),
        # DATE values normalize differently between the two engines'
        # pandas bridges → ship dates as ISO strings in compared outputs.
        F.date_add(F.col("o_orderdate").cast("date"), 30).cast("string").alias("plus_30d"),
        F.datediff(F.col("o_orderdate"), F.lit("1995-01-01").cast("timestamp")).alias(
            "days_since_95"
        ),
        F.unix_timestamp("o_orderdate").alias("unix_sec"),
    )


_MATH_ORACLE = """
SELECT event_id,
       round(value, 0) AS val_round0,
       abs(value - 100) AS dist_100,
       CAST(ceil(value) AS BIGINT) AS val_ceil,
       CAST(floor(value) AS BIGINT) AS val_floor,
       round(ln(value + 1), 9) AS val_ln,
       round(log10(value + 1), 9) AS val_log10,
       sqrt(value) AS val_sqrt,
       power(CAST(user_id % 10 AS DOUBLE), 2) AS uid_sq,
       CAST(user_id % 7 AS BIGINT) AS uid_mod
FROM events
"""


@register("fn_math", oracle=_MATH_ORACLE)
def fn_math(spark: SparkSession, sf_dir: str) -> DataFrame:
    """Math family incl. the generator's HALF_UP rounding (A3). sqrt is
    IEEE-exact; ln/log10 rounded to absorb libm ulp differences."""
    e = table(spark, sf_dir, "events")
    v = F.col("value")
    return e.select(
        "event_id",
        F.round(v, 0).alias("val_round0"),
        F.abs(v - 100).alias("dist_100"),
        F.ceil(v).alias("val_ceil"),
        F.floor(v).alias("val_floor"),
        F.round(F.log(v + 1), 9).alias("val_ln"),
        F.round(F.log10(v + 1), 9).alias("val_log10"),
        F.sqrt(v).alias("val_sqrt"),
        F.pow(F.col("user_id") % 10, 2).alias("uid_sq"),
        (F.col("user_id") % 7).alias("uid_mod"),
    )


_COND_ORACLE = """
SELECT o_orderkey,
       CASE WHEN o_totalprice > 300000 THEN 'big'
            WHEN o_totalprice > 100000 THEN 'mid'
            ELSE 'small' END AS size_bucket,
       coalesce(NULLIF(o_orderstatus, 'O'), 'OPEN') AS status_label,
       NULLIF(o_orderpriority, '3-MEDIUM') AS prio_or_null,
       CASE WHEN o_orderkey % 2 = 0 THEN o_totalprice ELSE 0.0 END AS even_price
FROM orders
"""


@register("fn_cond", oracle=_COND_ORACLE)
def fn_cond(spark: SparkSession, sf_dir: str) -> DataFrame:
    """CASE / coalesce / nullif conditional family."""
    o = table(spark, sf_dir, "orders")
    tp = F.col("o_totalprice")
    return o.select(
        "o_orderkey",
        F.when(tp > 300000, "big").when(tp > 100000, "mid").otherwise("small").alias(
            "size_bucket"
        ),
        F.coalesce(F.nullif(F.col("o_orderstatus"), F.lit("O")), F.lit("OPEN")).alias(
            "status_label"
        ),
        F.nullif(F.col("o_orderpriority"), F.lit("3-MEDIUM")).alias("prio_or_null"),
        F.when(F.col("o_orderkey") % 2 == 0, tp).otherwise(F.lit(0.0)).alias("even_price"),
    )


_ARRAY_ORACLE = """
SELECT doc_id,
       len(string_split(text, ' ')) AS n_tokens,
       string_split(text, ' ')[1] AS first_token,
       list_contains(string_split(text, ' '), 'data') AS has_data,
       array_to_string(list_sort(list_distinct(string_split(text, ' ')[1:4])), ',')
         AS first4_sorted
FROM documents
"""


@register("fn_array", oracle=_ARRAY_ORACLE)
def fn_array(spark: SparkSession, sf_dir: str) -> DataFrame:
    """Array family over tokenized text (split/size/element/contains/
    slice/dedup/sort) — the building blocks for llm/ text operators."""
    d = table(spark, sf_dir, "documents")
    toks = F.split(F.col("text"), " ")
    return d.select(
        "doc_id",
        F.size(toks).alias("n_tokens"),
        F.element_at(toks, 1).alias("first_token"),
        F.array_contains(toks, "data").alias("has_data"),
        F.array_join(F.sort_array(F.array_distinct(F.slice(toks, 1, 4))), ",").alias(
            "first4_sorted"
        ),
    )


_MAP_ORACLE = """
SELECT event_id,
       map_extract(map(['type', 'uid'], [event_type, CAST(user_id AS VARCHAR)]),
                   'type')[1] AS m_type,
       array_to_string(map_keys(map(['type', 'uid'],
                                    [event_type, CAST(user_id AS VARCHAR)])), ',')
         AS m_keys
FROM events
WHERE event_id % 13 = 0
"""


@register("fn_map", oracle=_MAP_ORACLE)
def fn_map(spark: SparkSession, sf_dir: str) -> DataFrame:
    """Map construction + key access + key enumeration."""
    e = table(spark, sf_dir, "events")
    m = F.create_map(
        F.lit("type"), F.col("event_type"), F.lit("uid"), F.col("user_id").cast("string")
    )
    return e.filter(F.col("event_id") % 13 == 0).select(
        "event_id",
        m.getItem("type").alias("m_type"),
        F.array_join(F.map_keys(m), ",").alias("m_keys"),
    )


_JSON_ORACLE = """
SELECT event_id,
       json_extract_string(props, '$.k') AS k_str,
       CASE WHEN regexp_matches(json_extract_string(props, '$.k'), '^-?[0-9]+$')
            THEN CAST(json_extract_string(props, '$.k') AS INT) END AS k_int,
       json_extract_string(props, '$.missing') AS missing_field,
       CASE WHEN json_valid('{"broken')
            THEN json_extract_string('{"broken', '$.k') END AS corrupt
FROM events
"""


@register("fn_json", oracle=_JSON_ORACLE)
def fn_json(spark: SparkSession, sf_dir: str) -> DataFrame:
    """JSON family — the reference's lenient wire format generalized
    (A5/A6): extraction, typed parse, missing field → null, corrupt
    payload → null (PERMISSIVE, matching FAIL_ON_UNKNOWN_PROPERTIES=false
    + try/catch-null decode, StockTrade.java:15-18,73-79)."""
    e = table(spark, sf_dir, "events")
    return e.select(
        "event_id",
        F.get_json_object("props", "$.k").alias("k_str"),
        F.from_json("props", "k INT").getItem("k").alias("k_int"),
        F.get_json_object("props", "$.missing").alias("missing_field"),
        F.get_json_object(F.lit('{"broken'), "$.k").alias("corrupt"),
    )


_CAST_ORACLE = """
SELECT event_id,
       CAST(event_id AS VARCHAR) AS id_str,
       CAST(trunc(value) AS INT) AS val_int,
       CAST(CAST(value AS DECIMAL(18,2)) AS VARCHAR) AS val_str,
       CAST(CAST(user_id AS SMALLINT) AS BIGINT) AS uid_small,
       hex(encode(event_type)) AS type_hex,
       decode(encode(event_type)) AS type_roundtrip,
       CAST(CAST(ts AS DATE) AS VARCHAR) AS ts_date
FROM events
WHERE event_id % 11 = 0
"""


@register("fn_cast", oracle=_CAST_ORACLE)
def fn_cast(spark: SparkSession, sf_dir: str) -> DataFrame:
    """Cast family incl. the binary↔string round-trip the reference's
    consumer does on every record (KinesisSync.java:120-121, A12)."""
    e = table(spark, sf_dir, "events")
    return e.filter(F.col("event_id") % 11 == 0).select(
        "event_id",
        F.col("event_id").cast("string").alias("id_str"),
        F.col("value").cast("int").alias("val_int"),
        # double→string rendering is engine-specific outside
        # [1e-3, 1e7) (Java scientific vs DuckDB positional), so the
        # string form goes through a fixed-scale decimal — the same
        # canonicalization fn_row_checksum documents
        F.col("value").cast("decimal(18,2)").cast("string").alias("val_str"),
        F.col("user_id").cast("smallint").cast("bigint").alias("uid_small"),
        # raw BINARY surfaces as bytes vs bytearray across the two pandas
        # bridges → compare hex instead (cast-to-binary still exercised)
        F.hex(F.col("event_type").cast("binary")).alias("type_hex"),
        F.col("event_type").cast("binary").cast("string").alias("type_roundtrip"),
        F.col("ts").cast("date").cast("string").alias("ts_date"),
    )


_BITWISE_ORACLE = """
SELECT o_orderkey,
       o_orderkey & 255 AS band,
       o_orderkey | 4096 AS ored,
       xor(o_orderkey, 1023) AS xored,
       o_orderkey << 2 AS shifted,
       o_orderkey >> 3 AS rshifted
FROM orders WHERE o_orderkey % 7 = 0
"""


@register("fn_bitwise", oracle=_BITWISE_ORACLE)
def fn_bitwise(spark: SparkSession, sf_dir: str) -> DataFrame:
    """Bitwise family (AND/OR/XOR/shifts) — the workhorse of hash
    bucketing, bloom/bitmap membership, and flag columns; pure codegen."""
    o = table(spark, sf_dir, "orders").filter(F.col("o_orderkey") % 7 == 0)
    k = F.col("o_orderkey")
    return o.select(
        "o_orderkey",
        k.bitwiseAND(F.lit(255)).alias("band"),
        k.bitwiseOR(F.lit(4096)).alias("ored"),
        k.bitwiseXOR(F.lit(1023)).alias("xored"),
        F.shiftleft(k, 2).alias("shifted"),
        F.shiftright(k, 3).alias("rshifted"),
    )


_STRUCT_ORACLE = """
SELECT n_nationkey,
       to_json(struct_pack(name := n_name, region := n_regionkey)) AS packed,
       n_name AS extracted_name
FROM nation
"""


@register("fn_struct", oracle=_STRUCT_ORACLE)
def fn_struct(spark: SparkSession, sf_dir: str) -> DataFrame:
    """Nested-struct family: struct construction, field extraction, and
    JSON rendering of the nested value — nested data is first-class
    columnar in Parquet/Tungsten (shredded per field, pruned per field)."""
    n = table(spark, sf_dir, "nation")
    packed = F.struct(
        F.col("n_name").alias("name"), F.col("n_regionkey").alias("region")
    )
    return n.select(
        "n_nationkey",
        F.to_json(packed).alias("packed"),
        packed.getField("name").alias("extracted_name"),
    )


_HASH_ORACLE = """
SELECT doc_id,
       md5(text) AS text_md5,
       sha256(text) AS text_sha256,
       md5(concat_ws('|', source, CAST(doc_id AS VARCHAR))) AS row_key
FROM documents
WHERE doc_id % 7 = 0
"""


@register("fn_hash", oracle=_HASH_ORACLE)
def fn_hash(spark: SparkSession, sf_dir: str) -> DataFrame:
    """Cryptographic-hash family: content checksums (md5/sha256 over the
    UTF-8 bytes) and a composite row key — the primitives behind content-
    addressed dedup (dedup_doc_exact) and stable shard assignment. Both
    engines hash the same UTF-8 byte sequence and render lowercase hex.
    Pure codegen projection: no shuffle, scales linearly."""
    d = table(spark, sf_dir, "documents").filter(F.col("doc_id") % 7 == 0)
    return d.select(
        "doc_id",
        F.md5(F.col("text").cast("binary")).alias("text_md5"),
        F.sha2(F.col("text").cast("binary"), 256).alias("text_sha256"),
        # concat_ws, not concat: plain concat is NULL-if-any-NULL in
        # Spark but NULL-skipping in DuckDB — concat_ws skips NULLs in
        # BOTH, pinning one cross-engine semantic for a nullable source
        F.md5(
            F.concat_ws("|", F.col("source"), F.col("doc_id").cast("string")).cast(
                "binary"
            )
        ).alias("row_key"),
    )


_TRIG_ORACLE = """
SELECT event_id,
       round(sin(value / 100), 9) AS sin_v,
       round(cos(value / 100), 9) AS cos_v,
       round(atan2(CAST(user_id % 10 AS DOUBLE), 3.0), 9) AS at2,
       round(degrees(value / 1000), 9) AS deg_v,
       round(exp(value / 1000), 9) AS exp_v
FROM events
WHERE event_id % 5 = 0
"""


@register("fn_trig", oracle=_TRIG_ORACLE)
def fn_trig(spark: SparkSession, sf_dir: str) -> DataFrame:
    """Trigonometric / transcendental family (sin, cos, atan2, degrees,
    exp). libm implementations may differ in the last ulp between engines,
    so every result is rounded to 9 dp (the fn_math ln/log10 discipline)."""
    e = table(spark, sf_dir, "events").filter(F.col("event_id") % 5 == 0)
    v = F.col("value")
    return e.select(
        "event_id",
        F.round(F.sin(v / 100), 9).alias("sin_v"),
        F.round(F.cos(v / 100), 9).alias("cos_v"),
        F.round(F.atan2((F.col("user_id") % 10).cast("double"), F.lit(3.0)), 9).alias("at2"),
        F.round(F.degrees(v / 1000), 9).alias("deg_v"),
        F.round(F.exp(v / 1000), 9).alias("exp_v"),
    )


_URL_ORACLE = """
WITH urls AS (
  SELECT doc_id,
         concat('https://', source, '.example.com/docs/', CAST(doc_id AS VARCHAR),
                '?lang=', lang, '&q=', CAST(doc_id % 13 AS VARCHAR)) AS url
  FROM documents
  WHERE doc_id % 11 = 0
)
SELECT doc_id,
       regexp_extract(url, '^https?://([^/]+)', 1) AS host,
       regexp_extract(url, '^https?://[^/]+(/[^?#]*)', 1) AS path,
       regexp_extract(url, '[?&]lang=([^&#]*)', 1) AS q_lang
FROM urls
"""


@register("fn_url", oracle=_URL_ORACLE)
def fn_url(spark: SparkSession, sf_dir: str) -> DataFrame:
    """URL parsing family (host/path/query-param extraction) via Spark's
    parse_url built-in; the oracle uses equivalent RE2 regexes (DuckDB
    has no parse_url). URLs are synthesized deterministically from
    URL-safe fixture columns, so built-in and regex semantics coincide.
    The crawl-corpus use case: domain bucketing and per-site quotas in a
    curation pipeline. Pure codegen projection — no shuffle."""
    d = table(spark, sf_dir, "documents").filter(F.col("doc_id") % 11 == 0)
    url = F.concat(
        F.lit("https://"),
        F.col("source"),
        F.lit(".example.com/docs/"),
        F.col("doc_id").cast("string"),
        F.lit("?lang="),
        F.col("lang"),
        F.lit("&q="),
        (F.col("doc_id") % 13).cast("string"),
    )
    u = d.select("doc_id", url.alias("url"))
    return u.select(
        "doc_id",
        F.parse_url(F.col("url"), F.lit("HOST")).alias("host"),
        F.parse_url(F.col("url"), F.lit("PATH")).alias("path"),
        F.parse_url(F.col("url"), F.lit("QUERY"), F.lit("lang")).alias("q_lang"),
    )


_TZ_ORACLE = """
WITH e AS (
  SELECT event_id, ts, ts + INTERVAL 182 DAY AS ts_jul,
         timezone('America/New_York', timezone('UTC', ts)) AS ny,
         timezone('Asia/Tokyo', timezone('UTC', ts)) AS tokyo,
         timezone('America/New_York',
                  timezone('UTC', ts + INTERVAL 182 DAY)) AS ny_jul
  FROM events WHERE event_id % 5 = 0
)
SELECT event_id,
       strftime(ny, '%Y-%m-%d %H:%M:%S') AS ny_local,
       strftime(tokyo, '%Y-%m-%d %H:%M:%S') AS tokyo_local,
       CAST(hour(ny) AS INT) AS ny_hour,
       CAST((epoch(ny) - epoch(ts)) / 3600 AS INT) AS ny_offset_h,
       CAST(epoch(ny) - epoch(ts) = -14400 AS BOOLEAN) AS ny_is_dst,
       CAST(epoch(ny_jul) - epoch(ts_jul) = -14400 AS BOOLEAN) AS ny_is_dst_jul
FROM e
"""


@register("fn_timezone", oracle=_TZ_ORACLE)
def fn_timezone(spark: SparkSession, sf_dir: str) -> DataFrame:
    """Timezone family: UTC→zone wall-clock conversion, zone-local
    extraction, and UTC-offset / DST detection — the dashboard
    "report in the viewer's zone" layer over an engine that stores
    all event time as UTC instants. Both engines resolve offsets from
    the same IANA tzdb, so DST transition rows agree. Output pinned to
    strings/ints (never raw shifted timestamps) so rendering is
    session-timezone-independent; the shift itself is
    `from_utc_timestamp`, a codegen'd expression.

    The fixture's events all fall in January (EST), which would leave
    the DST branch constant-false and therefore unverified — so a
    182-day-shifted twin (July, EDT) exercises the TRUE branch: a wrong
    offset constant or shift sign now fails the oracle instead of
    shipping verified-green."""
    e = table(spark, sf_dir, "events").filter(F.col("event_id") % 5 == 0)
    ny = F.from_utc_timestamp(F.col("ts"), "America/New_York")
    tokyo = F.from_utc_timestamp(F.col("ts"), "Asia/Tokyo")
    ts_jul = F.col("ts") + F.expr("INTERVAL 182 DAYS")
    ny_jul = F.from_utc_timestamp(ts_jul, "America/New_York")
    shift = ny.cast("long") - F.col("ts").cast("long")
    shift_jul = ny_jul.cast("long") - ts_jul.cast("long")
    return e.select(
        "event_id",
        F.date_format(ny, "yyyy-MM-dd HH:mm:ss").alias("ny_local"),
        F.date_format(tokyo, "yyyy-MM-dd HH:mm:ss").alias("tokyo_local"),
        F.hour(ny).alias("ny_hour"),
        (shift / 3600).cast("int").alias("ny_offset_h"),
        (shift == -14400).alias("ny_is_dst"),
        (shift_jul == -14400).alias("ny_is_dst_jul"),
    )


_GENERATOR_ORACLE = """
WITH t AS (
  SELECT c_custkey, string_split(c_name, '#') AS parts
  FROM customer WHERE c_custkey % 10 = 2
)
SELECT c_custkey,
       CAST(generate_subscripts(parts, 1) - 1 AS INT) AS pos,
       unnest(parts) AS part,
       CAST(len(parts) AS INT) AS n_parts
FROM t
"""


@register("fn_generator", oracle=_GENERATOR_ORACLE)
def fn_generator(spark: SparkSession, sf_dir: str) -> DataFrame:
    """Generator (table-valued projection) family: posexplode flattens
    an array column to one row per element WITH its 0-based position —
    the order-preserving flatten that tokenization, shingling, and
    frame-sampling all build on (plain explode loses position). Spark
    runs Generate inside whole-stage codegen: no shuffle, output rows
    stream from the scan. Oracle: DuckDB's zipped unnest +
    generate_subscripts."""
    c = table(spark, sf_dir, "customer").filter(F.col("c_custkey") % 10 == 2)
    parts = F.split(F.col("c_name"), "#")
    return c.select("c_custkey", parts.alias("parts")).select(
        "c_custkey",
        F.posexplode("parts").alias("pos", "part"),
        F.size("parts").alias("n_parts"),
    )


# Regexp family beyond fn_string's single extract: full-match test,
# global replace, extract-all + count. Patterns stay inside the
# character-class/anchor/alternation subset where Java regex (Spark)
# and RE2 (DuckDB) agree.
_REGEXP_ORACLE = """
SELECT event_id,
       TRY_CAST(NULLIF(regexp_extract(props, '[0-9]+'), '') AS INT) AS k_digits,
       regexp_matches(event_type, '^(click|view)$') AS is_impression,
       regexp_replace(event_type, '[aeiou]', '*', 'g') AS masked_type,
       CAST(len(regexp_extract_all(props, '[0-9]')) AS INT) AS n_digit_chars
FROM events
WHERE event_id % 11 = 0
"""


@register("fn_regexp", oracle=_REGEXP_ORACLE)
def fn_regexp(spark: SparkSession, sf_dir: str) -> DataFrame:
    """Regular-expression functions: extract (typed), boolean match,
    global replace, extract-all with count. All four compile once per
    task and evaluate inside whole-stage codegen — regexp over a column
    is scan-speed, not UDF-speed. Engine-parity notes: Spark's
    regexp_replace is global by default (DuckDB needs the 'g' flag);
    rlike is a substring match, so the full-match test anchors with
    ^...$ explicitly."""
    e = table(spark, sf_dir, "events").filter(F.col("event_id") % 11 == 0)
    return e.select(
        "event_id",
        # try_cast: ANSI-mode Spark (4.x default) THROWS on CAST('' AS
        # INT), so a digit-free props row must map to NULL, not error
        F.regexp_extract("props", "[0-9]+", 0).try_cast("int").alias("k_digits"),
        F.col("event_type").rlike("^(click|view)$").alias("is_impression"),
        F.regexp_replace("event_type", "[aeiou]", "*").alias("masked_type"),
        F.size(F.expr("regexp_extract_all(props, '[0-9]', 0)")).alias(
            "n_digit_chars"
        ),
    )


# Spark 4 VARIANT: the open-ended semi-structured type (binary-encoded
# JSON with typed paths) — the modern replacement for stringly-typed
# get_json_object chains. The oracle reproduces the typed extractions
# with DuckDB's JSON operators; outputs are plain typed columns so the
# comparison is representation-independent.
_VARIANT_ORACLE = """
SELECT event_id,
       TRY_CAST(json_extract_string(props, '$.k') AS BIGINT) AS k_int,
       CAST(TRY_CAST(json_extract_string(props, '$.k') AS BIGINT) IS NOT NULL
            AS BOOLEAN) AS has_k,
       TRY_CAST(json_extract_string(props, '$.missing') AS BIGINT) AS missing_path
FROM events
WHERE event_id % 13 = 0
"""


@register("fn_variant", oracle=_VARIANT_ORACLE)
def fn_variant(spark: SparkSession, sf_dir: str) -> DataFrame:
    """VARIANT ingestion + typed path extraction: parse_json once into
    the binary VARIANT encoding, then variant_get with target types —
    missing paths surface as typed NULLs, not errors. At 100 TB the win
    over JSON strings is decode-once/extract-many (VARIANT fields are
    offset-indexed, not re-parsed per extraction) and columnar-friendly
    shredding; the plan is still a pure codegen projection."""
    e = table(spark, sf_dir, "events").filter(F.col("event_id") % 13 == 0)
    v = F.parse_json("props")
    return e.select(
        "event_id",
        F.try_variant_get(v, "$.k", "bigint").alias("k_int"),
        F.try_variant_get(v, "$.k", "bigint").isNotNull().alias("has_k"),
        F.try_variant_get(v, "$.missing", "bigint").alias("missing_path"),
    )


# Binary serialization family: base64 / hex encode-decode roundtrips —
# the wire-format helpers every envelope codec leans on (the reference
# moves its JSON payloads through exactly this base64 path inside the
# AWS SDK; trades/wire.py does it with Spark's own codecs).
_ENCODE_ORACLE = """
SELECT event_id,
       base64(CAST(event_type AS BLOB)) AS b64,
       to_hex(CAST(event_type AS BLOB)) AS hx,
       CAST(from_base64(base64(CAST(event_type AS BLOB))) AS VARCHAR)
         AS b64_roundtrip,
       octet_length(CAST(event_type AS BLOB)) AS n_bytes
FROM events WHERE event_id % 17 = 0
"""


@register("fn_encode", oracle=_ENCODE_ORACLE)
def fn_encode(spark: SparkSession, sf_dir: str) -> DataFrame:
    """Base64/hex encode-decode roundtrips over binary payloads — the
    envelope-codec helpers (A5/A6's wire path uses base64 under the
    SDK). All codegen string/binary expressions; the roundtrip column
    proves decode(encode(x)) == x inside the query itself. Hex case
    differs between engines (Spark upper, DuckDB upper via to_hex —
    both uppercase) and base64 padding/alphabet is RFC 4648 in both."""
    e = table(spark, sf_dir, "events").filter(F.col("event_id") % 17 == 0)
    b = F.col("event_type").cast("binary")
    return e.select(
        "event_id",
        F.base64(b).alias("b64"),
        F.hex(b).alias("hx"),
        F.unbase64(F.base64(b)).cast("string").alias("b64_roundtrip"),
        F.length(b).alias("n_bytes"),
    )


# Array set algebra over token arrays — union/intersect/except with
# sorted-deduped rendering, since the engines' native element ORDER
# differs (Spark preserves first-argument order, DuckDB its own);
# set semantics are order-free, so both sides sort before comparing.
_ARRAY_SET_ORACLE = """
WITH p AS (
  SELECT e1.event_id,
         string_split(e1.event_type, '') AS a,
         string_split(e2.event_type, '') AS b
  FROM events e1 JOIN events e2 ON e2.event_id = e1.event_id + 1
  WHERE e1.event_id % 19 = 0
)
SELECT event_id,
       COALESCE(array_to_string(list_sort(list_distinct(list_cat(a, b))), ''), '')
         AS set_union,
       COALESCE(array_to_string(list_sort(list_distinct(
           list_filter(a, x -> list_contains(b, x)))), ''), '') AS set_intersect,
       COALESCE(array_to_string(list_sort(list_distinct(
           list_filter(a, x -> NOT list_contains(b, x)))), ''), '') AS set_except,
       CAST(len(list_distinct(list_cat(a, b))) AS INT) AS n_union
FROM p
"""


@register("fn_array_set", oracle=_ARRAY_SET_ORACLE)
def fn_array_set(spark: SparkSession, sf_dir: str) -> DataFrame:
    """Array set algebra (union / intersect / except over character
    sets of adjacent events' type strings): the element-level dual of
    the relational set ops in operators/setops.py. Native
    array_union/intersect/except are used, then sorted — their element
    order is engine-defined while SET equality is not, so the rendered
    form is canonical. All codegen array expressions."""
    e = table(spark, sf_dir, "events")
    e1 = e.filter(F.col("event_id") % 19 == 0).select(
        "event_id", F.split("event_type", "").alias("a")
    )
    # pre-filter the build side to the ids that can match (id-1 ≡ 0
    # mod 19): without it every events row is split and shuffled to
    # satisfy 1/19th of the joins
    e2 = e.filter((F.col("event_id") - 1) % 19 == 0).select(
        (F.col("event_id") - 1).alias("event_id"), F.split("event_type", "").alias("b")
    )
    p = e1.join(e2, "event_id")
    a, b = F.col("a"), F.col("b")
    # array_union/intersect/except already return distinct elements —
    # only sort + render needed (the DuckDB side genuinely needs
    # list_distinct over its list_cat/list_filter formulation)
    return p.select(
        "event_id",
        F.array_join(F.array_sort(F.array_union(a, b)), "").alias("set_union"),
        F.array_join(F.array_sort(F.array_intersect(a, b)), "").alias(
            "set_intersect"
        ),
        F.array_join(F.array_sort(F.array_except(a, b)), "").alias("set_except"),
        F.size(F.array_union(a, b)).alias("n_union"),
    )


# Row-content checksum: the change-detection fingerprint CDC diffing
# and snapshot reconciliation key on (same row bytes -> same digest,
# any field change -> new digest). Null-safe field rendering is the
# subtle part — NULL and '' must not collide.
_ROW_CHECKSUM_ORACLE = """
SELECT event_id,
       md5(concat_ws('|',
           COALESCE(CAST(event_id AS VARCHAR), chr(1)),
           COALESCE(CAST(user_id AS VARCHAR), chr(1)),
           COALESCE(event_type, chr(1)),
           COALESCE(CAST(CAST(value AS DECIMAL(18,2)) AS VARCHAR), chr(1)),
           COALESCE(props, chr(1)))) AS row_digest
FROM events WHERE event_id % 23 = 0
"""


@register("fn_row_checksum", oracle=_ROW_CHECKSUM_ORACLE)
def fn_row_checksum(spark: SparkSession, sf_dir: str) -> DataFrame:
    """Deterministic row fingerprint: md5 over a canonical '|'-joined
    rendering of every business column — the digest two snapshots are
    diffed on (join on key, compare digests; unequal = changed row)
    without comparing N columns. Canonicalization rules that make it
    portable: floats render through a fixed-scale decimal (raw double
    formatting differs across engines), EVERY field coalesces NULL to a
    sentinel no real value contains (chr(1)) — concat_ws silently skips
    NULL arguments in both engines, so an uncoalesced NULL would drop
    the field AND its separator and let field-shifted rows collide on
    one digest — and the separator is fixed. Pure codegen —
    fingerprinting 100 TB rides the scan."""
    e = table(spark, sf_dir, "events").filter(F.col("event_id") % 23 == 0)
    sentinel = F.expr("char(1)")
    rendered = F.concat_ws(
        "|",
        F.coalesce(F.col("event_id").cast("string"), sentinel),
        F.coalesce(F.col("user_id").cast("string"), sentinel),
        F.coalesce(F.col("event_type"), sentinel),
        F.coalesce(F.col("value").cast("decimal(18,2)").cast("string"), sentinel),
        F.coalesce(F.col("props"), sentinel),
    )
    return e.select(
        "event_id", F.md5(rendered.cast("binary")).alias("row_digest")
    )
