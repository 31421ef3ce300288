"""Change-data-feed STREAM source: the txn log consumed as a stream.

The round-11 txnlog work gives tables versions, a change feed between
any two versions (operators/cdc.read_table_changes), and consumers
that apply feeds incrementally. This module adds the last consumption
mode a lakehouse table supports: ``readStream`` FROM the table — the
"Delta table as a streaming source" shape — built on the same Python
DataSource API as the Kinesis connector (sources/kinesis_sim.py):

* OFFSETS ARE VERSIONS: ``initialOffset`` = the consumer's start
  version, ``latestOffset`` pages one version step per micro-batch
  (``versions_per_batch``), so each batch is exactly the feed
  v → v+1 — the incremental-consumer cadence, with Spark's offset
  log making restarts resume at the right version;
* PARTITIONS fan out per (version step, key bucket): every task
  diffs its own stable-hash bucket of the two snapshots, so change
  rows are partition-disjoint and the diff parallelizes. Locally each
  task reads both snapshot dirs and filters to its bucket; under a
  key-bucketed snapshot layout (the cdc_merge_batch bucket scheme)
  the same partition unit maps 1:1 to bucket FILES and each task
  reads only its slice — the production shape;
* the emitted rows carry the same before/after/change_type contract
  as read_table_changes plus the step's end ``version`` column, so a
  downstream ``foreachBatch`` can apply them with cdc.apply_feed.

Reference tie: this is A10's TRIM_HORIZON scan (KinesisSync.java:
94-101) lifted from a record stream to a TABLE's change history —
start at the oldest retained version, page forward in bounded batches,
never lose or duplicate a change across batch boundaries (the oracle
proves stream-total equals the batch union of the per-step feeds).

Worker-side reads use pyarrow + pandas directly (a Python DataSource
partition read runs without a SparkSession); the per-bucket frames are
bounded by bucket sizing exactly as cdc_merge_batch's are.
"""

from __future__ import annotations

from pyspark.sql import DataFrame, SparkSession
from pyspark.sql.datasource import (
    DataSource,
    DataSourceStreamReader,
    InputPartition,
)

from kinesis_datastore_app_spark.registry import register


def _parse_cols(spec: str) -> list[tuple[str, str]]:
    """'a:bigint,b:string' -> [('a','bigint'), ('b','string')]."""
    out = []
    for part in spec.split(","):
        name, typ = part.strip().split(":")
        out.append((name, typ))
    return out


def _bucket_series(df, keys: list[str], n_buckets: int):
    """Stable per-row bucket ids for the key columns — vectorized
    ``pd.util.hash_pandas_object`` (fixed hash key, deterministic
    across processes — never Python hash(), which is salted) over
    dtype-NORMALIZED keys, so physical dtype (int64 vs nullable vs
    arrow-backed) can never change a key's bucket between the two
    snapshot sides of a step (round-11 review). Normalization is
    vectorized: integer/float keys drop to plain numpy int64/float64
    (no per-row int→str — the first stringify-everything fix cost ~25%
    of the 16× probe wall); everything else stringifies. The
    consistency requirement is that every task of one step runs the
    same pandas build — which Spark's single shipped Python environment
    gives; a rolling-upgrade cluster mixing pandas versions must pin
    them (same caveat as any cross-executor Arrow/pandas contract)."""
    import numpy as np
    import pandas as pd

    norm = {}
    for k in keys:
        s = df[k]
        try:
            if pd.api.types.is_integer_dtype(s.dtype):
                norm[k] = pd.Series(
                    s.to_numpy(dtype="int64", na_value=np.iinfo("int64").min),
                    index=s.index,
                )
                continue
            if pd.api.types.is_float_dtype(s.dtype):
                norm[k] = pd.Series(
                    s.to_numpy(dtype="float64", na_value=np.nan), index=s.index
                )
                continue
        except (TypeError, ValueError):
            pass  # unrepresentable (e.g. overflow) → string form below
    # any column not normalized numerically falls back to its string form
    frame = pd.DataFrame(
        {k: norm.get(k, df[k].astype(str)) for k in keys}
    )
    return pd.util.hash_pandas_object(frame, index=False) % n_buckets


def _load_snapshot(root: str, version: int):
    """(pandas frame | None) of one version's snapshot — plain file
    reads through txnlog's own read_version/snapshot_path (one
    definition of the log layout — round-11 review: a local re-spelling
    of the _txn/v{N}.json naming would silently break this source on
    any txnlog format change; txnlog is stdlib-only, so it imports in a
    worker). None = empty-table version.

    ``types_mapper=pd.ArrowDtype`` keeps integer columns NULLABLE
    (round-11 review: the default to_pandas coerces an int64 column
    containing any NULL — exactly the schema-evolution case this
    module supports — to float64, where values above 2^53 round and a
    real change can digest equal / phantom updates appear); elements
    then surface as exact Python scalars or pd.NA."""
    import pandas as pd
    import pyarrow.parquet as papq

    from kinesis_datastore_app_spark.txnlog import read_version, snapshot_path

    snap = snapshot_path(root, read_version(root, version))
    if snap is None:
        return None
    return papq.read_table(snap).to_pandas(types_mapper=pd.ArrowDtype)


def _diff_rows(root, v_from, v_to, keys, vals, bucket, n_buckets):
    """Yield change rows for one (version step, bucket): the same
    classification contract as cdc.read_table_changes — insert/delete/
    update by key presence and value equality, unchanged skipped —
    computed per-bucket in pandas. Fully VECTORIZED (round-11 probe:
    the first per-row-loop form read exponent 0.729 at 16× because
    Python touched every unchanged row; the outer merge + vectorized
    compare below classifies columnar and only the change subset ever
    reaches a Python loop). Value columns absent on one side (schema
    evolution) read as all-NULL, mirroring _null_pad_evolved; NULL
    semantics: both-null compares equal, null-vs-value is a change."""
    import pandas as pd

    def side(version, other=None):
        df = _load_snapshot(root, version)
        if df is None:
            # empty-table version: zero rows with the other side's
            # columns (there is always at least one non-empty side in a
            # committed step, else there'd be nothing to diff)
            df = other.iloc[0:0] if other is not None else pd.DataFrame(
                columns=[*keys, *vals]
            )
        for v in vals:
            if v not in df.columns:
                df = df.assign(**{v: pd.NA})
        df = df[[*keys, *vals]]
        return df[_bucket_series(df, keys, n_buckets) == bucket]

    a = side(v_from)
    b = side(v_to, other=a)
    m = a.merge(
        b, on=keys, how="outer", suffixes=("_before", "_after"), indicator=True
    )
    def missing(s):
        # NULL or NaN: ArrowDtype floats report NaN as a VALUE (isna
        # False) while NaN != NaN — without folding NaN into "missing",
        # two identical NaN-bearing snapshots emitted a phantom update
        # every step (round-11 review), diverging from the batch feed's
        # digest (which renders NaN identically on both sides)
        m_na = s.isna()
        try:
            m_nan = pd.Series(s != s, index=s.index).fillna(False).astype(bool)
        except TypeError:
            m_nan = pd.Series(False, index=s.index)
        return m_na | m_nan

    neq = pd.Series(False, index=m.index)
    for v in vals:
        x, y = m[f"{v}_before"], m[f"{v}_after"]
        both_na = missing(x) & missing(y)
        eq = pd.Series((x == y), index=m.index).fillna(False).astype(bool)
        neq |= ~(both_na | eq)
    change = pd.Series("update", index=m.index)
    change[m["_merge"] == "left_only"] = "delete"
    change[m["_merge"] == "right_only"] = "insert"
    changed = m[(m["_merge"] != "both") | neq]
    cols = (
        [*keys]
        + [f"{v}_before" for v in vals]
        + [f"{v}_after" for v in vals]
    )
    out = changed[cols]
    labels = change[changed.index]
    for t, lab in zip(out.itertuples(index=False), labels):
        yield tuple(
            [None if pd.isna(x) else x for x in t] + [lab, v_to]
        )


class _VersionStepBucket(InputPartition):
    def __init__(self, root, v_from, v_to, keys, vals, bucket, n_buckets):
        self.root, self.v_from, self.v_to = root, v_from, v_to
        self.keys, self.vals = keys, vals
        self.bucket, self.n_buckets = bucket, n_buckets


class _CdfStreamReader(DataSourceStreamReader):
    """Version-offset stream reader; see module docstring."""

    def __init__(self, options):
        self.root = options["path"]
        self.keys = [n for n, _ in _parse_cols(options["keys"])]
        self.vals = [n for n, _ in _parse_cols(options["vals"])]
        self.start_version = int(options.get("start_version", 1))
        self.per_batch = int(options.get("versions_per_batch", 1))
        self.n_buckets = int(options.get("buckets", 4))

    def _log_latest(self) -> int:
        # txnlog's own version scan — one definition of the log layout
        from kinesis_datastore_app_spark.txnlog import read_latest

        return read_latest(self.root)[0]

    def initialOffset(self) -> dict:
        self._latest = self.start_version
        return {"version": self.start_version}

    def latestOffset(self) -> dict:
        # page versions_per_batch steps per trigger, never past the log
        self._latest = min(
            getattr(self, "_latest", self.start_version) + self.per_batch,
            max(self._log_latest(), self.start_version),
        )
        return {"version": self._latest}

    def partitions(self, start: dict, end: dict):
        lo, hi = start["version"], end["version"]
        # restart ratchet (same contract as the Kinesis sim reader):
        # a checkpoint-restored replay must not advertise an end < the
        # committed start on the next latestOffset
        self._latest = max(getattr(self, "_latest", lo), hi)
        return [
            _VersionStepBucket(
                self.root, v, v + 1, self.keys, self.vals, b, self.n_buckets
            )
            for v in range(lo, hi)
            for b in range(self.n_buckets)
        ]

    def read(self, partition: _VersionStepBucket):
        yield from _diff_rows(
            partition.root,
            partition.v_from,
            partition.v_to,
            partition.keys,
            partition.vals,
            partition.bucket,
            partition.n_buckets,
        )

    def commit(self, end: dict) -> None:
        self._latest = max(getattr(self, "_latest", 0), end["version"])


class CdfStreamDataSource(DataSource):
    @classmethod
    def name(cls) -> str:
        return "cdf_stream"

    def schema(self) -> str:
        keys = _parse_cols(self.options["keys"])
        vals = _parse_cols(self.options["vals"])
        cols = [f"{n} {t}" for n, t in keys]
        cols += [f"{n}_before {t}" for n, t in vals]
        cols += [f"{n}_after {t}" for n, t in vals]
        cols += ["change_type string", "version bigint"]
        return ", ".join(cols)

    def streamReader(self, schema) -> _CdfStreamReader:
        return _CdfStreamReader(self.options)


# The oracle recomputes all three fixture states (slice 0 / slices 0,1 /
# all-minus-purge — the _cdf_fixture commit law) and UNIONs the two
# per-step diffs, each tagged with its end version: exactly what the
# stream must deliver across its micro-batch boundaries, no loss, no
# duplication (A10/A11's pagination contract at the table layer).
_CDF_STREAM_ORACLE = """
WITH v1 AS (
  SELECT o_custkey, o_orderpriority, COUNT(*) AS n_orders,
         CAST(SUM(CAST(round(o_totalprice * 100) AS BIGINT)) AS BIGINT) AS cents
  FROM orders WHERE o_orderkey % 3 < 1
  GROUP BY o_custkey, o_orderpriority
),
v2 AS (
  SELECT o_custkey, o_orderpriority, COUNT(*) AS n_orders,
         CAST(SUM(CAST(round(o_totalprice * 100) AS BIGINT)) AS BIGINT) AS cents
  FROM orders WHERE o_orderkey % 3 < 2
  GROUP BY o_custkey, o_orderpriority
),
v3 AS (
  SELECT o_custkey, o_orderpriority, COUNT(*) AS n_orders,
         CAST(SUM(CAST(round(o_totalprice * 100) AS BIGINT)) AS BIGINT) AS cents
  FROM orders
  GROUP BY o_custkey, o_orderpriority
  HAVING (o_custkey % 10) <> 7
),
d12 AS (
  SELECT COALESCE(a.o_custkey, b.o_custkey) AS o_custkey,
         COALESCE(a.o_orderpriority, b.o_orderpriority) AS o_orderpriority,
         a.n_orders AS n_orders_before, a.cents AS cents_before,
         b.n_orders AS n_orders_after,  b.cents AS cents_after,
         CASE WHEN a.o_custkey IS NULL THEN 'insert'
              WHEN b.o_custkey IS NULL THEN 'delete'
              ELSE 'update' END AS change_type,
         CAST(2 AS BIGINT) AS version
  FROM v1 a FULL OUTER JOIN v2 b
    ON a.o_custkey = b.o_custkey AND a.o_orderpriority = b.o_orderpriority
  WHERE a.o_custkey IS NULL OR b.o_custkey IS NULL
     OR a.n_orders <> b.n_orders OR a.cents <> b.cents
),
d23 AS (
  SELECT COALESCE(a.o_custkey, b.o_custkey) AS o_custkey,
         COALESCE(a.o_orderpriority, b.o_orderpriority) AS o_orderpriority,
         a.n_orders AS n_orders_before, a.cents AS cents_before,
         b.n_orders AS n_orders_after,  b.cents AS cents_after,
         CASE WHEN a.o_custkey IS NULL THEN 'insert'
              WHEN b.o_custkey IS NULL THEN 'delete'
              ELSE 'update' END AS change_type,
         CAST(3 AS BIGINT) AS version
  FROM v2 a FULL OUTER JOIN v3 b
    ON a.o_custkey = b.o_custkey AND a.o_orderpriority = b.o_orderpriority
  WHERE a.o_custkey IS NULL OR b.o_custkey IS NULL
     OR a.n_orders <> b.n_orders OR a.cents <> b.cents
)
SELECT * FROM d12 UNION ALL SELECT * FROM d23
"""


@register("source_cdf_stream", oracle=_CDF_STREAM_ORACLE)
def source_cdf_stream(spark: SparkSession, sf_dir: str) -> DataFrame:
    """The txn log consumed as a STREAM (see module docstring): read the
    shared CDF fixture's full change history — every version step's
    feed, tagged with its version — through the version-offset stream
    reader, one step per micro-batch, partitions fanned out per key
    bucket. The oracle recomputes both per-step diffs from the fixture
    and unions them: equality proves no change row is lost, duplicated,
    or misclassified across micro-batch offset boundaries — the
    stream-vs-batch equivalence contract, same as source_custom_stream
    proves for the record connector."""
    from kinesis_datastore_app_spark.operators.cdc import _cdf_fixture, read_table_changes
    from kinesis_datastore_app_spark.streaming.queries import (
        _run_wallclock_to_memory,
    )

    root, keys = _cdf_fixture(spark, sf_dir)
    # expected rows from the BATCH feed API — the stream must deliver
    # exactly the union of the per-step batch feeds (counted, not
    # assumed, so a pagination bug is a loud shortfall/overrun)
    expected = sum(
        read_table_changes(
            spark, root, v, v + 1, keys, ["n_orders", "cents"]
        ).count()
        for v in (1, 2)
    )
    spark.dataSource.register(CdfStreamDataSource)
    sdf = (
        spark.readStream.format("cdf_stream")
        .option("path", root)
        .option("keys", "o_custkey:bigint,o_orderpriority:string")
        .option("vals", "n_orders:bigint,cents:bigint")
        .load()
    )
    return _run_wallclock_to_memory(
        sdf,
        "cdf_stream_out",
        expected,
        "300 milliseconds",
        "kdas_cdfs_",
        timeout_s=90.0,
    )
