"""Multimodal column support (SURVEY.md §2.B10): images/audio/video as
opaque BINARY columns with typed metadata.

The container has no image/audio codecs, so the DECODE step is stubbed
(clearly marked) behind import-guards — but everything Spark-owned is
real and tested: binary column schemas, the binaryFile source, Arrow
batch shapes through mapInPandas, deterministic metadata extraction, and
partition-friendly layouts. Swapping the stub for PIL/torchaudio changes
one function body, not the plumbing.

Scale notes: binary payloads ride Parquet/Arrow as byte arrays;
mapInPandas streams batches, so executor memory bounds batch size
(spark.sql.execution.arrow.maxRecordsPerBatch), not file count. Feature
extraction is embarrassingly parallel — no shuffle at all.
"""

from __future__ import annotations

import hashlib
import os
from collections.abc import Iterator

import pandas as pd
from pyspark.sql import DataFrame, SparkSession
from pyspark.sql import functions as F

from kinesis_datastore_app_spark.catalog import scratch_tag, table
from kinesis_datastore_app_spark.registry import register

SCRATCH = os.environ.get("SPARK_GRAFT_SCRATCH", "/tmp/kinesis_datastore_app_spark")

try:  # pragma: no cover - not present in this container
    from PIL import Image  # noqa: F401

    HAVE_PIL = True
except ImportError:
    HAVE_PIL = False


def decode_image(payload: bytes) -> tuple[int, int]:
    """Real image decode — unavailable here; the registered query uses
    the deterministic stub below instead."""
    if not HAVE_PIL:
        raise NotImplementedError(
            "image codecs not installed in this environment; "
            "use fake_decode_meta (deterministic stub) instead"
        )
    import io

    with Image.open(io.BytesIO(payload)) as im:  # pragma: no cover
        return im.width, im.height


def fake_decode_meta(payload: bytes) -> tuple[int, int, str]:
    """STUB decode: deterministic pseudo-metadata from the bytes alone
    (width/height from length, md5 checksum). Exercises the exact batch
    shape a real decoder would."""
    n = len(payload)
    return 64 + n % 640, 64 + (n * 7) % 480, hashlib.md5(payload).hexdigest()


_MM_ORACLE = """
SELECT doc_id,
       'application/octet-stream' AS mime,
       length(text) AS n_bytes,
       md5(text) AS checksum,
       64 + length(text) % 640 AS width,
       64 + (length(text) * 7) % 480 AS height
FROM documents WHERE doc_id % 10 = 0
"""


@register("multimodal_binary", oracle=_MM_ORACLE)
def multimodal_binary(spark: SparkSession, sf_dir: str) -> DataFrame:
    """Binary media pipeline: text payloads cast to BINARY stand in for
    image bytes; mapInPandas runs the (stubbed) decoder over Arrow
    batches producing typed metadata columns — the real 100 TB shape for
    feature extraction over media blobs."""
    d = (
        table(spark, sf_dir, "documents")
        .filter(F.col("doc_id") % 10 == 0)
        .select(
            "doc_id",
            F.col("text").cast("binary").alias("payload"),
            F.lit("application/octet-stream").alias("mime"),
        )
    )

    def extract(batches: Iterator[pd.DataFrame]) -> Iterator[pd.DataFrame]:
        for pdf in batches:
            payloads = pdf["payload"]
            meta = [fake_decode_meta(bytes(p)) for p in payloads]
            yield pd.DataFrame(
                {
                    "doc_id": pdf["doc_id"],
                    "mime": pdf["mime"],
                    "n_bytes": [len(bytes(p)) for p in payloads],
                    "checksum": [m[2] for m in meta],
                    "width": [m[0] for m in meta],
                    "height": [m[1] for m in meta],
                }
            )

    return d.mapInPandas(
        extract,
        schema="doc_id BIGINT, mime STRING, n_bytes BIGINT, checksum STRING, "
        "width BIGINT, height BIGINT",
    )


_BINFILE_ORACLE = """
SELECT concat('doc_', CAST(doc_id AS VARCHAR), '.bin') AS file_name,
       length(text) AS n_bytes,
       md5(text) AS checksum
FROM documents WHERE doc_id < 5
"""


@register("multimodal_binaryfile_source", oracle=_BINFILE_ORACLE)
def multimodal_binaryfile_source(spark: SparkSession, sf_dir: str) -> DataFrame:
    """spark.read.format('binaryFile'): ingest raw media files as rows of
    (path, length, content BINARY) — the on-ramp for file-per-asset
    corpora before compacting into Parquet at scale."""
    tag = scratch_tag(sf_dir, "documents")
    path = f"{SCRATCH}/{tag}/binfiles"
    os.makedirs(path, exist_ok=True)
    rows = (
        table(spark, sf_dir, "documents")
        .filter(F.col("doc_id") < 5)
        .select("doc_id", "text")
        .collect()
    )
    for r in rows:
        with open(f"{path}/doc_{r.doc_id}.bin", "wb") as f:
            f.write(r.text.encode("utf-8"))
    df = spark.read.format("binaryFile").option("pathGlobFilter", "*.bin").load(path)
    return df.select(
        F.element_at(F.split(F.col("path"), "/"), -1).alias("file_name"),
        F.col("length").alias("n_bytes"),
        F.md5("content").alias("checksum"),
    )


FRAME_SIZE = 64  # bytes per "frame" of the stand-in video payload
FRAME_STRIDE = 2  # sample every 2nd frame

_FRAME_ORACLE = f"""
WITH idx AS (SELECT i FROM generate_series(0, 65536, {FRAME_STRIDE}) AS t(i))
SELECT d.doc_id, idx.i AS frame_idx,
       md5(substr(d.text, CAST(idx.i * {FRAME_SIZE} + 1 AS INT), {FRAME_SIZE})) AS frame_md5
FROM documents d JOIN idx ON idx.i * {FRAME_SIZE} < length(d.text)
WHERE d.doc_id % 20 = 0
"""


@register("multimodal_frame_sample", oracle=_FRAME_ORACLE)
def multimodal_frame_sample(spark: SparkSession, sf_dir: str) -> DataFrame:
    """Frame sampling over video-like binary payloads: mapInPandas emits
    M frame-rows per input row (every FRAME_STRIDEth FRAME_SIZE-byte
    chunk) — the one-to-many Arrow batch shape that decode/resize/
    frame-extract pipelines need (a real decoder swaps the chunk slicing
    for codec calls; the dataflow, schema, and batch handling are
    identical). Shuffle-free and embarrassingly parallel: output volume
    is rows × frames/stride, bounded per-batch by Arrow, not per-file."""
    d = (
        table(spark, sf_dir, "documents")
        .filter(F.col("doc_id") % 20 == 0)
        .select("doc_id", F.col("text").cast("binary").alias("payload"))
    )

    def sample_frames(batches: Iterator[pd.DataFrame]) -> Iterator[pd.DataFrame]:
        for pdf in batches:
            out_doc, out_idx, out_md5 = [], [], []
            for doc_id, payload in zip(pdf["doc_id"], pdf["payload"]):
                data = bytes(payload)
                n_frames = -(-len(data) // FRAME_SIZE)
                for i in range(0, n_frames, FRAME_STRIDE):
                    out_doc.append(doc_id)
                    out_idx.append(i)
                    out_md5.append(
                        hashlib.md5(data[i * FRAME_SIZE:(i + 1) * FRAME_SIZE]).hexdigest()
                    )
            yield pd.DataFrame({"doc_id": out_doc, "frame_idx": out_idx, "frame_md5": out_md5})

    return d.mapInPandas(sample_frames, schema="doc_id BIGINT, frame_idx BIGINT, frame_md5 STRING")


_CHUNK_ORACLE = """
WITH payloads AS (
  SELECT doc_id, hex(CAST(substr(text, 1, 1000) AS BLOB)) AS h
  FROM documents WHERE doc_id % 25 = 0
),
idx AS (SELECT g AS chunk_id FROM generate_series(0, 31) t(g))
SELECT doc_id, chunk_id,
       substr(h, chunk_id * 64 + 1, 64) AS chunk_hex,
       CAST(length(substr(h, chunk_id * 64 + 1, 64)) / 2 AS BIGINT) AS chunk_bytes
FROM payloads JOIN idx ON chunk_id * 64 < length(h)
"""


@register("multimodal_chunk_binary", oracle=_CHUNK_ORACLE)
def multimodal_chunk_binary(spark: SparkSession, sf_dir: str) -> DataFrame:
    """Fixed-size chunking of binary payloads (32-byte chunks, indexed) —
    the shipping shape for large media blobs: bounded record size for
    shuffle/network, reassembly via (doc_id, chunk_id). Payload bytes are
    hex-encoded before slicing so the oracle compares pure VARCHAR (no
    raw BINARY in output, per oracle discipline). The chunk index comes
    from a constant-bounded sequence + join filter (DuckDB's
    generate_series cannot take lateral parameters). One-to-many expand
    with no shuffle; at 100 TB chunking happens at ingest so downstream
    operators never move a >row-group-sized value."""
    d = (
        table(spark, sf_dir, "documents")
        .filter(F.col("doc_id") % 25 == 0)
        .select(
            "doc_id",
            F.hex(F.substring(F.col("text"), 1, 1000).cast("binary")).alias("h"),
        )
    )
    idx = spark.range(32).select(F.col("id").cast("int").alias("chunk_id"))
    joined = d.crossJoin(F.broadcast(idx)).filter(
        F.col("chunk_id") * 64 < F.length("h")
    )
    chunk = F.substring(F.col("h"), F.col("chunk_id") * 64 + 1, 64)
    return joined.select(
        "doc_id",
        "chunk_id",
        chunk.alias("chunk_hex"),
        (F.length(chunk) / 2).cast("bigint").alias("chunk_bytes"),
    )


_BINARY_DEDUP_ORACLE = """
WITH payloads AS (
    SELECT doc_id, text FROM documents
    UNION ALL
    SELECT doc_id + 1000000, text FROM documents WHERE doc_id % 7 = 0
),
groups AS (
    SELECT md5(text) AS content_hash,
           MIN(doc_id) AS keep_doc_id,
           CAST(COUNT(*) AS BIGINT) AS n_copies
    FROM payloads
    GROUP BY md5(text)
)
SELECT content_hash, keep_doc_id, n_copies
FROM groups
WHERE n_copies > 1
"""


@register("multimodal_dedup_binary", oracle=_BINARY_DEDUP_ORACLE)
def multimodal_dedup_binary(spark: SparkSession, sf_dir: str) -> DataFrame:
    """Exact content-hash dedup of binary payloads — the first pass of
    any image/audio dedup pipeline (bit-identical copies are the bulk of
    web-crawl duplication; perceptual near-dup runs after, on the
    survivors). Hash the payload bytes (md5 over the same UTF-8 bytes in
    both engines), group by digest, keep the min doc id per group, and
    report only groups with actual duplicates.

    Shape at 100 TB: one shuffle of (digest, doc_id) pairs — 16-byte
    keys instead of payloads; the media bytes never move. Same
    hash-groupBy skeleton as dedup_doc_exact, applied to the binary
    column so it composes with the multimodal ops (the payload here is
    the text cast to binary, the fixture's stand-in for media bytes).
    The fixture corpus has no bit-identical duplicates, so every 7th
    payload is re-ingested under an offset id — a deterministic
    duplicate set both engines construct, keeping the check
    non-vacuous."""
    base = table(spark, sf_dir, "documents")
    d = base.select("doc_id", "text").unionByName(
        base.filter(F.col("doc_id") % 7 == 0).select(
            (F.col("doc_id") + 1000000).alias("doc_id"), "text"
        )
    ).select("doc_id", F.col("text").cast("binary").alias("payload"))
    return (
        d.select("doc_id", F.md5("payload").alias("content_hash"))
        .groupBy("content_hash")
        .agg(
            F.min("doc_id").alias("keep_doc_id"),
            F.count(F.lit(1)).alias("n_copies"),
        )
        .filter(F.col("n_copies") > 1)
    )


# Paired-modality training manifest: text documents joined to their
# embedding rows (CLIP-style pair table) with per-modality stats — the
# contrastive-training input artifact.
_PAIR_MANIFEST_ORACLE = """
SELECT d.doc_id,
       len(string_split(lower(d.text), ' ')) AS n_tokens,
       CAST(len(e.embedding) AS INT) AS embed_dim,
       round(sqrt(list_dot_product(CAST(e.embedding AS DOUBLE[]),
                                   CAST(e.embedding AS DOUBLE[]))), 6)
         AS embed_norm,
       e.label
FROM documents d JOIN embeddings e ON e.vec_id = d.doc_id
"""


@register("multimodal_pair_manifest", oracle=_PAIR_MANIFEST_ORACLE)
def multimodal_pair_manifest(spark: SparkSession, sf_dir: str) -> DataFrame:
    """Text-embedding pair manifest: one row per aligned (document,
    vector) pair with per-modality stats (token count, embedding dim
    and norm, label) — the table a contrastive/multimodal trainer
    consumes, and the join every pairing audit starts from (pairs
    missing on either side fall out of the inner join; an anti-join on
    the same key lists them). Key equi-join on the shared id — at
    100 TB either a co-partitioned shuffle join or, when one modality
    is far smaller, a broadcast; stats are per-row codegen."""
    d = table(spark, sf_dir, "documents").select(
        "doc_id", F.size(F.split(F.lower(F.col("text")), " ")).alias("n_tokens")
    )
    emb = table(spark, sf_dir, "embeddings").select(
        F.col("vec_id"),
        F.size("embedding").alias("embed_dim"),
        F.round(
            F.sqrt(
                F.aggregate(
                    F.zip_with(
                        F.col("embedding").cast("array<double>"),
                        F.col("embedding").cast("array<double>"),
                        lambda a, b: a * b,
                    ),
                    F.lit(0.0),
                    lambda acc, x: acc + x,
                )
            ),
            6,
        ).alias("embed_norm"),
        "label",
    )
    return d.join(emb, d["doc_id"] == emb["vec_id"]).select(
        "doc_id", "n_tokens", "embed_dim", "embed_norm", "label"
    )
