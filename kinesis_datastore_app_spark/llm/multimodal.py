"""Multimodal column support (SURVEY.md §2.B10): images/audio/video as
opaque BINARY columns with typed metadata.

The container has no image libraries, but PNG needs none: the payloads
here are REAL, VALID PNGs built with stdlib zlib/struct (signature,
CRC-checked IHDR, zlib-compressed IDAT scanlines), and the decode step
parses those bytes for real — signature check, IHDR CRC verification,
dimension extraction, IDAT decompression. Everything Spark-owned is
real and tested: binary column schemas, the binaryFile source, Arrow
batch shapes through mapInPandas, and partition-friendly layouts.
Swapping in a full-codec decoder (PIL/ffmpeg) for JPEG/video changes
one function body, not the plumbing.

Scale notes: binary payloads ride Parquet/Arrow as byte arrays;
mapInPandas streams batches, so executor memory bounds batch size
(spark.sql.execution.arrow.maxRecordsPerBatch), not file count. Feature
extraction is embarrassingly parallel — no shuffle at all.
"""

from __future__ import annotations

import hashlib
import os
import struct
import zlib
from collections.abc import Iterator

import pandas as pd
from pyspark.sql import DataFrame, SparkSession
from pyspark.sql import functions as F

from kinesis_datastore_app_spark.catalog import scratch_path, table
from kinesis_datastore_app_spark.numerics import seq_norm
from kinesis_datastore_app_spark.llm.tokenization import tokens
from kinesis_datastore_app_spark.registry import register

# Synthetic-duplicate id offset for multimodal_dedup_binary: far above
# any plausible real doc_id (ids stay bigint) so the re-ingested copy
# can never alias a real document at ANY corpus size — a small fixed
# offset collides once the corpus outgrows it (the text_decontaminate
# bug class), and a NEGATIVE id would steal MIN(doc_id) keeper-ship
# from the real document.
_DUP_OFFSET = 1 << 61

_PNG_SIG = b"\x89PNG\r\n\x1a\n"


def _png_chunk(tag: bytes, body: bytes) -> bytes:
    return (
        struct.pack(">I", len(body))
        + tag
        + body
        + struct.pack(">I", zlib.crc32(tag + body) & 0xFFFFFFFF)
    )


def make_png(width: int, height: int, seed: int) -> bytes:
    """Tiny valid 8-bit grayscale PNG built with stdlib only: signature,
    IHDR, one zlib-compressed IDAT of filter-0 scanlines, IEND — all
    CRCs real. Pixel (x, y) = (seed + 3x + 5y) mod 256, so decoded
    pixel values are a pure function of (width, height, seed) that an
    oracle can recompute."""
    ihdr = struct.pack(">IIBBBBB", width, height, 8, 0, 0, 0, 0)
    raw = b"".join(
        b"\x00" + bytes((seed + 3 * x + 5 * y) % 256 for x in range(width))
        for y in range(height)
    )
    return (
        _PNG_SIG
        + _png_chunk(b"IHDR", ihdr)
        + _png_chunk(b"IDAT", zlib.compress(raw, 6))
        + _png_chunk(b"IEND", b"")
    )


def decode_image(payload: bytes) -> tuple[int, int, int, int, int]:
    """REAL PNG decode (stdlib, no codecs needed): verify the 8-byte
    signature, parse and CRC-check IHDR, walk the chunk list, inflate
    the concatenated IDAT stream, and validate the decompressed
    scanline volume. Returns (width, height, bit_depth, color_type,
    first_pixel). Raises ValueError on malformed bytes — corrupt media
    must fail loudly, not produce garbage metadata."""
    if payload[:8] != _PNG_SIG:
        raise ValueError("not a PNG: bad signature")
    if len(payload) < 33:  # signature + IHDR chunk is 33 bytes minimum
        raise ValueError("truncated before IHDR")
    ln, tag = struct.unpack(">I4s", payload[8:16])
    if tag != b"IHDR" or ln != 13:
        raise ValueError("first chunk is not a 13-byte IHDR")
    body = payload[16:29]
    (crc,) = struct.unpack(">I", payload[29:33])
    if crc != zlib.crc32(b"IHDR" + body) & 0xFFFFFFFF:
        raise ValueError("IHDR CRC mismatch")
    width, height, bit_depth, color_type = struct.unpack(">IIBB", body[:10])
    idat, pos = b"", 33
    while pos < len(payload):
        header = payload[pos : pos + 8]
        if len(header) < 8:
            raise ValueError("truncated chunk header")
        ln, tag = struct.unpack(">I4s", header)
        if pos + 12 + ln > len(payload):
            raise ValueError("chunk length overruns payload")
        if tag == b"IDAT":
            idat += payload[pos + 8 : pos + 8 + ln]
        if tag == b"IEND":
            break
        pos += 12 + ln
    if not idat:
        raise ValueError("no IDAT chunk")
    try:
        raw = zlib.decompress(idat)
    except zlib.error as ex:
        raise ValueError(f"IDAT inflate failed: {ex}") from ex
    if color_type == 0 and bit_depth == 8 and len(raw) != height * (width + 1):
        raise ValueError("IDAT scanline volume mismatch")
    return width, height, bit_depth, color_type, raw[1] if len(raw) > 1 else -1


def _png_dims(doc_id: int) -> tuple[int, int]:
    """Deterministic per-doc image dimensions — mirrored in the oracle
    SQL so the decoded IHDR values are independently recomputable."""
    return 4 + (doc_id * 7) % 61, 4 + (doc_id * 13) % 37


_MM_ORACLE = """
SELECT doc_id,
       'image/png' AS mime,
       4 + (doc_id * 7) % 61 AS width,
       4 + (doc_id * 13) % 37 AS height,
       8 AS bit_depth,
       0 AS color_type,
       length(text) % 256 AS px0
FROM documents WHERE doc_id % 10 = 0
"""


@register("multimodal_binary", oracle=_MM_ORACLE)
def multimodal_binary(spark: SparkSession, sf_dir: str) -> DataFrame:
    """Binary media pipeline over REAL image bytes: each doc is rendered
    to a valid PNG (stdlib zlib/struct; dimensions a deterministic
    function of doc_id, pixels seeded by the text length), then the
    decoder parses those bytes for real — signature, IHDR CRC, IDAT
    inflate — inside mapInPandas over Arrow batches. The oracle
    recomputes the decoded metadata from the same formulas, so a decode
    bug (wrong offset, wrong endianness, skipped CRC) hash-mismatches
    instead of passing silently. This is the 100 TB shape for feature
    extraction over media blobs: encode/decode is per-row codegen-free
    Python over Arrow batches, embarrassingly parallel, no shuffle."""
    d = (
        table(spark, sf_dir, "documents")
        .filter(F.col("doc_id") % 10 == 0)
        .select("doc_id", F.length("text").alias("n_chars"))
    )

    def roundtrip(batches: Iterator[pd.DataFrame]) -> Iterator[pd.DataFrame]:
        for pdf in batches:
            out = {
                "doc_id": [], "mime": [], "width": [], "height": [],
                "bit_depth": [], "color_type": [], "px0": [],
            }
            for doc_id, n_chars in zip(pdf["doc_id"], pdf["n_chars"]):
                w, h = _png_dims(int(doc_id))
                png = make_png(w, h, int(n_chars) % 256)
                dw, dh, depth, ctype, px0 = decode_image(png)
                out["doc_id"].append(doc_id)
                out["mime"].append("image/png")
                out["width"].append(dw)
                out["height"].append(dh)
                out["bit_depth"].append(depth)
                out["color_type"].append(ctype)
                out["px0"].append(px0)
            yield pd.DataFrame(out)

    return d.mapInPandas(
        roundtrip,
        schema="doc_id BIGINT, mime STRING, width BIGINT, height BIGINT, "
        "bit_depth INT, color_type INT, px0 BIGINT",
    )


_BINFILE_ORACLE = """
SELECT concat('doc_', CAST(doc_id AS VARCHAR), '.png') AS file_name,
       4 + (doc_id * 7) % 61 AS width,
       4 + (doc_id * 13) % 37 AS height,
       TRUE AS sig_ok
FROM documents WHERE doc_id < 5
"""


@register("multimodal_binaryfile_source", oracle=_BINFILE_ORACLE)
def multimodal_binaryfile_source(spark: SparkSession, sf_dir: str) -> DataFrame:
    """spark.read.format('binaryFile') over real PNG files, decoded
    JVM-SIDE: ingest raw media files as rows of (path, length, content
    BINARY), then extract width/height straight from the IHDR bytes
    with built-in expressions (substring + conv-from-hex on the
    big-endian dimension words) — scan-speed metadata extraction with
    no Python in the loop, the on-ramp for file-per-asset corpora
    before compacting into Parquet at scale.

    The PNG fixture files are built ONCE per fixture vintage with the
    standard atomic tmp-dir + rename publish (an in-place 'wb'
    truncate-rewrite on every call both raced concurrent readers —
    0-byte files mid-scan — and paid the build repeatedly)."""
    from kinesis_datastore_app_spark.catalog import atomic_publish_dir

    path = scratch_path(sf_dir, "documents", "pngfiles")

    def build(tmp: str) -> None:
        os.makedirs(tmp)
        rows = (
            table(spark, sf_dir, "documents")
            .filter(F.col("doc_id") < 5)
            .select("doc_id", F.length("text").alias("n_chars"))
            .collect()
        )
        for r in rows:
            w, h = _png_dims(r.doc_id)
            with open(f"{tmp}/doc_{r.doc_id}.png", "wb") as f:
                f.write(make_png(w, h, r.n_chars % 256))

    atomic_publish_dir(path, build)
    df = spark.read.format("binaryFile").option("pathGlobFilter", "*.png").load(path)

    def be32(pos: int):  # 1-indexed big-endian u32 inside the IHDR
        return F.conv(F.hex(F.substring(F.col("content"), pos, 4)), 16, 10).cast(
            "bigint"
        )

    return df.select(
        F.element_at(F.split(F.col("path"), "/"), -1).alias("file_name"),
        be32(17).alias("width"),
        be32(21).alias("height"),
        (F.hex(F.substring(F.col("content"), 1, 8)) == "89504E470D0A1A0A").alias(
            "sig_ok"
        ),
    )


FRAME_SIZE = 64  # units per "frame" of the stand-in video payload
FRAME_STRIDE = 2  # sample every 2nd frame
# shared frame-index cap, baked into BOTH engines (like _CHUNK_ORACLE's
# 32-chunk bound): the oracle's generate_series needs a constant upper
# bound, so the Spark side mirrors it — an oracle-only cap would report
# a false MISMATCH on any payload past the bound
FRAME_MAX_IDX = 65536

_FRAME_ORACLE = f"""
WITH idx AS (SELECT i FROM generate_series(0, {FRAME_MAX_IDX}, {FRAME_STRIDE}) AS t(i))
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
                # frame boundaries are CHARACTER offsets, mirroring the
                # SQL twin's substr() — DuckDB has no BLOB substr, and a
                # byte-sliced Spark side would desynchronize from the
                # oracle on the first multi-byte character (a real codec
                # slices bytes; the dataflow is what this op pins)
                text = bytes(payload).decode("utf-8")
                n_frames = -(-len(text) // FRAME_SIZE)
                for i in range(0, min(n_frames, FRAME_MAX_IDX + 1), FRAME_STRIDE):
                    out_doc.append(doc_id)
                    out_idx.append(i)
                    out_md5.append(
                        hashlib.md5(
                            text[i * FRAME_SIZE:(i + 1) * FRAME_SIZE].encode("utf-8")
                        ).hexdigest()
                    )
            yield pd.DataFrame({"doc_id": out_doc, "frame_idx": out_idx, "frame_md5": out_md5})

    return d.mapInPandas(sample_frames, schema="doc_id BIGINT, frame_idx BIGINT, frame_md5 STRING")


# Chunk-index bound: 1000 CHARS can be up to 4000 UTF-8 BYTES (8000 hex
# chars), so the constant sequence must cover ceil(8000/64) = 125
# chunks — the old bound of 32 assumed ASCII and silently dropped every
# byte past 1024 on multibyte text, on BOTH engines (round-8 review:
# the oracle mirrored the truncation, so the sweep could not see it).
_CHUNK_MAX = 125

_CHUNK_ORACLE = f"""
WITH payloads AS (
  SELECT doc_id, hex(CAST(substr(text, 1, 1000) AS BLOB)) AS h
  FROM documents WHERE doc_id % 25 = 0
),
idx AS (SELECT g AS chunk_id FROM generate_series(0, {_CHUNK_MAX - 1}) t(g))
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
    idx = spark.range(_CHUNK_MAX).select(F.col("id").cast("int").alias("chunk_id"))
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
    SELECT doc_id + 2305843009213693952, text FROM documents WHERE doc_id % 7 = 0
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
            (F.col("doc_id") + _DUP_OFFSET).alias("doc_id"), "text"
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
        "doc_id", F.size(tokens()).alias("n_tokens")
    )
    emb = table(spark, sf_dir, "embeddings").select(
        F.col("vec_id"),
        F.size("embedding").alias("embed_dim"),
        # seq_norm, never an inline re-fold: the sequential left fold is
        # the Spark/DuckDB bit-exactness contract (numerics.seq_dot doc)
        F.round(
            seq_norm(F.col("embedding").cast("array<double>")), 6
        ).alias("embed_norm"),
        "label",
    )
    return d.join(emb, d["doc_id"] == emb["vec_id"]).select(
        "doc_id", "n_tokens", "embed_dim", "embed_norm", "label"
    )
