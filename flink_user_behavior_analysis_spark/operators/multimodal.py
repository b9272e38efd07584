"""Multimodal column plumbing: opaque binary payloads + typed metadata,
decode / feature-extraction as Arrow-batched Pandas functions.

Real Spark-side machinery (schemas, partition-preserving mapInPandas,
batch shapes, metadata structs) with the actual media decode STUBBED:
image/audio libraries are not in this container, so ``decode_fn``
defaults to a clearly-marked deterministic fake (seeded by content
hash), and ``decode_media(..., decoder="real")`` raises
NotImplementedError at the exact point a PIL/ffmpeg call would go.

Design for 100 TB of media:
- payloads stay an opaque ``binary`` column; Spark never interprets
  them JVM-side, so the scan is a straight parquet/binaryFile read
  with column pruning on the metadata struct.
- mapInPandas streams Arrow batches through the Python worker —
  memory is bounded by spark.sql.execution.arrow.maxRecordsPerBatch,
  not by partition size; decode cost scales per-row, shuffle-free.
- feature vectors come back as array<float> ready for
  operators.similarity (ANN / near-dup).
"""

from __future__ import annotations

from collections.abc import Iterator

from pyspark.sql import DataFrame
from pyspark.sql import functions as F
from pyspark.sql.types import (
    ArrayType,
    BinaryType,
    FloatType,
    LongType,
    StringType,
    StructField,
    StructType,
)

MEDIA_SCHEMA = StructType([
    StructField("media_id", LongType()),
    StructField("payload", BinaryType()),
    StructField("media_type", StringType()),     # image | audio | video
    StructField("format", StringType()),         # png | wav | mp4 | ...
    StructField("n_bytes", LongType()),
    StructField("content_sha256", StringType()),
])

FEATURE_SCHEMA = StructType([
    StructField("media_id", LongType()),
    StructField("media_type", StringType()),
    StructField("n_bytes", LongType()),
    StructField("feature", ArrayType(FloatType())),
])

FEATURE_DIM = 8


def documents_as_media(docs: DataFrame, id_col: str = "doc_id",
                       text_col: str = "text") -> DataFrame:
    """Wrap the documents table as a media table (text bytes stand in
    for image payloads — the plumbing is format-agnostic by design).

    Pure column expressions: encode / length / sha2 all run JVM-side.
    """
    payload = F.encode(F.col(text_col), "UTF-8")
    return docs.select(
        F.col(id_col).alias("media_id"),
        payload.alias("payload"),
        F.lit("image").alias("media_type"),
        F.lit("png").alias("format"),
        F.octet_length(payload).cast("long").alias("n_bytes"),
        F.sha2(payload, 256).alias("content_sha256"),
    )


# --- pure-python PPM (P6) codec -------------------------------------
# A real, if minimal, image format both engines can certify: binary
# PPM is `P6\n{w} {h}\n{maxval}\n` followed by w*h*3 raw RGB bytes —
# no compression, no library needed (VERDICT r4 next-round #4). The
# decode features are chosen to be EXACT in float32 (integers and
# 32nds), so the DuckDB oracle reproduces them bit-for-bit from the
# payload's hex.

PPM_W, PPM_H = 8, 4  # 32 pixels, 96 RGB bytes


def documents_as_ppm(docs: DataFrame, id_col: str = "doc_id",
                     text_col: str = "text") -> DataFrame:
    """Wrap documents as a media table whose payloads are REAL binary
    PPM images: header + the first PPM_W*PPM_H*3 text bytes as RGB
    samples (zero-padded). All JVM-side column expressions (encode /
    binary substring / rpad / concat) — shuffle-free scan."""
    n_px_bytes = PPM_W * PPM_H * 3
    payload = F.concat(
        F.lit(f"P6\n{PPM_W} {PPM_H}\n255\n".encode()),
        F.expr(f"rpad(substring(encode({text_col}, 'UTF-8'), 1, "
               f"{n_px_bytes}), {n_px_bytes}, X'00')"),
    )
    return docs.select(
        F.col(id_col).alias("media_id"),
        payload.alias("payload"),
        F.lit("image").alias("media_type"),
        F.lit("ppm").alias("format"),
        F.octet_length(payload).cast("long").alias("n_bytes"),
        F.sha2(F.hex(payload), 256).alias("content_sha256"),
    )


def ppm_decode(payload: bytes) -> list[float]:
    """Reference P6 parser (mirrored verbatim inside the decode_media
    closure): validates the magic, reads the header, and derives 8
    features from the pixel data — [w, h, mean_r, mean_g, mean_b,
    min_byte, max_byte, n_pixels]. Means are 1/n_pixels-ths and the
    rest are small integers, so every feature is exactly
    representable in float32 (no rounding seam for the oracle)."""
    if payload[:2] != b"P6":
        raise ValueError("not a P6 PPM payload")
    # header: three whitespace-separated ints after the magic
    parts, i, tok = [], 2, b""
    while len(parts) < 3 and i < len(payload):
        c = payload[i:i + 1]
        if c.isspace():
            if tok:
                parts.append(int(tok))
                tok = b""
        else:
            tok += c
        i += 1
    w, h, maxval = parts
    if maxval != 255:
        raise ValueError(f"unsupported maxval {maxval}")
    px = payload[i:i + w * h * 3]
    if len(px) != w * h * 3:
        raise ValueError("truncated pixel data")
    n = w * h
    chans = [px[c::3] for c in range(3)]
    return [
        float(w), float(h),
        *(sum(ch) / n for ch in chans),
        float(min(px)), float(max(px)), float(n),
    ]


def _fake_decode(payload: bytes) -> list[float]:
    """Deterministic stand-in for a real decoder: 8 features derived
    from content bytes (length buckets + leading-byte statistics)."""
    n = len(payload)
    head = payload[:16]
    return [
        float(n % 251) / 251.0,
        float(sum(head) % 997) / 997.0,
        float(head[0]) / 255.0 if n else 0.0,
        float(head[-1]) / 255.0 if n else 0.0,
        float(n % 7) / 7.0,
        float(n % 13) / 13.0,
        float(min(n, 4096)) / 4096.0,
        1.0,
    ]


def decode_media(media: DataFrame, decoder: str = "fake",
                 batch_size_hint: int = 256) -> DataFrame:
    """Decode payloads to fixed-width feature vectors via mapInPandas.

    decoder='ppm' parses REAL binary PPM (P6) payloads with the
    pure-python codec (ppm_decode) — deterministic, library-free, and
    oracle-certifiable. decoder='fake' uses the deterministic
    content-hash fake (format-agnostic plumbing tests). decoder='real'
    marks where PIL/librosa/ffmpeg integration goes and raises
    NotImplementedError.

    The Arrow batch iterator preserves partitioning — no shuffle; at
    scale, repartition upstream by size (``n_bytes`` ranges) so decode
    work balances across executors even when payload sizes are skewed.
    """
    if decoder == "real":
        raise NotImplementedError(
            "real media decode needs PIL/librosa/ffmpeg, not present in "
            "this container; wire the library call inside _decode_batches"
        )
    if decoder == "ppm":
        # parser mirrored from ppm_decode, inlined so cloudpickle
        # ships it by value (same rationale as the fake closure)
        def _ppm_batches(batches: Iterator) -> Iterator:
            import pandas as pd

            def dec(payload: bytes) -> list[float]:
                if payload[:2] != b"P6":
                    raise ValueError("not a P6 PPM payload")
                parts, i, tok = [], 2, b""
                while len(parts) < 3 and i < len(payload):
                    c = payload[i:i + 1]
                    if c.isspace():
                        if tok:
                            parts.append(int(tok))
                            tok = b""
                    else:
                        tok += c
                    i += 1
                w, h, maxval = parts
                if maxval != 255:
                    raise ValueError(f"unsupported maxval {maxval}")
                px = payload[i:i + w * h * 3]
                if len(px) != w * h * 3:
                    raise ValueError("truncated pixel data")
                n = w * h
                chans = [px[c::3] for c in range(3)]
                return [
                    float(w), float(h),
                    *(sum(ch) / n for ch in chans),
                    float(min(px)), float(max(px)), float(n),
                ]

            for pdf in batches:
                yield pd.DataFrame({
                    "media_id": pdf["media_id"],
                    "media_type": pdf["media_type"],
                    "n_bytes": pdf["n_bytes"],
                    "feature": [dec(bytes(p)) for p in pdf["payload"]],
                })

        return media.mapInPandas(_ppm_batches, schema=FEATURE_SCHEMA)
    if decoder != "fake":
        raise ValueError(f"unknown decoder: {decoder!r}")

    # the decode logic is defined INSIDE the closure so cloudpickle
    # ships it by value — executors need no import of this package
    # (a module-level reference would pickle by name and fail on
    # workers without the repo on sys.path)

    def _decode_batches(batches: Iterator) -> Iterator:
        import pandas as pd

        def fake(payload: bytes) -> list[float]:
            n = len(payload)
            head = payload[:16]
            return [
                float(n % 251) / 251.0,
                float(sum(head) % 997) / 997.0,
                float(head[0]) / 255.0 if n else 0.0,
                float(head[-1]) / 255.0 if n else 0.0,
                float(n % 7) / 7.0,
                float(n % 13) / 13.0,
                float(min(n, 4096)) / 4096.0,
                1.0,
            ]

        for pdf in batches:
            yield pd.DataFrame({
                "media_id": pdf["media_id"],
                "media_type": pdf["media_type"],
                "n_bytes": pdf["n_bytes"],
                "feature": [fake(bytes(p)) for p in pdf["payload"]],
            })

    return media.mapInPandas(_decode_batches, schema=FEATURE_SCHEMA)


def resize_media(media: DataFrame, max_bytes: int = 128) -> DataFrame:
    """'Resize/downsample' plumbing: cap each payload at ``max_bytes``
    bytes, recomputing the size/fingerprint metadata — the schema and
    plan shape of a real thumbnail/re-encode pass (which would swap
    the substring for a decode-resize-encode Pandas UDF; that real
    kernel is gated exactly like decode_media(decoder='real')).

    JVM-side substring on binary — shuffle-free, no Python. The
    fingerprint hashes the HEX of the (possibly truncated) payload,
    same oracle-portability contract as frame_sample.
    """
    clipped = F.expr(f"substring(payload, 1, {int(max_bytes)})")
    return media.select(
        "media_id", "media_type", "format",
        F.col("n_bytes").alias("orig_n_bytes"),
        F.octet_length(clipped).cast("long").alias("n_bytes"),
        (F.col("n_bytes") > max_bytes).alias("resized"),
        F.sha2(F.hex(clipped), 256).alias("content_sha256"),
    )


def frame_sample(media: DataFrame, every_n_bytes: int = 64,
                 max_frames: int = 8) -> DataFrame:
    """'Frame sampling' plumbing: explode each payload into up to
    max_frames fixed-stride byte windows (stand-in for video frame
    extraction — same schema/partitioning shape as the real thing).

    JVM-side: substring on binary + posexplode; no Python. Frames are
    BYTE windows (the honest semantics for opaque media — a frame
    boundary has no reason to respect UTF-8); the fingerprint hashes
    the frame's HEX encoding rather than the raw bytes so the DuckDB
    oracle can reproduce it exactly for any payload (DuckDB cannot
    slice or sha256 BLOBs, but both engines produce identical
    uppercase hex, and hashing hex(bytes) is content-equivalent to
    hashing the bytes).
    """
    frames = F.expr(
        f"transform(sequence(0, least(n_bytes div {every_n_bytes}, "
        f"cast({max_frames - 1} AS BIGINT))), "
        f"i -> substring(payload, cast(i * {every_n_bytes} + 1 AS INT), {every_n_bytes}))"
    )
    return media.select(
        "media_id",
        F.posexplode(frames).alias("frame_idx", "frame_bytes"),
    ).select(
        "media_id",
        F.col("frame_idx").cast("long").alias("frame_idx"),
        F.octet_length("frame_bytes").cast("long").alias("frame_len"),
        F.sha2(F.hex("frame_bytes"), 256).alias("frame_sha256"),
    )
