"""Multimodal column plumbing: opaque binary payloads + typed metadata.

Images/audio/video ride Spark as ``binary`` columns next to a metadata
struct — the layout a 100 TB multimodal corpus uses (payloads in parquet or
object-store references, transforms as Arrow-batched UDFs over
``mapInPandas``). The Spark-side plumbing here — schemas, batch iteration,
deterministic feature extraction, partition-size discipline — is real and
tested; the codec step itself is STUBBED (no image/audio libraries in this
container): ``decode_image`` raises ``NotImplementedError`` unless handed
the deterministic fake codec, which is what tests and the feature path use.
"""

from __future__ import annotations

from typing import Callable, Iterator

import numpy as np
import pandas as pd
from pyspark.sql import DataFrame
from pyspark.sql import functions as F

from ..functions.digest import sha256_hex

MEDIA_SCHEMA = ("media_id long, kind string, width int, height int, "
                "n_bytes long, payload binary")


def synth_media_table(spark, num_rows: int, *, seed: int = 42,
                      num_partitions: int | None = None) -> DataFrame:
    """Deterministic fake media table (binary payload = seeded sha2 chain,
    JVM-generated; metadata columns typed as a real pipeline would)."""
    base = spark.range(0, num_rows, 1, num_partitions) if num_partitions \
        else spark.range(num_rows)
    mix = F.sha2(F.concat(F.lit(f"m{seed}-"), F.col("id")), 256)
    payload = F.unhex(F.concat(*[F.sha2(F.concat(mix, F.lit(i)), 256)
                                 for i in range(4)]))  # 128 bytes
    return base.select(
        F.col("id").alias("media_id"),
        F.element_at(F.array(F.lit("image"), F.lit("audio"), F.lit("video")),
                     (F.pmod(F.col("id"), F.lit(3)) + 1).cast("int"))
        .alias("kind"),
        (F.pmod(F.col("id") * 7, F.lit(512)) + 32).cast("int").alias("width"),
        (F.pmod(F.col("id") * 13, F.lit(512)) + 32).cast("int")
        .alias("height"),
        F.length(payload).cast("long").alias("n_bytes"),
        payload.alias("payload"),
    )


def decode_image(payload: bytes, *, codec: Callable | None = None):
    """Decode a binary image payload to an HxWx3 uint8 array.

    STUB: real decoding needs an image library that is not in this
    container. Pass ``codec=fake_codec`` (deterministic bytes→pixels) to
    exercise the full pipeline shape; otherwise this raises."""
    if codec is None:
        raise NotImplementedError(
            "image codecs unavailable in this environment; "
            "pass codec=fake_codec for the deterministic test codec")
    return codec(payload)


def fake_codec(payload: bytes, width: int = 8, height: int = 8) -> np.ndarray:
    """Deterministic fake decoder: tile payload bytes into HxWx3 uint8.
    Empty payloads decode to a zero tile (a real corpus can contain
    truncated blobs; one empty row must not kill the whole task)."""
    need = width * height * 3
    if len(payload) == 0:
        return np.zeros((height, width, 3), dtype=np.uint8)
    buf = (payload * (need // len(payload) + 1))[:need]
    return np.frombuffer(buf, dtype=np.uint8).reshape(height, width, 3)


def media_features(df: DataFrame, *, feature_dim: int = 16) -> DataFrame:
    """Deterministic per-payload feature vectors via ``mapInArrow``.

    Stands in for embed/resize/frame-sample: Arrow batches in, numpy
    feature block out, one row per media row — the exact batch shape a real
    extractor (decode → model) plugs into. Features are byte-histogram
    moments of the payload (deterministic, codec-free).

    Batch-vectorized over the Arrow BinaryArray's FLAT buffer: one
    segmented bincount per batch (segment-id * dim + nibble), zero
    per-row Python — at real media sizes (MBs/row) the per-row loop this
    replaced was the bottleneck the plumbing exists to avoid."""
    schema = "media_id long, kind string, feature array<double>"

    def extract(batches):
        import pyarrow as pa

        for rb in batches:
            pay = rb.column(rb.schema.get_field_index("payload"))
            n = len(pay)
            # flat data buffer + offsets, zero-copy off the Arrow batch
            # (binary = int32 offsets; large_binary = int64)
            odt = np.int64 if pa.types.is_large_binary(pay.type) else np.int32
            offsets = np.frombuffer(pay.buffers()[1], dtype=odt,
                                    count=n + 1,
                                    offset=pay.offset * odt(0).nbytes)
            flat = np.frombuffer(pay.buffers()[2], dtype=np.uint8)
            lens = np.diff(offsets).astype(np.int64)
            seg = np.repeat(np.arange(n, dtype=np.int64), lens)
            nibbles = flat[offsets[0]:offsets[-1]] >> 4
            # nibbles range 0..15; for feature_dim < 16 DROP out-of-range
            # values (the old per-row bincount[:dim] clipping) — otherwise
            # they'd bleed into the next row's bins / break the reshape
            keep = nibbles < feature_dim
            counts = np.bincount(seg[keep] * feature_dim + nibbles[keep],
                                 minlength=n * feature_dim) \
                .reshape(n, feature_dim)
            feats = (counts / np.maximum(lens, 1)[:, None]).round(6)
            # NULL payloads -> NULL features (a NULL slot has equal
            # offsets, so its counts are all zero — emitting a zero
            # vector would masquerade as real content downstream;
            # NULL-in -> NULL-out per the repo convention)
            out = list(feats)
            if pay.null_count:
                valid = pay.is_valid().to_numpy(zero_copy_only=False)
                out = [v if ok else None for v, ok in zip(out, valid)]
            yield pa.RecordBatch.from_arrays(
                [rb.column(rb.schema.get_field_index("media_id")),
                 rb.column(rb.schema.get_field_index("kind")),
                 pa.array(out, type=pa.list_(pa.float64()))],
                names=["media_id", "kind", "feature"])

    return df.mapInArrow(extract, schema)


def resize_media(df: DataFrame, *, out_width: int = 4, out_height: int = 4,
                 codec: Callable | None = None) -> DataFrame:
    """Decode → nearest-neighbor resize → re-encode raw RGB bytes.

    The decode step is the stubbed codec boundary (pass
    ``codec=fake_codec`` — no image libraries in this container); the
    RESIZE itself is real vectorized numpy (strided index gather), and the
    batch plumbing (binary in, smaller binary out, metadata updated) is
    exactly what a real thumbnailing pass uses."""
    if codec is None:
        decode_image(b"")  # the ONE stub boundary raises its error here
    schema = MEDIA_SCHEMA

    def resize(batches: Iterator[pd.DataFrame]) -> Iterator[pd.DataFrame]:
        for pdf in batches:
            out_payloads = []
            for b, w, h in zip(pdf["payload"], pdf["width"], pdf["height"]):
                img = codec(bytes(b), int(w), int(h))  # (h, w, 3) uint8
                ys = (np.arange(out_height) * img.shape[0]
                      // out_height)
                xs = (np.arange(out_width) * img.shape[1] // out_width)
                small = img[ys[:, None], xs[None, :], :]
                out_payloads.append(small.tobytes())
            yield pd.DataFrame({
                "media_id": pdf["media_id"],
                "kind": pdf["kind"],
                "width": out_width,
                "height": out_height,
                "n_bytes": [len(p) for p in out_payloads],
                "payload": out_payloads,
            })

    return df.mapInPandas(resize, schema)


def sample_frames(df: DataFrame, *, frame_bytes: int = 32,
                  every_n: int = 2) -> DataFrame:
    """Frame sampling for video-kind payloads — PURE JVM (zero Python):
    the payload is treated as concatenated fixed-size frames; every
    ``every_n``-th frame explodes into its own row
    ``(media_id, frame_idx, frame binary)``. At 100 TB this shape (one
    narrow explode, no UDF) is what keeps frame extraction scan-bound."""
    n_frames = (F.length("payload") / F.lit(frame_bytes)).cast("int")
    idxs = F.sequence(F.lit(0), F.greatest(n_frames - 1, F.lit(0)),
                      F.lit(every_n))
    return df.filter(F.col("kind") == "video") \
        .select("media_id", F.explode(idxs).alias("frame_idx"),
                F.col("payload")) \
        .select("media_id", "frame_idx",
                F.expr(f"substring(payload, frame_idx * {frame_bytes} + 1, "
                       f"{frame_bytes})").alias("frame")) \
        .filter(F.length("frame") == frame_bytes)  # full frames only


def media_dedup_exact(df: DataFrame) -> DataFrame:
    """Payload-level exact dedup (sha256 of bytes, JVM-side). NULL
    payloads are UNKNOWN content, not duplicates of each other: each
    NULL-payload row stays its own group (groupBy would otherwise treat
    the NULL hashes as equal and collapse them — the same NULL-collapse
    class fixed in text dedup_exact)."""
    hashed = df.select("media_id",
                       sha256_hex(F.col("payload")).alias("payload_sha256"))
    grouped = hashed.filter(F.col("payload_sha256").isNotNull()) \
        .groupBy("payload_sha256") \
        .agg(F.min("media_id").alias("keeper_media_id"),
             F.count("*").alias("dup_count"))
    nulls = hashed.filter(F.col("payload_sha256").isNull()) \
        .select("payload_sha256",
                F.col("media_id").alias("keeper_media_id"),
                F.lit(1).cast("long").alias("dup_count"))
    return grouped.unionByName(nulls)
