"""Multimodal column plumbing: opaque binary payloads + typed metadata.

Images/audio/video ride Spark as ``binary`` columns next to a metadata
struct — the layout a 100 TB multimodal corpus uses (payloads in parquet or
object-store references, transforms as Arrow-batched UDFs over
``mapInPandas``). The Spark-side plumbing here — schemas, batch iteration,
deterministic feature extraction, partition-size discipline — is real and
tested. The codec boundary decodes REAL formats with stdlib-only parsers
(``functions/codecs.py``: BMP via struct+numpy, 16-bit PCM WAV via stdlib
``wave``); ``NotImplementedError`` remains only for genuinely unsupported
containers (PNG/JPEG/MP4 need external libraries this sandbox forbids) —
pass a ``codec`` callable to plug one in.
"""

from __future__ import annotations

from typing import Callable, Iterator

import numpy as np
import pandas as pd
from pyspark.sql import DataFrame
from pyspark.sql import functions as F

from ..functions.codecs import (decode_bmp, decode_wav, encode_bmp,
                                encode_wav, sniff_media)
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

    BMP (24/32-bit uncompressed) decodes natively — a real on-disk format
    parsed with stdlib struct + numpy (``functions/codecs.py``). Other
    containers need an external decoder: pass ``codec`` (e.g. a PIL/OpenCV
    wrapper in a real deployment, or ``fake_codec`` for the deterministic
    test tile); without one, unsupported formats raise."""
    if codec is not None:
        return codec(payload)
    if sniff_media(payload) == "bmp":
        return decode_bmp(payload)
    raise NotImplementedError(
        "unsupported image container: BMP decodes natively; PNG/JPEG/... "
        "need an external library — pass codec=<decoder> (or "
        "codec=fake_codec for the deterministic test codec)")


def decode_audio(payload: bytes) -> tuple[int, np.ndarray]:
    """Decode a 16-bit PCM WAV payload to (sample_rate, (n, ch) int16) —
    stdlib ``wave``, no external dependency. Non-WAV containers raise."""
    if sniff_media(payload) != "wav":
        raise NotImplementedError(
            "unsupported audio container: 16-bit PCM WAV decodes natively; "
            "other formats need an external library")
    return decode_wav(payload)


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
    """Decode → nearest-neighbor resize → re-encode.

    With no ``codec``, payloads are decoded as REAL images via
    :func:`decode_image` (BMP natively; other containers raise
    ``NotImplementedError`` in the task) and re-encoded as 24-bit BMP, so
    the output payload is itself a decodable image. With a ``codec``
    callable (``codec(payload, width, height) -> (h, w, 3) uint8``), the
    decoded tile is resized and emitted as RAW RGB bytes — the
    plug-an-external-decoder path. The RESIZE is vectorized numpy (strided
    index gather); the batch plumbing (binary in, smaller binary out,
    metadata updated) is exactly what a real thumbnailing pass uses."""
    schema = MEDIA_SCHEMA

    def resize(batches: Iterator[pd.DataFrame]) -> Iterator[pd.DataFrame]:
        for pdf in batches:
            out_payloads = []
            for b, w, h in zip(pdf["payload"], pdf["width"], pdf["height"]):
                if codec is not None:
                    img = codec(bytes(b), int(w), int(h))  # (h, w, 3) uint8
                else:
                    img = decode_image(bytes(b))
                ys = (np.arange(out_height) * img.shape[0]
                      // out_height)
                xs = (np.arange(out_width) * img.shape[1] // out_width)
                small = np.ascontiguousarray(img[ys[:, None], xs[None, :], :])
                out_payloads.append(
                    small.tobytes() if codec is not None
                    else encode_bmp(small))
            yield pd.DataFrame({
                "media_id": pdf["media_id"],
                "kind": pdf["kind"],
                "width": out_width,
                "height": out_height,
                "n_bytes": [len(p) for p in out_payloads],
                "payload": out_payloads,
            })

    return df.mapInPandas(resize, schema)


def synth_bmp_table(spark, num_rows: int, *, seed: int = 42,
                    num_partitions: int | None = None) -> DataFrame:
    """Media table whose payloads are REAL encoded 24-bit BMPs.

    Pixels are a deterministic function of (seed, media_id) — a per-id
    seeded generator, so the table is identical for every partitioning.
    Sizes vary per row (including odd widths, which exercise the 4-byte
    BMP row padding). Distributed: the encode runs as a mapInPandas over
    ``spark.range``, one Arrow batch of BMPs per task."""
    base = spark.range(0, num_rows, 1, num_partitions) if num_partitions \
        else spark.range(num_rows)
    schema = MEDIA_SCHEMA

    def gen(batches: Iterator[pd.DataFrame]) -> Iterator[pd.DataFrame]:
        for pdf in batches:
            ids = pdf["id"].to_numpy(np.int64)
            payloads, ws, hs = [], [], []
            for i in ids:
                w = 8 + (int(i) * 7) % 25    # 8..32, odd widths included
                h = 8 + (int(i) * 13) % 25
                rng = np.random.default_rng((seed << 32) ^ int(i))
                img = rng.integers(0, 256, (h, w, 3), dtype=np.uint8)
                payloads.append(encode_bmp(img))
                ws.append(w)
                hs.append(h)
            yield pd.DataFrame({
                "media_id": ids, "kind": "image",
                "width": np.array(ws, dtype=np.int32),
                "height": np.array(hs, dtype=np.int32),
                "n_bytes": np.array([len(p) for p in payloads],
                                    dtype=np.int64),
                "payload": payloads,
            })

    return base.mapInPandas(gen, schema)


def synth_wav_table(spark, num_rows: int, *, seed: int = 42,
                    sample_rate: int = 8000,
                    num_partitions: int | None = None) -> DataFrame:
    """Media table whose payloads are REAL 16-bit PCM WAV files: per-id
    deterministic sine + seeded noise, mono, ~400 samples."""
    base = spark.range(0, num_rows, 1, num_partitions) if num_partitions \
        else spark.range(num_rows)
    schema = MEDIA_SCHEMA

    def gen(batches: Iterator[pd.DataFrame]) -> Iterator[pd.DataFrame]:
        for pdf in batches:
            ids = pdf["id"].to_numpy(np.int64)
            payloads = []
            for i in ids:
                n = 400 + (int(i) * 17) % 100
                freq = 100.0 + (int(i) % 40) * 25.0
                t = np.arange(n) / sample_rate
                rng = np.random.default_rng((seed << 32) ^ int(i))
                wave_f = (0.6 * np.sin(2 * np.pi * freq * t)
                          + 0.05 * rng.standard_normal(n))
                payloads.append(encode_wav(
                    np.clip(wave_f * 32767, -32768, 32767).astype(np.int16),
                    sample_rate))
            yield pd.DataFrame({
                "media_id": ids, "kind": "audio",
                "width": np.zeros(len(ids), dtype=np.int32),
                "height": np.zeros(len(ids), dtype=np.int32),
                "n_bytes": np.array([len(p) for p in payloads],
                                    dtype=np.int64),
                "payload": payloads,
            })

    return base.mapInPandas(gen, schema)


def audio_features(df: DataFrame) -> DataFrame:
    """Per-payload audio descriptors from REAL WAV decode (stdlib wave):
    ``(media_id, sample_rate, n_samples, duration_s, rms, zero_cross_rate)``.
    NULL payloads yield NULL feature fields (NULL-in -> NULL-out); non-WAV
    payloads raise in the task (filter by kind upstream)."""
    schema = ("media_id long, sample_rate int, n_samples long, "
              "duration_s double, rms double, zero_cross_rate double")

    def extract(batches: Iterator[pd.DataFrame]) -> Iterator[pd.DataFrame]:
        for pdf in batches:
            out = {k: [] for k in ("sample_rate", "n_samples", "duration_s",
                                   "rms", "zero_cross_rate")}
            for b in pdf["payload"]:
                if b is None:
                    for k in out:
                        out[k].append(None)
                    continue
                rate, data = decode_audio(bytes(b))
                mono = data.mean(axis=1)
                n = len(mono)
                zc = float(np.mean(np.signbit(mono[1:])
                                   != np.signbit(mono[:-1]))) if n > 1 else 0.0
                out["sample_rate"].append(rate)
                out["n_samples"].append(n)
                out["duration_s"].append(round(n / rate, 6))
                out["rms"].append(round(float(
                    np.sqrt(np.mean(mono.astype(np.float64) ** 2))), 6))
                out["zero_cross_rate"].append(round(zc, 6))
            yield pd.DataFrame({"media_id": pdf["media_id"], **out})

    return df.mapInPandas(extract, schema)


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
