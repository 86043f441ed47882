"""SQL surface: sketch tables queryable from pure Spark SQL.

``register_sketch_sql(spark)`` registers vectorized pandas UDFs over the
self-describing sketch buffers produced by ``bloom_agg`` / ``sketch_agg`` /
checkpoints, so a persisted sketch table answers estimates without any
Python driver code::

    SELECT lang, hll_estimate(sketch) FROM hll_by_lang
    SELECT bloom_probe(sketch, k, seed, layout, digest64(key))
        FROM blooms, probes
    SELECT kll_quantile(sketch, 0.5) FROM kll_by_segment

plus GROUPED AGGREGATES that re-aggregate persisted state from pure SQL
(every family merges associatively, so coarser rollups never rescan rows)::

    SELECT bloom_union_agg(sketch) FROM blooms            -- word-wise OR
    SELECT hll_estimate(hll_union_agg(sketch)) FROM hlls  -- register max
    -- cms_union_agg (counter add), tdigest_merge_agg, kll_merge_agg
    -- (note: pandas grouped-agg UDFs cannot mix with built-in aggregates
    --  in one SELECT — Spark limitation; sum(rows_seen) goes in its own)

All functions are Arrow-batched; per-row work is numpy over the deserialized
state (states are KB-to-MB; deserialize cost is amortized per distinct
buffer via a tiny cache).
"""

from __future__ import annotations

import numpy as np
import pandas as pd
from pyspark.sql import SparkSession
from pyspark.sql import functions as F
from pyspark.sql.types import BooleanType, DoubleType, LongType

from .kernel import contains_hashes, decode_words, source_hash


def _cached(fn):
    cache: dict[bytes, object] = {}

    def get(buf: bytes):
        if buf not in cache:
            if len(cache) > 64:
                cache.clear()
            cache[buf] = fn(buf)
        return cache[buf]

    return get


def register_sketch_sql(spark: SparkSession) -> list[str]:
    """Register all sketch SQL functions; returns their names."""

    @F.pandas_udf(DoubleType())
    def hll_estimate(sketch: pd.Series) -> pd.Series:
        from .sketch.hll import HllSketch

        @_cached
        def est(buf: bytes) -> float:
            p = buf[1]
            impl = HllSketch(precision=p)
            return float(impl.estimate(impl.deserialize(buf)))

        return sketch.map(lambda b: est(bytes(b)))

    @F.pandas_udf(LongType())
    def cms_estimate(sketch: pd.Series, digest: pd.Series) -> pd.Series:
        from .sketch.cms import CountMinSketch

        @_cached
        def load(buf: bytes):
            return CountMinSketch.from_buffer(buf)

        # Batch-vectorized: a probe table typically joins ONE sketch row
        # against many keys, so each Arrow batch holds few distinct buffers.
        # Group by buffer identity and query each group's digests as one
        # numpy vector (one kernel call per distinct sketch, not per row).
        out = np.empty(len(sketch), dtype=np.int64)
        codes, uniques = pd.factorize(sketch)
        digs = digest.to_numpy(np.int64)
        for gi, buf in enumerate(uniques):
            impl, counters = load(bytes(buf))
            mask = codes == gi
            out[mask] = impl.query(counters, digs[mask])
        return pd.Series(out)

    @F.pandas_udf(DoubleType())
    def tdigest_quantile(sketch: pd.Series, q: pd.Series) -> pd.Series:
        import struct

        from .sketch.tdigest import TDigestSketch

        def quant(b: bytes, qq: float) -> float:
            delta = struct.unpack_from("<H", b, 1)[0]
            impl = TDigestSketch(delta=delta)
            return impl.quantile(impl.deserialize(b), qq)

        return pd.Series([quant(bytes(b), float(qq))
                          for b, qq in zip(sketch, q)])

    @F.pandas_udf(DoubleType())
    def kll_quantile(sketch: pd.Series, q: pd.Series) -> pd.Series:
        import struct

        from .sketch.kll import KllSketch

        def quant(b: bytes, qq: float) -> float:
            k = struct.unpack_from("<H", b, 1)[0]
            impl = KllSketch(k=k)
            return impl.quantile(impl.deserialize(b), qq)

        return pd.Series([quant(bytes(b), float(qq))
                          for b, qq in zip(sketch, q)])

    @F.pandas_udf(BooleanType())
    def bloom_probe(sketch: pd.Series, k: pd.Series, seed: pd.Series,
                    layout: pd.Series, digest: pd.Series) -> pd.Series:
        @_cached
        def words_of(buf: bytes) -> np.ndarray:
            return decode_words(buf)

        # Batch-vectorized: group rows by distinct (sketch, k, seed, layout)
        # and run the kernel ONCE per group over all that group's digests —
        # a probe table joined against one sketch row costs one vectorized
        # contains_hashes per Arrow batch instead of a per-row Python loop.
        out = np.zeros(len(sketch), dtype=bool)
        key = pd.Series(
            list(zip(sketch, k, seed, layout)), dtype=object)
        codes, uniques = pd.factorize(key)
        digs = digest.to_numpy(np.int64)
        for gi, (buf, kk, ss, lay) in enumerate(uniques):
            words = words_of(bytes(buf))
            mask = codes == gi
            h = source_hash(digs[mask], int(ss) & ((1 << 64) - 1))
            out[mask] = contains_hashes(
                words, h, int(kk), "flat" if lay is None else str(lay))
        return pd.Series(out)

    @F.pandas_udf("binary")
    def bloom_intersect(sketch_a: pd.Series, sketch_b: pd.Series) -> pd.Series:
        """Word-wise AND of two compatible bloom payloads (upper-bound
        intersection semantics, fastbloom src/lib.rs:343-350)."""
        from .kernel import encode_words, intersect_words

        out = []
        for a, b in zip(sketch_a, sketch_b):
            out.append(encode_words(intersect_words(
                decode_words(bytes(a)), decode_words(bytes(b)))))
        return pd.Series(out)

    @F.pandas_udf("binary")
    def bloom_union(sketch_a: pd.Series, sketch_b: pd.Series) -> pd.Series:
        """Word-wise OR of two compatible bloom payloads (FP-preserving
        union, fastbloom src/lib.rs:310-317)."""
        from .kernel import encode_words, union_words

        out = []
        for a, b in zip(sketch_a, sketch_b):
            out.append(encode_words(union_words(
                decode_words(bytes(a)), decode_words(bytes(b)))))
        return pd.Series(out)

    @F.pandas_udf("binary")
    def bloom_union_agg(sketch: pd.Series) -> bytes:
        """SQL AGGREGATE: OR-reduce a group's bloom payloads into one —
        pure-SQL re-aggregation of persisted partial/sketch tables
        (``SELECT lang, bloom_union_agg(sketch) FROM partials GROUP BY
        lang``). Safe at scale: groups hold one ~m/8-byte row per
        partition/sub-key, not data rows."""
        from .kernel import encode_words

        acc = None
        for b in sketch:
            w = decode_words(bytes(b), copy=False)
            acc = w.copy() if acc is None else np.bitwise_or(acc, w, out=acc)
        # empty group (empty table aggregate) -> NULL, never an invalid buf
        return encode_words(acc) if acc is not None else None

    @F.pandas_udf("binary")
    def hll_union_agg(sketch: pd.Series) -> bytes:
        """SQL AGGREGATE: merge a group's HLL states into one (register-wise
        max) — re-aggregate persisted HLL tables from pure SQL."""
        from .sketch.hll import HllSketch

        impl = None
        acc = None
        for b in sketch:
            buf = bytes(b)
            if impl is None:
                impl = HllSketch(precision=buf[1])
            state = impl.deserialize(buf)
            acc = state if acc is None else impl.merge(acc, state)
        return impl.serialize(acc) if impl is not None else None

    @F.pandas_udf(DoubleType())
    def hll_intersect_estimate(sketch_a: pd.Series,
                               sketch_b: pd.Series) -> pd.Series:
        """Inclusion-exclusion intersection estimate from two HLL states:
        |A ∩ B| ≈ est(A) + est(B) - est(A ∪ B). Error grows with the
        disjoint mass (each term carries ~1.04/sqrt(2^p) relative error),
        so it is a coarse overlap signal, not a precise count — clamped at
        zero."""
        from .sketch.hll import HllSketch

        def inter(ba: bytes, bb: bytes) -> float:
            impl = HllSketch(precision=ba[1])
            a = impl.deserialize(ba)
            b = impl.deserialize(bb)
            est = (impl.estimate(a) + impl.estimate(b)
                   - impl.estimate(impl.merge(a, b)))
            return max(est, 0.0)

        return pd.Series([inter(bytes(a), bytes(b))
                          for a, b in zip(sketch_a, sketch_b)])

    @F.pandas_udf("binary")
    def cms_union_agg(sketch: pd.Series) -> bytes:
        """SQL AGGREGATE: merge count-min states (counter-wise add)."""
        from .sketch.cms import CountMinSketch

        impl = None
        acc = None
        for b in sketch:
            impl_b, counters = CountMinSketch.from_buffer(bytes(b))
            if impl is None:
                impl = impl_b
            acc = counters if acc is None else impl.merge(acc, counters)
        return impl.serialize(acc) if impl is not None else None

    @F.pandas_udf("binary")
    def tdigest_merge_agg(sketch: pd.Series) -> bytes:
        """SQL AGGREGATE: merge t-digest states (cluster recompression)."""
        import struct

        from .sketch.tdigest import TDigestSketch

        impl = None
        acc = None
        for b in sketch:
            buf = bytes(b)
            if impl is None:
                impl = TDigestSketch(delta=struct.unpack_from("<H", buf, 1)[0])
            state = impl.deserialize(buf)
            acc = state if acc is None else impl.merge(acc, state)
        return impl.serialize(acc) if impl is not None else None

    @F.pandas_udf("binary")
    def kll_merge_agg(sketch: pd.Series) -> bytes:
        """SQL AGGREGATE: merge KLL states (level-wise compaction)."""
        import struct

        from .sketch.kll import KllSketch

        impl = None
        acc = None
        for b in sketch:
            buf = bytes(b)
            if impl is None:
                impl = KllSketch(k=struct.unpack_from("<H", buf, 1)[0])
            state = impl.deserialize(buf)
            acc = state if acc is None else impl.merge(acc, state)
        return impl.serialize(acc) if impl is not None else None

    fns = {
        "bloom_union": bloom_union,
        "bloom_intersect": bloom_intersect,
        "hll_estimate": hll_estimate,
        "cms_estimate": cms_estimate,
        "tdigest_quantile": tdigest_quantile,
        "kll_quantile": kll_quantile,
        "bloom_probe": bloom_probe,
        "bloom_union_agg": bloom_union_agg,
        "hll_union_agg": hll_union_agg,
        "hll_intersect_estimate": hll_intersect_estimate,
        "cms_union_agg": cms_union_agg,
        "tdigest_merge_agg": tdigest_merge_agg,
        "kll_merge_agg": kll_merge_agg,
    }
    for name, fn in fns.items():
        spark.udf.register(name, fn)
    return sorted(fns)
