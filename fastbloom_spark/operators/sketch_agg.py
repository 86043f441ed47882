"""Generic mergeable-sketch aggregation — one topology, five sketches.

Every sketch (Bloom, HLL, CMS, t-digest, KLL) is a *mergeable aggregator*:
per-partition state built map-side in ``mapInPandas`` (zero row shuffle),
then a two-phase bucketed merge shuffling only serialized sketch state. This
module generalizes the Bloom topology in ``operators/bloom.py`` to any
implementation exposing::

    empty() -> state
    update(state, values: np.ndarray) -> state     # vectorized
    merge(a, b) -> state
    serialize(state) -> bytes
    deserialize(bytes) -> state
    input_kind: "digest" (int64 digest64 column) | "double"

Scale notes: phase-1 buckets bound any single task's merge fan-in at
ceil(P / fanin) states; per-(key, partition) partials absorb row-count skew
map-side exactly as in the Bloom path. Sketch states are KBs — the shuffle
after the map stage is negligible at any input scale.
"""

from __future__ import annotations

import functools
from typing import Iterator, Sequence

import numpy as np
import pandas as pd
from pyspark.sql import Column, DataFrame
from pyspark.sql import functions as F

from ..functions.digest import digest64
from ..kernel import decode_state, encode_state, exact_int64
from .bloom import _auto_salt, _key_schema, _norm_key_vals
from .text import _widen


def _prepare(df: DataFrame, value_col: str | Column, impl,
             key_cols: Sequence[str], digest_precomputed: bool,
             *, widen: bool = False) -> DataFrame:
    col = F.col(value_col) if isinstance(value_col, str) else value_col
    # NULL values leave BEFORE the Arrow transfer: for digest sketches one
    # NULL would turn the whole long batch float64 and corrupt digests
    # above 2^53 (kernel.exact_int64); for double sketches the impls strip
    # NaN anyway — filtering keeps rows_seen = values folded on both
    # paths. Filter the RAW column, never the computed digest (Catalyst
    # would evaluate the digest twice — Filter + Project — a measured ~2x
    # on sha256 scans; and xxh64 hashes NULL to a non-null constant)
    base = df.filter(col.isNotNull()).select(*key_cols,
                                             col.alias("__raw__"))
    if widen:
        # widen BELOW the digest projection so the hash scan parallelizes
        # (a single-row-group input would serialize it through one task);
        # only order-invariant sketches may take this path — see
        # sketch_partials
        base = _widen(base)
    raw = F.col("__raw__")
    if impl.input_kind == "digest":
        val = raw if digest_precomputed else digest64(raw)
        val = val.cast("long")
    else:
        val = raw.cast("double")
    return base.select(*key_cols, val.alias("__value"))


def _values_np(series: pd.Series, impl) -> np.ndarray:
    if impl.input_kind == "digest":
        # defensive: the _prepare funnel filters NULLs, so a float batch
        # here means raw sketch_partials misuse — refuse loudly instead of
        # silently truncating >2^53 digests
        return exact_int64(series, "sketch digest column")
    return series.to_numpy(dtype=np.float64, copy=False)


def sketch_partials(
    df: DataFrame,
    value_col: str | Column,
    impl,
    key_cols: Sequence[str] = (),
    *,
    digest_precomputed: bool = False,
) -> DataFrame:
    """Per-(key, partition) partial sketch rows: map-side only.

    Inputs narrower than the cluster's task slots are widened (round-robin
    repartition) ONLY for order-invariant sketches (HLL register-max, CMS
    counter-add, theta bottom-k — bitwise identical under any partition
    layout); t-digest/KLL merge within error bounds but not bit-identically
    across layouts, so their partitioning is never touched."""
    keys = list(key_cols)
    prepared = _prepare(df, value_col, impl, keys, digest_precomputed,
                        widen=getattr(impl, "order_invariant", False))
    key_schema = _key_schema(prepared, keys)
    schema = (key_schema + ", " if key_schema else "") + \
        "partition_id int, rows_seen long, sketch binary"

    def build(batches: Iterator[pd.DataFrame]) -> Iterator[pd.DataFrame]:
        from pyspark import TaskContext

        pid = TaskContext.get().partitionId() if TaskContext.get() else -1
        acc: dict[tuple, tuple[object, int]] = {}
        for pdf in batches:
            vals_all = _values_np(pdf["__value"], impl)
            if not keys:
                state, seen = acc.setdefault((), (impl.empty(), 0))
                acc[()] = (impl.update(state, vals_all), seen + len(pdf))
            else:
                for key_vals, idx in pdf.groupby(
                        keys, sort=False, dropna=False).indices.items():
                    if not isinstance(key_vals, tuple):
                        key_vals = (key_vals,)
                    key_vals = _norm_key_vals(key_vals)
                    state, seen = acc.setdefault(key_vals, (impl.empty(), 0))
                    acc[key_vals] = (impl.update(state, vals_all[idx]),
                                     seen + len(idx))
        if not acc:
            return
        # partial rows travel ENVELOPED (kernel.encode_state): a group's
        # one-partition state is near-empty, so high-cardinality keys
        # shuffle KBs instead of 2^p bytes per (group, partition); final
        # outputs (sketch_merge's last stage) stay canonical impl format
        yield pd.DataFrame(
            [(*k, pid, seen, encode_state(impl.serialize(state)))
             for k, (state, seen) in acc.items()],
            columns=[*keys, "partition_id", "rows_seen", "sketch"])

    return prepared.mapInPandas(build, schema)


def _merge_fn(impl, group_cols: Sequence[str], *, encode_out: bool = False):
    """Grouped state merge. ``decode_state`` accepts both enveloped partial
    rows and bare canonical buffers (rollup re-merges final outputs);
    ``encode_out=True`` keeps INTERNAL stages (phase-1 fan-in buckets)
    enveloped while the final stage emits the canonical impl format."""
    cols = list(group_cols)

    def merge(pdf: pd.DataFrame) -> pd.DataFrame:
        merged = functools.reduce(
            impl.merge,
            (impl.deserialize(decode_state(bytes(b))) for b in pdf["sketch"]))
        out = {c: [pdf[c].iloc[0]] for c in cols}
        out["rows_seen"] = [int(pdf["rows_seen"].sum())]
        raw = impl.serialize(merged)
        out["sketch"] = [encode_state(raw) if encode_out else raw]
        return pd.DataFrame(out)

    return merge


def sketch_merge(
    partials: DataFrame,
    impl,
    key_cols: Sequence[str] = (),
    *,
    fanin: int = 16,
) -> DataFrame:
    """Two-phase associative merge (same shape as ``bloom_merge``)."""
    keys = list(key_cols)
    key_schema = _key_schema(partials, keys)
    bucket_schema = (key_schema + ", " if key_schema else "") + \
        "__fanin_bucket int, rows_seen long, sketch binary"
    final_schema = (key_schema + ", " if key_schema else "") + \
        "rows_seen long, sketch binary"
    with_bucket = partials.withColumn(
        "__fanin_bucket",
        F.pmod(F.col("partition_id"), F.lit(fanin)).cast("int"))
    phase1 = with_bucket.groupBy(*keys, "__fanin_bucket").applyInPandas(
        _merge_fn(impl, [*keys, "__fanin_bucket"], encode_out=True),
        bucket_schema)
    grouped = phase1.groupBy(*keys) if keys else phase1.groupBy()
    return grouped.applyInPandas(_merge_fn(impl, keys), final_schema)


def sketch_agg(
    df: DataFrame,
    key_cols: Sequence[str],
    value_col: str | Column,
    impl,
    *,
    digest_precomputed: bool = False,
    fanin: int = 16,
    strategy: str = "auto",
    distinct_keys_hint: int | None = None,
    salt: int | str = 1,
) -> DataFrame:
    """Grouped sketch aggregation → (keys..., rows_seen, sketch binary).

    ``strategy`` mirrors :func:`fastbloom_spark.operators.bloom.bloom_agg`:
    ``"partial"`` (per-key-per-partition map-side states, zero row shuffle)
    for low-cardinality keys; ``"shuffle"`` (repartition (key, value) rows,
    exactly one state per key) for high-cardinality keys; ``"auto"`` decides
    by estimated partial-state inflation vs 1 GiB (state size sampled from
    an empty sketch).

    ``salt > 1`` (shuffle strategy only) splits each hot key's rows across
    up to ``salt`` tasks (repartition on (keys..., pmod(xxhash64(value),
    salt))) and merges the sub-states per key — no single-task straggler
    under key skew. Identical output for exactly-mergeable families (HLL
    register-max, CMS counter-add, Bloom OR); t-digest/KLL merge within
    their published rank-error bounds but not bit-identically to a
    single-task fold (merge order differs — the same caveat as any
    distributed build of those sketches). ``salt="auto"`` derives the
    value from a hash-sampled top-key share (one thin map-combined job,
    :func:`~fastbloom_spark.operators.bloom._auto_salt`).
    """
    keys = list(key_cols)
    if strategy == "auto" and keys:
        n_keys = distinct_keys_hint
        if n_keys is None:
            n_keys = df.select(*keys).distinct().count()
        p_in = df.rdd.getNumPartitions()
        # empty() serializes tiny for the compactor sketches while
        # populated partials reach O(k) floats — floor the estimate at
        # 4 KiB so the model reflects the states actually shuffled
        state_bytes = max(len(impl.serialize(impl.empty())), 4096)
        # UPPER bound: every partition can hold up to n_keys distinct
        # keys (min(n_keys, P) undercounted by n_keys/P and could never
        # pick shuffle for high-cardinality keys); overestimating only
        # flips to "shuffle", a safe thin-row shuffle. Threshold 256 MiB
        # (round 7, was 1 GiB) — the Bloom-side measurement showed the
        # partial decode+OR merge dominating well before 1 GiB.
        inflation = n_keys * p_in * state_bytes
        strategy = "shuffle" if inflation > (1 << 28) else "partial"
    elif strategy == "auto":
        strategy = "partial"
    if strategy not in ("partial", "shuffle"):
        raise ValueError(f"unknown strategy {strategy!r}")

    if strategy == "shuffle" and keys:
        prepared = _prepare(df, value_col, impl, keys, digest_precomputed)
        if salt == "auto":
            salt = _auto_salt(prepared, keys, "__value")
        return _sketch_agg_shuffled(prepared, keys, impl, fanin=fanin,
                                    salt=salt)
    partials = sketch_partials(df, value_col, impl, key_cols,
                               digest_precomputed=digest_precomputed)
    return sketch_merge(partials, impl, key_cols, fanin=fanin)


def _sketch_agg_shuffled(prepared: DataFrame, keys: list[str], impl,
                         *, fanin: int = 16, salt: int = 1) -> DataFrame:
    """One-shuffle grouped build: co-locate each key's rows, fold to exactly
    one state per key. ``salt > 1`` splits hot keys over up to ``salt``
    tasks and merges sub-states per key (see :func:`sketch_agg`)."""
    if salt > 1:
        salt_col = F.pmod(F.xxhash64(F.col("__value")),
                          F.lit(salt)).cast("int")
        # explicit numPartitions: AQE would coalesce a small column-only
        # repartition back into few tasks, undoing the salt ("auto"-managed
        # confs fall back to defaultParallelism)
        from ..session import shuffle_partition_count

        n_shuffle = shuffle_partition_count(prepared.sparkSession)
        salted = prepared.repartition(n_shuffle,
                                      *[F.col(c) for c in keys], salt_col)
        # per-(key, partition) states on the salted layout == sub-sketches
        # (__value is already prepared: digest_precomputed avoids re-hashing)
        partials = sketch_partials(salted, "__value", impl, keys,
                                   digest_precomputed=True)
        return sketch_merge(partials, impl, keys, fanin=fanin)
    key_schema = _key_schema(prepared, keys)
    schema = key_schema + ", rows_seen long, sketch binary"

    def build_groups(batches: Iterator[pd.DataFrame]) -> Iterator[pd.DataFrame]:
        acc: dict[tuple, tuple[object, int]] = {}
        for pdf in batches:
            vals_all = _values_np(pdf["__value"], impl)
            for key_vals, idx in pdf.groupby(keys, sort=False,
                                             dropna=False).indices.items():
                if not isinstance(key_vals, tuple):
                    key_vals = (key_vals,)
                key_vals = _norm_key_vals(key_vals)
                state, seen = acc.setdefault(key_vals, (impl.empty(), 0))
                acc[key_vals] = (impl.update(state, vals_all[idx]),
                                 seen + len(idx))
        if not acc:
            return
        yield pd.DataFrame(
            [(*k, seen, impl.serialize(state))
             for k, (state, seen) in acc.items()],
            columns=[*keys, "rows_seen", "sketch"])

    return prepared.repartition(*[F.col(c) for c in keys]) \
        .mapInPandas(build_groups, schema)


def sketch_rollup(
    df: DataFrame,
    key_cols: Sequence[str],
    value_col: str | Column,
    impl,
    *,
    digest_precomputed: bool = False,
    fanin: int = 16,
) -> DataFrame:
    """Hierarchical rollup for any mergeable sketch: one sketch per prefix
    level of ``key_cols`` (nulls mark rolled-up columns). Rows are scanned
    once at the finest level; coarser levels re-aggregate sketch state only
    — valid for every impl because merge is the aggregator's own associative
    combine (register max, counter add, centroid/compactor merge)."""
    keys = list(key_cols)
    # eager localCheckpoint per level (KB-sized sketch frames): coarser
    # levels read MATERIALIZED state instead of re-executing every merge
    # through lineage, and nothing stays persisted past the call
    finest = sketch_agg(df, keys, value_col, impl,
                        digest_precomputed=digest_precomputed,
                        fanin=fanin).localCheckpoint(eager=True)
    dtype_of = dict(finest.dtypes)
    levels = [finest.withColumn("rollup_level", F.lit(len(keys)))]
    current = finest
    for level in range(len(keys) - 1, -1, -1):
        coarser = keys[:level]
        grouped = current.groupBy(*coarser) if coarser else current.groupBy()
        key_schema = _key_schema(finest, coarser)
        merged = grouped.applyInPandas(
            _merge_fn(impl, coarser),
            (key_schema + ", " if key_schema else "")
            + "rows_seen long, sketch binary").localCheckpoint(eager=True)
        current = merged
        padded = merged
        for k_name in keys[level:]:
            padded = padded.withColumn(
                k_name, F.lit(None).cast(dtype_of[k_name]))
        levels.append(padded.select(*keys, "rows_seen", "sketch")
                      .withColumn("rollup_level", F.lit(level)))
    out = levels[0].select(*keys, "rows_seen", "sketch", "rollup_level")
    for lv in levels[1:]:
        out = out.unionByName(lv)
    return out


def sketch_build(
    df: DataFrame,
    value_col: str | Column,
    impl,
    *,
    digest_precomputed: bool = False,
    fanin: int = 16,
):
    """Global build → (local sketch state, rows_seen) on the driver.

    Order-invariant sketches (HLL/CMS/theta) skip the two-phase
    applyInPandas merge: the per-partition partials (KBs each) are
    Arrow-collected and folded driver-side — same bits by merge
    commutativity, two shuffle stages and two Python round trips fewer
    (the bloom_build driver-collect pattern). Rank sketches
    (t-digest/KLL) keep the distributed merge tree so their merge order
    — and therefore their driver-hash-checked output — is unchanged."""
    if getattr(impl, "order_invariant", False):
        pdf = sketch_partials(df, value_col, impl, [],
                              digest_precomputed=digest_precomputed) \
            .select("rows_seen", "sketch").toPandas()
        if pdf.empty:
            return impl.empty(), 0
        merged = functools.reduce(
            impl.merge,
            (impl.deserialize(decode_state(bytes(b)))
             for b in pdf["sketch"]))
        return merged, int(pdf["rows_seen"].sum())
    rows = sketch_agg(df, [], value_col, impl,
                      digest_precomputed=digest_precomputed,
                      fanin=fanin).collect()
    if not rows:
        return impl.empty(), 0
    return impl.deserialize(bytes(rows[0].sketch)), int(rows[0].rows_seen)
