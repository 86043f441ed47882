"""Distributed Bloom operators — partial build, associative merge, probe, semi-join.

Topology (SURVEY.md §3.3, §4):

* **build** is map-side: each input partition folds its Arrow batches into a
  private numpy bit array inside ``mapInPandas`` — the share-nothing analogue
  of the reference's ``AtomicBloomFilter`` concurrent build (fastbloom
  ``src/lib.rs:383-390``); no shared state, no contention, zero row shuffle.
* **merge** shuffles only fixed-size sketch rows (m/8 bytes each), never rows:
  a two-phase bucketed OR-reduce (groupBy(bucket) → groupBy(key)), the
  DataFrame rendering of ``treeAggregate`` — depth-2 fan-in keeps any single
  task's merge input bounded at ``fanin`` sketches regardless of the input
  partition count. OR is associative + commutative word-wise (``src/
  bit_vector.rs:98-104``), so the result is bitwise-identical for every
  partition count, ordering, and merge tree.
* **probe** broadcasts the finished filter (tiny) and runs the vectorized
  short-circuit kernel inside a scalar pandas UDF; registered for SQL.
* **skew**: per-partition partials absorb row-count skew on the map side
  (a hot key's rows never shuffle — only its per-partition sketches do),
  which is the two-phase/salted-merge the north rule asks for; the bucket
  phase additionally caps merge fan-in for high-cardinality keys.
"""

from __future__ import annotations

from typing import Iterator, Sequence

import numpy as np
import pandas as pd
from pyspark.sql import Column, DataFrame, SparkSession
from pyspark.sql import functions as F
from pyspark.sql.types import BooleanType

from ..config import BloomConfig
from ..functions.digest import digest64
from ..kernel import (
    U64,
    contains_hashes,
    decode_words,
    encode_words,
    exact_int64,
    insert_hashes,
    signed64,
    source_hash,
    words_from_bytes,
)
from ..local import BloomFilter

#: sketch-row payload columns appended after the group keys
SKETCH_FIELDS = ("m long, k int, seed long, layout string, "
                 "digest string, rows_seen long, sketch binary")


def _key_schema(df: DataFrame, key_cols: Sequence[str]) -> str:
    by_name = {f.name: f.dataType.simpleString() for f in df.schema.fields}
    return ", ".join(f"`{k}` {by_name[k]}" for k in key_cols)


def _digests_to_u64(series: pd.Series) -> np.ndarray:
    # exact_int64 (not a blind cast): one NULL in the column would have
    # turned the whole Arrow batch float64, corrupting every digest above
    # 2^53 BEFORE this code runs — refuse loudly (the build funnels filter
    # NULL digests out, so this only fires on raw bloom_partials misuse)
    return exact_int64(series, "bloom digest column").view(U64)


def _prepare_digests(df: DataFrame, keys: list, value_col, cfg,
                     digest_precomputed: bool) -> DataFrame:
    """(keys..., __digest64) rows with NULL VALUES dropped BEFORE the
    digest is computed and BEFORE the Arrow transfer: one NULL would turn
    the long batch float64 in pandas, silently corrupting every digest
    >= 2^53 (kernel.exact_int64). The filter runs on the RAW column —
    filtering on the computed digest would make Catalyst evaluate the
    digest expression twice (once in Filter, once in Project: a measured
    ~2x on sha256-dominated builds) and xxh64 hashes NULL to a non-null
    constant anyway. NULL-in -> NULL-out: a NULL is never a member, so
    zero-FN for real values is unaffected; rows_seen counts VALUES
    folded."""
    if digest_precomputed and isinstance(value_col, str):
        return df.filter(F.col(value_col).isNotNull())             .select(*keys, F.col(value_col).alias("__digest64"))
    col = F.col(value_col) if isinstance(value_col, str) else value_col
    return df.filter(col.isNotNull())         .select(*keys, digest64(col, cfg.digest).alias("__digest64"))


def _norm_key_vals(key_vals: tuple) -> tuple:
    """Canonicalize pandas group keys: a NULL numeric key arrives as a
    FRESH float NaN object per batch, and NaN != NaN, so an accumulator
    keyed on the raw tuple would fragment one logical key into one entry
    per batch (partial sketches emitted twice for the same key). Map NaN
    -> None so the dict key is stable and the emitted row is a real
    SQL NULL."""
    return tuple(None if (isinstance(v, float) and v != v) else v
                 for v in key_vals)


def bloom_partials(
    df: DataFrame,
    digest_col: str,
    cfg: BloomConfig,
    key_cols: Sequence[str] = (),
    *,
    report_dups: bool = False,
) -> DataFrame:
    """Per-partition partial sketches: one row per (keys..., partition).

    Map-side only — the output is a DataFrame of
    ``(key_cols..., partition_id, m, k, seed, rows_seen, sketch)`` with at
    most ``num_partitions * distinct_keys_in_partition`` rows, each m/8 bytes.

    ``report_dups=True`` appends a ``dups_seen`` column: the per-partition
    count of rows whose insert would have returned "may have been
    previously present" (reference ``insert`` return,
    fastbloom src/lib.rs:261-270). Batch linearization: each Arrow batch's
    rows probe the pre-batch state, plus exact in-batch source-hash
    duplicates count as present — the same relaxation the reference's
    concurrent AtomicBloomFilter makes under simultaneous inserts; at
    realistic m the count equals the serial-order count (asserted in
    tests/test_spark_bloom.py).
    """
    keys = list(key_cols)
    key_schema = _key_schema(df, keys)
    dup_field = ", dups_seen long" if report_dups else ""
    schema = (key_schema + ", " if key_schema else "") + \
        "partition_id int, build_ms double, " + SKETCH_FIELDS + dup_field
    m, k, seed = cfg.num_bits, cfg.num_hashes, cfg.seed
    num_words, layout = cfg.num_words, cfg.layout
    digest_kind = cfg.digest
    seed_signed = signed64(seed)

    def build(batches: Iterator[pd.DataFrame]) -> Iterator[pd.DataFrame]:
        import time

        from pyspark import TaskContext

        t_start = time.perf_counter()
        pid = TaskContext.get().partitionId() if TaskContext.get() else -1
        acc: dict[tuple, list] = {}  # key -> [words, rows_seen, dups_seen]

        def fold(key_vals: tuple, hashes: np.ndarray) -> None:
            state = acc.setdefault(
                key_vals, [np.zeros(num_words, dtype=U64), 0, 0])
            if report_dups:
                pre = contains_hashes(state[0], hashes, k, layout)
                _, first_idx = np.unique(hashes, return_index=True)
                in_batch_dup = np.ones(hashes.size, dtype=bool)
                in_batch_dup[first_idx] = False
                state[2] += int(np.count_nonzero(pre | in_batch_dup))
            insert_hashes(state[0], hashes, k, layout)
            state[1] += int(hashes.size)

        for pdf in batches:
            hashes_all = source_hash(_digests_to_u64(pdf[digest_col]), seed)
            if not keys:
                fold((), hashes_all)
            else:
                for key_vals, idx in pdf.groupby(keys, sort=False,
                                                 dropna=False).indices.items():
                    if not isinstance(key_vals, tuple):
                        key_vals = (key_vals,)
                    fold(_norm_key_vals(key_vals), hashes_all[idx])
        if not acc:
            return
        build_ms = (time.perf_counter() - t_start) * 1000.0
        rows = []
        for key_vals, (words, seen, dups) in acc.items():
            base = (*key_vals, pid, round(build_ms, 3), m, k,
                    seed_signed, layout, digest_kind, seen,
                    encode_words(words))
            rows.append(base + (dups,) if report_dups else base)
        cols = [*keys, "partition_id", "build_ms", "m", "k",
                "seed", "layout", "digest", "rows_seen", "sketch"]
        if report_dups:
            cols.append("dups_seen")
        yield pd.DataFrame(rows, columns=cols)

    return df.mapInPandas(build, schema)


def _merge_fn(group_cols: Sequence[str]):
    cols = list(group_cols)

    def merge(pdf: pd.DataFrame) -> pd.DataFrame:
        merged = None
        for b in pdf["sketch"]:
            w = decode_words(bytes(b))
            merged = w if merged is None else np.bitwise_or(merged, w, out=merged)
        out = {c: [pdf[c].iloc[0]] for c in cols}
        out.update(
            m=[int(pdf["m"].iloc[0])], k=[int(pdf["k"].iloc[0])],
            seed=[int(pdf["seed"].iloc[0])],
            layout=[str(pdf["layout"].iloc[0])],
            digest=[str(pdf["digest"].iloc[0])],
            rows_seen=[int(pdf["rows_seen"].sum())],
            sketch=[encode_words(merged)],
        )
        return pd.DataFrame(out)

    return merge


def bloom_partials_sharded(
    df: DataFrame,
    digest_col: str,
    cfg: BloomConfig,
    *,
    num_shards: int | None = None,
) -> DataFrame:
    """Per-partition build that emits the bit vector in word-range shards.

    For large filters the P partial bit-arrays (P * m/8 bytes) dwarf both the
    input digests and the final sketch; collecting them on one node (driver or
    a single merge task) caps scaling. Sharding by word range makes the merge
    embarrassingly parallel: shard ``r`` of every partition shuffles to one
    reducer, is OR-reduced there, and the driver only ever sees the m/8 bytes
    of the final filter. OR per shard is still associative/commutative, so the
    result stays bitwise-identical to every other merge topology.

    Output: ``(partition_id int, shard int, rows_seen long, chunk binary)``;
    rows_seen is recorded on shard 0 only (so sums stay correct).
    """
    m, k, seed = cfg.num_bits, cfg.num_hashes, cfg.seed
    num_words, layout = cfg.num_words, cfg.layout
    shards = num_shards or min(64, max(8, num_words // 131072))
    bounds = np.linspace(0, num_words, shards + 1).astype(np.int64)

    def build(batches: Iterator[pd.DataFrame]) -> Iterator[pd.DataFrame]:
        from pyspark import TaskContext

        pid = TaskContext.get().partitionId() if TaskContext.get() else -1
        words = np.zeros(num_words, dtype=U64)
        seen = 0
        for pdf in batches:
            hashes = source_hash(_digests_to_u64(pdf[digest_col]), seed)
            insert_hashes(words, hashes, k, layout)
            seen += len(pdf)
        if seen == 0:
            return
        rows = []
        for s in range(shards):
            chunk = words[bounds[s]:bounds[s + 1]]
            rows.append((pid, s, seen if s == 0 else 0,
                         chunk.astype("<u8", copy=False).tobytes()))
        yield pd.DataFrame(
            rows, columns=["partition_id", "shard", "rows_seen", "chunk"])

    return df.mapInPandas(
        build, "partition_id int, shard int, rows_seen long, chunk binary")


def bloom_merge_sharded(partials: DataFrame, cfg: BloomConfig) -> BloomFilter:
    """Reduce sharded partials to one filter: OR per shard in parallel
    reducers, then assemble the m/8-byte result on the driver."""

    def merge_shard(pdf: pd.DataFrame) -> pd.DataFrame:
        acc = None
        for b in pdf["chunk"]:
            w = np.frombuffer(bytes(b), dtype="<u8")
            acc = w.astype(U64) if acc is None else np.bitwise_or(
                acc, w.view(U64), out=acc)
        return pd.DataFrame({
            "shard": [int(pdf["shard"].iloc[0])],
            "rows_seen": [int(pdf["rows_seen"].sum())],
            "chunk": [acc.astype("<u8", copy=False).tobytes()],
        })

    merged = partials.groupBy("shard").applyInPandas(
        merge_shard, "shard int, rows_seen long, chunk binary").toPandas()
    if merged.empty:
        return BloomFilter(cfg)
    merged = merged.sort_values("shard")
    words = np.frombuffer(
        b"".join(bytes(b) for b in merged["chunk"]), dtype="<u8").astype(U64)
    return BloomFilter(cfg, words, rows_seen=int(merged["rows_seen"].sum()))


def bloom_merge(
    partials: DataFrame,
    key_cols: Sequence[str] = (),
    *,
    fanin: int = 16,
) -> DataFrame:
    """Two-phase associative OR-merge of partial sketch rows.

    Phase 1 merges within ``pmod(partition_id, fanin)`` buckets (map-side
    skew-proof: every bucket sees ≤ ceil(P / fanin) sketches); phase 2 merges
    the ≤ fanin bucket sketches per key. Equivalent to ``treeAggregate`` with
    depth 2 but stays in the DataFrame API so AQE can coalesce.
    """
    keys = list(key_cols)
    key_schema = _key_schema(partials, keys)
    bucket_schema = (key_schema + ", " if key_schema else "") + \
        "__fanin_bucket int, " + SKETCH_FIELDS
    final_schema = (key_schema + ", " if key_schema else "") + SKETCH_FIELDS

    with_bucket = partials.withColumn(
        "__fanin_bucket",
        F.pmod(F.col("partition_id"), F.lit(fanin)).cast("int"))
    phase1 = with_bucket.groupBy(*keys, "__fanin_bucket").applyInPandas(
        _merge_fn([*keys, "__fanin_bucket"]), bucket_schema)
    if keys:
        return phase1.groupBy(*keys).applyInPandas(_merge_fn(keys), final_schema)
    return phase1.groupBy().applyInPandas(_merge_fn([]), final_schema)


def bloom_agg(
    df: DataFrame,
    key_cols: Sequence[str],
    value_col: str | Column,
    cfg: BloomConfig,
    *,
    digest_precomputed: bool = False,
    fanin: int = 16,
    strategy: str = "auto",
    distinct_keys_hint: int | None = None,
    salt: int | str = 1,
) -> DataFrame:
    """Grouped Bloom aggregation: one sketch row per distinct key tuple.

    ``SELECT keys..., bloom_union_agg(digest64(value)) GROUP BY keys`` in
    spirit. Sketches are re-aggregable: per-repo outputs roll up to
    per-lang/global by further union (the reference's ``union``,
    ``src/lib.rs:286-317``).

    Strategies (SURVEY.md §2 #14 note):

    * ``"partial"`` — per-(key, partition) map-side partials, then the
      two-phase merge. Zero row shuffle; row-count skew is absorbed map-side
      (a hot key's rows never move). Right for LOW-cardinality keys (lang):
      partial volume = P * distinct_keys * m/8.
    * ``"shuffle"`` — hash-repartition the (key, digest) pairs (16 B/row) by
      key, build exactly ONE sketch per key in place. Right for
      HIGH-cardinality keys (repo): partial volume equals the final output,
      and the shuffled rows are digests, never content. Skewed hot keys cost
      row movement but each task still builds serially at kernel speed.
    * ``"auto"`` — shuffle when estimated partial inflation
      (min(distinct_keys, P) * P * m/8) exceeds 1 GiB, else partial. Pass
      ``distinct_keys_hint`` to avoid a countDistinct job.

    ``salt`` (shuffle strategy only): with ``salt > 1`` the repartition key
    becomes ``(keys..., pmod(xxhash64(digest), salt))``, so a hot key's rows
    split across up to ``salt`` tasks — no single-task straggler when one
    key owns most of the corpus. Each task builds sub-sketches; a two-phase
    OR-merge per key reassembles them. OR is associative/commutative, so
    the result is BITWISE-identical to unsalted (tested); the extra cost is
    ≤ salt sketch rows (m/8 B each) per key through the merge.
    ``salt="auto"`` derives the value from a hash-sampled top-key share
    (one thin map-combined job; see :func:`_auto_salt`) — 1 when no key
    dominates, ~share×shuffle-width when one does.
    """
    keys = list(key_cols)
    prepared = _prepare_digests(df, keys, value_col, cfg,
                                digest_precomputed)

    if strategy == "auto" and keys:
        n_keys = distinct_keys_hint
        if n_keys is None:
            n_keys = prepared.select(*keys).distinct().count()
        p_in = prepared.rdd.getNumPartitions()
        # UPPER bound on partial volume: every partition can contain up to
        # n_keys distinct keys (min(n_keys, P) underestimated by n_keys/P
        # for high-cardinality keys and could never pick shuffle for small
        # sketches). Overestimating only flips to "shuffle", whose cost is
        # a safe 16 B/row digest shuffle. Threshold 256 MiB (round 7,
        # was 1 GiB): at 512 MB of raw partial state the decode+OR merge
        # already dominates — measured 3.1 s partial vs 1.9 s shuffle for
        # 8 keys x 64 partitions x 1 MB sketches at sf1.0.
        inflation = n_keys * p_in * cfg.num_words * 8
        strategy = "shuffle" if inflation > (1 << 28) else "partial"
    elif strategy == "auto":
        strategy = "partial"
    if strategy not in ("partial", "shuffle"):
        raise ValueError(f"unknown strategy {strategy!r}")

    if strategy == "shuffle" and keys:
        if salt == "auto":
            salt = _auto_salt(prepared, keys, "__digest64")
        return _bloom_agg_shuffled(prepared, keys, cfg, fanin=fanin,
                                   salt=salt)
    if salt == "auto":
        salt = 1  # partial strategy absorbs skew map-side; salt is a no-op
    partials = bloom_partials(prepared, "__digest64", cfg, keys)
    return bloom_merge(partials, keys, fanin=fanin)


def _auto_salt(prepared: DataFrame, keys: list[str], value_col: str,
               *, sample_mod: int = 16, max_salt: int | None = None) -> int:
    """Derive the skew salt from a hash-sampled top-key share (VERDICT r04
    #7) instead of a manual knob.

    One thin job: rows are hash-subsampled (~1/sample_mod via
    ``pmod(xxhash64(value), sample_mod) == 0`` — deterministic, no RNG;
    uniform when values are digests, and per-key representative whenever a
    key's values are diverse — a key of ONE repeated value samples all-or-
    nothing, an accepted bias for a spread heuristic), the sampled
    key histogram is map-side combined, and only (max, sum) come back.
    The hot key's share decides how many tasks its rows NEED to match a
    balanced layout: ``want = share * n_shuffle``; salt 1 when the top key
    already fits in ~one task's fair share (want <= 1.5), else
    ceil(want) capped at the shuffle width. Sampling error on a share
    large enough to matter (>= a few % of rows) is negligible; a share
    too small to sample reliably also cannot straggle a task."""
    import math

    from ..session import shuffle_partition_count

    n_shuffle = shuffle_partition_count(prepared.sparkSession)
    sampled = prepared.filter(
        F.pmod(F.xxhash64(F.col(value_col)), F.lit(sample_mod)) == 0)
    row = sampled.groupBy(*keys).agg(F.count("*").alias("__c")) \
        .agg(F.max("__c").alias("top"), F.sum("__c").alias("tot")).first()
    if row is None or not row.tot:
        return 1
    want = (row.top / row.tot) * n_shuffle
    if want <= 1.5:
        return 1
    return int(min(math.ceil(want), max_salt or n_shuffle))


def _bloom_agg_shuffled(
    prepared: DataFrame, keys: list[str], cfg: BloomConfig,
    *, fanin: int = 16, salt: int = 1,
) -> DataFrame:
    """One-shuffle grouped build: repartition (key, digest) rows by key,
    then fold each co-located group into exactly one sketch.

    ``salt > 1`` repartitions by (keys..., pmod(xxhash64(digest), salt))
    instead — a skew-proof variant that splits hot keys over up to ``salt``
    tasks and OR-merges the per-task sub-sketches per key (bitwise-equal
    output; see :func:`bloom_agg`)."""
    if salt > 1:
        salt_col = F.pmod(F.xxhash64(F.col("__digest64")),
                          F.lit(salt)).cast("int")
        # explicit numPartitions: AQE coalesces column-only repartitions of
        # small exchanges back into few tasks, silently undoing the salt —
        # the caller asked for the spread, so pin it ("auto"-managed confs
        # fall back to defaultParallelism)
        from ..session import shuffle_partition_count

        n_shuffle = shuffle_partition_count(prepared.sparkSession)
        salted = prepared.repartition(
            n_shuffle, *[F.col(c) for c in keys], salt_col)
        partials = bloom_partials(salted, "__digest64", cfg, keys)
        return bloom_merge(partials, keys, fanin=fanin)
    key_schema = _key_schema(prepared, keys)
    schema = key_schema + ", " + SKETCH_FIELDS
    m, k, seed = cfg.num_bits, cfg.num_hashes, cfg.seed
    num_words, layout = cfg.num_words, cfg.layout
    digest_kind = cfg.digest
    seed_signed = signed64(seed)

    def build_groups(batches: Iterator[pd.DataFrame]) -> Iterator[pd.DataFrame]:
        acc: dict[tuple, tuple[np.ndarray, int]] = {}
        for pdf in batches:
            hashes_all = source_hash(_digests_to_u64(pdf["__digest64"]), seed)
            for key_vals, idx in pdf.groupby(keys, sort=False,
                                             dropna=False).indices.items():
                if not isinstance(key_vals, tuple):
                    key_vals = (key_vals,)
                key_vals = _norm_key_vals(key_vals)
                words, seen = acc.setdefault(
                    key_vals, (np.zeros(num_words, dtype=U64), 0))
                insert_hashes(words, hashes_all[idx], k, layout)
                acc[key_vals] = (words, seen + len(idx))
        if not acc:
            return
        yield pd.DataFrame(
            [(*kv, m, k, seed_signed, layout, digest_kind, seen,
              encode_words(words))
             for kv, (words, seen) in acc.items()],
            columns=[*keys, "m", "k", "seed", "layout", "digest",
                     "rows_seen", "sketch"])

    return prepared.repartition(*[F.col(c) for c in keys]) \
        .mapInPandas(build_groups, schema)


def bloom_rollup(
    df: DataFrame,
    key_cols: Sequence[str],
    value_col: str | Column,
    cfg: BloomConfig,
    *,
    digest_precomputed: bool = False,
    fanin: int = 16,
    distinct_keys_hint: int | None = None,
) -> DataFrame:
    """Hierarchical rollup of sketches: one sketch per prefix level of
    ``key_cols`` — (k1, k2, ..., kn), (k1, ..., k_{n-1}), ..., (), with
    nulls marking rolled-up columns (the ``rollup`` shape).

    Rows are read ONCE (the finest level); every coarser level is a pure
    sketch union of the level below — the re-aggregability the reference's
    ``union`` provides (fastbloom src/lib.rs:286-317). At 10^12-file scale
    this is the difference between n-row scans per level and KB-sized merges.
    """
    keys = list(key_cols)
    finest = bloom_agg(df, keys, value_col, cfg,
                       digest_precomputed=digest_precomputed, fanin=fanin,
                       distinct_keys_hint=distinct_keys_hint)
    # eager localCheckpoint per level (sketch-row-sized frames): each
    # coarser level reads the MATERIALIZED level below instead of
    # re-executing every intermediate merge through lineage (O(n^2)
    # stages), and nothing stays persisted past the call (a bare persist
    # here leaked cached partitions for the session lifetime)
    finest = finest.localCheckpoint(eager=True)
    levels = [finest.withColumn("rollup_level", F.lit(len(keys)))]
    current = finest
    for level in range(len(keys) - 1, -1, -1):
        coarser_keys = keys[:level]
        grouped = (current.groupBy(*coarser_keys) if coarser_keys
                   else current.groupBy())
        key_schema = _key_schema(finest, coarser_keys)
        merged = grouped.applyInPandas(
            _merge_fn(coarser_keys),
            (key_schema + ", " if key_schema else "") + SKETCH_FIELDS) \
            .localCheckpoint(eager=True)
        current = merged
        padded = merged
        for k_name in keys[level:]:
            padded = padded.withColumn(
                k_name, F.lit(None).cast(
                    dict(finest.dtypes)[k_name]))
        levels.append(padded.select(*keys, "m", "k", "seed", "layout",
                                    "digest", "rows_seen", "sketch")
                      .withColumn("rollup_level", F.lit(level)))
    # Layout must ride through every level: dropping it would hydrate
    # block64 rollup rows as flat (wrong membership) and diverge the
    # schema from bloom_agg.
    out = levels[0].select(*keys, "m", "k", "seed", "layout", "digest",
                           "rows_seen", "sketch", "rollup_level")
    for lv in levels[1:]:
        out = out.unionByName(lv)
    return out


def bloom_build(
    df: DataFrame,
    value_col: str | Column,
    cfg: BloomConfig | None = None,
    *,
    fp: float | None = None,
    expected_items: int | None = None,
    seed: int = 0,
    digest: str = "sha256",
    digest_precomputed: bool = False,
    fanin: int = 16,
) -> BloomFilter:
    """Global build: DataFrame column → one :class:`BloomFilter` on the driver.

    The FPR-driven path without ``expected_items`` runs ``df.count()`` first —
    the distributed mirror of the reference's ``.items(iter)`` builder needing
    ``iter.len()`` (``src/builder.rs:120-128``). Only the final merged sketch
    row (m/8 bytes) is collected.

    Seed convention: operator entry points default to a FIXED seed
    (deterministic-by-default — distributed jobs are rerun, diffed, and
    resumed, so cross-run bit-reproducibility is the safe default);
    reference-style random seeding (``src/hasher.rs:50-75``) is opt-in by
    constructing ``BloomConfig(seed=None)`` explicitly.
    """
    n_hint = expected_items
    if cfg is None:
        if fp is None:
            raise ValueError("provide cfg or fp")
        n_hint = expected_items if expected_items is not None else df.count()
        cfg = BloomConfig.from_false_pos(fp, expected_items=max(n_hint, 1),
                                         seed=seed, digest=digest)

    prepared = _prepare_digests(df, [], value_col, cfg,
                                digest_precomputed)

    # plan parallelism + merge topology (see plans/planner.py for the model)
    from ..plans import plan_bloom_build

    sc = df.sparkSession.sparkContext
    plan = plan_bloom_build(
        cfg,
        input_partitions=prepared.rdd.getNumPartitions(),
        default_parallelism=sc.defaultParallelism,
        expected_items=n_hint,
    )
    if plan.build_partitions < prepared.rdd.getNumPartitions():
        if plan.scan_strategy == "shuffle":
            # digest column is 8 B/row: repartition keeps the sha2 scan at
            # full parallelism and ships only digests to the build tasks
            prepared = prepared.repartition(plan.build_partitions)
        else:
            prepared = prepared.coalesce(plan.build_partitions)

    if plan.merge_strategy == "range_sharded":
        sharded = bloom_partials_sharded(prepared, "__digest64", cfg)
        return bloom_merge_sharded(sharded, cfg)

    partials = bloom_partials(prepared, "__digest64", cfg)
    # global merge: partial payloads are zlib-compressed when sparse, and the
    # Arrow collect path (toPandas) moves them at memory speed, so a
    # driver-side collect-and-OR beats a shuffle round; grouped aggregations
    # (bloom_agg) keep the distributed two-phase merge.
    pdf = partials.select("rows_seen", "sketch").toPandas()
    if pdf.empty:
        return BloomFilter(cfg)
    payloads = [bytes(b) for b in pdf["sketch"]]
    # decode to zero-copy views (raw payloads) / parallel threads (zlib
    # releases the GIL), then OR-reduce into one writable accumulator
    decode_view = lambda b: decode_words(b, copy=False)
    if len(payloads) > 4:
        from concurrent.futures import ThreadPoolExecutor

        with ThreadPoolExecutor(max_workers=min(16, len(payloads))) as ex:
            decoded = list(ex.map(decode_view, payloads))
    else:
        decoded = [decode_view(b) for b in payloads]
    acc = np.zeros(cfg.num_words, dtype=U64)
    for w in decoded:
        np.bitwise_or(acc, w, out=acc)
    return BloomFilter(cfg, acc, rows_seen=int(pdf["rows_seen"].sum()))


def sketch_row_to_filter(row) -> BloomFilter:
    """Hydrate a sketch row (from bloom_agg / checkpoint) into a filter."""
    seed = int(row.seed) & ((1 << 64) - 1)
    layout = getattr(row, "layout", None) or "flat"
    digest = getattr(row, "digest", None) or "sha256"
    cfg = BloomConfig(num_bits=int(row.m), num_hashes=int(row.k), seed=seed,
                      layout=layout, digest=digest)
    return BloomFilter(cfg, decode_words(bytes(row.sketch)),
                       rows_seen=int(row.rows_seen))


def _broadcast_probe_udf(spark: SparkSession, bloom: BloomFilter):
    """The ONE broadcast-probe closure behind bloom_contains_col AND
    register_bloom_sql: words ship once per executor and are viewed
    zero-copy per batch (copying a multi-MB filter per batch is pure
    waste). NULL digests must be filtered UPSTREAM: one NULL converts the
    whole Arrow batch to float64, corrupting every digest >= 2^53 before
    any code runs — the guard refuses such batches loudly instead of
    probing wrong bits (bloom_semi_join pre-filters its probe keys)."""
    words_bc = spark.sparkContext.broadcast(bloom.to_bytes())
    k, seed, layout = bloom.num_hashes, bloom.seed, bloom.config.layout

    @F.pandas_udf(BooleanType())
    def probe(digests: pd.Series) -> pd.Series:
        words = words_from_bytes(words_bc.value, copy=False)
        hashes = source_hash(_digests_to_u64(digests), seed)
        return pd.Series(contains_hashes(words, hashes, k, layout))

    # asNondeterministic (guide §4.4): the probe is pure, but declaring it
    # non-deterministic stops the optimizer duplicating the evaluation and
    # — the measured win — stops InferFiltersFromConstraints copying the
    # probe onto the BUILD side of the exact semi-join through the join
    # key (both sides were paying the Python probe; sf1.0 semijoin
    # 4.6 s -> 3.6 s, plain probe rows unchanged).
    return probe.asNondeterministic()


def bloom_contains_col(
    spark: SparkSession,
    bloom: BloomFilter,
    digest_col: Column | str,
) -> Column:
    """Boolean probe column: vectorized membership test against a broadcast
    filter. ``digest_col`` must be a digest64 (long) column — compose with
    :func:`digest64` for raw values. Filter NULL digests upstream (one
    NULL float64-corrupts the whole Arrow batch; the kernel refuses
    loudly)."""
    probe = _broadcast_probe_udf(spark, bloom)
    c = F.col(digest_col) if isinstance(digest_col, str) else digest_col
    return probe(c)


def register_bloom_sql(spark: SparkSession, name: str, bloom: BloomFilter) -> str:
    """Register ``bloom_contains_<name>(digest64_col)`` for use from SQL."""
    fn_name = f"bloom_contains_{name}"
    spark.udf.register(fn_name, _broadcast_probe_udf(spark, bloom))
    return fn_name


def bloom_semi_join(
    left: DataFrame,
    right: DataFrame,
    left_on: str,
    right_on: str | None = None,
    *,
    fp: float = 0.001,
    seed: int = 42,
    digest: str = "xxh64",
    exact: bool = True,
    expected_items: int | None = None,
    layout: str = "flat",
) -> DataFrame:
    """Sketch-accelerated semi-join: Bloom-prefilter the probe side with the
    build side's key filter, then (optionally) finish with an exact
    ``left_semi`` join for zero false positives.

    ``digest`` defaults to ``"xxh64"`` (round 7): join KEYS carry no
    content-sha256 invariant, the digest scan runs over the BIG probe
    side, and the xxh64 intrinsic halves the whole operator's wall time
    (sf1.0: 4.6 s -> 2.1 s). The exact finish makes the result identical
    under any digest; pass ``digest="sha256"`` to restore the old
    prefilter bits (only the ``exact=False`` triage mode can observe the
    difference, as a different ~fp false-positive set).

    The classic runtime-filter pattern (Spark's own
    ``spark.sql.optimizer.runtimeFilter.bloomFilter.enabled`` is the built-in
    analogue): at 100 TB the prefilter runs map-side against a broadcast
    m/8-byte bit array and drops non-matching rows before they reach the join
    shuffle. Zero false negatives (the Bloom contract) make it semantically
    transparent.

    Seed defaults to a fixed value (deterministic-by-default, like every
    operator entry point); build with ``BloomConfig(seed=None)`` +
    ``bloom_contains_col`` directly if random seeding is required.

    ``layout="block64"`` builds the prefilter in the register-blocked
    layout: ONE memory touch per probed row instead of k — the probe side
    is the big side of a semi-join, so this is where the blocked layout's
    ingest/probe advantage pays; costs ~1.3-2x bits for the same FPR
    (still KBs-to-MBs broadcast once per executor).
    """
    right_on = right_on or left_on
    spark = left.sparkSession
    # expected_items skips the sizing df.count() scan over the build side —
    # callers that know (even roughly) the build-side cardinality save a
    # full pass; over-estimates just waste bits, under-estimates raise FPR
    # but never break correctness (exact=True re-verifies)
    if layout not in ("flat", "block64"):
        raise ValueError(f"unknown layout {layout!r}")
    if layout == "block64":
        n_hint = expected_items
        if n_hint is None:
            n_hint = right.count()
        cfg = BloomConfig.block64_from_false_pos(
            fp, expected_items=max(n_hint, 1), seed=seed, digest=digest)
        # forward the cardinality so the planner keeps its cost-model P*
        # and scan-strategy choice (block64's faster kernel pushes P* down)
        bloom = bloom_build(
            right.select(F.col(right_on).alias("__key")), "__key", cfg,
            expected_items=n_hint)
    else:
        bloom = bloom_build(
            right.select(F.col(right_on).alias("__key")), "__key",
            fp=fp, seed=seed, digest=digest, expected_items=expected_items)
    # NULL keys never match a semi-join (NULL = NULL is not true) and a
    # NULL digest would float64-corrupt whole probe batches — drop first
    pre = left.filter(F.col(left_on).isNotNull()).filter(
        bloom_contains_col(spark, bloom,
                           digest64(F.col(left_on), bloom.config.digest)))
    if not exact:
        return pre
    # left_semi already deduplicates the build side — no .distinct() (it
    # would add a useless aggregate + exchange); AQE picks broadcast-hash
    # when the filtered build side is small at runtime
    return pre.join(right.select(F.col(right_on).alias(left_on)),
                    on=left_on, how="left_semi")
