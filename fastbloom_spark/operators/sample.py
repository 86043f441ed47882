"""Deterministic hash-driven sampling and dataset splitting.

Training-data pipelines need REPRODUCIBLE sampling at 100 TB: the same row
must land in the same split on every run, on any cluster, at any partition
count. So every operator here derives its randomness exclusively from
``xxhash64`` of the row's KEY columns — never from RNG state, partition
ids, or row order (``df.sample`` is none of those things: it is seeded per
partition, so a repartition reshuffles the sample). The hash doubles as
the cross-engine parity witness: DuckDB replays the identical bit-exact
xxh64 (``oracle_sql.sql_xxh64_utf8``), so the driver oracle pins the exact
sampled/assigned rows, not just counts.

All three operators are pure Catalyst expressions (zero Python in the hot
path):

* :func:`split_assign` — train/val/test assignment by weight. A pure
  projection: NO shuffle, NO action; the split column is computed inline
  wherever the scan runs. Thresholds are integer-exact signed-long
  constants, so assignment is a branch, not float math.
* :func:`sample_distinct` — bottom-k-by-hash over the DISTINCT keys: a
  uniform random k-subset of the key domain, identical on every run.
  One distinct shuffle, then Spark's sort+limit (TakeOrderedAndProject:
  per-partition top-k, k-row driver merge — never a global sort).
* :func:`stratified_sample` — n rows per stratum by hash order. One
  shuffle on the strata columns; a ``salt`` parameter two-phases hot
  strata (per-shard top-n first, so no single task ever sees more than
  its shard) — the superset law (union of shard top-n ⊇ global top-n)
  keeps the result exact.

Key convention: key columns are cast to string and joined with unit
separator 0x1F, then salted with 0x1E + the decimal seed — one string,
one ``xxhash64`` (Spark's fixed seed 42), replayed byte-for-byte by the
oracle. A NULL in any key column propagates: NULL hash → NULL split
(:func:`split_assign`) / excluded (samplers) — the NULL-in → NULL-out
convention of the SQL surface.

Beyond-reference surface (the reference is a membership library,
fastbloom src/lib.rs; sampling/splitting has no analogue there).
"""

from __future__ import annotations

from typing import Sequence

from pyspark.sql import Column, DataFrame, Window
from pyspark.sql import functions as F

#: unit separator between key columns inside the hashed string
KEY_SEP = "\x1f"
#: record separator introducing the seed salt
SEED_SEP = "\x1e"

_I64_MIN = -(1 << 63)


def key_hash(cols: Sequence[str | Column], seed: int = 42) -> Column:
    """Signed-long xxhash64 of the row key: columns cast to string, joined
    with 0x1F, salted with 0x1E + str(seed). NULL in any column → NULL.
    ``oracle_sql.sql_key_hash`` is the bit-exact DuckDB replay."""
    parts: list[Column] = []
    for c in cols:
        col = F.col(c) if isinstance(c, str) else c
        parts.append(col.cast("string"))
        parts.append(F.lit(KEY_SEP))
    parts[-1] = F.lit(SEED_SEP + str(int(seed)))
    key = F.concat(*parts)
    # xxhash64(NULL) is a NON-NULL constant (the seed) — guard explicitly
    # so a NULL key hashes to NULL, not to one shared bucket
    return F.when(key.isNull(), F.lit(None).cast("long")) \
        .otherwise(F.xxhash64(key))


def split_thresholds(weights: Sequence[float]) -> list[int]:
    """Signed-long upper bounds for all but the last split: threshold i is
    ``-2^63 + floor(cum_i / total * 2^64)``. The hash is uniform over the
    full signed-long range, so ``h < t_i`` selects exactly the cumulative
    weight share (to within 1/2^64 — exact for practical purposes and,
    more importantly, IDENTICAL constants in both engines)."""
    ws = [float(w) for w in weights]
    if len(ws) < 2:
        raise ValueError("need at least 2 splits")
    if any(w <= 0 for w in ws):
        raise ValueError("split weights must be > 0")
    total = sum(ws)
    out, cum = [], 0.0
    for w in ws[:-1]:
        cum += w / total
        # extreme weight ratios round float cum up to 1.0, whose raw
        # threshold 2^63 does not fit a Spark LongType literal — clamp to
        # i64 max (the comparison is strict, so the clamped threshold
        # still selects everything below it)
        out.append(min(_I64_MIN + int(cum * float(1 << 64)),
                       (1 << 63) - 1))
    return out


def split_assign(
    df: DataFrame,
    cols: Sequence[str | Column],
    splits: Sequence[tuple[str, float]],
    *,
    seed: int = 42,
    split_col: str = "split",
) -> DataFrame:
    """Assign each row to a named split by the hash of its key — the
    deterministic train/val/test operator.

    Pure projection (no shuffle, no action): at 100 TB this is free —
    Catalyst computes the CASE inline in whatever stage reads the rows,
    and a downstream ``.filter(split = 'train')`` costs one comparison per
    row. Rows sharing a key land in the same split by construction
    (leakage-safe splitting on e.g. a user or document id), and the
    assignment is stable under repartitioning, appends, and cluster-size
    changes — none of which is true of ``DataFrame.sample``.

    NULL keys get a NULL split (filter or coalesce downstream).
    """
    if len(splits) < 2:
        raise ValueError("need at least 2 splits")
    names = [n for n, _ in splits]
    if len(set(names)) != len(names):
        raise ValueError(f"duplicate split names: {names}")
    ts = split_thresholds([w for _, w in splits])
    h = key_hash(cols, seed)
    expr = F.lit(names[-1])
    for name, t in zip(reversed(names[:-1]), reversed(ts)):
        expr = F.when(h < F.lit(t), F.lit(name)).otherwise(expr)
    expr = F.when(h.isNull(), F.lit(None).cast("string")).otherwise(expr)
    return df.withColumn(split_col, expr)


def sample_fraction(
    df: DataFrame,
    cols: Sequence[str | Column],
    fraction: float,
    *,
    seed: int = 42,
) -> DataFrame:
    """Deterministic ``fraction``-sample by key hash: keep rows whose key
    hash falls below the fraction threshold — the reproducible
    counterpart of ``df.sample(fraction)`` (which is seeded per
    PARTITION, so a repartition reshuffles its sample).

    Pure filter (no shuffle, no action): Catalyst evaluates one hash +
    compare per row inside whatever stage reads it. All rows sharing a
    key are kept or dropped TOGETHER (leakage-consistent, like
    :func:`split_assign`), the sample is stable under repartitioning and
    appends, and samples at increasing fractions are NESTED (a 1% sample
    is a subset of the 2% sample — hash order is fixed). NULL keys are
    excluded (NULL-in -> NULL-out; a NULL hash fails the comparison)."""
    if not 0.0 < fraction <= 1.0:
        raise ValueError(f"fraction must be in (0, 1], got {fraction}")
    if fraction == 1.0:
        # the clamped threshold (i64 max) with a strict '<' would drop a
        # row whose key hash equals 2^63-1 (probability 2^-64, but it
        # contradicts "fraction 1.0 keeps everything"); the 100% sample
        # is exactly the non-NULL-key rows
        return df.filter(key_hash(cols, seed).isNotNull())
    t = min(_I64_MIN + int(fraction * float(1 << 64)), (1 << 63) - 1)
    return df.filter(key_hash(cols, seed) < F.lit(t))


def sample_distinct(
    df: DataFrame,
    cols: Sequence[str],
    k: int,
    *,
    seed: int = 42,
) -> DataFrame:
    """Uniform random ``k``-subset of the DISTINCT key tuples: the k
    smallest key hashes (bottom-k — the same retained-set law as the theta
    sketch, but carrying the VALUES). Deterministic given ``seed``;
    adding unrelated rows never evicts more than the hash order implies.

    Scale shape: one distinct shuffle on the key columns (map-side partial
    dedup first), then ``sort().limit(k)`` which Spark executes as
    TakeOrderedAndProject — per-partition top-k and a k-row driver merge,
    never a global sort. NULL keys are excluded (NULL-in → NULL-out).
    """
    if k < 1:
        raise ValueError("k must be >= 1")
    keyed = df.select(*cols).dropna(subset=list(cols)).distinct()
    h = key_hash(cols, seed)
    # key columns break (astronomically unlikely) 64-bit hash ties so the
    # selected SET is well-defined in every engine
    return (keyed.orderBy(h.asc(), *[F.col(c).asc() for c in cols])
            .limit(int(k)))


def stratified_sample(
    df: DataFrame,
    strata_cols: Sequence[str],
    key_cols: Sequence[str],
    n: int,
    *,
    seed: int = 42,
    salt: int = 1,
) -> DataFrame:
    """Deterministic ``n``-rows-per-stratum sample: within each stratum,
    the n rows with the smallest key hashes. The per-stratum quota is what
    balances a training mix (equal rows per language / source / bucket)
    regardless of how skewed the raw distribution is.

    Scale shape: one shuffle on the strata columns. A giant stratum would
    funnel into a single window task, so ``salt > 1`` two-phases it:
    phase 1 takes the top-n of each of ``salt`` hash-shards of the stratum
    (tasks see ~1/salt of the rows), phase 2 ranks the ≤ salt×n survivors.
    The union of shard top-n is a superset of the stratum top-n, so the
    result is EXACTLY the salt=1 output. Rows with NULL keys are excluded;
    NULL strata form their own stratum (SQL GROUP BY convention).
    """
    if n < 1:
        raise ValueError("n must be >= 1")
    if salt < 1:
        raise ValueError("salt must be >= 1")
    out = df.dropna(subset=list(key_cols))
    h = key_hash(key_cols, seed)
    order = [h.asc()] + [F.col(c).asc() for c in key_cols]
    if salt > 1:
        shard = F.pmod(h, F.lit(int(salt)))
        w1 = Window.partitionBy(*strata_cols, shard).orderBy(*order)
        out = (out.withColumn("_rn", F.row_number().over(w1))
               .filter(F.col("_rn") <= n).drop("_rn"))
    w = Window.partitionBy(*strata_cols).orderBy(*order)
    return (out.withColumn("_rn", F.row_number().over(w))
            .filter(F.col("_rn") <= n).drop("_rn"))
