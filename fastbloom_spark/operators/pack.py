"""Deterministic sequence packing — fixed-capacity document blocks.

Pretraining consumes fixed-length context windows; the corpus is
variable-length documents. Packing assigns each document to a (shard,
block) so that every block's token total stays within ``capacity``,
documents are never split, and — the part ``DataFrame.sample``-style
tooling never gives you — the assignment is a PURE FUNCTION of
(doc key, token counts, capacity, num_shards, seed): identical on every
run, every cluster, every partition layout.

Distributed shape (the only one that scales): a global greedy pack is a
sequential scan, so the corpus is sharded by ``key_hash`` (the same
replayable xxh64 convention as operators/sample.py) and packed greedily
WITHIN each shard — one shuffle on the shard id, then an embarrassingly
parallel per-shard scan. Waste stays bounded (next-fit wastes less than
one capacity per emitted block) and shards are independent, so 1000
executors pack 1000 shards concurrently.

Within a shard, documents are walked in key order and packed NEXT-FIT:
a document that no longer fits closes the block and opens a new one; a
document larger than ``capacity`` gets a block of its own (oversize-solo
— flagged, never silently truncated). Next-fit (not first-fit) is chosen
deliberately: it is a one-pass scan with O(1) state, which (a) runs as a
cumsum + binary-search loop over Arrow batches — O(blocks · log n) per
shard, no per-row Python — and (b) replays EXACTLY in DuckDB as a
recursive CTE, so the driver oracle pins every (doc → block) assignment
bit-for-bit.

Beyond-reference surface (the reference is a membership library,
fastbloom src/lib.rs; packing has no analogue there).
"""

from __future__ import annotations

import numpy as np
import pandas as pd
from pyspark.sql import DataFrame
from pyspark.sql import functions as F

from .sample import key_hash
from .text import token_count_col


def _pack_next_fit(tok: np.ndarray, capacity: int) -> np.ndarray:
    """Next-fit block ids for token counts ``tok`` (walked in order):
    maximal prefix runs with running sum <= capacity; an item that alone
    exceeds capacity forms a solo block. O(blocks * log n) via one cumsum
    and a searchsorted per block."""
    n = tok.shape[0]
    out = np.empty(n, dtype=np.int64)
    cs = np.cumsum(tok, dtype=np.int64)
    s = 0
    block = 0
    base = 0
    while s < n:
        e = int(np.searchsorted(cs, base + capacity, side="right"))
        if e == s:          # tok[s] alone exceeds capacity: solo block
            e = s + 1
        out[s:e] = block
        block += 1
        base = int(cs[e - 1])
        s = e
    return out


def pack_documents(
    df: DataFrame,
    id_col: str = "doc_id",
    text_col: str = "text",
    *,
    capacity: int = 2048,
    num_shards: int = 64,
    seed: int = 42,
    token_count=None,
    group_cols: tuple[str, ...] = (),
    payload_cols: tuple[str, ...] = (),
) -> DataFrame:
    """Assign every document to a deterministic (shard, block_id):
    ``sum(n_tokens)`` per block <= ``capacity`` except oversize-solo
    blocks (single document, ``oversize`` true).

    Output columns: ``id_col``, ``n_tokens``, [``group_cols``...],
    [``payload_cols``...], ``shard``, ``block_id``, ``oversize``. Rows
    with a NULL key are excluded (no deterministic identity to pack by —
    the sampling operators' NULL convention).

    ``token_count`` overrides the default whitespace token count with any
    Column (e.g. ``bpe_token_count_col("text")``); NULL counts pack as 0.

    ``group_cols`` keeps blocks from crossing logical boundaries (e.g.
    the train/val/test split: pass ``("split",)`` and every block is
    pure) — packing groups become (group_cols..., shard).

    ``payload_cols`` ride the pack shuffle untouched (no grouping role)
    so a downstream consumer gets the full packed rows WITHOUT a second
    join — at scale that join re-shuffles (and recomputes) every
    document a second time, which is the single most expensive thing a
    caller could accidentally do with this operator's output.
    """
    if capacity < 1:
        raise ValueError("capacity must be >= 1")
    if num_shards < 1:
        raise ValueError("num_shards must be >= 1")
    tok = token_count if token_count is not None else token_count_col(text_col)
    groups = list(group_cols)
    payload = [c for c in payload_cols if c not in groups]
    base = df.select(
        F.col(id_col),
        F.coalesce(tok, F.lit(0)).cast("long").alias("n_tokens"),
        *[F.col(g) for g in groups],
        *[F.col(p) for p in payload],
        F.pmod(key_hash([id_col], seed), F.lit(num_shards))
        .cast("int").alias("shard"),
    ).filter(F.col("shard").isNotNull())

    cap = int(capacity)

    def pack_shard(pdf: pd.DataFrame) -> pd.DataFrame:
        pdf = pdf.sort_values(id_col, kind="mergesort", ignore_index=True)
        toks = pdf["n_tokens"].to_numpy(dtype=np.int64)
        pdf["block_id"] = _pack_next_fit(toks, cap)
        pdf["oversize"] = toks > cap
        return pdf

    dtypes = dict(df.dtypes)
    extra_schema = "".join(
        f"{c} {dtypes[c]}, " for c in groups + payload)
    # id keeps its source dtype — corpus keys are just as often string
    # UUIDs/URLs as longs, and the applyInPandas schema must agree with
    # the Arrow batches or non-long ids fail at runtime
    schema = (f"{id_col} {dtypes[id_col]}, n_tokens long, "
              f"{extra_schema}shard int, block_id long, oversize boolean")
    return base.groupBy(*groups, "shard").applyInPandas(pack_shard,
                                                        schema=schema)


def global_block_ids(
    packed: DataFrame,
    *,
    group_cols: tuple[str, ...] = (),
    out_col: str = "global_block_id",
) -> DataFrame:
    """Renumber per-(group, shard) block ids into globally contiguous,
    deterministic 0-based ids: the dense rank of (group_cols..., shard,
    block_id) in lexicographic order (NULL group values last, like SQL
    ``ORDER BY ... NULLS LAST``).

    Scale shape: the per-(group, shard) block COUNTS are driver-sized
    metadata (groups x shards rows — thousands at most, regardless of
    table size), so the offsets are computed driver-side and broadcast
    back; the data takes one broadcast join and a projection — no global
    sort, no extra shuffle. The numbering is a pure function of the
    packed assignment, so it is stable across runs and partition layouts
    (same law as the packing itself).

    PRECONDITION (validated): per-key block ids must be dense from 0 —
    i.e. ``packed`` is a direct ``pack_documents`` output. A FILTERED
    frame (dropped blocks leave id gaps) is rejected with a clear error,
    because the offset arithmetic would emit non-contiguous ids and a
    true dense re-rank over per-block rows would not be driver-sized at
    scale — re-pack (or renumber blocks yourself) instead.

    The counts action and the returned frame each evaluate ``packed``'s
    lineage once — persist ``packed`` first when it is expensive (e.g.
    the full corpus_pipeline output)."""
    from functools import reduce

    from pyspark.sql import types as T

    keys = list(group_cols) + ["shard"]
    counts = (packed.groupBy(*keys)
              .agg((F.max("block_id") + F.lit(1)).alias("_nblocks"),
                   F.count_distinct("block_id").alias("_ndistinct"),
                   F.min("block_id").alias("_minblock"))
              .collect())
    bad = [r for r in counts
           if r["_minblock"] != 0 or r["_ndistinct"] != r["_nblocks"]]
    if bad:
        r = bad[0]
        key_desc = ", ".join(f"{k}={r[k]!r}" for k in keys)
        raise ValueError(
            f"per-key block ids are not dense from 0 (first offender: "
            f"{key_desc}: min={r['_minblock']}, distinct="
            f"{r['_ndistinct']}, max+1={r['_nblocks']}) — "
            "global_block_ids requires a direct pack_documents output; "
            "a filtered packed frame must be re-packed first")
    ordered = sorted(
        ((tuple(r[k] for k in keys), int(r["_nblocks"])) for r in counts),
        key=lambda kv: tuple((v is None, v) for v in kv[0]))
    off_rows, off = [], 0
    for key, nblocks in ordered:
        off_rows.append((*key, off))
        off += nblocks
    fields = [packed.schema[k] for k in keys] + [
        T.StructField("_offset", T.LongType(), False)]
    off_df = packed.sparkSession.createDataFrame(
        off_rows, T.StructType(fields))
    cond = reduce(lambda a, b: a & b,
                  [packed[k].eqNullSafe(off_df[k]) for k in keys])
    joined = packed.join(F.broadcast(off_df), cond)
    return (joined.withColumn(out_col, F.col("_offset") + packed["block_id"])
            .drop("_offset").drop(*[off_df[k] for k in keys]))


def pack_stats(packed: DataFrame, *, capacity: int) -> DataFrame:
    """Per-shard packing efficiency: blocks, docs, token fill ratio
    (tokens / (blocks * capacity), oversize blocks excluded from the
    denominator's premise but counted). One small aggregation."""
    per_block = packed.groupBy("shard", "block_id").agg(
        F.sum("n_tokens").alias("block_tokens"),
        F.count("*").alias("docs"),
        F.max(F.col("oversize").cast("int")).alias("oversize"))
    return per_block.groupBy("shard").agg(
        F.count("*").alias("n_blocks"),
        F.sum("docs").alias("n_docs"),
        F.sum("block_tokens").alias("n_tokens"),
        F.sum("oversize").cast("long").alias("n_oversize"),
        F.round(F.sum("block_tokens") /
                (F.count("*") * F.lit(float(capacity))), 4)
        .alias("fill_ratio"))
