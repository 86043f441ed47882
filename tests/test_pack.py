"""Deterministic sequence packing: capacity law, partition invariance,
oversize-solo, NULL-key exclusion, next-fit kernel."""

from __future__ import annotations

import numpy as np
import pytest
from pyspark.sql import functions as F

from fastbloom_spark.operators.pack import (
    _pack_next_fit,
    global_block_ids,
    pack_documents,
    pack_stats,
)


def test_next_fit_kernel():
    # simple run
    assert _pack_next_fit(np.array([3, 3, 3, 3]), 6).tolist() == [0, 0, 1, 1]
    # exact fits
    assert _pack_next_fit(np.array([6, 6]), 6).tolist() == [0, 1]
    # oversize solo at start, middle, end
    assert _pack_next_fit(np.array([9, 2, 2]), 6).tolist() == [0, 1, 1]
    assert _pack_next_fit(np.array([2, 9, 2]), 6).tolist() == [0, 1, 2]
    assert _pack_next_fit(np.array([2, 2, 9]), 6).tolist() == [0, 0, 1]
    # zeros ride along
    assert _pack_next_fit(np.array([0, 6, 0]), 6).tolist() == [0, 0, 0]
    assert _pack_next_fit(np.array([], dtype=np.int64), 6).tolist() == []


@pytest.fixture(scope="module")
def corpus(spark):
    rows = [(i, " ".join(f"w{j}" for j in range(3 + (i * 7) % 40)))
            for i in range(200)]
    rows += [(200, None), (201, ""), (202, " ".join(["big"] * 500))]
    return spark.createDataFrame(rows, "doc_id long, text string")


def test_capacity_law_and_oversize(spark, corpus):
    packed = pack_documents(corpus, capacity=64, num_shards=4, seed=7)
    pdf = packed.toPandas()
    # every non-oversize block obeys the capacity
    per_block = pdf.groupby(["shard", "block_id"]).agg(
        tokens=("n_tokens", "sum"), n=("doc_id", "count"),
        over=("oversize", "max"))
    for (_, _), row in per_block.iterrows():
        if not row["over"]:
            assert row["tokens"] <= 64
        else:
            assert row["n"] == 1  # oversize docs are solo
    # the 500-token doc is oversize-solo
    big = pdf[pdf.doc_id == 202]
    assert bool(big.oversize.iloc[0])
    # NULL/empty text pack with zero tokens but are present
    assert set(pdf.doc_id) == set(range(203))
    assert pdf[pdf.doc_id == 200].n_tokens.iloc[0] == 0


def test_partition_invariance(spark, corpus):
    a = pack_documents(corpus.repartition(1), capacity=64, num_shards=4,
                       seed=7).toPandas()
    b = pack_documents(corpus.repartition(13, "doc_id"), capacity=64,
                       num_shards=4, seed=7).toPandas()
    key = ["doc_id", "n_tokens", "shard", "block_id", "oversize"]
    assert sorted(map(tuple, a[key].values.tolist())) == \
        sorted(map(tuple, b[key].values.tolist()))


def test_null_key_excluded(spark):
    df = spark.createDataFrame(
        [(1, "a b"), (None, "c d"), (2, "e f")],
        "doc_id long, text string")
    packed = pack_documents(df, capacity=10, num_shards=2, seed=1)
    ids = {r.doc_id for r in packed.collect()}
    assert ids == {1, 2}


def test_token_count_override(spark, corpus):
    from fastbloom_spark.operators.text import bpe_token_count_col

    packed = pack_documents(corpus, capacity=64, num_shards=4, seed=7,
                            token_count=bpe_token_count_col("text"))
    row = packed.filter(F.col("doc_id") == 0).collect()[0]
    assert row.n_tokens >= 3


def test_pack_stats(spark, corpus):
    packed = pack_documents(corpus, capacity=64, num_shards=4, seed=7)
    stats = pack_stats(packed, capacity=64).toPandas()
    assert stats.n_docs.sum() == 203
    assert (stats.fill_ratio > 0).all()
    assert (stats.fill_ratio <= 2.0).all()  # oversize can push past 1
    assert stats.n_oversize.sum() >= 1


def test_group_cols_blocks_pure_and_independent(spark, corpus):
    """group_cols packing == packing each group's subset independently,
    and no block ever crosses a group boundary."""
    from fastbloom_spark.operators.sample import split_assign

    tagged = split_assign(corpus, ["doc_id"],
                          [("train", 0.7), ("val", 0.3)], seed=3)
    packed = pack_documents(tagged, capacity=64, num_shards=4, seed=7,
                            group_cols=("split",)).toPandas()
    # purity: a (split, shard, block_id) triple identifies one group only
    # (split is part of the key, so this holds by construction) — the real
    # law is parity with independent per-group packs
    for name in ("train", "val"):
        solo = pack_documents(
            tagged.filter(F.col("split") == name), capacity=64,
            num_shards=4, seed=7).toPandas()
        sub = packed[packed.split == name]
        key = ["doc_id", "n_tokens", "shard", "block_id", "oversize"]
        assert sorted(map(tuple, sub[key].values.tolist())) == \
            sorted(map(tuple, solo[key].values.tolist()))
    # all rows survive (split never NULL for non-NULL doc_id)
    assert set(packed.doc_id) == set(range(203))


def test_string_ids_pack(spark):
    """Non-long document ids (string UUIDs/URLs are common corpus keys)
    must flow through the applyInPandas schema unchanged."""
    rows = [(f"url-{i:03d}", " ".join(f"w{j}" for j in range(3 + i % 9)))
            for i in range(60)]
    df = spark.createDataFrame(rows, "doc_id string, text string")
    packed = pack_documents(df, capacity=20, num_shards=3, seed=7)
    pdf = packed.toPandas()
    assert set(pdf.doc_id) == {r[0] for r in rows}
    assert str(dict(packed.dtypes)["doc_id"]) == "string"
    per_block = pdf.groupby(["shard", "block_id"]).n_tokens.sum()
    assert (per_block <= 20).all()
    # same id order law as long ids: within a shard, ids pack in sorted
    # (here lexicographic) order
    for _, sub in pdf.groupby("shard"):
        sub = sub.sort_values("doc_id")
        assert (sub.block_id.diff().dropna() >= 0).all()


def test_global_block_ids(spark, corpus):
    """Dense 0-based renumber over (group..., shard, block_id) in
    lexicographic order: contiguous, collision-free, order-preserving."""
    packed = pack_documents(corpus, capacity=64, num_shards=4, seed=7)
    out = global_block_ids(packed).toPandas()
    # every (shard, block_id) maps to exactly one global id and vice versa
    grp = out.groupby(["shard", "block_id"]).global_block_id.nunique()
    assert (grp == 1).all()
    uniq = out.drop_duplicates(["shard", "block_id"]) \
              .sort_values(["shard", "block_id"])
    gids = uniq.global_block_id.tolist()
    assert gids == list(range(len(gids)))  # dense AND order-preserving
    # row count unchanged (the broadcast join loses nobody)
    assert len(out) == packed.count()


def test_global_block_ids_grouped(spark, corpus):
    from fastbloom_spark.operators.sample import split_assign

    tagged = split_assign(corpus, ["doc_id"],
                          [("train", 0.7), ("val", 0.3)], seed=3)
    packed = pack_documents(tagged, capacity=64, num_shards=4, seed=7,
                            group_cols=("split",))
    out = global_block_ids(packed, group_cols=("split",)).toPandas()
    uniq = out.drop_duplicates(["split", "shard", "block_id"]) \
              .sort_values(["split", "shard", "block_id"])
    gids = uniq.global_block_id.tolist()
    assert gids == list(range(len(gids)))


def test_payload_cols_ride_through(spark, corpus):
    """payload_cols pass through the pack shuffle untouched and change
    NOTHING about the assignment (same (shard, block) as without)."""
    with_p = pack_documents(corpus, capacity=64, num_shards=4, seed=7,
                            payload_cols=("text",)).toPandas()
    without = pack_documents(corpus, capacity=64, num_shards=4,
                             seed=7).toPandas()
    key = ["doc_id", "n_tokens", "shard", "block_id", "oversize"]
    assert sorted(map(tuple, with_p[key].values.tolist())) == \
        sorted(map(tuple, without[key].values.tolist()))
    src = {r.doc_id: r.text for r in corpus.collect()}
    assert all(src[d] == t or (src[d] is None and t is None)
               for d, t in zip(with_p.doc_id, with_p.text))


def test_global_block_ids_rejects_gappy_input(spark, corpus):
    """A filtered packed frame (block-id gaps) would make the offset
    arithmetic emit non-contiguous ids — rejected with a clear error."""
    packed = pack_documents(corpus, capacity=64, num_shards=4, seed=7)
    filtered = packed.filter(~F.col("oversize") & (F.col("block_id") != 0))
    with pytest.raises(ValueError, match="not dense"):
        global_block_ids(filtered)
    # export surface: reachable from the operators package like siblings
    from fastbloom_spark.operators import global_block_ids as exported
    assert exported is global_block_ids
