"""corpus_pipeline: the composed training-data pipeline is deterministic
end to end — each stage does its one job, blocks never cross splits, and
the whole thing is invariant to input partitioning."""

from __future__ import annotations

import pytest
from pyspark.sql import functions as F

from fastbloom_spark.operators.pipeline import (
    CorpusPipelineConfig,
    corpus_pipeline,
)

# 0.35 sits between junk (punct soup 0.16, empty 0.30 — the third score
# term alone) and the thinnest real doc here (~0.49)
CFG = CorpusPipelineConfig(min_quality=0.35, pack_capacity=64,
                           pack_shards=4, decontam_ngram=4)


@pytest.fixture(scope="module")
def docs(spark):
    rows = []
    for i in range(120):
        rows.append((i, " ".join(f"tok{(i * 13 + j) % 97}"
                                 for j in range(20 + i % 30))))
    # exact dup pair (differs only in whitespace -> same fingerprint)
    rows.append((200, "alpha beta gamma delta epsilon zeta eta theta"))
    rows.append((201, "alpha  beta gamma delta epsilon zeta  eta theta"))
    # dup pair that differs only in a redacted span
    rows.append((210, "contact a@b.example please alpha beta gamma delta"))
    rows.append((211, "contact c@d.example please alpha beta gamma delta"))
    # junk: punctuation soup (fails min_quality) and NULL/empty
    rows.append((220, "!!! ??? ... !!! ??? ... !!! ??? ... !!! ???"))
    rows.append((221, None))
    rows.append((222, "   "))
    return spark.createDataFrame(rows, "doc_id long, text string")


@pytest.fixture(scope="module")
def bench(spark):
    # shares a 4-gram run with docs 200/201 (post-dedup survivor is 200)
    return spark.createDataFrame(
        [(0, "held out eval alpha beta gamma delta epsilon")],
        "doc_id long, text string")


@pytest.fixture(scope="module")
def result(spark, docs, bench):
    return corpus_pipeline(docs, bench=bench, cfg=CFG).toPandas()


def test_stage_semantics(result):
    ids = set(result.doc_id)
    # NULL / empty / low-quality rows are gone
    assert not {220, 221, 222} & ids
    # whitespace-dup pair: min-id survivor only
    assert 201 not in ids
    # redaction-dup pair: both redact to the same text -> one survivor;
    # and neither survivor text contains a raw email
    assert 211 not in ids
    if 210 in ids:
        t = result[result.doc_id == 210].text.iloc[0]
        assert "<EMAIL>" in t and "@" not in t.replace("<EMAIL>", "")
    # 200 shares "alpha beta gamma delta" with the bench -> decontaminated
    assert 200 not in ids and 210 not in ids


def test_blocks_pure_and_capacity(result):
    per_block = result.groupby(["split", "shard", "block_id"]).agg(
        tokens=("n_tokens", "sum"), n=("doc_id", "count"),
        over=("oversize", "max"))
    for _, row in per_block.iterrows():
        if row["over"]:
            assert row["n"] == 1
        else:
            assert row["tokens"] <= CFG.pack_capacity
    assert set(result.split) <= {"train", "val", "test"}


def test_partition_invariance(spark, docs, bench, result):
    b = corpus_pipeline(docs.repartition(7, "doc_id"), bench=bench,
                        cfg=CFG).toPandas()
    key = ["doc_id", "text", "quality_score", "n_tokens", "split",
           "shard", "block_id", "oversize"]
    assert sorted(map(tuple, b[key].values.tolist())) == \
        sorted(map(tuple, result[key].values.tolist()))


def test_no_bench_skips_decontam(spark, docs):
    out = corpus_pipeline(docs, cfg=CFG).toPandas()
    # without a benchmark, 200 (the contaminated survivor) stays
    assert 200 in set(out.doc_id)
