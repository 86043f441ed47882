"""Benchmark decontamination: Bloom-prefiltered exact n-gram overlap.

The operator's contract is EXACTNESS — bloom prefilter (zero FN) + verify
join (zero FP) must equal the naive overlap join for every fp setting —
plus the scale shape (broadcast filter, narrow probe, candidates-only
shuffle). repetition_features and word_ngrams_col edge cases ride along.
"""

from __future__ import annotations

import pytest
from pyspark.sql import functions as F

from fastbloom_spark.operators.decontam import (
    benchmark_grams,
    contamination_report,
    decontaminate,
)
from fastbloom_spark.operators.text import repetition_features, word_ngrams_col


@pytest.fixture(scope="module")
def corpus(spark):
    rows = [
        (0, "the quick brown fox jumps over the lazy dog"),
        (1, "pack my box with five dozen liquor jugs"),
        # shares a 4-gram run with doc 0
        (2, "she saw the quick brown fox jumps far away"),
        (3, "completely unrelated text about sketches and spark plans"),
        (4, ""),            # empty: no grams, never flagged
        (5, None),          # NULL: no grams, never flagged
        (6, "tiny doc"),    # < n tokens: whole doc is one gram
        (7, "tiny doc"),    # exact dup of 6
    ]
    return spark.createDataFrame(rows, "doc_id long, text string") \
        .repartition(3)


def _naive_overlap(docs, bench, n):
    dg = docs.select("doc_id",
                     F.explode(word_ngrams_col("text", n)).alias("gram"))
    bg = benchmark_grams(bench, "text", ngram_n=n)
    return {(r.doc_id, r.n) for r in
            dg.join(bg, "gram").groupBy("doc_id")
              .agg(F.count_distinct("gram").alias("n")).collect()}


@pytest.mark.parametrize("fp", [0.5, 1e-2, 1e-5])
def test_report_equals_naive_join_for_every_fp(spark, corpus, fp):
    """Even a deliberately terrible fp=0.5 filter yields EXACT results —
    the verify join removes every false positive, the Bloom contract
    admits no false negatives."""
    bench = corpus.filter(F.col("doc_id").isin(0, 6))
    got = {(r.doc_id, r.n_matched_grams) for r in
           contamination_report(corpus, bench, ngram_n=4, fp=fp).collect()}
    assert got == _naive_overlap(corpus, bench, 4)
    # doc 0 matches itself, doc 2 shares a run, docs 6/7 collide on the
    # whole-doc gram; empty/NULL/unrelated docs are absent
    flagged = {d for d, _ in got}
    assert {0, 2, 6, 7} <= flagged
    assert flagged.isdisjoint({3, 4, 5})


def test_sketch_only_mode_is_superset(spark, corpus):
    bench = corpus.filter(F.col("doc_id") == 0)
    exact_ids = {r.doc_id for r in contamination_report(
        corpus, bench, ngram_n=4, fp=0.3).collect()}
    fast_ids = {r.doc_id for r in contamination_report(
        corpus, bench, ngram_n=4, fp=0.3, exact=False).collect()}
    assert exact_ids <= fast_ids


def test_min_matches_threshold(spark, corpus):
    bench = corpus.filter(F.col("doc_id") == 0)
    rep = contamination_report(corpus, bench, ngram_n=2, fp=1e-3,
                               min_matches=3)
    for r in rep.collect():
        assert r.n_matched_grams >= 3


def test_decontaminate_removes_exactly_the_flagged(spark, corpus):
    bench = corpus.filter(F.col("doc_id").isin(0, 6))
    flagged = {r.doc_id for r in contamination_report(
        corpus, bench, ngram_n=4, fp=1e-3).collect()}
    survivors = {r.doc_id for r in
                 decontaminate(corpus, bench, ngram_n=4, fp=1e-3).collect()}
    all_ids = {r.doc_id for r in corpus.select("doc_id").collect()}
    assert survivors == all_ids - flagged


def test_word_ngrams_edges(spark):
    df = spark.createDataFrame(
        [(1, None), (2, ""), (3, "   "), (4, "one two"),
         (5, "a b c d")],
        "id long, text string")
    out = {r.id: r.g for r in
           df.select("id", word_ngrams_col("text", 3).alias("g")).collect()}
    assert out[1] == [] and out[2] == [] and out[3] == []
    assert out[4] == ["one two"]          # short doc -> whole-doc gram
    assert out[5] == ["a b c", "b c d"]   # sliding window


def test_repetition_features_values(spark):
    df = spark.createDataFrame(
        [(1, "a a a a"), (2, "w x y z"), (3, ""), (4, None),
         (5, "go go go stop")],
        "id long, text string")
    rows = {r.id: r for r in repetition_features(df).collect()}
    assert rows[1].dup_token_ratio == 0.75      # 1 distinct of 4
    assert rows[1].dup_2gram_ratio == pytest.approx(1 - 1 / 3, abs=1e-4)
    assert rows[2].dup_token_ratio == 0.0
    assert rows[3].dup_token_ratio == 0.0 and rows[3].dup_2gram_ratio == 0.0
    assert rows[4].dup_token_ratio == 0.0
    assert rows[5].dup_token_ratio == 0.5       # go,stop distinct of 4
    # "go go" repeats once among 3 bigrams
    assert rows[5].dup_2gram_ratio == pytest.approx(1 - 2 / 3, abs=1e-4)


def test_probe_stage_is_narrow(spark, corpus):
    """The gram explode + Bloom probe must not shuffle the gram stream:
    the only exchanges in the report plan are the benchmark-side build,
    the broadcast, and the final per-doc aggregation."""
    bench = corpus.filter(F.col("doc_id") == 0)
    rep = contamination_report(corpus, bench, ngram_n=4, fp=1e-3)
    plan = rep._jdf.queryExecution().executedPlan().toString()
    # corpus-side gram stream reaches the probe via generate+filter with no
    # Exchange in between: assert no sort-merge join anywhere (the verify
    # join must stay broadcast)
    assert "SortMergeJoin" not in plan
    assert "BroadcastHashJoin" in plan or "BroadcastNestedLoopJoin" in plan


def test_prefilter_switch_paths_identical(spark, corpus):
    """The size-aware prefilter switch (r7): driver-sized gram sets skip
    the Bloom and probe the broadcast strings directly — output must be
    IDENTICAL to the Bloom-prefiltered path (forced via
    prefilter_min_grams=0), in exact mode, for every fp."""
    bench = corpus.filter(F.col("doc_id").isin(0, 6))
    small = {(r.doc_id, r.n_matched_grams) for r in contamination_report(
        corpus, bench, ngram_n=4, fp=1e-3).collect()}
    bloomed = {(r.doc_id, r.n_matched_grams) for r in contamination_report(
        corpus, bench, ngram_n=4, fp=1e-3,
        prefilter_min_grams=0).collect()}
    assert small == bloomed == _naive_overlap(corpus, bench, 4)
