"""Text-analysis operators: quality features, language-ID, fingerprints."""

from __future__ import annotations

import pytest
from pyspark.sql import functions as F

from fastbloom_spark.operators.text import (
    detect_lang_col,
    doc_fingerprint_col,
    quality_features,
    token_count_col,
)


def test_token_count_edges(spark):
    df = spark.createDataFrame(
        [(1, "one two three"), (2, ""), (3, "   "), (4, "single"),
         (5, "a\tb\nc  d")],
        ["id", "text"])
    out = {r.id: r.n for r in df.select(
        "id", token_count_col("text").alias("n")).collect()}
    assert out == {1: 3, 2: 0, 3: 0, 4: 1, 5: 4}


def test_quality_features_ranges_and_signal(spark):
    df = spark.createDataFrame([
        (1, "the quick brown fox jumps over the lazy dog near the river "
            "bank while birds sing in the morning light"),
        (2, "$$$ 1234 !!! 5678 ??? 90 ### 12 %%% 34"),
        (3, "spam spam spam spam spam spam spam spam spam spam"),
        (4, ""),
    ], ["id", "text"])
    rows = {r.id: r for r in quality_features(df).collect()}
    for r in rows.values():
        assert 0.0 <= r.quality_score <= 1.0
        assert r.punct_ratio >= 0 and r.digit_ratio >= 0
    # natural prose beats symbol soup and degenerate repetition
    assert rows[1].quality_score > rows[2].quality_score
    assert rows[1].quality_score > rows[3].quality_score
    assert rows[1].uniq_token_ratio > rows[3].uniq_token_ratio
    assert rows[2].digit_ratio > 0.2
    assert rows[4].n_tokens == 0


def test_detect_lang_heuristic(spark):
    df = spark.createDataFrame([
        (1, "the cat is in the house and it is warm"),
        (2, "der Hund ist nicht mit der Katze in dem Haus"),
        (3, "le chat est dans la maison avec les enfants"),
        (4, "el perro es grande y la casa es blanca"),
        (5, "xyzzy plugh qwerty asdf"),
    ], ["id", "text"])
    out = {r.id: r.lang for r in df.select(
        "id", detect_lang_col("text").alias("lang")).collect()}
    assert out[1] == "en"
    assert out[2] == "de"
    assert out[3] == "fr"
    assert out[4] == "es"
    assert out[5] == "und"


def test_doc_fingerprint_normalization(spark):
    df = spark.createDataFrame([
        (1, "Hello   World"),
        (2, "hello world"),
        (3, "  HELLO\tWORLD  "),
        (4, "hello worlds"),
    ], ["id", "text"])
    out = {r.id: r.fp for r in df.select(
        "id", doc_fingerprint_col("text").alias("fp")).collect()}
    assert out[1] == out[2] == out[3]
    assert out[4] != out[1]
    import hashlib
    assert out[2] == hashlib.sha256(b"hello world").hexdigest()


def test_quality_features_run_on_real_table(spark, sf_dir):
    docs = spark.read.parquet(f"{sf_dir}/documents.parquet")
    out = quality_features(docs)
    stats = out.agg(
        F.min("quality_score").alias("lo"),
        F.max("quality_score").alias("hi"),
        F.count("*").alias("n")).collect()[0]
    assert stats.n == docs.count()
    assert 0.0 <= stats.lo <= stats.hi <= 1.0


def test_bpe_token_count(spark):
    from fastbloom_spark.operators.text import bpe_token_count_col

    df = spark.createDataFrame([
        ("Hello, world! 42 foo-bar  baz",),
        ("",),
        ("   ",),
        ("abc123def",),
    ], ["text"])
    got = [r.n for r in df.select(
        bpe_token_count_col("text").alias("n")).collect()]
    # 'Hello' ',' ' world' '!' ' 42' ' foo' '-' 'bar' ' baz' = 9
    # 'abc' '123' 'def' = 3
    assert got == [9, 0, 0, 3]


def test_pii_features_and_redaction(spark):
    from fastbloom_spark.operators.text import pii_features, redact_pii_col

    df = spark.createDataFrame([
        (1, "mail a@b.com and c.d+x@sub.example.org today"),
        (2, "server 10.0.0.1 talks to 192.168.1.255 ok"),
        (3, "call +1 555 0100 or +44 (20) 7946-0958 now"),
        (4, "no pii here at all"),
        (5, None),
        (6, "mixed: e@f.io on 8.8.8.8 via +33 1 23 45 67 89"),
    ], "id long, text string")
    feats = {r.id: r for r in pii_features(df).collect()}
    assert (feats[1].n_email, feats[1].n_ipv4, feats[1].n_phone) == (2, 0, 0)
    assert (feats[2].n_email, feats[2].n_ipv4, feats[2].n_phone) == (0, 2, 0)
    assert (feats[3].n_email, feats[3].n_ipv4, feats[3].n_phone) == (0, 0, 2)
    assert (feats[4].n_email, feats[4].n_ipv4, feats[4].n_phone) == (0, 0, 0)
    # NULL text counts 0 (nothing to act on), redacts to NULL
    assert (feats[5].n_email, feats[5].n_ipv4, feats[5].n_phone) == (0, 0, 0)
    assert feats[6].n_email == 1 and feats[6].n_ipv4 == 1

    red = {r.id: r.red for r in df.select(
        "id", redact_pii_col("text").alias("red")).collect()}
    assert red[1] == "mail <EMAIL> and <EMAIL> today"
    assert red[2] == "server <IPV4> talks to <IPV4> ok"
    assert "<PHONE>" in red[3] and "555" not in red[3]
    assert red[4] == "no pii here at all"
    assert red[5] is None
    assert "@" not in red[6] and "8.8.8.8" not in red[6]
