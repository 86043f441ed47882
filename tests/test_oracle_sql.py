"""Bit-parity of the generated DuckDB SQL hash replicas vs the pure-int
kernel (the foundation under the simhash/minhash/winnow oracle rows)."""

from __future__ import annotations

import random

import duckdb
import numpy as np
import pytest

from fastbloom_spark import oracle_sql as osql
from fastbloom_spark.kernel import mix64, xxh64_bytes


@pytest.fixture(scope="module")
def duck():
    con = duckdb.connect()
    yield con
    con.close()


def test_sql_mix64_parity(duck):
    vals = [0, 1, 42, 7, 2**31, 2**63, 2**64 - 1, 0xDEADBEEF12345678]
    for v in vals:
        got = duck.execute(
            f"SELECT {osql.sql_mix64(f'{v}::HUGEINT')}").fetchone()[0]
        assert got == int(mix64(v)), v


def test_sql_mix64_int_matches_kernel():
    for v in [0, 7, 42, 2**63 + 12345]:
        assert osql._mix64_int(v) == int(mix64(v))


def test_sql_xxh64_parity_all_length_classes(duck):
    """Covers every code path: empty, <4, <8, <32 (no stripes), exact
    stripe multiples, stripe+tails, multi-byte UTF-8, long strings."""
    rng = random.Random(13)
    tests = ["", "a", "ab", "abc", "abcd", "abcdefg", "abcdefgh",
             "hello world", "x" * 31, "y" * 32, "z" * 33, "w" * 64,
             "v" * 71, "héllo wörld 漢字", "汉字" * 40]
    tests += ["".join(chr(rng.randrange(32, 0x2500))
                      for _ in range(rng.randrange(0, 200)))
              for _ in range(30)]
    duck.execute("CREATE OR REPLACE TABLE xt(s VARCHAR)")
    duck.executemany("INSERT INTO xt VALUES (?)", [(s,) for s in tests])
    got = [r[0] for r in duck.execute(
        f"SELECT {osql.sql_xxh64_utf8('s')} FROM xt").fetchall()]
    want = [xxh64_bytes(s.encode('utf-8')) for s in tests]
    assert got == want


def test_sql_xxh64_matches_spark_engine(spark, duck):
    """Triangle closure: SQL replica == kernel replica == Spark's own
    xxhash64, on the same strings."""
    import pyspark.sql.functions as F

    samples = ["alpha", "beta gamma", "x" * 50, "汉字テスト"]
    sdf = spark.createDataFrame([(s,) for s in samples], ["s"]) \
        .select(F.xxhash64("s").alias("h"))
    spark_vals = [r.h for r in sdf.collect()]
    duck.execute("CREATE OR REPLACE TABLE st(s VARCHAR)")
    duck.executemany("INSERT INTO st VALUES (?)", [(s,) for s in samples])
    duck_vals = [r[0] for r in duck.execute(
        f"SELECT {osql.sql_xxh64_utf8('s')} FROM st").fetchall()]
    assert duck_vals == spark_vals


def test_oracle_builders_produce_single_statements():
    """The driver may execute oracle SQL one statement at a time — the
    generated oracles must be single SELECT/WITH statements (no macros,
    no registered functions)."""
    for sql in [osql.oracle_simhash(), osql.oracle_simhash_pairs(),
                osql.oracle_minhash_near_dups(),
                osql.oracle_winnow_fingerprint_counts()]:
        assert ";" not in sql
        assert sql.strip().upper().startswith("WITH")
