"""Driver-contract conformance: every queries() entry runs; every oracle_sql()
entry matches DuckDB value-for-value (replicating the driver's sorted
value-hash compare at sf0.01)."""

from __future__ import annotations

import math
import os
import sys

import duckdb
import pytest

sys.path.insert(0, os.path.dirname(os.path.dirname(os.path.abspath(__file__))))

import __spark_entry__ as entry_mod

SF_ORACLE = "/root/testdata/sf0.01"

TABLES = ["region", "nation", "customer", "supplier", "part", "orders",
          "lineitem", "events", "documents", "embeddings"]


@pytest.fixture(scope="module")
def duck():
    con = duckdb.connect()
    for t in TABLES:
        con.execute(
            f"CREATE VIEW {t} AS SELECT * FROM '{SF_ORACLE}/{t}.parquet'")
    yield con
    con.close()


def _normalize(rows, columns):
    """Order-insensitive canonical form: sort columns by name, round floats."""
    order = sorted(range(len(columns)), key=lambda i: columns[i])

    def norm_val(v):
        if isinstance(v, float):
            if math.isnan(v):
                return "nan"
            # full repr: every query is engineered to be BIT-exact across
            # engines (decimal-exact sums cast to rounded doubles, rounded
            # scores before ranking), so the repo-side gate is as strict
            # as any driver canonicalization can be
            return repr(v)
        if hasattr(v, "normalize"):  # Decimal
            return str(v)
        return repr(v)

    return sorted(tuple(norm_val(r[i]) for i in order) for r in rows)


def test_entry_smoke(spark):
    df = entry_mod.entry(spark)
    rows = df.collect()
    assert len(rows) >= 1
    assert {f.name for f in df.schema.fields} >= {
        "lang", "rows_seen", "bits_set", "expected_fpp"}
    # sanity: sketch density in (0, 1), rows_seen adds to table size
    assert sum(r.rows_seen for r in rows) == 500
    for r in rows:
        assert 0.0 < r.density < 1.0


def test_contract_structure():
    """Every queries() entry is executed (and value-compared) by
    test_oracle_match, so a separate run-them-all loop would double
    ~80 s of per-query work for no extra signal — this guard instead
    pins the structural contract: key parity between queries() and
    oracle_sql(), and the driver's 50-row window being exactly filled
    (the dict ORDER is load-bearing — see queries() block comments)."""
    qs = entry_mod.queries()
    oracles = entry_mod.oracle_sql()
    assert set(qs) == set(oracles)
    assert len(qs) >= 50  # the driver gate checks the first 50 in order
    # pin the 50-row window seam: an accidental reorder that shifts the
    # driver's stamp window must fail loudly (ADVICE r06)
    assert list(qs)[49] == "streaming_windowed_hll"
    for name, fn in qs.items():
        assert callable(fn), name
        assert oracles[name].strip(), name


@pytest.mark.parametrize("name", sorted(entry_mod.oracle_sql().keys()))
def test_oracle_match(spark, duck, name):
    fn = entry_mod.queries()[name]
    sdf = fn(spark, SF_ORACLE)
    spark_cols = sdf.columns
    spark_rows = [tuple(r) for r in sdf.collect()]

    res = duck.execute(entry_mod.oracle_sql()[name])
    duck_cols = [d[0] for d in res.description]
    duck_rows = res.fetchall()

    assert sorted(spark_cols) == sorted(duck_cols), name
    assert len(spark_rows) == len(duck_rows), name
    assert _normalize(spark_rows, spark_cols) == \
        _normalize(duck_rows, duck_cols), name


def test_oracle_output_types_are_hash_safe(duck):
    """The driver's value hash sees column WIDTH; the repr() compare above
    does not. DuckDB widens bare integer SUMs to HUGEINT (int128) while
    Spark emits BIGINT — rows/schema match, the driver hash doesn't
    (split_assign, CORRECTNESS_r06). Gate the whole class: DESCRIBE every
    oracle statement and refuse HUGEINT/DECIMAL output columns (house
    rule: accumulate wide, emit CAST(... AS BIGINT) / round(CAST(... AS
    DOUBLE), n))."""
    for name, sql in entry_mod.oracle_sql().items():
        rows = duck.execute(f"DESCRIBE {sql}").fetchall()
        for col, typ, *_ in rows:
            assert "HUGEINT" not in typ.upper(), (name, col, typ)
            assert "DECIMAL" not in typ.upper(), (name, col, typ)


def test_readme_query_counts_stay_in_sync():
    """README.md's driver-contract claim ('N queries (M with exact DuckDB
    oracles)') is auto-checked so doc drift fails CI (VERDICT r2 #10)."""
    import re

    import __spark_entry__ as entry

    text = open("/root/repo/README.md").read()
    m = re.search(r"(\d+) queries in `__spark_entry__.py` \((\d+) with exact",
                  text)
    assert m, "README driver-contract line missing or reworded"
    assert int(m.group(1)) == len(entry.queries())
    assert int(m.group(2)) == len(entry.oracle_sql())
