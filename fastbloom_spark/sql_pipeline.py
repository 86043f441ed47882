"""SQL surface for the corpus-pipeline family: deterministic splitting,
sampling, decontamination, and packing reachable from PURE Spark SQL.

The sketch family already has a SQL surface (``sql.py``) and the skip
index has ``register_pruned_view`` — this module extends the same two
patterns to the round-5 pipeline operators, so a SQL-only user (a BI
tool, a notebook cell, a ``spark-sql`` shell) can run the training-data
pipeline without touching the Python API:

* :func:`register_split_sql` — a **SQL scalar function** (Spark 4 SQL
  UDF, ``CREATE TEMPORARY FUNCTION ... RETURN <expr>``) whose body is the
  exact :func:`~fastbloom_spark.operators.sample.split_assign` Catalyst
  expression: xxhash64 over the 0x1F-joined key with the 0x1E-seed salt,
  compared against the integer-exact thresholds. Zero Python anywhere —
  the function inlines into whole-stage codegen at the call site, so
  ``SELECT corpus_split(doc_id) ...`` costs the same as the Python API's
  pure projection and assigns IDENTICAL splits (same hash, same
  thresholds, same NULL -> NULL law).
* :func:`register_split_view` / :func:`register_decontam_view` /
  :func:`register_sample_view` / :func:`register_packed_view` — temp-view
  factories over the Python operators (the ``register_pruned_view``
  pattern): the view's PLAN is the operator's plan, so SQL consumers
  inherit the operators' scale shapes (broadcast Bloom prefilter, pure
  projection split, one-shuffle pack) unchanged.

Beyond-reference surface (the reference is a membership library,
fastbloom src/lib.rs; a SQL surface has no analogue there).
"""

from __future__ import annotations

from typing import Sequence

from pyspark.sql import DataFrame, SparkSession

from .operators.sample import KEY_SEP, SEED_SEP, split_thresholds

__all__ = [
    "register_split_sql",
    "register_split_view",
    "register_decontam_view",
    "register_sample_view",
    "register_packed_view",
]


def _df(spark: SparkSession, source: "DataFrame | str") -> DataFrame:
    # the view factories wrap pandas-UDF-backed operators, and a SQL-only
    # caller has no other funnel that ships the package to Python workers
    # (driver sys.path does not propagate) — same idempotent call the
    # driver-contract _read funnel makes
    from .deploy import ensure_shipped

    ensure_shipped(spark)
    return spark.table(source) if isinstance(source, str) else source


def _sql_str(s: str) -> str:
    return "'" + s.replace("\\", "\\\\").replace("'", "\\'") + "'"


def split_sql_expr(key_args: Sequence[str],
                   splits: Sequence[tuple[str, float]],
                   seed: int = 42) -> str:
    """The split CASE expression over the given SQL argument names —
    textually distinct from, but Catalyst-identical to, the
    ``split_assign`` column tree (same concat/salt/xxhash64/threshold
    constants, same NULL guard)."""
    if len(splits) < 2:
        raise ValueError("need at least 2 splits")
    names = [n for n, _ in splits]
    if len(set(names)) != len(names):
        raise ValueError(f"duplicate split names: {names}")
    ts = split_thresholds([w for _, w in splits])
    parts: list[str] = []
    for a in key_args:
        parts.append(f"cast({a} as string)")
        parts.append(_sql_str(KEY_SEP))
    parts[-1] = _sql_str(SEED_SEP + str(int(seed)))
    key = "concat(" + ", ".join(parts) + ")"
    whens = "".join(
        f" when xxhash64({key}) < {t}L then {_sql_str(name)}"
        for name, t in zip(names[:-1], ts))
    return (f"case when {key} is null then cast(null as string)"
            f"{whens} else {_sql_str(names[-1])} end")


def register_split_sql(
    spark: SparkSession,
    splits: Sequence[tuple[str, float]],
    *,
    name: str = "corpus_split",
    num_key_cols: int = 1,
    seed: int = 42,
) -> str:
    """Register ``name(k0 [, k1 ...]) -> split name`` as a pure-SQL scalar
    function (Spark SQL UDF) replicating :func:`split_assign` bit-exactly::

        register_split_sql(spark, [("train", .9), ("val", .05),
                                   ("test", .05)])
        spark.sql("SELECT *, corpus_split(doc_id) AS split FROM docs")

    Key columns of any type are accepted (implicitly cast to string, the
    same cast ``split_assign`` applies); a NULL in any key column yields a
    NULL split. The function body is a plain Catalyst expression — it
    inlines into whole-stage codegen wherever it is called, adding no
    shuffle and no Python. Returns ``name``."""
    if num_key_cols < 1:
        raise ValueError("num_key_cols must be >= 1")
    args = [f"k{i}" for i in range(num_key_cols)]
    arglist = ", ".join(f"{a} STRING" for a in args)
    body = split_sql_expr(args, splits, seed)
    spark.sql(f"CREATE OR REPLACE TEMPORARY FUNCTION {name}({arglist}) "
              f"RETURNS STRING RETURN {body}")
    return name


def register_split_view(
    spark: SparkSession,
    source: "DataFrame | str",
    view_name: str,
    cols: Sequence[str],
    splits: Sequence[tuple[str, float]],
    *,
    seed: int = 42,
    split_col: str = "split",
) -> str:
    """``source`` plus the deterministic split column, as a temp view
    (``split_assign`` is a pure projection, so the view adds zero cost to
    whatever SQL runs over it). Returns ``view_name``."""
    from .operators.sample import split_assign

    out = split_assign(_df(spark, source), list(cols), list(splits),
                       seed=seed, split_col=split_col)
    out.createOrReplaceTempView(view_name)
    return view_name


def register_decontam_view(
    spark: SparkSession,
    corpus: "DataFrame | str",
    bench: "DataFrame | str",
    view_name: str,
    *,
    id_col: str = "doc_id",
    text_col: str = "text",
    bench_text_col: str | None = None,
    ngram_n: int = 8,
    fp: float = 1e-3,
    min_matches: int = 1,
    exact: bool = True,
) -> str:
    """The per-document contamination report as a temp view: ``(id_col,
    n_matched_grams)`` for every corpus document sharing >=
    ``min_matches`` distinct word n-grams with the benchmark. The view's
    plan IS the operator's plan — broadcast Bloom over the benchmark
    grams, narrow in-scan probe, exact verify join — so::

        register_decontam_view(spark, "docs", "bench", "contaminated",
                               ngram_n=5)
        spark.sql(\"\"\"SELECT d.* FROM docs d
                     LEFT ANTI JOIN contaminated c
                     ON d.doc_id = c.doc_id\"\"\")

    is the full decontamination pipeline in SQL. Returns ``view_name``."""
    from .operators.decontam import contamination_report

    out = contamination_report(
        _df(spark, corpus), _df(spark, bench), id_col=id_col,
        text_col=text_col, bench_text_col=bench_text_col, ngram_n=ngram_n,
        fp=fp, min_matches=min_matches, exact=exact)
    out.createOrReplaceTempView(view_name)
    return view_name


def register_sample_view(
    spark: SparkSession,
    source: "DataFrame | str",
    view_name: str,
    cols: Sequence[str],
    k: int,
    *,
    seed: int = 42,
) -> str:
    """``sample_distinct`` (uniform deterministic k-subset of the distinct
    key tuples) as a temp view. Returns ``view_name``."""
    from .operators.sample import sample_distinct

    out = sample_distinct(_df(spark, source), list(cols), k, seed=seed)
    out.createOrReplaceTempView(view_name)
    return view_name


def register_packed_view(
    spark: SparkSession,
    source: "DataFrame | str",
    view_name: str,
    *,
    id_col: str = "doc_id",
    text_col: str = "text",
    capacity: int = 2048,
    num_shards: int = 64,
    seed: int = 42,
    group_cols: tuple[str, ...] = (),
    payload_cols: tuple[str, ...] = (),
) -> str:
    """``pack_documents`` as a temp view — SQL consumers read the
    deterministic (shard, block_id) assignment like any table. Returns
    ``view_name``."""
    from .operators.pack import pack_documents

    out = pack_documents(
        _df(spark, source), id_col, text_col, capacity=capacity,
        num_shards=num_shards, seed=seed, group_cols=group_cols,
        payload_cols=payload_cols)
    out.createOrReplaceTempView(view_name)
    return view_name
