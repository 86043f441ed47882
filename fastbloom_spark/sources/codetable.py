"""Deterministic synthesized source-code repository table.

The BASELINE.json input_hint table: ``(repo:string, path:string,
commit:string, lang:string, content:string)`` — an Iceberg-style layout of
10^12 files at the north star, synthesized here deterministically at any
scale with ZERO Python row work: every column is a Catalyst expression over
``spark.range``, so generation parallelizes across executors and never
materializes on the driver.

Design-for-skew: repo assignment is Zipf-ish (quadratic rank concentration),
so a handful of "monorepos" own a large share of rows — exercising the
two-phase merge's skew absorption exactly as a real repo corpus would.
Content is pseudo-source text derived from seeded sha2 chains: deterministic
for a given (seed, n), with a controlled duplicate fraction (~1/16 of rows
reuse a shared content pool) to exercise distinct-count sketches.
"""

from __future__ import annotations

from pyspark.sql import DataFrame, SparkSession
from pyspark.sql import functions as F

LANGS = ["py", "rs", "js", "go", "java", "c", "md"]


def synth_code_table(
    spark: SparkSession,
    num_rows: int,
    *,
    num_repos: int = 100,
    seed: int = 42,
    num_partitions: int | None = None,
    dup_fraction_pow2: int = 4,
) -> DataFrame:
    """Deterministic `(repo, path, commit, lang, content)` DataFrame.

    ``dup_fraction_pow2``: ~2^-p of rows share contents from a small pool
    (p=4 → 1/16 duplicates).
    """
    base = spark.range(0, num_rows, 1, num_partitions) if num_partitions \
        else spark.range(num_rows)
    # deterministic per-row mix: sha2 of (seed, id) → hex; all JVM-side
    mix = F.sha2(F.concat(F.lit(f"s{seed}-"), F.col("id").cast("string")), 256)
    # Zipf-ish repo rank: square of uniform [0,1) concentrates mass at rank 0
    u = F.conv(F.substring(mix, 1, 8), 16, 10).cast("double") / F.lit(4294967296.0)
    repo_rank = F.floor(F.pow(u, F.lit(2.0)) * F.lit(num_repos)).cast("int")
    # duplicate pool: rows where low bits of the mix vanish draw content
    # from a tiny shared id space. NOTE the pool key uses HIGH bits of
    # dup_sel: is_dup already pins the low dup_fraction_pow2 bits to zero,
    # so pmod(dup_sel, 64) would collapse the pool to 64 >> min(6,
    # dup_fraction_pow2) distinct contents (4 at the default 2^4 — the
    # original expression's silent behavior; the shifted key gives the
    # full 64 the docstring promises)
    dup_sel = F.conv(F.substring(mix, 9, 4), 16, 10).cast("long")
    is_dup = (F.pmod(dup_sel, F.lit(1 << dup_fraction_pow2)) == 0)
    pool_key = F.pmod(F.shiftrightunsigned(
        dup_sel, dup_fraction_pow2), F.lit(64))
    content_key = F.when(
        is_dup, F.concat(F.lit("shared-"), pool_key)
    ).otherwise(F.concat(F.lit("uniq-"), F.col("id").cast("string")))
    content_mix = F.sha2(F.concat(F.lit(f"c{seed}-"), content_key), 256)
    lang = F.element_at(
        F.array(*[F.lit(x) for x in LANGS]),
        (F.pmod(F.conv(F.substring(mix, 13, 4), 16, 10).cast("int"),
                F.lit(len(LANGS))) + 1))
    return base.select(
        F.concat(F.lit("repo-"), F.lpad(repo_rank.cast("string"), 5, "0"))
        .alias("repo"),
        F.concat(F.lit("src/"), F.substring(mix, 17, 6), F.lit("/f_"),
                 F.col("id").cast("string"), F.lit("."), lang).alias("path"),
        F.substring(mix, 25, 12).alias("commit"),
        lang.alias("lang"),
        # pseudo source text: a few deterministic "lines" built from the
        # content hash — entropy + length shape, not real syntax
        F.concat(
            F.lit("// file "), content_key, F.lit("\nfn main() { let x = \""),
            content_mix, F.lit("\"; }\n// "),
            F.repeat(F.substring(content_mix, 1, 32),
                     (F.pmod(F.conv(F.substring(mix, 29, 2), 16, 10)
                             .cast("int"), F.lit(8)) + 1)),
        ).alias("content"),
    )
