"""Streaming benchmark decontamination — stateless, broadcast-filtered.

The streaming rendering of ``operators/decontam.py``: an unbounded
document stream is checked against a STATIC held-out benchmark set. The
whole pipeline is deliberately STATELESS — gram explode, broadcast-Bloom
probe, and (exact mode) a stream-static broadcast join are all narrow,
so the stream scales like a map: no watermark, no state store, no
growth. Per-document aggregation (match counts) is the consumer's choice
— e.g. a batch rollup over the sink, or a downstream windowed agg — the
operator emits the raw evidence: one (id, gram) row per matched gram
occurrence.

Exactness carries over from the batch operator: the Bloom filter admits
no false negatives, and ``exact=True`` removes every false positive via
the static gram join — the emitted pair set equals the batch overlap
join on the same rows. ``exact=False`` emits sketch-only candidates
(~``fp`` FP rate per clean gram): the triage mode when the stream is too
hot to join.

Works identically on BATCH frames (every op is stateless), which is how
the parity tests pin stream == batch.
"""

from __future__ import annotations

from pyspark.sql import DataFrame
from pyspark.sql import functions as F

from ..functions.digest import digest64
from ..operators.bloom import bloom_build, bloom_contains_col
from ..operators.decontam import benchmark_grams
from ..operators.text import word_ngrams_col


def streaming_contamination_matches(
    stream: DataFrame,
    bench: DataFrame,
    *,
    id_col: str = "doc_id",
    text_col: str = "text",
    bench_text_col: str | None = None,
    ngram_n: int = 8,
    fp: float = 1e-3,
    exact: bool = True,
) -> DataFrame:
    """Matched (``id_col``, ``gram``) pairs of a (streaming or batch)
    document frame against a static benchmark set. ``bench`` MUST be a
    batch frame: its grams are built into the broadcast Bloom filter at
    plan time (a driver-side build — the benchmark is small by contract)
    and, in exact mode, broadcast again as the verify side of a
    stream-static join."""
    if bench.isStreaming:
        raise ValueError("bench must be a static (batch) DataFrame — its "
                         "grams are collected into a broadcast filter")
    b_text = bench_text_col or text_col
    grams = benchmark_grams(bench, b_text, ngram_n=ngram_n)
    bloom = bloom_build(grams, "gram", fp=fp, digest="xxh64")

    exploded = stream.select(
        F.col(id_col),
        F.explode(word_ngrams_col(text_col, ngram_n)).alias("gram"))
    candidates = exploded.filter(
        bloom_contains_col(bench.sparkSession, bloom,
                           digest64("gram", "xxh64")))
    if exact:
        candidates = candidates.join(F.broadcast(grams), on="gram",
                                     how="left_semi")
    return candidates.select(id_col, "gram")
