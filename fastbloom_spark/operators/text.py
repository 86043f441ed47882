"""Text-analysis operators for training-data pipelines — JVM-first.

Everything here that can be a Catalyst expression IS one (whole-stage
codegen, predicate-pushdown friendly, oracle-expressible in ANSI SQL);
nothing row-at-a-time. These are the per-document scoring/filtering
primitives a 100 TB corpus pipeline runs before sketch-based dedup.
"""

from __future__ import annotations

from pyspark.sql import Column, DataFrame
from pyspark.sql import functions as F

from ..functions.digest import sha256_hex


def _widen(df: DataFrame) -> DataFrame:
    """Hash/regex-heavy map stages are CPU-bound: an input with fewer
    partitions than the cluster has task slots (small tables, single
    parquet row groups) would serialize the whole corpus through one task.
    Repartition up to defaultParallelism — a no-op at real scale (100 TB
    inputs arrive with far more partitions than slots), and when it does
    fire the row shuffle is bounded by the small input that triggered it.
    Results are partition-invariant, so this is purely a physical change.
    (Round 7: moved here from operators/dedup.py so the decontamination
    and corpus-pipeline scans widen too — at sf1.0 their single-row-group
    input serialized the whole gram/regex chain through one task.)"""
    sc = df.sparkSession.sparkContext
    if df.rdd.getNumPartitions() < sc.defaultParallelism:
        return df.repartition(sc.defaultParallelism)
    return df

#: tiny per-language stopword lists for the n-gram/stopword language-ID
#: heuristic (public common-word lists, truncated)
LANG_STOPWORDS: dict[str, list[str]] = {
    "en": ["the", "and", "of", "to", "in", "is", "it", "that", "was", "for",
           "with", "are", "this", "not", "have"],
    "de": ["der", "die", "und", "das", "ist", "nicht", "mit", "ein", "eine",
           "zu", "den", "von", "auf", "sich", "auch"],
    "fr": ["le", "la", "les", "et", "des", "est", "une", "dans", "que", "qui",
           "pour", "pas", "sur", "avec", "ce"],
    "es": ["el", "la", "los", "las", "y", "es", "en", "un", "una", "que",
           "por", "con", "para", "del", "se"],
    "it": ["il", "la", "di", "che", "e", "un", "una", "per", "non", "sono",
           "con", "del", "si", "da", "come"],
}


def _no_pushdown(pred: Column) -> Column:
    """``pred`` OR an always-false NON-DETERMINISTIC term — semantically
    identical to ``pred`` (monotonically_increasing_id() is never < 0),
    but the optimizer can neither split the disjunction nor push it below
    a Project or Exchange. Use for filters over EXPENSIVE computed
    columns: a plain filter gets substituted below the projection
    (Filter + Project evaluate the expression twice — no cross-operator
    CSE) and pushed below any widening repartition, serializing the
    evaluation into the narrow scan stage. Same medicine the guide
    prescribes for Python UDFs (asNondeterministic), applied to Catalyst
    expressions."""
    return pred | (F.monotonically_increasing_id() < F.lit(0))


def tokens_col(text_col: Column | str, *, lowercase: bool = True) -> Column:
    """Whitespace tokenization as an array column (empty array for blank)."""
    c = F.col(text_col) if isinstance(text_col, str) else text_col
    base = F.lower(c) if lowercase else c
    trimmed = F.trim(base)
    return F.when(trimmed == "", F.array().cast("array<string>")) \
        .otherwise(F.split(trimmed, r"\s+"))


def token_count_col(text_col: Column | str) -> Column:
    """Whitespace token count (long)."""
    return F.size(tokens_col(text_col)).cast("long")


def quality_features(df: DataFrame, text_col: str = "text") -> DataFrame:
    """Append document quality-scoring features, all Catalyst expressions:

    n_chars, n_tokens, avg_token_len, punct_ratio, digit_ratio, space_ratio,
    uniq_token_ratio, and a composite [0,1] quality_score (heuristic linear
    blend — the shape a C4/Gopher-style quality filter takes, minus the
    model-based parts).
    """
    c = F.col(text_col)
    n_chars = F.length(c).cast("double")
    toks = tokens_col(text_col)
    n_tokens = F.size(toks).cast("double")
    safe_chars = F.greatest(n_chars, F.lit(1.0))
    safe_tokens = F.greatest(n_tokens, F.lit(1.0))
    count_class = lambda pat: F.length(c) - F.length(
        F.regexp_replace(c, pat, ""))
    punct_ratio = count_class(r"[\p{Punct}]") / safe_chars
    digit_ratio = count_class(r"[0-9]") / safe_chars
    space_ratio = count_class(r"\s") / safe_chars
    avg_token_len = (n_chars - count_class(r"\s")) / safe_tokens
    uniq_ratio = F.size(F.array_distinct(toks)).cast("double") / safe_tokens
    # crude composite: reward moderate length & lexical diversity, punish
    # punctuation/digit-heavy rows
    quality = F.greatest(F.lit(0.0), F.least(F.lit(1.0),
        F.lit(0.30) * F.least(n_tokens / F.lit(64.0), F.lit(1.0))
        + F.lit(0.40) * uniq_ratio
        + F.lit(0.30) * (F.lit(1.0) - F.least(
            (punct_ratio + digit_ratio) * F.lit(4.0), F.lit(1.0)))))
    return df.withColumns({
        "n_chars": n_chars.cast("long"),
        "n_tokens": n_tokens.cast("long"),
        "avg_token_len": F.round(avg_token_len, 4),
        "punct_ratio": F.round(punct_ratio, 4),
        "digit_ratio": F.round(digit_ratio, 4),
        "space_ratio": F.round(space_ratio, 4),
        "uniq_token_ratio": F.round(uniq_ratio, 4),
        "quality_score": F.round(quality, 4),
    })


def detect_lang_col(text_col: Column | str = "text",
                    min_hits: int = 1) -> Column:
    """Stopword-overlap language-ID heuristic (JVM-only).

    Scores each candidate language by |tokens ∩ stopwords(lang)| and picks
    the argmax; 'und' (undetermined) when no language reaches ``min_hits``.
    Deterministic ties break by language order. An honest n-gram-free
    heuristic: precision is good on natural prose, useless on code — which
    is the documented contract.
    """
    toks = F.array_distinct(tokens_col(text_col))
    scores = [
        (lang, F.size(F.array_intersect(
            toks, F.array(*[F.lit(w) for w in words]))))
        for lang, words in LANG_STOPWORDS.items()
    ]
    best_score = F.greatest(*[s for _, s in scores])
    result = F.lit("und")
    for lang, score in reversed(scores):
        result = F.when((score == best_score) & (best_score >= min_hits),
                        F.lit(lang)).otherwise(result)
    return result


#: BPE-ish pretokenizer pattern (the GPT-2 shape minus lookaheads, which
#: RE2 — and therefore the DuckDB oracle — cannot express): a token is an
#: optionally-space-prefixed letter run, digit run, or symbol run.
BPE_TOKEN_PATTERN = r" ?[A-Za-z]+| ?[0-9]+| ?[^A-Za-z0-9\s]+"


def bpe_token_count_col(text_col: Column | str = "text") -> Column:
    """Sub-word-style token count via the BPE-ish pretokenizer regex —
    the cheap standin for a real BPE vocab count when budgeting corpus
    token totals (whole-stage-codegen'd ``regexp_count``, zero Python;
    oracle: DuckDB ``len(regexp_extract_all(...))`` with the same RE)."""
    c = F.col(text_col) if isinstance(text_col, str) else text_col
    return F.regexp_count(c, F.lit(BPE_TOKEN_PATTERN)).cast("long")


def word_ngrams_col(text_col: Column | str, n: int = 8) -> Column:
    """Sliding word n-grams as ``array<string>`` (space-joined token runs,
    JVM-only: split → sequence/transform/slice/concat_ws).

    Mirrors :func:`~fastbloom_spark.operators.dedup.shingles_col` semantics
    exactly, minus the hash: documents shorter than ``n`` tokens yield the
    whole token string as one gram; NULL/blank text yields the empty array
    (never a match). The string form is what exact verification joins and
    decontamination oracles need — hash collisions can't manufacture a
    match."""
    c = F.col(text_col) if isinstance(text_col, str) else text_col
    toks = tokens_col(text_col)
    joined = F.concat_ws(" ", toks)
    n_g = F.size(toks) - F.lit(n - 1)
    grams = _sliding_grams(toks, n, n_g)
    return F.when(c.isNull() | (F.size(toks) == 0),
                  F.array().cast("array<string>")) \
        .otherwise(F.when(n_g >= 1, grams).otherwise(F.array(joined)))


def _sliding_grams(toks: Column, n: int, n_g: Column) -> Column:
    """Space-joined sliding n-grams of a token array via zip_with over n
    shifted slices — ~5x faster than the transform(sequence, slice,
    concat_ws) formulation (higher-order functions are interpreted, and
    slice+concat_ws allocates a fresh array per gram; the zip chain
    allocates n slices per DOCUMENT and concatenates pairwise). Output is
    element-identical on the n_g >= 1 domain (tokens are never NULL, so
    concat == concat_ws); callers guard the short/empty cases."""
    safe_len = F.greatest(n_g, F.lit(1))
    grams = F.slice(toks, 1, safe_len)
    for j in range(2, n + 1):
        grams = F.zip_with(grams, F.slice(toks, j, safe_len),
                           lambda x, y: F.concat(x, F.lit(" "), y))
    return grams


def repetition_features(df: DataFrame, text_col: str = "text",
                        ns: tuple[int, ...] = (2, 3)) -> DataFrame:
    """Append within-document repetition ratios (the Gopher-style repetition
    filter signals, word-gram flavored): for each ``n`` in ``ns``, column
    ``dup_{n}gram_ratio`` = 1 - distinct_grams/total_grams, plus
    ``dup_token_ratio`` (the 1-gram case). 0.0 for empty documents.

    All Catalyst expressions (split/transform/array_distinct/size) — one
    narrow projection, no shuffle, whole-stage codegen; at 100 TB this runs
    inside the scan stage like the rest of :func:`quality_features`."""
    toks = tokens_col(text_col)

    def dup_ratio(arr: Column) -> Column:
        total = F.size(arr).cast("double")
        return F.round(
            F.when(total > 0,
                   F.lit(1.0) - F.size(F.array_distinct(arr)) / total)
            .otherwise(F.lit(0.0)), 4)

    out = {"dup_token_ratio": dup_ratio(toks)}
    for n in ns:
        # a doc shorter than n tokens has ONE gram (the whole doc) ->
        # ratio 0, the right degenerate answer
        out[f"dup_{n}gram_ratio"] = dup_ratio(word_ngrams_col(text_col, n))
    return df.withColumns(out)


#: PII patterns, deliberately restricted to the RE2 ∩ Java-regex common
#: subset (no lookarounds, no backrefs) so the DuckDB oracle replays them
#: verbatim — the BPE_TOKEN_PATTERN precedent. Deterministic, auditable,
#: and honest about scope: pattern-shaped PII (emails, IPv4, intl-prefixed
#: phones), not NER.
PII_PATTERNS: dict[str, str] = {
    "email": r"[A-Za-z0-9._%+-]+@[A-Za-z0-9.-]+\.[A-Za-z]{2,}",
    "ipv4": r"\b([0-9]{1,3}\.){3}[0-9]{1,3}\b",
    "phone": r"\+[0-9][0-9 ()\-]{6,14}[0-9]",
}

#: redaction order is part of the contract: emails first (they contain
#: digits and dots an IP/phone pattern could partially claim), then IPs,
#: then phones
PII_REDACTION_ORDER: tuple[str, ...] = ("email", "ipv4", "phone")


def pii_features(df: DataFrame, text_col: str = "text") -> DataFrame:
    """Append per-document PII match counts (``n_email``, ``n_ipv4``,
    ``n_phone``) — whole-stage-codegen'd ``regexp_count``, zero Python.
    0 for NULL text (count of matches in nothing is nothing to act on;
    the redaction pass below keeps NULL as NULL)."""
    c = F.col(text_col)
    out = {}
    for kind, pat in PII_PATTERNS.items():
        out[f"n_{kind}"] = F.coalesce(
            F.regexp_count(c, F.lit(pat)), F.lit(0)).cast("long")
    return df.withColumns(out)


def redact_pii_col(text_col: Column | str = "text") -> Column:
    """Redacted text: each PII match replaced by its ``<KIND>`` sentinel,
    applied in :data:`PII_REDACTION_ORDER`. A chain of three Catalyst
    ``regexp_replace`` calls — one narrow projection in the scan stage at
    any scale. NULL in → NULL out."""
    c = F.col(text_col) if isinstance(text_col, str) else text_col
    for kind in PII_REDACTION_ORDER:
        c = F.regexp_replace(c, PII_PATTERNS[kind], f"<{kind.upper()}>")
    return c


def doc_fingerprint_col(text_col: Column | str = "text") -> Column:
    """Normalized-content fingerprint: sha256 of lowercased,
    whitespace-collapsed text — the exact-dedup key that survives
    formatting-only edits. Oracle-expressible (DuckDB: sha256 + regexp)."""
    c = F.col(text_col) if isinstance(text_col, str) else text_col
    normalized = F.trim(F.regexp_replace(F.lower(c), r"\s+", " "))
    return sha256_hex(normalized)


def dedup_exact(df: DataFrame, id_col: str, text_col: str = "text",
                *, normalized: bool = True) -> DataFrame:
    """Exact dedup: keep the lowest-id row per (normalized) content hash.

    Distributed shape: one hash-shuffle on the fingerprint (Catalyst
    partial-agg handles map-side combine); survivors join back by id if the
    caller wants full rows.
    """
    fp = doc_fingerprint_col(text_col) if normalized else sha256_hex(text_col)
    with_fp = df.select(F.col(id_col), fp.alias("__fp"))
    # NULL text fingerprints NULL, and groupBy treats NULLs as EQUAL —
    # without the split every NULL-text row would be "deduped" against the
    # others and silently deleted, though their contents are unknown, not
    # duplicated (NULL-in -> NULL-out: NULL rows always survive)
    keepers = with_fp.filter(F.col("__fp").isNotNull()) \
        .groupBy("__fp").agg(F.min(id_col).alias(id_col)) \
        .select(id_col)
    null_rows = with_fp.filter(F.col("__fp").isNull()).select(id_col)
    return df.join(keepers.unionByName(null_rows), on=id_col,
                   how="left_semi")
