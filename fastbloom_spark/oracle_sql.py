"""DuckDB-SQL text generators replicating the engine's hash kernels.

The driver's correctness gate runs each ``oracle_sql()`` string against
DuckDB and value-hash-compares it with the Spark result. Queries built on
hash kernels (SimHash, MinHash signatures, winnowing fingerprints) need
those kernels IN SQL to be hash-checkable — so this module composes plain
DuckDB scalar expressions (single statement, no macros, no registered
functions — nothing a harness could reject) that replicate, bit for bit:

* ``sql_xxh64_utf8`` — XXH64 (Cyan4973 spec, canonical constants) over a
  VARCHAR's UTF-8 bytes, default seed 42 == Spark's ``xxhash64`` and the
  pure-int replica ``kernel.xxh64_bytes`` (parity-tested in
  tests/test_oracle_sql.py across lengths 0..200 and non-ASCII).
* ``sql_mix64`` — the splitmix64 finalizer (``kernel.mix64``).

Number representation: unsigned 64-bit values ride as HUGEINT in
[0, 2^64). DuckDB raises on BIGINT overflow, so wrapping arithmetic is
spelled out: multiplication mod 2^64 via 32-bit limbs (cross terms fit
HUGEINT), with all wrapping/limb-splitting as bitwise AND/shift — HUGEINT
``%``/``//`` are full 128-bit divisions, ~10x slower — and xor natively
(DuckDB xor supports HUGEINT). Inside scalar expressions, intermediates
bind through a one-element ``list_transform`` "let" so sub-expressions are
written once, not exponentially duplicated; on BULK paths (millions of
rows) stages are spelled as MATERIALIZED CTE columns instead — DuckDB
inlines plain CTEs without common-subexpression elimination, so an
unmaterialized staged pipeline re-evaluates the whole upstream chain per
reference (measured 40 s -> 4 s on the minhash signature stage).

These run on KB-scale oracle tables (sf0.01) only; the Spark side never
touches this module.
"""

from __future__ import annotations

from typing import Sequence

_M64 = 1 << 64
_M32 = 1 << 32

_XXP1 = 0x9E3779B185EBCA87
_XXP2 = 0xC2B2AE3D27D4EB4F
_XXP3 = 0x165667B19E3779F9
_XXP4 = 0x85EBCA77C2B2AE63
_XXP5 = 0x27D4EB2F165667C5

_SM1 = 0xBF58476D1E4943B3
_SM2 = 0x94D049BB133111EB


def let(var: str, expr: str, body: str) -> str:
    """Bind ``expr`` to ``var`` inside ``body`` (one-element list lambda)."""
    return f"list_transform([{expr}], {var} -> {body})[1]"


def u64(x: int) -> str:
    return f"{x % _M64}::HUGEINT"


def sql_umul_const(a: str, c: int) -> str:
    """(a * c) mod 2^64, constant multiplier folded to literal limbs,
    all wrapping via bitwise AND/shift (~10x cheaper than HUGEINT %//).
    ``a`` must be a simple reference (it appears three times)."""
    c_lo, c_hi = c % _M32, (c % _M64) // _M32
    return (f"((({a} & {_M32 - 1}) * {c_lo} + "
            f"((({a} & {_M32 - 1}) * {c_hi} + ({a} >> 32) * {c_lo})"
            f" & {_M32 - 1}) * {_M32}) & {_M64 - 1})")


def sql_umul(a: str, b: str) -> str:
    """(a * b) mod 2^64 via 32-bit limbs. Both operands must be simple
    references."""
    return (f"((({a} & {_M32 - 1}) * ({b} & {_M32 - 1}) + "
            f"((({a} & {_M32 - 1}) * ({b} >> 32) + "
            f"({a} >> 32) * ({b} & {_M32 - 1})) & {_M32 - 1}) * {_M32})"
            f" & {_M64 - 1})")


def sql_rotl(x: str, r: int) -> str:
    """rotl64 as pure divmod (the halves don't overlap, so + == |).
    ``x`` must be a simple reference."""
    return f"(({x} & {(1 << (64 - r)) - 1}) * {1 << r} + ({x} >> {64 - r}))"


def sql_xor_shr(x: str, k: int) -> str:
    """x XOR (x >> k). ``x`` must be a simple reference."""
    return f"xor({x}, {x} >> {k})"


def sql_add(a: str, b: str) -> str:
    return f"(({a} + {b}) & {_M64 - 1})"


def sql_mix64(expr: str) -> str:
    """splitmix64 finalizer (kernel.mix64) over a u64 HUGEINT expression;
    result stays HUGEINT in [0, 2^64)."""
    return let("z0", expr, let(
        "z1", sql_umul_const(sql_xor_shr("z0", 30), _SM1), let(
            "z2", sql_umul_const(sql_xor_shr("z1", 27), _SM2),
            sql_xor_shr("z2", 31))))


def sql_hugeint_to_bigint(expr: str) -> str:
    """u64 HUGEINT -> two's-complement signed BIGINT (Spark long domain)."""
    return let("uv", expr,
               f"(CASE WHEN uv >= {1 << 63} THEN uv - {_M64} "
               f"ELSE uv END)::BIGINT")


def sql_bigint_to_hugeint(expr: str) -> str:
    """signed BIGINT -> u64 HUGEINT bit pattern."""
    return let("sv", f"({expr})::HUGEINT",
               f"(CASE WHEN sv < 0 THEN sv + {_M64} ELSE sv END)")


def _le_bytes(byts: str, off: str, width: int) -> str:
    """Little-endian integer from ``width`` bytes of the 1-indexed list
    ``byts`` starting at 0-based offset ``off`` (simple references)."""
    terms = [f"{byts}[({off})::BIGINT + {j + 1}]::HUGEINT * {1 << (8 * j)}"
             for j in range(width)]
    return "(" + " + ".join(terms) + ")"


def _rnd(acc: str, lane_ref: str) -> str:
    """XXH64 round: rotl31(acc + lane * P2) * P1 (simple references)."""
    return let(
        "t", sql_add(acc, sql_umul_const(lane_ref, _XXP2)),
        sql_umul_const(sql_rotl("t", 31), _XXP1))


def _sql_utf8_bytes(expr: str) -> str:
    """HUGEINT[] of a VARCHAR's UTF-8 bytes via hex(encode(..)) digit
    pairs — the ONE place raw bytes enter the SQL kernels (xxh64 and the
    winnowing Rabin-Karp both build on it)."""
    byte_i = ("(strpos('0123456789ABCDEF', substr(hx, 2*i - 1, 1)) - 1) * 16"
              " + (strpos('0123456789ABCDEF', substr(hx, 2*i, 1)) - 1)")
    return let(
        "hx", f"hex(encode({expr}))",
        f"list_transform(range(1, length(hx) // 2 + 1),"
        f" i -> ({byte_i})::HUGEINT)")


def sql_xxh64_utf8(expr: str, seed: int = 42) -> str:
    """XXH64 of a VARCHAR's UTF-8 bytes as SIGNED BIGINT — bit parity with
    Spark ``xxhash64(col)`` / ``kernel.xxh64_bytes`` at the same seed.

    One scalar expression: bytes from hex(encode(..)) digit pairs; the
    stripe / 8-byte / 4-byte / byte tails as list_reduce with the initial
    accumulator prepended (DuckDB 1.0 list_reduce takes no init argument).
    """
    bytes_list = _sql_utf8_bytes(expr)

    # -- stripe loop (n >= 32): acc struct (v1..v4); elements carry the
    #    stripe base offset in v1 (list_reduce needs uniform element type)
    v_init = (f"{{'v1': {u64(seed + _XXP1 + _XXP2)}, "
              f"'v2': {u64(seed + _XXP2)}, "
              f"'v3': {u64(seed)}, 'v4': {u64(seed - _XXP1)}}}")
    stripe_elems = ("list_transform(range(0, (n // 32)::BIGINT), "
                    "s -> {'v1': s::HUGEINT * 32, 'v2': 0::HUGEINT, "
                    "'v3': 0::HUGEINT, 'v4': 0::HUGEINT})")

    def lane_update(k: int) -> str:
        off = f"(x.v1 + {8 * (k - 1)})"
        return let(f"ln{k}", _le_bytes("b", off, 8),
                   _rnd(f"acc.v{k}", f"ln{k}"))

    stripes = (f"list_reduce(list_prepend({v_init}, {stripe_elems}), "
               f"(acc, x) -> {{"
               f"'v1': {lane_update(1)}, 'v2': {lane_update(2)}, "
               f"'v3': {lane_update(3)}, 'v4': {lane_update(4)}}})")

    # converge: h = rotl1(v1)+rotl7(v2)+rotl12(v3)+rotl18(v4); then per
    # lane h = (h ^ rnd(0, vk)) * P1 + P4
    h_conv = ("((" + " + ".join(
        sql_rotl(f"v.v{k}", r)
        for k, r in [(1, 1), (2, 7), (3, 12), (4, 18)]) + f") & {_M64 - 1})")
    chain = "hM4"
    for k in reversed(range(1, 5)):
        prev = "h0" if k == 1 else f"hM{k - 1}"
        rnd0 = let(f"p{k}", sql_umul_const(f"v.v{k}", _XXP2),
                   sql_umul_const(sql_rotl(f"p{k}", 31), _XXP1))
        step = let(f"x{k}", f"xor({prev}, {rnd0})",
                   sql_add(sql_umul_const(f"x{k}", _XXP1), u64(_XXP4)))
        chain = let(f"hM{k}", step, chain)
    h_big = let("v", stripes, let("h0", h_conv, chain))

    h_start = (f"((CASE WHEN n >= 32 THEN {h_big} "
               f"ELSE {u64(seed + _XXP5)} END) + n) & {_M64 - 1}")

    # -- 8-byte tail: offsets i0, i0+8, ... while off <= n-8
    tail8_elems = ("list_transform(range(0, ((n - i0) // 8)::BIGINT), "
                   "j -> i0 + j::HUGEINT * 8)")
    lane8 = let("ln", _le_bytes("b", "offv", 8),
                let("kk", sql_umul_const("ln", _XXP2),
                    sql_umul_const(sql_rotl("kk", 31), _XXP1)))
    round8 = let("hq", f"xor(hacc, {lane8})",
                 sql_add(sql_umul_const(sql_rotl("hq", 27), _XXP1),
                         u64(_XXP4)))
    tail8 = (f"list_reduce(list_prepend(hh, {tail8_elems}), "
             f"(hacc, offv) -> {round8})")

    # -- 4-byte tail at i4 if n - i4 >= 4
    lane4 = let("l4", _le_bytes("b", "i4", 4), sql_umul_const("l4", _XXP1))
    round4 = let("hy", f"xor(hh8, {lane4})",
                 sql_add(sql_umul_const(sql_rotl("hy", 23), _XXP2),
                         u64(_XXP3)))
    tail4 = f"(CASE WHEN n - i4 >= 4 THEN {round4} ELSE hh8 END)"

    # -- byte tail from i5: h = rotl11(h ^ b*P5) * P1
    bytes_elems = ("list_transform(range(i5::BIGINT, n::BIGINT), "
                   "j -> b[j + 1])")
    roundb = let("hz", f"xor(hacc, {sql_umul_const('bv', _XXP5)})",
                 sql_umul_const(sql_rotl("hz", 11), _XXP1))
    tailb = (f"list_reduce(list_prepend(hh4, {bytes_elems}), "
             f"(hacc, bv) -> {roundb})")

    ava = let("a1", sql_umul_const(sql_xor_shr("hf", 33), _XXP2),
              let("a2", sql_umul_const(sql_xor_shr("a1", 29), _XXP3),
                  sql_xor_shr("a2", 32)))

    full = let(
        "b", bytes_list, let(
            "n", "len(b)::HUGEINT", let(
                "i0", f"(CASE WHEN n >= 32 THEN (n // 32) * 32 "
                      f"ELSE 0::HUGEINT END)", let(
                    "hh", h_start, let(
                        "hh8", tail8, let(
                            "i4", "i0 + ((n - i0) // 8) * 8", let(
                                "hh4", tail4, let(
                                    "i5", "(CASE WHEN n - i4 >= 4 "
                                          "THEN i4 + 4 ELSE i4 END)", let(
                                        "hf", tailb, ava)))))))))
    return sql_hugeint_to_bigint(full)


# -- pure-int replicas for driver-side constant folding ----------------------


def _mix64_int(x: int) -> int:
    """splitmix64 on plain ints (constants only — no numpy dependency)."""
    z = x & (_M64 - 1)
    z = ((z ^ (z >> 30)) * _SM1) % _M64
    z = ((z ^ (z >> 27)) * _SM2) % _M64
    return z ^ (z >> 31)


_SQL_TOKENS = ("(CASE WHEN trim({t}) = '' THEN []::VARCHAR[] "
               "ELSE string_split_regex(trim(lower({t})), '\\s+') END)")


def _simhash_ctes(table: str, id_col: str, text_col: str) -> str:
    """Shared CTE chain ending in ``packed(doc, sim HUGEINT)`` for docs
    with >= 1 token (mirrors operators/dedup.py simhash64_col: xxhash64
    per lowercased whitespace token, per-bit majority, little-endian
    pack)."""
    xxh_u64 = sql_bigint_to_hugeint(sql_xxh64_utf8("t"))
    bit_sums = ", ".join(
        f"sum((hu >> {i}) & 1) AS s{i}" for i in range(64))
    pack = " + ".join(
        f"(CASE WHEN 2 * s{i} > n THEN {1 << i}::HUGEINT "
        f"ELSE 0::HUGEINT END)" for i in range(64))
    return f"""
        toks AS (SELECT {id_col} AS doc, {_SQL_TOKENS.format(t=text_col)}
                 AS tk FROM {table}),
        tok AS (SELECT doc, unnest(tk) AS t FROM toks),
        h AS (SELECT doc, {xxh_u64} AS hu FROM tok),
        sums AS (SELECT doc, count(*)::HUGEINT AS n, {bit_sums}
                 FROM h GROUP BY doc),
        packed AS MATERIALIZED (SELECT doc, ({pack}) AS sim FROM sums)
    """


def oracle_simhash(table: str = "documents", id_col: str = "doc_id",
                   text_col: str = "text") -> str:
    """(doc_id, simhash BIGINT) for every row — token-less docs hash 0."""
    signed = sql_hugeint_to_bigint("coalesce(p.sim, 0::HUGEINT)")
    return f"""
        WITH {_simhash_ctes(table, id_col, text_col)}
        SELECT d.{id_col}, {signed} AS simhash
        FROM {table} d LEFT JOIN packed p ON d.{id_col} = p.doc
    """


def _simhash_pairs_parts(table: str, id_col: str, text_col: str, *,
                         max_hamming: int, bands: int,
                         max_bucket_size: int) -> tuple[str, str]:
    """(cte_chain, final_select) for the banded-pairs pipeline — split so
    composing oracles (dedup survivors) can extend the chain with named
    CTEs instead of string surgery on the rendered SQL."""
    width = 64 // bands
    band_rows = ", ".join(f"({i})" for i in range(bands))
    chain = f"""
        {_simhash_ctes(table, id_col, text_col)},
        shifted AS (
          SELECT doc, sim, band_idx,
                 (sim >> (CASE band_idx {" ".join(
                     f"WHEN {i} THEN {width * i}"
                     for i in range(bands))} END)) & {(1 << width) - 1}
                 AS band_val
          FROM packed, (VALUES {band_rows}) v(band_idx)
        ),
        sized AS (SELECT *, count(*) OVER (PARTITION BY band_idx, band_val)
                  AS bn FROM shifted),
        capped AS MATERIALIZED (
          SELECT * FROM sized WHERE bn <= {max_bucket_size})
    """
    final = f"""
        SELECT DISTINCT a.doc AS id_a, b.doc AS id_b,
               bit_count(xor(a.sim, b.sim))::BIGINT AS hamming
        FROM capped a JOIN capped b USING (band_idx, band_val)
        WHERE a.doc < b.doc
          AND bit_count(xor(a.sim, b.sim)) <= {max_hamming}
    """
    return chain.strip(), final


def oracle_simhash_pairs(table: str = "documents", id_col: str = "doc_id",
                         text_col: str = "text", *, max_hamming: int = 3,
                         bands: int = 4,
                         max_bucket_size: int = 1000) -> str:
    """Near-dup pairs via 16-bit pigeonhole banding + exact popcount —
    mirrors operators/dedup.py simhash_near_dup_pairs (empty docs dropped,
    oversized buckets skipped, hamming <= max_hamming, distinct pairs)."""
    chain, final = _simhash_pairs_parts(
        table, id_col, text_col, max_hamming=max_hamming, bands=bands,
        max_bucket_size=max_bucket_size)
    return f"WITH {chain}\n{final}"


def _shingle_ctes(table: str, id_col: str, text_col: str,
                  shingle_n: int = 3) -> str:
    """CTE chain ending in ``shv(doc, shu HUGEINT)`` — one row per word
    n-gram shingle (xxhash64 of the space-joined gram; whole doc as one
    shingle when shorter than n tokens; empty docs dropped) — mirrors
    operators/dedup.py shingles_col."""
    xxh_u64 = sql_bigint_to_hugeint(sql_xxh64_utf8("g"))
    return f"""
        toks AS (SELECT {id_col} AS doc, {_SQL_TOKENS.format(t=text_col)}
                 AS tk FROM {table}),
        nt AS (SELECT doc, tk, len(tk) AS n FROM toks WHERE len(tk) > 0),
        grams AS (
          SELECT doc,
                 unnest(range(1, greatest(n - {shingle_n - 1}, 1) + 1)) AS i,
                 tk, n
          FROM nt
        ),
        gstr AS (
          SELECT doc,
                 CASE WHEN n >= {shingle_n}
                      THEN array_to_string(tk[i:i + {shingle_n - 1}], ' ')
                      ELSE array_to_string(tk, ' ') END AS g
          FROM grams
        ),
        shv AS MATERIALIZED (SELECT doc, {xxh_u64} AS shu FROM gstr)
    """


def _minhash_pairs_parts(table: str = "documents",
                             id_col: str = "doc_id",
                             text_col: str = "text", *,
                             shingle_n: int = 3, num_perm: int = 128,
                             bands: int = 32, seed: int = 42,
                             band_seed: int = 7,
                             max_bucket_size: int = 1000,
                             threshold: float = 0.5) -> str:
    """(with-chain, final-select) parts of the LSH candidate ->
    exact-Jaccard-verified pipeline — parts (like _simhash_pairs_parts) so
    composing oracles extend the chain with NAMED CTEs instead of string
    surgery on rendered SQL. The full minhash_candidate_pairs +
    ngram_jaccard_pairs pipeline of
    operators/dedup.py, bit for bit: permutation seeds folded to literals
    (mix64((j+1) * golden ^ seed)), signature slot = min over shingles of
    mix64(shu ^ seed_j), band hash = mix64-fold over the band's slots from
    init mix64(band_seed)."""
    rows = num_perm // bands
    golden = 0x9E3779B97F4A7C15
    seeds = [_mix64_int(((j + 1) * golden) % _M64 ^ (seed % _M64))
             for j in range(num_perm)]
    seed_rows = ", ".join(f"({j}, {s}::HUGEINT)"
                          for j, s in enumerate(seeds))
    band_init = _mix64_int(band_seed)
    mix_fold = sql_mix64("xor(a, s)")
    # mix64 staged as CTE columns: the (shingles x 128 perms) projection is
    # the hot path — plain vectorized column arithmetic here runs ~20x
    # faster than per-row let-lists
    z1 = sql_umul_const(sql_xor_shr("z0", 30), _SM1)
    z2 = sql_umul_const(sql_xor_shr("z1", 27), _SM2)
    chain = f"""
        {_shingle_ctes(table, id_col, text_col, shingle_n)},
        seeds AS (SELECT * FROM (VALUES {seed_rows}) t(pi, sd)),
        pre AS MATERIALIZED (SELECT doc, pi, xor(shu, sd) AS z0
                FROM shv CROSS JOIN seeds),
        mx1 AS MATERIALIZED (SELECT doc, pi, {z1} AS z1 FROM pre),
        mx2 AS MATERIALIZED (SELECT doc, pi, {z2} AS z2 FROM mx1),
        mixed AS (
          SELECT doc, pi, min(xor(z2, z2 >> 31)) AS slot
          FROM mx2 GROUP BY doc, pi
        ),
        bandh AS (
          SELECT doc, (pi // {rows})::INT AS band_idx,
                 list_reduce(
                   list_prepend({band_init}::HUGEINT,
                                list(slot ORDER BY pi)),
                   (a, s) -> {mix_fold}) AS band_hash
          FROM mixed GROUP BY doc, pi // {rows}
        ),
        sized AS (SELECT *, count(*) OVER (PARTITION BY band_idx, band_hash)
                  AS bn FROM bandh),
        capped AS MATERIALIZED (
          SELECT * FROM sized WHERE bn <= {max_bucket_size}),
        cand AS (
          SELECT DISTINCT a.doc AS id_a, b.doc AS id_b
          FROM capped a JOIN capped b USING (band_idx, band_hash)
          WHERE a.doc < b.doc
        ),
        dsh AS MATERIALIZED (
          SELECT doc, list(DISTINCT shu) AS ds FROM shv GROUP BY doc),
        scored AS (
          SELECT id_a, id_b,
                 round(len(list_intersect(da.ds, db.ds))::DOUBLE /
                       (len(da.ds) + len(db.ds)
                        - len(list_intersect(da.ds, db.ds)))::DOUBLE,
                       6) AS jaccard
          FROM cand
          JOIN dsh da ON da.doc = id_a
          JOIN dsh db ON db.doc = id_b
        )
    """
    final = f"""
        SELECT id_a, id_b, jaccard FROM scored
        WHERE jaccard >= {threshold}
    """
    return chain, final


def oracle_minhash_near_dups(table: str = "documents",
                             id_col: str = "doc_id",
                             text_col: str = "text", *,
                             shingle_n: int = 3, num_perm: int = 128,
                             bands: int = 32, seed: int = 42,
                             band_seed: int = 7,
                             max_bucket_size: int = 1000,
                             threshold: float = 0.5) -> str:
    """Verified near-dup pairs (see _minhash_pairs_parts)."""
    chain, final = _minhash_pairs_parts(
        table, id_col, text_col, shingle_n=shingle_n, num_perm=num_perm,
        bands=bands, seed=seed, band_seed=band_seed,
        max_bucket_size=max_bucket_size, threshold=threshold)
    return f"WITH {chain} {final}"


def oracle_winnow_fingerprint_counts(table: str = "documents",
                                     id_col: str = "doc_id",
                                     text_col: str = "text", *,
                                     k: int = 5, window: int = 4,
                                     seed: int = 42) -> str:
    """(doc_id, n_fingerprints) — distinct winnowing fingerprints per doc,
    mirroring operators/dedup.py winnow_fingerprints_col: Rabin-Karp
    k-gram polynomial hash over RAW UTF-8 bytes (seeded odd base, powers
    folded to literals), mix64, sliding-window min, distinct."""
    base = ((0x100000001B3 ^ _mix64_int(seed)) | 1) % _M64
    powers = [pow(base, k - 1 - j, _M64) for j in range(k)]
    bytes_list = _sql_utf8_bytes(text_col)
    poly = "((" + " + ".join(
        f"((b[i + {j + 1}] * {p}) & {_M64 - 1})" for j, p in enumerate(powers)
    ) + f") & {_M64 - 1})"
    gram_hash = sql_mix64(poly)
    win_min = "least(" + ", ".join(
        f"h[i + {j + 1}]" for j in range(window)) + ")"
    return f"""
        WITH byts AS (SELECT {id_col}, {bytes_list} AS b FROM {table}),
        gh AS (
          SELECT {id_col},
                 CASE WHEN len(b) < {k} THEN []::HUGEINT[]
                      ELSE list_transform(range(0, len(b) - {k - 1}),
                                          i -> {gram_hash}) END AS h
          FROM byts
        ),
        wins AS (
          SELECT {id_col},
                 CASE WHEN len(h) = 0 THEN []::HUGEINT[]
                      WHEN len(h) < {window} THEN [list_min(h)]
                      ELSE list_transform(range(0, len(h) - {window - 1}),
                                          i -> {win_min}) END AS w
          FROM gh
        )
        SELECT {id_col}, len(list_distinct(w))::BIGINT AS n_fingerprints
        FROM wins
    """


def oracle_minhash_dedup_survivors(table: str = "documents",
                                   id_col: str = "doc_id",
                                   text_col: str = "text", *,
                                   shingle_n: int = 3, num_perm: int = 128,
                                   bands: int = 32, seed: int = 42,
                                   band_seed: int = 7,
                                   max_bucket_size: int = 1000,
                                   threshold: float = 0.5) -> str:
    """Surviving doc ids after full near-dup dedup — the verified-pair
    pipeline of :func:`oracle_minhash_near_dups` extended with a RECURSIVE
    transitive closure, so single-link clusters keep exactly their minimum
    id (the fixpoint contract of operators/dedup.py minhash_dedup +
    connected_min_ids)."""
    chain, _final = _minhash_pairs_parts(
        table, id_col, text_col, shingle_n=shingle_n, num_perm=num_perm,
        bands=bands, seed=seed, band_seed=band_seed,
        max_bucket_size=max_bucket_size, threshold=threshold)
    return f"""
        WITH RECURSIVE {chain},
        verified AS (SELECT id_a, id_b FROM scored
                     WHERE jaccard >= {threshold}),
        edges AS (SELECT id_a AS src, id_b AS dst FROM verified
                  UNION SELECT id_b, id_a FROM verified),
        reach(id, r) AS (
          SELECT src, dst FROM edges
          UNION
          SELECT reach.id, edges.dst FROM reach
          JOIN edges ON reach.r = edges.src
        ),
        comp AS (SELECT id, least(id, min(r)) AS label
                 FROM reach GROUP BY id)
        SELECT {id_col} FROM {table}
        WHERE {id_col} NOT IN (SELECT id FROM comp WHERE label <> id)
    """


def sql_key_hash(cols: Sequence[str], seed: int = 42) -> str:
    """DuckDB replay of ``operators/sample.key_hash``: key columns cast to
    VARCHAR, joined with unit separator 0x1F, salted with 0x1E + the
    decimal seed, then bit-exact xxh64 at Spark's fixed seed 42 — signed
    BIGINT, NULL-strict (`||` propagates a NULL key column, matching
    ``F.concat``)."""
    joined = " || chr(31) || ".join(f"CAST({c} AS VARCHAR)" for c in cols)
    return sql_xxh64_utf8(f"({joined} || chr(30) || '{int(seed)}')", 42)


def sql_digest64_sha256_u64(expr: str) -> str:
    """u64 view of the first 8 bytes (big-endian) of sha256(expr) — the
    ``digest64`` "sha256" strategy (functions/digest.py) as a DuckDB
    expression (DuckDB sha256() returns lowercase hex)."""
    inner = " + ".join(
        f"(strpos('0123456789abcdef', substr(hs, {i + 1}, 1)) - 1)::HUGEINT"
        f" * {16 ** (15 - i)}" for i in range(16))
    return let("hs", f"sha256({expr})", f"({inner})")


def oracle_cms_heavy_hitters(*, depth: int = 5, log2_width: int = 14,
                             seed: int = 42,
                             table: str = "events",
                             key_col: str = "event_type") -> str:
    """(event_type, est_count) — the count-min point estimates, exactly:
    counters are integer sums per (row j, index), indexes derive from the
    sha256 digest through source_hash + per-row mix64 (sketch/cms.py), all
    seeds folded to literals. Every arithmetic step is integer-exact, so
    the oracle matches the engine bit for bit."""
    width = 1 << log2_width
    mixseed = _mix64_int(seed)
    row_seeds = [_mix64_int((seed ^ (0xC1A0 + 0x9E37 * j)) % _M64)
                 for j in range(depth)]
    z1 = sql_umul_const(sql_xor_shr("z0", 30), _SM1)
    z2 = sql_umul_const(sql_xor_shr("z1", 27), _SM2)
    # one mix64 per row j, staged per-column (z0 differs per j)
    per_j = ",\n          ".join(
        let("z0", f"xor(sh, {rs}::HUGEINT)",
            let("z1", z1, let("z2", z2,
                              f"(xor(z2, z2 >> 31) & {width - 1})")))
        + f" AS i{j}"
        for j, rs in enumerate(row_seeds))
    cnt_ctes = ",\n        ".join(
        f"cnt{j} AS (SELECT i{j} AS idx, sum(n)::BIGINT AS c "
        f"FROM d GROUP BY i{j})" for j in range(depth))
    joins = "\n        ".join(
        f"JOIN cnt{j} c{j} ON d.i{j} = c{j}.idx" for j in range(depth))
    least = ", ".join(f"c{j}.c" for j in range(depth))
    return f"""
        WITH tc AS (SELECT {key_col}, count(*) AS n
                    FROM {table} GROUP BY {key_col}),
        dg AS (SELECT {key_col}, n,
                      {sql_digest64_sha256_u64(key_col)} AS dgv FROM tc),
        hh AS (SELECT {key_col}, n,
                      {sql_mix64(f"xor(dgv, {mixseed}::HUGEINT)")} AS sh
               FROM dg),
        d AS MATERIALIZED (
          SELECT {key_col}, n,
          {per_j}
          FROM hh
        ),
        {cnt_ctes}
        SELECT d.{key_col}, least({least}) AS est_count
        FROM d
        {joins}
    """


def oracle_hll_distinct_users(*, precision: int = 12, seed: int = 42,
                              table: str = "events",
                              key_col: str = "event_type",
                              user_col: str = "user_id",
                              round_digits: int = 4) -> str:
    """(event_type, n_events, est_users) — the HLL estimates, replayed:
    register(idx) = max rank over values, rank = min(clz64(h << p), 64-p)+1,
    estimate = bias-corrected harmonic mean with the linear-counting
    small-range branch (sketch/hll.py). est rounded to ``round_digits``
    (the harmonic sum's float ADD ORDER differs between numpy's pairwise
    reduction and SQL's sequential sum; values are equal to ~1e-12)."""
    m = 1 << precision
    mixseed = _mix64_int(seed)
    alpha = (0.673 if m == 16 else 0.697 if m == 32
             else 0.709 if m == 64 else 0.7213 / (1.0 + 1.079 / m))
    h_expr = sql_mix64(f"xor({sql_digest64_sha256_u64(user_col + '_s')}, "
                       f"{mixseed}::HUGEINT)")
    return f"""
        WITH ev AS (SELECT {key_col},
                           {user_col}::VARCHAR AS {user_col}_s
                    FROM {table}),
        nev AS (SELECT {key_col}, count(*) AS n_events
                FROM ev GROUP BY {key_col}),
        du AS (SELECT DISTINCT {key_col}, {user_col}_s FROM ev),
        hh AS MATERIALIZED (
          SELECT {key_col}, {h_expr} AS h FROM du),
        rr AS (SELECT {key_col},
                      (h >> {64 - precision})::BIGINT AS idx,
                      (CASE WHEN (h << {precision}) & {_M64 - 1} = 0
                            THEN {64 - precision}
                            ELSE least(64 - length(bin(
                                   (h << {precision}) & {_M64 - 1})),
                                 {64 - precision}) END) + 1 AS rank
               FROM hh),
        regs AS (SELECT {key_col}, idx, max(rank) AS reg
                 FROM rr GROUP BY {key_col}, idx),
        agg AS (SELECT {key_col},
                       count(*) AS present,
                       sum(power(2.0, -reg)) AS inv_present
                FROM regs GROUP BY {key_col}),
        est AS (SELECT {key_col},
                       {m} - present AS zeros,
                       CAST({alpha!r} AS DOUBLE) * {m}::DOUBLE * {m}::DOUBLE
                         / (({m} - present)::DOUBLE + inv_present) AS raw
                FROM agg)
        SELECT e.{key_col}, nev.n_events,
               round_even(CASE WHEN raw <= {2.5 * m}::DOUBLE AND zeros > 0
                          THEN {m}::DOUBLE * ln({m}::DOUBLE / zeros)
                          ELSE raw END, {round_digits}) AS est_users
        FROM est e JOIN nev ON e.{key_col} = nev.{key_col}
    """


_KM_MULT = 0x517CC1B727220A95


def oracle_bloom_fpr_envelope(*, expected_items: int = 500, seed: int = 42,
                              trials: int = 200_000,
                              fps=(0.1, 0.01, 0.001),
                              table: str = "documents",
                              text_col: str = "text") -> str:
    """(target_fp, m, k, measured_fpr, theoretical_bound) — a FULL replay
    of the Bloom kernel in SQL: member bit sets from the K-M double-hash
    chain (h2 = h1*KM; h_{j+1} = rotl5(h_j) + h2) with Lemire indexing
    ((h*m) >> 64 — m < 2^32 so the product fits HUGEINT), then 200k
    deterministic non-member probes counted as hits iff ALL k bits are
    set. m/k/bound fold from the same config math the engine uses
    (config.py), so only the measured hit count is computed in SQL —
    integer-exact. Chain stages are MATERIALIZED per step: inlining would
    expand the rotl chain exponentially."""
    from .config import BloomConfig

    mixseed = _mix64_int(seed)
    ctes, selects = [], []
    for ci, fp in enumerate(fps):
        cfg = BloomConfig.from_false_pos(fp, expected_items=expected_items,
                                         seed=seed)
        m, k = cfg.num_bits, cfg.num_hashes
        bound = cfg.expected_false_pos(expected_items)

        dig_m = sql_digest64_sha256_u64(text_col)
        dig_p = sql_digest64_sha256_u64("('nonmember:' || rid)")
        ctes += [f"c{ci}m AS (SELECT row_number() OVER () AS rid, "
                 f"{dig_m} AS dg FROM {table})",
                 f"c{ci}p AS (SELECT range::BIGINT AS rid, {dig_p} AS dg "
                 f"FROM range({trials}))"]
        mch, last_m = _bloom_chain_ctes(
            f"c{ci}mh", f"(SELECT rid, dg FROM c{ci}m)", "rid", k, m,
            mixseed)
        pch, last_p = _bloom_chain_ctes(
            f"c{ci}ph", f"(SELECT rid, dg FROM c{ci}p)", "rid", k, m,
            mixseed)
        ctes += mch + pch
        unpiv_m = " UNION ALL ".join(
            f"SELECT b{j} AS bit FROM {last_m}" for j in range(k))
        unpiv_p = " UNION ALL ".join(
            f"SELECT rid, b{j} AS bit FROM {last_p}" for j in range(k))
        ctes += [f"c{ci}bits AS MATERIALIZED "
                 f"(SELECT DISTINCT bit FROM ({unpiv_m}))",
                 f"c{ci}miss AS (SELECT DISTINCT rid FROM ({unpiv_p}) "
                 f"WHERE bit NOT IN (SELECT bit FROM c{ci}bits))"]
        # string-cast literals: DuckDB routes bare decimal literals
        # through DECIMAL (rounding 17-digit doubles one ulp off); the
        # VARCHAR->DOUBLE cast uses the exact float parser
        selects.append(
            f"SELECT CAST('{fp!r}' AS DOUBLE) AS target_fp, "
            f"{m}::BIGINT AS m, {k}::BIGINT AS k, "
            f"({trials} - (SELECT count(*) FROM c{ci}miss)) / {trials}.0 "
            f"AS measured_fpr, "
            f"CAST('{bound!r}' AS DOUBLE) AS theoretical_bound")
    return "WITH " + ",\n".join(ctes) + "\n" + " UNION ALL ".join(selects)


def oracle_simhash_dedup_survivors(table: str = "documents",
                                   id_col: str = "doc_id",
                                   text_col: str = "text", *,
                                   max_hamming: int = 3, bands: int = 4,
                                   max_bucket_size: int = 1000) -> str:
    """Surviving ids after full SimHash dedup — the banded-pair pipeline of
    :func:`oracle_simhash_pairs` extended with a RECURSIVE transitive
    closure (min id per single-link cluster survives), mirroring
    operators/dedup.py simhash_dedup."""
    with_chain, verified_select = _simhash_pairs_parts(
        table, id_col, text_col, max_hamming=max_hamming, bands=bands,
        max_bucket_size=max_bucket_size)
    return f"""
        WITH RECURSIVE {with_chain},
        verified AS ({verified_select}),
        edges AS (SELECT id_a AS src, id_b AS dst FROM verified
                  UNION SELECT id_b, id_a FROM verified),
        reach(id, r) AS (
          SELECT src, dst FROM edges
          UNION
          SELECT reach.id, edges.dst FROM reach
          JOIN edges ON reach.r = edges.src
        ),
        comp AS (SELECT id, least(id, min(r)) AS label
                 FROM reach GROUP BY id)
        SELECT {id_col} FROM {table}
        WHERE {id_col} NOT IN (SELECT id FROM comp WHERE label <> id)
    """


def _bloom_chain_ctes(prefix: str, src: str, key: str, k: int, m: int,
                      mixseed: int) -> tuple[list[str], str]:
    """K-M double-hash chain as MATERIALIZED CTE stages, carrying ``key``
    through: ``src`` must expose ``({key}, dg)`` with dg a u64 HUGEINT
    digest. Returns (ctes, last_cte_name); the last stage has columns
    ``({key}, b0..b{k-1})`` — the filter bit indexes (kernel.py
    source_hash -> DoubleHasher -> Lemire mulhi, bit-exact)."""
    out = [f"{prefix}0 AS MATERIALIZED (SELECT {key}, "
           f"{sql_mix64(f'xor(dg, {mixseed}::HUGEINT)')} AS g, "
           f"0::HUGEINT AS h2 FROM {src})",
           f"{prefix}1 AS MATERIALIZED (SELECT {key}, g, "
           f"{sql_umul_const('g', _KM_MULT)} AS h2, "
           f"((g * {m}) >> 64)::BIGINT AS b0 FROM {prefix}0)"]
    for j in range(1, k):
        prev = f"{prefix}{j}" if j > 1 else f"{prefix}1"
        rot = (f"(((g & {(1 << 59) - 1}) * 32 + "
               f"(g >> 59) + h2) & {_M64 - 1})")
        bits = ", ".join(f"b{x}" for x in range(j))
        out.append(
            f"{prefix}{j + 1} AS MATERIALIZED (SELECT {key}, "
            f"{rot} AS g, h2, {bits}, "
            f"(({rot} * {m}) >> 64)::BIGINT AS b{j} FROM {prev})")
    return out, f"{prefix}{k}"


def oracle_bloom_index_prune(*, num_buckets: int = 8, fp: float = 0.02,
                             expected_items: int = 128, seed: int = 42,
                             table: str = "documents") -> str:
    """Full replay of the data-skipping index (sources/index.py): bucket
    assignment (xxh64 of the doc_id string, masked — num_buckets is a
    power of two so unsigned mod == Spark's pmod), per-bucket Bloom bit
    sets from the kernel chain, probe survival (ALL k bits present), and
    the exact match counts that prove the pruned read lost no rows."""
    from .config import BloomConfig

    cfg = BloomConfig.from_false_pos(fp, expected_items=expected_items,
                                     seed=seed)
    m, k = cfg.num_bits, cfg.num_hashes
    mixseed = _mix64_int(seed)
    assert num_buckets & (num_buckets - 1) == 0
    xxh_doc = sql_xxh64_utf8("CAST(doc_id AS VARCHAR)")

    ctes = [
        f"base AS MATERIALIZED (SELECT ({xxh_doc}) & {num_buckets - 1} "
        f"AS bucket, {sql_digest64_sha256_u64('text')} AS dg FROM {table})",
        f"probes AS MATERIALIZED ("
        f"SELECT 'doc:' || CAST(doc_id AS VARCHAR) AS probe_id, "
        f"1 AS is_member, text AS val FROM {table} WHERE doc_id % 100 = 3 "
        f"UNION ALL SELECT 'absent:' || CAST(range AS VARCHAR), 0, "
        f"'absent:' || CAST(range AS VARCHAR) FROM range(5))",
        f"pr AS (SELECT probe_id, {sql_digest64_sha256_u64('val')} AS dg "
        f"FROM probes)",
    ]
    mch, mlast = _bloom_chain_ctes("mh", "base", "bucket", k, m, mixseed)
    pch, plast = _bloom_chain_ctes("ph", "pr", "probe_id", k, m, mixseed)
    ctes += mch + pch
    unpiv_m = " UNION ALL ".join(
        f"SELECT bucket, b{j} AS bit FROM {mlast}" for j in range(k))
    unpiv_p = " UNION ALL ".join(
        f"SELECT probe_id, b{j} AS bit FROM {plast}" for j in range(k))
    ctes += [
        f"bbits AS MATERIALIZED (SELECT DISTINCT bucket, bit "
        f"FROM ({unpiv_m}))",
        f"pbits AS MATERIALIZED (SELECT DISTINCT probe_id, bit "
        f"FROM ({unpiv_p}))",
        "pcnt AS (SELECT probe_id, count(*) AS nb FROM pbits "
        "GROUP BY probe_id)",
        "hit AS (SELECT p.probe_id, bb.bucket, count(*) AS got "
        "FROM pbits p JOIN bbits bb USING (bit) "
        "GROUP BY p.probe_id, bb.bucket)",
        "surv AS (SELECT probe_id, count(*) AS buckets_survived "
        "FROM hit JOIN pcnt USING (probe_id) WHERE got = nb "
        "GROUP BY probe_id)",
        f"matched AS (SELECT p.probe_id, count(d.text) AS rows_matched "
        f"FROM probes p LEFT JOIN {table} d ON d.text = p.val "
        f"GROUP BY p.probe_id)",
    ]
    return ("WITH " + ",\n".join(ctes) + "\n"
            "SELECT p.probe_id, p.is_member::INT AS is_member, "
            "COALESCE(s.buckets_survived, 0)::BIGINT AS buckets_survived, "
            "m2.rows_matched::BIGINT AS rows_matched "
            "FROM probes p LEFT JOIN surv s USING (probe_id) "
            "JOIN matched m2 ON m2.probe_id = p.probe_id "
            "ORDER BY p.probe_id")


def oracle_rademacher_ann(*, num_planes: int = 6, dim: int = 64,
                          quant: int = 1024, seed: int = 42,
                          n_queries: int = 3, k: int = 5,
                          table: str = "embeddings") -> str:
    """Full replay of the Rademacher-projection ANN
    (operators/similarity.py ann_topk_rhp with planes_kind="rademacher"):
    the ±1 plane matrix from the mix64 chain, integer-quantized dot signs
    (floor(x*quant+0.5) — exact for power-of-two quant, so no float tie
    can flip a bit across engines), bucket + 1-bit multiprobe candidate
    generation, and the exact cosine rerank (round-before-rank, tie-break
    on vec_id — same conventions as the embed_topk oracle)."""
    base = _mix64_int(seed)
    wexpr = sql_mix64(f"xor({u64(base)}, "
                      f"(pp * 4294967296 + ii)::HUGEINT)")
    return f"""
        WITH planes AS MATERIALIZED (
          SELECT pp AS p, ii AS i,
                 CASE WHEN ({wexpr}) & 1 = 1 THEN 1 ELSE -1 END AS w
          FROM (SELECT range AS pp FROM range({num_planes})),
               (SELECT range AS ii FROM range({dim}))
        ),
        vecs AS (SELECT vec_id, CAST(embedding AS DOUBLE[]) AS e
                 FROM {table}),
        comp AS MATERIALIZED (
          SELECT vec_id, di.i AS i,
                 floor(e[di.i + 1] * {quant} + 0.5)::BIGINT AS q
          FROM vecs, (SELECT range AS i FROM range({dim})) di
        ),
        dots AS (SELECT c.vec_id, pl.p, sum(pl.w * c.q) AS dot
                 FROM comp c JOIN planes pl ON c.i = pl.i
                 GROUP BY c.vec_id, pl.p),
        sig AS MATERIALIZED (
          SELECT vec_id,
                 sum(CASE WHEN dot > 0 THEN (1::BIGINT << p)
                     ELSE 0 END)::BIGINT AS bucket
          FROM dots GROUP BY vec_id),
        pb AS (SELECT s.vec_id AS query_id,
                      CASE WHEN f.b < 0 THEN s.bucket
                           ELSE xor(s.bucket, (1::BIGINT << f.b)) END
                      AS bucket
               FROM sig s,
                    (SELECT range AS b FROM range(-1, {num_planes})) f
               WHERE s.vec_id < {n_queries}),
        cand AS (SELECT DISTINCT pb.query_id, c.vec_id
                 FROM pb JOIN sig c ON pb.bucket = c.bucket),
        scored AS (
          SELECT cand.query_id, cand.vec_id,
                 round_even(list_cosine_similarity(qe.e, ce.e), 6) AS score
          FROM cand JOIN vecs qe ON qe.vec_id = cand.query_id
                    JOIN vecs ce ON ce.vec_id = cand.vec_id)
        SELECT CAST(query_id AS INT) AS query_id, vec_id, score,
               CAST(row_number() OVER (PARTITION BY query_id
                                       ORDER BY score DESC, vec_id)
                    AS INT) AS rank
        FROM scored QUALIFY rank <= {k}
    """


def oracle_zone_index_prune(*, num_buckets: int = 8,
                            table: str = "documents") -> str:
    """Replay of the zone-map range pruning (sources/index.py
    pruned_range_read): xxh64 bucket assignment, per-bucket exact min/max
    of n_chars, inclusive-overlap survival, and the unpruned match counts
    that prove zero-FN range pruning."""
    assert num_buckets & (num_buckets - 1) == 0
    xxh_doc = sql_xxh64_utf8("CAST(doc_id AS VARCHAR)")
    return f"""
        WITH base AS MATERIALIZED (
          SELECT doc_id, n_chars,
                 ({xxh_doc}) & {num_buckets - 1} AS bucket FROM {table}),
        zones AS (SELECT bucket, min(n_chars) AS vmin, max(n_chars) AS vmax
                  FROM base GROUP BY bucket),
        ranges(range_id, lo, hi) AS (
          VALUES ('narrow', 0, 50), ('mid', 100, 200),
                 ('empty', 1000000, 2000000)),
        surv AS (SELECT r.range_id, count(*) AS buckets_survived
                 FROM ranges r JOIN zones z
                   ON z.vmax >= r.lo AND z.vmin <= r.hi
                 GROUP BY r.range_id),
        m AS (SELECT r.range_id, count(d.doc_id) AS rows_matched
              FROM ranges r LEFT JOIN {table} d
                ON d.n_chars BETWEEN r.lo AND r.hi
              GROUP BY r.range_id)
        SELECT r.range_id, r.lo::BIGINT AS lo, r.hi::BIGINT AS hi,
               COALESCE(s.buckets_survived, 0)::BIGINT AS buckets_survived,
               m.rows_matched::BIGINT AS rows_matched
        FROM ranges r
        LEFT JOIN surv s ON s.range_id = r.range_id
        JOIN m ON m.range_id = r.range_id
        ORDER BY r.range_id
    """
