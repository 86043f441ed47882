"""Bit-exactness of the numpy kernel vs the pure-Python reference model."""

from __future__ import annotations

import numpy as np
import pytest

from fastbloom_spark.kernel import (
    U64,
    contains_hashes,
    insert_hashes,
    intersect_words,
    mix64,
    mulhi64,
    source_hash,
    union_words,
    words_from_bytes,
    words_from_longs,
    words_to_bytes,
    words_to_longs,
)

from .reference_model import M64, ModelBloom, km_hashes
from .reference_model import index as model_index
from .reference_model import mix64 as model_mix64
from .reference_model import source_hash as model_source_hash

RNG = np.random.default_rng(42)


def rand_u64(n: int) -> np.ndarray:
    return RNG.integers(0, 1 << 64, size=n, dtype=np.uint64)


def test_mulhi64_exact():
    """index(m, h) = high 64 bits of h*m — vs arbitrary-precision ints."""
    hs = rand_u64(5000)
    for m in [64, 128, 1024, 1 << 20, (1 << 63) + 64, ((1 << 64) - 64)]:
        got = mulhi64(hs, m)
        want = np.array([(int(h) * m) >> 64 for h in hs.tolist()], dtype=np.uint64)
        assert np.array_equal(got, want), f"m={m}"


def test_mix64_exact():
    hs = rand_u64(2000)
    got = mix64(hs)
    want = np.array([model_mix64(int(h)) for h in hs.tolist()], dtype=np.uint64)
    assert np.array_equal(got, want)


def test_source_hash_signed_unsigned_views():
    """int64 (Spark long) and uint64 digests give identical source hashes."""
    d_u = rand_u64(1000)
    d_i = d_u.view(np.int64)
    for seed in [0, 1, 42, (1 << 64) - 1]:
        a = source_hash(d_u, seed)
        b = source_hash(d_i, seed)
        assert np.array_equal(a, b)
        want = np.array([model_source_hash(int(x), seed) for x in d_u.tolist()],
                        dtype=np.uint64)
        assert np.array_equal(a, want)


@pytest.mark.parametrize("k", [1, 2, 5, 11])
@pytest.mark.parametrize("num_bits", [64, 1024, 1 << 16])
def test_insert_probe_bit_parity(k, num_bits):
    """Insert+probe produce the exact same words and answers as the model."""
    n = 500
    digests = rand_u64(n)
    model = ModelBloom(num_bits, k, seed=7)
    for d in digests.tolist():
        model.insert_digest(d)

    words = np.zeros(num_bits // 64, dtype=U64)
    insert_hashes(words, source_hash(digests, 7), k)
    assert words_to_longs(words) == [
        w - (1 << 64) if w >= (1 << 63) else w for w in model.words_u64()
    ]

    probes = np.concatenate([digests[:100], rand_u64(1000)])
    got = contains_hashes(words, source_hash(probes, 7), k)
    want = np.array([model.contains_digest(int(d)) for d in probes.tolist()])
    assert np.array_equal(got, want)
    assert got[:100].all()  # zero false negatives


def test_km_stream_matches_model():
    """The double-hash probe stream is bit-exact (rotl 5 + wrapping add)."""
    # exercised indirectly above; check the raw stream too via a k=8 insert
    # into a huge, collision-free filter and recover the set bits.
    h1 = int(rand_u64(1)[0])
    k = 8
    m = 1 << 30
    words = np.zeros(m // 64, dtype=U64)
    insert_hashes(words, np.array([h1], dtype=np.uint64), k)
    expected_bits = sorted({model_index(m, h) for h in km_hashes(h1, k)})
    set_bits = sorted(
        int(w_i) * 64 + b
        for w_i in np.flatnonzero(words)
        for b in range(64)
        if int(words[w_i]) >> b & 1
    )
    assert set_bits == expected_bits


def test_duplicate_bits_in_one_batch():
    """_set_bits must be correct under duplicate indexes (OR semantics),
    on both the small (.at) and large (reduceat) paths."""
    for n in [10, 100_000]:
        digests = np.concatenate([rand_u64(n // 2)] * 2)  # forced duplicates
        words = np.zeros(64, dtype=U64)
        insert_hashes(words, source_hash(digests, 0), 3)
        words_one_by_one = np.zeros(64, dtype=U64)
        hs = source_hash(digests, 0)
        for i in range(hs.size):
            insert_hashes(words_one_by_one, hs[i:i + 1], 3)
        assert np.array_equal(words, words_one_by_one)


def test_union_intersect_word_semantics():
    a = rand_u64(32)
    b = rand_u64(32)
    assert np.array_equal(union_words(a, b), a | b)
    assert np.array_equal(intersect_words(a, b), a & b)
    with pytest.raises(ValueError):
        union_words(a, rand_u64(16))


def test_union_associative_commutative():
    ws = [rand_u64(64) for _ in range(6)]
    left = ws[0]
    for w in ws[1:]:
        left = union_words(left, w)
    import functools
    right = functools.reduce(union_words, reversed(ws))
    assert np.array_equal(left, right)


def test_words_roundtrip_bytes_and_longs():
    w = rand_u64(100)
    assert np.array_equal(words_from_bytes(words_to_bytes(w)), w)
    assert np.array_equal(words_from_longs(words_to_longs(w)), w)
    with pytest.raises(ValueError):
        words_from_bytes(b"")


def test_xxh64_bytes_known_lengths():
    """xxh64_bytes is deterministic and distinct across inputs/lengths
    (engine parity is asserted in test_spark_bloom with a live session)."""
    from fastbloom_spark.kernel import xxh64_bytes

    vals = [b"", b"a", b"abc", b"x" * 31, b"x" * 32, b"x" * 33, b"y" * 100]
    hashes = [xxh64_bytes(v) for v in vals]
    assert len(set(hashes)) == len(hashes)
    assert hashes == [xxh64_bytes(v) for v in vals]  # deterministic
    assert all(-(1 << 63) <= h < (1 << 63) for h in hashes)
    assert xxh64_bytes(b"abc", seed=1) != xxh64_bytes(b"abc", seed=2)


def test_digest64_bytes_strategies():
    from fastbloom_spark.kernel import digest64_bytes, xxh64_bytes

    assert digest64_bytes(b"hello") != digest64_bytes(b"hello", "xxh64")
    assert digest64_bytes(b"hello", "xxh64") == xxh64_bytes(b"hello")
