"""Property-test ports of the reference's in-crate suite (single-node path).

Port map (fastbloom):
* zero false negatives sweep      — src/lib.rs:535-548
* FPR within published bound      — src/lib.rs:468-515 (reduced grid/trials)
* first insert returns False      — src/lib.rs:462-466
* nothing after clear             — src/lib.rs:517-533
* seeded determinism              — src/lib.rs:577-600
* FPR monotone in size            — src/lib.rs:602-630
* k* empirically optimal          — src/lib.rs:550-575 (reduced trials)
* derived-hash uniformity         — src/lib.rs:632-657
* to/from_vec round trip          — src/lib.rs:444-460, src/lib.rs:698-713
"""

from __future__ import annotations

import numpy as np
import pytest

from fastbloom_spark import BloomConfig, BloomFilter
from fastbloom_spark.kernel import U64, mulhi64

# Reference harness: members from one seeded stream, non-members from a
# disjoint one (src/lib.rs:419-442). We use disjoint integer ranges hashed
# through disjoint seeded PRNG streams.


def member_stream(n: int) -> np.ndarray:
    return np.random.default_rng(5).integers(0, 1 << 63, size=n, dtype=np.uint64)


def non_member_stream(n: int) -> np.ndarray:
    # offset into a disjoint value space: high bit set
    return (np.random.default_rng(7).integers(0, 1 << 63, size=n, dtype=np.uint64)
            | np.uint64(1 << 63))


def false_pos_rate(f: BloomFilter, trials: int = 200_000) -> float:
    probes = non_member_stream(trials)
    return float(f.contains_digests(probes.view(np.int64)).mean())


@pytest.mark.parametrize("num_bytes", [512, 1000, 2048, 8192])
def test_random_inserts_always_contained(num_bytes):
    """Zero false negatives + re-probe is True, swept over sizes
    (src/lib.rs:535-548)."""
    for mag in range(1, 6):
        n = 10**mag
        f = BloomFilter.with_num_bits(num_bytes * 8, expected_items=n, seed=3)
        members = member_stream(n).view(np.int64)
        f.insert_digests(members)
        assert f.contains_digests(members).all()


@pytest.mark.parametrize("fp_mag", [1, 2, 3, 5])
@pytest.mark.parametrize("n_mag", [3, 4, 5])
def test_fpr_within_published_bound(fp_mag, n_mag):
    """Measured FPR < target or within 2x of it (reference tolerance
    err < 1.0, src/lib.rs:485-515). Reduced grid for CI."""
    target_fp = 1.0 / 10**fp_mag
    n = 10**n_mag
    f = BloomFilter.with_false_pos(target_fp, expected_items=n, seed=11)
    f.insert_digests(member_stream(n).view(np.int64))
    fp = false_pos_rate(f, trials=500_000)
    if fp > target_fp:
        err = (fp - target_fp) / target_fp
        assert err < 1.0, (target_fp, n, fp)


def test_first_insert_false():
    """First insert into an empty filter must report 'not previously present'
    (src/lib.rs:462-466)."""
    f = BloomFilter.with_num_bits(1024, num_hashes=4)
    assert f.insert("first item") is False
    assert f.insert("first item") is True


def test_nothing_after_clear():
    """clear() empties the filter (src/lib.rs:517-533)."""
    f = BloomFilter.with_num_bits(4096, num_hashes=3, seed=1)
    f.insert_digests(member_stream(1000).view(np.int64))
    f.clear()
    assert not f.words.any()
    assert f.contains_digests(member_stream(1000).view(np.int64)).sum() == 0


def test_seeded_is_same():
    """Same seed ⇒ bitwise-equal filters; different seed ⇒ different bits
    (src/lib.rs:577-600)."""
    data = member_stream(2000).view(np.int64)
    for seed in [0, 1, 42, 1234567]:
        a = BloomFilter.with_num_bits(1 << 14, num_hashes=4, seed=seed)
        b = BloomFilter.with_num_bits(1 << 14, num_hashes=4, seed=seed)
        a.insert_digests(data)
        b.insert_digests(data)
        assert a == b
        c = BloomFilter.with_num_bits(1 << 14, num_hashes=4, seed=seed + 1)
        c.insert_digests(data)
        assert not np.array_equal(a.words, c.words)


def test_false_pos_decreases_with_size():
    """FPR non-increasing in m (src/lib.rs:602-630)."""
    n = 5000
    data = member_stream(n).view(np.int64)
    prev = 1.0
    for bits_mag in range(13, 19):
        f = BloomFilter.with_num_bits(1 << bits_mag, expected_items=n, seed=2)
        f.insert_digests(data)
        fp = false_pos_rate(f, trials=100_000)
        assert fp <= prev + 0.01
        prev = fp


def test_optimal_hashes_is_empirically_optimal():
    """k* ± 2 never beats k* by a meaningful margin on measured FPR
    (src/lib.rs:550-575, reduced trials)."""
    n = 10_000
    m = 1 << 16
    data = member_stream(n).view(np.int64)
    cfg = BloomConfig.with_num_bits(m, expected_items=n)
    k_star = cfg.num_hashes

    def measured(k: int) -> float:
        f = BloomFilter.with_num_bits(m, num_hashes=k, seed=5)
        f.insert_digests(data)
        return false_pos_rate(f, trials=300_000)

    fp_star = measured(k_star)
    for k in [k_star - 2, k_star - 1, k_star + 1, k_star + 2]:
        if k < 1:
            continue
        assert measured(k) >= fp_star * 0.85, (k, k_star)


def test_derived_hash_uniformity():
    """The K-M probe stream is uniform across bit positions within 5%
    (src/lib.rs:632-657)."""
    from fastbloom_spark.kernel import _KM_MULT, _next_hash

    num_buckets = 100
    m = num_buckets * 64
    n = 1_000_000
    f = BloomFilter.with_num_bits(m, num_hashes=1, seed=0)
    h = f.source_hashes(member_stream(n).view(np.int64))
    with np.errstate(over="ignore"):
        h2 = h * _KM_MULT
        for depth in range(4):  # source hash + three derived levels
            idx = mulhi64(h, m)
            counts = np.bincount((idx >> np.uint64(6)).astype(int),
                                 minlength=num_buckets)
            expected = n / num_buckets
            assert np.abs(counts - expected).max() / expected < 0.05, depth
            h = _next_hash(h, h2)


def test_to_from_vec_roundtrip():
    """Serialization round trip over odd sizes; continue inserting after
    rehydration (src/lib.rs:444-460, 698-713, 715-734)."""
    for num_bits in [64, 448, 1024, 10048]:
        f = BloomFilter.with_num_bits(num_bits, num_hashes=3, seed=21)
        f.insert_digests(member_stream(500).view(np.int64))
        g = BloomFilter.from_vec(f.iter_words(), num_hashes=3, seed=21)
        assert f == g
        h = BloomFilter.from_bytes(f.to_bytes(), num_hashes=3, seed=21)
        assert f == h
        # keep inserting on both sides: stays identical
        more = non_member_stream(500).view(np.int64)
        f.insert_digests(more)
        g.insert_digests(more)
        assert f == g


def test_union_intersect_semantics():
    """union ⊇ both, intersect ⊆ both; doc-example semantics
    (src/lib.rs:286-350)."""
    a = BloomFilter.with_num_bits(4096, num_hashes=4, seed=1)
    b = BloomFilter.with_num_bits(4096, num_hashes=4, seed=1)
    xs = member_stream(3000).view(np.int64)
    a.insert_digests(xs[:2000])
    b.insert_digests(xs[1000:])
    u = a.copy().union(b)
    assert u.contains_digests(xs).all()
    i = a.copy().intersect(b)
    mid = i.contains_digests(xs[1000:2000])
    assert mid.all()  # true members of both always survive (no false negatives)
    with pytest.raises(ValueError):
        a.union(BloomFilter.with_num_bits(4096, num_hashes=5, seed=1))
    with pytest.raises(ValueError):
        a.union(BloomFilter.with_num_bits(8192, num_hashes=4, seed=1))
    with pytest.raises(ValueError):
        a.union(BloomFilter.with_num_bits(4096, num_hashes=4, seed=2))


def test_equality_ignores_seed():
    """Equality compares bits + k, not hasher (src/lib.rs:365-370)."""
    a = BloomFilter.with_num_bits(256, num_hashes=2, seed=1)
    b = BloomFilter.with_num_bits(256, num_hashes=2, seed=2)
    assert a == b  # both empty: equal despite different seeds


def test_fpr_heavier_point():
    """One heavier grid point toward the reference's envelope
    (n=10^6, fp=10^-4, 2M trials; src/lib.rs:485-515)."""
    n = 1_000_000
    target_fp = 1e-4
    f = BloomFilter.with_false_pos(target_fp, expected_items=n, seed=17)
    f.insert_digests(member_stream(n).view(np.int64))
    assert f.contains_digests(member_stream(n).view(np.int64)).all()
    fp = false_pos_rate(f, trials=2_000_000)
    if fp > target_fp:
        assert (fp - target_fp) / target_fp < 1.0, fp


def test_fpr_envelope_xxh64_strategy():
    """The xxh64 digest strategy must meet the same FPR envelope as sha256:
    the splitmix seed mix + K-M derivation whiten the digest, so the
    weaker-but-uniform hash still tracks the analytic bound (reference
    envelope tolerance, src/lib.rs:485-515)."""
    from fastbloom_spark.kernel import digest64_bytes

    n = 20_000
    target_fp = 0.01
    f = BloomFilter.with_false_pos(target_fp, expected_items=n, seed=3,
                                   digest="xxh64")
    members = np.array([digest64_bytes(f"m{i}".encode(), "xxh64")
                        for i in range(n)], dtype=np.int64)
    f.insert_digests(members)
    assert f.contains_digests(members).all()  # zero FN
    trials = 200_000
    probes = np.array([digest64_bytes(f"x{i}".encode(), "xxh64")
                       for i in range(trials)], dtype=np.int64)
    fp = f.contains_digests(probes).mean()
    if fp > target_fp:
        assert (fp - target_fp) / target_fp < 1.0, fp
