"""Slow pure-Python-int model of the reference's bit arithmetic.

Used only as a test oracle: every numpy kernel op must agree bit-for-bit with
this model, which transcribes the reference's semantics with arbitrary-
precision Python ints (no numpy), making u64 wrapping explicit.

Reference parity:
* index:        fastbloom src/lib.rs:396-399
* DoubleHasher: fastbloom src/hasher.rs:185-212
* insert/probe: fastbloom src/lib.rs:180-191, src/lib.rs:261-270
"""

from __future__ import annotations

M64 = (1 << 64) - 1
KM_MULT = 0x517CC1B727220A95


def index(num_bits: int, h: int) -> int:
    return (h * num_bits) >> 64


def rotl5(x: int) -> int:
    return ((x << 5) | (x >> 59)) & M64


def km_hashes(h1: int, k: int) -> list[int]:
    """The k probe hashes for a source hash: h1 itself, then k-1 from the
    double-hash recurrence."""
    out = [h1]
    h2 = (h1 * KM_MULT) & M64
    h = h1
    for _ in range(k - 1):
        h = (rotl5(h) + h2) & M64
        out.append(h)
    return out


def mix64(x: int) -> int:
    z = x & M64
    z = ((z ^ (z >> 30)) * 0xBF58476D1E4943B3) & M64
    z = ((z ^ (z >> 27)) * 0x94D049BB133111EB) & M64
    return (z ^ (z >> 31)) & M64


def source_hash(digest: int, seed: int) -> int:
    return mix64((digest & M64) ^ mix64(seed & M64))


class ModelBloom:
    """Bit-set model: words as Python ints."""

    def __init__(self, num_bits: int, k: int, seed: int = 0):
        assert num_bits % 64 == 0 and num_bits >= 64 and k >= 1
        self.m = num_bits
        self.k = k
        self.seed = seed
        self.words = [0] * (num_bits // 64)

    def _bits(self, digest: int) -> list[int]:
        h1 = source_hash(digest, self.seed)
        return [index(self.m, h) for h in km_hashes(h1, self.k)]

    def insert_digest(self, digest: int) -> None:
        for b in self._bits(digest):
            self.words[b >> 6] |= 1 << (b & 63)

    def contains_digest(self, digest: int) -> bool:
        return all(self.words[b >> 6] & (1 << (b & 63)) for b in self._bits(digest))

    def words_u64(self) -> list[int]:
        return list(self.words)
