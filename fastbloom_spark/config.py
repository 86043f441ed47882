"""Bloom filter geometry & sizing math — analytic parity with the reference.

Replicates the reference's builder math exactly (fastbloom
``src/builder.rs:247-276``):

* ``optimal_hashes(m, n)``  = max(round(ln2 * m / n), 1)
* ``optimal_size(n, fp)``   = max(8 * ceil(n * ln(fp) / (-8 * ln^2 2)), 64)
* ``expected_density(k, m, n)`` = 1 - (1 - 1/m)^(n*k)
* ``expected_false_pos(k, density)`` = density^k

plus the structural invariants of the reference's builder
(``src/builder.rs:80-86``, ``src/lib.rs:79-88``):

* k is never 0 (coerced to >= 1),
* num_bits is rounded UP to a multiple of 64 words,
* num_bits is never < 64.

Note on rounding: Rust's ``f64::round`` rounds half away from zero; Python's
built-in ``round`` is banker's rounding, so we use ``floor(x + 0.5)`` for
non-negative inputs to keep size/hash-count parity bit-exact.
"""

from __future__ import annotations

import math
from dataclasses import dataclass

WORD_BITS = 64

#: Kirsch-Mitzenmacher second-hash multiplier (~2^64 / pi), from the
#: reference's DoubleHasher (``src/hasher.rs:199-201``).
KM_MULTIPLIER = 0x517CC1B727220A95

#: Left-rotation amount in the double-hash recurrence (``src/hasher.rs:209``).
KM_ROTATE = 5

U64_MASK = (1 << 64) - 1


def _round_half_away(x: float) -> int:
    """Rust f64::round for non-negative x (half away from zero)."""
    return int(math.floor(x + 0.5))


def optimal_hashes(num_bits: int, num_items: int) -> int:
    """Optimal number of hash probes k* for geometry (m, n).

    Parity with reference ``src/builder.rs:248-253``.
    """
    hashes = math.log(2.0) * float(num_bits) / float(num_items)
    return max(_round_half_away(hashes), 1)


def optimal_size(num_items: int, fp: float) -> int:
    """Smallest bit size m* achieving target false-positive rate `fp` for n items.

    Byte-ceiled with a 64-bit floor — parity with reference
    ``src/builder.rs:256-261``.
    """
    ln2sq = math.log(2.0) * math.log(2.0)
    result = 8 * int(math.ceil(float(num_items) * math.log(fp) / (-8.0 * ln2sq)))
    return max(result, 64)


def expected_density(num_hashes: int, num_bits: int, num_items: int) -> float:
    """Probability that any given bit is set after n inserts with k hashes.

    Parity with reference ``src/builder.rs:264-271``.
    """
    total_sets = float(num_items * num_hashes)
    prob_not_set = 1.0 - 1.0 / float(num_bits)
    return 1.0 - prob_not_set**total_sets


def expected_false_pos(num_hashes: int, density: float) -> float:
    """Theoretical FPR = density^k — the published bound we test against.

    Parity with reference ``src/builder.rs:274-276``.
    """
    return density ** float(num_hashes)


def round_up_bits(num_bits: int) -> int:
    """Round a bit count up to the reference's 64-bit word granularity
    (``src/lib.rs:83``: num_u64s = (num_bits + 63) // 64)."""
    if num_bits <= 0:
        raise ValueError("num_bits must be > 0")
    num_words = (num_bits + WORD_BITS - 1) // WORD_BITS
    return num_words * WORD_BITS


@dataclass(frozen=True)
class BloomConfig:
    """Immutable sketch geometry: (m, k, seed).

    This is the Spark-side analogue of the reference's builder output — the
    filter "schema" of SURVEY.md §1.3. ``seed`` replaces the pluggable
    ``BuildHasher``: all probe indexes derive from one 64-bit source hash
    (sha256-based digest mixed with ``seed``), exactly mirroring the
    reference's single-source-hash design (``src/lib.rs:221-225``).
    """

    num_bits: int
    num_hashes: int
    seed: int = 0

    def __post_init__(self) -> None:
        object.__setattr__(self, "num_bits", round_up_bits(self.num_bits))
        # k = 0 coerced to 1, parity with src/builder.rs:83
        object.__setattr__(self, "num_hashes", max(int(self.num_hashes), 1))
        object.__setattr__(self, "seed", int(self.seed) & U64_MASK)

    # -- builder-path constructors -------------------------------------------------

    @classmethod
    def with_num_bits(
        cls, num_bits: int, *, num_hashes: int | None = None,
        expected_items: int | None = None, seed: int = 0,
    ) -> "BloomConfig":
        """Explicit-geometry path (reference ``with_num_bits().hashes()`` /
        ``.expected_items()``, ``src/lib.rs:129-131`` + ``src/builder.rs:80-106``)."""
        m = round_up_bits(num_bits)
        if num_hashes is None:
            if expected_items is None:
                raise ValueError("provide num_hashes or expected_items")
            num_hashes = optimal_hashes(m, max(int(expected_items), 1))
        return cls(num_bits=m, num_hashes=num_hashes, seed=seed)

    @classmethod
    def from_false_pos(
        cls, fp: float, *, expected_items: int,
        num_hashes: int | None = None, seed: int = 0,
    ) -> "BloomConfig":
        """FPR-driven path (reference ``with_false_pos().expected_items()``,
        ``src/lib.rs:116-118`` + ``src/builder.rs:212-218``)."""
        if not fp > 0.0:
            raise ValueError("false positive rate must be > 0")
        n = max(int(expected_items), 1)
        m = optimal_size(n, fp)
        if num_hashes is None:
            num_hashes = optimal_hashes(m, n)
        return cls(num_bits=m, num_hashes=num_hashes, seed=seed)

    # -- derived -------------------------------------------------------------------

    @property
    def num_words(self) -> int:
        return self.num_bits // WORD_BITS

    def expected_false_pos(self, num_items: int) -> float:
        """Theoretical FPR bound at n items (reference ``src/lib.rs:228-231``)."""
        d = expected_density(self.num_hashes, self.num_bits, num_items)
        return expected_false_pos(self.num_hashes, d)
