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


def fold_seed(s: int) -> int:
    """Fold an arbitrary-width integer seed into the 64-bit kernel-seed
    domain. The reference seeds its hasher from a u128 big-endian key
    (fastbloom src/builder.rs:42-45, src/hasher.rs:31-37); accepting any
    width here removes that asterisk while keeping one 64-bit word riding
    through sketch rows / checkpoints (schema unchanged — re-supplying the
    same wide seed folds to the same stored value, so resume still matches).

    Low 64 bits pass through unchanged (pure 64-bit seeds keep their
    historical bit patterns and existing checkpoints stay valid); each
    higher 64-bit word folds in through the splitmix64 finalizer, so u128
    seeds differing only in the high word produce different filters.
    Negative ints are the two's-complement view at the smallest 64-bit
    word width that holds them (the Parquet round-trip convention for
    int64; a wide negative folds its full two's-complement pattern — its
    high words are never silently dropped)."""
    if s < 0:
        # minimal two's-complement width: s fits w bits iff -(2^(w-1)) <= s,
        # i.e. w >= bit_length(-s - 1) + 1 (int64 min stays 64-bit)
        need = (-s - 1).bit_length() + 1
        width = max(64, ((need + 63) // 64) * 64)
        s &= (1 << width) - 1
    acc = s & U64_MASK
    rest = s >> 64
    if rest:
        from .kernel import mix64

        while rest:
            acc = int(mix64(acc ^ (rest & U64_MASK)))
            rest >>= 64
    return acc


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


def expected_false_pos_block64(num_hashes: int, num_bits: int,
                               num_items: int) -> float:
    """Theoretical FPR for the register-blocked (64-bit block) layout.

    Items distribute over W = m/64 words ~ uniformly; the load of one word is
    Poisson(n/W), and a probe false-positives iff its k (not necessarily
    distinct) bit picks are all set in its word. Conditional on j items in
    the word, the density is d_j = 1 - (1 - 1/64)^(k*j) and the per-probe FP
    is d_j^k; the bound is the Poisson mixture sum_j P(j) * d_j^k (truncated
    at 12 sigma)."""
    if num_items <= 0:
        return 0.0
    w = max(num_bits // WORD_BITS, 1)
    lam = float(num_items) / w
    k = num_hashes
    # truncate the Poisson sum well past the mass
    j_max = int(lam + 12.0 * math.sqrt(lam) + 25)
    log_p = -lam  # log P(0)
    total = 0.0
    base = 1.0 - 1.0 / WORD_BITS
    for j in range(j_max + 1):
        if j > 0:
            log_p += math.log(lam) - math.log(j)
        d_j = 1.0 - base ** (k * j)
        total += math.exp(log_p) * d_j**k
    return total


def round_up_bits(num_bits: int) -> int:
    """Round a bit count up to the reference's 64-bit word granularity
    (``src/lib.rs:83``: num_u64s = (num_bits + 63) // 64)."""
    if num_bits <= 0:
        raise ValueError("num_bits must be > 0")
    num_words = (num_bits + WORD_BITS - 1) // WORD_BITS
    return num_words * WORD_BITS


@dataclass(frozen=True)
class BloomConfig:
    """Immutable sketch geometry: (m, k, seed, layout).

    This is the Spark-side analogue of the reference's builder output — the
    filter "schema" of SURVEY.md §1.3. ``seed`` replaces the pluggable
    ``BuildHasher``: all probe indexes derive from one 64-bit source hash
    (sha256-based digest mixed with ``seed``), exactly mirroring the
    reference's single-source-hash design (``src/lib.rs:221-225``).

    ``layout``:

    * ``"flat"`` (default) — the reference-parity layout: k independent
      Lemire-indexed bits across the whole array.
    * ``"block64"`` — beyond-reference register-blocked layout (the
      split-block family fastbloom's README benchmarks against): one Lemire
      index selects a 64-bit word, all k bits land inside it. One memory
      touch per row instead of k — the ingest-throughput layout; costs
      ~1.3-2x bits for the same FPR (exact bound via
      :func:`expected_false_pos_block64`).
    """

    num_bits: int
    num_hashes: int
    seed: int | None = None
    layout: str = "flat"
    digest: str = "sha256"
    #: True iff the seed was randomly drawn (seed=None). Such a config
    #: cannot be re-derived after a process restart — operators whose
    #: state must survive restarts (streaming state stores, checkpoint
    #: resume across drivers) reject it and require an explicit seed.
    seed_drawn: bool = False

    def __post_init__(self) -> None:
        object.__setattr__(self, "num_bits", round_up_bits(self.num_bits))
        # k = 0 coerced to 1, parity with src/builder.rs:83
        object.__setattr__(self, "num_hashes", max(int(self.num_hashes), 1))
        object.__setattr__(self, "seed_drawn", self.seed is None)
        if self.seed is None:
            # reference parity: an unseeded filter draws a fresh random key
            # (src/hasher.rs:50-75) so its bit pattern is not globally
            # predictable/precomputable. Drawn ONCE here on the driver; the
            # value rides in the (frozen) config through every closure, so
            # all executors and merges agree.
            import os as _os

            object.__setattr__(
                self, "seed", int.from_bytes(_os.urandom(8), "little"))
        object.__setattr__(self, "seed", fold_seed(int(self.seed)))
        if self.layout not in ("flat", "block64"):
            raise ValueError(f"unknown layout {self.layout!r}")
        if self.layout == "block64" and self.num_hashes > 32:
            raise ValueError("block64 layout supports k <= 32")
        if (self.digest not in ("sha256", "xxh64")
                and not self.digest.startswith("custom:")):
            raise ValueError(f"unknown digest strategy {self.digest!r}")

    # -- builder-path constructors -------------------------------------------------

    @classmethod
    def with_num_bits(
        cls, num_bits: int, *, num_hashes: int | None = None,
        expected_items: int | None = None, seed: int | None = None,
        digest: str = "sha256",
    ) -> "BloomConfig":
        """Explicit-geometry path (reference ``with_num_bits().hashes()`` /
        ``.expected_items()``, ``src/lib.rs:129-131`` + ``src/builder.rs:80-106``)."""
        m = round_up_bits(num_bits)
        if num_hashes is None:
            if expected_items is None:
                raise ValueError("provide num_hashes or expected_items")
            num_hashes = optimal_hashes(m, max(int(expected_items), 1))
        return cls(num_bits=m, num_hashes=num_hashes, seed=seed,
                   digest=digest)

    @classmethod
    def from_false_pos(
        cls, fp: float, *, expected_items: int,
        num_hashes: int | None = None, seed: int | None = None,
        digest: str = "sha256",
    ) -> "BloomConfig":
        """FPR-driven path (reference ``with_false_pos().expected_items()``,
        ``src/lib.rs:116-118`` + ``src/builder.rs:212-218``)."""
        if not fp > 0.0:
            raise ValueError("false positive rate must be > 0")
        n = max(int(expected_items), 1)
        m = optimal_size(n, fp)
        if num_hashes is None:
            num_hashes = optimal_hashes(m, n)
        return cls(num_bits=m, num_hashes=num_hashes, seed=seed,
                   digest=digest)

    # -- derived -------------------------------------------------------------------

    @classmethod
    def block64_from_false_pos(cls, fp: float, *, expected_items: int,
                               seed: int | None = None,
                               digest: str = "sha256") -> "BloomConfig":
        """Size a block64-layout filter for a target FPR: for each k, binary-
        search the smallest word count whose Poisson-mixture bound meets fp;
        keep the (m, k) minimizing m."""
        n = max(int(expected_items), 1)
        best: tuple[int, int] | None = None
        for k in range(2, 17):
            hi = None
            w0 = max(n // 8, 1)
            w = w0
            while expected_false_pos_block64(k, w * WORD_BITS, n) > fp:
                w *= 2
                if w > (1 << 40):
                    break
            else:
                hi = w
            if hi is None:
                continue
            # hi//2 is a valid lower bound ONLY when the doubling loop ran
            # (then hi//2 failed the target); if the initial guess already
            # met fp the true minimum may be far below it — search from 1
            # (a handful of extra probes) instead of returning an
            # oversized "minimal" filter
            lo = max(hi // 2, 1) if hi > w0 else 1
            while lo < hi:
                mid = (lo + hi) // 2
                if expected_false_pos_block64(k, mid * WORD_BITS, n) <= fp:
                    hi = mid
                else:
                    lo = mid + 1
            if best is None or hi < best[0]:
                best = (hi, k)
        if best is None:
            raise ValueError("cannot satisfy fp with block64 layout")
        return cls(num_bits=best[0] * WORD_BITS, num_hashes=best[1],
                   seed=seed, layout="block64", digest=digest)

    @property
    def num_words(self) -> int:
        return self.num_bits // WORD_BITS

    def expected_false_pos(self, num_items: int) -> float:
        """Theoretical FPR bound at n items.

        flat: the reference's density^k (``src/lib.rs:228-231``);
        block64: Poisson-mixture block bound."""
        if self.layout == "block64":
            return expected_false_pos_block64(
                self.num_hashes, self.num_bits, num_items)
        d = expected_density(self.num_hashes, self.num_bits, num_items)
        return expected_false_pos(self.num_hashes, d)
