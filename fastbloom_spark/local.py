"""Single-node BloomFilter — API-parity surface for the reference's tests.

This is the local (driver-side / in-test) counterpart of the distributed
build: the same numpy kernel the Spark executors run, wrapped in the
reference's API shape (``insert`` / ``contains`` / ``union`` / ``intersect``
/ ``clear`` / ``iter`` / ``from_vec``; fastbloom ``src/lib.rs:153-351``).
The distributed job and this class produce bitwise-identical word arrays for
the same inputs — that parity is itself a test (SURVEY.md §5 "variant
parity").

It is also what a probe-side broadcast carries: ``BloomFilter`` values are
tiny (m/8 bytes) and ship inside pandas-UDF closures.
"""

from __future__ import annotations

from typing import Iterable

import numpy as np

from .config import BloomConfig, U64_MASK
from .kernel import (
    U64,
    contains_hashes,
    digest64_bytes,
    insert_hashes,
    intersect_words,
    source_hash,
    union_words,
    words_from_bytes,
    words_from_longs,
    words_to_bytes,
    words_to_longs,
)


class BloomFilter:
    """Fixed-geometry Bloom filter over 64-bit word blocks.

    Geometry (m, k, seed) never changes after construction — the reference's
    core invariant (``src/lib.rs:42``). Unlike the reference (which trusts
    hasher equality on merge, ``src/lib.rs:286``), merges here verify seed
    equality too.
    """

    __slots__ = ("config", "words", "rows_seen")

    def __init__(self, config: BloomConfig, words: np.ndarray | None = None,
                 rows_seen: int = 0) -> None:
        self.config = config
        if words is None:
            words = np.zeros(config.num_words, dtype=U64)
        else:
            words = np.asarray(words, dtype=U64)
            if words.size != config.num_words:
                raise ValueError(
                    f"word count {words.size} != geometry {config.num_words}")
        self.words = words
        self.rows_seen = rows_seen

    # -- constructors (builder-path parity) ---------------------------------------

    @classmethod
    def with_num_bits(cls, num_bits: int, *, num_hashes: int | None = None,
                      expected_items: int | None = None,
                      seed: int | None = None,
                      digest: str = "sha256") -> "BloomFilter":
        return cls(BloomConfig.with_num_bits(
            num_bits, num_hashes=num_hashes, expected_items=expected_items,
            seed=seed, digest=digest))

    @classmethod
    def with_false_pos(cls, fp: float, *, expected_items: int,
                       seed: int | None = None,
                       digest: str = "sha256") -> "BloomFilter":
        return cls(BloomConfig.from_false_pos(
            fp, expected_items=expected_items, seed=seed, digest=digest))

    @classmethod
    def from_vec(cls, words, *, num_hashes: int, seed: int = 0,
                 layout: str = "flat", digest: str = "sha256") -> "BloomFilter":
        """Rebuild from raw words (reference ``from_vec``, ``src/lib.rs:148-150``).
        Geometry (k, seed, layout) must be re-supplied, exactly as the
        reference requires seed + hashes on its round trip
        (``src/lib.rs:141-147``)."""
        arr = words_from_longs(words) if not isinstance(words, (bytes, bytearray)) \
            else words_from_bytes(bytes(words))
        if arr.size == 0:
            raise ValueError("bit vector must be non-empty")
        cfg = BloomConfig(num_bits=arr.size * 64, num_hashes=num_hashes,
                          seed=seed, layout=layout, digest=digest)
        return cls(cfg, arr)

    @classmethod
    def from_bytes(cls, buf: bytes, *, num_hashes: int, seed: int = 0,
                   layout: str = "flat", digest: str = "sha256") -> "BloomFilter":
        return cls.from_vec(buf, num_hashes=num_hashes, seed=seed,
                            layout=layout, digest=digest)

    # -- geometry -----------------------------------------------------------------

    @property
    def num_bits(self) -> int:
        return self.config.num_bits

    @property
    def num_hashes(self) -> int:
        return self.config.num_hashes

    @property
    def seed(self) -> int:
        return self.config.seed

    def expected_false_pos(self, num_items: int) -> float:
        return self.config.expected_false_pos(num_items)

    # -- hashing ------------------------------------------------------------------

    def source_hashes(self, digests) -> np.ndarray:
        """Seed-mixed source hashes from a digest64 vector."""
        return source_hash(np.asarray(digests), self.config.seed)

    def _hash_value(self, val) -> np.ndarray:
        if isinstance(val, (bytes, bytearray)):
            d = digest64_bytes(bytes(val), self.config.digest)
        elif isinstance(val, str):
            d = digest64_bytes(val.encode("utf-8"), self.config.digest)
        elif isinstance(val, (int, np.integer)):
            d = int(val) & U64_MASK
            # two's-complement signed form: np.int64 rejects ints >= 2^63
            d = d - (1 << 64) if d >= (1 << 63) else d
        else:
            raise TypeError(f"unhashable input type {type(val)!r}")
        return source_hash(np.array([d], dtype=np.int64).view(U64), self.config.seed)

    # -- inserts / probes ---------------------------------------------------------

    def insert(self, val) -> bool:
        """Insert one value. Returns True iff all k bits were already set —
        "may have been previously present" (``src/lib.rs:261-270``)."""
        h = self._hash_value(val)
        prev = bool(contains_hashes(self.words, h, self.num_hashes,
                                    self.config.layout)[0])
        insert_hashes(self.words, h, self.num_hashes, self.config.layout)
        self.rows_seen += 1
        return prev

    def insert_all(self, vals: Iterable) -> None:
        for v in vals:
            self.insert(v)

    def insert_digests(self, digests) -> None:
        """Vectorized bulk insert of a digest64 vector (the hot path)."""
        d = np.asarray(digests)
        insert_hashes(self.words, self.source_hashes(d), self.num_hashes,
                      self.config.layout)
        self.rows_seen += d.size

    def contains(self, val) -> bool:
        return bool(contains_hashes(self.words, self._hash_value(val),
                                    self.num_hashes, self.config.layout)[0])

    def contains_digests(self, digests) -> np.ndarray:
        """Vectorized bulk probe of a digest64 vector → bool array."""
        return contains_hashes(self.words,
                               self.source_hashes(np.asarray(digests)),
                               self.num_hashes, self.config.layout)

    # -- set algebra --------------------------------------------------------------

    def _check_compatible(self, other: "BloomFilter") -> None:
        if self.num_hashes != other.num_hashes:
            raise ValueError("expected same number of hashes")
        if self.num_bits != other.num_bits:
            raise ValueError("expected same number of bits")
        if self.seed != other.seed:
            raise ValueError("expected same seed")
        if self.config.layout != other.config.layout:
            raise ValueError("expected same layout")
        if self.config.digest != other.config.digest:
            raise ValueError("expected same digest strategy")

    def union(self, other: "BloomFilter") -> "BloomFilter":
        self._check_compatible(other)
        self.words = union_words(self.words, other.words)
        self.rows_seen += other.rows_seen
        return self

    def intersect(self, other: "BloomFilter") -> "BloomFilter":
        self._check_compatible(other)
        self.words = intersect_words(self.words, other.words)
        return self

    def clear(self) -> None:
        self.words = np.zeros(self.config.num_words, dtype=U64)
        self.rows_seen = 0

    # -- serialization ------------------------------------------------------------

    def to_bytes(self) -> bytes:
        return words_to_bytes(self.words)

    def iter_words(self) -> list[int]:
        return words_to_longs(self.words)

    def copy(self) -> "BloomFilter":
        return BloomFilter(self.config, self.words.copy(), self.rows_seen)

    # -- equality: bits + k, hasher ignored (src/lib.rs:365-370) -------------------

    def __eq__(self, other) -> bool:
        if not isinstance(other, BloomFilter):
            return NotImplemented
        return (self.num_hashes == other.num_hashes
                and self.words.size == other.words.size
                and bool(np.array_equal(self.words, other.words)))

    def __repr__(self) -> str:
        return (f"BloomFilter(m={self.num_bits}, k={self.num_hashes}, "
                f"seed={self.seed}, rows_seen={self.rows_seen})")
