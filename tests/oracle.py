"""A literal Python transcription of the reference C++ core algorithm
(include/hash_key.h, include/bloom_filter.h, include/index_reads.h,
include/search_reads.h) used as the oracle for property tests.

Deliberately written in the C++'s sequential style - slow but obviously
faithful.
"""

from __future__ import annotations

VALID = set("ACGTacgt")


class HashKey:
    def __init__(self, k: int):
        self.k = k
        self.bloom_size = 1 << (k - 1)
        self.mask = (1 << k) - 1
        self.clear()

    def clear(self):
        self.hash_size = 0
        self.a = self.b = self.c = self.d = 0

    def add(self, ch: str) -> int:
        self.hash_size += 1
        self.a = (self.a << 1) & self.mask
        self.b = (self.b << 1) & self.mask
        self.c = (self.c << 1) & self.mask
        self.d = (self.d << 1) & self.mask
        if ch in "Cc":
            self.b |= 1
            self.c |= 1
            self.d |= 1
        elif ch in "Gg":
            self.a |= 1
            self.c |= 1
            self.d |= 1
        elif ch in "Tt":
            self.a |= 1
            self.b |= 1
            self.d |= 1
        return self.hash_size

    def rv_add(self, ch: str) -> int:
        self.hash_size += 1
        top = self.bloom_size
        rv_mask = self.bloom_size - 1
        self.a = (self.a >> 1) & rv_mask
        self.b = (self.b >> 1) & rv_mask
        self.c = (self.c >> 1) & rv_mask
        self.d = (self.d >> 1) & rv_mask
        if ch in "Aa":
            self.a |= top
            self.b |= top
            self.d |= top
        elif ch in "Cc":
            self.a |= top
            self.c |= top
            self.d |= top
        elif ch in "Gg":
            self.b |= top
            self.c |= top
            self.d |= top
        return self.hash_size


class BloomOracle:
    """Byte-level transcription of the reference BloomFilter."""

    MASKS_EVEN = (128, 64, 32, 16)
    MASKS_ODD = (8, 4, 2, 1)

    def __init__(self, k: int):
        # sparse byte map (equivalent to the reference's dense char array,
        # which would be 2^(k-1) bytes)
        self.vec = {}

    def feed(self, h: HashKey):
        for p, key in enumerate((h.a, h.b, h.c, h.d)):
            m = self.MASKS_ODD[p] if key % 2 else self.MASKS_EVEN[p]
            i = key // 2
            self.vec[i] = self.vec.get(i, 0) | m

    def is_found(self, h: HashKey) -> bool:
        for p, key in enumerate((h.a, h.b, h.c, h.d)):
            m = self.MASKS_ODD[p] if key % 2 else self.MASKS_EVEN[p]
            if not (self.vec.get(key // 2, 0) & m):
                return False
        return True


def index_reads(seqs, k: int) -> BloomOracle:
    bloom = BloomOracle(k)
    h = HashKey(k)
    for seq in seqs:
        h.clear()
        for ch in seq:
            if ch not in VALID:
                h.clear()
            elif h.add(ch) >= k:
                bloom.feed(h)
    return bloom


def count_kmers_read(seq: str, k: int) -> int:
    n = 0
    run = 0
    for ch in seq:
        run = run + 1 if ch in VALID else 0
        if run >= k:
            n += 1
    return n


def search_read(bloom: BloomOracle, seq: str, k: int, t: int) -> bool:
    """reference search_reads inner loops (search_reads.h:46-83)."""
    h = HashKey(k)
    seen = 0
    for ch in seq:
        if ch not in VALID:
            h.clear()
        elif h.add(ch) >= k:
            if bloom.is_found(h):
                seen += 1
                if seen >= t:
                    return True
                h.clear()
    seen = 0
    h.clear()
    for ch in seq:
        if ch not in VALID:
            h.clear()
        elif h.rv_add(ch) >= k:
            if bloom.is_found(h):
                seen += 1
                if seen >= t:
                    return True
                h.clear()
    return False
