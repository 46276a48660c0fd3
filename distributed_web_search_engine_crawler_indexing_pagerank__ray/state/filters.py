"""Approximate-membership filters for the URL-seen set (north rule).

The reference keeps its seen set as an exact KVS table
(``pt-crawl-visited``, ``src/jobs/Crawler.java:376,413-427``) probed
with one HTTP ``existsRow`` RPC per candidate link.  The north rule
replaces that with **sharded cuckoo filters fronted by a bloom
prefilter**: a negative bloom answer short-circuits (no exact-set
probe), the cuckoo filter supports deletes and bounded false positives,
and the exact string set remains the authority (so equality with the
oracle is exact — the filters only cut probe cost and are metered for
false-positive rate).

Both filters key on a 64-bit slice of the SHA-1 already computed for
``Hasher.hash`` — no extra hashing of the URL in the hot path.
"""

from __future__ import annotations

import numpy as np

MASK64 = (1 << 64) - 1


def _mix(x: np.ndarray | int, c: int) -> np.ndarray | int:
    """splitmix64 finalizer step, vectorized over uint64 arrays
    (modular wraparound is intentional)."""
    with np.errstate(over="ignore"):
        x = (x ^ (x >> np.uint64(30))) * np.uint64(c) & np.uint64(MASK64)
        return x ^ (x >> np.uint64(31))


class BloomFilter:
    """Plain k-hash bloom over a numpy bit array (vectorized batch ops)."""

    def __init__(self, n_bits: int = 1 << 20, k: int = 4):
        self.n_bits = int(n_bits)
        self.k = k
        self.bits = np.zeros((self.n_bits + 7) // 8, dtype=np.uint8)

    def _positions(self, keys: np.ndarray) -> np.ndarray:
        h1 = _mix(keys.astype(np.uint64), 0xBF58476D1CE4E5B9)
        h2 = _mix(keys.astype(np.uint64), 0x94D049BB133111EB) | np.uint64(1)
        idx = np.empty((self.k, len(keys)), dtype=np.uint64)
        for i in range(self.k):
            idx[i] = (h1 + np.uint64(i) * h2) % np.uint64(self.n_bits)
        return idx

    def add_many(self, keys: np.ndarray) -> None:
        if len(keys) == 0:
            return
        pos = self._positions(keys).ravel()
        np.bitwise_or.at(self.bits, (pos >> np.uint64(3)).astype(np.int64),
                         np.left_shift(1, (pos & np.uint64(7)).astype(np.uint8)).astype(np.uint8))

    def contains_many(self, keys: np.ndarray) -> np.ndarray:
        """Boolean array: True = *maybe* present, False = definitely not."""
        if len(keys) == 0:
            return np.zeros(0, dtype=bool)
        pos = self._positions(keys)
        byte = self.bits[(pos >> np.uint64(3)).astype(np.int64)]
        bit = (byte >> (pos & np.uint64(7)).astype(np.uint8)) & 1
        return bit.all(axis=0)


def _mix_int(x: int, c: int) -> int:
    x &= MASK64
    x = ((x ^ (x >> 30)) * c) & MASK64
    return (x ^ (x >> 31)) & MASK64


class CuckooFilter:
    """Partial-key cuckoo filter (Fan et al., CoNEXT'14): 4-slot buckets,
    16-bit fingerprints, xor-partial eviction, bounded kick chain.
    Storage is a flat Python int list — single-key ops are the hot path
    (one insert per newly-visited URL at reconcile) and plain ints beat
    per-item numpy calls ~10×."""

    def __init__(self, n_buckets: int = 1 << 16, max_kicks: int = 500, seed: int = 42):
        # power-of-two bucket count so i2 = i1 ^ H(fp) stays in range
        n = 1
        while n < n_buckets:
            n <<= 1
        self.n_buckets = n
        self.max_kicks = max_kicks
        self.slots = [0] * (4 * n)  # 0 = empty
        self._kick_state = seed or 1
        self.n_items = 0
        self.n_failed = 0
        self._np_slots: np.ndarray | None = None  # probe-path mirror
        self._np_dirty = True

    def _fp(self, key: int) -> int:
        return (_mix_int(key, 0xBF58476D1CE4E5B9) & 0xFFFF) or 1

    def _i1(self, key: int) -> int:
        return _mix_int(key, 0x94D049BB133111EB) & (self.n_buckets - 1)

    def _alt(self, i: int, fp: int) -> int:
        return (i ^ _mix_int(fp, 0xBF58476D1CE4E5B9)) & (self.n_buckets - 1)

    def add(self, key: int) -> bool:
        self._np_dirty = True
        slots = self.slots
        fp = self._fp(key)
        i1 = self._i1(key)
        i2 = self._alt(i1, fp)
        for i in (i1, i2):
            base = 4 * i
            for s in range(4):
                if slots[base + s] == 0:
                    slots[base + s] = fp
                    self.n_items += 1
                    return True
        i = i1 if (key & 1) == 0 else i2
        for _ in range(self.max_kicks):
            self._kick_state = _mix_int(self._kick_state, 0x9E3779B97F4A7C15)
            s = self._kick_state & 3
            base = 4 * i
            fp, slots[base + s] = slots[base + s], fp
            i = self._alt(i, fp)
            base = 4 * i
            for s2 in range(4):
                if slots[base + s2] == 0:
                    slots[base + s2] = fp
                    self.n_items += 1
                    return True
        self.n_failed += 1  # table full: caller should resize/spill
        return False

    def contains(self, key: int) -> bool:
        slots = self.slots
        fp = self._fp(key)
        i1 = self._i1(key)
        b = 4 * i1
        if fp in slots[b : b + 4]:
            return True
        b = 4 * self._alt(i1, fp)
        return fp in slots[b : b + 4]

    def contains_many(self, keys: np.ndarray) -> np.ndarray:
        """Vectorized batch probe: fingerprints / bucket indices via the
        splitmix mixers on uint64 arrays, both candidate buckets checked
        with numpy gathers against a cached uint16 mirror of the slot
        list (rebuilt lazily after inserts — one O(slots) copy per
        insert burst, ~10 ms at 2^16 buckets, vs ~2 µs PER KEY for the
        scalar probe loop this replaced)."""
        if len(keys) == 0:
            return np.zeros(0, dtype=bool)
        if self._np_dirty or self._np_slots is None:
            self._np_slots = np.asarray(self.slots, dtype=np.uint16).reshape(-1, 4)
            self._np_dirty = False
        k = keys.astype(np.uint64)
        fp = (_mix(k, 0xBF58476D1CE4E5B9) & np.uint64(0xFFFF)).astype(np.uint16)
        fp = np.where(fp == 0, np.uint16(1), fp)
        mask = np.uint64(self.n_buckets - 1)
        i1 = (_mix(k, 0x94D049BB133111EB) & mask).astype(np.int64)
        alt_h = _mix(fp.astype(np.uint64), 0xBF58476D1CE4E5B9)
        i2 = ((i1.astype(np.uint64) ^ alt_h) & mask).astype(np.int64)
        s = self._np_slots
        hit = (s[i1] == fp[:, None]).any(axis=1)
        miss = ~hit
        if miss.any():
            hit[miss] = (s[i2[miss]] == fp[miss, None]).any(axis=1)
        return hit

    def delete(self, key: int) -> bool:
        self._np_dirty = True
        slots = self.slots
        fp = self._fp(key)
        i1 = self._i1(key)
        for i in (i1, self._alt(i1, fp)):
            base = 4 * i
            for s in range(4):
                if slots[base + s] == fp:
                    slots[base + s] = 0
                    self.n_items -= 1
                    return True
        return False

    @property
    def load(self) -> float:
        return self.n_items / (self.n_buckets * 4)


class ScalableSeenFilters:
    """Bloom + cuckoo pair that rebuilds at 2× capacity when the cuckoo
    load passes 0.8 (a saturated cuckoo degrades every insert into a
    full eviction chain — measured as seconds per wave).  Keys are kept
    (8 B each) so rebuilds are exact; amortized O(1) per insert."""

    def __init__(self, n_bits: int = 1 << 20, n_buckets: int = 1 << 15):
        self.bloom = BloomFilter(n_bits=n_bits)
        self.cuckoo = CuckooFilter(n_buckets=n_buckets)
        self.keys: list[int] = []
        self.rebuilds = 0
        # probe-path meters: how many candidates each layer screened out
        self.probes = 0
        self.bloom_maybe = 0
        self.cuckoo_maybe = 0

    def add_batch(self, keys: list[int]) -> None:
        if not keys:
            return
        self.keys.extend(keys)
        if (self.cuckoo.n_items + len(keys)) > 0.8 * self.cuckoo.n_buckets * 4:
            self._rebuild()
        else:
            self.bloom.add_many(np.asarray(keys, dtype=np.uint64))
            for k in keys:
                self.cuckoo.add(int(k))
            if self.cuckoo.n_failed:
                # a dropped fingerprint would make contains_many return a
                # DEFINITIVE negative for a genuinely-seen key and break
                # the exact-authority contract — rebuild at 2x immediately
                self._rebuild()

    def _rebuild(self) -> None:
        n = len(self.keys)
        buckets = self.cuckoo.n_buckets
        while n > 0.6 * buckets * 4:
            buckets *= 2
        bits = self.bloom.n_bits
        while n * 10 > bits:
            bits *= 2
        self.bloom = BloomFilter(n_bits=bits)
        self.bloom.add_many(np.asarray(self.keys, dtype=np.uint64))
        # retry with doubling if the fresh table still drops a key (only
        # possible via adversarial fingerprint collisions at <=0.6 load);
        # after the bounded retries, leave n_failed set — contains_many
        # then degrades to bloom-only screening, which has no false
        # negatives, so correctness is preserved at a higher probe cost.
        for _ in range(3):
            self.cuckoo = CuckooFilter(n_buckets=buckets)
            for k in self.keys:
                self.cuckoo.add(int(k))
            if self.cuckoo.n_failed == 0:
                break
            buckets *= 2
        self.rebuilds += 1

    def contains_many(self, keys: np.ndarray) -> np.ndarray:
        """Layered maybe-present probe: bloom first (vectorized, screens
        the common all-new case), then the cuckoo filter on the bloom
        survivors (its ~0.1 % fp rate at 16-bit fingerprints is far
        below the bloom's, so most bloom false positives die here and
        never reach the exact-authority probe).  True = maybe present."""
        self.probes += len(keys)
        maybe = self.bloom.contains_many(keys)
        hits = np.nonzero(maybe)[0]
        self.bloom_maybe += len(hits)
        if len(hits) and self.cuckoo.n_failed == 0:
            # the cuckoo layer is only consulted while it is COMPLETE
            # (n_failed == 0); a filter that dropped an insert could
            # return a false definitive-negative for a seen key
            ck = self.cuckoo.contains_many(np.asarray(keys, dtype=np.uint64)[hits])
            maybe[hits] = ck
            self.cuckoo_maybe += int(ck.sum())
        return maybe

    def stats(self) -> dict[str, int]:
        return {
            "probes": self.probes,
            "bloom_maybe": self.bloom_maybe,
            "cuckoo_maybe": self.cuckoo_maybe,
            "rebuilds": self.rebuilds,
            "cuckoo_failed": self.cuckoo.n_failed,
        }
