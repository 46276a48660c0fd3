"""Mergeable sketches: HyperLogLog approximate distinct count.

Standard dense HLL (Flajolet et al. 2007, with the usual small-range
linear-counting correction): ``p`` leading hash bits pick a register,
the register keeps the max leading-zero rank of the rest.  Registers
merge by element-wise max — the sketch pattern of the aggregation
guide: one sketch per batch, merged in a tiny second stage.
"""

from __future__ import annotations

import numpy as np

MASK64 = (1 << 64) - 1


def _mix(x: np.ndarray) -> np.ndarray:
    with np.errstate(over="ignore"):
        x = (x ^ (x >> np.uint64(30))) * np.uint64(0xBF58476D1CE4E5B9)
        x &= np.uint64(MASK64)
        x = (x ^ (x >> np.uint64(27))) * np.uint64(0x94D049BB133111EB)
        x &= np.uint64(MASK64)
        return x ^ (x >> np.uint64(31))


class HyperLogLog:
    def __init__(self, p: int = 12):
        self.p = p
        self.m = 1 << p
        self.registers = np.zeros(self.m, dtype=np.uint8)
        if self.m >= 128:
            self.alpha = 0.7213 / (1 + 1.079 / self.m)
        elif self.m == 64:
            self.alpha = 0.709
        elif self.m == 32:
            self.alpha = 0.697
        else:
            self.alpha = 0.673

    def add_many(self, values: np.ndarray) -> "HyperLogLog":
        """values: uint64 hash inputs (pre-hashing mixed again here)."""
        if len(values) == 0:
            return self
        h = _mix(values.astype(np.uint64))
        idx = (h >> np.uint64(64 - self.p)).astype(np.int64)
        rest = (h << np.uint64(self.p)) | np.uint64((1 << self.p) - 1)
        # rank = leading zeros of `rest` + 1, capped at 64 - p + 1
        lz = np.zeros(len(rest), dtype=np.uint8)
        x = rest.copy()
        for shift in (32, 16, 8, 4, 2, 1):
            mask = x < (np.uint64(1) << np.uint64(64 - shift))
            lz[mask] += shift
            x[mask] = x[mask] << np.uint64(shift)
        rank = lz + 1
        np.maximum.at(self.registers, idx, rank)
        return self

    def merge(self, other: "HyperLogLog") -> "HyperLogLog":
        assert self.p == other.p
        np.maximum(self.registers, other.registers, out=self.registers)
        return self

    def estimate(self) -> float:
        m = self.m
        # S = sum(2^-reg) kept as an EXACT dyadic rational
        # (sum(2^(scale-reg)) / 2^scale, arbitrary-precision int): makes
        # the estimate bit-deterministic regardless of summation order,
        # so a SQL oracle recomputing the same integer gets the
        # identical double (events.sql_approx_distinct_users).  The
        # scale is the max representable rank 64 - p + 1 (= 53 at the
        # default p=12, matching the SQL oracle's constant), NOT a
        # hardcoded 53 — a register above the scale would make the
        # shift negative and raise (ADVICE r2: any p < 12 did).
        scale = 64 - self.p + 1
        s_int = sum(1 << (scale - int(r)) for r in self.registers)
        est = self.alpha * m * m * float(1 << scale) / s_int
        if est <= 2.5 * m:
            zeros = int(np.count_nonzero(self.registers == 0))
            if zeros:
                est = m * np.log(m / zeros)  # linear counting
        return float(est)

    def to_bytes(self) -> bytes:
        return self.registers.tobytes()

    @classmethod
    def from_bytes(cls, data: bytes, p: int = 12) -> "HyperLogLog":
        h = cls(p)
        regs = np.frombuffer(data, dtype=np.uint8).copy()
        if len(regs) != h.m:
            raise ValueError(
                f"register blob has {len(regs)} entries, expected {h.m} "
                f"for p={p}"
            )
        h.registers = regs
        return h
