"""Bit-exact reimplementation of the reference's PRNG family.

The reference (recur-rng.h) uses Bob Jenkins' public-domain 64-bit "small fast"
PRNG (JSF64) for weight init, sampling, noise and conditioning, and *saves the
RNG state in net files* (recur-nn-io.c:88) so training runs are reproducible
across checkpoint/resume.  We reproduce it exactly on the host so that:

  * saved .net files round-trip bit-identically (rng.a/b/c/d keys),
  * host-side weight initialisation matches the reference's distributions,
  * a seeded run is deterministic.

Device-side randomness (presynaptic noise inside jitted steps, confab
sampling) uses JAX's counter-based PRNG instead — sequential JSF64 is a serial
dependency chain that has no efficient TPU mapping; the *distributions* are
kept identical (see ops/noise.py).

Reference anchors: recur-rng.h:22-31 (rand64), :34-43 (init), :69-78
(rand_double), :96-100 (rand_small_int), :179-200 (cheap_gaussian_noise),
:204-245 (randomise_mem / float arrays).
"""

from __future__ import annotations

import struct
import time

import numpy as np

MASK64 = (1 << 64) - 1

RECUR_RNG_RANDOM_SEED = MASK64  # -1ULL
RECUR_RNG_SUBSEED = MASK64 - 1  # -2ULL

_DSFMT_LOW_MASK = 0x000FFFFFFFFFFFFF
_DSFMT_HIGH_CONST = 0x3FF0000000000000


def _rot(x: int, k: int) -> int:
    return ((x << k) | (x >> (64 - k))) & MASK64


class RecurRng:
    """JSF64 PRNG with the reference's exact seeding and derived samplers."""

    __slots__ = ("a", "b", "c", "d")

    def __init__(self, seed: int = 1, *, _raw: tuple[int, int, int, int] | None = None):
        if _raw is not None:
            self.a, self.b, self.c, self.d = (x & MASK64 for x in _raw)
            return
        seed &= MASK64
        if seed == RECUR_RNG_RANDOM_SEED:
            # time-based seeding (reference mixes in a pointer; we use ns time)
            seed = time.time_ns() & MASK64
        self.a = 0xF1EA5EED
        self.b = self.c = self.d = seed
        for _ in range(20):
            self.rand64()

    # -- state (de)serialisation: the 32-byte struct saved under "net.rng" --
    @classmethod
    def from_state(cls, state: tuple[int, int, int, int]) -> "RecurRng":
        return cls(_raw=state)

    @property
    def state(self) -> tuple[int, int, int, int]:
        return (self.a, self.b, self.c, self.d)

    def to_bytes(self) -> bytes:
        return struct.pack("<4Q", self.a, self.b, self.c, self.d)

    @classmethod
    def from_bytes(cls, raw: bytes) -> "RecurRng":
        return cls(_raw=struct.unpack("<4Q", raw))

    # -- core generator --
    def rand64(self) -> int:
        e = (self.a - _rot(self.b, 7)) & MASK64
        self.a = self.b ^ _rot(self.c, 13)
        self.b = (self.c + _rot(self.d, 37)) & MASK64
        self.c = (self.d + e) & MASK64
        self.d = (e + self.a) & MASK64
        return self.d

    # -- derived samplers (bit-exact semantics) --
    def rand_double(self) -> float:
        """[0, 1) via the DSFMT mantissa-fill trick."""
        bits = (self.rand64() & _DSFMT_LOW_MASK) | _DSFMT_HIGH_CONST
        return struct.unpack("<d", struct.pack("<Q", bits))[0] - 1.0

    def rand_float(self) -> float:
        return float(np.float32(self.rand64()) * np.float32(1.0 / 0xFFFFFFFFFFFFFFFE))

    def rand_small_int(self, cap: int) -> int:
        return int(self.rand_double() * cap)

    def rand_small_int_range(self, start: int, cap: int) -> int:
        return start + self.rand_small_int(cap - start)

    def rand_expovariate(self, lam: float) -> float:
        d = self.rand_double()
        return -np.log(1.0 - d) / lam

    def cheap_gaussian_noise(self) -> float:
        """Irwin-Hall sum of 12 u16 lanes: ~N(0,1), hard-limited to ±6σ."""
        acc = 0
        for _ in range(3):
            i = self.rand64()
            for _ in range(4):
                acc += i & 0xFFFF
                i >>= 16
        return float(np.float32(acc - 0xFFFF * 6) / np.float32(0xFFFF))

    def gaussian_array(self, n: int) -> np.ndarray:
        """n cheap_gaussian_noise draws as float32 (sequential, host-side)."""
        out = np.empty(n, dtype=np.float32)
        for i in range(n):
            out[i] = self.cheap_gaussian_noise()
        return out

    def subseed(self) -> int:
        """Derive a child seed the way rnn_clone does (recur-nn-init.c:300-305)."""
        while True:
            s = self.rand64()
            if s != RECUR_RNG_RANDOM_SEED:
                return s
