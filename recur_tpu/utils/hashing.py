"""String hashing used for net-file signatures.

rnn_hash32 (recur-common.h:207-216) hashes the metadata string into the 32-bit
signature embedded in auto-constructed net filenames
(``basename-s<hash>-i<in>-h<hid>-o<out>.net``, charmodel-init.c:647-664).
Bit-exact so our filenames match the reference's for the same metadata.
"""

from __future__ import annotations

MASK32 = 0xFFFFFFFF


def _rot32(x: int, k: int) -> int:
    x &= MASK32
    return ((x << k) | (x >> (32 - k))) & MASK32


def rnn_hash32(s: str | bytes) -> int:
    if isinstance(s, str):
        s = s.encode("utf-8")
    sig = 0
    for t in s:
        sig ^= (_rot32(sig - t, 13) + t) & MASK32
        sig &= MASK32
    return sig
