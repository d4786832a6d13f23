"""MurmurHash3 x64_128 — pure-Python implementation of the public-domain
algorithm (Austin Appleby's MurmurHash3_x64_128 reference, smhasher), used
for bit-level parity with the reference's `mutate_hash` filter
(/root/reference/lib/filters/filter_mutate_hash.js:24-29: npm `murmur3`
``hash128().hex()``).

Hex output = the 16 digest bytes in canonical order (h1 little-endian then
h2 little-endian), the same byte order the C reference writes to `out`.
Note: 128-bit murmur3 has two published variants (x86_128 and x64_128);
this is the x64 variant, the conventional choice for server-side dedup
keys.  Pinned by vectors in tests/test_functions.py.
"""

from __future__ import annotations

_M = (1 << 64) - 1
_C1 = 0x87C37B91114253D5
_C2 = 0x4CF5AD432745937F


def _rotl(x: int, r: int) -> int:
    return ((x << r) | (x >> (64 - r))) & _M


def _fmix(k: int) -> int:
    k ^= k >> 33
    k = (k * 0xFF51AFD7ED558CCD) & _M
    k ^= k >> 33
    k = (k * 0xC4CEB9FE1A85EC53) & _M
    k ^= k >> 33
    return k


def murmur3_x64_128(data: bytes, seed: int = 0) -> tuple[int, int]:
    """-> (h1, h2) 64-bit halves."""
    h1 = h2 = seed & _M
    n = len(data)
    nblocks = n // 16

    for i in range(nblocks):
        o = i * 16
        k1 = int.from_bytes(data[o:o + 8], "little")
        k2 = int.from_bytes(data[o + 8:o + 16], "little")
        k1 = (k1 * _C1) & _M
        k1 = _rotl(k1, 31)
        k1 = (k1 * _C2) & _M
        h1 ^= k1
        h1 = _rotl(h1, 27)
        h1 = (h1 + h2) & _M
        h1 = (h1 * 5 + 0x52DCE729) & _M
        k2 = (k2 * _C2) & _M
        k2 = _rotl(k2, 33)
        k2 = (k2 * _C1) & _M
        h2 ^= k2
        h2 = _rotl(h2, 31)
        h2 = (h2 + h1) & _M
        h2 = (h2 * 5 + 0x38495AB5) & _M

    tail = data[nblocks * 16:]
    k1 = k2 = 0
    t = len(tail)
    if t > 8:
        k2 = int.from_bytes(tail[8:], "little")
        k2 = (k2 * _C2) & _M
        k2 = _rotl(k2, 33)
        k2 = (k2 * _C1) & _M
        h2 ^= k2
    if t > 0:
        k1 = int.from_bytes(tail[:min(t, 8)], "little")
        k1 = (k1 * _C1) & _M
        k1 = _rotl(k1, 31)
        k1 = (k1 * _C2) & _M
        h1 ^= k1

    h1 ^= n
    h2 ^= n
    h1 = (h1 + h2) & _M
    h2 = (h2 + h1) & _M
    h1 = _fmix(h1)
    h2 = _fmix(h2)
    h1 = (h1 + h2) & _M
    h2 = (h2 + h1) & _M
    return h1, h2


def murmur3_128_hex(s: str, seed: int = 0) -> str:
    """Canonical hex digest: h1 LE bytes then h2 LE bytes, 32 hex chars."""
    h1, h2 = murmur3_x64_128(s.encode("utf-8"), seed)
    return (h1.to_bytes(8, "little") + h2.to_bytes(8, "little")).hex()
