"""MurmurHash3 128-bit — pure-Python implementations of BOTH published
variants of the public-domain algorithm (Austin Appleby's
MurmurHash3_x64_128 / MurmurHash3_x86_128, smhasher), for the reference's
`mutate_hash` filter (/root/reference/lib/filters/filter_mutate_hash.js:26:
npm `murmur3` ``hash128().hex()``).

Which variant the reference actually produces is UNVERIFIABLE: `murmur3`
is not in the reference's package.json and is not vendored, so
``require('murmur3')`` does not resolve in the reference tree itself — the
filter is dead code as shipped.  Pure-JS 128-bit murmur3 ports commonly
implement x86_128 (no 64-bit ints in JS), so we expose both:
``murmur3_128_hex`` (x64, the conventional server-side dedup choice — the
operator default) and ``murmur3_x86_128_hex``.  We make no bit-parity
claim against the npm module; each variant is pinned against the
smhasher VerificationTest constants (x64_128 -> 0x6384BA69, x86_128 ->
0xB3ECE62A) plus spot vectors in tests.

Hex output = the 16 digest bytes in canonical order (each hash word
little-endian, words in order), the same byte order the C reference writes
to `out`.
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


# ---------------------------------------------------------------------------
# MurmurHash3_x86_128 — the variant pure-JS ports usually implement
# ---------------------------------------------------------------------------

_M32 = (1 << 32) - 1
_XC1, _XC2, _XC3, _XC4 = 0x239B961B, 0xAB0E9789, 0x38B34AE5, 0xA1E38B93


def _rotl32(x: int, r: int) -> int:
    return ((x << r) | (x >> (32 - r))) & _M32


def _fmix32(h: int) -> int:
    h ^= h >> 16
    h = (h * 0x85EBCA6B) & _M32
    h ^= h >> 13
    h = (h * 0xC2B2AE35) & _M32
    h ^= h >> 16
    return h


def murmur3_x86_128(data: bytes, seed: int = 0) -> tuple[int, int, int, int]:
    """-> (h1, h2, h3, h4) 32-bit words (canonical block/tail/final mix)."""
    h1 = h2 = h3 = h4 = seed & _M32
    n = len(data)
    nblocks = n // 16

    for i in range(nblocks):
        o = i * 16
        k1 = int.from_bytes(data[o:o + 4], "little")
        k2 = int.from_bytes(data[o + 4:o + 8], "little")
        k3 = int.from_bytes(data[o + 8:o + 12], "little")
        k4 = int.from_bytes(data[o + 12:o + 16], "little")
        k1 = (k1 * _XC1) & _M32; k1 = _rotl32(k1, 15); k1 = (k1 * _XC2) & _M32
        h1 ^= k1
        h1 = _rotl32(h1, 19); h1 = (h1 + h2) & _M32
        h1 = (h1 * 5 + 0x561CCD1B) & _M32
        k2 = (k2 * _XC2) & _M32; k2 = _rotl32(k2, 16); k2 = (k2 * _XC3) & _M32
        h2 ^= k2
        h2 = _rotl32(h2, 17); h2 = (h2 + h3) & _M32
        h2 = (h2 * 5 + 0x0BCAA747) & _M32
        k3 = (k3 * _XC3) & _M32; k3 = _rotl32(k3, 17); k3 = (k3 * _XC4) & _M32
        h3 ^= k3
        h3 = _rotl32(h3, 15); h3 = (h3 + h4) & _M32
        h3 = (h3 * 5 + 0x96CD1C35) & _M32
        k4 = (k4 * _XC4) & _M32; k4 = _rotl32(k4, 18); k4 = (k4 * _XC1) & _M32
        h4 ^= k4
        h4 = _rotl32(h4, 13); h4 = (h4 + h1) & _M32
        h4 = (h4 * 5 + 0x32AC3B17) & _M32

    tail = data[nblocks * 16:]
    t = len(tail)
    k1 = int.from_bytes(tail[0:min(t, 4)], "little") if t > 0 else 0
    k2 = int.from_bytes(tail[4:min(t, 8)], "little") if t > 4 else 0
    k3 = int.from_bytes(tail[8:min(t, 12)], "little") if t > 8 else 0
    k4 = int.from_bytes(tail[12:min(t, 16)], "little") if t > 12 else 0
    if t > 12:
        k4 = (k4 * _XC4) & _M32; k4 = _rotl32(k4, 18); k4 = (k4 * _XC1) & _M32
        h4 ^= k4
    if t > 8:
        k3 = (k3 * _XC3) & _M32; k3 = _rotl32(k3, 17); k3 = (k3 * _XC4) & _M32
        h3 ^= k3
    if t > 4:
        k2 = (k2 * _XC2) & _M32; k2 = _rotl32(k2, 16); k2 = (k2 * _XC3) & _M32
        h2 ^= k2
    if t > 0:
        k1 = (k1 * _XC1) & _M32; k1 = _rotl32(k1, 15); k1 = (k1 * _XC2) & _M32
        h1 ^= k1

    h1 ^= n; h2 ^= n; h3 ^= n; h4 ^= n
    h1 = (h1 + h2) & _M32; h1 = (h1 + h3) & _M32; h1 = (h1 + h4) & _M32
    h2 = (h2 + h1) & _M32; h3 = (h3 + h1) & _M32; h4 = (h4 + h1) & _M32
    h1, h2, h3, h4 = _fmix32(h1), _fmix32(h2), _fmix32(h3), _fmix32(h4)
    h1 = (h1 + h2) & _M32; h1 = (h1 + h3) & _M32; h1 = (h1 + h4) & _M32
    h2 = (h2 + h1) & _M32; h3 = (h3 + h1) & _M32; h4 = (h4 + h1) & _M32
    return h1, h2, h3, h4


def murmur3_x86_128_hex(s: str, seed: int = 0) -> str:
    """Canonical hex digest: h1..h4 each LE, 32 hex chars."""
    words = murmur3_x86_128(s.encode("utf-8"), seed)
    return b"".join(w.to_bytes(4, "little") for w in words).hex()


def _digest_bytes(variant: str, data: bytes, seed: int) -> bytes:
    if variant == "x64":
        h1, h2 = murmur3_x64_128(data, seed)
        return h1.to_bytes(8, "little") + h2.to_bytes(8, "little")
    words = murmur3_x86_128(data, seed)
    return b"".join(w.to_bytes(4, "little") for w in words)


def smhasher_verification(variant: str) -> int:
    """smhasher KeysetTest VerificationTest: hash keys [0..len) of length
    0..255 with seed 256-len, hash the concatenated digests with seed 0,
    return the first 4 digest bytes as a little-endian u32.  Published
    expected values: x64_128 -> 0x6384BA69, x86_128 -> 0xB3ECE62A."""
    key = bytes(range(256))
    buf = b"".join(_digest_bytes(variant, key[:ln], 256 - ln)
                   for ln in range(256))
    return int.from_bytes(_digest_bytes(variant, buf, 0)[:4], "little")
