"""Pure-Python readers for Spark's mergeable sketch binaries.

Spark's ``count_min_sketch`` SQL aggregate produces the serialized form
of ``org.apache.spark.util.sketch.CountMinSketch`` (V1). Probing that
binary through ``spark._jvm`` works only on a classic driver (the
gateway is absent under Spark Connect) and forces query-construction to
be eager. This module re-implements the V1 wire format and the string
hashing (Spark's ``Murmur3_x86_32.hashUnsafeBytes`` double-hash scheme)
in pure Python so the probe can run lazily inside ``mapInPandas`` on an
executor — no JVM gateway, one KB-sized binary per task.

Wire format (big-endian, java.io.DataOutputStream;
``CountMinSketchImpl.writeTo``):

    int32  version            (1)
    int64  totalCount
    int32  depth
    int32  width
    int64  hashA[depth]       (used for numeric items only)
    int64  table[depth][width]

String items ignore ``hashA``: bucket i is Java's
``Math.abs((h1 + i*h2) % width)`` with ``h1 = murmur3_32(utf8, 0)``,
``h2 = murmur3_32(utf8, h1)``, and the sum wrapped to a signed 32-bit
int. Java's ``%`` is the TRUNCATED remainder (sign follows the
dividend), so the Python equivalent is ``abs(wrap32(h1+i*h2)) %
width`` — abs BEFORE Python's floor-mod, not after. Established
empirically against the JVM reader (a single-item sketch exposes its
row buckets as the only nonzero table entries;
tests/test_functions_unit.py keeps the cross-check).
"""

from __future__ import annotations

import struct
from dataclasses import dataclass

_MASK32 = 0xFFFFFFFF


def _rotl32(x: int, r: int) -> int:
    return ((x << r) | (x >> (32 - r))) & _MASK32


def _mix_k1(k1: int) -> int:
    k1 = (k1 * 0xCC9E2D51) & _MASK32
    k1 = _rotl32(k1, 15)
    return (k1 * 0x1B873593) & _MASK32


def _mix_h1(h1: int, k1: int) -> int:
    h1 ^= k1
    h1 = _rotl32(h1, 13)
    return (h1 * 5 + 0xE6546B64) & _MASK32


def _fmix(h1: int, length: int) -> int:
    h1 ^= length
    h1 ^= h1 >> 16
    h1 = (h1 * 0x85EBCA6B) & _MASK32
    h1 ^= h1 >> 13
    h1 = (h1 * 0xC2B2AE35) & _MASK32
    h1 ^= h1 >> 16
    return h1


def _signed32(x: int) -> int:
    x &= _MASK32
    return x - (1 << 32) if x >= (1 << 31) else x


def murmur3_32_spark(data: bytes, seed: int = 0) -> int:
    """Spark's ``Murmur3_x86_32.hashUnsafeBytes`` (NOT standard
    murmur3): the aligned prefix is consumed as little-endian int32
    words, then each remaining TAIL BYTE gets its own full mix round
    with the byte SIGN-EXTENDED (Java ``(int) byte``) — standard
    murmur3 instead accumulates the tail into one partial word.
    Returns a Java int (signed 32-bit)."""
    h1 = seed & _MASK32
    n_aligned = len(data) - len(data) % 4
    for i in range(0, n_aligned, 4):
        (word,) = struct.unpack_from("<i", data, i)
        h1 = _mix_h1(h1, _mix_k1(word & _MASK32))
    for i in range(n_aligned, len(data)):
        b = data[i]
        if b >= 128:  # sign-extend the Java byte
            b -= 256
        h1 = _mix_h1(h1, _mix_k1(b & _MASK32))
    return _signed32(_fmix(h1, len(data)))


@dataclass(frozen=True)
class CountMinSketch:
    total_count: int
    depth: int
    width: int
    table: tuple  # depth tuples of width ints

    def estimate_string(self, item: str) -> int:
        """Min over rows of table[i][abs(wrap32(h1 + i*h2)) % width] —
        the string-item probe matching Spark's JVM reader
        bucket-for-bucket (see module docstring)."""
        b = item.encode("utf-8")
        h1 = murmur3_32_spark(b, 0)
        h2 = murmur3_32_spark(b, h1)
        est = None
        for i in range(self.depth):
            # Java trunc-rem + Math.abs == Python abs() before %
            bucket = abs(_signed32(h1 + i * h2)) % self.width
            v = self.table[i][bucket]
            est = v if est is None else min(est, v)
        return int(est)


def merge_count_min_sketches(sketches) -> CountMinSketch:
    """Merge partial sketches by summing their tables — exact, the
    property that makes CMS a distributive aggregate (the JVM's
    ``mergeInPlace``). REQUIRES the partials were built with the same
    eps/confidence/seed (same depth x width table and, for numeric
    items, the same hashA); string-item probing depends only on
    (depth, width), which is what we can and do check."""
    sketches = list(sketches)
    if not sketches:
        raise ValueError("nothing to merge")
    d, w = sketches[0].depth, sketches[0].width
    for s in sketches[1:]:
        if (s.depth, s.width) != (d, w):
            raise ValueError(
                f"incompatible sketches: {d}x{w} vs {s.depth}x{s.width}"
            )
    table = tuple(
        tuple(sum(s.table[i][j] for s in sketches) for j in range(w))
        for i in range(d)
    )
    return CountMinSketch(
        sum(s.total_count for s in sketches), d, w, table
    )


def read_count_min_sketch(binary: bytes) -> CountMinSketch:
    """Parse the V1 serialized form produced by Spark's
    ``count_min_sketch`` aggregate / ``CountMinSketch.writeTo``."""
    (version,) = struct.unpack_from(">i", binary, 0)
    if version != 1:
        raise ValueError(f"unsupported CountMinSketch version {version}")
    total, depth, width = struct.unpack_from(">qii", binary, 4)
    # header sanity BEFORE sizing allocations from it: a truncated or
    # corrupt binary must raise here, not unpack garbage rows or build
    # a zero-row sketch whose estimate_string would min() over nothing
    # (r13 review pass)
    if depth <= 0 or width <= 0:
        raise ValueError(
            f"corrupt CountMinSketch header: depth={depth} width={width}"
        )
    need = 4 + 8 + 4 + 4 + 8 * depth + 8 * depth * width
    if len(binary) < need:
        raise ValueError(
            f"truncated CountMinSketch: {len(binary)} bytes, header "
            f"({depth}x{width}) needs {need}"
        )
    off = 4 + 8 + 4 + 4
    off += 8 * depth  # skip hashA (numeric-item hashing only)
    table = []
    for _ in range(depth):
        table.append(struct.unpack_from(f">{width}q", binary, off))
        off += 8 * width
    return CountMinSketch(total, depth, width, tuple(table))
