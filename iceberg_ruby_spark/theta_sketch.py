"""Apache DataSketches Theta sketch — COMPACT serialization, from the
public spec, so Puffin NDV blobs are ``apache-datasketches-theta-v1``
and external engines can deserialize AND union them.

Two public formats implemented from scratch:

- **MurmurHash3 x64 128** (Austin Appleby's public-domain reference;
  the hash DataSketches theta uses with its update seed, default 9001).
  A value's sketch hash is ``hash(bytes, seed)[0] >>> 1`` (63-bit);
  hash 0 is rejected, matching the Java library.
- **Theta CompactSketch binary layout** (datasketches memory spec;
  byte layout pinned against datasketches-java 6.2.0 on Spark's
  classpath, tests/test_theta_sketch.py):

  =========== ======================================================
  empty       8 bytes ``01 03 03 00 00 1E 00 00``
              (preLongs=1, serVer=3, family=3 COMPACT,
              flags=READONLY|EMPTY|COMPACT|ORDERED, seed hash 0)
  single      16 bytes: preamble with flags ``0x3A`` (…|SINGLEITEM),
              real seed hash, then the one hash long
  exact       preLongs=2: preamble, ``curCount`` int32 + ``p`` float
              (1.0), then the sorted hash longs — theta == 1.0
  estimating  preLongs=3: as exact plus ``thetaLong`` before the
              hashes
  =========== ======================================================

  All integers little-endian.  Iceberg's ``theta-v1`` blob updates the
  sketch with each value's **single-value binary serialization**
  (``manifests.bound_to_bytes``), per the Puffin spec.

The builder here is a *deterministic k-minimum-values* construction:
given the DISTINCT 63-bit hashes of a column, keep every hash when
there are at most k of them (exact mode, estimate == true NDV), else
keep the k smallest with ``thetaLong`` = the (k+1)-th smallest — a
valid theta sketch by definition (every retained hash < theta, each
sampled uniformly), the same estimator family the Java QuickSelect
sketch converges to, but insertion-order-independent so distributed
builds are reproducible.  ``tests/test_theta_sketch.py`` holds the
bytes to the Java library: exact-mode sketches are BYTE-IDENTICAL to
``UpdateSketch.update(byte[])…compact().toByteArray()``, estimation
sketches heapify in Java, re-serialize byte-identically, estimate
within bounds, and union with Java-built sketches.
"""

from __future__ import annotations

import struct
from typing import Iterable, Optional

from iceberg_ruby_spark.errors import InvalidDataError

DEFAULT_UPDATE_SEED = 9001
DEFAULT_NOMINAL_ENTRIES = 4096  # lgK=12, the library default
MAX_THETA = (1 << 63) - 1  # Long.MAX_VALUE == theta 1.0

_M64 = (1 << 64) - 1
_C1 = 0x87C37B91114253D5
_C2 = 0x4CF5AD432745937F

_FLAG_READONLY = 1 << 1
_FLAG_EMPTY = 1 << 2
_FLAG_COMPACT = 1 << 3
_FLAG_ORDERED = 1 << 4
_FLAG_SINGLEITEM = 1 << 5

_EMPTY_SKETCH = bytes(
    [1, 3, 3, 0, 0, _FLAG_READONLY | _FLAG_EMPTY | _FLAG_COMPACT | _FLAG_ORDERED, 0, 0]
)


def _rotl(x: int, r: int) -> int:
    return ((x << r) | (x >> (64 - r))) & _M64


def _fmix(k: int) -> int:
    k ^= k >> 33
    k = (k * 0xFF51AFD7ED558CCD) & _M64
    k ^= k >> 33
    k = (k * 0xC4CEB9FE1A85EC53) & _M64
    k ^= k >> 33
    return k


def murmur3_x64_128(data: bytes, seed: int) -> tuple[int, int]:
    """Reference MurmurHash3 x64 128 → (h1, h2) as unsigned 64-bit."""
    h1 = h2 = seed & _M64
    n = len(data)
    nblocks = n // 16
    for i in range(nblocks):
        k1 = int.from_bytes(data[16 * i : 16 * i + 8], "little")
        k2 = int.from_bytes(data[16 * i + 8 : 16 * i + 16], "little")
        k1 = (k1 * _C1) & _M64
        k1 = _rotl(k1, 31)
        k1 = (k1 * _C2) & _M64
        h1 ^= k1
        h1 = _rotl(h1, 27)
        h1 = (h1 + h2) & _M64
        h1 = (h1 * 5 + 0x52DCE729) & _M64
        k2 = (k2 * _C2) & _M64
        k2 = _rotl(k2, 33)
        k2 = (k2 * _C1) & _M64
        h2 ^= k2
        h2 = _rotl(h2, 31)
        h2 = (h2 + h1) & _M64
        h2 = (h2 * 5 + 0x38495AB5) & _M64
    tail = data[nblocks * 16 :]
    if len(tail) > 8:
        k2 = int.from_bytes(tail[8:], "little")
        k2 = (k2 * _C2) & _M64
        k2 = _rotl(k2, 33)
        k2 = (k2 * _C1) & _M64
        h2 ^= k2
    if tail:
        k1 = int.from_bytes(tail[:8], "little")
        k1 = (k1 * _C1) & _M64
        k1 = _rotl(k1, 31)
        k1 = (k1 * _C2) & _M64
        h1 ^= k1
    h1 ^= n
    h2 ^= n
    h1 = (h1 + h2) & _M64
    h2 = (h2 + h1) & _M64
    h1 = _fmix(h1)
    h2 = _fmix(h2)
    h1 = (h1 + h2) & _M64
    h2 = (h2 + h1) & _M64
    return h1, h2


def compute_seed_hash(seed: int) -> int:
    """DataSketches Util.computeSeedHash: low 16 bits of the murmur hash
    of the seed itself (as one little-endian long, hashed with seed 0)."""
    h = murmur3_x64_128(struct.pack("<q", seed), 0)[0] & 0xFFFF
    if h == 0:
        raise InvalidDataError("seed hashes to 0; choose a different seed")
    return h


def hash63(data: bytes, seed: int = DEFAULT_UPDATE_SEED) -> Optional[int]:
    """A value's theta-sketch hash: ``murmur(data, seed)[0] >>> 1``.
    Returns None for the (astronomically rare) hash 0, which the Java
    library also rejects."""
    h = murmur3_x64_128(data, seed)[0] >> 1
    return h or None


def serialize_compact(
    hashes: Iterable[int],
    theta_long: int = MAX_THETA,
    seed: int = DEFAULT_UPDATE_SEED,
) -> bytes:
    """Ordered CompactSketch bytes for distinct 63-bit ``hashes`` (all
    must be < ``theta_long``)."""
    hs = sorted(set(hashes))
    if hs and (hs[0] <= 0 or hs[-1] >= theta_long):
        raise InvalidDataError("theta sketch hashes must be in (0, theta)")
    if not hs and theta_long == MAX_THETA:
        return _EMPTY_SKETCH
    sh = compute_seed_hash(seed)
    base = _FLAG_READONLY | _FLAG_COMPACT | _FLAG_ORDERED
    if len(hs) == 1 and theta_long == MAX_THETA:
        pre = bytes([1, 3, 3, 0, 0, base | _FLAG_SINGLEITEM]) + struct.pack("<H", sh)
        return pre + struct.pack("<q", hs[0])
    if theta_long == MAX_THETA:
        pre = bytes([2, 3, 3, 0, 0, base]) + struct.pack("<H", sh)
        pre += struct.pack("<if", len(hs), 1.0)
    else:
        pre = bytes([3, 3, 3, 0, 0, base]) + struct.pack("<H", sh)
        pre += struct.pack("<if", len(hs), 1.0)
        pre += struct.pack("<q", theta_long)
    return pre + struct.pack(f"<{len(hs)}q", *hs)


def deserialize_compact(data: bytes) -> tuple[list[int], int, bool]:
    """Compact sketch bytes → (hashes, theta_long, empty)."""
    if len(data) < 8:
        raise InvalidDataError("theta sketch too short")
    pre_longs, ser_ver, family = data[0], data[1], data[2]
    if ser_ver != 3 or family != 3:
        raise InvalidDataError(
            f"not a compact theta sketch (serVer={ser_ver}, family={family})"
        )
    flags = data[5]
    if flags & _FLAG_EMPTY:
        return [], MAX_THETA, True
    if flags & _FLAG_SINGLEITEM:
        return [struct.unpack_from("<q", data, 8)[0]], MAX_THETA, False
    (count,) = struct.unpack_from("<i", data, 8)
    if pre_longs == 2:
        theta, off = MAX_THETA, 16
    elif pre_longs == 3:
        (theta,) = struct.unpack_from("<q", data, 16)
        off = 24
    else:
        raise InvalidDataError(f"unsupported compact preamble longs: {pre_longs}")
    return list(struct.unpack_from(f"<{count}q", data, off)), theta, False


def estimate(data: bytes) -> float:
    """The sketch's distinct-count estimate (count / theta)."""
    hashes, theta, _empty = deserialize_compact(data)
    return len(hashes) * (MAX_THETA / theta)


def sketch_from_hashes(
    distinct_hashes: list[int], k: int = DEFAULT_NOMINAL_ENTRIES
) -> bytes:
    """Deterministic k-minimum-values compact sketch: ``distinct_hashes``
    must be the SMALLEST ``k+1`` (or fewer = all) distinct 63-bit hashes
    of the column.  ≤ k hashes → exact mode (estimate == true NDV);
    k+1 or more → keep the k smallest with theta = the (k+1)-th."""
    hs = sorted(set(distinct_hashes))
    if len(hs) <= k:
        return serialize_compact(hs)
    return serialize_compact(hs[:k], theta_long=hs[k])


def sketch_from_values(
    values: Iterable[Optional[bytes]], k: int = DEFAULT_NOMINAL_ENTRIES
) -> bytes:
    """Convenience (tests / small inputs): sketch of raw single-value
    serializations.  The distributed path hashes executor-side and feeds
    :func:`sketch_from_hashes` the k+1 smallest distinct hashes."""
    hashes = set()
    for v in values:
        if v is None:
            continue
        h = hash63(v)
        if h is not None:
            hashes.add(h)
    return sketch_from_hashes(sorted(hashes)[: k + 1], k)


# ---------------------------------------------------------------------------
# vectorized fixed-width hashing (numpy) — the hot path for numeric columns
# ---------------------------------------------------------------------------


def hash63_fixed_batch(values, width: int, seed: int = DEFAULT_UPDATE_SEED):
    """Vectorized :func:`hash63` for FIXED-``width`` single-value
    serializations (4 or 8 bytes): ``values`` is a numpy uint64 array
    holding each serialization's little-endian bytes zero-extended to 64
    bits.  For inputs ≤ 8 bytes MurmurHash3 x64 128 reduces to the tail
    block + finalization — a dozen uint64 ops, all numpy-vectorizable.
    Returns an int64 array of 63-bit hashes (0 → the caller must drop,
    matching the scalar path's rejection)."""
    import numpy as np

    if width not in (4, 8):
        raise InvalidDataError(f"unsupported fixed width: {width}")
    with np.errstate(over="ignore"):
        v = values.astype(np.uint64)
        k1 = v * np.uint64(_C1)
        k1 = (k1 << np.uint64(31)) | (k1 >> np.uint64(33))
        k1 = k1 * np.uint64(_C2)
        h1 = np.uint64(seed) ^ k1
        h2 = np.uint64(seed)
        h1 = h1 ^ np.uint64(width)
        h2 = h2 ^ np.uint64(width)
        h1 = h1 + h2
        h2 = h2 + h1

        def fmix(k):
            k = k ^ (k >> np.uint64(33))
            k = k * np.uint64(0xFF51AFD7ED558CCD)
            k = k ^ (k >> np.uint64(33))
            k = k * np.uint64(0xC4CEB9FE1A85EC53)
            return k ^ (k >> np.uint64(33))

        h1 = fmix(h1)
        h2 = fmix(h2)
        h1 = h1 + h2
        return (h1 >> np.uint64(1)).astype(np.int64)
