"""Partitioned bloom filters for the URL-seen structure.

Design (north rule): the URL-seen set is sharded by host bucket; each
bucket owns a bloom payload (numpy bit array serialized to bytes)
persisted as table state. The bloom is strictly a *prefilter* that cuts
shuffle volume into the exact anti-join — the anti-join against the
exact (host_bucket, url_hash, url) table remains the authority, which
is what keeps the seen set exact (SURVEY.md §2.8).

Spark's own runtime bloom filters are join-internal and not
persistable across rounds, hence this explicit structure.

Hashing: blake2b(url) → two independent 64-bit lanes; k probe indices
are h1 + i*h2 mod m (standard double hashing). Deterministic across
processes (no PYTHONHASHSEED dependence) so payloads built on one
executor probe identically on another.
"""

from __future__ import annotations

import hashlib
import math

import numpy as np

DEFAULT_BITS_PER_KEY = 10  # ~1% fp at k=7
DEFAULT_K = 7


def _lanes(url: str) -> tuple[int, int]:
    d = hashlib.blake2b(url.encode("utf-8"), digest_size=16,
                        person=b"urlbloom").digest()
    return (int.from_bytes(d[:8], "big"), int.from_bytes(d[8:], "big") | 1)


def bloom_sizing(n_items: int, bits_per_key: int = DEFAULT_BITS_PER_KEY) -> int:
    """Bit-array size (multiple of 8, min 1024)."""
    m = max(1024, n_items * bits_per_key)
    return ((m + 7) // 8) * 8


def bloom_build(urls, m_bits: int, k: int = DEFAULT_K) -> bytes:
    bits = np.zeros(m_bits // 8, dtype=np.uint8)
    for u in urls:
        h1, h2 = _lanes(u)
        for i in range(k):
            idx = (h1 + i * h2) % m_bits
            bits[idx >> 3] |= 1 << (idx & 7)
    return bits.tobytes()


def bloom_add(payload: bytes | None, urls, m_bits: int,
              k: int = DEFAULT_K) -> bytes:
    """OR new keys into an existing payload (payload=None → fresh)."""
    if payload is None or len(payload) == 0:
        return bloom_build(urls, m_bits, k)
    bits = np.frombuffer(payload, dtype=np.uint8).copy()
    m = len(bits) * 8
    for u in urls:
        h1, h2 = _lanes(u)
        for i in range(k):
            idx = (h1 + i * h2) % m
            bits[idx >> 3] |= 1 << (idx & 7)
    return bits.tobytes()


def bloom_or(a: bytes, b: bytes) -> bytes:
    """Merge two same-sized payloads (partition-filter union)."""
    av = np.frombuffer(a, dtype=np.uint8)
    bv = np.frombuffer(b, dtype=np.uint8)
    if len(av) != len(bv):
        raise ValueError("bloom size mismatch: %d != %d" % (len(av), len(bv)))
    return np.bitwise_or(av, bv).tobytes()


def bloom_might_contain(payload: bytes, urls, k: int = DEFAULT_K) -> np.ndarray:
    """Vectorized membership test → bool array aligned with ``urls``.
    False = definitely unseen (safe to keep as fresh candidate)."""
    bits = np.frombuffer(payload, dtype=np.uint8)
    m = len(bits) * 8
    out = np.empty(len(urls), dtype=bool)
    for j, u in enumerate(urls):
        h1, h2 = _lanes(u)
        hit = True
        for i in range(k):
            idx = (h1 + i * h2) % m
            if not (bits[idx >> 3] >> (idx & 7)) & 1:
                hit = False
                break
        out[j] = hit
    return out


def expected_fp_rate(n_items: int, m_bits: int, k: int = DEFAULT_K) -> float:
    if m_bits == 0:
        return 1.0
    return (1.0 - math.exp(-k * n_items / m_bits)) ** k
