"""Partitioned cuckoo filter — the deletion-capable layer of the
URL-seen structure (north star: "partitioned bloom+cuckoo URL-seen").

Where the bloom layer is insert-only (right for the monotone seen
set), the cuckoo filter supports delete, which fits state whose
membership shrinks — e.g. the in-frontier set as URLs get scheduled.
Both expose the same probe interface, so the frontier engine's
prefilter layer is swappable per policy (``filter_kind``), and both
remain strictly prefilters: the exact anti-join stays the authority.

Correctness invariant: the prefilter may report false POSITIVES
(cost: an extra exact-join probe) but never false negatives (a seen
URL reported unseen would re-enter the frontier). Cuckoo tables can
overflow on insert; instead of re-hashing into a bigger table (which
cannot be done from fingerprints alone without risking false
negatives), an overflowing payload flips a saturation flag and answers
"maybe" for every probe until the periodic rebuild from the exact
backing table resizes it.

Layout: 16-byte header (magic, saturated flag, n_buckets) +
``n_buckets × 4`` uint16 fingerprint slots; a key's nonzero 16-bit
fingerprint lives in one of two candidate buckets (partial-key cuckoo
hashing, Fan et al., CoNEXT'14 — public algorithm).
"""

from __future__ import annotations

import hashlib
import struct

import numpy as np

SLOTS = 4
MAX_KICKS = 500
EMPTY = 0  # fingerprints are forced nonzero
_MAGIC = 0xC0C0
_HEADER = struct.Struct(">HHIQ")  # magic, saturated, n_buckets, reserved


def _fingerprint_and_index(url: str, n_buckets: int) -> tuple[int, int]:
    d = hashlib.blake2b(url.encode("utf-8"), digest_size=16,
                        person=b"urlcucko").digest()
    fp = (int.from_bytes(d[:2], "big") | 1)  # nonzero 16-bit
    i1 = int.from_bytes(d[2:10], "big") % n_buckets
    return fp, i1


def _fp_index_batch(urls, n_buckets: int) -> tuple[np.ndarray, np.ndarray]:
    """Batch fingerprints + primary indices (same blake2b lanes as the
    scalar path — add and probe must agree or probes false-negate)."""
    n = len(urls)
    fps = np.empty(n, dtype=np.uint16)
    i1 = np.empty(n, dtype=np.int64)
    blake2b = hashlib.blake2b
    from_bytes = int.from_bytes
    for j, u in enumerate(urls):
        d = blake2b(u.encode("utf-8"), digest_size=16,
                    person=b"urlcucko").digest()
        fps[j] = from_bytes(d[:2], "big") | 1
        i1[j] = from_bytes(d[2:10], "big") % n_buckets
    return fps, i1


# fp → full alt-hash, all 2^16 fingerprints, built once per process on
# first use (≈0.1 s) so batch probes are a pure numpy gather
_ALT_TABLE: np.ndarray | None = None


def _alt_table() -> np.ndarray:
    global _ALT_TABLE
    if _ALT_TABLE is None:
        blake2b = hashlib.blake2b
        from_bytes = int.from_bytes
        _ALT_TABLE = np.array(
            [from_bytes(blake2b(fp.to_bytes(2, "big"), digest_size=8,
                                person=b"cuckooalt").digest(), "big")
             for fp in range(1 << 16)], dtype=np.uint64)
    return _ALT_TABLE


def _alt_index(i: int, fp: int, n_buckets: int) -> int:
    """Partial-key displacement: i XOR hash(fp). n_buckets is always a
    power of two so the masked XOR is an involution — alt(alt(i)) == i,
    which `contains` relies on to find displaced fingerprints."""
    return i ^ (int(_alt_table()[fp]) & (n_buckets - 1))


class CuckooFilter:
    def __init__(self, n_items: int = 1024, payload: bytes | None = None,
                 seed: int = 42) -> None:
        if payload is not None and len(payload) >= _HEADER.size:
            magic, sat, n_buckets, _ = _HEADER.unpack_from(payload, 0)
            if magic != _MAGIC:
                raise ValueError("not a cuckoo payload")
            self.saturated = bool(sat)
            self.n_buckets = n_buckets
            table = np.frombuffer(payload, dtype=np.uint16,
                                  offset=_HEADER.size).copy()
            self.table = table.reshape(n_buckets, SLOTS)
        else:
            # ~84% practical load at 4 slots; power-of-two bucket count
            # (required by the XOR displacement involution)
            want = max(16, int(n_items / (SLOTS * 0.84)) + 1)
            self.n_buckets = 1 << (want - 1).bit_length()
            self.table = np.zeros((self.n_buckets, SLOTS), dtype=np.uint16)
            self.saturated = False
        self._rng = np.random.RandomState(seed)

    # ------------------------------------------------------------------
    def to_bytes(self) -> bytes:
        return _HEADER.pack(_MAGIC, int(self.saturated),
                            self.n_buckets, 0) + self.table.tobytes()

    def _try_put(self, i: int, fp: int) -> bool:
        row = self.table[i]
        empty = np.nonzero(row == EMPTY)[0]
        if len(empty):
            row[empty[0]] = fp
            return True
        return False

    def add(self, url: str) -> bool:
        """Insert. On overflow the filter SATURATES (returns False and
        every later probe answers True) — never a false negative."""
        if self.saturated:
            return True
        fp, i1 = _fingerprint_and_index(url, self.n_buckets)
        i2 = _alt_index(i1, fp, self.n_buckets)
        if self._try_put(i1, fp) or self._try_put(i2, fp):
            return True
        i = i1 if (self._rng.randint(2) == 0) else i2
        for _ in range(MAX_KICKS):
            slot = self._rng.randint(SLOTS)
            fp, self.table[i][slot] = int(self.table[i][slot]), fp
            i = _alt_index(i, fp, self.n_buckets)
            if self._try_put(i, fp):
                return True
        # the displaced fingerprint has no home: one victim key may now
        # be unfindable → flag the whole payload conservative
        self.saturated = True
        return False

    def contains(self, url: str) -> bool:
        if self.saturated:
            return True
        fp, i1 = _fingerprint_and_index(url, self.n_buckets)
        if (self.table[i1] == fp).any():
            return True
        i2 = _alt_index(i1, fp, self.n_buckets)
        return bool((self.table[i2] == fp).any())

    def delete(self, url: str) -> bool:
        if self.saturated:
            return False  # cannot safely delete from a saturated filter
        fp, i1 = _fingerprint_and_index(url, self.n_buckets)
        for i in (i1, _alt_index(i1, fp, self.n_buckets)):
            row = self.table[i]
            hit = np.nonzero(row == fp)[0]
            if len(hit):
                row[hit[0]] = EMPTY
                return True
        return False

    def contains_vec(self, urls) -> np.ndarray:
        """Batch membership — both candidate buckets gathered and
        compared in numpy (the scalar ``contains`` stays the oracle
        twin for the property test)."""
        urls = list(urls)
        if self.saturated:
            return np.ones(len(urls), dtype=bool)
        if not urls:
            return np.empty(0, dtype=bool)
        fps, i1 = _fp_index_batch(urls, self.n_buckets)
        mask = np.uint64(self.n_buckets - 1)
        i2 = i1 ^ (_alt_table()[fps] & mask).astype(np.int64)
        fcol = fps[:, None]
        return ((self.table[i1] == fcol).any(axis=1)
                | (self.table[i2] == fcol).any(axis=1))

    @property
    def load(self) -> float:
        return float((self.table != EMPTY).mean())


def cuckoo_build(urls, n_items: int | None = None) -> bytes:
    """Build a payload sized for the key set (regrow-before-publish is
    safe here because the full key set is in hand)."""
    urls = list(urls)
    n = n_items or max(len(urls), 16)
    while True:
        f = CuckooFilter(n_items=n)
        if all(f.add(u) for u in urls):
            return f.to_bytes()
        n *= 2


def cuckoo_add(payload: bytes | None, urls,
               n_items_hint: int = 1024) -> bytes:
    """Insert new keys into an existing payload; saturates (never
    false-negatives) on overflow — the periodic exact-table rebuild
    resizes it."""
    urls = list(urls)
    if payload is None or len(payload) == 0:
        return cuckoo_build(urls, max(n_items_hint, len(urls)))
    f = CuckooFilter(payload=payload)
    for u in urls:
        f.add(u)
    return f.to_bytes()


def cuckoo_might_contain(payload: bytes, urls) -> np.ndarray:
    return CuckooFilter(payload=payload).contains_vec(urls)
