"""Round-6 optimization pins: the batch-vectorized sketch kernels and
the Mersenne-fold modulo must be BIT-IDENTICAL to the scalar
definitions the oracles use (the scalar functions stay the semantic
authority; the batch twins only restructure the loops)."""

import random

import numpy as np
import pytest

from nipper_spark.functions import dedup as D


def _texts():
    rnd = random.Random(7)
    vocab = ["spark", "batch", "part", "line", "col", "order", "small",
             "sort", "fast", "value", "Spark", "UPPER", "x"]
    texts = []
    for _ in range(400):
        n = rnd.choice([0, 1, 2, 3, 4, 5, 40, 100, 700])
        texts.append(" ".join(rnd.choice(vocab) for _ in range(n)))
    # degenerate shapes: empty, whitespace, below-ngram word counts
    return texts + ["", "   ", "one", "one two", "one two three four",
                    "\tword\n"]


class TestModM61:
    def test_fold_equals_divide_exhaustive_shapes(self):
        rng = np.random.RandomState(0)
        xs = rng.randint(0, 1 << 63, size=20000, dtype=np.uint64) * 2 \
            + rng.randint(0, 2, size=20000, dtype=np.uint64)
        # boundary values around every multiple-of-M edge case
        m = (1 << 61) - 1
        edges = np.array(
            [0, 1, m - 1, m, m + 1, 2 * m - 1, 2 * m, 2 * m + 1,
             (1 << 64) - 1, (1 << 63), (1 << 61), 7 * m, 8 * m + 6],
            dtype=np.uint64)
        for arr in (xs, edges):
            assert (D._mod_m61(arr) == arr % np.uint64(m)).all()


class TestBatchEqualsScalar:
    @pytest.fixture(autouse=True)
    def _force_batch_path(self, monkeypatch):
        # the adaptive kernels fall back to the scalar loop below
        # _BATCH_MIN_DOCS; these pins must exercise the BATCH path
        monkeypatch.setattr(D, "_BATCH_MIN_DOCS", 0)

    def test_minhash_batch_bit_identical(self):
        texts = _texts()
        params = D._minhash_params(64)
        scalar = [D.minhash_signature(t, 64, 3, params, {})
                  for t in texts]
        batch = D.minhash_signatures_batch(texts, 64, 3, params, {})
        assert batch.shape == (len(texts), 64)
        for b, s in zip(batch, scalar):
            assert list(b) == s

    def test_minhash_batch_chunk_boundaries(self, monkeypatch):
        texts = _texts()
        params = D._minhash_params(32)
        full = D.minhash_signatures_batch(texts, 32, 3, params, {})
        monkeypatch.setattr(D, "_SIG_CHUNK_SHINGLES", 37)
        tiny = D.minhash_signatures_batch(texts, 32, 3, params, {})
        assert (tiny == full).all()

    def test_small_batch_fallback_identical(self, monkeypatch):
        # the adaptive scalar fallback must agree with the batch path
        texts = _texts()
        params = D._minhash_params(32)
        batch = D.minhash_signatures_batch(texts, 32, 3, params, {})
        sbatch = D.simhash_batch(texts, 2, {})
        monkeypatch.setattr(D, "_BATCH_MIN_DOCS", 10 ** 9)
        scal = D.minhash_signatures_batch(texts, 32, 3, params, {})
        sscal = D.simhash_batch(texts, 2, {})
        assert (scal == batch).all()
        assert (sscal == sbatch).all()

    def test_simhash_batch_bit_identical(self, monkeypatch):
        texts = _texts()
        scalar = [D.simhash(t, 2, {}) for t in texts]
        batch = D.simhash_batch(texts, 2, {})
        assert [int(v) for v in batch] == scalar
        monkeypatch.setattr(D, "_SIG_CHUNK_SHINGLES", 41)
        tiny = D.simhash_batch(texts, 2, {})
        assert (tiny == batch).all()

    def test_simhash_long_doc_no_bit_counter_overflow(self):
        # > 255 identical shingles per bit position would overflow a
        # uint8 accumulator; the kernel must count in int64
        t = "alpha beta " * 2000
        assert int(D.simhash_batch([t], 2, {})[0]) == D.simhash(t, 2, {})

    def test_empty_batch(self):
        params = D._minhash_params(16)
        assert D.minhash_signatures_batch([], 16, 3, params, {}).shape \
            == (0, 16)
        assert D.simhash_batch([], 2, {}).shape == (0,)
