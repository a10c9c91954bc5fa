"""BPE tokenizer: training kernel determinism, greedy-apply ==
training segmentation, distributed paths == pure kernels."""

import hashlib

import pytest
from hypothesis import given, settings
from hypothesis import strategies as st

from nipper_spark.functions.bpe import (bpe_encode_word, bpe_tokens,
                                        bpe_token_stats, bpe_train,
                                        bpe_train_from_counts,
                                        merge_ranks, word_counts)
from nipper_spark.session import build_session


@pytest.fixture(scope="module")
def spark():
    return build_session("bpe-tests", master="local[4]",
                         shuffle_partitions=4)


def test_training_hand_case():
    # 'aaab'×3: (a,a) weighted 6 wins round 1; round 2 three-way tie at
    # 3 resolves to the lexicographically smallest pair ('a','b')
    merges = bpe_train_from_counts([("aaab", 3)], num_merges=2)
    assert merges[0] == ("a", "a")
    assert merges[1] == ("a", "b")


def test_training_stops_below_two():
    # every pair occurs exactly once — no merge is ever made
    assert bpe_train_from_counts([("abc", 1)], num_merges=10) == []


def test_encode_word_greedy():
    merges = [("a", "a"), ("a", "b"), ("aa", "ab")]
    ranks = merge_ranks(merges)
    # aaab -> aa,a,b -> aa,ab -> aaab
    assert bpe_encode_word("aaab", ranks) == ["aaab", "</w>"]
    # unseen chars stay singletons
    assert bpe_encode_word("xy", ranks) == ["x", "y", "</w>"]


@settings(max_examples=60, deadline=None)
@given(st.lists(st.tuples(st.text(alphabet="abcd", min_size=1,
                                  max_size=6),
                          st.integers(1, 9)),
                min_size=1, max_size=8),
       st.integers(0, 12))
def test_greedy_apply_reproduces_training_segmentation(counts, n):
    """The defining BPE property: greedily applying the learned merges
    by rank re-derives the exact symbol sequence training ended with
    for every training word."""
    merges = bpe_train_from_counts(counts, num_merges=n)
    ranks = merge_ranks(merges)
    # replay merges in training order per word (subword-nmt-style
    # in-order application) — greedy lowest-rank must agree
    for w, _ in counts:
        sym = list(w) + ["</w>"]
        for a, b in merges:
            out, i = [], 0
            while i < len(sym):
                if i + 1 < len(sym) and sym[i] == a and sym[i + 1] == b:
                    out.append(a + b)
                    i += 2
                else:
                    out.append(sym[i])
                    i += 1
            sym = out
        assert bpe_encode_word(w, ranks) == sym, (w, merges)


def test_distributed_word_counts_match_python(spark):
    texts = ["The cat sat", "the CAT\tran", None, "  ", "cat"]
    df = spark.createDataFrame([(i, t) for i, t in enumerate(texts)],
                               "doc_id long, text string")
    got = {r["word"]: r["cnt"] for r in word_counts(df).collect()}
    from collections import Counter
    want = Counter(w for t in texts if t for w in t.lower().split())
    assert got == dict(want)


def test_engine_stats_match_twin(spark):
    texts = ["the cat sat on the mat", "the cat ran", "a dog", "", None,
             "the the the cat cat"]
    df = spark.createDataFrame([(i, t) for i, t in enumerate(texts)],
                               "doc_id long, text string")
    merges = bpe_train(df, num_merges=10, top_words=100)
    assert merges == bpe_train_from_counts(
        [(w, sum(1 for t in texts if t for x in t.lower().split()
                 if x == w))
         for w in {x for t in texts if t for x in t.lower().split()}],
        num_merges=10)
    ranks = merge_ranks(merges)
    got = {r["doc_id"]: (r["n_tokens"], r["tok_hash"])
           for r in bpe_token_stats(df, merges).collect()}
    for i, t in enumerate(texts):
        toks = bpe_tokens(t or "", ranks)
        want_hash = hashlib.md5(" ".join(toks).encode()).hexdigest()
        assert got[i] == (len(toks), want_hash), (i, t, toks)
