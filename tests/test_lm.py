"""CCNet-style LM perplexity: distributed training == Python twin,
scoring kernel shared, exact tertile bucketing == twin."""

import math

import pytest
from hypothesis import given, settings
from hypothesis import strategies as st

from nipper_spark.functions.lm import (lm_logloss, lm_score, lm_train,
                                       lm_train_py, perplexity_buckets,
                                       perplexity_buckets_py)
from nipper_spark.session import build_session

TEXTS = [
    "the cat sat on the mat",
    "the cat ran fast",
    "a dog barked at the cat",
    "spark shuffles the data across the cluster",
    "the the the the",
    "zz qq xx",            # all-OOV under a small vocab cut
    "",                    # empty → NULL logloss → tail
    None,
]


@pytest.fixture(scope="module")
def spark():
    return build_session("lm-tests", master="local[4]",
                         shuffle_partitions=4)


@pytest.fixture(scope="module")
def docs(spark):
    return spark.createDataFrame(
        [(i, t) for i, t in enumerate(TEXTS)],
        "doc_id long, text string")


def test_train_matches_twin(spark, docs):
    m = lm_train(docs, top_vocab=8, top_bigrams=12)
    m2 = lm_train_py(TEXTS, top_vocab=8, top_bigrams=12)
    assert m["vocab"] == m2["vocab"]
    assert m["uni"] == m2["uni"]
    assert m["bi"] == m2["bi"]
    assert m["total"] == m2["total"]


def test_logloss_kernel_hand_case():
    # one training doc "a b", vocab {a, b}: P(a|<s>) and P(b|a) are
    # exact rationals — check the kernel arithmetic end to end
    m = lm_train_py(["a b"], top_vocab=10, top_bigrams=10)
    # uni: a=1, b=1, <unk>=0; total=2; V=3
    pu_a = (1 + 1.0) / (2 + 3)
    p_a = (1 + 0.5 * pu_a) / (0 + 0.5)          # bi[<s>,a]=1, uni[<s>]=0
    pu_b = (1 + 1.0) / (2 + 3)
    p_b = (1 + 0.5 * pu_b) / (1 + 0.5)          # bi[a,b]=1, uni[a]=1
    want = -(math.log2(p_a) + math.log2(p_b)) / 2
    got = lm_logloss(["a", "b"], m["uni"], m["bi"], m["vocab"],
                     m["total"], 0.5)
    assert got == want
    assert lm_logloss([], m["uni"], m["bi"], m["vocab"],
                      m["total"], 0.5) is None


def test_score_and_buckets_match_twin(spark, docs):
    m = lm_train(docs, top_vocab=8, top_bigrams=12)
    out = perplexity_buckets(lm_score(docs, m))
    got = sorted((r.doc_id, r.n_tokens, r.logloss, r.bucket)
                 for r in out.collect())
    want = perplexity_buckets_py(list(enumerate(TEXTS)), m)
    assert got == want
    # empty/None docs landed in tail with NULL logloss
    by_id = {r[0]: r for r in got}
    assert by_id[6][2] is None and by_id[6][3] == "tail"
    assert by_id[7][2] is None and by_id[7][3] == "tail"
    # tertiles: 6 scored docs → 2 head, 2 middle, 2+2 tail
    from collections import Counter
    assert Counter(b for _, _, _, b in got) == {
        "head": 2, "middle": 2, "tail": 4}


@settings(max_examples=10, deadline=None)
@given(st.lists(st.text(alphabet="ab ", max_size=12), min_size=1,
                max_size=6))
def test_random_corpora_match_twin(spark, texts):
    docs = spark.createDataFrame(list(enumerate(texts)),
                                 "doc_id long, text string")
    m = lm_train(docs, top_vocab=3, top_bigrams=5)
    assert m == lm_train_py(texts, top_vocab=3, top_bigrams=5)
    got = sorted((r.doc_id, r.n_tokens, r.logloss, r.bucket)
                 for r in perplexity_buckets(lm_score(docs, m)).collect())
    assert got == perplexity_buckets_py(list(enumerate(texts)), m)
