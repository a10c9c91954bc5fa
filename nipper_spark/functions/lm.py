"""CCNet-style n-gram LM perplexity scoring + quality bucketing.

CCNet (Wenzek et al., "CCNet: Extracting High Quality Monolingual
Datasets from Web Crawl Data", LREC 2020) scores every crawled
document with a language model trained on a REFERENCE corpus and
splits the crawl into head/middle/tail perplexity buckets — the
standard pretraining-data quality gate. This module reproduces that
shape with an interpolated bigram LM:

- training runs over the reference corpus DISTRIBUTED (the same
  one-pass word-type count as BPE, plus one bigram-count pass with
  OOV words mapped to <unk>), and only the bounded tops are collected
  (``top_vocab`` unigrams, ``top_bigrams`` bigrams — count desc, key
  asc, deterministic). At 100 TB the reference corpus is curated and
  the broadcast tables are bounded by the cuts, never by corpus size;
- scoring broadcasts the count tables in a pandas-UDF closure and
  computes avg -log2 P(w|prev) per document via ONE pure kernel
  (`lm_logloss`) shared with the driver oracle — math.log2 on both
  sides, so doubles hash-compare bit-exact;
- bucketing ranks the scored corpus with the two-phase
  `operators.cumsum.row_sequence` (no single-partition window):
  lowest-perplexity third = head, then middle, then tail; empty
  documents (no tokens → NULL logloss) land in tail.

The LM is a scoring heuristic, not a generative model: the bigram
table is truncated to its top, so probabilities are not normalized —
exactly like CCNet's pruned KenLM. Determinism is the contract, not
normalization.
"""

from __future__ import annotations

import math

import pandas as pd
from pyspark.sql import DataFrame
from pyspark.sql import functions as F

from nipper_spark.functions.bpe import word_counts

_BOS = "<s>"
_UNK = "<unk>"
_SEP = "\x00"  # joins bigram keys; tokens are split() output, no \x00


# ----------------------------------------------------------------------
# pure kernel
# ----------------------------------------------------------------------

def lm_logloss(tokens, uni: dict, bi: dict, vocab,
               total_tokens: int, alpha: float) -> float | None:
    """Average -log2 P(w | prev) over the document, None when empty.

    P(w|prev) = (bi[prev,w] + alpha·Pu(w)) / (uni[prev] + alpha) with
    add-1 unigram backoff Pu(w) = (uni[w]+1)/(total+V). OOV tokens map
    to <unk> (whose unigram count is total − Σ vocab counts, folded
    into ``uni`` by the trainer); the first token conditions on <s>.
    """
    if not tokens:
        return None
    v_size = len(vocab) + 1  # + <unk>
    s = 0.0
    prev = _BOS
    for w in tokens:
        if w not in vocab:
            w = _UNK
        pu = (uni.get(w, 0) + 1.0) / (total_tokens + v_size)
        pb = (bi.get(prev + _SEP + w, 0) + alpha * pu) / \
            (uni.get(prev, 0) + alpha)
        s += -math.log2(pb)
        prev = w
    return s / len(tokens)


def lm_train_py(texts, top_vocab: int, top_bigrams: int) -> dict:
    """Single-threaded twin of `lm_train` — the oracle's trainer."""
    from collections import Counter
    wc: Counter = Counter()
    for t in texts:
        if t:
            wc.update(t.lower().split())
    top = sorted(wc.items(), key=lambda kv: (-kv[1], kv[0]))[:top_vocab]
    vocab = {w for w, _ in top}
    total = sum(wc.values())
    uni = dict(top)
    uni[_UNK] = total - sum(uni.values())
    bc: Counter = Counter()
    for t in texts:
        if not t:
            continue
        toks = [w if w in vocab else _UNK for w in t.lower().split()]
        prev = _BOS
        for w in toks:
            bc[prev + _SEP + w] += 1
            prev = w
    bi = dict(sorted(bc.items(),
                     key=lambda kv: (-kv[1], kv[0]))[:top_bigrams])
    return dict(uni=uni, bi=bi, vocab=vocab, total=total)


# ----------------------------------------------------------------------
# distributed paths
# ----------------------------------------------------------------------

def lm_train(ref_docs: DataFrame, text_col: str = "text",
             top_vocab: int = 30_000, top_bigrams: int = 200_000) -> dict:
    """Train on the reference corpus: one distributed unigram pass →
    bounded vocab collect; one distributed bigram pass (OOV→<unk> in
    the UDF, count in the JVM) → bounded bigram collect. Matches
    `lm_train_py` exactly (same tokenization, same tiebreaks)."""
    # cache the (unique-words-sized) count table: the total agg and the
    # top-V collect are two actions over it, and the underlying corpus
    # pass must not run twice
    wc = word_counts(ref_docs, text_col).cache()
    # total BEFORE the cut (one tiny agg), then the bounded top
    total = wc.agg(F.sum(F.col("cnt"))).collect()[0][0] or 0
    top = (wc.orderBy(F.desc("cnt"), F.asc("word"))
           .limit(top_vocab).collect())
    wc.unpersist()
    uni = {r["word"]: r["cnt"] for r in top}
    vocab = set(uni)
    uni[_UNK] = int(total) - sum(uni.values())

    @F.pandas_udf("array<string>")
    def _bigrams(text: pd.Series) -> pd.Series:
        out = []
        for t in text:
            toks = [w if w in vocab else _UNK
                    for w in (str(t).lower().split()
                              if t is not None else [])]
            prev = _BOS
            grams = []
            for w in toks:
                grams.append(prev + _SEP + w)
                prev = w
            out.append(grams)
        return pd.Series(out)

    bg = (ref_docs.select(F.explode(_bigrams(F.col(text_col)))
                          .alias("gram"))
          .groupBy("gram").agg(F.count("*").alias("cnt"))
          .orderBy(F.desc("cnt"), F.asc("gram"))
          .limit(top_bigrams).collect())
    bi = {r["gram"]: r["cnt"] for r in bg}
    return dict(uni=uni, bi=bi, vocab=vocab, total=int(total))


def lm_score(docs: DataFrame, model: dict, id_col: str = "doc_id",
             text_col: str = "text", alpha: float = 0.5) -> DataFrame:
    """(doc_id, n_tokens, logloss) for every document — the broadcast
    count tables ride the UDF closure; the per-doc arithmetic is the
    shared `lm_logloss` kernel."""
    uni, bi, vocab, total = (model["uni"], model["bi"], model["vocab"],
                             model["total"])

    @F.pandas_udf("struct<n_tokens:long, logloss:double>")
    def _score(text: pd.Series) -> pd.DataFrame:
        ns, ls = [], []
        for t in text:
            toks = str(t).lower().split() if t is not None else []
            ns.append(len(toks))
            ls.append(lm_logloss(toks, uni, bi, vocab, total, alpha))
        # nullable Float64, not float64: a plain numpy series would
        # turn None into NaN, which Arrow ships as NaN (not NULL) and
        # the bucket step would rank it instead of routing it to tail
        return pd.DataFrame({"n_tokens": pd.Series(ns, dtype="int64"),
                             "logloss": pd.Series(ls, dtype="Float64")})

    return (docs.select(F.col(id_col).cast("long").alias("doc_id"),
                        _score(F.col(text_col)).alias("_s"))
            .select("doc_id", F.col("_s.n_tokens").alias("n_tokens"),
                    F.col("_s.logloss").alias("logloss")))


def perplexity_buckets(scored: DataFrame) -> DataFrame:
    """(doc_id, n_tokens, logloss) → + bucket ∈ head|middle|tail:
    exact global tertiles over (logloss, doc_id) via the two-phase
    row sequence (scales — no single-partition window); NULL logloss
    (empty docs) → tail."""
    from nipper_spark.operators.cumsum import row_sequence

    # leaf the narrow per-doc scores first: the tertile machinery is
    # FOUR separate consumers (boundary sample, total count, ranked
    # compute, the NULL-logloss union branch) and each would otherwise
    # re-run the LM-scoring UDF over the corpus
    scored = scored.localCheckpoint()
    nn = scored.filter(F.col("logloss").isNotNull())
    n_tot = nn.agg(F.count("*").alias("_n"))
    ranked = row_sequence(nn, [("logloss", "asc"), ("doc_id", "asc")],
                          "_rank")
    ranked = ranked.crossJoin(F.broadcast(n_tot))
    bucket = (F.when(F.col("_rank") < F.floor(F.col("_n") / 3), "head")
              .when(F.col("_rank") < F.floor(2 * F.col("_n") / 3),
                    "middle")
              .otherwise("tail"))
    out = ranked.withColumn("bucket", bucket).drop("_rank", "_n")
    empties = (scored.filter(F.col("logloss").isNull())
               .withColumn("bucket", F.lit("tail")))
    return out.unionByName(empties)


def perplexity_buckets_py(rows, model: dict, alpha: float = 0.5):
    """Single-threaded twin over (doc_id, text) → sorted
    [(doc_id, n_tokens, logloss, bucket)]."""
    scored = []
    for i, t in rows:
        toks = t.lower().split() if t else []
        scored.append((i, len(toks),
                       lm_logloss(toks, model["uni"], model["bi"],
                                  model["vocab"], model["total"], alpha)))
    nn = sorted(((ll, i) for i, _n, ll in scored if ll is not None))
    n = len(nn)
    rank = {i: r for r, (_ll, i) in enumerate(nn)}
    out = []
    for i, ntok, ll in scored:
        if ll is None:
            b = "tail"
        elif rank[i] < n // 3:
            b = "head"
        elif rank[i] < (2 * n) // 3:
            b = "middle"
        else:
            b = "tail"
        out.append((i, ntok, ll, b))
    return sorted(out)
