"""BPE subword tokenization — corpus-trained, Spark-shaped.

Byte-pair encoding (Sennrich et al., "Neural Machine Translation of
Rare Words with Subword Units", ACL 2016) trains on the WORD-TYPE
frequency table, not on running text — which is exactly the split a
100-TB corpus needs:

- the distributed part is the word count: one explode + groupBy with
  map-side partial combine (the only pass over the corpus);
- the driver part is merge training over the top-V word types — its
  cost is bounded by the vocabulary cut (``top_words``), never by
  corpus size, the same bounded-collect contract as the ANN coarse
  quantizer (similarity.py `_kmeans_centroids`);
- application broadcasts the (tiny) merge-rank table inside a pandas
  UDF closure and tokenizes Arrow batches with a per-batch word cache
  (Zipf: most tokens in a batch are repeats, so the greedy merge loop
  runs once per UNIQUE word).

Determinism (ONE kernel, both sides): tokenization is
``text.lower().split()`` (the shingle kernel's convention,
dedup.py:109); merge selection breaks frequency ties by
lexicographically smallest pair; merges stop when the best pair
occurs < 2 times. The driver oracle retrains from the same parquet
with `bpe_train_from_counts` and hash-compares per-document token
streams.
"""

from __future__ import annotations

from collections import Counter

import pandas as pd
from pyspark.sql import DataFrame
from pyspark.sql import functions as F

_EOW = "</w>"


# ----------------------------------------------------------------------
# pure kernels
# ----------------------------------------------------------------------

def bpe_train_from_counts(counts, num_merges: int):
    """(word, count) pairs → ordered merge list [(a, b), ...].

    Classic BPE training over word types: every word is a symbol
    sequence ``chars + [</w>]``; each step merges the most frequent
    adjacent pair (ties → lexicographically smallest pair), weighted
    by word count, until ``num_merges`` merges or no pair occurs
    twice."""
    vocab: dict[tuple, int] = {}
    for word, cnt in counts:
        sym = tuple(word) + (_EOW,)
        vocab[sym] = vocab.get(sym, 0) + int(cnt)
    merges: list[tuple[str, str]] = []
    for _ in range(num_merges):
        pairs: Counter = Counter()
        for sym, cnt in vocab.items():
            for i in range(len(sym) - 1):
                pairs[(sym[i], sym[i + 1])] += cnt
        if not pairs:
            break
        best, best_n = min(pairs.items(), key=lambda kv: (-kv[1], kv[0]))
        if best_n < 2:
            break
        merges.append(best)
        a, b = best
        ab = a + b
        new_vocab: dict[tuple, int] = {}
        for sym, cnt in vocab.items():
            out = []
            i = 0
            while i < len(sym):
                if i + 1 < len(sym) and sym[i] == a and sym[i + 1] == b:
                    out.append(ab)
                    i += 2
                else:
                    out.append(sym[i])
                    i += 1
            t = tuple(out)
            new_vocab[t] = new_vocab.get(t, 0) + cnt
        vocab = new_vocab
    return merges


def bpe_encode_word(word: str, ranks: dict) -> list[str]:
    """Greedy BPE application: repeatedly merge the lowest-rank
    adjacent pair (all non-overlapping occurrences, left to right)."""
    sym = list(word) + [_EOW]
    while len(sym) > 1:
        best_rank = None
        best_pair = None
        for i in range(len(sym) - 1):
            r = ranks.get((sym[i], sym[i + 1]))
            if r is not None and (best_rank is None or r < best_rank):
                best_rank = r
                best_pair = (sym[i], sym[i + 1])
        if best_pair is None:
            break
        a, b = best_pair
        ab = a + b
        out = []
        i = 0
        while i < len(sym):
            if i + 1 < len(sym) and sym[i] == a and sym[i + 1] == b:
                out.append(ab)
                i += 2
            else:
                out.append(sym[i])
                i += 1
        sym = out
    return sym


def bpe_tokens(text: str, ranks: dict,
               cache: dict | None = None) -> list[str]:
    """Tokenize a document: lower().split() words, each BPE-encoded.
    ``cache`` amortizes the merge loop across one Arrow batch."""
    if cache is None:
        cache = {}
    out: list[str] = []
    for w in text.lower().split():
        toks = cache.get(w)
        if toks is None:
            toks = bpe_encode_word(w, ranks)
            cache[w] = toks
        out.extend(toks)
    return out


def merge_ranks(merges) -> dict:
    return {tuple(m): r for r, m in enumerate(merges)}


# ----------------------------------------------------------------------
# distributed paths
# ----------------------------------------------------------------------

def word_counts(docs: DataFrame, text_col: str = "text") -> DataFrame:
    """(word, cnt) over the corpus — the one full pass BPE training
    needs. The tokenizer is the kernel's Python ``lower().split()``
    (a pandas UDF, so the word definition is identical on both
    sides); the count itself is a JVM groupBy with map-side combine.
    """
    @F.pandas_udf("array<string>")
    def _words(text: pd.Series) -> pd.Series:
        return pd.Series([str(t).lower().split() if t is not None else []
                          for t in text])

    return (docs.select(F.explode(_words(F.col(text_col))).alias("word"))
            .groupBy("word").agg(F.count("*").alias("cnt")))


def bpe_train(docs: DataFrame, num_merges: int = 200,
              top_words: int = 50_000, text_col: str = "text"):
    """Train merges from the corpus: distributed word count → top-V
    word types (count desc, word asc — deterministic) → driver-side
    merge loop. The collect is ≤ ``top_words`` rows by construction.
    """
    top = (word_counts(docs, text_col)
           .orderBy(F.desc("cnt"), F.asc("word"))
           .limit(top_words).collect())
    return bpe_train_from_counts([(r["word"], r["cnt"]) for r in top],
                                 num_merges)


def bpe_tokens_udf(merges):
    """pandas UDF: text → array<string> of BPE tokens. The merge-rank
    dict rides the closure (broadcast with the serialized UDF — a few
    KB for any real vocab)."""
    ranks = merge_ranks(merges)

    @F.pandas_udf("array<string>")
    def _bpe(text: pd.Series) -> pd.Series:
        cache: dict = {}
        return pd.Series([
            bpe_tokens(str(t) if t is not None else "", ranks, cache)
            for t in text])

    return _bpe


def bpe_token_stats(docs: DataFrame, merges, id_col: str = "doc_id",
                    text_col: str = "text") -> DataFrame:
    """Per-document (doc_id, n_tokens, tok_hash): the token stream
    pinned by an md5 over the space-joined tokens — tokens contain no
    whitespace, so the join is injective."""
    toks = docs.select(F.col(id_col).cast("long").alias("doc_id"),
                       bpe_tokens_udf(merges)(F.col(text_col))
                       .alias("toks"))
    return toks.select(
        "doc_id",
        F.size("toks").cast("long").alias("n_tokens"),
        F.md5(F.concat_ws(" ", "toks")).alias("tok_hash"))
