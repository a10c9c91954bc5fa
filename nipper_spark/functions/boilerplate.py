"""Repeated-span (boilerplate) removal — exact substring dedup at
word-n-gram granularity, the pipeline step that strips cookie
banners / nav chrome / parked-domain templates repeated across many
documents (cf. "Deduplicating Training Data Makes Language Models
Better", Lee et al. 2022 — simplified from suffix arrays to fixed-
width word n-grams, which is what scales on Spark).

Semantics (ONE pure kernel, both sides):
- words = ``text.split()`` (same whitespace tokenization as
  `text_udfs.whitespace_token_count`);
- every width-W word window is hashed (`span_gram_hashes`, blake2b-8
  — process-independent, same family as `url.url_hash64`);
- a gram whose DOCUMENT frequency exceeds ``max_docs`` flags its W
  positions in every document containing it;
- flagged positions are removed; surviving words re-join with single
  spaces (`remove_spans_py`).

Scale shape: the shuffles carry ``(id, pos, gram_hash)`` — 24 bytes a
row, never the text. Document frequency is a count-distinct-by-key
aggregation with map-side partial combine; the hot-gram table joins
back by hash (shuffle join — at web scale the hot set is NOT
broadcastable: every boilerplate string on the web is in it). Text
crosses the Python boundary exactly twice: once to hash, once to
rebuild.
"""

from __future__ import annotations

import hashlib

import pandas as pd
from pyspark.sql import DataFrame
from pyspark.sql import functions as F


def _gram_hash(gram: str) -> int:
    h = hashlib.blake2b(gram.encode("utf-8"), digest_size=8,
                        person=b"spangram").digest()
    return int.from_bytes(h, "big", signed=True)


def span_gram_hashes(text: str, width: int) -> list:
    """Hash of every width-W word window, in position order.
    THE definition — the distributed explode and the single-threaded
    oracle both call this."""
    words = text.split()
    return [_gram_hash(" ".join(words[i:i + width]))
            for i in range(len(words) - width + 1)]


def remove_spans_py(text: str, flagged_positions, width: int):
    """Rebuild ``text`` with every word covered by a flagged window
    removed. Returns (clean_text, n_words, n_removed)."""
    words = text.split()
    keep = [True] * len(words)
    for p in flagged_positions:
        for j in range(p, min(p + width, len(words))):
            keep[j] = False
    kept = [w for w, k in zip(words, keep) if k]
    return " ".join(kept), len(words), len(words) - len(kept)


def repeated_spans_oracle(docs: list, width: int = 5,
                          max_docs: int = 2) -> dict:
    """Single-threaded twin: docs = [(doc_id, text)] →
    {doc_id: (clean_text, n_words, n_removed)}."""
    per_doc = {i: span_gram_hashes(t, width) for i, t in docs}
    df: dict = {}
    for i, hashes in per_doc.items():
        for h in set(hashes):
            df[h] = df.get(h, 0) + 1
    hot = {h for h, c in df.items() if c > max_docs}
    out = {}
    for i, t in docs:
        flagged = [p for p, h in enumerate(per_doc[i]) if h in hot]
        out[i] = remove_spans_py(t, flagged, width)
    return out


def _gram_df(docs: DataFrame, id_col: str, text_col: str,
             width: int) -> DataFrame:
    """(id, pos, gram_h) — text crosses into Python once, and only the
    24-byte (id, pos, hash) rows ride the explode/shuffles."""
    @F.pandas_udf("array<long>")
    def _hashes(texts: pd.Series) -> pd.Series:
        return pd.Series([span_gram_hashes(str(t) if t is not None
                                           else "", width)
                          for t in texts])

    return (docs.select(F.col(id_col).alias("id"),
                        F.posexplode(_hashes(F.col(text_col)))
                        .alias("pos", "gram_h")))


def remove_repeated_spans(docs: DataFrame, id_col: str = "doc_id",
                          text_col: str = "text", width: int = 5,
                          max_docs: int = 2) -> DataFrame:
    """docs → (id_col, text_clean, n_words, n_removed).

    Document frequency > ``max_docs`` flags a gram everywhere it
    occurs; every flagged window's words are removed. Documents with
    no flagged spans pass through verbatim (left join keeps them)."""
    grams = _gram_df(docs, id_col, text_col, width)
    hot = (grams.select("gram_h", "id").distinct()
           .groupBy("gram_h").agg(F.count("*").alias("df"))
           .filter(F.col("df") > max_docs)
           .select("gram_h"))
    flagged = (grams.join(hot, "gram_h")
               .groupBy("id")
               .agg(F.sort_array(F.collect_list("pos")).alias("spans")))

    @F.pandas_udf("struct<text_clean: string, n_words: int, "
                  "n_removed: int>")
    def _rebuild(texts: pd.Series, spans: pd.Series) -> pd.DataFrame:
        cleans, totals, removed = [], [], []
        for t, ps in zip(texts, spans):
            c, n, r = remove_spans_py(
                str(t) if t is not None else "",
                ps if ps is not None else [], width)
            cleans.append(c)
            totals.append(n)
            removed.append(r)
        return pd.DataFrame({"text_clean": cleans, "n_words": totals,
                             "n_removed": removed})

    joined = (docs.select(F.col(id_col), F.col(text_col))
              .join(flagged.withColumnRenamed("id", id_col),
                    id_col, "left"))
    out = joined.select(
        id_col, _rebuild(F.col(text_col), F.col("spans")).alias("_r"))
    return out.select(id_col, "_r.text_clean", "_r.n_words",
                      "_r.n_removed")
