"""C4-style quality filtering (Raffel et al. 2020, §2.2) — the
line-level + page-level cleaning pass every LLM pretraining pipeline
runs before dedup.

Rules implemented (the C4 core, deterministically restated):
- line KEPT iff it ends in a terminal punctuation mark (. ! ? "),
  contains ≥ ``min_words`` whitespace words, and does not contain
  "javascript" (case-insensitive);
- page DROPPED iff the cleaned text has fewer than ``min_sentences``
  sentence terminators, or the ORIGINAL page contains "lorem ipsum",
  a curly brace, or any configured bad word (C4 uses a public
  blocklist; the default here is a tiny documented stand-in —
  swap in a real list via ``bad_words``).

Scale shape: **pure Catalyst** — higher-order array functions
(`split`/`filter`/`array_join`) plus `translate`/`contains`; zero
Python, zero shuffle, whole-stage-codegen'd directly over the scan,
same discipline as `functions/pii.py`. Every primitive has exact
DuckDB/Python twins (substring tail, literal contains, translate
count), so the oracle is hash-exact — no regex engine differences to
paper over.
"""

from __future__ import annotations

import hashlib

from pyspark.sql import Column, DataFrame
from pyspark.sql import functions as F

TERMINAL_CHARS = ('.', '!', '?', '"')
DEFAULT_BAD_WORDS = ("badword", "verboten")
MIN_WORDS = 3
MIN_SENTENCES = 5


def _line_kept(ln: Column, min_words: int) -> Column:
    words = F.filter(F.split(ln, " ", -1), lambda w: w != F.lit(""))
    return (F.substring(ln, -1, 1).isin(*TERMINAL_CHARS)
            & (F.size(words) >= min_words)
            & ~F.contains(F.lower(ln), F.lit("javascript")))


def c4_clean(docs: DataFrame, id_col: str = "doc_id",
             text_col: str = "text",
             bad_words: tuple = DEFAULT_BAD_WORDS,
             min_words: int = MIN_WORDS,
             min_sentences: int = MIN_SENTENCES) -> DataFrame:
    """docs → (id_col, kept, clean_md5, n_lines, n_kept, n_sentences).

    ``clean_md5`` hashes the kept lines rejoined by newline (the text
    a kept page contributes downstream); ``kept`` is the page-level
    verdict. Dropped pages still report their stats — callers filter
    on ``kept`` (kept separate so curation can audit drop reasons)."""
    text = F.col(text_col)
    lines = F.split(text, "\n", -1)
    kept_lines = F.filter(lines, lambda ln: _line_kept(ln, min_words))
    clean = F.array_join(kept_lines, "\n")
    n_sent = F.length(clean) - F.length(F.translate(clean, ".!?", ""))
    low = F.lower(text)
    bad = F.lit(False)
    for w in ("lorem ipsum",) + tuple(bad_words):
        bad = bad | F.contains(low, F.lit(w))
    bad = bad | F.contains(text, F.lit("{")) | F.contains(text, F.lit("}"))
    return docs.select(
        F.col(id_col),
        ((n_sent >= min_sentences) & ~bad).alias("kept"),
        F.md5(clean).alias("clean_md5"),
        F.size(lines).cast("int").alias("n_lines"),
        F.size(kept_lines).cast("int").alias("n_kept"),
        n_sent.cast("int").alias("n_sentences"))


def c4_clean_doc(text: str, bad_words: tuple = DEFAULT_BAD_WORDS,
                 min_words: int = MIN_WORDS,
                 min_sentences: int = MIN_SENTENCES) -> tuple:
    """Single-threaded twin of :func:`c4_clean` for one document —
    operation-for-operation identical (tail char, space-split word
    count, literal contains), so Spark vs twin can only differ if one
    of them is wrong. Returns (kept, clean_md5, n_lines, n_kept,
    n_sentences)."""
    lines = text.split("\n")
    kept_lines = [
        ln for ln in lines
        if ln[-1:] in TERMINAL_CHARS
        and len([w for w in ln.split(" ") if w != ""]) >= min_words
        and "javascript" not in ln.lower()]
    clean = "\n".join(kept_lines)
    n_sent = sum(clean.count(c) for c in ".!?")
    low = text.lower()
    bad = any(w in low for w in ("lorem ipsum",) + tuple(bad_words))
    bad = bad or "{" in text or "}" in text
    kept = n_sent >= min_sentences and not bad
    return (kept, hashlib.md5(clean.encode("utf-8")).hexdigest(),
            len(lines), len(kept_lines), n_sent)
