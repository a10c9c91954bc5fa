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


GOPHER_STOP_WORDS = ("the", "be", "to", "of", "and",
                     "that", "have", "with")
_ASCII_ALPHA = ("abcdefghijklmnopqrstuvwxyz"
                "ABCDEFGHIJKLMNOPQRSTUVWXYZ")


def gopher_quality(docs: DataFrame, id_col: str = "doc_id",
                   text_col: str = "text",
                   min_words: int = 50, max_words: int = 100_000,
                   min_stop_hits: int = 2) -> DataFrame:
    """Gopher-style document quality rules (Rae et al. 2021, App. A) —
    the page-level repetition/shape gate run next to the C4 line gate.

    Rules (each restated as INTEGER comparisons so the Spark plan and
    the Python twin cannot drift through float rounding — the ratios
    Gopher publishes become cross-multiplied inequalities):

    - word count in [min_words, max_words];
    - mean word length in [3, 10]       → 3·n ≤ Σlen ≤ 10·n;
    - symbol-to-word ratio ≤ 0.1        → 10·(#'#' + #'...') ≤ n;
    - bullet-start line fraction ≤ 0.9  → 10·bullets ≤ 9·lines;
    - ellipsis-end line fraction ≤ 0.3  → 10·ell ≤ 3·lines;
    - alphabetic-word fraction ≥ 0.8    → 5·alpha ≥ 4·n;
    - ≥ min_stop_hits distinct Gopher stop words present as tokens.

    Scale shape: pure Catalyst like :func:`c4_clean` — split/filter/
    aggregate higher-order functions + translate/replace, zero Python,
    zero shuffle, codegen'd over the scan. Words are the space-split
    non-empty tokens of text with \\n and \\t flattened to spaces
    (identical ops in :func:`gopher_quality_doc`); "alphabetic" means
    contains an ASCII letter (translate-based, no regex engine in the
    comparison path); '...' counts are non-overlapping occurrences via
    the replace-length formula both sides share."""
    text = F.col(text_col)
    # staged selects, not one mega-projection: the words/lines arrays
    # are non-cheap expressions referenced by several counters, and
    # CollapseProject keeps them materialized once per row instead of
    # inlining one split per output column
    flat = F.translate(text, "\n\t", "  ")
    words = F.filter(F.split(flat, " ", -1), lambda w: w != F.lit(""))
    lines = F.split(text, "\n", -1)
    staged = docs.select(
        F.col(id_col), text.alias("_t"),
        words.alias("_words"), lines.alias("_lines"))
    w = F.col("_words")
    ln = F.col("_lines")
    t = F.col("_t")
    n_hash = F.length(t) - F.length(F.translate(t, "#", ""))
    n_ellipsis = ((F.length(t)
                   - F.length(F.replace(t, F.lit("..."), F.lit(""))))
                  / 3).cast("int")
    counters = staged.select(
        F.col(id_col),
        F.size(w).alias("n_words"),
        F.aggregate(w, F.lit(0),
                    lambda acc, x: acc + F.length(x))
        .alias("sum_word_len"),
        (n_hash + n_ellipsis).cast("int").alias("n_symbols"),
        F.size(F.filter(
            ln, lambda x: x.startswith("- ") | x.startswith("* ")
            | x.startswith("• "))).alias("n_bullet_lines"),
        F.size(F.filter(ln, lambda x: x.endswith("...")))
        .alias("n_ellipsis_lines"),
        F.size(F.filter(
            w, lambda x: F.length(x) != F.length(
                F.translate(x, _ASCII_ALPHA, ""))))
        .alias("n_alpha_words"),
        F.size(F.array_intersect(
            F.transform(w, F.lower),
            F.array(*[F.lit(s) for s in GOPHER_STOP_WORDS])))
        .alias("n_stop_hits"),
        F.size(ln).alias("n_lines"))
    n_words = F.col("n_words")
    sum_len = F.col("sum_word_len")
    kept = ((n_words >= min_words) & (n_words <= max_words)
            & (3 * n_words <= sum_len) & (sum_len <= 10 * n_words)
            & (10 * F.col("n_symbols") <= n_words)
            & (10 * F.col("n_bullet_lines") <= 9 * F.col("n_lines"))
            & (10 * F.col("n_ellipsis_lines") <= 3 * F.col("n_lines"))
            & (5 * F.col("n_alpha_words") >= 4 * n_words)
            & (F.col("n_stop_hits") >= min_stop_hits))
    return counters.select(
        F.col(id_col), kept.alias("kept"),
        *[F.col(c).cast("int").alias(c)
          for c in ("n_words", "sum_word_len", "n_symbols",
                    "n_bullet_lines", "n_ellipsis_lines",
                    "n_alpha_words", "n_stop_hits", "n_lines")])


def gopher_quality_doc(text: str, min_words: int = 50,
                       max_words: int = 100_000,
                       min_stop_hits: int = 2) -> tuple:
    """Single-threaded twin of :func:`gopher_quality` — identical
    primitive ops (flatten-then-space-split, translate deletions,
    replace-length ellipsis count), so any Spark/twin divergence is a
    bug, not a semantics gap. Returns (kept, n_words, sum_word_len,
    n_symbols, n_bullet_lines, n_ellipsis_lines, n_alpha_words,
    n_stop_hits, n_lines)."""
    flat = text.replace("\n", " ").replace("\t", " ")
    words = [w for w in flat.split(" ") if w != ""]
    n_words = len(words)
    sum_len = sum(len(w) for w in words)
    n_hash = len(text) - len(text.replace("#", ""))
    n_ellipsis = (len(text) - len(text.replace("...", ""))) // 3
    n_symbols = n_hash + n_ellipsis
    lines = text.split("\n")
    n_lines = len(lines)
    n_bullet = sum(1 for ln in lines
                   if ln.startswith(("- ", "* ", "• ")))
    n_ell_lines = sum(1 for ln in lines if ln.endswith("..."))
    alpha = set(_ASCII_ALPHA)
    n_alpha = sum(1 for w in words if any(c in alpha for c in w))
    low_words = set(w.lower() for w in words)
    n_stop = sum(1 for sw in GOPHER_STOP_WORDS if sw in low_words)
    kept = (min_words <= n_words <= max_words
            and 3 * n_words <= sum_len <= 10 * n_words
            and 10 * n_symbols <= n_words
            and 10 * n_bullet <= 9 * n_lines
            and 10 * n_ell_lines <= 3 * n_lines
            and 5 * n_alpha >= 4 * n_words
            and n_stop >= min_stop_hits)
    return (kept, n_words, sum_len, n_symbols, n_bullet, n_ell_lines,
            n_alpha, n_stop, n_lines)


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


def gopher_repetition(docs: DataFrame, id_col: str = "doc_id",
                      text_col: str = "text") -> DataFrame:
    """Gopher repetition rules (Rae et al. 2021, App. A "repetition
    filters"): pages dominated by repeated lines or one repeated
    word-bigram are dropped. Thresholds as integer cross-products:

    - duplicate-line fraction ≤ 0.30        → 10·dup ≤ 3·lines;
    - duplicate-line CHARACTER fraction ≤ 0.20 → 5·dupchars ≤ chars;
    - top word-2-gram character share ≤ 0.20   → 5·topchars ≤ chars.

    A line instance is "duplicate" when its text occurs ≥2 times in
    the document; the top bigram is the most frequent space-joined
    word pair (ties → lexicographically smallest). Everything is
    computed IN-ROW over sorted arrays — sort_array + neighbor
    comparison for duplicate lines (O(L log L), no L² self-filter),
    one aggregate() run-length pass for the top bigram — so the plan
    is zero-Python, zero-shuffle, codegen'd over the scan like
    :func:`gopher_quality`.

    Output: (id_col, kept, n_lines, n_dup_lines, dup_line_chars,
    top_bigram, top_bigram_count, top_bigram_chars, text_chars).
    """
    text = F.col(text_col)
    flat = F.translate(text, "\n\t", "  ")
    words = F.filter(F.split(flat, " ", -1), lambda w: w != F.lit(""))
    grams = F.zip_with(
        F.slice(words, 1, F.greatest(F.size(words) - 1, F.lit(0))),
        F.slice(words, 2, F.greatest(F.size(words) - 1, F.lit(0))),
        lambda a, b: F.concat(a, F.lit(" "), b))
    staged = docs.select(
        F.col(id_col),
        F.length(text).alias("text_chars"),
        F.sort_array(F.split(text, "\n", -1)).alias("_lines"),
        F.sort_array(grams).alias("_grams"))
    ls = F.col("_lines")
    dup = F.filter(
        ls, lambda x, i: (x.eqNullSafe(F.get(ls, i - 1))
                          | x.eqNullSafe(F.get(ls, i + 1))))
    # run-length scan over the sorted grams: strict > keeps the FIRST
    # (lexicographically smallest) maximal run as the winner
    init = F.struct(F.lit("").alias("prev"), F.lit(0).alias("run"),
                    F.lit(0).alias("best"), F.lit("").alias("bg"))
    def _merge(acc, g):
        newrun = F.when(g == acc["prev"], acc["run"] + 1).otherwise(
            F.lit(1))
        better = newrun > acc["best"]
        return F.struct(
            g.alias("prev"), newrun.alias("run"),
            F.when(better, newrun).otherwise(acc["best"]).alias("best"),
            F.when(better, g).otherwise(acc["bg"]).alias("bg"))
    top = F.aggregate(F.col("_grams"), init, _merge)
    counters = staged.select(
        F.col(id_col), F.col("text_chars"),
        F.size(ls).alias("n_lines"),
        F.size(dup).alias("n_dup_lines"),
        F.aggregate(dup, F.lit(0), lambda acc, x: acc + F.length(x))
        .alias("dup_line_chars"),
        top["bg"].alias("top_bigram"),
        top["best"].alias("top_bigram_count"),
        (top["best"] * F.length(top["bg"])).alias("top_bigram_chars"))
    kept = ((10 * F.col("n_dup_lines") <= 3 * F.col("n_lines"))
            & (5 * F.col("dup_line_chars") <= F.col("text_chars"))
            & (5 * F.col("top_bigram_chars") <= F.col("text_chars")))
    return counters.select(
        F.col(id_col), kept.alias("kept"),
        F.col("n_lines").cast("int").alias("n_lines"),
        F.col("n_dup_lines").cast("int").alias("n_dup_lines"),
        F.col("dup_line_chars").cast("int").alias("dup_line_chars"),
        "top_bigram",
        F.col("top_bigram_count").cast("int").alias("top_bigram_count"),
        F.col("top_bigram_chars").cast("int").alias("top_bigram_chars"),
        F.col("text_chars").cast("int").alias("text_chars"))


def gopher_repetition_doc(text: str) -> tuple:
    """Single-threaded twin of :func:`gopher_repetition` — identical
    sorted-adjacency and run-length logic. Returns (kept, n_lines,
    n_dup_lines, dup_line_chars, top_bigram, top_bigram_count,
    top_bigram_chars, text_chars)."""
    flat = text.replace("\n", " ").replace("\t", " ")
    words = [w for w in flat.split(" ") if w != ""]
    grams = sorted(words[i] + " " + words[i + 1]
                   for i in range(len(words) - 1))
    lines = sorted(text.split("\n"))
    dup = [x for i, x in enumerate(lines)
           if (i > 0 and lines[i - 1] == x)
           or (i + 1 < len(lines) and lines[i + 1] == x)]
    prev, run, best, bg = "", 0, 0, ""
    for g in grams:
        run = run + 1 if g == prev else 1
        prev = g
        if run > best:
            best, bg = run, g
    text_chars = len(text)
    n_lines, n_dup = len(lines), len(dup)
    dup_chars = sum(len(x) for x in dup)
    top_chars = best * len(bg)
    kept = (10 * n_dup <= 3 * n_lines
            and 5 * dup_chars <= text_chars
            and 5 * top_chars <= text_chars)
    return (kept, n_lines, n_dup, dup_chars, bg, best, top_chars,
            text_chars)
