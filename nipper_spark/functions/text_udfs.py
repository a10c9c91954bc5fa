"""Text-analysis operators for a large-scale training-data pipeline.

Everything that CAN be a native Catalyst expression IS one (token
counts, quality ratios — whole-stage-codegen'd, pushdown-friendly);
only genuinely non-relational kernels (language ID, rolling-hash
fingerprints) use Arrow-batched pandas UDFs.
"""

from __future__ import annotations

import pandas as pd
from pyspark.sql import Column, DataFrame
from pyspark.sql import functions as F

# ----------------------------------------------------------------------
# token counting — pure Catalyst (JVM, codegen)
# ----------------------------------------------------------------------

# BPE-ish pre-tokenizer: word pieces, numbers, or single non-space
# symbols (the GPT-2 pre-split regex family, simplified to RE2-safe).
BPE_SPLIT = r"[A-Za-z]+|[0-9]|[^A-Za-z0-9\s]"


def whitespace_token_count(text: str | Column) -> Column:
    c = F.col(text) if isinstance(text, str) else text
    return F.size(F.split(F.trim(c), r"\s+")).alias("ws_tokens")


def bpe_ish_token_count(text: str | Column) -> Column:
    c = F.col(text) if isinstance(text, str) else text
    return F.size(F.regexp_extract_all(c, F.lit(BPE_SPLIT), 0)) \
        .alias("bpe_tokens")


# ----------------------------------------------------------------------
# quality scoring — pure Catalyst
# ----------------------------------------------------------------------

_STOPWORDS = ("the", "a", "of", "to", "and", "in", "is", "for", "on",
              "with", "as", "at", "by", "an", "it")


def quality_columns(text: str | Column) -> list[Column]:
    """Length / punctuation / stopword-ratio features (the classic
    C4/Gopher-style cheap filters), all JVM-side."""
    c = F.col(text) if isinstance(text, str) else text
    n_chars = F.length(c)
    words = F.split(F.trim(c), r"\s+")
    n_words = F.size(words)
    n_punct = F.size(F.regexp_extract_all(c, F.lit(r"[\.,;:!\?]"), 0))
    stop_hits = F.size(F.filter(
        words, lambda w: F.lower(w).isin(*_STOPWORDS)))
    mean_word_len = (n_chars / F.greatest(n_words, F.lit(1))).cast("double")
    return [
        n_chars.alias("n_chars"),
        n_words.alias("n_words"),
        (n_punct / F.greatest(n_words, F.lit(1))).alias("punct_ratio"),
        (stop_hits / F.greatest(n_words, F.lit(1))).alias("stopword_ratio"),
        mean_word_len.alias("mean_word_len"),
    ]


def quality_score(text: str | Column) -> Column:
    """Composite [0,1] quality heuristic — a deterministic, documented
    formula so the DuckDB oracle can reproduce it exactly."""
    c = F.col(text) if isinstance(text, str) else text
    words = F.split(F.trim(c), r"\s+")
    n_words = F.size(words).cast("double")
    stop_hits = F.size(F.filter(
        words, lambda w: F.lower(w).isin(*_STOPWORDS))).cast("double")
    len_term = F.least(n_words / F.lit(64.0), F.lit(1.0))
    stop_term = F.least(
        stop_hits / F.greatest(n_words, F.lit(1.0)) * F.lit(4.0), F.lit(1.0))
    return ((len_term + stop_term) / F.lit(2.0)).alias("quality")


# ----------------------------------------------------------------------
# language ID — character-trigram profiles (pandas UDF)
# ----------------------------------------------------------------------

_LANG_PROFILES = {
    # top trigrams per language, hand-curated (deterministic heuristic;
    # a real pipeline swaps in fastText via the same UDF signature)
    "en": (" th", "the", "he ", " an", "and", "nd ", " of", "of ", "ing",
           " to", "to ", "er ", " in", "ed ", "is "),
    "de": ("en ", "er ", " de", "der", "ie ", " di", "die", "ein", "ich",
           "nde", " un", "und", "ch ", "sch", "ung"),
    "fr": (" de", "de ", " le", "es ", "le ", "ent", " la", "la ", "ion",
           "re ", " et", "et ", "que", " qu", "les"),
    "es": (" de", "de ", " la", "la ", "os ", " el", "el ", "ión", "es ",
           "ent", " en", "en ", "as ", "ción", "los"),
}


def lang_id_udf():
    profiles = {k: frozenset(v) for k, v in _LANG_PROFILES.items()}

    @F.pandas_udf("string")
    def _lang(text: pd.Series) -> pd.Series:
        out = []
        for t in text:
            if not t:
                out.append("und")
                continue
            s = " " + str(t)[:2000].lower() + " "
            if any(0x4E00 <= ord(ch) <= 0x9FFF for ch in s[:200]):
                out.append("zh")
                continue
            tris = {s[i:i + 3] for i in range(len(s) - 2)}
            best, best_hits = "und", 2  # need ≥3 profile hits to claim
            for lang, prof in profiles.items():
                hits = len(tris & prof)
                if hits > best_hits:
                    best, best_hits = lang, hits
            out.append(best)
        return pd.Series(out)

    return _lang


# ----------------------------------------------------------------------
# document fingerprinting — polynomial rolling hash (pandas UDF)
# ----------------------------------------------------------------------

_FP_BASE = 1000003
_FP_MOD = (1 << 61) - 1


def fingerprint(text: str, window: int = 64) -> int:
    """Deterministic 61-bit rolling-hash fingerprint: max of the
    per-window polynomial hashes (a winnowing-style document sketch).
    Pure function — shared by the UDF and any oracle."""
    data = text.encode("utf-8", errors="replace")
    if not data:
        return 0
    if len(data) <= window:
        h = 0
        for b in data:
            h = (h * _FP_BASE + b) % _FP_MOD
        return h
    # rolling windows
    pw = pow(_FP_BASE, window - 1, _FP_MOD)
    h = 0
    best = 0
    for i, b in enumerate(data):
        if i >= window:
            h = (h - data[i - window] * pw) % _FP_MOD
        h = (h * _FP_BASE + b) % _FP_MOD
        if i >= window - 1 and h > best:
            best = h
    return best


def fingerprint_udf(window: int = 64):
    @F.pandas_udf("long")
    def _fp(text: pd.Series) -> pd.Series:
        return pd.Series([fingerprint(str(t) if t is not None else "",
                                      window) for t in text],
                         dtype="int64")

    return _fp


def with_text_features(docs: DataFrame, text_col: str = "text") -> DataFrame:
    """documents(text, …) → + token counts, quality features, lang_pred,
    fingerprint. One projection; native expressions stay fused in one
    codegen stage, the two UDF columns share one Arrow pass each."""
    c = F.col(text_col)
    return docs.select(
        "*",
        whitespace_token_count(c),
        bpe_ish_token_count(c),
        *quality_columns(c),
        quality_score(c),
        lang_id_udf()(c).alias("lang_pred"),
        fingerprint_udf()(c).alias("fingerprint"),
    )
