"""Text-analysis operators for a large-scale training-data pipeline.

Everything that CAN be a native Catalyst expression IS one (token
counts, quality ratios — whole-stage-codegen'd, pushdown-friendly);
only genuinely non-relational kernels (language ID, rolling-hash
fingerprints) use Arrow-batched pandas UDFs.
"""

from __future__ import annotations

import numpy as np
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
    # regexp_count == size(regexp_extract_all(.., 0)) for every input
    # (same engine, same non-overlapping match walk; both 0 on empty)
    # without materializing an array of every matched token
    return F.regexp_count(c, F.lit(BPE_SPLIT)).alias("bpe_tokens")


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
    n_punct = F.regexp_count(c, F.lit(r"[\.,;:!\?]"))
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
    # semantic definition: hits(lang) = |{3-char substrings of s} ∩
    # profile|. A profile trigram is in the document's trigram set iff
    # it occurs in s as a substring, so the set build (≈2000 slice
    # objects + set inserts per document — the q7 CPU hot spot) is
    # replaced by ≤60 C-speed `in s` scans; profile entries that are
    # not exactly 3 chars can never equal a trigram and are dropped up
    # front (same dead-entry behavior the frozenset-∩ had). Profile
    # iteration order is preserved — ties keep the earlier language.
    import re as _re
    profiles = [(k, tuple(dict.fromkeys(p for p in v if len(p) == 3)))
                for k, v in _LANG_PROFILES.items()]
    cjk = _re.compile("[一-鿿]")

    @F.pandas_udf("string")
    def _lang(text: pd.Series) -> pd.Series:
        out = []
        for t in text:
            if not t:
                out.append("und")
                continue
            s = " " + str(t)[:2000].lower() + " "
            if cjk.search(s[:200]):
                out.append("zh")
                continue
            best, best_hits = "und", 2  # need ≥3 profile hits to claim
            for lang, prof in profiles:
                hits = 0
                for p in prof:
                    if p in s:
                        hits += 1
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


# --- vectorized twin of fingerprint() ---------------------------------
#
# The scalar loop above is the semantic definition (and the oracle
# twin); executing it per byte in Python made this the last
# unvectorized CPU kernel on the per-document hot path. The batch
# kernel below computes the identical values with numpy only:
#
#   prefix form   T_g = Σ_{g'≤g} d_{g'}·B^{-g'}   (mod M, M = 2^61-1)
#   window hash   H_g = B^g · (T_g − T_{g−w})
#
# over the concatenation of the whole Arrow batch (per-document start
# offsets cancel algebraically, so one global pass covers every doc).
# All modular arithmetic stays in uint64 via 31/30-bit limb splitting —
# exact, no Python-object math.

_M61 = np.uint64(_FP_MOD)
_MASK31 = np.uint64((1 << 31) - 1)
_MASK30 = np.uint64((1 << 30) - 1)
_MASK29 = np.uint64((1 << 29) - 1)
_FP_BASE_INV = pow(_FP_BASE, _FP_MOD - 2, _FP_MOD)
_BATCH_BYTES = 1 << 22  # bound the working set per numpy pass


_S30, _S31, _S32, _S61 = (np.uint64(k) for k in (30, 31, 32, 61))
_MASK29_SHIFT = np.uint64(29)


def _m61_reduce(x: np.ndarray, in_place: bool = False) -> np.ndarray:
    """x < 2^64 → canonical representative in [0, M)."""
    if np.isscalar(x) or x.ndim == 0 or not in_place:
        x = (x & _M61) + (x >> _S61)
        return np.where(x >= _M61, x - _M61, x)
    hi = x >> _S61
    x &= _M61
    x += hi
    np.subtract(x, _M61, out=x, where=x >= _M61)
    return x


def _m61_mul(a: np.ndarray, b: np.ndarray) -> np.ndarray:
    """(a*b) mod M for canonical a, b < 2^61, exact in uint64.
    Buffer-reusing: ~7 array allocations instead of ~15 — on this
    workload the passes are allocation/first-touch bound, not ALU
    bound, so temporaries are the cost that matters."""
    a = np.asarray(a, dtype=np.uint64)
    b = np.asarray(b, dtype=np.uint64)
    if a.ndim == 0 and b.ndim == 0:
        return np.uint64((int(a) * int(b)) % _FP_MOD)
    a_hi, a_lo = a >> _S31, a & _MASK31
    b_hi, b_lo = b >> _S31, b & _MASK31
    mid = a_hi * b_lo
    tmp = a_lo * b_hi
    mid += tmp                                       # < 2^62
    # rotate: mid·2^31 ≡ (mid>>30) + ((mid & MASK30)<<31)
    np.bitwise_and(mid, _MASK30, out=tmp)
    tmp <<= _S31
    mid >>= _S30
    mid += tmp                                       # < 2^61 + 2^32
    np.multiply(a_hi, b_hi, out=tmp)
    tmp <<= np.uint64(1)                             # ·2^62 ≡ ·2, < 2^61
    mid += tmp                                       # < 2^63
    _m61_reduce(mid, in_place=True)
    np.multiply(a_lo, b_lo, out=tmp)                 # < 2^62
    mid += tmp                                       # < 2^63
    return _m61_reduce(mid, in_place=True)


def _m61_shift32(x: np.ndarray, in_place: bool = False) -> np.ndarray:
    """(x · 2^32) mod M for x < 2^61: a 61-bit rotation."""
    if in_place and not np.isscalar(x) and x.ndim:
        hi = x >> _MASK29_SHIFT
        x &= _MASK29
        x <<= _S32
        x += hi
        return _m61_reduce(x, in_place=True)
    return _m61_reduce((x >> _MASK29_SHIFT) + ((x & _MASK29) << _S32))


def _m61_sub(a: np.ndarray, b: np.ndarray) -> np.ndarray:
    """(a-b) mod M for canonical a, b: uint64 wraparound + conditional
    add-back (two allocations instead of five)."""
    d = a - b
    np.add(d, _M61, out=d, where=b > a)
    return d


def _pow_array(base: int, n: int) -> np.ndarray:
    """[base^0 … base^(n-1)] mod M by doubling — O(log n) vector steps."""
    out = np.empty(max(n, 1), dtype=np.uint64)
    out[0] = 1
    k = 1
    while k < n:
        step = min(k, n - k)
        bk = np.uint64(pow(base, k, _FP_MOD))
        out[k:k + step] = _m61_mul(out[:step], bk)
        k += step
    return out[:n]


_POW_CACHE: dict[int, np.ndarray] = {}


def _pow_cached(base: int, n: int) -> np.ndarray:
    """Power arrays are pure functions of (base, index): grow a
    module-level cache geometrically and slice — recomputing (and
    re-faulting) two chunk-sized arrays per Arrow batch was a real cost."""
    arr = _POW_CACHE.get(base)
    if arr is None or len(arr) < n:
        size = max(n, 1 << 12, 0 if arr is None else 2 * len(arr))
        arr = _pow_array(base, size)
        _POW_CACHE[base] = arr
    return arr[:n]


def _fingerprint_chunk(datas: list[bytes], window: int) -> np.ndarray:
    lens = np.array([len(d) for d in datas], dtype=np.int64)
    out = np.zeros(len(datas), dtype=np.uint64)
    if lens.sum() == 0:
        return out
    big = np.frombuffer(b"".join(datas), dtype=np.uint8).astype(np.uint64)
    n = len(big)
    starts = np.concatenate(([0], np.cumsum(lens)))[:-1]
    ends = starts + lens
    bpow = _pow_cached(_FP_BASE, n)
    binv = _pow_cached(_FP_BASE_INV, n)
    # a_g = d_g · B^{-g}: the byte side is < 2^8, so a cheap split of
    # the inverse power replaces the general 15-op modmul
    a = _m61_shift32(big * (binv >> _S32), in_place=True)
    a += big * (binv & np.uint64(0xFFFFFFFF))
    _m61_reduce(a, in_place=True)
    # limb-split cumulative sum: each limb stays far below 2^64 for any
    # realistic chunk (n ≤ 2^22 bytes → hi < 2^51, lo < 2^54)
    lo = np.cumsum(a & np.uint64(0xFFFFFFFF), dtype=np.uint64)
    hi = np.cumsum(a >> np.uint64(32), dtype=np.uint64)
    t = _m61_shift32(_m61_reduce(hi, in_place=True), in_place=True)
    t += _m61_reduce(lo, in_place=True)
    _m61_reduce(t, in_place=True)
    tpad = np.concatenate((np.zeros(1, dtype=np.uint64), t))  # T_{g-1}
    # sliding windows (docs longer than `window`): hall[j] is the hash
    # of the window ending at byte j+window-1 — computed over the WHOLE
    # concatenation with contiguous slices (no gather); windows that
    # straddle a doc boundary land in the discarded odd reduceat
    # segments. hall index j for doc d's windows spans exactly
    # [starts[d], ends[d]-window+1).
    m = n - window + 1
    long_idx = np.nonzero(lens > window)[0]
    if m > 0 and len(long_idx):
        hall = _m61_mul(bpow[window - 1:], _m61_sub(t[window - 1:],
                                                    tpad[:m]))
        bounds = np.empty(2 * len(long_idx), dtype=np.int64)
        bounds[0::2] = starts[long_idx]
        bounds[1::2] = ends[long_idx] - window + 1
        if bounds[-1] >= len(hall):     # reduceat indices must be < len
            bounds = bounds[:-1]        # last segment then runs to end
        red = np.maximum.reduceat(hall, bounds)
        out[long_idx] = red[0::2]
    # short docs (0 < len ≤ window): one whole-doc hash each
    sh = np.nonzero((lens > 0) & (lens <= window))[0]
    if len(sh):
        gl = ends[sh] - 1
        out[sh] = _m61_mul(bpow[gl], _m61_sub(t[gl], tpad[starts[sh]]))
    return out


def fingerprint_batch(texts, window: int = 64) -> np.ndarray:
    """Vectorized fingerprint() over a sequence of texts → int64 array.
    Chunked so the numpy working set stays bounded regardless of the
    Arrow batch size."""
    datas = [(t if isinstance(t, str) else "").encode(
        "utf-8", errors="replace") for t in texts]
    out = np.zeros(len(datas), dtype=np.uint64)
    i = 0
    while i < len(datas):
        j, total = i, 0
        while j < len(datas) and (total == 0 or
                                  total + len(datas[j]) <= _BATCH_BYTES):
            total += len(datas[j])
            j += 1
        out[i:j] = _fingerprint_chunk(datas[i:j], window)
        i = j
    return out.astype(np.int64)


def fingerprint_udf(window: int = 64):
    @F.pandas_udf("long")
    def _fp(text: pd.Series) -> pd.Series:
        vals = fingerprint_batch(
            [str(t) if t is not None else "" for t in text], window)
        return pd.Series(vals, dtype="int64")

    return _fp


# ----------------------------------------------------------------------
# corpus vocabulary statistics — pure Catalyst (the frequency-rank
# scoring used by LLM-data curation pipelines in place of a full LM:
# documents dominated by rare/OOV tokens score as low-quality)
# ----------------------------------------------------------------------

def _words(text_col: str) -> Column:
    return F.split(F.lower(F.trim(F.col(text_col))), r"\s+")


def vocab_top_k(docs: DataFrame, k: int = 1000,
                text_col: str = "text") -> DataFrame:
    """→ (word, n, rank): the corpus's k most frequent lowercased
    whitespace tokens, rank 1 = most frequent, ties broken by word.
    The global top-k is a TakeOrdered (bounded by k, no full sort);
    the row_number window then runs over k rows only — driver-sized
    by construction, never corpus-sized."""
    counts = (docs.select(F.explode(_words(text_col)).alias("word"))
              .filter(F.col("word") != "")
              .groupBy("word").agg(F.count("*").alias("n")))
    from pyspark.sql import Window
    top = counts.orderBy(F.desc("n"), F.asc("word")).limit(k)
    w = Window.orderBy(F.desc("n"), F.asc("word"))
    return top.withColumn("rank", F.row_number().over(w))


def doc_vocab_stats(docs: DataFrame, k: int = 1000,
                    id_col: str = "doc_id",
                    text_col: str = "text") -> DataFrame:
    """→ (doc_id, n_tokens, n_oov, oov_ratio, mean_rank): per-document
    vocabulary profile against the corpus top-k vocab. All counters are
    exact integers; the two doubles are single divisions of exact
    integers (IEEE-deterministic, so the DuckDB oracle reproduces them
    bit-for-bit — no cross-row float accumulation anywhere).

    Shuffle profile at scale: one token explode feeding a partial
    (map-side) aggregation keyed by doc_id; the vocab joins broadcast
    (k rows). No all-pairs work, no corpus-sized collect."""
    vocab = vocab_top_k(docs, k, text_col)
    toks = (docs.select(F.col(id_col).alias("doc_id"),
                        F.explode(_words(text_col)).alias("word"))
            .filter(F.col("word") != ""))
    j = toks.join(F.broadcast(vocab.select("word", "rank")), "word",
                  "left")
    agg = j.groupBy("doc_id").agg(
        F.count("*").alias("n_tokens"),
        F.sum(F.when(F.col("rank").isNull(), 1).otherwise(0))
        .alias("n_oov"),
        F.sum("rank").alias("_rank_sum"),
        F.count("rank").alias("_n_invocab"))
    return agg.select(
        "doc_id", "n_tokens", "n_oov",
        (F.col("n_oov").cast("double") / F.col("n_tokens"))
        .alias("oov_ratio"),
        F.when(F.col("_n_invocab") > 0,
               F.col("_rank_sum").cast("double") / F.col("_n_invocab"))
        .alias("mean_rank"))


def source_stats(docs: DataFrame, id_col: str = "doc_id",
                 text_col: str = "text") -> DataFrame:
    """→ per-source corpus health report: (source, n_docs, total_chars,
    mean_chars, n_langs, n_distinct_texts). One groupBy on the source
    key (partial aggregation applies); the distinct-text count goes
    through md5 so the text itself never rides the shuffle."""
    return (docs.select(
        "source", F.col(id_col),
        F.length(F.col(text_col)).cast("bigint").alias("_chars"),
        F.col("lang"),
        F.md5(F.col(text_col)).alias("_h"))
        .groupBy("source").agg(
            F.count("*").alias("n_docs"),
            F.sum("_chars").alias("total_chars"),
            (F.sum("_chars").cast("double") / F.count("*"))
            .alias("mean_chars"),
            F.countDistinct("lang").alias("n_langs"),
            F.countDistinct("_h").alias("n_distinct_texts")))


def with_text_features(docs: DataFrame, text_col: str = "text") -> DataFrame:
    """documents(text, …) → + token counts, quality features, lang_pred,
    fingerprint. One projection; native expressions stay fused in one
    codegen stage, the two UDF columns share one Arrow pass each."""
    from nipper_spark.operators.parallelism import ensure_min_parallelism
    c = F.col(text_col)
    return ensure_min_parallelism(docs).select(
        "*",
        whitespace_token_count(c),
        bpe_ish_token_count(c),
        *quality_columns(c),
        quality_score(c),
        lang_id_udf()(c).alias("lang_pred"),
        fingerprint_udf()(c).alias("fingerprint"),
    )
