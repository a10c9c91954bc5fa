"""Deduplication operators: exact, MinHash+LSH, SimHash, n-gram
Jaccard, embedding-cosine near-dup.

Shapes chosen for 100 TB, not for 60k rows:

- exact dedup is a hash-groupBy (one shuffle on a 16-byte key, never
  on the text itself);
- MinHash signatures are computed in one Arrow pass (numpy, vectorized
  over shingle hash matrices); LSH banding turns all-pairs similarity
  into an equi-join on (band, band_hash) — candidate pairs only, then
  exact Jaccard verification on the candidates;
- SimHash gives 64-bit sketches; near-dup candidates come from k-bit
  prefix bucketing (table-scale Hamming search without a cross join);
- embedding near-dup reuses the ANN module's LSH bucketing.

Every candidate-generation step is an equi-join Catalyst can shuffle
on a small key; no operator ever cross-joins the corpus.
"""

from __future__ import annotations

import hashlib

import numpy as np
import pandas as pd
from pyspark.sql import DataFrame
from pyspark.sql import functions as F

from nipper_spark.operators.parallelism import ensure_min_parallelism

# ----------------------------------------------------------------------
# exact dedup — pure Catalyst
# ----------------------------------------------------------------------

def normalized_text(col) -> "F.Column":
    """Whitespace-collapse + lowercase: the exact-dup equivalence class."""
    c = F.col(col) if isinstance(col, str) else col
    return F.lower(F.regexp_replace(F.trim(c), r"\s+", " "))


def exact_dup_groups(docs: DataFrame, id_col: str = "doc_id",
                     text_col: str = "text") -> DataFrame:
    """→ (text_hash, n_dups, keep_id, dup_ids): groups with >1 member.
    Shuffles md5 keys + ids only — the text never moves."""
    h = ensure_min_parallelism(docs).select(
        F.col(id_col).alias("doc_id"),
        F.md5(normalized_text(text_col)).alias("text_hash"))
    return (h.groupBy("text_hash")
            .agg(F.count("*").alias("n_dups"),
                 F.min("doc_id").alias("keep_id"),
                 F.sort_array(F.collect_list("doc_id")).alias("dup_ids"))
            .filter(F.col("n_dups") > 1))


def dedup_exact(docs: DataFrame, id_col: str = "doc_id",
                text_col: str = "text") -> DataFrame:
    """Keep min-id representative per equivalence class (deterministic,
    no dropDuplicates — its survivor choice is partition-order-dependent)."""
    w_hash = F.md5(normalized_text(text_col)).alias("_h")
    ranked = (ensure_min_parallelism(docs).select(F.col(id_col), w_hash)
              .groupBy("_h").agg(F.min(F.col(id_col)).alias(id_col)))
    return docs.join(ranked, on=id_col, how="left_semi")


# ----------------------------------------------------------------------
# shingles + MinHash + LSH
# ----------------------------------------------------------------------

_MERSENNE = (1 << 61) - 1

# polynomial-combine multiplier + splitmix64 finalizer constants
# (public-domain splitmix64 mixing function)
_POLY_C = np.uint64(0x9E3779B97F4A7C15)
_MIX1 = np.uint64(0xBF58476D1CE4E5B9)
_MIX2 = np.uint64(0x94D049BB133111EB)


def _splitmix64(x: np.ndarray) -> np.ndarray:
    """Vectorized splitmix64 finalizer: diffuses polynomial-hash bits so
    every one of the 64 simhash bit positions is unbiased."""
    z = x + _POLY_C
    z = (z ^ (z >> np.uint64(30))) * _MIX1
    z = (z ^ (z >> np.uint64(27))) * _MIX2
    return z ^ (z >> np.uint64(31))


def _word_hashes(words: list[str], cache: dict | None = None) -> np.ndarray:
    """Stable 64-bit hash per word (blake2b, process-independent).
    ``cache`` amortizes hashing across the documents of one Arrow batch
    — the per-shingle Python loop this replaces was the extraction-path
    CPU hot spot (one blake2b per *n-gram*; now one per unique word)."""
    out = np.empty(len(words), dtype=np.uint64)
    if cache is None:
        cache = {}
    for i, w in enumerate(words):
        v = cache.get(w)
        if v is None:
            v = int.from_bytes(
                hashlib.blake2b(w.encode(), digest_size=8).digest(), "big")
            cache[w] = v
        out[i] = v
    return out


def _shingle_hashes(text: str, n: int, cache: dict | None = None) -> np.ndarray:
    """Word n-gram shingles → stable 64-bit hashes.

    Hash = splitmix64(polynomial-combine of the window's word hashes):
    equal n-grams hash equal, distinct n-grams collide with ~2^-64
    probability, and the combine is one vectorized numpy pass over all
    windows (no per-shingle Python loop, no per-shingle blake2b)."""
    words = text.lower().split()
    wh = _word_hashes(words, cache)
    if len(words) == 0:
        return _splitmix64(np.zeros(1, dtype=np.uint64))
    k = min(n, len(words))          # short docs: one window of all words
    m = len(words) - k + 1
    acc = np.zeros(m, dtype=np.uint64)
    for j in range(k):              # k is the (tiny) n-gram width
        acc = acc * _POLY_C + wh[j:j + m]
    return _splitmix64(acc)


def _minhash_params(num_perm: int, seed: int = 42):
    rng = np.random.RandomState(seed)
    a = rng.randint(1, _MERSENNE, size=num_perm, dtype=np.uint64)
    b = rng.randint(0, _MERSENNE, size=num_perm, dtype=np.uint64)
    return a, b


_M61 = np.uint64(_MERSENNE)
_S61 = np.uint64(61)


def _mod_m61(x: np.ndarray) -> np.ndarray:
    """``x % (2^61 - 1)`` for any uint64 ``x`` via Mersenne folding:
    x = hi·2^61 + lo ≡ hi + lo (mod M), and hi + lo < 2^61 + 7 needs at
    most one subtract. Exactly equal to ``%`` for every input (pinned
    by test), ~6 cheap vector ops instead of a hardware divide per
    element — the divide was the dominant per-element cost of the
    signature kernel."""
    y = (x & _M61) + (x >> _S61)
    return np.where(y >= _M61, y - _M61, y)


def minhash_signature(text: str, num_perm: int, ngram: int,
                      params=None, cache: dict | None = None) -> list[int]:
    """num_perm-wide MinHash signature over word-ngram shingles; one
    numpy (num_perm × n_shingles) pass per document."""
    a, b = params if params is not None else _minhash_params(num_perm)
    sh = _shingle_hashes(text, ngram, cache)
    if len(sh) == 0:
        return [0] * num_perm
    # (P,1)*(1,S) mod mersenne — uint64 wraparound is fine for min
    vals = _mod_m61(a[:, None] * sh[None, :] + b[:, None])
    return vals.min(axis=1).astype(np.int64).tolist()


# bound on the (num_perm × shingles) working set of one vectorized
# minhash pass: 2^11 shingles × 64 perms × 8 B ≈ 1 MB per temporary —
# L2-resident. Measured on the bench corpus shape: 2048 beats 65536 by
# 1.35x (the big-matrix variant is DRAM-bandwidth-bound; the chunked
# one streams from cache), and both beat per-document dispatch.
_SIG_CHUNK_SHINGLES = 1 << 11
# below this many documents the batched kernels' fixed per-batch costs
# (concatenate, offset bookkeeping, reduceat dispatch) outweigh the
# amortization and the fold-accelerated per-document loop wins
# (measured: batch is 0.81-0.84x at 128-256 docs, even at ~1k, ahead
# at the 4096-row Arrow cap) — small batches take the scalar path,
# which is bit-identical by the shared per-element formulas
_BATCH_MIN_DOCS = 1024


def minhash_signatures_batch(texts, num_perm: int, ngram: int,
                             params=None,
                             cache: dict | None = None) -> np.ndarray:
    """Vectorized twin of :func:`minhash_signature` over a whole Arrow
    batch → (n_docs × num_perm) int64 array, bit-identical per row.

    The scalar path pays its cost in per-document numpy dispatch (a
    (P × S_d) matrix build + mod per ~50-shingle document — measured
    0.45 ms/doc, 22.7 task-seconds for 50 k docs): here the documents'
    shingle arrays are concatenated and ONE (P × ΣS) multiply-add-mod
    feeds ``np.minimum.reduceat`` at the document offsets. Chunked so
    the temporary stays ~33 MB regardless of batch size. Exactness:
    the per-element formula and the per-document min are unchanged —
    only the loop structure differs (pinned by the batch==scalar
    test)."""
    a, b = params if params is not None else _minhash_params(num_perm)
    if cache is None:
        cache = {}
    n_docs = len(texts)
    out = np.empty((n_docs, num_perm), dtype=np.int64)
    if n_docs == 0:
        return out
    if n_docs < _BATCH_MIN_DOCS:
        for i, t in enumerate(texts):
            out[i] = minhash_signature(t, num_perm, ngram, (a, b),
                                       cache)
        return out
    shs = [_shingle_hashes(t, ngram, cache) for t in texts]
    lens = np.fromiter((len(s) for s in shs), dtype=np.int64,
                       count=n_docs)
    starts = np.concatenate(([0], np.cumsum(lens)))
    flat = np.concatenate(shs)
    d0 = 0
    while d0 < n_docs:
        d1 = d0 + 1
        while d1 < n_docs and \
                starts[d1 + 1] - starts[d0] <= _SIG_CHUNK_SHINGLES:
            d1 += 1
        seg = flat[starts[d0]:starts[d1]]
        vals = _mod_m61(a[:, None] * seg[None, :] + b[:, None])
        offs = starts[d0:d1] - starts[d0]
        out[d0:d1] = np.minimum.reduceat(vals, offs, axis=1) \
            .T.astype(np.int64)
        d0 = d1
    return out


def minhash_udf(num_perm: int = 64, ngram: int = 3, seed: int = 42):
    params = _minhash_params(num_perm, seed)

    @F.pandas_udf("array<long>")
    def _mh(text: pd.Series) -> pd.Series:
        cache: dict = {}  # word-hash cache shared across the Arrow batch
        sigs = minhash_signatures_batch(
            [str(t) if t is not None else "" for t in text],
            num_perm, ngram, params, cache)
        return pd.Series(list(sigs))

    return _mh


def ngram_jaccard(a: str, b: str, ngram: int = 3,
                  cache: dict | None = None) -> float:
    """Exact word-ngram Jaccard — the verifier behind MinHash/LSH."""
    sa = set(_shingle_hashes(a, ngram, cache).tolist())
    sb = set(_shingle_hashes(b, ngram, cache).tolist())
    inter = len(sa & sb)
    return inter / (len(sa) + len(sb) - inter)


def _jaccard_verify_udf(ngram: int):
    """The exact-Jaccard pair verifier as a pandas UDF. A document in a
    hot near-dup cluster appears in MANY candidate pairs of one Arrow
    batch — its shingle SET is memoized per batch (keyed by the text),
    so each distinct text is shingled once, not once per pair. Same
    values as :func:`ngram_jaccard` (same kernel, same str() coercion).

    Deterministic, but marked nondeterministic so Catalyst cannot
    substitute the UDF into the pushed-down threshold filter and
    evaluate the (expensive) verify twice per pair."""
    @F.pandas_udf("double")
    def _jac(ta: pd.Series, tb: pd.Series) -> pd.Series:
        cache: dict = {}
        sets: dict = {}

        def sset(t: str) -> set:
            s = sets.get(t)
            if s is None:
                s = set(_shingle_hashes(t, ngram, cache).tolist())
                sets[t] = s
            return s

        out = []
        for x, y in zip(ta, tb):
            sa, sb = sset(str(x)), sset(str(y))
            inter = len(sa & sb)
            out.append(inter / (len(sa) + len(sb) - inter))
        return pd.Series(out)

    return _jac.asNondeterministic()


def bucket_candidate_pairs(members: list, max_bucket: int = 0):
    """THE definition of capped within-bucket candidate generation —
    the distributed path (`_capped_candidates`) and every single-
    threaded oracle twin route through this one kernel.

    For a bucket of sorted member ids: all C(B,2) pairs when B is
    within ``max_bucket``; above the cap, STAR edges
    ``(min_id, other)`` only — B−1 rows instead of B²/2. Downstream
    near-dup clustering (``connected_components``) needs connectivity,
    not the full clique, and a bucket that large is a mass-duplicate
    flood (parked-domain boilerplate, empty templates) where every
    member matches the hub anyway. ``max_bucket <= 0`` disables the
    cap. Yields (a, b) with a < b."""
    members = sorted(members)
    if max_bucket > 0 and len(members) > max_bucket:
        hub = members[0]
        for m in members[1:]:
            yield (hub, m)
        return
    for x in range(len(members)):
        for y in range(x + 1, len(members)):
            yield (members[x], members[y])


def _capped_candidates(items: DataFrame, key_cols: list,
                       max_bucket: int,
                       payload_cols: list | None = None) -> DataFrame:
    """Distributed twin of `bucket_candidate_pairs`: ``items`` carries
    (``id`` + bucket key columns); returns (id_a, id_b), id_a < id_b.

    ONE exchange, ONE pass over the input: groupBy the bucket key,
    ``collect_list`` the sorted members, and expand pairs with pure
    Catalyst array lambdas (nested ``transform``/``slice``) — the same
    sorted-members-then-emit shape as `bucket_candidate_pairs`.
    Buckets within the cap expand all C(B,2) pairs; oversized buckets
    emit star edges to the bucket min — candidate volume is O(B) per
    hot bucket, not O(B²). Without the cap, one band signature shared
    by 10⁶ near-identical web pages emits 5·10¹¹ candidate rows before
    any verify runs. A window + self-join formulation was measurably
    worse: the self-join's two branches (plus the star branch) each
    re-evaluate the upstream subtree, so a sketch pandas UDF feeding
    this ran 3× per action (Spark does not reuse the exchange across
    the branches).

    ``payload_cols``: small per-id columns (a sketch, never the text)
    carried through to the output as ``{p}_a``/``{p}_b`` so callers
    whose verify needs only the sketch skip two join-backs against the
    corpus. Payloads ride the member structs; the pair SET is
    identical with or without them (payload is a function of id).

    Memory shape: the agg buffer holds one bucket's (id, payloads)
    structs — O(B) small rows, never the documents; the same bound the
    window formulation had. With the cap on, the expanded pair array
    is also O(min(B, cap²))."""
    payload_cols = payload_cols or []
    member = F.struct(F.col("id"), *[F.col(p) for p in payload_cols])
    grouped = (items.groupBy(*key_cols)
               .agg(F.sort_array(F.collect_list(member)).alias("m")))
    # all pairs (x_i, y_j), j > i, over the sorted member array —
    # slice() takes 1-based start; over-long length clips at the end
    allp = F.flatten(F.transform(
        "m", lambda x, i: F.transform(
            F.slice("m", i + F.lit(2), F.size("m")),
            lambda y: F.struct(x.alias("a"), y.alias("b")))))
    if max_bucket > 0:
        star = F.transform(
            F.slice("m", 2, F.size("m")),
            lambda y: F.struct(F.element_at("m", 1).alias("a"),
                               y.alias("b")))
        arr = F.when(F.size("m") > max_bucket, star).otherwise(allp)
    else:
        arr = allp
    pairs = (grouped.select(F.explode(arr).alias("p"))
             .select(F.col("p.a.id").alias("id_a"),
                     F.col("p.b.id").alias("id_b"),
                     *[F.col(f"p.a.{p}").alias(f"{p}_a")
                       for p in payload_cols],
                     *[F.col(f"p.b.{p}").alias(f"{p}_b")
                       for p in payload_cols]))
    return pairs.dropDuplicates(["id_a", "id_b"])


def minhash_lsh_candidates(docs: DataFrame, id_col: str = "doc_id",
                           text_col: str = "text", num_perm: int = 64,
                           bands: int = 16, ngram: int = 3,
                           seed: int = 42,
                           max_bucket: int = 64) -> DataFrame:
    """Unverified LSH candidate pairs (id_a, id_b) — exposed so tests
    and the bench can pin candidate VOLUME (the hot-bucket O(B) bound)
    separately from Jaccard verification."""
    rows_per_band = num_perm // bands
    # narrow scans (one row group) would run the signature UDF — the
    # dominant CPU of this operator — on 1-2 cores (guide §2.5)
    sig = ensure_min_parallelism(docs).select(
        F.col(id_col).alias("id"),
        minhash_udf(num_perm, ngram, seed)(F.col(text_col)).alias("sig"))
    # candidate generation carries (id, band, band_sig) ONLY — at corpus
    # scale the text must never ride the banded explode (it would put
    # bands× copies of the corpus through the shuffle)
    banded = sig.select(
        "id",
        F.posexplode(F.transform(
            F.sequence(F.lit(0), F.lit(bands - 1)),
            lambda b: F.slice("sig", b * rows_per_band + 1, rows_per_band)
        )).alias("band", "band_sig"))
    # join directly on the band signature array: Catalyst hashes array
    # keys for the shuffle, and candidates stay exactly reproducible by
    # a single-threaded oracle (no engine-private hash in the semantics)
    return _capped_candidates(banded, ["band", "band_sig"], max_bucket)


def minhash_lsh_pairs(docs: DataFrame, id_col: str = "doc_id",
                      text_col: str = "text", num_perm: int = 64,
                      bands: int = 16, ngram: int = 3,
                      threshold: float = 0.5,
                      seed: int = 42,
                      max_bucket: int = 64) -> DataFrame:
    """Near-dup pairs via MinHash → LSH banding → exact verification.

    shuffle profile: explode to B rows/doc keyed by (band, hash of the
    band's rows) → groupBy that small key → within-bucket pairs
    (star edges above ``max_bucket`` — see `bucket_candidate_pairs`) →
    verified with exact Jaccard recomputed from the two texts.
    Output: (id_a, id_b, jaccard) with id_a < id_b, jaccard ≥ threshold.
    """
    cand = minhash_lsh_candidates(docs, id_col, text_col, num_perm,
                                  bands, ngram, seed, max_bucket)
    # fetch the two texts back by id for the exact-Jaccard verify:
    # candidates ≪ corpus, so this joins a small pair table against the
    # docs scan twice instead of exploding the corpus text bands× times
    texts = docs.select(F.col(id_col).alias("id"),
                        F.col(text_col).alias("text"))
    pairs = (cand
             .join(texts.withColumnRenamed("id", "id_a")
                        .withColumnRenamed("text", "text_a"), "id_a")
             .join(texts.withColumnRenamed("id", "id_b")
                        .withColumnRenamed("text", "text_b"), "id_b"))

    _jac = _jaccard_verify_udf(ngram)

    return (pairs
            .withColumn("jaccard", _jac("text_a", "text_b"))
            .filter(F.col("jaccard") >= threshold)
            .select("id_a", "id_b", "jaccard"))


def ngram_jaccard_pairs(docs: DataFrame, id_col: str = "doc_id",
                        text_col: str = "text", ngram: int = 3,
                        threshold: float = 0.8,
                        block_words: int = 5,
                        max_bucket: int = 64) -> DataFrame:
    """Exact n-gram-Jaccard near-dup pairs with prefix blocking.

    Blocking: only documents sharing their first ``block_words``
    (lowercased) words are compared — an equi-join on a small key, so
    the corpus is never cross-joined. Recall is bounded by the blocker
    (documents differing in their opening words are not compared);
    MinHash+LSH is the recall-oriented path, this is the cheap
    high-precision one. Common openings ("lorem ipsum…", cookie
    banners) make quadratic blocks — ``max_bucket`` caps them with
    star edges (see `bucket_candidate_pairs`).

    Output: (id_a, id_b, jaccard), id_a < id_b, jaccard ≥ threshold.
    """
    key = F.lower(F.concat_ws(
        " ", F.slice(F.split(F.trim(F.col(text_col)), r"\s+"), 1,
                     block_words))).alias("block_key")
    t = docs.select(F.col(id_col).alias("id"), key)
    cand = _capped_candidates(t, ["block_key"], max_bucket)
    # same join-back shape as minhash_lsh_pairs: the block self-join
    # shuffles (id, block_key) only, never the text
    texts = docs.select(F.col(id_col).alias("id"),
                        F.col(text_col).alias("text"))
    pairs = (cand
             .join(texts.withColumnRenamed("id", "id_a")
                        .withColumnRenamed("text", "text_a"), "id_a")
             .join(texts.withColumnRenamed("id", "id_b")
                        .withColumnRenamed("text", "text_b"), "id_b"))

    _jac = _jaccard_verify_udf(ngram)

    return (pairs.withColumn("jaccard", _jac("text_a", "text_b"))
            .filter(F.col("jaccard") >= threshold)
            .select("id_a", "id_b", "jaccard"))


# ----------------------------------------------------------------------
# SimHash
# ----------------------------------------------------------------------

def simhash(text: str, ngram: int = 2, cache: dict | None = None) -> int:
    """64-bit SimHash over word-ngram shingles (sign of per-bit sums).

    The per-bit sum is signed: ``bits*2 - n_shingles`` goes negative for
    minority bits, so the arithmetic must leave uint64 BEFORE the
    subtraction — in uint64 it wraps to huge positives and every bit
    reads as majority-1 (all documents then hash near-identical and the
    chunk equi-join degenerates toward a cross join)."""
    sh = _shingle_hashes(text, ngram, cache)
    if len(sh) == 0:
        return 0
    bits = ((sh[:, None] >> np.arange(64, dtype=np.uint64)[None, :]) & 1)
    sums = bits.sum(axis=0).astype(np.int64) * 2 - len(sh)
    v = int(((sums > 0).astype(np.uint64)
             << np.arange(64, dtype=np.uint64)).sum())
    return v - (1 << 64) if v >= (1 << 63) else v


def simhash_batch(texts, ngram: int = 2,
                  cache: dict | None = None) -> np.ndarray:
    """Vectorized twin of :func:`simhash` over a whole batch → int64
    array, bit-identical per row. Same shape of win as
    `minhash_signatures_batch`: the shingle arrays concatenate, ONE
    (ΣS × 64) bit expansion feeds ``np.add.reduceat`` at the document
    offsets, and the per-document sign/pack step is a (D × 64) pass.
    int64 sums (not uint8) so long documents cannot overflow a bit
    counter; chunked to keep the bit matrix ~33 MB."""
    if cache is None:
        cache = {}
    n_docs = len(texts)
    out = np.empty(n_docs, dtype=np.int64)
    if n_docs == 0:
        return out
    if n_docs < _BATCH_MIN_DOCS:
        for i, t in enumerate(texts):
            out[i] = simhash(t, ngram, cache)
        return out
    shs = [_shingle_hashes(t, ngram, cache) for t in texts]
    lens = np.fromiter((len(s) for s in shs), dtype=np.int64,
                       count=n_docs)
    starts = np.concatenate(([0], np.cumsum(lens)))
    flat = np.concatenate(shs)
    shifts = np.arange(64, dtype=np.uint64)
    d0 = 0
    while d0 < n_docs:
        d1 = d0 + 1
        while d1 < n_docs and \
                starts[d1 + 1] - starts[d0] <= _SIG_CHUNK_SHINGLES:
            d1 += 1
        seg = flat[starts[d0]:starts[d1]]
        bits = ((seg[:, None] >> shifts[None, :])
                & np.uint64(1)).astype(np.int64)
        offs = starts[d0:d1] - starts[d0]
        sums = np.add.reduceat(bits, offs, axis=0) * 2 \
            - lens[d0:d1, None]
        v = ((sums > 0).astype(np.uint64)
             << shifts[None, :]).sum(axis=1, dtype=np.uint64)
        out[d0:d1] = v.view(np.int64)  # two's complement == the
        d0 = d1                        # scalar path's v - 2^64 fixup
    return out


def simhash_udf(ngram: int = 2):
    @F.pandas_udf("long")
    def _sh(text: pd.Series) -> pd.Series:
        cache: dict = {}
        vals = simhash_batch(
            [str(t) if t is not None else "" for t in text], ngram,
            cache)
        return pd.Series(vals, dtype="int64")

    return _sh


def connected_components(pairs: DataFrame,
                         max_iter: int = 50) -> DataFrame:
    """(id_a, id_b) edges → (id, component) with component = min id
    reachable — the clustering step between near-dup PAIRS and a
    one-survivor-per-cluster dedup decision.

    Each round does min-label propagation (min over neighbors'
    labels) AND pointer jumping (label ← label-of-label): both steps
    only ever lower a node's label to the label of a node in the same
    component, so the fixpoint is exactly min-reachable-id (the
    union-find answer); the pointer jump makes convergence O(log
    diameter) rounds instead of O(diameter), so a near-dup CHAIN of
    incrementally-edited pages (a path graph) converges in ~log2(len)
    rounds. Only nodes that appear in an edge participate (everything
    else is its own singleton component by definition) — so at 100 TB
    the iteration state is pair-table-sized, never corpus-sized.
    Convergence is detected with an aggregate (count of changed
    labels), no driver-side collect of labels; exhausting ``max_iter``
    without converging RAISES rather than silently returning labels
    that would diverge from the union-find oracle. The label table is
    localCheckpoint'ed EVERY round: the pointer-jump self-join triples
    the logical plan per round, and Catalyst re-analyzes the full tree
    even over cached data (measured: seconds of pure analysis by round
    2 without truncation). The checkpointed table is pair-table-sized,
    so materialization is the cheap side of that trade, and block loss
    can replay at most one round.

    The returned DataFrame carries ``cc_rounds`` (int) for tests."""
    edges = pairs.select(F.col("id_a").alias("a"), F.col("id_b").alias("b"))
    # localCheckpoint, not cache: a cached edge table still EMBEDS the
    # upstream plan (the whole LSH candidate pipeline), and every one
    # of the O(log D) round queries would re-canonicalize that tree
    # during analysis/cache-lookup — per-round driver cost must depend
    # on the round's plan, not on how the pairs were produced
    edges = (edges.unionByName(edges.select(F.col("b").alias("a"),
                                            F.col("a").alias("b")))
             .distinct().localCheckpoint())
    labels = (edges.select(F.col("a").alias("id")).distinct()
              .withColumn("component", F.col("id")).localCheckpoint())
    rounds = 0
    converged = False
    from pyspark.sql import Observation
    for it in range(max_iter):
        rounds = it + 1
        neigh = (edges.join(labels.select(F.col("id").alias("b"),
                                          F.col("component").alias("nc")),
                            "b")
                 .groupBy("a").agg(F.min("nc").alias("min_nc")))
        # cache the half-step: the pointer jump self-joins it (two plan
        # references — uncached, the neighbor-min subtree would compute
        # twice AND the logical plan would double every round)
        stepped = (labels.join(neigh.withColumnRenamed("a", "id"),
                               "id", "left")
                   .select("id", F.col("component").alias("_old"),
                           F.least("component",
                                   F.coalesce("min_nc", "component"))
                           .alias("component")).cache())
        # pointer jump: component ← stepped-label OF the component node.
        # Labels start as self-ids and only ever take values of reachable
        # node ids, so label(label(u)) ≤ label(u) and stays in-component.
        # The convergence counter rides an Observation on the
        # materializing checkpoint — one job per round, not two.
        obs = Observation()
        new_labels = (stepped.alias("s")
                      .join(stepped.select(
                          F.col("id").alias("component"),
                          F.col("component").alias("_jump")),
                          "component", "left")
                      .select("id", "_old",
                              F.coalesce("_jump", "component")
                              .alias("component"))
                      .observe(obs, F.sum((F.col("component") !=
                                           F.col("_old")).cast("long"))
                               .alias("changed"))
                      .drop("_old")
                      .localCheckpoint(eager=True))
        try:
            changed = int(obs.get["changed"] or 0)
        except Exception:  # noqa: BLE001 — AQE empty-relation pruning
            # can drop the CollectMetrics node on a degenerate (empty)
            # round; the recompute is tiny by construction then
            changed = (new_labels.alias("n")
                       .join(labels.alias("o"), "id")
                       .filter(F.col("n.component") !=
                               F.col("o.component")).count())
        stepped.unpersist()
        labels = new_labels  # old checkpoint blocks free with the ref
        if changed == 0:
            converged = True
            break
    if not converged:
        raise RuntimeError(
            f"connected_components did not converge in {max_iter} rounds "
            "(graph diameter > 2^rounds is implausible — check for label "
            "churn or raise max_iter)")
    labels.cc_rounds = rounds  # type: ignore[attr-defined]
    return labels


def near_dup_survivors(docs: DataFrame, pairs: DataFrame,
                       id_col: str = "doc_id") -> DataFrame:
    """Keep one document per near-dup cluster (the min id — same
    deterministic survivor rule as exact dedup): docs ANTI JOIN the
    non-minimal members of each connected component."""
    comp = connected_components(pairs)
    losers = comp.filter(F.col("id") != F.col("component")) \
        .select(F.col("id").alias(id_col))
    return docs.join(losers, on=id_col, how="left_anti")


def simhash_near_dups(docs: DataFrame, id_col: str = "doc_id",
                      text_col: str = "text", max_hamming: int = 3,
                      prefix_bits: int = 16, ngram: int = 2,
                      max_bucket: int = 64) -> DataFrame:
    """Near-dup pairs with Hamming(simhash) ≤ max_hamming.

    Candidates come from equality on each of the 4 16-bit chunks
    (pigeonhole: distance ≤ 3 ⇒ at least one of 4 chunks equal), so
    the join key is small and the corpus is never cross-joined; a
    chunk value shared by a mass-duplicate flood is capped to star
    edges by ``max_bucket`` (see `bucket_candidate_pairs`).
    Output: (id_a, id_b, hamming).
    """
    # see minhash_lsh_candidates: the sketch UDF must not be bound to a
    # narrow scan's task count
    sh = ensure_min_parallelism(docs).select(
        F.col(id_col).alias("id"),
        simhash_udf(ngram)(F.col(text_col)).alias("sim"))
    chunks = sh.select(
        "id", "sim",
        F.posexplode(F.array(*[
            F.shiftrightunsigned("sim", k * prefix_bits)
            .bitwiseAND(F.lit((1 << prefix_bits) - 1))
            for k in range(64 // prefix_bits)])).alias("chunk_no", "chunk"))
    # the 8-byte sketch rides the explode as a payload — join-backs by
    # id would re-run the simhash UDF over the corpus once per branch
    cand = _capped_candidates(chunks, ["chunk_no", "chunk"], max_bucket,
                              payload_cols=["sim"])
    hamming = F.bit_count(F.col("sim_a").bitwiseXOR(F.col("sim_b")))
    return (cand.withColumn("hamming", hamming)
            .filter(F.col("hamming") <= max_hamming)
            .select("id_a", "id_b", "hamming"))


# ----------------------------------------------------------------------
# paragraph-level exact dedup (CCNet-style) — pure Catalyst
# ----------------------------------------------------------------------

def dedup_paragraphs(docs: DataFrame, id_col: str = "doc_id",
                     text_col: str = "text",
                     with_text: bool = False) -> DataFrame:
    """Corpus-wide paragraph dedup (CCNet, Wenzek et al. 2020 §3.2):
    every paragraph (newline-split span) is kept only at its FIRST
    occurrence — the global min (doc_id, position) over its md5 — and
    dropped everywhere else, which strips cross-site boilerplate
    (cookie banners, footers) that survives page-level exact dedup.

    Scale shape: the paragraph TEXT never enters a shuffle. The plan
    exchanges only (doc_id, p_idx, 16-byte md5): winner-per-hash is a
    min-struct groupBy on the hash; winners regroup to a sorted kept-
    index array per doc (second small shuffle); the single wide join
    brings that index array back to the docs table by id, and the
    surviving text is rebuilt positionally with a higher-order filter
    over the original column. At 100 TB the two narrow exchanges are
    ~40 bytes/paragraph and the wide join is co-partitioned if the
    corpus is bucketed by id.

    Output: (id_col, n_paras, n_kept, clean_md5) where clean_md5
    hashes the surviving paragraphs rejoined by newline;
    ``with_text=True`` appends the surviving text itself as
    ``clean_text`` (for composites that keep processing the text).
    """
    paras = docs.select(
        F.col(id_col).alias("_did"),
        F.posexplode(F.split(F.col(text_col), "\n", -1))
        .alias("p_idx", "para"))
    hashed = paras.select("_did", "p_idx", F.md5("para").alias("ph"))
    winners = hashed.groupBy("ph").agg(
        F.min(F.struct("_did", "p_idx")).alias("w"))
    kept_idx = (hashed.join(winners, "ph")
                .filter((F.col("w._did") == F.col("_did"))
                        & (F.col("w.p_idx") == F.col("p_idx")))
                .groupBy("_did")
                .agg(F.sort_array(F.collect_list("p_idx"))
                     .alias("kept_idx")))
    joined = docs.join(kept_idx,
                       docs[id_col] == kept_idx["_did"], "left")
    arr = F.split(F.col(text_col), "\n", -1)
    kept = F.filter(arr, lambda p, i: F.array_contains(
        F.coalesce(F.col("kept_idx"), F.array()), i))
    cols = [F.col(id_col),
            F.size(arr).cast("int").alias("n_paras"),
            F.size(kept).cast("int").alias("n_kept"),
            F.md5(F.array_join(kept, "\n")).alias("clean_md5")]
    if with_text:
        cols.append(F.array_join(kept, "\n").alias("clean_text"))
    return joined.select(*cols)


def dedup_paragraphs_oracle(docs: list, with_text: bool = False) -> list:
    """Single-threaded twin of :func:`dedup_paragraphs`.

    ``docs`` is [(doc_id, text)]; iterating in ascending doc_id order
    with in-document position order makes first-seen == global
    min (doc_id, p_idx), the same winner rule as the distributed min-
    struct. Returns [(doc_id, n_paras, n_kept, clean_md5)], with the
    surviving text appended when ``with_text``.
    """
    seen: set = set()
    out = []
    for doc_id, text in sorted(docs):
        paras = text.split("\n")
        kept = []
        for p in paras:
            h = hashlib.md5(p.encode("utf-8")).hexdigest()
            if h in seen:
                continue
            seen.add(h)
            kept.append(p)
        clean = "\n".join(kept)
        row = (doc_id, len(paras), len(kept),
               hashlib.md5(clean.encode("utf-8")).hexdigest())
        out.append(row + (clean,) if with_text else row)
    return out


# ----------------------------------------------------------------------
# incremental near-dup dedup — new batch vs a persisted signature store
# ----------------------------------------------------------------------

def minhash_store(docs: DataFrame, id_col: str = "doc_id",
                  text_col: str = "text", num_perm: int = 64,
                  ngram: int = 3, seed: int = 42) -> DataFrame:
    """(id, sig) MinHash signature store — the state a rolling crawl
    persists between batches (a few hundred bytes per document; the
    text itself never needs to be retained for near-dup purposes)."""
    return ensure_min_parallelism(docs).select(
        F.col(id_col).alias("id"),
        minhash_udf(num_perm, ngram, seed)(F.col(text_col)).alias("sig"))


def minhash_lsh_incremental(new_docs: DataFrame, store: DataFrame,
                            id_col: str = "doc_id",
                            text_col: str = "text", num_perm: int = 64,
                            bands: int = 16, ngram: int = 3,
                            threshold: float = 0.5, seed: int = 42,
                            max_bucket: int = 64,
                            new_sig: DataFrame | None = None
                            ) -> DataFrame:
    """Near-dup pairs for an INCREMENTAL batch: each pair touches at
    least one new document (new-vs-store and new-vs-new; store-vs-
    store pairs were already emitted by earlier runs and are skipped).
    Verification is the MinHash ESTIMATE — matching signature
    positions — because the store deliberately holds no text; the
    integer rule ``10·matches ≥ round(10·threshold)·num_perm`` keeps
    the twin hash-exact.

    Scale shape: the production daily-crawl pattern. Band rows of
    (id, band, band_sig, is_new, sig) from the new batch UNION the
    store go through the SAME capped-bucket kernel as the full-corpus
    path (star edges above ``max_bucket``), so a boilerplate flood in
    the store cannot go quadratic against a new batch; the store's
    text is never touched, and candidate volume is O(new ∩ buckets),
    not O(|store|²).

    Output: (id_a, id_b, n_sig_matches), id_a < id_b.

    ``new_sig``: optionally a precomputed (id, sig) signature table for
    the new batch (e.g. a materialized `minhash_store` output a caller
    also persists as its state delta) — the signature UDF then runs
    once per batch instead of once per consumer.
    """
    if new_sig is None:
        new_sig = minhash_store(new_docs, id_col, text_col, num_perm,
                                ngram, seed)
    new_sig = new_sig.select("id", "sig", F.lit(True).alias("is_new"))
    old_sig = store.select("id", "sig", F.lit(False).alias("is_new"))
    rows_per_band = num_perm // bands
    banded = new_sig.unionByName(old_sig).select(
        "id", "sig", "is_new",
        F.posexplode(F.transform(
            F.sequence(F.lit(0), F.lit(bands - 1)),
            lambda b: F.slice("sig", b * rows_per_band + 1,
                              rows_per_band))).alias("band", "band_sig"))
    cand = _capped_candidates(banded, ["band", "band_sig"], max_bucket,
                              payload_cols=["sig", "is_new"])
    matches = F.aggregate(
        F.zip_with("sig_a", "sig_b",
                   lambda x, y: (x == y).cast("int")),
        F.lit(0), lambda acc, v: acc + v)
    min_tenths = int(round(threshold * 10))
    return (cand.filter(F.col("is_new_a") | F.col("is_new_b"))
            .withColumn("n_sig_matches", matches)
            .filter(10 * F.col("n_sig_matches")
                    >= min_tenths * num_perm)
            .select("id_a", "id_b", "n_sig_matches"))


def minhash_lsh_incremental_oracle(new_docs: list, store_docs: list,
                                   num_perm: int = 64, bands: int = 16,
                                   ngram: int = 3,
                                   threshold: float = 0.5,
                                   seed: int = 42,
                                   max_bucket: int = 64) -> list:
    """Single-threaded twin: same signature kernel
    (`minhash_signature`), same bucket kernel
    (`bucket_candidate_pairs`), same integer estimate rule. Inputs are
    [(doc_id, text)] for the new batch and the store."""
    rows_per_band = num_perm // bands
    params = _minhash_params(num_perm, seed)
    sigs = {}
    is_new = {}
    cache: dict = {}
    for flag, docs in ((True, new_docs), (False, store_docs)):
        for doc_id, text in docs:
            sigs[doc_id] = minhash_signature(text, num_perm, ngram,
                                             params, cache)
            is_new[doc_id] = flag
    buckets: dict = {}
    for doc_id, sig in sigs.items():
        for b in range(bands):
            key = (b, tuple(sig[b * rows_per_band:
                            (b + 1) * rows_per_band]))
            buckets.setdefault(key, []).append(doc_id)
    pairs = set()
    for members in buckets.values():
        pairs.update(bucket_candidate_pairs(members, max_bucket))
    min_tenths = int(round(threshold * 10))
    out = []
    for a, b in sorted(pairs):
        if not (is_new[a] or is_new[b]):
            continue
        m = int(sum(1 for x, y in zip(sigs[a], sigs[b]) if x == y))
        if 10 * m >= min_tenths * num_perm:
            out.append((a, b, m))
    return out


def seen_text_hashes(docs: DataFrame, id_col: str = "doc_id",
                     text_col: str = "text") -> DataFrame:
    """(text_hash) store for incremental EXACT dedup — md5 of the
    normalized text, distinct; 16 bytes/class is the whole state."""
    return docs.select(
        F.md5(normalized_text(text_col)).alias("text_hash")).distinct()


def dedup_exact_incremental(new_docs: DataFrame, seen: DataFrame,
                            id_col: str = "doc_id",
                            text_col: str = "text") -> DataFrame:
    """Exact dedup of an incremental batch against a persisted hash
    store: → (id_col, text_hash, is_new) where ``is_new`` means the
    document survives — its class is absent from the store AND it is
    the min-id representative within the batch.

    Scale shape: the text never shuffles (hashes + ids only); the
    store join is an equi-join on the 16-byte hash — co-partitioned
    with the batch-min aggregation's shuffle, so AQE runs both off one
    exchange of the batch side.
    """
    h = new_docs.select(F.col(id_col),
                        F.md5(normalized_text(text_col))
                        .alias("text_hash"))
    batch_min = h.groupBy("text_hash").agg(
        F.min(id_col).alias("_min"))
    store = seen.select(F.col("text_hash"),
                        F.lit(True).alias("_seen")).distinct()
    return (h.join(batch_min, "text_hash")
            .join(store, "text_hash", "left")
            .select(F.col(id_col), F.col("text_hash"),
                    (F.col("_seen").isNull()
                     & (F.col(id_col) == F.col("_min")))
                    .alias("is_new")))
