"""Training-set curation — the composite pipeline the individual ops
exist for: filter → dedup → budget a corpus into a training set.

One declarative chain (every step is a verified operator from this
package):

    documents
      │ quality gate      (quality_score ≥ τ — pure Catalyst)
      │ language gate     (lang ∈ wanted)
      │ exact dedup       (min-id survivor per md5 class)
      │ token accounting  (BPE-ish counts — pure Catalyst)
      ▼ deterministic token budget: order by (quality desc, doc_id),
        keep documents while the running token total fits the budget

The budget step is a global running-sum computed by the two-phase
bucket-partitioned operator (operators/cumsum.py) — same semantics as
`sum() OVER (ORDER BY …)` but never a single-partition window, so the
quality-filtered corpus is not funneled through one task at 100 TB;
the bucket boundaries are literal expressions, so the operator holds
no persisted state (no cache to leak across calls).
`curate_training_set` is fully SQL-expressible, so the driver's DuckDB
oracle checks that composite end-to-end; the near-dup variant's
MinHash/union-find stage is checked by a shared-kernel Python twin
whose survivor set feeds the same SQL tail.
"""

from __future__ import annotations

from pyspark.sql import DataFrame
from pyspark.sql import functions as F

from nipper_spark.functions.dedup import dedup_exact
from nipper_spark.functions.text_udfs import (
    bpe_ish_token_count, quality_score)
from nipper_spark.operators.cumsum import running_sum


def _score_and_budget(deduped: DataFrame, min_quality: float,
                      token_budget: int, text_col: str) -> DataFrame:
    """Shared tail of both curation composites: quality gate →
    deterministic token budget via the two-phase running sum."""
    scored = deduped.select(
        "doc_id",
        bpe_ish_token_count(text_col).cast("int").alias("bpe_tokens"),
        quality_score(text_col),
    ).filter(F.col("quality") >= min_quality)
    # materialize the NARROW scored table (id + two numerics — the
    # text is already projected away) before the two-phase running
    # sum: its boundary sample and both compute branches are separate
    # actions over this input, and without a leaf here each re-ran the
    # whole filter→dedup pipeline upstream (cumsum.py's documented
    # "cache explicitly" contract)
    scored = scored.localCheckpoint()
    budgeted = running_sum(scored,
                           [("quality", "desc"), ("doc_id", "asc")],
                           "bpe_tokens", "running_tokens")
    return (budgeted
            .withColumn("running_tokens",
                        F.col("running_tokens").cast("bigint"))
            .filter(F.col("running_tokens") <= token_budget)
            .select("doc_id", "bpe_tokens",
                    F.col("quality").alias("quality"), "running_tokens"))


def curate_training_set(docs: DataFrame, min_quality: float = 0.5,
                        langs: tuple[str, ...] = ("en",),
                        token_budget: int = 50_000,
                        id_col: str = "doc_id",
                        text_col: str = "text") -> DataFrame:
    """→ (doc_id, bpe_tokens, quality, running_tokens) — the selected
    training set, deterministic for a given corpus + config."""
    base = (docs
            .filter(F.col("lang").isin(*langs))
            .select(F.col(id_col).alias("doc_id"), F.col(text_col),
                    F.col("lang")))
    deduped = dedup_exact(base, id_col="doc_id", text_col=text_col)
    return _score_and_budget(deduped, min_quality, token_budget, text_col)


def curate_training_set_neardup(docs: DataFrame,
                                min_quality: float = 0.5,
                                langs: tuple[str, ...] = ("en",),
                                token_budget: int = 50_000,
                                id_col: str = "doc_id",
                                text_col: str = "text",
                                num_perm: int = 64, bands: int = 16,
                                ngram: int = 3, threshold: float = 0.9,
                                seed: int = 42,
                                max_bucket: int = 64) -> DataFrame:
    """The full-strength composite: lang gate → exact dedup →
    NEAR-dup dedup (MinHash+LSH candidate pairs, hot-bucket-capped →
    connected components → min-id survivor per cluster) → quality
    gate → token budget. This is the web-corpus pipeline shape
    (near-identical boilerplate pages survive exact dedup and must be
    clustered out before budgeting); every stage is a verified
    operator from this package, and the near-dup stage's shuffles
    carry signatures only — the text never rides a banded Exchange."""
    from nipper_spark.functions.dedup import (
        minhash_lsh_pairs, near_dup_survivors)
    base = (docs
            .filter(F.col("lang").isin(*langs))
            .select(F.col(id_col).alias("doc_id"), F.col(text_col),
                    F.col("lang")))
    deduped = dedup_exact(base, id_col="doc_id", text_col=text_col)
    pairs = minhash_lsh_pairs(deduped, id_col="doc_id",
                              text_col=text_col, num_perm=num_perm,
                              bands=bands, ngram=ngram,
                              threshold=threshold, seed=seed,
                              max_bucket=max_bucket)
    survivors = near_dup_survivors(deduped, pairs, id_col="doc_id")
    return _score_and_budget(survivors, min_quality, token_budget,
                             text_col)


def curate_web_corpus(docs: DataFrame, token_budget: int = 20_000,
                      id_col: str = "doc_id",
                      text_col: str = "text") -> DataFrame:
    """The modern web-corpus curation shape (C4 → Gopher → CCNet):

        pages
          │ C4 line+page gate          (c4_clean.kept)
          │ Gopher shape gate          (gopher_quality.kept)
          │ Gopher repetition gate     (gopher_repetition.kept)
          │ corpus-wide paragraph dedup (dedup_paragraphs, text kept)
          ▼ deterministic token budget over the PARA-CLEANED text,
            ordered by doc_id (two-phase running sum — no
            single-partition window)

    Every stage is a verified operator from this package; the three
    gates are pure-Catalyst projections of the same scan joined back
    by id (flag columns only — the text enters a shuffle exactly once,
    in the paragraph-dedup join), and the whole composite has a
    single-threaded twin (`curate_web_corpus_oracle`) so the driver
    gate is hash-exact end-to-end.

    → (doc_id, n_paras, n_kept_paras, tokens, running_tokens,
    clean_md5).
    """
    from nipper_spark.functions.dedup import dedup_paragraphs
    from nipper_spark.functions.filtering import (
        c4_clean, gopher_quality, gopher_repetition)
    base = docs.select(F.col(id_col).alias("doc_id"), F.col(text_col))
    gate = (c4_clean(base).select("doc_id", F.col("kept").alias("_c4"))
            .join(gopher_quality(base)
                  .select("doc_id", F.col("kept").alias("_gq")),
                  "doc_id")
            .join(gopher_repetition(base)
                  .select("doc_id", F.col("kept").alias("_gr")),
                  "doc_id")
            .filter(F.col("_c4") & F.col("_gq") & F.col("_gr"))
            .select("doc_id"))
    kept_docs = base.join(gate, "doc_id")
    para = dedup_paragraphs(kept_docs, id_col="doc_id",
                            text_col=text_col, with_text=True)
    flat = F.translate(F.col("clean_text"), "\n\t", "  ")
    words = F.filter(F.split(flat, " ", -1), lambda w: w != F.lit(""))
    scored = para.select(
        "doc_id", "n_paras",
        F.col("n_kept").alias("n_kept_paras"),
        F.size(words).cast("int").alias("tokens"),
        "clean_md5")
    # see _score_and_budget: leaf the narrow per-doc stats so the
    # running sum's sample + compute actions don't re-run the
    # C4→Gopher→paragraph-dedup chain once each
    scored = scored.localCheckpoint()
    budgeted = running_sum(scored, [("doc_id", "asc")], "tokens",
                           "running_tokens")
    return (budgeted
            .filter(F.col("running_tokens").cast("bigint")
                    <= token_budget)
            .select("doc_id", "n_paras", "n_kept_paras", "tokens",
                    F.col("running_tokens").cast("bigint")
                    .alias("running_tokens"), "clean_md5"))


def curate_web_corpus_oracle(docs: list,
                             token_budget: int = 20_000) -> list:
    """Single-threaded twin of :func:`curate_web_corpus`: chains the
    per-operator twins in the same order. ``docs`` is [(doc_id, text)];
    returns the selected rows as (doc_id, n_paras, n_kept_paras,
    tokens, running_tokens, clean_md5)."""
    from nipper_spark.functions.dedup import dedup_paragraphs_oracle
    from nipper_spark.functions.filtering import (
        c4_clean_doc, gopher_quality_doc, gopher_repetition_doc)
    gated = [(d, t) for d, t in sorted(docs)
             if c4_clean_doc(t)[0] and gopher_quality_doc(t)[0]
             and gopher_repetition_doc(t)[0]]
    out = []
    running = 0
    for d, n_paras, n_kept, md5, clean in dedup_paragraphs_oracle(
            gated, with_text=True):
        flat = clean.replace("\n", " ").replace("\t", " ")
        tokens = len([w for w in flat.split(" ") if w != ""])
        running += tokens
        if running > token_budget:
            break
        out.append((d, n_paras, n_kept, tokens, running, md5))
    return out
