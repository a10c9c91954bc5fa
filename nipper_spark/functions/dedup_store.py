"""Versioned dedup state for a rolling crawl — the missing half of
incremental dedup: WHERE the hash/signature stores live between
batches, with the same atomic-commit + exact-resume discipline as the
frontier's crawl state (crawl/state.py, reused wholesale).

    dedup_dir/
      exact_seen/round=K/    md5-per-class delta of batch K
      minhash_sigs/round=K/  (id, sig) delta of batch K's survivors
      MANIFEST.json          {"last_committed_round": K}

``ingest_batch`` runs the full incremental pipeline for one batch:

    exact-incremental vs the cumulative hash store
      → fresh class representatives
    near-dup incremental (MinHash/LSH) vs the cumulative sig store
      → min-id near-dup survivors among the fresh docs
    stage both deltas, THEN commit the batch

A crash between the writes and the commit leaves the batch
uncommitted; ``resume()`` truncates the orphan deltas and the batch
replays to an identical state (the frontier's invariant, applied to
dedup). Both stores are id/hash/signature tables — document text
never enters the state directory.

CONTRACT: batch ids are monotone (a later batch's doc_ids exceed all
earlier ones — crawl order), so the min-id survivor rule resolves
every new-vs-store pair in favor of the store and every new-vs-new
pair in favor of the earlier document.
"""

from __future__ import annotations

from pyspark.sql import DataFrame, SparkSession
from pyspark.sql import functions as F

from nipper_spark.crawl.state import CrawlState
from nipper_spark.functions.dedup import (dedup_exact_incremental,
                                          minhash_lsh_incremental,
                                          minhash_store,
                                          seen_text_hashes)

EXACT_SCHEMA = "text_hash string"
SIG_SCHEMA = "id long, sig array<long>"
TABLES = ("exact_seen", "minhash_sigs")


class DedupStore:
    def __init__(self, spark: SparkSession, state_dir: str,
                 num_perm: int = 64, bands: int = 16, ngram: int = 3,
                 threshold: float = 0.9, seed: int = 42,
                 max_bucket: int = 64) -> None:
        self.state = CrawlState(spark, state_dir)
        self.cfg = dict(num_perm=num_perm, bands=bands, ngram=ngram,
                        threshold=threshold, seed=seed,
                        max_bucket=max_bucket)

    # -- lifecycle ----------------------------------------------------
    def last_committed_batch(self) -> int:
        return self.state.last_committed_round()

    def resume(self) -> int:
        """Heal interrupted compactions, drop uncommitted deltas, and
        return the batch to replay from (last committed + 1)."""
        self.state.recover_compaction(TABLES)
        last = self.last_committed_batch()
        self.state.truncate_after(last, TABLES)
        return last + 1

    def compact(self, upto: int | None = None) -> None:
        upto = self.last_committed_batch() if upto is None else upto
        self.state.compact("exact_seen", upto, EXACT_SCHEMA)
        self.state.compact("minhash_sigs", upto, SIG_SCHEMA)

    # -- state reads ---------------------------------------------------
    def seen_hashes(self, upto: int) -> DataFrame:
        return self.state.read_all_rounds("exact_seen", upto,
                                          EXACT_SCHEMA)

    def sig_store(self, upto: int) -> DataFrame:
        return self.state.read_all_rounds("minhash_sigs", upto,
                                          SIG_SCHEMA)

    # -- the batch pipeline ---------------------------------------------
    def ingest_batch(self, k: int, docs: DataFrame,
                     id_col: str = "doc_id",
                     text_col: str = "text") -> DataFrame:
        """Run batch ``k`` through exact → near-dup incremental dedup,
        write both state deltas, commit, and return the per-document
        disposition: (id_col, disposition ∈ {'exact_dup', 'near_dup',
        'kept'}). Re-running an uncommitted batch is idempotent
        (whole-partition overwrites)."""
        c = self.cfg
        upto = k - 1
        # materialize the small per-batch intermediates once: flags
        # feeds three consumers (fresh ids, the exact delta, the
        # disposition join), the signature table two (the incremental
        # candidate pass AND the state delta) and losers two — without
        # the checkpoints each consumer re-ran the whole upstream
        # subtree, so the signature UDF executed twice per batch and
        # the exact-incremental join three times
        flags = dedup_exact_incremental(docs, self.seen_hashes(upto),
                                        id_col, text_col) \
            .localCheckpoint()
        fresh_ids = flags.filter(F.col("is_new")).select(F.col(id_col))
        fresh_docs = docs.join(fresh_ids, id_col)
        new_sig = minhash_store(
            fresh_docs, id_col, text_col,
            num_perm=c["num_perm"], ngram=c["ngram"], seed=c["seed"]) \
            .localCheckpoint()
        pairs = minhash_lsh_incremental(
            fresh_docs, self.sig_store(upto), id_col, text_col,
            num_perm=c["num_perm"], bands=c["bands"], ngram=c["ngram"],
            threshold=c["threshold"], seed=c["seed"],
            max_bucket=c["max_bucket"], new_sig=new_sig)
        # monotone ids ⇒ the higher side of every pair is the loser
        losers = pairs.select(F.col("id_b").alias(id_col)).distinct() \
            .localCheckpoint()

        # classes first seen in this batch (near-dup losers included:
        # their exact class is now seen either way)
        exact_delta = (flags.filter(F.col("is_new"))
                       .select("text_hash").distinct())
        # survivors' signatures = the materialized batch signatures
        # minus the losers (no second signature pass over the text)
        sig_delta = new_sig.join(
            losers.select(F.col(id_col).alias("id")), "id", "left_anti")
        # both deltas stage concurrently; a failed write raises out of
        # result() BEFORE the commit, so the batch replays on resume —
        # the commit-after-both-deltas invariant is unchanged
        from concurrent.futures import ThreadPoolExecutor
        with ThreadPoolExecutor(max_workers=2) as ex:
            w_exact = ex.submit(self.state.write, "exact_seen", k,
                                exact_delta)
            w_sig = ex.submit(self.state.write, "minhash_sigs", k,
                              sig_delta)
            w_exact.result()
            w_sig.result()
        self.state.commit_round(k)

        loser_ids = losers
        disposition = (
            docs.select(F.col(id_col))
            .join(flags.select(F.col(id_col),
                               F.col("is_new").alias("_fresh")), id_col)
            .join(loser_ids.withColumn("_lost", F.lit(True)),
                  id_col, "left")
            .select(F.col(id_col),
                    F.when(~F.col("_fresh"), F.lit("exact_dup"))
                    .when(F.col("_lost"), F.lit("near_dup"))
                    .otherwise(F.lit("kept")).alias("disposition")))
        return disposition


def dedup_store_oracle(batches: list, num_perm: int = 64,
                       bands: int = 16, ngram: int = 3,
                       threshold: float = 0.9, seed: int = 42,
                       max_bucket: int = 64) -> list:
    """Single-threaded twin of successive ``ingest_batch`` calls:
    ``batches`` is [[(doc_id, text), ...], ...] in batch order; returns
    [(doc_id, batch, disposition)] using the same kernels
    (normalization/md5, minhash_signature, bucket_candidate_pairs)."""
    import hashlib
    import re

    from nipper_spark.functions.dedup import (
        minhash_lsh_incremental_oracle)

    def norm_md5(t: str) -> str:
        # operation-identical to Spark's normalized_text: trim strips
        # SPACES only, Java \s is the ASCII class [ \t\n\x0B\f\r] (no
        # NBSP), collapse BEFORE lower — a Python str.strip()/re \s
        # (Unicode-aware) twin hashes \xa0/unicode-space text
        # differently and breaks the hash-exact invariant
        n = re.sub(r"[ \t\n\x0b\f\r]+", " ", t.strip(" ")).lower()
        return hashlib.md5(n.encode("utf-8")).hexdigest()

    seen: set = set()
    store_docs: list = []
    out = []
    for bi, batch in enumerate(batches):
        fresh = []
        batch_hashes: dict = {}
        for doc_id, text in sorted(batch):
            h = norm_md5(text)
            if h in seen or h in batch_hashes:
                out.append((doc_id, bi, "exact_dup"))
                continue
            batch_hashes[h] = doc_id
            fresh.append((doc_id, text))
        pairs = minhash_lsh_incremental_oracle(
            fresh, store_docs, num_perm=num_perm, bands=bands,
            ngram=ngram, threshold=threshold, seed=seed,
            max_bucket=max_bucket)
        losers = {b for _, b, _ in pairs}
        for doc_id, text in fresh:
            if doc_id in losers:
                out.append((doc_id, bi, "near_dup"))
            else:
                out.append((doc_id, bi, "kept"))
                store_docs.append((doc_id, text))
        seen.update(batch_hashes)
    return sorted(out)
