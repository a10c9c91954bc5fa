"""Benchmark decontamination — flag training documents that share
word-n-gram content with an evaluation/benchmark set (the standard
pre-training hygiene pass: GPT-3 App. C, PaLM §7, Llama eval decontam
all use 8-13-word-gram overlap).

Semantics (shared kernels, both sides):
- grams: every ``width``-word window of a text, hashed with
  `boilerplate.span_gram_hashes` — ONE gram definition across
  repeated-span removal and decontamination;
- a training doc is ``contaminated`` when ≥ ``min_hits`` of its gram
  OCCURRENCES appear anywhere in the benchmark set; ``n_hits`` counts
  occurrences (window positions), ``n_gram_hits`` counts distinct
  matching grams.

Scale shape: the benchmark side is SMALL by nature (eval suites are
MBs; the corpus is the 100-TB side) — its distinct gram hashes are
broadcast, so the corpus-side gram stream joins without any shuffle
of corpus data; the only Exchange is the per-doc hit aggregation,
carrying (id, gram_h) longs. Corpus text crosses into Python once (to
hash); benchmark text never leaves the driver-side prep. If a
benchmark ever outgrows the broadcast threshold, drop `F.broadcast`
and the same plan degrades gracefully to a shuffle join on gram_h.
"""

from __future__ import annotations

from pyspark.sql import DataFrame
from pyspark.sql import functions as F

from nipper_spark.functions.boilerplate import _gram_df, span_gram_hashes

DEFAULT_WIDTH = 8
DEFAULT_MIN_HITS = 1


def decontaminate(docs: DataFrame, benchmark: DataFrame,
                  id_col: str = "doc_id", text_col: str = "text",
                  bench_text_col: str = "text",
                  width: int = DEFAULT_WIDTH,
                  min_hits: int = DEFAULT_MIN_HITS) -> DataFrame:
    """docs × benchmark → (id_col, n_hits, n_gram_hits, contaminated).

    Every doc appears in the output (left join), clean docs with
    zeroes — curation composes on ``~contaminated``."""
    bench_grams = (
        _gram_df(benchmark.select(F.lit(0).alias("_bid"),
                                  F.col(bench_text_col)),
                 "_bid", bench_text_col, width)
        .select("gram_h").distinct())
    doc_grams = _gram_df(docs, id_col, text_col, width)
    hits = (doc_grams.join(F.broadcast(bench_grams), "gram_h")
            .groupBy("id")
            .agg(F.count("*").alias("n_hits"),
                 F.countDistinct("gram_h").alias("n_gram_hits")))
    return (docs.select(F.col(id_col))
            .join(hits.withColumnRenamed("id", id_col), id_col, "left")
            .select(
                id_col,
                F.coalesce("n_hits", F.lit(0)).cast("long")
                .alias("n_hits"),
                F.coalesce("n_gram_hits", F.lit(0)).cast("long")
                .alias("n_gram_hits"),
                (F.coalesce("n_hits", F.lit(0)) >= min_hits)
                .alias("contaminated")))


def decontaminate_oracle(docs: list, bench_texts: list,
                         width: int = DEFAULT_WIDTH,
                         min_hits: int = DEFAULT_MIN_HITS) -> list:
    """Single-threaded twin: docs = [(doc_id, text)] →
    [(doc_id, n_hits, n_gram_hits, contaminated)] sorted by doc_id."""
    bench = set()
    for t in bench_texts:
        bench.update(span_gram_hashes(t, width))
    out = []
    for i, t in sorted(docs):
        hs = span_gram_hashes(t, width)
        matched = [h for h in hs if h in bench]
        out.append((i, len(matched), len(set(matched)),
                    len(matched) >= min_hits))
    return out
