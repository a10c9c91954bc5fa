"""The full web-corpus curation pipeline on raw crawl output: extract
text from a synthetic HTML corpus, repair mojibake, then run the
C4 → Gopher shape → Gopher repetition → paragraph-dedup → token-budget
composite, reporting what each gate dropped.

Run: python examples/web_curation.py [documents.parquet]
"""

import os
import sys

sys.path.insert(0, os.path.dirname(os.path.dirname(
    os.path.abspath(__file__))))  # run from anywhere

from pyspark.sql import functions as F  # noqa: E402

from nipper_spark.functions.curate import curate_web_corpus  # noqa: E402
from nipper_spark.functions.filtering import (  # noqa: E402
    c4_clean, gopher_quality, gopher_repetition)
from nipper_spark.functions.mojibake import fix_mojibake  # noqa: E402
from nipper_spark.session import build_session  # noqa: E402


def main() -> int:
    path = sys.argv[1] if len(sys.argv) > 1 else \
        "/root/testdata/sf0.001/documents.parquet"
    spark = build_session("web-curation", master="local[4]",
                          shuffle_partitions=8)
    spark.sparkContext.setLogLevel("ERROR")
    raw = spark.read.parquet(path)
    # shape the flat word-soup test corpus into page-like documents
    # (terminal punctuation, stop words, shared boilerplate lines) so
    # the gates have something realistic to judge
    docs = raw.select(
        "doc_id",
        F.concat(
            F.lit("COOKIE NOTICE FOR THIS SITE TODAY.\n"),
            F.col("text"),
            F.lit(" and the words flow to the end here.\n"),
            F.lit("SHARED FOOTER OF THE CORPUS SITE.\n"),
            F.lit("closing line one. closing line two."),
        ).alias("text"))

    # encoding hygiene first: how much of the corpus is mojibake?
    moji = fix_mojibake(docs)
    moji.agg(F.count("*").alias("docs"),
             F.sum(F.col("changed").cast("int")).alias("repaired")
             ).show()

    # per-gate drop accounting (each gate is one zero-shuffle pass)
    for name, gate in (("c4", c4_clean(docs)),
                       ("gopher_shape", gopher_quality(docs)),
                       ("gopher_repetition", gopher_repetition(docs))):
        kept = gate.agg(
            F.sum(F.col("kept").cast("int")).alias("kept"),
            F.count("*").alias("total")).first()
        print(f"{name:18s} kept {kept['kept']}/{kept['total']}")

    # the composite: gates → paragraph dedup → deterministic budget
    out = curate_web_corpus(docs, token_budget=100_000)
    out.agg(F.count("*").alias("selected_docs"),
            F.sum("tokens").alias("tokens"),
            F.sum("n_paras").alias("paras_in"),
            F.sum("n_kept_paras").alias("paras_kept")).show()
    out.orderBy("doc_id").show(8)
    spark.stop()
    return 0


if __name__ == "__main__":
    raise SystemExit(main())
