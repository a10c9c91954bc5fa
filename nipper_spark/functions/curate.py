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
Everything here is SQL-expressible, so the driver's DuckDB oracle
checks the whole composite end-to-end.
"""

from __future__ import annotations

from pyspark.sql import DataFrame
from pyspark.sql import functions as F

from nipper_spark.functions.dedup import dedup_exact
from nipper_spark.functions.text_udfs import (
    bpe_ish_token_count, quality_score)
from nipper_spark.operators.cumsum import running_sum


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
    scored = deduped.select(
        "doc_id",
        bpe_ish_token_count(text_col).cast("int").alias("bpe_tokens"),
        quality_score(text_col),
    ).filter(F.col("quality") >= min_quality)
    budgeted = running_sum(scored,
                           [("quality", "desc"), ("doc_id", "asc")],
                           "bpe_tokens", "running_tokens")
    return (budgeted
            .withColumn("running_tokens",
                        F.col("running_tokens").cast("bigint"))
            .filter(F.col("running_tokens") <= token_budget)
            .select("doc_id", "bpe_tokens",
                    F.col("quality").alias("quality"), "running_tokens"))
