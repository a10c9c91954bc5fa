"""Anchor-text index: who links to a URL, and with what words.

The classic web-graph text signal (link text describes the *target*
better than the target describes itself) — used for retrieval training
pairs, title synthesis, and spam scoring. Reference parity: the
per-anchor extraction uses the same selection surface as nipper's
`examples/` pipelines (`doc.select("a[href]")` + `.attr/.text`,
src/traversal.rs select / src/entity.rs text), re-expressed over the
engine's own kernel; aggregation is pure Spark.

Scale shape (the part that must survive 100 TB):
- html crosses the process boundary ONCE (`mapInPandas`); every row
  the aggregations shuffle is a short `(src_host, dst, anchor)`
  string triple — never html, never document text;
- popular targets are the canonical skew hazard (every page links to
  a handful of home pages). Per-(dst, anchor) counts use map-side
  partial aggregation, and the per-target top-k anchor selection runs
  through `operators.topk.topk_per_key` — the same salted two-phase
  kernel the frontier wave selector uses — so one mega-popular URL
  cannot pin a shuffle partition;
- the final index row carries at most ``top_anchors`` anchors,
  deterministically ordered by (count desc, anchor asc), so output
  size is bounded per target regardless of in-degree.
"""

from __future__ import annotations

from typing import Iterator

import pandas as pd
from pyspark.sql import DataFrame
from pyspark.sql import functions as F

from nipper_spark.functions.html_udfs import _to_text, document_base
from nipper_spark.functions.url import host_of, resolve_and_canonicalize
from nipper_spark.html import Document

ANCHOR_EDGE_SCHEMA = ("src string, src_host string, dst string, "
                      "anchor string")


def anchor_text_pairs(url: str, html) -> list[tuple[str, str]]:
    """Pure single-document kernel — THE shared implementation: the
    Spark extractor below and the oracle twin both call this.

    Returns one ``(canonical dst, whitespace-normalized anchor text)``
    per ``<a href>`` in document order; every occurrence counts (the
    index's `n_refs` is reference-count, not distinct-link count).
    Unresolvable/non-http(s) hrefs are dropped, like the outlink
    extractor."""
    doc = Document.from_html(_to_text(html))
    base = document_base(doc, url)
    out: list[tuple[str, str]] = []
    for a in doc.select("a[href]").iter():
        href = a.attr("href")
        if href is None:
            continue
        dst = resolve_and_canonicalize(base, href)
        if dst is None:
            continue
        out.append((dst, " ".join((a.text() or "").split())))
    return out


def extract_anchor_edges(pages: DataFrame, url_col: str = "url",
                         html_col: str = "html") -> DataFrame:
    """pages → (src, src_host, dst, anchor), one row per anchor
    occurrence. One MapInPandas boundary; html never leaves it."""
    cols = [url_col, html_col]

    def gen(batches: Iterator[pd.DataFrame]) -> Iterator[pd.DataFrame]:
        for pdf in batches:
            srcs: list[str] = []
            hosts: list[str] = []
            dsts: list[str] = []
            anchors: list[str] = []
            for u, h in zip(pdf[url_col], pdf[html_col]):
                u = str(u)
                sh = host_of(u) or ""
                for dst, anchor in anchor_text_pairs(u, h):
                    srcs.append(u)
                    hosts.append(sh)
                    dsts.append(dst)
                    anchors.append(anchor)
            yield pd.DataFrame({"src": srcs, "src_host": hosts,
                                "dst": dsts, "anchor": anchors})

    return pages.select(*cols).mapInPandas(gen, ANCHOR_EDGE_SCHEMA)


def anchor_text_index(pages: DataFrame, top_anchors: int = 10,
                      url_col: str = "url",
                      html_col: str = "html") -> DataFrame:
    """pages → (dst, n_refs, n_src_hosts, top_anchors).

    ``top_anchors`` is the pipe-joined top-``top_anchors`` anchor
    texts by (occurrence count desc, text asc) — a deterministic total
    order, so the result is partitioning-independent and hash-exact
    against the single-threaded twin."""
    from nipper_spark.operators.topk import topk_per_key

    edges = extract_anchor_edges(pages, url_col, html_col)

    refs = edges.groupBy("dst").agg(
        F.count("*").alias("n_refs"),
        F.countDistinct("src_host").alias("n_src_hosts"))

    counts = (edges.groupBy("dst", "anchor")
              .agg(F.count("*").alias("n")))
    top = topk_per_key(counts, "dst",
                       [F.desc("n"), F.asc("anchor")],
                       top_anchors, rank_col="_rk")
    ranked = top.groupBy("dst").agg(
        F.concat_ws("|", F.transform(
            F.array_sort(F.collect_list(F.struct("_rk", "anchor"))),
            lambda s: s["anchor"])).alias("top_anchors"))

    return refs.join(ranked, "dst")


def anchor_text_index_oracle(pages_rows: list, top_anchors: int = 10
                             ) -> list[tuple]:
    """Single-threaded twin over (url, html) rows — same kernel,
    Counter-based aggregation. Returns rows sorted by dst."""
    from collections import Counter, defaultdict

    ref_count: Counter = Counter()
    src_hosts: dict[str, set] = defaultdict(set)
    anchor_count: dict[str, Counter] = defaultdict(Counter)
    for url, html in pages_rows:
        sh = host_of(url) or ""
        for dst, anchor in anchor_text_pairs(url, html):
            ref_count[dst] += 1
            src_hosts[dst].add(sh)
            anchor_count[dst][anchor] += 1
    out = []
    for dst in sorted(ref_count):
        ranked = sorted(anchor_count[dst].items(),
                        key=lambda kv: (-kv[1], kv[0]))[:top_anchors]
        out.append((dst, ref_count[dst], len(src_hosts[dst]),
                    "|".join(a for a, _ in ranked)))
    return out
