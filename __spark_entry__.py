"""Driver contract for the spark-graft builder (PySpark target).

``entry``    — flagship pipeline on /root/testdata/sf0.001.
``queries``  — one entry per implemented operator family (SURVEY.md §2
               + the training-data ops); each callable: (spark, sf_dir)
               → DataFrame.
``oracle_sql`` — DuckDB-runnable equivalents. Three oracle flavors:
  1. plain ANSI SQL over the pre-registered parquet views
     (relational ops, exact dedup, token/quality features);
  2. golden VALUES byte-locked from the reference's own test suite
     (selector counts, property semantics, serializer round-trips,
     the hacker-news extraction — nipper_spark/fixtures_goldens.py);
  3. VALUES computed at call time by the SINGLE-THREADED oracle
     implementations (crawl ordering, minhash/simhash/ANN) — the
     distributed engine must match the sequential reference exactly.
Python-computed oracles read /root/testdata/sf0.01 directly because
the driver runs the comparison at sf=0.01 (TESTDATA.md).
"""

from __future__ import annotations

import tempfile
from collections.abc import Callable

import pandas as pd  # noqa: F401 — nested pandas UDF annotations resolve here
from pyspark.sql import DataFrame, SparkSession
from pyspark.sql import functions as F

SF001 = "/root/testdata/sf0.001"
ORACLE_SF = "/root/testdata/sf0.01"  # driver compares at sf=0.01

# ----------------------------------------------------------------------
# shared fixed configs (engine and oracles must agree)
# ----------------------------------------------------------------------
CRAWL_PAGES = dict(n_pages=40, links_per_page=4, n_hosts=8, seed=42)
CRAWL_ROUNDS = 3
MINHASH = dict(num_perm=64, bands=16, ngram=3, threshold=0.9, seed=42,
               max_bucket=64)
SIMHASH = dict(max_hamming=3, prefix_bits=16, ngram=2, max_bucket=64)
ANN = dict(k=5, n_queries=3)
LSH_ANN = dict(k=5, n_bits=16, bands=8, seed=42)
NEARDUP = dict(threshold=0.98, n_bits=16, bands=8, seed=42, max_bucket=64)

CANON_VECTORS = [
    "HTTP://Host.Test/a?b=2&a=1#f",
    "https://x.test:443/p",
    "http://x.test:8080/p",
    "http://x.test",
    "http://x.test/%41b/%7Euser",
    "http://X.test/a/../b",
    "ftp://x.test/",
    "javascript:void(0)",
    "http://h.test/a?z=&y=2",
    "  http://pad.test/x  ",
    # round 4: WHATWG backslash separators, dot segments, IDN host,
    # percent-encoded host
    "http:\\\\slash.test\\dir\\p",
    "http://dot.test/a/./b/../c/.",
    "http://bücher.test/x",
    "http://pct%2Ehost.test/y",
    # round 5: IPv6 literals keep brackets (+default-port drop), %2F
    # stays an encoded slash (p%2Fq ≠ p/q), forbidden decoded host
    "http://[2001:DB8::1]:80/p",
    "http://[2001:db8::1]:8080/p",
    "http://h.test/p%2Fq?x=1",
    "http://victim.test%2F.evil.test/z",
]


def _crawl_policy():
    from nipper_spark.crawl.politeness import CrawlPolicy
    return CrawlPolicy(default_tokens=6, host_tokens={"host00.test": 3},
                       robots_disallow={"host03.test": ["/page/3"]},
                       n_buckets=4, max_depth=16)


def _fixture_pages(spark):
    from nipper_spark.sources.synthetic import (
        PAGES_SCHEMA, fixture_pages_rows)
    return spark.createDataFrame(fixture_pages_rows(), PAGES_SCHEMA)


def _synth_pages(spark):
    from nipper_spark.sources.synthetic import PAGES_SCHEMA, synth_pages_rows
    return spark.createDataFrame(synth_pages_rows(**CRAWL_PAGES),
                                 PAGES_SCHEMA)


def _page_html_map():
    from nipper_spark.sources.synthetic import fixture_pages_rows
    short = {"http://fixture.test/page": "page",
             "http://fixture.test/page2": "page2",
             "http://fixture.test/rustwiki": "rustwiki",
             "http://fixture.test/hn": "hn",
             "http://fixture.test/wisburg": "wisburg"}
    return {short[u]: bytes(h).decode("utf-8")
            for (u, _, h, _, _) in fixture_pages_rows()}


def _sql_quote(s) -> str:
    if s is None:
        return "NULL"
    return "'" + str(s).replace("'", "''") + "'"


def _values_sql(rows, cols_with_types) -> str:
    """Build `SELECT * FROM (VALUES ...) t(...)` with explicit casts on
    the first row so DuckDB picks exact types (DOUBLE not DECIMAL…)."""
    names = [c for c, _ in cols_with_types]
    out_rows = []
    for i, row in enumerate(rows):
        items = []
        for (name, typ), val in zip(cols_with_types, row):
            if val is None:
                lit = "NULL"
            elif typ in ("INTEGER", "BIGINT"):
                lit = str(int(val))
            elif typ == "DOUBLE":
                # cast from STRING: a bare 17-digit literal parses as
                # DECIMAL first and loses the low bits (even inside
                # CAST(lit AS DOUBLE)); strtod on the repr is bit-exact
                items.append(f"CAST('{float(val)!r}' AS DOUBLE)")
                continue
            elif typ == "BOOLEAN":
                lit = "TRUE" if val else "FALSE"
            else:
                lit = _sql_quote(val)
            items.append(f"CAST({lit} AS {typ})" if i == 0 or lit == "NULL"
                         else lit)
        out_rows.append("(" + ", ".join(items) + ")")
    if not out_rows:
        casts = ", ".join(f"CAST(NULL AS {t})" for _, t in cols_with_types)
        return (f"SELECT * FROM (SELECT {casts}) t({', '.join(names)}) "
                "WHERE 1=0")
    return ("SELECT * FROM (VALUES " + ", ".join(out_rows) +
            f") t({', '.join(names)})")


# ======================================================================
# entry — flagship smoke query
# ======================================================================

def entry(spark: SparkSession) -> DataFrame:
    """Text-pipeline flagship over sf0.001 documents: features + quality
    + language ID + fingerprint + exact-dup group marking."""
    from nipper_spark.functions.dedup import exact_dup_groups
    from nipper_spark.functions.text_udfs import with_text_features
    docs = spark.read.parquet(f"{SF001}/documents.parquet") \
        .drop("n_chars")  # recomputed by the feature projection
    feats = with_text_features(docs)
    dups = exact_dup_groups(docs).select(
        F.explode("dup_ids").alias("doc_id"),
        F.lit(True).alias("is_dup"))
    return (feats.join(dups, "doc_id", "left")
            .withColumn("is_dup", F.coalesce("is_dup", F.lit(False)))
            .orderBy("doc_id"))


# ======================================================================
# queries
# ======================================================================

def _q_sel_counts(spark: SparkSession, sf_dir: str) -> DataFrame:
    """Selector-engine golden counts, computed live through the
    selector UDFs over the reference fixture pages."""
    from nipper_spark.fixtures_goldens import SELECTOR_COUNT_CASES
    from nipper_spark.functions.html_udfs import select_count_udf
    from nipper_spark.html import Document
    htmls = _page_html_map()
    pages = spark.createDataFrame(
        [(k, v) for k, v in sorted(htmls.items())], "page string, html string")
    outs = []
    for case_id, page, roots, sel, _expected in SELECTOR_COUNT_CASES:
        if roots is None:
            col = select_count_udf(sel)("html")
        else:
            # chained select runs in one fused pandas UDF
            import pandas as pd

            def make(roots=roots, sel=sel):
                @F.pandas_udf("int")
                def _chained(html: pd.Series) -> pd.Series:
                    out = []
                    for h in html:
                        doc = Document.from_html(h)
                        out.append(len(doc.select(roots).select(sel).ids))
                    return pd.Series(out, dtype="int32")
                return _chained
            col = make()("html")
        outs.append(pages.filter(F.col("page") == page).select(
            F.lit(case_id).alias("case_id"), col.alias("cnt")))
    df = outs[0]
    for o in outs[1:]:
        df = df.unionByName(o)
    return df


def _q_hn_stories(spark: SparkSession, sf_dir: str) -> DataFrame:
    """Flagship hacker-news extraction (README.md:45-51)."""
    from nipper_spark.functions.html_udfs import hacker_news_stories
    pages = _fixture_pages(spark).filter(
        F.col("url") == "http://fixture.test/hn")
    return hacker_news_stories(pages).select(
        F.col("seq").cast("int").alias("seq"), "title", "href")


def _q_serialize(spark: SparkSession, sf_dir: str) -> DataFrame:
    """Parse→serialize round-trip byte-identity (tests/html-dom.rs)."""
    import pandas as pd
    from nipper_spark.fixtures_goldens import SERIALIZE_CASES
    from nipper_spark.html import parse_fragment
    from nipper_spark.html.serializer import serialize as ser

    rows = [(name, inp) for name, inp, _exp in SERIALIZE_CASES]
    df = spark.createDataFrame(rows, "case_id string, input string")

    @F.pandas_udf("string")
    def _roundtrip(html: pd.Series) -> pd.Series:
        out = []
        for h in html:
            arena = parse_fragment(h)
            first = arena.children_of(0)[0]
            out.append(ser(arena, first, include_node=False))
        return pd.Series(out)

    return df.select("case_id", _roundtrip("input").alias("out_html"))


def _q_extract_text_hash(spark: SparkSession, sf_dir: str) -> DataFrame:
    """THE byte-identity invariant: md5 of the extracted text per url,
    fixture + synthetic pages, via the fused extraction UDF."""
    from nipper_spark.functions.html_udfs import extract_pages
    pages = _fixture_pages(spark).unionByName(_synth_pages(spark))
    return extract_pages(pages).select(
        "url", F.md5("text").alias("text_md5"),
        F.col("n_anchors").cast("int").alias("n_anchors"))


def _q_extract_outlinks(spark: SparkSession, sf_dir: str) -> DataFrame:
    """Outlink extraction + canonicalization over the synthetic graph."""
    from nipper_spark.functions.html_udfs import extract_pages
    return extract_pages(_synth_pages(spark)).select(
        "url",
        F.size("outlinks").cast("int").alias("n_links"),
        F.array_join("outlinks", "|").alias("links"))


ANCHOR_TOP = 5


def _q_anchor_text_index(spark: SparkSession, sf_dir: str) -> DataFrame:
    """Per-target anchor-text index (n_refs, distinct source hosts,
    top-k anchors by count) over the synthetic link graph — the salted
    top-k path guards the popular-target skew."""
    from nipper_spark.functions.anchors import anchor_text_index
    return anchor_text_index(_synth_pages(spark), top_anchors=ANCHOR_TOP)


_WARC_RECORDS = dict(n_pages=30, links_per_page=3, n_hosts=6, seed=7)
PR_PAGES = dict(n_pages=120, links_per_page=4, n_hosts=16, seed=9)
PR_ITERS = 10


def _warc_corpus_dir() -> str:
    """Synthetic corpus as a mixed WARC directory (two Common-Crawl
    .warc.gz segments + one uncompressed .warc), written once per
    process — the engine lists and parses it executor-side."""
    import os
    if getattr(_warc_corpus_dir, "_dir", None) is None:
        from nipper_spark.sources.synthetic import synth_pages_rows
        from nipper_spark.sources.warc import write_warc, write_warc_gz
        recs = [(u, ts, h) for (u, ts, h, _, _)
                in synth_pages_rows(**_WARC_RECORDS)]
        d = _tmp_state_dir("warc_corpus_")
        write_warc_gz(os.path.join(d, "seg-00.warc.gz"), recs[:12])
        write_warc_gz(os.path.join(d, "seg-01.warc.gz"), recs[12:24])
        write_warc(os.path.join(d, "seg-02.warc"), recs[24:])
        _warc_corpus_dir._dir = d
    return _warc_corpus_dir._dir


def _q_warc_extract(spark: SparkSession, sf_dir: str) -> DataFrame:
    """WARC source → fused extraction: Common-Crawl-layout segments
    (per-record gzip members) plus an uncompressed segment, parsed
    executor-side into the pages schema, then text + outlink counts.
    Cites reference examples/readability.rs usage of from_html —
    the source layer must be transparent to the kernel."""
    from nipper_spark.functions.html_udfs import extract_pages
    from nipper_spark.sources.warc import read_warc_pages
    pages = read_warc_pages(spark, _warc_corpus_dir())
    ts = pages.select(
        "url", F.date_format("warc_ts", "yyyy-MM-dd HH:mm:ss")
        .alias("fetched"))
    return (extract_pages(pages)
            .join(ts, "url")
            .select("url", "fetched", F.md5("text").alias("text_md5"),
                    F.size("outlinks").cast("int").alias("n_links")))


def _q_host_pagerank(spark: SparkSession, sf_dir: str) -> DataFrame:
    """Host-graph PageRank over the synthetic crawl's outlinks.
    Integer-quantized fixed-point arithmetic (graph.py) makes the
    distributed result bit-identical to the sequential twin — the
    oracle is hash-exact, not approximately-close."""
    from nipper_spark.functions.graph import host_edges, pagerank
    from nipper_spark.functions.html_udfs import extract_pages
    from nipper_spark.sources.synthetic import (
        PAGES_SCHEMA, synth_pages_rows)
    pages = spark.createDataFrame(synth_pages_rows(**PR_PAGES),
                                  PAGES_SCHEMA)
    pr = pagerank(host_edges(extract_pages(pages)), iters=PR_ITERS)
    return pr.select(F.col("node").alias("host"),
                     F.col("outdeg").cast("int").alias("outdeg"),
                     "rank_q")


def _q_rank_seed_scores(spark: SparkSession, sf_dir: str) -> DataFrame:
    """Graph-aware frontier seeding: candidate outlink URLs scored by
    their target host's PageRank (integer-exact, so the twin is
    hash-exact). The rank join is per-host — the small side."""
    from nipper_spark.functions.graph import rank_seed_scores
    from nipper_spark.functions.html_udfs import extract_pages
    from nipper_spark.sources.synthetic import (
        PAGES_SCHEMA, synth_pages_rows)
    pages = spark.createDataFrame(synth_pages_rows(**PR_PAGES),
                                  PAGES_SCHEMA)
    return rank_seed_scores(extract_pages(pages), iters=PR_ITERS)


def _q_canonicalize(spark: SparkSession, sf_dir: str) -> DataFrame:
    import pandas as pd
    from nipper_spark.functions.url import canonicalize_url
    df = spark.createDataFrame([(u,) for u in CANON_VECTORS], "url string")

    @F.pandas_udf("string")
    def _canon(u: pd.Series) -> pd.Series:
        return pd.Series([canonicalize_url(x) for x in u], dtype="object")

    return df.select("url", _canon("url").alias("canonical"))


def _tmp_state_dir(prefix: str) -> str:
    """Crawl-state scratch dir for driver queries — registered for
    removal at interpreter exit (the returned DataFrames read the dir
    lazily, so it must outlive the query call itself)."""
    import atexit
    import shutil
    d = tempfile.mkdtemp(prefix=prefix)
    atexit.register(shutil.rmtree, d, True)
    return d


def _q_crawl_schedule(spark: SparkSession, sf_dir: str) -> DataFrame:
    """Three frontier rounds on the synthetic graph: the engine's crawl
    ordering record (round, seq, url, host, depth, score)."""
    from nipper_spark.crawl.frontier import FrontierEngine
    from nipper_spark.crawl.state import SCHEDULE_SCHEMA, CrawlState
    pages = _synth_pages(spark)
    seeds = _crawl_seeds()
    state_dir = _tmp_state_dir("nipper_crawl_q_")
    eng = FrontierEngine(spark, pages, state_dir, _crawl_policy())
    eng.bootstrap(seeds)
    for r in range(CRAWL_ROUNDS):
        eng.run_round(r)
    st = CrawlState(spark, state_dir)
    sched = st.read_all_rounds("schedule", CRAWL_ROUNDS - 1, SCHEDULE_SCHEMA)
    return sched.select(F.col("round").cast("int").alias("round"),
                        F.col("seq").cast("int").alias("seq"),
                        "url", "host",
                        F.col("depth").cast("int").alias("depth"), "score")


def _crawl_seeds():
    from nipper_spark.sources.synthetic import synth_pages_rows
    rows = synth_pages_rows(**CRAWL_PAGES)
    return [(rows[0][0], 1.0), (rows[1][0], 0.9), (rows[2][0], 0.8)]


SPANS = dict(width=5, max_docs=1)


def _c4_page_expr():
    """Deterministic page synthesis for the C4-filter gate: the flat
    word-soup documents get line structure injected per doc_id so
    every rule fires — kept lines, no-punct / too-short / javascript
    drops, sentence-count floor (d%3), lorem-ipsum (d%7), curly (d%11)
    and bad-word (d%13) page drops. `_c4_page_py` is the exact twin;
    TestC4Filter pins their equality."""
    d = F.col("doc_id")
    return F.concat(
        F.substring(F.col("text"), 1, 80), F.lit(".\n"),
        F.lit("no terminal punct here\n"),
        F.lit("enable javascript to continue.\n"),
        F.lit("tiny line.\n"),
        F.substring(F.col("text"), 41, 80), F.lit("?\n"),
        F.lit("closing words for doc "), d.cast("string"), F.lit("!"),
        F.when(d % 3 == 0,
               F.lit("\nextra sentence three. and four. and five."))
        .otherwise(F.lit("")),
        F.when(d % 7 == 0, F.lit("\nlorem ipsum dolor sit amet."))
        .otherwise(F.lit("")),
        F.when(d % 11 == 0, F.lit("\nconfig { x: 1 }"))
        .otherwise(F.lit("")),
        F.when(d % 13 == 0, F.lit("\nthis page has badword content."))
        .otherwise(F.lit("")))


def _c4_page_py(doc_id: int, text: str) -> str:
    page = (f"{text[:80]}.\n"
            "no terminal punct here\n"
            "enable javascript to continue.\n"
            "tiny line.\n"
            f"{text[40:120]}?\n"
            f"closing words for doc {doc_id}!")
    if doc_id % 3 == 0:
        page += "\nextra sentence three. and four. and five."
    if doc_id % 7 == 0:
        page += "\nlorem ipsum dolor sit amet."
    if doc_id % 11 == 0:
        page += "\nconfig { x: 1 }"
    if doc_id % 13 == 0:
        page += "\nthis page has badword content."
    return page


def _q_doc_c4_clean(spark: SparkSession, sf_dir: str) -> DataFrame:
    """C4-style line+page quality filtering (functions/filtering.py):
    pure Catalyst (higher-order array functions + translate/contains,
    zero Python, zero shuffle), hash-exact against the operation-
    identical single-threaded twin."""
    from nipper_spark.functions.filtering import c4_clean
    docs = spark.read.parquet(f"{sf_dir}/documents.parquet")
    paged = docs.select("doc_id", _c4_page_expr().alias("text"))
    return c4_clean(paged)


_GOPHER_LONG = " pneumonoultramicroscopicsilicovolcanoconiosis"
_GOPHER_BULLETS = ("\n- one\n- two\n- three\n- four\n- five"
                   "\n- six\n- seven\n- eight\n- nine\n- ten")
_GOPHER_ELLIPSIS = "\nwait...\nhmm...\nmore..."


def _gopher_page_expr():
    """Deterministic page synthesis for the Gopher-rules gate: the
    word-soup documents (10–99 words, so the 50-word floor fires
    naturally) get per-doc_id pathologies so every rule trips —
    stop-word suffix (d%2, the PASS enabler), bullet flood (d%5),
    ellipsis lines (d%7), '#' symbol spam (d%11), mean-word-length
    blowout (d%13), numeric-word flood (d%17). `_gopher_page_py` is
    the exact twin; TestGopherFilter pins their equality."""
    d = F.col("doc_id")
    return F.concat(
        F.col("text"),
        F.when(d % 2 == 0, F.lit(" to of and that have with"))
        .otherwise(F.lit("")),
        F.when(d % 5 == 0, F.lit(_GOPHER_BULLETS)).otherwise(F.lit("")),
        F.when(d % 7 == 0, F.lit(_GOPHER_ELLIPSIS)).otherwise(F.lit("")),
        F.when(d % 11 == 0, F.repeat(F.lit(" ###"), 12))
        .otherwise(F.lit("")),
        F.when(d % 13 == 0, F.repeat(F.lit(_GOPHER_LONG), 20))
        .otherwise(F.lit("")),
        F.when(d % 17 == 0, F.repeat(F.lit(" 12345"), 30))
        .otherwise(F.lit("")))


def _gopher_page_py(doc_id: int, text: str) -> str:
    page = text
    if doc_id % 2 == 0:
        page += " to of and that have with"
    if doc_id % 5 == 0:
        page += _GOPHER_BULLETS
    if doc_id % 7 == 0:
        page += _GOPHER_ELLIPSIS
    if doc_id % 11 == 0:
        page += " ###" * 12
    if doc_id % 13 == 0:
        page += _GOPHER_LONG * 20
    if doc_id % 17 == 0:
        page += " 12345" * 30
    return page


def _q_doc_gopher_quality(spark: SparkSession, sf_dir: str) -> DataFrame:
    """Gopher-style page-shape quality rules (functions/filtering.py
    gopher_quality): pure Catalyst, every published ratio restated as
    an integer cross-multiplication so the twin is hash-exact."""
    from nipper_spark.functions.filtering import gopher_quality
    docs = spark.read.parquet(f"{sf_dir}/documents.parquet")
    paged = docs.select("doc_id", _gopher_page_expr().alias("text"))
    return gopher_quality(paged)


_GOPHER_DUPLINE = "\nCLICK HERE TO WIN\nCLICK HERE TO WIN" \
                  "\nCLICK HERE TO WIN"


def _gopher_rep_page_expr():
    """Page synthesis for the repetition gate: duplicate-line floods
    (d%3) and a repeated-bigram spam tail (d%5) over the one-line
    word-soup base."""
    d = F.col("doc_id")
    return F.concat(
        F.col("text"),
        F.when(d % 3 == 0, F.lit(_GOPHER_DUPLINE)).otherwise(F.lit("")),
        F.when(d % 5 == 0, F.repeat(F.lit(" buy now"), 40))
        .otherwise(F.lit("")))


def _gopher_rep_page_py(doc_id: int, text: str) -> str:
    page = text
    if doc_id % 3 == 0:
        page += _GOPHER_DUPLINE
    if doc_id % 5 == 0:
        page += " buy now" * 40
    return page


def _q_doc_gopher_repetition(spark: SparkSession,
                             sf_dir: str) -> DataFrame:
    """Gopher repetition rules (functions/filtering.py
    gopher_repetition): duplicate-line and top-bigram shares computed
    in-row over sorted arrays — zero Python, zero shuffle."""
    from nipper_spark.functions.filtering import gopher_repetition
    docs = spark.read.parquet(f"{sf_dir}/documents.parquet")
    paged = docs.select("doc_id", _gopher_rep_page_expr().alias("text"))
    return gopher_repetition(paged)


def _para_page_expr():
    """Page synthesis for paragraph dedup: every doc carries shared
    boilerplate paragraphs (cookie banner; one of two footers; a promo
    on d%3) around two doc-specific body slices — the banner/footer
    paragraphs dedup to their first global occurrence."""
    d = F.col("doc_id")
    return F.concat_ws(
        "\n",
        F.lit("ACCEPT OUR COOKIES TO CONTINUE"),
        F.substring(F.col("text"), 1, 60),
        F.when(d % 2 == 0, F.lit("COPYRIGHT 2026 EXAMPLE INC"))
        .otherwise(F.lit("POWERED BY NIPPER SPARK")),
        F.substring(F.col("text"), 31, 60),
        F.when(d % 3 == 0, F.lit("SUBSCRIBE TO OUR NEWSLETTER")))


def _para_page_py(doc_id: int, text: str) -> str:
    parts = ["ACCEPT OUR COOKIES TO CONTINUE", text[:60],
             ("COPYRIGHT 2026 EXAMPLE INC" if doc_id % 2 == 0
              else "POWERED BY NIPPER SPARK"),
             text[30:90]]
    if doc_id % 3 == 0:
        parts.append("SUBSCRIBE TO OUR NEWSLETTER")
    return "\n".join(parts)


def _q_doc_paragraph_dedup(spark: SparkSession, sf_dir: str) -> DataFrame:
    """CCNet-style corpus-wide paragraph dedup (functions/dedup.py
    dedup_paragraphs): first global (doc_id, position) occurrence of
    each paragraph hash survives; paragraph text never shuffles."""
    from nipper_spark.functions.dedup import dedup_paragraphs
    docs = spark.read.parquet(f"{sf_dir}/documents.parquet")
    paged = docs.select("doc_id", _para_page_expr().alias("text"))
    return dedup_paragraphs(paged)


_WEB_L1 = "ACCEPT ALL COOKIES TO CONTINUE BROWSING TODAY."
_WEB_L3A = "COPYRIGHT 2026 BY EXAMPLE INC OF RECORD."
_WEB_L3B = "POWERED BY THE NIPPER SPARK ENGINE TEAM."
_WEB_JS = "\nenable javascript to continue."
_WEB_REP = "\nCLICK NOW TO WIN\nCLICK NOW TO WIN\nCLICK NOW TO WIN"
_WEB_SYM = "\n### ### ### ### ### ### ### ### ### ### ### ###."
_WEB_LOREM = "\nlorem ipsum dolor sit amet consectetur."
CURATE_WEB = dict(token_budget=8_000)


def _web_page_expr():
    """Page synthesis for the full web-curation composite: shared
    boilerplate lines (cookie banner, two footer variants) around two
    doc-specific body slices, plus per-doc_id pathologies — a
    javascript line (d%7, C4 drops the LINE only), a repetition flood
    (d%11, Gopher repetition drops the PAGE), symbol spam (d%13,
    Gopher shape drops the PAGE), a lorem-ipsum line (d%17, C4 drops
    the PAGE). Word-soup length spans the 50-word Gopher floor."""
    d = F.col("doc_id")
    return F.concat(
        F.lit(_WEB_L1 + "\n"),
        F.substring(F.col("text"), 1, 80),
        F.lit(" and the words continue to flow here.\n"),
        F.when(d % 2 == 0, F.lit(_WEB_L3A)).otherwise(F.lit(_WEB_L3B)),
        F.lit("\n"),
        F.substring(F.col("text"), 41, 80),
        F.lit(" more of that good tail. closing words end here."),
        F.when(d % 7 == 0, F.lit(_WEB_JS)).otherwise(F.lit("")),
        F.when(d % 11 == 0, F.lit(_WEB_REP)).otherwise(F.lit("")),
        F.when(d % 13 == 0, F.lit(_WEB_SYM)).otherwise(F.lit("")),
        F.when(d % 17 == 0, F.lit(_WEB_LOREM)).otherwise(F.lit("")))


def _web_page_py(doc_id: int, text: str) -> str:
    page = (_WEB_L1 + "\n"
            + text[:80] + " and the words continue to flow here.\n"
            + (_WEB_L3A if doc_id % 2 == 0 else _WEB_L3B) + "\n"
            + text[40:120]
            + " more of that good tail. closing words end here.")
    if doc_id % 7 == 0:
        page += _WEB_JS
    if doc_id % 11 == 0:
        page += _WEB_REP
    if doc_id % 13 == 0:
        page += _WEB_SYM
    if doc_id % 17 == 0:
        page += _WEB_LOREM
    return page


def _q_curate_web_corpus(spark: SparkSession, sf_dir: str) -> DataFrame:
    """Full web-corpus curation composite (functions/curate.py
    curate_web_corpus): C4 gate → Gopher shape gate → Gopher
    repetition gate → corpus-wide paragraph dedup → deterministic
    token budget via the two-phase running sum."""
    from nipper_spark.functions.curate import curate_web_corpus
    docs = spark.read.parquet(f"{sf_dir}/documents.parquet")
    paged = docs.select("doc_id", _web_page_expr().alias("text"))
    return curate_web_corpus(paged, **CURATE_WEB)


URLFILTER_BLOCKED = ("tracker.com", "assets.org")
_UF_HOSTS = ("news.example.com", "ads.tracker.com", "cdn.assets.org",
             "a.b.deep.net", "[2001:db8::1]", "blog.sample.io",
             "shop.example.com")


def _urlfilter_url_expr():
    """Deterministic candidate-URL synthesis: host by d%7 (two of the
    seven land in blocked registered domains; one is an IPv6 literal),
    path shape by d%5 (clean page / banned image extension / deep
    directory trap / long-query trap / root)."""
    d = F.col("doc_id")
    host = F.element_at(F.array(*[F.lit(h) for h in _UF_HOSTS]),
                        (d % 7 + 1).cast("int"))
    ds = d.cast("string")
    path = (
        F.when(d % 5 == 0, F.lit("/"))
        .when(d % 5 == 1, F.concat(F.lit("/a/b/c/page"), ds,
                                   F.lit(".html")))
        .when(d % 5 == 2, F.concat(F.lit("/img/pic"), ds,
                                   F.lit(".png")))
        .when(d % 5 == 3, F.concat(F.repeat(F.lit("/sub"), 10),
                                   F.lit("/leaf"), ds))
        .otherwise(F.concat(F.lit("/search?q="),
                            F.repeat(F.lit("x"),
                                     (d % 120).cast("int")))))
    return F.concat(F.lit("https://"), host, path)


def _urlfilter_url_py(doc_id: int) -> str:
    host = _UF_HOSTS[doc_id % 7]
    m = doc_id % 5
    if m == 0:
        path = "/"
    elif m == 1:
        path = f"/a/b/c/page{doc_id}.html"
    elif m == 2:
        path = f"/img/pic{doc_id}.png"
    elif m == 3:
        path = "/sub" * 10 + f"/leaf{doc_id}"
    else:
        path = "/search?q=" + "x" * (doc_id % 120)
    return "https://" + host + path


INCR_SPLIT = 300
INCR = dict(threshold=0.9, max_bucket=64)


def _q_dedup_incremental(spark: SparkSession, sf_dir: str) -> DataFrame:
    """Incremental near-dup dedup (functions/dedup.py
    minhash_lsh_incremental): the rolling-crawl shape — a new batch's
    signatures joined against a persisted (id, sig) store through the
    shared capped-bucket kernel; store-vs-store pairs skipped, MinHash
    estimate verification (the store holds no text). Fixture: docs
    ≥ INCR_SPLIT form the new batch, every third one a near-copy of
    the store doc INCR_SPLIT below it."""
    from nipper_spark.functions.dedup import (minhash_lsh_incremental,
                                              minhash_store)
    docs = spark.read.parquet(f"{sf_dir}/documents.parquet")
    old = docs.filter(F.col("doc_id") < INCR_SPLIT) \
              .select("doc_id", "text")
    new_raw = docs.filter(F.col("doc_id") >= INCR_SPLIT) \
                  .select("doc_id", "text")
    src = old.select((F.col("doc_id") + INCR_SPLIT).alias("doc_id"),
                     F.col("text").alias("_old_text"))
    new = (new_raw.join(src, "doc_id", "left")
           .select("doc_id",
                   F.when((F.col("doc_id") % 3 == 0)
                          & F.col("_old_text").isNotNull(),
                          F.concat(F.col("_old_text"),
                                   F.lit(" fresh crawl tail")))
                   .otherwise(F.col("text")).alias("text")))
    store = minhash_store(old)
    return minhash_lsh_incremental(new, store, **INCR)


def _o_dedup_incremental() -> str:
    import duckdb
    from nipper_spark.functions.dedup import (
        minhash_lsh_incremental_oracle)
    con = duckdb.connect()
    docs = con.sql(
        f"SELECT doc_id, text FROM '{ORACLE_SF}/documents.parquet' "
        "ORDER BY doc_id").fetchall()
    con.close()
    old = [(d, t) for d, t in docs if d < INCR_SPLIT]
    old_by_id = dict(old)
    new = []
    for d, t in docs:
        if d < INCR_SPLIT:
            continue
        if d % 3 == 0 and (d - INCR_SPLIT) in old_by_id:
            t = old_by_id[d - INCR_SPLIT] + " fresh crawl tail"
        new.append((d, t))
    rows = minhash_lsh_incremental_oracle(new, old, **INCR)
    return _values_sql(rows, [
        ("id_a", "BIGINT"), ("id_b", "BIGINT"),
        ("n_sig_matches", "INTEGER")])


def _q_dedup_exact_incremental(spark: SparkSession,
                               sf_dir: str) -> DataFrame:
    """Incremental EXACT dedup (functions/dedup.py
    dedup_exact_incremental): new batch hashes vs the persisted
    16-byte-per-class store; survives iff unseen AND batch min-id.
    Fixture: docs ≥ INCR_SPLIT are the batch — every fourth is an
    exact copy of a store doc (seen), every doc with d%4==1 shares a
    batch-local synthetic text with its 20-block (intra-batch dup
    groups), the rest are unique. Oracle is genuine SQL (same md5/
    normalization expressions the exact-dedup oracles already use)."""
    from nipper_spark.functions.dedup import (dedup_exact_incremental,
                                              seen_text_hashes)
    docs = spark.read.parquet(f"{sf_dir}/documents.parquet")
    old = docs.filter(F.col("doc_id") < INCR_SPLIT) \
              .select("doc_id", "text")
    new_raw = docs.filter(F.col("doc_id") >= INCR_SPLIT) \
                  .select("doc_id", "text")
    src = old.select((F.col("doc_id") + INCR_SPLIT).alias("doc_id"),
                     F.col("text").alias("_old_text"))
    d = F.col("doc_id")
    new = (new_raw.join(src, "doc_id", "left")
           .select("doc_id",
                   F.when((d % 4 == 0) & F.col("_old_text").isNotNull(),
                          F.col("_old_text"))
                   .when(d % 4 == 1,
                         F.concat(F.lit("shared batch text "),
                                  (d - d % 20).cast("string")))
                   .otherwise(F.col("text")).alias("text")))
    return dedup_exact_incremental(new, seen_text_hashes(old))


def _o_dedup_exact_incremental() -> str:
    return f"""
WITH old AS (
  SELECT DISTINCT md5({_NORM}) AS text_hash
  FROM documents WHERE doc_id < {INCR_SPLIT}),
newb AS (
  SELECT n.doc_id,
         CASE WHEN n.doc_id % 4 = 0 AND o.text IS NOT NULL THEN o.text
              WHEN n.doc_id % 4 = 1 THEN 'shared batch text ' ||
                   CAST(n.doc_id - n.doc_id % 20 AS VARCHAR)
              ELSE n.text END AS text
  FROM documents n
  LEFT JOIN documents o ON o.doc_id = n.doc_id - {INCR_SPLIT}
  WHERE n.doc_id >= {INCR_SPLIT}),
h AS (
  SELECT doc_id, md5({_NORM}) AS text_hash FROM newb)
SELECT h.doc_id, h.text_hash,
       (old.text_hash IS NULL
        AND h.doc_id = min(h.doc_id) OVER (PARTITION BY h.text_hash))
           AS is_new
FROM h LEFT JOIN old ON h.text_hash = old.text_hash
""".strip()


def _q_embedding_neardup_incremental(spark: SparkSession,
                                     sf_dir: str) -> DataFrame:
    """Incremental embedding near-dup (functions/similarity.py
    embedding_near_dup_incremental): the store is the corpus; the new
    batch re-keys every 25th vector to +1M and every 50th to +2M
    (exact copies → cosine-1.0 pairs against the store AND within the
    batch); store-vs-store pairs are skipped by construction."""
    from nipper_spark.functions.similarity import (
        embedding_near_dup_incremental)
    base = spark.read.parquet(f"{sf_dir}/embeddings.parquet")
    new = (base.filter(F.col("vec_id") % 25 == 0)
           .withColumn("vec_id", F.col("vec_id") + F.lit(1_000_000))
           .unionByName(
               base.filter(F.col("vec_id") % 50 == 0)
               .withColumn("vec_id",
                           F.col("vec_id") + F.lit(2_000_000))))
    return embedding_near_dup_incremental(
        new, base, threshold=NEARDUP["threshold"],
        n_bits=NEARDUP["n_bits"], bands=NEARDUP["bands"],
        seed=NEARDUP["seed"], max_bucket=NEARDUP["max_bucket"]).select(
        F.col("id_a").cast("bigint").alias("id_a"),
        F.col("id_b").cast("bigint").alias("id_b"))


def _o_embedding_neardup_incremental() -> str:
    import numpy as np
    from nipper_spark.functions.dedup import bucket_candidate_pairs
    from nipper_spark.functions.similarity import _hyperplanes
    ids, m = _read_emb_sf001()
    new_mask25 = ids % 25 == 0
    new_mask50 = ids % 50 == 0
    aug_ids = np.concatenate([ids, ids[new_mask25] + 1_000_000,
                              ids[new_mask50] + 2_000_000])
    aug_m = np.concatenate([m, m[new_mask25], m[new_mask50]])
    dim = aug_m.shape[1]
    planes = _hyperplanes(dim, NEARDUP["n_bits"], NEARDUP["seed"])
    bits_per_band = NEARDUP["n_bits"] // NEARDUP["bands"]
    weights = (1 << np.arange(bits_per_band)).astype(np.int64)
    signs = (aug_m @ planes) > 0
    buckets: dict = {}
    for i in range(len(aug_ids)):
        for b in range(NEARDUP["bands"]):
            code = int((signs[i][b * bits_per_band:(b + 1) * bits_per_band]
                        * weights).sum()) + (b << 24)
            buckets.setdefault(code, []).append(i)
    norms = np.linalg.norm(aug_m, axis=1, keepdims=True)
    norm = aug_m / np.where(norms == 0, 1.0, norms)
    idx_of = {int(aug_ids[i]): i for i in range(len(aug_ids))}
    pairs = set()
    for members in buckets.values():
        pairs.update(bucket_candidate_pairs(
            [int(aug_ids[i]) for i in members], NEARDUP["max_bucket"]))
    rows = []
    for ia, ib in sorted(pairs):
        if ia < 1_000_000 and ib < 1_000_000:
            continue  # store-vs-store: skipped by the incremental op
        cos = float((norm[idx_of[ia]] * norm[idx_of[ib]]).sum())
        if cos >= NEARDUP["threshold"]:
            rows.append((ia, ib))
    return _values_sql(rows, [("id_a", "BIGINT"), ("id_b", "BIGINT")])


DSTORE = dict(threshold=0.8)


def _dstore_batches_py(docs: list) -> list:
    """Batch synthesis for the rolling-dedup-store gate. Batch 0 =
    docs [300,400) with an intra-batch shared-text group per 20-block
    (d%10==1); batch 1 = docs [400,500) where d%5==0 is an exact copy
    of the batch-0 doc 100 below, d%5==1 a near-copy of it, the rest
    unique. ``docs`` is the sorted [(doc_id, text)] table."""
    by_id = dict(docs)

    def b0_text(d):
        if d % 10 == 1:
            return "batch zero shared text " + str(d - d % 20)
        return by_id[d]

    batch0 = [(d, b0_text(d)) for d in range(300, 400)]
    b0_by_id = dict(batch0)

    def b1_text(d):
        if d % 5 == 0:
            return b0_by_id[d - 100]
        if d % 5 == 1:
            return b0_by_id[d - 100] + " extra trailing words here"
        return by_id[d]

    batch1 = [(d, b1_text(d)) for d in range(400, 500)]
    return [batch0, batch1]


def _q_dedup_rolling_store(spark: SparkSession, sf_dir: str) -> DataFrame:
    """Versioned rolling dedup state (functions/dedup_store.py): two
    batches ingested through exact→near-dup incremental dedup with
    atomic per-batch commits; returns every document's disposition.
    The state dir is a fresh tempdir per run — the result depends only
    on the corpus."""
    from nipper_spark.functions.dedup_store import DedupStore
    docs = spark.read.parquet(f"{sf_dir}/documents.parquet") \
        .select("doc_id", "text") \
        .filter((F.col("doc_id") >= 300) & (F.col("doc_id") < 500))
    # bounded fixture collect: exactly 200 rows, pushdown-pruned —
    # batch synthesis is shared verbatim with the oracle twin
    rows = sorted((r["doc_id"], r["text"]) for r in docs.collect())
    batch0, batch1 = _dstore_batches_py(rows)
    store = DedupStore(spark, tempfile.mkdtemp(prefix="nipper_dstore_"),
                       **DSTORE)
    d1 = store.ingest_batch(
        1, spark.createDataFrame(batch0, "doc_id long, text string"))
    d2 = store.ingest_batch(
        2, spark.createDataFrame(batch1, "doc_id long, text string"))
    return (d1.select("doc_id", F.lit(0).alias("batch"), "disposition")
            .unionByName(d2.select("doc_id", F.lit(1).alias("batch"),
                                   "disposition")))


def _o_dedup_rolling_store() -> str:
    import duckdb
    from nipper_spark.functions.dedup_store import dedup_store_oracle
    con = duckdb.connect()
    docs = con.sql(
        f"SELECT doc_id, text FROM '{ORACLE_SF}/documents.parquet' "
        "WHERE doc_id >= 300 ORDER BY doc_id").fetchall()
    con.close()
    rows = dedup_store_oracle(_dstore_batches_py(docs), **DSTORE)
    return _values_sql(rows, [
        ("doc_id", "BIGINT"), ("batch", "INTEGER"),
        ("disposition", "VARCHAR")])


_MOJI_SUFFIX = " café déjà naïve ok."


def _moji_times(doc_id: int) -> int:
    return (1 if doc_id % 2 == 0 else 0) + (1 if doc_id % 4 == 0 else 0)


def _moji_page_py(doc_id: int, text: str) -> str:
    from nipper_spark.functions.mojibake import corrupt_utf8_as_cp1252
    return corrupt_utf8_as_cp1252(text[:60] + _MOJI_SUFFIX,
                                  _moji_times(doc_id))


def _q_doc_fix_mojibake(spark: SparkSession, sf_dir: str) -> DataFrame:
    """Mojibake repair (functions/mojibake.py): strict cp1252→utf-8
    roundtrip behind marker detection, one Arrow boundary, shared
    kernel with the oracle. Fixture: accented suffix corrupted 0/1/2
    times per doc_id parity."""
    from nipper_spark.functions.mojibake import fix_mojibake

    @F.pandas_udf("string")
    def _corrupt(doc_id: pd.Series, text: pd.Series) -> pd.Series:
        return pd.Series([_moji_page_py(d, t)
                          for d, t in zip(doc_id, text)])

    docs = spark.read.parquet(f"{sf_dir}/documents.parquet")
    paged = docs.select(
        "doc_id", _corrupt(F.col("doc_id"), F.col("text")).alias("text"))
    return fix_mojibake(paged)


def _o_doc_fix_mojibake() -> str:
    import duckdb
    from nipper_spark.functions.mojibake import fix_mojibake_oracle
    con = duckdb.connect()
    docs = con.sql(
        f"SELECT doc_id, text FROM '{ORACLE_SF}/documents.parquet' "
        "ORDER BY doc_id").fetchall()
    con.close()
    rows = fix_mojibake_oracle(
        [(d, _moji_page_py(d, t)) for d, t in docs])
    return _values_sql(rows, [
        ("doc_id", "BIGINT"), ("changed", "BOOLEAN"),
        ("n_iters", "INTEGER"), ("fixed_md5", "VARCHAR")])


_TRAP_URLS_CTE = """
SELECT 'https://' ||
  CASE WHEN doc_id % 5 < 2
       THEN 'trap' || CAST(doc_id % 2 AS VARCHAR) || '.example.com'
       ELSE 'ok' || CAST(doc_id % 23 AS VARCHAR) || '.example.net' END ||
  CASE WHEN doc_id % 5 < 2
       THEN '/cal/' || CAST(doc_id AS VARCHAR)
            || '/day' || CAST((doc_id * 7) % 1000 AS VARCHAR)
       WHEN doc_id % 3 = 0 THEN '/about'
       WHEN doc_id % 3 = 1 THEN '/p/' || CAST(doc_id AS VARCHAR)
       ELSE '/tag/x' || CAST(doc_id % 7 AS VARCHAR) END AS url
FROM documents
""".strip()


def _trap_url_expr():
    """Candidate-URL synthesis for the trap detector: two 'trap' hosts
    absorb 40% of the corpus behind a single digit-varying calendar
    template; 23 'ok' hosts share the rest across real templates.
    `_TRAP_URLS_CTE` is the same synthesis in ANSI SQL — this query's
    oracle is genuine SQL end-to-end, not a VALUES twin."""
    d = F.col("doc_id")
    ds = d.cast("string")
    host = F.when(d % 5 < 2,
                  F.concat(F.lit("trap"), (d % 2).cast("string"),
                           F.lit(".example.com"))).otherwise(
        F.concat(F.lit("ok"), (d % 23).cast("string"),
                 F.lit(".example.net")))
    path = (F.when(d % 5 < 2,
                   F.concat(F.lit("/cal/"), ds, F.lit("/day"),
                            ((d * 7) % 1000).cast("string")))
            .when(d % 3 == 0, F.lit("/about"))
            .when(d % 3 == 1, F.concat(F.lit("/p/"), ds))
            .otherwise(F.concat(F.lit("/tag/x"),
                                (d % 7).cast("string"))))
    return F.concat(F.lit("https://"), host, path)


def _q_host_trap_stats(spark: SparkSession, sf_dir: str) -> DataFrame:
    """Crawler-trap detection (crawl/traps.py): digit-run URL
    templates, one two-phase count-distinct agg on host — the hotter
    the trap, the cheaper its shuffle."""
    from nipper_spark.crawl.traps import host_trap_stats
    docs = spark.read.parquet(f"{sf_dir}/documents.parquet")
    cands = docs.select(_trap_url_expr().alias("url"))
    return host_trap_stats(cands)


def _q_url_frontier_filter(spark: SparkSession, sf_dir: str) -> DataFrame:
    """Frontier URL hygiene filter (crawl/urlfilter.py): blocklist as
    a broadcast join on the derived registered domain, extension/
    query/depth rules as pure Catalyst string arithmetic — zero
    Python, candidates never shuffle."""
    from nipper_spark.crawl.urlfilter import url_frontier_filter
    docs = spark.read.parquet(f"{sf_dir}/documents.parquet")
    cands = docs.select(_urlfilter_url_expr().alias("url"))
    return url_frontier_filter(cands,
                               blocked_domains=list(URLFILTER_BLOCKED))


DECON = dict(width=8, min_hits=1)


def _q_doc_decontam(spark: SparkSession, sf_dir: str) -> DataFrame:
    """Benchmark decontamination (functions/decontam.py): flag docs
    sharing any 8-word-gram with the benchmark set. The benchmark is
    synthesized deterministically as a 16-word snippet of every 17th
    doc (an 'eval question copied from the web'), so contaminated
    docs = those sources + their exact duplicates."""
    from nipper_spark.functions.decontam import decontaminate
    docs = spark.read.parquet(f"{sf_dir}/documents.parquet")
    bench = docs.filter(F.col("doc_id") % 17 == 0).select(
        F.array_join(
            F.slice(F.split(F.trim(F.col("text")), r"\s+"), 11, 16),
            " ").alias("text"))
    return decontaminate(docs, bench, **DECON)


def _q_doc_repeated_spans(spark: SparkSession, sf_dir: str) -> DataFrame:
    """Repeated-span boilerplate removal (functions/boilerplate.py):
    word-5-gram windows shared by >max_docs documents are stripped
    everywhere they occur (exact-substring dedup, Lee et al. 2022
    shape). Output hashes the cleaned text so the VALUES oracle stays
    compact; shuffles carry (id, pos, gram_hash) only."""
    from nipper_spark.functions.boilerplate import remove_repeated_spans
    docs = spark.read.parquet(f"{sf_dir}/documents.parquet")
    out = remove_repeated_spans(docs, **SPANS)
    return out.select(F.col("doc_id").cast("bigint").alias("doc_id"),
                      F.md5("text_clean").alias("clean_md5"),
                      F.col("n_words").cast("int").alias("n_words"),
                      F.col("n_removed").cast("int").alias("n_removed"))


def _q_doc_pii_scrub(spark: SparkSession, sf_dir: str) -> DataFrame:
    """PII scrubbing (emails / IPv4 / phone runs -> typed placeholders,
    functions/pii.py): pure-Catalyst regexp chain, patterns restricted
    to the Java-regex ∩ RE2 subset so DuckDB asserts the scrubbed text
    hash exactly. Deterministic PII is injected per doc_id so every
    row exercises all three categories."""
    from nipper_spark.functions.pii import pii_count_cols, scrub_pii_col
    docs = spark.read.parquet(f"{sf_dir}/documents.parquet")
    injected = F.concat(
        F.col("text"), F.lit(" contact user"),
        F.col("doc_id").cast("string"), F.lit("@example.com at 10.2."),
        (F.col("doc_id") % 256).cast("string"),
        F.lit(".7 or +1 (555) 010-12"),
        F.lpad((F.col("doc_id") % 100).cast("string"), 2, "0"))
    d = docs.select(F.col("doc_id").cast("bigint").alias("doc_id"),
                    injected.alias("_t"))
    return d.select(
        "doc_id",
        F.md5(scrub_pii_col("_t")).alias("clean_md5"),
        *[c.cast("int").alias(n) for c, n in
          zip(pii_count_cols("_t"), ("n_emails", "n_ips", "n_phones"))])


def _o_doc_pii_scrub() -> str:
    from nipper_spark.functions.pii import PII_EMAIL, PII_IPV4, PII_PHONE
    return f"""
WITH t AS (
  SELECT doc_id,
         text || ' contact user' || CAST(doc_id AS VARCHAR)
              || '@example.com at 10.2.'
              || CAST(doc_id % 256 AS VARCHAR)
              || '.7 or +1 (555) 010-12'
              || lpad(CAST(doc_id % 100 AS VARCHAR), 2, '0') AS _t
  FROM documents)
SELECT CAST(doc_id AS BIGINT) AS doc_id,
       md5(regexp_replace(regexp_replace(regexp_replace(_t,
           '{PII_EMAIL}', '<EMAIL>', 'g'),
           '{PII_IPV4}', '<IP>', 'g'),
           '{PII_PHONE}', '<PHONE>', 'g')) AS clean_md5,
       CAST(len(regexp_extract_all(_t, '{PII_EMAIL}')) AS INTEGER)
           AS n_emails,
       CAST(len(regexp_extract_all(_t, '{PII_IPV4}')) AS INTEGER)
           AS n_ips,
       CAST(len(regexp_extract_all(_t, '{PII_PHONE}')) AS INTEGER)
           AS n_phones
FROM t
"""


def _q_round_skew(spark: SparkSession, sf_dir: str) -> DataFrame:
    """Per-round skew metrics over the crawl's round_log (SURVEY §1.3:
    per-partition lineage + skew stats): the public round_metrics
    query recomputes max / nearest-rank-p99 / max-share of per-bucket
    fresh counts distributively from the log's bucket rows."""
    from nipper_spark.crawl.frontier import FrontierEngine, round_metrics
    from nipper_spark.crawl.state import ROUND_LOG_SCHEMA, CrawlState
    pages = _synth_pages(spark)
    state_dir = _tmp_state_dir("nipper_skew_q_")
    eng = FrontierEngine(spark, pages, state_dir, _crawl_policy())
    eng.bootstrap(_crawl_seeds())
    for r in range(CRAWL_ROUNDS):
        eng.run_round(r)
    st = CrawlState(spark, state_dir)
    log = st.read_all_rounds("round_log", CRAWL_ROUNDS - 1,
                             ROUND_LOG_SCHEMA)
    return (round_metrics(log)
            .select(F.col("round").cast("int").alias("round"),
                    F.col("active_buckets").cast("bigint")
                    .alias("active_buckets"),
                    F.col("fresh").cast("bigint").alias("fresh"),
                    F.col("max_bucket_fresh").cast("bigint")
                    .alias("max_bucket_fresh"),
                    F.col("p99_bucket_fresh").cast("bigint")
                    .alias("p99_bucket_fresh"),
                    "max_bucket_share")
            .orderBy("round"))


def _o_round_skew() -> str:
    from nipper_spark.crawl.oracle import crawl_oracle
    from nipper_spark.crawl.state import bucket_skew
    from nipper_spark.sources.synthetic import synth_pages_rows
    pages = {u: h for (u, _, h, _, _) in synth_pages_rows(**CRAWL_PAGES)}
    res = crawl_oracle(pages, _crawl_seeds(), _crawl_policy(),
                       max_rounds=CRAWL_ROUNDS)
    rows = []
    for r in range(CRAWL_ROUNDS):
        buckets = (res.fresh_buckets[r]
                   if r < len(res.fresh_buckets) else {})
        mx, p99, share = bucket_skew(buckets.values())
        rows.append((r, len(buckets), sum(buckets.values()),
                     mx, p99, float(share)))
    return _values_sql(rows, [
        ("round", "INTEGER"), ("active_buckets", "BIGINT"),
        ("fresh", "BIGINT"), ("max_bucket_fresh", "BIGINT"),
        ("p99_bucket_fresh", "BIGINT"), ("max_bucket_share", "DOUBLE")])


def _q_doc_exact_dups(spark: SparkSession, sf_dir: str) -> DataFrame:
    """The test corpus carries no exact duplicates, so the operator is
    exercised on docs ∪ a re-keyed copy of every 25th doc — the oracle
    mirrors the augmentation, making the group output NON-empty (an
    empty-vs-empty hash match proves nothing)."""
    from nipper_spark.functions.dedup import exact_dup_groups
    base = spark.read.parquet(f"{sf_dir}/documents.parquet") \
        .select("doc_id", "text")
    docs = base.unionByName(
        base.filter(F.col("doc_id") % 25 == 0)
        .withColumn("doc_id", F.col("doc_id") + F.lit(1_000_000)))
    g = exact_dup_groups(docs)
    return g.select(
        "text_hash",
        F.col("n_dups").cast("bigint").alias("n_dups"),
        F.col("keep_id").cast("bigint").alias("keep_id"),
        F.array_join(F.transform("dup_ids", lambda x: x.cast("string")),
                     ",").alias("dup_ids"))


def _q_dedup_exact_survivors(spark: SparkSession, sf_dir: str) -> DataFrame:
    from nipper_spark.functions.dedup import dedup_exact
    docs = spark.read.parquet(f"{sf_dir}/documents.parquet")
    return dedup_exact(docs).select(F.col("doc_id").cast("bigint")
                                    .alias("doc_id"))


def _q_doc_tokens(spark: SparkSession, sf_dir: str) -> DataFrame:
    from nipper_spark.functions.text_udfs import (
        bpe_ish_token_count, whitespace_token_count)
    docs = spark.read.parquet(f"{sf_dir}/documents.parquet")
    return docs.select(
        F.col("doc_id").cast("bigint").alias("doc_id"),
        whitespace_token_count("text").cast("int").alias("ws_tokens"),
        bpe_ish_token_count("text").cast("int").alias("bpe_tokens"))


def _q_doc_quality(spark: SparkSession, sf_dir: str) -> DataFrame:
    from nipper_spark.functions.text_udfs import quality_columns, quality_score
    docs = spark.read.parquet(f"{sf_dir}/documents.parquet")
    return docs.select(
        F.col("doc_id").cast("bigint").alias("doc_id"),
        *[c for c in quality_columns("text")],
        quality_score("text"),
    ).select("doc_id",
             F.col("n_chars").cast("int").alias("n_chars"),
             F.col("n_words").cast("int").alias("n_words"),
             "punct_ratio", "stopword_ratio", "quality")


def _q_doc_lang(spark: SparkSession, sf_dir: str) -> DataFrame:
    from nipper_spark.functions.text_udfs import lang_id_udf
    docs = spark.read.parquet(f"{sf_dir}/documents.parquet")
    return (docs.select(lang_id_udf()(F.col("text")).alias("lang_pred"))
            .groupBy("lang_pred")
            .agg(F.count("*").cast("bigint").alias("n"))
            .orderBy("lang_pred"))


def _q_doc_fingerprints(spark: SparkSession, sf_dir: str) -> DataFrame:
    from nipper_spark.functions.text_udfs import fingerprint_udf
    docs = spark.read.parquet(f"{sf_dir}/documents.parquet")
    return docs.select(F.col("doc_id").cast("bigint").alias("doc_id"),
                       fingerprint_udf()(F.col("text")).alias("fingerprint"))


VOCAB = dict(k=500)


def _q_doc_vocab_stats(spark: SparkSession, sf_dir: str) -> DataFrame:
    """Frequency-rank vocabulary profile per document (the cheap
    LLM-curation stand-in for LM perplexity): exact integer counters +
    single divisions of exact integers, so the DuckDB twin reproduces
    every double bit-for-bit."""
    from nipper_spark.functions.text_udfs import doc_vocab_stats
    docs = spark.read.parquet(f"{sf_dir}/documents.parquet")
    out = doc_vocab_stats(docs, k=VOCAB["k"])
    return out.select(
        F.col("doc_id").cast("bigint").alias("doc_id"),
        F.col("n_tokens").cast("bigint").alias("n_tokens"),
        F.col("n_oov").cast("bigint").alias("n_oov"),
        "oov_ratio", "mean_rank")


def _q_source_stats(spark: SparkSession, sf_dir: str) -> DataFrame:
    from nipper_spark.functions.text_udfs import source_stats
    docs = spark.read.parquet(f"{sf_dir}/documents.parquet")
    out = source_stats(docs)
    return out.select(
        "source",
        F.col("n_docs").cast("bigint").alias("n_docs"),
        F.col("total_chars").cast("bigint").alias("total_chars"),
        "mean_chars",
        F.col("n_langs").cast("bigint").alias("n_langs"),
        F.col("n_distinct_texts").cast("bigint")
        .alias("n_distinct_texts"))


_O_VOCAB_STATS = r"""
WITH toks0 AS (
  SELECT doc_id,
         unnest(regexp_split_to_array(lower(trim(text)), '\s+')) AS word
  FROM documents
), toks AS (SELECT * FROM toks0 WHERE word <> ''),
counts AS (SELECT word, count(*) AS n FROM toks GROUP BY word),
vocab AS (
  SELECT word, row_number() OVER (ORDER BY n DESC, word) AS rank
  FROM counts ORDER BY n DESC, word LIMIT 500
)
SELECT CAST(t.doc_id AS BIGINT) AS doc_id,
       CAST(count(*) AS BIGINT) AS n_tokens,
       CAST(sum(CASE WHEN v.rank IS NULL THEN 1 ELSE 0 END) AS BIGINT)
           AS n_oov,
       CAST(sum(CASE WHEN v.rank IS NULL THEN 1 ELSE 0 END) AS DOUBLE)
           / count(*) AS oov_ratio,
       CASE WHEN count(v.rank) > 0
            THEN CAST(sum(v.rank) AS DOUBLE) / count(v.rank) END
           AS mean_rank
FROM toks t LEFT JOIN vocab v USING (word)
GROUP BY t.doc_id
"""

_O_SOURCE_STATS = """
SELECT source,
       CAST(count(*) AS BIGINT) AS n_docs,
       CAST(sum(length(text)) AS BIGINT) AS total_chars,
       CAST(sum(length(text)) AS DOUBLE) / count(*) AS mean_chars,
       CAST(count(DISTINCT lang) AS BIGINT) AS n_langs,
       CAST(count(DISTINCT md5(text)) AS BIGINT) AS n_distinct_texts
FROM documents GROUP BY source
"""


def _q_minhash(spark: SparkSession, sf_dir: str) -> DataFrame:
    from nipper_spark.functions.dedup import minhash_lsh_pairs
    docs = spark.read.parquet(f"{sf_dir}/documents.parquet")
    return minhash_lsh_pairs(
        docs, num_perm=MINHASH["num_perm"], bands=MINHASH["bands"],
        ngram=MINHASH["ngram"], threshold=MINHASH["threshold"],
        seed=MINHASH["seed"], max_bucket=MINHASH["max_bucket"]).select(
            F.col("id_a").cast("bigint").alias("id_a"),
            F.col("id_b").cast("bigint").alias("id_b"), "jaccard")


def _q_cluster_survivors(spark: SparkSession, sf_dir: str) -> DataFrame:
    """Near-dup PAIR edges → connected components (iterative min-label
    propagation) → one min-id survivor per cluster."""
    from nipper_spark.functions.dedup import (
        minhash_lsh_pairs, near_dup_survivors)
    docs = spark.read.parquet(f"{sf_dir}/documents.parquet")
    pairs = minhash_lsh_pairs(
        docs, num_perm=MINHASH["num_perm"], bands=MINHASH["bands"],
        ngram=MINHASH["ngram"], threshold=MINHASH["threshold"],
        seed=MINHASH["seed"], max_bucket=MINHASH["max_bucket"])
    return near_dup_survivors(docs, pairs).select(
        F.col("doc_id").cast("bigint").alias("doc_id"))


def _o_cluster_survivors() -> str:
    """Single-threaded twin: same LSH pair generation as _o_minhash,
    then union-find, min-id survivor per component."""
    from nipper_spark.functions.dedup import (
        _minhash_params, bucket_candidate_pairs, minhash_signature,
        ngram_jaccard)
    ids, texts = _read_docs_sf001()
    params = _minhash_params(MINHASH["num_perm"], MINHASH["seed"])
    rpb = MINHASH["num_perm"] // MINHASH["bands"]
    buckets: dict = {}
    for i, t in zip(ids, texts):
        sig = minhash_signature(str(t or ""), MINHASH["num_perm"],
                                MINHASH["ngram"], params)
        for b in range(MINHASH["bands"]):
            key = (b, tuple(sig[b * rpb:(b + 1) * rpb]))
            buckets.setdefault(key, []).append(i)
    textmap = dict(zip(ids, texts))
    parent: dict = {}

    def find(x):
        while parent.get(x, x) != x:
            parent[x] = parent.get(parent[x], parent[x])
            x = parent[x]
        return x

    def union(x, y):
        rx, ry = find(x), find(y)
        if rx != ry:
            parent[max(rx, ry)] = min(rx, ry)

    seen_pairs = set()
    for members in buckets.values():
        for p in bucket_candidate_pairs(members, MINHASH["max_bucket"]):
            if p in seen_pairs:
                continue
            seen_pairs.add(p)
            if ngram_jaccard(str(textmap[p[0]] or ""),
                             str(textmap[p[1]] or ""),
                             MINHASH["ngram"]) >= MINHASH["threshold"]:
                union(*p)
    survivors = sorted(i for i in ids if find(i) == i)
    return _values_sql([(s,) for s in survivors], [("doc_id", "BIGINT")])


NGRAM_J = dict(ngram=3, threshold=0.8, block_words=5, max_bucket=64)


def _q_ngram_jaccard(spark: SparkSession, sf_dir: str) -> DataFrame:
    from nipper_spark.functions.dedup import ngram_jaccard_pairs
    docs = spark.read.parquet(f"{sf_dir}/documents.parquet")
    return ngram_jaccard_pairs(
        docs, ngram=NGRAM_J["ngram"], threshold=NGRAM_J["threshold"],
        block_words=NGRAM_J["block_words"],
        max_bucket=NGRAM_J["max_bucket"]).select(
        F.col("id_a").cast("bigint").alias("id_a"),
        F.col("id_b").cast("bigint").alias("id_b"), "jaccard")


def _o_ngram_jaccard() -> str:
    from nipper_spark.functions.dedup import (
        bucket_candidate_pairs, ngram_jaccard)
    ids, texts = _read_docs_sf001()
    blocks: dict = {}
    for i, t in zip(ids, texts):
        words = str(t or "").strip().lower().split()
        key = " ".join(words[:NGRAM_J["block_words"]])
        blocks.setdefault(key, []).append((i, str(t or "")))
    rows = []
    for members in blocks.values():
        textmap = dict(members)
        for a, b in bucket_candidate_pairs([i for i, _ in members],
                                           NGRAM_J["max_bucket"]):
            j = ngram_jaccard(textmap[a], textmap[b], NGRAM_J["ngram"])
            if j >= NGRAM_J["threshold"]:
                rows.append((a, b, j))
    rows.sort()
    return _values_sql(rows, [("id_a", "BIGINT"), ("id_b", "BIGINT"),
                              ("jaccard", "DOUBLE")])


def _q_simhash(spark: SparkSession, sf_dir: str) -> DataFrame:
    from nipper_spark.functions.dedup import simhash_near_dups
    docs = spark.read.parquet(f"{sf_dir}/documents.parquet")
    return simhash_near_dups(
        docs, max_hamming=SIMHASH["max_hamming"],
        prefix_bits=SIMHASH["prefix_bits"], ngram=SIMHASH["ngram"],
        max_bucket=SIMHASH["max_bucket"]).select(
            F.col("id_a").cast("bigint").alias("id_a"),
            F.col("id_b").cast("bigint").alias("id_b"),
            F.col("hamming").cast("int").alias("hamming"))


def _ann_queries(sf_dir: str):
    import pyarrow.parquet as pq
    t = pq.read_table(f"{sf_dir}/embeddings.parquet",
                      columns=["vec_id", "embedding"])
    ids = t["vec_id"].to_pylist()[:ANN["n_queries"]]
    vecs = t["embedding"].to_pylist()[:ANN["n_queries"]]
    return list(zip(ids, vecs))


def _q_ann_brute(spark: SparkSession, sf_dir: str) -> DataFrame:
    from nipper_spark.functions.similarity import ann_brute_topk
    emb = spark.read.parquet(f"{sf_dir}/embeddings.parquet")
    return ann_brute_topk(emb, _ann_queries(sf_dir), k=ANN["k"]).select(
        F.col("query_id").cast("bigint").alias("query_id"),
        F.col("rank").cast("int").alias("rank"),
        F.col("vec_id").cast("bigint").alias("vec_id"))


def _q_ann_lsh(spark: SparkSession, sf_dir: str) -> DataFrame:
    from nipper_spark.functions.similarity import ann_lsh_topk
    emb = spark.read.parquet(f"{sf_dir}/embeddings.parquet")
    return ann_lsh_topk(emb, _ann_queries(sf_dir), k=LSH_ANN["k"],
                        n_bits=LSH_ANN["n_bits"], bands=LSH_ANN["bands"],
                        seed=LSH_ANN["seed"]).select(
        F.col("query_id").cast("bigint").alias("query_id"),
        F.col("rank").cast("int").alias("rank"),
        F.col("vec_id").cast("bigint").alias("vec_id"))


def _q_ann_lsh_df(spark: SparkSession, sf_dir: str) -> DataFrame:
    """Query-TABLE LSH: both sides band-bucket through the same UDF and
    equi-join on the bucket — the query side is a DataFrame end to end
    (no driver collect)."""
    from nipper_spark.functions.similarity import ann_lsh_topk_df
    emb = spark.read.parquet(f"{sf_dir}/embeddings.parquet")
    qdf = (emb.orderBy("vec_id").limit(ANN["n_queries"])
           .select(F.col("vec_id").alias("query_id"),
                   F.col("embedding").alias("q_embedding")))
    return ann_lsh_topk_df(
        emb, qdf, k=LSH_ANN["k"], n_bits=LSH_ANN["n_bits"],
        bands=LSH_ANN["bands"], seed=LSH_ANN["seed"]).select(
        F.col("query_id").cast("bigint").alias("query_id"),
        F.col("rank").cast("int").alias("rank"),
        F.col("vec_id").cast("bigint").alias("vec_id"))


IVF = dict(k=5, n_lists=8, n_probe=3, seed=42)


def _q_ann_ivf(spark: SparkSession, sf_dir: str) -> DataFrame:
    from nipper_spark.functions.similarity import ann_ivf_topk
    emb = spark.read.parquet(f"{sf_dir}/embeddings.parquet")
    return ann_ivf_topk(emb, _ann_queries(sf_dir), k=IVF["k"],
                        n_lists=IVF["n_lists"], n_probe=IVF["n_probe"],
                        seed=IVF["seed"]).select(
        F.col("query_id").cast("bigint").alias("query_id"),
        F.col("rank").cast("int").alias("rank"),
        F.col("vec_id").cast("bigint").alias("vec_id"))


def _o_ann_ivf() -> str:
    import numpy as np
    from nipper_spark.functions.similarity import (
        _kmeans_centroids, _normalize)
    ids, m = _read_emb_sf001()
    sample = m[np.argsort(ids)][:2048]
    cent = _kmeans_centroids(sample, IVF["n_lists"], seed=IVF["seed"])
    norm = _normalize(m.astype(np.float32))
    assign = np.argmax(norm @ cent.T, axis=1)
    rows = []
    for qi in range(ANN["n_queries"]):
        qsims = norm[qi] @ cent.T
        probe = set(np.argsort(-qsims, kind="stable")[:IVF["n_probe"]]
                    .tolist())
        cand = [i for i in range(len(ids)) if assign[i] in probe]
        scored = sorted(((-float((norm[i] * norm[qi]).sum()), int(ids[i]))
                         for i in cand))
        for rank, (_, vid) in enumerate(scored[:IVF["k"]], start=1):
            rows.append((int(ids[qi]), rank, vid))
    return _values_sql(rows, [("query_id", "BIGINT"), ("rank", "INTEGER"),
                              ("vec_id", "BIGINT")])


def _q_ann_ivf_df(spark: SparkSession, sf_dir: str) -> DataFrame:
    """Query-TABLE IVF: probe assignment happens in a pandas UDF over
    the broadcast centroids — the query side is a DataFrame end to end
    (no driver collect), the contract a 10⁷-row query table needs."""
    from nipper_spark.functions.similarity import ann_ivf_topk_df
    emb = spark.read.parquet(f"{sf_dir}/embeddings.parquet")
    qdf = (emb.orderBy("vec_id").limit(ANN["n_queries"])
           .select(F.col("vec_id").alias("query_id"),
                   F.col("embedding").alias("q_embedding")))
    return ann_ivf_topk_df(
        emb, qdf, k=IVF["k"], n_lists=IVF["n_lists"],
        n_probe=IVF["n_probe"], seed=IVF["seed"]).select(
        F.col("query_id").cast("bigint").alias("query_id"),
        F.col("rank").cast("int").alias("rank"),
        F.col("vec_id").cast("bigint").alias("vec_id"))


def _o_ann_ivf_df() -> str:
    """Same twin as _o_ann_ivf, but queries are the n_queries SMALLEST
    vec_ids (the DF variant picks them via orderBy/limit, not file
    order)."""
    import numpy as np
    from nipper_spark.functions.similarity import (
        _kmeans_centroids, _normalize)
    ids, m = _read_emb_sf001()
    order = np.argsort(ids)
    sample = m[order][:2048]
    cent = _kmeans_centroids(sample, IVF["n_lists"], seed=IVF["seed"])
    norm = _normalize(m.astype(np.float32))
    assign = np.argmax(norm @ cent.T, axis=1)
    rows = []
    for qi in order[:ANN["n_queries"]]:
        qsims = norm[qi] @ cent.T
        probe = set(np.argsort(-qsims, kind="stable")[:IVF["n_probe"]]
                    .tolist())
        cand = [i for i in range(len(ids)) if assign[i] in probe]
        scored = sorted(((-float((norm[i] * norm[qi]).sum()), int(ids[i]))
                         for i in cand))
        for rank, (_, vid) in enumerate(scored[:IVF["k"]], start=1):
            rows.append((int(ids[qi]), rank, vid))
    return _values_sql(rows, [("query_id", "BIGINT"), ("rank", "INTEGER"),
                              ("vec_id", "BIGINT")])


IVFPQ = dict(k=5, n_lists=8, m=8, k_pq=32, n_probe=4, rerank=8, seed=42)


def _q_ann_ivfpq(spark: SparkSession, sf_dir: str) -> DataFrame:
    from nipper_spark.functions.similarity import ann_ivfpq_topk
    emb = spark.read.parquet(f"{sf_dir}/embeddings.parquet")
    return ann_ivfpq_topk(
        emb, _ann_queries(sf_dir), k=IVFPQ["k"], n_lists=IVFPQ["n_lists"],
        m=IVFPQ["m"], k_pq=IVFPQ["k_pq"], n_probe=IVFPQ["n_probe"],
        rerank=IVFPQ["rerank"], seed=IVFPQ["seed"]).select(
        F.col("query_id").cast("bigint").alias("query_id"),
        F.col("rank").cast("int").alias("rank"),
        F.col("vec_id").cast("bigint").alias("vec_id"))


def _q_ann_ivfpq_df(spark: SparkSession, sf_dir: str) -> DataFrame:
    """Query-TABLE IVF-PQ: probe assignment + normalization in pandas
    UDFs over the broadcast model — query side never collected."""
    from nipper_spark.functions.similarity import ann_ivfpq_topk_df
    emb = spark.read.parquet(f"{sf_dir}/embeddings.parquet")
    qdf = (emb.orderBy("vec_id").limit(ANN["n_queries"])
           .select(F.col("vec_id").alias("query_id"),
                   F.col("embedding").alias("q_embedding")))
    return ann_ivfpq_topk_df(
        emb, qdf, k=IVFPQ["k"], n_lists=IVFPQ["n_lists"], m=IVFPQ["m"],
        k_pq=IVFPQ["k_pq"], n_probe=IVFPQ["n_probe"],
        rerank=IVFPQ["rerank"], seed=IVFPQ["seed"]).select(
        F.col("query_id").cast("bigint").alias("query_id"),
        F.col("rank").cast("int").alias("rank"),
        F.col("vec_id").cast("bigint").alias("vec_id"))


def _o_ann_ivfpq_df() -> str:
    """_o_ann_ivfpq with queries = the n_queries SMALLEST vec_ids
    (matching the DF variant's orderBy/limit selection)."""
    import numpy as np
    from nipper_spark.functions.similarity import (
        _normalize, pq_adc_scores, pq_encode, train_ivfpq)
    ids, mvec = _read_emb_sf001()
    order = np.argsort(ids)
    sample = mvec[order][:2048]
    model = train_ivfpq(sample, IVFPQ["n_lists"], IVFPQ["m"],
                        IVFPQ["k_pq"], IVFPQ["seed"])
    lists, codes = pq_encode(mvec, model)
    norm = _normalize(mvec.astype(np.float32))
    idx = {int(v): j for j, v in enumerate(ids)}
    rows = []
    for qi in order[:ANN["n_queries"]]:
        q = norm[qi]
        probe = np.argsort(-(q @ model["coarse"].T),
                           kind="stable")[:IVFPQ["n_probe"]]
        mask = np.isin(lists, probe)
        adc = pq_adc_scores(q, lists[mask], codes[mask], model)
        cids = ids[mask]
        short = cids[np.lexsort((cids, -adc))][:IVFPQ["rerank"] * IVFPQ["k"]]
        scored = sorted(((-float((norm[idx[int(v)]] * q).sum()), int(v))
                         for v in short))
        for rank, (_negs, vid) in enumerate(scored[:IVFPQ["k"]], start=1):
            rows.append((int(ids[qi]), rank, vid))
    return _values_sql(rows, [("query_id", "BIGINT"), ("rank", "INTEGER"),
                              ("vec_id", "BIGINT")])


def _o_ann_ivfpq() -> str:
    """Single-threaded twin sharing the pure kernels (train_ivfpq /
    pq_encode / pq_adc_scores), so candidate selection and re-ranking
    are float-identical to the distributed path."""
    import numpy as np
    from nipper_spark.functions.similarity import (
        _normalize, pq_adc_scores, pq_encode, train_ivfpq)
    ids, mvec = _read_emb_sf001()
    sample = mvec[np.argsort(ids)][:2048]
    model = train_ivfpq(sample, IVFPQ["n_lists"], IVFPQ["m"],
                        IVFPQ["k_pq"], IVFPQ["seed"])
    lists, codes = pq_encode(mvec, model)
    norm = _normalize(mvec.astype(np.float32))
    idx = {int(v): j for j, v in enumerate(ids)}
    rows = []
    for qi in range(ANN["n_queries"]):
        q = norm[qi]
        probe = np.argsort(-(q @ model["coarse"].T),
                           kind="stable")[:IVFPQ["n_probe"]]
        mask = np.isin(lists, probe)
        adc = pq_adc_scores(q, lists[mask], codes[mask], model)
        cids = ids[mask]
        short = cids[np.lexsort((cids, -adc))][:IVFPQ["rerank"] * IVFPQ["k"]]
        scored = sorted(((-float((norm[idx[int(v)]] * q).sum()), int(v))
                         for v in short))
        for rank, (_negs, vid) in enumerate(scored[:IVFPQ["k"]], start=1):
            rows.append((int(ids[qi]), rank, vid))
    return _values_sql(rows, [("query_id", "BIGINT"), ("rank", "INTEGER"),
                              ("vec_id", "BIGINT")])


def _q_embedding_neardup(spark: SparkSession, sf_dir: str) -> DataFrame:
    """Corpus vectors are mutually distant at the 0.98 threshold, so
    the operator is exercised on emb ∪ re-keyed exact copies of every
    40th vector (cosine 1.0 → guaranteed pairs); the oracle twin
    applies the same augmentation."""
    from nipper_spark.functions.similarity import embedding_near_dup_pairs
    base = spark.read.parquet(f"{sf_dir}/embeddings.parquet")
    emb = base.unionByName(
        base.filter(F.col("vec_id") % 40 == 0)
        .withColumn("vec_id", F.col("vec_id") + F.lit(1_000_000)))
    return embedding_near_dup_pairs(
        emb, threshold=NEARDUP["threshold"], n_bits=NEARDUP["n_bits"],
        bands=NEARDUP["bands"], seed=NEARDUP["seed"],
        max_bucket=NEARDUP["max_bucket"]).select(
        F.col("id_a").cast("bigint").alias("id_a"),
        F.col("id_b").cast("bigint").alias("id_b"))


CURATE = dict(min_quality=0.5, langs=("en",), token_budget=20000)


def _q_curate(spark: SparkSession, sf_dir: str) -> DataFrame:
    """Composite training-set curation: lang gate → exact dedup →
    quality gate → deterministic token budget (running-sum window)."""
    from nipper_spark.functions.curate import curate_training_set
    docs = spark.read.parquet(f"{sf_dir}/documents.parquet")
    return curate_training_set(
        docs, min_quality=CURATE["min_quality"], langs=CURATE["langs"],
        token_budget=CURATE["token_budget"]).select(
        F.col("doc_id").cast("bigint").alias("doc_id"),
        "bpe_tokens", "quality",
        F.col("running_tokens").cast("bigint").alias("running_tokens"))


def _q_curate_neardup(spark: SparkSession, sf_dir: str) -> DataFrame:
    """Full-strength curation: lang gate → exact dedup → NEAR-dup
    clustering (MinHash+LSH, capped buckets → connected components →
    min-id survivors) → quality gate → token budget."""
    from nipper_spark.functions.curate import curate_training_set_neardup
    docs = spark.read.parquet(f"{sf_dir}/documents.parquet")
    return curate_training_set_neardup(
        docs, min_quality=CURATE["min_quality"], langs=CURATE["langs"],
        token_budget=CURATE["token_budget"],
        num_perm=MINHASH["num_perm"], bands=MINHASH["bands"],
        ngram=MINHASH["ngram"], threshold=MINHASH["threshold"],
        seed=MINHASH["seed"], max_bucket=MINHASH["max_bucket"]).select(
        F.col("doc_id").cast("bigint").alias("doc_id"),
        "bpe_tokens", "quality",
        F.col("running_tokens").cast("bigint").alias("running_tokens"))


def _o_curate_neardup() -> str:
    """Hybrid twin: the near-dup survivor set computes in Python with
    the SAME shared kernels (minhash signatures, capped bucket pairs,
    exact Jaccard, union-find); the quality/token/budget tail is the
    same SQL as _o_curate restricted to those survivors."""
    import hashlib
    import re as _re

    import pyarrow.parquet as pq

    from nipper_spark.functions.dedup import (
        _minhash_params, bucket_candidate_pairs, minhash_signature,
        ngram_jaccard)
    t = pq.read_table(f"{ORACLE_SF}/documents.parquet",
                      columns=["doc_id", "text", "lang"])
    rows = list(zip(t["doc_id"].to_pylist(), t["text"].to_pylist(),
                    t["lang"].to_pylist()))
    en = [(i, x or "") for i, x, lg in rows if lg in CURATE["langs"]]
    # exact dedup: min-id per normalized-md5 class
    by_norm: dict = {}
    for i, x in en:
        norm = _re.sub(r"\s+", " ", x.strip()).lower()
        h = hashlib.md5(norm.encode()).hexdigest()
        if h not in by_norm or i < by_norm[h]:
            by_norm[h] = i
    keep = set(by_norm.values())
    docs = [(i, x) for i, x in en if i in keep]
    # near-dup: minhash bands -> capped candidates -> verify -> union
    params = _minhash_params(MINHASH["num_perm"], MINHASH["seed"])
    rpb = MINHASH["num_perm"] // MINHASH["bands"]
    buckets: dict = {}
    textmap = dict(docs)
    for i, x in docs:
        sig = minhash_signature(x, MINHASH["num_perm"],
                                MINHASH["ngram"], params)
        for b in range(MINHASH["bands"]):
            buckets.setdefault((b, tuple(sig[b * rpb:(b + 1) * rpb])),
                               []).append(i)
    parent: dict = {}

    def find(z):
        while parent.get(z, z) != z:
            parent[z] = parent.get(parent[z], parent[z])
            z = parent[z]
        return z

    seen_pairs = set()
    for members in buckets.values():
        for p in bucket_candidate_pairs(members, MINHASH["max_bucket"]):
            if p in seen_pairs:
                continue
            seen_pairs.add(p)
            if ngram_jaccard(textmap[p[0]], textmap[p[1]],
                             MINHASH["ngram"]) >= MINHASH["threshold"]:
                ra, rb = find(p[0]), find(p[1])
                if ra != rb:
                    parent[max(ra, rb)] = min(ra, rb)
    survivors = sorted(i for i, _ in docs if find(i) == i)
    ids_sql = ", ".join(f"({i})" for i in survivors)
    return rf"""
WITH survivors(doc_id) AS (VALUES {ids_sql}),
en AS (
  SELECT d.doc_id, d.text FROM documents d
  JOIN survivors s ON s.doc_id = d.doc_id
), scored AS (
  SELECT doc_id,
         CAST(len(regexp_extract_all(text,
              '[A-Za-z]+|[0-9]|[^A-Za-z0-9\s]')) AS INTEGER) AS bpe_tokens,
         (least(CAST(len(regexp_split_to_array(trim(text), '\s+'))
                     AS DOUBLE) / 64.0, 1.0) +
          least(CAST(len(list_filter(regexp_split_to_array(trim(text),
                     '\s+'), w -> list_contains({_STOPLIST_SQL}, lower(w))))
                     AS DOUBLE) /
                greatest(CAST(len(regexp_split_to_array(trim(text),
                     '\s+')) AS DOUBLE), 1.0) * 4.0, 1.0)) / 2.0 AS quality
  FROM en
), gated AS (
  SELECT * FROM scored WHERE quality >= {CURATE["min_quality"]}
), budgeted AS (
  SELECT doc_id, bpe_tokens, quality,
         CAST(sum(bpe_tokens) OVER (ORDER BY quality DESC, doc_id
              ROWS BETWEEN UNBOUNDED PRECEDING AND CURRENT ROW)
              AS BIGINT) AS running_tokens
  FROM gated
)
SELECT CAST(doc_id AS BIGINT) AS doc_id, bpe_tokens, quality,
       running_tokens
FROM budgeted WHERE running_tokens <= {CURATE["token_budget"]}
"""


def _o_curate() -> str:
    return rf"""
WITH en AS (
  SELECT doc_id, text FROM documents WHERE lang IN ('en')
), dedup AS (
  SELECT CAST(min(doc_id) AS BIGINT) AS doc_id
  FROM en GROUP BY md5({_NORM})
), scored AS (
  SELECT d.doc_id,
         CAST(len(regexp_extract_all(e.text,
              '[A-Za-z]+|[0-9]|[^A-Za-z0-9\s]')) AS INTEGER) AS bpe_tokens,
         (least(CAST(len(regexp_split_to_array(trim(e.text), '\s+'))
                     AS DOUBLE) / 64.0, 1.0) +
          least(CAST(len(list_filter(regexp_split_to_array(trim(e.text),
                     '\s+'), w -> list_contains({_STOPLIST_SQL}, lower(w))))
                     AS DOUBLE) /
                greatest(CAST(len(regexp_split_to_array(trim(e.text),
                     '\s+')) AS DOUBLE), 1.0) * 4.0, 1.0)) / 2.0 AS quality
  FROM dedup d JOIN en e USING (doc_id)
), gated AS (
  SELECT * FROM scored WHERE quality >= 0.5
), budgeted AS (
  SELECT doc_id, bpe_tokens, quality,
         CAST(sum(bpe_tokens) OVER (ORDER BY quality DESC, doc_id
              ROWS BETWEEN UNBOUNDED PRECEDING AND CURRENT ROW)
              AS BIGINT) AS running_tokens
  FROM gated
)
SELECT * FROM budgeted WHERE running_tokens <= 20000
"""


def _q_topk_per_group(spark: SparkSession, sf_dir: str) -> DataFrame:
    """The frontier-wave operator on relational data: top-3 orders per
    customer by (totalprice desc, orderkey) via the salted two-phase
    top-k (identical results to a plain window, skew-safe plan)."""
    from nipper_spark.operators.topk import topk_per_key
    orders = spark.read.parquet(f"{sf_dir}/orders.parquet")
    out = topk_per_key(
        orders.select("o_custkey", "o_orderkey", "o_totalprice"),
        "o_custkey",
        [F.desc("o_totalprice"), F.asc("o_orderkey")], 3, salt=8)
    return out.select(F.col("o_custkey").cast("bigint").alias("custkey"),
                      F.col("rk").cast("int").alias("rk"),
                      F.col("o_orderkey").cast("bigint").alias("orderkey"),
                      F.col("o_totalprice").alias("totalprice"))


def _q_anti_join(spark: SparkSession, sf_dir: str) -> DataFrame:
    """The URL-seen dedup pattern: anti-join — customers with no
    URGENT orders (every customer has SOME order in this corpus, so
    the unfiltered anti-join would be vacuously empty)."""
    c = spark.read.parquet(f"{sf_dir}/customer.parquet")
    o = spark.read.parquet(f"{sf_dir}/orders.parquet") \
        .filter(F.col("o_orderpriority") == "1-URGENT")
    return (c.join(o, c.c_custkey == o.o_custkey, "left_anti")
            .select(F.col("c_custkey").cast("bigint").alias("custkey")))


def _q_round_counters(spark: SparkSession, sf_dir: str) -> DataFrame:
    """The round_log counter pattern: grouped counts + exact sums."""
    e = spark.read.parquet(f"{sf_dir}/events.parquet")
    return (e.groupBy("event_type")
            .agg(F.count("*").cast("bigint").alias("n"),
                 F.round(F.sum("value"), 4).alias("sum_value"))
            .orderBy("event_type"))


SAMPLE = dict(fractions={"en": 0.5, "de": 0.25}, default=0.1,
              test_fraction=0.2)


def _q_sample_split(spark: SparkSession, sf_dir: str) -> DataFrame:
    """Deterministic per-language stratified sample + train/test split
    (hash-based: stable under repartitioning, reproducible across
    engines — functions/sampling.py)."""
    from nipper_spark.functions.sampling import (
        stratified_hash_sample, train_test_split_col)
    docs = spark.read.parquet(f"{sf_dir}/documents.parquet")
    kept = stratified_hash_sample(docs, "lang", SAMPLE["fractions"],
                                  "doc_id",
                                  default_fraction=SAMPLE["default"])
    return kept.select(
        F.col("doc_id").cast("bigint").alias("doc_id"), "lang",
        train_test_split_col(F.col("doc_id"),
                             SAMPLE["test_fraction"]).alias("split"))


def _o_sample_split() -> str:
    from nipper_spark.functions.sampling import _hex_threshold
    fr = SAMPLE["fractions"]
    cases = " ".join(
        f"WHEN lang = '{k}' THEN '{_hex_threshold(v)}'"
        for k, v in sorted(fr.items()))
    return f"""
SELECT CAST(doc_id AS BIGINT) AS doc_id, lang,
       CASE WHEN substring(md5(CAST(doc_id AS VARCHAR) || ':split'), 1, 8)
                 < '{_hex_threshold(SAMPLE["test_fraction"])}'
            THEN 'test' ELSE 'train' END AS split
FROM documents
WHERE substring(md5(CAST(doc_id AS VARCHAR) || ':strata'), 1, 8) <
      CASE {cases} ELSE '{_hex_threshold(SAMPLE["default"])}' END
"""


def _q_source_lang_rollup(spark: SparkSession, sf_dir: str) -> DataFrame:
    """Hierarchical corpus totals via ROLLUP(source, lang): per
    (source, lang), per source, and grand total in ONE pass — the
    partial-aggregate shape a 100-TB corpus report wants (no second
    scan for subtotals)."""
    d = spark.read.parquet(f"{sf_dir}/documents.parquet")
    return (d.rollup("source", "lang")
            .agg(F.count("*").cast("bigint").alias("n_docs"),
                 F.sum(F.length("text")).cast("bigint")
                 .alias("total_chars"))
            .orderBy(F.col("source").asc_nulls_first(),
                     F.col("lang").asc_nulls_first()))


_O_ROLLUP = """
SELECT source, lang, CAST(count(*) AS BIGINT) AS n_docs,
       CAST(sum(len(text)) AS BIGINT) AS total_chars
FROM documents GROUP BY ROLLUP(source, lang)
ORDER BY source ASC NULLS FIRST, lang ASC NULLS FIRST
"""


def _q_event_sessions(spark: SparkSession, sf_dir: str) -> DataFrame:
    """Session windows (streaming/windows.py semantics run in batch):
    per-user event sessions split at 30-minute inactivity gaps via
    native F.session_window — the gaps-and-islands SQL twin pins the
    exact merge rule (events merge while the next start is strictly
    inside the previous window's end = ts + gap)."""
    e = spark.read.parquet(f"{sf_dir}/events.parquet")
    return (e.groupBy("user_id", F.session_window("ts", "30 minutes"))
            .agg(F.count("*").cast("bigint").alias("n_events"),
                 F.round(F.sum("value"), 4).alias("sum_value"))
            .select(F.col("user_id").cast("bigint").alias("user_id"),
                    F.col("session_window.start").alias("session_start"),
                    F.col("session_window.end").alias("session_end"),
                    "n_events", "sum_value")
            .orderBy("user_id", "session_start"))


_O_EVENT_SESSIONS = """
WITH o AS (
  SELECT user_id, ts, value,
         CASE WHEN lag(ts) OVER w IS NULL
                   OR ts - lag(ts) OVER w >= INTERVAL 30 MINUTE
              THEN 1 ELSE 0 END AS brk
  FROM events
  WINDOW w AS (PARTITION BY user_id ORDER BY ts)),
s AS (
  SELECT *, sum(brk) OVER (PARTITION BY user_id ORDER BY ts
                           ROWS UNBOUNDED PRECEDING) AS sid
  FROM o)
SELECT CAST(user_id AS BIGINT) AS user_id,
       min(ts) AS session_start,
       max(ts) + INTERVAL 30 MINUTE AS session_end,
       CAST(count(*) AS BIGINT) AS n_events,
       round(sum(value), 4) AS sum_value
FROM s GROUP BY user_id, sid ORDER BY user_id, session_start
"""


def _q_event_windows(spark: SparkSession, sf_dir: str) -> DataFrame:
    """Event-time windowed aggregation (the streaming telemetry
    operator run in batch mode — streaming/windows.py semantics:
    tumbling window, per-key counts + sums)."""
    e = spark.read.parquet(f"{sf_dir}/events.parquet")
    return (e.groupBy("event_type",
                      F.window("ts", "1 hour").alias("w"))
            .agg(F.count("*").cast("bigint").alias("n"),
                 F.round(F.sum("value"), 4).alias("sum_value"))
            .select("event_type",
                    F.date_format(F.col("w.start"),
                                  "yyyy-MM-dd HH:mm:ss").alias("w_start"),
                    "n", "sum_value"))


_O_EVENT_WINDOWS = """
SELECT event_type,
       strftime(time_bucket(INTERVAL '1 hour', ts),
                '%Y-%m-%d %H:%M:%S') AS w_start,
       CAST(count(*) AS BIGINT) AS n,
       round(sum(value), 4) AS sum_value
FROM events GROUP BY 1, 2
"""


def _q_pricing_summary(spark: SparkSession, sf_dir: str) -> DataFrame:
    """TPC-H Q1 shape: wide scan → filter → grouped multi-aggregate
    (the round_log/statistics pattern at relational scale)."""
    li = spark.read.parquet(f"{sf_dir}/lineitem.parquet")
    return (li.filter(F.col("l_shipdate") <= F.lit("1998-09-02"))
            .groupBy("l_returnflag", "l_linestatus")
            .agg(F.round(F.sum("l_quantity"), 2).alias("sum_qty"),
                 F.round(F.sum("l_extendedprice"), 2).alias("sum_base"),
                 F.round(F.sum(F.col("l_extendedprice") *
                               (1 - F.col("l_discount"))), 2)
                 .alias("sum_disc_price"),
                 F.round(F.avg("l_discount"), 6).alias("avg_disc"),
                 F.count("*").cast("bigint").alias("count_order"))
            .orderBy("l_returnflag", "l_linestatus"))


_O_PRICING = """
SELECT l_returnflag, l_linestatus,
       round(sum(l_quantity), 2) AS sum_qty,
       round(sum(l_extendedprice), 2) AS sum_base,
       round(sum(l_extendedprice * (1 - l_discount)), 2)
           AS sum_disc_price,
       round(avg(l_discount), 6) AS avg_disc,
       CAST(count(*) AS BIGINT) AS count_order
FROM lineitem WHERE l_shipdate <= DATE '1998-09-02'
GROUP BY 1, 2 ORDER BY 1, 2
"""


def _q_shipping_priority(spark: SparkSession, sf_dir: str) -> DataFrame:
    """TPC-H Q3 shape: selective 3-way join → grouped revenue → top 10
    (the fetch-join + top-k pattern on relational data)."""
    c = spark.read.parquet(f"{sf_dir}/customer.parquet") \
        .filter(F.col("c_mktsegment") == "BUILDING")
    o = spark.read.parquet(f"{sf_dir}/orders.parquet") \
        .filter(F.col("o_orderdate") < F.lit("1995-03-15"))
    li = spark.read.parquet(f"{sf_dir}/lineitem.parquet") \
        .filter(F.col("l_shipdate") > F.lit("1995-03-15"))
    return (li.join(o, li.l_orderkey == o.o_orderkey)
            .join(F.broadcast(c), o.o_custkey == c.c_custkey)
            .groupBy(F.col("l_orderkey").cast("bigint").alias("orderkey"),
                     F.col("o_orderdate").cast("string")
                     .alias("orderdate"),
                     F.col("o_orderpriority").alias("orderpriority"))
            .agg(F.round(F.sum(F.col("l_extendedprice") *
                               (1 - F.col("l_discount"))), 2)
                 .alias("revenue"))
            .orderBy(F.desc("revenue"), "orderdate", "orderkey")
            .limit(10))


_O_SHIPPING = """
SELECT CAST(l_orderkey AS BIGINT) AS orderkey,
       CAST(o_orderdate AS VARCHAR) AS orderdate,
       o_orderpriority AS orderpriority,
       round(sum(l_extendedprice * (1 - l_discount)), 2) AS revenue
FROM lineitem
JOIN orders ON l_orderkey = o_orderkey
JOIN customer ON o_custkey = c_custkey
WHERE c_mktsegment = 'BUILDING'
  AND o_orderdate < DATE '1995-03-15'
  AND l_shipdate > DATE '1995-03-15'
GROUP BY 1, 2, 3
ORDER BY revenue DESC, orderdate, orderkey
LIMIT 10
"""


def _q_star_join(spark: SparkSession, sf_dir: str) -> DataFrame:
    """Broadcast star join (dimension tables broadcast like the
    politeness budget dim)."""
    c = spark.read.parquet(f"{sf_dir}/customer.parquet")
    n = spark.read.parquet(f"{sf_dir}/nation.parquet")
    r = spark.read.parquet(f"{sf_dir}/region.parquet")
    return (c.join(F.broadcast(n), c.c_nationkey == n.n_nationkey)
            .join(F.broadcast(r), n.n_regionkey == r.r_regionkey)
            .groupBy(F.col("r_name").alias("region"),
                     F.col("n_name").alias("nation"))
            .agg(F.count("*").cast("bigint").alias("n_customers"),
                 F.round(F.sum("c_acctbal"), 2).alias("acctbal"))
            .orderBy("region", "nation"))


def _q_readability(spark: SparkSession, sf_dir: str) -> DataFrame:
    """Capstone select→mutate→re-select pipeline (examples/
    readability.rs port) over the fixture pages; content pinned by md5."""
    from nipper_spark.functions.readability import readability_articles
    pages = _fixture_pages(spark)
    return readability_articles(pages).select(
        "url", "title",
        F.coalesce("author", F.lit("")).alias("author"),
        F.coalesce("cover", F.lit("")).alias("cover"),
        F.md5("content_html").alias("content_md5"),
        F.length("content_text").cast("int").alias("text_len"))


def _o_readability() -> str:
    import hashlib
    from nipper_spark.functions.readability import extract_article
    from nipper_spark.sources.synthetic import fixture_pages_rows
    rows = []
    for (url, _, html, _, _) in fixture_pages_rows():
        rec = extract_article(html)
        rows.append((url, rec["title"], rec["author"] or "",
                     rec["cover"] or "",
                     hashlib.md5(rec["content_html"].encode()).hexdigest(),
                     len(rec["content_text"])))
    return _values_sql(rows, [
        ("url", "VARCHAR"), ("title", "VARCHAR"), ("author", "VARCHAR"),
        ("cover", "VARCHAR"), ("content_md5", "VARCHAR"),
        ("text_len", "INTEGER")])


def _q_media_features(spark: SparkSession, sf_dir: str) -> DataFrame:
    from nipper_spark.functions.multimodal import (
        image_features, synth_media_df)
    return image_features(synth_media_df(spark, n=60)).select(
        F.col("media_id").cast("bigint").alias("media_id"), "sha256",
        F.col("n_bytes").cast("int").alias("n_bytes"))


def _q_media_frames(spark: SparkSession, sf_dir: str) -> DataFrame:
    from nipper_spark.functions.multimodal import (
        sample_frames, synth_media_df)
    return sample_frames(synth_media_df(spark, n=60)).select(
        F.col("media_id").cast("bigint").alias("media_id"),
        F.col("frame_no").cast("int").alias("frame_no"), "frame_sha")


def _o_media_features() -> str:
    """Single-threaded twin of _q_media_features: the fake codec is a
    pure function of the payload, and the payloads are seed-fixed, so
    the oracle recomputes the exact rows without Spark."""
    from nipper_spark.functions.multimodal import (
        image_feature_record, synth_media_rows)
    rows = []
    for (mid, kind, payload, *_rest) in synth_media_rows(n=60):
        if kind != "image":
            continue
        rec = image_feature_record(bytes(payload))
        rows.append((mid, rec["sha256"], rec["n_bytes"]))
    return _values_sql(rows, [("media_id", "BIGINT"), ("sha256", "VARCHAR"),
                              ("n_bytes", "INTEGER")])


def _q_media_real_decode(spark: SparkSession, sf_dir: str) -> DataFrame:
    """REAL codecs (pure-numpy PPM + BMP, stdlib PCM WAV): decoded
    dimensions/duration and a digest of the decoded SAMPLES — proof the
    decode ran, not a container-byte hash."""
    from nipper_spark.functions.multimodal import (
        real_decode_summary, synth_real_media_df)
    return real_decode_summary(synth_real_media_df(spark, n=24)).select(
        F.col("media_id").cast("bigint").alias("media_id"), "kind",
        F.col("width").cast("int").alias("width"),
        F.col("height").cast("int").alias("height"),
        F.col("duration_ms").cast("int").alias("duration_ms"),
        "content_sha")


def _q_sitemap_harvest(spark: SparkSession, sf_dir: str) -> DataFrame:
    """Sitemap discovery (sitemaps.org protocol: urlset, sitemapindex,
    gzip, plain-text): sitemap rows of a pages table parse executor-
    side (mapInPandas) into canonicalized same-host (host, url, kind,
    lastmod, priority) entries — the advertisement side of per-host
    crawl state, joining robots.txt's restriction side."""
    from nipper_spark.crawl.sitemaps import (
        harvest_sitemap_tables, synth_sitemap_rows)
    from nipper_spark.sources.synthetic import PAGES_SCHEMA
    pages = spark.createDataFrame(synth_sitemap_rows(), PAGES_SCHEMA)
    return harvest_sitemap_tables(pages).select(
        "host", "url", "kind", "lastmod",
        F.col("priority").cast("double").alias("priority"))


def _q_robots_sitemap_seeds(spark: SparkSession, sf_dir: str) -> DataFrame:
    """`Sitemap:` advertisements harvested from robots.txt rows —
    the sitemaps.org discovery channel (sites advertise unguessable
    sitemap paths there). Executor-side parse, canonicalized,
    same-host-filtered, deduplicated (crawl/robots.py
    robots_sitemap_seeds)."""
    from nipper_spark.crawl.robots import (
        robots_sitemap_seeds, synth_robots_sitemap_rows)
    from nipper_spark.sources.synthetic import PAGES_SCHEMA
    pages = spark.createDataFrame(synth_robots_sitemap_rows(),
                                  PAGES_SCHEMA)
    return robots_sitemap_seeds(pages)


def _o_robots_sitemap_seeds() -> str:
    """Single-threaded twin: same parse kernel + canonicalization +
    same-host filter over the same fixture rows."""
    from nipper_spark.crawl.robots import (
        parse_robots_txt, synth_robots_sitemap_rows)
    from nipper_spark.functions.url import canonicalize_url, host_of
    out = set()
    for url, _ts, body, _t, _l in synth_robots_sitemap_rows():
        host = host_of(url)
        for ad in parse_robots_txt(body).sitemaps:
            canon = canonicalize_url(ad)
            if canon is not None and host_of(canon) == host:
                out.add((host, canon))
    return _values_sql(sorted(out), [("host", "VARCHAR"),
                                     ("url", "VARCHAR")])


def _q_sitemap_refresh(spark: SparkSession, sf_dir: str) -> DataFrame:
    """Sitemap REFRESH (the lifecycle step after discovery/bootstrap/
    recursive fetch): kind='url' entries whose advertised lastmod is
    strictly newer than the URL's last fetch become re-seed frontier
    rows for the next crawl generation. Fetch log is derived
    deterministically from the url's last digit (month = 1 + d % 3,
    fixture lastmod months span 1-5) so the staleness predicate
    exercises both outcomes."""
    from nipper_spark.crawl.sitemaps import (
        harvest_sitemap_tables, sitemap_refresh_frontier,
        synth_sitemap_rows)
    from nipper_spark.sources.synthetic import PAGES_SCHEMA
    pages = spark.createDataFrame(synth_sitemap_rows(), PAGES_SCHEMA)
    entries = harvest_sitemap_tables(pages)
    fetch_log = entries.filter(F.col("kind") == "url").select(
        "url",
        F.concat(F.lit("2026-0"),
                 ((F.substring("url", -1, 1).cast("int") % 3) + 1)
                 .cast("string"),
                 F.lit("-01")).alias("fetched_at"))
    seeds = sitemap_refresh_frontier(entries, fetch_log, _crawl_policy())
    return (seeds.select("url", "host", "score")
            .orderBy("url"))


def _q_recrawl_scores(spark: SparkSession, sf_dir: str) -> DataFrame:
    """Adaptive revisit scheduling over a fetch log derived
    deterministically from the events table (user_id → page, ts-order
    → fetch sequence, event_type → content fingerprint): exponential
    backoff per trailing unchanged fetch, reset on change — the
    frontier score input for recrawls (crawl/revisit.py)."""
    from pyspark.sql import Window

    from nipper_spark.crawl.revisit import revisit_scores
    ev = spark.read.parquet(f"{sf_dir}/events.parquet")
    log = ev.select(
        F.concat(F.lit("http://h"), (F.col("user_id") % 20).cast("string"),
                 F.lit(".test/p"),
                 F.col("user_id").cast("string")).alias("url"),
        F.row_number().over(
            Window.partitionBy("user_id").orderBy("ts", "event_id"))
        .cast("long").alias("seq"),
        F.col("event_type").alias("fingerprint"))
    return (revisit_scores(log, base_interval=1, max_interval=64)
            .select("url",
                    F.col("last_seq").cast("bigint").alias("last_seq"),
                    F.col("n_fetches").cast("bigint").alias("n_fetches"),
                    F.col("unchanged_streak").cast("bigint")
                    .alias("unchanged_streak"),
                    F.col("revisit_interval").cast("bigint")
                    .alias("revisit_interval"),
                    F.col("next_due_seq").cast("bigint")
                    .alias("next_due_seq"),
                    "revisit_score"))


# the DuckDB twin of _q_recrawl_scores — same fetch-log derivation,
# same backoff arithmetic (powers of two, so 1.0/interval hash-matches)
_O_RECRAWL = """
WITH log AS (
  SELECT 'http://h' || CAST(user_id % 20 AS VARCHAR) || '.test/p'
           || CAST(user_id AS VARCHAR) AS url,
         CAST(row_number() OVER (PARTITION BY user_id
                                 ORDER BY ts, event_id) AS BIGINT) AS seq,
         event_type AS fingerprint
  FROM events),
ch AS (
  SELECT url, seq,
         (lag(fingerprint) OVER w IS NULL
          OR fingerprint <> lag(fingerprint) OVER w) AS changed
  FROM log WINDOW w AS (PARTITION BY url ORDER BY seq)),
ch2 AS (
  SELECT url, seq, changed,
         max(CASE WHEN changed THEN seq END)
             OVER (PARTITION BY url) AS lcs
  FROM ch),
agg AS (
  SELECT url, max(seq) AS last_seq,
         count(*) AS n_fetches,
         CAST(coalesce(sum(CASE WHEN seq > lcs THEN 1 ELSE 0 END), 0)
              AS BIGINT) AS unchanged_streak
  FROM ch2 GROUP BY url),
iv AS (
  SELECT *, least(CAST(64 AS BIGINT),
                  CAST(1 << CAST(least(unchanged_streak, 30) AS INTEGER)
                       AS BIGINT)) AS revisit_interval
  FROM agg)
SELECT url, last_seq, CAST(n_fetches AS BIGINT) AS n_fetches,
       unchanged_streak, revisit_interval,
       last_seq + revisit_interval AS next_due_seq,
       1.0 / CAST(revisit_interval AS DOUBLE) AS revisit_score
FROM iv
"""


BPE = dict(num_merges=80, top_words=4000)


def _q_doc_bpe_tokens(spark: SparkSession, sf_dir: str) -> DataFrame:
    """Corpus-trained BPE tokenization (functions/bpe.py): distributed
    word-type counting (one explode+groupBy pass) → bounded driver
    merge training over the top word types → broadcast merge-rank
    apply. Per-doc token count + md5 of the token stream pin the exact
    segmentation; the oracle retrains from the same parquet with the
    identical kernel."""
    from nipper_spark.functions.bpe import bpe_token_stats, bpe_train
    docs = spark.read.parquet(f"{sf_dir}/documents.parquet")
    merges = bpe_train(docs, num_merges=BPE["num_merges"],
                       top_words=BPE["top_words"])
    return bpe_token_stats(docs, merges)


def _o_doc_bpe_tokens() -> str:
    import hashlib as _hl
    from collections import Counter
    from nipper_spark.functions.bpe import (bpe_tokens,
                                            bpe_train_from_counts,
                                            merge_ranks)
    ids, texts = _read_docs_sf001()
    wc: Counter = Counter()
    for t in texts:
        if t:
            wc.update(t.lower().split())
    top = sorted(wc.items(), key=lambda kv: (-kv[1], kv[0]))
    top = top[:BPE["top_words"]]
    ranks = merge_ranks(bpe_train_from_counts(top, BPE["num_merges"]))
    rows = []
    cache: dict = {}
    for i, t in zip(ids, texts):
        toks = bpe_tokens(t or "", ranks, cache)
        rows.append((i, len(toks),
                     _hl.md5(" ".join(toks).encode()).hexdigest()))
    return _values_sql(rows, [("doc_id", "BIGINT"),
                              ("n_tokens", "BIGINT"),
                              ("tok_hash", "VARCHAR")])


LM = dict(top_vocab=2000, top_bigrams=20000, alpha=0.5)


def _q_doc_lm_perplexity(spark: SparkSession, sf_dir: str) -> DataFrame:
    """CCNet-style quality gate (functions/lm.py): interpolated bigram
    LM trained distributed on the lang='en' reference slice (bounded
    vocab/bigram collects), every document scored with the shared
    lm_logloss kernel, exact head/middle/tail tertiles via the
    two-phase global row sequence. Oracle retrains + rescores
    single-threaded from the same parquet."""
    from nipper_spark.functions.lm import (lm_score, lm_train,
                                           perplexity_buckets)
    docs = spark.read.parquet(f"{sf_dir}/documents.parquet")
    model = lm_train(docs.filter(F.col("lang") == "en"),
                     top_vocab=LM["top_vocab"],
                     top_bigrams=LM["top_bigrams"])
    return perplexity_buckets(lm_score(docs, model, alpha=LM["alpha"]))


def _o_doc_lm_perplexity() -> str:
    import pyarrow.parquet as pq
    from nipper_spark.functions.lm import (lm_train_py,
                                           perplexity_buckets_py)
    t = pq.read_table(f"{ORACLE_SF}/documents.parquet",
                      columns=["doc_id", "text", "lang"])
    ids = t["doc_id"].to_pylist()
    texts = t["text"].to_pylist()
    langs = t["lang"].to_pylist()
    model = lm_train_py([x for x, lg in zip(texts, langs) if lg == "en"],
                        top_vocab=LM["top_vocab"],
                        top_bigrams=LM["top_bigrams"])
    rows = perplexity_buckets_py(list(zip(ids, texts)), model,
                                 alpha=LM["alpha"])
    return _values_sql(rows, [("doc_id", "BIGINT"),
                              ("n_tokens", "BIGINT"),
                              ("logloss", "DOUBLE"),
                              ("bucket", "VARCHAR")])


def _q_redirect_resolve(spark: SparkSession, sf_dir: str) -> DataFrame:
    """Redirect-chain resolution (crawl/redirects.py): a redirect edge
    set derived deterministically from the events table (user_id →
    page node; last-digit classes give chains into a terminal, a
    back-edge shortcut, and self-loops), resolved by pointer jumping
    with max_hops=4 — chains of 6 hops correctly fail the cap, cycles
    never resolve, everything else reports the exact final target and
    hop count. Oracle: DuckDB recursive CTE over the same edges."""
    from nipper_spark.crawl.redirects import resolve_redirects
    ev = spark.read.parquet(f"{sf_dir}/events.parquet")
    uid = F.col("uid")
    page = (lambda e: F.concat(F.lit("http://h"),
                               (e % 20).cast("string"),
                               F.lit(".test/p"), e.cast("string")))
    edges = (ev.select((F.col("user_id").cast("long")).alias("uid"))
             .distinct()
             .withColumn("redirect_to", F.when(
                 uid % 10 <= 5, page(uid + 1)).when(
                 uid % 10 == 7, page(uid - 3)).when(
                 uid % 10 == 8, page(uid)))
             .filter(F.col("redirect_to").isNotNull())
             .select(page(uid).alias("url"), "redirect_to"))
    return resolve_redirects(edges, max_hops=4)


# the DuckDB twin: identical edge derivation, recursive-CTE walk
def _o_redirect_resolve() -> str:
    from nipper_spark.crawl.redirects import redirect_oracle_sql
    edges = """
SELECT 'http://h' || CAST(uid % 20 AS VARCHAR) || '.test/p'
         || CAST(uid AS VARCHAR) AS url,
       CASE WHEN uid % 10 <= 5 THEN
              'http://h' || CAST((uid + 1) % 20 AS VARCHAR) || '.test/p'
                || CAST(uid + 1 AS VARCHAR)
            WHEN uid % 10 = 7 THEN
              'http://h' || CAST((uid - 3) % 20 AS VARCHAR) || '.test/p'
                || CAST(uid - 3 AS VARCHAR)
            WHEN uid % 10 = 8 THEN
              'http://h' || CAST(uid % 20 AS VARCHAR) || '.test/p'
                || CAST(uid AS VARCHAR)
       END AS redirect_to
FROM (SELECT DISTINCT CAST(user_id AS BIGINT) AS uid FROM events)
WHERE uid % 10 <= 5 OR uid % 10 IN (7, 8)
"""
    return redirect_oracle_sql(edges, max_hops=4)


def _o_sitemap_refresh() -> str:
    from nipper_spark.crawl.sitemaps import (
        harvest_sitemap_entries_py, sitemap_refresh_py,
        synth_sitemap_rows)
    entries = harvest_sitemap_entries_py(
        [(u, bytes(b)) for (u, _ts, b, _t, _l) in synth_sitemap_rows()])
    # non-digit-ending urls get NULL fetched_at on the Spark side
    # (cast('int') -> NULL -> predicate NULL -> excluded): mirror it
    fetch_log = {u: f"2026-0{(int(u[-1]) % 3) + 1}-01"
                 for (_h, u, k, _lm, _p) in entries
                 if k == "url" and u[-1].isdigit()}
    rows = [(u, u.split("/")[2], sc)
            for u, sc in sitemap_refresh_py(entries, fetch_log)]
    return _values_sql(rows, [("url", "VARCHAR"), ("host", "VARCHAR"),
                              ("score", "DOUBLE")])


def _o_sitemap_harvest() -> str:
    from nipper_spark.crawl.sitemaps import (
        harvest_sitemap_entries_py, synth_sitemap_rows)
    rows = harvest_sitemap_entries_py(
        [(u, bytes(b)) for (u, _ts, b, _t, _l) in synth_sitemap_rows()])
    return _values_sql(rows, [("host", "VARCHAR"), ("url", "VARCHAR"),
                              ("kind", "VARCHAR"), ("lastmod", "VARCHAR"),
                              ("priority", "DOUBLE")])


def _o_media_real_decode() -> str:
    from nipper_spark.functions.multimodal import (
        real_decode_record, synth_real_media_rows)
    rows = []
    for (mid, kind, payload, *_rest) in synth_real_media_rows(n=24):
        rec = real_decode_record(kind, bytes(payload))
        rows.append((mid, kind, rec["width"], rec["height"],
                     rec["duration_ms"], rec["content_sha"]))
    return _values_sql(rows, [("media_id", "BIGINT"), ("kind", "VARCHAR"),
                              ("width", "INTEGER"), ("height", "INTEGER"),
                              ("duration_ms", "INTEGER"),
                              ("content_sha", "VARCHAR")])


def _o_media_frames() -> str:
    from nipper_spark.functions.multimodal import (
        synth_media_rows, video_frame_records)
    rows = []
    for (mid, kind, payload, *_rest) in synth_media_rows(n=60):
        if kind != "video":
            continue
        for rec in video_frame_records(bytes(payload)):
            rows.append((mid, rec["frame_no"], rec["frame_sha"]))
    return _values_sql(rows, [("media_id", "BIGINT"),
                              ("frame_no", "INTEGER"),
                              ("frame_sha", "VARCHAR")])


def queries() -> dict[str, Callable[[SparkSession, str], DataFrame]]:
    return {
        # HTML kernel / selector engine (SURVEY.md §2.2-2.6)
        "sel_counts": _q_sel_counts,
        "hn_stories": _q_hn_stories,
        "serialize_goldens": _q_serialize,
        "extract_text_hash": _q_extract_text_hash,
        "warc_extract": _q_warc_extract,
        "host_pagerank": _q_host_pagerank,
        "rank_seed_scores": _q_rank_seed_scores,
        "extract_outlinks": _q_extract_outlinks,
        "anchor_text_index": _q_anchor_text_index,
        # crawl layer (SURVEY.md §2.8, north rule)
        "canonicalize_urls": _q_canonicalize,
        "crawl_schedule": _q_crawl_schedule,
        "round_skew": _q_round_skew,
        # training-data ops: dedup family
        "doc_exact_dup_groups": _q_doc_exact_dups,
        "dedup_exact_survivors": _q_dedup_exact_survivors,
        "dedup_minhash_lsh": _q_minhash,
        "dedup_ngram_jaccard": _q_ngram_jaccard,
        "dedup_simhash": _q_simhash,
        "dedup_cluster_survivors": _q_cluster_survivors,
        "dedup_incremental": _q_dedup_incremental,
        "dedup_exact_incremental": _q_dedup_exact_incremental,
        "dedup_rolling_store": _q_dedup_rolling_store,
        "embedding_near_dup": _q_embedding_neardup,
        "embedding_near_dup_incremental": _q_embedding_neardup_incremental,
        # text analysis
        "doc_token_counts": _q_doc_tokens,
        "doc_quality": _q_doc_quality,
        "doc_lang_pred": _q_doc_lang,
        "doc_fingerprints": _q_doc_fingerprints,
        "doc_vocab_stats": _q_doc_vocab_stats,
        "source_stats": _q_source_stats,
        "doc_sample_split": _q_sample_split,
        "doc_pii_scrub": _q_doc_pii_scrub,
        "doc_repeated_spans": _q_doc_repeated_spans,
        "doc_c4_clean": _q_doc_c4_clean,
        "doc_gopher_quality": _q_doc_gopher_quality,
        "doc_gopher_repetition": _q_doc_gopher_repetition,
        "doc_paragraph_dedup": _q_doc_paragraph_dedup,
        "url_frontier_filter": _q_url_frontier_filter,
        "host_trap_stats": _q_host_trap_stats,
        "doc_fix_mojibake": _q_doc_fix_mojibake,
        "doc_decontam": _q_doc_decontam,
        # similarity search
        "ann_brute_topk": _q_ann_brute,
        "ann_lsh_topk": _q_ann_lsh,
        "ann_ivf_topk": _q_ann_ivf,
        "ann_ivf_df_topk": _q_ann_ivf_df,
        "ann_lsh_df_topk": _q_ann_lsh_df,
        "ann_ivfpq_topk": _q_ann_ivfpq,
        "ann_ivfpq_df_topk": _q_ann_ivfpq_df,
        # capstone complex query (select→mutate→re-select in one UDF)
        "readability": _q_readability,
        # composite training-set curation (filter→dedup→budget)
        "curate_training_set": _q_curate,
        "curate_neardup_training_set": _q_curate_neardup,
        "curate_web_corpus": _q_curate_web_corpus,
        # relational primitives the frontier is built from
        "topk_per_group": _q_topk_per_group,
        "anti_join_dedup": _q_anti_join,
        "round_counters": _q_round_counters,
        "event_time_windows": _q_event_windows,
        "event_sessions": _q_event_sessions,
        "source_lang_rollup": _q_source_lang_rollup,
        "pricing_summary": _q_pricing_summary,
        "shipping_priority": _q_shipping_priority,
        "star_join_broadcast": _q_star_join,
        # multimodal plumbing (deterministic fake codecs, full oracle)
        "media_image_features": _q_media_features,
        "media_frame_samples": _q_media_frames,
        "media_real_decode": _q_media_real_decode,
        # sitemap discovery (urlset/sitemapindex/gzip/txt, same-host)
        "sitemap_harvest": _q_sitemap_harvest,
        "sitemap_refresh": _q_sitemap_refresh,
        "robots_sitemap_seeds": _q_robots_sitemap_seeds,
        # change-rate-adaptive recrawl scheduling (pure Catalyst)
        "recrawl_scores": _q_recrawl_scores,
        # redirect-chain resolution (pointer jumping, log2 rounds)
        "redirect_resolve": _q_redirect_resolve,
        # corpus-trained BPE subword tokenization
        "doc_bpe_tokens": _q_doc_bpe_tokens,
        # CCNet-style LM perplexity scoring + tertile bucketing
        "doc_lm_perplexity": _q_doc_lm_perplexity,
    }


# ======================================================================
# oracles
# ======================================================================

def _o_sel_counts() -> str:
    from nipper_spark.fixtures_goldens import SELECTOR_COUNT_CASES
    rows = [(c[0], c[4]) for c in SELECTOR_COUNT_CASES]
    return _values_sql(rows, [("case_id", "VARCHAR"), ("cnt", "INTEGER")])


def _o_hn_stories() -> str:
    from nipper_spark.fixtures_goldens import HN_STORIES
    return _values_sql(HN_STORIES, [("seq", "INTEGER"),
                                    ("title", "VARCHAR"),
                                    ("href", "VARCHAR")])


def _o_serialize() -> str:
    from nipper_spark.fixtures_goldens import SERIALIZE_CASES
    rows = [(name, exp if exp is not None else inp)
            for name, inp, exp in SERIALIZE_CASES]
    return _values_sql(rows, [("case_id", "VARCHAR"),
                              ("out_html", "VARCHAR")])


def _o_extract_text_hash() -> str:
    import hashlib
    from nipper_spark.functions.html_udfs import extract_text_and_links
    from nipper_spark.sources.synthetic import (
        fixture_pages_rows, synth_pages_rows)
    rows = []
    for (url, _, html, _, _) in (fixture_pages_rows() +
                                 synth_pages_rows(**CRAWL_PAGES)):
        text, links, _, na = extract_text_and_links(url, html)
        rows.append((url, hashlib.md5(text.encode("utf-8")).hexdigest(), na))
    return _values_sql(rows, [("url", "VARCHAR"), ("text_md5", "VARCHAR"),
                              ("n_anchors", "INTEGER")])


def _o_extract_outlinks() -> str:
    from nipper_spark.functions.html_udfs import extract_text_and_links
    from nipper_spark.sources.synthetic import synth_pages_rows
    rows = []
    for (url, _, html, _, _) in synth_pages_rows(**CRAWL_PAGES):
        _, links, _, _ = extract_text_and_links(url, html)
        rows.append((url, len(links), "|".join(links)))
    return _values_sql(rows, [("url", "VARCHAR"), ("n_links", "INTEGER"),
                              ("links", "VARCHAR")])


def _o_doc_decontam() -> str:
    import duckdb
    from nipper_spark.functions.decontam import decontaminate_oracle
    con = duckdb.connect()
    docs = con.sql(
        f"SELECT doc_id, text FROM '{ORACLE_SF}/documents.parquet' "
        "ORDER BY doc_id").fetchall()
    con.close()
    bench = [" ".join(t.split()[10:26]) for d, t in docs if d % 17 == 0]
    rows = decontaminate_oracle(docs, bench, **DECON)
    return _values_sql(rows, [("doc_id", "BIGINT"),
                              ("n_hits", "BIGINT"),
                              ("n_gram_hits", "BIGINT"),
                              ("contaminated", "BOOLEAN")])


def _o_doc_c4_clean() -> str:
    import duckdb
    from nipper_spark.functions.filtering import c4_clean_doc
    con = duckdb.connect()
    docs = con.sql(
        f"SELECT doc_id, text FROM '{ORACLE_SF}/documents.parquet' "
        "ORDER BY doc_id").fetchall()
    con.close()
    rows = [(d,) + c4_clean_doc(_c4_page_py(d, t)) for d, t in docs]
    return _values_sql(rows, [("doc_id", "BIGINT"),
                              ("kept", "BOOLEAN"),
                              ("clean_md5", "VARCHAR"),
                              ("n_lines", "INTEGER"),
                              ("n_kept", "INTEGER"),
                              ("n_sentences", "INTEGER")])


def _o_doc_gopher_quality() -> str:
    import duckdb
    from nipper_spark.functions.filtering import gopher_quality_doc
    con = duckdb.connect()
    docs = con.sql(
        f"SELECT doc_id, text FROM '{ORACLE_SF}/documents.parquet' "
        "ORDER BY doc_id").fetchall()
    con.close()
    rows = [(d,) + gopher_quality_doc(_gopher_page_py(d, t))
            for d, t in docs]
    return _values_sql(rows, [
        ("doc_id", "BIGINT"), ("kept", "BOOLEAN"),
        ("n_words", "INTEGER"), ("sum_word_len", "INTEGER"),
        ("n_symbols", "INTEGER"), ("n_bullet_lines", "INTEGER"),
        ("n_ellipsis_lines", "INTEGER"), ("n_alpha_words", "INTEGER"),
        ("n_stop_hits", "INTEGER"), ("n_lines", "INTEGER")])


def _o_doc_gopher_repetition() -> str:
    import duckdb
    from nipper_spark.functions.filtering import gopher_repetition_doc
    con = duckdb.connect()
    docs = con.sql(
        f"SELECT doc_id, text FROM '{ORACLE_SF}/documents.parquet' "
        "ORDER BY doc_id").fetchall()
    con.close()
    rows = [(d,) + gopher_repetition_doc(_gopher_rep_page_py(d, t))
            for d, t in docs]
    return _values_sql(rows, [
        ("doc_id", "BIGINT"), ("kept", "BOOLEAN"),
        ("n_lines", "INTEGER"), ("n_dup_lines", "INTEGER"),
        ("dup_line_chars", "INTEGER"), ("top_bigram", "VARCHAR"),
        ("top_bigram_count", "INTEGER"), ("top_bigram_chars", "INTEGER"),
        ("text_chars", "INTEGER")])


def _o_doc_paragraph_dedup() -> str:
    import duckdb
    from nipper_spark.functions.dedup import dedup_paragraphs_oracle
    con = duckdb.connect()
    docs = con.sql(
        f"SELECT doc_id, text FROM '{ORACLE_SF}/documents.parquet' "
        "ORDER BY doc_id").fetchall()
    con.close()
    rows = dedup_paragraphs_oracle(
        [(d, _para_page_py(d, t)) for d, t in docs])
    return _values_sql(rows, [
        ("doc_id", "BIGINT"), ("n_paras", "INTEGER"),
        ("n_kept", "INTEGER"), ("clean_md5", "VARCHAR")])


def _o_curate_web_corpus() -> str:
    import duckdb
    from nipper_spark.functions.curate import curate_web_corpus_oracle
    con = duckdb.connect()
    docs = con.sql(
        f"SELECT doc_id, text FROM '{ORACLE_SF}/documents.parquet' "
        "ORDER BY doc_id").fetchall()
    con.close()
    rows = curate_web_corpus_oracle(
        [(d, _web_page_py(d, t)) for d, t in docs], **CURATE_WEB)
    return _values_sql(rows, [
        ("doc_id", "BIGINT"), ("n_paras", "INTEGER"),
        ("n_kept_paras", "INTEGER"), ("tokens", "INTEGER"),
        ("running_tokens", "BIGINT"), ("clean_md5", "VARCHAR")])


def _o_host_trap_stats() -> str:
    from nipper_spark.crawl.traps import host_trap_stats_sql
    return host_trap_stats_sql(_TRAP_URLS_CTE)


def _o_url_frontier_filter() -> str:
    import duckdb
    from nipper_spark.crawl.urlfilter import url_filter_oracle
    con = duckdb.connect()
    ids = con.sql(
        f"SELECT doc_id FROM '{ORACLE_SF}/documents.parquet' "
        "ORDER BY doc_id").fetchall()
    con.close()
    rows = url_filter_oracle([_urlfilter_url_py(d) for (d,) in ids],
                             blocked_domains=URLFILTER_BLOCKED)
    return _values_sql(rows, [
        ("url", "VARCHAR"), ("host", "VARCHAR"),
        ("allowed", "BOOLEAN"), ("reason", "VARCHAR")])


def _o_anchor_text_index() -> str:
    from nipper_spark.functions.anchors import anchor_text_index_oracle
    from nipper_spark.sources.synthetic import synth_pages_rows
    rows = [(u, h) for (u, _, h, _, _) in synth_pages_rows(**CRAWL_PAGES)]
    out = anchor_text_index_oracle(rows, top_anchors=ANCHOR_TOP)
    return _values_sql(out, [("dst", "VARCHAR"), ("n_refs", "BIGINT"),
                             ("n_src_hosts", "BIGINT"),
                             ("top_anchors", "VARCHAR")])


def _o_doc_repeated_spans() -> str:
    import hashlib
    import duckdb
    from nipper_spark.functions.boilerplate import repeated_spans_oracle
    con = duckdb.connect()
    docs = con.sql(
        f"SELECT doc_id, text FROM '{ORACLE_SF}/documents.parquet' "
        "ORDER BY doc_id").fetchall()
    con.close()
    out = repeated_spans_oracle(docs, **SPANS)
    rows = [(i, hashlib.md5(c.encode("utf-8")).hexdigest(), n, r)
            for i, (c, n, r) in sorted(out.items())]
    return _values_sql(rows, [("doc_id", "BIGINT"),
                              ("clean_md5", "VARCHAR"),
                              ("n_words", "INTEGER"),
                              ("n_removed", "INTEGER")])


def _o_host_pagerank() -> str:
    from nipper_spark.functions.graph import pagerank_oracle
    from nipper_spark.functions.html_udfs import extract_text_and_links
    from nipper_spark.functions.url import host_of
    from nipper_spark.sources.synthetic import synth_pages_rows
    edges = set()
    for (url, _, html, _, _) in synth_pages_rows(**PR_PAGES):
        _, links, _, _ = extract_text_and_links(url, html)
        for link in links:
            a, b = host_of(url), host_of(link)
            if a and b and a != b:
                edges.add((a, b))
    pr = pagerank_oracle(sorted(edges), iters=PR_ITERS)
    rows = [(host, outdeg, rank_q)
            for host, (outdeg, rank_q) in sorted(pr.items())]
    return _values_sql(rows, [("host", "VARCHAR"), ("outdeg", "INTEGER"),
                              ("rank_q", "BIGINT")])


def _o_rank_seed_scores() -> str:
    from nipper_spark.functions.graph import pagerank_oracle
    from nipper_spark.functions.html_udfs import extract_text_and_links
    from nipper_spark.functions.url import host_of
    from nipper_spark.sources.synthetic import synth_pages_rows
    edges = set()
    cand = set()
    for (url, _, html, _, _) in synth_pages_rows(**PR_PAGES):
        _, links, _, _ = extract_text_and_links(url, html)
        a = host_of(url)
        for link in links:
            b = host_of(link)
            if b:
                cand.add((link, b))
            if a and b and a != b:
                edges.add((a, b))
    pr = pagerank_oracle(sorted(edges), iters=PR_ITERS)
    rows = [(u, h, pr[h][1]) for u, h in sorted(cand) if h in pr]
    return _values_sql(rows, [("url", "VARCHAR"), ("host", "VARCHAR"),
                              ("rank_q", "BIGINT")])


def _o_warc_extract() -> str:
    """Single-threaded twin: read the SAME files the engine reads,
    through the same pure parser + extraction kernel."""
    import hashlib
    import os
    from nipper_spark.functions.html_udfs import extract_text_and_links
    from nipper_spark.sources.warc import parse_warc_bytes
    d = _warc_corpus_dir()
    rows = []
    for fn in sorted(os.listdir(d)):
        with open(os.path.join(d, fn), "rb") as f:
            for url, ts, html in parse_warc_bytes(f.read()):
                text, links, _, _ = extract_text_and_links(url, html)
                rows.append((url, ts.strftime("%Y-%m-%d %H:%M:%S"),
                             hashlib.md5(text.encode("utf-8")).hexdigest(),
                             len(links)))
    return _values_sql(rows, [("url", "VARCHAR"), ("fetched", "VARCHAR"),
                              ("text_md5", "VARCHAR"),
                              ("n_links", "INTEGER")])


def _o_canonicalize() -> str:
    from nipper_spark.functions.url import canonicalize_url
    rows = [(u, canonicalize_url(u)) for u in CANON_VECTORS]
    return _values_sql(rows, [("url", "VARCHAR"), ("canonical", "VARCHAR")])


def _o_crawl_schedule() -> str:
    from nipper_spark.crawl.oracle import crawl_oracle
    from nipper_spark.sources.synthetic import synth_pages_rows
    pages = {u: h for (u, _, h, _, _) in synth_pages_rows(**CRAWL_PAGES)}
    res = crawl_oracle(pages, _crawl_seeds(), _crawl_policy(),
                       max_rounds=CRAWL_ROUNDS)
    rows = []
    for r, wave in enumerate(res.schedules):
        for seq, (url, host, depth, score) in enumerate(wave):
            rows.append((r, seq, url, host, depth, score))
    return _values_sql(rows, [
        ("round", "INTEGER"), ("seq", "INTEGER"), ("url", "VARCHAR"),
        ("host", "VARCHAR"), ("depth", "INTEGER"), ("score", "DOUBLE")])


_NORM = "lower(regexp_replace(trim(text), '\\s+', ' ', 'g'))"

_O_EXACT_DUPS = f"""
WITH aug AS (
  SELECT doc_id, text FROM documents
  UNION ALL
  SELECT doc_id + 1000000 AS doc_id, text FROM documents
  WHERE doc_id % 25 = 0)
SELECT md5({_NORM}) AS text_hash,
       CAST(count(*) AS BIGINT) AS n_dups,
       CAST(min(doc_id) AS BIGINT) AS keep_id,
       array_to_string(list_sort(list(doc_id)), ',') AS dup_ids
FROM aug GROUP BY 1 HAVING count(*) > 1
"""

_O_EXACT_SURVIVORS = f"""
SELECT CAST(min(doc_id) AS BIGINT) AS doc_id
FROM documents GROUP BY md5({_NORM})
"""

_O_TOKENS = r"""
SELECT CAST(doc_id AS BIGINT) AS doc_id,
       CAST(len(regexp_split_to_array(trim(text), '\s+')) AS INTEGER)
           AS ws_tokens,
       CAST(len(regexp_extract_all(text, '[A-Za-z]+|[0-9]|[^A-Za-z0-9\s]'))
           AS INTEGER) AS bpe_tokens
FROM documents
"""

_STOPLIST_SQL = ("['the','a','of','to','and','in','is','for','on','with',"
                 "'as','at','by','an','it']")

_O_QUALITY = f"""
WITH w AS (
  SELECT doc_id,
         length(text) AS n_chars,
         regexp_split_to_array(trim(text), '\\s+') AS words,
         len(regexp_extract_all(text, '[\\.,;:!\\?]')) AS n_punct,
         text
  FROM documents
), s AS (
  SELECT doc_id, n_chars, len(words) AS n_words, n_punct,
         len(list_filter(words, w -> list_contains({_STOPLIST_SQL},
                                                   lower(w)))) AS stop_hits
  FROM w
)
SELECT CAST(doc_id AS BIGINT) AS doc_id,
       CAST(n_chars AS INTEGER) AS n_chars,
       CAST(n_words AS INTEGER) AS n_words,
       CAST(n_punct AS DOUBLE) / greatest(n_words, 1) AS punct_ratio,
       CAST(stop_hits AS DOUBLE) / greatest(n_words, 1) AS stopword_ratio,
       (least(CAST(n_words AS DOUBLE) / 64.0, 1.0) +
        least(CAST(stop_hits AS DOUBLE) / greatest(CAST(n_words AS DOUBLE),
              1.0) * 4.0, 1.0)) / 2.0 AS quality
FROM s
"""


def _read_docs_sf001():
    import pyarrow.parquet as pq
    t = pq.read_table(f"{ORACLE_SF}/documents.parquet",
                      columns=["doc_id", "text"])
    return t["doc_id"].to_pylist(), t["text"].to_pylist()


def _o_doc_lang() -> str:
    # replicate the UDF's trigram heuristic single-threaded
    from collections import Counter
    from nipper_spark.functions.text_udfs import _LANG_PROFILES
    profiles = {k: frozenset(v) for k, v in _LANG_PROFILES.items()}
    _, texts = _read_docs_sf001()
    counts: Counter = Counter()
    for t in texts:
        if not t:
            counts["und"] += 1
            continue
        s = " " + str(t)[:2000].lower() + " "
        if any(0x4E00 <= ord(ch) <= 0x9FFF for ch in s[:200]):
            counts["zh"] += 1
            continue
        tris = {s[i:i + 3] for i in range(len(s) - 2)}
        best, best_hits = "und", 2
        for lang, prof in profiles.items():
            hits = len(tris & prof)
            if hits > best_hits:
                best, best_hits = lang, hits
        counts[best] += 1
    rows = sorted(counts.items())
    return _values_sql(rows, [("lang_pred", "VARCHAR"), ("n", "BIGINT")])


def _o_doc_fingerprints() -> str:
    from nipper_spark.functions.text_udfs import fingerprint
    ids, texts = _read_docs_sf001()
    rows = [(i, fingerprint(t if t is not None else ""))
            for i, t in zip(ids, texts)]
    return _values_sql(rows, [("doc_id", "BIGINT"),
                              ("fingerprint", "BIGINT")])


def _o_minhash() -> str:
    from nipper_spark.functions.dedup import (
        _minhash_params, bucket_candidate_pairs, minhash_signature,
        ngram_jaccard)
    ids, texts = _read_docs_sf001()
    params = _minhash_params(MINHASH["num_perm"], MINHASH["seed"])
    rpb = MINHASH["num_perm"] // MINHASH["bands"]
    buckets: dict = {}
    sigs = {}
    for i, t in zip(ids, texts):
        sig = minhash_signature(str(t or ""), MINHASH["num_perm"],
                                MINHASH["ngram"], params)
        sigs[i] = sig
        for b in range(MINHASH["bands"]):
            key = (b, tuple(sig[b * rpb:(b + 1) * rpb]))
            buckets.setdefault(key, []).append(i)
    textmap = dict(zip(ids, texts))
    pairs = set()
    for key, members in buckets.items():
        pairs.update(bucket_candidate_pairs(members, MINHASH["max_bucket"]))
    rows = []
    for a, b in sorted(pairs):
        j = ngram_jaccard(str(textmap[a] or ""), str(textmap[b] or ""),
                          MINHASH["ngram"])
        if j >= MINHASH["threshold"]:
            rows.append((a, b, j))
    return _values_sql(rows, [("id_a", "BIGINT"), ("id_b", "BIGINT"),
                              ("jaccard", "DOUBLE")])


def _o_simhash() -> str:
    from nipper_spark.functions.dedup import bucket_candidate_pairs, simhash
    ids, texts = _read_docs_sf001()
    sims = {i: simhash(str(t or ""), SIMHASH["ngram"])
            for i, t in zip(ids, texts)}
    pb = SIMHASH["prefix_bits"]
    buckets: dict = {}
    for i, s in sims.items():
        u = s & ((1 << 64) - 1)
        for k in range(64 // pb):
            key = (k, (u >> (k * pb)) & ((1 << pb) - 1))
            buckets.setdefault(key, []).append(i)
    pairs = set()
    for key, members in buckets.items():
        pairs.update(bucket_candidate_pairs(members, SIMHASH["max_bucket"]))
    rows = []
    for a, b in sorted(pairs):
        ham = bin((sims[a] ^ sims[b]) & ((1 << 64) - 1)).count("1")
        if ham <= SIMHASH["max_hamming"]:
            rows.append((a, b, ham))
    return _values_sql(rows, [("id_a", "BIGINT"), ("id_b", "BIGINT"),
                              ("hamming", "INTEGER")])


def _read_emb_sf001():
    import numpy as np
    import pyarrow.parquet as pq
    t = pq.read_table(f"{ORACLE_SF}/embeddings.parquet",
                      columns=["vec_id", "embedding"])
    ids = np.asarray(t["vec_id"].to_pylist())
    m = np.asarray(t["embedding"].to_pylist(), dtype="float32")
    return ids, m


def _o_ann_brute() -> str:
    import numpy as np
    ids, m = _read_emb_sf001()
    norm = m / np.where(
        np.linalg.norm(m, axis=1, keepdims=True) == 0, 1.0,
        np.linalg.norm(m, axis=1, keepdims=True))
    rows = []
    for qi in range(ANN["n_queries"]):
        sims = norm @ norm[qi]
        order = sorted(zip(-sims.astype(float), ids))
        for rank, (negs, vid) in enumerate(order[:ANN["k"]], start=1):
            rows.append((int(ids[qi]), rank, int(vid)))
    return _values_sql(rows, [("query_id", "BIGINT"), ("rank", "INTEGER"),
                              ("vec_id", "BIGINT")])


def _o_ann_lsh() -> str:
    import numpy as np
    from nipper_spark.functions.similarity import _hyperplanes
    ids, m = _read_emb_sf001()
    dim = m.shape[1]
    planes = _hyperplanes(dim, LSH_ANN["n_bits"], LSH_ANN["seed"])
    bits_per_band = LSH_ANN["n_bits"] // LSH_ANN["bands"]
    weights = (1 << np.arange(bits_per_band)).astype(np.int64)
    signs = (m @ planes) > 0

    def codes(row):
        return [int((row[b * bits_per_band:(b + 1) * bits_per_band]
                     * weights).sum()) + (b << 24)
                for b in range(LSH_ANN["bands"])]

    corpus_codes = [set(codes(signs[i])) for i in range(len(ids))]
    norms = np.linalg.norm(m, axis=1, keepdims=True)
    norm = m / np.where(norms == 0, 1.0, norms)
    rows = []
    for qi in range(ANN["n_queries"]):
        qcodes = corpus_codes[qi]
        cand = [i for i in range(len(ids)) if corpus_codes[i] & qcodes]
        sims = [(float((norm[i] * norm[qi]).sum()), int(ids[i]))
                for i in cand]
        order = sorted(((-s, v) for s, v in sims))
        for rank, (negs, vid) in enumerate(order[:LSH_ANN["k"]], start=1):
            rows.append((int(ids[qi]), rank, vid))
    return _values_sql(rows, [("query_id", "BIGINT"), ("rank", "INTEGER"),
                              ("vec_id", "BIGINT")])


def _o_ann_lsh_df() -> str:
    """Same twin as _o_ann_lsh, but queries are the n_queries SMALLEST
    vec_ids (the DF variant picks them via orderBy/limit)."""
    import numpy as np
    from nipper_spark.functions.similarity import _hyperplanes
    ids, m = _read_emb_sf001()
    dim = m.shape[1]
    planes = _hyperplanes(dim, LSH_ANN["n_bits"], LSH_ANN["seed"])
    bits_per_band = LSH_ANN["n_bits"] // LSH_ANN["bands"]
    weights = (1 << np.arange(bits_per_band)).astype(np.int64)
    signs = (m @ planes) > 0

    def codes(row):
        return [int((row[b * bits_per_band:(b + 1) * bits_per_band]
                     * weights).sum()) + (b << 24)
                for b in range(LSH_ANN["bands"])]

    corpus_codes = [set(codes(signs[i])) for i in range(len(ids))]
    norms = np.linalg.norm(m, axis=1, keepdims=True)
    norm = m / np.where(norms == 0, 1.0, norms)
    rows = []
    for qi in np.argsort(ids)[:ANN["n_queries"]]:
        qcodes = corpus_codes[qi]
        cand = [i for i in range(len(ids)) if corpus_codes[i] & qcodes]
        sims = [(float((norm[i] * norm[qi]).sum()), int(ids[i]))
                for i in cand]
        order = sorted(((-s, v) for s, v in sims))
        for rank, (negs, vid) in enumerate(order[:LSH_ANN["k"]], start=1):
            rows.append((int(ids[qi]), rank, vid))
    return _values_sql(rows, [("query_id", "BIGINT"), ("rank", "INTEGER"),
                              ("vec_id", "BIGINT")])


def _o_embedding_neardup() -> str:
    import numpy as np
    from nipper_spark.functions.similarity import _hyperplanes
    ids, m = _read_emb_sf001()
    dup = ids % 40 == 0  # same augmentation as the Spark query
    ids = np.concatenate([ids, ids[dup] + 1_000_000])
    m = np.concatenate([m, m[dup]])
    dim = m.shape[1]
    planes = _hyperplanes(dim, NEARDUP["n_bits"], NEARDUP["seed"])
    bits_per_band = NEARDUP["n_bits"] // NEARDUP["bands"]
    weights = (1 << np.arange(bits_per_band)).astype(np.int64)
    signs = (m @ planes) > 0
    buckets: dict = {}
    for i in range(len(ids)):
        for b in range(NEARDUP["bands"]):
            code = int((signs[i][b * bits_per_band:(b + 1) * bits_per_band]
                        * weights).sum()) + (b << 24)
            buckets.setdefault(code, []).append(i)
    norms = np.linalg.norm(m, axis=1, keepdims=True)
    norm = m / np.where(norms == 0, 1.0, norms)
    # cap semantics are defined on vec_ids (the Spark star hub is
    # min(id)), so run the kernel over ids, not row indices
    from nipper_spark.functions.dedup import bucket_candidate_pairs
    idx_of = {int(ids[i]): i for i in range(len(ids))}
    pairs = set()
    for members in buckets.values():
        pairs.update(bucket_candidate_pairs(
            [int(ids[i]) for i in members], NEARDUP["max_bucket"]))
    rows = []
    for ia, ib in sorted(pairs):
        cos = float((norm[idx_of[ia]] * norm[idx_of[ib]]).sum())
        if cos >= NEARDUP["threshold"]:
            rows.append((ia, ib))
    return _values_sql(rows, [("id_a", "BIGINT"), ("id_b", "BIGINT")])


_O_TOPK = """
SELECT CAST(o_custkey AS BIGINT) AS custkey,
       CAST(rk AS INTEGER) AS rk,
       CAST(o_orderkey AS BIGINT) AS orderkey,
       o_totalprice AS totalprice
FROM (SELECT o_custkey, o_orderkey, o_totalprice,
             row_number() OVER (PARTITION BY o_custkey
                                ORDER BY o_totalprice DESC, o_orderkey)
                 AS rk
      FROM orders) WHERE rk <= 3
"""

_O_ANTI = """
SELECT CAST(c_custkey AS BIGINT) AS custkey FROM customer c
WHERE NOT EXISTS (SELECT 1 FROM orders o
                  WHERE o.o_custkey = c.c_custkey
                    AND o.o_orderpriority = '1-URGENT')
"""

_O_COUNTERS = """
SELECT event_type, CAST(count(*) AS BIGINT) AS n,
       round(sum(value), 4) AS sum_value
FROM events GROUP BY event_type ORDER BY event_type
"""

_O_STAR = """
SELECT r.r_name AS region, n.n_name AS nation,
       CAST(count(*) AS BIGINT) AS n_customers,
       round(sum(c.c_acctbal), 2) AS acctbal
FROM customer c JOIN nation n ON c.c_nationkey = n.n_nationkey
JOIN region r ON n.n_regionkey = r.r_regionkey
GROUP BY 1, 2 ORDER BY 1, 2
"""


def oracle_sql() -> dict[str, str]:
    """DuckDB oracles for every query — the media fake codecs are pure
    payload functions over seed-fixed rows, so even they get exact
    VALUES oracles (computed by the single-threaded twin)."""
    return {
        "sel_counts": _o_sel_counts(),
        "hn_stories": _o_hn_stories(),
        "serialize_goldens": _o_serialize(),
        "extract_text_hash": _o_extract_text_hash(),
        "warc_extract": _o_warc_extract(),
        "host_pagerank": _o_host_pagerank(),
        "rank_seed_scores": _o_rank_seed_scores(),
        "extract_outlinks": _o_extract_outlinks(),
        "anchor_text_index": _o_anchor_text_index(),
        "canonicalize_urls": _o_canonicalize(),
        "crawl_schedule": _o_crawl_schedule(),
        "round_skew": _o_round_skew(),
        "doc_exact_dup_groups": _O_EXACT_DUPS,
        "dedup_exact_survivors": _O_EXACT_SURVIVORS,
        "dedup_minhash_lsh": _o_minhash(),
        "dedup_ngram_jaccard": _o_ngram_jaccard(),
        "dedup_simhash": _o_simhash(),
        "dedup_cluster_survivors": _o_cluster_survivors(),
        "dedup_incremental": _o_dedup_incremental(),
        "dedup_exact_incremental": _o_dedup_exact_incremental(),
        "dedup_rolling_store": _o_dedup_rolling_store(),
        "embedding_near_dup": _o_embedding_neardup(),
        "embedding_near_dup_incremental":
            _o_embedding_neardup_incremental(),
        "doc_token_counts": _O_TOKENS,
        "doc_quality": _O_QUALITY,
        "doc_lang_pred": _o_doc_lang(),
        "doc_fingerprints": _o_doc_fingerprints(),
        "doc_vocab_stats": _O_VOCAB_STATS,
        "source_stats": _O_SOURCE_STATS,
        "doc_sample_split": _o_sample_split(),
        "doc_pii_scrub": _o_doc_pii_scrub(),
        "doc_repeated_spans": _o_doc_repeated_spans(),
        "doc_c4_clean": _o_doc_c4_clean(),
        "doc_gopher_quality": _o_doc_gopher_quality(),
        "doc_gopher_repetition": _o_doc_gopher_repetition(),
        "doc_paragraph_dedup": _o_doc_paragraph_dedup(),
        "url_frontier_filter": _o_url_frontier_filter(),
        "host_trap_stats": _o_host_trap_stats(),
        "doc_fix_mojibake": _o_doc_fix_mojibake(),
        "doc_decontam": _o_doc_decontam(),
        "ann_brute_topk": _o_ann_brute(),
        "ann_lsh_topk": _o_ann_lsh(),
        "ann_ivf_topk": _o_ann_ivf(),
        "ann_ivf_df_topk": _o_ann_ivf_df(),
        "ann_lsh_df_topk": _o_ann_lsh_df(),
        "ann_ivfpq_topk": _o_ann_ivfpq(),
        "ann_ivfpq_df_topk": _o_ann_ivfpq_df(),
        "readability": _o_readability(),
        "curate_training_set": _o_curate(),
        "curate_neardup_training_set": _o_curate_neardup(),
        "curate_web_corpus": _o_curate_web_corpus(),
        "topk_per_group": _O_TOPK,
        "anti_join_dedup": _O_ANTI,
        "round_counters": _O_COUNTERS,
        "event_time_windows": _O_EVENT_WINDOWS,
        "event_sessions": _O_EVENT_SESSIONS,
        "source_lang_rollup": _O_ROLLUP,
        "pricing_summary": _O_PRICING,
        "shipping_priority": _O_SHIPPING,
        "star_join_broadcast": _O_STAR,
        "media_image_features": _o_media_features(),
        "media_frame_samples": _o_media_frames(),
        "media_real_decode": _o_media_real_decode(),
        "sitemap_harvest": _o_sitemap_harvest(),
        "sitemap_refresh": _o_sitemap_refresh(),
        "robots_sitemap_seeds": _o_robots_sitemap_seeds(),
        "recrawl_scores": _O_RECRAWL,
        "redirect_resolve": _o_redirect_resolve(),
        "doc_bpe_tokens": _o_doc_bpe_tokens(),
        "doc_lm_perplexity": _o_doc_lm_perplexity(),
    }
