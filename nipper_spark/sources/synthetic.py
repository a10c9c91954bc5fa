"""Deterministic synthetic Common-Crawl-style ``pages`` table.

The engine's one input table (BASELINE.json input_hint):

    pages(url string, warc_ts timestamp, html binary, text string,
          lang string)

Two row sources, both fully deterministic (seed 42, FIXTURES.md §1):

1. the five reference test pages, loaded verbatim at runtime from the
   read-only mount (never copied into this repo);
2. a seeded generated link graph: hosts drawn Zipf-ish over
   ``host{NN}.test`` with a hot-host skew factor, messy hrefs
   (uppercase scheme/host, fragments, unsorted query params, relative
   paths) to exercise canonicalization, politeness, and salting.

At 100 TB this table is an Iceberg table bucketed by host hash; here
the generator stands in for the scan, with the same schema.
"""

from __future__ import annotations

import datetime
import os
import random

REFERENCE_PAGES_DIR = "/root/reference/test-pages"

FIXTURE_URLS = {
    "page.html": "http://fixture.test/page",
    "page2.html": "http://fixture.test/page2",
    "rustwiki.html": "http://fixture.test/rustwiki",
    "hacker_news.html": "http://fixture.test/hn",
    "wisburg.html": "http://fixture.test/wisburg",
}

_EPOCH = datetime.datetime(2024, 1, 1)

PAGES_SCHEMA = ("url string, warc_ts timestamp, html binary, "
                "text string, lang string")


def fixture_pages_rows() -> list[tuple]:
    """The five reference test pages as pages-table rows."""
    rows = []
    for i, (fname, url) in enumerate(sorted(FIXTURE_URLS.items())):
        path = os.path.join(REFERENCE_PAGES_DIR, fname)
        with open(path, "rb") as f:
            html = f.read()
        lang = "zh-CN" if fname == "wisburg.html" else "en"
        rows.append((url, _EPOCH + datetime.timedelta(seconds=i), html,
                     None, lang))
    return rows


def _zipf_host(rng: random.Random, n_hosts: int, skew: float) -> int:
    """Zipf(skew)-distributed host index (host 0 is the hot host)."""
    # inverse-CDF-free rejection-light approximation, deterministic
    while True:
        k = int(rng.paretovariate(skew))
        if k <= n_hosts:
            return k - 1


_WORDS = ("crawl frontier spark arrow parquet shuffle partition bloom "
          "politeness budget host queue depth score lineage checkpoint "
          "skew salt broadcast catalyst tungsten codegen scan filter "
          "page link anchor text body title meta header footer nav").split()


def synth_pages_rows(n_pages: int = 200, links_per_page: int = 8,
                     n_hosts: int = 20, skew: float = 1.2,
                     seed: int = 42) -> list[tuple]:
    """Generate the seeded link graph (FIXTURES.md §1 'scaled synthetic
    rows'). Page i lives on a Zipf-skewed host; hrefs are intentionally
    messy — canonicalizing them yields links into the same url space.
    """
    rng = random.Random(seed)
    hosts = [f"host{h:02d}.test" for h in range(n_hosts)]
    page_host = [_zipf_host(rng, n_hosts, skew) for _ in range(n_pages)]
    urls = [f"http://{hosts[page_host[i]]}/page/{i}" for i in range(n_pages)]

    rows = []
    for i in range(n_pages):
        n_para = 1 + rng.randrange(3)
        paras = []
        for _ in range(n_para):
            words = " ".join(rng.choice(_WORDS)
                             for _ in range(5 + rng.randrange(20)))
            paras.append(f"<p>{words}</p>")
        links = []
        for _ in range(links_per_page):
            j = rng.randrange(n_pages)
            style = rng.randrange(5)
            target_host = hosts[page_host[j]]
            if style == 0:  # clean absolute
                href = f"http://{target_host}/page/{j}"
            elif style == 1:  # uppercase scheme+host → canonicalization
                href = f"HTTP://{target_host.upper()}/page/{j}"
            elif style == 2:  # fragment to strip
                href = f"http://{target_host}/page/{j}#frag{rng.randrange(9)}"
            elif style == 3:  # unsorted query params to sort
                href = (f"http://{target_host}/page/{j}?b={rng.randrange(9)}"
                        f"&a={rng.randrange(9)}")
            else:  # relative (same host only)
                if target_host == hosts[page_host[i]]:
                    href = f"/page/{j}"
                else:
                    href = f"http://{target_host}/page/{j}"
            links.append(f'<a href="{href}">link {j}</a>')
        html = ("<!DOCTYPE html><html><head><title>Page %d</title></head>"
                "<body><h1>Page %d</h1>%s<div class=\"links\">%s</div>"
                "</body></html>"
                % (i, i, "".join(paras), " ".join(links)))
        rows.append((urls[i],
                     _EPOCH + datetime.timedelta(seconds=i),
                     html.encode("utf-8"), None, "en"))
    return rows


def pages_df(spark, include_fixtures: bool = True, n_pages: int = 200,
             links_per_page: int = 8, n_hosts: int = 20,
             seed: int = 42, partitions: int | None = None):
    """Build the pages DataFrame. In production this is
    ``spark.read.table("pages")`` (Iceberg, bucketed by host hash);
    partition count models that bucketing for the sandbox."""
    rows = synth_pages_rows(n_pages, links_per_page, n_hosts, seed=seed)
    if include_fixtures:
        rows = fixture_pages_rows() + rows
    df = spark.createDataFrame(rows, PAGES_SCHEMA)
    if partitions:
        df = df.repartition(partitions, "url")
    return df
