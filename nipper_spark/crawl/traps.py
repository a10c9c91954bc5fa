"""Crawler-trap detection — the frontier-side defence against hosts
that generate unbounded URL spaces (calendar pages, session-id links,
faceted search): a host whose URLs collapse onto very few PATH
TEMPLATES after digit-run normalization is emitting machine-generated
links, and the frontier should cap or down-score it (the classic
Heritrix/Nutch "too many URLs, too little variety" heuristic).

Scale shape: one projection derives (host, template) — digit runs →
``N`` via a single regexp_replace — then ONE hash aggregation on host
with a count-distinct over templates. Catalyst plans count-distinct as
a two-phase aggregate keyed (host, template), so a trap host with 10⁹
URLs collapses to a handful of rows map-side before the exchange: the
hotter the trap, the CHEAPER its shuffle. No Python anywhere, and the
rule is integer arithmetic (20·templates ≤ urls ⇔ ratio ≤ 0.05), so
the DuckDB oracle runs the very same SQL — no VALUES twin needed.
"""

from __future__ import annotations

from pyspark.sql import DataFrame
from pyspark.sql import functions as F

from nipper_spark.functions.url import HOST_RE_SQL

_PATH_RE = r"^https?://[^/]+(/.*)"
DEFAULT_MIN_URLS = 50


def host_trap_stats(cands: DataFrame, url_col: str = "url",
                    min_urls: int = DEFAULT_MIN_URLS) -> DataFrame:
    """cands → (host, n_urls, n_templates, trap) per host.

    ``trap`` is true when the host contributed at least ``min_urls``
    candidates AND at most 1 template per 20 URLs survived digit-run
    normalization — i.e. the URL space is near-pure machine generation.
    Emitted for every host (callers join the trap flag back onto the
    frontier as a down-score or cap input).
    """
    url = F.col(url_col)
    host = F.regexp_extract(url, HOST_RE_SQL, 1)
    path = F.regexp_extract(url, _PATH_RE, 1)
    template = F.regexp_replace(path, "[0-9]+", "N")
    derived = cands.select(host.alias("host"),
                           template.alias("template"))
    return (derived.groupBy("host")
            .agg(F.count("*").alias("n_urls"),
                 F.countDistinct("template").alias("n_templates"))
            .select("host", "n_urls", "n_templates",
                    ((F.col("n_urls") >= min_urls)
                     & (20 * F.col("n_templates") <= F.col("n_urls")))
                    .alias("trap")))


def host_trap_stats_sql(urls_cte: str,
                        min_urls: int = DEFAULT_MIN_URLS) -> str:
    """The SAME computation as ANSI SQL over a CTE that yields a
    ``url`` column — the DuckDB oracle body (RE2 and Java agree on
    these regexes; counts and the rule are integer-exact)."""
    return f"""
WITH urls AS ({urls_cte}),
t AS (
  SELECT regexp_extract(url, '^https?://(\\[[^\\]]+\\]|[^/:]+)', 1)
           AS host,
         regexp_replace(
           regexp_extract(url, '^https?://[^/]+(/.*)', 1),
           '[0-9]+', 'N', 'g') AS template
  FROM urls)
SELECT host,
       count(*) AS n_urls,
       count(DISTINCT template) AS n_templates,
       (count(*) >= {min_urls}
        AND 20 * count(DISTINCT template) <= count(*)) AS trap
FROM t
GROUP BY host
""".strip()
