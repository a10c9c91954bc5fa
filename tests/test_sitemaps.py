"""Sitemap harvesting: kernel parse, executor-side table harvest, and
the distributed frontier bootstrap — engine==oracle end-to-end when a
crawl is seeded from harvested sitemaps instead of a driver list."""

import datetime
import gzip

import pytest
from pyspark.sql import functions as F

from nipper_spark.crawl.frontier import FrontierEngine
from nipper_spark.crawl.oracle import crawl_oracle
from nipper_spark.crawl.politeness import CrawlPolicy
from nipper_spark.crawl.sitemaps import (
    harvest_sitemap_tables, parse_sitemap, sitemap_seed_frontier)
from nipper_spark.crawl.state import SCHEDULE_SCHEMA, SEEN_SCHEMA, CrawlState
from nipper_spark.sources.synthetic import PAGES_SCHEMA, synth_pages_rows


class TestParseKernel:
    def test_urlset(self):
        xml = (b'<?xml version="1.0"?>'
               b'<urlset xmlns="http://www.sitemaps.org/schemas/sitemap/0.9">'
               b"<url><loc>http://h.test/a?x=1&amp;y=2</loc>"
               b"<lastmod>2026-01-01</lastmod><priority>0.8</priority></url>"
               b"<url><loc> http://h.test/b </loc></url>"
               b"<url><lastmod>2026-01-01</lastmod></url></urlset>")
        assert parse_sitemap(xml) == [
            ("url", "http://h.test/a?x=1&y=2", "2026-01-01", 0.8),
            ("url", "http://h.test/b", None, None)]
        # gzip payload: identical result
        assert parse_sitemap(gzip.compress(xml)) == parse_sitemap(xml)

    def test_sitemapindex(self):
        idx = (b"<sitemapindex><sitemap>"
               b"<loc>http://h.test/sitemap1.xml</loc>"
               b"<lastmod>2025-12-31</lastmod></sitemap></sitemapindex>")
        assert parse_sitemap(idx) == [
            ("sitemap", "http://h.test/sitemap1.xml", "2025-12-31", None)]

    def test_plaintext_variant(self):
        body = b"http://h.test/p1\nhttps://h.test/p2\n# junk\nnot a url\n"
        assert parse_sitemap(body) == [
            ("url", "http://h.test/p1", None, None),
            ("url", "https://h.test/p2", None, None)]

    def test_is_sitemap_url_query_strings_and_rlike_parity(self):
        """Paginated sitemaps (sitemap.xml?page=2) must dispatch to the
        sitemap parser — canonicalize_url preserves queries, so an
        end-anchored pattern on the full URL silently lost them. The
        one pattern string must also behave identically under Python
        re and DuckDB's Java-style regexp (the rlike twin)."""
        import duckdb
        from nipper_spark.crawl.sitemaps import (
            _SITEMAP_URL_RE, is_sitemap_url)
        cases = {
            "http://h.test/sitemap.xml": True,
            "http://h.test/sitemap.xml?page=2": True,
            "http://h.test/sitemap-news.xml.gz?d=1&p=2": True,
            "http://h.test/sitemap.txt": True,
            "http://h.test/a/sitemap_1.xml": True,
            "http://h.test/sitemap.xml/evil.html": False,
            "http://h.test/page?ref=sitemap.xml": False,
            "http://h.test/sitemap.html": False,
            "http://h.test/notasitemap/x.xml": False,
        }
        con = duckdb.connect()
        for url, want in cases.items():
            assert is_sitemap_url(url) is want, url
            got = con.execute("SELECT regexp_matches(?, ?)",
                              [url, _SITEMAP_URL_RE]).fetchone()[0]
            assert bool(got) is want, ("duckdb", url)

    def test_garbage_never_raises(self):
        for body in (b"", b"\x1f\x8b broken gzip", b"<urlset><url><loc>",
                     b"\x00\xff binary", "plain text no urls",
                     b"<urlset><url><loc></loc></url></urlset>",
                     b"<urlset><url><loc>http://h.test/x</loc>"
                     b"<priority>high</priority></url></urlset>"):
            out = parse_sitemap(body)
            assert isinstance(out, list)


@pytest.fixture(scope="module")
def spark():
    from nipper_spark.session import build_session
    return build_session("sitemap-tests", master="local[4]",
                         shuffle_partitions=4)


@pytest.fixture(scope="module")
def rows():
    return synth_pages_rows(n_pages=40, links_per_page=4, n_hosts=8,
                            seed=42)


def _sitemap_rows(rows):
    """Sitemap pages-table rows advertising a subset of the synthetic
    corpus: an XML urlset (with priorities + a cross-host spam entry),
    a gzipped child urlset behind a sitemapindex, and a plain-text
    sitemap — one per host."""
    from nipper_spark.functions.url import host_of
    by_host: dict[str, list[str]] = {}
    for (u, _, _, _, _) in rows:
        by_host.setdefault(host_of(u), []).append(u)
    hosts = sorted(h for h, us in by_host.items() if len(us) >= 3)
    ha, hb, hc = hosts[0], hosts[1], hosts[2]
    ts = rows[0][1]
    a_urls = by_host[ha][:3]
    xml_a = ("<urlset>"
             + f"<url><loc>{a_urls[0]}</loc><priority>0.9</priority></url>"
             + f"<url><loc>{a_urls[1]}</loc><priority>0.7</priority>"
               "<lastmod>2026-02-02</lastmod></url>"
             + f"<url><loc>{a_urls[2]}</loc></url>"
             + "<url><loc>http://evil.test/spam</loc>"
               "<priority>1.0</priority></url>"
             + "</urlset>").encode()
    b_urls = by_host[hb][:2]
    child_b = gzip.compress(
        ("<urlset>"
         + "".join(f"<url><loc>{u}</loc><priority>0.6</priority></url>"
                   for u in b_urls)
         + "</urlset>").encode())
    index_b = (f"<sitemapindex><sitemap><loc>http://{hb}/sitemap-b.xml.gz"
               "</loc></sitemap></sitemapindex>").encode()
    c_urls = by_host[hc][:2]
    txt_c = ("\n".join(c_urls) + "\n").encode()
    return [
        (f"http://{ha}/sitemap.xml", ts, xml_a, "", "en"),
        (f"http://{hb}/sitemap.xml", ts, index_b, "", "en"),
        (f"http://{hb}/sitemap-b.xml.gz", ts, child_b, "", "en"),
        (f"http://{hc}/sitemap.txt", ts, txt_c, "", "en"),
    ], dict(ha=ha, hb=hb, hc=hc, a_urls=a_urls, b_urls=b_urls,
            c_urls=c_urls)


@pytest.fixture(scope="module")
def corpus(spark, rows):
    smap_rows, info = _sitemap_rows(rows)
    pages = spark.createDataFrame(rows + smap_rows, PAGES_SCHEMA).cache()
    pages.count()
    return pages, info


class TestHarvest:
    def test_entries(self, spark, corpus):
        pages, info = corpus
        entries = harvest_sitemap_tables(pages)
        got = {(r["host"], r["url"], r["kind"],
                r["lastmod"], r["priority"])
               for r in entries.collect()}
        expect = {
            (info["ha"], info["a_urls"][0], "url", None, 0.9),
            (info["ha"], info["a_urls"][1], "url", "2026-02-02", 0.7),
            (info["ha"], info["a_urls"][2], "url", None, None),
            # index reference surfaces as kind='sitemap'
            (info["hb"], f"http://{info['hb']}/sitemap-b.xml.gz",
             "sitemap", None, None),
            (info["hb"], info["b_urls"][0], "url", None, 0.6),
            (info["hb"], info["b_urls"][1], "url", None, 0.6),
            (info["hc"], info["c_urls"][0], "url", None, None),
            (info["hc"], info["c_urls"][1], "url", None, None),
        }
        # cross-host spam entry must be gone
        assert not any("evil.test" in u for (_, u, _, _, _) in got)
        assert got == expect


class TestBootstrapFromSitemaps:
    def test_engine_matches_oracle(self, spark, rows, corpus,
                                   tmp_path_factory):
        pages, _ = corpus
        policy = CrawlPolicy(default_tokens=6, n_buckets=4, max_depth=16)
        entries = harvest_sitemap_tables(pages)
        seed_df = sitemap_seed_frontier(entries, policy)

        state_dir = str(tmp_path_factory.mktemp("sitemap_state"))
        eng = FrontierEngine(spark, pages, state_dir, policy)
        eng.bootstrap_from_df(seed_df)
        stats = eng.run(max_rounds=64)

        # oracle twin: same seeds as a (url, score) list — order is
        # irrelevant (scheduling is (depth, -score, url)-determined)
        seed_rows = (entries.filter(F.col("kind") == "url")
                     .select("url", F.coalesce("priority", F.lit(0.5))
                             .alias("score"))
                     .orderBy("url").collect())
        # sitemap rows exist in the pages table too: the oracle must
        # see the identical fetch universe
        pages_dict = {r["url"]: bytes(r["html"]) for r in
                      pages.select("url", "html").collect()}
        oracle = crawl_oracle(pages_dict,
                              [(r["url"], r["score"]) for r in seed_rows],
                              policy, max_rounds=64)

        st = CrawlState(spark, state_dir)
        sched = st.read_all_rounds("schedule", len(stats) + 1,
                                   SCHEDULE_SCHEMA) \
            .orderBy("round", "seq").collect()
        got: dict[int, list] = {}
        for x in sched:
            got.setdefault(x["round"], []).append(
                (x["url"], x["host"], x["depth"], x["score"]))
        non_empty = {r: w for r, w in got.items() if w}
        assert len(non_empty) == len(oracle.schedules)
        for r, wave in enumerate(oracle.schedules):
            assert non_empty[r] == wave, f"round {r}"
        seen = {r["url"] for r in st.read_all_rounds(
            "seen", len(stats) + 1, SEEN_SCHEMA).collect()}
        assert seen == oracle.seen

    def test_robots_filter_applies_to_sitemap_seeds(
            self, spark, rows, corpus, tmp_path_factory):
        """A disallow rule for a sitemap host must drop its advertised
        URLs at bootstrap, exactly like the oracle's seed filter."""
        pages, info = corpus
        blocked_prefix = "/" + info["a_urls"][0].split("/", 3)[3]
        policy = CrawlPolicy(
            default_tokens=6, n_buckets=4, max_depth=16,
            robots_disallow={info["ha"]: [blocked_prefix]})
        entries = harvest_sitemap_tables(pages)
        seed_df = sitemap_seed_frontier(entries, policy)
        state_dir = str(tmp_path_factory.mktemp("sitemap_robots"))
        eng = FrontierEngine(spark, pages, state_dir, policy)
        eng.bootstrap_from_df(seed_df)
        stats = eng.run(max_rounds=64)
        seed_rows = (entries.filter(F.col("kind") == "url")
                     .select("url", F.coalesce("priority", F.lit(0.5))
                             .alias("score"))
                     .orderBy("url").collect())
        pages_dict = {r["url"]: bytes(r["html"]) for r in
                      pages.select("url", "html").collect()}
        oracle = crawl_oracle(pages_dict,
                              [(r["url"], r["score"]) for r in seed_rows],
                              policy, max_rounds=64)
        assert info["a_urls"][0] not in oracle.seen  # rule really bites
        st = CrawlState(spark, state_dir)
        seen = {r["url"] for r in st.read_all_rounds(
            "seen", len(stats) + 1, SEEN_SCHEMA).collect()}
        assert seen == oracle.seen


class TestRecursiveSitemapScheduling:
    """A sitemapindex chain discovered MID-CRAWL is followed across
    rounds: sitemap URLs are ordinary frontier rows (budgeted, robots-
    checked, deduped) whose fetch parses as a sitemap instead of HTML
    (crawl_extract_outlinks — shared kernel, so engine==oracle stays
    structural)."""

    @staticmethod
    def _chain_pages():
        import datetime
        ts = datetime.datetime(2026, 1, 1)
        host = "chain.test"
        docs = [f"http://{host}/doc/{i}" for i in range(4)]
        # 2-deep index chain: root index -> gzipped child index -> urlset
        root = (f"<sitemapindex><sitemap><loc>http://{host}"
                "/sitemap-l1.xml.gz</loc></sitemap></sitemapindex>")
        l1 = gzip.compress(
            (f"<sitemapindex><sitemap><loc>http://{host}"
             "/sitemap-l2.xml</loc></sitemap></sitemapindex>").encode())
        l2 = ("<urlset>"
              + "".join(f"<url><loc>{u}</loc><priority>0.{9 - i}"
                        f"</priority></url>"
                        for i, u in enumerate(docs[:3]))
              + "</urlset>")
        html = {u: (f"<html><body><a href='{docs[(i + 1) % 4]}'>n</a>"
                    f"<p>doc {i}</p></body></html>")
                for i, u in enumerate(docs)}
        rows = [(f"http://{host}/sitemap.xml", ts, root.encode(),
                 "", "en"),
                (f"http://{host}/sitemap-l1.xml.gz", ts, l1, "", "en"),
                (f"http://{host}/sitemap-l2.xml", ts, l2.encode(),
                 "", "en")]
        rows += [(u, ts, html[u].encode(), "", "en") for u in docs]
        return rows, host, docs

    def test_chain_followed_engine_matches_oracle(self, spark,
                                                  tmp_path_factory):
        rows, host, docs = self._chain_pages()
        pages = spark.createDataFrame(rows, PAGES_SCHEMA).cache()
        pages.count()
        policy = CrawlPolicy(default_tokens=2, n_buckets=4, max_depth=16)
        seeds = [(f"http://{host}/sitemap.xml", 1.0)]

        state_dir = str(tmp_path_factory.mktemp("sitemap_chain"))
        eng = FrontierEngine(spark, pages, state_dir, policy)
        eng.bootstrap(seeds)
        stats = eng.run(max_rounds=16)

        pages_dict = {r["url"]: bytes(r["html"]) for r in
                      pages.select("url", "html").collect()}
        oracle = crawl_oracle(pages_dict, seeds, policy, max_rounds=16)

        # the chain really recursed: each level scheduled one round
        # after its parent, then the advertised docs
        flat = [u for wave in oracle.schedules for (u, _, _, _) in wave]
        assert f"http://{host}/sitemap.xml" in flat
        assert f"http://{host}/sitemap-l1.xml.gz" in flat
        assert f"http://{host}/sitemap-l2.xml" in flat
        assert set(docs) <= oracle.seen
        assert flat.index(f"http://{host}/sitemap-l1.xml.gz") \
            < flat.index(f"http://{host}/sitemap-l2.xml") \
            < flat.index(docs[0])

        st = CrawlState(spark, state_dir)
        sched = st.read_all_rounds("schedule", len(stats) + 1,
                                   SCHEDULE_SCHEMA) \
            .orderBy("round", "seq").collect()
        got: dict[int, list] = {}
        for x in sched:
            got.setdefault(x["round"], []).append(
                (x["url"], x["host"], x["depth"], x["score"]))
        non_empty = {r: w for r, w in got.items() if w}
        assert len(non_empty) == len(oracle.schedules)
        for r, wave in enumerate(oracle.schedules):
            assert non_empty[r] == wave, f"round {r}"
        seen = {r["url"] for r in st.read_all_rounds(
            "seen", len(stats) + 1, SEEN_SCHEMA).collect()}
        assert seen == oracle.seen

    def test_priority_beats_decay(self):
        """Advertised priority overrides the decayed parent score in
        the shared kernel output."""
        from nipper_spark.crawl.sitemaps import crawl_extract_outlinks
        body = (b"<urlset><url><loc>http://h.test/a</loc>"
                b"<priority>0.3</priority></url>"
                b"<url><loc>http://h.test/b</loc></url></urlset>")
        out = crawl_extract_outlinks("http://h.test/sitemap.xml", body)
        assert out == [("http://h.test/a", 0.3), ("http://h.test/b", None)]
        # non-sitemap URL takes the HTML path: priority always None
        html = b"<a href='http://h.test/x'>x</a>"
        assert crawl_extract_outlinks("http://h.test/page", html) == [
            ("http://h.test/x", None)]


class TestSitemapRefresh:
    def test_stale_detection_matches_twin(self, spark, corpus):
        """Spark refresh seeds == the single-threaded twin, and the
        staleness predicate fires both ways on the fixture corpus."""
        from nipper_spark.crawl.sitemaps import (
            harvest_sitemap_entries_py, sitemap_refresh_frontier,
            sitemap_refresh_py)
        pages, _ = corpus
        entries = harvest_sitemap_tables(pages).cache()
        policy = CrawlPolicy(default_tokens=4, n_buckets=4)
        ent_rows = [(r["host"], r["url"], r["kind"], r["lastmod"],
                     r["priority"]) for r in entries.collect()]
        urls = [u for (_h, u, k, _lm, _p) in ent_rows if k == "url"]
        # dated entries split: first dated URL fetched before its
        # lastmod (stale), the rest after (fresh); undated are fresh
        dated_all = sorted(u for (_h, u, k, lm, _p) in ent_rows
                           if k == "url" and lm is not None)
        assert dated_all, "fixture must carry lastmod entries"
        fetch_log = {u: "2030-01-01" for u in urls}
        fetch_log[dated_all[0]] = "2020-01-01"
        log_df = spark.createDataFrame(
            sorted(fetch_log.items()), "url string, fetched_at string")
        got = {(r["url"], r["score"]) for r in
               sitemap_refresh_frontier(entries, log_df,
                                        policy).collect()}
        expect = set(sitemap_refresh_py(ent_rows, fetch_log))
        assert got == expect
        # the fixture has dated entries: some stale rows must exist,
        # and fresh ones must be excluded
        dated = [u for (_h, u, k, lm, _p) in ent_rows
                 if k == "url" and lm is not None]
        stale_dated = [u for u in dated if fetch_log[u] == "2020-01-01"]
        assert stale_dated and {u for u, _ in got} == set(stale_dated)
        # output is frontier-shaped (bootstrap_from_df-compatible)
        cols = sitemap_refresh_frontier(entries, log_df, policy).columns
        assert cols == ["url", "host", "host_bucket", "depth", "score",
                        "discovered_round"]
        entries.unpersist()


def test_refresh_staleness_compares_instants_not_strings():
    """Mixed granularity and timezone offsets: lastmod
    2026-05-04T23:00:00+09:00 == 14:00Z is NOT newer than a 20:00Z
    fetch; date-only fetched_at compares as midnight UTC."""
    from nipper_spark.crawl.sitemaps import sitemap_refresh_py
    entries = [
        ("h.test", "http://h.test/a", "url", "2026-05-04T23:00:00+09:00",
         None),                                     # = 14:00Z
        ("h.test", "http://h.test/b", "url", "2026-05-04T00:00:00Z",
         None),                                     # == date-only fetch
        ("h.test", "http://h.test/c", "url", "2026-05-04T12:00:00Z",
         None),                                     # stale vs midnight
    ]
    log = {"http://h.test/a": "2026-05-04T20:00:00Z",
           "http://h.test/b": "2026-05-04",
           "http://h.test/c": "2026-05-04"}
    got = {u for u, _ in sitemap_refresh_py(entries, log)}
    assert got == {"http://h.test/c"}


class TestParseEdges:
    def test_bom_prefixed_ns_and_cdata(self):
        from nipper_spark.crawl.sitemaps import parse_sitemap
        # UTF-8 BOM before <?xml and before a plaintext line
        assert parse_sitemap(
            b"\xef\xbb\xbf<?xml version='1.0'?><urlset><url>"
            b"<loc>http://h.test/a</loc></url></urlset>") == \
            [("url", "http://h.test/a", None, None)]
        assert parse_sitemap("﻿http://h.test/f\n".encode()) == \
            [("url", "http://h.test/f", None, None)]
        # prefixed namespaces: local names matched
        assert parse_sitemap(
            b'<sm:urlset xmlns:sm="http://www.sitemaps.org/schemas/'
            b'sitemap/0.9"><sm:url><sm:loc>http://h.test/c</sm:loc>'
            b"</sm:url></sm:urlset>") == \
            [("url", "http://h.test/c", None, None)]
        # CDATA loc content is LITERAL (no entity decoding inside)
        assert parse_sitemap(
            b"<urlset><url><loc><![CDATA[http://h.test/d?a=1&b=2"
            b"]]></loc></url></urlset>") == \
            [("url", "http://h.test/d?a=1&b=2", None, None)]
        # ...while non-CDATA locs still entity-decode
        assert parse_sitemap(
            b"<urlset><url><loc>http://h.test/e?a=1&amp;b=2</loc>"
            b"</url></urlset>") == \
            [("url", "http://h.test/e?a=1&b=2", None, None)]
