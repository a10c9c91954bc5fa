"""Readability pipeline (the capstone select→mutate→re-select query).

The reference example is compile-only in its CI (no golden output), so
these tests pin: metadata extraction semantics (rs:342-379), article
extraction behavior per page class, determinism, and Spark-UDF ≡
single-threaded equality.
"""

import hashlib

import pytest

from nipper_spark.functions.readability import extract_article


@pytest.fixture(scope="module")
def articles(wisburg_html, rustwiki_html, hacker_news_html, page_html):
    return {
        "wisburg": extract_article(wisburg_html),
        "rustwiki": extract_article(rustwiki_html),
        "hn": extract_article(hacker_news_html),
        "page": extract_article(page_html),
    }


class TestMetadata:
    def test_og_title_preferred(self, articles):
        assert articles["wisburg"]["title"] == \
            "通胀三部曲之一：哄抢卫生纸对通胀的影响大吗？"

    def test_og_image_cover(self, articles):
        assert articles["wisburg"]["cover"].startswith(
            "https://rocks.wisburg.com/")

    def test_title_fallback_to_title_tag(self, articles):
        assert articles["rustwiki"]["title"] == \
            "Rust (programming language) - Wikipedia"

    def test_author_from_meta(self, articles):
        assert articles["page"]["author"] == "Martin Angers"


class TestArticleExtraction:
    def test_article_pages_extract_content(self, articles):
        assert len(articles["wisburg"]["content_text"]) > 1000
        assert len(articles["rustwiki"]["content_text"]) > 10000

    def test_link_list_extracts_nothing(self, articles):
        # hacker news is a link index, not an article: readability
        # correctly finds no content-dense candidate siblings
        assert len(articles["hn"]["content_text"]) == 0

    def test_deterministic(self, wisburg_html):
        a = extract_article(wisburg_html)
        b = extract_article(wisburg_html)
        assert a == b

    def test_no_scripts_or_styles_in_output(self, articles):
        for rec in articles.values():
            assert "<script" not in rec["content_html"]
            assert "<style" not in rec["content_html"]


class TestSparkParity:
    def test_udf_equals_pure(self, wisburg_html, rustwiki_html):
        from nipper_spark.session import build_session
        from nipper_spark.sources.synthetic import PAGES_SCHEMA
        from nipper_spark.functions.readability import readability_articles
        import datetime
        spark = build_session("readability-tests", master="local[4]",
                              shuffle_partitions=4)
        rows = [("http://t/w", datetime.datetime(2024, 1, 1),
                 wisburg_html.encode(), None, "zh-CN"),
                ("http://t/r", datetime.datetime(2024, 1, 1),
                 rustwiki_html.encode(), None, "en")]
        pages = spark.createDataFrame(rows, PAGES_SCHEMA)
        got = {r["url"]: r for r in readability_articles(pages).collect()}
        for url, html in (("http://t/w", wisburg_html),
                          ("http://t/r", rustwiki_html)):
            pure = extract_article(html)
            assert got[url]["title"] == pure["title"]
            assert hashlib.md5(got[url]["content_html"].encode()) \
                .hexdigest() == \
                hashlib.md5(pure["content_html"].encode()).hexdigest()
