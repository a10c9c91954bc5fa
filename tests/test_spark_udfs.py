"""Spark-side extraction tests: the UDF layer over the pages table.

Covers the flagship hacker-news query (FIXTURES.md §4: 30 story rows,
byte-exact title/href), selector-count golden values evaluated
DataFrame-side, and fused text+outlink extraction with
canonicalization on the synthetic graph.
"""

import pytest
from pyspark.sql import functions as F

from nipper_spark.functions.html_udfs import (
    extract_pages, extract_records, hacker_news_stories,
    select_attr_udf, select_count_udf, select_text_udf)
from nipper_spark.functions.url import (
    canonicalize_url, host_of, resolve_and_canonicalize)
from nipper_spark.sources.synthetic import pages_df


@pytest.fixture(scope="module")
def spark():
    from nipper_spark.session import build_session
    s = build_session("nipper-tests", master="local[4]",
                      shuffle_partitions=4)
    yield s


@pytest.fixture(scope="module")
def pages(spark):
    return pages_df(spark, include_fixtures=True, n_pages=50).cache()


class TestCanonicalize:
    def test_whatwg_normalizations(self):
        """Round-4 rules: dot-segment removal (RFC 3986 §5.2.4),
        backslash = path separator before the query (WHATWG special
        URLs), percent-decoded + IDNA hosts."""
        assert canonicalize_url("http://h.test/a/./b/../c") == \
            "http://h.test/a/c"
        assert canonicalize_url("http://h.test/a/b/..") == \
            "http://h.test/a/"
        assert canonicalize_url("http://h.test/..") == "http://h.test/"
        # exact segments only: .well-known is untouched (and fast-path)
        assert canonicalize_url("http://h.test/.well-known/x") == \
            "http://h.test/.well-known/x"
        assert canonicalize_url("http:\\\\h.test\\a\\b") == \
            "http://h.test/a/b"
        # backslash after '?' stays literal (percent-encoded in query)
        assert canonicalize_url("http://h.test/a?x=a\\b") == \
            "http://h.test/a?x=a%5Cb"
        assert canonicalize_url("http://h%2Etest/x") == \
            "http://h.test/x"
        assert canonicalize_url("http://bücher.test/x") == \
            "http://xn--bcher-kva.test/x"
        # absolute href and relative href to the same resource now
        # canonicalize identically (the URL-seen dedup property)
        from nipper_spark.functions.url import resolve_and_canonicalize
        a = resolve_and_canonicalize("http://h.test/d/", "../c")
        b = resolve_and_canonicalize("http://h.test/d/",
                                     "http://h.test/d/../c")
        assert a == b == "http://h.test/c"

    def test_vectors(self):
        # FIXTURES.md §5 canonicalization vectors
        assert canonicalize_url("HTTP://Host.Test/a?b=2&a=1#f") == \
            "http://host.test/a?a=1&b=2"
        assert canonicalize_url("https://x.test:443/p") == "https://x.test/p"
        assert canonicalize_url("http://x.test:8080/p") == \
            "http://x.test:8080/p"
        assert canonicalize_url("http://x.test") == "http://x.test/"
        assert canonicalize_url("ftp://x.test/") is None
        assert canonicalize_url("javascript:void(0)") is None
        assert canonicalize_url("http://x.test/%41b") == "http://x.test/Ab"

    def test_resolve(self):
        assert resolve_and_canonicalize(
            "http://h.test/dir/page", "../other?z=1&a=2") == \
            "http://h.test/other?a=2&z=1"
        assert resolve_and_canonicalize("http://h.test/", "#frag") is None
        assert resolve_and_canonicalize("http://h.test/", "mailto:x") is None

    def test_host(self):
        assert host_of("http://HostA.test:8080/x") == "hosta.test"


class TestSelectorUdfs:
    def test_golden_counts(self, spark, pages):
        """Reference golden counts, evaluated through the Spark UDFs."""
        fx = pages.filter(F.col("url").startswith("http://fixture.test/"))
        out = {r["url"]: r for r in fx.select(
            "url",
            select_count_udf("div.row-fluid")("html").alias("rowfluid"),
            select_count_udf("li")("html").alias("li"),
            select_count_udf("span")("html").alias("span"),
            select_count_udf("tr.athing")("html").alias("athing"),
        ).collect()}
        assert out["http://fixture.test/page"]["rowfluid"] == 9
        assert out["http://fixture.test/rustwiki"]["li"] == 420
        assert out["http://fixture.test/rustwiki"]["span"] == 706
        assert out["http://fixture.test/hn"]["athing"] == 30

    def test_text_and_attr(self, spark, pages):
        fx = pages.filter(F.col("url") == "http://fixture.test/page")
        row = fx.select(
            select_text_udf("h1")("html").alias("t"),
            select_attr_udf("a", "href")("html").alias("href"),
            select_attr_udf("div.row-fluid", "href")("html").alias("nohref"),
        ).collect()[0]
        assert row["t"].strip() == "Provok.in"
        assert row["href"] is not None
        assert row["nohref"] is None


class TestFlagship:
    def test_hacker_news_30_rows(self, spark, pages):
        hn = pages.filter(F.col("url") == "http://fixture.test/hn")
        stories = hacker_news_stories(hn).orderBy("seq").collect()
        assert len(stories) == 30
        assert stories[0]["href"] == \
            "https://www.engadget.com/2020/03/03/undead-gadgets/"
        assert stories[0]["title"].startswith("Gadgets That Refuse to Die")
        assert all(s["href"] for s in stories)

    def test_extract_records_order_deterministic(self, spark, pages):
        hn = pages.filter(F.col("url") == "http://fixture.test/hn")
        a = hacker_news_stories(hn).orderBy("seq").collect()
        b = hacker_news_stories(hn.repartition(4)).orderBy("seq").collect()
        assert [r["href"] for r in a] == [r["href"] for r in b]


class TestExtractPages:
    def test_outlinks_canonical(self, spark, pages):
        synth = pages.filter(~F.col("url").startswith("http://fixture"))
        ext = extract_pages(synth).cache()
        rows = ext.collect()
        assert len(rows) == 50
        for r in rows:
            for link in r["outlinks"]:
                # canonical fixed point: canonicalize(link) == link
                assert canonicalize_url(link) == link
                assert "#" not in link
        # every synthetic page has text and at least one link
        assert all(r["text"] for r in rows)
        assert all(r["n_anchors"] >= 1 for r in rows)

    def test_text_matches_kernel_bytes(self, spark, pages):
        """Byte-identity: Spark-extracted text == single-threaded kernel
        text for the same page (the north-star invariant)."""
        from nipper_spark.html import Document
        from nipper_spark.sources.synthetic import fixture_pages_rows
        ext = {r["url"]: r["text"]
               for r in extract_pages(pages).collect()}
        for url, _, html, _, _ in fixture_pages_rows():
            doc = Document.from_html(html)
            assert ext[url] == doc.body_text(), url


class TestEncodingSniff:
    """Binary html columns: BOM / meta-charset prescan / fallback —
    extraction must not mangle non-UTF-8 crawl payloads."""

    def test_x_user_defined_maps_to_cp1252(self):
        """Spec "get an encoding": meta charset=x-user-defined →
        windows-1252 (the font-hack label crawls really contain)."""
        from nipper_spark.html.encoding import sniff_encoding
        assert sniff_encoding(
            b'<meta charset="x-user-defined"><p>caf\xe9</p>') == "cp1252"

    def test_meta_utf16_label_means_utf8(self):
        """A prescannable byte stream whose meta claims utf-16 is
        lying — the spec says decode as UTF-8."""
        from nipper_spark.html.encoding import sniff_encoding
        assert sniff_encoding(
            b'<meta charset="utf-16"><p>x</p>') == "utf-8"
        assert sniff_encoding(
            b'<meta charset="UTF-16LE"><p>x</p>') == "utf-8"

    def test_meta_charset_cp1252(self):
        from nipper_spark.functions.html_udfs import extract_text_and_links
        html = ('<html><head><meta charset="windows-1252"></head>'
                '<body><p>caf\xe9 \u201cquoted\u201d</p></body></html>'
                ).encode("cp1252")
        text, _, _, _ = extract_text_and_links("http://e.test/", html)
        assert "café" in text and "“quoted”" in text

    def test_http_equiv_latin1(self):
        from nipper_spark.functions.html_udfs import extract_text_and_links
        html = ('<html><head><meta http-equiv="Content-Type" '
                'content="text/html; charset=iso-8859-1"></head>'
                "<body>na\xefve</body></html>").encode("latin-1")
        text, _, _, _ = extract_text_and_links("http://e.test/", html)
        assert "naïve" in text

    def test_utf8_bom(self):
        from nipper_spark.functions.html_udfs import extract_text_and_links
        html = "﻿<body>ok漢</body>".encode("utf-8")
        text, _, _, _ = extract_text_and_links("http://e.test/", html)
        assert text == "ok漢"          # BOM consumed, not in text

    def test_utf16_bom(self):
        from nipper_spark.functions.html_udfs import extract_text_and_links
        html = "<body>wide 漢</body>".encode("utf-16")  # LE + BOM
        text, _, _, _ = extract_text_and_links("http://e.test/", html)
        assert text == "wide 漢"

    def test_plain_utf8_unchanged(self):
        from nipper_spark.functions.html_udfs import extract_text_and_links
        html = "<body>plain utf8 漢</body>".encode("utf-8")
        text, _, _, _ = extract_text_and_links("http://e.test/", html)
        assert text == "plain utf8 漢"

    def test_garbage_never_raises(self):
        from nipper_spark.html.encoding import decode_html
        decode_html(b"\xff\xfe\x00garbage\x80\x81<meta charset=nonsense>")
        decode_html(b"")

    def test_commented_meta_skipped(self):
        """WHATWG prescan skips comments: a commented-out meta must not
        override the real one (a mis-sniff corrupts extracted text and
        every dedup hash downstream)."""
        from nipper_spark.html.encoding import sniff_encoding
        body = (b"<!--<meta charset=shift_jis>-->"
                b'<meta charset="windows-1252">')
        assert sniff_encoding(body) == "cp1252"
        # comment-only window: fall back, don't honor the commented meta
        assert sniff_encoding(b"<!--<meta charset=shift_jis>-->") == "utf-8"
        # unterminated comment swallows the rest of the window
        assert sniff_encoding(b"<!--<meta charset=shift_jis>") == "utf-8"
        # real meta BEFORE a comment still wins
        assert sniff_encoding(
            b'<meta charset="koi8-r"><!--<meta charset=big5>-->') == "koi8-r"


def test_forbidden_host_codepoints_after_percent_decode():
    """A percent-decoded host containing URL structure characters is a
    parse FAILURE (WHATWG forbidden host code points) — otherwise
    http://victim.test%2F.evil.test/ would re-attribute evil's URL to
    victim for robots/politeness/seen-dedup."""
    from nipper_spark.functions.url import canonicalize_url
    assert canonicalize_url("http://victim.test%2F.evil.test/steal") is None
    assert canonicalize_url("http://evil.test%23.victim.test/x") is None
    assert canonicalize_url("http://h%3A80.test/x") is None
    assert canonicalize_url("http://h%40u.test/x") is None
    # benign percent-decoding still works
    assert canonicalize_url("http://h%2etest/x") == "http://h.test/x"


def test_base_href_resolution():
    """Relative outlinks resolve against the document base (first
    <base href>, itself resolved against the page URL, WHATWG) —
    falling back to the page URL when absent or non-http(s)."""
    from nipper_spark.functions.html_udfs import extract_text_and_links
    html = ('<html><head><base href="http://cdn.test/assets/"></head>'
            '<body><a href="x.html">x</a><a href="/root.html">r</a>'
            '<a href="http://abs.test/a">a</a></body></html>')
    _, links, _, _ = extract_text_and_links("http://page.test/dir/p", html)
    assert links == ["http://cdn.test/assets/x.html",
                     "http://cdn.test/root.html", "http://abs.test/a"]
    _, l2, _, _ = extract_text_and_links(
        "http://h.test/d/p", '<base href="sub/"><a href="y">y</a>')
    assert l2 == ["http://h.test/d/sub/y"]
    _, l3, _, _ = extract_text_and_links(
        "http://h.test/p", '<base href="javascript:x"><a href="y">y</a>')
    assert l3 == ["http://h.test/y"]
