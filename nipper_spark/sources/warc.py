"""Minimal WARC reader/writer — Common Crawl's native page format.

Reader path designed for scale: ``spark.read.format("binaryFile")``
lists the .warc files (splittable at the file level, the same unit
Common Crawl distributes: ~1 GB gzipped segments), and record parsing
happens executor-side in one ``mapInPandas`` pass straight into the
engine's pages schema. No driver-side I/O.

Implements the subset of ISO 28500 the pages pipeline needs:
``response`` records with HTTP headers + HTML payloads, plus
``warcinfo`` passthrough. The writers exist for tests and for
emitting fixture corpora; ``write_warc`` emits uncompressed WARC/1.0,
``write_warc_gz`` the Common Crawl layout (one gzip member per
record, concatenated — readers can then split/seek per record).
The reader transparently handles both: Python's ``gzip.decompress``
consumes all concatenated members of a ``.warc.gz`` in one call.
"""

from __future__ import annotations

import datetime
import gzip
import io
from typing import Iterator

from pyspark.sql import DataFrame, SparkSession

from nipper_spark.sources.synthetic import PAGES_SCHEMA

_CRLF = b"\r\n"


def _record_bytes(url: str, ts: datetime.datetime, html: bytes) -> bytes:
    """One WARC/1.0 ``response`` record, headers through trailing CRLFs."""
    http = (b"HTTP/1.1 200 OK\r\n"
            b"Content-Type: text/html; charset=UTF-8\r\n"
            b"Content-Length: " + str(len(html)).encode() +
            b"\r\n\r\n" + html)
    headers = [
        b"WARC/1.0",
        b"WARC-Type: response",
        b"WARC-Target-URI: " + url.encode("utf-8"),
        b"WARC-Date: " + ts.strftime("%Y-%m-%dT%H:%M:%SZ").encode(),
        b"Content-Type: application/http; msgtype=response",
        b"Content-Length: " + str(len(http)).encode(),
    ]
    return (_CRLF.join(headers) + _CRLF + _CRLF + http + _CRLF + _CRLF)


def write_warc(path: str, records: list[tuple[str, datetime.datetime,
                                              bytes]]) -> None:
    """records: (url, timestamp, html_bytes) → one WARC/1.0 file."""
    with open(path, "wb") as f:
        for url, ts, html in records:
            f.write(_record_bytes(url, ts, html))


def write_warc_gz(path: str, records: list[tuple[str, datetime.datetime,
                                                 bytes]]) -> None:
    """Common Crawl layout: one gzip member PER RECORD, concatenated.
    (``mtime=0`` keeps the bytes deterministic for golden oracles.)"""
    with open(path, "wb") as f:
        for url, ts, html in records:
            f.write(gzip.compress(_record_bytes(url, ts, html), mtime=0))


def parse_warc_bytes(data: bytes) -> list[tuple[str, datetime.datetime,
                                                bytes]]:
    """Parse response records out of one WARC buffer — uncompressed or
    Common-Crawl-style concatenated gzip members (auto-detected by the
    gzip magic). Pure function: executors and tests share it."""
    if data[:2] == b"\x1f\x8b":
        data = gzip.decompress(data)  # consumes ALL concatenated members
    out = []
    stream = io.BytesIO(data)
    while True:
        # find the next record header block
        line = stream.readline()
        if not line:
            break
        if not line.startswith(b"WARC/"):
            continue
        headers: dict[bytes, bytes] = {}
        while True:
            h = stream.readline()
            if h in (_CRLF, b"\n", b""):
                break
            if b":" in h:
                k, v = h.split(b":", 1)
                headers[k.strip().lower()] = v.strip()
        length = int(headers.get(b"content-length", b"0"))
        body = stream.read(length)
        if headers.get(b"warc-type") != b"response":
            continue
        url = headers.get(b"warc-target-uri", b"").decode("utf-8")
        date = headers.get(b"warc-date", b"1970-01-01T00:00:00Z").decode()
        try:
            ts = datetime.datetime.strptime(date, "%Y-%m-%dT%H:%M:%SZ")
        except ValueError:
            ts = datetime.datetime(1970, 1, 1)
        # split the HTTP response envelope off the payload
        sep = body.find(b"\r\n\r\n")
        html = body[sep + 4:] if sep != -1 else body
        out.append((url, ts, html))
    return out


def read_warc_pages(spark: SparkSession, path: str) -> DataFrame:
    """WARC directory/glob → pages(url, warc_ts, html, text, lang).

    binaryFile handles listing/distribution; parsing is executor-side.
    ``text`` is null (the engine recomputes it); ``lang`` is null until
    the lang-ID pass assigns it.
    """
    import pandas as pd

    files = spark.read.format("binaryFile") \
        .option("pathGlobFilter", "*.warc*").load(path) \
        .select("content")

    def _parse(batches: Iterator[pd.DataFrame]) -> Iterator[pd.DataFrame]:
        for pdf in batches:
            urls, tss, htmls = [], [], []
            for blob in pdf["content"]:
                for url, ts, html in parse_warc_bytes(bytes(blob)):
                    urls.append(url)
                    tss.append(ts)
                    htmls.append(html)
            yield pd.DataFrame({
                "url": urls, "warc_ts": tss, "html": htmls,
                "text": pd.Series([None] * len(urls), dtype="object"),
                "lang": pd.Series([None] * len(urls), dtype="object")})

    return files.mapInPandas(_parse, schema=PAGES_SCHEMA)
