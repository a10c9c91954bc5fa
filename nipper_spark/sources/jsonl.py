"""JSONL pages source — the other common crawl-dump interchange format
(one JSON object per line: url / timestamp / base64 html / lang).

Scale shape: ``spark.read.schema(...).json`` — Spark's JSON source is
line-splittable, so a 100 TB dump parallelizes at line granularity
(unlike WARC's file granularity); the explicit schema skips the
whole-dataset inference pass a naked ``read.json`` would run. Base64
html decodes JVM-side (`F.unbase64`, codegen) — no Python in the
decode path.

The writer exists for tests and fixture emission.
"""

from __future__ import annotations

import base64
import json

from pyspark.sql import DataFrame, SparkSession
from pyspark.sql import functions as F

# wire schema of one JSONL line (html is base64 text in transit)
_JSONL_SCHEMA = ("url string, warc_ts timestamp, html_b64 string, "
                 "text string, lang string")


def write_jsonl(path: str, rows: list[tuple]) -> None:
    """rows in PAGES_SCHEMA order: (url, warc_ts, html_bytes, text,
    lang) → one JSONL file."""
    with open(path, "w", encoding="utf-8") as f:
        for (url, ts, html, text, lang) in rows:
            f.write(json.dumps({
                "url": url,
                "warc_ts": ts.isoformat(sep=" ") if ts else None,
                "html_b64": base64.b64encode(bytes(html)).decode("ascii"),
                "text": text,
                "lang": lang,
            }, ensure_ascii=False) + "\n")


def read_jsonl_pages(spark: SparkSession, path: str) -> DataFrame:
    """JSONL dump → the engine's pages schema (url, warc_ts, html
    binary, text, lang)."""
    raw = spark.read.schema(_JSONL_SCHEMA).json(path)
    return raw.select(
        "url", "warc_ts",
        F.unbase64("html_b64").alias("html"),
        "text", "lang")
