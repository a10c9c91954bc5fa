"""PII scrubbing for training-data curation: emails, IPv4 addresses,
phone-like number runs → typed placeholders.

Pure Catalyst ``regexp_replace``/``regexp_extract_all`` chains — the
scrub runs JVM-side inside whole-stage codegen, no Python in the hot
path. The patterns are deliberately restricted to the regex subset
where Java regex (Spark) and RE2 (DuckDB) agree byte-for-byte (no
backrefs, no lookaround, greedy quantifiers over explicit classes), so
the DuckDB oracle can assert the scrubbed text hash exactly.

Scrub order is part of the contract: emails first, then IPv4, then
phone runs — placeholders contain no digits, so an earlier category's
replacement can never be re-matched by a later pattern. Counts are
measured on the ORIGINAL text per category (documented: a digit run
inside an email counts toward phones but is scrubbed as the email).
"""

from __future__ import annotations

from pyspark.sql import Column, DataFrame
from pyspark.sql import functions as F

PII_EMAIL = r"[A-Za-z0-9._%+-]+@[A-Za-z0-9.-]+\.[A-Za-z]{2,}"
PII_IPV4 = r"\b(?:[0-9]{1,3}\.){3}[0-9]{1,3}\b"
PII_PHONE = r"\+?[0-9][0-9() .-]{7,}[0-9]"

_CATEGORIES = (("email", PII_EMAIL, "<EMAIL>"),
               ("ip", PII_IPV4, "<IP>"),
               ("phone", PII_PHONE, "<PHONE>"))


def scrub_pii_col(text: str | Column) -> Column:
    """text → scrubbed text (fixed category order, see module doc)."""
    c = F.col(text) if isinstance(text, str) else text
    for _name, pattern, placeholder in _CATEGORIES:
        c = F.regexp_replace(c, pattern, placeholder)
    return c


def pii_count_cols(text: str | Column) -> list[Column]:
    """Per-category match counts on the original text."""
    c = F.col(text) if isinstance(text, str) else text
    # regexp_count: same non-overlapping match count as
    # size(regexp_extract_all(.., 0)) without materializing the matches
    return [F.regexp_count(c, F.lit(pattern)).alias(f"n_{name}s")
            for name, pattern, _ph in _CATEGORIES]


def scrub_pii(docs: DataFrame, text_col: str = "text",
              out_col: str = "text_clean") -> DataFrame:
    """docs → docs + ``out_col`` (scrubbed) + n_emails/n_ips/n_phones.

    100-TB shape: a pure narrow projection — no shuffle, no Python,
    vectorized by whole-stage codegen over the scan."""
    return docs.withColumn(out_col, scrub_pii_col(text_col)) \
        .select("*", *pii_count_cols(text_col))


def scrub_pii_py(text: str) -> tuple[str, int, int, int]:
    """Single-threaded twin (oracle/debug): identical semantics via
    Python ``re`` (the patterns sit in the Java∩RE2∩re subset)."""
    import re
    counts = [len(re.findall(p, text)) for _n, p, _ph in _CATEGORIES]
    out = text
    for _n, p, ph in _CATEGORIES:
        out = re.sub(p, ph, out)
    return (out, *counts)
