"""HTML byte-stream encoding sniffing (the WHATWG "encoding sniffing
algorithm" subset a crawler needs): BOM detection, then a bounded
prescan of the first 1024 bytes for ``<meta charset=…>`` /
``<meta http-equiv=content-type content="…charset=…">``, then UTF-8
with replacement as the fallback.

Real crawl payloads are NOT all UTF-8 — cp1252 and friends dominate
the non-UTF-8 tail — and decoding them as UTF-8/replace turns every
high byte into U+FFFD, corrupting extracted text and dedup hashes.
Pure function, shared by the extraction UDF and the oracle.
"""

from __future__ import annotations

import codecs
import re

# label → python codec, per the WHATWG encoding registry's common rows
# (x-user-defined and the exotic legacy families fall back to cp1252,
# the registry's own "windows-1252 is the default ASCII-compatible
# fallback" behavior)
_LABELS = {
    "utf-8": "utf-8", "utf8": "utf-8", "unicode-1-1-utf-8": "utf-8",
    "utf-16": "utf-16", "utf-16le": "utf-16-le", "utf-16be": "utf-16-be",
    "latin1": "cp1252", "latin-1": "cp1252", "iso-8859-1": "cp1252",
    "iso8859-1": "cp1252", "windows-1252": "cp1252", "cp1252": "cp1252",
    "ascii": "cp1252", "us-ascii": "cp1252", "ansi_x3.4-1968": "cp1252",
    "iso-8859-2": "iso8859-2", "windows-1250": "cp1250",
    "iso-8859-15": "iso8859-15",
    "windows-1251": "cp1251", "koi8-r": "koi8-r",
    "windows-1254": "cp1254", "iso-8859-9": "cp1254",
    "shift_jis": "shift_jis", "shift-jis": "shift_jis",
    "sjis": "shift_jis",
    "euc-jp": "euc_jp", "gbk": "gbk", "gb2312": "gbk",
    "gb18030": "gb18030", "big5": "big5", "euc-kr": "euc_kr",
    # spec "get an encoding" meta step: x-user-defined → windows-1252
    "x-user-defined": "cp1252",
}

_META_CHARSET_RE = re.compile(
    rb"""<meta[^>]+charset\s*=\s*["']?\s*([a-zA-Z0-9._:-]+)""",
    re.IGNORECASE)

# the WHATWG prescan SKIPS comments: a commented-out
# <!--<meta charset=shift_jis>--> must not override the real meta.
# An unterminated <!-- swallows the rest of the window (the spec jumps
# past the comment or aborts at EOF without a meta match).
_COMMENT_RE = re.compile(rb"<!--.*?(?:-->|\Z)", re.DOTALL)


def _prescan_window(payload: bytes) -> bytes:
    return _COMMENT_RE.sub(b"", payload[:1024])


def sniff_encoding(payload: bytes) -> str:
    """Return the python codec name for an HTML byte payload."""
    if payload.startswith(codecs.BOM_UTF8):
        return "utf-8-sig"
    if payload.startswith(codecs.BOM_UTF16_LE):
        return "utf-16"          # utf-16 codec consumes the BOM
    if payload.startswith(codecs.BOM_UTF16_BE):
        return "utf-16"
    m = _META_CHARSET_RE.search(_prescan_window(payload))
    if m:
        label = m.group(1).decode("ascii", "replace").strip().lower()
        codec = _LABELS.get(label)
        if codec is not None:
            # a meta claiming utf-16 on a byte stream we can prescan is
            # lying (spec: treat as utf-8)
            if codec.startswith("utf-16"):
                return "utf-8"
            return codec
    return "utf-8"


def decode_html(payload: bytes) -> str:
    """Sniff + decode with replacement — never raises."""
    return bytes(payload).decode(sniff_encoding(bytes(payload)),
                                 errors="replace")
