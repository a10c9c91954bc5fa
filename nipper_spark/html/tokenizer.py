"""WHATWG HTML5 tokenizer (pure Python, regex-accelerated).

A from-scratch implementation of the tokenizer states the engine needs
to reproduce the reference parser's observable output (the reference
uses html5ever; we re-implement the *spec*, not the crate). Covers:
data, tag open/name/attributes (double/single/unquoted values),
self-closing flag, end tags, comments (incl. bogus comments), DOCTYPE,
RAWTEXT (script/style/xmp/iframe/noembed/noframes/noscript), RCDATA
(title/textarea), PLAINTEXT, and full character-reference decoding
(named incl. semicolon-less legacy entities with the attribute
exception, numeric with the C1 remap table).

Token shapes (plain tuples for speed):
    ("text", data)
    ("start", name, attrs, self_closing)   attrs = list[[name, value]]
    ("end", name)
    ("comment", data)
    ("doctype", name, public_id, system_id, force_quirks)

Script data escaped/double-escaped states are modeled as a small
event-scan state machine over the raw text (`<!--` enters escaped,
`<script>` inside escaped enters double-escaped where `</script>` is
TEXT, `-->` returns to plain script data) — so
``<script><!--<script>"</script>"--></script>`` keeps the inner
end-tag-lookalike as script text, matching html5ever on real pages
that embed HTML in JS strings.
"""

from __future__ import annotations

import re
from html.entities import html5 as _HTML5_ENTITIES

RAWTEXT_TAGS = frozenset(
    ["script", "style", "xmp", "iframe", "noembed", "noframes", "noscript"])
RCDATA_TAGS = frozenset(["title", "textarea"])

def _nul(t: str) -> str:
    """Tokenizer-spec NUL handling for tag/attr names, attribute
    values, and comment data: U+0000 -> U+FFFD (parse error). Only
    the data state (tree stage ignores NULs in body text) and CDATA
    sections keep other behavior."""
    return t.replace("\x00", "\ufffd") if "\x00" in t else t

_TAGNAME_RE = re.compile(r"[a-zA-Z][^\t\n\f />]*")
_ATTRNAME_RE = re.compile(r"[^\t\n\f /=>]+")
_WS_RE = re.compile(r"[\t\n\f ]+")
_UNQUOTED_VAL_RE = re.compile(r"[^\t\n\f >]*")
_NUMREF_RE = re.compile(r"#(?:[xX]([0-9a-fA-F]+)|([0-9]+));?")
_NAMEDREF_RE = re.compile(r"[a-zA-Z][a-zA-Z0-9]*;?")
_AMP_RE = re.compile(r"&")

# WHATWG numeric character reference C1 overrides
_C1_REMAP = {
    0x80: 0x20AC, 0x82: 0x201A, 0x83: 0x0192, 0x84: 0x201E, 0x85: 0x2026,
    0x86: 0x2020, 0x87: 0x2021, 0x88: 0x02C6, 0x89: 0x2030, 0x8A: 0x0160,
    0x8B: 0x2039, 0x8C: 0x0152, 0x8E: 0x017D, 0x91: 0x2018, 0x92: 0x2019,
    0x93: 0x201C, 0x94: 0x201D, 0x95: 0x2022, 0x96: 0x2013, 0x97: 0x2014,
    0x98: 0x02DC, 0x99: 0x2122, 0x9A: 0x0161, 0x9B: 0x203A, 0x9C: 0x0153,
    0x9E: 0x017E, 0x9F: 0x0178,
}

# Longest entity key without a trailing semicolon ("legacy" entities
# decodable mid-text, e.g. "&amp" -> "&").
_MAX_LEGACY_LEN = max(len(k) for k in _HTML5_ENTITIES if not k.endswith(";"))
_MAX_NAMED_LEN = max(len(k) for k in _HTML5_ENTITIES)


def _decode_numeric(cp: int) -> str:
    if cp in _C1_REMAP:
        cp = _C1_REMAP[cp]
    if cp == 0 or cp > 0x10FFFF or 0xD800 <= cp <= 0xDFFF:
        return "�"
    return chr(cp)


def decode_charrefs(text: str, in_attr: bool) -> str:
    """Decode character references per the WHATWG rules.

    ``in_attr`` enables the attribute-value exception: a semicolon-less
    legacy entity followed by ``[a-zA-Z0-9=]`` is left literal.
    Attribute values also take the tokenizer's NUL replacement here
    (every value state: NUL → U+FFFD); body text must NOT — the tree
    stage decides per insertion mode (ignored in body, kept in
    foreign content as U+FFFD via the text-node path).
    """
    if in_attr:
        text = _nul(text)
    if "&" not in text:
        return text
    out: list[str] = []
    pos = 0
    n = len(text)
    while True:
        amp = text.find("&", pos)
        if amp == -1:
            out.append(text[pos:])
            break
        out.append(text[pos:amp])
        i = amp + 1
        m = _NUMREF_RE.match(text, i)
        if m:
            cp = int(m.group(1), 16) if m.group(1) is not None else int(m.group(2))
            out.append(_decode_numeric(cp))
            pos = m.end()
            continue
        m = _NAMEDREF_RE.match(text, i)
        if m:
            cand = m.group(0)
            if cand.endswith(";") and cand in _HTML5_ENTITIES:
                out.append(_HTML5_ENTITIES[cand])
                pos = i + len(cand)
                continue
            # longest legacy (no-semicolon) prefix match
            body = cand[:-1] if cand.endswith(";") else cand
            body = body[:_MAX_LEGACY_LEN]
            hit = None
            for k in range(len(body), 1, -1):
                if body[:k] in _HTML5_ENTITIES:
                    hit = body[:k]
                    break
            if hit is not None:
                nxt = text[i + len(hit): i + len(hit) + 1]
                if in_attr and nxt and (nxt.isalnum() or nxt == "="):
                    pass  # attribute exception: keep literal
                else:
                    out.append(_HTML5_ENTITIES[hit])
                    pos = i + len(hit)
                    continue
        out.append("&")
        pos = i
    return "".join(out)


_RAW_END_RES: dict = {}


def _raw_end_re(tag: str):
    """End-tag pattern for a rawtext/rcdata element — cached (the tag
    set is tiny and style/textarea recur on every real page)."""
    r = _RAW_END_RES.get(tag)
    if r is None:
        r = re.compile(r"</%s(?=[\t\n\f />]|$)" % re.escape(tag),
                       re.IGNORECASE)
        _RAW_END_RES[tag] = r
    return r


class TokenizerFeedback:
    """Tree-builder → tokenizer feedback (the spec's coupling): while
    the parser is in foreign (svg/math) content, start tags like
    <title>/<style>/<script> must NOT switch the tokenizer into
    RAWTEXT/RCDATA — foreign elements' children stay in the data state.
    The builder flips ``foreign`` after processing each token; the
    generator reads it when it resumes (i.e. after the consumer handled
    the start tag that might switch modes)."""

    __slots__ = ("foreign", "cdata_ok")

    def __init__(self) -> None:
        self.foreign = False
        # True while the builder's CURRENT node is in a foreign
        # namespace (updated after every token): gates the CDATA
        # section state, which is legal only in foreign content
        self.cdata_ok = False


def tokenize(html: str, feedback: TokenizerFeedback | None = None,
             initial_raw: str | None = None,
             initial_plaintext: bool = False):
    """Yield tokens for one document. Input newline-normalized here.

    ``initial_raw``/``initial_plaintext`` implement the fragment-
    parsing tokenizer-state rule (WHATWG 13.4 step 2): a fragment
    whose context element is title/textarea starts in RCDATA, style/
    xmp/iframe/noembed/noframes/noscript in RAWTEXT, script in script
    data, plaintext in PLAINTEXT — the context name doubles as the
    "appropriate end tag" that exits the state."""
    s = html.replace("\r\n", "\n").replace("\r", "\n")
    n = len(s)
    pos = 0
    # rawtext mode set after emitting certain start tags
    pending_raw: str | None = initial_raw  # tag name
    pending_rcdata = initial_raw in ("title", "textarea")
    plaintext = initial_plaintext

    while pos < n:
        if plaintext:
            yield ("text", s[pos:].replace("\x00", "�"))
            return
        if pending_raw is not None:
            tag = pending_raw
            if tag == "script":
                m = _script_end(s, pos)
            else:
                m = _raw_end_re(tag).search(s, pos)
            if m is None:
                data = s[pos:]
                end_at = n
            else:
                data = s[pos:m.start()]
                end_at = m.end()
            data = data.replace("\x00", "�")
            if pending_rcdata:
                data = decode_charrefs(data, in_attr=False)
            if data:
                yield ("text", data)
            pending_raw = None
            pending_rcdata = False
            if m is None:
                return
            # consume the rest of the end tag (attrs ignored per spec)
            gt = s.find(">", end_at)
            pos = n if gt == -1 else gt + 1
            if gt == -1:
                return
            yield ("end", tag)
            continue

        lt = s.find("<", pos)
        if lt == -1:
            yield ("text", decode_charrefs(s[pos:], False))
            return
        if lt > pos:
            yield ("text", decode_charrefs(s[pos:lt], False))
        pos = lt
        if lt + 1 >= n:
            yield ("text", "<")
            return
        c = s[lt + 1]

        if c == "!":
            if feedback is not None and feedback.cdata_ok \
                    and s.startswith("[CDATA[", lt + 2):
                # CDATA section state: legal ONLY in foreign content
                # (adjusted current node not in the HTML namespace) —
                # contents are literal text, no charref decoding; in
                # HTML content `<![CDATA[` stays a bogus comment
                end = s.find("]]>", lt + 9)
                if end == -1:
                    if lt + 9 < n:
                        yield ("text", s[lt + 9:])
                    return
                if end > lt + 9:
                    yield ("text", s[lt + 9: end])
                pos = end + 3
                continue
            pos, tok = _markup_declaration(s, lt + 2)
            if tok is not None:
                yield tok
            continue
        if c == "?":
            # bogus comment; data includes the '?'
            gt = s.find(">", lt + 1)
            if gt == -1:
                yield ("comment", _nul(s[lt + 1:]))
                return
            yield ("comment", _nul(s[lt + 1: gt]))
            pos = gt + 1
            continue
        if c == "/":
            if lt + 2 >= n:
                # eof-before-tag-name: "<" and "/" are emitted as TEXT
                # (a bogus comment here was a spec divergence — the
                # bogus-comment state is only entered on a non-alpha
                # CHARACTER, not on EOF)
                yield ("text", "</")
                return
            if s[lt + 2] == ">":
                pos = lt + 3  # `</>` dropped
                continue
            m = _TAGNAME_RE.match(s, lt + 2)
            if m is None:
                # bogus comment until '>'
                gt = s.find(">", lt + 2)
                if gt == -1:
                    yield ("comment", _nul(s[lt + 2:]))
                    return
                yield ("comment", _nul(s[lt + 2: gt]))
                pos = gt + 1
                continue
            name = _nul(m.group(0).lower())
            e = m.end()
            if e < n and s[e] == ">":  # overwhelmingly common: `</tag>`
                pos = e + 1
                yield ("end", name)
                continue
            # skip to '>' honoring quoted attr values in end tags
            pos2, _attrs, _sc, ok = _parse_attrs(s, e)
            if not ok:
                return  # EOF in tag: token dropped
            pos = pos2
            yield ("end", name)
            continue
        if "a" <= c <= "z" or "A" <= c <= "Z":  # spec: ASCII alpha only
            m = _TAGNAME_RE.match(s, lt + 1)
            name = _nul(m.group(0).lower())
            e = m.end()
            if e < n and s[e] == ">":  # bare `<tag>` fast path
                pos = e + 1
                attrs = []
                self_closing = False
            else:
                pos2, attrs, self_closing, ok = _parse_attrs(s, e)
                if not ok:
                    return  # EOF in tag: dropped (fuzz `<a a=\r\n` -> "")
                pos = pos2
            yield ("start", name, attrs, self_closing)
            if feedback is not None and feedback.foreign:
                continue  # foreign content: no rawtext/rcdata switching
            if name in RAWTEXT_TAGS:
                pending_raw = name
                pending_rcdata = False
            elif name in RCDATA_TAGS:
                pending_raw = name
                pending_rcdata = True
            elif name == "plaintext":
                plaintext = True
            continue
        # lone '<'
        yield ("text", "<")
        pos = lt + 1

    return


# script-data event scan: the four markers that change escape state
_SCRIPT_EVENT_RE = re.compile(
    r"<!--|-->|</script(?=[\t\n\f />]|$)|<script(?=[\t\n\f />]|$)",
    re.IGNORECASE)


def _script_end(s: str, pos: int):
    """Find the `</script` that actually closes the element, honoring
    the spec's escaped / double-escaped script-data states:

      plain ──"<!--"──▶ escaped ──"<script"──▶ double-escaped
      escaped/double ──"-->"──▶ plain
      `</script` closes the element in plain and escaped states; in
      double-escaped it is script TEXT and merely drops back to escaped.

    Returns the closing end-tag match or None (unterminated)."""
    state = 0  # 0=plain, 1=escaped, 2=double-escaped
    scan = pos
    while True:
        m = _SCRIPT_EVENT_RE.search(s, scan)
        if m is None:
            return None
        t = m.group(0)
        if t[1] == "/":  # </script
            if state != 2:
                return m
            state = 1
        elif t == "<!--":
            if state == 0:
                state = 1
        elif t == "-->":
            state = 0
        else:  # <script
            if state == 1:
                state = 2
        scan = m.end()


_WS_SLASH_RE = re.compile(r"[\t\n\f ]+")

# one whole attribute per match: name [= "v" | 'v' | v] + trailing ws.
# Groups: 1=name, 2=dquoted, 3=squoted, 4=unquoted
_ATTR_FULL_RE = re.compile(
    r"([^\t\n\f /><=][^\t\n\f /=>]*)"
    r"(?:[\t\n\f ]*=[\t\n\f ]*"
    r"(?:\"([^\"]*)\"|'([^']*)'|([^\t\n\f >]*)))?"
    r"[\t\n\f ]*")


def _parse_attrs(s: str, pos: int):
    """Parse attributes after a tag name. Returns (pos_after_gt, attrs,
    self_closing, ok). ok=False means EOF inside the tag -> drop token."""
    n = len(s)
    attrs: list[list[str]] = []
    seen: set[str] = set()
    self_closing = False
    while True:
        # fast path: the common `>` / ` attr` shapes
        m = _WS_SLASH_RE.match(s, pos)
        if m:
            pos = m.end()
        # stray slashes (and `/>`)
        while pos < n and s[pos] == "/":
            if pos + 1 < n and s[pos + 1] == ">":
                return pos + 2, attrs, True, True
            pos += 1
            m = _WS_SLASH_RE.match(s, pos)
            if m:
                pos = m.end()
        if pos >= n:
            return pos, attrs, self_closing, False
        ch = s[pos]
        if ch == ">":
            return pos + 1, attrs, self_closing, True
        # fast path: whole attribute in one regex match
        m = _ATTR_FULL_RE.match(s, pos)
        if m is not None:
            g2, g3, g4 = m.group(2), m.group(3), m.group(4)
            if g4 and g4[0] in "\"'":
                # unterminated quoted value: spec consumes to EOF
                return n, attrs, self_closing, False
            name = _nul(m.group(1).lower())
            if g2 is not None:
                value = decode_charrefs(g2, True)
            elif g3 is not None:
                value = decode_charrefs(g3, True)
            elif g4:
                value = decode_charrefs(g4, True)
            else:
                value = ""
            if name not in seen:
                seen.add(name)
                attrs.append([name, value])
            pos = m.end()
            continue
        if ch == "=":
            # '=' before attr name: becomes part of the name per spec
            m = _ATTRNAME_RE.match(s, pos + 1)
            name = "=" + (m.group(0) if m else "")
            pos = m.end() if m else pos + 1
        else:
            m = _ATTRNAME_RE.match(s, pos)
            name = m.group(0)
            pos = m.end()
        name = _nul(name.lower())
        # after attribute name
        while pos < n and s[pos] in "\t\n\f ":
            pos += 1
        value = ""
        if pos < n and s[pos] == "=":
            pos += 1
            while pos < n and s[pos] in "\t\n\f ":
                pos += 1
            if pos >= n:
                return pos, attrs, self_closing, False
            q = s[pos]
            if q == '"' or q == "'":
                end = s.find(q, pos + 1)
                if end == -1:
                    return n, attrs, self_closing, False
                value = decode_charrefs(s[pos + 1: end], True)
                pos = end + 1
            else:
                m = _UNQUOTED_VAL_RE.match(s, pos)
                value = decode_charrefs(m.group(0), True)
                pos = m.end()
        if name not in seen:
            seen.add(name)
            attrs.append([name, value])


def _markup_declaration(s: str, pos: int):
    """Handle `<!...`: comment / doctype / bogus comment.
    Returns (new_pos, token_or_None)."""
    n = len(s)
    if s.startswith("--", pos):
        i = pos + 2
        # empty-comment shortcuts: <!--> and <!--->
        if s.startswith(">", i):
            return i + 1, ("comment", "")
        if s.startswith("->", i):
            return i + 2, ("comment", "")
        m = re.compile(r"--!?>").search(s, i)
        if m is None:
            return n, ("comment", _nul(s[i:]))
        return m.end(), ("comment", _nul(s[i:m.start()]))
    if s[pos:pos + 7].lower() == "doctype":
        return _doctype(s, pos + 7)
    # bogus comment (covers <![CDATA[ in HTML content)
    gt = s.find(">", pos)
    if gt == -1:
        return n, ("comment", _nul(s[pos:]))
    return gt + 1, ("comment", _nul(s[pos:gt]))


_QUOTED_RE = re.compile(r'[\t\n\f ]*("([^"]*)"|\'([^\']*)\')')
_UNTERM_RE = re.compile(r'[\t\n\f ]*("([^"]*)|\'([^\']*))\Z')


def _doctype(s: str, pos: int):
    """DOCTYPE parse with the tokenizer spec's FORCE-QUIRKS flag:
    anything after the name that is not a well-formed PUBLIC/SYSTEM
    identifier clause sets force-quirks (bogus-DOCTYPE /
    missing-identifier / abrupt-identifier states) — except junk
    AFTER a terminated system id, which the spec explicitly ignores
    without setting the flag. Token: (kind, name, public, system,
    force_quirks); identifiers are None when ABSENT (distinct from
    present-but-empty, which the HTML 4.01 quirks rules need)."""
    n = len(s)
    gt = s.find(">", pos)
    truncated = gt == -1
    if truncated:
        gt = n
    body = s[pos:gt]
    m = re.match(r"[\t\n\f ]*([^\t\n\f >]*)", body)
    name = _nul(m.group(1).lower())
    rest = body[m.end():]
    public_id = None
    system_id = None
    # eof-in-doctype: the spec sets force-quirks in EVERY DOCTYPE
    # state on EOF — a '>'-less DOCTYPE is always quirks
    force = truncated

    def _quoted(txt):
        """(id, remainder) for a terminated quoted string; (id, None)
        for an unterminated one (abrupt → caller sets force-quirks);
        (None, None) when no quote starts."""
        qm = _QUOTED_RE.match(txt)
        if qm:
            val = qm.group(2) if qm.group(2) is not None else qm.group(3)
            return val, txt[qm.end():]
        um = _UNTERM_RE.match(txt)
        if um:
            val = um.group(2) if um.group(2) is not None else um.group(3)
            return (val or ""), None
        return None, None

    kw = re.match(r"[\t\n\f ]*(PUBLIC|SYSTEM)", rest, re.IGNORECASE)
    if kw:
        which = kw.group(1).upper()
        after = rest[kw.end():]
        first, after2 = _quoted(after)
        if first is None:
            force = True  # missing identifier (or junk in its place)
        elif after2 is None:
            force = True  # abrupt (unterminated) identifier
            if which == "PUBLIC":
                public_id = first
            else:
                system_id = first
        elif which == "SYSTEM":
            system_id = first
            # junk after a terminated system id: ignored, NO flag
        else:
            public_id = first
            second, after3 = _quoted(after2)
            if second is not None:
                system_id = second
                if after3 is None:
                    force = True  # abrupt system identifier
            elif after2.strip("\t\n\f "):
                force = True  # junk between/instead of system id
    elif rest.strip("\t\n\f "):
        force = True  # bogus DOCTYPE: junk after the name
    return (gt + 1 if gt < n else n), ("doctype", name, public_id,
                                       system_id, force)
