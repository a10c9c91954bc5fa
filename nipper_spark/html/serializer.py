"""HTML serialization, byte-compatible with the reference's serializer.

Mirrors ``impl Serialize for SerializableNodeRef`` (src/dom_tree.rs:
1032-1088) + html5ever's ``HtmlSerializer`` rules, golden-tested by
tests/html-dom.rs:47-168:

- pre-order walk with an explicit Open/Close op stack;
- attributes emitted in stored insertion order as ``name="value"``;
- text escaping: ``& -> &amp;``, ``\\xa0 -> &nbsp;``, ``< -> &lt;``,
  ``> -> &gt;``; attribute escaping: ``& -> &amp;``, ``\\xa0 -> &nbsp;``,
  ``" -> &quot;``;
- children of script/style/xmp/iframe/noembed/noframes/plaintext
  emitted raw (tests/html-dom.rs:89-108);
- void elements take no end tag;
- doctype -> ``<!DOCTYPE name>``; comment -> ``<!--data-->``;
  PI -> ``<?target data>``; a Document node serializes children only.
"""

from __future__ import annotations

from nipper_spark.html.arena import (
    Arena, COMMENT, DOCTYPE, DOCUMENT, ELEMENT, NIL, PI, TEXT)

VOID_ELEMENTS = frozenset(
    ["area", "base", "basefont", "bgsound", "br", "col", "embed", "frame",
     "hr", "img", "input", "keygen", "link", "meta", "param", "source",
     "track", "wbr"])

RAW_CHILDREN = frozenset(
    ["style", "script", "xmp", "iframe", "noembed", "noframes",
     "plaintext",
     # html5ever emits noscript children raw iff scripting_enabled —
     # and the reference always serializes with scripting on
     # (src/dom_tree.rs:916-919), matching our tokenizer's rawtext
     # treatment of noscript
     "noscript"])


def _escape_text(s: str) -> str:
    if ("&" in s) or ("\xa0" in s) or ("<" in s) or (">" in s):
        s = (s.replace("&", "&amp;").replace("\xa0", "&nbsp;")
             .replace("<", "&lt;").replace(">", "&gt;"))
    return s


def _escape_attr(s: str) -> str:
    if ("&" in s) or ("\xa0" in s) or ('"' in s):
        s = (s.replace("&", "&amp;").replace("\xa0", "&nbsp;")
             .replace('"', "&quot;"))
    return s


def serialize(arena: Arena, nid: int, include_node: bool = True) -> str:
    """Serialize a subtree. ``include_node=False`` = ChildrenOnly scope
    (what ``Document::html`` effectively does at the Document node)."""
    out: list[str] = []
    append = out.append
    kind, name, attrs, text = arena.kind, arena.name, arena.attrs, arena.text

    # ops: (0, nid) = open, (1, element_name) = close
    if include_node:
        ops = [(0, nid)]
    else:
        # ChildrenOnly: document order, popped from the end
        ops = [(0, c) for c in reversed(arena.children_of(nid))]

    # raw-text context tracking: we escape based on the *parent* element
    while ops:
        op, ref = ops.pop()
        if op == 1:
            append("</%s>" % ref)
            continue
        k = kind[ref]
        if k == ELEMENT:
            nm = name[ref]
            append("<%s" % nm)
            for a in attrs[ref]:  # type: ignore[union-attr]
                append(' %s="%s"' % (a[0], _escape_attr(a[1])))
            append(">")
            if nm in VOID_ELEMENTS:
                continue
            ops.append((1, nm))
            for c in reversed(arena.children_of(ref)):
                ops.append((0, c))
        elif k == TEXT:
            parent = arena.parent[ref]
            if parent != NIL and kind[parent] == ELEMENT and \
                    name[parent] in RAW_CHILDREN:
                append(text[ref])  # type: ignore[arg-type]
            else:
                append(_escape_text(text[ref]))  # type: ignore[arg-type]
        elif k == COMMENT:
            append("<!--%s-->" % text[ref])
        elif k == DOCTYPE:
            append("<!DOCTYPE %s>" % name[ref])
        elif k == PI:
            append("<?%s %s>" % (name[ref], text[ref]))
        elif k == DOCUMENT:
            for c in reversed(arena.children_of(ref)):
                ops.append((0, c))
    return "".join(out)
