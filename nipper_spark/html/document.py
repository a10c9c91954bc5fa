"""Document / Selection facade — the reference's public API, in Python.

This is the kernel that runs *inside* Arrow-batched pandas UDFs (one
Document per row of the ``pages`` table); it deliberately mirrors the
reference's API shape so parity is auditable:

- ``Document.from_html``      ⇔ ``Document::from``   (src/document.rs:40-56)
- ``Document.select/nip``     ⇔ src/traversal.rs:15-31 (raises on bad selector)
- ``Document.try_select``     ⇔ src/traversal.rs:35-49 (None on invalid OR empty)
- ``Selection.select`` chain  ⇔ descendants-only, self excluded
                                (src/traversal.rs:69-126, MatchScope::ChildrenOnly)
- properties                  ⇔ src/property.rs (attr = first node; text = all)
- traversal                   ⇔ src/traversal.rs:140-242
- query                       ⇔ src/query.rs (is / is_selection semi-join)
- mutation                    ⇔ src/manipulation.rs + src/dom_tree.rs:777-893
"""

from __future__ import annotations

from nipper_spark.html.arena import Arena, DOCUMENT, ELEMENT, NIL, TEXT
from nipper_spark.html.selector import Matcher, SelectorError, select
from nipper_spark.html.serializer import serialize
from nipper_spark.html.treebuilder import parse_document, parse_fragment

_MATCHER_CACHE: dict[str, Matcher] = {}


def _matcher(sel: str) -> Matcher:
    """Compile-once selector cache — the batch analog of reusing a
    ``Matcher`` across documents (src/traversal.rs:53-58)."""
    m = _MATCHER_CACHE.get(sel)
    if m is None:
        if len(_MATCHER_CACHE) > 4096:
            _MATCHER_CACHE.clear()
        m = Matcher(sel)
        _MATCHER_CACHE[sel] = m
    return m


class Document:
    __slots__ = ("arena",)

    def __init__(self, arena: Arena) -> None:
        self.arena = arena

    @classmethod
    def from_html(cls, html: str | bytes) -> "Document":
        if isinstance(html, (bytes, bytearray)):
            html = html.decode("utf-8", errors="replace")
        return cls(parse_document(html))

    @classmethod
    def fragment(cls, html: str | bytes) -> "Document":
        if isinstance(html, (bytes, bytearray)):
            html = html.decode("utf-8", errors="replace")
        return cls(parse_fragment(html))

    # -- queries -------------------------------------------------------
    def select(self, sel: str) -> "Selection":
        """Match all nodes from the document root (IncludeNode scope).
        Raises SelectorError on an invalid selector (reference panics,
        src/traversal.rs:15-21)."""
        m = _matcher(sel)
        return Selection(self, select(self.arena, [0], m, include_roots=True))

    def nip(self, sel: str) -> "Selection":
        return self.select(sel)

    def select_matcher(self, m: Matcher) -> "Selection":
        return Selection(self, select(self.arena, [0], m, include_roots=True))

    def try_select(self, sel: str) -> "Selection | None":
        """None on invalid selector OR zero matches. Faithful quirk:
        uses ChildrenOnly scope where ``select`` uses IncludeNode
        (src/traversal.rs:35-49 vs :15-21) — observable only for
        ``:root``, which can match the Document node itself."""
        try:
            m = _matcher(sel)
        except SelectorError:
            return None
        s = Selection(self, select(self.arena, [0], m,
                                   include_roots=False))
        return s if s.length > 0 else None

    # -- properties ----------------------------------------------------
    @property
    def errors(self) -> list:
        """Parse-error messages collected during tree construction —
        the reference's public ``Document.errors``
        (src/document.rs:23-24, filled via the sink's ``parse_error``,
        :79-81). Message strings are engine-specific on BOTH sides
        (html5ever's come from its internals), so cross-engine
        comparison is presence/count, not bytes. Clean documents
        parse with ``errors == []``."""
        return self.arena.errors

    @property
    def quirks_mode(self) -> str:
        """The document's quirks mode — "no-quirks" | "limited-quirks"
        | "quirks", mirroring the reference's public tri-state field
        (src/document.rs:26-27,100-102; markup5ever QuirksMode).
        Fragments always parse no-quirks (src/manipulation.rs:25)."""
        return self.arena.quirks_mode

    def html(self) -> str:
        return serialize(self.arena, 0, include_node=True)

    def text(self) -> str:
        """Quirk preserved: the walker recurses only through Element
        nodes, so text() at the Document root is always ""
        (src/dom_tree.rs:928-951 with the root being NodeData::Document).
        Use ``.select("html").text()`` / ``body_text()`` for content."""
        return self.arena.text_of(0)

    def body_text(self) -> str:
        """Engine extension: text of the root element — what the crawl
        extractor calls 'the extracted text of the page'."""
        for c in self.arena.children_of(0):
            if self.arena.kind[c] == ELEMENT:
                return self.arena.text_of(c)
        return ""


class Selection:
    """Ordered, deduplicated matched-node list (src/selection.rs:7-9)."""

    __slots__ = ("doc", "ids")

    def __init__(self, doc: Document, ids: list[int]) -> None:
        self.doc = doc
        self.ids = ids

    # -- chained selection (descendants only, self excluded) ------------
    def select(self, sel: str) -> "Selection":
        m = _matcher(sel)
        return Selection(self.doc, select(self.doc.arena, self.ids, m,
                                          include_roots=False))

    def nip(self, sel: str) -> "Selection":
        return self.select(sel)

    def try_select(self, sel: str) -> "Selection | None":
        try:
            s = self.select(sel)
        except SelectorError:
            return None
        return s if s.length > 0 else None

    def select_matcher(self, m: Matcher) -> "Selection":
        return Selection(self.doc, select(self.doc.arena, self.ids, m,
                                          include_roots=False))

    # -- size ------------------------------------------------------------
    @property
    def length(self) -> int:
        return len(self.ids)

    def size(self) -> int:
        return len(self.ids)

    def exists(self) -> bool:
        return len(self.ids) > 0

    # -- reduction (src/traversal.rs:220-242) ----------------------------
    def first(self) -> "Selection":
        return Selection(self.doc, self.ids[:1])

    def last(self) -> "Selection":
        return Selection(self.doc, self.ids[-1:])

    def get(self, i: int) -> int | None:
        return self.ids[i] if 0 <= i < len(self.ids) else None

    def iter(self) -> "Selections":
        return Selections(self.doc, self.ids)

    # -- traversal (all dedupe, first-occurrence order;
    #    src/traversal.rs:140-215) ---------------------------------------
    def _dedup(self, ids) -> "Selection":
        seen: set[int] = set()
        out = []
        for i in ids:
            if i != NIL and i not in seen:
                seen.add(i)
                out.append(i)
        return Selection(self.doc, out)

    def parent(self) -> "Selection":
        a = self.doc.arena
        return self._dedup(a.parent[i] for i in self.ids)

    def children(self) -> "Selection":
        a = self.doc.arena
        out: list[int] = []
        for i in self.ids:
            out.extend(a.element_children_of(i))
        return self._dedup(out)

    def next_sibling(self) -> "Selection":
        a = self.doc.arena
        return self._dedup(a.next_element_sibling(i) for i in self.ids)

    def prev_sibling(self) -> "Selection":
        a = self.doc.arena
        return self._dedup(a.prev_element_sibling(i) for i in self.ids)

    def next(self) -> "Selection":
        """Deprecated alias kept for API parity
        (src/traversal.rs:174-179)."""
        return self.next_sibling()

    # -- query (src/query.rs) --------------------------------------------
    def is_(self, sel: str) -> bool:
        """True if ≥1 matched node satisfies the selector; False on
        invalid selector or empty selection (src/query.rs:8-16)."""
        if not self.ids:
            return False
        try:
            m = _matcher(sel)
        except SelectorError:
            return False
        a = self.doc.arena
        return any(m.match_node(a, i) for i in self.ids)

    def is_matcher(self, m: Matcher) -> bool:
        a = self.doc.arena
        return any(m.match_node(a, i) for i in self.ids)

    def is_selection(self, other: "Selection") -> bool:
        """Semi-join on node ids (src/query.rs:35-52)."""
        mine = set(self.ids)
        return any(i in mine for i in other.ids)

    # -- properties (src/property.rs) -------------------------------------
    def attr(self, name: str) -> str | None:
        if not self.ids:
            return None
        return self.doc.arena.get_attr(self.ids[0], name)

    def attr_or(self, name: str, default: str) -> str:
        v = self.attr(name)
        return v if v is not None else default

    def attrs(self) -> list[tuple[str, str]]:
        """All attributes of the first matched node, insertion order
        (Node::attrs, src/dom_tree.rs:857-862)."""
        if not self.ids:
            return []
        a = self.doc.arena.attrs[self.ids[0]]
        return [tuple(x) for x in (a or [])]

    def node_name(self) -> str | None:
        """Element local name of the first matched node; None for
        non-elements (Node::node_name, src/dom_tree.rs:755-763)."""
        if not self.ids:
            return None
        if self.doc.arena.kind[self.ids[0]] != ELEMENT:
            return None
        return self.doc.arena.name[self.ids[0]]

    # -- node-kind predicates (Node::is_document/is_element/is_text,
    #    src/dom_tree.rs:895-908) — first matched node, like attr() ----
    def is_document(self) -> bool:
        return bool(self.ids) and \
            self.doc.arena.kind[self.ids[0]] == DOCUMENT

    def is_element(self) -> bool:
        return bool(self.ids) and \
            self.doc.arena.kind[self.ids[0]] == ELEMENT

    def is_text(self) -> bool:
        return bool(self.ids) and self.doc.arena.kind[self.ids[0]] == TEXT

    def text(self) -> str:
        a = self.doc.arena
        return "".join(a.text_of(i) for i in self.ids)

    def html(self) -> str:
        if not self.ids:
            return ""
        return serialize(self.doc.arena, self.ids[0], include_node=True)

    def has_class(self, cls: str) -> bool:
        a = self.doc.arena
        return any(a.has_class_token(i, cls) for i in self.ids)

    # -- attribute/class mutation -----------------------------------------
    def set_attr(self, name: str, val: str) -> "Selection":
        for i in self.ids:
            self.doc.arena.set_attr(i, name, val)
        return self

    def remove_attr(self, name: str) -> "Selection":
        for i in self.ids:
            self.doc.arena.remove_attr(i, name)
        return self

    def add_class(self, cls: str) -> "Selection":
        """Space-split, dedup, append missing tokens; no-op on blank
        (src/dom_tree.rs:777-812). Deviation: token order is input order
        (the reference iterates a HashSet — nondeterministic)."""
        if cls.strip() == "":
            return self
        tokens: list[str] = []
        for t in cls.split(" "):
            t = t.strip()
            if t and t not in tokens:
                tokens.append(t)
        a = self.doc.arena
        for i in self.ids:
            if a.kind[i] != ELEMENT:
                continue
            cur = a.get_attr(i, "class")
            if cur is None:
                a.set_attr(i, "class", " ".join(tokens))
                continue
            val = cur
            for t in tokens:
                if f" {t} " not in f" {val} ":
                    val = val + " " + t if val else t
            a.set_attr(i, "class", val)
        return self

    def remove_class(self, cls: str) -> "Selection":
        """Token-exact removal (keeps 'odder' when removing 'odd',
        src/dom_tree.rs:814-844). Deviation: surviving-token order is
        the original order (reference rebuilds from a HashSet)."""
        if cls.strip() == "":
            return self
        removes = {t.strip() for t in cls.split(" ") if t.strip()}
        a = self.doc.arena
        for i in self.ids:
            if a.kind[i] != ELEMENT:
                continue
            cur = a.get_attr(i, "class")
            if cur is None:
                continue
            kept = [t for t in cur.split(" ") if t.strip() and
                    t.strip() not in removes]
            a.set_attr(i, "class", " ".join(t.strip() for t in kept))
        return self

    # -- structural mutation (src/manipulation.rs) --------------------------
    def remove(self) -> "Selection":
        for i in self.ids:
            self.doc.arena.remove_from_parent(i)
        return self

    def _fragment_roots(self, html: str):
        """Fragment-parse; content hangs under the fragment's html root
        (src/manipulation.rs:13-33, src/dom_tree.rs:278-287)."""
        frag = parse_fragment(html)
        html_root = None
        for c in frag.children_of(0):
            if frag.kind[c] == ELEMENT:
                html_root = c
                break
        if html_root is None:
            return frag, []
        return frag, frag.children_of(html_root)

    def set_html(self, html: str) -> "Selection":
        """Remove all children of each matched node, then append the
        parsed fragment (src/manipulation.rs:44-53)."""
        for i in self.ids:
            self.doc.arena.remove_children(i)
        return self.append_html(html)

    def append_html(self, html: str) -> "Selection":
        frag, roots = self._fragment_roots(html)
        a = self.doc.arena
        for i in self.ids:
            copies = a.copy_subtrees_from(frag, roots)
            for c in copies:
                a.append_child(i, c)
        return self

    def replace_with_html(self, html: str) -> "Selection":
        """Splice fragment children as previous siblings of each matched
        node, then remove the matched nodes (src/manipulation.rs:60-78)."""
        frag, roots = self._fragment_roots(html)
        a = self.doc.arena
        for i in self.ids:
            copies = a.copy_subtrees_from(frag, roots)
            for c in copies:
                a.insert_before(i, c)
        return self.remove()

    def replace_with_selection(self, sel: "Selection") -> "Selection":
        """Move the other selection's nodes before each target, then
        remove targets (src/manipulation.rs:84-92) — nodes move, so with
        multiple targets the last target wins, like the reference."""
        a = self.doc.arena
        for i in self.ids:
            for other in sel.ids:
                a.remove_from_parent(other)
                a.insert_before(i, other)
        return self.remove()

    def append_selection(self, sel: "Selection") -> "Selection":
        a = self.doc.arena
        for i in self.ids:
            for child in sel.ids:
                a.remove_from_parent(child)
                a.append_child(i, child)
        return self


class Selections:
    """Iterator view over a Selection's nodes, one single-node
    Selection at a time — reversible and sized, matching the
    reference's DoubleEndedIterator + ExactSizeIterator impls for
    ``Selections`` (src/traversal.rs:246-268)."""

    __slots__ = ("doc", "ids")

    def __init__(self, doc: Document, ids) -> None:
        self.doc = doc
        self.ids = list(ids)

    def __iter__(self):
        for nid in self.ids:
            yield Selection(self.doc, [nid])

    def __reversed__(self):
        for nid in reversed(self.ids):
            yield Selection(self.doc, [nid])

    def __len__(self) -> int:
        return len(self.ids)
