"""Flat arena DOM tree — struct-of-arrays, integer node handles.

The reference stores a parsed document as a flat vector of nodes with
integer links (``src/dom_tree.rs:94-97,566-574``: ``InnerNode`` with
``parent/prev_sibling/next_sibling/first_child/last_child``).  That
arena layout is already the relational/columnar encoding we want for
Arrow, so the engine keeps it: a document is parallel Python lists
(one slot per node), node id = index, ``-1`` = no link, root id = 0.

Mutations tombstone in place (detached nodes stay in the arena so ids
remain stable — the reference relies on this for
``replace_with_selection``, ``src/dom_tree.rs:430-462``).
"""

from __future__ import annotations

DOCUMENT = 0
DOCTYPE = 1
TEXT = 2
COMMENT = 3
ELEMENT = 4
PI = 5

NIL = -1


class Arena:
    """One parsed HTML document as parallel arrays.

    ``kind[i]``   node kind discriminant (union-as-struct: Spark has no
                  native union type; cf. ``NodeData`` enum,
                  ``src/dom_tree.rs:955-984``)
    ``name[i]``   element local name (lowercased) / doctype name / PI target
    ``attrs[i]``  ordered ``[name, value]`` pairs — order-preserving list,
                  not a dict, because serialization re-emits attributes in
                  insertion order (``src/dom_tree.rs:1051-1054``)
    ``text[i]``   text/comment contents; for doctype ``public\\x00system``;
                  for PI its contents
    ``parent/prev/next/first/last[i]``  integer links, ``-1`` = none
    """

    __slots__ = ("kind", "name", "attrs", "text",
                 "parent", "prev", "next", "first", "last",
                 "template_contents", "ns", "quirks_mode", "errors")

    def __init__(self) -> None:
        # document quirks mode: "no-quirks" | "limited-quirks" |
        # "quirks" — the tri-state the reference exposes publicly as
        # Document.quirks_mode (src/document.rs:26-27, markup5ever
        # QuirksMode), default NoQuirks (src/document.rs:35)
        self.quirks_mode: str = "no-quirks"
        # parse-error messages (the reference exposes Document.errors,
        # src/document.rs:23-24, filled by the sink's parse_error,
        # :79-81). Message STRINGS are engine-specific on both sides
        # (the reference's come from html5ever internals), so only
        # presence/position is meaningful across engines.
        self.errors: list[str] = []
        # sparse namespace map: node id → "svg" | "math" for foreign
        # elements; absence = HTML namespace (the overwhelming case)
        self.ns: dict[int, str] = {}
        # template element id → detached contents-fragment node id
        # (cf. template_contents, src/dom_tree.rs:992-995: contents live
        # in a separate Document node that is NOT a child of the
        # template, so select/text/serialize of the main tree never see
        # them — the reference serializer, src/dom_tree.rs:1033-1087,
        # walks real children only)
        self.template_contents: dict[int, int] = {}
        self.kind: list[int] = []
        self.name: list[str | None] = []
        self.attrs: list[list[list[str]] | None] = []
        self.text: list[str | None] = []
        self.parent: list[int] = []
        self.prev: list[int] = []
        self.next: list[int] = []
        self.first: list[int] = []
        self.last: list[int] = []
        # root document node, always id 0 (src/dom_tree.rs:117-119)
        self.new_node(DOCUMENT)

    # ------------------------------------------------------------------
    # allocation
    # ------------------------------------------------------------------
    def new_node(self, kind: int, name: str | None = None,
                 attrs: list[list[str]] | None = None,
                 text: str | None = None) -> int:
        nid = len(self.kind)
        self.kind.append(kind)
        self.name.append(name)
        self.attrs.append(attrs)
        self.text.append(text)
        self.parent.append(NIL)
        self.prev.append(NIL)
        self.next.append(NIL)
        self.first.append(NIL)
        self.last.append(NIL)
        return nid

    def new_element(self, name: str, attrs: list[list[str]] | None = None) -> int:
        # inlined new_node: elements + text nodes are ~95% of all
        # allocations on the extraction hot path
        nid = len(self.kind)
        self.kind.append(ELEMENT)
        self.name.append(name)
        self.attrs.append(attrs if attrs is not None else [])
        self.text.append(None)
        self.parent.append(NIL)
        self.prev.append(NIL)
        self.next.append(NIL)
        self.first.append(NIL)
        self.last.append(NIL)
        return nid

    def new_text(self, contents: str) -> int:
        nid = len(self.kind)
        self.kind.append(TEXT)
        self.name.append(None)
        self.attrs.append(None)
        self.text.append(contents)
        self.parent.append(NIL)
        self.prev.append(NIL)
        self.next.append(NIL)
        self.first.append(NIL)
        self.last.append(NIL)
        return nid

    # ------------------------------------------------------------------
    # link surgery (doubly-linked child list; cf. src/dom_tree.rs:212-262)
    # ------------------------------------------------------------------
    def append_child(self, parent: int, child: int) -> None:
        last = self.last[parent]
        self.parent[child] = parent
        self.prev[child] = last
        self.next[child] = NIL
        if last != NIL:
            self.next[last] = child
        else:
            self.first[parent] = child
        self.last[parent] = child

    def insert_before(self, ref: int, node: int) -> None:
        """Insert ``node`` as the previous sibling of ``ref``
        (cf. append_prev_sibling_of, src/dom_tree.rs:464-492)."""
        parent = self.parent[ref]
        prev = self.prev[ref]
        self.parent[node] = parent
        self.prev[node] = prev
        self.next[node] = ref
        self.prev[ref] = node
        if prev != NIL:
            self.next[prev] = node
        elif parent != NIL:
            self.first[parent] = node

    def remove_from_parent(self, nid: int) -> None:
        """Detach a subtree; node tombstones in the arena
        (cf. src/dom_tree.rs:430-462)."""
        parent, prev, nxt = self.parent[nid], self.prev[nid], self.next[nid]
        if parent != NIL:
            if self.first[parent] == nid:
                self.first[parent] = nxt
            if self.last[parent] == nid:
                self.last[parent] = prev
        if prev != NIL:
            self.next[prev] = nxt
        if nxt != NIL:
            self.prev[nxt] = prev
        self.parent[nid] = NIL
        self.prev[nid] = NIL
        self.next[nid] = NIL

    def reparent_children(self, src: int, dst: int | None) -> None:
        """Move all children of ``src`` to ``dst`` (None = detach them;
        cf. reparent_children_of, src/dom_tree.rs:494-515)."""
        child = self.first[src]
        self.first[src] = NIL
        self.last[src] = NIL
        while child != NIL:
            nxt = self.next[child]
            self.prev[child] = NIL
            self.next[child] = NIL
            self.parent[child] = NIL
            if dst is not None:
                self.append_child(dst, child)
            child = nxt

    def remove_children(self, nid: int) -> None:
        self.reparent_children(nid, None)

    # ------------------------------------------------------------------
    # traversal helpers
    # ------------------------------------------------------------------
    def children_of(self, nid: int) -> list[int]:
        out = []
        c = self.first[nid]
        while c != NIL:
            out.append(c)
            c = self.next[c]
        return out

    def element_children_of(self, nid: int) -> list[int]:
        kind = self.kind
        return [c for c in self.children_of(nid) if kind[c] == ELEMENT]

    def next_element_sibling(self, nid: int) -> int:
        """Skip non-element siblings (src/dom_tree.rs:709-725)."""
        c = self.next[nid]
        while c != NIL and self.kind[c] != ELEMENT:
            c = self.next[c]
        return c

    def prev_element_sibling(self, nid: int) -> int:
        c = self.prev[nid]
        while c != NIL and self.kind[c] != ELEMENT:
            c = self.prev[c]
        return c

    def descendants(self, root: int, include_self: bool) -> list[int]:
        """Pre-order document-order walk (front-pop worklist semantics of
        Matches::next, src/matcher.rs:83-123, without the laziness)."""
        out: list[int] = []
        if include_self:
            stack = [root]
        else:
            stack = []
            c = self.last[root]
            while c != NIL:
                stack.append(c)
                c = self.prev[c]
        while stack:
            nid = stack.pop()
            out.append(nid)
            c = self.last[nid]
            while c != NIL:
                stack.append(c)
                c = self.prev[c]
        return out

    # ------------------------------------------------------------------
    # text extraction — THE byte-identity invariant
    # ------------------------------------------------------------------
    def text_of(self, nid: int) -> str:
        """Pre-order DFS concatenation of descendant Text contents.

        Byte-identical to ``Node::text`` (src/dom_tree.rs:928-951): only
        Element nodes recurse — so text() of the Document *root* node is
        always "" (quirk preserved), while text() of a Text node is its
        own contents.
        """
        kind, first, nxt, text = self.kind, self.first, self.next, self.text
        parts: list[str] = []
        stack = [nid]
        while stack:
            i = stack.pop()
            k = kind[i]
            if k == ELEMENT:
                c = self.last[i]
                while c != NIL:
                    stack.append(c)
                    c = self.prev[c]
            elif k == TEXT:
                parts.append(text[i])  # type: ignore[arg-type]
        return "".join(parts)

    def text_and_anchor_hrefs(self, nid: int, with_rel: bool = False,
                              with_base: bool = False):
        """One pre-order walk collecting BOTH the text (identical bytes
        to :meth:`text_of`) and the href of every descendant <a[href]>
        in document order — the fused fast path of the page extractor
        (avoids a second full DFS through the selector engine).

        ``with_rel=True`` additionally returns each anchor's ``rel``
        attribute value ("" when absent) as a third list, for
        nofollow-aware crawling. ``with_base=True`` appends the FIRST
        <base href> value in document order (None when absent) —
        identical to ``select("base[href]").attr("href")``, fused here
        so the extractor needs no selector pass."""
        kind, text, name, attrs = self.kind, self.text, self.name, self.attrs
        parts: list[str] = []
        hrefs: list[str] = []
        rels: list[str] = []
        base: str | None = None
        stack = [nid]
        while stack:
            i = stack.pop()
            k = kind[i]
            if k == ELEMENT:
                nm = name[i]
                if nm == "a":
                    href = rel = None
                    for a in attrs[i]:  # type: ignore[union-attr]
                        if a[0] == "href" and href is None:
                            href = a[1]
                        elif a[0] == "rel" and rel is None:
                            rel = a[1]
                    if href is not None:
                        hrefs.append(href)
                        if with_rel:
                            rels.append(rel or "")
                elif nm == "base" and base is None:
                    for a in attrs[i]:  # type: ignore[union-attr]
                        if a[0] == "href":
                            base = a[1]
                            break
                c = self.last[i]
                while c != NIL:
                    stack.append(c)
                    c = self.prev[c]
            elif k == TEXT:
                parts.append(text[i])  # type: ignore[arg-type]
        out = ["".join(parts), hrefs]
        if with_rel:
            out.append(rels)
        if with_base:
            out.append(base)
        return tuple(out)

    # ------------------------------------------------------------------
    # attribute helpers (linear scan like Node::attr, src/dom_tree.rs:846-855)
    # ------------------------------------------------------------------
    def get_attr(self, nid: int, name: str) -> str | None:
        if self.kind[nid] != ELEMENT:
            return None
        for a in self.attrs[nid]:  # type: ignore[union-attr]
            if a[0] == name:
                return a[1]
        return None

    def set_attr(self, nid: int, name: str, value: str) -> None:
        """Update-or-append (src/dom_tree.rs:864-885)."""
        if self.kind[nid] != ELEMENT:
            return
        for a in self.attrs[nid]:  # type: ignore[union-attr]
            if a[0] == name:
                a[1] = value
                return
        self.attrs[nid].append([name, value])  # type: ignore[union-attr]

    def remove_attr(self, nid: int, name: str) -> None:
        if self.kind[nid] != ELEMENT:
            return
        self.attrs[nid] = [a for a in self.attrs[nid] if a[0] != name]  # type: ignore[union-attr]

    def add_attrs_if_missing(self, nid: int, new_attrs: list[list[str]]) -> None:
        """Append attrs not already present, preserving order
        (src/document.rs:255-272)."""
        if self.kind[nid] != ELEMENT:
            return
        existing = {a[0] for a in self.attrs[nid]}  # type: ignore[union-attr]
        for a in new_attrs:
            if a[0] not in existing:
                self.attrs[nid].append(a)  # type: ignore[union-attr]
                existing.add(a[0])

    def has_class_token(self, nid: int, token: str) -> bool:
        """Exact whitespace-split class-token membership
        (contains_class!, src/dom_tree.rs:746-752)."""
        val = self.get_attr(nid, "class")
        if val is None:
            return False
        token = token.strip()
        return f" {token} " in f" {val} "

    # ------------------------------------------------------------------
    # arena merge: copy another arena's top-level content into self
    # (cf. append_children_from_another_tree, src/dom_tree.rs:264-340 —
    #  our copy rebases ids by offset like the fix_id! macro :365-369)
    # ------------------------------------------------------------------
    def copy_subtrees_from(self, donor: "Arena", roots: list[int]) -> list[int]:
        """Deep-copy the given donor subtrees into this arena (detached).

        Returns the new ids of the copied roots, in order.
        """
        new_roots: list[int] = []
        for r in roots:
            mapping: dict[int, int] = {}
            order = donor.descendants(r, include_self=True)
            for old in order:
                attrs = donor.attrs[old]
                nid = self.new_node(
                    donor.kind[old], donor.name[old],
                    [list(a) for a in attrs] if attrs is not None else None,
                    donor.text[old])
                dns = donor.ns.get(old)
                if dns is not None:
                    self.ns[nid] = dns
                mapping[old] = nid
            for old in order:
                if old == r:
                    continue
                self.append_child(mapping[donor.parent[old]], mapping[old])
            new_roots.append(mapping[r])
        return new_roots
