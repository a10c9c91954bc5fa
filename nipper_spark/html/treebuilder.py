"""WHATWG HTML tree construction (pure Python) → :class:`Arena`.

From-scratch implementation of the spec's tree-construction stage
(insertion modes, open-element stack, active formatting elements with
reconstruction and the adoption agency algorithm, table modes with
foster parenting, implied start/end tags). The reference gets all of
this from html5ever; our contract is to produce the *same observable
tree* for its fixtures (tests/html-dom.rs, tests/html-tree-sink.rs)
and for real-world pages.

Semantics deliberately preserved from the reference sink:
- adjacent text coalescing on append (src/document.rs:167-183): text
  appended after a text node concatenates instead of creating a sibling
  — affects node counts (``:empty``, ``children()``), not text bytes;
- attributes added only if missing, insertion order kept
  (src/document.rs:255-272);
- root Document node is id 0 (src/dom_tree.rs:117-119).

Foreign content (svg/math) follows the spec's foreign-content rules:
tag-name/attribute case adjustment, HTML breakout tags, integration
points (foreignObject/desc/title, annotation-xml, MathML text IPs),
and tokenizer feedback so foreign children stay in the data state.
``<template>`` children parse into a separate detached contents
fragment (arena.template_contents) under the spec's "in template"
insertion mode with the full per-template insertion-mode STACK
(html5ever semantics: table-structure tags re-route the current
template mode; </template>/EOF pop it).

Frameset documents follow the spec's in_frameset/after_frameset
modes (body replaced when frameset_ok, whitespace-only text, frame
voids, noframes rawtext).
"""

from __future__ import annotations

from nipper_spark.html.arena import (
    Arena, COMMENT, DOCTYPE, DOCUMENT, ELEMENT, NIL, TEXT)
from nipper_spark.html.foreign import (
    BREAKOUT, MATHML_TEXT_IP, SVG_HTML_IP, adjust_foreign_attrs,
    adjust_svg_tag, font_breaks_out)
from nipper_spark.html.tokenizer import (
    RAWTEXT_TAGS, RCDATA_TAGS, TokenizerFeedback, tokenize)

# elements whose content arrives as one raw/rcdata text token; while one
# is open we are in the spec's "text" insertion mode
_TEXT_MODE_TAGS = RAWTEXT_TAGS | RCDATA_TAGS | {"plaintext"}

MARKER = None  # active-formatting-elements scope marker

SPECIAL = frozenset("""
address applet area article aside base basefont bgsound blockquote body br
button caption center col colgroup dd details dir div dl dt embed fieldset
figcaption figure footer form frame frameset h1 h2 h3 h4 h5 h6 head header
hgroup hr html iframe img input keygen li link listing main marquee menu
meta nav noembed noframes noscript object ol p param plaintext pre script
search section select source style summary table tbody td template textarea tfoot
th thead title tr track ul wbr xmp
""".split())

FORMATTING = frozenset(
    ["a", "b", "big", "code", "em", "font", "i", "nobr", "s", "small",
     "strike", "strong", "tt", "u"])

VOID = frozenset(
    ["area", "base", "basefont", "bgsound", "br", "col", "embed", "frame",
     "hr", "img", "input", "keygen", "link", "meta", "param", "source",
     "track", "wbr"])

_DEFAULT_SCOPE = frozenset(
    ["applet", "caption", "html", "table", "td", "th", "marquee", "object",
     "template"])
_LIST_ITEM_SCOPE = _DEFAULT_SCOPE | {"ol", "ul"}
_BUTTON_SCOPE = _DEFAULT_SCOPE | {"button"}
_TABLE_SCOPE = frozenset(["html", "table", "template"])
# table-structure tags that terminate a select opened inside a table
# (the spec's "in select in table" insertion mode)
_SELECT_TABLE_STRUCTURE = frozenset(
    ["caption", "table", "tbody", "tfoot", "thead", "tr", "td", "th"])

_IMPLIED_END = frozenset(
    ["dd", "dt", "li", "optgroup", "option", "p", "rb", "rp", "rt", "rtc"])
# "generate all implied end tags thoroughly" (used by </template>)
_IMPLIED_END_THOROUGH = _IMPLIED_END | frozenset(
    ["caption", "colgroup", "tbody", "td", "tfoot", "th", "thead", "tr"])

_CLOSE_P_TAGS = frozenset("""
address article aside blockquote center details dialog dir div dl fieldset
figcaption figure footer header hgroup main menu nav ol p search section
summary ul
""".split())

_BODY_END_LIST = frozenset("""
address article aside blockquote button center details dialog dir div dl
fieldset figcaption figure footer header hgroup listing main menu nav ol
pre search section summary ul
""".split())

_HEADINGS = frozenset(["h1", "h2", "h3", "h4", "h5", "h6"])

_IN_HEAD_TAGS = frozenset(
    ["base", "basefont", "bgsound", "link", "meta", "noframes", "script",
     "style", "template", "title"])

_TABLE_SECTIONS = frozenset(["tbody", "tfoot", "thead"])
_TABLE_CTX = frozenset(["table", "template", "html"])
_TBODY_CTX = frozenset(["tbody", "tfoot", "thead", "template", "html"])
_TR_CTX = frozenset(["tr", "template", "html"])
_TABLE_FOSTER = frozenset(["table", "tbody", "tfoot", "thead", "tr"])

# every start-tag name _mode_in_body special-cases; anything else takes
# the O(1) generic insert fast path (must stay in sync with the
# branches below — test_selection + the goldens pin the behavior)
_SPECIAL_START_NAMES = (
    frozenset(["html", "body", "frameset", "plaintext", "button", "a",
               "applet", "marquee", "object",
               "table", "input", "hr", "image", "textarea", "xmp",
               "iframe", "noembed", "select", "optgroup", "option",
               "rb", "rp", "rt", "rtc", "math", "svg", "pre", "listing",
               "form", "li", "dd", "dt", "caption", "col", "colgroup",
               "frame", "head", "tbody", "td", "tfoot", "th", "thead",
               "tr", "area", "br", "embed", "img", "keygen", "wbr",
               "param", "source", "track"])
    | _IN_HEAD_TAGS | _CLOSE_P_TAGS | _HEADINGS | FORMATTING)


class TreeBuilder:
    def __init__(self, fragment_context: str | None = None) -> None:
        self.arena = Arena()
        self.stack: list[int] = []
        self.afe: list = []  # entries: [nid, name, attrs_snapshot] or MARKER
        self.mode = "initial"
        self.original_mode = ""
        self.head_id: int | None = None
        self.form_id: int | None = None
        self.frag = fragment_context is not None
        self.frag_context = fragment_context or ""
        # foreign fragment contexts (svg/math innerHTML): with only
        # the synthetic root on the stack, the spec's ADJUSTED current
        # node is the context element — emulate it so children parse
        # as foreign content (case adjustment, namespaces, breakouts)
        self._frag_ns = (self.frag_context
                         if self.frag_context in ("svg", "math")
                         else None)
        self.skip_next_lf = False
        self.foster = False
        self.frameset_ok = True
        self.done = False
        # quirks mode (set_quirks_mode in the reference sink,
        # src/document.rs:100-102): missing doctype, a non-"html"
        # doctype name, or a legacy public/system id from the WHATWG
        # table (_doctype_is_quirky below) → quirks. Observable in tree
        # construction: <table> does NOT close an open <p> in quirks
        # mode. The tri-state incl. limited-quirks (layout-only, no
        # tree-construction effect) is recorded on arena.quirks_mode
        # for parity with the reference's public Document.quirks_mode.
        self.quirks = False
        # the spec's "stack of template insertion modes": one entry per
        # open template; </template> pops it and _reset_mode returns
        # the new top when it walks onto a template node
        # (html5ever src/tree_builder/mod.rs keeps the same stack)
        self.template_modes: list[str] = []

        self._frag_root: int | None = None
        if self.frag:
            html = self.arena.new_element("html")
            self.arena.append_child(0, html)
            self.stack.append(html)
            self._frag_root = html
            self.mode = self._reset_mode_for_fragment()

    # ==================================================================
    # public entry points
    # ==================================================================
    def parse(self, html: str) -> Arena:
        dispatch = _MODE_DISPATCH
        fb = TokenizerFeedback()
        ns = self.arena.ns
        # fragment tokenizer-state rule (WHATWG 13.4 step 2): rawtext/
        # RCDATA/script-data/PLAINTEXT context elements start the
        # tokenizer in their text state. (The reference's parse_html!
        # always passes context name "" — src/manipulation.rs:13-33 —
        # so this branch only fires for engine callers that opt into a
        # specific context.)
        ctx = self.frag_context
        initial_raw = ctx if self.frag and (
            ctx in RAWTEXT_TAGS or ctx in RCDATA_TAGS) else None
        frag_ns = self._frag_ns
        fb.cdata_ok = frag_ns is not None  # root of a foreign fragment
        for tok in tokenize(html, fb, initial_raw=initial_raw,
                            initial_plaintext=self.frag
                            and ctx == "plaintext"):
            kind = tok[0]
            if (ns or frag_ns) and self._use_foreign_rules(tok):
                # a start tag consumed by the foreign rules must not
                # switch the tokenizer into rawtext/rcdata (svg:title,
                # svg:style, ... children stay in the data state);
                # breakout tags never overlap the rawtext set
                fb.foreign = kind == "start"
                self._foreign_token(tok)
            elif kind == "text":
                self._process_text(tok[1])
            else:
                fb.foreign = False
                self.skip_next_lf = False
                dispatch[self.mode](self, tok)
            # fragment backstop: the synthetic root must survive every
            # token — spec end-tag rules written for document flow
            # ("pop the current node, which is the head element") can
            # otherwise pop it in exotic contexts (head-context
            # `</head>`), leaving later handlers an empty stack
            if self._frag_root is not None and not self.stack:
                self.stack.append(self._frag_root)
                self.mode = self._reset_mode_for_fragment()
            # CDATA sections are legal only while the current node is
            # foreign (spec markup-declaration-open: adjusted current
            # node not in the HTML namespace); ns is empty for pure-HTML
            # documents so this is one falsy check on the hot path
            if frag_ns is None:
                fb.cdata_ok = bool(ns) and bool(self.stack) \
                    and self.stack[-1] in ns
            else:
                fb.cdata_ok = (bool(self.stack)
                               and self.stack[-1] in ns) \
                    or len(self.stack) == 1
            if self.done:
                break
        self._finish()
        return self.arena

    # ==================================================================
    # shared machinery
    # ==================================================================
    def _current(self) -> int:
        return self.stack[-1]

    def _name(self, nid: int) -> str:
        return self.arena.name[nid] or ""

    def _in_scope(self, targets, scope=_DEFAULT_SCOPE) -> bool:
        if isinstance(targets, str):
            targets = (targets,)
        for nid in reversed(self.stack):
            nm = self._name(nid)
            if nm in targets:
                return True
            if nm in scope:
                return False
        return False

    def _node_in_scope(self, target_nid: int, scope=_DEFAULT_SCOPE) -> bool:
        for nid in reversed(self.stack):
            if nid == target_nid:
                return True
            if self._name(nid) in scope:
                return False
        return False

    def _select_in_select_scope(self) -> bool:
        """Spec 'has a select element in select scope': every element
        type EXCEPT optgroup/option is a scope barrier. False exactly
        in the select-fragment case (the context element is never on
        the stack), where the in-select close/reprocess rules must
        ignore their token instead of draining the stack."""
        for nid in reversed(self.stack):
            nm = self._name(nid)
            if nm == "select":
                return True
            if nm not in ("optgroup", "option"):
                return False
        return False

    def _pop_until(self, names) -> None:
        if isinstance(names, str):
            names = (names,)
        while self.stack:
            nid = self.stack.pop()
            if self._name(nid) in names:
                return

    def _generate_implied_end_tags(self, except_: str | None = None) -> None:
        while self.stack:
            nm = self._name(self._current())
            if nm in _IMPLIED_END and nm != except_:
                self.stack.pop()
            else:
                return

    def _close_p(self) -> None:
        """Close a <p> element that is in button scope."""
        self._generate_implied_end_tags(except_="p")
        self._pop_until("p")

    def _maybe_close_p(self) -> None:
        if self._in_scope("p", _BUTTON_SCOPE):
            self._close_p()

    # ---------------- insertion --------------------------------------
    def _appropriate_place(self, override: int | None = None):
        """Returns ('append', parent) or ('before', ref_node)."""
        target = override if override is not None else self._current()
        if self.foster and self._name(target) in _TABLE_FOSTER:
            # find last table in the stack
            table = None
            for nid in reversed(self.stack):
                if self._name(nid) == "table":
                    table = nid
                    break
            if table is None:
                return ("append", self.stack[0])
            parent = self.arena.parent[table]
            if parent != NIL:
                return ("before", table)
            idx = self.stack.index(table)
            return ("append", self.stack[idx - 1])
        return ("append", target)

    def _contents_of(self, parent: int) -> int:
        """Template redirect: appending 'into' a template element lands
        in its detached contents fragment (the spec's appropriate-place
        adjustment; html5ever's get_template_contents — the contents
        node is never a child of the template, src/document.rs:88-96)."""
        tc = self.arena.template_contents
        if tc:
            return tc.get(parent, parent)
        return parent

    def _insert_at(self, place, nid: int) -> None:
        if place[0] == "append":
            self.arena.append_child(self._contents_of(place[1]), nid)
        else:
            self.arena.insert_before(place[1], nid)

    def _insert_element(self, name: str, attrs, push: bool = True) -> int:
        a = self.arena
        nid = a.new_element(name, attrs)
        if name == "template":
            # contents fragment: a detached Document node, created with
            # the element (src/document.rs:120-144)
            a.template_contents[nid] = a.new_node(DOCUMENT)
        if not self.foster:
            # hot path: plain append to the current node
            parent = self.stack[-1] if self.stack else 0
            a.append_child(self._contents_of(parent), nid)
        else:
            self._insert_at(self._appropriate_place(), nid)
        if push:
            self.stack.append(nid)
            # rawtext/rcdata content arrives as one text token; enter the
            # spec's "text" insertion mode until the matching end tag
            if name in _TEXT_MODE_TAGS and self.mode != "text":
                self.original_mode = self.mode
                self.mode = "text"
        return nid

    def _insert_text(self, data: str, override: int | None = None) -> None:
        """Insert character data with adjacent-text coalescing
        (src/document.rs:167-183, src/dom_tree.rs:71-79)."""
        if self.skip_next_lf:
            self.skip_next_lf = False
            if data.startswith("\n"):
                data = data[1:]
        if not data:
            return
        a = self.arena
        if not self.foster and override is None:
            # hot path: append/coalesce at the current node
            parent = self._contents_of(self.stack[-1] if self.stack else 0)
            last = a.last[parent]
            if last != NIL and a.kind[last] == TEXT:
                a.text[last] = a.text[last] + data  # type: ignore[operator]
                return
            a.append_child(parent, a.new_text(data))
            return
        place = self._appropriate_place(override)
        if place[0] == "append":
            parent = self._contents_of(place[1])
            last = a.last[parent]
            if last != NIL and a.kind[last] == TEXT:
                a.text[last] = a.text[last] + data  # type: ignore[operator]
                return
            a.append_child(parent, a.new_text(data))
        else:
            ref = place[1]
            prev = a.prev[ref]
            if prev != NIL and a.kind[prev] == TEXT:
                a.text[prev] = a.text[prev] + data  # type: ignore[operator]
                return
            a.insert_before(ref, a.new_text(data))

    def _insert_comment(self, data: str, parent: int | None = None) -> None:
        nid = self.arena.new_node(COMMENT, text=data)
        if parent is not None:
            self.arena.append_child(parent, nid)
        else:
            self._insert_at(self._appropriate_place(), nid)

    # ---------------- active formatting elements ---------------------
    def _afe_push(self, nid: int, name: str, attrs) -> None:
        # Noah's ark: max 3 identical entries after the last marker
        snapshot = [list(a) for a in attrs]
        key = (name, sorted(map(tuple, snapshot)))
        count = 0
        for entry in reversed(self.afe):
            if entry is MARKER:
                break
            if (entry[1], sorted(map(tuple, entry[2]))) == key:
                count += 1
                if count == 3:
                    self.afe.remove(entry)
                    break
        self.afe.append([nid, name, snapshot])

    def _afe_reconstruct(self) -> None:
        afe = self.afe
        if not afe:
            return
        last = afe[-1]
        if last is MARKER or last[0] in self.stack:
            return
        i = len(afe) - 1
        while True:
            if i == 0:
                break
            i -= 1
            e = afe[i]
            if e is MARKER or e[0] in self.stack:
                i += 1
                break
        while i < len(afe):
            entry = afe[i]
            nid = self._insert_element(entry[1], [list(a) for a in entry[2]])
            afe[i] = [nid, entry[1], entry[2]]
            i += 1

    def _afe_clear_to_marker(self) -> None:
        while self.afe:
            if self.afe.pop() is MARKER:
                return

    def _afe_find(self, name: str):
        for entry in reversed(self.afe):
            if entry is MARKER:
                return None
            if entry[1] == name:
                return entry
        return None

    # ---------------- adoption agency --------------------------------
    def _adoption_agency(self, subject: str) -> str | None:
        """WHATWG 13.2.6.4.7 adoption agency algorithm.
        Returns 'any_other' when the token must be handled by the
        any-other-end-tag rules."""
        a = self.arena
        cur = self._current() if self.stack else None
        if (cur is not None and self._name(cur) == subject
                and all(e is MARKER or e[0] != cur for e in self.afe)):
            self.stack.pop()
            return None
        for it in range(8):
            entry = self._afe_find(subject)
            if entry is None:
                return "any_other"
            fe = entry[0]
            if it == 0 and fe == cur:
                # properly-nested close (</b> with <b> current): fe is
                # trivially in scope, no furthest block can exist below
                # it — pop + drop the AFE entry, skipping the scans.
                # (NB: fe == cur must be checked against the FOUND
                # entry — "cur's name matches" alone is not enough,
                # because a fostered same-name element can hold a LATER
                # AFE entry while cur is also listed.)
                self.stack.pop()
                self.afe.remove(entry)
                return None
            if fe not in self.stack:
                self.afe.remove(entry)
                return None
            if not self._node_in_scope(fe):
                return None  # parse error; ignore token
            idx_fe = self.stack.index(fe)
            # furthest block: lowest node after fe that is special
            fb = None
            for j in range(idx_fe + 1, len(self.stack)):
                if self._name(self.stack[j]) in SPECIAL:
                    fb = self.stack[j]
                    break
            if fb is None:
                del self.stack[idx_fe:]
                self.afe.remove(entry)
                return None
            common_ancestor = self.stack[idx_fe - 1]
            bookmark = self.afe.index(entry)
            node = fb
            last_node = fb
            # element above `node` — captured before possible removal
            node_above = self.stack[self.stack.index(fb) - 1]
            inner = 0
            while True:
                inner += 1
                node = node_above
                if node == fe:
                    break
                node_above = self.stack[self.stack.index(node) - 1]
                node_entry = None
                for e in self.afe:
                    if e is not MARKER and e[0] == node:
                        node_entry = e
                        break
                if inner > 3 and node_entry is not None:
                    self.afe.remove(node_entry)
                    node_entry = None
                if node_entry is None:
                    self.stack.remove(node)
                    continue
                new = a.new_element(node_entry[1],
                                    [list(x) for x in node_entry[2]])
                i_afe = self.afe.index(node_entry)
                self.afe[i_afe] = [new, node_entry[1], node_entry[2]]
                i_stk = self.stack.index(node)
                self.stack[i_stk] = new
                node = new
                if last_node == fb:
                    bookmark = i_afe + 1
                a.remove_from_parent(last_node)
                a.append_child(node, last_node)
                last_node = node
            a.remove_from_parent(last_node)
            self._insert_at(self._appropriate_place(common_ancestor),
                            last_node)
            new_fe = a.new_element(entry[1], [list(x) for x in entry[2]])
            a.reparent_children(fb, new_fe)
            a.append_child(fb, new_fe)
            idx_entry = self.afe.index(entry)
            self.afe.remove(entry)
            if idx_entry < bookmark:
                bookmark -= 1
            self.afe.insert(min(bookmark, len(self.afe)),
                            [new_fe, entry[1], entry[2]])
            self.stack.remove(fe)
            self.stack.insert(self.stack.index(fb) + 1, new_fe)
        return None

    # ---------------- foreign content (svg / math) --------------------
    def _is_html_ip(self, nid: int) -> bool:
        """HTML integration point: svg foreignObject/desc/title, or
        math annotation-xml with an html encoding."""
        ns = self.arena.ns.get(nid)
        nm = (self.arena.name[nid] or "").lower()
        if ns == "svg":
            return nm in SVG_HTML_IP
        if ns == "math" and nm == "annotation-xml":
            enc = (self.arena.get_attr(nid, "encoding") or "").lower()
            return enc in ("text/html", "application/xhtml+xml")
        return False

    def _use_foreign_rules(self, tok) -> bool:
        """The spec's tree-construction dispatcher: foreign rules apply
        unless the current node is HTML or an integration point exempts
        this token kind."""
        if not self.stack:
            return False
        cur = self.stack[-1]
        ns = self.arena.ns.get(cur)
        if ns is None:
            if self._frag_ns is not None and len(self.stack) == 1:
                # fragment case: the adjusted current node is the
                # context element (svg/math — not an integration
                # point, so no exemptions apply)
                return True
            return False
        k = tok[0]
        nm = (self.arena.name[cur] or "").lower()
        if ns == "math" and nm in MATHML_TEXT_IP:
            if k == "text":
                return False
            if k == "start" and tok[1] not in ("mglyph", "malignmark"):
                return False
        if (ns == "math" and nm == "annotation-xml" and k == "start"
                and tok[1] == "svg"):
            return False
        if self._is_html_ip(cur) and k in ("text", "start"):
            return False
        return True

    def _insert_foreign(self, name: str, attrs, ns: str,
                        push: bool) -> int:
        a = self.arena
        nid = a.new_element(name, attrs)
        a.ns[nid] = ns
        if not self.foster:
            a.append_child(
                self._contents_of(self.stack[-1] if self.stack else 0), nid)
        else:
            self._insert_at(self._appropriate_place(), nid)
        if push:
            self.stack.append(nid)
        return nid

    def _foreign_token(self, tok) -> None:
        """'Rules for parsing tokens in foreign content' (spec-lite:
        breakout list, name/attr case adjustment, end-tag walk)."""
        a = self.arena
        k = tok[0]
        if k == "text":
            data = tok[1].replace("\x00", "�")
            self._insert_text(data)
            if data.strip("\t\n\f\r "):
                self.frameset_ok = False
            return
        if k == "comment":
            self._insert_comment(tok[1])
            return
        if k == "doctype":
            return
        if k == "start":
            name, attrs, self_closing = tok[1], tok[2], tok[3]
            if name in BREAKOUT or (name == "font"
                                    and font_breaks_out(attrs)):
                # pop foreign elements (to an IP or HTML), reprocess
                while self.stack:
                    cur = self.stack[-1]
                    if a.ns.get(cur) is None:
                        break
                    nm = (a.name[cur] or "").lower()
                    if (a.ns[cur] == "math" and nm in MATHML_TEXT_IP) or \
                            self._is_html_ip(cur):
                        break
                    self.stack.pop()
                _MODE_DISPATCH[self.mode](self, tok)
                return
            cur_ns = a.ns.get(self.stack[-1]) or self._frag_ns or "svg"
            if cur_ns == "svg":
                name = adjust_svg_tag(name)
            adjust_foreign_attrs(attrs, cur_ns)
            self._insert_foreign(name, attrs, cur_ns,
                                 push=not self_closing)
            return
        # end tag: walk the stack; matching foreign name pops through,
        # an HTML element hands the token back to the HTML rules
        name = tok[1]
        for i in range(len(self.stack) - 1, 0, -1):
            nid = self.stack[i]
            if a.ns.get(nid) is None:
                _MODE_DISPATCH[self.mode](self, tok)
                return
            if (a.name[nid] or "").lower() == name:
                del self.stack[i:]
                return
        # unmatched foreign end tag: ignored

    def _end_template(self) -> None:
        """`</template>` per spec: generate all implied end tags
        THOROUGHLY, pop through the template, clear AFE to its marker,
        pop the template insertion-mode stack, reset the insertion
        mode (which lands on the new top of that stack when the walk
        hits an enclosing template)."""
        if not any(self._name(n) == "template" for n in self.stack):
            return
        while self.stack and \
                self._name(self._current()) in _IMPLIED_END_THOROUGH:
            self.stack.pop()
        while self.stack:
            if self._name(self.stack.pop()) == "template":
                break
        self._afe_clear_to_marker()
        if self.template_modes:
            self.template_modes.pop()
        self.mode = self._reset_mode()

    # ---------------- mode resets -------------------------------------
    def _reset_mode(self) -> str:
        for i in range(len(self.stack) - 1, -1, -1):
            nid = self.stack[i]
            last = i == 0
            name = self._name(nid)
            if self.frag and last:
                name = self.frag_context
            if name == "select":
                return "in_select"
            if name in ("td", "th") and not last:
                return "in_cell"
            if name == "tr":
                return "in_row"
            if name in _TABLE_SECTIONS:
                return "in_table_body"
            if name == "caption":
                return "in_caption"
            if name == "colgroup":
                return "in_column_group"
            if name == "table":
                return "in_table"
            if name == "template":
                # the CURRENT template insertion mode (top of the
                # per-template mode stack)
                return self.template_modes[-1] if self.template_modes \
                    else "in_body"
            if name == "head" and not last:
                return "in_head"
            if name == "body":
                return "in_body"
            if name == "html":
                return "before_head" if self.head_id is None else "after_head"
            if last:
                return "in_body"
        return "in_body"

    def _reset_mode_for_fragment(self) -> str:
        ctx = self.frag_context
        if ctx == "template":
            self.template_modes.append("in_template")
            return "in_template"
        if ctx in ("title", "textarea", "style", "script", "xmp", "iframe",
                   "noembed", "noframes", "noscript", "plaintext"):
            return "in_body"  # tokenizer handles raw modes separately
        if ctx == "select":
            return "in_select"
        if ctx in ("td", "th"):
            return "in_cell"
        if ctx == "tr":
            return "in_row"
        if ctx in _TABLE_SECTIONS:
            return "in_table_body"
        if ctx == "caption":
            return "in_caption"
        if ctx == "colgroup":
            return "in_column_group"
        if ctx == "table":
            return "in_table"
        if ctx == "head":
            return "in_head"
        if ctx == "frameset":
            return "in_frameset"
        if ctx == "html":
            # reset step for html: head pointer is null in a fresh
            # fragment → "before head" (the parsed <head>/<body>
            # materialize under the fragment root like a document's)
            return "before_head"
        return "in_body"

    def _finish(self) -> None:
        """EOF handling: materialize the implied html/head/body chain
        (the spec's reprocess-on-EOF cascade through the startup modes)."""
        if self.mode == "text":
            # unclosed rawtext/rcdata element at EOF
            if self.stack:
                self.stack.pop()
            self.mode = self.original_mode
        # EOF with open template(s): the spec pops them before the
        # startup cascade — otherwise the implied body would be
        # redirected into the template-contents fragment
        while any(self._name(n) == "template" for n in self.stack):
            self._end_template()
        if self.frag:
            return
        if self.mode in ("in_frameset", "after_frameset",
                         "after_after_frameset"):
            return  # frameset documents have no body
        if self.mode in ("initial", "before_html"):
            nid = self.arena.new_element("html")
            self.arena.append_child(0, nid)
            self.stack.append(nid)
            self.mode = "before_head"
        if self.mode == "before_head":
            self.head_id = self._insert_element("head", [])
            self.mode = "in_head"
        if self.mode == "in_head":
            if self._name(self._current()) == "head":
                self.stack.pop()
            self.mode = "after_head"
        if self.mode == "after_head":
            self._insert_element("body", [])
            self.mode = "in_body"

    # ==================================================================
    # character handling (batched; modes that split ws/non-ws do so here)
    # ==================================================================
    def _process_text(self, data: str) -> None:
        mode = self.mode
        if mode == "in_body":        # the hot path, checked first
            if "\x00" in data:       # rare: avoid the copy otherwise
                data = data.replace("\x00", "")
                if not data:
                    return
            if data.strip("\t\n\f ") != "":
                self.frameset_ok = False
            self._afe_reconstruct()
            self._insert_text(data)
            return
        if mode == "text":
            self._insert_text(data)
            return
        if mode in ("initial", "before_html", "before_head"):
            stripped = data.lstrip("\t\n\f ")
            if not stripped:
                return
            # non-whitespace: fall through the startup modes
            _MODE_DISPATCH[mode](self, ("__text__", stripped))
            return
        if mode in ("in_head", "after_head", "in_column_group"):
            # whitespace inserted; rest reprocessed
            i = 0
            n = len(data)
            while i < n and data[i] in "\t\n\f ":
                i += 1
            if i:
                self._insert_text(data[:i])
            if i < n:
                _MODE_DISPATCH[mode](self, ("__text__", data[i:]))
            return
        if mode in ("in_table", "in_table_body", "in_row"):
            self._in_table_text(data)
            return
        if mode in ("in_frameset", "after_frameset",
                    "after_after_frameset"):
            ws = "".join(ch for ch in data if ch in "\t\n\f ")
            if ws:
                self._insert_text(ws)
            return
        if mode in ("after_body", "after_after_body"):
            ws = data.strip("\t\n\f ") == ""
            if ws:
                # process using in_body rules
                self.mode = "in_body"
                self._process_text(data)
                self.mode = mode
                return
            self.mode = "in_body"
            self._process_text(data)
            return
        if mode == "in_select":
            data = data.replace("\x00", "")
            if data:
                self._insert_text(data)
            return
        # in_caption, in_cell and friends (in_body returned at the top)
        if "\x00" in data:
            data = data.replace("\x00", "")
            if not data:
                return
        if data.strip("\t\n\f ") != "":
            self.frameset_ok = False
        self._afe_reconstruct()
        self._insert_text(data)

    def _in_table_text(self, data: str) -> None:
        data = data.replace("\x00", "")
        if not data:
            return
        if data.strip("\t\n\f ") == "":
            self._insert_text(data)
            return
        # non-whitespace in table: foster-parent via in-body rules
        self.arena.errors.append("unexpected-characters-in-table")
        self.foster = True
        self._afe_reconstruct()
        self._insert_text(data)
        self.foster = False


# ======================================================================
# insertion-mode handlers
# ======================================================================

# WHATWG "initial" insertion mode, quirks conditions: legacy public-id
# prefixes (case-insensitive), three exact public ids, one system id,
# and two prefixes that are quirky only when the system id is MISSING
# (html5ever mirrors the same table; the reference inherits it).
_QUIRKY_PUBLIC_EXACT = frozenset((
    "-//w3o//dtd w3 html strict 3.0//en//",
    "-/w3c/dtd html 4.0 transitional/en",
    "html",
))
_QUIRKY_PUBLIC_PREFIXES = (
    "+//silmaril//dtd html pro v0r11 19970101//",
    "-//as//dtd html 3.0 aswedit + extensions//",
    "-//advasoft ltd//dtd html 3.0 aswedit + extensions//",
    "-//ietf//dtd html 2.0 level 1//",
    "-//ietf//dtd html 2.0 level 2//",
    "-//ietf//dtd html 2.0 strict level 1//",
    "-//ietf//dtd html 2.0 strict level 2//",
    "-//ietf//dtd html 2.0 strict//",
    "-//ietf//dtd html 2.0//",
    "-//ietf//dtd html 2.1e//",
    "-//ietf//dtd html 3.0//",
    "-//ietf//dtd html 3.2 final//",
    "-//ietf//dtd html 3.2//",
    "-//ietf//dtd html 3//",
    "-//ietf//dtd html level 0//",
    "-//ietf//dtd html level 1//",
    "-//ietf//dtd html level 2//",
    "-//ietf//dtd html level 3//",
    "-//ietf//dtd html strict level 0//",
    "-//ietf//dtd html strict level 1//",
    "-//ietf//dtd html strict level 2//",
    "-//ietf//dtd html strict level 3//",
    "-//ietf//dtd html strict//",
    "-//ietf//dtd html//",
    "-//metrius//dtd metrius presentational//",
    "-//microsoft//dtd internet explorer 2.0 html strict//",
    "-//microsoft//dtd internet explorer 2.0 html//",
    "-//microsoft//dtd internet explorer 2.0 tables//",
    "-//microsoft//dtd internet explorer 3.0 html strict//",
    "-//microsoft//dtd internet explorer 3.0 html//",
    "-//microsoft//dtd internet explorer 3.0 tables//",
    "-//netscape comm. corp.//dtd html//",
    "-//netscape comm. corp.//dtd strict html//",
    "-//o'reilly and associates//dtd html 2.0//",
    "-//o'reilly and associates//dtd html extended 1.0//",
    "-//o'reilly and associates//dtd html extended relaxed 1.0//",
    "-//softquad software//dtd hotmetal pro 6.0::19990601::"
    "extensions to html 4.0//",
    "-//softquad//dtd hotmetal pro 4.0::19971010::"
    "extensions to html 4.0//",
    "-//spyglass//dtd html 2.0 extended//",
    "-//sq//dtd html 2.0 hotmetal + extensions//",
    "-//sun microsystems corp.//dtd hotjava html//",
    "-//sun microsystems corp.//dtd hotjava strict html//",
    "-//w3c//dtd html 3 1995-03-24//",
    "-//w3c//dtd html 3.2 draft//",
    "-//w3c//dtd html 3.2 final//",
    "-//w3c//dtd html 3.2//",
    "-//w3c//dtd html 3.2s draft//",
    "-//w3c//dtd html 4.0 frameset//",
    "-//w3c//dtd html 4.0 transitional//",
    "-//w3c//dtd html experimental 19960712//",
    "-//w3c//dtd html experimental 970421//",
    "-//w3c//dtd w3 html//",
    "-//w3o//dtd w3 html 3.0//",
    "-//webtechs//dtd mozilla html 2.0//",
    "-//webtechs//dtd mozilla html//",
)
_QUIRKY_PUBLIC_PREFIXES_NO_SYSTEM = (
    "-//w3c//dtd html 4.01 frameset//",
    "-//w3c//dtd html 4.01 transitional//",
)
_QUIRKY_SYSTEM = "http://www.ibm.com/data/dtd/v11/ibmxhtml1-transitional.dtd"


def _doctype_is_quirky(name: str, public_id: str | None,
                       system_id: str | None) -> bool:
    if name != "html":
        return True
    if public_id is not None:
        p = public_id.lower()
        if p in _QUIRKY_PUBLIC_EXACT or \
                p.startswith(_QUIRKY_PUBLIC_PREFIXES):
            return True
        if system_id is None and \
                p.startswith(_QUIRKY_PUBLIC_PREFIXES_NO_SYSTEM):
            return True
    return system_id is not None and system_id.lower() == _QUIRKY_SYSTEM


# limited-quirks conditions (evaluated only when not fully quirky):
# XHTML 1.0 Frameset/Transitional public ids, plus the HTML 4.01
# Frameset/Transitional ids when a system id IS present (the
# system-id-MISSING case is full quirks, table above). Limited quirks
# never changes tree construction — it is recorded for the public
# quirks_mode tri-state only (reference src/document.rs:26-27).
_LIMITED_PUBLIC_PREFIXES = (
    "-//w3c//dtd xhtml 1.0 frameset//",
    "-//w3c//dtd xhtml 1.0 transitional//",
)
_LIMITED_PUBLIC_PREFIXES_WITH_SYSTEM = (
    "-//w3c//dtd html 4.01 frameset//",
    "-//w3c//dtd html 4.01 transitional//",
)


def _doctype_is_limited_quirks(public_id: str | None,
                               system_id: str | None) -> bool:
    if public_id is None:
        return False
    p = public_id.lower()
    if p.startswith(_LIMITED_PUBLIC_PREFIXES):
        return True
    return system_id is not None and \
        p.startswith(_LIMITED_PUBLIC_PREFIXES_WITH_SYSTEM)


def _mode_initial(tb: TreeBuilder, tok) -> None:
    k = tok[0]
    if k == "doctype":
        nid = tb.arena.new_node(
            DOCTYPE, name=tok[1],
            text=(tok[2] or "") + "\x00" + (tok[3] or ""))
        tb.arena.append_child(0, nid)
        force = len(tok) > 4 and tok[4]  # tokenizer force-quirks flag
        if force or _doctype_is_quirky(tok[1], tok[2], tok[3]):
            tb.quirks = True
            tb.arena.quirks_mode = "quirks"
            tb.arena.errors.append("quirky-doctype")
        elif _doctype_is_limited_quirks(tok[2], tok[3]):
            tb.arena.quirks_mode = "limited-quirks"
        tb.mode = "before_html"
        return
    if k == "comment":
        tb._insert_comment(tok[1], parent=0)
        return
    # anything else before a doctype (non-ws text arrives here as a
    # pre-stripped __text__ reprocess token): quirks mode
    tb.quirks = True
    tb.arena.quirks_mode = "quirks"
    tb.arena.errors.append("expected-doctype-but-got-" +
                           ("chars" if k == "__text__" else k))
    tb.mode = "before_html"
    _MODE_DISPATCH["before_html"](tb, tok)


def _mode_before_html(tb: TreeBuilder, tok) -> None:
    k = tok[0]
    if k == "doctype":
        return
    if k == "comment":
        tb._insert_comment(tok[1], parent=0)
        return
    if k == "start" and tok[1] == "html":
        nid = tb.arena.new_element("html", tok[2])
        tb.arena.append_child(0, nid)
        tb.stack.append(nid)
        tb.mode = "before_head"
        return
    if k == "end" and tok[1] not in ("head", "body", "html", "br"):
        return
    nid = tb.arena.new_element("html")
    tb.arena.append_child(0, nid)
    tb.stack.append(nid)
    tb.mode = "before_head"
    _MODE_DISPATCH["before_head"](tb, tok)


def _mode_before_head(tb: TreeBuilder, tok) -> None:
    k = tok[0]
    if k == "comment":
        tb._insert_comment(tok[1])
        return
    if k == "doctype":
        return
    if k == "start":
        if tok[1] == "html":
            tb.arena.add_attrs_if_missing(tb.stack[0], tok[2])
            return
        if tok[1] == "head":
            tb.head_id = tb._insert_element("head", tok[2])
            tb.mode = "in_head"
            return
    if k == "end" and tok[1] not in ("head", "body", "html", "br"):
        return
    tb.head_id = tb._insert_element("head", [])
    tb.mode = "in_head"
    _MODE_DISPATCH["in_head"](tb, tok)


def _mode_in_head(tb: TreeBuilder, tok) -> None:
    k = tok[0]
    if k == "comment":
        tb._insert_comment(tok[1])
        return
    if k == "doctype":
        return
    if k == "start":
        name = tok[1]
        if name == "html":
            tb.arena.add_attrs_if_missing(tb.stack[0], tok[2])
            return
        if name in ("base", "basefont", "bgsound", "link", "meta"):
            tb._insert_element(name, tok[2], push=False)
            return
        if name == "template":
            # spec: insert, AFE marker, frameset-ok off, switch to the
            # "in template" mode and push it onto the template-mode
            # stack (popped by </template>)
            tb._insert_element(name, tok[2])
            tb.afe.append(MARKER)
            tb.frameset_ok = False
            tb.mode = "in_template"
            tb.template_modes.append("in_template")
            return
        if name in ("title", "style", "script", "noscript", "noframes"):
            # rawtext/rcdata content arrives as a single text token;
            # pushing keeps the element current for that text.
            tb._insert_element(name, tok[2])
            return
        if name == "head":
            return
    if k == "end":
        name = tok[1]
        if name == "head":
            tb.stack.pop()
            tb.mode = "after_head"
            return
        if name == "template":
            tb._end_template()
            return
        if name in ("title", "style", "script", "noscript", "noframes"):
            if tb.stack and tb._name(tb._current()) == name:
                tb.stack.pop()
            return
        if name not in ("body", "html", "br"):
            return
    if tok[0] == "__text__":
        tok = ("text_reprocess", tok[1])
    # anything else: pop head, switch to after_head, reprocess
    if tb.stack and tb._name(tb._current()) == "head":
        tb.stack.pop()
    tb.mode = "after_head"
    if tok[0] == "text_reprocess":
        tb._process_text(tok[1])
    else:
        _MODE_DISPATCH["after_head"](tb, tok)


def _mode_after_head(tb: TreeBuilder, tok) -> None:
    k = tok[0]
    if k == "comment":
        tb._insert_comment(tok[1])
        return
    if k == "doctype":
        return
    if k == "start":
        name = tok[1]
        if name == "html":
            tb.arena.add_attrs_if_missing(tb.stack[0], tok[2])
            return
        if name == "body":
            tb._insert_element("body", tok[2])
            tb.mode = "in_body"
            return
        if name == "frameset":
            tb._insert_element("frameset", tok[2])
            tb.mode = "in_frameset"
            return
        if name in _IN_HEAD_TAGS:
            # parse error: re-enter head
            assert tb.head_id is not None
            tb.stack.append(tb.head_id)
            _MODE_DISPATCH["in_head"](tb, tok)
            if tb.stack and tb.stack[-1] == tb.head_id:
                tb.stack.pop()
            else:
                try:
                    tb.stack.remove(tb.head_id)
                except ValueError:
                    pass
            return
        if name == "head":
            return
    if k == "end" and tok[1] not in ("body", "html", "br"):
        return
    tb._insert_element("body", [])
    tb.mode = "in_body"
    if tok[0] == "__text__":
        tb._process_text(tok[1])
    else:
        _MODE_DISPATCH["in_body"](tb, tok)


def _mode_in_body(tb: TreeBuilder, tok) -> None:  # noqa: C901
    a = tb.arena
    k = tok[0]
    if k == "__text__":
        tb._process_text(tok[1])
        return
    if k == "comment":
        tb._insert_comment(tok[1])
        return
    if k == "doctype":
        return
    if k == "start":
        name, attrs, self_closing = tok[1], tok[2], tok[3]
        if name not in _SPECIAL_START_NAMES:
            # O(1) fast path for generic start tags (span & friends —
            # the most frequent elements in real pages)
            tb._afe_reconstruct()
            nid = tb._insert_element(name, attrs)
            if self_closing and _is_foreign_context(tb, nid):
                tb.stack.pop()
            return
        if name == "html":
            a.add_attrs_if_missing(tb.stack[0], attrs)
            return
        if name in _IN_HEAD_TAGS:
            _MODE_DISPATCH["in_head"](tb, tok)
            return
        if name == "body":
            if (len(tb.stack) > 1 and tb._name(tb.stack[1]) == "body"):
                a.errors.append("unexpected-start-tag-body")
                a.add_attrs_if_missing(tb.stack[1], attrs)
            return
        if name in _CLOSE_P_TAGS:
            tb._maybe_close_p()
            tb._insert_element(name, attrs)
            return
        if name in _HEADINGS:
            tb._maybe_close_p()
            if tb._name(tb._current()) in _HEADINGS:
                tb.stack.pop()
            tb._insert_element(name, attrs)
            return
        if name in ("pre", "listing"):
            tb._maybe_close_p()
            tb._insert_element(name, attrs)
            tb.skip_next_lf = True
            tb.frameset_ok = False
            return
        if name == "form":
            # the form element pointer only governs (and is only set)
            # when NO template is on the stack — template contents get
            # their own forms, and a form inside a template must not
            # block a later form in the body
            in_template = any(tb._name(n) == "template"
                              for n in tb.stack)
            if tb.form_id is not None and not in_template:
                tb.arena.errors.append("unexpected-start-tag-form")
                return
            tb._maybe_close_p()
            nid = tb._insert_element("form", attrs)
            if not in_template:
                tb.form_id = nid
            return
        if name == "li":
            tb.frameset_ok = False
            for nid in reversed(tb.stack):
                nm = tb._name(nid)
                if nm == "li":
                    tb._generate_implied_end_tags(except_="li")
                    tb._pop_until("li")
                    break
                if nm in SPECIAL and nm not in ("address", "div", "p"):
                    break
            tb._maybe_close_p()
            tb._insert_element("li", attrs)
            return
        if name in ("dd", "dt"):
            tb.frameset_ok = False
            for nid in reversed(tb.stack):
                nm = tb._name(nid)
                if nm in ("dd", "dt"):
                    tb._generate_implied_end_tags(except_=nm)
                    tb._pop_until(nm)
                    break
                if nm in SPECIAL and nm not in ("address", "div", "p"):
                    break
            tb._maybe_close_p()
            tb._insert_element(name, attrs)
            return
        if name == "plaintext":
            tb._maybe_close_p()
            tb._insert_element("plaintext", attrs)
            return
        if name == "button":
            if tb._in_scope("button"):
                tb._generate_implied_end_tags()
                tb._pop_until("button")
            tb._afe_reconstruct()
            tb._insert_element("button", attrs)
            tb.frameset_ok = False
            return
        if name == "a":
            entry = tb._afe_find("a")
            if entry is not None:
                tb._adoption_agency("a")
                if entry in tb.afe:
                    tb.afe.remove(entry)
                if entry[0] in tb.stack:
                    tb.stack.remove(entry[0])
            tb._afe_reconstruct()
            nid = tb._insert_element("a", attrs)
            tb._afe_push(nid, "a", attrs)
            return
        if name in FORMATTING:  # b big code em font i s small strike strong tt u
            tb._afe_reconstruct()
            if name == "nobr" and tb._in_scope("nobr"):
                tb._adoption_agency("nobr")
                tb._afe_reconstruct()
            nid = tb._insert_element(name, attrs)
            tb._afe_push(nid, name, attrs)
            return
        if name in ("applet", "marquee", "object"):
            tb._afe_reconstruct()
            tb._insert_element(name, attrs)
            tb.afe.append(MARKER)
            return
        if name == "table":
            if not tb.quirks:  # quirks mode: table nests inside the p
                tb._maybe_close_p()
            tb._insert_element("table", attrs)
            tb.frameset_ok = False
            tb.mode = "in_table"
            return
        if name in ("area", "br", "embed", "img", "keygen", "wbr"):
            tb._afe_reconstruct()
            tb._insert_element(name, attrs, push=False)
            tb.frameset_ok = False
            return
        if name == "input":
            tb._afe_reconstruct()
            tb._insert_element("input", attrs, push=False)
            # spec: a non-hidden input makes the body non-replaceable
            if dict(attrs).get("type", "").lower() != "hidden":
                tb.frameset_ok = False
            return
        if name in ("param", "source", "track"):
            tb._insert_element(name, attrs, push=False)
            return
        if name == "hr":
            tb._maybe_close_p()
            tb._insert_element("hr", attrs, push=False)
            tb.frameset_ok = False
            return
        if name == "image":
            tb._afe_reconstruct()
            tb._insert_element("img", attrs, push=False)
            tb.frameset_ok = False
            return
        if name == "textarea":
            tb._insert_element("textarea", attrs)
            tb.skip_next_lf = True
            tb.frameset_ok = False
            return
        if name == "xmp":
            tb._maybe_close_p()
            tb._afe_reconstruct()
            tb._insert_element("xmp", attrs)
            tb.frameset_ok = False
            return
        if name in ("iframe", "noembed"):
            if name == "iframe":
                tb.frameset_ok = False
            tb._insert_element(name, attrs)
            return
        if name == "select":
            tb._afe_reconstruct()
            tb._insert_element("select", attrs)
            tb.mode = "in_select"
            return
        if name in ("optgroup", "option"):
            if tb._name(tb._current()) == "option":
                tb.stack.pop()
            tb._afe_reconstruct()
            tb._insert_element(name, attrs)
            return
        if name in ("rb", "rp", "rt", "rtc"):
            # spec: rb/rtc generate implied end tags fully; rt/rp
            # except RTC (not themselves) — an open <rtc> stays open
            # and the rt/rp nests inside it, while an open rt/rp is
            # closed by the next rt/rp
            if tb._in_scope("ruby"):
                tb._generate_implied_end_tags(
                    except_="rtc" if name in ("rt", "rp") else None)
            tb._insert_element(name, attrs)
            return
        if name in ("math", "svg"):
            tb._afe_reconstruct()
            ns = "svg" if name == "svg" else "math"
            adjust_foreign_attrs(attrs, ns)
            tb._insert_foreign(name, attrs, ns, push=not self_closing)
            return
        if name == "frameset":
            # spec: only when frameset_ok and body is still replaceable
            # (stack = [html, body, ...] with body the 2nd element)
            if (not tb.frameset_ok or len(tb.stack) < 2
                    or tb._name(tb.stack[1]) != "body"):
                return  # ignore
            tb.arena.remove_from_parent(tb.stack[1])
            del tb.stack[1:]
            tb._insert_element("frameset", attrs)
            tb.mode = "in_frameset"
            return
        if name in ("caption", "col", "colgroup", "frame", "head", "tbody",
                    "td", "tfoot", "th", "thead", "tr"):
            return  # parse error: ignore
        # any other start tag
        tb._afe_reconstruct()
        nid = tb._insert_element(name, attrs)
        if self_closing and _is_foreign_context(tb, nid):
            tb.stack.pop()
        return

    if k == "end":
        name = tok[1]
        if name == "body":
            if tb._in_scope("body"):
                tb.mode = "after_body"
            return
        if name == "html":
            if tb._in_scope("body"):
                tb.mode = "after_body"
                _MODE_DISPATCH["after_body"](tb, tok)
            return
        if name in _BODY_END_LIST:
            if tb._in_scope(name):
                tb._generate_implied_end_tags()
                tb._pop_until(name)
            return
        if name == "form":
            if any(tb._name(n) == "template" for n in tb.stack):
                # template branch of the spec rule: scope-based close,
                # the form pointer is not consulted
                if tb._in_scope("form"):
                    tb._generate_implied_end_tags()
                    tb._pop_until("form")
                return
            node = tb.form_id
            tb.form_id = None
            if node is not None and tb._node_in_scope(node):
                tb._generate_implied_end_tags()
                if node in tb.stack:
                    tb.stack.remove(node)
            return
        if name == "p":
            if not tb._in_scope("p", _BUTTON_SCOPE):
                tb._insert_element("p", [])
            tb._close_p()
            return
        if name == "li":
            if tb._in_scope("li", _LIST_ITEM_SCOPE):
                tb._generate_implied_end_tags(except_="li")
                tb._pop_until("li")
            return
        if name in ("dd", "dt"):
            if tb._in_scope(name):
                tb._generate_implied_end_tags(except_=name)
                tb._pop_until(name)
            return
        if name in _HEADINGS:
            if tb._in_scope(_HEADINGS):
                tb._generate_implied_end_tags()
                tb._pop_until(_HEADINGS)
            return
        if name in FORMATTING or name == "a" or name == "nobr":
            result = tb._adoption_agency(name)
            if result != "any_other":
                return
            # fall through to any-other-end-tag
        if name in ("applet", "marquee", "object"):
            if tb._in_scope(name):
                tb._generate_implied_end_tags()
                tb._pop_until(name)
                tb._afe_clear_to_marker()
            return
        if name == "br":
            tb.arena.errors.append("unexpected-end-tag-br")
            tb._afe_reconstruct()
            tb._insert_element("br", [], push=False)
            tb.frameset_ok = False  # acts as a br start tag
            return
        if name == "template":
            tb._end_template()
            return
        # any other end tag
        for i in range(len(tb.stack) - 1, -1, -1):
            nid = tb.stack[i]
            nm = tb._name(nid)
            if nm == name:
                tb._generate_implied_end_tags(except_=name)
                del tb.stack[i:]
                return
            if nm in SPECIAL:
                tb.arena.errors.append("unexpected-end-tag-" + name)
                return
        tb.arena.errors.append("unexpected-end-tag-" + name)
        return


def _is_foreign_context(tb: TreeBuilder, nid: int) -> bool:
    """True if the node sits inside an svg/math subtree (we honor the
    self-closing flag only there, approximating foreign content)."""
    p = nid
    a = tb.arena
    while p != NIL:
        if a.kind[p] == ELEMENT and (a.name[p] in ("svg", "math")):
            return True
        p = a.parent[p]
    return False


def _clear_stack_to(tb: TreeBuilder, ctx: frozenset) -> None:
    while tb.stack and tb._name(tb._current()) not in ctx:
        tb.stack.pop()


def _mode_in_table(tb: TreeBuilder, tok) -> None:
    k = tok[0]
    if k == "comment":
        tb._insert_comment(tok[1])
        return
    if k == "doctype":
        return
    if k == "start":
        name = tok[1]
        if name == "caption":
            _clear_stack_to(tb, _TABLE_CTX)
            tb.afe.append(MARKER)
            tb._insert_element("caption", tok[2])
            tb.mode = "in_caption"
            return
        if name == "colgroup":
            _clear_stack_to(tb, _TABLE_CTX)
            tb._insert_element("colgroup", tok[2])
            tb.mode = "in_column_group"
            return
        if name == "col":
            _clear_stack_to(tb, _TABLE_CTX)
            tb._insert_element("colgroup", [])
            tb.mode = "in_column_group"
            _MODE_DISPATCH["in_column_group"](tb, tok)
            return
        if name in _TABLE_SECTIONS:
            _clear_stack_to(tb, _TABLE_CTX)
            tb._insert_element(name, tok[2])
            tb.mode = "in_table_body"
            return
        if name in ("td", "th", "tr"):
            _clear_stack_to(tb, _TABLE_CTX)
            tb._insert_element("tbody", [])
            tb.mode = "in_table_body"
            _MODE_DISPATCH["in_table_body"](tb, tok)
            return
        if name == "table":
            if tb._in_scope("table", _TABLE_SCOPE):
                tb._pop_until("table")
                tb.mode = tb._reset_mode()
                _MODE_DISPATCH[tb.mode](tb, tok)
            return
        if name in ("style", "script", "template"):
            _MODE_DISPATCH["in_head"](tb, tok)
            return
        if name == "input":
            typ = next((a[1] for a in tok[2] if a[0] == "type"), "")
            if typ.lower() == "hidden":
                tb._insert_element("input", tok[2], push=False)
                return
            # else fall to anything-else
        if name == "form":
            # in-table form: ignored when a template is on the stack
            # OR the pointer is already set; otherwise insert, point,
            # pop immediately
            if tb.form_id is None and not any(
                    tb._name(n) == "template" for n in tb.stack):
                tb.form_id = tb._insert_element("form", tok[2])
                tb.stack.pop()
            return
    if k == "end":
        name = tok[1]
        if name == "table":
            if tb._in_scope("table", _TABLE_SCOPE):
                tb._pop_until("table")
                tb.mode = tb._reset_mode()
            return
        if name in ("body", "caption", "col", "colgroup", "html", "tbody",
                    "td", "tfoot", "th", "thead", "tr"):
            return
    # anything else: process via in_body with foster parenting enabled
    tb.arena.errors.append("unexpected-token-in-table")
    tb.foster = True
    _MODE_DISPATCH["in_body"](tb, tok)
    tb.foster = False


def _mode_in_caption(tb: TreeBuilder, tok) -> None:
    k = tok[0]
    if k == "end" and tok[1] == "caption":
        if tb._in_scope("caption", _TABLE_SCOPE):
            tb._generate_implied_end_tags()
            tb._pop_until("caption")
            tb._afe_clear_to_marker()
            tb.mode = "in_table"
        return
    if ((k == "start" and tok[1] in ("caption", "col", "colgroup", "tbody",
                                     "td", "tfoot", "th", "thead", "tr"))
            or (k == "end" and tok[1] == "table")):
        if tb._in_scope("caption", _TABLE_SCOPE):
            tb._generate_implied_end_tags()
            tb._pop_until("caption")
            tb._afe_clear_to_marker()
            tb.mode = "in_table"
            _MODE_DISPATCH["in_table"](tb, tok)
        return
    if k == "end" and tok[1] in ("body", "col", "colgroup", "html", "tbody",
                                 "td", "tfoot", "th", "thead", "tr"):
        return
    _MODE_DISPATCH["in_body"](tb, tok)


def _mode_in_column_group(tb: TreeBuilder, tok) -> None:
    k = tok[0]
    if k == "comment":
        tb._insert_comment(tok[1])
        return
    if k == "doctype":
        return
    if k == "start":
        if tok[1] == "html":
            tb.arena.add_attrs_if_missing(tb.stack[0], tok[2])
            return
        if tok[1] == "col":
            tb._insert_element("col", tok[2], push=False)
            return
        if tok[1] == "template":
            _MODE_DISPATCH["in_head"](tb, tok)
            return
    if k == "end":
        if tok[1] == "colgroup":
            if tb._name(tb._current()) == "colgroup":
                tb.stack.pop()
                tb.mode = "in_table"
            return
        if tok[1] == "col":
            return
        if tok[1] == "template":
            tb._end_template()
            return
    if tok[0] == "__text__":
        pass
    if tb._name(tb._current()) == "colgroup":
        tb.stack.pop()
        tb.mode = "in_table"
        if tok[0] == "__text__":
            tb._process_text(tok[1])
        else:
            _MODE_DISPATCH["in_table"](tb, tok)


def _mode_in_table_body(tb: TreeBuilder, tok) -> None:
    k = tok[0]
    if k == "start":
        name = tok[1]
        if name == "tr":
            _clear_stack_to(tb, _TBODY_CTX)
            tb._insert_element("tr", tok[2])
            tb.mode = "in_row"
            return
        if name in ("td", "th"):
            _clear_stack_to(tb, _TBODY_CTX)
            tb._insert_element("tr", [])
            tb.mode = "in_row"
            _MODE_DISPATCH["in_row"](tb, tok)
            return
        if name in ("caption", "col", "colgroup", "tbody", "tfoot", "thead"):
            if tb._in_scope(_TABLE_SECTIONS, _TABLE_SCOPE):
                _clear_stack_to(tb, _TBODY_CTX)
                tb.stack.pop()
                tb.mode = "in_table"
                _MODE_DISPATCH["in_table"](tb, tok)
            return
    if k == "end":
        name = tok[1]
        if name in _TABLE_SECTIONS:
            if tb._in_scope(name, _TABLE_SCOPE):
                _clear_stack_to(tb, _TBODY_CTX)
                tb.stack.pop()
                tb.mode = "in_table"
            return
        if name == "table":
            if tb._in_scope(_TABLE_SECTIONS, _TABLE_SCOPE):
                _clear_stack_to(tb, _TBODY_CTX)
                tb.stack.pop()
                tb.mode = "in_table"
                _MODE_DISPATCH["in_table"](tb, tok)
            return
        if name in ("body", "caption", "col", "colgroup", "html", "td",
                    "th", "tr"):
            return
    _MODE_DISPATCH["in_table"](tb, tok)


def _mode_in_row(tb: TreeBuilder, tok) -> None:
    k = tok[0]
    if k == "start" and tok[1] in ("td", "th"):
        _clear_stack_to(tb, _TR_CTX)
        tb._insert_element(tok[1], tok[2])
        tb.mode = "in_cell"
        tb.afe.append(MARKER)
        return
    if k == "end" and tok[1] == "tr":
        if tb._in_scope("tr", _TABLE_SCOPE):
            _clear_stack_to(tb, _TR_CTX)
            tb.stack.pop()
            tb.mode = "in_table_body"
        return
    if ((k == "start" and tok[1] in ("caption", "col", "colgroup", "tbody",
                                     "tfoot", "thead", "tr"))
            or (k == "end" and tok[1] == "table")):
        if tb._in_scope("tr", _TABLE_SCOPE):
            _clear_stack_to(tb, _TR_CTX)
            tb.stack.pop()
            tb.mode = "in_table_body"
            _MODE_DISPATCH["in_table_body"](tb, tok)
        return
    if k == "end" and tok[1] in _TABLE_SECTIONS:
        if tb._in_scope(tok[1], _TABLE_SCOPE):
            if tb._in_scope("tr", _TABLE_SCOPE):
                _clear_stack_to(tb, _TR_CTX)
                tb.stack.pop()
                tb.mode = "in_table_body"
                _MODE_DISPATCH["in_table_body"](tb, tok)
        return
    if k == "end" and tok[1] in ("body", "caption", "col", "colgroup",
                                 "html", "td", "th"):
        return
    _MODE_DISPATCH["in_table"](tb, tok)


def _close_cell(tb: TreeBuilder) -> None:
    tb._generate_implied_end_tags()
    tb._pop_until(("td", "th"))
    tb._afe_clear_to_marker()
    tb.mode = "in_row"


def _mode_in_cell(tb: TreeBuilder, tok) -> None:
    k = tok[0]
    if k == "end" and tok[1] in ("td", "th"):
        if tb._in_scope(tok[1], _TABLE_SCOPE):
            _close_cell(tb)
        return
    if k == "start" and tok[1] in ("caption", "col", "colgroup", "tbody",
                                   "td", "tfoot", "th", "thead", "tr"):
        if tb._in_scope(("td", "th"), _TABLE_SCOPE):
            _close_cell(tb)
            _MODE_DISPATCH[tb.mode](tb, tok)
        return
    if k == "end" and tok[1] in ("body", "caption", "col", "colgroup",
                                 "html"):
        return
    if k == "end" and tok[1] in ("table", "tbody", "tfoot", "thead", "tr"):
        if tb._in_scope(tok[1], _TABLE_SCOPE):
            _close_cell(tb)
            _MODE_DISPATCH[tb.mode](tb, tok)
        return
    _MODE_DISPATCH["in_body"](tb, tok)


def _mode_in_select(tb: TreeBuilder, tok) -> None:
    k = tok[0]
    if k == "comment":
        tb._insert_comment(tok[1])
        return
    if k == "doctype":
        return
    if k == "start":
        name = tok[1]
        if name == "html":
            tb.arena.add_attrs_if_missing(tb.stack[0], tok[2])
            return
        if name == "option":
            if tb._name(tb._current()) == "option":
                tb.stack.pop()
            tb._insert_element("option", tok[2])
            return
        if name == "optgroup":
            if tb._name(tb._current()) == "option":
                tb.stack.pop()
            if tb._name(tb._current()) == "optgroup":
                tb.stack.pop()
            tb._insert_element("optgroup", tok[2])
            return
        if name == "select":
            # parse error; fragment case: no select in select scope →
            # ignore instead of draining the synthetic root
            if tb._select_in_select_scope():
                tb._pop_until("select")
                tb.mode = tb._reset_mode()
            return
        if name == "hr":
            # current WHATWG (browsers ship it): <hr> is a separator
            # inside select — pop any open option/optgroup, insert,
            # pop immediately (void)
            if tb._name(tb._current()) == "option":
                tb.stack.pop()
            if tb._name(tb._current()) == "optgroup":
                tb.stack.pop()
            tb._insert_element("hr", tok[2], push=False)
            return
        if name in ("input", "keygen", "textarea"):
            if not tb._select_in_select_scope():
                return  # parse error, fragment case
            tb._pop_until("select")
            tb.mode = tb._reset_mode()
            _MODE_DISPATCH[tb.mode](tb, tok)
            return
        if name in ("script", "template"):
            _MODE_DISPATCH["in_head"](tb, tok)
            return
        if name in _SELECT_TABLE_STRUCTURE and any(
                tb._name(nid) == "table" for nid in tb.stack):
            # spec "in select in table" mode: a table-structure start
            # tag closes the select and reprocesses (html5ever
            # InSelectInTable; the select was opened inside a table)
            tb.arena.errors.append("unexpected-start-tag-in-select")
            if not tb._select_in_select_scope():
                return
            tb._pop_until("select")
            tb.mode = tb._reset_mode()
            _MODE_DISPATCH[tb.mode](tb, tok)
            return
        return
    if k == "end":
        name = tok[1]
        if name == "option":
            if tb._name(tb._current()) == "option":
                tb.stack.pop()
            return
        if name == "optgroup":
            # spec: pop the open option ONLY when the node immediately
            # before it on the stack is an optgroup; `</optgroup>` with
            # <select><option> open is a parse error and ignored (the
            # option stays open, following text lands inside it)
            if (tb._name(tb._current()) == "option"
                    and len(tb.stack) >= 2
                    and tb._name(tb.stack[-2]) == "optgroup"):
                tb.stack.pop()
            if tb._name(tb._current()) == "optgroup":
                tb.stack.pop()
            else:
                tb.arena.errors.append("unexpected-end-tag")
            return
        if name == "select":
            if tb._select_in_select_scope():
                tb._pop_until("select")
                tb.mode = tb._reset_mode()
            return
        if name == "template":
            tb._end_template()
            return
        if name in _SELECT_TABLE_STRUCTURE and any(
                tb._name(nid) == "table" for nid in tb.stack):
            # "in select in table" end-tag rule: close + reprocess only
            # when the named element is in table scope
            if tb._in_scope(name, _TABLE_SCOPE) \
                    and tb._select_in_select_scope():
                tb._pop_until("select")
                tb.mode = tb._reset_mode()
                _MODE_DISPATCH[tb.mode](tb, tok)
            return
        return


def _mode_in_template(tb: TreeBuilder, tok) -> None:
    """The spec's "in template" insertion mode: head-ish tags via
    in-head rules; table-structure start tags re-route by REPLACING the
    current template insertion mode and reprocessing; everything else
    routes to in-body. (Character tokens take the in_body path in
    _process_text's default branch.)"""
    k = tok[0]
    if k == "comment":
        tb._insert_comment(tok[1])
        return
    if k == "doctype":
        return
    if k == "start":
        name = tok[1]
        if name in ("base", "basefont", "bgsound", "link", "meta",
                    "noframes", "script", "style", "template", "title"):
            _mode_in_head(tb, tok)
            return
        if name in ("caption", "colgroup", "tbody", "tfoot", "thead"):
            new = "in_table"
        elif name == "col":
            new = "in_column_group"
        elif name == "tr":
            new = "in_table_body"
        elif name in ("td", "th"):
            new = "in_row"
        else:
            new = "in_body"
        if tb.template_modes:
            tb.template_modes[-1] = new  # pop + push
        tb.mode = new
        _MODE_DISPATCH[new](tb, tok)
        return
    if k == "end":
        if tok[1] == "template":
            tb._end_template()
            return
        _MODE_DISPATCH["in_body"](tb, tok)
        return


def _mode_after_body(tb: TreeBuilder, tok) -> None:
    k = tok[0]
    if k == "comment":
        tb._insert_comment(tok[1], parent=tb.stack[0])
        return
    if k == "doctype":
        return
    if k == "end" and tok[1] == "html":
        tb.mode = "after_after_body"
        return
    if k == "start" and tok[1] == "html":
        tb.arena.add_attrs_if_missing(tb.stack[0], tok[2])
        return
    tb.mode = "in_body"
    _MODE_DISPATCH["in_body"](tb, tok)


def _mode_text(tb: TreeBuilder, tok) -> None:
    """Spec "text" insertion mode: inside a rawtext/rcdata element the
    only tokens the tokenizer can emit are its text and its end tag."""
    if tok[0] == "end":
        if tb.stack:
            tb.stack.pop()
        tb.mode = tb.original_mode
        return
    # anything unexpected: restore and reprocess
    if tb.stack and tb._name(tb._current()) in _TEXT_MODE_TAGS:
        tb.stack.pop()
    tb.mode = tb.original_mode
    _MODE_DISPATCH[tb.mode](tb, tok)


def _mode_after_after_body(tb: TreeBuilder, tok) -> None:
    k = tok[0]
    if k == "comment":
        tb._insert_comment(tok[1], parent=0)
        return
    if k == "doctype":
        return
    if k == "start" and tok[1] == "html":
        tb.arena.add_attrs_if_missing(tb.stack[0], tok[2])
        return
    tb.mode = "in_body"
    _MODE_DISPATCH["in_body"](tb, tok)


def _mode_in_frameset(tb: TreeBuilder, tok) -> None:
    k = tok[0]
    if k == "comment":
        tb._insert_comment(tok[1])
        return
    if k == "doctype":
        return
    if k == "start":
        name = tok[1]
        if name == "html":
            tb.arena.add_attrs_if_missing(tb.stack[0], tok[2])
            return
        if name == "frameset":
            tb._insert_element("frameset", tok[2])
            return
        if name == "frame":
            tb._insert_element("frame", tok[2], push=False)
            return
        if name == "noframes":
            _MODE_DISPATCH["in_head"](tb, tok)
            return
        return  # anything else: ignore
    if k == "end":
        if tok[1] == "frameset":
            if len(tb.stack) > 1 and tb._name(tb._current()) == "frameset":
                tb.stack.pop()
            if tb._name(tb._current()) != "frameset":
                tb.mode = "after_frameset"
            return
        if tok[1] == "noframes":
            _MODE_DISPATCH["in_head"](tb, tok)
        return


def _mode_after_frameset(tb: TreeBuilder, tok) -> None:
    k = tok[0]
    if k == "comment":
        tb._insert_comment(tok[1])
        return
    if k == "start":
        if tok[1] == "html":
            tb.arena.add_attrs_if_missing(tb.stack[0], tok[2])
        elif tok[1] == "noframes":
            _MODE_DISPATCH["in_head"](tb, tok)
        return
    if k == "end":
        if tok[1] == "html":
            tb.mode = "after_after_frameset"
        elif tok[1] == "noframes":
            _MODE_DISPATCH["in_head"](tb, tok)
        return


def _mode_after_after_frameset(tb: TreeBuilder, tok) -> None:
    k = tok[0]
    if k == "comment":
        tb._insert_comment(tok[1], parent=0)
        return
    if k == "start":
        if tok[1] == "html":
            tb.arena.add_attrs_if_missing(tb.stack[0], tok[2])
        elif tok[1] == "noframes":
            _MODE_DISPATCH["in_head"](tb, tok)
        return
    # everything else ignored


_MODE_DISPATCH = {
    "initial": _mode_initial,
    "before_html": _mode_before_html,
    "before_head": _mode_before_head,
    "in_head": _mode_in_head,
    "after_head": _mode_after_head,
    "in_body": _mode_in_body,
    "in_table": _mode_in_table,
    "in_caption": _mode_in_caption,
    "in_column_group": _mode_in_column_group,
    "in_table_body": _mode_in_table_body,
    "in_row": _mode_in_row,
    "in_cell": _mode_in_cell,
    "in_select": _mode_in_select,
    "in_template": _mode_in_template,
    "text": _mode_text,
    "after_body": _mode_after_body,
    "after_after_body": _mode_after_after_body,
    "in_frameset": _mode_in_frameset,
    "after_frameset": _mode_after_frameset,
    "after_after_frameset": _mode_after_after_frameset,
}


def parse_document(html: str) -> Arena:
    """Parse a complete HTML document (WHATWG tree construction),
    mirroring ``Document::from`` (src/document.rs:40-56)."""
    return TreeBuilder().parse(html)


def parse_fragment(html: str, context: str = "body") -> Arena:
    """Parse an HTML fragment; content hangs under the ``html`` root
    element (id 1), mirroring ``parse_html!`` (src/manipulation.rs:13-33,
    context element name "", doctype dropped)."""
    return TreeBuilder(fragment_context=context).parse(html)
