"""CSS selector compiler + matcher over the arena DOM.

From-scratch implementation of the selector subset the reference
supports via the Servo ``selectors`` crate (src/matcher.rs:19-38,
src/element.rs:13-218):

- type / universal selectors, ``#id`` (case-sensitive), ``.class``
  (whitespace-split exact token), attribute selectors with all CSS
  operators ``= ~= |= ^= $= *=``;
- combinators: descendant, ``>``, ``+``, ``~`` (element-sibling hops,
  matching right-to-left like the selectors crate);
- selector groups ``a, b``;
- tree-structural pseudo-classes ``:nth-child(an+b) :nth-last-child
  :first-child :last-child :only-child :nth-of-type :first-of-type
  :last-of-type :empty :root``;
- non-tree-structural pseudo-classes (``:hover`` …) parse but never
  match (src/element.rs:113-123); pseudo-elements likewise
  (src/element.rs:125-131); ``:not(...)`` of compounds is supported.

Faithful quirks kept: ``:empty`` = no element or text child
(src/element.rs:207-212); ``:root`` matches the *Document* node, not
``<html>`` (src/element.rs:215-217). One deliberate deviation: the
universal selector matches elements only (the reference's matcher
would let bare ``*``/``:empty`` report text nodes — a latent bug no
fixture relies on).

Invalid selectors raise :class:`SelectorError` (maps to the
reference's panic in ``select`` / ``None`` in ``try_select``).
"""

from __future__ import annotations

import re

from nipper_spark.html.arena import Arena, DOCUMENT, ELEMENT, NIL, TEXT

__all__ = ["SelectorError", "compile_selector", "Matcher", "select"]


class SelectorError(ValueError):
    """Raised for selectors the grammar rejects."""


_IDENT_RE = re.compile(r"-?[_a-zA-Z\u0080-\uffff][-_a-zA-Z0-9\u0080-\uffff]*")
_WS_RE = re.compile(r"[ \t\n\f]+")
_STRING_RE = re.compile(r'"([^"]*)"|\'([^\']*)\'')
_ANB_RE = re.compile(r"^([+-]?\d*)n(?:\s*([+-])\s*(\d+))?$")

# pseudo-classes that parse but never match (non-tree-structural,
# src/element.rs:113-123)
_NEVER_PSEUDOS = frozenset(
    ["hover", "active", "focus", "visited", "link", "any-link", "checked",
     "disabled", "enabled", "target", "focus-within", "indeterminate",
     "read-only", "read-write", "placeholder-shown", "default",
     "fullscreen", "defined"])

_STRUCT_PSEUDOS = frozenset(
    ["first-child", "last-child", "only-child", "empty", "root",
     "first-of-type", "last-of-type", "only-of-type"])


# ----------------------------------------------------------------------
# parsing
# ----------------------------------------------------------------------

class _Parser:
    def __init__(self, s: str) -> None:
        self.s = s
        self.pos = 0
        self.n = len(s)

    def error(self, msg: str) -> SelectorError:
        return SelectorError("%s at %d in %r" % (msg, self.pos, self.s))

    def skip_ws(self) -> bool:
        m = _WS_RE.match(self.s, self.pos)
        if m:
            self.pos = m.end()
            return True
        return False

    def eof(self) -> bool:
        return self.pos >= self.n

    def peek(self) -> str:
        return self.s[self.pos] if self.pos < self.n else ""

    def ident(self) -> str:
        m = _IDENT_RE.match(self.s, self.pos)
        if not m:
            raise self.error("expected identifier")
        self.pos = m.end()
        return m.group(0)

    # ---- grammar ----
    def selector_list(self) -> list:
        out = [self.complex_selector()]
        self.skip_ws()
        while self.peek() == ",":
            self.pos += 1
            self.skip_ws()
            out.append(self.complex_selector())
            self.skip_ws()
        if not self.eof():
            raise self.error("trailing input")
        return out

    def complex_selector(self) -> list:
        """Returns the chain rightmost-first:
        [compound_rightmost, (comb, compound), (comb, compound), ...]"""
        self.skip_ws()
        parts = [(None, self.compound())]
        while True:
            had_ws = self.skip_ws()
            ch = self.peek()
            if ch and ch in ">+~":
                self.pos += 1
                self.skip_ws()
                comb = ch
            elif had_ws and not self.eof() and ch not in ",)":
                comb = " "
            else:
                break
            parts.append((comb, self.compound()))
        # rightmost-first chain: [(comb_to_left, left_compound), ...]
        rightmost = parts[-1][1]
        chain = []
        for i in range(len(parts) - 1, 0, -1):
            comb = parts[i][0]
            left = parts[i - 1][1]
            chain.append((comb, left))
        return [rightmost, chain]

    def compound(self) -> list:
        tests: list = []
        ch = self.peek()
        if ch == "*":
            self.pos += 1
            tests.append(("universal",))
        elif _IDENT_RE.match(self.s, self.pos):
            tests.append(("tag", self.ident().lower()))
        while not self.eof():
            ch = self.peek()
            if ch == "#":
                self.pos += 1
                tests.append(("id", self.ident()))
            elif ch == ".":
                self.pos += 1
                tests.append(("class", self.ident()))
            elif ch == "[":
                tests.append(self.attr_selector())
            elif ch == ":":
                tests.append(self.pseudo())
            else:
                break
        if not tests:
            raise self.error("empty compound selector")
        return tests

    def attr_selector(self):
        self.pos += 1  # '['
        self.skip_ws()
        name = self.ident().lower()
        self.skip_ws()
        ch = self.peek()
        if ch == "]":
            self.pos += 1
            return ("attr", name, None, None)
        op = None
        if ch == "=":
            op = "="
            self.pos += 1
        elif ch and ch in "~|^$*" and self.s[self.pos + 1: self.pos + 2] == "=":
            op = ch + "="
            self.pos += 2
        else:
            raise self.error("bad attribute operator")
        self.skip_ws()
        m = _STRING_RE.match(self.s, self.pos)
        if m:
            value = m.group(1) if m.group(1) is not None else m.group(2)
            self.pos = m.end()
        else:
            value = self.ident()
        self.skip_ws()
        # case-insensitivity flag (accept and ignore 's'; honor 'i')
        ci = False
        if self.peek() and self.peek() in "iIsS":
            flag = self.peek().lower()
            self.pos += 1
            ci = flag == "i"
            self.skip_ws()
        if self.peek() != "]":
            raise self.error("expected ]")
        self.pos += 1
        if ci:
            return ("attr-ci", name, op, value.lower())
        return ("attr", name, op, value)

    def pseudo(self):
        self.pos += 1  # ':'
        if self.peek() == ":":
            # pseudo-element: parses, never matches
            self.pos += 1
            self.ident()
            return ("never",)
        name = self.ident().lower()
        if self.peek() == "(":
            self.pos += 1
            depth = 1
            start = self.pos
            while self.pos < self.n and depth:
                c = self.s[self.pos]
                if c == "(":
                    depth += 1
                elif c == ")":
                    depth -= 1
                self.pos += 1
            if depth:
                raise self.error("unbalanced parens")
            arg = self.s[start:self.pos - 1].strip()
            if name in ("nth-child", "nth-last-child", "nth-of-type",
                        "nth-last-of-type"):
                a, b = _parse_anb(arg, self)
                return (name, a, b)
            if name == "not":
                inner = _Parser(arg)
                inner.skip_ws()
                compound = inner.compound()
                inner.skip_ws()
                if not inner.eof():
                    raise self.error(":not argument too complex")
                return ("not", compound)
            if name in ("lang", "dir"):
                return ("never",)
            raise self.error("unsupported functional pseudo :%s" % name)
        if name in _STRUCT_PSEUDOS:
            return (name,)
        if name in _NEVER_PSEUDOS:
            return ("never",)
        raise self.error("unknown pseudo-class :%s" % name)


def _parse_anb(arg: str, p: _Parser):
    s = arg.strip().lower()
    if s == "odd":
        return 2, 1
    if s == "even":
        return 2, 0
    m = _ANB_RE.match(s)
    if m:
        coef = m.group(1)
        if coef in ("", "+"):
            a = 1
        elif coef == "-":
            a = -1
        else:
            a = int(coef)
        b = 0
        if m.group(3) is not None:
            b = int(m.group(3))
            if m.group(2) == "-":
                b = -b
        return a, b
    try:
        return 0, int(s)
    except ValueError:
        raise p.error("bad an+b expression %r" % arg) from None


def compile_selector(sel: str) -> list:
    """Parse a selector group string → matcher program.
    Raises SelectorError on invalid input (incl. empty string)."""
    if sel is None or sel.strip() == "":
        raise SelectorError("empty selector")
    return _Parser(sel).selector_list()


class Matcher:
    """Compiled, reusable selector (cf. Matcher, src/matcher.rs:13-24;
    reuse across documents per src/traversal.rs:53-58)."""

    __slots__ = ("source", "program")

    def __init__(self, sel: str) -> None:
        self.source = sel
        self.program = compile_selector(sel)

    def match_node(self, arena: Arena, nid: int) -> bool:
        return any(_match_complex(arena, nid, c) for c in self.program)


# ----------------------------------------------------------------------
# matching
# ----------------------------------------------------------------------

def _parent_element(arena: Arena, nid: int) -> int:
    p = arena.parent[nid]
    if p != NIL and arena.kind[p] == ELEMENT:
        return p
    return NIL


def _match_compound(arena: Arena, nid: int, compound: list) -> bool:
    kind = arena.kind[nid]
    for t in compound:
        op = t[0]
        if op == "root":
            # faithful quirk: :root == is_document (src/element.rs:215-217)
            if kind != DOCUMENT:
                return False
            continue
        if op == "never":
            return False
        if kind != ELEMENT:
            return False
        if op == "empty":
            # elements only (documented deviation from the reference's
            # text-nodes-in-the-match-stream latent bug, header above)
            if any(arena.kind[c] in (ELEMENT, TEXT)
                   for c in arena.children_of(nid)):
                return False
            continue
        if op == "tag":
            nm = arena.name[nid]
            if nm != t[1]:
                # foreign elements store adjusted case (foreignObject);
                # HTML-document type selectors match case-insensitively
                if not (arena.ns and nm is not None
                        and nm.lower() == t[1]):
                    return False
        elif op == "universal":
            pass
        elif op == "id":
            if arena.get_attr(nid, "id") != t[1]:
                return False
        elif op == "class":
            if not arena.has_class_token(nid, t[1]):
                return False
        elif op == "attr" or op == "attr-ci":
            val = arena.get_attr(nid, t[1])
            if val is None:
                return False
            aop, target = t[2], t[3]
            if aop is None:
                continue
            if op == "attr-ci":
                val = val.lower()
            if aop == "=":
                if val != target:
                    return False
            elif aop == "~=":
                if not target or target.split() != [target] or \
                        target not in val.split():
                    return False
            elif aop == "|=":
                if not (val == target or val.startswith(target + "-")):
                    return False
            elif aop == "^=":
                if not target or not val.startswith(target):
                    return False
            elif aop == "$=":
                if not target or not val.endswith(target):
                    return False
            elif aop == "*=":
                if not target or target not in val:
                    return False
        elif op == "nth-child":
            if not _match_anb(_child_pos(arena, nid, False, False),
                              t[1], t[2]):
                return False
        elif op == "nth-last-child":
            if not _match_anb(_child_pos(arena, nid, True, False),
                              t[1], t[2]):
                return False
        elif op == "nth-of-type":
            if not _match_anb(_child_pos(arena, nid, False, True),
                              t[1], t[2]):
                return False
        elif op == "nth-last-of-type":
            if not _match_anb(_child_pos(arena, nid, True, True),
                              t[1], t[2]):
                return False
        elif op == "first-child":
            if _child_pos(arena, nid, False, False) != 1:
                return False
        elif op == "last-child":
            if _child_pos(arena, nid, True, False) != 1:
                return False
        elif op == "only-child":
            if _child_pos(arena, nid, False, False) != 1 or \
                    _child_pos(arena, nid, True, False) != 1:
                return False
        elif op == "first-of-type":
            if _child_pos(arena, nid, False, True) != 1:
                return False
        elif op == "last-of-type":
            if _child_pos(arena, nid, True, True) != 1:
                return False
        elif op == "only-of-type":
            if _child_pos(arena, nid, False, True) != 1 or \
                    _child_pos(arena, nid, True, True) != 1:
                return False
        elif op == "not":
            if _match_compound(arena, nid, t[1]):
                return False
        else:  # pragma: no cover
            return False
    return True


def _child_pos(arena: Arena, nid: int, from_end: bool, of_type: bool) -> int:
    """1-based position among element siblings (of same type when
    ``of_type``), counting forward or backward."""
    pos = 1
    name = arena.name[nid]
    step = arena.next_element_sibling if from_end else \
        arena.prev_element_sibling
    s = step(nid)
    while s != NIL:
        if not of_type or arena.name[s] == name:
            pos += 1
        s = step(s)
    return pos


def _match_anb(pos: int, a: int, b: int) -> bool:
    if a == 0:
        return pos == b
    delta = pos - b
    if a > 0:
        return delta >= 0 and delta % a == 0
    return delta <= 0 and delta % a == 0


def _match_complex(arena: Arena, nid: int, complex_sel: list) -> bool:
    rightmost, chain = complex_sel
    if not _match_compound(arena, nid, rightmost):
        return False
    return _match_chain(arena, nid, chain, 0)


def _match_chain(arena: Arena, nid: int, chain: list, idx: int) -> bool:
    if idx == len(chain):
        return True
    comb, compound = chain[idx]
    if comb == ">":
        p = _parent_element(arena, nid)
        if p == NIL:
            return False
        return _match_compound(arena, p, compound) and \
            _match_chain(arena, p, chain, idx + 1)
    if comb == " ":
        p = _parent_element(arena, nid)
        while p != NIL:
            if _match_compound(arena, p, compound) and \
                    _match_chain(arena, p, chain, idx + 1):
                return True
            p = _parent_element(arena, p)
        return False
    if comb == "+":
        s = arena.prev_element_sibling(nid)
        if s == NIL:
            return False
        return _match_compound(arena, s, compound) and \
            _match_chain(arena, s, chain, idx + 1)
    if comb == "~":
        s = arena.prev_element_sibling(nid)
        while s != NIL:
            if _match_compound(arena, s, compound) and \
                    _match_chain(arena, s, chain, idx + 1):
                return True
            s = arena.prev_element_sibling(s)
        return False
    return False  # pragma: no cover


def select(arena: Arena, roots: list[int], matcher: Matcher,
           include_roots: bool) -> list[int]:
    """Pre-order DFS match with cross-root dedup, first-occurrence order
    — the Matches::next contract (src/matcher.rs:83-123):
    ``include_roots`` ⇔ MatchScope::IncludeNode vs ChildrenOnly."""
    out: list[int] = []
    seen: set[int] = set()
    program = matcher.program
    for root in roots:
        for nid in arena.descendants(root, include_self=include_roots):
            if nid in seen:
                continue
            for c in program:
                if _match_complex(arena, nid, c):
                    seen.add(nid)
                    out.append(nid)
                    break
    return out
