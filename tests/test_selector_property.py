"""Property test: the selector engine vs an exhaustive naive matcher.

Hypothesis generates random small element trees (built directly on the
Arena, so parser tree-construction rules can't mask selector bugs) and
random grammar-valid selectors; the engine's `select()` must return
exactly the nodes a from-the-CSS-spec brute-force evaluator returns,
in document order. Locks the subtlest §2.3 semantics (right-to-left
combinator hops, sibling element filtering, nth-child indexing, dedup
order) against refactors.
"""

from __future__ import annotations

import pytest

try:
    from hypothesis import given, settings, strategies as st
except ImportError:  # pragma: no cover
    pytest.skip("hypothesis not installed", allow_module_level=True)

from nipper_spark.html.arena import Arena, ELEMENT, TEXT
from nipper_spark.html.selector import Matcher, select

TAGS = ["div", "p", "span", "a", "b"]
CLASSES = ["x", "y", "z"]


# ----------------------------------------------------------------------
# random tree → Arena
# ----------------------------------------------------------------------

@st.composite
def trees(draw):
    """Nested spec: (tag, class_or_None, children). Small + deep enough
    for sibling/ancestor combinators to matter."""
    def node(depth):
        tag = draw(st.sampled_from(TAGS))
        cls = draw(st.one_of(st.none(), st.sampled_from(CLASSES)))
        kids = []
        if depth < 3:
            for _ in range(draw(st.integers(0, 3))):
                if draw(st.booleans()):
                    kids.append(("#text",))
                else:
                    kids.append(node(depth + 1))
        return (tag, cls, kids)
    return node(0)


def build_arena(spec) -> Arena:
    a = Arena()
    html = a.new_element("html")
    a.append_child(0, html)
    counter = [0]

    def add(parent, node):
        if node[0] == "#text":
            a.append_child(parent, a.new_text("t"))
            return
        tag, cls, kids = node
        attrs = [["id", f"n{counter[0]}"]]
        counter[0] += 1
        if cls:
            attrs.append(["class", cls])
        nid = a.new_element(tag, attrs)
        a.append_child(parent, nid)
        for k in kids:
            add(nid, k)

    add(html, spec)
    return a


# ----------------------------------------------------------------------
# random grammar-valid selectors
# ----------------------------------------------------------------------

@st.composite
def compounds(draw):
    parts = []
    base = draw(st.sampled_from(TAGS + ["*", ""]))
    if base:
        parts.append(base)
    if draw(st.booleans()):
        parts.append("." + draw(st.sampled_from(CLASSES)))
    if draw(st.booleans()):
        parts.append(draw(st.sampled_from(
            [":first-child", ":last-child", ":only-child", ":empty",
             ":nth-child(2)", ":nth-child(2n+1)", ":first-of-type",
             ":nth-of-type(2)"])))
    if not parts:
        parts.append("*")
    return "".join(parts)


@st.composite
def selectors(draw):
    n = draw(st.integers(1, 3))
    out = [draw(compounds())]
    for _ in range(n - 1):
        comb = draw(st.sampled_from([" ", " > ", " + ", " ~ "]))
        out.append(comb)
        out.append(draw(compounds()))
    return "".join(out)


# ----------------------------------------------------------------------
# naive matcher (independent re-implementation from the CSS spec)
# ----------------------------------------------------------------------

def _elem_siblings(a: Arena, nid: int) -> list[int]:
    p = a.parent[nid]
    return [c for c in a.children_of(p) if a.kind[c] == ELEMENT]


def naive_compound(a: Arena, nid: int, compound: str) -> bool:
    if a.kind[nid] != ELEMENT:
        return False
    rest = compound
    # leading tag / universal
    tag = ""
    while rest and rest[0] not in ".:#":
        tag += rest[0]
        rest = rest[1:]
    if tag and tag != "*" and a.name[nid] != tag:
        return False
    while rest:
        if rest.startswith("."):
            end = len(rest)
            for i, ch in enumerate(rest[1:], 1):
                if ch in ".:#":
                    end = i
                    break
            cls = rest[1:end]
            classes = (dict(a.attrs[nid]).get("class") or "").split()
            if cls not in classes:
                return False
            rest = rest[end:]
        elif rest.startswith(":"):
            end = len(rest)
            depth = 0
            for i, ch in enumerate(rest[1:], 1):
                if ch == "(":
                    depth += 1
                elif ch == ")":
                    depth -= 1
                elif ch in ".:#" and depth == 0:
                    end = i
                    break
            pseudo = rest[1:end]
            rest = rest[end:]
            sibs = _elem_siblings(a, nid)
            of_type = [s for s in sibs if a.name[s] == a.name[nid]]
            if pseudo == "first-child":
                if sibs[0] != nid:
                    return False
            elif pseudo == "last-child":
                if sibs[-1] != nid:
                    return False
            elif pseudo == "only-child":
                if len(sibs) != 1:
                    return False
            elif pseudo == "empty":
                if any(a.kind[c] in (ELEMENT, TEXT)
                       for c in a.children_of(nid)):
                    return False
            elif pseudo == "nth-child(2)":
                if sibs.index(nid) + 1 != 2:
                    return False
            elif pseudo == "nth-child(2n+1)":
                if (sibs.index(nid) + 1) % 2 != 1:
                    return False
            elif pseudo == "first-of-type":
                if of_type[0] != nid:
                    return False
            elif pseudo == "nth-of-type(2)":
                if of_type.index(nid) + 1 != 2:
                    return False
            else:  # pragma: no cover
                raise AssertionError(pseudo)
        else:  # pragma: no cover
            raise AssertionError(rest)
    return True


def naive_match(a: Arena, nid: int, sel: str) -> bool:
    # tokenize into compounds + combinators. The generator always emits
    # combinators as standalone space-separated tokens, so a plain
    # whitespace split is unambiguous (padding "+" would corrupt the
    # "+" inside :nth-child(2n+1)).
    parts: list[str] = sel.split()
    # merge: [c0, comb, c1, ...] where plain adjacency = descendant
    seq: list[tuple[str, str]] = []  # (combinator-before, compound)
    comb = ""
    for p in parts:
        if p in (">", "+", "~"):
            comb = p
        else:
            seq.append((comb, p))
            comb = " "
    def match_at(i: int, node: int) -> bool:
        comb_before, compound = seq[i]
        if not naive_compound(a, node, compound):
            return False
        if i == 0:
            return True
        prev_comb = seq[i][0]
        if prev_comb == " ":
            anc = a.parent[node]
            while anc != -1:
                if match_at(i - 1, anc):
                    return True
                anc = a.parent[anc]
            return False
        if prev_comb == ">":
            p = a.parent[node]
            return p != -1 and match_at(i - 1, p)
        sibs = _elem_siblings(a, node)
        k = sibs.index(node)
        if prev_comb == "+":
            return k > 0 and match_at(i - 1, sibs[k - 1])
        if prev_comb == "~":
            return any(match_at(i - 1, s) for s in sibs[:k])
        raise AssertionError(prev_comb)  # pragma: no cover
    return match_at(len(seq) - 1, nid)


def naive_select(a: Arena, sel: str) -> list[int]:
    return [nid for nid in a.descendants(0, include_self=True)
            if naive_match(a, nid, sel)]


# ----------------------------------------------------------------------
# the property
# ----------------------------------------------------------------------

@settings(max_examples=300, deadline=None)
@given(trees(), selectors())
def test_engine_equals_naive(spec, sel):
    a = build_arena(spec)
    got = select(a, [0], Matcher(sel), include_roots=True)
    want = naive_select(a, sel)
    assert got == want, (sel, got, want)
