"""Property-based robustness: at crawl scale the parser sees arbitrary
bytes; it must never crash, and parse∘serialize must be idempotent
(serializing a parsed tree and re-parsing yields the same serialization
— the fixpoint html5ever's own golden tests rely on)."""

from hypothesis import given, settings
from hypothesis import strategies as st

from nipper_spark.html import Document, parse_document
from nipper_spark.html.serializer import serialize

# HTML-ish soup: tags, attrs, entities, brackets, quotes, unicode
_soup = st.text(
    alphabet=st.sampled_from(
        list("<>/=\"' &;#abcdiv123!?-\n\tp\xa0漢\U0001f600")),
    max_size=200)

_structured = st.recursive(
    st.sampled_from(["text", "&amp;", "&#65;", "x\xa0y", "<br>", "<!--c-->"]),
    lambda inner: st.tuples(
        st.sampled_from(["div", "p", "span", "b", "i", "table", "td",
                         "ul", "li", "pre", "script"]),
        st.lists(inner, max_size=3)).map(
        lambda t: "<%s>%s</%s>" % (t[0], "".join(t[1]), t[0])),
    max_leaves=10)


@settings(max_examples=150, deadline=None)
@given(_soup)
def test_parser_never_crashes_on_soup(s):
    doc = Document.from_html(s)
    doc.html()
    doc.select("div, p, a[href], :empty").text()


@settings(max_examples=100, deadline=None)
@given(_structured)
def test_parse_serialize_idempotent(s):
    arena1 = parse_document(s)
    out1 = serialize(arena1, 0, include_node=True)
    arena2 = parse_document(out1)
    out2 = serialize(arena2, 0, include_node=True)
    assert out1 == out2


@settings(max_examples=100, deadline=None)
@given(st.binary(max_size=120))
def test_parser_handles_arbitrary_bytes(b):
    doc = Document.from_html(b)
    doc.html()


@settings(max_examples=150, deadline=None)
@given(_soup)
def test_selector_errors_are_selector_errors(s):
    """Arbitrary selector strings either parse or raise SelectorError —
    never anything else (try_select's contract)."""
    doc = Document.from_html("<p>x</p>")
    doc.try_select(s)  # must not raise anything
