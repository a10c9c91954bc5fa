"""Parse/serialize byte-identity goldens.

Every ``test!`` pair from the reference's tests/html-dom.rs:47-168,
run through fragment parse → serialize(children of the html root),
exactly like the reference's ``parse_and_serialize`` harness
(tests/html-dom.rs:11-26).
"""

import pytest

from nipper_spark.html import Document, parse_document, parse_fragment
from nipper_spark.html.arena import DOCTYPE, ELEMENT
from nipper_spark.html.serializer import serialize


def parse_and_serialize(html: str) -> str:
    arena = parse_fragment(html)
    # root.first_child() is the html element; serialize ChildrenOnly
    first = arena.children_of(0)[0]
    return serialize(arena, first, include_node=False)


CASES = [
    # (name, input, expected)  — expected defaults to input
    ("empty", "", ""),
    ("fuzz", "<a a=\r\n", ""),
    ("smoke_test", "<p><i>Hello</i>, World!</p>", None),
    ("misnest", "<p><i>Hello!</p>, World!</i>",
     "<p><i>Hello!</i></p><i>, World!</i>"),
    ("attr_literal", '<base foo="<\'>">', None),
    ("attr_escape_amp", '<base foo="&amp;">', None),
    ("attr_escape_amp_2", "<base foo=&amp>", '<base foo="&amp;">'),
    ("attr_escape_nbsp", "<base foo=x y>", '<base foo="x&nbsp;y">'),
    ("attr_escape_quot", "<base foo='\"'>", '<base foo="&quot;">'),
    ("attr_escape_several",
     '<span foo=3 title=\'test "with" &amp;quot;\'>',
     '<span foo="3" title="test &quot;with&quot; &amp;quot;"></span>'),
    ("text_literal", "<p>\"'\"</p>", None),
    ("text_escape_amp", "<p>&amp;</p>", None),
    ("text_escape_amp_2", "<p>&amp</p>", "<p>&amp;</p>"),
    ("text_escape_nbsp", "<p>x y</p>", "<p>x&nbsp;y</p>"),
    ("text_escape_lt", "<p>&lt;</p>", None),
    ("text_escape_gt", "<p>&gt;</p>", None),
    ("text_escape_gt2", "<p>></p>", "<p>&gt;</p>"),
    ("script_literal",
     "<script>(x & 1) < 2; y > \"foo\" + 'bar'</script>", None),
    ("style_literal",
     "<style>(x & 1) < 2; y > \"foo\" + 'bar'</style>", None),
    ("xmp_literal", "<xmp>(x & 1) < 2; y > \"foo\" + 'bar'</xmp>", None),
    ("iframe_literal",
     "<iframe>(x & 1) < 2; y > \"foo\" + 'bar'</iframe>", None),
    ("noembed_literal",
     "<noembed>(x & 1) < 2; y > \"foo\" + 'bar'</noembed>", None),
    ("noframes_literal",
     "<noframes>(x & 1) < 2; y > \"foo\" + 'bar'</noframes>", None),
    ("pre_lf_0", "<pre>foo bar</pre>", None),
    ("pre_lf_1", "<pre>\nfoo bar</pre>", "<pre>foo bar</pre>"),
    ("pre_lf_2", "<pre>\n\nfoo bar</pre>", "<pre>\nfoo bar</pre>"),
    ("textarea_lf_0", "<textarea>foo bar</textarea>", None),
    ("textarea_lf_1", "<textarea>\nfoo bar</textarea>",
     "<textarea>foo bar</textarea>"),
    ("textarea_lf_2", "<textarea>\n\nfoo bar</textarea>",
     "<textarea>\nfoo bar</textarea>"),
    ("listing_lf_0", "<listing>foo bar</listing>", None),
    ("listing_lf_1", "<listing>\nfoo bar</listing>",
     "<listing>foo bar</listing>"),
    ("listing_lf_2", "<listing>\n\nfoo bar</listing>",
     "<listing>\nfoo bar</listing>"),
    ("comment_1", "<p>hi <!--world--></p>", None),
    ("comment_2", "<p>hi <!-- world--></p>", None),
    ("comment_3", "<p>hi <!--world --></p>", None),
    ("comment_4", "<p>hi <!-- world --></p>", None),
    ("attr_ns_1", '<svg xmlns="bleh"></svg>', None),
    ("attr_ns_2", '<svg xmlns:foo="bleh"></svg>', None),
    ("attr_ns_3", '<svg xmlns:xlink="bleh"></svg>', None),
    ("attr_ns_4", '<svg xlink:href="bleh"></svg>', None),
]


@pytest.mark.parametrize("name,inp,expected", CASES,
                         ids=[c[0] for c in CASES])
def test_parse_serialize_roundtrip(name, inp, expected):
    if expected is None:
        expected = inp
    assert parse_and_serialize(inp) == expected


def test_doctype():
    """tests/html-dom.rs:151-168: first child of the document is the
    doctype; IncludeNode serialization emits `<!DOCTYPE html>`."""
    arena = parse_document("<!doctype html>")
    first = arena.children_of(0)[0]
    assert arena.kind[first] == DOCTYPE
    assert serialize(arena, first, include_node=True) == "<!DOCTYPE html>"


def test_implied_elements_creation_order():
    """tests/html-tree-sink.rs:117-142 pins implied-element insertion:
    parsing `<a>text</a><b>text</b>` creates html, head, body, a, b."""
    arena = parse_document("<a>text</a><b>text</b>")
    names = [arena.name[i] for i in range(len(arena.kind))
             if arena.kind[i] == ELEMENT]
    assert names == ["html", "head", "body", "a", "b"]


def test_document_full_roundtrip():
    doc = Document.from_html(
        "<!DOCTYPE html><html><head><title>t</title></head>"
        "<body><p>x</p></body></html>")
    assert doc.html() == ("<!DOCTYPE html><html><head><title>t</title>"
                          "</head><body><p>x</p></body></html>")
