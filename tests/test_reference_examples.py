"""Byte-level ports of the reference's examples/ programs (the ones
that run without network): every println! output, pinned.

- attribute.rs — attr get/set/remove + replace_with_html requery
- remove.rs    — chained select, parent(), next_sibling() removal
- text.rs / tag_name.rs — per-item html()/text() iteration
(readability.rs is the q:readability capstone; demo.rs's page is a
subset of the wisburg fixture covered by q:sel_counts.)
"""

from nipper_spark.html import Document

_UL = """
    <ul>
    <li>Foo</li>
    <li>Bar</li>
    <li>Baz</li>
</ul>
"""


def test_attribute_rs():
    doc = Document.from_html('<div name="foo" value="bar"></div>')
    assert doc.html() == ('<html><head></head><body>'
                          '<div name="foo" value="bar"></div></body></html>')
    inp = doc.select('div[name="foo"]')
    assert inp.html() == '<div name="foo" value="bar"></div>'
    inp.set_attr("id", "input")
    inp.remove_attr("name")
    assert inp.attr("value") == "bar"
    assert inp.html() == '<div value="bar" id="input"></div>'
    inp.replace_with_html(
        '<a href="https://wisburg.com">wisburg</a><h2>xxx</h2>')
    # the selection still points at the detached node (reference
    # semantics: replace detaches, ids stay valid)
    assert inp.html() == '<div value="bar" id="input"></div>'
    assert doc.html() == ('<html><head></head><body>'
                          '<a href="https://wisburg.com">wisburg</a>'
                          "<h2>xxx</h2></body></html>")


def test_remove_rs():
    doc = Document.from_html(_UL)
    items = doc.select("ul").select("li")
    ul = items.parent()
    assert ul.html() == ("<ul>\n    <li>Foo</li>\n    <li>Bar</li>"
                         "\n    <li>Baz</li>\n</ul>")
    for item in items.next_sibling().iter():
        item.remove()
    assert doc.select("ul").html() == \
        "<ul>\n    <li>Foo</li>\n    \n    \n</ul>"


def test_text_rs():
    doc = Document.from_html(_UL)
    items = doc.select("ul").select("li")
    out = [(i.html(), i.text()) for i in items.iter()]
    assert out == [("<li>Foo</li>", "Foo"), ("<li>Bar</li>", "Bar"),
                   ("<li>Baz</li>", "Baz")]


def test_tag_name_rs():
    doc = Document.from_html(_UL)
    items = doc.select("ul").select("li")
    assert [i.node_name() for i in items.iter()] == ["li", "li", "li"]
    assert items.parent().node_name() == "ul"
