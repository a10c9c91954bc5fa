"""Selector-engine unit tests beyond the reference's fixture counts:
attribute operators, sibling combinators, structural pseudos, :not,
and the reference examples ported as assertions
(examples/text.rs, attribute.rs, remove.rs, tag_name.rs).
"""

import pytest

from nipper_spark.html import Document, Matcher, SelectorError

DOC = Document.from_html("""
<html><body>
  <div id="a" data-x="alpha beta" lang="en-US" class="one">
    <p class="p1">first</p>
    <span>mid</span>
    <p class="p2">second</p>
    <p class="p3">third</p>
  </div>
  <div id="b" data-x="beta" href="http://x.test/page?q=1"></div>
  <div id="empty"></div>
  <div id="ws"> </div>
</body></html>""")


class TestAttrOperators:
    def test_presence(self):
        assert DOC.select("[data-x]").length == 2

    def test_eq(self):
        assert DOC.select('[data-x="beta"]').attr("id") == "b"

    def test_includes(self):
        assert DOC.select('[data-x~="beta"]').length == 2
        assert DOC.select('[data-x~="alpha"]').attr("id") == "a"

    def test_dash_match(self):
        assert DOC.select('[lang|="en"]').attr("id") == "a"
        assert DOC.select('[lang|="e"]').length == 0

    def test_prefix_suffix_substring(self):
        assert DOC.select('[href^="http://"]').attr("id") == "b"
        assert DOC.select('[href$="?q=1"]').attr("id") == "b"
        assert DOC.select('[href*="x.test"]').attr("id") == "b"
        assert DOC.select('[href^=""]').length == 0  # empty never matches


class TestCombinators:
    def test_adjacent_sibling(self):
        # p + p skips nothing; span between p1 and p2 breaks adjacency
        assert DOC.select("p + p").length == 1  # only p3 (after p2)
        assert DOC.select("span + p").attr("class") == "p2"

    def test_general_sibling(self):
        assert DOC.select("p ~ p").length == 2  # p2, p3
        assert DOC.select(".p1 ~ span").length == 1

    def test_child(self):
        assert DOC.select("div > p").length == 3
        assert DOC.select("body > p").length == 0


class TestStructuralPseudos:
    def test_empty(self):
        ids = {DOC.arena.get_attr(i, "id")
               for i in DOC.select("div:empty").ids}
        # whitespace text counts as content (src/element.rs:207-212),
        # so #ws is NOT empty; childless #b and #empty are
        assert ids == {"b", "empty"}

    def test_first_last_child(self):
        assert DOC.select("p:first-child").attr("class") == "p1"
        assert DOC.select("p:last-child").attr("class") == "p3"

    def test_nth_of_type(self):
        assert DOC.select("p:nth-of-type(2)").attr("class") == "p2"
        assert DOC.select("p:nth-of-type(2n)").length == 1

    def test_not(self):
        assert DOC.select("p:not(.p1)").length == 2
        assert DOC.select("div:not([data-x])").length == 2

    def test_nonstructural_pseudos_never_match(self):
        # parse but never match (src/element.rs:113-131)
        assert DOC.select("p:hover").length == 0
        assert DOC.select("p::before").length == 0


class TestSelectionOps:
    def test_get_last_first(self):
        ps = DOC.select("p")
        assert ps.first().attr("class") == "p1"
        assert ps.last().attr("class") == "p3"
        assert ps.get(1) == ps.ids[1]
        assert ps.get(99) is None

    def test_prev_sibling(self):
        assert DOC.select(".p2").prev_sibling().node_name() == "span"

    def test_attrs_ordered(self):
        assert DOC.select("#a").attrs() == [
            ("id", "a"), ("data-x", "alpha beta"), ("lang", "en-US"),
            ("class", "one")]

    def test_node_name(self):
        assert DOC.select("#a").node_name() == "div"
        assert DOC.select("nosuch").node_name() is None

    def test_matcher_reuse_across_documents(self):
        m = Matcher("p.p1")
        d2 = Document.from_html("<p class='p1'>x</p>")
        assert DOC.select_matcher(m).length == 1
        assert d2.select_matcher(m).length == 1


class TestReferenceExamples:
    def test_text_example(self):
        # examples/text.rs: ul/li text concatenation
        doc = Document.from_html(
            "<ul><li>Foo</li><li>Bar</li><li>Baz</li></ul>")
        assert doc.select("ul").text() == "FooBarBaz"
        assert doc.select("ul li:nth-child(2)").text() == "Bar"

    def test_attribute_example(self):
        # examples/attribute.rs: div[name=foo]
        doc = Document.from_html(
            '<input name="foo" value="bar"><div name="foo">text</div>')
        assert doc.select('div[name="foo"]').text() == "text"
        assert doc.select('input[name="foo"]').attr("value") == "bar"

    def test_remove_example(self):
        # examples/remove.rs: remove a subtree, requery sees it gone
        doc = Document.from_html(
            '<div id="loginContent"><form id="f"><input></form></div>'
            '<div id="keep">stay</div>')
        doc.select("#loginContent").remove()
        assert doc.select("#f").length == 0
        assert doc.select("#keep").text() == "stay"

    def test_tag_name_example(self):
        doc = Document.from_html("<article><h1>t</h1></article>")
        assert doc.select("article").node_name() == "article"

    def test_append_selection(self):
        doc = Document.from_html(
            '<div id="src"><b>move me</b></div><div id="dst"></div>')
        b = doc.select("#src b")
        doc.select("#dst").append_selection(b)
        assert doc.select("#dst b").text() == "move me"
        assert doc.select("#src b").length == 0

    def test_append_html(self):
        doc = Document.from_html('<div id="d"><i>x</i></div>')
        doc.select("#d").append_html("<u>y</u><s>z</s>")
        assert [doc.arena.name[i] for i in
                doc.select("#d").children().ids] == ["i", "u", "s"]


class TestRemainingPseudos:
    def test_nth_last_child(self):
        assert DOC.select("p:nth-last-child(1)").attr("class") == "p3"
        assert DOC.select("p:nth-last-child(2)").attr("class") == "p2"

    def test_only_child_and_of_type(self):
        doc = Document.from_html(
            "<div><p>solo</p></div><div><p>a</p><span>s</span></div>")
        assert doc.select("p:only-child").text() == "solo"
        # 'a' is the only p in its parent → only-of-type
        assert {s.text() for s in
                doc.select("p:only-of-type").iter()} == {"solo", "a"}

    def test_first_last_of_type(self):
        assert DOC.select("p:first-of-type").attr("class") == "p1"
        assert DOC.select("p:last-of-type").attr("class") == "p3"
        assert DOC.select("span:first-of-type").text() == "mid"

    def test_nth_anb_forms(self):
        assert DOC.select("p:nth-child(odd)").length >= 1
        assert DOC.select("p:nth-child(-n+3)").length >= 1
        assert DOC.select("p:nth-child(2n)").length >= 1
        with pytest.raises(SelectorError):
            DOC.select("p:nth-child(x+y)")
