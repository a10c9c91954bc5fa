"""Ports of the reference's selection test suites (golden counts and
values against its own test pages):

- tests/selection-traversal.rs   (selector + traversal counts)
- tests/selection-property.rs    (attr/text/class semantics)
- tests/selection-query.rs       (is / is_selection semi-join)
- tests/selection-manipulation.rs (structural mutation)
"""

import pytest

from nipper_spark.html import Document, SelectorError


@pytest.fixture()
def doc(page_html):
    return Document.from_html(page_html)


@pytest.fixture()
def doc2(page2_html):
    return Document.from_html(page2_html)


@pytest.fixture()
def docwiki(rustwiki_html):
    return Document.from_html(rustwiki_html)


# ---------------------------------------------------------------------------
# selection-traversal.rs
# ---------------------------------------------------------------------------

class TestTraversal:
    def test_select(self, doc):
        assert doc.select("div.row-fluid").length == 9

    def test_select_not_self(self, doc):
        # chained select excludes the roots themselves
        assert doc.select("h1").select("h1").length == 0

    def test_select_invalid(self, doc):
        with pytest.raises(SelectorError):
            doc.select(":+ ^")

    def test_select_big(self, docwiki):
        assert docwiki.select("li").length == 420
        assert docwiki.select("span").length == 706

    def test_chained_select(self, doc):
        assert doc.select("div.hero-unit").select(".row-fluid").length == 4

    def test_chained_select_invalid(self, doc):
        with pytest.raises(SelectorError):
            doc.select("div.hero-unit").select("")

    def test_iter_is_double_ended(self, doc):
        """`Selections` is reversible + sized, like the reference's
        DoubleEndedIterator/ExactSizeIterator (src/traversal.rs:246-268):
        reversed() yields the same single-node Selections back-to-front."""
        it = doc.select("div.row-fluid").iter()
        fwd = [s.ids[0] for s in it]
        bwd = [s.ids[0] for s in reversed(it)]
        assert len(it) == 9 == len(fwd)
        assert bwd == fwd[::-1]
        assert all(s.length == 1 for s in it)

    def test_children(self, doc):
        assert doc.select(".pvk-content").children().length == 5

    def test_parent(self, doc):
        assert doc.select(".container-fluid").parent().length == 3

    def test_parent_body(self, doc):
        assert doc.select("body").parent().length == 1

    def test_next(self, doc):
        assert doc.select("h1").next_sibling().length == 1

    def test_next2(self, doc):
        assert doc.select(".close").next_sibling().length == 1

    def test_next_none(self, doc):
        assert doc.select("small").next_sibling().length == 0

    def test_nth_child(self):
        html = """<!DOCTYPE html>
    <html lang="en">
        <head></head>

        <body>
            <div id="bggrad"></div>
            <div class="container container-header"></div>
            <div class="container container-main">
                <nav class="navbar navbar-default navbar-static-top"></nav>
                <div class="row">
                    <div class="col-xs-12"></div>
                    <div class="col-xs-12"></div>
                    <div class="col-md-10">
                        <a href="\\#">foo</a>
                    </div>
                </div>
            </div>
        </body>
    </html>"""
        doc = Document.from_html(html)
        sel = doc.select(
            "body > div.container.container-main > div.row:nth-child(2)"
            " > div.col-md-10 > a")
        assert sel.length == 1


# ---------------------------------------------------------------------------
# selection-property.rs
# ---------------------------------------------------------------------------

class TestProperty:
    def test_attr_exists(self, doc):
        assert doc.select("a").attr("href") is not None

    def test_attr_or(self, doc):
        assert doc.select("a").attr_or("fake-attribute", "alternative") \
            == "alternative"
        assert doc.select("zz").attr_or("fake-attribute", "alternative") \
            == "alternative"

    def test_attr_not_exist(self, doc):
        assert doc.select("div.row-fluid").attr("href") is None

    def test_remove_attr(self, doc2):
        sel = doc2.select("div")
        sel.remove_attr("id")
        assert sel.attr("id") is None

    def test_set_attr(self, doc2):
        sel = doc2.select("#main")
        sel.set_attr("id", "not-main")
        assert sel.attr("id") == "not-main"

    def test_set_attr2(self, doc2):
        sel = doc2.select("#main")
        sel.set_attr("foo", "bar")
        assert sel.attr("foo") == "bar"

    def test_text(self, doc):
        assert doc.select("h1").text().strip() == "Provok.in"

    def test_add_class(self, doc2):
        sel = doc2.select("#main")
        sel.add_class("main main main")
        assert sel.attr("class") == "main"

    def test_add_class_similar(self, doc2):
        sel = doc2.select("#nf5")
        sel.add_class("odd")
        assert sel.has_class("odd")
        assert sel.has_class("odder")

    def test_add_empty_class(self, doc2):
        sel = doc2.select("#main")
        sel.add_class("")
        assert sel.attr("class") is None

    def test_add_classes(self, doc2):
        sel = doc2.select("#main")
        sel.add_class("a b")
        assert sel.has_class("a")
        assert sel.has_class("b")

    def test_has_class(self, doc):
        assert doc.select("div").has_class("span12")

    def test_has_class_none(self, doc):
        assert not doc.select("toto").has_class("toto")

    def test_has_class_not_first(self, doc):
        assert doc.select(".alert").has_class("alert-error")

    def test_remove_class(self, doc2):
        sel = doc2.select("#nf1")
        sel.remove_class("one row")
        assert sel.has_class("even")
        assert not sel.has_class("one")
        assert not sel.has_class("row")

    def test_remove_class_similar(self, doc2):
        sel = doc2.select("#nf5, #nf6")
        assert sel.length == 2
        sel.remove_class("odd")
        assert sel.has_class("odder")


# ---------------------------------------------------------------------------
# selection-query.rs
# ---------------------------------------------------------------------------

class TestQuery:
    def test_is(self, doc):
        sel = doc.select(".footer p:nth-child(1)")
        assert sel.is_("p")

    def test_is_invalid(self, doc):
        sel = doc.select(".footer p:nth-child(1)")
        assert not sel.is_("")

    def test_is_selection(self, doc):
        sel = doc.select("div")
        sel2 = doc.select(".pvk-gutter")
        assert sel.is_selection(sel2)

    def test_is_selection_not(self, doc):
        sel = doc.select("div")
        sel2 = doc.select("a")
        assert not sel.is_selection(sel2)


# ---------------------------------------------------------------------------
# selection-manipulation.rs
# ---------------------------------------------------------------------------

class TestManipulation:
    def test_replace_with_html(self, doc2):
        sel = doc2.select("#main,#foot")
        sel.replace_with_html('<div id="replace"></div>')
        assert doc2.select("#replace").length == 2

    def test_set_html(self, doc2):
        q = doc2.select("#main, #foot")
        q.set_html('<div id="replace">test</div>')
        assert doc2.select("#replace").length == 2
        assert doc2.select("#main, #foot").length == 2
        assert q.text() == "testtest"

    def test_set_html_no_match(self, doc2):
        q = doc2.select("#notthere")
        q.set_html('<div id="replace">test</div>')
        assert doc2.select("#replace").length == 0

    def test_set_html_empty(self, doc2):
        q = doc2.select("#main")
        q.set_html("")
        assert doc2.select("#main").length == 1
        assert doc2.select("#main").children().length == 0

    def test_replace_with_selection(self, doc2):
        s1 = doc2.select("#nf5")
        sel = doc2.select("#nf6")
        sel.replace_with_selection(s1)
        assert sel.is_("#nf6")
        assert doc2.select("#nf6").length == 0
        assert doc2.select("#nf5").length == 1


class TestNodeKindPredicates:
    """Node::is_document/is_element/is_text (src/dom_tree.rs:895-908),
    exposed on the first matched node like attr()."""

    def test_kinds(self):
        from nipper_spark.html import Document
        doc = Document.from_html("<body><p>x</p>")
        assert doc.select("p").is_element()
        assert not doc.select("p").is_text()
        assert not doc.select("p").is_document()
        assert doc.select(":root").is_document()

    def test_empty_selection_is_nothing(self):
        from nipper_spark.html import Document
        doc = Document.from_html("<body><p>x</p>")
        s = doc.select("em")
        assert not s.is_element() and not s.is_text() \
            and not s.is_document()
