"""Readability article extraction — the reference's flagship pipeline
(examples/readability.rs, 771 LoC) re-expressed over this engine's
Document/Selection kernel and exposed as a fused Arrow UDF.

This is the capstone "complex query": it interleaves select → mutate →
re-select on one document dozens of times (scripts stripped, <br> runs
rewritten to <p>, unlikely candidates removed, paragraph scoring with
ancestor accumulation, top-candidate sibling harvesting, conditional
cleanup), exactly the access pattern the in-UDF mutation engine exists
for. Structure and constants follow the reference; file:line cites
inline.

Two deliberate fixes of reference bugs (no golden output exists — its
CI only compiles the example):
- ``set_node_tag`` closes the tag properly (the reference emits
  ``<p>…<p>``, examples/readability.rs:81-87);
- ``remove_tag`` selects the *tag argument* (the reference selects the
  literal string "tag", examples/readability.rs:195, so its removals
  were no-ops).
"""

from __future__ import annotations

import re
from dataclasses import dataclass

from nipper_spark.html import Document, Selection

# regex set: examples/readability.rs:12-29 (Python re; (?s) folded in)
RE_REPLACE_BRS = re.compile(r"(?is)(<br[^>]*>[ \n\r\t]*){2,}")
RE_BY_LINE = re.compile(r"(?is)byline|author|dateline|writtenby|p-author")
RE_UNLIKELY_CANDIDATES = re.compile(
    r"(?is)banner|breadcrumbs|combx|comment|community|cover-wrap|disqus|"
    r"extra|foot|header|legends|menu|related|remark|replies|rss|shoutbox|"
    r"sidebar|skyscraper|social|sponsor|supplemental|ad-break|agegate|"
    r"pagination|pager|popup|yom-remote|subscribe")
# the reference pattern starts with a stray backtick (rs:18) which makes
# its first alternative unmatchable; reproduced as written
RE_OK_MAYBE_CANDIDATE = re.compile(
    r"(?is)`and|article|body|column|main|shadow")
RE_UNLIKELY_ELEMENTS = re.compile(r"(?is)(input|time|button|svg)")
RE_LIKELY_ELEMENTS = re.compile(r"(?is)(no-svg)")
RE_POSITIVE = re.compile(
    r"(?is)article|body|content|entry|hentry|h-entry|main|page|pagination|"
    r"post|text|blog|story|paragraph")
RE_NEGATIVE = re.compile(
    r"(?is)hidden|^hid$| hid$| hid |^hid |banner|combx|comment|com-|"
    r"contact|foot|footer|footnote|masthead|media|meta|outbrain|promo|"
    r"related|scroll|share|shoutbox|sidebar|skyscraper|sponsor|shopping|"
    r"tags|tool|widget")
RE_DIV_TO_P_ELEMENTS = re.compile(
    r"(?is)<(a|blockquote|dl|div|img|ol|p|pre|table|ul|select)")
RE_VIDEOS = re.compile(
    r"(?is)//(www\.)?(dailymotion|youtube|youtube-nocookie|player\.vimeo)"
    r"\.com")
RE_P_IS_SENTENCE = re.compile(r"(?is)\.( |$)")
RE_COMMENTS = re.compile(r"(?is)<!--[^>]+-->")
RE_KILL_BREAKS = re.compile(r"(?is)(<br\s*/?>(\s|&nbsp;?)*)+")
RE_SPACES = re.compile(r"(?is)\s{2,}|\n+")

DATA_TABLE_ATTR = "xxx-data-table"  # attr names lowercase in our parser


@dataclass
class MetaData:  # examples/readability.rs:118-138
    title: str | None = None
    cover: str | None = None
    description: str | None = None
    author: str | None = None


def _class_or_id_weight(sel: Selection) -> float:
    """get_class_or_id_weight! (rs:89-117)."""
    weight = 0.0
    score = 45.0
    cls = sel.attr("class")
    if cls is not None:
        low = cls.lower()
        if RE_NEGATIVE.search(low):
            weight -= score
        if RE_POSITIVE.search(low):
            weight += score
    ident = sel.attr("id")
    if ident is not None:
        low = ident.lower()
        if RE_NEGATIVE.search(low):
            weight -= score
        if RE_POSITIVE.search(low):
            weight += score
    return weight


def _link_density(sel: Selection) -> float:
    """rs:283-295: len(text of descendant <a>) / len(text)."""
    text_len = len(sel.text())
    if text_len == 0:
        return 0.0
    link_len = sum(len(a.text()) for a in sel.select("a").iter())
    return link_len / text_len


def _ancestor_tag(sel: Selection, tag: str, depth: int) -> Selection | None:
    parent = sel.parent()
    for _ in range(depth):
        if parent.length == 0:
            return None
        if parent.is_(tag):
            return parent
        parent = parent.parent()
    return None


def _replace_brs(doc: Document) -> None:
    """rs:314-328: runs of 2+ <br> become paragraph breaks."""
    body = doc.select("body")
    html = body.html()
    new_html = RE_REPLACE_BRS.sub("</p><p>", html)
    body.set_html(new_html)
    for p in doc.select("body").select("p").iter():
        if p.html().strip() == "" or p.text().strip() == "" and \
                not RE_DIV_TO_P_ELEMENTS.search(p.html()):
            if p.html().strip() == "":
                p.remove()


def _prep_document(doc: Document) -> None:
    """rs:330-340: brs → p; <font> → <span>."""
    _replace_brs(doc)
    for font in doc.select("font").iter():
        font.replace_with_html("<span>%s</span>" % font.html())


def get_article_metadata(doc: Document) -> MetaData:
    """rs:342-379: og:/twitter:/name meta harvesting."""
    md = MetaData()
    for meta in doc.select("meta").iter():
        name = meta.attr_or("name", "")
        prop = meta.attr_or("property", "")
        content = meta.attr_or("content", "")
        if content == "":
            continue
        if "author" in name or "author" in prop:
            md.author = content
        if prop == "og:image" or name == "twitter:image":
            md.cover = content
        if name == "description" or prop == "og:description" or \
                name == "twitter:description":
            md.description = content
        if prop == "og:title" or name == "twitter:title":
            md.title = content
    if md.title is None:
        t = doc.select("title")
        md.title = t.text() if t.length else ""
    return md


def _initialize_score(sel: Selection) -> float:
    """initialize_candidate_item (rs:383-403)."""
    tag = (sel.doc.arena.name[sel.ids[0]] or "") if sel.ids else ""
    score = 0.0
    if tag == "article":
        score += 20.0
    elif tag == "section":
        score += 8.0
    elif tag == "div":
        score += 5.0
    elif tag in ("pre", "blockquote", "td"):
        score += 3.0
    elif tag in ("form", "ol", "ul", "dl", "dd", "dt", "li", "adress"):
        score -= 3.0
    elif tag in ("th", "h1", "h2", "h3", "h4", "h5", "h6"):
        score -= 5.0
    return score + _class_or_id_weight(sel)


def _remove_attrs(content: Selection) -> None:
    """rs:155-192."""
    strip = ["align", "background", "bgcolor", "border", "cellpadding",
             "cellspacing", "frame", "hspace", "rules", "style", "valign",
             "vspace", "onclick", "onmouseover"]
    for s1 in content.select("*").iter():
        tag = s1.doc.arena.name[s1.ids[0]] or ""
        if tag == "svg":
            continue
        for a in strip:
            s1.remove_attr(a)
        if tag not in ("table", "th", "td", "hr", "pre"):
            s1.remove_attr("width")
            s1.remove_attr("height")


def _remove_tag(content: Selection, tag: str) -> None:
    """rs:194-215 (fixed: selects `tag`, not the literal "tag")."""
    is_embed = tag in ("object", "embed", "iframe")
    for target in content.select(tag).iter():
        attrs = target.doc.arena.attrs[target.ids[0]] or []
        attr_str = " ".join(a[1] for a in attrs)
        if is_embed and RE_VIDEOS.search(attr_str):
            continue
        if is_embed and RE_VIDEOS.search(target.text()):
            continue
        target.remove()


def _remove_headers(content: Selection) -> None:
    for h in content.select("h1,h2,h3").iter():
        if _class_or_id_weight(h) < 0.0:
            h.remove()


def _remove_conditionally(content: Selection, tag: str) -> None:
    """rs:224-281."""
    is_list = tag in ("ul", "ol")
    for node in content.select(tag).iter():
        anc = _ancestor_tag(node, "table", 100)
        if anc is not None and anc.attr(DATA_TABLE_ATTR) == "1":
            continue
        if tag == "table":
            node.remove_attr(DATA_TABLE_ATTR)
        weight = _class_or_id_weight(node)
        if weight < 0.0:
            node.remove()
            continue
        text = node.text()
        commas = text.count(",") + text.count("，")
        if commas < 10:
            p = float(node.select("p").length)
            img = float(node.select("img").length)
            li = float(node.select("li").length) - 100.0
            inp = float(node.select("input").length)
            embed_count = 0
            for embed in node.select("embed").iter():
                if not RE_VIDEOS.search(embed.attr_or("src", "")):
                    embed_count += 1
            content_length = len(text)
            density = _link_density(node)
            fig = _ancestor_tag(node, "figure", 3)
            remove = ((not is_list and li > p)
                      or (img > 1.0 and p / img < 0.5 and fig is None)
                      or (inp > p / 3.0)
                      or (not is_list and content_length < 25
                          and (img == 0.0 or img > 2.0) and fig is None)
                      or (not is_list and weight < 25.0 and density > 0.2)
                      or (weight >= 25.0 and density > 0.5)
                      or ((embed_count == 1 and content_length < 75)
                          or embed_count > 1))
            if remove:
                node.remove()


def _mark_data_tables(content: Selection) -> None:
    """rs:672-717."""
    for table in content.select("table").iter():
        if table.attr_or("role", "") == "presentation":
            continue
        if table.attr_or("datatable", "") == "0":
            continue
        if table.attr("summary") is not None:
            table.set_attr(DATA_TABLE_ATTR, "1")
            continue
        caption = table.select("caption")
        if caption.length > 0 and caption.children().length > 0:
            table.set_attr(DATA_TABLE_ATTR, "1")
            continue
        if any(table.select(t).length > 0
               for t in ("col", "colgroup", "tfoot", "thead", "th")):
            table.set_attr(DATA_TABLE_ATTR, "1")
            continue
        if table.select("table").length > 0:
            continue
        rows, cols = _table_row_col_count(table)
        if rows > 10 or cols > 4 or rows * cols > 10:
            table.set_attr(DATA_TABLE_ATTR, "1")


def _table_row_col_count(table: Selection) -> tuple[int, int]:
    """rs:719-744 (rowspan/colspan aware)."""
    rows = 0
    cols = 0
    for tr in table.select("tr").iter():
        try:
            rows += int(tr.attr_or("rowspan", "1"))
        except ValueError:
            rows += 1
        row_cols = 0
        for td in tr.select("td").iter():
            try:
                row_cols += int(td.attr_or("colspan", "1") or "1")
            except ValueError:
                row_cols += 1
        cols = max(cols, row_cols)
    return rows, cols


def _pre_article(content: Selection, title: str) -> None:
    """rs:599-670."""
    _mark_data_tables(content)
    _remove_attrs(content)
    _remove_conditionally(content, "form")
    _remove_conditionally(content, "fieldset")
    for t in ("h1", "object", "embed", "footer", "link"):
        _remove_tag(content, t)
    for s in content.select("*").iter():
        match_str = "%s %s" % (s.attr_or("id", ""), s.attr_or("class", ""))
        if "share" in match_str:
            s.remove()
    h2s = content.select("h2")
    if h2s.length == 1 and title:
        text = h2s.text()
        rate = len(text) / len(title) - 1.0
        if abs(rate) < 0.5:
            matches = title in text if rate > 0.0 else text in title
            if matches:
                h2s.remove()
    for t in ("iframe", "input", "textarea", "select", "button"):
        _remove_tag(content, t)
    _remove_headers(content)
    _remove_conditionally(content, "table")
    _remove_conditionally(content, "ul")
    for p in content.select("p").iter():
        total = (p.select("img").length + p.select("embed").length +
                 p.select("object").length + p.select("iframe").length)
        if total == 0 and len(p.text()) == 0:
            p.remove()
    for br in content.select("br").iter():
        if br.next_sibling().is_("p"):
            br.remove()


def _clean_html(doc: Document) -> str:
    """rs:591-598."""
    html = doc.html()
    html = RE_COMMENTS.sub("", html)
    html = RE_KILL_BREAKS.sub("<br />", html)
    html = RE_SPACES.sub("", html)
    return html


def grab_article(doc: Document, title: str) -> tuple[str, str | None]:
    """rs:405-589: strip unlikelies, score paragraphs into ancestor
    candidates (first-write-wins per node id), harvest the top
    candidate's qualifying siblings into a fresh document."""
    author = None
    # pass 1: removals over a snapshot of all elements
    for node_sel in list(doc.select("*").iter()):
        if not node_sel.ids:
            continue
        sel = node_sel
        cls = sel.attr_or("class", "")
        ident = sel.attr_or("id", "")
        match_str = "%s %s" % (cls.lower(), ident.lower())
        tag = doc.arena.name[sel.ids[0]] or ""

        rel = sel.attr("rel")
        if rel == "author" or (rel is not None and
                               RE_BY_LINE.search(match_str)):
            text = sel.text()
            if 0 < len(text) < 100:
                author = text
                sel.remove()
                continue
        if (RE_UNLIKELY_CANDIDATES.search(match_str)
                and not RE_OK_MAYBE_CANDIDATE.search(match_str)
                and not sel.is_("html") and not sel.is_("article")
                and not sel.is_("body") and not sel.is_("a")
                and _class_or_id_weight(sel) <= 0.0):
            sel.remove()
            continue
        if RE_UNLIKELY_CANDIDATES.search(tag):
            sel.remove()
            continue
        if RE_UNLIKELY_ELEMENTS.search(match_str) and \
                not RE_LIKELY_ELEMENTS.search(match_str):
            sel.remove()
            continue
        if RE_LIKELY_ELEMENTS.search(tag):
            sel.remove()
            continue
        if sel.is_("div,section,header,h1,h2,h3,h4,h5,h6") and \
                sel.text().strip() == "":
            sel.remove()
            continue

    # pass 2: collect elements to score (divs may be re-tagged to <p>)
    elements_to_score = []
    for sel in list(doc.select("*").iter()):
        if sel.is_("section,h2,h3,h4,h5,h6,p,td,pre,article"):
            elements_to_score.append(sel)
        elif sel.is_("div"):
            children = sel.children()
            if children.length == 1 and children.is_("p"):
                sel.replace_with_selection(children)
                elements_to_score.append(sel)
            elif not RE_DIV_TO_P_ELEMENTS.search(sel.html()):
                # set_node_tag (rs:81-87; closing tag fixed)
                sel.replace_with_html("<p>%s</p>" % sel.html())
                elements_to_score.append(sel)

    # pass 3: score into ancestor candidates
    candidates: dict[int, tuple[float, Selection]] = {}
    for e in elements_to_score:
        text = e.text()
        if len(text) < 25:
            continue
        ancestors = []
        parent = e.parent()
        for _ in range(3):
            if parent.length == 0:
                break
            ancestors.append(parent)
            parent = parent.parent()
        if not ancestors:
            continue
        content_score = 1.0 + text.count(",") + text.count("，") + \
            min(len(text) // 100, 3)
        for level, ancestor in enumerate(ancestors):
            driver = 1 if level == 0 else (2 if level == 1 else level * 3)
            nid = ancestor.ids[0]
            if nid in candidates:
                continue  # first-write-wins (rs:518 or_insert)
            rate = 1.0 - _link_density(ancestor)
            score = (_initialize_score(ancestor) +
                     content_score / driver) * rate
            candidates[nid] = (score, ancestor)

    # pass 4: top candidate (ties: lowest node id — deterministic where
    # the reference's HashMap iteration order is not)
    top: tuple[float, Selection] | None = None
    top_id = -1
    for nid in sorted(candidates):
        score, sel = candidates[nid]
        if top is None or score > top[0]:
            top = (score, sel)
            top_id = nid
    if top is None:
        body = doc.select("body")
        top = (_initialize_score(body), body)
        top_id = body.ids[0] if body.ids else -1

    new_doc = Document.from_html("")
    content = new_doc.select("body")
    threshold = max(top[0] * 0.2, 10.0)
    top_sel = top[1]
    for sibling in top_sel.parent().children().iter():
        append = False
        if sibling.is_selection(top_sel):
            append = True
        else:
            nid = sibling.ids[0]
            cand = candidates.get(nid)
            if cand is not None and cand[0] > threshold:
                append = True
            elif sibling.is_("p"):
                density = _link_density(sibling)
                node_content = sibling.text()
                node_length = len(node_content)
                if node_length > 80 and density < 0.25:
                    append = True
                elif (0 < node_length < 80 and density == 0.0
                      and RE_P_IS_SENTENCE.search(node_content)):
                    append = True
        if append:
            content.append_html(sibling.html())

    _pre_article(new_doc.select("body"), title)
    return _clean_html(new_doc), author


def extract_article(html: str | bytes) -> dict:
    """The full pipeline (rs:747-771 main): one document in, article
    record out. Pure function — runs identically inside the Arrow UDF
    and in a single-threaded oracle."""
    doc = Document.from_html(html)
    doc.select("script").remove()
    doc.select("noscript").remove()
    doc.select("style").remove()
    _prep_document(doc)
    md = get_article_metadata(doc)
    title = md.title or ""
    content_html, author = grab_article(doc, title)
    if author is not None and md.author is None:
        md.author = author
    text = Document.from_html(content_html).body_text()
    return {
        "title": md.title,
        "author": md.author,
        "description": md.description,
        "cover": md.cover,
        "content_html": content_html,
        "content_text": text,
    }


READABILITY_SCHEMA = ("url string, title string, author string, "
                      "description string, cover string, "
                      "content_html string, content_text string")


def readability_articles(pages, url_col: str = "url",
                         html_col: str = "html"):
    """pages(url, html, …) → article records, one fused Arrow pass."""
    from typing import Iterator

    import pandas as pd
    from pyspark.sql import functions as F

    src = pages.select(F.col(url_col).alias("url"),
                       F.col(html_col).alias("html"))

    def _extract(batches: Iterator[pd.DataFrame]) -> Iterator[pd.DataFrame]:
        for pdf in batches:
            out = {k: [] for k in ("url", "title", "author", "description",
                                   "cover", "content_html", "content_text")}
            for url, h in zip(pdf["url"], pdf["html"]):
                rec = extract_article(h if h is not None else "")
                out["url"].append(url)
                for k in ("title", "author", "description", "cover",
                          "content_html", "content_text"):
                    out[k].append(rec[k])
            yield pd.DataFrame(out)

    return src.mapInPandas(_extract, schema=READABILITY_SCHEMA)
