"""Real-page fixtures for HTML main-content extraction (VERDICT r11
#2): ``html_main_text`` was previously proven only against pages built
by its sibling ``attach_synth_html`` — generator and extractor shared
assumptions. The pages in tests/fixtures/html are hand-authored
realistic markup (public-domain-style prose): nested divs, a data
table, HTML comments (including one containing '>'), entity-encoded
attributes, unclosed tags, unquoted attributes, inline CSS, and a
link-farm block. Each page's extraction is pinned EXACTLY, and the
known failure mode (a raw '>' inside an attribute value defeats the
``<[^>]*>`` tag regex and leaks residue) is pinned as a documented
limit rather than hidden."""

from __future__ import annotations

import os

import pytest

from tweetaggregates_spark.operators.text import html_main_text

FIXDIR = os.path.join(os.path.dirname(__file__), "fixtures", "html")


def _extract(spark, name):
    with open(os.path.join(FIXDIR, name)) as f:
        html = f.read()
    df = spark.createDataFrame([(name, html)], "name STRING, html STRING")
    return html_main_text(df, html_col="html").collect()[0]


def test_article_nested_divs(spark):
    """Prose inside nested divs is kept (title, heading, paragraphs);
    nav, link sidebar, footer, <script> and inline-CSS <style> all
    drop."""
    r = _extract(spark, "article_nested.html")
    assert r["n_blocks"] == 9 and r["n_blocks_kept"] == 4
    t = r["extracted_text"]
    assert t.startswith("On the Origin of Species - Chapter I Chapter I:")
    assert "strikes us is that they generally differ" in t
    assert "raised under conditions of life not so uniform." in t
    for boiler in ("Home", "Chapter II", "Privacy", "font-family",
                   "trackView"):
        assert boiler not in t


def test_table_cells_join_into_prose(spark):
    """Tables are NOT block splitters: caption and cell tags strip as
    inline markup, so table text joins the surrounding prose — the
    documented behavior for data tables (acceptable for LM corpora;
    a layout-aware extractor would drop or linearize them)."""
    r = _extract(spark, "table_page.html")
    assert r["n_blocks"] == 6 and r["n_blocks_kept"] == 3
    t = r["extracted_text"]
    assert "Population by county, 1871 County Population Houses" in t
    assert "Kent 847,507 144,872" in t
    assert "incomplete or illegible." in t
    assert "index" not in t  # nav dropped


def test_comments_and_encoded_attrs(spark):
    """HTML comments strip via the tag regex; a comment containing '>'
    leaves residue in a fragment, but the min-length rule drops it
    here. Entity-encoded '&gt;' in an attribute does NOT break tag
    stripping (no raw '>' inside the tag)."""
    r = _extract(spark, "comments_and_attrs.html")
    assert r["n_blocks_kept"] == 2
    t = r["extracted_text"]
    assert t.startswith("An inequality such as five being greater")
    assert t.endswith("symbolic notation is introduced at all.")
    assert "legacy CMS" not in t
    assert "section 4" not in t  # comment residue fell below min length
    assert "a &gt; b" not in t and "data-note" not in t


def test_unclosed_and_unquoted(spark):
    """Unclosed <p>/<div> and unquoted attribute values (common in
    pre-HTML5 pages) are handled: opening tags alone delimit blocks."""
    r = _extract(spark, "unclosed_tags.html")
    assert r["n_blocks"] == 5 and r["n_blocks_kept"] == 4
    t = r["extracted_text"]
    assert "register of baptisms begins in the year 1653" in t
    assert "marked with a cross in the margin." in t
    assert "surnames" not in t  # nav dropped despite unquoted hrefs


def test_linkfarm_dropped_blurb_kept(spark):
    """A long link-farm paragraph (6 links) fails the link-density
    rule even though it passes the length rule; the prose blurb
    survives."""
    r = _extract(spark, "linkfarm.html")
    assert r["n_blocks"] == 3 and r["n_blocks_kept"] == 2
    t = r["extracted_text"]
    assert "compiled from the almanacks" in t
    assert "Antiquarian Society" not in t


@pytest.mark.parametrize("residue", ['height">'])
def test_known_limit_raw_gt_in_attribute(spark, residue):
    """DOCUMENTED LIMIT: a raw '>' inside an attribute value (legal
    HTML, e.g. alt=\"width > height\") terminates the ``<[^>]*>`` tag
    match early and the tag's tail leaks into the extracted text.
    Real-world prevalence is low (validators flag it; entities are
    the norm) and the leak is bounded by the tag's own length, but an
    extractor upgrade should clear this pin."""
    r = _extract(spark, "attr_raw_gt.html")
    t = r["extracted_text"]
    assert residue in t  # the leak — remove this pin when fixed
    assert "Plates are reproduced at their original size" in t
    assert "list of illustrations at the front." in t
