"""Extraction parity tests (FIXTURES.md §5; reference basic_spider.rs:32-66)."""

import pytest

from ironspark.extract import (
    article_text_of,
    decode_strict,
    extract_number,
    next_link,
    parse_article_html,
    parse_response,
)


def test_happy_path():
    html = "<article>Article 7<author>Ann</author></article>"
    title, author = parse_article_html(html)
    assert title == "Article 7"
    assert author == "Ann"
    assert extract_number(title) == 7


def test_article_text_includes_author_text_nodes():
    # scraper's element.text() walks ALL descendant text nodes
    html = "<article> Article 3 <author>Bob</author> tail </article>"
    assert article_text_of(html) == "Article 3 Bob tail"


def test_replace_all_quirk():
    # author text occurring inside the title is removed EVERYWHERE
    html = "<article>Ann wrote Article 7 by Ann<author>Ann</author></article>"
    title, author = parse_article_html(html)
    assert author == "Ann"
    # "Ann wrote Article 7 by AnnAnn" -> remove all "Ann" -> " wrote Article 7 by " -> trim
    assert title == "wrote Article 7 by"
    assert "Ann" not in title


def test_missing_author_is_none():
    assert parse_article_html("<article>Article 5</article>") is None


def test_missing_article_is_none():
    assert parse_article_html("<div>Article 5<author>A</author></div>") is None


def test_author_must_be_direct_child():
    # CSS "article > author": author nested deeper does not match
    html = "<article>Article 5<div><author>A</author></div></article>"
    assert parse_article_html(html) is None


def test_nested_elements_text_concat():
    html = "<article><h1>Article <b>12</b></h1><p>body</p><author>X <i>Y</i></author></article>"
    title, author = parse_article_html(html)
    assert author == "X Y"
    assert title == "Article 12body"


def test_entities_decoded():
    html = "<article>Article&nbsp;9 &amp; more<author>A&#65;</author></article>"
    title, author = parse_article_html(html)
    assert author == "AA"
    assert "&" in title and "9" in title


def test_strict_utf8_decode():
    assert decode_strict(b"\xff\xfe") is None
    assert decode_strict("héllo".encode()) == "héllo"
    assert decode_strict(b"") == ""
    assert decode_strict(None) is None


def test_extract_number_rust_semantics():
    assert extract_number("Article 42") == 42
    assert extract_number("no digits") is None
    assert extract_number("a 007 b 8") == 7  # first match, leading zeros ok
    assert extract_number("big 99999999999999") is None  # u32 overflow -> None
    assert extract_number("arabic ٣٤") is None  # Rust u32 parse fails on non-ASCII
    assert extract_number("4294967295 max") == 4294967295
    assert extract_number("4294967296 over") is None


def test_next_link_rfc3986():
    # RFC 3986 §5.3: "./article/2" merges against the base DIRECTORY
    # ("/article/"), so the path nests — identical to Rust Url::join,
    # which the reference uses (basic_spider.rs:125).
    assert next_link("http://h:5000/article/3", 3) == "http://h:5000/article/article/2"
    assert next_link("http://h:5000/article/3", 1) is None
    assert next_link("http://h/a/article/5", 5) == "http://h/a/article/article/4"
    # idempotent shape once nested: directory stays ".../article/"
    assert (
        next_link("http://h:5000/article/article/2", 2)
        == "http://h:5000/article/article/article/1"
    )


def test_parse_response_full_contract():
    html = b"<article>Article 3<author>Ann</author></article>"
    item, links, discovered, text = parse_response("http://h/article/3", html)
    assert item == ("Article 3", "Ann", 3)
    assert links == ["http://h/article/article/2"]
    assert discovered and text == "Article 3Ann"

    # number == 1 -> item, no links
    html1 = b"<article>Article 1<author>A</author></article>"
    item, links, discovered, _ = parse_response("http://h/article/1", html1)
    assert item[2] == 1 and links == [] and discovered

    # no digits -> SpiderResult::None (no item, no discovered)
    htmlx = b"<article>Article X<author>A</author></article>"
    item, links, discovered, _ = parse_response("http://h/article/x", htmlx)
    assert item is None and links == [] and not discovered

    # invalid utf-8 -> Empty response path
    item, links, discovered, text = parse_response("http://h/a", b"\xff\xff")
    assert item is None and text is None and not discovered

    # empty body -> decodes to "" -> no article -> None
    item, links, discovered, _ = parse_response("http://h/a", b"")
    assert item is None


def test_unclosed_tags_autoclose_at_eof():
    html = "<article>Article 2<author>Ann"
    title, author = parse_article_html(html)
    assert title == "Article 2" and author == "Ann"
