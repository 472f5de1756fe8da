"""Pure-Python extraction cores — the byte-identity contract.

Reproduces the reference spider's extraction semantics exactly
(``examples/basic_spider.rs:32-66``, ``src/response.rs:30-32``):

* strict UTF-8 decode: invalid bytes -> None (NOT lossy replacement —
  Spark's built-in ``decode(col,'UTF-8')`` substitutes U+FFFD, so this
  must run inside the Arrow UDF).
* first ``<article>`` element; article_text = concatenation of ALL
  descendant text nodes in document order, trimmed.
* first ``article > author`` DIRECT child; author_text likewise.
* missing article or author -> no item.
* ``title = article_text.replace(author_text, "").trim()`` — replace
  ALL occurrences (the reference's Rust ``str::replace`` quirk,
  ``basic_spider.rs:60``).
* number = first ``\\d+`` in title parsed as u32 (ASCII digits only,
  overflow -> None, matching Rust ``parse::<u32>``); number None ->
  the whole parse yields nothing (reference ``SpiderResult::None``
  path — not even a discovered mark, ``basic_spider.rs:117-143``).
* next link = RFC 3986 join of ``./article/{number-1}`` against the
  response URL; chain stops at number == 1.

These are deliberately dependency-free (stdlib ``html.parser``) so the
same bytes-in/bytes-out functions run in pytest and inside executors.
The hand-rolled tree builder covers the reference fixture grammar; a
full HTML5 parser is intentionally avoided (SURVEY.md §7.5: lenient
parsers differ on text-node edges).
"""

from __future__ import annotations

import re
from dataclasses import dataclass, field
from html.parser import HTMLParser
from urllib.parse import urljoin

from ironspark.scan import scan_page

_U32_MAX = 0xFFFFFFFF
_NUM_RE = re.compile(r"\d+")

# HTML void elements never take children (html5ever treats them the same).
_VOID = {
    "area", "base", "br", "col", "embed", "hr", "img", "input",
    "link", "meta", "param", "source", "track", "wbr",
}


@dataclass
class _Node:
    tag: str
    children: list = field(default_factory=list)  # _Node | str text


class _TreeBuilder(HTMLParser):
    """Minimal stack-based DOM: enough for element selection + text()."""

    def __init__(self) -> None:
        super().__init__(convert_charrefs=True)
        self.root = _Node("#document")
        self.stack = [self.root]

    def handle_starttag(self, tag, attrs):
        node = _Node(tag)
        self.stack[-1].children.append(node)
        if tag not in _VOID:
            self.stack.append(node)

    def handle_startendtag(self, tag, attrs):
        self.stack[-1].children.append(_Node(tag))

    def handle_endtag(self, tag):
        # pop to the innermost matching open element, if any
        for i in range(len(self.stack) - 1, 0, -1):
            if self.stack[i].tag == tag:
                del self.stack[i:]
                return

    def handle_data(self, data):
        if data:
            self.stack[-1].children.append(data)


def _find_first(node: _Node, tag: str) -> _Node | None:
    """First element with tag in document order (descendant search)."""
    for ch in node.children:
        if isinstance(ch, _Node):
            if ch.tag == tag:
                return ch
            found = _find_first(ch, tag)
            if found is not None:
                return found
    return None


def _first_direct_child(node: _Node, tag: str) -> _Node | None:
    for ch in node.children:
        if isinstance(ch, _Node) and ch.tag == tag:
            return ch
    return None


def _text(node: _Node) -> str:
    """Concatenate descendant text nodes in document order."""
    out: list[str] = []
    stack: list = list(reversed(node.children))
    while stack:
        ch = stack.pop()
        if isinstance(ch, str):
            out.append(ch)
        else:
            stack.extend(reversed(ch.children))
    return "".join(out)


def decode_strict(body: bytes | None) -> str | None:
    """Reference ``Response::text()``: None unless valid UTF-8."""
    if body is None:
        return None
    try:
        return body.decode("utf-8", errors="strict")
    except UnicodeDecodeError:
        return None


def parse_article_html_spec(html: str) -> tuple[str, str] | None:
    """Executable spec (html.parser tree): (title, author) or None.

    The hot path is ``parse_article_html`` below (single-pass scanner);
    tests/test_scan_parity.py asserts the two agree. This tree-based
    version stays as the semantics definition — if they ever diverge on
    exotic markup, THIS one is correct.
    """
    builder = _TreeBuilder()
    try:
        builder.feed(html)
        builder.close()
    except Exception:
        return None
    article = _find_first(builder.root, "article")
    if article is None:
        return None
    author = _first_direct_child(article, "author")
    if author is None:
        return None
    article_text = _text(article).strip()
    author_text = _text(author).strip()
    title = article_text.replace(author_text, "").strip()
    return title, author_text


def parse_article_html(html: str) -> tuple[str, str] | None:
    """(title, author) per the reference extractor, or None.

    Single-pass scanner fast path (ironspark.scan); byte-identical to
    ``parse_article_html_spec`` (parity-tested)."""
    article_text, author_text, _ = scan_page(html)
    if article_text is None or author_text is None:
        return None
    article_text = article_text.strip()
    author_text = author_text.strip()
    title = article_text.replace(author_text, "").strip()
    return title, author_text


def extract_number(s: str) -> int | None:
    """First \\d+ parsed as u32; Rust parse semantics (ASCII, no overflow)."""
    m = _NUM_RE.search(s)
    if m is None:
        return None
    digits = m.group()
    if not digits.isascii() or int(digits) > _U32_MAX:
        return None
    return int(digits)


def article_text_of_spec(html: str) -> str | None:
    """Executable spec (html.parser tree) for article_text_of."""
    builder = _TreeBuilder()
    try:
        builder.feed(html)
        builder.close()
    except Exception:
        return None
    article = _find_first(builder.root, "article")
    if article is None:
        return None
    return _text(article).strip()


def article_text_of(html: str) -> str | None:
    """Full trimmed article text (the byte-identity oracle column).

    Single-pass scanner fast path, parity-tested against the spec."""
    article_text, _, _ = scan_page(html)
    return None if article_text is None else article_text.strip()


def next_link(url: str, number: int) -> str | None:
    """Reference chain rule: ./article/{n-1}, stop at 1."""
    if number == 1:
        return None
    return urljoin(url, f"./article/{number - 1}")


class _LinkHarvester(HTMLParser):
    """All <a href> values in document order (general-web-graph spider)."""

    def __init__(self) -> None:
        super().__init__(convert_charrefs=True)
        self.hrefs: list[str] = []

    def handle_starttag(self, tag, attrs):
        if tag == "a":
            for k, v in attrs:
                if k == "href" and v:
                    self.hrefs.append(v)
                    break


def harvest_links_spec(html: str, base_url: str) -> list[str]:
    """Executable spec (html.parser) for harvest_links."""
    h = _LinkHarvester()
    try:
        h.feed(html)
        h.close()
    except Exception:
        return []
    out = []
    for href in h.hrefs:
        try:
            out.append(urljoin(base_url, href))
        except ValueError:
            continue
    return out


def _resolve_links(hrefs: list[str], base_url: str) -> list[str]:
    """RFC 3986 resolution with an already-absolute fast path.

    urljoin returns an http(s) absolute href UNCHANGED when the base
    scheme matches or differs (probed: no dot-segment normalization, no
    re-encoding) — so lowercase-scheme absolute links skip the call
    entirely. That is ~100% of links on real web-graph pages.

    EXCEPTION: urllib strips ASCII tab/CR/LF anywhere in a URL
    (WHATWG-aligned, bpo-43882), so an absolute href containing any of
    them must NOT skip the call — hypothesis found the divergence via
    an href ending mid-attribute with a literal tab."""
    out = []
    for href in hrefs:
        # empty-netloc hrefs ("http://", "http:///x") inherit the base
        # netloc in urljoin — only a real host may skip the call
        unsafe = "\t" in href or "\r" in href or "\n" in href
        if not unsafe and href.startswith("http://"):
            if len(href) > 7 and href[7] not in "/?#":
                out.append(href)
                continue
        elif not unsafe and href.startswith("https://"):
            if len(href) > 8 and href[8] not in "/?#":
                out.append(href)
                continue
        try:
            out.append(urljoin(base_url, href))
        except ValueError:
            continue
    return out


def harvest_links(html: str, base_url: str) -> list[str]:
    """Absolute URLs of every <a href>, resolved RFC 3986 against base.

    Single-pass scanner fast path, parity-tested against the spec."""
    _, _, hrefs = scan_page(html)
    return _resolve_links(hrefs, base_url)


def parse_response(url: str, body: bytes | None):
    """Full ExampleSpider.parse contract for one response.

    Returns (item | None, outlinks list, discovered flag, text | None).
    item = (title, author, number); discovered mirrors the reference's
    mark_discovered call site (only on numbered items).
    """
    text = decode_strict(body)
    if text is None:
        return None, [], False, None
    article_text, author_text, _ = scan_page(text)  # ONE pass
    if article_text is None or author_text is None:
        return None, [], False, None
    article_text = article_text.strip()
    author_text = author_text.strip()
    title = article_text.replace(author_text, "").strip()
    number = extract_number(title)
    if number is None:
        return None, [], False, None
    link = next_link(url, number)
    outlinks = [link] if link is not None else []
    return (title, author_text, number), outlinks, True, article_text
