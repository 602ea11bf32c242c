"""Minimal HTML document model on stdlib ``html.parser`` — the
sandbox substitute for the reference's PyQuery-backed ``Response.doc``
(pyspider/libs/response.py:139-163) and the link loops every sample
handler runs (``response.doc('a[href]').items()``,
libs/sample_handler.py:18-20).

Supported selector grammar (enough for the reference's handler corpus):
``tag``, ``#id``, ``.class``, ``[attr]``, ``[attr=value]``, any
combination of those in one simple selector (``a.nav[href]``),
descendant combination (``div a``), and comma lists.  No pseudo
selectors, no siblings — real lxml/PyQuery slots in unchanged outside
the sandbox.

``make_links_absolute`` resolves every a[href]/img[src]/link[href]/
script[src]/form[action] against a base URL the way the reference's
``Response.doc`` property does before handing the tree to user code.
"""

from __future__ import annotations

from html.parser import HTMLParser
from urllib.parse import urljoin

VOID_TAGS = {"area", "base", "br", "col", "embed", "hr", "img", "input",
             "link", "meta", "param", "source", "track", "wbr"}

_URL_ATTRS = (("a", "href"), ("img", "src"), ("link", "href"),
              ("script", "src"), ("iframe", "src"), ("form", "action"),
              ("area", "href"))


class Element:
    __slots__ = ("tag", "attrib", "children", "_text_parts", "parent")

    def __init__(self, tag: str, attrib: dict | None = None, parent=None):
        self.tag = tag
        self.attrib = attrib or {}
        self.children: list[Element] = []
        self._text_parts: list[str] = []
        self.parent = parent

    def attr(self, name: str, default=None):
        return self.attrib.get(name, default)

    @property
    def text(self) -> str:
        """All descendant text, concatenated (PyQuery .text() analogue,
        whitespace-normalized)."""
        parts = list(self._text_parts)
        for c in self.children:
            t = c.text
            if t:
                parts.append(t)
        return " ".join(" ".join(parts).split())

    def iter(self):
        yield self
        for c in self.children:
            yield from c.iter()

    def __repr__(self):
        return f"<Element {self.tag} {self.attrib}>"


class _TreeBuilder(HTMLParser):
    def __init__(self):
        super().__init__(convert_charrefs=True)
        self.root = Element("#document")
        self.stack = [self.root]

    def handle_starttag(self, tag, attrs):
        el = Element(tag, dict(attrs), parent=self.stack[-1])
        self.stack[-1].children.append(el)
        if tag not in VOID_TAGS:
            self.stack.append(el)

    def handle_startendtag(self, tag, attrs):
        el = Element(tag, dict(attrs), parent=self.stack[-1])
        self.stack[-1].children.append(el)

    def handle_endtag(self, tag):
        # close the nearest matching open tag (forgiving, like browsers)
        for i in range(len(self.stack) - 1, 0, -1):
            if self.stack[i].tag == tag:
                del self.stack[i:]
                break

    def handle_data(self, data):
        if data:
            self.stack[-1]._text_parts.append(data)


def _parse_simple(sel: str):
    """'a.nav[href=x]#id' → (tag, ids, classes, [(attr, value|None)])."""
    import re
    tag = None
    ids, classes, attrs = [], [], []
    for kind, val in re.findall(
            r"([.#\[]?)([^.#\[\]]+)\]?", sel.strip()):
        if kind == "":
            tag = val.lower()
        elif kind == ".":
            classes.append(val)
        elif kind == "#":
            ids.append(val)
        elif kind == "[":
            if "=" in val:
                a, v = val.split("=", 1)
                attrs.append((a.strip(), v.strip().strip("'\"")))
            else:
                attrs.append((val.strip(), None))
    return tag, ids, classes, attrs


def _matches(el: Element, parsed) -> bool:
    tag, ids, classes, attrs = parsed
    if el.tag.startswith("#"):
        return False
    if tag not in (None, "*") and el.tag != tag:
        return False
    for i in ids:
        if el.attrib.get("id") != i:
            return False
    if classes:
        have = (el.attrib.get("class") or "").split()
        if any(c not in have for c in classes):
            return False
    for a, v in attrs:
        if a not in el.attrib:
            return False
        if v is not None and el.attrib.get(a) != v:
            return False
    return True


class MiniDoc:
    """Parsed HTML document; call with a selector to get elements
    (``doc('a[href]')``), mirroring the slice of the PyQuery API the
    reference handlers rely on."""

    def __init__(self, html: str | bytes, base_url: str | None = None):
        if isinstance(html, bytes):
            html = html.decode("utf-8", "replace")
        p = _TreeBuilder()
        p.feed(html or "")
        self.root = p.root
        self.base_url = base_url
        if base_url:
            self.make_links_absolute(base_url)

    def make_links_absolute(self, base_url: str) -> "MiniDoc":
        for el in self.root.iter():
            for tag, attr in _URL_ATTRS:
                if el.tag == tag and attr in el.attrib:
                    el.attrib[attr] = urljoin(base_url, el.attrib[attr])
        self.base_url = base_url
        return self

    def __call__(self, selector: str) -> list[Element]:
        out = []
        for alternative in selector.split(","):
            parts = [_parse_simple(s) for s in alternative.split()]
            if not parts:
                continue
            out.extend(self._select(parts))
        return out

    def _select(self, parts) -> list[Element]:
        current = [self.root]
        for parsed in parts:
            nxt = []
            seen = set()
            for scope in current:
                for el in scope.iter():
                    if el is scope:
                        continue
                    if _matches(el, parsed) and id(el) not in seen:
                        seen.add(id(el))
                        nxt.append(el)
            current = nxt
        return current

    @property
    def text(self) -> str:
        return self.root.text


def extract_links(html: str | bytes, base_url: str) -> list[str]:
    """All absolute a[href] URLs in document order — the vectorizable
    core of the reference sample handlers' crawl loops."""
    doc = MiniDoc(html, base_url=base_url)
    return [el.attr("href") for el in doc("a[href]")]


# --- boilerplate-stripping text extraction (jusText/trafilatura-lite) --

_BOILER_TAGS = {"script", "style", "nav", "header", "footer", "aside",
                "noscript", "template", "form", "iframe", "button",
                "select", "option"}
_LEAF_BLOCKS = {"p", "li", "h1", "h2", "h3", "h4", "h5", "h6", "td",
                "th", "blockquote", "pre", "dd", "dt", "figcaption"}
_CONTAINER_BLOCKS = {"div", "section", "article", "main", "body", "ul",
                     "ol", "table", "tr", "#document", "html"}


def _block_words(el: Element) -> tuple[list[str], int]:
    """(words, link_words) of a block: all descendant text except
    boilerplate subtrees and NESTED blocks (a nested <p>/<div> is its
    own candidate — counting it twice would let a link farm hide
    inside a big container)."""
    words: list[str] = []
    link_words = 0

    def walk(e: Element, in_link: bool):
        nonlocal link_words
        ws = " ".join(e._text_parts).split()
        words.extend(ws)
        if in_link:
            link_words += len(ws)
        for c in e.children:
            if c.tag in _BOILER_TAGS:
                continue
            if c.tag in _LEAF_BLOCKS or c.tag in _CONTAINER_BLOCKS:
                continue                      # nested block: its own row
            walk(c, in_link or c.tag == "a")

    walk(el, el.tag == "a")
    return words, link_words


def extract_text(html: str | bytes, min_words: int = 5,
                 max_link_density_pct: int = 50) -> dict:
    """Boilerplate-stripping main-text extraction (the HTML→text stage
    every web-corpus pipeline runs before any quality gate): drop
    script/style/nav/header/footer/aside subtrees outright, treat each
    leaf/container block as a candidate, keep blocks with at least
    ``min_words`` words whose link-word share is below
    ``max_link_density_pct`` (integer compare — deterministic, no
    float), join survivors with a newline.

    Returns {"text", "n_blocks", "n_kept", "n_words"}."""
    doc = MiniDoc(html)
    kept: list[str] = []
    n_blocks = 0

    def consider(el: Element):
        nonlocal n_blocks
        words, link_words = _block_words(el)
        if words:
            n_blocks += 1
            if (len(words) >= min_words
                    and link_words * 100 < max_link_density_pct
                    * len(words)):
                kept.append(" ".join(words))

    def walk(e: Element):
        for c in e.children:
            if c.tag in _BOILER_TAGS:
                continue
            if c.tag in _LEAF_BLOCKS:
                consider(c)
                walk(c)                       # nested blocks inside li/td
            elif c.tag in _CONTAINER_BLOCKS:
                consider(c)                   # its DIRECT inline content
                walk(c)
            else:
                walk(c)                       # inline wrapper: recurse

    walk(doc.root)
    text = "\n".join(kept)
    return {"text": text, "n_blocks": n_blocks, "n_kept": len(kept),
            "n_words": len(text.split())}
