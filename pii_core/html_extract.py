"""HTML main-content extraction (boilerplate strip). [NORTH-ONLY]

The north rule requires a DOM-heuristic main-content stage (tag-density,
link-ratio, text-block segmentation) ahead of PII extraction; the reference
has no HTML handling, so this spec is defined here from public
boilerplate-removal literature (Arc90 Readability / Boilerpipe-style
heuristics) and FROZEN — golden tests in tests/test_html_extract.py pin the
exact output so "byte-identical extracted text per url" is a testable
invariant.

Spec (deterministic, document order):
1. Parse with the stdlib HTMLParser (convert_charrefs=True → entities decoded).
2. Content inside script/style/noscript/template/svg/head/nav/header/footer/
   aside/form/button/iframe is dropped, as is any element whose class or id
   matches the BOILERPLATE_HINT regex (menu/nav/footer/sidebar/ad/banner/
   cookie/comment/share/promo).
3. Text accumulates into blocks delimited by block-level tags; per block we
   track total chars and chars contributed inside <a> (link chars).
4. A block is kept iff its normalized text has
     - >= 8 chars for headings h1-h3 with link_ratio < 0.5, or
     - >= 25 chars with link_ratio <= 1/3 otherwise.
5. Normalization: runs of whitespace collapse to a single space; block text is
   stripped. Kept blocks join with "\n\n".
6. Empty/undecodable html → "".

Pure stdlib; runs vectorized over Arrow batches in the Spark engine.
"""

from __future__ import annotations

import re
from html.parser import HTMLParser

_DROP_SUBTREE = frozenset({
    "script", "style", "noscript", "template", "svg", "head", "nav",
    "header", "footer", "aside", "form", "button", "iframe",
})
_BLOCK_TAGS = frozenset({
    "p", "div", "section", "article", "main", "li", "td", "th", "blockquote",
    "pre", "h1", "h2", "h3", "h4", "h5", "h6", "ul", "ol", "table", "tr",
    "br", "body",
})
_HEADINGS = frozenset({"h1", "h2", "h3"})
BOILERPLATE_HINT = re.compile(
    r"(?:^|[\s_-])(?:menu|nav|navbar|footer|sidebar|side-bar|ad|ads|advert|"
    r"banner|cookie|comment|comments|share|social|promo|related|breadcrumb)"
    r"(?:$|[\s_-])",
    re.IGNORECASE,
)
_WS_RUN = re.compile(r"\s+")

# The FULL HTML5 void set matters for drop correctness, not just stack
# hygiene: a void tag is never pushed, so nothing ever decrements a drop it
# started — a boilerplate-classed <embed>/<source>/<wbr> from the old
# partial set opened a drop that silently swallowed every following
# sibling (PII included) until an ancestor closed.
_VOID_TAGS = frozenset({
    "area", "base", "br", "col", "embed", "hr", "img", "input", "link",
    "meta", "param", "source", "track", "wbr",
})


class _Block:
    __slots__ = ("tag", "parts", "link_chars")

    def __init__(self, tag: str):
        self.tag = tag
        self.parts: list[str] = []
        self.link_chars = 0

    def text(self) -> str:
        return _WS_RUN.sub(" ", "".join(self.parts)).strip()


class _ContentParser(HTMLParser):
    def __init__(self) -> None:
        super().__init__(convert_charrefs=True)
        self.blocks: list[_Block] = []
        self._cur = _Block("body")
        self._drop_depth = 0
        self._link_depth = 0
        # Open-element stack: (tag, adds_drop, adds_link). End tags pop by
        # name with implied-end-tag recovery (everything above the matched
        # element is closed too), so unclosed tags — <li>/<p> without end
        # tags are valid HTML, unclosed <a> is ubiquitous in the wild —
        # cannot leak drop/link state over the rest of the document.
        self._stack: list[tuple[str, bool, bool]] = []

    def updatepos(self, i: int, j: int) -> int:
        # stdlib tracks (lineno, offset) purely for getpos()/error messages,
        # which this extractor never reads — the per-chunk line counting is
        # ~10% of parse time on tag-dense pages. Parsing decisions never
        # depend on position, so skipping the bookkeeping cannot change
        # output (golden + 1000-case fuzz suites pin byte-identity).
        return j

    # -- helpers --
    def _flush(self, next_tag: str) -> None:
        if self._cur.parts:
            self.blocks.append(self._cur)
        self._cur = _Block(next_tag)

    @staticmethod
    def _is_boiler(attrs: list[tuple[str, str | None]]) -> bool:
        for k, v in attrs:
            if k in ("class", "id") and v and BOILERPLATE_HINT.search(v):
                return True
        return False

    def _pop_entry(self, entry: tuple[str, bool, bool]) -> None:
        _tag, adds_drop, adds_link = entry
        if adds_drop:
            self._drop_depth -= 1
        if adds_link and self._link_depth:
            self._link_depth -= 1

    # -- parser events --
    def handle_starttag(self, tag: str, attrs: list[tuple[str, str | None]]) -> None:
        adds_drop = tag in _DROP_SUBTREE or self._is_boiler(attrs)
        adds_link = tag == "a" and not adds_drop and not self._drop_depth
        if tag not in _VOID_TAGS:
            self._stack.append((tag, adds_drop, adds_link))
        if adds_drop:
            # Void tags are never pushed, so nothing would ever decrement the
            # counter: a boilerplate-classed <img>/<input> must not start a
            # drop (it has no content to drop anyway).
            if tag not in _VOID_TAGS:
                self._drop_depth += 1
            return
        if self._drop_depth:
            return
        if adds_link:
            self._link_depth += 1
        if tag in _BLOCK_TAGS:
            self._flush(tag)

    def handle_endtag(self, tag: str) -> None:
        for i in range(len(self._stack) - 1, -1, -1):
            if self._stack[i][0] == tag:
                while len(self._stack) > i:
                    self._pop_entry(self._stack.pop())
                break
        # Flush on the MATCHED element being a block tag (or a stray block end
        # tag — </br>/</p> with no open element occur in wild HTML), provided
        # the parser is no longer inside a dropped subtree. Using the current
        # drop state rather than the pre-pop state means closing a block that
        # wraps an open boilerplate child (<div>text<span class="ad">…</div>)
        # still flushes the accumulated block.
        if tag in _BLOCK_TAGS and not self._drop_depth:
            self._flush("body")

    def handle_data(self, data: str) -> None:
        if self._drop_depth or not data:
            return
        self._cur.parts.append(data)
        if self._link_depth:
            self._cur.link_chars += len(data)

    def close(self) -> None:  # flush the trailing block
        super().close()
        if self._cur.parts:
            self.blocks.append(self._cur)
            self._cur = _Block("body")


_META_CHARSET_RE = re.compile(
    rb"<meta[^>]+charset\s*=\s*[\"']?\s*([A-Za-z0-9_\-]+)", re.IGNORECASE)


def _decode_html(b: bytes) -> str:
    """Deterministic charset resolution (frozen spec, step 0):

    1. A BOM wins (utf-8-sig / utf-16 le / utf-16 be).
    2. Else the first ``<meta ... charset=X`` declaration in the leading
       2048 bytes, when X names a codec Python knows.
    3. Else strict utf-8; if that fails, windows-1252 — the dominant
       legacy encoding of the pt-BR web this taxonomy targets. Blind
       utf-8-with-replace would mojibake every accented character of a
       Latin-1 page ('José' -> 'Jos\\ufffd') and the name/gazetteer
       patterns ([a-zà-ÿ]) would silently stop matching — degraded PII
       recall with no error anywhere.

    All branches decode with errors="replace", so the result is always a
    str and the choice is a pure function of the bytes."""
    if b.startswith(b"\xef\xbb\xbf"):
        return b.decode("utf-8-sig", errors="replace")
    if b.startswith((b"\xff\xfe", b"\xfe\xff")):
        return b.decode("utf-16", errors="replace")
    m = _META_CHARSET_RE.search(b[:2048])
    if m:
        name = m.group(1).decode("ascii", errors="replace").lower()
        try:
            import codecs  # noqa: PLC0415

            codecs.lookup(name)
        except LookupError:
            name = None
        if name:
            return b.decode(name, errors="replace")
    try:
        return b.decode("utf-8")
    except UnicodeDecodeError:
        return b.decode("windows-1252", errors="replace")


def html_to_text(html: bytes | str | None) -> str:
    """Extract main-content text from raw HTML bytes (or str) per the frozen
    spec above. Returns "" for empty/undecodable input; never raises."""
    if html is None:
        return ""
    if isinstance(html, (bytes, bytearray, memoryview)):
        try:
            html = _decode_html(bytes(html))
        except Exception:
            return ""
    if not html.strip():
        return ""
    # Tag-free fast path: with no '<' (no markup) and no '&' (no entities to
    # decode) the parser would emit the whole input as ONE body block, so the
    # keep rule reduces to the >=25-chars check on the normalized text (link
    # ratio is 0). Byte-identical to the parser path — pinned by a property
    # test — at ~20x the throughput for plain-text payloads.
    if "<" not in html and "&" not in html:
        txt = _WS_RUN.sub(" ", html).strip()
        return txt if len(txt) >= 25 else ""
    return _html_to_text_parsed(html)


def html_to_text_strict(html: bytes | str | None) -> str:
    """``html_to_text`` that lets a PARSER CRASH surface instead of
    returning "" (the pipeline path, mirroring ``pdf_to_text_strict``): a
    page the parser could not walk must quarantine fail-closed, not be
    recorded as publishable-with-no-spans — '' cannot distinguish "all
    boilerplate" from "never scanned". The stdlib parser is designed to
    recover from malformed markup, so in practice this raises ~never; the
    distinction is the contract, not the frequency."""
    if html is None:
        return ""
    if isinstance(html, (bytes, bytearray, memoryview)):
        html = _decode_html(bytes(html))
    if not html.strip():
        return ""
    if "<" not in html and "&" not in html:
        txt = _WS_RUN.sub(" ", html).strip()
        return txt if len(txt) >= 25 else ""
    return _html_to_text_parsed(html, strict=True)


def _html_to_text_parsed(html: str, strict: bool = False) -> str:
    """The full HTMLParser path (the frozen spec's step 1-6)."""
    parser = _ContentParser()
    try:
        parser.feed(html)
        parser.close()
    except Exception:
        if strict:
            raise
        return ""

    kept: list[str] = []
    for blk in parser.blocks:
        txt = blk.text()
        if not txt:
            continue
        raw_len = sum(len(p) for p in blk.parts)
        link_ratio = blk.link_chars / raw_len if raw_len else 0.0
        if blk.tag in _HEADINGS:
            if len(txt) >= 8 and link_ratio < 0.5:
                kept.append(txt)
        elif len(txt) >= 25 and link_ratio <= 1 / 3:
            kept.append(txt)
    return "\n\n".join(kept)
