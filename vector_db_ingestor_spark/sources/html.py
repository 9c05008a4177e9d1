"""HTML → text extraction, stdlib-only — the step between a WARC
response payload (Common Crawl bodies are overwhelmingly ``text/html``)
and the chunk/quality/dedup pipeline, which wants prose, not markup.

The reference has no web path at all (it ingests local PDFs,
``src/PDFToChromaIngester.py:207-223``); this module plays the role
pypdf plays for PDFs: turn the container format into text the shared
pipeline tail understands.  Like the PDF extractor it is deliberately
conservative and dependency-free: ``html.parser`` (stdlib, tolerant of
broken markup — real crawl HTML is broken), script/style/template
subtrees dropped, block-level tags mapped to newlines so paragraph
structure survives for the chunker's sentence snapping, entities
unescaped by the parser itself (``convert_charrefs=True``), and
whitespace normalized to the single-space/newline shape the text
quality metrics expect.

Plan shape: this is a plain ``bytes/str -> str`` function, used INSIDE
the existing fused Arrow kernel via :func:`build_chunks`'s ``extract``
hook (``pipeline.ingest_warc(html_to_text=True)``) — no new plan
stages, no extra Python round-trips; extraction rides the same
mapInPandas stage that chunks and embeds.
"""

from __future__ import annotations

from html.parser import HTMLParser

# subtrees whose text is never prose
_SKIP = {"script", "style", "template", "noscript", "svg", "head"}
# tags that terminate a text run (block-level, per HTML5 flow content)
_BLOCK = {
    "p", "div", "br", "li", "ul", "ol", "table", "tr", "td", "th",
    "h1", "h2", "h3", "h4", "h5", "h6", "section", "article", "header",
    "footer", "nav", "aside", "blockquote", "pre", "hr", "figure",
    "figcaption", "main", "form", "fieldset", "dl", "dt", "dd",
}


class _TextExtractor(HTMLParser):
    def __init__(self) -> None:
        super().__init__(convert_charrefs=True)
        self._skip_depth = 0
        self._parts: list[str] = []
        self.title_parts: list[str] = []
        self._in_title = False

    def handle_starttag(self, tag: str, attrs) -> None:
        if tag in _SKIP:
            self._skip_depth += 1
        elif tag in _BLOCK:
            self._parts.append("\n")
        if tag == "title":
            self._in_title = True

    def handle_endtag(self, tag: str) -> None:
        if tag in _SKIP and self._skip_depth:
            self._skip_depth -= 1
        elif tag in _BLOCK:
            self._parts.append("\n")
        if tag == "title":
            self._in_title = False

    def handle_data(self, data: str) -> None:
        # <head> is in _SKIP, so title text is captured separately
        if self._in_title:
            self.title_parts.append(data)
        elif not self._skip_depth:
            self._parts.append(data)

    def text(self) -> str:
        # collapse runs of spaces/tabs within lines and blank-line runs
        # between them; the newline structure feeds the chunker's
        # paragraph snapping ("\n\n" is one of its sentence endings)
        lines = [" ".join(seg.split()) for seg in "".join(self._parts).split("\n")]
        out: list[str] = []
        for ln in lines:
            if ln:
                out.append(ln)
            elif out and out[-1] != "":
                out.append("")
        while out and out[-1] == "":
            out.pop()
        return "\n\n".join(ln for ln in "\n".join(out).split("\n\n"))


def _decode_and_trim(html: bytes | str) -> str:
    """Decode (UTF-8, replacement) and drop a trailing UNTERMINATED
    markup construct.  html.parser flushes incomplete constructs as
    raw data at EOF, which would leak markup into the text; the HTML5
    tokenizer instead lets an unterminated comment / CDATA / tag
    swallow everything to EOF — truncating matches the spec.  A bare
    ``<`` before a non-letter stays: that IS text per the tokenizer
    (``< p`` is prose, ``<p`` is a tag)."""
    if isinstance(html, (bytes, bytearray)):
        html = bytes(html).decode("utf-8", "replace")
    # first comment whose "-->" never arrives swallows to EOF
    pos = 0
    while (i := html.find("<!--", pos)) != -1:
        end = html.find("-->", i)
        if end == -1:
            html = html[:i]
            break
        pos = end + 3
    i = html.rfind("<!")
    if i != -1 and html.find(">", i) == -1:
        html = html[:i]
    i = html.rfind("<")
    if i != -1 and html.find(">", i) == -1:
        nxt = html[i + 1 : i + 2]
        if nxt.isalpha() or (nxt == "/" and html[i + 2 : i + 3].isalpha()):
            html = html[:i]
    return html


def html_to_text(html: bytes | str) -> str:
    """Extract readable text from an HTML document (bytes are decoded
    UTF-8 with replacement — crawl charsets lie, and U+FFFD is the
    honest representation of undecodable bytes).  Tolerant of broken
    markup; never raises on malformed input."""
    p = _TextExtractor()
    try:
        p.feed(_decode_and_trim(html))
        p.close()
    except Exception:
        # html.parser is already tolerant; this is a last-resort guard
        # so one pathological document cannot fail a whole segment task
        pass
    return p.text()


def html_title(html: bytes | str) -> str:
    """The document <title>, whitespace-normalized ('' if absent)."""
    p = _TextExtractor()
    try:
        p.feed(_decode_and_trim(html))
        p.close()
    except Exception:
        pass
    return " ".join("".join(p.title_parts).split())
