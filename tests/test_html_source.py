"""sources/html.py: the stdlib HTML→text step between WARC payloads
and the chunk/quality pipeline."""

import gzip

from vector_db_ingestor_spark.sources.html import html_title, html_to_text


def test_html_to_text_drops_markup_and_keeps_structure():
    doc = b"""<!DOCTYPE html><html><head>
    <title>Crawl &amp; Ingest</title>
    <style>body { color: red }</style>
    <script>var tracking = "do not ingest";</script>
    </head><body>
    <h1>Heading</h1>
    <p>First   paragraph with <b>inline</b> markup and an
       &lt;escaped&gt; entity.</p>
    <p>Second paragraph.</p>
    <noscript>fallback junk</noscript>
    <div>List follows:</div><ul><li>one</li><li>two</li></ul>
    </body></html>"""
    text = html_to_text(doc)
    # markup and non-prose subtrees are gone (the only angle brackets
    # left come from the UNESCAPED &lt;escaped&gt; entity — real text)
    assert "<p>" not in text and "<b>" not in text and "</" not in text
    assert "color: red" not in text
    assert "tracking" not in text
    assert "fallback junk" not in text
    # prose survives with entities unescaped and whitespace collapsed
    assert "First paragraph with inline markup" in text
    assert "<escaped> entity" in text
    # block tags became line structure (paragraph breaks for the chunker)
    assert text.index("Heading") < text.index("First paragraph")
    assert "\n" in text
    assert html_title(doc) == "Crawl & Ingest"


def test_html_to_text_tolerates_broken_markup_and_bytes():
    # unclosed tags, bogus nesting, stray ampersands, latin-1 bytes:
    # the crawl reality — must produce text, never raise
    junk = b"<p>caf\xe9 <div><b>bold <p>next & more"
    text = html_to_text(junk)
    assert "bold" in text and "next & more" in text
    assert "�" in text  # undecodable byte surfaced honestly
    assert html_to_text(b"") == ""
    assert html_title(b"<p>no title") == ""


def test_ingest_warc_html_mode_end_to_end(spark, tmp_path):
    """ingest_warc(html_to_text=True): HTML payloads are reduced to
    prose INSIDE the fused kernel, so collection chunks carry no
    markup; plain mode on the same corpus would have chunked tags."""
    from vector_db_ingestor_spark.pipeline import VectorCollection, ingest_warc

    body = (
        "<html><head><title>T</title><script>junk()</script></head><body>"
        + "".join(
            f"<p>Paragraph {i} about distributed ingestion pipelines.</p>"
            for i in range(8)
        )
        + "</body></html>"
    ).encode()
    http = b"HTTP/1.1 200 OK\r\nContent-Type: text/html\r\n\r\n" + body
    rec = (
        b"WARC/1.0\r\nWARC-Type: response\r\n"
        b"WARC-Target-URI: http://h.example/page\r\n"
        b"WARC-Date: 2026-08-15T00:00:00Z\r\n"
        b"Content-Length: " + str(len(http)).encode() + b"\r\n\r\n"
        + http + b"\r\n\r\n"
    )
    raw = tmp_path / "raw"
    raw.mkdir()
    (raw / "seg.warc.gz").write_bytes(gzip.compress(rec))

    report = ingest_warc(
        spark, str(raw), str(tmp_path / "coll"),
        mode="overwrite", chunk_size=120, overlap=20, html_to_text=True,
    ).collect()
    assert [r.status for r in report] == ["ok"]

    rows = VectorCollection(spark, str(tmp_path / "coll")).df().collect()
    assert rows
    joined = " ".join(r.text for r in rows)
    # the first sentence fits inside the first chunk whole; later ones
    # may be split mid-sentence by the chunker (expected)
    assert "Paragraph 0 about distributed ingestion pipelines." in joined
    assert "Paragraph 7" in joined  # the last paragraph made it through
    assert "<p>" not in joined and "junk()" not in joined


def test_html_extractor_total_on_tag_soup():
    """Property: html_to_text never raises and never leaks tag markup,
    whatever soup it is fed — generated nests of open/unclosed/bogus
    tags, entities, and raw bytes."""
    from hypothesis import given, settings
    from hypothesis import strategies as st

    frags = st.one_of(
        st.sampled_from(
            [
                "<p>", "</p>", "<div class='x'>", "<b>", "</b>", "<br>",
                "<script>", "</script>", "<style>", "</style>", "<title>",
                "</title>", "&amp;", "&lt;", "&#65;", "&bogus;", "<",
                "< p", "<!---->", "<!-- open",
            ]
        ),
        st.text(
            alphabet=st.characters(blacklist_categories=("Cs",)), max_size=12
        ),
    )

    @settings(max_examples=80, deadline=None)
    @given(st.lists(frags, max_size=20).map("".join), st.booleans())
    def prop(soup, as_bytes):
        from vector_db_ingestor_spark.sources.html import html_title, html_to_text

        doc = soup.encode("utf-8") if as_bytes else soup
        text = html_to_text(doc)
        assert isinstance(text, str)
        for tag in ("<p>", "</p>", "<div", "<script>", "<style>"):
            assert tag not in text
        assert isinstance(html_title(doc), str)

    prop()
