"""Property test for the WARC record parser (sources/warc.py): any
payload bytes — including record markers, header fragments, CRLF runs,
and raw binary — must round-trip exactly through record synthesis +
parse, plain and member-per-record gzip alike.  This is the property
exact Content-Length slicing guarantees and marker-scanning parsers
violate."""

import gzip
import zlib

from hypothesis import given, settings
from hypothesis import strategies as st

from vector_db_ingestor_spark.sources.warc import (
    _inflate,
    _parse_warc_records,
    _split_http,
)

# adversarial building blocks mixed with arbitrary bytes
_MARKERS = [
    b"WARC/1.0\r\n",
    b"\r\n\r\n",
    b"Content-Length: 0\r\n",
    b"WARC-Type: response",
    b"\x00\xff\xfe",
]
payloads = st.lists(
    st.one_of(st.binary(max_size=40), st.sampled_from(_MARKERS)),
    max_size=8,
).map(b"".join)


def _record(i: int, body: bytes) -> bytes:
    return (
        b"WARC/1.0\r\nWARC-Type: response\r\n"
        b"WARC-Target-URI: http://p.example/" + str(i).encode() + b"\r\n"
        b"Content-Length: " + str(len(body)).encode() + b"\r\n\r\n"
        + body + b"\r\n\r\n"
    )


@settings(max_examples=60, deadline=None)
@given(st.lists(payloads, min_size=1, max_size=5), st.booleans())
def test_any_payload_roundtrips_exactly(bodies, use_gzip):
    seg = b"".join(_record(i, b) for i, b in enumerate(bodies))
    if use_gzip:
        # member-per-record, the Common Crawl layout
        seg = b"".join(
            gzip.compress(_record(i, b)) for i, b in enumerate(bodies)
        )
    recs = list(_parse_warc_records(_inflate(seg)))
    assert len(recs) == len(bodies)
    for i, (rec, body) in enumerate(zip(recs, bodies)):
        assert rec["headers"]["warc-target-uri"].endswith(f"/{i}")
        assert rec["body"] == body  # byte-exact, no marker confusion


@settings(max_examples=40, deadline=None)
@given(payloads)
def test_http_envelope_split_preserves_body_bytes(body):
    env = b"HTTP/1.1 200 OK\r\nContent-Type: text/plain\r\n\r\n" + body
    status, ctype, payload = _split_http(env)
    assert (status, ctype) == (200, "text/plain")
    assert payload == body


@settings(max_examples=30, deadline=None)
@given(st.lists(st.binary(min_size=1, max_size=60), min_size=1, max_size=4))
def test_inflate_handles_concatenated_members(chunks):
    blob = b"".join(gzip.compress(c) for c in chunks)
    assert _inflate(blob) == b"".join(chunks)
    # plain bytes pass through untouched (unless they start like gzip)
    plain = b"".join(chunks)
    if plain[:2] != b"\x1f\x8b":
        assert _inflate(plain) == plain


def test_inflate_truncated_member_does_not_hang():
    blob = gzip.compress(b"hello world")
    # cut mid-member: must terminate (zlib raises or returns partial,
    # either is acceptable — the property is no infinite loop)
    try:
        out = _inflate(blob[: len(blob) // 2])
        assert b"hello"[: len(out)] in (out[:5], b"hello")
    except zlib.error:
        pass


def test_inflate_corrupt_member_salvages_prior_records():
    """A damaged gzip member must end the walk, not the job: every
    member decompressed before it is kept, the broken tail dropped."""
    import gzip

    from vector_db_ingestor_spark.sources.warc import _inflate

    good1 = gzip.compress(b"record one bytes")
    good2 = gzip.compress(b"record two bytes")
    corrupt = b"\x1f\x8b" + b"\x99" * 40  # gzip magic, garbage stream
    assert _inflate(good1 + good2 + corrupt) == b"record one bytesrecord two bytes"
    assert _inflate(good1 + corrupt + good2) == b"record one bytes"
    assert _inflate(corrupt) == b""


def test_parse_warc_survives_corrupt_segment(spark):
    """End-to-end: a batch holding one healthy gzipped segment and one
    corrupt blob must yield the healthy records and complete — never
    raise out of the kernel."""
    import gzip

    from vector_db_ingestor_spark.sources.warc import parse_warc_bytes

    body = b"HTTP/1.1 200 OK\r\nContent-Type: text/plain\r\n\r\nhello"
    rec = (
        b"WARC/1.0\r\nWARC-Type: response\r\n"
        b"WARC-Target-URI: http://x/1\r\nContent-Length: "
        + str(len(body)).encode()
        + b"\r\n\r\n"
        + body
        + b"\r\n\r\n"
    )
    segments = spark.createDataFrame(
        [("good.warc.gz", bytearray(gzip.compress(rec))),
         ("bad.warc.gz", bytearray(b"\x1f\x8b" + b"\x00" * 64))],
        "path string, content binary",
    )
    rows = parse_warc_bytes(segments).collect()
    assert [r.url for r in rows] == ["http://x/1"]
    assert bytes(rows[0].payload) == b"hello"
