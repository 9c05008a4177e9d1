"""WARC (Web ARChive, ISO 28500) document source — the Common Crawl
container format, i.e. THE arrival format for web-scale training
corpora.  The reference ingests only local PDFs
(``src/PDFToChromaIngester.py:207-223``); a 100 TB pipeline's front
door is a bucket of ``.warc.gz`` segments.

Spark-first shape: ``binaryFile`` scans the segment files (one task
per file — WARC gzip members are not split-pointable without an
external index, and crawl segments arrive pre-sharded at ~1 GB each,
so per-file parallelism IS the natural partitioning), and a stdlib
``mapInPandas`` parser walks each segment's records.  No third-party
warc library: the format is length-delimited headers + body, and
gzipped segments are concatenated gzip members that ``zlib`` handles
in one decompress pass.

Output rows land in a (source, url, warc_date, record_type,
content_type, http_status, payload) shape; ``warc_responses`` narrows
to HTTP 200 responses with the HTTP envelope stripped — the rows a
text-extraction/quality pipeline starts from.

Memory contract: ``binaryFile`` materializes a whole segment per task
(the same contract as the PDF scan); standard crawl shards (~1 GB)
fit executor memory comfortably at 32 tasks / 128 GiB.
"""

from __future__ import annotations

import io
import zlib
from collections.abc import Iterator

import pandas as pd
from pyspark.sql import DataFrame, SparkSession
from pyspark.sql import functions as F

WARC_SCHEMA = (
    "source STRING, url STRING, warc_date STRING, record_type STRING, "
    "content_type STRING, http_status INT, payload BINARY"
)


def _inflate(blob: bytes) -> bytes:
    """Decompress a (possibly multi-member) gzip blob; pass plain
    bytes through.  Crawl segments are MEMBER-PER-RECORD gzip — a
    single ``gzip.decompress`` stops at the first member, so loop
    with raw zlib streams until the buffer is exhausted.

    Corruption policy (a 100 TB crawl ALWAYS contains damaged
    members): a member that fails to inflate ends the walk and the
    bytes of every member decompressed BEFORE it are returned — the
    task salvages the good records and drops the broken tail instead
    of dying (one bad segment must never fail a whole job; WARC
    records are self-delimiting, so salvage truncates only at a
    record boundary of the damaged member)."""
    if blob[:2] != b"\x1f\x8b":
        return blob
    out = io.BytesIO()
    pos = 0
    while pos < len(blob):
        d = zlib.decompressobj(16 + zlib.MAX_WBITS)
        try:
            out.write(d.decompress(blob[pos:]))
        except zlib.error:
            break  # damaged member: keep everything before it
        tail = d.unused_data
        if not tail:
            break
        pos = len(blob) - len(tail)
    return out.getvalue()


def _parse_warc_records(raw: bytes) -> Iterator[dict]:
    """Walk WARC/1.x records: header block terminated by CRLFCRLF,
    body sized EXACTLY by Content-Length (never by scanning for the
    next record marker — bodies may contain ``WARC/1.0`` bytes), then
    the two record-separator CRLFs."""
    pos = 0
    n = len(raw)
    while pos < n:
        # tolerate leading separators / trailing junk
        while pos < n and raw[pos:pos + 1] in (b"\r", b"\n"):
            pos += 1
        if pos >= n or not raw[pos:pos + 5] == b"WARC/":
            break
        head_end = raw.find(b"\r\n\r\n", pos)
        if head_end < 0:
            break
        headers: dict[str, str] = {}
        for line in raw[pos:head_end].decode("utf-8", "replace").split("\r\n")[1:]:
            k, _, v = line.partition(":")
            if _:
                headers[k.strip().lower()] = v.strip()
        try:
            length = int(headers.get("content-length", "0"))
        except ValueError:
            length = 0
        body_start = head_end + 4
        body = raw[body_start:body_start + length]
        pos = body_start + length
        yield {"headers": headers, "body": body}


def _split_http(body: bytes) -> tuple[int | None, str | None, bytes]:
    """(status, content-type, payload) from an HTTP response envelope;
    (None, None, body) when the body isn't HTTP."""
    if not body.startswith(b"HTTP/"):
        return None, None, body
    head_end = body.find(b"\r\n\r\n")
    if head_end < 0:
        return None, None, body
    lines = body[:head_end].decode("utf-8", "replace").split("\r\n")
    parts = lines[0].split()
    try:
        status = int(parts[1])
    except (IndexError, ValueError):
        status = None
    ctype = None
    for line in lines[1:]:
        k, _, v = line.partition(":")
        if k.strip().lower() == "content-type":
            ctype = v.strip()
            break
    return status, ctype, body[head_end + 4:]


def parse_warc_bytes(segments: DataFrame) -> DataFrame:
    """Parse a (path STRING, content BINARY) DataFrame of WARC segment
    bytes into one row per record — the column-level core both
    :func:`scan_warc` (binaryFile-backed) and in-memory callers (e.g.
    the driver-checked ``q_warc_pipeline`` over synthesized segments)
    share.

    ``record_type`` is the WARC-Type header (response / request /
    warcinfo / metadata / ...); for HTTP response records the envelope
    is parsed into ``http_status`` / ``content_type`` and ``payload``
    carries the body WITHOUT the HTTP headers; for everything else
    ``payload`` is the raw record body.
    """

    def parse(batches: Iterator[pd.DataFrame]) -> Iterator[pd.DataFrame]:
        for pdf in batches:
            rows = []
            for src, blob in zip(pdf["path"], pdf["content"]):
                for rec in _parse_warc_records(_inflate(bytes(blob))):
                    h = rec["headers"]
                    rtype = h.get("warc-type", "")
                    status, ctype, payload = (None, None, rec["body"])
                    if rtype == "response":
                        status, ctype, payload = _split_http(rec["body"])
                    rows.append(
                        {
                            "source": src,
                            "url": h.get("warc-target-uri"),
                            "warc_date": h.get("warc-date"),
                            "record_type": rtype,
                            "content_type": ctype
                            or h.get("content-type", "").split(";")[0] or None,
                            "http_status": status,
                            "payload": payload,
                        }
                    )
            yield pd.DataFrame(
                rows,
                columns=[
                    "source", "url", "warc_date", "record_type",
                    "content_type", "http_status", "payload",
                ],
            )

    return segments.select("path", "content").mapInPandas(parse, WARC_SCHEMA)


def scan_warc(spark: SparkSession, path: str, glob: str = "*.warc*") -> DataFrame:
    """All WARC records under ``path``, one row each — ``binaryFile``
    per-segment tasks feeding :func:`parse_warc_bytes`."""
    return parse_warc_bytes(
        spark.read.format("binaryFile").option("pathGlobFilter", glob).load(path)
    )


def warc_responses(spark: SparkSession, path: str, glob: str = "*.warc*") -> DataFrame:
    """The pipeline entry view: HTTP 200 response records shaped like
    the other document sources — (source, filename=url, file_bytes,
    text decoded best-effort UTF-8) — so WARC crawl segments feed the
    same chunk→quality→dedup→embed chain as every other source."""
    recs = scan_warc(spark, path, glob)
    return recs.filter(
        (F.col("record_type") == "response") & (F.col("http_status") == 200)
    ).select(
        "source",
        F.col("url").alias("filename"),
        F.length("payload").alias("file_bytes"),
        F.col("payload").cast("string").alias("text"),
        "content_type",
        "warc_date",
    )
