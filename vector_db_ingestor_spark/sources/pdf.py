"""Distributed PDF source (reference R1-R3).

The reference walks a directory with ``glob`` and a sequential per-file
loop (``ingest_directory``, src/PDFToChromaIngester.py:207-223), then
extracts text per file with PyPDF2 and falls back to PyMuPDF when the
first engine returns nothing (src/PDFToChromaIngester.py:68-92,130-138).

Spark-first mapping:

* the directory walk becomes ``spark.read.format("binaryFile")`` with a
  ``pathGlobFilter`` — a distributed file scan; each PDF's bytes arrive
  as one row (narrow, no shuffle; files are split units, so
  parallelism = number of files, which is the right granularity for
  whole-file parsers);
* extraction is an Arrow-batched pandas UDF over the binary column
  with the same engine-fallback chain: pypdf if installed, else
  PyMuPDF if installed, else a pure-stdlib Flate-stream text extractor
  (zlib + PDF text-operator parsing) so the pipeline works in this
  image with no third-party PDF lib.
"""

from __future__ import annotations

import re
import zlib
from typing import Iterator

import pandas as pd
from pyspark.sql import DataFrame, SparkSession
from pyspark.sql import functions as F
from pyspark.sql import types as T

# ---------------------------------------------------------------------
# engines
# ---------------------------------------------------------------------

def _extract_pypdf(data: bytes) -> str:  # pragma: no cover - lib not in image
    """Engine 1 (reference extract_text_pypdf2, src/PDFToChromaIngester.py:68-79)."""
    import io

    try:
        import pypdf

        reader = pypdf.PdfReader(io.BytesIO(data))
    except ImportError:
        import PyPDF2

        reader = PyPDF2.PdfReader(io.BytesIO(data))
    return "\n".join((page.extract_text() or "") for page in reader.pages)


def _extract_pymupdf(data: bytes) -> str:  # pragma: no cover - lib not in image
    """Engine 2 fallback (reference extract_text_pymupdf, src/PDFToChromaIngester.py:81-92)."""
    import fitz

    doc = fitz.open(stream=data, filetype="pdf")
    return "\n".join(page.get_text() for page in doc)


_TEXT_SHOW_RE = re.compile(rb"\((?:\\.|[^\\()])*\)\s*(?:Tj|')|\[(?:[^\]])*\]\s*TJ")
_STRING_RE = re.compile(rb"\((?:\\.|[^\\()])*\)")
_ESCAPES = {
    b"\\n": b"\n", b"\\r": b"\r", b"\\t": b"\t", b"\\b": b"\b",
    b"\\f": b"\f", b"\\(": b"(", b"\\)": b")", b"\\\\": b"\\",
}


def _decode_pdf_string(raw: bytes) -> bytes:
    out = raw[1:-1]
    for esc, rep in _ESCAPES.items():
        out = out.replace(esc, rep)
    out = re.sub(rb"\\([0-7]{1,3})", lambda m: bytes([int(m.group(1), 8) & 0xFF]), out)
    return out


def extract_text_stdlib(data: bytes) -> str:
    """Engine 3: pure-stdlib extractor for Flate-compressed text PDFs.

    Decompresses every ``stream..endstream`` block with zlib and pulls
    the literal strings out of Tj/TJ text-show operators.  Handles the
    common case (uncompressed text operators inside FlateDecode content
    streams, WinAnsi/ASCII-ish encodings); CID/Type0-encoded text comes
    out garbled-or-empty, which then surfaces in the ingest report
    (status column) exactly like the reference's empty-extraction path
    (src/PDFToChromaIngester.py:130-138).
    """
    pieces: list[str] = []
    for m in re.finditer(rb"stream\r?\n", data):
        start = m.end()
        end = data.find(b"endstream", start)
        if end < 0:
            continue
        block = data[start:end]
        try:
            content = zlib.decompress(block)
        except zlib.error:
            content = block
        if b"Tj" not in content and b"TJ" not in content and b"'" not in content:
            continue
        for tm in _TEXT_SHOW_RE.finditer(content):
            token = tm.group(0)
            for sm in _STRING_RE.finditer(token):
                decoded = _decode_pdf_string(sm.group(0))
                try:
                    pieces.append(decoded.decode("latin-1"))
                except UnicodeDecodeError:
                    continue
            pieces.append(" ")
        pieces.append("\n")
    text = "".join(pieces)
    # CID/Type0-encoded strings decode to high-byte mojibake: if the
    # output is not mostly printable ASCII, report extraction failure
    # (empty) so the caller's fallback/status path triggers, mirroring
    # the reference's empty-text handling (src/PDFToChromaIngester.py:130-138).
    if not text:
        return ""
    printable = sum(1 for ch in text if ch in "\n\t" or " " <= ch <= "~")
    if printable / len(text) < 0.6:
        return ""
    cleaned = re.sub(r"[^\x20-\x7E\n\t]", "", text)
    tokens = cleaned.split()
    if not tokens:
        return ""
    words = sum(1 for t in tokens if len(t) >= 2 and t.isalpha())
    if words / len(tokens) < 0.4:
        return ""
    return cleaned.strip()


def extract_pdf_text(data: bytes) -> str:
    """Engine chain with the reference's fallback semantics: next engine
    only when the previous produced no text."""
    for engine in (_extract_pypdf, _extract_pymupdf, extract_text_stdlib):
        try:
            text = engine(data)
        except Exception:  # noqa: BLE001 - parity: log-and-continue per engine
            text = ""
        if text and text.strip():
            return text
    return ""


# ---------------------------------------------------------------------
# Spark surface
# ---------------------------------------------------------------------

@F.pandas_udf(T.StringType())
def _extract_text_udf(batch_iter: Iterator[pd.Series]) -> Iterator[pd.Series]:
    for series in batch_iter:
        yield series.map(lambda b: extract_pdf_text(bytes(b)) if b is not None else "")


# Pure function; nondeterministic marker = optimizer fence so filters
# referencing the extracted text are never pushed below the ingest
# repartition (which would re-run extraction on both sides of the
# exchange — see chunker.chunk_udf).
extract_text_udf = _extract_text_udf.asNondeterministic()


def scan_pdfs(spark: SparkSession, directory: str, glob: str = "*.pdf") -> DataFrame:
    """Distributed replacement for the reference's glob + for-loop
    (src/PDFToChromaIngester.py:210,218-221)."""
    return (
        spark.read.format("binaryFile")
        .option("pathGlobFilter", glob)
        .load(directory)
        .select(
            F.col("path").alias("source"),
            F.regexp_extract(F.col("path"), r"[^/]+$", 0).alias("filename"),
            F.col("length").alias("file_bytes"),
            F.col("content"),
        )
    )
