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
  PyMuPDF if installed, else two pure-stdlib extractors — a
  Flate-stream literal-text parser, then a CID/Type0 decoder that
  resolves each page's font resources and maps 2-byte CIDs through
  /ToUnicode CMaps — so the pipeline extracts the full reference
  corpus (8/8 PDFs) with no third-party PDF lib.
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


# ---------------------------------------------------------------------
# engine 4: stdlib CID/Type0 extractor (ToUnicode CMap decoding)
# ---------------------------------------------------------------------

_OBJ_RE = re.compile(rb"(\d+)\s+\d+\s+obj\b(.*?)endobj", re.DOTALL)
_REF_RE_T = rb"/%s\s+(\d+)\s+\d+\s+R"
_BFCHAR_RE = re.compile(rb"beginbfchar(.*?)endbfchar", re.DOTALL)
_BFRANGE_RE = re.compile(rb"beginbfrange(.*?)endbfrange", re.DOTALL)
_HEX_RE = re.compile(rb"<([0-9A-Fa-f]+)>")
_HEXARR_RE = re.compile(rb"\[((?:\s*<[0-9A-Fa-f]+>\s*)+)\]")
_TF_RE = re.compile(rb"/(\w+)\s+[\d.]+\s+Tf")
_SHOW_RE = re.compile(
    rb"<([0-9A-Fa-f]+)>\s*Tj"          # hex show
    rb"|\[(.*?)\]\s*TJ"                # array show (hex items + kerning)
    rb"|/(\w+)\s+[\d.]+\s+Tf"          # font select
    rb"|(T\*|TD|Td|ET)",               # line/label breaks
    re.DOTALL,
)


def _utf16be(hexs: bytes) -> str:
    try:
        return bytes.fromhex(hexs.decode("ascii")).decode("utf-16-be", "ignore")
    except ValueError:  # odd-length / malformed hex
        return ""


def _parse_cmap(stream: bytes) -> dict[int, str]:
    """ToUnicode CMap -> {cid: unicode}; bfchar entries and bfrange
    (both incrementing-destination and explicit-array forms)."""
    cmap: dict[int, str] = {}
    for body in (m.group(1) for m in _BFCHAR_RE.finditer(stream)):
        hx = _HEX_RE.findall(body)
        for src, dst in zip(hx[0::2], hx[1::2]):
            cmap[int(src, 16)] = _utf16be(dst)
    for body in (m.group(1) for m in _BFRANGE_RE.finditer(stream)):
        pos = 0
        while True:
            lo_m = _HEX_RE.search(body, pos)
            if not lo_m:
                break
            hi_m = _HEX_RE.search(body, lo_m.end())
            if not hi_m:
                break
            arr_m = _HEXARR_RE.match(body, hi_m.end() + (
                len(body[hi_m.end():]) - len(body[hi_m.end():].lstrip())
            ))
            lo, hi = int(lo_m.group(1), 16), int(hi_m.group(1), 16)
            if arr_m:  # <lo> <hi> [<d1> <d2> ...]
                dsts = _HEX_RE.findall(arr_m.group(1))
                for i, dst in enumerate(dsts):
                    cmap[lo + i] = _utf16be(dst)
                pos = arr_m.end()
            else:      # <lo> <hi> <dstStart>
                d_m = _HEX_RE.search(body, hi_m.end())
                if not d_m:
                    break
                base = d_m.group(1)
                start = int(base, 16)
                width = len(base)
                for cid in range(lo, min(hi, lo + 65535) + 1):
                    cmap[cid] = _utf16be(
                        format(start + cid - lo, f"0{width}x").encode()
                    )
                pos = d_m.end()
    return cmap


def _obj_stream(raw: bytes) -> bytes | None:
    m = re.search(rb"stream\r?\n", raw)
    if not m:
        return None
    block = raw[m.end(): raw.rfind(b"endstream")]
    try:
        return zlib.decompress(block)
    except zlib.error:
        return block


def _decode_content(content: bytes, fonts: dict[bytes, dict[int, str]]) -> str:
    """Walk text operators: hex shows decode 2-byte CIDs through the
    currently-selected font's ToUnicode map."""
    out: list[str] = []
    cmap: dict[int, str] = next(iter(fonts.values()), {}) if fonts else {}

    def show_hex(hx: bytes) -> None:
        try:
            raw = bytes.fromhex(hx.decode("ascii"))
        except ValueError:
            return
        out.append(
            "".join(
                cmap.get(int.from_bytes(raw[i:i + 2], "big"), "")
                for i in range(0, len(raw) - 1, 2)
            )
        )

    for m in _SHOW_RE.finditer(content):
        hex_tj, arr_tj, tf_name, brk = m.groups()
        if tf_name is not None:
            cmap = fonts.get(tf_name, cmap)
        elif hex_tj is not None:
            show_hex(hex_tj)
        elif arr_tj is not None:
            for item in _HEX_RE.findall(arr_tj):
                show_hex(item)
            out.append(" ")
        elif brk is not None:
            out.append("\n" if brk in (b"T*", b"TD", b"Td") else "\n")
    return "".join(out)


def extract_text_stdlib_cid(data: bytes) -> str:
    """Engine 4: pure-stdlib extractor for CID/Type0 (Identity-H) PDFs.

    Builds per-font cid->unicode maps from /ToUnicode CMap streams,
    resolves each page's /Resources /Font name table, and decodes the
    hex-string text-show operators of its /Contents streams.  Covers
    the dominant generated-PDF shape (Flate streams + Identity-H +
    ToUnicode); pages whose fonts lack a ToUnicode map contribute
    nothing, surfacing in the ingest report like the reference's
    empty-extraction path (src/PDFToChromaIngester.py:130-138).
    """
    objs: dict[int, bytes] = {
        int(m.group(1)): m.group(2) for m in _OBJ_RE.finditer(data)
    }

    def ref(d: bytes, key: bytes) -> int | None:
        m = re.search(_REF_RE_T % key, d)
        return int(m.group(1)) if m else None

    # font object -> parsed ToUnicode cmap
    font_cmaps: dict[int, dict[int, str]] = {}
    for num, raw in objs.items():
        tu = ref(raw, b"ToUnicode")
        if tu is not None and tu in objs:
            stream = _obj_stream(objs[tu])
            if stream:
                cmap = _parse_cmap(stream)
                if cmap:
                    font_cmaps[num] = cmap

    if not font_cmaps:
        return ""

    pieces: list[str] = []
    for num, raw in objs.items():
        if not re.search(rb"/Type\s*/Page\b", raw):
            continue
        # resources may be inline or an indirect object
        res = raw
        res_ref = ref(raw, b"Resources")
        if res_ref is not None and res_ref in objs:
            res = objs[res_ref]
        fonts: dict[bytes, dict[int, str]] = {}
        font_tbl = res
        font_ref = ref(res, b"Font")
        if font_ref is not None and font_ref in objs:
            font_tbl = objs[font_ref]
        for fm in re.finditer(rb"/(\w+)\s+(\d+)\s+\d+\s+R", font_tbl):
            fnum = int(fm.group(2))
            if fnum in font_cmaps:
                fonts[fm.group(1)] = font_cmaps[fnum]
        content_refs = [
            int(c) for c in re.findall(
                rb"(\d+)\s+\d+\s+R",
                (re.search(rb"/Contents\s*(\[[^\]]*\]|\d+\s+\d+\s+R)", raw) or
                 re.match(rb"$^", b"")).group(0) if re.search(
                    rb"/Contents", raw) else b"",
            )
        ]
        for cnum in content_refs:
            if cnum in objs:
                stream = _obj_stream(objs[cnum])
                if stream:
                    pieces.append(_decode_content(stream, fonts))
        pieces.append("\n")
    text = re.sub(r"[ \t]+", " ", "".join(pieces))
    text = re.sub(r"\n{3,}", "\n\n", text).strip()
    return text


def extract_pdf_text(data: bytes) -> str:
    """Engine chain with the reference's fallback semantics: next engine
    only when the previous produced no text."""
    for engine in (
        _extract_pypdf,
        _extract_pymupdf,
        extract_text_stdlib,
        extract_text_stdlib_cid,
    ):
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
