"""Differential check vs pypdf for the stdlib PDF extractor (R2).

The reference extracts with PyPDF2's page loop
(``src/PDFToChromaIngester.py:68-79``); our engine uses a stdlib-only
extractor whose output is frozen as content goldens
(tests/test_pipeline.py).  This test closes the remaining cross-engine
parity gap WHENEVER pypdf is installable (it is not in the build image
— import-gated exactly like the SentenceTransformer embedder):
whitespace-normalized similarity against pypdf's extraction must clear
a per-file threshold, so chunk boundaries cannot silently drift from
what a reference run would produce."""

from __future__ import annotations

import difflib
import pathlib
import re

import pytest

pypdf = pytest.importorskip("pypdf")

PDF_DIR = pathlib.Path("/root/reference/pdf_datasets")


def _norm(s: str) -> str:
    return re.sub(r"\s+", " ", s).strip()


@pytest.mark.skipif(not PDF_DIR.exists(), reason="reference corpus not present")
@pytest.mark.parametrize(
    "pdf", sorted(PDF_DIR.glob("*.pdf")), ids=lambda p: p.stem
)
def test_stdlib_extractor_tracks_pypdf(pdf: pathlib.Path) -> None:
    from vector_db_ingestor_spark.sources.pdf import extract_pdf_text

    reader = pypdf.PdfReader(str(pdf))
    # the reference's exact page join: extract_text() + "\n" per page
    ref = "".join(page.extract_text() + "\n" for page in reader.pages)
    ours = extract_pdf_text(pdf.read_bytes())
    a, b = _norm(ours), _norm(ref)
    assert b, f"{pdf.name}: pypdf extracted nothing"
    sim = difflib.SequenceMatcher(None, a, b).ratio()
    assert sim >= 0.9, (
        f"{pdf.name}: normalized similarity to pypdf {sim:.3f} < 0.9 — "
        f"chunk boundaries would drift from a reference run"
    )
