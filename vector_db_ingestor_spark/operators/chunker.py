"""Text chunking — the reference's only 1->N (table-generating) operator.

Behavior-parity reimplementation of ``chunk_text``
(``src/PDFToChromaIngester.py:94-124``), the fixed-window chunker with
sentence-boundary snapping:

* text no longer than ``chunk_size`` passes through whole (unstripped);
* otherwise windows of ``chunk_size`` chars; for every non-final window
  the cut snaps to the *last* sentence ending (``'. '``, ``'! '``,
  ``'? '``, ``'\\n\\n'``) whose start lies in the final ``overlap``
  chars of the window (the cut lands *after* the ending);
* each emitted chunk is stripped; empty chunks are dropped;
* the next window starts ``overlap`` chars before the cut.

Those quirks (last-match snapping, stride measured from the snapped
cut, strip-then-drop) are preserved verbatim.  Correctness gates:
golden unit tests in ``tests/test_chunker.py`` (including exec-ing the
reference's own function for parity), plus an exact DuckDB oracle — a
recursive CTE that advances the (start, snapped-end) state exactly like
this loop (``queries._chunker_oracle``), so the driver hash-checks
chunk values, not just row counts.

Spark mapping: a scalar pandas UDF returning ``array<string>`` +
``posexplode`` -> (chunk_index, chunk).  Chunking is embarrassingly
parallel (narrow, no shuffle); the UDF is Arrow-batched so the Python
cost is per-batch, not per-row.
"""

from __future__ import annotations

from typing import Iterator

import pandas as pd
from pyspark.sql import DataFrame
from pyspark.sql import functions as F
from pyspark.sql import types as T

SENTENCE_ENDS = (". ", "! ", "? ", "\n\n")


def chunk_text(text: str, chunk_size: int = 600, overlap: int = 50) -> list[str]:
    """Pure-Python chunker with reference-identical output."""
    if len(text) <= chunk_size:
        return [text]

    chunks: list[str] = []
    start = 0
    n = len(text)
    while start < n:
        end = start + chunk_size
        if end < n:
            # Reference scans every i in [end-overlap, end) x every
            # ending, keeping the LAST match (src/PDFToChromaIngester.py:110-114).
            # All four endings are length 2, so that is exactly the max
            # rfind over the window text[end-overlap : end+1] — four
            # C-level scans instead of overlap*4 Python slices.
            window = text[end - overlap : end + 1]
            best = max(window.rfind(e) for e in SENTENCE_ENDS)
            if best != -1:
                end = end - overlap + best + 2
        piece = text[start:end].strip()
        if piece:
            chunks.append(piece)
        start = end - overlap
    return chunks


def chunk_udf(chunk_size: int = 600, overlap: int = 50):
    """Arrow-batched chunker UDF: string -> array<string>."""

    @F.pandas_udf(T.ArrayType(T.StringType()))
    def _chunk(batch_iter: Iterator[pd.Series]) -> Iterator[pd.Series]:
        for series in batch_iter:
            yield series.map(
                lambda t: chunk_text(t, chunk_size, overlap) if t is not None else []
            )

    # The function is pure; the marker is an optimizer fence.  Without
    # it, InferFiltersFromGenerate + filter pushdown drag the inferred
    # size(chunks)>0 predicate (and the whole UDF chain feeding it)
    # below the ingest repartition exchange, so extract+chunk run TWICE
    # — once pre-shuffle on the unbalanced input, once post-shuffle.
    return _chunk.asNondeterministic()


def chunk_documents(
    df: DataFrame,
    text_col: str = "text",
    chunk_size: int = 600,
    overlap: int = 50,
) -> DataFrame:
    """1->N chunk explosion: each input row yields (chunk_index, chunk).

    Mirrors ``ingest_pdf``'s chunk loop (``src/PDFToChromaIngester.py:141,155-170``)
    as a narrow, shuffle-free plan: a mapInPandas kernel that emits the
    exploded rows directly — the chunk arrays never round-trip through
    Arrow, and there is no separate Generate(posexplode) node.
    """
    import pandas as pd  # local: keep module import light

    carry = [c for c in df.columns if c != text_col]
    carry_schema = ", ".join(f"{f.name} {f.dataType.simpleString()}" for f in df.schema if f.name != text_col)
    out_schema = f"{carry_schema}, chunk_index int, chunk string" if carry else "chunk_index int, chunk string"

    def kernel(batches):
        for pdf in batches:
            out = {c: [] for c in carry}
            out["chunk_index"] = []
            out["chunk"] = []
            for row_i in range(len(pdf)):
                t = pdf[text_col].iloc[row_i]
                pieces = chunk_text(t, chunk_size, overlap) if t is not None else []
                for i, piece in enumerate(pieces):
                    for c in carry:
                        out[c].append(pdf[c].iloc[row_i])
                    out["chunk_index"].append(i)
                    out["chunk"].append(piece)
            if out["chunk"]:
                yield pd.DataFrame(out)

    return df.mapInPandas(kernel, schema=out_schema)
