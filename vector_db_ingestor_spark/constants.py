"""Deterministic constants shared by the Spark queries and their DuckDB
oracle SQL.

The reference embeds free-text queries at search time
(``src/PDFToChromaIngester.py:228-231``); the driver fixtures instead
ship pre-embedded 64-d vectors, so declared top-k queries score against
a fixed probe vector.  The probe is generated from a closed-form formula
(no RNG) and rounded to 6 dp; the SQL literal is rendered from the same
Python list, so both engines consume bit-identical doubles.
"""

from __future__ import annotations

import math

EMBEDDING_DIM = 64

#: Fixed probe vector used by q_topk_cosine / q_knn_per_label.
PROBE_64: list[float] = [round(math.sin(i + 1.0), 6) for i in range(EMBEDDING_DIM)]

#: Probe batch for q_topk_batch (Chroma query_texts is a list): the
#: base probe plus two deterministic variants.
PROBE_BATCH: list[list[float]] = [
    PROBE_64,
    list(reversed(PROBE_64)),
    [round(math.cos(i + 1.0), 6) for i in range(EMBEDDING_DIM)],
]


def probe_sql_literal(probe: list[float] | None = None) -> str:
    """Render the probe as a DuckDB DOUBLE[] literal."""
    vals = PROBE_64 if probe is None else probe
    return "[" + ", ".join(repr(v) for v in vals) + "]::DOUBLE[]"
