"""Fast Column literals for large numeric constants.

``F.lit(list_of_floats)`` (and ``F.array(*[F.lit(x) ...])``) issues one
py4j round trip PER ELEMENT, so the model literals this engine embeds in
its plans — 16 x 64 centroid grids, PQ codebooks, ADC tables, hyperplane
banks — cost hundreds of milliseconds of driver time per plan build
(measured: 95 ms for one 64-float array, 845 ms for a 16 x 64 matrix).
Building the same literal as ONE ``F.expr`` string is ~100-700x cheaper
(1.1 ms either way) and bit-identical: ``repr(float)`` is the shortest
round-tripping decimal, and Spark's SQL lexer parses the ``D`` suffix
with ``java.lang.Double.parseDouble`` — the exact inverse.  Parity
(including -0.0, denormals, and 1e308-scale values) is pinned in
tests/test_operators.py.

Driver-side plan-construction cost is real at every scale — it is pure
single-threaded time before any task can launch (optimization guide
§7.3) — and the bench pays it once per rep because each rep rebuilds
the plan.
"""

from __future__ import annotations

import math
from collections.abc import Sequence

from pyspark.sql import Column
from pyspark.sql import functions as F


def _d(x: float) -> str:
    v = float(x)
    if not math.isfinite(v):
        raise ValueError(f"non-finite literal: {x!r}")
    return repr(v) + "D"


def doubles_sql(vals: Sequence[float]) -> str:
    """``array<double>`` literal as a SQL fragment (for composing into a
    larger single-``F.expr`` build).

    Non-empty contract (ADVICE r15 #2): a bare ``array()`` parses as
    ``array<string>``, silently changing the expression's type, so the
    empty case returns an explicitly typed empty-double-array literal
    instead — the same value ``F.lit([])`` cast to array<double> gave
    the call sites this builder replaced."""
    if len(vals) == 0:
        return "CAST(array() AS ARRAY<DOUBLE>)"
    return "array(" + ",".join(_d(v) for v in vals) + ")"


def lit_doubles(vals: Sequence[float]) -> Column:
    """``array<double>`` literal in one py4j call."""
    return F.expr(doubles_sql(vals))


def lit_double_matrix(rows: Sequence[Sequence[float]]) -> Column:
    """``array<array<double>>`` literal in one py4j call.

    An empty matrix is a typed empty literal (see :func:`doubles_sql`);
    an empty INNER row stays a ``ValueError`` — a mixed-shape matrix
    has no sensible meaning for the centroid/codebook grids this
    builds, and every caller derives rows from a fixed ``dim``."""
    if len(rows) == 0:
        return F.expr("CAST(array() AS ARRAY<ARRAY<DOUBLE>>)")
    if any(len(r) == 0 for r in rows):
        raise ValueError("lit_double_matrix: empty inner row")
    return F.expr(
        "array("
        + ",".join("array(" + ",".join(_d(v) for v in r) + ")" for r in rows)
        + ")"
    )
