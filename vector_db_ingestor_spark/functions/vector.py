"""Vector distance / similarity as pure Column expressions.

The reference delegates similarity to ChromaDB's HNSW index with the
default ``l2`` space (collection creation at
``src/PDFToChromaIngester.py:51-54``); its BGE variants L2-normalize
embeddings (``src/PDFToChromaIngestorBgeEmbedding.py:45``) which makes
L2 rank-equivalent to cosine.  Here the same math is expressed as
built-in higher-order-function expressions (``zip_with`` +
``aggregate``), so scoring stays JVM-side inside whole-stage codegen —
no Python round trip — and is dimension-agnostic (the fixtures are 64-d,
the reference models 384-d).

All arithmetic is done in double precision regardless of the stored
array element type (the fixtures store ``array<float>``): inputs are
cast up front so Spark and the DuckDB oracle accumulate identically.
The fold order of ``aggregate`` is the array order — deterministic.
"""

from __future__ import annotations

from pyspark.sql import Column
from pyspark.sql import functions as F


def _as_double(v: Column | str) -> Column:
    c = F.col(v) if isinstance(v, str) else v
    return c.cast("array<double>")


def dot(a: Column | str, b: Column | str) -> Column:
    """Dot product of two array columns (double accumulation)."""
    return F.aggregate(
        F.zip_with(_as_double(a), _as_double(b), lambda x, y: x * y),
        F.lit(0.0),
        lambda acc, v: acc + v,
    )


def dot_sql(a: str, b: str) -> str:
    """:func:`dot` as a SQL fragment over SQL sub-expressions.

    Parses to the identical ArrayAggregate/ZipWith tree (same casts,
    same 0.0 double seed, same left-to-right fold), but building the
    expression costs ONE py4j round trip via ``F.expr`` instead of
    ~26 ms of per-lambda py4j/py-inspection work — plan-construction
    time the bench pays on every invocation (optimization guide §7.3).
    """
    return (
        f"aggregate(zip_with(CAST({a} AS ARRAY<DOUBLE>),"
        f" CAST({b} AS ARRAY<DOUBLE>), (x, y) -> x * y),"
        f" 0.0D, (acc, v) -> acc + v)"
    )


def l2_norm_sql(a: str) -> str:
    """:func:`l2_norm` as a SQL fragment (see :func:`dot_sql`)."""
    return f"sqrt({dot_sql(a, a)})"


def l2_norm(a: Column | str) -> Column:
    return F.sqrt(dot(a, a))


def l2_distance(a: Column | str, b: Column | str) -> Column:
    diff = F.zip_with(_as_double(a), _as_double(b), lambda x, y: x - y)
    return F.sqrt(
        F.aggregate(diff, F.lit(0.0), lambda acc, v: acc + v * v)
    )


def cosine_similarity(a: Column | str, b: Column | str) -> Column:
    """cos(a, b) = a.b / (|a| |b|); matches DuckDB list_cosine_similarity."""
    return dot(a, b) / (l2_norm(a) * l2_norm(b))


def normalize(a: Column | str) -> Column:
    """Unit-normalize an array column (reference BGE
    ``normalize_embeddings=True``, src/PDFToChromaIngestorBgeEmbedding.py:45).

    The norm binds once per row via a singleton-struct transform:
    referencing it directly from the per-element lambda lets
    CollapseProject inline the 64-element norm aggregate into the
    lambda body, re-running it PER ELEMENT (and, through collapsed
    projections, per downstream consumer) — the r15 `_assign_cid`
    no-CSE-in-HOF finding.  Identical divisions, identical values."""
    arr = _as_double(a)
    bound = F.transform(
        F.array(F.struct(arr.alias("v"), l2_norm(arr).alias("n"))),
        lambda s: F.transform(s["v"], lambda x: x / s["n"]),
    )
    return F.element_at(bound, 1)
