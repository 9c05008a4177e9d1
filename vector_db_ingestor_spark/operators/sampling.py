"""Deterministic sampling and dataset splitting for training-data
pipelines.

The reference has no sampling surface; these are the standard
large-corpus operations a 100 TB training-data pipeline needs, built on
content hashing rather than RNG:

* ``df.sample()`` is seed-dependent per partitioning — the same row can
  flip in/out of the sample when the input is repartitioned, which
  breaks reproducibility audits.  Hash-based selection
  (``pmod(xxhash64(key), D) < k``) is a pure row property: stable
  under any partitioning, any cluster size, any execution order.
* Splits are *disjoint by construction* (disjoint hash ranges over one
  hash draw), so train/val/test can never overlap even across separate
  job runs — and membership survives incremental re-ingestion, which a
  random split does not.

Everything is a narrow JVM expression: no shuffle, no Python, no state.
"""

from __future__ import annotations

from pyspark.sql import Column, DataFrame
from pyspark.sql import functions as F

#: hash-space denominator: fractions resolve to 1/10000ths
_BUCKETS = 10_000


def _hash_bucket(key: Column, salt: str) -> Column:
    """Uniform bucket in [0, _BUCKETS) from a salted 64-bit hash.

    The salt decorrelates different sampling decisions over the same
    key (e.g. a 1% audit sample and a train/val split must not be
    nested in each other).
    """
    return F.pmod(F.xxhash64(F.lit(salt), key), F.lit(_BUCKETS))


def sample_by_hash(
    df: DataFrame,
    key_col: str,
    fraction: float,
    salt: str = "sample",
) -> DataFrame:
    """Deterministic ~``fraction`` sample: keeps rows whose salted key
    hash falls in the first ``fraction`` of the hash space.  Stable
    under repartitioning and re-runs; sampling the same key twice with
    the same salt gives the same verdict (so joins between two sampled
    tables on ``key_col`` stay consistent)."""
    if not 0.0 <= fraction <= 1.0:
        raise ValueError(f"fraction must be in [0, 1], got {fraction}")
    return df.filter(
        _hash_bucket(F.col(key_col), salt) < int(round(fraction * _BUCKETS))
    )


def sample_stratified(
    df: DataFrame,
    strata_col: str,
    fractions: dict,
    key_col: str,
    default_fraction: float = 0.0,
    salt: str = "stratified",
) -> DataFrame:
    """Per-stratum deterministic sampling (e.g. keep 100% of rare
    languages, 5% of English): one narrow filter, threshold chosen per
    row from a small CASE over ``strata_col``."""
    expr = F.lit(int(round(default_fraction * _BUCKETS)))
    for stratum, frac in fractions.items():
        expr = F.when(
            F.col(strata_col) == stratum, F.lit(int(round(frac * _BUCKETS)))
        ).otherwise(expr)
    return df.filter(_hash_bucket(F.col(key_col), salt) < expr)


def split_by_hash(
    df: DataFrame,
    key_col: str,
    weights: dict | None = None,
    salt: str = "split",
) -> DataFrame:
    """Add a ``split`` column assigning each row to train/val/test (or
    any named buckets) by disjoint hash ranges.

    Weights are normalized; bucket boundaries are cumulative, so the
    assignment is exhaustive and the splits are disjoint by
    construction.  Keyed on content (``key_col``), membership survives
    re-ingestion and incremental appends — new rows join a split, old
    rows never move.
    """
    weights = weights or {"train": 0.98, "val": 0.01, "test": 0.01}
    total = float(sum(weights.values()))
    bucket = _hash_bucket(F.col(key_col), salt)
    expr = None
    cum = 0.0
    names = list(weights)
    for name in names[:-1]:
        cum += weights[name] / total
        cond = bucket < int(round(cum * _BUCKETS))
        expr = F.when(cond, name) if expr is None else expr.when(cond, name)
    last = F.lit(names[-1])
    expr = last if expr is None else expr.otherwise(names[-1])
    return df.withColumn("split", expr)


def _md5_bucket(key: Column, salt: str) -> Column:
    """First 6 hex chars of ``md5(salt || key)`` — a uniform draw in
    [0, 16^6) rendered identically by every engine (lowercase hex +
    lexicographic compare), so membership is externally re-derivable."""
    return F.substring(F.md5(F.concat(F.lit(salt), key.cast("string"))), 1, 6)


def _hex_threshold(frac: float) -> str:
    if frac >= 1.0:
        return "g"  # every hex digit sorts below 'g' -> keep all
    return format(int(round(frac * 16**6)), "06x")


def split_by_md5(
    df: DataFrame,
    key_col: str,
    weights: dict | None = None,
    salt: str = "split",
) -> DataFrame:
    """Cross-engine-auditable train/val/test split: same disjoint
    cumulative-range contract as :func:`split_by_hash`, but the bucket
    draw is the md5-hex idiom of :func:`sample_stratified_md5`, so an
    external engine (or the DuckDB oracle) re-derives every row's
    assignment exactly.  ``split_by_hash`` stays the hot path (no
    per-row string materialization); this is the portable variant.
    Granularity is 1/16^6 (~6e-8) per boundary."""
    weights = weights or {"train": 0.98, "val": 0.01, "test": 0.01}
    total = float(sum(weights.values()))
    bucket = _md5_bucket(F.col(key_col), salt)
    expr = None
    cum = 0.0
    names = list(weights)
    for name in names[:-1]:
        cum += weights[name] / total
        cond = bucket < F.lit(_hex_threshold(cum))
        expr = F.when(cond, name) if expr is None else expr.when(cond, name)
    expr = F.lit(names[-1]) if expr is None else expr.otherwise(names[-1])
    return df.withColumn("split", expr)


def sample_stratified_md5(
    df: DataFrame,
    strata_col: str,
    fractions: dict,
    key_col: str,
    default_fraction: float = 0.0,
    salt: str = "stratified",
) -> DataFrame:
    """Cross-engine-auditable stratified sampling: the keep/drop verdict
    is a lexicographic compare of the first 6 hex chars of
    ``md5(salt || key)`` against a per-stratum threshold string.

    Same contract as :func:`sample_stratified` (deterministic,
    partition-invariant, append-stable) but built ONLY from functions
    every engine renders identically (md5 lowercase hex + string
    compare), so an external auditor — or the DuckDB oracle — can
    re-derive membership exactly.  ``xxhash64``-based
    :func:`sample_stratified` stays the hot path (no string
    materialization per row); this is the portable/verification
    variant.  Fraction granularity is 1/16^6 (~6e-8).
    """
    expr = F.lit(_hex_threshold(default_fraction))
    for stratum, frac in fractions.items():
        expr = F.when(
            F.col(strata_col) == stratum, F.lit(_hex_threshold(frac))
        ).otherwise(expr)
    return df.filter(_md5_bucket(F.col(key_col), salt) < expr)
