"""Registry for persisted DataFrames that must outlive their builder.

A handful of plans (the bigram-LM scorer's ``dtf`` table, the guarded
uncapped n-gram join's token stream) ``persist()`` an intermediate that
four downstream consumers share.  The builder function returns a LAZY
DataFrame, so it cannot unpersist before the caller materializes the
result — and without a hook, every invocation (each bench rep, each
driver round) leaves one cached RDD behind until Spark's
ContextCleaner garbage-collects the Python handle.

``register(df)`` records the persisted handle; ``release_all()`` (the
harness hook — bench.py calls it after every materialization, tests in
teardown) unpersists everything recorded since the last release.
Callers that never release still converge: the registry holds the only
extra reference, so entries from earlier invocations become
ContextCleaner-eligible as soon as ``release_all`` OR a later
``register`` of the same builder drops them — but an explicit release
after consumption is the contract.
"""

from __future__ import annotations

from pyspark.sql import DataFrame

_LIVE: list[DataFrame] = []


def register(df: DataFrame) -> DataFrame:
    """Record a persisted DataFrame for later :func:`release_all`."""
    _LIVE.append(df)
    return df


def release_all() -> None:
    """Unpersist (non-blocking) every registered handle.

    Safe to call at any time: releasing a cache under a live plan only
    degrades to recompute, never breaks correctness.
    """
    while _LIVE:
        df = _LIVE.pop()
        try:
            df.unpersist()
        except Exception:  # session already stopped — nothing to free
            pass
