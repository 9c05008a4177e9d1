"""Driver contract for the spark-graft builder (PySpark target).

``entry(spark)`` — flagship filtered top-k cosine retrieval (reference
R10/R11, ``src/PDFToChromaIngester.py:225-235,250-287``) on sf0.001.

``queries()`` / ``oracle_sql()`` — the declared operator inventory from
SURVEY.md §2B; implementations live in
:mod:`vector_db_ingestor_spark.queries`.
"""

from __future__ import annotations

import os
import sys
from collections.abc import Callable

from pyspark.sql import DataFrame, SparkSession

sys.path.insert(0, os.path.dirname(os.path.abspath(__file__)))

from vector_db_ingestor_spark.queries import ORACLE_SQL, QUERIES  # noqa: E402


def entry(spark: SparkSession) -> DataFrame:
    """Flagship query on /root/testdata/sf0.001; driver checks rows>0."""
    return QUERIES["q_topk_cosine"](spark, "/root/testdata/sf0.001")


def queries() -> dict[str, Callable[[SparkSession, str], DataFrame]]:
    """One entry per implemented operator from SURVEY.md §2."""
    return dict(QUERIES)


def oracle_sql() -> dict[str, str]:
    """DuckDB-equivalent SQL per query key (omitted => rows-only check)."""
    return dict(ORACLE_SQL)
