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

_REPO = os.path.dirname(os.path.abspath(__file__))


def _driver_priority() -> list[str]:
    """Order keys by how badly they need a driver-verified row.

    The per-round driver checks only a prefix of the registered keys
    (each ``CORRECTNESS_r*.json`` holds ~50), so the ordering decides
    which keys ever accumulate evidence.  Derived live from every prior
    CORRECTNESS file in the repo root so it can never go stale:

    1. never driver-seen in any round,
    2. seen but errored (canonicalizer/runtime FAIL) — fixes land here,
    3. rows-only (``no_oracle``) — oracle upgrades land here,
    4. hash-green, least-recently-verified first (re-verify rotation).

    Ties keep registration order.
    """
    import glob
    import json

    last_round: dict[str, int] = {}
    status: dict[str, str] = {}
    for path in sorted(glob.glob(os.path.join(_REPO, "CORRECTNESS_r*.json"))):
        try:
            rnd = int(os.path.basename(path)[len("CORRECTNESS_r"):].split(".")[0])
            with open(path) as fh:
                data = json.load(fh)
        except (ValueError, OSError, json.JSONDecodeError):
            continue
        for key, row in data.items():
            # glob order is lexicographic, not numeric (r100 < r11):
            # only let a numerically-later round overwrite a key's status
            if rnd < last_round.get(key, -1):
                continue
            last_round[key] = rnd
            if row.get("hash_match"):
                status[key] = "green"
            elif row.get("err") == "no_oracle":
                status[key] = "rows_only"
            else:
                status[key] = "fail"

    def rank(item: tuple[int, str]) -> tuple[int, int, int]:
        reg_pos, key = item
        st = status.get(key)
        if st is None:
            return (0, 0, reg_pos)
        if st == "fail":
            return (1, 0, reg_pos)
        if st == "rows_only":
            # rows-only keys that now carry an oracle jump ahead: they
            # are one driver pass away from hash-green.
            return (2, 0 if key in ORACLE_SQL else 1, reg_pos)
        return (3, last_round.get(key, 0), reg_pos)

    indexed = list(enumerate(QUERIES.keys()))
    return [key for _, key in sorted(indexed, key=rank)]


def _ordered(mapping: dict) -> dict:
    head = {k: mapping[k] for k in _driver_priority() if k in mapping}
    tail = {k: v for k, v in mapping.items() if k not in head}
    return {**head, **tail}


def entry(spark: SparkSession) -> DataFrame:
    """Flagship query on /root/testdata/sf0.001; driver checks rows>0."""
    return QUERIES["q_topk_cosine"](spark, "/root/testdata/sf0.001")


def queries() -> dict[str, Callable[[SparkSession, str], DataFrame]]:
    """One entry per implemented operator from SURVEY.md §2."""
    return _ordered(QUERIES)


def oracle_sql() -> dict[str, str]:
    """DuckDB-equivalent SQL per query key (omitted => rows-only check)."""
    return _ordered(ORACLE_SQL)
