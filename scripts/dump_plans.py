"""Dump ``explain("formatted")`` for declared keys to files.

Usage: python scripts/dump_plans.py <out_dir> <suffix> key [key ...]
Writes <out_dir>/<key>_<suffix>.txt for each key.
"""

from __future__ import annotations

import os
import sys

sys.path.insert(0, os.path.dirname(os.path.dirname(os.path.abspath(__file__))))

from vector_db_ingestor_spark.caching import release_all  # noqa: E402
from vector_db_ingestor_spark.queries import QUERIES  # noqa: E402
from vector_db_ingestor_spark.session import get_spark  # noqa: E402


def main() -> None:
    out_dir, suffix = sys.argv[1], sys.argv[2]
    keys = sys.argv[3:]
    sf_dir = os.environ.get("SPARK_GRAFT_SF_DIR", "/root/testdata/sf0.1")
    os.makedirs(out_dir, exist_ok=True)
    spark = get_spark("dump-plans")
    for key in keys:
        df = QUERIES[key](spark, sf_dir)
        plan = df._jdf.queryExecution().explainString(
            spark._jvm.org.apache.spark.sql.execution.ExplainMode.fromString(
                "formatted"
            )
        )
        with open(os.path.join(out_dir, f"{key}_{suffix}.txt"), "w") as fh:
            fh.write(plan)
        release_all()
        print("wrote", key)
    spark.stop()


if __name__ == "__main__":
    main()
