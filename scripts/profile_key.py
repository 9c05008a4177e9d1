"""Per-key profiling: decompose a declared query's wall time into
DataFrame construction (Python plan build + any eager driver jobs),
Catalyst phases (analysis/optimization/planning, from QueryExecution's
phase tracker), and warm execution (noop sink median, plan rebuilt per
rep exactly like bench.py).

Usage: PROFILE_REPS=5 python scripts/profile_key.py [sf_dir] key [key ...]
"""

from __future__ import annotations

import os
import statistics
import sys
import time

sys.path.insert(0, os.path.dirname(os.path.dirname(os.path.abspath(__file__))))

from vector_db_ingestor_spark.caching import release_all  # noqa: E402
from vector_db_ingestor_spark.queries import QUERIES  # noqa: E402
from vector_db_ingestor_spark.session import get_spark  # noqa: E402


def catalyst_phases(df) -> dict[str, int]:
    """Phase name -> duration ms from the JVM-side phase tracker."""
    qe = df._jdf.queryExecution()
    qe.executedPlan()  # force analysis -> physical planning
    out: dict[str, int] = {}
    try:
        it = qe.tracker().phases().iterator()
        while it.hasNext():
            kv = it.next()
            summ = kv._2()
            out[str(kv._1())] = int(summ.endTimeMs() - summ.startTimeMs())
    except Exception as e:  # pragma: no cover
        out["err"] = str(e)[:60]
    return out


def main() -> None:
    args = sys.argv[1:]
    sf_dir = "/root/testdata/sf0.1"
    if args and os.path.isdir(args[0]):
        sf_dir = args.pop(0)
    keys = args or ["q_ann_ivfpq"]
    reps = int(os.environ.get("PROFILE_REPS", "5"))

    spark = get_spark("profile")
    QUERIES["q_sort_limit"](spark, sf_dir).limit(1).count()

    hdr = f"{'key':28s} {'build':>7s} {'analysis':>8s} {'opt':>6s} {'plan':>6s} {'exec_noop(med)':>14s} {'full(med)':>10s}"
    print(hdr)
    for key in keys:
        spark.sparkContext.setJobDescription(f"profile:{key}")
        t0 = time.perf_counter()
        df = QUERIES[key](spark, sf_dir)
        build = time.perf_counter() - t0
        df.write.format("noop").mode("overwrite").save()  # warm
        release_all()
        ph = catalyst_phases(QUERIES[key](spark, sf_dir))
        release_all()
        # exec-only: reuse ONE DataFrame across reps (codegen/plan cached)
        df3 = QUERIES[key](spark, sf_dir)
        ex = []
        for _ in range(reps):
            t0 = time.perf_counter()
            df3.write.format("noop").mode("overwrite").save()
            ex.append(time.perf_counter() - t0)
        release_all()
        # full: rebuild per rep (bench.py methodology)
        full = []
        for _ in range(reps):
            t0 = time.perf_counter()
            QUERIES[key](spark, sf_dir).write.format("noop").mode("overwrite").save()
            full.append(time.perf_counter() - t0)
            release_all()
        print(
            f"{key:28s} {build:7.3f} {ph.get('analysis', -1):8d} "
            f"{ph.get('optimization', -1):6d} {ph.get('planning', -1):6d} "
            f"{statistics.median(ex):14.3f} {statistics.median(full):10.3f}"
        )
    spark.stop()


if __name__ == "__main__":
    main()
