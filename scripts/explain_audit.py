"""Physical-plan audit: assert the plan properties the engine is
designed around, and emit PLANS.md as evidence.

Each audited query declares expectations against its *executed* plan
string (AQE final plan where applicable):

* pushed      — parquet scan carries PushedFilters (predicate pushdown)
* pruned      — ReadSchema contains only the named columns
* broadcast   — a BroadcastHashJoin/BroadcastExchange is present
* top_k       — global sort+limit compiled to TakeOrderedAndProject
* no_shuffle  — zero Exchange operators (fully narrow plan)
* max_arrow   — at most N Python eval nodes (fused UDF stages)

Run: python scripts/explain_audit.py [sf_dir]
"""

from __future__ import annotations

import os
import re
import sys

sys.path.insert(0, os.path.dirname(os.path.dirname(os.path.abspath(__file__))))

from vector_db_ingestor_spark.queries import QUERIES  # noqa: E402
from vector_db_ingestor_spark.session import get_spark  # noqa: E402

AUDITS: dict[str, dict] = {
    "q_scan_project": {
        "pruned_to": ["o_orderkey", "o_custkey", "o_totalprice", "o_orderpriority"],
    },
    "q_filter_pred": {"pushed": True},
    "q_sort_limit": {"top_k": True},
    "q_join_broadcast": {"broadcast": True},
    "q_sql_tpch_q3": {"broadcast": True, "pushed": True},
    "q_ingest_pipeline": {"max_exchange": 1, "max_arrow": 1},
    "q_chunk_explode": {"max_exchange": 1, "max_arrow": 1},
    "q_topk_cosine": {"top_k": True, "pushed": True},
    "q_ann_ivf": {"top_k": True, "max_exchange": 0, "partition_pruned": True},
    "q_agg_group": {"partial_agg": True},
    "q_array_fns": {"max_exchange": 0},
    "q_sql_tpch_q6": {"pushed": True, "partial_agg": True},
    "q_agg_stats": {"partial_agg": True},
    "q_conditional_fns": {"max_exchange": 0},
    "q_token_freq": {"top_k": True, "partial_agg": True},
    "q_multimodal_frames": {"partial_agg": True, "max_exchange": 1},
    "q_sql_tpch_q5": {"broadcast": True, "pushed": True, "partial_agg": True},
    "q_topk_batch": {"broadcast": True},
    "q_histogram": {"partial_agg": True},
    "q_agg_conditional": {"partial_agg": True},
    # double row_number + two groupBys all cluster on user_id subsets:
    # the single user_id exchange serves the whole pipeline
    "q_gaps_islands": {"max_exchange": 1},
    "q_docs_clean_pipeline": {"pushed": True},
    "q_retention_cohort": {"broadcast": True},
    # PII scrub is pure projections: rides the scan stage, zero shuffles
    "q_pii_redact": {"max_exchange": 0},
    # token agg shuffles once on (doc,token); window + final rollup
    # share the second hash(doc) exchange
    "q_text_repetition": {"max_exchange": 2, "partial_agg": True},
    # eval grams broadcast; the corpus side only shuffles for its agg
    "q_contamination": {"broadcast": True, "max_exchange": 2},
    "q_dedup_ngram_capped": {"broadcast": True},
    # EXISTS must compile to a semi join, never a per-row subquery
    "q_sql_tpch_q4": {"semi_join": True, "pushed": True},
    "q_sql_tpch_q13": {"partial_agg": True},
    # correlated scalar avg decorrelates to aggregate-then-join
    "q_sql_tpch_q17": {"partial_agg": True, "no_nested_loop": True},
    # disjunctive predicates stay a hash/broadcast join + residual
    # filter, not a BroadcastNestedLoopJoin
    "q_sql_tpch_q19": {"broadcast": True, "no_nested_loop": True},
    # pure vector math rides the scan: zero shuffles
    "q_vector_fns": {"max_exchange": 0},
    "q_vec_quantize": {"max_exchange": 0},
    # df table broadcasts back onto the tf stream
    "q_tfidf": {"broadcast": True, "partial_agg": True},
    # round-4 additions
    "q_sql_tpch_q7": {"broadcast": True, "pushed": True, "partial_agg": True},
    "q_sql_tpch_q8": {"broadcast": True, "pushed": True, "partial_agg": True},
    "q_sql_tpch_q15": {"partial_agg": True, "pushed": True},
    "q_sql_tpch_q22": {"partial_agg": True},
    "q_vec_centroid": {"partial_agg": True},
    "q_topk_maxsim": {"top_k": True, "max_exchange": 0},
    "q_dedup_incremental": {"partial_agg": True, "pushed": True},
    "q_knn_classify": {"top_k": True, "partial_agg": True},
    "q_ann_recall_report": {"top_k": True, "broadcast": True},
    "q_stream_join": {"no_nested_loop": True, "pushed": True},
    "q_text_boilerplate": {"top_k": True, "partial_agg": True},
    "q_pack_sequences": {"max_exchange": 1},
    "q_mixture_weights": {"broadcast": True, "partial_agg": True},
}


def executed_plan(df) -> str:
    plan = df._jdf.queryExecution().executedPlan().toString()
    # An executed AdaptiveSparkPlan prints "== Final Plan ==" followed by
    # "== Initial Plan ==" — keep only the final section so operator
    # counts aren't doubled (ReadSchema/PushedFilters live in both).
    return plan.split("== Initial Plan ==")[0]


def audit(key: str, plan: str, exp: dict) -> list[tuple[str, bool, str]]:
    out = []
    if exp.get("pushed"):
        ok = bool(re.search(r"PushedFilters: \[[^\]]*(IsNotNull|GreaterThan|LessThan|EqualTo|In\()", plan))
        out.append(("pushed-filters", ok, "filters reach the parquet scan"))
    if "pruned_to" in exp:
        m = re.search(r"ReadSchema: struct<([^>]*)>", plan)
        cols = sorted(c.split(":")[0] for c in m.group(1).split(",")) if m else []
        ok = cols == sorted(exp["pruned_to"])
        out.append(("column-pruning", ok, f"ReadSchema = {cols}"))
    if exp.get("broadcast"):
        ok = "BroadcastHashJoin" in plan or "BroadcastExchange" in plan
        out.append(("broadcast-join", ok, "small side broadcast"))
    if exp.get("top_k"):
        ok = "TakeOrderedAndProject" in plan
        out.append(("take-ordered", ok, "sort+limit fused to per-partition top-k"))
    if "max_exchange" in exp:
        n = plan.count("Exchange") - plan.count("BroadcastExchange")
        ok = n <= exp["max_exchange"]
        out.append((f"shuffles<={exp['max_exchange']}", ok, f"{n} shuffle exchange(s)"))
    if "max_arrow" in exp:
        n = plan.count("ArrowEvalPython") + plan.count("MapInPandas")
        ok = n <= exp["max_arrow"]
        out.append((f"python-evals<={exp['max_arrow']}", ok, f"{n} Python eval node(s)"))
    if exp.get("partition_pruned"):
        ok = bool(re.search(r"PartitionFilters: \[[^\]]*(IN|EqualTo)", plan))
        out.append(("partition-pruning", ok, "nprobe shortlist skips files"))
    if exp.get("partial_agg"):
        ok = plan.count("HashAggregate") >= 2  # partial + final
        out.append(("partial-agg", ok, "map-side partial aggregation"))
    if exp.get("semi_join"):
        ok = "LeftSemi" in plan or "SemiJoin" in plan
        out.append(("semi-join", ok, "EXISTS compiled to a semi join"))
    if exp.get("no_nested_loop"):
        ok = "BroadcastNestedLoopJoin" not in plan and "CartesianProduct" not in plan
        out.append(("no-nested-loop", ok, "no nested-loop/cartesian fallback"))
    return out


def main() -> None:
    sf_dir = sys.argv[1] if len(sys.argv) > 1 else "/root/testdata/sf0.01"
    spark = get_spark("explain_audit")
    lines = [
        "# PLANS — physical-plan audit",
        "",
        f"Generated by `scripts/explain_audit.py` over `{sf_dir}`.",
        "Checks that the executed plans have the shape the engine is",
        "designed for (pushdown, pruning, broadcast, top-k fusion, fused",
        "Python stages, shuffle budget).",
        "",
        "| query | check | status | evidence |",
        "|---|---|---|---|",
    ]
    failures = 0
    for key, exp in AUDITS.items():
        df = QUERIES[key](spark, sf_dir)
        # Execute df's OWN QueryExecution so AQE settles on the final
        # plan (a noop write would spawn a separate QueryExecution and
        # leave df's plan un-adapted — the audited string would be the
        # pre-AQE initial plan, hiding runtime broadcast conversion and
        # coalesced/skew-split exchanges).
        df.collect()
        plan = executed_plan(df)
        assert "isFinalPlan=false" not in plan.splitlines()[0], key
        for name, ok, detail in audit(key, plan, exp):
            status = "ok" if ok else "FAIL"
            failures += (not ok)
            lines.append(f"| {key} | {name} | {status} | {detail} |")
            print(f"{'OK  ' if ok else 'FAIL'} {key:20s} {name:18s} {detail}")
    spark.stop()
    with open(os.path.join(os.path.dirname(os.path.dirname(os.path.abspath(__file__))), "PLANS.md"), "w") as f:
        f.write("\n".join(lines) + "\n")
    print(f"\n{failures} failures")
    sys.exit(1 if failures else 0)


if __name__ == "__main__":
    main()
