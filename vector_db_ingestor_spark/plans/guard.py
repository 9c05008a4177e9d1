"""Pre-flight plan guard — the PLANS.md discipline as a runtime API.

A plan that works at sf0.1 and melts at 100 TB usually telegraphs it
in the physical plan: a BroadcastNestedLoopJoin or CartesianProduct
(quadratic work), an unbounded global window (one reducer holds the
corpus), or a pile of un-fused Python eval stages (Arrow round-trips
per stage).  ``assert_scalable(df)`` inspects the OPTIMIZED PHYSICAL
plan — before any job runs — and raises ``PlanViolation`` with the
offending operators, so the check belongs at submit time, not in the
post-mortem.  ``plan_report(df)`` returns the same facts as data for
dashboards / CI gates.

This is the runtime twin of the repo's static evidence: PLANS.md pins
these shapes per declared query (scripts/explain_audit.py), the test
suite re-asserts the critical ones at sf0.001 (tests/test_plans.py),
and this module lets USER-written queries opt into the same contract.

Costs nothing to call: plan compilation only (no jobs, no scans).
Under AQE the pre-execution plan is the conservative initial plan —
a runtime broadcast conversion can only REMOVE shuffles, so limits
checked here hold at execution too; nested-loop/cartesian shapes are
decided at planning time and never improve.
"""

from __future__ import annotations

import re

from pyspark.sql import DataFrame


class PlanViolation(RuntimeError):
    """A physical-plan shape that will not survive production scale."""


def _physical_plan(df: DataFrame) -> str:
    return df._jdf.queryExecution().executedPlan().toString()


def _bracket_groups(s: str) -> int:
    """Count top-level ``[...]`` groups in one plan line."""
    depth = 0
    groups = 0
    for ch in s:
        if ch == "[":
            if depth == 0:
                groups += 1
            depth += 1
        elif ch == "]":
            depth = max(depth - 1, 0)
    return groups


def _global_windows(plan: str) -> int:
    """Window operators with an EMPTY partition spec — a data-sized
    single reducer unless the input was bounded first.  A physical
    Window line prints ``Window [exprs], [partition], [order]``; the
    unpartitioned form omits the middle group (2 groups, not 3)."""
    n = 0
    for line in plan.splitlines():
        stripped = re.sub(r"^[\s:+\-|]*(\*\(\d+\)\s*)?", "", line)
        if stripped.startswith("Window ") and _bracket_groups(stripped) < 3:
            n += 1
    return n


def plan_report(df: DataFrame) -> dict:
    """Facts about the pre-execution physical plan (no jobs run)."""
    plan = _physical_plan(df)
    shuffles = 0
    for line in plan.splitlines():
        stripped = re.sub(r"^[\s:+\-|]*(\*\(\d+\)\s*)?", "", line)
        if stripped.startswith("Exchange "):
            shuffles += 1
    # count whole node names line-anchored (like the Exchange/Window
    # checks): a bare substring count would double-count every
    # FlatMapGroupsInPandasWithState line under FlatMapGroupsInPandas
    python_evals = 0
    _py_ops = ("ArrowEvalPython", "BatchEvalPython", "MapInPandas",
               "FlatMapGroupsInPandas", "FlatMapGroupsInPandasWithState")
    for line in plan.splitlines():
        stripped = re.sub(r"^[\s:+\-|]*(\*\(\d+\)\s*)?", "", line)
        node = stripped.split(" ", 1)[0]
        if node in _py_ops:
            python_evals += 1
    return {
        "shuffles": shuffles,
        "python_evals": python_evals,
        "nested_loop": "BroadcastNestedLoopJoin" in plan,
        "cartesian": "CartesianProduct" in plan,
        "broadcasts": plan.count("BroadcastExchange"),
        "global_windows": _global_windows(plan),
        "take_ordered": "TakeOrderedAndProject" in plan,
    }


def assert_scalable(
    df: DataFrame,
    max_shuffles: int | None = None,
    max_python_evals: int = 2,
    forbid_nested_loop: bool = True,
    forbid_cartesian: bool = True,
    forbid_global_window: bool = False,
) -> dict:
    """Raise :class:`PlanViolation` when the plan carries a shape that
    dies at scale; returns the :func:`plan_report` facts otherwise.

    Defaults encode this repo's repo-wide invariants (PLANS.md):
    nested-loop and cartesian joins are forbidden, Python eval stages
    are capped at 2 (the declared maximum anywhere in the inventory),
    and the shuffle budget is opt-in per query (pass ``max_shuffles``
    where the plan has a known budget — e.g. 1 for a single-agg query).
    """
    facts = plan_report(df)
    problems = []
    if forbid_nested_loop and facts["nested_loop"]:
        problems.append(
            "BroadcastNestedLoopJoin: quadratic work — rewrite the theta "
            "join as a bucketed equi-join + residual filter "
            "(operators/joins.py range_join_count / interval_overlap_count)"
        )
    if forbid_cartesian and facts["cartesian"]:
        problems.append(
            "CartesianProduct: unbounded pair fan-out — add an equi-join "
            "key (bucket, band, cell) so candidates are generated, not "
            "enumerated"
        )
    if facts["python_evals"] > max_python_evals:
        problems.append(
            f"{facts['python_evals']} Python eval stages (cap "
            f"{max_python_evals}): fuse kernels into one mapInPandas "
            "(pipeline.build_chunks pattern) — each extra stage is a full "
            "Arrow round-trip of the corpus"
        )
    if forbid_global_window and facts["global_windows"]:
        problems.append(
            f"{facts['global_windows']} unpartitioned Window operator(s): "
            "a data-sized single reducer unless the input is bounded "
            "first — partition the window, or rank a post-limit O(k) set "
            "(this repo's global-window-bounded invariant; leave this "
            "check off when the window provably ranks a limited input)"
        )
    if max_shuffles is not None and facts["shuffles"] > max_shuffles:
        problems.append(
            f"{facts['shuffles']} shuffle exchanges (budget {max_shuffles}):"
            " look for a lost broadcast, a repartition that AQE would skip,"
            " or a reusable exchange split by differing partitioning"
        )
    if problems:
        raise PlanViolation("; ".join(problems))
    return facts
