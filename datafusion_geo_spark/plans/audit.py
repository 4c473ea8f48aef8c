"""Executed-plan inspection helpers (see package docstring)."""

from __future__ import annotations

from dataclasses import dataclass, field
from typing import List

from pyspark.sql import DataFrame


@dataclass
class PlanAudit:
    has_cartesian_product: bool
    python_in_join_condition: bool
    python_eval_nodes: int
    broadcast_joins: int
    shuffles: int
    pushed_filters: bool
    wholestage_codegen_spans: int
    #: `BroadcastNestedLoopJoin …, Cross` nodes — an EXPLICIT
    #: crossJoin whose build side carries a broadcast hint. Linear (not
    #: quadratic) when the broadcast side is a bounded dimension
    #: (centroids, hyperplanes, probe queries): every stream row meets a
    #: constant number of build rows. Still fatal by default — the plan
    #: string cannot prove the build side is bounded, so the caller must
    #: assert it via assert_scalable(allow_broadcast_cross=n).
    broadcast_crosses: int = 0
    warnings: List[str] = field(default_factory=list)

    def fatal_allowing(self, allow_broadcast_cross: int = 0) -> List[str]:
        out = []
        if self.has_cartesian_product:
            out.append("CartesianProduct: unbounded pair blow-up at scale")
        if self.python_in_join_condition:
            out.append("Python UDF as join condition: evaluates Python on "
                       "the full cross product — prefilter natively "
                       "(bbox/grid) and refine above the join")
        if self.broadcast_crosses > allow_broadcast_cross:
            out.append(
                f"{self.broadcast_crosses} broadcast cross join(s) "
                f"(> {allow_broadcast_cross} allowed): linear only if the "
                "broadcast side is a bounded dimension — assert that via "
                "assert_scalable(allow_broadcast_cross=n)")
        return out

    @property
    def fatal(self) -> List[str]:
        return self.fatal_allowing(0)


def _plan_string(df: DataFrame) -> str:
    return df._jdf.queryExecution().executedPlan().toString()


def audit(df: DataFrame) -> PlanAudit:
    """Inspect the executed plan for scale smells. Cheap: string-level
    analysis of the physical plan, no job runs."""
    plan = _plan_string(df)
    lines = plan.split("\n")

    python_in_join = False
    unconditioned_cross = False
    broadcast_crosses = 0
    for ln in lines:
        if ("Join" in ln or "CartesianProduct" in ln) and "pythonUDF" in ln:
            python_in_join = True
        if "BroadcastNestedLoopJoin" in ln:
            # a BNLJ line ending at the join type carries NO condition —
            # a full cross product. (Spark moves a Python-only join
            # condition out and leaves exactly this shape behind, with
            # the Python filter above: ExtractPythonUDFFromJoinCondition.)
            tail = ln.split("BroadcastNestedLoopJoin", 1)[1].strip()
            if tail.rstrip(",") in ("BuildLeft, Inner", "BuildRight, Inner"):
                # an Inner with no condition = an accidental cross
                unconditioned_cross = True
            elif tail.rstrip(",") in ("BuildLeft, Cross", "BuildRight, Cross"):
                # an explicit crossJoin with a broadcast build side —
                # tallied separately (see PlanAudit.broadcast_crosses)
                broadcast_crosses += 1

    warnings: List[str] = []
    py_nodes = plan.count("ArrowEvalPython") + plan.count("BatchEvalPython")
    if plan.count("BatchEvalPython"):
        warnings.append("row-at-a-time BatchEvalPython present — use "
                        "pandas UDFs (Arrow) instead")
    if "FileScan" in plan and "ReadSchema: struct<>" not in plan \
            and "PushedFilters: []" in plan and "Filter" in plan:
        warnings.append("a scan has no pushed filters while the plan "
                        "filters later — check predicate pushdown")

    return PlanAudit(
        has_cartesian_product="CartesianProduct" in plan
        or unconditioned_cross,
        python_in_join_condition=python_in_join,
        python_eval_nodes=py_nodes,
        broadcast_joins=plan.count("BroadcastHashJoin")
        + plan.count("BroadcastNestedLoopJoin"),
        shuffles=plan.count("Exchange "),
        pushed_filters="PushedFilters: [" in plan
        and "PushedFilters: []" not in plan,
        wholestage_codegen_spans=plan.count("WholeStageCodegen"),
        broadcast_crosses=broadcast_crosses,
        warnings=warnings,
    )


def assert_scalable(df: DataFrame, allow_broadcast_cross: int = 0) -> PlanAudit:
    """Raise ValueError when the plan carries a fatal scale smell.

    ``allow_broadcast_cross``: number of `BroadcastNestedLoopJoin Cross`
    nodes the caller vouches for — each must be a crossJoin against a
    BOUNDED broadcast dimension (k centroids, h hyperplanes, a capped
    probe set), which is linear work per stream row. Default 0: an
    unvouched cross is treated as the accident it usually is."""
    a = audit(df)
    bad = a.fatal_allowing(allow_broadcast_cross)
    if bad:
        raise ValueError("plan fails scale audit: " + "; ".join(bad))
    return a
