"""Plan auditing — the engine's own scale linter.

`audit(df)` inspects a DataFrame's executed plan for the smells that
kill 100 TB jobs and returns a structured report; `assert_scalable(df)`
raises on the fatal ones. The same invariants are regression-pinned for
the shipped queries in tests/test_scale_plans.py; this module is the
user-facing version for pipelines built on the engine.
"""

from .audit import PlanAudit, assert_scalable, audit

__all__ = ["audit", "assert_scalable", "PlanAudit"]
