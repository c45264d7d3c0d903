"""Plan-shape tooling: render and assert physical plans (see inspect)."""

from .inspect import explain_str, plan_of

__all__ = ["explain_str", "plan_of"]
