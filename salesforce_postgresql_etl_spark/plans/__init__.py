"""Plan inspection tooling: physical-plan audits of the SCALE.md
invariants (no cartesians, no row-Python hot paths, bounded
single-partition funnels) plus pushdown/pruning extractors."""

from .audit import PlanAudit, audit, plan_string, pushed_filters, read_schemas

__all__ = ["PlanAudit", "audit", "plan_string", "pushed_filters", "read_schemas"]
