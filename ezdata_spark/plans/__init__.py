"""Physical-plan tooling: the scale-hygiene audits applied to the
query catalog, exposed for user pipelines (see plans/audit.py)."""

from .audit import (
    assert_scale_safe,
    explain_text,
    audit,
    physical_plan,
    scan_report,
    single_partition_funnels,
)

__all__ = [
    "physical_plan",
    "explain_text",
    "scan_report",
    "single_partition_funnels",
    "audit",
    "assert_scale_safe",
]
