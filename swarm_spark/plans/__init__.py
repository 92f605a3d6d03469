"""Plan-level helpers: skew handling, plan-shape assertions."""
