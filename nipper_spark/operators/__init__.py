"""Reusable DataFrame operator combinators (top-k per group, anti-join
dedup, salted aggregation)."""
