"""Pipeline-semantics queries (FIXTURES.md §3 P1–P10) — filled in as the
operators land."""

QUERIES: dict = {}
ORACLE: dict = {}
