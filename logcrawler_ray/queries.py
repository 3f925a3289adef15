"""Driver-contract query registry: QUERIES (Ray Data) + ORACLE_SQL (DuckDB).

Populated operator-by-operator as SURVEY.md §2 coverage lands.
Every computed column is named identically in both implementations.
"""

from __future__ import annotations

QUERIES: dict = {}
ORACLE_SQL: dict = {}
