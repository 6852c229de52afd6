"""Declared-query plans: the driver-checkable contract surface.

``registry.queries()`` / ``registry.oracle_sql()`` feed
``__spark_entry__.py``; each plan module covers one operator family
from SURVEY.md §2.
"""

from .registry import all_specs, oracle_sql, queries  # noqa: F401
