"""Composable DataFrame operators (the engine's relational layer).

Each module re-expresses one operator family from the reference
(SURVEY.md §2) as pure functions ``DataFrame -> DataFrame`` built from
Spark built-ins, so Catalyst can push filters, prune columns, and pick
join strategies. No collect() in any operator; everything stays lazy.
"""
