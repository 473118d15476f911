"""Relational query library: OLAP queries over the driver's star schema.

These exercise the engine's relational operator surface (SURVEY.md §2.2-
§2.6) at benchmark scale — scan/filter/project, broadcast + shuffle
joins, partial+final aggregation, window functions, top-k.
"""
