"""Reusable physical-strategy operators (skew salting, merge helpers).

These are library functions, not Catalyst extensions — SURVEY.md §4.3:
reference parity needs no custom planner rules, but scale operation
needs explicit strategies where AQE's runtime handling isn't enough.
"""
