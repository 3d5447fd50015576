"""Reusable DataFrame→DataFrame operators.

Each operator is declarative (built-in functions + joins + windows) so
Catalyst owns the physical plan; the scale notes in each docstring say why
the chosen shape survives a 1000-executor / 100 TB deployment.
"""
