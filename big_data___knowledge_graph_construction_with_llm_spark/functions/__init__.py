"""Column-level scalar functions (pure Catalyst expressions).

Everything here returns a pyspark ``Column`` built from built-in
``pyspark.sql.functions`` so the hot path stays inside whole-stage
codegen — no Python UDFs.
"""
