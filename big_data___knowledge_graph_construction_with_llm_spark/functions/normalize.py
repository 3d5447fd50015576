"""String/date normalizers re-expressed as Catalyst expressions.

Reference semantics (cited per function) re-implemented as pure column
expressions so Catalyst can constant-fold / codegen them; the reference
did all of this row-at-a-time in driver Python.
"""

from __future__ import annotations

from pyspark.sql import Column
from pyspark.sql import functions as F


def uri_localname(col: Column | str) -> Column:
    """Last path segment after ``/`` then after ``#``.

    Semantics of the reference's URI→name extraction
    (``Art-Knowledge-Graph-AWS/ingestion/DataIngestionBatch.py:36,45``:
    ``uri.split("/")[-1].split("#")[-1]``).
    """
    c = F.col(col) if isinstance(col, str) else col
    return F.element_at(F.split(F.element_at(F.split(c, "/"), -1), "#"), -1)


def norm_label(col: Column | str) -> Column:
    """Entity-type label → CamelCase with separators removed.

    Semantics of ``normalize_label``
    (``Art-Knowledge-Graph-Local/Graph/graph_builder.py:29-32``): split on
    whitespace/underscores/hyphens, capitalize each word, concatenate.
    NOT idempotent for digit-leading words ('0-A' → '0A' → '0a') — exactly
    like the reference's ``str.capitalize``, which lowercases the rest of
    the word; only ``norm_relation`` carries the double-apply law.
    """
    c = F.col(col) if isinstance(col, str) else col
    spaced = F.regexp_replace(F.trim(c), "[-_\\s]+", " ")
    return F.regexp_replace(F.initcap(spaced), " ", "")


def norm_relation(col: Column | str) -> Column:
    """Relation → UPPER_SNAKE_CASE.

    Semantics of ``normalize_relation``
    (``Art-Knowledge-Graph-Local/Graph/graph_builder.py:34-37``): trim,
    spaces/hyphens → underscore, uppercase. Idempotent.
    """
    c = F.col(col) if isinstance(col, str) else col
    return F.upper(F.regexp_replace(F.trim(c), "[-\\s]+", "_"))


def relation_fallback(col: Column | str) -> Column:
    """Uncanonicalized relation cleanup: lowercase, underscores → spaces.

    The reference imposes this via prompt rules
    (``Art-Knowledge-Graph-AWS/LLM/chains.py:152-154,160``); here it is the
    deterministic fallback branch of the canonical-relation broadcast join.
    """
    c = F.col(col) if isinstance(col, str) else col
    return F.lower(F.regexp_replace(F.trim(c), "_", " "))


def year_extract(col: Column | str) -> Column:
    """First 4-digit year embedded in a free-form string, else NULL.

    Deterministic version of the reference's prompt date rules
    (``Art-Knowledge-Graph-AWS/LLM/chains.py:133-135``): a bare or embedded
    year becomes ``yyyy`` with ``object_type='Year'``.
    """
    c = F.col(col) if isinstance(col, str) else col
    y = F.regexp_extract(c, r"(\d{4})", 1)
    return F.when(y != "", y).otherwise(F.lit(None).cast("string"))


def is_year_object(col: Column | str) -> Column:
    """True when the value is a bare 4-digit year (object_type='Year' rule)."""
    c = F.col(col) if isinstance(col, str) else col
    return F.trim(c).rlike(r"^\d{4}$")


def non_blank(col: Column | str) -> Column:
    """Reference blank-label drop: keep only values with non-space content
    (``Art-Knowledge-Graph-AWS/ingestion/DataIngestionBatch.py:52``)."""
    c = F.col(col) if isinstance(col, str) else col
    return (c.isNotNull()) & (F.trim(c) != "")
