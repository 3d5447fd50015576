"""Tolerant JSON repair/parse as a Catalyst expression pipeline.

The reference tolerates malformed LLM/JSON output two ways:

* ``extract_json`` — strict ``json.loads`` first, then a regex object
  scrape, else discard (``Art-Knowledge-Graph-AWS/LLM/pipeline.py:6-33``).
* its bundled ``COLLEZIONI_PALAZZO_MADAMA.json`` has trailing commas, which
  pandas/ujson accept but strict parsers (incl. Spark's native JSON reader)
  reject (SURVEY.md §1.3).

Here the repair is a column expression chain — no Python in the hot path —
so it runs inside whole-stage codegen and scales with the scan.
"""

from __future__ import annotations

from pyspark.sql import Column
from pyspark.sql import functions as F


def repair_json(col: Column | str) -> Column:
    """Fix common non-strict JSON defects, as expressions:

    * trailing commas before ``}``/``]`` (the defect in the reference's
      bundled ``COLLEZIONI_PALAZZO_MADAMA.json``),
    * single-quoted object keys (``{'k': 1}`` → ``{"k": 1}``) — matched
      only in key position (after ``{`` or ``,``) so apostrophes inside
      double-quoted values are never touched.

    Returns the repaired string (unparsed).
    """
    c = F.col(col) if isinstance(col, str) else col
    # trailing comma before a closing brace/bracket
    c = F.regexp_replace(c, r",\s*([}\]])", r"$1")
    # single-quoted key right after { or , → double-quoted
    c = F.regexp_replace(c, r"([{,]\s*)'([^'\"]*)'(\s*:)", r'$1"$2"$3')
    return c


def scrape_first_object(col: Column | str) -> Column:
    """Regex object-scrape fallback: first ``{...}`` span in free text,
    mirroring the reference's ``re.search(r'\\{.*?\\}')`` rescue
    (``Art-Knowledge-Graph-AWS/LLM/pipeline.py:20-28``)."""
    c = F.col(col) if isinstance(col, str) else col
    s = F.regexp_extract(c, r"(\{[^{}]*\})", 1)
    return F.when(s != "", s).otherwise(F.lit(None).cast("string"))


def tolerant_parse(col: Column | str, schema: str) -> Column:
    """Strict parse first; on failure repair then re-parse; on failure
    scrape the first object and parse that; else NULL.

    ``schema`` is a DDL string, e.g. ``"k INT"`` or ``"map<string,string>"``.

    Failure detection must NOT rely on ``from_json`` returning NULL: in
    PERMISSIVE mode it returns a non-null all-null struct for malformed
    input, which would make a ``coalesce`` of parse attempts always pick
    the broken strict branch. Instead the first *candidate string* that
    is valid JSON (``try_parse_json`` non-null) is chosen, then parsed
    once.
    """
    c = F.col(col) if isinstance(col, str) else col
    repaired = repair_json(c)
    scraped = repair_json(scrape_first_object(c))
    candidate = F.coalesce(
        F.when(F.try_parse_json(c).isNotNull(), c),
        F.when(F.try_parse_json(repaired).isNotNull(), repaired),
        F.when(F.try_parse_json(scraped).isNotNull(), scraped),
    )
    return F.from_json(candidate, schema)
